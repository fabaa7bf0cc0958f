from .chaingen import ChainGen, write_jsonl_gz  # noqa: F401
