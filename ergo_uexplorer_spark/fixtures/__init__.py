from .chaingen import (  # noqa: F401
    ChainGen,
    write_jsonl_gz,
    write_jsonl_gz_sharded,
)
