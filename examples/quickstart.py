"""End-to-end tour of the engine — what a user of the reference explorer
runs after switching to this repo.

    python examples/quickstart.py [workdir]

Covers: chain ingest → REST-route queries → SQL views → lakehouse
write/read → incremental streaming sync → training-data operators
(dedup / similarity / text analysis) on the driver testdata.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ergo_uexplorer_spark import api, storage  # noqa: E402
from ergo_uexplorer_spark.constants import EXCHANGE_PK  # noqa: E402
from ergo_uexplorer_spark.fixtures import ChainGen, write_jsonl_gz  # noqa: E402
from ergo_uexplorer_spark.fixtures.chaingen import p2pk_tree  # noqa: E402
from ergo_uexplorer_spark.functions.crypto import _tree_to_address  # noqa: E402
from ergo_uexplorer_spark.operators.dedup import minhash_lsh_pairs  # noqa: E402
from ergo_uexplorer_spark.operators.similarity import brute_force_topk  # noqa: E402
from ergo_uexplorer_spark.pipeline import ingest_blocks  # noqa: E402
from ergo_uexplorer_spark.session import get_spark  # noqa: E402
from ergo_uexplorer_spark.streaming.incremental import (  # noqa: E402
    UtxoState,
    incremental_sync,
)


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="uexp_")
    spark = get_spark("quickstart", cpus=8)

    # 1. ingest a chain dump (the node's JSON-lines full blocks)
    gen = ChainGen(seed=42)
    gen.generate(300)
    chain = write_jsonl_gz(gen.blocks, os.path.join(work, "chain.jsonl.gz"))
    tables = ingest_blocks(spark, chain)
    info = api.endpoint(tables, "info").first()
    print(f"[ingest] synced to height {info['last_height']}")

    # 2. the explorer query surface
    exchange = _tree_to_address(p2pk_tree(EXCHANGE_PK))
    unspent = api.endpoint(tables, "boxes/unspent/by-address", keys=[exchange])
    print(f"[query] exchange unspent boxes: {unspent.count()}")
    top = api.endpoint(tables, "stats/top-addresses/by-value", limit=3)
    for r in top.collect():
        print(f"[stats] {r['address'][:20]}…  {r['total_value'] / 1e9:.1f} ERG")

    # 3. SQL over the same tables (the GraphQL-equivalent)
    api.register_views(spark, tables)
    rich = spark.sql(
        "SELECT count(*) AS n FROM utxo WHERE value >= 100000000000"  # 100 ERG
    ).first()
    print(f"[sql] utxos ≥ 100 ERG: {rich['n']}")

    # 4. persist the lakehouse, query it back
    gold = os.path.join(work, "gold")
    storage.write_lakehouse(tables, gold)
    lake = storage.read_lakehouse(spark, gold)
    print(f"[lakehouse] utxo rows on disk: {lake['utxo'].count()}")

    # 5. incremental mode: stream newly arriving block files
    inbox = os.path.join(work, "inbox")
    os.makedirs(inbox, exist_ok=True)
    write_jsonl_gz(gen.blocks[:150], os.path.join(inbox, "p0.jsonl.gz"))
    write_jsonl_gz(gen.blocks[150:], os.path.join(inbox, "p1.jsonl.gz"))
    q = incremental_sync(
        spark, inbox, os.path.join(work, "state"), os.path.join(work, "ckpt")
    )
    q.awaitTermination(300)
    live = UtxoState(spark, os.path.join(work, "state")).read()
    print(f"[stream] live utxo after catch-up: {live.count()}"
          f" (batch: {tables['utxo'].count()})")

    # 6. training-data operators on the documents/embeddings tables
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    dups = minhash_lsh_pairs(docs)
    print(f"[dedup] near-dup pairs (MinHash+LSH, j≥0.8): {dups.count()}")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    nn = brute_force_topk(emb, emb.filter(F.col("vec_id") < 2), k=3)
    for r in nn.collect():
        print(f"[ann] q={r['q_id']} → {r['n_id']}  cos={r['cos_sim']:.3f}")

    # 7. curation pipeline: decontaminate → plan the mixture → sample →
    # chunk (the stages a pretraining data job chains; every stage is a
    # pure column/join composition, reproducible under re-partitioning)
    from ergo_uexplorer_spark.operators import textops as T
    from ergo_uexplorer_spark.operators.corpus import (
        chunk_documents,
        decontaminate,
    )
    from ergo_uexplorer_spark.operators.curation import (
        mixture_weights,
        stratified_sample,
    )

    contaminated = decontaminate(docs, F.col("doc_id") % 50 == 0, n=4)
    print(f"[decon] docs sharing a 4-gram with the eval split: "
          f"{contaminated.count()}")
    avail = (
        docs.select("source", F.size(T.tokens(F.col("text"))).alias("nt"))
        .groupBy("source").agg(F.sum("nt").alias("avail"))
    )
    plan = mixture_weights(avail, {f"src{i}": 50 for i in range(20)})
    rates = {r["source"]: int(r["rate_permille"]) for r in plan.collect()}
    kept = stratified_sample(docs, rates, 0, stratum_col="source")
    print(f"[mix] sampled {kept.count()}/{docs.count()} docs toward a "
          f"uniform 20-source mixture")
    chunks = chunk_documents(docs, chunk_tokens=40, stride=30)
    print(f"[chunk] {chunks.count()} training windows from "
          f"{docs.count()} docs")

    # 8. continuous corpus refresh against the persisted signature
    # store: accepted docs' dedup artifacts are written at accept time,
    # so screening a new crawl batch touches the narrow band table plus
    # candidate-shard shingles — never the base text
    from ergo_uexplorer_spark.streaming.corpus_refresh import (
        process_batch,
        read_base,
        seed_base,
    )

    corpus_dir = os.path.join(work, "corpus")
    store = os.path.join(work, "sigstore")
    seed_base(docs.filter(F.col("doc_id") < 400), corpus_dir, store_path=store)
    process_batch(
        docs.filter(F.col("doc_id") >= 400), 0, corpus_dir, store_path=store
    )
    n_corpus = read_base(spark, corpus_dir).count()
    print(f"[refresh] rolling corpus after store-screened batch: "
          f"{n_corpus}/{docs.count()} docs accepted")

    spark.stop()
    print(f"[done] artifacts in {work}")


if __name__ == "__main__":
    main()
