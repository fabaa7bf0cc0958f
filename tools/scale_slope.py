"""Measured scale slopes: generate a COPIES× scale-up of the sf0.1
testdata locally and time the most expensive suite entries at both
scales, so the "near-linear at 100 TB" claims in SCALE.md rest on a
recorded slope instead of plan narrative (r4 verdict, next-round #5).

Scale-up construction (deterministic, no RNG at runtime):

* documents — COPIES copies with offset doc_id; every token in copy k
  gets a per-copy suffix, so shingle/minhash/simhash universes are
  DISJOINT across copies: the duplicate structure of each copy mirrors
  sf0.1 exactly and true candidate/verified-pair volume scales ~linearly
  (plain replication would instead make every doc a 10-way near-dup —
  a quadratic artifact, not a scale measurement).
* embeddings — COPIES copies with offset vec_id; copy k applies a fixed
  seeded dimension permutation, which preserves norms and within-copy
  cosine structure while decorrelating copies.
* orders/lineitem — COPIES copies with offset orderkey/suppkey and
  UNCHANGED custkey, so z01's motif subgraph (custkey < 100) grows with
  the data instead of staying constant.
* chain ingest — ChainGen at COPIES× the bench block count.

Usage:  python tools/scale_slope.py [--copies 10] [--out .scale/sf1]
Prints one JSON line per query: name, sf0.1 time, sf1 time, ratio.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
QUERIES = (
    "zz_c01_clean_corpus",
    "zz_d03_dedup_minhash_lsh",
    "zz_d05_dedup_embedding_cosine",
    "zz_z01_motif_find",
    # iterative-algorithm slope: shared customers + per-copy suppliers
    # grow z08's graph edges ~linearly with the data
    "zz_z08_pagerank",
    # dangling + early-stop variant: same graph, rounds data-independent
    "zz_z20_pagerank_dangling",
    # incremental dedup: disjoint-universe copies keep cross-side
    # candidate volume ~linear
    "zz_z21_incremental_dedup",
    # SemDeDup with a FIXED 128-cell quantizer: within-cell pair volume
    # grows ~copies² by construction (the paper scales k ~ sqrt(n); the
    # operator takes centroids as a parameter) — the recorded ratio
    # documents why k must grow with the corpus, not a plan defect.
    # Timed via the raw operator (see _RAW below): the registered entry
    # caches its prepared plan + checkpointed result, so best-of-2 on it
    # would time a cache hit.
    "zz_z23_semantic_dedup",
    # budget selection: bounded score-domain decomposition → ~linear
    "zz_z24_token_budget_select",
    # r6 additions — per-copy supplier/doc universes keep these honest:
    # triangle edges replicate per copy (offset suppkeys) → ~linear
    "zz_z42_triangle_count",
    # cross-source near-dup pairs: disjoint shingle universes → ~linear
    "zz_z49_cross_source_dup",
    # hash-min components over the near-dup graph: disjoint per-copy
    # universes keep edges/components per copy ≍ sf0.1 (≈10× nodes,
    # same tiny diameters → same round count, ~linear per-round work)
    "zz_z31_cluster_sizes",
    # long-id BFS: custkey space is shared across copies, so c1's
    # 4-hop reach grows ~linearly with the data
    "zz_g02_graph_k_hop",
    # two exact distinct-aggs over suffixed per-copy grams → ~linear
    "zz_z33_ngram_diversity",
    # r6 additions: hashed-bigram features — two partial aggs + a
    # ≤128-row broadcast dim → ~linear in gram volume
    "zx4_dsir_importance",
    # first-owner min-agg + co-partitioned join back on the gram hash;
    # disjoint per-copy universes keep novelty structure per copy
    "zx5_ngram_novelty",
    # r8 additions (the last never-soaked heavy entries):
    # containment join: lossless prefix filter — disjoint per-copy
    # shingle universes keep candidate pairs ~linear in copies
    "zz_z30_containment_join",
    # source-overlap matrix: per-(source,source) MinHash-bucket
    # agreement counts; per-copy token suffixes keep bucket collisions
    # within-copy, so matrix cell work scales ~linearly
    "zz_z25_source_overlap",
)


def _union(parts: list[DataFrame]) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def generate(
    spark: SparkSession,
    out: str,
    copies: int,
    tables: tuple[str, ...] = ("documents", "embeddings", "orders", "events"),
    disjoint_customers: bool = False,
) -> None:
    os.makedirs(out, exist_ok=True)

    if "events" in tables:
        # events scale by USER: copy k offsets event_id/user_id and keeps
        # the time range — 10× data = 10× concurrent users over the same
        # period (per-user group sizes and window counts match sf0.1),
        # the honest direction for sessionization/applyInPandas/sweep
        # entries whose state is keyed per user
        ev = spark.read.parquet(f"{SF01}/events.parquet")
        ebase = ev.agg(F.max("event_id")).first()[0] + 1
        ubase = ev.agg(F.max("user_id")).first()[0] + 1
        parts = []
        for k in range(copies):
            parts.append(
                ev.withColumn(
                    "event_id", F.col("event_id") + F.lit(k * ebase)
                ).withColumn("user_id", F.col("user_id") + F.lit(k * ubase))
            )
        _union(parts).write.mode("overwrite").parquet(
            f"{out}/events.parquet"
        )
    if "documents" in tables:
        docs = spark.read.parquet(f"{SF01}/documents.parquet")
        base = docs.agg(F.max("doc_id")).first()[0] + 1
        parts = []
        for k in range(copies):
            d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * base))
            if k:
                d = d.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"$1x{k}")
                )
            parts.append(d)
        _union(parts).write.mode("overwrite").parquet(
            f"{out}/documents.parquet"
        )

    if "embeddings" in tables:
        emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
        dim = len(emb.first()["embedding"])
        vbase = emb.agg(F.max("vec_id")).first()[0] + 1
        parts = []
        for k in range(copies):
            e = emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * vbase))
            if k:
                perm = list(range(dim))
                random.Random(1000 + k).shuffle(perm)
                e = e.withColumn(
                    "embedding",
                    F.array(*[F.col("embedding")[i] for i in perm]),
                )
            parts.append(e)
        _union(parts).write.mode("overwrite").parquet(
            f"{out}/embeddings.parquet"
        )

    if "orders" not in tables:
        return
    orders = spark.read.parquet(f"{SF01}/orders.parquet")
    li = spark.read.parquet(f"{SF01}/lineitem.parquet")
    obase = orders.agg(F.max("o_orderkey")).first()[0] + 1
    sbase = li.agg(F.max("l_suppkey")).first()[0] + 1
    if disjoint_customers:
        cbase = orders.agg(F.max("o_custkey")).first()[0] + 1
        pbase = li.agg(F.max("l_partkey")).first()[0] + 1
    oparts, lparts = [], []
    for k in range(copies):
        o = orders.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(k * obase)
        )
        if disjoint_customers:
            # per-copy custkey offset (paired with the partkey offset
            # below): copies become disjoint bipartite graphs, so the
            # distinct (custkey, partkey) edge table AND its wedge
            # volume grow ~linearly — the honest direction for
            # wedge-join entries (zya8/zya6), whose shared-key default
            # collapses copies to ~one graph. (The default stays
            # shared: z01's motif subgraph and g02's BFS reach are
            # honest only when customers are shared.)
            o = o.withColumn("o_custkey", F.col("o_custkey") + F.lit(k * cbase))
        oparts.append(o)
        l = li.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(k * obase)
        ).withColumn("l_suppkey", F.col("l_suppkey") + F.lit(k * sbase))
        if disjoint_customers:
            # offset partkey too: custkey-only offsets with SHARED parts
            # would grow per-part degree 100× and wedge volume copies² —
            # a quadratic artifact, not a measurement. Disjoint copies
            # grow the bipartite graph (and its wedge volume) linearly.
            l = l.withColumn(
                "l_partkey", F.col("l_partkey") + F.lit(k * pbase)
            )
        lparts.append(l)
    _union(oparts).write.mode("overwrite").parquet(f"{out}/orders.parquet")
    _union(lparts).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")


def time_query(fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(REPO, ".scale", "sf1"))
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--skip-ingest", action="store_true")
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset of tables to (re)generate "
        "(documents,embeddings,orders,events); default: all",
    )
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names (subset of QUERIES) to time",
    )
    ap.add_argument(
        "--disjoint-customers",
        action="store_true",
        help="offset o_custkey AND l_partkey per copy — disjoint graph "
        "copies, honest linear wedge growth for zya8/zya6 (breaks "
        "z01/g02's shared-customer premise; run those without it)",
    )
    args = ap.parse_args()

    from ergo_uexplorer_spark.session import get_spark
    from ergo_uexplorer_spark.suite import REGISTRY

    spark = get_spark("scale-slope")
    if not args.skip_gen:
        if args.tables:
            generate(
                spark, args.out, args.copies,
                tables=tuple(args.tables.split(",")),
                disjoint_customers=args.disjoint_customers,
            )
        else:
            generate(
                spark, args.out, args.copies,
                disjoint_customers=args.disjoint_customers,
            )

    def _z23_raw(spark, sf_dir):
        from ergo_uexplorer_spark.operators import similarity as S
        from ergo_uexplorer_spark.suite.base import load
        from ergo_uexplorer_spark.suite.similarity import _SEMDEDUP_T

        (emb,) = load(spark, sf_dir, "embeddings")
        return S.semantic_dedup(
            emb, list(S.FIXED_CENTROIDS), threshold=_SEMDEDUP_T
        )

    _RAW = {"zz_z23_semantic_dedup": _z23_raw}

    results = {}
    names = QUERIES if not args.only else tuple(args.only.split(","))
    for name in names:
        fn = _RAW.get(name) or REGISTRY[name].fn
        lo = time_query(
            lambda: fn(spark, SF01).write.format("noop").mode("overwrite").save()
        )
        hi = time_query(
            lambda: fn(spark, args.out)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        results[name] = {
            "sf0.1_s": lo,
            "sf1_s": hi,
            "ratio": round(hi / lo, 2),
        }
        print(json.dumps({"query": name, **results[name]}), flush=True)

    if not args.skip_ingest:
        import bench
        from ergo_uexplorer_spark.fixtures import ChainGen, write_jsonl_gz
        from ergo_uexplorer_spark.pipeline import ingest_blocks

        # both chains use a reduced emission value base so cumulative
        # volume prefix sums stay inside int64 at 42k blocks (the
        # default 10^15/block overflows a long past ~9.2k blocks); the
        # slope ratio is what matters, so base and big must match.
        base_path = os.path.join(args.out, "chain_base.jsonl.gz")
        big_path = os.path.join(args.out, "chain_big.jsonl.gz")
        vb = 10**13
        if not os.path.exists(base_path):
            gen = ChainGen(seed=42, value_base=vb)
            gen.generate(bench.CHAIN_BLOCKS)
            write_jsonl_gz(gen.blocks, base_path)
        if not os.path.exists(big_path):
            gen = ChainGen(seed=42, value_base=vb)
            gen.generate(bench.CHAIN_BLOCKS * args.copies)
            write_jsonl_gz(gen.blocks, big_path)

        def ingest(path):
            tables = ingest_blocks(spark, path, cache="raw")
            for t in ("blocks", "utxo", "address_stats"):
                tables[t].write.format("noop").mode("overwrite").save()
            tables["raw"].unpersist(blocking=False)

        lo = time_query(lambda: ingest(base_path))
        hi = time_query(lambda: ingest(big_path))
        results["chain_ingest"] = {
            "sf0.1_s": lo,
            "sf1_s": hi,
            "ratio": round(hi / lo, 2),
        }
        print(json.dumps({"query": "chain_ingest", **results["chain_ingest"]}))

    print(json.dumps({"scale_slopes": results, "copies": args.copies}))


if __name__ == "__main__":
    main()
