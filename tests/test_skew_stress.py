"""Exchange-hot (supernode) skew stress — r6 verdict #4.

The reference's supernode motif (SuperNodeCounter.scala:19) is one
address holding ~50% of all boxes. Two mechanisms keep that shape from
melting a reducer at 100 TB, and both are pinned here with
partition-level assertions (not wall-clock, which is noise at test
scale):

* the two-phase SALTED aggregation (stats.salted_count_by_key)
  spreads the hot key's first-stage partials over `salt_buckets`
  reducers — asserted by counting the distinct shuffle partitions the
  hot key's rows land in under (salt, key) vs plain (key) partitioning;
* AQE's skew-join split — asserted on the executed final plan of a
  fact⋈dim join whose hot fact partition exceeds the (lowered) skew
  threshold: the SortMergeJoin must carry the `skew=true` marker.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

HOT_KEY = 0
N_ROWS = 400_000  # ~50% of rows on HOT_KEY


def _hot_fixture(spark):
    """(k, payload): even ids collapse onto HOT_KEY → one key holds half
    of all rows, the rest are unique — the exchange-wallet shape."""
    return spark.range(N_ROWS).select(
        F.when(F.col("id") % 2 == 0, F.lit(HOT_KEY))
        .otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("payload"),
    )


def test_salted_count_equals_plain_and_spreads_hot_key(spark):
    from ergo_uexplorer_spark.operators.stats import salted_count_by_key

    df = _hot_fixture(spark)
    salted = {
        r.k: r["count"]
        for r in salted_count_by_key(df, ["k"], salt_buckets=16)
        .filter(F.col("count") > 1)
        .collect()
    }
    plain = {
        r.k: r.n
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .collect()
    }
    assert salted == plain == {HOT_KEY: N_ROWS // 2}

    # partition-level mechanism: under plain hash(key) partitioning the
    # hot key's rows land on exactly ONE reducer; under (salt, key)
    # they spread across ~salt_buckets
    n_parts = 16

    def hot_partitions(parted):
        return (
            parted.filter(F.col("k") == HOT_KEY)
            .select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )

    plain_spread = hot_partitions(df.repartition(n_parts, "k"))
    salted_df = df.withColumn(
        "__salt", (F.rand(seed=7) * 16).cast("int")
    )
    salted_spread = hot_partitions(
        salted_df.repartition(n_parts, "__salt", "k")
    )
    assert plain_spread == 1
    assert salted_spread >= 8  # 16 salt values over 16 partitions


def test_aqe_splits_hot_join_partition(spark):
    """AQE must mark+split the skewed join partition once its size
    crosses the (lowered) thresholds; the final executed plan carries
    SortMergeJoin(skew=true). Conf changes are runtime-settable and
    restored after the test."""
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    )
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        fact = _hot_fixture(spark)
        dim = spark.range(N_ROWS).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("p2")
        )
        j = fact.join(dim, "k")
        rows = j.collect()  # executes j's own plan → final AQE plan
        assert len(rows) == N_ROWS
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_prefix_join_hot_boilerplate_token_stays_exact(spark):
    """Dedup skew: a boilerplate header shared by EVERY document makes
    its shingle hashes corpus-wide hot join keys (the SuperNodeMvMap
    shape transplanted to the prefix-token join). The PPJoin+ filters
    must stay LOSSLESS under that skew — filtered prefix pairs ==
    quadratic all-pairs baseline — while the candidate funnel proves
    the length/positional filters prune the boilerplate-driven
    candidate blow-up (candidates ≪ all boilerplate-sharing pairs)."""
    from ergo_uexplorer_spark.operators.dedup import (
        hashed_shingle_sets,
        jaccard_pairs,
        jaccard_prefix_pairs,
        jaccard_prefix_stats,
    )

    boiler = "terms of service apply to all content on this site"
    rows = []
    for i in range(120):
        body = " ".join(f"w{i}t{j}" for j in range(20))
        rows.append((i, f"{boiler} {body}"))
    # ten near-dup pairs: doc 1000+i = doc i with one token changed
    for i in range(10):
        body = " ".join(
            f"w{i}t{j}" if j != 19 else "CHANGED" for j in range(20)
        )
        rows.append((1000 + i, f"{boiler} {body}"))
    # three SHORT boilerplate-only docs: every short×long pair shares
    # the hot hashes but is size-impossible at t = 0.8 — the length
    # filter must kill all 3×130 of them before the verify
    for i in range(3):
        rows.append((2000 + i, boiler))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r["doc_a"], r["doc_b"], r["shared"], r["na"], r["nb"])
        for r in jaccard_prefix_pairs(docs, num=4, den=5).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"], r["shared"], r["na"], r["nb"])
        for r in jaccard_pairs(
            hashed_shingle_sets(docs), num=4, den=5, elem_col="h"
        ).collect()
    }
    assert got == want
    # the 10 constructed near-dup pairs + the 3 identical short docs
    assert {(a, b) for a, b, *_ in got} == {
        (i, 1000 + i) for i in range(10)
    } | {(2000, 2001), (2000, 2002), (2001, 2002)}

    stats = {
        r["stage"]: r["n"] for r in jaccard_prefix_stats(docs).collect()
    }
    assert stats["verified_pairs"] == 13
    assert stats["verified_pairs"] <= stats["candidate_pairs"]

    # equal-size boilerplate-sharing long pairs legitimately survive the
    # filters at t = 0.8 (the positional bound can't exclude a shared
    # hash near the front of two same-size sets) — the measurable
    # pruning here is the LENGTH filter: rebuild the candidate join
    # WITHOUT the filters and check (a) the hot boilerplate hashes do
    # produce short×long prefix collisions, and (b) every one of them
    # is absent from the filtered candidate count
    from ergo_uexplorer_spark.operators.dedup import hashed_shingle_arrays

    arr = hashed_shingle_arrays(docs)
    plen = (
        F.size("hs") - F.expr("(4 * size(hs) + 4) div 5") + F.lit(1)
    )
    prefix = arr.select(
        "doc_id", F.explode(F.slice("hs", F.lit(1), plen)).alias("h")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    unfiltered = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .distinct()
    )
    n_unf = unfiltered.count()
    n_cross = unfiltered.filter(
        (F.col("x") < 2000) & (F.col("y") >= 2000)
    ).count()
    assert n_cross > 0, "fixture produced no hot cross-size collisions"
    assert stats["candidate_pairs"] <= n_unf - n_cross
