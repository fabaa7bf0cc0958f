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
