"""Every suite entry must hash-match its DuckDB oracle (the driver's t2
gate, run here at sf0.001 for speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from ergo_uexplorer_spark.suite import REGISTRY

from .oracle import assert_matches_oracle

import os

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(spark, name):
    qd = REGISTRY[name]
    df = qd.fn(spark, SF_DIR)
    if qd.sql is None:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    assert_matches_oracle(df, qd.sql, SF_DIR, name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_a02_sketch_bounded_by_independent_exact(spark):
    """Defense in depth for the sketch entry's self-certified boolean:
    bound Spark's HLL++ estimate against DUCKDB's exact distinct count
    (an independent engine), not just Spark's own exact column."""
    from pyspark.sql import functions as F

    from ergo_uexplorer_spark.suite.base import load
    from ergo_uexplorer_spark.suite.olap import _A02_RSD

    from .oracle import duck_connection

    con = duck_connection(SF_DIR)
    exact = dict(
        con.execute(
            "SELECT l_suppkey, count(DISTINCT l_partkey)"
            " FROM lineitem GROUP BY l_suppkey"
        ).fetchall()
    )
    con.close()
    (lineitem,) = load(spark, SF_DIR, "lineitem")
    approx = {
        r["l_suppkey"]: r["a"]
        for r in lineitem.groupBy("l_suppkey")
        .agg(F.approx_count_distinct("l_partkey", rsd=_A02_RSD).alias("a"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, ex in exact.items():
        assert abs(approx[k] - ex) <= max(1.0, 5 * _A02_RSD * ex), (
            f"suppkey {k}: approx {approx[k]} vs exact {ex}"
        )


def test_temporal_parity_non_utc_session(spark):
    """The temporal surface must be session-timezone-proof: events.ts
    normalization (convert_timezone branch) and the j01/j02 datediff
    epoch both hold under a non-UTC session."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        for name in ("zz_e01_sessionization", "zz_j01_asof_join"):
            qd = REGISTRY[name]
            assert_matches_oracle(qd.fn(spark, SF_DIR), qd.sql, SF_DIR, name)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
