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
