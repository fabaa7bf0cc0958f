"""DuckDB-oracle comparison harness mirroring the driver's t2 gate:
row-count + column-name schema + order-insensitive value comparison."""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from ergo_uexplorer_spark.suite.base import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, (int,)):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(float(v))
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def rows_of(records, columns, order):
    idx = [columns.index(c) for c in order]
    return sorted(
        (tuple(_norm(r[i]) for i in idx) for r in records),
        key=lambda t: tuple(str(x) for x in t),
    )


def assert_matches_oracle(spark_df, sql: str, sf_dir: str, name: str = "") -> None:
    con = duck_connection(sf_dir)
    cur = con.execute(sql)
    oracle_cols = [d[0] for d in cur.description]
    oracle_rows = cur.fetchall()
    con.close()

    mine_cols = spark_df.columns
    mine_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(mine_cols) == sorted(oracle_cols), (
        f"{name}: column mismatch spark={sorted(mine_cols)} oracle={sorted(oracle_cols)}"
    )
    assert len(mine_rows) == len(oracle_rows), (
        f"{name}: row count spark={len(mine_rows)} oracle={len(oracle_rows)}"
    )
    order = sorted(mine_cols)
    a = rows_of(mine_rows, mine_cols, order)
    b = rows_of(oracle_rows, oracle_cols, order)
    if a != b:
        diff_a = [r for r in a if r not in b][:5]
        diff_b = [r for r in b if r not in a][:5]
        raise AssertionError(
            f"{name}: value mismatch.\n only-spark: {diff_a}\n only-oracle: {diff_b}"
        )
