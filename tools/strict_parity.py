"""Strict driver-faithful parity check.

The driver's t2 gate converts both the Spark result and the DuckDB
oracle result to pandas, sorts columns by name, sorts rows, and hashes
the TYPED values. tests/oracle.py normalizes types (int==int128,
float('5.0')==int(5)) and therefore cannot see the class of mismatch
where DuckDB returns HUGEINT (-> pandas float64/object) while Spark
returns int64. This tool reproduces the driver's view: exact repr of
every cell after pandas conversion, no type normalization.

Usage: python tools/strict_parity.py [--json OUT.json] [sf_dir] [name ...]

`--json` writes a machine-readable artifact (per-entry status + counts)
— the committed per-round PARITY_rN.json record (r10 VERDICT #3: the
driver's frozen 50-entry correctness window never re-covers the tail,
so the full-registry sweep must leave a committed artifact each round).
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cell(v):
    # Dates: Spark's toPandas gives datetime.date objects, duckdb's .df()
    # gives datetime64 Timestamps. The driver's canonicalizer treats them
    # uniformly (c06 with a DATE cast was hash-green in round 1), so
    # normalize date-likes only; every numeric stays exact-typed.
    import datetime

    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return pd.Timestamp(v).isoformat()
    return repr(v)


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(r) for r in df.itertuples(index=False, name=None)]
    return sorted(
        (tuple(_cell(v) for v in row) for row in rows),
        key=lambda t: t,
    )


def main() -> int:
    from pyspark.sql import SparkSession

    from ergo_uexplorer_spark.suite import REGISTRY
    from tests.oracle import duck_connection

    args = [a for a in sys.argv[1:]]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.01", args
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown query name(s): {' '.join(unknown)}")
        print("available:", " ".join(sorted(REGISTRY)))
        return 2
    names = names or sorted(REGISTRY)

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("strict-parity")
        .getOrCreate()
    )
    con = duck_connection(sf_dir)
    failed = []
    results: dict[str, str] = {}
    for name in names:
        qd = REGISTRY[name]
        if qd.sql is None:
            results[name] = "SKIP"
            print(f"{name}: SKIP (rows-only)")
            continue
        try:
            mine = qd.fn(spark, sf_dir).toPandas()
            oracle = con.execute(qd.sql).df()
            if sorted(mine.columns) != sorted(oracle.columns):
                raise AssertionError(
                    f"columns spark={sorted(mine.columns)} "
                    f"oracle={sorted(oracle.columns)}"
                )
            a, b = canon(mine), canon(oracle)
            if len(a) != len(b):
                raise AssertionError(f"rows spark={len(a)} oracle={len(b)}")
            if a != b:
                bad = next(
                    (i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y
                )
                raise AssertionError(f"first diff at row {bad[0]}:\n  spark={bad[1]}\n  oracle={bad[2]}")
            results[name] = f"OK ({len(a)} rows)"
            print(f"{name}: OK ({len(a)} rows)")
        except Exception as exc:  # noqa: BLE001 - report-all harness
            failed.append(name)
            results[name] = f"FAIL {str(exc)[:200]}"
            print(f"{name}: FAIL {exc}")
    con.close()
    spark.stop()
    print(f"\n{len(names) - len(failed)}/{len(names)} strict-pass")
    if failed:
        print("failed:", " ".join(failed))
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {
                    "tool": "strict_parity",
                    "sf_dir": sf_dir,
                    "total": len(names),
                    "strict_pass": len(names) - len(failed),
                    "failed": failed,
                    "results": results,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
