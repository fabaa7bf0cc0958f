"""Full-registry dirty-input sweep: run EVERY suite entry and its
DuckDB oracle side-by-side on the corrupted twin of the sf0.001 tables
(tests/dirty.py — null primary keys, null attributes, unicode/NUL text,
ragged/±Inf/NaN vectors) and report every disagreement or crash.

This is the generalized form of the round-9 fuzz sweep (which found 3
real bugs in mature operators) and of round 10's dirty-at-birth gate
(which covers entries added from r10 on). A mismatch here is either a
real null-semantics bug (fix it) or a defensible operator-vs-GROUP-BY
divergence (document it in the triage table this tool's output feeds).

Usage: python tools/dirty_sweep.py [--json OUT.json] [name ...]
Prints one line per entry; exits 1 if any entry crashed or mismatched.
`--json` writes the committed per-round DIRTY_rN.json artifact (r10
VERDICT #3: the sweep found 78 findings on first run — it is a standing
per-round gate, not a one-off, and each round's run leaves a record).
"""

from __future__ import annotations

import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    from ergo_uexplorer_spark.session import get_spark
    from ergo_uexplorer_spark.suite import REGISTRY

    from dirty import make_dirty_sf_dir  # tests/dirty.py
    from oracle import assert_matches_oracle  # tests/oracle.py

    spark = get_spark("dirty-sweep")
    out = os.path.join(REPO, ".scale", "dirty_sf0001")
    if not os.path.exists(os.path.join(out, "embeddings.parquet")):
        make_dirty_sf_dir(spark, "/root/testdata/sf0.001", out)

    def _is_cast_refusal(ex: Exception) -> bool:
        # ANSI-conformant refusal of a non-finite → integer cast: DuckDB
        # ConversionException / Spark CAST_OVERFLOW-family errors
        txt = f"{type(ex).__name__} {ex}"
        return any(
            m in txt
            for m in (
                "ConversionException",
                "CAST_OVERFLOW",
                "CAST_INVALID_INPUT",
                "ArithmeticException",
                "InvalidInputException",
            )
        )

    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    names = args or sorted(REGISTRY)
    bad = 0
    agreed_refusals = 0
    results: dict[str, str] = {}
    for name in names:
        q = REGISTRY[name]
        try:
            df = q.fn(spark, out)
            if q.sql is None:
                df.collect()
                results[name] = "OK (rows-only)"
                print(f"{name}: OK (rows-only, no oracle)", flush=True)
                continue
            assert_matches_oracle(df, q.sql, out, name)
            results[name] = "OK"
            print(f"{name}: OK", flush=True)
        except AssertionError as ex:
            bad += 1
            results[name] = f"MISMATCH {str(ex)[:200]}"
            print(f"{name}: MISMATCH {str(ex)[:300]}", flush=True)
        except Exception as ex:
            if _is_cast_refusal(ex):
                # one engine refused the cast — AGREED_REFUSAL only if
                # the OTHER engine refuses the same input too (both
                # engines failing loudly and identically on garbage
                # money is the accepted ANSI contract; ONE-sided
                # refusal would be a silent-divergence bug)
                try:
                    q.fn(spark, out).collect()
                    spark_crash = None
                except Exception as ex2:
                    spark_crash = ex2
                try:
                    import duckdb

                    from oracle import duck_connection

                    con = duck_connection(out)
                    con.execute(q.sql).fetchall()
                    duck_crash = None
                except Exception as ex2:
                    duck_crash = ex2
                if (
                    spark_crash is not None
                    and duck_crash is not None
                    and _is_cast_refusal(spark_crash)
                    and _is_cast_refusal(duck_crash)
                ):
                    agreed_refusals += 1
                    results[name] = "AGREED_REFUSAL"
                    print(
                        f"{name}: AGREED_REFUSAL (both engines reject "
                        f"the non-finite cast)",
                        flush=True,
                    )
                    continue
            bad += 1
            results[name] = f"CRASH {type(ex).__name__} {str(ex)[:200]}"
            print(
                f"{name}: CRASH {type(ex).__name__} "
                f"{str(ex)[:200]} | {traceback.format_exc(limit=2)[-200:]}",
                flush=True,
            )
    print(
        f"{len(names) - bad}/{len(names)} dirty-pass "
        f"({agreed_refusals} agreed refusals)",
        flush=True,
    )
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {
                    "tool": "dirty_sweep",
                    "total": len(names),
                    "dirty_pass": len(names) - bad,
                    "agreed_refusals": agreed_refusals,
                    "failed": [
                        n
                        for n, s in results.items()
                        if s.startswith(("MISMATCH", "CRASH"))
                    ],
                    "results": results,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
