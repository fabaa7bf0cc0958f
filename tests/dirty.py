"""Dirty-input harness — the round-9 fuzz sweep found three real bugs
in MATURE operators (executor-killing ErgoTree IndexError, Arrow
null-embedding crash, Misra-Gries losing the NULL group), so every NEW
registry entry gets a dirty-input run AT BIRTH: the entry's Spark plan
and its DuckDB oracle are executed side-by-side on a corrupted twin of
the sf0.001 tables and must still agree (operator-vs-GROUP-BY null
semantics is exactly the bug class the sweep caught).

The corruption menu per table: a null-primary-key row, null attribute
columns, empty/whitespace/unicode/NUL text, ragged/empty/null embedding
vectors and non-finite elements, null timestamps. Keys are negative so
they never collide with driver-generated rows.
"""

from __future__ import annotations

from ergo_uexplorer_spark.suite.base import TABLES

_NAN = float("nan")
_INF = float("inf")
_UNI = "ééé 中文 \U0001f600 \x00tab\ttext"

# rows appended to each sf0.001 table (schema-aligned tuples)
DIRTY_ROWS: dict[str, list[tuple]] = {
    "region": [(None, None)],
    "nation": [(None, None, None)],
    "customer": [
        (None, None, None, None, None),
        (-1, "", -1, _NAN, _UNI),
        (-2, _UNI, None, None, None),
    ],
    "supplier": [
        (None, None, None, None),
        (-1, "", None, _NAN),
    ],
    "part": [
        (None, None, None, None, None, None),
        (-1, _UNI, "", None, None, _NAN),
    ],
    "orders": [
        (None, None, None, None, None, None),
        (-1, None, "", _NAN, None, _UNI),
        (-2, -1, None, None, None, None),
    ],
    "lineitem": [
        (None, None, None, None, None, None, None, None, None, None, None),
        (-1, None, -1, 1, _NAN, _NAN, None, None, "", None, None),
        (-2, -1, None, None, None, None, None, None, _UNI, _UNI, None),
        # ±Inf money: under ANSI round(Inf).cast(bigint) throws exactly
        # like NaN, and Catalyst pushes money projections below joins —
        # guards that only test isnan() are half a guard (r10 ADVICE)
        (-3, None, -1, 2, _INF, -_INF, None, None, None, None, None),
    ],
    "events": [
        (None, None, None, None, None, None),
        (-1, None, None, "", _NAN, _UNI),
        (-2, None, -1, _UNI, _INF, None),
    ],
    "documents": [
        (None, None, None, None, None),
        (-1, "", "en", "web", 0),
        (-2, "   ", None, None, None),
        (-3, _UNI, "zh", None, 10),
    ],
    "embeddings": [
        (None, None, None),
        (-1, None, 1),
        (-2, [], 2),
        (-3, [1.0, 2.0, 3.0, 4.0], 3),  # ragged (real dim is 64)
        (-4, [_NAN] * 64, 4),
        (-5, [_INF] * 64, None),
        (-6, [-_INF] + [0.5] * 63, 5),
        # correct-length vector with ONE null element: the engine's
        # finite screen drops it, but isnan(NULL)/isfinite(NULL) are
        # NULL in DuckDB so an oracle that doesn't test x IS NULL
        # explicitly KEEPS it (r10 ADVICE) — this row pins the mirror
        (-7, [0.5] * 63 + [None], 6),
    ],
}

assert set(DIRTY_ROWS) == set(TABLES)


def make_dirty_sf_dir(spark, src_dir: str, out_dir: str) -> str:
    """Write a corrupted twin of `src_dir`'s tables under `out_dir`:
    every original row plus the DIRTY_ROWS for that table. Single
    parquet FILES (pyarrow, not a Spark directory write) so the DuckDB
    oracle's read_parquet sees the same layout as the driver's
    testdata."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        base = pq.read_table(f"{src_dir}/{t}.parquet")
        cols = base.column_names
        extra = pa.table(
            {
                c: pa.array(
                    [row[i] for row in DIRTY_ROWS[t]], type=base.schema[i].type
                )
                for i, c in enumerate(cols)
            },
            schema=base.schema,
        )
        pq.write_table(
            pa.concat_tables([base, extra]), f"{out_dir}/{t}.parquet"
        )
    return out_dir
