"""Dirty-input harness — the round-9 fuzz sweep found three real bugs
in MATURE operators (executor-killing ErgoTree IndexError, Arrow
null-embedding crash, Misra-Gries losing the NULL group), so every NEW
registry entry gets a dirty-input run AT BIRTH: the entry's Spark plan
and its DuckDB oracle are executed side-by-side on a corrupted twin of
the sf0.001 tables and must still agree (operator-vs-GROUP-BY null
semantics is exactly the bug class the sweep caught).

The corruption menu per table: a null-primary-key row, null attribute
columns, empty/whitespace/unicode/NUL text, hostile-but-valid Unicode
with a 10k-char unbroken run, ragged/empty/null embedding vectors and
non-finite elements, NaN/±Inf and finite-overflow money, null and
PRE-EPOCH timestamps. Keys are negative so they never collide with
driver-generated rows.
"""

from __future__ import annotations

import datetime

from ergo_uexplorer_spark.suite.base import TABLES

_NAN = float("nan")
_INF = float("inf")
_UNI = "ééé 中文 \U0001f600 \x00tab\ttext"
# Hostile-but-VALID Unicode (r11 VERDICT #7 — parquet string columns
# cannot carry actually-malformed UTF-8: pyarrow encodes Python str,
# which has no representation for overlong sequences or unpaired
# surrogates; what CAN flow through a lake are the valid-but-nasty
# code points below). BOM, zero-width space, RTL override, NEL (a C1
# control some line-splitters honor), replacement char, the two
# noncharacters U+FFFE/U+FFFF, a bare combining-mark cluster, and a
# 10k-char unbroken run (tokenizer/n-gram length stressor).
_EVIL_UNI = (
    "\ufeff\u200b\u202eRTL\u202c \x85nel \ufffd\ufffe\uffff "
    "x\u0301\u0301\u0301 " + "a" * 10_000
)
# pre-epoch timestamps (r11 VERDICT #7): negative microseconds-since-
# epoch — the divergence hunt is truncation/floor direction in date
# arithmetic (epoch-day, date_trunc, EXTRACT) on negative epochs
_PRE_EPOCH = datetime.datetime(1903, 12, 28, 23, 59, 59, 999999)
_JUST_PRE_EPOCH = datetime.datetime(1969, 12, 31, 23, 59, 59, 999999)

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
        # one microsecond before the epoch: the smallest-magnitude
        # NEGATIVE timestamp — floor-vs-truncate divergence bait
        (-3, None, None, None, _JUST_PRE_EPOCH, None),
    ],
    "lineitem": [
        (None, None, None, None, None, None, None, None, None, None, None),
        (-1, None, -1, 1, _NAN, _NAN, None, None, "", None, None),
        (-2, -1, None, None, None, None, None, None, _UNI, _UNI, None),
        # ±Inf money: under ANSI round(Inf).cast(bigint) throws exactly
        # like NaN, and Catalyst pushes money projections below joins —
        # guards that only test isnan() are half a guard (r10 ADVICE)
        (-3, None, -1, 2, _INF, -_INF, None, None, None, None, None),
        # FINITE overflow money (r11 ADVICE): 1e307 is finite so raw-
        # column screens accept it, but ×100 overflows the double to
        # +Inf — Spark's guarded cast silently NULLed it while DuckDB's
        # CAST threw. Quarantine twins must label it 'overflow' from
        # the scaled expression; strict entries refuse it two-sided.
        (-4, None, None, 3, 1.0, 1e307, 0.0, None, None, None, None),
        # pre-epoch shipdate, money columns NULL (accepted lane)
        (-5, None, None, 4, None, None, None, None, None, None,
         _PRE_EPOCH),
    ],
    "events": [
        (None, None, None, None, None, None),
        (-1, None, None, "", _NAN, _UNI),
        (-2, None, -1, _UNI, _INF, None),
        # deep pre-epoch event: negative epoch-µs through window/
        # bucketing arithmetic (date_trunc, epoch-day, tumbling mod)
        (-3, _PRE_EPOCH, None, "pre-epoch", None, None),
    ],
    "documents": [
        (None, None, None, None, None),
        (-1, "", "en", "web", 0),
        (-2, "   ", None, None, None),
        (-3, _UNI, "zh", None, 10),
        # hostile-but-valid Unicode + 10k-char unbroken run; n_chars
        # deliberately NULL (metadata absent, not wrong)
        (-4, _EVIL_UNI, None, "web", None),
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
