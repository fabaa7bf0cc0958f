"""Data-quality audit operators (deequ-style validation, generalized
from the reference's consistency checks: ChainIndexer's missing-height
audit, `readme.md` §data-integrity — the reference validates one chain
table; a 100 TB training-data pipeline validates every table before a
run).

Shapes: referential-integrity audit (per-FK orphan counts, anti-joins)
and single-pass column profiling (nulls / distinct / min / max per
column). Both return SMALL summary tables — the scan is the cost, the
output is O(relations) / O(columns)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_orphans(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    relation: str,
) -> DataFrame:
    """One FK relation → one row (relation, child_rows, orphans):
    `orphans` = child rows (with a non-null key) whose key has no match
    in the parent. Anti-join — NULL keys are counted separately in
    child_rows but never as orphans (NOT EXISTS semantics, not NOT IN).

    The anti-join broadcasts when the parent's key dim is small; at
    100 TB both sides shuffle on the key — still one pass per relation,
    and AQE handles skewed FKs."""
    keyed = child.select(F.col(child_key).alias("__k"))
    orphans = (
        keyed.filter(F.col("__k").isNotNull())
        .join(
            parent.select(F.col(parent_key).alias("__k")).distinct(),
            "__k",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("orphans"))
    )
    totals = keyed.agg(F.count(F.lit(1)).alias("child_rows"))
    return (
        totals.crossJoin(orphans)  # two one-row aggregates
        .select(
            F.lit(relation).alias("relation"),
            "child_rows",
            "orphans",
        )
    )


def fk_audit(
    relations: list[tuple[DataFrame, str, DataFrame, str, str]],
) -> DataFrame:
    """Audit a list of (child, child_key, parent, parent_key, name)
    relations → one row each, unioned. Relations run as independent
    branches of one job (Spark schedules them concurrently under one
    action)."""
    return reduce(
        DataFrame.unionByName,
        [fk_orphans(*rel) for rel in relations],
    )


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Single-pass column profile → (col_name, n_rows, n_nulls,
    n_distinct, min_val, max_val) per column, min/max rendered as
    strings so heterogeneous column types stack into one table.

    ONE wide aggregate computes every statistic for every column in a
    single scan (count/sum-of-nulls/min/max are map-side combinable;
    count(DISTINCT c1), count(DISTINCT c2), ... expand via Spark's
    expand-node rewrite — one parquet pass, but the expand multiplies
    shuffle rows by n_cols, so at 100 TB pass exact_distinct=False and
    the distinct counts become mergeable HLL++ sketches: no expand, no
    per-column shuffle blowup). The tiny 1×(4·n_cols) result row is
    then unpivoted driver-free with stack()."""
    cols = cols or df.columns
    nd = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(c, rsd=0.01))
    )
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            nd(c).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(F.count(F.lit(1)).alias("__rows"), *aggs)
    stack_args = ", ".join(
        f"'{c}', `__nn_{c}`, `__nd_{c}`, `__mn_{c}`, `__mx_{c}`" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_nulls, n_distinct, min_val, max_val)"
        ),
        F.col("__rows").alias("n_rows"),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")
