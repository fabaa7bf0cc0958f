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

    Exact path: one independent branch per column — group the column
    by its (typed) value with a HASH aggregate, then derive every
    statistic from the distinct groups in a keyless final aggregate
    (n_rows = Σcount, n_nulls = count of the NULL group, n_distinct =
    non-null group count, min/max over group values ≡ min/max over all
    values). All branches run under ONE action; each scan prunes to
    its single column, so the I/O of the union equals one wide scan of
    a columnar source.

    The previous form (count(DISTINCT c1), count(DISTINCT c2), ... in
    one wide aggregate) expanded every row n_cols× AND — because
    min/max over string columns carry immutable agg buffers — forced
    the whole expand through SortAggregate: two full-width sorts of
    the multiplied rows (r12 optimization: 4.9 s → sub-second at sf0.1
    on 6 orders columns, plan Exchange count 4 → per-branch hash aggs,
    zero wide sorts; see OPTIMIZATION_r12.md).

    At 100 TB pass exact_distinct=False: distinct counts become
    mergeable HLL++ sketches in one wide scan — no per-column distinct
    shuffles at all."""
    cols = cols or df.columns
    if not exact_distinct:
        aggs = []
        for c in cols:
            aggs += [
                F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
                F.approx_count_distinct(c, rsd=0.01).alias(f"__nd_{c}"),
                F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
                F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
            ]
        one = df.agg(F.count(F.lit(1)).alias("__rows"), *aggs)
        stack_args = ", ".join(
            f"'{c}', `__nn_{c}`, `__nd_{c}`, `__mn_{c}`, `__mx_{c}`"
            for c in cols
        )
        return one.select(
            F.expr(
                f"stack({len(cols)}, {stack_args}) AS "
                "(col_name, n_nulls, n_distinct, min_val, max_val)"
            ),
            F.col("__rows").alias("n_rows"),
        ).select(
            "col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val"
        )

    def _branch(c: str) -> DataFrame:
        g = df.groupBy(F.col(c).alias("__v")).agg(
            F.count(F.lit(1)).alias("__c")
        )
        return g.agg(
            F.coalesce(F.sum("__c"), F.lit(0)).alias("n_rows"),
            F.coalesce(
                F.sum(
                    F.when(F.col("__v").isNull(), F.col("__c")).otherwise(
                        F.lit(0)
                    )
                ),
                F.lit(0),
            ).alias("n_nulls"),
            F.count("__v").alias("n_distinct"),
            F.min("__v").cast("string").alias("min_val"),
            F.max("__v").cast("string").alias("max_val"),
        ).select(
            F.lit(c).alias("col_name"),
            "n_rows",
            "n_nulls",
            "n_distinct",
            "min_val",
            "max_val",
        )

    return reduce(DataFrame.unionByName, [_branch(c) for c in cols])
