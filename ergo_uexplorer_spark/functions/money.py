"""Keep-going money semantics: quarantine instead of refusal.

The suite's integer-exact money contract is REFUSAL: under Spark's
default ANSI mode `round(x).cast(bigint)` throws on NaN/±Inf, DuckDB's
`CAST(round(x) AS BIGINT)` raises ConversionException on the same
inputs, and the dirty-twin sweep verifies the refusals agree two-sided
(35 entries). That is the right default for money — garbage in, loud
refusal out — but a pipeline consumer who wants the job to FINISH on a
corrupted source needs the quarantine alternative: accepted rows
aggregate exactly as the strict entry would, refused rows are excluded
and COUNTED by reason, the way `operators.similarity.screen_embeddings`
surfaces dropped vectors (r10 VERDICT next-round #6).

`money_reason` labels a row from the numeric columns it contributes:
'nan' if any is NaN, else 'inf' if any is ±Inf, else NULL (accepted —
plain NULLs are ordinary missing data, skipped by SQL aggregates
identically on both engines, NOT quarantined). The label is engine-
mirrorable: `money_reason_sql` emits the DuckDB predicate with the same
NULL-totality (Spark's isnan(NULL) is false and DuckDB's CASE needs the
coalesce, so both sides route a NULL through to 'accepted').

Reference frame: the reference stores money as integer nanoERG end to
end (explorer-core Models — value: Long), so it has no non-finite
lane at all; these twins are what its semantics degrade to when the
source is a float-typed lake column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INF = float("inf")


def money_reason(*cols: Column) -> Column:
    """'nan' | 'inf' | NULL quarantine label over the row's money
    columns. NULL inputs never trip a reason (Spark isnan(NULL) is
    false; abs(NULL)=NULL makes the inf test NULL, and a NULL `when`
    condition is not taken) — they stay accepted and null-skip in the
    aggregates downstream, the same as DuckDB."""
    any_nan = None
    any_inf = None
    for c in cols:
        n = F.isnan(c.cast("double"))
        i = F.abs(c.cast("double")) == F.lit(_INF)
        any_nan = n if any_nan is None else (any_nan | n)
        any_inf = i if any_inf is None else (any_inf | i)
    return (
        F.when(any_nan, F.lit("nan"))
        .when(any_inf, F.lit("inf"))
        .otherwise(F.lit(None).cast("string"))
    )


def money_reason_sql(*cols: str) -> str:
    """DuckDB mirror of `money_reason` — same labels, same NULL
    totality (coalesce(x, 0) makes isnan/isfinite total over NULLs so
    a NULL column cannot poison the OR chain into NULL)."""
    nan = " OR ".join(f"isnan(coalesce({c}, 0))" for c in cols)
    inf = " OR ".join(f"NOT isfinite(coalesce({c}, 0))" for c in cols)
    return (
        f"CASE WHEN {nan} THEN 'nan' WHEN {inf} THEN 'inf' END"
    )


def accepted_cents(c: Column, scale: int = 100) -> Column:
    """Exact integer cents over an ACCEPTED (reason IS NULL) row. The
    when-guard keeps the cast total even if Catalyst re-orders the
    projection past the quarantine filter — the zwc lesson: under ANSI
    the cast itself must be total, 'it's filtered later' is unsound."""
    v = c.cast("double") * scale if scale != 1 else c.cast("double")
    return F.when(
        ~F.isnan(v) & (F.abs(v) != F.lit(_INF)),
        F.round(v).cast("bigint"),
    )
