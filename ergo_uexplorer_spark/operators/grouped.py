"""Grouped-map analytics via applyInPandas — the Arrow-batched escape
hatch for per-group logic that would be tortured as window expressions
(model fits, per-entity curves). Groups stream into pandas one at a
time, so the only scale constraint is max single-group size (salt or
pre-aggregate if one entity exceeds executor memory)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

TREND_SCHEMA = StructType(
    [
        StructField("group_key", LongType()),
        StructField("n_points", LongType()),
        StructField("slope", DoubleType()),
        StructField("intercept", DoubleType()),
    ]
)


def per_group_linear_trend(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    vectorized: bool = True,
) -> DataFrame:
    """OLS y ~ x per group (closed form).
    Returns (group_key, n_points, slope, intercept); slope is null for
    degenerate groups (n < 2 valid points or zero x-variance).

    `vectorized=True` (default, r11): repartition by key + ONE
    mapInPandas call per partition, with the whole fit — group means,
    centered products, the final division — in Cython groupby kernels.
    The r10 form (`vectorized=False`) shipped each group through its
    own applyInPandas call, and the per-group Arrow round-trip
    (~2.7 ms) dominated: 1,500 groups cost ~4 s at sf0.1 regardless of
    row count (the drift the r10 VERDICT flagged; re-measured quiet at
    5.7 s). The math per group is the same two-pass centered form; a
    property test pins vectorized == per-group on random data. Memory
    contract: one shuffle partition's rows concat into one pandas
    frame (same order as any pandas stage — size shuffle partitions
    accordingly), vs per-group frames before.

    Total over dirty data: rows with a null x or y are excluded from
    the fit (and from n_points) BEFORE the group ships to pandas — a
    null observation would otherwise NaN-poison every moment — and
    null-key rows are dropped with them (groupBy forms a null-key
    group whose `int(key)` crashed the Arrow worker)."""

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].iloc[0]
        x = pdf[x_col].astype("float64")
        y = pdf[y_col].astype("float64")
        n = len(pdf)
        xm, ym = x.mean(), y.mean()
        sxx = ((x - xm) ** 2).sum()
        if n < 2 or sxx == 0.0:
            slope, intercept = None, None
        else:
            slope = float(((x - xm) * (y - ym)).sum() / sxx)
            intercept = float(ym - slope * xm)
        return pd.DataFrame(
            {
                "group_key": [int(key)],
                "n_points": [n],
                "slope": [slope],
                "intercept": [intercept],
            }
        )

    def _fit_partition(batches):
        parts = [p for p in batches]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        if len(pdf) == 0:
            return
        x = pdf[x_col].astype("float64")
        y = pdf[y_col].astype("float64")
        g = pdf.groupby(key_col, sort=False)
        cx = x - g[x_col].transform("mean")
        cy = y - g[y_col].transform("mean")
        agg = (
            pd.DataFrame(
                {
                    key_col: pdf[key_col],
                    "ym": y,
                    "xm": x,
                    "sxy": cx * cy,
                    "sxx": cx * cx,
                }
            )
            .groupby(key_col, sort=False)
            .agg(
                n=(key_col, "size"),
                ym=("ym", "mean"),
                xm=("xm", "mean"),
                sxy=("sxy", "sum"),
                sxx=("sxx", "sum"),
            )
            .reset_index()
        )
        ok = (agg["n"] >= 2) & (agg["sxx"] != 0.0)
        slope = (agg["sxy"] / agg["sxx"]).where(ok)
        intercept = (agg["ym"] - slope * agg["xm"]).where(ok)
        yield pd.DataFrame(
            {
                "group_key": agg[key_col].astype("int64"),
                "n_points": agg["n"].astype("int64"),
                "slope": slope,
                "intercept": intercept,
            }
        )

    from pyspark.sql import functions as F

    clean = df.select(key_col, x_col, y_col).filter(
        F.col(key_col).isNotNull()
        & F.col(x_col).isNotNull()
        & F.col(y_col).isNotNull()
    )
    if not vectorized:
        return clean.groupBy(key_col).applyInPandas(_fit, TREND_SCHEMA)
    return clean.repartition(key_col).mapInPandas(
        _fit_partition, TREND_SCHEMA
    )


# Ship this module by VALUE to Spark python workers (see
# functions/crypto.py for the pattern).
try:  # pragma: no cover
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass
