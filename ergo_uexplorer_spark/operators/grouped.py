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
    df: DataFrame, key_col: str, x_col: str, y_col: str
) -> DataFrame:
    """OLS y ~ x per group (closed form), one pandas batch per group.
    Returns (group_key, n_points, slope, intercept); slope is null for
    degenerate groups (n < 2 valid points or zero x-variance).

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

    from pyspark.sql import functions as F

    clean = df.select(key_col, x_col, y_col).filter(
        F.col(key_col).isNotNull()
        & F.col(x_col).isNotNull()
        & F.col(y_col).isNotNull()
    )
    return clean.groupBy(key_col).applyInPandas(_fit, TREND_SCHEMA)


# Ship this module by VALUE to Spark python workers (see
# functions/crypto.py for the pattern).
try:  # pragma: no cover
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass
