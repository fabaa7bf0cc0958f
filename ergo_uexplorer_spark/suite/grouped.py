"""Grouped-map surface: per-user value trend over event time via
applyInPandas, oracle = the identical closed form in SQL. Both sides
compute on hours-since-epoch-offset doubles and round to 4 decimals
(the only FP-sensitive suite entry; the closed forms are identical
expressions, engines differ only in summation order ulps)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.grouped import per_group_linear_trend
from .base import load, register

_X_OFFSET_NS = 1_700_000_000_000_000_000
_HOUR_NS = 3_600_000_000_000.0


@register(
    "zz_u01_user_value_trend",
    sql=f"""
    WITH e AS (
      SELECT user_id,
             (epoch_ns(ts) - {_X_OFFSET_NS}) / {_HOUR_NS} AS x,
             value AS y
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
    ),
    m AS (SELECT user_id, avg(x) AS xm, avg(y) AS ym, count(*) AS n
          FROM e GROUP BY user_id)
    SELECT e.user_id AS group_key,
           any_value(m.n) AS n_points,
           round(sum((x - xm) * (y - ym)) / sum((x - xm) * (x - xm)), 4)
             AS slope
    FROM e JOIN m USING (user_id)
    GROUP BY e.user_id
    """,
    survey_ref="grouped-map analytics (applyInPandas)",
    tags=("grouped", "pandas"),
)
def zz_u01_user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    prepared = events.select(
        "user_id",
        ((F.col("ts") - F.lit(_X_OFFSET_NS)) / F.lit(_HOUR_NS)).alias("x"),
        F.col("value").alias("y"),
    )
    out = per_group_linear_trend(prepared, "user_id", "x", "y")
    return out.select(
        "group_key", "n_points", F.round("slope", 4).alias("slope")
    )
