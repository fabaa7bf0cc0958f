"""Round-7 surface additions, batch 8 (zyg1–zyg2): OHLC time-series
bars and exact per-class embedding centroid statistics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load, register

DAY_NS = 86_400_000_000_000
_CENT_SCALE = 10**6


# --------------------------------------------------------------------------
# zyg1: OHLC bars — per (event_type, day): open/close at the first/last
# (ts, event_id), high/low/volume. One hash-agg via min_by/max_by over
# the composite key — no window, no sort (the time-series downsampling
# primitive). The oracle uses rank-1 windows (DuckDB 1.0's arg_min
# cannot take a composite ordering key).
# --------------------------------------------------------------------------
@register(
    "zyg1_ohlc_bars",
    sql=f"""
    WITH e AS (
      SELECT event_type, epoch_ns(ts) AS tsn, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             epoch_ns(ts) // {DAY_NS} AS day
      FROM events
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, day
                                ORDER BY tsn ASC, event_id ASC) AS ra,
             row_number() OVER (PARTITION BY event_type, day
                                ORDER BY tsn DESC, event_id DESC) AS rd
      FROM e
    )
    SELECT event_type, CAST(day AS BIGINT) AS day,
           CAST(min(CASE WHEN ra = 1 THEN cents END) AS BIGINT) AS open,
           CAST(max(cents) AS BIGINT) AS high,
           CAST(min(cents) AS BIGINT) AS low,
           CAST(min(CASE WHEN rd = 1 THEN cents END) AS BIGINT) AS close,
           count(*) AS n_events,
           CAST(sum(cents) AS BIGINT) AS volume
    FROM r GROUP BY 1, 2
    """,
    survey_ref="e02 family: OHLC bar downsampling in one min_by/max_by "
    "hash-agg (stats.ohlc_bars)",
    tags=("temporal", "agg"),
)
def zyg1_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import ohlc_bars

    (events,) = load(spark, sf_dir, "events")
    e = events.select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.expr(f"ts div {DAY_NS}").cast("long").alias("day"),
    )
    return ohlc_bars(e, ["event_type", "day"], "ts", "event_id", "cents")


# --------------------------------------------------------------------------
# zyg2: per-class embedding centroid sufficient statistics — exact
# integer numerators (order-independent sums; float reductions would be
# partition-order-dependent), the class-prototype builder for SemDeDup
# seeding / drift monitoring. Floats widen to DOUBLE before scaling on
# BOTH engines (multiplying in float32 rounds differently).
# --------------------------------------------------------------------------
@register(
    "zyg2_centroid_stats",
    sql=f"""
    SELECT label, dim, count(*) AS n,
           CAST(sum(CAST(floor(CAST(e AS DOUBLE) * {_CENT_SCALE})
                         AS HUGEINT)) AS VARCHAR) AS sx
    FROM (
      SELECT label, unnest(embedding) AS e,
             unnest(range(0, len(embedding))) AS dim
      FROM embeddings
      WHERE embedding IS NOT NULL
        AND len(list_filter(embedding,
                            x -> x IS NULL OR isnan(x)
                                 OR NOT isfinite(x))) = 0
    )
    GROUP BY 1, 2
    """,
    survey_ref="s01/z23 family support: exact class-centroid sufficient "
    "stats (similarity.embedding_centroid_stats)",
    tags=("similarity", "agg"),
)
def zyg2_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import embedding_centroid_stats

    (emb,) = load(spark, sf_dir, "embeddings")
    out = embedding_centroid_stats(emb, scale=_CENT_SCALE)
    return out.select(
        "label",
        F.col("dim").cast("long").alias("dim"),
        "n",
        F.col("sx").cast("string").alias("sx"),
    )
