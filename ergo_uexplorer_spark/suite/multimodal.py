"""Oracle-checked multimodal plumbing: the `documents` table is lifted
into MEDIA_SCHEMA-shaped rows (content = utf-8 bytes), run through the
REAL mapInPandas feature-extraction path with the deterministic fake
codec, and verified against a DuckDB oracle that recomputes byte counts,
sha256 digests, and an integer-exact feature checksum (the fake features
are digest_byte/255.0, so Σ round(f·255) equals the sum of the first 16
digest bytes — no float comparison anywhere)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import FEATURE_DIM, extract_features
from .base import load, register

_TYPES = ("image", "audio", "video")


@register(
    "zz_m01_multimodal_features",
    sql=f"""
    SELECT doc_id AS media_id,
           ['image', 'audio', 'video'][CAST(((doc_id % 3) + 3) % 3 AS INT) + 1]
             AS media_type,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha256,
           CAST(list_sum(list_transform(range(0, {FEATURE_DIM}),
                 i -> ('0x' || substr(sha256(text), 2*i + 1, 2))::BIGINT))
                AS BIGINT) AS feature_checksum
    FROM documents
    """,
    survey_ref="LLM-pipeline: multimodal columns (mapInPandas feature extraction)",
    tags=("multimodal", "pandas"),
)
def zz_m01_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        # pmod, not %: Spark's % keeps the dividend's sign, so a
        # negative doc_id yields index 0 and element_at THROWS
        # (executor-killing on one dirty row — the dirty-twin sweep's
        # finding); pmod is total and matches the oracle's
        # ((x % 3) + 3) % 3
        F.when(
            F.col("doc_id").isNotNull(),
            F.element_at(
                F.array(*[F.lit(t) for t in _TYPES]),
                F.pmod(F.col("doc_id"), F.lit(3)).cast("int") + 1,
            ),
        ).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("string").alias("format"),
        ).alias("meta"),
    )
    feats = extract_features(media)
    checksum = F.aggregate(
        F.transform(F.col("features"), lambda x: F.round(x * 255).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return feats.select(
        "media_id",
        "media_type",
        "n_bytes",
        "content_sha256",
        checksum.alias("feature_checksum"),
    )
