"""Similarity search over embedding columns (`array<float>`).

Brute-force cosine top-k is the exactness baseline: broadcast the (small)
query set, crossJoin against the corpus — the corpus side never shuffles,
so this scales linearly with corpus size × |queries|. The LSH variant
(random ±1 hyperplanes → sign-bit bucket) prunes candidates to one bucket
per query: that is the 100-TB path (bucket id is a join key, so the
corpus is hash-partitioned by bucket and each query touches ~1/2^P of it).

Dot products/norms use `zip_with` + `aggregate` (JVM-side, codegen) — a
left-to-right fold in double precision, bit-identical to DuckDB's
`list_sum(list_transform(...))`, which keeps the oracle hash stable.
No pandas UDF needed at 64 dims; for very wide vectors swap in a
vectorized pandas_udf with the same signature.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# hyperplane-LSH constants (seeded ±1 planes, shared with the SQL oracle)
# ---------------------------------------------------------------------------
LSH_PLANES = 4
EMB_DIM = 64
_rng = random.Random(7)
PLANES: tuple[tuple[int, ...], ...] = tuple(
    tuple(_rng.choice((-1, 1)) for _ in range(EMB_DIM)) for _ in range(LSH_PLANES)
)


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold double dot product (portable across engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus, per-query window.

    Returns (q_id, n_id, cos_sim) with deterministic (cos desc, id asc)
    ranking; self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("nv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos_sim", cosine(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "n_id", "cos_sim")
    )


def near_dup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (a < b, cos ≥ threshold) — the
    exact all-pairs baseline with per-vector norms computed once.

    O(n²) by definition; at corpus scale route through `lsh_topk`-style
    bucketing (or IVF centroids) first and verify only bucket collisions
    — same composition as MinHash→verify in dedup.py."""
    e = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("norm"),
    )
    a = e.select(
        F.col("vid").alias("vec_a"), F.col("v").alias("va"), F.col("norm").alias("na")
    )
    b = e.select(
        F.col("vid").alias("vec_b"), F.col("v").alias("vb"), F.col("norm").alias("nb")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cos_sim", dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
    )


def _bucket(vec: Column) -> Column:
    """Sign-bit bucket id from the fixed ±1 hyperplanes."""
    out = F.lit(0)
    for p, plane in enumerate(PLANES):
        lit_plane = F.array(*[F.lit(float(v)) for v in plane])
        out = out + F.when(dot(vec, lit_plane) > 0, F.lit(1 << p)).otherwise(0)
    return out


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    exact cosine inside the bucket. Join on bucket ⇒ corpus partitioned by
    bucket, each query scans ~1/2^PLANES of the data."""
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("qv"),
        _bucket(F.col(vec_col)).alias("bucket"),
    )
    c = emb.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("nv"),
        _bucket(F.col(vec_col)).alias("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos_sim", cosine(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "n_id", "cos_sim")
    )
