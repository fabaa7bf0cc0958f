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


def ivf_build_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """IVF coarse quantizer: k-means with deterministic init (the first
    n_centroids vectors by id) and a fixed iteration count, computed with
    DataFrame aggregations (posexplode → mean per (cluster, dim) — never
    collects vectors beyond the centroid table). Returns the centroid
    list for broadcast."""
    cents = [
        [float(x) for x in r[vec_col]]
        for r in emb.orderBy(id_col).limit(n_centroids).collect()
    ]
    for _ in range(iters):
        assigned = ivf_assign(emb, cents, id_col, vec_col)
        dims = assigned.select(
            "centroid_id", F.posexplode(F.col(vec_col)).alias("dim", "x")
        )
        means = (
            dims.groupBy("centroid_id", "dim")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        new = {c: list(cents[c]) for c in range(len(cents))}
        for r in means:
            new[r["centroid_id"]][r["dim"]] = r["m"]
        cents = [new[c] for c in range(len(cents))]
    return cents


def ivf_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment by cosine. One struct per centroid,
    argmax via `array_max` (struct ordering: cosine first, then -cell so
    ties go to the smaller cell id). Linear expression size — a chained
    when/otherwise would nest each comparison inside the next and blow
    the analyzer up exponentially."""
    structs = []
    for ci, cent in enumerate(centroids):
        lit_c = F.array(*[F.lit(float(v)) for v in cent])
        structs.append(
            F.struct(
                cosine(F.col(vec_col), lit_c).alias("c"),
                F.lit(-ci).alias("negcell"),
            )
        )
    best = F.array_max(F.array(*structs))
    return emb.withColumn("centroid_id", (-best["negcell"]).cast("int"))


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: corpus partitioned by nearest centroid; each query
    probes its `n_probes` closest centroid cells and ranks exactly inside
    them. The join key is the cell id, so at scale each query touches
    ~n_probes/n_centroids of the corpus (same shape as lsh_topk, but the
    cells are data-adaptive)."""
    corpus = ivf_assign(emb, centroids, id_col, vec_col).select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("nv"),
        F.col("centroid_id").alias("cell"),
    )
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
    probe_rows = []
    for ci, cent in enumerate(centroids):
        lit_c = F.array(*[F.lit(float(v)) for v in cent])
        probe_rows.append(
            F.struct(F.lit(ci).alias("cell"), cosine(F.col("qv"), lit_c).alias("c"))
        )
    probes = q.withColumn(
        "cells",
        F.slice(
            F.reverse(F.array_sort(F.array(*probe_rows), _cos_then_cell)),
            1,
            n_probes,
        ),
    ).select("q_id", "qv", F.explode("cells.cell").alias("cell"))
    scored = (
        F.broadcast(probes)
        .join(corpus, "cell")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos_sim", cosine(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "n_id", "cos_sim")
    )


def _cos_then_cell(a: Column, b: Column) -> Column:
    """array_sort comparator: ascending by cosine then cell id (reversed
    afterwards → best cells first, deterministic ties)."""
    return F.when(a["c"] < b["c"], -1).when(a["c"] > b["c"], 1).otherwise(
        F.when(a["cell"] < b["cell"], -1).when(a["cell"] > b["cell"], 1).otherwise(0)
    )


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
