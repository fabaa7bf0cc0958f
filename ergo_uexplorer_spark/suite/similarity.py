"""Similarity-search surface bound to the `embeddings` table. The cosine
formula is the identical sequential double fold on both engines (see
operators/similarity.py), so values hash-match; output similarity is
rounded to 3 decimals on both sides."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as S
from .base import load, register

_N_QUERIES = 5  # vec_id < 5 are the query vectors

_DOT = (
    "list_sum(list_transform(range(1, {dim} + 1),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _sql_cos(a: str, b: str) -> str:
    d = _DOT.format(dim=S.EMB_DIM, a=a, b=b)
    na = _DOT.format(dim=S.EMB_DIM, a=a, b=a)
    nb = _DOT.format(dim=S.EMB_DIM, a=b, b=b)
    return f"({d} / (sqrt({na}) * sqrt({nb})))"


# --------------------------------------------------------------------------
# brute-force cosine top-k (exact baseline)
# --------------------------------------------------------------------------
_BRUTE_SQL = f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings
               WHERE vec_id < {_N_QUERIES}),
    c AS (SELECT vec_id AS n_id, embedding AS nv FROM embeddings),
    scored AS (
      SELECT q_id, n_id, {_sql_cos('qv', 'nv')} AS cos
      FROM q CROSS JOIN c WHERE q_id <> n_id
    ),
    ranked AS (
      SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rn
      FROM scored
    )
    SELECT q_id, n_id, round(cos, 3) AS cos_sim FROM ranked WHERE rn <= 10
"""


@register(
    "s01_ann_bruteforce_cosine",
    sql=_BRUTE_SQL,
    survey_ref="LLM-pipeline: exact cosine top-k",
    tags=("similarity", "topk"),
    bench=True,
)
def s01_ann_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load(spark, sf_dir, "embeddings")
    out = S.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < _N_QUERIES), k=10
    )
    return out.select("q_id", "n_id", F.round("cos_sim", 3).alias("cos_sim"))


# --------------------------------------------------------------------------
# embedding-cosine near-dup pairs: banded hyperplane-LSH candidates +
# exact cosine verify. The oracle mirrors the seeded bands literally, so
# both engines produce the identical deterministic pair set (the LSH
# recall curve is a property of the operator, not an engine divergence).
# --------------------------------------------------------------------------
_NEAR_DUP_T = 0.4  # the synthetic embeddings have no planted dups
                   # (max pairwise cos ≈ 0.51) — 0.4 exercises the shape


def _sql_nd_bucket(vec: str, band: int) -> str:
    terms = []
    for p, plane in enumerate(S.ND_PLANES[band]):
        lit = "[" + ", ".join(f"{float(v)}" for v in plane) + "]"
        d = _DOT.format(dim=S.EMB_DIM, a=vec, b=f"({lit}::DOUBLE[])")
        terms.append(f"(CASE WHEN {d} > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _near_dup_sql() -> str:
    band_rows = " UNION ALL ".join(
        f"SELECT vid, {band} AS band, {_sql_nd_bucket('v', band)} AS bkt FROM e"
        for band in range(S.ND_BANDS)
    )
    d_xy = _DOT.format(dim=S.EMB_DIM, a="x.v", b="y.v")
    return f"""
    WITH e AS (
      SELECT vec_id AS vid, embedding AS v,
             sqrt({_DOT.format(dim=S.EMB_DIM, a='embedding', b='embedding')}) AS norm
      FROM embeddings
    ),
    bands AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.vid AS vec_a, b.vid AS vec_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkt = b.bkt AND a.vid < b.vid
    )
    SELECT c.vec_a, c.vec_b,
           round({d_xy} / (x.norm * y.norm), 3) AS cos_sim
    FROM cand c JOIN e x ON c.vec_a = x.vid JOIN e y ON c.vec_b = y.vid
    WHERE {d_xy} / (x.norm * y.norm) >= {_NEAR_DUP_T}
    """


@register(
    "d05_dedup_embedding_cosine",
    sql=_near_dup_sql(),
    survey_ref="LLM-pipeline: embedding-cosine near-dup (banded LSH + verify)",
    tags=("dedup", "similarity"),
)
def d05_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load(spark, sf_dir, "embeddings")
    out = S.near_dup_pairs(emb, threshold=_NEAR_DUP_T)
    return out.select("vec_a", "vec_b", F.round("cos_sim", 3).alias("cos_sim"))


# --------------------------------------------------------------------------
# hyperplane-LSH bucketed ANN (scale path)
# --------------------------------------------------------------------------
def _sql_bucket(vec: str) -> str:
    terms = []
    for p, plane in enumerate(S.PLANES):
        lit = "[" + ", ".join(f"{float(v)}" for v in plane) + "]"
        d = _DOT.format(dim=S.EMB_DIM, a=vec, b=f"({lit}::DOUBLE[])")
        terms.append(f"(CASE WHEN {d} > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


_LSH_SQL = f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS qv,
                      {_sql_bucket('embedding')} AS bucket
               FROM embeddings WHERE vec_id < {_N_QUERIES}),
    c AS (SELECT vec_id AS n_id, embedding AS nv,
                 {_sql_bucket('embedding')} AS bucket
          FROM embeddings),
    scored AS (
      SELECT q_id, n_id, {_sql_cos('qv', 'nv')} AS cos
      FROM q JOIN c USING (bucket) WHERE q_id <> n_id
    ),
    ranked AS (
      SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rn
      FROM scored
    )
    SELECT q_id, n_id, round(cos, 3) AS cos_sim FROM ranked WHERE rn <= 5
"""


@register(
    "s02_ann_lsh_bucketed",
    sql=_LSH_SQL,
    survey_ref="LLM-pipeline: hyperplane-LSH ANN (scale path)",
    tags=("similarity", "sketch", "topk"),
)
def s02_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load(spark, sf_dir, "embeddings")
    out = S.lsh_topk(emb, emb.filter(F.col("vec_id") < _N_QUERIES), k=5)
    return out.select("q_id", "n_id", F.round("cos_sim", 3).alias("cos_sim"))
