"""Round-8 surface additions (zw1–zw2): CCNet-style integer-exact LM
quality scoring and covariance/whitening sufficient statistics.

Names sort BEFORE zx1 so they enter the driver's recorded 50-name
CORRECTNESS window by displacing only entries that already hold
driver-recorded rows from round 7 (the registry freeze policy — no
renames, additions sort into the window; see PARITY.md).

Exactness rules follow suite/base.py: integer ranks instead of log
probabilities, quantized-integer second moments with HUGEINT/DECIMAL
accumulation rendered as strings on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load, register
from .textops import _TOKS

_GRAM_SCALE = 10**6
_EMB_DIM = 64


# --------------------------------------------------------------------------
# zw1: token-rank surprisal — the CCNet/DataComp LM-quality filter signal
# (docs dominated by rare tokens score high), integer-exact by scoring
# mean global FREQUENCY RANK instead of log-probability. The global rank
# over the vocabulary runs through ordered_prefix (range-partitioned
# row_number + one-row-per-partition boundary correction), never a
# single-task window; the token→rank join is keyed by token, the same
# key as the vocab agg's exchange.
# --------------------------------------------------------------------------
@register(
    "zw1_token_rank_surprisal",
    sql=f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
    ranked AS (
      SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS rnk
      FROM vocab
    )
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_toks,
           CAST(sum(r.rnk) AS BIGINT) AS sum_rank,
           CAST(sum(r.rnk) // count(*) AS BIGINT) AS mean_rank
    FROM toks t JOIN ranked r ON t.tok = r.tok
    GROUP BY 1
    """,
    survey_ref="LLM-pipeline: unigram-LM quality scoring, rank-exact "
    "(textops.token_rank_surprisal)",
    tags=("text", "agg", "curation"),
    bench=True,
)
def zw1_token_rank_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textops import token_rank_surprisal

    (docs,) = load(spark, sf_dir, "documents")
    return token_rank_surprisal(docs)


# --------------------------------------------------------------------------
# zw2: embedding Gram/covariance sufficient statistics — the whitening /
# PCA / ZCA prep for the ANN stack: upper-triangle Σ qᵢqⱼ + per-dim sums
# over integer-quantized vectors (order-independent, exact). Spark side
# is one numpy matmul per Arrow batch via mapInPandas + a d(d+1)/2-group
# final agg — shuffle volume independent of row count. The oracle pays
# the d² row blow-up instead (fine at suite SFs).
# --------------------------------------------------------------------------
@register(
    "zw2_embedding_gram",
    sql=f"""
    WITH q AS (
      SELECT list_transform(
               embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {_GRAM_SCALE} + 0.5)
                         AS BIGINT)) AS qv
      FROM embeddings
    ),
    p AS (
      SELECT i.range AS i, j.range AS j
      FROM range({_EMB_DIM}) i, range({_EMB_DIM}) j
      WHERE i.range <= j.range
    )
    SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(qv[p.i + 1] * qv[p.j + 1] AS HUGEINT))
                AS VARCHAR) AS gram,
           CAST(sum(qv[p.i + 1]) AS BIGINT) AS sum_i,
           CAST(sum(qv[p.j + 1]) AS BIGINT) AS sum_j
    FROM q, p
    GROUP BY 1, 2
    """,
    survey_ref="LLM-pipeline: covariance/whitening sufficient stats "
    "(similarity.embedding_gram_stats)",
    tags=("similarity", "agg"),
)
def zw2_embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import embedding_gram_stats

    (emb,) = load(spark, sf_dir, "embeddings")
    out = embedding_gram_stats(emb, scale=_GRAM_SCALE)
    return out.select(
        F.col("i").cast("long").alias("i"),
        F.col("j").cast("long").alias("j"),
        "n",
        F.col("gram").cast("string").alias("gram"),
        "sum_i",
        "sum_j",
    )
