"""Sparse retrieval operators for a training-data / RAG pipeline:
BM25 scoring with distributed top-k, and reciprocal-rank fusion of
independent rankings.

The reference engine has no text-retrieval surface (its closest shape is
the token/asset top-K report, SURVEY §2.4 Q14/Q15); these are the
LLM-pipeline extensions SURVEY §2.6 sanctions. Design rules shared with
the rest of the repo:

* JVM-side `pyspark.sql.functions` only — tokenization, tf, and the
  score arithmetic all stay inside whole-stage codegen.
* Exact-integer contract for oracle checkability: the default scoring
  path replaces BM25's `ln((N-df+0.5)/(df+0.5))` idf with the exact
  integer-scaled ODDS `((2(N-df)+1)·S) div (2df+1)` — the log is
  monotone in the odds, so each TERM's document ranking is preserved;
  the combined multi-term score is the documented "BM25-odds" variant,
  bit-identical in any engine with integer division. `exact=False`
  switches to the classical float-log formula for production ranking.
* The term-frequency saturation `tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))`
  is exactly rational for rational k1, b: with k1=6/5, b=3/4 and
  avgdl=L/N it equals `22·tf·L / (10·tf·L + 3·L + 9·dl·N)` — computed
  as a floor-scaled integer in DECIMAL(38,0) so corpus sizes past int64
  (L ~ 10¹³ tokens at 100 TB) cannot overflow.

Scale shape: one scan builds (doc, dl); docs are pre-filtered with
`arrays_overlap` BEFORE the token explode so only candidate documents
pay the explode; df and the (N, L) corpus scalars are tiny broadcast
dims; the final top-k is a `TakeOrderedAndProject` (per-partition heaps,
no global sort).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import tokens

# k1 = 6/5, b = 3/4 (the classical defaults, kept rational on purpose —
# see module docstring for the closed integer form they produce).
BM25_K1_NUM, BM25_K1_DEN = 6, 5
BM25_B_NUM, BM25_B_DEN = 3, 4


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 10**6,
    exact: bool = True,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query → (doc_id, score).

    exact=True (default): integer BM25-odds (engine-exact; `score` is a
    DECIMAL(38,0) rendered as a digit string). exact=False: classical
    float BM25 with the log idf (`score` double) — same plan shape.
    Only documents containing ≥1 query term are scored (retrieval
    semantics); ties at the k boundary break by ascending doc id.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    base = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__t")
    ).withColumn("__dl", F.size("__t").cast("long"))

    # corpus scalars: one row, broadcast (the same single-row-scalar
    # shape corpus.py uses for dataset totals)
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__dl").alias("__l")
    )

    terms_arr = F.array(*[F.lit(t) for t in query_terms])
    tf = (
        base.filter(F.arrays_overlap("__t", terms_arr))
        .select(id_col, "__dl", F.explode("__t").alias("term"))
        .filter(F.col("term").isin(query_terms))
        .groupBy(id_col, "__dl", "term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    # materialize tf ONCE: it feeds both the df aggregate and the scored
    # join, and lazily each consumer re-runs the tokenize+explode subtree
    # over the corpus (the common_neighbor_links / d04 lesson). The table
    # is ≤ |matched docs|·|terms| rows — cheap to pin.
    if not tf.isStreaming:
        tf = tf.localCheckpoint(eager=True)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
    )
    if exact:
        dec = "decimal(38,0)"
        idf = F.expr(
            f"(CAST(2 * (__n - __df) + 1 AS {dec}) * {scale})"
            f" div (2 * __df + 1)"
        )
        sat = F.expr(
            f"(CAST({scale} AS {dec}) * 22 * __tf * __l)"
            f" div (CAST(10 AS {dec}) * __tf * __l"
            f" + CAST(3 AS {dec}) * __l"
            f" + CAST(9 AS {dec}) * __dl * __n)"
        )
        contrib = (
            idf.cast(dec) * sat.cast(dec)
        ).cast(dec)
        agg = scored.withColumn("__c", contrib).groupBy(id_col).agg(
            F.sum("__c").cast(dec).alias("__score")
        )
        top = agg.orderBy(F.col("__score").desc(), F.col(id_col).asc()).limit(k)
        return top.select(
            id_col, F.col("__score").cast("string").alias("score")
        )
    idf = F.log(
        (F.col("__n") - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
    )
    k1 = BM25_K1_NUM / BM25_K1_DEN
    b = BM25_B_NUM / BM25_B_DEN
    avgdl = F.col("__l") / F.col("__n")
    sat = (F.col("__tf") * (k1 + 1)) / (
        F.col("__tf") + k1 * (1 - b + b * F.col("__dl") / avgdl)
    )
    agg = scored.withColumn("__c", idf * sat).groupBy(id_col).agg(
        F.sum("__c").alias("score")
    )
    return agg.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rk",
    k: int = 60,
    scale: int = 10**12,
    top: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of N independent rankings → (id,
    rrf_score): score = Σᵢ ⌊scale / (k + rankᵢ)⌋, summed over the
    rankings that contain the id (full-outer semantics — an id missing
    from one ranking simply contributes 0 from it, the standard RRF
    treatment of partial lists).

    The floor-scaled integer IS the contract (not an approximation of
    a float): at scale=10¹² two true RRF scores that differ do so by
    ≥ 1/(k+r)(k+r') > 10⁻¹² · scale for any realistic list length, so
    the integer order matches the real-valued order; being integer it
    is engine-exact. Each ranking is (id, rank) — produce ranks with
    `cumulative.ordered_prefix` so no input needs a single-task sort.
    Plan: N-1 equi-joins on the id; no ranking is rescanned.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    parts = [
        r.select(
            F.col(id_col),
            F.expr(f"CAST({scale} AS BIGINT) div ({k} + {rank_col})").alias(
                f"__s{i}"
            ),
        )
        for i, r in enumerate(rankings)
    ]
    fused = reduce(lambda a, b: a.join(b, id_col, "full_outer"), parts)
    score = reduce(
        lambda a, b: a + b,
        [F.coalesce(F.col(f"__s{i}"), F.lit(0)) for i in range(len(parts))],
    )
    out = fused.select(F.col(id_col), score.alias("rrf_score"))
    if top is not None:
        out = out.orderBy(
            F.col("rrf_score").desc(), F.col(id_col).asc()
        ).limit(top)
    return out


def retrieval_eval(
    docs: DataFrame,
    queries: dict[str, list[str]],
    relevance: DataFrame,
    k: int = 50,
    p_cut: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 10**6,
) -> DataFrame:
    """Ranking-quality evaluation over a labelled corpus — the offline
    eval loop of a retrieval stack (MRR / precision@N without the
    floats): for each named query, BM25-odds top-k is ranked exactly and
    scored against a per-doc boolean `relevance` table (doc_id, is_rel).

    Returns one row per query: n_topk, n_rel (relevant in top-k),
    first_rel_rank (the MRR numerator's rank, NULL when no relevant doc
    made the cut — exactly SQL's min-over-empty), rel_at_p
    (precision@`p_cut` numerator). All integers: MRR = mean(1/rank) and
    P@N = rel_at_p/p_cut follow driver-side.

    Scale shape: per query, the cost IS bm25_topk (pre-filtered explode,
    broadcast (N,L)/df dims, TakeOrderedAndProject top-k); the global
    rank over the ≤k survivors goes through `ordered_prefix` (never a
    single-task window), and the relevance join broadcasts the ≤k-row
    ranked side against the big labelled table."""
    from functools import reduce as _reduce

    from .cumulative import ordered_prefix

    outs = []
    for qname, terms in queries.items():
        top = bm25_topk(
            docs, terms, k=k, id_col=id_col, text_col=text_col, scale=scale
        )
        ranked = ordered_prefix(
            top.withColumn("__neg", -F.col("score")),
            order_cols=["__neg", id_col],
            row_col="rank",
        ).select(id_col, "rank")
        j = relevance.join(F.broadcast(ranked), id_col)
        rel = F.col("is_rel")
        outs.append(
            j.agg(
                F.count(F.lit(1)).alias("n_topk"),
                F.sum(rel.cast("long")).alias("n_rel"),
                F.min(F.when(rel, F.col("rank"))).alias("first_rel_rank"),
                F.sum(
                    (rel & (F.col("rank") <= p_cut)).cast("long")
                ).alias("rel_at_p"),
            ).select(F.lit(qname).alias("query"), "*")
        )
    return _reduce(lambda a, b: a.unionByName(b), outs)
