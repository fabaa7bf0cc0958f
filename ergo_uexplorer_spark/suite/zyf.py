"""Round-7 surface additions, batch 7 (zyf1–zyf2): k-core decomposition
(iterative peel, unrolled-replay oracle) and BPE tokenizer-fertility-by-
source analytics (composes the zye1 trainer).

Both oracles REPLAY the iterative algorithm round by round in DuckDB —
the BPE-oracle construction pattern — so there is no weakened rows-only
check anywhere in the registry."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load, register

_KCORE_K = 20
_KCORE_ROUNDS = 10  # oracle unroll == operator max_rounds (idempotent
# past convergence; testdata converges in ≤6 — probed at both SFs)

_N_MERGES = 6
_TOKS = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),"
    " x -> x <> '')"
)


def _kcore_oracle_sql(k: int, rounds: int) -> str:
    """Unrolled peel: round i keeps nodes whose degree within the
    round-(i-1) survivor subgraph is ≥ k. Node ids namespace the
    bipartite sides (customer = 2·key, part = 2·key + 1).

    Every chained CTE is MATERIALIZED: each s{i} is referenced TWICE by
    g{i+1}, and DuckDB's default inlining re-evaluates the whole prefix
    per reference — the logical tree doubles per round, turning an
    8-round peel into ~2^8 re-evaluations (measured: ~9 MINUTES at
    sf0.001 vs seconds materialized; the exact pathology the engine
    side avoids with per-round checkpoints). Same values, linear
    plan."""
    parts = [
        "WITH be AS MATERIALIZED (SELECT DISTINCT o_custkey * 2 AS c,"
        " l_partkey * 2 + 1 AS p"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey),"
        " e0 AS MATERIALIZED (SELECT c AS a, p AS b FROM be"
        " UNION ALL SELECT p AS a, c AS b FROM be),"
        " s0 AS MATERIALIZED (SELECT DISTINCT a AS v, 0 AS d FROM e0)"
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f", g{i} AS MATERIALIZED (SELECT e0.a, e0.b FROM e0"
            f" JOIN s{i - 1} sa ON e0.a = sa.v"
            f" JOIN s{i - 1} sb ON e0.b = sb.v)"
            f", s{i} AS MATERIALIZED (SELECT a AS v, count(*) AS d"
            f" FROM g{i}"
            f" GROUP BY 1 HAVING count(*) >= {k})"
        )
    return (
        "".join(parts)
        + f" SELECT v, CAST(d AS BIGINT) AS deg FROM s{rounds}"
    )


@register(
    "zyf1_kcore",
    sql=_kcore_oracle_sql(_KCORE_K, _KCORE_ROUNDS),
    survey_ref="Q19/graph family: k-core decomposition (iterative peel; "
    "graph.kcore) — cascade-correct cohesion, not a one-shot degree "
    "filter",
    tags=("graph", "iterative"),
)
def zyf1_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import kcore

    lineitem, orders = load(spark, sf_dir, "lineitem", "orders")
    be = (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .select(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_partkey") * 2 + 1).alias("b"),
        )
        .distinct()
    )
    return kcore(be, k=_KCORE_K, max_rounds=_KCORE_ROUNDS)


def _fertility_oracle_sql(n_merges: int) -> str:
    """zye1's unrolled BPE replay, carrying the word through the state
    chain; fertility = pieces per token, reported per source as exact
    integer sufficient statistics."""
    parts = [
        "WITH wf AS (SELECT w, count(*) AS cnt FROM"
        f" (SELECT unnest({_TOKS}) AS w FROM documents) GROUP BY 1),"
        " st0 AS (SELECT w, '{' || array_to_string("
        "   list_transform(range(1, length(w)+1), i -> w[i]), '}{')"
        "   || '}' AS s, cnt FROM wf)"
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f", t{i} AS (SELECT string_split(s[2:length(s)-1], '}}{{') AS t,"
            f" cnt FROM st{i - 1})"
            f", p{i} AS (SELECT"
            " unnest(list_transform(range(1, len(t)), j -> t[j])) AS l,"
            " unnest(list_transform(range(1, len(t)), j -> t[j+1])) AS r,"
            f" cnt FROM t{i})"
            f", b{i} AS (SELECT l, r FROM p{i} GROUP BY 1, 2"
            " ORDER BY sum(cnt) DESC, l ASC, r ASC LIMIT 1)"
            f", st{i} AS (SELECT w, replace(s,"
            " '{' || b.l || '}{' || b.r || '}',"
            " '{' || b.l || b.r || '}') AS s, cnt"
            f" FROM st{i - 1} CROSS JOIN b{i} b)"
        )
    parts.append(
        ", pieces AS (SELECT w,"
        " len(string_split(s[2:length(s)-1], '}{')) AS np"
        f" FROM st{n_merges}),"
        " sw AS (SELECT source, w, count(*) AS cw FROM"
        f" (SELECT source, unnest({_TOKS}) AS w FROM documents)"
        " GROUP BY 1, 2)"
        " SELECT source, CAST(sum(cw) AS BIGINT) AS n_tokens,"
        " CAST(sum(cw * np) AS BIGINT) AS n_pieces"
        " FROM sw JOIN pieces USING (w) GROUP BY 1"
    )
    return "".join(parts)


@register(
    "zyf2_bpe_fertility",
    sql=_fertility_oracle_sql(_N_MERGES),
    survey_ref="LLM-pipeline: tokenizer fertility by source (pieces per "
    "token under the zye1-trained merges; bpe.bpe_segment) — the "
    "which-sources-tokenize-worse curation signal",
    tags=("text", "quality"),
)
def zyf2_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import (
        bpe_segment,
        train_bpe_merges,
        word_frequencies,
    )
    from ..operators.textops import tokens

    (docs,) = load(spark, sf_dir, "documents")
    merges = [
        (r.left, r.right)
        for r in train_bpe_merges(docs, n_merges=_N_MERGES)
        .orderBy("rank")
        .collect()
    ]
    pieces = bpe_segment(word_frequencies(docs), "w", merges).select(
        "w", F.size("pieces").alias("np")
    )
    sw = (
        docs.select(
            "source", F.explode(tokens(F.col("text"))).alias("w")
        )
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    return (
        sw.join(pieces, "w")
        .groupBy("source")
        .agg(
            F.sum("cw").cast("long").alias("n_tokens"),
            F.sum(F.col("cw") * F.col("np")).cast("long").alias("n_pieces"),
        )
    )
