"""Round-7 surface additions, batch 6 (zye1): distributed BPE merge
training, oracle-checked against an UNROLLED DuckDB replay of the same
algorithm — each merge round is one CTE trio (pair explode → argmax →
literal replace), so even the tie-breaks are engine-identical.

The Spark side is `operators/bpe.train_bpe_merges` (word-frequency
table + brace-wrapped symbol strings + driver-loop argmax; see that
module for the scale argument). pytest additionally pins the merge
sequence to a pure-python Sennrich-style reference
(tests/test_bpe.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .base import load, register

_N_MERGES = 6

_TOKS = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),"
    " x -> x <> '')"
)


def _bpe_oracle_sql(n_merges: int) -> str:
    """Unrolled n-round BPE training as one DuckDB query. Round i reads
    word-state st{i-1}, explodes adjacent symbol pairs (two zipped
    unnests), picks the (gain DESC, l, r) argmax as b{i}, and rewrites
    the state with a literal brace-wrapped replace — the exact
    construction the Spark operator runs, minus the driver loop."""
    parts = [
        "WITH st0 AS ("
        " SELECT '{' || array_to_string("
        "   list_transform(range(1, length(w)+1), i -> w[i]), '}{')"
        "   || '}' AS s, cnt"
        " FROM (SELECT w, count(*) AS cnt"
        f"       FROM (SELECT unnest({_TOKS}) AS w FROM documents)"
        "       GROUP BY 1))"
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f", t{i} AS (SELECT string_split(s[2:length(s)-1], '}}{{') AS t,"
            f" cnt FROM st{i - 1})"
            f", p{i} AS (SELECT"
            " unnest(list_transform(range(1, len(t)), j -> t[j])) AS l,"
            " unnest(list_transform(range(1, len(t)), j -> t[j+1])) AS r,"
            f" cnt FROM t{i})"
            f", b{i} AS (SELECT l, r, CAST(sum(cnt) AS BIGINT) AS gain"
            f" FROM p{i} GROUP BY 1, 2"
            " ORDER BY gain DESC, l ASC, r ASC LIMIT 1)"
            f", st{i} AS (SELECT replace(s,"
            " '{' || b.l || '}{' || b.r || '}',"
            " '{' || b.l || b.r || '}') AS s, cnt"
            f" FROM st{i - 1} CROSS JOIN b{i} b)"
        )
    selects = [
        f"SELECT {i} AS rank, l AS \"left\", r AS \"right\", gain FROM b{i}"
        for i in range(1, n_merges + 1)
    ]
    return "".join(parts) + " " + " UNION ALL ".join(selects)


@register(
    "zye1_bpe_merges",
    sql=_bpe_oracle_sql(_N_MERGES),
    survey_ref="LLM-pipeline: tokenizer construction — distributed BPE "
    "merge training on the word-frequency table "
    "(operators/bpe.train_bpe_merges; Sennrich et al. 2016)",
    tags=("text", "iterative"),
)
def zye1_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import train_bpe_merges

    (docs,) = load(spark, sf_dir, "documents")
    return train_bpe_merges(docs, n_merges=_N_MERGES)
