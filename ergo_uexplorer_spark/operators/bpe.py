"""Distributed BPE (byte-pair encoding) merge training — the tokenizer-
construction step of an LLM data pipeline, Spark-first.

Key scale insight (Sennrich et al., ACL 2016): BPE training never needs
the corpus — it operates on the WORD-FREQUENCY table (distinct words ×
counts), which is orders of magnitude smaller than the text (≈10⁷ rows
against 100 TB). So: one corpus pass builds the word table; each merge
round is then one explode+hash-agg over the word dim plus a 1-row
argmax collect, and the state update is a LITERAL string replace (the
chosen pair is a driver-side constant — no join).

Symbol-sequence representation: each word's current segmentation is a
single string of brace-wrapped symbols, `{a}{b}{c}` — merging pair
(a, b) is `replace(s, '{a}{b}', '{ab}')`, a plain (regex-free,
whole-stage-codegen) string substitution. The wrappers force exact
token boundaries (symbols are [a-z0-9]+, so braces never collide), and
left-to-right non-overlapping replacement is exactly the reference BPE
merge order ('{a}{a}{a}' with pair (a,a) → '{aa}{a}'). The same
representation drives the DuckDB oracle, making even the merge
tie-breaks engine-identical.

Ties break by (gain DESC, left ASC, right ASC) — deterministic across
engines and partitionings. No end-of-word marker (a documented contract
choice; add one by appending a sentinel char per word upstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PAIR_STRUCTS = (
    "transform(sequence(1, size(__t) - 1),"
    " i -> struct(element_at(__t, i) AS l, element_at(__t, i + 1) AS r))"
)


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the tokenized corpus — BPE training's only input."""
    from .textops import tokens

    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_state(words: DataFrame) -> DataFrame:
    wrapped = F.expr(
        "concat('{', array_join(transform(sequence(1, length(w)),"
        " i -> substring(w, i, 1)), '}{'), '}')"
    )
    return words.select(wrapped.alias("s"), "cnt")


def _pair_gains(state: DataFrame) -> DataFrame:
    toks = F.split(
        F.expr("substring(s, 2, length(s) - 2)"), r"\}\{"
    )
    pairs = F.when(F.size("__t") >= 2, F.expr(_PAIR_STRUCTS)).otherwise(
        F.array().cast("array<struct<l:string,r:string>>")
    )
    return (
        state.withColumn("__t", toks)
        .select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("gain"))
    )


def train_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Learn the first `n_merges` BPE merges → (rank, left, right, gain):
    rank-th merge joins symbols (left, right), which co-occurred
    adjacently `gain` (frequency-weighted) times at that point.

    Driver loop of n_merges rounds; per round one hash-agg + a 1-row
    collect over the WORD table (see module docstring for why that is
    the scale-correct input), with lineage truncated every
    `checkpoint_every` rounds (the pagerank posture, graph.py). Stops
    early if no pair remains."""
    state = _initial_state(word_frequencies(docs, text_col)).localCheckpoint(
        eager=True
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_gains(state)
            .orderBy(F.desc("gain"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        b = best[0]
        merges.append((rank, b.l, b.r, int(b.gain)))
        state = state.withColumn(
            "s",
            F.replace(
                F.col("s"),
                F.lit("{" + b.l + "}{" + b.r + "}"),
                F.lit("{" + b.l + b.r + "}"),
            ),
        )
        if checkpoint_every and rank % checkpoint_every == 0:
            state = state.localCheckpoint(eager=True)
    return state.sparkSession.createDataFrame(
        merges, "rank long, left string, right string, gain long"
    )


def bpe_segment(
    df: DataFrame,
    word_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "pieces",
) -> DataFrame:
    """Apply trained merges to words → `out_col` as the array of BPE
    pieces. The merge list is a driver-side constant, so application is
    a chain of literal string replaces over the brace representation —
    no join, no UDF, fully codegen'd; cost is O(n_merges) substring
    scans per word (fine for vocabulary-sized merge lists; production
    tokenizers compile a trie, which is an encoding detail, not a plan
    shape)."""
    s = F.expr(
        f"concat('{{', array_join(transform(sequence(1, length({word_col})),"
        f" i -> substring({word_col}, i, 1)), '}}{{'), '}}')"
    )
    for left, right in merges:
        s = F.replace(
            s,
            F.lit("{" + left + "}{" + right + "}"),
            F.lit("{" + left + right + "}"),
        )
    pieces = F.split(
        F.expr(
            "substring(__s, 2, length(__s) - 2)"
        ),
        r"\}\{",
    )
    return df.withColumn("__s", s).withColumn(out_col, pieces).drop("__s")
