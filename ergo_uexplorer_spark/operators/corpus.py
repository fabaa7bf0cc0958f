"""Corpus cleaning: the composed training-data pipeline — exact dedup →
near-dup removal (MinHash+LSH) → quality gate — producing the kept-doc
set with its text signals. This is the operator a pretraining data job
actually runs; each stage is the already-verified primitive from
dedup.py / textops.py, composed with semi/anti joins so the corpus is
scanned once per stage and only ids flow between stages."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup as D
from . import textops as T


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    jaccard_num: int = 4,
    jaccard_den: int = 5,
) -> DataFrame:
    """Returns (doc_id, lang_pred, n_tokens) for documents that survive:
      1. exact dedup — keep the min-id canonical per normalized text;
      2. near-dup removal — for every verified LSH pair, drop the
         larger doc_id (deterministic victim rule);
      3. quality gate — ≥ min_tokens tokens.
    """
    canonical = (
        D.exact_dup_groups(docs, id_col, text_col)
        .select(F.col("keep_id").alias(id_col))
    )
    near_dup_victims = (
        D.minhash_lsh_pairs(docs, id_col, text_col, num=jaccard_num, den=jaccard_den)
        .select(F.col("doc_b").alias(id_col))
        .distinct()
    )
    # token array materialized before the score expressions (the CASE
    # chain references it ~20x; keep the regex split to one evaluation)
    signals = docs.select(
        F.col(id_col), T.tokens(F.col(text_col)).alias("t")
    ).select(
        F.col(id_col),
        F.size(F.col("t")).alias("n_tokens"),
        T.lang_pred(T.lang_scores(F.array_distinct(F.col("t")))).alias(
            "lang_pred"
        ),
    )
    return (
        signals.join(canonical, id_col, "left_semi")
        .join(near_dup_victims, id_col, "left_anti")
        .filter(F.col("n_tokens") >= min_tokens)
        .select(id_col, "lang_pred", "n_tokens")
    )
