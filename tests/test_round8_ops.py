"""Round-8 operators: token-rank surprisal (zw1) and embedding Gram
sufficient statistics (zw2) — each checked against a trivially-correct
single-node recompute."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_token_rank_surprisal_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (0, "the the the cat"),
            (1, "the zyzzyva"),
            (2, "cat cat the"),
        ],
        "doc_id long, text string",
    )
    from ergo_uexplorer_spark.operators.textops import token_rank_surprisal

    got = {
        r["doc_id"]: (r["n_toks"], r["sum_rank"], r["mean_rank"])
        for r in token_rank_surprisal(docs).collect()
    }
    # counts: the=5, cat=3, zyzzyva=1 → ranks the=1, cat=2, zyzzyva=3
    assert got[0] == (4, 1 + 1 + 1 + 2, 1)  # common words → rank ~1
    assert got[1] == (2, 1 + 3, 2)  # rare-token doc scores higher
    assert got[2] == (3, 2 + 2 + 1, 1)


def test_token_rank_ties_break_lexically(spark):
    """Equal-count tokens rank by token text (both engines use the same
    tiebreak, so the ranks — not just the sums — are deterministic)."""
    docs = spark.createDataFrame(
        [(0, "bb aa"), (1, "aa bb")], "doc_id long, text string"
    )
    from ergo_uexplorer_spark.operators.textops import token_rank_surprisal

    got = {
        r["doc_id"]: r["sum_rank"]
        for r in token_rank_surprisal(docs).collect()
    }
    # aa and bb both count 2 → aa rank 1, bb rank 2
    assert got == {0: 3, 1: 3}


def test_embedding_gram_matches_numpy(spark):
    rng = np.random.default_rng(7)
    d, n = 5, 137  # odd row count across partitions
    X = rng.normal(size=(n, d)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    ).repartition(4)
    from ergo_uexplorer_spark.operators.similarity import (
        embedding_gram_stats,
    )

    scale = 10**6
    out = embedding_gram_stats(emb, scale=scale).collect()
    Q = np.floor(X.astype(np.float64) * scale + 0.5).astype(np.int64)
    G = Q.T @ Q
    s = Q.sum(axis=0)
    assert len(out) == d * (d + 1) // 2
    for r in out:
        i, j = r["i"], r["j"]
        assert i <= j
        assert r["n"] == n
        assert int(r["gram"]) == G[i, j]
        assert r["sum_i"] == s[i]
        assert r["sum_j"] == s[j]


def test_embedding_gram_empty_partitions(spark):
    """More partitions than rows: empty Arrow batches must not emit
    partial rows or crash the numpy kernel."""
    emb = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])],
        "vec_id long, embedding array<float>",
    ).repartition(8)
    from ergo_uexplorer_spark.operators.similarity import (
        embedding_gram_stats,
    )

    rows = {(r["i"], r["j"]): r for r in embedding_gram_stats(emb).collect()}
    assert set(rows) == {(0, 0), (0, 1), (1, 1)}
    m = 10**6
    assert int(rows[(0, 1)]["gram"]) == 1 * m * 2 * m + 3 * m * 4 * m
    assert rows[(0, 1)]["n"] == 2
