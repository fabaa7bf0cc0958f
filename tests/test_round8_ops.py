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


def test_char_collision_stats_hand_computed(spark):
    """'aabcc' → n=5, distinct=3, Σc² = 4+1+4 = 9; empty text → zeros;
    single char → 1/1/1. The fold is zero-shuffle, so correctness here
    is the whole story (no boundary cases from partitioning exist)."""
    from ergo_uexplorer_spark.operators.textops import char_collision_stats

    docs = spark.createDataFrame(
        [(0, "aabcc"), (1, ""), (2, "z"), (3, "abab")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in char_collision_stats(docs).collect()}
    assert (got[0]["n_chars"], got[0]["n_distinct"], got[0]["sum_sq"]) == (
        5,
        3,
        9,
    )
    assert (got[1]["n_chars"], got[1]["n_distinct"], got[1]["sum_sq"]) == (
        0,
        0,
        0,
    )
    assert (got[2]["n_chars"], got[2]["n_distinct"], got[2]["sum_sq"]) == (
        1,
        1,
        1,
    )
    # 'abab': counts 2,2 → Σc² = 8 (the sort makes runs out of
    # interleaved chars — the case a naive run-length over the RAW
    # string would get wrong)
    assert (got[3]["n_chars"], got[3]["n_distinct"], got[3]["sum_sq"]) == (
        4,
        2,
        8,
    )


def test_char_collision_stats_zero_shuffle_plan(spark):
    """The per-doc histogram must never explode or exchange: the
    physical plan is scan → project only."""
    from ergo_uexplorer_spark.operators.textops import char_collision_stats

    docs = spark.createDataFrame(
        [(0, "hello world")], "doc_id long, text string"
    )
    plan = (
        char_collision_stats(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode


def test_embedding_quant_stats_hand_computed(spark):
    """Two dims with known ranges: dim0 spans [1e6, 3e6] (values 1.0,
    2.0, 3.0), dim1 constant (den clamps to 1, zero error)."""
    from ergo_uexplorer_spark.operators.similarity import (
        embedding_quant_stats,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 7.0]), (1, [2.0, 7.0]), (2, [3.0, 7.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["dim"]: r for r in embedding_quant_stats(emb, dim=2).collect()
    }
    m = 10**6
    assert (got[0]["min_q"], got[0]["max_q"], got[0]["n"]) == (m, 3 * m, 3)
    assert (got[1]["min_q"], got[1]["max_q"]) == (7 * m, 7 * m)
    # constant dim: code 0, recon = min, error 0
    assert got[1]["sum_abs_err"] == 0 and got[1]["max_abs_err"] == 0
    # dim0 round-trip: den = 2e6; v=2e6 → code = (1e6*255)//2e6 = 127,
    # recon = 1e6 + (127*2e6)//255 = 1e6 + 996078 = 1996078 → err 3922;
    # endpoints reconstruct exactly (code 0 and 255)
    assert got[0]["max_abs_err"] == 3922
    assert got[0]["sum_abs_err"] == 3922


def test_embedding_quant_matches_numpy(spark):
    """Random 8-dim vectors: exact agreement with the numpy replay of
    the same integer arithmetic."""
    import numpy as np

    from ergo_uexplorer_spark.operators.similarity import (
        embedding_quant_stats,
    )

    rng = np.random.default_rng(7)
    X = rng.normal(size=(50, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["dim"]: r for r in embedding_quant_stats(emb, dim=8).collect()
    }
    Q = np.floor(X.astype(np.float64) * 10**6 + 0.5).astype(np.int64)
    for d in range(8):
        v = Q[:, d]
        mn, mx = v.min(), v.max()
        den = max(mx - mn, 1)
        code = (v - mn) * 255 // den
        rec = mn + code * den // 255
        err = np.abs(v - rec)
        r = got[d]
        assert (r["min_q"], r["max_q"]) == (mn, mx)
        assert r["sum_abs_err"] == err.sum()
        assert r["max_abs_err"] == err.max()


def test_retrieval_eval_hand_computed(spark):
    """Tiny corpus with a known ranking: doc relevance by label table;
    a query with NO relevant doc in top-k must yield NULL
    first_rel_rank (SQL min-over-empty), not 0."""
    from pyspark.sql import functions as F

    from ergo_uexplorer_spark.operators.retrieval import retrieval_eval

    docs = spark.createDataFrame(
        [
            (0, "apple apple apple"),
            (1, "apple banana"),
            (2, "banana banana"),
            (3, "cherry"),
        ],
        "doc_id long, text string",
    )
    relevance = spark.createDataFrame(
        [(0, False), (1, True), (2, False), (3, False)],
        "doc_id long, is_rel boolean",
    )
    out = {
        r["query"]: r
        for r in retrieval_eval(
            docs,
            {"qa": ["apple"], "qb": ["banana"], "qc": ["cherry"]},
            relevance,
            k=2,
            p_cut=1,
        ).collect()
    }
    # qa: top-2 = docs 0, 1 (doc0 higher tf); relevant doc1 at rank 2
    assert out["qa"]["n_topk"] == 2
    assert out["qa"]["n_rel"] == 1
    assert out["qa"]["first_rel_rank"] == 2
    assert out["qa"]["rel_at_p"] == 0  # p_cut=1, rank-1 doc not relevant
    # qb: top-2 = docs 2, 1; relevant doc1 at rank 2
    assert out["qb"]["first_rel_rank"] == 2
    # qc: only doc3 matches, not relevant → NULL first_rel_rank
    assert out["qc"]["n_topk"] == 1
    assert out["qc"]["n_rel"] == 0
    assert out["qc"]["first_rel_rank"] is None


def test_retrieval_eval_fused_equals_per_query_bm25(spark):
    """The r12 one-aggregate multi-query scoring is bit-identical to
    running bm25_topk per query: same hostile fixture — terms SHARED
    across queries (the fan-out path), exact score TIES broken by id,
    a query with no matching doc, duplicate-free — metrics recomputed
    from the per-query rankings must equal retrieval_eval's row."""
    from ergo_uexplorer_spark.operators.retrieval import (
        bm25_topk,
        retrieval_eval,
    )

    docs = spark.createDataFrame(
        [
            (0, "apple banana"),
            (1, "apple banana"),  # exact tie with doc 0 on any query
            (2, "banana cherry cherry"),
            (3, "cherry"),
            (4, "date date date"),
        ],
        "doc_id long, text string",
    )
    rel_rows = [(0, True), (1, False), (2, True), (3, False), (4, True)]
    relevance = spark.createDataFrame(rel_rows, "doc_id long, is_rel boolean")
    queries = {
        "q_ab": ["apple", "banana"],
        "q_bc": ["banana", "cherry"],  # shares 'banana' with q_ab
        "q_none": ["zebra"],  # matches nothing
    }
    k, p_cut = 3, 2
    got = {
        r["query"]: r
        for r in retrieval_eval(docs, queries, relevance, k=k, p_cut=p_cut).collect()
    }
    is_rel = dict(rel_rows)
    for qname, terms in queries.items():
        ranked = [
            r["doc_id"] for r in bm25_topk(docs, terms, k=k).collect()
        ]
        n_topk = len(ranked)
        n_rel = sum(1 for d in ranked if is_rel[d])
        first = next(
            (i + 1 for i, d in enumerate(ranked) if is_rel[d]), None
        )
        rel_p = sum(1 for i, d in enumerate(ranked) if is_rel[d] and i < p_cut)
        row = got[qname]
        assert row["n_topk"] == n_topk, qname
        assert (row["n_rel"] or 0) == (n_rel if n_topk else 0), qname
        assert row["first_rel_rank"] == (first if n_topk else None), qname
        assert (row["rel_at_p"] or 0) == (rel_p if n_topk else 0), qname


def test_k_hop_demoted_path_equals_broadcast_path(spark):
    """Force the shuffled fallback (gate=0: no broadcast frontier, no
    broadcast visited, lazy src-repartitioned edge build) and assert it
    returns exactly the default broadcast path's labels."""
    from ergo_uexplorer_spark.operators.graph import k_hop_neighbors

    edges = spark.createDataFrame(
        [
            (f"n{i}", f"n{j}")
            for i in range(30)
            for j in ((i * 7 + 3) % 30, (i * 11 + 5) % 30)
        ],
        "src string, dst string",
    )
    fast = {
        (r["id"], r["hops"])
        for r in k_hop_neighbors(edges, ["n0"], k=3).collect()
    }
    slow = {
        (r["id"], r["hops"])
        for r in k_hop_neighbors(
            edges, ["n0"], k=3, broadcast_frontier_max_rows=0
        ).collect()
    }
    assert fast == slow and len(fast) > 1


def test_hard_negatives_excludes_same_label(spark):
    """Most-similar same-label vector must be skipped; ranking among
    cross-label candidates is (cos desc, id asc)."""
    from ergo_uexplorer_spark.operators.similarity import hard_negatives

    rows = [
        (0, [1.0, 0.0], 7),   # query
        (1, [0.99, 0.14], 7),  # nearly identical but SAME label
        (2, [0.9, 0.44], 3),   # best cross-label
        (3, [0.0, 1.0], 4),    # orthogonal cross-label
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = hard_negatives(
        emb, emb.filter("vec_id = 0"), k=2
    ).collect()
    assert [r["n_id"] for r in out] == [2, 3]
    assert all(r["q_id"] == 0 for r in out)


def test_ann_recall_full_probe_is_perfect(spark):
    """Probing EVERY cell makes IVF exhaustive, so recall@k against the
    brute-force truth must be k/k for every query."""
    import numpy as np
    from pyspark.sql import functions as F

    from ergo_uexplorer_spark.operators import similarity as S

    rng = np.random.default_rng(3)
    X = rng.normal(size=(40, 4)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    cents = [[1.0, 0.0, 0.0, 0.0], [-1.0, 0.0, 0.0, 0.0]]
    queries = emb.filter(F.col("vec_id") < 3)
    exact = S.brute_force_topk(emb, queries, k=4).select("q_id", "n_id")
    approx = S.ivf_topk(
        emb, queries, cents, k=4, n_probes=len(cents),
        corpus=S.ivf_index(emb, cents),
    ).select("q_id", "n_id", F.lit(1).alias("hit"))
    got = (
        exact.join(approx, ["q_id", "n_id"], "left")
        .groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.coalesce(F.sum("hit"), F.lit(0)).alias("n_hit"),
        )
        .collect()
    )
    assert len(got) == 3
    for r in got:
        assert r["n_exact"] == 4 and r["n_hit"] == 4


def test_dedup_keep_best_prefers_longest_member(spark):
    """The canonical is the most-token member (ties -> smallest id):
    a truncated scrape must lose to the full copy regardless of id
    order, and the min-id tiebreak applies only among equals."""
    from ergo_uexplorer_spark.operators.dedup import dedup_keep_best

    base = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            # cluster A: id 0 is a TRUNCATED copy, id 7 is full -> keep 7
            (0, " ".join(base.split()[:34])),
            (7, base),
            # cluster B: exact dups, equal length -> keep the smaller id
            (3, base.replace("w", "v")),
            (5, base.replace("w", "v")),
            # singleton: no pair, not in the output
            (9, " ".join(f"u{i}" for i in range(40))),
        ],
        "doc_id long, text string",
    )
    out = {
        r["component"]: r for r in dedup_keep_best(docs, num=4, den=5).collect()
    }
    assert set(out) == {0, 3}
    assert out[0]["keep_id"] == 7 and out[0]["keep_tokens"] == 40
    assert out[0]["n_members"] == 2
    assert out[3]["keep_id"] == 3 and out[3]["n_members"] == 2


def test_dedup_keep_best_string_ids(spark):
    """STRING doc ids (accepted by every other dedup op) must work too:
    the argmax tie-break orders ids lexicographically, never numerically
    (the old (-doc_id) tie-break threw under ANSI mode on strings)."""
    from ergo_uexplorer_spark.operators.dedup import dedup_keep_best

    base = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            ("doc-b", " ".join(base.split()[:34])),  # truncated, loses
            ("doc-a", base),  # full copy wins despite later arrival
            ("x-2", base.replace("w", "v")),
            ("x-1", base.replace("w", "v")),  # equal length: smaller id
        ],
        "doc_id string, text string",
    )
    out = {
        r["component"]: r for r in dedup_keep_best(docs, num=4, den=5).collect()
    }
    assert set(out) == {"doc-a", "x-1"}
    assert out["doc-a"]["keep_id"] == "doc-a"
    assert out["x-1"]["keep_id"] == "x-1"


def test_kmeans_update_stats_partition_corpus(spark):
    """One Lloyd step's sufficient stats must partition the corpus:
    Σ_cells n == |corpus| for every dim, and each cell's stats row
    count == EMB_DIM; sums are reduction-order-proof (repartitioned
    reversal gives identical integers)."""
    from ergo_uexplorer_spark.operators import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    asg = S.ivf_assign(emb, list(S.FIXED_CENTROIDS))
    out = S.embedding_centroid_stats(
        asg, label_col="centroid_id", scale=10**6
    )
    rows = out.collect()
    n_vec = emb.count()
    per_dim = {}
    for r in rows:
        per_dim.setdefault(r["dim"], 0)
        per_dim[r["dim"]] += r["n"]
    assert set(per_dim.values()) == {n_vec}
    rev = S.embedding_centroid_stats(
        asg.repartition(7).sort(F.col("vec_id").desc()),
        label_col="centroid_id",
        scale=10**6,
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rev))


def test_small_quantity_predicate_hand_computed(spark):
    """Q17-shape cross-multiplied predicate: qty < 0.2*avg(qty) per
    part, exact integers. part 1: qtys (1, 10, 39) avg=16.67 -> only
    qty 1 qualifies (5*1*3=15 < 50); part 2: uniform qtys never
    qualify (5*q*c == s is NOT <)."""
    from pyspark.sql import functions as F

    li = spark.createDataFrame(
        [(1, 1, 100.0), (1, 10, 200.0), (1, 39, 300.0),
         (2, 7, 400.0), (2, 7, 500.0)],
        "l_partkey long, qty long, price double",
    ).select(
        "l_partkey", "qty",
        F.round(F.col("price") * 100).cast("bigint").alias("cents"),
    )
    avgq = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("c"), F.sum("qty").alias("s")
    )
    got = (
        li.join(avgq, "l_partkey")
        .filter(F.lit(5) * F.col("qty") * F.col("c") < F.col("s"))
        .collect()
    )
    assert [(r["l_partkey"], r["qty"]) for r in got] == [(1, 1)]


def test_local_supplier_volume_broadcasts_dims(spark):
    """The Q5-shape star join must broadcast every dim side — the only
    shuffle joins allowed are on the fact spine."""
    from ergo_uexplorer_spark.plans.explain import formatted_plan
    from ergo_uexplorer_spark.suite import REGISTRY

    plan = formatted_plan(
        REGISTRY["zwb_local_supplier_volume"].fn(
            spark, "/root/testdata/sf0.001"
        )
    )
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "CartesianProduct" not in plan
