"""Round-7 batch-5 operator tests: CDC latest-wins replay (delete wins,
resurrection, tie determinism), PSI sufficient stats + the float fold,
windowed conversion vs brute force, grouped percentiles vs brute
force, and the zyd plan audit."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from ergo_uexplorer_spark.operators.cdc import latest_snapshot
from ergo_uexplorer_spark.operators.joins import windowed_conversion
from ergo_uexplorer_spark.operators.stats import (
    grouped_percentiles,
    psi_sufficient_stats,
    psi_value,
)


def test_cdc_latest_snapshot_semantics(spark):
    rows = [
        # key 1: upsert → delete → upsert (resurrected, latest wins)
        (1, 10, 1, "u", 100),
        (1, 20, 2, "d", 0),
        (1, 30, 3, "u", 300),
        # key 2: upsert → delete (dead)
        (2, 10, 4, "u", 200),
        (2, 40, 5, "d", 0),
        # key 3: same ts, tiebreak decides (event 7 wins)
        (3, 50, 6, "u", 111),
        (3, 50, 7, "u", 222),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, eid long, op string, v long")
    got = {
        r.k: (r.last_op, r.last_v, r.n_changes)
        for r in latest_snapshot(
            df, "k", ["ts", "eid"], "op", ("d",), ["v"]
        ).collect()
    }
    assert got == {1: ("u", 300, 3), 3: ("u", 222, 2)}


def test_cdc_latest_matches_bruteforce_random(spark):
    rng = random.Random(3)
    rows = [
        (rng.randrange(30), rng.randrange(100), i,
         rng.choice(["i", "u", "d"]), rng.randrange(1000))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "k long, ts long, eid long, op string, v long")
    got = {
        r.k: (r.last_op, r.last_v, r.n_changes)
        for r in latest_snapshot(
            df, "k", ["ts", "eid"], "op", ("d",), ["v"]
        ).collect()
    }
    want = {}
    bykey = {}
    for k, ts, eid, op, v in rows:
        bykey.setdefault(k, []).append((ts, eid, op, v))
    for k, evs in bykey.items():
        evs.sort()
        ts, eid, op, v = evs[-1]
        if op != "d":
            want[k] = (op, v, len(evs))
    assert got == want


def test_psi_sufficient_stats_and_value(spark):
    rng = random.Random(5)
    rows = [("p1", rng.randrange(10)) for _ in range(400)] + [
        ("p2", min(9, rng.randrange(12))) for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "period string, bucket long")
    stats = psi_sufficient_stats(df, "bucket", "period", "p1", "p2")
    rowsout = stats.collect()
    A = sum(1 for p, _ in rows if p == "p1")
    B = len(rows) - A
    counts = {}
    for p, bkt in rows:
        a, b = counts.get(bkt, (0, 0))
        counts[bkt] = (a + 1, b) if p == "p1" else (a, b + 1)
    for r in rowsout:
        a, b = counts[r.bucket]
        assert (r.a, r.b, r.a_tot, r.b_tot) == (a, b, A, B)
        assert int(r.a_x_btot) == a * B and int(r.b_x_atot) == b * A
    want_psi = sum(
        (a / A - b / B) * math.log((a / A) / (b / B))
        for a, b in counts.values()
        if a > 0 and b > 0
    )
    assert abs(psi_value(stats) - want_psi) < 1e-9


def test_windowed_conversion_matches_bruteforce(spark):
    rng = random.Random(9)
    rows = [
        (rng.randrange(40), rng.randrange(1000),
         rng.choice(["view", "purchase", "click"]))
        for _ in range(800)
    ]
    df = spark.createDataFrame(rows, "k long, ts long, et string")
    W = 120
    got = {
        r.k: (r.t0, r.t1, r.delay)
        for r in windowed_conversion(
            df, "k", "ts", "et", "view", "purchase", W
        ).collect()
    }
    want = {}
    for k in {k for k, _, et in rows if et == "view"}:
        t0 = min(ts for kk, ts, et in rows if kk == k and et == "view")
        cands = [
            ts
            for kk, ts, et in rows
            if kk == k and et == "purchase" and t0 < ts <= t0 + W
        ]
        t1 = min(cands) if cands else None
        want[k] = (t0, t1, None if t1 is None else t1 - t0)
    assert got == want


def test_grouped_percentiles_matches_bruteforce(spark):
    rng = random.Random(13)
    rows = [
        (rng.choice(["x", "y", "z"]), rng.randrange(10_000))
        for _ in range(900)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r.g: (r.n, r.p50, r.p95, r.p99)
        for r in grouped_percentiles(df, "g", "v", (50, 95, 99)).collect()
    }
    for g in ("x", "y", "z"):
        vs = sorted(v for gg, v in rows if gg == g)
        n = len(vs)

        def q(p):
            # smallest v with 100*cum >= p*n  →  index ceil(p*n/100)-1
            return vs[-(-p * n // 100) - 1]

        assert got[g] == (n, q(50), q(95), q(99)), g


def test_grouped_percentiles_rejects_bad_p(spark):
    import pytest

    df = spark.createDataFrame([("a", 1)], "g string, v long")
    with pytest.raises(ValueError):
        grouped_percentiles(df, "g", "v", (0,))


def test_round7d_plans_have_no_unbounded_products(spark):
    from ergo_uexplorer_spark.plans.explain import formatted_plan
    from ergo_uexplorer_spark.suite import REGISTRY

    sf = "/root/testdata/sf0.001"
    names = [n for n in REGISTRY if n.startswith("zyd")]
    assert len(names) == 4
    for name in names:
        plan = formatted_plan(REGISTRY[name].fn(spark, sf))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def _brute_kcore(edges, k):
    import collections

    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    alive = set(adj)
    changed = True
    while changed:
        changed = False
        for v in list(alive):
            deg = len(adj[v] & alive)
            if deg < k:
                alive.discard(v)
                changed = True
    return {v: len(adj[v] & alive) for v in alive}


def test_kcore_matches_bruteforce_random(spark):
    from ergo_uexplorer_spark.operators.graph import kcore

    rng = random.Random(19)
    edges = list(
        {
            tuple(sorted(rng.sample(range(60), 2)))
            for _ in range(260)
        }
    )
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r.v: r.deg for r in kcore(df, k=5, max_rounds=30).collect()}
    assert got == _brute_kcore(edges, 5)


def test_kcore_cascade_and_empty(spark):
    from ergo_uexplorer_spark.operators.graph import kcore

    # path graph: 2-core is empty, and finding that requires a full
    # cascade (each endpoint removal exposes the next)
    path = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(path, "a long, b long")
    assert kcore(df, k=2, max_rounds=30).count() == 0
    # triangle + pendant: 2-core is exactly the triangle, degree 2 each
    tri = [(1, 2), (2, 3), (1, 3), (3, 4)]
    got = {
        r.v: r.deg
        for r in kcore(
            spark.createDataFrame(tri, "a long, b long"), k=2
        ).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_raises_past_max_rounds(spark):
    import pytest

    from ergo_uexplorer_spark.operators.graph import kcore

    path = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(path, "a long, b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(df, k=2, max_rounds=2)


def test_bpe_fertility_sums_consistent(spark):
    """Per-source piece counts must (a) cover every token exactly once
    (n_pieces >= n_tokens; equality iff no merge ever applies) and
    (b) total-pieces equals the direct whole-corpus segmentation sum."""
    from ergo_uexplorer_spark.operators.bpe import (
        bpe_segment,
        train_bpe_merges,
        word_frequencies,
    )
    from ergo_uexplorer_spark.suite import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["zyf2_bpe_fertility"].fn(spark, sf).collect()
    assert len(rows) == 20  # every source reports
    assert all(r.n_pieces >= r.n_tokens for r in rows)
    assert any(r.n_pieces > r.n_tokens for r in rows)

    from ergo_uexplorer_spark.suite.base import load

    (docs,) = load(spark, sf, "documents")
    merges = [
        (r.left, r.right)
        for r in train_bpe_merges(docs, n_merges=6).orderBy("rank").collect()
    ]
    direct = (
        bpe_segment(word_frequencies(docs), "w", merges)
        .select(F.sum(F.size("pieces") * F.col("cnt")).alias("t"))
        .first()[0]
    )
    assert sum(r.n_pieces for r in rows) == direct


def test_ohlc_bars_matches_bruteforce(spark):
    from ergo_uexplorer_spark.operators.stats import ohlc_bars

    rng = random.Random(23)
    rows = [
        (rng.choice(["x", "y"]), rng.randrange(100), i, rng.randrange(1000))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, ts long, tb long, v long")
    got = {
        r.g: (r.open, r.high, r.low, r.close, r.n_events, r.volume)
        for r in ohlc_bars(df, ["g"], "ts", "tb", "v").collect()
    }
    for g in ("x", "y"):
        evs = sorted((ts, tb, v) for gg, ts, tb, v in rows if gg == g)
        vs = [v for _, _, v in evs]
        assert got[g] == (
            evs[0][2],
            max(vs),
            min(vs),
            evs[-1][2],
            len(evs),
            sum(vs),
        )


def test_centroid_stats_exact_and_order_independent(spark):
    from ergo_uexplorer_spark.operators.similarity import (
        embedding_centroid_stats,
    )

    import struct as _struct

    rng = random.Random(29)

    def f32(x):
        return _struct.unpack("f", _struct.pack("f", x))[0]

    rows = [
        (i, i % 3, [f32(rng.uniform(-1, 1)) for _ in range(4)])
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    got = {
        (r.label, r.dim): (r.n, int(r.sx))
        for r in embedding_centroid_stats(df).collect()
    }
    import math

    want = {}
    for _, lbl, vec in rows:
        for d, x in enumerate(vec):
            n, s = want.get((lbl, d), (0, 0))
            want[(lbl, d)] = (n + 1, s + math.floor(x * 10**6))
    assert got == want
    # order independence: reversed + repartitioned input, same sums
    got2 = {
        (r.label, r.dim): (r.n, int(r.sx))
        for r in embedding_centroid_stats(
            spark.createDataFrame(
                rows[::-1], "vec_id long, label int, embedding array<float>"
            ).repartition(13)
        ).collect()
    }
    assert got2 == want


def test_gs_percentiles_matches_per_granularity_bruteforce(spark):
    """zyh1: the grouping-sets median at every granularity must equal
    independently computed per-slice medians."""
    from ergo_uexplorer_spark.suite import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["zyh1_gs_percentiles"].fn(spark, sf).collect()
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "source", "lang", "n_chars"
    ).collect()

    def median(vs):
        vs = sorted(vs)
        return vs[(len(vs) - 1) // 2]  # smallest v with 2*cum >= n

    for r in rows:
        vs = [
            d.n_chars
            for d in docs
            if (r.g_src == 1 or d.source == r.source)
            and (r.g_lang == 1 or d.lang == r.lang)
        ]
        assert (r.n, r.p50) == (len(vs), median(vs)), (
            r.source, r.lang, r.g_src, r.g_lang)
    # all four granularities present
    assert {(r.g_src, r.g_lang) for r in rows} == {
        (0, 0), (0, 1), (1, 0), (1, 1)}


def test_minhash_calibration_est_matches_signatures(spark):
    """zyh2: est12 must equal the actual per-pair signature agreement,
    and exact Jaccard must match a python recount on the hashed sets."""
    from ergo_uexplorer_spark.operators import dedup as D
    from ergo_uexplorer_spark.suite import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["zyh2_minhash_calibration"].fn(spark, sf).collect()
    assert len(rows) > 5
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    sh = D.hashed_shingle_sets(docs)
    sets = {}
    for r in sh.collect():
        sets.setdefault(r.doc_id, set()).add(r.h)
    sigs = {
        r.doc_id: [r[f"mh{i}"] for i in range(D.NUM_HASHES)]
        for r in D.minhash_signatures(sh).collect()
    }
    for r in rows:
        agree = sum(
            1
            for i in range(D.NUM_HASHES)
            if sigs[r.doc_a][i] == sigs[r.doc_b][i]
        )
        inter = len(sets[r.doc_a] & sets[r.doc_b])
        assert (r.est12, r.shared, r.na, r.nb) == (
            agree, inter, len(sets[r.doc_a]), len(sets[r.doc_b]))
