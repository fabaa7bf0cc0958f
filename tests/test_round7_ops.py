"""Round-7 operator tests: fuzzy match, integer EWMA, linear
interpolation, transition counts, Benford digits, assortativity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ergo_uexplorer_spark.operators.cumulative import (
    ewma_int,
    transition_counts,
)
from ergo_uexplorer_spark.operators.graph import degree_assortativity_stats
from ergo_uexplorer_spark.operators.joins import (
    fuzzy_match_pairs,
    linear_interpolate,
)
from ergo_uexplorer_spark.operators.stats import benford_first_digit


def test_fuzzy_match_blocks_and_distance(spark):
    df = spark.createDataFrame(
        [
            (1, "small ring", 5),
            (2, "small rings", 5),  # dist 1 to id 1, same block
            (3, "small ring", 7),  # same name, DIFFERENT block → no pair
            (4, "large ring", 5),  # different first token → no pair
            (5, "small rxyz", 5),  # dist 3 to id 1
        ],
        "id long, name string, size int",
    )
    d = df.withColumn("tok1", F.split("name", " ")[0])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_match_pairs(
            d, "id", "name", ["size", "tok1"], max_dist=3
        ).collect()
    }
    # blocked pairs only (ids 3/4 fall outside block), each once, a<b;
    # (2,5) = "small rings"→"small rxyz" is distance 4 → filtered
    assert got == {(1, 2, 1), (1, 5, 3)}
    assert all(a < b for a, b, _ in got)
    assert not any({3, 4} & {a, b} for a, b, _ in got)


def test_ewma_matches_python_reference(spark):
    rows = [
        (1, 1, 100),
        (1, 2, 200),
        (1, 3, 50),
        (2, 1, 7),
        (3, 1, 10),
        (3, 2, 0),
    ]
    df = spark.createDataFrame(rows, "g long, t long, v long")
    got = {
        r.g: (r.n, r.ewma)
        for r in ewma_int(df, "g", ["t"], "v", a_num=1, a_den=4).collect()
    }

    def ref(vals):
        s = vals[0]
        for v in vals[1:]:
            s = (1 * v + 3 * s) // 4
        return s

    assert got == {
        1: (3, ref([100, 200, 50])),
        2: (1, 7),
        3: (2, ref([10, 0])),
    }


def test_linear_interpolate_exact_lerp(spark):
    df = spark.createDataFrame(
        [(1, 0, 0), (1, 4, 100), (1, 5, 7), (2, 3, 42)],
        "k long, b long, v long",
    )
    out = {
        (r.k, r.b): (r.v, r.observed)
        for r in linear_interpolate(df, "k", "b", "v").collect()
    }
    # gap buckets 1..3 interpolate 0→100 over 4 steps: 25, 50, 75
    assert out[(1, 0)] == (0, True)
    assert out[(1, 1)] == (25, False)
    assert out[(1, 2)] == (50, False)
    assert out[(1, 3)] == (75, False)
    assert out[(1, 4)] == (100, True)
    assert out[(1, 5)] == (7, True)  # observed rows never rewritten
    assert out[(2, 3)] == (42, True)  # single-point key: no grid growth
    assert len(out) == 7


def test_linear_interpolate_null_key_join_miss(spark):
    """NULL-key rows reproduce the grid-LEFT-JOIN formulation (and the
    zy3 oracle): a NULL equi-key never matches, so every NULL-key grid
    row carries NULL value and observed=false — no LOCF carry, no lerp
    (r12 dirty-sweep catch: the window-based rewrite treated NULL as a
    real partition and marked its observations observed=true)."""
    df = spark.createDataFrame(
        [(None, 0, 10), (None, 2, 30), (1, 5, 7)],
        "k long, b long, v long",
    )
    out = {
        (r.k, r.b): (r.v, r.observed)
        for r in linear_interpolate(df, "k", "b", "v").collect()
    }
    assert out[(None, 0)] == (None, False)
    assert out[(None, 1)] == (None, False)  # no lerp across NULL key
    assert out[(None, 2)] == (None, False)
    assert out[(1, 5)] == (7, True)
    assert len(out) == 4


def test_linear_interpolate_span_guard(spark):
    df = spark.createDataFrame(
        [(1, 0, 1), (1, 10**10, 2)], "k long, b long, v long"
    )
    with pytest.raises(Exception, match="max_span"):
        linear_interpolate(df, "k", "b", "v").count()


def test_transition_counts(spark):
    df = spark.createDataFrame(
        [
            (1, 1, "a"),
            (1, 2, "b"),
            (1, 3, "a"),
            (2, 1, "a"),
            (2, 2, "b"),
            (3, 5, "c"),  # single event: no transition
        ],
        "u long, t long, s string",
    )
    got = {
        (r.state_from, r.state_to): r.n
        for r in transition_counts(df, "u", ["t"], "s").collect()
    }
    assert got == {("a", "b"): 2, ("b", "a"): 1}


def test_benford_digits_string_exact(spark):
    df = spark.createDataFrame(
        [("x", 123), ("x", 19), ("x", 987), ("x", 0), ("y", 5)],
        "g string, v long",
    )
    got = {
        (r.g, r.digit): (r.n, r.permille)
        for r in benford_first_digit(df, "g", "v").collect()
    }
    # v=0 excluded; x has digits 1,1,9 → 1:666‰, 9:333‰
    assert got == {
        ("x", 1): (2, 666),
        ("x", 9): (1, 333),
        ("y", 5): (1, 1000),
    }


def test_assortativity_path_graph(spark):
    # path 1-2-3: degrees d1=1, d2=2, d3=1; directed pairs (both
    # orientations): (1,2),(2,1),(2,3),(3,2)
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    row = degree_assortativity_stats(e).collect()[0]
    assert row.m == 4
    assert row.sum_j == 1 + 2 + 2 + 1
    assert row.sum_k == 2 + 1 + 1 + 2
    assert row.sum_jk == str(2 + 2 + 2 + 2)
    assert row.sum_j2 == str(1 + 4 + 4 + 1)
    assert row.sum_k2 == str(4 + 1 + 1 + 4)


def _cc_sets(rows):
    from collections import defaultdict

    comps = defaultdict(set)
    for r in rows:
        comps[r.component].add(r.id)
    return {frozenset(s) for s in comps.values()}


def test_two_phase_cc_equals_hashmin_random(spark):
    import random

    from ergo_uexplorer_spark.operators.graph import (
        connected_components,
        connected_components_two_phase,
    )

    rng = random.Random(7)
    pairs = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    pairs = [(x, y) for x, y in pairs if x != y]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    hm = _cc_sets(connected_components(df).collect())
    tp = _cc_sets(connected_components_two_phase(df).collect())
    assert hm == tp


def test_two_phase_cc_long_path(spark):
    """A 120-node path has diameter 119 — hash-min would need 119
    rounds; alternation must converge in far fewer (O(log² n)) and
    still produce the single component labeled by the minimum id."""
    from ergo_uexplorer_spark.operators.graph import (
        connected_components_two_phase,
    )

    n = 120
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    rows = connected_components_two_phase(df, max_iter=12).collect()
    assert len(rows) == n
    assert {r.component for r in rows} == {0}


def test_ewma_states_per_row(spark):
    from ergo_uexplorer_spark.operators.cumulative import ewma_states

    df = spark.createDataFrame(
        [(1, 1, 100), (1, 2, 200), (1, 3, 50)], "g long, t long, v long"
    )
    rows = {
        r.t: (r.v, r.s, r.resid)
        for r in ewma_states(df, "g", ["t"], "v").collect()
    }
    # s1=100, s2=(200+300)//4=125, s3=(50+375)//4=106
    assert rows == {
        1: (100, 100, 0),
        2: (200, 125, 75),
        3: (50, 106, -56),
    }


def test_ewma_stream_matches_batch_operator(spark, tmp_path):
    """Stream (user_id, event_id, ts, v) in 3 time-ordered file batches;
    the per-row EWMA states must equal the batch `ewma_states` fold over
    the full set — the state store carries the recurrence across
    micro-batches."""
    import json

    from pyspark.sql import functions as F

    from ergo_uexplorer_spark.operators.cumulative import ewma_states
    from ergo_uexplorer_spark.streaming.stateful import ewma_stream
    from ergo_uexplorer_spark.suite.base import load

    (events,) = load(spark, "/root/testdata/sf0.001", "events")
    ev = events.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    pdf = ev.toPandas().sort_values("ts")
    in_dir = tmp_path / "ev"
    in_dir.mkdir()
    n = len(pdf)
    for i in range(3):
        chunk = pdf.iloc[i * n // 3 : (i + 1) * n // 3]
        with open(in_dir / f"b{i}.json", "w") as f:
            for _, r in chunk.iterrows():
                f.write(
                    json.dumps(
                        {
                            "user_id": int(r.user_id),
                            "event_id": int(r.event_id),
                            "ts": int(r.ts),
                            "v": int(r.v),
                        }
                    )
                    + "\n"
                )
    stream = (
        spark.readStream.schema("user_id long, event_id long, ts long, v long")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    q = (
        ewma_stream(stream)
        .writeStream.format("memory")
        .queryName("ewma_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(300)
    streamed = {
        (r["user_id"], r["event_id"]): (r["v"], r["s"], r["resid"])
        for r in spark.sql("select * from ewma_out").collect()
    }
    batch = {
        (r["user_id"], r["event_id"]): (r["v"], r["s"], r["resid"])
        for r in ewma_states(
            ev, "user_id", ["ts", "event_id"], "v"
        ).collect()
    }
    assert streamed == batch


def test_hll_store_incremental_equals_oneshot(spark, tmp_path):
    """Three batches written incrementally must union to the same
    estimates as one batch over the full data, redelivery must be
    idempotent (rewriting batch 1 changes nothing), and the estimate
    must sit within 5·rsd of the exact distinct count."""
    from pyspark.sql import functions as F

    from ergo_uexplorer_spark.operators.sketchstore import (
        distinct_estimates,
        write_hll_batch,
    )

    df = spark.range(30_000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") % 7_000).alias("v")
    )
    store = str(tmp_path / "hll")
    # split by row ranges so every batch carries every key
    parts = [
        df.filter((F.col("id") >= i * 10_000) & (F.col("id") < (i + 1) * 10_000))
        for i in range(3)
    ]
    for i, p in enumerate(parts):
        write_hll_batch(p, store, str(i), ["k"], "v")
    inc = {
        r.k: r.n_distinct_est
        for r in distinct_estimates(spark, store, ["k"]).collect()
    }
    oneshot_store = str(tmp_path / "hll_one")
    write_hll_batch(df, oneshot_store, "all", ["k"], "v")
    one = {
        r.k: r.n_distinct_est
        for r in distinct_estimates(spark, oneshot_store, ["k"]).collect()
    }
    assert inc == one  # union of partials ≡ sketch of union
    # idempotent redelivery: rewriting batch 1 changes nothing
    write_hll_batch(parts[1], store, "1", ["k"], "v")
    assert inc == {
        r.k: r.n_distinct_est
        for r in distinct_estimates(spark, store, ["k"]).collect()
    }
    exact = {
        r.k: r.n
        for r in df.groupBy("k")
        .agg(F.count_distinct("v").alias("n"))
        .collect()
    }
    for k, est in inc.items():
        assert abs(est - exact[k]) <= max(1.0, 0.082 * exact[k])
