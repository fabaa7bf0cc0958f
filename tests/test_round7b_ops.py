"""Round-7 batch-2 operator tests: skyline vs brute-force dominance,
Misra-Gries heavy hitters vs exact counts, strict-prefix max vs the
single-window reference, time-weighted sums past int64, FK audit
semantics (NULL keys), and profile/stack correctness."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from ergo_uexplorer_spark.operators.cumulative import (
    ordered_prefix,
    time_weighted_stats,
)
from ergo_uexplorer_spark.operators.quality import fk_audit, profile_columns
from ergo_uexplorer_spark.operators.stats import (
    cooccurrence_pairs,
    misra_gries_heavy_hitters,
    pareto_frontier_2d,
)


def _brute_skyline(points):
    out = []
    for a in points:
        dominated = any(
            b[1] >= a[1]
            and b[2] >= a[2]
            and (b[1] > a[1] or b[2] > a[2])
            for b in points
        )
        if not dominated:
            out.append(a)
    return sorted(out)


def test_pareto_frontier_matches_bruteforce_random(spark):
    rng = random.Random(7)
    pts = [
        (i, rng.randrange(0, 20), rng.randrange(0, 1000)) for i in range(400)
    ]
    # duplicates on purpose: every copy of a frontier point must be kept
    pts += pts[:25]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = sorted(
        (r.id, r.x, r.y)
        for r in pareto_frontier_2d(df, "x", "y").collect()
    )
    assert got == _brute_skyline(pts)


def test_pareto_frontier_ties_on_both_axes(spark):
    # (5,5) twice → both kept; (5,4) dominated by (5,5); (4,5) dominated;
    # (6,1) and (1,6) incomparable corners stay
    pts = [(1, 5, 5), (2, 5, 5), (3, 5, 4), (4, 4, 5), (5, 6, 1), (6, 1, 6)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = sorted(r.id for r in pareto_frontier_2d(df, "x", "y").collect())
    assert got == [1, 2, 5, 6]


def test_strict_prefix_max_equals_window_reference(spark):
    rng = random.Random(11)
    rows = [(i, rng.randrange(-50, 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(13)
    got = ordered_prefix(df, ["k"], strict_max_cols={"pm": "v"})
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    ref = df.withColumn("pm", F.max("v").over(w))
    g = {r.k: r.pm for r in got.collect()}
    e = {r.k: r.pm for r in ref.collect()}
    assert g == e


def test_misra_gries_equals_exact_on_skewed_keys(spark):
    rng = random.Random(3)
    # zipf-ish: key 0 hot, long tail of distinct keys to force evictions
    keys = ["hot"] * 4000 + ["warm"] * 1500 + [
        f"k{rng.randrange(8000)}" for _ in range(4500)
    ]
    rng.shuffle(keys)
    df = spark.createDataFrame([(k,) for k in keys], "key string").repartition(
        16
    )
    k = 4
    got = {
        (r.key, r.n) for r in misra_gries_heavy_hitters(df, "key", k).collect()
    }
    n = len(keys)
    from collections import Counter

    exact = {(key, c) for key, c in Counter(keys).items() if c * k > n}
    assert got == exact
    assert ("hot", 4000) in got


def test_time_weighted_sum_exceeds_int64(spark):
    # one segment: v=10^7 cents held for 10^13 ns → 10^20 > 2^63
    rows = [
        (1, 0, 10_000_000, 1),
        (1, 10_000_000_000_000, 0, 2),
        (2, 5, 7, 1),  # single obs → no segment → NULL numerator, span 0
    ]
    df = spark.createDataFrame(rows, "u long, t long, v long, e long")
    got = {
        r.u: (r.n_obs, r.span, None if r.twa_num is None else int(r.twa_num))
        for r in time_weighted_stats(df, "u", "t", "v", "e").collect()
    }
    assert got[1] == (2, 10_000_000_000_000, 10_000_000 * 10_000_000_000_000)
    assert got[2] == (1, 0, None)


def test_fk_audit_null_keys_are_not_orphans(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None), (4, 99)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    row = fk_audit([(child, "fk", parent, "pk", "c_p")]).collect()[0]
    assert (row.relation, row.child_rows, row.orphans) == ("c_p", 4, 1)


def test_profile_columns_one_pass_stats(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "c"), (None, "a")], "n long, s string"
    )
    got = {r.col_name: r for r in profile_columns(df).collect()}
    assert got["n"].n_rows == 4
    assert got["n"].n_nulls == 1
    assert got["n"].n_distinct == 2
    assert (got["n"].min_val, got["n"].max_val) == ("1", "2")
    assert got["s"].n_nulls == 1
    assert got["s"].n_distinct == 2
    assert (got["s"].min_val, got["s"].max_val) == ("a", "c")


def test_cooccurrence_apriori_prune_is_lossless(spark):
    # item "z" has support 1 → pruned before pairing; pairs among a/b/c
    rows = [
        (1, "a"), (1, "b"), (1, "z"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "a"), (4, "c"),
        (4, "a"),  # duplicate (basket, item) must not inflate counts
    ]
    df = spark.createDataFrame(rows, "b long, i string")
    got = {
        (r.item_a, r.item_b, r.n_baskets)
        for r in cooccurrence_pairs(df, "b", "i", 2).collect()
    }
    assert got == {("a", "b", 2), ("a", "c", 2)}
