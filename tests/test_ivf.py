"""IVF ANN: recall vs exact brute force, cell partitioning sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ergo_uexplorer_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    ivf_build_centroids,
    ivf_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def centroids(emb):
    return ivf_build_centroids(emb, n_centroids=16, iters=3)


def test_assignment_covers_all(emb, centroids):
    assigned = ivf_assign(emb, centroids)
    assert assigned.count() == emb.count()
    cells = assigned.groupBy("centroid_id").count()
    assert cells.count() > 1  # not everything in one cell
    assert assigned.filter(F.col("centroid_id").isNull()).count() == 0


def test_ivf_recall_vs_brute(emb, centroids):
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=10)
    approx = ivf_topk(emb, queries, centroids, k=10, n_probes=6)
    e = {(r["q_id"], r["n_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["n_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # random 64-dim vectors are a worst case for coarse quantization;
    # 6/16 probes should still recover well over half the true top-10
    assert recall >= 0.5, f"recall {recall:.2f}"
    # every approx hit is a real vector and deterministic across runs
    a2 = {(r["q_id"], r["n_id"]) for r in
          ivf_topk(emb, queries, centroids, k=10, n_probes=6).collect()}
    assert a == a2
