"""Retrieval QUALITY of the approximate ANN variants on the workload
they exist for: near-duplicate retrieval over CLUSTERED embeddings.

On unstructured random vectors a single 8-bit SRP table barely beats
random (measured ~0.03 recall at k/N = 0.02) — that is the textbook
behavior, tunable with more planes/tables, not a bug. The meaningful
quality contract is the training-data scenario: when vectors form
tight near-duplicate clusters, every variant must recover clustermates.
These tests build such a corpus (50 clusters × 10 near-identical
vectors, fixed seed) and pin recall@9 against the exact baseline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dbt_fal_spark.operators.similarity import (
    s_knn_bruteforce,
    s_knn_int8,
    s_knn_ivf,
    s_knn_lsh_bucketed,
)

N_CLUSTERS = 50
PER_CLUSTER = 10
DIM = 64


@pytest.fixture(scope="module")
def clustered_dir(spark, tmp_path_factory):
    rng = np.random.default_rng(7)
    centers = rng.normal(0, 1.0, size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for vid in range(N_CLUSTERS * PER_CLUSTER):
        c = vid % N_CLUSTERS
        vec = centers[c] + rng.normal(0, 0.02, size=DIM)
        rows.append((vid, c % 10, vec.astype(np.float32)))
    pdf = pd.DataFrame(
        {
            "vec_id": [r[0] for r in rows],
            "embedding": [r[2] for r in rows],
            "label": pd.array([r[1] for r in rows], dtype="int32"),
        }
    )
    out = tmp_path_factory.mktemp("clustered_emb")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(out / "embeddings.parquet")
    )
    return str(out)


def _topk(spark, fn, sf):
    out: dict[int, set[int]] = {}
    for r in fn(spark, sf).collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


@pytest.fixture(scope="module")
def exact_topk(spark, clustered_dir):
    got = _topk(spark, s_knn_bruteforce, clustered_dir)
    # sanity: with sigma=0.02 noise the exact neighbors ARE clustermates
    for q, nbrs in got.items():
        mates = {q + i * N_CLUSTERS for i in range(PER_CLUSTER)} - {q}
        assert len(nbrs & mates) == PER_CLUSTER - 1, (q, nbrs)
    return got


def _recall(got, exact):
    hits = sum(len(got.get(q, set()) & n) for q, n in exact.items())
    return hits / sum(len(n) for n in exact.values())


def test_ivf_finds_near_duplicates(spark, clustered_dir, exact_topk):
    assert _recall(_topk(spark, s_knn_ivf, clustered_dir), exact_topk) >= 0.9


def test_lsh_finds_near_duplicates(spark, clustered_dir, exact_topk):
    """Single-table 8-plane SRP: each hyperplane falling within ~2σ of
    a cluster center splits that cluster across buckets, so one table
    recovers less than half of the clustermates (measured 0.41 at
    σ=0.02) — the textbook single-table limitation whose knob is more
    tables/planes. The floor pins far-above-chance behavior (random
    recall = k/N ≈ 0.018) and regression against hash-mixing bugs."""
    assert _recall(_topk(spark, s_knn_lsh_bucketed, clustered_dir), exact_topk) >= 0.3


def test_sq8_finds_near_duplicates(spark, clustered_dir, exact_topk):
    """SQ8 ranks ADC-style — raw query ints against span-rescaled
    neighbor codes, the reconstructed dot minus a per-query constant —
    so reconstruction error is the only distortion. This test drove
    the upgrade: the naive shifted-code·code dot measured 0.44 recall
    here; ADC measures 0.98."""
    assert _recall(_topk(spark, s_knn_int8, clustered_dir), exact_topk) >= 0.9


def test_multitable_lsh_lifts_recall(spark, clustered_dir, exact_topk):
    """The recall knob demonstrated: 4 independent SRP tables union
    their candidates, so a pair survives unless EVERY table splits it
    (P ≈ 0.59^4 ≈ 0.12) — recall must clearly beat the single-table
    variant's measured 0.41."""
    from dbt_fal_spark.operators.similarity import s_knn_lsh_multitable

    got = _topk(spark, s_knn_lsh_multitable, clustered_dir)
    assert _recall(got, exact_topk) >= 0.7
