"""Similarity-search semantics vs a NumPy oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from remote_shuffle_spark.operators import similarity
from remote_shuffle_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_smoke):
    return load_table(spark, sf_smoke, "embeddings")


@pytest.fixture(scope="module")
def np_oracle(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, mat


def _np_topk(ids, mat, qid, k):
    q = mat[ids == qid][0]
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -np.round(sims, 6)))
    return list(ids[order][:k])


def test_brute_force_matches_numpy(spark, emb, np_oracle):
    ids, mat = np_oracle
    q = emb.filter(F.col("vec_id") == 0)
    got = [r.vec_id for r in similarity.brute_force_topk(emb, "vec_id", "embedding", q, k=10).collect()]
    assert got == _np_topk(ids, mat, 0, 10)


def test_brute_force_self_is_rank_one(spark, emb):
    q = emb.filter(F.col("vec_id") == 3)
    top = similarity.brute_force_topk(emb, "vec_id", "embedding", q, k=1).collect()
    assert top[0].vec_id == 3
    assert top[0].cos_sim == pytest.approx(1.0, abs=1e-6)


def test_ivf_full_probe_equals_brute_force(spark, emb):
    q = emb.filter(F.col("vec_id") == 0)
    exact = [r.vec_id for r in similarity.brute_force_topk(emb, "vec_id", "embedding", q, k=10).collect()]
    full = [
        r.vec_id
        for r in similarity.ivf_topk(
            emb, "vec_id", "embedding", q, k=10, num_cells=8, nprobe=8
        ).collect()
    ]
    assert full == exact


def test_ivf_partial_probe_recall(spark, emb):
    q = emb.filter(F.col("vec_id") == 0)
    exact = set(
        r.vec_id for r in similarity.brute_force_topk(emb, "vec_id", "embedding", q, k=10).collect()
    )
    approx = set(
        r.vec_id
        for r in similarity.ivf_topk(
            emb, "vec_id", "embedding", q, k=10, num_cells=8, nprobe=3
        ).collect()
    )
    # query's own cell is always probed → its vector must be found
    assert 0 in approx
    assert len(exact & approx) / 10 >= 0.2
