"""stages/cluster.py: distributed Lloyd k-means + SemDeDup.

The load-bearing claim is parallelism invariance — fixed-point integer
partials reduce to the identical whole-matrix Lloyd step no matter how
the input is partitioned — plus the SemDeDup greedy keep rule checked
against a brute-force restatement.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from defactonlp_ray.stages import cluster


def _toy_table(n=120, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(4, dim))
    vecs = centers[rng.integers(0, 4, size=n)] + 0.05 * rng.normal(
        size=(n, dim)
    )
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs.astype(np.float64))),
        }
    )


def test_kmeans_fit_invariant_to_partitioning():
    t = _toy_table()
    outs = []
    for parts in (1, 3, 11):
        ds = ray.data.from_arrow(t).repartition(parts)
        cent, summary = cluster.kmeans_fit(ds, k=4, iters=3, sample_size=64)
        outs.append((cent, summary))
    c0, s0 = outs[0]
    for cent, summary in outs[1:]:
        np.testing.assert_array_equal(cent, c0)       # bit-identical
        pd.testing.assert_frame_equal(summary, s0)


def test_kmeans_fit_matches_serial_step_loop():
    """Distributed fit == the whole-matrix serial loop of the same spec."""
    t = _toy_table(n=90)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    cent = cluster.init_centroids(m[:64], 4)
    for _ in range(3):
        _, qsums, counts, _ = cluster.lloyd_step_serial(m, cent)
        cent = cluster._new_centroids(cent, qsums, counts)
    ds = ray.data.from_arrow(t).repartition(5)
    dcent, summary = cluster.kmeans_fit(ds, k=4, iters=3, sample_size=64)
    np.testing.assert_array_equal(dcent, cent)
    _, _, counts, inertia_q = cluster.lloyd_step_serial(m, cent)
    np.testing.assert_array_equal(summary["size"].to_numpy(), counts)
    assert summary["size"].sum() == 90


def test_kmeans_empty_cluster_keeps_centroid():
    """A centroid no vector picks survives the update unchanged."""
    vecs = np.array([[0.0, 0.0], [0.1, 0.0], [0.0, 0.1]])
    cent = np.array([[0.05, 0.05], [50.0, 50.0]])
    _, qsums, counts, _ = cluster.lloyd_step_serial(vecs, cent)
    new = cluster._new_centroids(cent, qsums, counts)
    assert counts[1] == 0
    np.testing.assert_array_equal(new[1], cent[1])


def test_semdedup_greedy_brute_force_restatement():
    """kept[i] iff cosine(u_i, u_j) <= tau for every KEPT j with smaller
    id — checked by replaying the rule naively, including dup_of."""
    rng = np.random.default_rng(3)
    base = rng.normal(size=(6, 5))
    # rows 10..15 are near-copies of rows 0..5 -> guaranteed dups
    vecs = np.vstack([base, base + 1e-6 * rng.normal(size=(6, 5))])
    ids = np.array([3, 9, 1, 7, 5, 11, 23, 29, 21, 27, 25, 31], dtype=np.int64)
    tau = 0.9
    kept, dup_of = cluster.semdedup_greedy(ids, vecs, tau)

    order = np.argsort(ids)
    u = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    kept_exp = {}
    for pos in order:
        hit = None
        for j, keptj in kept_exp.items():
            if keptj and round(float(u[j] @ u[pos]), 6) > tau:
                hit = j
                break
        kept_exp[pos] = hit is None
    for pos in range(len(ids)):
        assert kept[pos] == kept_exp[pos]
        if not kept[pos]:
            j = int(np.flatnonzero(ids == dup_of[pos])[0])
            assert kept[j]
            assert round(float(u[j] @ u[pos]), 6) > tau
    assert kept.sum() == 6 and (~kept).sum() == 6


def test_semdedup_pipeline_invariant_and_keeps_lowest_ids():
    t = _toy_table(n=80)
    r1 = cluster.semdedup(
        ray.data.from_arrow(t).repartition(2), k=4, tau=0.95, sample_size=64
    )
    r2 = cluster.semdedup(
        ray.data.from_arrow(t).repartition(9), k=4, tau=0.95, sample_size=64
    )
    pd.testing.assert_frame_equal(r1, r2)
    # every dropped row names a kept row in its own cluster w/ smaller id
    by_id = r1.set_index("vec_id")
    dropped = r1[~r1["kept"]]
    for _, row in dropped.iterrows():
        keeper = by_id.loc[row["dup_of"]]
        assert bool(keeper["kept"])
        assert keeper["cluster_id"] == row["cluster_id"]
        assert row["dup_of"] < row["vec_id"]
