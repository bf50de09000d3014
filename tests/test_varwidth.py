"""Variable-width histogram (exact Ckmeans.1d.dp) properties.

* Optimality: the DP's total weighted SSE equals the brute-force
  minimum over ALL contiguous k-partitions (itertools combinations of
  split points) on random small weighted instances.
* Engine DP (numpy, stages/cluster.ckmeans_1d) == independent serial DP
  (plain Python, pipelines/pinned.serial_varwidth_histogram's core) on
  the same inputs — the cross-implementation contract the pinned oracle
  relies on.
* Degenerate shapes: k >= n distinct values -> singleton buckets.
"""

import itertools

import numpy as np
import pytest

from defactonlp_ray.stages.cluster import ckmeans_1d


def _sse(v, w, a, z):
    W = w[a:z].sum()
    S = (v[a:z] * w[a:z]).sum()
    Q = (v[a:z] * v[a:z] * w[a:z]).sum()
    return Q - S * S / W


def _total(v, w, bounds):
    return sum(_sse(v, w, bounds[j], bounds[j + 1]) for j in range(len(bounds) - 1))


def _brute_best(v, w, k):
    n = v.size
    best = np.inf
    for splits in itertools.combinations(range(1, n), k - 1):
        bounds = [0, *splits, n]
        best = min(best, _total(v, w, bounds))
    return best


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("k", [2, 3, 4])
def test_dp_matches_bruteforce_optimum(seed, k):
    rng = np.random.default_rng(seed)
    n = 9
    v = np.sort(rng.choice(np.arange(1, 60), size=n, replace=False)).astype(
        np.float64
    )
    w = rng.integers(1, 7, size=n).astype(np.float64)
    bounds = ckmeans_1d(v, w, k)
    assert bounds[0] == 0 and bounds[-1] == n
    assert np.all(np.diff(bounds) >= 1)
    got = _total(v, w, bounds)
    want = _brute_best(v, w, k)
    assert got == pytest.approx(want, rel=0, abs=1e-9)


def _serial_dp(vals, w, k):
    # transcription of pinned.serial_varwidth_histogram's DP core
    n = len(vals)
    k = min(k, n)
    cw, cs, css = [0.0], [0.0], [0.0]
    for x, wt in zip(vals, w):
        cw.append(cw[-1] + wt)
        cs.append(cs[-1] + wt * x)
        css.append(css[-1] + wt * x * x)
    inf = float("inf")
    D = [[inf] * (n + 1) for _ in range(k + 1)]
    back = [[0] * (n + 1) for _ in range(k + 1)]
    D[0][0] = 0.0
    for j in range(1, k + 1):
        for i in range(j, n - (k - j) + 1):
            best, barg = inf, j - 1
            for m in range(j - 1, i):
                W = cw[i] - cw[m]
                S = cs[i] - cs[m]
                Q = css[i] - css[m]
                c = D[j - 1][m] + Q - S * S / W
                if c < best:
                    best, barg = c, m
            D[j][i] = best
            back[j][i] = barg
    bounds = [0] * (k + 1)
    bounds[k] = n
    for j in range(k, 0, -1):
        bounds[j - 1] = back[j][bounds[j]]
    return bounds


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_numpy_dp_equals_serial_dp(seed):
    rng = np.random.default_rng(seed)
    n = 40
    vals = np.sort(rng.choice(np.arange(1, 500), size=n, replace=False))
    w = rng.integers(1, 50, size=n)
    got = ckmeans_1d(vals.astype(np.int64), w.astype(np.int64), 6)
    want = _serial_dp([int(x) for x in vals], [int(x) for x in w], 6)
    assert got.tolist() == want


def test_k_at_least_n_gives_singletons():
    v = np.array([3, 7, 9], dtype=np.int64)
    w = np.array([2, 1, 5], dtype=np.int64)
    assert ckmeans_1d(v, w, 6).tolist() == [0, 1, 2, 3]


# ------------------------- PM-2 kernel (rides this no-Ray test module)

from defactonlp_ray.stages.ann import pm2_select


def test_pm2_alternates_aspects_at_equal_relevance():
    # 6 docs, two aspects, identical relevance: Sainte-Lague quotients
    # force strict alternation regardless of doc ids
    window = [(1.0, d) for d in range(6)]
    aspects = {0: "a", 1: "a", 2: "a", 3: "b", 4: "b", 5: "b"}
    picks = pm2_select(window, aspects, 6)
    seq = [a for _r, _d, a, _o in picks]
    assert seq == ["a", "b", "a", "b", "a", "b"]
    # within an aspect, equal relevance ties break by doc_id ascending
    assert [d for _r, d, a, _o in picks if a == "a"] == [0, 1, 2]


def test_pm2_relevance_still_matters_within_aspect():
    window = [(10.0, 7), (1.0, 1), (9.0, 8), (2.0, 2)]
    aspects = {7: "x", 8: "x", 1: "y", 2: "y"}
    picks = pm2_select(window, aspects, 4)
    xs = [d for _r, d, a, _o in picks if a == "x"]
    ys = [d for _r, d, a, _o in picks if a == "y"]
    assert xs == [7, 8] and ys == [2, 1]  # by relevance, not doc_id


def test_pm2_single_aspect_degenerates_to_relevance_order():
    window = [(3.0, 5), (5.0, 9), (4.0, 1)]
    aspects = {5: "only", 9: "only", 1: "only"}
    picks = pm2_select(window, aspects, 3)
    assert [d for _r, d, _a, _o in picks] == [9, 1, 5]
