"""Link-graph operators: vectorized href extraction + BSP PageRank
(stages/linkgraph.py) vs a serial numpy reference."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from defactonlp_ray.stages.linkgraph import extract_links, pagerank


def test_extract_links_vectorized():
    htmls = [
        b'<a href="u1">x</a> <a href="u2">y</a>',
        b"no links here",
        b'<link href="css"><a href="u3">z',
        b'broken <a href="unterminated',  # no closing quote -> dropped
        b"",
    ]
    tbl = pa.table({
        "url": pa.array([f"p{i}" for i in range(len(htmls))], pa.string()),
        "html": pa.array(htmls, pa.binary()),
    })
    out = extract_links(ray.data.from_arrow(tbl)).to_pandas()
    got = sorted(zip(out["src"], out["dst"]))
    assert got == [("p0", "u1"), ("p0", "u2"), ("p2", "css"), ("p2", "u3")]


def _pagerank_numpy(edges, n, damping=0.85, iters=10):
    outdeg = np.zeros(n)
    for s, _d in edges:
        outdeg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, d in edges:
            contrib[d] += r[s] / outdeg[s]
        r = (1 - damping) / n + damping * contrib
    return r


def test_pagerank_matches_numpy_reference():
    rng = np.random.default_rng(7)
    n = 30
    edges = sorted(
        {
            (int(s), int(d))
            for s, d in rng.integers(0, n, size=(120, 2))
            if s != d
        }
    )
    # give every node at least one out-edge (the engine and the numpy
    # reference both use the plain dangling-mass-leaks formulation, but
    # outdeg=0 would divide by zero in the reference)
    covered = {s for s, _ in edges}
    edges += [(s, (s + 1) % n) for s in range(n) if s not in covered]
    e_tbl = pa.table({
        "src": pa.array([s for s, _ in edges], pa.int64()),
        "dst": pa.array([d for _, d in edges], pa.int64()),
    })
    n_tbl = pa.table({"node": pa.array(range(n), pa.int64())})
    got = (
        pagerank(
            ray.data.from_arrow(e_tbl), ray.data.from_arrow(n_tbl), iters=10
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = _pagerank_numpy(edges, n)
    assert len(got) == n
    assert np.allclose(got["rank"].to_numpy(), want, rtol=0, atol=1e-12)


def test_pagerank_isolated_node_keeps_base_rank():
    # node 3 has no edges at all: rank must stay (1-d)/N every iteration
    e_tbl = pa.table({
        "src": pa.array([0, 1, 2], pa.int64()),
        "dst": pa.array([1, 2, 0], pa.int64()),
    })
    n_tbl = pa.table({"node": pa.array(range(4), pa.int64())})
    got = (
        pagerank(
            ray.data.from_arrow(e_tbl), ray.data.from_arrow(n_tbl), iters=5
        )
        .to_pandas()
        .set_index("node")["rank"]
    )
    assert np.isclose(got.loc[3], 0.15 / 4, atol=1e-15)
    # the 3-cycle nodes keep the uniform fixed point of the cycle
    assert np.allclose(got.loc[[0, 1, 2]], 0.15 / 4 + 0.85 * 0.25, atol=1e-12)
