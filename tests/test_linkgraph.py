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


def test_extract_anchors_semantics():
    from defactonlp_ray.stages.linkgraph import extract_anchors

    tbl = pa.table({
        "url": ["a", "b", "c", "d"],
        "html": [
            # extra attributes after the href are skipped to the tag's '>'
            '<p><a href="u1">Hello World</a> <a href="u2" class="z">Two'
            " words</a></p>",
            "no links here",
            # no closing '<' -> the anchor run extends to end-of-doc
            '<a href="u3">unterminated anchor run',
            # u4 has no '>' at all -> link kept, anchor "";
            # u5's attribute never closes -> dropped entirely
            '<a href="u4"no-gt plus <a href="u5',
        ],
    })
    out = (
        extract_anchors(ray.data.from_arrow(tbl))
        .to_pandas()
        .sort_values(["src", "dst"])
    )
    got = list(zip(out["src"], out["dst"], out["anchor"]))
    assert got == [
        ("a", "u1", "Hello World"),
        ("a", "u2", "Two words"),
        ("c", "u3", "unterminated anchor run"),
        ("d", "u4", ""),
    ]


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


def test_pagerank_routes_agree():
    # broadcast (small-V regime, auto default) vs join (any-V) must be
    # result-identical on the same graph; also covers the out-of-universe
    # edge drop in the broadcast index coder
    rng = np.random.default_rng(13)
    n = 60
    edges = sorted(
        {
            (int(s), int(d))
            for s, d in rng.integers(0, n, size=(300, 2))
            if s != d
        }
    )
    covered = {s for s, _ in edges}
    edges += [(s, (s + 1) % n) for s in range(n) if s not in covered]
    e_tbl = pa.table({
        "src": pa.array([s for s, _ in edges], pa.int64()),
        "dst": pa.array([d for _, d in edges], pa.int64()),
    })
    n_tbl = pa.table({"node": pa.array(range(n), pa.int64())})
    outs = {}
    for route in ("broadcast", "join"):
        outs[route] = (
            pagerank(
                ray.data.from_arrow(e_tbl),
                ray.data.from_arrow(n_tbl),
                iters=6,
                route=route,
            )
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
    assert np.allclose(
        outs["broadcast"]["rank"].to_numpy(),
        outs["join"]["rank"].to_numpy(),
        rtol=1e-9,
        atol=1e-12,
    )


# ------------------- connected-components method equality (dedup.py)

def _cc(pairs, method):
    from defactonlp_ray.stages.dedup import connected_components

    tbl = pa.table({
        "id_a": pa.array([a for a, _ in pairs], pa.int64()),
        "id_b": pa.array([b for _, b in pairs], pa.int64()),
    })
    out = connected_components(
        ray.data.from_arrow(tbl), method=method
    ).to_pandas()
    if len(out) == 0:
        return {}
    return dict(zip(out["node"], out["label"]))


def test_cc_star_equals_minlabel():
    # one mixed graph, both methods once (every extra run costs ~1 min
    # of fixed Ray-op latency at test scale): an 8-node chain (diameter
    # 7 — the high-diameter shape star contraction exists for), a
    # triangle, an isolated pair, and a random component mix
    rng = np.random.default_rng(11)
    pairs = [(i, i + 1) for i in range(100, 107)]          # chain
    pairs += [(200, 201), (201, 202), (200, 202), (300, 301)]
    pairs += sorted(
        {
            (int(min(a, b)), int(max(a, b)))
            for a, b in rng.integers(0, 40, size=(45, 2))
            if a != b
        }
    )
    star = _cc(pairs, "star")
    assert {n: star[n] for n in range(100, 108)} == {
        n: 100 for n in range(100, 108)
    }
    assert {n: star[n] for n in (200, 201, 202, 300, 301)} == {
        200: 200, 201: 200, 202: 200, 300: 300, 301: 300,
    }
    assert star == _cc(pairs, "minlabel")


def test_cc_rejects_unknown_method():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _cc([(1, 2)], "nope")
