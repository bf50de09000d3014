"""Routing-partitioned indexes: routed queries touch one partition."""

import os
import tempfile

import pyarrow as pa
import pytest

import ray.data

from defactonlp_ray import fixtures
from defactonlp_ray.stages.index_build import build_index
from defactonlp_ray.stages.routing import (
    RoutedSearcherActor,
    build_routed_index,
    routed_search,
)
from defactonlp_ray.stages.search import search

_LANGS = ["de", "en", "fr"]


def _docs_tbl(n: int = 300) -> pa.Table:
    pages = fixtures.make_pages(n)
    langs = [_LANGS[i % len(_LANGS)] for i in range(n)]
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array(langs),
            "text": pages["text"],
        }
    )


@pytest.fixture(scope="module")
def routed_root():
    root = os.path.join(tempfile.mkdtemp(), "routed")
    docs = ray.data.from_arrow(_docs_tbl())
    routes = build_routed_index(docs, root, route_col="lang", seg_docs=64)
    assert routes == sorted(_LANGS)
    return root


def _routed_qds(queries, route):
    return ray.data.from_arrow(pa.table({
        "query_id": pa.array([q for q, _ in queries], pa.int64()),
        "terms": pa.array([t for _, t in queries], pa.list_(pa.string())),
        "route": pa.array([route] * len(queries)),
    }))


def test_routed_equals_single_partition_index(routed_root):
    """A routed query must be bit-identical to a plain search over an
    index built from ONLY that route's docs (route-local stats)."""
    queries = fixtures.make_query_terms(5)
    tbl = _docs_tbl()
    en_only = tbl.filter(pa.compute.equal(tbl["lang"], "en"))
    solo = os.path.join(tempfile.mkdtemp(), "solo")
    build_index(ray.data.from_arrow(en_only), solo, seg_docs=64)
    a = (
        routed_search(routed_root, _routed_qds(queries, "en"), k=10,
                      concurrency=2)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    qds = ray.data.from_arrow(pa.table({
        "query_id": pa.array([q for q, _ in queries], pa.int64()),
        "terms": pa.array([t for _, t in queries], pa.list_(pa.string())),
    }))
    b = (
        search(solo, qds, k=10, concurrency=2)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert a.equals(b)


def test_absent_route_yields_no_rows(routed_root):
    queries = fixtures.make_query_terms(3)
    out = routed_search(
        routed_root, _routed_qds(queries, "zz"), k=10, concurrency=2
    ).take_all()
    assert out == []


def test_only_routed_partition_is_opened(routed_root):
    """The actor must open the routed partition's reader and nothing
    else — that is the entire point of routing."""
    actor = RoutedSearcherActor(routed_root, k=5)
    batch = pa.table({
        "query_id": pa.array([0], pa.int64()),
        "terms": pa.array([["w0000", "w0001"]], pa.list_(pa.string())),
        "route": pa.array(["fr"]),
    })
    out = actor(batch)
    assert out.num_rows > 0
    assert set(actor._readers) == {"fr"}


def test_build_is_idempotent(routed_root):
    docs = ray.data.from_arrow(_docs_tbl())
    # second call returns the recorded family without rebuilding
    routes = build_routed_index(docs, routed_root, route_col="lang",
                                seg_docs=64)
    assert routes == sorted(_LANGS)
