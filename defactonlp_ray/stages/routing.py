"""Routing-partitioned indexes: a routed query touches ONE partition.

The Elasticsearch ``?routing=`` shape: documents are partitioned by a
routing column at index time (one bounded index per route value under
``root/route=<v>/``) and a query that carries its route is served from
exactly that partition — the other partitions are never opened, read,
or scored.  At 100 TB this is the difference between every query
fanning out to all shards and a query costing O(one shard): tenant-,
language- or site-partitioned corpora serve point queries sublinearly
in corpus size.

Scoring statistics are ROUTE-LOCAL (df, n_docs, avgdl of the partition
alone), which is exactly what a per-route index gives for free and what
Elasticsearch's default shard-local stats do; the registry oracle
mirrors it with per-lang grouped stats in SQL, so the semantics are
pinned, not accidental.

Build: one :func:`..stages.index_build.build_index` per route value —
each build is itself a distributed Ray Data run; the loop is over the
(small) set of distinct route values, never over docs.  Builds are
independently resumable and a ``routes.json`` written last marks the
family complete.

Serve: :class:`RoutedSearcherActor` opens per-route
:class:`..stages.search.IndexReader`\\ s lazily and caches them for the
actor's lifetime, so an actor pool warms only the routes its queries
actually name.  A route with no partition (no docs had it) yields no
rows — the SQL-join semantics, same as an absent term.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .search import IndexReader, pool_size, score_all_taat
from .index_build import build_index

__all__ = ["build_routed_index", "routed_search", "RoutedSearcherActor"]

_ROUTES_FILE = "routes.json"


def build_routed_index(
    docs: "ray.data.Dataset",
    root: str,
    *,
    route_col: str = "lang",
    routes: Optional[list[str]] = None,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    seg_docs: int = 1 << 17,
    codec: str = "varint",
) -> list[str]:
    """Partition ``docs`` by ``route_col`` value and build one index per
    route under ``root/route=<v>``.  Returns the sorted route list;
    idempotent (each per-route build resumes, and a finished family —
    ``routes.json`` present — returns immediately)."""
    marker = os.path.join(root, _ROUTES_FILE)
    if os.path.exists(marker):
        with open(marker, encoding="utf-8") as f:
            return json.load(f)["routes"]
    # materialize the pruned corpus ONCE: the per-route loop below then
    # filters object-store blocks instead of re-reading + re-decoding
    # the source parquet |routes| times.  (The single-pass alternative —
    # one groupby(route_col) feeding per-route segment builders — saves
    # the remaining R filter passes at the cost of a full shuffle; with
    # block-level route pruning the filter pass is the cheaper side of
    # that trade until R is large.)
    docs = docs.materialize()
    if routes is None:
        # the distinct route set is small by design (langs, tenants);
        # this is a tiny aggregate, not a corpus materialization
        from ray.data.aggregate import Count

        rows = docs.groupby(route_col).aggregate(Count()).take_all()
        routes = sorted(str(r[route_col]) for r in rows)
    os.makedirs(root, exist_ok=True)
    for v in routes:
        part = docs.map_batches(
            lambda t, v=v: t.filter(pc.equal(t[route_col], v)),
            batch_format="pyarrow",
        )
        build_index(
            part, os.path.join(root, f"route={v}"), resume=True,
            doc_id_col=doc_id_col, text_col=text_col,
            seg_docs=seg_docs, codec=codec,
        )
    tmp = marker + f".tmp-{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"routes": routes}, f)
    os.replace(tmp, marker)
    return routes


class RoutedSearcherActor:
    """Actor-pool stage: batch of (query_id, terms, route) -> top-k rows
    served from the route's partition index only.  Readers open lazily
    per route and live for the actor's lifetime; routes without a
    partition produce no rows."""

    def __init__(self, root: str, k: int = 10):
        self.root = root
        self.k = k
        self._readers: dict[str, Optional[IndexReader]] = {}

    def _reader(self, route: str) -> Optional[IndexReader]:
        if route not in self._readers:
            d = os.path.join(self.root, f"route={route}")
            self._readers[route] = (
                IndexReader(d) if os.path.isdir(d) else None
            )
        return self._readers[route]

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["query_id"].to_pylist()
        terms_col = batch["terms"].to_pylist()
        routes = batch["route"].to_pylist()
        by_route: dict[str, list[int]] = {}
        for i, r in enumerate(routes):
            by_route.setdefault(r, []).append(i)
        out_q, out_r, out_d, out_s = [], [], [], []
        for route in sorted(by_route):
            reader = self._reader(route)
            if reader is None:
                continue
            idxs = by_route[route]
            all_terms = sorted({t for i in idxs for t in terms_col[i]})
            dfs = reader.dfs(all_terms)
            idfs = {t: reader.idf(t) for t in all_terms}
            present = [t for t in all_terms if dfs[t] > 0]
            for sid in reader.seg_ids:
                reader.load_postings(sid, present)
            for i in idxs:
                uniq = sorted(set(terms_col[i]))
                top = score_all_taat(
                    reader, reader.seg_ids, uniq, idfs, self.k
                )
                for rank, (score, doc_id) in enumerate(top, 1):
                    out_q.append(qids[i])
                    out_r.append(rank)
                    out_d.append(doc_id)
                    out_s.append(score)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "rank": pa.array(out_r, pa.int32()),
                "doc_id": pa.array(out_d, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def routed_search(
    root: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """Routed query pipeline: (query_id, terms, route) ->
    (query_id, rank, doc_id, score), each query served from its route's
    partition only (route-local stats)."""
    return queries.map_batches(
        RoutedSearcherActor,
        fn_constructor_kwargs={"root": root, "k": k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )
