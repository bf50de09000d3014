"""Link-graph analysis over web pages (fulltext_index tier extension —
the reference stack has no link analysis, SURVEY.md §0; the algorithms
are the public classics: href extraction + PageRank, Page et al. 1999).

Two operators, both Ray-Data-shaped:

* :func:`extract_links` — (url, html) pages -> (src, dst) edge rows via
  VECTORIZED ``href="..."`` extraction: ``pc.split_pattern`` on the
  attribute marker explodes each page into fragments, the first
  ``"``-delimited run of every non-leading fragment is the link target
  (``pc.list_element`` of a second split) — no per-row Python, no regex
  engine in the hot path.
* :func:`pagerank` — fixed-iteration BSP PageRank over an edge list.
  Per iteration: ONE hash join ships each node's current rank to its
  out-edges, a vectorized ``Sum`` groupby accumulates contributions per
  target, and a zero-contribution union row per node keeps in-link-less
  nodes alive WITHOUT an outer join.  Out-degrees are joined onto the
  edge table once, before the loop.  At cluster scale the known
  refinement is to hash-partition edges and ranks by ``src`` once and
  reuse that partitioning across iterations instead of re-shuffling per
  join; iteration count is fixed (deterministic output), matching the
  unrolled-CTE SQL oracle exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .util import arrow_project

__all__ = ["extract_links", "pagerank"]


def extract_links(
    pages: "ray.data.Dataset",
    *,
    url_col: str = "url",
    html_col: str = "html",
) -> "ray.data.Dataset":
    """(url, html) -> one ``(src, dst)`` row per ``href="..."`` occurrence,
    in document order, duplicates preserved (the caller decides whether
    multi-edges mean weight).  Fully vectorized Arrow kernels."""

    def links(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "src": pa.array([], pa.string()),
            "dst": pa.array([], pa.string()),
        })
        if batch.num_rows == 0:
            return empty
        html = pc.cast(batch[html_col], pa.string())
        frags = pc.split_pattern(html, 'href="')
        if isinstance(frags, pa.ChunkedArray):
            frags = frags.combine_chunks()
        n_frags = pc.list_value_length(frags).to_numpy(zero_copy_only=False)
        flat = frags.flatten()
        # fragment j>0 of a row starts right after one href=" marker;
        # drop each row's fragment 0 (the pre-marker prefix)
        offsets = np.zeros(len(frags) + 1, dtype=np.int64)
        np.cumsum(n_frags, out=offsets[1:])
        keep = np.ones(len(flat), dtype=bool)
        keep[offsets[:-1][n_frags > 0]] = False
        rows = np.repeat(np.arange(len(frags)), n_frags)[keep]
        if not keep.any():
            return empty
        tails = flat.take(pa.array(np.flatnonzero(keep), pa.int64()))
        # the target is the run up to the closing quote; an unterminated
        # attribute (no closing quote before EOF) is dropped
        split2 = pc.split_pattern(tails, '"', max_splits=1)
        closed = pc.equal(pc.list_value_length(split2), 2)
        closed_np = closed.to_numpy(zero_copy_only=False)
        dst = pc.list_element(pc.filter(split2, closed), 0)
        src = (
            batch[url_col].combine_chunks()
            if isinstance(batch[url_col], pa.ChunkedArray)
            else batch[url_col]
        ).take(pa.array(rows[closed_np], pa.int64()))
        return pa.table({"src": src, "dst": dst})

    return pages.select_columns([url_col, html_col]).map_batches(
        links, batch_format="pyarrow"
    )


def pagerank(
    edges: "ray.data.Dataset",
    nodes: "ray.data.Dataset",
    *,
    damping: float = 0.85,
    iters: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
) -> "ray.data.Dataset":
    """Fixed-iteration PageRank: ``(node, rank)`` after ``iters`` BSP
    rounds from the uniform start, ``rank = (1-d)/N + d * Σ in-contrib``.

    ``nodes`` fixes the node universe (isolated nodes keep the base
    rank); dangling nodes (no out-edges) leak their mass, matching the
    plain iterative formulation the SQL oracle unrolls — callers who
    need mass conservation add self-loops or a dangling-sum term.
    """
    import ray as _ray
    from ray.data.aggregate import Count, Sum

    n_cpu = int(_ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(16, n_cpu // 2))
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes

    deg = arrow_project(
        edges.groupby(src_col).aggregate(Count(alias_name="outdeg")),
        [src_col, "outdeg"], {src_col: "__deg_src"},
    )
    edges_deg = edges.join(
        deg, "inner", num_partitions=nparts,
        on=(src_col,), right_on=("__deg_src",),
    )
    if "__deg_src" in edges_deg.columns():
        edges_deg = edges_deg.drop_columns(["__deg_src"])
    edges_deg = edges_deg.materialize()

    def init(batch: pa.Table) -> pa.Table:
        r = np.full(batch.num_rows, 1.0 / n_nodes, dtype=np.float64)
        return pa.table({"node": batch[node_col], "rank": pa.array(r)})

    ranks = nodes.select_columns([node_col]).map_batches(
        init, batch_format="pyarrow"
    ).materialize()
    zeros = nodes.select_columns([node_col]).map_batches(
        lambda b: pa.table({
            "node": b[node_col],
            "c": pa.array(np.zeros(b.num_rows, dtype=np.float64)),
        }),
        batch_format="pyarrow",
    ).materialize()

    for _it in range(iters):
        msgs = edges_deg.join(
            ranks, "inner", num_partitions=nparts,
            on=(src_col,), right_on=("node",),
        ).map_batches(
            lambda b: pa.table({
                "node": b[dst_col],
                "c": pc.divide(b["rank"], pc.cast(b["outdeg"], pa.float64())),
            }),
            batch_format="pyarrow",
        )
        contrib = (
            msgs.union(zeros)
            .groupby("node")
            .aggregate(Sum("c", alias_name="c"))
        )
        ranks = contrib.map_batches(
            lambda b: pa.table({
                "node": b["node"],
                "rank": pc.add(
                    pa.scalar(base),
                    pc.multiply(pa.scalar(damping), b["c"]),
                ),
            }),
            batch_format="pyarrow",
        ).materialize()
    return ranks
