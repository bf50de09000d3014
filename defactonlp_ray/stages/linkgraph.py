"""Link-graph analysis over web pages (fulltext_index tier extension —
the reference stack has no link analysis, SURVEY.md §0; the algorithms
are the public classics: href extraction + PageRank, Page et al. 1999).

Three operators, all Ray-Data-shaped:

* :func:`extract_links` — (url, html) pages -> (src, dst) edge rows via
  VECTORIZED ``href="..."`` extraction: ``pc.split_pattern`` on the
  attribute marker explodes each page into fragments, the first
  ``"``-delimited run of every non-leading fragment is the link target
  (``pc.list_element`` of a second split) — no per-row Python, no regex
  engine in the hot path.
* :func:`pagerank` — fixed-iteration BSP PageRank over an edge list,
  with TWO physical routes auto-picked by node count (the same
  broadcast-vs-join split the dedup family uses):

  - ``join`` (any V): per iteration ONE hash join ships each node's
    current rank to its out-edges, a vectorized ``Sum`` groupby
    accumulates contributions per target, and a zero-contribution
    union row per node keeps in-link-less nodes alive WITHOUT an
    outer join.  Out-degrees are joined onto the edge table once,
    before the loop.  At cluster scale the known refinement is to
    hash-partition edges and ranks by ``src`` once and reuse that
    partitioning across iterations instead of re-shuffling per join.
  - ``broadcast`` (V ≤ ``broadcast_max_nodes``; E unbounded): the
    rank vector is O(V) while the edge list is O(E) — when V fits in
    one ``ray.put`` (≤ ~8 MB/1M nodes) the per-iteration join+shuffle
    collapses to one shuffle-free ``map_batches`` pass over the
    once-materialized index-coded edges: each block bincounts its
    contributions into a dense partial vector (one row per block,
    O(V × blocks) driver reduce, bounded by the broadcast gate), the
    driver sums the partials, and the next iteration's vector is
    re-broadcast.  This is the classic small-V/huge-E web-graph
    regime (Page et al. 1999 ran exactly this shape).

  Iteration count is fixed (deterministic output), matching the
  unrolled-CTE SQL oracle exactly; both routes are result-identical
  after the entry's 6-dp rounding (tested).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .util import cut_lineage, arrow_project

__all__ = ["extract_links", "extract_anchors", "pagerank", "hits"]


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


def extract_anchors(
    pages: "ray.data.Dataset",
    *,
    url_col: str = "url",
    html_col: str = "html",
) -> "ray.data.Dataset":
    """(url, html) -> one ``(src, dst, anchor)`` row per closed
    ``href="..."`` occurrence.  ``anchor`` is the text run between the
    first ``>`` after the attribute's closing quote and the next ``<``
    (the visible link text of a simple ``<a href="x">text</a>`` tag);
    an occurrence with no ``>`` before end-of-document gets ``anchor=""``
    rather than being dropped — the link itself is still real.

    Same vectorized shape as :func:`extract_links`: split-pattern
    explosion, no per-row Python.  Anchor capture costs one extra
    ``find_substring`` + two bounded ``split_pattern`` passes over the
    post-quote tails.
    """

    def anchors(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "src": pa.array([], pa.string()),
            "dst": pa.array([], pa.string()),
            "anchor": pa.array([], pa.string()),
        })
        if batch.num_rows == 0:
            return empty
        html = pc.cast(batch[html_col], pa.string())
        frags = pc.split_pattern(html, 'href="')
        if isinstance(frags, pa.ChunkedArray):
            frags = frags.combine_chunks()
        n_frags = pc.list_value_length(frags).to_numpy(zero_copy_only=False)
        flat = frags.flatten()
        offsets = np.zeros(len(frags) + 1, dtype=np.int64)
        np.cumsum(n_frags, out=offsets[1:])
        keep = np.ones(len(flat), dtype=bool)
        keep[offsets[:-1][n_frags > 0]] = False
        rows = np.repeat(np.arange(len(frags)), n_frags)[keep]
        if not keep.any():
            return empty
        tails = flat.take(pa.array(np.flatnonzero(keep), pa.int64()))
        split2 = pc.split_pattern(tails, '"', max_splits=1)
        closed = pc.equal(pc.list_value_length(split2), 2)
        closed_np = closed.to_numpy(zero_copy_only=False)
        closed_lists = pc.filter(split2, closed)
        dst = pc.list_element(closed_lists, 0)
        rest = pc.list_element(closed_lists, 1)
        # anchor: text between the first '>' and the following '<'.
        # Rows without '>' keep anchor="" (scattered below); rows WITH
        # '>' get a '<' sentinel appended so the second split always
        # has a leading element, even for an unterminated anchor run.
        has_gt = pc.greater_equal(pc.find_substring(rest, ">"), 0)
        has_gt_np = has_gt.to_numpy(zero_copy_only=False)
        m = len(rest)
        anchor_np = np.full(m, "", dtype=object)
        if has_gt_np.any():
            after_gt = pc.list_element(
                pc.split_pattern(pc.filter(rest, has_gt), ">", max_splits=1),
                1,
            )
            with_sentinel = pc.binary_join_element_wise(
                after_gt, pa.scalar("<"), pa.scalar("")
            )
            anchor_f = pc.list_element(
                pc.split_pattern(with_sentinel, "<", max_splits=1), 0
            )
            anchor_np[has_gt_np] = anchor_f.to_numpy(zero_copy_only=False)
        src = (
            batch[url_col].combine_chunks()
            if isinstance(batch[url_col], pa.ChunkedArray)
            else batch[url_col]
        ).take(pa.array(rows[closed_np], pa.int64()))
        return pa.table({
            "src": src,
            "dst": dst,
            "anchor": pa.array(anchor_np, pa.string()),
        })

    return pages.select_columns([url_col, html_col]).map_batches(
        anchors, batch_format="pyarrow"
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
    route: str = "auto",
    broadcast_max_nodes: int = 1_000_000,
) -> "ray.data.Dataset":
    """Fixed-iteration PageRank: ``(node, rank)`` after ``iters`` BSP
    rounds from the uniform start, ``rank = (1-d)/N + d * Σ in-contrib``.

    ``nodes`` fixes the node universe (isolated nodes keep the base
    rank); dangling nodes (no out-edges) leak their mass, matching the
    plain iterative formulation the SQL oracle unrolls — callers who
    need mass conservation add self-loops or a dangling-sum term.

    ``route="auto"`` picks ``broadcast`` when the node universe fits
    the ``ray.put`` gate (V ≤ ``broadcast_max_nodes``), else ``join``.
    """
    import ray as _ray
    from ray.data.aggregate import Count, Sum

    n_cpu = int(_ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(16, n_cpu // 2))
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes
    if route == "auto":
        route = "broadcast" if n_nodes <= broadcast_max_nodes else "join"
    if route == "broadcast":
        return _pagerank_broadcast(
            edges, nodes, damping=damping, iters=iters, src_col=src_col,
            dst_col=dst_col, node_col=node_col, n_nodes=n_nodes,
        )

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
        # per-round lineage checkpoint (stages/util.cut_lineage): the
        # iterative join/union DAG otherwise makes Ray's stats
        # summarization quadratic-to-exponential in rounds
        ranks = cut_lineage(contrib.map_batches(
            lambda b: pa.table({
                "node": b["node"],
                "rank": pc.add(
                    pa.scalar(base),
                    pc.multiply(pa.scalar(damping), b["c"]),
                ),
            }),
            batch_format="pyarrow",
        ).materialize())
    return ranks


def _pagerank_broadcast(
    edges: "ray.data.Dataset",
    nodes: "ray.data.Dataset",
    *,
    damping: float,
    iters: int,
    src_col: str,
    dst_col: str,
    node_col: str,
    n_nodes: int,
) -> "ray.data.Dataset":
    """Broadcast-rank route: edges stay distributed and are index-coded
    once; each iteration is one shuffle-free ``map_batches`` pass whose
    blocks emit dense ``np.bincount`` partials (one row per block) that
    the driver sums — valid only under the caller's V gate.  Edges with
    an endpoint outside the ``nodes`` universe are dropped (defensive;
    callers are expected to pass a closed universe)."""
    import ray as _ray

    node_ids = np.sort(
        np.concatenate(
            [
                b[node_col].to_numpy(zero_copy_only=False)
                for b in nodes.select_columns([node_col]).iter_batches(
                    batch_format="pyarrow", batch_size=None
                )
            ]
            or [np.array([], dtype=np.int64)]
        )
    )
    n = len(node_ids)
    if n == 0:
        return nodes.select_columns([node_col]).map_batches(
            lambda b: pa.table(
                {"node": b[node_col], "rank": pa.array([], pa.float64())}
            ),
            batch_format="pyarrow",
        )
    ids_ref = _ray.put(node_ids)

    def to_idx(batch: pa.Table) -> pa.Table:
        ids = _ray.get(ids_ref)
        sv = batch[src_col].to_numpy(zero_copy_only=False)
        dv = batch[dst_col].to_numpy(zero_copy_only=False)
        si = np.clip(np.searchsorted(ids, sv), 0, n - 1)
        di = np.clip(np.searchsorted(ids, dv), 0, n - 1)
        # inner-join semantics: drop edges with an endpoint outside the
        # node universe (matches the join route exactly)
        keep = (ids[si] == sv) & (ids[di] == dv)
        return pa.table({
            "si": pa.array(si[keep], pa.int64()),
            "di": pa.array(di[keep], pa.int64()),
        })

    idx_edges = edges.map_batches(to_idx, batch_format="pyarrow").materialize()

    def _reduce_partials(ds) -> np.ndarray:
        acc = np.zeros(n, dtype=np.float64)
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
            for part in b["part"]:
                acc += np.asarray(part.values, dtype=np.float64)
        return acc

    def deg_partial(batch: pa.Table) -> pa.Table:
        cnt = np.bincount(
            batch["si"].to_numpy(), minlength=n
        ).astype(np.float64)
        return pa.table({"part": pa.array([cnt], pa.list_(pa.float64()))})

    outdeg = _reduce_partials(
        idx_edges.map_batches(deg_partial, batch_format="pyarrow")
    )
    safe_deg = np.where(outdeg > 0, outdeg, 1.0)

    base = (1.0 - damping) / n_nodes
    rank = np.full(n, 1.0 / n_nodes, dtype=np.float64)
    for _it in range(iters):
        w = damping * rank / safe_deg  # outdeg==0 rows emit no edges anyway
        w_ref = _ray.put(w)

        def contrib(batch: pa.Table, _w_ref=w_ref) -> pa.Table:
            wv = _ray.get(_w_ref)
            si = batch["si"].to_numpy()
            di = batch["di"].to_numpy()
            part = np.bincount(di, weights=wv[si], minlength=n)
            return pa.table({"part": pa.array([part], pa.list_(pa.float64()))})

        rank = base + _reduce_partials(
            idx_edges.map_batches(contrib, batch_format="pyarrow")
        )

    rank_ref = _ray.put(rank)

    def attach(batch: pa.Table) -> pa.Table:
        ids = _ray.get(ids_ref)
        rv = _ray.get(rank_ref)
        idx = np.searchsorted(ids, batch[node_col].to_numpy(zero_copy_only=False))
        return pa.table({
            "node": batch[node_col],
            "rank": pa.array(rv[idx], pa.float64()),
        })

    return nodes.select_columns([node_col]).map_batches(
        attach, batch_format="pyarrow"
    )


def hits(
    edges: "ray.data.Dataset",
    nodes: "ray.data.Dataset",
    *,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    broadcast_max_nodes: int = 1_000_000,
) -> "ray.data.Dataset":
    """Kleinberg 1999 HITS: ``(node, authority, hub)`` after ``iters``
    mutual-reinforcement rounds — a(v) = Σ h(u) over in-edges, then
    L2-normalize; h(u) = Σ a(v) over out-edges, then L2-normalize;
    uniform 1.0 start.

    Physical shape: the broadcast route (pagerank's small-V/huge-E
    regime — asserted by the ``broadcast_max_nodes`` gate): edges are
    index-coded once and stay distributed; each round is two
    shuffle-free ``map_batches`` passes whose blocks emit dense
    ``np.bincount`` partials, summed and normalized on the driver.
    The O(V)-state-per-round join-route analogue mirrors
    :func:`pagerank`'s (two rank-shipping hash joins + Sum groupbys
    per round) and is the documented path past the gate."""
    import ray as _ray

    n_nodes = nodes.count()
    if n_nodes > broadcast_max_nodes:
        raise ValueError(
            f"hits broadcast route gated at {broadcast_max_nodes} nodes "
            f"(got {n_nodes}); partition by node range and use the "
            "join-route shape documented in the docstring"
        )
    node_ids = np.sort(
        np.concatenate(
            [
                b[node_col].to_numpy(zero_copy_only=False)
                for b in nodes.select_columns([node_col]).iter_batches(
                    batch_format="pyarrow", batch_size=None
                )
            ]
            or [np.array([], dtype=np.int64)]
        )
    )
    n = len(node_ids)
    if n == 0:
        return nodes.select_columns([node_col]).map_batches(
            lambda b: pa.table({
                "node": b[node_col],
                "authority": pa.array([], pa.float64()),
                "hub": pa.array([], pa.float64()),
            }),
            batch_format="pyarrow",
        )
    ids_ref = _ray.put(node_ids)

    def to_idx(batch: pa.Table) -> pa.Table:
        ids = _ray.get(ids_ref)
        sv = batch[src_col].to_numpy(zero_copy_only=False)
        dv = batch[dst_col].to_numpy(zero_copy_only=False)
        si = np.clip(np.searchsorted(ids, sv), 0, n - 1)
        di = np.clip(np.searchsorted(ids, dv), 0, n - 1)
        keep = (ids[si] == sv) & (ids[di] == dv)
        return pa.table({
            "si": pa.array(si[keep], pa.int64()),
            "di": pa.array(di[keep], pa.int64()),
        })

    idx_edges = edges.map_batches(to_idx, batch_format="pyarrow").materialize()

    def _reduce(ds) -> np.ndarray:
        acc = np.zeros(n, dtype=np.float64)
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
            for part in b["part"]:
                acc += np.asarray(part.values, dtype=np.float64)
        return acc

    def _l2(v: np.ndarray) -> np.ndarray:
        norm = float(np.sqrt(np.sum(v * v)))
        return v / norm if norm > 0 else v

    auth = np.ones(n, dtype=np.float64)
    hub = np.ones(n, dtype=np.float64)
    for _it in range(iters):
        h_ref = _ray.put(hub)

        def a_part(batch: pa.Table, _r=h_ref) -> pa.Table:
            hv = _ray.get(_r)
            part = np.bincount(
                batch["di"].to_numpy(),
                weights=hv[batch["si"].to_numpy()], minlength=n,
            )
            return pa.table({"part": pa.array([part], pa.list_(pa.float64()))})

        auth = _l2(_reduce(
            idx_edges.map_batches(a_part, batch_format="pyarrow")
        ))
        a_ref = _ray.put(auth)

        def h_part(batch: pa.Table, _r=a_ref) -> pa.Table:
            av = _ray.get(_r)
            part = np.bincount(
                batch["si"].to_numpy(),
                weights=av[batch["di"].to_numpy()], minlength=n,
            )
            return pa.table({"part": pa.array([part], pa.list_(pa.float64()))})

        hub = _l2(_reduce(
            idx_edges.map_batches(h_part, batch_format="pyarrow")
        ))

    a_ref, h_ref = _ray.put(auth), _ray.put(hub)

    def attach(batch: pa.Table) -> pa.Table:
        ids = _ray.get(ids_ref)
        av, hv = _ray.get(a_ref), _ray.get(h_ref)
        idx = np.searchsorted(ids, batch[node_col].to_numpy(zero_copy_only=False))
        return pa.table({
            "node": batch[node_col],
            "authority": pa.array(av[idx], pa.float64()),
            "hub": pa.array(hv[idx], pa.float64()),
        })

    return nodes.select_columns([node_col]).map_batches(
        attach, batch_format="pyarrow"
    )
