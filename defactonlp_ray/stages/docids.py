"""Deterministic dense doc_id assignment (SURVEY.md §7.6.1).

Pinned rule: ``doc_id`` = rank of ``url`` under a global sort — unique,
dense, parallelism-invariant (hash ids rejected: collisions + non-dense
gaps hurt delta-gap compression).

Ray Data has no zipWithIndex, so this is one of the few places the Dataset
API genuinely can't express the semantics: we take the block refs of the
(materialized) dataset, ORDER THEM EXPLICITLY by each block's first key
(bundle iteration order follows execution completion, NOT logical order —
verified empirically; a range-partitioned sort gives disjoint block key
ranges, so first-key order is the total order), exclusive-prefix-sum the
per-block row counts, and stamp each block's id range with remote tasks.

``latest_by`` fuses the url as-of dedup (F5) into the same sort: under
the (key, latest_by) order duplicate keys are ADJACENT, so keep-latest is
a vectorized per-block dedup plus one boundary rule — no separate winners
pass over the corpus.

Already-strictly-sorted inputs (unique keys, e.g. curated crawl dumps)
skip the sort entirely: the probe proves global order after first-key
reordering, and the elided sort is the input's only all-to-all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _as_arrow(block) -> pa.Table:
    # Ray blocks may be pyarrow Tables or pandas DataFrames depending on
    # the upstream op; normalize.
    if isinstance(block, pa.Table):
        return block
    return pa.Table.from_pandas(block, preserve_index=False)


def _block_refs(ds) -> list:
    refs: list = []
    for bundle in ds.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    return refs


@ray.remote
def _block_key_probe(block, key: str, sub: str | None):
    import pyarrow.compute as pc

    tbl = _as_arrow(block)
    arr = tbl[key].combine_chunks() if tbl.num_rows else tbl[key]
    n = len(arr)
    if n > 1:
        # vectorized adjacent compares (a Python loop here cost ~1 core-s
        # per million keys across probe tasks)
        le = pc.less_equal(arr.slice(0, n - 1), arr.slice(1))
        is_sorted = bool(pc.all(le).as_py())
        if is_sorted:
            lt = pc.less(arr.slice(0, n - 1), arr.slice(1))
            is_strict = bool(pc.all(lt).as_py())
        else:
            is_strict = False
    else:
        is_sorted = is_strict = True
    return {
        "n": n,
        "first": arr[0].as_py() if n else None,
        "last": arr[n - 1].as_py() if n else None,
        "first_sub": tbl[sub][0].as_py() if sub and n else None,
        "sorted": is_sorted,
        "strict": is_strict,
    }


@ray.remote
def _stamp(block, start: int, col: str) -> pa.Table:
    tbl = _as_arrow(block)
    ids = pa.array(np.arange(start, start + tbl.num_rows, dtype=np.int64))
    return tbl.append_column(col, ids)


@ray.remote(num_returns=2)
def _dedup_adjacent(block, key: str, next_first_key):
    """Keep-last per ``key`` within a (key, ts)-sorted block; if the next
    block starts with this block's trailing key, the key's global last
    occurrence lives later — drop it here too (chain-safe: every
    non-final block containing the key drops its copy).  Vectorized
    adjacent-compare (was a Python loop over every key)."""
    import pyarrow.compute as pc

    tbl = _as_arrow(block)
    n = tbl.num_rows
    if n == 0:
        return tbl, 0
    keys = tbl[key].combine_chunks()
    if n > 1:
        neq = pc.invert(pc.equal(keys.slice(0, n - 1), keys.slice(1)))
        mask = np.concatenate(
            [neq.to_numpy(zero_copy_only=False), [True]]
        ).astype(bool)
    else:
        mask = np.array([True])
    if next_first_key is not None and keys[n - 1].as_py() == next_first_key:
        mask[n - 1] = False
    out = tbl.filter(pa.array(mask))
    return out, out.num_rows


def _probed_order(refs, key: str, sub: str | None):
    """Probe all blocks, return (refs, probes) reordered by each block's
    (first key, first sub) — the total order when block key ranges are
    disjoint (range-partitioned sort output) or the input is sorted."""
    probes = ray.get([_block_key_probe.remote(r, key, sub) for r in refs])
    pairs = [(r, p) for r, p in zip(refs, probes) if p["n"] > 0]
    if sub is None:
        pairs.sort(key=lambda rp: rp[1]["first"])
    else:
        pairs.sort(key=lambda rp: (rp[1]["first"], rp[1]["first_sub"]))
    return [r for r, _ in pairs], [p for _, p in pairs]


def assign_doc_ids(
    ds: "ray.data.Dataset", key: str = "url", col: str = "doc_id",
    check_sorted: bool = True, latest_by: str | None = None,
) -> "ray.data.Dataset":
    """Append dense int64 ``col`` = global rank of ``key`` (optionally
    deduplicating to the latest ``latest_by`` row per key first).

    Returns a dataset whose blocks are in ``key`` order with contiguous
    ids starting at 0 (the precondition for the index build's
    zero-shuffle ``layout="sorted"``).
    """
    ds = ds.materialize()
    refs, probes = _probed_order(_block_refs(ds), key, latest_by)

    def _boundaries(strict: bool) -> bool:
        op = (lambda a, b: a < b) if strict else (lambda a, b: a <= b)
        return all(
            op(probes[i]["last"], probes[i + 1]["first"])
            for i in range(len(probes) - 1)
        )

    strictly_sorted = all(p["strict"] for p in probes) and _boundaries(True)
    if latest_by:
        # skipping the sort with dedup requires STRICT global order
        # (equal keys would need a (key, ts) order the probe can't prove)
        skip_sort = check_sorted and strictly_sorted
    else:
        skip_sort = check_sorted and all(p["sorted"] for p in probes) and _boundaries(False)

    if not skip_sort:
        sort_key = [key, latest_by] if latest_by else key
        ds = ds.sort(sort_key).materialize()
        refs, probes = _probed_order(_block_refs(ds), key, latest_by)

    if latest_by and not strictly_sorted:
        next_first = [
            probes[i + 1]["first"] if i + 1 < len(refs) else None
            for i in range(len(refs))
        ]
        pairs = [
            _dedup_adjacent.remote(r, key, nf)
            for r, nf in zip(refs, next_first)
        ]
        refs = [p[0] for p in pairs]
        counts = ray.get([p[1] for p in pairs])
    else:
        counts = [p["n"] for p in probes]

    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    stamped = [_stamp.remote(r, int(s), col) for r, s in zip(refs, starts)]
    return ray.data.from_arrow_refs(stamped)
