"""Sequence packing for LLM training (concat-then-chunk).

The standard pretraining data layout (GPT-2/3, The Pile): concatenate
every document's tokens in a fixed global order and slice the stream
into fixed-length context windows; a document therefore occupies the
half-open token range ``[tok_start, tok_start + n_tokens)`` and spans
windows ``tok_start // C .. (tok_start + n_tokens - 1) // C``.

Everything reduces to a distributed EXCLUSIVE PREFIX SUM of the token
counts under the global document order — the same two-pass scan as
dense doc-id assignment (stages/docids.py, whose block-probe machinery
this module reuses): sort by the id (elided when the probe proves the
input already globally ordered), sum each block's counts remotely, do
the exclusive scan driver-side over ONE scalar per block (O(blocks)
driver state, never O(rows)), then stamp each block with a vectorized
in-block cumsum + its block offset.  No all-to-all beyond the (often
elided) sort; at 100 TB the scan state is a few thousand int64s.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .docids import _as_arrow, _block_refs, _probed_order

PACK_VERSION = "pack-v1"


@ray.remote
def _block_count_sum(block, count_col: str) -> int:
    import pyarrow.compute as pc

    tbl = _as_arrow(block)
    if tbl.num_rows == 0:
        return 0
    s = pc.sum(tbl[count_col]).as_py()
    return int(s or 0)


_STAMP_COLS = ("tok_start", "win_first", "win_last", "n_windows")


@ray.remote
def _stamp_pack(block, offset: int, count_col: str, ctx_len: int) -> pa.Table:
    tbl = _as_arrow(block)
    if tbl.num_rows == 0:
        for name in _STAMP_COLS:
            tbl = tbl.append_column(name, pa.array([], pa.int64()))
        return tbl
    cnt = (
        tbl[count_col].combine_chunks().to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    start = offset + np.concatenate([[0], np.cumsum(cnt)[:-1]]).astype(
        np.int64
    )
    # zero-token docs: empty range at their stream position, 0 windows
    last_tok = start + np.maximum(cnt, 1) - 1
    win_first = start // ctx_len
    win_last = last_tok // ctx_len
    n_windows = np.where(cnt > 0, win_last - win_first + 1, 0).astype(
        np.int64
    )
    for name, arr in zip(
        _STAMP_COLS, (start, win_first, win_last, n_windows)
    ):
        tbl = tbl.append_column(name, pa.array(arr))
    return tbl


def pack_sequences(
    ds: "ray.data.Dataset",
    ctx_len: int,
    *,
    id_col: str = "doc_id",
    count_col: str = "n_tokens",
    check_sorted: bool = True,
) -> "ray.data.Dataset":
    """Append ``tok_start / win_first / win_last / n_windows`` columns
    under the global ``id_col`` order for context length ``ctx_len``.

    Partitioning assumption (documented, shared with assign_doc_ids):
    after the range-partitioned sort, block key ranges are disjoint, so
    first-key order is the total order.  ``check_sorted=True`` probes
    the input first and elides the sort when it is already globally
    ordered by ``id_col`` — the common case for documents read back
    from the id-sorted corpus layout.
    """
    if ctx_len <= 0:
        raise ValueError("ctx_len must be positive")
    ds = ds.materialize()
    refs, probes = _probed_order(_block_refs(ds), id_col, None)
    if not refs:
        # all-empty input (e.g. an upstream gate dropped every row):
        # preserve the contract schema
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                count_col: pa.array([], pa.int64()),
                **{c: pa.array([], pa.int64()) for c in _STAMP_COLS},
            }
        )
        return ray.data.from_arrow(empty)
    ordered = all(p["sorted"] for p in probes) and all(
        probes[i]["last"] <= probes[i + 1]["first"]
        for i in range(len(probes) - 1)
    )
    if not (check_sorted and ordered):
        ds = ds.sort(id_col).materialize()
        refs, probes = _probed_order(_block_refs(ds), id_col, None)

    sums = ray.get([_block_count_sum.remote(r, count_col) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]]).astype(np.int64)
    stamped = [
        _stamp_pack.remote(r, int(o), count_col, int(ctx_len))
        for r, o in zip(refs, offsets)
    ]
    return ray.data.from_arrow_refs(stamped)
