"""Deterministic dense doc_id assignment (SURVEY.md §7.6.1).

Pinned rule: ``doc_id`` = rank of ``url`` under a global sort — unique,
dense, parallelism-invariant (hash ids rejected: collisions + non-dense
gaps hurt delta-gap compression).

Ray Data has no zipWithIndex, so this is one of the few places the Dataset
API genuinely can't express the semantics (see the task's escape hatch):
after ``ds.sort(key)`` we take the ordered block refs, read each block's
row count with tiny remote tasks, exclusive-prefix-sum the counts on the
driver (~1e6 ints at 100 TB — trivial), and stamp each block's id range
with remote tasks.  The sorted dataset is materialized by the sort itself;
at production scale prefer inputs already laid out by key (manifest-ordered
fragments), where doc_id = fragment_offset + row works with no sort at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


@ray.remote
def _block_rows(block: pa.Table) -> int:
    return block.num_rows


@ray.remote
def _stamp(block: pa.Table, start: int, col: str) -> pa.Table:
    ids = pa.array(np.arange(start, start + block.num_rows, dtype=np.int64))
    return block.append_column(col, ids)


def assign_doc_ids(
    ds: "ray.data.Dataset", key: str = "url", col: str = "doc_id"
) -> "ray.data.Dataset":
    """Sort by ``key`` and append a dense int64 ``col`` = global rank."""
    sorted_ds = ds.sort(key)
    refs = sorted_ds.to_arrow_refs()
    counts = ray.get([_block_rows.remote(r) for r in refs])
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    stamped = [
        _stamp.remote(r, int(s), col) for r, s in zip(refs, starts)
    ]
    return ray.data.from_arrow_refs(stamped)
