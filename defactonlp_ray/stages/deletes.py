"""Doc-level deletes over the segment index — the Lucene live-docs model
(fulltext_index tier; SURVEY.md §2 extension — the reference stack is
build-once, SURVEY.md §0; semantics follow Lucene's deleted-docs design:
a delete is a SIDE FILE masking docs at query time, postings and global
stats stay physically untouched — stale df/n_docs/avgdl — until a merge
(``index_build.expunge_deletes``) rewrites the affected segments and
refreshes the stats).

Write model: each ``delete_docs`` call writes ONE new immutable parquet
file under ``<index_dir>/deletes/`` via tmp-file + ``os.rename`` (atomic
on POSIX); readers take the union of every delete file at init.  No
read-modify-write, so concurrent deleters never lose ids and a crash
mid-write leaves only an ignored ``.tmp`` file.  At 10^12 docs the
per-file id sets stay small (deletes are rare relative to corpus size)
and the union is one driver-side concat; compaction/expunge clears the
files it has applied, bounding the set.

Query-time filtering points (all vectorized, one ``searchsorted`` per
candidate array):

* TAAT / tf-idf: candidate mask before the final top-k
  (``stages/search.score_all_taat`` and friends).
* WAND: the per-reader term packs drop deleted postings at build and
  recompute their block bounds from the filtered arrays (tighter, still
  valid upper bounds — pruning-only, exactness unchanged).
* shared index: merged per-term arrays filtered before the block-metadata
  recompute in ``build_shared_index``.
* phrase / proximity / boolean: matched-doc mask inside the ``score_*``
  entry points (phrase pseudo-term df counts LIVE matches — query-time
  df, same rule both routes).
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["delete_docs", "read_deletes", "live_mask", "clear_delete_files"]

_DELETES_DIR = "deletes"


def _deletes_dir(index_dir: str) -> str:
    return os.path.join(index_dir, _DELETES_DIR)


def delete_docs(index_dir: str, doc_ids) -> int:
    """Record ``doc_ids`` as deleted (one new immutable delete file).
    Returns the number of ids written.  Idempotent across calls: readers
    union all files, so re-deleting an id is a no-op."""
    ids = np.unique(np.asarray(doc_ids, dtype=np.int64))
    if ids.size == 0:
        return 0
    ddir = _deletes_dir(index_dir)
    os.makedirs(ddir, exist_ok=True)
    existing = [f for f in os.listdir(ddir) if f.endswith(".parquet")]
    n = 1 + max(
        [int(f.split("-")[1]) for f in existing if f.startswith("del-")],
        default=0,
    )
    # per-call unique suffix: two concurrent deleters that race to the
    # same sequence number (same-pid threads, pid collisions across
    # nodes) still write DISTINCT files — neither's ids are lost
    final = os.path.join(
        ddir, f"del-{n:06d}-{os.getpid()}-{uuid.uuid4().hex[:8]}.parquet"
    )
    tmp = final + ".tmp"
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64())}), tmp)
    os.rename(tmp, final)
    return int(ids.size)


def _delete_files(index_dir: str) -> list[str]:
    ddir = _deletes_dir(index_dir)
    if not os.path.isdir(ddir):
        return []
    return sorted(
        os.path.join(ddir, f)
        for f in os.listdir(ddir)
        if f.endswith(".parquet")
    )


def read_deletes(index_dir: str, *, return_files: bool = False):
    """Union of every delete file -> sorted unique int64 array (empty
    array when none).  ``return_files=True`` also returns the file list
    snapshot, so expunge can clear exactly what it applied (deletes
    landing mid-expunge survive for the next pass)."""
    files = _delete_files(index_dir)
    parts, read_ok = [], []
    for f in files:
        try:
            parts.append(pq.read_table(f, columns=["doc_id"]))
            read_ok.append(f)
        except FileNotFoundError:
            # a concurrent expunge cleared this file between the listing
            # and the read — its ids are already physically applied to
            # the rewritten segments, so skipping it is correct
            continue
    if not parts:
        ids = np.empty(0, dtype=np.int64)
        return (ids, []) if return_files else ids
    tbl = pa.concat_tables(parts)
    ids = np.unique(tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))
    return (ids, read_ok) if return_files else ids


def clear_delete_files(files: list[str]) -> None:
    """Remove applied delete files (expunge's last step; files created
    after the snapshot are untouched)."""
    for f in files:
        try:
            os.remove(f)
        except FileNotFoundError:
            pass


def live_mask(docids: np.ndarray, deleted: np.ndarray) -> np.ndarray:
    """Boolean mask of ``docids`` NOT in the sorted ``deleted`` array —
    one searchsorted, no Python loop."""
    if deleted.size == 0:
        return np.ones(docids.size, dtype=bool)
    idx = np.searchsorted(deleted, docids)
    hit = (idx < deleted.size) & (deleted[np.minimum(idx, deleted.size - 1)] == docids)
    return ~hit
