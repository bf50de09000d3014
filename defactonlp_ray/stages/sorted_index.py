"""Index sorting + early-terminated top-k (Lucene index sorting /
Elasticsearch ``index.sort.field``).

Lucene can sort each segment's doc ids by a static field at index time
(``IndexWriterConfig.setIndexSort``); a query whose sort matches the
index sort then terminates per-segment collection after ``k`` competitive
hits — it never decodes the tail of any postings list.  This module is
the Ray-Data-first equivalent with a STRONGER property: because our
segments are doc-RANGE partitioned and doc ids are assigned as the global
rank under the sort key, the index is sorted across segments, not just
within them — so a conjunctive top-k scans segments in order and stops
at the first segment boundary after the k-th hit, never OPENING the
remaining segments (Lucene must still visit every segment).

Build: ``doc_id`` reassignment is the global rank under
``(sort_val DESC, orig_doc_id ASC)``, computed by the existing
block-prefix-sum id assigner (stages/docids.py) over ONE composite int64
key — ``(max_val - sort_val) << SHIFT | orig_doc_id`` — so the index
build itself stays the zero-shuffle sorted layout.  The original ids ride
in a doc-range-partitioned ``sortmap/`` sidecar (one parquet per block,
row-group-pruned point reads at query time), exactly like the docstats
sidecars — no driver-resident mapping at any corpus size.

Serving: conjunction (AND) over the query terms, per segment a sorted
``np.intersect1d`` chain, accumulated in segment order until ``k`` hits.
Matched index ids map back through one filtered sidecar read bounded by
the k-th hit's id (a PREFIX of the sort order, so the read prunes to the
leading row groups).

Scale note: the composite key bounds corpora at ``orig_doc_id < 2**SHIFT``
(default 2**42 ≈ 4.4e12 docs) with ``sort_val < 2**(63-SHIFT)`` (2**21,
fine for n_chars-like quality fields); widen by key-packing into two
int64 sort columns if either bound binds.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray
import ray.data

from .docids import assign_doc_ids
from .index_build import build_index
from .search import IndexReader
from .util import pool_size

__all__ = [
    "build_sorted_index",
    "sorted_conjunction_topk",
    "SortedSearcherActor",
    "sorted_search",
]

_ID_SHIFT = 42  # orig_doc_id occupies the low 42 bits of the sort key


def build_sorted_index(
    docs: "ray.data.Dataset",
    index_dir: str,
    *,
    sort_col: str = "n_chars",
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    seg_docs: int = 4096,
    codec: str = "varint",
    resume: bool = True,
) -> str:
    """Build an index whose doc ids are the global rank under
    ``(sort_col DESC, doc_id ASC)``, plus the ``sortmap/`` sidecar
    mapping index ids back to ``(orig_doc_id, sort_val)``."""
    done = os.path.join(index_dir, "sortmap", "_SUCCESS")
    if resume and os.path.exists(done):
        return index_dir

    def add_key(batch: pa.Table) -> pa.Table:
        v = batch[sort_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[doc_id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if (v >= (1 << (63 - _ID_SHIFT))).any() or (d >= (1 << _ID_SHIFT)).any():
            raise ValueError("sort_val/doc_id exceed the composite-key bounds")
        # max-val complement: DESC on sort_val == ASC on the complement;
        # the id-assign sort is ascending on ONE key
        key = ((((1 << (63 - _ID_SHIFT)) - 1) - v) << _ID_SHIFT) | d
        return batch.append_column("_sort_key", pa.array(key, pa.int64()))

    stamped = assign_doc_ids(
        docs.map_batches(add_key, batch_format="pyarrow"),
        key="_sort_key",
        col="_new_id",
    )
    build_index(
        stamped.select_columns(["_new_id", text_col]),
        index_dir,
        doc_id_col="_new_id",
        text_col=text_col,
        seg_docs=seg_docs,
        codec=codec,
        resume=resume,
        layout="sorted",
    )
    smap_dir = os.path.join(index_dir, "sortmap")
    if os.path.isdir(smap_dir):
        # a crash between the index build and the _SUCCESS marker leaves a
        # partial sidecar; write_parquet would APPEND duplicate files
        import shutil

        shutil.rmtree(smap_dir)
    (
        stamped.select_columns(["_new_id", doc_id_col, sort_col])
        .map_batches(
            lambda t: t.rename_columns(["doc_id", "orig_doc_id", "sort_val"]),
            batch_format="pyarrow",
        )
        .write_parquet(smap_dir)
    )
    with open(done + ".tmp", "w") as f:
        f.write("ok")
    os.replace(done + ".tmp", done)
    return index_dir


def _sortmap_lookup(index_dir: str, ids: np.ndarray) -> dict[int, tuple[int, int]]:
    """index id -> (orig_doc_id, sort_val) via a filtered sidecar read.
    The ids are a PREFIX region of the sort order, so ``doc_id <= max``
    prunes to the leading row groups / files."""
    if ids.size == 0:
        return {}
    dset = pads.dataset(os.path.join(index_dir, "sortmap"), format="parquet")
    tbl = dset.to_table(
        filter=(pads.field("doc_id") >= int(ids.min()))
        & (pads.field("doc_id") <= int(ids.max()))
    )
    sel = tbl.filter(pc.is_in(tbl["doc_id"], pa.array(ids, pa.int64())))
    return dict(
        zip(
            sel["doc_id"].to_numpy(zero_copy_only=False).tolist(),
            zip(
                sel["orig_doc_id"].to_numpy(zero_copy_only=False).tolist(),
                sel["sort_val"].to_numpy(zero_copy_only=False).tolist(),
            ),
        )
    )


def sorted_conjunction_topk(
    reader: IndexReader, terms: list[str], k: int
) -> tuple[np.ndarray, int]:
    """First ``k`` docs IN INDEX ORDER matching ALL ``terms`` —
    under an index sorted by (field DESC, orig id ASC) these ARE the
    global top-k by that field.  Returns ``(index_ids, segments_opened)``
    — the second value is the early-termination evidence (tests assert
    it; the actor drops it).  Segments are visited in doc order and the
    scan STOPS at the first segment boundary with >= k accumulated hits;
    later segments are never read."""
    from .deletes import live_mask

    uniq = sorted(set(terms))
    if not uniq:
        return np.array([], dtype=np.int64), 0
    hits: list[np.ndarray] = []
    total = 0
    opened = 0
    for sid in reader.seg_ids:
        opened += 1
        reader.load_postings(sid, uniq)
        cur: Optional[np.ndarray] = None
        for t in uniq:
            row = reader.postings(sid, t)
            if row is None:
                cur = None
                break
            d = row["decoded"][0]
            cur = d if cur is None else np.intersect1d(cur, d, assume_unique=True)
            if cur.size == 0:
                cur = None
                break
        if cur is not None:
            if reader.deleted.size:
                cur = cur[live_mask(cur, reader.deleted)]
            if cur.size:
                hits.append(cur)
                total += cur.size
        if total >= k:
            break
    if not hits:
        return np.array([], dtype=np.int64), opened
    return np.concatenate(hits)[:k], opened


class SortedSearcherActor:
    """Actor-pool stage: batch of (query_id, terms) -> (query_id, rank,
    doc_id, sort_val) under index-sorted early-terminated conjunction."""

    def __init__(self, index_dir: str, k: int = 10):
        self.index_dir = index_dir
        self.reader = IndexReader(index_dir)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_r, out_d, out_v = [], [], [], []
        for qid, terms in zip(
            batch["query_id"].to_pylist(), batch["terms"].to_pylist()
        ):
            ids, _ = sorted_conjunction_topk(self.reader, list(terms), self.k)
            m = _sortmap_lookup(self.index_dir, ids)
            for rank, iid in enumerate(ids.tolist(), 1):
                orig, val = m[iid]
                out_q.append(qid)
                out_r.append(rank)
                out_d.append(orig)
                out_v.append(val)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "rank": pa.array(out_r, pa.int32()),
                "doc_id": pa.array(out_d, pa.int64()),
                "sort_val": pa.array(out_v, pa.int64()),
            }
        )


def sorted_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """Index-sorted early-terminated conjunction pipeline:
    (query_id, terms) -> (query_id, rank, doc_id, sort_val)."""
    return queries.map_batches(
        SortedSearcherActor,
        fn_constructor_kwargs={"index_dir": index_dir, "k": k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )
