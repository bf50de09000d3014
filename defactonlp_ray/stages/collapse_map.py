"""Doc-range-partitioned collapse sidecar — the at-scale doc->group map
for ``mode='collapse'`` (fulltext_index tier; the model is Lucene/
Elasticsearch doc-values: a per-segment column the collapse operator
reads next to the postings, never a monolithic in-memory map).

Why: the broadcast route (``ray.put`` one dense ``doc_id -> code``
array) is right while the corpus fits a driver array, but at 10^12 docs
that array is terabytes (VERDICT r03 What's-wrong #4).  This sidecar
stores the map as hive-partitioned parquet bucketed by doc-id RANGE
(``bucket = doc_id // range_docs``), so a scorer actor resolving group
codes for one segment's candidates reads ONLY the few bucket files
covering that segment's doc range — the same partition-pruning shape as
the ANN/trgm sidecars — and caches them per actor.

Codes are GLOBAL and deterministic: the code of a group value is its
rank in the sorted distinct-value list (distinct groups are assumed
small relative to docs — sources, hosts, domains).  Both routes
(broadcast array and this sidecar) therefore produce identical codes,
names, and rankings; ``queries.py`` exposes both under the same SQL
oracle and the route-equality is tested.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

import ray
import ray.data

__all__ = ["build_collapse_map", "CollapseMap", "DEFAULT_RANGE_DOCS"]

COLLAPSE_VERSION = "collapse-v1"
# doc ids per bucket file: 1M codes ≈ 8 MB raw per bucket — small enough
# that one segment's scorer touches a handful of object-store-sized
# reads, large enough that a 10^12-doc map is ~10^6 files, not 10^9
DEFAULT_RANGE_DOCS = 1 << 20


def build_collapse_map(
    docs: "ray.data.Dataset",
    out_dir: str,
    *,
    doc_id_col: str = "doc_id",
    group_col: str = "source",
    range_docs: int = DEFAULT_RANGE_DOCS,
) -> str:
    """Stream ``docs`` -> the partitioned sidecar (idempotent via
    _SUCCESS).  Two passes, both streamed: (1) distinct group values
    (pre-deduped per batch so the aggregate shuffles distinct values,
    not rows), sorted into the deterministic code dictionary; (2) tag
    each (doc_id, group) row with its code + range bucket and write
    hive-partitioned parquet."""
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir

    def batch_distinct(batch: pa.Table) -> pa.Table:
        return pa.table({group_col: batch[group_col].combine_chunks().unique()})

    src = docs.select_columns([doc_id_col, group_col])
    names = sorted(
        src.map_batches(batch_distinct, batch_format="pyarrow")
        .unique(group_col)
    )
    code_ref = ray.put(pa.array(names))

    class _Tag:  # actor pool: the code dictionary resolves ONCE per actor
        def __init__(self, ref):
            self.names = ray.get(ref)  # sorted: position == code

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ids = batch[doc_id_col].to_numpy().astype(np.int64)
            codes = pc.index_in(  # vectorized dictionary-encode
                batch[group_col].combine_chunks(), value_set=self.names
            )
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "code": codes.cast(pa.int32()),
                "bucket": pa.array(ids // range_docs, pa.int64()),
            })

    from .util import pool_size

    src.map_batches(
        _Tag,
        fn_constructor_kwargs={"ref": code_ref},
        batch_format="pyarrow",
        concurrency=pool_size(4),
        num_cpus=1,
    ).write_parquet(out_dir, partition_cols=["bucket"])
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(
            {"version": COLLAPSE_VERSION, "range_docs": range_docs,
             "names": names},
            f,
        )
    with open(done, "w") as f:
        f.write(COLLAPSE_VERSION)
    return out_dir


class CollapseMap:
    """Per-actor lazy reader of the sidecar.  ``cm[docs]`` resolves an
    int64 doc-id array to group codes, loading (and caching) only the
    bucket files the ids fall in — drop-in for the broadcast dense
    array's fancy indexing in ``score_all_collapse``."""

    def __init__(self, root: str):
        with open(os.path.join(root, "meta.json")) as f:
            meta = json.load(f)
        self.root = root
        self.range_docs: int = int(meta["range_docs"])
        self.names: list = meta["names"]
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _load(self, bucket: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self._cache.get(bucket)
        if hit is not None:
            return hit
        import pyarrow.parquet as pq

        bdir = os.path.join(self.root, f"bucket={bucket}")
        if not os.path.isdir(bdir):
            ids = np.empty(0, dtype=np.int64)
            codes = np.empty(0, dtype=np.int64)
        else:
            tbl = pq.read_table(bdir, columns=["doc_id", "code"])
            ids = tbl["doc_id"].to_numpy().astype(np.int64)
            codes = tbl["code"].to_numpy().astype(np.int64)
            order = np.argsort(ids, kind="stable")
            ids, codes = ids[order], codes[order]
        self._cache[bucket] = (ids, codes)
        return ids, codes

    def __getitem__(self, docs: np.ndarray) -> np.ndarray:
        docs = np.asarray(docs, dtype=np.int64)
        out = np.empty(docs.size, dtype=np.int64)
        buckets = docs // self.range_docs
        for b in np.unique(buckets):
            ids, codes = self._load(int(b))
            m = buckets == b
            want = docs[m]
            pos = np.searchsorted(ids, want)
            if ids.size == 0 or np.any(pos >= ids.size) or np.any(
                ids[np.minimum(pos, ids.size - 1)] != want
            ):
                raise KeyError(
                    f"collapse map bucket {b}: doc ids missing from sidecar"
                )
            out[m] = codes[pos]
        return out
