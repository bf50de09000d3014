"""Doc-range-partitioned FLOAT doc-value sidecar — the per-doc numeric
feature column for ``mode='rank_feature'`` scoring (fulltext_index tier;
the model is Lucene/Elasticsearch ``rank_feature`` fields: a static
per-doc signal — PageRank, url length, freshness — stored as a
doc-value next to the postings and folded into scoring at query time).

Layout and access pattern are identical to the collapse sidecar
(stages/collapse_map.py, the VERDICT-r03-approved at-scale shape):
hive-partitioned parquet bucketed by doc-id RANGE (``bucket = doc_id //
range_docs``), so a scorer actor resolving features for one segment's
candidates reads ONLY the few bucket files covering that segment's doc
range and caches them per actor — never a driver-broadcast dense array
(terabytes at 10^12 docs).

Unlike the collapse map, missing doc ids are LEGAL and resolve to
``default`` (ES rank_feature semantics: a doc without the feature field
simply gets no contribution), so partial feature coverage — e.g. a link
graph that never saw isolated pages — needs no densification pass.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

import ray
import ray.data

__all__ = ["build_feature_map", "FeatureMap", "DEFAULT_RANGE_DOCS"]

FEATURE_VERSION = "feature-v1"
# same bucket sizing trade-off as the collapse sidecar: ~8 MB raw per
# bucket, ~10^6 files at 10^12 docs
DEFAULT_RANGE_DOCS = 1 << 20


def build_feature_map(
    feats: "ray.data.Dataset",
    out_dir: str,
    *,
    doc_id_col: str = "doc_id",
    feature_col: str = "feature",
    range_docs: int = DEFAULT_RANGE_DOCS,
) -> str:
    """Stream ``feats`` (doc_id, feature) -> the partitioned sidecar
    (idempotent via _SUCCESS).  One pass: tag each row with its range
    bucket and write hive-partitioned parquet — no global state, so the
    build is embarrassingly parallel at any corpus size."""
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch[doc_id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = batch[feature_col].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "feature": pa.array(vals, pa.float64()),
            "bucket": pa.array(ids // range_docs, pa.int64()),
        })

    feats.select_columns([doc_id_col, feature_col]).map_batches(
        tag, batch_format="pyarrow"
    ).write_parquet(out_dir, partition_cols=["bucket"])
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"version": FEATURE_VERSION, "range_docs": range_docs}, f)
    with open(done, "w") as f:
        f.write(FEATURE_VERSION)
    return out_dir


class FeatureMap:
    """Per-actor lazy reader of the sidecar.  ``fm[docs]`` resolves an
    int64 doc-id array to float64 features, loading (and caching) only
    the bucket files the ids fall in; ids absent from the sidecar get
    ``default``."""

    def __init__(self, root: str, *, default: float = 0.0):
        with open(os.path.join(root, "meta.json")) as f:
            meta = json.load(f)
        self.root = root
        self.range_docs: int = int(meta["range_docs"])
        self.default = float(default)
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _load(self, bucket: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self._cache.get(bucket)
        if hit is not None:
            return hit
        import pyarrow.parquet as pq

        bdir = os.path.join(self.root, f"bucket={bucket}")
        if not os.path.isdir(bdir):
            ids = np.empty(0, dtype=np.int64)
            vals = np.empty(0, dtype=np.float64)
        else:
            tbl = pq.read_table(bdir, columns=["doc_id", "feature"])
            ids = tbl["doc_id"].to_numpy().astype(np.int64)
            vals = tbl["feature"].to_numpy().astype(np.float64)
            order = np.argsort(ids, kind="stable")
            ids, vals = ids[order], vals[order]
        self._cache[bucket] = (ids, vals)
        return ids, vals

    def __getitem__(self, docs: np.ndarray) -> np.ndarray:
        docs = np.asarray(docs, dtype=np.int64)
        out = np.full(docs.size, self.default, dtype=np.float64)
        buckets = docs // self.range_docs
        for b in np.unique(buckets):
            ids, vals = self._load(int(b))
            m = buckets == b
            if ids.size == 0:
                continue
            want = docs[m]
            pos = np.searchsorted(ids, want)
            pos_c = np.minimum(pos, ids.size - 1)
            found = ids[pos_c] == want
            sub = out[m]
            sub[found] = vals[pos_c[found]]
            out[m] = sub
        return out
