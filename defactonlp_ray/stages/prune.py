"""Static index pruning (Carmel et al., SIGIR 2001 "Static index
pruning for information retrieval systems"): derive a smaller index
that keeps, PER TERM, only the ``n_keep`` postings with the highest
BM25 impact — the classic web-scale latency/footprint lever (posting
lists become O(n_keep) regardless of df, so tail latency stops scaling
with collection size for head terms).

Pinned pruning rule (the SQL oracle mirrors it exactly):

* impact of a posting = the stored BM25 weight
  ``w = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` with the
  FULL-corpus ``avgdl`` — idf is constant within a term and cannot
  change the per-term ranking, so it is not part of the rule;
* keep rank = ``row_number() over (partition by term
  order by w DESC, doc_id ASC) <= n_keep``;
* global statistics (df, cf, n_docs, total_len — hence idf and avgdl)
  are RETAINED from the full index: pruning drops postings, never
  statistics.  ``stats/`` is copied wholesale and per-segment meta
  keeps the source doc counts, so scores of surviving (term, doc)
  pairs are bit-identical to the full index's.

Distributed shape (all stages streaming, shuffle bounded by design):

1. per-segment decode (``map_batches`` over the segment list, one Ray
   task per segment) emits (term, doc_id, tf, dl, w) rows with a
   PER-SEGMENT combiner prune to the local top-``n_keep`` per term —
   the global top-N is a subset of the union of per-segment top-Ns, so
   the exchange carries at most ``n_keep * n_segments`` rows per term
   instead of the full cf;
2. ``groupby(term).map_groups`` applies the same rule globally;
3. kept rows route back to their ORIGINAL segment (doc-range lookup
   against the source metas, broadcast once) and
   ``groupby(sid).map_groups`` re-encodes each pruned segment through
   the same batched codec path as a fresh build — the pruned index is
   byte-compatible with a built one and serves through the unchanged
   ``IndexReader``/searcher stack.

Segments re-encode with the self-healing resume pattern of the main
build (existing dir + manifest line => skip), and the whole prune
publishes a ``_SUCCESS`` marker so callers can reuse a finished output.
"""
from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..sources import manifest as mf
from .codec import CODEC_VERSION, encode_postings_batch

PRUNE_VERSION = "v1"

__all__ = ["prune_index", "PRUNE_VERSION"]


def _src_metas(src_dir: str) -> dict[int, dict]:
    recs = mf.read_manifest(src_dir)
    if not recs:
        raise ValueError(f"no finished segments under {src_dir}")
    metas = {}
    for sid in recs:
        with open(os.path.join(mf.segment_dir(src_dir, sid), "meta.json")) as f:
            metas[sid] = json.load(f)
    return metas


def _local_topn(path: str, avgdl: float, n_keep: int) -> pa.Table:
    """Decode one segment and keep the per-term local top-``n_keep`` by
    (w DESC, doc_id ASC) — the combiner that bounds the term shuffle."""
    from .search import _decode_segment_arrays

    tnames, bounds, docids, tfs, dls, w = _decode_segment_arrays(path, avgdl)
    counts = np.diff(bounds)
    if docids.size == 0:
        return pa.table(
            {
                "term": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "tf": pa.array([], pa.int64()),
                "dl": pa.array([], pa.int64()),
                "w": pa.array([], pa.float64()),
            }
        )
    term_codes = np.repeat(np.arange(len(tnames)), counts)
    order = np.lexsort((docids, -w, term_codes))
    idx_in_term = np.arange(docids.size) - np.repeat(bounds[:-1], counts)
    kept = order[idx_in_term < n_keep]
    kept.sort()  # restore (term, doc) layout — cheap, keeps output sorted
    terms_arr = pa.array(tnames, pa.string()).take(
        pa.array(term_codes[kept], pa.int64())
    )
    return pa.table(
        {
            "term": terms_arr,
            "doc_id": pa.array(docids[kept], pa.int64()),
            "tf": pa.array(tfs[kept], pa.int64()),
            "dl": pa.array(dls[kept], pa.int64()),
            "w": pa.array(w[kept], pa.float64()),
        }
    )


def _global_topn(group: pa.Table, n_keep: int) -> pa.Table:
    """The same rule over the union of local winners — exact because the
    global top-N per term is contained in the union of local top-Ns."""
    g = group.sort_by([("w", "descending"), ("doc_id", "ascending")])
    return g.slice(0, n_keep)


def _encode_pruned_segment(
    group: pa.Table, sid: int, dst_dir: str, src_dir: str,
    src_meta: dict, codec: str, n_keep: int,
) -> dict:
    """Re-encode one pruned segment; same atomic-write + self-healing
    resume protocol as the main build's ``_build_segment_table``."""
    import pyarrow.compute as pc

    final_dir = mf.segment_dir(dst_dir, sid)
    if os.path.isdir(final_dir):
        if sid not in mf.read_manifest(dst_dir):
            with open(os.path.join(final_dir, "meta.json")) as f:
                meta = json.load(f)
            mf.append_manifest(dst_dir, meta)
        else:
            with open(os.path.join(final_dir, "meta.json")) as f:
                meta = json.load(f)
        return meta
    group = group.sort_by([("term", "ascending"), ("doc_id", "ascending")])
    post_doc = group["doc_id"].to_numpy().astype(np.int64)
    tfs = group["tf"].to_numpy().astype(np.int64)
    dls = group["dl"].to_numpy().astype(np.int64)
    tcol = group["term"].combine_chunks()
    n_rows = len(tcol)
    if n_rows > 1:
        neq = pc.invert(pc.equal(tcol.slice(1), tcol.slice(0, n_rows - 1)))
        starts = np.concatenate(
            [[0], np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1]
        ).astype(np.int64)
    else:
        starts = np.zeros(min(n_rows, 1), dtype=np.int64)
    uniq_terms = tcol.take(pa.array(starts)) if n_rows else tcol
    bounds = np.append(starts, n_rows)
    enc = encode_postings_batch(post_doc, tfs, dls, bounds, codec)
    n_terms = len(uniq_terms)
    # empty segment (every posting lost globally): the encoder returns no
    # offsets — a single 0 keeps the list columns well-formed at 0 rows
    blk_offs = pa.array(enc.get("blk_offsets", [0]), pa.int32())
    postings = pa.table(
        {
            "n": pa.array(np.asarray(enc["n"], dtype=np.int64)),
            "codec": pa.array([codec] * n_terms, pa.string()),
            "doc_blob": pa.array(enc["doc_blob"], pa.binary()),
            "tf_blob": pa.array(enc["tf_blob"], pa.binary()),
            "dl_blob": pa.array(enc["dl_blob"], pa.binary()),
            "blk_last_doc": pa.ListArray.from_arrays(
                blk_offs, pa.array(enc["blk_last_doc"], pa.int64())
            ),
            "blk_max_tf": pa.ListArray.from_arrays(
                blk_offs, pa.array(enc["blk_max_tf"], pa.int64())
            ),
            "blk_min_dl": pa.ListArray.from_arrays(
                blk_offs, pa.array(enc["blk_min_dl"], pa.int64())
            ),
            "term": uniq_terms,
            "cf": pa.array(enc["cf"], pa.int64()),
        }
    )
    dstats = pq.read_table(
        os.path.join(mf.segment_dir(src_dir, sid), "docstats.parquet")
    )
    meta = {
        "sid": sid,
        # collection stats RETAINED from the full segment (pinned rule)
        "n_docs": src_meta["n_docs"],
        "total_len": src_meta["total_len"],
        "n_terms": n_terms,
        "n_postings": int(n_rows),
        "doc_lo": src_meta["doc_lo"],
        "doc_hi": src_meta["doc_hi"],
        "codec": codec,
        "codec_version": CODEC_VERSION,
        "tokenizer_version": src_meta.get("tokenizer_version"),
        "positions": False,
        "pruned_from": sid,
        "n_keep": n_keep,
    }
    with mf.atomic_write_dir(final_dir) as tmp:
        pq.write_table(postings, os.path.join(tmp, "postings.parquet"))
        pq.write_table(dstats, os.path.join(tmp, "docstats.parquet"))
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f)
    return meta


def prune_index(
    src_dir: str,
    dst_dir: str,
    n_keep: int,
    *,
    codec: str | None = None,
    concurrency: int = 4,
) -> str:
    """Build the impact-pruned index for ``src_dir`` into ``dst_dir``
    (see module docstring for the pinned rule and distributed shape).
    Idempotent: a finished output (``_SUCCESS`` matching the source
    manifest fingerprint) is reused."""
    if n_keep < 1:
        raise ValueError("n_keep must be >= 1")
    metas = _src_metas(src_dir)
    with open(os.path.join(src_dir, "stats", "collection.json")) as f:
        coll = json.load(f)
    avgdl = float(coll["total_len"]) / float(coll["n_docs"])
    fp = "{}-{}-{}-{}".format(
        PRUNE_VERSION, n_keep, len(metas),
        sum(m["n_postings"] for m in metas.values()),
    )
    marker = os.path.join(dst_dir, "_SUCCESS")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == fp:
                return dst_dir
        shutil.rmtree(dst_dir)  # stale output for a different source/rule
    if any(m.get("positions") for m in metas.values()):
        raise NotImplementedError(
            "impact pruning of positional segments would need position-"
            "stream filtering (as in expunge_deletes); prune the "
            "bag-of-words index instead"
        )
    codecs = {m["codec"] for m in metas.values()}
    out_codec = codec or (codecs.pop() if len(codecs) == 1 else "varint")

    sids = sorted(metas)
    doc_los = np.array([metas[s]["doc_lo"] for s in sids], dtype=np.int64)
    sid_arr = np.array(sids, dtype=np.int64)

    seg_items = [
        {
            "path": os.path.join(mf.segment_dir(src_dir, s), "postings.parquet"),
        }
        for s in sids
    ]

    def decode_prune(batch: pa.Table) -> pa.Table:
        parts = [
            _local_topn(p, avgdl, n_keep) for p in batch["path"].to_pylist()
        ]
        return pa.concat_tables(parts)

    rows = (
        ray.data.from_items(seg_items)
        .map_batches(
            decode_prune, batch_format="pyarrow", batch_size=1, num_cpus=1
        )
        .groupby("term")
        .map_groups(
            lambda g: _global_topn(g, n_keep), batch_format="pyarrow"
        )
    )

    def route(batch: pa.Table) -> pa.Table:
        docs = batch["doc_id"].to_numpy()
        pos = np.searchsorted(doc_los, docs, side="right") - 1
        return batch.append_column("sid", pa.array(sid_arr[pos], pa.int64()))

    meta_by_sid = {s: metas[s] for s in sids}

    def write_seg(group: pa.Table) -> pa.Table:
        sid = int(group["sid"][0].as_py())
        meta = _encode_pruned_segment(
            group.drop_columns(["sid", "w"]), sid, dst_dir, src_dir,
            meta_by_sid[sid], out_codec, n_keep,
        )
        return pa.table(
            {
                "sid": pa.array([sid], pa.int64()),
                "n_postings": pa.array([meta["n_postings"]], pa.int64()),
            }
        )

    os.makedirs(dst_dir, exist_ok=True)
    written = (
        rows.map_batches(route, batch_format="pyarrow")
        .groupby("sid")
        .map_groups(write_seg, batch_format="pyarrow")
        .to_pandas()
    )
    done = set(int(s) for s in written["sid"])
    # publish manifest lines for freshly written segments (self-healed
    # ones appended their own); one buffered append = the commit point
    recs = mf.read_manifest(dst_dir)
    pending = []
    for sid in sids:
        if sid in recs:
            continue
        seg = mf.segment_dir(dst_dir, sid)
        if sid not in done and not os.path.isdir(seg):
            # a segment whose every posting lost globally: write it empty
            # so the doc range stays covered (resume/fsck invariants)
            _encode_pruned_segment(
                pa.table(
                    {
                        "term": pa.array([], pa.string()),
                        "doc_id": pa.array([], pa.int64()),
                        "tf": pa.array([], pa.int64()),
                        "dl": pa.array([], pa.int64()),
                    }
                ),
                sid, dst_dir, src_dir, meta_by_sid[sid], out_codec, n_keep,
            )
        with open(os.path.join(mf.segment_dir(dst_dir, sid), "meta.json")) as f:
            pending.append(json.load(f))
    if pending:
        mf.append_manifest_many(dst_dir, pending)
    # global stats RETAINED from the full index (pinned rule): idf/avgdl
    # of surviving pairs stay bit-identical to the unpruned scorer's
    dst_stats = os.path.join(dst_dir, "stats")
    if not os.path.isdir(dst_stats):
        shutil.copytree(os.path.join(src_dir, "stats"), dst_stats)
    with open(marker, "w") as f:
        f.write(fp)
    return dst_dir
