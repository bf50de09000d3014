"""Inverted-index build pipeline (SURVEY.md §3.1, §7.3) — Ray-Data-native.

Reference behavior (fever-baselines ``build_db.py`` + ``build_tfidf.py``,
unverified — SURVEY.md §0): a multiprocessing.Pool tokenizes doc batches,
the parent concatenates COO triples into ONE scipy CSR in RAM and saves one
``.npz`` — a single-process merge that cannot scale.  This engine replaces
it with doc-partitioned SPIMI segments (IIR ch.4):

    read -> [extract/filter/dedup] -> add ``sid = doc_id // seg_size`` ->
    groupby(sid).map_groups(build_segment) -> atomic segment dirs +
    manifest lineage -> small stats pass (term df/cf groupby over
    per-segment PRE-AGGREGATED term rows) -> stats/ tables.

Scale notes (the design the sandbox run evidences):
* Postings never participate in a global all-to-all: each segment builds
  its postings locally from its own docs.  The only shuffles are (a) the
  doc->segment exchange, which disappears entirely when the input is
  already doc-ordered (``layout="sorted"``), and (b) the term-stats
  groupby, whose input is
  already combined to ONE row per (term, segment) — the classic
  partial/combiner pattern (ray_guide.md:154-158), so even a
  nearly-every-doc head term like a stopword contributes at most
  ``n_segments`` rows: head-term skew is bounded by construction
  (SURVEY.md §4 "skew").
* Rank/score results are segment-layout-invariant (BM25 uses only global
  stats), so segmentation is free to follow storage locality.
* Resume: finished segments are skipped via the manifest
  (sources/manifest.py); stats are derived from segment files, not from the
  building run, so a resumed build produces identical stats.
"""

from __future__ import annotations

import json
import math
import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..functions.tokenizer import TOKENIZER_VERSION, term_count_table
from ..sources import manifest as mf
from .codec import CODEC_VERSION, encode_postings_batch

DEFAULT_SEG_DOCS = 8192


def build_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    url_col: Optional[str] = None,
    n_docs: Optional[int] = None,
    seg_docs: int = DEFAULT_SEG_DOCS,
    codec: str = "varint",
    resume: bool = True,
    layout: str = "grouped",
) -> str:
    """Build (or resume) the index for ``ds`` into ``index_dir``.

    ``ds`` must carry dense-ish int64 ``doc_id`` (use
    :func:`defactonlp_ray.stages.docids.assign_doc_ids` for raw pages) —
    segments are the ranges ``[sid*seg_docs, (sid+1)*seg_docs)``.

    ``layout``:
    * ``"grouped"`` — general path: ``groupby(sid).map_groups`` (one
      doc->segment exchange, any input layout).
    * ``"sorted"`` — zero-shuffle fast path when ``ds`` is already
      doc_id-ordered across blocks with dense ids starting at 0 (exactly
      what assign_doc_ids yields): segment tasks slice the ordered block
      refs directly (each block feeds <=2 segments), no exchange at all.
      The groupby's shuffle machinery was measured as a ~5s CPU-count-
      independent cost — this path removes it and is what makes build
      throughput scale with cluster size.
    """
    os.makedirs(index_dir, exist_ok=True)
    done = set(mf.read_manifest(index_dir)) if resume else set()

    cols = [doc_id_col, text_col] + ([url_col] if url_col else [])
    ds = ds.select_columns(cols)

    if layout == "sorted":
        _build_sorted(ds, index_dir, doc_id_col, text_col, url_col,
                      seg_docs, codec, done)
        _write_stats(index_dir)
        return index_dir

    def add_sid(batch: pa.Table) -> pa.Table:
        sid = pc.cast(
            pc.divide(batch[doc_id_col], pa.scalar(seg_docs, pa.int64())), pa.int64()
        )
        return batch.append_column("sid", sid)

    ds = ds.map_batches(add_sid, batch_format="pyarrow")

    if done:
        done_arr = pa.array(sorted(done), pa.int64())

        def drop_done(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.invert(pc.is_in(batch["sid"], value_set=done_arr)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    builder = _make_segment_builder(
        index_dir, doc_id_col, text_col, url_col, codec
    )
    reports = ds.groupby("sid").map_groups(builder, batch_format="pyarrow")
    # Consume the (tiny: one row per segment) report stream; this drives the
    # whole lazy pipeline.
    reports.materialize()
    _write_stats(index_dir)
    return index_dir


@ray.remote
def _block_count(blk: pa.Table) -> int:
    return blk.num_rows


@ray.remote
def _sorted_segment_task(index_dir, sid, slices, doc_id_col, text_col,
                         url_col, codec):
    """Build one segment from (block, offset, length) slices of the
    ordered materialized blocks — refs resolve zero-copy from plasma."""
    from .docids import _as_arrow

    blocks = [_as_arrow(b) for b in ray.get([r for r, _, _ in slices])]
    parts = [b.slice(off, ln) for b, (_, off, ln) in zip(blocks, slices)]
    group = pa.concat_tables(parts)
    return _build_segment_table(group, sid, index_dir, doc_id_col,
                                text_col, url_col, codec)


def _build_sorted(ds, index_dir, doc_id_col, text_col, url_col, seg_docs,
                  codec, done):
    from .docids import _block_refs, _probed_order

    ds = ds.materialize()
    # blocks explicitly ordered by first doc_id — bundle iteration order
    # follows execution completion, not logical order
    refs, probes = _probed_order(_block_refs(ds), doc_id_col, None)
    counts = [p["n"] for p in probes]
    # sorted layout precondition: dense contiguous ids from 0
    ok = bool(probes) and probes[0]["first"] == 0 and all(
        probes[i + 1]["first"] == probes[i]["last"] + 1
        for i in range(len(probes) - 1)
    ) and all(p["last"] - p["first"] + 1 == p["n"] for p in probes)
    if not ok:
        raise ValueError(
            "layout='sorted' requires dense doc_ids starting at 0 in "
            "block order (assign_doc_ids output); use layout='grouped'"
        )
    starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    total = int(starts[-1])
    tasks = []
    for seg_start in range(0, total, seg_docs):
        sid = seg_start // seg_docs
        if sid in done:
            continue
        seg_end = min(seg_start + seg_docs, total)
        slices = []
        for bi, ref in enumerate(refs):
            b0, b1 = int(starts[bi]), int(starts[bi + 1])
            lo, hi = max(seg_start, b0), min(seg_end, b1)
            if lo < hi:
                slices.append((ref, lo - b0, hi - lo))
        tasks.append(
            _sorted_segment_task.remote(
                index_dir, sid, slices, doc_id_col, text_col, url_col, codec
            )
        )
    ray.get(tasks)


def _build_segment_table(group: pa.Table, sid: int, index_dir, doc_id_col,
                         text_col, url_col, codec) -> dict:
    """Shared segment-build kernel (both layouts): tokenize, sort, encode,
    write atomically, append manifest.  ``group`` must hold exactly the
    segment's docs."""
    final_dir = mf.segment_dir(index_dir, sid)
    if os.path.isdir(final_dir):  # lost retry race / resume overlap
        # Self-healing commit point: a crash BETWEEN the segment-dir rename
        # and append_manifest leaves a finished dir with no manifest line;
        # without this re-append the segment would be orphaned forever
        # (read_manifest only counts dir+line, so resume would skip the
        # rebuild here yet stats/search would never see the docs).
        if sid not in mf.read_manifest(index_dir):
            with open(os.path.join(final_dir, "meta.json")) as f:
                meta = json.load(f)
            mf.append_manifest(index_dir, meta)
        return {"sid": sid, "skipped": True}
    group = group.sort_by(doc_id_col)
    doc_ids = group[doc_id_col].combine_chunks()
    tf_table, doc_len = term_count_table(group[text_col], doc_ids)
    tf_table = tf_table.sort_by([("term", "ascending"), ("doc_id", "ascending")])

    # per-posting dl via searchsorted over the (sorted) group docids
    did_np = doc_ids.to_numpy()
    post_doc = tf_table["doc_id"].to_numpy()
    dl_of_post = doc_len[np.searchsorted(did_np, post_doc)]

    # term-run boundaries on the ALREADY (term, doc_id)-sorted table via
    # Arrow compares — np.unique on an object-string array re-sorts with
    # Python comparisons and was a measurable slice of segment CPU
    tcol = tf_table["term"].combine_chunks()
    tfs = tf_table["tf"].to_numpy().astype(np.int64)
    n_rows = len(tcol)
    if n_rows > 1:
        neq = pc.invert(pc.equal(tcol.slice(1), tcol.slice(0, n_rows - 1)))
        starts = np.concatenate(
            [[0], np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1]
        ).astype(np.int64)
    else:
        starts = np.zeros(min(n_rows, 1), dtype=np.int64)
    uniq_terms = tcol.take(pa.array(starts))
    bounds = np.append(starts, n_rows)

    # whole-segment batched encode (ONE varint pass + reduceat block
    # stats) — byte-identical to the per-term encode_postings loop it
    # replaced, which cost one Python/numpy round-trip per term and
    # dominated segment-build CPU (tests assert blob equality)
    enc = encode_postings_batch(post_doc, tfs, dl_of_post, bounds, codec)
    n_terms = len(uniq_terms)
    blk_offs = pa.array(enc["blk_offsets"], pa.int32())
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

    n_docs = group.num_rows
    total_len = int(doc_len.sum())
    with mf.atomic_write_dir(final_dir) as tmp:
        pq.write_table(postings, os.path.join(tmp, "postings.parquet"))
        dstats = {
            "doc_id": doc_ids,
            "doc_len": pa.array(doc_len, pa.int32()),
        }
        if url_col:
            dstats["url"] = group[url_col]
        pq.write_table(pa.table(dstats), os.path.join(tmp, "docstats.parquet"))
        meta = {
            "sid": sid,
            "n_docs": n_docs,
            "total_len": total_len,
            "n_terms": n_terms,
            "n_postings": int(tf_table.num_rows),
            "doc_lo": int(did_np[0]),
            "doc_hi": int(did_np[-1]),
            "codec": codec,
            "codec_version": CODEC_VERSION,
            "tokenizer_version": TOKENIZER_VERSION,
        }
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f)
    mf.append_manifest(index_dir, meta)
    return meta


def _make_segment_builder(index_dir, doc_id_col, text_col, url_col, codec):
    def build_segment(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _report(-1, 0, 0, 0)
        sid = int(group["sid"][0].as_py())
        out = _build_segment_table(
            group.drop_columns(["sid"]), sid, index_dir, doc_id_col,
            text_col, url_col, codec,
        )
        if out.get("skipped"):
            return _report(sid, 0, 0, 0)
        return _report(sid, out["n_docs"], out["n_terms"], out["n_postings"])

    return build_segment


def _report(sid: int, n_docs: int, n_terms: int, n_postings: int) -> pa.Table:
    return pa.table(
        {
            "sid": pa.array([sid], pa.int64()),
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_terms": pa.array([n_terms], pa.int64()),
            "n_postings": pa.array([n_postings], pa.int64()),
        }
    )


def _write_stats(index_dir: str) -> None:
    """Global stats from the finished segments (resume-safe: derived from
    files, not from this run's in-flight state).

    ``term_df`` input is one row per (term, segment) — pre-aggregated — so
    the groupby here is small even with head-term skew.
    """
    recs = mf.read_manifest(index_dir)
    if not recs:
        raise ValueError(f"no finished segments under {index_dir}")
    seg_paths = [
        os.path.join(mf.segment_dir(index_dir, sid), "postings.parquet")
        for sid in sorted(recs)
    ]
    stats_dir = os.path.join(index_dir, "stats")
    total_term_rows = sum(r["n_terms"] for r in recs.values())
    if total_term_rows <= 5_000_000:
        # vocab fits comfortably on the driver: a direct pyarrow read +
        # group_by beats a distributed groupby's task orchestration
        tbl = pa.concat_tables(
            pq.read_table(p, columns=["term", "n", "cf"]) for p in seg_paths
        )
        agg = tbl.group_by("term").aggregate([("n", "sum"), ("cf", "sum")])
        agg = agg.rename_columns(["term", "df", "cf"])
        with mf.atomic_write_dir(os.path.join(stats_dir, "term_df")) as tmp:
            pq.write_table(agg.sort_by("term"), os.path.join(tmp, "part-0.parquet"))
    else:
        parts = ray.data.read_parquet(seg_paths, columns=["term", "n", "cf"])
        from ray.data.aggregate import Sum

        df = parts.groupby("term").aggregate(
            Sum("n", alias_name="df"), Sum("cf", alias_name="cf")
        )
        with mf.atomic_write_dir(os.path.join(stats_dir, "term_df")) as tmp:
            df.write_parquet(tmp)
    n_docs = sum(r["n_docs"] for r in recs.values())
    total_len = sum(r["total_len"] for r in recs.values())
    coll = {
        "n_docs": n_docs,
        "total_len": total_len,
        # single int/int division: bit-identical to the oracle's avgdl
        "avgdl": total_len / n_docs if n_docs else 0.0,
        "n_segments": len(recs),
        "codec_version": CODEC_VERSION,
        "tokenizer_version": TOKENIZER_VERSION,
    }
    tmp_path = os.path.join(stats_dir, ".collection.json.tmp")
    os.makedirs(stats_dir, exist_ok=True)
    with open(tmp_path, "w") as f:
        json.dump(coll, f)
    os.replace(tmp_path, os.path.join(stats_dir, "collection.json"))


def segment_count(n_docs: int, seg_docs: int = DEFAULT_SEG_DOCS) -> int:
    return math.ceil(n_docs / seg_docs)
