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

from ..functions.tokenizer import (
    TOKENIZER_VERSION,
    term_count_table,
    term_position_table,
)
from ..sources import manifest as mf
from .codec import CODEC_VERSION, encode_positions_batch, encode_postings_batch

DEFAULT_SEG_DOCS = 8192


def _retired_sids(index_dir: str) -> set[int]:
    """Sids whose LAST manifest record is a tombstone (their docs are in
    a compacted replacement, or expunged on purpose)."""
    return {
        sid
        for sid, rec in mf.read_manifest_raw(index_dir).items()
        if rec.get("retired")
    }


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
    positions: bool = False,
) -> str:
    """Build (or resume) the index for ``ds`` into ``index_dir``.

    ``positions=True`` additionally stores per-posting token-position
    streams (``pos_blob``, delta+varint — stages/codec.py) enabling
    phrase/proximity queries (stages/phrase.py).  Costs one occurrence-
    level sort per segment instead of a hash groupby, plus ~cf varints of
    storage; leave off when only bag-of-words ranking is needed.

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
    # resume skips live sids AND retired ones: a tombstoned segment's
    # docs live on in its compacted replacement (or were deliberately
    # expunged) — rebuilding it would duplicate (or resurrect) them
    done = (
        set(mf.read_manifest(index_dir)) | _retired_sids(index_dir)
        if resume
        else set()
    )

    cols = [doc_id_col, text_col] + ([url_col] if url_col else [])
    ds = ds.select_columns(cols)

    if layout == "sorted":
        _build_sorted(ds, index_dir, doc_id_col, text_col, url_col,
                      seg_docs, codec, done, positions)
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
        index_dir, doc_id_col, text_col, url_col, codec, positions
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
                         url_col, codec, positions=False):
    """Build one segment from (block, offset, length) slices of the
    ordered materialized blocks — refs resolve zero-copy from plasma."""
    from .docids import _as_arrow

    blocks = [_as_arrow(b) for b in ray.get([r for r, _, _ in slices])]
    parts = [b.slice(off, ln) for b, (_, off, ln) in zip(blocks, slices)]
    group = pa.concat_tables(parts)
    return _build_segment_table(group, sid, index_dir, doc_id_col,
                                text_col, url_col, codec, positions)


def _build_sorted(ds, index_dir, doc_id_col, text_col, url_col, seg_docs,
                  codec, done, positions=False):
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
                index_dir, sid, slices, doc_id_col, text_col, url_col,
                codec, positions,
            )
        )
    ray.get(tasks)


def _build_segment_table(group: pa.Table, sid: int, index_dir, doc_id_col,
                         text_col, url_col, codec, positions=False) -> dict:
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
    did_np = doc_ids.to_numpy()
    pos_blobs = None
    if positions:
        # occurrence-level path: ONE (term, doc_id, pos) sort yields both
        # the postings (run boundaries) and the per-posting position
        # streams; tf comes from run lengths instead of a hash groupby
        occ, doc_len = term_position_table(group[text_col], doc_ids)
        occ = occ.sort_by(
            [("term", "ascending"), ("doc_id", "ascending"), ("pos", "ascending")]
        )
        tcol_occ = occ["term"].combine_chunks()
        occ_doc = occ["doc_id"].to_numpy()
        occ_pos = occ["pos"].to_numpy().astype(np.int64)
        n_occ = len(tcol_occ)
        if n_occ > 1:
            term_neq = pc.invert(
                pc.equal(tcol_occ.slice(1), tcol_occ.slice(0, n_occ - 1))
            ).to_numpy(zero_copy_only=False)
            new_post = term_neq | (occ_doc[1:] != occ_doc[:-1])
            posting_starts = np.concatenate(
                [[0], np.flatnonzero(new_post) + 1]
            ).astype(np.int64)
            term_starts_occ = np.concatenate(
                [[0], np.flatnonzero(term_neq) + 1]
            ).astype(np.int64)
        else:
            posting_starts = np.zeros(min(n_occ, 1), dtype=np.int64)
            term_starts_occ = posting_starts.copy()
        post_doc = occ_doc[posting_starts]
        tfs = np.diff(np.append(posting_starts, n_occ)).astype(np.int64)
        # term boundaries at the POSTING level: a term change always
        # starts a new posting, so term_starts_occ ⊆ posting_starts
        starts = np.searchsorted(posting_starts, term_starts_occ)
        uniq_terms = tcol_occ.take(pa.array(term_starts_occ))
        bounds = np.append(starts, post_doc.size)
        dl_of_post = doc_len[np.searchsorted(did_np, post_doc)]
        pos_blobs = encode_positions_batch(
            occ_pos, posting_starts, np.append(term_starts_occ, n_occ)
        )
    else:
        tf_table, doc_len = term_count_table(group[text_col], doc_ids)
        tf_table = tf_table.sort_by(
            [("term", "ascending"), ("doc_id", "ascending")]
        )

        # per-posting dl via searchsorted over the (sorted) group docids
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
    if pos_blobs is not None:
        postings = postings.append_column(
            "pos_blob", pa.array(pos_blobs, pa.binary())
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
            "n_postings": int(post_doc.size),
            "doc_lo": int(did_np[0]),
            "doc_hi": int(did_np[-1]),
            "codec": codec,
            "codec_version": CODEC_VERSION,
            "tokenizer_version": TOKENIZER_VERSION,
            "positions": bool(positions),
        }
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f)
    mf.append_manifest(index_dir, meta)
    return meta


def _make_segment_builder(index_dir, doc_id_col, text_col, url_col, codec,
                          positions=False):
    def build_segment(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _report(-1, 0, 0, 0)
        sid = int(group["sid"][0].as_py())
        out = _build_segment_table(
            group.drop_columns(["sid"]), sid, index_dir, doc_id_col,
            text_col, url_col, codec, positions,
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


def _swap_in(tmp: str, final: str) -> None:
    """Replace ``final`` (file or dir, possibly absent) with ``tmp``.
    File-over-file is a fully atomic ``os.replace``; replacing a dir
    needs a move-away + move-in pair (POSIX has no atomic dir swap) —
    the window is two renames, and a crash inside it is repaired by the
    next stats write."""
    import shutil
    import uuid

    if not os.path.exists(final):
        os.rename(tmp, final)
        return
    if not os.path.isdir(final) and not os.path.isdir(tmp):
        os.replace(tmp, final)
        return
    old = final + ".old-" + uuid.uuid4().hex[:8]
    os.rename(final, old)
    os.rename(tmp, final)
    if os.path.isdir(old):
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.remove(old)


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
    os.makedirs(stats_dir, exist_ok=True)
    final = os.path.join(stats_dir, "term_df")
    total_term_rows = sum(r["n_terms"] for r in recs.values())
    # overridable so tests can force the distributed branch on small data
    driver_limit = int(os.environ.get("DFR_STATS_DRIVER_LIMIT", 5_000_000))
    # NOTE: stats must REPLACE any prior term_df (append/compact rewrite
    # them); atomic_write_dir's rename silently keeps the old dir when
    # the target exists, so the swap happens through _swap_in instead
    if total_term_rows <= driver_limit:
        # vocab fits comfortably on the driver: a direct pyarrow read +
        # group_by beats a distributed groupby's task orchestration.
        # Single parquet FILE -> os.replace is a fully atomic update.
        tbl = pa.concat_tables(
            pq.read_table(p, columns=["term", "n", "cf"]) for p in seg_paths
        )
        agg = tbl.group_by("term").aggregate([("n", "sum"), ("cf", "sum")])
        agg = agg.rename_columns(["term", "df", "cf"])
        tmp = os.path.join(stats_dir, f".term_df.tmp-{os.getpid()}")
        pq.write_table(agg.sort_by("term"), tmp)
        _swap_in(tmp, final)
    else:
        parts = ray.data.read_parquet(seg_paths, columns=["term", "n", "cf"])
        from ray.data.aggregate import Sum

        df = parts.groupby("term").aggregate(
            Sum("n", alias_name="df"), Sum("cf", alias_name="cf")
        )
        tmp = os.path.join(stats_dir, f".term_df.tmpd-{os.getpid()}")
        df.write_parquet(tmp)
        _swap_in(tmp, final)
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


# -------------------------------------------- incremental append + compaction

# appended segments live in their own sid namespace so their ids never
# collide with build-time sids (sid = doc_id // seg_docs) and re-running
# the same append resumes deterministically; compacted merges live in a
# third namespace above any reachable append sid (append ids would need
# doc_id ~ 2^63 to reach it).  Readers order segments by doc_lo
# (manifest.live_segment_order), so sid numbering is free.
APPEND_SID_BASE = 1 << 40
COMPACT_SID_BASE = 1 << 50


def append_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    url_col: Optional[str] = None,
    seg_docs: int = DEFAULT_SEG_DOCS,
    codec: str = "varint",
    positions: bool = False,
) -> str:
    """Append new docs to a finished index WITHOUT rebuilding it: new
    segments are built only from ``ds`` and global stats are re-derived
    from all live segments (the manifest lineage already supports this —
    stats come from files, not the building run).

    Requirements: ``ds`` doc_ids must all be GREATER than every indexed
    doc_id (posting lists concatenate docid-ascending across doc-ordered
    segments; interleaving would corrupt them) — validated against the
    BUILD-namespace segments.  Re-running the same append is an
    idempotent resume no-op (finished appended segments are skipped, and
    their sids are deterministic functions of doc_id); appending ids
    that fall inside already-indexed build segments raises.
    """
    recs = mf.read_manifest(index_dir)
    if not recs:
        raise ValueError(f"append_index: no finished index at {index_dir}")
    # phrase search needs EVERY segment positional — a mixed index would
    # answer phrase queries from some doc ranges and error on others
    have_pos = {bool(r.get("positions")) for r in recs.values()}
    if have_pos != {bool(positions)}:
        raise ValueError(
            "append_index: positions=%s does not match the existing "
            "index's segments (positions=%s)" % (positions, sorted(have_pos))
        )
    from ray.data.aggregate import Max, Min

    bounds = ds.aggregate(Min(doc_id_col), Max(doc_id_col))
    mn = int(bounds[f"min({doc_id_col})"])
    mx = int(bounds[f"max({doc_id_col})"])
    # this batch's own (deterministic) sid window — segments already
    # built by a crashed prior run of the SAME append are exempt from
    # the overlap check, everything else (build segments, compacted
    # merges of an earlier append) counts
    planned_lo = APPEND_SID_BASE + mn // seg_docs
    planned_hi = APPEND_SID_BASE + mx // seg_docs
    overlap = [
        sid for sid, r in recs.items()
        if r["doc_hi"] >= mn and not (planned_lo <= sid <= planned_hi)
    ]
    if overlap:
        raise ValueError(
            f"append_index: doc_ids from {mn} overlap live segments "
            f"{sorted(overlap)[:5]} — appended ids must exceed every "
            "indexed doc_id (re-appending already-compacted docs is "
            "not resumable; they are indexed)"
        )
    # retired sids included for the same reason as build_index resume:
    # an appended segment later compacted or expunged must not rebuild
    done = set(recs) | _retired_sids(index_dir)

    cols = [doc_id_col, text_col] + ([url_col] if url_col else [])
    ds = ds.select_columns(cols)

    def add_sid(batch: pa.Table) -> pa.Table:
        if batch.num_rows and pc.min(batch[doc_id_col]).as_py() < mn:
            raise ValueError("append_index: doc_id below validated minimum")
        sid = pc.add(
            pc.cast(
                pc.divide(batch[doc_id_col], pa.scalar(seg_docs, pa.int64())),
                pa.int64(),
            ),
            pa.scalar(APPEND_SID_BASE, pa.int64()),
        )
        return batch.append_column("sid", sid)

    dss = ds.map_batches(add_sid, batch_format="pyarrow")
    if done:
        done_arr = pa.array(sorted(done), pa.int64())

        def drop_done(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.invert(pc.is_in(batch["sid"], value_set=done_arr))
            )

        dss = dss.map_batches(drop_done, batch_format="pyarrow")
    builder = _make_segment_builder(
        index_dir, doc_id_col, text_col, url_col, codec, positions
    )
    dss.groupby("sid").map_groups(builder, batch_format="pyarrow").materialize()
    _write_stats(index_dir)
    return index_dir


def _all_sid_numbers(index_dir: str) -> set[int]:
    """Every sid ever seen — manifest lines (including retired) AND
    segment dirs on disk (including orphans) — so fresh sids never
    collide with anything, even mid-crash leftovers."""
    out: set[int] = set()
    path = os.path.join(index_dir, mf.MANIFEST_NAME)
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    out.add(int(json.loads(line)["sid"]))
    seg_root = os.path.join(index_dir, "segments")
    if os.path.isdir(seg_root):
        for name in os.listdir(seg_root):
            if name.startswith("seg="):
                try:
                    out.add(int(name.split("=", 1)[1]))
                except ValueError:
                    pass
    return out


def _merge_group(
    index_dir: str, sids: list[int], new_sid: int, codec: str,
    purge: Optional[np.ndarray] = None,
) -> Optional[dict]:
    """Merge adjacent (doc-ordered) segments into ONE new segment dir
    under ``new_sid`` — WITHOUT publishing it: the caller appends the
    manifest transition.  An unpublished merged dir is invisible to
    readers (read_manifest requires dir AND line), so a crash here
    leaves the index fully intact.

    Per-term posting lists concatenate docid-ascending because ``sids``
    is doc-ordered and segments cover disjoint doc ranges; the merged
    lists re-encode through the same batched codec path as a fresh
    build, so a compacted index is byte-compatible with a built one.

    ``purge`` (sorted deleted doc_ids, ``expunge_deletes``): postings of
    those docs are dropped before encode, position streams are
    decode-filtered-re-encoded (byte-concat would misalign once postings
    vanish), docstats/meta recompute from the surviving docs.  Returns
    None when every doc in the group is deleted (caller retires the
    inputs with no replacement segment)."""
    import shutil

    from .search import _decode_segment_arrays

    paths = [
        os.path.join(mf.segment_dir(index_dir, sid), "postings.parquet")
        for sid in sids
    ]
    metas = []
    for sid in sids:
        with open(os.path.join(mf.segment_dir(index_dir, sid), "meta.json")) as f:
            metas.append(json.load(f))
    packs = [_decode_segment_arrays(p, 1.0) for p in paths]  # avgdl unused

    term_list = sorted({t for p in packs for t in p[0]})
    gindex = {t: i for i, t in enumerate(term_list)}
    n_terms = len(term_list)
    counts = np.zeros(n_terms, dtype=np.int64)
    for tnames, bounds, _d, _t, _l, _w in packs:
        for i, t in enumerate(tnames):
            counts[gindex[t]] += int(bounds[i + 1] - bounds[i])
    g_bounds = np.zeros(n_terms + 1, dtype=np.int64)
    np.cumsum(counts, out=g_bounds[1:])
    total = int(g_bounds[-1])
    post_doc = np.empty(total, dtype=np.int64)
    tfs = np.empty(total, dtype=np.int64)
    dls = np.empty(total, dtype=np.int64)
    cursor = g_bounds[:-1].copy()
    for tnames, bounds, d, tf, dl, _w in packs:  # doc order across packs
        for i, t in enumerate(tnames):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            ti = gindex[t]
            c = cursor[ti]
            post_doc[c : c + hi - lo] = d[lo:hi]
            tfs[c : c + hi - lo] = tf[lo:hi]
            dls[c : c + hi - lo] = dl[lo:hi]
            cursor[ti] = c + hi - lo

    has_pos = [bool(m.get("positions")) for m in metas]
    if any(has_pos) and not all(has_pos):
        raise ValueError(
            "compact: cannot merge positional and non-positional "
            f"segments {sids} (rebuild with a single positions setting)"
        )
    pos_blobs = None
    if any(has_pos):
        # position streams reset per POSTING and postings are doc-disjoint
        # across the merged segments, so per-term blobs concatenate in doc
        # order byte-identically to a fresh positional build — no
        # decode/re-encode (unlike doc blobs, whose first gap is absolute)
        pos_maps = []
        for p in paths:
            t = pq.read_table(p, columns=["term", "pos_blob"])
            pos_maps.append(
                dict(zip(t["term"].to_pylist(), t["pos_blob"].to_pylist()))
            )
        pos_blobs = [
            b"".join(pm[t] for pm in pos_maps if t in pm) for t in term_list
        ]
    dstats = pa.concat_tables(
        pq.read_table(
            os.path.join(mf.segment_dir(index_dir, sid), "docstats.parquet")
        )
        for sid in sids
    )

    purged = False
    if purge is not None and np.asarray(purge).size:
        from .codec import decode_positions
        from .deletes import live_mask

        purge = np.asarray(purge, dtype=np.int64)
        livem = live_mask(post_doc, purge)
        if not livem.all():
            purged = True
            # g_bounds is strictly increasing pre-purge (every merged
            # term has >=1 posting), so reduceat segments are never empty
            live_counts = np.add.reduceat(livem, g_bounds[:-1])
            keep = live_counts > 0
            if pos_blobs is not None:
                pos_parts, tf_parts = [], []
                for i in np.flatnonzero(keep):
                    lo, hi = int(g_bounds[i]), int(g_bounds[i + 1])
                    tfs_t = tfs[lo:hi]
                    pos_t, _ = decode_positions(pos_blobs[i], tfs_t)
                    pos_parts.append(pos_t[np.repeat(livem[lo:hi], tfs_t)])
                    tf_parts.append(tfs_t[livem[lo:hi]])
                flat_pos = (
                    np.concatenate(pos_parts)
                    if pos_parts
                    else np.empty(0, dtype=np.int64)
                )
                tf_keep = (
                    np.concatenate(tf_parts)
                    if tf_parts
                    else np.empty(0, dtype=np.int64)
                )
                occ_bounds = np.zeros(tf_keep.size + 1, dtype=np.int64)
                np.cumsum(tf_keep, out=occ_bounds[1:])
                nb = np.zeros(int(keep.sum()) + 1, dtype=np.int64)
                np.cumsum(live_counts[keep], out=nb[1:])
                pos_blobs = encode_positions_batch(
                    flat_pos, occ_bounds[:-1], occ_bounds[nb]
                )
            post_doc, tfs, dls = post_doc[livem], tfs[livem], dls[livem]
            term_list = [t for t, kp in zip(term_list, keep) if kp]
            n_terms = len(term_list)
            g_bounds = np.zeros(n_terms + 1, dtype=np.int64)
            np.cumsum(live_counts[keep], out=g_bounds[1:])
            total = int(g_bounds[-1])
            ids = dstats["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            dstats = dstats.filter(pa.array(live_mask(ids, purge)))
            if dstats.num_rows == 0:
                return None

    enc = encode_postings_batch(post_doc, tfs, dls, g_bounds, codec)
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
            "term": pa.array(term_list, pa.string()),
            "cf": pa.array(enc["cf"], pa.int64()),
        }
    )
    if pos_blobs is not None:
        postings = postings.append_column(
            "pos_blob", pa.array(pos_blobs, pa.binary())
        )
    if purged:
        ids = dstats["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dlen = dstats["doc_len"].to_numpy(zero_copy_only=False)
        n_docs_m, total_len_m = int(dstats.num_rows), int(dlen.sum())
        doc_lo_m, doc_hi_m = int(ids.min()), int(ids.max())
    else:
        n_docs_m = sum(m["n_docs"] for m in metas)
        total_len_m = sum(m["total_len"] for m in metas)
        doc_lo_m = min(m["doc_lo"] for m in metas)
        doc_hi_m = max(m["doc_hi"] for m in metas)
    meta = {
        "sid": new_sid,
        "n_docs": n_docs_m,
        "total_len": total_len_m,
        "n_terms": n_terms,
        "n_postings": total,
        "doc_lo": doc_lo_m,
        "doc_hi": doc_hi_m,
        "codec": codec,
        "codec_version": CODEC_VERSION,
        "tokenizer_version": TOKENIZER_VERSION,
        "positions": bool(any(has_pos)),
        "merged_from": sids,
    }
    final_dir = mf.segment_dir(index_dir, new_sid)
    if os.path.isdir(final_dir) and new_sid not in mf.read_manifest(index_dir):
        shutil.rmtree(final_dir)  # orphan from a crashed prior attempt
    with mf.atomic_write_dir(final_dir) as tmp:
        pq.write_table(postings, os.path.join(tmp, "postings.parquet"))
        pq.write_table(dstats, os.path.join(tmp, "docstats.parquet"))
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f)
    return meta


def compact_index(
    index_dir: str,
    *,
    target_seg_docs: int = 4 * DEFAULT_SEG_DOCS,
    codec: Optional[str] = None,
    gc: bool = True,
) -> int:
    """Merge runs of adjacent small segments so each merged segment holds
    up to ``target_seg_docs`` docs.  Returns the number of merges.

    Crash-safe by construction: (1) the merged dir is written atomically
    but stays INVISIBLE until (2) one single-write manifest append
    publishes it and tombstones its inputs in the same buffer — readers
    see either the old segments or the merged one, never both; (3) old
    dirs are deleted afterwards (pure GC — tombstoned dirs are already
    dead, and re-running compaction re-collects them).  Search results
    are invariant across every window (tested)."""
    import shutil

    mf.gc_retired(index_dir)  # collect dirs a crashed prior run left behind
    recs = mf.read_manifest(index_dir)
    order = mf.live_segment_order(recs)
    groups: list[list[int]] = []
    cur: list[int] = []
    cur_docs = 0
    for sid in order:
        nd = recs[sid]["n_docs"]
        if cur and cur_docs + nd > target_seg_docs:
            groups.append(cur)
            cur, cur_docs = [], 0
        cur.append(sid)
        cur_docs += nd
    if cur:
        groups.append(cur)
    merge_groups = [g for g in groups if len(g) >= 2]
    if not merge_groups:
        return 0
    next_sid = max(
        [COMPACT_SID_BASE - 1]
        + [s for s in _all_sid_numbers(index_dir) if s >= COMPACT_SID_BASE]
    ) + 1
    codecs = [codec or recs[g[0]].get("codec", "varint") for g in merge_groups]
    import ray as _ray

    if _ray.is_initialized() and len(merge_groups) > 1:
        # merges are independent (distinct inputs, distinct fresh sids)
        # and unpublished until the manifest append below — fan out
        task = _ray.remote(_merge_group)
        metas = _ray.get(
            [
                task.remote(index_dir, g, next_sid + i, cdc)
                for i, (g, cdc) in enumerate(zip(merge_groups, codecs))
            ]
        )
    else:
        metas = [
            _merge_group(index_dir, g, next_sid + i, cdc)
            for i, (g, cdc) in enumerate(zip(merge_groups, codecs))
        ]
    for g, meta in zip(merge_groups, metas):
        mf.append_manifest_many(
            index_dir,
            [meta] + [{"sid": s, "retired": True} for s in g],
        )
        if gc:
            for s in g:
                shutil.rmtree(mf.segment_dir(index_dir, s), ignore_errors=True)
    _write_stats(index_dir)
    return len(merge_groups)


def split_segment(
    index_dir: str, sid: Optional[int] = None, *, codec: Optional[str] = None
) -> Optional[tuple[int, int]]:
    """Split one segment into two at its median doc id — the inverse of
    compaction, for when a doc range runs hot (serving parallelism per
    segment is 1; splitting doubles it for that range).

    Reuses the compaction rewrite verbatim: each half is
    ``_merge_group([sid], new_sid, purge=<other half's doc ids>)`` —
    decode, drop, re-encode through the standard batched codec path, so
    split segments are byte-compatible with built ones (positions
    included).  Crash-safe the same way: both halves are written
    invisible, then ONE manifest append publishes them and retires the
    input; ``live_segment_order`` keeps readers doc-ordered because the
    halves carry disjoint (doc_lo, doc_hi).

    ``sid=None`` picks the largest live segment.  Returns the two new
    sids, or None if the chosen segment has fewer than 2 docs."""
    import shutil

    mf.gc_retired(index_dir)
    recs = mf.read_manifest(index_dir)
    if not recs:
        return None
    if sid is None:
        sid = max(recs, key=lambda s: (recs[s]["n_docs"], -s))
    ids = (
        pq.read_table(
            os.path.join(mf.segment_dir(index_dir, sid), "docstats.parquet"),
            columns=["doc_id"],
        )["doc_id"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    if ids.size < 2:
        return None
    ids = np.sort(ids)
    mid = int(ids[ids.size // 2])
    cdc = codec or recs[sid].get("codec", "varint")
    next_sid = max(
        [COMPACT_SID_BASE - 1]
        + [s for s in _all_sid_numbers(index_dir) if s >= COMPACT_SID_BASE]
    ) + 1
    meta_lo = _merge_group(
        index_dir, [sid], next_sid, cdc, purge=ids[ids >= mid]
    )
    meta_hi = _merge_group(
        index_dir, [sid], next_sid + 1, cdc, purge=ids[ids < mid]
    )
    assert meta_lo is not None and meta_hi is not None  # both halves non-empty
    mf.append_manifest_many(
        index_dir, [meta_lo, meta_hi, {"sid": sid, "retired": True}]
    )
    shutil.rmtree(mf.segment_dir(index_dir, sid), ignore_errors=True)
    _write_stats(index_dir)
    return next_sid, next_sid + 1


def restore_snapshot(src_index: str, at: int, dst_index: str) -> str:
    """Snapshot RESTORE (the Elasticsearch snapshot/restore pair to
    ``search(at=)``'s point-in-time read): materialize the view pinned
    by manifest version ``at`` as a NEW standalone index.

    * Segment payloads HARDLINK file-by-file (same filesystem: O(files)
      metadata ops, zero bytes copied — segment files are immutable
      once published, which is what makes sharing safe); cross-device
      falls back to a real copy.
    * The destination manifest replays the pinned records in ONE atomic
      append (the same single-write commit point every other lifecycle
      transition uses), then global stats re-derive from the restored
      segments via the shared ``_write_stats`` — byte-identical to what
      a from-scratch build of that corpus state would write.
    * Idempotent/resumable: a finished restore short-circuits on its
      marker; a crash mid-link leaves only tmp dirs (atomic_write_dir)
      and the re-run relinks.

    Raises (via ``read_manifest(at=...)``) if a pinned segment was
    garbage-collected — an unrestorable snapshot is an error, never a
    silent partial restore.  Restored indexes carry no tombstoned
    doc ids: live-docs delete side files are query-time state of the
    SOURCE index and are deliberately not copied (ES restores the
    snapshot's committed state the same way)."""
    done = os.path.join(dst_index, "_RESTORED")
    if os.path.exists(done):
        return dst_index
    recs = mf.read_manifest(src_index, at=at)
    if not recs:
        raise ValueError(
            f"restore_snapshot: snapshot at={at} of {src_index} is empty"
        )
    os.makedirs(dst_index, exist_ok=True)
    for sid in sorted(recs):
        dst_seg = mf.segment_dir(dst_index, sid)
        if os.path.isdir(dst_seg):
            continue  # relink resume
        src_seg = mf.segment_dir(src_index, sid)
        with mf.atomic_write_dir(dst_seg) as tmp:
            for name in sorted(os.listdir(src_seg)):
                s = os.path.join(src_seg, name)
                d = os.path.join(tmp, name)
                try:
                    os.link(s, d)
                except OSError:
                    shutil.copy2(s, d)
    mpath = os.path.join(dst_index, mf.MANIFEST_NAME)
    if not os.path.exists(mpath) or mf.manifest_version(dst_index) == 0:
        mf.append_manifest_many(
            dst_index, [recs[sid] for sid in sorted(recs)]
        )
    _write_stats(dst_index)
    tmp_marker = done + ".tmp"
    with open(tmp_marker, "w") as f:
        f.write(f"src={src_index} at={at}")
    os.replace(tmp_marker, done)
    return dst_index


def expunge_deletes(index_dir: str, *, codec: Optional[str] = None) -> int:
    """Apply the live-docs side files (stages/deletes.py) physically:
    rewrite every live segment containing a deleted doc (postings,
    positions, docstats, meta all recomputed over the survivors), refresh
    the global stats — df/n_docs/avgdl become FRESH, the Lucene
    "deletes visible in stats after merge" rule — and clear exactly the
    delete files that were applied (deletes landing mid-expunge survive
    for the next pass).  Returns the number of segments rewritten.

    Crash-safe like compaction: each rewrite publishes through one
    single-write manifest append (new segment + tombstoned input); a
    crash before the final ``clear_delete_files`` leaves a correct index
    whose delete files simply mask already-purged ids (a no-op mask)."""
    import shutil

    from .deletes import clear_delete_files, live_mask, read_deletes

    deleted, files = read_deletes(index_dir, return_files=True)
    if deleted.size == 0:
        return 0
    mf.gc_retired(index_dir)
    recs = mf.read_manifest(index_dir)
    affected = []
    for sid in mf.live_segment_order(recs):
        ids = (
            pq.read_table(
                os.path.join(mf.segment_dir(index_dir, sid), "docstats.parquet"),
                columns=["doc_id"],
            )["doc_id"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        if not live_mask(ids, deleted).all():
            affected.append(sid)
    if not affected:
        clear_delete_files(files)
        return 0
    next_sid = max(
        [COMPACT_SID_BASE - 1]
        + [s for s in _all_sid_numbers(index_dir) if s >= COMPACT_SID_BASE]
    ) + 1
    codecs = [codec or recs[sid].get("codec", "varint") for sid in affected]
    import ray as _ray

    if _ray.is_initialized() and len(affected) > 1:
        # rewrites are independent (distinct inputs, fresh sids) and
        # unpublished until the manifest appends below — fan out
        task = _ray.remote(_merge_group)
        metas = _ray.get(
            [
                task.remote(index_dir, [sid], next_sid + i, cdc, deleted)
                for i, (sid, cdc) in enumerate(zip(affected, codecs))
            ]
        )
    else:
        metas = [
            _merge_group(index_dir, [sid], next_sid + i, cdc, purge=deleted)
            for i, (sid, cdc) in enumerate(zip(affected, codecs))
        ]
    for sid, meta in zip(affected, metas):
        recs_out = [] if meta is None else [meta]  # all-deleted: retire only
        mf.append_manifest_many(
            index_dir, recs_out + [{"sid": sid, "retired": True}]
        )
        shutil.rmtree(mf.segment_dir(index_dir, sid), ignore_errors=True)
    _write_stats(index_dir)
    clear_delete_files(files)
    return len(affected)
