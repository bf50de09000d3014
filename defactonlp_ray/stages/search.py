"""BM25 top-k query path (SURVEY.md §2.6 Q1-Q4, §3.2).

Reference behavior: DrQA's ``TfidfDocRanker.closest_docs`` — the whole CSR
matrix resident in one process, sparse dot + argpartition (fever-baselines
``drqa/retriever/tfidf_doc_ranker.py``, unverified — SURVEY.md §0).  Here:

* Q1 exact term-at-a-time Okapi BM25 (k1=1.2, b=0.75) over decoded posting
  blobs, dense per-segment accumulator, float64, ascending-term
  accumulation order — bit-identical to oracle.OracleIndex.bm25_topk.
* Q2 block-max WAND (Ding & Suel, SIGIR 2011): document-at-a-time with
  per-block upper bounds from the C3 metadata; PRUNING-ONLY, so its
  (doc_id, score) output is asserted identical to Q1.
* Q3 bounded min-heap with (score, -doc_id) keys (deterministic ties).
* Q4 multi-segment merge: per-segment top-k -> global top-k; exact because
  BM25 uses only global stats, so a doc's score is segment-invariant.

Execution shape: queries are a Dataset; ``map_batches(SearcherActor,
concurrency=N)`` is an actor pool whose state (collection stats, term->df,
decoded-posting cache) loads once per actor (ray_guide.md:109-131).
Postings and term stats are read per-batch with Parquet ``term IN (...)``
filters — row-group pruning over term-sorted files — NOT by loading whole
segments, so an actor touches only the terms its queries need (the trait
that survives 10^12 docs).  ``search_fanout`` is the cluster-shape variant:
(query x segment) pairs fan out across the pool and a small
``groupby(query_id).map_groups`` merges per-segment top-k.
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

from ..functions.tokenizer import tokenize_column
from ..sources import manifest as mf
from .util import pool_size

K1 = 1.2
B = 0.75
# mode="auto" switches to WAND above this absolute posting volume (see
# SearcherActor._score_query; calibrated from the BENCH_NOTES r03 table)
AUTO_WAND_MIN_POSTINGS = 500_000


# ------------------------------------------------------------- index access

def _one_chunk(col) -> pa.Array:
    """Table column (ChunkedArray or Array) -> ONE contiguous Array."""
    ca = col if isinstance(col, pa.ChunkedArray) else pa.chunked_array([col])
    if ca.num_chunks == 1:
        return ca.chunk(0)
    return pa.concat_arrays([ca.chunk(i) for i in range(ca.num_chunks)])


def _binary_buffers(arr: pa.Array) -> tuple[np.ndarray, memoryview]:
    """Binary array -> (value offsets, data buffer memoryview).

    ``mv[offs[i]:offs[i+1]]`` is row ``i``'s blob zero-copy, and
    ``mv[offs[0]:offs[-1]]`` is the concatenation of EVERY row's blob —
    the whole-column decode input — without a single ``bytes`` copy
    (binary columns store values back-to-back in one buffer)."""
    off_dt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dt)
    offs = offs[arr.offset : arr.offset + len(arr) + 1]
    data = arr.buffers()[2]
    mv = memoryview(data) if data is not None else memoryview(b"")
    return offs, mv


class IndexReader:
    """Lazy, cached reads of one on-disk index (per-actor state).

    ``preload=True`` loads every segment's postings table and the full term
    dictionary into memory at init — the online-serving shape (a serving
    node owns its segments in RAM); default is filtered point reads, the
    shape that survives indexes far larger than worker memory.
    """

    def __init__(self, index_dir: str, preload: bool = False,
                 stats_override: Optional[tuple[int, float, int]] = None,
                 at: Optional[int] = None):
        # an *.alias file resolves ONCE at reader construction — the
        # actor keeps serving the dir it resolved even if the alias
        # flips mid-flight (blue/green consistency)
        index_dir = mf.resolve_alias(index_dir)
        self.index_dir = index_dir
        self.at = at
        recs = mf.read_manifest(index_dir, at=at)
        if at is None:
            with open(
                os.path.join(index_dir, "stats", "collection.json")
            ) as f:
                coll = json.load(f)
            self.n_docs: int = coll["n_docs"]
            self.avgdl: float = coll["avgdl"]
            self.total_len: int = int(
                coll.get("total_len", round(self.n_docs * self.avgdl))
            )
        else:
            # snapshot read: stats/collection.json and stats/term_df are
            # REWRITTEN by append/compact, so a point-in-time reader
            # derives collection stats from the pinned manifest records
            # (the same sums + single int/int division _write_stats
            # uses — bit-identical to the stats file the snapshot's
            # build wrote) and df/cf from the per-segment postings
            # (dfs()/cfs() below).  Delete side-files are NOT versioned:
            # deletes always apply as of now.
            self.n_docs = sum(r["n_docs"] for r in recs.values())
            self.total_len = sum(r["total_len"] for r in recs.values())
            self.avgdl = (
                self.total_len / self.n_docs if self.n_docs else 0.0
            )
        if stats_override is not None:
            # federation (Lucene MultiReader shape): this index is one
            # shard of a larger collection — score with the COMBINED
            # stats so per-posting w arrays (decoded against avgdl) and
            # idf match a single unified index bit-for-bit
            self.n_docs, self.avgdl, self.total_len = stats_override
        # DOC order, not sid order: compacted segments carry fresh sids
        self.seg_ids: list[int] = mf.live_segment_order(recs)
        # live-docs side files (stages/deletes.py) — postings stay raw
        # (phrase position streams align to physical postings); scorers
        # mask candidates, WAND packs filter at build
        from .deletes import read_deletes

        self.deleted: np.ndarray = read_deletes(index_dir)
        self._df: dict[str, int] = {}
        self._cf: dict[str, int] = {}
        self._df_loaded_all = False
        self._cf_loaded_all = False
        self._postings: dict[tuple[int, str], Optional[dict]] = {}
        self._term_arrays: dict = {}
        self._preloaded: set[int] = set()
        if preload:
            if at is None:
                tbl = pq.read_table(
                    os.path.join(index_dir, "stats", "term_df"),
                    columns=["term", "df"],
                )
                self._df = dict(
                    zip(tbl["term"].to_pylist(),
                        (int(x) for x in tbl["df"].to_pylist()))
                )
            for sid in self.seg_ids:
                path = os.path.join(
                    mf.segment_dir(self.index_dir, sid), "postings.parquet"
                )
                for term, row in self._decode_segment_table(pq.read_table(path)):
                    self._postings[(sid, term)] = row
                    if at is not None:
                        # snapshot df/cf: sum the per-segment stats of
                        # the pinned segments (global term_df may
                        # already reflect later appends)
                        self._df[term] = self._df.get(term, 0) + row["n"]
                        self._cf[term] = self._cf.get(term, 0) + row["cf"]
                self._preloaded.add(sid)
            self._df_loaded_all = True
            # snapshot preload summed cf over every pinned segment too;
            # a term absent from the map has cf 0 at this version — no
            # per-segment point read can say otherwise
            self._cf_loaded_all = at is not None

    def _decode_segment(self, rows: list[dict]) -> None:
        """Bulk-decode a whole segment: varint streams are self-terminating
        and byte-aligned, so the concatenation of every term's blob decodes
        in ONE vectorized pass and slices by per-term counts — ~100x fewer
        Python/numpy round-trips than per-term decode (measured dominant in
        serving p95).  Also attaches the idf-independent weight array."""
        from .codec import (
            delta_decode_segmented,
            pfor_decode_many,
            varint_decode,
        )

        vrows = [r for r in rows if r.get("codec", "varint") == "varint"]
        if vrows:
            counts = np.array([r["n"] for r in vrows], dtype=np.int64)
            bounds = np.concatenate([[0], np.cumsum(counts)])
            total = int(bounds[-1])
            gaps = varint_decode(b"".join(r["doc_blob"] for r in vrows), total)
            tfs_all = varint_decode(b"".join(r["tf_blob"] for r in vrows), total)
            dls_all = varint_decode(b"".join(r["dl_blob"] for r in vrows), total)
            docids_all = delta_decode_segmented(gaps, bounds)
            for i, r in enumerate(vrows):
                lo, hi = bounds[i], bounds[i + 1]
                r["decoded"] = (
                    docids_all[lo:hi],
                    tfs_all[lo:hi].astype(np.int64),
                    dls_all[lo:hi].astype(np.int64),
                )
        prows = [r for r in rows if r.get("codec", "varint") == "pfor"]
        if prows:
            counts = np.array([r["n"] for r in prows], dtype=np.int64)
            bounds = np.concatenate([[0], np.cumsum(counts)])
            gaps = pfor_decode_many([r["doc_blob"] for r in prows])[0]
            tfs_all = pfor_decode_many([r["tf_blob"] for r in prows])[0]
            dls_all = pfor_decode_many([r["dl_blob"] for r in prows])[0]
            docids_all = delta_decode_segmented(gaps, bounds)
            for i, r in enumerate(prows):
                lo, hi = bounds[i], bounds[i + 1]
                r["decoded"] = (
                    docids_all[lo:hi],
                    tfs_all[lo:hi].astype(np.int64),
                    dls_all[lo:hi].astype(np.int64),
                )
        for r in rows:
            if "decoded" not in r:
                from .codec import decode_postings

                r["decoded"] = decode_postings(r)
            tfs_f = r["decoded"][1].astype(np.float64)
            dls_f = r["decoded"][2].astype(np.float64)
            r["w"] = (tfs_f * (K1 + 1.0)) / (
                tfs_f + K1 * (1.0 - B + B * dls_f / self.avgdl)
            )

    def _decode_segment_table(self, tbl: pa.Table) -> list[tuple[str, dict]]:
        """Columnar whole-segment decode for the preload path.

        The previous shape materialized every postings row as a Python
        dict via ``to_pylist()``: per-blob ``bytes`` copies plus per-row
        dict/list conversion dominated serving-node preload RAM.  This
        variant never leaves Arrow/numpy — blob streams decode from
        zero-copy memoryview slices of the binary column buffers (when a
        whole codec group is the full segment, the concatenated stream IS
        the column's data buffer: one slice, no join), and block-max
        metadata comes out as numpy views over the list-column value
        buffer.  Produced rows carry exactly the fields consumers read
        (``decoded``/``w``/``blk_*``/``n``/``cf``/``pos_blob``); the
        encoded blobs are NOT retained (the non-preload point-read path
        keeps them for its lazy ``decode_postings`` fallback instead).
        """
        from .codec import (
            delta_decode_segmented,
            pfor_decode_many,
            varint_decode,
        )

        nrows = tbl.num_rows
        if nrows == 0:
            return []

        def bin_slices(name: str) -> tuple[np.ndarray, memoryview]:
            return _binary_buffers(_one_chunk(tbl[name]))

        terms: list[str] = tbl["term"].to_pylist()
        n_arr = tbl["n"].to_numpy().astype(np.int64)
        if "codec" in tbl.column_names:
            codecs = np.asarray(tbl["codec"].to_pylist(), dtype=object)
        else:
            codecs = np.asarray(["varint"] * nrows, dtype=object)
        cf_arr = (
            tbl["cf"].to_numpy() if "cf" in tbl.column_names
            else np.zeros(nrows, dtype=np.int64)
        )
        rows: list[dict] = [
            {"term": terms[i], "n": int(n_arr[i]), "codec": codecs[i],
             "cf": int(cf_arr[i])}
            for i in range(nrows)
        ]

        blob_cols = {c: bin_slices(c) for c in ("doc_blob", "tf_blob", "dl_blob")}

        def concat(col: str, idx: np.ndarray):
            offs, mv = blob_cols[col]
            if idx.size == nrows:  # single-codec segment (the build's shape)
                return mv[offs[0] : offs[-1]]
            return b"".join(
                bytes(mv[offs[i] : offs[i + 1]]) for i in idx
            )

        def per_blob(col: str, idx: np.ndarray) -> list[memoryview]:
            offs, mv = blob_cols[col]
            return [mv[offs[i] : offs[i + 1]] for i in idx]

        idx_v = np.flatnonzero(codecs == "varint")
        if idx_v.size:
            counts = n_arr[idx_v]
            bounds = np.concatenate([[0], np.cumsum(counts)])
            total = int(bounds[-1])
            gaps = varint_decode(concat("doc_blob", idx_v), total)
            tfs_all = varint_decode(concat("tf_blob", idx_v), total)
            dls_all = varint_decode(concat("dl_blob", idx_v), total)
            docids_all = delta_decode_segmented(gaps, bounds)
            for j, i in enumerate(idx_v):
                lo, hi = bounds[j], bounds[j + 1]
                rows[i]["decoded"] = (
                    docids_all[lo:hi],
                    tfs_all[lo:hi].astype(np.int64),
                    dls_all[lo:hi].astype(np.int64),
                )
        idx_p = np.flatnonzero(codecs == "pfor")
        if idx_p.size:
            counts = n_arr[idx_p]
            bounds = np.concatenate([[0], np.cumsum(counts)])
            gaps = pfor_decode_many(per_blob("doc_blob", idx_p))[0]
            tfs_all = pfor_decode_many(per_blob("tf_blob", idx_p))[0]
            dls_all = pfor_decode_many(per_blob("dl_blob", idx_p))[0]
            docids_all = delta_decode_segmented(gaps, bounds)
            for j, i in enumerate(idx_p):
                lo, hi = bounds[j], bounds[j + 1]
                rows[i]["decoded"] = (
                    docids_all[lo:hi],
                    tfs_all[lo:hi].astype(np.int64),
                    dls_all[lo:hi].astype(np.int64),
                )
        for i in range(nrows):  # unknown codec: lazy per-row fallback
            if "decoded" not in rows[i]:
                from .codec import decode_postings

                for c in ("doc_blob", "tf_blob", "dl_blob"):
                    offs, mv = blob_cols[c]
                    rows[i][c] = bytes(mv[offs[i] : offs[i + 1]])
                rows[i]["decoded"] = decode_postings(rows[i])

        for name in ("blk_last_doc", "blk_max_tf", "blk_min_dl"):
            if name not in tbl.column_names:
                continue
            la = _one_chunk(tbl[name])
            voffs = la.offsets.to_numpy()
            vals = la.values.to_numpy()
            for i in range(nrows):
                rows[i][name] = vals[voffs[i] : voffs[i + 1]]

        if "pos_blob" in tbl.column_names:
            arr = _one_chunk(tbl["pos_blob"])
            if arr.null_count:
                pos = arr.to_pylist()
                for i in range(nrows):
                    rows[i]["pos_blob"] = pos[i]
            else:
                offs, mv = _binary_buffers(arr)
                for i in range(nrows):
                    rows[i]["pos_blob"] = mv[offs[i] : offs[i + 1]]

        for r in rows:
            tfs_f = r["decoded"][1].astype(np.float64)
            dls_f = r["decoded"][2].astype(np.float64)
            r["w"] = (tfs_f * (K1 + 1.0)) / (
                tfs_f + K1 * (1.0 - B + B * dls_f / self.avgdl)
            )
        return list(zip(terms, rows))

    # -- term -> global df (stats/term_df), filtered point reads
    def _seg_stat_sums(
        self, terms: list[str], col: str
    ) -> dict[str, int]:
        """Snapshot-mode term stats: sum a per-segment postings column
        (``n`` = within-segment df, ``cf``) over the PINNED segments via
        the same ``term IN`` row-group-pruned reads the postings path
        uses — the global stats/term_df may already reflect appends
        newer than the snapshot."""
        out = {t: 0 for t in terms}
        for sid in self.seg_ids:
            tbl = pq.read_table(
                os.path.join(
                    mf.segment_dir(self.index_dir, sid), "postings.parquet"
                ),
                columns=["term", col],
                filters=[("term", "in", terms)],
            )
            for t, v in zip(tbl["term"].to_pylist(), tbl[col].to_pylist()):
                out[t] += int(v)
        return out

    def dfs(self, terms: list[str]) -> dict[str, int]:
        missing = [t for t in terms if t not in self._df]
        if missing and not self._df_loaded_all:
            if self.at is not None:
                found = self._seg_stat_sums(missing, "n")
            else:
                tbl = pq.read_table(
                    os.path.join(self.index_dir, "stats", "term_df"),
                    columns=["term", "df"],
                    filters=[("term", "in", missing)],
                )
                found = dict(
                    zip(tbl["term"].to_pylist(), tbl["df"].to_pylist())
                )
            for t in missing:
                self._df[t] = int(found.get(t, 0))
        return {t: self._df.get(t, 0) for t in terms}

    def cfs(self, terms: list[str]) -> dict[str, int]:
        """term -> collection frequency (total occurrences), same filtered
        point-read shape as :meth:`dfs` — the language-model scorers'
        stat (LM Dirichlet needs P(t|C) = cf/total_len)."""
        missing = [t for t in terms if t not in self._cf]
        if missing and not self._cf_loaded_all:
            if self.at is not None:
                found = self._seg_stat_sums(missing, "cf")
            else:
                tbl = pq.read_table(
                    os.path.join(self.index_dir, "stats", "term_df"),
                    columns=["term", "cf"],
                    filters=[("term", "in", missing)],
                )
                found = dict(
                    zip(tbl["term"].to_pylist(), tbl["cf"].to_pylist())
                )
            for t in missing:
                self._cf[t] = int(found.get(t, 0))
        return {t: self._cf.get(t, 0) for t in terms}

    def idf(self, term: str) -> float:
        df = self._df.get(term, 0)
        # math.log, not np.log: they can differ by 1 ulp, and the oracle
        # identity is bit-for-bit (SURVEY.md §7.6.2)
        import math

        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    # -- postings, batched filtered reads with per-(segment, term) cache
    def load_postings(self, sid: int, terms: list[str]) -> None:
        if sid in self._preloaded:
            for t in terms:
                self._postings.setdefault((sid, t), None)
            return
        missing = [t for t in terms if (sid, t) not in self._postings]
        if not missing:
            return
        path = os.path.join(mf.segment_dir(self.index_dir, sid), "postings.parquet")
        tbl = pq.read_table(path, filters=[("term", "in", missing)])
        rows = {r["term"]: r for r in tbl.to_pylist()}
        for t in missing:
            self._postings[(sid, t)] = rows.get(t)

    def postings(self, sid: int, term: str) -> Optional[dict]:
        if (sid, term) not in self._postings:
            self.load_postings(sid, [term])
        row = self._postings[(sid, term)]
        if row is not None and "decoded" not in row:
            from .codec import decode_postings

            row["decoded"] = decode_postings(row)
            docids, tfs, dls = row["decoded"]
            # idf-independent per-posting BM25 weight, cached at decode:
            # score(t, d) = idf(t) * w  (expression pinned in oracle v2)
            tfs_f = tfs.astype(np.float64)
            dls_f = dls.astype(np.float64)
            row["w"] = (tfs_f * (K1 + 1.0)) / (
                tfs_f + K1 * (1.0 - B + B * dls_f / self.avgdl)
            )
        return row

    def term_arrays(self, seg_ids: list[int], term: str):
        """(docids, w) concatenated across ``seg_ids`` (ascending sid =
        ascending docids), cached — the serving hot path."""
        key = (tuple(seg_ids), term)
        hit = self._term_arrays.get(key)
        if hit is not None or key in self._term_arrays:
            return hit
        parts_d, parts_w = [], []
        for sid in seg_ids:
            row = self.postings(sid, term)
            if row is not None:
                parts_d.append(row["decoded"][0])
                parts_w.append(row["w"])
        if not parts_d:
            self._term_arrays[key] = None
            return None
        out = (np.concatenate(parts_d), np.concatenate(parts_w))
        self._term_arrays[key] = out
        return out

    def term_tf_dl(self, seg_ids: list[int], term: str):
        """(docids, tfs, dls) concatenated across ``seg_ids`` — the raw
        per-posting stats for non-BM25 scorers (LM Dirichlet), cached."""
        key = (tuple(seg_ids), term, "tfdl")
        hit = self._term_arrays.get(key)
        if hit is not None or key in self._term_arrays:
            return hit
        parts = []
        for sid in seg_ids:
            row = self.postings(sid, term)
            if row is not None:
                parts.append(row["decoded"])
        if not parts:
            self._term_arrays[key] = None
            return None
        out = tuple(np.concatenate([p[i] for p in parts]) for i in range(3))
        self._term_arrays[key] = out
        return out


def _decode_segment_arrays(path: str, avgdl: float):
    """One segment's postings file -> (terms, bounds, docids, tfs, dls, w)
    as FEW LARGE arrays (bounds slice per term) via a single bulk varint
    pass — a handful of plasma objects per task instead of thousands of
    tiny per-term arrays (runs as a Ray task in build_shared_index)."""
    from .codec import (
        decode_postings,
        delta_decode_segmented,
        pfor_decode_many,
        varint_decode,
    )

    tbl = pq.read_table(
        path, columns=["term", "n", "codec", "doc_blob", "tf_blob", "dl_blob"]
    )
    tnames = tbl["term"].to_pylist()
    counts = tbl["n"].to_numpy().astype(np.int64)
    codecs = tbl["codec"].to_pylist()
    bounds = np.concatenate([[0], np.cumsum(counts)])
    total = int(bounds[-1])

    def whole_column(name: str) -> memoryview:
        # zero-copy: the binary column's data buffer IS the concatenation
        offs, mv = _binary_buffers(_one_chunk(tbl[name]))
        return mv[offs[0] : offs[-1]] if len(offs) else memoryview(b"")

    def blob_list(name: str) -> list[memoryview]:
        offs, mv = _binary_buffers(_one_chunk(tbl[name]))
        return [mv[offs[i] : offs[i + 1]] for i in range(len(offs) - 1)]

    if all(c == "varint" for c in codecs):
        gaps = varint_decode(whole_column("doc_blob"), total)
        tfs_all = varint_decode(whole_column("tf_blob"), total).astype(np.int64)
        dls_all = varint_decode(whole_column("dl_blob"), total).astype(np.int64)
        docids_all = delta_decode_segmented(gaps, bounds)
    elif all(c == "pfor" for c in codecs):
        # bulk pfor: batched bit-unpack across every term's blocks
        gaps, _ = pfor_decode_many(blob_list("doc_blob"))
        tfs_all = pfor_decode_many(blob_list("tf_blob"))[0].astype(np.int64)
        dls_all = pfor_decode_many(blob_list("dl_blob"))[0].astype(np.int64)
        docids_all = delta_decode_segmented(gaps, bounds)
    else:
        docids_all = np.empty(total, dtype=np.int64)
        tfs_all = np.empty(total, dtype=np.int64)
        dls_all = np.empty(total, dtype=np.int64)
        for i, r in enumerate(tbl.to_pylist()):
            lo, hi = bounds[i], bounds[i + 1]
            docids_all[lo:hi], tfs_all[lo:hi], dls_all[lo:hi] = decode_postings(r)
    tfs_f = tfs_all.astype(np.float64)
    dls_f = dls_all.astype(np.float64)
    w_all = (tfs_f * (K1 + 1.0)) / (tfs_f + K1 * (1.0 - B + B * dls_f / avgdl))
    return tnames, bounds, docids_all, tfs_all, dls_all, w_all


def build_shared_index(index_dir: str) -> dict:
    """Decode the whole index ONCE into plain numpy arrays keyed by term,
    merged across segments (docid-ascending) — made to be ``ray.put`` once
    and read zero-copy by every searcher actor on the node, instead of
    each actor re-reading and re-decoding the segments (ray_guide.md:135).

    Per-segment decode fans out as Ray tasks when a session is live (the
    serial decode was the query phase's startup bottleneck); block-max
    metadata is recomputed over the merged lists (valid bounds — same
    construction as the per-segment C3 stats)."""
    import ray as _ray

    index_dir = mf.resolve_alias(index_dir)

    from .codec import BLOCK

    with open(os.path.join(index_dir, "stats", "collection.json")) as f:
        coll = json.load(f)
    n_docs, avgdl = coll["n_docs"], coll["avgdl"]
    df_tbl = pq.read_table(
        os.path.join(index_dir, "stats", "term_df"),
        columns=["term", "df", "cf"],
    )
    df_map = dict(
        zip(df_tbl["term"].to_pylist(), (int(x) for x in df_tbl["df"].to_pylist()))
    )
    cf_map = dict(
        zip(df_tbl["term"].to_pylist(), (int(x) for x in df_tbl["cf"].to_pylist()))
    )
    sids = mf.live_segment_order(mf.read_manifest(index_dir))
    paths = [
        os.path.join(mf.segment_dir(index_dir, sid), "postings.parquet")
        for sid in sids
    ]
    if _ray.is_initialized() and len(paths) > 1:
        task = _ray.remote(_decode_segment_arrays)
        seg_packs = _ray.get([task.remote(p, avgdl) for p in paths])
    else:
        seg_packs = [_decode_segment_arrays(p, avgdl) for p in paths]

    # COLUMNAR merged layout: one str->index dict + a handful of big
    # arrays sliced by per-term offsets.  Readers deserialize a few
    # zero-copy plasma arrays instead of re-pickling one dict-of-dicts
    # per term per actor (measured dominant in actor startup).
    counts: dict[str, int] = {}
    for tnames, bounds, _d, _t, _l, _w in seg_packs:
        for i, t in enumerate(tnames):
            counts[t] = counts.get(t, 0) + int(bounds[i + 1] - bounds[i])
    term_list = sorted(counts)
    tindex = {t: i for i, t in enumerate(term_list)}
    n_terms = len(term_list)
    offsets = np.zeros(n_terms + 1, dtype=np.int64)
    np.cumsum([counts[t] for t in term_list], out=offsets[1:])
    total = int(offsets[-1])
    docids_all = np.empty(total, dtype=np.int64)
    tfs_all = np.empty(total, dtype=np.int64)
    dls_all = np.empty(total, dtype=np.int64)
    w_all = np.empty(total, dtype=np.float64)
    cursor = offsets[:-1].copy()
    # ascending sid order -> ascending docids within each term
    for tnames, bounds, d, tf, dl, w in seg_packs:
        for i, t in enumerate(tnames):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            ti = tindex[t]
            c = cursor[ti]
            docids_all[c : c + hi - lo] = d[lo:hi]
            tfs_all[c : c + hi - lo] = tf[lo:hi]
            dls_all[c : c + hi - lo] = dl[lo:hi]
            w_all[c : c + hi - lo] = w[lo:hi]
            cursor[ti] = c + hi - lo
    # live-docs filter BEFORE the block recompute: deleted postings are
    # dropped once here, so every consumer of the shared arrays (TAAT,
    # WAND packs, term_arrays) inherits delete-filtering for free
    from .deletes import live_mask, read_deletes

    deleted = read_deletes(index_dir)
    if deleted.size:
        m = live_mask(docids_all, deleted)
        if not m.all():
            # offsets are strictly increasing pre-filter (every term has
            # >=1 physical posting), so reduceat segments are never empty
            live_counts = np.add.reduceat(m, offsets[:-1]) if n_terms else m[:0]
            docids_all = docids_all[m]
            tfs_all = tfs_all[m]
            dls_all = dls_all[m]
            w_all = w_all[m]
            offsets = np.zeros(n_terms + 1, dtype=np.int64)
            np.cumsum(live_counts, out=offsets[1:])
            total = int(offsets[-1])
            # all-deleted terms keep a zero-length slot but leave the
            # term map, so lookups report them absent
            tindex = {
                t: i for t, i in tindex.items() if live_counts[i] > 0
            }
    # C3 block metadata over the merged lists, vectorized with reduceat
    # (term starts are block starts, so segments never cross terms)
    term_counts = np.diff(offsets)
    nblocks = (term_counts + BLOCK - 1) // BLOCK
    blk_offsets = np.zeros(n_terms + 1, dtype=np.int64)
    np.cumsum(nblocks, out=blk_offsets[1:])
    blk_starts = np.concatenate(
        [np.arange(offsets[i], offsets[i + 1], BLOCK) for i in range(n_terms)]
    ) if n_terms else np.empty(0, dtype=np.int64)
    blk_ends = np.minimum(blk_starts + BLOCK, np.repeat(offsets[1:], nblocks))
    return {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "total_len": int(coll.get("total_len", round(n_docs * avgdl))),
        "df": df_map,
        "cf": cf_map,
        "tindex": tindex,
        "offsets": offsets,
        "docids": docids_all,
        "tfs": tfs_all,
        "dls": dls_all,
        "w": w_all,
        "blk_offsets": blk_offsets,
        "blk_last_doc": docids_all[blk_ends - 1] if blk_starts.size else np.empty(0, np.int64),
        "blk_max_tf": np.maximum.reduceat(tfs_all, blk_starts) if blk_starts.size else np.empty(0, np.int64),
        "blk_min_dl": np.minimum.reduceat(dls_all, blk_starts) if blk_starts.size else np.empty(0, np.int64),
    }


class SharedIndexReader:
    """IndexReader-compatible facade over a ``build_shared_index`` dict
    (typically resolved from a ray.put ref; the big arrays come out of
    plasma zero-copy, and per-term access is offset slicing — views, not
    copies).  One logical segment (sid 0) spanning the whole doc range."""

    def __init__(self, shared: dict):
        self.n_docs = shared["n_docs"]
        self.avgdl = shared["avgdl"]
        self.total_len = int(
            shared.get("total_len", round(shared["n_docs"] * shared["avgdl"]))
        )
        self._df = shared["df"]
        self._cf = shared.get("cf", {})
        self._s = shared
        self.seg_ids = [0]
        # deletes are applied to the merged arrays at build_shared_index
        # time, so the facade reports none (scorer masks become no-ops)
        self.deleted = np.empty(0, dtype=np.int64)

    def dfs(self, terms: list[str]) -> dict[str, int]:
        return {t: self._df.get(t, 0) for t in terms}

    def cfs(self, terms: list[str]) -> dict[str, int]:
        return {t: self._cf.get(t, 0) for t in terms}

    def idf(self, term: str) -> float:
        import math

        df = self._df.get(term, 0)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def load_postings(self, sid: int, terms: list[str]) -> None:
        pass

    def postings(self, sid: int, term: str):
        s = self._s
        ti = s["tindex"].get(term)
        if ti is None:
            return None
        lo, hi = int(s["offsets"][ti]), int(s["offsets"][ti + 1])
        b0, b1 = int(s["blk_offsets"][ti]), int(s["blk_offsets"][ti + 1])
        return {
            "decoded": (s["docids"][lo:hi], s["tfs"][lo:hi], s["dls"][lo:hi]),
            "w": s["w"][lo:hi],
            "n": hi - lo,
            "blk_last_doc": s["blk_last_doc"][b0:b1],
            "blk_max_tf": s["blk_max_tf"][b0:b1],
            "blk_min_dl": s["blk_min_dl"][b0:b1],
        }

    def term_arrays(self, seg_ids, term):
        s = self._s
        ti = s["tindex"].get(term)
        if ti is None:
            return None
        lo, hi = int(s["offsets"][ti]), int(s["offsets"][ti + 1])
        return (s["docids"][lo:hi], s["w"][lo:hi])

    def term_tf_dl(self, seg_ids, term):
        s = self._s
        ti = s["tindex"].get(term)
        if ti is None:
            return None
        lo, hi = int(s["offsets"][ti]), int(s["offsets"][ti + 1])
        return (s["docids"][lo:hi], s["tfs"][lo:hi], s["dls"][lo:hi])


# ----------------------------------------------------------------- scoring

def _topk_exact(cscores: np.ndarray, cdocs: np.ndarray, k: int) -> list[tuple[float, int]]:
    """Exact top-k by (-score, doc_id) in O(n): argpartition to find the
    k-th score, then resolve the tie boundary by doc_id — avoids a full
    lexsort over every candidate (head-term queries touch ~all docs)."""
    n = cscores.size
    if n <= k:
        order = np.lexsort((cdocs, -cscores))
        return [(float(cscores[i]), int(cdocs[i])) for i in order]
    part = np.argpartition(-cscores, k - 1)[:k]
    thresh = cscores[part].min()
    gt = np.flatnonzero(cscores > thresh)
    eq = np.flatnonzero(cscores == thresh)
    need = k - gt.size
    if need > 0:
        eq_docs = cdocs[eq]
        take = eq[np.argpartition(eq_docs, need - 1)[:need]] if eq.size > need else eq
        sel = np.concatenate([gt, take])
    else:
        sel = gt[:k]  # cannot happen (gt < k by construction), defensive
    order = np.lexsort((cdocs[sel], -cscores[sel]))
    sel = sel[order]
    return [(float(cscores[i]), int(cdocs[i])) for i in sel]


def score_segment_taat(
    reader: IndexReader, sid: int, terms_sorted: list[str], idfs: dict[str, float], k: int,
    after: Optional[tuple[float, int]] = None,
    delta: float = 0.0,
) -> list[tuple[float, int]]:
    """Q1: exact TAAT over one segment -> top-k [(score, doc_id)];
    ``delta`` as in :func:`score_all_taat` (BM25+)."""
    rows = []
    for t in terms_sorted:
        row = reader.postings(sid, t)
        if row is not None:
            rows.append((t, row))
    if not rows:
        return []
    doc_lo = min(int(r["decoded"][0][0]) for _, r in rows)
    doc_hi = max(int(r["decoded"][0][-1]) for _, r in rows)
    width = doc_hi - doc_lo + 1
    scores = np.zeros(width, dtype=np.float64)
    touched = np.zeros(width, dtype=bool)
    for t, row in rows:  # ascending-term accumulation order (pinned)
        docids = row["decoded"][0]
        idx = docids - doc_lo
        w = row["w"]
        scores[idx] += idfs[t] * (w + delta) if delta else idfs[t] * w
        touched[idx] = True
    cand = np.flatnonzero(touched)
    if reader.deleted.size:
        from .deletes import live_mask

        cand = cand[live_mask(cand + doc_lo, reader.deleted)]
    if after is not None:
        cs, cd = after
        rs = np.round(scores[cand], 6)
        docs_g = cand + doc_lo
        cand = cand[(rs < cs) | ((rs == cs) & (docs_g > cd))]
    return _topk_exact(scores[cand], cand + doc_lo, k)


def score_all_taat(
    reader: IndexReader,
    seg_ids: list[int],
    terms_sorted: list[str],
    idfs: dict[str, float],
    k: int,
    after: Optional[tuple[float, int]] = None,
    delta: float = 0.0,
) -> list[tuple[float, int]]:
    """Q1+Q4 fused: exact TAAT over MANY segments with ONE dense
    accumulator spanning the global doc range.

    ``delta > 0`` turns the accumulation into BM25+ (Lv & Zhai, CIKM
    2011): every matched (term, doc) contribution gains ``idf * delta``
    — the lower bound that stops very long documents from being scored
    below an infinitely-long one.  ``delta=0`` is plain Okapi BM25; the
    stored per-posting weight already folds tf and length norm, so the
    variant costs one scalar add in the gather.

    ``after=(score, doc_id)`` is the search-after pagination cursor
    (Elasticsearch/Lucene ``searchAfter`` shape): only candidates
    strictly AFTER the cursor in (score DESC, doc_id ASC) order survive,
    so page N+1 costs one bounded top-k, not a deep top-(N+1)*k.  The
    cursor compares on round(score, 6) — the pinned cross-engine float
    policy — so page boundaries agree with the SQL oracles.

    Valid because doc_ids are global and dense and BM25 uses only global
    stats; per-(doc, term) contributions and the per-doc accumulation
    order (ascending term) are identical to per-segment scoring + merge,
    so results stay bit-for-bit equal to the oracle (tested).  Removes the
    per-segment Python overhead that dominates p95 when one process serves
    many segments."""
    per_term: list[tuple[str, np.ndarray, np.ndarray]] = []
    lo = None
    hi = None
    for t in terms_sorted:
        arrs = reader.term_arrays(seg_ids, t)
        if arrs is None:
            continue
        docids, w = arrs
        per_term.append((t, docids, w))
        tlo, thi = int(docids[0]), int(docids[-1])
        lo = tlo if lo is None else min(lo, tlo)
        hi = thi if hi is None else max(hi, thi)
    if not per_term:
        return []
    width = hi - lo + 1
    if width > 100_000_000:
        # dense accumulator would not fit; fall back to per-segment + merge
        # (one process only faces this when serving far more doc range than
        # a node would own in a real deployment)
        parts = [
            score_segment_taat(reader, sid, terms_sorted, idfs, k, after=after,
                               delta=delta)
            for sid in seg_ids
        ]
        return merge_topk(parts, k)
    scores = np.zeros(width, dtype=np.float64)
    touched = np.zeros(width, dtype=bool)
    for t, docids, w in per_term:  # ascending-term order (pinned)
        idx = docids - lo
        scores[idx] += idfs[t] * (w + delta) if delta else idfs[t] * w
        touched[idx] = True
    cand = np.flatnonzero(touched)
    if reader.deleted.size:
        from .deletes import live_mask

        cand = cand[live_mask(cand + lo, reader.deleted)]
    if after is not None:
        cs, cd = after
        rs = np.round(scores[cand], 6)
        docs_g = cand + lo
        cand = cand[(rs < cs) | ((rs == cs) & (docs_g > cd))]
    return _topk_exact(scores[cand], cand + lo, k)


LMD_MU = 2000.0
BM25PLUS_DELTA = 1.0  # pinned Lv & Zhai lower-bound delta


def score_all_sortfield(
    reader, seg_ids: list[int], terms: list[str], k: int
) -> list[tuple[float, int]]:
    """Lucene SortField / Elasticsearch ``sort``: the matched doc set
    (union of the query terms' postings, the same candidates as
    ``mode='count'``) ordered by a stored per-doc value instead of
    relevance — here doc length, the one numeric doc-value the postings
    already carry (``dl`` rides in every posting for BM25's length
    normalization, so sorting needs NO extra doc-store lookup).  Order
    is ``(dl DESC, doc_id ASC)``; returns ``[(dl, doc_id)]`` shaped like
    every other scorer so the actor plumbing is shared."""
    parts_d, parts_l = [], []
    for t in terms:
        a = reader.term_tf_dl(seg_ids, t)
        if a is not None:
            parts_d.append(a[0])
            parts_l.append(a[2])
    if not parts_d:
        return []
    docids = np.concatenate(parts_d)
    dls = np.concatenate(parts_l)
    docids, first = np.unique(docids, return_index=True)
    dls = dls[first]
    if reader.deleted.size:
        from .deletes import live_mask

        m = live_mask(docids, reader.deleted)
        docids, dls = docids[m], dls[m]
    if docids.size == 0:
        return []
    order = np.lexsort((docids, -dls))[:k]
    return [(float(dls[i]), int(docids[i])) for i in order]


def score_all_fvf(
    reader,
    seg_ids: list[int],
    terms_sorted: list[str],
    idfs: dict[str, float],
    k: int,
    modifier: str = "ln1p",
    origin: float = 0.0,
    scale: float = 1.0,
) -> list[tuple[float, int]]:
    """Elasticsearch ``function_score`` over the stored doc-length
    doc-value, two modifiers:

    * ``ln1p`` (``field_value_factor``): ``final = BM25 * ln(1 + dl)``
    * ``gauss`` (decay function): ``final = BM25 *
      exp(-(dl - origin)^2 / (2 * scale^2))`` — the Elasticsearch
      ``gauss`` decay shape, here over a numeric doc-value (at ingest a
      recency field would ride the same sidecar slot)

    The factor is per-doc and MULTIPLICATIVE, so it cannot be applied
    after a plain BM25 top-k cut (the modified order differs) — the
    scorer folds it in before the bounded top-k, exactly like Lucene's
    ``FunctionScoreQuery`` wraps the inner scorer.  ``dl`` rides in
    every posting (BM25's length norm needs it), so the factor costs no
    extra doc-value lookup; same fused dense-accumulator shape as
    :func:`score_all_taat`."""
    per_term = []
    lo = hi = None
    for t in terms_sorted:
        arrs = reader.term_arrays(seg_ids, t)
        tdl = reader.term_tf_dl(seg_ids, t)
        if arrs is None or tdl is None:
            continue
        docids, w = arrs
        per_term.append((t, docids, w, tdl[2]))
        tlo, thi = int(docids[0]), int(docids[-1])
        lo = tlo if lo is None else min(lo, tlo)
        hi = thi if hi is None else max(hi, thi)
    if not per_term:
        return []
    width = hi - lo + 1
    scores = np.zeros(width, dtype=np.float64)
    dls = np.zeros(width, dtype=np.float64)
    touched = np.zeros(width, dtype=bool)
    for t, docids, w, dl in per_term:  # ascending-term order (pinned)
        idx = docids - lo
        scores[idx] += idfs[t] * w
        dls[idx] = dl  # per-doc constant: any term's copy is the value
        touched[idx] = True
    cand = np.flatnonzero(touched)
    if reader.deleted.size:
        from .deletes import live_mask

        cand = cand[live_mask(cand + lo, reader.deleted)]
    if modifier == "range":
        # Elasticsearch FILTER context (range over the numeric
        # doc-value): a hard pre-filter on the candidate set BEFORE the
        # bounded top-k — scores are untouched, excluded docs can never
        # ride in on a short result page.  [origin, scale] double as
        # the inclusive [min, max] bounds.
        keep = (dls[cand] >= origin) & (dls[cand] <= scale)
        cand = cand[keep]
        return _topk_exact(scores[cand], cand + lo, k)
    if modifier == "gauss":
        d = dls[cand] - origin
        factor = np.exp(-(d * d) / (2.0 * scale * scale))
    else:
        factor = np.log1p(dls[cand])
    return _topk_exact(scores[cand] * factor, cand + lo, k)


def score_all_rank_feature(
    reader,
    seg_ids: list[int],
    terms_sorted: list[str],
    idfs: dict[str, float],
    k: int,
    feature_map,
    boost: float = 2.0,
    pivot: float = 1.0,
) -> list[tuple[float, int]]:
    """Elasticsearch ``rank_feature`` query (saturation function) inside
    a bool with the text match: ``final = BM25 + boost * f / (f +
    pivot)`` where ``f`` is a static per-doc feature (PageRank,
    freshness, ...) resolved from the doc-range-partitioned float
    sidecar (stages/features.py).  The bonus is per-doc and ADDITIVE
    over the match set, so — like fvf/decay — it must fold in BEFORE
    the bounded top-k (a high-feature doc outside the plain-BM25 page
    must be able to ride in).  Docs missing the feature contribute 0
    (ES semantics).  Cost over TAAT: one sidecar gather for the
    candidate set (bucket files cached per actor)."""
    per_term = []
    lo = hi = None
    for t in terms_sorted:
        arrs = reader.term_arrays(seg_ids, t)
        if arrs is None:
            continue
        docids, w = arrs
        per_term.append((t, docids, w))
        tlo, thi = int(docids[0]), int(docids[-1])
        lo = tlo if lo is None else min(lo, tlo)
        hi = thi if hi is None else max(hi, thi)
    if not per_term:
        return []
    width = hi - lo + 1
    scores = np.zeros(width, dtype=np.float64)
    touched = np.zeros(width, dtype=bool)
    for t, docids, w in per_term:  # ascending-term order (pinned)
        idx = docids - lo
        scores[idx] += idfs[t] * w
        touched[idx] = True
    cand = np.flatnonzero(touched)
    if reader.deleted.size:
        from .deletes import live_mask

        cand = cand[live_mask(cand + lo, reader.deleted)]
    if cand.size == 0:
        return []
    f = feature_map[cand + lo]
    sat = f / (f + pivot)
    return _topk_exact(scores[cand] + boost * sat, cand + lo, k)


NEG_BOOST = 0.5  # pinned ES `boosting` query negative_boost


def score_all_boosting(
    reader,
    seg_ids: list[int],
    pos_sorted: list[str],
    neg_sorted: list[str],
    idfs: dict[str, float],
    k: int,
    neg_boost: float = NEG_BOOST,
) -> list[tuple[float, int]]:
    """Elasticsearch ``boosting`` query (the Lucene ``BoostingQuery``
    shape): the positive clause is scored with the pinned BM25; any
    candidate that ALSO matches >= 1 negative term keeps its place in
    the match set but has its score multiplied by ``neg_boost`` BEFORE
    the bounded top-k — demotion, not exclusion.  A doc matching only
    negative terms never enters the candidate set (the match set is the
    positive clause's), and applying the factor after a plain top-k cut
    would be wrong: a demoted doc must be able to fall OUT of the page
    while an undemoted lower-scorer rides in.  Same fused dense-
    accumulator shape as :func:`score_all_taat`; the negative clause
    costs one sorted-unique docid union + one ``isin`` gather."""
    per_term: list[tuple[str, np.ndarray, np.ndarray]] = []
    lo = hi = None
    for t in pos_sorted:
        arrs = reader.term_arrays(seg_ids, t)
        if arrs is None:
            continue
        docids, w = arrs
        per_term.append((t, docids, w))
        tlo, thi = int(docids[0]), int(docids[-1])
        lo = tlo if lo is None else min(lo, tlo)
        hi = thi if hi is None else max(hi, thi)
    if not per_term:
        return []
    width = hi - lo + 1
    scores = np.zeros(width, dtype=np.float64)
    touched = np.zeros(width, dtype=bool)
    for t, docids, w in per_term:  # ascending-term order (pinned)
        idx = docids - lo
        scores[idx] += idfs[t] * w
        touched[idx] = True
    cand = np.flatnonzero(touched)
    if reader.deleted.size:
        from .deletes import live_mask

        cand = cand[live_mask(cand + lo, reader.deleted)]
    neg_parts = [
        arrs[0]
        for t in neg_sorted
        if (arrs := reader.term_arrays(seg_ids, t)) is not None
    ]
    sc = scores[cand]
    if neg_parts:
        neg_docs = np.unique(np.concatenate(neg_parts))
        demote = np.isin(cand + lo, neg_docs, assume_unique=True)
        sc = np.where(demote, sc * neg_boost, sc)
    return _topk_exact(sc, cand + lo, k)


BOOL_PREFIX_BONUS = 1.0  # constant-score prefix clause contribution


def score_all_bool_prefix(
    reader,
    seg_ids: list[int],
    terms_sorted: list[str],
    bonus_sorted: list[str],
    idfs: dict[str, float],
    k: int,
    bonus: float = BOOL_PREFIX_BONUS,
) -> list[tuple[float, int]]:
    """Elasticsearch ``match_bool_prefix`` scoring (pinned semantics):
    the full terms score with the exact BM25, the trailing prefix clause
    is CONSTANT_SCORE over its dictionary expansion — any doc matching
    >= 1 expanded term gains a flat ``bonus`` exactly once, however many
    expanded terms hit (Lucene's ``CONSTANT_SCORE_REWRITE`` of a
    multi-term query inside a BooleanQuery ``should``).

    Unlike the boosting query's negative clause, a doc matching ONLY the
    prefix clause is a real candidate (score == ``bonus``), so the dense
    accumulator spans the union of both clauses' doc ranges.  The bonus
    union is one sorted-unique docid merge; everything else is the fused
    :func:`score_all_taat` shape, so the bounded top-k stays per-segment
    cheap — no post-hoc rescoring window is needed because the constant
    is folded in BEFORE the cut (a +bonus doc outside the BM25 top-k can
    ride into the page; applying it after a plain top-k would miss it)."""
    per_term: list[tuple[str, np.ndarray, np.ndarray]] = []
    lo = hi = None
    for t in terms_sorted:
        arrs = reader.term_arrays(seg_ids, t)
        if arrs is None:
            continue
        docids, w = arrs
        per_term.append((t, docids, w))
        tlo, thi = int(docids[0]), int(docids[-1])
        lo = tlo if lo is None else min(lo, tlo)
        hi = thi if hi is None else max(hi, thi)
    bonus_parts: list[np.ndarray] = []
    for t in bonus_sorted:
        arrs = reader.term_arrays(seg_ids, t)
        if arrs is None:
            continue
        docids = arrs[0]
        bonus_parts.append(docids)
        tlo, thi = int(docids[0]), int(docids[-1])
        lo = tlo if lo is None else min(lo, tlo)
        hi = thi if hi is None else max(hi, thi)
    if lo is None:
        return []
    width = hi - lo + 1
    scores = np.zeros(width, dtype=np.float64)
    touched = np.zeros(width, dtype=bool)
    for t, docids, w in per_term:  # ascending-term order (pinned)
        idx = docids - lo
        scores[idx] += idfs[t] * w
        touched[idx] = True
    if bonus_parts:
        bd = np.unique(np.concatenate(bonus_parts)) - lo
        scores[bd] += bonus
        touched[bd] = True
    cand = np.flatnonzero(touched)
    if reader.deleted.size:
        from .deletes import live_mask

        cand = cand[live_mask(cand + lo, reader.deleted)]
    return _topk_exact(scores[cand], cand + lo, k)


def score_all_lmd(
    reader,
    seg_ids: list[int],
    terms_sorted: list[str],
    cfs: dict[str, int],
    k: int,
    mu: float = LMD_MU,
    after: Optional[tuple[float, int]] = None,
) -> list[tuple[float, int]]:
    """LM with Dirichlet smoothing (Zhai & Lafferty, SIGIR 2001; the
    Lucene ``LMDirichletSimilarity`` formula shape): per (query term t
    present in doc d),

        ln(1 + tf * T / (mu * cf_t)) + ln(mu / (dl + mu))

    with T = total collection tokens, cf_t = collection frequency of t,
    summed over unique query terms — only docs containing >= 1 query
    term are scored (the SQL-join semantics).  Same fused dense-
    accumulator shape as :func:`score_all_taat`; exactness policy is the
    cross-engine round(score, 6) re-rank (LMD scores can be negative —
    the ordering is still total)."""
    T = float(reader.total_len)
    per_term: list[np.ndarray] = []
    per_docs: list[np.ndarray] = []
    lo = hi = None
    for t in terms_sorted:
        cf = cfs.get(t, 0)
        if not cf:
            continue
        arrs = reader.term_tf_dl(seg_ids, t)
        if arrs is None:
            continue
        docids, tfs, dls = arrs
        contrib = np.log(
            1.0 + tfs.astype(np.float64) * T / (mu * float(cf))
        ) + np.log(mu / (dls.astype(np.float64) + mu))
        per_docs.append(docids)
        per_term.append(contrib)
        tlo, thi = int(docids[0]), int(docids[-1])
        lo = tlo if lo is None else min(lo, tlo)
        hi = thi if hi is None else max(hi, thi)
    if not per_term:
        return []
    width = hi - lo + 1
    scores = np.zeros(width, dtype=np.float64)
    touched = np.zeros(width, dtype=bool)
    for docids, contrib in zip(per_docs, per_term):
        idx = docids - lo
        scores[idx] += contrib
        touched[idx] = True
    cand = np.flatnonzero(touched)
    if reader.deleted.size:
        from .deletes import live_mask

        cand = cand[live_mask(cand + lo, reader.deleted)]
    if after is not None:
        cs, cd = after
        rs = np.round(scores[cand], 6)
        docs_g = cand + lo
        cand = cand[(rs < cs) | ((rs == cs) & (docs_g > cd))]
    return _topk_exact(scores[cand], cand + lo, k)


def score_all_simfam(
    reader,
    seg_ids: list[int],
    terms_sorted: list[str],
    model: str,
    dfs: dict[str, int],
    cfs: dict[str, int],
    k: int,
) -> list[tuple[float, int]]:
    """Three more classical similarity families served from the SAME
    segments as BM25/LMD — per unique query term t present in doc d,
    with N = n_docs, T = total tokens, avgdl = T/N and the shared DFR
    H2 length normalization ``tfn = tf * log2(1 + avgdl/dl)`` (c = 1):

    * ``model="dfr"`` — DFR InL2 (Amati & van Rijsbergen, TOIS 2002;
      Terrier's default model; Lucene ``DFRSimilarity(BasicModelIN,
      AfterEffectL, NormalizationH2)``):
          (tfn / (tfn + 1)) * log2((N + 1) / (df + 0.5))
    * ``model="spl"`` — information-based SPL-D (Clinchant & Gaussier,
      SIGIR 2010; Lucene ``IBSimilarity(DistributionSPL, ..., H2)``)
      with the PINNED smoothed lambda = (df + 0.5) / (N + 1), strictly
      inside (0, 1) so the score is finite even for a term in every doc
      (Lucene's LambdaDF hits a 1/(1-1) pole there):
          -log2((lambda^(tfn/(tfn+1)) - lambda) / (1 - lambda))
    * ``model="dfi"`` — divergence from independence, chi-squared
      (Kocabas, Dincer & Karaoglan, IR 2014; Lucene ``DFISimilarity``):
      expected tf under independence e = cf * dl / T, and a term only
      contributes when observed > expected:
          log2((tf - e)^2 / e + 1)   if tf > e else 0
    * ``model="lmjm"`` — LM with Jelinek-Mercer smoothing (Zhai &
      Lafferty, SIGIR 2001; Lucene ``LMJelinekMercerSimilarity``),
      pinned lambda = 0.1 (the short-query setting):
          ln(1 + ((1 - lambda) * tf / dl) / (lambda * cf / T))
    * ``model="f2exp"`` — axiomatic F2EXP (Fang & Zhai, SIGIR 2005;
      Lucene ``AxiomaticF2EXP``; s = 0.5, k = 0.35):
          (tf / (tf + s + s * dl / avgdl)) * (N / df)^k
    * ``model="pl2"`` — DFR PL2 (Amati & van Rijsbergen, TOIS 2002;
      Terrier ``PL2``, c = 1), Poisson model with Laplace after-effect
      and H2 normalization; mean rate lambda = cf / N:
          (1/(tfn+1)) * (tfn*log2(tfn/lambda)
                         + (lambda + 1/(12*tfn) - tfn)*log2(e)
                         + 0.5*log2(2*pi*tfn))
    * ``model="dph"`` — DPH hypergeometric (Amati's parameter-free
      DFR; Terrier ``DPH``), f = tf/dl, norm = (1-f)^2/(tf+1):
          norm * (tf*log2((tf*avgdl/dl) * (N/cf))
                  + 0.5*log2(2*pi*tf*(1-f)))
      with the PINNED pole rule: a posting with tf >= dl (a document
      that is nothing but the term — f = 1 makes the log term -inf
      while norm is 0) contributes exactly 0.0, mirrored as the CASE
      guard in the SQL oracle.

    Contributions sum over unique query terms; only docs containing at
    least one query term are candidates, and (DFI) docs whose total is
    <= 0 are dropped — both mirrored in the SQL oracles as the join +
    HAVING clause.  Same fused dense-accumulator + round(score, 6)
    re-rank policy as :func:`score_all_taat`."""
    if model not in ("dfr", "spl", "dfi", "lmjm", "f2exp", "pl2", "dph"):
        raise ValueError(f"unknown similarity family {model!r}")
    N = float(reader.n_docs)
    T = float(reader.total_len)
    avgdl = float(reader.avgdl)
    ln2 = math.log(2.0)
    per_term: list[np.ndarray] = []
    per_docs: list[np.ndarray] = []
    lo = hi = None
    for t in terms_sorted:
        if not dfs.get(t, 0):
            continue
        arrs = reader.term_tf_dl(seg_ids, t)
        if arrs is None:
            continue
        docids, tfs, dls = arrs
        tfs_f = tfs.astype(np.float64)
        dls_f = dls.astype(np.float64)
        # every transcendental below is ln-based with an explicit /ln2,
        # matching the SQL oracle expression shape term for term so the
        # round(score, 6) re-rank sees bit-identical inputs
        if model == "dfi":
            expected = cfs[t] * dls_f / T
            gain = np.log((tfs_f - expected) ** 2 / expected + 1.0) / ln2
            contrib = np.where(tfs_f > expected, gain, 0.0)
        elif model == "lmjm":
            lam_jm = 0.1
            contrib = np.log(
                1.0
                + ((1.0 - lam_jm) * tfs_f / dls_f)
                / (lam_jm * cfs[t] / T)
            )
        elif model == "f2exp":
            contrib = (
                tfs_f / (tfs_f + 0.5 + 0.5 * dls_f / avgdl)
            ) * math.pow(N / dfs[t], 0.35)
        elif model == "pl2":
            lam_pl2 = cfs[t] / N
            tfn = tfs_f * np.log(1.0 + avgdl / dls_f) / ln2
            contrib = (1.0 / (tfn + 1.0)) * (
                tfn * np.log(tfn / lam_pl2) / ln2
                + (lam_pl2 + 1.0 / (12.0 * tfn) - tfn) / ln2
                + 0.5 * np.log(2.0 * math.pi * tfn) / ln2
            )
        elif model == "dph":
            frac = tfs_f / dls_f
            norm = (1.0 - frac) * (1.0 - frac) / (tfs_f + 1.0)
            with np.errstate(divide="ignore", invalid="ignore"):
                gain = norm * (
                    tfs_f
                    * np.log((tfs_f * avgdl / dls_f) * (N / cfs[t]))
                    / ln2
                    + 0.5 * np.log(2.0 * math.pi * tfs_f * (1.0 - frac))
                    / ln2
                )
            contrib = np.where(tfs_f < dls_f, gain, 0.0)
        else:
            tfn = tfs_f * np.log(1.0 + avgdl / dls_f) / ln2
            if model == "dfr":
                idf2 = math.log((N + 1.0) / (dfs[t] + 0.5)) / ln2
                contrib = tfn / (tfn + 1.0) * idf2
            else:  # spl
                lam = (dfs[t] + 0.5) / (N + 1.0)
                contrib = (
                    -np.log((np.power(lam, tfn / (tfn + 1.0)) - lam)
                            / (1.0 - lam)) / ln2
                )
        per_docs.append(docids)
        per_term.append(contrib)
        tlo, thi = int(docids[0]), int(docids[-1])
        lo = tlo if lo is None else min(lo, tlo)
        hi = thi if hi is None else max(hi, thi)
    if not per_term:
        return []
    width = hi - lo + 1
    scores = np.zeros(width, dtype=np.float64)
    touched = np.zeros(width, dtype=bool)
    for docids, contrib in zip(per_docs, per_term):
        idx = docids - lo
        scores[idx] += contrib
        touched[idx] = True
    cand = np.flatnonzero(touched)
    if reader.deleted.size:
        from .deletes import live_mask

        cand = cand[live_mask(cand + lo, reader.deleted)]
    if model == "dfi":
        # a doc can match only below-expectation terms: total 0, dropped
        cand = cand[scores[cand] > 0.0]
    return _topk_exact(scores[cand], cand + lo, k)


def score_all_saat(
    reader,
    seg_ids: list[int],
    terms_sorted: list[str],
    idfs: dict[str, float],
    k: int,
    budget_frac: float = 1.0,
    n_bins: int = 255,
    wmax: Optional[float] = None,
) -> tuple[list[tuple[int, int]], int, int]:
    """Score-at-a-time serving over quantized impacts (Anh & Moffat,
    SIGIR 2005 "Simplified similarity scoring using term ranks"; the
    JASS anytime engine of Lin & Trotman, ICTIR 2015): every posting's
    exact BM25 contribution c quantizes to an integer impact
    ``floor(c / wmax * 255) + 1`` — wmax pinned PER QUERY as the max
    contribution over the query's present terms (the scale every
    scored posting shares) — and postings are processed in DECREASING
    impact order under a postings budget: ``budget_frac`` of the total
    postings, largest impacts first (ties: doc ascending, then the
    query's term order — pinned).  With budget 1.0 the result is the
    EXACT quantized ranking (integer scores, no float rounding policy
    needed); smaller budgets trade rank quality for bounded work — the
    anytime property the DAAT family (TAAT/WAND/MaxScore) cannot
    offer, because those must touch every candidate's full posting
    set.

    Returns ``(ranked [(score, doc_id)], postings_processed,
    postings_total)``."""
    per_docs: list[np.ndarray] = []
    per_c: list[np.ndarray] = []
    per_tix: list[np.ndarray] = []
    for tix, t in enumerate(terms_sorted):
        arrs = reader.term_arrays(seg_ids, t)
        if arrs is None:
            continue
        docids, w = arrs
        if docids.size == 0:
            continue
        per_docs.append(docids)
        per_c.append(idfs[t] * w)
        per_tix.append(np.full(docids.size, tix, dtype=np.int64))
    if not per_c:
        return [], 0, 0
    docs = np.concatenate(per_docs)
    c = np.concatenate(per_c)
    tix = np.concatenate(per_tix)
    if wmax is None:
        # per-query scale (the default, the saat_topk entry's pinned
        # rule); a stored impact index passes its BUILD-time global
        # wmax instead so query-time and stored impacts agree
        wmax = float(c.max())
    impacts = np.floor(c / wmax * n_bins).astype(np.int64) + 1
    total = int(impacts.size)
    order = np.lexsort((tix, docs, -impacts))
    take = total if budget_frac >= 1.0 else int(
        math.ceil(budget_frac * total)
    )
    sel = order[:take]
    sdocs = docs[sel]
    simp = impacts[sel]
    uniq, inv = np.unique(sdocs, return_inverse=True)
    sums = np.zeros(uniq.size, dtype=np.int64)
    np.add.at(sums, inv, simp)
    if reader.deleted.size:
        from .deletes import live_mask

        m = live_mask(uniq, reader.deleted)
        uniq, sums = uniq[m], sums[m]
    order2 = np.lexsort((uniq, -sums))[:k]
    return (
        [(int(sums[i]), int(uniq[i])) for i in order2],
        take,
        total,
    )


def score_all_syn(
    reader,
    seg_ids: list[int],
    groups: list[list[str]],
    k: int,
) -> list[tuple[float, int]]:
    """Synonym-group BM25 (the Lucene ``SynonymQuery`` scoring model):
    each query term's synonym group is scored as ONE pseudo-term —
    per-doc tf = SUM of member tfs, df = MAX over member dfs — then the
    pinned BM25 expression applies to the merged (tf, dl) pairs.  Groups
    whose members are all absent contribute nothing.  Fused dense
    accumulator across segments, like :func:`score_all_taat`."""
    merged: list[tuple[np.ndarray, np.ndarray]] = []  # (docids, contrib)
    lo = hi = None
    for members in groups:
        parts = [
            arrs
            for t in sorted(set(members))
            if (arrs := reader.term_tf_dl(seg_ids, t)) is not None
        ]
        if not parts:
            continue
        df_g = max(reader.dfs(sorted(set(members))).values())
        import math

        idf = math.log(1.0 + (reader.n_docs - df_g + 0.5) / (df_g + 0.5))
        alldoc = np.concatenate([p[0] for p in parts])
        alltf = np.concatenate([p[1] for p in parts])
        alldl = np.concatenate([p[2] for p in parts])
        uniq, inv = np.unique(alldoc, return_inverse=True)
        tfm = np.bincount(inv, weights=alltf.astype(np.float64))
        dlm = np.zeros(uniq.size, dtype=np.float64)
        dlm[inv] = alldl  # every member sees the same dl for a doc
        w = (tfm * (K1 + 1.0)) / (
            tfm + K1 * (1.0 - B + B * dlm / reader.avgdl)
        )
        merged.append((uniq, idf * w))
        tlo, thi = int(uniq[0]), int(uniq[-1])
        lo = tlo if lo is None else min(lo, tlo)
        hi = thi if hi is None else max(hi, thi)
    if not merged:
        return []
    width = hi - lo + 1
    scores = np.zeros(width, dtype=np.float64)
    touched = np.zeros(width, dtype=bool)
    for docids, contrib in merged:
        idx = docids - lo
        scores[idx] += contrib
        touched[idx] = True
    cand = np.flatnonzero(touched)
    if reader.deleted.size:
        from .deletes import live_mask

        cand = cand[live_mask(cand + lo, reader.deleted)]
    return _topk_exact(scores[cand], cand + lo, k)


def _first_per_group(g: np.ndarray, sc: np.ndarray, docs: np.ndarray):
    """Best (score DESC, doc_id ASC) row per group code — vectorized."""
    order = np.lexsort((docs, -sc, g))  # by group, then score desc, doc asc
    gs = g[order]
    first = (
        np.concatenate([[True], gs[1:] != gs[:-1]])
        if gs.size
        else np.empty(0, bool)
    )
    win = order[first]
    return g[win], sc[win], docs[win]


def score_all_collapse(
    reader,
    seg_ids: list[int],
    terms_sorted: list[str],
    idfs: dict[str, float],
    k: int,
    group_codes: np.ndarray,
) -> list[tuple[float, int, int]]:
    """Field collapsing (the Lucene/Elasticsearch ``collapse`` result
    shape): the ranking holds at most ONE doc per collapse key — each
    key represented by its best doc — and the top-k is over those group
    winners.  ``group_codes`` maps doc_id -> int group code (dense
    doc_ids index it directly; at 10^12 docs it is a doc-range-
    partitioned sidecar each actor loads for its own segments, not a
    monolithic broadcast).

    Shape: per SEGMENT, accumulate and keep the best doc per group
    (bounded by min(seg_docs, n_groups) rows), then merge segment
    winners by per-group max — winner-per-group is a max-aggregate, so
    the merge is exact and nothing doc-sized ever concatenates.  Winner
    selection and ranking use round(score, 6) + doc_id tie-break (the
    pinned cross-engine float policy).  Returns
    [(rounded_score, doc_id, group_code)] in rank order."""
    seg_g, seg_sc, seg_doc = [], [], []
    for sid in seg_ids:
        rows = []
        for t in terms_sorted:
            row = reader.postings(sid, t)
            if row is not None:
                rows.append((t, row))
        if not rows:
            continue
        doc_lo = min(int(r["decoded"][0][0]) for _, r in rows)
        doc_hi = max(int(r["decoded"][0][-1]) for _, r in rows)
        width = doc_hi - doc_lo + 1
        scores = np.zeros(width, dtype=np.float64)
        touched = np.zeros(width, dtype=bool)
        for t, row in rows:  # ascending-term accumulation order (pinned)
            docids = row["decoded"][0]
            idx = docids - doc_lo
            scores[idx] += idfs[t] * row["w"]
            touched[idx] = True
        cand = np.flatnonzero(touched)
        if reader.deleted.size:
            from .deletes import live_mask

            cand = cand[live_mask(cand + doc_lo, reader.deleted)]
        if not cand.size:
            continue
        docs = cand + doc_lo
        sc = np.round(scores[cand], 6)
        g, s, d = _first_per_group(group_codes[docs], sc, docs)
        seg_g.append(g)
        seg_sc.append(s)
        seg_doc.append(d)
    if not seg_g:
        return []
    g, sc, docs = _first_per_group(
        np.concatenate(seg_g), np.concatenate(seg_sc), np.concatenate(seg_doc)
    )
    korder = np.lexsort((docs, -sc))[:k]
    return [(float(sc[i]), int(docs[i]), int(g[i])) for i in korder]


def score_all_tfidf(
    reader,
    seg_ids: list[int],
    terms: list[str],
    k: int,
) -> list[tuple[float, int]]:
    """DrQA-style TF-IDF scorer (fever-baselines/DrQA ranker formula,
    arXiv:1704.00051): w(t, d) = log1p(tf) * idf_clip, query weight
    log1p(query-tf) * idf_clip, idf_clip = max(0, ln((N-df+.5)/(df+.5)));
    score = q . d.  Duplicate query terms raise the query weight (unlike
    the BM25 path, which dedups).

    Bit-identical to oracle.OracleIndex.tfidf_topk: log1p values come
    from a math.log1p lookup over the (small-int) tf values, so numpy's
    log1p rounding never diverges from the oracle's scalar math.
    """
    import math
    from collections import Counter

    qtf = Counter(terms)
    uniq = sorted(qtf)
    dfs = reader.dfs(uniq)
    per_term = []
    lo = hi = None
    for t in uniq:
        arrs_rows = []
        for sid in seg_ids:
            row = reader.postings(sid, t)
            if row is not None:
                arrs_rows.append(row["decoded"])
        if not arrs_rows:
            continue
        df = dfs[t]
        idf = math.log((reader.n_docs - df + 0.5) / (df + 0.5))
        idf = max(idf, 0.0)
        qw = math.log1p(qtf[t]) * idf
        if qw == 0.0:
            continue
        docids = np.concatenate([a[0] for a in arrs_rows])
        tfs = np.concatenate([a[1] for a in arrs_rows])
        # math.log1p LUT over the distinct tf ints -> oracle-identical
        vals = np.unique(tfs)
        lut = np.array([math.log1p(float(v)) for v in vals])
        dw = lut[np.searchsorted(vals, tfs)] * idf
        per_term.append((t, docids, qw * dw))
        tlo, thi = int(docids[0]), int(docids[-1])
        lo = tlo if lo is None else min(lo, tlo)
        hi = thi if hi is None else max(hi, thi)
    if not per_term:
        return []
    width = hi - lo + 1
    scores = np.zeros(width, dtype=np.float64)
    touched = np.zeros(width, dtype=bool)
    for t, docids, contrib in per_term:  # ascending-term order (pinned)
        idx = docids - lo
        scores[idx] += contrib
        touched[idx] = True
    cand = np.flatnonzero(touched)
    if getattr(reader, "deleted", np.empty(0)).size:
        from .deletes import live_mask

        cand = cand[live_mask(cand + lo, reader.deleted)]
    return _topk_exact(scores[cand], cand + lo, k)


def _block_ub(idf: float, max_tf: int, min_dl: int, avgdl: float) -> float:
    # BM25 is increasing in tf, decreasing in dl -> f(max_tf, min_dl) bounds
    # every posting in the block (stages/codec.py C3).  Same expression
    # shape as the pinned scorer so equality cases round identically.
    return idf * ((max_tf * (K1 + 1.0)) / (max_tf + K1 * (1.0 - B + B * min_dl / avgdl)))


def _ranges_to_indices(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Concatenate ``arange(s, e)`` for every (s, e) run, vectorized."""
    lens = ends - starts
    keep = lens > 0
    starts, lens = starts[keep], lens[keep]
    if starts.size == 0:
        return np.empty(0, dtype=np.int64)
    total = int(lens.sum())
    idx = np.ones(total, dtype=np.int64)
    idx[0] = starts[0]
    cum = np.cumsum(lens[:-1])
    idx[cum] = starts[1:] - (starts[:-1] + lens[:-1] - 1)
    return np.cumsum(idx)


# postings scored in the first pruning round; subsequent rounds grow
# geometrically (x4, capped) — a small first chunk establishes theta
# cheaply for selective queries, big later chunks keep the per-round
# numpy overhead negligible for head-term queries pruning can't help
_WAND_CHUNK_POSTINGS = 4096
_WAND_CHUNK_MAX = 65536


def _wand_term_pack(
    reader, sids: list[int], term: str, idf: float, avgdl: float
):
    """Per-term WAND inputs concatenated across ``sids`` (ascending sid =
    ascending docids, and C3 blocks never cross segments, so block arrays
    concatenate validly): (docids, idf*w, blk_first, blk_last, blk_ub) or
    None when the term is absent."""
    from .codec import BLOCK

    p_doc, p_con, p_first, p_last, p_ub = [], [], [], [], []
    for sid in sids:
        row = reader.postings(sid, term)
        if row is None:
            continue
        docids = row["decoded"][0]
        bl = np.asarray(row["blk_last_doc"], dtype=np.int64)
        mt = np.asarray(row["blk_max_tf"], dtype=np.float64)
        md = np.asarray(row["blk_min_dl"], dtype=np.float64)
        # identical expression shape to _block_ub / the cached row["w"]
        ub = idf * ((mt * (K1 + 1.0)) / (mt + K1 * (1.0 - B + B * md / avgdl)))
        w = row.get("w")
        if w is None:  # readers cache this at decode; compute if absent
            tfs_f = row["decoded"][1].astype(np.float64)
            dls_f = row["decoded"][2].astype(np.float64)
            w = (tfs_f * (K1 + 1.0)) / (
                tfs_f + K1 * (1.0 - B + B * dls_f / avgdl)
            )
        p_doc.append(docids)
        p_con.append(idf * w)
        p_first.append(docids[::BLOCK].astype(np.int64))
        p_last.append(bl)
        p_ub.append(ub)
    if not p_doc:
        return None
    if len(p_doc) == 1:
        pack = (p_doc[0], p_con[0], p_first[0], p_last[0], p_ub[0])
    else:
        pack = (
            np.concatenate(p_doc), np.concatenate(p_con),
            np.concatenate(p_first), np.concatenate(p_last),
            np.concatenate(p_ub),
        )
    if getattr(reader, "deleted", np.empty(0)).size:
        from .deletes import live_mask

        docids, contrib = pack[0], pack[1]
        m = live_mask(docids, reader.deleted)
        if not m.all():
            docids, contrib = docids[m], contrib[m]
            if docids.size == 0:
                return None
            # stored C3 blocks assume the physical posting stride; after
            # dropping deleted postings, rebuild block bounds from the
            # filtered arrays (max contrib per block — a tighter, still
            # valid upper bound; pruning-only, exactness unchanged)
            starts = np.arange(0, docids.size, BLOCK, dtype=np.int64)
            pack = (
                docids,
                contrib,
                docids[starts],
                docids[np.minimum(starts + BLOCK - 1, docids.size - 1)],
                np.maximum.reduceat(contrib, starts),
            )
    return pack


def _wand_sweep(
    term_docids: list[np.ndarray],
    term_contrib: list[np.ndarray],
    blk_first: list[np.ndarray],
    blk_last: list[np.ndarray],
    blk_ub: list[np.ndarray],
    k: int,
) -> list[tuple[float, int]]:
    """Q2 core: block-max WAND as a VECTORIZED interval sweep — identical
    output to the exhaustive TAAT scorer (pruning-only; asserted in
    tests, including hypothesis corpora).

    The per-doc pivot/advance loop of classic BMW (Ding & Suel, SIGIR
    2011) is re-expressed in candidate-interval form so every step is a
    numpy kernel over block metadata, never a Python loop over docs:

    1. each term's C3 blocks define docid spans with an exact BM25 upper
       bound (``_block_ub``); the union of span boundaries cuts the doc
       range into elementary intervals whose per-term active block — and
       therefore summed upper bound — is constant;
    2. intervals are processed in DESCENDING upper-bound order in chunks;
       each chunk's postings are gathered by vectorized range-slicing and
       scored exactly (per-term scatter-add in ascending-term order — the
       same per-doc addition order as TAAT, so scores stay bit-identical);
    3. after each chunk the running top-k raises theta, and every
       remaining interval with ub < theta is dropped WHOLESALE — the
       block-skip, applied to interval batches instead of single docs.

    Pruning safety: per-term ub >= per-posting contribution holds in
    float64 (same expression shape, monotone FP ops), and interval ubs
    accumulate in the same ascending-term order as doc scores, so
    fl(sum ub) >= fl(sum contrib) — an interval is dropped only when no
    doc in it can reach theta; ties at theta survive (strict <)."""
    nterms = len(term_docids)
    if nterms == 0:
        return []

    # elementary intervals: between consecutive block-span boundaries the
    # active block per term (hence the summed upper bound) is constant
    bounds = np.unique(
        np.concatenate(blk_first + [bl + 1 for bl in blk_last])
    )
    int_start = bounds[:-1]
    int_end = bounds[1:]
    n_int = int_start.size
    ub_int = np.zeros(n_int, dtype=np.float64)
    counts = np.zeros(n_int, dtype=np.int64)
    term_runs: list[tuple[np.ndarray, np.ndarray]] = []
    term_int_ub: list[np.ndarray] = []
    for ti in range(nterms):
        bi = np.searchsorted(blk_last[ti], int_start)
        act = bi < blk_last[ti].size
        act[act] &= blk_first[ti][bi[act]] <= int_start[act]
        contrib = np.zeros(n_int, dtype=np.float64)
        contrib[act] = blk_ub[ti][bi[act]]
        ub_int += contrib  # ascending-term accumulation, like doc scores
        term_int_ub.append(contrib)
        ss = np.searchsorted(term_docids[ti], int_start)
        ee = np.searchsorted(term_docids[ti], int_end)
        term_runs.append((ss, ee))
        counts += ee - ss

    live = np.flatnonzero(counts > 0)
    order = np.argsort(-ub_int[live], kind="stable")  # desc ub, deterministic
    perm = live[order]
    ubs = ub_int[perm]
    cnts = counts[perm]
    csum = np.cumsum(cnts)

    best_docs = np.empty(0, dtype=np.int64)
    best_scores = np.empty(0, dtype=np.float64)
    theta = -np.inf
    pos = 0
    chunk_postings = _WAND_CHUNK_POSTINGS
    while pos < perm.size:
        # remaining intervals are ub-descending: everything past the first
        # ub < theta can never contribute (strict <: ties at theta survive)
        end = pos + int(np.searchsorted(-ubs[pos:], -theta, side="right"))
        if end == pos:
            break
        base = csum[pos - 1] if pos else 0
        take = int(np.searchsorted(csum[pos:end] - base, chunk_postings)) + 1
        take = min(take, end - pos)
        chunk_postings = min(chunk_postings * 4, _WAND_CHUNK_MAX)
        sel = perm[pos : pos + take]
        pos += take
        sel_start = int_start[sel]
        spans = int_end[sel] - sel_start
        width = int(spans.sum())
        n_chunk = int(csum[pos - 1] - base)

        # MaxScore-style split (Turtle & Flood 1995) once theta is live:
        # terms whose chunk-max upper bounds fold to < theta (ascending-
        # term fold, FP-monotone vs any doc's score) are NON-ESSENTIAL —
        # a doc with no essential posting cannot reach theta, so
        # candidates come from essential postings only and non-essential
        # contributions are point lookups per candidate.  This is what
        # skips the head-term posting mass when rare-term blocks span the
        # whole docid range and interval pruning alone cannot fire.
        essential = np.ones(nterms, dtype=bool)
        if np.isfinite(theta):
            cmax = np.array(
                [float(term_int_ub[ti][sel].max()) for ti in range(nterms)]
            )
            for ti in np.argsort(cmax, kind="stable"):
                trial = essential.copy()
                trial[ti] = False
                bound = 0.0
                for tj in range(nterms):  # ascending-term fold
                    if not trial[tj]:
                        bound += cmax[tj]
                if bound < theta:
                    essential = trial
                else:
                    break
        if not essential.all():
            parts = []
            for ti in range(nterms):
                if not essential[ti]:
                    continue
                ss, ee = term_runs[ti]
                gi = _ranges_to_indices(ss[sel], ee[sel])
                if gi.size:
                    parts.append(term_docids[ti][gi])
            if not parts:
                continue
            docs_u = np.unique(np.concatenate(parts))
            scores_u = np.zeros(docs_u.size, dtype=np.float64)
            for ti in range(nterms):  # ascending-term scatter-add order
                td = term_docids[ti]
                if essential[ti]:
                    ss, ee = term_runs[ti]
                    gi = _ranges_to_indices(ss[sel], ee[sel])
                    if gi.size:
                        scores_u[np.searchsorted(docs_u, td[gi])] += (
                            term_contrib[ti][gi]
                        )
                else:
                    p = np.searchsorted(td, docs_u)
                    ok = p < td.size
                    ok[ok] &= td[p[ok]] == docs_u[ok]
                    scores_u[ok] += term_contrib[ti][p[ok]]
        elif width <= 8 * n_chunk + 1024:
            # dense path: pack the chunk's intervals side by side and
            # scatter-add per term in ascending-term order — the exact
            # per-doc addition order (and kernel) of TAAT
            offs = np.concatenate([[0], np.cumsum(spans)[:-1]])
            shift = offs - sel_start
            scores_d = np.zeros(width, dtype=np.float64)
            touched = np.zeros(width, dtype=bool)
            for ti in range(nterms):
                ss, ee = term_runs[ti]
                s_sel, e_sel = ss[sel], ee[sel]
                gi = _ranges_to_indices(s_sel, e_sel)
                if gi.size == 0:
                    continue
                p = term_docids[ti][gi] + np.repeat(shift, e_sel - s_sel)
                scores_d[p] += term_contrib[ti][gi]
                touched[p] = True
            cand = np.flatnonzero(touched)
            if cand.size == 0:
                continue
            iv = np.searchsorted(offs, cand, side="right") - 1
            docs_u = cand - shift[iv]
            scores_u = scores_d[cand]
        else:
            # sparse fallback (intervals with huge doc spans but few
            # postings — tail-term blocks spanning wide docid ranges):
            # map candidates through a sorted unique-doc universe
            parts_d, parts_c = [], []
            for ti in range(nterms):
                ss, ee = term_runs[ti]
                gi = _ranges_to_indices(ss[sel], ee[sel])
                if gi.size:
                    parts_d.append(term_docids[ti][gi])
                    parts_c.append(term_contrib[ti][gi])
            if not parts_d:
                continue
            docs_u = np.unique(np.concatenate(parts_d))
            scores_u = np.zeros(docs_u.size, dtype=np.float64)
            # same ascending-term scatter-add order (reduceat would
            # pairwise-sum docs with >= 8 terms and drift by an ulp)
            for pd_, pc_ in zip(parts_d, parts_c):
                scores_u[np.searchsorted(docs_u, pd_)] += pc_
        top = _topk_exact(
            np.concatenate([best_scores, scores_u]),
            np.concatenate([best_docs, docs_u]),
            k,
        )
        best_scores = np.array([s for s, _ in top], dtype=np.float64)
        best_docs = np.array([dd for _, dd in top], dtype=np.int64)
        if best_scores.size == k:
            theta = float(best_scores[-1])
    return [(float(s), int(dd)) for s, dd in zip(best_scores, best_docs)]


def _wand_collect(reader, sids, terms_sorted, idfs):
    # per-reader pack cache: idf is a global-stats constant per term, so
    # (docids, idf*w, block arrays) are query-invariant — rebuild once per
    # (reader, sids, term), not once per query (same precedent as the
    # reader's _term_arrays cache; actors are single-threaded)
    cache = getattr(reader, "_wand_packs", None)
    if cache is None:
        cache = reader._wand_packs = {}
    elif len(cache) > 200_000:  # bound long-running serving actors
        cache.clear()
    packs = []
    key_sids = tuple(sids)
    for t in terms_sorted:  # ascending-term order everywhere (pinned)
        key = (key_sids, t)
        if key in cache:
            p = cache[key]
        else:
            p = _wand_term_pack(reader, sids, t, idfs[t], reader.avgdl)
            cache[key] = p
        if p is not None:
            packs.append(p)
    if not packs:
        return [], [], [], [], []
    return tuple(list(x) for x in zip(*packs))


def score_segment_wand(
    reader: IndexReader, sid: int, terms_sorted: list[str], idfs: dict[str, float], k: int
) -> list[tuple[float, int]]:
    """Q2: vectorized block-max WAND over ONE segment (the fan-out /
    parity unit) — identical output to :func:`score_segment_taat`."""
    return _wand_sweep(*_wand_collect(reader, [sid], terms_sorted, idfs), k)


def score_all_wand(
    reader,
    seg_ids: list[int],
    terms_sorted: list[str],
    idfs: dict[str, float],
    k: int,
) -> list[tuple[float, int]]:
    """Q2+Q4 fused: block-max WAND over MANY segments in ONE interval
    sweep (per-term arrays and C3 block metadata concatenate validly in
    ascending-sid order — the same merge :func:`build_shared_index`
    performs).  Identical output to :func:`score_all_taat`; this is the
    serving-shape WAND — per-query cost is one sweep, not one per
    segment."""
    return _wand_sweep(*_wand_collect(reader, seg_ids, terms_sorted, idfs), k)


def merge_topk(parts: list[list[tuple[float, int]]], k: int) -> list[tuple[float, int]]:
    """Q4: per-segment top-k -> global top-k, ties (-score, doc_id)."""
    allp = [p for part in parts for p in part]
    allp.sort(key=lambda kv: (-kv[0], kv[1]))
    return allp[:k]


# ------------------------------------------------------------ Ray stages

class SearcherActor:
    """Actor-pool stage: batch of queries -> top-k results rows.

    State (index reader + caches) loads once per actor in ``__init__``.
    """

    def __init__(self, index_dir: str = "", k: int = 10, mode: str = "taat",
                 seg_ids: Optional[list[int]] = None, preload: bool = False,
                 index_ref=None, syn_map: Optional[dict] = None,
                 group_ref=None, group_dir: Optional[str] = None,
                 decay_origin: float = 0.0, decay_scale: float = 1.0,
                 hist_interval: float = 10.0, at: Optional[int] = None,
                 feature_dir: Optional[str] = None, rf_boost: float = 2.0,
                 rf_pivot: float = 1.0):
        if index_ref is not None:
            import ray as _ray

            shared = _ray.get(index_ref) if isinstance(index_ref, _ray.ObjectRef) else index_ref
            self.reader = SharedIndexReader(shared)
        else:
            self.reader = IndexReader(index_dir, preload=preload, at=at)
        self.k = k
        self.mode = mode
        # term -> extra members; the group a query term scores as is
        # [term] + syn_map.get(term, []) (Lucene analyzer-graph shape)
        self.syn_map = syn_map or {}
        # collapse mode: doc_id -> group code array + code -> name list,
        # resolved once per actor (ray.put'd by the caller)
        self.group_codes = self.group_names = None
        if group_ref is not None:
            import ray as _ray

            grp = _ray.get(group_ref) if isinstance(group_ref, _ray.ObjectRef) else group_ref
            self.group_codes, self.group_names = grp["codes"], grp["names"]
        elif group_dir is not None:
            # at-scale route: doc-range-partitioned sidecar, bucket files
            # load lazily per actor (stages/collapse_map.py) — same codes
            # and names as the broadcast array, never a driver-sized map
            from .collapse_map import CollapseMap

            self.group_codes = CollapseMap(group_dir)
            self.group_names = self.group_codes.names
        self.decay_origin = decay_origin
        self.decay_scale = decay_scale
        self.hist_interval = hist_interval
        # rank_feature mode: the float doc-value sidecar loads its
        # bucket files lazily per actor (stages/features.py)
        self.feature_map = None
        if feature_dir is not None:
            from .features import FeatureMap

            self.feature_map = FeatureMap(feature_dir)
        self.rf_boost = rf_boost
        self.rf_pivot = rf_pivot
        self.seg_ids = seg_ids if seg_ids is not None else self.reader.seg_ids

    def _score_query(self, terms: list[str], idfs: dict[str, float],
                     seg_ids: list[int], after=None):
        if after is not None and self.mode not in ("taat", "lmd"):
            raise ValueError(
                f"search_after cursors are supported for taat/lmd, not {self.mode}"
            )
        if self.mode == "tfidf":
            # DrQA diagnostic route: duplicate query terms matter
            return score_all_tfidf(self.reader, seg_ids, terms, self.k)
        uniq = sorted(set(terms))
        if self.mode == "synonym":
            groups = [[t] + list(self.syn_map.get(t, [])) for t in uniq]
            return score_all_syn(self.reader, seg_ids, groups, self.k)
        if self.mode == "lmd":
            return score_all_lmd(self.reader, seg_ids, uniq, self._cfs,
                                 self.k, after=after)
        if self.mode in ("dfr", "spl", "dfi", "lmjm", "f2exp", "pl2",
                         "dph"):
            return score_all_simfam(self.reader, seg_ids, uniq, self.mode,
                                    self._dfs, self._cfs, self.k)
        if self.mode == "saat":
            top, _done, _total = score_all_saat(
                self.reader, seg_ids, uniq, idfs, self.k
            )
            # integer impacts ride the float score column exactly
            return [(float(s), d) for s, d in top]
        if self.mode == "collapse":
            if self.group_codes is None:
                raise ValueError(
                    "mode='collapse' needs group_ref={'codes': ..., "
                    "'names': ...} or group_dir=<collapse sidecar path>"
                )
            return score_all_collapse(self.reader, seg_ids, uniq, idfs,
                                      self.k, self.group_codes)
        if self.mode == "sortfield":
            return score_all_sortfield(self.reader, seg_ids, uniq, self.k)
        if self.mode == "fvf":
            return score_all_fvf(self.reader, seg_ids, uniq, idfs, self.k)
        if self.mode == "rank_feature":
            if self.feature_map is None:
                raise ValueError(
                    "mode='rank_feature' needs feature_dir=<feature "
                    "sidecar path> (stages/features.build_feature_map)"
                )
            return score_all_rank_feature(
                self.reader, seg_ids, uniq, idfs, self.k,
                self.feature_map, boost=self.rf_boost, pivot=self.rf_pivot,
            )
        if self.mode == "decay":
            return score_all_fvf(
                self.reader, seg_ids, uniq, idfs, self.k,
                modifier="gauss", origin=self.decay_origin,
                scale=self.decay_scale,
            )
        if self.mode == "range_filter":
            # filter context: decay_origin/decay_scale carry the
            # inclusive [min, max] doc-value bounds
            return score_all_fvf(
                self.reader, seg_ids, uniq, idfs, self.k,
                modifier="range", origin=self.decay_origin,
                scale=self.decay_scale,
            )
        if self.mode == "taat":
            return score_all_taat(self.reader, seg_ids, uniq, idfs, self.k,
                                  after=after)
        if self.mode == "bm25plus":
            return score_all_taat(self.reader, seg_ids, uniq, idfs, self.k,
                                  delta=BM25PLUS_DELTA)
        if self.mode == "auto":
            # per-query planner (pruning-only: WAND ≡ TAAT, tested, so
            # this is purely a cost decision).  WAND pays off when ONE
            # list dominates the work (rare terms raise the threshold
            # fast, the long list gets block-skipped) AND the absolute
            # work is large enough that TAAT's dense scatter beats the
            # sweep's fixed cost — thresholds from BENCH_NOTES.md r03
            # (selective mix: WAND 2.4-3.2x faster at 1.4M docs, 1.7x
            # slower at 45k docs; mixed Zipf: roughly even).
            ds = [self._dfs.get(t, 0) for t in uniq]
            dsum, dmax = sum(ds), max(ds, default=0)
            if dsum >= AUTO_WAND_MIN_POSTINGS and dmax >= 4 * (dsum - dmax):
                return score_all_wand(self.reader, seg_ids, uniq, idfs, self.k)
            return score_all_taat(self.reader, seg_ids, uniq, idfs, self.k)
        return score_all_wand(self.reader, seg_ids, uniq, idfs, self.k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["query_id"].to_pylist()
        terms_col = batch["terms"].to_pylist()
        all_terms = sorted({t for ts in terms_col for t in ts})
        if self.mode == "synonym":
            all_terms = sorted(
                set(all_terms)
                | {m for t in all_terms for m in self.syn_map.get(t, [])}
            )
        if self.mode == "boosting":
            # the negative clause's postings must be loaded too (its
            # docid unions drive the demotion mask)
            all_terms = sorted(
                set(all_terms)
                | {t for ts in batch["neg_terms"].to_pylist() for t in ts}
            )
        if self.mode == "bool_prefix":
            # the prefix clause's expanded terms drive the constant-score
            # bonus union — their postings load with the full terms
            all_terms = sorted(
                set(all_terms)
                | {t for ts in batch["bonus_terms"].to_pylist() for t in ts}
            )
        dfs = self.reader.dfs(all_terms)
        idfs = {t: self.reader.idf(t) for t in all_terms}
        self._dfs = dfs
        self._cfs = (
            self.reader.cfs(all_terms)
            if self.mode in ("lmd", "dfi", "lmjm", "pl2", "dph")
            else {}
        )
        present = [t for t in all_terms if dfs[t] > 0]
        for sid in self.seg_ids:
            self.reader.load_postings(sid, present)
        # optional search-after cursor columns (pagination)
        if "after_score" in batch.column_names:
            afters = list(
                zip(
                    batch["after_score"].to_pylist(),
                    batch["after_doc"].to_pylist(),
                )
            )
        else:
            afters = [None] * len(qids)
        if self.mode == "count":
            # total-hit counting (the Lucene TotalHitCountCollector
            # shape): no scoring, no heap — per query, the union size of
            # the matched posting lists minus deletes.  Queries with 0
            # hits emit no row (the SQL-join semantics).
            out_q, out_n = [], []
            for qid, terms in zip(qids, terms_col):
                parts = [
                    arrs[0]
                    for t in sorted(set(terms))
                    if (arrs := self.reader.term_arrays(self.seg_ids, t))
                    is not None
                ]
                if not parts:
                    continue
                hits = np.unique(np.concatenate(parts))
                if self.reader.deleted.size:
                    from .deletes import live_mask

                    hits = hits[live_mask(hits, self.reader.deleted)]
                if hits.size:
                    out_q.append(qid)
                    out_n.append(int(hits.size))
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "n_hits": pa.array(out_n, pa.int64()),
                }
            )
        if self.mode == "cardinality":
            # ES ``cardinality`` aggregation over the MATCH SET (not the
            # top-k): distinct group values (doc-value sidecar or
            # broadcast code array — same codes either way) among all
            # docs matching >= 1 query term, next to the total-hit count.
            out_q, out_n, out_c = [], [], []
            for qid, terms in zip(qids, terms_col):
                parts = [
                    arrs[0]
                    for t in sorted(set(terms))
                    if (arrs := self.reader.term_arrays(self.seg_ids, t))
                    is not None
                ]
                if not parts:
                    continue
                hits = np.unique(np.concatenate(parts))
                if self.reader.deleted.size:
                    from .deletes import live_mask

                    hits = hits[live_mask(hits, self.reader.deleted)]
                if hits.size:
                    codes = np.asarray(self.group_codes[hits])
                    out_q.append(qid)
                    out_n.append(int(hits.size))
                    out_c.append(int(np.unique(codes).size))
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "n_hits": pa.array(out_n, pa.int64()),
                    "n_sources": pa.array(out_c, pa.int64()),
                }
            )
        if self.mode == "histogram":
            # ES ``histogram`` aggregation over the MATCH SET (not the
            # top-k): every doc matching >= 1 query term lands in the
            # fixed-interval bucket of its doc-length doc-value
            # (floor(dl / interval) * interval — the Elasticsearch key
            # rule).  dl rides in every posting, so the aggregation
            # costs no doc-store lookup; one unique + one bincount per
            # query, fully vectorized.
            interval = float(self.hist_interval)
            out_q, out_b, out_n = [], [], []
            for qid, terms in zip(qids, terms_col):
                parts = [
                    a
                    for t in sorted(set(terms))
                    if (a := self.reader.term_tf_dl(self.seg_ids, t))
                    is not None
                ]
                if not parts:
                    continue
                docids = np.concatenate([p[0] for p in parts])
                dls = np.concatenate([p[2] for p in parts])
                docids, first = np.unique(docids, return_index=True)
                dls = dls[first]
                if self.reader.deleted.size:
                    from .deletes import live_mask

                    m = live_mask(docids, self.reader.deleted)
                    docids, dls = docids[m], dls[m]
                if not docids.size:
                    continue
                keys = (
                    np.floor(dls.astype(np.float64) / interval) * interval
                ).astype(np.int64)
                uk, counts = np.unique(keys, return_counts=True)
                out_q.extend([qid] * uk.size)
                out_b.extend(int(x) for x in uk)
                out_n.extend(int(c) for c in counts)
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "bucket": pa.array(out_b, pa.int64()),
                    "n": pa.array(out_n, pa.int64()),
                }
            )
        if self.mode == "collapse":
            if any(a is not None for a in afters):
                raise ValueError(
                    "search_after cursors are supported for taat/lmd, not collapse"
                )
            out_q, out_r, out_g, out_d, out_s = [], [], [], [], []
            for qid, terms in zip(qids, terms_col):
                top = self._score_query(terms, idfs, self.seg_ids)
                for rank, (score, doc_id, gc) in enumerate(top, 1):
                    out_q.append(qid)
                    out_r.append(rank)
                    out_g.append(self.group_names[gc])
                    out_d.append(doc_id)
                    out_s.append(score)
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "rank": pa.array(out_r, pa.int32()),
                    "source": pa.array(out_g, pa.string()),
                    "doc_id": pa.array(out_d, pa.int64()),
                    "score": pa.array(out_s, pa.float64()),
                }
            )
        if self.mode == "bool_prefix":
            bons_col = batch["bonus_terms"].to_pylist()
            out_q, out_r, out_d, out_s = [], [], [], []
            for qid, terms, bons in zip(qids, terms_col, bons_col):
                top = score_all_bool_prefix(
                    self.reader, self.seg_ids, sorted(set(terms)),
                    sorted(set(bons)), idfs, self.k,
                )
                for rank, (score, doc_id) in enumerate(top, 1):
                    out_q.append(qid)
                    out_r.append(rank)
                    out_d.append(doc_id)
                    out_s.append(score)
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "rank": pa.array(out_r, pa.int32()),
                    "doc_id": pa.array(out_d, pa.int64()),
                    "score": pa.array(out_s, pa.float64()),
                }
            )
        if self.mode == "boosting":
            negs_col = batch["neg_terms"].to_pylist()
            out_q, out_r, out_d, out_s = [], [], [], []
            for qid, terms, negs in zip(qids, terms_col, negs_col):
                top = score_all_boosting(
                    self.reader, self.seg_ids, sorted(set(terms)),
                    sorted(set(negs)), idfs, self.k,
                )
                for rank, (score, doc_id) in enumerate(top, 1):
                    out_q.append(qid)
                    out_r.append(rank)
                    out_d.append(doc_id)
                    out_s.append(score)
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "rank": pa.array(out_r, pa.int32()),
                    "doc_id": pa.array(out_d, pa.int64()),
                    "score": pa.array(out_s, pa.float64()),
                }
            )
        out_q, out_r, out_d, out_s = [], [], [], []
        for qid, terms, after in zip(qids, terms_col, afters):
            top = self._score_query(terms, idfs, self.seg_ids, after=after)
            for rank, (score, doc_id) in enumerate(top, 1):
                out_q.append(qid)
                out_r.append(rank)
                out_d.append(doc_id)
                out_s.append(score)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "rank": pa.array(out_r, pa.int32()),
                "doc_id": pa.array(out_d, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def federated_stats(index_dirs: list[str]) -> tuple[int, float, int]:
    """Combined collection stats over independently built shard indexes:
    n_docs and total_len are exact integer sums of the shards'
    collection.json values, avgdl their float64 quotient — bit-identical
    to the stats a single build over the union corpus writes."""
    import json as _json

    n = total = 0
    for d in index_dirs:
        with open(os.path.join(d, "stats", "collection.json")) as f:
            coll = _json.load(f)
        n += int(coll["n_docs"])
        total += int(
            coll.get("total_len", round(coll["n_docs"] * coll["avgdl"]))
        )
    return n, total / n, total


class FederatedSearcherActor:
    """Actor-pool stage for federated / cross-cluster search (the Lucene
    MultiReader shape): several indexes built INDEPENDENTLY over disjoint
    doc-id shards serve one query stream, ranked with COMBINED global
    stats — df summed across shards, avgdl from the summed lengths — so
    results are bit-identical to one unified index over the union corpus
    (tested + the entry's oracle IS the single-index exact-BM25 SQL).

    This is the serving half of shard-parallel ingest: each data shard
    builds its index with zero cross-shard coordination (the build never
    shuffles postings anyway), and federation recovers exact global
    ranking at query time.  Per query each shard scores with the exact
    fused TAAT and the shard top-ks merge (disjoint doc ranges)."""

    def __init__(self, index_dirs: list[str], k: int = 10):
        stats = federated_stats(index_dirs)
        self.readers = [
            IndexReader(d, stats_override=stats) for d in index_dirs
        ]
        self.n_docs = stats[0]
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import math

        qids = batch["query_id"].to_pylist()
        terms_col = batch["terms"].to_pylist()
        all_terms = sorted({t for ts in terms_col for t in ts})
        # combined df = sum of shard dfs (disjoint doc shards)
        dfs = {t: 0 for t in all_terms}
        for r in self.readers:
            for t, v in r.dfs(all_terms).items():
                dfs[t] += v
        idfs = {
            t: math.log(
                1.0 + (self.n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5)
            )
            for t in all_terms
        }
        present = [t for t in all_terms if dfs[t] > 0]
        for r in self.readers:
            for sid in r.seg_ids:
                r.load_postings(sid, present)
        out_q, out_r, out_d, out_s = [], [], [], []
        for qid, terms in zip(qids, terms_col):
            uniq = sorted(set(terms))
            parts = [
                score_all_taat(r, r.seg_ids, uniq, idfs, self.k)
                for r in self.readers
            ]
            for rank, (score, doc_id) in enumerate(merge_topk(parts, self.k), 1):
                out_q.append(qid)
                out_r.append(rank)
                out_d.append(doc_id)
                out_s.append(score)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "rank": pa.array(out_r, pa.int32()),
                "doc_id": pa.array(out_d, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def federated_search(
    index_dirs: list[str],
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """Federated query pipeline over shard indexes: (query_id, terms) ->
    (query_id, rank, doc_id, score); see :class:`FederatedSearcherActor`."""
    return queries.map_batches(
        FederatedSearcherActor,
        fn_constructor_kwargs={"index_dirs": list(index_dirs), "k": k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


class BoostedSearcherActor:
    """Actor-pool stage for query-time term boosts (Lucene BoostQuery):
    batch of (query_id, terms:list<string>, boosts:list<double>) ->
    (query_id, rank, doc_id, score) with
    ``score = sum_t boost_t * idf_t * w(t, d)``.

    Implementation is a reduction to the exact fused TAAT scorer: a
    boost multiplies a term's entire contribution, so boosted scoring
    IS :func:`score_all_taat` run with the per-query idf map scaled by
    the boosts — no new accumulation code, and boost=1 queries are
    bit-identical to plain BM25 (tested).  Duplicate terms in one query
    SUM their boosts (Lucene duplicate-clause semantics; matches the
    SQL oracle, which sums one contribution per (term, boost) row)."""

    def __init__(self, index_dir: str, k: int = 10):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.seg_ids = self.reader.seg_ids

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["query_id"].to_pylist()
        terms_col = batch["terms"].to_pylist()
        boosts_col = batch["boosts"].to_pylist()
        all_terms = sorted({t for ts in terms_col for t in ts})
        dfs = self.reader.dfs(all_terms)
        present = [t for t in all_terms if dfs[t] > 0]
        for sid in self.seg_ids:
            self.reader.load_postings(sid, present)
        out_q, out_r, out_d, out_s = [], [], [], []
        for qid, terms, boosts in zip(qids, terms_col, boosts_col):
            if len(terms) != len(boosts):
                raise ValueError(
                    f"query {qid}: terms and boosts length mismatch"
                )
            bmap: dict[str, float] = {}
            for t, b in zip(terms, boosts):
                bmap[t] = bmap.get(t, 0.0) + float(b)
            uniq = sorted(bmap)
            idfs = {t: bmap[t] * self.reader.idf(t) for t in uniq}
            top = score_all_taat(self.reader, self.seg_ids, uniq, idfs, self.k)
            for rank, (score, doc_id) in enumerate(top, 1):
                out_q.append(qid)
                out_r.append(rank)
                out_d.append(doc_id)
                out_s.append(score)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "rank": pa.array(out_r, pa.int32()),
                "doc_id": pa.array(out_d, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def boosted_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """Boosted-term query pipeline: (query_id, terms, boosts) ->
    (query_id, rank, doc_id, score); see :class:`BoostedSearcherActor`."""
    return queries.map_batches(
        BoostedSearcherActor,
        fn_constructor_kwargs={"index_dir": index_dir, "k": k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


def tokenize_queries(ds: "ray.data.Dataset", text_col: str = "claim") -> "ray.data.Dataset":
    """(query_id, <text_col>) -> (query_id, terms:list<string>)."""

    def tok(batch: pa.Table) -> pa.Table:
        terms = tokenize_column(batch[text_col])
        return pa.table({"query_id": batch["query_id"], "terms": terms})

    return ds.map_batches(tok, batch_format="pyarrow")


def search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    mode: str = "taat",
    concurrency: int = 4,
    batch_size: int = 256,
    preload: bool = False,
    shared: bool = False,
    shared_ref=None,
    syn_map: Optional[dict] = None,
    group_ref=None,
    group_dir: Optional[str] = None,
    decay_origin: float = 0.0,
    decay_scale: float = 1.0,
    hist_interval: float = 10.0,
    at: Optional[int] = None,
    feature_dir: Optional[str] = None,
    rf_boost: float = 2.0,
    rf_pivot: float = 1.0,
) -> "ray.data.Dataset":
    """Main query pipeline: queries (query_id, terms) -> results
    (query_id, rank, doc_id, score).

    ``at``: a :func:`sources.manifest.manifest_version` token — serve a
    point-in-time snapshot (the segment set live at that version, with
    collection/term stats re-derived from the pinned segments), so
    readers are isolated from concurrent appends; a compaction that
    retires (and GCs) a pinned segment invalidates the snapshot with a
    clear error.  Incompatible with ``shared`` (the shared pack is
    decoded from the CURRENT live set).

    ``shared=True``: decode the index once on the driver, ``ray.put`` the
    arrays, actors read them zero-copy — per-actor startup drops from a
    full segment decode to an object-store get.  Pass ``shared_ref`` (a
    ``ray.put`` ref of :func:`build_shared_index` output) to reuse one
    decoded index across several search calls (and to time decode and
    serve separately — bench protocol)."""
    import ray as _ray

    ctor: dict = {"k": k, "mode": mode}
    if mode in ("decay", "range_filter"):
        ctor["decay_origin"] = decay_origin
        ctor["decay_scale"] = decay_scale
    if mode == "histogram":
        ctor["hist_interval"] = hist_interval
    if mode == "rank_feature":
        ctor["feature_dir"] = feature_dir
        ctor["rf_boost"] = rf_boost
        ctor["rf_pivot"] = rf_pivot
    if syn_map is not None:
        ctor["syn_map"] = syn_map
    if group_ref is not None:
        ctor["group_ref"] = group_ref
    if group_dir is not None:
        ctor["group_dir"] = group_dir
    if at is not None and (shared or shared_ref is not None):
        raise ValueError("snapshot reads (at=) require per-actor readers, "
                         "not a shared decoded pack")
    if shared_ref is not None:
        ctor["index_ref"] = shared_ref
    elif shared:
        ctor["index_ref"] = _ray.put(build_shared_index(index_dir))
    else:
        ctor.update({"index_dir": index_dir, "preload": preload})
        if at is not None:
            ctor["at"] = at
    return queries.map_batches(
        SearcherActor,
        fn_constructor_kwargs=ctor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


def search_fanout(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    mode: str = "taat",
    concurrency: int = 4,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """Cluster-shape variant (Q4 explicit): expand to (query x segment)
    pairs, score per pair on the actor pool, merge per query with a small
    groupby.  Result-identical to :func:`search` (tested)."""
    index_dir = mf.resolve_alias(index_dir)
    seg_ids = mf.live_segment_order(mf.read_manifest(index_dir))

    def expand(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        reps = pa.array(np.repeat(np.arange(n), len(seg_ids)))
        sids = pa.array(np.tile(np.array(seg_ids, dtype=np.int64), n))
        taken = batch.take(reps)
        return taken.append_column("sid", sids)

    pairs = queries.map_batches(expand, batch_format="pyarrow")

    class SegSearcher(SearcherActor):
        def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
            all_terms = sorted({t for ts in batch["terms"].to_pylist() for t in ts})
            dfs = self.reader.dfs(all_terms)
            idfs = {t: self.reader.idf(t) for t in all_terms}
            # stat-dependent modes (auto/lmd/dfr/spl/dfi) read these off
            # the actor; the reader spans the WHOLE index, so df/cf/N/T
            # are global and per-segment scoring + merge stays exact for
            # every additive per-term model
            self._dfs = dfs
            self._cfs = (
                self.reader.cfs(all_terms)
                if self.mode in ("lmd", "dfi", "lmjm", "pl2", "dph")
                else {}
            )
            out_q, out_d, out_s = [], [], []
            for qid, terms, sid in zip(
                batch["query_id"].to_pylist(),
                batch["terms"].to_pylist(),
                batch["sid"].to_pylist(),
            ):
                top = self._score_query(terms, idfs, [int(sid)])
                for score, doc_id in top:
                    out_q.append(qid)
                    out_d.append(doc_id)
                    out_s.append(score)
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "doc_id": pa.array(out_d, pa.int64()),
                    "score": pa.array(out_s, pa.float64()),
                }
            )

    per_seg = pairs.map_batches(
        SegSearcher,
        fn_constructor_kwargs={"index_dir": index_dir, "k": k, "mode": mode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )

    def merge(group: pa.Table) -> pa.Table:
        idx = np.lexsort(
            (group["doc_id"].to_numpy(), -group["score"].to_numpy())
        )[:k]
        g = group.take(pa.array(idx))
        return g.append_column(
            "rank", pa.array(np.arange(1, len(idx) + 1, dtype=np.int32))
        )

    return per_seg.groupby("query_id").map_groups(merge, batch_format="pyarrow")


# ------------------------------------------------- explain (score breakdown)


class ExplainActor:
    """Lucene ``explain()`` shape: for each query's rounded-top-k docs,
    one row per (doc, matching term) with that term's exact BM25
    contribution — ``idf(t) * w(t, d)``, the very addends the TAAT
    accumulator sums.  State (reader) loads once per actor."""

    def __init__(self, index_dir: str = "", k: int = 10):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.seg_ids = self.reader.seg_ids

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["query_id"].to_pylist()
        terms_col = batch["terms"].to_pylist()
        all_terms = sorted({t for ts in terms_col for t in ts})
        dfs = self.reader.dfs(all_terms)
        idfs = {t: self.reader.idf(t) for t in all_terms}
        present = [t for t in all_terms if dfs[t] > 0]
        for sid in self.seg_ids:
            self.reader.load_postings(sid, present)
        out_q, out_d, out_t, out_c = [], [], [], []
        for qid, terms in zip(qids, terms_col):
            uniq = sorted(set(terms))
            # top-k under the pinned cross-engine policy: round(score, 6)
            # DESC, doc_id ASC — fetch extra then re-rank, same rule as
            # the oracle's row_number
            hits = score_all_taat(
                self.reader, self.seg_ids, uniq, idfs, max(self.k * 2, 20)
            )
            if not hits:
                continue
            hs = np.round(np.array([s for s, _ in hits]), 6)
            hd = np.array([d for _, d in hits], dtype=np.int64)
            order = np.lexsort((hd, -hs))[: self.k]
            top_ids = hd[order]
            sorted_top = np.sort(top_ids)
            for t in uniq:
                arrs = self.reader.term_arrays(self.seg_ids, t)
                if arrs is None:
                    continue
                docids, w = arrs
                pos = np.searchsorted(docids, sorted_top)
                pos = np.clip(pos, 0, docids.size - 1)
                m = docids[pos] == sorted_top
                if not m.any():
                    continue
                contrib = np.round(idfs[t] * w[pos[m]], 6)
                n = int(m.sum())
                out_q.append(np.full(n, qid, dtype=np.int64))
                out_d.append(sorted_top[m])
                out_t.extend([t] * n)
                out_c.append(contrib)
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "contribution": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                "term": pa.array(out_t, pa.string()),
                "contribution": pa.array(np.concatenate(out_c), pa.float64()),
            }
        )


def explain_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    concurrency: int = 2,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """Per-hit score breakdown: (query_id, doc_id, term, contribution)
    for every (rounded-top-k doc, matching query term).  Summing
    ``contribution`` per (query_id, doc_id) reproduces the rounded
    ``search()`` score (tested); the SQL oracle computes the identical
    per-term addends independently."""
    return queries.map_batches(
        ExplainActor,
        fn_constructor_kwargs={"index_dir": index_dir, "k": k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


class CachedSearcherActor(SearcherActor):
    """SearcherActor with an Elasticsearch-style request cache: per-actor
    LRU keyed by ``(cache epoch, mode, k, query terms, cursor)`` where
    the epoch is (manifest version, deletes fingerprint) captured at
    reader construction — the same token ES keys its request cache on
    (shard + reader version), so an index mutation (append/compact/
    delete) starts a fresh epoch and can never serve stale rows; the
    reader itself is frozen at init, making every cached entry exactly
    reproducible by the live path (pytest-asserted bit-equal).  ``hits``
    / ``misses`` counters are the test evidence."""

    def __init__(self, *args, cache_size: int = 10_000, **kwargs):
        super().__init__(*args, **kwargs)
        from collections import OrderedDict

        d = self.reader.deleted
        self._epoch = (
            mf.manifest_version(self.reader.index_dir)
            if getattr(self.reader, "index_dir", None) else 0,
            int(d.size),
            int(d.sum()) if d.size else 0,
        )
        self._qcache: "OrderedDict" = OrderedDict()
        self._cache_size = cache_size
        self.hits = 0
        self.misses = 0

    def _score_query(self, terms, idfs, seg_ids, after=None):
        key = (self._epoch, self.mode, self.k, tuple(terms), after)
        hit = self._qcache.get(key)
        if hit is not None:
            self._qcache.move_to_end(key)
            self.hits += 1
            return hit
        self.misses += 1
        out = super()._score_query(terms, idfs, seg_ids, after=after)
        self._qcache[key] = out
        if len(self._qcache) > self._cache_size:
            self._qcache.popitem(last=False)
        return out


def cached_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    mode: str = "taat",
    concurrency: int = 4,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """``search()`` through the request-cache actor (see
    :class:`CachedSearcherActor`); results are bit-identical to the
    uncached route on every pass."""
    return queries.map_batches(
        CachedSearcherActor,
        fn_constructor_kwargs={"index_dir": index_dir, "k": k, "mode": mode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )
