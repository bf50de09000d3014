"""Stored impact-ordered posting layout + anytime SAAT serving
(fulltext_index tier; the model is the quantized impact-sorted indexes
of Anh & Moffat, SIGIR 2005 and the JASS anytime engine of Lin &
Trotman, ICTIR 2015 — the layout that lets a query STOP after a
postings budget because the highest-scoring evidence is physically
first).

Two build passes over the finished segment index, both streamed
``map_batches`` over the term dictionary (``stats/term_df``) with an
actor-held :class:`~.search.IndexReader` doing the same ``term IN``
row-group-pruned point reads the searcher actors use:

1. *scale pass* — per dictionary batch, ``max(idf(t) * w(t, d))``; one
   tiny per-batch row; the driver max is the BUILD-TIME GLOBAL ``wmax``
   (persisted in ``meta.json``).  Query-time and stored impacts agree
   exactly because both quantize against this one stored scale —
   unlike the per-query scale of the ``saat_topk`` entry, a stored
   layout must pin its scale once.
2. *quantize pass* — per term, ``impact = floor(c / wmax * 255) + 1``,
   postings grouped by impact value into ``(term, impact,
   docids list<int64>)`` rows (docids ascending within a group — the
   pinned tie order), written as hive-partitioned parquet bucketed by
   term hash (``bucket = fnv64(term) % 64``) so a query's serving
   actor reads ONLY its terms' buckets with a ``term IN`` filter —
   the trgm/ANN sidecar access pattern.

Serving (:func:`saat_stored_search`) is an ordinary actor-pool
``map_batches``: flatten the terms' impact groups, process in
decreasing-impact order (ties: doc ascending, then ascending-term
order — bit-identical to ``search.score_all_saat``) under
``budget_frac``, accumulate INTEGER scores, top-k on (score DESC,
doc_id).  Equivalence to the in-memory kernel at the same ``wmax`` is
pytest-enforced.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..functions.hashing import hash_str_array
from .search import IndexReader
from .util import pool_size

__all__ = [
    "build_impact_index",
    "saat_stored_search",
    "IMPACT_VERSION",
    "N_BINS",
    "N_BUCKETS",
]

IMPACT_VERSION = "impact-v2"
N_BINS = 255
N_BUCKETS = 64


def _meta_path(out_dir: str) -> str:
    return os.path.join(out_dir, "meta.json")


def _source_fingerprint(index_dir: str) -> str:
    """Cheap staleness signal (the trgm fix shape, ADVICE r03):
    append/compact/expunge rewrite ``stats/term_df``, so its sorted
    (name, size, mtime_ns) plus IMPACT_VERSION changes on any index
    mutation — a stale fingerprint forces a rebuild instead of serving
    impacts that predate newly ingested postings."""
    root = os.path.join(index_dir, "stats", "term_df")
    entries = []
    if os.path.isfile(root):
        st = os.stat(root)
        entries.append((os.path.basename(root), st.st_size, st.st_mtime_ns))
    else:
        for dirpath, _, names in os.walk(root):
            for n in sorted(names):
                if n.startswith("_") or n.startswith("."):
                    continue
                st = os.stat(os.path.join(dirpath, n))
                rel = os.path.relpath(os.path.join(dirpath, n), root)
                entries.append((rel, st.st_size, st.st_mtime_ns))
    entries.sort()
    return json.dumps({"version": IMPACT_VERSION, "files": entries})


class _TermPass:
    """Shared actor shape for both build passes: a reader opened once,
    per-batch ``load_postings`` for exactly the batch's terms."""

    def __init__(self, index_dir: str):
        self.reader = IndexReader(index_dir)
        self.seg_ids = self.reader.seg_ids

    def _arrays(self, term: str):
        return self.reader.term_arrays(self.seg_ids, term)

    def _load(self, terms: list[str]) -> None:
        # dfs() populates the df cache idf() reads — without it idf
        # silently evaluates at df = 0
        self.reader.dfs(terms)
        for sid in self.seg_ids:
            self.reader.load_postings(sid, terms)


class _ScalePass(_TermPass):
    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_pylist()
        self._load(terms)
        mx = 0.0
        for t in terms:
            arrs = self._arrays(t)
            if arrs is None or arrs[0].size == 0:
                continue
            mx = max(mx, float(self.reader.idf(t)) * float(arrs[1].max()))
        return pa.table({"wmax_p": pa.array([mx], pa.float64())})


class _QuantizePass(_TermPass):
    def __init__(self, index_dir: str, wmax: float):
        super().__init__(index_dir)
        self.wmax = wmax

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_pylist()
        self._load(terms)
        out_t, out_i, out_d = [], [], []
        for t in terms:
            arrs = self._arrays(t)
            if arrs is None or arrs[0].size == 0:
                continue
            docids, w = arrs
            c = self.reader.idf(t) * w
            imp = np.floor(c / self.wmax * N_BINS).astype(np.int64) + 1
            # group by impact, docids ascending inside each group
            # (docids are already ascending; a stable sort on -imp
            # keeps them so)
            order = np.argsort(-imp, kind="stable")
            simp = imp[order]
            sdoc = docids[order]
            change = np.empty(simp.size, dtype=bool)
            change[0] = True
            change[1:] = simp[1:] != simp[:-1]
            starts = np.flatnonzero(change)
            bounds = np.append(starts, simp.size)
            for i in range(starts.size):
                a, z = bounds[i], bounds[i + 1]
                out_t.append(t)
                out_i.append(int(simp[a]))
                out_d.append(sdoc[a:z].tolist())
            # group sizes ride as their own column so budgeted serving
            # can plan levels from a docids-free metadata read
        if not out_t:
            return pa.table({
                "term": pa.array([], pa.string()),
                "impact": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "docids": pa.array([], pa.list_(pa.int64())),
                "bucket": pa.array([], pa.int64()),
            })
        tcol = pa.array(out_t, pa.string())
        bucket = pa.array(
            (hash_str_array(tcol) % np.uint64(N_BUCKETS)).astype(np.int64)
        )
        return pa.table({
            "term": tcol,
            "impact": pa.array(out_i, pa.int64()),
            "n": pa.array([len(d) for d in out_d], pa.int64()),
            "docids": pa.array(out_d, pa.list_(pa.int64())),
            "bucket": bucket,
        })


def build_impact_index(
    index_dir: str, out_dir: str, *, concurrency: int = 4,
    batch_size: int = 512,
) -> float:
    """Build the stored impact layout from a finished segment index;
    idempotent (meta.json present -> returns the stored wmax).  Returns
    the build-time global ``wmax``."""
    fp = _source_fingerprint(index_dir)
    if os.path.exists(_meta_path(out_dir)):
        with open(_meta_path(out_dir), encoding="utf-8") as f:
            meta = json.load(f)
        if meta.get("fingerprint") == fp:
            return float(meta["wmax"])
        # the source index changed under us (append/compact): rebuild
        import shutil

        shutil.rmtree(out_dir)
    elif os.path.isdir(out_dir):
        # a crash between the directory rename and the meta write left
        # a meta-less layout: treat as absent (os.replace cannot land
        # on a non-empty target)
        import shutil

        shutil.rmtree(out_dir)
    dict_path = os.path.join(index_dir, "stats", "term_df")
    terms_ds = ray.data.read_parquet(dict_path, columns=["term"])
    scale = (
        terms_ds.map_batches(
            _ScalePass,
            fn_constructor_kwargs={"index_dir": index_dir},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=pool_size(concurrency),
            num_cpus=1,
        )
        .to_pandas()
    )
    wmax = float(scale["wmax_p"].max())
    if wmax <= 0.0:
        raise ValueError("empty index: no positive contribution found")
    rows = terms_ds.map_batches(
        _QuantizePass,
        fn_constructor_kwargs={"index_dir": index_dir, "wmax": wmax},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )
    tmp = out_dir + ".tmp"
    if os.path.isdir(tmp):  # crashed prior attempt: never mix files
        import shutil

        shutil.rmtree(tmp)
    rows.write_parquet(tmp, partition_cols=["bucket"])
    os.replace(tmp, out_dir)
    with open(_meta_path(out_dir), "w", encoding="utf-8") as f:
        json.dump(
            {"wmax": wmax, "n_bins": N_BINS, "n_buckets": N_BUCKETS,
             "version": IMPACT_VERSION, "source": os.path.abspath(index_dir),
             "fingerprint": fp},
            f,
        )
    return wmax


class SaatStoredActor:
    """Actor-pool stage: (query_id, terms) -> (query_id, rank, doc_id,
    score[int-valued float]) from the stored impact layout, under a
    postings budget."""

    def __init__(self, impact_dir: str, k: int = 10,
                 budget_frac: float = 1.0):
        with open(_meta_path(impact_dir), encoding="utf-8") as f:
            self.meta = json.load(f)
        self.dir = impact_dir
        self.k = k
        self.budget = budget_frac
        self.cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self.meta_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self.group_cache: dict[tuple[str, int], np.ndarray] = {}

    def _files_for(self, terms: list[str]) -> list[str]:
        tcol = pa.array(terms, pa.string())
        buckets = sorted(
            set(
                (hash_str_array(tcol) % np.uint64(N_BUCKETS))
                .astype(np.int64)
                .tolist()
            )
        )
        import glob as _glob

        files: list[str] = []
        for b in buckets:
            files.extend(sorted(_glob.glob(
                os.path.join(self.dir, f"bucket={b}", "*.parquet")
            )))
        return files

    def _term_postings(self, terms: list[str]):
        """Load (impacts, docids) flat arrays for each term, cached per
        actor; one filtered read over only the terms' hash buckets."""
        missing = [t for t in terms if t not in self.cache]
        if missing:
            files = self._files_for(missing)
            for t in missing:
                self.cache[t] = (
                    np.empty(0, np.int64), np.empty(0, np.int64)
                )
            if files:
                tbl = pq.ParquetDataset(
                    files, filters=[("term", "in", missing)]
                ).read(columns=["term", "impact", "docids"])
                for t in set(tbl["term"].to_pylist()):
                    sub = tbl.filter(pa.compute.equal(tbl["term"], t))
                    imp_g = sub["impact"].to_numpy()
                    lists = sub["docids"]
                    lens = np.asarray(
                        [len(lists[i]) for i in range(len(lists))],
                        dtype=np.int64,
                    )
                    flat = np.concatenate(
                        [np.asarray(lists[i].as_py(), dtype=np.int64)
                         for i in range(len(lists))]
                    ) if len(lists) else np.empty(0, np.int64)
                    self.cache[t] = (np.repeat(imp_g, lens), flat)
        return [self.cache[t] for t in terms]

    def _meta_for(self, terms: list[str]):
        """Per-term (impacts, group sizes) from the docids-free
        metadata columns, cached per actor."""
        missing = [t for t in terms if t not in self.meta_cache]
        if missing:
            for t in missing:
                self.meta_cache[t] = (
                    np.empty(0, np.int64), np.empty(0, np.int64)
                )
            files = self._files_for(missing)
            if files:
                meta = pq.ParquetDataset(
                    files, filters=[("term", "in", missing)]
                ).read(columns=["term", "impact", "n"])
                mt = meta["term"].to_pylist()
                mi = meta["impact"].to_numpy()
                mn = meta["n"].to_numpy()
                for t in set(mt):
                    mask = np.asarray([x == t for x in mt])
                    self.meta_cache[t] = (
                        mi[mask].astype(np.int64),
                        mn[mask].astype(np.int64),
                    )
        return [self.meta_cache[t] for t in terms]

    def _groups_for(self, needed: list[tuple[str, int]]):
        """docid arrays for specific (term, impact) groups, cached per
        actor; one filtered fetch for the missing ones."""
        miss = [k for k in needed if k not in self.group_cache]
        if miss:
            terms = sorted({t for t, _ in miss})
            min_imp = min(i for _, i in miss)
            files = self._files_for(terms)
            if files:
                tbl = pq.ParquetDataset(
                    files,
                    filters=[
                        ("term", "in", terms), ("impact", ">=", min_imp),
                    ],
                ).read(columns=["term", "impact", "docids"])
                g_terms = tbl["term"].to_pylist()
                g_imp = tbl["impact"].to_numpy()
                lists = tbl["docids"]
                for gi in range(tbl.num_rows):
                    key = (g_terms[gi], int(g_imp[gi]))
                    if key not in self.group_cache:
                        self.group_cache[key] = np.asarray(
                            lists[gi].as_py(), dtype=np.int64
                        )
            for k in miss:
                self.group_cache.setdefault(
                    k, np.empty(0, np.int64)
                )
        return [self.group_cache[k] for k in needed]

    def _prefix_select(self, terms: list[str]):
        """Budgeted two-phase read — the JASS scale path made literal:
        phase 1 plans which impact LEVELS the budget covers from the
        docids-free metadata (cached per actor); phase 2 fetches docid
        groups only down to the boundary level (group-cached).  Within
        the boundary level the partial slice takes the (doc,
        term-order) smallest postings — exactly ``score_all_saat``'s
        global (impact DESC, doc, tix) prefix, so this route is
        bit-equal to the kernel at the same budget and stored scale
        (tested).  Returns ``(docs, impacts)`` or None."""
        metas = self._meta_for(terms)
        m_i = np.concatenate([m[0] for m in metas]) if metas else \
            np.empty(0, np.int64)
        if m_i.size == 0:
            return None
        m_n = np.concatenate([m[1] for m in metas])
        total = int(m_n.sum())
        take = int(math.ceil(self.budget * total))
        levels = np.unique(m_i)[::-1]
        level_n = np.array(
            [int(m_n[m_i == lv].sum()) for lv in levels], dtype=np.int64
        )
        cum = np.cumsum(level_n)
        nfull = int(np.searchsorted(cum, take, side="right"))
        rem = take - (int(cum[nfull - 1]) if nfull else 0)
        if nfull >= levels.size:
            cut_level, rem = None, 0
            min_imp = int(levels[-1])
        elif rem > 0:
            cut_level = int(levels[nfull])
            min_imp = cut_level
        else:
            cut_level = None
            min_imp = int(levels[nfull - 1])
        needed: list[tuple[str, int]] = []
        kinds: list[tuple[int, int]] = []  # (tix, impact)
        for tix, (t, (mi, _mn)) in enumerate(zip(terms, metas)):
            for imp in mi[mi >= min_imp]:
                needed.append((t, int(imp)))
                kinds.append((tix, int(imp)))
        groups = self._groups_for(needed)
        f_d, f_i = [], []
        b_d, b_i, b_t = [], [], []
        for (tix, imp), docs_g in zip(kinds, groups):
            if cut_level is not None and imp == cut_level:
                b_d.append(docs_g)
                b_i.append(np.full(docs_g.size, imp, dtype=np.int64))
                b_t.append(np.full(docs_g.size, tix, dtype=np.int64))
            else:
                f_d.append(docs_g)
                f_i.append(np.full(docs_g.size, imp, dtype=np.int64))
        sel_d = [np.concatenate(f_d)] if f_d else []
        sel_i = [np.concatenate(f_i)] if f_i else []
        if rem > 0 and b_d:
            bd = np.concatenate(b_d)
            bi = np.concatenate(b_i)
            bt = np.concatenate(b_t)
            order = np.lexsort((bt, bd))[:rem]
            sel_d.append(bd[order])
            sel_i.append(bi[order])
        if not sel_d:
            return None
        return np.concatenate(sel_d), np.concatenate(sel_i)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_r, out_d, out_s = [], [], [], []
        for qid, terms in zip(
            batch["query_id"].to_pylist(), batch["terms"].to_pylist()
        ):
            uniq = sorted(set(terms))
            if self.budget < 1.0:
                sel = self._prefix_select(uniq)
                if sel is None:
                    continue
                sdocs, simp = sel
                uniq_d, inv = np.unique(sdocs, return_inverse=True)
                sums = np.zeros(uniq_d.size, dtype=np.int64)
                np.add.at(sums, inv, simp)
                top = np.lexsort((uniq_d, -sums))[: self.k]
                for rank, i in enumerate(top, 1):
                    out_q.append(qid)
                    out_r.append(rank)
                    out_d.append(int(uniq_d[i]))
                    out_s.append(float(sums[i]))
                continue
            packs = self._term_postings(uniq)
            per_i, per_d, per_t = [], [], []
            for tix, (imp, docs) in enumerate(packs):
                if imp.size:
                    per_i.append(imp)
                    per_d.append(docs)
                    per_t.append(np.full(imp.size, tix, dtype=np.int64))
            if not per_i:
                continue
            impacts = np.concatenate(per_i)
            docs = np.concatenate(per_d)
            tix = np.concatenate(per_t)
            total = impacts.size
            order = np.lexsort((tix, docs, -impacts))
            take = total if self.budget >= 1.0 else int(
                math.ceil(self.budget * total)
            )
            sel = order[:take]
            uniq_d, inv = np.unique(docs[sel], return_inverse=True)
            sums = np.zeros(uniq_d.size, dtype=np.int64)
            np.add.at(sums, inv, impacts[sel])
            top = np.lexsort((uniq_d, -sums))[: self.k]
            for rank, i in enumerate(top, 1):
                out_q.append(qid)
                out_r.append(rank)
                out_d.append(int(uniq_d[i]))
                out_s.append(float(sums[i]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int32()),
            "doc_id": pa.array(out_d, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })


def saat_stored_search(
    impact_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    budget_frac: float = 1.0,
    concurrency: int = 4,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """Anytime SAAT pipeline over the stored impact layout."""
    return queries.map_batches(
        SaatStoredActor,
        fn_constructor_kwargs={
            "impact_dir": impact_dir, "k": k, "budget_frac": budget_frac,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )
