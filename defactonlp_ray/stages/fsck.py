"""Index integrity verification — ``fsck`` for the segment index
(fulltext_index tier; SURVEY.md §2.1 extension — the job-surface
maintenance op a production index needs beside build/append/compact/
expunge; the model is Lucene's CheckIndex).

Checks, per LIVE segment (parallel — one Ray task per segment):

* postings decode cleanly under their declared codec and length ``n``;
* docids strictly ascending within every term;
* every tf >= 1 and every posting's ``dl`` equals the docstats
  ``doc_len`` of that doc (the denormalized copy BM25 scores from);
* stored ``cf`` equals the decoded tf sum;
* block-max metadata covers the postings (last block doc == last
  docid, blk_last_doc ascending);
* docstats doc_ids strictly ascending.

Then two global cross-checks, both over the index's OWN derived data
(never the corpus — fsck must work when the source is gone):

* the term dictionary (``stats/term_df``) agrees with the per-segment
  posting counts: df == sum of per-segment ns, cf == sum of tf sums —
  a union + keyed groupby, the same exchange shape the build's stats
  phase uses (one row per (term, segment), head-term skew bounded);
* ``collection.json`` totals (n_docs, total_len) equal the docstats
  sums.

Returns a ONE-ROW frame ``(n_docs, n_terms, n_postings, total_len,
n_errors)`` — n_errors == 0 is the pass condition; details of every
failure are in the ``errors`` attribute (capped) for operators.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..sources import manifest as mf

__all__ = ["fsck_index", "segment_catalog"]


def segment_catalog(index_dir: str) -> pd.DataFrame:
    """Segment catalog (the Elasticsearch ``_cat/segments`` surface):
    one row per LIVE segment with ``(sid, n_docs, n_terms, n_postings,
    total_len)``, read from segment METADATA only (docstats columns +
    the postings ``n`` column — no blob decode).  One Ray task per
    segment, so the catalog of a thousand-segment index costs a
    thousand small parquet footer reads, fanned out."""
    import pyarrow.parquet as pq

    live = mf.live_segment_order(mf.read_manifest(index_dir))

    def stat(batch: pa.Table) -> pa.Table:
        rows = []
        for sid in batch["sid"].to_pylist():
            seg = mf.segment_dir(index_dir, int(sid))
            ds_tbl = pq.read_table(
                os.path.join(seg, "docstats.parquet"), columns=["doc_len"]
            )
            p_tbl = pq.read_table(
                os.path.join(seg, "postings.parquet"), columns=["n"]
            )
            rows.append({
                "sid": int(sid),
                "n_docs": ds_tbl.num_rows,
                "n_terms": p_tbl.num_rows,
                "n_postings": int(
                    pa.compute.sum(p_tbl["n"]).as_py() or 0
                ),
                "total_len": int(
                    pa.compute.sum(ds_tbl["doc_len"]).as_py() or 0
                ),
            })
        return pa.Table.from_pylist(rows)

    out = (
        ray.data.from_items([{"sid": s} for s in live])
        .map_batches(stat, batch_size=1, batch_format="pyarrow")
        .to_pandas()
    )
    out = out.sort_values("sid").reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out

_MAX_ERRORS = 50  # per segment, keep reports bounded


def _check_segment(index_dir: str, sid: int) -> tuple[pa.Table, dict]:
    """One segment's scan: returns ((term, df, cf) partials, summary)."""
    import pyarrow.parquet as pq

    from .codec import decode_postings

    seg = mf.segment_dir(index_dir, sid)
    errors: list[str] = []

    def err(msg: str) -> None:
        if len(errors) < _MAX_ERRORS:
            errors.append(f"seg {sid}: {msg}")

    ds_tbl = pq.read_table(os.path.join(seg, "docstats.parquet"))
    ids = ds_tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    lens = ds_tbl["doc_len"].to_numpy(zero_copy_only=False).astype(np.int64)
    if ids.size and np.any(np.diff(ids) <= 0):
        err("docstats doc_ids not strictly ascending")
    p_tbl = pq.read_table(os.path.join(seg, "postings.parquet"))
    rows = p_tbl.to_pylist()
    # bulk decode (the one-pass slice-by-counts path serving uses — a
    # per-term decode loop here was the measured ~100x slower shape).
    # Attribution guard: before slicing the concatenated stream by the
    # DECLARED per-term n, validate each blob's OWN value count (varint:
    # bytes with the high bit clear; pfor: the per-blob counts the bulk
    # kernel parses from block headers).  A corrupt blob whose stream
    # still parses would otherwise shift every later term's slice and
    # pin its error on the wrong term — mismatching blobs are excluded
    # from the bulk pass and decoded per term so errors attribute to the
    # offending term, while the clean majority keeps the fast path.
    decoded: list[tuple | None] = [None] * len(rows)
    suspect: set[int] = set()

    def _varint_blob_counts(blobs: list[bytes]) -> np.ndarray:
        lens = np.fromiter(
            (len(b) for b in blobs), dtype=np.int64, count=len(blobs)
        )
        cat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
        cs = np.concatenate(
            [[0], np.cumsum((cat < 128).astype(np.int64))]
        )
        boffs = np.concatenate([[0], np.cumsum(lens)])
        return cs[boffs[1:]] - cs[boffs[:-1]]

    try:
        from .codec import (
            delta_decode_segmented,
            pfor_decode_many,
            varint_decode,
        )

        for codec in ("varint", "pfor"):
            sel = [i for i, r in enumerate(rows)
                   if r.get("codec", "varint") == codec]
            if not sel:
                continue
            declared = np.array([rows[i]["n"] for i in sel], dtype=np.int64)
            if codec == "varint":
                for col in ("doc_blob", "tf_blob", "dl_blob"):
                    actual = _varint_blob_counts([rows[i][col] for i in sel])
                    for j in np.flatnonzero(actual != declared):
                        suspect.add(sel[j])
            sel = [i for i in sel if i not in suspect]
            if not sel:
                continue
            counts = np.array([rows[i]["n"] for i in sel], dtype=np.int64)
            bounds = np.concatenate([[0], np.cumsum(counts)])
            total = int(bounds[-1])
            if codec == "varint":
                gaps = varint_decode(
                    b"".join(rows[i]["doc_blob"] for i in sel), total
                )
                tfs_all = varint_decode(
                    b"".join(rows[i]["tf_blob"] for i in sel), total
                )
                dls_all = varint_decode(
                    b"".join(rows[i]["dl_blob"] for i in sel), total
                )
            else:
                gaps, gcnt = pfor_decode_many(
                    [rows[i]["doc_blob"] for i in sel]
                )
                tfs_all, tcnt = pfor_decode_many(
                    [rows[i]["tf_blob"] for i in sel]
                )
                dls_all, dcnt = pfor_decode_many(
                    [rows[i]["dl_blob"] for i in sel]
                )
                bad = (
                    (np.asarray(gcnt) != counts)
                    | (np.asarray(tcnt) != counts)
                    | (np.asarray(dcnt) != counts)
                )
                if np.any(bad):
                    for j in np.flatnonzero(bad):
                        suspect.add(sel[j])
                    sel = [i for i in sel if i not in suspect]
                    if not sel:
                        continue
                    counts = np.array(
                        [rows[i]["n"] for i in sel], dtype=np.int64
                    )
                    bounds = np.concatenate([[0], np.cumsum(counts)])
                    total = int(bounds[-1])
                    gaps = pfor_decode_many(
                        [rows[i]["doc_blob"] for i in sel]
                    )[0]
                    tfs_all = pfor_decode_many(
                        [rows[i]["tf_blob"] for i in sel]
                    )[0]
                    dls_all = pfor_decode_many(
                        [rows[i]["dl_blob"] for i in sel]
                    )[0]
            if gaps.size != total or tfs_all.size != total or dls_all.size != total:
                raise ValueError("bulk stream length mismatch")
            docids_all = delta_decode_segmented(gaps, bounds)
            for j, i in enumerate(sel):
                lo, hi = bounds[j], bounds[j + 1]
                decoded[i] = (
                    docids_all[lo:hi],
                    tfs_all[lo:hi].astype(np.int64),
                    dls_all[lo:hi].astype(np.int64),
                )
    except Exception:  # noqa: BLE001 — corruption: attribute per term
        suspect = set(range(len(rows)))
        decoded = [None] * len(rows)
    for i in sorted(suspect):
        row = rows[i]
        try:
            decoded[i] = decode_postings(row)
        except Exception as e:  # noqa: BLE001
            decoded[i] = None
            err(f"term {row['term']!r}: decode failed: {e}")
    terms, dfs, cfs = [], [], []
    n_postings = 0
    for row, dec in zip(rows, decoded):
        if dec is None:
            continue
        t = row["term"]
        docids, tfs, dls = dec
        if docids.size != row["n"]:
            err(f"term {t!r}: decoded {docids.size} postings, declared {row['n']}")
        if docids.size and np.any(np.diff(docids) <= 0):
            err(f"term {t!r}: docids not strictly ascending")
        if np.any(tfs < 1):
            err(f"term {t!r}: tf < 1")
        pos = np.searchsorted(ids, docids)
        ok = pos < ids.size
        if not np.all(ok) or np.any(ids[np.minimum(pos, ids.size - 1)] != docids):
            err(f"term {t!r}: posting doc absent from docstats")
        else:
            if np.any(lens[pos] != dls):
                err(f"term {t!r}: posting dl != docstats doc_len")
        if int(row["cf"]) != int(tfs.sum()):
            err(f"term {t!r}: stored cf {row['cf']} != tf sum {int(tfs.sum())}")
        blk_last = np.asarray(row["blk_last_doc"], dtype=np.int64)
        if blk_last.size:
            if docids.size and blk_last[-1] != docids[-1]:
                err(f"term {t!r}: block metadata does not cover postings")
            if np.any(np.diff(blk_last) <= 0):
                err(f"term {t!r}: blk_last_doc not ascending")
        terms.append(t)
        dfs.append(int(docids.size))
        cfs.append(int(tfs.sum()))
        n_postings += int(docids.size)
    partial = pa.table({
        "term": pa.array(terms, pa.string()),
        "df": pa.array(dfs, pa.int64()),
        "cf": pa.array(cfs, pa.int64()),
    })
    summary = {
        "sid": sid,
        "n_docs": int(ids.size),
        "total_len": int(lens.sum()),
        "n_postings": n_postings,
        "errors": errors,
    }
    return partial, summary


def fsck_index(index_dir: str) -> pd.DataFrame:
    """Verify an index's on-disk invariants (module docstring); one Ray
    task per live segment, then a keyed groupby cross-check of the term
    dictionary.  Returns one row ``(n_docs, n_terms, n_postings,
    total_len, n_errors)``; the full error list is on the returned
    frame's ``.attrs['errors']``."""
    live = mf.live_segment_order(mf.read_manifest(index_dir))

    def check(batch: pa.Table) -> pa.Table:
        parts = []
        for sid in batch["sid"].to_pylist():
            partial, summary = _check_segment(index_dir, int(sid))
            parts.append(pa.table({
                "term": partial["term"],
                "df": partial["df"],
                "cf": partial["cf"],
                "summary": pa.array([None] * partial.num_rows, pa.string()),
            }))
            # the per-segment summary rides as one sentinel row
            parts.append(pa.table({
                "term": pa.array([None], pa.string()),
                "df": pa.array([0], pa.int64()),
                "cf": pa.array([0], pa.int64()),
                "summary": pa.array([json.dumps(summary)], pa.string()),
            }))
        return pa.concat_tables(parts)

    raw = (
        ray.data.from_items([{"sid": s} for s in live])
        .map_batches(check, batch_size=1, batch_format="pyarrow")
        .to_pandas()
    )
    errors: list[str] = []
    n_docs = total_len = n_postings = 0
    for s in raw["summary"].dropna():
        d = json.loads(s)
        n_docs += d["n_docs"]
        total_len += d["total_len"]
        n_postings += d["n_postings"]
        errors.extend(d["errors"])
    # dictionary cross-check: summed partials vs stats/term_df
    terms_only = raw[raw["term"].notna()]
    agg = (
        terms_only.groupby("term", as_index=False)[["df", "cf"]].sum()
        if len(terms_only)
        else pd.DataFrame({"term": [], "df": [], "cf": []})
    )
    import pyarrow.parquet as pq

    dict_tbl = pq.read_table(
        os.path.join(index_dir, "stats", "term_df")
    ).to_pandas()
    m = dict_tbl.merge(agg, on="term", how="outer", suffixes=("_dict", "_seg"))
    # vectorized mismatch mask — the all-clean path must not pay a
    # Python iteration per vocabulary term
    bad = m[
        m["df_dict"].isna() | m["df_seg"].isna()
        | (m["df_dict"] != m["df_seg"]) | (m["cf_dict"] != m["cf_seg"])
    ]
    for r in bad.head(max(0, 10 * _MAX_ERRORS - len(errors))).itertuples():
        errors.append(
            f"dictionary mismatch for {r.term!r}: "
            f"df {r.df_dict}/{r.df_seg} cf {r.cf_dict}/{r.cf_seg}"
        )
    with open(os.path.join(index_dir, "stats", "collection.json")) as f:
        coll = json.load(f)
    if int(coll["n_docs"]) != n_docs:
        errors.append(
            f"collection n_docs {coll['n_docs']} != docstats sum {n_docs}"
        )
    if int(coll.get("total_len", -1)) != total_len:
        errors.append(
            f"collection total_len {coll.get('total_len')} != "
            f"docstats sum {total_len}"
        )
    out = pd.DataFrame({
        "n_docs": np.array([n_docs], np.int64),
        "n_terms": np.array([len(dict_tbl)], np.int64),
        "n_postings": np.array([n_postings], np.int64),
        "total_len": np.array([total_len], np.int64),
        "n_errors": np.array([len(errors)], np.int64),
    })
    out.attrs["errors"] = errors
    return out
