"""Pinned-golden VALUES oracles (SURVEY.md §5.3 family).

``/root/reference`` is empty (SURVEY.md §0), so the reference for ops whose
semantics DuckDB SQL cannot express directly (custom 64-bit hashes, HLL
register math, the full fixture retrieval pipeline) is a SINGLE-PROCESS
pure-Python implementation in this module: no Ray, no shared kernels with
the distributed stages beyond the pinned leaf functions (tokenizer, NER,
title normalization) that define the spec itself.  Its output is inlined
as a DuckDB ``VALUES`` table and registered in ``oracle_sql()`` — the
driver then verifies DISTRIBUTED == SERIAL-REFERENCE row-for-row.

Caching: computed SQL is committed under ``goldens/pinned/`` keyed by a
content fingerprint (md5 of the live parquet for table-dependent entries,
version strings for fixture-only entries); a stale fingerprint triggers a
live recompute, so a regenerated test table can never be checked against
stale goldens.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
from collections import Counter

import numpy as np
import pandas as pd

from .. import fixtures
from ..functions.ner import NER_VERSION, extract_entities
from ..functions.textnorm import norm_match_key
from ..functions.tokenizer import TOKENIZER_VERSION, tokenize
from ..oracle import ORACLE_VERSION, OracleIndex

PINNED_VERSION = "pinned-v1"

_M64 = (1 << 64) - 1

# sf dir the driver's DuckDB correctness harness runs against
ORACLE_SF_DIR = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

_GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "goldens", "pinned")


# ----------------------------------------------------- scalar hash reference
# Plain-int transcriptions of the pinned hash spec (FNV-1a 64 -> splitmix64
# finalizer) — deliberately NOT the numpy kernels in functions/hashing.py.

def _fnv1a(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & _M64
    return h


def _sm64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _M64
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return z ^ (z >> 31)


def _hash_str(s: str) -> int:
    return _sm64(_fnv1a(s))


def _shingles(text: str, k: int) -> list[str]:
    toks = tokenize(text)
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


# -------------------------------------------------------------- serial ops

def serial_simhash_pairs(
    docs: dict[int, str], *, shingle_k: int = 2, max_hamming: int = 3
) -> pd.DataFrame:
    """All-pairs SimHash Hamming <= max_hamming (Charikar construction),
    O(N^2) scalar reference.  The engine's 4x16-bit pigeonhole bucketing
    finds EXACTLY this set (<=3 differing bits leave >=1 of 4 chunks
    equal), so equality here proves the bucketed route lost nothing."""
    sims: dict[int, int] = {}
    for did in sorted(docs):
        sh = _shingles(docs[did], shingle_k)
        if not sh:
            sims[did] = 0
            continue
        votes = [0] * 64
        for s in sh:
            h = _hash_str(s)
            for b in range(64):
                votes[b] += 1 if (h >> b) & 1 else -1
        out = 0
        for b in range(64):
            if votes[b] > 0:
                out |= 1 << b
        sims[did] = out
    ids = sorted(sims)
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(sims[a] ^ sims[b]).count("1")
            if ham <= max_hamming:
                rows.append((a, b, ham))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"]).astype(np.int64)


def serial_winnow(
    text: str, k: int = 8, w: int = 4, base: int = 257,
    mod: int = (1 << 61) - 1,
) -> tuple[int, int]:
    """Scalar robust winnowing (Schleimer 2003) — the pinned reference
    for functions/hashing.winnow_column, deliberately an independent
    per-window loop (recomputes each k-gram hash from scratch; list
    scans for the rightmost minimum).  Returns (n_fp, fp_xor)."""
    data = text.encode("utf-8")
    hs = []
    for i in range(len(data) - k + 1):
        h = 0
        for b in data[i : i + k]:
            h = (h * base + b) % mod
        hs.append(h)
    last = -1
    n_fp = 0
    fp_xor = 0
    for i in range(len(hs) - w + 1):
        win = hs[i : i + w]
        j = i + (w - 1 - win[::-1].index(min(win)))
        if j != last:
            n_fp += 1
            fp_xor ^= hs[j]
            last = j
    return n_fp, fp_xor


def serial_rolling_fingerprint(
    text: str, window: int = 8, base: int = 257, mod: int = (1 << 61) - 1
) -> int:
    """Scalar Rabin-Karp min-window fingerprint (the pinned rolling-hash
    spec; deliberately NOT the vectorized closed-form kernel in
    functions/hashing.rolling_fingerprint_column)."""
    data = text.encode("utf-8")
    if len(data) < window:
        return 0
    h = 0
    power = pow(base, window - 1, mod)
    best = None
    for i, b in enumerate(data):
        h = (h * base + b) % mod
        if i >= window:
            h = (h - data[i - window] * power * base) % mod
        if i >= window - 1:
            best = h if best is None else min(best, h)
    return best


def serial_hll_estimate(strings: list[str], p: int = 12) -> float:
    """Scalar HLL (Flajolet 2007, same p / estimator / hash spec as
    functions/sketches.HLL, including its float64-log2 rank derivation so
    the estimate is bit-identical to the distributed merge)."""
    m = 1 << p
    regs = [0] * m
    for s in strings:
        h = _hash_str(s)
        idx = h >> (64 - p)
        rest = (h << p) & _M64
        if rest == 0:
            lz = 64 - p + 1
        else:
            bits = 63 - math.floor(math.log2(float(rest)))
            lz = min(max(bits + 1, 1), 64 - p + 1)
        if lz > regs[idx]:
            regs[idx] = lz
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = sum(2.0 ** (-r) for r in regs)
    e = alpha * m * m / s
    if e <= 2.5 * m:
        zeros = regs.count(0)
        if zeros:
            e = m * math.log(m / zeros)
    return float(e)


def _serial_docs(n: int, lang: str | None):
    """Serial mirror of prepare_docs + assign_doc_ids over the fixture
    corpus: lang filter, url keep-latest, doc_id = rank of url."""
    pages = fixtures.make_pages(n).to_pylist()
    if lang:
        pages = [p for p in pages if p["lang"] == lang]
    best: dict[str, dict] = {}
    for p in pages:
        cur = best.get(p["url"])
        if cur is None or p["warc_ts"] > cur["warc_ts"]:
            best[p["url"]] = p
    rows = [best[u] for u in sorted(best)]
    texts = {i: r["text"] for i, r in enumerate(rows)}
    urls = {i: r["url"] for i, r in enumerate(rows)}
    titles = {i: norm_match_key(r["text"].split("\n")[0]) for i, r in enumerate(rows)}
    return texts, urls, titles


def _serial_retrieve(n: int, n_claims: int, k: int, lang: str | None):
    """Serial mirror of flagship.retrieve: BM25 route (OracleIndex) UNION
    NER entity->title route, per-claim dedup with NER (rank 0) winning."""
    texts, urls, titles = _serial_docs(n, lang)
    title_map: dict[str, int] = {}
    for did in sorted(titles):
        title_map.setdefault(titles[did], did)
    idx = OracleIndex(texts)
    claims = fixtures.make_claims(n_claims, n_pages=n).to_pylist()
    out = []
    for c in claims:
        qid = int(c["query_id"])
        top = idx.bm25_topk(tokenize(c["claim"]), k)
        rows = [
            (qid, rank, did, score, "bm25")
            for rank, (did, score) in enumerate(top, 1)
        ]
        seen_ner = set()
        for e in extract_entities(c["claim"]):
            did = title_map.get(norm_match_key(e))
            if did is not None and did not in seen_ner:
                seen_ner.add(did)
                rows.append((qid, 0, did, float("inf"), "ner"))
        # dedup per claim: stable sort by (doc_id, rank), keep first per doc
        rows.sort(key=lambda r: (r[2], r[1]))
        kept, seen = [], set()
        for r in rows:
            if r[2] not in seen:
                seen.add(r[2])
                kept.append(r)
        out.extend(kept)
    df = pd.DataFrame(out, columns=["query_id", "rank", "doc_id", "score", "route"])
    df["rank"] = df["rank"].astype(np.int32)
    return df, urls, claims


def serial_pages_retrieval(
    n: int = 500, n_claims: int = 50, k: int = 5
) -> pd.DataFrame:
    df, _urls, _claims = _serial_retrieve(n, n_claims, k, lang="en")
    df["score"] = np.round(df["score"], 6)
    return df.sort_values(["query_id", "doc_id"]).reset_index(drop=True)


def serial_retrieval_eval(
    n: int = 500, n_claims: int = 60, k: int = 10
) -> pd.DataFrame:
    """Serial mirror of stages/evaluate.evaluate_retrieval over the serial
    retrieval (lang=None, as in q_retrieval_eval)."""
    df, urls, claims = _serial_retrieve(n, n_claims, k, lang=None)
    gold_pages: dict[int, set[str]] = {}
    for c in claims:
        pages = {
            item["page"] for es in (c["evidence"] or []) for item in es
        }
        if pages:
            gold_pages[int(c["query_id"])] = pages
    marked = []
    for r in df.itertuples(index=False):
        pages = gold_pages.get(int(r.query_id))
        if pages is None:
            continue
        marked.append((int(r.query_id), int(r.rank), urls.get(int(r.doc_id)) in pages))
    n_scorable = len(gold_pages)
    if not marked or n_scorable == 0:
        return pd.DataFrame(
            {"n_queries": [0], "n_scorable": [n_scorable],
             "recall_at_k": [0.0], "mrr": [0.0]}
        )
    per_q: dict[int, list[int]] = {}
    qids = set()
    for qid, rank, hit in marked:
        qids.add(qid)
        if hit and rank <= k:
            per_q.setdefault(qid, []).append(max(rank, 1))
    recalled = len(per_q)
    mrr = sum(1.0 / min(rs) for rs in per_q.values())
    return pd.DataFrame(
        {
            "n_queries": [len(qids)],
            "n_scorable": [n_scorable],
            "recall_at_k": [round(recalled / n_scorable, 6)],
            "mrr": [round(mrr / n_scorable, 6)],
        }
    )


def serial_claim_verdicts(
    n: int = 500, n_claims: int = 60, k: int = 5, _retrieval=None
) -> pd.DataFrame:
    """Serial mirror of q_claim_verdicts: retrieval (serial BM25 + NER
    route) -> evidence sentences (pinned splitter) -> overlap-idf top-5
    -> entailment features -> label rule.  ``_retrieval`` lets
    serial_fever_score share ONE _serial_retrieve result so verdicts
    and evidence-coverage are scored against the same run."""
    from ..stages.sentences import split_sentences
    from ..stages.verify_claims import (
        LABEL_NEI, LABEL_REFUTES, LABEL_SUPPORTS, SUPPORT_THRESHOLD,
        entail_score, entailment_features,
    )

    df, _urls, claims = _retrieval or _serial_retrieve(
        n, n_claims, k, lang=None
    )
    texts, _u, _t = _serial_docs(n, lang=None)
    doc_lists = {
        int(qid): sorted(set(g["doc_id"])) for qid, g in df.groupby("query_id")
    }
    out_rows = []
    for c in claims:
        qid = int(c["query_id"])
        ctoks = tokenize(c["claim"])
        tset = frozenset(ctoks)
        scored = []
        for did in doc_lists.get(qid, []):
            for sid, stext in enumerate(split_sentences(texts[did])):
                stoks = Counter(tokenize(stext))
                ntok = sum(stoks.values())
                overlap = sum(cnt for t, cnt in stoks.items() if t in tset)
                if overlap == 0 or ntok == 0:
                    continue
                score = overlap / ntok * math.log1p(len(tset))
                scored.append((score, did, sid, stext))
        scored.sort(key=lambda r: (-r[0], r[1], r[2]))
        top = scored[:5]
        if not top:
            out_rows.append((qid, LABEL_NEI, 0.0, 0))
            continue
        ent = []
        for _score, did, sid, stext in top:
            overlap, neg, len_ratio = entailment_features(ctoks, tokenize(stext))
            ent.append((entail_score(overlap, len_ratio), did, sid, neg))
        ent.sort(key=lambda r: (-r[0], r[1], r[2]))
        best = ent[0]
        if best[0] >= SUPPORT_THRESHOLD:
            label = LABEL_REFUTES if best[3] else LABEL_SUPPORTS
        else:
            label = LABEL_NEI
        out_rows.append((qid, label, round(best[0], 6), len(ent)))
    out = pd.DataFrame(
        out_rows, columns=["query_id", "label", "entail_score", "n_evidence"]
    )
    out["query_id"] = out["query_id"].astype(np.int64)
    out["n_evidence"] = out["n_evidence"].astype(np.int64)
    return out.sort_values("query_id").reset_index(drop=True)


def serial_fever_score(
    n: int = 500, n_claims: int = 60, k: int = 5
) -> pd.DataFrame:
    """Serial mirror of q_fever_score: strict FEVER score (Thorne 2018)
    over the serial verdicts + serial retrieval — a claim counts only
    if label matches gold AND (NEI, or some complete gold evidence set
    is within the retrieved pages)."""
    retrieval = _serial_retrieve(n, n_claims, k, lang=None)
    verdicts = serial_claim_verdicts(n, n_claims, k, _retrieval=retrieval)
    pred_label = dict(zip(verdicts["query_id"], verdicts["label"]))
    df, urls, claims = retrieval
    doc_lists = {
        int(qid): sorted(set(g["doc_id"]))
        for qid, g in df.groupby("query_id")
    }
    n_label = n_fever = 0
    for c in claims:
        qid = int(c["query_id"])
        ok_label = pred_label.get(qid) == c["label"]
        n_label += ok_label
        pages = {urls[d] for d in doc_lists.get(qid, [])}
        ev_sets = c["evidence"] or []
        ok_ev = (not ev_sets) or any(
            all(e["page"] in pages for e in es) for es in ev_sets
        )
        n_fever += ok_label and ok_ev
    total = len(claims)
    return pd.DataFrame(
        {
            "n_claims": np.array([total], dtype=np.int64),
            "label_accuracy": [round(n_label / total, 6)],
            "fever_score": [round(n_fever / total, 6)],
        }
    )


def serial_ann_lsh(
    sf_dir: str, *, n_queries: int = 3, k: int = 10, n_bits: int = 4,
    n_tables: int = 8,
) -> pd.DataFrame:
    """Serial full-scan reference for the bucket-partitioned ANN route:
    same hyperplane/bucket spec (stages/ann._hyperplanes + lsh_bucket ARE
    the spec, like tokenize is for text ops), candidates = vectors sharing
    >= 1 bucket with the query across tables, cosine rounded to 6, top-k
    by (score DESC, vec_id).  No Ray, no index, no partition pruning —
    equality proves the pruned-read route reads everything it should."""
    import pyarrow.parquet as pq

    from ..stages.ann import _hyperplanes, lsh_bucket

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    # query rule = take-first-n-in-file-order, then sort by id — the SAME
    # single rule _query_vectors and serial_ann_ivf use, so the pinned
    # spec stays one rule even if the table's row order changes
    qsel = np.argsort(ids[:n_queries], kind="stable")
    q = m[:n_queries][qsel]
    dim = m.shape[1]
    cand_mask = np.zeros((n_queries, ids.size), dtype=bool)
    for tbl in range(n_tables):
        planes = _hyperplanes(dim, n_bits, seed=42 + tbl)
        vb = lsh_bucket(m, planes)
        qb = lsh_bucket(q, planes)
        cand_mask |= qb[:, None] == vb[None, :]
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    mn = np.linalg.norm(m, axis=1)
    mn[mn == 0] = 1.0
    rows = []
    for qi in range(n_queries):
        cols = np.flatnonzero(cand_mask[qi])
        cos = np.round((m[cols] @ q[qi]) / mn[cols] / qn[qi], 6)
        sel = np.lexsort((ids[cols], -cos))[:k]
        for rank, j in enumerate(sel, 1):
            rows.append((qi, rank, int(ids[cols][j]), float(cos[j])))
    df = pd.DataFrame(rows, columns=["query_id", "rank", "vec_id", "score"])
    df["rank"] = df["rank"].astype(np.int32)
    return df


def serial_ann_ivf(
    sf_dir: str, *, n_queries: int = 3, k: int = 10, n_lists: int = 16,
    n_probe: int = 4, sample_size: int = 2048,
) -> pd.DataFrame:
    """Serial full-scan reference for the IVF route: same coarse
    quantizer spec (stages/ann.kmeans_centroids + ivf_assign ARE the
    spec), same probe rule, no Ray / no partition pruning — equality
    proves the partitioned pruned-read route reads every probed list."""
    import pyarrow.parquet as pq

    from ..stages.ann import ivf_assign, kmeans_centroids

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    # sample = first sample_size rows in FILE order, sorted by id (the
    # exact rule build_ivf_index uses via ds.take)
    sel = np.argsort(ids[:sample_size], kind="stable")
    cent = kmeans_centroids(m[:sample_size][sel], n_lists)
    assign = ivf_assign(m, cent)
    qsel = np.argsort(ids[:n_queries], kind="stable")
    q = m[:n_queries][qsel]
    d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    mn = np.linalg.norm(m, axis=1)
    mn[mn == 0] = 1.0
    rows = []
    for qi in range(q.shape[0]):
        cols = np.flatnonzero(np.isin(assign, probes[qi]))
        cos = np.round((m[cols] @ q[qi]) / mn[cols] / qn[qi], 6)
        sel_k = np.lexsort((ids[cols], -cos))[:k]
        for rank, j in enumerate(sel_k, 1):
            rows.append((qi, rank, int(ids[cols][j]), float(cos[j])))
    df = pd.DataFrame(rows, columns=["query_id", "rank", "vec_id", "score"])
    df["rank"] = df["rank"].astype(np.int32)
    return df


def serial_hll_by_lang(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """Serial reference for the per-group HLL aggregation: one scalar
    HLL per lang over that lang's tokens (same hash, same registers) —
    equality proves the distributed per-batch-sketch + register-max
    groupby merge is lossless per group."""
    import pyarrow.parquet as pq

    from ..functions.sketches import HLL
    from ..functions.tokenizer import tokenize

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    rows = sorted(
        zip(t["doc_id"].to_pylist(), t["lang"].to_pylist(), t["text"].to_pylist())
    )
    per: dict[str, list[str]] = {}
    for _did, lang, text in rows:
        per.setdefault(lang, []).extend(tokenize(text))
    out = []
    for lang in sorted(per):
        out.append((lang, round(HLL(p).add_strings(per[lang]).estimate(), 6)))
    return pd.DataFrame(out, columns=["lang", "n_terms_estimate"])


def serial_cms(sf_dir: str) -> pd.DataFrame:
    """Serial reference for the CMS route: one scalar sketch fed doc by
    doc in doc_id order (integer counter adds commute, so any feed order
    equals the distributed per-batch-sketch + sum-merge exactly), then
    the same pinned term list point-queried."""
    import pyarrow.parquet as pq

    from ..functions.sketches import CMS
    from ..functions.tokenizer import tokenize
    from ..pipelines.queries import _CMS_TERMS

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    acc = CMS()
    for _did, text in sorted(zip(t["doc_id"].to_pylist(), t["text"].to_pylist())):
        toks = tokenize(text)
        if toks:
            acc.add_strings(toks)
    ests = acc.estimate(_CMS_TERMS)
    return (
        pd.DataFrame({"term": _CMS_TERMS, "est_count": ests.astype(np.int64)})
        .sort_values("term")
        .reset_index(drop=True)
    )


def serial_ann_pq(
    sf_dir: str, *, n_queries: int = 3, k: int = 10, sample_size: int = 2048,
) -> pd.DataFrame:
    """Serial reference for the product-quantized ADC route: same train
    sample rule (first sample_size rows in file order, sorted by id),
    same codebooks (stages/ann.pq_train IS the spec), but scoring goes
    the OTHER way — decode every code to its reconstruction and take
    per-subspace dot products, accumulated subspace-ascending like the
    engine's lookup tables.  Equality proves the table-gather ADC path
    scores every vector identically to explicit reconstruction."""
    import pyarrow.parquet as pq

    from ..stages.ann import pq_decode, pq_encode, pq_train

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    sel = np.argsort(ids[:sample_size], kind="stable")
    books = pq_train(m[:sample_size][sel])
    codes = pq_encode(m, books)
    dec = pq_decode(codes, books)
    nsub, _, sd = books.shape
    qsel = np.argsort(ids[:n_queries], kind="stable")
    q = m[:n_queries][qsel]
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    rows = []
    for qi in range(q.shape[0]):
        dot = np.zeros(dec.shape[0])
        nrm2 = np.zeros(dec.shape[0])
        for j in range(nsub):
            sub = dec[:, j * sd : (j + 1) * sd]
            dot += sub @ q[qi, j * sd : (j + 1) * sd]
            nrm2 += (sub ** 2).sum(axis=1)
        dn = np.sqrt(nrm2)
        dn[dn == 0] = 1.0
        cos = np.round(dot / qn[qi] / dn, 6)
        sel_k = np.lexsort((ids, -cos))[:k]
        for rank, j in enumerate(sel_k, 1):
            rows.append((qi, rank, int(ids[j]), float(cos[j])))
    df = pd.DataFrame(rows, columns=["query_id", "rank", "vec_id", "score"])
    df["rank"] = df["rank"].astype(np.int32)
    return df


def serial_ann_recall(
    sf_dir: str, *, n_queries: int = 3, k: int = 10
) -> pd.DataFrame:
    """Serial mirror of q_ann_recall: numpy full-scan brute cosine
    top-k (independent of both the engine and DuckDB) vs the serial
    IVF reference — recall@k per query."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    qsel = np.argsort(ids[:n_queries], kind="stable")
    q = m[:n_queries][qsel]
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    mn = np.linalg.norm(m, axis=1)
    mn[mn == 0] = 1.0
    ivf = serial_ann_ivf(sf_dir, n_queries=n_queries, k=k)
    rows = []
    for qi in range(q.shape[0]):
        cos = np.round((m @ q[qi]) / mn / qn[qi], 6)
        truth = set(ids[np.lexsort((ids, -cos))[:k]].tolist())
        got = set(ivf[ivf["query_id"] == qi]["vec_id"])
        rows.append((qi, round(len(truth & got) / len(truth), 6)))
    df = pd.DataFrame(rows, columns=["query_id", "recall"])
    df["query_id"] = df["query_id"].astype(np.int64)
    return df


def serial_ann_recall_lsh(
    sf_dir: str, *, n_queries: int = 3, k: int = 10
) -> pd.DataFrame:
    """Serial mirror of q_ann_recall_lsh: numpy full-scan brute cosine
    truth vs the serial LSH reference (same bucket spec as the
    partitioned route) — recall@k per query for the OTHER pruned ANN
    family beside IVF."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    qsel = np.argsort(ids[:n_queries], kind="stable")
    q = m[:n_queries][qsel]
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    mn = np.linalg.norm(m, axis=1)
    mn[mn == 0] = 1.0
    lsh = serial_ann_lsh(sf_dir, n_queries=n_queries, k=k)
    rows = []
    for qi in range(q.shape[0]):
        cos = np.round((m @ q[qi]) / mn / qn[qi], 6)
        truth = set(ids[np.lexsort((ids, -cos))[:k]].tolist())
        got = set(lsh[lsh["query_id"] == qi]["vec_id"])
        rows.append((qi, round(len(truth & got) / len(truth), 6)))
    df = pd.DataFrame(rows, columns=["query_id", "recall"])
    df["query_id"] = df["query_id"].astype(np.int64)
    return df


def serial_cjk_tokens(sf_dir: str) -> pd.DataFrame:
    """Serial mirror of q_cjk_tokens: zh-labeled docs transliterated by
    the same pinned leaf (cjk_transliterate), tokenized by the
    pure-Python mixed-script tokenizer (CJK bigram semantics), then df
    (docs containing) / cf (total occurrences) per term, top-30 by
    (df desc, cf desc, term)."""
    from collections import Counter

    import pyarrow.parquet as pq

    from ..functions.tokenizer import cjk_transliterate, tokenize_mixed

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    df_c: Counter = Counter()
    cf_c: Counter = Counter()
    for did, text, lang in sorted(
        zip(t["doc_id"].to_pylist(), t["text"].to_pylist(),
            t["lang"].to_pylist())
    ):
        if lang != "zh":
            continue
        toks = tokenize_mixed(cjk_transliterate(text))
        cf_c.update(toks)
        df_c.update(set(toks))
    rows = sorted(
        ((term, df_c[term], cf_c[term]) for term in df_c),
        key=lambda r: (-r[1], -r[2], r[0]),
    )[:30]
    out = pd.DataFrame(rows, columns=["term", "df", "cf"])
    out["df"] = out["df"].astype(np.int64)
    out["cf"] = out["cf"].astype(np.int64)
    return out


def serial_ann_nsw(
    sf_dir: str, *, n_queries: int = 3, k: int = 10, n_lists: int = 8,
    m: int = 12, ef_construction: int = 64, n_probe: int = 4,
    ef_search: int = 96, sample_size: int = 2048,
) -> pd.DataFrame:
    """Serial reference for the partitioned small-world-graph route: the
    same coarse-quantizer spec (kmeans_centroids + ivf_assign) splits the
    corpus into lists, the same deterministic graph kernels
    (stages/ann.nsw_build_adjacency / nsw_search_partition ARE the spec)
    build and beam-search each probed list — no Ray, no hive partitions,
    no path pruning.  Equality proves the distributed map_groups build
    produced the identical per-partition graphs and the pruned-read
    serving searched every probed one."""
    import pyarrow.parquet as pq

    from ..stages.ann import (
        ivf_assign,
        kmeans_centroids,
        nsw_build_adjacency,
        nsw_search_partition,
    )

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    mvec = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    sel = np.argsort(ids[:sample_size], kind="stable")
    cent = kmeans_centroids(mvec[:sample_size][sel], n_lists)
    assign = ivf_assign(mvec, cent)
    # per-list graphs, insertion order = ascending vec_id (the spec)
    graphs: dict[int, tuple[np.ndarray, np.ndarray, list[list[int]]]] = {}
    for lid in sorted(set(int(a) for a in assign)):
        rows_l = np.flatnonzero(assign == lid)
        order = np.argsort(ids[rows_l], kind="stable")
        lids = ids[rows_l][order]
        lvec = mvec[rows_l][order]
        graphs[lid] = (lids, lvec, nsw_build_adjacency(
            lids, lvec, m=m, ef_construction=ef_construction))
    qsel = np.argsort(ids[:n_queries], kind="stable")
    q = mvec[:n_queries][qsel]
    d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
    rows = []
    for qi in range(q.shape[0]):
        merged: list[tuple[int, float]] = []
        for lid in probes[qi]:
            if int(lid) not in graphs:
                continue
            lids, lvec, nbrs = graphs[int(lid)]
            merged.extend(nsw_search_partition(
                lids, lvec, nbrs, q[qi], k=k, ef_search=ef_search))
        merged.sort(key=lambda t2: (-t2[1], t2[0]))
        for rank, (vid, s) in enumerate(merged[:k], 1):
            rows.append((qi, rank, vid, s))
    df = pd.DataFrame(rows, columns=["query_id", "rank", "vec_id", "score"])
    df["rank"] = df["rank"].astype(np.int32)
    return df


def serial_ann_recall_nsw(
    sf_dir: str, *, n_queries: int = 3, k: int = 10
) -> pd.DataFrame:
    """Serial mirror of q_ann_recall_hnsw: numpy full-scan brute cosine
    truth vs the serial small-world-graph reference — recall@k per query
    (the graph family's acceptance metric beside the IVF/LSH ones)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    qsel = np.argsort(ids[:n_queries], kind="stable")
    q = m[:n_queries][qsel]
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    mn = np.linalg.norm(m, axis=1)
    mn[mn == 0] = 1.0
    nsw = serial_ann_nsw(sf_dir, n_queries=n_queries, k=k)
    rows = []
    for qi in range(q.shape[0]):
        cos = np.round((m @ q[qi]) / mn / qn[qi], 6)
        truth = set(ids[np.lexsort((ids, -cos))[:k]].tolist())
        got = set(nsw[nsw["query_id"] == qi]["vec_id"])
        rows.append((qi, round(len(truth & got) / len(truth), 6)))
    df = pd.DataFrame(rows, columns=["query_id", "recall"])
    df["query_id"] = df["query_id"].astype(np.int64)
    return df


def serial_ann_ivfpq(
    sf_dir: str, *, n_queries: int = 3, k: int = 10, n_lists: int = 16,
    n_probe: int = 4, sample_size: int = 2048,
) -> pd.DataFrame:
    """Serial reference for IVF-PQ: same deterministic coarse k-means,
    residual codebooks and code assignment (stages/ann trainers ARE the
    spec), then per-query probe selection and scoring via explicit
    residual reconstruction — dot and norm accumulated
    subspace-ascending in the engine's exact term order
    (cent² then per-j 2·cent·res + res²)."""
    import pyarrow.parquet as pq

    from ..stages.ann import ivf_assign, kmeans_centroids, pq_encode, pq_train

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    sel = np.argsort(ids[:sample_size], kind="stable")
    sample = m[:sample_size][sel]
    cent = kmeans_centroids(sample, n_lists)
    books = pq_train(sample - cent[ivf_assign(sample, cent)])
    nsub, _, sd = books.shape
    lists = ivf_assign(m, cent)
    codes = pq_encode(m - cent[lists], books)
    qsel = np.argsort(ids[:n_queries], kind="stable")
    q = m[:n_queries][qsel]
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
    rows = []
    for qi in range(q.shape[0]):
        cand = np.flatnonzero(np.isin(lists, probes[qi]))
        li = lists[cand]
        dot = q[qi] @ cent[li].T
        nrm2 = (cent[li] ** 2).sum(axis=1).copy()
        for j in range(nsub):
            res_sub = books[j][codes[cand, j]]
            c_sub = cent[li, j * sd : (j + 1) * sd]
            dot += res_sub @ q[qi, j * sd : (j + 1) * sd]
            nrm2 += 2.0 * (c_sub * res_sub).sum(axis=1)
            nrm2 += (res_sub ** 2).sum(axis=1)
        dn = np.sqrt(nrm2)
        dn[dn == 0] = 1.0
        cos = np.round(dot / qn[qi] / dn, 6)
        sel_k = np.lexsort((ids[cand], -cos))[:k]
        for rank, j in enumerate(sel_k, 1):
            rows.append((qi, rank, int(ids[cand[j]]), float(cos[j])))
    df = pd.DataFrame(rows, columns=["query_id", "rank", "vec_id", "score"])
    df["rank"] = df["rank"].astype(np.int32)
    return df


def serial_bpe(sf_dir: str, n_merges: int = 40) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Independent serial BPE reference (Counter-based; deliberately NOT
    importing functions/bpe.py): learn ``n_merges`` merges from the
    serially-computed word-count table (tie rule: count DESC, pair lex
    ASC), then encode every document word with rank-greedy merging.
    Returns (merge table, per-doc token counts) — equality with the
    distributed route pins every merge decision and encode step."""
    from collections import Counter

    import pyarrow.parquet as pq

    from ..functions.tokenizer import tokenize

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    doc_toks = {
        did: tokenize(txt)
        for did, txt in sorted(
            zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
        )
    }
    wc: Counter = Counter()
    for toks in doc_toks.values():
        wc.update(toks)
    end = "</w>"
    seqs = {w: tuple(w) + (end,) for w in wc}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc_: Counter = Counter()
        for w, seq in seqs.items():
            for pair in zip(seq, seq[1:]):
                pc_[pair] += wc[w]
        if not pc_:
            break
        best = sorted(pc_.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(best)
        a, b = best
        nxt = {}
        for w, seq in seqs.items():
            out: list[str] = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            nxt[w] = tuple(out)
        seqs = nxt
    ranks = {p: i for i, p in enumerate(merges)}

    def enc_len(word: str) -> int:
        seq = list(word) + [end]
        while True:
            cand = [
                (ranks[(seq[i], seq[i + 1])], i)
                for i in range(len(seq) - 1)
                if (seq[i], seq[i + 1]) in ranks
            ]
            if not cand:
                return len(seq)
            r, _ = min(cand)
            a, b = merges[r]
            out = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out

    word_len = {w: enc_len(w) for w in wc}
    merges_df = pd.DataFrame(
        {
            "rank": np.arange(1, len(merges) + 1, dtype=np.int64),
            "left": [a for a, _ in merges],
            "right": [b for _, b in merges],
        }
    )
    rows = [
        (did, len(toks), sum(word_len[w] for w in toks))
        for did, toks in doc_toks.items()
        if toks
    ]
    counts_df = pd.DataFrame(
        rows, columns=["doc_id", "n_tokens", "n_bpe_tokens"]
    )
    return merges_df, counts_df


def serial_unigram(sf_dir: str) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Independent serial unigram-LM reference (Counter-based;
    deliberately NOT importing functions/unigram.py beyond the pinned
    constants): seed substrings (len 1..MAX_PIECE, overlapping,
    freq-weighted) -> min-count keep (singles always) ->
    log(count/total) scores -> per-word max-likelihood segmentation.
    Tie rule re-expressed equivalently: among equal-score candidates the
    LONGER piece wins (== the engine's strict-> ascending-j loop, since
    distinct starts mean distinct lengths).  Returns (top-50 piece
    usage, per-doc token/piece counts)."""
    import pyarrow.parquet as pq

    from ..functions.tokenizer import tokenize
    from ..functions.unigram import MAX_PIECE, MIN_COUNT

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    doc_toks = {
        did: tokenize(txt)
        for did, txt in sorted(
            zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
        )
    }
    wc: Counter = Counter()
    for toks in doc_toks.values():
        wc.update(toks)
    sub: Counter = Counter()
    for w, f in wc.items():
        for L in range(1, min(MAX_PIECE, len(w)) + 1):
            for j in range(len(w) - L + 1):
                sub[w[j : j + L]] += f
    kept = {p: c for p, c in sub.items() if c >= MIN_COUNT or len(p) == 1}
    total = sum(kept.values())
    logp = {p: math.log(c / total) for p, c in kept.items()}

    def segment(word: str) -> list[str]:
        n = len(word)
        best: list[float | None] = [0.0] + [None] * n
        back = [0] * (n + 1)
        for i in range(1, n + 1):
            cands = []
            for j in range(max(0, i - MAX_PIECE), i):
                if best[j] is not None and word[j:i] in logp:
                    cands.append((best[j] + logp[word[j:i]], i - j, j))
            if cands:
                s, _L, j = max(cands, key=lambda c: (c[0], c[1]))
                best[i], back[i] = s, j
        if best[n] is None:
            return list(word)
        out = []
        i = n
        while i > 0:
            out.append(word[back[i] : i])
            i = back[i]
        return out[::-1]

    seg = {w: segment(w) for w in wc}
    usage: Counter = Counter()
    for w, f in wc.items():
        for p in seg[w]:
            usage[p] += f
    top = sorted(usage.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    pieces_df = pd.DataFrame(
        {
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "piece": [p for p, _ in top],
            "n_uses": np.asarray([c for _, c in top], dtype=np.int64),
        }
    )
    rows = [
        (did, len(toks), sum(len(seg[w]) for w in toks))
        for did, toks in doc_toks.items()
        if toks
    ]
    counts_df = pd.DataFrame(
        rows, columns=["doc_id", "n_tokens", "n_uni_pieces"]
    )
    counts_df["doc_id"] = counts_df["doc_id"].astype(np.int64)
    counts_df["n_tokens"] = counts_df["n_tokens"].astype(np.int64)
    counts_df["n_uni_pieces"] = counts_df["n_uni_pieces"].astype(np.int64)
    return pieces_df, counts_df


def serial_ann_sq8(
    sf_dir: str, *, n_queries: int = 3, k: int = 10, sample_size: int = 2048,
) -> pd.DataFrame:
    """Serial reference for the int8 scalar-quantized route: same train
    sample rule as IVF (first sample_size rows in file order, sorted by
    id), same encode/decode arithmetic (stages/ann.sq8_* ARE the spec),
    full scan of the codes, cosine rounded 6, top-k by (score DESC,
    vec_id).  No Ray, no persisted index — equality proves the
    codes-only pruned-bytes route scores every vector identically."""
    import pyarrow.parquet as pq

    from ..stages.ann import sq8_decode, sq8_encode, sq8_train

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    sel = np.argsort(ids[:sample_size], kind="stable")
    mins, scales = sq8_train(m[:sample_size][sel])
    dec = sq8_decode(sq8_encode(m, mins, scales), mins, scales)
    qsel = np.argsort(ids[:n_queries], kind="stable")
    q = m[:n_queries][qsel]
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    dn = np.linalg.norm(dec, axis=1)
    dn[dn == 0] = 1.0
    rows = []
    for qi in range(q.shape[0]):
        cos = np.round((dec @ q[qi]) / dn / qn[qi], 6)
        sel_k = np.lexsort((ids, -cos))[:k]
        for rank, j in enumerate(sel_k, 1):
            rows.append((qi, rank, int(ids[j]), float(cos[j])))
    df = pd.DataFrame(rows, columns=["query_id", "rank", "vec_id", "score"])
    df["rank"] = df["rank"].astype(np.int32)
    return df


def _serial_kmeans_fit(
    sf_dir: str, k: int, *, iters: int = 5, sample_size: int = 2048,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Shared serial Lloyd: whole-matrix, single process.  The shared
    kernel (stages/cluster.lloyd_step_serial — fixed-point update) IS
    the spec, like tokenize is for text ops; what equality proves is
    that the distributed route's per-block partials + integer reduce
    recompose to the whole-matrix step at any parallelism.

    Returns (ids, matrix, centroids, final assign)."""
    import pyarrow.parquet as pq

    from ..stages.cluster import (
        _new_centroids, init_centroids, lloyd_step_serial,
    )

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    sel = np.argsort(ids[:sample_size], kind="stable")
    cent = init_centroids(m[:sample_size][sel], k, seed=seed)
    for _ in range(iters):
        _, qsums, counts, _ = lloyd_step_serial(m, cent)
        cent = _new_centroids(cent, qsums, counts)
    assign, _, _, _ = lloyd_step_serial(m, cent)
    return ids, m, cent, assign


def serial_kmeans(
    sf_dir: str, *, k: int = 8, iters: int = 5, sample_size: int = 2048,
    seed: int = 42,
) -> pd.DataFrame:
    """Serial reference for the distributed full-corpus Lloyd
    (stages/cluster.kmeans_fit): per-cluster size + inertia after the
    final assignment, fixed-point spec throughout."""
    from ..stages.cluster import _D2SCALE, lloyd_step_serial

    _, m, cent, _ = _serial_kmeans_fit(
        sf_dir, k, iters=iters, sample_size=sample_size, seed=seed
    )
    _, _, counts, inertia_q = lloyd_step_serial(m, cent)
    return pd.DataFrame(
        {
            "cluster_id": np.arange(cent.shape[0], dtype=np.int32),
            "size": counts,
            "inertia": np.round(inertia_q / _D2SCALE, 6),
        }
    )


def serial_semdedup(
    sf_dir: str, *, k: int = 8, tau: float = 0.4, iters: int = 5,
    sample_size: int = 2048, seed: int = 42,
) -> pd.DataFrame:
    """Serial reference for SemDeDup: same centroids, same greedy
    lowest-id-kept rule (stages/cluster.semdedup_greedy IS the keep
    spec), per-cluster scan in a plain loop.  Equality proves the
    groupby(cluster).map_groups route partitions and scans identically."""
    from ..stages.cluster import semdedup_greedy

    ids, m, _, assign = _serial_kmeans_fit(
        sf_dir, k, iters=iters, sample_size=sample_size, seed=seed
    )
    kept = np.zeros(ids.size, dtype=bool)
    dup_of = np.full(ids.size, -1, dtype=np.int64)
    for c in np.unique(assign):
        mask = assign == c
        kc, dc = semdedup_greedy(ids[mask], m[mask], tau)
        kept[mask] = kc
        dup_of[mask] = dc
    order = np.argsort(ids, kind="stable")
    df = pd.DataFrame(
        {
            "vec_id": ids[order],
            "cluster_id": assign[order].astype(np.int32),
            "kept": kept[order],
            "dup_of": dup_of[order],
        }
    )
    return df.reset_index(drop=True)


def serial_kcenter(sf_dir: str, *, k: int = 12) -> pd.DataFrame:
    """Serial reference for distributed greedy k-center
    (stages/cluster.kcenter_greedy): whole-matrix Gonzalez sweep via the
    shared fixed-point selection spec (stages/cluster.kcenter_select).
    Equality proves the per-block argmax + driver reduce recomposes the
    whole-matrix scan at any parallelism."""
    import pyarrow.parquet as pq

    from ..stages.cluster import _D2SCALE, kcenter_select

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    chosen = kcenter_select(ids, m, k)
    return pd.DataFrame({
        "rank": np.arange(1, len(chosen) + 1, dtype=np.int32),
        "vec_id": np.asarray([c[0] for c in chosen], dtype=np.int64),
        "radius": np.round(
            np.asarray([c[1] for c in chosen], dtype=np.float64) / _D2SCALE, 6
        ),
    })


def serial_pca(sf_dir: str, *, n_top: int = 8) -> pd.DataFrame:
    """Serial reference for distributed PCA (stages/cluster.pca_gram):
    whole-matrix integer Gram under the same 2^20 quantization — integer
    matmul is exact, so the block-partitioned partials MUST recompose to
    these very integers; the eigen step (pca_eigen) is shared driver
    code either way."""
    import pyarrow.parquet as pq

    from ..stages.cluster import _quantize, pca_eigen

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    q = _quantize(m)
    n = q.shape[0]
    sum_q = q.sum(axis=0).astype(object)
    gram_q = (q.T @ q).astype(object)
    return pca_eigen(n, sum_q, gram_q, n_top)


def serial_logreg(sf_dir: str) -> pd.DataFrame:
    """Serial whole-matrix reference for the distributed logreg trainer
    (stages/logreg.fit): features via the per-doc spec function
    (doc_features over tokenize — an independent scalar path from the
    engine's vectorized flatten/bincount kernel), full-batch GD with
    the SAME quantized-gradient update, accuracy by exact count."""
    import pyarrow.parquet as pq

    from ..stages.logreg import (
        _GSCALE, FEATURES, LR, N_ITER, doc_features, grad_partial_q,
    )

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "text"],
    )
    order = np.argsort(np.asarray(t["doc_id"].to_pylist(), dtype=np.int64))
    texts = np.asarray(t["text"].to_pylist(), dtype=object)[order]
    langs = np.asarray(t["lang"].to_pylist(), dtype=object)[order]
    X = np.asarray([doc_features(tokenize(s)) for s in texts], np.float64)
    y = (langs == "en").astype(np.float64)
    n, d = X.shape
    w = np.zeros(d, dtype=np.float64)
    for _ in range(N_ITER):
        q = grad_partial_q(X, y, w)
        w = w - LR * (q.astype(np.float64) / _GSCALE) / n
    correct = int((((X @ w) >= 0.0) == (y > 0.5)).sum())
    return pd.DataFrame({
        "n_docs": np.array([n], dtype=np.int64),
        "accuracy": [round(correct / n, 6)],
        **{
            f"w_{name}": [round(float(w[i]), 6)]
            for i, name in enumerate(FEATURES)
        },
    })


# ------------------------------------------------------------- SQL plumbing

_SQL_TYPES = {
    "int64": "BIGINT",
    "int32": "INTEGER",
    "int8": "TINYINT",
    "float64": "DOUBLE",
    "bool": "BOOLEAN",
    "object": "VARCHAR",
}


def serial_textrank(
    sf_dir: str,
    *,
    window: int = 2,
    damping: float = 0.85,
    iters: int = 20,
    topk: int = 3,
) -> pd.DataFrame:
    """Independent serial TextRank (Mihalcea & Tarau 2004 §2.3): per
    doc, an UNWEIGHTED undirected co-occurrence graph over distinct
    terms (an edge between tokens < ``window`` positions apart), scored
    with the original unnormalized recurrence ``S(v) = (1-d) + d *
    sum_{u in N(v)} S(u)/deg(u)`` for a fixed ``iters`` rounds from
    S=1, then the top-k keywords by (round(score,6) DESC, term).
    Dict-and-set implementation on purpose — structurally independent
    of the engine's per-doc numpy adjacency kernel."""
    import pyarrow.parquet as pq  # noqa: PLC0415

    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    rows = []
    for did, text in sorted(
        zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
    ):
        toks = tokenize(text)
        if not toks:
            continue
        nbrs: dict[str, set[str]] = {}
        for i in range(len(toks)):
            for j in range(i + 1, min(i + window, len(toks))):
                a, b = toks[i], toks[j]
                if a == b:
                    continue
                nbrs.setdefault(a, set()).add(b)
                nbrs.setdefault(b, set()).add(a)
        verts = sorted(set(toks))
        scores = {v: 1.0 for v in verts}
        for _ in range(iters):
            scores = {
                v: (1.0 - damping)
                + damping
                * sum(
                    scores[u] / len(nbrs[u]) for u in sorted(nbrs.get(v, ()))
                )
                for v in verts
            }
        best = sorted(verts, key=lambda v: (-round(scores[v], 6), v))[:topk]
        for r, v in enumerate(best, 1):
            rows.append((int(did), r, v, round(scores[v], 6)))
    out = pd.DataFrame(rows, columns=["doc_id", "rank", "term", "score"])
    return out.astype({"doc_id": "int64", "rank": "int32", "score": "float64"})


def serial_bm25_pm2(
    sf_dir: str,
    queries: list[tuple[int, list[str]]],
    *,
    window: int = 20,
    k: int = 10,
) -> pd.DataFrame:
    """Single-process reference for PM-2 diversification (Dang &
    Croft, WSDM 2012): BM25 window from the pure-Python oracle index,
    aspect labels straight from the parquet ``source`` column, the
    shared pinned :func:`stages.ann.pm2_select` kernel (the mmr_select
    precedent: one kernel IS the spec)."""
    import pyarrow.parquet as pq

    from ..oracle import OracleIndex
    from ..stages.ann import pm2_select

    docs_tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    docs = {
        int(d): t
        for d, t in zip(
            docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist()
        )
    }
    amap = {
        int(d): str(s)
        for d, s in zip(
            docs_tbl["doc_id"].to_pylist(), docs_tbl["source"].to_pylist()
        )
    }
    idx = OracleIndex(docs)
    rows = []
    for qid, terms in queries:
        ranked = [
            (round(s, 6), d)
            for d, s in idx.bm25_topk(list(terms), 10 * window)
        ]
        ranked.sort(key=lambda t: (-t[0], t[1]))
        win = ranked[:window]
        for rank, d, a, obj in pm2_select(win, amap, k):
            rows.append((qid, rank, d, a, obj))
    out = pd.DataFrame(
        rows, columns=["query_id", "rank", "doc_id", "source", "obj"]
    )
    return out.astype(
        {
            "query_id": "int64",
            "rank": "int32",
            "doc_id": "int64",
            "obj": "float64",
        }
    )


def serial_varwidth_histogram(sf_dir: str, k: int = 6) -> pd.DataFrame:
    """Serial reference for q_varwidth_histogram: plain-Python optimal
    weighted 1-D k-means DP (Ckmeans.1d.dp; Wang & Song 2011) over the
    distinct ``documents.n_chars`` values — independently written (list
    loops, strict-< first-minimum scan), sharing only the pinned
    prefix-sum cost formula ``css - cs^2/W`` that IS the spec."""
    import pyarrow.parquet as pq

    col = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["n_chars"]
    )["n_chars"].to_numpy()
    cnt = Counter(int(x) for x in col)
    vals = sorted(cnt)
    w = [cnt[x] for x in vals]
    n = len(vals)
    k = min(k, n)
    cw, cs, css = [0.0], [0.0], [0.0]
    for x, wt in zip(vals, w):
        cw.append(cw[-1] + wt)
        cs.append(cs[-1] + wt * x)
        css.append(css[-1] + wt * x * x)
    inf = float("inf")
    D = [[inf] * (n + 1) for _ in range(k + 1)]
    back = [[0] * (n + 1) for _ in range(k + 1)]
    D[0][0] = 0.0
    for j in range(1, k + 1):
        for i in range(j, n - (k - j) + 1):
            best, barg = inf, j - 1
            for m in range(j - 1, i):
                W = cw[i] - cw[m]
                S = cs[i] - cs[m]
                Q = css[i] - css[m]
                c = D[j - 1][m] + Q - S * S / W
                if c < best:
                    best, barg = c, m
            D[j][i] = best
            back[j][i] = barg
    bounds = [0] * (k + 1)
    bounds[k] = n
    for j in range(k, 0, -1):
        bounds[j - 1] = back[j][bounds[j]]
    rows = []
    for b in range(k):
        a, z = bounds[b], bounds[b + 1]
        seg, segw = vals[a:z], w[a:z]
        nn = sum(segw)
        s = sum(x * wt for x, wt in zip(seg, segw))
        rows.append((b, seg[0], seg[-1], nn, round(s / nn, 6)))
    return pd.DataFrame(
        rows, columns=["bucket", "v_min", "v_max", "n_docs", "v_avg"]
    ).astype(
        {
            "bucket": "int64",
            "v_min": "int64",
            "v_max": "int64",
            "n_docs": "int64",
            "v_avg": "float64",
        }
    )


def values_sql(df: pd.DataFrame) -> str:
    """Inline a small DataFrame as a typed DuckDB VALUES select."""
    cols = list(df.columns)
    types = {c: _SQL_TYPES.get(str(df[c].dtype), "VARCHAR") for c in cols}
    sel = ", ".join(f'CAST("{c}" AS {types[c]}) AS "{c}"' for c in cols)
    if df.empty:
        nulls = ", ".join(f'NULL AS "{c}"' for c in cols)
        return f"SELECT {sel} FROM (SELECT {nulls}) WHERE 1 = 0"

    def lit(v) -> str:
        if isinstance(v, (bool, np.bool_)):
            return "true" if v else "false"
        if isinstance(v, (int, np.integer)):
            return str(int(v))
        if isinstance(v, (float, np.floating)):
            f = float(v)
            if math.isinf(f):
                sign = "" if f > 0 else "-"
                return f"CAST('{sign}Infinity' AS DOUBLE)"
            if math.isnan(f):
                return "CAST('NaN' AS DOUBLE)"
            s = repr(f)
            # exponent marker forces DOUBLE inference (a bare decimal
            # literal infers DECIMAL and then rejects the Infinity rows)
            return s if ("e" in s or "E" in s) else s + "e0"
        return "'" + str(v).replace("'", "''") + "'"

    rows = ", ".join(
        "(" + ", ".join(lit(v) for v in row) + ")"
        for row in df.itertuples(index=False)
    )
    names = ", ".join(f'"{c}"' for c in cols)
    return f"SELECT {sel} FROM (VALUES {rows}) AS t({names})"


def _file_fingerprint(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            chunk = f.read(1 << 20)
            if not chunk:
                break
            h.update(chunk)
    return h.hexdigest()


def _cached(name: str, fingerprint: str, compute) -> str:
    """goldens/pinned/{name}.json cache: {fingerprint, sql}; recompute on
    mismatch (regenerated tables / bumped versions) and rewrite if the
    repo is writable."""
    path = os.path.join(_GOLDEN_DIR, f"{name}.json")
    try:
        with open(path) as f:
            rec = json.load(f)
        if rec.get("fingerprint") == fingerprint:
            return rec["sql"]
    except (OSError, ValueError):
        pass
    sql = compute()
    try:
        os.makedirs(_GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            json.dump({"fingerprint": fingerprint, "sql": sql}, f)
    except OSError:
        pass
    return sql


def _fixture_fp() -> str:
    from ..stages.sentences import SPLITTER_VERSION
    from ..stages.verify_claims import ENTAIL_VERSION

    return "|".join(
        [fixtures.FIXTURES_VERSION, TOKENIZER_VERSION, NER_VERSION,
         ORACLE_VERSION, SPLITTER_VERSION, ENTAIL_VERSION, PINNED_VERSION]
    )


def _sf_docs() -> dict[int, str]:
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(ORACLE_SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    )
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def oracle_values_sql() -> dict[str, str]:
    """The pinned-golden oracle entries for __ray_entry__.oracle_sql()."""
    docs_path = os.path.join(ORACLE_SF_DIR, "documents.parquet")
    try:
        sf_fp = _file_fingerprint(docs_path) + "|" + PINNED_VERSION
    except OSError:
        sf_fp = None

    out: dict[str, str] = {}

    if sf_fp is not None:
        from ..functions.tokenizer import CJK_TOKENIZER_VERSION

        out["cjk_tokens"] = _cached(
            "cjk_tokens", sf_fp + "|" + CJK_TOKENIZER_VERSION,
            lambda: values_sql(serial_cjk_tokens(ORACLE_SF_DIR)),
        )
        out["simhash_neardup"] = _cached(
            "simhash_neardup", sf_fp,
            lambda: values_sql(serial_simhash_pairs(_sf_docs())),
        )

        def _hll() -> str:
            toks: list[str] = []
            docs = _sf_docs()
            for did in sorted(docs):
                toks.extend(tokenize(docs[did]))
            est = round(serial_hll_estimate(toks), 6)
            return values_sql(pd.DataFrame({"n_terms_estimate": [est]}))

        out["hll_distinct_terms"] = _cached("hll_distinct_terms", sf_fp, _hll)
        out["hll_terms_per_lang"] = _cached(
            "hll_terms_per_lang", sf_fp,
            lambda: values_sql(serial_hll_by_lang(ORACLE_SF_DIR)),
        )

        def _bpe(which: int):
            def compute() -> str:
                return values_sql(serial_bpe(ORACLE_SF_DIR)[which])

            return compute

        out["textrank_keywords"] = _cached(
            "textrank_keywords", sf_fp,
            lambda: values_sql(serial_textrank(ORACLE_SF_DIR)),
        )
        out["bpe_merges"] = _cached("bpe_merges", sf_fp, _bpe(0))
        out["bpe_token_counts"] = _cached(
            "bpe_token_counts", sf_fp, _bpe(1)
        )

        def _uni(which: int):
            def compute() -> str:
                return values_sql(serial_unigram(ORACLE_SF_DIR)[which])

            return compute

        out["unigram_pieces"] = _cached("unigram_pieces", sf_fp, _uni(0))
        out["unigram_token_counts"] = _cached(
            "unigram_token_counts", sf_fp, _uni(1)
        )
        out["cms_heavy_terms"] = _cached(
            "cms_heavy_terms", sf_fp,
            lambda: values_sql(serial_cms(ORACLE_SF_DIR)),
        )
        out["varwidth_histogram"] = _cached(
            "varwidth_histogram", sf_fp,
            lambda: values_sql(serial_varwidth_histogram(ORACLE_SF_DIR)),
        )

        def _rfp() -> str:
            docs = _sf_docs()
            ids = sorted(docs)
            df = pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "rfp": np.asarray(
                        [serial_rolling_fingerprint(docs[d]) for d in ids],
                        dtype=np.int64,
                    ),
                }
            )
            return values_sql(df)

        out["rolling_fingerprints"] = _cached("rolling_fingerprints", sf_fp, _rfp)

        from ..stages.logreg import LOGREG_VERSION

        out["quality_logreg"] = _cached(
            "quality_logreg", sf_fp + "|" + LOGREG_VERSION,
            lambda: values_sql(serial_logreg(ORACLE_SF_DIR)),
        )

        def _winnow() -> str:
            docs = _sf_docs()
            ids = sorted(docs)
            vals = [serial_winnow(docs[d]) for d in ids]
            df = pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "n_fp": np.asarray([v[0] for v in vals], dtype=np.int64),
                    "fp_xor": np.asarray(
                        [v[1] for v in vals], dtype=np.int64
                    ),
                }
            )
            return values_sql(df)

        out["winnow_fingerprints"] = _cached(
            "winnow_fingerprints", sf_fp, _winnow
        )

    from ..stages.ann import ANN_VERSION

    emb_path = os.path.join(ORACLE_SF_DIR, "embeddings.parquet")
    try:
        emb_fp = "|".join([_file_fingerprint(emb_path), PINNED_VERSION, ANN_VERSION])
    except OSError:
        emb_fp = None
    if emb_fp is not None:
        out["ann_lsh"] = _cached(
            "ann_lsh", emb_fp,
            lambda: values_sql(serial_ann_lsh(ORACLE_SF_DIR)),
        )
        out["ann_ivf"] = _cached(
            "ann_ivf", emb_fp,
            lambda: values_sql(serial_ann_ivf(ORACLE_SF_DIR)),
        )
        out["ann_recall"] = _cached(
            "ann_recall", emb_fp,
            lambda: values_sql(serial_ann_recall(ORACLE_SF_DIR)),
        )
        out["ann_recall_lsh"] = _cached(
            "ann_recall_lsh", emb_fp,
            lambda: values_sql(serial_ann_recall_lsh(ORACLE_SF_DIR)),
        )
        from ..stages.ann import NSW_VERSION

        out["ann_hnsw"] = _cached(
            "ann_hnsw", emb_fp + "|" + NSW_VERSION,
            lambda: values_sql(serial_ann_nsw(ORACLE_SF_DIR)),
        )
        out["ann_recall_hnsw"] = _cached(
            "ann_recall_hnsw", emb_fp + "|" + NSW_VERSION,
            lambda: values_sql(serial_ann_recall_nsw(ORACLE_SF_DIR)),
        )
        from ..stages.ann import SQ8_VERSION

        out["ann_sq8"] = _cached(
            "ann_sq8", emb_fp + "|" + SQ8_VERSION,
            lambda: values_sql(serial_ann_sq8(ORACLE_SF_DIR)),
        )
        from ..stages.ann import PQ_VERSION

        out["ann_pq"] = _cached(
            "ann_pq", emb_fp + "|" + PQ_VERSION,
            lambda: values_sql(serial_ann_pq(ORACLE_SF_DIR)),
        )
        out["ann_ivfpq"] = _cached(
            "ann_ivfpq", emb_fp + "|" + PQ_VERSION,
            lambda: values_sql(serial_ann_ivfpq(ORACLE_SF_DIR)),
        )
        from ..stages.cluster import KMEANS_VERSION

        out["kmeans_clusters"] = _cached(
            "kmeans_clusters", emb_fp + "|" + KMEANS_VERSION,
            lambda: values_sql(serial_kmeans(ORACLE_SF_DIR)),
        )
        out["semdedup"] = _cached(
            "semdedup", emb_fp + "|" + KMEANS_VERSION,
            lambda: values_sql(serial_semdedup(ORACLE_SF_DIR)),
        )
        from ..stages.cluster import KCENTER_VERSION, PCA_VERSION

        out["kcenter_coreset"] = _cached(
            "kcenter_coreset", emb_fp + "|" + KCENTER_VERSION,
            lambda: values_sql(serial_kcenter(ORACLE_SF_DIR)),
        )
        out["pca_variance"] = _cached(
            "pca_variance", emb_fp + "|" + PCA_VERSION,
            lambda: values_sql(serial_pca(ORACLE_SF_DIR)),
        )

    fx_fp = _fixture_fp()
    out["pages_retrieval"] = _cached(
        "pages_retrieval", fx_fp, lambda: values_sql(serial_pages_retrieval())
    )
    out["retrieval_eval"] = _cached(
        "retrieval_eval", fx_fp, lambda: values_sql(serial_retrieval_eval())
    )
    out["fever_score"] = _cached(
        "fever_score", fx_fp, lambda: values_sql(serial_fever_score())
    )
    out["claim_verdicts"] = _cached(
        "claim_verdicts", fx_fp, lambda: values_sql(serial_claim_verdicts())
    )
    return out


def serial_bm25_mmr(
    sf_dir: str,
    queries: list[tuple[int, list[str]]],
    *,
    window: int = 30,
    k: int = 10,
    lam: float = 0.5,
) -> pd.DataFrame:
    """Single-process reference for MMR diversification (Carbonell &
    Goldstein, SIGIR 1998): BM25 window from the pure-Python oracle
    index (independent of the engine's segment machinery), pairwise
    cosine from the pinned matrix expression, greedy
    ``lam*rel - (1-lam)*max_sim_to_selected`` selection with
    ``(objective DESC, doc_id ASC)`` ties.  All inputs rounded to 6
    before the objective (the cross-engine float policy); ``lam`` must
    be an exact binary float."""
    import pyarrow.parquet as pq

    from ..oracle import OracleIndex

    docs_tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    docs = {
        int(d): t
        for d, t in zip(
            docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist()
        )
    }
    emb_tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    vec = {
        int(i): np.asarray(e, dtype=np.float64)
        for i, e in zip(
            emb_tbl["vec_id"].to_pylist(), emb_tbl["embedding"].to_pylist()
        )
    }
    idx = OracleIndex(docs)
    out = []
    for qid, terms in queries:
        ranked = [
            (round(s, 6), d) for d, s in idx.bm25_topk(list(terms), 10 * window)
        ]
        ranked.sort(key=lambda t: (-t[0], t[1]))
        win = [(s, d) for s, d in ranked[:window] if d in vec]
        if not win:
            continue
        rel = {d: s for s, d in win}
        ids = [d for _s, d in win]
        m = np.stack([vec[d] for d in ids])
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        sim = np.round((m @ m.T) / n[:, None] / n[None, :], 6)
        from ..stages.ann import mmr_select

        for rank, d, score in mmr_select(rel, ids, sim, k, lam):
            out.append({
                "query_id": qid, "rank": rank, "doc_id": d, "score": score,
            })
    df = pd.DataFrame(
        out, columns=["query_id", "rank", "doc_id", "score"]
    )
    df["query_id"] = df["query_id"].astype(np.int64)
    df["rank"] = df["rank"].astype(np.int32)
    df["doc_id"] = df["doc_id"].astype(np.int64)
    return df[["query_id", "rank", "doc_id", "score"]]
