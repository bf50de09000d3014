"""Positional index + phrase/boolean query tests (stages/phrase.py).

Reference check model: a pure-Python sliding-window phrase counter and a
scalar BM25 over the pinned tokenizer — same policy as the other search
oracles (bit-exact float expressions, deterministic ties)."""

from __future__ import annotations

import math
import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from defactonlp_ray.functions.tokenizer import tokenize
from defactonlp_ray.stages.codec import decode_positions, encode_positions_batch
from defactonlp_ray.stages.index_build import (
    append_index,
    build_index,
    compact_index,
)
from defactonlp_ray.stages.phrase import (
    boolean_search,
    match_phrase,
    phrase_search,
    score_boolean,
)
from defactonlp_ray.stages.search import IndexReader

K1, B = 1.2, 0.75


# ------------------------------------------------------------ codec unit

def test_positions_codec_roundtrip():
    rng = np.random.default_rng(7)
    # 3 terms, ragged postings with ragged ascending position lists
    pos_lists = [
        [0, 3, 9], [2], [1, 2, 3, 50],   # term 0: 3 postings
        [7, 8],                           # term 1: 1 posting
        [0], [1000], [5, 6],              # term 2: 3 postings
    ]
    positions = np.concatenate([np.array(p) for p in pos_lists])
    tf = np.array([len(p) for p in pos_lists], dtype=np.int64)
    occ_bounds = np.concatenate([[0], np.cumsum(tf)])
    posting_starts = occ_bounds[:-1]
    term_occ_bounds = np.array([0, 8, 10, 14], dtype=np.int64)
    blobs = encode_positions_batch(positions, posting_starts, term_occ_bounds)
    assert len(blobs) == 3
    tfs_per_term = [tf[:3], tf[3:4], tf[4:]]
    got = []
    for blob, tfs in zip(blobs, tfs_per_term):
        vals, ob = decode_positions(blob, tfs)
        got.append(vals)
        assert ob.tolist() == np.concatenate([[0], np.cumsum(tfs)]).tolist()
    assert np.array_equal(np.concatenate(got), positions)
    # randomized roundtrip
    for _ in range(20):
        n_post = int(rng.integers(1, 30))
        tfs = rng.integers(1, 8, n_post).astype(np.int64)
        pos = np.concatenate(
            [np.sort(rng.choice(5000, size=t, replace=False)) for t in tfs]
        )
        ob = np.concatenate([[0], np.cumsum(tfs)])
        blobs = encode_positions_batch(pos, ob[:-1], np.array([0, int(tfs.sum())]))
        vals, _ = decode_positions(blobs[0], tfs)
        assert np.array_equal(vals, pos)


def test_positions_codec_rejects_descending():
    pos = np.array([5, 3], dtype=np.int64)
    with pytest.raises(ValueError):
        encode_positions_batch(
            pos, np.array([0]), np.array([0, 2])
        )


# --------------------------------------------------- engine vs reference

def _py_phrase_counts(docs: dict[int, list[str]], phrase: list[str]):
    m = len(phrase)
    out = {}
    for did, toks in docs.items():
        c = sum(1 for i in range(len(toks) - m + 1) if toks[i : i + m] == phrase)
        if c:
            out[did] = c
    return out


@pytest.fixture(scope="module")
def pos_index(sf_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("posidx"))
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    build_index(docs, idx, seg_docs=128, positions=True, resume=False)
    return idx


@pytest.fixture(scope="module")
def doc_tokens(sf_dir):
    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return {
        int(d): tokenize(t)
        for d, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
    }


PHRASES = [
    ["batch", "batch"],          # overlapping occurrences
    ["table", "scan"],
    ["hash", "join", "table"],   # 3-gram (rare)
    ["the"],                     # single term == tf
    ["zzz", "table"],            # absent term
]


def test_match_phrase_counts_equal_python(pos_index, doc_tokens):
    reader = IndexReader(pos_index)
    for phrase in PHRASES:
        ref = _py_phrase_counts(doc_tokens, phrase)
        docs, counts, dls = match_phrase(reader, reader.seg_ids, phrase)
        got = dict(zip(docs.tolist(), counts.tolist()))
        assert got == ref, phrase
        # dls are the true doc token counts
        for d, dl in zip(docs.tolist(), dls.tolist()):
            assert dl == len(doc_tokens[d])


def test_phrase_score_matches_scalar_bm25(pos_index, doc_tokens):
    reader = IndexReader(pos_index)
    n_docs = len(doc_tokens)
    total = sum(len(t) for t in doc_tokens.values())
    avgdl = total / n_docs
    phrase = ["table", "scan"]
    ref = _py_phrase_counts(doc_tokens, phrase)
    df = len(ref)
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    expected = {}
    for d, c in ref.items():
        dl = float(len(doc_tokens[d]))
        expected[d] = idf * (c * (K1 + 1.0)) / (
            c + K1 * (1.0 - B + B * dl / avgdl)
        )
    from defactonlp_ray.stages.phrase import score_phrase

    top = score_phrase(reader, reader.seg_ids, phrase, k=len(ref))
    assert len(top) == len(ref)
    for score, doc_id, n_occ in top:
        assert score == expected[doc_id]  # bit-exact: same expression shape
        assert n_occ == ref[doc_id]
    # ranked by (-score, doc_id)
    keys = [(-s, d) for s, d, _ in top]
    assert keys == sorted(keys)


def test_phrase_results_invariant_across_seg_docs(sf_dir, pos_index):
    idx2 = tempfile.mkdtemp(prefix="dfr_posidx2_")
    try:
        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        build_index(docs, idx2, seg_docs=97, positions=True, resume=False)
        r1, r2 = IndexReader(pos_index), IndexReader(idx2)
        for phrase in PHRASES:
            a = match_phrase(r1, r1.seg_ids, phrase)
            b = match_phrase(r2, r2.seg_ids, phrase)
            for x, y in zip(a, b):
                assert np.array_equal(x, y)
    finally:
        shutil.rmtree(idx2, ignore_errors=True)


def test_phrase_append_compact_preserves_positions(sf_dir, pos_index):
    """index(A) + append(B) + compact must answer phrases identically to
    the full positional build (pos_blob byte-concat through the merge)."""
    idx = tempfile.mkdtemp(prefix="dfr_posappend_")
    try:
        full = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        a = full.filter(expr="doc_id < 300")
        b = full.filter(expr="doc_id >= 300")
        build_index(a, idx, seg_docs=128, positions=True, resume=False)
        append_index(b, idx, seg_docs=128, positions=True)
        assert compact_index(idx, target_seg_docs=1024) >= 1
        r_full = IndexReader(pos_index)
        r_inc = IndexReader(idx)
        for phrase in PHRASES:
            a_res = match_phrase(r_full, r_full.seg_ids, phrase)
            b_res = match_phrase(r_inc, r_inc.seg_ids, phrase)
            for x, y in zip(a_res, b_res):
                assert np.array_equal(x, y)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_append_positions_mismatch_raises(sf_dir, pos_index):
    b = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).filter(expr="doc_id >= 490")
    with pytest.raises(ValueError, match="positions"):
        append_index(b, pos_index, seg_docs=128, positions=False)


def test_phrase_requires_positional_index(sf_dir):
    idx = tempfile.mkdtemp(prefix="dfr_nopos_")
    try:
        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        build_index(docs, idx, seg_docs=256, resume=False)
        reader = IndexReader(idx)
        with pytest.raises(ValueError, match="positions=True"):
            match_phrase(reader, reader.seg_ids, ["table", "scan"])
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_phrase_search_dataset_pipeline(pos_index, doc_tokens):
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([0, 1], pa.int64()),
                "terms": pa.array(
                    [["batch", "batch"], ["zzz", "qqq"]], pa.list_(pa.string())
                ),
            }
        )
    )
    res = phrase_search(pos_index, qds, k=5, concurrency=2).to_pandas()
    ref = _py_phrase_counts(doc_tokens, ["batch", "batch"])
    got = res[res.query_id == 0]
    assert len(got) == 5
    assert (res.query_id == 1).sum() == 0
    for d, c in zip(got.doc_id, got.n_occ):
        assert ref[int(d)] == int(c)


# ------------------------------------------------------------- proximity

def _py_window(doc_tokens, terms, w):
    import itertools

    uniq = sorted(set(terms))
    out = []
    for did, toks in doc_tokens.items():
        poss = [
            [i for i, x in enumerate(toks) if x == t] for t in uniq
        ]
        if any(not p for p in poss):
            continue
        if len(uniq) == 1:
            out.append(did)
            continue
        if any(
            max(c) - min(c) <= w - 1 for c in itertools.product(*poss)
        ):
            out.append(did)
    return sorted(out)


WINDOW_CASES = [
    (["hash", "join"], 2),      # == unordered adjacency
    (["hash", "join"], 5),
    (["table", "scan"], 1),     # impossible for 2 distinct terms
    (["customer", "line", "agg"], 10),
    (["the"], 4),               # single term: any doc containing it
    (["zzz", "table"], 6),      # absent term
]


def test_match_window_equals_python(pos_index, doc_tokens):
    from defactonlp_ray.stages.phrase import match_window

    reader = IndexReader(pos_index)
    for terms, w in WINDOW_CASES:
        ref = _py_window(doc_tokens, terms, w)
        got = match_window(reader, reader.seg_ids, terms, w)
        assert got.tolist() == ref, (terms, w)


def test_window_subsumes_phrase(pos_index):
    """Any phrase match is a window match at w = len(phrase)."""
    from defactonlp_ray.stages.phrase import match_window

    reader = IndexReader(pos_index)
    phrase = ["table", "scan"]
    p_docs, _, _ = match_phrase(reader, reader.seg_ids, phrase)
    w_docs = match_window(reader, reader.seg_ids, phrase, len(phrase))
    assert np.isin(p_docs, w_docs).all()


def test_window_search_pipeline_scores_match_boolean_must(pos_index):
    """score_window == score_boolean(must=terms) restricted to the
    window-passing docs (identical per-(doc, term) contributions)."""
    from defactonlp_ray.stages.phrase import match_window, score_window

    reader = IndexReader(pos_index)
    terms = ["hash", "join"]
    win = match_window(reader, reader.seg_ids, terms, 5)
    top = score_window(reader, reader.seg_ids, terms, 5, k=len(win))
    boolean = dict(
        (d, s)
        for s, d in score_boolean(
            reader, reader.seg_ids, terms, [], [], k=10**6
        )
    )
    assert len(top) == win.size
    for s, d in top:
        assert s == boolean[d]


# --------------------------------------------------------------- boolean

def _py_bm25_parts(doc_tokens):
    n_docs = len(doc_tokens)
    total = sum(len(t) for t in doc_tokens.values())
    avgdl = total / n_docs
    df: dict[str, int] = {}
    for toks in doc_tokens.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    return n_docs, avgdl, df


def _py_boolean(doc_tokens, must, should, must_not, k):
    n_docs, avgdl, df = _py_bm25_parts(doc_tokens)
    must, should, must_not = (
        sorted(set(must)),
        sorted(set(should)),
        sorted(set(must_not)),
    )
    scoring = sorted(set(must) | set(should))
    out = []
    for did, toks in doc_tokens.items():
        ts = set(toks)
        if must and not all(t in ts for t in must):
            continue
        if not must and not any(t in ts for t in should):
            continue
        if any(t in ts for t in must_not):
            continue
        score = 0.0
        hit = False
        for t in scoring:  # ascending-term order, like the engine
            tf = toks.count(t)
            if tf == 0 or df.get(t, 0) == 0:
                continue
            idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            dl = float(len(toks))
            # engine order: w = num/den first, then idf*w (ulp-relevant)
            w = (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avgdl))
            score += idf * w
            hit = True
        if hit:
            out.append((score, did))
    out.sort(key=lambda sd: (-sd[0], sd[1]))
    return out[:k]


BOOL_CASES = [
    (["hash", "join"], ["fast"], ["slow"]),
    ([], ["scan", "merge"], ["the"]),
    (["the"], [], []),
    (["zzz"], ["fast"], []),            # absent must -> empty
    ([], ["zzz", "qqq"], []),           # absent should -> empty
    (["batch"], ["batch"], ["batch"]),  # self-contradictory -> empty
]


def test_boolean_matches_python(pos_index, doc_tokens):
    reader = IndexReader(pos_index)
    for must, should, must_not in BOOL_CASES:
        ref = _py_boolean(doc_tokens, must, should, must_not, k=10)
        got = score_boolean(
            reader, reader.seg_ids, must, should, must_not, k=10
        )
        assert [(d) for _, d in got] == [d for _, d in ref], (must, should, must_not)
        for (gs, _), (rs, _) in zip(got, ref):
            assert gs == rs  # bit-exact


def test_boolean_no_filters_equals_plain_bm25(pos_index):
    """must=[] + should=terms + must_not=[] ranks exactly like search()."""
    from defactonlp_ray.stages.search import score_all_taat

    reader = IndexReader(pos_index)
    terms = sorted({"data", "query", "fast"})
    idfs = {t: reader.idf(t) for t in (reader.dfs(terms) and terms)}
    plain = score_all_taat(reader, reader.seg_ids, terms, idfs, 10)
    boolean = score_boolean(reader, reader.seg_ids, [], terms, [], 10)
    assert plain == boolean


def test_boolean_search_dataset_pipeline(pos_index, doc_tokens):
    bq = pa.table(
        {
            "query_id": pa.array([0, 1], pa.int64()),
            "must": pa.array([["hash", "join"], []], pa.list_(pa.string())),
            "should": pa.array([["fast"], ["scan"]], pa.list_(pa.string())),
            "must_not": pa.array([["slow"], []], pa.list_(pa.string())),
        }
    )
    res = boolean_search(
        pos_index, ray.data.from_arrow(bq), k=5, concurrency=2
    ).to_pandas()
    for qid, (mu, sh, mn) in [(0, (["hash", "join"], ["fast"], ["slow"])),
                              (1, ([], ["scan"], []))]:
        ref = _py_boolean(doc_tokens, mu, sh, mn, k=5)
        got = res[res.query_id == qid].sort_values("rank")
        assert got.doc_id.tolist() == [d for _, d in ref]


# ---------------------------------------------------- shared packs route

def test_shared_packs_routes_bit_identical(pos_index):
    """phrase/window/boolean through a ray.put build_pos_packs blob ==
    the per-actor point-read route, bit-identical (the seeded term_arrays
    recompute the same float64 expression postings() caches)."""
    from defactonlp_ray.stages.phrase import (
        build_pos_packs,
        window_search,
    )

    terms_union = ["batch", "hash", "join", "fast", "scan", "slow", "zzz"]
    ref = ray.put(build_pos_packs(pos_index, terms_union, chunk=2))

    pq_t = pa.table(
        {
            "query_id": pa.array([0, 1], pa.int64()),
            "terms": pa.array(
                [["batch", "batch"], ["hash", "join"]], pa.list_(pa.string())
            ),
        }
    )
    a = phrase_search(pos_index, ray.data.from_arrow(pq_t), k=5).to_pandas()
    b = phrase_search(
        pos_index, ray.data.from_arrow(pq_t), k=5, packs_ref=ref
    ).to_pandas()
    sort = ["query_id", "rank"]
    assert a.sort_values(sort).reset_index(drop=True).equals(
        b.sort_values(sort).reset_index(drop=True)
    )

    wq = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "terms": pa.array([["hash", "join"]], pa.list_(pa.string())),
            "window": pa.array([5], pa.int64()),
        }
    )
    a = window_search(pos_index, ray.data.from_arrow(wq), k=5).to_pandas()
    b = window_search(
        pos_index, ray.data.from_arrow(wq), k=5, packs_ref=ref
    ).to_pandas()
    assert a.equals(b)

    bq = pa.table(
        {
            "query_id": pa.array([0, 1], pa.int64()),
            "must": pa.array([["hash", "join"], []], pa.list_(pa.string())),
            "should": pa.array([["fast"], ["scan"]], pa.list_(pa.string())),
            "must_not": pa.array([["slow"], ["zzz"]], pa.list_(pa.string())),
        }
    )
    a = boolean_search(pos_index, ray.data.from_arrow(bq), k=5).to_pandas()
    b = boolean_search(
        pos_index, ray.data.from_arrow(bq), k=5, packs_ref=ref
    ).to_pandas()
    assert a.sort_values(sort).reset_index(drop=True).equals(
        b.sort_values(sort).reset_index(drop=True)
    )


def test_shared_packs_mixed_vocabulary(pos_index, doc_tokens):
    """Query terms OUTSIDE the seeded union fall back to point reads in
    the same run (seeded and unseeded terms mix within one query)."""
    from defactonlp_ray.stages.phrase import build_pos_packs

    ref = ray.put(build_pos_packs(pos_index, ["table"]))
    qt = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "terms": pa.array([["table", "scan"]], pa.list_(pa.string())),
        }
    )
    got = phrase_search(
        pos_index, ray.data.from_arrow(qt), k=10, packs_ref=ref
    ).to_pandas()
    refc = _py_phrase_counts(doc_tokens, ["table", "scan"])
    assert len(got) == min(10, len(refc))
    for d, c in zip(got.doc_id, got.n_occ):
        assert refc[int(d)] == int(c)


def test_shared_packs_wrong_segment_set_raises(pos_index, sf_dir, tmp_path):
    """A blob built for a different segment layout is rejected, not
    silently mis-seeded."""
    from defactonlp_ray.stages.phrase import (
        _seed_shared_packs,
        build_pos_packs,
    )

    other = str(tmp_path / "otherseg")
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    build_index(docs, other, seg_docs=64, positions=True, resume=False)
    blob = build_pos_packs(other, ["table"])
    with pytest.raises(ValueError, match="different segment set"):
        _seed_shared_packs(IndexReader(pos_index), blob)


# --------------------------------------------- minimumShouldMatch (msm)


def _py_boolean_msm(doc_tokens, must, should, must_not, msm, k):
    """Reference: _py_boolean semantics plus the Lucene msm filter —
    candidates need >= msm DISTINCT should terms."""
    base = _py_boolean(doc_tokens, must, should, must_not, k=10**9)
    sh = sorted(set(should))
    out = []
    for score, did in base:
        if sum(t in set(doc_tokens[did]) for t in sh) >= msm:
            out.append((score, did))
    return out[:k]


MSM_CASES = [
    ([], ["data", "query", "fast"], [], 2),
    (["merge"], ["sort", "scan"], [], 1),
    (["merge"], ["sort", "scan"], [], 2),
    ([], ["scan", "merge", "sort", "window"], ["dup"], 3),
    ([], ["dup", "data"], [], 2),       # msm == len -> conjunction
    ([], ["zzz", "data"], [], 2),       # absent term can't count -> empty
    (["the"], ["data"], [], 2),         # msm > len(should) -> empty
]


def test_boolean_msm_matches_python(pos_index, doc_tokens):
    reader = IndexReader(pos_index)
    for must, should, must_not, msm in MSM_CASES:
        ref = _py_boolean_msm(doc_tokens, must, should, must_not, msm, k=10)
        got = score_boolean(
            reader, reader.seg_ids, must, should, must_not, k=10,
            min_should=msm,
        )
        assert got == ref, (must, should, must_not, msm)


def test_boolean_msm_defaults_preserve_classic_semantics(pos_index):
    """min_should=None == the historical behavior: 1 with no must
    (any-should union), 0 with must (should is scoring-only)."""
    reader = IndexReader(pos_index)
    for must, should in ([], ["scan", "merge"]), (["hash"], ["fast"]):
        legacy = score_boolean(reader, reader.seg_ids, must, should, [], 10)
        explicit = score_boolean(
            reader, reader.seg_ids, must, should, [], 10,
            min_should=0 if must else 1,
        )
        assert legacy == explicit


# ------------------------------------------------- ordered span-near

def _py_ordered(doc_tokens, terms, slop):
    """Brute-force SpanNear(in_order=true): exists strictly increasing
    positions of the terms in query order with width <= slop + m - 1."""
    out = []
    for did, toks in doc_tokens.items():
        poss = [[i for i, x in enumerate(toks) if x == t] for t in terms]
        if any(not p for p in poss):
            continue
        if len(terms) == 1:
            out.append(did)
            continue

        def chain(i, prev):
            nxt = [p for p in poss[i] if p > prev]
            if not nxt:
                return None
            if i == len(poss) - 1:
                return nxt[0]
            # greedy earliest successor is optimal for min final pos
            return chain(i + 1, nxt[0])

        best = None
        for p0 in poss[0]:
            end = chain(1, p0)
            if end is not None and end - p0 <= slop + len(terms) - 1:
                best = did
                break
        if best is not None:
            out.append(did)
    return sorted(out)


ORDERED_CASES = [
    (["hash", "join"], 0),       # adjacency, ordered
    (["hash", "join"], 3),
    (["join", "hash"], 3),       # reverse order: different set
    (["customer", "line", "agg"], 8),
    (["scan", "scan"], 2),       # duplicate term
    (["the"], 0),                # single term
    (["zzz", "table"], 4),       # absent term
]


def test_match_ordered_equals_python(pos_index, doc_tokens):
    from defactonlp_ray.stages.phrase import match_ordered

    reader = IndexReader(pos_index)
    for terms, slop in ORDERED_CASES:
        ref = _py_ordered(doc_tokens, terms, slop)
        got = match_ordered(reader, reader.seg_ids, terms, slop)
        assert got.tolist() == ref, (terms, slop)


def test_ordered_subset_of_window(pos_index):
    """Every ordered match is an unordered window match at
    w = slop + m (same span budget without the order constraint)."""
    from defactonlp_ray.stages.phrase import match_ordered, match_window

    reader = IndexReader(pos_index)
    for terms, slop in [(["hash", "join"], 2), (["data", "query"], 4)]:
        o = match_ordered(reader, reader.seg_ids, terms, slop)
        w = match_window(reader, reader.seg_ids, terms, slop + len(terms))
        assert np.isin(o, w).all(), (terms, slop)


def test_phrase_is_ordered_slop0(pos_index):
    """A 2-term exact phrase match is an ordered span-near match at
    slop=0 (adjacent, in order)."""
    from defactonlp_ray.stages.phrase import match_ordered

    reader = IndexReader(pos_index)
    phrase = ["table", "scan"]
    p_docs, _, _ = match_phrase(reader, reader.seg_ids, phrase)
    o_docs = match_ordered(reader, reader.seg_ids, phrase, 0)
    assert np.isin(p_docs, o_docs).all()


def test_syngraph_single_term_groups_equal_synonym_mode(pos_index):
    """A synonym-graph map whose members are all single terms must be
    bit-identical to the established synonym mode — the graph scorer is
    a strict extension."""
    import pyarrow as pa
    import ray.data

    from defactonlp_ray.stages.phrase import syngraph_search
    from defactonlp_ray.stages.search import search

    idx = pos_index
    queries = [(0, ["data", "query"]), (1, ["merge"])]
    syn = {"data": ["table"], "merge": ["sort"]}
    qds = lambda: ray.data.from_arrow(pa.table({
        "query_id": pa.array([q for q, _ in queries], pa.int64()),
        "terms": pa.array([t for _, t in queries], pa.list_(pa.string())),
    }))
    a = (
        syngraph_search(idx, qds(), syn, k=10, concurrency=2)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    b = (
        search(idx, qds(), k=10, mode="synonym", syn_map=syn, concurrency=2)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert a.equals(b)


def test_syngraph_phrase_tf_adds_to_group(pos_index):
    """A phrase member must raise the group's per-doc tf by the phrase
    occurrence count: score differs from the plain term exactly where
    the phrase matches."""
    import pyarrow as pa
    import ray.data

    from defactonlp_ray.stages.phrase import (
        match_phrase, syngraph_search,
    )
    from defactonlp_ray.stages.search import IndexReader

    idx = pos_index
    reader = IndexReader(idx)
    docs, cnt, _ = match_phrase(reader, reader.seg_ids, ["table", "scan"])
    assert docs.size > 0  # the fixture corpus contains this bigram
    qds = ray.data.from_arrow(pa.table({
        "query_id": pa.array([0], pa.int64()),
        "terms": pa.array([["query"]], pa.list_(pa.string())),
    }))
    with_rule = syngraph_search(
        idx, qds, {"query": [["table", "scan"]]}, k=10, concurrency=2
    ).to_pandas()
    without = syngraph_search(
        idx, qds, {}, k=10, concurrency=2
    ).to_pandas()
    assert not with_rule.equals(without)


# ------------------------------------ match_phrase_prefix / span_not

def _py_multi_phrase_counts(docs, fixed, alts):
    """Reference MultiPhrase counter: fixed words at consecutive offsets
    + any alternative at the last offset."""
    out = {}
    m = len(fixed)
    alt_set = set(alts)
    for did, toks in docs.items():
        c = 0
        for i in range(len(toks) - m):
            if toks[i : i + m] == fixed and toks[i + m] in alt_set:
                c += 1
        if c:
            out[did] = c
    return out


def test_match_phrase_prefix_equals_python(pos_index, doc_tokens):
    from defactonlp_ray.stages.phrase import match_phrase_prefix

    reader = IndexReader(pos_index)
    cases = [
        (["hash"], ["join", "joins"]),       # one absent alternative
        (["the", "table"], ["scan", "sort"]),
        ([], ["merge"]),                     # bare alt == plain term tf
        (["value"], []),                     # no alternatives -> empty
        (["zzz"], ["table"]),                # absent fixed -> empty
    ]
    for fixed, alts in cases:
        ref = {}
        for a in alts:
            for d, c in _py_phrase_counts(
                doc_tokens, fixed + [a]
            ).items():
                ref[d] = ref.get(d, 0) + c
        docs, counts, dls = match_phrase_prefix(
            reader, reader.seg_ids, fixed, alts
        )
        assert dict(zip(docs.tolist(), counts.tolist())) == ref, (fixed, alts)
        for d, dl in zip(docs.tolist(), dls.tolist()):
            assert dl == len(doc_tokens[d])


def test_span_not_equals_python(pos_index, doc_tokens):
    from defactonlp_ray.stages.phrase import score_span_not

    reader = IndexReader(pos_index)
    cases = [("hash", "join", 2), ("fast", "slow", 1),
             ("table", "zzz", 3), ("merge", "merge", 0), ("the", "the", 1)]
    for a, b, d in cases:
        ref = {}
        for did, toks in doc_tokens.items():
            bpos = [i for i, t in enumerate(toks) if t == b]
            c = sum(
                1
                for i, t in enumerate(toks)
                if t == a and not any(abs(i - j) <= d for j in bpos)
            )
            if c:
                ref[did] = c
        got = {
            doc: n
            for _s, doc, n in score_span_not(
                reader, reader.seg_ids, a, b, d, k=10**9
            )
        }
        assert got == ref, (a, b, d)


def test_span_not_self_exclusion_empty(pos_index):
    from defactonlp_ray.stages.phrase import score_span_not

    reader = IndexReader(pos_index)
    assert score_span_not(reader, reader.seg_ids, "table", "table", 0, 10) == []


# --------------------------------------------------------- span_first


def test_span_first_equals_python(pos_index, doc_tokens):
    from defactonlp_ray.stages.phrase import score_span_first

    reader = IndexReader(pos_index)
    cases = [("hash", 3), ("the", 1), ("data", 10), ("zzz", 4),
             ("table", 10**9)]
    for t, n in cases:
        ref = {}
        for did, toks in doc_tokens.items():
            c = sum(1 for i, w in enumerate(toks[:n]) if w == t)
            if c:
                ref[did] = c
        got = {
            doc: cnt
            for _s, doc, cnt in score_span_first(
                reader, reader.seg_ids, t, n, k=10**9
            )
        }
        assert got == ref, (t, n)


def test_span_first_whole_doc_equals_plain_tf(pos_index, doc_tokens):
    """first_n >= max doc length degenerates to the plain pseudo-term
    tf of the term (every occurrence survives)."""
    from defactonlp_ray.stages.phrase import score_span_first

    reader = IndexReader(pos_index)
    got = {
        doc: cnt
        for _s, doc, cnt in score_span_first(
            reader, reader.seg_ids, "table", 10**9, k=10**9
        )
    }
    ref = {
        did: toks.count("table")
        for did, toks in doc_tokens.items()
        if "table" in toks
    }
    assert got == ref


# ----------------------------------------------------- span_containing


def test_span_containing_equals_python(pos_index, doc_tokens):
    from defactonlp_ray.stages.phrase import score_span_containing

    reader = IndexReader(pos_index)
    cases = [
        ("hash", "join", 3, "the"),
        ("table", "scan", 5, "data"),
        ("the", "data", 2, "zzqq"),
        ("the", "data", 4, "the"),   # little == a big member
        ("hash", "join", 0, "hash"),  # gap 0: same-position impossible
    ]
    for a, b, g, c in cases:
        ref = {}
        for did, toks in doc_tokens.items():
            pa_pos = [i for i, t in enumerate(toks) if t == a]
            pb_pos = [i for i, t in enumerate(toks) if t == b]
            pc_pos = [i for i, t in enumerate(toks) if t == c]
            n = sum(
                1
                for i in pa_pos
                for j in pb_pos
                if abs(i - j) <= g
                and any(min(i, j) <= p <= max(i, j) for p in pc_pos)
            )
            if n:
                ref[did] = n
        got = {
            doc: n
            for _s, doc, n in score_span_containing(
                reader, reader.seg_ids, a, b, g, c, k=10**9
            )
        }
        assert got == ref, (a, b, g, c)


def test_span_containing_rejects_same_big_terms(pos_index):
    from defactonlp_ray.stages.phrase import score_span_containing

    reader = IndexReader(pos_index)
    with pytest.raises(ValueError):
        score_span_containing(
            reader, reader.seg_ids, "table", "table", 2, "the", 10
        )


# --------------------------------------------------------- span_within


def test_span_within_equals_python(pos_index, doc_tokens):
    from defactonlp_ray.stages.phrase import score_span_within

    reader = IndexReader(pos_index)
    cases = [
        ("hash", "join", 3, "the"),
        ("table", "scan", 5, "data"),
        ("the", "data", 2, "zzqq"),
        ("the", "data", 4, "the"),   # little == a big member
        ("hash", "join", 0, "hash"),  # gap 0: same-position impossible
    ]
    for a, b, g, c in cases:
        ref = {}
        for did, toks in doc_tokens.items():
            pa_pos = [i for i, t in enumerate(toks) if t == a]
            pb_pos = [i for i, t in enumerate(toks) if t == b]
            pc_pos = [i for i, t in enumerate(toks) if t == c]
            # DISTINCT little positions enclosed by >= 1 big span
            n = sum(
                1
                for p in pc_pos
                if any(
                    abs(i - j) <= g and min(i, j) <= p <= max(i, j)
                    for i in pa_pos
                    for j in pb_pos
                )
            )
            if n:
                ref[did] = n
        got = {
            doc: n
            for _s, doc, n in score_span_within(
                reader, reader.seg_ids, a, b, g, c, k=10**9
            )
        }
        assert got == ref, (a, b, g, c)


def test_span_within_rejects_same_big_terms(pos_index):
    from defactonlp_ray.stages.phrase import score_span_within

    reader = IndexReader(pos_index)
    with pytest.raises(ValueError):
        score_span_within(
            reader, reader.seg_ids, "table", "table", 2, "the", 10
        )


def test_categorize_keys_masks_digit_runs():
    import pyarrow as pa_mod
    from defactonlp_ray.pipelines.queries import categorize_keys

    keys = categorize_keys(pa_mod.array([
        "Error 404 at line 731 in module x",
        "error 500 at line 9 somewhere else",
        "one two",
        "",
    ])).to_pylist()
    # digit runs of any length drain to '#': both errors share a key
    assert keys[0] == "error # at line"
    assert keys[1] == "error # at line"
    # shorter than _CAT_NTOK tokens: key is what exists
    assert keys[2] == "one two"
    assert keys[3] == ""


# ----------------------------------------------------------- terms_set


def _py_terms_set(doc_tokens, terms, k, mod=3):
    """Reference: OR candidates filtered by the per-doc requirement
    (1 + doc_id % mod distinct matching terms), boolean-OR scoring."""
    base = _py_boolean(doc_tokens, [], terms, [], k=10**9)
    uniq = sorted(set(terms))
    out = []
    for score, did in base:
        nm = sum(t in set(doc_tokens[did]) for t in uniq)
        if nm >= 1 + did % mod:
            out.append((score, did))
    return out[:k]


TERMS_SET_CASES = [
    ["data", "query", "fast"],
    ["scan", "merge", "sort", "window"],
    ["data"],                 # single term: only required==1 docs
    ["zzz", "data", "sort"],  # absent member never counts
    ["zzz"],                  # nothing matches at all
]


def test_terms_set_matches_python(pos_index, doc_tokens):
    from defactonlp_ray.stages.phrase import score_terms_set

    reader = IndexReader(pos_index)
    for terms in TERMS_SET_CASES:
        ref = _py_terms_set(doc_tokens, terms, k=10)
        got = score_terms_set(reader, reader.seg_ids, terms, k=10)
        assert got == ref, terms


def test_terms_set_requirement_actually_gates(pos_index, doc_tokens):
    """With req_mod=1 every candidate needs just one match (== plain OR
    boolean); the default mod=3 must be a strict subset whenever some
    candidate has doc_id % 3 > its match count - 1."""
    from defactonlp_ray.stages.phrase import score_terms_set

    reader = IndexReader(pos_index)
    terms = ["data", "query", "fast"]
    loose = dict(
        (d, s) for s, d in score_terms_set(
            reader, reader.seg_ids, terms, k=10**9, req_mod=1)
    )
    tight = dict(
        (d, s) for s, d in score_terms_set(
            reader, reader.seg_ids, terms, k=10**9)
    )
    assert set(tight) <= set(loose)
    assert all(loose[d] == s for d, s in tight.items())
    assert len(tight) < len(loose)
