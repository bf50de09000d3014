"""Round-3 regression tests: ADVICE fixes (ANN dup-candidate eviction,
empty-batch guards, codec bounds guard) + vectorized lang-id parity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from defactonlp_ray.functions.textstats import lang_id, lang_id_batch
from defactonlp_ray.stages import ann
from defactonlp_ray.stages.codec import encode_postings_batch


def test_lang_id_batch_equals_scalar(sf_dir):
    import os

    import pyarrow.parquet as pq

    texts = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )["text"].to_pylist()
    texts += [
        "", " der der der ", "schschsch", "the the der und ist das",
        "a one 一 mixed", "xyzzy", "le la les des est une",
    ]
    arr = pa.array(texts, pa.string())
    assert lang_id_batch(arr).to_pylist() == [lang_id(t) for t in texts]


def test_hash_str_array_vectorized_matches_scalar_fnv():
    from defactonlp_ray.functions.hashing import hash_str_array, splitmix64

    def scalar(strs):
        out = np.empty(len(strs), dtype=np.uint64)
        for i, s in enumerate(strs):
            h = 0xCBF29CE484222325
            for b in s.encode("utf-8"):
                h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            out[i] = h
        return splitmix64(out)

    import random
    import string

    rng = random.Random(11)
    cases = ["", "a", "héllo wörld 中文", "x" * 300] + [
        "".join(rng.choice(string.printable) for _ in range(rng.randint(0, 60)))
        for _ in range(300)
    ]
    assert np.array_equal(hash_str_array(cases), scalar(cases))
    # sliced arrow input (non-zero buffer offset)
    arr = pa.array(cases, pa.string()).slice(5, 200)
    assert np.array_equal(hash_str_array(arr), scalar(cases[5:205]))
    assert hash_str_array([]).size == 0


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.lists(st.text(max_size=48), max_size=80))
    @settings(max_examples=50, deadline=None)
    def test_hash_str_array_property(strs):
        from defactonlp_ray.functions.hashing import hash_str_array, splitmix64

        out = np.empty(len(strs), dtype=np.uint64)
        for i, s in enumerate(strs):
            h = 0xCBF29CE484222325
            for b in s.encode("utf-8"):
                h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            out[i] = h
        assert np.array_equal(hash_str_array(strs), splitmix64(out))

    @given(st.lists(st.text(max_size=64), max_size=40))
    @settings(max_examples=50, deadline=None)
    def test_rolling_fingerprint_property(strs):
        from defactonlp_ray.functions.hashing import (
            rolling_fingerprint, rolling_fingerprint_column,
        )

        vec = rolling_fingerprint_column(pa.array(strs, pa.string()))
        scal = np.array([rolling_fingerprint(t) for t in strs], dtype=np.int64)
        assert np.array_equal(vec, scal)

    @given(
        st.lists(
            st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta", "x1"]),
                     max_size=12).map(" ".join),
            max_size=25,
        )
    )
    @settings(max_examples=40, deadline=None)
    def test_minhash_batch_property(texts):
        from defactonlp_ray.stages.dedup import (
            minhash_signature, minhash_signatures_column,
        )

        batch = minhash_signatures_column(pa.array(texts, pa.string()))
        scal = (
            np.stack([minhash_signature(t) for t in texts])
            if texts
            else np.empty((0, 128), np.uint64)
        )
        assert np.array_equal(batch, scal)
except ImportError:  # pragma: no cover
    pass


def test_split_sentences_column_matches_scalar():
    from defactonlp_ray import fixtures
    from defactonlp_ray.stages.sentences import (
        split_sentences, split_sentences_column,
    )

    texts = fixtures.make_pages(120)["text"].to_pylist()
    texts += ["", "a. b. c", "line\nline2. x", ".", ". ", "\n\n",
              "  padded . ok ", "e f. g", "tail. "]
    sents, rows, sids = split_sentences_column(pa.array(texts, pa.string()))
    per_row: dict[int, list] = {}
    for s, r, i in zip(sents.to_pylist(), rows.tolist(), sids.tolist()):
        per_row.setdefault(int(r), []).append((i, s))
    for r, t in enumerate(texts):
        have = [s for _, s in sorted(per_row.get(r, []))]
        assert have == split_sentences(t), (r, t)


def test_rolling_fingerprint_column_matches_scalar():
    from defactonlp_ray import fixtures
    from defactonlp_ray.functions.hashing import (
        rolling_fingerprint, rolling_fingerprint_column,
    )

    texts = fixtures.make_pages(100)["text"].to_pylist()
    texts += ["", "short", "exactly8", "ninebytes", "中文字符串测试一下", "x" * 7]
    vec = rolling_fingerprint_column(pa.array(texts, pa.string()))
    scal = np.array([rolling_fingerprint(t) for t in texts], dtype=np.int64)
    assert np.array_equal(vec, scal)
    # scalar engine kernel == pinned serial spec
    from defactonlp_ray.pipelines.pinned import serial_rolling_fingerprint

    assert all(
        rolling_fingerprint(t) == serial_rolling_fingerprint(t) for t in texts
    )


def test_minhash_batch_matches_scalar():
    from defactonlp_ray import fixtures
    from defactonlp_ray.stages.dedup import (
        minhash_signature, minhash_signatures_column,
    )

    texts = fixtures.make_pages(150)["text"].to_pylist()
    texts += ["", "one two", "a b c d e", "x " * 40, "单 字", "   ", "a"]
    arr = pa.array(texts, pa.string())
    batch = minhash_signatures_column(arr)
    scal = np.stack([minhash_signature(t) for t in texts])
    assert np.array_equal(batch, scal)


def test_simhash_batch_matches_scalar():
    from defactonlp_ray import fixtures
    from defactonlp_ray.stages.dedup import simhash64, simhash_column

    texts = fixtures.make_pages(150)["text"].to_pylist()
    texts += ["", "one two", "a b c d e", "x " * 40, "单 字", "   "]
    arr = pa.array(texts, pa.string())
    batch = simhash_column(arr)
    scal = np.array([simhash64(t) for t in texts], dtype=np.uint64)
    assert np.array_equal(batch, scal)


def test_encode_postings_batch_rejects_empty_term():
    docs = np.array([1, 3, 7], dtype=np.int64)
    tfs = np.array([1, 2, 1], dtype=np.int64)
    dls = np.array([5, 5, 5], dtype=np.int64)
    # bounds with a repeated index = an empty term
    with pytest.raises(ValueError, match="strictly increasing"):
        encode_postings_batch(docs, tfs, dls, np.array([0, 2, 2, 3]))


def test_ivf_assign_matmul_matches_broadcast_form():
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((500, 24))
    cent = rng.standard_normal((32, 24))
    naive = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    assert np.array_equal(ann.ivf_assign(vecs, cent), naive.astype(np.int64))


def _vec_table(vecs: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float64())
            ),
        }
    )


def test_knn_lsh_indexed_dedups_multitable_copies(tmp_path):
    # 16 near-identical vectors: every vector lands in the query's bucket
    # in EVERY table, so one batch bundling all tbl= partitions
    # (override_num_blocks=1) holds n_tables copies of each candidate.
    # Pre-fix, the per-batch top-k filled its slots with copies of the
    # lowest ids and the driver dedup could not recover the evicted
    # distinct candidates.
    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    vecs = base[None, :] + 1e-6 * rng.standard_normal((16, 16))
    ann.build_lsh_index(
        ray.data.from_arrow(_vec_table(vecs)), str(tmp_path / "idx"),
        n_bits=2, n_tables=8,
    )
    res = ann.knn_lsh_indexed(
        str(tmp_path / "idx"), vecs[:1], k=4, n_bits=2, n_tables=8,
        override_num_blocks=1,
    )
    got = res[res["query_id"] == 0]
    assert len(got) == 4
    assert got["vec_id"].is_unique
    # all cosines round to 1.0 -> tie order is by vec_id
    assert got["vec_id"].tolist() == [0, 1, 2, 3]


def test_wand_maxscore_split_on_rare_plus_head_query():
    # 3000 docs: a head term everywhere, a rare term in 20 docs — theta
    # fills from rare-term docs and the head list goes NON-essential
    # (the MaxScore split inside the interval sweep), so this exercises
    # the candidate-lookup scoring path against the exhaustive oracle.
    from defactonlp_ray import oracle
    from defactonlp_ray.stages import search as S
    from defactonlp_ray.stages.codec import encode_postings

    rng = np.random.default_rng(11)
    docs = {}
    rare_ids = set(rng.choice(3000, size=20, replace=False).tolist())
    for i in range(3000):
        body = "head " * int(rng.integers(1, 4))
        if i in rare_ids:
            body += "rareterm " * int(rng.integers(1, 6))
        docs[i] = body.strip()
    oidx = oracle.OracleIndex(docs)

    class FakeReader:
        n_docs = oidx.n_docs
        avgdl = oidx.avgdl

        def postings(self, sid, term):
            plist = oidx.postings.get(term)
            if not plist:
                return None
            dids = np.array([d for d, _ in plist], dtype=np.int64)
            tfs = np.array([c for _, c in plist], dtype=np.int64)
            dls = np.array([oidx.doc_len[d] for d, _ in plist], dtype=np.int64)
            row = encode_postings(dids, tfs, dls)
            row["decoded"] = (dids, tfs, dls)
            return row

    reader = FakeReader()
    for q in (["rareterm", "head"], ["rareterm"], ["head"]):
        uniq = sorted(set(q))
        idfs = {t: oidx.idf(t) for t in uniq}
        got = S.score_segment_wand(reader, 0, uniq, idfs, 5)
        assert [(d, s) for s, d in got] == oidx.bm25_topk(q, 5)


def test_url_dedup_join_route_equals_broadcast():
    from defactonlp_ray import fixtures
    from defactonlp_ray.stages import dedup

    pages = ray.data.from_arrow(fixtures.make_pages(600)).drop_columns(["html"])

    def norm(df):
        return (
            df.sort_values(["url", "warc_ts", "text"])
            .reset_index(drop=True)[sorted(df.columns)]
        )

    rb = norm(dedup.url_dedup_latest(pages, route="broadcast").to_pandas())
    rj = norm(dedup.url_dedup_latest(pages, route="join").to_pandas())
    assert len(rb) > 0
    assert rb.equals(rj)


def test_exact_dedup_join_route_equals_broadcast(sf_dir):
    from defactonlp_ray.sources.readers import read_table
    from defactonlp_ray.stages import dedup

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def norm(df):
        return df.sort_values("doc_id").reset_index(drop=True)[
            ["doc_id", "text"]
        ]

    b = norm(dedup.exact_dedup(docs, route="broadcast").to_pandas())
    j = norm(dedup.exact_dedup(docs, route="join").to_pandas())
    assert len(b) > 0
    assert b.equals(j)


def test_verify_jaccard_join_route_equals_broadcast(sf_dir):
    from defactonlp_ray.sources.readers import read_table
    from defactonlp_ray.stages import dedup

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    cand = dedup.minhash_lsh_candidates(docs).materialize()

    def norm(df):
        return (
            df.sort_values(["id_a", "id_b"]).reset_index(drop=True)
            [["id_a", "id_b", "jaccard"]]
            .astype({"id_a": np.int64, "id_b": np.int64})
        )

    b = dedup.verify_jaccard_pairs(
        cand, docs, threshold=0.5, route="broadcast"
    ).to_pandas()
    j = dedup.verify_jaccard_pairs(
        cand, docs, threshold=0.5, route="join"
    ).to_pandas()
    assert len(b) > 0
    assert norm(b).equals(norm(j))


def _mk_doc_table(n):
    from defactonlp_ray import fixtures

    pages = fixtures.make_pages(n)
    return pa.table(
        {"doc_id": pa.array(range(n), pa.int64()), "text": pages["text"]}
    )


def _search_key(idx, n_queries=20, k=10, **kw):
    from defactonlp_ray import fixtures
    from defactonlp_ray.stages import search as S

    queries = fixtures.make_query_terms(n_queries)
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([q for q, _ in queries], pa.int64()),
                "terms": pa.array([t for _, t in queries], pa.list_(pa.string())),
            }
        )
    )
    return sorted(tuple(r.values()) for r in S.search(idx, qds, k=k, **kw).take_all())


def test_append_compact_equals_full_build(tmp_path):
    from defactonlp_ray.stages.index_build import (
        append_index, build_index, compact_index,
    )

    tbl = _mk_doc_table(1200)
    idx_full = str(tmp_path / "full")
    idx_ac = str(tmp_path / "ac")
    build_index(ray.data.from_arrow(tbl), idx_full, seg_docs=256)
    build_index(ray.data.from_arrow(tbl.slice(0, 700)), idx_ac, seg_docs=256)
    append_index(ray.data.from_arrow(tbl.slice(700)), idx_ac, seg_docs=256)
    want = _search_key(idx_full)
    assert _search_key(idx_ac) == want  # append alone
    n = compact_index(idx_ac, target_seg_docs=512)
    assert n >= 1
    assert _search_key(idx_ac) == want  # compacted
    assert _search_key(idx_ac, mode="wand") == want
    # appending ids that are already indexed (post-compaction) must raise
    with pytest.raises(ValueError, match="overlap"):
        append_index(ray.data.from_arrow(tbl.slice(700)), idx_ac, seg_docs=256)


def test_compaction_recodes_to_pfor(tmp_path):
    # compaction doubles as codec migration: merged segments re-encode
    # through encode_postings_batch with the requested codec
    import json
    import os

    from defactonlp_ray.sources import manifest as mf
    from defactonlp_ray.stages.index_build import build_index, compact_index

    tbl = _mk_doc_table(800)
    idx = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(tbl), idx, seg_docs=200, codec="varint")
    want = _search_key(idx)
    n = compact_index(idx, target_seg_docs=400, codec="pfor")
    assert n >= 1
    recs = mf.read_manifest(idx)
    for sid, rec in recs.items():
        if rec.get("merged_from"):
            with open(os.path.join(mf.segment_dir(idx, sid), "meta.json")) as f:
                assert json.load(f)["codec"] == "pfor"
    assert _search_key(idx) == want
    assert _search_key(idx, mode="wand") == want


def test_compaction_crash_windows_and_resume(tmp_path):
    from defactonlp_ray.sources import manifest as mf
    from defactonlp_ray.stages.index_build import (
        COMPACT_SID_BASE, _merge_group, build_index, compact_index,
    )

    tbl = _mk_doc_table(1000)
    idx = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(tbl), idx, seg_docs=200)
    want = _search_key(idx)
    before = dict(mf.read_manifest(idx))

    # crash window A: merged dir written but never published — invisible
    group = mf.live_segment_order(before)[:2]
    _merge_group(idx, group, COMPACT_SID_BASE, "varint")
    assert mf.read_manifest(idx).keys() == before.keys()
    assert _search_key(idx) == want
    # resume: a full compaction over the same index still succeeds and
    # stays result-identical (the orphan dir is reclaimed or ignored)
    n = compact_index(idx, target_seg_docs=400)
    assert n >= 1
    assert _search_key(idx) == want

    # crash window B: published transition but old dirs not yet GC'd —
    # tombstones hide them even though the dirs exist
    idx2 = str(tmp_path / "idx2")
    build_index(ray.data.from_arrow(tbl), idx2, seg_docs=200)
    n = compact_index(idx2, target_seg_docs=400, gc=False)
    assert n >= 1
    recs = mf.read_manifest(idx2)
    import os

    for sid in recs:
        assert recs[sid].get("merged_from") or True
    # some retired dirs still on disk, none live
    seg_root = os.path.join(idx2, "segments")
    on_disk = {int(d.split("=")[1]) for d in os.listdir(seg_root) if d.startswith("seg=")}
    assert on_disk - set(recs), "expected tombstoned dirs awaiting GC"
    assert _search_key(idx2) == want
    # GC collects exactly the tombstoned dirs; results unchanged
    n_gc = mf.gc_retired(idx2)
    assert n_gc == len(on_disk - set(recs))
    left = {int(d.split("=")[1]) for d in os.listdir(seg_root) if d.startswith("seg=")}
    assert left == set(recs)
    assert _search_key(idx2) == want


def test_append_resumes_after_partial_crash(tmp_path):
    import shutil

    from defactonlp_ray.sources import manifest as mf
    from defactonlp_ray.stages.index_build import append_index, build_index

    tbl = _mk_doc_table(900)
    idx_full = str(tmp_path / "full")
    idx = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(tbl), idx_full, seg_docs=200)
    build_index(ray.data.from_arrow(tbl.slice(0, 500)), idx, seg_docs=200)
    append_index(ray.data.from_arrow(tbl.slice(500)), idx, seg_docs=200)
    # simulate a crash that lost one appended segment dir
    appended = [s for s in mf.read_manifest(idx) if s >= (1 << 40)]
    shutil.rmtree(mf.segment_dir(idx, appended[0]))
    # re-running the SAME append rebuilds only the missing segment
    append_index(ray.data.from_arrow(tbl.slice(500)), idx, seg_docs=200)
    assert _search_key(idx) == _search_key(idx_full)


def test_write_stats_distributed_branch_equals_driver(tmp_path, monkeypatch):
    # force the >limit distributed groupby branch on a small corpus and
    # assert it produces the same term_df + search results as the
    # driver-side pyarrow branch
    import pyarrow.parquet as pq

    from defactonlp_ray.stages.index_build import build_index

    tbl = _mk_doc_table(600)
    idx_a = str(tmp_path / "driver")
    idx_b = str(tmp_path / "dist")
    build_index(ray.data.from_arrow(tbl), idx_a, seg_docs=200)
    monkeypatch.setenv("DFR_STATS_DRIVER_LIMIT", "0")
    build_index(ray.data.from_arrow(tbl), idx_b, seg_docs=200)
    monkeypatch.delenv("DFR_STATS_DRIVER_LIMIT")
    ta = pq.read_table(f"{idx_a}/stats/term_df").to_pandas()
    tb = pq.read_table(f"{idx_b}/stats/term_df").to_pandas()
    norm = lambda d: d.sort_values("term").reset_index(drop=True)[["term", "df", "cf"]]
    assert norm(ta).equals(norm(tb))
    assert _search_key(idx_a) == _search_key(idx_b)


def test_lsh_and_ivf_builders_tolerate_empty_blocks(tmp_path):
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((6, 8))
    ds = (
        ray.data.from_arrow(_vec_table(vecs))
        .repartition(6)
        .filter(lambda r: r["vec_id"] < 2)
    )
    ann.build_lsh_index(ds, str(tmp_path / "lsh"), n_bits=2, n_tables=2)
    ann.build_ivf_index(ds, str(tmp_path / "ivf"), n_lists=2, sample_size=4)
    res = ann.knn_lsh_indexed(
        str(tmp_path / "lsh"), vecs[:1], k=2, n_bits=2, n_tables=2
    )
    assert set(res["vec_id"]) <= {0, 1}


# --------------------------- connected components (near-dup clusters)

def _cc_pandas(pairs):
    from defactonlp_ray.stages.dedup import connected_components

    tbl = pa.table({
        "id_a": pa.array([a for a, _ in pairs], pa.int64()),
        "id_b": pa.array([b for _, b in pairs], pa.int64()),
    })
    out = connected_components(ray.data.from_arrow(tbl)).to_pandas()
    if len(out) == 0:  # Ray renders an all-empty Dataset as a 0x0 frame
        return {}
    return dict(zip(out["node"], out["label"]))


def test_connected_components_chain_and_islands():
    # a 6-node chain (diameter 5 -> exercises multiple BSP rounds), a
    # triangle, and an isolated pair; labels = min id per component
    pairs = [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15),
             (20, 21), (21, 22), (20, 22),
             (30, 31)]
    got = _cc_pandas(pairs)
    assert got == {
        **{n: 10 for n in range(10, 16)},
        **{n: 20 for n in range(20, 23)},
        30: 30, 31: 30,
    }


def test_connected_components_merge_through_bridge():
    # two clusters that a single late edge merges: propagation must cross
    # the bridge in both directions
    pairs = [(1, 2), (3, 4), (2, 3)]
    got = _cc_pandas(pairs)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_connected_components_empty_pairs():
    got = _cc_pandas([])
    assert got == {}


def test_suggest_prefix_cap_and_miss(tmp_path):
    from defactonlp_ray.stages.expand import suggest_prefix
    from defactonlp_ray.stages.index_build import build_index

    texts = ["alpha alpha alpha beta", "alpine beta beta", "gamma alpha"]
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    idx = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(tbl), idx, seg_docs=2)
    out = suggest_prefix(idx, [(0, "al"), (1, "b"), (2, "zz")], k=1)
    # cf: alpha=4, alpine=1, beta=3 -> "al" caps to alpha; "zz" absent
    assert list(out["query_id"]) == [0, 1]
    assert list(out["term"]) == ["alpha", "beta"]
    assert list(out["cf"]) == [4, 3]
    assert list(out["rank"]) == [1, 1]


# ----------------------------------------- sort-by-field (mode=sortfield)


def test_sortfield_matches_python_and_respects_deletes(tmp_path):
    from defactonlp_ray.functions.tokenizer import tokenize
    from defactonlp_ray.stages.deletes import delete_docs
    from defactonlp_ray.stages.index_build import build_index
    from defactonlp_ray.stages.search import IndexReader, score_all_sortfield

    texts = [
        "data query",                      # dl 2
        "data data data query merge",      # dl 5
        "merge sort scan filter",          # dl 4
        "query",                           # dl 1
        "unrelated words entirely",        # dl 3, never matches
    ]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))
    idx = str(tmp_path / "idx")
    build_index(docs, idx, seg_docs=2, resume=False)

    def ref(terms, k=10, dead=()):
        cand = [
            (len(tokenize(t)), d)
            for d, t in enumerate(texts)
            if d not in dead and set(tokenize(t)) & set(terms)
        ]
        cand.sort(key=lambda x: (-x[0], x[1]))
        return [(float(dl), d) for dl, d in cand[:k]]

    reader = IndexReader(idx)
    for terms in (["data", "query"], ["merge"], ["zzz"]):
        got = score_all_sortfield(reader, reader.seg_ids, sorted(terms), 10)
        assert got == ref(terms), terms
    # k bound + doc_id tiebreak at equal dl
    got = score_all_sortfield(reader, reader.seg_ids, ["data", "query"], 2)
    assert got == ref(["data", "query"], k=2)
    # deleted docs drop out of the sorted match set
    delete_docs(idx, [1])
    reader2 = IndexReader(idx)
    got = score_all_sortfield(reader2, reader2.seg_ids, ["data", "query"], 10)
    assert got == ref(["data", "query"], dead={1})


# ------------------------------------------- boosted queries (BoostQuery)


def test_boost_one_is_bit_identical_to_plain_bm25(tmp_path):
    from defactonlp_ray.stages.index_build import build_index
    from defactonlp_ray.stages.search import (
        BoostedSearcherActor, IndexReader, score_all_taat,
    )

    texts = ["data query fast", "data data merge", "query sort", "merge"]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))
    idx = str(tmp_path / "idx")
    build_index(docs, idx, seg_docs=2, resume=False)
    reader = IndexReader(idx)
    terms = sorted(["data", "query"])
    reader.dfs(terms)  # prime the df cache (idf() contract)
    plain = score_all_taat(
        reader, reader.seg_ids, terms,
        {t: reader.idf(t) for t in terms}, 10,
    )
    actor = BoostedSearcherActor(idx, k=10)
    batch = pa.table({
        "query_id": pa.array([0], pa.int64()),
        "terms": pa.array([terms], pa.list_(pa.string())),
        "boosts": pa.array([[1.0, 1.0]], pa.list_(pa.float64())),
    })
    got = actor(batch).to_pandas()
    assert list(zip(got["score"], got["doc_id"])) == plain  # bit-exact
    # a large boost on a term reorders toward docs containing it
    b2 = actor(pa.table({
        "query_id": pa.array([0], pa.int64()),
        "terms": pa.array([["data", "query"]], pa.list_(pa.string())),
        "boosts": pa.array([[100.0, 1.0]], pa.list_(pa.float64())),
    })).to_pandas()
    assert b2.iloc[0]["doc_id"] == 1  # the data-heaviest doc wins
    # mismatched lengths rejected
    import pytest as _pytest
    with _pytest.raises(ValueError):
        actor(pa.table({
            "query_id": pa.array([0], pa.int64()),
            "terms": pa.array([["data"]], pa.list_(pa.string())),
            "boosts": pa.array([[1.0, 2.0]], pa.list_(pa.float64())),
        }))


# ----------------------------- federated search (MultiReader shape)


def test_federated_shards_bit_equal_single_index(tmp_path):
    from defactonlp_ray import fixtures
    from defactonlp_ray.stages.index_build import build_index
    from defactonlp_ray.stages.search import (
        FederatedSearcherActor, IndexReader, federated_stats, score_all_taat,
    )

    pages = fixtures.make_pages(600)
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(600), pa.int64()),
        "text": pages["text"],
    }))
    single = str(tmp_path / "single")
    build_index(docs, single, seg_docs=128, resume=False)
    lo = str(tmp_path / "lo")
    hi = str(tmp_path / "hi")
    build_index(docs.filter(expr="doc_id < 300"), lo, seg_docs=128, resume=False)
    build_index(docs.filter(expr="doc_id >= 300"), hi, seg_docs=128, resume=False)

    # combined stats reproduce the unified build's stats exactly
    r_single = IndexReader(single)
    n, avgdl, total = federated_stats([lo, hi])
    assert (n, avgdl, total) == (
        r_single.n_docs, r_single.avgdl, r_single.total_len
    )

    actor = FederatedSearcherActor([lo, hi], k=10)
    terms_sets = [["data", "query", "fast"], ["merge", "sort"], ["zzz"]]
    batch = pa.table({
        "query_id": pa.array(range(len(terms_sets)), pa.int64()),
        "terms": pa.array(terms_sets, pa.list_(pa.string())),
    })
    fed = actor(batch).to_pandas()
    for qid, terms in enumerate(terms_sets):
        uniq = sorted(set(terms))
        r_single.dfs(uniq)
        idfs = {t: r_single.idf(t) for t in uniq}
        plain = score_all_taat(r_single, r_single.seg_ids, uniq, idfs, 10)
        g = fed[fed["query_id"] == qid]
        assert list(zip(g["score"], g["doc_id"])) == plain, terms  # bit-exact


# -------------------------------- filtered kNN (metadata predicate)


def test_filtered_knn_is_prefiltered_not_postfiltered(tmp_path):
    """Pre-filtering must return k results from WITHIN the allowed set
    even when the global top-k is dominated by disallowed vectors —
    the case where post-filtering a top-k comes back short."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal(8)
    # 20 vectors nearly parallel to the query (label 0, disallowed),
    # 5 orthogonal-ish ones (label 1, allowed)
    near = base + 0.01 * rng.standard_normal((20, 8))
    far = rng.standard_normal((5, 8))
    vecs = np.vstack([near, far])
    labels = np.array([0] * 20 + [1] * 5)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(25), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64())),
        "label": pa.array(labels, pa.int32()),
    })
    ds = ray.data.from_arrow(tbl).filter(expr="label == 1")
    got = ann.knn_brute(ds, base[None, :], k=5)
    assert len(got) == 5
    assert set(got["vec_id"]) == {20, 21, 22, 23, 24}  # only allowed ids
    # and the unfiltered search is dominated by the disallowed cluster
    full = ann.knn_brute(ray.data.from_arrow(tbl), base[None, :], k=5)
    assert set(full["vec_id"]) <= set(range(20))


def test_boosted_duplicate_terms_sum(tmp_path):
    """Duplicate boosted terms sum their boosts — the SQL-oracle and
    Lucene duplicate-clause semantics."""
    from defactonlp_ray.stages.index_build import build_index
    from defactonlp_ray.stages.search import BoostedSearcherActor

    texts = ["data query", "data data", "query"]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))
    idx = str(tmp_path / "idx")
    build_index(docs, idx, seg_docs=2, resume=False)
    actor = BoostedSearcherActor(idx, k=10)

    def run(terms, boosts):
        return actor(pa.table({
            "query_id": pa.array([0], pa.int64()),
            "terms": pa.array([terms], pa.list_(pa.string())),
            "boosts": pa.array([boosts], pa.list_(pa.float64())),
        })).to_pandas()

    dup = run(["data", "data"], [2.0, 1.0])
    single = run(["data"], [3.0])
    assert dup.equals(single)


# ------------------------------------ MMR diversification (re-rank)


def test_serial_mmr_suppresses_near_duplicates(tmp_path):
    import os

    import pyarrow.parquet as pq

    from defactonlp_ray.pipelines.pinned import serial_bm25_mmr

    # docs 0, 1, 2: identical relevance; 0 and 1 near-identical vectors,
    # 2 an independent vector -> MMR must demote the near-dup 1
    texts = ["data query data", "data query data", "data query data",
             "unrelated filler here"]
    rng = np.random.default_rng(5)
    v0 = rng.standard_normal(8)
    vecs = [v0, v0 + 1e-6 * rng.standard_normal(8),
            rng.standard_normal(8), rng.standard_normal(8)]
    sf = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts),
    }), os.path.join(sf, "documents.parquet"))
    pq.write_table(pa.table({
        "vec_id": pa.array(range(4), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64())),
    }), os.path.join(sf, "embeddings.parquet"))
    res = serial_bm25_mmr(sf, [(0, ["data", "query"])], window=4, k=3)
    order = res.sort_values("rank")["doc_id"].tolist()
    assert order[0] == 0            # best relevance, no penalty yet
    assert order[1] == 2            # the near-dup of doc 0 is DEMOTED
    assert order[2] == 1
