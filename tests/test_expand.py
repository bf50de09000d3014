"""Term-expansion query tests (stages/expand.py): wildcard/prefix and
fuzzy (Levenshtein<=1) expansion over the index term dictionary.

Reference check model: a pure-Python DP Levenshtein and a regex
translation of SQL LIKE — the vectorized kernels must agree exactly;
end-to-end, an expansion search must equal ``boolean_search`` run over
the pre-expanded term list (Lucene's rewrite model)."""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data

from defactonlp_ray.stages.expand import (
    _ExpandMatcher,
    _lev1_rows,
    _str_bytes,
    expand_fuzzy,
    expand_regex,
    expand_wildcard,
    fuzzy_search,
    regex_search,
    wildcard_search,
)
from defactonlp_ray.stages.index_build import build_index
from defactonlp_ray.stages.phrase import boolean_search


# ------------------------------------------------------------ kernels


def _py_lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
            prev = cur
    return dp[-1]


_terms = st.lists(
    st.text(alphabet="abcde", min_size=1, max_size=6), min_size=1, max_size=40
)


@settings(max_examples=150, deadline=None)
@given(_terms, st.text(alphabet="abcde", min_size=1, max_size=6))
def test_lev1_rows_equals_python_dp(terms, q):
    arr = pa.array(terms, pa.string())
    offsets, data = _str_bytes(arr)
    lens = np.diff(offsets)
    got = set(_lev1_rows(offsets, data, lens, q.encode()).tolist())
    want = {i for i, t in enumerate(terms) if _py_lev(t, q) <= 1}
    assert got == want


def _like_regex(pat: str) -> re.Pattern:
    out = []
    for ch in pat:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return re.compile("^" + "".join(out) + "$", re.DOTALL)


@settings(max_examples=100, deadline=None)
@given(
    _terms,
    st.text(alphabet="abc%_", min_size=1, max_size=6),
)
def test_wildcard_matcher_equals_regex_like(terms, pat):
    dfs = list(range(1, len(terms) + 1))
    batch = pa.table(
        {"term": pa.array(terms, pa.string()), "df": pa.array(dfs, pa.int64())}
    )
    m = _ExpandMatcher([(0, pat)], "wildcard")
    got = set(m(batch)["term"].to_pylist())
    rx = _like_regex(pat)
    want = {t for t in terms if rx.match(t)}
    assert got == want


def test_matcher_empty_batch_and_unknown_kind():
    empty = pa.table(
        {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
    )
    out = _ExpandMatcher([(0, "a%")], "wildcard")(empty)
    assert out.num_rows == 0
    assert out.schema.names == ["query_id", "term", "df"]
    with pytest.raises(ValueError):
        _ExpandMatcher([], "soundex")


# ------------------------------------------------------- expansion stage


@pytest.fixture(scope="module")
def exp_index(sf_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("expidx"))
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    build_index(docs, idx, seg_docs=128, positions=True, resume=False)
    return idx


def test_expand_wildcard_against_dictionary(exp_index):
    import pyarrow.parquet as pq

    dict_tbl = pq.read_table(
        os.path.join(exp_index, "stats", "term_df"), columns=["term", "df"]
    )
    terms = dict_tbl["term"].to_pylist()
    got = expand_wildcard(exp_index, [(0, "s%"), (1, "zz%"), (2, "merge")])
    assert got[0] == sorted(t for t in terms if t.startswith("s"))
    assert got[1] == []
    assert got[2] == ["merge"]


def test_expand_cap_is_df_then_term(exp_index):
    import pyarrow.parquet as pq

    dict_tbl = (
        pq.read_table(
            os.path.join(exp_index, "stats", "term_df"), columns=["term", "df"]
        )
        .to_pandas()
    )
    s_terms = dict_tbl[dict_tbl["term"].str.startswith("s")]
    want = sorted(
        s_terms.sort_values(["df", "term"], ascending=[False, True])
        .head(3)["term"]
        .tolist()
    )
    got = expand_wildcard(exp_index, [(0, "s%")], max_expansions=3)
    assert got[0] == want


def test_expand_fuzzy_includes_exact_and_neighbours(exp_index):
    got = expand_fuzzy(
        exp_index, [(0, "merge"), (1, "spart"), (2, "quer"), (3, "zzz")]
    )
    assert got[0] == ["merge"]
    assert got[1] == ["part", "spark"]
    assert got[2] == ["query"]
    assert got[3] == []


# --------------------------------------------------------- end-to-end


def _pdres(ds) -> pd.DataFrame:
    return (
        ds.to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def test_wildcard_search_equals_boolean_over_expansion(exp_index):
    pats = [(0, "s%"), (1, "_a__"), (2, "zz%")]
    exp = expand_wildcard(exp_index, pats)
    got = _pdres(wildcard_search(exp_index, pats, k=15, concurrency=2))
    qids = sorted(exp)
    qtbl = pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "must": pa.array([[] for _ in qids], pa.list_(pa.string())),
            "should": pa.array([exp[q] for q in qids], pa.list_(pa.string())),
            "must_not": pa.array([[] for _ in qids], pa.list_(pa.string())),
        }
    )
    want = _pdres(
        boolean_search(exp_index, ray.data.from_arrow(qtbl), k=15, concurrency=2)
    )
    pd.testing.assert_frame_equal(got, want)
    # absent pattern produced no rows for its qid
    assert 2 not in set(got["query_id"])


def test_fuzzy_search_runs_and_ranks(exp_index):
    got = _pdres(fuzzy_search(exp_index, [(0, "sow"), (1, "zzz")], k=5))
    assert set(got["query_id"]) == {0}
    assert got["rank"].tolist() == list(range(1, len(got) + 1))
    # scores are the OR of {row, slow}: strictly positive, descending
    s = got["score"].to_numpy()
    assert (s > 0).all() and (np.diff(s) <= 1e-12).all()


@settings(max_examples=100, deadline=None)
@given(
    _terms,
    st.from_regex(r"[abc.]([|][abc.])?", fullmatch=True),
)
def test_regex_matcher_equals_python_fullmatch(terms, pat):
    batch = pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "df": pa.array(list(range(1, len(terms) + 1)), pa.int64()),
        }
    )
    m = _ExpandMatcher([(0, pat)], "regex")
    got = set(m(batch)["term"].to_pylist())
    rx = re.compile(pat)
    want = {t for t in terms if rx.fullmatch(t)}
    assert got == want


def test_expand_regex_against_dictionary(exp_index):
    got = expand_regex(
        exp_index, [(0, "s.*"), (1, ".o.n"), (2, "zz.*"), (3, "merge")]
    )
    import pyarrow.parquet as pq

    terms = pq.read_table(
        os.path.join(exp_index, "stats", "term_df"), columns=["term"]
    )["term"].to_pylist()
    assert got[0] == sorted(t for t in terms if t.startswith("s"))
    assert got[1] == ["join"]
    assert got[2] == []
    assert got[3] == ["merge"]


def test_regex_search_equals_boolean_over_expansion(exp_index):
    pats = [(0, ".*(er|ow)"), (1, "zz.*")]
    exp = expand_regex(exp_index, pats)
    got = _pdres(regex_search(exp_index, pats, k=15, concurrency=2))
    qtbl = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "must": pa.array([[]], pa.list_(pa.string())),
            "should": pa.array([exp[0]], pa.list_(pa.string())),
            "must_not": pa.array([[]], pa.list_(pa.string())),
        }
    )
    want = _pdres(
        boolean_search(exp_index, ray.data.from_arrow(qtbl), k=15, concurrency=2)
    )
    pd.testing.assert_frame_equal(got, want)


def test_expansion_with_zero_total_matches(exp_index):
    # every pattern empty -> the Dataset can come back column-less
    assert expand_wildcard(exp_index, [(0, "zz%"), (1, "qq%")]) == {0: [], 1: []}
    got = regex_search(exp_index, [(0, "zz.*")], k=5).to_pandas()
    assert len(got) == 0


def test_overlapping_patterns_dedupe_before_cap(exp_index):
    """One qid with overlapping patterns must not double-count matches
    toward the cap or return duplicated terms."""
    got = expand_wildcard(exp_index, [(0, "s%"), (0, "sc%"), (0, "s_an")])
    assert got[0] == sorted(set(got[0]))  # no duplicates
    uncapped = set(got[0])
    capped = expand_wildcard(
        exp_index, [(0, "s%"), (0, "sc%"), (0, "s_an")], max_expansions=3
    )
    assert len(capped[0]) == 3  # cap counts DISTINCT terms
    assert set(capped[0]) <= uncapped


# ------------------------------------------------- did-you-mean suggester

from defactonlp_ray.stages.expand import _SpellMatcher, suggest_spelling


def test_spell_suggest_popularity_gate(tmp_path):
    """Lucene DirectSpellChecker SUGGEST_MORE_POPULAR: a suggestion must
    be STRICTLY more frequent than the typed term — 'cot' (rare) maps to
    'cat' (common), 'cat' gets nothing ('cot' is rarer), and an OOV term
    gets every distance-1 neighbor ranked (df DESC, term)."""
    texts = ["cat dog"] * 10 + ["cot dog"] * 2
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))
    idx = str(tmp_path / "idx")
    build_index(docs, idx, seg_docs=8, resume=False)
    got = suggest_spelling(
        idx, [(0, "cot"), (1, "cat"), (2, "cut"), (3, "dog")], k=3
    )
    by_q = {q: g for q, g in got.groupby("query_id")}
    assert by_q[0]["suggestion"].tolist() == ["cat"]
    assert by_q[0]["df"].tolist() == [10]
    assert 1 not in by_q  # 'cat' is already the most popular spelling
    assert by_q[2]["suggestion"].tolist() == ["cat", "cot"]  # df 10 > 2
    assert by_q[2]["rank"].tolist() == [1, 2]
    assert 3 not in by_q  # 'dog' has no distance-1 neighbors


def test_spell_suggest_excludes_self_on_corpus(exp_index):
    got = suggest_spelling(exp_index, [(0, "merge"), (1, "spart")], k=3)
    assert 0 not in set(got["query_id"])  # in-vocab, no neighbors
    g1 = got[got["query_id"] == 1]
    assert sorted(g1["suggestion"]) == ["part", "spark"]
    # ranked df DESC then term ASC
    assert g1.sort_values("rank")["df"].is_monotonic_decreasing


def test_spell_matcher_combiner_keeps_self_and_caps_candidates():
    """Per-batch top-k applies to candidates only; the dist=0 self row
    always survives (it carries the popularity gate's threshold)."""
    batch = pa.table({
        "term": pa.array(["bat", "cab", "car", "cat", "cot", "cut"]),
        "df": pa.array([1, 2, 9, 3, 7, 5], pa.int64()),
    })
    out = _SpellMatcher([(0, "cat")], k=2)(batch).to_pandas()
    selfrow = out[out["dist"] == 0]
    assert selfrow["term"].tolist() == ["cat"] and selfrow["df"].tolist() == [3]
    cands = out[out["dist"] == 1]
    # top-2 by (df DESC, term): car(9), cot(7) — bat/cab/cut capped out
    assert sorted(cands["term"]) == ["car", "cot"]


def test_spell_matcher_empty_batch():
    empty = pa.table({
        "term": pa.array([], pa.string()), "df": pa.array([], pa.int64()),
    })
    out = _SpellMatcher([(0, "cat")], k=2)(empty)
    assert out.num_rows == 0
    assert out.schema.names == ["query_id", "term", "df", "dist"]


def test_suggest_phrase_rewrites_and_collates(tmp_path):
    from defactonlp_ray.stages.expand import suggest_phrase

    texts = ["cat dog"] * 10 + ["cot dog"] * 2 + ["cat bird"] * 3
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))
    idx = str(tmp_path / "idx")
    build_index(docs, idx, seg_docs=8, resume=False)
    got = suggest_phrase(idx, [
        (0, ["cot", "dog"]),    # cot -> cat (more popular); "cat dog" has 10 hits
        (1, ["cat", "bird"]),   # nothing to fix; 3 conjunctive hits
        (2, ["zzz", "dog"]),    # uncorrectable -> zero hits -> pruned
        (3, ["bird", "dog"]),   # rewrite collates to 0 docs -> pruned
    ])
    rows = {int(r.query_id): (r.rewrite, int(r.n_hits)) for r in got.itertuples()}
    assert rows[0] == ("cat dog", 10)
    assert rows[1] == ("cat bird", 3)
    assert 2 not in rows and 3 not in rows
