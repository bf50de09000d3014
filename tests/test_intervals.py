"""Lucene intervals query (minimal ordered intervals + max_gaps).

* Engine vs a brute-force Python reference (enumerate ALL ordered
  matches, filter to the minimal set by pairwise containment, then gap
  filter) on engineered docs AND on the fixture corpus.
* Doc-level match set == span_near's (minimality never changes
  existence, only counts): engine-vs-engine equivalence with the slop
  that admits the same width.
* Counting semantics: "a x b a b" has TWO minimal (a..b) intervals even
  though a wider one spans the gap.
"""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from defactonlp_ray import fixtures
from defactonlp_ray.functions.tokenizer import tokenize
from defactonlp_ray.stages import phrase as P
from defactonlp_ray.stages.index_build import build_index
from defactonlp_ray.stages.search import IndexReader


def _brute_minimal(tokens: list[str], terms: list[str], max_gaps: int) -> int:
    """All ordered matches -> drop any interval strictly containing
    another match's interval -> gap filter -> count."""
    pos = {t: [i for i, x in enumerate(tokens) if x == t] for t in set(terms)}
    matches = []
    for combo in itertools.product(*(pos[t] for t in terms)):
        if all(a < b for a, b in zip(combo, combo[1:])):
            matches.append((combo[0], combo[-1]))
    spans = set(matches)
    minimal = [
        (s, e)
        for s, e in spans
        if not any(
            (s2, e2) != (s, e) and s <= s2 and e2 <= e for s2, e2 in spans
        )
    ]
    m = len(terms)
    return sum(1 for s, e in minimal if (e - s + 1) - m <= max_gaps)


def _build(tmp_path_factory, docs, tag):
    out = str(tmp_path_factory.mktemp(tag))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(docs), pa.int64()),
                "text": [docs[i] for i in sorted(docs)],
            }
        )
    )
    build_index(ds, out, seg_docs=64, positions=True)
    return out


@pytest.fixture(scope="module")
def engineered(tmp_path_factory):
    docs = {
        0: "a x b a b",          # two minimal (a..b) intervals
        1: "a b",                # one adjacent interval
        2: "b a",                # wrong order: none
        3: "a x x x b",          # gaps = 3
        4: "a a b b",            # staircase: minimal = (2nd a, 1st b)
        5: "c c x c",            # repeated term for the (c, c) query
        6: "a x b x c",          # 3-term with gaps
        7: "x y z",              # no query terms at all
    }
    return docs, _build(tmp_path_factory, docs, "idx_intervals")


CASES = [
    (["a", "b"], 0),
    (["a", "b"], 3),
    (["a", "b"], 99),
    (["b", "a"], 5),
    (["c", "c"], 2),
    (["a", "b", "c"], 4),
]


@pytest.mark.parametrize("terms,g", CASES)
def test_engineered_counts_match_bruteforce(engineered, terms, g):
    docs, idx = engineered
    reader = IndexReader(idx)
    got_docs, got_n, _dls = P.match_intervals(
        reader, reader.seg_ids, terms, g
    )
    got = dict(zip(got_docs.tolist(), got_n.tolist()))
    want = {}
    for doc_id, text in docs.items():
        n = _brute_minimal(tokenize(text), terms, g)
        if n:
            want[doc_id] = n
    assert got == want, (terms, g)


def test_two_minimal_intervals_counted(engineered):
    docs, idx = engineered
    reader = IndexReader(idx)
    got_docs, got_n, _ = P.match_intervals(reader, reader.seg_ids, ["a", "b"], 99)
    got = dict(zip(got_docs.tolist(), got_n.tolist()))
    assert got[0] == 2          # "a x b a b": (a@0..b@2) and (a@3..b@4)
    assert got[4] == 1          # "a a b b": only (a@1, b@2) is minimal


def test_fixture_corpus_matches_bruteforce(tmp_path_factory):
    pages = fixtures.make_pages(150)
    docs = {i: t for i, t in enumerate(pages["text"].to_pylist())}
    idx = _build(tmp_path_factory, docs, "idx_intervals_fx")
    reader = IndexReader(idx)
    for terms, g in [(["hash", "join"], 2), (["data", "query", "fast"], 6)]:
        got_docs, got_n, _ = P.match_intervals(reader, reader.seg_ids, terms, g)
        got = dict(zip(got_docs.tolist(), got_n.tolist()))
        want = {}
        for doc_id, text in docs.items():
            n = _brute_minimal(tokenize(text), terms, g)
            if n:
                want[doc_id] = n
        assert got == want, (terms, g)


def _brute_minimal_groups(tokens, groups, max_gaps):
    pos = [
        sorted(i for i, x in enumerate(tokens) if x in set(g))
        for g in groups
    ]
    matches = []
    for combo in itertools.product(*pos):
        if all(a < b for a, b in zip(combo, combo[1:])):
            matches.append((combo[0], combo[-1]))
    spans = set(matches)
    minimal = [
        (s, e)
        for s, e in spans
        if not any(
            (s2, e2) != (s, e) and s <= s2 and e2 <= e for s2, e2 in spans
        )
    ]
    m = len(groups)
    return sum(1 for s, e in minimal if (e - s + 1) - m <= max_gaps)


def test_union_intervals_match_bruteforce(tmp_path_factory):
    pages = fixtures.make_pages(120)
    docs = {i: t for i, t in enumerate(pages["text"].to_pylist())}
    idx = _build(tmp_path_factory, docs, "idx_intervals_or")
    reader = IndexReader(idx)
    cases = [
        ([["hash", "join"], ["table"]], 2),
        ([["data"], ["query", "fast"]], 3),
        ([["merge", "sort"], ["merge", "sort"]], 4),
    ]
    for groups, g in cases:
        got_docs, got_n, _ = P.match_intervals_groups(
            reader, reader.seg_ids, groups, g
        )
        got = dict(zip(got_docs.tolist(), got_n.tolist()))
        want = {}
        for doc_id, text in docs.items():
            n = _brute_minimal_groups(tokenize(text), groups, g)
            if n:
                want[doc_id] = n
        assert got == want, (groups, g)


def _brute_or_near(tokens, groups, slop):
    # any member per slot, strictly increasing positions, width rule
    pos = [
        sorted(i for i, x in enumerate(tokens) if x in set(g))
        for g in groups
    ]
    m = len(groups)
    for combo in itertools.product(*pos):
        if all(a < b for a, b in zip(combo, combo[1:])) and (
            combo[-1] - combo[0] <= slop + m - 1
        ):
            return True
    return False


def test_span_or_near_matches_bruteforce(tmp_path_factory):
    pages = fixtures.make_pages(120)
    docs = {i: t for i, t in enumerate(pages["text"].to_pylist())}
    idx = _build(tmp_path_factory, docs, "idx_spanor")
    reader = IndexReader(idx)
    cases = [
        ([["hash", "join"], ["table"]], 2),
        ([["data"], ["query", "fast"]], 1),
        ([["merge", "sort"], ["merge", "sort"]], 3),  # self-union pair
    ]
    for groups, slop in cases:
        got = P.match_ordered_groups(reader, reader.seg_ids, groups, slop)
        want = sorted(
            d
            for d, text in docs.items()
            if _brute_or_near(tokenize(text), groups, slop)
        )
        assert got.tolist() == want, (groups, slop)


def test_span_or_singletons_equal_span_near(tmp_path_factory):
    docs = {i: t for i, t in enumerate(
        fixtures.make_pages(100)["text"].to_pylist()
    )}
    idx = _build(tmp_path_factory, docs, "idx_spanor_sn")
    reader = IndexReader(idx)
    for terms, slop in [(["hash", "join"], 1), (["data", "query"], 3)]:
        a = P.match_ordered_groups(
            reader, reader.seg_ids, [[t] for t in terms], slop
        )
        b = P.match_ordered(reader, reader.seg_ids, terms, slop)
        assert a.tolist() == b.tolist()


def test_random_corpora_match_bruteforce(tmp_path_factory):
    # seeded random mini-corpora over a 4-letter alphabet: high
    # repetition density stresses the staircase minimality and the
    # duplicate-term chain far beyond the fixture corpus
    import random

    rng = random.Random(1234)
    alpha = ["a", "b", "c", "d"]
    docs = {
        i: " ".join(rng.choice(alpha) for _ in range(rng.randint(3, 24)))
        for i in range(40)
    }
    idx = _build(tmp_path_factory, docs, "idx_intervals_rand")
    reader = IndexReader(idx)
    cases = [
        (["a", "b"], 0),
        (["a", "b"], 2),
        (["b", "a", "c"], 3),
        (["a", "a"], 1),
        (["d", "d", "d"], 4),
        (["c", "b", "a"], 99),
    ]
    for terms, g in cases:
        got_docs, got_n, _ = P.match_intervals(
            reader, reader.seg_ids, terms, g
        )
        got = dict(zip(got_docs.tolist(), got_n.tolist()))
        want = {}
        for doc_id, text in docs.items():
            n = _brute_minimal(tokenize(text), terms, g)
            if n:
                want[doc_id] = n
        assert got == want, (terms, g)


def test_match_set_equals_span_near(tmp_path_factory):
    # existence is unchanged by minimality: intervals(terms, g) matches
    # exactly the docs of span_near(terms, slop=g) (same width rule)
    pages = fixtures.make_pages(150)
    docs = {i: t for i, t in enumerate(pages["text"].to_pylist())}
    idx = _build(tmp_path_factory, docs, "idx_intervals_sn")
    reader = IndexReader(idx)
    for terms, g in [(["hash", "join"], 0), (["merge", "sort"], 4)]:
        iv_docs, _, _ = P.match_intervals(reader, reader.seg_ids, terms, g)
        sn_docs = P.match_ordered(reader, reader.seg_ids, terms, g)
        assert iv_docs.tolist() == sn_docs.tolist(), (terms, g)
