"""Pinned scalar/vector function tests: tokenizer (M3), title normalization
(M1), extractor (M5) byte-identical invariant, fixtures determinism."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from defactonlp_ray import fixtures
from defactonlp_ray.functions import extract, textnorm, tokenizer


# ------------------------------------------------------------- tokenizer M3

def test_tokenizer_goldens():
    cases = {
        "Hello, World! 123": ["hello", "world", "123"],
        "": [],
        "   ": [],
        "a-b_c": ["a", "b", "c"],
        "Ünïcode stays ascii-only": ["n", "code", "stays", "ascii", "only"],
    }
    for text, want in cases.items():
        assert tokenizer.tokenize(text) == want


@given(st.lists(st.text(max_size=40), max_size=30))
@settings(max_examples=150, deadline=None)
def test_tokenize_column_matches_scalar(texts):
    col = tokenizer.tokenize_column(pa.array(texts, pa.string()))
    assert col.to_pylist() == [tokenizer.tokenize(t) for t in texts]


def test_term_count_table():
    tf, dl = tokenizer.term_count_table(
        pa.array(["a b a", "", "b c"]), pa.array([5, 6, 7], pa.int64())
    )
    rows = {(r["term"], r["doc_id"]): r["tf"] for r in tf.to_pylist()}
    assert rows == {("a", 5): 2, ("b", 5): 1, ("b", 7): 1, ("c", 7): 1}
    assert list(dl) == [3, 0, 2]


# -------------------------------------------------------------- textnorm M1

def test_title_normalization_roundtrip():
    t = "Savages_-LRB-2012_film-RRB-"
    disp = textnorm.title_to_display(t)
    assert disp == "Savages (2012 film)"
    assert textnorm.display_to_title(disp) == t
    assert textnorm.norm_match_key(t) == "savages (2012 film)"


def test_norm_match_key_column_matches_scalar():
    vals = ["Foo_Bar", "A-COLON-B", "  Multi   space ", "Savages_-LRB-2012-RRB-"]
    col = textnorm.norm_match_key_column(pa.array(vals)).to_pylist()
    assert col == [textnorm.norm_match_key(v) for v in vals]


# ------------------------------------------------------------- extractor M5

def test_extractor_invariant_on_fixtures():
    """BASELINE.json input_hint: extract_text(html) must be byte-identical
    to the text column for every url."""
    pages = fixtures.make_pages(300)
    for h, t in zip(pages["html"].to_pylist(), pages["text"].to_pylist()):
        assert extract.extract_text(h) == t


def test_extractor_drops_boilerplate_and_unescapes():
    html = (
        b"<html><head><title>T &amp; U</title></head><body>"
        b"<script>var x=1;</script><nav>MENU</nav>"
        b"<p>Hello <b>bold</b> world</p><footer>foot</footer></body></html>"
    )
    assert extract.extract_text(html) == "T & U\nHello bold world"


# ---------------------------------------------------------------- fixtures

def test_fixtures_deterministic_and_parallelism_invariant():
    a = fixtures.make_pages(150)
    b = fixtures.make_pages(150)
    assert a.equals(b)
    # pure function of (seed, i): a prefix of a longer table is identical
    c = fixtures.make_pages(80)
    assert a.slice(0, 80).equals(c)


def test_fixtures_have_planted_duplicates():
    pages = fixtures.make_pages(2000)
    texts = pages["text"].to_pylist()
    urls = pages["url"].to_pylist()
    assert len(set(texts)) < len(texts)  # content dups
    assert len(set(urls)) < len(urls)  # url dups
    langs = set(pages["lang"].to_pylist())
    assert "en" in langs and len(langs) > 1


def test_claims_shape():
    claims = fixtures.make_claims(50, n_pages=500)
    ev = claims["evidence"].to_pylist()
    assert any(e for e in ev)  # non-NEI rows carry nested evidence
    nei = [
        e
        for e, lab in zip(ev, claims["label"].to_pylist())
        if lab == "NOT ENOUGH INFO"
    ]
    assert all(e == [] for e in nei)
