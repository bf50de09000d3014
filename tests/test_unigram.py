"""Unigram-LM tokenizer (functions/unigram.py) invariants."""

from __future__ import annotations

import math

import numpy as np
import pytest

from defactonlp_ray.functions.unigram import (
    MAX_PIECE,
    MIN_COUNT,
    piece_scores,
    substring_counts,
    viterbi_pieces,
)


def test_substring_counts_overlapping_and_weighted():
    c = substring_counts(["aaa"], [2])
    # overlapping: "aa" occurs twice per word, weighted by freq 2
    assert c["a"] == 6 and c["aa"] == 4 and c["aaa"] == 2


def test_piece_scores_keeps_singles_below_min_count():
    counts = {"q": 1, "qu": MIN_COUNT, "x": 2}
    s = piece_scores(counts)
    assert "q" in s and "x" in s and "qu" in s
    total = 1 + MIN_COUNT + 2
    assert s["qu"] == math.log(MIN_COUNT / total)


def test_viterbi_concatenates_to_word():
    counts = substring_counts(
        ["hashing", "hash", "ing", "shin"], [10, 20, 30, 5]
    )
    logp = piece_scores(counts)
    for w in ("hashing", "hash", "shin", "zzz"):
        ps = viterbi_pieces(w, logp)
        assert "".join(ps) == w
        assert all(1 <= len(p) <= MAX_PIECE for p in ps)


def test_viterbi_prefers_likely_long_pieces():
    # "hash" dominant -> "hashx" should segment as hash|x, not chars
    logp = piece_scores({"hash": 1000, "h": 5, "a": 5, "s": 5, "x": 5})
    assert viterbi_pieces("hashx", logp) == ["hash", "x"]


def test_viterbi_tie_prefers_longer_piece():
    # craft an exact tie: pieces "ab" and ("a" then "b") with
    # logp(ab) == logp(a) + logp(b) is hard in floats; instead pin the
    # DIRECT tie — two candidate starts with identical best+logp sums
    # via symmetric counts — and check determinism across repeats
    logp = {"ab": math.log(0.25), "a": math.log(0.5), "b": math.log(0.5)}
    # logp(a)+logp(b) = log(0.25) exactly == logp(ab) (both -2ln2)
    got = viterbi_pieces("ab", logp)
    assert got == ["ab"]  # strict > with ascending j: longest piece wins
    assert viterbi_pieces("ab", logp) == got


def test_unreachable_word_falls_back_to_chars():
    assert viterbi_pieces("xyz", {"q": -1.0}) == ["x", "y", "z"]
