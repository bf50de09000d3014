"""Unigram-LM subword tokenizer (Kudo 2018, arXiv:1804.10959 — the
SentencePiece ``unigram`` model) in the same training shape as
functions/bpe.py: the corpus-scale work is the distinct-word count
aggregation; everything piece-level runs over the vocabulary.

This implements ONE deterministic scoring + Viterbi pass (the E-step a
full EM trainer iterates): seed pieces are all word substrings up to
``MAX_PIECE`` chars with corpus count >= ``MIN_COUNT`` (single chars
always kept, so every word segments), scored
``logp(p) = log(count(p) / total)``; each word's segmentation is the
max-likelihood piece sequence under those scores.

Determinism pins (the serial reference in pipelines/pinned.py
re-implements them independently):
* substring counts weight by word frequency and count OVERLAPPING
  occurrences;
* ``total`` is the int sum of kept-piece counts; ``logp`` is
  ``math.log(count / total)`` (one float expression, both sides);
* Viterbi fills positions left to right; at position ``i`` candidate
  start ``j`` runs ASCENDING over ``[max(0, i - MAX_PIECE), i)`` and a
  candidate wins only by STRICT ``>`` — so on an exact float tie the
  longest piece (earliest ``j``) wins.  Scores compose as
  ``best[j] + logp(piece)``, a fixed two-operand association shared by
  any implementation of the same recurrence.

Scale notes (100 TB): the (word, freq) table is the only corpus pass.
The piece-count stage maps over the DISTRIBUTED vocabulary dataset and
its groupby carries at most ``MAX_PIECE``x the vocabulary's character
mass; the kept-piece score table is bounded by MIN_COUNT (raise it, or
keep top-V via the sharded-terms machinery, for open-web vocabularies)
and ships once via ``ray.put``.  Segmentation again maps over the
vocabulary, never the corpus; per-doc piece counts ride a broadcast
word -> n_pieces lookup exactly like BPE encoding.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

UNIGRAM_VERSION = "uni-v1"
MAX_PIECE = 4
MIN_COUNT = 5


def substring_counts(words: list[str], freqs: list[int]) -> dict[str, int]:
    """Overlapping substring counts (len 1..MAX_PIECE) over a distinct-
    word table, weighted by word frequency."""
    out: dict[str, int] = {}
    for w, f in zip(words, freqs):
        f = int(f)
        n = len(w)
        for L in range(1, min(MAX_PIECE, n) + 1):
            for j in range(n - L + 1):
                p = w[j : j + L]
                out[p] = out.get(p, 0) + f
    return out


def piece_scores(counts: dict[str, int]) -> dict[str, float]:
    """Keep pieces with count >= MIN_COUNT plus ALL single chars (the
    segmentability floor); score log(count / total) over kept mass."""
    kept = {
        p: c for p, c in counts.items() if c >= MIN_COUNT or len(p) == 1
    }
    total = sum(kept.values())
    return {p: math.log(c / total) for p, c in kept.items()}


def viterbi_pieces(word: str, logp: dict[str, float]) -> list[str]:
    """Max-likelihood segmentation of ``word`` under piece scores (see
    the determinism pins in the module docstring)."""
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - MAX_PIECE), i):
            lp = logp.get(word[j:i])
            if lp is None or best[j] == -math.inf:
                continue
            s = best[j] + lp
            if s > best[i]:
                best[i] = s
                back[i] = j
    if best[n] == -math.inf:  # unreachable: single chars always score
        return list(word)
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


class UsageCounter:
    """Actor-pool stage over the VOCABULARY dataset: per-batch
    freq-weighted piece-usage partials under the broadcast scores."""

    def __init__(self, scores_ref):
        import ray

        self.logp: dict[str, float] = ray.get(scores_ref)
        self._cache: dict[str, list[str]] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        u: dict[str, int] = {}
        for w, f in zip(batch["term"].to_pylist(), batch["cf"].to_pylist()):
            ps = self._cache.get(w)
            if ps is None:
                ps = viterbi_pieces(w, self.logp)
                self._cache[w] = ps
            for p in ps:
                u[p] = u.get(p, 0) + int(f)
        return pa.table(
            {
                "piece": pa.array(list(u.keys()), pa.string()),
                "u_p": pa.array(list(u.values()), pa.int64()),
            }
        )


class UnigramCounter:
    """Actor-pool stage: per-doc whitespace-token and unigram-piece
    counts.  The score table ships once via ``ray.put``; the per-word
    piece-length cache persists across batches."""

    def __init__(self, scores_ref):
        import ray

        self.logp: dict[str, float] = ray.get(scores_ref)
        self._len: dict[str, int] = {}

    def _word_len(self, w: str) -> int:
        hit = self._len.get(w)
        if hit is None:
            hit = len(viterbi_pieces(w, self.logp))
            self._len[w] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .tokenizer import flatten_tokens

        terms, row_idx, doc_len = flatten_tokens(batch["text"])
        words = np.asarray(terms.to_pylist(), dtype=object)
        uniq, inv = np.unique(words.astype(str), return_inverse=True)
        lens = np.asarray([self._word_len(w) for w in uniq], dtype=np.int64)
        n_rows = batch.num_rows
        pieces_per_doc = np.bincount(
            row_idx, weights=lens[inv], minlength=n_rows
        ).astype(np.int64)
        keep = doc_len > 0
        return pa.table(
            {
                "doc_id": batch["doc_id"].filter(pa.array(keep)),
                "n_tokens": pa.array(doc_len[keep], pa.int64()),
                "n_uni_pieces": pa.array(pieces_per_doc[keep], pa.int64()),
            }
        )
