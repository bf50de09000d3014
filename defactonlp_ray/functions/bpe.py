"""Byte-pair-encoding tokenizer training + encoding (Sennrich et al.
2016, arXiv:1508.07909) in the HF-tokenizers training shape: merges are
learned from the DISTINCT-word count table, so the corpus-scale stage is
the word-count aggregation (combiner -> groupby, already the repo's
term_stats shape) — the merge loop itself runs over distinct words only.

Determinism: merge selection ties break by (count DESC, pair lex ASC);
encoding applies merges by rank (lowest first), left-most occurrence
first.  Both are pinned so the serial reference in pipelines/pinned.py
(an independent re-implementation) reproduces them exactly.

Scale notes (100 TB): the count table is the only corpus-wide pass.  The
merge loop is O(n_merges x distinct_words x word_len) on the driver —
distinct words, not occurrences; cap the table at a min-count or top-K
by frequency for open vocabularies (the standard tokenizer-training
practice).  Encoding ships the merge ranks once (ray.put) and runs in an
actor pool whose per-word piece cache persists across batches.
"""

from __future__ import annotations

import numpy as np

BPE_VERSION = "bpe-v1"
END = "</w>"  # end-of-word marker (Sennrich formulation)


def train_bpe(
    words: list[str], counts: list[int], n_merges: int
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from a (distinct word, count) table.

    Returns the merge list in rank order.  Stops early when no adjacent
    pair remains.  Tie rule: highest total count, then lexicographically
    smallest (left, right) pair.
    """
    seqs: dict[str, list[str]] = {w: list(w) + [END] for w in words}
    cnt = dict(zip(words, (int(c) for c in counts)))
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, seq in seqs.items():
            c = cnt[w]
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for w, seq in seqs.items():
            if a not in seq:
                continue
            out = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with learned merges: repeatedly merge the
    lowest-rank adjacent pair (all its occurrences, left to right) until
    none applies — the standard rank-greedy BPE encoder."""
    seq = list(word) + [END]
    while len(seq) > 1:
        best_rank, best_i = None, -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        a, b = seq[best_i], seq[best_i + 1]
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
    return seq


class BpeCounter:
    """Actor-pool encode stage: merges load once per actor; the
    word -> piece-count cache persists across batches, so each DISTINCT
    word is encoded once per actor regardless of how many batches or
    occurrences flow through (``__call__`` itself is vectorized:
    np.unique + searchsorted + bincount)."""

    def __init__(self, merges_ref=None, merges: list | None = None):
        if merges_ref is not None:
            import ray

            merges = ray.get(merges_ref)
        self.ranks = {tuple(p): i for i, p in enumerate(merges or [])}
        self.cache: dict[str, int] = {}

    def __call__(self, batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        from .tokenizer import flatten_tokens

        terms, row_idx, doc_len = flatten_tokens(batch["text"])
        n = len(batch)
        n_tok = doc_len.astype(np.int64)
        toks = terms.to_numpy(zero_copy_only=False).astype(str)
        if toks.size:
            uniq, inv = np.unique(toks, return_inverse=True)
            for w in uniq:
                if w not in self.cache:
                    self.cache[w] = len(encode_word(w, self.ranks))
            pieces = np.array([self.cache[w] for w in uniq], dtype=np.int64)
            per_tok = pieces[inv]
            n_bpe = np.bincount(row_idx, weights=per_tok, minlength=n).astype(
                np.int64
            )
        else:
            n_bpe = np.zeros(n, dtype=np.int64)
        t = pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
            }
        )
        return t.filter(pc.greater(t["n_tokens"], 0))
