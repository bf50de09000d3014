"""Text-analysis functions for training-data pipelines (task brief):
language-ID (n-gram heuristic), quality scoring, token counting, document
fingerprinting.  Pure + vectorized; the Ray stages wrap them in
``map_batches``.

Quality ratios are single divisions of integer counts, so they are
bit-identical between numpy float64 and the DuckDB double oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .tokenizer import flatten_tokens

TEXTSTATS_VERSION = "textstats-v1"

# Pinned stopword list (quality scoring + SQL oracle share it).
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that",
)

# Tiny per-language character/bigram cues for the heuristic language ID.
# Deterministic, self-contained (no model deps); scores are additive counts.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the ", " and ", " of ", " is ", " to "),
    "de": (" der ", " die ", " und ", " ist ", " das ", "sch"),
    "es": (" el ", " la ", " de ", " que ", " los ", "ción"),
    "fr": (" le ", " la ", " les ", " des ", " est ", " une "),
    "zh": tuple(chr(c) for c in range(0x4E00, 0x4E0A)),
}


def lang_id(text: str) -> str:
    """Heuristic n-gram language ID.  Returns the language with the highest
    marker-hit count, 'und' when nothing matches.  Ties break by language
    code order (deterministic)."""
    if any("一" <= ch <= "鿿" for ch in text):
        return "zh"
    hay = f" {text.lower()} "
    best_lang, best_score = "und", 0
    for lang in sorted(_LANG_MARKERS):
        score = sum(hay.count(m) for m in _LANG_MARKERS[lang])
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def lang_id_batch(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized :func:`lang_id` over a string column — identical output
    (property-tested), no per-row Python: one ``pc.count_substring`` pass
    per marker over the padded lowered column, argmax in numpy with the
    same sorted-language tie rule."""
    langs = sorted(k for k in _LANG_MARKERS if k != "zh")
    hay = pc.binary_join_element_wise(" ", pc.utf8_lower(texts), " ", "")
    scores = np.zeros((len(langs), len(hay)), dtype=np.int64)
    for i, lang in enumerate(langs):
        for m in _LANG_MARKERS[lang]:
            scores[i] += pc.count_substring(hay, m).to_numpy(zero_copy_only=False)
    # argmax over the sorted-language axis == "strict > in sorted order"
    best = np.asarray(langs, dtype=object)[scores.argmax(axis=0)]
    best = np.where(scores.max(axis=0) > 0, best, "und")
    is_zh = pc.match_substring_regex(texts, "[一-鿿]").to_numpy(
        zero_copy_only=False
    )
    return pa.array(np.where(is_zh, "zh", best), pa.string())


def quality_batch(texts: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Per-row quality metrics, vectorized:

    n_tokens, n_stopwords, stop_ratio = n_stopwords/n_tokens,
    mean_token_len = sum(len(token))/n_tokens, alnum_ratio =
    alnum_chars/len(text).  Ratios are 0.0 for empty rows.
    """
    terms, row_idx, doc_len = flatten_tokens(texts)
    n = len(texts)
    tok_lens = pc.utf8_length(terms).to_numpy(zero_copy_only=False)
    is_stop = pc.is_in(terms, value_set=pa.array(STOPWORDS)).to_numpy(
        zero_copy_only=False
    )
    n_stop = np.bincount(row_idx, weights=is_stop.astype(np.float64), minlength=n)
    sum_len = np.bincount(row_idx, weights=tok_lens.astype(np.float64), minlength=n)
    n_tok = doc_len.astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        stop_ratio = np.where(n_tok > 0, n_stop / n_tok, 0.0)
        mean_tok_len = np.where(n_tok > 0, sum_len / n_tok, 0.0)
    text_len = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    # alnum char count via tokenizer tokens (tokens are exactly the alnum runs)
    alnum = sum_len.astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        alnum_ratio = np.where(text_len > 0, alnum / text_len, 0.0)
    return pa.table(
        {
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_stopwords": pa.array(n_stop.astype(np.int64), pa.int64()),
            "stop_ratio": pa.array(stop_ratio, pa.float64()),
            "mean_token_len": pa.array(mean_tok_len, pa.float64()),
            "alnum_ratio": pa.array(alnum_ratio, pa.float64()),
        }
    )


# Gopher repetition thresholds (Rae et al. 2021 §A1.1, token variant):
# docs above EITHER are flagged as repetitious boilerplate.
GOPHER_DUP_TOK_MAX = 0.3
GOPHER_TOP_BIGRAM_MAX = 0.2


def repetition_batch(texts: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Gopher-style repetition metrics (Rae et al. 2021), vectorized:

    * ``dup_tok_frac`` = 1 - distinct_tokens / n_tokens
    * ``top_bigram_frac`` = 2 * count(most frequent adjacent bigram) /
      n_tokens — the fraction of tokens covered by the most common
      2-gram (0.0 when the doc has < 2 tokens)
    * ``flagged`` = 1 when either exceeds its pinned Gopher threshold

    Group identities run on uint64 token hashes (FNV-1a+splitmix64, the
    repo-wide kernel): per-row distinct and per-(row, bigram) counts are
    one lexsort + boundary diff each — no Python loop, no string
    group-by.  The flag compares UNROUNDED ratios (both engines compute
    the identical single IEEE division), outputs carry round-6 values.
    """
    from .hashing import hash_str_array, splitmix64

    terms, row_idx, doc_len = flatten_tokens(texts)
    n = len(texts)
    n_tok = doc_len.astype(np.int64)
    hs = hash_str_array(terms)
    ri = row_idx.astype(np.int64)
    # distinct tokens per row: sort (row, hash), count group boundaries
    order = np.lexsort((hs, ri))
    r, h = ri[order], hs[order]
    new = np.ones(r.size, dtype=bool)
    if r.size > 1:
        new[1:] = (r[1:] != r[:-1]) | (h[1:] != h[:-1])
    n_distinct = np.bincount(r[new], minlength=n) if r.size else np.zeros(
        n, dtype=np.int64
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        dup_frac = np.where(n_tok > 0, 1.0 - n_distinct / n_tok, 0.0)
    # adjacent bigrams: pairs at i where row_idx[i] == row_idx[i+1]
    # (flatten_tokens preserves in-document token order)
    max_c = np.zeros(n, dtype=np.int64)
    if hs.size > 1:
        adj = ri[1:] == ri[:-1]
        bg_row = ri[:-1][adj]
        # order-sensitive pair combine: h1 is remixed before xor so
        # (a, b) and (b, a) hash differently
        bh = splitmix64(hs[:-1][adj] + np.uint64(0x9E3779B97F4A7C15)) ^ hs[1:][adj]
        if bg_row.size:
            o2 = np.lexsort((bh, bg_row))
            r2, h2 = bg_row[o2], bh[o2]
            new2 = np.ones(r2.size, dtype=bool)
            new2[1:] = (r2[1:] != r2[:-1]) | (h2[1:] != h2[:-1])
            starts = np.flatnonzero(new2)
            counts = np.diff(np.append(starts, r2.size))
            np.maximum.at(max_c, r2[starts], counts)
    with np.errstate(divide="ignore", invalid="ignore"):
        top_bigram_frac = np.where(n_tok > 0, 2.0 * max_c / n_tok, 0.0)
    flagged = (
        (dup_frac > GOPHER_DUP_TOK_MAX)
        | (top_bigram_frac > GOPHER_TOP_BIGRAM_MAX)
    ).astype(np.int64)
    return pa.table(
        {
            "n_tokens": pa.array(n_tok, pa.int64()),
            "dup_tok_frac": pa.array(np.round(dup_frac, 6), pa.float64()),
            "top_bigram_frac": pa.array(
                np.round(top_bigram_frac, 6), pa.float64()
            ),
            "flagged": pa.array(flagged, pa.int64()),
        }
    )


def doc_entropy_batch(
    texts: pa.Array | pa.ChunkedArray, doc_ids: pa.Array | pa.ChunkedArray
) -> "tuple[np.ndarray, np.ndarray, np.ndarray]":
    """Per-doc token count + Shannon token entropy (nats, rounded 6 dp).

    The SINGLE source of the entropy kernel shared by ``token_entropy``,
    ``quality_prune`` and the ``corpus_curation`` gate — their SQL
    mirrors pin this exact op order (tf -> float64 ratio -> p*ln p ->
    per-doc sum -> round 6), so bit-parity requires every caller to run
    the same code.  Returns ``(ids, n_tokens, entropy)`` numpy arrays
    covering the docs that produced at least one token (empty docs have
    no tf rows, matching the SQL GROUP BY universe).
    """
    from .tokenizer import term_count_table

    tf, _ = term_count_table(texts, doc_ids)
    df = tf.to_pandas()
    if not len(df):
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(0, dtype=np.float64)
    dl = df.groupby("doc_id")["tf"].transform("sum")
    p = df["tf"].to_numpy(np.float64) / dl.to_numpy(np.float64)
    df["plogp"] = p * np.log(p)
    agg = df.groupby("doc_id").agg(
        n_tokens=("tf", "sum"), plogp=("plogp", "sum")
    )
    return (
        agg.index.to_numpy(np.int64),
        agg["n_tokens"].to_numpy(np.int64),
        np.round(-agg["plogp"].to_numpy(), 6),
    )
