"""Pinned tokenizer (SURVEY.md §2.2 M3, §7.6.3).

The reference stack tokenizes with DrQA's ``SimpleTokenizer`` (regex word
split + lowercase; fever-baselines ``drqa/tokenizers/simple_tokenizer.py``,
unverified — SURVEY.md §0).  This engine pins ONE implementation, version
``simple-v1``: lowercase, then extract maximal ``[a-z0-9]+`` runs.  Every
consumer (index build, query path, oracle, fixtures, SQL oracles) uses this
module; changing it invalidates the committed goldens, so bump
``TOKENIZER_VERSION`` and regenerate (FIXTURES.md §3).

Two implementations with identical semantics:

* :func:`tokenize` — pure Python, used by the single-process oracle.
* :func:`tokenize_column` / :func:`term_count_table` — vectorized Arrow
  kernels for the hot ``map_batches`` path (no per-row Python loop).

On the driver test tables (``documents.text`` is strictly lowercase
single-space-separated ``[a-z0-9]+`` words — verified), this tokenizer is
equivalent to DuckDB ``string_split(text, ' ')`` with empty strings removed,
which is what the SQL oracles in __ray_entry__.py rely on.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKENIZER_VERSION = "simple-v1"

# Maximal runs of lowercase alphanumerics after lowercasing.
TOKEN_RE = re.compile(r"[a-z0-9]+")
# Complement pattern used for the vectorized split (same token language).
_SPLIT_PATTERN = r"[^a-z0-9]+"


def tokenize(text: str) -> list[str]:
    """Pure-Python pinned tokenizer (oracle path)."""
    return TOKEN_RE.findall(text.lower())


def tokenize_column(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized tokenize: string column -> list<string> column.

    Arrow kernels only: utf8_lower -> split_pattern_regex -> drop the empty
    strings the split leaves at the edges.
    """
    lower = pc.utf8_lower(texts)
    toks = pc.split_pattern_regex(lower, pattern=_SPLIT_PATTERN)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    # Remove empty tokens produced when a string starts/ends with a separator
    # (or is all-separator) while preserving list structure.
    flat = toks.flatten()
    keep = pc.not_equal(flat, "")
    if pc.all(keep).as_py() is True:
        return toks
    # Rebuild list array with empties filtered out.
    parents = pc.list_parent_indices(toks)
    kept_parents = pc.filter(parents, keep).to_numpy(zero_copy_only=False)
    kept_flat = pc.filter(flat, keep)
    n = len(toks)
    counts = np.bincount(kept_parents, minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets), kept_flat)


def flatten_tokens(
    texts: pa.Array | pa.ChunkedArray,
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Tokenize a string column and flatten.

    Returns ``(terms, row_idx, doc_len)`` where ``terms`` is a flat string
    array of every token occurrence, ``row_idx[i]`` is the batch row that
    produced ``terms[i]``, and ``doc_len[r]`` is the token count of row ``r``.
    """
    toks = tokenize_column(texts)
    terms = toks.flatten()
    row_idx = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    doc_len = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int32)
    return terms, row_idx, doc_len


def term_position_table(
    texts: pa.Array | pa.ChunkedArray, doc_ids: pa.Array | pa.ChunkedArray
) -> tuple[pa.Table, np.ndarray]:
    """Occurrence-level (term, doc_id, pos) for a batch — the
    positional-index build kernel (phrase/proximity queries).

    Returns ``(occ_table, doc_len)``: one row per token OCCURRENCE with
    columns ``term:string, doc_id:int64, pos:int32`` (``pos`` = 0-based
    token position within the doc, ascending within each doc), plus the
    per-input-row token counts.  Fully vectorized: position is
    ``arange(n_tokens) - row_start_offset`` over the flat token stream.
    """
    terms, row_idx, doc_len = flatten_tokens(texts)
    n = len(terms)
    offsets = np.zeros(doc_len.size + 1, dtype=np.int64)
    np.cumsum(doc_len, out=offsets[1:])
    pos = np.arange(n, dtype=np.int64) - offsets[row_idx]
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    occ_doc = doc_ids.take(pa.array(row_idx))
    occ = pa.table(
        {
            "term": terms,
            "doc_id": occ_doc,
            "pos": pa.array(pos.astype(np.int32), pa.int32()),
        }
    )
    return occ, doc_len


def ngrams(tokens: list[str], n: int = 2) -> list[str]:
    """Word n-grams joined with a space — DrQA builds hashed uni+bigram
    features (fever-baselines retriever/utils.py ngrams, unverified);
    exposed for feature-parity consumers.  The BM25 engine itself is
    pinned to unigrams (SURVEY.md §2.2 M4: exact-term engine keeps terms
    as strings)."""
    if n <= 1:
        return list(tokens)
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def uni_bigrams(text: str) -> list[str]:
    """DrQA-shaped feature stream: unigrams followed by bigrams."""
    toks = tokenize(text)
    return toks + ngrams(toks, 2)


def term_count_table(
    texts: pa.Array | pa.ChunkedArray, doc_ids: pa.Array | pa.ChunkedArray
) -> tuple[pa.Table, np.ndarray]:
    """Per-(doc, term) tf for a batch (SURVEY.md §2.5 G4), fully vectorized.

    Returns ``(tf_table, doc_len)``: ``tf_table`` has columns
    ``term:string, doc_id:int64, tf:int32`` (one row per distinct term per
    doc), ``doc_len`` aligns with the input rows.
    """
    terms, row_idx, doc_len = flatten_tokens(texts)
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    occ_doc = doc_ids.take(pa.array(row_idx))
    occ = pa.table({"term": terms, "doc_id": occ_doc})
    tf = occ.group_by(["term", "doc_id"]).aggregate([("doc_id", "count")])
    tf = tf.rename_columns(["term", "doc_id", "tf"])
    tf = tf.set_column(2, "tf", pc.cast(tf["tf"], pa.int32()))
    return tf, doc_len
