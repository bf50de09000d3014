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


# ---------------------------------------------------------------------------
# CJK-safe mixed-script tokenizer (VERDICT r04 missing #5)
# ---------------------------------------------------------------------------
# The simple-v1 analyzer is en-centric: CJK text has no spaces, so
# [a-z0-9]+ runs drop it entirely.  The fallback path segments by Unicode
# codepoint class — Latin/digit runs keep simple-v1 semantics EXACTLY
# (pure-ASCII text tokenizes identically through either path), while
# runs of Han / Hiragana / Katakana / Hangul emit overlapping character
# BIGRAMS (a single-char run emits its unigram) — the Lucene
# CJKAnalyzer / ES cjk_bigram token-filter semantics, the standard
# statistical-IR segmentation when no dictionary segmenter is available.
# Pinned separately from simple-v1 so existing goldens are untouched.

CJK_TOKENIZER_VERSION = "cjk-bigram-v1"

# Hangul Jamo, Hiragana, Katakana, CJK ext A, CJK unified, Hangul syllables
_CJK_CLASS = "ᄀ-ᇿ぀-ヿ㐀-䶿一-鿿가-힯"
MIXED_TOKEN_RE = re.compile(f"[a-z0-9]+|[{_CJK_CLASS}]+")
_CJK_FIRST = re.compile(f"^[{_CJK_CLASS}]")
# split complement for the vectorized path (after script-boundary spacing)
_MIXED_SPLIT_PATTERN = f"[^a-z0-9{_CJK_CLASS}]+"


def is_cjk(token: str) -> bool:
    return bool(token) and bool(_CJK_FIRST.match(token))


def tokenize_mixed(text: str) -> list[str]:
    """Pure-Python pinned mixed-script tokenizer (oracle path)."""
    out: list[str] = []
    for run in MIXED_TOKEN_RE.findall(text.lower()):
        if _CJK_FIRST.match(run):
            if len(run) == 1:
                out.append(run)
            else:
                out.extend(run[i : i + 2] for i in range(len(run) - 1))
        else:
            out.append(run)
    return out


def tokenize_mixed_column(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized mixed-script tokenize: string column -> list<string>.

    Arrow kernels do the heavy lifting (lower, script-boundary spacing
    via two regex replaces — RE2 has no lookaround — then one split);
    only the CJK RUNS are expanded to bigrams in Python, so the loop is
    bounded by the number of CJK runs, ~zero on ASCII-dominant corpora.
    """
    lower = pc.utf8_lower(texts)
    # homogenize runs: insert a space at latin<->CJK script boundaries
    sep = pc.replace_substring_regex(
        lower, pattern=f"([a-z0-9])([{_CJK_CLASS}])", replacement=r"\1 \2"
    )
    sep = pc.replace_substring_regex(
        sep, pattern=f"([{_CJK_CLASS}])([a-z0-9])", replacement=r"\1 \2"
    )
    runs = pc.split_pattern_regex(sep, pattern=_MIXED_SPLIT_PATTERN)
    if isinstance(runs, pa.ChunkedArray):
        runs = runs.combine_chunks()
    flat = runs.flatten()
    parents = pc.list_parent_indices(runs).to_numpy(zero_copy_only=False)
    n_rows = len(runs)
    out_parents: list[int] = []
    out_tokens: list[str] = []
    cjk_first = _CJK_FIRST
    for p, run in zip(parents, flat.to_pylist()):
        if not run:
            continue
        if cjk_first.match(run):
            if len(run) == 1:
                out_parents.append(p)
                out_tokens.append(run)
            else:
                for i in range(len(run) - 1):
                    out_parents.append(p)
                    out_tokens.append(run[i : i + 2])
        else:
            out_parents.append(p)
            out_tokens.append(run)
    counts = np.zeros(n_rows, dtype=np.int64)
    if out_parents:
        np.add.at(counts, np.asarray(out_parents, dtype=np.int64), 1)
    offsets = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    return pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(out_tokens, pa.string())
    )


def cjk_transliterate(text: str) -> str:
    """Deterministic ASCII->Han transliteration (pinned leaf function).

    The driver test tables carry zh LABELS but ASCII text, so the CJK
    analysis entry derives real CJK input from them: each simple-v1
    token maps to ``max(1, len//2)`` Han codepoints, char j =
    U+4E00 + md5(token ':' j) % 500 — a pure function of the token, so
    the distributed pipeline and the serial pinned mirror generate the
    byte-identical corpus.  Tokens join with no separator (Chinese text
    has no spaces), forming one maximal run per document.
    """
    import hashlib

    chars: list[str] = []
    for t in TOKEN_RE.findall(text.lower()):
        for j in range(max(1, len(t) // 2)):
            h = int(hashlib.md5(f"{t}:{j}".encode()).hexdigest()[:4], 16)
            chars.append(chr(0x4E00 + h % 500))
    return "".join(chars)
