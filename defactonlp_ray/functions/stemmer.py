"""Porter stemmer — the pinned index-time analysis chain
(fulltext_index tier; SURVEY.md §2.2 extension; the algorithm is
M.F. Porter, "An algorithm for suffix stripping", Program 14(3) 1980 —
implemented from the published rule tables, no external package).

Pinning contract (same as the tokenizer's): :func:`porter_stem` IS the
stemming spec, version ``porter-v1`` — the engine's analysis stage, the
test references and the SQL oracles' inlined stem map all call this one
function.  Changing it bumps the version and regenerates goldens.

Execution shape: stemming is applied at the VOCABULARY level, never per
token — each batch computes ``np.unique`` over its flat token stream,
stems only the unique terms (a Python loop over the batch vocabulary,
thousands of entries), and scatters the stems back through the inverse
index.  Token streams are Zipfian, so the per-batch vocabulary is
orders of magnitude smaller than the token count and the per-token cost
is one integer gather — the same trick the fingerprint kernels use.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

STEMMER_VERSION = "porter-v1"

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in the paper's [C](VC){m}[V] decomposition."""
    m = 0
    prev_v = False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (
        len(w) >= 2
        and w[-1] == w[-2]
        and _is_cons(w, len(w) - 1)
    )


def _cvc(w: str) -> bool:
    """*o: stem ends cvc where the last c is not w, x or y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    """The pinned Porter (1980) stemmer over the token language of the
    pinned tokenizer (lowercase [a-z0-9]+ — already lowercased)."""
    w = word
    if len(w) <= 2:
        return w

    # ---- step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # ---- step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag_1b = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # ---- step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # ---- step 2 (longest match on the penultimate letter per the
    # paper's table; a linear scan over the ordered table is equivalent
    # because no two rules' suffixes nest)
    for suf, repl in _STEP2:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 0:
                w = stem + repl
            break

    # ---- step 3
    for suf, repl in _STEP3:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 0:
                w = stem + repl
            break

    # ---- step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if suf == "ion" and not (stem and stem[-1] in "st"):
                break
            if _measure(stem) > 1:
                w = stem
            break

    # ---- step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # ---- step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


def stem_unique(terms: np.ndarray) -> np.ndarray:
    """Stem an array of UNIQUE terms (object/str dtype) -> object array."""
    return np.array([porter_stem(t) for t in terms], dtype=object)


def stem_text_column(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """string column -> string column with every token replaced by its
    Porter stem (single-space joined — the canonical corpus text shape).
    Vocabulary-level stemming: np.unique over the batch's flat tokens,
    one stem per unique term, inverse-index scatter back."""
    from .tokenizer import tokenize_column

    toks = tokenize_column(texts)
    flat = toks.flatten()
    if len(flat) == 0:
        return pc.binary_join(toks, " ")
    terms = flat.to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(terms, return_inverse=True)
    stems = stem_unique(uniq)
    stemmed_flat = pa.array(stems[inv], pa.string())
    # re-zero the offsets: flatten() already dropped any array offset
    off = toks.offsets.to_numpy(zero_copy_only=False)
    rebuilt = pa.ListArray.from_arrays(
        pa.array((off - off[0]).astype(np.int32), pa.int32()), stemmed_flat
    )
    return pc.binary_join(rebuilt, " ")


def stem_corpus(ds: "object", text_col: str = "text") -> "object":
    """Dataset transform: rewrite ``text_col`` with Porter-stemmed
    tokens (the index-time analysis chain — build a normal index over
    the output and stem query terms with the same :func:`porter_stem`)."""

    def f(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index(text_col)
        return batch.set_column(i, text_col, stem_text_column(batch[text_col]))

    return ds.map_batches(f, batch_format="pyarrow")
