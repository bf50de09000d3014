"""Wiki-title normalization + claim cleanup (SURVEY.md §2.2 M1/M7).

The FEVER wiki dump escapes titles as ``Savages_-LRB-2012_film-RRB-``
(underscores for spaces; ``-LRB- -RRB- -COLON-`` for ``( ) :``) and
DeFactoNLP's doc-retrieval route exact-matches spaCy entity strings against
those titles after normalization (arXiv:1809.00509 §2.1; paths unverified —
SURVEY.md §0).  Both directions are pinned here, with vectorized Arrow
variants for the hot path.
"""

from __future__ import annotations

import unicodedata

import pyarrow as pa
import pyarrow.compute as pc

NORMALIZER_VERSION = "wiki-norm-v1"

# (escaped, display) pairs, applied in order.
_ESCAPES = [
    ("-LRB-", "("),
    ("-RRB-", ")"),
    ("-COLON-", ":"),
    ("_", " "),
]


def title_to_display(title: str) -> str:
    """``Savages_-LRB-2012_film-RRB-`` -> ``Savages (2012 film)``."""
    for esc, disp in _ESCAPES:
        title = title.replace(esc, disp)
    return title


def display_to_title(display: str) -> str:
    """Inverse of :func:`title_to_display` (space -> ``_`` first so the
    escape tokens themselves keep their hyphens)."""
    for esc, disp in reversed(_ESCAPES):
        display = display.replace(disp, esc)
    return display


def norm_match_key(s: str) -> str:
    """Canonical join key for entity<->title exact match (J1): display form,
    NFC-normalized, casefolded, whitespace-collapsed."""
    s = title_to_display(s)
    s = unicodedata.normalize("NFC", s)
    return " ".join(s.casefold().split())


def title_to_display_column(col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized :func:`title_to_display` (pc.replace_substring chain)."""
    for esc, disp in _ESCAPES:
        col = pc.replace_substring(col, pattern=esc, replacement=disp)
    return col


def norm_match_key_column(col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized :func:`norm_match_key`.

    NFC note: the fixture/testdata corpora are ASCII, where NFC is the
    identity; the scalar path handles full Unicode and stays the semantic
    ground truth (property-tested against this one on ASCII).
    """
    col = title_to_display_column(col)
    col = pc.utf8_lower(col)
    col = pc.replace_substring_regex(col, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(col)


def clean_claim(s: str) -> str:
    """Claim text cleanup before NER/tokenize (M7): NFC + strip."""
    return unicodedata.normalize("NFC", s).strip()
