"""Deterministic HTML -> text main-content extraction (SURVEY.md §2.2 M5).

The north_rule asks for trafilatura-style extraction with a byte-identical
``extract_text(html) == text`` invariant per url (BASELINE.json input_hint).
trafilatura is not installed in this environment (verified), so this is a
self-contained, pinned, pure-Python extractor:

1. drop ``<script> <style> <nav> <header> <footer> <aside>`` subtrees
   (boilerplate removal — the "trafilatura-style" part),
2. take ``<title>`` text as the first line,
3. strip remaining tags from ``<body>``, unescape HTML entities, collapse
   whitespace within each text block,
4. join title and body blocks with ``"\\n"``.

Output for the fixture template (fixtures.HTML_TEMPLATE) is exactly
``title + "\\n" + body`` — the invariant is asserted for every fixture row in
tests/test_extract.py and re-checked inside the build pipeline.
"""

from __future__ import annotations

import html as _html
import re

EXTRACTOR_VERSION = "extract-v1"

_DROP_RE = re.compile(
    r"<(script|style|nav|header|footer|aside)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)
_BODY_RE = re.compile(r"<body[^>]*>(.*?)</body\s*>", re.IGNORECASE | re.DOTALL)
# block-level boundaries become newlines before tag stripping
_BLOCK_RE = re.compile(
    r"</?(p|div|br|li|ul|ol|h[1-6]|table|tr|section|article|blockquote)\b[^>]*/?>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"[ \t\r\f\v]+")


def extract_text(html_bytes: bytes) -> str:
    """Pinned main-content extraction; pure function of the input bytes."""
    raw = html_bytes.decode("utf-8", errors="replace")
    raw = _DROP_RE.sub(" ", raw)
    m = _TITLE_RE.search(raw)
    title = _clean(m.group(1)) if m else ""
    b = _BODY_RE.search(raw)
    body_raw = b.group(1) if b else raw
    body_raw = _BLOCK_RE.sub("\n", body_raw)
    body_raw = _TAG_RE.sub(" ", body_raw)
    blocks = [_clean(x) for x in body_raw.split("\n")]
    blocks = [x for x in blocks if x]
    parts = ([title] if title else []) + blocks
    return "\n".join(parts)


def _clean(s: str) -> str:
    s = _html.unescape(s)
    return _WS_RE.sub(" ", s).strip()
