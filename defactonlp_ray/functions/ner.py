"""Rule-based NER for claim-entity extraction (SURVEY.md §2.3 A1).

The reference loads spaCy once per process and takes ``nlp(claim).ents``
per claim (arXiv:1809.00509 §2.1; spaCy is NOT installed here — verified).
This pinned deterministic substitute keeps the identical per-row contract
``claim -> entities: list[str]``:

* capitalized-token runs (FEVER claims typically LEAD with the entity —
  "Savages was a 2012 film." — so sentence-initial runs are kept),
* quoted spans,
* runs joined with single spaces, order of first appearance, deduped.

Version ``ner-v1`` — goldens depend on it (SURVEY.md §7.6.3).
"""

from __future__ import annotations

import re

NER_VERSION = "ner-v1"

_QUOTED = re.compile(r'"([^"]{1,80})"')
_WORD = re.compile(r"[A-Za-z][A-Za-z0-9'\-]*")
_CAP = re.compile(r"^[A-Z]")


def extract_entities(text: str) -> list[str]:
    """Deterministic entity spans from one claim/sentence."""
    out: list[str] = []
    seen: set[str] = set()

    for m in _QUOTED.finditer(text):
        span = m.group(1).strip()
        if span and span not in seen:
            seen.add(span)
            out.append(span)

    words = list(_WORD.finditer(text))
    run: list[str] = []
    run_start_idx = -1
    for i, m in enumerate(words):
        w = m.group(0)
        if _CAP.match(w):
            if not run:
                run_start_idx = i
            run.append(w)
        else:
            _flush(run, run_start_idx, out, seen)
            run = []
    _flush(run, run_start_idx, out, seen)
    return out


def _flush(run: list[str], start_idx: int, out: list[str], seen: set[str]) -> None:
    if not run:
        return
    span = " ".join(run)
    if span not in seen:
        seen.add(span)
        out.append(span)


class NerStage:
    """Actor-pool stage: (query_id, claim) -> + entities:list<string>.

    Mirrors the reference's load-model-once shape (state in __init__) even
    though this implementation's state is just compiled regexes — swapping
    in a real model changes only this class."""

    def __init__(self, text_col: str = "claim"):
        self.text_col = text_col

    def __call__(self, batch):
        import pyarrow as pa

        ents = [extract_entities(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column("entities", pa.array(ents, pa.list_(pa.string())))
