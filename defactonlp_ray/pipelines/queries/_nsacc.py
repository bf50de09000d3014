"""Shared-namespace accumulator for the split query-registry parts.

The former single 22.6k-line ``pipelines/queries.py`` executed all
definitions in one module namespace, with call-time forward references
(e.g. helpers defined early referencing ``_BM25_QUERIES`` defined
later).  After the mechanical split each part seeds its globals from
``NS`` before its body runs and exports its globals back afterwards;
``__init__`` then injects the final merged namespace into every part.
"""

from __future__ import annotations

NS: dict = {}


def export(g: dict) -> None:
    NS.update({k: v for k, v in g.items()
               if not (k.startswith("__") and k.endswith("__"))})
