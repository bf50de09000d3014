"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in defactonlp_ray) calls ``ray.init``/``ray.shutdown``.

* ``entry()`` — flagship pipeline on /root/testdata/sf0.001: build the
  segment inverted index over ``documents`` and run the pinned BM25 query
  set through the searcher actor pool (SURVEY.md §3.1-§3.2).
* ``queries()`` / ``oracle_sql()`` — operator registry per SURVEY.md §2;
  implementations live in defactonlp_ray/pipelines/queries.py.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from defactonlp_ray.pipelines import queries as _Q


def entry() -> Any:
    """Flagship: index build + BM25 top-k on sf0.001 (rows >= 0, stable
    schema: query_id, rank, doc_id, score)."""
    return _Q.q_bm25_topk("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented pipeline/operator from SURVEY.md §2."""
    return dict(_Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per entry.  Directly-expressible ops carry
    handwritten SQL; fixture-pipeline / custom-hash ops carry the pinned
    output of the single-process pure-Python reference implementation
    (defactonlp_ray/pipelines/pinned.py) inlined as VALUES — committed
    goldens, fingerprint-checked against the live tables."""
    out = dict(_Q.ORACLES)
    out.update(_Q.pinned_oracles())
    return out
