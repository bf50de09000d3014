"""Regenerate the pinned golden oracle outputs (FIXTURES.md §3).

Run from the repo root: ``python scripts/gen_goldens.py``.  Pure Python +
oracle.py — no Ray.  Rerun ONLY when a pinned version bumps (tokenizer,
extractor, NER, oracle, fixtures); tests fail loudly on version mismatch
via golden_meta.json.
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from defactonlp_ray import fixtures, oracle  # noqa: E402
from defactonlp_ray.functions.extract import EXTRACTOR_VERSION  # noqa: E402
from defactonlp_ray.functions.ner import NER_VERSION  # noqa: E402
from defactonlp_ray.functions.tokenizer import TOKENIZER_VERSION  # noqa: E402

N_DOCS = 2000
N_QUERIES = 100
K = 10
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "goldens")


def main() -> None:
    pages = fixtures.make_pages(N_DOCS)
    # golden corpus uses the raw fixture rows: doc_id = row index (urls are
    # ascending by construction, so this equals url-rank on uniques; dedup
    # paths are tested separately)
    docs = {i: t for i, t in enumerate(pages["text"].to_pylist())}
    oidx = oracle.OracleIndex(docs)
    queries = fixtures.make_query_terms(N_QUERIES)

    rows = {"query_id": [], "rank": [], "doc_id": [], "url": [], "score": []}
    for qid, terms in queries:
        for rank, (doc_id, score) in enumerate(oidx.bm25_topk(terms, K), 1):
            rows["query_id"].append(qid)
            rows["rank"].append(rank)
            rows["doc_id"].append(doc_id)
            rows["url"].append(f"https://example.org/d/{doc_id:08d}")
            rows["score"].append(score)
    tbl = pa.table(
        {
            "query_id": pa.array(rows["query_id"], pa.int64()),
            "rank": pa.array(rows["rank"], pa.int32()),
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "url": pa.array(rows["url"], pa.string()),
            "score": pa.array(rows["score"], pa.float64()),
        }
    )
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(tbl, os.path.join(OUT, "golden_topk.parquet"))
    meta = {
        "seed": fixtures.SEED,
        "n_docs": N_DOCS,
        "n_queries": N_QUERIES,
        "k": K,
        "avgdl": oidx.avgdl,
        "fixtures_version": fixtures.FIXTURES_VERSION,
        "tokenizer_version": TOKENIZER_VERSION,
        "extractor_version": EXTRACTOR_VERSION,
        "ner_version": NER_VERSION,
        "oracle_version": oracle.ORACLE_VERSION,
    }
    with open(os.path.join(OUT, "golden_meta.json"), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    print(f"wrote {tbl.num_rows} golden rows to {OUT}")

    # refresh the pinned VALUES oracles too (goldens/pinned/*.json);
    # oracle_values_sql() recomputes any entry whose fingerprint is stale
    from defactonlp_ray.pipelines import pinned  # noqa: E402

    refreshed = pinned.oracle_values_sql()
    print(f"pinned VALUES oracles current: {sorted(refreshed)}")


if __name__ == "__main__":
    main()
