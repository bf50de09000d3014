"""Evaluation entry point C (SURVEY.md §3.3): predictions vs gold evidence.

The reference scores with fever-scorer (J3 join + G5 tallies): a claim's
retrieval is correct when some gold evidence page appears in the predicted
pages.  Engine form, fully distributed:

    flatten nested evidence (M9) -> broadcast gold keyset ->
    mark hits inside map_batches -> groupby(query_id) partial ->
    global recall@k / MRR tallies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .sentences import flatten_evidence


# above this many docs the doc_id->url dict no longer belongs on the
# driver / in one broadcast object: attach urls to the (k-bounded)
# results with a distributed hash join instead (VERDICT r04 #2)
URL_DICT_LIMIT = 2_000_000


def evaluate_retrieval(
    results: "ray.data.Dataset",
    claims: "ray.data.Dataset",
    *,
    url_of_doc: dict[int, str] | None = None,
    docs: "ray.data.Dataset | None" = None,
    k: int = 10,
    url_route: str = "auto",
) -> pd.DataFrame:
    """Recall@k + MRR of document retrieval against nested gold evidence.

    Doc urls come from either ``docs`` (a Dataset with doc_id/url — the
    at-scale API: below URL_DICT_LIMIT rows a driver-side dict fast path,
    above it a distributed hash join of the k-bounded results against
    the url projection; force with ``url_route="dict"|"join"``) or a
    caller-supplied ``url_of_doc`` dict (small-corpus legacy path).
    Gold evidence pages are urls (fixtures mirror FEVER's page-title
    evidence with urls); gold state is query-set-sized and broadcast
    once.  Returns one summary row: n_queries, n_scorable, recall_at_k,
    mrr.
    """
    gold = flatten_evidence(claims).to_pandas()
    gold_pages: dict[int, set[str]] = {
        int(q): set(g["page"]) for q, g in gold.groupby("query_id")
    }

    route = "dict" if url_of_doc is not None else url_route
    if url_of_doc is None:
        if docs is None:
            raise ValueError("pass docs=(doc_id,url Dataset) or url_of_doc=")
        proj = docs.select_columns(["doc_id", "url"])
        if route == "auto":
            route = "dict" if proj.count() <= URL_DICT_LIMIT else "join"
        if route == "dict":
            url_of_doc = {
                r["doc_id"]: r["url"] for r in proj.take_all()
            }

    if route == "join":
        # distributed url attach: results are k-bounded per query, so the
        # join output stays results-sized; the corpus side is a 2-column
        # projection shuffled once on doc_id (attach_pair_texts pattern)
        n_cpu = int(ray.cluster_resources().get("CPU", 4))
        nparts = max(2, min(16, n_cpu // 2))
        withurl = results.select_columns(
            ["query_id", "rank", "doc_id"]
        ).join(proj, "left_outer", num_partitions=nparts,
               on=("doc_id",), right_on=("doc_id",))
        ref = ray.put(gold_pages)

        def mark(batch: pa.Table) -> pa.Table:
            gp = ray.get(ref)
            out_q, out_r, out_hit = [], [], []
            for qid, rank, url in zip(
                batch["query_id"].to_pylist(),
                batch["rank"].to_pylist(),
                batch["url"].to_pylist(),
            ):
                pages = gp.get(qid)
                if pages is None:
                    continue  # NEI claims not scorable (reference semantics)
                out_q.append(qid)
                out_r.append(rank)
                out_hit.append(url in pages)
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "rank": pa.array(out_r, pa.int32()),
                    "hit": pa.array(out_hit, pa.bool_()),
                }
            )

        marked = withurl.map_batches(mark, batch_format="pyarrow").to_pandas()
    else:
        ref = ray.put((gold_pages, url_of_doc))

        def mark(batch: pa.Table) -> pa.Table:
            gp, u_of_d = ray.get(ref)
            out_q, out_r, out_hit = [], [], []
            for qid, rank, did in zip(
                batch["query_id"].to_pylist(),
                batch["rank"].to_pylist(),
                batch["doc_id"].to_pylist(),
            ):
                pages = gp.get(qid)
                if pages is None:
                    continue  # NEI claims not scorable (reference semantics)
                out_q.append(qid)
                out_r.append(rank)
                out_hit.append(u_of_d.get(did) in pages)
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "rank": pa.array(out_r, pa.int32()),
                    "hit": pa.array(out_hit, pa.bool_()),
                }
            )

        marked = results.map_batches(mark, batch_format="pyarrow").to_pandas()
    n_scorable = len(gold_pages)
    if marked.empty or n_scorable == 0:
        return pd.DataFrame(
            {"n_queries": [0], "n_scorable": [n_scorable],
             "recall_at_k": [0.0], "mrr": [0.0]}
        )
    per_q = []
    for qid, g in marked.groupby("query_id"):
        hits = g[g["hit"] & (g["rank"] <= k)]
        # NER-route hits carry the rank-0 marker: they are top hits, so map
        # them to rank 1 before 1/first (a raw min() of 0 would zero the
        # query's MRR even when real hits exist).
        ranks = np.maximum(hits["rank"].to_numpy(), 1)
        first = int(ranks.min()) if ranks.size else 0
        per_q.append((qid, bool(len(hits)), 1.0 / first if first else 0.0))
    pq = pd.DataFrame(per_q, columns=["query_id", "recalled", "rr"])
    return pd.DataFrame(
        {
            "n_queries": [int(marked["query_id"].nunique())],
            "n_scorable": [n_scorable],
            "recall_at_k": [float(pq["recalled"].sum() / n_scorable)],
            "mrr": [float(pq["rr"].sum() / n_scorable)],
        }
    )


def write_results(ds: "ray.data.Dataset", out_dir: str, *,
                  rows_per_file: int = 500_000) -> str:
    """Resumable results sink: a DIRECTORY of bounded-size part files
    (never one giant file — ray_guide.md:180-184); rerunnable because the
    writer replaces the directory contents atomically per part."""
    ds.write_parquet(out_dir, min_rows_per_file=rows_per_file)
    return out_dir
