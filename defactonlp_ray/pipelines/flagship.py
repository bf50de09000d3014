"""Flagship end-to-end pipelines (SURVEY.md §3.1-§3.2).

``build_pages_index``: pages parquet -> url as-of dedup -> lang filter ->
extraction validation -> deterministic doc ids -> segment index build.

``retrieve``: claims -> NER entity route (exact title match, J1) UNION
BM25 route (K1) -> per-claim dedup (U1/D1) -> results — the DeFactoNLP
document-retrieval stage shape (arXiv:1809.00509 §2.1) on Ray Data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.extract import extract_text
from ..functions.ner import NerStage
from ..functions.textnorm import norm_match_key, norm_match_key_column
from ..functions.tokenizer import tokenize
from ..stages import search as S
from ..stages.docids import assign_doc_ids
from ..stages.index_build import build_index
from ..stages.util import pool_size


# validate_extraction="sample" checks rows whose 2-hex md5(url) prefix is
# <= this threshold: "06" -> 7/256 ~ 2.7% of rows, deterministic and
# parallelism/partitioning-invariant (same rule as docs_sample_hash /
# stages.export.stratified_sample).
VALIDATE_SAMPLE_MAX = "06"


def prepare_docs(
    pages: "ray.data.Dataset", *, lang: str | None = "en",
    validate_extraction: bool | str = "sample", content_dedup: bool = False,
) -> "ray.data.Dataset":
    """pages(url, warc_ts, html, text, lang) -> docs(doc_id, url, text,
    title_norm).  Drops ``html`` immediately after the extraction check
    (wide binary rows — SURVEY.md §7.6.5).

    ``validate_extraction``: the BASELINE.json input_hint invariant
    (extract_text(html) byte-identical to the text column per url).
    ``"sample"`` (the at-scale default) re-extracts only the
    deterministic md5-prefix row sample — recomputing extraction for
    EVERY document at 100 TB roughly doubles ingest CPU for a check
    that is a corpus invariant, not a per-row transform.  ``True``
    validates every row (tests/fixtures); ``False`` skips."""

    def extract_check(batch: pa.Table) -> pa.Table:
        if validate_extraction:
            if validate_extraction == "sample":
                from ..stages.export import md5_prefix

                pref = md5_prefix(batch["url"].to_pylist())
                idxs = [i for i, p in enumerate(pref)
                        if p <= VALIDATE_SAMPLE_MAX]
                check = batch.select(["url", "html", "text"]).take(idxs) \
                    if idxs else None
            else:
                check = batch.select(["url", "html", "text"])
            if check is not None:
                for u, h, t in zip(check["url"].to_pylist(),
                                   check["html"].to_pylist(),
                                   check["text"].to_pylist()):
                    got = extract_text(h)
                    if got != t:
                        raise ValueError(
                            "extraction invariant violated (BASELINE.json "
                            f"input_hint) at url={u!r}: extractor produced "
                            f"{got[:80]!r}... but text column holds "
                            f"{t[:80]!r}..."
                        )
        batch = batch.drop_columns(["html"])
        title = pc.list_element(pc.split_pattern(batch["text"], "\n"), 0)
        return batch.append_column("title_norm", norm_match_key_column(title))

    # Order: lang filter (prefer pushing it into the read —
    # sources.readers.read_pages(lang=...) — and passing lang=None) ->
    # extraction (drops the wide html column EARLY, before any exchange)
    # -> id assignment with the url as-of dedup FUSED into its sort
    # (duplicate urls are adjacent under the (url, warc_ts) order, so
    # keep-latest is a per-block dedup + boundary rule; no separate
    # winners pass over the corpus).
    ds = pages
    if lang:
        ds = ds.map_batches(
            lambda t: t.filter(pc.equal(t["lang"], lang)), batch_format="pyarrow"
        )
    ds = ds.map_batches(extract_check, batch_format="pyarrow")
    if content_dedup:
        # D1 exact content dedup before tokenize (SURVEY.md §7.3): keep
        # the min-url row per identical text (hash-partitioned groupby
        # with per-batch combiner — stages/dedup.exact_dedup)
        from ..stages.dedup import exact_dedup

        ds = exact_dedup(ds, text_col="text", id_col="url")
    ds = assign_doc_ids(ds, key="url", latest_by="warc_ts")
    return ds.select_columns(["doc_id", "url", "text", "title_norm"])


def build_pages_index(
    pages: "ray.data.Dataset", index_dir: str, *, seg_docs: int = 8192,
    lang: str | None = "en", resume: bool = True, positions: bool = False,
    validate_extraction: bool | str = "sample",
) -> tuple[str, "ray.data.Dataset"]:
    """Full build entry point A (SURVEY.md §3.1). Returns (index_dir, docs)."""
    docs = prepare_docs(pages, lang=lang, validate_extraction=validate_extraction)
    # assign_doc_ids leaves docs materialized in doc_id order with dense
    # ids -> the zero-shuffle sorted build layout applies
    build_index(
        docs, index_dir, url_col="url", seg_docs=seg_docs, resume=resume,
        layout="sorted", positions=positions,
    )
    return index_dir, docs


# above this many docs the title->doc_id dict no longer belongs on the
# driver/in one broadcast object: use the distributed hash join instead
BROADCAST_TITLE_LIMIT = 5_000_000


def _claim_entities(claims: "ray.data.Dataset", concurrency: int) -> "ray.data.Dataset":
    """A1 actor pool + explode: claims -> (query_id, entity_norm) rows
    (one row per distinct normalized entity per claim)."""
    with_ents = claims.map_batches(
        NerStage, batch_format="pyarrow", concurrency=pool_size(concurrency),
        fn_constructor_kwargs={"text_col": "claim"},
    )

    def explode(batch: pa.Table) -> pa.Table:
        out_q, out_e = [], []
        for qid, ents in zip(
            batch["query_id"].to_pylist(), batch["entities"].to_pylist()
        ):
            seen = set()
            for e in ents:
                key = norm_match_key(e)
                if key not in seen:
                    seen.add(key)
                    out_q.append(qid)
                    out_e.append(key)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "entity_norm": pa.array(out_e, pa.string()),
            }
        )

    return with_ents.map_batches(explode, batch_format="pyarrow")


def ner_title_route(
    claims: "ray.data.Dataset", docs: "ray.data.Dataset", *,
    concurrency: int = 2, route: str = "auto",
) -> "ray.data.Dataset":
    """J1: claim -> entities (A1 actor pool) -> normalized exact match
    against page titles -> (query_id, doc_id) hits (min doc_id per title,
    deduped per claim).

    Two physical routes with identical output (pytest-asserted equal):

    * ``broadcast`` — title->doc_id dict built from a 2-column projection
      and ``ray.put`` once; right for corpora whose title dictionary fits
      an object-store object.
    * ``join`` — distributed ``Dataset.join`` of the exploded
      (query_id, entity_norm) rows against the (title_norm, min doc_id)
      table: NO driver-side materialization of the corpus projection, the
      at-10^12-docs shape.  ``auto`` picks by ``docs.count()``.
    """
    if route == "auto":
        route = "broadcast" if docs.count() <= BROADCAST_TITLE_LIMIT else "join"

    if route == "join":
        from ray.data.aggregate import Count, Min

        from ..stages.util import ensure_arrow

        ents = _claim_entities(claims, concurrency)
        titles = ensure_arrow(
            docs.select_columns(["title_norm", "doc_id"])
            .groupby("title_norm")
            .aggregate(Min("doc_id", alias_name="doc_id"))
        )
        n_cpu = int(ray.cluster_resources().get("CPU", 4))
        joined = ents.join(
            titles,
            "inner",
            num_partitions=max(2, min(8, n_cpu // 2)),
            on=("entity_norm",),
            right_on=("title_norm",),
        )

        from ..stages.util import arrow_project

        return arrow_project(
            joined.select_columns(["query_id", "doc_id"])
            .groupby(["query_id", "doc_id"])
            .aggregate(Count(alias_name="__n")),
            ["query_id", "doc_id"],
        )

    tdf = docs.select_columns(["title_norm", "doc_id"]).to_pandas()
    tdf = tdf.sort_values("doc_id").drop_duplicates("title_norm", keep="first")
    title_map = dict(zip(tdf["title_norm"], tdf["doc_id"]))
    ref = ray.put(title_map)

    with_ents = claims.map_batches(
        NerStage, batch_format="pyarrow", concurrency=pool_size(concurrency),
        fn_constructor_kwargs={"text_col": "claim"},
    )

    class TitleMatch:
        def __init__(self):
            self.titles = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_q, out_d = [], []
            for qid, ents in zip(
                batch["query_id"].to_pylist(), batch["entities"].to_pylist()
            ):
                seen = set()
                for e in ents:
                    did = self.titles.get(norm_match_key(e))
                    if did is not None and did not in seen:
                        seen.add(did)
                        out_q.append(qid)
                        out_d.append(did)
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "doc_id": pa.array(out_d, pa.int64()),
                }
            )

    return with_ents.map_batches(TitleMatch, batch_format="pyarrow", concurrency=pool_size(concurrency))


def retrieve(
    index_dir: str,
    claims: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    *,
    k: int = 10,
    concurrency: int = 2,
) -> "ray.data.Dataset":
    """Entry point B (SURVEY.md §3.2): NER route UNION BM25 route, deduped
    per claim; BM25-route docs keep rank/score, NER-route docs get
    rank 0 / score +inf-like marker column ``route``."""
    qterms = S.tokenize_queries(claims, text_col="claim")
    bm25 = S.search(index_dir, qterms, k=k, concurrency=concurrency)

    def tag_bm25(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "route", pa.array(["bm25"] * batch.num_rows, pa.string())
        )

    bm25 = bm25.map_batches(tag_bm25, batch_format="pyarrow")

    ner_hits = ner_title_route(claims, docs, concurrency=concurrency)

    def tag_ner(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return (
            batch.append_column("rank", pa.array([0] * n, pa.int32()))
            .append_column("score", pa.array([float("inf")] * n, pa.float64()))
            .append_column("route", pa.array(["ner"] * n, pa.string()))
        )

    ner_hits = ner_hits.map_batches(tag_ner, batch_format="pyarrow")

    both = bm25.union(ner_hits)

    def dedup_claim(group: pd.DataFrame) -> pd.DataFrame:
        # NER hits (rank 0) win; otherwise keep best BM25 rank (U1/D1)
        g = group.sort_values(["doc_id", "rank"], kind="mergesort")
        return g.drop_duplicates("doc_id", keep="first")

    return both.groupby("query_id").map_groups(dedup_claim, batch_format="pandas")
