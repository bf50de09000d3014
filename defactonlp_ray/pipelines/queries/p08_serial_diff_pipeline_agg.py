# Part 08/11 of the former single-module pipelines/queries.py
# (mechanical split, round 5 — VERDICT r04 next-round #6).  Parts share
# ONE late-bound namespace via _nsacc: globals are seeded from the
# accumulator before this body runs (preserving original top-level
# execution order) and the final merged namespace is injected back into
# every part by __init__, so call-time forward references behave exactly
# as in the single file.  Original lines 14802-16727.
from __future__ import annotations

from ._nsacc import NS as _ns_seed

globals().update(_ns_seed)
del _ns_seed



# -------------------- serial_diff pipeline agg / composite pagination

_SERIAL_DIFF_LAG = 7


def q_events_serial_diff(sf_dir: str):
    """Elasticsearch serial_diff pipeline aggregation (lag=7): the
    week-over-week difference of the daily event count — the classic
    seasonality-removal step before anomaly detection.  Same shape as
    events_derivative: per-batch Arrow day-count combiner -> ONE
    groupby(day) exchange -> the lag runs over the |days|-row series on
    the driver.  Days without a defined lag (the first 7) emit no row,
    the ES semantics (the diff bucket appears only once the lag window
    is full)."""

    def part(batch: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(batch["ts"], unit="day"), pa.timestamp("us")
        )
        agg = pa.table({"window_start": day}).group_by(
            "window_start"
        ).aggregate([([], "count_all")])
        return agg.rename_columns(["window_start", "n_p"])

    daily = (
        read_table(sf_dir, "events", ["ts"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Sum("n_p", alias_name="n"))
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    lag = _SERIAL_DIFF_LAG
    n = daily["n"].to_numpy(np.int64)
    out = daily.iloc[lag:].copy()
    out["diff7"] = n[lag:] - n[:-lag]
    return out[["window_start", "n", "diff7"]].reset_index(drop=True)


SQL_EVENTS_SERIAL_DIFF = (
    "SELECT window_start, n, diff7 FROM ("
    "SELECT window_start, n, "
    f"CAST(n - lag(n, {_SERIAL_DIFF_LAG}) OVER (ORDER BY window_start) "
    "AS BIGINT) AS diff7 "
    "FROM (SELECT date_trunc('day', ts) AS window_start, count(*) AS n "
    "FROM events GROUP BY 1)) WHERE diff7 IS NOT NULL"
)


_COMPOSITE_PAGE = 10


def q_composite_pages(sf_dir: str):
    """Elasticsearch composite aggregation with ``after``-key pagination:
    doc counts bucketed by the (lang, source) pair, page size 10,
    returning the SECOND page.  The composite contract is what matters
    at scale: each page re-scans with the after-key pushed into the
    scan as a tuple-compare filter, so bucket state is bounded by the
    page size — never by the bucket count.  Page 1 here only collects
    its LAST key (a tiny full-distinct pass); page 2 masks
    (lang, source) > after inside map_batches BEFORE its groupby, the
    pushdown a 10^9-bucket composite relies on."""
    keys = (
        _docs(sf_dir, ["lang", "source"])
        .groupby(["lang", "source"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )
    if len(keys) <= _COMPOSITE_PAGE:
        return keys.head(0)[["lang", "source", "n"]]
    a_lang, a_src = keys.iloc[_COMPOSITE_PAGE - 1][["lang", "source"]]

    def after_mask(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        src = batch["source"].to_numpy(zero_copy_only=False)
        m = (lang > a_lang) | ((lang == a_lang) & (src > a_src))
        return batch.filter(pa.array(m))

    page = (
        _docs(sf_dir, ["lang", "source"])
        .map_batches(after_mask, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values(["lang", "source"])
        .head(_COMPOSITE_PAGE)
        .reset_index(drop=True)
    )
    return page[["lang", "source", "n"]]


SQL_COMPOSITE_PAGES = (
    "SELECT lang, source, count(*) AS n FROM documents "
    "GROUP BY lang, source ORDER BY lang, source "
    f"LIMIT {_COMPOSITE_PAGE} OFFSET {_COMPOSITE_PAGE}"
)


# ------------------- index sorting + early termination (Lucene)

# conjunctions chosen to exercise: a broad AND (early exit in segment 0),
# a selective 3-term AND, a single common term, and an absent term
_SORTED_QUERIES: list[tuple[int, list[str]]] = [
    (0, ["the", "data"]),
    (1, ["hash", "join", "table"]),
    (2, ["table"]),
    (3, ["zz", "the"]),
]


def q_index_sorted_topk(sf_dir: str):
    """Lucene index sorting + early-terminated top-k
    (stages/sorted_index.py): doc ids reassigned as the global rank
    under (n_chars DESC, doc_id ASC), so a conjunctive query's first k
    hits IN INDEX ORDER are the global top-k by n_chars — the scan
    stops at the first segment boundary past the k-th hit and never
    opens later segments (stronger than Lucene, which early-exits
    per segment but visits all of them).  Original ids come back
    through the doc-range-partitioned ``sortmap/`` sidecar."""
    from ...stages.sorted_index import build_sorted_index, sorted_search

    idx = _tmp_index_dir(sf_dir, "idxsorted")
    docs = _docs(sf_dir, ["doc_id", "text", "n_chars"])
    n = docs.count()
    build_sorted_index(
        docs, idx, sort_col="n_chars", seg_docs=max(256, n // 8),
        resume=True,
    )
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(
                    [q[0] for q in _SORTED_QUERIES], pa.int64()
                ),
                "terms": pa.array(
                    [q[1] for q in _SORTED_QUERIES],
                    pa.list_(pa.string()),
                ),
            }
        )
    )
    res = sorted_search(idx, qds, k=10, concurrency=2).to_pandas()
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)[
        ["query_id", "rank", "doc_id", "sort_val"]
    ]


def _index_sorted_sql(queries: list[tuple[int, list[str]]], k: int = 10) -> str:
    """Conjunctive-match oracle: docs whose distinct-term hit count
    equals the query's distinct term count, ordered by
    (n_chars DESC, doc_id)."""
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in queries for t in sorted(set(terms))
    )
    return (
        "WITH toks AS (SELECT DISTINCT doc_id, term FROM ("
        + _TOKS_SQL
        + ")), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "nq AS (SELECT query_id, count(*) AS n_terms FROM q "
        "GROUP BY query_id), "
        "hit AS (SELECT q.query_id, t.doc_id FROM q "
        "JOIN toks t USING (term) GROUP BY q.query_id, t.doc_id "
        "HAVING count(*) = (SELECT n_terms FROM nq "
        "WHERE nq.query_id = q.query_id)) "
        "SELECT query_id, rank, doc_id, sort_val FROM ("
        "SELECT h.query_id, h.doc_id, d.n_chars AS sort_val, "
        "CAST(row_number() OVER (PARTITION BY h.query_id "
        "ORDER BY d.n_chars DESC, h.doc_id) AS INTEGER) AS rank "
        "FROM hit h JOIN documents d ON d.doc_id = h.doc_id) "
        f"WHERE rank <= {k}"
    )


SQL_INDEX_SORTED_TOPK = _index_sorted_sql(_SORTED_QUERIES)


# ----------------------- source formats: WARC + JSONL round trips

_WARC_SHARDS = 4


def _warc_export_dir(sf_dir: str) -> str:
    """Deterministic WARC export of the documents table (4 shard files,
    shard = doc_id % 4, urls doc://<id>, bodies the pinned fixture HTML
    wrap) under a version+fingerprint-keyed /tmp dir — built once,
    resumed by later entries."""
    from ...sources.warc import write_warc

    out = _tmp_index_dir(sf_dir, "warc")
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    shards: list[list[tuple[str, bytes]]] = [[] for _ in range(_WARC_SHARDS)]
    for did, text in sorted(
        zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
    ):
        html = (
            "<html><head><title></title></head><body><p>"
            + text
            + "</p></body></html>"
        ).encode("utf-8")
        shards[int(did) % _WARC_SHARDS].append((f"doc://{did}", html))
    for s, rows in enumerate(shards):
        write_warc(rows, os.path.join(out, f"shard-{s}.warc.gz"))
    with open(done + ".tmp", "w") as f:
        f.write("ok")
    os.replace(done + ".tmp", done)
    return out


def q_warc_extract_stats(sf_dir: str):
    """WARC front door (sources/warc.py — the Common Crawl container):
    documents round-trip through a deterministic 4-shard .warc.gz export,
    back in via the length-framed Ray reader (one task per file, the CC
    parallel unit), through the pinned HTML->text extractor, into
    per-shard (n_docs, total_tokens) stats.  Equality with SQL over the
    parquet table proves the writer, the parser, and the extractor
    compose to an exact round trip (the M5 byte-identical invariant,
    now entering through a real crawl format)."""
    from ...functions.extract import extract_text
    from ...sources.warc import read_warc

    out = _warc_export_dir(sf_dir)
    paths = [
        os.path.join(out, f"shard-{s}.warc.gz") for s in range(_WARC_SHARDS)
    ]

    def stats(batch: pa.Table) -> pa.Table:
        texts = [
            extract_text(h) for h in batch["html"].to_pylist()
        ]
        dids = np.asarray(
            [int(u.split("://", 1)[1]) for u in batch["url"].to_pylist()],
            dtype=np.int64,
        )
        _terms, row_idx, doc_len = flatten_tokens(
            pa.array(texts, pa.string())
        )
        t = pa.table(
            {
                "shard": pa.array(dids % _WARC_SHARDS, pa.int64()),
                "n_p": pa.array(np.ones(dids.size, dtype=np.int64)),
                "tok_p": pa.array(doc_len.astype(np.int64), pa.int64()),
            }
        )
        return t

    return (
        read_warc(paths)
        .map_batches(stats, batch_format="pyarrow")
        .groupby("shard")
        .aggregate(
            Sum("n_p", alias_name="n_docs"),
            Sum("tok_p", alias_name="total_tokens"),
        )
    )


SQL_WARC_EXTRACT_STATS = (
    f"SELECT doc_id % {_WARC_SHARDS} AS shard, count(*) AS n_docs, "
    "CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) "
    "AS BIGINT) AS total_tokens FROM documents GROUP BY 1"
)


def q_jsonl_lang_counts(sf_dir: str):
    """JSONL front door: documents round-trip through a gzipped
    newline-delimited-JSON export (the other ubiquitous crawl/dataset
    interchange format) and back in via ``ray.data.read_json``, then the
    standard lang tally.  Equality with SQL over the parquet table
    proves the lossless round trip."""
    out = _tmp_index_dir(sf_dir, "jsonl")
    done = os.path.join(out, "_SUCCESS")
    if not os.path.exists(done):
        os.makedirs(out, exist_ok=True)
        import gzip as _gzip
        import json as _json

        tbl = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "lang"],
        )
        rows = sorted(
            zip(tbl["doc_id"].to_pylist(), tbl["lang"].to_pylist())
        )
        half = len(rows) // 2
        for s, chunk in enumerate((rows[:half], rows[half:])):
            buf = "".join(
                _json.dumps({"doc_id": d, "lang": g}) + "\n"
                for d, g in chunk
            ).encode("utf-8")
            p = os.path.join(out, f"part-{s}.jsonl.gz")
            with open(p + ".tmp", "wb") as f:
                f.write(_gzip.compress(buf, mtime=0))
            os.replace(p + ".tmp", p)
        with open(done + ".tmp", "w") as f:
            f.write("ok")
        os.replace(done + ".tmp", done)

    ds = ray.data.read_json(
        [os.path.join(out, f"part-{s}.jsonl.gz") for s in range(2)]
    )
    return ds.groupby("lang").aggregate(Count(alias_name="n_docs"))


SQL_JSONL_LANG_COUNTS = (
    "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang"
)


# ------------------------------ request cache (ES request cache)

def q_bm25_cached_topk(sf_dir: str):
    """BM25 top-k through the request-cache actor
    (stages/search.CachedSearcherActor — the Elasticsearch request
    cache): per-actor LRU keyed by (manifest version + deletes
    fingerprint, mode, k, terms), so an index mutation starts a fresh
    epoch and stale rows are unservable by construction.  Each query
    runs TWICE (the second pass duplicates the batch) and the returned
    rows are the second pass's — bit-identical to the uncached route,
    which is exactly what the shared bm25 oracle checks."""
    from ...stages.search import cached_search

    idx = _build_docs_index(sf_dir)
    qds = _query_terms_ds(_BM25_QUERIES)
    res = cached_search(
        idx, qds.union(qds), k=20, concurrency=2
    ).to_pandas()
    res = res.drop_duplicates(["query_id", "rank", "doc_id"])
    return _rerank_rounded(res, k=10)


# ----------------------- bloom-pruned counting (segment term blooms)

# common terms, a rare term, and pure-absent terms (the pruning case)
_BLOOM_COUNT_QUERIES: list[tuple[int, list[str]]] = [
    (0, ["the", "data"]),
    (1, ["hash", "join"]),
    (2, ["zzqq", "table"]),
    (3, ["zz", "qqq"]),
]


def q_bm25_bloom_count(sf_dir: str):
    """Total-hit counting behind per-segment term Bloom filters
    (stages/bloom.py — the Lucene BloomFilteringPostingsFormat idea at
    the segment-routing layer): a bloom "no" skips the (segment, term)
    parquet point-read entirely, with results bit-identical to
    mode='count' because blooms have no false negatives.  Segment
    immutability makes the sidecars permanently valid; missing sidecars
    degrade to the unpruned read."""
    from ...stages.bloom import bloom_count_search, build_term_blooms

    idx = _build_docs_index(sf_dir)
    build_term_blooms(idx)
    return (
        bloom_count_search(
            idx, _query_terms_ds(_BLOOM_COUNT_QUERIES), concurrency=2
        )
        .to_pandas()
        .sort_values("query_id")
        .reset_index(drop=True)
    )


SQL_BM25_BLOOM_COUNT = _count_sql(_BLOOM_COUNT_QUERIES)


# ------------- dense date histogram / ingest pipeline / CCNet buckets

def q_events_dense_histogram(sf_dir: str):
    """Elasticsearch date_histogram with ``min_doc_count=0``: the daily
    event-count series with EMPTY buckets materialized as zero rows
    between the observed min and max day (chart-ready output; the agg
    families above skip empty buckets).  The corpus pass is the usual
    day-count combiner; zero-filling runs over the |days|-row series."""

    def part(batch: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(batch["ts"], unit="day"), pa.timestamp("us")
        )
        agg = pa.table({"window_start": day}).group_by(
            "window_start"
        ).aggregate([([], "count_all")])
        return agg.rename_columns(["window_start", "n_p"])

    daily = (
        read_table(sf_dir, "events", ["ts"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Sum("n_p", alias_name="n"))
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    full = pd.DataFrame(
        {
            "window_start": pd.date_range(
                daily["window_start"].iloc[0],
                daily["window_start"].iloc[-1],
                freq="D",
            )
        }
    )
    out = full.merge(daily, on="window_start", how="left")
    out["n"] = out["n"].fillna(0).astype(np.int64)
    return out


SQL_EVENTS_DENSE_HISTOGRAM = (
    "WITH daily AS (SELECT date_trunc('day', ts) AS window_start, "
    "count(*) AS n FROM events GROUP BY 1), "
    "span AS (SELECT unnest(generate_series(min(window_start), "
    "max(window_start), INTERVAL 1 DAY)) AS window_start FROM daily) "
    "SELECT s.window_start, CAST(coalesce(d.n, 0) AS BIGINT) AS n "
    "FROM span s LEFT JOIN daily d USING (window_start)"
)


def q_ingest_pipeline(sf_dir: str):
    """Elasticsearch ingest-pipeline processor chain as ONE vectorized
    map_batches (the ingest-node shape: a declarative processor list
    compiled into a single pass, applied before indexing): uppercase +
    gsub on ``source``, split-and-keep-first on ``text``, a token-count
    script field, and a unit-convert on ``n_chars``.  Every processor is
    a pyarrow.compute kernel — no Python per row."""

    def chain(batch: pa.Table) -> pa.Table:
        terms, row_idx, doc_len = flatten_tokens(batch["text"])
        first = pc.list_element(
            pc.split_pattern(batch["text"], " ", max_splits=1), 0
        )
        src = pc.replace_substring(
            pc.utf8_upper(batch["source"]), "-", "_"
        )
        kchars = pc.divide(
            pc.cast(batch["n_chars"], pa.float64()), 1000.0
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source_norm": src,
                "first_word": first,
                "n_tokens": pa.array(doc_len.astype(np.int64), pa.int64()),
                "kchars": pc.round(kchars, 6),
            }
        )

    return _docs(
        sf_dir, ["doc_id", "text", "source", "n_chars"]
    ).map_batches(chain, batch_format="pyarrow")


SQL_INGEST_PIPELINE = (
    "SELECT doc_id, replace(upper(source), '-', '_') AS source_norm, "
    "string_split(text, ' ')[1] AS first_word, "
    "CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) "
    "AS BIGINT) AS n_tokens, "
    "round(n_chars / 1000.0, 6) AS kchars FROM documents"
)


def q_ccnet_ppl_buckets(sf_dir: str):
    """CCNet's perplexity bucketing (Wenzek et al. 2019 split each
    language's crawl into head/middle/tail by LM perplexity; the
    unigram cross-entropy is the model-free analogue, and the cuts here
    are the exact per-lang QUARTILES q1/q3 — quarter fractions keep the
    interpolation arithmetic exact, where CCNet's thirds would not be):
    doc counts per (lang, bucket), head = logloss <= q1 (cleanest 25%),
    tail > q3.  Shape: the per-doc scoring pass streams with the
    broadcast unigram model; bucket counts and the cutoffs both derive
    from ONE per-(lang, rounded-logloss) histogram — the exchange
    carries the histogram, never documents.  Cutoffs interpolate
    between adjacent observed order statistics, so an engine-vs-oracle
    ulp difference in the lerp cannot flip any doc's bucket (no doc
    value lies strictly between the bracketing statistics)."""
    ref = _unigram_nlp_ref(sf_dir)

    def part(batch: pa.Table) -> pa.Table:
        v, nlp = ray.get(ref)
        terms, row_idx, doc_len = flatten_tokens(batch["text"])
        n = len(batch)
        n_tok = doc_len.astype(np.int64)
        toks = terms.to_numpy(zero_copy_only=False).astype(str)
        vals = nlp[np.searchsorted(v, toks)] if toks.size else np.empty(0)
        s = np.bincount(row_idx, weights=vals, minlength=n)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = np.where(n_tok > 0, s / n_tok, 0.0)
        t = pa.table(
            {
                "lang": batch["lang"],
                "ll": pa.array(np.round(mean, 6), pa.float64()),
            }
        ).filter(pa.array(n_tok > 0))
        agg = t.group_by(["lang", "ll"]).aggregate([([], "count_all")])
        return agg.rename_columns(["lang", "ll", "c_p"])

    hist = (
        _docs(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(part, batch_format="pyarrow")
        .groupby(["lang", "ll"])
        .aggregate(Sum("c_p", alias_name="c"))
        .to_pandas()
        .sort_values(["lang", "ll"])
        .reset_index(drop=True)
    )
    rows = []
    for lang, g in hist.groupby("lang"):
        v = g["ll"].to_numpy(np.float64)
        c = g["c"].to_numpy(np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])

        def q_at(q: float) -> float:
            h = (n - 1) * q
            lo = int(np.floor(h))
            frac = h - lo
            v_lo = float(v[np.searchsorted(cum, lo, side="right")])
            if frac == 0.0:
                return v_lo
            v_hi = float(v[np.searchsorted(cum, lo + 1, side="right")])
            return v_lo + frac * (v_hi - v_lo)

        c1, c3 = q_at(0.25), q_at(0.75)
        head = int(c[v <= c1].sum())
        middle = int(c[(v > c1) & (v <= c3)].sum())
        tail = int(c[v > c3].sum())
        rows.extend(
            [(lang, "head", head), (lang, "middle", middle),
             (lang, "tail", tail)]
        )
    out = pd.DataFrame(rows, columns=["lang", "bucket", "n"])
    out["n"] = out["n"].astype(np.int64)
    return out[out["n"] > 0].reset_index(drop=True)


SQL_CCNET_PPL_BUCKETS = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "stats AS (SELECT count(*) AS total FROM toks), "
    "tf AS (SELECT term, count(*) AS c FROM toks GROUP BY term), "
    "ll AS (SELECT doc_id, "
    "round(avg(-ln(tf.c::DOUBLE / stats.total)), 6) AS ll "
    "FROM toks JOIN tf USING (term) CROSS JOIN stats GROUP BY doc_id), "
    "d2 AS (SELECT d.lang, l.ll FROM ll l "
    "JOIN documents d USING (doc_id)), "
    "cut AS (SELECT lang, quantile_cont(ll, 0.25) AS c1, "
    "quantile_cont(ll, 0.75) AS c3 FROM d2 GROUP BY lang) "
    "SELECT lang, bucket, n FROM (SELECT d2.lang, "
    "CASE WHEN ll <= c1 THEN 'head' WHEN ll <= c3 THEN 'middle' "
    "ELSE 'tail' END AS bucket, count(*) AS n "
    "FROM d2 JOIN cut USING (lang) GROUP BY 1, 2) WHERE n > 0"
)


# --------------------------- boxplot agg / doc containment dedup

def q_boxplot_chars(sf_dir: str):
    """Elasticsearch boxplot aggregation per lang over n_chars, EXACT
    (ES approximates with TDigest; the pinned rule here is
    quantile_cont's linear interpolation — h = (n-1)q, v_lo + frac *
    (v_hi - v_lo); quarter fractions of integer values are exact binary,
    so both engines agree bit-for-bit before the defensive round-6).
    Shape: per-batch (lang, n_chars) count partials -> ONE groupby on
    the VALUE HISTOGRAM (|langs| x |distinct lengths| rows, never docs)
    -> quantiles walked off the cumulative histogram on the driver.
    Whiskers are the ES rule: extreme values inside the 1.5-IQR
    fences."""

    def part(batch: pa.Table) -> pa.Table:
        t = batch.select(["lang", "n_chars"]).group_by(
            ["lang", "n_chars"]
        ).aggregate([([], "count_all")])
        return t.rename_columns(["lang", "n_chars", "c_p"])

    hist = (
        _docs(sf_dir, ["lang", "n_chars"])
        .map_batches(part, batch_format="pyarrow")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("c_p", alias_name="c"))
        .to_pandas()
        .sort_values(["lang", "n_chars"])
        .reset_index(drop=True)
    )
    rows = []
    for lang, g in hist.groupby("lang"):
        v = g["n_chars"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])

        def q_at(q: float) -> float:
            h = (n - 1) * q
            lo = int(np.floor(h))
            frac = h - lo
            v_lo = float(v[np.searchsorted(cum, lo, side="right")])
            if frac == 0.0:
                return v_lo
            v_hi = float(v[np.searchsorted(cum, lo + 1, side="right")])
            return v_lo + frac * (v_hi - v_lo)

        q1, med, q3 = q_at(0.25), q_at(0.5), q_at(0.75)
        iqr = q3 - q1
        lo_f, hi_f = q1 - 1.5 * iqr, q3 + 1.5 * iqr
        inside = (v >= lo_f) & (v <= hi_f)
        rows.append(
            (
                lang, n, round(q1, 6), round(med, 6), round(q3, 6),
                round(iqr, 6), int(v[inside].min()), int(v[inside].max()),
                int(c[(v < lo_f) | (v > hi_f)].sum()),
            )
        )
    out = pd.DataFrame(
        rows,
        columns=["lang", "n", "q1", "median", "q3", "iqr", "lo_whisker",
                 "hi_whisker", "n_outliers"],
    )
    out["n"] = out["n"].astype(np.int64)
    out["lo_whisker"] = out["lo_whisker"].astype(np.int64)
    out["hi_whisker"] = out["hi_whisker"].astype(np.int64)
    out["n_outliers"] = out["n_outliers"].astype(np.int64)
    return out


SQL_BOXPLOT_CHARS = (
    "WITH s AS (SELECT lang, count(*) AS n, "
    "quantile_cont(n_chars, 0.25) AS q1, "
    "quantile_cont(n_chars, 0.5) AS med, "
    "quantile_cont(n_chars, 0.75) AS q3 FROM documents GROUP BY lang) "
    "SELECT s.lang, s.n, round(s.q1, 6) AS q1, round(s.med, 6) AS median, "
    "round(s.q3, 6) AS q3, round(s.q3 - s.q1, 6) AS iqr, "
    "CAST(min(d.n_chars) FILTER (WHERE d.n_chars >= s.q1 - 1.5 * (s.q3 - s.q1)) "
    "AS BIGINT) AS lo_whisker, "
    "CAST(max(d.n_chars) FILTER (WHERE d.n_chars <= s.q3 + 1.5 * (s.q3 - s.q1)) "
    "AS BIGINT) AS hi_whisker, "
    "CAST(count(*) FILTER (WHERE d.n_chars < s.q1 - 1.5 * (s.q3 - s.q1) "
    "OR d.n_chars > s.q3 + 1.5 * (s.q3 - s.q1)) AS BIGINT) AS n_outliers "
    "FROM s JOIN documents d USING (lang) "
    "GROUP BY s.lang, s.n, s.q1, s.med, s.q3"
)


_CONTAIN_MIN_TOK = 8  # containment dedup floor: docs under 8 tokens skip


def q_containment_dedup(sf_dir: str):
    """Doc-level exact-substring containment dedup (the document-
    granular case of Lee et al. 2022's exact-substring dedup): a doc
    (>= 8 tokens) is CONTAINED when its token sequence appears
    contiguously inside another doc's; report (doc_id, container_id =
    smallest qualifying container).  Exact duplicates resolve by the
    pinned tie rule: the longer text contains the shorter; equal texts
    contain toward the smaller doc_id.  Shape: candidates = pairs
    sharing the contained doc's FIRST 8-gram (sound: a contiguous
    subsequence's first 8 tokens are an 8-gram of the container), found
    with the dup_ngram (gram, doc) machinery + one hash join; texts
    attach to the candidate PAIR set only (never all pairs), and the
    padded-space containment probe runs per candidate.  The corpus-
    scale exchanges are the gram join and the two text-attach joins;
    the corpus is never materialized — each consumer re-reads the pruned
    2-column parquet."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def first_gram(batch: pa.Table) -> pa.Table:
        terms, row_idx, doc_len = flatten_tokens(batch["text"])
        t = np.asarray(terms.to_pylist(), dtype=object).astype(str)
        n = _CONTAIN_MIN_TOK
        starts = np.concatenate(
            ([0], np.cumsum(doc_len)[:-1])
        ).astype(np.int64)
        keep = doc_len >= n
        g = t[starts[keep, None] + np.arange(n)[None, :]]
        gram = g[:, 0].copy()
        for j in range(1, n):
            gram = np.char.add(np.char.add(gram, " "), g[:, j])
        return pa.table(
            {
                "gram": pa.array(gram, pa.string()),
                "small_id": pa.array(
                    batch["doc_id"].to_numpy(zero_copy_only=False)[keep],
                    pa.int64(),
                ),
            }
        )

    def all_grams(batch: pa.Table) -> pa.Table:
        gram, dids = _ngram_doc_pairs(batch, _CONTAIN_MIN_TOK)
        return pa.table(
            {
                "gram": pa.array(gram, pa.string()),
                "big_id": pa.array(dids, pa.int64()),
            }
        ).group_by(["gram", "big_id"]).aggregate([])

    firsts = docs.map_batches(first_gram, batch_format="pyarrow")
    grams = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        all_grams, batch_format="pyarrow"
    )
    cand = (
        firsts.join(grams, join_type="inner", on=("gram",),
                    num_partitions=16)
        .map_batches(
            lambda t: t.filter(
                pc.not_equal(t["small_id"], t["big_id"])
            ).select(["small_id", "big_id"]).rename_columns(
                ["id_a", "id_b"]
            ),
            batch_format="pyarrow",
        )
        .materialize()  # small candidate set; both routes consume it
    )

    def _verify_tbl(batch: pa.Table, texts_a, texts_b) -> pa.Table:
        out_s, out_b = [], []
        for s, b, st, bt in zip(
            batch["id_a"].to_pylist(), batch["id_b"].to_pylist(),
            texts_a, texts_b,
        ):
            if (" " + st + " ") in (" " + bt + " ") and (
                len(bt) > len(st) or (len(bt) == len(st) and b < s)
            ):
                out_s.append(s)
                out_b.append(b)
        return pa.table(
            {
                "doc_id": pa.array(out_s, pa.int64()),
                "cont_p": pa.array(out_b, pa.int64()),
            }
        )

    # same auto route as the near-dup verifiers: broadcast the candidate
    # texts under the pair limit, two hash joins above it
    if cand.count() <= dedup.BROADCAST_PAIR_LIMIT:
        dmap_ref = ray.put(
            dedup.candidate_texts(cand, _docs(sf_dir, ["doc_id", "text"]))
        )

        def verify(batch: pa.Table) -> pa.Table:
            dmap = ray.get(dmap_ref)
            return _verify_tbl(
                batch,
                [dmap[int(a)] for a in batch["id_a"].to_pylist()],
                [dmap[int(b)] for b in batch["id_b"].to_pylist()],
            )

        verified = cand.map_batches(verify, batch_format="pyarrow")
    else:
        withtexts = dedup.attach_pair_texts(
            cand, _docs(sf_dir, ["doc_id", "text"])
        )

        def verify_join(batch: pa.Table) -> pa.Table:
            return _verify_tbl(
                batch,
                batch["__text_a"].to_pylist(),
                batch["__text_b"].to_pylist(),
            )

        verified = withtexts.map_batches(verify_join, batch_format="pyarrow")

    from ray.data.aggregate import Min

    return (
        verified.groupby("doc_id")
        .aggregate(Min("cont_p", alias_name="container_id"))
    )


SQL_CONTAINMENT_DEDUP = (
    "WITH d AS (SELECT doc_id, text, "
    "len(list_filter(string_split(text, ' '), x -> x <> '')) AS nt "
    "FROM documents) "
    "SELECT a.doc_id, min(b.doc_id) AS container_id "
    f"FROM d a JOIN d b ON a.doc_id <> b.doc_id AND a.nt >= {_CONTAIN_MIN_TOK} "
    "AND position(' ' || a.text || ' ' IN ' ' || b.text || ' ') > 0 "
    "AND (len(b.text) > len(a.text) "
    "OR (len(b.text) = len(a.text) AND b.doc_id < a.doc_id)) "
    "GROUP BY a.doc_id"
)


# ---------------------- span_containing (Lucene SpanContainingQuery)

# (query_id, term_a, term_b, gap, little): containment hit, boundary
# gap, absent little, absent big member, little == big member
_SPAN_CONTAINING_QUERIES: list[tuple[int, str, str, int, str]] = [
    (0, "hash", "join", 3, "the"),
    (1, "table", "scan", 5, "data"),
    (2, "the", "data", 2, "zz"),
    (3, "zz", "table", 2, "the"),
    (4, "the", "data", 4, "the"),
]


def q_span_containing_topk(sf_dir: str):
    """Lucene SpanContainingQuery (stages/phrase.span_containing_search):
    big = the unordered (term_a, term_b) pair within ``gap``
    (|i - j| <= gap), little = an occurrence of ``little``; a big span
    [min(i,j), max(i,j)] matches iff it contains a little position
    (endpoints inclusive); per-doc tf = matching pair count, pseudo-term
    BM25 rank.  Completes the span family (near/not/first/containing).
    Fully vectorized over the fixed-radix occurrence keys — pair
    enumeration is repeat+arange over per-anchor windows, containment
    one searchsorted probe per pair."""
    from ...stages.phrase import span_containing_search

    idx = _build_docs_index_pos(sf_dir)
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(
                    [q[0] for q in _SPAN_CONTAINING_QUERIES], pa.int64()
                ),
                "term_a": pa.array(
                    [q[1] for q in _SPAN_CONTAINING_QUERIES], pa.string()
                ),
                "term_b": pa.array(
                    [q[2] for q in _SPAN_CONTAINING_QUERIES], pa.string()
                ),
                "gap": pa.array(
                    [q[3] for q in _SPAN_CONTAINING_QUERIES], pa.int64()
                ),
                "little": pa.array(
                    [q[4] for q in _SPAN_CONTAINING_QUERIES], pa.string()
                ),
            }
        )
    )
    res = span_containing_search(idx, qds, k=20, concurrency=2).to_pandas()
    res["score"] = np.round(res["score"], 6)
    cols = ["query_id", "rank", "doc_id", "n_occ", "score"]
    out = []
    for _qid, g in res.groupby("query_id"):
        g = g.sort_values(["score", "doc_id"], ascending=[False, True]).head(10)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        out.append(g)
    if not out:
        return pd.DataFrame(columns=cols)
    return pd.concat(out, ignore_index=True)[cols]


def _span_containing_sql(
    queries: list[tuple[int, str, str, int, str]], k: int = 10
) -> str:
    """Independent containment oracle: ordered-role (A-pos, B-pos) pairs
    with |ia - ib| <= gap and an EXISTS little position inside the
    closed span; pseudo-term scoring tail identical to the other span
    oracles."""
    vals = ", ".join(
        f"({qid}, '{a}', '{b}', {g}, '{c}')" for qid, a, b, g, c in queries
    )
    return (
        "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS ts FROM documents), "
        "tokpos AS (SELECT doc_id, unnest(ts) AS term, "
        "unnest(range(1, len(ts) + 1)) AS i FROM d), "
        f"q(query_id, ta, tb, gap, little) AS (VALUES {vals}), "
        "pairs AS (SELECT q.query_id, a.doc_id, a.i AS ia, b.i AS ib "
        "FROM q JOIN tokpos a ON a.term = q.ta "
        "JOIN tokpos b ON b.term = q.tb AND b.doc_id = a.doc_id "
        "AND abs(a.i - b.i) <= q.gap), "
        "hitp AS (SELECT p.query_id, p.doc_id, p.ia, p.ib FROM pairs p "
        "JOIN q ON q.query_id = p.query_id "
        "WHERE EXISTS (SELECT 1 FROM tokpos c WHERE c.doc_id = p.doc_id "
        "AND c.term = q.little "
        "AND c.i BETWEEN least(p.ia, p.ib) AND greatest(p.ia, p.ib))), "
        "hits AS (SELECT query_id, doc_id, count(*) AS n_occ FROM hitp "
        "GROUP BY query_id, doc_id), "
        "dl AS (SELECT doc_id, len(ts) AS dl FROM d), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
        "pdf AS (SELECT query_id, count(*) AS df FROM hits GROUP BY query_id), "
        "scored AS (SELECT h.query_id, h.doc_id, h.n_occ, "
        "ln(1 + (s.n_docs - pdf.df + 0.5) / (pdf.df + 0.5)) * "
        "(h.n_occ * 2.2) / (h.n_occ + 1.2 * (1 - 0.75 + 0.75 * dl.dl / "
        "(s.total::DOUBLE / s.n_docs))) AS score "
        "FROM hits h JOIN pdf USING (query_id) "
        "JOIN dl ON dl.doc_id = h.doc_id CROSS JOIN stats s) "
        "SELECT query_id, rank, doc_id, n_occ, score FROM ("
        "SELECT query_id, doc_id, n_occ, round(score, 6) AS score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored) "
        f"WHERE rank <= {k}"
    )


SQL_SPAN_CONTAINING_TOPK = _span_containing_sql(_SPAN_CONTAINING_QUERIES)


# ---------------------------- span_within (Lucene SpanWithinQuery)

# same query shapes as the containing family: enclosed hit, boundary
# gap, absent little, absent big member, little == big member
_SPAN_WITHIN_QUERIES: list[tuple[int, str, str, int, str]] = [
    (0, "hash", "join", 3, "the"),
    (1, "table", "scan", 5, "data"),
    (2, "the", "data", 2, "zz"),
    (3, "zz", "table", 2, "the"),
    (4, "the", "data", 4, "the"),
]


def q_span_within_topk(sf_dir: str):
    """Lucene SpanWithinQuery (stages/phrase.span_within_search) — the
    dual of span_containing: hits are LITTLE occurrences enclosed by at
    least one big span (the unordered (term_a, term_b) pair within
    ``gap``), per-doc tf = count of distinct enclosed little positions,
    pseudo-term BM25 rank.  Vectorized via span_lo-sorted running max of
    span_hi: one searchsorted probe per little occurrence."""
    from ...stages.phrase import span_within_search

    idx = _build_docs_index_pos(sf_dir)
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(
                    [q[0] for q in _SPAN_WITHIN_QUERIES], pa.int64()
                ),
                "term_a": pa.array(
                    [q[1] for q in _SPAN_WITHIN_QUERIES], pa.string()
                ),
                "term_b": pa.array(
                    [q[2] for q in _SPAN_WITHIN_QUERIES], pa.string()
                ),
                "gap": pa.array(
                    [q[3] for q in _SPAN_WITHIN_QUERIES], pa.int64()
                ),
                "little": pa.array(
                    [q[4] for q in _SPAN_WITHIN_QUERIES], pa.string()
                ),
            }
        )
    )
    res = span_within_search(idx, qds, k=20, concurrency=2).to_pandas()
    res["score"] = np.round(res["score"], 6)
    cols = ["query_id", "rank", "doc_id", "n_occ", "score"]
    out = []
    for _qid, g in res.groupby("query_id"):
        g = g.sort_values(["score", "doc_id"], ascending=[False, True]).head(10)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        out.append(g)
    if not out:
        return pd.DataFrame(columns=cols)
    return pd.concat(out, ignore_index=True)[cols]


def _span_within_sql(
    queries: list[tuple[int, str, str, int, str]], k: int = 10
) -> str:
    """Independent enclosure oracle: a little position c.i is a hit iff
    EXISTS an (A-pos, B-pos) pair in the same doc with |ia - ib| <= gap
    and least(ia, ib) <= c.i <= greatest(ia, ib); tf = DISTINCT hit
    positions per doc; pseudo-term scoring tail identical to the other
    span oracles."""
    vals = ", ".join(
        f"({qid}, '{a}', '{b}', {g}, '{c}')" for qid, a, b, g, c in queries
    )
    return (
        "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS ts FROM documents), "
        "tokpos AS (SELECT doc_id, unnest(ts) AS term, "
        "unnest(range(1, len(ts) + 1)) AS i FROM d), "
        f"q(query_id, ta, tb, gap, little) AS (VALUES {vals}), "
        "hitl AS (SELECT DISTINCT q.query_id, c.doc_id, c.i "
        "FROM q JOIN tokpos c ON c.term = q.little "
        "WHERE EXISTS (SELECT 1 FROM tokpos a JOIN tokpos b "
        "ON b.doc_id = a.doc_id AND b.term = q.tb "
        "AND abs(a.i - b.i) <= q.gap "
        "WHERE a.doc_id = c.doc_id AND a.term = q.ta "
        "AND c.i BETWEEN least(a.i, b.i) AND greatest(a.i, b.i))), "
        "hits AS (SELECT query_id, doc_id, count(*) AS n_occ FROM hitl "
        "GROUP BY query_id, doc_id), "
        "dl AS (SELECT doc_id, len(ts) AS dl FROM d), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
        "pdf AS (SELECT query_id, count(*) AS df FROM hits GROUP BY query_id), "
        "scored AS (SELECT h.query_id, h.doc_id, h.n_occ, "
        "ln(1 + (s.n_docs - pdf.df + 0.5) / (pdf.df + 0.5)) * "
        "(h.n_occ * 2.2) / (h.n_occ + 1.2 * (1 - 0.75 + 0.75 * dl.dl / "
        "(s.total::DOUBLE / s.n_docs))) AS score "
        "FROM hits h JOIN pdf USING (query_id) "
        "JOIN dl ON dl.doc_id = h.doc_id CROSS JOIN stats s) "
        "SELECT query_id, rank, doc_id, n_occ, score FROM ("
        "SELECT query_id, doc_id, n_occ, round(score, 6) AS score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored) "
        f"WHERE rank <= {k}"
    )


SQL_SPAN_WITHIN_TOPK = _span_within_sql(_SPAN_WITHIN_QUERIES)


# ----------------------- unigram-LM subword tokenizer (SentencePiece)

_UNI_TOP = 50


def _unigram_scores(sf_dir: str) -> dict[str, float]:
    """Distributed unigram seed scoring (functions/unigram.py): the
    (word, freq) vocabulary dataset maps to overlapping-substring count
    partials -> ONE groupby(piece) exchange -> min-count filter -> the
    bounded kept-piece table collects and scores on the driver."""
    from ...functions.unigram import MIN_COUNT, piece_scores

    vocab = (
        _term_partials(sf_dir)
        .groupby("term")
        .aggregate(Sum("cf_p", alias_name="cf"))
    )

    def part(batch: pa.Table) -> pa.Table:
        from ...functions.unigram import substring_counts

        c = substring_counts(
            batch["term"].to_pylist(), batch["cf"].to_pylist()
        )
        return pa.table(
            {
                "piece": pa.array(list(c.keys()), pa.string()),
                "c_p": pa.array(list(c.values()), pa.int64()),
            }
        )

    def keep(batch: pa.Table) -> pa.Table:
        m = pc.or_(
            pc.greater_equal(batch["c"], MIN_COUNT),
            pc.equal(pc.utf8_length(batch["piece"]), 1),
        )
        return batch.filter(m)

    kept = (
        vocab.map_batches(part, batch_format="pyarrow")
        .groupby("piece")
        .aggregate(Sum("c_p", alias_name="c"))
        .map_batches(keep, batch_format="pyarrow")
        .to_pandas()
    )
    return piece_scores(dict(zip(kept["piece"], kept["c"].astype(int))))


def q_lexical_diversity(sf_dir: str):
    """Per-language lexical-diversity profile (the corpus-linguistics
    health panel: type-token ratio + hapax legomena share — Baayen's
    LNRE diagnostics; a skewed hapax share is the classic crawl-noise
    tell): per lang, token total, type count, TTR, hapax count (terms
    with per-lang cf = 1) and hapax/type share.  One corpus pass: the
    (lang, term) tf combiner -> groupby((lang, term)) -> per-lang
    aggregates DERIVE from the reduced vocabulary table (types, not
    tokens, cross the second exchange)."""

    def part(batch: pa.Table) -> pa.Table:
        tf, _ = term_count_table(batch["text"], batch["doc_id"])
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)
        lang_of = dict(zip(dids.tolist(), batch["lang"].to_pylist()))
        tdf = tf.to_pandas()
        tdf["lang"] = tdf["doc_id"].map(lang_of)
        agg = tdf.groupby(["lang", "term"], as_index=False)["tf"].sum()
        return pa.table({
            "lang": pa.array(agg["lang"], pa.string()),
            "term": pa.array(agg["term"], pa.string()),
            "cf_p": pa.array(agg["tf"].to_numpy(np.int64), pa.int64()),
        })

    vocab = (
        _docs(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(part, batch_format="pyarrow")
        .groupby(["lang", "term"])
        .aggregate(Sum("cf_p", alias_name="cf"))
    )

    def per_lang(b: pa.Table) -> pa.Table:
        cf = b["cf"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "lang": b["lang"],
            "tok_p": pa.array(cf, pa.int64()),
            "typ_p": pa.array(np.ones(cf.size, np.int64), pa.int64()),
            "hap_p": pa.array((cf == 1).astype(np.int64), pa.int64()),
        })

    agg = (
        vocab.map_batches(per_lang, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("tok_p", alias_name="n_tokens"),
            Sum("typ_p", alias_name="n_types"),
            Sum("hap_p", alias_name="n_hapax"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    agg["ttr"] = np.round(
        agg["n_types"].to_numpy(np.float64)
        / agg["n_tokens"].to_numpy(np.float64), 6
    )
    agg["hapax_share"] = np.round(
        agg["n_hapax"].to_numpy(np.float64)
        / agg["n_types"].to_numpy(np.float64), 6
    )
    return agg[
        ["lang", "n_tokens", "n_types", "n_hapax", "ttr", "hapax_share"]
    ].astype({
        "n_tokens": "int64", "n_types": "int64", "n_hapax": "int64",
    })


SQL_LEXICAL_DIVERSITY = (
    "WITH toks AS (SELECT d.doc_id, d.lang, "
    "unnest(list_filter(string_split(d.text, ' '), x -> x <> '')) "
    "AS term FROM documents d), "
    "v AS (SELECT lang, term, count(*) AS cf FROM toks GROUP BY 1, 2) "
    "SELECT lang, CAST(sum(cf) AS BIGINT) AS n_tokens, "
    "CAST(count(*) AS BIGINT) AS n_types, "
    "CAST(sum(CASE WHEN cf = 1 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_hapax, "
    "round(count(*)::DOUBLE / sum(cf), 6) AS ttr, "
    "round(sum(CASE WHEN cf = 1 THEN 1 ELSE 0 END)::DOUBLE "
    "/ count(*), 6) AS hapax_share "
    "FROM v GROUP BY lang ORDER BY lang"
)


_WP_TOPGRAMS = 200   # char-2/3-gram vocab budget (freq DESC, piece cut)
_WP_TOP = 50


def q_wordpiece_pieces(sf_dir: str):
    """WordPiece tokenization (Devlin et al. 2019's BERT tokenizer
    inference: GREEDY LONGEST-MATCH-FIRST segmentation) — the third
    classic subword tokenizer beside the BPE and Unigram entries, and
    the only one of the three with a full SQL oracle: the piece vocab
    is SQL-derivable (all single characters, plus the top-200 char
    2/3-grams by cf-weighted occurrence count over the word table, cut
    at (freq DESC, piece)), and greedy matching tries the 3-char then
    2-char then 1-char prefix at each position (single chars guarantee
    progress).  Reports the top-50 pieces by cf-weighted usage.

    Scale shape: gram counting, vocab ranking and encoding ALL map
    over the DISTRIBUTED distinct-word table (never the corpus; same
    argument as unigram_pieces); the vocab set ships once via
    ray.put.  The oracle mirrors the greedy loop as a recursive CTE
    whose step advances by the matched piece's length."""
    words = (
        _term_partials(sf_dir)
        .groupby("term")
        .aggregate(Sum("cf_p", alias_name="cf"))
        .materialize()
    )

    def gram_part(batch: pa.Table) -> pa.Table:
        acc: dict[str, int] = {}
        for term, cf in zip(
            batch["term"].to_pylist(), batch["cf"].to_pylist()
        ):
            for n_ in (2, 3):
                for i in range(len(term) - n_ + 1):
                    g = term[i:i + n_]
                    acc[g] = acc.get(g, 0) + cf
        return pa.table({
            "piece": pa.array(list(acc), pa.string()),
            "f_p": pa.array(list(acc.values()), pa.int64()),
        })

    top = (
        words.map_batches(gram_part, batch_format="pyarrow")
        .groupby("piece")
        .aggregate(Sum("f_p", alias_name="f"))
        .sort(["f", "piece"], descending=[True, False])
        .limit(_WP_TOPGRAMS)
        .to_pandas()
    )

    def char_part(batch: pa.Table) -> pa.Table:
        cs = sorted({
            c for term in batch["term"].to_pylist() for c in term
        })
        return pa.table({"piece": pa.array(cs, pa.string())})

    chars = (
        words.map_batches(char_part, batch_format="pyarrow")
        .groupby("piece")
        .aggregate(Count(alias_name="__c"))
        .to_pandas()
    )
    vocab = set(top["piece"]) | set(chars["piece"])
    vref = ray.put(vocab)

    def enc(batch: pa.Table) -> pa.Table:
        vb = ray.get(vref)
        usage: dict[str, int] = {}
        for term, cf in zip(
            batch["term"].to_pylist(), batch["cf"].to_pylist()
        ):
            pos = 0
            while pos < len(term):
                for ln in (3, 2, 1):
                    cand = term[pos:pos + ln]
                    if cand and cand in vb:
                        usage[cand] = usage.get(cand, 0) + cf
                        pos += len(cand)
                        break
        return pa.table({
            "piece": pa.array(list(usage), pa.string()),
            "u_p": pa.array(list(usage.values()), pa.int64()),
        })

    out = (
        words.map_batches(enc, batch_format="pyarrow")
        .groupby("piece")
        .aggregate(Sum("u_p", alias_name="n_uses"))
        .to_pandas()
        .sort_values(["n_uses", "piece"], ascending=[False, True])
        .head(_WP_TOP)
        .reset_index(drop=True)
    )
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["rank", "piece", "n_uses"]].astype({"n_uses": "int64"})


def _sql_wordpiece_pieces() -> str:
    pick = (
        "CASE WHEN substr(term, CAST(pos AS INT), 3) IN "
        "(SELECT piece FROM vocab) THEN substr(term, CAST(pos AS INT), 3) "
        "WHEN substr(term, CAST(pos AS INT), 2) IN "
        "(SELECT piece FROM vocab) THEN substr(term, CAST(pos AS INT), 2) "
        "ELSE substr(term, CAST(pos AS INT), 1) END"
    )
    return (
        "WITH RECURSIVE "
        f"toks AS ({_TOKS_SQL}), "
        "words AS (SELECT term, count(*) AS cf FROM toks GROUP BY term), "
        "g2 AS (SELECT substr(term, CAST(i AS INT), 2) AS piece, "
        "sum(cf) AS f FROM (SELECT term, cf, "
        "unnest(range(1, length(term))) AS i FROM words) GROUP BY 1), "
        "g3 AS (SELECT substr(term, CAST(i AS INT), 3) AS piece, "
        "sum(cf) AS f FROM (SELECT term, cf, "
        "unnest(range(1, length(term) - 1)) AS i FROM words) "
        "GROUP BY 1), "
        "top AS (SELECT piece FROM ("
        "SELECT * FROM g2 UNION ALL SELECT * FROM g3) "
        f"ORDER BY f DESC, piece LIMIT {_WP_TOPGRAMS}), "
        "chars AS (SELECT DISTINCT substr(term, CAST(i AS INT), 1) "
        "AS piece FROM (SELECT term, "
        "unnest(range(1, length(term) + 1)) AS i FROM words)), "
        "vocab AS (SELECT piece FROM top UNION SELECT piece FROM chars), "
        "s(term, cf, pos) AS ("
        "SELECT term, cf, CAST(1 AS BIGINT) FROM words "
        "UNION ALL "
        f"SELECT term, cf, pos + length({pick}) FROM s "
        "WHERE pos <= length(term)), "
        f"uses AS (SELECT {pick} AS piece, cf FROM s "
        "WHERE pos <= length(term)), "
        "agg AS (SELECT piece, CAST(sum(cf) AS BIGINT) AS n_uses "
        "FROM uses GROUP BY 1) "
        "SELECT CAST(row_number() OVER (ORDER BY n_uses DESC, piece) "
        "AS BIGINT) AS rank, piece, n_uses FROM agg "
        f"ORDER BY n_uses DESC, piece LIMIT {_WP_TOP}"
    )


SQL_WORDPIECE_PIECES = _sql_wordpiece_pieces()


def q_unigram_pieces(sf_dir: str):
    """Unigram-LM tokenizer Viterbi pass (Kudo 2018; the SentencePiece
    ``unigram`` E-step): seed substring pieces scored log(count/total),
    each distinct word segmented by max-likelihood DP, reporting the
    top-50 pieces by corpus usage (freq-weighted).  Both piece-level
    stages map over the DISTRIBUTED vocabulary, never the corpus; the
    score table ships once via ray.put.  Oracle: pinned independent
    serial reference (tie rules in functions/unigram.py docstring)."""
    from ...functions.unigram import UsageCounter

    scores_ref = ray.put(_unigram_scores(sf_dir))
    vocab = (
        _term_partials(sf_dir)
        .groupby("term")
        .aggregate(Sum("cf_p", alias_name="cf"))
    )
    top = (
        vocab.map_batches(UsageCounter, batch_format="pyarrow",
                          fn_constructor_kwargs={"scores_ref": scores_ref},
                          concurrency=2, num_cpus=1)
        .groupby("piece")
        .aggregate(Sum("u_p", alias_name="n_uses"))
        .to_pandas()
        .sort_values(["n_uses", "piece"], ascending=[False, True])
        .head(_UNI_TOP)
        .reset_index(drop=True)
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["rank", "piece", "n_uses"]]


def q_unigram_token_counts(sf_dir: str):
    """Unigram ENCODING as an actor-pool stage (the BPE-encoding twin):
    per-doc whitespace-token and unigram-piece counts, scores broadcast
    once, per-word piece-length cache persisting across batches."""
    from ...functions.unigram import UnigramCounter

    scores_ref = ray.put(_unigram_scores(sf_dir))
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        UnigramCounter,
        fn_constructor_kwargs={"scores_ref": scores_ref},
        batch_format="pyarrow",
        concurrency=2,
        num_cpus=1,
    )


# ---------------- ES aggregation batch 2: multi_terms / weighted_avg /
# ---------------- bucket_selector+bucket_sort / range agg

_BSEL_MIN = 340   # bucket_selector threshold (sf0.01 daily counts ~320-364)
_BSEL_K = 5       # bucket_sort truncation
_RANGE_EDGES = (150, 300, 450)
_RANGE_LABELS = ("*-150", "150-300", "300-450", "450-*")


def q_multi_terms_agg(sf_dir: str):
    """Elasticsearch ``multi_terms`` aggregation: top-10 composite
    (lang, source) buckets by doc count, ties by the key pair.  Shape:
    per-batch Arrow group_by combiner (one row per distinct pair per
    batch — the exchange moves bucket partials, never docs) -> ONE
    groupby((lang, source)) Sum -> distributed sort + limit; the bucket
    table never materializes on the driver, so a 10^9-domain composite
    key (url-host × lang at web scale) stays out of driver memory."""

    def part(batch: pa.Table) -> pa.Table:
        agg = batch.select(["lang", "source"]).group_by(
            ["lang", "source"]
        ).aggregate([([], "count_all")])
        return agg.rename_columns(["lang", "source", "n_p"])

    return (
        _docs(sf_dir, ["lang", "source"])
        .map_batches(part, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n_p", alias_name="n"))
        .sort(["n", "lang", "source"], descending=[True, False, False])
        .limit(10)
    )


SQL_MULTI_TERMS_AGG = (
    "SELECT lang, source, count(*) AS n FROM documents "
    "GROUP BY 1, 2 ORDER BY n DESC, lang, source LIMIT 10"
)


_FIS_ITEMS = ["data", "hash", "merge", "query", "sort", "stream"]
_FIS_MIN_SUPPORT = 0.05   # fraction of docs; count threshold = ceil(s*N)


def q_frequent_item_sets(sf_dir: str):
    """Elasticsearch ``frequent_item_sets`` aggregation (the Apriori
    family): itemsets of size 2-3 over a pinned 6-term item vocabulary
    (presence under the pinned tokenizer), kept when their doc count
    clears ``ceil(min_support * N)`` and CLOSED within the candidate
    universe (ES returns only closed sets — a set is dropped when a
    strict superset has the SAME support).  Output: (items =
    comma-joined sorted terms, set_size, doc_count, support), ordered
    by (doc_count DESC, items).

    Shape: the candidate universe is fixed (C(6,2)+C(6,3) = 35 sets),
    so each batch reduces to <= 35 partial-count rows via a vectorized
    presence matrix; one groupby(items) Sum; threshold + closedness run
    on the <= 35-row driver table.  At web scale the item vocabulary is
    what you pin (the ES agg does the same via ``fields``), so the
    exchange stays bounded by |candidates|, never by docs."""
    from itertools import combinations

    items = _FIS_ITEMS
    cands = [
        c for r in (2, 3) for c in combinations(range(len(items)), r)
    ]
    item_set = set(items)

    def part(batch: pa.Table) -> pa.Table:
        tf, _ = term_count_table(batch["text"], batch["doc_id"])
        tdf = tf.to_pandas()
        sub = tdf[tdf["term"].isin(item_set)]
        docs = np.unique(sub["doc_id"].to_numpy(np.int64))
        pres = np.zeros((docs.size, len(items)), dtype=bool)
        for i, t in enumerate(items):
            d = np.unique(
                sub.loc[sub["term"] == t, "doc_id"].to_numpy(np.int64)
            )
            pres[np.searchsorted(docs, d), i] = True
        keys, ns = [], []
        for c in cands:
            m = pres[:, c[0]]
            for ix in c[1:]:
                m = m & pres[:, ix]
            cnt = int(np.count_nonzero(m))
            if cnt:
                keys.append(",".join(items[i] for i in c))
                ns.append(cnt)
        return pa.table({
            "items": pa.array(keys, pa.string()),
            "n_p": pa.array(ns, pa.int64()),
        })

    counts = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("items")
        .aggregate(Sum("n_p", alias_name="doc_count"))
        .to_pandas()
    )
    n_docs = int(_docs(sf_dir, ["doc_id"]).count())
    thresh = math.ceil(_FIS_MIN_SUPPORT * n_docs)
    counts = counts[counts["doc_count"] >= thresh]
    by_set = {
        frozenset(r["items"].split(",")): int(r["doc_count"])
        for _, r in counts.iterrows()
    }
    rows = []
    for s, c in by_set.items():
        closed = not any(
            s < s2 and c2 == c for s2, c2 in by_set.items()
        )
        if closed:
            rows.append((
                ",".join(sorted(s)), len(s), c, round(c / n_docs, 6)
            ))
    rows.sort(key=lambda r: (-r[2], r[0]))
    return pd.DataFrame(
        rows, columns=["items", "set_size", "doc_count", "support"]
    ).astype({
        "set_size": "int64", "doc_count": "int64", "support": "float64",
    })


def _sql_frequent_item_sets() -> str:
    inlist = ", ".join(f"'{t}'" for t in _FIS_ITEMS)
    s = _FIS_MIN_SUPPORT
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "p AS (SELECT DISTINCT doc_id, term FROM toks "
        f"WHERE term IN ({inlist})), "
        "nn AS (SELECT count(*) AS n FROM documents), "
        "p2 AS (SELECT a.term AS t1, b.term AS t2, count(*) AS c "
        "FROM p a JOIN p b ON b.doc_id = a.doc_id AND a.term < b.term "
        "GROUP BY 1, 2), "
        "p3 AS (SELECT a.term AS t1, b.term AS t2, c3.term AS t3, "
        "count(*) AS c FROM p a "
        "JOIN p b ON b.doc_id = a.doc_id AND a.term < b.term "
        "JOIN p c3 ON c3.doc_id = a.doc_id AND b.term < c3.term "
        "GROUP BY 1, 2, 3), "
        "k2 AS (SELECT t1 || ',' || t2 AS items, "
        "CAST(2 AS BIGINT) AS set_size, c AS doc_count, "
        "round(c::DOUBLE / nn.n, 6) AS support FROM p2 CROSS JOIN nn "
        f"WHERE c >= ceil({s} * nn.n) AND NOT EXISTS ("
        "SELECT 1 FROM p3 WHERE p3.c = p2.c "
        "AND p2.t1 IN (p3.t1, p3.t2, p3.t3) "
        "AND p2.t2 IN (p3.t1, p3.t2, p3.t3))), "
        "k3 AS (SELECT t1 || ',' || t2 || ',' || t3 AS items, "
        "CAST(3 AS BIGINT) AS set_size, c AS doc_count, "
        "round(c::DOUBLE / nn.n, 6) AS support FROM p3 CROSS JOIN nn "
        f"WHERE c >= ceil({s} * nn.n)) "
        "SELECT items, set_size, doc_count, support FROM ("
        "SELECT * FROM k2 UNION ALL SELECT * FROM k3) "
        "ORDER BY doc_count DESC, items"
    )


SQL_FREQUENT_ITEM_SETS = _sql_frequent_item_sets()


def q_weighted_avg_value(sf_dir: str):
    """Elasticsearch ``weighted_avg`` aggregation: per event_type, the
    mean of ``value`` weighted by a per-event weight (the deterministic
    1 + user_id % 3 — in ES terms a weight script).  Shape: the
    combiner keeps (sum(v*w), sum(w)) per type per batch, the exchange
    is one row per (type, batch), and the final ratio is a map over the
    |types|-row aggregate — the numerically standard two-accumulator
    form that merges associatively at any cluster size."""

    def part(batch: pa.Table) -> pa.Table:
        w = 1.0 + (
            batch["user_id"].to_numpy(zero_copy_only=False) % 3
        ).astype(np.float64)
        v = batch["value"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "event_type": batch["event_type"],
            "vw_p": pa.array(v * w, pa.float64()),
            "w_p": pa.array(w, pa.float64()),
        })
        return t.group_by("event_type").aggregate(
            [("vw_p", "sum"), ("w_p", "sum")]
        ).rename_columns(["event_type", "vw_p", "w_p"])

    agg = (
        read_table(sf_dir, "events", ["event_type", "user_id", "value"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("vw_p", alias_name="vw"), Sum("w_p", alias_name="w"))
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "wavg": pa.array(
                np.round(
                    b["vw"].to_numpy(zero_copy_only=False)
                    / b["w"].to_numpy(zero_copy_only=False),
                    6,
                ),
                pa.float64(),
            ),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


SQL_WEIGHTED_AVG_VALUE = (
    "SELECT event_type, round(sum(value * (1 + user_id % 3)) "
    "/ sum(1 + user_id % 3), 6) AS wavg FROM events GROUP BY 1"
)


def q_bucket_selector_days(sf_dir: str):
    """Elasticsearch ``bucket_selector`` + ``bucket_sort`` pipeline
    aggregations over the daily date_histogram: keep only days whose
    event count clears a threshold, order the survivors by count and
    truncate.  Shape: the day-count combiner bounds the exchange to one
    row per (day, batch); selector and sort run DISTRIBUTED (Ray filter
    expression + range-partitioned sort + limit) — no driver pass at
    all, so a years-long histogram behaves the same as 30 days."""

    def part(batch: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(batch["ts"], unit="day"), pa.timestamp("us")
        )
        agg = pa.table({"window_start": day}).group_by(
            "window_start"
        ).aggregate([([], "count_all")])
        return agg.rename_columns(["window_start", "n_p"])

    return (
        read_table(sf_dir, "events", ["ts"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Sum("n_p", alias_name="n"))
        .filter(expr=f"n >= {_BSEL_MIN}")
        .sort(["n", "window_start"], descending=[True, False])
        .limit(_BSEL_K)
    )


SQL_BUCKET_SELECTOR_DAYS = (
    "SELECT * FROM (SELECT date_trunc('day', ts) AS window_start, "
    "count(*) AS n FROM events GROUP BY 1) "
    f"WHERE n >= {_BSEL_MIN} ORDER BY n DESC, window_start LIMIT {_BSEL_K}"
)


def q_range_agg_chars(sf_dir: str):
    """Elasticsearch ``range`` aggregation over the n_chars doc value:
    fixed half-open buckets with per-bucket count and mean length.
    Shape: np.digitize codes every row, np.bincount produces the
    (count, sum) partials — each batch reduces to <= 4 rows regardless
    of batch size, the canonical fixed-fanout combiner, then ONE
    groupby(bucket) Sum and a 4-row ratio map."""

    def part(batch: pa.Table) -> pa.Table:
        x = batch["n_chars"].to_numpy(zero_copy_only=False)
        idx = np.digitize(x, _RANGE_EDGES)
        cnt = np.bincount(idx, minlength=len(_RANGE_LABELS))
        s = np.bincount(idx, weights=x, minlength=len(_RANGE_LABELS))
        nz = cnt > 0
        return pa.table({
            "bucket": pa.array(
                np.asarray(_RANGE_LABELS, dtype=object)[nz], pa.string()
            ),
            "n_p": pa.array(cnt[nz].astype(np.int64), pa.int64()),
            "sum_p": pa.array(s[nz], pa.float64()),
        })

    agg = (
        _docs(sf_dir, ["n_chars"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_p", alias_name="n"), Sum("sum_p", alias_name="s"))
    )

    def fin(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": b["bucket"],
            "n": b["n"],
            "avg_chars": pa.array(
                np.round(b["s"].to_numpy(zero_copy_only=False) / n, 6),
                pa.float64(),
            ),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


SQL_RANGE_AGG_CHARS = (
    "WITH b AS (SELECT CASE "
    f"WHEN n_chars < {_RANGE_EDGES[0]} THEN '{_RANGE_LABELS[0]}' "
    f"WHEN n_chars < {_RANGE_EDGES[1]} THEN '{_RANGE_LABELS[1]}' "
    f"WHEN n_chars < {_RANGE_EDGES[2]} THEN '{_RANGE_LABELS[2]}' "
    f"ELSE '{_RANGE_LABELS[3]}' END AS bucket, n_chars FROM documents) "
    "SELECT bucket, count(*) AS n, "
    "round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars "
    "FROM b GROUP BY 1"
)


def q_string_stats_text(sf_dir: str):
    """Elasticsearch ``string_stats`` (show_distribution shape) over the
    full text column: doc count, min/max/avg character length and the
    Shannon character entropy (bits) of the corpus character
    distribution.  Shape: each batch reduces to an alphabet-sized
    codepoint histogram (text -> utf-32 codepoint array ->
    np.unique counts — unicode-correct and fully vectorized) plus ONE
    length-partial row keyed cp=-1; a single groupby(cp) merges both
    kinds (the cp=-1 group only ever holds length partials), and the
    finish is a driver pass over the |alphabet|+1-row table.  The
    exchange is bounded by the alphabet, never the corpus."""
    from ray.data.aggregate import Max, Min

    def part(batch: pa.Table) -> pa.Table:
        lens = pc.utf8_length(batch["text"]).to_numpy(zero_copy_only=False)
        joined = "".join(batch["text"].to_pylist())
        cps = np.frombuffer(joined.encode("utf-32-le"), np.uint32)
        u, c = np.unique(cps, return_counts=True)
        cp = np.concatenate([u.astype(np.int64), [-1]])
        zero = np.zeros(len(u), dtype=np.int64)
        return pa.table({
            "cp": pa.array(cp, pa.int64()),
            "n_p": pa.array(np.concatenate([c.astype(np.int64), [0]])),
            "min_p": pa.array(np.concatenate([zero, [lens.min()]])),
            "max_p": pa.array(np.concatenate([zero, [lens.max()]])),
            "cnt_p": pa.array(np.concatenate([zero, [len(lens)]])),
            "sum_p": pa.array(np.concatenate([zero, [lens.sum()]])),
        })

    tbl = (
        _docs(sf_dir, ["text"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("cp")
        .aggregate(
            Sum("n_p", alias_name="n"),
            Min("min_p", alias_name="mn"),
            Max("max_p", alias_name="mx"),
            Sum("cnt_p", alias_name="cnt"),
            Sum("sum_p", alias_name="s"),
        )
        .to_pandas()
    )
    chars = tbl[tbl["cp"] >= 0].sort_values("cp")
    n = chars["n"].to_numpy(np.float64)
    p = n / n.sum()
    ent = float(-(p * np.log2(p)).sum())
    lrow = tbl[tbl["cp"] == -1].iloc[0]
    return pd.DataFrame({
        "n_docs": [int(lrow["cnt"])],
        "min_len": [int(lrow["mn"])],
        "max_len": [int(lrow["mx"])],
        "avg_len": [round(float(lrow["s"]) / float(lrow["cnt"]), 6)],
        "entropy": [round(ent, 6)],
    })


SQL_STRING_STATS_TEXT = (
    "WITH c AS (SELECT ch, CAST(count(*) AS DOUBLE) AS n FROM "
    "(SELECT unnest(regexp_split_to_array(text, '')) AS ch "
    "FROM documents) GROUP BY 1 ORDER BY ch), "
    "t AS (SELECT sum(n) AS s FROM c), "
    "e AS (SELECT round(-sum((n / s) * log2(n / s)), 6) AS entropy "
    "FROM c, t), "
    "l AS (SELECT count(*) AS n_docs, min(length(text)) AS min_len, "
    "max(length(text)) AS max_len, "
    "round(CAST(sum(length(text)) AS DOUBLE) / count(*), 6) AS avg_len "
    "FROM documents) "
    "SELECT n_docs, min_len, max_len, avg_len, entropy FROM l, e"
)


def _weighted_quantile_cont(vals: np.ndarray, counts: np.ndarray,
                            q: float = 0.5) -> float:
    """quantile_cont over a (value, count) table — the exact
    interpolated median DuckDB's median()/mad() compute, without ever
    expanding the rows.  vals must be sorted ascending."""
    cum = np.cumsum(counts)
    n = int(cum[-1])
    h = (n - 1) * q
    lo = vals[np.searchsorted(cum, np.floor(h) + 1)]
    hi = vals[np.searchsorted(cum, np.ceil(h) + 1)]
    return float(lo + (hi - lo) * (h - np.floor(h)))


def q_mad_chars(sf_dir: str):
    """Elasticsearch ``median_absolute_deviation`` aggregation over the
    n_chars doc value — computed EXACTLY (ES ships a TDigest
    approximation; the exact form is the stronger contract and the SQL
    oracle is DuckDB's native mad()).  Shape: the corpus reduces to a
    (value -> count) table via a per-batch np.unique combiner + ONE
    groupby(value) Sum — the only exchange, bounded by the value domain
    (doc lengths, not docs); both medians (the raw one and the one over
    |x - med| deviations) then run over that SAME tiny table with
    quantile_cont interpolation, so the second median needs NO second
    corpus pass: |v - med| is a per-distinct-value map and counts are
    reused."""

    def part(batch: pa.Table) -> pa.Table:
        u, c = np.unique(
            batch["n_chars"].to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table({
            "v": pa.array(u.astype(np.int64), pa.int64()),
            "n_p": pa.array(c.astype(np.int64), pa.int64()),
        })

    vc = (
        _docs(sf_dir, ["n_chars"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("n_p", alias_name="n"))
        .to_pandas()
        .sort_values("v")
    )
    vals = vc["v"].to_numpy(np.float64)
    counts = vc["n"].to_numpy(np.int64)
    med = _weighted_quantile_cont(vals, counts)
    dev = np.abs(vals - med)
    order = np.argsort(dev, kind="stable")
    mad = _weighted_quantile_cont(dev[order], counts[order])
    return pd.DataFrame({
        "median_chars": [round(med, 6)],
        "mad_chars": [round(mad, 6)],
    })


SQL_MAD_CHARS = (
    "SELECT round(median(n_chars), 6) AS median_chars, "
    "round(mad(n_chars), 6) AS mad_chars FROM documents"
)


# ----------------------------------------------------------- terms_set

_TERMS_SET_QUERIES: list[tuple[int, list[str]]] = [
    (0, ["hash", "join", "table"]),
    (1, ["data", "query", "scan", "agg"]),
    (2, ["customer", "line"]),
    (3, ["zzz", "table", "join"]),   # absent member never matches
    (4, ["data"]),                   # single term: only required==1 docs
]
_TERMS_SET_MOD = 3


def q_terms_set_topk(sf_dir: str):
    """Elasticsearch ``terms_set`` query (stages/phrase.score_terms_set):
    an OR over the query terms where the minimum number of matching
    terms is a PER-DOCUMENT doc value (the pinned derived field
    ``1 + doc_id % 3`` — the minimum_should_match_field contract),
    survivors ranked by the exact boolean-OR BM25 sum."""
    from ...stages.phrase import terms_set_search

    idx = _build_docs_index(sf_dir)
    qds = ray.data.from_arrow(
        pa.table({
            "query_id": pa.array(
                [q[0] for q in _TERMS_SET_QUERIES], pa.int64()
            ),
            "terms": pa.array(
                [q[1] for q in _TERMS_SET_QUERIES], pa.list_(pa.string())
            ),
        })
    )
    res = terms_set_search(
        idx, qds, k=20, concurrency=2, req_mod=_TERMS_SET_MOD
    ).to_pandas()
    return _rerank_rounded(res, k=10)


def _terms_set_sql(
    queries: list[tuple[int, list[str]]], mod: int, k: int = 10
) -> str:
    """terms_set oracle: candidate condition is the membership count
    against the per-doc requirement, scoring is the shared
    candidate-filtered exact-BM25 skeleton."""
    cand_parts, qvals = [], []
    for qid, terms in queries:
        uniq = sorted(set(terms))
        cnt = " + ".join(
            f"list_contains(ts, '{t}')::INT" for t in uniq
        )
        cand_parts.append(
            f"SELECT {qid} AS query_id, doc_id FROM d "
            f"WHERE ({cnt}) >= 1 + doc_id % {mod}"
        )
        for t in uniq:
            qvals.append(f"({qid}, '{t}')")
    return _filtered_bm25_sql(cand_parts, qvals, k)


SQL_TERMS_SET_TOPK = _terms_set_sql(_TERMS_SET_QUERIES, _TERMS_SET_MOD)


# ----------------------------------------------------- global line dedup

_LINE_W = 8          # tokens per "line" (the dedup unit)
_LINE_SHIFT = 20     # packed key: doc_id << 20 | line_id (docs here are
                     # <= 2^20 lines; a 100-TB deployment widens to a
                     # two-int64 struct key, same Min aggregate)


def _lines_part(batch: pa.Table) -> pa.Table:
    """Vectorized 8-token line assembly: (doc_id, line, mk) rows where
    ``mk`` packs the (doc_id, line_id) occurrence key.  Token scatter
    into a (n_lines, W) object matrix — no per-line Python join."""
    terms, row_idx, doc_len = flatten_tokens(batch["text"])
    n = len(terms)
    if n == 0:
        return pa.table({
            "doc_id": pa.array([], pa.int64()),
            "line": pa.array([], pa.string()),
            "mk": pa.array([], pa.int64()),
        })
    starts = np.zeros(doc_len.size + 1, dtype=np.int64)
    np.cumsum(doc_len, out=starts[1:])
    pos = np.arange(n, dtype=np.int64) - starts[row_idx]
    line_id = pos // _LINE_W
    pack = row_idx.astype(np.int64) * (1 << _LINE_SHIFT) + line_id
    uniq, inv = np.unique(pack, return_inverse=True)
    mat = np.full((uniq.size, _LINE_W), "", dtype=object)
    mat[inv, pos % _LINE_W] = np.asarray(terms.to_pylist(), dtype=object)
    s = mat[:, 0]
    for j in range(1, _LINE_W):
        more = mat[:, j] != ""
        s = np.where(more, s + " " + mat[:, j], s)
    rows = (uniq >> _LINE_SHIFT).astype(np.int64)
    lids = uniq & ((1 << _LINE_SHIFT) - 1)
    dids = batch["doc_id"].to_numpy(zero_copy_only=False)[rows]
    return pa.table({
        "doc_id": pa.array(dids, pa.int64()),
        "line": pa.array(s, pa.string()),
        "mk": pa.array(dids * (1 << _LINE_SHIFT) + lids, pa.int64()),
    })


def q_line_dedup(sf_dir: str):
    """C4-style GLOBAL exact line deduplication (Raffel et al. 2020
    discard duplicate spans keeping the first occurrence; lines here
    are the pinned 8-token windows since the synthetic corpus has no
    newlines).  A line survives iff its (doc_id, line_id) is the
    corpus-wide MINIMUM occurrence of that exact line text; the result
    is the per-doc retention ledger (n_lines / n_kept / n_removed) a
    curation pipeline keys its rewrite step on.  Shape: vectorized line
    assembly per batch (token scatter into a (n_lines, W) matrix — no
    per-line Python join) -> ONE groupby(line) Min over the packed
    occurrence key -> ONE hash join back against the occurrence stream
    -> per-doc counts.  Both exchanges move one row per LINE, never
    tokens; the winner rule is a Min aggregate, so no whole-corpus
    materialization anywhere."""
    lines_part = _lines_part

    from ray.data.aggregate import Min

    occ = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lines_part, batch_format="pyarrow"
    ).materialize()  # consumed twice: winner table + join back
    win = occ.groupby("line").aggregate(Min("mk", alias_name="mk_min"))

    def flag(b: pa.Table) -> pa.Table:
        kept = (
            b["mk"].to_numpy(zero_copy_only=False)
            == b["mk_min"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table({
            "doc_id": b["doc_id"],
            "kept_p": pa.array(kept, pa.int64()),
        })

    return (
        occ.join(win, join_type="inner", on=("line",), num_partitions=16)
        .map_batches(flag, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Count(alias_name="n_lines"),
            Sum("kept_p", alias_name="n_kept"),
        )
        .map_batches(
            lambda b: b.append_column(
                "n_removed",
                pc.subtract(b["n_lines"], b["n_kept"]),
            ),
            batch_format="pyarrow",
        )
    )


SQL_LINE_DEDUP = (
    "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
    "x -> x <> '') AS ts FROM documents), "
    "lines AS (SELECT doc_id, j AS line_id, "
    f"array_to_string(ts[j * {_LINE_W} + 1 : j * {_LINE_W} + {_LINE_W}], ' ') "
    "AS line FROM d, unnest(range(0, CAST(ceil(len(ts) / "
    f"{_LINE_W}.0) AS BIGINT))) t(j)), "
    "win AS (SELECT line, "
    f"min(doc_id * {1 << _LINE_SHIFT} + line_id) AS mk FROM lines "
    "GROUP BY line), "
    "f AS (SELECT l.doc_id, "
    f"(l.doc_id * {1 << _LINE_SHIFT} + l.line_id = w.mk)::INT AS kept "
    "FROM lines l JOIN win w USING (line)) "
    "SELECT doc_id, count(*) AS n_lines, CAST(sum(kept) AS BIGINT) AS n_kept, "
    "CAST(count(*) - sum(kept) AS BIGINT) AS n_removed FROM f GROUP BY doc_id"
)


from ._nsacc import export as _ns_export

_ns_export(globals())
del _ns_export
