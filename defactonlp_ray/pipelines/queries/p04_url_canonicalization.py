# Part 04/11 of the former single-module pipelines/queries.py
# (mechanical split, round 5 — VERDICT r04 next-round #6).  Parts share
# ONE late-bound namespace via _nsacc: globals are seeded from the
# accumulator before this body runs (preserving original top-level
# execution order) and the final merged namespace is injected back into
# every part by __init__, so call-time forward references behave exactly
# as in the single file.  Original lines 6455-8513.
from __future__ import annotations

from ._nsacc import NS as _ns_seed

globals().update(_ns_seed)
del _ns_seed



# ------------------------------------------------- URL canonicalization


def q_url_canonical(sf_dir: str):
    """URL canonicalization as the dedup key (functions/urlnorm —
    RFC 3986 syntax normalization + utm_* strip, rules pinned in the
    module docstring).  Four deterministic messy variants per doc
    (upper-case scheme/host, default :443 port, fragment, trailing
    slash, interleaved utm_ params) are canonicalized by the REAL
    vectorized kernel and grouped: per-batch pandas pre-agg ->
    groupby(url) Sum/Min — the shuffle moves one row per distinct
    canonical per batch.  The oracle rebuilds the same messy URLs and
    canonicalizes them INDEPENDENTLY with DuckDB string functions, so
    a hash match pins every rule, not just the happy path."""
    from ray.data.aggregate import Min

    from ...functions.urlnorm import canonicalize_urls

    docs = _docs(sf_dir, ["doc_id"])

    def mk(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        s = (did % 23).astype("U8").astype(object)
        p = (did % 7).astype("U8").astype(object)
        v = did % 4
        u0 = (
            "HTTPS://SITE-" + s + ".EXAMPLE:443/page/" + p
            + "?utm_source=feed#frag"
        )
        u1 = "https://site-" + s + ".example/page/" + p + "/"
        u2 = "https://site-" + s + ".example/page/" + p + "?a=1&utm_campaign=c&b=2"
        u3 = "https://Site-" + s + ".Example:443/page/" + p + "#top"
        urls = np.select([v == 0, v == 1, v == 2], [u0, u1, u2], default=u3)
        canon = canonicalize_urls(pd.Series(urls, dtype=object))
        g = (
            pd.DataFrame({"url": canon.to_numpy(), "doc_id": did})
            .groupby("url", as_index=False)
            .agg(cnt=("doc_id", "size"), mn=("doc_id", "min"))
        )
        return pa.table({
            "url": pa.array(g["url"], pa.string()),
            "cnt": pa.array(g["cnt"].to_numpy(np.int64)),
            "mn": pa.array(g["mn"].to_numpy(np.int64)),
        })

    out = (
        docs.map_batches(mk, batch_format="pyarrow")
        .groupby("url")
        .aggregate(Sum("cnt", alias_name="n_raw"), Min("mn", alias_name="doc_id"))
        .to_pandas()
    )
    out["n_raw"] = out["n_raw"].astype(np.int64)
    return out.sort_values("url").reset_index(drop=True)[
        ["url", "n_raw", "doc_id"]
    ]


SQL_URL_CANONICAL = """
WITH crawl AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN 'HTTPS://SITE-' || CAST(doc_id % 23 AS VARCHAR)
        || '.EXAMPLE:443/page/' || CAST(doc_id % 7 AS VARCHAR)
        || '?utm_source=feed#frag'
      WHEN 1 THEN 'https://site-' || CAST(doc_id % 23 AS VARCHAR)
        || '.example/page/' || CAST(doc_id % 7 AS VARCHAR) || '/'
      WHEN 2 THEN 'https://site-' || CAST(doc_id % 23 AS VARCHAR)
        || '.example/page/' || CAST(doc_id % 7 AS VARCHAR)
        || '?a=1&utm_campaign=c&b=2'
      ELSE 'https://Site-' || CAST(doc_id % 23 AS VARCHAR)
        || '.Example:443/page/' || CAST(doc_id % 7 AS VARCHAR) || '#top'
    END AS url
  FROM documents),
p1 AS (SELECT doc_id, lower(split_part(url, '://', 1)) AS scheme,
              split_part(url, '://', 2) AS rest FROM crawl),
p2 AS (SELECT doc_id, scheme,
              lower(regexp_extract(rest, '^[^/?#]*')) AS hostport,
              substr(rest, length(regexp_extract(rest, '^[^/?#]*')) + 1)
                AS pathq
       FROM p1),
p3 AS (SELECT doc_id, scheme,
              CASE WHEN scheme = 'https'
                     THEN regexp_replace(hostport, ':443$', '')
                   WHEN scheme = 'http'
                     THEN regexp_replace(hostport, ':80$', '')
                   ELSE hostport END AS host,
              split_part(pathq, '#', 1) AS nofrag FROM p2),
p4 AS (SELECT doc_id, scheme, host,
              regexp_replace(split_part(nofrag, '?', 1), '/+$', '') AS path,
              CASE WHEN strpos(nofrag, '?') > 0
                   THEN split_part(nofrag, '?', 2) ELSE NULL END AS query
       FROM p3),
p5 AS (SELECT doc_id, scheme, host, path,
              CASE WHEN query IS NULL THEN ''
                   ELSE array_to_string(list_filter(string_split(query, '&'),
                        x -> NOT starts_with(x, 'utm_')), '&') END AS q2
       FROM p4),
canon AS (SELECT doc_id, scheme || '://' || host || path
                 || CASE WHEN q2 <> '' THEN '?' || q2 ELSE '' END AS url
          FROM p5)
SELECT url, count(*) AS n_raw, min(doc_id) AS doc_id
FROM canon GROUP BY url ORDER BY url
"""


def q_multimodal_decode(sf_dir: str):
    """Multimodal plumbing under the driver: attach fake image binaries,
    run the real actor-pool decode stage, emit the decoded metadata.  The
    fixture generator writes header dims as a pure function of doc_id, so
    the decoded metadata IS SQL-expressible — the oracle recomputes the
    expected dims arithmetically and the check verifies the distributed
    decode round-trip (pixel stats stay pytest-only: seeded-RNG bytes)."""
    base = _docs(sf_dir, ["doc_id"])
    decoded = multimodal.decode_images(multimodal.add_fake_images(base), strict=False)
    return decoded.select_columns(["doc_id", "dec_width", "dec_height", "dec_channels"])


SQL_MULTIMODAL_DECODE = (
    "SELECT doc_id, CAST(64 + (doc_id % 8) * 32 AS INTEGER) AS dec_width, "
    "CAST(64 + (doc_id % 5) * 32 AS INTEGER) AS dec_height, "
    "CAST(3 AS TINYINT) AS dec_channels FROM documents"
)


def q_multimodal_audio(sf_dir: str):
    """Audio flavor of the opaque-binary contract: attach fake audio
    payloads, run the real actor-pool decode stage, emit the decoded
    metadata (deterministic functions of doc_id -> SQL-expressible; the
    rms stat stays pytest-only: seeded-RNG samples)."""
    base = _docs(sf_dir, ["doc_id"])
    decoded = multimodal.DecodeAudioStage  # actor class used below
    ds = multimodal.add_fake_audio(base).map_batches(
        decoded,
        fn_constructor_kwargs={"strict": False},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
        num_cpus=1,
    )
    return ds.select_columns(["doc_id", "dec_sample_rate", "dec_n_samples"])


SQL_MULTIMODAL_AUDIO = (
    "SELECT doc_id, CAST(CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 44100 END "
    "AS INTEGER) AS dec_sample_rate, "
    "CAST(1000 + (doc_id % 10) * 500 AS BIGINT) AS dec_n_samples "
    "FROM documents"
)


def q_video_frames(sf_dir: str):
    """Video frame-sampling plumbing under the driver: attach a
    deterministic fake frames list (len = 5 + doc_id % 7, frame value =
    doc_id*100 + idx), run the real explode/downsample stage (every 3rd
    frame).  The generator is a pure function of doc_id, so the oracle
    recomputes the kept (doc_id, frame_idx, frame) rows arithmetically —
    the check verifies the distributed list-column sampling round-trip."""

    def attach(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        lens = 5 + (did % 7)
        total = int(lens.sum())
        pos = np.ones(total, dtype=np.int64)
        pos[0] = 0
        if lens.size > 1:
            pos[np.cumsum(lens[:-1])] = 1 - lens[:-1]
        pos = np.cumsum(pos)
        flat = np.repeat(did * 100, lens) + pos
        offs = np.zeros(lens.size + 1, dtype=np.int32)
        np.cumsum(lens, out=offs[1:])
        frames = pa.ListArray.from_arrays(
            pa.array(offs), pa.array(flat, pa.int64())
        )
        return pa.table({"doc_id": batch["doc_id"], "frames": frames})

    ds = _docs(sf_dir, ["doc_id"]).map_batches(attach, batch_format="pyarrow")
    return multimodal.frame_sample(ds, every_n=3)


SQL_VIDEO_FRAMES = (
    "SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx, "
    "doc_id * 100 + fi AS frame FROM ("
    "SELECT doc_id, unnest(generate_series(0, (5 + doc_id % 7) - 1, 3)) "
    "AS fi FROM documents)"
)


def q_hll_distinct_terms(sf_dir: str):
    """Approximate distinct-term count via mergeable per-batch HLL
    sketches (G7).  Approximate vs ``distinct_terms`` but DETERMINISTIC:
    register max-merge is batch-invariant, so the estimate equals the
    single-process scalar HLL reference (pipelines/pinned.py), which is
    the pinned VALUES oracle — the check proves the distributed sketch
    merge is lossless."""
    from ...functions.sketches import hll_distinct_terms

    est = hll_distinct_terms(_docs(sf_dir, ["text"]))
    return pd.DataFrame({"n_terms_estimate": [round(est, 6)]})


def q_hll_terms_per_lang(sf_dir: str):
    """Sketches as GROUPED aggregation state: per-lang HLL sketches built
    per batch (tokens hashed once, vectorized), merged by a
    groupby(lang) register-max — the shuffle moves 4-KiB states, never
    tokens.  Oracle = pinned serial per-lang HLL (identical registers);
    green proves the distributed merge is lossless per group."""
    from ...functions.sketches import hll_distinct_terms_by

    return hll_distinct_terms_by(_docs(sf_dir, ["lang", "text"])).sort("lang")


def q_docs_weighted_sample(sf_dir: str):
    """Weighted sampling without replacement (Efraimidis-Spirakis A-Res,
    IPL 2006): key = u^(1/w) with u a uniform from md5(doc_id) (first 8
    hex digits / 2^32) and w = n_chars; top-50 keys win.  Deterministic
    and parallelism-invariant (pure per-row keys + a bounded top-k), so
    the DuckDB oracle computes the IDENTICAL key expression — the
    training-data sampling shape where longer documents are
    proportionally likelier."""
    import hashlib

    docs = _docs(sf_dir, ["doc_id", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        w = batch["n_chars"].to_numpy().astype(np.float64)
        u = np.array(
            [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) for i in ids],
            dtype=np.float64,
        ) / float(1 << 32)
        key = u ** (1.0 / np.maximum(w, 1.0))
        order = np.lexsort((ids, -key))[:50]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "n_chars": pa.array(batch["n_chars"].to_numpy()[order], pa.int64()),
                "key": pa.array(key[order], pa.float64()),
            }
        )

    rows = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = rows.sort_values(["key", "doc_id"], ascending=[False, True]).head(50)
    return rows[["doc_id", "n_chars"]].reset_index(drop=True)


SQL_DOCS_WEIGHTED_SAMPLE = (
    "SELECT doc_id, n_chars FROM ("
    "SELECT doc_id, n_chars, "
    "pow(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
    "AS UBIGINT)::DOUBLE / 4294967296.0, "
    "1.0 / greatest(n_chars, 1)::DOUBLE) AS key "
    "FROM documents) ORDER BY key DESC, doc_id LIMIT 50"
)


_CMS_TERMS = [
    "a", "agg", "hash", "join", "scan", "table", "the", "window",
    "zzzabsent",
]


def q_cms_heavy_terms(sf_dir: str):
    """Count-Min frequency estimation (Cormode-Muthukrishnan 2005) —
    the fixed-memory heavy-hitter shape completing the sketch family
    (HLL distinct, KMV quantiles, CMS frequencies): one (d, w) sketch
    per batch, merged by elementwise sum (batch/partition-invariant),
    point-queried for a pinned term list.  The shuffle moves d·w
    counters per block regardless of corpus size.  Oracle = pinned
    serial reference (identical hash family ⇒ identical counters)."""
    from ...functions.sketches import cms_term_counts

    return cms_term_counts(_docs(sf_dir, ["text"]), _CMS_TERMS)


_MG_K = 30   # counters per summary; vocab is 31 at test SFs, so the
             # sketch genuinely prunes while 25 terms clear N/(k+1)


def q_mg_heavy_terms(sf_dir: str):
    """TWO-PASS EXACT heavy hitters via mergeable Misra-Gries
    summaries (Misra & Gries 1982; Agarwal et al., TODS 2013) — the
    deterministic counter-based sibling of the probabilistic CMS
    entry: pass 1 reduces each batch's exact term counts to a <= k
    counter summary (functions/sketches.mg_reduce), sums summaries
    with ONE groupby(term) over sketch rows only, and re-reduces the
    merged counters; mergeability guarantees every term with true
    count > N/(k+1) survives.  Pass 2 re-reads the corpus counting
    ONLY the surviving candidates (broadcast set) and keeps terms
    whose EXACT count clears the integer threshold ``count*(k+1) >
    N`` — so the output equals the exact heavy-hitter set no matter
    how blocks were split, which is why the oracle is a plain HAVING
    over true counts.  The exchange moves <= k+1 rows per batch in
    pass 1 and |candidates| rows per batch in pass 2 — never the
    corpus."""
    from ...functions.sketches import mg_reduce

    k = _MG_K

    def sketch(batch: pa.Table) -> pa.Table:
        tf, _ = term_count_table(batch["text"], batch["doc_id"])
        agg = tf.group_by("term").aggregate([("tf", "sum")])
        terms = np.asarray(agg["term"].to_pylist(), dtype=object)
        counts = agg["tf_sum"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        n_batch = int(counts.sum())
        st, sc = mg_reduce(terms, counts, k)
        return pa.table({
            "term": pa.array(
                np.concatenate([st, np.array(["\x00total"], object)])
            ),
            "c": pa.array(
                np.concatenate([sc, np.array([n_batch])]), pa.int64()
            ),
        })

    merged = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(sketch, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    total = int(merged.loc[merged["term"] == "\x00total", "c"].iloc[0])
    cand = merged[merged["term"] != "\x00total"]
    ct, _cc = mg_reduce(
        cand["term"].to_numpy(object), cand["c"].to_numpy(np.int64), k
    )
    cand_set = set(ct.tolist())

    def exact(batch: pa.Table) -> pa.Table:
        tf, _ = term_count_table(batch["text"], batch["doc_id"])
        tdf = tf.to_pandas()
        sub = tdf[tdf["term"].isin(cand_set)]
        agg = sub.groupby("term", as_index=False)["tf"].sum()
        return pa.table({
            "term": pa.array(agg["term"], pa.string()),
            "c": pa.array(agg["tf"].to_numpy(np.int64), pa.int64()),
        })

    counts = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(exact, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c", alias_name="cnt"))
        .to_pandas()
    )
    out = counts[counts["cnt"] * (k + 1) > total].copy()
    out["share"] = np.round(out["cnt"].to_numpy(np.float64) / total, 6)
    out = out.sort_values(
        ["cnt", "term"], ascending=[False, True]
    ).reset_index(drop=True)
    return out.astype({"cnt": "int64"})[["term", "cnt", "share"]]


SQL_MG_HEAVY_TERMS = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "nn AS (SELECT count(*) AS n FROM toks) "
    "SELECT term, CAST(count(*) AS BIGINT) AS cnt, "
    "round(count(*)::DOUBLE / (SELECT n FROM nn), 6) AS share "
    "FROM toks GROUP BY term "
    f"HAVING count(*) * {_MG_K + 1} > (SELECT n FROM nn) "
    "ORDER BY cnt DESC, term"
)


def q_retrieval_eval(sf_dir: str):
    """Entry point C over the pinned fixture: flagship retrieval scored
    against its own nested gold evidence (J3+G5).  Deterministic, fixture-
    sized input -> oracle is the single-process reference pipeline's
    summary row (pipelines/pinned.py) as SQL VALUES."""
    from ... import fixtures
    from ...stages.evaluate import evaluate_retrieval
    from .. import flagship

    n = 500
    pages = ray.data.from_arrow(fixtures.make_pages(n))
    idx = os.path.join(tempfile.gettempdir(), f"dfr_eval_idx_{n}_{_VTAG}")
    index_dir, docs = flagship.build_pages_index(
        pages, idx, seg_docs=256, lang=None, resume=True
    )
    docs = docs.materialize()
    claims_tbl = fixtures.make_claims(60, n_pages=n)
    claims = ray.data.from_arrow(claims_tbl)
    res = flagship.retrieve(index_dir, claims, docs, k=10)
    # at-scale API (VERDICT r04 #2): urls attach inside evaluate_retrieval
    # — driver dict below URL_DICT_LIMIT, distributed hash join above
    out = evaluate_retrieval(
        res.select_columns(["query_id", "rank", "doc_id", "score"]),
        claims, docs=docs, k=10,
    )
    out["recall_at_k"] = np.round(out["recall_at_k"], 6)
    out["mrr"] = np.round(out["mrr"], 6)
    return out


_SENT_WINDOW = 8
_SENT_NDOCS = 20


def q_sentence_topn(sf_dir: str):
    """K2 per-claim sentence top-n over the ``documents`` table, driver-
    checkable: documents are re-rendered as multi-sentence text ('. '
    between 8-token windows), run through the REAL pinned splitter
    (M2 explode), the broadcast-keyset semi-join (J2) and the per-claim
    overlap-idf scorer + top-n (K2); the oracle recomputes everything from
    token positions in SQL.  Cut policy: over-fetch, then re-rank on
    (round(score,6) DESC, doc_id, sent_id)."""
    from ...stages import sentences as sent

    def derive(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.less(batch["doc_id"], _SENT_NDOCS))
        texts = []
        for t in keep["text"].to_pylist():
            toks = [x for x in t.split(" ") if x]
            texts.append(
                ". ".join(
                    " ".join(toks[i : i + _SENT_WINDOW])
                    for i in range(0, len(toks), _SENT_WINDOW)
                )
            )
        return pa.table({"doc_id": keep["doc_id"], "text": pa.array(texts, pa.string())})

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(derive, batch_format="pyarrow")
    sents = sent.explode_sentences(docs)
    sents = sent.semi_join_docs(sents, set(range(_SENT_NDOCS)))
    triples = [
        (qid, list(range(_SENT_NDOCS)), terms) for qid, terms in _BM25_QUERIES
    ]
    res = sent.score_sentences_vs_claims(sents, triples, top_n=8).to_pandas()
    res["score"] = np.round(res["score"], 6)
    out = []
    for _qid, g in res.groupby("query_id"):
        g = g.sort_values(
            ["score", "doc_id", "sent_id"], ascending=[False, True, True]
        ).head(5)
        g = g.reset_index(drop=True)
        g["rn"] = np.arange(1, len(g) + 1, dtype=np.int32)
        out.append(g)
    return pd.concat(out, ignore_index=True)[
        ["query_id", "doc_id", "sent_id", "score", "text", "rn"]
    ]


def _sentence_topn_sql(queries: list[tuple[int, list[str]]], *, window: int,
                       n_docs: int, top_n: int = 5) -> str:
    vals = ", ".join(f"({qid}, '{t}')" for qid, terms in queries for t in terms)
    w = window
    return (
        "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        f"x -> x <> '') AS ts FROM documents WHERE doc_id < {n_docs}), "
        "tok AS (SELECT doc_id, unnest(ts) AS term, "
        f"CAST((unnest(range(1, len(ts) + 1)) - 1) // {w} AS INTEGER) AS sent_id FROM d), "
        "sl AS (SELECT doc_id, sent_id, count(*) AS n FROM tok GROUP BY doc_id, sent_id), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "qd AS (SELECT DISTINCT query_id, term FROM q), "
        "qk AS (SELECT query_id, count(*) AS k FROM qd GROUP BY query_id), "
        "ov AS (SELECT qd.query_id, tok.doc_id, tok.sent_id, count(*) AS overlap "
        "FROM tok JOIN qd ON tok.term = qd.term GROUP BY 1, 2, 3), "
        "stext AS (SELECT doc_id, unnest(list_transform("
        f"range(0, (len(ts) + {w - 1}) // {w}), "
        "s -> struct_pack(sent_id := CAST(s AS INTEGER), "
        f"text := array_to_string(ts[s * {w} + 1 : s * {w} + {w}], ' '))), "
        "recursive := true) FROM d), "
        "scored AS (SELECT ov.query_id, ov.doc_id, ov.sent_id, "
        "round(ov.overlap::DOUBLE / sl.n * ln(1 + qk.k), 6) AS score "
        "FROM ov JOIN sl ON ov.doc_id = sl.doc_id AND ov.sent_id = sl.sent_id "
        "JOIN qk ON qk.query_id = ov.query_id) "
        "SELECT s.query_id, s.doc_id, s.sent_id, s.score, stext.text, s.rn FROM ("
        "SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "score DESC, doc_id, sent_id) AS INTEGER) AS rn FROM scored) s "
        "JOIN stext ON stext.doc_id = s.doc_id AND stext.sent_id = s.sent_id "
        f"WHERE s.rn <= {top_n}"
    )


SQL_SENTENCE_TOPN = _sentence_topn_sql(
    _BM25_QUERIES, window=_SENT_WINDOW, n_docs=_SENT_NDOCS
)


_PAGES_N = 500
_PAGES_CLAIMS = 50


def q_pages_retrieval(sf_dir: str):
    """Full web pipeline over the pinned pages fixture: dedup ->
    extract-validate -> doc ids -> index -> NER+BM25 retrieval.  Input is
    the deterministic fixture corpus (size fixed, independent of sf_dir),
    so the oracle is the committed output of the single-process pure-Python
    reference pipeline (pipelines/pinned.py) inlined as SQL VALUES."""
    from ... import fixtures
    from .. import flagship

    n = _PAGES_N
    pages = ray.data.from_arrow(fixtures.make_pages(n))
    idx = os.path.join(tempfile.gettempdir(), f"dfr_pages_idx_{n}_{_VTAG}")
    index_dir, docs = flagship.build_pages_index(
        pages, idx, seg_docs=512, lang="en", resume=True
    )
    claims = ray.data.from_arrow(fixtures.make_claims(_PAGES_CLAIMS, n_pages=n))
    res = flagship.retrieve(index_dir, claims, docs.materialize(), k=5).to_pandas()
    # cross-engine float policy on the BM25-route scores (NER route is +inf)
    res["score"] = np.round(res["score"], 6)
    return res.sort_values(["query_id", "doc_id"]).reset_index(drop=True)


def q_bm25_topk_fanout(sf_dir: str):
    """Q4 cluster-shape variant under the driver: (query x segment) pairs
    fan out across the actor pool, per-segment top-k merge via a small
    groupby — result-identical to the fused path (pytest: fanout ==
    single), so the exact-BM25 SQL is its oracle."""
    from ...stages.search import search_fanout

    idx = _build_docs_index(sf_dir)
    res = search_fanout(
        idx, _query_terms_ds(_BM25_QUERIES), k=20, concurrency=2
    ).to_pandas()
    return _rerank_rounded(res, k=10)


def q_bm25_append_compact(sf_dir: str):
    """Incremental ingest + compaction under the driver: index the first
    half of ``documents``, APPEND the second half (new segments only, no
    rebuild), COMPACT the small segments into merged ones, then run the
    standard BM25 query set.  Scores and ranks must equal a from-scratch
    index of the full table — ``SQL_BM25_TOPK`` is the oracle, so the
    driver check proves index(A) + append(B) + compact == index(A∪B)."""
    import shutil

    from ...stages.index_build import append_index, compact_index

    docs = _docs(sf_dir, ["doc_id", "text"])
    n = docs.count()
    half = n // 2
    seg = max(64, n // 8)
    idx = _tmp_index_dir(sf_dir, "idxac")
    marker = os.path.join(idx, "_APPEND_COMPACT_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(idx, ignore_errors=True)
        A = docs.map_batches(
            lambda t: t.filter(pc.less(t["doc_id"], half)),
            batch_format="pyarrow",
        )
        Bd = docs.map_batches(
            lambda t: t.filter(pc.greater_equal(t["doc_id"], half)),
            batch_format="pyarrow",
        )
        build_index(A, idx, seg_docs=seg, resume=True)
        append_index(Bd, idx, seg_docs=seg)
        compact_index(idx, target_seg_docs=2 * seg)
        with open(marker, "w") as f:
            f.write("ok")
    res = search(idx, _query_terms_ds(_BM25_QUERIES), k=20, concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


def q_bm25_snapshot_topk(sf_dir: str):
    """Point-in-time snapshot read (time-travel over the append-only
    manifest log): index the first half of ``documents``, capture the
    manifest version, APPEND the second half, then query AT the
    captured version — results must equal a query against the
    pre-append index, proving readers are isolated from concurrent
    ingest.  The snapshot reader re-derives collection stats from the
    pinned manifest records and df/cf from the pinned segments' own
    postings stats (the global stats files already reflect the append).
    Oracle: BM25 SQL restricted to doc_id < count(*)//2 — the same
    dense-id split rule the build used."""
    import shutil

    from ...sources import manifest as mf
    from ...stages.index_build import append_index

    docs = _docs(sf_dir, ["doc_id", "text"])
    n = docs.count()
    half = n // 2
    seg = max(64, n // 8)
    idx = _tmp_index_dir(sf_dir, "idxsnap")
    vpath = os.path.join(idx, "_SNAPSHOT_VERSION")
    if not os.path.exists(vpath):
        shutil.rmtree(idx, ignore_errors=True)
        A = docs.map_batches(
            lambda t: t.filter(pc.less(t["doc_id"], half)),
            batch_format="pyarrow",
        )
        Bd = docs.map_batches(
            lambda t: t.filter(pc.greater_equal(t["doc_id"], half)),
            batch_format="pyarrow",
        )
        build_index(A, idx, seg_docs=seg, resume=True)
        v = mf.manifest_version(idx)
        append_index(Bd, idx, seg_docs=seg)
        tmp = vpath + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, vpath)
    with open(vpath) as f:
        v = int(f.read())
    res = search(
        idx, _query_terms_ds(_BM25_QUERIES), k=20, concurrency=2, at=v
    ).to_pandas()
    return _rerank_rounded(res, k=10)


SQL_BM25_SNAPSHOT_TOPK = _bm25_sql(
    _BM25_QUERIES,
    toks_sql=_TOKS_SQL
    + " WHERE doc_id < (SELECT count(*) // 2 FROM documents)",
)


def q_bm25_alias_topk(sf_dir: str):
    """Index alias + blue/green reindex (the zero-downtime reindex
    pattern): serve through an ``*.alias`` pointer file; build the
    replacement index under a fresh dir, then ONE atomic ``os.replace``
    flips every subsequent reader.  The entry builds a half-corpus
    index, aliases to it, builds the full-corpus replacement, FLIPS,
    and queries through the alias — the oracle is the plain full-corpus
    BM25 SQL, so the driver proves the flip took effect atomically.
    Readers resolve the alias once at construction (in-flight actors
    keep their resolved dir — snapshot-like consistency)."""
    import shutil

    from ...sources import manifest as mf

    docs = _docs(sf_dir, ["doc_id", "text"])
    n = docs.count()
    half = n // 2
    seg = max(64, n // 8)
    root = _tmp_index_dir(sf_dir, "idxalias")
    alias = os.path.join(root, "prod.alias")
    marker = os.path.join(root, "_ALIAS_FLIPPED")
    if not os.path.exists(marker):
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
        A = docs.map_batches(
            lambda t: t.filter(pc.less(t["doc_id"], half)),
            batch_format="pyarrow",
        )
        build_index(A, os.path.join(root, "blue"), seg_docs=seg,
                    resume=True)
        mf.set_alias(alias, os.path.join(root, "blue"))
        build_index(docs, os.path.join(root, "green"), seg_docs=seg,
                    resume=True)
        mf.set_alias(alias, os.path.join(root, "green"))  # the flip
        with open(marker, "w") as f:
            f.write("ok")
    res = search(
        alias, _query_terms_ds(_BM25_QUERIES), k=20, concurrency=2
    ).to_pandas()
    return _rerank_rounded(res, k=10)


def q_hard_negatives(sf_dir: str):
    """Hard-negative mining for retrieval-model training (the DPR /
    contrastive-pretraining recipe: per query, the top BM25 hits that
    are NOT the known positive become the negatives).  The positive is
    a pinned pure function of the query id — gold(q) = (37q + 11) mod
    n_docs, restated in the oracle — so both engines exclude the same
    doc.  Engine: over-fetch the standard searcher, drop the positive,
    re-rank under the rounded-score policy."""
    idx = _build_docs_index(sf_dir)
    n = _docs(sf_dir, ["doc_id"]).count()
    res = search(
        idx, _query_terms_ds(_BM25_QUERIES), k=24, concurrency=2
    ).to_pandas()
    gold = (res["query_id"].to_numpy(np.int64) * 37 + 11) % n
    res = res[res["doc_id"].to_numpy(np.int64) != gold]
    return _rerank_rounded(res, k=10)


SQL_HARD_NEGATIVES = _bm25_sql(
    _BM25_QUERIES,
    exclude_pred="tf.doc_id <> (q.query_id * 37 + 11) % s.n_docs",
)


def q_bm25_rollover_topk(sf_dir: str):
    """Index rollover (stages/rollover.py — the Elasticsearch
    `_rollover` / ILM hot-phase shape): the corpus arrives as 4
    doc-ordered chunks ingested into an index FAMILY whose write alias
    rolls to a fresh generation whenever ``max_gen_docs`` would be
    exceeded — here max = n/2, so the run exercises first-build,
    append-into-write-gen, and the roll itself (2 generations).  The
    per-chunk ledger makes every re-run a resume no-op.  Serving is
    federated over all generations with combined global stats, so the
    oracle is the plain unified single-index BM25 SQL — proving the
    roll lost nothing, duplicated nothing, and left ranking exact."""
    from ...stages.rollover import ingest_rollover, search_rollover

    docs = _docs(sf_dir, ["doc_id", "text"])
    n = docs.count()
    root = _tmp_index_dir(sf_dir, "idxroll")
    cuts = [0, n // 4, n // 2, (3 * n) // 4, n]
    for i in range(4):
        lo, hi = cuts[i], cuts[i + 1]
        chunk = docs.filter(expr=f"doc_id >= {lo} and doc_id < {hi}")
        ingest_rollover(
            chunk, root, f"chunk-{i}",
            max_gen_docs=n // 2, seg_docs=max(128, n // 8),
        )
    res = search_rollover(
        root, _query_terms_ds(_BM25_QUERIES), k=20, concurrency=2
    ).to_pandas()
    return _rerank_rounded(res, k=10)


# oracle: the rolled family must equal the unified single index exactly
SQL_BM25_ROLLOVER_TOPK = _bm25_sql(_BM25_QUERIES)


def q_bm25_retention_topk(sf_dir: str):
    """Retention / ILM delete phase over a rollover family
    (stages/rollover.expire_generations): after ingesting the corpus as
    4 chunks into 2 generations (max = n/2 docs each), retire all but
    the newest generation with ONE atomic ``retired.json`` write —
    in-flight searches keep the generation list they resolved,
    subsequent searches never open the retired dirs, and data dirs stay
    on disk for out-of-band GC (retire-then-delete).  Serving then
    covers only docs [n/2, n), with stats from the live generation
    alone — which is exactly what the oracle pins: BM25 SQL over the
    doc_id >= n//2 slice with slice-local stats."""
    from ...stages.rollover import (
        expire_generations,
        ingest_rollover,
        search_rollover,
    )

    docs = _docs(sf_dir, ["doc_id", "text"])
    n = docs.count()
    root = _tmp_index_dir(sf_dir, "idxret")
    cuts = [0, n // 4, n // 2, (3 * n) // 4, n]
    for i in range(4):
        lo, hi = cuts[i], cuts[i + 1]
        chunk = docs.filter(expr=f"doc_id >= {lo} and doc_id < {hi}")
        ingest_rollover(
            chunk, root, f"chunk-{i}",
            max_gen_docs=n // 2, seg_docs=max(128, n // 8),
        )
    expire_generations(root, keep_last=1)
    res = search_rollover(
        root, _query_terms_ds(_BM25_QUERIES), k=20, concurrency=2
    ).to_pandas()
    return _rerank_rounded(res, k=10)


SQL_BM25_RETENTION_TOPK = _bm25_sql(
    _BM25_QUERIES,
    toks_sql=_TOKS_SQL
    + " WHERE doc_id >= (SELECT count(*) // 2 FROM documents)",
)


_ROUTE_LANGS = ["de", "en", "es", "fr", "zh"]


def q_bm25_routed_topk(sf_dir: str):
    """Routing-partitioned serving (stages/routing.py — the
    Elasticsearch ``?routing=`` shape): documents partition by lang at
    index time (one bounded index per route under ``route=<v>/``), and
    a query carrying its route is served from exactly that partition —
    the others are never opened.  Stats are route-local (df / n_docs /
    avgdl of the partition alone, the per-route index's natural and
    Elasticsearch-default semantics), which the oracle pins with
    per-lang grouped stats in SQL.  Routes assigned round-robin over
    the corpus langs so every partition serves at least one query."""
    from ...stages.routing import build_routed_index, routed_search

    docs = _docs(sf_dir, ["doc_id", "lang", "text"])
    n = docs.count()
    root = _tmp_index_dir(sf_dir, "idxrouted")
    build_routed_index(
        docs, root, route_col="lang", routes=_ROUTE_LANGS,
        seg_docs=max(128, n // 8),
    )
    qt = pa.table({
        "query_id": pa.array([q for q, _ in _BM25_QUERIES], pa.int64()),
        "terms": pa.array(
            [t for _, t in _BM25_QUERIES], pa.list_(pa.string())
        ),
        "route": pa.array(
            [_ROUTE_LANGS[q % len(_ROUTE_LANGS)] for q, _ in _BM25_QUERIES]
        ),
    })
    res = routed_search(
        root, ray.data.from_arrow(qt), k=20, concurrency=2
    ).to_pandas()
    return _rerank_rounded(res, k=10)


SQL_BM25_ROUTED_TOPK = (
    "WITH toks AS (SELECT doc_id, lang, unnest(list_filter("
    "string_split(text, ' '), x -> x <> '')) AS term FROM documents), "
    "dl AS (SELECT doc_id, lang, count(*) AS dl FROM toks GROUP BY 1, 2), "
    "stats AS (SELECT lang, count(*) AS n_docs, sum(dl) AS total "
    "FROM dl GROUP BY lang), "
    "tf AS (SELECT doc_id, lang, term, count(*) AS tf FROM toks "
    "GROUP BY 1, 2, 3), "
    "df AS (SELECT lang, term, count(*) AS df FROM tf GROUP BY 1, 2), "
    "q(query_id, term, lang) AS (VALUES "
    + ", ".join(
        f"({qid}, '{t}', '{_ROUTE_LANGS[qid % len(_ROUTE_LANGS)]}')"
        for qid, terms in _BM25_QUERIES for t in terms
    )
    + "), "
    "scored AS (SELECT q.query_id, tf.doc_id, "
    "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
    "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / "
    "(s.total::DOUBLE / s.n_docs)))) AS score "
    "FROM q JOIN tf ON q.term = tf.term AND tf.lang = q.lang "
    "JOIN df ON df.term = q.term AND df.lang = q.lang "
    "JOIN dl ON dl.doc_id = tf.doc_id "
    "JOIN stats s ON s.lang = q.lang "
    "GROUP BY q.query_id, tf.doc_id) "
    "SELECT query_id, rank, doc_id, score FROM ("
    "SELECT query_id, doc_id, round(score, 6) AS score, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
    "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored) "
    "WHERE rank <= 10"
)


def q_docs_sample_hash(sf_dir: str):
    """K4 at scale: SEEDED sampling as a deterministic hash filter
    (md5(doc_id) prefix) — reproducible and parallelism/partitioning-
    invariant, unlike per-block RNG sampling; the form a 10^12-row
    pipeline uses to carve fixed eval slices."""
    import hashlib

    def samp(batch: pa.Table) -> pa.Table:
        keep = [
            hashlib.md5(str(d).encode()).hexdigest()[:2] <= "33"
            for d in batch["doc_id"].to_pylist()
        ]
        return batch.filter(pa.array(keep, pa.bool_()))

    return _docs(sf_dir, ["doc_id", "n_chars"]).map_batches(
        samp, batch_format="pyarrow"
    )


SQL_DOCS_SAMPLE_HASH = (
    "SELECT doc_id, n_chars FROM documents "
    "WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '33'"
)


def _claim_pipeline(want_urls: bool = False):
    """The shared distributed claim-verification run (retrieval ->
    evidence top-n -> entailment -> labels): returns (verdicts_df,
    doc_lists, url_of_doc, claims_tbl) so `claim_verdicts` and
    `fever_score` run the IDENTICAL pipeline.  The doc_id->url map is
    a separate corpus pull only `fever_score` needs, so it is built
    only when ``want_urls`` is set."""
    from ... import fixtures
    from ...functions.tokenizer import tokenize
    from ...stages import sentences as sent
    from ...stages import verify_claims as vc
    from .. import flagship

    n, n_claims, k = 500, 60, 5
    pages = ray.data.from_arrow(fixtures.make_pages(n))
    idx = os.path.join(tempfile.gettempdir(), f"dfr_eval_idx_{n}_{_VTAG}")
    index_dir, docs = flagship.build_pages_index(
        pages, idx, seg_docs=256, lang=None, resume=True
    )
    docs = docs.materialize()
    claims_tbl = fixtures.make_claims(n_claims, n_pages=n)
    claims = ray.data.from_arrow(claims_tbl)
    res = flagship.retrieve(index_dir, claims, docs, k=k)

    res_pd = res.select_columns(["query_id", "doc_id"]).to_pandas()
    doc_lists = {
        int(qid): sorted(set(g["doc_id"]))
        for qid, g in res_pd.groupby("query_id")
    }
    claim_rows = claims.select_columns(["query_id", "claim"]).take_all()
    claim_text = {int(r["query_id"]): r["claim"] for r in claim_rows}
    triples = [
        (qid, doc_lists.get(qid, []), tokenize(text))
        for qid, text in sorted(claim_text.items())
    ]
    all_docs = sorted({d for dl in doc_lists.values() for d in dl})
    sents = sent.explode_sentences(docs.select_columns(["doc_id", "text"]))
    sents = sent.semi_join_docs(sents, set(all_docs))
    topn = sent.score_sentences_vs_claims(sents, triples, top_n=5)
    entailed = vc.score_entailment(
        topn.select_columns(["query_id", "doc_id", "sent_id", "text"]),
        claim_text,
    )
    out = vc.classify_labels(entailed, sorted(claim_text))
    out["entail_score"] = np.round(out["entail_score"], 6)
    if want_urls:
        # urls are only consumed for the RETRIEVED docs (k-bounded per
        # claim), so the driver dict is bounded by the result set, never
        # corpus-sized — the filter runs vectorized over the stream
        wanted = pa.array(all_docs, pa.int64())

        def keep_retrieved(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b["doc_id"], value_set=wanted))

        url_of_doc = {
            r["doc_id"]: r["url"]
            for r in docs.select_columns(["doc_id", "url"])
            .map_batches(keep_retrieved, batch_format="pyarrow")
            .take_all()
        }
    else:
        url_of_doc = None
    return out, doc_lists, url_of_doc, claims_tbl


def q_claim_verdicts(sf_dir: str):
    """Entry point C end-to-end (A3/A4 stand-ins): retrieval -> evidence
    sentence top-n -> deterministic entailment actor pool -> label
    classifier -> one verdict row per claim.  Fixture-pinned input; oracle
    is the serial reference pipeline (pipelines/pinned.py) as VALUES."""
    out, _dl, _urls, _claims = _claim_pipeline()
    return out


def q_fever_score(sf_dir: str):
    """The reference task's own headline metric (Thorne et al. NAACL
    2018): strict FEVER score = a claim counts only if the predicted
    label matches gold AND, for non-NEI claims, some complete gold
    evidence set is covered by the retrieved pages.  Composes the
    distributed verdict pipeline with the fixtures' nested gold
    evidence; oracle is the independent serial mirror
    (pinned.serial_fever_score) as VALUES."""
    out, doc_lists, url_of_doc, claims_tbl = _claim_pipeline(want_urls=True)
    pred_label = dict(zip(out["query_id"], out["label"]))
    gold = claims_tbl.to_pylist()
    n = len(gold)
    n_label = n_fever = 0
    for c in gold:
        qid = int(c["query_id"])
        ok_label = pred_label.get(qid) == c["label"]
        n_label += ok_label
        pages = {url_of_doc[d] for d in doc_lists.get(qid, [])}
        ev_sets = c["evidence"] or []
        ok_ev = (not ev_sets) or any(
            all(e["page"] in pages for e in es) for es in ev_sets
        )
        n_fever += ok_label and ok_ev
    return pd.DataFrame(
        {
            "n_claims": np.array([n], dtype=np.int64),
            "label_accuracy": [round(n_label / n, 6)],
            "fever_score": [round(n_fever / n, 6)],
        }
    )


# --------------------------------- phrase + boolean (positional index)

_PHRASE_QUERIES: list[tuple[int, list[str]]] = [
    (0, ["batch", "batch"]),         # overlapping occurrences
    (1, ["table", "scan"]),
    (2, ["hash", "join"]),
    (3, ["merge", "sort", "fast"]),  # rare 3-gram
    (4, ["the", "fast"]),
    (5, ["zzz", "table"]),           # absent term -> no rows
]


def _build_docs_index_pos(sf_dir: str) -> str:
    """Build (or resume) the POSITIONAL segment index over ``documents``
    (pos_blob streams; own temp-dir tag so a non-positional index is
    never resumed into)."""
    idx = _tmp_index_dir(sf_dir, "idxpos")
    docs = _docs(sf_dir, ["doc_id", "text"])
    n = docs.count()
    build_index(
        docs, idx, seg_docs=max(256, n // 8), positions=True, resume=True
    )
    return idx


def q_phrase_topk(sf_dir: str):
    """Exact phrase top-k over the positional index (stages/phrase.py):
    consecutive-token match, overlapping occurrences counted, BM25 over
    the phrase-as-pseudo-term (tf = per-doc count, df = matching docs),
    round-6 re-rank at the edge (cross-engine float policy)."""
    from ...stages.phrase import phrase_search

    idx = _build_docs_index_pos(sf_dir)
    res = phrase_search(
        idx, _query_terms_ds(_PHRASE_QUERIES), k=20, concurrency=2
    ).to_pandas()
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


def _phrase_sql(queries: list[tuple[int, list[str]]], k: int = 10) -> str:
    """Independent positional oracle: probe every token index ``i`` of
    every doc against the phrase words (``ts[i+j] = w_j``; DuckDB list
    indexing is 1-based and NULL out of range), count matches per doc,
    then score/rank with the same BM25 + round-6 policy as the engine."""
    mx = max(len(t) for _, t in queries)
    cols = [f"w{i}" for i in range(mx)]
    vals = ", ".join(
        "("
        + ", ".join(
            [str(qid)]
            + [
                f"'{terms[i]}'" if i < len(terms) else "NULL"
                for i in range(mx)
            ]
        )
        + ")"
        for qid, terms in queries
    )
    conds = ["tok.ts[i] = ph.w0"] + [
        f"(ph.w{j} IS NULL OR tok.ts[i+{j}] = ph.w{j})" for j in range(1, mx)
    ]
    return (
        "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS ts FROM documents), "
        "tok AS (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i FROM d), "
        f"ph(query_id, {', '.join(cols)}) AS (VALUES {vals}), "
        "hits AS (SELECT ph.query_id, tok.doc_id, count(*) AS n_occ "
        "FROM tok, ph WHERE " + " AND ".join(conds) + " "
        "GROUP BY ph.query_id, tok.doc_id), "
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


SQL_PHRASE_TOPK = _phrase_sql(_PHRASE_QUERIES)


# --------------------------------- match_phrase_prefix / span_not

# (query_id, fixed prefix words, trailing prefix) — cap small enough to
# exercise the (df DESC, term) rewrite cap in both engines
_PP_QUERIES: list[tuple[int, list[str], str]] = [
    (0, ["hash"], "jo"),          # "hash jo*"
    (1, ["fast"], "s"),           # many s- expansions, cap binds
    (2, ["the", "table"], "s"),   # 3-term multi-phrase
    (3, ["value"], "zz"),         # empty expansion -> no hits
    (4, [], "mer"),               # bare prefix (no fixed words)
]
_PP_CAP = 3


def q_phrase_prefix_topk(sf_dir: str):
    """ES match_phrase_prefix (stages/phrase.phrase_prefix_search): the
    trailing prefix expands against the index term dictionary (capped to
    the ``_PP_CAP`` highest-df terms, ties by term — the shared wildcard
    rewrite cap), then a Lucene MultiPhraseQuery match: fixed words at
    consecutive offsets + ANY expansion at the last offset, scored as a
    pseudo-term (tf = anchors summed over alternatives, df = matching
    docs).  Expansion is one capped dictionary scan at the driver;
    anchor probing is vectorized key-set intersection in the actors."""
    from ...stages.phrase import phrase_prefix_search

    idx = _build_docs_index_pos(sf_dir)
    res = phrase_prefix_search(
        idx, _PP_QUERIES, k=20, max_expansions=_PP_CAP, concurrency=2
    ).to_pandas()
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


def _phrase_prefix_sql(
    queries: list[tuple[int, list[str], str]], cap: int, k: int = 10
) -> str:
    """Independent multi-phrase oracle: expand each prefix against the
    distinct-doc df dictionary with the same (df DESC, term) cap, then
    probe every token index for the fixed words at consecutive offsets
    and ANY expansion at offset ``mlen``; pseudo-term scoring tail
    shared with the phrase oracle."""
    mx = max(1, max(len(f) for _, f, _ in queries))
    wcols = [f"w{i}" for i in range(mx)]
    ph_vals = ", ".join(
        "("
        + ", ".join(
            [str(qid), str(len(fixed))]
            + [
                f"'{fixed[i]}'" if i < len(fixed) else "NULL"
                for i in range(mx)
            ]
        )
        + ")"
        for qid, fixed, _p in queries
    )
    pre_vals = ", ".join(f"({qid}, '{p}')" for qid, _f, p in queries)
    conds = [
        f"(ph.w{j} IS NULL OR tok.ts[i + {j}] = ph.w{j})" for j in range(mx)
    ]
    return (
        "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS ts FROM documents), "
        "tok AS (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i FROM d), "
        "toks AS (SELECT doc_id, unnest(ts) AS term FROM d), "
        "dfd AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks "
        "GROUP BY term), "
        f"pre(query_id, p) AS (VALUES {pre_vals}), "
        "exp AS (SELECT query_id, term FROM (SELECT pre.query_id, dfd.term, "
        "row_number() OVER (PARTITION BY pre.query_id "
        "ORDER BY dfd.df DESC, dfd.term) AS rn FROM pre "
        "JOIN dfd ON dfd.term LIKE pre.p || '%') "
        f"WHERE rn <= {cap}), "
        f"ph(query_id, mlen, {', '.join(wcols)}) AS (VALUES {ph_vals}), "
        "hits AS (SELECT ph.query_id, tok.doc_id, count(*) AS n_occ "
        "FROM tok, ph JOIN exp ON exp.query_id = ph.query_id "
        "WHERE " + " AND ".join(conds) + " "
        "AND tok.ts[i + ph.mlen] = exp.term "
        "GROUP BY ph.query_id, tok.doc_id), "
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


SQL_PHRASE_PREFIX_TOPK = _phrase_prefix_sql(_PP_QUERIES, _PP_CAP)


# (query_id, include term, exclude term, distance)
_SPAN_NOT_QUERIES: list[tuple[int, str, str, int]] = [
    (0, "hash", "join", 2),
    (1, "fast", "slow", 1),
    (2, "table", "zz", 3),      # excluder absent -> plain term result
    (3, "merge", "merge", 0),   # self-exclusion -> empty
    (4, "scan", "the", 4),
]


def q_span_not_topk(sf_dir: str):
    """Lucene SpanNotQuery (stages/phrase.span_not_search): occurrences
    of the include term with NO exclude term within ``dist`` positions,
    ranked by the surviving-occurrence pseudo-term BM25.  The exclusion
    test is two searchsorted probes per occurrence over the sorted
    occurrence-key arrays — no per-position loop."""
    from ...stages.phrase import span_not_search

    idx = _build_docs_index_pos(sf_dir)
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([q[0] for q in _SPAN_NOT_QUERIES], pa.int64()),
                "term_a": pa.array([q[1] for q in _SPAN_NOT_QUERIES], pa.string()),
                "term_b": pa.array([q[2] for q in _SPAN_NOT_QUERIES], pa.string()),
                "dist": pa.array([q[3] for q in _SPAN_NOT_QUERIES], pa.int64()),
            }
        )
    )
    res = span_not_search(idx, qds, k=20, concurrency=2).to_pandas()
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


def _span_not_sql(
    queries: list[tuple[int, str, str, int]], k: int = 10
) -> str:
    """Independent span-not oracle: per a-occurrence NOT EXISTS probe of
    b-occurrences within the distance, pseudo-term scoring tail."""
    vals = ", ".join(
        f"({qid}, '{a}', '{b}', {d})" for qid, a, b, d in queries
    )
    return (
        "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS ts FROM documents), "
        "tokpos AS (SELECT doc_id, unnest(ts) AS term, "
        "unnest(range(1, len(ts) + 1)) AS i FROM d), "
        f"q(query_id, a, b, dd) AS (VALUES {vals}), "
        "hits AS (SELECT q.query_id, t.doc_id, count(*) AS n_occ "
        "FROM q JOIN tokpos t ON t.term = q.a "
        "WHERE NOT EXISTS (SELECT 1 FROM tokpos tb "
        "WHERE tb.doc_id = t.doc_id AND tb.term = q.b "
        "AND abs(t.i - tb.i) <= q.dd) "
        "GROUP BY q.query_id, t.doc_id), "
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


SQL_SPAN_NOT_TOPK = _span_not_sql(_SPAN_NOT_QUERIES)


# (query_id, term, first_n) — Lucene SpanFirstQuery boundaries chosen to
# exercise: head-of-doc hit, boundary exactly at 1, mid-doc window, an
# absent term, and a window larger than some docs
_SPAN_FIRST_QUERIES: list[tuple[int, str, int]] = [
    (0, "hash", 3),
    (1, "the", 1),     # only position-0 occurrences survive
    (2, "data", 10),
    (3, "zz", 4),      # absent term -> no rows
    (4, "table", 5),
]


def q_span_first_topk(sf_dir: str):
    """Lucene SpanFirstQuery (stages/phrase.span_first_search):
    occurrences of the term within the first N token positions of the
    doc (engine 0-based ``pos < N`` == oracle 1-based ``i <= N``),
    ranked by the surviving-occurrence pseudo-term BM25.  Survival is a
    single vectorized mask over the term's positional pack — absolute
    position, no window probes."""
    from ...stages.phrase import span_first_search

    idx = _build_docs_index_pos(sf_dir)
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(
                    [q[0] for q in _SPAN_FIRST_QUERIES], pa.int64()
                ),
                "term": pa.array(
                    [q[1] for q in _SPAN_FIRST_QUERIES], pa.string()
                ),
                "first_n": pa.array(
                    [q[2] for q in _SPAN_FIRST_QUERIES], pa.int64()
                ),
            }
        )
    )
    res = span_first_search(idx, qds, k=20, concurrency=2).to_pandas()
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


def _span_first_sql(
    queries: list[tuple[int, str, int]], k: int = 10
) -> str:
    """Independent span-first oracle: 1-based token index ``i <= n``
    filter over the unnested (term, position) stream, pseudo-term
    scoring tail identical to the other span oracles."""
    vals = ", ".join(f"({qid}, '{t}', {n})" for qid, t, n in queries)
    return (
        "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS ts FROM documents), "
        "tokpos AS (SELECT doc_id, unnest(ts) AS term, "
        "unnest(range(1, len(ts) + 1)) AS i FROM d), "
        f"q(query_id, term, n) AS (VALUES {vals}), "
        "hits AS (SELECT q.query_id, t.doc_id, count(*) AS n_occ "
        "FROM q JOIN tokpos t ON t.term = q.term WHERE t.i <= q.n "
        "GROUP BY q.query_id, t.doc_id), "
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


SQL_SPAN_FIRST_TOPK = _span_first_sql(_SPAN_FIRST_QUERIES)


_BOOL_QUERIES: list[tuple[int, list[str], list[str], list[str]]] = [
    # (query_id, must, should, must_not)
    (0, ["hash", "join"], ["fast"], ["slow"]),
    (1, [], ["scan", "merge"], ["the"]),
    (2, ["customer", "line"], [], ["agg"]),
    (3, ["data"], ["query", "window"], []),
    (4, ["zzz"], ["fast"], []),      # absent must -> empty result
]


def q_boolean_topk(sf_dir: str):
    """Boolean retrieval (must/should/must_not) ranked by BM25 over
    must+should restricted to the filtered candidates (stages/phrase.py
    score_boolean; per-(doc, term) contributions identical to the plain
    BM25 scorer).  Reuses the positional index (boolean needs no
    positions; sharing the temp index avoids a second build)."""
    from ...stages.phrase import boolean_search

    idx = _build_docs_index_pos(sf_dir)
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([q[0] for q in _BOOL_QUERIES], pa.int64()),
                "must": pa.array(
                    [q[1] for q in _BOOL_QUERIES], pa.list_(pa.string())
                ),
                "should": pa.array(
                    [q[2] for q in _BOOL_QUERIES], pa.list_(pa.string())
                ),
                "must_not": pa.array(
                    [q[3] for q in _BOOL_QUERIES], pa.list_(pa.string())
                ),
            }
        )
    )
    res = boolean_search(idx, qds, k=20, concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


def _filtered_bm25_sql(cand_parts: list[str], qvals: list[str], k: int = 10) -> str:
    """Shared oracle skeleton: per-query candidate doc sets (UNION ALL of
    ``SELECT qid AS query_id, doc_id ...``) scored with the exact-BM25
    CTEs of ``_bm25_sql`` restricted to the candidates."""
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS ts FROM documents), "
        "tokpos AS (SELECT doc_id, unnest(ts) AS term, "
        "unnest(range(1, len(ts) + 1)) AS i FROM d), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
        "GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        "cand AS (" + " UNION ALL ".join(cand_parts) + "), "
        f"q(query_id, term) AS (VALUES {', '.join(qvals)}), "
        "scored AS (SELECT q.query_id, tf.doc_id, "
        "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
        "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
        ") AS score FROM q JOIN tf ON q.term = tf.term "
        "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
        "JOIN cand ON cand.query_id = q.query_id AND cand.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id) "
        "SELECT query_id, rank, doc_id, score FROM ("
        "SELECT query_id, doc_id, round(score, 6) AS score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored) "
        f"WHERE rank <= {k}"
    )


def _boolean_sql(
    queries: list[tuple[int, list[str], list[str], list[str]]], k: int = 10
) -> str:
    """Boolean oracle: per-query candidate filter via ``list_contains``
    (AND / OR / NOT), scoring identical to ``_bm25_sql`` restricted to
    the candidates."""
    cand_parts = []
    qvals = []
    for qid, must, should, must_not in queries:
        conds = [f"list_contains(ts, '{t}')" for t in sorted(set(must))]
        sh = sorted(set(should))
        if not must and sh:
            conds.append(
                "(" + " OR ".join(f"list_contains(ts, '{t}')" for t in sh) + ")"
            )
        conds += [f"NOT list_contains(ts, '{t}')" for t in sorted(set(must_not))]
        where = " AND ".join(conds) if conds else "TRUE"
        cand_parts.append(
            f"SELECT {qid} AS query_id, doc_id FROM d WHERE {where}"
        )
        for t in sorted(set(must) | set(should)):
            qvals.append(f"({qid}, '{t}')")
    return _filtered_bm25_sql(cand_parts, qvals, k)


SQL_BOOLEAN_TOPK = _boolean_sql(_BOOL_QUERIES)


# ------------------------------------- minimum-should-match boolean

_MSM_QUERIES: list[tuple[int, list[str], list[str], list[str]]] = [
    # (query_id, must, should, must_not); min_should = _MSM below
    (0, [], ["data", "query", "fast"], []),      # any 2 of 3
    (1, ["merge"], ["sort", "scan"], []),        # must + 2 of 2 shoulds
    (2, [], ["scan", "merge", "sort", "window"], ["dup"]),  # 2 of 4, NOT dup
    (3, [], ["dup", "data"], []),                # msm == len -> conjunction
    (4, [], ["zzz", "data"], []),    # absent term can't count -> empty
]
_MSM = 2


def q_boolean_msm(sf_dir: str):
    """Boolean retrieval with Lucene minimumShouldMatch: candidates must
    contain at least ``_MSM`` DISTINCT should terms (plus all musts,
    minus must_nots); ranking is the same candidate-restricted BM25 sum
    as the plain boolean entry (stages/phrase.score_boolean
    ``min_should``)."""
    from ...stages.phrase import boolean_search

    idx = _build_docs_index_pos(sf_dir)
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([q[0] for q in _MSM_QUERIES], pa.int64()),
                "must": pa.array(
                    [q[1] for q in _MSM_QUERIES], pa.list_(pa.string())
                ),
                "should": pa.array(
                    [q[2] for q in _MSM_QUERIES], pa.list_(pa.string())
                ),
                "must_not": pa.array(
                    [q[3] for q in _MSM_QUERIES], pa.list_(pa.string())
                ),
            }
        )
    )
    res = boolean_search(
        idx, qds, k=20, concurrency=2, min_should=_MSM
    ).to_pandas()
    return _rerank_rounded(res, k=10)


def _boolean_msm_sql(
    queries: list[tuple[int, list[str], list[str], list[str]]],
    msm: int, k: int = 10,
) -> str:
    """minimumShouldMatch oracle: the should condition becomes a count —
    ``sum(list_contains::INT) >= msm`` — scoring unchanged."""
    cand_parts = []
    qvals = []
    for qid, must, should, must_not in queries:
        conds = [f"list_contains(ts, '{t}')" for t in sorted(set(must))]
        sh = sorted(set(should))
        if sh:
            conds.append(
                "("
                + " + ".join(f"list_contains(ts, '{t}')::INT" for t in sh)
                + f") >= {msm}"
            )
        elif msm > 0:
            # msm exceeds the should-clause count -> matches nothing
            # (score_boolean's min_should > len(should) early return)
            conds.append("FALSE")
        conds += [f"NOT list_contains(ts, '{t}')" for t in sorted(set(must_not))]
        where = " AND ".join(conds) if conds else "TRUE"
        cand_parts.append(
            f"SELECT {qid} AS query_id, doc_id FROM d WHERE {where}"
        )
        for t in sorted(set(must) | set(should)):
            qvals.append(f"({qid}, '{t}')")
    return _filtered_bm25_sql(cand_parts, qvals, k)


SQL_BOOLEAN_MSM = _boolean_msm_sql(_MSM_QUERIES, _MSM)


_WINDOW_QUERIES: list[tuple[int, list[str], int]] = [
    # (query_id, terms, window): all terms within a window-token span
    (0, ["hash", "join"], 3),
    (1, ["table", "scan"], 1),       # window 1: impossible for 2 terms
    (2, ["customer", "line", "agg"], 12),
    (3, ["data", "query"], 6),
    (4, ["zzz", "table"], 8),        # absent term -> empty
]


def q_proximity_topk(sf_dir: str):
    """Proximity (within-window) retrieval over the positional index
    (stages/phrase.py match_window/score_window): docs where one
    occurrence of every term fits in a ``window``-token span, ranked by
    the plain BM25 sum over the terms."""
    from ...stages.phrase import window_search

    idx = _build_docs_index_pos(sf_dir)
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([q[0] for q in _WINDOW_QUERIES], pa.int64()),
                "terms": pa.array(
                    [q[1] for q in _WINDOW_QUERIES], pa.list_(pa.string())
                ),
                "window": pa.array(
                    [q[2] for q in _WINDOW_QUERIES], pa.int64()
                ),
            }
        )
    )
    res = window_search(idx, qds, k=20, concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


def _window_sql(
    queries: list[tuple[int, list[str], int]], k: int = 10
) -> str:
    """Independent proximity oracle: m-way self-join of the per-term
    (doc, position) sets with ``greatest(...) - least(...) <= window-1``,
    then the shared candidate-filtered BM25 scoring."""
    cand_parts, qvals = [], []
    for qid, terms, w in queries:
        uniq = sorted(set(terms))
        aliases = [f"o{i}" for i in range(len(uniq))]
        froms = [
            f"(SELECT doc_id, i FROM tokpos WHERE term = '{t}') {a}"
            for t, a in zip(uniq, aliases)
        ]
        join = froms[0]
        for f in froms[1:]:
            join += f" JOIN {f} USING (doc_id)"
        cols = ", ".join(f"{a}.i" for a in aliases)
        span = (
            f"greatest({cols}) - least({cols})" if len(uniq) > 1 else "0"
        )
        cand_parts.append(
            f"SELECT DISTINCT {qid} AS query_id, {aliases[0]}.doc_id "
            f"FROM {join} WHERE {span} <= {w - 1}"
        )
        for t in uniq:
            qvals.append(f"({qid}, '{t}')")
    return _filtered_bm25_sql(cand_parts, qvals, k)


SQL_PROXIMITY_TOPK = _window_sql(_WINDOW_QUERIES)


_ORDERED_QUERIES: list[tuple[int, list[str], int]] = [
    # (query_id, terms IN ORDER, slop): Lucene SpanNear(in_order=true)
    (0, ["hash", "join"], 1),
    (1, ["join", "hash"], 1),        # reverse order: different match set
    (2, ["customer", "line", "agg"], 6),
    (3, ["data", "query"], 3),
    (4, ["table", "zzz"], 4),        # absent term -> empty
    (5, ["scan", "scan"], 2),        # duplicate term: two occurrences
]


def q_span_near_topk(sf_dir: str):
    """Lucene ``SpanNearQuery(in_order=true)`` retrieval
    (stages/phrase.match_ordered): docs with the terms at strictly
    increasing positions in QUERY order, span width <= slop + m - 1,
    ranked by the plain BM25 sum.  Queries 0/1 are the same term pair in
    both orders — their match sets differ, which unordered proximity
    cannot express."""
    from ...stages.phrase import ordered_search

    idx = _build_docs_index_pos(sf_dir)
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([q[0] for q in _ORDERED_QUERIES], pa.int64()),
                "terms": pa.array(
                    [q[1] for q in _ORDERED_QUERIES], pa.list_(pa.string())
                ),
                "slop": pa.array([q[2] for q in _ORDERED_QUERIES], pa.int64()),
            }
        )
    )
    res = ordered_search(idx, qds, k=20, concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


def _ordered_sql(
    queries: list[tuple[int, list[str], int]], k: int = 10
) -> str:
    """Independent ordered span-near oracle: m-way self-join of the
    per-term (doc, position) sets in QUERY order with strictly
    increasing positions and ``last - first <= slop + m - 1``, then the
    shared candidate-filtered BM25 scoring."""
    cand_parts, qvals = [], []
    for qid, terms, slop in queries:
        aliases = [f"o{i}" for i in range(len(terms))]
        froms = [
            f"(SELECT doc_id, i FROM tokpos WHERE term = '{t}') {a}"
            for t, a in zip(terms, aliases)
        ]
        join = froms[0]
        for f in froms[1:]:
            join += f" JOIN {f} USING (doc_id)"
        increasing = " AND ".join(
            f"{aliases[i]}.i < {aliases[i + 1]}.i"
            for i in range(len(aliases) - 1)
        )
        width = f"{aliases[-1]}.i - {aliases[0]}.i <= {slop + len(terms) - 1}"
        cond = f"{increasing} AND {width}" if len(terms) > 1 else "TRUE"
        cand_parts.append(
            f"SELECT DISTINCT {qid} AS query_id, {aliases[0]}.doc_id "
            f"FROM {join} WHERE {cond}"
        )
        for t in sorted(set(terms)):
            qvals.append(f"({qid}, '{t}')")
    return _filtered_bm25_sql(cand_parts, qvals, k)


SQL_SPAN_NEAR_TOPK = _ordered_sql(_ORDERED_QUERIES)


_INTERVAL_QUERIES: list[tuple[int, list[str], int]] = [
    # (query_id, terms IN ORDER, max_gaps): Lucene Intervals.maxgaps(g,
    # Intervals.ordered(...)).  0/1 share a pair at different gap
    # budgets; 1/5 are the same pair in both orders; 3 repeats a term
    # (distinct positions required); 4 carries an absent term -> empty.
    (0, ["hash", "join"], 0),
    (1, ["hash", "join"], 3),
    (2, ["data", "query", "fast"], 8),
    (3, ["scan", "scan"], 5),
    (4, ["table", "zzz"], 4),
    (5, ["join", "hash"], 3),
]


def q_intervals_topk(sf_dir: str):
    """Lucene intervals query (stages/phrase.match_intervals —
    ``Intervals.maxgaps(g, Intervals.ordered(...))``): docs ranked by
    their count of MINIMAL ordered intervals within the gap budget, as
    the pseudo-term tf (the IntervalsSource freq).  Differs from
    span_near (q_span_near_topk) exactly by minimality: span_near is a
    boolean window filter ranked by plain term BM25; intervals COUNT
    non-redundant occurrences and rank by them."""
    from ...stages.phrase import intervals_search

    idx = _build_docs_index_pos(sf_dir)
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(
                    [q[0] for q in _INTERVAL_QUERIES], pa.int64()
                ),
                "terms": pa.array(
                    [q[1] for q in _INTERVAL_QUERIES], pa.list_(pa.string())
                ),
                "max_gaps": pa.array(
                    [q[2] for q in _INTERVAL_QUERIES], pa.int64()
                ),
            }
        )
    )
    res = intervals_search(idx, qds, k=20, concurrency=2).to_pandas()
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


def _intervals_sql(
    queries: list[tuple[int, list[str], int]], k: int = 10
) -> str:
    """Independent minimal-interval oracle: per query, the backward
    greedy chain as nested correlated ``max(i)`` subqueries (largest
    occurrence of each earlier term strictly before the chain position),
    minimality as ``GROUP BY (doc, start) -> min(end)`` — the exact
    relational restatement of the engine's staircase argument — then the
    gap filter and the shared pseudo-term BM25 tail."""
    chain_ctes, hit_parts = [], []
    for qid, terms, g in queries:
        m = len(terms)
        prev = f"q{qid}c0"
        chain_ctes.append(
            f"{prev} AS (SELECT doc_id, i AS e, i AS cur FROM tokpos "
            f"WHERE term = '{terms[-1]}')"
        )
        for step, t in enumerate(reversed(terms[:-1]), 1):
            name = f"q{qid}c{step}"
            chain_ctes.append(
                f"{name} AS (SELECT doc_id, e, "
                f"(SELECT max(x.i) FROM tokpos x WHERE x.doc_id = c.doc_id "
                f"AND x.term = '{t}' AND x.i < c.cur) AS cur "
                f"FROM {prev} c WHERE c.cur IS NOT NULL)"
            )
            prev = name
        chain_ctes.append(
            f"q{qid}m AS (SELECT doc_id, cur AS s, min(e) AS e "
            f"FROM {prev} WHERE cur IS NOT NULL GROUP BY doc_id, cur)"
        )
        hit_parts.append(
            f"SELECT {qid} AS query_id, doc_id, count(*) AS n_occ "
            f"FROM q{qid}m WHERE e - s <= {g + m - 1} GROUP BY doc_id"
        )
    return (
        "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS ts FROM documents), "
        "tokpos AS (SELECT doc_id, unnest(ts) AS term, "
        "unnest(range(1, len(ts) + 1)) AS i FROM d), "
        + ", ".join(chain_ctes) + ", "
        "hits AS (" + " UNION ALL ".join(hit_parts) + "), "
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


SQL_INTERVALS_TOPK = _intervals_sql(_INTERVAL_QUERIES)


_INTERVALS_OR_QUERIES: list[tuple[int, list[list[str]], int]] = [
    # (query_id, ordered slots — each an Intervals.or union, max_gaps)
    (0, [["fast", "quick"], ["data"]], 3),
    (1, [["hash"], ["join", "table"]], 2),
    (2, [["merge", "sort"], ["merge", "sort"]], 4),  # self-union pair
    (3, [["zzz"], ["data"]], 5),                     # absent slot -> empty
]


def q_intervals_or_topk(sf_dir: str):
    """Lucene ``Intervals.maxgaps(g, Intervals.ordered(Intervals.or(...),
    ...))`` (stages/phrase.match_intervals_groups): minimal ordered
    intervals where each slot matches ANY of its member terms, counted
    as the pseudo-term tf.  The union composition the singleton
    intervals entry can't express — and distinct from span_or_near,
    which is a boolean window filter ranked by plain term BM25."""
    from ...stages.phrase import intervals_or_search

    idx = _build_docs_index_pos(sf_dir)
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(
                    [q[0] for q in _INTERVALS_OR_QUERIES], pa.int64()
                ),
                "groups": pa.array(
                    [q[1] for q in _INTERVALS_OR_QUERIES],
                    pa.list_(pa.list_(pa.string())),
                ),
                "max_gaps": pa.array(
                    [q[2] for q in _INTERVALS_OR_QUERIES], pa.int64()
                ),
            }
        )
    )
    res = intervals_or_search(idx, qds, k=20, concurrency=2).to_pandas()
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


def _intervals_or_sql(
    queries: list[tuple[int, list[list[str]], int]], k: int = 10
) -> str:
    """The _intervals_sql chain with ``term IN (members)`` per slot —
    the union slot is the only change; minimality stays the GROUP BY
    (doc, start) -> min(end) restatement."""
    chain_ctes, hit_parts = [], []
    for qid, groups, g in queries:
        m = len(groups)

        def members(grp: list[str]) -> str:
            return ", ".join(f"'{t}'" for t in grp)

        prev = f"qo{qid}c0"
        chain_ctes.append(
            f"{prev} AS (SELECT doc_id, i AS e, i AS cur FROM tokpos "
            f"WHERE term IN ({members(groups[-1])}))"
        )
        for step, grp in enumerate(reversed(groups[:-1]), 1):
            name = f"qo{qid}c{step}"
            chain_ctes.append(
                f"{name} AS (SELECT doc_id, e, "
                f"(SELECT max(x.i) FROM tokpos x WHERE x.doc_id = c.doc_id "
                f"AND x.term IN ({members(grp)}) AND x.i < c.cur) AS cur "
                f"FROM {prev} c WHERE c.cur IS NOT NULL)"
            )
            prev = name
        chain_ctes.append(
            f"qo{qid}m AS (SELECT doc_id, cur AS s, min(e) AS e "
            f"FROM {prev} WHERE cur IS NOT NULL GROUP BY doc_id, cur)"
        )
        hit_parts.append(
            f"SELECT {qid} AS query_id, doc_id, count(*) AS n_occ "
            f"FROM qo{qid}m WHERE e - s <= {g + m - 1} GROUP BY doc_id"
        )
    return (
        "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS ts FROM documents), "
        "tokpos AS (SELECT doc_id, unnest(ts) AS term, "
        "unnest(range(1, len(ts) + 1)) AS i FROM d), "
        + ", ".join(chain_ctes) + ", "
        "hits AS (" + " UNION ALL ".join(hit_parts) + "), "
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


SQL_INTERVALS_OR_TOPK = _intervals_or_sql(_INTERVALS_OR_QUERIES)


_SPAN_OR_QUERIES: list[tuple[int, list[list[str]], int]] = [
    # (query_id, ordered slots — each a SpanOr union of alternatives, slop)
    (0, [["fast", "quick"], ["data"]], 2),    # "quick" absent: union degrades
    (1, [["merge", "sort"], ["join"]], 3),
    (2, [["hash"], ["join", "table"]], 1),
    (3, [["zzz", "yyy"], ["data"]], 4),        # whole slot absent -> empty
    (4, [["scan"], ["slow", "scan"]], 2),      # self-overlapping union
]


def q_span_or_near_topk(sf_dir: str):
    """Lucene ``SpanNearQuery(in_order=true)`` over ``SpanOrQuery``
    clauses (stages/phrase.match_ordered_groups): each slot matches ANY
    of its member terms, slots in order at strictly increasing
    positions, width <= slop + m - 1; ranked by the plain BM25 sum over
    the distinct member terms — the positional-union combinator the
    single-term span family can't express (q0: "fast|quick ... data")."""
    from ...stages.phrase import span_or_near_search

    idx = _build_docs_index_pos(sf_dir)
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(
                    [q[0] for q in _SPAN_OR_QUERIES], pa.int64()
                ),
                "groups": pa.array(
                    [q[1] for q in _SPAN_OR_QUERIES],
                    pa.list_(pa.list_(pa.string())),
                ),
                "slop": pa.array(
                    [q[2] for q in _SPAN_OR_QUERIES], pa.int64()
                ),
            }
        )
    )
    res = span_or_near_search(idx, qds, k=20, concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


def _span_or_near_sql(
    queries: list[tuple[int, list[list[str]], int]], k: int = 10
) -> str:
    """Independent oracle: m-way self-join where each slot's positions
    come from ``term IN (members)``, strictly increasing, width rule as
    span_near; scoring = the shared candidate-filtered BM25 over every
    distinct member term."""
    cand_parts, qvals = [], []
    for qid, groups, slop in queries:
        aliases = [f"o{i}" for i in range(len(groups))]
        froms = []
        for g, a in zip(groups, aliases):
            members = ", ".join(f"'{t}'" for t in g)
            froms.append(
                f"(SELECT doc_id, i FROM tokpos WHERE term IN ({members})) {a}"
            )
        join = froms[0]
        for f in froms[1:]:
            join += f" JOIN {f} USING (doc_id)"
        increasing = " AND ".join(
            f"{aliases[i]}.i < {aliases[i + 1]}.i"
            for i in range(len(aliases) - 1)
        )
        width = (
            f"{aliases[-1]}.i - {aliases[0]}.i <= {slop + len(groups) - 1}"
        )
        cond = f"{increasing} AND {width}" if len(groups) > 1 else "TRUE"
        cand_parts.append(
            f"SELECT DISTINCT {qid} AS query_id, {aliases[0]}.doc_id "
            f"FROM {join} WHERE {cond}"
        )
        for t in sorted({t for g in groups for t in g}):
            qvals.append(f"({qid}, '{t}')")
    return _filtered_bm25_sql(cand_parts, qvals, k)


SQL_SPAN_OR_NEAR_TOPK = _span_or_near_sql(_SPAN_OR_QUERIES)


_SDM_QUERIES: list[tuple[int, list[str]]] = [
    (0, ["data", "query", "fast"]),
    (1, ["merge", "sort"]),
    (2, ["hash", "join", "table"]),
    (3, ["slow", "scan"]),
    (4, ["window"]),          # unigram-only: no pair features
    (5, ["table", "zzz"]),    # absent second term: pair features vanish
]


def q_sdm_topk(sf_dir: str):
    """Sequential dependence model retrieval (Metzler & Croft, SIGIR
    2005 — the Indri/Galago MRF model; stages/phrase.score_sdm):
    unigram + ordered-bigram (#1, exact adjacent phrase counts) +
    unordered-window (#uw8 co-occurrence pair counts) features, pinned
    weights (0.85, 0.10, 0.05), each feature in the shared pinned
    LM-Dirichlet contribution shape with its OWN collection count.
    The term-dependency model the independent-term scorers (BM25, LMD,
    DFR...) cannot express — adjacency and proximity evidence move
    docs that merely contain the words below docs that contain the
    phrase."""
    from ...stages.phrase import sdm_search

    idx = _build_docs_index_pos(sf_dir)
    res = sdm_search(
        idx, _query_terms_ds(_SDM_QUERIES), k=20, concurrency=2
    ).to_pandas()
    return _rerank_rounded(res, k=10)


def _sdm_sql(queries: list[tuple[int, list[str]]], k: int = 10,
             mu: str = "2000.0", window: int = 8) -> str:
    """Independent SDM oracle: unigram contributions from the LMD-body
    joins; per-(query, adjacent-pair) bigram counts via the positional
    list probe (ts[i]/ts[i+1]) and window-8 pair counts via the
    |i-j| <= 7 positional self-join, each with its collection total as
    a scalar subquery; all contribution rows UNION ALL -> sum per
    (query, doc) -> round-6 rank."""
    lt, lo_, lu = "0.85", "0.10", "0.05"
    w1 = window - 1
    uvals = ", ".join(
        f"({qid}, '{t}')"
        for qid, terms in queries
        for t in sorted(set(terms))
    )
    ctes, parts = [], []
    parts.append(
        "SELECT qd.query_id, tf.doc_id, "
        f"{lt} * (ln(1 + tf.tf * s.t_total::DOUBLE / ({mu} * cf.cf)) "
        f"+ ln({mu} / (dl.dl + {mu}))) AS c "
        "FROM qd JOIN tf ON qd.term = tf.term "
        "JOIN cf ON cf.term = qd.term "
        "JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s"
    )
    for qid, terms in queries:
        for pi, (a, b) in enumerate(zip(terms, terms[1:])):
            hb = f"q{qid}b{pi}"
            ctes.append(
                f"{hb} AS (SELECT tok.doc_id, count(*) AS n FROM tok "
                f"WHERE tok.ts[i] = '{a}' AND tok.ts[i+1] = '{b}' "
                "GROUP BY tok.doc_id)"
            )
            parts.append(
                f"SELECT {qid} AS query_id, h.doc_id, "
                f"{lo_} * (ln(1 + h.n * s.t_total::DOUBLE / "
                f"({mu} * (SELECT sum(n) FROM {hb}))) "
                f"+ ln({mu} / (dl.dl + {mu}))) AS c "
                f"FROM {hb} h JOIN dl ON dl.doc_id = h.doc_id "
                "CROSS JOIN stats s"
            )
            hw = f"q{qid}w{pi}"
            same = " AND a.i <> b.i" if a == b else ""
            ctes.append(
                f"{hw} AS (SELECT a.doc_id, count(*) AS n FROM tokpos a "
                f"JOIN tokpos b ON b.doc_id = a.doc_id AND b.term = '{b}' "
                f"AND abs(a.i - b.i) <= {w1}{same} "
                f"WHERE a.term = '{a}' GROUP BY a.doc_id)"
            )
            parts.append(
                f"SELECT {qid} AS query_id, h.doc_id, "
                f"{lu} * (ln(1 + h.n * s.t_total::DOUBLE / "
                f"({mu} * (SELECT sum(n) FROM {hw}))) "
                f"+ ln({mu} / (dl.dl + {mu}))) AS c "
                f"FROM {hw} h JOIN dl ON dl.doc_id = h.doc_id "
                "CROSS JOIN stats s"
            )
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS ts FROM documents), "
        "tok AS (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i "
        "FROM d), "
        "tokpos AS (SELECT doc_id, unnest(ts) AS term, "
        "unnest(range(1, len(ts) + 1)) AS i FROM d), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT sum(dl) AS t_total FROM dl), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
        "GROUP BY doc_id, term), "
        "cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY term), "
        f"q(query_id, term) AS (VALUES {uvals}), "
        "qd AS (SELECT DISTINCT query_id, term FROM q), "
        + ", ".join(ctes) + ", "
        "contrib AS (" + " UNION ALL ".join(parts) + "), "
        "scored AS (SELECT query_id, doc_id, sum(c) AS score "
        "FROM contrib GROUP BY query_id, doc_id) "
        "SELECT query_id, rank, doc_id, score FROM ("
        "SELECT query_id, doc_id, round(score, 6) AS score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored) "
        f"WHERE rank <= {k}"
    )


SQL_SDM_TOPK = _sdm_sql(_SDM_QUERIES)


from ._nsacc import export as _ns_export

_ns_export(globals())
del _ns_export
