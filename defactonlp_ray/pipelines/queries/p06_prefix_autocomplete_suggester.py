# Part 06/11 of the former single-module pipelines/queries.py
# (mechanical split, round 5 — VERDICT r04 next-round #6).  Parts share
# ONE late-bound namespace via _nsacc: globals are seeded from the
# accumulator before this body runs (preserving original top-level
# execution order) and the final merged namespace is injected back into
# every part by __init__, so call-time forward references behave exactly
# as in the single file.  Original lines 10556-12518.
from __future__ import annotations

from ._nsacc import NS as _ns_seed

globals().update(_ns_seed)
del _ns_seed



# --------------------------------------- prefix autocomplete (suggester)

_SUGGEST_PREFIXES: list[tuple[int, str]] = [
    (0, "s"),    # scan small slow sort spark stream ... (cap exercised)
    (1, "c"),    # customer column
    (2, "qu"),   # query
    (3, "b"),    # batch big
    (4, "zz"),   # no completion -> absent from output
]


def q_term_autocomplete(sf_dir: str):
    """Autocomplete/search-suggest (stages/expand.suggest_prefix): each
    prefix ranks its dictionary completions by collection frequency
    (cf DESC, term ASC), top-5.  The dictionary streams through a
    vectorized ``starts_with`` matcher with per-batch top-k combiners —
    the suggestion path never materializes the vocabulary."""
    from ...stages.expand import suggest_prefix

    idx = _build_docs_index(sf_dir)
    return suggest_prefix(idx, _SUGGEST_PREFIXES, k=5)


SQL_TERM_AUTOCOMPLETE = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY term), "
    "p(query_id, prefix) AS (VALUES "
    + ", ".join(f"({qid}, '{pre}')" for qid, pre in _SUGGEST_PREFIXES)
    + ") "
    "SELECT query_id, rank, term, cf FROM ("
    "SELECT p.query_id, CAST(row_number() OVER (PARTITION BY p.query_id "
    "ORDER BY cf.cf DESC, cf.term) AS INTEGER) AS rank, cf.term, cf.cf "
    "FROM p JOIN cf ON starts_with(cf.term, p.prefix)) "
    "WHERE rank <= 5 ORDER BY query_id, rank"
)


# --------------------------------------- did-you-mean spell suggester

_SPELL_TERMS: list[tuple[int, str]] = [
    # (query_id, typed term)
    (0, "spart"),   # OOV -> part, spark (multi-candidate df/term ranking)
    (1, "sow"),     # OOV -> row, slow
    (2, "merge"),   # in-vocab, no distance-1 neighbors -> no suggestion
    (3, "dup"),     # in-vocab LOW-df term, still no neighbors -> empty
    (4, "dap"),     # OOV -> dup (the one low-df dictionary term)
    (5, "kei"),     # OOV -> key
    (6, "zzz"),     # nothing within distance 1 -> empty
]


def q_spell_suggest(sf_dir: str):
    """Did-you-mean suggester (stages/expand.suggest_spelling, Lucene
    DirectSpellChecker SUGGEST_MORE_POPULAR): dictionary terms at
    Levenshtein distance exactly 1 with df strictly above the typed
    term's own df (0 when out-of-vocabulary), ranked (df DESC, term),
    top-3.  One streamed dictionary pass with the fuzzy expansion's
    vectorized byte-matrix distance kernel + per-batch top-k combiner."""
    from ...stages.expand import suggest_spelling

    idx = _build_docs_index(sf_dir)
    return suggest_spelling(idx, _SPELL_TERMS, k=3)


SQL_SPELL_SUGGEST = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "tf AS (SELECT doc_id, term FROM toks GROUP BY doc_id, term), "
    "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
    "q(query_id, qterm) AS (VALUES "
    + ", ".join(f"({qid}, '{t}')" for qid, t in _SPELL_TERMS)
    + "), "
    "qdf AS (SELECT q.query_id, q.qterm, coalesce(d.df, 0) AS self_df "
    "FROM q LEFT JOIN df d ON d.term = q.qterm), "
    "cand AS (SELECT qdf.query_id, d.term, d.df FROM qdf "
    "JOIN df d ON levenshtein(d.term, qdf.qterm) = 1 AND d.df > qdf.self_df) "
    "SELECT query_id, rank, suggestion, df FROM ("
    "SELECT query_id, term AS suggestion, df, "
    "CAST(row_number() OVER (PARTITION BY query_id "
    "ORDER BY df DESC, term) AS INTEGER) AS rank FROM cand) "
    "WHERE rank <= 3"
)


# ----------------------------- phrase suggester (whole-query rewrite)

_PHRASE_SUGGEST_QUERIES: list[tuple[int, list[str]]] = [
    (0, ["spart", "sow"]),    # both terms corrected, then collated
    (1, ["merge", "quer"]),   # one typo -> "merge query"
    (2, ["zzz", "data"]),     # uncorrectable term -> 0 hits -> pruned
    (3, ["dup"]),             # nothing to fix; collate keeps it
    (4, ["kei", "dap"]),      # -> "key dup": collate decides
]


def q_phrase_suggest(sf_dir: str):
    """Whole-query did-you-mean (stages/expand.suggest_phrase —
    Elasticsearch phrase-suggester shape): each typed term rewrites to
    its best more-popular distance-1 correction, and the rewrite is
    COLLATED against the index (conjunctive hit count; zero-hit
    rewrites pruned)."""
    from ...stages.expand import suggest_phrase

    idx = _build_docs_index(sf_dir)
    res = suggest_phrase(idx, _PHRASE_SUGGEST_QUERIES)
    return res.sort_values("query_id").reset_index(drop=True)


SQL_PHRASE_SUGGEST = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "tf AS (SELECT doc_id, term FROM toks GROUP BY doc_id, term), "
    "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
    "q(query_id, idx, term) AS (VALUES "
    + ", ".join(
        f"({qid}, {i}, '{t}')"
        for qid, terms in _PHRASE_SUGGEST_QUERIES
        for i, t in enumerate(terms)
    )
    + "), "
    "qdf AS (SELECT q.query_id, q.idx, q.term, coalesce(d.df, 0) AS self_df "
    "FROM q LEFT JOIN df d ON d.term = q.term), "
    "best AS (SELECT query_id, idx, term FROM ("
    "SELECT qdf.query_id, qdf.idx, d.term, "
    "row_number() OVER (PARTITION BY qdf.query_id, qdf.idx "
    "ORDER BY d.df DESC, d.term) AS rn FROM qdf "
    "JOIN df d ON levenshtein(d.term, qdf.term) = 1 AND d.df > qdf.self_df"
    ") WHERE rn = 1), "
    "rew AS (SELECT q.query_id, q.idx, coalesce(b.term, q.term) AS term "
    "FROM q LEFT JOIN best b ON b.query_id = q.query_id AND b.idx = q.idx), "
    "rstr AS (SELECT query_id, string_agg(term, ' ' ORDER BY idx) "
    "AS rewrite FROM rew GROUP BY query_id), "
    "rdist AS (SELECT DISTINCT query_id, term FROM rew), "
    "need AS (SELECT query_id, count(*) AS n FROM rdist GROUP BY query_id), "
    "hitcnt AS (SELECT r.query_id, tf.doc_id, count(*) AS c FROM rdist r "
    "JOIN tf ON tf.term = r.term GROUP BY r.query_id, tf.doc_id), "
    "cnt AS (SELECT h.query_id, count(*) AS n_hits FROM hitcnt h "
    "JOIN need n ON n.query_id = h.query_id WHERE h.c = n.n "
    "GROUP BY h.query_id) "
    "SELECT r.query_id, r.rewrite, c.n_hits FROM rstr r "
    "JOIN cnt c ON c.query_id = r.query_id"
)


# ------------------------------ faceted counts over retrieval results


def q_bm25_facets(sf_dir: str):
    """Composition entry: BM25 top-k -> semi-join with the corpus
    metadata (the top-k doc set broadcasts; the corpus STREAMS through
    one filtered map_batches pass — no shuffle) -> per-(query, source)
    facet counts.  The serving-side "refine by source" aggregation."""
    topk = q_bm25_topk(sf_dir)
    wanted = pa.array(sorted(set(topk["doc_id"].tolist())), pa.int64())

    def semi(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["doc_id"], value_set=wanted))

    meta = (
        _docs(sf_dir, ["doc_id", "source"])
        .map_batches(semi, batch_format="pyarrow")
        .to_pandas()
    )
    out = (
        topk.merge(meta, on="doc_id")
        .groupby(["query_id", "source"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["query_id", "source"]).reset_index(drop=True)


SQL_BM25_FACETS = (
    "WITH topk AS (" + SQL_BM25_TOPK + ") "
    "SELECT t.query_id, d.source, count(*) AS n "
    "FROM topk t JOIN documents d ON d.doc_id = t.doc_id "
    "GROUP BY t.query_id, d.source"
)


# -------------------------------- index fsck (CheckIndex-shaped)


def q_index_fsck(sf_dir: str):
    """Index integrity verification (stages/fsck.py, the Lucene
    CheckIndex shape): per-segment decode + invariant scan in parallel
    Ray tasks, dictionary/collection cross-checks from the index's own
    derived data.  The oracle recomputes the reported totals from the
    source corpus — proving the index's self-description (docstats,
    term_df, collection.json, posting payloads) still matches what was
    ingested, with zero errors."""
    from ...stages.fsck import fsck_index

    idx = _build_docs_index(sf_dir)
    return fsck_index(idx)


def q_index_segments(sf_dir: str):
    """Segment catalog (stages/fsck.segment_catalog, the _cat/segments
    ops surface): per-live-segment doc/term/posting/length totals from
    metadata-only reads.  The oracle rederives the build's contiguous
    range partitioning (sid = doc_id // seg_docs with the entry's
    seg_docs = max(256, n // 8)) straight from the corpus."""
    from ...stages.fsck import segment_catalog

    idx = _build_docs_index(sf_dir)
    return segment_catalog(idx)


SQL_INDEX_SEGMENTS = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "sd AS (SELECT doc_id, doc_id // greatest(256, "
    "(SELECT count(*) FROM documents) // 8) AS sid FROM documents), "
    "tfd AS (SELECT DISTINCT doc_id, term FROM toks), "
    "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
    "a AS (SELECT sid, count(*) AS n_docs FROM sd GROUP BY sid), "
    "b AS (SELECT sd.sid, count(DISTINCT tfd.term) AS n_terms, "
    "count(*) AS n_postings FROM sd JOIN tfd ON tfd.doc_id = sd.doc_id "
    "GROUP BY sd.sid), "
    "c AS (SELECT sd.sid, sum(dl.dl) AS total_len FROM sd "
    "JOIN dl ON dl.doc_id = sd.doc_id GROUP BY sd.sid) "
    "SELECT a.sid, a.n_docs, coalesce(b.n_terms, 0) AS n_terms, "
    "coalesce(b.n_postings, 0) AS n_postings, "
    "coalesce(c.total_len, 0)::BIGINT AS total_len "
    "FROM a LEFT JOIN b ON b.sid = a.sid LEFT JOIN c ON c.sid = a.sid"
)


SQL_INDEX_FSCK = (
    f"WITH toks AS ({_TOKS_SQL}) "
    # n_docs counts ALL indexed docs (docstats carries zero-token docs
    # too) — from documents, not toks, like SQL_INDEX_SEGMENTS
    "SELECT (SELECT count(*) FROM documents) AS n_docs, "
    "(SELECT count(DISTINCT term) FROM toks) AS n_terms, "
    "(SELECT count(*) FROM (SELECT DISTINCT doc_id, term FROM toks)) "
    "AS n_postings, "
    "(SELECT count(*) FROM toks) AS total_len, "
    "0 AS n_errors"
)


# ------------------------- Porter-stemmed analysis chain (index-time)


_MORPH_SUFFIXES = ("ing", "ed", "s", "")  # picked by (doc_id + pos) % 4


def _stem_fp_tag() -> str:
    """Cache-key tag for the stemmed oracle: derived from the stemmer
    version AND the morph rule, so bumping either regenerates the
    cached SQL (the pinning contract in functions/stemmer.py)."""
    from ...functions.stemmer import STEMMER_VERSION

    return STEMMER_VERSION + "-morph:" + ",".join(_MORPH_SUFFIXES)


def _morph_docs(sf_dir: str):
    """Derive a MORPHOLOGICAL corpus from ``documents`` (the canonical
    tables carry no inflection, so — like url_dedup's derived crawl
    table — the entry synthesizes one deterministically): token at
    0-based position ``i`` of doc ``d`` gains suffix
    ``_MORPH_SUFFIXES[(d + i) % 4]``.  Stemming then CONFLATES the
    variants back (query/querys/queryed/querying -> queri), so the
    entry exercises real vocabulary collapse, not a renaming."""
    from ...functions.tokenizer import term_position_table

    def morph(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        occ, dl = term_position_table(batch["text"], batch["doc_id"])
        k = (
            occ["doc_id"].to_numpy(zero_copy_only=False)
            + occ["pos"].to_numpy(zero_copy_only=False)
        ) % 4
        suf = pa.array(
            np.array(_MORPH_SUFFIXES, dtype=object)[k], pa.string()
        )
        terms = pc.binary_join_element_wise(occ["term"], suf, "")
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        offsets = np.zeros(dl.size + 1, dtype=np.int32)
        np.cumsum(dl, out=offsets[1:])
        lists = pa.ListArray.from_arrays(pa.array(offsets), terms)
        return pa.table({
            "doc_id": batch["doc_id"],
            "text": pc.binary_join(lists, " "),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        morph, batch_format="pyarrow"
    )


def q_stemmed_topk(sf_dir: str):
    """BM25 over a Porter-stemmed corpus (functions/stemmer.py — the
    pinned porter-v1 analysis chain, applied at the vocabulary level
    per batch): the derived morphological corpus (see
    :func:`_morph_docs`) is rewritten token-by-token through
    ``porter_stem``, a NORMAL index is built over the stemmed text, and
    query terms stem with the same function — the classic index-time
    analyzer expressed as a Dataset transform, composing with every
    existing index op."""
    from ...functions.stemmer import porter_stem, stem_corpus

    idx = _tmp_index_dir(sf_dir, "idxstem2")
    docs = stem_corpus(_morph_docs(sf_dir))
    n = docs.count()
    build_index(docs, idx, seg_docs=max(256, n // 8), resume=True)
    stemmed = [
        (qid, sorted({porter_stem(t) for t in terms}))
        for qid, terms in _BM25_QUERIES
    ]
    res = search(
        idx, _query_terms_ds(stemmed), k=20, concurrency=2
    ).to_pandas()
    return _rerank_rounded(res, k=10)


def _stemmed_topk_sql() -> str:
    """Stemmed-retrieval oracle: the PINNED stemmer supplies only a
    (term -> stem) VALUES map over the morphed oracle-corpus vocabulary
    (base terms x the four suffixes); the morphological derivation,
    token mapping, tf/df/dl recomputation and BM25 scoring all happen
    independently in SQL downstream of the map (the same pinning
    boundary the tokenizer has)."""
    from ...functions.stemmer import porter_stem
    from ...functions.tokenizer import tokenize
    from ..pinned import _sf_docs

    vocab = sorted({t for txt in _sf_docs().values() for t in tokenize(txt)})
    morphed = sorted({t + s for t in vocab for s in _MORPH_SUFFIXES})
    map_vals = ", ".join(f"('{t}', '{porter_stem(t)}')" for t in morphed)
    suffix_case = (
        "CASE CAST((m.doc_id + m.i) % 4 AS INTEGER) "
        "WHEN 0 THEN 'ing' WHEN 1 THEN 'ed' WHEN 2 THEN 's' ELSE '' END"
    )
    toks_sql = (
        "SELECT m.doc_id, sm.stem AS term FROM ("
        "SELECT doc_id, term || " + suffix_case + " AS term FROM ("
        "SELECT doc_id, unnest(ts) AS term, "
        "unnest(range(0, len(ts))) AS i FROM ("
        "SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS ts FROM documents)) m) m "
        f"JOIN (VALUES {map_vals}) AS sm(term, stem) ON sm.term = m.term"
    )
    stemmed = [
        (qid, sorted({porter_stem(t) for t in terms}))
        for qid, terms in _BM25_QUERIES
    ]
    return _bm25_sql(stemmed, toks_sql=toks_sql)


# ---------------------- federated / cross-cluster search (MultiReader)


def q_federated_topk(sf_dir: str):
    """Federated search over two INDEPENDENTLY built shard indexes
    (stages/search.FederatedSearcherActor — the Lucene MultiReader /
    cross-cluster shape): documents split by doc_id into two shards,
    each builds its own index with zero cross-shard coordination;
    serving combines global stats (df summed, avgdl from summed
    lengths) so ranking is bit-identical to one unified index — the
    oracle IS the plain single-index exact-BM25 SQL."""
    from ...stages.search import federated_search

    docs = _docs(sf_dir, ["doc_id", "text"])
    n = docs.count()
    cut = n // 2
    dirs = []
    for part, pred in (("lo", f"doc_id < {cut}"), ("hi", f"doc_id >= {cut}")):
        idx = _tmp_index_dir(sf_dir, f"idxfed-{part}")
        shard = docs.filter(expr=pred)
        build_index(shard, idx, seg_docs=max(128, n // 8), resume=True)
        dirs.append(idx)
    res = federated_search(
        dirs, _query_terms_ds(_BM25_QUERIES), k=20, concurrency=2
    ).to_pandas()
    return _rerank_rounded(res, k=10)


# oracle: federation must equal the unified single index exactly
SQL_FEDERATED_TOPK = _bm25_sql(_BM25_QUERIES)


# ----------------------------------- boosted term queries (BoostQuery)

_BOOSTED_QUERIES: list[tuple[int, list[tuple[str, float]]]] = [
    # (query_id, [(term, boost)]); boosts are exact binary floats
    (0, [("data", 2.0), ("query", 1.0)]),
    (1, [("merge", 0.5), ("sort", 4.0)]),
    (2, [("dup", 8.0), ("the", 1.0)]),     # rare term dominated by boost
    (3, [("zzz", 2.0)]),                   # absent term -> empty
    (4, [("slow", 1.0), ("scan", 1.0)]),   # boost=1 == plain BM25
]


def q_boosted_topk(sf_dir: str):
    """Query-time term boosts (Lucene BoostQuery, stages/search.py
    BoostedSearcherActor): score = sum of boost * idf * w per matched
    term — implemented as exact TAAT with a boost-scaled idf map, so a
    boost=1 query is bit-identical to plain BM25."""
    from ...stages.search import boosted_search

    idx = _build_docs_index(sf_dir)
    qds = ray.data.from_arrow(pa.table({
        "query_id": pa.array([q for q, _ in _BOOSTED_QUERIES], pa.int64()),
        "terms": pa.array(
            [[t for t, _ in pairs] for _, pairs in _BOOSTED_QUERIES],
            pa.list_(pa.string()),
        ),
        "boosts": pa.array(
            [[b for _, b in pairs] for _, pairs in _BOOSTED_QUERIES],
            pa.list_(pa.float64()),
        ),
    }))
    res = boosted_search(idx, qds, k=20, concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


SQL_BOOSTED_TOPK = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
    "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term), "
    "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
    "q(query_id, term, boost) AS (VALUES "
    + ", ".join(
        f"({qid}, '{t}', {b})" for qid, pairs in _BOOSTED_QUERIES
        for t, b in pairs
    )
    + "), "
    "scored AS (SELECT q.query_id, tf.doc_id, "
    "sum(q.boost * ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * "
    "(tf.tf * 2.2) / "
    "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
    ") AS score FROM q JOIN tf ON q.term = tf.term "
    "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
    "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id) "
    "SELECT query_id, rank, doc_id, score FROM ("
    "SELECT query_id, doc_id, round(score, 6) AS score, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
    "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored) "
    "WHERE rank <= 10"
)


# ------------------------------- rescore window (weighted-sum rescorer)

_RESCORE_WINDOW = 30
_RESCORE_W = 8.0  # rescore_query_weight (exact binary float)


def q_bm25_rescore(sf_dir: str):
    """Query rescorer (Elasticsearch rescore / Lucene QueryRescorer,
    score_mode=total): the cheap lexical pass ranks everything, then
    ONLY the top-``_RESCORE_WINDOW`` window per query is re-scored by an
    expensive secondary model — here dense cosine against the query
    vector (the classic vector-rescore) — and re-ranked by
    ``round(bm25 + w * cosine, 6)``.  Queries pair BM25 term sets 0-2
    with embedding rows 0-2 (documents and embeddings are row-aligned).

    Scale shape: the window doc-id set broadcasts; the embeddings table
    STREAMS through one ``is_in``-filtered pass so only O(queries x
    window) vectors are fetched — the corpus-sized matmul of the brute
    ANN path never happens."""
    from ...stages.search import search

    idx = _build_docs_index(sf_dir)
    prim = _rerank_rounded(
        search(
            idx, _query_terms_ds(_BM25_QUERIES[:3]),
            k=2 * _RESCORE_WINDOW, concurrency=2,
        ).to_pandas(),
        k=_RESCORE_WINDOW,
    )
    wanted = pa.array(sorted(set(prim["doc_id"].tolist())), pa.int64())

    def semi(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["vec_id"], value_set=wanted))

    emb = (
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(semi, batch_format="pyarrow")
        .to_pandas()
    )
    m = np.array(emb["embedding"].tolist(), dtype=np.float64)
    mn = np.linalg.norm(m, axis=1)
    mn[mn == 0] = 1.0
    q = _query_vectors(sf_dir, 3)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    # same expression order as ann.knn_brute (bit-compatible at round-6)
    cos = np.round((q @ m.T) / qn[:, None] / mn[None, :], 6)
    vec_pos = {int(v): j for j, v in enumerate(emb["vec_id"])}
    # a window doc with no embedding row drops out of the rescored
    # ranking (the oracle's inner join) rather than erroring
    pos = prim["doc_id"].map(vec_pos)
    prim = prim[pos.notna()].reset_index(drop=True)
    di = pos.dropna().to_numpy(np.int64)
    qi = prim["query_id"].to_numpy(np.int64)
    prim["score"] = np.round(
        prim["score"].to_numpy() + _RESCORE_W * cos[qi, di], 6
    )
    return _rerank_rounded(prim, k=10)


SQL_BM25_RESCORE = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
    "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term), "
    "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
    "q(query_id, term) AS (VALUES "
    + ", ".join(f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES[:3] for t in terms)
    + "), "
    "scored AS (SELECT q.query_id, tf.doc_id, "
    "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
    "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
    ") AS score FROM q JOIN tf ON q.term = tf.term "
    "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
    "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id), "
    "win AS (SELECT query_id, doc_id, score FROM ("
    "SELECT query_id, doc_id, round(score, 6) AS score, "
    "row_number() OVER (PARTITION BY query_id ORDER BY round(score, 6) DESC, "
    f"doc_id) AS rank FROM scored) WHERE rank <= {_RESCORE_WINDOW}), "
    "qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS v "
    "FROM embeddings WHERE vec_id < 3), "
    "resc AS (SELECT w.query_id, w.doc_id, round(w.score + "
    f"{_RESCORE_W} * round(list_cosine_similarity(qv.v, "
    "e.embedding::DOUBLE[]), 6), 6) AS score FROM win w "
    "JOIN qv ON qv.query_id = w.query_id "
    "JOIN embeddings e ON e.vec_id = w.doc_id) "
    "SELECT query_id, rank, doc_id, score FROM ("
    "SELECT query_id, doc_id, score, "
    "CAST(row_number() OVER (PARTITION BY query_id "
    "ORDER BY score DESC, doc_id) AS INTEGER) AS rank FROM resc) "
    "WHERE rank <= 10"
)


# --------------------------- MMR result diversification (re-rank)

_MMR_LAMBDA = 0.5  # exact binary float (pinned float policy)
_MMR_WINDOW = 30
_MMR_K = 10


def q_bm25_mmr(sf_dir: str):
    """Maximal Marginal Relevance diversification (Carbonell &
    Goldstein, SIGIR 1998 — the standard duplicate-suppressing
    re-ranker): the BM25 top-``_MMR_WINDOW`` window is greedily
    re-ordered by ``lam * rel(d) - (1 - lam) * max_{s in S} sim(d, s)``
    (cosine over the docs' embedding vectors), ties ``(obj DESC,
    doc_id)``; first pick has no similarity penalty.  Same window
    composition as the rescore entry: window doc-ids broadcast, the
    embeddings table streams through one ``is_in``-filtered pass; the
    O(window²) similarity matrix is per query, never corpus-sized.
    Oracle: the committed output of the single-process reference
    (pinned.serial_bm25_mmr — pure-Python oracle-index BM25, same
    pinned cosine/objective spec)."""
    from ...stages.search import search

    idx = _build_docs_index(sf_dir)
    prim = _rerank_rounded(
        search(
            idx, _query_terms_ds(_BM25_QUERIES[:3]),
            k=2 * _MMR_WINDOW, concurrency=2,
        ).to_pandas(),
        k=_MMR_WINDOW,
    )
    wanted = pa.array(sorted(set(prim["doc_id"].tolist())), pa.int64())

    def semi(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["vec_id"], value_set=wanted))

    emb = (
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(semi, batch_format="pyarrow")
        .to_pandas()
    )
    vec = {
        int(v): np.asarray(e, dtype=np.float64)
        for v, e in zip(emb["vec_id"], emb["embedding"])
    }
    out = []
    for qid, g in prim.groupby("query_id"):
        g = g.sort_values(["score", "doc_id"], ascending=[False, True])
        win = [(float(r.score), int(r.doc_id)) for r in g.itertuples()
               if int(r.doc_id) in vec]
        if not win:
            continue
        rel = {d: s for s, d in win}
        ids = [d for _s, d in win]
        m = np.stack([vec[d] for d in ids])
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        sim = np.round((m @ m.T) / n[:, None] / n[None, :], 6)
        for rank, d, score in ann.mmr_select(
            rel, ids, sim, _MMR_K, _MMR_LAMBDA
        ):
            out.append({
                "query_id": int(qid), "rank": rank, "doc_id": d,
                "score": score,
            })
    res = pd.DataFrame(
        out, columns=["query_id", "rank", "doc_id", "score"]
    )
    res["query_id"] = res["query_id"].astype(np.int64)
    res["rank"] = res["rank"].astype(np.int32)
    res["doc_id"] = res["doc_id"].astype(np.int64)
    return res[["query_id", "rank", "doc_id", "score"]]


_PM2_WINDOW = 20


def q_bm25_pm2(sf_dir: str):
    """PM-2 proportional diversification (Dang & Croft, WSDM 2012 —
    the seat-allocation diversifier, the proportionality-based
    counterpart to MMR's similarity penalty): the BM25 top-20 window
    re-ordered so result slots are apportioned across the docs'
    ``source`` aspects by Sainte-Laguë quotients (stages/ann.pm2_select
    — the shared pinned kernel; lam = 0.7, uniform aspect popularity,
    binary single-aspect membership).  Window doc-ids broadcast; the
    documents table streams one ``is_in``-filtered pass for the aspect
    column.  Oracle: committed output of the single-process reference
    (pinned.serial_bm25_pm2: pure-Python oracle-index BM25 window,
    same kernel)."""
    from ...stages.ann import pm2_select
    from ...stages.search import search

    idx = _build_docs_index(sf_dir)
    prim = _rerank_rounded(
        search(
            idx, _query_terms_ds(_BM25_QUERIES[:4]),
            k=2 * _PM2_WINDOW, concurrency=2,
        ).to_pandas(),
        k=_PM2_WINDOW,
    )
    wanted = pa.array(sorted(set(prim["doc_id"].tolist())), pa.int64())

    def semi(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["doc_id"], value_set=wanted))

    src = (
        _docs(sf_dir, ["doc_id", "source"])
        .map_batches(semi, batch_format="pyarrow")
        .to_pandas()
    )
    amap = {int(d): str(s) for d, s in zip(src["doc_id"], src["source"])}
    out = []
    for qid, g in prim.groupby("query_id"):
        g = g.sort_values(["score", "doc_id"], ascending=[False, True])
        win = [(float(r.score), int(r.doc_id)) for r in g.itertuples()]
        for rank, d, a, obj in pm2_select(win, amap, 10):
            out.append({
                "query_id": int(qid), "rank": rank, "doc_id": d,
                "source": a, "obj": obj,
            })
    res = pd.DataFrame(
        out, columns=["query_id", "rank", "doc_id", "source", "obj"]
    )
    res["query_id"] = res["query_id"].astype(np.int64)
    res["rank"] = res["rank"].astype(np.int32)
    res["doc_id"] = res["doc_id"].astype(np.int64)
    return res


_ALPHA_NDCG = 0.5


def q_diversity_eval(sf_dir: str):
    """Intent-aware diversity evaluation of the BM25 run (the metrics
    the PM-2 entry exists to move): per query over the top-10 with
    aspect = the doc's ``source``,

    * ``s_recall`` — subtopic recall@10 (Zhai, Cohen & Lafferty, SIGIR
      2003): distinct aspects retrieved / distinct aspects in the
      corpus;
    * ``alpha_ndcg`` — alpha-nDCG@10 (Clarke et al., SIGIR 2008;
      alpha = 0.5): gain at rank r is (1-alpha)^(same-aspect docs
      above r), discounted by log2(r+1), normalized by the PINNED
      ideal of round-robin aspect rotation with unlimited docs per
      aspect (ideal gain at rank r = (1-alpha)^floor((r-1)/A)) — the
      deterministic ideal the cross-engine gate needs (the true
      greedy ideal depends on per-aspect availability).

    One bounded top-k + one is_in-filtered aspect attach; A comes from
    a tiny distinct aggregate."""
    topk = q_bm25_topk(sf_dir)
    wanted = pa.array(sorted(set(topk["doc_id"].tolist())), pa.int64())

    def semi(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["doc_id"], value_set=wanted))

    src = (
        _docs(sf_dir, ["doc_id", "source"])
        .map_batches(semi, batch_format="pyarrow")
        .to_pandas()
    )
    amap = {int(d): str(s) for d, s in zip(src["doc_id"], src["source"])}
    n_aspects = int(
        _docs(sf_dir, ["source"]).groupby("source").count().count()
    )
    out_q, out_s, out_a = [], [], []
    a1 = 1.0 - _ALPHA_NDCG
    for qid, g in topk.groupby("query_id"):
        g = g.sort_values("rank")
        seen: dict[str, int] = {}
        dcg = 0.0
        idcg = 0.0
        aspects = set()
        for r, d in zip(g["rank"], g["doc_id"]):
            a = amap[int(d)]
            prior = seen.get(a, 0)
            seen[a] = prior + 1
            aspects.add(a)
            dcg += (a1 ** prior) / math.log2(r + 1)
            idcg += (a1 ** ((r - 1) // n_aspects)) / math.log2(r + 1)
        out_q.append(int(qid))
        out_s.append(round(len(aspects) / n_aspects, 6))
        out_a.append(round(dcg / idcg, 6) if idcg > 0 else 0.0)
    return pd.DataFrame({
        "query_id": out_q, "s_recall": out_s, "alpha_ndcg": out_a,
    })


def _sql_diversity_eval(k: int = 10) -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    a1 = 1.0 - _ALPHA_NDCG
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
        "GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "scored AS (SELECT q.query_id, tf.doc_id, "
        "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
        "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
        ") AS score FROM q JOIN tf ON q.term = tf.term "
        "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id), "
        "na AS (SELECT count(DISTINCT source) AS a FROM documents), "
        "topk AS (SELECT query_id, doc_id, rank FROM ("
        "SELECT query_id, doc_id, CAST(row_number() OVER ("
        "PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id) "
        f"AS INTEGER) AS rank FROM scored) WHERE rank <= {k}), "
        "tka AS (SELECT t.query_id, t.rank, d.source, "
        "CAST(row_number() OVER (PARTITION BY t.query_id, d.source "
        "ORDER BY t.rank) - 1 AS DOUBLE) AS prior "
        "FROM topk t JOIN documents d ON d.doc_id = t.doc_id), "
        "ev AS (SELECT tka.query_id, "
        f"sum(power({a1}, prior) / log2(rank + 1)) AS dcg, "
        f"sum(power({a1}, floor((rank - 1.0) / na.a)) / log2(rank + 1)) "
        "AS idcg, count(DISTINCT source) AS n_src "
        "FROM tka CROSS JOIN na GROUP BY 1) "
        "SELECT ev.query_id, "
        "round(ev.n_src::DOUBLE / na.a, 6) AS s_recall, "
        "round(ev.dcg / ev.idcg, 6) AS alpha_ndcg "
        "FROM ev CROSS JOIN na ORDER BY ev.query_id"
    )


# -------------------------------------- sort-by-field retrieval (dl)


def q_sort_by_field(sf_dir: str):
    """Sort-by-field retrieval (Lucene SortField / Elasticsearch sort):
    the match set (union of query-term postings — same candidates as
    ``mode='count'``) ordered by the stored doc-length doc-value
    ``(dl DESC, doc_id ASC)`` instead of relevance
    (stages/search.score_all_sortfield — dl already rides in every
    posting for BM25 normalization, so no doc-store lookup)."""
    from ...stages.search import search

    idx = _build_docs_index(sf_dir)
    res = search(
        idx, _query_terms_ds(_BM25_QUERIES), k=10, mode="sortfield",
        concurrency=2,
    ).to_pandas()
    res = res.rename(columns={"score": "dl"})
    res["dl"] = res["dl"].astype(np.int64)
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


SQL_SORT_BY_FIELD = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
    "q(query_id, term) AS (VALUES "
    + ", ".join(f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms)
    + "), "
    "m AS (SELECT DISTINCT q.query_id, toks.doc_id FROM q "
    "JOIN toks ON toks.term = q.term) "
    "SELECT query_id, rank, doc_id, dl FROM ("
    "SELECT m.query_id, m.doc_id, dl.dl, "
    "CAST(row_number() OVER (PARTITION BY m.query_id "
    "ORDER BY dl.dl DESC, m.doc_id) AS INTEGER) AS rank "
    "FROM m JOIN dl ON dl.doc_id = m.doc_id) WHERE rank <= 10"
)


def q_bm25_function_score(sf_dir: str):
    """function_score / field_value_factor (Elasticsearch): BM25
    relevance multiplied by ``ln(1 + dl)`` over the stored doc-length
    doc-value (stages/search.score_all_fvf).  The factor is per-doc and
    multiplicative, so the scorer folds it in BEFORE the bounded top-k
    (a post-hoc rescale of plain-BM25 top-k would rank differently —
    Lucene's FunctionScoreQuery wraps the inner scorer the same way)."""
    from ...stages.search import search

    idx = _build_docs_index(sf_dir)
    res = search(
        idx, _query_terms_ds(_BM25_QUERIES), k=20, mode="fvf", concurrency=2
    ).to_pandas()
    return _rerank_rounded(res, k=10)


SQL_BM25_FUNCTION_SCORE = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
    "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term), "
    "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
    "q(query_id, term) AS (VALUES "
    + ", ".join(f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms)
    + "), "
    "scored AS (SELECT q.query_id, tf.doc_id, "
    "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
    "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
    ") AS score FROM q JOIN tf ON q.term = tf.term "
    "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
    "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id), "
    "fs AS (SELECT sc.query_id, sc.doc_id, sc.score * ln(1 + dl.dl) AS score "
    "FROM scored sc JOIN dl ON dl.doc_id = sc.doc_id) "
    "SELECT query_id, rank, doc_id, score FROM ("
    "SELECT query_id, doc_id, round(score, 6) AS score, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
    "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM fs) "
    "WHERE rank <= 10"
)


# Elasticsearch gauss-decay function_score over the doc-length doc-value:
# origin/scale pinned so the decay is meaningful on this corpus (~45-token
# docs).  A recency decay over warc_ts rides the identical scorer — the
# doc-value slot is the only difference.
_DECAY_ORIGIN = 40.0
_DECAY_SCALE = 15.0


def q_bm25_decay(sf_dir: str):
    """function_score gauss DECAY (Elasticsearch ``gauss`` on a numeric
    doc-value): BM25 × exp(-(dl - origin)² / (2·scale²)), folded into the
    scorer BEFORE the bounded top-k (stages/search.score_all_fvf with
    modifier='gauss') — the standard recency/length-decay ranking shape."""
    from ...stages.search import search

    idx = _build_docs_index(sf_dir)
    res = search(
        idx, _query_terms_ds(_BM25_QUERIES), k=20, mode="decay",
        decay_origin=_DECAY_ORIGIN, decay_scale=_DECAY_SCALE, concurrency=2,
    ).to_pandas()
    return _rerank_rounded(res, k=10)


SQL_BM25_DECAY = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
    "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term), "
    "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
    "q(query_id, term) AS (VALUES "
    + ", ".join(f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms)
    + "), "
    "scored AS (SELECT q.query_id, tf.doc_id, "
    "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
    "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
    ") AS score FROM q JOIN tf ON q.term = tf.term "
    "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
    "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id), "
    "fs AS (SELECT sc.query_id, sc.doc_id, sc.score * "
    f"exp(-pow(dl.dl - {_DECAY_ORIGIN}, 2) / (2 * {_DECAY_SCALE} * {_DECAY_SCALE}))"
    " AS score FROM scored sc JOIN dl ON dl.doc_id = sc.doc_id) "
    "SELECT query_id, rank, doc_id, score FROM ("
    "SELECT query_id, doc_id, round(score, 6) AS score, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
    "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM fs) "
    "WHERE rank <= 10"
)


_RANGE_MIN, _RANGE_MAX = 30.0, 80.0


def q_bm25_range_filter(sf_dir: str):
    """Elasticsearch FILTER-context range query composed with match
    scoring: only docs whose token-count doc-value lies in the
    inclusive [30, 80] band may rank — a hard candidate PRE-filter
    inside the scorer (stages/search.score_all_fvf modifier='range',
    applied BEFORE the bounded top-k), never a post-filter of a short
    page, so a band-heavy corpus can still fill all k slots."""
    from ...stages.search import search

    idx = _build_docs_index(sf_dir)
    res = search(
        idx, _query_terms_ds(_BM25_QUERIES), k=20, mode="range_filter",
        decay_origin=_RANGE_MIN, decay_scale=_RANGE_MAX, concurrency=2,
    ).to_pandas()
    return _rerank_rounded(res, k=10)


SQL_BM25_RANGE_FILTER = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
    "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term), "
    "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
    "q(query_id, term) AS (VALUES "
    + ", ".join(f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms)
    + "), "
    "scored AS (SELECT q.query_id, tf.doc_id, "
    "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
    "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
    ") AS score FROM q JOIN tf ON q.term = tf.term "
    "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
    "CROSS JOIN stats s "
    f"WHERE dl.dl BETWEEN {_RANGE_MIN} AND {_RANGE_MAX} "
    "GROUP BY q.query_id, tf.doc_id) "
    "SELECT query_id, rank, doc_id, score FROM ("
    "SELECT query_id, doc_id, round(score, 6) AS score, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
    "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored) "
    "WHERE rank <= 10"
)


_RM3_FB_DOCS = 10
_RM3_FB_TERMS = 3
_RM3_BOOST = 0.4


def q_bm25_rm3_topk(sf_dir: str):
    """RM3 pseudo-relevance feedback (Lavrenko & Croft SIGIR 2001
    relevance models; the Anserini/Indri RM3 default shape): two-pass
    retrieval —

    1. BM25 top-10 per query (round-6 reranked scores, the pinned
       cross-engine policy);
    2. feedback term weight ``fw(q, t) = sum_{d in top10(q)}
       tf(t, d) / dl(d) * score(q, d)`` over the feedback docs' terms;
       the top-3 terms by (round(fw, 6) DESC, term ASC) NOT already in
       the query become expansion terms;
    3. re-query with the original terms at boost 1.0 plus the expansion
       terms at boost 0.4 through the boosted scorer
       (score = sum boost * idf * w).

    The feedback doc set is bounded (queries x 10), so its texts gather
    via one broadcast semi-join pass over the streaming corpus — the
    corpus is never materialized; pass 2's arithmetic runs on <= 80
    rows."""
    from ...stages.search import boosted_search

    idx = _build_docs_index(sf_dir)
    res = search(idx, _query_terms_ds(_BM25_QUERIES), k=20,
                 concurrency=2).to_pandas()
    top1 = _rerank_rounded(res, k=_RM3_FB_DOCS)

    wanted = pa.array(sorted(set(top1["doc_id"].tolist())), pa.int64())

    def semi(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["doc_id"], value_set=wanted))

    fb_docs = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(semi, batch_format="pyarrow")
        .to_pandas()
    )
    tf_tbl, doc_len = term_count_table(
        pa.array(fb_docs["text"]), pa.array(fb_docs["doc_id"], pa.int64())
    )
    dl_map = dict(zip(fb_docs["doc_id"], doc_len))
    tf_pd = tf_tbl.to_pandas()
    tf_pd["dl"] = tf_pd["doc_id"].map(dl_map)
    merged = tf_pd.merge(
        top1[["query_id", "doc_id", "score"]], on="doc_id"
    )
    merged["fw"] = merged["tf"] / merged["dl"] * merged["score"]
    fw = (
        merged.groupby(["query_id", "term"], as_index=False)["fw"].sum()
    )
    fw["fw"] = np.round(fw["fw"], 6)
    orig = {qid: set(ts) for qid, ts in _BM25_QUERIES}
    fw = fw[~fw.apply(lambda r: r["term"] in orig[r["query_id"]], axis=1)]
    fw = fw.sort_values(["query_id", "fw", "term"],
                        ascending=[True, False, True])
    exp = fw.groupby("query_id").head(_RM3_FB_TERMS)
    exp_map = exp.groupby("query_id")["term"].apply(list).to_dict()

    qids, terms2, boosts2 = [], [], []
    for qid, ts in _BM25_QUERIES:
        e = exp_map.get(qid, [])
        qids.append(qid)
        terms2.append(list(ts) + e)
        boosts2.append([1.0] * len(ts) + [_RM3_BOOST] * len(e))
    q2 = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "terms": pa.array(terms2, pa.list_(pa.string())),
                "boosts": pa.array(boosts2, pa.list_(pa.float64())),
            }
        )
    )
    res2 = boosted_search(idx, q2, k=20, concurrency=2).to_pandas()
    return _rerank_rounded(res2, k=10)


SQL_BM25_RM3_TOPK = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
    "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term), "
    "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
    "q(query_id, term) AS (VALUES "
    + ", ".join(f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms)
    + "), "
    "scored1 AS (SELECT q.query_id, tf.doc_id, "
    "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
    "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
    ") AS score FROM q JOIN tf ON q.term = tf.term "
    "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
    "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id), "
    "top1 AS (SELECT query_id, doc_id, score FROM ("
    "SELECT query_id, doc_id, round(score, 6) AS score, "
    "row_number() OVER (PARTITION BY query_id ORDER BY round(score, 6) "
    f"DESC, doc_id) AS rn FROM scored1) WHERE rn <= {_RM3_FB_DOCS}), "
    "fw AS (SELECT t1.query_id, tf.term, "
    "round(sum(tf.tf::DOUBLE / dl.dl * t1.score), 6) AS fw "
    "FROM top1 t1 JOIN tf ON tf.doc_id = t1.doc_id "
    "JOIN dl ON dl.doc_id = t1.doc_id GROUP BY t1.query_id, tf.term), "
    "exp AS (SELECT query_id, term FROM ("
    "SELECT f.query_id, f.term, row_number() OVER ("
    "PARTITION BY f.query_id ORDER BY f.fw DESC, f.term) AS rn FROM fw f "
    "WHERE NOT EXISTS (SELECT 1 FROM q WHERE q.query_id = f.query_id "
    f"AND q.term = f.term)) WHERE rn <= {_RM3_FB_TERMS}), "
    "q2(query_id, term, boost) AS ("
    "SELECT query_id, term, 1.0 FROM q "
    f"UNION ALL SELECT query_id, term, {_RM3_BOOST} FROM exp), "
    "scored2 AS (SELECT q2.query_id, tf.doc_id, "
    "sum(q2.boost * ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * "
    "(tf.tf * 2.2) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / "
    "(s.total::DOUBLE / s.n_docs)))) AS score "
    "FROM q2 JOIN tf ON q2.term = tf.term "
    "JOIN df ON df.term = q2.term JOIN dl ON dl.doc_id = tf.doc_id "
    "CROSS JOIN stats s GROUP BY q2.query_id, tf.doc_id) "
    "SELECT query_id, rank, doc_id, score FROM ("
    "SELECT query_id, doc_id, round(score, 6) AS score, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
    "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored2) "
    "WHERE rank <= 10"
)


_BO1_FB_DOCS = 10
_BO1_FB_TERMS = 3
_BO1_BOOST = 0.4


def q_bm25_bo1_topk(sf_dir: str):
    """Bo1 pseudo-relevance expansion (Amati's Bose-Einstein 1 model —
    Terrier's default query expansion; the DFR-side PRF next to RM3):
    same two-pass shape as ``bm25_rm3_topk`` but the feedback weight is

        fw(q, t) = tfx * log2((1 + Pn) / Pn) + log2(1 + Pn)

    with tfx = the term's total tf over the query's top-10 docs and
    Pn = cf_t / T (the collection prior) — informativeness against the
    collection model rather than RM3's relevance-model mass.  Top-3
    non-query terms by (round(fw, 6) DESC, term) join the re-query at
    boost 0.4.  The collection cf for the (bounded) feedback
    vocabulary arrives via one broadcast-filtered combiner pass with a
    token-total sentinel."""
    from ...stages.search import boosted_search

    idx = _build_docs_index(sf_dir)
    res = search(idx, _query_terms_ds(_BM25_QUERIES), k=20,
                 concurrency=2).to_pandas()
    top1 = _rerank_rounded(res, k=_BO1_FB_DOCS)
    wanted = pa.array(sorted(set(top1["doc_id"].tolist())), pa.int64())

    def semi(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["doc_id"], value_set=wanted))

    fb_docs = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(semi, batch_format="pyarrow")
        .to_pandas()
    )
    tf_tbl, _dl = term_count_table(
        pa.array(fb_docs["text"]), pa.array(fb_docs["doc_id"], pa.int64())
    )
    tf_pd = tf_tbl.to_pandas()
    merged = tf_pd.merge(top1[["query_id", "doc_id"]], on="doc_id")
    tfx = merged.groupby(["query_id", "term"], as_index=False)["tf"].sum()
    needed = pa.array(sorted(set(tfx["term"])), pa.string())

    def cf_part(batch: pa.Table) -> pa.Table:
        tf, dl = term_count_table(batch["text"], batch["doc_id"])
        kept = tf.filter(pc.is_in(tf["term"], value_set=needed))
        agg = pa.table({
            "term": kept["term"],
            "cf_p": pc.cast(kept["tf"], pa.int64()),
        }).group_by("term").aggregate([("cf_p", "sum")])
        agg = agg.rename_columns(["term", "cf_p"])
        tot = pa.table({
            "term": pa.array(["\x00total"], pa.string()),
            "cf_p": pa.array([int(dl.sum())], pa.int64()),
        })
        return pa.concat_tables([agg, tot])

    cfd = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(cf_part, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cf_p", alias_name="cf"))
        .to_pandas()
    )
    total = int(cfd.loc[cfd["term"] == "\x00total", "cf"].iloc[0])
    cfmap = {
        t: int(c) for t, c in zip(cfd["term"], cfd["cf"])
        if t != "\x00total"
    }
    ln2 = math.log(2.0)
    rows = []
    for r in tfx.itertuples():
        pn = cfmap[r.term] / total
        fwv = r.tf * (math.log((1 + pn) / pn) / ln2) + math.log(1 + pn) / ln2
        rows.append((r.query_id, r.term, round(fwv, 6)))
    fw = pd.DataFrame(rows, columns=["query_id", "term", "fw"])
    orig = {qid: set(ts) for qid, ts in _BM25_QUERIES}
    fw = fw[~fw.apply(lambda r: r["term"] in orig[r["query_id"]], axis=1)]
    fw = fw.sort_values(["query_id", "fw", "term"],
                        ascending=[True, False, True])
    exp_map = (
        fw.groupby("query_id").head(_BO1_FB_TERMS)
        .groupby("query_id")["term"].apply(list).to_dict()
    )
    qids, terms2, boosts2 = [], [], []
    for qid, ts in _BM25_QUERIES:
        e = exp_map.get(qid, [])
        qids.append(qid)
        terms2.append(list(ts) + e)
        boosts2.append([1.0] * len(ts) + [_BO1_BOOST] * len(e))
    q2 = ray.data.from_arrow(pa.table({
        "query_id": pa.array(qids, pa.int64()),
        "terms": pa.array(terms2, pa.list_(pa.string())),
        "boosts": pa.array(boosts2, pa.list_(pa.float64())),
    }))
    res2 = boosted_search(idx, q2, k=20, concurrency=2).to_pandas()
    return _rerank_rounded(res2, k=10)


SQL_BM25_BO1_TOPK = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
    "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term), "
    "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
    "cfx AS (SELECT term, count(*) AS cf FROM toks GROUP BY term), "
    "q(query_id, term) AS (VALUES "
    + ", ".join(f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms)
    + "), "
    "scored1 AS (SELECT q.query_id, tf.doc_id, "
    "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
    "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
    ") AS score FROM q JOIN tf ON q.term = tf.term "
    "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
    "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id), "
    "top1 AS (SELECT query_id, doc_id FROM ("
    "SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
    "ORDER BY round(score, 6) DESC, doc_id) AS rn FROM scored1) "
    f"WHERE rn <= {_BO1_FB_DOCS}), "
    "tfx AS (SELECT t1.query_id, tf.term, sum(tf.tf) AS tfx "
    "FROM top1 t1 JOIN tf ON tf.doc_id = t1.doc_id "
    "GROUP BY t1.query_id, tf.term), "
    "fw AS (SELECT tfx.query_id, tfx.term, "
    "round(tfx.tfx * (ln((1 + cfx.cf / st.total::DOUBLE) / "
    "(cfx.cf / st.total::DOUBLE)) / ln(2.0)) "
    "+ ln(1 + cfx.cf / st.total::DOUBLE) / ln(2.0), 6) AS fw "
    "FROM tfx JOIN cfx ON cfx.term = tfx.term CROSS JOIN stats st), "
    "exp AS (SELECT query_id, term FROM ("
    "SELECT f.query_id, f.term, row_number() OVER ("
    "PARTITION BY f.query_id ORDER BY f.fw DESC, f.term) AS rn FROM fw f "
    "WHERE NOT EXISTS (SELECT 1 FROM q WHERE q.query_id = f.query_id "
    f"AND q.term = f.term)) WHERE rn <= {_BO1_FB_TERMS}), "
    "q2(query_id, term, boost) AS ("
    "SELECT query_id, term, 1.0 FROM q "
    f"UNION ALL SELECT query_id, term, {_BO1_BOOST} FROM exp), "
    "scored2 AS (SELECT q2.query_id, tf.doc_id, "
    "sum(q2.boost * ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * "
    "(tf.tf * 2.2) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / "
    "(s.total::DOUBLE / s.n_docs)))) AS score "
    "FROM q2 JOIN tf ON q2.term = tf.term "
    "JOIN df ON df.term = q2.term JOIN dl ON dl.doc_id = tf.doc_id "
    "CROSS JOIN stats s GROUP BY q2.query_id, tf.doc_id) "
    "SELECT query_id, rank, doc_id, score FROM ("
    "SELECT query_id, doc_id, round(score, 6) AS score, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
    "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored2) "
    "WHERE rank <= 10"
)


def q_bm25_kld_topk(sf_dir: str):
    """KLD pseudo-relevance expansion (Carpineto & Romano's
    Kullback-Leibler term scoring — Terrier's KLCorrect model; the
    third PRF next to RM3 and Bo1): feedback weight

        fw(q, t) = p_x * log2(p_x / Pn)

    with p_x = tfx / (total tokens of the query's top-10 docs) — the
    elite-set language model — and Pn = cf/T the collection prior;
    terms MORE probable in the elite set than the collection score
    high.  Same bounded two-pass shape and 0.4-boost re-query as Bo1;
    elite token totals ride the same merge (no extra pass)."""
    from ...stages.search import boosted_search

    idx = _build_docs_index(sf_dir)
    res = search(idx, _query_terms_ds(_BM25_QUERIES), k=20,
                 concurrency=2).to_pandas()
    top1 = _rerank_rounded(res, k=_BO1_FB_DOCS)
    wanted = pa.array(sorted(set(top1["doc_id"].tolist())), pa.int64())

    def semi(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["doc_id"], value_set=wanted))

    fb_docs = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(semi, batch_format="pyarrow")
        .to_pandas()
    )
    tf_tbl, doc_len = term_count_table(
        pa.array(fb_docs["text"]), pa.array(fb_docs["doc_id"], pa.int64())
    )
    dl_map = dict(zip(fb_docs["doc_id"], (int(x) for x in doc_len)))
    tf_pd = tf_tbl.to_pandas()
    merged = tf_pd.merge(top1[["query_id", "doc_id"]], on="doc_id")
    tfx = merged.groupby(["query_id", "term"], as_index=False)["tf"].sum()
    elite_tok = {
        int(qid): sum(dl_map[int(d)] for d in g["doc_id"])
        for qid, g in top1.groupby("query_id")
    }
    needed = pa.array(sorted(set(tfx["term"])), pa.string())

    def cf_part(batch: pa.Table) -> pa.Table:
        tf, dl = term_count_table(batch["text"], batch["doc_id"])
        kept = tf.filter(pc.is_in(tf["term"], value_set=needed))
        agg = pa.table({
            "term": kept["term"],
            "cf_p": pc.cast(kept["tf"], pa.int64()),
        }).group_by("term").aggregate([("cf_p", "sum")])
        agg = agg.rename_columns(["term", "cf_p"])
        tot = pa.table({
            "term": pa.array(["\x00total"], pa.string()),
            "cf_p": pa.array([int(dl.sum())], pa.int64()),
        })
        return pa.concat_tables([agg, tot])

    cfd = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(cf_part, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cf_p", alias_name="cf"))
        .to_pandas()
    )
    total = int(cfd.loc[cfd["term"] == "\x00total", "cf"].iloc[0])
    cfmap = {
        t: int(c) for t, c in zip(cfd["term"], cfd["cf"])
        if t != "\x00total"
    }
    ln2 = math.log(2.0)
    rows = []
    for r in tfx.itertuples():
        px = r.tf / elite_tok[int(r.query_id)]
        pn = cfmap[r.term] / total
        fwv = px * (math.log(px / pn) / ln2)
        rows.append((r.query_id, r.term, round(fwv, 6)))
    fw = pd.DataFrame(rows, columns=["query_id", "term", "fw"])
    orig = {qid: set(ts) for qid, ts in _BM25_QUERIES}
    fw = fw[~fw.apply(lambda r: r["term"] in orig[r["query_id"]], axis=1)]
    fw = fw.sort_values(["query_id", "fw", "term"],
                        ascending=[True, False, True])
    exp_map = (
        fw.groupby("query_id").head(_BO1_FB_TERMS)
        .groupby("query_id")["term"].apply(list).to_dict()
    )
    qids, terms2, boosts2 = [], [], []
    for qid, ts in _BM25_QUERIES:
        e = exp_map.get(qid, [])
        qids.append(qid)
        terms2.append(list(ts) + e)
        boosts2.append([1.0] * len(ts) + [_BO1_BOOST] * len(e))
    q2 = ray.data.from_arrow(pa.table({
        "query_id": pa.array(qids, pa.int64()),
        "terms": pa.array(terms2, pa.list_(pa.string())),
        "boosts": pa.array(boosts2, pa.list_(pa.float64())),
    }))
    res2 = boosted_search(idx, q2, k=20, concurrency=2).to_pandas()
    return _rerank_rounded(res2, k=10)


SQL_BM25_KLD_TOPK = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
    "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term), "
    "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
    "cfx AS (SELECT term, count(*) AS cf FROM toks GROUP BY term), "
    "q(query_id, term) AS (VALUES "
    + ", ".join(f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms)
    + "), "
    "scored1 AS (SELECT q.query_id, tf.doc_id, "
    "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
    "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
    ") AS score FROM q JOIN tf ON q.term = tf.term "
    "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
    "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id), "
    "top1 AS (SELECT query_id, doc_id FROM ("
    "SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
    "ORDER BY round(score, 6) DESC, doc_id) AS rn FROM scored1) "
    f"WHERE rn <= {_BO1_FB_DOCS}), "
    "etok AS (SELECT t1.query_id, sum(dl.dl) AS etok FROM top1 t1 "
    "JOIN dl ON dl.doc_id = t1.doc_id GROUP BY 1), "
    "tfx AS (SELECT t1.query_id, tf.term, sum(tf.tf) AS tfx "
    "FROM top1 t1 JOIN tf ON tf.doc_id = t1.doc_id "
    "GROUP BY t1.query_id, tf.term), "
    "fw AS (SELECT tfx.query_id, tfx.term, "
    "round((tfx.tfx / et.etok::DOUBLE) * "
    "(ln((tfx.tfx / et.etok::DOUBLE) / (cfx.cf / st.total::DOUBLE)) "
    "/ ln(2.0)), 6) AS fw "
    "FROM tfx JOIN etok et ON et.query_id = tfx.query_id "
    "JOIN cfx ON cfx.term = tfx.term CROSS JOIN stats st), "
    "exp AS (SELECT query_id, term FROM ("
    "SELECT f.query_id, f.term, row_number() OVER ("
    "PARTITION BY f.query_id ORDER BY f.fw DESC, f.term) AS rn FROM fw f "
    "WHERE NOT EXISTS (SELECT 1 FROM q WHERE q.query_id = f.query_id "
    f"AND q.term = f.term)) WHERE rn <= {_BO1_FB_TERMS}), "
    "q2(query_id, term, boost) AS ("
    "SELECT query_id, term, 1.0 FROM q "
    f"UNION ALL SELECT query_id, term, {_BO1_BOOST} FROM exp), "
    "scored2 AS (SELECT q2.query_id, tf.doc_id, "
    "sum(q2.boost * ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * "
    "(tf.tf * 2.2) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / "
    "(s.total::DOUBLE / s.n_docs)))) AS score "
    "FROM q2 JOIN tf ON q2.term = tf.term "
    "JOIN df ON df.term = q2.term JOIN dl ON dl.doc_id = tf.doc_id "
    "CROSS JOIN stats s GROUP BY q2.query_id, tf.doc_id) "
    "SELECT query_id, rank, doc_id, score FROM ("
    "SELECT query_id, doc_id, round(score, 6) AS score, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
    "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored2) "
    "WHERE rank <= 10"
)


_PRUNE_N = 24


def q_bm25_pruned_topk(sf_dir: str):
    """Static impact-ordered index pruning (Carmel et al., SIGIR 2001;
    stages/prune.py): per term keep only the top-24 postings by BM25
    impact w (ties doc_id ASC), global stats (df/idf/avgdl) RETAINED
    from the full index — then serve the usual exact TAAT over the
    pruned segments.  Posting lists become O(n_keep) regardless of df:
    the classic head-term latency lever at web scale.  The oracle
    mirrors the pinned keep rule with a per-term row_number window, so
    this checks the pruning transform AND the unchanged scorer."""
    from ...stages.prune import prune_index

    src = _build_docs_index(sf_dir)
    dst = _tmp_index_dir(sf_dir, f"idxprn{_PRUNE_N}")
    prune_index(src, dst, _PRUNE_N, concurrency=2)
    res = search(dst, _query_terms_ds(_BM25_QUERIES), k=20,
                 concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


SQL_BM25_PRUNED_TOPK = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
    "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term), "
    "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
    "wt AS (SELECT tf.term, tf.doc_id, "
    "(tf.tf * 2.2) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / "
    "(s.total::DOUBLE / s.n_docs))) AS w "
    "FROM tf JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s), "
    "kept AS (SELECT term, doc_id, w FROM ("
    "SELECT term, doc_id, w, row_number() OVER (PARTITION BY term "
    f"ORDER BY w DESC, doc_id) AS rn FROM wt) WHERE rn <= {_PRUNE_N}), "
    "q(query_id, term) AS (VALUES "
    + ", ".join(f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms)
    + "), "
    "scored AS (SELECT q.query_id, k.doc_id, "
    "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * k.w) AS score "
    "FROM q JOIN kept k ON k.term = q.term "
    "JOIN df ON df.term = q.term CROSS JOIN stats s "
    "GROUP BY q.query_id, k.doc_id) "
    "SELECT query_id, rank, doc_id, score FROM ("
    "SELECT query_id, doc_id, round(score, 6) AS score, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
    "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored) "
    "WHERE rank <= 10"
)


def q_bm25plus_topk(sf_dir: str):
    """BM25+ (Lv & Zhai, CIKM 2011 "Lower-bounding term frequency
    normalization"): every matched (term, doc) contribution gains
    ``idf * delta`` (delta=1.0 pinned) so very long documents can't
    score below the tf->inf asymptote.  Rides the exact TAAT
    accumulator (stages/search.score_all_taat delta=), same index and
    query set as ``bm25_topk``."""
    idx = _build_docs_index(sf_dir)
    res = search(idx, _query_terms_ds(_BM25_QUERIES), k=20, mode="bm25plus",
                 concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


SQL_BM25PLUS_TOPK = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
    "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term), "
    "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
    "q(query_id, term) AS (VALUES "
    + ", ".join(f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms)
    + "), "
    "scored AS (SELECT q.query_id, tf.doc_id, "
    "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * ((tf.tf * 2.2) / "
    "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs))) "
    "+ 1.0)) AS score FROM q JOIN tf ON q.term = tf.term "
    "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
    "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id) "
    "SELECT query_id, rank, doc_id, score FROM ("
    "SELECT query_id, doc_id, round(score, 6) AS score, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
    "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored) "
    "WHERE rank <= 10"
)


_HIST_INTERVAL = 10.0


def q_bm25_histogram(sf_dir: str):
    """Elasticsearch ``histogram`` aggregation over the MATCH SET (not
    the top-k): every doc matching >= 1 query term bucketed by
    ``floor(dl / 10) * 10`` of its doc-length doc-value — the ES bucket
    key rule.  dl rides in every posting (BM25's length norm), so the
    aggregation needs no doc-store lookup; one unique + bincount per
    query inside the searcher actors (stages/search mode='histogram')."""
    from ...stages.search import search

    idx = _build_docs_index(sf_dir)
    return search(
        idx, _query_terms_ds(_BM25_QUERIES), mode="histogram",
        hist_interval=_HIST_INTERVAL, concurrency=2,
    )


SQL_BM25_HISTOGRAM = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
    "tf AS (SELECT doc_id, term FROM toks GROUP BY doc_id, term), "
    "q(query_id, term) AS (VALUES "
    + ", ".join(f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms)
    + "), "
    "m AS (SELECT DISTINCT q.query_id, tf.doc_id "
    "FROM q JOIN tf ON tf.term = q.term) "
    "SELECT m.query_id, "
    f"CAST(floor(dl.dl / {_HIST_INTERVAL}) * {_HIST_INTERVAL} AS BIGINT) AS bucket, "
    "count(*) AS n FROM m JOIN dl ON dl.doc_id = m.doc_id "
    "GROUP BY m.query_id, bucket"
)


_BOOSTING_QUERIES: list[tuple[int, list[str], list[str]]] = [
    (0, ["data", "query", "fast"], ["slow"]),
    (1, ["merge", "sort"], ["batch", "window"]),
    (2, ["window", "stream", "batch"], ["table"]),
    (3, ["hash", "join", "table"], ["scan", "slow"]),
    (4, ["slow", "scan"], ["fast"]),
    (5, ["spark", "row", "group"], ["customer"]),
]


def q_bm25_boosting(sf_dir: str):
    """Elasticsearch ``boosting`` query: positive clause scored with the
    pinned BM25, docs also matching >= 1 negative term demoted by
    ``score * 0.5`` BEFORE the bounded top-k (demotion, not exclusion —
    stages/search.score_all_boosting).  The demotion must precede the
    cut: a demoted doc can fall off the page while an undemoted
    lower-scorer rides in, which a post-filter of a short page cannot
    reproduce."""
    from ...stages.search import search

    idx = _build_docs_index(sf_dir)
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([q for q, _, _ in _BOOSTING_QUERIES], pa.int64()),
                "terms": pa.array(
                    [p for _, p, _ in _BOOSTING_QUERIES], pa.list_(pa.string())
                ),
                "neg_terms": pa.array(
                    [n for _, _, n in _BOOSTING_QUERIES], pa.list_(pa.string())
                ),
            }
        )
    )
    res = search(idx, qds, k=20, mode="boosting", concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


SQL_BM25_BOOSTING = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
    "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term), "
    "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
    "q(query_id, term) AS (VALUES "
    + ", ".join(f"({qid}, '{t}')" for qid, pos, _ in _BOOSTING_QUERIES for t in pos)
    + "), nq(query_id, term) AS (VALUES "
    + ", ".join(f"({qid}, '{t}')" for qid, _, neg in _BOOSTING_QUERIES for t in neg)
    + "), "
    "scored AS (SELECT q.query_id, tf.doc_id, "
    "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
    "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
    ") AS score FROM q JOIN tf ON q.term = tf.term "
    "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
    "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id), "
    "negdoc AS (SELECT DISTINCT nq.query_id, tf.doc_id "
    "FROM nq JOIN tf ON tf.term = nq.term), "
    "boosted AS (SELECT sc.query_id, sc.doc_id, "
    "sc.score * CASE WHEN nd.doc_id IS NOT NULL THEN 0.5 ELSE 1.0 END AS score "
    "FROM scored sc LEFT JOIN negdoc nd "
    "ON nd.query_id = sc.query_id AND nd.doc_id = sc.doc_id) "
    "SELECT query_id, rank, doc_id, score FROM ("
    "SELECT query_id, doc_id, round(score, 6) AS score, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
    "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM boosted) "
    "WHERE rank <= 10"
)


def q_bm25_explain(sf_dir: str):
    """Lucene ``explain()``: per-(top-k hit, matching term) BM25
    contribution rows — the exact addends the TAAT accumulator sums
    (stages/search.explain_search).  The oracle recomputes every addend
    from raw tokens in SQL; summing contributions per (query, doc)
    reproduces the rounded search() score (pytest)."""
    from ...stages.search import explain_search

    idx = _build_docs_index(sf_dir)
    return explain_search(idx, _query_terms_ds(_BM25_QUERIES), k=10)


SQL_BM25_EXPLAIN = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
    "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term), "
    "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
    "q(query_id, term) AS (VALUES "
    + ", ".join(f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms)
    + "), qd AS (SELECT DISTINCT query_id, term FROM q), "
    "addends AS (SELECT qd.query_id, tf.doc_id, qd.term, "
    "ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
    "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs))) "
    "AS contribution FROM qd JOIN tf ON qd.term = tf.term "
    "JOIN df ON df.term = qd.term JOIN dl ON dl.doc_id = tf.doc_id "
    "CROSS JOIN stats s), "
    "scored AS (SELECT query_id, doc_id, sum(contribution) AS score "
    "FROM addends GROUP BY query_id, doc_id), "
    "topk AS (SELECT query_id, doc_id FROM ("
    "SELECT query_id, doc_id, row_number() OVER ("
    "PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id) AS rank "
    "FROM scored) WHERE rank <= 10) "
    "SELECT a.query_id, a.doc_id, a.term, round(a.contribution, 6) "
    "AS contribution FROM addends a JOIN topk t "
    "ON t.query_id = a.query_id AND t.doc_id = a.doc_id"
)


# ------------------------------------------- percolator (reverse search)

_PERCOLATE_QUERIES: list[tuple[int, list[str], list[str]]] = [
    # (query_id, must terms, must_not terms)
    (0, ["data", "query"], []),            # plain conjunction
    (1, ["merge", "sort"], ["slow"]),      # conjunction + exclusion
    (2, ["dup"], []),                      # rare term -> few matches
    (3, ["zzz"], []),                      # absent term -> no matches
    (4, ["the", "a"], ["dup"]),            # high-df pair, rare exclusion
]


def q_percolate_matches(sf_dir: str):
    """Percolator / reverse search (stages/percolate.py): the stored
    query set (must / must_not term algebra) matches against the
    streaming corpus in one vectorized map_batches pass; emits every
    ``(query_id, doc_id)`` hit."""
    from ...stages.percolate import percolate

    res = percolate(
        _docs(sf_dir, ["doc_id", "text"]), _PERCOLATE_QUERIES
    ).to_pandas()
    return res.sort_values(["query_id", "doc_id"]).reset_index(drop=True)


def _percolate_sql(queries: list[tuple[int, list[str], list[str]]]) -> str:
    must_vals = ", ".join(
        f"({qid}, '{t}')" for qid, must, _ in queries for t in sorted(set(must))
    )
    not_vals = ", ".join(
        f"({qid}, '{t}')" for qid, _, mn in queries for t in sorted(set(mn))
    )
    not_cte = (
        f"nt(query_id, term) AS (VALUES {not_vals}), "
        "excl AS (SELECT DISTINCT nt.query_id, tf.doc_id FROM nt "
        "JOIN tf ON tf.term = nt.term), "
        if not_vals
        else "excl AS (SELECT NULL::BIGINT AS query_id, NULL::BIGINT AS doc_id "
        "WHERE false), "
    )
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "tf AS (SELECT doc_id, term FROM toks GROUP BY doc_id, term), "
        f"q(query_id, term) AS (VALUES {must_vals}), "
        "qn AS (SELECT query_id, count(*) AS n FROM q GROUP BY query_id), "
        "hit AS (SELECT q.query_id, tf.doc_id, count(*) AS c FROM q "
        "JOIN tf ON tf.term = q.term GROUP BY q.query_id, tf.doc_id), "
        + not_cte +
        "m AS (SELECT hit.query_id, hit.doc_id FROM hit "
        "JOIN qn ON qn.query_id = hit.query_id WHERE hit.c = qn.n) "
        "SELECT query_id, doc_id FROM m "
        "EXCEPT SELECT query_id, doc_id FROM excl"
    )


SQL_PERCOLATE_MATCHES = _percolate_sql(_PERCOLATE_QUERIES)


# ----------------------------- top-hits per bucket over retrieval results

_TOP_HITS_N = 3


def q_bm25_top_hits(sf_dir: str):
    """Top-hits-per-bucket aggregation (the Elasticsearch ``top_hits``
    inside a ``terms`` agg): BM25 results bucketed by the doc's
    ``source``, keeping the best ``_TOP_HITS_N`` per (query, bucket) by
    ``(score DESC, doc_id)``.  Same composition shape as the facet
    entry: the top-k doc set broadcasts, the corpus metadata STREAMS
    through one filtered pass, the bucket window runs on the tiny
    joined result."""
    topk = q_bm25_topk(sf_dir)
    wanted = pa.array(sorted(set(topk["doc_id"].tolist())), pa.int64())

    def semi(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["doc_id"], value_set=wanted))

    meta = (
        _docs(sf_dir, ["doc_id", "source"])
        .map_batches(semi, batch_format="pyarrow")
        .to_pandas()
    )
    j = topk.merge(meta, on="doc_id")
    out = []
    for (_qid, _src), g in j.groupby(["query_id", "source"]):
        g = g.sort_values(["score", "doc_id"], ascending=[False, True])
        g = g.head(_TOP_HITS_N).reset_index(drop=True)
        g["bucket_rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        out.append(g)
    res = pd.concat(out, ignore_index=True)
    cols = ["query_id", "source", "bucket_rank", "doc_id", "score"]
    return res[cols].sort_values(
        ["query_id", "source", "bucket_rank"]
    ).reset_index(drop=True)


SQL_BM25_TOP_HITS = (
    "WITH topk AS (" + SQL_BM25_TOPK + ") "
    "SELECT query_id, source, bucket_rank, doc_id, score FROM ("
    "SELECT t.query_id, d.source, t.doc_id, t.score, "
    "CAST(row_number() OVER (PARTITION BY t.query_id, d.source "
    "ORDER BY t.score DESC, t.doc_id) AS INTEGER) AS bucket_rank "
    "FROM topk t JOIN documents d ON d.doc_id = t.doc_id) "
    f"WHERE bucket_rank <= {_TOP_HITS_N}"
)


# ----------------------------- significant terms over retrieval results

_SIGTERM_TOP = 10


def q_significant_terms(sf_dir: str):
    """Significant-terms aggregation (Elasticsearch semantics, JLH
    heuristic): for each query's BM25 top-k result set (the foreground),
    score every term occurring in it by how over-represented it is
    against the whole corpus (the background) —
    ``jlh = (fg% - bg%) * (fg% / bg%)`` with ``fg% = fg_docs/|results|``
    and ``bg% = df/n_docs`` — and keep the top positive-scoring terms
    per query, ranked ``(score DESC, term ASC)``.

    Composition shape (same as the facet entry): the top-k doc-id set
    broadcasts; the corpus STREAMS through one filtered ``map_batches``
    pass whose output is the distinct (doc, term) pairs of the RESULT
    docs only — O(k x queries x doc_vocab) rows, never corpus-sized.
    Background df comes from the index's term dictionary (point-filtered
    read of the foreground terms), n_docs from the collection stats —
    no second corpus pass."""
    from ...stages.search import IndexReader

    idx = _build_docs_index(sf_dir)
    topk = q_bm25_topk(sf_dir)
    wanted = pa.array(sorted(set(topk["doc_id"].tolist())), pa.int64())

    def doc_terms(batch: pa.Table) -> pa.Table:
        from ...functions.tokenizer import term_count_table

        batch = batch.filter(pc.is_in(batch["doc_id"], value_set=wanted))
        if batch.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
            })
        tf, _dl = term_count_table(batch["text"], batch["doc_id"])
        return tf.select(["doc_id", "term"])

    pairs = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(doc_terms, batch_format="pyarrow")
        .to_pandas()
    )
    # fg counts: distinct result docs containing the term, per query
    fg = (
        topk[["query_id", "doc_id"]]
        .merge(pairs, on="doc_id")
        .groupby(["query_id", "term"], as_index=False)
        .size()
        .rename(columns={"size": "fg"})
    )
    fgn = topk.groupby("query_id").size().rename("fgn")
    fg = fg.merge(fgn, on="query_id")
    reader = IndexReader(idx)
    dfs = reader.dfs(sorted(set(fg["term"])))
    fg["df"] = fg["term"].map(dfs).astype(np.int64)
    fg_pct = fg["fg"].to_numpy(np.float64) / fg["fgn"].to_numpy(np.float64)
    bg_pct = fg["df"].to_numpy(np.float64) / float(reader.n_docs)
    fg["score"] = np.round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6)
    fg = fg[fg["score"] > 0]
    out = []
    for _qid, g in fg.groupby("query_id"):
        g = g.sort_values(["score", "term"], ascending=[False, True])
        g = g.head(_SIGTERM_TOP).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        out.append(g)
    cols = ["query_id", "rank", "term", "fg", "df", "score"]
    if not out:
        return pd.DataFrame(columns=cols)
    res = pd.concat(out, ignore_index=True)
    res["fg"] = res["fg"].astype(np.int64)
    return res[cols]


SQL_SIGNIFICANT_TERMS = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "tf AS (SELECT doc_id, term FROM toks GROUP BY doc_id, term), "
    "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
    "stats AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks), "
    "topk AS (" + SQL_BM25_TOPK + "), "
    "fgn AS (SELECT query_id, count(*) AS fgn FROM topk GROUP BY query_id), "
    "fg AS (SELECT t.query_id, tf.term, count(*) AS fg FROM topk t "
    "JOIN tf ON tf.doc_id = t.doc_id GROUP BY t.query_id, tf.term), "
    "scored AS (SELECT fg.query_id, fg.term, fg.fg, df.df, "
    "round(((fg.fg::DOUBLE / fgn.fgn) - (df.df::DOUBLE / s.n_docs)) * "
    "((fg.fg::DOUBLE / fgn.fgn) / (df.df::DOUBLE / s.n_docs)), 6) AS score "
    "FROM fg JOIN fgn ON fgn.query_id = fg.query_id "
    "JOIN df ON df.term = fg.term CROSS JOIN stats s) "
    "SELECT query_id, rank, term, fg, df, score FROM ("
    "SELECT query_id, term, fg, df, score, "
    "CAST(row_number() OVER (PARTITION BY query_id "
    "ORDER BY score DESC, term) AS INTEGER) AS rank "
    f"FROM scored WHERE score > 0) WHERE rank <= {_SIGTERM_TOP}"
)


# ----------------------------------------- BM25F fielded retrieval

_BM25F_TITLE_LEN = 6
_BM25F_WT, _BM25F_WB = 2.0, 1.0  # exact binary floats (stages/fielded.py)


def q_bm25f_topk(sf_dir: str):
    """BM25F over two derived fields (stages/fielded.py): title = first
    6 tokens, body = the rest; per-field tf and length combine linearly
    (w_title=2, w_body=1) into one pseudo-doc scored with the pinned
    BM25 expression; df counts docs containing the term in ANY field.
    One physical segment index per field under ``field=<name>/``."""
    from ...stages.fielded import build_fielded_index, fielded_search, split_fields

    idx = _tmp_index_dir(sf_dir, "idxf")
    docs = _docs(sf_dir, ["doc_id", "text"])
    n = docs.count()
    fds = split_fields(docs, title_len=_BM25F_TITLE_LEN)
    build_fielded_index(fds, idx, seg_docs=max(256, n // 8), resume=True)
    res = fielded_search(
        idx, _query_terms_ds(_BM25_QUERIES), k=20, concurrency=2,
        weights={"title": _BM25F_WT, "body": _BM25F_WB},
    ).to_pandas()
    return _rerank_rounded(res, k=10)


def _bm25f_sql(queries: list[tuple[int, list[str]]], k: int = 10) -> str:
    """BM25F oracle: fields derived with list_slice over the split
    tokens, per-field tf via two groupbys FULL OUTER JOINed, combined
    pseudo-doc scored with the exact-BM25 expression (weights/lengths
    all exact-binary-scaled integers, so float64 matches the engine)."""
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in queries for t in terms
    )
    wt, wb = _BM25F_WT, _BM25F_WB
    tl = _BM25F_TITLE_LEN
    return (
        "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS ts FROM documents), "
        f"fl AS (SELECT doc_id, list_slice(ts, 1, {tl}) AS tts, "
        f"list_slice(ts, {tl + 1}, len(ts)) AS bts FROM d), "
        "tlen AS (SELECT doc_id, len(tts) AS tl, len(bts) AS bl FROM fl), "
        f"stats AS (SELECT count(*) AS n_docs, sum({wt} * tl + {wb} * bl) "
        "AS total FROM tlen), "
        "ttf AS (SELECT doc_id, unnest(tts) AS term FROM fl), "
        "btf AS (SELECT doc_id, unnest(bts) AS term FROM fl), "
        "ttf2 AS (SELECT doc_id, term, count(*) AS tf FROM ttf "
        "GROUP BY doc_id, term), "
        "btf2 AS (SELECT doc_id, term, count(*) AS tf FROM btf "
        "GROUP BY doc_id, term), "
        "ctf AS (SELECT coalesce(t.doc_id, b.doc_id) AS doc_id, "
        "coalesce(t.term, b.term) AS term, "
        f"{wt} * coalesce(t.tf, 0) + {wb} * coalesce(b.tf, 0) AS tfc "
        "FROM ttf2 t FULL OUTER JOIN btf2 b "
        "ON t.doc_id = b.doc_id AND t.term = b.term), "
        "df AS (SELECT term, count(*) AS df FROM ctf GROUP BY term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "scored AS (SELECT q.query_id, c.doc_id, "
        "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (c.tfc * 2.2) / "
        f"(c.tfc + 1.2 * (1 - 0.75 + 0.75 * ({wt} * tlen.tl + {wb} * tlen.bl) / "
        "(s.total / s.n_docs)))) AS score "
        "FROM q JOIN ctf c ON q.term = c.term "
        "JOIN df ON df.term = q.term "
        "JOIN tlen ON tlen.doc_id = c.doc_id "
        "CROSS JOIN stats s GROUP BY q.query_id, c.doc_id) "
        "SELECT query_id, rank, doc_id, score FROM ("
        "SELECT query_id, doc_id, round(score, 6) AS score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored) "
        f"WHERE rank <= {k}"
    )


SQL_BM25F_TOPK = _bm25f_sql(_BM25_QUERIES)


# -------------------------- dis_max over fields (best_fields multi_match)

_DISMAX_TIE = 0.5  # exact binary float (pinned float policy)


def q_dismax_topk(sf_dir: str):
    """Disjunction-max over the (title, body) fielded index
    (stages/fielded.score_dismax — Lucene DisjunctionMaxQuery /
    Elasticsearch best_fields): each field scores the query as an
    independent BM25 index (own df/avgdl), per doc
    ``max_f + tie * (sum_f - max_f)``; shares the BM25F entry's
    physical index (one segment index per field)."""
    from ...stages.fielded import build_fielded_index, dismax_search, split_fields

    idx = _tmp_index_dir(sf_dir, "idxf")
    docs = _docs(sf_dir, ["doc_id", "text"])
    n = docs.count()
    fds = split_fields(docs, title_len=_BM25F_TITLE_LEN)
    build_fielded_index(fds, idx, seg_docs=max(256, n // 8), resume=True)
    res = dismax_search(
        idx, _query_terms_ds(_BM25_QUERIES), k=20, concurrency=2,
        tie=_DISMAX_TIE,
        weights={"title": _BM25F_WT, "body": _BM25F_WB},
    ).to_pandas()
    return _rerank_rounded(res, k=10)


def _dismax_sql(queries: list[tuple[int, list[str]]], tie: float,
                k: int = 10) -> str:
    """dis_max oracle: per-field BM25 scored CTEs (each with its OWN df
    and avgdl), FULL OUTER JOINed, combined with the max + tie * rest
    expression (single-field matches pass through exactly)."""
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in queries for t in terms
    )
    tl = _BM25F_TITLE_LEN
    def field_scored(tf2: str, lcol: str, total: str) -> str:
        return (
            f"(SELECT q.query_id, x.doc_id, "
            "sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * "
            "(x.tf * 2.2) / "
            f"(x.tf + 1.2 * (1 - 0.75 + 0.75 * tlen.{lcol} / "
            f"(s.{total}::DOUBLE / s.n_docs)))) AS score "
            f"FROM q JOIN {tf2} x ON q.term = x.term "
            f"JOIN (SELECT term, count(*) AS df FROM {tf2} GROUP BY term) d "
            "ON d.term = q.term "
            "JOIN tlen ON tlen.doc_id = x.doc_id "
            "CROSS JOIN stats s GROUP BY q.query_id, x.doc_id)"
        )
    return (
        "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS ts FROM documents), "
        f"fl AS (SELECT doc_id, list_slice(ts, 1, {tl}) AS tts, "
        f"list_slice(ts, {tl + 1}, len(ts)) AS bts FROM d), "
        "tlen AS (SELECT doc_id, len(tts) AS tl, len(bts) AS bl FROM fl), "
        "stats AS (SELECT count(*) AS n_docs, sum(tl) AS total_t, "
        "sum(bl) AS total_b FROM tlen), "
        "ttf AS (SELECT doc_id, unnest(tts) AS term FROM fl), "
        "btf AS (SELECT doc_id, unnest(bts) AS term FROM fl), "
        "ttf2 AS (SELECT doc_id, term, count(*) AS tf FROM ttf "
        "GROUP BY doc_id, term), "
        "btf2 AS (SELECT doc_id, term, count(*) AS tf FROM btf "
        "GROUP BY doc_id, term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "st AS " + field_scored("ttf2", "tl", "total_t") + ", "
        "sb AS " + field_scored("btf2", "bl", "total_b") + ", "
        "dm AS (SELECT coalesce(t.query_id, b.query_id) AS query_id, "
        "coalesce(t.doc_id, b.doc_id) AS doc_id, "
        "CASE WHEN t.score IS NULL THEN b.score "
        "WHEN b.score IS NULL THEN t.score "
        f"ELSE greatest(t.score, b.score) + {tie} * "
        "(t.score + b.score - greatest(t.score, b.score)) END AS score "
        "FROM st t FULL OUTER JOIN sb b "
        "ON t.query_id = b.query_id AND t.doc_id = b.doc_id) "
        "SELECT query_id, rank, doc_id, score FROM ("
        "SELECT query_id, doc_id, round(score, 6) AS score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM dm) "
        f"WHERE rank <= {k}"
    )


SQL_DISMAX_TOPK = _dismax_sql(_BM25_QUERIES, _DISMAX_TIE)


from ._nsacc import export as _ns_export

_ns_export(globals())
del _ns_export
