# Part 05/11 of the former single-module pipelines/queries.py
# (mechanical split, round 5 — VERDICT r04 next-round #6).  Parts share
# ONE late-bound namespace via _nsacc: globals are seeded from the
# accumulator before this body runs (preserving original top-level
# execution order) and the final merged namespace is injected back into
# every part by __init__, so call-time forward references behave exactly
# as in the single file.  Original lines 8514-10555.
from __future__ import annotations

from ._nsacc import NS as _ns_seed

globals().update(_ns_seed)
del _ns_seed



# --------------------------------------------- snippets (serving stage)

_SNIPPET_WIDTH = 8


def q_snippets_topk(sf_dir: str):
    """Query-biased snippets for the BM25 top-k (stages/snippets.py):
    per (query, doc) pair the 8-token window covering the most distinct
    query terms (earliest on ties).  Pairs broadcast once; the corpus
    streams through one map_batches pass — no shuffle."""
    from ...stages.snippets import extract_snippets

    idx = _build_docs_index(sf_dir)
    res = search(
        idx, _query_terms_ds(_BM25_QUERIES), k=20, concurrency=2
    ).to_pandas()
    topk = _rerank_rounded(res, k=10)
    qterms = {qid: sorted(set(ts)) for qid, ts in _BM25_QUERIES}
    pairs = pa.table(
        {
            "query_id": pa.array(topk["query_id"].to_numpy(), pa.int64()),
            "doc_id": pa.array(topk["doc_id"].to_numpy(), pa.int64()),
        }
    )
    docs = _docs(sf_dir, ["doc_id", "text"])
    out = extract_snippets(
        docs, pairs, qterms, width=_SNIPPET_WIDTH, concurrency=2
    ).to_pandas()
    return out.sort_values(["query_id", "doc_id"]).reset_index(drop=True)


def _snippets_sql(queries: list[tuple[int, list[str]]], width: int) -> str:
    """Independent snippet oracle: recompute the BM25 top-k pairs with
    the exact-BM25 SQL, enumerate candidate starts (query-term positions
    in the doc), count distinct query terms per window with a positional
    self-join, pick (max count, min start) per pair, and render the
    snippet via ``list_slice`` — byte-equal to the engine's token join
    on the canonical corpus."""
    qvals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in queries for t in sorted(set(terms))
    )
    w1 = width - 1
    return (
        "WITH topk AS (SELECT query_id, doc_id FROM (" + SQL_BM25_TOPK + ")), "
        "d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS ts FROM documents), "
        "tokpos AS (SELECT doc_id, unnest(ts) AS term, "
        "unnest(range(1, len(ts) + 1)) AS i FROM d), "
        f"q(query_id, term) AS (VALUES {qvals}), "
        "starts AS (SELECT DISTINCT tk.query_id, tk.doc_id, tp.i AS s "
        "FROM topk tk JOIN q ON q.query_id = tk.query_id "
        "JOIN tokpos tp ON tp.doc_id = tk.doc_id AND tp.term = q.term), "
        "wins AS (SELECT s.query_id, s.doc_id, s.s, "
        "count(DISTINCT q2.term) AS nt FROM starts s "
        "JOIN q q2 ON q2.query_id = s.query_id "
        "JOIN tokpos tp2 ON tp2.doc_id = s.doc_id AND tp2.term = q2.term "
        f"AND tp2.i BETWEEN s.s AND s.s + {w1} "
        "GROUP BY s.query_id, s.doc_id, s.s), "
        "best AS (SELECT query_id, doc_id, s, nt, row_number() OVER ("
        "PARTITION BY query_id, doc_id ORDER BY nt DESC, s) AS rn FROM wins) "
        "SELECT b.query_id, b.doc_id, b.s - 1 AS start, b.nt AS n_terms, "
        f"array_to_string(list_slice(d.ts, b.s, b.s + {w1}), ' ') AS snippet "
        "FROM best b JOIN d ON d.doc_id = b.doc_id WHERE b.rn = 1"
    )


SQL_SNIPPETS_TOPK = _snippets_sql(_BM25_QUERIES, _SNIPPET_WIDTH)


# --------------------------------- wildcard + fuzzy (term expansion)

_WILDCARD_QUERIES: list[tuple[int, str]] = [
    # (query_id, SQL-LIKE pattern)
    (0, "s%"),        # prefix: scan slow small sort spark stream (capped)
    (1, "%ow"),       # suffix: row slow window
    (2, "_a__"),      # fixed-shape: data fast hash part
    (3, "merge"),     # no wildcard -> exact-term probe
    (4, "zz%"),       # no dictionary match -> empty result
]
_WILDCARD_CAP = 4     # rewrite cap: exercises the (df DESC, term) pick

_FUZZY_QUERIES: list[tuple[int, str]] = [
    # (query_id, query term); vocabulary has no distance-1 pairs, so
    # multi-expansions need out-of-vocabulary probes
    (0, "spart"),     # -> part (del s), spark (subst t->k)
    (1, "sow"),       # -> row (subst s->r), slow (ins l)
    (2, "merge"),     # exact in-dictionary term -> itself only
    (3, "quer"),      # -> query (one insertion)
    (4, "zzz"),       # nothing within distance 1 -> empty
]


def q_wildcard_topk(sf_dir: str):
    """Wildcard/prefix retrieval (stages/expand.py): LIKE patterns expand
    against the index term dictionary (streamed map_batches match, capped
    to the ``_WILDCARD_CAP`` highest-df terms per query), then rank as the
    boolean OR of the expanded terms (BM25 sum, global idf per term)."""
    from ...stages.expand import wildcard_search

    idx = _build_docs_index_pos(sf_dir)
    res = wildcard_search(
        idx, _WILDCARD_QUERIES, k=20,
        max_expansions=_WILDCARD_CAP, concurrency=2,
    ).to_pandas()
    return _rerank_rounded(res, k=10)


def q_fuzzy_topk(sf_dir: str):
    """Fuzzy retrieval (stages/expand.py): each query term expands to the
    dictionary terms within Levenshtein distance 1 (vectorized byte-matrix
    length-bucket kernel), then ranks as the boolean OR disjunction."""
    from ...stages.expand import fuzzy_search

    idx = _build_docs_index_pos(sf_dir)
    res = fuzzy_search(idx, _FUZZY_QUERIES, k=20, concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


_REGEX_QUERIES: list[tuple[int, str]] = [
    # (query_id, RE2 pattern — whole-term anchored)
    (0, "s.*"),          # prefix class: the s- terms
    (1, ".*(er|ow)"),    # alternation suffix: customer filter order row slow window
    (2, ".o.n"),         # fixed shape: join
    (3, "merge"),        # literal
    (4, "zz.*"),         # no match -> empty
]


def q_regex_topk(sf_dir: str):
    """Regex retrieval (stages/expand.py): whole-term RE2 match against
    the streamed dictionary (Lucene RegexpQuery rewrite), ranked as the
    boolean OR of the matched terms."""
    from ...stages.expand import regex_search

    idx = _build_docs_index_pos(sf_dir)
    res = regex_search(idx, _REGEX_QUERIES, k=20, concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


def _expansion_sql(conds: list[tuple[int, str]], k: int = 10,
                   cap: int | None = None) -> str:
    """Expansion-query oracle: expand each pattern against the df
    dictionary in SQL (same ``(df DESC, term)`` rewrite cap as the
    engine), then score as the boolean OR of the expanded terms with the
    exact-BM25 expression shared by every search oracle."""
    e_parts = [
        f"SELECT {qid} AS query_id, term, df FROM df WHERE {cond}"
        for qid, cond in conds
    ]
    if cap is not None:
        q_sql = (
            "q AS (SELECT query_id, term FROM (SELECT query_id, term, "
            "row_number() OVER (PARTITION BY query_id "
            f"ORDER BY df DESC, term) AS rn FROM e) WHERE rn <= {cap}), "
        )
    else:
        q_sql = "q AS (SELECT query_id, term FROM e), "
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
        "GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        "e AS (" + " UNION ALL ".join(e_parts) + "), "
        + q_sql +
        "scored AS (SELECT q.query_id, tf.doc_id, "
        "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
        "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
        ") AS score FROM q JOIN tf ON q.term = tf.term "
        "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id) "
        "SELECT query_id, rank, doc_id, score FROM ("
        "SELECT query_id, doc_id, round(score, 6) AS score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored) "
        f"WHERE rank <= {k}"
    )


SQL_WILDCARD_TOPK = _expansion_sql(
    [(qid, f"term LIKE '{pat}'") for qid, pat in _WILDCARD_QUERIES],
    cap=_WILDCARD_CAP,
)
# trigram-pruned wildcard: same rewrite semantics, different READ —
# patterns chosen so most carry a required trigram (pruned partitions)
# and one falls back to the streamed scan
_WILDCARD_TRGM_QUERIES: list[tuple[int, str]] = [
    (0, "merge"),        # literal -> trgm 'mer'
    (1, "%can%"),        # infix -> trgm 'can' (scan)
    (2, "sor%"),         # prefix -> trgm 'sor' (sort)
    (3, "s%"),           # run < 3 -> full-scan fallback
    (4, "cust%mer"),     # two runs -> longest ('cust') wins
    (5, "%zzz%"),        # pruned AND empty (no such trigram partition)
]


def q_wildcard_trgm_topk(sf_dir: str):
    """Wildcard retrieval over the trigram-partitioned dictionary
    (stages/trgm.py, pg_trgm model): expansion reads ONLY the required
    ``trgm=`` partitions (path-pruned parquet read) instead of streaming
    the whole dictionary; ranking identical to wildcard_topk's boolean
    OR rewrite.  The oracle is the same LIKE-expansion SQL — proving the
    pruned read loses nothing."""
    from ...stages.trgm import wildcard_search_trgm

    idx = _build_docs_index_pos(sf_dir)
    res = wildcard_search_trgm(
        idx, _WILDCARD_TRGM_QUERIES, k=20, concurrency=2,
    ).to_pandas()
    return _rerank_rounded(res, k=10)


SQL_WILDCARD_TRGM_TOPK = _expansion_sql(
    [(qid, f"term LIKE '{pat}'") for qid, pat in _WILDCARD_TRGM_QUERIES],
)


SQL_FUZZY_TOPK = _expansion_sql(
    [(qid, f"levenshtein(term, '{t}') <= 1") for qid, t in _FUZZY_QUERIES]
)
SQL_REGEX_TOPK = _expansion_sql(
    # regexp_full_match is DuckDB's anchored RE2 — same engine family as
    # pyarrow's match_substring_regex with ^(?:...)$ anchors
    [(qid, f"regexp_full_match(term, '{p}')") for qid, p in _REGEX_QUERIES]
)


# --------------------------------------------- nDCG@10 retrieval quality

def q_retrieval_ndcg(sf_dir: str):
    """Graded retrieval-quality metric: nDCG@10 per query of the BM25
    top-10 against binary relevance "doc contains EVERY query term".

    Scale shape: relevance marks stream over the corpus (vectorized
    per-batch tf-table membership — never a corpus collect); the
    per-query relevant-doc totals (IDCG input) come from a keyed Count
    aggregate; only the rel∩top10 intersection (bounded by k×queries)
    and the per-query scalars land on the driver.
    """
    k = 10
    topk = q_bm25_topk(sf_dir)  # (query_id, rank, doc_id, score), rank<=10
    hit_set, n_rel = _rel_hits(sf_dir, topk)

    out_q, out_n = [], []
    for qid, _terms in _BM25_QUERIES:
        g = topk[topk["query_id"] == qid]
        rel_mask = np.array(
            [(qid, d) in hit_set for d in g["doc_id"]], dtype=bool
        )
        dcg = float(np.sum(1.0 / np.log2(g["rank"].to_numpy()[rel_mask] + 1.0)))
        nr = min(n_rel.get(qid, 0), k)
        idcg = float(np.sum(1.0 / np.log2(np.arange(1, nr + 1) + 1.0)))
        out_q.append(qid)
        out_n.append(round(dcg / idcg, 6) if idcg > 0 else 0.0)
    return pd.DataFrame({"query_id": out_q, "ndcg": out_n})


def _rel_hits(sf_dir: str, topk: pd.DataFrame):
    """Shared relevance machinery for the ranked-eval entries: binary
    relevance "doc contains EVERY query term", streamed over the corpus
    (per-batch tf-table membership, never a collect).  Returns the
    (query_id, doc_id) hit set intersected with the retrieved pairs
    (bounded by k x n_queries) plus per-query relevant-doc totals."""
    q_sets = [(qid, set(ts)) for qid, ts in _BM25_QUERIES]

    def rel_rows(batch: pa.Table) -> pa.Table:
        tf, _ = term_count_table(batch["text"], batch["doc_id"])
        tdf = tf.to_pandas()
        qs, ds_ = [], []
        for qid, terms in q_sets:
            sub = tdf[tdf["term"].isin(terms)]
            if not len(sub):
                continue
            cnt = sub.groupby("doc_id")["term"].nunique()
            hit = cnt.index[cnt == len(terms)].to_numpy()
            qs.append(np.full(hit.size, qid, np.int64))
            ds_.append(hit.astype(np.int64))
        if not qs:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
            })
        return pa.table({
            "query_id": pa.array(np.concatenate(qs)),
            "doc_id": pa.array(np.concatenate(ds_)),
        })

    rel = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        rel_rows, batch_format="pyarrow"
    ).materialize()
    n_rel = {
        int(r["query_id"]): int(r["n"])
        for r in rel.groupby("query_id").aggregate(Count(alias_name="n")).take_all()
    }
    # rel ∩ top-10: broadcast the (tiny) retrieved pair set, filter the
    # rel stream — bounded by k × n_queries rows
    pair_keys = pa.array(
        (topk["query_id"].to_numpy() * (1 << 40) + topk["doc_id"].to_numpy()
         ).astype(np.int64)
    )

    def hit_filter(batch: pa.Table) -> pa.Table:
        key = pc.add(
            pc.multiply(batch["query_id"], pa.scalar(1 << 40, pa.int64())),
            batch["doc_id"],
        )
        return batch.filter(pc.is_in(key, value_set=pair_keys))

    hits = rel.map_batches(hit_filter, batch_format="pyarrow").to_pandas()
    hit_set = set(zip(hits["query_id"], hits["doc_id"])) if len(hits) else set()
    return hit_set, n_rel


def q_retrieval_mrr(sf_dir: str):
    """Mean-reciprocal-rank eval: per query, 1/rank of the FIRST
    relevant document in the BM25 top-10 (0.0 when none is relevant),
    relevance = "doc contains every query term" — the standard MRR
    definition (Voorhees, TREC-8 QA track).  Shares the streamed
    relevance machinery with the nDCG entry (_rel_hits)."""
    topk = q_bm25_topk(sf_dir)
    hit_set, _ = _rel_hits(sf_dir, topk)

    out_q, out_r = [], []
    for qid, _terms in _BM25_QUERIES:
        g = topk[topk["query_id"] == qid]
        ranks = g["rank"].to_numpy()[
            np.array([(qid, d) in hit_set for d in g["doc_id"]], dtype=bool)
        ]
        out_q.append(qid)
        out_r.append(round(1.0 / float(ranks.min()), 6) if ranks.size else 0.0)
    return pd.DataFrame({"query_id": out_q, "rr": out_r})


def _ranked_eval_prefix_sql(queries: list[tuple[int, list[str]]], k: int) -> str:
    """Shared CTE prefix for the ranked-eval oracles: BM25 top-k +
    the binary-relevance set (doc contains every query term)."""
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in queries for t in terms
    )
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
        "topk AS (SELECT query_id, doc_id, rank FROM ("
        "SELECT query_id, doc_id, CAST(row_number() OVER ("
        "PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id) "
        f"AS INTEGER) AS rank FROM scored) WHERE rank <= {k}), "
        "qt AS (SELECT query_id, count(DISTINCT term) AS nt FROM q "
        "GROUP BY query_id), "
        "relc AS (SELECT q.query_id, tf.doc_id, "
        "count(DISTINCT tf.term) AS c FROM q JOIN tf ON tf.term = q.term "
        "GROUP BY q.query_id, tf.doc_id), "
        "rel AS (SELECT relc.query_id, relc.doc_id FROM relc "
        "JOIN qt ON qt.query_id = relc.query_id AND relc.c = qt.nt)"
    )


def _mrr_sql(queries: list[tuple[int, list[str]]], k: int = 10) -> str:
    return (
        _ranked_eval_prefix_sql(queries, k) + ", "
        "best AS (SELECT t.query_id, min(t.rank) AS r FROM topk t "
        "JOIN rel ON rel.query_id = t.query_id AND rel.doc_id = t.doc_id "
        "GROUP BY t.query_id) "
        "SELECT qq.query_id, round(COALESCE(1.0 / b.r, 0), 6) AS rr "
        "FROM (SELECT DISTINCT query_id FROM q) qq "
        "LEFT JOIN best b ON b.query_id = qq.query_id "
        "ORDER BY qq.query_id"
    )


SQL_RETRIEVAL_MRR = _mrr_sql(_BM25_QUERIES)


def _ndcg_sql(queries: list[tuple[int, list[str]]], k: int = 10) -> str:
    return (
        _ranked_eval_prefix_sql(queries, k) + ", "
        "dcg AS (SELECT t.query_id, "
        "COALESCE(sum(CASE WHEN r.doc_id IS NOT NULL "
        "THEN 1.0 / log2(t.rank + 1) END), 0) AS dcg FROM topk t "
        "LEFT JOIN rel r ON r.query_id = t.query_id "
        "AND r.doc_id = t.doc_id GROUP BY t.query_id), "
        "nrel AS (SELECT query_id, count(*) AS n FROM rel GROUP BY query_id), "
        f"idcg AS (SELECT nrel.query_id, sum(1.0 / log2(g.x + 1)) AS idcg "
        f"FROM nrel JOIN range(1, {k} + 1) g(x) "
        f"ON g.x <= least(nrel.n, {k}) GROUP BY nrel.query_id) "
        "SELECT qq.query_id, round(COALESCE(d.dcg / i.idcg, 0), 6) AS ndcg "
        "FROM (SELECT DISTINCT query_id FROM q) qq "
        "LEFT JOIN dcg d ON d.query_id = qq.query_id "
        "LEFT JOIN idcg i ON i.query_id = qq.query_id "
        "ORDER BY qq.query_id"
    )


SQL_RETRIEVAL_NDCG = _ndcg_sql(_BM25_QUERIES)


def q_retrieval_bpref(sf_dir: str):
    """bpref eval (Buckley & Voorhees, SIGIR 2004 — the judgment-robust
    metric trec_eval reports as ``bpref``): with R = relevant count, N
    = nonrelevant count (here every corpus doc is judged, so N =
    n_docs - R), for each relevant doc retrieved in the top-10 the
    penalty is the number of NONrelevant docs ranked above it —
    ``bpref = (1/R) * sum_r (1 - min(nonrel_above_r, R) / min(R, N))``,
    0.0 when R = 0.  nonrel_above at rank i is ``i - relidx`` where
    relidx is the doc's 1-based index among retrieved relevant docs.
    Shares the streamed relevance machinery with nDCG/MAP/MRR
    (_rel_hits); only rel∩top10 plus two counts reach the driver."""
    topk = q_bm25_topk(sf_dir)
    hit_set, n_rel = _rel_hits(sf_dir, topk)
    n_docs = int(_docs(sf_dir, ["doc_id"]).count())

    out_q, out_b = [], []
    for qid, _terms in _BM25_QUERIES:
        g = topk[topk["query_id"] == qid]
        rel_mask = np.array(
            [(qid, d) in hit_set for d in g["doc_id"]], dtype=bool
        )
        ranks = np.sort(g["rank"].to_numpy()[rel_mask]).astype(np.int64)
        R = n_rel.get(qid, 0)
        N = n_docs - R
        if R == 0 or ranks.size == 0:
            out_q.append(qid)
            out_b.append(0.0)
            continue
        relidx = np.arange(1, ranks.size + 1)
        nonrel_above = ranks - relidx
        contrib = 1.0 - np.minimum(nonrel_above, R) / min(R, N)
        out_q.append(qid)
        out_b.append(round(float(np.sum(contrib)) / R, 6))
    return pd.DataFrame({"query_id": out_q, "bpref": out_b})


def _bpref_sql(queries: list[tuple[int, list[str]]], k: int = 10) -> str:
    return (
        _ranked_eval_prefix_sql(queries, k) + ", "
        "hits AS (SELECT t.query_id, t.rank, "
        "CAST(row_number() OVER (PARTITION BY t.query_id "
        "ORDER BY t.rank) AS BIGINT) AS relidx FROM topk t "
        "JOIN rel r ON r.query_id = t.query_id AND r.doc_id = t.doc_id), "
        "nrel AS (SELECT query_id, count(*) AS n FROM rel GROUP BY 1), "
        "bp AS (SELECT h.query_id, sum(1.0 - "
        "least(h.rank - h.relidx, nrel.n)::DOUBLE / "
        "least(nrel.n, (SELECT n_docs FROM stats) - nrel.n)) AS s "
        "FROM hits h JOIN nrel ON nrel.query_id = h.query_id "
        "GROUP BY h.query_id) "
        "SELECT qq.query_id, "
        "round(COALESCE(b.s / n.n, 0), 6) AS bpref "
        "FROM (SELECT DISTINCT query_id FROM q) qq "
        "LEFT JOIN bp b ON b.query_id = qq.query_id "
        "LEFT JOIN nrel n ON n.query_id = qq.query_id "
        "ORDER BY qq.query_id"
    )


SQL_RETRIEVAL_BPREF = _bpref_sql(_BM25_QUERIES)


def q_postings_size_stats(sf_dir: str):
    """Postings-list size accounting — the capacity-planning question
    a 100 TB index team answers before choosing a codec (Witten,
    Moffat & Bell ch.3): for the top-20 terms by df, the REAL varint
    codec's encoded byte count over the delta-gap stream (gaps =
    [d0+1] + strict diffs; stages/codec.varint_encode — the entry
    measures the engine's actual encoder, the oracle mirrors its
    closed form: bytes(g) = (floor(log2(g)) + 7) // 7), and the
    closed-form Golomb-Rice budget with the classic parameter k =
    floor(log2(mean gap)) (Rice bits per value v = g-1:
    (v >> k) + 1 + k).  Output: (term, df, varint_bytes, rice_k,
    rice_bits, varint_bits_per_posting, rice_bits_per_posting).

    Shape: gaps derive per term from the reduced (term, doc_id)
    presence table inside map_groups — postings never leave their
    group; only 20 one-row summaries reach the driver."""
    from ...stages.codec import varint_encode

    def pres(batch: pa.Table) -> pa.Table:
        tf, _ = term_count_table(batch["text"], batch["doc_id"])
        return tf.select(["term", "doc_id"])

    pres_ds = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(pres, batch_format="pyarrow")
    )

    def per_term(g: pd.DataFrame) -> pd.DataFrame:
        d = np.sort(g["doc_id"].to_numpy(np.int64))
        gaps = np.empty(d.size, np.int64)
        gaps[0] = d[0] + 1
        gaps[1:] = np.diff(d)
        vb = len(varint_encode(gaps.astype(np.uint64)))
        m = int(gaps.sum()) // gaps.size
        k = 0 if m <= 1 else int(math.floor(math.log2(m)))
        v = gaps - 1
        rice_bits = int(np.sum(v >> k)) + gaps.size * (1 + k)
        df_ = gaps.size
        return pd.DataFrame({
            "term": [g["term"].iloc[0]],
            "df": np.array([df_], np.int64),
            "varint_bytes": np.array([vb], np.int64),
            "rice_k": np.array([k], np.int64),
            "rice_bits": np.array([rice_bits], np.int64),
            "varint_bpp": [round(8.0 * vb / df_, 6)],
            "rice_bpp": [round(rice_bits / df_, 6)],
        })

    out = (
        pres_ds.groupby("term")
        .map_groups(per_term, batch_format="pandas")
        .to_pandas()
        .sort_values(["df", "term"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )
    return out


SQL_POSTINGS_SIZE_STATS = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "p AS (SELECT DISTINCT term, doc_id FROM toks), "
    "gp AS (SELECT term, CASE WHEN lag(doc_id) OVER w IS NULL "
    "THEN doc_id + 1 ELSE doc_id - lag(doc_id) OVER w END AS g "
    "FROM p WINDOW w AS (PARTITION BY term ORDER BY doc_id)), "
    "kk AS (SELECT term, CAST(count(*) AS BIGINT) AS df, "
    "CASE WHEN sum(g) // count(*) <= 1 THEN 0 "
    "ELSE CAST(floor(log2(sum(g) // count(*))) AS BIGINT) END AS k "
    "FROM gp GROUP BY term), "
    "sz AS (SELECT gp.term, kk.df, kk.k, "
    "CAST(sum((CAST(floor(log2(gp.g)) AS BIGINT) + 7) // 7) AS BIGINT) "
    "AS varint_bytes, "
    "CAST(sum((gp.g - 1) // (1 << kk.k)) + kk.df * (1 + kk.k) "
    "AS BIGINT) AS rice_bits "
    "FROM gp JOIN kk ON kk.term = gp.term "
    "GROUP BY gp.term, kk.df, kk.k) "
    "SELECT term, df, varint_bytes, k AS rice_k, rice_bits, "
    "round(8.0 * varint_bytes / df, 6) AS varint_bpp, "
    "round(rice_bits::DOUBLE / df, 6) AS rice_bpp FROM sz "
    "ORDER BY df DESC, term LIMIT 20"
)


_SWEEP_GRID = ((0.9, 0.4), (1.2, 0.75), (2.0, 0.9))


def q_bm25_param_sweep(sf_dir: str):
    """BM25 (k1, b) parameter sweep scored by mean nDCG@10 — the
    tuning loop every search team runs before committing similarity
    settings (Trotman et al., ADCS 2014 showed the defaults are
    rarely optimal): THREE pinned configs score in ONE corpus pass
    (per-batch vectorized contributions for all configs and queries
    simultaneously, local top-k combiners per (config, query) — a doc
    lives in one batch, so partials merge by simple concat), then
    each config's run evaluates against the shared binary relevance.
    Output: (k1, b, mean_ndcg), mean over per-query round-6 nDCG.
    The oracle unrolls the identical three scorers as parametrized
    CTE chains over one shared stats prefix."""
    k = 10
    dfs = {
        r["term"]: int(r["df"])
        for r in _term_partials(sf_dir)
        .groupby("term")
        .aggregate(Sum("df_p", alias_name="df"))
        .take_all()
    }
    cf_total = 0
    n_docs = 0
    for r in (
        _term_partials(sf_dir)
        .groupby("term")
        .aggregate(Sum("cf_p", alias_name="cf"))
        .take_all()
    ):
        cf_total += int(r["cf"])
    n_docs = int(_docs(sf_dir, ["doc_id"]).count())
    avgdl = cf_total / n_docs
    idfs = {
        t: math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        for t, df in dfs.items()
    }
    iref = ray.put(idfs)
    q_terms = {qid: sorted(set(ts)) for qid, ts in _BM25_QUERIES}
    grid = _SWEEP_GRID

    def score(batch: pa.Table) -> pa.Table:
        idf = ray.get(iref)
        tf, doc_len = term_count_table(batch["text"], batch["doc_id"])
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)
        dl_of = dict(zip(dids.tolist(), doc_len.tolist()))
        tdf = tf.to_pandas()
        out = {"cfg": [], "query_id": [], "doc_id": [], "score": []}
        for qid, terms in q_terms.items():
            sub = tdf[tdf["term"].isin(terms)]
            if not len(sub):
                continue
            tfs = sub["tf"].to_numpy(np.float64)
            dls = np.array(
                [dl_of[d] for d in sub["doc_id"]], np.float64
            )
            w_idf = np.array([idf[t] for t in sub["term"]], np.float64)
            for ci, (k1, b) in enumerate(grid):
                contrib = w_idf * (tfs * (k1 + 1.0)) / (
                    tfs + k1 * (1.0 - b + b * dls / avgdl)
                )
                s = pd.DataFrame({
                    "doc_id": sub["doc_id"].to_numpy(),
                    "c": contrib,
                }).groupby("doc_id", sort=True)["c"].sum()
                sc = np.round(s.to_numpy(np.float64), 6)
                order = np.lexsort((s.index.to_numpy(), -sc))[:2 * k]
                out["cfg"].extend([ci] * order.size)
                out["query_id"].extend([qid] * order.size)
                out["doc_id"].extend(s.index.to_numpy()[order])
                out["score"].extend(sc[order])
        return pa.table({
            "cfg": pa.array(out["cfg"], pa.int64()),
            "query_id": pa.array(out["query_id"], pa.int64()),
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "score": pa.array(out["score"], pa.float64()),
        })

    parts = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(score, batch_format="pyarrow")
        .to_pandas()
    )
    # union of every config's window feeds ONE relevance pass
    allw = parts[["query_id", "doc_id"]].drop_duplicates()
    allw = allw.assign(rank=1)
    hit_set, n_rel = _rel_hits(sf_dir, allw)

    rows = []
    for ci, (k1, b) in enumerate(grid):
        nds = []
        for qid, _terms in _BM25_QUERIES:
            g = parts[(parts["cfg"] == ci) & (parts["query_id"] == qid)]
            g = g.sort_values(
                ["score", "doc_id"], ascending=[False, True]
            ).head(k)
            ranks = np.arange(1, len(g) + 1, dtype=np.float64)
            rel = np.array(
                [(qid, d) in hit_set for d in g["doc_id"]], dtype=bool
            )
            dcg = float(np.sum(1.0 / np.log2(ranks[rel] + 1.0)))
            nr = min(n_rel.get(qid, 0), k)
            idcg = float(
                np.sum(1.0 / np.log2(np.arange(1, nr + 1) + 1.0))
            )
            nds.append(round(dcg / idcg, 6) if idcg > 0 else 0.0)
        rows.append((k1, b, round(sum(nds) / len(nds), 6)))
    return pd.DataFrame(rows, columns=["k1", "b", "mean_ndcg"])


def _sql_bm25_param_sweep(k: int = 10) -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    parts = [
        f"toks AS ({_TOKS_SQL})",
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id)",
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl)",
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
        "GROUP BY doc_id, term)",
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)",
        f"q(query_id, term) AS (VALUES {vals})",
        "qt AS (SELECT query_id, count(DISTINCT term) AS nt FROM q "
        "GROUP BY query_id)",
        "relc AS (SELECT q.query_id, tf.doc_id, "
        "count(DISTINCT tf.term) AS c FROM q JOIN tf ON tf.term = q.term "
        "GROUP BY q.query_id, tf.doc_id)",
        "rel AS (SELECT relc.query_id, relc.doc_id FROM relc "
        "JOIN qt ON qt.query_id = relc.query_id AND relc.c = qt.nt)",
        "nrel AS (SELECT query_id, count(*) AS n FROM rel GROUP BY 1)",
        f"idcg AS (SELECT nrel.query_id, sum(1.0 / log2(g.x + 1)) "
        f"AS idcg FROM nrel JOIN range(1, {k} + 1) g(x) "
        f"ON g.x <= least(nrel.n, {k}) GROUP BY nrel.query_id)",
    ]
    sels = []
    for ci, (k1, b) in enumerate(_SWEEP_GRID):
        body = (
            f"(SELECT q.query_id, tf.doc_id, "
            "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * "
            f"(tf.tf * ({k1} + 1.0)) / "
            f"(tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / "
            "(s.total::DOUBLE / s.n_docs)))) AS score "
            "FROM q JOIN tf ON q.term = tf.term "
            "JOIN df ON df.term = q.term "
            "JOIN dl ON dl.doc_id = tf.doc_id "
            "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id)"
        )
        parts.append(
            f"top{ci} AS (SELECT query_id, doc_id, rank FROM ("
            "SELECT query_id, doc_id, CAST(row_number() OVER ("
            "PARTITION BY query_id ORDER BY round(score, 6) DESC, "
            f"doc_id) AS INTEGER) AS rank FROM {body}) WHERE rank <= {k})"
        )
        parts.append(
            f"dcg{ci} AS (SELECT t.query_id, "
            "COALESCE(sum(CASE WHEN r.doc_id IS NOT NULL "
            f"THEN 1.0 / log2(t.rank + 1) END), 0) AS dcg FROM top{ci} t "
            "LEFT JOIN rel r ON r.query_id = t.query_id "
            "AND r.doc_id = t.doc_id GROUP BY t.query_id)"
        )
        parts.append(
            f"nd{ci} AS (SELECT qq.query_id, "
            "round(COALESCE(d.dcg / i.idcg, 0), 6) AS nd "
            "FROM (SELECT DISTINCT query_id FROM q) qq "
            f"LEFT JOIN dcg{ci} d ON d.query_id = qq.query_id "
            "LEFT JOIN idcg i ON i.query_id = qq.query_id)"
        )
        sels.append(
            f"SELECT {k1} AS k1, {b} AS b, "
            f"round(avg(nd), 6) AS mean_ndcg FROM nd{ci}"
        )
    return "WITH " + ", ".join(parts) + " " + " UNION ALL ".join(sels)


SQL_BM25_PARAM_SWEEP = _sql_bm25_param_sweep()


_FC_BLOCK = 8   # dictionary terms per front-coding block


def q_dict_front_coding(sf_dir: str):
    """Front-coded term dictionary (Witten, Moffat & Bell, "Managing
    Gigabytes" §4 — the blocked shared-prefix layout every on-disk
    lexicon from Lucene's terms dict onward descends from): the
    sorted vocabulary splits into blocks of 8; each block head stores
    the full term, every other term stores (lcp with its PREDECESSOR,
    suffix).  Output per term: (rank, term, block_id, is_head, lcp,
    suffix) — the oracle re-derives the layout with a window lag and
    a prefix-equality list_filter, so the decode proof is the hash
    match itself.  In the real index this coding runs per segment
    inside the build actor over its own sorted term run (the
    dictionary here is corpus-small; the layout rule is what's being
    pinned)."""
    vocab = sorted(
        r["term"]
        for r in _term_partials(sf_dir)
        .groupby("term")
        .aggregate(Count(alias_name="df"))
        .take_all()
    )
    rows = []
    prev = None
    for i, t in enumerate(vocab):
        rank = i + 1
        block_id = i // _FC_BLOCK
        is_head = 1 if i % _FC_BLOCK == 0 else 0
        if is_head:
            lcp = 0
            suffix = t
        else:
            lcp = 0
            for a, b in zip(t, prev):
                if a != b:
                    break
                lcp += 1
            suffix = t[lcp:]
        rows.append((rank, t, block_id, is_head, lcp, suffix))
        prev = t
    return pd.DataFrame(
        rows,
        columns=["rank", "term", "block_id", "is_head", "lcp", "suffix"],
    ).astype({
        "rank": "int64", "block_id": "int64", "is_head": "int64",
        "lcp": "int64",
    })


def _sql_dict_front_coding() -> str:
    lcp = (
        "len(list_filter(range(1, least(length(term), length(prev)) + 1), "
        "i -> substr(term, 1, CAST(i AS INT)) "
        "= substr(prev, 1, CAST(i AS INT))))"
    )
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "v AS (SELECT term FROM toks GROUP BY term), "
        "r AS (SELECT term, CAST(row_number() OVER (ORDER BY term) "
        "AS BIGINT) AS rank FROM v), "
        f"b AS (SELECT term, rank, (rank - 1) // {_FC_BLOCK} AS block_id, "
        "lag(term) OVER (PARTITION BY (rank - 1) // "
        f"{_FC_BLOCK} ORDER BY rank) AS prev FROM r), "
        "c AS (SELECT term, rank, block_id, "
        "CASE WHEN prev IS NULL THEN 1 ELSE 0 END AS is_head, "
        f"CASE WHEN prev IS NULL THEN 0 ELSE {lcp} END AS lcp FROM b) "
        "SELECT rank, term, CAST(block_id AS BIGINT) AS block_id, "
        "CAST(is_head AS BIGINT) AS is_head, CAST(lcp AS BIGINT) AS lcp, "
        "substr(term, CAST(lcp AS INT) + 1) AS suffix FROM c "
        "ORDER BY rank"
    )


SQL_DICT_FRONT_CODING = _sql_dict_front_coding()


def q_rsj_feedback_topk(sf_dir: str):
    """Robertson-Sparck-Jones relevance-weight ranking (RSJ 1976 —
    the binary-independence ancestor of BM25, with TRUE relevance
    feedback): with N docs, per-term df n, per-query relevant count R
    and r = relevant docs containing the term, each query term weighs
    ``w = ln(((r+0.5)*(N-n-R+r+0.5)) / ((n-r+0.5)*(R-r+0.5)))`` and a
    doc scores the sum of w over the query terms it CONTAINS
    (presence, not tf — the BIM).  Under the shared all-terms
    relevance rule r = R by construction (every relevant doc contains
    every query term), which the oracle mirrors.  Top-10 by
    (round(score, 6) DESC, doc_id).

    Shape: df via the term-partials combiner; R from the streamed
    relevance pass; the tiny (query, term) weight table broadcasts
    into a per-batch presence scorer with local top-k partials —
    docs never shuffle."""
    k = 10
    n_docs = int(_docs(sf_dir, ["doc_id"]).count())
    dfs = {
        r["term"]: int(r["df"])
        for r in _term_partials(sf_dir)
        .groupby("term")
        .aggregate(Sum("df_p", alias_name="df"))
        .take_all()
    }
    # R per query: count the full streamed relevance set
    dummy = pd.DataFrame({
        "query_id": pd.Series([], dtype=np.int64),
        "doc_id": pd.Series([], dtype=np.int64),
        "rank": pd.Series([], dtype=np.int64),
    })
    _hits, n_rel = _rel_hits(sf_dir, dummy)
    weights: dict[tuple[int, str], float] = {}
    for qid, terms in _BM25_QUERIES:
        R = n_rel.get(qid, 0)
        for t in set(terms):
            n = dfs.get(t, 0)
            r = R
            weights[(qid, t)] = math.log(
                ((r + 0.5) * (n_docs - n - R + r + 0.5))
                / ((n - r + 0.5) * (R - r + 0.5))
            )
    wref = ray.put(weights)
    q_terms = {qid: sorted(set(ts)) for qid, ts in _BM25_QUERIES}

    def score(batch: pa.Table) -> pa.Table:
        w = ray.get(wref)
        tf, _ = term_count_table(batch["text"], batch["doc_id"])
        tdf = tf.to_pandas()
        out_q, out_d, out_s = [], [], []
        for qid, terms in q_terms.items():
            sub = tdf[tdf["term"].isin(terms)]
            if not len(sub):
                continue
            # presence: distinct (doc, term); sum weights in sorted
            # term order (ascending), the pinned accumulation order
            pres = sub.drop_duplicates(["doc_id", "term"]).sort_values(
                ["doc_id", "term"]
            )
            for did, g in pres.groupby("doc_id"):
                s = 0.0
                for t in g["term"]:
                    s += w[(qid, t)]
                out_q.append(qid)
                out_d.append(int(did))
                out_s.append(s)
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "doc_id": pa.array(out_d, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })

    res = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(score, batch_format="pyarrow")
        .to_pandas()
    )
    return _rerank_rounded(res, k=k)


def _sql_rsj_feedback(k: int = 10) -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    w = (
        "ln(((nr.n + 0.5) * (s.n_docs - df.df - nr.n + nr.n + 0.5)) "
        "/ ((df.df - nr.n + 0.5) * (nr.n - nr.n + 0.5)))"
    )
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
        "GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        "s AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "qd AS (SELECT DISTINCT query_id, term FROM q), "
        "qt AS (SELECT query_id, count(DISTINCT term) AS nt FROM q "
        "GROUP BY query_id), "
        "relc AS (SELECT q.query_id, tf.doc_id, "
        "count(DISTINCT tf.term) AS c FROM q JOIN tf ON tf.term = q.term "
        "GROUP BY q.query_id, tf.doc_id), "
        "rel AS (SELECT relc.query_id, relc.doc_id FROM relc "
        "JOIN qt ON qt.query_id = relc.query_id AND relc.c = qt.nt), "
        "nr AS (SELECT qq.query_id, "
        "COALESCE(r.n, 0) AS n FROM (SELECT DISTINCT query_id FROM q) qq "
        "LEFT JOIN (SELECT query_id, count(*) AS n FROM rel "
        "GROUP BY 1) r ON r.query_id = qq.query_id), "
        "scored AS (SELECT qd.query_id, tf.doc_id, "
        f"sum({w}) AS score "
        "FROM qd JOIN tf ON tf.term = qd.term "
        "JOIN df ON df.term = qd.term "
        "JOIN nr ON nr.query_id = qd.query_id CROSS JOIN s "
        "GROUP BY qd.query_id, tf.doc_id) "
        "SELECT query_id, rank, doc_id, score FROM ("
        "SELECT query_id, doc_id, round(score, 6) AS score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored) "
        f"WHERE rank <= {k} ORDER BY query_id, rank"
    )


SQL_RSJ_FEEDBACK_TOPK = _sql_rsj_feedback()


def q_retrieval_success(sf_dir: str):
    """Success@k (trec_eval ``success_1,5,10``; the QA-track "did any
    relevant doc make the cut" rates): the fraction of queries whose
    BM25 run places at least one relevant doc in the top 1 / 5 / 10.
    One summary row; rates are exact small rationals rounded to 6.
    Shares the _rel_hits machinery."""
    topk = q_bm25_topk(sf_dir)
    hit_set, _ = _rel_hits(sf_dir, topk)
    best: dict[int, int] = {}
    for qid, _terms in _BM25_QUERIES:
        g = topk[topk["query_id"] == qid]
        rel = [
            int(r) for r, d in zip(g["rank"], g["doc_id"])
            if (qid, d) in hit_set
        ]
        if rel:
            best[qid] = min(rel)
    nq = len(_BM25_QUERIES)
    out = {
        f"success_{k}": [
            round(sum(1 for r in best.values() if r <= k) / nq, 6)
        ]
        for k in (1, 5, 10)
    }
    out["n_queries"] = [nq]
    df = pd.DataFrame(out)
    return df.astype({"n_queries": "int64"})


def _success_sql(queries: list[tuple[int, list[str]]], k: int = 10) -> str:
    nq = len(queries)
    return (
        _ranked_eval_prefix_sql(queries, k) + ", "
        "best AS (SELECT t.query_id, min(t.rank) AS r FROM topk t "
        "JOIN rel ON rel.query_id = t.query_id "
        "AND rel.doc_id = t.doc_id GROUP BY t.query_id) "
        "SELECT "
        f"round(sum(CASE WHEN r <= 1 THEN 1 ELSE 0 END)::DOUBLE / {nq}, 6) "
        "AS success_1, "
        f"round(sum(CASE WHEN r <= 5 THEN 1 ELSE 0 END)::DOUBLE / {nq}, 6) "
        "AS success_5, "
        f"round(sum(CASE WHEN r <= 10 THEN 1 ELSE 0 END)::DOUBLE / {nq}, 6) "
        "AS success_10, "
        f"CAST({nq} AS BIGINT) AS n_queries FROM best"
    )


SQL_RETRIEVAL_SUCCESS = _success_sql(_BM25_QUERIES)


_LTR_WINDOW = 50
_LTR_W = (0.6, -0.1, 0.25, 0.5)   # (bm25, ln(1+dl), ln(1+tf_sum), frac)


def q_ltr_rerank(sf_dir: str):
    """Linear learning-to-rank re-ranking (the ES LTR / Solr LTR
    two-phase serving shape: cheap first-phase BM25 window, feature
    extraction on the window, model re-scoring): over each query's
    published top-50 BM25 window, features f1 = bm25 score (rounded,
    as published), f2 = ln(1+dl), f3 = ln(1+sum of query-term tf),
    f4 = matched-terms fraction, combined with the PINNED weight
    vector (0.6, -0.1, 0.25, 0.5) in that order; re-rank to top-10 by
    (round(score, 6) DESC, doc_id).  Feature extraction streams the
    corpus once with the candidate pair set broadcast (bounded k x
    n_queries rows reach the driver — in production the window rides
    the searcher actors, same rows)."""
    res = search(
        _build_docs_index(sf_dir), _query_terms_ds(_BM25_QUERIES),
        k=2 * _LTR_WINDOW, concurrency=2,
    ).to_pandas()
    win = _rerank_rounded(res, k=_LTR_WINDOW)
    q_terms = {qid: set(ts) for qid, ts in _BM25_QUERIES}
    nt = {qid: len(ts) for qid, ts in q_terms.items()}
    cand: dict[int, set[int]] = {}
    for qid, d in zip(win["query_id"], win["doc_id"]):
        cand.setdefault(int(qid), set()).add(int(d))
    all_cand_docs = set().union(*cand.values()) if cand else set()

    def feats(batch: pa.Table) -> pa.Table:
        tf, doc_len = term_count_table(batch["text"], batch["doc_id"])
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)
        dl_of = dict(zip(dids.tolist(), doc_len.tolist()))
        tdf = tf.to_pandas()
        tdf = tdf[tdf["doc_id"].isin(all_cand_docs)]
        out_q, out_d, out_ts, out_nm, out_dl = [], [], [], [], []
        for qid, terms in q_terms.items():
            sub = tdf[
                tdf["term"].isin(terms)
                & tdf["doc_id"].isin(cand[qid])
            ]
            if not len(sub):
                continue
            g = sub.groupby("doc_id")["tf"].agg(["sum", "count"])
            out_q.extend([qid] * len(g))
            out_d.extend(g.index.tolist())
            out_ts.extend(g["sum"].tolist())
            out_nm.extend(g["count"].tolist())
            out_dl.extend(int(dl_of[d]) for d in g.index)
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "doc_id": pa.array(out_d, pa.int64()),
            "tf_sum": pa.array(out_ts, pa.int64()),
            "n_match": pa.array(out_nm, pa.int64()),
            "dl": pa.array(out_dl, pa.int64()),
        })

    fdf = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(feats, batch_format="pyarrow")
        .to_pandas()
    )
    m = win.merge(fdf, on=["query_id", "doc_id"], how="inner")
    w0, w1, w2, w3 = _LTR_W
    m["score"] = (
        w0 * m["score"].to_numpy(np.float64)
        + w1 * np.log(1.0 + m["dl"].to_numpy(np.float64))
        + w2 * np.log(1.0 + m["tf_sum"].to_numpy(np.float64))
        + w3 * (
            m["n_match"].to_numpy(np.float64)
            / np.array([nt[q] for q in m["query_id"]], np.float64)
        )
    )
    return _rerank_rounded(m[["query_id", "doc_id", "score"]], k=10)


def _sql_ltr_rerank(k: int = 10) -> str:
    w0, w1, w2, w3 = _LTR_W
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
        "GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "qt AS (SELECT query_id, count(DISTINCT term) AS nt FROM q "
        "GROUP BY query_id), "
        "scored AS (SELECT q.query_id, tf.doc_id, "
        "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
        "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
        ") AS score FROM q JOIN tf ON q.term = tf.term "
        "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id), "
        "win AS (SELECT query_id, doc_id, s FROM ("
        "SELECT query_id, doc_id, round(score, 6) AS s, "
        "row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS rn FROM scored) "
        f"WHERE rn <= {_LTR_WINDOW}), "
        "f AS (SELECT q.query_id, tf.doc_id, sum(tf.tf) AS tf_sum, "
        "count(DISTINCT tf.term) AS nm FROM q JOIN tf ON tf.term = q.term "
        "GROUP BY 1, 2), "
        "ltr AS (SELECT w.query_id, w.doc_id, "
        f"round({w0} * w.s + ({w1}) * ln(1.0 + dl.dl) "
        f"+ {w2} * ln(1.0 + f.tf_sum) "
        f"+ {w3} * (f.nm::DOUBLE / qt.nt), 6) AS score "
        "FROM win w JOIN f ON f.query_id = w.query_id "
        "AND f.doc_id = w.doc_id "
        "JOIN dl ON dl.doc_id = w.doc_id "
        "JOIN qt ON qt.query_id = w.query_id) "
        "SELECT query_id, rank, doc_id, score FROM ("
        "SELECT query_id, doc_id, score, CAST(row_number() OVER ("
        "PARTITION BY query_id ORDER BY score DESC, doc_id) AS INTEGER) "
        "AS rank FROM ltr) "
        f"WHERE rank <= {k} ORDER BY query_id, rank"
    )


SQL_LTR_RERANK = _sql_ltr_rerank()


def q_retrieval_iprec(sf_dir: str):
    """11-point interpolated precision-recall curve (trec_eval's
    ``iprec_at_recall_0.00 .. 1.00`` — the classic PR-curve summary
    every TREC overview plots): per query, at recall level r the
    interpolated precision is max{prec@i : recall@i >= r} over the
    BM25 top-10 (0 when unreachable), averaged over ALL queries
    (zero-relevant queries contribute 0 at every level).  recall@i
    and prec@i come from the same relidx/rank arithmetic as bpref;
    levels are i/10.0 on both engines.  Output: 11 rows
    (recall_level, iprec)."""
    topk = q_bm25_topk(sf_dir)
    hit_set, n_rel = _rel_hits(sf_dir, topk)

    per_query: list[np.ndarray] = []
    for qid, _terms in _BM25_QUERIES:
        g = topk[topk["query_id"] == qid]
        rel_mask = np.array(
            [(qid, d) in hit_set for d in g["doc_id"]], dtype=bool
        )
        ranks = np.sort(g["rank"].to_numpy()[rel_mask]).astype(np.float64)
        R = n_rel.get(qid, 0)
        ip = np.zeros(11, dtype=np.float64)
        if R > 0 and ranks.size:
            relidx = np.arange(1, ranks.size + 1, dtype=np.float64)
            prec = relidx / ranks
            rec = relidx / R
            for li in range(11):
                lvl = li / 10.0
                m = rec >= lvl
                ip[li] = float(prec[m].max()) if m.any() else 0.0
        per_query.append(ip)
    nq = len(per_query)
    mean = np.array([
        sum(ip[li] for ip in per_query) / nq for li in range(11)
    ])
    return pd.DataFrame({
        "recall_level": np.arange(11, dtype=np.float64) / 10.0,
        "iprec": np.round(mean, 6),
    })


def _iprec_sql(queries: list[tuple[int, list[str]]], k: int = 10) -> str:
    nq = len(queries)
    return (
        _ranked_eval_prefix_sql(queries, k) + ", "
        "hits AS (SELECT t.query_id, t.rank, "
        "CAST(row_number() OVER (PARTITION BY t.query_id "
        "ORDER BY t.rank) AS BIGINT) AS relidx FROM topk t "
        "JOIN rel r ON r.query_id = t.query_id AND r.doc_id = t.doc_id), "
        "nrel AS (SELECT query_id, count(*) AS n FROM rel GROUP BY 1), "
        "pts AS (SELECT h.query_id, "
        "h.relidx::DOUBLE / h.rank AS p, "
        "h.relidx::DOUBLE / nrel.n AS r "
        "FROM hits h JOIN nrel ON nrel.query_id = h.query_id), "
        "lv AS (SELECT CAST(g.x AS DOUBLE) / 10.0 AS lvl FROM "
        "range(0, 11) g(x)), "
        "qq AS (SELECT DISTINCT query_id FROM q), "
        "iq AS (SELECT qq.query_id, lv.lvl, "
        "COALESCE(max(p.p) FILTER (p.r >= lv.lvl), 0.0) AS ip "
        "FROM qq CROSS JOIN lv "
        "LEFT JOIN pts p ON p.query_id = qq.query_id "
        "GROUP BY qq.query_id, lv.lvl) "
        f"SELECT lvl AS recall_level, round(sum(ip) / {nq}, 6) AS iprec "
        "FROM iq GROUP BY lvl ORDER BY lvl"
    )


SQL_RETRIEVAL_IPREC = _iprec_sql(_BM25_QUERIES)


def q_retrieval_gmap(sf_dir: str):
    """GMAP — geometric-mean average precision (the TREC Robust track's
    headline metric; trec_eval ``gm_map``): ``exp(mean(ln(max(ap,
    1e-5))))`` over the per-query APs, the floor pinning the
    zero-relevant queries the arithmetic MAP hides.  Operates on the
    PUBLISHED per-query AP values (the round(ap, 6) outputs of
    retrieval_map), mirrored in the oracle by wrapping the same MAP
    body.  One summary row: (gmap, n_queries)."""
    aps = q_retrieval_map(sf_dir)["ap"].to_numpy(np.float64)
    g = math.exp(
        sum(math.log(max(float(a), 1e-5)) for a in aps) / aps.size
    )
    return pd.DataFrame({
        "gmap": [round(g, 6)],
        "n_queries": np.array([aps.size], dtype=np.int64),
    })


# SQL_RETRIEVAL_GMAP is defined beside _map_sql (later in the file) —
# it wraps the MAP oracle body, which doesn't exist yet at this point.


def q_retrieval_err(sf_dir: str):
    """Expected reciprocal rank (Chapelle, Metlzer, Zhang & Grinspan,
    CIKM 2009 — the cascade-model metric in ES ``rank_eval``): with the
    shared binary relevance, the per-doc stop probability is
    R = (2^1 - 1)/2^1 = 0.5, so ERR@10 = sum over relevant ranks r of
    0.5^(c_r) * 0.5 / r where c_r counts relevant docs ABOVE r (the
    cascade's survival).  Powers of 0.5 are exact in fp; the Ray side
    walks the (bounded, k x queries) rel∩top10 intersection, identical
    scale shape to MAP/nDCG."""
    k = 10
    topk = q_bm25_topk(sf_dir)
    hit_set, _n_rel = _rel_hits(sf_dir, topk)

    out_q, out_e = [], []
    for qid, _terms in _BM25_QUERIES:
        g = topk[topk["query_id"] == qid]
        rel_mask = np.array(
            [(qid, d) in hit_set for d in g["doc_id"]], dtype=bool
        )
        ranks = np.sort(g["rank"].to_numpy()[rel_mask]).astype(np.float64)
        err = float(np.sum(np.power(0.5, np.arange(ranks.size)) * 0.5 / ranks))
        out_q.append(qid)
        out_e.append(round(err, 6))
    return pd.DataFrame({"query_id": out_q, "err": out_e})


def _err_sql(queries: list[tuple[int, list[str]]], k: int = 10) -> str:
    return (
        _ranked_eval_prefix_sql(queries, k) + ", "
        "hits AS (SELECT t.query_id, t.rank, "
        "CAST(row_number() OVER (PARTITION BY t.query_id "
        "ORDER BY t.rank) - 1 AS DOUBLE) AS prior FROM topk t "
        "JOIN rel r ON r.query_id = t.query_id AND r.doc_id = t.doc_id), "
        "err AS (SELECT query_id, sum(power(0.5, prior) * 0.5 / rank) "
        "AS err FROM hits GROUP BY query_id) "
        "SELECT qq.query_id, round(COALESCE(e.err, 0), 6) AS err "
        "FROM (SELECT DISTINCT query_id FROM q) qq "
        "LEFT JOIN err e ON e.query_id = qq.query_id ORDER BY qq.query_id"
    )


SQL_RETRIEVAL_ERR = _err_sql(_BM25_QUERIES)


_RBP_P = 0.8


def q_retrieval_rbp(sf_dir: str):
    """Rank-biased precision (Moffat & Zobel, TOIS 2008; persistence
    p = 0.8 pinned): RBP = (1-p) * sum over relevant ranks r of
    p^(r-1) — the user-model metric whose weight mass is explicit
    (top-10 truncation leaves a known residual).  Same bounded
    rel∩top10 scale shape as MAP/nDCG/ERR."""
    k = 10
    topk = q_bm25_topk(sf_dir)
    hit_set, _n_rel = _rel_hits(sf_dir, topk)
    out_q, out_r = [], []
    for qid, _terms in _BM25_QUERIES:
        g = topk[topk["query_id"] == qid]
        rel_mask = np.array(
            [(qid, d) in hit_set for d in g["doc_id"]], dtype=bool
        )
        ranks = g["rank"].to_numpy(np.float64)[rel_mask]
        rbp = float((1.0 - _RBP_P) * np.sum(np.power(_RBP_P, ranks - 1.0)))
        out_q.append(qid)
        out_r.append(round(rbp, 6))
    return pd.DataFrame({"query_id": out_q, "rbp": out_r})


def _rbp_sql(queries: list[tuple[int, list[str]]], k: int = 10,
             p: float = _RBP_P) -> str:
    return (
        _ranked_eval_prefix_sql(queries, k) + ", "
        f"rb AS (SELECT t.query_id, sum((1 - {p}) * power({p}, t.rank - 1)) "
        "AS rbp FROM topk t JOIN rel r ON r.query_id = t.query_id "
        "AND r.doc_id = t.doc_id GROUP BY 1) "
        "SELECT qq.query_id, round(COALESCE(rb.rbp, 0), 6) AS rbp "
        "FROM (SELECT DISTINCT query_id FROM q) qq "
        "LEFT JOIN rb ON rb.query_id = qq.query_id ORDER BY qq.query_id"
    )


SQL_RETRIEVAL_RBP = _rbp_sql(_BM25_QUERIES)


_RBO_P = 0.9


def q_rank_rbo(sf_dir: str):
    """Rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010;
    persistence p = 0.9, truncated at depth 10) between the BM25 and
    LM-Dirichlet rankings of the SAME queries over the SAME index —
    the top-weighted ranking-similarity diagnostic for model rollouts
    (how much does switching similarity actually change what users
    see?).  RBO@10 = (1-p) * sum over depths d of p^(d-1) * |A_d ∩
    B_d| / d, with A_d/B_d the rank-<=d prefixes."""
    k = 10
    a = q_bm25_topk(sf_dir)
    b = q_lmd_topk(sf_dir)
    out_q, out_r = [], []
    for qid, _terms in _BM25_QUERIES:
        ra = {
            int(d): int(r)
            for d, r in zip(
                a.loc[a["query_id"] == qid, "doc_id"],
                a.loc[a["query_id"] == qid, "rank"],
            )
        }
        rb = {
            int(d): int(r)
            for d, r in zip(
                b.loc[b["query_id"] == qid, "doc_id"],
                b.loc[b["query_id"] == qid, "rank"],
            )
        }
        common = [
            (ra[d], rb[d]) for d in set(ra) & set(rb)
        ]
        rbo = 0.0
        for depth in range(1, k + 1):
            ov = sum(1 for x, y in common if x <= depth and y <= depth)
            rbo += (_RBO_P ** (depth - 1)) * ov / depth
        rbo *= 1.0 - _RBO_P
        out_q.append(qid)
        out_r.append(round(rbo, 6))
    return pd.DataFrame({"query_id": out_q, "rbo": out_r})


def _rbo_sql(queries: list[tuple[int, list[str]]], k: int = 10,
             p: float = _RBO_P) -> str:
    """Both ranked lists re-derived independently (the exact-BM25 body
    and the LMD body share only the token CTEs), joined per doc, then
    the truncated RBO sum over an explicit depth table."""
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in queries for t in terms
    )
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total, "
        "sum(dl) AS t_total FROM dl), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
        "GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        "cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "qd AS (SELECT DISTINCT query_id, term FROM q), "
        "sca AS (SELECT q.query_id, tf.doc_id, "
        "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
        "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
        ") AS score FROM q JOIN tf ON q.term = tf.term "
        "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id), "
        "ra AS (SELECT query_id, doc_id, rank FROM ("
        "SELECT query_id, doc_id, CAST(row_number() OVER ("
        "PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id) "
        f"AS INTEGER) AS rank FROM sca) WHERE rank <= {k}), "
        "scb AS (SELECT qd.query_id, tf.doc_id, "
        "sum(ln(1 + tf.tf * s.t_total::DOUBLE / (2000.0 * cf.cf)) "
        "+ ln(2000.0 / (dl.dl + 2000.0))) AS score "
        "FROM qd JOIN tf ON qd.term = tf.term "
        "JOIN cf ON cf.term = qd.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY qd.query_id, tf.doc_id), "
        "rb AS (SELECT query_id, doc_id, rank FROM ("
        "SELECT query_id, doc_id, CAST(row_number() OVER ("
        "PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id) "
        f"AS INTEGER) AS rank FROM scb) WHERE rank <= {k}), "
        "ab AS (SELECT ra.query_id, ra.rank AS x, rb.rank AS y "
        "FROM ra JOIN rb ON rb.query_id = ra.query_id "
        "AND rb.doc_id = ra.doc_id), "
        f"depths AS (SELECT CAST(g.range AS INTEGER) AS d "
        f"FROM range(1, {k} + 1) g), "
        "ov AS (SELECT qq.query_id, depths.d, "
        "(SELECT count(*) FROM ab b WHERE b.query_id = qq.query_id "
        "AND b.x <= depths.d AND b.y <= depths.d) AS ov "
        "FROM (SELECT DISTINCT query_id FROM q) qq CROSS JOIN depths) "
        f"SELECT query_id, round((1 - {p}) * "
        f"sum(power({p}, d - 1) * ov / d), 6) AS rbo "
        "FROM ov GROUP BY query_id ORDER BY query_id"
    )


SQL_RANK_RBO = _rbo_sql(_BM25_QUERIES)


def q_judgment_pool(sf_dir: str):
    """TREC-style judgment pooling (Sparck Jones & van Rijsbergen's
    pooling method — the assessment-budget primitive behind every TREC
    collection): the depth-10 pool over THREE runs of the same queries
    from the same index (BM25, LM-Dirichlet, DFR InL2), one row per
    pooled (query, doc) with ``n_runs`` = how many runs retrieved it —
    the overlap profile that tells an evaluator how much unique work
    each system contributes to assessment cost."""
    runs = [q_bm25_topk(sf_dir), q_lmd_topk(sf_dir), q_dfr_topk(sf_dir)]
    pool: dict[tuple[int, int], int] = {}
    for run in runs:
        for qid, d in zip(run["query_id"], run["doc_id"]):
            pool[(int(qid), int(d))] = pool.get((int(qid), int(d)), 0) + 1
    rows = sorted((q, d, n) for (q, d), n in pool.items())
    return pd.DataFrame(
        rows, columns=["query_id", "doc_id", "n_runs"]
    ).astype({"query_id": "int64", "doc_id": "int64", "n_runs": "int64"})


def _sql_judgment_pool(k: int = 10) -> str:
    """Union of the three ranked bodies' top-k (each re-derived
    independently), counted per (query, doc)."""
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    rank_tail = (
        "SELECT query_id, doc_id FROM (SELECT query_id, doc_id, "
        "row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS rn FROM {body}) "
        f"WHERE rn <= {k}"
    )
    bm25 = (
        "(SELECT q.query_id, tf.doc_id, "
        "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
        "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
        ") AS score FROM q JOIN tf ON q.term = tf.term "
        "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id)"
    )
    lmd = (
        "(SELECT qd.query_id, tf.doc_id, "
        "sum(ln(1 + tf.tf * s.total::DOUBLE / (2000.0 * cf.cf)) "
        "+ ln(2000.0 / (dl.dl + 2000.0))) AS score "
        "FROM qd JOIN tf ON qd.term = tf.term "
        "JOIN cf ON cf.term = qd.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY qd.query_id, tf.doc_id)"
    )
    tfn = ("(tf.tf * ln(1.0 + (s.total::DOUBLE / s.n_docs) / dl.dl) "
           "/ ln(2.0))")
    dfr = (
        "(SELECT qd.query_id, tf.doc_id, "
        f"sum(({tfn} / ({tfn} + 1.0)) * "
        "(ln((s.n_docs + 1.0) / (df.df + 0.5)) / ln(2.0))) AS score "
        "FROM qd JOIN tf ON qd.term = tf.term "
        "JOIN df ON df.term = qd.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY qd.query_id, tf.doc_id)"
    )
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
        "GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        "cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "qd AS (SELECT DISTINCT query_id, term FROM q), "
        "pool AS ("
        + rank_tail.format(body=bm25)
        + " UNION ALL " + rank_tail.format(body=lmd)
        + " UNION ALL " + rank_tail.format(body=dfr)
        + ") "
        "SELECT query_id, doc_id, count(*) AS n_runs FROM pool "
        "GROUP BY 1, 2 ORDER BY query_id, doc_id"
    )


SQL_JUDGMENT_POOL = _sql_judgment_pool()


def q_fusion_borda(sf_dir: str):
    """Borda-count metasearch fusion (Aslam & Montague, SIGIR 2001 —
    the voting-theory baseline next to RRF and min-max): each run
    (BM25, LM-Dirichlet, DFR InL2; depth 10) awards a doc
    ``k - rank + 1`` points, absent docs get 0; fused ranking by
    (points DESC, doc_id), top-10 per query.  Integer scores — no
    float policy anywhere."""
    k = 10
    runs = [q_bm25_topk(sf_dir), q_lmd_topk(sf_dir), q_dfr_topk(sf_dir)]
    pts: dict[tuple[int, int], int] = {}
    for run in runs:
        for qid, d, r in zip(run["query_id"], run["doc_id"], run["rank"]):
            key = (int(qid), int(d))
            pts[key] = pts.get(key, 0) + (k - int(r) + 1)
    rows = []
    for qid in sorted({q for q, _ in pts}):
        cand = sorted(
            ((p, d) for (q, d), p in pts.items() if q == qid),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        for rank, (p, d) in enumerate(cand, 1):
            rows.append((qid, rank, d, p))
    return pd.DataFrame(
        rows, columns=["query_id", "rank", "doc_id", "points"]
    ).astype({
        "query_id": "int64", "rank": "int64", "doc_id": "int64",
        "points": "int64",
    })


def _sql_fusion_borda(k: int = 10) -> str:
    """The judgment-pool CTE chain with ranks carried through, then the
    Borda point sum."""
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    rank_tail = (
        "SELECT query_id, doc_id, rn FROM (SELECT query_id, doc_id, "
        "row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS rn FROM {body}) "
        f"WHERE rn <= {k}"
    )
    bm25 = (
        "(SELECT q.query_id, tf.doc_id, "
        "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
        "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
        ") AS score FROM q JOIN tf ON q.term = tf.term "
        "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id)"
    )
    lmd = (
        "(SELECT qd.query_id, tf.doc_id, "
        "sum(ln(1 + tf.tf * s.total::DOUBLE / (2000.0 * cf.cf)) "
        "+ ln(2000.0 / (dl.dl + 2000.0))) AS score "
        "FROM qd JOIN tf ON qd.term = tf.term "
        "JOIN cf ON cf.term = qd.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY qd.query_id, tf.doc_id)"
    )
    tfn = ("(tf.tf * ln(1.0 + (s.total::DOUBLE / s.n_docs) / dl.dl) "
           "/ ln(2.0))")
    dfr = (
        "(SELECT qd.query_id, tf.doc_id, "
        f"sum(({tfn} / ({tfn} + 1.0)) * "
        "(ln((s.n_docs + 1.0) / (df.df + 0.5)) / ln(2.0))) AS score "
        "FROM qd JOIN tf ON qd.term = tf.term "
        "JOIN df ON df.term = qd.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY qd.query_id, tf.doc_id)"
    )
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
        "GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        "cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "qd AS (SELECT DISTINCT query_id, term FROM q), "
        "pool AS ("
        + rank_tail.format(body=bm25)
        + " UNION ALL " + rank_tail.format(body=lmd)
        + " UNION ALL " + rank_tail.format(body=dfr)
        + "), "
        f"pts AS (SELECT query_id, doc_id, "
        f"CAST(sum({k} - rn + 1) AS BIGINT) AS points "
        "FROM pool GROUP BY 1, 2) "
        "SELECT query_id, rank, doc_id, points FROM ("
        "SELECT query_id, doc_id, points, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "points DESC, doc_id) AS BIGINT) AS rank FROM pts) "
        f"WHERE rank <= {k} ORDER BY query_id, rank"
    )


SQL_FUSION_BORDA = _sql_fusion_borda()


def q_fusion_condorcet(sf_dir: str):
    """Condorcet-fuse (Montague & Aslam, CIKM 2002) in the pinned
    Copeland form: over the 3-run depth-10 pool, candidate a BEATS b
    when the majority of runs rank a above b (a doc absent from a run
    ranks at k+1 — the pinned completion); the fused score is the
    Copeland count of candidates beaten, ranked (wins DESC, doc_id),
    top-10.  The pairwise-majority member of the fusion family —
    unlike Borda it ignores rank MAGNITUDES entirely, so one run's
    outlier placement cannot drag a doc down."""
    k = 10
    runs = [q_bm25_topk(sf_dir), q_lmd_topk(sf_dir), q_dfr_topk(sf_dir)]
    rankmaps: list[dict[tuple[int, int], int]] = []
    for run in runs:
        rankmaps.append({
            (int(q), int(d)): int(r)
            for q, d, r in zip(run["query_id"], run["doc_id"], run["rank"])
        })
    cand: dict[int, set[int]] = {}
    for rm in rankmaps:
        for (q, d) in rm:
            cand.setdefault(q, set()).add(d)
    rows = []
    for qid in sorted(cand):
        docs = sorted(cand[qid])
        wins = {d: 0 for d in docs}
        for i, a in enumerate(docs):
            for b in docs[i + 1:]:
                votes_a = sum(
                    1
                    for rm in rankmaps
                    if rm.get((qid, a), k + 1) < rm.get((qid, b), k + 1)
                )
                votes_b = sum(
                    1
                    for rm in rankmaps
                    if rm.get((qid, b), k + 1) < rm.get((qid, a), k + 1)
                )
                if votes_a > votes_b:
                    wins[a] += 1
                elif votes_b > votes_a:
                    wins[b] += 1
        ranked = sorted(docs, key=lambda d: (-wins[d], d))[:k]
        for rank, d in enumerate(ranked, 1):
            rows.append((qid, rank, d, wins[d]))
    return pd.DataFrame(
        rows, columns=["query_id", "rank", "doc_id", "wins"]
    ).astype({
        "query_id": "int64", "rank": "int64", "doc_id": "int64",
        "wins": "int64",
    })


def _sql_fusion_condorcet(k: int = 10) -> str:
    """Pool with per-run ranks (absent -> k+1 via full outer completion
    over the pool), pairwise majority, Copeland count."""
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    rank_tail = (
        "SELECT query_id, doc_id, rn FROM (SELECT query_id, doc_id, "
        "row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS rn FROM {body}) "
        f"WHERE rn <= {k}"
    )
    bm25 = (
        "(SELECT q.query_id, tf.doc_id, "
        "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
        "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
        ") AS score FROM q JOIN tf ON q.term = tf.term "
        "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id)"
    )
    lmd = (
        "(SELECT qd.query_id, tf.doc_id, "
        "sum(ln(1 + tf.tf * s.total::DOUBLE / (2000.0 * cf.cf)) "
        "+ ln(2000.0 / (dl.dl + 2000.0))) AS score "
        "FROM qd JOIN tf ON qd.term = tf.term "
        "JOIN cf ON cf.term = qd.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY qd.query_id, tf.doc_id)"
    )
    tfn = ("(tf.tf * ln(1.0 + (s.total::DOUBLE / s.n_docs) / dl.dl) "
           "/ ln(2.0))")
    dfr = (
        "(SELECT qd.query_id, tf.doc_id, "
        f"sum(({tfn} / ({tfn} + 1.0)) * "
        "(ln((s.n_docs + 1.0) / (df.df + 0.5)) / ln(2.0))) AS score "
        "FROM qd JOIN tf ON qd.term = tf.term "
        "JOIN df ON df.term = qd.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY qd.query_id, tf.doc_id)"
    )
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
        "GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        "cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "qd AS (SELECT DISTINCT query_id, term FROM q), "
        "r1 AS (" + rank_tail.format(body=bm25) + "), "
        "r2 AS (" + rank_tail.format(body=lmd) + "), "
        "r3 AS (" + rank_tail.format(body=dfr) + "), "
        "pool AS (SELECT DISTINCT query_id, doc_id FROM ("
        "SELECT query_id, doc_id FROM r1 UNION ALL "
        "SELECT query_id, doc_id FROM r2 UNION ALL "
        "SELECT query_id, doc_id FROM r3)), "
        # per-pool-candidate per-run rank, absent -> k+1
        "pr AS (SELECT p.query_id, p.doc_id, "
        f"coalesce(r1.rn, {k + 1}) AS k1, "
        f"coalesce(r2.rn, {k + 1}) AS k2, "
        f"coalesce(r3.rn, {k + 1}) AS k3 "
        "FROM pool p "
        "LEFT JOIN r1 ON r1.query_id = p.query_id AND r1.doc_id = p.doc_id "
        "LEFT JOIN r2 ON r2.query_id = p.query_id AND r2.doc_id = p.doc_id "
        "LEFT JOIN r3 ON r3.query_id = p.query_id AND r3.doc_id = p.doc_id), "
        "duel AS (SELECT a.query_id, a.doc_id, "
        "CAST(sum(CASE WHEN "
        "(CASE WHEN a.k1 < b.k1 THEN 1 ELSE 0 END + "
        "CASE WHEN a.k2 < b.k2 THEN 1 ELSE 0 END + "
        "CASE WHEN a.k3 < b.k3 THEN 1 ELSE 0 END) > "
        "(CASE WHEN b.k1 < a.k1 THEN 1 ELSE 0 END + "
        "CASE WHEN b.k2 < a.k2 THEN 1 ELSE 0 END + "
        "CASE WHEN b.k3 < a.k3 THEN 1 ELSE 0 END) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS wins "
        "FROM pr a JOIN pr b ON b.query_id = a.query_id "
        "AND b.doc_id <> a.doc_id GROUP BY 1, 2) "
        "SELECT query_id, rank, doc_id, wins FROM ("
        "SELECT query_id, doc_id, wins, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "wins DESC, doc_id) AS BIGINT) AS rank FROM duel) "
        f"WHERE rank <= {k} ORDER BY query_id, rank"
    )


SQL_FUSION_CONDORCET = _sql_fusion_condorcet()


def q_fusion_combmnz(sf_dir: str):
    """CombMNZ metasearch fusion (Fox & Shaw, TREC-2 1994 — the
    score-based classic beside the rank-only Borda/Condorcet members):
    each run's top-10 scores min-max normalize PER QUERY over that
    run's own retrieved window ((s - min) / (max - min); a zero-span
    window contributes 0.0), and a doc's fused score is
    ``n_runs_containing * (bm25_n + lmd_n + dfr_n)`` in that pinned
    run order, absent sides contributing 0.0 — the MNZ multiplier is
    what separates it from CombSUM.  Fusion operates on the PUBLISHED
    run scores (the round(score, 6) values the run entries return), so
    both engines fuse bit-identical inputs.  Top-10 per query by
    (round(fused, 6) DESC, doc_id)."""
    k = 10
    runs = [q_bm25_topk(sf_dir), q_lmd_topk(sf_dir), q_dfr_topk(sf_dir)]
    acc: dict[tuple[int, int], list] = {}
    for ri, run in enumerate(runs):
        for qid, g in run.groupby("query_id"):
            s = g["score"].to_numpy(np.float64)
            mn = float(s.min())
            span = float(s.max()) - mn
            for d, sc in zip(g["doc_id"].to_numpy(), s):
                slot = acc.setdefault(
                    (int(qid), int(d)), [0.0, 0.0, 0.0, 0]
                )
                slot[ri] = 0.0 if span == 0.0 else (float(sc) - mn) / span
                slot[3] += 1
    rows = []
    for qid in sorted({q for q, _ in acc}):
        cand = []
        for (q, d), (nb, nl, nd, nz) in acc.items():
            if q != qid:
                continue
            fused = float(np.round(nz * (nb + nl + nd), 6))
            cand.append((-fused, d, fused, nz))
        cand.sort()
        for rank, (_negf, d, fused, nz) in enumerate(cand[:k], 1):
            rows.append((qid, rank, d, fused, nz))
    return pd.DataFrame(
        rows, columns=["query_id", "rank", "doc_id", "score", "n_runs"]
    ).astype({
        "query_id": "int64", "rank": "int64", "doc_id": "int64",
        "score": "float64", "n_runs": "int64",
    })


def _sql_fusion_combmnz(k: int = 10) -> str:
    """The three ranked bodies re-derived independently, each window
    min-max normalized per query over its ROUNDED published scores,
    outer-merged in pinned run order with the MNZ multiplier."""
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    run_tail = (
        "SELECT query_id, doc_id, round(score, 6) AS s FROM ("
        "SELECT query_id, doc_id, score, row_number() OVER ("
        "PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id"
        ") AS rn FROM {body}) "
        f"WHERE rn <= {k}"
    )
    norm_tail = (
        "SELECT query_id, doc_id, CASE WHEN mx = mn THEN 0.0 "
        "ELSE (s - mn) / (mx - mn) END AS n FROM ("
        "SELECT query_id, doc_id, s, "
        "min(s) OVER (PARTITION BY query_id) AS mn, "
        "max(s) OVER (PARTITION BY query_id) AS mx FROM {run})"
    )
    bm25 = (
        "(SELECT q.query_id, tf.doc_id, "
        "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
        "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
        ") AS score FROM q JOIN tf ON q.term = tf.term "
        "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id)"
    )
    lmd = (
        "(SELECT qd.query_id, tf.doc_id, "
        "sum(ln(1 + tf.tf * s.total::DOUBLE / (2000.0 * cf.cf)) "
        "+ ln(2000.0 / (dl.dl + 2000.0))) AS score "
        "FROM qd JOIN tf ON qd.term = tf.term "
        "JOIN cf ON cf.term = qd.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY qd.query_id, tf.doc_id)"
    )
    tfn = ("(tf.tf * ln(1.0 + (s.total::DOUBLE / s.n_docs) / dl.dl) "
           "/ ln(2.0))")
    dfr = (
        "(SELECT qd.query_id, tf.doc_id, "
        f"sum(({tfn} / ({tfn} + 1.0)) * "
        "(ln((s.n_docs + 1.0) / (df.df + 0.5)) / ln(2.0))) AS score "
        "FROM qd JOIN tf ON qd.term = tf.term "
        "JOIN df ON df.term = qd.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY qd.query_id, tf.doc_id)"
    )
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
        "GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        "cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "qd AS (SELECT DISTINCT query_id, term FROM q), "
        "rb AS (" + run_tail.format(body=bm25) + "), "
        "rl AS (" + run_tail.format(body=lmd) + "), "
        "rd AS (" + run_tail.format(body=dfr) + "), "
        "nb AS (" + norm_tail.format(run="rb") + "), "
        "nl AS (" + norm_tail.format(run="rl") + "), "
        "nd AS (" + norm_tail.format(run="rd") + "), "
        "alld AS (SELECT query_id, doc_id FROM rb UNION "
        "SELECT query_id, doc_id FROM rl UNION "
        "SELECT query_id, doc_id FROM rd), "
        "fused AS (SELECT a.query_id, a.doc_id, "
        "CAST((CASE WHEN b.n IS NULL THEN 0 ELSE 1 END) "
        "+ (CASE WHEN l.n IS NULL THEN 0 ELSE 1 END) "
        "+ (CASE WHEN d.n IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_runs, "
        "round(((CASE WHEN b.n IS NULL THEN 0 ELSE 1 END) "
        "+ (CASE WHEN l.n IS NULL THEN 0 ELSE 1 END) "
        "+ (CASE WHEN d.n IS NULL THEN 0 ELSE 1 END)) "
        "* (COALESCE(b.n, 0.0) + COALESCE(l.n, 0.0) + COALESCE(d.n, 0.0)), 6"
        ") AS score "
        "FROM alld a "
        "LEFT JOIN nb b ON b.query_id = a.query_id AND b.doc_id = a.doc_id "
        "LEFT JOIN nl l ON l.query_id = a.query_id AND l.doc_id = a.doc_id "
        "LEFT JOIN nd d ON d.query_id = a.query_id AND d.doc_id = a.doc_id) "
        "SELECT query_id, rank, doc_id, score, n_runs FROM ("
        "SELECT query_id, doc_id, score, n_runs, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "score DESC, doc_id) AS BIGINT) AS rank FROM fused) "
        f"WHERE rank <= {k} ORDER BY query_id, rank"
    )


SQL_FUSION_COMBMNZ = _sql_fusion_combmnz()


def _paired_ndcg(sf_dir: str, k: int = 10):
    """Per-query nDCG@k of the BM25 run and the LM-Dirichlet run under
    the shared binary relevance — the paired metric vectors both the
    sign test and the randomization test consume."""

    def _ndcg_of(topk: pd.DataFrame) -> dict[int, float]:
        hit_set, n_rel = _rel_hits(sf_dir, topk)
        out = {}
        for qid, _terms in _BM25_QUERIES:
            g = topk[topk["query_id"] == qid]
            rel_mask = np.array(
                [(qid, d) in hit_set for d in g["doc_id"]], dtype=bool
            )
            dcg = float(
                np.sum(1.0 / np.log2(g["rank"].to_numpy()[rel_mask] + 1.0))
            )
            nr = min(n_rel.get(qid, 0), k)
            idcg = float(np.sum(1.0 / np.log2(np.arange(1, nr + 1) + 1.0)))
            out[qid] = round(dcg / idcg, 6) if idcg > 0 else 0.0
        return out

    return _ndcg_of(q_bm25_topk(sf_dir)), _ndcg_of(q_lmd_topk(sf_dir))


def q_run_sign_test(sf_dir: str):
    """Exact paired sign test between two systems (the classic IR
    significance test — van Rijsbergen ch.7): per query, nDCG@10 of
    the BM25 run vs the LM-Dirichlet run under the shared binary
    relevance; ties drop, and the two-sided exact binomial p-value is
    2 * sum_{i<=min(pos,neg)} C(n,i) / 2^n (capped at 1).  Output: one
    row with the win/loss/tie counts and the p-value — the
    deterministic go/no-go statistic before shipping a similarity
    swap.  Both metric vectors reuse the bounded rel∩top10 machinery;
    everything past the two top-k runs is exact integer/binomial
    arithmetic on 8 rows."""
    a, b = _paired_ndcg(sf_dir)
    pos = sum(1 for q in a if a[q] > b[q])
    neg = sum(1 for q in a if a[q] < b[q])
    ties = len(a) - pos - neg
    n = pos + neg
    if n == 0:
        p = 1.0
    else:
        m = min(pos, neg)
        tail = sum(math.comb(n, i) for i in range(m + 1))
        p = min(1.0, 2.0 * tail / (2 ** n))
    return pd.DataFrame({
        "wins_bm25": [pos], "wins_lmd": [neg], "ties": [ties],
        "p_value": [round(p, 6)],
    }).astype({
        "wins_bm25": "int64", "wins_lmd": "int64", "ties": "int64",
        "p_value": "float64",
    })


def _sql_run_sign_test(k: int = 10) -> str:
    """Both runs' nDCG re-derived (the _ndcg_sql machinery with the
    BM25 body and the LMD body), sign counts, and the exact binomial
    tail via a factorial-free Pascal recurrence over n <= 8 (a
    recursive CTE on C(n, i))."""
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    def ndcg_block(tag: str, body: str) -> str:
        return (
            f"top{tag} AS (SELECT query_id, doc_id, rank FROM ("
            "SELECT query_id, doc_id, CAST(row_number() OVER ("
            "PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id) "
            f"AS INTEGER) AS rank FROM {body}) WHERE rank <= {k}), "
            f"dcg{tag} AS (SELECT t.query_id, "
            "COALESCE(sum(CASE WHEN r.doc_id IS NOT NULL "
            f"THEN 1.0 / log2(t.rank + 1) END), 0) AS dcg FROM top{tag} t "
            "LEFT JOIN rel r ON r.query_id = t.query_id "
            "AND r.doc_id = t.doc_id GROUP BY t.query_id), "
            f"nd{tag} AS (SELECT qq.query_id, "
            f"round(COALESCE(d.dcg / i.idcg, 0), 6) AS nd "
            "FROM (SELECT DISTINCT query_id FROM q) qq "
            f"LEFT JOIN dcg{tag} d ON d.query_id = qq.query_id "
            "LEFT JOIN idcg i ON i.query_id = qq.query_id)"
        )
    bm25_body = "sca"
    lmd_body = "scb"
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
        "GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        "cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "qd AS (SELECT DISTINCT query_id, term FROM q), "
        "qt AS (SELECT query_id, count(DISTINCT term) AS nt FROM q "
        "GROUP BY query_id), "
        "relc AS (SELECT q.query_id, tf.doc_id, "
        "count(DISTINCT tf.term) AS c FROM q JOIN tf ON tf.term = q.term "
        "GROUP BY q.query_id, tf.doc_id), "
        "rel AS (SELECT relc.query_id, relc.doc_id FROM relc "
        "JOIN qt ON qt.query_id = relc.query_id AND relc.c = qt.nt), "
        "nrel AS (SELECT query_id, count(*) AS n FROM rel GROUP BY 1), "
        f"idcg AS (SELECT nrel.query_id, sum(1.0 / log2(g.x + 1)) AS idcg "
        f"FROM nrel JOIN range(1, {k} + 1) g(x) "
        f"ON g.x <= least(nrel.n, {k}) GROUP BY nrel.query_id), "
        "sca AS (SELECT q.query_id, tf.doc_id, "
        "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
        "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
        ") AS score FROM q JOIN tf ON q.term = tf.term "
        "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id), "
        "scb AS (SELECT qd.query_id, tf.doc_id, "
        "sum(ln(1 + tf.tf * s.total::DOUBLE / (2000.0 * cf.cf)) "
        "+ ln(2000.0 / (dl.dl + 2000.0))) AS score "
        "FROM qd JOIN tf ON qd.term = tf.term "
        "JOIN cf ON cf.term = qd.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY qd.query_id, tf.doc_id), "
        + ndcg_block("a", bm25_body) + ", "
        + ndcg_block("b", lmd_body) + ", "
        "signs AS (SELECT "
        "CAST(sum(CASE WHEN na.nd > nb.nd THEN 1 ELSE 0 END) AS BIGINT) "
        "AS pos, "
        "CAST(sum(CASE WHEN na.nd < nb.nd THEN 1 ELSE 0 END) AS BIGINT) "
        "AS neg, "
        "CAST(sum(CASE WHEN na.nd = nb.nd THEN 1 ELSE 0 END) AS BIGINT) "
        "AS ties FROM nda na JOIN ndb nb ON nb.query_id = na.query_id), "
        "binom AS (WITH RECURSIVE c(n, i, v) AS ("
        "SELECT 0, 0, CAST(1 AS BIGINT) UNION ALL "
        "SELECT CASE WHEN i < n THEN n ELSE n + 1 END, "
        "CASE WHEN i < n THEN i + 1 ELSE 0 END, "
        "CASE WHEN i < n THEN "
        "CAST(v * (n - i) / (i + 1) AS BIGINT) ELSE CAST(1 AS BIGINT) END "
        "FROM c WHERE n < 9) SELECT n, i, v FROM c) "
        "SELECT s.pos AS wins_bm25, s.neg AS wins_lmd, s.ties, "
        "round(CASE WHEN s.pos + s.neg = 0 THEN 1.0 ELSE "
        "least(1.0, 2.0 * (SELECT sum(v) FROM binom WHERE "
        "n = s.pos + s.neg AND i <= least(s.pos, s.neg))::DOUBLE "
        "/ power(2.0, s.pos + s.neg)) END, 6) AS p_value FROM signs s"
    )


SQL_RUN_SIGN_TEST = _sql_run_sign_test()


def q_run_randomization_test(sf_dir: str):
    """Exact Fisher randomization (permutation) test between the same
    two systems as the sign test (Smucker, Allan & Carterette, CIKM
    2007 — the test they recommend over sign/Wilcoxon for IR): under
    the null, each query's paired nDCG@10 delta is symmetric around 0,
    so ALL 2^n sign assignments are enumerated (n = 8 queries -> 256,
    exhaustive — no sampling, no RNG) and the two-sided p-value is the
    fraction whose |sum of signed deltas| >= |observed|.  Deltas are
    EXACT INTEGERS in micro-nDCG units (the published values are
    round(x, 6), so scaling by 1e6 is lossless) — every subset sum
    compares exactly, immune to float association order on both
    engines.  Output: (n_queries, t_obs in micro-units, n_ge,
    p_value)."""
    a, b = _paired_ndcg(sf_dir)
    qids = sorted(a)
    di = np.array(
        [
            int(round(a[q] * 1e6)) - int(round(b[q] * 1e6))
            for q in qids
        ],
        dtype=np.int64,
    )
    n = di.size
    t_obs = abs(int(di.sum()))
    masks = np.arange(1 << n, dtype=np.int64)
    signs = np.where(
        (masks[:, None] >> np.arange(n)) & 1 == 1, -1, 1
    ).astype(np.int64)
    sums = signs @ di
    n_ge = int(np.count_nonzero(np.abs(sums) >= t_obs))
    return pd.DataFrame({
        "n_queries": [n], "t_obs": [t_obs], "n_ge": [n_ge],
        "p_value": [round(n_ge / (1 << n), 6)],
    }).astype({
        "n_queries": "int64", "t_obs": "int64", "n_ge": "int64",
        "p_value": "float64",
    })


def _sql_run_randomization_test(k: int = 10) -> str:
    """The sign-test scaffold's paired nDCG vectors, scaled to exact
    micro-unit integers, then an exhaustive 2^n sign-assignment sweep
    via range() x bit tests."""
    base = _sql_run_sign_test(k)
    # reuse everything up to (and including) the ndb CTE; replace the
    # signs/binom tail with the permutation sweep
    prefix = base[: base.index(", signs AS")]
    nq = len(_BM25_QUERIES)
    return (
        prefix + ", "
        "dvec AS (SELECT CAST(round(na.nd * 1000000) AS BIGINT) "
        "- CAST(round(nb.nd * 1000000) AS BIGINT) AS di, "
        "CAST(row_number() OVER (ORDER BY na.query_id) - 1 AS BIGINT) "
        "AS ix FROM nda na JOIN ndb nb ON nb.query_id = na.query_id), "
        "tobs AS (SELECT CAST(abs(sum(di)) AS BIGINT) AS t, "
        "count(*) AS n FROM dvec), "
        f"perms AS (SELECT g.m, sum(CASE WHEN ((g.m >> d.ix) & 1) = 1 "
        f"THEN -d.di ELSE d.di END) AS s "
        f"FROM range(0, {1 << nq}) g(m) CROSS JOIN dvec d GROUP BY g.m) "
        "SELECT (SELECT n FROM tobs) AS n_queries, "
        "(SELECT t FROM tobs) AS t_obs, "
        "CAST(count(*) AS BIGINT) AS n_ge, "
        f"round(count(*)::DOUBLE / {1 << nq}, 6) AS p_value "
        "FROM perms WHERE abs(s) >= (SELECT t FROM tobs)"
    )


SQL_RUN_RANDOMIZATION_TEST = _sql_run_randomization_test()


from ._nsacc import export as _ns_export

_ns_export(globals())
del _ns_export
