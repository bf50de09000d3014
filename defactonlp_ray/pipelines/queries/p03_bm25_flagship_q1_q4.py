# Part 03/11 of the former single-module pipelines/queries.py
# (mechanical split, round 5 — VERDICT r04 next-round #6).  Parts share
# ONE late-bound namespace via _nsacc: globals are seeded from the
# accumulator before this body runs (preserving original top-level
# execution order) and the final merged namespace is injected back into
# every part by __init__, so call-time forward references behave exactly
# as in the single file.  Original lines 4514-6454.
from __future__ import annotations

from ._nsacc import NS as _ns_seed

globals().update(_ns_seed)
del _ns_seed



# ---------------------------------------------------- BM25 flagship (Q1-Q4)

_BM25_QUERIES: list[tuple[int, list[str]]] = [
    (0, ["data", "query", "fast"]),
    (1, ["merge", "sort"]),
    (2, ["window", "stream", "batch"]),
    (3, ["hash", "join", "table"]),
    (4, ["slow", "scan"]),
    (5, ["spark", "row", "group"]),
    (6, ["filter", "value"]),
    (7, ["customer", "line", "agg"]),
]


def _bm25_sql(queries: list[tuple[int, list[str]]], k: int = 10,
              toks_sql: str = _TOKS_SQL, lo: int = 1,
              exclude_pred: str = "") -> str:
    """``exclude_pred`` is an optional SQL predicate over (q, tf, s)
    dropping (query, doc) pairs BEFORE scoring (e.g. the hard-negative
    gold exclusion) — keeps variants sharing ONE BM25 body."""
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in queries for t in terms
    )
    where = f"WHERE {exclude_pred} " if exclude_pred else ""
    return (
        f"WITH toks AS ({toks_sql}), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "scored AS (SELECT q.query_id, tf.doc_id, "
        "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
        "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
        ") AS score FROM q JOIN tf ON q.term = tf.term "
        "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
        f"CROSS JOIN stats s {where}GROUP BY q.query_id, tf.doc_id) "
        "SELECT query_id, rank, doc_id, score FROM ("
        "SELECT query_id, doc_id, round(score, 6) AS score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored) "
        + (f"WHERE rank <= {k}" if lo <= 1 else f"WHERE rank BETWEEN {lo} AND {k}")
    )


SQL_BM25_TOPK = _bm25_sql(_BM25_QUERIES)


def q_bm25_topk(sf_dir: str):
    """Build the real segment index over ``documents`` and run the real
    searcher actors; output ranked on (round(score,6) DESC, doc_id) to
    match the cross-engine float policy (bit-exact checks are in pytest)."""
    idx = _build_docs_index(sf_dir)
    # over-fetch then re-rank on the rounded score (cross-engine tie policy)
    res = search(idx, _query_terms_ds(_BM25_QUERIES), k=20, concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


def q_bm25_topk_wand(sf_dir: str):
    """Q2 under the driver: block-max WAND over the same index and query
    set as ``bm25_topk``.  WAND is pruning-only (its (doc, score) output
    is pytest-asserted identical to the exhaustive scorer, incl. hypothesis
    corpora), so ``SQL_BM25_TOPK`` is a valid oracle once the same
    round(score,6) re-rank policy is applied."""
    idx = _build_docs_index(sf_dir)
    res = search(idx, _query_terms_ds(_BM25_QUERIES), k=20, mode="wand",
                 concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


def q_bm25_topk_pfor(sf_dir: str):
    """Q1 over a PForDelta-coded index (C2 upgrade path under the driver):
    same scorer, same query set, segments stored with ``codec='pfor'`` —
    the codec is invisible to scores, so ``SQL_BM25_TOPK`` is the oracle."""
    idx = _build_docs_index(sf_dir, codec="pfor")
    res = search(idx, _query_terms_ds(_BM25_QUERIES), k=20, concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


def q_bm25_topk_auto(sf_dir: str):
    """Per-query TAAT/WAND planner (mode=auto): pruning-only route
    choice on df statistics — results are identical to the exhaustive
    scorer by construction (pytest: auto == taat), so the exact-BM25
    SQL is the oracle."""
    idx = _build_docs_index(sf_dir)
    res = search(idx, _query_terms_ds(_BM25_QUERIES), k=20, mode="auto",
                 concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


# tf-idf query set: DrQA's CLIPPED idf zeroes terms with df > N/2, and the
# test corpus vocabulary is mostly head terms — these queries mix the rare
# term (positive idf), duplicates (qtf=2 exercises log1p(qtf)) and
# clipped-to-zero terms (must contribute nothing / yield empty results)
_TFIDF_QUERIES: list[tuple[int, list[str]]] = [
    (0, ["dup", "data"]),
    (1, ["dup", "dup", "merge"]),
    (2, ["dup", "key", "value"]),
    (3, ["scan", "slow"]),
]


def q_tfidf_topk(sf_dir: str):
    """DrQA-style tf-idf route (A2 diagnostic scorer, arXiv:1704.00051):
    w(t,d) = log1p(tf) * idf_clip with idf_clip = max(0, ln((N-df+.5)/(df+.5))),
    query weight log1p(qtf) * idf_clip, score = q . d."""
    idx = _build_docs_index(sf_dir)
    res = search(idx, _query_terms_ds(_TFIDF_QUERIES), k=20, mode="tfidf",
                 concurrency=2).to_pandas()
    if res.empty:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "rank": pd.Series([], dtype=np.int32),
                "doc_id": pd.Series([], dtype=np.int64),
                "score": pd.Series([], dtype=np.float64),
            }
        )
    return _rerank_rounded(res, k=10)


def _tfidf_sql(queries: list[tuple[int, list[str]]], k: int = 10) -> str:
    vals = ", ".join(f"({qid}, '{t}')" for qid, terms in queries for t in terms)
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "stats AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "qt AS (SELECT query_id, term, count(*) AS qtf FROM q GROUP BY query_id, term), "
        "idf AS (SELECT term, greatest(ln((s.n_docs - df.df + 0.5) / (df.df + 0.5)), 0) "
        "AS idfc FROM df CROSS JOIN stats s), "
        "scored AS (SELECT qt.query_id, tf.doc_id, "
        "sum(ln(1 + qt.qtf) * idf.idfc * ln(1 + tf.tf) * idf.idfc) AS score "
        "FROM qt JOIN tf ON qt.term = tf.term JOIN idf ON idf.term = qt.term "
        "GROUP BY qt.query_id, tf.doc_id HAVING score > 0) "
        "SELECT query_id, rank, doc_id, score FROM ("
        "SELECT query_id, doc_id, round(score, 6) AS score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored) "
        f"WHERE rank <= {k}"
    )


SQL_TFIDF_TOPK = _tfidf_sql(_TFIDF_QUERIES)


def q_lmd_topk(sf_dir: str):
    """Language-model ranking with Dirichlet smoothing (Zhai & Lafferty,
    SIGIR 2001; mu=2000) over the SAME index as ``bm25_topk`` — the
    second public scoring model served from one set of segments (cf
    stats were already in the per-segment term tables).  Same
    round(score,6) re-rank policy as every ranked entry."""
    idx = _build_docs_index(sf_dir)
    res = search(idx, _query_terms_ds(_BM25_QUERIES), k=20, mode="lmd",
                 concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


def _lmd_sql(queries: list[tuple[int, list[str]]], k: int = 10,
             mu: str = "2000.0") -> str:
    vals = ", ".join(f"({qid}, '{t}')" for qid, terms in queries for t in terms)
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS t_total FROM toks), "
        "cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY term), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "qd AS (SELECT DISTINCT query_id, term FROM q), "
        "scored AS (SELECT qd.query_id, tf.doc_id, "
        f"sum(ln(1 + tf.tf * s.t_total::DOUBLE / ({mu} * cf.cf)) "
        f"+ ln({mu} / (dl.dl + {mu}))) AS score "
        "FROM qd JOIN tf ON qd.term = tf.term "
        "JOIN cf ON cf.term = qd.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY qd.query_id, tf.doc_id) "
        "SELECT query_id, rank, doc_id, score FROM ("
        "SELECT query_id, doc_id, round(score, 6) AS score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored) "
        f"WHERE rank <= {k}"
    )


SQL_LMD_TOPK = _lmd_sql(_BM25_QUERIES)


def q_dfr_topk(sf_dir: str):
    """DFR InL2 ranking (Amati & van Rijsbergen, TOIS 2002 — Terrier's
    default model; Lucene DFRSimilarity(IN, L, H2)) served from the SAME
    segments as bm25_topk: per present term, tfn = tf*log2(1+avgdl/dl),
    contribution (tfn/(tfn+1)) * log2((N+1)/(df+0.5)).  Third public
    scoring model over one index (after BM25 and LM-Dirichlet)."""
    idx = _build_docs_index(sf_dir)
    res = search(idx, _query_terms_ds(_BM25_QUERIES), k=20, mode="dfr",
                 concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


def q_ib_spl_topk(sf_dir: str):
    """Information-based SPL-D ranking (Clinchant & Gaussier, SIGIR
    2010; Lucene IBSimilarity(SPL, H2)) with the pinned smoothed
    lambda = (df+0.5)/(N+1) — strictly inside (0,1), so a term present
    in every document still scores finitely (Lucene's LambdaDF has a
    1/(1-1) pole there)."""
    idx = _build_docs_index(sf_dir)
    res = search(idx, _query_terms_ds(_BM25_QUERIES), k=20, mode="spl",
                 concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


def q_dfi_topk(sf_dir: str):
    """Divergence-from-independence chi-squared ranking (Kocabas,
    Dincer & Karaoglan, IR 2014; Lucene DFISimilarity): expected tf
    under independence e = cf*dl/T; a term contributes
    log2((tf-e)^2/e + 1) only when tf > e, and docs whose total is 0
    (every matched term at-or-below expectation) are dropped — the
    HAVING clause in the oracle."""
    idx = _build_docs_index(sf_dir)
    res = search(idx, _query_terms_ds(_BM25_QUERIES), k=20, mode="dfi",
                 concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


def q_pl2_topk(sf_dir: str):
    """DFR PL2 ranking (Amati & van Rijsbergen, TOIS 2002 — Terrier's
    PL2, c = 1): Poisson basic model, Laplace after-effect, H2 length
    normalization.  Per present term with mean rate lambda = cf/N and
    tfn = tf*log2(1+avgdl/dl), contribution
    (1/(tfn+1)) * (tfn*log2(tfn/lambda) + (lambda + 1/(12*tfn) -
    tfn)*log2(e) + 0.5*log2(2*pi*tfn)) — the second classic DFR model
    beside InL2, served from the SAME segments via the simfam
    kernel."""
    idx = _build_docs_index(sf_dir)
    res = search(idx, _query_terms_ds(_BM25_QUERIES), k=20, mode="pl2",
                 concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


def q_dph_topk(sf_dir: str):
    """DPH ranking (Amati's hypergeometric divergence — Terrier's DPH,
    the PARAMETER-FREE DFR model: no c, no k1, nothing to tune): with
    f = tf/dl and norm = (1-f)^2/(tf+1), contribution
    norm * (tf*log2((tf*avgdl/dl)*(N/cf)) + 0.5*log2(2*pi*tf*(1-f))).
    Pinned pole rule: a tf >= dl posting (single-term document, f = 1)
    contributes exactly 0.0 — the CASE guard in the oracle."""
    idx = _build_docs_index(sf_dir)
    res = search(idx, _query_terms_ds(_BM25_QUERIES), k=20, mode="dph",
                 concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


def _simfam_sql(queries: list[tuple[int, list[str]]], model: str,
                k: int = 10) -> str:
    """Shared oracle scaffold for the dfr/spl/dfi similarity family.

    Every transcendental is written ln-based with an explicit /ln(2),
    mirroring stages/search.score_all_simfam operation for operation
    (same reason the LMD oracle mirrors its kernel: the cross-engine
    contract is round(score, 6) re-rank over bit-identical inputs).
    ``avgdl`` is the same single int/int division the index stats file
    stores (index_build.py collection stats)."""
    vals = ", ".join(f"({qid}, '{t}')" for qid, terms in queries for t in terms)
    tfn = ("(tf.tf * ln(1.0 + (s.t_total::DOUBLE / s.n_docs) / dl.dl) "
           "/ ln(2.0))")
    if model == "dfr":
        body = (f"({tfn} / ({tfn} + 1.0)) * "
                "(ln((s.n_docs + 1.0) / (df.df + 0.5)) / ln(2.0))")
        having = ""
    elif model == "spl":
        lam = "((df.df + 0.5) / (s.n_docs + 1.0))"
        body = (f"-ln((power({lam}, {tfn} / ({tfn} + 1.0)) - {lam}) "
                f"/ (1.0 - {lam})) / ln(2.0)")
        having = ""
    elif model == "pl2":
        lam = "(cf.cf::DOUBLE / s.n_docs)"
        body = (f"(1.0 / ({tfn} + 1.0)) * "
                f"({tfn} * ln({tfn} / {lam}) / ln(2.0) "
                f"+ ({lam} + 1.0 / (12.0 * {tfn}) - {tfn}) / ln(2.0) "
                f"+ 0.5 * ln(2.0 * pi() * {tfn}) / ln(2.0))")
        having = ""
    elif model == "dph":
        frac = "(tf.tf::DOUBLE / dl.dl)"
        av = "(s.t_total::DOUBLE / s.n_docs)"
        body = (
            "CASE WHEN tf.tf < dl.dl THEN "
            f"((1.0 - {frac}) * (1.0 - {frac}) / (tf.tf + 1.0)) * "
            f"(tf.tf * ln((tf.tf * {av} / dl.dl) * "
            "(s.n_docs::DOUBLE / cf.cf)) / ln(2.0) "
            f"+ 0.5 * ln(2.0 * pi() * tf.tf * (1.0 - {frac})) / ln(2.0)) "
            "ELSE 0.0 END"
        )
        having = ""
    else:  # dfi
        e = "(cf.cf * dl.dl::DOUBLE / s.t_total)"
        body = (f"CASE WHEN tf.tf > {e} THEN "
                f"ln((tf.tf - {e}) * (tf.tf - {e}) / {e} + 1.0) / ln(2.0) "
                "ELSE 0.0 END")
        having = " HAVING sum(" + body + ") > 0"
    joins = ("FROM qd JOIN tf ON qd.term = tf.term "
             "JOIN df ON df.term = qd.term "
             "JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s")
    if model in ("dfi", "pl2", "dph"):
        joins += " JOIN cf ON cf.term = qd.term"
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS t_total, count(DISTINCT doc_id) "
        "AS n_docs FROM toks), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
        "GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        "cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "qd AS (SELECT DISTINCT query_id, term FROM q), "
        f"scored AS (SELECT qd.query_id, tf.doc_id, sum({body}) AS score "
        f"{joins} GROUP BY qd.query_id, tf.doc_id{having}) "
        "SELECT query_id, rank, doc_id, score FROM ("
        "SELECT query_id, doc_id, round(score, 6) AS score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored) "
        f"WHERE rank <= {k}"
    )


SQL_DFR_TOPK = _simfam_sql(_BM25_QUERIES, "dfr")
SQL_IB_SPL_TOPK = _simfam_sql(_BM25_QUERIES, "spl")
SQL_DFI_TOPK = _simfam_sql(_BM25_QUERIES, "dfi")
SQL_PL2_TOPK = _simfam_sql(_BM25_QUERIES, "pl2")
SQL_DPH_TOPK = _simfam_sql(_BM25_QUERIES, "dph")


def q_saat_topk(sf_dir: str):
    """Score-at-a-time serving over quantized impacts (Anh & Moffat,
    SIGIR 2005; the JASS anytime engine shape, Lin & Trotman ICTIR
    2015; stages/search.score_all_saat): every posting's exact BM25
    contribution quantizes to floor(c/wmax*255)+1 with wmax pinned per
    query, postings process in decreasing-impact order, and scores are
    INTEGER impact sums — the serving strategy whose work is bounded
    by a postings budget rather than by candidate sets (run here at
    budget 1.0: the exact quantized ranking; the anytime property is
    pytest-proven).  Scores are integer-valued, so no float rounding
    policy is involved anywhere."""
    idx = _build_docs_index(sf_dir)
    res = search(idx, _query_terms_ds(_BM25_QUERIES), k=10, mode="saat",
                 concurrency=2).to_pandas()
    out = []
    for _qid, g in res.groupby("query_id"):
        g = g.sort_values(["score", "doc_id"], ascending=[False, True])
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        out.append(g.head(10))
    cols = ["query_id", "rank", "doc_id", "score"]
    if not out:
        return pd.DataFrame(columns=cols)
    return pd.concat(out, ignore_index=True)[cols]


def _saat_sql(queries: list[tuple[int, list[str]]], k: int = 10,
              n_bins: int = 255) -> str:
    vals = ", ".join(f"({qid}, '{t}')" for qid, terms in queries for t in terms)
    c_expr = (
        # engine association: idf * (num / den) — NOT (idf*num)/den;
        # quantization floors are bin-boundary-sensitive to the ulp
        "ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * ((tf.tf * 2.2) / "
        "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / "
        "(s.total::DOUBLE / s.n_docs))))"
    )
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
        "GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "qd AS (SELECT DISTINCT query_id, term FROM q), "
        f"pc AS (SELECT qd.query_id, tf.doc_id, {c_expr} AS c "
        "FROM qd JOIN tf ON qd.term = tf.term "
        "JOIN df ON df.term = qd.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s), "
        "wm AS (SELECT query_id, max(c) AS wmax FROM pc GROUP BY 1), "
        "imp AS (SELECT p.query_id, p.doc_id, "
        f"CAST(floor(p.c / w.wmax * {n_bins}) AS BIGINT) + 1 AS imp "
        "FROM pc p JOIN wm w USING (query_id)), "
        "sc AS (SELECT query_id, doc_id, sum(imp) AS score FROM imp "
        "GROUP BY 1, 2) "
        "SELECT query_id, rank, doc_id, CAST(score AS DOUBLE) AS score "
        "FROM (SELECT query_id, doc_id, score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "score DESC, doc_id) AS INTEGER) AS rank FROM sc) "
        f"WHERE rank <= {k}"
    )


SQL_SAAT_TOPK = _saat_sql(_BM25_QUERIES)


def q_saat_stored_topk(sf_dir: str):
    """The STORED impact-ordered layout (stages/impacts.py — the real
    Anh-Moffat/JASS index, not query-time quantization): two streamed
    dictionary passes derive a build-time GLOBAL wmax and write
    ``(term, impact, docids)`` groups in decreasing-impact order as
    term-hash-bucketed parquet; serving actors read only their query
    terms' buckets and process impact groups under a postings budget
    (budget 1.0 here: the exact stored-quantized ranking).  Differs
    from ``saat_topk`` exactly by the scale pin — a stored layout must
    quantize once against the corpus-wide max contribution, which the
    oracle recomputes over ALL (term, doc) contributions."""
    from ...stages.impacts import build_impact_index, saat_stored_search

    idx = _build_docs_index(sf_dir)
    imp_dir = _tmp_index_dir(sf_dir, "idximpact")
    build_impact_index(idx, imp_dir, concurrency=2)
    res = saat_stored_search(
        imp_dir, _query_terms_ds(_BM25_QUERIES), k=10, concurrency=2
    ).to_pandas()
    out = []
    for _qid, g in res.groupby("query_id"):
        g = g.sort_values(["score", "doc_id"], ascending=[False, True])
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        out.append(g.head(10))
    cols = ["query_id", "rank", "doc_id", "score"]
    if not out:
        return pd.DataFrame(columns=cols)
    return pd.concat(out, ignore_index=True)[cols]


def _saat_stored_sql(queries: list[tuple[int, list[str]]], k: int = 10,
                     n_bins: int = 255) -> str:
    """Global-wmax variant of the SAAT oracle: wmax = max contribution
    over EVERY (term, doc) pair in the corpus (the build-time scale),
    not per query."""
    vals = ", ".join(f"({qid}, '{t}')" for qid, terms in queries for t in terms)
    c_expr = (
        # engine association: idf * (num / den), as in the saat oracle
        "ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (({tf} * 2.2) / "
        "({tf} + 1.2 * (1 - 0.75 + 0.75 * {dl} / "
        "(s.total::DOUBLE / s.n_docs))))"
    )
    c_all = c_expr.format(tf="tf.tf", dl="dl.dl")
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
        "GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        f"wm AS (SELECT max({c_all}) AS wmax FROM tf "
        "JOIN df ON df.term = tf.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "qd AS (SELECT DISTINCT query_id, term FROM q), "
        f"pc AS (SELECT qd.query_id, tf.doc_id, {c_all} AS c "
        "FROM qd JOIN tf ON qd.term = tf.term "
        "JOIN df ON df.term = qd.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s), "
        "imp AS (SELECT p.query_id, p.doc_id, "
        f"CAST(floor(p.c / w.wmax * {n_bins}) AS BIGINT) + 1 AS imp "
        "FROM pc p CROSS JOIN wm w), "
        "sc AS (SELECT query_id, doc_id, sum(imp) AS score FROM imp "
        "GROUP BY 1, 2) "
        "SELECT query_id, rank, doc_id, CAST(score AS DOUBLE) AS score "
        "FROM (SELECT query_id, doc_id, score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "score DESC, doc_id) AS INTEGER) AS rank FROM sc) "
        f"WHERE rank <= {k}"
    )


SQL_SAAT_STORED_TOPK = _saat_stored_sql(_BM25_QUERIES)


def q_lmjm_topk(sf_dir: str):
    """LM with Jelinek-Mercer smoothing (Zhai & Lafferty, SIGIR 2001;
    Lucene LMJelinekMercerSimilarity; pinned lambda = 0.1, the
    short-query setting): the linear-interpolation counterpart to the
    Dirichlet entry — the mixture weight is CONSTANT instead of
    length-adaptive, so long documents are not shrunk toward the
    collection model the way lmd_topk shrinks them.  Served from the
    same segments via the simfam kernel."""
    idx = _build_docs_index(sf_dir)
    res = search(idx, _query_terms_ds(_BM25_QUERIES), k=20, mode="lmjm",
                 concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


def _lmjm_sql(queries: list[tuple[int, list[str]]], k: int = 10) -> str:
    vals = ", ".join(f"({qid}, '{t}')" for qid, terms in queries for t in terms)
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS t_total FROM toks), "
        "cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY term), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
        "GROUP BY doc_id, term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "qd AS (SELECT DISTINCT query_id, term FROM q), "
        "scored AS (SELECT qd.query_id, tf.doc_id, "
        "sum(ln(1.0 + ((1.0 - 0.1) * tf.tf / dl.dl) / "
        "(0.1 * cf.cf / s.t_total::DOUBLE))) AS score "
        "FROM qd JOIN tf ON qd.term = tf.term "
        "JOIN cf ON cf.term = qd.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY qd.query_id, tf.doc_id) "
        "SELECT query_id, rank, doc_id, score FROM ("
        "SELECT query_id, doc_id, round(score, 6) AS score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored) "
        f"WHERE rank <= {k}"
    )


SQL_LMJM_TOPK = _lmjm_sql(_BM25_QUERIES)


def q_f2exp_topk(sf_dir: str):
    """Axiomatic F2EXP ranking (Fang & Zhai, SIGIR 2005 — the
    constraint-derived similarity; Lucene AxiomaticF2EXP; s = 0.5,
    k = 0.35): (tf/(tf + s + s*dl/avgdl)) * (N/df)^k per present term.
    The seventh scoring model served from one set of segments (BM25,
    LMD, LMJM, DFR InL2, IB SPL, DFI, F2EXP — plus tf-idf and the
    quantized SAAT route)."""
    idx = _build_docs_index(sf_dir)
    res = search(idx, _query_terms_ds(_BM25_QUERIES), k=20, mode="f2exp",
                 concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


def _f2exp_sql(queries: list[tuple[int, list[str]]], k: int = 10) -> str:
    vals = ", ".join(f"({qid}, '{t}')" for qid, terms in queries for t in terms)
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
        "GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "qd AS (SELECT DISTINCT query_id, term FROM q), "
        "scored AS (SELECT qd.query_id, tf.doc_id, "
        "sum((tf.tf / (tf.tf + 0.5 + 0.5 * dl.dl / "
        "(s.total::DOUBLE / s.n_docs))) * "
        "power(s.n_docs::DOUBLE / df.df, 0.35)) AS score "
        "FROM qd JOIN tf ON qd.term = tf.term "
        "JOIN df ON df.term = qd.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY qd.query_id, tf.doc_id) "
        "SELECT query_id, rank, doc_id, score FROM ("
        "SELECT query_id, doc_id, round(score, 6) AS score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored) "
        f"WHERE rank <= {k}"
    )


SQL_F2EXP_TOPK = _f2exp_sql(_BM25_QUERIES)


# pinned synonym table for the registry entry: maps query terms to extra
# group members — mixes present terms ("sort", "join", "dup") and an
# absent one ("quick", df 0, must contribute nothing)
_SYNONYMS: dict[str, list[str]] = {
    "fast": ["quick", "dup"],
    "merge": ["sort", "join"],
    "scan": ["slow"],
}

_SYN_QUERIES: list[tuple[int, list[str]]] = [
    (0, ["fast", "data"]),
    (1, ["merge"]),
    (2, ["scan", "window"]),
    (3, ["key", "value"]),  # no synonyms: must equal plain BM25
]


def q_synonym_topk(sf_dir: str):
    """Synonym-group retrieval (Lucene SynonymQuery semantics): each
    query term scores as one pseudo-term over its group — per-doc tf is
    the SUM of member tfs, df is the MAX over member dfs — so synonyms
    never inflate a doc's score the way a boolean OR of independent
    terms would."""
    idx = _build_docs_index(sf_dir)
    res = search(idx, _query_terms_ds(_SYN_QUERIES), k=20, mode="synonym",
                 syn_map=_SYNONYMS, concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


def _syn_sql(queries: list[tuple[int, list[str]]],
             syn: dict[str, list[str]], k: int = 10) -> str:
    rows = []
    for qid, terms in queries:
        for t in sorted(set(terms)):
            for m in sorted({t, *syn.get(t, [])}):
                rows.append(f"({qid}, '{t}', '{m}')")
    vals = ", ".join(rows)
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        f"syn(query_id, grp, term) AS (VALUES {vals}), "
        # merged pseudo-term stats per group: tf sums, df maxes
        "tfm AS (SELECT s.query_id, s.grp, tf.doc_id, sum(tf.tf) AS tfm "
        "FROM syn s JOIN tf ON s.term = tf.term GROUP BY 1, 2, 3), "
        "dfg AS (SELECT s.query_id, s.grp, max(df.df) AS dfg "
        "FROM syn s JOIN df ON df.term = s.term GROUP BY 1, 2), "
        "scored AS (SELECT tfm.query_id, tfm.doc_id, "
        "sum(ln(1 + (st.n_docs - dfg.dfg + 0.5) / (dfg.dfg + 0.5)) * "
        "(tfm.tfm * 2.2) / (tfm.tfm + 1.2 * (1 - 0.75 + 0.75 * dl.dl / "
        "(st.total::DOUBLE / st.n_docs)))) AS score "
        "FROM tfm JOIN dfg ON dfg.query_id = tfm.query_id AND dfg.grp = tfm.grp "
        "JOIN dl ON dl.doc_id = tfm.doc_id CROSS JOIN stats st "
        "GROUP BY tfm.query_id, tfm.doc_id) "
        "SELECT query_id, rank, doc_id, score FROM ("
        "SELECT query_id, doc_id, round(score, 6) AS score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored) "
        f"WHERE rank <= {k}"
    )


SQL_SYNONYM_TOPK = _syn_sql(_SYN_QUERIES, _SYNONYMS)


# --------------------------------------- synonym graph (multi-word members)

_SYNGRAPH_RULES: dict[str, list] = {
    "stream": [["fast", "scan"]],
    "data": [["hash", "join"]],
    "zzz": [["table", "scan"]],   # absent term, present phrase
    "window": [["zq", "qz"]],     # present term, absent phrase
}
_SYNGRAPH_QUERIES: list[tuple[int, list[str]]] = [
    (0, ["stream"]),
    (1, ["data", "query"]),
    (2, ["merge"]),               # no rule: plain BM25 group
    (3, ["zzz"]),
    (4, ["window", "batch"]),
]


def q_syngraph_topk(sf_dir: str):
    """Multi-word synonyms (Lucene SynonymGraphFilter + SynonymQuery,
    stages/phrase.score_all_syngraph): a query term's synonym group may
    contain PHRASES — the group scores as ONE pseudo-term with per-doc
    tf = term tf + per-doc phrase occurrence count (positional
    intersection) and df = max(term df, phrase live match count), over
    a positions=True index.  Covers all four member cases: plain group,
    term+phrase both present, absent-term/present-phrase (the group
    survives via the phrase), present-term/absent-phrase."""
    from ...stages.phrase import syngraph_search

    idx = _build_docs_index_pos(sf_dir)
    res = syngraph_search(
        idx, _query_terms_ds(_SYNGRAPH_QUERIES), _SYNGRAPH_RULES,
        k=20, concurrency=2,
    ).to_pandas()
    return _rerank_rounded(res, k=10)


def _syngraph_sql(queries, rules, k: int = 10) -> str:
    phrases: dict[tuple, str] = {}
    for ms in rules.values():
        for m in ms:
            if not isinstance(m, str):
                assert len(m) == 2, "oracle generator handles 2-word phrases"
                phrases.setdefault(tuple(m), f"ph{len(phrases)}")
    ph_ctes = [
        f"{name} AS (SELECT a.doc_id, count(*) AS tf FROM tokpos a "
        "JOIN tokpos b ON a.doc_id = b.doc_id AND b.i = a.i + 1 "
        f"WHERE a.term = '{w1}' AND b.term = '{w2}' GROUP BY a.doc_id)"
        for (w1, w2), name in phrases.items()
    ]
    parts = []
    for qid, terms in queries:
        for t in sorted(set(terms)):
            members = [t] + rules.get(t, [])
            tf_sel, df_ex = [], []
            for m in members:
                if isinstance(m, str):
                    tf_sel.append(
                        f"SELECT doc_id, tf FROM tf WHERE term = '{m}'"
                    )
                    df_ex.append(
                        f"COALESCE((SELECT df FROM df WHERE term = '{m}'), 0)"
                    )
                else:
                    name = phrases[tuple(m)]
                    tf_sel.append(f"SELECT doc_id, tf FROM {name}")
                    df_ex.append(f"(SELECT count(*) FROM {name})")
            union = " UNION ALL ".join(tf_sel)
            dfg = (
                "greatest(" + ", ".join(df_ex) + ")"
                if len(df_ex) > 1 else df_ex[0]
            )
            parts.append(
                f"SELECT {qid} AS query_id, g.doc_id, "
                f"ln(1 + (s.n_docs - {dfg} + 0.5) / ({dfg} + 0.5)) * "
                "(g.tfm * 2.2) / (g.tfm + 1.2 * (1 - 0.75 + 0.75 * dl.dl / "
                "(s.total::DOUBLE / s.n_docs))) AS part "
                f"FROM (SELECT doc_id, sum(tf) AS tfm FROM ({union}) "
                "GROUP BY doc_id) g "
                "JOIN dl ON dl.doc_id = g.doc_id CROSS JOIN stats s"
            )
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
        + ", ".join(ph_ctes) + (", " if ph_ctes else "")
        + "scored AS (SELECT query_id, doc_id, sum(part) AS score FROM ("
        + " UNION ALL ".join(parts)
        + ") GROUP BY query_id, doc_id) "
        "SELECT query_id, rank, doc_id, score FROM ("
        "SELECT query_id, doc_id, round(score, 6) AS score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored) "
        f"WHERE rank <= {k}"
    )


SQL_SYNGRAPH_TOPK = _syngraph_sql(_SYNGRAPH_QUERIES, _SYNGRAPH_RULES)


def q_bm25_page2(sf_dir: str):
    """Search-after pagination (the Lucene/Elasticsearch ``searchAfter``
    model): page 1 is a normal top-10; its last (score, doc_id) becomes
    each query's cursor, and page 2 re-runs the scorer with the cursor
    pushed INTO the candidate mask (strictly after in (score DESC,
    doc_id ASC) order) — a bounded top-k per page instead of a deep
    top-(page*k).  Output is ranks 11-20 of the global ranking."""
    idx = _build_docs_index(sf_dir)
    p1 = _rerank_rounded(
        search(idx, _query_terms_ds(_BM25_QUERIES), k=20, concurrency=2).to_pandas(),
        k=10,
    )
    cur = p1[p1["rank"] == 10]
    qmap = dict(_BM25_QUERIES)
    qt = pa.table(
        {
            "query_id": pa.array(cur["query_id"].to_numpy(), pa.int64()),
            "terms": pa.array(
                [qmap[int(q)] for q in cur["query_id"]], pa.list_(pa.string())
            ),
            "after_score": pa.array(cur["score"].to_numpy(), pa.float64()),
            "after_doc": pa.array(cur["doc_id"].to_numpy(), pa.int64()),
        }
    )
    res = search(idx, ray.data.from_arrow(qt), k=20, concurrency=2).to_pandas()
    res = _rerank_rounded(res, k=10)
    res["rank"] = (res["rank"] + 10).astype(np.int32)
    return res


SQL_BM25_PAGE2 = _bm25_sql(_BM25_QUERIES, k=20, lo=11)


_SCROLL_QUERIES: list[tuple[int, list[str]]] = [
    (0, ["merge", "sort"]),
    (1, ["hash", "join", "table"]),
]
_SCROLL_PAGE = 37  # deliberately not a divisor of anything


def _scroll_page_size(sf_dir: str) -> int:
    """Page size for the drain: 37 at fixture scale (maximum seam
    coverage for the boundary tests), growing with the corpus so the
    number of actor-pool rounds — each ~0.3 s of fixed Ray overhead —
    stays bounded (~8 pages to drain a match-everything query).  The
    seam PROPERTY is page-size independent (the oracle is the full
    unranked-depth ranking), so this is pure wall-clock tuning."""
    try:
        n = pq.ParquetFile(
            os.path.join(sf_dir, "documents.parquet")
        ).metadata.num_rows
    except Exception:  # noqa: BLE001 — non-parquet/fixture callers
        return _SCROLL_PAGE
    return max(_SCROLL_PAGE, n // 8)


def q_bm25_scroll(sf_dir: str):
    """Scroll / full match-set drain (the Elasticsearch scroll + PIT
    export shape): the ENTIRE ranking of each query is drained through
    repeated bounded search-after pages (page size 37 at fixture scale,
    corpus-scaled via ``_scroll_page_size``) — each page is
    one ordinary top-k actor-pool pass with the previous page's last
    (rounded score, doc_id) pushed into the candidate mask, so page N
    costs one bounded top-k, never a deep top-(N*37).  Queries drain
    independently and drop out as they exhaust.  The page cut
    over-fetches 2x and trims to the page size AFTER the rounded
    re-rank — the same raw-vs-rounded boundary margin ``bm25_page2``
    uses (a seam gap would need a >37-way 1e-6 score-band tie
    straddling the raw cut).  The index decodes ONCE
    (build_shared_index + ray.put); every page's actors attach to the
    same plasma pack instead of re-opening the index.  The oracle is
    the full unranked-depth BM25 SQL: a hash match proves the page walk
    visits every match exactly once in the global (score DESC, doc_id)
    order — no seam duplicates, no seam gaps at any page boundary."""
    from ...stages.search import build_shared_index

    page_sz = _scroll_page_size(sf_dir)
    idx = _build_docs_index(sf_dir)
    shared_ref = ray.put(build_shared_index(idx))
    qmap = dict(_SCROLL_QUERIES)
    cursors: dict[int, tuple[float, int] | None] = {
        qid: None for qid, _ in _SCROLL_QUERIES
    }
    pages: list[pd.DataFrame] = []
    live = set(cursors)
    for _ in range(500):
        if not live:
            break
        qids = sorted(live)
        cols: dict = {
            "query_id": pa.array(qids, pa.int64()),
            "terms": pa.array([qmap[q] for q in qids], pa.list_(pa.string())),
        }
        if any(cursors[q] is not None for q in qids):
            # a page-1 query rides along with an "everything" cursor
            cols["after_score"] = pa.array(
                [
                    cursors[q][0] if cursors[q] else float("inf")
                    for q in qids
                ],
                pa.float64(),
            )
            cols["after_doc"] = pa.array(
                [cursors[q][1] if cursors[q] else -1 for q in qids],
                pa.int64(),
            )
        res = search(
            idx, ray.data.from_arrow(pa.table(cols)),
            k=2 * page_sz, concurrency=2, shared_ref=shared_ref,
        ).to_pandas()
        if res.empty:
            break
        res = _rerank_rounded(res, k=2 * page_sz)
        for q in list(live):
            mine = res[res["query_id"] == q]
            if len(mine) <= page_sz:
                pages.append(mine)    # the tail page; query exhausted
                live.discard(q)
            else:
                page = mine.head(page_sz)
                pages.append(page)
                last = page.iloc[-1]
                cursors[q] = (float(last["score"]), int(last["doc_id"]))
    if live:
        raise RuntimeError(
            "bm25_scroll: drain cap hit with queries still live: "
            f"{sorted(live)} — raise the page count for this corpus size"
        )
    out = pd.concat(pages, ignore_index=True)
    return _rerank_rounded(out, k=len(out))


# full-depth ranking: the drain must reproduce it exactly
SQL_BM25_SCROLL = _bm25_sql(_SCROLL_QUERIES, k=1 << 30)


_MAXP_WIN = 32


def q_bm25_maxp(sf_dir: str):
    """BM25-MaxP passage-parent ranking (Dai & Callan, SIGIR 2019; the
    Lucene has_child/block-join score_mode=max shape): documents split
    into non-overlapping 32-token passages, a PASSAGE-level index is
    built (passage stats: df over passages, avg passage length), and a
    parent doc's score is the MAX of its passages' rounded scores —
    long documents stop winning on accumulated length, the reason MaxP
    beats doc-level BM25 on web corpora.  The parent max runs over the
    FULL passage match set (k = passage count bounds the heap, the
    match set is what it is), then one tiny groupby-max + re-rank.
    Passage ids are arithmetic (doc * shift + chunk with shift = the
    corpus max chunks/doc, one cheap aggregate), so parent recovery is
    a division, not a join, and the id space stays DENSE enough for the
    TAAT accumulator (never doc_id * 4096-style range explosion)."""
    from ray.data.aggregate import Max

    docs = _docs(sf_dir, ["doc_id", "text"])

    def nchunks(batch: pa.Table) -> pa.Table:
        _, _, doc_len = flatten_tokens(batch["text"])
        nc = (doc_len.astype(np.int64) + _MAXP_WIN - 1) // _MAXP_WIN
        return pa.table({"nc": pa.array(nc, pa.int64())})

    shift = int(
        docs.map_batches(nchunks, batch_format="pyarrow")
        .aggregate(Max("nc"))["max(nc)"]
    )
    shift = max(shift, 1)

    def passages(batch: pa.Table) -> pa.Table:
        terms, row_idx, doc_len = flatten_tokens(batch["text"])
        if len(terms) == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            })
        n = doc_len.astype(np.int64)
        offs = np.cumsum(n) - n
        pos = np.arange(len(terms), dtype=np.int64) - offs[row_idx]
        dids = batch["doc_id"].to_numpy()
        pid = dids[row_idx] * shift + pos // _MAXP_WIN
        toks = pd.Series(terms.to_pylist())
        joined = toks.groupby(pid, sort=True).agg(" ".join)
        return pa.table({
            "doc_id": pa.array(joined.index.to_numpy(np.int64)),
            "text": pa.array(joined.to_numpy(), pa.string()),
        })

    pds = docs.map_batches(passages, batch_format="pyarrow")
    idx = _tmp_index_dir(sf_dir, f"idxmaxp{shift}")
    n_pass = pds.count()
    build_index(pds, idx, seg_docs=max(128, n_pass // 8), resume=True)
    res = search(
        idx, _query_terms_ds(_BM25_QUERIES), k=n_pass, concurrency=2
    ).to_pandas()
    res["score"] = np.round(res["score"], 6)
    res["parent"] = res["doc_id"].to_numpy(np.int64) // shift
    best = res.groupby(["query_id", "parent"], as_index=False)["score"].max()
    best = best.rename(columns={"parent": "doc_id"})
    return _rerank_rounded(best, k=10)


SQL_BM25_MAXP = (
    "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
    "x -> x <> '') AS ts FROM documents), "
    "tokpos AS (SELECT doc_id, unnest(ts) AS term, "
    "unnest(range(1, len(ts) + 1)) AS i FROM d), "
    f"shift AS (SELECT greatest(max((len(ts) + {_MAXP_WIN} - 1) "
    f"// {_MAXP_WIN}), 1) AS s FROM d), "
    f"pt AS (SELECT doc_id * shift.s + (i - 1) // {_MAXP_WIN} AS pid, "
    "term FROM tokpos CROSS JOIN shift), "
    "dl AS (SELECT pid, count(*) AS dl FROM pt GROUP BY pid), "
    "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
    "tf AS (SELECT pid, term, count(*) AS tf FROM pt GROUP BY 1, 2), "
    "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
    "q(query_id, term) AS (VALUES "
    + ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    + "), "
    "pscore AS (SELECT q.query_id, tf.pid, "
    "round(sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * "
    "(tf.tf * 2.2) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / "
    "(s.total::DOUBLE / s.n_docs)))), 6) AS score "
    "FROM q JOIN tf ON q.term = tf.term JOIN df ON df.term = q.term "
    "JOIN dl ON dl.pid = tf.pid CROSS JOIN stats s "
    "GROUP BY q.query_id, tf.pid), "
    "parent AS (SELECT query_id, pid // shift.s AS doc_id, "
    "max(score) AS score FROM pscore CROSS JOIN shift GROUP BY 1, 2) "
    "SELECT query_id, rank, doc_id, score FROM ("
    "SELECT query_id, doc_id, score, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, "
    "doc_id) AS INTEGER) AS rank FROM parent) WHERE rank <= 10"
)


def q_bm25_collapse(sf_dir: str):
    """Field collapsing: at most one doc per ``source`` in the ranking,
    each source represented by its best-scoring doc, top-5 sources per
    query (stages/search.score_all_collapse — per-segment winners merged
    by per-group max).  The doc->source map is a columns-pruned read
    broadcast once via ray.put (the NER-title-map pattern); the 10^12-doc
    deployment shape — a doc-range-partitioned sidecar read per actor —
    is the ``bm25_collapse_sidecar`` entry (stages/collapse_map.py),
    route-identical by construction and by test."""
    idx = _build_docs_index(sf_dir)
    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"]
    )
    d = pc.dictionary_encode(tbl["source"].combine_chunks())
    doc_ids = tbl["doc_id"].to_numpy()
    codes = np.zeros(int(doc_ids.max()) + 1, dtype=np.int32)
    codes[doc_ids] = d.indices.to_numpy()
    grp = {"codes": codes, "names": d.dictionary.to_pylist()}
    res = search(
        idx,
        _query_terms_ds(_BM25_QUERIES),
        k=5,
        mode="collapse",
        group_ref=ray.put(grp),
        concurrency=2,
    ).to_pandas()
    return res


def q_bm25_collapse_sidecar(sf_dir: str):
    """``bm25_collapse`` through the AT-SCALE group-map route: the
    doc->source map is a doc-range-partitioned parquet sidecar
    (stages/collapse_map.py) that scorer actors read bucket-by-bucket,
    instead of a driver-built dense array broadcast via ray.put — the
    10^12-doc shape (a dense map is terabytes there).  Codes/names are
    deterministic (sorted distinct sources), so the ranking is identical
    to the broadcast route and shares its SQL oracle.  ``range_docs`` is
    set small here so the sf-scale run genuinely exercises multi-bucket
    pruned reads, not one all-covering bucket."""
    from ...stages.collapse_map import build_collapse_map

    idx = _build_docs_index(sf_dir)
    side = _tmp_index_dir(sf_dir, "collapsemap")
    build_collapse_map(
        _docs(sf_dir, ["doc_id", "source"]), side,
        group_col="source", range_docs=256,
    )
    return search(
        idx,
        _query_terms_ds(_BM25_QUERIES),
        k=5,
        mode="collapse",
        group_dir=side,
        concurrency=2,
    ).to_pandas()


def q_bm25_cardinality(sf_dir: str):
    """ES ``cardinality`` aggregation over the MATCH SET: per query, the
    number of distinct sources among ALL docs matching >= 1 query term
    (not just the top-k — this composes the count-mode posting-union
    walk with the doc-value sidecar the collapse modes read).  The
    sidecar route is used, so at corpus scale the doc->source codes load
    bucket-by-bucket per actor, never as a driver array."""
    from ...stages.collapse_map import build_collapse_map

    idx = _build_docs_index(sf_dir)
    side = _tmp_index_dir(sf_dir, "collapsemap")
    build_collapse_map(
        _docs(sf_dir, ["doc_id", "source"]), side,
        group_col="source", range_docs=256,
    )
    return (
        search(
            idx, _query_terms_ds(_BM25_QUERIES), mode="cardinality",
            group_dir=side, concurrency=2,
        )
        .to_pandas()
        .sort_values("query_id")
        .reset_index(drop=True)
    )


def _cardinality_sql(queries: list[tuple[int, list[str]]]) -> str:
    vals = ", ".join(f"({qid}, '{t}')" for qid, terms in queries for t in terms)
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "qd AS (SELECT DISTINCT query_id, term FROM q), "
        "hits AS (SELECT DISTINCT qd.query_id, toks.doc_id "
        "FROM qd JOIN toks ON qd.term = toks.term) "
        "SELECT h.query_id, count(*) AS n_hits, "
        "count(DISTINCT d.source) AS n_sources "
        "FROM hits h JOIN documents d ON d.doc_id = h.doc_id "
        "GROUP BY h.query_id"
    )


def _collapse_sql(queries: list[tuple[int, list[str]]], k: int = 5) -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in queries for t in terms
    )
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "scored AS (SELECT q.query_id, tf.doc_id, "
        "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
        "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
        ") AS score FROM q JOIN tf ON q.term = tf.term "
        "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id), "
        "rs AS (SELECT s.query_id, s.doc_id, d.source, round(s.score, 6) AS score "
        "FROM scored s JOIN documents d ON d.doc_id = s.doc_id), "
        "best AS (SELECT query_id, source, doc_id, score, "
        "row_number() OVER (PARTITION BY query_id, source ORDER BY "
        "score DESC, doc_id) AS rn FROM rs) "
        "SELECT query_id, rank, source, doc_id, score FROM ("
        "SELECT query_id, source, doc_id, score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "score DESC, doc_id) AS INTEGER) AS rank FROM best WHERE rn = 1) "
        f"WHERE rank <= {k}"
    )


SQL_BM25_COLLAPSE = _collapse_sql(_BM25_QUERIES)


# -------------------- near-duplicate-aware SERP (collapse by cluster)


def _neardup_clusters_cached(
    sf_dir: str, threshold: float = 0.8, *, force: bool = False
) -> pd.DataFrame:
    """Cluster table shared by ``neardup_clusters`` /
    ``dedup_keep_best`` / ``bm25_collapse_neardup``: the MinHash →
    verify → connected-components pipeline runs ONCE per (data
    fingerprint, DEDUP_VERSION, threshold) and persists as parquet —
    the same resumable-artifact pattern as ``_build_docs_index`` (the
    driver harness runs all three entries in one process; without the
    cache each rebuilds the clustering from scratch).

    ``force=True`` (the ``neardup_clusters`` entry itself) always
    re-executes the DISTRIBUTED pipeline and rewrites the artifact —
    that entry is the r03 parallelism-crash regression proof and must
    never degrade into a file read."""
    from ...stages.dedup import DEDUP_VERSION

    d = _tmp_index_dir(
        sf_dir, f"nclust{int(threshold * 100)}-{DEDUP_VERSION}"
    )
    f = os.path.join(d, "clusters.parquet")
    done = os.path.join(d, "_SUCCESS")
    if not force and os.path.exists(done):
        return pq.read_table(f).to_pandas()
    cl = (
        dedup.neardup_clusters(
            _docs(sf_dir, ["doc_id", "text"]), threshold=threshold
        )
        .sort("doc_id")
        .to_pandas()
    )
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(cl, preserve_index=False), f)
    with open(done, "w") as fh:
        fh.write("ok")
    return cl


def q_bm25_collapse_neardup(sf_dir: str):
    """Near-duplicate-aware search results: field collapsing where the
    collapse key is the NEAR-DUP CLUSTER (MinHash -> verified pairs ->
    connected components), so a SERP never shows two near-identical
    documents — the dedup family composed INTO the serving path.
    Unclustered docs are singleton groups (their own doc_id).  Oracle:
    the recursive-CTE component walk over TRUE all-pairs Jaccard (the
    neardup_clusters oracle) fused with the exact-BM25 collapse SQL."""
    idx = _build_docs_index(sf_dir)
    cl = _neardup_clusters_cached(sf_dir)
    ids = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )["doc_id"].to_numpy()
    garr = np.arange(int(ids.max()) + 1, dtype=np.int64)
    if len(cl):
        garr[cl["doc_id"].to_numpy()] = cl["cluster_id"].to_numpy()
    uniq, codes = np.unique(garr, return_inverse=True)
    grp = {
        "codes": codes.astype(np.int32),
        "names": [f"c{int(g)}" for g in uniq],
    }
    res = search(
        idx,
        _query_terms_ds(_BM25_QUERIES),
        k=5,
        mode="collapse",
        group_ref=ray.put(grp),
        concurrency=2,
    ).to_pandas()
    return res


_MLT_SEEDS = [3, 17, 42]
_MLT_TERMS = 5


def q_mlt_topk(sf_dir: str):
    """More-Like-This (the Lucene MLT rewrite model): from each seed
    doc's term vector select the top-N "interesting" terms by
    round(tf * idf, 6) (idf = the pinned BM25 idf; ties by term ASC),
    then rank the corpus by plain BM25 over those terms, excluding the
    seed itself.  Seeds are point-read (parquet doc_id filter) and term
    selection is driver-side over the handful of seed vectors — at
    scale, seed batches run through the same searcher actor pool with
    selection inside the actor."""
    import math

    from ...functions.tokenizer import tokenize as _tok
    from ...stages.search import IndexReader

    idx = _build_docs_index(sf_dir)
    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filters=[("doc_id", "in", _MLT_SEEDS)],
    )
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    reader = IndexReader(idx)
    n = reader.n_docs
    mlt_queries: list[tuple[int, list[str]]] = []
    for seed in _MLT_SEEDS:
        from collections import Counter

        tf = Counter(_tok(texts[seed]))
        dfs = reader.dfs(sorted(tf))
        w = {
            t: round(
                c * math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5)), 6
            )
            for t, c in tf.items()
            if dfs[t] > 0
        }
        top = sorted(w, key=lambda t: (-w[t], t))[:_MLT_TERMS]
        mlt_queries.append((seed, top))
    res = search(idx, _query_terms_ds(mlt_queries), k=20, concurrency=2).to_pandas()
    res = res[res["doc_id"] != res["query_id"]]
    return _rerank_rounded(res, k=10)


def _mlt_sql(seeds: list[int], n_terms: int = _MLT_TERMS, k: int = 10) -> str:
    seed_vals = ", ".join(f"({s})" for s in seeds)
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        f"seeds(seed) AS (VALUES {seed_vals}), "
        "sel AS (SELECT s.seed, tf.term, "
        "round(tf.tf * ln(1 + (st.n_docs - df.df + 0.5) / (df.df + 0.5)), 6) AS w "
        "FROM seeds s JOIN tf ON tf.doc_id = s.seed "
        "JOIN df ON df.term = tf.term CROSS JOIN stats st), "
        "q AS (SELECT seed AS query_id, term FROM ("
        "SELECT seed, term, row_number() OVER (PARTITION BY seed "
        f"ORDER BY w DESC, term) AS rn FROM sel) WHERE rn <= {n_terms}), "
        "scored AS (SELECT q.query_id, tf.doc_id, "
        "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
        "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
        ") AS score FROM q JOIN tf ON q.term = tf.term AND tf.doc_id <> q.query_id "
        "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id) "
        "SELECT query_id, rank, doc_id, score FROM ("
        "SELECT query_id, doc_id, round(score, 6) AS score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM scored) "
        f"WHERE rank <= {k}"
    )


SQL_MLT_TOPK = _mlt_sql(_MLT_SEEDS)


def q_docs_stratified_sample(sf_dir: str):
    """Stratified eval-slice carving: per-language deterministic hash
    sampling (en at ~10%, everything else at 50%) — the
    parallelism-invariant form of 'downsample the head language'."""
    from ...stages.export import stratified_sample

    return stratified_sample(
        _docs(sf_dir, ["doc_id", "lang"]), {"en": "19"}, default="7f"
    )


SQL_DOCS_STRATIFIED_SAMPLE = (
    "SELECT doc_id, lang FROM documents "
    "WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= "
    "CASE WHEN lang = 'en' THEN '19' ELSE '7f' END"
)


def q_export_shards(sf_dir: str):
    """Training export: hash-sharded partitioned parquet with a
    crash-safe done-marker (stages/export.py).  The returned aggregate
    is computed by READING BACK the files on disk — the entry checks the
    sink, not the in-flight pipeline."""
    from ...stages.export import export_shards

    out = _tmp_index_dir(sf_dir, "export")
    export_shards(_docs(sf_dir, ["doc_id", "n_chars"]), out, n_shards=4)
    back = ray.data.read_parquet(out, file_extensions=["parquet"])
    agg = (
        back.groupby("shard")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars"))
        .to_pandas()
    )
    agg["shard"] = agg["shard"].astype(np.int64)
    agg["n_docs"] = agg["n_docs"].astype(np.int64)
    agg["total_chars"] = agg["total_chars"].astype(np.int64)
    return agg.sort_values("shard").reset_index(drop=True)


def q_kmv_quantiles(sf_dir: str):
    """Mergeable KMV (bottom-k) hash sample -> approximate p50/p95 of
    n_chars with the pinned discrete quantile rule — the sketch-based
    route for percentile monitoring over corpora where an exact
    per-group sort is not worth a shuffle."""
    from ...functions.sketches import kmv_quantiles

    out = kmv_quantiles(_docs(sf_dir, ["doc_id", "n_chars"]), k=256)
    return pd.DataFrame(
        {
            "n": pd.Series([out["n"]], dtype=np.int64),
            "p50": pd.Series([out["p50"]], dtype=np.float64),
            "p95": pd.Series([out["p95"]], dtype=np.float64),
        }
    )


SQL_KMV_QUANTILES = (
    "WITH s AS (SELECT CAST(n_chars AS DOUBLE) AS value FROM ("
    "SELECT md5(CAST(doc_id AS VARCHAR)) AS h, doc_id, n_chars "
    "FROM documents ORDER BY h, doc_id LIMIT 256)), "
    "r AS (SELECT value, row_number() OVER (ORDER BY value) AS rn, "
    "count(*) OVER () AS n FROM s) "
    "SELECT CAST(max(n) AS BIGINT) AS n, "
    "round(max(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1 "
    "THEN value END), 6) AS p50, "
    "round(max(CASE WHEN rn = CAST(floor(0.95 * (n - 1)) AS BIGINT) + 1 "
    "THEN value END), 6) AS p95 FROM r"
)


_THETA_K = 128


def q_theta_sketch_ops(sf_dir: str):
    """Theta-sketch set operations (the Apache DataSketches
    theta/KMV family — Dasgupta et al., "Theta-Sketch Framework"):
    distinct-count ESTIMATES for two doc populations (A = lang='en',
    B = the doc_id%3=0 shard slice), their union, intersection and
    Jaccard, from k=128 bottom-k md5 sketches — the mergeable way to
    answer audience-overlap questions without ever co-shuffling the
    sets.  Pinned rules: per set, theta = (k-th smallest normalized
    hash) and est = (k-1)/theta when the sketch is full, else exact
    count; union = bottom-k of the deduped hash union (same rule);
    intersection counts shared hashes STRICTLY below min(theta_A,
    theta_B) and divides by it; jaccard = inter_est/union_est from
    the unrounded estimates.  Each batch reduces to <= k sketch rows
    per set (same mergeable-bottom-k argument as kmv_sample); the
    driver merge touches k x blocks rows.  md5-of-doc_id-string
    hashes make the DuckDB oracle bit-identical."""
    import hashlib

    k = _THETA_K
    space = float(16 ** 15)

    def partial(batch: pa.Table) -> pa.Table:
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)
        is_en = pc.equal(batch["lang"], "en").to_numpy(
            zero_copy_only=False
        )
        out_h, out_s = [], []
        for tag, sel in (
            ("a", dids[is_en]),
            ("b", dids[dids % 3 == 0]),
        ):
            hs = sorted(
                int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
                for i in sel
            )[:k]
            out_h.extend(hs)
            out_s.extend([tag] * len(hs))
        return pa.table({
            "s": pa.array(out_s, pa.string()),
            "h": pa.array(out_h, pa.int64()),
        })

    parts = (
        _docs(sf_dir, ["doc_id", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    ha = sorted(parts.loc[parts["s"] == "a", "h"].tolist())[:k]
    hb = sorted(parts.loc[parts["s"] == "b", "h"].tolist())[:k]

    def est_of(hs: list[int]) -> tuple[float, float]:
        if len(hs) < k:
            return 1.0, float(len(hs))
        theta = hs[k - 1] / space
        return theta, (k - 1) / theta

    theta_a, est_a = est_of(ha)
    theta_b, est_b = est_of(hb)
    hu = sorted(set(ha) | set(hb))[:k]
    _, est_u = est_of(hu)
    theta_i = min(theta_a, theta_b)
    c = sum(1 for h in set(ha) & set(hb) if h / space < theta_i)
    est_i = c / theta_i
    jac = est_i / est_u
    return pd.DataFrame({
        "n_a_est": [round(est_a, 6)],
        "n_b_est": [round(est_b, 6)],
        "union_est": [round(est_u, 6)],
        "inter_est": [round(est_i, 6)],
        "jaccard_est": [round(jac, 6)],
    })


def _sql_theta_sketch_ops() -> str:
    k = _THETA_K
    h = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)"
    sp = "power(16.0, 15)"
    est = (
        "CASE WHEN {t}.c < {k} THEN {t}.c::DOUBLE "
        "ELSE ({k} - 1) / ({t}.mx / {sp}) END"
    )
    return (
        f"WITH ha AS (SELECT {h} AS h FROM documents WHERE lang = 'en' "
        f"ORDER BY h LIMIT {k}), "
        f"hb AS (SELECT {h} AS h FROM documents WHERE doc_id % 3 = 0 "
        f"ORDER BY h LIMIT {k}), "
        f"hu AS (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb) "
        f"ORDER BY h LIMIT {k}), "
        "ta AS (SELECT count(*) AS c, max(h) AS mx FROM ha), "
        "tb AS (SELECT count(*) AS c, max(h) AS mx FROM hb), "
        "tu AS (SELECT count(*) AS c, max(h) AS mx FROM hu), "
        "th AS (SELECT least("
        f"CASE WHEN ta.c < {k} THEN 1.0 ELSE ta.mx / {sp} END, "
        f"CASE WHEN tb.c < {k} THEN 1.0 ELSE tb.mx / {sp} END) AS ti "
        "FROM ta, tb), "
        "ci AS (SELECT count(*) AS c FROM "
        "(SELECT h FROM ha INTERSECT SELECT h FROM hb) x, th "
        f"WHERE x.h / {sp} < th.ti), "
        "ests AS (SELECT "
        + est.format(t="ta", k=k, sp=sp) + " AS ea, "
        + est.format(t="tb", k=k, sp=sp) + " AS eb, "
        + est.format(t="tu", k=k, sp=sp) + " AS eu, "
        "ci.c / th.ti AS ei FROM ta, tb, tu, ci, th) "
        "SELECT round(ea, 6) AS n_a_est, round(eb, 6) AS n_b_est, "
        "round(eu, 6) AS union_est, round(ei, 6) AS inter_est, "
        "round(ei / eu, 6) AS jaccard_est FROM ests"
    )


SQL_THETA_SKETCH_OPS = _sql_theta_sketch_ops()


_RRF_K = 60
_RRF_DEPTH = 20


def q_hybrid_rrf(sf_dir: str):
    """Hybrid retrieval with Reciprocal Rank Fusion (Cormack, Clarke &
    Buettcher, SIGIR 2009 — the standard lexical+dense fusion): per
    query, BM25 top-20 and brute-cosine top-20 fuse as
    sum(1/(60 + rank)) over the lists a doc appears in, re-ranked by
    (round(rrf, 6) DESC, doc_id).  Queries pair the first three BM25
    term sets with embedding rows 0-2 as query vectors (documents and
    embeddings are row-aligned tables).  Both legs run their normal
    distributed paths; the fusion join touches only 2*depth rows per
    query."""
    idx = _build_docs_index(sf_dir)
    lex = _rerank_rounded(
        search(
            idx, _query_terms_ds(_BM25_QUERIES[:3]), k=2 * _RRF_DEPTH,
            concurrency=2,
        ).to_pandas(),
        k=_RRF_DEPTH,
    )[["query_id", "doc_id", "rank"]]
    qv = _query_vectors(sf_dir, 3)
    dense = ann.knn_brute(
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"]), qv,
        k=_RRF_DEPTH,
    )[["query_id", "vec_id", "rank"]].rename(columns={"vec_id": "doc_id"})
    fused = lex.merge(
        dense, on=["query_id", "doc_id"], how="outer",
        suffixes=("_lex", "_dense"),
    )
    rrf = np.zeros(len(fused))
    for col in ("rank_lex", "rank_dense"):
        r = fused[col].to_numpy(dtype=np.float64, na_value=np.nan)
        rrf += np.where(np.isnan(r), 0.0, 1.0 / (_RRF_K + r))
    fused["score"] = rrf
    return _rerank_rounded(fused, k=10)


def _hybrid_sql(queries: list[tuple[int, list[str]]], n_q: int = 3,
                depth: int = _RRF_DEPTH, k: int = 10) -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in queries[:n_q] for t in terms
    )
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "scored AS (SELECT q.query_id, tf.doc_id, "
        "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
        "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
        ") AS score FROM q JOIN tf ON q.term = tf.term "
        "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id), "
        "lex AS (SELECT query_id, doc_id, rank FROM ("
        "SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
        "ORDER BY round(score, 6) DESC, doc_id) AS rank FROM scored) "
        f"WHERE rank <= {depth}), "
        f"qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS v "
        f"FROM embeddings WHERE vec_id < {n_q}), "
        "dense AS (SELECT query_id, doc_id, rank FROM ("
        "SELECT qv.query_id, e.vec_id AS doc_id, "
        "row_number() OVER (PARTITION BY qv.query_id ORDER BY "
        "round(list_cosine_similarity(qv.v, e.embedding::DOUBLE[]), 6) DESC, "
        f"e.vec_id) AS rank FROM qv CROSS JOIN embeddings e) WHERE rank <= {depth}), "
        "fused AS (SELECT COALESCE(l.query_id, d.query_id) AS query_id, "
        "COALESCE(l.doc_id, d.doc_id) AS doc_id, "
        f"COALESCE(1.0 / ({_RRF_K} + l.rank), 0) + "
        f"COALESCE(1.0 / ({_RRF_K} + d.rank), 0) AS rrf "
        "FROM lex l FULL OUTER JOIN dense d "
        "ON l.query_id = d.query_id AND l.doc_id = d.doc_id) "
        "SELECT query_id, rank, doc_id, score FROM ("
        "SELECT query_id, doc_id, round(rrf, 6) AS score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(rrf, 6) DESC, doc_id) AS INTEGER) AS rank FROM fused) "
        f"WHERE rank <= {k}"
    )


SQL_HYBRID_RRF = _hybrid_sql(_BM25_QUERIES)


def q_bm25_count(sf_dir: str):
    """Total-hit counting (Lucene TotalHitCountCollector): per query,
    the union size of the matched posting lists — no scoring, no heap,
    the cheapest serving mode (drives 'about N results' UIs and
    selectivity-based query planning)."""
    idx = _build_docs_index(sf_dir)
    return search(
        idx, _query_terms_ds(_BM25_QUERIES), mode="count", concurrency=2
    ).to_pandas().sort_values("query_id").reset_index(drop=True)


def _count_sql(queries: list[tuple[int, list[str]]]) -> str:
    vals = ", ".join(f"({qid}, '{t}')" for qid, terms in queries for t in terms)
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "qd AS (SELECT DISTINCT query_id, term FROM q) "
        "SELECT qd.query_id, count(DISTINCT toks.doc_id) AS n_hits "
        "FROM qd JOIN toks ON qd.term = toks.term GROUP BY qd.query_id"
    )


SQL_BM25_COUNT = _count_sql(_BM25_QUERIES)
SQL_BM25_CARDINALITY = _cardinality_sql(_BM25_QUERIES)


SQL_EXPORT_SHARDS = (
    "WITH b AS (SELECT CASE WHEN p <= '3f' THEN 0 WHEN p <= '7f' THEN 1 "
    "WHEN p <= 'bf' THEN 2 ELSE 3 END AS shard, n_chars FROM ("
    "SELECT substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS p, n_chars "
    "FROM documents)) "
    "SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars "
    "FROM b GROUP BY shard ORDER BY shard"
)


# --------------------------------------------- rows-only (non-SQL) entries

def q_minhash_neardup(sf_dir: str):
    """MinHash+LSH candidates -> exact shingle-Jaccard verification
    (candidates-then-verify).  The DuckDB oracle computes TRUE all-pairs
    Jaccard >= threshold — a genuinely independent check: it passes only
    when LSH recall is 1.0 on this corpus (verified; 32 bands x 4 rows at
    j >= 0.8 gives miss probability ~5e-8 per pair) AND the verify stage
    filters every false positive."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    cand = dedup.minhash_lsh_candidates(docs)
    return dedup.verify_jaccard_pairs(cand, docs, threshold=0.8)


_SHINGLE_SQL = (
    "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
    "x -> x <> '') AS ts FROM documents), "
    "sh AS (SELECT doc_id, CASE WHEN len(ts) = 0 THEN [] "
    "WHEN len(ts) < 5 THEN [array_to_string(ts, ' ')] "
    "ELSE list_distinct(list_transform(range(1, len(ts) - 3), "
    "i -> array_to_string(ts[i : i + 4], ' '))) END AS s FROM d)"
)

# Lossless oracle prune: Jaccard >= t > 0 requires at least one shared
# shingle, so restricting the pair universe to doc pairs that share a
# shingle (an unnest self-join) is exactly equivalent to the all-pairs
# cross join — verified result-identical — while cutting the oracle from
# O(n^2) list-intersects to O(co-occurring pairs).  The check stays
# independent of the LSH/banding code under test.
_CAND_SQL = (
    ", ug AS (SELECT doc_id, unnest(s) AS g FROM sh), "
    "cand AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b "
    "FROM ug x JOIN ug y ON x.g = y.g AND x.doc_id < y.doc_id "
    "GROUP BY 1, 2)"
)
_SHINGLE_SQL = _SHINGLE_SQL + _CAND_SQL

SQL_MINHASH_NEARDUP = (
    _SHINGLE_SQL + " "
    "SELECT id_a, id_b, jaccard FROM ("
    "SELECT c.id_a, c.id_b, "
    "round(len(list_intersect(a.s, b.s))::DOUBLE / "
    "len(list_distinct(a.s || b.s)), 6) AS jaccard "
    "FROM cand c JOIN sh a ON a.doc_id = c.id_a "
    "JOIN sh b ON b.doc_id = c.id_b) WHERE jaccard >= 0.8"
)


def q_substring_dedup(sf_dir: str):
    """Exact duplicate-SPAN detection (Lee et al. 2022 arXiv:2107.06499
    shape): doc pairs sharing >= 1 exact 32-char substring, with the
    exact count of shared distinct windows.  Engine: stride-1 rolling
    window hashes (vectorized, one gather per window byte) -> hash-keyed
    self-join -> pair-dedup aggregate -> exact character-window
    verification (hash-collision-proof).  The oracle explodes every
    substr(text, i, 32) in SQL and joins — fully independent of the
    hashing.  At 100 TB the ``winnow=`` + ``max_window_df=`` knobs bound
    the exchanged table (winnowing keeps the >= window+m-1 shared-run
    detection guarantee; both property-tested subsets)."""
    return dedup.substring_dup_pairs(
        _docs(sf_dir, ["doc_id", "text"]), window=32
    )


SQL_SUBSTRING_DEDUP = (
    "WITH w AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 32) "
    "AS win FROM (SELECT doc_id, text, "
    "unnest(range(1, greatest(length(text) - 30, 1))) AS i FROM documents)) "
    "SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared "
    "FROM w a JOIN w b ON a.win = b.win AND a.doc_id < b.doc_id "
    "GROUP BY 1, 2"
)


def q_incremental_neardup(sf_dir: str):
    """Streaming-ingest dedup: docs with doc_id % 10 == 0 play the NEW
    BATCH, the rest the standing corpus.  The corpus's LSH band rows are
    persisted bucket-partitioned once (dedup.build_band_index); the batch
    is checked via a PRUNED read of only the bucket directories its own
    band hashes hit + one (band_id, band_hash) hash join + exact Jaccard
    verification.  The oracle computes TRUE all-(new x old)-pairs Jaccard
    in SQL — independent of banding, persistence and pruning; green means
    LSH recall is 1.0 on this corpus and every false candidate was
    filtered."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def _split(want_new: bool):
        def f(t: pa.Table) -> pa.Table:
            mod = pc.subtract(
                t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 10), 10)
            )
            keep = pc.equal(mod, 0) if want_new else pc.not_equal(mod, 0)
            return t.filter(keep)

        return docs.map_batches(f, batch_format="pyarrow")

    corpus = _split(False)
    batch = _split(True)
    band_dir = _tmp_index_dir(sf_dir, "bandidx")
    dedup.build_band_index(corpus, band_dir)
    return dedup.incremental_neardup_pairs(
        batch, band_dir, corpus, threshold=0.8
    )


SQL_INCREMENTAL_NEARDUP = (
    _SHINGLE_SQL + " "
    "SELECT id_new, id_old, jaccard FROM ("
    "SELECT n.doc_id AS id_new, o.doc_id AS id_old, "
    "round(len(list_intersect(n.s, o.s))::DOUBLE / "
    "len(list_distinct(n.s || o.s)), 6) AS jaccard "
    "FROM sh n JOIN sh o ON n.doc_id % 10 = 0 AND o.doc_id % 10 <> 0) "
    "WHERE jaccard >= 0.8"
)


def q_neardup_clusters(sf_dir: str):
    """Near-dup CLUSTER assignment: verified MinHash pairs -> distributed
    connected components (stages/dedup.connected_components — BSP
    min-label propagation, one hash join + one Min groupby per round,
    Sum-fixpoint convergence test).  Output (doc_id, cluster_id) with
    cluster_id = min doc_id in the component.  The DuckDB oracle walks
    the TRUE all-pairs Jaccard graph with a recursive CTE — independent
    of both the LSH candidates and the propagation code.  The cluster
    table is computed once per (data, version) and shared with
    dedup_keep_best / bm25_collapse_neardup (_neardup_clusters_cached);
    THIS entry always re-runs the distributed pipeline (force=True) —
    it is the r03 parallelism-crash regression proof."""
    return _neardup_clusters_cached(sf_dir, force=True)


SQL_NEARDUP_CLUSTERS = (
    "WITH RECURSIVE " + _SHINGLE_SQL[5:] + ", "
    "p AS (SELECT id_a, id_b FROM ("
    "SELECT c.id_a, c.id_b, "
    "round(len(list_intersect(a.s, b.s))::DOUBLE / "
    "len(list_distinct(a.s || b.s)), 6) AS jaccard "
    "FROM cand c JOIN sh a ON a.doc_id = c.id_a "
    "JOIN sh b ON b.doc_id = c.id_b) WHERE jaccard >= 0.8), "
    "edges AS (SELECT id_a AS src, id_b AS dst FROM p "
    "UNION ALL SELECT id_b, id_a FROM p), "
    "walk(node, label) AS ("
    "SELECT src, src FROM edges "
    "UNION "
    "SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node) "
    "SELECT node AS doc_id, min(label) AS cluster_id FROM walk "
    "GROUP BY node ORDER BY doc_id"
)


def q_dedup_keep_best(sf_dir: str):
    """Canonical-document selection (C4/RefinedWeb rule): the near-dup
    clusters composed with per-doc token counts — keep the LONGEST doc
    per cluster (ties by lowest doc_id).  Winner pick is one vectorized
    ``Max`` over a packed (n_tokens, -doc_id) int64 key; token counts
    and winners re-attach via broadcast searchsorted lookups (join
    route above the broadcast limit, like url_dedup).  Oracle fuses the
    recursive-CTE component walk with a first_value window over the
    token counts — independent of LSH, propagation and packing."""
    cl = ray.data.from_pandas(_neardup_clusters_cached(sf_dir))
    return dedup.neardup_keep_best(
        _docs(sf_dir, ["doc_id", "text"]), threshold=0.8, clusters=cl
    ).sort("doc_id")


SQL_DEDUP_KEEP_BEST = (
    "WITH RECURSIVE " + _SHINGLE_SQL[5:] + ", "
    "p AS (SELECT id_a, id_b FROM ("
    "SELECT c.id_a, c.id_b, "
    "round(len(list_intersect(a.s, b.s))::DOUBLE / "
    "len(list_distinct(a.s || b.s)), 6) AS jaccard "
    "FROM cand c JOIN sh a ON a.doc_id = c.id_a "
    "JOIN sh b ON b.doc_id = c.id_b) WHERE jaccard >= 0.8), "
    "edges AS (SELECT id_a AS src, id_b AS dst FROM p "
    "UNION ALL SELECT id_b, id_a FROM p), "
    "walk(node, label) AS ("
    "SELECT src, src FROM edges "
    "UNION "
    "SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node), "
    "cl AS (SELECT node AS doc_id, min(label) AS cluster_id FROM walk "
    "GROUP BY node), "
    "tok AS (SELECT doc_id, len(list_filter(string_split(text, ' '), "
    "x -> x <> '')) AS n FROM documents) "
    "SELECT doc_id, cluster_id, kept_doc_id, "
    "CAST(doc_id = kept_doc_id AS BIGINT) AS kept FROM ("
    "SELECT cl.doc_id, cl.cluster_id, "
    "first_value(cl.doc_id) OVER (PARTITION BY cl.cluster_id "
    "ORDER BY tok.n DESC, cl.doc_id) AS kept_doc_id "
    "FROM cl JOIN tok ON tok.doc_id = cl.doc_id) ORDER BY doc_id"
)


SQL_BM25_COLLAPSE_NEARDUP = (
    "WITH RECURSIVE " + _SHINGLE_SQL[5:] + ", "
    "p AS (SELECT id_a, id_b FROM ("
    "SELECT c.id_a, c.id_b, "
    "round(len(list_intersect(a.s, b.s))::DOUBLE / "
    "len(list_distinct(a.s || b.s)), 6) AS jaccard "
    "FROM cand c JOIN sh a ON a.doc_id = c.id_a "
    "JOIN sh b ON b.doc_id = c.id_b) WHERE jaccard >= 0.8), "
    "edges AS (SELECT id_a AS src, id_b AS dst FROM p "
    "UNION ALL SELECT id_b, id_a FROM p), "
    "walk(node, label) AS ("
    "SELECT src, src FROM edges "
    "UNION "
    "SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node), "
    "cl AS (SELECT node AS doc_id, min(label) AS cluster_id FROM walk "
    "GROUP BY node), "
    "toks AS (SELECT doc_id, unnest(ts) AS term FROM d), "
    "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
    "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
    "GROUP BY doc_id, term), "
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
    "rs AS (SELECT s.query_id, s.doc_id, "
    "'c' || CAST(coalesce(cl.cluster_id, s.doc_id) AS VARCHAR) AS source, "
    "round(s.score, 6) AS score FROM scored s "
    "LEFT JOIN cl ON cl.doc_id = s.doc_id), "
    "best AS (SELECT query_id, source, doc_id, score, "
    "row_number() OVER (PARTITION BY query_id, source ORDER BY "
    "score DESC, doc_id) AS rn FROM rs) "
    "SELECT query_id, rank, source, doc_id, score FROM ("
    "SELECT query_id, source, doc_id, score, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
    "score DESC, doc_id) AS INTEGER) AS rank FROM best WHERE rn = 1) "
    "WHERE rank <= 5"
)


def q_eval_contamination(sf_dir: str):
    """Benchmark-contamination audit (stages/contamination.py — the
    GPT-3/PaLM-style n-gram decontamination check): the deterministic
    "benchmark" is every document with ``doc_id % 97 == 0``; its
    distinct 5-token shingles are broadcast once and every training doc
    is probed with one vectorized ``is_in`` pass — zero shuffles, and
    membership is on shingle STRINGS so the SQL oracle reproduces it
    exactly.  Output: (doc_id, n_shingles, n_overlap, frac_overlap) for
    contaminated docs (the planted eval docs report 1.0; true near-dups
    of them report high fractions)."""
    from ...stages import contamination

    docs = _docs(sf_dir, ["doc_id", "text"])

    def ev_filter(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(b["doc_id"].to_numpy() % 97 == 0))

    ev = contamination.build_eval_shingles(
        docs.map_batches(ev_filter, batch_format="pyarrow")
    )
    return contamination.contamination_report(docs, ev).sort("doc_id")


SQL_EVAL_CONTAMINATION = (
    "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
    "x -> x <> '') AS ts FROM documents), "
    "shp AS (SELECT doc_id, CASE WHEN len(ts) = 0 THEN [] "
    "WHEN len(ts) < 5 THEN [array_to_string(ts, ' ')] "
    "ELSE list_transform(range(1, len(ts) - 3), "
    "i -> array_to_string(ts[i : i + 4], ' ')) END AS s FROM d), "
    "ev AS (SELECT DISTINCT unnest(s) AS g FROM shp WHERE doc_id % 97 = 0), "
    "pos AS (SELECT doc_id, unnest(s) AS g FROM shp), "
    "hits AS (SELECT p.doc_id, count(*) AS n_overlap FROM pos p "
    "JOIN ev ON ev.g = p.g GROUP BY p.doc_id), "
    "tot AS (SELECT doc_id, len(s) AS n_shingles FROM shp) "
    "SELECT t.doc_id, t.n_shingles, h.n_overlap, "
    "round(h.n_overlap::DOUBLE / t.n_shingles, 6) AS frac_overlap "
    "FROM tot t JOIN hits h ON h.doc_id = t.doc_id ORDER BY t.doc_id"
)


def q_ngram_jaccard_neardup(sf_dir: str):
    """Exact n-gram (3-token-shingle) Jaccard near-dup: permissive LSH
    candidates, then exact shingle-set verification (candidates-then-
    verify).  Oracle = TRUE all-pairs 3-shingle Jaccard in SQL — passes
    only when candidate recall is 1.0 (all true pairs on this corpus sit
    at j >= 0.90, where the 32x4 banding misses with p ~ 1e-15) and the
    verify stage kills every false positive."""
    return dedup.ngram_jaccard_pairs(
        _docs(sf_dir, ["doc_id", "text"]), shingle_k=3, threshold=0.5
    )


_SHINGLE3_SQL = (
    "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
    "x -> x <> '') AS ts FROM documents), "
    "sh AS (SELECT doc_id, CASE WHEN len(ts) = 0 THEN [] "
    "WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')] "
    "ELSE list_distinct(list_transform(range(1, len(ts) - 1), "
    "i -> array_to_string(ts[i : i + 2], ' '))) END AS s FROM d)"
)
# same lossless shared-shingle prune as _CAND_SQL (threshold 0.5 > 0)
_SHINGLE3_SQL = _SHINGLE3_SQL + _CAND_SQL

SQL_NGRAM_JACCARD_NEARDUP = (
    _SHINGLE3_SQL + " "
    "SELECT id_a, id_b, jaccard FROM ("
    "SELECT c.id_a, c.id_b, "
    "round(len(list_intersect(a.s, b.s))::DOUBLE / "
    "len(list_distinct(a.s || b.s)), 6) AS jaccard "
    "FROM cand c JOIN sh a ON a.doc_id = c.id_a "
    "JOIN sh b ON b.doc_id = c.id_b) WHERE jaccard >= 0.5"
)


def q_simhash_neardup(sf_dir: str):
    return dedup.simhash_neardup_pairs(_docs(sf_dir, ["doc_id", "text"]))


# ------------------------------------------- F5 url as-of dedup (standalone)

_URL_MOD = 150
_TS_BASE = 1_700_000_000_000_000  # micros


def _crawl_ds(sf_dir: str):
    """Synthetic multi-crawl table derived deterministically from
    ``documents`` (it has no url/ts columns — same derive trick as
    sentence_topn's re-rendered text): urls collide across doc_ids mod
    150, crawl timestamps collide within a url (so the digest tie-break
    is exercised), and the payload md5 is unique per row (so exactly one
    winner exists per url)."""

    def derive(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        url = pc.binary_join_element_wise(
            "https://site-",
            pc.cast(pa.array(did % _URL_MOD), pa.string()),
            ".example/page",
            "",
        )
        micros = _TS_BASE + ((did // _URL_MOD) % 2) * 3_600_000_000
        ts = pa.array(micros.astype(np.int64)).cast(pa.timestamp("us"))
        payload = pc.binary_join_element_wise(
            batch["text"], pc.cast(batch["doc_id"], pa.string()), ":"
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "url": url, "warc_ts": ts,
             "payload": payload}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        derive, batch_format="pyarrow"
    )


def q_url_dedup(sf_dir: str):
    """Standalone url as-of dedup (keep-latest crawl, md5 tie-break) over
    the derived crawl table — runs BOTH physical routes (broadcast
    semi-filter AND distributed hash join) and asserts they agree before
    returning, so the driver entry exercises route parity every run."""
    ds = _crawl_ds(sf_dir)
    outs = {}
    for route in ("broadcast", "join"):
        res = dedup.url_dedup_latest(
            ds, url_col="url", ts_col="warc_ts", tiebreak_col="payload",
            route=route,
        )
        pdf = res.select_columns(["url", "doc_id"]).to_pandas()
        outs[route] = pdf.sort_values(["url", "doc_id"]).reset_index(drop=True)
    if not outs["broadcast"].equals(outs["join"]):
        raise AssertionError("url_dedup broadcast and join routes disagree")
    return outs["join"]


SQL_URL_DEDUP = (
    "WITH crawl AS (SELECT doc_id, "
    f"'https://site-' || CAST(doc_id % {_URL_MOD} AS VARCHAR) || "
    "'.example/page' AS url, "
    f"{_TS_BASE} + ((doc_id // {_URL_MOD}) % 2) * 3600000000 AS ts_micros, "
    "md5(text || ':' || CAST(doc_id AS VARCHAR)) AS digest FROM documents) "
    "SELECT url, doc_id FROM ("
    "SELECT url, doc_id, row_number() OVER (PARTITION BY url "
    "ORDER BY ts_micros DESC, digest DESC) AS rn FROM crawl) WHERE rn = 1"
)


from ._nsacc import export as _ns_export

_ns_export(globals())
del _ns_export
