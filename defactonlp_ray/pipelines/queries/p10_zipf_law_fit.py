# Part 10/11 of the former single-module pipelines/queries.py
# (mechanical split, round 5 — VERDICT r04 next-round #6).  Parts share
# ONE late-bound namespace via _nsacc: globals are seeded from the
# accumulator before this body runs (preserving original top-level
# execution order) and the final merged namespace is injected back into
# every part by __init__, so call-time forward references behave exactly
# as in the single file.  Original lines 18671-21048.
from __future__ import annotations

from ._nsacc import NS as _ns_seed

globals().update(_ns_seed)
del _ns_seed



# ----------------------------------------------------- Zipf-law fit

def q_zipf_fit(sf_dir: str):
    """Zipf's-law exponent of the corpus term-frequency distribution —
    the sanity statistic run before LM-data decisions (a truncated or
    deduped crawl bends the tail).  Collection frequencies come from
    the usual combiner->groupby; the log-log least-squares runs over
    the |vocabulary|-row (rank, cf) series (vocabulary ~ sqrt-scale of
    the corpus, driver-safe), with ranks on (cf DESC, term) and the
    closed-form slope written identically in SQL."""
    cf = (
        _term_partials(sf_dir)
        .groupby("term")
        .aggregate(Sum("cf_p", alias_name="cf"))
        .to_pandas()
    )
    cf = cf.sort_values(["cf", "term"], ascending=[False, True], kind="mergesort")
    n = len(cf)
    x = np.log(np.arange(1, n + 1, dtype=np.float64))
    y = np.log(cf["cf"].to_numpy(dtype=np.float64))
    sx, sy = float(x.sum()), float(y.sum())
    sxx, sxy = float((x * x).sum()), float((x * y).sum())
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return pd.DataFrame({
        "n_terms": np.array([n], dtype=np.int64),
        "slope": [np.round(slope, 6)],
        "intercept": [np.round(intercept, 6)],
    })


SQL_ZIPF_FIT = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY term), "
    "r AS (SELECT ln(row_number() OVER (ORDER BY cf DESC, term)) AS x, "
    "ln(cf) AS y FROM cf), "
    "s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy, "
    "sum(x*x) AS sxx, sum(x*y) AS sxy FROM r) "
    "SELECT n AS n_terms, "
    "round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope, "
    "round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6) "
    "AS intercept FROM s"
)


def q_heaps_fit(sf_dir: str):
    """Heaps'-law fit V(N) = K * N^beta of vocabulary growth — the
    companion sanity statistic to ``zipf_fit`` (an over-deduped or
    template-heavy crawl flattens beta).  Growth is measured at 10
    pinned doc-id checkpoints cp_i = (max_doc_id * i) // 10.

    Scale shape: vocabulary NEVER lands on the driver — pass 1 reduces
    per-batch per-checkpoint token sums (10 rows/block); pass 2 is the
    (term -> min doc_id) combiner->groupby, whose |vocab|-row output is
    immediately re-combined into 10 first-occurrence-decile counts
    (searchsorted per batch, 10 rows/block) before a second tiny
    groupby.  The driver sees 20 rows + the closed-form OLS in log-log
    space, written identically in the SQL."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    mx = int(docs.max("doc_id"))
    cps = np.array([(mx * i) // 10 for i in range(1, 11)], dtype=np.int64)

    def tok_part(batch: pa.Table) -> pa.Table:
        _tf, doc_len = term_count_table(batch["text"], batch["doc_id"])
        did = batch["doc_id"].to_numpy()
        toks = [int(doc_len[did <= cp].sum()) for cp in cps]
        return pa.table({
            "i": pa.array(np.arange(1, 11, dtype=np.int64)),
            "tok_p": pa.array(toks, pa.int64()),
        })

    tok = (
        docs.map_batches(tok_part, batch_format="pyarrow")
        .groupby("i")
        .aggregate(Sum("tok_p", alias_name="n_tokens"))
        .to_pandas()
    )

    def fd_part(batch: pa.Table) -> pa.Table:
        tf, _ = term_count_table(batch["text"], batch["doc_id"])
        g = tf.group_by("term").aggregate([("doc_id", "min")])
        return g.rename_columns(["term", "fd_p"])

    def bucket_part(batch: pa.Table) -> pa.Table:
        fd = batch["fd"].to_numpy()
        b = np.searchsorted(cps, fd, side="left") + 1
        u, c = np.unique(b, return_counts=True)
        return pa.table({
            "i": pa.array(u.astype(np.int64)),
            "v_p": pa.array(c.astype(np.int64)),
        })

    vb = (
        docs.map_batches(fd_part, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Min("fd_p", alias_name="fd"))
        .map_batches(bucket_part, batch_format="pyarrow")
        .groupby("i")
        .aggregate(Sum("v_p", alias_name="v_new"))
        .to_pandas()
    )
    out = tok.merge(vb, on="i", how="left").sort_values("i").reset_index(
        drop=True
    )
    out["v_new"] = out["v_new"].fillna(0).astype(np.int64)
    out["vocab"] = out["v_new"].cumsum()
    x = np.log(out["n_tokens"].to_numpy(np.float64))
    y = np.log(out["vocab"].to_numpy(np.float64))
    n = len(out)
    sx, sy = float(x.sum()), float(y.sum())
    sxx, sxy = float((x * x).sum()), float((x * y).sum())
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    k_coef = math.exp((sy - beta * sx) / n)
    return pd.DataFrame({
        "checkpoint": out["i"].astype(np.int64),
        "cp_doc": cps,
        "n_tokens": out["n_tokens"].astype(np.int64),
        "vocab": out["vocab"].astype(np.int64),
        "beta": np.round(beta, 6),
        "k_coef": np.round(k_coef, 6),
    })


SQL_HEAPS_FIT = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "mx AS (SELECT max(doc_id) AS m FROM documents), "
    "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
    "firstd AS (SELECT term, min(doc_id) AS fd FROM toks GROUP BY term), "
    "cps AS (SELECT CAST(g.range AS BIGINT) AS i, (mx.m * g.range) // 10 "
    "AS cp FROM range(1, 11) g CROSS JOIN mx), "
    "chk AS (SELECT c.i, c.cp, "
    "(SELECT coalesce(sum(dl.dl), 0) FROM dl WHERE dl.doc_id <= c.cp) "
    "AS n_tokens, "
    "(SELECT count(*) FROM firstd WHERE firstd.fd <= c.cp) AS vocab "
    "FROM cps c), "
    "s AS (SELECT count(*) AS n, sum(ln(n_tokens)) AS sx, "
    "sum(ln(vocab)) AS sy, sum(ln(n_tokens)*ln(vocab)) AS sxy, "
    "sum(ln(n_tokens)*ln(n_tokens)) AS sxx FROM chk) "
    "SELECT chk.i AS checkpoint, chk.cp AS cp_doc, "
    "CAST(chk.n_tokens AS BIGINT) AS n_tokens, "
    "CAST(chk.vocab AS BIGINT) AS vocab, "
    "round((s.n*s.sxy - s.sx*s.sy) / (s.n*s.sxx - s.sx*s.sx), 6) AS beta, "
    "round(exp((s.sy - (s.n*s.sxy - s.sx*s.sy) / (s.n*s.sxx - s.sx*s.sx)"
    "*s.sx) / s.n), 6) AS k_coef "
    "FROM chk CROSS JOIN s ORDER BY checkpoint"
)


# --------------------------------------- storage-partitioned join

_BJ_NB = 8


def q_bucketed_join(sf_dir: str):
    """Storage-partitioned (bucketed) join — the shuffle-free join for
    repeatedly-joined tables: documents and the derived link-edge table
    are both written ONCE as hive ``bucket=`` layouts under the SAME
    hash rule (key % 8), so the join runs as 8 independent bucket tasks
    each reading exactly two co-located partitions — no exchange of
    either side, ever.  At 100 TB this is the difference between an
    all-to-all of the big side per join and a metadata-only plan; the
    bucketed write is resumable behind a _SUCCESS marker like every
    other persisted layout here.  Output: inbound link count per
    source."""
    import shutil as _shutil

    docs = _docs(sf_dir, ["doc_id", "source"])
    n = docs.count()
    root = _tmp_index_dir(sf_dir, "bjoin")
    done = os.path.join(root, "_SUCCESS")
    if not os.path.exists(done):
        tmp = root + ".tmp"
        _shutil.rmtree(tmp, ignore_errors=True)
        _shutil.rmtree(root, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)

        def tag_docs(b: pa.Table) -> pa.Table:
            d = b["doc_id"].to_numpy(zero_copy_only=False)
            return b.append_column("bucket", pa.array(d % _BJ_NB, pa.int64()))

        docs.map_batches(tag_docs, batch_format="pyarrow").write_parquet(
            os.path.join(tmp, "docs"), partition_cols=["bucket"]
        )

        def mk_edges(b: pa.Table) -> pa.Table:
            d = b["doc_id"].to_numpy(zero_copy_only=False)
            dsts = [(d * a + c) % n for a, c in _PR_COEFFS]
            dst = np.concatenate(dsts) if dsts else np.array([], np.int64)
            src = np.tile(d, len(_PR_COEFFS))
            return pa.table({
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "bucket": pa.array(dst % _BJ_NB, pa.int64()),
            })

        docs.select_columns(["doc_id"]).map_batches(
            mk_edges, batch_format="pyarrow"
        ).write_parquet(os.path.join(tmp, "edges"), partition_cols=["bucket"])
        os.replace(tmp, root)
        with open(done + ".tmp", "w") as f:
            f.write("ok")
        os.replace(done + ".tmp", done)

    def join_bucket(b: pa.Table) -> pa.Table:
        out = []
        for bk in b["bucket"].to_pylist():
            d = pq.read_table(
                os.path.join(root, "docs", f"bucket={bk}"),
                columns=["doc_id", "source"],
            )
            e = pq.read_table(
                os.path.join(root, "edges", f"bucket={bk}"), columns=["dst"]
            )
            cnt = e.group_by("dst").aggregate([([], "count_all")])
            j = cnt.join(d, keys="dst", right_keys="doc_id", join_type="inner")
            agg = j.group_by("source").aggregate([("count_all", "sum")])
            out.append(agg.rename_columns(["source", "nb_p"]))
        return pa.concat_tables(out)

    return (
        ray.data.from_items([{"bucket": i} for i in range(_BJ_NB)])
        .map_batches(join_bucket, batch_format="pyarrow", batch_size=1)
        .groupby("source")
        .aggregate(Sum("nb_p", alias_name="inbound"))
    )


def _sql_bucketed_join() -> str:
    nsel = "(SELECT count(*) FROM documents)"
    e_parts = " UNION ALL ".join(
        f"SELECT (doc_id*{a}+{c}) % {nsel} AS dst FROM documents"
        for a, c in _PR_COEFFS
    )
    return (
        f"WITH e0 AS ({e_parts}) "
        "SELECT d.source, count(*) AS inbound FROM e0 "
        "JOIN documents d ON d.doc_id = e0.dst GROUP BY 1"
    )


# ---------------------- distance_feature / pinned (ES query components)

_DF_PIVOT = 1000.0   # km
_DF_BOOST = 2.0


def q_bm25_distance_feature(sf_dir: str):
    """ES ``distance_feature`` query: BM25 relevance plus a geo
    proximity bonus ``boost * pivot / (pivot + dist)`` (dist = haversine
    km from the document's synthetic coordinate to the pinned origin),
    applied to MATCHING docs only.  The bonus is bounded by ``boost``,
    so block-max pruning stays sound with the bound folded into term
    upper bounds (the rank_feature saturation entry's rule); here the
    match set drains through the exact scorer and the bonus folds in
    before the rounded re-rank."""
    from ...functions import geo

    idx = _build_docs_index(sf_dir)
    res = search(
        idx, _query_terms_ds(_BM25_QUERIES), k=1 << 30, concurrency=2
    ).to_pandas()
    lat0, lon0 = _GEO_ORIGIN
    d = res["doc_id"].to_numpy()
    lat, lon = geo.synth_coords_e6(d)
    dist = geo.haversine_km(lat, lon, lat0, lon0)
    res["score"] = res["score"] + _DF_BOOST * _DF_PIVOT / (_DF_PIVOT + dist)
    return _rerank_rounded(res, k=10)


def _sql_bm25_distance_feature(queries: list[tuple[int, list[str]]]) -> str:
    from ...functions import geo

    lat0, lon0 = _GEO_ORIGIN
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
        f"geo AS (SELECT sc.query_id, sc.doc_id, sc.score + {_DF_BOOST} * "
        f"{_DF_PIVOT} / ({_DF_PIVOT} + {geo.sql_haversine_km(lat0, lon0)}) "
        "AS score FROM ("
        f"SELECT query_id, s.doc_id, score, {geo.SQL_LAT_E6} AS lat_e6, "
        f"{geo.SQL_LON_E6} AS lon_e6 FROM scored s) sc) "
        "SELECT query_id, rank, doc_id, score FROM ("
        "SELECT query_id, doc_id, round(score, 6) AS score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM geo) "
        "WHERE rank <= 10"
    )


_PINNED_IDS = [3, 7]


def q_bm25_pinned_topk(sf_dir: str):
    """ES ``pinned`` query: editorially promoted ids occupy the first
    ranks IN THE GIVEN ORDER regardless of relevance (display score 0 —
    the organic scorer never runs for them), organic BM25 hits follow
    with pinned ids excluded.  One ordinary bounded top-k pass plus a
    constant-size driver prepend."""
    idx = _build_docs_index(sf_dir)
    res = search(idx, _query_terms_ds(_BM25_QUERIES), k=20, concurrency=2).to_pandas()
    res = res[~res["doc_id"].isin(_PINNED_IDS)]
    organic = _rerank_rounded(res, k=10 - len(_PINNED_IDS))
    out = []
    for qid, _terms in _BM25_QUERIES:
        pin = pd.DataFrame({
            "query_id": np.full(len(_PINNED_IDS), qid, dtype=np.int64),
            "rank": np.arange(1, len(_PINNED_IDS) + 1, dtype=np.int32),
            "doc_id": np.array(_PINNED_IDS, dtype=np.int64),
            "score": np.zeros(len(_PINNED_IDS)),
        })
        g = organic[organic["query_id"] == qid].copy()
        g["rank"] = (g["rank"] + len(_PINNED_IDS)).astype(np.int32)
        out.extend([pin, g])
    return pd.concat(out, ignore_index=True)


def _sql_bm25_pinned_topk() -> str:
    base = _bm25_sql(_BM25_QUERIES, k=10 - len(_PINNED_IDS))
    ids = ", ".join(str(i) for i in _PINNED_IDS)
    pins = ", ".join(
        f"({qid}, {r + 1}, {d})"
        for qid, _t in _BM25_QUERIES
        for r, d in enumerate(_PINNED_IDS)
    )
    return (
        "WITH organic AS (SELECT query_id, rank, doc_id, score FROM ("
        + _bm25_sql(_BM25_QUERIES, k=1 << 30)
        + f") WHERE doc_id NOT IN ({ids})), "
        "org2 AS (SELECT query_id, CAST(row_number() OVER ("
        "PARTITION BY query_id ORDER BY rank) "
        f"+ {len(_PINNED_IDS)} AS INTEGER) AS rank, doc_id, score "
        f"FROM organic), "
        f"pins(query_id, rank, doc_id) AS (VALUES {pins}) "
        "SELECT CAST(query_id AS BIGINT) AS query_id, "
        "CAST(rank AS INTEGER) AS rank, "
        "CAST(doc_id AS BIGINT) AS doc_id, 0.0 AS score FROM pins "
        "UNION ALL SELECT query_id, rank, doc_id, score FROM org2 "
        f"WHERE rank <= 10"
    )


# ------------------------------- coreset selection / PCA (pinned oracles)

def q_kcenter_coreset(sf_dir: str):
    """Greedy k-center coreset over the embedding table (diversity-
    driven data selection, Gonzalez 1985): k streaming passes, each
    broadcasting the chosen centers and reducing one candidate row per
    block; selection argmax runs on fixed-point integer distances (the
    Lloyd quantization spec) so results are parallelism-invariant.
    Oracle: the committed whole-matrix serial sweep
    (pipelines/pinned.serial_kcenter)."""
    from ...stages.cluster import kcenter_greedy

    return kcenter_greedy(
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"]), k=12
    )


def q_pca_variance(sf_dir: str):
    """Distributed PCA spectrum over the embedding table: per-block
    INTEGER Gram partials under the 2^20 fixed-point spec (exact, so
    block boundaries cannot change the answer), arbitrary-precision
    driver reduce, one 64x64 eigvalsh.  Oracle: the committed serial
    whole-matrix Gram (pipelines/pinned.serial_pca) — integer matmul
    equality is exact, the eigen step is shared driver code."""
    from ...stages.cluster import pca_eigen, pca_gram

    n, sum_q, gram_q = pca_gram(
        read_table(sf_dir, "embeddings", ["embedding"])
    )
    return pca_eigen(n, sum_q, gram_q, n_top=8)


# --------------------------- round-4 closing batch 2 (post-mirror wave)

_Q10_LO = "1996-01-01"
_Q10_HI = "1996-04-01"


def q_tpch_q10(sf_dir: str):
    """TPC-H Q10 (returned-item reporting), adapted to the driver's
    column subset: revenue lost to returned items per customer over one
    quarter, top 20 customers with their account/nation attributes.

    Scale design: revenue reduces per ``o_custkey`` BEFORE any dimension
    attach (per-batch Arrow combiner -> one Sum groupby over |customers
    with returns| rows), the top-20 cut runs on the reduced table
    (distributed sort + limit), and ``c_name``/``c_acctbal``/``n_name``
    attach to the 20 WINNERS ONLY via a streamed ``is_in``-filtered pass
    over customer — the classic "aggregate, cut, then decorate" shape
    that never ships dimension columns through the fact shuffle."""
    lo = np.datetime64(_Q10_LO, "us")
    hi = np.datetime64(_Q10_HI, "us")
    n_cpu = int(ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(8, n_cpu // 2))

    orders = read_table(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(
                    b["o_orderdate"], pa.scalar(lo, pa.timestamp("us"))
                ),
                pc.less(b["o_orderdate"], pa.scalar(hi, pa.timestamp("us"))),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )

    def line_rev(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b["l_returnflag"], "R"))
        rev = pc.multiply(
            f["l_extendedprice"], pc.subtract(pa.scalar(1.0), f["l_discount"])
        )
        return pa.table({"l_orderkey": f["l_orderkey"], "rev": rev})

    line = read_table(
        sf_dir, "lineitem",
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(line_rev, batch_format="pyarrow")

    orders = orders.repartition(nparts)
    line = line.repartition(nparts)
    joined = orders.join(
        line, "inner", num_partitions=nparts,
        on=("o_orderkey",), right_on=("l_orderkey",),
    )

    def cust_part(b: pa.Table) -> pa.Table:
        agg = b.select(["o_custkey", "rev"]).group_by("o_custkey").aggregate(
            [("rev", "sum")]
        )
        return agg.rename_columns(["o_custkey", "rev_p"])

    top = (
        joined.map_batches(cust_part, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("rev_p", alias_name="rev"))
        .map_batches(
            lambda b: pa.table(
                {
                    "o_custkey": b["o_custkey"],
                    "revenue": pc.round(b["rev"], 2),
                }
            ),
            batch_format="pyarrow",
        )
        .sort(["revenue", "o_custkey"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    wanted = pa.array(top["o_custkey"].tolist(), pa.int64())
    cust = (
        read_table(
            sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
        )
        .map_batches(
            lambda b: b.filter(pc.is_in(b["c_custkey"], value_set=wanted)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    nation = read_table(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )
    out = out.sort_values(
        ["revenue", "o_custkey"], ascending=[False, True]
    ).reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int32)
    return out[["rank", "c_custkey", "c_name", "c_acctbal", "n_name", "revenue"]]


SQL_TPCH_Q10 = (
    "WITH r AS (SELECT o_custkey, "
    "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "WHERE l_returnflag = 'R' "
    f"AND o_orderdate >= TIMESTAMP '{_Q10_LO}' "
    f"AND o_orderdate < TIMESTAMP '{_Q10_HI}' GROUP BY 1), "
    "t AS (SELECT o_custkey, revenue, CAST(row_number() OVER ("
    "ORDER BY revenue DESC, o_custkey) AS INTEGER) AS rank FROM r) "
    "SELECT t.rank, c_custkey, c_name, c_acctbal, n_name, revenue "
    "FROM t JOIN customer ON c_custkey = o_custkey "
    "JOIN nation ON n_nationkey = c_nationkey WHERE t.rank <= 20"
)


_Q14_LO = "1996-03-01"
_Q14_HI = "1996-04-01"


def q_tpch_q14(sf_dir: str):
    """TPC-H Q14 (promotion effect): percent of one month's revenue from
    PROMO-type parts.  Scale design: the month's lineitems reduce per
    ``l_partkey`` FIRST (per-batch combiner -> Sum groupby), so the
    part-dimension join input is |distinct parts shipped that month|
    rows, not |lineitems| — the join then classifies each reduced row by
    the ``p_type LIKE 'PROMO%'`` flag and one scalar aggregate finishes."""
    lo = np.datetime64(_Q14_LO, "us")
    hi = np.datetime64(_Q14_HI, "us")
    n_cpu = int(ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(8, n_cpu // 2))

    def reduce_part(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"]
        f = b.filter(
            pc.and_(
                pc.greater_equal(ship, pa.scalar(lo, pa.timestamp("us"))),
                pc.less(ship, pa.scalar(hi, pa.timestamp("us"))),
            )
        )
        rev = pc.multiply(
            f["l_extendedprice"], pc.subtract(pa.scalar(1.0), f["l_discount"])
        )
        t = pa.table({"l_partkey": f["l_partkey"], "rev": rev})
        agg = t.group_by("l_partkey").aggregate(
            [("rev", "sum"), ([], "count_all")]
        )
        return agg.rename_columns(["l_partkey", "rev_p", "n_p"])

    reduced = (
        read_table(
            sf_dir, "lineitem",
            ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        .map_batches(reduce_part, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("rev_p", alias_name="rev"), Sum("n_p", alias_name="nl"))
    )
    flags = read_table(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda b: pa.table(
            {
                "p_partkey": b["p_partkey"],
                "promo": pc.cast(
                    pc.starts_with(b["p_type"], "PROMO"), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    reduced = reduced.repartition(nparts)
    flags = flags.repartition(nparts)
    j = reduced.join(
        flags, "inner", num_partitions=nparts,
        on=("l_partkey",), right_on=("p_partkey",),
    )

    def fin_part(b: pa.Table) -> pa.Table:
        rev = b["rev"].to_numpy(zero_copy_only=False)
        promo = b["promo"].to_numpy(zero_copy_only=False)
        nl = b["nl"].to_numpy(zero_copy_only=False)
        return pa.table({
            "promo_p": pa.array([float(np.sum(rev * promo))], pa.float64()),
            "tot_p": pa.array([float(np.sum(rev))], pa.float64()),
            "n_p": pa.array([int(np.sum(nl))], pa.int64()),
        })

    agg = j.map_batches(fin_part, batch_format="pyarrow").aggregate(
        Sum("promo_p", alias_name="pr"),
        Sum("tot_p", alias_name="tr"),
        Sum("n_p", alias_name="n"),
    )
    return pd.DataFrame({
        "promo_pct": [np.round(100.0 * float(agg["pr"]) / float(agg["tr"]), 4)],
        "n": np.array([int(agg["n"])], dtype=np.int64),
    })


SQL_TPCH_Q14 = (
    "SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%' "
    "THEN l_extendedprice * (1 - l_discount) ELSE 0 END) / "
    "sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct, "
    "count(*) AS n FROM lineitem JOIN part ON l_partkey = p_partkey "
    f"WHERE l_shipdate >= TIMESTAMP '{_Q14_LO}' "
    f"AND l_shipdate < TIMESTAMP '{_Q14_HI}'"
)


# (query_id, full terms, still-being-typed prefix) — ES match_bool_prefix
_BOOL_PREFIX_QUERIES: list[tuple[int, list[str], str]] = [
    (0, ["data", "query"], "s"),
    (1, ["merge"], "c"),
    (2, ["hash", "join"], "w"),
    (3, ["filter"], "v"),
    (4, ["slow", "scan"], "zz"),   # no expansion -> plain BM25 ranking
]
_BOOL_PREFIX_CAP = 50  # ES default max_expansions


def q_match_bool_prefix(sf_dir: str):
    """Elasticsearch ``match_bool_prefix`` (stages/expand.py +
    search.score_all_bool_prefix): the full terms score as BM25 should
    clauses; the trailing prefix expands against the streamed dictionary
    under the ``(df DESC, term)`` rewrite cap and contributes
    CONSTANT_SCORE 1.0 once per matching doc — folded in BEFORE the
    bounded top-k (a prefix-only doc can outrank a weak BM25 match)."""
    from ...stages.expand import bool_prefix_search

    idx = _build_docs_index(sf_dir)
    res = bool_prefix_search(
        idx, _BOOL_PREFIX_QUERIES, k=20,
        max_expansions=_BOOL_PREFIX_CAP, concurrency=2,
    ).to_pandas()
    return _rerank_rounded(res, k=10)


def _sql_match_bool_prefix(
    queries: list[tuple[int, list[str], str]], k: int = 10,
    cap: int = _BOOL_PREFIX_CAP,
) -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms, _ in queries for t in terms
    )
    pvals = ", ".join(f"({qid}, '{pre}')" for qid, _, pre in queries)
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
        "GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        f"p(query_id, prefix) AS (VALUES {pvals}), "
        "exp AS (SELECT query_id, term FROM ("
        "SELECT p.query_id, df.term, row_number() OVER ("
        "PARTITION BY p.query_id ORDER BY df.df DESC, df.term) AS rn "
        "FROM p JOIN df ON df.term LIKE p.prefix || '%') "
        f"WHERE rn <= {cap}), "
        "bm AS (SELECT q.query_id, tf.doc_id, "
        "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
        "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
        ") AS score FROM q JOIN tf ON q.term = tf.term "
        "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id), "
        "bon AS (SELECT exp.query_id, tf.doc_id, 1.0 AS bonus "
        "FROM exp JOIN tf ON tf.term = exp.term "
        "GROUP BY exp.query_id, tf.doc_id), "
        "u AS (SELECT coalesce(bm.query_id, bon.query_id) AS query_id, "
        "coalesce(bm.doc_id, bon.doc_id) AS doc_id, "
        "coalesce(bm.score, 0) + coalesce(bon.bonus, 0) AS score "
        "FROM bm FULL OUTER JOIN bon "
        "ON bm.query_id = bon.query_id AND bm.doc_id = bon.doc_id) "
        "SELECT query_id, rank, doc_id, score FROM ("
        "SELECT query_id, doc_id, round(score, 6) AS score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM u) "
        f"WHERE rank <= {k}"
    )


def q_events_rank_lag(sf_dir: str):
    """SQL window functions (``lag`` + ``row_number`` per partition) as
    a distributed groupby: each user's event stream orders by
    ``(ts, event_id)``, every non-first event yields its value delta vs
    the previous event and its 1-based position; per-user partials
    reduce BY EVENT TYPE inside ``map_groups`` (one tiny table per user
    leaves the group), then one |event_types|-row Sum groupby merges
    users — user cardinality scales out, nothing driver-sized."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        if len(g) < 2:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=str),
                "n_p": pd.Series([], dtype=np.int64),
                "sgap_p": pd.Series([], dtype=np.float64),
                "srn_p": pd.Series([], dtype=np.int64),
            })
        v = g["value"].to_numpy(np.float64)
        d = pd.DataFrame({
            "event_type": g["event_type"].to_numpy()[1:],
            "gap": v[1:] - v[:-1],
            "rn": np.arange(2, len(g) + 1, dtype=np.int64),
        })
        p = d.groupby("event_type", as_index=False).agg(
            n_p=("gap", "size"), sgap_p=("gap", "sum"), srn_p=("rn", "sum")
        )
        p["n_p"] = p["n_p"].astype(np.int64)
        return p

    out = (
        read_table(
            sf_dir, "events",
            ["event_id", "ts", "user_id", "event_type", "value"],
        )
        .groupby("user_id")
        .map_groups(pairs)
        .groupby("event_type")
        .aggregate(
            Sum("n_p", alias_name="n_pairs"),
            Sum("sgap_p", alias_name="sg"),
            Sum("srn_p", alias_name="sr"),
        )
        .to_pandas()
    )
    n = out["n_pairs"].to_numpy(np.float64)
    out["avg_gap"] = np.round(out["sg"].to_numpy(np.float64) / n, 6)
    out["avg_rank"] = np.round(out["sr"].to_numpy(np.float64) / n, 6)
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out[["event_type", "n_pairs", "avg_gap", "avg_rank"]]


SQL_EVENTS_RANK_LAG = (
    "WITH w AS (SELECT event_type, "
    "value - lag(value) OVER win AS gap, "
    "row_number() OVER win AS rn FROM events "
    "WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)) "
    "SELECT event_type, count(*) AS n_pairs, "
    "round(sum(gap) / count(*), 6) AS avg_gap, "
    "round(sum(rn)::DOUBLE / count(*), 6) AS avg_rank "
    "FROM w WHERE gap IS NOT NULL GROUP BY 1"
)


def q_events_cum_users(sf_dir: str):
    """ES ``cumulative_cardinality`` pipeline aggregation, EXACT: per
    day, the running count of distinct users ever seen.  The classic
    trick makes it one bounded exchange instead of per-day HLL unions:
    cumulative distinct(users) at day D == count of users whose FIRST
    event day <= D, so the corpus pass is a per-batch (user, min day)
    combiner -> one Min groupby over |users| rows -> a |days|-row count
    table whose running sum computes driver-side."""
    from ray.data.aggregate import Min

    def part(batch: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.cast(pc.floor_temporal(batch["ts"], unit="day"),
                    pa.timestamp("us")),
            pa.int64(),
        )
        t = pa.table({"user_id": batch["user_id"], "day_us": day})
        agg = t.group_by("user_id").aggregate([("day_us", "min")])
        return agg.rename_columns(["user_id", "day_p"])

    first = (
        read_table(sf_dir, "events", ["ts", "user_id"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("day_p", alias_name="first_day"))
    )

    def day_part(b: pa.Table) -> pa.Table:
        agg = b.select(["first_day"]).group_by("first_day").aggregate(
            [([], "count_all")]
        )
        return agg.rename_columns(["first_day", "nu_p"])

    daily = (
        first.map_batches(day_part, batch_format="pyarrow")
        .groupby("first_day")
        .aggregate(Sum("nu_p", alias_name="new_users"))
        .to_pandas()
        .sort_values("first_day")
        .reset_index(drop=True)
    )
    daily["window_start"] = pd.to_datetime(daily["first_day"], unit="us")
    daily["cum_users"] = daily["new_users"].cumsum().astype(np.int64)
    daily["new_users"] = daily["new_users"].astype(np.int64)
    return daily[["window_start", "new_users", "cum_users"]]


SQL_EVENTS_CUM_USERS = (
    "WITH f AS (SELECT user_id, min(date_trunc('day', ts)) AS d "
    "FROM events GROUP BY 1), "
    "c AS (SELECT d, count(*) AS new_users FROM f GROUP BY 1) "
    "SELECT d AS window_start, new_users, "
    "CAST(sum(new_users) OVER (ORDER BY d) AS BIGINT) AS cum_users FROM c"
)


def q_events_normalize(sf_dir: str):
    """ES ``normalize`` pipeline aggregation (both built-in methods) over
    a terms parent: per event type, its count, ``percent_of_sum`` and
    ``rescale_0_1`` — the per-batch combiner reduces the corpus pass to
    one row per (type, batch); normalization runs on the |types|-row
    result (pipeline aggs are driver-small by construction)."""

    def part(batch: pa.Table) -> pa.Table:
        agg = batch.select(["event_type"]).group_by("event_type").aggregate(
            [([], "count_all")]
        )
        return agg.rename_columns(["event_type", "n_p"])

    out = (
        read_table(sf_dir, "events", ["event_type"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_p", alias_name="n"))
        .to_pandas()
    )
    n = out["n"].to_numpy(np.float64)
    out["pct"] = np.round(100.0 * n / n.sum(), 6)
    span = n.max() - n.min()
    out["rescaled"] = (
        np.zeros(len(out)) if span == 0
        else np.round((n - n.min()) / span, 6)
    )
    out["n"] = out["n"].astype(np.int64)
    return out[["event_type", "n", "pct", "rescaled"]]


SQL_EVENTS_NORMALIZE = (
    "WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1) "
    "SELECT event_type, n, round(100.0 * n / sum(n) OVER (), 6) AS pct, "
    "CASE WHEN max(n) OVER () = min(n) OVER () THEN 0.0 ELSE "
    "round((n - min(n) OVER ())::DOUBLE / "
    "(max(n) OVER () - min(n) OVER ()), 6) END AS rescaled FROM c"
)


def q_events_stats_bucket(sf_dir: str):
    """ES ``stats_bucket`` + ``max_bucket`` sibling aggregations over a
    date-histogram parent: one row of bucket-level stats (count, min,
    max, exact avg, sum) plus the earliest day achieving the max (the
    ``max_bucket`` keys rule, ties -> first key).  The corpus pass is
    the daily-count combiner; the sibling agg runs over |days| rows."""

    def part(batch: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(batch["ts"], unit="day"), pa.timestamp("us")
        )
        t = pa.table({"window_start": day})
        agg = t.group_by("window_start").aggregate([([], "count_all")])
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
    n = daily["n"].to_numpy(np.int64)
    mx = int(n.max())
    max_day = daily["window_start"][daily["n"] == mx].min()
    return pd.DataFrame({
        "n_buckets": np.array([len(daily)], np.int64),
        "min_n": np.array([int(n.min())], np.int64),
        "max_n": np.array([mx], np.int64),
        "avg_n": [np.round(float(n.sum()) / len(daily), 6)],
        "sum_n": np.array([int(n.sum())], np.int64),
        "max_day": [max_day],
    })


SQL_EVENTS_STATS_BUCKET = (
    "WITH c AS (SELECT date_trunc('day', ts) AS d, count(*) AS n "
    "FROM events GROUP BY 1) "
    "SELECT count(*) AS n_buckets, min(n) AS min_n, max(n) AS max_n, "
    "round(sum(n)::DOUBLE / count(*), 6) AS avg_n, "
    "CAST(sum(n) AS BIGINT) AS sum_n, "
    "(SELECT min(d) FROM c WHERE n = (SELECT max(n) FROM c)) AS max_day "
    "FROM c"
)


def q_events_scripted_metric(sf_dir: str):
    """ES ``scripted_metric`` aggregation — the map/combine/reduce
    contract as one Ray pass: the map+combine script is the per-batch
    Arrow combiner emitting ``(n, sum, sum_sq)`` per event type, the
    reduce script is the Sum groupby + the driver-side variance formula
    ``s2/n - (s/n)^2`` (single-pass population variance, the textbook
    scripted-metric example).  Variance rounds to 3 decimals: the
    one-pass formula subtracts near-equal O(sum_sq) terms, so cross-
    engine float reassociation noise (~1e-7 absolute at sf0.1) must stay
    below the rounding quantum."""

    def part(batch: pa.Table) -> pa.Table:
        v = batch["value"]
        t = pa.table({
            "event_type": batch["event_type"],
            "v": v,
            "v2": pc.multiply(v, v),
        })
        agg = t.group_by("event_type").aggregate(
            [([], "count_all"), ("v", "sum"), ("v2", "sum")]
        )
        return agg.rename_columns(["event_type", "n_p", "s_p", "s2_p"])

    out = (
        read_table(sf_dir, "events", ["event_type", "value"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_p", alias_name="n"),
            Sum("s_p", alias_name="s"),
            Sum("s2_p", alias_name="s2"),
        )
        .to_pandas()
    )
    n = out["n"].to_numpy(np.float64)
    s = out["s"].to_numpy(np.float64)
    s2 = out["s2"].to_numpy(np.float64)
    out["sum_value"] = np.round(s, 2)
    out["var_value"] = np.round(s2 / n - (s / n) * (s / n), 3)
    out["n"] = out["n"].astype(np.int64)
    return out[["event_type", "n", "sum_value", "var_value"]]


SQL_EVENTS_SCRIPTED_METRIC = (
    "WITH c AS (SELECT event_type, count(*) AS n, sum(value) AS s, "
    "sum(value * value) AS s2 FROM events GROUP BY 1) "
    "SELECT event_type, n, round(s, 2) AS sum_value, "
    "round(s2 / n - (s / n) * (s / n), 3) AS var_value FROM c"
)


def q_tpch_q13(sf_dir: str):
    """TPC-H Q13 (customer order-count distribution): how many customers
    placed exactly N orders, INCLUDING the zero-order customers (the
    left-outer part that makes this query interesting).  Scale design:
    orders reduce per custkey first (combiner -> Sum groupby over
    |active customers| rows), then one ``left_outer`` hash join against
    the customer key column fills in the zeros, then a tiny second
    groupby over |distinct counts| rows."""
    n_cpu = int(ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(8, n_cpu // 2))

    def ord_part(b: pa.Table) -> pa.Table:
        agg = b.select(["o_custkey"]).group_by("o_custkey").aggregate(
            [([], "count_all")]
        )
        return agg.rename_columns(["o_custkey", "n_p"])

    ocnt = (
        read_table(sf_dir, "orders", ["o_custkey"])
        .map_batches(ord_part, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("n_p", alias_name="n_orders"))
    )
    cust = read_table(sf_dir, "customer", ["c_custkey"])
    ocnt = ocnt.repartition(nparts)
    cust = cust.repartition(nparts)
    j = cust.join(
        ocnt, "left_outer", num_partitions=nparts,
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def dist_part(b: pa.Table) -> pa.Table:
        c = pc.coalesce(b["n_orders"], pa.scalar(0, pa.int64()))
        t = pa.table({"c_count": pc.cast(c, pa.int64())})
        agg = t.group_by("c_count").aggregate([([], "count_all")])
        return agg.rename_columns(["c_count", "cd_p"])

    return (
        j.map_batches(dist_part, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("cd_p", alias_name="custdist"))
        .sort(["custdist", "c_count"], descending=[True, True])
    )


SQL_TPCH_Q13 = (
    "WITH o AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1), "
    "c AS (SELECT c_custkey, coalesce(n, 0) AS c_count "
    "FROM customer LEFT JOIN o ON o_custkey = c_custkey) "
    "SELECT c_count, count(*) AS custdist FROM c GROUP BY 1"
)


_Q15_LO = "1996-01-01"
_Q15_HI = "1996-04-01"


def q_tpch_q15(sf_dir: str):
    """TPC-H Q15 (top supplier): the supplier(s) whose quarter revenue
    equals the maximum.  Scale design: revenue reduces per suppkey
    (combiner -> Sum groupby), the max is one scalar aggregate over the
    reduced table, the equality filter streams the reduced table again,
    and ``s_name`` attaches to the winner(s) only — ties all returned
    (the view-based original's semantics, on round(.,2) revenue like
    every cross-engine float sum)."""
    lo = np.datetime64(_Q15_LO, "us")
    hi = np.datetime64(_Q15_HI, "us")
    from ray.data.aggregate import Max

    def rev_part(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"]
        f = b.filter(
            pc.and_(
                pc.greater_equal(ship, pa.scalar(lo, pa.timestamp("us"))),
                pc.less(ship, pa.scalar(hi, pa.timestamp("us"))),
            )
        )
        rev = pc.multiply(
            f["l_extendedprice"], pc.subtract(pa.scalar(1.0), f["l_discount"])
        )
        t = pa.table({"l_suppkey": f["l_suppkey"], "rev": rev})
        agg = t.group_by("l_suppkey").aggregate([("rev", "sum")])
        return agg.rename_columns(["l_suppkey", "rev_p"])

    reduced = (
        read_table(
            sf_dir, "lineitem",
            ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        .map_batches(rev_part, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("rev_p", alias_name="rev"))
        .map_batches(
            lambda b: pa.table(
                {
                    "l_suppkey": b["l_suppkey"],
                    "total_rev": pc.round(b["rev"], 2),
                }
            ),
            batch_format="pyarrow",
        )
    )
    mx = float(reduced.aggregate(Max("total_rev", alias_name="m"))["m"])
    winners = reduced.map_batches(
        lambda b: b.filter(pc.equal(b["total_rev"], mx)),
        batch_format="pyarrow",
    ).to_pandas()
    wanted = pa.array(winners["l_suppkey"].tolist(), pa.int64())
    supp = (
        read_table(sf_dir, "supplier", ["s_suppkey", "s_name"])
        .map_batches(
            lambda b: b.filter(pc.is_in(b["s_suppkey"], value_set=wanted)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    out = winners.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    out = out.sort_values("s_suppkey").reset_index(drop=True)
    return out[["s_suppkey", "s_name", "total_rev"]]


SQL_TPCH_Q15 = (
    "WITH r AS (SELECT l_suppkey, "
    "round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev "
    "FROM lineitem "
    f"WHERE l_shipdate >= TIMESTAMP '{_Q15_LO}' "
    f"AND l_shipdate < TIMESTAMP '{_Q15_HI}' GROUP BY 1) "
    "SELECT s_suppkey, s_name, total_rev FROM r "
    "JOIN supplier ON s_suppkey = l_suppkey "
    "WHERE total_rev = (SELECT max(total_rev) FROM r)"
)


_Q17_BRAND = "Brand#23"


def q_tpch_q17(sf_dir: str):
    """TPC-H Q17 (small-quantity-order revenue), adapted to the driver's
    column subset (no ``p_container``; the brand predicate alone picks
    the part subset): revenue lost to orders below 20% of a part's
    average order quantity, scaled to a yearly figure.

    Scale design: the brand's partkeys semi-join the fact table (hash
    join, no broadcast), per-part (sum qty, n) reduces via the combiner,
    and the threshold re-attaches with a second hash join — the
    classic correlated-subquery decorrelation.  The ``0.2 * avg``
    threshold is EXACT cross-engine: quantities are integer-valued, so
    the per-part float sum is order-independent (every partial stays
    under 2^53) and ``sum/n`` is bit-identical in both engines."""
    n_cpu = int(ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(8, n_cpu // 2))

    bp = read_table(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        lambda b: b.filter(pc.equal(b["p_brand"], _Q17_BRAND)).select(
            ["p_partkey"]
        ),
        batch_format="pyarrow",
    )
    line = read_table(
        sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]
    )
    line = line.repartition(nparts)
    bp = bp.repartition(nparts)
    j = line.join(
        bp, "inner", num_partitions=nparts,
        on=("l_partkey",), right_on=("p_partkey",),
    )

    def stat_part(b: pa.Table) -> pa.Table:
        t = b.select(["l_partkey", "l_quantity"])
        agg = t.group_by("l_partkey").aggregate(
            [("l_quantity", "sum"), ([], "count_all")]
        )
        return agg.rename_columns(["pk", "sq_p", "n_p"])

    stats = (
        j.map_batches(stat_part, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(Sum("sq_p", alias_name="sq"), Sum("n_p", alias_name="nq"))
        .map_batches(
            lambda b: pa.table(
                {
                    "pk": b["pk"],
                    "thresh": pc.multiply(
                        pa.scalar(0.2),
                        pc.divide(
                            pc.cast(b["sq"], pa.float64()),
                            pc.cast(b["nq"], pa.float64()),
                        ),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )
    j2 = j.join(
        stats, "inner", num_partitions=nparts,
        on=("l_partkey",), right_on=("pk",),
    )

    def fin_part(b: pa.Table) -> pa.Table:
        f = b.filter(pc.less(b["l_quantity"], b["thresh"]))
        s = pc.sum(f["l_extendedprice"])
        return pa.table({
            "s_p": pa.array([s.as_py() or 0.0], pa.float64()),
            "n_p": pa.array([f.num_rows], pa.int64()),
        })

    agg = j2.map_batches(fin_part, batch_format="pyarrow").aggregate(
        Sum("s_p", alias_name="s"), Sum("n_p", alias_name="n")
    )
    return pd.DataFrame({
        "avg_yearly": [np.round(float(agg["s"]) / 7.0, 2)],
        "n": np.array([int(agg["n"])], dtype=np.int64),
    })


SQL_TPCH_Q17 = (
    "WITH bp AS (SELECT p_partkey FROM part "
    f"WHERE p_brand = '{_Q17_BRAND}'), "
    "l AS (SELECT l_partkey, l_quantity, l_extendedprice "
    "FROM lineitem JOIN bp ON p_partkey = l_partkey), "
    "s AS (SELECT l_partkey AS pk, "
    "0.2 * (sum(l_quantity) / count(*)) AS thresh FROM l GROUP BY 1) "
    "SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly, "
    "count(*) AS n FROM l JOIN s ON l.l_partkey = s.pk "
    "WHERE l_quantity < thresh"
)


_Q18_QTY = 250.0


def q_tpch_q18(sf_dir: str):
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds the threshold, top 100 by (o_totalprice DESC, o_orderdate,
    o_orderkey), with the customer name attached to the winners only.

    Scale design: quantity reduces per orderkey (combiner -> Sum
    groupby), the HAVING filter streams the reduced table, one hash join
    attaches the order attributes, the top-100 cut is a distributed
    sort + limit, and c_name decorates the 100 winners via a filtered
    pass — no float policy needed anywhere (quantities are
    integer-valued and o_totalprice is compared raw)."""
    n_cpu = int(ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(8, n_cpu // 2))

    def qty_part(b: pa.Table) -> pa.Table:
        agg = b.select(["l_orderkey", "l_quantity"]).group_by(
            "l_orderkey"
        ).aggregate([("l_quantity", "sum")])
        return agg.rename_columns(["l_orderkey", "q_p"])

    big = (
        read_table(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .map_batches(qty_part, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("q_p", alias_name="sum_qty"))
        .map_batches(
            lambda b: b.filter(pc.greater(b["sum_qty"], _Q18_QTY)),
            batch_format="pyarrow",
        )
    )
    orders = read_table(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    big = big.repartition(nparts)
    orders = orders.repartition(nparts)
    top = (
        orders.join(
            big, "inner", num_partitions=nparts,
            on=("o_orderkey",), right_on=("l_orderkey",),
        )
        .sort(
            ["o_totalprice", "o_orderdate", "o_orderkey"],
            descending=[True, False, False],
        )
        .limit(100)
        .to_pandas()
    )
    wanted = pa.array(sorted(set(top["o_custkey"].tolist())), pa.int64())
    cust = (
        read_table(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(
            lambda b: b.filter(pc.is_in(b["c_custkey"], value_set=wanted)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey")
    out = out.sort_values(
        ["o_totalprice", "o_orderdate", "o_orderkey"],
        ascending=[False, True, True],
    ).reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int32)
    return out[
        ["rank", "c_name", "c_custkey", "o_orderkey", "o_orderdate",
         "o_totalprice", "sum_qty"]
    ]


SQL_TPCH_Q18 = (
    "WITH q AS (SELECT l_orderkey, sum(l_quantity) AS sum_qty "
    f"FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > {_Q18_QTY}), "
    "t AS (SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice, "
    "sum_qty, CAST(row_number() OVER (ORDER BY o_totalprice DESC, "
    "o_orderdate, o_orderkey) AS INTEGER) AS rank "
    "FROM orders JOIN q ON o_orderkey = l_orderkey) "
    "SELECT rank, c_name, c_custkey, o_orderkey, o_orderdate, "
    "o_totalprice, sum_qty FROM t JOIN customer ON c_custkey = o_custkey "
    "WHERE rank <= 100"
)


# (brand, size lo-hi, quantity lo-hi) — the three Q19 OR groups, adapted
# to the driver's column subset (no p_container / shipmode predicates)
_Q19_GROUPS: list[tuple[str, int, int, float, float]] = [
    ("Brand#12", 1, 5, 1.0, 11.0),
    ("Brand#23", 1, 10, 10.0, 20.0),
    ("Brand#34", 1, 15, 20.0, 30.0),
]


def q_tpch_q19(sf_dir: str):
    """TPC-H Q19 (discounted revenue, OR-of-predicate-groups), adapted
    to the driver's column subset.  The predicate couples a lineitem
    column (quantity) with part columns (brand, size), so a plain
    per-partkey reduce would lose the quantity — instead the combiner
    reduces per (partkey, quantity): quantities take ~50 distinct
    integer values, so the exchange is bounded by 50 x |parts seen|
    rows, never |lineitems|.  One hash join attaches (brand, size), the
    OR mask evaluates vectorized over the REDUCED table, and a scalar
    aggregate finishes."""
    n_cpu = int(ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(8, n_cpu // 2))

    def reduce_pq(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        t = pa.table({
            "l_partkey": b["l_partkey"],
            "qty": b["l_quantity"],
            "rev": rev,
        })
        agg = t.group_by(["l_partkey", "qty"]).aggregate(
            [("rev", "sum"), ([], "count_all")]
        )
        return agg.rename_columns(["l_partkey", "qty", "rev_p", "n_p"])

    reduced = (
        read_table(
            sf_dir, "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        )
        .map_batches(reduce_pq, batch_format="pyarrow")
        .groupby(["l_partkey", "qty"])
        .aggregate(Sum("rev_p", alias_name="rev"), Sum("n_p", alias_name="nl"))
    )
    attrs = read_table(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    reduced = reduced.repartition(nparts)
    attrs = attrs.repartition(nparts)
    j = reduced.join(
        attrs, "inner", num_partitions=nparts,
        on=("l_partkey",), right_on=("p_partkey",),
    )

    def fin_part(b: pa.Table) -> pa.Table:
        brand = b["p_brand"]
        size = b["p_size"]
        qty = b["qty"]
        mask = pa.array(np.zeros(b.num_rows, dtype=bool))
        for br, slo, shi, qlo, qhi in _Q19_GROUPS:
            g = pc.and_(
                pc.and_(
                    pc.equal(brand, br),
                    pc.and_(
                        pc.greater_equal(size, slo), pc.less_equal(size, shi)
                    ),
                ),
                pc.and_(
                    pc.greater_equal(qty, qlo), pc.less_equal(qty, qhi)
                ),
            )
            mask = pc.or_(mask, g)
        f = b.filter(mask)
        s = pc.sum(f["rev"])
        n = pc.sum(f["nl"])
        return pa.table({
            "s_p": pa.array([s.as_py() or 0.0], pa.float64()),
            "n_p": pa.array([n.as_py() or 0], pa.int64()),
        })

    agg = j.map_batches(fin_part, batch_format="pyarrow").aggregate(
        Sum("s_p", alias_name="s"), Sum("n_p", alias_name="n")
    )
    return pd.DataFrame({
        "revenue": [np.round(float(agg["s"]), 2)],
        "n": np.array([int(agg["n"])], dtype=np.int64),
    })


def q_retrieval_map(sf_dir: str):
    """Mean-average-precision eval (the third member of the ranked-eval
    family next to MRR and nDCG — ES ``rank_eval``'s
    ``mean_average_precision`` metric): per query, AP@10 of the BM25
    run under the shared binary relevance "doc contains EVERY query
    term" — sum of precision@r at each relevant rank, divided by the
    query's TOTAL relevant-doc count (0.0 when none exist).  Same scale
    shape as nDCG: relevance streams over the corpus, totals come from
    the keyed count, only the rel∩top10 intersection reaches the
    driver."""
    k = 10
    topk = q_bm25_topk(sf_dir)
    hit_set, n_rel = _rel_hits(sf_dir, topk)

    out_q, out_a = [], []
    for qid, _terms in _BM25_QUERIES:
        g = topk[topk["query_id"] == qid]
        rel_mask = np.array(
            [(qid, d) in hit_set for d in g["doc_id"]], dtype=bool
        )
        ranks = np.sort(g["rank"].to_numpy()[rel_mask]).astype(np.float64)
        nr = n_rel.get(qid, 0)
        ap = (
            float(np.sum(np.arange(1, ranks.size + 1) / ranks)) / nr
            if nr > 0 else 0.0
        )
        out_q.append(qid)
        out_a.append(round(ap, 6))
    return pd.DataFrame({"query_id": out_q, "ap": out_a})


def _map_sql(queries: list[tuple[int, list[str]]], k: int = 10) -> str:
    return (
        _ranked_eval_prefix_sql(queries, k) + ", "
        "hits AS (SELECT t.query_id, t.rank FROM topk t "
        "JOIN rel r ON r.query_id = t.query_id AND r.doc_id = t.doc_id), "
        "prec AS (SELECT query_id, CAST(row_number() OVER ("
        "PARTITION BY query_id ORDER BY rank) AS DOUBLE) / rank AS p "
        "FROM hits), "
        "apq AS (SELECT query_id, sum(p) AS sp FROM prec GROUP BY 1), "
        "nrel AS (SELECT query_id, count(*) AS n FROM rel GROUP BY 1) "
        "SELECT qq.query_id, round(COALESCE(a.sp / n.n, 0), 6) AS ap "
        "FROM (SELECT DISTINCT query_id FROM q) qq "
        "LEFT JOIN apq a ON a.query_id = qq.query_id "
        "LEFT JOIN nrel n ON n.query_id = qq.query_id "
        "ORDER BY qq.query_id"
    )


SQL_RETRIEVAL_GMAP = (
    "SELECT round(exp(avg(ln(greatest(ap, 0.00001)))), 6) AS gmap, "
    "count(*) AS n_queries FROM ("
    + _map_sql(_BM25_QUERIES)
    + ")"
)


_HYB_WINDOW = 30   # per-retriever candidate window
_HYB_ALPHA = 0.5   # lexical weight (exact binary float)


def q_hybrid_minmax(sf_dir: str):
    """Hybrid lexical+dense retrieval with MIN-MAX score normalization
    (the Elasticsearch 8.x retriever ``normalizer: minmax`` linear
    combiner — the score-blending alternative to the rank-only RRF
    entry): each retriever contributes its top-``_HYB_WINDOW`` window,
    scores normalize PER QUERY to [0, 1] over that retriever's own
    window, and the final score is ``alpha * bm25_norm + (1 - alpha) *
    cos_norm`` with a missing-from-window side contributing 0.

    Scale shape: both windows are bounded top-k runs (BM25 actors /
    brute-cosine combiner); normalization and the union-merge happen on
    2 x window x queries rows at the driver.  Queries pair BM25 term
    sets 0-2 with embedding rows 0-2 (row-aligned tables)."""
    from ...stages.search import search

    idx = _build_docs_index(sf_dir)
    lex = _rerank_rounded(
        search(
            idx, _query_terms_ds(_BM25_QUERIES[:3]),
            k=2 * _HYB_WINDOW, concurrency=2,
        ).to_pandas(),
        k=_HYB_WINDOW,
    )
    q = _query_vectors(sf_dir, 3)
    den = ann.knn_brute(
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"]),
        q, k=_HYB_WINDOW,
    ).rename(columns={"vec_id": "doc_id"})

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _qid, g in df.groupby("query_id"):
            s = g["score"].to_numpy(np.float64)
            span = s.max() - s.min()
            g = g.copy()
            g["ns"] = np.zeros(len(g)) if span == 0 else (s - s.min()) / span
            out.append(g[["query_id", "doc_id", "ns"]])
        return pd.concat(out, ignore_index=True)

    ln = norm(lex).rename(columns={"ns": "bn"})
    dn = norm(den).rename(columns={"ns": "cn"})
    m = ln.merge(dn, on=["query_id", "doc_id"], how="outer").fillna(0.0)
    m["score"] = np.round(
        _HYB_ALPHA * m["bn"] + (1.0 - _HYB_ALPHA) * m["cn"], 6
    )
    return _rerank_rounded(m[["query_id", "doc_id", "score"]], k=10)


def _sql_hybrid_minmax(k: int = 10) -> str:
    qs = _BM25_QUERIES[:3]
    vals = ", ".join(f"({qid}, '{t}')" for qid, terms in qs for t in terms)
    return (
        # lexical window: the shared exact-BM25 expression
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
        "lexw AS (SELECT query_id, doc_id, score FROM ("
        "SELECT query_id, doc_id, round(score, 6) AS score, "
        "row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS rank FROM scored) "
        f"WHERE rank <= {_HYB_WINDOW}), "
        # dense window: brute cosine over the full embedding table
        "qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS v "
        "FROM embeddings WHERE vec_id < 3), "
        "cosall AS (SELECT qv.query_id, e.vec_id AS doc_id, "
        "round(list_cosine_similarity(qv.v, e.embedding::DOUBLE[]), 6) "
        "AS score FROM qv CROSS JOIN embeddings e), "
        "denw AS (SELECT query_id, doc_id, score FROM ("
        "SELECT query_id, doc_id, score, row_number() OVER ("
        "PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank "
        f"FROM cosall) WHERE rank <= {_HYB_WINDOW}), "
        # per-query min-max normalization over each retriever's window
        "lnorm AS (SELECT query_id, doc_id, CASE WHEN max(score) OVER w "
        "= min(score) OVER w THEN 0.0 ELSE (score - min(score) OVER w) / "
        "(max(score) OVER w - min(score) OVER w) END AS bn FROM lexw "
        "WINDOW w AS (PARTITION BY query_id)), "
        "dnorm AS (SELECT query_id, doc_id, CASE WHEN max(score) OVER w "
        "= min(score) OVER w THEN 0.0 ELSE (score - min(score) OVER w) / "
        "(max(score) OVER w - min(score) OVER w) END AS cn FROM denw "
        "WINDOW w AS (PARTITION BY query_id)), "
        "u AS (SELECT coalesce(l.query_id, d.query_id) AS query_id, "
        "coalesce(l.doc_id, d.doc_id) AS doc_id, "
        f"round({_HYB_ALPHA} * coalesce(l.bn, 0) + "
        f"{1.0 - _HYB_ALPHA} * coalesce(d.cn, 0), 6) AS score "
        "FROM lnorm l FULL OUTER JOIN dnorm d "
        "ON l.query_id = d.query_id AND l.doc_id = d.doc_id) "
        "SELECT query_id, rank, doc_id, score FROM ("
        "SELECT query_id, doc_id, score, CAST(row_number() OVER ("
        "PARTITION BY query_id ORDER BY score DESC, doc_id) AS INTEGER) "
        f"AS rank FROM u) WHERE rank <= {k}"
    )


def q_geohash_grid(sf_dir: str):
    """ES ``geohash_grid`` aggregation (the base32 sibling of
    ``geotile_grid``): per 4-char geohash cell, doc count and the exact
    micro-degree centroid.  The cell id is the 20-bit lon/lat bit
    interleave (functions/geo.geohash_bits) — pure integer arithmetic,
    so the shuffle key is one int64 and the whole entry is float-free
    (the centroid uses the shifted floor-division rule shared with
    geotile_grid); the base32 string derives from the packed id AFTER
    the groupby, in the |cells|-row finalizer."""
    from ...functions import geo

    def part(batch: pa.Table) -> pa.Table:
        lat, lon = _synth_geo(batch)
        g = geo.geohash_bits(lat, lon)
        t = pa.table({
            "g": pa.array(g, pa.int64()),
            "lat_p": pa.array(lat + 90_000_000, pa.int64()),
            "lon_p": pa.array(lon + 180_000_000, pa.int64()),
        })
        agg = t.group_by("g").aggregate(
            [("lat_p", "sum"), ("lon_p", "sum"), ([], "count_all")]
        )
        return agg.rename_columns(["g", "lat_p", "lon_p", "n_p"])

    def fin(b: pa.Table) -> pa.Table:
        g = b["g"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        slat = b["sum_lat"].to_numpy(zero_copy_only=False)
        slon = b["sum_lon"].to_numpy(zero_copy_only=False)
        return pa.table({
            "geohash": pa.array(geo.geohash_str(g), pa.string()),
            "n": b["n"],
            "centroid_lat": pa.array(
                (slat // n - 90_000_000) / 1e6, pa.float64()
            ),
            "centroid_lon": pa.array(
                (slon // n - 180_000_000) / 1e6, pa.float64()
            ),
        })

    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("g")
        .aggregate(
            Sum("lat_p", alias_name="sum_lat"),
            Sum("lon_p", alias_name="sum_lon"),
            Sum("n_p", alias_name="n"),
        )
        .map_batches(fin, batch_format="pyarrow")
    )


def _sql_geohash_grid() -> str:
    from ...functions import geo

    return (
        f"WITH {_sql_geo_cte()}, "
        f"b AS (SELECT {geo.sql_geohash_bits()} AS g, lat_e6, lon_e6 "
        "FROM g), "
        "c AS (SELECT g, count(*) AS n, "
        "CAST(sum(lat_e6 + 90000000) // count(*) AS BIGINT) AS flat, "
        "CAST(sum(lon_e6 + 180000000) // count(*) AS BIGINT) AS flon "
        "FROM b GROUP BY 1) "
        f"SELECT {geo.sql_geohash_str('g')} AS geohash, n, "
        "(flat - 90000000) / 1e6 AS centroid_lat, "
        "(flon - 180000000) / 1e6 AS centroid_lon FROM c"
    )


def q_events_moving_percentile(sf_dir: str):
    """ES ``moving_percentiles`` pipeline aggregation: the trailing
    3-day median (linear-interpolation percentile, the quantile_cont
    rule) of the daily event count.  Same pipeline-agg shape as
    moving_avg: the corpus pass is the daily-count combiner; the window
    function runs over the |days|-row reduced series."""

    def part(batch: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(batch["ts"], unit="day"), pa.timestamp("us")
        )
        t = pa.table({"window_start": day})
        agg = t.group_by("window_start").aggregate([([], "count_all")])
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
    daily["p50"] = np.round(
        daily["n"].rolling(window=3, min_periods=1).median(), 6
    )
    return daily[["window_start", "n", "p50"]]


SQL_EVENTS_MOVING_PCTL = (
    "SELECT window_start, n, round(quantile_cont(n, 0.5) OVER ("
    "ORDER BY window_start ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) "
    "AS p50 FROM (SELECT date_trunc('day', ts) AS window_start, "
    "count(*) AS n FROM events GROUP BY 1)"
)


def q_events_bucket_script(sf_dir: str):
    """ES ``bucket_script`` pipeline aggregation: a per-bucket derived
    metric over sibling aggs — here the mean event value per day
    (``sum_value / count``) next to the raw sums.  The script runs on
    the |days|-row reduced table; the corpus pass is one combiner."""

    def part(batch: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(batch["ts"], unit="day"), pa.timestamp("us")
        )
        t = pa.table({"window_start": day, "value": batch["value"]})
        agg = t.group_by("window_start").aggregate(
            [([], "count_all"), ("value", "sum")]
        )
        return agg.rename_columns(["window_start", "n_p", "sv_p"])

    daily = (
        read_table(sf_dir, "events", ["ts", "value"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Sum("n_p", alias_name="n"), Sum("sv_p", alias_name="sv"))
        .to_pandas()
    )
    n = daily["n"].to_numpy(np.float64)
    sv = daily["sv"].to_numpy(np.float64)
    daily["sum_value"] = np.round(sv, 2)
    daily["mean_value"] = np.round(sv / n, 6)
    daily["n"] = daily["n"].astype(np.int64)
    return daily[["window_start", "n", "sum_value", "mean_value"]]


SQL_EVENTS_BUCKET_SCRIPT = (
    # round_even: the mean can land exactly on a 1e-6 midpoint (e.g.
    # sum/32 = 54.2028125), where numpy's banker's rounding and SQL
    # round() diverge — mirror numpy's rule explicitly
    "SELECT date_trunc('day', ts) AS window_start, count(*) AS n, "
    "round(sum(value), 2) AS sum_value, "
    "round_even(sum(value) / count(*), 6) AS mean_value "
    "FROM events GROUP BY 1"
)


def _sql_tpch_q19() -> str:
    ors = " OR ".join(
        f"(p_brand = '{br}' AND p_size BETWEEN {slo} AND {shi} "
        f"AND l_quantity BETWEEN {qlo} AND {qhi})"
        for br, slo, shi, qlo, qhi in _Q19_GROUPS
    )
    return (
        # coalesce: an empty match (possible at tiny scale factors) is
        # 0.0 revenue in the engine, not NULL
        "SELECT coalesce(round(sum(l_extendedprice * (1 - l_discount)), 2), "
        "0.0) AS revenue, count(*) AS n "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        f"WHERE {ors}"
    )


_Q7_NATIONS = ("NATION_3", "NATION_7")
_Q7_LO, _Q7_HI = "1996-01-01", "1997-12-31"


def q_tpch_q7(sf_dir: str):
    """TPC-H Q7 (volume shipping between two nations): revenue flowing
    supplier-nation -> customer-nation per ship-year, for one nation
    pair in either direction.  Scale plan: nation is driver-tiny, so
    the two nation keys broadcast as filter sets into the supplier and
    customer reads (both shrink to 2/25 of their rows BEFORE any
    exchange); lineitem date-filters and computes volume at the read;
    the three hash joins carry only keys + the 2-valued nation codes;
    the (supp, cust, year) pre-aggregation inside map_batches bounds
    the final exchange at 2 x 2 x |years| rows."""
    n_cpu = int(ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(8, n_cpu // 2))
    nation = read_table(
        sf_dir, "nation", ["n_nationkey", "n_name"]
    ).to_pandas()
    pick = nation[nation["n_name"].isin(_Q7_NATIONS)]
    nkeys = pa.array(pick["n_nationkey"].astype(np.int64), pa.int64())
    names = dict(
        zip(pick["n_nationkey"].astype(int), pick["n_name"].astype(str))
    )

    supp = read_table(
        sf_dir, "supplier", ["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda t: t.filter(
            pc.is_in(pc.cast(t["s_nationkey"], pa.int64()), value_set=nkeys)
        ),
        batch_format="pyarrow",
    ).repartition(max(2, nparts // 2))
    cust = read_table(
        sf_dir, "customer", ["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda t: t.filter(
            pc.is_in(pc.cast(t["c_nationkey"], pa.int64()), value_set=nkeys)
        ),
        batch_format="pyarrow",
    ).repartition(max(2, nparts // 2))
    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey"]) \
        .repartition(nparts)

    lo = pa.scalar(np.datetime64(_Q7_LO, "us").item(), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(_Q7_HI, "us").item(), pa.timestamp("us"))

    def line_prep(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(b["l_shipdate"], lo),
            pc.less_equal(b["l_shipdate"], hi),
        )
        f = b.filter(m)
        return pa.table({
            "l_orderkey": f["l_orderkey"],
            "l_suppkey": f["l_suppkey"],
            "l_year": pc.cast(pc.year(f["l_shipdate"]), pa.int64()),
            "volume": pc.multiply(
                f["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), f["l_discount"]),
            ),
        })

    line = read_table(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_shipdate",
         "l_extendedprice", "l_discount"],
    ).map_batches(line_prep, batch_format="pyarrow")

    # customer-side first: orders x (filtered) customer shrinks orders to
    # the two nations before the big lineitem join
    oc = orders.join(
        cust, "inner", num_partitions=nparts,
        on=("o_custkey",), right_on=("c_custkey",),
    ).select_columns(["o_orderkey", "c_nationkey"]) \
        .repartition(max(2, nparts // 2))
    lj = line.join(
        oc, "inner", num_partitions=nparts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    ls = lj.join(
        supp, "inner", num_partitions=nparts,
        on=("l_suppkey",), right_on=("s_suppkey",),
    ).filter(expr="c_nationkey != s_nationkey")

    def vol_part(b: pa.Table) -> pa.Table:
        t = pa.table({
            "sk": pc.cast(b["s_nationkey"], pa.int64()),
            "ck": pc.cast(b["c_nationkey"], pa.int64()),
            "l_year": b["l_year"],
            "vol_p": b["volume"],
        })
        agg = t.group_by(["sk", "ck", "l_year"]).aggregate([("vol_p", "sum")])
        return agg.rename_columns(["sk", "ck", "l_year", "vol_p"])

    out = (
        ls.map_batches(vol_part, batch_format="pyarrow")
        .groupby(["sk", "ck", "l_year"])
        .aggregate(Sum("vol_p", alias_name="rev"))
        .to_pandas()
    )
    out["supp_nation"] = out["sk"].map(names)
    out["cust_nation"] = out["ck"].map(names)
    out["revenue"] = np.round(out["rev"], 2)
    return (
        out.sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
        [["supp_nation", "cust_nation", "l_year", "revenue"]]
    )


SQL_TPCH_Q7 = (
    "SELECT supp_nation, cust_nation, l_year, "
    "round(sum(volume), 2) AS revenue FROM ("
    "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
    "year(l_shipdate) AS l_year, "
    "l_extendedprice * (1 - l_discount) AS volume "
    "FROM supplier, lineitem, orders, customer, nation n1, nation n2 "
    "WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey "
    "AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey "
    "AND c_nationkey = n2.n_nationkey AND ("
    f"(n1.n_name = '{_Q7_NATIONS[0]}' AND n2.n_name = '{_Q7_NATIONS[1]}') "
    f"OR (n1.n_name = '{_Q7_NATIONS[1]}' AND n2.n_name = '{_Q7_NATIONS[0]}')"
    f") AND l_shipdate BETWEEN DATE '{_Q7_LO}' AND DATE '{_Q7_HI}') "
    "GROUP BY supp_nation, cust_nation, l_year "
    "ORDER BY supp_nation, cust_nation, l_year"
)


_Q8_NATION = "NATION_5"
_Q8_REGION = "ASIA"
_Q8_TYPE = "PROMO"
_Q8_LO, _Q8_HI = "1996-01-01", "1997-12-31"


def q_tpch_q8(sf_dir: str):
    """TPC-H Q8 (national market share): of all order volume for one
    part type sold to customers in one region over two years, the
    fraction supplied from one nation, per order-year.  Scale plan:
    region->nation resolves driver-side (tiny dims) into a broadcast
    customer filter set; part filters to one of six types at the read
    and joins lineitem FIRST (biggest selectivity win); orders
    date-filters at the read; supplier attaches only its nationkey; the
    per-(year, is_target) combiner bounds the final exchange at
    |years| x 2 rows, from which the share divides driver-side."""
    n_cpu = int(ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(8, n_cpu // 2))
    nation = read_table(
        sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]
    ).to_pandas()
    region = read_table(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rk = region.loc[region["r_name"] == _Q8_REGION, "r_regionkey"]
    rn = nation[nation["n_regionkey"].isin(rk)]
    cust_keys = pa.array(rn["n_nationkey"].astype(np.int64), pa.int64())
    target_nk = int(
        nation.loc[nation["n_name"] == _Q8_NATION, "n_nationkey"].iloc[0]
    )

    parts = read_table(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda t: t.filter(pc.equal(t["p_type"], _Q8_TYPE))
        .select(["p_partkey"]),
        batch_format="pyarrow",
    ).repartition(max(2, nparts // 2))
    lo = pa.scalar(np.datetime64(_Q8_LO, "us").item(), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(_Q8_HI, "us").item(), pa.timestamp("us"))
    orders = read_table(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: pa.table({
            "o_orderkey": (f := t.filter(pc.and_(
                pc.greater_equal(t["o_orderdate"], lo),
                pc.less_equal(t["o_orderdate"], hi),
            )))["o_orderkey"],
            "o_custkey": f["o_custkey"],
            "o_year": pc.cast(pc.year(f["o_orderdate"]), pa.int64()),
        }),
        batch_format="pyarrow",
    ).repartition(nparts)
    cust = read_table(
        sf_dir, "customer", ["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda t: t.filter(
            pc.is_in(pc.cast(t["c_nationkey"], pa.int64()),
                     value_set=cust_keys)
        ).select(["c_custkey"]),
        batch_format="pyarrow",
    ).repartition(max(2, nparts // 2))
    supp = read_table(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .repartition(max(2, nparts // 2))

    def line_prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_partkey": b["l_partkey"],
            "l_suppkey": b["l_suppkey"],
            "volume": pc.multiply(
                b["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), b["l_discount"]),
            ),
        })

    line = read_table(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey",
         "l_extendedprice", "l_discount"],
    ).map_batches(line_prep, batch_format="pyarrow")

    lp = line.join(
        parts, "left_semi", num_partitions=nparts,
        on=("l_partkey",), right_on=("p_partkey",),
    )
    oc = orders.join(
        cust, "left_semi", num_partitions=nparts,
        on=("o_custkey",), right_on=("c_custkey",),
    ).select_columns(["o_orderkey", "o_year"]) \
        .repartition(max(2, nparts // 2))
    lo_j = lp.join(
        oc, "inner", num_partitions=nparts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    ls = lo_j.join(
        supp, "inner", num_partitions=nparts,
        on=("l_suppkey",), right_on=("s_suppkey",),
    )

    def share_part(b: pa.Table) -> pa.Table:
        is_t = pc.cast(
            pc.equal(pc.cast(b["s_nationkey"], pa.int64()), target_nk),
            pa.int64(),
        )
        t = pa.table({
            "o_year": b["o_year"],
            "is_t": is_t,
            "vol_p": b["volume"],
        })
        agg = t.group_by(["o_year", "is_t"]).aggregate([("vol_p", "sum")])
        return agg.rename_columns(["o_year", "is_t", "vol_p"])

    out = (
        ls.map_batches(share_part, batch_format="pyarrow")
        .groupby(["o_year", "is_t"])
        .aggregate(Sum("vol_p", alias_name="vol"))
        .to_pandas()
    )
    tot = out.groupby("o_year")["vol"].sum()
    tgt = out[out["is_t"] == 1].set_index("o_year")["vol"]
    share = (tgt.reindex(tot.index).fillna(0.0) / tot).round(6)
    return pd.DataFrame({
        "o_year": np.asarray(tot.index, dtype=np.int64),
        "mkt_share": share.to_numpy(),
    }).sort_values("o_year").reset_index(drop=True)


SQL_TPCH_Q8 = (
    "SELECT o_year, round(sum(CASE WHEN nation = "
    f"'{_Q8_NATION}' THEN volume ELSE 0.0 END) / sum(volume), 6) "
    "AS mkt_share FROM ("
    "SELECT year(o_orderdate) AS o_year, "
    "l_extendedprice * (1 - l_discount) AS volume, n2.n_name AS nation "
    "FROM part, supplier, lineitem, orders, customer, "
    "nation n1, nation n2, region "
    "WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey "
    "AND l_orderkey = o_orderkey AND o_custkey = c_custkey "
    "AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey "
    f"AND r_name = '{_Q8_REGION}' AND s_nationkey = n2.n_nationkey "
    f"AND o_orderdate BETWEEN DATE '{_Q8_LO}' AND DATE '{_Q8_HI}' "
    f"AND p_type = '{_Q8_TYPE}') "
    "GROUP BY o_year ORDER BY o_year"
)


_Q9_WORD = "red"


def q_tpch_q9(sf_dir: str):
    """TPC-H Q9 (product-type profit), adapted to the driver's column
    subset: there is no partsupp table, so profit is the discounted
    revenue l_extendedprice*(1-l_discount) (the ps_supplycost term of
    the official query is dropped — mirrored exactly in the oracle),
    for parts whose name contains one word, grouped by supplier nation
    and order-year.  Scale plan: the part name filter runs at the read
    and semi-joins lineitem; orders contributes only its year; the
    (nation, year) combiner bounds the exchange at 25 x |years| rows."""
    n_cpu = int(ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(8, n_cpu // 2))
    nation = read_table(
        sf_dir, "nation", ["n_nationkey", "n_name"]
    ).to_pandas()
    names = dict(
        zip(nation["n_nationkey"].astype(int), nation["n_name"].astype(str))
    )

    parts = read_table(sf_dir, "part", ["p_partkey", "p_name"]).map_batches(
        lambda t: t.filter(
            pc.match_substring(t["p_name"], _Q9_WORD)
        ).select(["p_partkey"]),
        batch_format="pyarrow",
    ).repartition(max(2, nparts // 2))
    orders = read_table(
        sf_dir, "orders", ["o_orderkey", "o_orderdate"]
    ).map_batches(
        lambda t: pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
        }),
        batch_format="pyarrow",
    ).repartition(nparts)
    supp = read_table(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .repartition(max(2, nparts // 2))

    def line_prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_partkey": b["l_partkey"],
            "l_suppkey": b["l_suppkey"],
            "amount": pc.multiply(
                b["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), b["l_discount"]),
            ),
        })

    line = read_table(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey",
         "l_extendedprice", "l_discount"],
    ).map_batches(line_prep, batch_format="pyarrow")

    lp = line.join(
        parts, "left_semi", num_partitions=nparts,
        on=("l_partkey",), right_on=("p_partkey",),
    )
    lj = lp.join(
        orders, "inner", num_partitions=nparts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    ls = lj.join(
        supp, "inner", num_partitions=nparts,
        on=("l_suppkey",), right_on=("s_suppkey",),
    )

    def prof_part(b: pa.Table) -> pa.Table:
        t = pa.table({
            "nk": pc.cast(b["s_nationkey"], pa.int64()),
            "o_year": b["o_year"],
            "amt_p": b["amount"],
        })
        agg = t.group_by(["nk", "o_year"]).aggregate([("amt_p", "sum")])
        return agg.rename_columns(["nk", "o_year", "amt_p"])

    out = (
        ls.map_batches(prof_part, batch_format="pyarrow")
        .groupby(["nk", "o_year"])
        .aggregate(Sum("amt_p", alias_name="amt"))
        .to_pandas()
    )
    out["nation"] = out["nk"].map(names)
    out["sum_profit"] = np.round(out["amt"], 2)
    return (
        out.sort_values(["nation", "o_year"], ascending=[True, False])
        .reset_index(drop=True)[["nation", "o_year", "sum_profit"]]
    )


SQL_TPCH_Q9 = (
    "SELECT nation, o_year, round(sum(amount), 2) AS sum_profit FROM ("
    "SELECT n_name AS nation, year(o_orderdate) AS o_year, "
    "l_extendedprice * (1 - l_discount) AS amount "
    "FROM part, supplier, lineitem, orders, nation "
    "WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey "
    "AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey "
    f"AND p_name LIKE '%{_Q9_WORD}%') "
    "GROUP BY nation, o_year ORDER BY nation, o_year DESC"
)


_Q22_NKEYS = (1, 4, 9, 13, 17, 20, 22)
_Q22_CUTOFF = "2000-01-01"


def q_tpch_q22(sf_dir: str):
    """TPC-H Q22 (global sales opportunity), adapted to the driver's
    column subset: customer has no c_phone, so the country code IS the
    nation name and the candidate set is a pinned list of nation KEYS
    (mirroring the query's seven phone prefixes); and because this
    generator gives EVERY customer at least one order, "has placed no
    orders" becomes "has placed no order since a pinned cutoff" — the
    same dormant-but-funded intent, non-degenerate at every sf.
    Otherwise kept exactly: customers in the set with
    above-average-positive account balance (average over the same set)
    and no recent orders, grouped by country code.  Scale plan: the
    average is one scalar aggregate over the nation-filtered customer
    read (broadcast filter set, no exchange); the no-recent-orders
    predicate is a left_anti hash join against the date-filtered orders
    custkey column (never a driver-side key set); the final groupby is
    |nations| rows."""
    n_cpu = int(ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(8, n_cpu // 2))
    nation = read_table(
        sf_dir, "nation", ["n_nationkey", "n_name"]
    ).to_pandas()
    pick = nation[nation["n_nationkey"].isin(_Q22_NKEYS)]
    nkeys = pa.array(pick["n_nationkey"].astype(np.int64), pa.int64())
    names = dict(
        zip(pick["n_nationkey"].astype(int), pick["n_name"].astype(str))
    )

    def cust_filter(t: pa.Table) -> pa.Table:
        f = t.filter(
            pc.is_in(pc.cast(t["c_nationkey"], pa.int64()), value_set=nkeys)
        )
        return pa.table({
            "c_custkey": f["c_custkey"],
            "c_nationkey": pc.cast(f["c_nationkey"], pa.int64()),
            "c_acctbal": f["c_acctbal"],
        })

    cust = read_table(
        sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]
    ).map_batches(cust_filter, batch_format="pyarrow")

    # scalar threshold: mean positive acctbal over the candidate set —
    # a combiner-shaped (sum, n) pass, one row to the driver
    def pos_part(b: pa.Table) -> pa.Table:
        f = b.filter(pc.greater(b["c_acctbal"], 0.0))
        s = pc.sum(f["c_acctbal"])
        return pa.table({
            "s_p": pa.array([s.as_py() or 0.0], pa.float64()),
            "n_p": pa.array([f.num_rows], pa.int64()),
        })

    th = cust.map_batches(pos_part, batch_format="pyarrow").aggregate(
        Sum("s_p", alias_name="s"), Sum("n_p", alias_name="n")
    )
    avg_bal = float(th["s"]) / max(1, int(th["n"]))

    rich = cust.map_batches(
        lambda t: t.filter(pc.greater(t["c_acctbal"], avg_bal)),
        batch_format="pyarrow",
    ).repartition(max(2, nparts // 2))
    cut = pa.scalar(
        np.datetime64(_Q22_CUTOFF, "us").item(), pa.timestamp("us")
    )
    ordc = read_table(
        sf_dir, "orders", ["o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(pc.greater_equal(t["o_orderdate"], cut))
        .select(["o_custkey"]),
        batch_format="pyarrow",
    ).repartition(nparts)
    no_orders = rich.join(
        ordc, "left_anti", num_partitions=nparts,
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def cc_part(b: pa.Table) -> pa.Table:
        t = pa.table({"nk": b["c_nationkey"], "bal_p": b["c_acctbal"]})
        agg = t.group_by("nk").aggregate([("bal_p", "sum"), ([], "count_all")])
        return agg.rename_columns(["nk", "bal_p", "n_p"])

    out = (
        no_orders.map_batches(cc_part, batch_format="pyarrow")
        .groupby("nk")
        .aggregate(Sum("bal_p", alias_name="bal"), Sum("n_p", alias_name="n"))
        .to_pandas()
    )
    if out.empty:
        # a sf where every rich candidate ordered recently: 0 rows, but
        # with the contract schema (the oracle's GROUP BY also emits none)
        return pd.DataFrame({
            "cntrycode": pd.Series([], dtype=str),
            "numcust": pd.Series([], dtype=np.int64),
            "totacctbal": pd.Series([], dtype=np.float64),
        })
    out["cntrycode"] = out["nk"].map(names)
    out["numcust"] = out["n"].astype(np.int64)
    out["totacctbal"] = np.round(out["bal"], 2)
    return (
        out.sort_values("cntrycode").reset_index(drop=True)
        [["cntrycode", "numcust", "totacctbal"]]
    )


def _sql_tpch_q22() -> str:
    ks = ", ".join(str(k) for k in _Q22_NKEYS)
    return (
        "SELECT cntrycode, count(*) AS numcust, "
        "round(sum(c_acctbal), 2) AS totacctbal FROM ("
        "SELECT n_name AS cntrycode, c_acctbal FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey "
        f"WHERE n_nationkey IN ({ks}) AND c_acctbal > ("
        "SELECT avg(c_acctbal) FROM customer "
        f"WHERE c_acctbal > 0.0 AND c_nationkey IN ({ks})) "
        "AND c_custkey NOT IN (SELECT o_custkey FROM orders "
        f"WHERE o_orderdate >= DATE '{_Q22_CUTOFF}')) "
        "GROUP BY cntrycode ORDER BY cntrycode"
    )


_Q12_HIGH = ("1-URGENT", "2-HIGH")
_Q12_LAG_DAYS = 90
_Q12_YEAR = ("1997-01-01", "1998-01-01")


def q_tpch_q12(sf_dir: str):
    """TPC-H Q12 (shipping modes and order priority), adapted to the
    driver's column subset: lineitem has no l_shipmode / l_commitdate /
    l_receiptdate, so the mode dimension is l_returnflag and "late"
    means the ship lag exceeded a pinned window (l_shipdate more than
    90 days after o_orderdate) — same intent (late lines bucketed by a
    line attribute, split by order priority), mirrored exactly in the
    oracle.  Restricted to a pinned ship year.  Scale plan: lineitem is
    filtered to the ship-year at the read-side map; ONE hash join ships
    only (l_orderkey, l_returnflag, l_shipdate) against the 2-column
    orders projection; the (flag, high, low) combiner bounds the
    exchange at 3 rows per batch."""
    n_cpu = int(ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(8, n_cpu // 2))
    y0 = pa.scalar(
        np.datetime64(_Q12_YEAR[0], "us").item(), pa.timestamp("us")
    )
    y1 = pa.scalar(
        np.datetime64(_Q12_YEAR[1], "us").item(), pa.timestamp("us")
    )

    def line_prep(t: pa.Table) -> pa.Table:
        f = t.filter(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], y0),
                pc.less(t["l_shipdate"], y1),
            )
        )
        return pa.table({
            "l_orderkey": f["l_orderkey"],
            "mode": f["l_returnflag"],
            "l_shipdate": f["l_shipdate"],
        })

    line = read_table(
        sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_shipdate"]
    ).map_batches(line_prep, batch_format="pyarrow")
    orders = read_table(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).repartition(nparts)
    j = line.join(
        orders, "inner", num_partitions=nparts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    lag_us = np.int64(_Q12_LAG_DAYS) * 86_400_000_000

    def part(b: pa.Table) -> pa.Table:
        ship = pc.cast(b["l_shipdate"], pa.int64())
        odate = pc.cast(b["o_orderdate"], pa.int64())
        late = pc.greater(pc.subtract(ship, odate), pa.scalar(lag_us))
        f = b.filter(late)
        hi = pc.is_in(
            f["o_orderpriority"],
            value_set=pa.array(list(_Q12_HIGH), pa.string()),
        )
        hi64 = pc.cast(hi, pa.int64())
        t = pa.table({
            "mode": f["mode"],
            "high_p": hi64,
            "low_p": pc.subtract(pa.scalar(1, pa.int64()), hi64),
        })
        agg = t.group_by("mode").aggregate([("high_p", "sum"), ("low_p", "sum")])
        return agg.rename_columns(["mode", "high_p", "low_p"])

    out = (
        j.map_batches(part, batch_format="pyarrow")
        .groupby("mode")
        .aggregate(
            Sum("high_p", alias_name="high_line_count"),
            Sum("low_p", alias_name="low_line_count"),
        )
        .to_pandas()
    )
    out["high_line_count"] = out["high_line_count"].astype(np.int64)
    out["low_line_count"] = out["low_line_count"].astype(np.int64)
    return (
        out.sort_values("mode").reset_index(drop=True)
        [["mode", "high_line_count", "low_line_count"]]
    )


def _sql_tpch_q12() -> str:
    hi = ", ".join(f"'{p}'" for p in _Q12_HIGH)
    return (
        "SELECT l_returnflag AS mode, "
        f"CAST(sum(CASE WHEN o_orderpriority IN ({hi}) THEN 1 ELSE 0 END) "
        "AS BIGINT) AS high_line_count, "
        f"CAST(sum(CASE WHEN o_orderpriority NOT IN ({hi}) THEN 1 ELSE 0 "
        "END) AS BIGINT) AS low_line_count "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        f"WHERE l_shipdate > o_orderdate + INTERVAL {_Q12_LAG_DAYS} DAY "
        f"AND l_shipdate >= DATE '{_Q12_YEAR[0]}' "
        f"AND l_shipdate < DATE '{_Q12_YEAR[1]}' "
        "GROUP BY mode ORDER BY mode"
    )


def q_tpch_q21(sf_dir: str):
    """TPC-H Q21 (suppliers who kept orders waiting), adapted to the
    driver's column subset: with no l_receiptdate / l_commitdate,
    "late" is the same pinned ship-lag rule as the adapted Q12
    (l_shipdate more than 90 days after o_orderdate).  A supplier
    waits an order iff it shipped late in a finished ('F')
    multi-supplier order in which it was the ONLY late supplier —
    exactly the official query's EXISTS / NOT EXISTS pair, recast as
    two combiner-shaped aggregates: (1) per (orderkey, suppkey) the
    Max(late) over that supplier's lines, (2) per orderkey the distinct
    supplier count and late-supplier count; the culprit rows are a hash
    join of (1) against (2).  Scale plan: no per-order map_groups —
    both reductions pre-aggregate inside map_batches before the keyed
    exchange; supplier names attach to the final (suppkey, numwait)
    rows (|suppliers| at most), top-100 by (numwait DESC, s_name)."""
    n_cpu = int(ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(8, n_cpu // 2))
    orders = read_table(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderstatus"]
    ).map_batches(
        lambda t: t.filter(
            pc.equal(t["o_orderstatus"], "F")
        ).select(["o_orderkey", "o_orderdate"]),
        batch_format="pyarrow",
    ).repartition(nparts)
    line = read_table(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"]
    )
    j = line.join(
        orders, "inner", num_partitions=nparts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    lag_us = np.int64(_Q12_LAG_DAYS) * 86_400_000_000

    def sk_part(b: pa.Table) -> pa.Table:
        ship = pc.cast(b["l_shipdate"], pa.int64())
        odate = pc.cast(b["o_orderdate"], pa.int64())
        late = pc.cast(
            pc.greater(pc.subtract(ship, odate), pa.scalar(lag_us)),
            pa.int64(),
        )
        t = pa.table({
            "ok": b["l_orderkey"], "sk": b["l_suppkey"], "late_p": late,
        })
        agg = t.group_by(["ok", "sk"]).aggregate([("late_p", "max")])
        return agg.rename_columns(["ok", "sk", "late_p"])

    from ray.data.aggregate import Max

    # (1) per (order, supplier): did this supplier ship anything late?
    per_os = (
        j.map_batches(sk_part, batch_format="pyarrow")
        .groupby(["ok", "sk"])
        .aggregate(Max("late_p", alias_name="late"))
    )

    # (2) per order: distinct suppliers + late suppliers (rows of (1)
    # are already distinct per (ok, sk), so Count/Sum over them is the
    # distinct count — combiner-shaped again)
    def ord_part(b: pa.Table) -> pa.Table:
        t = pa.table({"ok": b["ok"], "late_x": b["late"]})
        agg = t.group_by("ok").aggregate([([], "count_all"), ("late_x", "sum")])
        return agg.rename_columns(["ok", "ns_p", "nl_p"])

    per_ord = (
        per_os.map_batches(ord_part, batch_format="pyarrow")
        .groupby("ok")
        .aggregate(
            Sum("ns_p", alias_name="n_supp"), Sum("nl_p", alias_name="n_late")
        )
    )
    culprits = per_os.map_batches(
        lambda t: t.filter(pc.equal(t["late"], 1)),
        batch_format="pyarrow",
    ).join(
        per_ord, "inner", num_partitions=nparts, on=("ok",), right_on=("ok",),
    ).map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater(t["n_supp"], 1), pc.equal(t["n_late"], 1))
        ).select(["sk"]),
        batch_format="pyarrow",
    )

    def cnt_part(b: pa.Table) -> pa.Table:
        agg = pa.table({"sk": b["sk"]}).group_by("sk").aggregate(
            [([], "count_all")]
        )
        return agg.rename_columns(["sk", "nw_p"])

    waits = (
        culprits.map_batches(cnt_part, batch_format="pyarrow")
        .groupby("sk")
        .aggregate(Sum("nw_p", alias_name="numwait"))
        .to_pandas()
    )
    supp = read_table(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    out = waits.merge(supp, left_on="sk", right_on="s_suppkey", how="inner")
    out["numwait"] = out["numwait"].astype(np.int64)
    return (
        out.sort_values(["numwait", "s_name"], ascending=[False, True])
        .head(100).reset_index(drop=True)[["s_name", "numwait"]]
    )


def _sql_tpch_q21() -> str:
    return (
        "WITH lines AS (SELECT l_orderkey AS ok, l_suppkey AS sk, "
        "max(CASE WHEN l_shipdate > o_orderdate + INTERVAL "
        f"{_Q12_LAG_DAYS} DAY THEN 1 ELSE 0 END) AS late "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_orderstatus = 'F' GROUP BY 1, 2), "
        "per_order AS (SELECT ok, count(*) AS n_supp, sum(late) AS n_late "
        "FROM lines GROUP BY ok) "
        "SELECT s_name, count(*) AS numwait "
        "FROM lines JOIN per_order USING (ok) "
        "JOIN supplier ON sk = s_suppkey "
        "WHERE late = 1 AND n_supp > 1 AND n_late = 1 "
        "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"
    )


from ._nsacc import export as _ns_export

_ns_export(globals())
del _ns_export
