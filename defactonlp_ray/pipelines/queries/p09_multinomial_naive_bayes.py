# Part 09/11 of the former single-module pipelines/queries.py
# (mechanical split, round 5 — VERDICT r04 next-round #6).  Parts share
# ONE late-bound namespace via _nsacc: globals are seeded from the
# accumulator before this body runs (preserving original top-level
# execution order) and the final merged namespace is injected back into
# every part by __init__, so call-time forward references behave exactly
# as in the single file.  Original lines 16728-18670.
from __future__ import annotations

from ._nsacc import NS as _ns_seed

globals().update(_ns_seed)
del _ns_seed



# ------------------------------------------- multinomial Naive Bayes

_NB_MOD = 7        # eval split: doc_id % 7 == 0; train on the rest
_NB_MARK = "\x00"  # train-combiner marker row carrying per-class doc counts


def q_nb_classify(sf_dir: str):
    """Distributed multinomial Naive Bayes (McCallum & Nigam 1998):
    TRAIN a source-of-document classifier on the doc_id % 7 != 0 split
    and CLASSIFY the held-out split, add-1 smoothing over the train
    vocabulary.  Shapes: training is ONE (term, source) count exchange
    — the per-batch combiner also folds per-class doc counts in as
    marker rows, so priors ride the same groupby; the model (a V x C
    log-prob matrix — tiny next to any corpus) broadcasts once via
    ray.put and classification is a single streamed pass: token ->
    vocab row via searchsorted, per-doc class scores accumulated with
    ONE np.add.at scatter, argmax after the cross-engine round(6).  A
    100-TB vocabulary would swap the broadcast for a term-keyed hash
    join of (doc, term, tf) against the model table — same train
    exchange, one extra join; the prediction rule is unchanged.  Docs
    with zero tokens score prior-only (none exist in these tables, so
    the SQL oracle starts from the token stream)."""

    def _mod_split(keep_eval: bool):
        def f(b: pa.Table) -> pa.Table:
            m = b["doc_id"].to_numpy(zero_copy_only=False) % _NB_MOD == 0
            return b.filter(pa.array(m if keep_eval else ~m))

        return f

    def train_part(b: pa.Table) -> pa.Table:
        terms, row_idx, _ = flatten_tokens(b["text"])
        src = b["source"].to_pylist()
        tsrc = pa.array([src[r] for r in row_idx], pa.string())
        cnt = pa.table({"term": terms, "source": tsrc}).group_by(
            ["term", "source"]
        ).aggregate([([], "count_all")]).rename_columns(
            ["term", "source", "n_p"]
        )
        du, dc = np.unique(np.asarray(src, dtype=object), return_counts=True)
        mark = pa.table({
            "term": pa.array([_NB_MARK] * len(du), pa.string()),
            "source": pa.array(du.astype(str), pa.string()),
            "n_p": pa.array(dc.astype(np.int64), pa.int64()),
        })
        return pa.concat_tables([cnt.cast(mark.schema), mark])

    counts = (
        _docs(sf_dir, ["doc_id", "text", "source"])
        .map_batches(_mod_split(False), batch_format="pyarrow")
        .map_batches(train_part, batch_format="pyarrow")
        .groupby(["term", "source"])
        .aggregate(Sum("n_p", alias_name="n"))
        .to_pandas()
    )
    doc_counts = counts[counts["term"] == _NB_MARK]
    tok_counts = counts[counts["term"] != _NB_MARK]
    classes = np.array(sorted(doc_counts["source"]), dtype=object)
    cidx = {c: i for i, c in enumerate(classes)}
    vocab = np.array(sorted(tok_counts["term"].unique()), dtype=object)
    vidx = {t: i for i, t in enumerate(vocab)}
    M = np.zeros((len(vocab), len(classes)), dtype=np.float64)
    for t, c, n in zip(tok_counts["term"], tok_counts["source"],
                       tok_counts["n"]):
        M[vidx[t], cidx[c]] = n
    T = M.sum(axis=0)
    V = len(vocab)
    lp = np.log((M + 1.0) / (T + V))
    oov = np.log(1.0 / (T + V))
    nd = np.zeros(len(classes), dtype=np.float64)
    for c, n in zip(doc_counts["source"], doc_counts["n"]):
        nd[cidx[c]] = n
    priors = np.log(nd / nd.sum())
    model_ref = ray.put((vocab.astype(str), lp, oov, priors, classes))

    def classify(b: pa.Table) -> pa.Table:
        vocab_s, lp_m, oov_v, pri, cls = ray.get(model_ref)
        terms, row_idx, _ = flatten_tokens(b["text"])
        nrows = b.num_rows
        S = np.tile(pri, (nrows, 1))
        if len(terms):
            t = np.asarray(terms.to_pylist(), dtype=object).astype(str)
            pos = np.searchsorted(vocab_s, t)
            pos_c = np.clip(pos, 0, len(vocab_s) - 1)
            known = vocab_s[pos_c] == t
            L = np.where(known[:, None], lp_m[pos_c], oov_v[None, :])
            np.add.at(S, row_idx, L)
        S = np.round(S, 6)
        best = np.argmax(S, axis=1)  # first max == smallest class name
        return pa.table({
            "doc_id": b["doc_id"],
            "pred_source": pa.array(cls[best].astype(str), pa.string()),
            "score": pa.array(S[np.arange(nrows), best], pa.float64()),
        })

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_mod_split(True), batch_format="pyarrow")
        .map_batches(classify, batch_format="pyarrow")
    )


SQL_NB_CLASSIFY = (
    f"WITH tr AS (SELECT * FROM documents WHERE doc_id % {_NB_MOD} <> 0), "
    f"ev AS (SELECT * FROM documents WHERE doc_id % {_NB_MOD} = 0), "
    "ttoks AS (SELECT source, unnest(list_filter(string_split(text, ' '), "
    "x -> x <> '')) AS term FROM tr), "
    "ctc AS (SELECT source, term, count(*) AS n FROM ttoks GROUP BY 1, 2), "
    "ct AS (SELECT source, CAST(sum(n) AS BIGINT) AS t FROM ctc "
    "GROUP BY 1), "
    "v AS (SELECT count(DISTINCT term) AS v FROM ttoks), "
    "pri AS (SELECT source, count(*) AS nd FROM tr GROUP BY 1), "
    "tot AS (SELECT CAST(sum(nd) AS BIGINT) AS s FROM pri), "
    "etoks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), "
    "x -> x <> '')) AS term FROM ev), "
    "etf AS (SELECT doc_id, term, count(*) AS tf FROM etoks GROUP BY 1, 2), "
    "sc AS (SELECT e.doc_id, c.source, "
    "ln(pri.nd / CAST(tot.s AS DOUBLE)) + "
    "sum(e.tf * ln((coalesce(ctc.n, 0) + 1) / "
    "CAST(ct.t + v.v AS DOUBLE))) AS score "
    "FROM etf e CROSS JOIN (SELECT DISTINCT source FROM tr) c "
    "LEFT JOIN ctc ON ctc.source = c.source AND ctc.term = e.term "
    "JOIN ct ON ct.source = c.source CROSS JOIN v "
    "JOIN pri ON pri.source = c.source CROSS JOIN tot "
    "GROUP BY e.doc_id, c.source, pri.nd, tot.s) "
    "SELECT doc_id, source AS pred_source, score FROM ("
    "SELECT doc_id, source, round(score, 6) AS score, "
    "row_number() OVER (PARTITION BY doc_id "
    "ORDER BY round(score, 6) DESC, source) AS rn FROM sc) WHERE rn = 1"
)


def q_ann_hamming(sf_dir: str):
    """Binary-code similarity search (stages/ann.knn_hamming): vectors
    sign-binarized into packed uint64 words (64x under float64 — the
    candidate-generation memory form), exact Hamming top-10 per query
    with integer distances (no float policy).  Oracle: DuckDB counts
    sign disagreements per dimension with a list lambda — fully
    independent of the bit packing and the popcount LUT."""
    q = _query_vectors(sf_dir, 3)
    res = ann.knn_hamming(
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"]), q, k=10
    )
    return res


_ANN_DIM = 64

SQL_ANN_HAMMING = (
    "WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv "
    "FROM embeddings WHERE vec_id < 3), "
    "d AS (SELECT q.query_id, e.vec_id, "
    f"len(list_filter(range(1, {_ANN_DIM + 1}), "
    "i -> (q.qv[i] >= 0) <> (e.embedding[i] >= 0))) AS hamming "
    "FROM q CROSS JOIN embeddings e) "
    "SELECT query_id, rank, vec_id, hamming FROM ("
    "SELECT query_id, vec_id, hamming, "
    "row_number() OVER (PARTITION BY query_id "
    "ORDER BY hamming, vec_id) AS rank FROM d) WHERE rank <= 10"
)


def q_csv_source_stats(sf_dir: str):
    """CSV front door (the third interchange format next to WARC and
    JSONL): documents round-trip through Ray Data's OWN csv sink
    (``Dataset.write_csv`` — sharded, quoted, schema-inferring) and
    back via ``ray.data.read_csv``, then a per-source tally including a
    length recomputed FROM the round-tripped text — equality with SQL
    over the original parquet proves the quote/escape cycle lossless
    for every document body.  Write is resumable behind a _SUCCESS
    marker kept OUTSIDE the data dir (a marker file inside would be
    read back as data)."""
    root = _tmp_index_dir(sf_dir, "csvsrc")
    data = os.path.join(root, "data")
    done = os.path.join(root, "_SUCCESS")
    if not os.path.exists(done):
        import shutil as _shutil

        tmp = data + ".tmp"
        _shutil.rmtree(tmp, ignore_errors=True)
        _shutil.rmtree(data, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        _docs(sf_dir, ["doc_id", "source", "n_chars", "text"]).write_csv(tmp)
        os.replace(tmp, data)
        with open(done + ".tmp", "w") as f:
            f.write("ok")
        os.replace(done + ".tmp", done)

    def part(b: pa.Table) -> pa.Table:
        t = pa.table({
            "source": b["source"],
            "nc": b["n_chars"],
            "ln": pc.utf8_length(b["text"]),
        })
        agg = t.group_by("source").aggregate(
            [("nc", "sum"), ("ln", "sum"), ([], "count_all")]
        )
        return agg.rename_columns(["source", "nc_p", "ln_p", "n_p"])

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "source": b["source"],
            "n": b["n"],
            "sum_chars": b["sum_chars"],
            "sum_len": pc.cast(b["sum_len"], pa.int64()),
        })

    return (
        ray.data.read_csv(data)
        .map_batches(part, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_p", alias_name="n"),
            Sum("nc_p", alias_name="sum_chars"),
            Sum("ln_p", alias_name="sum_len"),
        )
        .map_batches(fin, batch_format="pyarrow")
    )


SQL_CSV_SOURCE_STATS = (
    "SELECT source, count(*) AS n, "
    "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
    "CAST(sum(length(text)) AS BIGINT) AS sum_len "
    "FROM documents GROUP BY 1"
)


# ------------------------------------------------- geo family (functions/geo)

_GEO_ZOOM = 4
_GEO_ORIGIN = (48.8566, 2.3522)  # Paris; pinned in both engines
_GEO_TOPK = 50


def _synth_geo(batch: pa.Table):
    from ...functions import geo

    d = batch["doc_id"].to_numpy(zero_copy_only=False)
    return geo.synth_coords_e6(d)


def q_geotile_grid(sf_dir: str):
    """ES ``geotile_grid`` aggregation with a ``geo_centroid`` sub-agg:
    deterministic per-doc coordinates (exact affine-mod integer synthesis,
    functions/geo.py — the corpus has no geo columns), web-mercator tile
    (x, y) at zoom 4, then per-tile doc count and centroid.  The shuffle
    key is one packed int64 (x<<32|y) so the exchange is a single-column
    groupby; tile-x is exact integer division; tile-y rides the float
    policy; the centroid avoids floats entirely — coordinates are
    shifted non-negative so integer floor-division == truncation on
    both engines, giving an EXACT micro-degree centroid (n=2/4/6
    buckets land on .5-microdegree halves where round(,6) diverges:
    numpy banker's vs DuckDB half-away)."""
    from ...functions import geo

    def part(batch: pa.Table) -> pa.Table:
        lat, lon = _synth_geo(batch)
        x, y = geo.geotile_xy(lat, lon, _GEO_ZOOM)
        key = (x << np.int64(32)) | y
        t = pa.table({
            "tile_key": pa.array(key, pa.int64()),
            "lat_p": pa.array(lat + 85_000_000, pa.int64()),
            "lon_p": pa.array(lon + 180_000_000, pa.int64()),
        })
        agg = t.group_by("tile_key").aggregate(
            [("lat_p", "sum"), ("lon_p", "sum"), ([], "count_all")]
        )
        return agg.rename_columns(["tile_key", "lat_p", "lon_p", "n_p"])

    def fin(b: pa.Table) -> pa.Table:
        key = b["tile_key"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        slat = b["sum_lat"].to_numpy(zero_copy_only=False)
        slon = b["sum_lon"].to_numpy(zero_copy_only=False)
        clat = (slat // n - 85_000_000) / 1e6
        clon = (slon // n - 180_000_000) / 1e6
        return pa.table({
            "tile_x": pa.array(key >> np.int64(32), pa.int64()),
            "tile_y": pa.array(key & np.int64(0xFFFFFFFF), pa.int64()),
            "n": b["n"],
            "centroid_lat": pa.array(clat, pa.float64()),
            "centroid_lon": pa.array(clon, pa.float64()),
        })

    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("tile_key")
        .aggregate(
            Sum("lat_p", alias_name="sum_lat"),
            Sum("lon_p", alias_name="sum_lon"),
            Sum("n_p", alias_name="n"),
        )
        .map_batches(fin, batch_format="pyarrow")
    )


def _sql_geo_cte() -> str:
    from ...functions import geo

    return (
        f"g AS (SELECT doc_id, {geo.SQL_LAT_E6} AS lat_e6, "
        f"{geo.SQL_LON_E6} AS lon_e6 FROM documents)"
    )


def _sql_geotile_grid() -> str:
    from ...functions import geo

    x, y = geo.sql_geotile_xy(_GEO_ZOOM)
    return (
        f"WITH {_sql_geo_cte()}, "
        f"t AS (SELECT {x} AS tile_x, {y} AS tile_y, lat_e6, lon_e6 FROM g) "
        "SELECT tile_x, tile_y, count(*) AS n, "
        "(CAST(sum(lat_e6 + 85000000) // count(*) AS BIGINT) - 85000000) "
        "/ 1e6 AS centroid_lat, "
        "(CAST(sum(lon_e6 + 180000000) // count(*) AS BIGINT) - 180000000) "
        "/ 1e6 AS centroid_lon "
        "FROM t GROUP BY 1, 2"
    )


def q_geo_distance_topk(sf_dir: str):
    """ES ``geo_distance`` sort: haversine km from every document's
    synthetic coordinate to a pinned origin, global 50 nearest.  The
    formula is written operation-for-operation identically in numpy and
    the SQL oracle and distances are rounded to 1e-6 km on both sides
    before ranking (ties then break on doc_id).  Per-batch top-k
    combiner -> tiny driver-side merge; no global sort."""
    from ...functions import geo

    k = _GEO_TOPK
    lat0, lon0 = _GEO_ORIGIN

    def part(batch: pa.Table) -> pa.Table:
        lat, lon = _synth_geo(batch)
        d = np.round(geo.haversine_km(lat, lon, lat0, lon0), 6)
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, d))[:k]
        return pa.table({
            "doc_id": pa.array(doc[order], pa.int64()),
            "dist_km": pa.array(d[order], pa.float64()),
        })

    parts = (
        _docs(sf_dir, ["doc_id"])
        .map_batches(part, batch_format="pyarrow")
        .to_pandas()
    )
    out = parts.sort_values(["dist_km", "doc_id"], kind="mergesort").head(k)
    out = out.reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int32)
    return out[["rank", "doc_id", "dist_km"]]


def _sql_geo_distance_topk() -> str:
    from ...functions import geo

    lat0, lon0 = _GEO_ORIGIN
    return (
        f"WITH {_sql_geo_cte()}, "
        f"d AS (SELECT doc_id, round({geo.sql_haversine_km(lat0, lon0)}, 6) "
        "AS dist_km FROM g) "
        "SELECT rank, doc_id, dist_km FROM ("
        "SELECT doc_id, dist_km, CAST(row_number() OVER ("
        "ORDER BY dist_km, doc_id) AS INTEGER) AS rank FROM d) "
        f"WHERE rank <= {_GEO_TOPK}"
    )


# bbox in micro-degrees: pure integer comparisons, exact on both engines
_GEO_BBOX = (10_000_000, 55_000_000, -30_000_000, 60_000_000)


_GEO_POLY = (   # convex CCW pentagon, micro-degrees (lon, lat)
    (-60_000_000, -20_000_000),
    (20_000_000, -60_000_000),
    (80_000_000, 0),
    (40_000_000, 55_000_000),
    (-40_000_000, 45_000_000),
)


def q_geo_polygon_count(sf_dir: str):
    """ES ``geo_polygon`` filter: documents whose synthetic coordinate
    lies inside a pinned CONVEX CCW pentagon, counted per lang.  The
    containment test is the all-edges cross-product sign check
    ``(x2-x1)*(py-y1) - (y2-y1)*(px-x1) >= 0`` in pure int64
    micro-degrees (products < 2^63) — exact on both engines, no float
    anywhere; boundary points count as inside (>= 0 pinned)."""

    def part(batch: pa.Table) -> pa.Table:
        lat, lon = _synth_geo(batch)
        inside = np.ones(lat.size, dtype=bool)
        n = len(_GEO_POLY)
        for i in range(n):
            x1, y1 = _GEO_POLY[i]
            x2, y2 = _GEO_POLY[(i + 1) % n]
            inside &= (
                (x2 - x1) * (lat - y1) - (y2 - y1) * (lon - x1)
            ) >= 0
        t = pa.table({"lang": batch["lang"].filter(pa.array(inside))})
        agg = t.group_by("lang").aggregate([([], "count_all")])
        return agg.rename_columns(["lang", "n_p"])

    return (
        _docs(sf_dir, ["doc_id", "lang"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_p", alias_name="n"))
        .sort("lang")
    )


def _sql_geo_polygon_count() -> str:
    n = len(_GEO_POLY)
    conds = []
    for i in range(n):
        x1, y1 = _GEO_POLY[i]
        x2, y2 = _GEO_POLY[(i + 1) % n]
        conds.append(
            f"({x2} - {x1}) * (g.lat_e6 - {y1}) "
            f"- ({y2} - {y1}) * (g.lon_e6 - {x1}) >= 0"
        )
    return (
        f"WITH {_sql_geo_cte()} "
        "SELECT d.lang, count(*) AS n FROM g "
        "JOIN documents d USING (doc_id) "
        "WHERE " + " AND ".join(conds) + " GROUP BY 1 ORDER BY 1"
    )


def q_geo_bbox_count(sf_dir: str):
    """ES ``geo_bounding_box`` filter + terms agg: documents whose
    synthetic coordinate falls in a pinned lat/lon box, counted per
    source.  Every comparison is int64 micro-degrees — no float appears
    anywhere, so the check is exact, not policy-rounded."""
    lat_lo, lat_hi, lon_lo, lon_hi = _GEO_BBOX

    def part(batch: pa.Table) -> pa.Table:
        lat, lon = _synth_geo(batch)
        m = (lat >= lat_lo) & (lat < lat_hi) & (lon >= lon_lo) & (lon < lon_hi)
        t = pa.table({"source": batch["source"].filter(pa.array(m))})
        agg = t.group_by("source").aggregate([([], "count_all")])
        return agg.rename_columns(["source", "n_p"])

    return (
        _docs(sf_dir, ["doc_id", "source"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_p", alias_name="n"))
    )


def _sql_geo_bbox_count() -> str:
    lat_lo, lat_hi, lon_lo, lon_hi = _GEO_BBOX
    return (
        f"WITH {_sql_geo_cte()} "
        "SELECT d.source, count(*) AS n FROM g JOIN documents d USING (doc_id) "
        f"WHERE g.lat_e6 >= {lat_lo} AND g.lat_e6 < {lat_hi} "
        f"AND g.lon_e6 >= {lon_lo} AND g.lon_e6 < {lon_hi} "
        "GROUP BY 1"
    )


# ------------------------- has_child / terms-lookup (ES join-field queries)

_CHILD_WINDOW = 8
_CHILD_TERMS = ["hash", "join", "window"]
_CHILD_TOPK = 20


def q_has_child_topk(sf_dir: str):
    """ES ``has_child`` query with ``score_mode=max``: children are the
    8-token windows of each document (the join-field model: parent doc,
    child passages), a child matches when it contains a query term, its
    score is the count of DISTINCT query terms present (integer — exact,
    no float policy), and the parent takes (max child score, number of
    matching children).  Each parent lives entirely inside one input row,
    so one vectorized map_batches computes final per-parent rows; only
    the per-batch top-k survives to the driver."""
    from ...functions.tokenizer import term_position_table

    qset = pa.array(_CHILD_TERMS, pa.string())
    k = _CHILD_TOPK

    def part(batch: pa.Table) -> pa.Table:
        occ, _dl = term_position_table(batch["text"], batch["doc_id"])
        m = pc.is_in(occ["term"], value_set=qset)
        hit = occ.filter(m)
        sent = pc.cast(
            pc.divide(pc.cast(hit["pos"], pa.int64()), _CHILD_WINDOW),
            pa.int64(),
        )
        tri = pa.table(
            {"doc_id": hit["doc_id"], "sent_id": sent, "term": hit["term"]}
        )
        # distinct query terms per (doc, child window)
        dt = tri.group_by(["doc_id", "sent_id", "term"]).aggregate([])
        cs = dt.group_by(["doc_id", "sent_id"]).aggregate([([], "count_all")])
        par = cs.group_by("doc_id").aggregate(
            [("count_all", "max"), ([], "count_all")]
        ).rename_columns(["doc_id", "score", "n_children"])
        d = par["doc_id"].to_numpy(zero_copy_only=False)
        s = par["score"].to_numpy(zero_copy_only=False)
        nc = par["n_children"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, -nc, -s))[:k]
        return pa.table({
            "doc_id": pa.array(d[order], pa.int64()),
            "score": pa.array(s[order], pa.int64()),
            "n_children": pa.array(nc[order], pa.int64()),
        })

    parts = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(part, batch_format="pyarrow")
        .to_pandas()
    )
    out = parts.sort_values(
        ["score", "n_children", "doc_id"],
        ascending=[False, False, True],
        kind="mergesort",
    ).head(k).reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int32)
    return out[["rank", "doc_id", "score", "n_children"]]


def _sql_has_child_topk() -> str:
    w = _CHILD_WINDOW
    vals = ", ".join(f"('{t}')" for t in _CHILD_TERMS)
    return (
        "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS ts FROM documents), "
        "tok AS (SELECT doc_id, unnest(ts) AS term, "
        f"CAST((unnest(range(1, len(ts) + 1)) - 1) // {w} AS BIGINT) "
        "AS sent_id FROM d), "
        f"q(term) AS (VALUES {vals}), "
        "cs AS (SELECT doc_id, sent_id, count(DISTINCT tok.term) AS s "
        "FROM tok JOIN q ON tok.term = q.term GROUP BY 1, 2), "
        "par AS (SELECT doc_id, max(s) AS score, count(*) AS n_children "
        "FROM cs GROUP BY 1) "
        "SELECT rank, doc_id, score, n_children FROM ("
        "SELECT doc_id, score, n_children, CAST(row_number() OVER ("
        "ORDER BY score DESC, n_children DESC, doc_id) AS INTEGER) AS rank "
        f"FROM par) WHERE rank <= {_CHILD_TOPK}"
    )


_LOOKUP_DOC = 0
_LOOKUP_TOPK = 30


def q_terms_lookup_topk(sf_dir: str):
    """ES terms-lookup query: the term set is fetched from a LOOKUP
    DOCUMENT's field at query time (one pruned point-read on the
    driver — the broadcast-small-side pattern), then every other
    document is scored by how many distinct lookup terms it contains
    (integer hits — exact).  Per-batch distinct-containment is one
    Arrow group_by; only per-batch top-k reaches the driver."""
    path = os.path.join(sf_dir, "documents.parquet")
    lk = pq.read_table(
        path, columns=["doc_id", "text"],
        filters=[("doc_id", "==", _LOOKUP_DOC)],
    )
    toks = [x for x in lk["text"][0].as_py().split(" ") if x]
    qset = pa.array(sorted(set(toks)), pa.string())
    k = _LOOKUP_TOPK

    def part(batch: pa.Table) -> pa.Table:
        terms, row_idx, _dl = flatten_tokens(batch["text"])
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        m = pc.is_in(terms, value_set=qset)
        t = pa.table({
            "doc_id": pa.array(doc[row_idx], pa.int64()),
            "term": terms,
        }).filter(m)
        dt = t.group_by(["doc_id", "term"]).aggregate([])
        hits = dt.group_by("doc_id").aggregate([([], "count_all")])
        d = hits["doc_id"].to_numpy(zero_copy_only=False)
        h = hits["count_all"].to_numpy(zero_copy_only=False)
        keep = d != _LOOKUP_DOC
        d, h = d[keep], h[keep]
        order = np.lexsort((d, -h))[:k]
        return pa.table({
            "doc_id": pa.array(d[order], pa.int64()),
            "hits": pa.array(h[order], pa.int64()),
        })

    parts = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(part, batch_format="pyarrow")
        .to_pandas()
    )
    out = parts.sort_values(
        ["hits", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(k).reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int32)
    return out[["rank", "doc_id", "hits"]]


SQL_TERMS_LOOKUP_TOPK = (
    "WITH lk AS (SELECT DISTINCT unnest(list_filter(string_split(text, ' '), "
    f"x -> x <> '')) AS term FROM documents WHERE doc_id = {_LOOKUP_DOC}), "
    "tok AS (SELECT DISTINCT doc_id, term FROM ("
    "SELECT doc_id, unnest(list_filter(string_split(text, ' '), "
    "x -> x <> '')) AS term FROM documents "
    f"WHERE doc_id <> {_LOOKUP_DOC})), "
    "h AS (SELECT doc_id, count(*) AS hits FROM tok "
    "JOIN lk ON tok.term = lk.term GROUP BY 1) "
    "SELECT rank, doc_id, hits FROM ("
    "SELECT doc_id, hits, CAST(row_number() OVER ("
    "ORDER BY hits DESC, doc_id) AS INTEGER) AS rank FROM h) "
    f"WHERE rank <= {_LOOKUP_TOPK}"
)


# ----------------------------------- TPC-H Q6/Q4, transitions, centroids

_Q6_LO = "1996-01-01"
_Q6_HI = "1997-01-01"


def q_tpch_q6(sf_dir: str):
    """TPC-H Q6 (forecasting revenue change): one filtered scan, no join,
    no shuffle beyond the scalar reduce — the pure predicate+arithmetic
    benchmark.  All three predicates run vectorized in Arrow before any
    multiplication; only (revenue, n) partials leave each batch."""
    lo = np.datetime64(_Q6_LO, "us")
    hi = np.datetime64(_Q6_HI, "us")

    def part(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"]
        m = pc.and_(
            pc.and_(
                pc.greater_equal(ship, pa.scalar(lo, pa.timestamp("us"))),
                pc.less(ship, pa.scalar(hi, pa.timestamp("us"))),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(batch["l_discount"], 0.05),
                    pc.less_equal(batch["l_discount"], 0.07),
                ),
                pc.less(batch["l_quantity"], 24.0),
            ),
        )
        f = batch.filter(m)
        rev = pc.sum(pc.multiply(f["l_extendedprice"], f["l_discount"]))
        return pa.table({
            "rev_p": pa.array([rev.as_py() or 0.0], pa.float64()),
            "n_p": pa.array([f.num_rows], pa.int64()),
        })

    agg = (
        read_table(
            sf_dir, "lineitem",
            ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        )
        .map_batches(part, batch_format="pyarrow")
        .aggregate(Sum("rev_p", alias_name="r"), Sum("n_p", alias_name="n"))
    )
    return pd.DataFrame({
        "revenue": [np.round(float(agg["r"]), 2)],
        "n": np.array([int(agg["n"])], dtype=np.int64),
    })


SQL_TPCH_Q6 = (
    "SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, "
    "count(*) AS n FROM lineitem "
    f"WHERE l_shipdate >= TIMESTAMP '{_Q6_LO}' "
    f"AND l_shipdate < TIMESTAMP '{_Q6_HI}' "
    "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
)


_Q4_LO = "1996-07-01"
_Q4_HI = "1996-10-01"
_Q4_QTY = 45.0


def q_tpch_q4(sf_dir: str):
    """TPC-H Q4 (order-priority checking), adapted to the driver's
    column subset: the EXISTS lineitem predicate is ``l_quantity > 45``
    (the schema carries no commit/receipt dates).  The scale shape is
    the canonical distributed semi-join: both sides filter at the read,
    then ``left_semi`` hash join on orderkey (no broadcast — the match
    set is |filtered lineitem| and unbounded), then a tiny priority
    tally."""
    lo = np.datetime64(_Q4_LO, "us")
    hi = np.datetime64(_Q4_HI, "us")
    n_cpu = int(ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(8, n_cpu // 2))

    orders = read_table(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(
                    b["o_orderdate"], pa.scalar(lo, pa.timestamp("us"))
                ),
                pc.less(b["o_orderdate"], pa.scalar(hi, pa.timestamp("us"))),
            )
        ).select(["o_orderkey", "o_orderpriority"]),
        batch_format="pyarrow",
    )
    line = read_table(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        lambda b: b.filter(pc.greater(b["l_quantity"], _Q4_QTY)).select(
            ["l_orderkey"]
        ),
        batch_format="pyarrow",
    )
    # guard the shuffle join against schema-less empty blocks (see tpch_q5)
    orders = orders.repartition(nparts)
    line = line.repartition(nparts)
    sj = orders.join(
        line, "left_semi", num_partitions=nparts,
        on=("o_orderkey",), right_on=("l_orderkey",),
    )
    return (
        sj.groupby("o_orderpriority").aggregate(Count(alias_name="n"))
    )


SQL_TPCH_Q4 = (
    "SELECT o_orderpriority, count(*) AS n FROM orders "
    f"WHERE o_orderdate >= TIMESTAMP '{_Q4_LO}' "
    f"AND o_orderdate < TIMESTAMP '{_Q4_HI}' "
    "AND EXISTS (SELECT 1 FROM lineitem "
    f"WHERE l_orderkey = o_orderkey AND l_quantity > {_Q4_QTY}) "
    "GROUP BY 1"
)


def q_events_transitions(sf_dir: str):
    """First-order Markov transition counts over per-user event streams
    (the sequence-modeling dataset prep shape): each user's events are
    ordered by (ts, event_id), consecutive (event_type -> next) bigrams
    are counted per user inside sorted ``map_groups`` (user cardinality
    scales out), then one tiny (cur, nxt) groupby merges users."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        et = g["event_type"].to_numpy()
        if len(et) < 2:
            return pd.DataFrame({"cur": [], "nxt": [], "n_p": []}).astype(
                {"cur": str, "nxt": str, "n_p": np.int64}
            )
        d = pd.DataFrame({"cur": et[:-1], "nxt": et[1:]})
        out = d.groupby(["cur", "nxt"], as_index=False).size()
        out.columns = ["cur", "nxt", "n_p"]
        out["n_p"] = out["n_p"].astype(np.int64)
        return out

    return (
        read_table(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
        .groupby("user_id")
        .map_groups(pairs, batch_format="pandas")
        .groupby(["cur", "nxt"])
        .aggregate(Sum("n_p", alias_name="n"))
    )


SQL_EVENTS_TRANSITIONS = (
    "SELECT cur, nxt, count(*) AS n FROM ("
    "SELECT event_type AS cur, lead(event_type) OVER ("
    "PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events) "
    "WHERE nxt IS NOT NULL GROUP BY 1, 2"
)


_EMB_DIM = 64


def q_label_centroid_cosine(sf_dir: str):
    """Pairwise cosine similarity between per-label embedding centroids
    (the class-separability diagnostic run before curriculum / semdedup
    decisions).  The distributed pass reduces each batch to one
    (label, sum-vector, count) row — numpy matmul-free row adds — so the
    exchange carries |labels| x |batches| rows; centroids, norms and the
    10x10 cosine matrix are driver-side arithmetic.  Floats are cast
    float32->float64 BEFORE summing (matching ``embedding::DOUBLE[]``)
    and the cosine is rounded to 1e-6 on both engines."""
    d = _EMB_DIM

    def part(batch: pa.Table) -> pa.Table:
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        arr = batch["embedding"].combine_chunks()
        vals = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        mat = vals.reshape(len(lab), d)
        ulab = np.unique(lab)
        sums = np.zeros((len(ulab), d))
        cnts = np.zeros(len(ulab), dtype=np.int64)
        for i, u in enumerate(ulab):
            m = lab == u
            sums[i] = mat[m].sum(axis=0)
            cnts[i] = int(m.sum())
        return pa.table({
            "label": pa.array(ulab, pa.int64()),
            "svec": pa.array(list(sums), pa.list_(pa.float64(), d)),
            "cnt": pa.array(cnts, pa.int64()),
        })

    parts = (
        read_table(sf_dir, "embeddings", ["label", "embedding"])
        .map_batches(part, batch_format="pyarrow")
        .to_pandas()
    )
    labels = np.sort(parts["label"].unique())
    cents = {}
    for u in labels:
        g = parts[parts["label"] == u]
        s = np.sum(np.stack(g["svec"].to_numpy()), axis=0)
        cents[u] = s / g["cnt"].sum()
    rows = []
    for i, la in enumerate(labels):
        for lb in labels[i + 1:]:
            a, b = cents[la], cents[lb]
            cos = float(np.dot(a, b)) / (
                float(np.sqrt(np.dot(a, a))) * float(np.sqrt(np.dot(b, b)))
            )
            rows.append((int(la), int(lb), np.round(cos, 6)))
    return pd.DataFrame(rows, columns=["label_a", "label_b", "cosine"]).astype(
        {"label_a": np.int64, "label_b": np.int64, "cosine": np.float64}
    )


SQL_LABEL_CENTROID_COSINE = (
    "WITH e AS (SELECT CAST(label AS BIGINT) AS label, "
    "unnest(embedding::DOUBLE[]) AS v, "
    f"unnest(range(1, {_EMB_DIM + 1})) AS dim FROM embeddings), "
    "c AS (SELECT label, dim, sum(v) / count(*) AS cv FROM e GROUP BY 1, 2), "
    "nn AS (SELECT label, sum(cv * cv) AS n2 FROM c GROUP BY 1), "
    "j AS (SELECT a.label AS label_a, b.label AS label_b, "
    "sum(a.cv * b.cv) AS dot FROM c a JOIN c b ON a.dim = b.dim "
    "AND a.label < b.label GROUP BY 1, 2) "
    "SELECT j.label_a, j.label_b, "
    "round(j.dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS cosine "
    "FROM j JOIN nn na ON na.label = j.label_a "
    "JOIN nn nb ON nb.label = j.label_b"
)


def q_bm25_fetch_fields(sf_dir: str):
    """The ES query-then-fetch split made explicit: phase 1 ranks over
    the compressed index (doc ids + scores only — the index stores no
    document fields); phase 2 fetches (source, n_chars) for just the
    k x |queries| hit ids with a predicate-pushdown parquet point read
    (row groups that contain no hit never leave storage).  At cluster
    scale the hit set broadcasts to fetch tasks partitioned by doc
    range; here one pruned read suffices (<=80 ids)."""
    idx = _build_docs_index(sf_dir)
    res = search(idx, _query_terms_ds(_BM25_QUERIES), k=20, concurrency=2).to_pandas()
    hits = _rerank_rounded(res, k=10)
    ids = sorted(set(hits["doc_id"].tolist()))
    fields = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "n_chars"],
        filters=[("doc_id", "in", ids)],
    ).to_pandas()
    out = hits.merge(fields, on="doc_id", how="left")
    return out[["query_id", "rank", "doc_id", "score", "source", "n_chars"]]


def _sql_bm25_fetch_fields() -> str:
    base = _bm25_sql(_BM25_QUERIES)
    return (
        f"WITH hits AS ({base}) "
        "SELECT h.query_id, h.rank, h.doc_id, h.score, d.source, d.n_chars "
        "FROM hits h JOIN documents d ON d.doc_id = h.doc_id"
    )


# -------------------------------- cumulative pipeline agg / geo rings

def q_events_cumulative(sf_dir: str):
    """ES ``cumulative_sum`` pipeline aggregation: the running total
    over the daily event-count histogram.  Corpus pass reduces to one
    row per (day, batch); the cumulative window runs over the |days|-row
    series — integer sums, no float policy needed."""

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
    daily["cum_n"] = daily["n"].cumsum().astype(np.int64)
    return daily[["window_start", "n", "cum_n"]]


SQL_EVENTS_CUMULATIVE = (
    "SELECT window_start, n, CAST(sum(n) OVER (ORDER BY window_start "
    "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n FROM ("
    "SELECT date_trunc('day', ts) AS window_start, count(*) AS n "
    "FROM events GROUP BY 1)"
)


_GEO_RINGS = (2000.0, 5000.0, 10000.0)


def q_geo_distance_rings(sf_dir: str):
    """ES ``geo_distance`` ranges aggregation: documents bucketed into
    concentric distance rings around the pinned origin (0-2000 km,
    2000-5000, 5000-10000, 10000+), counted per ring.  The ring edges
    compare against the same haversine expression on both engines;
    rounding to 1e-6 km before the edge compare pins the (measure-zero)
    boundary cases to one side."""
    from ...functions import geo

    lat0, lon0 = _GEO_ORIGIN
    edges = np.array(_GEO_RINGS)

    def part(batch: pa.Table) -> pa.Table:
        lat, lon = _synth_geo(batch)
        d = np.round(geo.haversine_km(lat, lon, lat0, lon0), 6)
        # side='left': ring = count(edges < d), so d == edge stays in the
        # lower ring — matching the oracle's `dist <= edge` CASE arms
        ring = np.searchsorted(edges, d, side="left")
        t = pa.table({"ring": pa.array(ring.astype(np.int64), pa.int64())})
        agg = t.group_by("ring").aggregate([([], "count_all")])
        return agg.rename_columns(["ring", "n_p"])

    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("ring")
        .aggregate(Sum("n_p", alias_name="n"))
    )


def _sql_geo_distance_rings() -> str:
    from ...functions import geo

    lat0, lon0 = _GEO_ORIGIN
    e = _GEO_RINGS
    return (
        f"WITH {_sql_geo_cte()}, "
        f"d AS (SELECT round({geo.sql_haversine_km(lat0, lon0)}, 6) "
        "AS dist FROM g) "
        f"SELECT CASE WHEN dist <= {e[0]} THEN 0 "
        f"WHEN dist <= {e[1]} THEN 1 WHEN dist <= {e[2]} THEN 2 "
        "ELSE 3 END AS ring, count(*) AS n FROM d GROUP BY 1"
    )


# --------------------------------------------------- bloom-filtered join

_BLJ_LO = "1996-03-01"
_BLJ_HI = "1996-04-01"
_BLJ_PRI = "1-URGENT"


def q_bloom_join(sf_dir: str):
    """Bloom-filtered distributed join (the runtime-filter every big
    SQL engine applies before a selective fact-dimension join): the
    filtered orders side is tiny, so its orderkey set builds a 10-bit/key
    bloom broadcast once via ``ray.put``; the lineitem scan drops
    certainly-unmatched rows IN THE MAP STAGE (no false negatives =
    no lost rows), and only the surviving sliver enters the hash join.
    At 100 TB this turns an all-to-all of the fact table into an
    exchange of ~|matches| rows; false positives only cost the join a
    few extra probe rows."""
    from ...stages.bloom import int_bloom_build, int_bloom_maybe

    lo = np.datetime64(_BLJ_LO, "us")
    hi = np.datetime64(_BLJ_HI, "us")
    n_cpu = int(ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(8, n_cpu // 2))

    orders = read_table(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.and_(
                    pc.greater_equal(
                        b["o_orderdate"], pa.scalar(lo, pa.timestamp("us"))
                    ),
                    pc.less(b["o_orderdate"], pa.scalar(hi, pa.timestamp("us"))),
                ),
                pc.equal(b["o_orderpriority"], _BLJ_PRI),
            )
        ).select(["o_orderkey", "o_orderpriority"]),
        batch_format="pyarrow",
    )
    keys = orders.to_pandas()  # tiny filtered dimension side
    bits, m = int_bloom_build(keys["o_orderkey"].to_numpy())
    bref = ray.put((bits, m))

    def prefilter(b: pa.Table) -> pa.Table:
        bb, mm = ray.get(bref)
        ok = int_bloom_maybe(
            b["l_orderkey"].to_numpy(zero_copy_only=False), bb, mm
        )
        f = b.filter(pa.array(ok))
        rev = pc.multiply(
            f["l_extendedprice"], pc.subtract(1.0, f["l_discount"])
        )
        return pa.table({"l_orderkey": f["l_orderkey"], "rev": rev})

    line = read_table(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(prefilter, batch_format="pyarrow").repartition(nparts)
    odim = ray.data.from_pandas(keys).repartition(nparts)
    joined = line.join(
        odim, "inner", num_partitions=nparts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    out = (
        joined.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_items"), Sum("rev", alias_name="r"))
        .to_pandas()
    )
    out["revenue"] = np.round(out["r"], 2)
    return out[["o_orderpriority", "n_items", "revenue"]]


SQL_BLOOM_JOIN = (
    "SELECT o.o_orderpriority, count(*) AS n_items, "
    "round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue "
    "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey "
    f"WHERE o.o_orderdate >= TIMESTAMP '{_BLJ_LO}' "
    f"AND o.o_orderdate < TIMESTAMP '{_BLJ_HI}' "
    f"AND o.o_orderpriority = '{_BLJ_PRI}' "
    "GROUP BY 1"
)


# ------------------------------------------------------- segment split

def q_bm25_split_topk(sf_dir: str):
    """Index-lifecycle completeness: SPLIT (the inverse of compact) —
    the largest segment rewrites into two halves at its median doc id
    (one atomic manifest transition, standard codec path), and search
    over the split index must stay hash-identical to the unsplit
    oracle.  Own temp index (tag 'split') so the shared one is never
    mutated."""
    from ...sources import manifest as mf
    from ...stages.index_build import split_segment

    idx = _tmp_index_dir(sf_dir, "split")
    docs = _docs(sf_dir, ["doc_id", "text"])
    n = docs.count()
    marker = os.path.join(idx, "_SPLIT_DONE")
    build_index(docs, idx, seg_docs=max(256, n // 4), codec="varint", resume=True)
    if not os.path.exists(marker):
        before = len(mf.read_manifest(idx))
        out = split_segment(idx)
        assert out is not None
        after = len(mf.read_manifest(idx))
        assert after == before + 1  # two halves replace one input
        with open(marker + ".tmp", "w") as f:
            f.write("ok")
        os.replace(marker + ".tmp", marker)
    res = search(idx, _query_terms_ds(_BM25_QUERIES), k=20, concurrency=2).to_pandas()
    return _rerank_rounded(res, k=10)


# ------------------------------------------------ query clarity (QPP)

def q_query_clarity(sf_dir: str):
    """Query-performance prediction via the Clarity score
    (Cronen-Townsend et al., SIGIR 2002): KL divergence between the
    relevance language model (MLE mixture over the BM25 top-10) and the
    collection LM.  High clarity = focused result set; low = ambiguous
    query — the triage signal before spending reranker budget.  Phase 1
    is the ordinary bounded top-k; phase 2 point-reads just the hit
    docs' texts; the collection statistics pass streams only terms
    OCCURRING IN HIT DOCS (a broadcast needed-term filter) — never the
    full vocabulary."""
    idx = _build_docs_index(sf_dir)
    res = search(idx, _query_terms_ds(_BM25_QUERIES), k=20, concurrency=2).to_pandas()
    hits = _rerank_rounded(res, k=10)
    ids = sorted(set(hits["doc_id"].tolist()))
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filters=[("doc_id", "in", ids)],
    )
    tf_tbl, dl = term_count_table(docs["text"], docs["doc_id"])
    dl_map = dict(zip(docs["doc_id"].to_pylist(), dl.tolist()))
    tf_df = tf_tbl.to_pandas()
    needed = pa.array(sorted(set(tf_df["term"])), pa.string())

    def cf_part(batch: pa.Table) -> pa.Table:
        terms, _ri, dlens = flatten_tokens(batch["text"])
        m = pc.is_in(terms, value_set=needed)
        kept = pa.table({"term": terms}).filter(m)
        agg = kept.group_by("term").aggregate([([], "count_all")])
        agg = agg.rename_columns(["term", "cf_p"])
        # one extra row rides the same pass to carry the batch token
        # total (term key outside the tokenizer alphabet)
        tot = pa.table({
            "term": pa.array(["\x00total"], pa.string()),
            "cf_p": pa.array([int(dlens.sum())], pa.int64()),
        })
        return pa.concat_tables([agg, tot])

    cf = (
        _docs(sf_dir, ["text"])
        .map_batches(cf_part, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cf_p", alias_name="cf"))
        .to_pandas()
    )
    total = int(cf.loc[cf["term"] == "\x00total", "cf"].iloc[0])
    cf = cf[cf["term"] != "\x00total"]
    cf_map = dict(zip(cf["term"], cf["cf"].astype(np.int64)))

    out = []
    for qid, _terms in _BM25_QUERIES:
        hd = hits[hits["query_id"] == qid]["doc_id"].tolist()
        kq = len(hd)
        if kq == 0:
            out.append((qid, 0.0))
            continue
        sub = tf_df[tf_df["doc_id"].isin(hd)]
        pr: dict[str, float] = {}
        for term, g in sub.groupby("term"):
            s = float(
                (g["tf"].to_numpy(dtype=np.float64)
                 / np.array([dl_map[d] for d in g["doc_id"]], dtype=np.float64)
                 ).sum()
            )
            pr[term] = s / kq
        clarity = 0.0
        for term, p in pr.items():
            qc = cf_map[term] / float(total)
            clarity += p * np.log(p / qc)
        out.append((qid, np.round(clarity, 6)))
    return pd.DataFrame(out, columns=["query_id", "clarity"]).astype(
        {"query_id": np.int64, "clarity": np.float64}
    )


def _sql_query_clarity() -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
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
        "topk AS (SELECT query_id, doc_id FROM ("
        "SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
        "ORDER BY round(score, 6) DESC, doc_id) AS rank FROM scored) "
        "WHERE rank <= 10), "
        "kq AS (SELECT query_id, count(*) AS kq FROM topk GROUP BY 1), "
        "cfx AS (SELECT term, count(*) AS cf FROM toks GROUP BY term), "
        "pr AS (SELECT tk.query_id, tf.term, "
        "sum(tf.tf / CAST(dl.dl AS DOUBLE)) AS s "
        "FROM topk tk JOIN tf ON tf.doc_id = tk.doc_id "
        "JOIN dl ON dl.doc_id = tk.doc_id GROUP BY 1, 2), "
        "cl AS (SELECT pr.query_id, sum((pr.s / kq.kq) * "
        "ln((pr.s / kq.kq) / (cfx.cf / CAST(st.total AS DOUBLE)))) AS c "
        "FROM pr JOIN kq ON kq.query_id = pr.query_id "
        "JOIN cfx ON cfx.term = pr.term CROSS JOIN stats st GROUP BY 1) "
        "SELECT q2.query_id, coalesce(round(cl.c, 6), 0.0) AS clarity "
        "FROM (SELECT DISTINCT query_id FROM q) q2 "
        "LEFT JOIN cl ON cl.query_id = q2.query_id"
    )


def q_query_wig_nqc(sf_dir: str):
    """Two more post-retrieval query-performance predictors next to
    Clarity: WIG (weighted information gain — Zhou & Croft, SIGIR 2007)
    and NQC (normalized query commitment — Shtok, Kurland & Carmel,
    TOIS 2012), in PINNED simplified forms over the BM25 top-10 rounded
    scores: with mu = mean top-k score, s_C = sum of BM25 idf over the
    query's PRESENT distinct terms (the corpus-score stand-in) and
    |q| = distinct query terms (absent included),

        wig = (mu - s_C) / sqrt(|q|)
        nqc = sqrt(mean(s^2) - mu^2) / s_C

    High NQC (scores spread out below a strong leader) predicts an
    effective query; WIG compares the head of the ranking against the
    collection-level score mass.  Scale shape: one bounded top-k, one
    broadcast-filtered df pass (rows bounded by |query terms| per
    batch), driver math over k x queries rows."""
    idx = _build_docs_index(sf_dir)
    res = search(
        idx, _query_terms_ds(_BM25_QUERIES), k=20, concurrency=2
    ).to_pandas()
    topk = _rerank_rounded(res, k=10)
    qterms = sorted({t for _, ts in _BM25_QUERIES for t in ts})
    needed = pa.array(qterms, pa.string())

    def df_part(batch: pa.Table) -> pa.Table:
        tf, dl = term_count_table(batch["text"], batch["doc_id"])
        kept = tf.filter(pc.is_in(tf["term"], value_set=needed))
        agg = pa.table({"term": kept["term"]}).group_by("term").aggregate(
            [([], "count_all")]
        ).rename_columns(["term", "df_p"])
        tot = pa.table({
            "term": pa.array(["\x00ndocs"], pa.string()),
            "df_p": pa.array([int((dl > 0).sum())], pa.int64()),
        })
        return pa.concat_tables([agg, tot])

    dfs = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(df_part, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df_p", alias_name="df"))
        .to_pandas()
    )
    n_docs = int(dfs.loc[dfs["term"] == "\x00ndocs", "df"].iloc[0])
    dfmap = {
        t: int(d)
        for t, d in zip(dfs["term"], dfs["df"])
        if t != "\x00ndocs"
    }
    out_q, out_w, out_n = [], [], []
    for qid, terms in _BM25_QUERIES:
        g = topk[topk["query_id"] == qid]
        if not len(g):
            continue
        uniq = sorted(set(terms))
        s_c = sum(
            math.log(
                1.0 + (n_docs - dfmap[t] + 0.5) / (dfmap[t] + 0.5)
            )
            for t in uniq
            if t in dfmap
        )
        s = g["score"].to_numpy(np.float64)
        kq = s.size
        mu = float(s.sum()) / kq
        var = float((s * s).sum()) / kq - mu * mu
        sigma = math.sqrt(max(var, 0.0))
        out_q.append(qid)
        out_w.append(round((mu - s_c) / math.sqrt(len(uniq)), 6))
        out_n.append(round(sigma / s_c, 6))
    return pd.DataFrame({"query_id": out_q, "wig": out_w, "nqc": out_n})


def _sql_query_wig_nqc() -> str:
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
        "scored AS (SELECT q.query_id, tf.doc_id, "
        "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
        "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
        ") AS score FROM q JOIN tf ON q.term = tf.term "
        "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id), "
        "topk AS (SELECT query_id, round(score, 6) AS sc FROM ("
        "SELECT query_id, score, row_number() OVER (PARTITION BY query_id "
        "ORDER BY round(score, 6) DESC, doc_id) AS rank FROM scored) "
        "WHERE rank <= 10), "
        "idf AS (SELECT qd.query_id, "
        "ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) AS idf "
        "FROM (SELECT DISTINCT query_id, term FROM q) qd "
        "JOIN df ON df.term = qd.term CROSS JOIN stats s), "
        "sc AS (SELECT query_id, sum(idf) AS s_c FROM idf GROUP BY 1), "
        "nt AS (SELECT query_id, count(DISTINCT term) AS nt FROM q "
        "GROUP BY 1), "
        "st2 AS (SELECT query_id, count(*) AS kq, sum(sc) AS ss, "
        "sum(sc * sc) AS sss FROM topk GROUP BY 1) "
        "SELECT st2.query_id, "
        "round((st2.ss / st2.kq - sc.s_c) / sqrt(nt.nt), 6) AS wig, "
        "round(sqrt(greatest(st2.sss / st2.kq - "
        "(st2.ss / st2.kq) * (st2.ss / st2.kq), 0)) / sc.s_c, 6) AS nqc "
        "FROM st2 JOIN sc USING (query_id) JOIN nt USING (query_id) "
        "ORDER BY st2.query_id"
    )


_REDDE_SHARDS = 4
_REDDE_SAMPLE_MOD = 8
_REDDE_N = 20


def q_federated_redde(sf_dir: str):
    """ReDDE resource selection for federated search (Si & Callan,
    SIGIR 2003): rank SHARDS (not documents) by estimated relevant-
    document mass, the step before fanning a query out to a subset of
    a partitioned corpus.  Pinned layout: 4 doc-id-range shards
    (shard = doc_id * 4 // (max_doc_id + 1)); the central sample index
    (CSI) is the deterministic 1-in-8 slice doc_id % 8 == 0, indexed
    as its OWN small index (sample-local df/stats, exactly how a real
    CSI behaves).  Per query: BM25 top-20 over the CSI, then each
    sampled hit votes its shard's inverse sampling weight
    |shard| / |sampled(shard)|; shards rank by (estimate DESC, shard).

    Scale shape: the CSI build + search is 1/8th-corpus work; shard
    sizes come from one combiner groupby; everything else is
    k x queries rows on the driver."""
    # shard geometry from the full corpus
    docs_ids = _docs(sf_dir, ["doc_id"])
    mx = int(docs_ids.max("doc_id"))

    def shard_part(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        sh = did * _REDDE_SHARDS // (mx + 1)
        samp = (did % _REDDE_SAMPLE_MOD == 0).astype(np.int64)
        t = pa.table({
            "shard": pa.array(sh.astype(np.int64)),
            "n_p": pa.array(np.ones(did.size, dtype=np.int64)),
            "s_p": pa.array(samp),
        })
        return t.group_by("shard").aggregate(
            [("n_p", "sum"), ("s_p", "sum")]
        ).rename_columns(["shard", "n_p", "s_p"])

    geom = (
        docs_ids.map_batches(shard_part, batch_format="pyarrow")
        .groupby("shard")
        .aggregate(Sum("n_p", alias_name="n"), Sum("s_p", alias_name="ns"))
        .to_pandas()
    )
    weight = {
        int(r.shard): float(r.n) / float(r.ns)
        for r in geom.itertuples()
        if r.ns > 0
    }
    # CSI: its own index over the 1-in-8 slice
    idx = _tmp_index_dir(sf_dir, "idxcsi")

    def csi_filter(batch: pa.Table) -> pa.Table:
        # doc_id % 8 == 0 via the power-of-two mask (Arrow has no mod)
        return batch.filter(
            pc.equal(
                pc.bit_wise_and(batch["doc_id"], _REDDE_SAMPLE_MOD - 1), 0
            )
        )

    sample = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        csi_filter, batch_format="pyarrow"
    )
    build_index(sample, idx, seg_docs=256, resume=True)
    res = search(
        idx, _query_terms_ds(_BM25_QUERIES), k=2 * _REDDE_N, concurrency=2
    ).to_pandas()
    topn = _rerank_rounded(res, k=_REDDE_N)
    rows = []
    for qid, g in topn.groupby("query_id"):
        est: dict[int, float] = {}
        hits: dict[int, int] = {}
        for d in g["doc_id"]:
            sh = int(d) * _REDDE_SHARDS // (mx + 1)
            est[sh] = est.get(sh, 0.0) + weight[sh]
            hits[sh] = hits.get(sh, 0) + 1
        ranked = sorted(est, key=lambda s: (-round(est[s], 6), s))
        for rank, sh in enumerate(ranked, 1):
            rows.append((
                int(qid), rank, sh, round(est[sh], 6), hits[sh],
            ))
    return pd.DataFrame(
        rows,
        columns=["query_id", "rank", "shard", "estimate", "n_sample_hits"],
    ).astype({
        "query_id": "int64", "rank": "int64", "shard": "int64",
        "estimate": "float64", "n_sample_hits": "int64",
    })


def _sql_federated_redde() -> str:
    """Independent oracle: the exact-BM25 body restricted to the CSI
    slice (sample-local df/dl/N — its own WITH chain over
    ``doc_id % 8 = 0``), top-20 per query, shard vote with the
    |shard| / |sampled(shard)| weight from full-corpus counts."""
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    m, s_mod, n = _REDDE_SHARDS, _REDDE_SAMPLE_MOD, _REDDE_N
    return (
        "WITH mx AS (SELECT max(doc_id) AS m FROM documents), "
        "geom AS (SELECT doc_id * "
        f"{m} // (mx.m + 1) AS shard, "
        f"count(*) AS n, sum(CASE WHEN doc_id % {s_mod} = 0 THEN 1 "
        "ELSE 0 END) AS ns FROM documents CROSS JOIN mx GROUP BY 1), "
        "stoks AS (SELECT doc_id, unnest(list_filter(string_split(text, "
        f"' '), x -> x <> '')) AS term FROM documents WHERE doc_id % {s_mod} "
        "= 0), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM stoks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM stoks "
        "GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "scored AS (SELECT q.query_id, tf.doc_id, "
        "sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (tf.tf * 2.2) / "
        "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (s.total::DOUBLE / s.n_docs)))"
        ") AS score FROM q JOIN tf ON q.term = tf.term "
        "JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id), "
        "topn AS (SELECT query_id, doc_id FROM ("
        "SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
        "ORDER BY round(score, 6) DESC, doc_id) AS rank FROM scored) "
        f"WHERE rank <= {n}), "
        "votes AS (SELECT t.query_id, "
        f"t.doc_id * {m} // (mx.m + 1) AS shard "
        "FROM topn t CROSS JOIN mx), "
        "est AS (SELECT v.query_id, v.shard, "
        "sum(g.n::DOUBLE / g.ns) AS estimate, count(*) AS n_sample_hits "
        "FROM votes v JOIN geom g ON g.shard = v.shard GROUP BY 1, 2) "
        "SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id "
        "ORDER BY round(estimate, 6) DESC, shard) AS BIGINT) AS rank, "
        "shard, round(estimate, 6) AS estimate, n_sample_hits "
        "FROM est ORDER BY query_id, rank"
    )


def q_federated_cori(sf_dir: str):
    """CORI resource ranking (Callan, Lu & Croft, SIGIR 1995) — the
    inference-network alternative to ReDDE's sample-vote: shards rank
    by df-based belief, no central sample index at all.  Same pinned
    4-shard doc-id-range geometry; per shard s and query term t,

        T = df / (df + 50 + 150 * cw_s / avg_cw)
        I = ln((|S| + 0.5) / R_t) / ln(|S| + 1.0)
        p(t|s) = 0.4 + 0.6 * T * I

    with cw_s = shard token count, R_t = shards containing t; the
    query's shard score is the MEAN p over its distinct terms with
    R_t > 0 (an everywhere-absent term carries no signal; a query with
    no present terms drops).  One broadcast-filtered combiner pass
    carries (shard, term) df partials for the query vocabulary plus a
    per-shard token-total sentinel — |shards| x |query terms| rows
    total, no sampling, no search."""
    qterms = sorted({t for _, ts in _BM25_QUERIES for t in ts})
    needed = pa.array(qterms, pa.string())
    docs_ids = _docs(sf_dir, ["doc_id"])
    mx = int(docs_ids.max("doc_id"))

    def part(batch: pa.Table) -> pa.Table:
        tf, dl = term_count_table(batch["text"], batch["doc_id"])
        did_all = batch["doc_id"].to_numpy()
        sh_all = did_all * _REDDE_SHARDS // (mx + 1)
        kept = tf.filter(pc.is_in(tf["term"], value_set=needed))
        did = kept["doc_id"].to_numpy()
        sh = (did * _REDDE_SHARDS // (mx + 1)).astype(np.int64)
        t1 = pa.table({
            "shard": pa.array(sh),
            "term": kept["term"],
        }).group_by(["shard", "term"]).aggregate([([], "count_all")])
        t1 = t1.rename_columns(["shard", "term", "df_p"])
        # per-shard token totals ride as sentinel term rows
        t2 = pa.table({
            "shard": pa.array(np.arange(_REDDE_SHARDS, dtype=np.int64)),
            "term": pa.array(["\x00cw"] * _REDDE_SHARDS, pa.string()),
            "df_p": pa.array(
                [
                    int(dl[sh_all == s].sum())
                    for s in range(_REDDE_SHARDS)
                ],
                pa.int64(),
            ),
        })
        return pa.concat_tables([
            pa.table({
                "shard": t1["shard"],
                "term": t1["term"],
                "df_p": pc.cast(t1["df_p"], pa.int64()),
            }),
            t2,
        ])

    st = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(part, batch_format="pyarrow")
        .groupby(["shard", "term"])
        .aggregate(Sum("df_p", alias_name="df"))
        .to_pandas()
    )
    cw = {
        int(r.shard): int(r.df)
        for r in st[st["term"] == "\x00cw"].itertuples()
    }
    avg_cw = sum(cw.values()) / len(cw)
    dfst = {
        (int(r.shard), r.term): int(r.df)
        for r in st[st["term"] != "\x00cw"].itertuples()
    }
    n_shards = _REDDE_SHARDS
    r_t = {
        t: sum(1 for s in range(n_shards) if (s, t) in dfst)
        for t in qterms
    }
    rows = []
    for qid, terms in _BM25_QUERIES:
        present = [t for t in sorted(set(terms)) if r_t.get(t, 0) > 0]
        if not present:
            continue
        scores = {}
        for s in range(n_shards):
            ps = []
            for t in present:
                df = dfst.get((s, t), 0)
                tt = df / (df + 50.0 + 150.0 * cw[s] / avg_cw)
                ii = math.log((n_shards + 0.5) / r_t[t]) / math.log(
                    n_shards + 1.0
                )
                ps.append(0.4 + 0.6 * tt * ii)
            scores[s] = sum(ps) / len(ps)
        ranked = sorted(scores, key=lambda s: (-round(scores[s], 6), s))
        for rank, s in enumerate(ranked, 1):
            rows.append((qid, rank, s, round(scores[s], 6)))
    return pd.DataFrame(
        rows, columns=["query_id", "rank", "shard", "belief"]
    ).astype({
        "query_id": "int64", "rank": "int64", "shard": "int64",
        "belief": "float64",
    })


def _sql_federated_cori() -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    m = _REDDE_SHARDS
    return (
        "WITH mx AS (SELECT max(doc_id) AS m FROM documents), "
        "toks AS (SELECT doc_id, unnest(list_filter(string_split(text, "
        "' '), x -> x <> '')) AS term FROM documents), "
        f"sh AS (SELECT doc_id, doc_id * {m} // (mx.m + 1) AS shard "
        "FROM documents CROSS JOIN mx), "
        "cw AS (SELECT sh.shard, count(*) AS cw FROM toks "
        "JOIN sh ON sh.doc_id = toks.doc_id GROUP BY 1), "
        "acw AS (SELECT avg(cw) AS avg_cw FROM cw), "
        "tfd AS (SELECT sh.shard, toks.term, toks.doc_id FROM toks "
        "JOIN sh ON sh.doc_id = toks.doc_id GROUP BY 1, 2, 3), "
        "dfs AS (SELECT shard, term, count(*) AS df FROM tfd "
        "GROUP BY 1, 2), "
        "rt AS (SELECT term, count(*) AS r FROM dfs GROUP BY term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "qd AS (SELECT DISTINCT query_id, term FROM q), "
        "shards AS (SELECT DISTINCT shard FROM sh), "
        "p AS (SELECT qd.query_id, shards.shard, "
        "0.4 + 0.6 * (coalesce(dfs.df, 0) / (coalesce(dfs.df, 0) + 50.0 "
        "+ 150.0 * cw.cw / acw.avg_cw)) * "
        f"(ln(({m} + 0.5) / rt.r) / ln({m} + 1.0)) AS p "
        "FROM qd JOIN rt ON rt.term = qd.term CROSS JOIN shards "
        "LEFT JOIN dfs ON dfs.shard = shards.shard AND dfs.term = qd.term "
        "JOIN cw ON cw.shard = shards.shard CROSS JOIN acw), "
        "belief AS (SELECT query_id, shard, sum(p) / count(*) AS b "
        "FROM p GROUP BY 1, 2) "
        "SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id "
        "ORDER BY round(b, 6) DESC, shard) AS BIGINT) AS rank, shard, "
        "round(b, 6) AS belief FROM belief ORDER BY query_id, rank"
    )


_SEL_SHARDS = 2


def q_selective_search_topk(sf_dir: str):
    """Selective search (Kulkarni & Callan, CIKM 2010 / TOIS 2015):
    the full architecture — topical/range shards + ReDDE resource
    selection + query fan-out to ONLY the selected shards — composed
    from this engine's own pieces: the 4 doc-id-range shards are built
    as a routed index (stages/routing.py, one bounded partition per
    shard with SHARD-LOCAL stats, the routing entry's semantics), the
    CSI/vote step is q_federated_redde's (shared pinned geometry and
    the resumable 1-in-8 CSI index), each query fans out to its TOP-2
    shards only, and the two shard result lists merge on the usual
    (round(score, 6) DESC, doc_id) policy — shards are disjoint, so
    the merge is collision-free.  At 10^12 docs this is the shape that
    answers a query while opening 2/4 (generally O(1)/O(shards)) of
    the corpus."""
    from ...stages.routing import build_routed_index, routed_search

    docs_ids = _docs(sf_dir, ["doc_id"])
    mx = int(docs_ids.max("doc_id"))

    def shard_part(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        sh = did * _REDDE_SHARDS // (mx + 1)
        samp = (did % _REDDE_SAMPLE_MOD == 0).astype(np.int64)
        t = pa.table({
            "shard": pa.array(sh.astype(np.int64)),
            "n_p": pa.array(np.ones(did.size, dtype=np.int64)),
            "s_p": pa.array(samp),
        })
        return t.group_by("shard").aggregate(
            [("n_p", "sum"), ("s_p", "sum")]
        ).rename_columns(["shard", "n_p", "s_p"])

    geom = (
        docs_ids.map_batches(shard_part, batch_format="pyarrow")
        .groupby("shard")
        .aggregate(Sum("n_p", alias_name="n"), Sum("s_p", alias_name="ns"))
        .to_pandas()
    )
    weight = {
        int(r.shard): float(r.n) / float(r.ns)
        for r in geom.itertuples()
        if r.ns > 0
    }
    idx = _tmp_index_dir(sf_dir, "idxcsi")

    def csi_filter(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.equal(
                pc.bit_wise_and(batch["doc_id"], _REDDE_SAMPLE_MOD - 1), 0
            )
        )

    sample = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        csi_filter, batch_format="pyarrow"
    )
    build_index(sample, idx, seg_docs=256, resume=True)
    topn = _rerank_rounded(
        search(
            idx, _query_terms_ds(_BM25_QUERIES), k=2 * _REDDE_N,
            concurrency=2,
        ).to_pandas(),
        k=_REDDE_N,
    )
    sel: dict[int, list[int]] = {}
    for qid, g in topn.groupby("query_id"):
        est: dict[int, float] = {}
        for d in g["doc_id"]:
            sh = int(d) * _REDDE_SHARDS // (mx + 1)
            est[sh] = est.get(sh, 0.0) + weight[sh]
        ranked = sorted(est, key=lambda s: (-round(est[s], 6), s))
        sel[int(qid)] = ranked[:_SEL_SHARDS]

    def add_shard(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy()
        sh = did * _REDDE_SHARDS // (mx + 1)
        lab = np.char.add("s", sh.astype(np.int64).astype(str))
        return batch.append_column("shard", pa.array(lab))

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        add_shard, batch_format="pyarrow"
    )
    root = _tmp_index_dir(sf_dir, "idxselsearch")
    build_routed_index(
        docs, root, route_col="shard",
        routes=[f"s{i}" for i in range(_REDDE_SHARDS)], seg_docs=256,
    )
    qids, terms_col, routes = [], [], []
    for qid, terms in _BM25_QUERIES:
        for sh in sel.get(qid, []):
            qids.append(qid)
            terms_col.append(terms)
            routes.append(f"s{sh}")
    qt = pa.table({
        "query_id": pa.array(qids, pa.int64()),
        "terms": pa.array(terms_col, pa.list_(pa.string())),
        "route": pa.array(routes, pa.string()),
    })
    res = routed_search(
        root, ray.data.from_arrow(qt), k=20, concurrency=2
    ).to_pandas()
    return _rerank_rounded(res, k=10)


def _sql_selective_search() -> str:
    """Independent oracle: the ReDDE selection re-derived over the CSI
    slice, then the exact-BM25 body with SHARD-LOCAL stats restricted
    to each query's top-2 shards, merged by the shared round-6 rank."""
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    m, s_mod, n = _REDDE_SHARDS, _REDDE_SAMPLE_MOD, _REDDE_N
    return (
        "WITH mx AS (SELECT max(doc_id) AS m FROM documents), "
        f"geom AS (SELECT doc_id * {m} // (mx.m + 1) AS shard, "
        f"count(*) AS n, sum(CASE WHEN doc_id % {s_mod} = 0 THEN 1 "
        "ELSE 0 END) AS ns FROM documents CROSS JOIN mx GROUP BY 1), "
        "stoks AS (SELECT doc_id, unnest(list_filter(string_split(text, "
        f"' '), x -> x <> '')) AS term FROM documents WHERE doc_id % {s_mod} "
        "= 0), "
        "sdl AS (SELECT doc_id, count(*) AS dl FROM stoks GROUP BY doc_id), "
        "sstats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM sdl), "
        "stf AS (SELECT doc_id, term, count(*) AS tf FROM stoks "
        "GROUP BY doc_id, term), "
        "sdf AS (SELECT term, count(*) AS df FROM stf GROUP BY term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "cscored AS (SELECT q.query_id, stf.doc_id, "
        "sum(ln(1 + (s.n_docs - sdf.df + 0.5) / (sdf.df + 0.5)) * (stf.tf * 2.2) / "
        "(stf.tf + 1.2 * (1 - 0.75 + 0.75 * sdl.dl / (s.total::DOUBLE / s.n_docs)))"
        ") AS score FROM q JOIN stf ON q.term = stf.term "
        "JOIN sdf ON sdf.term = q.term JOIN sdl ON sdl.doc_id = stf.doc_id "
        "CROSS JOIN sstats s GROUP BY q.query_id, stf.doc_id), "
        "topn AS (SELECT query_id, doc_id FROM ("
        "SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
        "ORDER BY round(score, 6) DESC, doc_id) AS rank FROM cscored) "
        f"WHERE rank <= {n}), "
        f"votes AS (SELECT t.query_id, t.doc_id * {m} // (mx.m + 1) "
        "AS shard FROM topn t CROSS JOIN mx), "
        "est AS (SELECT v.query_id, v.shard, "
        "sum(g.n::DOUBLE / g.ns) AS estimate FROM votes v "
        "JOIN geom g ON g.shard = v.shard GROUP BY 1, 2), "
        "sel AS (SELECT query_id, shard FROM ("
        "SELECT query_id, shard, row_number() OVER (PARTITION BY query_id "
        "ORDER BY round(estimate, 6) DESC, shard) AS rk FROM est) "
        f"WHERE rk <= {_SEL_SHARDS}), "
        "ftoks AS (SELECT doc_id, doc_id * "
        f"{m} // (mx.m + 1) AS shard, "
        "unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term "
        "FROM documents CROSS JOIN mx), "
        "fdl AS (SELECT doc_id, shard, count(*) AS dl FROM ftoks "
        "GROUP BY 1, 2), "
        "fstats AS (SELECT shard, count(*) AS n_docs, sum(dl) AS total "
        "FROM fdl GROUP BY shard), "
        "ftf AS (SELECT doc_id, shard, term, count(*) AS tf FROM ftoks "
        "GROUP BY 1, 2, 3), "
        "fdf AS (SELECT shard, term, count(*) AS df FROM ftf GROUP BY 1, 2), "
        "fscored AS (SELECT q.query_id, ftf.doc_id, "
        "sum(ln(1 + (s.n_docs - fdf.df + 0.5) / (fdf.df + 0.5)) * (ftf.tf * 2.2) / "
        "(ftf.tf + 1.2 * (1 - 0.75 + 0.75 * fdl.dl / (s.total::DOUBLE / s.n_docs)))"
        ") AS score FROM q JOIN ftf ON q.term = ftf.term "
        "JOIN sel ON sel.query_id = q.query_id AND sel.shard = ftf.shard "
        "JOIN fdf ON fdf.term = q.term AND fdf.shard = ftf.shard "
        "JOIN fdl ON fdl.doc_id = ftf.doc_id AND fdl.shard = ftf.shard "
        "JOIN fstats s ON s.shard = ftf.shard "
        "GROUP BY q.query_id, ftf.doc_id) "
        "SELECT query_id, rank, doc_id, score FROM ("
        "SELECT query_id, doc_id, round(score, 6) AS score, "
        "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
        "round(score, 6) DESC, doc_id) AS INTEGER) AS rank FROM fscored) "
        "WHERE rank <= 10"
    )


def q_query_preqpp(sf_dir: str):
    """PRE-retrieval query-performance predictors (no search needed —
    the stats triage that runs before any scoring budget is spent),
    completing the QPP family next to Clarity/WIG/NQC: per query over
    its PRESENT distinct terms,

        avg_idf = mean BM25 idf            (He & Ounis, ECIR 2004)
        scq     = sum (1 + ln(cf)) * idf   (Zhao, Scholer & Tsegay 2008)
        ictf    = mean ln(T / cf)          (inverse collection term freq)

    One broadcast-filtered stats pass (df AND cf partials for just the
    query vocabulary — rows bounded by |query terms| per batch, plus
    two sentinel rows carrying N and T); queries whose every term is
    absent drop (join semantics)."""
    qterms = sorted({t for _, ts in _BM25_QUERIES for t in ts})
    needed = pa.array(qterms, pa.string())

    def stat_part(batch: pa.Table) -> pa.Table:
        tf, dl = term_count_table(batch["text"], batch["doc_id"])
        kept = tf.filter(pc.is_in(tf["term"], value_set=needed))
        agg = kept.group_by("term").aggregate(
            [("doc_id", "count"), ("tf", "sum")]
        ).rename_columns(["term", "df_p", "cf_p"])
        sent = pa.table({
            "term": pa.array(["\x00ndocs", "\x00total"], pa.string()),
            "df_p": pa.array([int((dl > 0).sum()), 0], pa.int64()),
            "cf_p": pa.array([0, int(dl.sum())], pa.int64()),
        })
        return pa.concat_tables([
            pa.table({
                "term": agg["term"],
                "df_p": pc.cast(agg["df_p"], pa.int64()),
                "cf_p": pc.cast(agg["cf_p"], pa.int64()),
            }),
            sent,
        ])

    st = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(stat_part, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df_p", alias_name="df"), Sum("cf_p", alias_name="cf"))
        .to_pandas()
    )
    n_docs = int(st.loc[st["term"] == "\x00ndocs", "df"].iloc[0])
    total = int(st.loc[st["term"] == "\x00total", "cf"].iloc[0])
    dfmap = {
        t: (int(d), int(c))
        for t, d, c in zip(st["term"], st["df"], st["cf"])
        if not t.startswith("\x00")
    }
    out_q, out_a, out_s, out_i = [], [], [], []
    for qid, terms in _BM25_QUERIES:
        present = [t for t in sorted(set(terms)) if t in dfmap]
        if not present:
            continue
        idfs = [
            math.log(1.0 + (n_docs - dfmap[t][0] + 0.5) / (dfmap[t][0] + 0.5))
            for t in present
        ]
        scq = sum(
            (1.0 + math.log(dfmap[t][1])) * i
            for t, i in zip(present, idfs)
        )
        ictf = sum(math.log(total / dfmap[t][1]) for t in present) / len(
            present
        )
        out_q.append(qid)
        out_a.append(round(sum(idfs) / len(idfs), 6))
        out_s.append(round(scq, 6))
        out_i.append(round(ictf, 6))
    return pd.DataFrame({
        "query_id": out_q, "avg_idf": out_a, "scq": out_s, "ictf": out_i,
    })


def _sql_query_preqpp() -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    return (
        f"WITH toks AS ({_TOKS_SQL}), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id), "
        "stats AS (SELECT count(*) AS n_docs, sum(dl) AS total FROM dl), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
        "GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*) AS df, sum(tf) AS cf FROM tf "
        "GROUP BY term), "
        f"q(query_id, term) AS (VALUES {vals}), "
        "qd AS (SELECT DISTINCT query_id, term FROM q), "
        "pt AS (SELECT qd.query_id, "
        "ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) AS idf, "
        "(1 + ln(df.cf)) * ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) "
        "AS scq_t, ln(s.total::DOUBLE / df.cf) AS ictf_t "
        "FROM qd JOIN df ON df.term = qd.term CROSS JOIN stats s) "
        "SELECT query_id, round(sum(idf) / count(*), 6) AS avg_idf, "
        "round(sum(scq_t), 6) AS scq, "
        "round(sum(ictf_t) / count(*), 6) AS ictf "
        "FROM pt GROUP BY query_id ORDER BY query_id"
    )


# -------------------------------------- salted skew / multi-source union

def q_salted_term_cf(sf_dir: str):
    """The north rule's skew clause under the driver gate: per-term
    collection frequency through stages/skew.salted_group_sum — the
    occurrence stream shuffles on (term, salt) so a head term (web
    vocabularies are Zipf: the top term can be 10% of ALL occurrences)
    splits across 16 reducers instead of melting one; a second tiny
    groupby merges the <=16 partials per term.  Exactness is integer-sum
    associativity; output limited to terms with cf >= 10 to bound rows.
    """
    from ...stages import skew

    def occ(batch: pa.Table) -> pa.Table:
        terms, _ri, _dl = flatten_tokens(batch["text"])
        return pa.table({
            "term": terms,
            "one": pa.array(np.ones(len(terms), dtype=np.int64)),
        })

    stream = _docs(sf_dir, ["text"]).map_batches(occ, batch_format="pyarrow")
    out = skew.salted_group_sum(stream, "term", "one", salt=16, alias="cf")
    return out.filter(expr="cf >= 10")


SQL_SALTED_TERM_CF = (
    f"WITH toks AS ({_TOKS_SQL}) "
    "SELECT term, count(*) AS cf FROM toks GROUP BY term HAVING count(*) >= 10"
)


def q_union_source_stats(sf_dir: str):
    """Multi-format ingestion union: the corpus arrives HALF as parquet,
    half as a JSONL export (written once, resumable), `Dataset.union`
    splices the two streams, and the per-source tally must equal the
    single-table SQL — proving the union path neither drops nor
    duplicates rows and the JSONL round-trip is lossless at the
    row level."""
    root = _tmp_index_dir(sf_dir, "unionsrc")
    data = os.path.join(root, "data")
    done = os.path.join(root, "_SUCCESS")
    def half(rem):
        def cut(b: pa.Table) -> pa.Table:
            m = pc.equal(
                pc.bit_wise_and(b["doc_id"], 1), pa.scalar(rem, pa.int64())
            )
            return b.filter(m)

        return cut

    if not os.path.exists(done):
        import shutil as _shutil

        tmp = data + ".tmp"
        _shutil.rmtree(tmp, ignore_errors=True)
        _shutil.rmtree(data, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        _docs(sf_dir, ["doc_id", "source", "n_chars"]).map_batches(
            half(1), batch_format="pyarrow"
        ).write_json(tmp)
        os.replace(tmp, data)
        with open(done + ".tmp", "w") as f:
            f.write("ok")
        os.replace(done + ".tmp", done)

    even = _docs(sf_dir, ["doc_id", "source", "n_chars"]).map_batches(
        half(0), batch_format="pyarrow"
    )
    odd = ray.data.read_json(data).map_batches(
        lambda b: pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "source": b["source"],
            "n_chars": pc.cast(b["n_chars"], pa.int64()),
        }),
        batch_format="pyarrow",
    )
    return (
        even.union(odd)
        .groupby("source")
        .aggregate(Count(alias_name="n"), Sum("n_chars", alias_name="sum_chars"))
    )


SQL_UNION_SOURCE_STATS = (
    "SELECT source, count(*) AS n, "
    "CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM documents GROUP BY 1"
)


from ._nsacc import export as _ns_export

_ns_export(globals())
del _ns_export
