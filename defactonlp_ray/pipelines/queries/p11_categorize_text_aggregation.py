# Part 11/11 of the former single-module pipelines/queries.py
# (mechanical split, round 5 — VERDICT r04 next-round #6).  Parts share
# ONE late-bound namespace via _nsacc: globals are seeded from the
# accumulator before this body runs (preserving original top-level
# execution order) and the final merged namespace is injected back into
# every part by __init__, so call-time forward references behave exactly
# as in the single file.  Original lines 21049-22672.
from __future__ import annotations

from ._nsacc import NS as _ns_seed

globals().update(_ns_seed)
del _ns_seed



# ------------------------------------------- categorize_text aggregation

_CAT_NTOK = 4
_CAT_TOPN = 20


def categorize_keys(texts) -> "pa.Array":
    """The categorize_text key kernel: lowercase, mask digit runs to
    '#', first _CAT_NTOK space tokens rejoined.  Vectorized (4 Arrow
    kernels); shared by the entry and its pytest digit-mask check."""
    masked = pc.replace_substring_regex(
        pc.utf8_lower(texts), r"[0-9]+", "#"
    )
    toks = pc.split_pattern(pc.utf8_trim_whitespace(masked), " ")
    return pc.binary_join(pc.list_slice(toks, 0, _CAT_NTOK), " ")


def q_categorize_text(sf_dir: str):
    """ES ``categorize_text`` aggregation, deterministic variant: each
    document's category key is its first 4 tokens after lowercasing and
    masking every digit run to '#' (the ES categorizer's number-drain
    step), bucket count = docs per key, top 20 by (n_docs DESC, key).
    The ES original drains tokens through an online token-tree; this
    pinned first-N-masked-tokens rule is order-stable, embarrassingly
    parallel, and SQL-expressible — the masking kernel is exercised by
    pytest on digit-bearing strings.  Scale plan: the key derivation is
    four vectorized Arrow kernels (lower, regex-mask, split,
    list-slice-join); per-batch partial counts bound the exchange at
    |distinct keys per batch|; distributed sort+limit takes the top 20."""
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def part(b: pa.Table) -> pa.Table:
        t = pa.table({"key": categorize_keys(b["text"])})
        agg = t.group_by("key").aggregate([([], "count_all")])
        return agg.rename_columns(["key", "n_p"])

    out = (
        docs.map_batches(part, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n_p", alias_name="n_docs"))
        .to_pandas()
    )
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return (
        out.sort_values(["n_docs", "key"], ascending=[False, True])
        .head(_CAT_TOPN).reset_index(drop=True)[["key", "n_docs"]]
    )


SQL_CATEGORIZE_TEXT = (
    "SELECT key, count(*) AS n_docs FROM ("
    "SELECT array_to_string(list_slice(string_split(trim("
    "regexp_replace(lower(text), '[0-9]+', '#', 'g')), ' '), "
    f"1, {_CAT_NTOK}), ' ') AS key FROM documents) "
    f"GROUP BY key ORDER BY n_docs DESC, key LIMIT {_CAT_TOPN}"
)


# ------------------------------------------- NTILE window (per user)

_NTILE_K = 4


def q_events_ntile(sf_dir: str):
    """SQL ``NTILE(4)`` window — per-user value quartiles aggregated by
    event type: each user's events of one type order by ``(value,
    event_id)`` and split into 4 rank tiles (SQL remainder rule: the
    first ``n mod 4`` tiles get the extra row), then every (event_type,
    tile) bucket reports its count and mean value.  Partitioning by
    ``(user_id, event_type)`` keeps every NTILE partition a single
    user's stream — user cardinality scales out, same shape as
    ``events_rank_lag``; per-group partials reduce inside
    ``map_groups`` and one |types|x4-row Sum groupby merges users."""

    def tiles(g: pd.DataFrame) -> pd.DataFrame:
        out_t, out_tile, out_n, out_sv = [], [], [], []
        for et, sub in g.groupby("event_type"):
            sub = sub.sort_values(["value", "event_id"])
            n = len(sub)
            base, rem = divmod(n, _NTILE_K)
            sizes = np.full(_NTILE_K, base, dtype=np.int64)
            sizes[:rem] += 1
            tile = np.repeat(
                np.arange(1, _NTILE_K + 1, dtype=np.int64), sizes
            )
            v = sub["value"].to_numpy(np.float64)
            for t in np.unique(tile):
                m = tile == t
                out_t.append(et)
                out_tile.append(int(t))
                out_n.append(int(m.sum()))
                out_sv.append(float(v[m].sum()))
        return pd.DataFrame({
            "event_type": pd.Series(out_t, dtype=str),
            "tile": pd.Series(out_tile, dtype=np.int64),
            "n_p": pd.Series(out_n, dtype=np.int64),
            "sv_p": pd.Series(out_sv, dtype=np.float64),
        })

    out = (
        read_table(
            sf_dir, "events", ["event_id", "user_id", "event_type", "value"]
        )
        .groupby("user_id")
        .map_groups(tiles)
        .groupby(["event_type", "tile"])
        .aggregate(Sum("n_p", alias_name="n"), Sum("sv_p", alias_name="sv"))
        .to_pandas()
    )
    out["n"] = out["n"].astype(np.int64)
    out["avg_value"] = np.round(
        out["sv"].to_numpy(np.float64) / out["n"].to_numpy(np.float64), 6
    )
    return (
        out.sort_values(["event_type", "tile"]).reset_index(drop=True)
        [["event_type", "tile", "n", "avg_value"]]
    )


SQL_EVENTS_NTILE = (
    "SELECT event_type, tile, CAST(count(*) AS BIGINT) AS n, "
    "round(avg(value), 6) AS avg_value FROM ("
    f"SELECT event_type, value, CAST(NTILE({_NTILE_K}) OVER ("
    "PARTITION BY user_id, event_type ORDER BY value, event_id) "
    "AS BIGINT) AS tile FROM events) "
    "GROUP BY event_type, tile ORDER BY event_type, tile"
)


# ------------------------------- percentiles_bucket sibling aggregation

_PCTB = (25, 50, 75, 95)


def q_events_percentiles_bucket(sf_dir: str):
    """ES ``percentiles_bucket`` pipeline aggregation: percentiles OF a
    sibling aggregation's bucket values — here the daily event-count
    date_histogram — with linear interpolation (quantile_cont /
    numpy 'linear', the ES implementation's rule).  The corpus pass is
    the usual day-count combiner; the percentile runs over the
    |days|-row series on the driver (bounded, like every sibling
    agg)."""

    def part(batch: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(batch["ts"], unit="day"), pa.timestamp("us")
        )
        agg = pa.table({"day": day}).group_by("day").aggregate(
            [([], "count_all")]
        )
        return agg.rename_columns(["day", "n_p"])

    daily = (
        read_table(sf_dir, "events", ["ts"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n_p", alias_name="n"))
        .to_pandas()
    )
    vals = daily["n"].to_numpy(np.float64)
    qs = np.quantile(vals, [p / 100.0 for p in _PCTB], method="linear")
    return pd.DataFrame({
        "pct": pd.Series(list(_PCTB), dtype=np.int64),
        "value": np.round(qs, 6),
    })


SQL_EVENTS_PERCENTILES_BUCKET = (
    "WITH daily AS (SELECT date_trunc('day', ts) AS day, "
    "CAST(count(*) AS DOUBLE) AS n FROM events GROUP BY 1) "
    f"SELECT unnest({list(_PCTB)}) AS pct, "
    "unnest([round(x, 6) FOR x IN quantile_cont(n, "
    f"{[p / 100.0 for p in _PCTB]})]) AS value FROM daily"
)


# ----------------------------------------------- ROLLUP multi-level agg

_ROLLUP_ALL = "_all_"


def q_events_rollup(sf_dir: str):
    """SQL ``GROUP BY ROLLUP(event_type, day)``: the three-level
    aggregate lattice — (type, day), (type), grand total — with count
    and value sum per cell, rolled-up dimensions shown as the pinned
    ``_all_`` sentinel.  ONE corpus pass computes the finest-level
    (type, day) partials inside ``map_batches``; the coarser levels
    derive from the finest by two more tiny groupbys over the
    |types|x|days| table — no second corpus scan, every exchange
    bounded by the lattice size."""

    def part(batch: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.cast(pc.floor_temporal(batch["ts"], unit="day"), pa.date32()),
            pa.string(),
        )
        t = pa.table({
            "event_type": batch["event_type"], "day": day,
            "v_p": batch["value"],
        })
        agg = t.group_by(["event_type", "day"]).aggregate(
            [([], "count_all"), ("v_p", "sum")]
        )
        return agg.rename_columns(["event_type", "day", "n_p", "sv_p"])

    finest = (
        read_table(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(part, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Sum("n_p", alias_name="n"), Sum("sv_p", alias_name="sv"))
        .to_pandas()
    )
    by_type = finest.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), sv=("sv", "sum")
    )
    by_type["day"] = _ROLLUP_ALL
    total = pd.DataFrame({
        "event_type": [_ROLLUP_ALL], "day": [_ROLLUP_ALL],
        "n": [finest["n"].sum()], "sv": [finest["sv"].sum()],
    })
    out = pd.concat(
        [finest, by_type, total], ignore_index=True
    )[["event_type", "day", "n", "sv"]]
    out["n"] = out["n"].astype(np.int64)
    out["sum_value"] = np.round(out["sv"].to_numpy(np.float64), 6)
    return (
        out.sort_values(["event_type", "day"]).reset_index(drop=True)
        [["event_type", "day", "n", "sum_value"]]
    )


SQL_EVENTS_ROLLUP = (
    "SELECT coalesce(event_type, '_all_') AS event_type, "
    "coalesce(CAST(day AS VARCHAR), '_all_') AS day, "
    "CAST(count(*) AS BIGINT) AS n, round(sum(value), 6) AS sum_value "
    "FROM (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, "
    "value FROM events) "
    "GROUP BY ROLLUP(event_type, day) "
    "ORDER BY event_type, day"
)


# --------------------------------------------------- common-terms query

_CT_CUTOFF = (79, 100)  # low iff df * 100 <= n_docs * 79
_CT_QUERIES: list[tuple[int, list[str]]] = [
    (0, ["dup", "batch"]),
    (1, ["merge", "small", "scan"]),
    (2, ["data", "batch", "agg"]),
    (3, ["row", "filter", "small"]),
    (4, ["stream", "scan", "agg", "batch"]),
    (5, ["dup", "small", "agg"]),
]


def q_common_terms_topk(sf_dir: str):
    """Lucene/ES ``common`` query (CommonTermsQuery,
    stages/phrase.score_common_terms): query terms split at a pinned
    document-frequency cutoff; docs must match >= 1 LOW-frequency term
    (the selective recall driver), HIGH-frequency terms only ADD score
    to those candidates — the stopword-robust ranking that predates
    index-time stop lists.  The df split is exact integer arithmetic
    recomputed from the corpus on BOTH sides, so the oracle reproduces
    it at any sf; the all-high fallback (plain OR) is in the SQL as a
    per-query NOT EXISTS guard."""
    from ...stages.phrase import common_terms_search

    idx = _build_docs_index(sf_dir)
    qds = ray.data.from_arrow(
        pa.table({
            "query_id": pa.array([q[0] for q in _CT_QUERIES], pa.int64()),
            "terms": pa.array(
                [q[1] for q in _CT_QUERIES], pa.list_(pa.string())
            ),
        })
    )
    res = common_terms_search(
        idx, qds, k=20, concurrency=2, cutoff=_CT_CUTOFF
    ).to_pandas()
    return _rerank_rounded(res, k=10)


def _common_terms_sql(
    queries: list[tuple[int, list[str]]],
    cutoff: tuple[int, int],
    k: int = 10,
) -> str:
    """common-terms oracle: candidate = docs with >= 1 low-df term
    (fallback: any term when the query has no low-df term in the
    dictionary), scoring = the shared candidate-filtered exact-BM25
    skeleton over ALL the query's terms."""
    num, den = cutoff
    cand_parts, qvals = [], []
    for qid, terms in queries:
        uniq = sorted(set(terms))
        in_list = ", ".join(f"'{t}'" for t in uniq)
        low_pred = f"df.df * {den} <= s.n_docs * {num}"
        cand_parts.append(
            f"SELECT {qid} AS query_id, tf.doc_id FROM tf "
            "JOIN df ON df.term = tf.term CROSS JOIN stats s "
            f"WHERE tf.term IN ({in_list}) AND ({low_pred} "
            "OR NOT EXISTS (SELECT 1 FROM df, stats s "
            f"WHERE df.term IN ({in_list}) AND {low_pred})) "
            "GROUP BY tf.doc_id"
        )
        for t in uniq:
            qvals.append(f"({qid}, '{t}')")
    return _filtered_bm25_sql(cand_parts, qvals, k)


SQL_COMMON_TERMS_TOPK = _common_terms_sql(_CT_QUERIES, _CT_CUTOFF)


# ------------------------------------------------- rate + filters aggs

def q_events_rate_weekly(sf_dir: str):
    """ES ``rate`` aggregation inside a weekly date_histogram: event
    count per ISO week normalized to a per-day rate (``unit: day`` —
    the calendar interval is always 7 days, partial edge weeks
    included, the ES rule).  Combiner-shaped: per-batch week counts
    pre-aggregate before one |weeks|-row exchange."""

    def part(batch: pa.Table) -> pa.Table:
        wk = pc.floor_temporal(batch["ts"], unit="week")
        t = pa.table({"week_start": pc.cast(wk, pa.timestamp("us"))})
        agg = t.group_by("week_start").aggregate([([], "count_all")])
        return agg.rename_columns(["week_start", "n_p"])

    def fin(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return b.append_column(
            "rate_per_day", pa.array(np.round(n / 7.0, 6), pa.float64())
        )

    return (
        read_table(sf_dir, "events", ["ts"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("week_start")
        .aggregate(Sum("n_p", alias_name="n"))
        .map_batches(fin, batch_format="pyarrow")
        .sort("week_start")
    )


SQL_EVENTS_RATE_WEEKLY = (
    "SELECT date_trunc('week', ts) AS week_start, count(*) AS n, "
    "round(count(*) / 7.0, 6) AS rate_per_day "
    "FROM events GROUP BY 1 ORDER BY 1"
)


_FILTERS_AGG = [
    ("click", "event_type", "click"),
    ("purchase", "event_type", "purchase"),
    ("high_value", "value_gt", 400.0),
]


def q_events_filters_agg(sf_dir: str):
    """ES ``filters`` aggregation with ``other_bucket``: one named
    bucket per filter (buckets may overlap — an event can land in
    several) plus ``_other_`` for events matching none.  Per-batch the
    membership masks evaluate vectorized and reduce to one row each, so
    the exchange is |filters|+1 rows regardless of corpus size."""

    def part(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        val = batch["value"]
        masks = {
            "click": pc.equal(et, "click"),
            "purchase": pc.equal(et, "purchase"),
            "high_value": pc.greater(val, 400.0),
        }
        any_m = None
        names, counts, sums = [], [], []
        for name, m in masks.items():
            names.append(name)
            counts.append(int(pc.sum(pc.cast(m, pa.int64())).as_py() or 0))
            sums.append(
                float(pc.sum(pc.if_else(m, val, 0.0)).as_py() or 0.0)
            )
            any_m = m if any_m is None else pc.or_(any_m, m)
        none_m = pc.invert(any_m)
        names.append("_other_")
        counts.append(int(pc.sum(pc.cast(none_m, pa.int64())).as_py() or 0))
        sums.append(
            float(pc.sum(pc.if_else(none_m, val, 0.0)).as_py() or 0.0)
        )
        return pa.table({
            "bucket": pa.array(names, pa.string()),
            "n_p": pa.array(counts, pa.int64()),
            "s_p": pa.array(sums, pa.float64()),
        })

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": b["bucket"],
            "n": b["n"],
            "sum_value": pc.round(b["s"], 2),
        })

    return (
        read_table(sf_dir, "events", ["event_type", "value"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_p", alias_name="n"), Sum("s_p", alias_name="s"))
        .map_batches(fin, batch_format="pyarrow")
        .sort("bucket")
    )


SQL_EVENTS_FILTERS_AGG = (
    "SELECT bucket, n, sum_value FROM ("
    "SELECT 'click' AS bucket, count(*) AS n, "
    "round(coalesce(sum(value), 0.0), 2) AS sum_value FROM events "
    "WHERE event_type = 'click' "
    "UNION ALL SELECT 'purchase', count(*), "
    "round(coalesce(sum(value), 0.0), 2) FROM events "
    "WHERE event_type = 'purchase' "
    "UNION ALL SELECT 'high_value', count(*), "
    "round(coalesce(sum(value), 0.0), 2) FROM events WHERE value > 400.0 "
    "UNION ALL SELECT '_other_', count(*), "
    "round(coalesce(sum(value), 0.0), 2) FROM events "
    "WHERE NOT (event_type IN ('click', 'purchase') OR value > 400.0)"
    ") ORDER BY bucket"
)


# ES date_range agg: named, possibly-overlapping half-open [from, to)
# ranges with open ends; pinned absolute boundaries over the generator's
# January-2024 event span
_DATE_RANGES: list[tuple[str, str | None, str | None]] = [
    ("week1", None, "2024-01-08"),
    ("mid", "2024-01-05", "2024-01-20"),
    ("tail", "2024-01-20", None),
]


def q_events_date_range(sf_dir: str):
    """ES ``date_range`` aggregation: one named bucket per range,
    half-open ``[from, to)``, open ends allowed, buckets overlap (an
    event can land in several — q.v. ``week1``/``mid``).  Identical
    combiner shape to ``events_filters_agg``: membership masks evaluate
    vectorized per batch and the exchange is |ranges| rows regardless of
    corpus size."""

    bounds = [
        (
            name,
            None if lo is None else pd.Timestamp(lo).to_datetime64(),
            None if hi is None else pd.Timestamp(hi).to_datetime64(),
        )
        for name, lo, hi in _DATE_RANGES
    ]

    def part(batch: pa.Table) -> pa.Table:
        ts = batch["ts"]
        val = batch["value"]
        names, counts, sums = [], [], []
        for name, lo, hi in bounds:
            m = None
            if lo is not None:
                m = pc.greater_equal(ts, pa.scalar(lo))
            if hi is not None:
                mh = pc.less(ts, pa.scalar(hi))
                m = mh if m is None else pc.and_(m, mh)
            names.append(name)
            counts.append(int(pc.sum(pc.cast(m, pa.int64())).as_py() or 0))
            sums.append(
                float(pc.sum(pc.if_else(m, val, 0.0)).as_py() or 0.0)
            )
        return pa.table({
            "bucket": pa.array(names, pa.string()),
            "n_p": pa.array(counts, pa.int64()),
            "s_p": pa.array(sums, pa.float64()),
        })

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": b["bucket"],
            "n": b["n"],
            "sum_value": pc.round(b["s"], 2),
        })

    return (
        read_table(sf_dir, "events", ["ts", "value"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_p", alias_name="n"), Sum("s_p", alias_name="s"))
        .map_batches(fin, batch_format="pyarrow")
        .sort("bucket")
    )


def _date_range_sql(ranges) -> str:
    parts = []
    for name, lo, hi in ranges:
        conds = []
        if lo is not None:
            conds.append(f"ts >= TIMESTAMP '{lo} 00:00:00'")
        if hi is not None:
            conds.append(f"ts < TIMESTAMP '{hi} 00:00:00'")
        parts.append(
            f"SELECT '{name}' AS bucket, count(*) AS n, "
            "round(coalesce(sum(value), 0.0), 2) AS sum_value "
            f"FROM events WHERE {' AND '.join(conds)}"
        )
    return "SELECT * FROM (" + " UNION ALL ".join(parts) + ") ORDER BY bucket"


SQL_EVENTS_DATE_RANGE = _date_range_sql(_DATE_RANGES)


_VWH_K = 6


def q_varwidth_histogram(sf_dir: str):
    """ES ``variable_width_histogram`` over ``documents.n_chars``,
    with the approximation replaced by a PINNED exact rule: optimal
    weighted 1-D k-means (Ckmeans.1d.dp — Wang & Song, R Journal 2011)
    over the distinct-value table, k = 6.  ES's own agg is
    order-dependent and approximate, so the deterministic optimum is
    the only cross-engine-checkable semantics; the serial oracle runs
    an independently-written plain-Python DP with the same prefix-sum
    cost and first-minimum tie rule.

    Scale shape: the corpus pass is a (value -> count) combiner +
    groupby — the exchange is |distinct values| rows — and the O(k n^2)
    DP runs on that bounded table on the driver, never on raw rows."""
    from ...stages.cluster import ckmeans_1d

    def part(batch: pa.Table) -> pa.Table:
        t = pa.table({"v": batch["n_chars"]})
        agg = t.group_by("v").aggregate([([], "count_all")])
        return agg.rename_columns(["v", "w_p"])

    vw = (
        _docs(sf_dir, ["n_chars"])
        .map_batches(part, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("w_p", alias_name="w"))
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    v = vw["v"].to_numpy(np.int64)
    w = vw["w"].to_numpy(np.int64)
    bounds = ckmeans_1d(v, w, _VWH_K)
    rows = []
    for b in range(len(bounds) - 1):
        a, z = int(bounds[b]), int(bounds[b + 1])
        seg_v, seg_w = v[a:z], w[a:z]
        n = int(seg_w.sum())
        s = int((seg_v * seg_w).sum())
        rows.append((b, int(seg_v[0]), int(seg_v[-1]), n, round(s / n, 6)))
    return pd.DataFrame(
        rows, columns=["bucket", "v_min", "v_max", "n_docs", "v_avg"]
    )


def q_line_cluster_sizes(sf_dir: str):
    """Duplicate-cluster-size histogram over the exact 8-token lines
    (the dedup unit of ``line_dedup``): how many distinct lines occur
    exactly s times in the corpus — the profile a curation run reads to
    decide whether boilerplate removal is worth a pass (a heavy tail of
    big clusters = template spam).  Two combiner-shaped exchanges, both
    sub-line-cardinality: per-batch line counts -> groupby(line) Sum ->
    per-batch size histogram -> groupby(size) Sum."""

    def count_lines(b: pa.Table) -> pa.Table:
        t = pa.table({"line": b["line"]})
        agg = t.group_by("line").aggregate([([], "count_all")])
        return agg.rename_columns(["line", "n_p"])

    per_line = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_lines_part, batch_format="pyarrow")
        .map_batches(count_lines, batch_format="pyarrow")
        .groupby("line")
        .aggregate(Sum("n_p", alias_name="sz"))
    )

    def size_part(b: pa.Table) -> pa.Table:
        t = pa.table({"sz": b["sz"]})
        agg = t.group_by("sz").aggregate([([], "count_all")])
        return agg.rename_columns(["sz", "n_p"])

    return (
        per_line.map_batches(size_part, batch_format="pyarrow")
        .groupby("sz")
        .aggregate(Sum("n_p", alias_name="n"))
        .sort("sz")
    )


SQL_LINE_CLUSTER_SIZES = (
    "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
    "x -> x <> '') AS ts FROM documents), "
    "lines AS (SELECT doc_id, j AS line_id, "
    f"array_to_string(ts[j * {_LINE_W} + 1 : j * {_LINE_W} + {_LINE_W}], ' ') "
    "AS line FROM d, unnest(range(0, CAST(ceil(len(ts) / "
    f"{_LINE_W}.0) AS BIGINT))) t(j)), "
    "per_line AS (SELECT line, count(*) AS sz FROM lines GROUP BY line) "
    "SELECT sz, count(*) AS n FROM per_line GROUP BY sz ORDER BY sz"
)


# ------------------------------------------------ has_parent + diversity

_PARENT_TERMS = ["dup", "slow"]
_PARENT_TOPK = 20


def q_has_parent_topk(sf_dir: str):
    """ES ``has_parent`` query with ``score=true``: the inverse of
    ``has_child_topk`` under the same join-field model (parent doc,
    child 8-token windows) — return CHILD windows whose parent matches,
    each child carrying its parent's score.  A parent matches when it
    contains EVERY query term; its score is the total occurrence count
    of the query terms (integer — exact, no float policy).  Parents and
    children live in the same input row, so one vectorized map_batches
    emits per-child rows with a per-batch top-k combiner; only k rows
    per batch reach the driver."""
    from ...functions.tokenizer import term_position_table

    qset = pa.array(_PARENT_TERMS, pa.string())
    k = _PARENT_TOPK
    w = _CHILD_WINDOW

    def part(batch: pa.Table) -> pa.Table:
        occ, dl = term_position_table(batch["text"], batch["doc_id"])
        m = pc.is_in(occ["term"], value_set=qset)
        hit = occ.filter(m)
        # parent match: all query terms present; score: total tf
        dt = hit.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
        par = dt.group_by("doc_id").aggregate(
            [([], "count_all"), ("count_all", "sum")]
        ).rename_columns(["doc_id", "n_terms", "score"])
        par = par.filter(pc.equal(par["n_terms"], len(_PARENT_TERMS)))
        if par.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "sent_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.int64()),
            })
        # every child window of each matching parent
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)
        dl_np = np.asarray(dl, dtype=np.int64)
        keep = np.isin(dids, par["doc_id"].to_numpy(zero_copy_only=False))
        p_ids = dids[keep]
        n_child = np.maximum((dl_np[keep] + w - 1) // w, 1).astype(np.int64)
        cd = np.repeat(p_ids, n_child)
        cs = np.concatenate(
            [np.arange(n, dtype=np.int64) for n in n_child]
        ) if n_child.size else np.array([], dtype=np.int64)
        smap = dict(zip(
            par["doc_id"].to_numpy(zero_copy_only=False),
            par["score"].to_numpy(zero_copy_only=False),
        ))
        sc = np.array([smap[d] for d in cd], dtype=np.int64)
        order = np.lexsort((cs, cd, -sc))[:k]
        return pa.table({
            "doc_id": pa.array(cd[order], pa.int64()),
            "sent_id": pa.array(cs[order], pa.int64()),
            "score": pa.array(sc[order], pa.int64()),
        })

    parts = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(part, batch_format="pyarrow")
        .to_pandas()
    )
    out = parts.sort_values(
        ["score", "doc_id", "sent_id"],
        ascending=[False, True, True],
        kind="mergesort",
    ).head(k).reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int32)
    return out[["rank", "doc_id", "sent_id", "score"]]


def _sql_has_parent_topk() -> str:
    w = _CHILD_WINDOW
    vals = ", ".join(f"('{t}')" for t in _PARENT_TERMS)
    return (
        "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS ts FROM documents), "
        "tok AS (SELECT doc_id, unnest(ts) AS term FROM d), "
        f"q(term) AS (VALUES {vals}), "
        "par AS (SELECT doc_id, count(DISTINCT tok.term) AS nt, "
        "count(*) AS score FROM tok JOIN q ON tok.term = q.term "
        f"GROUP BY doc_id HAVING count(DISTINCT tok.term) = "
        f"{len(_PARENT_TERMS)}), "
        "ch AS (SELECT d.doc_id, j AS sent_id, p.score FROM d "
        "JOIN par p USING (doc_id), "
        "unnest(range(0, CAST(greatest(ceil(len(ts) / "
        f"{w}.0), 1) AS BIGINT))) t(j)) "
        "SELECT rank, doc_id, sent_id, score FROM ("
        "SELECT doc_id, sent_id, score, CAST(row_number() OVER ("
        "ORDER BY score DESC, doc_id, sent_id) AS INTEGER) AS rank "
        f"FROM ch) WHERE rank <= {_PARENT_TOPK}"
    )


def q_distinct_ngrams(sf_dir: str):
    """Corpus diversity profile (the distinct-n metric of Li et al.
    2016, the standard repetitiveness check run before training):
    per source and n in {1,2,3}, the total n-gram count, the DISTINCT
    n-gram count, and their ratio.  Shape: vectorized gram assembly per
    batch (numpy object concat over the flattened token stream — no
    per-row Python), per-batch unique (n, source, gram) rows, ONE
    groupby-distinct exchange bounded by distinct-gram cardinality
    (exact by construction; at 100-TB scale the same pipeline swaps the
    distinct count for the HLL family in functions/sketches.py), totals
    ride a |sources|x3-row combiner."""

    def gram_part(batch: pa.Table) -> pa.Table:
        terms, row_idx, doc_len = flatten_tokens(batch["text"])
        src = batch["source"].to_numpy(zero_copy_only=False)
        n_tok = len(terms)
        t_np = np.asarray(terms.to_pylist(), dtype=object)
        subtables = []
        for n in (1, 2, 3):
            if n_tok >= n:
                m = n_tok - n + 1
                same = np.ones(m, dtype=bool)
                g = t_np[:m].copy()
                for j in range(1, n):
                    same &= row_idx[:m] == row_idx[j: m + j]
                    g = g + " " + t_np[j: m + j]
                g = g[same]
                gs = src[row_idx[:m][same]]
            else:
                g = np.array([], dtype=object)
                gs = np.array([], dtype=object)
            pairs = pa.table({
                "source": pa.array(gs, pa.string()),
                "gram": pa.array(g, pa.string()),
            }).group_by(["source", "gram"]).aggregate([])
            sub = pa.table({
                "n": pa.array(np.full(pairs.num_rows, n, dtype=np.int64)),
                "source": pairs["source"],
                "gram": pairs["gram"],
            })
            subtables.append(sub)
            # marker rows carry the per-(n, source) n-gram TOTALS through
            # the same exchange ("\x00"-prefixed gram never collides with
            # a real token); equal partials from different batches
            # collapse in the groupby — the downstream Count recovers the
            # multiplicity, so total = value * cnt summed over markers
            if gs.size:
                u, c = np.unique(gs, return_counts=True)
                subtables.append(pa.table({
                    "n": pa.array(np.full(u.size, n, dtype=np.int64)),
                    "source": pa.array(u, pa.string()),
                    "gram": pa.array(
                        ["\x00" + str(int(x)) for x in c], pa.string()
                    ),
                }))
        return pa.concat_tables(subtables)

    grams = (
        _docs(sf_dir, ["doc_id", "text", "source"])
        .map_batches(gram_part, batch_format="pyarrow")
        .groupby(["n", "source", "gram"])
        .aggregate(Count(alias_name="cnt"))
    )

    def reduce_part(b: pa.Table) -> pa.Table:
        is_mark = pc.starts_with(b["gram"], "\x00")
        mark_np = is_mark.to_numpy(zero_copy_only=False)
        vals = np.zeros(b.num_rows, dtype=np.int64)
        if mark_np.any():
            # markers are |sources| x 3 x batches — vocabulary rows stay
            # vectorized, only markers parse
            sub = pc.utf8_slice_codeunits(
                pc.if_else(is_mark, b["gram"], "0"), 1
            )
            vals[mark_np] = np.array(
                [int(x) for x in
                 np.asarray(sub.to_numpy(zero_copy_only=False))[mark_np]],
                dtype=np.int64,
            )
        return pa.table({
            "n": b["n"],
            "source": b["source"],
            "d_p": pa.array((~mark_np).astype(np.int64), pa.int64()),
            "t_p": pa.array(
                vals * b["cnt"].to_numpy(zero_copy_only=False), pa.int64()
            ),
        })

    out = (
        grams.map_batches(reduce_part, batch_format="pyarrow")
        .groupby(["n", "source"])
        .aggregate(
            Sum("d_p", alias_name="n_distinct"),
            Sum("t_p", alias_name="n_grams"),
        )
        .to_pandas()
    )
    out["distinct_ratio"] = np.round(
        out["n_distinct"] / out["n_grams"], 6
    )
    return (
        out.sort_values(["n", "source"]).reset_index(drop=True)
        [["n", "source", "n_grams", "n_distinct", "distinct_ratio"]]
    )


SQL_DISTINCT_NGRAMS = (
    "WITH d AS (SELECT doc_id, source, list_filter(string_split(text, ' '), "
    "x -> x <> '') AS ts FROM documents), "
    "tok AS (SELECT doc_id, source, unnest(ts) AS term, "
    "unnest(range(0, len(ts))) AS i FROM d), "
    "g1 AS (SELECT source, term AS gram FROM tok), "
    "g2 AS (SELECT a.source, a.term || ' ' || b.term AS gram "
    "FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1), "
    "g3 AS (SELECT a.source, a.term || ' ' || b.term || ' ' || c.term "
    "AS gram FROM tok a JOIN tok b ON a.doc_id = b.doc_id "
    "AND b.i = a.i + 1 JOIN tok c ON a.doc_id = c.doc_id "
    "AND c.i = a.i + 2), "
    "u AS (SELECT 1 AS n, source, count(*) AS n_grams, "
    "count(DISTINCT gram) AS n_distinct FROM g1 GROUP BY source "
    "UNION ALL SELECT 2, source, count(*), count(DISTINCT gram) "
    "FROM g2 GROUP BY source "
    "UNION ALL SELECT 3, source, count(*), count(DISTINCT gram) "
    "FROM g3 GROUP BY source) "
    "SELECT n, source, n_grams, n_distinct, "
    "round(n_distinct / n_grams::DOUBLE, 6) AS distinct_ratio "
    "FROM u ORDER BY n, source"
)


# ------------------------------------------------------------- registries

# NOTE: the driver's correctness harness runs the FIRST 50 entries in
# dict order (r01=32/32, r02=42/42, r03=50-cap over 91).  Order is
# therefore a coverage schedule, not cosmetics.  The round-4 first-50
# window holds, in order: (1) the newest never-driver-checked entries
# (the late-wave additions — TPC-H Q7/Q8/Q9/Q22, common-terms, rate /
# filters aggs, line cluster sizes, has_parent, distinct-n — then the
# post-mirror wave), (2) the eight VERDICT-r03-named rows — the r03
# failure `neardup_clusters` plus `bm25_collapse_neardup` /
# `bm25_collapse_sidecar` / `cooccur_pmi` (all re-worked this round) and
# the three entries that silently dropped out of the r03 run
# (`claim_verdicts`, `bm25_topk_fanout`, `docs_sample_hash`) plus
# `bm25_append_compact`, then (3) more never-driver-run round-4
# entries.  Everything below slot 50 holds a green row from an earlier
# driver round or the committed 32-cpu mirror (MIRROR_r04.json —
# 265/265 green in one fresh 32-cpu session, 350 s;
# scripts/driver_mirror.py reproduces it).
QUERIES = {
    "bm25_topk": q_bm25_topk,
    "bm25_topk_wand": q_bm25_topk_wand,
    "lang_counts": q_lang_counts,
    "term_stats": q_term_stats,
    "dedup_docs": q_dedup_docs,
    "minhash_neardup": q_minhash_neardup,
    "ann_topk": q_ann_topk,
    "url_dedup": q_url_dedup,
    # ^ flagship core pinned at the head of the driver window: the
    # engine-identity rows stay driver-green even under a
    # count-limited CORRECTNESS run
    "has_parent_topk": q_has_parent_topk,
    "distinct_ngrams": q_distinct_ngrams,
    "common_terms_topk": q_common_terms_topk,
    "events_rate_weekly": q_events_rate_weekly,
    "events_filters_agg": q_events_filters_agg,
    "line_cluster_sizes": q_line_cluster_sizes,
    # the eight VERDICT-r03-named rows — pinned inside the 50-slot
    # driver window until each holds a driver-green CORRECTNESS row
    "neardup_clusters": q_neardup_clusters,
    "bm25_collapse_neardup": q_bm25_collapse_neardup,
    "bm25_collapse_sidecar": q_bm25_collapse_sidecar,
    "cooccur_pmi": q_cooccur_pmi,
    "claim_verdicts": q_claim_verdicts,
    "bm25_topk_fanout": q_bm25_topk_fanout,
    "docs_sample_hash": q_docs_sample_hash,
    "bm25_append_compact": q_bm25_append_compact,
    "tpch_q7": q_tpch_q7,
    "tpch_q8": q_tpch_q8,
    "tpch_q9": q_tpch_q9,
    "tpch_q22": q_tpch_q22,
    "retrieval_map": q_retrieval_map,
    "retrieval_bpref": q_retrieval_bpref,
    "retrieval_gmap": q_retrieval_gmap,
    "retrieval_iprec": q_retrieval_iprec,
    "retrieval_success": q_retrieval_success,
    "rsj_feedback_topk": q_rsj_feedback_topk,
    "dict_front_coding": q_dict_front_coding,
    "bm25_param_sweep": q_bm25_param_sweep,
    "postings_size_stats": q_postings_size_stats,
    "ltr_rerank": q_ltr_rerank,
    "pl2_topk": q_pl2_topk,
    "dph_topk": q_dph_topk,
    "fusion_combmnz": q_fusion_combmnz,
    "run_randomization_test": q_run_randomization_test,
    "frequent_item_sets": q_frequent_item_sets,
    "mg_heavy_terms": q_mg_heavy_terms,
    "theta_sketch_ops": q_theta_sketch_ops,
    "bigram_llr": q_bigram_llr,
    "wordpiece_pieces": q_wordpiece_pieces,
    "lexical_diversity": q_lexical_diversity,
    "link_adamic_adar": q_link_adamic_adar,
    "events_range_join": q_events_range_join,
    "ann_maxsim": q_ann_maxsim,
    "hybrid_minmax": q_hybrid_minmax,
    "geohash_grid": q_geohash_grid,
    "events_moving_percentile": q_events_moving_percentile,
    "events_bucket_script": q_events_bucket_script,
    "tpch_q13": q_tpch_q13,
    "tpch_q15": q_tpch_q15,
    "tpch_q17": q_tpch_q17,
    "tpch_q18": q_tpch_q18,
    "tpch_q19": q_tpch_q19,
    "tpch_q10": q_tpch_q10,
    "tpch_q14": q_tpch_q14,
    "match_bool_prefix": q_match_bool_prefix,
    "events_rank_lag": q_events_rank_lag,
    "events_cum_users": q_events_cum_users,
    "events_normalize": q_events_normalize,
    "events_stats_bucket": q_events_stats_bucket,
    "events_scripted_metric": q_events_scripted_metric,
    "events_cumulative": q_events_cumulative,
    "geo_distance_rings": q_geo_distance_rings,
    "bloom_join": q_bloom_join,
    "bm25_split_topk": q_bm25_split_topk,
    "query_clarity": q_query_clarity,
    "query_wig_nqc": q_query_wig_nqc,
    "query_preqpp": q_query_preqpp,
    "federated_redde": q_federated_redde,
    "selective_search_topk": q_selective_search_topk,
    "federated_cori": q_federated_cori,
    # round-4 continuation flagships: the three headline retrieval
    # additions of this session, surfaced inside the driver window
    "sdm_topk": q_sdm_topk,
    "intervals_topk": q_intervals_topk,
    "dfr_topk": q_dfr_topk,
    "saat_stored_topk": q_saat_stored_topk,
    "salted_term_cf": q_salted_term_cf,
    "union_source_stats": q_union_source_stats,
    "zipf_fit": q_zipf_fit,
    "heaps_fit": q_heaps_fit,
    "bucketed_join": q_bucketed_join,
    "bm25_distance_feature": q_bm25_distance_feature,
    "bm25_pinned_topk": q_bm25_pinned_topk,
    "kcenter_coreset": q_kcenter_coreset,
    "pca_variance": q_pca_variance,
    "tpch_q6": q_tpch_q6,
    # round-4 late additions (post-window: slots 51+)
    "tpch_q12": q_tpch_q12,
    "tpch_q21": q_tpch_q21,
    "span_within_topk": q_span_within_topk,
    "categorize_text": q_categorize_text,
    "events_ntile": q_events_ntile,
    "events_percentiles_bucket": q_events_percentiles_bucket,
    "events_rollup": q_events_rollup,
    "tpch_q4": q_tpch_q4,
    "events_transitions": q_events_transitions,
    "label_centroid_cosine": q_label_centroid_cosine,
    "bm25_fetch_fields": q_bm25_fetch_fields,
    "geotile_grid": q_geotile_grid,
    "geo_distance_topk": q_geo_distance_topk,
    "geo_bbox_count": q_geo_bbox_count,
    "geo_polygon_count": q_geo_polygon_count,
    "has_child_topk": q_has_child_topk,
    "terms_lookup_topk": q_terms_lookup_topk,
    "csv_source_stats": q_csv_source_stats,
    "ann_hamming": q_ann_hamming,
    "nb_classify": q_nb_classify,
    "line_dedup": q_line_dedup,
    "terms_set_topk": q_terms_set_topk,
    "string_stats_text": q_string_stats_text,
    "mad_chars": q_mad_chars,
    "multi_terms_agg": q_multi_terms_agg,
    "weighted_avg_value": q_weighted_avg_value,
    "bucket_selector_days": q_bucket_selector_days,
    "range_agg_chars": q_range_agg_chars,
    "warc_extract_stats": q_warc_extract_stats,
    "jsonl_lang_counts": q_jsonl_lang_counts,
    "bm25_cached_topk": q_bm25_cached_topk,
    "bm25_bloom_count": q_bm25_bloom_count,
    "ccnet_ppl_buckets": q_ccnet_ppl_buckets,
    "ingest_pipeline": q_ingest_pipeline,
    "events_dense_histogram": q_events_dense_histogram,
    "boxplot_chars": q_boxplot_chars,
    "containment_dedup": q_containment_dedup,
    "span_containing_topk": q_span_containing_topk,
    "unigram_pieces": q_unigram_pieces,
    "unigram_token_counts": q_unigram_token_counts,
    "index_sorted_topk": q_index_sorted_topk,
    "events_serial_diff": q_events_serial_diff,
    "composite_pages": q_composite_pages,
    "span_first_topk": q_span_first_topk,
    "cross_fields_topk": q_cross_fields_topk,
    "extended_stats": q_extended_stats,
    "diversified_sample": q_diversified_sample,
    "dup_ngram_spans": q_dup_ngram_spans,
    "decontaminate": q_decontaminate,
    "canary_scan": q_canary_scan,
    "corpus_checksum": q_corpus_checksum,
    "null_profile": q_null_profile,
    "drift_psi": q_drift_psi,
    "rank_feature_topk": q_rank_feature_topk,
    "events_percentile_ranks": q_events_percentile_ranks,
    "source_lang_kl": q_source_lang_kl,
    "textrank_keywords": q_textrank_keywords,
    "tpch_q5": q_tpch_q5,
    "bm25_update_by_query": q_bm25_update_by_query,
    "query_string_topk": q_query_string_topk,
    "doc_termvectors": q_doc_termvectors,
    "events_anomaly": q_events_anomaly,
    "span_corruption": q_span_corruption,
    "fim_transform": q_fim_transform,
    "events_props_extract": q_events_props_extract,
    "events_auto_histogram": q_events_auto_histogram,
    "highlight_offsets": q_highlight_offsets,
    "bm25_restore_topk": q_bm25_restore_topk,
    "phrase_prefix_topk": q_phrase_prefix_topk,
    "span_not_topk": q_span_not_topk,
    "events_funnel": q_events_funnel,
    "events_retention": q_events_retention,
    "adjacency_matrix": q_adjacency_matrix,
    "matrix_stats": q_matrix_stats,
    "kmeans_clusters": q_kmeans_clusters,
    "semdedup": q_semdedup,
    "ccnet_dedup": q_ccnet_dedup,
    "pii_redact": q_pii_redact,
    "pack_sequences": q_pack_sequences,
    "shuffle_order": q_shuffle_order,
    "pack_windows": q_pack_windows,
    "winnow_fingerprints": q_winnow_fingerprints,
    "c4_filters": q_c4_filters,
    "quality_prune": q_quality_prune,
    "bm25_snapshot_topk": q_bm25_snapshot_topk,
    "hard_negatives": q_hard_negatives,
    "bm25_alias_topk": q_bm25_alias_topk,
    "bm25_rollover_topk": q_bm25_rollover_topk,
    "bm25_routed_topk": q_bm25_routed_topk,
    "bm25_retention_topk": q_bm25_retention_topk,
    "bigram_logloss": q_bigram_logloss,
    "events_top_types_daily": q_events_top_types_daily,
    "events_moving_avg": q_events_moving_avg,
    "events_ewma": q_events_ewma,
    "events_holt": q_events_holt,
    "events_cusum": q_events_cusum,
    "events_holt_winters": q_events_holt_winters,
    "events_sax": q_events_sax,
    "events_decompose": q_events_decompose,
    "events_grouping_sets": q_events_grouping_sets,
    "curriculum_buckets": q_curriculum_buckets,
    "quality_logreg": q_quality_logreg,
    "link_triangles": q_link_triangles,
    "bm25_scroll": q_bm25_scroll,
    "bm25_maxp": q_bm25_maxp,
    "sharded_terms": q_sharded_terms,
    "syngraph_topk": q_syngraph_topk,
    "temperature_mix": q_temperature_mix,
    "tpch_q3": q_tpch_q3,
    "oov_rate": q_oov_rate,
    "mixture_sample": q_mixture_sample,
    "fever_score": q_fever_score,
    "ann_recall": q_ann_recall,
    "ann_hnsw": q_ann_hnsw,
    "ann_recall_hnsw": q_ann_recall_hnsw,
    "cjk_tokens": q_cjk_tokens,
    "events_derivative": q_events_derivative,
    "top_metrics": q_top_metrics,
    "rare_terms": q_rare_terms,
    "length_ttest": q_length_ttest,
    "link_degrees": q_link_degrees,
    "anchor_texts": q_anchor_texts,
    "retrieval_mrr": q_retrieval_mrr,
    "url_canonical": q_url_canonical,
    "domain_cap": q_domain_cap,
    "dsir_weights": q_dsir_weights,
    "token_entropy": q_token_entropy,
    "corpus_curation": q_corpus_curation,
    "link_hits": q_link_hits,
    "bm25_range_filter": q_bm25_range_filter,
    "bm25_boosting": q_bm25_boosting,
    "bm25_histogram": q_bm25_histogram,
    "span_near_topk": q_span_near_topk,
    "span_or_near_topk": q_span_or_near_topk,
    "bm25_pm2": q_bm25_pm2,
    "diversity_eval": q_diversity_eval,
    "bm25_bo1_topk": q_bm25_bo1_topk,
    "bm25_kld_topk": q_bm25_kld_topk,
    "intervals_or_topk": q_intervals_or_topk,
    "bm25plus_topk": q_bm25plus_topk,
    "bm25_pruned_topk": q_bm25_pruned_topk,
    "bm25_rm3_topk": q_bm25_rm3_topk,
    "bm25_count": q_bm25_count,
    "bm25_cardinality": q_bm25_cardinality,
    "bm25_topk_auto": q_bm25_topk_auto,
    "hybrid_rrf": q_hybrid_rrf,
    "kmv_quantiles": q_kmv_quantiles,
    "phrase_topk": q_phrase_topk,
    "boolean_topk": q_boolean_topk,
    "proximity_topk": q_proximity_topk,
    "snippets_topk": q_snippets_topk,
    "wildcard_topk": q_wildcard_topk,
    "fuzzy_topk": q_fuzzy_topk,
    "regex_topk": q_regex_topk,
    "term_autocomplete": q_term_autocomplete,
    "spell_suggest": q_spell_suggest,
    "significant_terms": q_significant_terms,
    "percolate_matches": q_percolate_matches,
    "boolean_msm": q_boolean_msm,
    "sort_by_field": q_sort_by_field,
    "bm25_function_score": q_bm25_function_score,
    "bm25_decay": q_bm25_decay,
    "bm25_explain": q_bm25_explain,
    "ann_pq": q_ann_pq,
    "ann_ivfpq": q_ann_ivfpq,
    "hll_terms_per_lang": q_hll_terms_per_lang,
    "cms_heavy_terms": q_cms_heavy_terms,
    "docs_weighted_sample": q_docs_weighted_sample,
    "gopher_repetition": q_gopher_repetition,
    "unigram_logloss": q_unigram_logloss,
    "doc_keywords": q_doc_keywords,
    "passage_chunks": q_passage_chunks,
    "bpe_merges": q_bpe_merges,
    "bpe_token_counts": q_bpe_token_counts,
    "dedup_keep_best": q_dedup_keep_best,
    "substring_dedup": q_substring_dedup,
    "incremental_neardup": q_incremental_neardup,
    "ann_sq8": q_ann_sq8,
    "eval_contamination": q_eval_contamination,
    "bm25_rescore": q_bm25_rescore,
    "wildcard_trgm_topk": q_wildcard_trgm_topk,
    "boosted_topk": q_boosted_topk,
    "dismax_topk": q_dismax_topk,
    "federated_topk": q_federated_topk,
    "stemmed_topk": q_stemmed_topk,
    "ann_filtered": q_ann_filtered,
    "phrase_suggest": q_phrase_suggest,
    "index_fsck": q_index_fsck,
    "index_segments": q_index_segments,
    "bm25_top_hits": q_bm25_top_hits,
    "bm25_mmr": q_bm25_mmr,
    "link_pagerank": q_link_pagerank,
    "retrieval_ndcg": q_retrieval_ndcg,
    "retrieval_err": q_retrieval_err,
    "retrieval_rbp": q_retrieval_rbp,
    "rank_rbo": q_rank_rbo,
    "judgment_pool": q_judgment_pool,
    "fusion_borda": q_fusion_borda,
    "fusion_condorcet": q_fusion_condorcet,
    "run_sign_test": q_run_sign_test,
    "events_date_range": q_events_date_range,
    "varwidth_histogram": q_varwidth_histogram,
    "bm25f_topk": q_bm25f_topk,
    "bm25_facets": q_bm25_facets,
    "bm25_delete_topk": q_bm25_delete_topk,
    "bm25_expunge_topk": q_bm25_expunge_topk,
    "ngram_jaccard_neardup": q_ngram_jaccard_neardup,
    "simhash_neardup": q_simhash_neardup,
    "embedding_neardup": q_embedding_neardup,
    "pages_retrieval": q_pages_retrieval,
    "doc_length_stats": q_doc_length_stats,
    "top20_terms": q_top20_terms,
    "distinct_terms": q_distinct_terms,
    "collection_stats": q_collection_stats,
    "source_stats": q_source_stats,
    "top5_longest_per_lang": q_top5_longest_per_lang,
    "term_match_join": q_term_match_join,
    "docs_without_terms": q_docs_without_terms,
    "events_hourly": q_events_hourly,
    "events_sessions": q_events_sessions,
    "events_asof": q_events_asof,
    "events_sliding": q_events_sliding,
    "events_quantiles": q_events_quantiles,
    "tpch_q1": q_tpch_q1,
    "nation_revenue": q_nation_revenue,
    "token_counts": q_token_counts,
    "quality": q_quality,
    "fingerprints": q_fingerprints,
    "rolling_fingerprints": q_rolling_fingerprints,
    "langid_predictions": q_langid_predictions,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "ann_recall_lsh": q_ann_recall_lsh,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_audio": q_multimodal_audio,
    "video_frames": q_video_frames,
    "hll_distinct_terms": q_hll_distinct_terms,
    "retrieval_eval": q_retrieval_eval,
    "sentence_topn": q_sentence_topn,
    "bm25_topk_pfor": q_bm25_topk_pfor,
    "tfidf_topk": q_tfidf_topk,
    "lmd_topk": q_lmd_topk,
    "ib_spl_topk": q_ib_spl_topk,
    "lmjm_topk": q_lmjm_topk,
    "f2exp_topk": q_f2exp_topk,
    "saat_topk": q_saat_topk,
    "dfi_topk": q_dfi_topk,
    "synonym_topk": q_synonym_topk,
    "bm25_page2": q_bm25_page2,
    "bm25_collapse": q_bm25_collapse,
    "mlt_topk": q_mlt_topk,
    "docs_stratified_sample": q_docs_stratified_sample,
    "export_shards": q_export_shards,
}

# --- driver CORRECTNESS window rotation (VERDICT r04, next-round #1) ---
# The driver's per-round CORRECTNESS gate is count-limited to the FIRST
# ~50 keys of queries() in insertion order.  Round-5 policy: keep the 8
# flagship-identity pins in slots 0-7, then fill the remaining slots with
# entries that have NEVER earned a driver row in rounds 1-4 (union of
# CORRECTNESS_r0{1..4}.json keys), prioritising the scale-critical
# families the judge named: the dedup chain, partitioned ANN,
# contamination/curation, tokenizer training, fielded/federated/stored
# search, and index-maintenance (delete/expunge/snapshot/rollover).
# Every other entry keeps its original definition order after the window,
# so over rounds the whole registry converges to driver-verified.
_DRIVER_WINDOW: list[str] = [
    # slots 0-7: flagship core (engine identity), pinned every round
    "bm25_topk", "bm25_topk_wand", "lang_counts", "term_stats",
    "dedup_docs", "minhash_neardup", "ann_topk", "url_dedup",
    # VERDICT-r04-named scale-critical, never driver-verified
    "substring_dedup", "incremental_neardup", "ann_ivfpq", "ann_pq",
    "eval_contamination", "bpe_merges", "corpus_curation", "bm25f_topk",
    "federated_topk", "saat_stored_topk", "bm25_delete_topk",
    "bm25_expunge_topk",
    # dedup / curation chain, never driver-verified
    "ccnet_dedup", "containment_dedup", "dedup_keep_best", "line_dedup",
    "semdedup", "dup_ngram_spans", "domain_cap", "c4_filters",
    "gopher_repetition", "decontaminate", "quality_prune",
    # ANN family, never driver-verified
    "ann_sq8", "ann_recall", "kmeans_clusters", "ann_hnsw",
    "ann_recall_hnsw",
    # index maintenance + layouts, never driver-verified
    "bm25_snapshot_topk", "bm25_rollover_topk", "bm25_routed_topk",
    "index_sorted_topk",
    # tokenizer training + CJK analysis, never driver-verified
    "unigram_pieces", "bpe_token_counts", "cjk_tokens",
    # search / ranking family, never driver-verified
    "phrase_topk", "proximity_topk", "sdm_topk", "boolean_topk",
    "hybrid_rrf", "retrieval_ndcg", "fever_score", "link_pagerank",
]

QUERIES = {k: QUERIES[k] for k in _DRIVER_WINDOW} | {
    k: v for k, v in QUERIES.items() if k not in set(_DRIVER_WINDOW)
}

ORACLES = {
    "has_parent_topk": _sql_has_parent_topk(),
    "distinct_ngrams": SQL_DISTINCT_NGRAMS,
    "common_terms_topk": SQL_COMMON_TERMS_TOPK,
    "events_rate_weekly": SQL_EVENTS_RATE_WEEKLY,
    "events_filters_agg": SQL_EVENTS_FILTERS_AGG,
    "line_cluster_sizes": SQL_LINE_CLUSTER_SIZES,
    "tpch_q7": SQL_TPCH_Q7,
    "tpch_q8": SQL_TPCH_Q8,
    "tpch_q9": SQL_TPCH_Q9,
    "tpch_q22": _sql_tpch_q22(),
    "retrieval_map": _map_sql(_BM25_QUERIES),
    "retrieval_bpref": SQL_RETRIEVAL_BPREF,
    "retrieval_gmap": SQL_RETRIEVAL_GMAP,
    "retrieval_iprec": SQL_RETRIEVAL_IPREC,
    "retrieval_success": SQL_RETRIEVAL_SUCCESS,
    "rsj_feedback_topk": SQL_RSJ_FEEDBACK_TOPK,
    "dict_front_coding": SQL_DICT_FRONT_CODING,
    "bm25_param_sweep": SQL_BM25_PARAM_SWEEP,
    "postings_size_stats": SQL_POSTINGS_SIZE_STATS,
    "ltr_rerank": SQL_LTR_RERANK,
    "hybrid_minmax": _sql_hybrid_minmax(),
    "geohash_grid": _sql_geohash_grid(),
    "events_moving_percentile": SQL_EVENTS_MOVING_PCTL,
    "events_bucket_script": SQL_EVENTS_BUCKET_SCRIPT,
    "tpch_q13": SQL_TPCH_Q13,
    "tpch_q15": SQL_TPCH_Q15,
    "tpch_q17": SQL_TPCH_Q17,
    "tpch_q18": SQL_TPCH_Q18,
    "tpch_q19": _sql_tpch_q19(),
    "tpch_q10": SQL_TPCH_Q10,
    "tpch_q14": SQL_TPCH_Q14,
    "match_bool_prefix": _sql_match_bool_prefix(_BOOL_PREFIX_QUERIES),
    "events_rank_lag": SQL_EVENTS_RANK_LAG,
    "events_cum_users": SQL_EVENTS_CUM_USERS,
    "events_normalize": SQL_EVENTS_NORMALIZE,
    "events_stats_bucket": SQL_EVENTS_STATS_BUCKET,
    "events_scripted_metric": SQL_EVENTS_SCRIPTED_METRIC,
    "events_cumulative": SQL_EVENTS_CUMULATIVE,
    "geo_distance_rings": _sql_geo_distance_rings(),
    "bloom_join": SQL_BLOOM_JOIN,
    "bm25_split_topk": SQL_BM25_TOPK,
    "query_clarity": _sql_query_clarity(),
    "query_wig_nqc": _sql_query_wig_nqc(),
    "query_preqpp": _sql_query_preqpp(),
    "diversity_eval": _sql_diversity_eval(),
    "bm25_bo1_topk": SQL_BM25_BO1_TOPK,
    "bm25_kld_topk": SQL_BM25_KLD_TOPK,
    "federated_redde": _sql_federated_redde(),
    "selective_search_topk": _sql_selective_search(),
    "federated_cori": _sql_federated_cori(),
    "salted_term_cf": SQL_SALTED_TERM_CF,
    "union_source_stats": SQL_UNION_SOURCE_STATS,
    "zipf_fit": SQL_ZIPF_FIT,
    "heaps_fit": SQL_HEAPS_FIT,
    "bucketed_join": _sql_bucketed_join(),
    "bm25_distance_feature": _sql_bm25_distance_feature(_BM25_QUERIES),
    "bm25_pinned_topk": _sql_bm25_pinned_topk(),
    "tpch_q12": _sql_tpch_q12(),
    "tpch_q21": _sql_tpch_q21(),
    "span_within_topk": SQL_SPAN_WITHIN_TOPK,
    "categorize_text": SQL_CATEGORIZE_TEXT,
    "events_ntile": SQL_EVENTS_NTILE,
    "events_percentiles_bucket": SQL_EVENTS_PERCENTILES_BUCKET,
    "events_rollup": SQL_EVENTS_ROLLUP,
    "tpch_q6": SQL_TPCH_Q6,
    "tpch_q4": SQL_TPCH_Q4,
    "events_transitions": SQL_EVENTS_TRANSITIONS,
    "label_centroid_cosine": SQL_LABEL_CENTROID_COSINE,
    "bm25_fetch_fields": _sql_bm25_fetch_fields(),
    "geotile_grid": _sql_geotile_grid(),
    "geo_distance_topk": _sql_geo_distance_topk(),
    "geo_bbox_count": _sql_geo_bbox_count(),
    "geo_polygon_count": _sql_geo_polygon_count(),
    "has_child_topk": _sql_has_child_topk(),
    "terms_lookup_topk": SQL_TERMS_LOOKUP_TOPK,
    "csv_source_stats": SQL_CSV_SOURCE_STATS,
    "ann_hamming": SQL_ANN_HAMMING,
    "nb_classify": SQL_NB_CLASSIFY,
    "line_dedup": SQL_LINE_DEDUP,
    "terms_set_topk": SQL_TERMS_SET_TOPK,
    "string_stats_text": SQL_STRING_STATS_TEXT,
    "mad_chars": SQL_MAD_CHARS,
    "multi_terms_agg": SQL_MULTI_TERMS_AGG,
    "frequent_item_sets": SQL_FREQUENT_ITEM_SETS,
    "mg_heavy_terms": SQL_MG_HEAVY_TERMS,
    "theta_sketch_ops": SQL_THETA_SKETCH_OPS,
    "weighted_avg_value": SQL_WEIGHTED_AVG_VALUE,
    "bucket_selector_days": SQL_BUCKET_SELECTOR_DAYS,
    "range_agg_chars": SQL_RANGE_AGG_CHARS,
    "warc_extract_stats": SQL_WARC_EXTRACT_STATS,
    "jsonl_lang_counts": SQL_JSONL_LANG_COUNTS,
    "bm25_cached_topk": SQL_BM25_TOPK,
    "bm25_bloom_count": SQL_BM25_BLOOM_COUNT,
    "ccnet_ppl_buckets": SQL_CCNET_PPL_BUCKETS,
    "ingest_pipeline": SQL_INGEST_PIPELINE,
    "events_dense_histogram": SQL_EVENTS_DENSE_HISTOGRAM,
    "boxplot_chars": SQL_BOXPLOT_CHARS,
    "containment_dedup": SQL_CONTAINMENT_DEDUP,
    "span_containing_topk": SQL_SPAN_CONTAINING_TOPK,
    "index_sorted_topk": SQL_INDEX_SORTED_TOPK,
    "events_serial_diff": SQL_EVENTS_SERIAL_DIFF,
    "composite_pages": SQL_COMPOSITE_PAGES,
    "span_first_topk": SQL_SPAN_FIRST_TOPK,
    "cross_fields_topk": SQL_CROSS_FIELDS_TOPK,
    "extended_stats": SQL_EXTENDED_STATS,
    "diversified_sample": SQL_DIVERSIFIED_SAMPLE,
    "dup_ngram_spans": SQL_DUP_NGRAM_SPANS,
    "decontaminate": SQL_DECONTAMINATE,
    "canary_scan": SQL_CANARY_SCAN,
    "corpus_checksum": SQL_CORPUS_CHECKSUM,
    "null_profile": SQL_NULL_PROFILE,
    "drift_psi": SQL_DRIFT_PSI,
    "rank_feature_topk": SQL_RANK_FEATURE_TOPK,
    "events_percentile_ranks": SQL_EVENTS_PERCENTILE_RANKS,
    "source_lang_kl": SQL_SOURCE_LANG_KL,
    "tpch_q5": SQL_TPCH_Q5,
    "bm25_update_by_query": SQL_BM25_UPDATE_BY_QUERY,
    "query_string_topk": SQL_QUERY_STRING_TOPK,
    "doc_termvectors": SQL_DOC_TERMVECTORS,
    "events_anomaly": SQL_EVENTS_ANOMALY,
    "span_corruption": SQL_SPAN_CORRUPTION,
    "fim_transform": SQL_FIM_TRANSFORM,
    "events_props_extract": SQL_EVENTS_PROPS_EXTRACT,
    "events_auto_histogram": SQL_EVENTS_AUTO_HISTOGRAM,
    "highlight_offsets": SQL_HIGHLIGHT_OFFSETS,
    "bm25_restore_topk": SQL_BM25_SNAPSHOT_TOPK,
    "phrase_prefix_topk": SQL_PHRASE_PREFIX_TOPK,
    "span_not_topk": SQL_SPAN_NOT_TOPK,
    "events_funnel": SQL_EVENTS_FUNNEL,
    "events_retention": SQL_EVENTS_RETENTION,
    "events_derivative": SQL_EVENTS_DERIVATIVE,
    "adjacency_matrix": SQL_ADJACENCY_MATRIX,
    "matrix_stats": SQL_MATRIX_STATS,
    "top_metrics": SQL_TOP_METRICS,
    "rare_terms": SQL_RARE_TERMS,
    "length_ttest": SQL_LENGTH_TTEST,
    "link_degrees": SQL_LINK_DEGREES,
    "ccnet_dedup": SQL_CCNET_DEDUP,
    "pii_redact": SQL_PII_REDACT,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "shuffle_order": SQL_SHUFFLE_ORDER,
    "pack_windows": SQL_PACK_WINDOWS,
    "c4_filters": SQL_C4_FILTERS,
    "quality_prune": SQL_QUALITY_PRUNE,
    "bm25_snapshot_topk": SQL_BM25_SNAPSHOT_TOPK,
    "hard_negatives": SQL_HARD_NEGATIVES,
    "bm25_alias_topk": SQL_BM25_TOPK,
    "bm25_rollover_topk": SQL_BM25_ROLLOVER_TOPK,
    "bm25_routed_topk": SQL_BM25_ROUTED_TOPK,
    "bm25_retention_topk": SQL_BM25_RETENTION_TOPK,
    "bigram_logloss": SQL_BIGRAM_LOGLOSS,
    "bigram_llr": SQL_BIGRAM_LLR,
    "wordpiece_pieces": SQL_WORDPIECE_PIECES,
    "lexical_diversity": SQL_LEXICAL_DIVERSITY,
    "events_top_types_daily": SQL_EVENTS_TOP_TYPES_DAILY,
    "events_moving_avg": SQL_EVENTS_MOVING_AVG,
    "events_ewma": SQL_EVENTS_EWMA,
    "events_holt": SQL_EVENTS_HOLT,
    "events_cusum": SQL_EVENTS_CUSUM,
    "events_holt_winters": SQL_EVENTS_HOLT_WINTERS,
    "events_sax": SQL_EVENTS_SAX,
    "events_decompose": SQL_EVENTS_DECOMPOSE,
    "events_grouping_sets": SQL_EVENTS_GROUPING_SETS,
    "curriculum_buckets": SQL_CURRICULUM_BUCKETS,
    "link_triangles": SQL_LINK_TRIANGLES,
    "bm25_scroll": SQL_BM25_SCROLL,
    "bm25_maxp": SQL_BM25_MAXP,
    "sharded_terms": SQL_SHARDED_TERMS,
    "syngraph_topk": SQL_SYNGRAPH_TOPK,
    "temperature_mix": SQL_TEMPERATURE_MIX,
    "tpch_q3": SQL_TPCH_Q3,
    "oov_rate": SQL_OOV_RATE,
    "mixture_sample": SQL_MIXTURE_SAMPLE,
    "lang_counts": SQL_LANG_COUNTS,
    "doc_length_stats": SQL_DOC_LENGTH_STATS,
    "term_stats": SQL_TERM_STATS,
    "top20_terms": SQL_TOP20_TERMS,
    "distinct_terms": SQL_DISTINCT_TERMS,
    "collection_stats": SQL_COLLECTION_STATS,
    "dedup_docs": SQL_DEDUP_DOCS,
    "source_stats": SQL_SOURCE_STATS,
    "top5_longest_per_lang": SQL_TOP5_LONGEST_PER_LANG,
    "term_match_join": SQL_TERM_MATCH_JOIN,
    "docs_without_terms": SQL_DOCS_WITHOUT_TERMS,
    "events_hourly": SQL_EVENTS_HOURLY,
    "events_sessions": SQL_EVENTS_SESSIONS,
    "events_asof": SQL_EVENTS_ASOF,
    "events_range_join": SQL_EVENTS_RANGE_JOIN,
    "events_sliding": SQL_EVENTS_SLIDING,
    "events_quantiles": SQL_EVENTS_QUANTILES,
    "tpch_q1": SQL_TPCH_Q1,
    "nation_revenue": SQL_NATION_REVENUE,
    "token_counts": SQL_TOKEN_COUNTS,
    "quality": SQL_QUALITY,
    "fingerprints": SQL_FINGERPRINTS,
    "ann_topk": SQL_ANN_TOPK,
    "ann_maxsim": SQL_ANN_MAXSIM,
    "embedding_neardup": SQL_EMBEDDING_NEARDUP,
    "bm25_topk": SQL_BM25_TOPK,
    # WAND is pruning-only (pytest: ≡ exhaustive) and pfor is a storage
    # codec (scores invariant), so the exact-BM25 SQL is their oracle too
    "bm25_topk_wand": SQL_BM25_TOPK,
    "bm25_topk_pfor": SQL_BM25_TOPK,
    "bm25_topk_fanout": SQL_BM25_TOPK,
    # append+compact must be rank/score-identical to a from-scratch build
    "bm25_append_compact": SQL_BM25_TOPK,
    "docs_sample_hash": SQL_DOCS_SAMPLE_HASH,
    "docs_weighted_sample": SQL_DOCS_WEIGHTED_SAMPLE,
    "gopher_repetition": SQL_GOPHER_REPETITION,
    "unigram_logloss": SQL_UNIGRAM_LOGLOSS,
    "doc_keywords": SQL_DOC_KEYWORDS,
    "passage_chunks": SQL_PASSAGE_CHUNKS,
    "phrase_topk": SQL_PHRASE_TOPK,
    "boolean_topk": SQL_BOOLEAN_TOPK,
    "proximity_topk": SQL_PROXIMITY_TOPK,
    "snippets_topk": SQL_SNIPPETS_TOPK,
    "wildcard_topk": SQL_WILDCARD_TOPK,
    "fuzzy_topk": SQL_FUZZY_TOPK,
    "regex_topk": SQL_REGEX_TOPK,
    "term_autocomplete": SQL_TERM_AUTOCOMPLETE,
    "spell_suggest": SQL_SPELL_SUGGEST,
    "significant_terms": SQL_SIGNIFICANT_TERMS,
    "percolate_matches": SQL_PERCOLATE_MATCHES,
    "boolean_msm": SQL_BOOLEAN_MSM,
    "sort_by_field": SQL_SORT_BY_FIELD,
    "bm25_function_score": SQL_BM25_FUNCTION_SCORE,
    "bm25_decay": SQL_BM25_DECAY,
    "bm25_explain": SQL_BM25_EXPLAIN,
    "eval_contamination": SQL_EVAL_CONTAMINATION,
    "bm25_rescore": SQL_BM25_RESCORE,
    "wildcard_trgm_topk": SQL_WILDCARD_TRGM_TOPK,
    "boosted_topk": SQL_BOOSTED_TOPK,
    "dismax_topk": SQL_DISMAX_TOPK,
    "federated_topk": SQL_FEDERATED_TOPK,
    "ann_filtered": SQL_ANN_FILTERED,
    "phrase_suggest": SQL_PHRASE_SUGGEST,
    "index_fsck": SQL_INDEX_FSCK,
    "index_segments": SQL_INDEX_SEGMENTS,
    "bm25_top_hits": SQL_BM25_TOP_HITS,
    "bm25_collapse_neardup": SQL_BM25_COLLAPSE_NEARDUP,
    "cooccur_pmi": SQL_COOCCUR_PMI,
    "link_pagerank": SQL_LINK_PAGERANK,
    "anchor_texts": SQL_ANCHOR_TEXTS,
    "retrieval_mrr": SQL_RETRIEVAL_MRR,
    "url_canonical": SQL_URL_CANONICAL,
    "domain_cap": SQL_DOMAIN_CAP,
    "dsir_weights": SQL_DSIR_WEIGHTS,
    "token_entropy": SQL_TOKEN_ENTROPY,
    "corpus_curation": SQL_CORPUS_CURATION,
    "link_hits": SQL_LINK_HITS,
    "link_adamic_adar": SQL_LINK_ADAMIC_ADAR,
    "bm25_range_filter": SQL_BM25_RANGE_FILTER,
    "bm25_boosting": SQL_BM25_BOOSTING,
    "bm25_histogram": SQL_BM25_HISTOGRAM,
    "span_near_topk": SQL_SPAN_NEAR_TOPK,
    "intervals_topk": SQL_INTERVALS_TOPK,
    "span_or_near_topk": SQL_SPAN_OR_NEAR_TOPK,
    "sdm_topk": SQL_SDM_TOPK,
    "intervals_or_topk": SQL_INTERVALS_OR_TOPK,
    "bm25plus_topk": SQL_BM25PLUS_TOPK,
    "bm25_pruned_topk": SQL_BM25_PRUNED_TOPK,
    "bm25_rm3_topk": SQL_BM25_RM3_TOPK,
    "retrieval_ndcg": SQL_RETRIEVAL_NDCG,
    "retrieval_err": SQL_RETRIEVAL_ERR,
    "retrieval_rbp": SQL_RETRIEVAL_RBP,
    "rank_rbo": SQL_RANK_RBO,
    "judgment_pool": SQL_JUDGMENT_POOL,
    "fusion_borda": SQL_FUSION_BORDA,
    "fusion_condorcet": SQL_FUSION_CONDORCET,
    "fusion_combmnz": SQL_FUSION_COMBMNZ,
    "run_sign_test": SQL_RUN_SIGN_TEST,
    "run_randomization_test": SQL_RUN_RANDOMIZATION_TEST,
    "events_date_range": SQL_EVENTS_DATE_RANGE,
    "bm25f_topk": SQL_BM25F_TOPK,
    "bm25_facets": SQL_BM25_FACETS,
    "bm25_delete_topk": SQL_BM25_DELETE_TOPK,
    "bm25_expunge_topk": SQL_BM25_EXPUNGE_TOPK,
    "tfidf_topk": SQL_TFIDF_TOPK,
    "lmd_topk": SQL_LMD_TOPK,
    "dfr_topk": SQL_DFR_TOPK,
    "ib_spl_topk": SQL_IB_SPL_TOPK,
    "dfi_topk": SQL_DFI_TOPK,
    "lmjm_topk": SQL_LMJM_TOPK,
    "f2exp_topk": SQL_F2EXP_TOPK,
    "pl2_topk": SQL_PL2_TOPK,
    "dph_topk": SQL_DPH_TOPK,
    "saat_topk": SQL_SAAT_TOPK,
    "saat_stored_topk": SQL_SAAT_STORED_TOPK,
    "synonym_topk": SQL_SYNONYM_TOPK,
    "bm25_page2": SQL_BM25_PAGE2,
    "bm25_collapse": SQL_BM25_COLLAPSE,
    "bm25_collapse_sidecar": SQL_BM25_COLLAPSE,
    "mlt_topk": SQL_MLT_TOPK,
    "docs_stratified_sample": SQL_DOCS_STRATIFIED_SAMPLE,
    "export_shards": SQL_EXPORT_SHARDS,
    "bm25_count": SQL_BM25_COUNT,
    "bm25_cardinality": SQL_BM25_CARDINALITY,
    "bm25_topk_auto": SQL_BM25_TOPK,
    "hybrid_rrf": SQL_HYBRID_RRF,
    "kmv_quantiles": SQL_KMV_QUANTILES,
    "langid_predictions": SQL_LANGID_PREDICTIONS,
    "multimodal_decode": SQL_MULTIMODAL_DECODE,
    "multimodal_audio": SQL_MULTIMODAL_AUDIO,
    "video_frames": SQL_VIDEO_FRAMES,
    "minhash_neardup": SQL_MINHASH_NEARDUP,
    "substring_dedup": SQL_SUBSTRING_DEDUP,
    "incremental_neardup": SQL_INCREMENTAL_NEARDUP,
    "neardup_clusters": SQL_NEARDUP_CLUSTERS,
    "dedup_keep_best": SQL_DEDUP_KEEP_BEST,
    "ngram_jaccard_neardup": SQL_NGRAM_JACCARD_NEARDUP,
    "url_dedup": SQL_URL_DEDUP,
    "sentence_topn": SQL_SENTENCE_TOPN,
    # simhash_neardup, pages_retrieval, retrieval_eval, hll_distinct_terms:
    # pinned-golden VALUES oracles from the single-process reference
    # implementation (pipelines/pinned.py), attached in ORACLES_PINNED
}


def pinned_oracles() -> dict[str, str]:
    """Oracles whose SQL is the committed output of the single-process
    pure-Python reference implementation (SURVEY.md §5.3 family) inlined
    as VALUES — used for ops whose semantics are not expressible in
    DuckDB SQL (custom 64-bit hashes, HLL, the full fixture pipeline).
    ``stemmed_topk`` rides here too: its SQL embeds the pinned stemmer's
    (term -> stem) map over the oracle corpus vocabulary (computed
    lazily — one corpus read — and disk-cached like the VALUES family)."""
    from .. import pinned

    out = pinned.oracle_values_sql()
    try:
        fp = (
            pinned._file_fingerprint(
                os.path.join(pinned.ORACLE_SF_DIR, "documents.parquet")
            )
            + f"|stem-{_stem_fp_tag()}|" + pinned.PINNED_VERSION
        )
    except OSError:
        return out
    out["stemmed_topk"] = pinned._cached("stemmed_topk", fp, _stemmed_topk_sql)
    try:
        fp_mmr = (
            pinned._file_fingerprint(
                os.path.join(pinned.ORACLE_SF_DIR, "documents.parquet")
            )
            + "|"
            + pinned._file_fingerprint(
                os.path.join(pinned.ORACLE_SF_DIR, "embeddings.parquet")
            )
            + f"|mmr-{_MMR_LAMBDA}-{_MMR_WINDOW}-{_MMR_K}|"
            + pinned.PINNED_VERSION
        )
    except OSError:
        return out
    out["bm25_mmr"] = pinned._cached(
        "bm25_mmr", fp_mmr,
        lambda: pinned.values_sql(pinned.serial_bm25_mmr(
            pinned.ORACLE_SF_DIR, _BM25_QUERIES[:3],
            window=_MMR_WINDOW, k=_MMR_K, lam=_MMR_LAMBDA,
        )),
    )
    try:
        fp_pm2 = (
            pinned._file_fingerprint(
                os.path.join(pinned.ORACLE_SF_DIR, "documents.parquet")
            )
            + f"|pm2-0.7-{_PM2_WINDOW}|"
            + pinned.PINNED_VERSION
        )
    except OSError:
        return out
    out["bm25_pm2"] = pinned._cached(
        "bm25_pm2", fp_pm2,
        lambda: pinned.values_sql(pinned.serial_bm25_pm2(
            pinned.ORACLE_SF_DIR, _BM25_QUERIES[:4],
            window=_PM2_WINDOW, k=10,
        )),
    )
    return out


from ._nsacc import export as _ns_export

_ns_export(globals())
del _ns_export
