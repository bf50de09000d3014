# Part 02/11 of the former single-module pipelines/queries.py
# (mechanical split, round 5 — VERDICT r04 next-round #6).  Parts share
# ONE late-bound namespace via _nsacc: globals are seeded from the
# accumulator before this body runs (preserving original top-level
# execution order) and the final merged namespace is injected back into
# every part by __init__, so call-time forward references behave exactly
# as in the single file.  Original lines 2388-4513.
from __future__ import annotations

from ._nsacc import NS as _ns_seed

globals().update(_ns_seed)
del _ns_seed



# ------------------------------------------------------------ TPC-H shapes

def q_tpch_q1(sf_dir: str):
    ds = read_table(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        return batch.append_column("rev", rev)

    out = (
        ds.map_batches(revenue, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sq"),
            Sum("rev", alias_name="sr"),
            Count(alias_name="n"),
        )
        .to_pandas()
    )
    out["sum_qty"] = np.round(out["sq"], 2)
    out["sum_revenue"] = np.round(out["sr"], 2)
    return out[["l_returnflag", "l_linestatus", "sum_qty", "sum_revenue", "n"]]


SQL_TPCH_Q1 = (
    "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, "
    "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue, "
    "count(*) AS n FROM lineitem GROUP BY l_returnflag, l_linestatus"
)


def q_nation_revenue(sf_dir: str):
    """orders |><| customer via Dataset.join (hash-partitioned), then the
    tiny nation table broadcast — both join patterns in one pipeline."""
    orders = read_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    # join aggregator actors need CPU slots alongside the map stages: size
    # num_partitions to the cluster or the pipeline deadlocks on tiny CPUs
    n_cpu = int(ray.cluster_resources().get("CPU", 4))
    joined = orders.join(
        cust,
        "inner",
        num_partitions=max(2, min(8, n_cpu // 2)),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    nation = {
        r["n_nationkey"]: r["n_name"]
        for r in read_table(sf_dir, "nation").take_all()
    }
    ref = ray.put(nation)

    def add_nation(batch: pa.Table) -> pa.Table:
        nmap = ray.get(ref)
        names = [nmap[k] for k in batch["c_nationkey"].to_pylist()]
        return batch.append_column("n_name", pa.array(names, pa.string()))

    out = (
        joined.map_batches(add_nation, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("o_totalprice", alias_name="rev"), Count(alias_name="n_orders"))
        .to_pandas()
    )
    out["revenue"] = np.round(out["rev"], 2)
    return out[["n_name", "revenue", "n_orders"]]


SQL_NATION_REVENUE = (
    "SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders "
    "FROM orders JOIN customer ON o_custkey = c_custkey "
    "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
)


_Q3_SEGMENT = "BUILDING"
_Q3_DATE = "1998-06-01"


def q_tpch_q3(sf_dir: str):
    """TPC-H Q3 (shipping-priority): top-10 open orders of one market
    segment by lineitem revenue.  The canonical two-hash-join plan with
    every filter pushed below the joins: customer filters to the
    segment BEFORE the first join, orders filters on date at the read,
    lineitem likewise; revenue pre-aggregates per (orderkey, batch)
    inside map_batches before the final groupby, so the exchange
    carries one row per order per batch, not one per lineitem.  The
    top-10 cut runs on the reduced per-order table (|orders| rows, not
    |lineitems|) under the rounded-revenue tie policy (date, orderkey
    ascending)."""
    n_cpu = int(ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(8, n_cpu // 2))
    # repartition after the selective filter: schema-less empty blocks
    # from an oversplit read poison the hash-shuffle join (see tpch_q5)
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).filter(
        expr=f"c_mktsegment == '{_Q3_SEGMENT}'"
    ).repartition(max(2, nparts // 2))
    cut = pa.scalar(
        np.datetime64(_Q3_DATE, "us").item(), pa.timestamp("us")
    )
    orders = read_table(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"], cut)),
        batch_format="pyarrow",
    )
    line = read_table(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(
        lambda t: t.filter(pc.greater(t["l_shipdate"], cut)),
        batch_format="pyarrow",
    )

    def rev_part(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), batch["l_discount"]),
        )
        t = pa.table({"l_orderkey": batch["l_orderkey"], "rev_p": rev})
        return t.group_by("l_orderkey").aggregate([("rev_p", "sum")]).rename_columns(
            ["l_orderkey", "rev_p"]
        )

    oc = orders.join(
        cust, "inner", num_partitions=nparts,
        on=("o_custkey",), right_on=("c_custkey",),
    ).select_columns(["o_orderkey", "o_orderdate"])
    lrev = line.map_batches(rev_part, batch_format="pyarrow")
    j = lrev.join(
        oc, "inner", num_partitions=nparts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    out = (
        j.groupby(["l_orderkey", "o_orderdate"])
        .aggregate(Sum("rev_p", alias_name="rev"))
        .to_pandas()
    )
    out["revenue"] = np.round(out["rev"], 2)
    out = out.sort_values(
        ["revenue", "o_orderdate", "l_orderkey"],
        ascending=[False, True, True],
    ).head(10).reset_index(drop=True)
    return out[["l_orderkey", "revenue", "o_orderdate"]]


SQL_TPCH_Q3 = (
    "SELECT l_orderkey, revenue, o_orderdate FROM ("
    "SELECT l_orderkey, "
    "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
    "o_orderdate "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    f"WHERE c_mktsegment = '{_Q3_SEGMENT}' "
    f"AND o_orderdate < TIMESTAMP '{_Q3_DATE}' "
    f"AND l_shipdate > TIMESTAMP '{_Q3_DATE}' "
    "GROUP BY l_orderkey, o_orderdate "
    "ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10)"
)


# ----------------------------------------------------- text analysis suite

def q_token_counts(sf_dir: str):
    def counts(batch: pa.Table) -> pa.Table:
        _, _, doc_len = flatten_tokens(batch["text"])
        return pa.table(
            {"doc_id": batch["doc_id"], "n_tokens": pa.array(doc_len.astype(np.int64))}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(counts, batch_format="pyarrow")


SQL_TOKEN_COUNTS = (
    f"WITH toks AS ({_TOKS_SQL}) "
    "SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY doc_id"
)


def q_token_entropy(sf_dir: str):
    """Per-doc Shannon entropy of the token distribution (nats) — the
    low-entropy filter signal: near-zero means a page is one token
    repeated (spam/boilerplate), high means diverse vocabulary.  Runs
    entirely inside map_batches: the per-batch (doc, term, tf) Arrow
    group table feeds one vectorized p·ln p + groupby-sum — docs never
    span batches, so there is NO shuffle at all.  Rounded to 6 dp on
    both sides per the module float policy."""

    from ...functions.textstats import doc_entropy_batch

    def ent(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "entropy": pa.array([], pa.float64()),
            })
        ids, _, entropy = doc_entropy_batch(batch["text"], batch["doc_id"])
        return pa.table({
            "doc_id": pa.array(ids),
            "entropy": pa.array(entropy),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ent, batch_format="pyarrow"
    )


SQL_TOKEN_ENTROPY = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
    "GROUP BY doc_id, term), "
    "dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id) "
    "SELECT tf.doc_id, round(-sum((tf.tf::DOUBLE / dl.dl) * "
    "ln(tf.tf::DOUBLE / dl.dl)), 6) AS entropy "
    "FROM tf JOIN dl USING (doc_id) GROUP BY tf.doc_id"
)


def q_quality_prune(sf_dir: str):
    """Median-threshold quality pruning — the two-pass distributed
    selection shape (aggregate -> broadcast threshold -> filter): keep
    the docs whose token entropy is at or above the corpus median.

    Pass 1 computes per-doc entropy shuffle-free (token_entropy's
    kernel), quantizes to centinat buckets (floor(entropy*100), an
    identical IEEE float64 op in numpy and DuckDB — round() would
    diverge on half-way cases), and folds a BOUNDED histogram (the
    entropy range caps the bucket count at a few thousand regardless of
    corpus size) through one tiny Sum groupby; the driver walks the
    histogram for the lower-median bucket and broadcasts ONE scalar.
    Pass 2 filters and counts survivors per lang.  No O(rows) driver
    state at any scale."""
    from ray.data.aggregate import Sum

    from ...functions.textstats import doc_entropy_batch

    def ent_q(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "lang": pa.array([], pa.string()),
                "qe": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ids, _, ent = doc_entropy_batch(batch["text"], batch["doc_id"])
        if not len(ids):
            return empty
        qe = np.floor(ent * 100.0).astype(np.int64)
        lang_map = dict(
            zip(batch["doc_id"].to_pylist(), batch["lang"].to_pylist())
        )
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "lang": pa.array([lang_map[i] for i in ids], pa.string()),
                "qe": pa.array(qe),
            }
        )

    scored = (
        _docs(sf_dir, ["doc_id", "lang", "text"])
        .map_batches(ent_q, batch_format="pyarrow")
        .materialize()
    )

    def hist(batch: pa.Table) -> pa.Table:
        t = (
            batch.select(["qe"])
            .group_by("qe")
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"qe": t["qe"], "c": pc.cast(t["count_all"], pa.int64())}
        )

    h = (
        scored.map_batches(hist, batch_format="pyarrow")
        .groupby("qe")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("qe")
    )
    n = int(h["c"].sum())
    cum = h["c"].cumsum().to_numpy()
    thr = int(h["qe"].to_numpy()[np.searchsorted(cum, (n + 1) // 2)])

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["qe"], pa.scalar(thr)))

    out = (
        scored.map_batches(keep, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    return out.sort_values("lang").reset_index(drop=True)


SQL_QUALITY_PRUNE = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
    "GROUP BY doc_id, term), "
    "dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id), "
    "ent AS (SELECT tf.doc_id, round(-sum((tf.tf::DOUBLE / dl.dl) * "
    "ln(tf.tf::DOUBLE / dl.dl)), 6) AS entropy "
    "FROM tf JOIN dl USING (doc_id) GROUP BY tf.doc_id), "
    "q AS (SELECT doc_id, CAST(floor(entropy * 100.0) AS BIGINT) AS qe "
    "FROM ent), "
    "m AS (SELECT min(qe) AS thr FROM (SELECT qe, "
    "sum(count(*)) OVER (ORDER BY qe) AS cum, "
    "(SELECT (count(*) + 1) // 2 FROM q) AS half "
    "FROM q GROUP BY qe) WHERE cum >= half) "
    "SELECT d.lang, CAST(count(*) AS BIGINT) AS n "
    "FROM documents d JOIN q ON d.doc_id = q.doc_id, m "
    "WHERE q.qe >= m.thr GROUP BY d.lang"
)


_CCNET_WINDOW = 3
# the span-key pack multiplier, single-sourced from the engine so a
# widened pack (bumped _SPAN_SHIFT) can never desynchronize the SQL
_CCNET_PACK = 1 << dedup._SPAN_SHIFT


_OOV_VOCAB = 100


def q_oov_rate(sf_dir: str):
    """Tokenizer-vocabulary coverage (the fertility/OOV audit every
    tokenizer change needs): build the top-V corpus vocabulary by
    collection frequency (ties by term), then measure the fraction of
    token OCCURRENCES outside it, per lang.  Two-pass broadcast shape:
    the (term, cf) table pre-reduces per batch before one small
    groupby; the driver holds only the V winning terms and broadcasts
    them into a vectorized is_in filter."""
    from ray.data.aggregate import Sum

    def tf_part(batch: pa.Table) -> pa.Table:
        terms, _, _ = flatten_tokens(batch["text"])
        t = pa.table({"term": terms}).group_by("term").aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"term": t["term"], "cf": pc.cast(t["count_all"], pa.int64())}
        )

    docs = _docs(sf_dir, ["doc_id", "lang", "text"])
    cf = (
        docs.map_batches(tf_part, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cf", alias_name="cf"))
        .to_pandas()
    )
    cf = cf.sort_values(["cf", "term"], ascending=[False, True])
    vocab = set(cf["term"].head(_OOV_VOCAB))
    vset = pa.array(sorted(vocab))  # built once, shipped in the closure

    def count(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lang": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
                "n_oov": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        terms, row_idx, _ = flatten_tokens(batch["text"])
        if not len(terms):
            return empty
        oov = ~pc.is_in(terms, value_set=vset).to_numpy(
            zero_copy_only=False
        )
        langs = np.asarray(batch["lang"].to_pylist(), dtype=object)[row_idx]
        df = pd.DataFrame({"lang": langs, "oov": oov})
        agg = df.groupby("lang", as_index=False).agg(
            n_tokens=("oov", "size"), n_oov=("oov", "sum")
        )
        return pa.table(
            {
                "lang": pa.array(agg["lang"], pa.string()),
                "n_tokens": pa.array(agg["n_tokens"].to_numpy(np.int64)),
                "n_oov": pa.array(agg["n_oov"].to_numpy(np.int64)),
            }
        )

    out = (
        docs.map_batches(count, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_oov", alias_name="n_oov"),
        )
        .to_pandas()
    )
    out["oov_rate"] = np.round(
        out["n_oov"].to_numpy(np.float64)
        / out["n_tokens"].to_numpy(np.float64),
        6,
    )
    return out.sort_values("lang").reset_index(drop=True)


SQL_OOV_RATE = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY term), "
    f"vocab AS (SELECT term FROM cf ORDER BY cf DESC, term LIMIT {_OOV_VOCAB}), "
    "t AS (SELECT d.lang, toks.term FROM toks "
    "JOIN documents d ON d.doc_id = toks.doc_id) "
    "SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens, "
    "CAST(sum(CASE WHEN term IN (SELECT term FROM vocab) THEN 0 ELSE 1 "
    "END) AS BIGINT) AS n_oov, "
    "round(sum(CASE WHEN term IN (SELECT term FROM vocab) THEN 0 ELSE 1 "
    "END)::DOUBLE / count(*), 6) AS oov_rate FROM t GROUP BY lang"
)


def q_mixture_sample(sf_dir: str):
    """Training-mix rebalancing (data-dependent stratified sampling):
    target an EQUAL per-lang share of a half-corpus token budget; each
    lang's acceptance ratio derives from its own count, then docs keep
    deterministically by md5 bucket — the two-pass shape (tiny counts
    aggregate -> driver computes L thresholds -> broadcast filter), all
    integer arithmetic so both engines compute identical thresholds:
    t_l = min(256, 256 * (N // (2L)) // c_l); keep iff
    int(md5(doc_id)[:2], 16) < t_l.  Output: per-lang kept counts."""
    from ...stages.export import md5_prefix

    counts = (
        _docs(sf_dir, ["lang"])
        .groupby("lang")
        .aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    n_total = int(counts["c"].sum())
    n_langs = len(counts)
    share = n_total // (2 * n_langs)
    thr = {
        r["lang"]: min(256, 256 * share // int(r["c"]))
        for _, r in counts.iterrows()
    }

    def keep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        buckets = np.array(
            [int(p, 16) for p in md5_prefix(batch["doc_id"].to_pylist())],
            dtype=np.int64,
        )
        lims = np.array(
            [thr[l] for l in batch["lang"].to_pylist()], dtype=np.int64
        )
        return batch.filter(pa.array(buckets < lims))

    out = (
        _docs(sf_dir, ["doc_id", "lang"])
        .map_batches(keep, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Count(alias_name="n_kept"))
        .to_pandas()
    )
    return out.sort_values("lang").reset_index(drop=True)


SQL_MIXTURE_SAMPLE = (
    "WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang), "
    "g AS (SELECT (SELECT count(*) FROM documents) // "
    "(2 * (SELECT count(*) FROM c)) AS share), "
    "thr AS (SELECT lang, least(256, 256 * g.share // c.c) AS t "
    "FROM c, g) "
    "SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept "
    "FROM documents d JOIN thr ON d.lang = thr.lang "
    "WHERE CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 2) "
    "AS INTEGER) < thr.t GROUP BY d.lang"
)


def q_temperature_mix(sf_dir: str):
    """Temperature-scaled mixture sampling (the Pile / multilingual-LM
    alpha=0.5 recipe: sample source l proportional to c_l^alpha, which
    UP-weights small sources relative to natural sampling): per-lang
    acceptance thresholds derive from integer square roots so BOTH
    engines compute bit-identical thresholds with no float pow —

        s_l = isqrt(c_l),  t_l = min(256, 256 * (N//2) * s_l // (S * c_l))

    (S = sum of s_l; expected kept ≈ half-corpus budget split with
    sqrt-temperature weights; isqrt is exact in SQL for c < 2^52 since
    float sqrt is correctly rounded and our counts sit far from the
    k^2-1 boundary, documented).  Same two-pass shape as
    ``mixture_sample``: tiny counts aggregate -> L thresholds ->
    broadcast md5-bucket filter.  Output: per-lang kept counts."""
    import math as _math

    from ...stages.export import md5_prefix

    counts = (
        _docs(sf_dir, ["lang"])
        .groupby("lang")
        .aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    n_total = int(counts["c"].sum())
    budget = n_total // 2
    s = {r["lang"]: _math.isqrt(int(r["c"])) for _, r in counts.iterrows()}
    S = sum(s.values())
    thr = {
        r["lang"]: min(
            256, 256 * budget * s[r["lang"]] // (S * int(r["c"]))
        )
        for _, r in counts.iterrows()
    }

    def keep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        buckets = np.array(
            [int(p, 16) for p in md5_prefix(batch["doc_id"].to_pylist())],
            dtype=np.int64,
        )
        lims = np.array(
            [thr[l] for l in batch["lang"].to_pylist()], dtype=np.int64
        )
        return batch.filter(pa.array(buckets < lims))

    out = (
        _docs(sf_dir, ["doc_id", "lang"])
        .map_batches(keep, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Count(alias_name="n_kept"))
        .to_pandas()
    )
    return out.sort_values("lang").reset_index(drop=True)


SQL_TEMPERATURE_MIX = (
    "WITH c AS (SELECT lang, count(*) AS c, "
    "CAST(floor(sqrt(count(*))) AS BIGINT) AS s FROM documents "
    "GROUP BY lang), "
    "g AS (SELECT (SELECT count(*) FROM documents) // 2 AS budget, "
    "(SELECT sum(s) FROM c) AS ssum), "
    "thr AS (SELECT lang, least(256, 256 * g.budget * c.s // "
    "(g.ssum * c.c)) AS t FROM c, g) "
    "SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept "
    "FROM documents d JOIN thr ON d.lang = thr.lang "
    "WHERE CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 2) "
    "AS INTEGER) < thr.t GROUP BY d.lang"
)


def q_ccnet_dedup(sf_dir: str):
    """CCNet-style corpus-wide sub-document exact dedup (Wenzek et al.
    2020: drop every repeated paragraph, keep the first occurrence).
    The corpus has no newlines, so the span unit is the 3-token window
    (same re-render shim family as sentence_topn); the distributed op —
    stages/dedup.span_dedup_stats — is the real thing: combiner-
    pre-reduced text-keyed Min groupby + packed-int64 Sum tallies,
    parallelism-invariant.  Output: per-doc span/dup counts."""
    from ...stages.dedup import span_dedup_stats

    w = _CCNET_WINDOW

    def derive(batch: pa.Table) -> pa.Table:
        ids, sids, texts = [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = [x for x in t.split(" ") if x]
            for s in range(0, (len(toks) + w - 1) // w):
                ids.append(did)
                sids.append(s)
                texts.append(" ".join(toks[s * w : s * w + w]))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sent_id": pa.array(sids, pa.int32()),
                "text": pa.array(texts, pa.string()),
            }
        )

    spans = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        derive, batch_format="pyarrow"
    )
    out = span_dedup_stats(spans).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_CCNET_DEDUP = (
    "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
    "x -> x <> '') AS ts FROM documents), "
    "spans AS (SELECT doc_id, unnest(list_transform("
    f"range(0, (len(ts) + {_CCNET_WINDOW - 1}) // {_CCNET_WINDOW}), "
    "s -> struct_pack(sent_id := CAST(s AS INTEGER), "
    f"text := array_to_string(ts[s * {_CCNET_WINDOW} + 1 : "
    f"s * {_CCNET_WINDOW} + {_CCNET_WINDOW}], ' '))), "
    "recursive := true) FROM d), "
    f"mk AS (SELECT text, min(doc_id * {_CCNET_PACK} + sent_id) AS mkey "
    "FROM spans GROUP BY text), "
    "j AS (SELECT s.doc_id, CASE WHEN "
    f"s.doc_id * {_CCNET_PACK} + s.sent_id = "
    "mk.mkey THEN 1 ELSE 0 END AS kept FROM spans s "
    "JOIN mk ON s.text = mk.text) "
    "SELECT doc_id, count(*) AS n_spans, "
    "CAST(count(*) - sum(kept) AS BIGINT) AS n_dup "
    "FROM j GROUP BY doc_id"
)


def q_pii_redact(sf_dir: str):
    """PII redaction (C4/CCNet-style cleaning): count + strip emails and
    phone numbers.  The corpus carries no natural PII, so deterministic
    synthetic PII is injected as a pure function of doc_id (doc_id%3==0
    gets an email, doc_id%4==0 a phone — both rules restated in the SQL
    oracle), then the REAL vectorized RE2 kernel (functions/pii.py)
    counts and replaces.  Both engines run the identical pattern
    strings under RE2, so this is a truly cross-checked regex op."""
    from ...functions.pii import redact_batch

    def derive_and_redact(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(np.int64)
        txt = batch["text"].astype(str)
        email = np.where(
            ids % 3 == 0,
            " reach user" + pd.Series(ids).astype(str) + "@example.com",
            "",
        )
        phone = np.where(
            ids % 4 == 0,
            " call 555-" + pd.Series(1000 + ids % 9000).astype(str),
            "",
        )
        pii_text = pa.array(txt + email + phone, pa.string())
        r = redact_batch(pii_text)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_emails": r["n_emails"].to_numpy(),
                "n_phones": r["n_phones"].to_numpy(),
                "clean_len": pc.utf8_length(r["clean"]).to_numpy().astype(np.int64),
            }
        )

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(derive_and_redact, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_PII_REDACT = (
    "WITH p AS (SELECT doc_id, text || "
    "CASE WHEN doc_id % 3 = 0 THEN ' reach user' || doc_id || "
    "'@example.com' ELSE '' END || "
    "CASE WHEN doc_id % 4 = 0 THEN ' call 555-' || "
    "(1000 + doc_id % 9000) ELSE '' END AS t FROM documents) "
    "SELECT doc_id, "
    "CAST(len(regexp_extract_all(t, "
    "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) "
    "AS n_emails, "
    "CAST(len(regexp_extract_all(t, '\\b555-[0-9]{4}\\b')) AS BIGINT) "
    "AS n_phones, "
    "CAST(length(regexp_replace(regexp_replace(t, "
    "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
    "'\\b555-[0-9]{4}\\b', '<PHONE>', 'g')) AS BIGINT) AS clean_len "
    "FROM p"
)


_PACK_CTX = 256


def q_pack_sequences(sf_dir: str):
    """Sequence packing (GPT-style concat-then-chunk): concatenate every
    document's tokens in global doc_id order and slice the stream into
    fixed 256-token context windows; each doc reports its stream offset
    and the window span it occupies.  The distributed op —
    stages/pack.pack_sequences — is a two-pass exclusive prefix sum
    (per-block sums -> O(blocks) driver scan -> vectorized in-block
    stamp), the same machinery as dense doc-id assignment; the sort is
    elided here because the corpus parquet is already doc_id-ordered.
    Oracle: one SQL window-function cumulative sum."""
    from ...stages.pack import pack_sequences

    def counts(batch: pa.Table) -> pa.Table:
        _, _, doc_len = flatten_tokens(batch["text"])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(doc_len.astype(np.int64)),
            }
        )

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        counts, batch_format="pyarrow"
    )
    out = pack_sequences(ds, _PACK_CTX).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_PACK_SEQUENCES = (
    # LEFT JOIN keeps zero-token docs (engine emits every doc; a doc
    # whose text tokenizes to nothing gets an empty range at its stream
    # position and 0 windows — hence the greatest(n,1) / CASE mirrors of
    # the engine's max(cnt,1) and n>0 rules)
    f"WITH toks AS ({_TOKS_SQL}), "
    "tc AS (SELECT d.doc_id, "
    "CAST(COALESCE(t.n, 0) AS BIGINT) AS n_tokens FROM documents d "
    "LEFT JOIN (SELECT doc_id, count(*) AS n FROM toks "
    "GROUP BY doc_id) t ON d.doc_id = t.doc_id), "
    "off AS (SELECT doc_id, n_tokens, "
    "CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) "
    "AS tok_start FROM tc) "
    "SELECT doc_id, n_tokens, tok_start, "
    f"tok_start // {_PACK_CTX} AS win_first, "
    f"(tok_start + greatest(n_tokens, 1) - 1) // {_PACK_CTX} "
    "AS win_last, "
    "CASE WHEN n_tokens > 0 THEN "
    f"(tok_start + n_tokens - 1) // {_PACK_CTX} "
    f"- tok_start // {_PACK_CTX} + 1 ELSE 0 END AS n_windows FROM off"
)


def q_shuffle_order(sf_dir: str):
    """Deterministic seeded global shuffle for training order: rank
    every document under md5(doc_id) — the distributed analogue of
    random_shuffle that is reproducible across runs and engines.  Rides
    assign_doc_ids' range-partitioned sort + O(blocks) prefix-sum rank
    stamp.  The per-row hashlib.md5 is pinned for oracle parity (same
    policy as export.md5_prefix); non-oracle paths use vectorized
    splitmix64."""
    from ...stages.docids import assign_doc_ids
    from ...stages.export import md5_prefix

    def key(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "shuf_key": pa.array(
                    md5_prefix(batch["doc_id"].to_pylist(), n=32)
                ),
            }
        )

    ds = _docs(sf_dir, ["doc_id"]).map_batches(key, batch_format="pyarrow")
    ranked = assign_doc_ids(ds, key="shuf_key", col="shuffle_rank")
    out = ranked.select_columns(["doc_id", "shuffle_rank"]).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_SHUFFLE_ORDER = (
    "SELECT doc_id, CAST(row_number() OVER "
    "(ORDER BY md5(CAST(doc_id AS VARCHAR))) - 1 AS BIGINT) "
    "AS shuffle_rank FROM documents ORDER BY doc_id"
)


def q_pack_windows(sf_dir: str):
    """The composed training-shard prep pipeline, pinned end-to-end as
    ONE oracle: quality gate (n_tokens >= 5, shuffle-free) -> exact
    dedup (md5 keep-min, combiner -> Min groupby) -> sequence packing
    (distributed exclusive prefix sum over survivors in doc_id order)
    -> per-context-window occupancy map (each doc contributes its token
    overlap to every window it spans; docs span few windows so the
    explode is O(rows), and blocks are doc-ordered so each batch's
    local window group_by pre-reduces the final tiny groupby).
    Output: (window_id, n_docs, n_tokens) — the shard manifest a
    trainer would consume."""
    from ray.data.aggregate import Sum

    from ...stages.dedup import exact_dedup
    from ...stages.pack import pack_sequences

    C = _PACK_CTX

    def gate(batch: pa.Table) -> pa.Table:
        _, _, doc_len = flatten_tokens(batch["text"])
        t = batch.append_column(
            "n_tokens", pa.array(doc_len.astype(np.int64))
        )
        return t.filter(pc.greater_equal(t["n_tokens"], pa.scalar(5)))

    gated = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        gate, batch_format="pyarrow"
    )
    kept = exact_dedup(gated).select_columns(["doc_id", "n_tokens"])
    packed = pack_sequences(kept, C)

    def explode(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "window_id": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        start = batch["tok_start"].combine_chunks().to_numpy()
        n = batch["n_tokens"].combine_chunks().to_numpy()
        wf = batch["win_first"].combine_chunks().to_numpy()
        reps = (
            batch["win_last"].combine_chunks().to_numpy() - wf + 1
        ).astype(np.int64)
        total = int(reps.sum())
        if total == 0:
            return empty
        doc_idx = np.repeat(np.arange(len(reps)), reps)
        # per-doc window ranges, vectorized: base + within-doc offset
        win = wf[doc_idx] + (
            np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
        )
        tok_in = np.minimum((win + 1) * C, start[doc_idx] + n[doc_idx]) \
            - np.maximum(win * C, start[doc_idx])
        df = pd.DataFrame({"window_id": win, "n_tokens": tok_in})
        agg = df.groupby("window_id", as_index=False).agg(
            n_docs=("n_tokens", "size"), n_tokens=("n_tokens", "sum")
        )
        return pa.table(
            {
                "window_id": pa.array(agg["window_id"].to_numpy(np.int64)),
                "n_docs": pa.array(agg["n_docs"].to_numpy(np.int64)),
                "n_tokens": pa.array(agg["n_tokens"].to_numpy(np.int64)),
            }
        )

    out = (
        packed.map_batches(explode, batch_format="pyarrow")
        .groupby("window_id")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
        )
        .to_pandas()
    )
    return out.sort_values("window_id").reset_index(drop=True)


SQL_PACK_WINDOWS = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "tc AS (SELECT doc_id, count(*) AS n_tokens FROM toks "
    "GROUP BY doc_id HAVING count(*) >= 5), "
    "kept AS (SELECT tc.doc_id, tc.n_tokens FROM tc WHERE tc.doc_id IN "
    "(SELECT min(d.doc_id) FROM documents d JOIN tc t2 "
    "ON d.doc_id = t2.doc_id GROUP BY md5(d.text))), "
    "off AS (SELECT doc_id, n_tokens, "
    "CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) "
    "AS tok_start FROM kept), "
    "ex AS (SELECT n_tokens, tok_start, "
    f"unnest(generate_series(tok_start // {_PACK_CTX}, "
    f"(tok_start + n_tokens - 1) // {_PACK_CTX})) AS window_id "
    "FROM off) "
    "SELECT window_id, CAST(count(*) AS BIGINT) AS n_docs, "
    f"CAST(sum(least((window_id + 1) * {_PACK_CTX}, "
    "tok_start + n_tokens) - "
    f"greatest(window_id * {_PACK_CTX}, tok_start)) AS BIGINT) "
    "AS n_tokens FROM ex GROUP BY window_id"
)


def q_quality(sf_dir: str):
    def qual(batch: pa.Table) -> pa.Table:
        stats = quality_batch(batch["text"])
        t = pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": stats["n_tokens"],
                "n_stopwords": stats["n_stopwords"],
                "stop_ratio": stats["stop_ratio"],
                "mean_token_len": stats["mean_token_len"],
            }
        )
        return t.filter(pc.greater(t["n_tokens"], 0))

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(qual, batch_format="pyarrow")


SQL_QUALITY = (
    f"WITH toks AS ({_TOKS_SQL}), agg AS ("
    "SELECT doc_id, count(*) AS n_tokens, "
    "CAST(sum(CASE WHEN term IN ("
    + ", ".join(f"'{w}'" for w in STOPWORDS)
    + ") THEN 1 ELSE 0 END) AS BIGINT) AS n_stopwords, "
    "sum(length(term)) AS sum_len FROM toks GROUP BY doc_id) "
    "SELECT doc_id, n_tokens, n_stopwords, "
    "n_stopwords::DOUBLE / n_tokens AS stop_ratio, "
    "sum_len::DOUBLE / n_tokens AS mean_token_len FROM agg"
)


def q_c4_filters(sf_dir: str):
    """C4 cleaning rules (Raffel et al. JMLR 2020 §2.2), doc-level
    adaptation for the newline-free corpus: word floor (>= 5 tokens),
    terminal punctuation, no curly brace, no 'lorem ipsum', no
    'javascript'.  One pass of vectorized Arrow predicates per batch,
    partial counts pre-reduced to ONE row per batch before a Sum
    fold — the zero-shuffle audit shape.  Output: one row of per-rule
    drop counts + the kept count (rules counted independently, kept =
    passes all)."""
    from ray.data.aggregate import Sum

    def flags(batch: pa.Table) -> pa.Table:
        txt = batch["text"]
        low = pc.utf8_lower(txt)
        _, _, doc_len = flatten_tokens(txt)
        minw = doc_len < 5
        endp = np.zeros(len(txt), dtype=bool)
        for suf in (".", "!", "?", '"'):
            endp |= pc.ends_with(txt, suf).to_numpy(zero_copy_only=False)
        endp = ~endp
        brace = pc.match_substring(txt, "{").to_numpy(zero_copy_only=False)
        lorem = pc.match_substring(low, "lorem ipsum").to_numpy(
            zero_copy_only=False
        )
        js = pc.match_substring(low, "javascript").to_numpy(
            zero_copy_only=False
        )
        kept = ~(minw | endp | brace | lorem | js)
        return pa.table(
            {
                "n_docs": pa.array([len(txt)], pa.int64()),
                "drop_minwords": pa.array([int(minw.sum())], pa.int64()),
                "drop_endpunct": pa.array([int(endp.sum())], pa.int64()),
                "drop_brace": pa.array([int(brace.sum())], pa.int64()),
                "drop_lorem": pa.array([int(lorem.sum())], pa.int64()),
                "drop_js": pa.array([int(js.sum())], pa.int64()),
                "n_kept": pa.array([int(kept.sum())], pa.int64()),
            }
        )

    cols = [
        "n_docs", "drop_minwords", "drop_endpunct", "drop_brace",
        "drop_lorem", "drop_js", "n_kept",
    ]
    out = (
        _docs(sf_dir, ["text"])
        .map_batches(flags, batch_format="pyarrow")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
    )
    return pd.DataFrame([{c: out[f"{c}"] for c in cols}])


SQL_C4_FILTERS = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "tc AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id), "
    "f AS (SELECT d.doc_id, "
    "COALESCE(tc.n, 0) < 5 AS minw, "
    "NOT regexp_matches(d.text, '[.!?\"]$') AS endp, "
    "contains(d.text, '{') AS brace, "
    "contains(lower(d.text), 'lorem ipsum') AS lorem, "
    "contains(lower(d.text), 'javascript') AS js "
    "FROM documents d LEFT JOIN tc ON d.doc_id = tc.doc_id) "
    "SELECT CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(CASE WHEN minw THEN 1 ELSE 0 END) AS BIGINT) "
    "AS drop_minwords, "
    "CAST(sum(CASE WHEN endp THEN 1 ELSE 0 END) AS BIGINT) "
    "AS drop_endpunct, "
    "CAST(sum(CASE WHEN brace THEN 1 ELSE 0 END) AS BIGINT) "
    "AS drop_brace, "
    "CAST(sum(CASE WHEN lorem THEN 1 ELSE 0 END) AS BIGINT) "
    "AS drop_lorem, "
    "CAST(sum(CASE WHEN js THEN 1 ELSE 0 END) AS BIGINT) AS drop_js, "
    "CAST(sum(CASE WHEN NOT (minw OR endp OR brace OR lorem OR js) "
    "THEN 1 ELSE 0 END) AS BIGINT) AS n_kept FROM f"
)


def q_gopher_repetition(sf_dir: str):
    """Gopher repetition filter (Rae et al. 2021 §A1.1, token variant):
    per-doc duplicate-token fraction and most-common-adjacent-bigram
    coverage, flagged above the pinned thresholds.  One embarrassingly
    parallel ``map_batches`` pass — each doc is one row, so there is NO
    shuffle at any corpus size; group identities run on uint64 hashes
    (one lexsort per batch, no Python loop)."""

    def rep(batch: pa.Table) -> pa.Table:
        from ...functions.textstats import repetition_batch

        t = repetition_batch(batch["text"])
        out = pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": t["n_tokens"],
                "dup_tok_frac": t["dup_tok_frac"],
                "top_bigram_frac": t["top_bigram_frac"],
                "flagged": t["flagged"],
            }
        )
        return out.filter(pc.greater(out["n_tokens"], 0))

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        rep, batch_format="pyarrow"
    )


SQL_GOPHER_REPETITION = (
    "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
    "x -> x <> '') AS ts FROM documents), "
    "agg AS (SELECT doc_id, len(ts) AS n_tokens, "
    "len(list_distinct(ts)) AS n_distinct FROM d), "
    "bg AS (SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS bigram "
    "FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM d)), "
    "bgm AS (SELECT doc_id, max(c) AS mc FROM ("
    "SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram"
    ") GROUP BY doc_id), "
    "m AS (SELECT a.doc_id, a.n_tokens, "
    "1.0 - a.n_distinct::DOUBLE / a.n_tokens AS dup_f, "
    "coalesce(2.0 * bgm.mc / a.n_tokens, 0.0) AS big_f "
    "FROM agg a LEFT JOIN bgm ON bgm.doc_id = a.doc_id "
    "WHERE a.n_tokens > 0) "
    "SELECT doc_id, n_tokens, round(dup_f, 6) AS dup_tok_frac, "
    "round(big_f, 6) AS top_bigram_frac, "
    "CAST(dup_f > 0.3 OR big_f > 0.2 AS BIGINT) AS flagged FROM m"
)


def _unigram_nlp_ref(sf_dir: str):
    """(sorted vocab, -ln p) arrays for the corpus unigram LM, built by
    the term-partials combiner -> one groupby — shared by
    q_unigram_logloss and q_ccnet_ppl_buckets; returned as a ray.put
    ref (ships once)."""
    tf = (
        _term_partials(sf_dir)
        .groupby("term")
        .aggregate(Sum("cf_p", alias_name="cf"))
        .to_pandas()
    )
    total = float(tf["cf"].sum())
    vocab = np.sort(tf["term"].to_numpy().astype(str))
    cf = tf.set_index("term").loc[vocab, "cf"].to_numpy().astype(np.float64)
    return ray.put((vocab, -np.log(cf / total)))


def q_unigram_logloss(sf_dir: str):
    """CCNet-style quality proxy (Wenzek et al. 2019 use an LM
    perplexity; the unigram cross-entropy is its model-free analogue):
    per-doc mean ``-ln p(token)`` under the corpus unigram distribution.

    Two passes: (1) corpus term frequencies via the per-batch combiner →
    small ``groupby(term)`` (the only shuffle, pre-aggregated to one row
    per (term, batch)); (2) the (term, -ln p) table broadcast ONCE via
    ``ray.put`` and joined inside ``map_batches`` with a vectorized
    ``searchsorted`` — never re-shipped per batch.  At web scale the
    vocab table is ~16 B/term (a 100M-term vocab broadcasts at 1.6 GB);
    above that, swap the broadcast for a hash join on ``term`` — same
    rows either way (the broadcast is the measured-faster route at every
    vocab this box can hold)."""
    ref = _unigram_nlp_ref(sf_dir)

    def score(batch: pa.Table) -> pa.Table:
        v, nlp = ray.get(ref)
        terms, row_idx, doc_len = flatten_tokens(batch["text"])
        n = len(batch)
        n_tok = doc_len.astype(np.int64)
        toks = terms.to_numpy(zero_copy_only=False).astype(str)
        vals = nlp[np.searchsorted(v, toks)] if toks.size else np.empty(0)
        s = np.bincount(row_idx, weights=vals, minlength=n)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = np.where(n_tok > 0, s / n_tok, 0.0)
        out = pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tok, pa.int64()),
                "logloss": pa.array(np.round(mean, 6), pa.float64()),
            }
        )
        return out.filter(pc.greater(out["n_tokens"], 0))

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


SQL_UNIGRAM_LOGLOSS = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "stats AS (SELECT count(*) AS total FROM toks), "
    "tf AS (SELECT term, count(*) AS c FROM toks GROUP BY term) "
    "SELECT doc_id, count(*) AS n_tokens, "
    "round(avg(-ln(tf.c::DOUBLE / stats.total)), 6) AS logloss "
    "FROM toks JOIN tf USING (term) CROSS JOIN stats GROUP BY doc_id"
)


def q_bigram_logloss(sf_dir: str):
    """Bigram-LM perplexity scoring — the KenLM-shaped quality filter
    (Wenzek et al. 2019 score docs by LM perplexity; the add-1-smoothed
    bigram cross-entropy is its strongest model-free analogue): per doc,
    mean ``-ln P(w2|w1)`` over its adjacent token pairs with

        P(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V)

    where ``c(w1,w2)`` are corpus bigram counts, ``c(w1·)`` the bigram
    context totals, and ``V`` the distinct-term vocabulary size.

    Three linear passes, one bounded shuffle: (1) per-batch (w1, w2)
    count combiner -> ``groupby([w1, w2])`` (pre-aggregated to one row
    per pair per batch — the only exchange; context totals derive from
    the reduced pair table, no second shuffle); (2) the unigram vocab
    size via the existing term-partials combiner; (3) the model ships
    ONCE via ``ray.put`` (sorted composite-key arrays) and scores each
    batch with vectorized searchsorted + bincount.  At web scale the
    bigram table outgrows a broadcast before anything else here breaks
    — swap pass 3's broadcast for two hash joins (docs-bigrams ⋈ model
    on (w1,w2), ⋈ contexts on w1); identical rows either way.  Docs
    with <2 tokens emit no row (SQL join semantics)."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def bigram_part(batch: pa.Table) -> pa.Table:
        terms, row_idx, _ = flatten_tokens(batch["text"])
        if len(terms) < 2:
            return pa.table({
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "c_p": pa.array([], pa.int64()),
            })
        mask = pa.array(row_idx[1:] == row_idx[:-1])
        pairs = pa.table({
            "w1": terms.slice(0, len(terms) - 1),
            "w2": terms.slice(1),
        }).filter(mask)
        agg = pairs.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return agg.rename_columns(["w1", "w2", "c_p"]).set_column(
            2, "c_p", pc.cast(agg["count_all"], pa.int64())
        )

    bc = (
        docs.map_batches(bigram_part, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("c_p", alias_name="c"))
        .to_pandas()
    )
    # context totals + vocab are derived/small — no further corpus pass
    # beyond the vocab-size combiner
    ctx = bc.groupby("w1", as_index=False)["c"].sum()
    n_vocab = int(
        _term_partials(sf_dir)
        .groupby("term")
        .aggregate(Count(alias_name="n"))
        .count()
    )
    bkeys = np.sort(
        (bc["w1"] + "\x00" + bc["w2"]).to_numpy().astype(str)
    )
    border = np.argsort((bc["w1"] + "\x00" + bc["w2"]).to_numpy().astype(str))
    bcounts = bc["c"].to_numpy(np.float64)[border]
    ckeys_order = np.argsort(ctx["w1"].to_numpy().astype(str))
    ckeys = ctx["w1"].to_numpy().astype(str)[ckeys_order]
    ccounts = ctx["c"].to_numpy(np.float64)[ckeys_order]
    ref = ray.put((bkeys, bcounts, ckeys, ccounts, float(n_vocab)))

    def score(batch: pa.Table) -> pa.Table:
        bk, bcnt, ck, ccnt, v = ray.get(ref)
        terms, row_idx, _ = flatten_tokens(batch["text"])
        n = len(batch)
        toks = terms.to_numpy(zero_copy_only=False).astype(str)
        if toks.size < 2:
            mask = np.zeros(0, dtype=bool)
        else:
            mask = row_idx[1:] == row_idx[:-1]
        w1 = toks[:-1][mask] if toks.size else np.empty(0, dtype=str)
        w2 = toks[1:][mask] if toks.size else np.empty(0, dtype=str)
        rows = row_idx[:-1][mask] if toks.size else np.empty(0, np.int64)
        qk = np.char.add(np.char.add(w1, "\x00"), w2)
        bi = np.searchsorted(bk, qk)
        bi_ok = (bi < len(bk)) & (bk[np.minimum(bi, len(bk) - 1)] == qk)
        cpair = np.where(bi_ok, bcnt[np.minimum(bi, len(bk) - 1)], 0.0)
        ci = np.searchsorted(ck, w1)
        ci_ok = (ci < len(ck)) & (ck[np.minimum(ci, len(ck) - 1)] == w1)
        cctx = np.where(ci_ok, ccnt[np.minimum(ci, len(ck) - 1)], 0.0)
        nlp = -np.log((cpair + 1.0) / (cctx + v))
        s = np.bincount(rows, weights=nlp, minlength=n)
        nb = np.bincount(rows, minlength=n).astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = np.where(nb > 0, s / np.maximum(nb, 1), 0.0)
        out = pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bigrams": pa.array(nb, pa.int64()),
                "logloss": pa.array(np.round(mean, 6), pa.float64()),
            }
        )
        return out.filter(pc.greater(out["n_bigrams"], 0))

    return docs.map_batches(score, batch_format="pyarrow")


SQL_BIGRAM_LOGLOSS = (
    "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
    "x -> x <> '') AS ts FROM documents), "
    "tokpos AS (SELECT doc_id, unnest(ts) AS term, "
    "unnest(range(1, len(ts) + 1)) AS i FROM d), "
    "vocab AS (SELECT count(DISTINCT term) AS v FROM tokpos), "
    "big AS (SELECT a.doc_id, a.term AS w1, b.term AS w2 "
    "FROM tokpos a JOIN tokpos b ON a.doc_id = b.doc_id AND b.i = a.i + 1), "
    "bc AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY 1, 2), "
    "ctx AS (SELECT w1, sum(c) AS c1 FROM bc GROUP BY 1) "
    "SELECT big.doc_id, count(*) AS n_bigrams, "
    "round(avg(-ln((bc.c + 1.0) / (ctx.c1 + vocab.v))), 6) AS logloss "
    "FROM big JOIN bc USING (w1, w2) JOIN ctx USING (w1) "
    "CROSS JOIN vocab GROUP BY big.doc_id"
)


def q_bigram_llr(sf_dir: str):
    """Log-likelihood-ratio collocation scoring (Dunning, CL 1993 —
    the significance test Manning & Schütze ch.5 and NLTK's
    ``BigramAssocMeasures.likelihood_ratio`` standardize on): for each
    adjacent bigram, the 2x2 contingency table (k11 = c(w1 w2), k12 =
    c1-k11, k21 = c2-k11, k22 = N-c1-c2+k11 with first/second-slot
    marginals c1/c2 over N total bigrams) scores
    ``2 * sum_cells k*ln(k*N/(row*col))`` (0-count cells contribute 0,
    cells summed in the pinned 11,12,21,22 order).  Top-20 by
    (round(llr, 6) DESC, w1, w2).

    FULLY DISTRIBUTED shape: per-batch adjacent-pair combiner -> ONE
    groupby((w1, w2)); both marginals derive from the reduced pair
    table (two groupbys over pair rows, never tokens); they re-attach
    via two hash JOINS on w1 / w2 (not a broadcast — the |V| marginal
    table is the thing that outgrows driver memory at web scale); LLR
    is a vectorized map over joined pair rows and the top-20 is a
    distributed sort + limit."""
    import ray as _ray

    docs = _docs(sf_dir, ["doc_id", "text"])

    def bigram_part(batch: pa.Table) -> pa.Table:
        terms, row_idx, _ = flatten_tokens(batch["text"])
        if len(terms) < 2:
            return pa.table({
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "c_p": pa.array([], pa.int64()),
            })
        mask = pa.array(row_idx[1:] == row_idx[:-1])
        pairs = pa.table({
            "w1": terms.slice(0, len(terms) - 1),
            "w2": terms.slice(1),
        }).filter(mask)
        agg = pairs.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return agg.rename_columns(["w1", "w2", "c_p"]).set_column(
            2, "c_p", pc.cast(agg["count_all"], pa.int64())
        )

    bc = (
        docs.map_batches(bigram_part, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("c_p", alias_name="n"))
    ).materialize()
    nb = float(bc.sum("n"))
    n_cpu = int(_ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(8, n_cpu // 2))

    def rename_m1(b: pa.Table) -> pa.Table:
        return b.rename_columns(["w1", "c1"])

    def rename_m2(b: pa.Table) -> pa.Table:
        return b.rename_columns(["w2", "c2"])

    m1 = bc.groupby("w1").aggregate(Sum("n", alias_name="c1")).map_batches(
        rename_m1, batch_format="pyarrow"
    )
    m2 = bc.groupby("w2").aggregate(Sum("n", alias_name="c2")).map_batches(
        rename_m2, batch_format="pyarrow"
    )
    j = bc.join(m1, "inner", num_partitions=nparts, on=("w1",)).join(
        m2, "inner", num_partitions=nparts, on=("w2",)
    )

    def llr(batch: pa.Table) -> pa.Table:
        k11 = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = batch["c1"].to_numpy(zero_copy_only=False).astype(np.float64)
        c2 = batch["c2"].to_numpy(zero_copy_only=False).astype(np.float64)
        k12 = c1 - k11
        k21 = c2 - k11
        k22 = nb - c1 - c2 + k11
        r2 = nb - c1
        s2 = nb - c2

        def cell(k, r, c):
            with np.errstate(divide="ignore", invalid="ignore"):
                v = k * np.log(k * nb / (r * c))
            return np.where(k > 0, v, 0.0)

        val = 2.0 * (
            cell(k11, c1, c2) + cell(k12, c1, s2)
            + cell(k21, r2, c2) + cell(k22, r2, s2)
        )
        return pa.table({
            "w1": batch["w1"],
            "w2": batch["w2"],
            "n": batch["n"],
            "llr": pa.array(np.round(val, 6), pa.float64()),
        })

    return (
        j.map_batches(llr, batch_format="pyarrow")
        .sort(["llr", "w1", "w2"], descending=[True, False, False])
        .limit(20)
    )


def _sql_bigram_llr(k: int = 20) -> str:
    cells = []
    for kk, rr, cc in (
        ("bc.n::DOUBLE", "m1.c1::DOUBLE", "m2.c2::DOUBLE"),
        ("m1.c1::DOUBLE - bc.n", "m1.c1::DOUBLE",
         "nn.nb::DOUBLE - m2.c2"),
        ("m2.c2::DOUBLE - bc.n", "nn.nb::DOUBLE - m1.c1",
         "m2.c2::DOUBLE"),
        ("nn.nb::DOUBLE - m1.c1 - m2.c2 + bc.n",
         "nn.nb::DOUBLE - m1.c1", "nn.nb::DOUBLE - m2.c2"),
    ):
        cells.append(
            f"CASE WHEN ({kk}) > 0 THEN ({kk}) * "
            f"ln(({kk}) * nn.nb / (({rr}) * ({cc}))) ELSE 0.0 END"
        )
    body = " + ".join(cells)
    return (
        "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS ts FROM documents), "
        "tokpos AS (SELECT doc_id, unnest(ts) AS term, "
        "unnest(range(1, len(ts) + 1)) AS i FROM d), "
        "big AS (SELECT a.term AS w1, b.term AS w2 FROM tokpos a "
        "JOIN tokpos b ON a.doc_id = b.doc_id AND b.i = a.i + 1), "
        "bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n "
        "FROM big GROUP BY 1, 2), "
        "m1 AS (SELECT w1, CAST(sum(n) AS BIGINT) AS c1 FROM bc "
        "GROUP BY 1), "
        "m2 AS (SELECT w2, CAST(sum(n) AS BIGINT) AS c2 FROM bc "
        "GROUP BY 1), "
        "nn AS (SELECT CAST(sum(n) AS DOUBLE) AS nb FROM bc) "
        "SELECT w1, w2, n, llr FROM ("
        "SELECT bc.w1, bc.w2, bc.n, "
        f"round(2.0 * ({body}), 6) AS llr "
        "FROM bc JOIN m1 ON m1.w1 = bc.w1 JOIN m2 ON m2.w2 = bc.w2 "
        "CROSS JOIN nn) "
        f"ORDER BY llr DESC, w1, w2 LIMIT {k}"
    )


SQL_BIGRAM_LLR = _sql_bigram_llr()


def q_dsir_weights(sf_dir: str):
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169 "Data
    Selection for Language Models via Importance Resampling") in the
    unigram feature space: per doc,

        log w(d) = sum_tokens [ ln p_tgt(t) - ln p_src(t) ]

    with add-1-smoothed unigram LMs — target = the ``lang='en'`` slice,
    source = the whole corpus, shared vocab size V = distinct corpus
    terms.  Docs resembling the target domain get high weight; sampling
    proportional to w is the published raw->target resampling step.

    Same two-pass broadcast shape as ``unigram_logloss``: both LMs'
    term counts come from the per-batch combiner -> ONE ``groupby(term)``
    (the target slice rides the same pass with a filtered count, so the
    corpus streams once); the (term, logratio) table ships once via
    ``ray.put`` and applies per batch with searchsorted + bincount.  At
    web scale swap the broadcast for a hash join on term (same rows)."""

    def partial(batch: pa.Table) -> pa.Table:
        # (term, corpus tf, target tf) partials in ONE pass: the target
        # mask rides the tokenize, so no second corpus scan
        mask = pc.equal(batch["lang"], "en")
        tf_all, _ = term_count_table(batch["text"], batch["doc_id"])
        tgt = batch.filter(mask)
        if tgt.num_rows:
            tf_tgt, _ = term_count_table(tgt["text"], tgt["doc_id"])
            tgt_agg = (
                tf_tgt.group_by("term")
                .aggregate([("tf", "sum")])
                .rename_columns(["term", "ctgt_p"])
            )
        else:
            tgt_agg = pa.table(
                {"term": pa.array([], pa.string()),
                 "ctgt_p": pa.array([], pa.int64())}
            )
        all_agg = (
            tf_all.group_by("term")
            .aggregate([("tf", "sum")])
            .rename_columns(["term", "csrc_p"])
        )
        joined = all_agg.join(tgt_agg, keys="term", join_type="left outer")
        csrc = joined["csrc_p"].combine_chunks()
        ctgt = pc.fill_null(joined["ctgt_p"].combine_chunks(), 0)
        return pa.table(
            {
                "term": joined["term"],
                "csrc_p": pc.cast(csrc, pa.int64()),
                "ctgt_p": pc.cast(ctgt, pa.int64()),
            }
        )

    counts = (
        _docs(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("csrc_p", alias_name="csrc"),
                   Sum("ctgt_p", alias_name="ctgt"))
        .to_pandas()
    )
    V = float(len(counts))
    t_src = float(counts["csrc"].sum())
    t_tgt = float(counts["ctgt"].sum())
    vocab = counts["term"].to_numpy().astype(str)
    order = np.argsort(vocab)
    vocab = vocab[order]
    csrc = counts["csrc"].to_numpy().astype(np.float64)[order]
    ctgt = counts["ctgt"].to_numpy().astype(np.float64)[order]
    lr = np.log((ctgt + 1.0) / (t_tgt + V)) - np.log((csrc + 1.0) / (t_src + V))
    ref = ray.put((vocab, lr))

    def score(batch: pa.Table) -> pa.Table:
        v, ratios = ray.get(ref)
        terms, row_idx, doc_len = flatten_tokens(batch["text"])
        n = len(batch)
        n_tok = doc_len.astype(np.int64)
        toks = terms.to_numpy(zero_copy_only=False).astype(str)
        vals = ratios[np.searchsorted(v, toks)] if toks.size else np.empty(0)
        s = np.bincount(row_idx, weights=vals, minlength=n)
        out = pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tok, pa.int64()),
                "logw": pa.array(np.round(s, 6), pa.float64()),
            }
        )
        return out.filter(pc.greater(out["n_tokens"], 0))

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


SQL_DSIR_WEIGHTS = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "ttoks AS (SELECT t.term FROM toks t JOIN documents d "
    "ON d.doc_id = t.doc_id WHERE d.lang = 'en'), "
    "vb AS (SELECT count(DISTINCT term) AS v FROM toks), "
    "ss AS (SELECT count(*) AS total FROM toks), "
    "ts AS (SELECT count(*) AS total FROM ttoks), "
    "src AS (SELECT term, count(*) AS c FROM toks GROUP BY term), "
    "tgt AS (SELECT term, count(*) AS c FROM ttoks GROUP BY term), "
    "ratio AS (SELECT s.term, "
    "ln((coalesce(tg.c, 0) + 1)::DOUBLE / (ts.total + vb.v)) - "
    "ln((s.c + 1)::DOUBLE / (ss.total + vb.v)) AS lr "
    "FROM src s LEFT JOIN tgt tg USING (term) "
    "CROSS JOIN ts CROSS JOIN ss CROSS JOIN vb) "
    "SELECT t.doc_id, count(*) AS n_tokens, round(sum(r.lr), 6) AS logw "
    "FROM toks t JOIN ratio r USING (term) GROUP BY t.doc_id"
)


def q_doc_keywords(sf_dir: str):
    """Per-doc keyword extraction: top-3 terms by tf·idf (idf =
    ln(n_docs/df), ties by term asc) — the standard document-tagging
    step before corpus mixing.  Same two-pass broadcast shape as
    ``unigram_logloss``: corpus df via the combiner → ``groupby(term)``;
    the (term, idf) table ships once via ``ray.put``; per-doc tf and the
    bounded top-3 are one lexsort inside each batch (docs never span
    batches, so no cross-batch state)."""
    from ...functions.tokenizer import term_count_table

    df_tbl = (
        _term_partials(sf_dir)
        .groupby("term")
        .aggregate(Sum("df_p", alias_name="df"))
        .to_pandas()
    )
    vocab = np.sort(df_tbl["term"].to_numpy().astype(str))
    dfv = df_tbl.set_index("term").loc[vocab, "df"].to_numpy().astype(np.float64)
    def count_tokenized(b: pa.Table) -> pa.Table:
        _, _, doc_len = flatten_tokens(b["text"])
        return pa.table(
            {"n": pa.array([int((doc_len > 0).sum())], pa.int64())}
        )

    n_docs = float(
        _docs(sf_dir, ["text"])
        .map_batches(count_tokenized, batch_format="pyarrow")
        .sum("n")
    )
    idf = np.log(n_docs / dfv)
    ref = ray.put((vocab, idf))

    def kw(batch: pa.Table) -> pa.Table:
        v, idfv = ray.get(ref)
        tf, _ = term_count_table(batch["text"], batch["doc_id"])
        if tf.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "score": pa.array([], pa.float64()),
                }
            )
        terms = tf["term"].to_numpy(zero_copy_only=False).astype(str)
        docs = tf["doc_id"].to_numpy()
        tfs = tf["tf"].to_numpy().astype(np.float64)
        code = np.searchsorted(v, terms)  # global-vocab rank == term asc
        score = np.round(tfs * idfv[code], 6)
        order = np.lexsort((code, -score, docs))
        d = docs[order]
        first = np.ones(d.size, dtype=bool)
        first[1:] = d[1:] != d[:-1]
        grp_start = np.maximum.accumulate(
            np.where(first, np.arange(d.size), 0)
        )
        pos = np.arange(d.size) - grp_start
        keep = pos < 3
        return pa.table(
            {
                "doc_id": pa.array(d[keep], pa.int64()),
                "rank": pa.array(pos[keep] + 1, pa.int64()),
                "term": pa.array(terms[order][keep], pa.string()),
                "score": pa.array(score[order][keep], pa.float64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        kw, batch_format="pyarrow"
    )


SQL_DOC_KEYWORDS = (
    f"WITH toks AS ({_TOKS_SQL}), "
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks "
    "GROUP BY doc_id, term), "
    "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks "
    "GROUP BY term), "
    "nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks), "
    "sc AS (SELECT tf.doc_id, tf.term, "
    "round(tf.tf * ln(nd.n_docs::DOUBLE / df.df), 6) AS score "
    "FROM tf JOIN df USING (term) CROSS JOIN nd) "
    "SELECT doc_id, rank, term, score FROM ("
    "SELECT doc_id, term, score, CAST(row_number() OVER ("
    "PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rank "
    "FROM sc) WHERE rank <= 3"
)


# ------------------------------------------------ passage chunking (RAG)

_CHUNK_WIN = 16
_CHUNK_STEP = 12  # overlap = win - step = 4 tokens


def q_passage_chunks(sf_dir: str):
    """RAG-style passage chunking: fixed token windows (win=16,
    stride=12) with LAST-WINDOW ALIGNMENT — the final passage starts at
    n-win+1 so no trailing tokens are dropped (the HF chunker rule).
    Emits (doc_id, passage_id, start_tok, n_tok) — embarrassingly
    parallel, zero shuffle, fully vectorized (per-batch np.repeat over
    doc passage counts).  The chunk-for-embedding step of a training /
    retrieval corpus build."""
    win, step = _CHUNK_WIN, _CHUNK_STEP

    def chunks(batch: pa.Table) -> pa.Table:
        _, _, doc_len = flatten_tokens(batch["text"])
        n = doc_len.astype(np.int64)
        ids = batch["doc_id"].to_numpy()
        # number of stride starts in 1..n-win+1 (>= 1 when n > 0), plus
        # one aligned tail passage when (n - win) is not a stride multiple
        full = np.maximum(n - win, 0)
        n_strides = np.where(n > 0, full // step + 1, 0)
        has_tail = ((n > win) & (full % step != 0)).astype(np.int64)
        total = n_strides + has_tail
        doc_idx = np.repeat(np.arange(len(batch)), total)
        # within-doc passage index, vectorized: global arange minus each
        # doc's first-slot offset
        offs = np.cumsum(total) - total
        pid = np.arange(int(total.sum()), dtype=np.int64) - np.repeat(
            offs, total
        )
        start = 1 + pid * step
        # the tail passage (pid == n_strides) realigns to n - win + 1
        is_tail = pid >= n_strides[doc_idx]
        start = np.where(is_tail, n[doc_idx] - win + 1, start)
        length = np.minimum(win, n[doc_idx] - start + 1)
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_idx], pa.int64()),
                "passage_id": pa.array(pid + 1, pa.int64()),
                "start_tok": pa.array(start, pa.int64()),
                "n_tok": pa.array(length, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        chunks, batch_format="pyarrow"
    )


SQL_PASSAGE_CHUNKS = (
    "WITH d AS (SELECT doc_id, len(list_filter(string_split(text, ' '), "
    "x -> x <> '')) AS n FROM documents), "
    f"strides AS (SELECT doc_id, n, unnest(range(1, greatest(n - {_CHUNK_WIN}, 0) "
    f"+ 2, {_CHUNK_STEP})) AS start_tok FROM d WHERE n > 0), "
    f"tail AS (SELECT doc_id, n, n - {_CHUNK_WIN} + 1 AS start_tok FROM d "
    f"WHERE n > {_CHUNK_WIN} AND (n - {_CHUNK_WIN}) % {_CHUNK_STEP} <> 0), "
    "s AS (SELECT * FROM strides UNION ALL SELECT * FROM tail) "
    "SELECT doc_id, CAST(row_number() OVER (PARTITION BY doc_id "
    "ORDER BY start_tok) AS BIGINT) AS passage_id, start_tok, "
    f"least({_CHUNK_WIN}, n - start_tok + 1) AS n_tok FROM s"
)


# ------------------------------------------------ BPE tokenizer training

_BPE_MERGES = 40


def _bpe_train(sf_dir: str):
    """Distributed word-count (combiner → groupby(term), the corpus-scale
    pass) feeding the driver-side merge loop over DISTINCT words
    (functions/bpe.py; the HF-tokenizers training shape)."""
    from ...functions.bpe import train_bpe

    tf = (
        _term_partials(sf_dir)
        .groupby("term")
        .aggregate(Sum("cf_p", alias_name="cf"))
        .to_pandas()
        .sort_values("term")
    )
    return train_bpe(tf["term"].tolist(), tf["cf"].tolist(), _BPE_MERGES)


def q_bpe_merges(sf_dir: str):
    """BPE tokenizer TRAINING (Sennrich et al. 2016): the learned merge
    table.  Corpus-scale work is one pre-aggregated word-count groupby;
    the merge loop runs over distinct words only (cap the table by
    min-count at open-vocabulary scale).  Oracle: pinned independent
    serial re-implementation (Counter-based) — equality pins the tie
    rule (count DESC, pair lex ASC) and every merge decision."""
    merges = _bpe_train(sf_dir)
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(merges) + 1, dtype=np.int64),
            "left": [a for a, _ in merges],
            "right": [b for _, b in merges],
        }
    )


def q_bpe_token_counts(sf_dir: str):
    """BPE ENCODING as an actor-pool stage: merge ranks ship once via
    ``ray.put``; each actor's word→pieces cache persists across batches
    (every distinct word encoded once per actor); ``__call__`` is
    vectorized (np.unique + bincount).  Output: per-doc whitespace-token
    and BPE-piece counts — the token-budget accounting step of a
    training-data pipeline."""
    from ...functions.bpe import BpeCounter

    ref = ray.put(_bpe_train(sf_dir))
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        BpeCounter,
        fn_constructor_kwargs={"merges_ref": ref},
        batch_format="pyarrow",
        concurrency=2,
        num_cpus=1,
    )


def q_fingerprints(sf_dir: str):
    ds = dedup.add_content_hash(_docs(sf_dir, ["doc_id", "text"]), out_col="fp")
    return ds.select_columns(["doc_id", "fp"])


SQL_FINGERPRINTS = "SELECT doc_id, md5(text) AS fp FROM documents"


def q_rolling_fingerprints(sf_dir: str):
    """Rolling-hash document fingerprint (Rabin-Karp min-window sketch —
    a shift-tolerant content signature): vectorized closed-form kernel
    over the flat utf-8 buffer; the oracle is the pinned scalar rolling
    implementation (pipelines/pinned.py) inlined as VALUES."""
    from ...functions.hashing import rolling_fingerprint_column

    def rfp(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "rfp": pa.array(
                    rolling_fingerprint_column(batch["text"]), pa.int64()
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(rfp, batch_format="pyarrow")


def q_winnow_fingerprints(sf_dir: str):
    """Winnowing document fingerprints (Schleimer et al. SIGMOD 2003,
    the MOSS scheme): rightmost-min selection over windows of w=4
    consecutive 8-byte rolling k-gram hashes, consecutive reselections
    collapsed.  Engine: the fully vectorized sliding-window kernel
    (functions/hashing.winnow_column — one reversed argmin + reduceat
    per batch, no per-row Python); oracle: the independent scalar
    per-window loop (pipelines/pinned.serial_winnow) inlined as
    VALUES."""
    from ...functions.hashing import winnow_column

    def fp(batch: pa.Table) -> pa.Table:
        n_fp, fp_xor = winnow_column(batch["text"])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_fp": pa.array(n_fp),
                "fp_xor": pa.array(fp_xor),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fp, batch_format="pyarrow"
    )


def q_langid_predictions(sf_dir: str):
    """Heuristic language-ID counts.  The heuristic is a pinned, pure
    marker-count rule (functions/textstats.lang_id), so it IS
    SQL-expressible — the oracle re-derives the same counts with
    replace-based substring counting."""

    def pred(batch: pa.Table) -> pa.Table:
        return pa.table({"pred_lang": lang_id_batch(batch["text"])})

    return (
        _docs(sf_dir, ["text"])
        .map_batches(pred, batch_format="pyarrow")
        .groupby("pred_lang")
        .aggregate(Count(alias_name="n"))
    )


def _marker_count_sql(markers: tuple[str, ...]) -> str:
    """Sum of non-overlapping occurrence counts of each marker in ``h``
    (same left-to-right non-overlap semantics as Python str.count)."""
    terms = [
        f"(length(h) - length(replace(h, '{m}', ''))) // {len(m)}"
        for m in markers
    ]
    return " + ".join(terms)


def _langid_sql() -> str:
    from ...functions.textstats import _LANG_MARKERS

    score_cols = ", ".join(
        f"{_marker_count_sql(_LANG_MARKERS[lang])} AS s_{lang}"
        for lang in ("de", "en", "es", "fr")
    )
    best = "greatest(s_de, s_en, s_es, s_fr)"
    return (
        "WITH sc AS (SELECT text, " + score_cols + " FROM "
        "(SELECT text, ' ' || lower(text) || ' ' AS h FROM documents)) "
        "SELECT pred_lang, count(*) AS n FROM ("
        "SELECT CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh' "
        f"WHEN {best} = 0 THEN 'und' "
        f"WHEN s_de = {best} THEN 'de' "
        f"WHEN s_en = {best} THEN 'en' "
        f"WHEN s_es = {best} THEN 'es' "
        "ELSE 'fr' END AS pred_lang FROM sc) GROUP BY pred_lang"
    )


SQL_LANGID_PREDICTIONS = _langid_sql()


# -------------------------------------------------------------- embeddings

def _query_vectors(sf_dir, n=3):
    t = read_table(sf_dir, "embeddings", ["vec_id", "embedding"]).take(n)
    rows = sorted(t, key=lambda r: r["vec_id"])[:n]
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def q_ann_topk(sf_dir: str):
    q = _query_vectors(sf_dir, 3)
    res = ann.knn_brute(
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"]), q, k=10
    )
    res["rank"] = res["rank"].astype(np.int64)
    return res


_MAXSIM_GROUP = 4    # consecutive vec_ids forming one multi-vector doc
_MAXSIM_NQVEC = 2    # query vectors per multi-vector query


def q_ann_maxsim(sf_dir: str):
    """ColBERT-style late-interaction MaxSim retrieval (Khattab &
    Zaharia, SIGIR 2020): multi-vector docs (groups of 4 consecutive
    vec_ids — the passage-token analogue) scored against multi-vector
    queries (vec_id pairs 0-1, 2-3, 4-5) as ``sum over query vectors
    of max over doc vectors of cos`` — the interaction that single-
    vector ANN cannot express.  Per-pair cosines round to 6 BEFORE the
    max (pin: max over published precisions, immune to 1e-16 kernel
    noise), maxes sum per (query, group), final round 6, top-10 by
    (score DESC, group).

    Shape: the query matrix broadcasts once; each batch emits partial
    (query, qvec, group) maxes (groups can straddle block boundaries,
    so a Max groupby merges partials); the qvec maxes then Sum per
    (query, group) and the top-k runs per query inside map_groups —
    every exchange is bounded by groups x query-vectors, never by
    vectors."""
    from ray.data.aggregate import Max

    q = _query_vectors(sf_dir, _MAXSIM_NQVEC * 3)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    qref = ray.put((q, qn))

    def part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                "qvec": pa.array([], pa.int64()),
                "grp": pa.array([], pa.int64()),
                "mx_p": pa.array([], pa.float64()),
            })
        qm, qnorm = ray.get(qref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        m = np.stack(
            batch["embedding"].to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        mn = np.linalg.norm(m, axis=1)
        mn[mn == 0] = 1.0
        cos = np.round(
            (qm @ m.T) / qnorm[:, None] / mn[None, :], 6
        )
        grp = ids // _MAXSIM_GROUP
        ug, inv = np.unique(grp, return_inverse=True)
        out_q, out_v, out_g, out_m = [], [], [], []
        for qi in range(qm.shape[0]):
            mx = np.full(ug.size, -np.inf)
            np.maximum.at(mx, inv, cos[qi])
            out_q.append(np.full(ug.size, qi // _MAXSIM_NQVEC, np.int64))
            out_v.append(np.full(ug.size, qi, np.int64))
            out_g.append(ug)
            out_m.append(mx)
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "qvec": pa.array(np.concatenate(out_v), pa.int64()),
            "grp": pa.array(np.concatenate(out_g), pa.int64()),
            "mx_p": pa.array(np.concatenate(out_m), pa.float64()),
        })

    maxes = (
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(part, batch_format="pyarrow")
        .groupby(["query_id", "qvec", "grp"])
        .aggregate(Max("mx_p", alias_name="mx"))
        .groupby(["query_id", "grp"])
        .aggregate(Sum("mx", alias_name="s"))
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["score"] = np.round(g["s"], 6)
        g = g.sort_values(
            ["score", "grp"], ascending=[False, True]
        ).head(10).reset_index(drop=True)
        return pd.DataFrame({
            "query_id": g["query_id"].astype(np.int64),
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            "group_id": g["grp"].astype(np.int64),
            "score": g["score"].astype(np.float64),
        })

    return (
        maxes.groupby("query_id")
        .map_groups(topk, batch_format="pandas")
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


SQL_ANN_MAXSIM = (
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, "
    f"vec_id // {_MAXSIM_GROUP} AS grp FROM embeddings), "
    f"q AS (SELECT vec_id // {_MAXSIM_NQVEC} AS query_id, "
    f"vec_id AS qid, v FROM e WHERE vec_id < {_MAXSIM_NQVEC * 3}), "
    "m AS (SELECT q.query_id, q.qid, e.grp, "
    "max(round(list_cosine_similarity(q.v, e.v), 6)) AS mx "
    "FROM q CROSS JOIN e GROUP BY 1, 2, 3), "
    "s AS (SELECT query_id, grp, round(sum(mx), 6) AS score "
    "FROM m GROUP BY 1, 2) "
    "SELECT query_id, rank, grp AS group_id, score FROM ("
    "SELECT query_id, grp, score, CAST(row_number() OVER ("
    "PARTITION BY query_id ORDER BY score DESC, grp) AS BIGINT) AS rank "
    "FROM s) WHERE rank <= 10 ORDER BY query_id, rank"
)


SQL_ANN_TOPK = (
    "WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv "
    "FROM embeddings WHERE vec_id < 3) "
    "SELECT query_id, rank, vec_id, score FROM ("
    "SELECT q.query_id, e.vec_id, "
    "round(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]), 6) AS score, "
    "row_number() OVER (PARTITION BY q.query_id ORDER BY "
    "round(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]), 6) DESC, e.vec_id"
    ") AS rank FROM q CROSS JOIN embeddings e) WHERE rank <= 10"
)


def q_ann_recall(sf_dir: str):
    """ANN quality evaluation — recall@10 of the IVF pruned-probe route
    against exact brute-force cosine, per query (the standard
    vector-index acceptance metric).  Composes the two existing routes
    (ann.knn_ivf over the list-partitioned index, ann.knn_brute) and
    reduces on the driver over k rows per query; oracle is the
    independent serial mirror (pinned.serial_ann_recall: numpy
    full-scan brute + the serial IVF reference)."""
    ivf = q_ann_ivf(sf_dir)
    brute = q_ann_topk(sf_dir)
    if hasattr(ivf, "to_pandas"):
        ivf = ivf.to_pandas()
    rows = []
    for qid, g in brute.groupby("query_id"):
        truth = set(g["vec_id"])
        got = set(ivf[ivf["query_id"] == qid]["vec_id"])
        rows.append((int(qid), round(len(truth & got) / len(truth), 6)))
    out = pd.DataFrame(rows, columns=["query_id", "recall"])
    out["query_id"] = out["query_id"].astype(np.int64)
    return out.sort_values("query_id").reset_index(drop=True)


def q_ann_recall_lsh(sf_dir: str):
    """ANN quality evaluation for the LSH route — recall@10 of the
    bucket-partitioned pruned-read serving against exact brute-force
    cosine, per query (the acceptance metric for the OTHER pruned
    family beside the IVF entry).  Oracle: the independent serial
    mirror (pinned.serial_ann_recall_lsh — numpy full-scan brute +
    the serial same-bucket-spec LSH reference)."""
    lsh = q_ann_lsh(sf_dir)
    brute = q_ann_topk(sf_dir)
    if hasattr(lsh, "to_pandas"):
        lsh = lsh.to_pandas()
    rows = []
    for qid, g in brute.groupby("query_id"):
        truth = set(g["vec_id"])
        got = set(lsh[lsh["query_id"] == qid]["vec_id"])
        rows.append((int(qid), round(len(truth & got) / len(truth), 6)))
    out = pd.DataFrame(rows, columns=["query_id", "recall"])
    out["query_id"] = out["query_id"].astype(np.int64)
    return out.sort_values("query_id").reset_index(drop=True)


def q_ann_hnsw(sf_dir: str):
    """Graph ANN (HNSW/Vamana class — Malkov & Yashunin 2018; the
    high-recall low-latency serving family, VERDICT r04 missing #4) as
    the SPANN/DiskANN-sharded composition: IVF coarse quantizer routes
    vectors to hive list partitions, a deterministic single-layer NSW
    graph is built PER PARTITION in groupby(list_id).map_groups, and a
    query beam-searches only its n_probe nearest partitions' stored
    graphs (path-pruned read) instead of scanning them.  Oracle = the
    pinned serial replay of the identical quantizer + graph spec
    (pipelines/pinned.serial_ann_nsw); recall vs brute is the
    ann_recall_hnsw entry + pytest."""
    q = _query_vectors(sf_dir, 3)
    idx = _tmp_index_dir(
        sf_dir, f"annnsw-{ann.ANN_VERSION}-{ann.NSW_VERSION}",
        table="embeddings",
    )
    ann.build_nsw_index(
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"]),
        idx, n_lists=8, m=12, ef_construction=64,
    )
    return ann.knn_nsw(idx, q, k=10, n_probe=4, ef_search=96)


def q_ann_recall_hnsw(sf_dir: str):
    """ANN quality evaluation for the graph route — recall@10 of the
    partitioned small-world beam search against exact brute-force
    cosine, per query.  Oracle: the independent serial mirror
    (pinned.serial_ann_recall_nsw — numpy full-scan brute + the serial
    same-spec graph reference)."""
    nsw = q_ann_hnsw(sf_dir)
    brute = q_ann_topk(sf_dir)
    if hasattr(nsw, "to_pandas"):
        nsw = nsw.to_pandas()
    rows = []
    for qid, g in brute.groupby("query_id"):
        truth = set(g["vec_id"])
        got = set(nsw[nsw["query_id"] == qid]["vec_id"])
        rows.append((int(qid), round(len(truth & got) / len(truth), 6)))
    out = pd.DataFrame(rows, columns=["query_id", "recall"])
    out["query_id"] = out["query_id"].astype(np.int64)
    return out.sort_values("query_id").reset_index(drop=True)


def q_ann_filtered(sf_dir: str):
    """Filtered vector search (the vector-DB metadata-predicate kNN —
    Elasticsearch knn ``filter`` / pgvector ``WHERE``): brute cosine
    top-k restricted to vectors with ``label = 1``.  PRE-filtered: the
    predicate applies to the Dataset BEFORE the scoring pass (pyarrow
    filter pushed toward the read), so results are exact within the
    allowed set and never come back short the way post-filtering a
    top-k can."""
    q = _query_vectors(sf_dir, 3)
    ds = read_table(
        sf_dir, "embeddings", ["vec_id", "embedding", "label"]
    ).filter(expr="label == 1")
    res = ann.knn_brute(ds, q, k=10)
    res["rank"] = res["rank"].astype(np.int64)
    return res


SQL_ANN_FILTERED = (
    "WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv "
    "FROM embeddings WHERE vec_id < 3) "
    "SELECT query_id, rank, vec_id, score FROM ("
    "SELECT q.query_id, e.vec_id, "
    "round(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]), 6) AS score, "
    "row_number() OVER (PARTITION BY q.query_id ORDER BY "
    "round(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]), 6) DESC, e.vec_id"
    ") AS rank FROM q CROSS JOIN embeddings e WHERE e.label = 1) "
    "WHERE rank <= 10"
)


def q_ann_ivf(sf_dir: str):
    """IVF similarity search (the k-means-bucketed scale path beside the
    LSH one): coarse-quantized, list-PARTITIONED persisted index; each
    query probes only its n_probe nearest lists' partitions.  Oracle =
    the pinned serial full-scan reference of the same quantizer spec
    (pipelines/pinned.py); recall vs brute is pytest-measured."""
    q = _query_vectors(sf_dir, 3)
    idx = _tmp_index_dir(sf_dir, f"annivf-{ann.ANN_VERSION}", table="embeddings")
    ann.build_ivf_index(
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"]),
        idx, n_lists=16,
    )
    return ann.knn_ivf(idx, q, k=10, n_probe=4)


def q_ann_sq8(sf_dir: str):
    """Int8 scalar-quantized ANN (FAISS/Lucene SQ shape): the persisted
    index stores one BINARY codes column (dim bytes/vector — 4× smaller
    than float32), queries decode per batch (fused code*scale+min) and
    run the same matmul-cosine + partial-top-k combiner as brute.  The
    memory/IO-scale path: at 10^12 vectors the codes table is what gets
    scanned, the float vectors never move.  Oracle = pinned serial
    reference of the identical train/encode/decode spec
    (pipelines/pinned.serial_ann_sq8); recall vs brute pytest-measured."""
    q = _query_vectors(sf_dir, 3)
    idx = _tmp_index_dir(
        sf_dir, f"annsq8-{ann.SQ8_VERSION}", table="embeddings"
    )
    ann.build_sq8_index(
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"]), idx
    )
    return ann.knn_sq8(idx, q, k=10)


def q_ann_pq(sf_dir: str):
    """Product-quantized ANN with asymmetric-distance scoring (Jégou
    et al. 2011; the FAISS IVF-PQ memory-scale regime): the persisted
    index stores m=8 BYTES per 64-dim vector (32× under float32);
    queries build one (m, ks) dot-lookup table each and score batches
    with m fancy-indexed gathers — no decode, no per-vector float math.
    Oracle = pinned serial reference of the identical train/encode
    spec scoring via decode + per-subspace dots in the same
    accumulation order (pipelines/pinned.serial_ann_pq)."""
    q = _query_vectors(sf_dir, 3)
    idx = _tmp_index_dir(sf_dir, f"annpq-{ann.PQ_VERSION}", table="embeddings")
    ann.build_pq_index(
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"]), idx
    )
    return ann.knn_pq(idx, q, k=10)


def q_ann_ivfpq(sf_dir: str):
    """The full FAISS IVF-PQ composition: coarse k-means routing to
    ``list_id=`` partitions + m-byte RESIDUAL PQ codes within each —
    queries path-prune to ``n_probe`` partitions and score via per-list
    ADC lookup tables (dot(q, centroid) + table-gathered residual
    terms; no decode).  At 10^12 vectors this is ~8 TB of codes read
    n_probe/n_lists at a time.  Oracle = pinned serial reference of the
    identical train/route/encode spec (pipelines/pinned.serial_ann_ivfpq)."""
    q = _query_vectors(sf_dir, 3)
    idx = _tmp_index_dir(
        sf_dir, f"annivfpq-{ann.PQ_VERSION}", table="embeddings"
    )
    ann.build_ivfpq_index(
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"]), idx
    )
    return ann.knn_ivfpq(idx, q, k=10, n_probe=4)


def q_embedding_neardup(sf_dir: str):
    return dedup.embedding_neardup_pairs(
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"]), threshold=0.4
    )


def q_kmeans_clusters(sf_dir: str):
    """Distributed full-corpus Lloyd k-means (stages/cluster.kmeans_fit):
    centroids broadcast per iteration, one streaming map_batches pass
    emitting k tiny integer partials per block, driver integer-reduce —
    NO shuffle, and parallelism-invariant by the fixed-point update spec.
    Oracle = pinned whole-matrix serial Lloyd of the same spec."""
    from ...stages import cluster

    _, summary = cluster.kmeans_fit(
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"]), k=8
    )
    return summary


def q_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): k-means the embedding corpus, then
    drop within-cluster semantic near-duplicates by the greedy
    lowest-id-kept rule (cosine > tau vs any kept member).  The one
    shuffle is the per-cluster groupby; cluster size n/k bounds
    single-group work.  Oracle = pinned serial reference of the same
    centroid + keep spec."""
    from ...stages import cluster

    return cluster.semdedup(
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"]),
        k=8, tau=0.4,
    )


SQL_EMBEDDING_NEARDUP = (
    "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
    "round(list_cosine_similarity(a.embedding::DOUBLE[], "
    "b.embedding::DOUBLE[]), 6) AS cosine "
    "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
    "WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], "
    "b.embedding::DOUBLE[]), 6) >= 0.4"
)


def q_ann_lsh(sf_dir: str):
    """Approximate ANN over a bucket-PARTITIONED persisted index: queries
    read only their matching bucket partitions (path-pruned parquet read),
    not the whole vector table.  Approximate vs ``ann_topk`` by design
    (recall vs brute is pytest-measured); its oracle is the pinned serial
    full-scan reference of the SAME bucket spec (pipelines/pinned.py) —
    the check proves the partitioned pruned-read route returns exactly
    what a serial scan of those buckets returns."""
    q = _query_vectors(sf_dir, 3)
    idx = _tmp_index_dir(sf_dir, f"annlsh-{ann.ANN_VERSION}", table="embeddings")
    ann.build_lsh_index(
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"]),
        idx, n_bits=4, n_tables=8,
    )
    return ann.knn_lsh_indexed(idx, q, k=10, n_bits=4, n_tables=8)


from ._nsacc import export as _ns_export

_ns_export(globals())
del _ns_export
