"""Term-expansion queries: wildcard/prefix and fuzzy (edit-distance)
search over the segment index (fulltext_index tier; SURVEY.md §2.6
extension — the reference stack has no expansion queries, SURVEY.md §0;
semantics follow Lucene's WildcardQuery / FuzzyQuery rewrite model: a
pattern expands against the TERM DICTIONARY, then the expanded term set
runs as a disjunction).

Two phases, both Ray-Data-shaped:

1. **Expansion** — a ``map_batches`` stream over the index's global term
   dictionary (``stats/term_df``, one pruned 2-column parquet read), each
   batch matched VECTORIZED against every pattern in the (small) query
   workload: ``pyarrow.compute.match_like`` for SQL-style ``%``/``_``
   wildcards, a byte-matrix Levenshtein<=1 kernel for fuzzy (length
   bucketing + common-prefix/suffix rule — never a per-(term, pattern)
   Python loop).  The dictionary STREAMS (never collected whole); only
   the matches — O(workload expansions) — return to the driver.  At
   10^12 docs the dictionary read stays a column scan fanned over
   row-groups; a SymSpell-style deletion-neighborhood index is the
   documented upgrade path for fuzzy if dictionary scans become the
   bottleneck.
2. **Scoring** — the expanded per-query term lists feed the existing
   boolean disjunction scorer (``stages/phrase.boolean_search``:
   should-terms, BM25 sum with global idf per matched term), so
   expansion queries rank EXACTLY like an OR query over the matched
   terms — the property the SQL oracles check (``... JOIN df ON df.term
   LIKE pattern`` / ``levenshtein(df.term, q) <= max_dist``).

Fuzzy matching is byte-level over utf-8 (identical to character-level
Levenshtein on ASCII corpora, which is what the pinned tokenizer
emits for the test tables); the distance-1 rule is exact:
``lev(a, b) <= 1``  iff  same length and hamming <= 1, or length diff 1
and common_prefix + common_suffix >= min(len) (one insertion).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .phrase import boolean_search

__all__ = [
    "expand_wildcard",
    "expand_fuzzy",
    "expand_regex",
    "suggest_prefix",
    "suggest_spelling",
    "suggest_phrase",
    "wildcard_search",
    "fuzzy_search",
    "regex_search",
    "bool_prefix_search",
]


def _term_df_path(index_dir: str) -> str:
    return os.path.join(index_dir, "stats", "term_df")


# the shared zero-copy (offsets, data) string-buffer view — one
# implementation for every byte-position-vectorized kernel
from ..functions.hashing import str_buffer_view as _str_bytes  # noqa: E402


def _byte_matrix(offsets: np.ndarray, data: np.ndarray, rows: np.ndarray,
                 width: int) -> np.ndarray:
    """(len(rows), width) uint8 matrix of equal-length strings gathered
    from the flat buffer — one fancy-index, no per-row Python."""
    if rows.size == 0:
        return np.empty((0, width), dtype=np.uint8)
    if width == 0:
        return np.empty((rows.size, 0), dtype=np.uint8)
    return data[offsets[rows][:, None] + np.arange(width)]


def _common_prefix_len(m: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Per-row length of the common prefix of matrix rows and ``q``
    (compared over ``min(m.shape[1], q.size)`` bytes)."""
    w = min(m.shape[1], q.size)
    if w == 0:
        return np.zeros(m.shape[0], dtype=np.int64)
    ne = m[:, :w] != q[:w]
    first = ne.argmax(axis=1)
    return np.where(ne.any(axis=1), first, w).astype(np.int64)


def _lev1_rows(offsets: np.ndarray, data: np.ndarray, lens: np.ndarray,
               q: bytes) -> np.ndarray:
    """Row indices of dictionary terms with Levenshtein distance <= 1
    from ``q`` — three vectorized length buckets (L-1, L, L+1)."""
    qb = np.frombuffer(q, dtype=np.uint8)
    L = qb.size
    out = []
    # same length: hamming <= 1
    rows = np.flatnonzero(lens == L)
    if rows.size:
        m = _byte_matrix(offsets, data, rows, L)
        out.append(rows[(m != qb).sum(axis=1) <= 1])
    # length +/- 1: one insertion/deletion iff cp + cs >= min length
    for w in (L - 1, L + 1):
        if w < 1:
            continue
        rows = np.flatnonzero(lens == w)
        if rows.size == 0:
            continue
        m = _byte_matrix(offsets, data, rows, w)
        cp = _common_prefix_len(m, qb)
        cs = _common_prefix_len(m[:, ::-1], qb[::-1])
        out.append(rows[cp + cs >= min(w, L)])
    if not out:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(out))


class _ExpandMatcher:
    """``map_batches`` task over the term dictionary: emit
    ``(query_id, term, df)`` for every (pattern, matching term) pair.
    Stateless per batch — patterns ship once in the task closure (they
    are the query workload, small by construction)."""

    def __init__(self, patterns: list[tuple[int, str]], kind: str):
        if kind not in ("wildcard", "fuzzy", "regex"):
            raise ValueError(f"unknown expansion kind: {kind!r}")
        self.patterns = patterns
        self.kind = kind

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = batch["term"]
        dfs = batch["df"]
        out_q: list[pa.Array] = []
        out_t: list[pa.Array] = []
        out_d: list[pa.Array] = []
        if batch.num_rows:
            if self.kind == "fuzzy":
                offsets, data = _str_bytes(
                    terms.combine_chunks()
                    if isinstance(terms, pa.ChunkedArray)
                    else terms
                )
                lens = np.diff(offsets)
            for qid, pat in self.patterns:
                if self.kind == "wildcard":
                    mask = pc.match_like(terms, pat)
                    t = pc.filter(terms, mask)
                    d = pc.filter(dfs, mask)
                elif self.kind == "regex":
                    # whole-term match (Lucene RegexpQuery anchors both
                    # ends); RE2 both here and in the DuckDB oracle
                    mask = pc.match_substring_regex(
                        terms, f"^(?:{pat})$"
                    )
                    t = pc.filter(terms, mask)
                    d = pc.filter(dfs, mask)
                else:
                    rows = _lev1_rows(offsets, data, lens, pat.encode())
                    t = pc.take(terms, pa.array(rows, pa.int64()))
                    d = pc.take(dfs, pa.array(rows, pa.int64()))
                if len(t):
                    out_q.append(pa.array(np.full(len(t), qid, np.int64)))
                    out_t.append(
                        t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t
                    )
                    out_d.append(
                        d.combine_chunks() if isinstance(d, pa.ChunkedArray) else d
                    )
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.concat_arrays(out_q),
                "term": pa.concat_arrays(
                    [a.cast(pa.string()) for a in out_t]
                ),
                "df": pa.concat_arrays([a.cast(pa.int64()) for a in out_d]),
            }
        )


def _merge_expansion(pairs, patterns: list[tuple[int, str]],
                     max_expansions: int | None) -> dict[int, list[str]]:
    """Driver merge shared by the streamed and trigram-pruned routes:
    qid -> sorted matched terms, deduped BEFORE the ``(df DESC, term)``
    rewrite cap so the cap counts distinct terms and is deterministic
    (not batch- or partition-order-dependent)."""
    out: dict[int, list[str]] = {qid: [] for qid, _ in patterns}
    if len(pairs) == 0:
        # an all-empty-batch Dataset can come back as a 0x0 frame with
        # no columns — nothing matched any pattern
        return out
    for qid, g in pairs.groupby("query_id"):
        # one qid can carry several patterns with overlapping matches —
        # and the pruned route can see one term in several partitions
        g = g.drop_duplicates("term")
        if max_expansions is not None and len(g) > max_expansions:
            g = g.sort_values(
                ["df", "term"], ascending=[False, True]
            ).head(max_expansions)
        out[int(qid)] = sorted(g["term"].tolist())
    return out


def _expand(index_dir: str, patterns: list[tuple[int, str]], kind: str,
            max_expansions: int | None) -> dict[int, list[str]]:
    """Stream the dictionary through the matcher; return qid -> sorted
    matched terms (capped to the ``max_expansions`` highest-df terms,
    ties broken by term — Lucene's rewrite cap, applied AFTER the full
    stream so the cap is deterministic, not batch-order-dependent)."""
    if not patterns:
        return {}
    pairs = (
        ray.data.read_parquet(_term_df_path(index_dir), columns=["term", "df"])
        .map_batches(
            _ExpandMatcher(patterns, kind),
            batch_format="pyarrow",
            batch_size=64 * 1024,
        )
        .to_pandas()
    )
    return _merge_expansion(pairs, patterns, max_expansions)


def expand_wildcard(index_dir: str, patterns: list[tuple[int, str]],
                    *, max_expansions: int | None = None) -> dict[int, list[str]]:
    """qid -> dictionary terms matching the SQL-style LIKE pattern
    (``%`` = any run, ``_`` = one char; a pattern with no wildcard is an
    exact-term probe, a trailing-% pattern is a prefix query)."""
    return _expand(index_dir, patterns, "wildcard", max_expansions)


def expand_fuzzy(index_dir: str, terms: list[tuple[int, str]],
                 *, max_expansions: int | None = None) -> dict[int, list[str]]:
    """qid -> dictionary terms within Levenshtein distance 1 of the query
    term (byte-level utf-8; includes the exact term when present)."""
    return _expand(index_dir, terms, "fuzzy", max_expansions)


def expand_regex(index_dir: str, patterns: list[tuple[int, str]],
                 *, max_expansions: int | None = None) -> dict[int, list[str]]:
    """qid -> dictionary terms fully matching the RE2 regex (anchored at
    both ends, Lucene RegexpQuery semantics)."""
    return _expand(index_dir, patterns, "regex", max_expansions)


class _SuggestMatcher:
    """``map_batches`` task over the (term, cf) dictionary stream: for
    each prefix emit the batch-local top-``k`` completions by
    ``(cf DESC, term ASC)`` — a per-batch combiner, so at most
    ``k × len(prefixes)`` rows per batch reach the driver merge no
    matter how large the dictionary is."""

    def __init__(self, prefixes: list[tuple[int, str]], k: int):
        self.prefixes = prefixes
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list[pa.Table] = []
        if batch.num_rows:
            for qid, prefix in self.prefixes:
                mask = pc.starts_with(batch["term"], prefix)
                t = pc.filter(batch["term"], mask)
                if len(t) == 0:
                    continue
                c = pc.filter(batch["cf"], mask).to_numpy(zero_copy_only=False)
                if len(t) > self.k:
                    # partial top-k: lexsort on (-cf, term) and slice
                    tn = t.to_numpy(zero_copy_only=False)
                    order = np.lexsort((tn, -c))[: self.k]
                    idx = pa.array(order, pa.int64())
                    t = pc.take(t, idx)
                    c = c[order]
                out.append(pa.table({
                    "query_id": pa.array(np.full(len(t), qid, np.int64)),
                    "term": t.combine_chunks()
                    if isinstance(t, pa.ChunkedArray) else t,
                    "cf": pa.array(c.astype(np.int64)),
                }))
        if not out:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "cf": pa.array([], pa.int64()),
            })
        return pa.concat_tables(out)


def suggest_prefix(
    index_dir: str,
    prefixes: list[tuple[int, str]],
    *,
    k: int = 5,
) -> "pd.DataFrame":
    """Autocomplete / search-suggest: ``(query_id, prefix)`` -> the top-``k``
    dictionary completions ranked by collection frequency
    ``(cf DESC, term ASC)``, as ``(query_id, rank, term, cf)``.

    Same shape as the other expansion ops: the index's global term
    dictionary STREAMS through a vectorized ``starts_with`` matcher with
    a per-batch top-k combiner; only O(k × prefixes × batches) partial
    winners reach the driver, which merges them with one final sort.  A
    prefix-range pushdown (dictionary parquet is written term-sorted, so
    ``term >= p AND term < p+\\xff`` prunes row groups) is the documented
    upgrade when the dictionary scan itself becomes the bottleneck.
    """
    import pandas as pd

    if not prefixes:
        return pd.DataFrame({
            "query_id": pd.array([], dtype=np.int64),
            "rank": pd.array([], dtype=np.int32),
            "term": pd.array([], dtype=object),
            "cf": pd.array([], dtype=np.int64),
        })
    parts = (
        ray.data.read_parquet(_term_df_path(index_dir), columns=["term", "cf"])
        .map_batches(
            _SuggestMatcher(prefixes, k),
            batch_format="pyarrow",
            batch_size=64 * 1024,
        )
        .to_pandas()
    )
    out = []
    for qid, _prefix in prefixes:
        g = parts[parts["query_id"] == qid] if len(parts) else parts
        if len(g) == 0:
            continue
        g = g.sort_values(["cf", "term"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        out.append(g[["query_id", "rank", "term", "cf"]])
    if not out:
        return pd.DataFrame({
            "query_id": pd.array([], dtype=np.int64),
            "rank": pd.array([], dtype=np.int32),
            "term": pd.array([], dtype=object),
            "cf": pd.array([], dtype=np.int64),
        })
    return pd.concat(out, ignore_index=True)


class _SpellMatcher:
    """``map_batches`` task over the (term, df) dictionary stream: for
    each query term emit its Levenshtein-distance<=1 dictionary
    neighbors, tagged ``dist`` 0 (the term itself, carrying its own df
    for the popularity gate) or 1 (a correction candidate).  Candidates
    get a per-batch top-``k`` combiner on ``(df DESC, term ASC)`` — the
    popularity gate only ever REMOVES low-df rows, so batch-local top-k
    winners are a superset of the global gated top-k (same argument as
    the prefix suggester); self rows always pass through (at most one
    per query across the whole stream)."""

    def __init__(self, terms: list[tuple[int, str]], k: int):
        self.terms = terms
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list[pa.Table] = []
        if batch.num_rows:
            col = batch["term"]
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            offsets, data = _str_bytes(arr)
            lens = np.diff(offsets)
            dfs = batch["df"].to_numpy(zero_copy_only=False).astype(np.int64)
            for qid, qterm in self.terms:
                rows = _lev1_rows(offsets, data, lens, qterm.encode())
                if rows.size == 0:
                    continue
                t = pc.take(arr, pa.array(rows, pa.int64()))
                tn = t.to_numpy(zero_copy_only=False)
                d = dfs[rows]
                is_self = tn == qterm
                crows = np.flatnonzero(~is_self)
                if crows.size > self.k:
                    order = np.lexsort((tn[crows], -d[crows]))[: self.k]
                    crows = crows[order]
                keep = np.concatenate([np.flatnonzero(is_self), crows])
                out.append(pa.table({
                    "query_id": pa.array(np.full(keep.size, qid, np.int64)),
                    "term": pa.array(tn[keep], pa.string()),
                    "df": pa.array(d[keep]),
                    "dist": pa.array(
                        (~is_self[keep]).astype(np.int8)
                    ),
                }))
        if not out:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "dist": pa.array([], pa.int8()),
            })
        return pa.concat_tables(out)


def suggest_spelling(
    index_dir: str,
    terms: list[tuple[int, str]],
    *,
    k: int = 3,
) -> "pd.DataFrame":
    """Did-you-mean spelling suggestions (Lucene DirectSpellChecker
    semantics, ``suggestMode=SUGGEST_MORE_POPULAR``): for each
    ``(query_id, typed term)`` return the top-``k`` dictionary terms at
    Levenshtein distance exactly 1 whose document frequency EXCEEDS the
    typed term's own df (0 when out-of-vocabulary), ranked
    ``(df DESC, term ASC)`` as ``(query_id, rank, suggestion, df)``.

    One streamed pass over the index's global term dictionary — the
    vectorized distance-1 kernel of the fuzzy expansion plus a per-batch
    top-k combiner, so O(k x terms x batches) rows reach the driver;
    the popularity gate (df > df_typed) is applied at the driver merge
    where the typed term's own df (the at-most-one dist=0 row per
    query) is known globally.
    """
    import pandas as pd

    cols = ["query_id", "rank", "suggestion", "df"]

    def _empty() -> "pd.DataFrame":
        return pd.DataFrame({
            "query_id": pd.array([], dtype=np.int64),
            "rank": pd.array([], dtype=np.int32),
            "suggestion": pd.array([], dtype=object),
            "df": pd.array([], dtype=np.int64),
        })

    if not terms:
        return _empty()
    parts = (
        ray.data.read_parquet(_term_df_path(index_dir), columns=["term", "df"])
        .map_batches(
            _SpellMatcher(terms, k),
            batch_format="pyarrow",
            batch_size=64 * 1024,
        )
        .to_pandas()
    )
    out = []
    for qid, _qterm in terms:
        g = parts[parts["query_id"] == qid] if len(parts) else parts
        if len(g) == 0:
            continue
        self_df = int(g.loc[g["dist"] == 0, "df"].max()) if (g["dist"] == 0).any() else 0
        g = g[(g["dist"] == 1) & (g["df"] > self_df)]
        if len(g) == 0:
            continue
        g = g.sort_values(["df", "term"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        g = g.rename(columns={"term": "suggestion"})
        out.append(g[cols])
    if not out:
        return _empty()
    return pd.concat(out, ignore_index=True)


def suggest_phrase(
    index_dir: str,
    queries: list[tuple[int, list[str]]],
) -> "pd.DataFrame":
    """Whole-query did-you-mean (the Elasticsearch phrase-suggester
    shape, term-wise candidate model + collate): every typed term is
    replaced by its BEST more-popular distance-1 dictionary correction
    (rank-1 of :func:`suggest_spelling`; terms with no better spelling
    stay as typed), and the rewritten query is COLLATED — verified
    against the index with a conjunctive (AND) hit count; rewrites with
    zero hits are pruned.  Returns ``(query_id, rewrite, n_hits)``.

    Cost shape: one streamed dictionary pass for ALL queries' term
    corrections (the spell matcher), then O(terms) posting point reads
    for the collate counts — the corpus itself is never scanned."""
    import pandas as pd

    from .search import IndexReader

    typed = sorted({t for _, ts in queries for t in ts})
    sugg = suggest_spelling(index_dir, list(enumerate(typed)), k=1)
    best = {
        typed[int(r.query_id)]: r.suggestion for r in sugg.itertuples()
    }
    reader = IndexReader(index_dir)
    # batch-load every rewrite term once per segment (the serving-path
    # pattern) instead of one filtered read per (segment, term)
    all_rewrite = sorted({
        best.get(t, t) for _qid, terms in queries for t in terms
    })
    reader.dfs(all_rewrite)
    for sid in reader.seg_ids:
        reader.load_postings(sid, all_rewrite)
    out_q, out_r, out_n = [], [], []
    for qid, terms in queries:
        rewrite = [best.get(t, t) for t in terms]
        uniq = sorted(set(rewrite))
        if not uniq:
            continue  # a query that tokenizes to nothing collates empty
        arrs = [reader.term_arrays(reader.seg_ids, t) for t in uniq]
        if any(a is None for a in arrs):
            continue  # collate: a term with no postings -> zero hits
        order = sorted(range(len(uniq)), key=lambda i: arrs[i][0].size)
        cand = arrs[order[0]][0]
        for i in order[1:]:
            cand = cand[np.isin(cand, arrs[i][0], assume_unique=True)]
            if cand.size == 0:
                break
        if reader.deleted.size and cand.size:
            from .deletes import live_mask

            cand = cand[live_mask(cand, reader.deleted)]
        if cand.size == 0:
            continue
        out_q.append(qid)
        out_r.append(" ".join(rewrite))
        out_n.append(int(cand.size))
    return pd.DataFrame({
        "query_id": np.asarray(out_q, dtype=np.int64),
        "rewrite": pd.array(out_r, dtype=object),
        "n_hits": np.asarray(out_n, dtype=np.int64),
    })


def _search_expanded(index_dir: str, expansions: dict[int, list[str]],
                     k: int, concurrency: int, batch_size: int,
                     packs_ref) -> "ray.data.Dataset":
    qids = sorted(expansions)
    qtbl = pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "must": pa.array([[] for _ in qids], pa.list_(pa.string())),
            "should": pa.array(
                [expansions[q] for q in qids], pa.list_(pa.string())
            ),
            "must_not": pa.array([[] for _ in qids], pa.list_(pa.string())),
        }
    )
    return boolean_search(
        index_dir,
        ray.data.from_arrow(qtbl),
        k=k,
        concurrency=concurrency,
        batch_size=batch_size,
        packs_ref=packs_ref,
    )


def wildcard_search(
    index_dir: str,
    patterns: list[tuple[int, str]],
    *,
    k: int = 10,
    max_expansions: int | None = None,
    concurrency: int = 4,
    batch_size: int = 256,
    packs_ref=None,
) -> "ray.data.Dataset":
    """Wildcard/prefix query pipeline: (query_id, LIKE-pattern) ->
    (query_id, rank, doc_id, score).  Expansion streams the dictionary;
    scoring is the boolean OR of the matched terms (BM25 sum, global
    idf), so results equal ``boolean_search(should=matched_terms)``."""
    exp = expand_wildcard(index_dir, patterns, max_expansions=max_expansions)
    return _search_expanded(
        index_dir, exp, k, concurrency, batch_size, packs_ref
    )


def fuzzy_search(
    index_dir: str,
    terms: list[tuple[int, str]],
    *,
    k: int = 10,
    max_expansions: int | None = None,
    concurrency: int = 4,
    batch_size: int = 256,
    packs_ref=None,
) -> "ray.data.Dataset":
    """Fuzzy query pipeline: (query_id, term) -> (query_id, rank, doc_id,
    score) over dictionary terms within edit distance 1."""
    exp = expand_fuzzy(index_dir, terms, max_expansions=max_expansions)
    return _search_expanded(
        index_dir, exp, k, concurrency, batch_size, packs_ref
    )


def regex_search(
    index_dir: str,
    patterns: list[tuple[int, str]],
    *,
    k: int = 10,
    max_expansions: int | None = None,
    concurrency: int = 4,
    batch_size: int = 256,
    packs_ref=None,
) -> "ray.data.Dataset":
    """Regex query pipeline: (query_id, RE2 pattern) -> (query_id, rank,
    doc_id, score); whole-term match, ranked as the boolean OR of the
    matched terms."""
    exp = expand_regex(index_dir, patterns, max_expansions=max_expansions)
    return _search_expanded(
        index_dir, exp, k, concurrency, batch_size, packs_ref
    )


def bool_prefix_search(
    index_dir: str,
    queries: list[tuple[int, list[str], str]],
    *,
    k: int = 10,
    max_expansions: int = 50,
    concurrency: int = 4,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """Elasticsearch ``match_bool_prefix``: ``(query_id, full_terms,
    prefix)`` -> ``(query_id, rank, doc_id, score)``.  The full terms
    score as BM25 ``should`` clauses; the trailing (still-being-typed)
    prefix expands against the dictionary — same streamed matcher and
    ``(df DESC, term)`` rewrite cap as the wildcard query, ES default
    ``max_expansions=50`` — and contributes CONSTANT_SCORE
    ``search.BOOL_PREFIX_BONUS`` once per matching doc.  A doc matching
    only the prefix clause is still a hit (score == bonus), matching the
    bool-should semantics."""
    from .search import search

    exp = expand_wildcard(
        index_dir,
        [(qid, f"{pre}%") for qid, _t, pre in queries],
        max_expansions=max_expansions,
    )
    qtbl = pa.table(
        {
            "query_id": pa.array([q for q, _, _ in queries], pa.int64()),
            "terms": pa.array(
                [t for _, t, _ in queries], pa.list_(pa.string())
            ),
            "bonus_terms": pa.array(
                [exp.get(q, []) for q, _, _ in queries],
                pa.list_(pa.string()),
            ),
        }
    )
    return search(
        index_dir,
        ray.data.from_arrow(qtbl),
        k=k,
        mode="bool_prefix",
        concurrency=concurrency,
        batch_size=batch_size,
    )
