"""Round-4 batch-2 invariants.

* common-terms query: df split, high-terms-only-add-score, and the
  all-high fallback to a plain boolean OR.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from defactonlp_ray.stages.index_build import build_index
from defactonlp_ray.stages.phrase import (
    boolean_search,
    common_terms_search,
)


def _mini_index(tmp_path, texts):
    work = str(tmp_path)
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(texts)), type="int64"),
            "text": pa.array(texts),
        }),
        f"{work}/docs.parquet",
    )
    idx = f"{work}/index"
    build_index(ray.data.read_parquet(f"{work}/docs.parquet"), idx, seg_docs=4)
    return idx


# "the" appears in 7/8 docs (df 87% > the 50% cutoff used below: HIGH);
# "rare" and "data" are low-frequency
CT_TEXTS = [
    "the rare signal the",
    "the data table the",
    "the data rare",
    "the noise floor",
    "the common words only",
    "the common words again",
    "the filler text",
    "quiet corner",
]


def _qds(terms_lists):
    return ray.data.from_arrow(pa.table({
        "query_id": pa.array(range(len(terms_lists)), pa.int64()),
        "terms": pa.array(terms_lists, pa.list_(pa.string())),
    }))


def test_common_terms_candidates_gated_by_low_term(tmp_path):
    idx = _mini_index(tmp_path, CT_TEXTS)
    res = common_terms_search(
        idx, _qds([["the", "rare"]]), k=10, concurrency=1,
        cutoff=(50, 100),
    ).to_pandas()
    # only docs containing the LOW term "rare" qualify — doc 3..7 all
    # contain "the" but never enter the result
    assert set(res["doc_id"]) == {0, 2}
    # length normalization dominates the extra "the" occurrence: doc 2
    # (dl=3) outranks doc 0 (dl=4) under exact BM25
    top = res.sort_values("rank").iloc[0]
    assert top["doc_id"] == 2


def test_common_terms_all_high_falls_back_to_or(tmp_path):
    idx = _mini_index(tmp_path, CT_TEXTS)
    ct = common_terms_search(
        idx, _qds([["the"]]), k=10, concurrency=1, cutoff=(50, 100),
    ).to_pandas()
    booled = boolean_search(
        idx,
        ray.data.from_arrow(pa.table({
            "query_id": pa.array([0], pa.int64()),
            "must": pa.array([[]], pa.list_(pa.string())),
            "should": pa.array([["the"]], pa.list_(pa.string())),
            "must_not": pa.array([[]], pa.list_(pa.string())),
        })),
        k=10, concurrency=1,
    ).to_pandas()
    a = ct.sort_values(["rank"]).reset_index(drop=True)
    b = booled.sort_values(["rank"]).reset_index(drop=True)
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert list(a["score"]) == list(b["score"])


def test_common_terms_score_is_full_bm25_over_candidates(tmp_path):
    idx = _mini_index(tmp_path, CT_TEXTS)
    # low term "data": candidates {1, 2}; high term "the" adds score
    with_high = common_terms_search(
        idx, _qds([["data", "the"]]), k=10, concurrency=1, cutoff=(50, 100),
    ).to_pandas()
    low_only = common_terms_search(
        idx, _qds([["data"]]), k=10, concurrency=1, cutoff=(50, 100),
    ).to_pandas()
    assert set(with_high["doc_id"]) == set(low_only["doc_id"]) == {1, 2}
    m_hi = dict(zip(with_high["doc_id"], with_high["score"]))
    m_lo = dict(zip(low_only["doc_id"], low_only["score"]))
    for d in (1, 2):
        assert m_hi[d] > m_lo[d]


def test_events_ntile_remainder_rule_matches_sql_ntile():
    """The in-group tile assignment follows SQL NTILE's remainder rule:
    n rows into k tiles gives the first (n mod k) tiles one extra row,
    in rank order."""
    import duckdb
    import numpy as np
    import pandas as pd

    from defactonlp_ray.pipelines.queries import _NTILE_K

    rng = range(11)  # 11 rows / 4 tiles -> sizes 3,3,3,2
    df = pd.DataFrame({
        "event_id": list(rng),
        "value": [float(7 * i % 11) for i in rng],
    })
    # the entry's vectorized rule
    sub = df.sort_values(["value", "event_id"])
    base, rem = divmod(len(sub), _NTILE_K)
    sizes = np.full(_NTILE_K, base, dtype=np.int64)
    sizes[:rem] += 1
    got = dict(zip(
        sub["event_id"],
        np.repeat(np.arange(1, _NTILE_K + 1, dtype=np.int64), sizes),
    ))
    ref = dict(duckdb.connect().execute(
        f"SELECT event_id, NTILE({_NTILE_K}) OVER (ORDER BY value, event_id) "
        "FROM df"
    ).fetchall())
    assert got == {k: np.int64(v) for k, v in ref.items()}
    assert sorted(sizes, reverse=True) == [3, 3, 3, 2]


def test_mg_reduce_mergeable_survival_guarantee():
    """Misra-Gries mergeability: for random streams split into random
    partitions, summing per-partition k-counter summaries and reducing
    again must keep every term with true count > N/(k+1), and the
    two-pass exact filter must equal the exact heavy-hitter set."""
    import numpy as np
    import pandas as pd

    from defactonlp_ray.functions.sketches import mg_reduce

    rng = np.random.default_rng(7)
    for trial in range(20):
        k = int(rng.integers(2, 12))
        vocab = np.array([f"t{i}" for i in range(int(rng.integers(5, 40)))])
        # skewed stream
        weights = rng.pareto(1.0, vocab.size) + 0.01
        stream = rng.choice(vocab, size=2000, p=weights / weights.sum())
        n = stream.size
        true = pd.Series(stream).value_counts()
        heavy = set(true.index[true.to_numpy() * (k + 1) > n])
        # random partitioning
        parts = np.sort(rng.integers(0, 5, size=n))
        merged: dict[str, int] = {}
        for p in range(5):
            seg = stream[parts == p]
            if not seg.size:
                continue
            c = pd.Series(seg).value_counts()
            st, sc = mg_reduce(
                c.index.to_numpy(object), c.to_numpy(np.int64), k
            )
            for t, v in zip(st, sc):
                merged[t] = merged.get(t, 0) + int(v)
        mt = np.array(list(merged), dtype=object)
        mc = np.array([merged[t] for t in mt], dtype=np.int64)
        ct, _ = mg_reduce(mt, mc, k)
        cand = set(ct.tolist())
        assert heavy <= cand, (trial, k, heavy - cand)
        exact = {t for t in cand if true.get(t, 0) * (k + 1) > n}
        assert exact == heavy
