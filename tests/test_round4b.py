"""Round-4 continuation tests: analytics-aggregation entries
(events_funnel window boundaries, events_retention cohort stamping,
matrix_stats closed form vs numpy)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from defactonlp_ray.pipelines import queries as Q


def _write_events(tmp_path, rows):
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([pd.Timestamp(r[1]) for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    return str(tmp_path)


def test_funnel_window_boundaries(tmp_path):
    """A click strictly after the first view and within (<=) 7 days
    converts; at exactly t1 it does not (strict >); past 7 days it does
    not.  The purchase window anchors on the CLICK, not the view."""
    sf = _write_events(tmp_path, [
        # u1: full conversion, click exactly at the +7d boundary (counts)
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-08 00:00:00", "click"),
        (1, "2024-01-09 00:00:00", "purchase"),
        # u2: click at the same microsecond as the view -> NOT after it
        (2, "2024-01-01 00:00:00", "view"),
        (2, "2024-01-01 00:00:00", "click"),
        # u3: click past the window
        (3, "2024-01-01 00:00:00", "view"),
        (3, "2024-01-08 00:00:00.000001", "click"),
        # u4: purchase within 7d of the view but >7d after the click? no —
        # anchored on click: click +1us, purchase at click+7d (counts)
        (4, "2024-01-01 00:00:00", "view"),
        (4, "2024-01-01 00:00:00.000001", "click"),
        (4, "2024-01-08 00:00:00.000001", "purchase"),
        # u5: purchase BEFORE the click never converts step 3
        (5, "2024-01-01 00:00:00", "view"),
        (5, "2024-01-02 00:00:00", "purchase"),
        (5, "2024-01-03 00:00:00", "click"),
    ])
    out = Q.q_events_funnel(sf).set_index("step")["n_users"]
    assert out[1] == 5            # every user viewed
    assert out[2] == 3            # u1 (boundary), u4, u5
    assert out[3] == 2            # u1, u4 (u5's purchase precedes its click)


def test_retention_cohorts_stamp_from_first_week(tmp_path):
    """week 0 anchors at the corpus-min day; a user's cohort is their
    own first active week and offsets are relative to it."""
    sf = _write_events(tmp_path, [
        (1, "2024-01-01 12:00:00", "view"),   # week 0 cohort
        (1, "2024-01-09 12:00:00", "view"),   # week 1 active
        (2, "2024-01-10 00:00:00", "view"),   # week 1 cohort
        (2, "2024-01-22 00:00:00", "view"),   # week 3 -> offset 2
    ])
    out = Q.q_events_retention(sf).to_pandas()
    got = {
        (int(r.cohort_week), int(r.week_offset)): int(r.n_users)
        for r in out.itertuples()
    }
    assert got == {(0, 0): 1, (0, 1): 1, (1, 0): 1, (1, 2): 1}


def test_matrix_stats_matches_numpy():
    """The exact-integer-sufficient-statistics closed form equals
    numpy's population covariance/correlation on the real table."""
    sf = "/root/testdata/sf0.001"
    out = Q.q_matrix_stats(sf)
    docs = pq.read_table(
        os.path.join(sf, "documents.parquet"), columns=["n_chars", "text"]
    )
    x = docs["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
    y = np.array([
        len([w for w in t.split(" ") if w])
        for t in docs["text"].to_pylist()
    ], dtype=np.float64)
    xy = out.set_index(["field_a", "field_b"]).loc[("n_chars", "n_tokens")]
    assert xy["n"] == len(x)
    np.testing.assert_allclose(xy["covariance"], np.cov(x, y, bias=True)[0, 1], atol=1e-4)
    np.testing.assert_allclose(xy["correlation"], np.corrcoef(x, y)[0, 1], atol=1e-6)


def test_feature_map_defaults_and_lookup(tmp_path):
    """FeatureMap resolves present ids to their floats and absent ids to
    the default (ES rank_feature missing-field semantics)."""
    import ray.data
    from defactonlp_ray.stages.features import build_feature_map, FeatureMap

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 5, (1 << 20) + 3], pa.int64()),
        "feature": pa.array([0.5, 2.0, 7.25], pa.float64()),
    }))
    root = build_feature_map(ds, str(tmp_path / "feat"))
    fm = FeatureMap(root)
    got = fm[np.array([5, 2, (1 << 20) + 3, 1, 10**9])]
    np.testing.assert_array_equal(got, [2.0, 0.0, 7.25, 0.5, 0.0])


def test_rank_feature_reorders_vs_plain_bm25():
    """The saturation bonus must fold in before top-k: results differ
    from plain BM25 and equal the brute-force score + bonus re-rank."""
    sf = "/root/testdata/sf0.001"
    out = Q.q_rank_feature_topk(sf)
    plain = Q.q_bm25_topk(sf)
    assert not out[["query_id", "rank", "doc_id"]].equals(
        plain[["query_id", "rank", "doc_id"]]
    ) or not np.allclose(out["score"], plain["score"])


def test_query_string_parser():
    import pytest
    from defactonlp_ray.stages.querystring import parse_query_string

    p = parse_query_string('+hash -slow "table scan" fast +join')
    assert p["must"] == ["hash", "join"]
    assert p["must_not"] == ["slow"]
    assert p["should"] == ["fast"]
    assert p["phrases"] == [["table", "scan"]]
    assert parse_query_string('""') == {
        "must": [], "should": [], "must_not": [], "phrases": [],
    }
    # '+"..."' is a must phrase, like the bare quoted form
    assert parse_query_string('+"a b"')["phrases"] == [["a", "b"]]
    with pytest.raises(ValueError):
        parse_query_string('-"a b"')


def test_query_string_equals_boolean_when_no_phrase(pos_index_r4b=None):
    """A phrase-free query string ranks exactly like the boolean
    operator with the same clauses (shared scoring contract)."""
    import os
    import ray.data
    from defactonlp_ray.stages.index_build import build_index
    from defactonlp_ray.stages.querystring import (
        parse_query_string, score_query_string,
    )
    from defactonlp_ray.stages.phrase import score_boolean
    from defactonlp_ray.stages.search import IndexReader
    import tempfile

    sf = "/root/testdata/sf0.001"
    idx = os.path.join(tempfile.gettempdir(), "dfr_test_qs_idx")
    docs = ray.data.read_parquet(
        os.path.join(sf, "documents.parquet"), columns=["doc_id", "text"]
    )
    build_index(docs, idx, seg_docs=16, resume=True)
    reader = IndexReader(idx)
    p = parse_query_string("+hash +join -slow fast")
    got = score_query_string(reader, reader.seg_ids, p, 10)
    ref = score_boolean(
        reader, reader.seg_ids, p["must"], p["should"], p["must_not"], 10
    )
    assert got == ref


def test_restore_snapshot_resume_and_equality(tmp_path):
    """restore_snapshot reproduces the pinned view as a standalone index
    (same results as search(at=v)); a crash mid-restore (missing segment
    dir, no marker) re-links idempotently."""
    import shutil
    import ray.data
    from defactonlp_ray import fixtures
    from defactonlp_ray.sources import manifest as mf
    from defactonlp_ray.stages.index_build import (
        append_index, build_index, restore_snapshot,
    )
    from defactonlp_ray.stages.search import search

    pages = fixtures.make_pages(600)
    t = pa.table({
        "doc_id": pa.array(range(600), pa.int64()),
        "text": pages["text"],
    })
    src = str(tmp_path / "src")
    build_index(
        ray.data.from_arrow(t.slice(0, 300)), src, seg_docs=64
    )
    v = mf.manifest_version(src)
    append_index(ray.data.from_arrow(t.slice(300)), src, seg_docs=64)

    queries = fixtures.make_query_terms(4)
    qds = pa.table({
        "query_id": pa.array([q for q, _ in queries], pa.int64()),
        "terms": pa.array([ts for _, ts in queries], pa.list_(pa.string())),
    })

    dst = str(tmp_path / "dst")
    restore_snapshot(src, v, dst)
    got = search(dst, ray.data.from_arrow(qds), k=10).to_pandas()
    want = search(src, ray.data.from_arrow(qds), k=10, at=v).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values(["query_id", "rank"]).reset_index(drop=True),
        want.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )
    # full corpus (no pin) must DIFFER — the restore really is the old view
    full = search(src, ray.data.from_arrow(qds), k=10).to_pandas()
    assert not got.equals(full)

    # crash simulation: drop marker + one restored segment, re-run
    import os as _os
    _os.remove(_os.path.join(dst, "_RESTORED"))
    segroot = _os.path.join(dst, "segments")
    segs = sorted(d for d in _os.listdir(segroot) if d.startswith("seg="))
    shutil.rmtree(_os.path.join(segroot, segs[0]))
    restore_snapshot(src, v, dst)
    got2 = search(dst, ray.data.from_arrow(qds), k=10).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values(["query_id", "rank"]).reset_index(drop=True),
        got2.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )
