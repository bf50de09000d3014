"""Round-4 curation ops: CCNet-style span dedup + PII redaction."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from defactonlp_ray.functions import pii
from defactonlp_ray.stages.dedup import span_dedup_stats


def _spans_table():
    # doc 0: a b a   (span 'a' repeats in-doc)
    # doc 1: b c     ('b' duplicates doc 0's)
    # doc 2: d       (unique)
    return pa.table(
        {
            "doc_id": pa.array([0, 0, 0, 1, 1, 2], pa.int64()),
            "sent_id": pa.array([0, 1, 2, 0, 1, 0], pa.int32()),
            "text": pa.array(["a", "b", "a", "b", "c", "d"]),
        }
    )


def test_span_dedup_stats_keep_first_semantics():
    out = (
        span_dedup_stats(ray.data.from_arrow(_spans_table()))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        {
            "doc_id": np.array([0, 1, 2], dtype=np.int64),
            "n_spans": np.array([3, 2, 1], dtype=np.int64),
            "n_dup": np.array([1, 1, 0], dtype=np.int64),
        }
    )
    pd.testing.assert_frame_equal(out, exp)


def test_span_dedup_stats_invariant_to_partitioning():
    t = _spans_table()
    outs = [
        span_dedup_stats(ray.data.from_arrow(t).repartition(p))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        for p in (1, 2, 6)
    ]
    for o in outs[1:]:
        pd.testing.assert_frame_equal(o, outs[0])


def test_span_dedup_all_docs_reported_even_if_zero_kept():
    # doc 5's only span is a duplicate of doc 4's -> n_kept 0, still a row
    t = pa.table(
        {
            "doc_id": pa.array([4, 5], pa.int64()),
            "sent_id": pa.array([0, 0], pa.int32()),
            "text": pa.array(["same", "same"]),
        }
    )
    out = (
        span_dedup_stats(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [4, 5]
    assert out["n_dup"].tolist() == [0, 1]


def test_pii_redact_batch_counts_and_tokens():
    texts = pa.array(
        [
            "mail me at a.b+c@test-site.org now",
            "call 555-1234 or 555-12345 or 444-1234",
            "clean text",
            "two mails x@y.io z@w.co and 555-0000",
        ]
    )
    r = pii.redact_batch(texts)
    assert r["n_emails"].to_pylist() == [1, 0, 0, 2]
    # '555-12345' fails the \b{4}\b rule only on the right side: RE2
    # still matches its first 4 digits? No — trailing digit kills \b.
    assert r["n_phones"].to_pylist() == [0, 1, 0, 1]
    clean = r["clean"].to_pylist()
    assert clean[0] == "mail me at <EMAIL> now"
    assert "<PHONE>" in clean[1] and "444-1234" in clean[1]
    assert clean[2] == "clean text"
    assert clean[3] == "two mails <EMAIL> <EMAIL> and <PHONE>"


# ------------------------------------------------------- sequence packing

from defactonlp_ray.stages.pack import pack_sequences


def _counts_table():
    # ctx=10: doc 0 (7 toks) [0,7) -> win 0; doc 1 (8) [7,15) -> wins 0-1;
    # doc 2 (0) empty at 15 -> 0 windows; doc 3 (25) [15,40) -> wins 1-3
    return pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "n_tokens": pa.array([7, 8, 0, 25], pa.int64()),
        }
    )


def test_pack_sequences_window_spans():
    out = (
        pack_sequences(ray.data.from_arrow(_counts_table()), 10)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["tok_start"].tolist() == [0, 7, 15, 15]
    assert out["win_first"].tolist() == [0, 0, 1, 1]
    assert out["win_last"].tolist() == [0, 1, 1, 3]
    assert out["n_windows"].tolist() == [1, 2, 0, 3]


def test_pack_sequences_partitioning_and_order_invariant():
    t = _counts_table()
    base = (
        pack_sequences(ray.data.from_arrow(t), 10)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # shuffled input rows force the sort path; repartitioned input
    # exercises multi-block prefix sums
    shuffled = t.take(pa.array([2, 0, 3, 1]))
    for ds in (
        ray.data.from_arrow(shuffled),
        ray.data.from_arrow(t).repartition(3),
        ray.data.from_arrow(shuffled).repartition(4),
    ):
        out = (
            pack_sequences(ds, 10)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, base)


def test_pack_sequences_rejects_bad_ctx():
    import pytest

    with pytest.raises(ValueError):
        pack_sequences(ray.data.from_arrow(_counts_table()), 0)


def test_pack_windows_stream_invariant(sf_dir):
    """Every context window except the last is exactly full: the
    concatenated token stream covers [0, total) and windows slice it."""
    from defactonlp_ray.pipelines.queries import _PACK_CTX, q_pack_windows

    out = q_pack_windows(sf_dir)
    assert (np.diff(out["window_id"].to_numpy()) == 1).all()
    toks = out["n_tokens"].to_numpy()
    assert (toks[:-1] == _PACK_CTX).all()
    assert 0 < toks[-1] <= _PACK_CTX
    assert (out["n_docs"].to_numpy() >= 1).all()


# ------------------------------------------------------------- winnowing

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(max_size=64), max_size=40))
def test_winnow_vectorized_equals_serial(strs):
    from defactonlp_ray.functions.hashing import winnow_column
    from defactonlp_ray.pipelines.pinned import serial_winnow

    n_fp, fp_xor = winnow_column(pa.array(strs, pa.string()))
    exp = [serial_winnow(t) for t in strs]
    assert n_fp.tolist() == [e[0] for e in exp]
    assert fp_xor.tolist() == [e[1] for e in exp]


def _winnow_hash_set(text, k=8, w=4, base=257, mod=(1 << 61) - 1):
    """Test-local serial winnowing that keeps the selected HASHES (the
    pinned serial_winnow only returns (count, xor)) so the guarantee
    can be asserted on actual fingerprint overlap."""
    data = text.encode("utf-8")
    hs = []
    for i in range(len(data) - k + 1):
        h = 0
        for b in data[i : i + k]:
            h = (h * base + b) % mod
        hs.append(h)
    sel, last = set(), -1
    for i in range(len(hs) - w + 1):
        win = hs[i : i + w]
        j = i + (w - 1 - win[::-1].index(min(win)))
        if j != last:
            sel.add(hs[j])
            last = j
    return sel


def test_winnow_shift_tolerance():
    """The winnowing guarantee (Schleimer 2003 thm. 1): any shared
    substring longer than the guarantee threshold t = k + w - 1 yields
    at least one SHARED fingerprint, regardless of where it sits."""
    from defactonlp_ray.functions.hashing import winnow_column
    from defactonlp_ray.pipelines.pinned import serial_winnow

    core = "the quick brown fox jumps over the lazy dog again and again"
    a = "PREFIX-AAA " + core
    b = "completely different lead-in text here: " + core
    na, _xa = winnow_column(pa.array([a, b]))
    assert na[0] > 0 and na[1] > 0
    # the actual guarantee: the two docs share core fingerprints
    shared = _winnow_hash_set(a) & _winnow_hash_set(b)
    assert shared, "no shared fingerprint from a 60-byte common core"
    # and the vectorized counts agree with the pinned serial form
    assert serial_winnow(a)[0] == na[0] and serial_winnow(b)[0] == na[1]


def test_c4_filters_counts_consistent(sf_dir):
    from defactonlp_ray.pipelines.queries import q_c4_filters

    out = q_c4_filters(sf_dir)
    row = out.iloc[0]
    assert row["n_docs"] > 0
    for c in ("drop_minwords", "drop_endpunct", "drop_brace",
              "drop_lorem", "drop_js"):
        assert 0 <= row[c] <= row["n_docs"]
    # kept passes ALL rules, so it can't exceed n_docs minus any one rule
    assert row["n_kept"] <= row["n_docs"] - row["drop_endpunct"]


def test_quality_prune_keeps_at_least_half(sf_dir):
    import os

    import pyarrow.parquet as pq

    from defactonlp_ray.pipelines.queries import q_quality_prune

    out = q_quality_prune(sf_dir)
    total = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")
    ).num_rows
    survivors = int(out["n"].sum())
    # lower-median threshold keeps the upper half (inclusive)
    assert total // 2 <= survivors <= total


def test_logreg_parallelism_invariant():
    """The quantized-gradient spec: identical weights at any block
    layout (1 block vs many)."""
    import pyarrow as pa
    import ray.data

    from defactonlp_ray import fixtures
    from defactonlp_ray.stages import logreg

    pages = fixtures.make_pages(300)
    langs = [["en", "de", "fr"][i % 3] for i in range(300)]
    tbl = pa.table({
        "doc_id": pa.array(range(300), pa.int64()),
        "lang": pa.array(langs),
        "text": pages["text"],
    })
    feats = ray.data.from_arrow(tbl).map_batches(
        logreg.featurize_batch, batch_format="pyarrow"
    )
    w1, s1 = logreg.fit(feats)
    w2, s2 = logreg.fit(feats.repartition(13))
    assert (w1 == w2).all()
    assert s1.equals(s2)
    # serial whole-matrix route gives the same weights (the spec is ONE)
    import numpy as np

    from defactonlp_ray.functions.tokenizer import tokenize
    from defactonlp_ray.stages.logreg import (
        _GSCALE, LR, N_ITER, doc_features, grad_partial_q,
    )

    X = np.asarray(
        [doc_features(tokenize(s)) for s in pages["text"].to_pylist()],
        np.float64,
    )
    y = np.asarray([l == "en" for l in langs], np.float64)
    w = np.zeros(X.shape[1])
    for _ in range(N_ITER):
        w = w - LR * (grad_partial_q(X, y, w).astype(np.float64) / _GSCALE) / len(y)
    assert (w == w1).all()
