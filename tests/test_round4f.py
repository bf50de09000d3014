"""Property tests for the round-4 second-continuation operators:
range join vs a brute-force reference, theta-sketch error bounds, and
WordPiece greedy-reference equality under random vocabularies."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def test_range_join_bucket_replication_equals_bruteforce():
    """The bucket-replicated interval join must equal the quadratic
    reference for random event streams, at several bucket widths
    (window straddling many or few buckets must not change results)."""
    rng = np.random.default_rng(11)
    n = 400
    ts = np.sort(rng.integers(0, 50_000, size=n)).astype(np.int64)
    uid = rng.integers(0, 7, size=n).astype(np.int64)
    typ = np.where(rng.random(n) < 0.3, "error", "click")
    window = 3_000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": uid, "t": ts, "event_type": typ,
    })
    err = df[df.event_type == "error"]
    clk = df[df.event_type == "click"]
    want = {}
    for _, e in err.iterrows():
        m = (
            (clk.user_id == e.user_id)
            & (clk.t >= e.t) & (clk.t < e.t + window)
        )
        want[int(e.event_id)] = int(m.sum())

    for bucket in (500, 3_000, 10_000):
        werr = err.copy()
        b0 = werr.t // bucket
        b1 = (werr.t + window - 1) // bucket
        rows = []
        for (_, e), lo, hi in zip(werr.iterrows(), b0, b1):
            for b in range(int(lo), int(hi) + 1):
                rows.append((e.user_id, b, e.event_id, e.t))
        wexp = pd.DataFrame(
            rows, columns=["user_id", "bucket", "err_id", "err_ts"]
        )
        cb = clk.copy()
        cb["bucket"] = cb.t // bucket
        j = wexp.merge(
            cb[["user_id", "bucket", "t"]], on=["user_id", "bucket"]
        )
        j = j[(j.t >= j.err_ts) & (j.t < j.err_ts + window)]
        got = j.groupby("err_id").size().to_dict()
        full = {
            int(e): int(got.get(e, 0)) for e in err.event_id
        }
        assert full == want, bucket


def test_theta_sketch_estimates_within_bounds():
    """KMV (k-1)/theta estimates of random set sizes stay within the
    ~4/sqrt(k) relative-error envelope, and exact-mode small sets are
    exact."""
    rng = np.random.default_rng(5)
    k = 128
    space = float(16 ** 15)

    def sketch(ids):
        hs = sorted(
            int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
            for i in ids
        )
        return hs[:k]

    def est(hs):
        if len(hs) < k:
            return float(len(hs))
        return (k - 1) / (hs[k - 1] / space)

    small = rng.choice(100_000, size=50, replace=False)
    assert est(sketch(small)) == 50.0
    for size in (1_000, 10_000):
        ids = rng.choice(10_000_000, size=size, replace=False)
        e = est(sketch(ids))
        assert abs(e - size) / size < 4.0 / np.sqrt(k), (size, e)


def test_wordpiece_greedy_matches_reference():
    """The entry's greedy loop (3->2->1 prefix attempts) must equal an
    independent longest-match-first reference for random words over
    random vocabularies that always include the single chars."""
    rng = np.random.default_rng(3)
    for _ in range(30):
        chars = list("abcdef")
        grams = {
            "".join(rng.choice(chars, size=int(rng.integers(2, 4))))
            for _ in range(20)
        }
        vocab = set(chars) | grams
        word = "".join(rng.choice(chars, size=int(rng.integers(1, 12))))

        # entry's loop
        pos, got = 0, []
        while pos < len(word):
            for ln in (3, 2, 1):
                cand = word[pos:pos + ln]
                if cand and cand in vocab:
                    got.append(cand)
                    pos += len(cand)
                    break

        # reference: true longest-match-first with max piece length 3
        pos, want = 0, []
        while pos < len(word):
            for ln in (3, 2, 1):
                cand = word[pos:pos + ln]
                if len(cand) == ln and cand in vocab:
                    want.append(cand)
                    pos += ln
                    break
            else:
                # only truncated candidates remain (word tail shorter
                # than ln) — fall back to the longest in-vocab tail
                for ln in (2, 1):
                    cand = word[pos:pos + ln]
                    if cand and cand in vocab:
                        want.append(cand)
                        pos += len(cand)
                        break
        assert got == want, (word, sorted(vocab))


def test_front_coding_roundtrip_decodes_exactly():
    """Decoding the (lcp, suffix) stream block by block must rebuild
    the exact sorted vocabulary for random word lists."""
    rng = np.random.default_rng(9)
    chars = list("abcdxyz")
    for _ in range(15):
        vocab = sorted({
            "".join(rng.choice(chars, size=int(rng.integers(1, 10))))
            for _ in range(int(rng.integers(2, 60)))
        })
        block = 8
        coded = []
        prev = None
        for i, t in enumerate(vocab):
            if i % block == 0:
                coded.append((0, t))
            else:
                lcp = 0
                for a, b in zip(t, prev):
                    if a != b:
                        break
                    lcp += 1
                coded.append((lcp, t[lcp:]))
            prev = t
        # decode
        out = []
        for i, (lcp, suf) in enumerate(coded):
            if i % block == 0:
                out.append(suf)
            else:
                out.append(out[-1][:lcp] + suf)
        assert out == vocab
