"""Per-segment Bloom filters for term-existence pruning (the Lucene
``BloomFilteringPostingsFormat`` / Elasticsearch ``_id`` bloom idea,
applied at the segment-routing layer).

Each live segment gets a bitset sidecar under ``stats/bloom/``: every
postings term double-hashes (Kirsch–Mitzenmacher: ``g_i = h1 + i*h2
mod m``, both halves from the repo's pinned FNV-1a→splitmix64 kernel)
into ``m ≈ bits_per_term × n_terms`` bits.  A serving actor then probes
the bloom BEFORE the filtered point-read: a "no" is certain (no false
negatives by construction), so segments that cannot contain a query term
skip the parquet read entirely — the win is per-term × per-segment
point-read elimination for rare/absent terms, the common case for
long-tail web queries over doc-range-partitioned segments.

Correctness under index mutation comes free from segment IMMUTABILITY:
append/compact/expunge mint fresh sids (never rewrite a live segment's
postings), so a bloom, once built for its sid, can never go stale; a
segment WITHOUT a bloom (e.g. freshly appended, sidecar not rebuilt)
degrades to "maybe present" — the unpruned read, never a wrong answer.
Deletes don't affect term existence and apply downstream as usual.

At 100 TB the sidecars build as one map over the segment list (a Ray
Data pass over ~n_segments rows, each task reading ONE postings file's
term column) and serve from actor-local caches (~bits_per_term/8 bytes
per term — 10 bits/term ≈ 1.2 MB per million-term segment).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..functions.hashing import hash_str_array, splitmix64
from ..sources import manifest as mf
from .search import IndexReader
from .util import pool_size

__all__ = [
    "BLOOM_VERSION",
    "build_term_blooms",
    "bloom_maybe",
    "BloomCountActor",
    "bloom_count_search",
]

BLOOM_VERSION = "bloom-v1"
_SALT = np.uint64(0xA076_1D64_78BD_642F)  # h2 = splitmix64(h1 ^ SALT)


def _bloom_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "stats", "bloom")


def _bloom_path(index_dir: str, sid: int) -> str:
    return os.path.join(_bloom_dir(index_dir), f"seg={sid:06d}.npz")


def _hash_pair(terms) -> tuple[np.ndarray, np.ndarray]:
    h1 = hash_str_array(terms)
    h2 = splitmix64(h1 ^ _SALT) | np.uint64(1)  # odd: full-period stride
    return h1, h2


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m)).astype(np.int64)


def build_term_blooms(
    index_dir: str, *, bits_per_term: int = 10, n_hashes: int = 7,
) -> int:
    """Build (or top up) the per-segment bloom sidecars for every live
    segment missing one.  Idempotent; returns the number built.  Runs
    the per-segment work as Ray tasks (one postings term-column read
    each)."""
    os.makedirs(_bloom_dir(index_dir), exist_ok=True)
    recs = mf.read_manifest(index_dir)
    todo = [
        sid for sid in mf.live_segment_order(recs)
        if not os.path.exists(_bloom_path(index_dir, sid))
    ]
    if not todo:
        return 0

    @ray.remote
    def _one(sid: int) -> int:
        terms = pq.read_table(
            os.path.join(mf.segment_dir(index_dir, sid), "postings.parquet"),
            columns=["term"],
        )["term"]
        n_terms = max(1, len(terms))
        m = int(bits_per_term) * n_terms
        m += (-m) % 64  # round up to whole uint64 words
        bits = np.zeros(m // 64, dtype=np.uint64)
        if len(terms):
            pos = _positions(*_hash_pair(terms), n_hashes, m).ravel()
            np.bitwise_or.at(
                bits, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64)
            )
        path = _bloom_path(index_dir, sid)
        tmp = path + ".tmp.npz"
        with open(tmp, "wb") as f:
            np.savez(f, bits=bits, meta=np.array([m, n_hashes], np.int64))
        os.replace(tmp, path)
        return sid

    ray.get([_one.remote(sid) for sid in todo])
    meta = os.path.join(_bloom_dir(index_dir), "meta.json")
    with open(meta + ".tmp", "w") as f:
        json.dump({"version": BLOOM_VERSION,
                   "bits_per_term": bits_per_term,
                   "n_hashes": n_hashes}, f)
    os.replace(meta + ".tmp", meta)
    return len(todo)


def bloom_maybe(
    index_dir: str, sid: int, terms, cache: dict | None = None
) -> np.ndarray:
    """Boolean mask per term: False = CERTAIN the segment lacks the
    term; True = maybe present (including when no bloom sidecar
    exists)."""
    terms = list(terms)
    blm = None
    if cache is not None and sid in cache:
        blm = cache[sid]
    else:
        path = _bloom_path(index_dir, sid)
        if os.path.exists(path):
            z = np.load(path)
            blm = (z["bits"], int(z["meta"][0]), int(z["meta"][1]))
        if cache is not None:
            cache[sid] = blm
    if blm is None or not terms:
        return np.ones(len(terms), dtype=bool)
    bits, m, k = blm
    pos = _positions(*_hash_pair(terms), k, m)
    probed = (bits[pos // 64] >> (pos % 64).astype(np.uint64)) & np.uint64(1)
    return probed.astype(bool).all(axis=1)


class BloomCountActor:
    """Total-hit counting with bloom-pruned segment reads: per segment,
    only terms whose bloom says "maybe" are point-read; a bloom "no"
    skips the parquet read for that (segment, term) entirely.  Results
    are bit-identical to mode='count' (no false negatives).  The actor
    counts skipped probes in ``self.skipped`` (test evidence)."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.reader = IndexReader(index_dir)
        self.seg_ids = self.reader.seg_ids
        self._blooms: dict = {}
        self.skipped = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .deletes import live_mask

        all_terms = sorted({t for ts in batch["terms"].to_pylist() for t in ts})
        for sid in self.seg_ids:
            maybe = bloom_maybe(
                self.index_dir, sid, all_terms, cache=self._blooms
            )
            self.skipped += int((~maybe).sum())
            load = [t for t, ok in zip(all_terms, maybe) if ok]
            self.reader.load_postings(sid, load)
            for t, ok in zip(all_terms, maybe):
                if not ok:  # certain-absent: cache as absent, no read
                    self.reader._postings.setdefault((sid, t), None)
        out_q, out_n = [], []
        for qid, terms in zip(
            batch["query_id"].to_pylist(), batch["terms"].to_pylist()
        ):
            parts = [
                arrs[0]
                for t in sorted(set(terms))
                if (arrs := self.reader.term_arrays(self.seg_ids, t))
                is not None
            ]
            if not parts:
                continue
            hits = np.unique(np.concatenate(parts))
            if self.reader.deleted.size:
                hits = hits[live_mask(hits, self.reader.deleted)]
            if hits.size:
                out_q.append(qid)
                out_n.append(int(hits.size))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "n_hits": pa.array(out_n, pa.int64()),
            }
        )


def bloom_count_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    concurrency: int = 4,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """Bloom-pruned total-hit counting pipeline: (query_id, terms) ->
    (query_id, n_hits); build the sidecars first with
    :func:`build_term_blooms` (missing sidecars degrade gracefully)."""
    return queries.map_batches(
        BloomCountActor,
        fn_constructor_kwargs={"index_dir": index_dir},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


# ------------------------------------------------ generic int-key blooms

def int_bloom_build(
    keys: np.ndarray, *, bits_per_key: int = 10, n_hashes: int = 7
) -> tuple[np.ndarray, int]:
    """Bitset bloom over int64 keys (h1 = splitmix64(key), h2 =
    splitmix64(h1 ^ SALT), Kirsch-Mitzenmacher probes) — the broadcast
    side of a bloom-filtered join.  Returns (packed uint8 bits, m)."""
    keys = np.asarray(keys, dtype=np.int64)
    m = max(64, bits_per_key * max(1, keys.size))
    h1 = splitmix64(keys.astype(np.uint64))
    h2 = splitmix64(h1 ^ _SALT)
    pos = _positions(h1, h2, n_hashes, m)
    bits = np.zeros((m + 7) // 8, dtype=np.uint8)
    flat = pos.ravel()
    np.bitwise_or.at(bits, flat >> 3, (1 << (flat & 7)).astype(np.uint8))
    return bits, m


def int_bloom_maybe(
    keys: np.ndarray, bits: np.ndarray, m: int, *, n_hashes: int = 7
) -> np.ndarray:
    """Vectorized membership probe: True = maybe present (false
    positives possible), False = certainly absent."""
    keys = np.asarray(keys, dtype=np.int64)
    if keys.size == 0:
        return np.zeros(0, dtype=bool)
    h1 = splitmix64(keys.astype(np.uint64))
    h2 = splitmix64(h1 ^ _SALT)
    pos = _positions(h1, h2, n_hashes, m)
    probe = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return probe.all(axis=1)
