"""Deduplication family (SURVEY.md §2.7 D1/D2 + the training-data-pipeline
ops the task brief lists as first-class: exact, url-as-of, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup).

Every op is a ``Dataset -> Dataset`` transform built from vectorized
``map_batches`` + one key-partitioned ``groupby`` — the
hash-partition-then-pick-canonical pattern that scales: the only all-to-all
is on the (small) hash/band key, and per-batch work pre-reduces rows before
the shuffle where possible.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import hash_str_array, splitmix64
from .util import pool_size
from ..functions.tokenizer import tokenize


# ------------------------------------------------------------ D1 exact dedup

def add_content_hash(ds: "ray.data.Dataset", text_col: str = "text",
                     out_col: str = "content_hash") -> "ray.data.Dataset":
    """Vectorized md5-hex content hash column (matches DuckDB ``md5()``)."""

    def h(batch: pa.Table) -> pa.Table:
        vals = [hashlib.md5(t.encode("utf-8")).hexdigest()
                for t in batch[text_col].to_pylist()]
        return batch.append_column(out_col, pa.array(vals, pa.string()))

    return ds.map_batches(h, batch_format="pyarrow")


def exact_dedup(ds: "ray.data.Dataset", text_col: str = "text",
                id_col: str = "doc_id") -> "ray.data.Dataset":
    """Keep the min-``id_col`` row per identical ``text_col``.

    Per-batch pre-reduction (keep local min per hash) before the groupby
    bounds shuffle volume at #distinct-hashes per batch — the combiner
    pattern (ray_guide.md:154-164).
    """
    hashed = add_content_hash(ds, text_col)

    def local_min(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(id_col).drop_duplicates("content_hash", keep="first")

    pre = hashed.map_batches(local_min, batch_format="pandas")

    def pick(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(id_col).head(1)

    return (
        pre.groupby("content_hash")
        .map_groups(pick, batch_format="pandas")
        .drop_columns(["content_hash"])
    )


# ------------------------------------------------- F5 url dedup (as-of pick)

def url_dedup_latest(ds: "ray.data.Dataset", url_col: str = "url",
                     ts_col: str = "warc_ts") -> "ray.data.Dataset":
    """Duplicate urls across crawls -> keep the row with the latest
    ``warc_ts`` (deterministic as-of pick).

    Shape chosen for wide rows: the heavy side (with ``html``) NEVER
    shuffles.  A 2-column ``groupby(url).aggregate(Max(ts))`` (vectorized,
    no per-group Python — a per-url map_groups was measured 10x slower)
    finds the winning (url, ts) pairs; the winner set is broadcast once and
    the full rows stream through a vectorized semi-join filter
    (ray_guide.md:148-150).  At 10^12 urls the winner set outgrows a
    broadcast: swap the filter for a hash join on (url, ts) — the heavy
    side then shuffles once, which is unavoidable at that shape.
    """
    import ray as _ray

    # 2-column projection -> driver pandas groupby.max: the projection is
    # tiny next to the html payload and a distributed groupby's task
    # orchestration costs more than the aggregate itself at this width
    two = ds.select_columns([url_col, ts_col]).to_pandas()
    winners = (
        two.groupby(url_col, sort=False)[ts_col].max().reset_index()
        .rename(columns={ts_col: "max_ts"})
    )
    # composite key as url + epoch-micros string (identical derivation on
    # both sides; \x1f separator — numpy string paths silently drop \x00)
    micros = winners["max_ts"].astype("datetime64[us]").astype("int64").astype(str)
    key = winners[url_col] + "\x1f" + micros
    ref = _ray.put(pa.array(key.to_numpy(), pa.string()))

    def keep_latest(batch: pa.Table) -> pa.Table:
        keys = _ray.get(ref)
        ts_i64 = pc.cast(pc.cast(batch[ts_col], pa.timestamp("us")), pa.int64())
        bkey = pc.binary_join_element_wise(
            batch[url_col], pc.cast(ts_i64, pa.string()), "\x1f"
        )
        return batch.filter(pc.is_in(bkey, value_set=keys))

    return ds.map_batches(keep_latest, batch_format="pyarrow")


# --------------------------------------------------------- MinHash + LSH D2

MINHASH_PERMS = 128
LSH_BANDS = 32  # 32 bands x 4 rows


def _shingles(text: str, k: int = 5) -> list[str]:
    toks = tokenize(text)
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def minhash_signature(text: str, n_perms: int = MINHASH_PERMS,
                      shingle_k: int = 5) -> np.ndarray:
    """uint64[n_perms] minhash over word shingles; permutations are
    splitmix64 streams seeded by the permutation index (pure function of
    the text — no global state)."""
    sh = _shingles(text, shingle_k)
    if not sh:
        return np.full(n_perms, np.iinfo(np.uint64).max, dtype=np.uint64)
    base = hash_str_array(sh)  # (n_shingles,)
    perm_seeds = splitmix64(np.arange(1, n_perms + 1, dtype=np.uint64))
    # h_p(x) = splitmix64(x ^ seed_p); min over shingles, vectorized
    mat = splitmix64(base[None, :] ^ perm_seeds[:, None])
    return mat.min(axis=1)


class MinHashStage:
    """Actor-pool stage: text -> minhash signature (state = perm seeds)."""

    def __init__(self, text_col: str = "text", n_perms: int = MINHASH_PERMS,
                 shingle_k: int = 5):
        self.text_col = text_col
        self.n_perms = n_perms
        self.shingle_k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [
            minhash_signature(t, self.n_perms, self.shingle_k)
            for t in batch[self.text_col].to_pylist()
        ]
        arr = pa.array([s.astype(np.int64) for s in sigs], pa.list_(pa.int64()))
        return batch.append_column("minhash", arr)


def minhash_lsh_candidates(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = LSH_BANDS,
    n_perms: int = MINHASH_PERMS,
    shingle_k: int = 5,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """MinHash+LSH near-dup candidate pairs (id_a < id_b, band-deduped).

    shingle -> minhash (actor pool) -> explode to (band_id, band_hash)
    rows -> groupby band bucket -> pairs within bucket -> global pair
    dedup.  The only shuffles key on (band_id, band_hash) — skew-bounded
    because identical-band groups ARE the near-dup clusters.
    """
    sigs = ds.select_columns([id_col, text_col]).map_batches(
        MinHashStage,
        fn_constructor_kwargs={
            "text_col": text_col, "n_perms": n_perms, "shingle_k": shingle_k,
        },
        batch_format="pyarrow",
        concurrency=pool_size(concurrency),
    )
    rows_per_band = n_perms // bands

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        mh = np.array(batch["minhash"].to_pylist(), dtype=np.uint64)
        out_id, out_band, out_hash = [], [], []
        for b in range(bands):
            seg = mh[:, b * rows_per_band : (b + 1) * rows_per_band]
            # band hash = splitmix64-mix of the band's rows
            acc = np.zeros(len(ids), dtype=np.uint64)
            for c in range(rows_per_band):
                acc = splitmix64(acc ^ seg[:, c])
            out_id.append(ids)
            out_band.append(np.full(len(ids), b, dtype=np.int64))
            out_hash.append(acc.astype(np.int64))
        return pa.table(
            {
                id_col: np.concatenate(out_id),
                "band_id": np.concatenate(out_band),
                "band_hash": np.concatenate(out_hash),
            }
        )

    banded = sigs.map_batches(explode, batch_format="pyarrow")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(group[id_col].to_numpy())
        if ids.size < 2 or ids.size > 1000:  # skip degenerate mega-buckets
            return pd.DataFrame({"id_a": [], "id_b": []}).astype(np.int64)
        ia, ib = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    cand = banded.groupby(["band_id", "band_hash"]).map_groups(
        pairs, batch_format="pandas"
    )

    def pair_dedup(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    return cand.groupby(["id_a", "id_b"]).map_groups(pair_dedup, batch_format="pandas")


def verify_jaccard_pairs(
    pairs: "ray.data.Dataset",
    docs_by_id: dict[int, str],
    *,
    threshold: float = 0.8,
    shingle_k: int = 5,
) -> "ray.data.Dataset":
    """Verify candidate pairs by true shingle Jaccard; ``docs_by_id`` is
    broadcast via ray.put by callers (small candidate universes) — at scale
    replace with a join against the docs table on id_a/id_b.

    Stateless TASKS, not an actor pool: this stage usually sits downstream
    of the MinHash actor pool, and two pools would together reserve every
    CPU on a small cluster and deadlock the streaming executor
    (ray_guide.md:128-131).  Tasks are elastic; ``ray.get`` of the
    broadcast ref inside the task is an object-store read, not a re-ship.
    """
    import ray as _ray

    ref = docs_by_id if isinstance(docs_by_id, _ray.ObjectRef) else _ray.put(docs_by_id)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        docs = _ray.get(ref)
        sims = []
        for a, b in zip(batch["id_a"], batch["id_b"]):
            sa = set(_shingles(docs[int(a)], shingle_k))
            sb = set(_shingles(docs[int(b)], shingle_k))
            union = len(sa | sb)
            sims.append(len(sa & sb) / union if union else 0.0)
        batch = batch.copy()
        batch["jaccard"] = sims
        return batch[batch["jaccard"] >= threshold]

    return pairs.map_batches(verify, batch_format="pandas")


# ------------------------------------------------------------------ SimHash

def simhash64(text: str, shingle_k: int = 2) -> int:
    """64-bit SimHash over word 2-shingles (Charikar 2002 construction)."""
    sh = _shingles(text, shingle_k)
    if not sh:
        return 0
    hs = hash_str_array(sh)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    votes = bits.astype(np.int64).sum(axis=0) * 2 - len(sh)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def simhash_neardup_pairs(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """SimHash near-dup pairs with Hamming distance <= ``max_hamming``.

    Scale path: 4-way table split of the 64-bit hash (pigeonhole — any pair
    within Hamming 3 agrees exactly on >=1 of 4 16-bit chunks), groupby on
    (chunk_id, chunk_value), verify Hamming inside the bucket.
    """

    def add_sim(batch: pa.Table) -> pa.Table:
        vals = [simhash64(t) for t in batch[text_col].to_pylist()]
        return pa.table(
            {
                id_col: batch[id_col],
                "simhash": pa.array(np.array(vals, dtype=np.uint64).astype(np.int64)),
            }
        )

    sims = ds.select_columns([id_col, text_col]).map_batches(
        add_sim, batch_format="pyarrow", concurrency=pool_size(concurrency)
    )

    def explode_chunks(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        sh = batch["simhash"].to_numpy().astype(np.uint64)
        out = []
        for c in range(4):
            chunk = ((sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
            out.append(
                pa.table(
                    {
                        id_col: ids,
                        "simhash": sh.astype(np.int64),
                        "chunk_id": np.full(ids.size, c, dtype=np.int64),
                        "chunk_val": chunk,
                    }
                )
            )
        return pa.concat_tables(out)

    chunked = sims.map_batches(explode_chunks, batch_format="pyarrow")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col).drop_duplicates(id_col)
        ids = g[id_col].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        if ids.size < 2 or ids.size > 2000:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []}).astype(np.int64)
        ia, ib = np.triu_indices(ids.size, k=1)
        ham = np.array(
            [bin(int(hs[a] ^ hs[b])).count("1") for a, b in zip(ia, ib)],
            dtype=np.int64,
        )
        keep = ham <= max_hamming
        return pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "hamming": ham[keep]}
        )

    cand = chunked.groupby(["chunk_id", "chunk_val"]).map_groups(
        pairs, batch_format="pandas"
    )
    return cand.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# ------------------------------------------------ embedding-cosine near-dup

def embedding_neardup_pairs(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    round_to: Optional[int] = 6,
) -> "ray.data.Dataset":
    """All pairs with cosine >= threshold, id_a < id_b.

    Sandbox implementation broadcasts the (small) full matrix once via
    ray.put and block-multiplies per batch — O(N/blocks) matmuls, numpy
    float64.  Scale path: LSH-bucket the vectors (random hyperplanes) and
    run this same kernel within buckets.  ``round_to`` rounds the reported
    cosine so cross-engine comparisons (DuckDB oracle) are stable.
    """
    import ray as _ray

    mat_tbl = ds.select_columns([id_col, vec_col]).take_all()
    ids_all = np.array([r[id_col] for r in mat_tbl], dtype=np.int64)
    m = np.array([r[vec_col] for r in mat_tbl], dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    ref = _ray.put((ids_all, m, norms))

    class PairFinder:
        def __init__(self):
            self.ids, self.m, self.norms = _ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = batch[id_col].to_numpy()
            bv = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
            bn = np.linalg.norm(bv, axis=1)
            bn[bn == 0] = 1.0
            cos = (bv @ self.m.T) / bn[:, None] / self.norms[None, :]
            if round_to is not None:
                cos = np.round(cos, round_to)
            bi, gj = np.nonzero((cos >= threshold) & (bids[:, None] < self.ids[None, :]))
            return pa.table(
                {
                    "id_a": pa.array(bids[bi], pa.int64()),
                    "id_b": pa.array(self.ids[gj], pa.int64()),
                    "cosine": pa.array(cos[bi, gj], pa.float64()),
                }
            )

    return ds.select_columns([id_col, vec_col]).map_batches(
        PairFinder, batch_format="pyarrow", concurrency=pool_size(2)
    )


# -------------------------------------------------------- n-gram Jaccard

def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Exact n-gram Jaccard near-dup: LSH candidates at a permissive band
    setting, then exact shingle-set verification — the
    candidates-then-verify composition (ray_guide.md:165-169)."""
    cand = minhash_lsh_candidates(
        ds, text_col=text_col, id_col=id_col, shingle_k=shingle_k,
        concurrency=concurrency,
    )
    docs = {
        r[id_col]: r[text_col]
        for r in ds.select_columns([id_col, text_col]).take_all()
    }
    return verify_jaccard_pairs(cand, docs, threshold=threshold, shingle_k=shingle_k)
