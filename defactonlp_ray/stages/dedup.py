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
import logging
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import hash_str_array, splitmix64
from .util import arrow_project, cut_lineage as _cut_lineage, ensure_arrow
from .util import pool_size
from ..functions.tokenizer import tokenize

_log = logging.getLogger(__name__)


# ------------------------------------------------------------ D1 exact dedup

def add_content_hash(ds: "ray.data.Dataset", text_col: str = "text",
                     out_col: str = "content_hash") -> "ray.data.Dataset":
    """Vectorized md5-hex content hash column (matches DuckDB ``md5()``)."""

    def h(batch: pa.Table) -> pa.Table:
        vals = [hashlib.md5(t.encode("utf-8")).hexdigest()
                for t in batch[text_col].to_pylist()]
        return batch.append_column(out_col, pa.array(vals, pa.string()))

    return ds.map_batches(h, batch_format="pyarrow")


# above this many surviving rows the winner id set no longer belongs in
# one broadcast object: re-attach through the distributed hash join
BROADCAST_WINNER_LIMIT = 5_000_000

# bump to invalidate cached cluster artifacts (pipelines/queries.py
# _neardup_clusters_cached) when shingle/minhash/CC semantics change
DEDUP_VERSION = "dedup-v4"


def exact_dedup(ds: "ray.data.Dataset", text_col: str = "text",
                id_col: str = "doc_id", route: str = "auto") -> "ray.data.Dataset":
    """Keep the min-``id_col`` row per identical ``text_col``.

    Per-batch pre-reduction (keep local min per hash) before the keyed
    aggregate bounds shuffle volume at #distinct-hashes per batch — the
    combiner pattern (ray_guide.md:154-164).  The global pick is a
    VECTORIZED ``aggregate(Min)`` over the tiny (hash, id) projection —
    never a per-group Python call, which would mean one call per
    distinct document at corpus scale.  Winners (unique ids) re-attach
    via a broadcast ``is_in`` filter while the id set fits one
    object-store object, else a left_semi hash join (``route`` mirrors
    url_dedup_latest; both pytest-asserted equal).
    """
    import ray as _ray
    from ray.data.aggregate import Min

    hashed = add_content_hash(ds, text_col)

    def local_min(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(id_col).drop_duplicates("content_hash", keep="first")

    pre = hashed.map_batches(local_min, batch_format="pandas").materialize()
    winners = arrow_project(
        pre.select_columns(["content_hash", id_col])
        .groupby("content_hash")
        .aggregate(Min(id_col, alias_name=id_col)),
        [id_col],
    )
    if route == "auto":
        route = "broadcast" if pre.count() <= BROADCAST_WINNER_LIMIT else "join"
    if route == "join":
        n_cpu = int(_ray.cluster_resources().get("CPU", 4))
        return pre.join(
            winners, "left_semi",
            num_partitions=max(2, min(16, n_cpu // 2)),
            on=(id_col,),
        ).drop_columns(["content_hash"])
    # id dtype follows the column (int doc ids or string urls)
    ref = _ray.put(pa.array(winners.to_pandas()[id_col]))

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch[id_col], value_set=_ray.get(ref)))

    return pre.map_batches(keep, batch_format="pyarrow").drop_columns(
        ["content_hash"]
    )


# ----------------------------------------- CCNet-style sub-document dedup

# sent_id packs into the low bits of one int64 key: doc_id * 2^20 + sent_id.
# Documented partitioning assumption: < 2^20 spans per document (a 1M-
# sentence single document would need a wider pack, not a new algorithm).
_SPAN_SHIFT = 20


def span_dedup_stats(
    sents: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    ord_col: str = "sent_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """CCNet-shaped sub-document exact dedup (Wenzek et al. 2020 dedup
    paragraphs corpus-wide; here over whatever span rows the caller
    exploded — sentences, paragraphs, token windows).  First occurrence
    by (doc_id, ord) keeps; every later identical span is a duplicate.
    Returns per-document stats (id, n_spans, n_dup).

    Scale shape: the ONE text-keyed all-to-all runs over a (text, key)
    projection pre-reduced per batch (local min-key per span text), so
    shuffle volume is bounded by distinct-spans-per-batch; the per-doc
    tallies ride Sum-aggregates over packed int64 partials — exact and
    order-free at any parallelism."""
    from ray.data.aggregate import Min, Sum

    def pack(batch: pa.Table) -> pa.Table:
        key = pc.add(
            pc.shift_left(batch[id_col], _SPAN_SHIFT),
            pc.cast(batch[ord_col], pa.int64()),
        )
        return pa.table({text_col: batch[text_col], "span_key": key})

    packed = sents.map_batches(pack, batch_format="pyarrow")

    def local_min(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values("span_key").drop_duplicates(text_col, keep="first")
        return pa.Table.from_pandas(df, preserve_index=False)

    kept_keys = (
        packed.map_batches(local_min, batch_format="pyarrow")
        .groupby(text_col)
        .aggregate(Min("span_key", alias_name="span_key"))
    )

    # Union of two partial-count streams (every span counts into n_spans;
    # kept spans also count into n_kept) -> ONE Sum groupby.  This avoids a
    # doc_id join whose right side may be empty/heterogeneous under high
    # parallelism, and every doc always has n_spans rows so zero-kept docs
    # still appear.
    def doc_partials(kept: bool):
        def count(batch: pa.Table, _k=kept) -> pa.Table:
            doc = pc.shift_right(batch["span_key"], _SPAN_SHIFT)
            t = pa.table({id_col: doc}).group_by(id_col).aggregate(
                [([], "count_all")]
            )
            n = pc.cast(t["count_all"], pa.int64())
            zero = pa.array([0] * len(t), pa.int64())
            return pa.table(
                {
                    id_col: t[id_col],
                    "n_spans": zero if _k else n,
                    "n_kept": n if _k else zero,
                }
            )

        return count

    span_partials = packed.select_columns(["span_key"]).map_batches(
        doc_partials(kept=False), batch_format="pyarrow"
    )
    kept_partials = kept_keys.select_columns(["span_key"]).map_batches(
        doc_partials(kept=True), batch_format="pyarrow"
    )
    totals = (
        span_partials.union(kept_partials)
        .groupby(id_col)
        .aggregate(
            Sum("n_spans", alias_name="n_spans"),
            Sum("n_kept", alias_name="n_kept"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[id_col],
                "n_spans": batch["n_spans"],
                "n_dup": pc.subtract(batch["n_spans"], batch["n_kept"]),
            }
        )

    return totals.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------- F5 url dedup (as-of pick)

# above this many input rows the winner keyset no longer belongs in one
# broadcast object / on the driver: use the distributed hash join instead
BROADCAST_URL_LIMIT = 5_000_000


def _md5_digest_array(vals: list) -> pa.Array:
    return pa.array(
        [
            hashlib.md5(t.encode("utf-8") if isinstance(t, str) else bytes(t)).hexdigest()
            for t in vals
        ],
        pa.string(),
    )


def url_dedup_latest(
    ds: "ray.data.Dataset", url_col: str = "url", ts_col: str = "warc_ts",
    tiebreak_col: Optional[str] = "text", route: str = "auto",
) -> "ray.data.Dataset":
    """Duplicate urls across crawls -> keep exactly ONE row per url: the
    latest ``warc_ts``, ties broken by MAX md5 digest of ``tiebreak_col``
    (deterministic single pick even when a url is crawled twice in the
    same microsecond).

    Winner selection is shared: per-batch combiner (local winner per url
    by (ts, digest) — bounds shuffle volume at #distinct-urls per batch,
    ray_guide.md:154-158), then ``groupby(url).map_groups`` over the tiny
    (url, micros, digest) projection picks the global winner.

    Two physical routes for re-attaching winners to the full rows, with
    identical output (pytest-asserted equal):

    * ``broadcast`` — winner keyset ``ray.put`` once, full rows stream
      through a vectorized semi-join filter; the heavy side NEVER
      shuffles.  Right while the distinct-url keyset fits one
      object-store object.
    * ``join`` — distributed hash join of the full rows against the
      winner table on (url, micros, digest): no driver-side winner
      materialization, the at-10^12-urls shape; the heavy side shuffles
      once, which is unavoidable there.  ``auto`` picks by row count.

    Byte-identical rows (same url, ts AND tiebreak content) are
    indistinguishable and all survive on BOTH routes; exact content
    dedup (D1) downstream collapses them.
    """
    import ray as _ray

    if route == "auto":
        route = "broadcast" if ds.count() <= BROADCAST_URL_LIMIT else "join"

    tb = tiebreak_col if tiebreak_col and tiebreak_col in ds.columns() else None

    # the (micros, digest) winner order packs into ONE lexicographically
    # ordered string key (offset-shifted zero-padded micros ++ digest) so
    # the global per-url pick is a vectorized Max aggregate — never a
    # per-group Python call, which would run once per distinct url
    _MK_OFFSET = 1 << 62

    def _pack_key(batch: pa.Table) -> pa.Array:
        micros = pc.cast(pc.cast(batch[ts_col], pa.timestamp("us")), pa.int64())
        shifted = pc.add(micros, pa.scalar(_MK_OFFSET, pa.int64()))
        mk = pc.utf8_lpad(pc.cast(shifted, pa.string()), 20, "0")
        if tb is not None:
            dig = _md5_digest_array(batch[tb].to_pylist())
        else:
            dig = pa.array([""] * batch.num_rows, pa.string())
        return pc.binary_join_element_wise(mk, dig, "")

    def project(batch: pa.Table) -> pa.Table:
        t = pa.table({url_col: batch[url_col], "__mk": _pack_key(batch)})
        # local combiner: keep the per-batch winner per url
        df = t.to_pandas()
        df = df.sort_values([url_col, "__mk"]).drop_duplicates(
            url_col, keep="last"
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    from ray.data.aggregate import Max

    winners = ensure_arrow(
        ds.select_columns([url_col, ts_col] + ([tb] if tb else []))
        .map_batches(project, batch_format="pyarrow")
        .groupby(url_col)
        .aggregate(Max("__mk", alias_name="__mk"))
    )

    if route == "join":
        orig_cols = ds.columns()

        def add_key(batch: pa.Table) -> pa.Table:
            return batch.append_column("__mk", _pack_key(batch))

        n_cpu = int(_ray.cluster_resources().get("CPU", 4))
        joined = ds.map_batches(add_key, batch_format="pyarrow").join(
            winners,
            "left_semi",  # keep matching left rows, left columns only
            num_partitions=max(2, min(16, n_cpu // 2)),
            on=(url_col, "__mk"),
        )
        return joined.select_columns(orig_cols)

    key = winners.to_pandas()
    key = key[url_col] + "\x1f" + key["__mk"]
    ref = _ray.put(pa.array(key.to_numpy(), pa.string()))

    def keep_latest(batch: pa.Table) -> pa.Table:
        keys = _ray.get(ref)
        bkey = pc.binary_join_element_wise(
            batch[url_col], _pack_key(batch), "\x1f"
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


def _shingle_hashes_column(
    texts: pa.Array | pa.ChunkedArray, shingle_k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized shingle hashing for a string column: returns
    ``(hashes, row_starts)`` where ``hashes`` holds every row's shingle
    hashes contiguously in row order and ``row_starts`` (len n+1) slices
    them per row (empty rows have zero-width slices).  Shingle strings,
    hash values and per-row multisets are identical to the scalar
    :func:`_shingles` + ``hash_str_array`` path (property-tested)."""
    from ..functions.tokenizer import tokenize_column

    toks = tokenize_column(texts)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n = len(toks)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.flatten()
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])

    long_mask = lens >= shingle_k
    short_mask = (lens > 0) & ~long_mask
    n_long = np.where(long_mask, lens - shingle_k + 1, 0)

    # long rows: shingle i of row r starts at flat position offsets[r]+i —
    # expand the per-row ranges into one index vector, then join k shifted
    # takes of the flat token array with a single Arrow kernel
    parts_h, parts_r = [], []
    if n_long.sum():
        s_starts = np.repeat(offsets[:-1], n_long) + _ranges_offsets(n_long)
        cols = [
            flat.take(pa.array(s_starts + j, pa.int64()))
            for j in range(shingle_k)
        ]
        joined = pc.binary_join_element_wise(*cols, " ")
        parts_h.append(hash_str_array(joined))
        parts_r.append(np.repeat(np.arange(n, dtype=np.int64), n_long))
    if short_mask.any():
        short_lists = toks.filter(pa.array(short_mask))
        joined = pc.binary_join(short_lists, " ")
        parts_h.append(hash_str_array(joined))
        parts_r.append(np.flatnonzero(short_mask).astype(np.int64))
    if not parts_h:
        return np.empty(0, np.uint64), np.zeros(n + 1, dtype=np.int64)
    all_h = np.concatenate(parts_h)
    all_rows = np.concatenate(parts_r)
    order = np.argsort(all_rows, kind="stable")
    all_h = all_h[order]
    counts = n_long + short_mask.astype(np.int64)
    row_starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=row_starts[1:])
    return all_h, row_starts


def _ranges_offsets(lengths: np.ndarray) -> np.ndarray:
    """arange(l0) ++ arange(l1) ++ ... (zero lengths contribute nothing)."""
    l = lengths[lengths > 0]
    total = int(l.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    out = np.ones(total, dtype=np.int64)
    out[0] = 0
    if l.size > 1:
        out[np.cumsum(l[:-1])] = 1 - l[:-1]
    return np.cumsum(out)


def minhash_signatures_column(
    texts: pa.Array | pa.ChunkedArray,
    n_perms: int = MINHASH_PERMS,
    shingle_k: int = 5,
) -> np.ndarray:
    """Vectorized :func:`minhash_signature` over a whole column ->
    (n, n_perms) uint64.  Per-row output is bit-identical to the scalar
    path (min over the same shingle-hash multiset under the same perm
    streams); the perm matrix is evaluated in shingle chunks so memory
    stays bounded at ~n_perms x 64k x 8B."""
    hashes, row_starts = _shingle_hashes_column(texts, shingle_k)
    n = row_starts.size - 1
    perm_seeds = splitmix64(np.arange(1, n_perms + 1, dtype=np.uint64))
    sig = np.full((n, n_perms), np.iinfo(np.uint64).max, dtype=np.uint64)
    if hashes.size == 0:
        return sig
    counts = np.diff(row_starts)
    nonempty = np.flatnonzero(counts > 0)
    # chunk nonempty rows so each (n_perms x CH) perm slab stays
    # cache-resident — at 128 perms, 4096 shingles is a 4 MB slab; bigger
    # slabs thrash L3 through splitmix64's temporaries (measured 2x worse)
    CH = 1 << 12
    lo = 0
    while lo < nonempty.size:
        hi = lo
        tot = 0
        while hi < nonempty.size and (tot == 0 or tot + counts[nonempty[hi]] <= CH):
            tot += counts[nonempty[hi]]
            hi += 1
        rows = nonempty[lo:hi]
        gi = _ranges_to_flat(row_starts[rows], row_starts[rows + 1])
        h = hashes[gi]
        mat = splitmix64(h[None, :] ^ perm_seeds[:, None])  # (P, tot)
        local_starts = np.zeros(rows.size, dtype=np.int64)
        np.cumsum(counts[rows][:-1], out=local_starts[1:])
        sig[rows] = np.minimum.reduceat(mat, local_starts, axis=1).T
        lo = hi
    return sig


def _ranges_to_flat(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    lens = ends - starts
    keep = lens > 0
    starts, lens = starts[keep], lens[keep]
    if starts.size == 0:
        return np.empty(0, dtype=np.int64)
    total = int(lens.sum())
    idx = np.ones(total, dtype=np.int64)
    idx[0] = starts[0]
    cum = np.cumsum(lens[:-1])
    idx[cum] = starts[1:] - (starts[:-1] + lens[:-1] - 1)
    return np.cumsum(idx)


class MinHashStage:
    """Actor-pool stage: text -> minhash signature (state = perm seeds);
    fully vectorized across the batch (no per-row Python)."""

    def __init__(self, text_col: str = "text", n_perms: int = MINHASH_PERMS,
                 shingle_k: int = 5):
        self.text_col = text_col
        self.n_perms = n_perms
        self.shingle_k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = minhash_signatures_column(
            batch[self.text_col], self.n_perms, self.shingle_k
        )
        flat = pa.array(sigs.reshape(-1).astype(np.int64), pa.int64())
        offs = pa.array(
            np.arange(0, (len(sigs) + 1) * self.n_perms, self.n_perms,
                      dtype=np.int32)
        )
        arr = pa.ListArray.from_arrays(offs, flat)
        return batch.append_column("minhash", arr)


def banded_rows(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = LSH_BANDS,
    n_perms: int = MINHASH_PERMS,
    shingle_k: int = 5,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """(doc_id, band_id, band_hash) LSH band rows: shingle -> minhash
    (actor pool) -> per-band splitmix64 fold.  Shared by the one-shot
    candidate pass and the persisted incremental band index."""
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
        mh_col = batch["minhash"]
        if isinstance(mh_col, pa.ChunkedArray):
            mh_col = mh_col.combine_chunks()
        # zero-copy list<int64> -> (n, n_perms) uint64 bit view (the
        # to_pylist round-trip here cost more than the signatures)
        mh = (
            mh_col.flatten().to_numpy(zero_copy_only=False)
            .view(np.uint64).reshape(len(ids), -1)
        )
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

    return sigs.map_batches(explode, batch_format="pyarrow")


# multi-member bucket keys broadcast as one is_in value set below this
# count (they are tiny vs the band rows they filter, and the broadcast
# route avoids a second shuffle of the big side — plus Ray's hash-join
# was observed to fail sporadically on sparse right sides whose empty
# partition blocks lose their schema); above it the filter falls back
# to a distributed left_semi hash join, whose partitions are non-empty
# in exactly that regime.
BROADCAST_BUCKET_LIMIT = 10_000_000


def _fuse_key_columns(batch: pa.Table, keys: list[str],
                      out: str = "___bk") -> pa.Table:
    """Fuse N int64 key columns into ONE splitmix64 int64 column.  A
    64-bit fused-key collision can only merge two buckets in the
    PREFILTER (letting extra rows through); downstream kernels group by
    the ORIGINAL key columns and verify exactly, so output is
    unchanged."""
    acc = np.full(batch.num_rows, 0x9E3779B97F4A7C15, dtype=np.uint64)
    for k in keys:
        col = batch[k]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = col.to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False).view(np.uint64)
        acc = splitmix64(acc ^ splitmix64(v))
    return batch.append_column(
        out, pa.array(acc.view(np.int64), pa.int64()))


def _rows_with_keys(
    ds: "ray.data.Dataset", key_col: str,
    keys_ds: "ray.data.Dataset", n_keys: int,
) -> "ray.data.Dataset":
    """Keep rows of ``ds`` whose ``key_col`` appears in ``keys_ds`` —
    broadcast is_in under BROADCAST_BUCKET_LIMIT, left_semi join above."""
    if n_keys == 0:
        # empty key set (e.g. every bucket routed mega): keep schema,
        # drop every row — an empty to_pandas() has no columns to read
        return ds.map_batches(
            lambda b: b.slice(0, 0), batch_format="pyarrow"
        )
    if n_keys <= BROADCAST_BUCKET_LIMIT:
        vals = pa.array(
            keys_ds.to_pandas()[key_col].to_numpy(), pa.int64()
        )
        ref = ray.put(vals)

        def keep(batch: pa.Table) -> pa.Table:
            vs = ray.get(ref)
            return batch.filter(pc.is_in(batch[key_col], value_set=vs))

        return ds.map_batches(keep, batch_format="pyarrow")
    nparts = max(2, min(32, int(ray.cluster_resources().get("CPU", 4))))
    return ds.join(
        keys_ds, "left_semi", num_partitions=nparts, on=(key_col,),
    )


def _multi_member_buckets(
    ds: "ray.data.Dataset", keys: list[str]
) -> "ray.data.Dataset":
    """Bucket-size prefilter for candidate generation: keep only rows
    whose bucket has >= 2 members.  At corpus scale the overwhelming
    majority of LSH/chunk buckets are singletons; running the per-group
    pair kernel over them means one Python call per DOCUMENT (measured:
    the map_groups pass was 30x the signature cost at 200k docs).  The
    keys fuse into one int64 (single-column exchanges), a vectorized
    keyed Count finds the multi-member buckets, and the survivors come
    back via :func:`_rows_with_keys`; downstream kernels still group by
    the ORIGINAL key columns and verify exactly, so fused-key
    collisions cannot change output."""
    from ray.data.aggregate import Count

    fused = ds.map_batches(
        lambda b: _fuse_key_columns(b, keys), batch_format="pyarrow"
    ).materialize()
    multi = (
        fused.groupby("___bk")
        .aggregate(Count(alias_name="__bn"))
        .filter(expr="__bn >= 2")
        .drop_columns(["__bn"])
        .materialize()
    )
    out = _rows_with_keys(fused, "___bk", multi, multi.count())
    return out.drop_columns(["___bk"])


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
    from ray.data.aggregate import Count, Min

    banded = banded_rows(
        ds, text_col=text_col, id_col=id_col, bands=bands,
        n_perms=n_perms, shingle_k=shingle_k, concurrency=concurrency,
    )

    # One fused int64 bucket key instead of (band_id, band_hash): every
    # downstream exchange (count, semi-join, self-join) keys on a single
    # column.  A 64-bit fused-key collision can only ADD a candidate
    # pair, which the exact-Jaccard verify stage removes — equal buckets
    # always fuse equal, so recall is unchanged.
    def fuse(batch: pa.Table) -> pa.Table:
        bh = batch["band_hash"].to_numpy().view(np.uint64)
        bid = batch["band_id"].to_numpy().view(np.uint64)
        key = splitmix64(bh ^ splitmix64(bid)).view(np.int64)
        return pa.table(
            {id_col: batch[id_col], "bkey": pa.array(key, pa.int64())}
        )

    # materialized because three passes read it (bucket counts, the two
    # semi-joins); 16 B/row in the object store.  The persisted
    # equivalent for repeated/streaming use is build_band_index's hive
    # layout — this is the one-shot route.
    fused = banded.map_batches(fuse, batch_format="pyarrow").materialize()
    nparts = max(2, min(32, int(ray.cluster_resources().get("CPU", 4))))

    # Bucket-size pass: singleton buckets (the overwhelming majority at
    # corpus scale) are dropped HERE, in one vectorized keyed count —
    # running any per-bucket kernel over them would cost one call per
    # document.  Mega-buckets (N near-identical docs, exactly the
    # heavy-dup case) switch to O(N) star pairs against the min-id
    # canonical: all-pairs would be O(N^2), dropping them would silently
    # miss the most-duplicated content.
    star_cap = 1000
    counts = (
        fused.groupby("bkey").aggregate(Count(alias_name="__bn"))
        .materialize()
    )
    small_keys = (
        counts.filter(expr="__bn >= 2").filter(expr=f"__bn <= {star_cap}")
        .drop_columns(["__bn"]).materialize()
    )
    mega_keys = counts.filter(expr=f"__bn > {star_cap}").drop_columns(["__bn"])

    n_small = small_keys.count()

    # pair generation as a hash SELF-JOIN on the bucket key + vectorized
    # (id_a < id_b) filter — no per-group Python at all (the map_groups
    # route paid ~one pandas call per multi-member bucket).  Skipped
    # entirely when no small bucket exists: an all-empty join side's
    # blocks lose their schema inside Ray's hash shuffle.
    def to_right(batch: pa.Table) -> pa.Table:
        return batch.select([id_col, "bkey"]).rename_columns(["id_b", "bkey"])

    def ordered(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.less(batch[id_col], batch["id_b"]))
        return pa.table({"id_a": kept[id_col], "id_b": kept["id_b"]})

    if n_small:
        surv = _rows_with_keys(fused, "bkey", small_keys, n_small)
        cand = surv.join(
            surv.map_batches(to_right, batch_format="pyarrow"),
            "inner", num_partitions=nparts, on=("bkey",),
        ).map_batches(ordered, batch_format="pyarrow")
    else:
        cand = ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
        }))

    n_mega = mega_keys.count()
    if n_mega:
        _log.warning(
            "%d LSH mega-buckets (>%d members): emitting star pairs "
            "against each bucket's min id instead of all-pairs",
            n_mega, star_cap,
        )
        mega_surv = _rows_with_keys(
            fused, "bkey", mega_keys.materialize(), n_mega
        )
        mins = mega_surv.groupby("bkey").aggregate(
            Min(id_col, alias_name="__min")
        ).to_pandas()
        # one row per mega bucket (<= n_docs/star_cap by construction):
        # broadcast the bkey -> min-id map and attach it with a
        # vectorized searchsorted — every mega_surv row's bkey is in the
        # map by construction of _rows_with_keys
        order = np.argsort(mins["bkey"].to_numpy(), kind="stable")
        mref = ray.put((mins["bkey"].to_numpy()[order],
                        mins["__min"].to_numpy()[order]))

        def star(batch: pa.Table) -> pa.Table:
            ks, vs = ray.get(mref)
            bk = batch["bkey"].to_numpy()
            ids = batch[id_col].to_numpy()
            mn = vs[np.searchsorted(ks, bk)]
            keep = ids != mn
            return pa.table(
                {
                    "id_a": pa.array(mn[keep], pa.int64()),
                    "id_b": pa.array(ids[keep], pa.int64()),
                }
            )

        cand = cand.union(
            mega_surv.map_batches(star, batch_format="pyarrow")
        )

    # global pair dedup as a vectorized keyed aggregate (a per-group
    # Python call here would run once per candidate pair at scale)
    return arrow_project(
        cand.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="__n")),
        ["id_a", "id_b"],
    )


# above this many candidate pairs the id set / text dict no longer
# belongs on the driver or in one broadcast object: attach texts with
# two distributed hash joins instead
BROADCAST_PAIR_LIMIT = 2_000_000


def attach_pair_texts(
    pairs: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Candidate pairs (id_a, id_b, ...) -> same rows + ``__text_a`` /
    ``__text_b`` columns via TWO distributed hash joins against the
    corpus (pairs ⋈ docs on id_a, then on id_b): no driver-side text
    dict, no whole-dict broadcast — the at-scale route.  The corpus side
    is a 2-column projection; each join shuffles it once on the id key.
    """
    import ray as _ray

    proj = docs.select_columns([id_col, text_col])
    n_cpu = int(_ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(16, n_cpu // 2))

    def _join_text(left: "ray.data.Dataset", key: str, out: str):
        j = left.join(
            proj, "inner", num_partitions=nparts,
            on=(key,), right_on=(id_col,),
        )
        j = j.rename_columns({text_col: out})
        # drop the right-side key column if the join kept it
        if id_col in j.columns() and id_col not in left.columns():
            j = j.drop_columns([id_col])
        return j

    withA = _join_text(pairs, "id_a", "__text_a")
    return _join_text(withA, "id_b", "__text_b")


def candidate_texts(
    pairs: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[int, str]:
    """Texts of ONLY the documents named by candidate pairs, without ever
    materializing the corpus: the candidate id set (small by construction —
    it is LSH output) is broadcast once, the corpus STREAMS through a
    vectorized semi-join filter, and only the matching rows (bounded by the
    candidate count, not the corpus) are collected.

    This is the broadcast route of :func:`verify_jaccard_pairs`; past
    ``BROADCAST_PAIR_LIMIT`` candidates use :func:`attach_pair_texts`
    (two hash joins) instead — same semantics, one corpus shuffle.
    """
    import ray as _ray

    idtbl = pairs.select_columns(["id_a", "id_b"]).to_pandas()
    cand_ids = np.unique(
        np.concatenate([idtbl["id_a"].to_numpy(), idtbl["id_b"].to_numpy()])
    ).astype(np.int64) if len(idtbl) else np.empty(0, dtype=np.int64)
    ref = _ray.put(pa.array(cand_ids, pa.int64()))

    def filt(batch: pa.Table) -> pa.Table:
        keys = _ray.get(ref)
        return batch.filter(pc.is_in(batch[id_col], value_set=keys))

    rows = (
        docs.select_columns([id_col, text_col])
        .map_batches(filt, batch_format="pyarrow")
        .take_all()
    )
    return {int(r[id_col]): r[text_col] for r in rows}


def _pair_jaccard(
    ta: list, tb: list, shingle_k: int, round_to: Optional[int]
) -> list[float]:
    sims = []
    for a, b in zip(ta, tb):
        sa = set(_shingles(a, shingle_k))
        sb = set(_shingles(b, shingle_k))
        union = len(sa | sb)
        j = len(sa & sb) / union if union else 0.0
        sims.append(round(j, round_to) if round_to is not None else j)
    return sims


def verify_jaccard_pairs(
    pairs: "ray.data.Dataset",
    docs: "ray.data.Dataset | dict[int, str]",
    *,
    threshold: float = 0.8,
    shingle_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: Optional[int] = 6,
    route: str = "auto",
) -> "ray.data.Dataset":
    """Verify candidate pairs by true shingle Jaccard.  ``docs`` is the
    corpus Dataset or a small pre-built dict for tests.

    Two physical routes for fetching pair texts, identical output
    (pytest-asserted equal):

    * ``broadcast`` — :func:`candidate_texts` collects ONLY the texts
      named by pairs and ``ray.put``s the dict once; right while the
      candidate set fits one object-store object.
    * ``join`` — :func:`attach_pair_texts` ships each pair its own two
      texts via two distributed hash joins; nothing candidate-shaped
      ever lands on the driver — the at-scale shape.  ``auto`` picks by
      pair count.

    ``round_to`` rounds the reported jaccard BEFORE thresholding so
    cross-engine comparisons (DuckDB exact-Jaccard oracle) are stable.

    Stateless TASKS, not an actor pool: this stage usually sits downstream
    of the MinHash actor pool, and two pools would together reserve every
    CPU on a small cluster and deadlock the streaming executor
    (ray_guide.md:128-131).  Tasks are elastic; ``ray.get`` of the
    broadcast ref inside the task is an object-store read, not a re-ship.
    """
    import ray as _ray

    if isinstance(docs, dict):
        docs_by_id = docs
    else:
        # materialize the (small) candidate set once — both routes (and
        # route picking) consume it, and leaving it lazy would re-execute
        # the whole LSH pipeline per consumer
        pairs = pairs.materialize()
        if route == "auto":
            route = "broadcast" if pairs.count() <= BROADCAST_PAIR_LIMIT else "join"
        if route == "join":
            withtexts = attach_pair_texts(
                pairs, docs, id_col=id_col, text_col=text_col
            )

            def verify_join(batch: pd.DataFrame) -> pd.DataFrame:
                sims = _pair_jaccard(
                    batch["__text_a"].tolist(), batch["__text_b"].tolist(),
                    shingle_k, round_to,
                )
                batch = batch.drop(columns=["__text_a", "__text_b"])
                batch["jaccard"] = sims
                return batch[batch["jaccard"] >= threshold]

            return withtexts.map_batches(verify_join, batch_format="pandas")
        docs_by_id = candidate_texts(pairs, docs, id_col=id_col, text_col=text_col)
    ref = _ray.put(docs_by_id)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        dmap = _ray.get(ref)
        sims = _pair_jaccard(
            [dmap[int(a)] for a in batch["id_a"]],
            [dmap[int(b)] for b in batch["id_b"]],
            shingle_k, round_to,
        )
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


def simhash_column(
    texts: pa.Array | pa.ChunkedArray, shingle_k: int = 2
) -> np.ndarray:
    """Vectorized :func:`simhash64` over a whole column -> uint64[n],
    bit-identical per row (same shingle-hash multiset, same vote rule;
    property-tested).  Bit votes accumulate via one ``add.reduceat`` over
    the (shingles, 64) bit matrix, chunked to stay cache-resident."""
    hashes, row_starts = _shingle_hashes_column(texts, shingle_k)
    n = row_starts.size - 1
    out = np.zeros(n, dtype=np.uint64)
    if hashes.size == 0:
        return out
    counts = np.diff(row_starts)
    nonempty = np.flatnonzero(counts > 0)
    shifts = np.arange(64, dtype=np.uint64)
    weights = np.uint64(1) << shifts
    # (CH, 64) int32 bit slab = 1 MB: stays cache-resident (bigger slabs
    # thrash L3 and run 2x slower than the per-row scalar path)
    CH = 1 << 12
    lo = 0
    while lo < nonempty.size:
        hi = lo
        tot = 0
        while hi < nonempty.size and (tot == 0 or tot + counts[nonempty[hi]] <= CH):
            tot += counts[nonempty[hi]]
            hi += 1
        rows = nonempty[lo:hi]
        gi = _ranges_to_flat(row_starts[rows], row_starts[rows + 1])
        bits = ((hashes[gi][:, None] >> shifts[None, :]) & np.uint64(1)).astype(
            np.int32
        )
        local_starts = np.zeros(rows.size, dtype=np.int64)
        np.cumsum(counts[rows][:-1], out=local_starts[1:])
        ones = np.add.reduceat(bits, local_starts, axis=0)  # (rows, 64)
        votes = 2 * ones - counts[rows][:, None]
        out[rows] = ((votes > 0).astype(np.uint64) * weights[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        lo = hi
    return out


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
        vals = simhash_column(batch[text_col])
        return pa.table(
            {
                id_col: batch[id_col],
                "simhash": pa.array(vals.astype(np.int64)),
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
        if ids.size < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []}).astype(np.int64)
        if ids.size > 2000:
            # star pairs vs the min-id canonical (see minhash pairs note):
            # O(N) rows, Hamming computed and filtered as usual
            _log.warning(
                "simhash bucket with %d members: star pairs vs id %d",
                ids.size, int(ids[0]),
            )
            ia = np.zeros(ids.size - 1, dtype=np.int64)
            ib = np.arange(1, ids.size, dtype=np.int64)
        else:
            ia, ib = np.triu_indices(ids.size, k=1)
        ham = np.array(
            [bin(int(hs[a] ^ hs[b])).count("1") for a, b in zip(ia, ib)],
            dtype=np.int64,
        )
        keep = ham <= max_hamming
        return pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "hamming": ham[keep]}
        )

    cand = _multi_member_buckets(chunked, ["chunk_id", "chunk_val"]).groupby(
        ["chunk_id", "chunk_val"]
    ).map_groups(pairs, batch_format="pandas")
    # duplicate pairs across chunk tables carry the same hamming value:
    # Min is a vectorized "keep one" (no per-group Python)
    from ray.data.aggregate import Min

    return cand.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


# ------------------------------------------------ embedding-cosine near-dup

@ray.remote
def _prep_vec_block(block, id_col: str, vec_col: str):
    """(ids, unit-normalized matrix) of one block — stays in the object
    store; pair tasks read it zero-copy."""
    from .docids import _as_arrow

    from .ann import _as_matrix

    tbl = _as_arrow(block)
    ids = tbl[id_col].to_numpy().astype(np.int64)
    m = _as_matrix(tbl[vec_col])
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    return ids, m / norms[:, None]


@ray.remote
def _vec_block_pair(
    pack_a, pack_b, threshold: float, round_to: Optional[int], same: bool
) -> pa.Table:
    ids_a, ma = pack_a
    ids_b, mb = pack_b
    cos = ma @ mb.T
    if round_to is not None:
        cos = np.round(cos, round_to)
    keep = cos >= threshold
    if same:
        keep &= ids_a[:, None] < ids_b[None, :]
    ri, cj = np.nonzero(keep)
    a, b = ids_a[ri], ids_b[cj]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return pa.table(
        {
            "id_a": pa.array(lo, pa.int64()),
            "id_b": pa.array(hi, pa.int64()),
            "cosine": pa.array(cos[ri, cj], pa.float64()),
        }
    )


def embedding_neardup_pairs(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    round_to: Optional[int] = 6,
    num_blocks: Optional[int] = None,
) -> "ray.data.Dataset":
    """All pairs with cosine >= threshold, id_a < id_b — EXACT, fully
    distributed block-pair kernel: the matrix never materializes on the
    driver.

    Each block of the (id, vec) projection is unit-normalized once by a
    prep task; every unordered block pair (i <= j) is an independent Ray
    task doing one float64 matmul; results stream back as a Dataset via
    ``from_arrow_refs``.  Every doc pair lives in exactly one block-pair
    task (same-block pairs deduped by the upper-triangle mask), so output
    pairs are unique by construction.  O(N^2 / B) work per task — size
    ``num_blocks`` so a block fits worker memory; task count grows as
    B^2/2, so at very large N switch to the approximate hyperplane-LSH
    candidate route (:func:`embedding_neardup_lsh`) instead of exact
    all-pairs.

    ``round_to`` rounds the cosine BEFORE thresholding so cross-engine
    comparisons (DuckDB oracle) are stable.
    """
    from .docids import _block_refs

    proj = ds.select_columns([id_col, vec_col])
    if num_blocks is not None:
        proj = proj.repartition(num_blocks)
    mat = proj.materialize()
    refs = _block_refs(mat)
    packs = [_prep_vec_block.remote(r, id_col, vec_col) for r in refs]
    outs = [
        _vec_block_pair.remote(packs[i], packs[j], threshold, round_to, i == j)
        for i in range(len(packs))
        for j in range(i, len(packs))
    ]
    return ray.data.from_arrow_refs(outs)


def embedding_neardup_lsh(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    round_to: Optional[int] = 6,
    n_bits: int = 8,
    n_tables: int = 8,
) -> "ray.data.Dataset":
    """Approximate near-dup pairs at cluster scale: hyperplane-LSH bucket
    the vectors (groupby on (table, bucket) — the only all-to-all, keyed
    on the small bucket id), run the exact pair kernel WITHIN buckets,
    dedup pairs found by multiple tables.  Recall < 1 by construction
    (it is the standard trade for dropping the B^2/2 exact task grid);
    recall vs the exact kernel is measured in pytest."""
    from ..stages.ann import _as_matrix, _hyperplanes, lsh_bucket

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # empty batch: keep schema, skip the matrix
            empty = pa.array([], pa.int64())
            return batch.append_column("tbl", empty).append_column("bucket", empty)
        vecs = _as_matrix(batch[vec_col])
        out = []
        for t in range(n_tables):
            planes = _hyperplanes(vecs.shape[1], n_bits, seed=142 + t)
            out.append(
                pa.table(
                    {
                        id_col: batch[id_col],
                        vec_col: batch[vec_col],
                        "tbl": pa.array(np.full(len(vecs), t, dtype=np.int64)),
                        "bucket": pa.array(lsh_bucket(vecs, planes)),
                    }
                )
            )
        return pa.concat_tables(out)

    tagged = ds.select_columns([id_col, vec_col]).map_batches(
        tag, batch_format="pyarrow"
    )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(id_col)
        ids = g[id_col].to_numpy().astype(np.int64)
        if ids.size < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": np.int64, "id_b": np.int64, "cosine": np.float64}
            )
        m = np.array(g[vec_col].to_list(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        m = m / norms[:, None]
        cos = m @ m.T
        if round_to is not None:
            cos = np.round(cos, round_to)
        keep = (cos >= threshold) & (ids[:, None] < ids[None, :])
        ri, cj = np.nonzero(keep)
        return pd.DataFrame(
            {"id_a": ids[ri], "id_b": ids[cj], "cosine": cos[ri, cj]}
        )

    cand = _multi_member_buckets(tagged, ["tbl", "bucket"]).groupby(
        ["tbl", "bucket"]
    ).map_groups(pairs, batch_format="pandas")
    # duplicate pairs across tables carry the same cosine: Min is a
    # vectorized "keep one" (no per-group Python)
    from ray.data.aggregate import Min

    return cand.groupby(["id_a", "id_b"]).aggregate(
        Min("cosine", alias_name="cosine")
    )


# --------------------------------------------- near-dup cluster assignment

def _cc_star_contract(
    sym_edges: "ray.data.Dataset", nparts: int, max_rounds: int
) -> "ray.data.Dataset":
    """Alternating large-star/small-star contraction (Kiveris et al.,
    SoCC'14) of a symmetric (src, dst) edge set -> the SYMMETRIC edge
    set of the fixpoint star graph (every edge connects a node to its
    component minimum).  O(log n) rounds; every pass is a vectorized
    groupby-Min + hash join + canonical-pair dedup — no per-node Python,
    nothing on the driver but two scalar aggregates per round.

    Fixpoint detection: per-round (edge count, Sum of a 64-bit pair
    hash) — both unchanged across a full large+small round means the
    multiset of edges is unchanged (up to a 2^64-sum hash collision,
    the same astronomically-unlikely trade the minlabel Sum check
    documents).
    """
    from ray.data.aggregate import Count, Min, Sum

    def canon(batch: pa.Table, x: str, y: str) -> pa.Table:
        a = batch[x]
        b = batch[y]
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        t = pa.table({"a": lo, "b": hi})
        return t.filter(pc.not_equal(t["a"], t["b"]))

    # canonical deduped (a < b) view of the input
    E = arrow_project(
        sym_edges.map_batches(
            lambda t: canon(t, "src", "dst"), batch_format="pyarrow"
        )
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="__n")),
        ["a", "b"],
    ).materialize()
    if E.count() == 0:  # all input edges were self-loops
        return ray.data.from_arrow(pa.table({
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
        }))

    def fingerprint(e: "ray.data.Dataset") -> tuple[int, int]:
        def h(batch: pa.Table) -> pa.Table:
            a = batch["a"].to_numpy().astype(np.uint64)
            b = batch["b"].to_numpy().astype(np.uint64)
            hv = splitmix64(splitmix64(a) ^ b).astype(np.int64)
            return pa.table({"h": pa.array(hv)})

        agg = e.map_batches(h, batch_format="pyarrow").aggregate(
            Sum("h", alias_name="s"), Count(alias_name="n")
        )
        return int(agg["n"]), int(agg["s"])

    def node_min(e: "ray.data.Dataset", key: str, other: str) -> "ray.data.Dataset":
        m = e.groupby(key).aggregate(Min(other, alias_name="__m"))
        return arrow_project(m, [key, "__m"], {key: "__node"})

    def large_star(e: "ray.data.Dataset") -> "ray.data.Dataset":
        # min over the FULL neighborhood of the smaller endpoint
        sym = e.map_batches(
            lambda t: pa.table({
                "u": pa.concat_arrays([
                    t["a"].combine_chunks(), t["b"].combine_chunks()]),
                "v": pa.concat_arrays([
                    t["b"].combine_chunks(), t["a"].combine_chunks()]),
            }),
            batch_format="pyarrow",
        )
        mins = node_min(sym, "u", "v")
        j = e.join(mins, "inner", num_partitions=nparts,
                   on=("a",), right_on=("__node",))

        def emit(batch: pa.Table) -> pa.Table:
            # m_a = min(Gamma(a) u {a}); edge (a,b) -> (b, m_a)
            m = pc.min_element_wise(batch["__m"], batch["a"])
            return canon(pa.table({"x": batch["b"], "y": m}), "x", "y")

        # duplicates are NOT deduped here: the small-star that always
        # follows dedups at its end, and Min-based rewiring is
        # duplicate-insensitive — saves one keyed shuffle per round
        return j.map_batches(emit, batch_format="pyarrow")

    def small_star(e: "ray.data.Dataset") -> "ray.data.Dataset":
        # per larger endpoint b: m_b = min smaller neighbor; edges
        # (v, m_b) for the other smaller neighbors + (m_b, b)
        mins = node_min(e, "b", "a")  # (__node=b, __m)
        j = e.join(mins, "inner", num_partitions=nparts,
                   on=("b",), right_on=("__node",))

        def emit(batch: pa.Table) -> pa.Table:
            return canon(
                pa.table({"x": batch["a"], "y": batch["__m"]}), "x", "y"
            )

        rewired = j.map_batches(emit, batch_format="pyarrow")
        root_edges = mins.map_batches(
            lambda t: pa.table({"a": t["__m"], "b": t["__node"]}),
            batch_format="pyarrow",
        )
        return arrow_project(
            rewired.union(root_edges)
            .groupby(["a", "b"])
            .aggregate(Count(alias_name="__n")),
            ["a", "b"],
        )

    prev = fingerprint(E)
    for _round in range(max_rounds):
        E = _cut_lineage(small_star(large_star(E)).materialize())
        cur = fingerprint(E)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"star contraction did not converge in {max_rounds} rounds"
        )
    return E.map_batches(
        lambda t: pa.table({
            "src": pa.concat_arrays([
                t["a"].combine_chunks(), t["b"].combine_chunks()]),
            "dst": pa.concat_arrays([
                t["b"].combine_chunks(), t["a"].combine_chunks()]),
        }),
        batch_format="pyarrow",
    ).materialize()


# method="auto" runs min-label this many rounds before concluding the
# graph has a high-diameter component and switching to star contraction
_CC_AUTO_MINLABEL_BUDGET = 8


def connected_components(
    pairs: "ray.data.Dataset",
    *,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_rounds: int = 50,
    method: str = "auto",
    exact_convergence: bool = False,
) -> "ray.data.Dataset":
    """Connected components over an undirected edge list -> one row per
    node: ``(node, cluster_id)`` with ``cluster_id`` = min node id in the
    component (the canonical representative).

    Three methods, identical output (pytest-asserted equal):

    * ``minlabel`` — BSP min-label propagation: labels start
      at ``min(node, min neighbor)``; each round ships every node's
      current label to its neighbors through ONE hash join on the node
      key, then a vectorized ``Min`` groupby re-labels.  Converges in
      O(diameter) rounds — near-dup graphs are unions of tiny dense
      clusters (diameter 1-2 after LSH banding), so 2-3 rounds in
      practice.
    * ``star`` — alternating large-star/small-star edge contraction
      (Kiveris et al., *Connected Components in MapReduce and Beyond*,
      SoCC'14): O(log n) rounds regardless of diameter, each round two
      vectorized groupby-Min + join passes that REWRITE the edge set
      toward stars rooted at component minima.  The scale choice when
      components with large diameters can appear (e.g. chains of
      pairwise near-dups).
    * ``auto`` (default) — min-label for up to
      ``_CC_AUTO_MINLABEL_BUDGET`` rounds (the near-dup fast path,
      diameter 1-2); if labels are still moving — the signature of a
      high-diameter component, which no cheap upfront estimate
      detects reliably — falls back to star contraction and re-labels,
      so pathological chains cost O(budget + log n) rounds instead of
      O(diameter) or a convergence failure.

    Convergence is detected WITHOUT comparing label tables: per-node
    labels only ever decrease, so the global ``Sum(label)`` is strictly
    decreasing until fixpoint — when one round leaves the sum unchanged,
    no label moved and the labeling is final (two scalar aggregates per
    round, no extra join).  The sum wraps mod 2^64 once
    ``n_nodes × max_id`` exceeds int64, so the check can falsely report
    a fixpoint ONLY if a round's total label decrease is an exact
    nonzero multiple of 2^64; deployments that cannot accept that
    (astronomically unlikely) miss pass ``exact_convergence=True`` to
    swap in a per-round old⋈new changed-count join (one extra hash join
    per round, wrap-proof).
    """
    import ray as _ray
    from ray.data.aggregate import Max, Min, Sum

    if method not in ("auto", "minlabel", "star"):
        raise ValueError(f"unknown connected-components method: {method!r}")
    n_cpu = int(_ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(16, n_cpu // 2))

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch[a_col].combine_chunks() if isinstance(
            batch[a_col], pa.ChunkedArray) else batch[a_col]
        b = batch[b_col].combine_chunks() if isinstance(
            batch[b_col], pa.ChunkedArray) else batch[b_col]
        return pa.table({
            "src": pa.concat_arrays([a.cast(pa.int64()), b.cast(pa.int64())]),
            "dst": pa.concat_arrays([b.cast(pa.int64()), a.cast(pa.int64())]),
        })

    edges = (
        pairs.select_columns([a_col, b_col])
        .map_batches(symmetrize, batch_format="pyarrow")
        .materialize()
    )
    if edges.count() == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "label": pa.array([], pa.int64()),
        }))
    def clip_self(batch: pa.Table) -> pa.Table:
        lab = pc.min_element_wise(batch["src"], batch["label"])
        return pa.table({"node": batch["src"], "label": lab})

    def label_loop(e: "ray.data.Dataset", rounds: int):
        """Min-label to fixpoint over edge set ``e`` within ``rounds``
        rounds -> (labels, converged)."""
        # round 0 fused into init: label(n) = min(n, min neighbor)
        # (for star-contracted input the edge set IS stars rooted at
        # the component minima, so this single pass reads labels off)
        labels = e.groupby("src").aggregate(Min("dst", alias_name="label"))
        labels = _cut_lineage(labels.map_batches(
            clip_self, batch_format="pyarrow"
        ).materialize())
        prev_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]
        for _round in range(rounds):
            msgs = arrow_project(
                e.join(
                    labels, "inner", num_partitions=nparts,
                    on=("src",), right_on=("node",),
                ),
                ["dst", "label"], {"dst": "node"},
            )
            new_labels = _cut_lineage(ensure_arrow(
                msgs.union(labels)
                .groupby("node")
                .aggregate(Min("label", alias_name="label"))
            ).materialize())
            if exact_convergence:
                # wrap-proof: labels only decrease, so changed <=> new < old
                j = new_labels.join(
                    arrow_project(
                        labels, ["node", "label"], {"label": "__old"}
                    ),
                    "inner", num_partitions=nparts, on=("node",),
                )
                moved = j.map_batches(
                    lambda t: pa.table({"c": pc.cast(
                        pc.less(t["label"], t["__old"]), pa.int8())}),
                    batch_format="pyarrow",
                ).aggregate(Max("c", alias_name="m"))["m"]
                labels = new_labels
                if not moved:
                    return labels, True
            else:
                labels = new_labels
                cur_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]
                if cur_sum == prev_sum:
                    return labels, True
                prev_sum = cur_sum
        return labels, False

    if method == "star":
        edges = _cc_star_contract(edges, nparts, max_rounds)
        if edges.count() == 0:  # input was all self-loops
            return ray.data.from_arrow(pa.table({
                "node": pa.array([], pa.int64()),
                "label": pa.array([], pa.int64()),
            }))
        labels, converged = label_loop(edges, max_rounds)
    elif method == "minlabel":
        labels, converged = label_loop(edges, max_rounds)
    else:  # auto
        budget = min(_CC_AUTO_MINLABEL_BUDGET, max_rounds)
        labels, converged = label_loop(edges, budget)
        if not converged:
            # high-diameter component: contract first, then one cheap pass
            edges = _cc_star_contract(edges, nparts, max_rounds)
            labels, converged = label_loop(edges, max_rounds)
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    return labels


def neardup_clusters(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_k: int = 5,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Near-duplicate CLUSTER assignment: MinHash+LSH candidates ->
    exact-Jaccard verification -> connected components over the verified
    pair graph.  Output: ``(doc_id, cluster_id)`` for every document
    that belongs to a multi-document cluster, ``cluster_id`` = min
    doc_id of the cluster (the canonical survivor exact/near dedup would
    keep).  Singleton documents are absent by construction — at corpus
    scale emitting N "cluster of one" rows would dwarf the duplicates.
    """
    cand = minhash_lsh_candidates(
        ds, text_col=text_col, id_col=id_col, shingle_k=shingle_k,
        concurrency=concurrency,
    )
    verified = verify_jaccard_pairs(
        cand, ds, threshold=threshold, shingle_k=shingle_k,
        id_col=id_col, text_col=text_col,
    )
    labels = connected_components(verified)
    return arrow_project(
        labels, ["node", "label"], {"node": id_col, "label": "cluster_id"}
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
    route: str = "auto",
) -> "ray.data.Dataset":
    """Exact n-gram Jaccard near-dup: LSH candidates at a permissive band
    setting, then exact shingle-set verification — the
    candidates-then-verify composition (ray_guide.md:165-169)."""
    cand = minhash_lsh_candidates(
        ds, text_col=text_col, id_col=id_col, shingle_k=shingle_k,
        concurrency=concurrency,
    )
    return verify_jaccard_pairs(
        cand, ds, threshold=threshold, shingle_k=shingle_k,
        id_col=id_col, text_col=text_col, route=route,
    )


# ------------------------- exact substring dedup (duplicate-span detection)

# Window width (BYTES) for the duplicate-substring family.  Public spec:
# Lee et al. 2022, "Deduplicating Training Data Makes Language Models
# Better" (arXiv:2107.06499) detect exact duplicate spans of >= ~50 tokens
# with a suffix array; the Ray-Data-native shape below replaces the suffix
# array with a stride-1 rolling-hash window table + one hash-keyed groupby
# (candidates) + exact verification — the same all-to-all-on-small-keys
# pattern as MinHash-LSH above.
SUBSTR_WINDOW = 32


def substring_window_hashes(
    ds: "ray.data.Dataset",
    *,
    window: int = SUBSTR_WINDOW,
    text_col: str = "text",
    id_col: str = "doc_id",
    winnow: Optional[int] = None,
) -> "ray.data.Dataset":
    """(doc_id, h) rows: the DISTINCT rolling hashes of every
    ``window``-byte window (stride 1) of each document.

    ``winnow=m`` keeps only each row's sliding-``m``-window minima
    (standard winnowing, Schleimer/Wilkerson/Aiken SIGMOD 2003): selection
    depends only on local content, so two documents sharing any run of
    >= ``window + m - 1`` bytes are GUARANTEED to share a selected hash —
    the 100-TB path, cutting the exchanged table ~m× while keeping the
    long-duplicate detection contract (property-tested).  ``winnow=None``
    keeps every window (exact against the stride-1 SQL oracle).

    Per-doc dedup happens inside the batch (sort + mask — no Python row
    loop), so the shuffle sees at most one row per (doc, distinct window).
    """
    from ..functions.hashing import window_hashes_column

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        h, bounds = window_hashes_column(batch[text_col], window=window)
        n_win = np.diff(bounds)
        if winnow is not None and winnow > 1 and h.size:
            m = winnow
            keep = np.zeros(h.size, dtype=bool)
            # rows with >= m windows: flat sliding-min over h, valid at
            # positions fully inside the row
            big = n_win >= m
            if big.any():
                sw = np.lib.stride_tricks.sliding_window_view(h, m)
                starts = bounds[:-1][big]
                ends = bounds[1:][big] - m + 1
                from ..functions.hashing import _flat_ranges

                pos = _flat_ranges(starts, ends)
                mins = sw[pos].min(axis=1)
                # mark selected positions: min value's first occurrence
                # inside each sliding window — marking every position whose
                # hash equals its window min is equivalent for the OUTPUT
                # (same selected hash VALUES per row)
                for off in range(m):
                    keep[pos + off] |= h[pos + off] == mins
            # rows with 0 < n_win < m: keep the row min (the whole row is
            # one window)
            small = (n_win > 0) & (n_win < m)
            if small.any():
                s_starts = bounds[:-1][small]
                s_bounds = np.zeros(int(small.sum()), dtype=np.int64)
                np.cumsum(n_win[small][:-1], out=s_bounds[1:])
                from ..functions.hashing import _flat_ranges

                gi = _flat_ranges(s_starts, bounds[1:][small])
                row_min = np.minimum.reduceat(h[gi], s_bounds)
                # mark positions equal to their row min
                rep = np.repeat(row_min, n_win[small])
                keep[gi] |= h[gi] == rep
            doc_rep = np.repeat(ids, n_win)[keep]
            h = h[keep]
        else:
            doc_rep = np.repeat(ids, n_win)
        if h.size == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "h": pa.array([], pa.int64())}
            )
        # per-(doc, h) distinct without Python rows: lexsort + change mask
        order = np.lexsort((h, doc_rep))
        d_s, h_s = doc_rep[order], h[order]
        first = np.ones(d_s.size, dtype=bool)
        first[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
        return pa.table(
            {
                id_col: pa.array(d_s[first], pa.int64()),
                "h": pa.array(h_s[first].astype(np.int64), pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow"
    )


def _pair_shared_windows(ta: list, tb: list, window: int) -> list[int]:
    """Exact |distinct window-substrings(a) ∩ (b)| per pair — CHARACTER
    windows, matching SQL ``substr`` semantics (== byte windows for ASCII;
    the hash candidates are byte-window based, a superset for any utf-8
    because a shared char window contains a shared byte window)."""
    out = []
    cache: dict[str, set] = {}

    def wins(t: str) -> set:
        s = cache.get(t)
        if s is None:
            s = {t[i : i + window] for i in range(len(t) - window + 1)}
            cache[t] = s
        return s

    for a, b in zip(ta, tb):
        out.append(len(wins(a) & wins(b)))
    return out


def substring_dup_pairs(
    ds: "ray.data.Dataset",
    *,
    window: int = SUBSTR_WINDOW,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_shared: int = 1,
    winnow: Optional[int] = None,
    max_window_df: Optional[int] = None,
    route: str = "auto",
) -> "ray.data.Dataset":
    """Document pairs sharing >= ``min_shared`` exact ``window``-char
    substrings: (id_a, id_b, n_shared), id_a < id_b.

    Shape: stride-1 window hashes (winnowed at scale) -> hash-keyed
    SELF-JOIN on h (fully vectorized — a per-group Python callable here
    runs once per distinct window and dominated wall time 4×) -> pair
    dedup aggregate -> EXACT verification on the real substring sets
    (removes hash collisions and recomputes n_shared over characters, so
    the result is independent of the hash).  The only shuffles key on
    the window hash and the pair — never on the corpus.

    ``max_window_df`` (optional) drops windows present in more than that
    many documents BEFORE pairing — the boilerplate guard at scale, where
    a site-wide footer shared by D docs would otherwise emit O(D²) join
    rows.  The guarded result is a subset (property-tested); the oracle
    entry runs unguarded.
    """
    import ray as _ray
    from ray.data.aggregate import Count

    wh = substring_window_hashes(
        ds, window=window, text_col=text_col, id_col=id_col, winnow=winnow
    ).materialize()

    if max_window_df is not None:
        hot = ensure_arrow(
            wh.groupby("h").aggregate(Count(alias_name="__df"))
        ).filter(expr=f"__df > {int(max_window_df)}")
        hot_pdf = hot.select_columns(["h"]).to_pandas()
        hot_ids = (
            hot_pdf["h"].to_numpy()
            if "h" in hot_pdf.columns
            else np.empty(0, dtype=np.int64)
        )
        if hot_ids.size:
            _log.warning(
                "substring dedup: dropping %d windows with df > %d",
                hot_ids.size, max_window_df,
            )
            hot_ref = _ray.put(pa.array(hot_ids, pa.int64()))

            def drop_hot(batch: pa.Table) -> pa.Table:
                return batch.filter(
                    pc.invert(
                        pc.is_in(batch["h"], value_set=_ray.get(hot_ref))
                    )
                )

            wh = wh.map_batches(drop_hot, batch_format="pyarrow")

    n_cpu = int(_ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(16, n_cpu // 2))
    left = arrow_project(wh, [id_col, "h"], {id_col: "id_a"})
    right = arrow_project(wh, [id_col, "h"], {id_col: "id_b"})
    joined = left.join(
        right, "inner", num_partitions=nparts, on=("h",), right_on=("h",)
    )

    def ordered(batch: pa.Table) -> pa.Table:
        keep = pc.less(batch["id_a"], batch["id_b"])
        return pa.table(
            {
                "id_a": batch["id_a"].filter(keep),
                "id_b": batch["id_b"].filter(keep),
            }
        )

    cand = joined.map_batches(ordered, batch_format="pyarrow")
    cand = arrow_project(
        cand.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="__n")),
        ["id_a", "id_b"],
    ).materialize()

    n_pairs = cand.count()
    use_join = route == "join" or (
        route == "auto" and n_pairs > BROADCAST_PAIR_LIMIT
    )
    if use_join:
        withtexts = attach_pair_texts(cand, ds, id_col=id_col, text_col=text_col)

        def verify_join(batch: pd.DataFrame) -> pd.DataFrame:
            ns = _pair_shared_windows(
                batch["__text_a"].tolist(), batch["__text_b"].tolist(), window
            )
            batch = batch.drop(columns=["__text_a", "__text_b"])
            batch["n_shared"] = np.asarray(ns, dtype=np.int64)
            return batch[batch["n_shared"] >= min_shared]

        return withtexts.map_batches(verify_join, batch_format="pandas")

    import ray as _ray

    docs_by_id = candidate_texts(cand, ds, id_col=id_col, text_col=text_col)
    ref = _ray.put(docs_by_id)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        dmap = _ray.get(ref)
        ns = _pair_shared_windows(
            [dmap[int(a)] for a in batch["id_a"]],
            [dmap[int(b)] for b in batch["id_b"]],
            window,
        )
        batch = batch.copy()
        batch["n_shared"] = np.asarray(ns, dtype=np.int64)
        return batch[batch["n_shared"] >= min_shared]

    return cand.map_batches(verify, batch_format="pandas")


# ---------------- incremental near-dup vs a persisted LSH band index

# bucket fan-out for the persisted band table: wide enough that a small
# ingest batch prunes most partition directories, narrow enough that each
# bucket directory holds many band groups (file-count hygiene)
BAND_INDEX_BUCKETS = 64


def build_band_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = LSH_BANDS,
    n_perms: int = MINHASH_PERMS,
    shingle_k: int = 5,
    n_buckets: int = BAND_INDEX_BUCKETS,
) -> str:
    """Persist the corpus's LSH band rows as a ``bucket=<b>/``
    hive-partitioned parquet table (bucket = band_hash mod n_buckets).

    This is the INGEST-side artifact for streaming dedup: each new batch
    of documents is checked against the standing corpus by reading ONLY
    the bucket directories its own band hashes fall in (path-level
    partition pruning) — never a corpus scan.  Append-friendly: a checked
    batch's own band rows can be written into the same layout.
    """
    import os

    done = os.path.join(index_dir, "_SUCCESS")
    if os.path.exists(done):
        return index_dir

    rows = banded_rows(
        ds, text_col=text_col, id_col=id_col, bands=bands,
        n_perms=n_perms, shingle_k=shingle_k,
    )

    def tag(batch: pa.Table) -> pa.Table:
        h = batch["band_hash"].to_numpy()
        bucket = np.mod(h, n_buckets)  # nonneg for int64 with positive mod
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))

    rows.map_batches(tag, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["bucket"]
    )
    with open(done, "w") as f:
        f.write("ok")
    return index_dir


def incremental_neardup_pairs(
    new_docs: "ray.data.Dataset",
    index_dir: str,
    corpus_docs: "ray.data.Dataset",
    *,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = LSH_BANDS,
    n_perms: int = MINHASH_PERMS,
    shingle_k: int = 5,
    n_buckets: int = BAND_INDEX_BUCKETS,
) -> "ray.data.Dataset":
    """Near-duplicates of an INGEST BATCH against the standing corpus:
    (id_new, id_old, jaccard) with true shingle-Jaccard >= threshold.

    The batch's band rows are computed once; the persisted band table is
    read pruned to the buckets those rows hit (``PathPartitionFilter`` —
    non-matching bucket directories are never opened); candidates come
    from one (band_id, band_hash) hash join; verification recomputes the
    exact Jaccard from the texts (same routes as the one-shot op).  Per
    batch the work scales with the batch and its collisions, not the
    corpus — the streaming-ingest dedup shape.
    """
    from ray.data.datasource.partitioning import PathPartitionFilter
    from ray.data.aggregate import Count

    new_rows = banded_rows(
        new_docs, text_col=text_col, id_col=id_col, bands=bands,
        n_perms=n_perms, shingle_k=shingle_k,
    ).materialize()

    buckets = set(
        int(b) % n_buckets
        for b in new_rows.select_columns(["band_hash"])
        .to_pandas()["band_hash"]
        .to_numpy()
    )

    def keep(partitions: dict) -> bool:
        return "bucket" in partitions and int(partitions["bucket"]) in buckets

    old_rows = ray.data.read_parquet(
        index_dir,
        partition_filter=PathPartitionFilter.of(keep),
        file_extensions=["parquet"],
    )

    left = arrow_project(
        new_rows, [id_col, "band_id", "band_hash"], {id_col: "id_new"}
    )
    right = arrow_project(
        old_rows, [id_col, "band_id", "band_hash"], {id_col: "id_old"}
    )
    import ray as _ray

    n_cpu = int(_ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(16, n_cpu // 2))
    joined = left.join(
        right, "inner", num_partitions=nparts,
        on=("band_id", "band_hash"), right_on=("band_id", "band_hash"),
    )
    cand = arrow_project(
        ensure_arrow(joined)
        .groupby(["id_new", "id_old"])
        .aggregate(Count(alias_name="__n")),
        ["id_new", "id_old"],
    )
    # verify on the union corpus (texts for both sides), reusing the
    # broadcast/join routed verifier
    cand_ab = arrow_project(
        cand, ["id_new", "id_old"], {"id_new": "id_a", "id_old": "id_b"}
    )
    docs_union = corpus_docs.select_columns([id_col, text_col]).union(
        new_docs.select_columns([id_col, text_col])
    )
    verified = verify_jaccard_pairs(
        cand_ab, docs_union, threshold=threshold, shingle_k=shingle_k,
        id_col=id_col, text_col=text_col,
    )
    return arrow_project(
        verified,
        ["id_a", "id_b", "jaccard"],
        {"id_a": "id_new", "id_b": "id_old"},
    )


def neardup_keep_best(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_k: int = 5,
    clusters: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """Canonical-document selection (the C4 / RefinedWeb dedup rule):
    within each near-duplicate cluster KEEP the document with the most
    tokens, ties broken by lowest doc_id; everything else in the cluster
    is dropped.  Output: one row per CLUSTERED doc —
    ``(doc_id, cluster_id, kept_doc_id, kept)`` (singletons are absent,
    like :func:`neardup_clusters` — they keep themselves trivially).

    Scale shape: the cluster table holds only near-dup graph NODES (a
    small fraction of the corpus), so winner selection runs on the tiny
    (cluster_id, doc_id, n_tokens) projection — per-cluster best picked
    by a vectorized ``Max`` over a packed ``n_tokens·2^40 + (2^40-1 -
    doc_id)`` key (one aggregate, never a per-group Python call; the
    packing bounds are doc_id < 2^40 and n_tokens < 2^23 — beyond that,
    pack into the url_dedup string key instead).  Token counts attach
    via ONE filtered corpus pass against the broadcast node set (swap
    for a left_semi hash join above BROADCAST_WINNER_LIMIT nodes, the
    url_dedup route)."""
    import ray as _ray
    from ray.data.aggregate import Max

    from ..functions.tokenizer import flatten_tokens

    if clusters is None:
        clusters = neardup_clusters(
            ds, text_col=text_col, id_col=id_col, threshold=threshold,
            shingle_k=shingle_k,
        )
    clusters = clusters.materialize()
    node_ref = _ray.put(
        pa.array(clusters.to_pandas()[id_col].to_numpy(), pa.int64())
    )

    def count_clustered(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.is_in(batch[id_col], value_set=_ray.get(node_ref)))
        if sub.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "n_tokens": pa.array([], pa.int64())}
            )
        _, _, doc_len = flatten_tokens(sub[text_col])
        return pa.table(
            {
                id_col: sub[id_col],
                "n_tokens": pa.array(doc_len.astype(np.int64), pa.int64()),
            }
        )

    lens = (
        ds.select_columns([id_col, text_col])
        .map_batches(count_clustered, batch_format="pyarrow")
        .to_pandas()
    )
    lo = np.argsort(lens[id_col].to_numpy(), kind="stable")
    len_ref = _ray.put(
        (lens[id_col].to_numpy()[lo].astype(np.int64),
         lens["n_tokens"].to_numpy()[lo].astype(np.int64))
    )

    _PK = np.int64(1) << np.int64(40)

    def pack(batch: pa.Table) -> pa.Table:
        lk, lv = _ray.get(len_ref)
        ids = batch[id_col].to_numpy()
        n = lv[np.searchsorted(lk, ids)]
        key = n * _PK + (_PK - np.int64(1) - ids)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster_id": batch["cluster_id"],
                "pk": pa.array(key, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
            }
        )

    packed = clusters.map_batches(pack, batch_format="pyarrow").materialize()
    winners = (
        packed.select_columns(["cluster_id", "pk"])
        .groupby("cluster_id")
        .aggregate(Max("pk", alias_name="pk_max"))
        .to_pandas()
    )
    winners["kept_doc_id"] = (
        int(_PK) - 1 - (winners["pk_max"].astype(np.int64) % int(_PK))
    ).astype(np.int64)
    wo = np.argsort(winners["cluster_id"].to_numpy(), kind="stable")
    win_ref = _ray.put(
        (winners["cluster_id"].to_numpy()[wo].astype(np.int64),
         winners["kept_doc_id"].to_numpy()[wo].astype(np.int64))
    )

    def attach(batch: pa.Table) -> pa.Table:
        wk, wv = _ray.get(win_ref)
        cids = batch["cluster_id"].to_numpy()
        ids = batch[id_col].to_numpy()
        kept_id = wv[np.searchsorted(wk, cids)]
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster_id": batch["cluster_id"],
                "kept_doc_id": pa.array(kept_id, pa.int64()),
                "kept": pa.array((ids == kept_id).astype(np.int64), pa.int64()),
            }
        )

    return packed.drop_columns(["pk", "n_tokens"]).map_batches(
        attach, batch_format="pyarrow"
    )
