"""Similarity search over embedding columns (task brief first-class op).

* :func:`knn_brute` — exact cosine top-k: broadcast the query matrix once
  (ray.put), numpy float64 matmul per batch, per-batch local top-k partials,
  tiny final merge.  The per-batch top-k is the combiner: the shuffle-free
  reduction ships k rows per (query, batch) instead of N.
* :func:`knn_lsh` — scale path: random-hyperplane LSH buckets; queries only
  score vectors sharing >=1 bucket (with multi-probe via B tables).
  Approximate; recall measured against brute force in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.hashing import splitmix64
from .util import pool_size

# bumped when the quantizer/bucket spec changes (pinned ANN goldens carry
# it in their fingerprint so a spec change forces a golden recompute)
# v3: k-means inner distances moved to the matmul form
ANN_VERSION = "ann-v3"


def _pairwise_d2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Squared L2 distances (n, k) in matmul form ‖a‖² − 2a·bᵀ + ‖b‖²:
    O(n·k) memory, never an (n, k, d) broadcast intermediate."""
    return (
        (a * a).sum(axis=1)[:, None]
        - 2.0 * (a @ b.T)
        + (b * b).sum(axis=1)[None, :]
    )


def _as_matrix(col) -> np.ndarray:
    """Embedding column -> (n, d) float64 matrix.  Arrow list columns
    flatten through the values buffer (no Python list round-trip);
    plain Python lists (tests) still convert."""
    if isinstance(col, (list, np.ndarray)):
        return np.array(col, dtype=np.float64)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(
        np.float64, copy=False
    )
    if n == 0:
        return flat.reshape(0, 0)
    if flat.size % n:
        raise ValueError("ragged embedding column")
    return flat.reshape(n, flat.size // n)


def _codes_matrix(raw: pa.Array, n_rows: int, width: int) -> np.ndarray:
    """binary codes column -> (n_rows, width) uint8, zero-copy from the
    Arrow data buffer when the values are contiguous fixed-width (always
    true for encoder output); falls back to a Python join otherwise."""
    offs_buf, data_buf = raw.buffers()[1], raw.buffers()[2]
    offs = np.frombuffer(offs_buf, dtype=np.int32)[
        raw.offset : raw.offset + n_rows + 1
    ]
    if int(offs[-1] - offs[0]) == n_rows * width:
        flat = np.frombuffer(data_buf, dtype=np.uint8)[offs[0] : offs[-1]]
    else:
        flat = np.frombuffer(b"".join(raw.to_pylist()), dtype=np.uint8)
    return flat.reshape(n_rows, width)


def _empty_partial() -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )


def knn_brute(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> pd.DataFrame:
    """Exact cosine top-k for each query row -> DataFrame
    (query_id, rank, vec_id, score); ties (score desc, vec_id asc) on the
    ``round_to``-rounded score so results are stable across engines."""
    q = np.asarray(queries, dtype=np.float64)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    qref = ray.put((q, qn))

    class Score:
        def __init__(self):
            self.q, self.qn = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:  # Ray Data can deliver empty batches
                return _empty_partial()
            ids = batch[id_col].to_numpy()
            m = _as_matrix(batch[vec_col])
            mn = np.linalg.norm(m, axis=1)
            mn[mn == 0] = 1.0
            cos = (self.q @ m.T) / self.qn[:, None] / mn[None, :]
            if round_to is not None:
                cos = np.round(cos, round_to)
            nq = self.q.shape[0]
            kk = min(k, ids.size)
            out_q, out_id, out_s = [], [], []
            for qi in range(nq):  # local top-k partial per batch (combiner)
                order = np.lexsort((ids, -cos[qi]))[:kk]
                out_q.append(np.full(kk, qi, dtype=np.int64))
                out_id.append(ids[order])
                out_s.append(cos[qi][order])
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
                    "score": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    partials = ds.select_columns([id_col, vec_col]).map_batches(
        Score, batch_format="pyarrow", concurrency=pool_size(8)
    )
    pdf = partials.to_pandas()  # k rows per (query, batch): tiny
    out = []
    for qi, g in pdf.groupby("query_id"):
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        out.append(g)
    res = pd.concat(out, ignore_index=True)
    return res[["query_id", "rank", "vec_id", "score"]]


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng([seed, dim, n_bits])
    return rng.standard_normal((n_bits, dim))


def lsh_bucket(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Random-hyperplane signature -> int64 bucket id per vector."""
    bits = (vecs @ planes.T) > 0
    weights = (np.uint64(1) << np.arange(planes.shape[0], dtype=np.uint64))
    return (
        splitmix64(bits.astype(np.uint64) @ weights)
        .astype(np.int64)
    )


def build_lsh_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    *,
    n_bits: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Persist a bucket-PARTITIONED ANN index: each vector is written once
    per table under ``tbl=<t>/bucket=<b>/`` (hive partitioning).  Queries
    then read ONLY their matching bucket directories (partition pruning in
    the parquet read) instead of scanning every vector per batch — the
    sublinear-scan path that matters when the vector table outgrows a
    full scan per query batch."""
    import os

    done = os.path.join(index_dir, "_SUCCESS")
    if os.path.exists(done):
        return index_dir

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # empty batch: keep schema, skip the matrix
            empty = pa.array([], pa.int64())
            return batch.append_column("tbl", empty).append_column("bucket", empty)
        vecs = _as_matrix(batch[vec_col])
        out = []
        for t in range(n_tables):
            planes = _hyperplanes(vecs.shape[1], n_bits, seed=42 + t)
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
    tagged.write_parquet(index_dir, partition_cols=["tbl", "bucket"])
    with open(done, "w") as f:
        f.write("ok")
    return index_dir


def knn_lsh_indexed(
    index_dir: str,
    queries: np.ndarray,
    *,
    k: int = 10,
    n_bits: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    override_num_blocks: int | None = None,
) -> pd.DataFrame:
    """Approximate cosine top-k over a :func:`build_lsh_index` directory:
    compute the query buckets, read ONLY those partitions (pruned read),
    dedup candidates that match in several tables, score + merge.

    Same bucket semantics as :func:`knn_lsh` (identical results); the
    difference is WHAT IS READ — matching bucket PARTITION DIRECTORIES
    only (path-level pruning via ``partition_filter``: non-matching files
    are never opened), not the table.
    """
    import ray.data as rd
    from ray.data.datasource.partitioning import PathPartitionFilter

    q = np.asarray(queries, dtype=np.float64)
    dim = q.shape[1]
    wanted: set[tuple[int, int]] = set()
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_bits, seed=42 + t)
        for b in lsh_bucket(q, planes).tolist():
            wanted.add((t, int(b)))

    def keep(partitions: dict) -> bool:
        # non-partition paths (the _SUCCESS marker) carry no partition kv
        if "tbl" not in partitions or "bucket" not in partitions:
            return False
        return (int(partitions["tbl"]), int(partitions["bucket"])) in wanted

    cand = rd.read_parquet(
        index_dir,
        partition_filter=PathPartitionFilter.of(keep),
        file_extensions=["parquet"],
        override_num_blocks=override_num_blocks,
    )
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    # qb[t, qi] = query qi's bucket in table t — rows are per-(table,
    # bucket) partitions, so the per-row candidate mask is a direct compare
    qb = np.stack(
        [lsh_bucket(q, _hyperplanes(dim, n_bits, seed=42 + t)) for t in range(n_tables)]
    )
    qref = ray.put((q, qn, qb))

    class Score:
        def __init__(self):
            self.q, self.qn, self.qb = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _empty_partial()
            ids = batch[id_col].to_numpy()
            m = _as_matrix(batch[vec_col])
            mn = np.linalg.norm(m, axis=1)
            mn[mn == 0] = 1.0
            # partition cols may read back dictionary/string-typed
            trow = np.array([int(x) for x in batch["tbl"].to_pylist()], dtype=np.int64)
            brow = np.array([int(x) for x in batch["bucket"].to_pylist()], dtype=np.int64)
            # mask[qi, r]: row r's (tbl, bucket) is query qi's bucket there
            mask = self.qb[trow, :].T == brow[None, :]
            cos = (self.q @ m.T) / self.qn[:, None] / mn[None, :]
            cos = np.round(cos, 6)
            out_q, out_id, out_s = [], [], []
            for qi in range(self.q.shape[0]):
                cols = np.flatnonzero(mask[qi])
                if cols.size == 0:
                    continue
                # a vector matching this query in several tables appears once
                # per tbl= partition; when Ray bundles those partitions into
                # one batch the copies (identical id+score) would otherwise
                # occupy several of the kk slots and evict a distinct
                # candidate the driver dedup can't recover — keep one copy
                # per vec_id BEFORE the partial top-k
                _, first = np.unique(ids[cols], return_index=True)
                cols = cols[first]
                # per-batch top-k partial (combiner): the driver merge sees
                # k rows per (query, batch), never the full candidate set
                kk = min(k, cols.size)
                order = np.lexsort((ids[cols], -cos[qi][cols]))[:kk]
                sel = cols[order]
                out_q.append(np.full(kk, qi, dtype=np.int64))
                out_id.append(ids[sel])
                out_s.append(cos[qi][sel])
            if not out_q:
                return _empty_partial()
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
                    "score": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    partials = cand.map_batches(Score, batch_format="pyarrow", concurrency=pool_size(8))
    pdf = partials.to_pandas()
    if pdf.empty:
        return pd.DataFrame(columns=["query_id", "rank", "vec_id", "score"])
    # a vector matching a query in several tables appears once per table:
    # dedup before the final top-k (scores identical across copies)
    pdf = pdf.drop_duplicates(["query_id", "vec_id"])
    out = []
    for qi, g in pdf.groupby("query_id"):
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        out.append(g)
    return pd.concat(out, ignore_index=True)[["query_id", "rank", "vec_id", "score"]]


def kmeans_centroids(
    sample: np.ndarray, n_lists: int, *, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Deterministic Lloyd k-means over a (small, driver-side) sample —
    the IVF coarse quantizer.  Seeded init, fixed iteration count, empty
    clusters keep their previous centroid: a pure function of (sample,
    n_lists, seed), so the serial oracle recomputes identical lists."""
    sample = np.asarray(sample, dtype=np.float64)
    rng = np.random.default_rng([seed, n_lists, sample.shape[1]])
    init = rng.choice(sample.shape[0], size=min(n_lists, sample.shape[0]), replace=False)
    cent = sample[np.sort(init)].copy()
    for _ in range(iters):
        assign = _pairwise_d2(sample, cent).argmin(axis=1)
        for c in range(cent.shape[0]):
            members = sample[assign == c]
            if members.size:
                cent[c] = members.mean(axis=0)
    return cent


def ivf_assign(vecs: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest-centroid list id per vector (ties -> lowest id).

    Matmul distance form ‖x‖² − 2x·cᵀ + ‖c‖²: O(n·k) memory instead of the
    (n, k, d) broadcast intermediate, so raising ``n_lists`` doesn't blow
    up per-batch memory.  argmin over the constant-per-row ‖x‖² term is
    unaffected, but the spec value is the full distance."""
    vecs = np.asarray(vecs, dtype=np.float64)
    centroids = np.asarray(centroids, dtype=np.float64)
    return _pairwise_d2(vecs, centroids).argmin(axis=1).astype(np.int64)


def build_ivf_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    *,
    n_lists: int = 16,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """IVF index: k-means coarse quantizer over a sample, then every
    vector written ONCE under its nearest list's partition dir
    (``list_id=<c>/``).  Queries probe only the ``n_probe`` nearest
    lists' partitions — the classic inverted-file ANN layout, here as
    hive-partitioned parquet + path-pruned reads.  Centroids persist
    beside the data so query time recomputes nothing."""
    import os

    done = os.path.join(index_dir, "_SUCCESS")
    if os.path.exists(done):
        return index_dir
    sample_rows = ds.select_columns([id_col, vec_col]).take(sample_size)
    sample_rows.sort(key=lambda r: r[id_col])
    sample = np.array([r[vec_col] for r in sample_rows], dtype=np.float64)
    cent = kmeans_centroids(sample, n_lists)
    cref = ray.put(cent)

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("list_id", pa.array([], pa.int64()))
        c = ray.get(cref)
        vecs = _as_matrix(batch[vec_col])
        return pa.table(
            {
                id_col: batch[id_col],
                vec_col: batch[vec_col],
                "list_id": pa.array(ivf_assign(vecs, c)),
            }
        )

    tagged = ds.select_columns([id_col, vec_col]).map_batches(
        tag, batch_format="pyarrow"
    )
    tagged.write_parquet(index_dir, partition_cols=["list_id"])
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    with open(done, "w") as f:
        f.write("ok")
    return index_dir


def knn_ivf(
    index_dir: str,
    queries: np.ndarray,
    *,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Approximate cosine top-k over a :func:`build_ivf_index` directory:
    per query pick the ``n_probe`` nearest lists (by centroid L2), read
    ONLY those partitions (path-pruned), score candidates whose list is
    probed by that query, merge."""
    import os

    import ray.data as rd
    from ray.data.datasource.partitioning import PathPartitionFilter

    q = np.asarray(queries, dtype=np.float64)
    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    # n_probe nearest lists per query, deterministic ties by list id
    probes = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
    wanted = {int(c) for row in probes for c in row}

    def keep(partitions: dict) -> bool:
        return "list_id" in partitions and int(partitions["list_id"]) in wanted

    cand = rd.read_parquet(
        index_dir,
        partition_filter=PathPartitionFilter.of(keep),
        file_extensions=["parquet"],
    )
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    probe_sets = [set(int(c) for c in row) for row in probes]
    qref = ray.put((q, qn, probe_sets))

    class Score:
        def __init__(self):
            self.q, self.qn, self.probes = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _empty_partial()
            ids = batch[id_col].to_numpy()
            m = _as_matrix(batch[vec_col])
            mn = np.linalg.norm(m, axis=1)
            mn[mn == 0] = 1.0
            lrow = np.array([int(x) for x in batch["list_id"].to_pylist()])
            cos = (self.q @ m.T) / self.qn[:, None] / mn[None, :]
            cos = np.round(cos, 6)
            out_q, out_id, out_s = [], [], []
            for qi in range(self.q.shape[0]):
                cols = np.flatnonzero(
                    np.isin(lrow, np.array(sorted(self.probes[qi]), dtype=np.int64))
                )
                if cols.size == 0:
                    continue
                # per-batch top-k partial (combiner) — see knn_lsh_indexed
                kk = min(k, cols.size)
                order = np.lexsort((ids[cols], -cos[qi][cols]))[:kk]
                sel = cols[order]
                out_q.append(np.full(kk, qi, dtype=np.int64))
                out_id.append(ids[sel])
                out_s.append(cos[qi][sel])
            if not out_q:
                return _empty_partial()
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
                    "score": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    partials = cand.map_batches(Score, batch_format="pyarrow", concurrency=pool_size(8))
    pdf = partials.to_pandas()
    if pdf.empty:
        return pd.DataFrame(columns=["query_id", "rank", "vec_id", "score"])
    out = []
    for qi, g in pdf.groupby("query_id"):
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        out.append(g)
    return pd.concat(out, ignore_index=True)[["query_id", "rank", "vec_id", "score"]]


def knn_lsh(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    *,
    k: int = 10,
    n_bits: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """LSH-bucketed approximate cosine top-k (scale path).

    Each vector lands in ``n_tables`` buckets (independent hyperplane
    sets); a query scores only vectors sharing a bucket.  Implemented as a
    bucket-tagging map_batches + in-actor scoring of the bucket-filtered
    rows; the cross-table union + final top-k is a small driver-side merge.
    """
    q = np.asarray(queries, dtype=np.float64)
    dim = q.shape[1]
    plane_sets = [_hyperplanes(dim, n_bits, seed=42 + t) for t in range(n_tables)]
    q_buckets = [lsh_bucket(q, p) for p in plane_sets]  # per table: (nq,)
    wanted = [set(b.tolist()) for b in q_buckets]
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    ref = ray.put((q, qn, plane_sets, q_buckets, wanted))

    class BucketScore:
        def __init__(self):
            (self.q, self.qn, self.planes, self.qb, self.wanted) = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _empty_partial()
            ids = batch[id_col].to_numpy()
            m = _as_matrix(batch[vec_col])
            mn = np.linalg.norm(m, axis=1)
            mn[mn == 0] = 1.0
            cand_mask = np.zeros((self.q.shape[0], ids.size), dtype=bool)
            for t, planes in enumerate(self.planes):
                vb = lsh_bucket(m, planes)
                cand_mask |= self.qb[t][:, None] == vb[None, :]
            out_q, out_id, out_s = [], [], []
            for qi in range(self.q.shape[0]):
                cols = np.flatnonzero(cand_mask[qi])
                if cols.size == 0:
                    continue
                cos = (m[cols] @ self.q[qi]) / mn[cols] / self.qn[qi]
                cos = np.round(cos, 6)
                kk = min(k, cols.size)
                order = np.lexsort((ids[cols], -cos))[:kk]
                out_q.append(np.full(kk, qi, dtype=np.int64))
                out_id.append(ids[cols][order])
                out_s.append(cos[order])
            if not out_q:
                return _empty_partial()
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
                    "score": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    partials = ds.select_columns([id_col, vec_col]).map_batches(
        BucketScore, batch_format="pyarrow", concurrency=pool_size(8)
    )
    pdf = partials.to_pandas()
    if pdf.empty:
        return pd.DataFrame(columns=["query_id", "rank", "vec_id", "score"])
    out = []
    for qi, g in pdf.groupby("query_id"):
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        out.append(g)
    return pd.concat(out, ignore_index=True)[["query_id", "rank", "vec_id", "score"]]


def mmr_select(
    rel: dict[int, float],
    ids: list[int],
    sim: np.ndarray,
    k: int,
    lam: float,
) -> list[tuple[int, int, float]]:
    """Greedy Maximal Marginal Relevance selection (Carbonell &
    Goldstein, SIGIR 1998) — THE pinned kernel shared by the engine
    entry and the single-process reference (the ``_hyperplanes``
    pattern: one implementation IS the spec).  ``rel`` maps doc ->
    round-6 relevance, ``sim`` is the round-6 pairwise cosine matrix
    aligned with ``ids``; picks up to ``k`` docs by
    ``lam * rel(d) - (1 - lam) * max_{s in S} sim(d, s)`` with ties
    ``(objective DESC, doc_id ASC)``; the first pick carries no
    similarity penalty.  Returns ``[(rank, doc_id, round(obj, 6))]``."""
    pos = {d: i for i, d in enumerate(ids)}
    selected: list[int] = []
    remaining = list(ids)
    out: list[tuple[int, int, float]] = []
    while remaining and len(selected) < k:
        best = None
        for d in remaining:
            ms = (
                max(sim[pos[d], pos[s]] for s in selected)
                if selected
                else 0.0
            )
            obj = lam * rel[d] - (1.0 - lam) * ms
            key = (-obj, d)
            if best is None or key < best[0]:
                best = (key, d, obj)
        _key, d, obj = best
        selected.append(d)
        remaining.remove(d)
        out.append((len(selected), d, round(obj, 6)))
    return out


# -------------------------- int8 scalar quantization (memory-scale path)

# Bump when the SQ spec changes (train rule / encode rounding) — baked
# into pinned-oracle fingerprints like ANN_VERSION.
SQ8_VERSION = "sq8-v1"


def sq8_train(sample: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (mins, scales) from a training sample: code c
    reconstructs to ``mins + c * scales`` with c in 0..255.  Zero-range
    dimensions get scale 1 (codes 0, exact reconstruction)."""
    mins = sample.min(axis=0).astype(np.float64)
    rng = sample.max(axis=0).astype(np.float64) - mins
    scales = np.where(rng > 0, rng / 255.0, 1.0)
    return mins, scales


def sq8_encode(vecs: np.ndarray, mins: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """uint8 codes: round((v - min) / scale) clipped to [0, 255].  Values
    outside the training range saturate (standard SQ behavior)."""
    c = np.rint((np.asarray(vecs, dtype=np.float64) - mins) / scales)
    return np.clip(c, 0, 255).astype(np.uint8)


def sq8_decode(codes: np.ndarray, mins: np.ndarray, scales: np.ndarray) -> np.ndarray:
    return mins + codes.astype(np.float64) * scales


def build_sq8_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    *,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Persist an int8 scalar-quantized copy of the vector table: one
    ``codes`` BINARY column (dim bytes/vector — 4× smaller than float32,
    8× than float64), per-dimension (mins, scales) params beside it.

    This is the MEMORY-scale ANN path: a 10^12 × 256-dim float32 corpus
    is 1 PB; SQ8 cuts the scanned/shipped bytes 4× with ~1% recall loss
    (public FAISS/Lucene SQ behavior).  Same train-sample rule as IVF
    (first ``sample_size`` rows in file order, sorted by id) so the
    serial pinned oracle can reproduce the params exactly."""
    import os

    done = os.path.join(index_dir, "_SUCCESS")
    if os.path.exists(done):
        return index_dir
    sample_rows = ds.select_columns([id_col, vec_col]).take(sample_size)
    sample_rows.sort(key=lambda r: r[id_col])
    sample = np.array([r[vec_col] for r in sample_rows], dtype=np.float64)
    mins, scales = sq8_train(sample)
    pref = ray.put((mins, scales))

    def enc(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "codes": pa.array([], pa.binary())}
            )
        mn, sc = ray.get(pref)
        codes = sq8_encode(_as_matrix(batch[vec_col]), mn, sc)
        return pa.table(
            {
                id_col: batch[id_col],
                "codes": pa.array(
                    [c.tobytes() for c in codes], pa.binary()
                ),
            }
        )

    ds.select_columns([id_col, vec_col]).map_batches(
        enc, batch_format="pyarrow"
    ).write_parquet(index_dir)
    np.save(os.path.join(index_dir, "sq8_mins.npy"), mins)
    np.save(os.path.join(index_dir, "sq8_scales.npy"), scales)
    with open(done, "w") as f:
        f.write("ok")
    return index_dir


def knn_sq8(
    index_dir: str,
    queries: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> pd.DataFrame:
    """Asymmetric SQ top-k over a :func:`build_sq8_index` directory:
    float queries vs decoded int8 codes (decode is one fused
    ``codes * scale + min`` per batch, then the same matmul-cosine +
    per-batch top-k combiner as :func:`knn_brute`).  Reads ONLY the
    4×-smaller codes table — the float vectors are never touched."""
    import os

    import ray.data as rd

    mins = np.load(os.path.join(index_dir, "sq8_mins.npy"))
    scales = np.load(os.path.join(index_dir, "sq8_scales.npy"))
    q = np.asarray(queries, dtype=np.float64)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    qref = ray.put((q, qn, mins, scales))

    class Score:
        def __init__(self):
            self.q, self.qn, self.mins, self.scales = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _empty_partial()
            ids = batch[id_col].to_numpy()
            raw = batch["codes"].combine_chunks()
            dim = self.mins.size
            codes = _codes_matrix(raw, ids.size, dim)
            m = sq8_decode(codes, self.mins, self.scales)
            mn = np.linalg.norm(m, axis=1)
            mn[mn == 0] = 1.0
            cos = (self.q @ m.T) / self.qn[:, None] / mn[None, :]
            if round_to is not None:
                cos = np.round(cos, round_to)
            kk = min(k, ids.size)
            out_q, out_id, out_s = [], [], []
            for qi in range(self.q.shape[0]):
                order = np.lexsort((ids, -cos[qi]))[:kk]
                out_q.append(np.full(kk, qi, dtype=np.int64))
                out_id.append(ids[order])
                out_s.append(cos[qi][order])
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
                    "score": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    partials = rd.read_parquet(
        index_dir, file_extensions=["parquet"]
    ).map_batches(Score, batch_format="pyarrow", concurrency=pool_size(8))
    pdf = partials.to_pandas()
    out = []
    for qi, g in pdf.groupby("query_id"):
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        out.append(g)
    res = pd.concat(out, ignore_index=True)
    return res[["query_id", "rank", "vec_id", "score"]]


# ----------------------------------------------- product quantization (ADC)

PQ_VERSION = "pq-v1"


def pq_train(
    sample: np.ndarray, *, m: int = 8, ks: int = 16, iters: int = 10
) -> np.ndarray:
    """Per-subspace codebooks (Jégou et al. 2011, TPAMI): split the dim
    into ``m`` contiguous subspaces and run the repo's deterministic
    Lloyd k-means (:func:`kmeans_centroids` — seeded init, fixed
    iterations) independently in each.  Returns (m, ks, dim/m)."""
    sample = np.asarray(sample, dtype=np.float64)
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sd = dim // m
    return np.stack(
        [
            kmeans_centroids(sample[:, j * sd : (j + 1) * sd], ks, iters=iters)
            for j in range(m)
        ]
    )


def pq_encode(vecs: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes: nearest codebook entry per subspace (ties ->
    lowest code, same rule as ivf_assign)."""
    vecs = np.asarray(vecs, dtype=np.float64)
    m, _, sd = books.shape
    codes = np.empty((vecs.shape[0], m), dtype=np.uint8)
    for j in range(m):
        codes[:, j] = _pairwise_d2(
            vecs[:, j * sd : (j + 1) * sd], books[j]
        ).argmin(axis=1)
    return codes


def pq_decode(codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    m, _, sd = books.shape
    return np.concatenate([books[j][codes[:, j]] for j in range(m)], axis=1)


def build_pq_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    *,
    m: int = 8,
    ks: int = 16,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Persist the product-quantized copy of the vector table: one
    ``codes`` BINARY column of m bytes/vector — with m=8 over 64-dim
    float32 that is 32× smaller than the raw vectors, the FAISS IVF-PQ
    memory-scale regime (a 10^12-vector corpus's codes fit in ~8 TB
    where the floats need 256 TB).  Same deterministic train-sample rule
    as IVF/SQ8 (first ``sample_size`` rows in file order, sorted by id)
    so the pinned serial oracle reproduces the codebooks exactly."""
    import os

    done = os.path.join(index_dir, "_SUCCESS")
    if os.path.exists(done):
        return index_dir
    sample_rows = ds.select_columns([id_col, vec_col]).take(sample_size)
    sample_rows.sort(key=lambda r: r[id_col])
    sample = np.array([r[vec_col] for r in sample_rows], dtype=np.float64)
    books = pq_train(sample, m=m, ks=ks)
    bref = ray.put(books)

    def enc(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "codes": pa.array([], pa.binary())}
            )
        b = ray.get(bref)
        codes = pq_encode(_as_matrix(batch[vec_col]), b)
        return pa.table(
            {
                id_col: batch[id_col],
                "codes": pa.array([c.tobytes() for c in codes], pa.binary()),
            }
        )

    ds.select_columns([id_col, vec_col]).map_batches(
        enc, batch_format="pyarrow"
    ).write_parquet(index_dir)
    np.save(os.path.join(index_dir, "pq_books.npy"), books)
    with open(done, "w") as f:
        f.write("ok")
    return index_dir


def knn_pq(
    index_dir: str,
    queries: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> pd.DataFrame:
    """Asymmetric-distance (ADC) cosine top-k over a
    :func:`build_pq_index` directory: per query, ONE (m, ks) dot-product
    lookup table (query subvector x codebook) and one query-independent
    (m, ks) squared-norm table — scoring a batch is m fancy-indexed
    gathers + adds per query, NO decode, NO per-vector float math.
    Accumulation runs subspace-ascending so the pinned serial reference
    (decode + per-subspace dot, same order) reproduces the floats."""
    import os

    import ray.data as rd

    books = np.load(os.path.join(index_dir, "pq_books.npy"))
    q = np.asarray(queries, dtype=np.float64)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    m, ks, sd = books.shape
    # dot tables: dot_t[qi, j, c] = q_sub(qi, j) . books[j, c]
    dot_t = np.stack(
        [q[:, j * sd : (j + 1) * sd] @ books[j].T for j in range(m)], axis=1
    )
    norm_t = (books ** 2).sum(axis=2)  # (m, ks)
    qref = ray.put((dot_t, norm_t, qn))

    class Score:
        def __init__(self):
            self.dot_t, self.norm_t, self.qn = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _empty_partial()
            ids = batch[id_col].to_numpy()
            raw = batch["codes"].combine_chunks()
            mm = self.norm_t.shape[0]
            codes = _codes_matrix(raw, ids.size, mm)
            nq = self.dot_t.shape[0]
            dot = np.zeros((nq, ids.size), dtype=np.float64)
            nrm2 = np.zeros(ids.size, dtype=np.float64)
            for j in range(mm):
                cj = codes[:, j]
                dot += self.dot_t[:, j, :][:, cj]
                nrm2 += self.norm_t[j][cj]
            dn = np.sqrt(nrm2)
            dn[dn == 0] = 1.0
            cos = dot / self.qn[:, None] / dn[None, :]
            if round_to is not None:
                cos = np.round(cos, round_to)
            kk = min(k, ids.size)
            out_q, out_id, out_s = [], [], []
            for qi in range(nq):
                order = np.lexsort((ids, -cos[qi]))[:kk]
                out_q.append(np.full(kk, qi, dtype=np.int64))
                out_id.append(ids[order])
                out_s.append(cos[qi][order])
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
                    "score": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    partials = rd.read_parquet(
        index_dir, file_extensions=["parquet"]
    ).map_batches(Score, batch_format="pyarrow", concurrency=pool_size(8))
    pdf = partials.to_pandas()
    out = []
    for qi, g in pdf.groupby("query_id"):
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        out.append(g)
    res = pd.concat(out, ignore_index=True)
    return res[["query_id", "rank", "vec_id", "score"]]


def build_ivfpq_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    *,
    n_lists: int = 16,
    m: int = 8,
    ks: int = 16,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """The full FAISS-style IVF-PQ layout: a k-means coarse quantizer
    routes every vector to a ``list_id=<c>/`` partition, and within the
    partition only the m-byte PQ code of the RESIDUAL (vector minus its
    list centroid) is stored — the composition that serves 10^12-vector
    corpora (codes ~m bytes/vector, probes read only n_probe partitions).

    Residual encoding (Jégou et al. 2011 §IV): PQ codebooks are trained
    on residuals of the sample, so the quantization error is the
    within-list spread, not the global spread.  Same deterministic
    sample rule as IVF/SQ8/PQ."""
    import os

    done = os.path.join(index_dir, "_SUCCESS")
    if os.path.exists(done):
        return index_dir
    sample_rows = ds.select_columns([id_col, vec_col]).take(sample_size)
    sample_rows.sort(key=lambda r: r[id_col])
    sample = np.array([r[vec_col] for r in sample_rows], dtype=np.float64)
    cent = kmeans_centroids(sample, n_lists)
    books = pq_train(sample - cent[ivf_assign(sample, cent)], m=m, ks=ks)
    pref = ray.put((cent, books))

    def enc(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "codes": pa.array([], pa.binary()),
                    "list_id": pa.array([], pa.int64()),
                }
            )
        c, b = ray.get(pref)
        vecs = _as_matrix(batch[vec_col])
        lists = ivf_assign(vecs, c)
        codes = pq_encode(vecs - c[lists], b)
        return pa.table(
            {
                id_col: batch[id_col],
                "codes": pa.array([x.tobytes() for x in codes], pa.binary()),
                "list_id": pa.array(lists, pa.int64()),
            }
        )

    ds.select_columns([id_col, vec_col]).map_batches(
        enc, batch_format="pyarrow"
    ).write_parquet(index_dir, partition_cols=["list_id"])
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    np.save(os.path.join(index_dir, "pq_books.npy"), books)
    with open(done, "w") as f:
        f.write("ok")
    return index_dir


def knn_ivfpq(
    index_dir: str,
    queries: np.ndarray,
    *,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> pd.DataFrame:
    """ADC cosine top-k over a :func:`build_ivfpq_index` directory: per
    query, probe the ``n_probe`` nearest lists (path-pruned partition
    read, like :func:`knn_ivf`), reconstruct scores from PER-LIST lookup
    tables over residual codebooks — dot(q, centroid + residual) =
    dot(q, centroid) + table-gathered residual dot; the vector norm is
    |centroid|² + 2·centroid·residual + |residual|², all from (list,
    code)-indexed tables.  No decode, no per-vector float math."""
    import os

    import ray.data as rd
    from ray.data.datasource.partitioning import PathPartitionFilter

    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    books = np.load(os.path.join(index_dir, "pq_books.npy"))
    q = np.asarray(queries, dtype=np.float64)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    m, ks, sd = books.shape
    d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
    wanted = {int(c) for row in probes for c in row}
    probe_mat = np.zeros((q.shape[0], cent.shape[0]), dtype=bool)
    for qi, row in enumerate(probes):
        probe_mat[qi, row] = True
    # query-side tables
    q_dot_res = np.stack(
        [q[:, j * sd : (j + 1) * sd] @ books[j].T for j in range(m)], axis=1
    )  # (nq, m, ks): q . residual piece
    q_dot_cent = q @ cent.T  # (nq, n_lists)
    # data-side tables (query-independent)
    res_norm2 = (books ** 2).sum(axis=2)  # (m, ks)
    cent_norm2 = (cent ** 2).sum(axis=1)  # (n_lists,)
    cent_dot_res = np.stack(
        [cent[:, j * sd : (j + 1) * sd] @ books[j].T for j in range(m)], axis=1
    )  # (n_lists, m, ks)
    ref = ray.put(
        (q_dot_res, q_dot_cent, res_norm2, cent_norm2, cent_dot_res, qn,
         probe_mat)
    )

    def keep(partitions: dict) -> bool:
        return "list_id" in partitions and int(partitions["list_id"]) in wanted

    class Score:
        def __init__(self):
            (self.q_dot_res, self.q_dot_cent, self.res_norm2,
             self.cent_norm2, self.cent_dot_res, self.qn,
             self.probes) = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _empty_partial()
            ids = batch[id_col].to_numpy()
            lists = batch["list_id"].to_numpy().astype(np.int64)
            mm = self.res_norm2.shape[0]
            raw = batch["codes"].combine_chunks()
            codes = _codes_matrix(raw, ids.size, mm)
            nq = self.q_dot_res.shape[0]
            res_dot_q = np.zeros((nq, ids.size))
            nrm2 = self.cent_norm2[lists].copy()
            for j in range(mm):
                cj = codes[:, j]
                res_dot_q += self.q_dot_res[:, j, :][:, cj]
                nrm2 += 2.0 * self.cent_dot_res[lists, j, cj]
                nrm2 += self.res_norm2[j][cj]
            dot = self.q_dot_cent[:, lists] + res_dot_q
            dn = np.sqrt(nrm2)
            dn[dn == 0] = 1.0
            cos = dot / self.qn[:, None] / dn[None, :]
            if round_to is not None:
                cos = np.round(cos, round_to)
            kk = min(k, ids.size)
            out_q, out_id, out_s = [], [], []
            for qi in range(nq):
                mask = self.probes[qi][lists]  # vectorized probe gate
                if not mask.any():
                    continue
                cq = cos[qi][mask]
                iq = ids[mask]
                order = np.lexsort((iq, -cq))[:kk]
                out_q.append(np.full(order.size, qi, dtype=np.int64))
                out_id.append(iq[order])
                out_s.append(cq[order])
            if not out_q:
                return _empty_partial()
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
                    "score": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    partials = rd.read_parquet(
        index_dir,
        partition_filter=PathPartitionFilter.of(keep),
        file_extensions=["parquet"],
    ).map_batches(Score, batch_format="pyarrow", concurrency=pool_size(8))
    pdf = partials.to_pandas()
    out = []
    for qi, g in pdf.groupby("query_id"):
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        out.append(g)
    if not out:
        return pd.DataFrame(
            columns=["query_id", "rank", "vec_id", "score"]
        ).astype({"query_id": np.int64, "rank": np.int32,
                  "vec_id": np.int64, "score": np.float64})
    res = pd.concat(out, ignore_index=True)
    return res[["query_id", "rank", "vec_id", "score"]]


# ----------------------------------------------------------- binary hamming

_POPCNT8 = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1
).sum(axis=1).astype(np.uint8)


def binarize_signs(m: np.ndarray) -> np.ndarray:
    """Sign-binarize float vectors into packed uint64 words (Charikar
    2002 hyperplane-LSH codes with the identity projection basis:
    bit i = 1 iff x[i] >= 0).  dim must be a multiple of 64; returns
    shape (n, dim // 64) uint64."""
    n, d = m.shape
    if d % 64:
        raise ValueError(f"dim {d} not a multiple of 64")
    bits = (m >= 0).astype(np.uint8)
    packed = np.packbits(bits, axis=1, bitorder="little")
    return packed.view(np.uint64).reshape(n, d // 64)


def _hamming(words: np.ndarray, qwords: np.ndarray) -> np.ndarray:
    """Pairwise Hamming distances: (n, w) x (m, w) uint64 -> (m, n)
    int64 via one XOR broadcast + a 256-entry popcount LUT over the
    byte view (numpy 1.26 has no bitwise_count)."""
    x = qwords[:, None, :] ^ words[None, :, :]
    by = x.view(np.uint8)
    return _POPCNT8[by].sum(axis=2, dtype=np.int64)


def knn_hamming(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact Hamming top-k over sign-binarized vectors -> DataFrame
    (query_id, rank, vec_id, hamming), ties (hamming asc, vec_id asc).
    The binary codes are 64x smaller than float64 vectors — the memory
    form a 100-TB embedding store actually serves candidate generation
    from; distances are integers, so there is NO cross-engine float
    policy at all.  Same shape as knn_brute: per-batch partial top-k
    combiner, one tiny driver merge."""
    qwords = binarize_signs(np.asarray(queries, dtype=np.float64))
    qref = ray.put(qwords)

    class Score:
        def __init__(self):
            self.qw = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                })
            ids = batch[id_col].to_numpy()
            words = binarize_signs(_as_matrix(batch[vec_col]))
            d = _hamming(words, self.qw)
            nq = self.qw.shape[0]
            kk = min(k, ids.size)
            out_q, out_id, out_d = [], [], []
            for qi in range(nq):  # local top-k partial (combiner)
                order = np.lexsort((ids, d[qi]))[:kk]
                out_q.append(np.full(kk, qi, dtype=np.int64))
                out_id.append(ids[order])
                out_d.append(d[qi][order])
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
                "hamming": pa.array(np.concatenate(out_d), pa.int64()),
            })

    partials = ds.select_columns([id_col, vec_col]).map_batches(
        Score, batch_format="pyarrow", concurrency=pool_size(8)
    )
    pdf = partials.to_pandas()
    out = []
    for _qi, g in pdf.groupby("query_id"):
        g = g.sort_values(["hamming", "vec_id"],
                          ascending=[True, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        out.append(g)
    res = pd.concat(out, ignore_index=True)
    return res[["query_id", "rank", "vec_id", "hamming"]]


def pm2_select(
    window: list[tuple[float, int]],
    aspects: dict[int, str],
    k: int,
    lam: float = 0.7,
) -> list[tuple[int, int, str, float]]:
    """Greedy PM-2 proportional diversification (Dang & Croft, WSDM
    2012) — the pinned kernel shared by the engine entry and the
    single-process reference, like :func:`mmr_select`.  ``window`` is
    the round-6 (relevance, doc_id) candidate list; ``aspects`` maps
    doc -> its single aspect label (binary membership).

    Pinned simplifications that ARE the spec here: aspect popularity is
    UNIFORM over the aspects present in the window (v_i = 1/|A|);
    P(d|i) = rel(d)/max_rel if aspect(d) == i else 0; and with binary
    single-aspect membership the canonical seat update
    ``s_j += qt_j P(d*|j) / sum_l qt_l P(d*|l)`` collapses to
    ``s_{aspect(d*)} += 1`` (the chosen doc's whole seat goes to its
    own aspect).  Per round: quotient qt_i = v_i / (2 s_i + 1); the
    seat aspect i* is argmax qt (ties: lexicographically smallest
    aspect); the doc maximizes ``lam*qt_{i*}*P(d|i*) +
    (1-lam)*sum_{j != i*} qt_j*P(d|j)`` — for single-aspect docs,
    ``(lam if aspect(d) == i* else 1-lam) * qt_{aspect(d)} * P(d)`` —
    with ties (objective DESC, doc_id ASC).  Returns
    ``[(rank, doc_id, aspect, round(obj, 6))]``."""
    if not window:
        return []
    asp = sorted({aspects[d] for _s, d in window})
    v = 1.0 / len(asp)
    seats = {a: 0.0 for a in asp}
    max_rel = max(s for s, _d in window)
    if max_rel <= 0:
        max_rel = 1.0
    remaining = list(window)
    out: list[tuple[int, int, str, float]] = []
    while remaining and len(out) < k:
        qt = {a: v / (2.0 * seats[a] + 1.0) for a in asp}
        istar = sorted(asp, key=lambda a: (-qt[a], a))[0]
        best = None
        for s, d in remaining:
            a = aspects[d]
            p = s / max_rel
            obj = (lam if a == istar else 1.0 - lam) * qt[a] * p
            key = (-obj, d)
            if best is None or key < best[0]:
                best = (key, s, d, a, obj)
        _key, s, d, a, obj = best
        seats[a] += 1.0
        remaining.remove((s, d))
        out.append((len(out) + 1, d, a, round(obj, 6)))
    return out


# ---------------------------------------------------------------------------
# Graph ANN: partitioned small-world graph (HNSW/Vamana class)
# ---------------------------------------------------------------------------
# The graph-traversal index family (Malkov & Yashunin 2018, HNSW; Subramanya
# et al. 2019, DiskANN) is awkward as pure dataflow — a global graph build is
# inherently sequential.  The at-scale composition used here is the SPANN /
# DiskANN-sharded shape: an IVF coarse quantizer partitions the corpus into
# lists (hive dirs), a deterministic single-layer NSW graph is built PER
# PARTITION inside groupby(list_id).map_groups (each partition's build is
# independent and memory-bounded by the partition), and a query beam-searches
# only its n_probe nearest partitions' graphs instead of scanning them.
# Partitioning assumption: a partition's vectors + adjacency fit one worker
# (same contract as the IVF/IVF-PQ entries); visits per probe are
# ~ef·degree·log|list| vs the full-list scan of knn_ivf.

# bumped when the graph-construction/beam spec changes (pinned goldens
# carry it in their fingerprint)
NSW_VERSION = "nsw-v1"


def _nsw_beam(
    norm: np.ndarray,
    ids: np.ndarray,
    adj: list[list[int]],
    q: np.ndarray,
    *,
    limit: int,
    ef: int,
) -> list[int]:
    """Deterministic best-first beam search over the row-index graph
    ``adj`` restricted to rows ``< limit``, entry row 0.  Returns up to
    ``ef`` row indices ordered by (-cosine, vec_id).  Ties break on
    vec_id everywhere, so build and search are partitioning- and
    run-order-invariant."""
    import heapq

    if limit <= 0:
        return []
    s0 = float(norm[0] @ q)
    visited = {0}
    cand = [(-s0, int(ids[0]), 0)]
    best: list[tuple[float, int, int]] = [(s0, int(ids[0]), 0)]

    def worst() -> float:
        return best[-1][0]

    while cand:
        negs, _tid, u = heapq.heappop(cand)
        if len(best) >= ef and -negs < worst():
            break
        for v in adj[u]:
            if v >= limit or v in visited:
                continue
            visited.add(v)
            sv = float(norm[v] @ q)
            if len(best) < ef or sv > worst() or (
                sv == worst() and int(ids[v]) < best[-1][1]
            ):
                heapq.heappush(cand, (-sv, int(ids[v]), v))
                best.append((sv, int(ids[v]), v))
                best.sort(key=lambda t: (-t[0], t[1]))
                del best[ef:]
    return [v for _s, _i, v in best]


def nsw_build_adjacency(
    ids: np.ndarray,
    vecs: np.ndarray,
    *,
    m: int = 8,
    ef_construction: int = 32,
) -> list[list[int]]:
    """Build one partition's deterministic NSW adjacency (ids ascending =
    insertion order).  Each inserted node links to its ``m`` nearest
    beam-found predecessors; back-links prune to ``2m`` nearest.  Returns
    neighbor VEC IDS per row (aligned to ``ids`` order) — this function
    IS the spec the serial pinned mirror replays."""
    n = len(ids)
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    norm = vecs / norms[:, None]
    adj: list[list[int]] = [[] for _ in range(n)]
    for i in range(1, n):
        found = _nsw_beam(norm, ids, adj, norm[i], limit=i,
                          ef=max(ef_construction, m))
        nbrs = found[:m]
        adj[i] = list(nbrs)
        for u in nbrs:
            adj[u].append(i)
            if len(adj[u]) > 2 * m:
                cand = np.array(adj[u], dtype=np.int64)
                sims = norm[cand] @ norm[u]
                keep = np.lexsort((ids[cand], -np.round(sims, 9)))[: 2 * m]
                adj[u] = [int(cand[j]) for j in keep]
    return [[int(ids[v]) for v in row] for row in adj]


def nsw_search_partition(
    ids: np.ndarray,
    vecs: np.ndarray,
    neighbors: list[list[int]],
    q: np.ndarray,
    *,
    k: int,
    ef_search: int = 48,
) -> list[tuple[int, float]]:
    """Beam-search ONE partition's stored graph for one query: returns up
    to ``k`` (vec_id, rounded cosine) by (-cos, vec_id).  ``neighbors``
    holds vec ids (the stored layout); they are remapped to row indices
    against the partition's ascending id order."""
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    vecs = vecs[order]
    pos = {int(i): j for j, i in enumerate(ids)}
    adj = [[pos[int(v)] for v in neighbors[o]] for o in order]
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    norm = vecs / norms[:, None]
    qn = float(np.linalg.norm(q))
    qv = q / (qn if qn else 1.0)
    rows = _nsw_beam(norm, ids, adj, qv, limit=len(ids),
                     ef=max(ef_search, k))
    scored = [(int(ids[v]), float(np.round(norm[v] @ qv, 6))) for v in rows]
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:k]


def build_nsw_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    *,
    n_lists: int = 8,
    m: int = 8,
    ef_construction: int = 32,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Partitioned small-world graph index: IVF coarse quantizer (same
    spec as :func:`build_ivf_index`) routes each vector to one list dir;
    a deterministic NSW graph is built per list inside
    ``groupby(list_id).map_groups`` (independent, memory-bounded by the
    partition) and stored as hive-partitioned parquet rows
    (vec_id, embedding, neighbors list<int64>) + centroids.npy."""
    import os

    done = os.path.join(index_dir, "_SUCCESS")
    if os.path.exists(done):
        return index_dir
    sample_rows = ds.select_columns([id_col, vec_col]).take(sample_size)
    sample_rows.sort(key=lambda r: r[id_col])
    sample = np.array([r[vec_col] for r in sample_rows], dtype=np.float64)
    cent = kmeans_centroids(sample, n_lists)
    cref = ray.put(cent)

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("list_id", pa.array([], pa.int64()))
        c = ray.get(cref)
        vecs = _as_matrix(batch[vec_col])
        return pa.table(
            {
                id_col: batch[id_col],
                vec_col: batch[vec_col],
                "list_id": pa.array(ivf_assign(vecs, c)),
            }
        )

    def build_graph(group: pa.Table) -> pa.Table:
        order = np.argsort(group[id_col].to_numpy(), kind="stable")
        ids = group[id_col].to_numpy()[order]
        vecs = _as_matrix(group[vec_col])[order]
        nbrs = nsw_build_adjacency(ids, vecs, m=m,
                                   ef_construction=ef_construction)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                vec_col: pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float64())),
                "neighbors": pa.array(nbrs, pa.list_(pa.int64())),
                "list_id": group["list_id"].take(
                    pa.array(order, pa.int64())),
            }
        )

    tagged = ds.select_columns([id_col, vec_col]).map_batches(
        tag, batch_format="pyarrow"
    )
    graphed = tagged.groupby("list_id").map_groups(
        build_graph, batch_format="pyarrow"
    )
    graphed.write_parquet(index_dir, partition_cols=["list_id"])
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    with open(done, "w") as f:
        f.write("ok")
    return index_dir


def knn_nsw(
    index_dir: str,
    queries: np.ndarray,
    *,
    k: int = 10,
    n_probe: int = 2,
    ef_search: int = 48,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Approximate cosine top-k over a :func:`build_nsw_index` directory:
    per query pick the ``n_probe`` nearest lists, path-pruned read of
    ONLY those partitions, then ``groupby(list_id).map_groups`` runs the
    beam search per partition graph for the queries probing it (visits
    ~ef·degree·log|list| nodes instead of scanning the list); the
    k-bounded partials merge on the driver."""
    import os

    import ray.data as rd
    from ray.data.datasource.partitioning import PathPartitionFilter

    q = np.asarray(queries, dtype=np.float64)
    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
    wanted = {int(c) for row in probes for c in row}

    def keep(partitions: dict) -> bool:
        return "list_id" in partitions and int(partitions["list_id"]) in wanted

    cand = rd.read_parquet(
        index_dir,
        partition_filter=PathPartitionFilter.of(keep),
        file_extensions=["parquet"],
    )
    probe_sets = [set(int(c) for c in row) for row in probes]
    qref = ray.put((q, probe_sets))

    def search_group(group: pa.Table) -> pa.Table:
        qm, psets = ray.get(qref)
        lid = int(group["list_id"][0].as_py())
        ids = group[id_col].to_numpy()
        vecs = _as_matrix(group["embedding"])
        nbrs = group["neighbors"].to_pylist()
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            if lid not in psets[qi]:
                continue
            for vid, s in nsw_search_partition(
                ids, vecs, nbrs, qm[qi], k=k, ef_search=ef_search
            ):
                out_q.append(qi)
                out_id.append(vid)
                out_s.append(s)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    partials = cand.groupby("list_id").map_groups(
        search_group, batch_format="pyarrow"
    )
    pdf = partials.to_pandas()
    if pdf.empty:
        return pd.DataFrame(columns=["query_id", "rank", "vec_id", "score"])
    out = []
    for qi, g in pdf.groupby("query_id"):
        g = g.sort_values(["score", "vec_id"],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        out.append(g)
    return pd.concat(out, ignore_index=True)[
        ["query_id", "rank", "vec_id", "score"]]
