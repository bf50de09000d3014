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


def _as_matrix(rows: list[list[float]]) -> np.ndarray:
    return np.array(rows, dtype=np.float64)


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
            ids = batch[id_col].to_numpy()
            m = _as_matrix(batch[vec_col].to_pylist())
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
        Score, batch_format="pyarrow", concurrency=pool_size(2)
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
            ids = batch[id_col].to_numpy()
            m = _as_matrix(batch[vec_col].to_pylist())
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
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "score": pa.array([], pa.float64()),
                    }
                )
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
                    "score": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    partials = ds.select_columns([id_col, vec_col]).map_batches(
        BucketScore, batch_format="pyarrow", concurrency=pool_size(2)
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
