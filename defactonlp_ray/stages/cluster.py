"""Distributed k-means + SemDeDup over the embedding table (SURVEY.md
§2 training-data ops; Abbas et al. 2023 "SemDeDup", Lloyd 1982).

Parallelism-invariant by construction
-------------------------------------
Float summation is not associative, so a naive distributed Lloyd update
(per-block partial float sums reduced on the driver) gives centroids
that depend on block boundaries — different at ``num_cpus=4`` vs ``32``,
which the driver's value-hash gate would catch as flakiness.  The update
rule here is therefore DEFINED over fixed-point integers: each component
is quantized once to ``round(v * 2^20)`` (int64), per-batch partials are
integer sums (exact, commutative, associative), and the new centroid is
``(int_sum / count) / 2^20`` — one float division, identical for every
partitioning of the input.  Same trick for inertia (squared distances
quantized at 1e-6).  The quantization IS the spec, mirrored by the
serial oracle (pipelines/pinned.serial_kmeans) — not an approximation
bolted on afterwards.

Scale notes (100 TB / 10^9+ vectors):
* centroids (k × d float64) broadcast once per iteration via
  ``ray.put`` — read, never re-shipped per batch;
* each iteration is one streaming ``map_batches`` pass emitting k tiny
  partial rows per block (k·n_blocks rows total), reduced on the driver
  by exact integer addition — no all-to-all shuffle anywhere in Lloyd;
* SemDeDup's within-cluster greedy scan is the one ``groupby`` — the
  partitioning assumption is the SemDeDup paper's own: k is chosen so
  clusters are small (n/k vectors each); a hot cluster bounds the
  single-group work, which is why k should scale with n.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from .ann import _as_matrix, _pairwise_d2, kmeans_centroids

KMEANS_VERSION = "kmeans-v1"

_QSHIFT = 20          # component fixed-point: round(v * 2^20)
_QSCALE = float(1 << _QSHIFT)
_D2SCALE = 1.0e6      # inertia fixed-point: round(d2 * 1e6)


def _quantize(vecs: np.ndarray) -> np.ndarray:
    """The spec'd fixed-point view of a vector block (int64)."""
    return np.rint(vecs * _QSCALE).astype(np.int64)


def lloyd_step_serial(
    vecs: np.ndarray, cent: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """One exact-update Lloyd step over an in-memory matrix — THE spec
    both routes share (the distributed route applies it per batch and
    integer-sums the partials; the serial oracle applies it whole).

    Returns (assign, qsums (k,d) int64, counts (k,) int64,
    per-cluster inertia_q (k,) int64)."""
    k = cent.shape[0]
    d2 = _pairwise_d2(vecs, cent)
    assign = d2.argmin(axis=1)                      # ties -> lowest id
    q = _quantize(vecs)
    qsums = np.zeros((k, vecs.shape[1]), dtype=np.int64)
    np.add.at(qsums, assign, q)
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    d2min = np.maximum(d2[np.arange(vecs.shape[0]), assign], 0.0)
    iq = np.rint(d2min * _D2SCALE).astype(np.int64)
    inertia_q = np.zeros(k, dtype=np.int64)
    np.add.at(inertia_q, assign, iq)
    return assign, qsums, counts, inertia_q


def _new_centroids(
    cent: np.ndarray, qsums: np.ndarray, counts: np.ndarray
) -> np.ndarray:
    """Fixed-point mean; empty clusters keep their previous centroid
    (same rule as ann.kmeans_centroids)."""
    out = cent.copy()
    nz = counts > 0
    out[nz] = (qsums[nz] / counts[nz, None]) / _QSCALE
    return out


def init_centroids(sample: np.ndarray, k: int, *, seed: int = 42) -> np.ndarray:
    """Seeded-sample init — ann.kmeans_centroids' init rule verbatim
    (iters=0 short-circuits Lloyd), so IVF and full k-means share one
    pinned init spec."""
    return kmeans_centroids(sample, k, iters=0, seed=seed)


def _driver_sample(ds: "ray.data.Dataset", sample_size: int,
                   id_col: str, vec_col: str) -> np.ndarray:
    """First ``sample_size`` rows in file order, sorted by id — the IVF
    sample rule (stages/ann.build_ivf_index)."""
    rows = ds.select_columns([id_col, vec_col]).take(sample_size)
    rows.sort(key=lambda r: r[id_col])
    return np.array([r[vec_col] for r in rows], dtype=np.float64)


def kmeans_fit(
    ds: "ray.data.Dataset",
    k: int,
    *,
    iters: int = 5,
    sample_size: int = 2048,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, pd.DataFrame]:
    """Distributed Lloyd over the FULL dataset (not just a sample — that
    is what separates this from the IVF coarse quantizer).  Fixed
    iteration count, fixed-point updates: a pure function of
    (table contents, k, iters, seed) at any parallelism.

    Returns (centroids, per-cluster summary df with cluster_id/size/
    inertia after the FINAL assignment)."""
    cent = init_centroids(
        _driver_sample(ds, sample_size, id_col, vec_col), k, seed=seed
    )
    k_eff = cent.shape[0]
    vecs_ds = ds.select_columns([id_col, vec_col])

    def partials(batch: pa.Table, cref) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "cluster_id": pa.array([], pa.int32()),
                    "count": pa.array([], pa.int64()),
                    "inertia_q": pa.array([], pa.int64()),
                    "qsum": pa.array([], pa.list_(pa.int64())),
                }
            )
        c = ray.get(cref)
        vecs = _as_matrix(batch[vec_col])
        _, qsums, counts, per_iq = lloyd_step_serial(vecs, c)
        return pa.table(
            {
                "cluster_id": pa.array(
                    np.arange(c.shape[0], dtype=np.int32)
                ),
                "count": pa.array(counts),
                "inertia_q": pa.array(per_iq),
                "qsum": pa.array(list(qsums)),
            }
        )

    summary: pd.DataFrame | None = None
    for it in range(iters + 1):
        cref = ray.put(cent)
        part = vecs_ds.map_batches(
            lambda b, _c=cref: partials(b, _c), batch_format="pyarrow"
        ).to_pandas()
        counts = np.zeros(k_eff, dtype=np.int64)
        qsums = np.zeros((k_eff, cent.shape[1]), dtype=np.int64)
        inertia_q = np.zeros(k_eff, dtype=np.int64)
        # integer adds commute: any arrival order gives the same sums
        cids = part["cluster_id"].to_numpy()
        np.add.at(counts, cids, part["count"].to_numpy())
        np.add.at(inertia_q, cids, part["inertia_q"].to_numpy())
        qmat = np.array(part["qsum"].to_list(), dtype=np.int64)
        np.add.at(qsums, cids, qmat)
        if it == iters:      # final pass = summary only, no update
            summary = pd.DataFrame(
                {
                    "cluster_id": np.arange(k_eff, dtype=np.int32),
                    "size": counts,
                    "inertia": np.round(inertia_q / _D2SCALE, 6),
                }
            )
            break
        cent = _new_centroids(cent, qsums, counts)
    return cent, summary


def assign_clusters(
    ds: "ray.data.Dataset",
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """Tag every vector with its nearest-centroid cluster_id (int32);
    keeps the embedding column for downstream within-cluster work."""
    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("cluster_id", pa.array([], pa.int32()))
        c = ray.get(cref)
        a = _pairwise_d2(_as_matrix(batch[vec_col]), c).argmin(axis=1)
        return batch.append_column(
            "cluster_id", pa.array(a.astype(np.int32))
        )

    return ds.select_columns([id_col, vec_col]).map_batches(
        tag, batch_format="pyarrow"
    )


def semdedup_greedy(
    ids: np.ndarray, vecs: np.ndarray, tau: float
) -> tuple[np.ndarray, np.ndarray]:
    """The within-cluster keep rule (shared spec): scan members in
    ascending id order; keep a vector iff its max cosine against every
    ALREADY-KEPT member is <= tau (cosine rounded to 6 before the
    compare so the decision is representation-stable).  Returns
    (kept bool per member, dup_of id or -1), both in the input order."""
    order = np.argsort(ids, kind="stable")
    v = vecs[order]
    n = v.shape[0]
    norms = np.linalg.norm(v, axis=1)
    norms[norms == 0] = 1.0
    u = v / norms[:, None]
    kept_idx: list[int] = []
    kept = np.zeros(n, dtype=bool)
    dup_of = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        if kept_idx:
            cos = np.round(u[kept_idx] @ u[i], 6)
            j = int(np.argmax(cos))
            if cos[j] > tau:
                dup_of[i] = ids[order][kept_idx[j]]
                continue
        kept[i] = True
        kept_idx.append(i)
    inv = np.empty(n, dtype=np.int64)
    inv[order] = np.arange(n)
    return kept[inv], dup_of[inv]


def semdedup(
    ds: "ray.data.Dataset",
    k: int,
    tau: float,
    *,
    iters: int = 5,
    sample_size: int = 2048,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """SemDeDup (Abbas 2023): k-means the corpus, then drop in-cluster
    semantic duplicates by the greedy lowest-id-kept rule.  One shuffle
    (the per-cluster groupby); cluster size n/k bounds single-group
    work.  Returns (vec_id, cluster_id, kept, dup_of) sorted by id."""
    cent, _ = kmeans_fit(
        ds, k, iters=iters, sample_size=sample_size, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    tagged = assign_clusters(ds, cent, id_col=id_col, vec_col=vec_col)

    def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy(dtype=np.int64)
        vecs = np.array(g[vec_col].to_list(), dtype=np.float64)
        kept, dup_of = semdedup_greedy(ids, vecs, tau)
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster_id": g["cluster_id"].to_numpy(),
                "kept": kept,
                "dup_of": dup_of,
            }
        )

    out = (
        tagged.groupby("cluster_id")
        .map_groups(dedup_group, batch_format="pandas")
        .to_pandas()
    )
    out = out.sort_values(id_col, kind="stable").reset_index(drop=True)
    out["cluster_id"] = out["cluster_id"].astype(np.int32)
    out["kept"] = out["kept"].astype(bool)
    out["dup_of"] = out["dup_of"].astype(np.int64)
    return out


# ------------------------------------------------------------ k-center

KCENTER_VERSION = "kcenter-v1"


def kcenter_select(
    ids: np.ndarray, vecs: np.ndarray, k: int
) -> list[tuple[int, int]]:
    """Greedy k-center (Gonzalez 1985) over an in-memory matrix — THE
    spec both routes share.  Seed = smallest id; each round picks the
    point maximizing the QUANTIZED min squared distance to the chosen
    set (``rint(d2 * 1e6)`` int64 — same fixed-point trick as Lloyd, so
    the argmax is an integer comparison, identical at any parallelism),
    ties broken by smallest id.  Returns [(vec_id, d2q at selection)].
    """
    order = np.argsort(ids, kind="stable")
    ids_s, v = ids[order], vecs[order]
    n = v.shape[0]
    chosen: list[tuple[int, int]] = [(int(ids_s[0]), 0)]
    mind = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    cur = v[0]
    for _ in range(1, min(k, n)):
        d2 = _pairwise_d2(v, cur[None, :])[:, 0]
        np.minimum(mind, np.rint(np.maximum(d2, 0.0) * _D2SCALE).astype(np.int64), out=mind)
        best = int(np.argmax(mind))          # first max == smallest id
        chosen.append((int(ids_s[best]), int(mind[best])))
        cur = v[best]
    return chosen


def kcenter_greedy(
    ds: "ray.data.Dataset",
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Distributed greedy k-center coreset selection (the classic
    diversity-driven data-selection rule).  Each round broadcasts only
    the NEWEST center; every block keeps no state — it recomputes the
    min-distance against all chosen centers per round, emits one
    (argmax id, d2q, winning vector) row, and the driver reduces
    |blocks| rows.  k passes over the data, zero shuffles.

    Scale note: at 10^9+ vectors the running per-point min is persisted
    as a column between rounds (write-amortized) instead of recomputed
    (O(k^2 N d) -> O(k N d)); the selection rule and fixed-point spec
    (kcenter_select) are unchanged — recompute keeps this route pure
    Dataset ops.

    Returns (rank, vec_id, radius) with radius = d2q/1e6 at selection.
    """
    vecs_ds = ds.select_columns([id_col, vec_col])

    def best_in_batch(batch: pa.Table, cref) -> pa.Table:
        empty = pa.table({
            "vec_id": pa.array([], pa.int64()),
            "d2q": pa.array([], pa.int64()),
            "vec": pa.array([], pa.list_(pa.float64())),
        })
        if batch.num_rows == 0:
            return empty
        cents = ray.get(cref)
        v = _as_matrix(batch[vec_col])
        bids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d2 = _pairwise_d2(v, cents)
        d2q = np.rint(np.maximum(d2, 0.0) * _D2SCALE).astype(np.int64)
        mind = d2q.min(axis=1)
        o = np.argsort(bids, kind="stable")
        best = o[int(np.argmax(mind[o]))]    # max d2q, ties smallest id
        return pa.table({
            "vec_id": pa.array([int(bids[best])], pa.int64()),
            "d2q": pa.array([int(mind[best])], pa.int64()),
            "vec": pa.array([v[best].tolist()], pa.list_(pa.float64())),
        })

    # deterministic seed: the smallest id (one tiny scan for its vector)
    seed_row = (
        vecs_ds.map_batches(
            lambda b: pa.table({
                id_col: [int(b[id_col].to_numpy(zero_copy_only=False).min())]
                if b.num_rows else pa.array([], pa.int64())
            }),
            batch_format="pyarrow",
        ).to_pandas()
    )
    seed_id = int(seed_row[id_col].min())
    seed_vec = np.asarray(
        ds.filter(expr=f"{id_col} == {seed_id}").take(1)[0][vec_col],
        dtype=np.float64,
    )
    chosen = [(seed_id, 0)]
    cents = seed_vec[None, :]
    for _ in range(1, k):
        cref = ray.put(cents)
        cand = vecs_ds.map_batches(
            lambda b, cref=cref: best_in_batch(b, cref),
            batch_format="pyarrow",
        ).to_pandas()
        if cand.empty:
            break
        cand = cand.sort_values(
            ["d2q", "vec_id"], ascending=[False, True], kind="mergesort"
        )
        row = cand.iloc[0]
        chosen.append((int(row["vec_id"]), int(row["d2q"])))
        cents = np.vstack([cents, np.asarray(row["vec"], dtype=np.float64)])
    return pd.DataFrame({
        "rank": np.arange(1, len(chosen) + 1, dtype=np.int32),
        "vec_id": np.array([c[0] for c in chosen], dtype=np.int64),
        "radius": np.round(
            np.array([c[1] for c in chosen], dtype=np.float64) / _D2SCALE, 6
        ),
    })


# ------------------------------------------------------------------ PCA

PCA_VERSION = "pca-v1"


def pca_gram(
    ds: "ray.data.Dataset",
    *,
    vec_col: str = "embedding",
) -> tuple[int, np.ndarray, np.ndarray]:
    """Distributed exact Gram accumulation for PCA: vectors are
    quantized once to ``round(v * 2^20)`` int64 (the Lloyd fixed-point
    spec), each block emits (n, sum_q, Q^T Q) — INTEGER partials, so
    the reduction is exact and parallelism-invariant — and the driver
    sums them in arbitrary-precision Python ints (int64 block partials
    are safe to ~2^22 rows/block at d=64; the driver sum never wraps).

    Returns (n, sum_q (d,) object ints, gram_q (d,d) object ints)."""

    def part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.list_(pa.int64())),
                "g": pa.array([], pa.list_(pa.int64())),
            })
        q = _quantize(_as_matrix(batch[vec_col]))
        return pa.table({
            "n": pa.array([q.shape[0]], pa.int64()),
            "s": pa.array([q.sum(axis=0).tolist()], pa.list_(pa.int64())),
            "g": pa.array([(q.T @ q).ravel().tolist()], pa.list_(pa.int64())),
        })

    parts = (
        ds.select_columns([vec_col])
        .map_batches(part, batch_format="pyarrow")
        .to_pandas()
    )
    n = int(parts["n"].sum())
    d = len(parts["s"].iloc[0])
    sum_q = np.zeros(d, dtype=object)
    gram_q = np.zeros(d * d, dtype=object)
    for s in parts["s"]:
        sum_q += np.asarray(s, dtype=object)
    for g in parts["g"]:
        gram_q += np.asarray(g, dtype=object)
    return n, sum_q, gram_q.reshape(d, d)


def pca_eigen(n: int, sum_q: np.ndarray, gram_q: np.ndarray,
              n_top: int) -> pd.DataFrame:
    """Covariance eigenvalues from the exact integer Gram: cov =
    G/(n*2^40) - mu mu^T with mu = s/(n*2^20), evaluated in float64 from
    the EXACT integer sums (identical inputs on every route), then one
    driver-side eigvalsh.  Returns top components' (eigenvalue, ratio),
    both rounded 1e-6."""
    d = gram_q.shape[0]
    sf = np.asarray(sum_q, dtype=np.float64)
    gf = np.asarray(gram_q, dtype=np.float64)
    mu = sf / (n * _QSCALE)
    cov = gf / (n * _QSCALE * _QSCALE) - np.outer(mu, mu)
    ev = np.linalg.eigvalsh((cov + cov.T) / 2.0)[::-1]
    total = float(ev.sum())
    top = ev[:n_top]
    return pd.DataFrame({
        "component": np.arange(1, len(top) + 1, dtype=np.int32),
        "eigenvalue": np.round(top, 6),
        "ratio": np.round(top / total, 6),
    })


def ckmeans_1d(values: np.ndarray, weights: np.ndarray,
               k: int) -> np.ndarray:
    """Optimal weighted 1-D k-means by dynamic programming (Wang & Song,
    *Ckmeans.1d.dp*, The R Journal 3(2), 2011): partition the SORTED
    distinct ``values`` (with integer ``weights``) into ``k`` contiguous
    clusters minimizing total weighted within-cluster SSE.  Returns the
    ``k+1`` split indices into ``values`` (bounds[j]..bounds[j+1]-1 is
    cluster j).  Deterministic: ties in the DP argmin take the SMALLEST
    split index (np.argmin's first-minimum rule — the serial oracle
    mirrors it with a strict ``<`` scan).

    Cost is evaluated from prefix sums only — ``css - cs^2 / W`` — so
    the serial reference computes bit-identical numbers.  O(k·n^2) time
    on the DISTINCT-value table, which a driver runs on the bounded
    output of a (value -> count) combiner groupby — never on raw rows.
    """
    v = np.asarray(values, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    n = v.size
    k = min(k, n)
    cw = np.zeros(n + 1)
    cs = np.zeros(n + 1)
    css = np.zeros(n + 1)
    np.cumsum(w, out=cw[1:])
    np.cumsum(w * v, out=cs[1:])
    np.cumsum(w * v * v, out=css[1:])

    def seg_cost(a: np.ndarray, b: int) -> np.ndarray:
        # weighted SSE of values[a..b-1] for a vector of starts a
        W = cw[b] - cw[a]
        S = cs[b] - cs[a]
        Q = css[b] - css[a]
        return Q - S * S / W

    D = np.full((k + 1, n + 1), np.inf)
    back = np.zeros((k + 1, n + 1), dtype=np.int64)
    D[0, 0] = 0.0
    for j in range(1, k + 1):
        for i in range(j, n - (k - j) + 1):
            starts = np.arange(j - 1, i)
            cand = D[j - 1, starts] + seg_cost(starts, i)
            m = int(np.argmin(cand))
            D[j, i] = cand[m]
            back[j, i] = starts[m]
    bounds = np.zeros(k + 1, dtype=np.int64)
    bounds[k] = n
    for j in range(k, 0, -1):
        bounds[j - 1] = back[j, bounds[j]]
    return bounds
