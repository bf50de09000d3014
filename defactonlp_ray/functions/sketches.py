"""Mergeable sketches (SURVEY.md §2.5 G7 — optional telemetry ops).

HyperLogLog for distinct-count estimation: one sketch per batch inside
``map_batches``, merged in a tiny second stage — the mergeable-sketch
aggregation pattern (ray_guide.md:158-160).  Plain numpy, 2^p registers,
standard bias-corrected estimator (Flajolet et al. 2007).
"""

from __future__ import annotations

import numpy as np

from .hashing import hash_str_array


class HLL:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hs: np.ndarray) -> "HLL":
        idx = (hs >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hs << np.uint64(self.p)
        # rank = leading zeros of remaining bits + 1 (capped)
        nz = rest != 0
        lz = np.full(hs.shape, 64 - self.p + 1, dtype=np.uint8)
        if nz.any():
            r = rest[nz]
            bits = 63 - np.floor(np.log2(r.astype(np.float64))).astype(np.int64)
            lz[nz] = (bits + 1).clip(1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, lz)
        return self

    def add_strings(self, strs) -> "HLL":
        return self.add_hashes(hash_str_array(list(strs)))

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        s = np.sum(2.0 ** (-self.registers.astype(np.float64)))
        e = alpha * m * m / s
        if e <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                e = m * np.log(m / zeros)
        return float(e)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HLL":
        h = cls(b[0])
        h.registers = np.frombuffer(b[1:], dtype=np.uint8).copy()
        return h


def hll_distinct_terms(ds, text_col: str = "text", p: int = 12) -> float:
    """Distinct-term estimate over a text column: per-batch HLL sketches
    (one serialized sketch row per batch) merged driver-side."""
    import pyarrow as pa

    from .tokenizer import flatten_tokens

    def sketch(batch: pa.Table) -> pa.Table:
        terms, _, _ = flatten_tokens(batch[text_col])
        h = HLL(p).add_strings(terms.to_pylist())
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow").take_all()
    acc = HLL(p)
    for r in parts:
        acc.merge(HLL.from_bytes(r["sketch"]))
    return acc.estimate()


def kmv_sample(ds, k: int = 256, id_col: str = "doc_id",
               value_col: str = "n_chars"):
    """Bottom-k (KMV) hash sample — the k rows with the smallest
    (md5(id), id) keys (Bar-Yossef et al.'s k-minimum-values sketch,
    used here as a deterministic uniform sample for quantile
    estimation).  Mergeable by construction: the bottom-k of a union is
    the k smallest of the per-part bottom-k's, so each batch reduces to
    <= k rows and the driver merge touches k * n_blocks tiny rows (at
    10^12 docs, insert one tree-combine map_batches level; nothing else
    changes).  md5-hex keys match the DuckDB oracle's
    ``ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT k`` exactly."""
    import hashlib

    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        vals = batch[value_col].to_pylist()
        h = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        order = sorted(range(len(ids)), key=lambda j: (h[j], ids[j]))[:k]
        return pa.table(
            {
                "h": pa.array([h[j] for j in order], pa.string()),
                id_col: pa.array([ids[j] for j in order], pa.int64()),
                value_col: pa.array([vals[j] for j in order]),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (r["h"], r[id_col]))
    return rows[:k]


def kmv_quantiles(ds, quantiles=(0.5, 0.95), k: int = 256,
                  id_col: str = "doc_id", value_col: str = "n_chars"):
    """Approximate quantiles from the KMV sample with the repo's pinned
    discrete rule: sorted_sample[floor(q * (n-1))] (identical to
    q_events_quantiles' definition, so the SQL oracle shares it)."""
    sample = kmv_sample(ds, k=k, id_col=id_col, value_col=value_col)
    v = np.sort(np.array([r[value_col] for r in sample], dtype=np.float64))
    n = v.size
    out = {"n": int(n)}
    for q in quantiles:
        out[f"p{int(q * 100)}"] = round(float(v[int(np.floor(q * (n - 1)))]), 6)
    return out


def hll_distinct_terms_by(
    ds, group_col: str = "lang", text_col: str = "text", p: int = 12
):
    """Per-GROUP distinct-term estimates: one mergeable HLL sketch per
    (batch, group) -> groupby(group) register-max merge -> (group,
    n_terms_estimate) rows.

    The sketch-as-aggregation-state shape: each batch reduces its tokens
    to <= n_groups fixed 2^p-byte states, so the shuffle moves sketches,
    never tokens — at 100 TB the exchanged bytes are (groups × blocks ×
    4 KiB) regardless of corpus size.  Register max-merge is batch- and
    partition-invariant, so the estimates equal the single-process
    serial reference exactly (the pinned oracle)."""
    import pandas as pd
    import pyarrow as pa

    from .tokenizer import flatten_tokens

    def sketch(batch: pa.Table) -> pa.Table:
        import numpy as np

        from .hashing import hash_str_array

        terms, row_idx, _ = flatten_tokens(batch[text_col])
        hs = hash_str_array(terms)  # hash every token ONCE, vectorized
        codes, inv = np.unique(
            np.asarray(batch[group_col].to_pylist(), dtype=object),
            return_inverse=True,
        )
        tok_code = inv[row_idx]
        return pa.table(
            {
                group_col: pa.array(list(codes), pa.string()),
                "sketch": pa.array(
                    [
                        HLL(p).add_hashes(hs[tok_code == c]).to_bytes()
                        for c in range(codes.size)
                    ],
                    pa.binary(),
                ),
            }
        )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        acc = HLL(p)
        for b in group["sketch"]:
            acc.merge(HLL.from_bytes(b))
        return pd.DataFrame(
            {
                group_col: [group[group_col].iloc[0]],
                "n_terms_estimate": [round(acc.estimate(), 6)],
            }
        )

    return (
        ds.select_columns([group_col, text_col])
        .map_batches(sketch, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(merge, batch_format="pandas")
    )


class CMS:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): d rows × w
    counters; update/query hash j derives from the repo-wide uint64
    token hash via one splitmix64 remix per row (pairwise-independent
    enough in practice, deterministic across engines).  Merge is
    elementwise sum — batch- and partition-invariant, so the distributed
    per-batch-sketch + sum-merge equals the serial reference exactly."""

    __slots__ = ("d", "w", "counts")

    def __init__(self, d: int = 4, w: int = 2048,
                 counts: np.ndarray | None = None):
        self.d, self.w = d, w
        self.counts = (
            counts if counts is not None
            else np.zeros((d, w), dtype=np.int64)
        )

    def _rows(self, hs: np.ndarray) -> np.ndarray:
        """(d, n) counter indices for n hashes."""
        from .hashing import splitmix64

        idx = np.empty((self.d, hs.size), dtype=np.int64)
        h = hs
        for j in range(self.d):
            h = splitmix64(h + np.uint64(0x9E3779B97F4A7C15))
            idx[j] = (h % np.uint64(self.w)).astype(np.int64)
        return idx

    def add_hashes(self, hs: np.ndarray, weights: np.ndarray | None = None) -> "CMS":
        idx = self._rows(hs)
        w = weights if weights is not None else np.ones(hs.size, dtype=np.int64)
        for j in range(self.d):
            np.add.at(self.counts[j], idx[j], w)
        return self

    def add_strings(self, strs) -> "CMS":
        return self.add_hashes(hash_str_array(list(strs)))

    def merge(self, other: "CMS") -> "CMS":
        self.counts += other.counts
        return self

    def estimate(self, strs) -> np.ndarray:
        """Point estimates (upper bounds) for a list of terms."""
        hs = hash_str_array(list(strs))
        idx = self._rows(hs)
        ests = np.stack([self.counts[j][idx[j]] for j in range(self.d)])
        return ests.min(axis=0)

    def to_bytes(self) -> bytes:
        return self.counts.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, d: int = 4, w: int = 2048) -> "CMS":
        return cls(d, w, np.frombuffer(b, dtype=np.int64).reshape(d, w).copy())


def cms_term_counts(ds, terms: list[str], *, text_col: str = "text",
                    d: int = 4, w: int = 2048):
    """Frequency estimation under fixed memory (the CMS aggregation
    shape): one (d, w) sketch per batch — tokens hashed once, counters
    bumped vectorized — merged by elementwise sum into a single
    corpus sketch, then point-queried for ``terms``.  The shuffle moves
    d·w int64 counters per block regardless of corpus size; estimates
    are one-sided (>= true count) with the standard (e/w, 1-e^-d)
    guarantee."""
    import pandas as pd
    import pyarrow as pa

    from .tokenizer import flatten_tokens

    def sketch(batch: pa.Table) -> pa.Table:
        toks, _, _ = flatten_tokens(batch[text_col])
        c = CMS(d, w)
        if len(toks):
            c.add_hashes(hash_str_array(toks))
        return pa.table({"sketch": pa.array([c.to_bytes()], pa.binary())})

    acc = CMS(d, w)
    parts = (
        ds.select_columns([text_col])
        .map_batches(sketch, batch_format="pyarrow")
        .to_pandas()
    )
    for b in parts["sketch"]:
        acc.merge(CMS.from_bytes(b, d, w))
    ests = acc.estimate(terms)
    return pd.DataFrame(
        {"term": terms, "est_count": ests.astype(np.int64)}
    ).sort_values("term").reset_index(drop=True)


def mg_reduce(
    terms: "np.ndarray", counts: "np.ndarray", k: int
) -> tuple["np.ndarray", "np.ndarray"]:
    """Misra-Gries summary reduction (Misra & Gries 1982; the
    SpaceSaving/mergeable-summaries form of Agarwal et al., TODS
    2013): collapse exact (term, count) pairs to at most ``k``
    counters by subtracting the (k+1)-th largest count from every
    counter and dropping the non-positive ones — the closed form of
    the classic decrement loop.  Guarantee: every term with true
    count > N/(k+1) survives, and surviving counters UNDERESTIMATE by
    at most N/(k+1); summing per-partition summaries and reducing
    again preserves the bound (mergeability), which is what makes the
    two-pass exact heavy-hitters pipeline shuffle only sketch rows."""
    if counts.size <= k:
        return terms, counts
    d = np.partition(counts, counts.size - k - 1)[counts.size - k - 1]
    keep = counts > d
    return terms[keep], counts[keep] - d
