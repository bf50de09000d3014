"""Benchmark-contamination detection over a training corpus.

The standard LLM-training hygiene check (the n-gram overlap audits in
the GPT-3 appendix-C / PaLM / Llama eval-decontamination writeups, all
public): every training document is scanned for k-token shingles that
also occur in an evaluation benchmark, and documents with any overlap
are reported with their overlap fraction.

Shape at 100 TB: the benchmark side is SMALL by construction (eval sets
are ~10^3..10^5 items), so its distinct-shingle set is built once,
broadcast via ``ray.put``, and probed per batch with ONE vectorized
``pyarrow.compute.is_in`` — the training side streams through a
shuffle-free ``map_batches`` and nothing O(corpus) ever leaves the
workers.  Membership is tested on the actual shingle STRINGS (not
hashes), so results are exactly reproducible by the SQL oracle with no
collision caveat.

Shingle construction mirrors ``stages/dedup._shingle_hashes_column``
(same tokenizer, same <k-token whole-text fallback), minus hashing and
minus per-doc dedup — the metric counts shingle POSITIONS, so both
sides agree without a distinctness pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.tokenizer import tokenize_column
from .dedup import _ranges_offsets
from .util import pool_size

__all__ = ["build_eval_shingles", "contamination_report"]


def _shingle_strings_column(
    texts: pa.Array | pa.ChunkedArray, shingle_k: int
) -> tuple[pa.Array, np.ndarray, int]:
    """Vectorized k-token shingle strings for a text column: returns
    ``(joined, row_ids, n_rows)`` where ``joined[i]`` is one shingle
    occurrence (position multiset, duplicates preserved) belonging to
    row ``row_ids[i]``.  Rows with 0 < tokens < k contribute their
    whole-text join (the ``_shingles`` fallback); empty rows contribute
    nothing."""
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

    parts_j: list[pa.Array] = []
    parts_r: list[np.ndarray] = []
    if n_long.sum():
        s_starts = np.repeat(offsets[:-1], n_long) + _ranges_offsets(n_long)
        cols = [
            flat.take(pa.array(s_starts + j, pa.int64()))
            for j in range(shingle_k)
        ]
        joined = pc.binary_join_element_wise(*cols, " ")
        parts_j.append(joined)
        parts_r.append(np.repeat(np.arange(n, dtype=np.int64), n_long))
    if short_mask.any():
        short_lists = toks.filter(pa.array(short_mask))
        parts_j.append(pc.binary_join(short_lists, " "))
        parts_r.append(np.flatnonzero(short_mask).astype(np.int64))
    if not parts_j:
        return pa.array([], pa.string()), np.empty(0, np.int64), n
    joined_all = pa.concat_arrays(
        [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
         for p in parts_j]
    )
    return joined_all, np.concatenate(parts_r), n


def build_eval_shingles(
    eval_docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    shingle_k: int = 5,
) -> pa.Array:
    """Distinct shingle set of the evaluation benchmark — the SMALL side
    (collected to the driver; a benchmark that does not fit one node's
    memory is not a benchmark).  Returns a string Array ready for
    ``ray.put`` + ``pc.is_in`` probing."""
    parts: list[pa.Array] = []
    for b in eval_docs.select_columns([text_col]).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        joined, _rows, _n = _shingle_strings_column(b[text_col], shingle_k)
        if len(joined):
            parts.append(pc.unique(joined))
    if not parts:
        return pa.array([], pa.string())
    # combine_chunks + a fresh builder copy: the returned array owns its
    # buffers outright (no parent-slice views), so ray.put serializes it
    # safely at any parallelism
    uniq = pc.unique(pa.concat_arrays(parts))
    return pa.array(uniq.to_pylist(), pa.string())


class _ContaminationStage:
    """Actor-pool stage: the eval shingle set resolves from plasma once
    per actor; each batch is one vectorized shingle + is_in + bincount
    pass."""

    def __init__(self, eval_ref, *, id_col: str, text_col: str,
                 shingle_k: int, min_hits: int):
        ev = (
            ray.get(eval_ref)
            if isinstance(eval_ref, ray.ObjectRef)
            else eval_ref
        )
        # transported as a plain string list (small side); rebuilt into
        # an Arrow array once per actor for the vectorized is_in probe
        self._ev = ev if isinstance(ev, pa.Array) else pa.array(ev, pa.string())
        self._id = id_col
        self._text = text_col
        self._k = shingle_k
        self._min = min_hits

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_shingles": pa.array([], pa.int64()),
            "n_overlap": pa.array([], pa.int64()),
            "frac_overlap": pa.array([], pa.float64()),
        })
        if batch.num_rows == 0:
            return empty
        joined, rows, n = _shingle_strings_column(batch[self._text], self._k)
        if len(joined) == 0 or len(self._ev) == 0:
            return empty
        hit = pc.is_in(joined, value_set=self._ev).to_numpy(
            zero_copy_only=False
        )
        n_overlap = np.bincount(rows[hit], minlength=n)
        n_shingles = np.bincount(rows, minlength=n)
        keep = n_overlap >= self._min
        if not keep.any():
            return empty
        ids = batch[self._id].to_numpy(zero_copy_only=False)[keep]
        tot = n_shingles[keep]
        ov = n_overlap[keep]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_shingles": pa.array(tot, pa.int64()),
            "n_overlap": pa.array(ov, pa.int64()),
            "frac_overlap": pa.array(
                np.round(ov / tot.astype(np.float64), 6), pa.float64()
            ),
        })


def contamination_report(
    docs: "ray.data.Dataset",
    eval_shingles: pa.Array,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    min_hits: int = 1,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """(doc_id, n_shingles, n_overlap, frac_overlap) for every training
    document whose k-token shingle positions hit the eval set at least
    ``min_hits`` times.  One broadcast, zero shuffles."""
    ev_ref = ray.put(
        eval_shingles.to_pylist()
        if isinstance(eval_shingles, (pa.Array, pa.ChunkedArray))
        else list(eval_shingles)
    )
    return docs.select_columns([id_col, text_col]).map_batches(
        _ContaminationStage,
        fn_constructor_kwargs={
            "eval_ref": ev_ref, "id_col": id_col, "text_col": text_col,
            "shingle_k": shingle_k, "min_hits": min_hits,
        },
        batch_format="pyarrow",
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )
