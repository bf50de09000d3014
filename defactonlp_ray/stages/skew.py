"""Hot-key (skew) handling utilities (SURVEY.md §4, north_rule "skewed
head terms split via salted sub-partitions before merge").

The index build itself bounds head-term skew STRUCTURALLY: postings group
inside doc-range segments (never by term), and term stats pre-aggregate to
one row per (term, segment) before the only term-keyed shuffle.  This
module provides the general salted-groupby pattern for pipelines that DO
need a term-keyed (or other hot-keyed) exchange over raw rows:

    rows --salt--> groupby(key, salt) partial agg --> groupby(key) final

A key with f occurrences contributes at most ``salt`` rows to the final
exchange instead of f — sub-partitions are combined associatively, so the
result is exact (tested against the unsalted groupby).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum


def salted_group_sum(
    ds: "ray.data.Dataset",
    key: str,
    value: str,
    *,
    salt: int = 16,
    alias: str = "sum",
) -> "ray.data.Dataset":
    """Exact ``groupby(key).sum(value)`` with salted sub-partitions.

    Stage 1 shuffles on (key, salt) — a head key splits across ``salt``
    reducers instead of melting one; stage 2 merges the <=salt partials
    per key (tiny).  Salt is derived from a row counter, not a hash of
    the key (which would defeat the split).
    """

    def add_salt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        s = pa.array((np.arange(n) % salt).astype(np.int64))
        return pa.table({key: batch[key], value: batch[value], "_salt": s})

    salted = ds.map_batches(add_salt, batch_format="pyarrow")
    partial = salted.groupby([key, "_salt"]).aggregate(
        Sum(value, alias_name="_partial")
    )
    return (
        partial.groupby(key)
        .aggregate(Sum("_partial", alias_name=alias))
    )
