"""Shared stage helpers."""

from __future__ import annotations

import ray


def ensure_arrow(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Coerce every block of ``ds`` to Arrow.

    ``groupby().aggregate()`` can emit PANDAS blocks at some parallelisms
    (observed at the driver's 32-cpu run, not at pytest's 4), and this Ray
    version's ``Project`` operator — the plan node behind Dataset-level
    ``rename_columns`` / ``select_columns`` / ``drop_columns`` — calls the
    Arrow-only ``Table.rename_columns`` on each block, so a pandas block
    reaching a projection crashes with ``'DataFrame' object has no
    attribute 'rename_columns'`` (CORRECTNESS_r03 ``neardup_clusters``).
    Route any aggregate output through this before projecting it.  The
    identity ``map_batches`` with ``batch_format="pyarrow"`` makes Ray do
    the pandas→Arrow conversion inside the task (zero-copy when the block
    is already Arrow).
    """
    return ds.map_batches(lambda t: t, batch_format="pyarrow")


def arrow_project(
    ds: "ray.data.Dataset",
    columns: "list[str]",
    rename: "dict[str, str] | None" = None,
) -> "ray.data.Dataset":
    """Select ``columns`` (then optionally rename some of them) in ONE
    Arrow ``map_batches`` pass — a block-format-safe replacement for
    ``ds.select_columns(...).rename_columns(...)`` downstream of
    operators that may emit pandas blocks (see :func:`ensure_arrow`)."""
    ren = rename or {}

    def _fn(t):
        import pyarrow as pa

        return pa.table({ren.get(c, c): t[c] for c in columns})

    return ds.map_batches(_fn, batch_format="pyarrow")


def pool_size(requested: int, reserve: int = 2) -> int:
    """Clamp an actor-pool ``concurrency`` so the pool NEVER reserves every
    CPU: a pool that takes all slots starves the read/write stages and the
    pipeline deadlocks (ray_guide.md:128-131; observed on a 4-CPU cluster
    with concurrency=4 over read_parquet).  Leaves ``reserve`` CPUs for
    the other stages."""
    try:
        n_cpu = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        n_cpu = 4
    return max(1, min(requested, n_cpu - reserve))


def cut_lineage(ds):
    """Re-root a MATERIALIZED dataset on its object-store blocks,
    dropping the logical-plan/stats lineage (the Spark equivalent is
    ``RDD.checkpoint()`` inside iterative algorithms).  BSP loops
    (min-label, star contraction, PageRank) otherwise grow a per-round
    DAG that Ray Data's end-of-execution stats summarization walks
    without memoization — up to exponential in rounds on diamond
    shapes (observed: the 600-node-chain CC test went from seconds to
    hours at ~25 accumulated rounds).  Blocks stay in plasma, zero
    copy; only the lineage metadata is dropped."""
    import ray.data as rd

    try:
        return rd.from_arrow_refs(ds.to_arrow_refs())
    except Exception:  # pragma: no cover - defensive: keep the dataset
        return ds
