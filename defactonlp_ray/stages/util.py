"""Shared stage helpers."""

from __future__ import annotations

import ray


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
