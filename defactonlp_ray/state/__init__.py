"""Broadcast helpers: put a small object once, read it inside actors/tasks.

Pattern (ray_guide.md:135-139): ``ref = broadcast(obj)`` on the driver, then
``value = get_broadcast(ref)`` inside ``__init__`` of an actor-pool class or
at first use in a stateless task.  Never re-ship a lookup table per batch.
"""

from __future__ import annotations

from typing import Any

import ray


def broadcast(obj: Any) -> "ray.ObjectRef":
    """Put ``obj`` in the object store ONCE; pass the ref to stages."""
    return ray.put(obj)


def get_broadcast(ref: Any) -> Any:
    """Resolve a broadcast ref (no-op when given a plain object, which keeps
    stage functions unit-testable without a Ray session)."""
    if isinstance(ref, ray.ObjectRef):
        return ray.get(ref)
    return ref
