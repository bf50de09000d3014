"""Readers (SURVEY.md §2.1 S1/S4/S7) — always prune at the read.

``read_parquet(columns=..., filter=...)`` pushes column pruning and
row-group predicate filtering into the scan (ray_guide.md:174); a read
that loads all columns for a 2-column transform is wrong at 100 TB.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import pyarrow.compute as pc

import ray.data


def read_table(
    sf_dir: str, name: str, columns: Optional[Sequence[str]] = None
) -> "ray.data.Dataset":
    """Read one driver test table with column pruning."""
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{name}.parquet"),
        columns=list(columns) if columns else None,
    )


def read_pages(
    paths: str | Sequence[str],
    *,
    columns: Optional[Sequence[str]] = None,
    lang: Optional[str] = None,
) -> "ray.data.Dataset":
    """S7: Common-Crawl-style pages reader with optional language pushdown
    (row-group level) — M6 as a read-time filter, not a post-scan one."""
    filt = (pc.field("lang") == lang) if lang else None
    return ray.data.read_parquet(
        paths,
        columns=list(columns) if columns else None,
        filter=filt,
    )


def read_claims(path: str) -> "ray.data.Dataset":
    """S4: claims with nested evidence (JSONL or Parquet by extension)."""
    if str(path).endswith(".jsonl") or str(path).endswith(".json"):
        return ray.data.read_json(path)
    return ray.data.read_parquet(path)
