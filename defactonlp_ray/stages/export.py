"""Training-data export stages: deterministic stratified sampling and
hash-sharded parquet export — the tail of an LLM data pipeline (carve
eval slices per language, then ship shuffle-sharded parquet to
trainers).

Hash policy: the md5-hex-prefix of the string id, the same
DuckDB-checkable rule as ``docs_sample_hash`` (oracle:
``substring(md5(CAST(id AS VARCHAR)), 1, n)``).  The per-row
``hashlib.md5`` loop is pinned for oracle parity (no vectorized md5 in
the stack); the vectorized splitmix64 family in ``functions/hashing``
is the non-oracle path for pure-throughput sharding.

Scale notes: both stages are embarrassingly parallel map_batches — the
sampler filters in place, and the export's only exchange is the
partitioned write (Ray Data splits blocks by the shard column; no
global sort).  Shard assignment is a pure function of the row id, so a
re-run (or a second cluster) produces byte-compatible shard SETS —
resumability is a done-marker plus a clean-rebuild of unmarked
partial output.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import numpy as np
import pyarrow as pa

import ray.data


def md5_prefix(ids, n: int = 2) -> list[str]:
    """First ``n`` hex chars of md5(str(id)) per element."""
    return [hashlib.md5(str(i).encode()).hexdigest()[:n] for i in ids]


def stratified_sample(
    ds: "ray.data.Dataset",
    thresholds: dict[str, str],
    default: str,
    strat_col: str = "lang",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Deterministic per-stratum sampling: keep a row iff its 2-hex md5
    prefix is <= the stratum's threshold ('19' ~ 10.2%, '7f' = 50%).
    Parallelism/partitioning-invariant (pure function of the id), so the
    carved slice is stable across cluster sizes and re-runs."""

    def samp(batch: pa.Table) -> pa.Table:
        pref = md5_prefix(batch[id_col].to_pylist())
        strata = batch[strat_col].to_pylist()
        keep = [
            p <= thresholds.get(s, default) for p, s in zip(pref, strata)
        ]
        return batch.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(samp, batch_format="pyarrow")


def shard_bounds(n_shards: int) -> list[str]:
    """Upper (inclusive) 2-hex bounds splitting the 256 md5 buckets into
    ``n_shards`` equal ranges — e.g. 4 -> ['3f', '7f', 'bf', 'ff']."""
    if not (1 <= n_shards <= 256 and 256 % n_shards == 0):
        raise ValueError("n_shards must divide 256")
    step = 256 // n_shards
    return [format((i + 1) * step - 1, "02x") for i in range(n_shards)]


def assign_shards(
    ds: "ray.data.Dataset", n_shards: int, id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Append ``shard:int32`` — the md5-bucket range of the row id."""
    bounds = shard_bounds(n_shards)

    def tag(batch: pa.Table) -> pa.Table:
        pref = md5_prefix(batch[id_col].to_pylist())
        shard = np.searchsorted(np.array(bounds), np.array(pref, dtype=object))
        return batch.append_column(
            "shard", pa.array(shard.astype(np.int32), pa.int32())
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def export_shards(
    ds: "ray.data.Dataset",
    out_dir: str,
    n_shards: int = 4,
    id_col: str = "doc_id",
    resume: bool = True,
) -> dict:
    """Shuffle-sharded training export: one ``shard=K/`` parquet dir per
    hash range.  Crash-safe resume: the export is DONE only when
    ``_EXPORT_DONE.json`` (per-shard row counts) exists; a directory
    without the marker is a dead partial run and is rebuilt from
    scratch (shard assignment is deterministic, so the rebuild is
    byte-compatible).  Returns the manifest dict."""
    marker = os.path.join(out_dir, "_EXPORT_DONE.json")
    if os.path.exists(marker):
        with open(marker) as f:
            m = json.load(f)
        if resume and m.get("n_shards") == n_shards:
            return m
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    tagged = assign_shards(ds, n_shards, id_col=id_col)
    tagged.write_parquet(out_dir, partition_cols=["shard"])
    # per-shard counts from parquet FOOTERS of what actually landed on
    # disk (metadata-only reads; no second pass over the data and no
    # mid-pipeline materialization)
    import pyarrow.parquet as pq

    rows_per_shard: dict[str, int] = {}
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("shard="):
            continue
        sdir = os.path.join(out_dir, name)
        n = sum(
            pq.ParquetFile(os.path.join(sdir, f)).metadata.num_rows
            for f in os.listdir(sdir)
        )
        rows_per_shard[name.split("=", 1)[1]] = n
    manifest = {
        "n_shards": n_shards,
        "rows_per_shard": rows_per_shard,
        "total_rows": int(sum(rows_per_shard.values())),
    }
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, marker)
    return manifest
