"""Trigram-partitioned term dictionary — the sublinear expansion path
(fulltext_index tier; SURVEY.md §2.6 extension; the model is PostgreSQL
pg_trgm's trigram index for LIKE acceleration, re-expressed as a
hive-partitioned parquet layout with path-level partition pruning, the
same shape as the persisted ANN indexes in ``stages/ann.py``).

Why: the streamed expansion in ``stages/expand.py`` scans the WHOLE
term dictionary per wildcard workload.  Fine while the dictionary is
thousands of terms; at web scale (hundreds of millions of distinct
terms) every wildcard query paying a full dictionary scan is the
bottleneck the expansion docstring warns about.  A trigram partition
cuts the scan to the terms containing one REQUIRED trigram of the
pattern — the pg_trgm pruning factor (~vocab / #distinct-trigrams,
bounded by 36^3 = 46k partitions for the pinned [a-z0-9] token
language).

Layout: ``<index>/stats/term_trgm/trgm=<3 chars>/*.parquet`` with rows
``(term, df)`` — each dictionary term written once per DISTINCT trigram
it contains (terms shorter than 3 chars carry no trigram and are not
written: no pattern with a required trigram can match them).  Build is
ONE streamed ``map_batches`` pass over the dictionary with a fully
vectorized byte-window kernel (no per-term Python), then a partitioned
parquet write.

Query: a SQL-LIKE pattern's literal runs (the parts between ``%``/``_``)
yield required trigrams; any term matching the pattern must contain
every trigram of every literal run, so reading ONLY the partitions of
one chosen trigram per pattern (the first trigram of the longest run)
is a complete candidate set.  Patterns with no literal run >= 3 chars
fall back to the streamed full-dictionary route — correctness never
depends on the pruning.  Matching inside the partitions reuses the
exact ``_ExpandMatcher`` kernel, and the shared driver merge dedupes
terms that appear in several read partitions, so the pruned route is
result-identical to the streamed route (tested).
"""

from __future__ import annotations

import json
import os
import re
import shutil

import numpy as np
import pyarrow as pa

import ray.data

from .expand import _ExpandMatcher, _merge_expansion, _term_df_path
from ..functions.hashing import str_buffer_view

__all__ = [
    "build_trgm_dict",
    "term_trigrams",
    "required_trigram",
    "expand_wildcard_trgm",
    "wildcard_search_trgm",
]

TRGM_VERSION = "trgm-v2"


def _trgm_path(index_dir: str) -> str:
    return os.path.join(index_dir, "stats", "term_trgm")


def _term_df_fingerprint(index_dir: str) -> str:
    """Cheap content fingerprint of ``stats/term_df``: the sorted
    (name, size, mtime_ns) of its parquet files plus TRGM_VERSION.
    Append/compact/expunge REWRITE term_df (stages/index_build.py), so
    any index mutation changes this string — the staleness signal that
    forces :func:`build_trgm_dict` to rebuild instead of silently
    expanding wildcards against a dictionary that predates the newly
    ingested terms."""
    root = _term_df_path(index_dir)
    entries = []
    if os.path.isfile(root):  # single-file dictionary (small builds)
        st = os.stat(root)
        entries.append((os.path.basename(root), st.st_size, st.st_mtime_ns))
    else:
        for dirpath, _, names in os.walk(root):
            for n in sorted(names):
                if n.startswith("_") or n.startswith("."):
                    continue
                st = os.stat(os.path.join(dirpath, n))
                rel = os.path.relpath(os.path.join(dirpath, n), root)
                entries.append((rel, st.st_size, st.st_mtime_ns))
    entries.sort()
    return json.dumps({"version": TRGM_VERSION, "files": entries})


def term_trigrams(terms: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Vectorized (term_idx, trgm) pairs: every DISTINCT character
    trigram of every term — one fancy-indexed byte-window gather over
    the flat string buffer, no per-term Python loop."""
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    offsets, data = str_buffer_view(terms)
    lens = np.diff(offsets)
    n3 = np.maximum(lens - 2, 0).astype(np.int64)
    total = int(n3.sum())
    if total == 0:
        return pa.table({
            "term_idx": pa.array([], pa.int64()),
            "trgm": pa.array([], pa.string()),
        })
    parent = np.repeat(np.arange(lens.size, dtype=np.int64), n3)
    bounds = np.zeros(lens.size + 1, dtype=np.int64)
    np.cumsum(n3, out=bounds[1:])
    within = np.arange(total, dtype=np.int64) - bounds[parent]
    starts = offsets[parent] + within
    win = data[starts[:, None] + np.arange(3)]  # (total, 3) uint8
    key = (
        win[:, 0].astype(np.int64) << 16
    ) | (win[:, 1].astype(np.int64) << 8) | win[:, 2].astype(np.int64)
    # distinct (term, trigram) pairs
    pair = (parent << 24) | key
    uniq = np.unique(pair)
    u_parent = uniq >> 24
    u_key = uniq & 0xFFFFFF
    tri_bytes = np.empty((u_key.size, 3), dtype=np.uint8)
    tri_bytes[:, 0] = (u_key >> 16) & 0xFF
    tri_bytes[:, 1] = (u_key >> 8) & 0xFF
    tri_bytes[:, 2] = u_key & 0xFF
    fb = pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(3), u_key.size,
        [None, pa.py_buffer(tri_bytes.tobytes())],
    )
    return pa.table({
        "term_idx": pa.array(u_parent),
        "trgm": fb.cast(pa.string()),
    })


def build_trgm_dict(index_dir: str) -> str:
    """One streamed pass over ``stats/term_df`` -> the trigram-partitioned
    dictionary under ``stats/term_trgm``.

    Idempotent AND staleness-aware: the ``_SUCCESS`` marker records a
    fingerprint of ``stats/term_df`` (file names/sizes/mtimes +
    TRGM_VERSION); a marker that does not match the CURRENT dictionary
    — e.g. after ``append_segment``/``compact``/``expunge_deletes``
    rewrote term_df — triggers a full rebuild, so the pruned wildcard
    route never expands against a stale trigram dictionary."""
    out = _trgm_path(index_dir)
    done = os.path.join(out, "_SUCCESS")
    fp = _term_df_fingerprint(index_dir)
    if os.path.exists(done):
        try:
            with open(done) as f:
                if f.read() == fp:
                    return out
        except OSError:
            pass
        shutil.rmtree(out)  # stale partitions must not survive a rebuild

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "trgm": pa.array([], pa.string()),
            })
        pairs = term_trigrams(batch["term"])
        idx = pairs["term_idx"]
        return pa.table({
            "term": batch["term"].take(idx),
            "df": batch["df"].take(idx),
            "trgm": pairs["trgm"],
        })

    (
        ray.data.read_parquet(_term_df_path(index_dir), columns=["term", "df"])
        .map_batches(tag, batch_format="pyarrow", batch_size=64 * 1024)
        .write_parquet(out, partition_cols=["trgm"])
    )
    with open(done, "w") as f:
        f.write(fp)
    return out


def required_trigram(pattern: str) -> str | None:
    """First trigram of the longest literal run of a SQL-LIKE pattern,
    or None when no run reaches 3 chars (-> full-scan fallback).  Any
    term matching the pattern must CONTAIN every literal run, hence
    this trigram — the pg_trgm required-trigram argument."""
    runs = [r for r in re.split(r"[%_]", pattern) if len(r) >= 3]
    if not runs:
        return None
    return max(runs, key=len)[:3]


def expand_wildcard_trgm(
    index_dir: str,
    patterns: list[tuple[int, str]],
    *,
    max_expansions: int | None = None,
) -> dict[int, list[str]]:
    """Wildcard expansion over the trigram-partitioned dictionary:
    result-identical to :func:`~.expand.expand_wildcard`, but patterns
    with a required trigram read ONLY their ``trgm=<t>`` partition
    directories (path pruning via ``PathPartitionFilter``); the rest
    fall back to the streamed route."""
    from ray.data.datasource.partitioning import PathPartitionFilter

    from .expand import _expand

    if not patterns:
        return {}
    # build (or staleness-rebuild) first: WITHOUT this, a missing
    # ``trgm=<t>`` directory is ambiguous between "no term contains this
    # trigram" and "the dictionary was never built", and every pruned
    # pattern would silently expand to nothing
    root = build_trgm_dict(index_dir)
    pruned = [(q, p) for q, p in patterns if required_trigram(p) is not None]
    fallback = [(q, p) for q, p in patterns if required_trigram(p) is None]
    out: dict[int, list[str]] = {qid: [] for qid, _ in patterns}
    # a required trigram with NO partition directory now genuinely means
    # no dictionary term contains it — those patterns are answered empty
    # without a read (and Ray's read_parquet cannot take a zero-file set)
    pruned = [
        (q, p) for q, p in pruned
        if os.path.isdir(os.path.join(root, f"trgm={required_trigram(p)}"))
    ]
    if pruned:
        wanted = {required_trigram(p) for _, p in pruned}

        def keep(parts: dict) -> bool:
            return parts.get("trgm") in wanted

        pairs = (
            ray.data.read_parquet(
                _trgm_path(index_dir),
                partition_filter=PathPartitionFilter.of(keep),
                file_extensions=["parquet"],
                columns=["term", "df"],
            )
            .map_batches(
                _ExpandMatcher(pruned, "wildcard"),
                batch_format="pyarrow",
                batch_size=64 * 1024,
            )
            .to_pandas()
        )
        out.update(_merge_expansion(pairs, pruned, max_expansions))
    if fallback:
        out.update(_expand(index_dir, fallback, "wildcard", max_expansions))
    return out


def wildcard_search_trgm(
    index_dir: str,
    patterns: list[tuple[int, str]],
    *,
    k: int = 10,
    max_expansions: int | None = None,
    concurrency: int = 4,
    batch_size: int = 256,
    packs_ref=None,
) -> "ray.data.Dataset":
    """Wildcard retrieval over the trigram-pruned dictionary — identical
    ranking to ``stages/expand.wildcard_search`` (same boolean-OR
    rewrite), different READ: builds/reuses the trigram partition and
    expands against only the required partitions."""
    from .expand import _search_expanded

    build_trgm_dict(index_dir)
    exp = expand_wildcard_trgm(
        index_dir, patterns, max_expansions=max_expansions
    )
    return _search_expanded(
        index_dir, exp, k, concurrency, batch_size, packs_ref
    )
