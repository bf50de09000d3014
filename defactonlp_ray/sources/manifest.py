"""Checkpoint manifest + atomic segment writes (SURVEY.md §2.1 S8, §4).

The reference has no checkpointing (a crash = rerun the script — SURVEY.md
§4).  The north_rule makes resume a first-class requirement: each index
partition (segment) is written atomically (tmp dir + ``os.rename``,
ray_guide.md:180-184) and records a lineage line in ``manifest.jsonl``:
segment id, covered doc range, row/term/posting counts, total token count,
codec + tokenizer versions.  Resume = read the manifest, skip finished
segment ids (tested in tests/test_resume.py).

Writes happen inside Ray tasks on a shared filesystem in production; the
append is a single O_APPEND write of one line (atomic for line-sized writes
on POSIX), and replay dedupes by segment id keeping the LAST line, so a
retried task that re-appends after a crash is harmless (idempotent replay).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid


MANIFEST_NAME = "manifest.jsonl"


def segment_dir(index_dir: str, sid: int) -> str:
    return os.path.join(index_dir, "segments", f"seg={sid:06d}")


def atomic_write_dir(final_dir: str):
    """Context manager: yields a tmp dir; renames to ``final_dir`` on
    success; removes the tmp dir on failure.  A concurrent/retried writer
    losing the rename race just discards its tmp copy."""
    return _AtomicDir(final_dir)


class _AtomicDir:
    def __init__(self, final_dir: str):
        self.final_dir = final_dir
        parent = os.path.dirname(final_dir)
        os.makedirs(parent, exist_ok=True)
        self.tmp = os.path.join(parent, f".tmp-{os.path.basename(final_dir)}-{uuid.uuid4().hex[:8]}")

    def __enter__(self) -> str:
        os.makedirs(self.tmp, exist_ok=True)
        return self.tmp

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc_type is None:
            try:
                os.rename(self.tmp, self.final_dir)
            except OSError:
                # lost the race to a concurrent retry that already finished
                shutil.rmtree(self.tmp, ignore_errors=True)
        else:
            shutil.rmtree(self.tmp, ignore_errors=True)
        return False


def append_manifest(index_dir: str, record: dict) -> None:
    append_manifest_many(index_dir, [record])


def append_manifest_many(index_dir: str, records: list[dict]) -> None:
    """Append several records in ONE write: the single O_APPEND write is
    the atomic commit point for multi-record transitions (compaction
    publishes the merged segment AND retires its inputs in one buffer, so
    a crash can never leave both old and merged segments live)."""
    buf = "".join(json.dumps(r, sort_keys=True) + "\n" for r in records)
    path = os.path.join(index_dir, MANIFEST_NAME)
    fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o644)
    try:
        os.write(fd, buf.encode("utf-8"))
    finally:
        os.close(fd)


def manifest_version(index_dir: str) -> int:
    """Number of committed manifest records — the snapshot token.

    The manifest is an append-only last-line-wins log, so its record
    count is a monotonically increasing version: replaying the first
    ``v`` records (``read_manifest(..., at=v)``) reconstructs EXACTLY
    the segment membership live when ``manifest_version`` returned
    ``v`` — point-in-time reads while appends land, at the cost of one
    int.  Snapshots stay valid until a pinned segment's dir is
    physically removed — :func:`gc_retired`, which compaction runs as
    part of its commit, so a snapshot survives appends indefinitely but
    a compaction retiring its segments invalidates it."""
    path = os.path.join(index_dir, MANIFEST_NAME)
    if not os.path.exists(path):
        return 0
    with open(path, encoding="utf-8") as f:
        return sum(1 for line in f if line.strip())


def read_manifest_raw(
    index_dir: str, at: int | None = None
) -> dict[int, dict]:
    """Segment id -> last manifest record, unfiltered (tombstones and
    records whose dirs are gone included) — replay is last-line-wins.
    ``at`` replays only the first ``at`` records (snapshot read)."""
    path = os.path.join(index_dir, MANIFEST_NAME)
    out: dict[int, dict] = {}
    if not os.path.exists(path):
        return out
    seen = 0
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if at is not None and seen >= at:
                break
            seen += 1
            rec = json.loads(line)
            out[int(rec["sid"])] = rec
    return out


def read_manifest(index_dir: str, at: int | None = None) -> dict[int, dict]:
    """Segment id -> last manifest record; only records whose segment dir
    actually exists count as done (rename is the commit point), and a
    last record with ``retired: true`` (compaction tombstone) excludes
    the segment even while its dir awaits garbage collection.

    With ``at`` (a :func:`manifest_version` token) the replay stops
    after the first ``at`` records — the point-in-time view.  A
    snapshot segment whose dir has been garbage-collected is an ERROR
    (the snapshot was invalidated by :func:`gc_retired`), never a
    silent drop."""
    if at is None:
        return {
            sid: rec
            for sid, rec in read_manifest_raw(index_dir).items()
            if not rec.get("retired")
            and os.path.isdir(segment_dir(index_dir, sid))
        }
    out: dict[int, dict] = {}
    for sid, rec in read_manifest_raw(index_dir, at=at).items():
        if rec.get("retired"):
            continue
        if not os.path.isdir(segment_dir(index_dir, sid)):
            raise ValueError(
                f"snapshot at={at} of {index_dir} references segment "
                f"{sid} whose dir was garbage-collected; the snapshot "
                "is no longer readable"
            )
        out[sid] = rec
    return out


def gc_retired(index_dir: str) -> int:
    """Delete segment dirs whose LAST manifest record is a tombstone —
    pure garbage collection (the tombstone is the committed retirement),
    idempotent, safe to run any time.  Returns dirs removed."""
    removed = 0
    for sid, rec in read_manifest_raw(index_dir).items():
        if rec.get("retired") and os.path.isdir(segment_dir(index_dir, sid)):
            shutil.rmtree(segment_dir(index_dir, sid), ignore_errors=True)
            removed += 1
    return removed


def live_segment_order(recs: dict[int, dict]) -> list[int]:
    """Segment ids in ascending DOC order (doc_lo, then sid).  Readers
    must use this — not plain sid order — because compaction assigns
    merged segments fresh (higher) sids while they cover low doc ranges,
    and per-term posting concatenation relies on doc-ascending segments."""
    return sorted(recs, key=lambda sid: (recs[sid].get("doc_lo", sid), sid))


# ---------------------------------------------------------------- aliases

ALIAS_SUFFIX = ".alias"


def set_alias(alias_path: str, index_dir: str) -> None:
    """Atomically point ``alias_path`` (an ``*.alias`` file) at
    ``index_dir`` — the blue/green reindex switch: build the new index
    under a fresh dir, then ONE ``os.replace`` flips every subsequent
    reader; in-flight readers keep serving the dir they already
    resolved (their own consistency token, like a snapshot).
    """
    if not alias_path.endswith(ALIAS_SUFFIX):
        raise ValueError(f"alias path must end with {ALIAS_SUFFIX}: {alias_path}")
    os.makedirs(os.path.dirname(alias_path) or ".", exist_ok=True)
    tmp = alias_path + f".tmp-{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"target": os.path.abspath(index_dir)}, f)
    os.replace(tmp, alias_path)


def resolve_alias(path: str) -> str:
    """Resolve an ``*.alias`` file to its target index dir (identity for
    a plain index dir).  One level only — an alias pointing at another
    alias is an error, not a chain."""
    if not path.endswith(ALIAS_SUFFIX):
        return path
    with open(path, encoding="utf-8") as f:
        target = json.load(f)["target"]
    if target.endswith(ALIAS_SUFFIX):
        raise ValueError(f"alias chains are not allowed: {path} -> {target}")
    return target
