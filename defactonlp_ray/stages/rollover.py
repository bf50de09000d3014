"""Index rollover: size-conditioned generations behind a write alias.

The zero-coordination ingest pattern for an ever-growing corpus (the
Elasticsearch `_rollover` / ILM hot-phase shape): an index *family* is
a directory of generation indexes ``gen-00000``, ``gen-00001``, ... plus
a ``write.alias`` pointing at the generation that accepts ingest.  Each
:func:`ingest_rollover` call appends one chunk to the write generation
— unless that would push it past ``max_gen_docs``, in which case a new
generation is created and the write alias flips first (one atomic
``os.replace``; readers are unaffected).  Queries never touch the
alias: :func:`search_rollover` serves a *federated* search over every
generation with globally-combined stats (df summed, avgdl from summed
lengths), so ranking is bit-identical to one unified index — which is
exactly what the registry oracle checks.

Why generations instead of one index forever: at 100 TB each generation
is a bounded, immutable-after-roll unit — compaction, snapshots,
retention deletes and shard moves all operate on one generation without
touching the write path, and a full rebuild is never needed.

Crash windows (each tested in tests/test_rollover.py): ingest is
resumable per ``chunk_id`` via the family's ``ingest.log`` ledger (one
JSON line per COMPLETED chunk, appended last; a torn trailing line is
skipped as uncommitted).  Rolled builds stage into a
``pending-<chunk_id>`` dir and become a visible generation via ONE
``os.rename`` after the build fully finishes, and the roll decision is
a function of crash-invariant state only — see the recovery ladder in
:func:`ingest_rollover`'s docstring for the full window-by-window
account (mid-build, rename-without-flip, flip-without-ledger, and
mid-/unledgered-append are all repaired by re-running the ingest).

Requires ascending doc_ids across ingest calls (the same contract as
:func:`..stages.index_build.append_index`, which posting-list layout
imposes); web-crawl ingest keys on a monotone (fetch_time, sequence)
id, so this is the natural arrival order.
"""
from __future__ import annotations

import json
import os
import re
from typing import Optional

import ray.data

from ..sources import manifest as mf
from .index_build import append_index, build_index

__all__ = [
    "expire_generations",
    "generations",
    "ingest_rollover",
    "search_rollover",
    "write_generation",
]

_GEN_RE = re.compile(r"^gen-(\d{5})$")
_WRITE_ALIAS = "write.alias"
_LEDGER = "ingest.log"
_RETIRED = "retired.json"


def _retired_gens(family_root: str) -> set[str]:
    path = os.path.join(family_root, _RETIRED)
    if not os.path.exists(path):
        return set()
    with open(path, encoding="utf-8") as f:
        return set(json.load(f)["retired"])


def generations(family_root: str) -> list[str]:
    """Sorted list of the family's LIVE generation index dirs (only
    those with at least one finished manifest line — a generation
    created by a crashed roll that never indexed anything is invisible
    — and not retired by :func:`expire_generations`)."""
    if not os.path.isdir(family_root):
        return []
    retired = _retired_gens(family_root)
    out = []
    for name in sorted(os.listdir(family_root)):
        if _GEN_RE.match(name) and name not in retired:
            gen = os.path.join(family_root, name)
            if mf.read_manifest(gen):
                out.append(gen)
    return out


def expire_generations(family_root: str, *, keep_last: int) -> list[str]:
    """Retention (the ILM delete phase): retire all but the newest
    ``keep_last`` generations from SERVING with one atomic write of
    ``retired.json`` — in-flight searches keep the generation list they
    already resolved; subsequent :func:`search_rollover` calls never
    open the retired dirs.  Data dirs are left on disk for out-of-band
    GC (the manifest-tombstone pattern: retire-then-delete, never
    delete-then-hope).  The write generation cannot be retired
    (``keep_last >= 1``).  Idempotent; returns the retired dir names
    (cumulative)."""
    if keep_last < 1:
        raise ValueError("expire_generations: keep_last must be >= 1")
    live = generations(family_root)
    newly = [os.path.basename(g) for g in live[:-keep_last]]
    retired = sorted(_retired_gens(family_root) | set(newly))
    path = os.path.join(family_root, _RETIRED)
    tmp = path + f".tmp-{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"retired": retired}, f)
    os.replace(tmp, path)
    return retired


def write_generation(family_root: str) -> Optional[str]:
    """The generation the write alias currently points at (None before
    the first ingest)."""
    alias = os.path.join(family_root, _WRITE_ALIAS)
    if not os.path.exists(alias):
        return None
    return mf.resolve_alias(alias)


def _gen_doc_hi(gen_dir: str) -> int:
    recs = mf.read_manifest(gen_dir)
    return max((r["doc_hi"] for r in recs.values()), default=-1)


def _ledger_records(family_root: str) -> dict[str, str]:
    """chunk_id -> generation basename.  A torn or blank trailing line
    (crash mid-append of the ledger itself) is SKIPPED, not raised: a
    chunk without a complete ledger line is by definition uncommitted,
    and the ingest recovery below re-derives where it landed."""
    path = os.path.join(family_root, _LEDGER)
    if not os.path.exists(path):
        return {}
    recs: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except ValueError:
                continue  # torn line = uncommitted chunk
            recs[rec["chunk_id"]] = rec["gen"]
    return recs


def _ledger_append(family_root: str, chunk_id: str, gen_dir: str) -> None:
    path = os.path.join(family_root, _LEDGER)
    with open(path, "a", encoding="utf-8") as f:
        f.write(json.dumps(
            {"chunk_id": chunk_id, "gen": os.path.basename(gen_dir)}
        ) + "\n")
        f.flush()
        os.fsync(f.fileno())


def _new_generation(family_root: str) -> str:
    nums = [
        int(_GEN_RE.match(n).group(1))
        for n in os.listdir(family_root)
        if _GEN_RE.match(n)
    ]
    nxt = max(nums, default=-1) + 1
    return os.path.join(family_root, f"gen-{nxt:05d}")


def ingest_rollover(
    ds: "ray.data.Dataset",
    family_root: str,
    chunk_id: str,
    *,
    max_gen_docs: int,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    url_col: Optional[str] = None,
    seg_docs: int = 1 << 17,
    codec: str = "varint",
) -> str:
    """Ingest one chunk into the family, rolling the write generation
    first when it would exceed ``max_gen_docs``.  Returns the generation
    dir the chunk landed in; a chunk_id already in the ledger is a
    no-op (returns its recorded generation).  One ingest caller at a
    time per family (the web-ingest contract: chunks are a single
    ordered stream).

    Crash recovery, exhaustively (each window tested):
    * roll decision: from CRASH-INVARIANT state only — the write
      generation's doc count BELOW the chunk's min id (a partial append
      of this very chunk cannot flip the decision on re-run) — plus a
      leftover pending dir, which pins an already-started roll;
    * rolled builds stage into ``pending-<chunk_id>`` and become a
      ``gen-NNNNN`` via one ``os.rename`` AFTER the build fully
      finishes, so a generation dir is only ever visible complete —
      serving can never see (or re-build next to) a half-built roll;
    * rename done, alias flip lost: the newest generation covers the
      chunk while the alias points older — repair = re-flip + ledger;
    * alias flipped, ledger line lost: the write generation covers the
      chunk in BUILD-namespace segments — nothing to redo, just ledger;
      the same window after an APPEND (append-namespace sids) re-runs
      ``append_index``, which is an idempotent resume that also repairs
      a possibly-stale stats dir;
    * a torn trailing ledger line is skipped (see _ledger_records)."""
    from .index_build import APPEND_SID_BASE

    os.makedirs(family_root, exist_ok=True)
    recs = _ledger_records(family_root)
    if chunk_id in recs:
        return os.path.join(family_root, recs[chunk_id])
    alias = os.path.join(family_root, _WRITE_ALIAS)
    kw = dict(doc_id_col=doc_id_col, text_col=text_col, url_col=url_col,
              seg_docs=seg_docs, codec=codec)
    # one small-side stat, not a materialization: min + count of the chunk
    from ray.data.aggregate import Count, Min

    agg = ds.aggregate(Min(doc_id_col), Count())
    chunk_min = int(agg[f"min({doc_id_col})"])
    n_chunk = int(agg["count()"])
    gen = write_generation(family_root)
    gens = generations(family_root)
    newest = gens[-1] if gens else None
    pending = os.path.join(family_root, f"pending-{chunk_id}")

    if (
        newest is not None
        and newest != gen
        and _gen_doc_hi(newest) >= chunk_min
    ):
        # a committed roll whose alias flip was lost: re-flip, ledger
        mf.set_alias(alias, newest)
        target = newest
    elif gen is not None and _gen_doc_hi(gen) >= chunk_min:
        # the chunk (or a prefix) is already inside the write generation
        covering = [
            sid for sid, r in mf.read_manifest(gen).items()
            if r["doc_hi"] >= chunk_min
        ]
        if all(sid >= APPEND_SID_BASE for sid in covering):
            # crashed append: resume it (idempotent; re-derives stats)
            append_index(ds, gen, **kw)
        # else: a rolled build that already flipped the alias but lost
        # its ledger line — builds rename in whole, nothing to redo
        target = gen
    else:
        if gen is None:
            roll = True
        elif os.path.isdir(pending):
            roll = True  # an earlier run already decided: finish it
        else:
            # docs strictly below the chunk — invariant across re-runs
            n_gen_clean = sum(
                r["n_docs"]
                for r in mf.read_manifest(gen).values()
                if r["doc_hi"] < chunk_min
            )
            roll = n_gen_clean + n_chunk > max_gen_docs
        if roll:
            build_index(ds, pending, resume=True, **kw)
            target = _new_generation(family_root)
            os.rename(pending, target)   # the commit point
            mf.set_alias(alias, target)  # the flip
        else:
            append_index(ds, gen, **kw)
            target = gen
    _ledger_append(family_root, chunk_id, target)
    return target


def search_rollover(
    family_root: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """Query the whole family: federated search over every generation
    with combined global stats — bit-identical to one unified index
    (the registry oracle is the plain single-index BM25 SQL)."""
    from .search import federated_search

    gens = generations(family_root)
    if not gens:
        raise ValueError(f"search_rollover: no generations in {family_root}")
    return federated_search(
        gens, queries, k=k, concurrency=concurrency, batch_size=batch_size
    )
