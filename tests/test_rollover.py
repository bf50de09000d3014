"""Index rollover: size-conditioned generations behind a write alias."""

import json
import os
import tempfile

import pyarrow as pa
import pytest

import ray.data

from defactonlp_ray import fixtures
from defactonlp_ray.sources import manifest as mf
from defactonlp_ray.stages.index_build import build_index
from defactonlp_ray.stages.rollover import (
    generations,
    ingest_rollover,
    search_rollover,
    write_generation,
)
from defactonlp_ray.stages.search import search


def _docs_ds(lo: int, hi: int) -> "ray.data.Dataset":
    pages = fixtures.make_pages_range(lo, hi)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(lo, hi), pa.int64()),
                "text": pages["text"],
            }
        )
    )


def _qds():
    queries = fixtures.make_query_terms(6)
    return ray.data.from_arrow(pa.table({
        "query_id": pa.array([q for q, _ in queries], pa.int64()),
        "terms": pa.array(
            [t for _, t in queries], pa.list_(pa.string())
        ),
    }))


@pytest.fixture(scope="module")
def family():
    """4 chunks of 200 docs, max_gen_docs=400: build, append, roll,
    append — two generations."""
    root = os.path.join(tempfile.mkdtemp(), "fam")
    for i in range(4):
        ingest_rollover(
            _docs_ds(i * 200, (i + 1) * 200), root, f"c{i}",
            max_gen_docs=400, seg_docs=128,
        )
    return root


def test_generation_layout(family):
    gens = generations(family)
    assert [os.path.basename(g) for g in gens] == ["gen-00000", "gen-00001"]
    # write alias points at the newest generation
    assert write_generation(family) == gens[-1]
    # exactly the roll condition: 400 docs per generation
    for g in gens:
        assert sum(r["n_docs"] for r in mf.read_manifest(g).values()) == 400


def test_exact_fill_does_not_roll(family):
    # chunk c1 filled gen-00000 to exactly max_gen_docs without rolling
    with open(os.path.join(family, "ingest.log")) as f:
        recs = {
            json.loads(line)["chunk_id"]: json.loads(line)["gen"]
            for line in f
        }
    assert recs == {
        "c0": "gen-00000", "c1": "gen-00000",
        "c2": "gen-00001", "c3": "gen-00001",
    }


def test_search_equals_unified_index(family):
    unified = os.path.join(tempfile.mkdtemp(), "uni")
    build_index(_docs_ds(0, 800), unified, seg_docs=128)
    a = (
        search_rollover(family, _qds(), k=10, concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        search(unified, _qds(), k=10, concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    # bit-identical: federated stats combine exactly
    assert a.equals(b)


def test_ledger_makes_reingest_a_noop(family):
    gens_before = generations(family)
    got = ingest_rollover(
        _docs_ds(0, 200), family, "c0", max_gen_docs=400, seg_docs=128
    )
    assert os.path.basename(got) == "gen-00000"
    assert generations(family) == gens_before
    assert sum(
        r["n_docs"] for g in gens_before for r in mf.read_manifest(g).values()
    ) == 800


def test_crash_before_ledger_resumes_same_generation():
    """The append finished but the ledger line never landed: the re-run
    must detect the doc-range overlap and resume into the SAME
    generation instead of re-deciding the roll (duplicating docs)."""
    root = os.path.join(tempfile.mkdtemp(), "fam")
    ingest_rollover(_docs_ds(0, 200), root, "c0",
                    max_gen_docs=400, seg_docs=128)
    ingest_rollover(_docs_ds(200, 400), root, "c1",
                    max_gen_docs=400, seg_docs=128)
    # simulate the crash window: drop c1's ledger line
    ledger = os.path.join(root, "ingest.log")
    with open(ledger) as f:
        lines = [l for l in f if json.loads(l)["chunk_id"] != "c1"]
    with open(ledger, "w") as f:
        f.writelines(lines)
    got = ingest_rollover(_docs_ds(200, 400), root, "c1",
                          max_gen_docs=400, seg_docs=128)
    assert os.path.basename(got) == "gen-00000"
    gens = generations(root)
    assert len(gens) == 1
    assert sum(r["n_docs"] for r in mf.read_manifest(gens[0]).values()) == 400


def test_search_empty_family_raises(tmp_path):
    with pytest.raises(ValueError, match="no generations"):
        search_rollover(str(tmp_path), _qds())


def test_retention_retires_all_but_newest():
    from defactonlp_ray.stages.rollover import expire_generations

    root = os.path.join(tempfile.mkdtemp(), "fam")
    for i in range(4):
        ingest_rollover(_docs_ds(i * 200, (i + 1) * 200), root, f"c{i}",
                        max_gen_docs=400, seg_docs=128)
    retired = expire_generations(root, keep_last=1)
    assert retired == ["gen-00000"]
    gens = generations(root)
    assert [os.path.basename(g) for g in gens] == ["gen-00001"]
    # serving equals a plain index over only the live generation's docs
    solo = os.path.join(tempfile.mkdtemp(), "solo")
    build_index(_docs_ds(400, 800), solo, seg_docs=128)
    a = (
        search_rollover(root, _qds(), k=10, concurrency=2)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    b = (
        search(solo, _qds(), k=10, concurrency=2)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert a.equals(b)
    # idempotent; write generation survives; ingest continues to work
    assert expire_generations(root, keep_last=1) == ["gen-00000"]
    assert os.path.basename(write_generation(root)) == "gen-00001"
    ingest_rollover(_docs_ds(800, 900), root, "c4",
                    max_gen_docs=400, seg_docs=128)
    assert [os.path.basename(g) for g in generations(root)] == [
        "gen-00001", "gen-00002"
    ]


def test_retention_keep_last_must_be_positive(tmp_path):
    from defactonlp_ray.stages.rollover import expire_generations

    with pytest.raises(ValueError, match="keep_last"):
        expire_generations(str(tmp_path), keep_last=0)


def _ingest4(root):
    for i in range(4):
        ingest_rollover(_docs_ds(i * 200, (i + 1) * 200), root, f"c{i}",
                        max_gen_docs=400, seg_docs=128)


def test_crash_roll_flip_lost_ledger_lost():
    """Roll committed the rename AND the alias flip but lost its ledger
    line: the re-run must recognize the build-namespace coverage and
    only re-ledger — never append into (or duplicate past) the new
    generation."""
    root = os.path.join(tempfile.mkdtemp(), "fam")
    _ingest4(root)
    # c2 was the roll into gen-00001; drop its ledger line
    ledger = os.path.join(root, "ingest.log")
    with open(ledger) as f:
        lines = [l for l in f if json.loads(l)["chunk_id"] != "c2"]
    with open(ledger, "w") as f:
        f.writelines(lines)
    got = ingest_rollover(_docs_ds(400, 600), root, "c2",
                          max_gen_docs=400, seg_docs=128)
    assert os.path.basename(got) == "gen-00001"
    gens = generations(root)
    assert [os.path.basename(g) for g in gens] == ["gen-00000", "gen-00001"]
    assert sum(
        r["n_docs"] for g in gens for r in mf.read_manifest(g).values()
    ) == 800


def test_crash_rename_done_flip_lost():
    """Roll committed the rename but crashed BEFORE the alias flip: the
    newest generation covers the chunk while the alias points older —
    the re-run re-flips and ledgers instead of rebuilding a duplicate
    generation."""
    import shutil

    from defactonlp_ray.stages.rollover import write_generation as wg

    root = os.path.join(tempfile.mkdtemp(), "fam")
    for i in range(2):
        ingest_rollover(_docs_ds(i * 200, (i + 1) * 200), root, f"c{i}",
                        max_gen_docs=400, seg_docs=128)
    # simulate: build c2's roll generation out-of-band (rename done),
    # alias still on gen-00000, no ledger line
    build_index(_docs_ds(400, 600), os.path.join(root, "gen-00001"),
                seg_docs=128)
    assert os.path.basename(wg(root)) == "gen-00000"
    got = ingest_rollover(_docs_ds(400, 600), root, "c2",
                          max_gen_docs=400, seg_docs=128)
    assert os.path.basename(got) == "gen-00001"
    assert os.path.basename(wg(root)) == "gen-00001"
    gens = generations(root)
    assert len(gens) == 2
    assert sum(
        r["n_docs"] for g in gens for r in mf.read_manifest(g).values()
    ) == 600
    shutil.rmtree(root, ignore_errors=True)


def test_crash_mid_pending_build_resumes_roll():
    """Crash mid-build of a rolled generation: the pending dir pins the
    roll decision and the build resumes into it — one generation, no
    duplicates."""
    root = os.path.join(tempfile.mkdtemp(), "fam")
    for i in range(2):
        ingest_rollover(_docs_ds(i * 200, (i + 1) * 200), root, f"c{i}",
                        max_gen_docs=400, seg_docs=128)
    # simulate a half-built pending dir for c2 (one finished segment)
    pending = os.path.join(root, "pending-c2")
    build_index(_docs_ds(400, 600), pending, seg_docs=128)
    import shutil as _sh

    # drop the stats dir to look half-done; resume must repair it
    _sh.rmtree(os.path.join(pending, "stats"), ignore_errors=True)
    got = ingest_rollover(_docs_ds(400, 600), root, "c2",
                          max_gen_docs=400, seg_docs=128)
    assert os.path.basename(got) == "gen-00001"
    assert not os.path.isdir(pending)
    gens = generations(root)
    assert len(gens) == 2


def test_torn_ledger_line_is_skipped():
    root = os.path.join(tempfile.mkdtemp(), "fam")
    ingest_rollover(_docs_ds(0, 200), root, "c0",
                    max_gen_docs=400, seg_docs=128)
    with open(os.path.join(root, "ingest.log"), "a") as f:
        f.write('{"chunk_id": "c1"')  # torn mid-write, no newline
    # ingest of c1 proceeds (the torn line is uncommitted) and of c0 is
    # still a no-op
    got = ingest_rollover(_docs_ds(200, 400), root, "c1",
                          max_gen_docs=400, seg_docs=128)
    assert os.path.basename(got) == "gen-00000"
    assert os.path.basename(
        ingest_rollover(_docs_ds(0, 200), root, "c0",
                        max_gen_docs=400, seg_docs=128)
    ) == "gen-00000"
    gens = generations(root)
    assert sum(
        r["n_docs"] for g in gens for r in mf.read_manifest(g).values()
    ) == 400
