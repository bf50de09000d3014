"""Trigram-partitioned dictionary (stages/trgm.py, pg_trgm model):
kernel vs a Python trigram reference, required-trigram extraction, and
the pruned expansion's result-identity with the streamed route —
including a physical-pruning proof (unrelated partitions deleted from
disk, pruned queries unaffected)."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data

from defactonlp_ray.stages.expand import expand_wildcard
from defactonlp_ray.stages.index_build import build_index
from defactonlp_ray.stages.trgm import (
    build_trgm_dict,
    expand_wildcard_trgm,
    required_trigram,
    term_trigrams,
)

TERM = st.text(alphabet="abc012", min_size=0, max_size=8)


def _py_trgms(t: str) -> set[str]:
    return {t[i : i + 3] for i in range(max(0, len(t) - 2))}


@settings(max_examples=200, deadline=None)
@given(st.lists(TERM, min_size=0, max_size=20))
def test_term_trigrams_equals_python(terms):
    tbl = term_trigrams(pa.array(terms, pa.string()))
    got: dict[int, set] = {}
    for i, g in zip(tbl["term_idx"].to_pylist(), tbl["trgm"].to_pylist()):
        got.setdefault(i, set()).add(g)
    for i, t in enumerate(terms):
        assert got.get(i, set()) == _py_trgms(t), t
    # pairs are distinct
    assert len(tbl) == sum(len(_py_trgms(t)) for t in terms)


def test_required_trigram_rules():
    assert required_trigram("merge") == "mer"
    assert required_trigram("%can%") == "can"
    assert required_trigram("sor%") == "sor"
    assert required_trigram("s%") is None
    assert required_trigram("_a__") is None
    assert required_trigram("%%") is None
    assert required_trigram("cust%mer") == "cus"   # longest run wins
    assert required_trigram("ab%longest") == "lon"


@pytest.fixture(scope="module")
def trgm_index(sf_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("trgmidx"))
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    build_index(docs, idx, seg_docs=256, resume=False)
    build_trgm_dict(idx)
    return idx


PATTERNS = [
    (0, "merge"), (1, "%can%"), (2, "sor%"), (3, "s%"),
    (4, "cust%mer"), (5, "%zzz%"), (6, "_a__"),
]


def test_pruned_expansion_equals_streamed(trgm_index):
    assert expand_wildcard_trgm(trgm_index, PATTERNS) == expand_wildcard(
        trgm_index, PATTERNS
    )
    assert expand_wildcard_trgm(
        trgm_index, PATTERNS, max_expansions=2
    ) == expand_wildcard(trgm_index, PATTERNS, max_expansions=2)


def test_pruning_is_physical(trgm_index, tmp_path):
    """Deleting every partition EXCEPT the required ones must not change
    the pruned queries' results — proof the route never opens the
    unrelated partitions."""
    src = os.path.join(trgm_index, "stats", "term_trgm")
    clone_root = str(tmp_path / "idxclone")
    shutil.copytree(trgm_index, clone_root)
    tdir = os.path.join(clone_root, "stats", "term_trgm")
    keep = {"trgm=mer", "trgm=sor"}
    for name in os.listdir(tdir):
        if name.startswith("trgm=") and name not in keep:
            shutil.rmtree(os.path.join(tdir, name))
    pruned_only = [(0, "merge"), (2, "sor%")]
    assert expand_wildcard_trgm(clone_root, pruned_only) == expand_wildcard(
        trgm_index, pruned_only
    )


def test_build_is_idempotent(trgm_index):
    out = build_trgm_dict(trgm_index)   # second call: _SUCCESS short-circuit
    assert os.path.exists(os.path.join(out, "_SUCCESS"))


def test_all_patterns_with_missing_trigram_partitions(trgm_index):
    """Patterns whose required trigram has NO partition on disk must
    answer empty (no dictionary term contains the trigram) instead of
    crashing on a zero-file read."""
    got = expand_wildcard_trgm(trgm_index, [(0, "%zzz%"), (1, "qqq%")])
    assert got == {0: [], 1: []}
