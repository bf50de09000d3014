"""BM25F fielded retrieval tests (stages/fielded.py).

Reference check model: a scalar pure-Python BM25F over the pinned
tokenizer (bit-exact float expressions), plus the degenerate identity
BM25F(w=1, w=1) == plain single-field BM25 (tf/dl/df all collapse to
the unfielded quantities)."""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from defactonlp_ray.functions.tokenizer import tokenize
from defactonlp_ray.stages import search as S
from defactonlp_ray.stages.deletes import delete_docs
from defactonlp_ray.stages.fielded import (
    FieldedReader,
    build_fielded_index,
    fielded_search,
    score_bm25f,
    split_fields,
)
from defactonlp_ray.stages.index_build import build_index

K1, B = 1.2, 0.75
TITLE_LEN = 6


@pytest.fixture(scope="module")
def docs_tbl(sf_dir):
    return pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


@pytest.fixture(scope="module")
def fidx(sf_dir, docs_tbl, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("fidx"))
    ds = ray.data.from_arrow(docs_tbl)
    build_fielded_index(
        split_fields(ds, title_len=TITLE_LEN), idx, seg_docs=128, resume=False
    )
    return idx


def test_split_fields_matches_python(docs_tbl):
    out = (
        split_fields(ray.data.from_arrow(docs_tbl), title_len=TITLE_LEN)
        .to_pandas()
        .sort_values("doc_id")
    )
    for _i, row in out.head(50).iterrows():
        toks = tokenize(row["text"])
        assert row["title"] == " ".join(toks[:TITLE_LEN])
        assert row["body"] == " ".join(toks[TITLE_LEN:])


def _py_bm25f(docs: dict[int, list[str]], terms: list[str],
              wt: float, wb: float) -> dict[int, float]:
    """Scalar reference: same expression shapes as the engine."""
    n = len(docs)
    tl = {d: float(len(t[:TITLE_LEN])) for d, t in docs.items()}
    bl = {d: float(len(t[TITLE_LEN:])) for d, t in docs.items()}
    total = sum(wt * tl[d] + wb * bl[d] for d in docs)
    avg = total / n
    out: dict[int, float] = {}
    for t in sorted(set(terms)):
        tfc = {}
        for d, toks in docs.items():
            c = wt * toks[:TITLE_LEN].count(t) + wb * toks[TITLE_LEN:].count(t)
            if c:
                tfc[d] = float(c)
        if not tfc:
            continue
        df = len(tfc)
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, c in tfc.items():
            dlc = wt * tl[d] + wb * bl[d]
            wq = (c * (K1 + 1.0)) / (c + K1 * (1.0 - B + B * dlc / avg))
            out[d] = out.get(d, 0.0) + idf * wq
    return out


def test_score_bm25f_matches_scalar_reference(fidx, docs_tbl):
    docs = {
        int(d): tokenize(t)
        for d, t in zip(
            docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist()
        )
    }
    fr = FieldedReader(fidx, {"title": 2.0, "body": 1.0})
    for terms in (["hash", "join"], ["scan"], ["the", "data", "query"]):
        ref = _py_bm25f(docs, terms, 2.0, 1.0)
        got = score_bm25f(fr, terms, k=len(ref) or 1)
        assert len(got) == len(ref)
        for score, doc_id in got:
            assert score == ref[doc_id]  # bit-exact: same expression shape
        keys = [(-s, d) for s, d in got]
        assert keys == sorted(keys)


def test_unit_weights_equal_plain_bm25(fidx, sf_dir, tmp_path_factory):
    """BM25F(1, 1) collapses to single-field BM25: tf_c = tf, dl_c = dl,
    df = plain df — bit-exact against the TAAT scorer."""
    plain = str(tmp_path_factory.mktemp("plainidx"))
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    build_index(docs, plain, seg_docs=128, resume=False)
    reader = S.IndexReader(plain)
    fr = FieldedReader(fidx, {"title": 1.0, "body": 1.0})
    assert fr.n_docs == reader.n_docs
    assert fr.avgdl_c == reader.avgdl
    for terms in (["hash", "join"], ["merge", "sort"], ["zzz"]):
        ts = sorted(set(terms))
        reader.dfs(ts)
        idfs = {t: reader.idf(t) for t in ts}
        want = S.score_all_taat(reader, reader.seg_ids, ts, idfs, 10)
        got = score_bm25f(fr, terms, 10)
        assert got == want


def test_title_boost_reorders(fidx):
    """A term in the title must outscore the same term in the body of an
    otherwise-equal doc when w_title > w_body."""
    fr = FieldedReader(fidx, {"title": 2.0, "body": 1.0})
    fr1 = FieldedReader(fidx, {"title": 1.0, "body": 1.0})
    # some query where boost changes at least one pairwise order
    changed = False
    for terms in (["hash"], ["join"], ["scan"], ["merge"]):
        a = [d for _s, d in score_bm25f(fr, terms, 50)]
        b = [d for _s, d in score_bm25f(fr1, terms, 50)]
        if a != b:
            changed = True
            break
    assert changed


def test_fielded_search_pipeline_and_deletes(fidx, docs_tbl):
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([0, 1], pa.int64()),
                "terms": pa.array(
                    [["hash", "join"], ["zzz"]], pa.list_(pa.string())
                ),
            }
        )
    )
    res = fielded_search(fidx, qds, k=10, concurrency=2).to_pandas()
    assert set(res["query_id"]) == {0}
    assert res["rank"].tolist() == list(range(1, len(res) + 1))
    top = set(res["doc_id"].head(5))
    # deletes at the fielded root mask every field at once
    delete_docs(fidx, sorted(top))
    qds2 = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([0], pa.int64()),
                "terms": pa.array([["hash", "join"]], pa.list_(pa.string())),
            }
        )
    )
    res2 = fielded_search(fidx, qds2, k=10, concurrency=2).to_pandas()
    assert not res2["doc_id"].isin(top).any()


def test_short_docs_have_empty_body(fidx, tmp_path):
    """Docs shorter than title_len land entirely in the title field; the
    body index still carries them in docstats (len 0) so dl lookups hit."""
    idx = str(tmp_path / "fshort")
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                ["one two", "a b c d e f g h", "single"], pa.string()
            ),
        }
    )
    build_fielded_index(
        split_fields(ray.data.from_arrow(tbl), title_len=TITLE_LEN),
        idx,
        seg_docs=8,
        resume=False,
    )
    fr = FieldedReader(idx, {"title": 2.0, "body": 1.0})
    assert fr.n_docs == 3
    assert fr.field_len("body", np.array([0, 1, 2])).tolist() == [0.0, 2.0, 0.0]
    got = score_bm25f(fr, ["single"], 5)
    assert [d for _s, d in got] == [2]


def test_fielded_subindexes_inherit_compaction(fidx, tmp_path, docs_tbl):
    """The docstring claim: field subindexes are normal segment indexes,
    so compaction applies per field and BM25F results stay invariant."""
    import shutil

    from defactonlp_ray.stages.fielded import _field_dir
    from defactonlp_ray.stages.index_build import compact_index

    idx2 = str(tmp_path / "fcopy")
    shutil.copytree(fidx, idx2)
    fr_before = FieldedReader(fidx, {"title": 2.0, "body": 1.0})
    want = score_bm25f(fr_before, ["hash", "join"], 10)
    merged = 0
    for f in ("title", "body"):
        merged += compact_index(_field_dir(idx2, f), target_seg_docs=100_000)
    assert merged >= 2
    fr_after = FieldedReader(idx2, {"title": 2.0, "body": 1.0})
    got = score_bm25f(fr_after, ["hash", "join"], 10)
    assert got == want


# ------------------------------------------------ dis_max (best_fields)


def _py_dismax(docs: dict[int, list[str]], terms: list[str],
               tie: float) -> dict[int, float]:
    """Scalar reference: per-field BM25 with the field's OWN stats,
    then max + tie * (sum - max) over the MATCHING fields."""
    n = len(docs)
    fields = {
        "body": {d: t[TITLE_LEN:] for d, t in docs.items()},
        "title": {d: t[:TITLE_LEN] for d, t in docs.items()},
    }
    per_field: dict[str, dict[int, float]] = {}
    for f in sorted(fields):
        fd = fields[f]
        avg = sum(len(t) for t in fd.values()) / n
        sf: dict[int, float] = {}
        for t in sorted(set(terms)):
            tfs = {d: toks.count(t) for d, toks in fd.items() if t in toks}
            if not tfs:
                continue
            df = len(tfs)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for d, c in tfs.items():
                w = (c * (K1 + 1.0)) / (
                    c + K1 * (1.0 - B + B * float(len(fd[d])) / avg)
                )
                sf[d] = sf.get(d, 0.0) + idf * w
        per_field[f] = sf
    out: dict[int, float] = {}
    matched = set().union(*[set(s) for s in per_field.values()])
    for d in matched:
        ss = [per_field[f][d] for f in sorted(per_field) if d in per_field[f]]
        total, best = sum(ss), max(ss)
        out[d] = best + tie * (total - best) if len(ss) > 1 else best
    return out


def test_score_dismax_matches_scalar_reference(fidx, docs_tbl):
    from defactonlp_ray.stages.fielded import score_dismax

    docs = {
        int(d): tokenize(t)
        for d, t in zip(
            docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist()
        )
    }
    fr = FieldedReader(fidx, {"title": 2.0, "body": 1.0})
    # the module fixture may carry deletes from earlier tests — the
    # scorer masks them, so the reference must too
    dead = set(fr.deleted.tolist())
    for terms in (["hash", "join"], ["scan"], ["the", "data", "query"]):
        ref = {
            d: s for d, s in _py_dismax(docs, terms, tie=0.5).items()
            if d not in dead
        }
        got = score_dismax(fr, terms, k=len(ref) or 1, tie=0.5)
        assert len(got) == len(ref), terms
        for score, doc_id in got:
            assert score == pytest.approx(ref[doc_id], abs=0, rel=0), (
                terms, doc_id,
            )


def test_dismax_tie_one_equals_field_sum(fidx, docs_tbl):
    """tie=1.0 degenerates to max + (sum - max) = plain sum of the
    matching per-field scores."""
    from defactonlp_ray.stages.fielded import score_dismax

    docs = {
        int(d): tokenize(t)
        for d, t in zip(
            docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist()
        )
    }
    fr = FieldedReader(fidx, {"title": 2.0, "body": 1.0})
    dead = set(fr.deleted.tolist())
    ref = {
        d: s for d, s in _py_dismax(docs, ["data", "merge"], tie=1.0).items()
        if d not in dead
    }
    got = score_dismax(fr, ["data", "merge"], k=len(ref), tie=1.0)
    for score, doc_id in got:
        assert score == pytest.approx(ref[doc_id], abs=1e-12)


# ----------------------------------------- cross_fields (multi_match)


def _py_cross_fields(docs: dict[int, list[str]], terms: list[str],
                     tie: float) -> dict[int, float]:
    """Scalar reference: per TERM, per-field BM25 quotient with the
    field's own tf/len/avgdl but a BLENDED df = max over field dfs;
    the term contributes max + tie * (sum - max) over its matching
    fields; the doc sums terms."""
    n = len(docs)
    fields = {
        "body": {d: t[TITLE_LEN:] for d, t in docs.items()},
        "title": {d: t[:TITLE_LEN] for d, t in docs.items()},
    }
    avg = {f: sum(len(t) for t in fd.values()) / n
           for f, fd in fields.items()}
    out: dict[int, float] = {}
    for t in sorted(set(terms)):
        per_field: dict[str, dict[int, float]] = {}
        dfs = []
        for f in sorted(fields):
            fd = fields[f]
            tfs = {d: toks.count(t) for d, toks in fd.items() if t in toks}
            if tfs:
                dfs.append(len(tfs))
            per_field[f] = tfs
        if not dfs:
            continue
        df = max(dfs)  # blended df
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        scores: dict[int, list[float]] = {}
        for f in sorted(fields):
            fd = fields[f]
            for d, c in per_field[f].items():
                w = (c * (K1 + 1.0)) / (
                    c + K1 * (1.0 - B + B * float(len(fd[d])) / avg[f])
                )
                scores.setdefault(d, []).append(idf * w)
        for d, ss in scores.items():
            best, total = max(ss), sum(ss)
            # contrib FIRST, then accumulate — the engine's (and the
            # pinned) association; `out + best + tie*(...)` re-associates
            # and drifts a ulp
            contrib = best + tie * (total - best)
            out[d] = out.get(d, 0.0) + contrib
    return out


@pytest.mark.parametrize("tie", [0.0, 0.5])
def test_score_cross_fields_matches_scalar_reference(fidx, docs_tbl, tie):
    from defactonlp_ray.stages.fielded import score_cross_fields

    docs = {
        int(d): tokenize(t)
        for d, t in zip(
            docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist()
        )
    }
    fr = FieldedReader(fidx)
    dead = set(fr.deleted.tolist())
    for terms in (["hash", "join"], ["scan"], ["the", "data", "query"]):
        ref = {
            d: s for d, s in _py_cross_fields(docs, terms, tie).items()
            if d not in dead
        }
        got = score_cross_fields(fr, terms, k=len(ref) or 1, tie=tie)
        assert len(got) == len(ref), terms
        for score, doc_id in got:
            assert score == pytest.approx(ref[doc_id], abs=0, rel=0), (
                terms, doc_id,
            )


def test_cross_fields_accumulates_terms_across_fields(fidx, docs_tbl):
    """The cross_fields vs best_fields distinction: the doc score is
    TERM-additive — a doc matching the two query terms in DIFFERENT
    fields scores the sum of the two single-term cross_fields scores
    (best_fields/dismax instead maxes whole-query field scores)."""
    from defactonlp_ray.stages.fielded import score_cross_fields

    docs = {
        int(d): tokenize(t)
        for d, t in zip(
            docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist()
        )
    }
    fr = FieldedReader(fidx)
    dead = set(fr.deleted.tolist())
    split = None
    for d, toks in docs.items():
        if d in dead:
            continue
        title, body = set(toks[:TITLE_LEN]), set(toks[TITLE_LEN:])
        t_only = (title - body) - {""}
        b_only = (body - title) - {""}
        if t_only and b_only:
            split = (d, sorted(t_only)[0], sorted(b_only)[0])
            break
    assert split is not None
    d, t_term, b_term = split

    def one(terms):
        return dict(
            (doc, s)
            for s, doc in score_cross_fields(fr, terms, k=10**9, tie=0.0)
        )

    both, only_t, only_b = one([t_term, b_term]), one([t_term]), one([b_term])
    ref = _py_cross_fields(docs, [t_term, b_term], 0.0)
    assert both[d] == pytest.approx(ref[d], abs=0, rel=0)
    assert both[d] == pytest.approx(only_t[d] + only_b[d], rel=1e-12)
    assert only_t[d] > 0.0 and only_b[d] > 0.0
