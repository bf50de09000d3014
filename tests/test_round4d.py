"""Round-4 post-mirror batch: ES match_bool_prefix semantics.

Load-bearing claims: (1) with an empty prefix expansion the scorer IS
plain TAAT (bit-exact equality); (2) the constant-score bonus applies
exactly once per doc no matter how many expanded terms hit; (3) a doc
matching ONLY the prefix clause is a real candidate (score == bonus)
and can outrank a weak BM25 match — i.e. the bonus folds in BEFORE the
bounded top-k.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from defactonlp_ray.stages import search as S
from defactonlp_ray.stages.expand import bool_prefix_search
from defactonlp_ray.stages.index_build import build_index


def _mini_index(tmp_path, texts):
    work = str(tmp_path)
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(texts)), type="int64"),
            "text": pa.array(texts),
        }),
        f"{work}/docs.parquet",
    )
    idx = f"{work}/index"
    build_index(ray.data.read_parquet(f"{work}/docs.parquet"), idx, seg_docs=4)
    return idx


TEXTS = [
    "data query fast data",          # 0: strong BM25 for (data, query)
    "sort merge sort sort",          # 1: prefix s* only (no full terms)
    "data table scan",               # 2: full term + s* prefix
    "window stream batch",           # 3: s* prefix only
    "value vector column",           # 4: neither
    "query data small data query",   # 5: full terms + s* prefix
]


def test_bool_prefix_empty_expansion_equals_taat(tmp_path):
    idx = _mini_index(tmp_path, TEXTS)
    queries = [(0, ["data", "query"], "zz"), (1, ["merge"], "zzz")]
    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in bool_prefix_search(idx, queries, k=5).take_all()
    )
    plain = S.search(
        idx,
        ray.data.from_arrow(pa.table({
            "query_id": pa.array([0, 1], type="int64"),
            "terms": pa.array([["data", "query"], ["merge"]]),
        })),
        k=5,
    ).take_all()
    want = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in plain
    )
    assert got == want  # bit-exact: bonus path untouched


def test_bool_prefix_bonus_once_and_prefix_only_docs(tmp_path):
    idx = _mini_index(tmp_path, TEXTS)
    res = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bool_prefix_search(
            idx, [(0, ["data", "query"], "s")], k=10
        ).take_all()
    }
    plain = {
        r["doc_id"]: r["score"]
        for r in S.search(
            idx,
            ray.data.from_arrow(pa.table({
                "query_id": pa.array([0], type="int64"),
                "terms": pa.array([["data", "query"]]),
            })),
            k=10,
        ).take_all()
    }
    # docs 1 and 3 match only the prefix clause: flat constant score,
    # and doc 1 matches THREE s* postings occurrences (sort x3) plus
    # merge -- still exactly one bonus
    assert res[(0, 1)] == S.BOOL_PREFIX_BONUS
    assert res[(0, 3)] == S.BOOL_PREFIX_BONUS
    # doc 4 matches neither clause: absent
    assert (0, 4) not in res
    # full+prefix docs: exactly BM25 + one bonus (docs 2 and 5 contain
    # several distinct s* terms in the corpus dictionary via 'scan',
    # 'small' -- one bonus each)
    for d in (2, 5):
        assert res[(0, d)] == plain[d] + S.BOOL_PREFIX_BONUS
    # BM25-only doc keeps its plain score
    assert res[(0, 0)] == plain[0]
    # promotion across the cut: prefix-only doc 1 outranks nothing with
    # bonus 1.0 vs doc 0's strong BM25, but MUST outrank absent docs and
    # sit in the candidate set -- and doc 2 (weak BM25 + bonus) must
    # outrank doc 0 only if the arithmetic says so; assert the full
    # ordering is by score desc
    ordered = sorted(res.items(), key=lambda kv: (-kv[1], kv[0][1]))
    ranks = {
        r["doc_id"]: r["rank"]
        for r in bool_prefix_search(
            idx, [(0, ["data", "query"], "s")], k=10
        ).take_all()
    }
    for pos, ((_q, d), _s) in enumerate(ordered, 1):
        assert ranks[d] == pos


def test_geohash_matches_reference_encoder():
    """geohash_bits/geohash_str vs an independent textbook bisection
    encoder (Niemeyer layout, lon bit first)."""
    from defactonlp_ray.functions import geo

    def ref_geohash(lat, lon, precision):
        alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
        lat_lo, lat_hi = -90.0, 90.0
        lon_lo, lon_hi = -180.0, 180.0
        bits, ch, out, even = 0, 0, [], True
        while len(out) < precision:
            if even:
                mid = (lon_lo + lon_hi) / 2
                if lon >= mid:
                    ch = (ch << 1) | 1
                    lon_lo = mid
                else:
                    ch <<= 1
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if lat >= mid:
                    ch = (ch << 1) | 1
                    lat_lo = mid
                else:
                    ch <<= 1
                    lat_hi = mid
            even = not even
            bits += 1
            if bits == 5:
                out.append(alphabet[ch])
                bits, ch = 0, 0
        return "".join(out)

    doc_ids = np.arange(0, 4000, 37, dtype=np.int64)
    lat, lon = geo.synth_coords_e6(doc_ids)
    got = geo.geohash_str(geo.geohash_bits(lat, lon))
    for i in range(len(doc_ids)):
        want = ref_geohash(lat[i] / 1e6, lon[i] / 1e6, geo.GEOHASH_PRECISION)
        assert got[i] == want, (doc_ids[i], lat[i], lon[i], got[i], want)
