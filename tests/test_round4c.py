"""Round-4 additions: geo kernels, greedy k-center, exact PCA,
bucketed join layout, distance_feature bound.

Load-bearing claims: (1) k-center selection is parallelism-invariant
(fixed-point distances; per-block argmax + driver reduce == whole-matrix
Gonzalez sweep); (2) the PCA Gram is EXACT under any partitioning
(integer matmul partials); (3) geo coordinate synthesis and tile-x are
pure integer arithmetic (engine-independent by construction) and the
centroid floor rule avoids the banker's-vs-away rounding divergence.
"""

import numpy as np
import pyarrow as pa

import ray.data

from defactonlp_ray.functions import geo
from defactonlp_ray.stages import cluster


def _emb_table(n=90, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim))
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(vecs.astype(np.float64))),
    })


def test_kcenter_invariant_to_partitioning():
    t = _emb_table()
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    serial = cluster.kcenter_select(ids, m, 7)
    for parts in (1, 4, 13):
        ds = ray.data.from_arrow(t).repartition(parts)
        df = cluster.kcenter_greedy(ds, 7)
        assert df["vec_id"].tolist() == [c[0] for c in serial]
        assert np.allclose(
            df["radius"].to_numpy(),
            np.round(np.array([c[1] for c in serial]) / cluster._D2SCALE, 6),
        )


def test_kcenter_covers_distinct_points():
    # on k distinct far-apart points, k-center must pick all of them
    pts = np.eye(5) * 100.0
    t = pa.table({
        "vec_id": pa.array(np.arange(5, dtype=np.int64)),
        "embedding": pa.array(list(pts)),
    })
    df = cluster.kcenter_greedy(ray.data.from_arrow(t), 5)
    assert sorted(df["vec_id"].tolist()) == [0, 1, 2, 3, 4]
    # final selection radius shrinks to the remaining-pair distance
    assert (df["radius"].to_numpy()[1:] > 0).all()


def test_pca_gram_exact_any_partitioning():
    t = _emb_table(n=70, dim=8, seed=11)
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    q = cluster._quantize(m)
    want_s = q.sum(axis=0)
    want_g = q.T @ q
    for parts in (1, 5, 9):
        ds = ray.data.from_arrow(t).repartition(parts)
        n, sum_q, gram_q = cluster.pca_gram(ds)
        assert n == 70
        assert (np.asarray(sum_q, dtype=np.int64) == want_s).all()
        assert (np.asarray(gram_q, dtype=np.int64) == want_g).all()


def test_pca_eigen_matches_numpy_cov():
    t = _emb_table(n=200, dim=6, seed=5)
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    n, sum_q, gram_q = cluster.pca_gram(ray.data.from_arrow(t))
    out = cluster.pca_eigen(n, sum_q, gram_q, n_top=6)
    ref = np.linalg.eigvalsh(np.cov(m.T, bias=True))[::-1]
    # quantization at 2^20 perturbs the spectrum only in the ~1e-6 tail
    assert np.allclose(out["eigenvalue"].to_numpy(), ref, atol=1e-4)
    assert abs(out["ratio"].sum() - (ref[:6].sum() / ref.sum())) < 1e-3


def test_geo_synth_in_range_and_deterministic():
    d = np.arange(0, 5000, dtype=np.int64)
    lat, lon = geo.synth_coords_e6(d)
    assert lat.min() >= -85_000_000 and lat.max() < 85_000_000
    assert lon.min() >= -180_000_000 and lon.max() < 180_000_000
    lat2, lon2 = geo.synth_coords_e6(d.copy())
    assert (lat == lat2).all() and (lon == lon2).all()


def test_geotile_xy_bounds_and_x_exact():
    d = np.arange(0, 2000, dtype=np.int64)
    lat, lon = geo.synth_coords_e6(d)
    for zoom in (0, 3, 6):
        x, y = geo.geotile_xy(lat, lon, zoom)
        n = 1 << zoom
        assert x.min() >= 0 and x.max() < n
        assert y.min() >= 0 and y.max() < n
        # tile-x is pure integer arithmetic: recompute in Python ints
        want = [(int(v) + 180_000_000) * n // 360_000_000 for v in lon[:50]]
        assert x[:50].tolist() == want


def test_haversine_known_points():
    # origin to itself = 0; antipodal-ish sanity; symmetry in formula
    lat = np.array([48_856_600], dtype=np.int64)
    lon = np.array([2_352_200], dtype=np.int64)
    d0 = geo.haversine_km(lat, lon, 48.8566, 2.3522)
    assert abs(float(d0[0])) < 1e-6
    d1 = geo.haversine_km(lat, lon, -48.8566, -177.6478)
    # antipode of Paris -> half the circumference ~ 20015 km
    assert abs(float(d1[0]) - np.pi * geo.EARTH_R_KM) < 1.0


def test_split_segment_preserves_search(tmp_path):
    import pyarrow.parquet as pq

    from defactonlp_ray import fixtures
    from defactonlp_ray.sources import manifest as mf
    from defactonlp_ray.stages import search as S
    from defactonlp_ray.stages.index_build import build_index, split_segment
    from defactonlp_ray.stages.fsck import fsck_index

    work = str(tmp_path)
    pages = fixtures.make_pages(600)
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(600), type="int64"),
            "text": pages["text"],
        }),
        f"{work}/docs.parquet",
    )
    idx = f"{work}/index"
    build_index(ray.data.read_parquet(f"{work}/docs.parquet"), idx, seg_docs=300)
    queries = fixtures.make_query_terms(4)
    qds = pa.table({
        "query_id": pa.array([q for q, _ in queries], type="int64"),
        "terms": pa.array([t for _, t in queries]),
    })

    def run():
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
            for r in S.search(idx, ray.data.from_arrow(qds), k=8).take_all()
        )

    before = run()
    n_before = len(mf.read_manifest(idx))
    out = split_segment(idx)
    assert out is not None
    recs = mf.read_manifest(idx)
    assert len(recs) == n_before + 1
    # halves cover disjoint doc ranges in live order
    order = mf.live_segment_order(recs)
    los = [recs[s]["doc_lo"] for s in order]
    his = [recs[s]["doc_hi"] for s in order]
    assert all(h < l for h, l in zip(his, los[1:]))
    assert run() == before
    rep = fsck_index(idx)
    assert int(rep["n_errors"].sum()) == 0
    assert int(rep["n_docs"].iloc[0]) == 600


def test_split_segment_tiny_segment_noop(tmp_path):
    import pyarrow.parquet as pq

    from defactonlp_ray.stages.index_build import build_index, split_segment

    work = str(tmp_path)
    pq.write_table(
        pa.table({
            "doc_id": pa.array([0], type="int64"),
            "text": pa.array(["one tiny doc"]),
        }),
        f"{work}/docs.parquet",
    )
    idx = f"{work}/index"
    build_index(ray.data.read_parquet(f"{work}/docs.parquet"), idx, seg_docs=64)
    assert split_segment(idx) is None


def test_int_bloom_no_false_negatives():
    from defactonlp_ray.stages.bloom import int_bloom_build, int_bloom_maybe

    rng = np.random.default_rng(9)
    keys = rng.integers(-(2**62), 2**62, size=500, dtype=np.int64)
    bits, m = int_bloom_build(keys)
    assert int_bloom_maybe(keys, bits, m).all()
    other = rng.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
    other = other[~np.isin(other, keys)]
    fp = int_bloom_maybe(other, bits, m).mean()
    assert fp < 0.02  # ~0.8% expected at 10 bits/key, 7 hashes
    assert int_bloom_maybe(np.array([], dtype=np.int64), bits, m).size == 0
