"""The zero-shuffle sorted layout must produce byte-identical segments to
the general groupby layout (same deterministic builder kernel)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from defactonlp_ray import fixtures
from defactonlp_ray.sources import manifest as mf
from defactonlp_ray.stages.index_build import build_index


def test_sorted_layout_equals_grouped(tmp_path):
    n = 700
    pages = fixtures.make_pages(n)
    tbl = pa.table(
        {"doc_id": pa.array(range(n), pa.int64()), "text": pages["text"]}
    )
    a = str(tmp_path / "grouped")
    b = str(tmp_path / "sorted")
    build_index(ray.data.from_arrow(tbl), a, seg_docs=128, layout="grouped")
    # several blocks, still doc_id-ordered
    ds = ray.data.from_arrow(tbl).repartition(7)
    build_index(ds, b, seg_docs=128, layout="sorted")
    ra, rb = mf.read_manifest(a), mf.read_manifest(b)
    assert set(ra) == set(rb)
    for sid in ra:
        pa_tbl = pq.read_table(os.path.join(mf.segment_dir(a, sid), "postings.parquet"))
        pb_tbl = pq.read_table(os.path.join(mf.segment_dir(b, sid), "postings.parquet"))
        assert pa_tbl.equals(pb_tbl), sid
        da = pq.read_table(os.path.join(mf.segment_dir(a, sid), "docstats.parquet"))
        db = pq.read_table(os.path.join(mf.segment_dir(b, sid), "docstats.parquet"))
        assert da.equals(db), sid
