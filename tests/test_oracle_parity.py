"""Local mirror of the driver's correctness gate: run every queries()
entry at sf0.01 and compare against its oracle_sql() via DuckDB —
row count + column names + order-insensitive values (SURVEY.md §5.2.5).
"""

import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from defactonlp_ray.pipelines import queries as Q

SF_DIR = "/root/testdata/sf0.01"


def _to_pandas(obj):
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for p in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')"
        )
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


ALL_ORACLES = dict(Q.ORACLES)
ALL_ORACLES.update(Q.pinned_oracles())
SQL_CHECKED = sorted(ALL_ORACLES)
ROWS_ONLY = sorted(set(Q.QUERIES) - set(ALL_ORACLES))


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_duckdb_oracle(name):
    got = _normalize(_to_pandas(Q.QUERIES[name](SF_DIR)))
    want = _normalize(_duck(ALL_ORACLES[name]))
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for c in got.columns:
        if pd.api.types.is_float_dtype(got[c]):
            ok = np.allclose(got[c], want[c], rtol=0, atol=0, equal_nan=True)
        else:
            ok = got[c].equals(want[c])
        assert ok, f"{name}: column {c} differs\n{got[c].head()}\n{want[c].head()}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name):
    got = _to_pandas(Q.QUERIES[name](SF_DIR))
    assert got is not None
    assert len(got) >= 0
