"""Simulates the driver's correctness gate: run every queries() entry at
sf0.01 and compare row-count + columns + order-insensitive values
against the matching oracle_sql() via DuckDB."""

import glob
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(obj):
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return c


@pytest.fixture(scope="module")
def contract(ray_session):
    import importlib
    import __ray_entry__ as m

    importlib.reload(m)
    return m


def _entries():
    import __ray_entry__ as m

    qs = m.queries()
    sqls = m.oracle_sql()
    return [(name, name in sqls) for name in qs]


@pytest.mark.parametrize("name,has_sql", _entries())
def test_query_matches_oracle(contract, con, name, has_sql):
    fn = contract.queries()[name]
    got = _canon(_to_pandas(fn(SF_DIR)))
    if not has_sql:
        assert len(got) >= 0  # rows-only check (driver's weak mode)
        return
    expect = _canon(con.sql(contract.oracle_sql()[name]).df())
    assert list(got.columns) == list(expect.columns), (
        f"{name}: columns {list(got.columns)} != {list(expect.columns)}")
    assert len(got) == len(expect), f"{name}: rows {len(got)} != {len(expect)}"
    for col in got.columns:
        a, b = got[col], expect[col]
        if a.dtype.kind in "iu" or b.dtype.kind in "iu":
            assert (a.astype("int64").values == b.astype("int64").values).all(), (
                f"{name}.{col} mismatch")
        else:
            assert (a.astype(str).values == b.astype(str).values).all(), (
                f"{name}.{col} mismatch")


def test_entry_smoke(contract):
    out = _to_pandas(contract.entry())
    assert len(out) >= 0
    assert {"query_id", "rank", "doc_id", "score"} <= set(out.columns)
