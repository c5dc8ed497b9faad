"""Driver-gate replica: every queries() entry vs its oracle_sql()
twin on sf0.001, compared the way the driver does (column names
aligned, row order ignored, values exact)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _to_df(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as m

    return m


def test_entry_smoke(entry_mod):
    res = _to_df(entry_mod.entry())
    assert len(res) >= 0
    assert list(res.columns)


def _oracle_keys():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as m

    return sorted(m.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_keys())
def test_query_matches_oracle(entry_mod, con, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got = _canon(_to_df(q(SF)))
    want = _canon(con.sql(sql).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for c in got.columns:
        gv, wv = got[c], want[c]
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            assert (gv.astype(float).round(9) == wv.astype(float).round(9)).all(), \
                f"{name}.{c}"
        else:
            assert (gv.astype(str).values == wv.astype(str).values).all(), f"{name}.{c}"


def test_rows_only_queries_run(entry_mod):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name, fn in qs.items():
        if name in oracles:
            continue
        df = _to_df(fn(SF))
        assert df is not None, name
        assert list(df.columns), name
