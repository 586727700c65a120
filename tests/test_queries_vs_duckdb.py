"""Driver-contract mirror: every oracle_sql() entry must match DuckDB exactly.

Runs each Ray pipeline from ``__ray_entry__.queries()`` at sf0.001 and
compares row count, column names, and (order-insensitive) values against the
matching SQL on the same parquet tables — the same check the driver performs
at sf0.01.
"""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = pd.DataFrame(df)
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _compare(ray_df, sql_df, name):
    a, b = _normalize(ray_df), _normalize(sql_df)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"{name}: rows {len(a)} != {len(b)}"
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if np.issubdtype(np.asarray(av).dtype, np.floating) or np.issubdtype(
            np.asarray(bv).dtype, np.floating
        ):
            assert np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9), (
                f"{name}: column {col} differs"
            )
        else:
            mism = [(x, y) for x, y in zip(av, bv) if x != y][:3]
            assert not mism, f"{name}: column {col} differs, e.g. {mism}"


def _oracle_names():
    import __ray_entry__ as e

    return sorted(e.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(name, ray_session, ddb):
    import __ray_entry__ as e

    q = e.queries()[name]
    sql = e.oracle_sql()[name]
    ray_res = q(SF_DIR)
    if hasattr(ray_res, "to_pandas"):
        ray_res = ray_res.to_pandas()
    sql_res = ddb.execute(sql).df()
    _compare(ray_res, sql_res, name)


def test_every_oracle_key_has_query():
    import __ray_entry__ as e

    missing = set(e.oracle_sql()) - set(e.queries())
    assert not missing


def test_entry_runs(ray_session):
    import __ray_entry__ as e

    out = e.entry()
    assert len(out) > 0
    assert {"fetch_seq", "url", "host", "depth", "round"} <= set(out.columns)
