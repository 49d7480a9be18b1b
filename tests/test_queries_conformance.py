"""Operator conformance vs DuckDB (SURVEY.md §5.2 layer 2).

Mirrors the driver's check at sf0.001: for every query with an oracle,
run BOTH, compare row count, column-name set, and order-insensitive
values (floats to 1e-6). Rows-only queries are smoke-checked for
non-empty, stable schemas.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype(np.int64)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable", ignore_index=True)


ORACLED = sorted(entrymod.oracle_sql())
ALL = sorted(entrymod.queries())
ROWS_ONLY = [q for q in ALL if q not in ORACLED]


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(ray_session, sf_dir, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    eng = _canon(_to_pandas(q(sf_dir)))
    con = _duck(sf_dir)
    try:
        ora = _canon(con.sql(sql).df())
    finally:
        con.close()
    assert list(eng.columns) == list(ora.columns), (
        f"{name} columns {list(eng.columns)} != {list(ora.columns)}"
    )
    assert len(eng) == len(ora), f"{name} rows {len(eng)} != {len(ora)}"
    for c in eng.columns:
        if np.issubdtype(eng[c].dtype, np.floating) or np.issubdtype(
            ora[c].dtype, np.floating
        ):
            assert np.allclose(
                eng[c].astype(float), ora[c].astype(float), atol=1e-6, equal_nan=True
            ), f"{name}.{c} float mismatch"
        else:
            assert eng[c].tolist() == ora[c].tolist(), f"{name}.{c} value mismatch"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_smoke(ray_session, sf_dir, name):
    q = entrymod.queries()[name]
    df = _to_pandas(q(sf_dir))
    assert len(df) > 0, f"{name} returned no rows"
    assert len(df.columns) > 0
    # re-run determinism (same process): identical frame
    df2 = _to_pandas(q(sf_dir))
    pd.testing.assert_frame_equal(
        _canon(df), _canon(df2), check_dtype=False
    )


def test_entry_smoke(ray_session):
    res = entrymod.entry()
    df = _to_pandas(res)
    assert len(df) >= 0
    assert "image_id" in df.columns and "admin_id" in df.columns
