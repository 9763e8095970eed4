"""Mimics the driver's correctness gate: every queries() entry vs its
oracle_sql() DuckDB equivalent on the same parquet tables — row count,
column names, and order-insensitive value equality (columns sorted by name,
rows sorted by all columns)."""

import os

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


QUERY_NAMES = sorted(entrymod.queries().keys())


def test_all_oracled_queries_inside_driver_window():
    """The driver's correctness harness runs only the FIRST 50 queries()
    entries (VERDICT r3 item 1): every oracle_sql key must sit inside
    that window, every oracle must have a query, and rows-only entries
    must all come after."""
    qs = list(entrymod.queries().keys())
    oracled = set(entrymod.oracle_sql().keys())
    assert oracled <= set(qs), f"orphan oracles: {oracled - set(qs)}"
    outside = [q for q in qs[50:] if q in oracled]
    assert not outside, f"oracled queries outside the 50-window: {outside}"
    inside_rows_only = [q for q in qs[:50] if q not in oracled]
    assert not inside_rows_only, (
        f"rows-only entries wasting window slots: {inside_rows_only}"
    )


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name, con, ray_session):
    q = entrymod.queries()[name]
    res = _to_pandas(q(SF_DIR))
    assert len(res) >= 0
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        # rows-only check (non-SQL-expressible op)
        assert res.shape[1] >= 1
        return
    want = con.execute(sql).fetchdf()
    assert len(res) == len(want), f"{name}: rows {len(res)} != {len(want)}"
    assert sorted(res.columns) == sorted(want.columns), (
        f"{name}: cols {sorted(res.columns)} != {sorted(want.columns)}"
    )
    # dtype-kind parity (int vs float vs bool vs object) — the driver's
    # schema check is dtype-sensitive; clean_corpus int64-vs-float64
    # slipped through before this guard (VERDICT r3 item 2)
    for c in res.columns:
        ka, kb = res[c].dtype.kind, want[c].dtype.kind
        ka = "i" if ka == "u" else ka
        kb = "i" if kb == "u" else kb
        assert ka == kb, (
            f"{name}: column {c} dtype kind {res[c].dtype} != {want[c].dtype}"
        )
    a, b = _normalize(res), _normalize(want)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)
