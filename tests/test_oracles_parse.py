"""Fast guard: every oracle_sql() entry must parse and plan in DuckDB
against the real sf0.001 tables (EXPLAIN only — no execution), so
oracle syntax regressions surface in seconds instead of a full
correctness run."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def oracle_items():
    import __spark_entry__ as E

    return sorted(E.oracle_sql().items())


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def test_all_oracles_plan_in_duckdb(con, oracle_items):
    assert len(oracle_items) >= 80
    failures = []
    for name, sql in oracle_items:
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001 - we report every failure
            failures.append((name, str(e).splitlines()[0]))
    assert not failures, failures
