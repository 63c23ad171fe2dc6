"""Driver-style correctness gate: every queries() entry vs its DuckDB oracle
at sf0.01 (the exact comparison the driver records in CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.oracle import compare, duckdb_conn

QUERY_NAMES = sorted(entrymod.queries())


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_CORRECT)
    yield c
    c.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_vs_oracle(spark, con, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    df = q(spark, SF_CORRECT)
    if sql is None:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    problems = compare(df, con, sql)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_all_queries_have_smoke_rows(spark):
    for name, q in entrymod.queries().items():
        assert q(spark, SF_SMOKE).count() >= 0, name
