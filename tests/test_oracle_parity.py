"""Golden-query tests: every registered query with an oracle must
match DuckDB exactly at sf0.001 (fast local twin of the driver's
sf0.01 gate)."""

from __future__ import annotations

import pytest

from data_engineering_user_session_analysis_spark.queries import ORACLE, QUERIES
from tests.oracle_harness import compare, duckdb_conn


@pytest.fixture(scope="module")
def con(sf_small):
    c = duckdb_conn(sf_small)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(name, spark, sf_small, con):
    spark_df = QUERIES[name](spark, sf_small)
    oracle_pdf = con.execute(ORACLE[name]).fetchdf()
    problems = compare(name, spark_df, oracle_pdf)
    assert not problems, "\n".join(problems)


def test_all_queries_have_entries():
    assert QUERIES, "query registry is empty"
    missing = [n for n in ORACLE if n not in QUERIES]
    assert not missing, f"oracle without query: {missing}"
