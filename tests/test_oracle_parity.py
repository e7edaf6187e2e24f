"""Driver-gate mirror: every catalog query with an oracle must
hash-match DuckDB on the same parquet (SURVEY.md §5.2 item 3)."""

from __future__ import annotations

import pytest

from ariadne_cartograph_spark.plans.catalog import REGISTRY, get_queries
from ariadne_cartograph_spark.plans.oracle_harness import compare, duckdb_connection

get_queries()  # populate REGISTRY

_WITH_ORACLE = sorted(n for n, e in REGISTRY.items() if e.oracle is not None)
_ROWS_ONLY = sorted(n for n, e in REGISTRY.items() if e.oracle is None)


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(name, spark, sf_dir, oracle_con):
    entry = REGISTRY[name]
    report = compare(name, entry.fn(spark, sf_dir), entry.oracle, sf_dir, con=oracle_con)
    assert report.ok, report.describe()


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(name, spark, sf_dir):
    entry = REGISTRY[name]
    df = entry.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(se.oracle_sql()) <= set(se.queries())
