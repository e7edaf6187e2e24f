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


def test_no_rows_only_entries_remain():
    """Round-7 invariant: EVERY catalog entry carries a full value-hash
    oracle (the last holdouts — BPE merge training, the enrichment
    fixture, and trained-IVF k-means — gained replay/census oracles).
    A new entry without one must be a deliberate, documented decision,
    not an accident."""
    assert _ROWS_ONLY == [], (
        f"entries without oracles: {_ROWS_ONLY} — add an oracle or "
        "document why the semantics are not SQL-expressible"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(se.oracle_sql()) <= set(se.queries())
