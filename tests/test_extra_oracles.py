"""Local oracle gate for queries retired from the driver registry.

queries() is capped at 50 entries because the driver's correctness
harness only checks the first 50 (VERDICT r4 #1).  The retired queries
(extra_queries()) must not silently rot, so this test replays the SAME
comparison the driver runs — row count + column set + sorted stringified
values against a DuckDB oracle — at sf0.001, plus the two per-mode
round-trip 0-row contracts.
"""

import os

import duckdb
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"create view {t} as select * from '{SF}/{t}.parquet'")
    yield c
    c.close()


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return sorted(tuple(r) for r in df.astype(str).itertuples(index=False))


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
@pytest.mark.parametrize("name", sorted(E.extra_oracle_sql()))
def test_extra_query_matches_oracle(spark, con, name):
    sdf = E.extra_queries()[name](spark, SF).toPandas()
    odf = con.sql(E.extra_oracle_sql()[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    assert _canon(sdf) == _canon(odf)


@pytest.mark.parametrize(
    "name", ["pipeline_roundtrip_violations_i64",
             "pipeline_roundtrip_violations_4byte",
             "pipeline_roundtrip_violations_archive"]
)
def test_roundtrip_gates_zero_rows(spark, name):
    assert E.extra_queries()[name](spark, SF).count() == 0


def test_registry_fits_driver_window():
    """The driver hash-checks only the first 50 queries() entries; every
    registered query must sit inside that window, and every oracle key
    must be registered."""
    qs = list(E.queries())
    assert len(qs) <= 50
    assert set(E.oracle_sql()) <= set(qs)
