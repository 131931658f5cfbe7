"""Guard against the q03 class of driver hash mismatch.

The driver's correctness gate compares Spark and DuckDB results through a
serialized-value hash.  DuckDB widens some aggregates to types Spark never
produces — ``count_if`` and ``SUM(INTEGER/BIGINT)`` return HUGEINT
(int128) — so a value-identical result can still hash-mismatch purely on
the serialized type (q03_monthly_kpis failed four rounds this way before
the root cause was found in round 4, VERDICT.md "What's wrong" #1).

This test runs every oracle in DuckDB at sf0.001 (cheap: no Spark) and
asserts each output column's type is in the whitelist of types the Spark
side can actually emit.  Any new oracle using an un-CAST HUGEINT producer
fails here instead of in the driver gate a round later.
"""

from __future__ import annotations

import duckdb
import pytest

from airflow_etl_pyspark_inmet_spark.plans import registry

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Types the Spark side emits (sql.Row -> driver serialization). DuckDB
# HUGEINT / UHUGEINT / DECIMAL / lists are NOT here on purpose: the Spark
# queries only return long/int/double/str/date/timestamp/bool columns.
ALLOWED = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP", "BOOLEAN"}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_oracle_output_types_whitelisted(con, name):
    rel = con.sql(registry.ORACLES[name])
    offending = {
        col: str(typ)
        for col, typ in zip(rel.columns, rel.types)
        if str(typ) not in ALLOWED
    }
    assert not offending, (
        f"{name}: oracle emits non-whitelisted DuckDB type(s) {offending}; "
        f"CAST them (HUGEINT producers like count_if/SUM(int) need "
        f"CAST(... AS BIGINT)) or the driver's value hash will mismatch "
        f"even when every value is equal."
    )
