"""Warehouse layer (S8-S10) + SQL surface tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_etl_pyspark_inmet_spark.plans.warehouse import (
    create_stage_tables,
    ctas,
    register_testdata_views,
    save_table,
)


def test_stage_ddl_creates_typed_tables(spark):
    create_stage_tables(spark, db="stage")
    cols = dict(spark.table("stage.dim_cidades").dtypes)
    assert cols["latitude"] == "decimal(11,8)"
    assert cols["data_fundacao"] == "date"
    assert spark.table("stage.fato_previsoes").count() == 0


def test_save_table_and_ctas_roundtrip(spark, sf_small):
    sup = spark.read.parquet(f"{sf_small}/supplier.parquet")
    save_table(sup, "supplier_dim", db="analitic")
    assert spark.table("analitic.supplier_dim").count() == sup.count()

    register_testdata_views(spark, sf_small)
    out = ctas(
        spark,
        "supplier_by_nation",
        "SELECT s_nationkey, COUNT(*) AS n FROM lineitem "
        "JOIN supplier ON l_suppkey = s_suppkey GROUP BY s_nationkey",
    )
    assert out.count() > 0
    # overwrite semantics: second CTAS replaces, not appends
    out2 = ctas(
        spark,
        "supplier_by_nation",
        "SELECT s_nationkey, COUNT(*) AS n FROM supplier GROUP BY s_nationkey",
    )
    assert out2.count() == spark.table("analitic.supplier_by_nation").count()


def test_sql_surface_matches_dataframe_api(spark, sf_small):
    """The SQL text of the reference's analytic query shape produces the
    same result as the DataFrame implementation (same Catalyst plan)."""
    from airflow_etl_pyspark_inmet_spark.plans.queries_relational import (
        q21_three_way_join,
    )

    register_testdata_views(spark, sf_small)
    sql = spark.sql(
        """
        SELECT n_name, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )
    df = q21_three_way_join(spark, sf_small)
    a = {tuple(r) for r in sql.collect()}
    b = {tuple(r) for r in df.collect()}
    assert a == b
