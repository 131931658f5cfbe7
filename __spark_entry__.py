"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star query (daily supplier aggregate —
the fato_agg_previsoes_dia shape of the reference) on sf0.001.
``queries()``/``oracle_sql()`` expose the full operator inventory from
SURVEY.md §2 plus the LLM-data-pipeline extensions; implementations live
in ``airflow_etl_pyspark_inmet_spark.plans.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from airflow_etl_pyspark_inmet_spark.plans.registry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from airflow_etl_pyspark_inmet_spark.plans.queries_relational import (
        q2_daily_supplier_agg,
    )

    return q2_daily_supplier_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions).

    Each callable takes (spark, sf_dir) and returns a DataFrame. Every
    computed column is aliased identically in the Spark code and the
    oracle SQL.
    """
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query — every query key has one.
    Approximate/sketch operators (HLL, GK quantiles, simhash, LSH/IVF
    ANN) emit exact companion columns plus error/recall-envelope
    booleans, so their rows hash-match a deterministic oracle while the
    approximate tier is still exercised and validated in-engine."""
    return {k: v for k, v in ORACLES.items() if v is not None}
