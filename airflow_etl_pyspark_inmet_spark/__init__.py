"""PySpark-native analytics engine with the capabilities of the reference
FlaviaLPF/airflow-etl-pyspark-INMET pipeline, rebuilt Spark-first.

Layout:
    session.py    SparkSession factory (AQE on, UTC, Arrow)
    schemas.py    canonical StructTypes (cidades, datas, previsoes, warehouse)
    sources/      distributed readers (INMET dual-section CSV, parquet warehouse)
    functions/    column-expression cleaning kit (decimal-comma, dayfirst dates, ...)
    operators/    reusable relational + LLM-data-pipeline operators
    plans/        end-to-end pipelines (INMET star schema build, analytics)
    streaming/    Structured Streaming operators over the events table

Everything is DataFrame/Catalyst-native: no pandas in the data path, no RDDs,
no driver-side row loops. See SURVEY.md for the reference inventory this
covers (file:line citations refer to /root/reference).
"""

__version__ = "0.1.0"
