"""Unit tests for the cleaning kit (SURVEY.md §2.6 semantics)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from airflow_etl_pyspark_inmet_spark.functions.cleaning import (
    date_parts,
    dayfirst_date,
    decimal_comma_to_double,
    sanitize_name,
    surrogate_key,
    zero_fill,
)


def test_decimal_comma(spark):
    rows = [(" ,9 ",), ("None",), ("nan",), ("1,5",), ("abc",), ("",), ("-48,25555555",), ("0",)]
    df = spark.createDataFrame(rows, ["x"])
    got = [r["d"] for r in df.select(decimal_comma_to_double("x").alias("d")).collect()]
    assert got == [0.9, None, None, 1.5, None, None, -48.25555555, 0.0]


def test_dayfirst_date(spark):
    rows = [("18/12/02",), ("19/12/2004",), ("2025/01/01",), ("31/02/2025",), ("junk",), (None,)]
    df = spark.createDataFrame(rows, ["s"])
    got = [r["d"] for r in df.select(dayfirst_date("s").alias("d")).collect()]
    assert got == [
        datetime.date(2002, 12, 18),  # dd/MM/yy, matches pandas dayfirst for 00-68
        datetime.date(2004, 12, 19),
        datetime.date(2025, 1, 1),
        None,  # impossible date -> coerce
        None,
        None,
    ]


def test_sanitize_name():
    # real INMET header names (FIXTURES.md §A)
    assert (
        sanitize_name("PRECIPITAÇÃO TOTAL, HORÁRIO (mm)")
        == "precipitacao_total_horario_mm"
    )
    assert (
        sanitize_name("TEMPERATURA DO AR - BULBO SECO, HORARIA (°C)")
        == "temperatura_do_ar_bulbo_seco_horaria_c"
    )
    assert sanitize_name("CODIGO (WMO)") == "codigo_wmo"


def test_surrogate_key_null_components(spark):
    df = spark.createDataFrame(
        [("a507", "mg", None)], "wmo string, uf string, estacao string"
    )
    got = df.select(surrogate_key("wmo", "uf", "estacao").alias("sk")).first()["sk"]
    assert got == "A507-MG-"  # null -> empty segment, never null key


def test_zero_fill_before_agg(spark):
    df = spark.createDataFrame([(1.0,), (None,), (3.0,)], ["m"])
    filled_avg = zero_fill(df, ["m"]).agg(F.avg("m")).first()[0]
    null_skip_avg = df.agg(F.avg("m")).first()[0]
    assert filled_avg == (1.0 + 0.0 + 3.0) / 3  # zeros participate
    assert null_skip_avg == 2.0  # SQL semantics would skip


def test_date_parts_iso_week(spark):
    # 2024-12-30 is ISO week 1 of 2025 — matches pandas isocalendar().week
    df = spark.createDataFrame([(datetime.date(2024, 12, 30),)], ["d"])
    parts = date_parts("d")
    row = df.select(*[e.alias(n) for n, e in parts.items()]).first()
    assert (row["dia"], row["mes"], row["ano"], row["quartil"], row["semana_do_ano"]) == (
        30, 12, 2024, 4, 1,
    )
