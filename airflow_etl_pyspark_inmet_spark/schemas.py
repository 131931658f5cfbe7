"""Canonical StructTypes for the engine's star schema.

Mirrors the reference data model (SURVEY.md §1, FIXTURES.md §B/§C):
`cidades` / `datas` dimensions and the `previsoes` hourly fact, plus the
warehouse outputs. Unlike the reference — which carries dates as
``yyyy-MM-dd`` strings (job_parquet.py:100,191) and types them only in the
Snowflake DDL — the engine uses real ``DateType`` end-to-end.
"""

from __future__ import annotations

from pyspark.sql import types as T

# -- staged tables -----------------------------------------------------------

# One row per station; reference build: job_parquet.py:57-104.
CIDADES = T.StructType(
    [
        T.StructField("regiao", T.StringType()),
        T.StructField("uf", T.StringType()),
        T.StructField("estacao", T.StringType()),
        T.StructField("wmo", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("altitude", T.DoubleType()),
        T.StructField("data_fundacao", T.DateType()),
    ]
)

# Dense daily calendar; reference build: job_parquet.py:261-280.
DATAS = T.StructType(
    [
        T.StructField("data_medicao", T.DateType()),
        T.StructField("dia", T.IntegerType()),
        T.StructField("mes", T.IntegerType()),
        T.StructField("ano", T.IntegerType()),
        T.StructField("quartil", T.IntegerType()),
        T.StructField("semana_do_ano", T.IntegerType()),
    ]
)

# Hourly measurement fact; reference build: job_parquet.py:108-225.
PREVISOES = T.StructType(
    [
        T.StructField("wmo", T.StringType()),
        T.StructField("data_medicao", T.DateType()),
        T.StructField("precipitacao_mm", T.DoubleType()),
        T.StructField("pressao_atm_kpa", T.DoubleType()),  # mB mislabeled kPa; misnomer preserved
        T.StructField("temperatura_c", T.DoubleType()),
        T.StructField("umidade_porcentagem", T.DoubleType()),
        T.StructField("vento_mps", T.DoubleType()),
    ]
)

# The 5 measure columns of the fact, zero-filled before aggregation
# (job_parquet.py:214-220 — fill BEFORE agg changes AVG/MIN semantics
# vs null-skipping; parity requires reproducing it).
MEASURE_COLS = [
    "precipitacao_mm",
    "pressao_atm_kpa",
    "temperatura_c",
    "umidade_porcentagem",
    "vento_mps",
]

# Raw INMET measurement header after name-sanitization (FIXTURES.md §A);
# 19 physical columns, all read as string then cleaned.
INMET_BODY_COLUMNS = [
    "data",
    "hora_utc",
    "precipitacao_total_horario_mm",
    "pressao_atmosferica_ao_nivel_da_estacao_horaria_mb",
    "pressao_atmosferica_max_na_hora_ant_aut_mb",
    "pressao_atmosferica_min_na_hora_ant_aut_mb",
    "radiacao_global_kj_m2",
    "temperatura_do_ar_bulbo_seco_horaria_c",
    "temperatura_do_ponto_de_orvalho_c",
    "temperatura_maxima_na_hora_ant_aut_c",
    "temperatura_minima_na_hora_ant_aut_c",
    "temperatura_orvalho_max_na_hora_ant_aut_c",
    "temperatura_orvalho_min_na_hora_ant_aut_c",
    "umidade_rel_max_na_hora_ant_aut",
    "umidade_rel_min_na_hora_ant_aut",
    "umidade_relativa_do_ar_horaria",
    "vento_direcao_horaria_gr_gr",
    "vento_rajada_maxima_m_s",
    "vento_velocidade_horaria_m_s",
]

# raw sanitized name -> canonical fact measure name (job_parquet.py:149-179)
MEASURE_RENAMES = {
    "precipitacao_total_horario_mm": "precipitacao_mm",
    "pressao_atmosferica_max_na_hora_ant_aut_mb": "pressao_atm_kpa",
    "temperatura_do_ar_bulbo_seco_horaria_c": "temperatura_c",
    "umidade_relativa_do_ar_horaria": "umidade_porcentagem",
    "vento_velocidade_horaria_m_s": "vento_mps",
}
