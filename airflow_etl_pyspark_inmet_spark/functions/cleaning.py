"""Cleaning kit: native Column expressions replacing the reference's
driver-side pandas helpers (SURVEY.md §2.6).

Every function here is a pure `pyspark.sql.functions` composition — JVM-side,
whole-stage-codegen eligible, no Python UDFs — so the hot path stays
vectorized at any scale.
"""

from __future__ import annotations

import re
import unicodedata
from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def decimal_comma_to_double(col: str | Column) -> Column:
    """Parse a Brazilian decimal-comma string (``'916,1'``, ``',9'``,
    ``'None'``, ``''``) into a double, coercing junk to null.

    Replaces the reference's pandas ``converter_coluna_float``
    (job_parquet.py:149-173): strip, map {'', 'None', 'nan'} -> null,
    ``','`` -> ``'.'``, cast float. ``cast('double')`` already yields null
    on non-numeric input, matching errors='coerce'.
    """
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    c = F.when(c.isin("", "None", "nan"), None).otherwise(c)
    # try_cast, not cast: Spark 4 runs ANSI mode, where cast('abc' as double)
    # throws; the reference's errors='coerce' semantics require null.
    return F.replace(c, F.lit(","), F.lit(".")).try_cast("double")


def dayfirst_date(col: str | Column) -> Column:
    """Multi-format day-first date parse with coerce-to-null.

    Replicates pandas ``to_datetime(dayfirst=True, errors='coerce')``
    (job_parquet.py:95-97,190) for the formats present in INMET data:
    ``dd/MM/yyyy`` (19/12/2004), ``dd/MM/yy`` (18/12/02), and the
    measurement-date form ``yyyy/MM/dd`` (2025/01/01). ``try_to_date``
    (Spark >=3.5 semantics via to_date+coalesce) nulls on mismatch.
    """
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    # Order matters: a 4-digit-leading value must hit yyyy/MM/dd first; a
    # dd/MM/yyyy value must not be truncated by dd/MM/yy. Use regex guards so
    # each format only applies to strings of its exact shape.
    return F.coalesce(
        F.try_to_date(F.when(c.rlike(r"^\d{4}/\d{2}/\d{2}$"), c), "yyyy/MM/dd"),
        F.try_to_date(F.when(c.rlike(r"^\d{2}/\d{2}/\d{4}$"), c), "dd/MM/yyyy"),
        F.try_to_date(F.when(c.rlike(r"^\d{2}/\d{2}/\d{2}$"), c), "dd/MM/yy"),
    )


_SANITIZE_RE = re.compile(r"[^\w]+")


def sanitize_name(name: str) -> str:
    """NFKD accent-strip + non-word runs -> ``_`` + strip + lowercase.

    Same normalization the reference applies to CSV headers
    (job_parquet.py:138-145): ``'PRECIPITAÇÃO TOTAL, HORÁRIO (mm)'`` ->
    ``'precipitacao_total_horario_mm'``.
    """
    stripped = (
        unicodedata.normalize("NFKD", name).encode("ascii", "ignore").decode("ascii")
    )
    return _SANITIZE_RE.sub("_", stripped).strip("_").lower()


def sanitize_columns(df: DataFrame) -> DataFrame:
    """Rename every column through :func:`sanitize_name` (P3)."""
    return df.toDF(*[sanitize_name(c) for c in df.columns])


def surrogate_key(*cols: str, sep: str = "-") -> Column:
    """``CONCAT(TRIM(UPPER(COALESCE(c,''))), '-', ...)`` surrogate key.

    Mirrors ``cidade_sk`` (create_dim_cidade_atributos.sql:7-12):
    null components become empty segments, never null keys.
    """
    parts = [F.trim(F.upper(F.coalesce(F.col(c), F.lit("")))) for c in cols]
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, F.lit(sep), p)
    return out


def zero_fill(df: DataFrame, cols: Iterable[str]) -> DataFrame:
    """Null -> 0 on measure columns, applied BEFORE aggregation to match the
    reference's fillna semantics (job_parquet.py:214-220): zeros participate
    in AVG/MIN where SQL aggs would have skipped nulls."""
    return df.na.fill(0, subset=list(cols))


def date_parts(date_col: str | Column) -> dict[str, Column]:
    """dia/mes/ano/quartil/semana_do_ano extraction (job_parquet.py:269-276).

    Spark's ``weekofyear`` is ISO-8601, matching pandas
    ``isocalendar().week``.
    """
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return {
        "dia": F.dayofmonth(c).cast("int"),
        "mes": F.month(c).cast("int"),
        "ano": F.year(c).cast("int"),
        "quartil": F.quarter(c).cast("int"),
        "semana_do_ano": F.weekofyear(c).cast("int"),
    }
