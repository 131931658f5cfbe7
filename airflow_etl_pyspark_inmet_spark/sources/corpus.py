"""Text-corpus sources/sinks beyond the INMET CSV reader: JSONL (the
lingua franca of LLM training corpora) and partitioned parquet.

JSONL reads declare an explicit schema — schema inference over 100 TB of
JSON is a full extra pass; never pay it. Reads are line-splittable, so a
directory of .jsonl(.gz) files parallelizes per HDFS block (gzip: per
file — prefer zstd/uncompressed shards at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """Read newline-delimited JSON with a declared schema. Corrupt lines
    land in ``_corrupt_record`` (PERMISSIVE) instead of failing the scan —
    web-scale corpora always contain a few."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, shards: int | None = None) -> None:
    """Write a corpus as JSONL shards. ``shards`` controls output file
    count (repartition, not coalesce: coalesce(1) would single-thread the
    final stage)."""
    w = df.repartition(shards) if shards else df
    w.write.mode("overwrite").json(path)
