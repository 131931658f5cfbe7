#!/usr/bin/env python
"""Dump .explain("formatted") for named registry queries to files.

Usage: python scripts/dump_query_plan.py OUTDIR SUFFIX [query ...]
  Writes OUTDIR/<query>_<SUFFIX>.txt for each query (default: the
  bench.py HEADLINE set). Explain-only — no jobs are executed beyond
  whatever bounded driver work a query's own construction performs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        import bench

        names = bench.HEADLINE
    os.makedirs(outdir, exist_ok=True)
    from airflow_etl_pyspark_inmet_spark.plans.registry import QUERIES
    from airflow_etl_pyspark_inmet_spark.session import get_spark

    spark = get_spark(app_name="dump_query_plan")
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(_formatted(df))
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
