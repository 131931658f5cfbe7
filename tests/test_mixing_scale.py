"""Scale-shape tests for the mixing/ordering family (VERDICT r14 items
1-3): the per-group ranks that previously rode single-task
``Window.partitionBy(epoch/phase/stratum)`` windows now ride
``relational.grouped_rank`` (range-partitioned), and the one rank
filter that legitimately keeps the window form — ``domain_cap``'s
literal cap — must KEEP compiling to a WindowGroupLimit pre-keep (its
scale safety rests on that Spark 3.5+ optimization; this test fails if
the plan ever loses it).

Beyond-reference scope: the reference ETL
(/root/reference/pyspark-stack/spark-apps/script/job_parquet.py) has no
corpus curation; this family is the training-data-pipeline extension
set mandated by the build brief.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from airflow_etl_pyspark_inmet_spark.operators.mixing import (
    curriculum_order,
    domain_cap,
    mixture_sample,
)
from airflow_etl_pyspark_inmet_spark.operators.relational import (
    grouped_rank,
    stratified_sample,
)


def _docs(spark, n=200, n_groups=3):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % n_groups).cast("int").alias("grp"),
        F.concat(F.lit("w"), (F.col("id") % 17).cast("string")).alias(
            "text"
        ),
    )


def test_grouped_rank_matches_window_row_number(spark):
    df = _docs(spark).withColumn(
        "_pri", (F.col("doc_id") * 2654435761) % 1048576
    )
    w = Window.partitionBy("grp").orderBy("_pri", "doc_id")
    ref = df.withColumn("rnk", F.row_number().over(w).cast("bigint"))
    got = grouped_rank(df, ["grp"], [F.col("_pri"), F.col("doc_id")], "rnk")
    assert ref.exceptAll(got).count() == 0
    assert got.exceptAll(ref).count() == 0


def test_grouped_rank_total_col_and_null_group(spark):
    df = _docs(spark, n=50).withColumn(
        "grp", F.when(F.col("doc_id") % 5 != 0, F.col("grp"))
    )
    got = grouped_rank(
        df, ["grp"], [F.col("doc_id")], "rnk", total_col="tot"
    )
    # every group (including NULL) keeps all rows, ranks are 1..tot
    assert got.count() == 50
    bad = got.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("rnk").alias("mx"),
        F.min("rnk").alias("mn"),
        F.max("tot").alias("t"),
    ).filter(
        (F.col("n") != F.col("mx"))
        | (F.col("mn") != 1)
        | (F.col("t") != F.col("n"))
    )
    assert bad.count() == 0


def test_grouped_rank_empty_input(spark):
    df = _docs(spark).filter("doc_id < 0")
    assert grouped_rank(df, ["grp"], [F.col("doc_id")], "rnk").count() == 0


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_domain_cap_compiles_to_window_group_limit(spark):
    # x2's scale safety rests on the literal-cap rank filter compiling
    # to WindowGroupLimit (map-side k-per-group pre-keep). If a Spark
    # upgrade or a refactor loses this, each stratum's full membership
    # sorts on one task again — fail loudly here, not at 100 TB.
    out = domain_cap(_docs(spark), cap=5, strat_col="grp")
    assert "WindowGroupLimit" in _physical(out)


def test_mixing_rewrites_carry_no_partitioned_window(spark):
    # the fixed x1/x5/t11 plans must not contain any WindowExec over
    # corpus rows: their only windows ride grouped_rank's tiny
    # per-(partition, group) counts frame, which sits BELOW the
    # broadcast-join attach. Assert no Window node consumes the
    # corpus-side range sort (i.e. every WindowExec in the plan sits
    # under a HashAggregate — the counts frame).
    targets = {0: 30, 1: 10, 2: 25}
    out = mixture_sample(
        _docs(spark).withColumn("grp", F.col("grp").cast("string")),
        {str(k): v for k, v in targets.items()},
        strat_col="grp",
    )
    plan = _physical(out)
    # window exists (the prefix-sum over counts) but no row_number over
    # the raw corpus: the rank column comes from monotonically
    # increasing id arithmetic, not a window function
    assert "row_number" not in plan
    for op in (
        curriculum_order(
            _docs(spark).withColumn("text", F.col("text")), n_phases=4
        ),
        stratified_sample(_docs(spark), "grp", "doc_id", percent=10),
    ):
        assert "row_number" not in _physical(op)


def test_mixture_sample_distributes_each_stratum(spark):
    # the scale property itself: with shuffle_partitions=8, one
    # stratum's rows must land on MULTIPLE range partitions (the old
    # window form pinned each stratum to exactly one task)
    # AQE's partition coalescing legitimately merges 400 tiny rows into
    # one partition — disable it for the observation; at real scale the
    # range partitions are far above the coalesce threshold.
    old = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        df = spark.range(400).select(
            F.col("id").alias("doc_id"), F.lit("only").alias("grp")
        ).withColumn("_pri", (F.col("doc_id") * 2654435761) % 1048576)
        ranked = grouped_rank(
            df, ["grp"], [F.col("_pri"), F.col("doc_id")], "rnk"
        )
        n_parts = (
            ranked.select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
        assert n_parts > 1, "single stratum must span multiple partitions"
    finally:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", old
        )


def test_curriculum_order_positions_are_per_phase_permutations(spark):
    out = curriculum_order(_docs(spark), n_phases=4)
    bad = out.groupBy("phase").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("pos").alias("mx"),
        F.min("pos").alias("mn"),
        F.count_distinct("pos").alias("nd"),
    ).filter(
        (F.col("n") != F.col("mx"))
        | (F.col("mn") != 1)
        | (F.col("nd") != F.col("n"))
    )
    assert bad.count() == 0


def test_grouped_rank_guard_trips_before_corruption(spark):
    # the 2^33 in-plan guard: force a single range partition holding
    # "too many" rows by monkey-lowering the bound is not possible via
    # the public surface, so assert the guard EXPRESSION is present in
    # the plan instead (assert_true survives optimization because the
    # filter consumes it).
    df = _docs(spark)
    ranked = grouped_rank(df, ["grp"], [F.col("doc_id")], "rnk")
    # the optimizer rewrites assert_true(c).isNull() to
    # `if (c) true else isnull(raise_error(...))` — the raise survives
    plan = ranked._jdf.queryExecution().optimizedPlan().toString()
    assert "raise_error" in plan


def test_grouped_running_sum_matches_window_form(spark):
    """The prefix-sum sibling of grouped_rank: bit-identical to the
    Window.partitionBy(group) running sum it replaces (the q109
    weighted-median shape, caught by the r15 LOWCARD-WINDOW audit)."""
    from airflow_etl_pyspark_inmet_spark.operators.relational import (
        grouped_running_sum,
    )

    df = spark.range(500).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        (F.col("id") * 37 % 211).alias("v"),
        (F.col("id") % 7 + 1).alias("w"),
    ).groupBy("grp", "v").agg(F.sum("w").alias("wv"))
    win = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ref = df.withColumn("cum", F.sum("wv").over(win)).withColumn(
        "tot", F.sum("wv").over(Window.partitionBy("grp"))
    )
    got = grouped_running_sum(
        df, ["grp"], [F.col("v")], "wv", "cum", total_col="tot"
    )
    assert ref.exceptAll(got).count() == 0
    assert got.exceptAll(ref).count() == 0
    # empty input
    assert (
        grouped_running_sum(
            df.filter("v < 0"), ["grp"], [F.col("v")], "wv", "cum"
        ).count()
        == 0
    )
