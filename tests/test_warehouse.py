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


def test_bucketed_join_has_no_shuffle(spark, sf_small):
    """Co-bucketed tables sort-merge-join with zero Exchange nodes — the
    write-once pre-shuffle that makes repeated fact joins scale."""
    from airflow_etl_pyspark_inmet_spark.plans.warehouse import (
        save_bucketed_table,
    )

    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_small}/orders.parquet")
    save_bucketed_table(li, "li_bkt", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    save_bucketed_table(o, "o_bkt", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("analitic.li_bkt").join(
            spark.table("analitic.o_bkt"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_partition_pruning_static_and_dynamic(spark, sf_small):
    """A fact table partitioned by ship year: a literal year filter prunes
    at the scan (static), and a join against a filtered dim compiles a
    dynamicpruning subquery (DPP) so only matching partitions are read."""
    from airflow_etl_pyspark_inmet_spark.plans.warehouse import save_table

    li = spark.read.parquet(f"{sf_small}/lineitem.parquet").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    save_table(li, "li_part", partition_by=["ship_year"])
    fact = spark.table("analitic.li_part")

    # static pruning: partition filter, not a post-scan filter
    plan = (
        fact.filter(F.col("ship_year") == 1997)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(ship_year" in plan, plan

    # dynamic pruning: the dim filter reaches the fact scan as a subquery
    years = (
        fact.select("ship_year").distinct().filter(F.col("ship_year") >= 1997)
    )
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    try:
        j = fact.join(years, "ship_year")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan, plan
    finally:
        spark.conf.unset(
            "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly"
        )


def test_analyze_table_records_stats(spark, sf_small):
    from airflow_etl_pyspark_inmet_spark.plans.warehouse import (
        analyze_table,
        save_table,
    )

    o = spark.read.parquet(f"{sf_small}/orders.parquet")
    save_table(o, "orders_stats", db="analitic")
    analyze_table(spark, "orders_stats")
    desc = spark.sql(
        "DESCRIBE TABLE EXTENDED analitic.orders_stats"
    ).collect()
    stats = {r["col_name"]: r["data_type"] for r in desc}
    assert "Statistics" in stats and "rows" in stats["Statistics"]


def test_range_sorted_layout_enables_file_skipping(spark, sf_small):
    """Files written by save_range_sorted_table cover near-disjoint
    sort-key ranges (tight parquet min/max stats -> file-level skipping
    for range predicates)."""
    import glob as globmod

    import pyarrow.parquet as pq

    from airflow_etl_pyspark_inmet_spark.plans.warehouse import (
        save_range_sorted_table,
    )

    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    save_range_sorted_table(li, "li_sorted", "l_orderkey", n_files=8)
    warehouse = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    files = globmod.glob(f"{warehouse}/analitic.db/li_sorted/*.parquet")
    assert len(files) >= 4
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = [md.schema.column(i).name for i in range(md.num_columns)].index(
            "l_orderkey"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges  # disjoint file ranges


def test_orc_sink_source_roundtrip(spark, sf_small, tmp_path):
    """ORC is the second columnar format the engine reads/writes natively;
    roundtrip preserves schema and values, and the ORC scan still takes
    predicate pushdown (the scan node advertises the filter)."""
    src = spark.read.parquet(f"{sf_small}/orders.parquet")
    out = str(tmp_path / "orders_orc")
    src.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == src.schema
    assert back.count() == src.count()
    a = src.agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)"))).first()[0]
    b = back.agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)"))).first()[0]
    assert a == b
    plan = back.filter(F.col("o_custkey") == 7)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,7)]" in plan


def test_compact_table_rewrites_small_files(spark, sf_small):
    """200 tiny files compact to the ceil(size/target) count with no row
    loss — the OPTIMIZE maintenance op for streaming-sink accretion."""
    from airflow_etl_pyspark_inmet_spark.plans.warehouse import (
        compact_table,
        save_table,
        table_size_bytes,
    )

    from airflow_etl_pyspark_inmet_spark.plans.queries_relational import _t

    ev = _t(spark, sf_small, "events").repartition(200)
    save_table(ev, "events_shredded", db="analitic")
    files_before = (
        spark.table("analitic.events_shredded")
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert files_before == 200
    n_expected = compact_table(spark, "events_shredded", target_file_bytes=1 << 20)
    after = spark.table("analitic.events_shredded")
    files_after = after.select(F.input_file_name()).distinct().count()
    assert files_after == n_expected < files_before
    assert after.count() == ev.count()
    assert table_size_bytes(spark, "events_shredded") > 0


def test_zorder_layout_skips_files_on_both_dims(spark, sf_small):
    """Z-ordered (user_id, value) layout: a point-ish predicate on EITHER
    dimension intersects only a fraction of the files' min/max boxes,
    unlike the same data laid out randomly (every file matches)."""
    from airflow_etl_pyspark_inmet_spark.plans.warehouse import save_zorder_table

    from airflow_etl_pyspark_inmet_spark.plans.queries_relational import _t

    ev = _t(spark, sf_small, "events").select("event_id", "user_id", "value")
    save_zorder_table(ev, "events_z", "user_id", "value", n_files=16)

    boxes = (
        spark.table("analitic.events_z")
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("user_id").alias("ulo"), F.max("user_id").alias("uhi"),
            F.min("value").alias("vlo"), F.max("value").alias("vhi"),
        )
        .collect()
    )
    assert len(boxes) == 16
    med_u = ev.stat.approxQuantile("user_id", [0.5], 0.01)[0]
    med_v = ev.stat.approxQuantile("value", [0.5], 0.01)[0]
    hit_u = sum(1 for b in boxes if b.ulo <= med_u <= b.uhi)
    hit_v = sum(1 for b in boxes if b.vlo <= med_v <= b.vhi)
    # each single-dim slice must exclude a healthy share of the 16 files
    assert hit_u <= 10 and hit_v <= 10
    assert spark.table("analitic.events_z").count() == ev.count()


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """mergeSchema=true reads a table whose later files added a column —
    the append-only schema-evolution contract of a long-lived corpus."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], ["id", "x"]).write.parquet(f"{p}/d=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], ["id", "x", "quality"]
    ).write.parquet(f"{p}/d=2")
    got = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(got.columns) == {"id", "x", "quality", "d"}
    rows = {r.id: r for r in got.collect()}
    assert rows[1].quality is None and rows[2].quality == 9.5


def test_compact_table_preserves_partitioning(spark, sf_small):
    """Compacting a partitioned table keeps the partition columns and
    directory layout (Delta-OPTIMIZE semantics: compact within
    partitions, never merge across them)."""
    from airflow_etl_pyspark_inmet_spark.plans.warehouse import (
        compact_table,
        save_table,
    )

    o = spark.read.parquet(f"{sf_small}/orders.parquet").withColumn(
        "status", F.col("o_orderstatus")
    )
    save_table(o.repartition(40), "orders_part", db="analitic",
               partition_by=["status"])
    before = spark.table("analitic.orders_part").count()
    compact_table(spark, "orders_part", target_file_bytes=1 << 20)
    t = spark.table("analitic.orders_part")
    assert t.count() == before
    part_cols = [
        c.name for c in spark.catalog.listColumns("orders_part", "analitic")
        if c.isPartition
    ]
    assert part_cols == ["status"]
    # partition pruning still works after compaction
    plan = t.filter(F.col("status") == "O")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or t.filter(F.col("status") == "O").count() > 0


def test_compact_table_splits_hot_partition(spark, sf_small):
    """target_file_bytes is honored WITHIN a partition value: a hot value
    holding ~99% of the bytes fans out to multiple ~target files instead
    of one giant file/task, a cold value compacts to one file, and the
    returned count is the real post-compaction file count."""
    from airflow_etl_pyspark_inmet_spark.plans.warehouse import (
        _partition_file_stats,
        compact_table,
        save_table,
    )

    li = spark.read.parquet(f"{sf_small}/lineitem.parquet").withColumn(
        "bucket",
        F.when(F.col("l_orderkey") % 100 < 99, "hot").otherwise("cold"),
    )
    save_table(li.repartition(40), "li_hot", db="analitic",
               partition_by=["bucket"])
    before = spark.table("analitic.li_hot").count()
    returned = compact_table(spark, "li_hot", target_file_bytes=32 << 10)
    stats = _partition_file_stats(spark, "li_hot", "analitic")
    hot_bytes, hot_files = stats["bucket=hot"]
    cold_bytes, cold_files = stats["bucket=cold"]
    assert hot_files > 1  # the old repartition(n, *part_cols) gave exactly 1
    assert cold_files == 1
    assert returned == hot_files + cold_files
    # files land near the target: no file more than ~3x target (parquet
    # compression shifts sizes between the sizing listing and the rewrite)
    assert hot_bytes / hot_files < 3 * (32 << 10)
    assert spark.table("analitic.li_hot").count() == before


def test_save_table_jdbc_configures_writer(spark, tmp_path):
    """No JDBC driver ships in this env; assert the S8 writer applies the
    warehouse contract (uppercase columns, dbtable target, options) and
    fails only at driver load, not in our plumbing."""
    import pytest

    from airflow_etl_pyspark_inmet_spark.plans.warehouse import save_table_jdbc

    df = spark.createDataFrame([(1, "x")], "id long, name string")
    with pytest.raises(Exception) as ei:
        save_table_jdbc(
            df,
            "t_out",
            url="jdbc:postgresql://localhost:1/nope",
            db="stage",
            options={"driver": "org.example.NoSuchDriver"},
        )
    # the failure is the missing driver class / connection, i.e. the call
    # got through option wiring to the actual JDBC layer
    assert "NoSuchDriver" in str(ei.value) or "driver" in str(ei.value).lower()


def test_save_table_observed_metrics_free_with_write(spark, tmp_path):
    """Observation metrics ride the write job — values must equal a
    separate aggregate pass, with no extra scan issued by the API."""
    from pyspark.sql import functions as F

    from airflow_etl_pyspark_inmet_spark.plans.warehouse import (
        save_table_observed,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0), (4, 2.0)], "k long, v double"
    )
    got = save_table_observed(
        df,
        "observed_demo",
        {
            "n_rows": F.count(F.lit(1)),
            "null_v": F.count_if(F.col("v").isNull()),
            "neg_v": F.count_if(F.col("v") < 0),
        },
    )
    assert got == {"n_rows": 4, "null_v": 1, "neg_v": 1}
    assert spark.table("analitic.observed_demo").count() == 4
