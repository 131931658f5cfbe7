"""Physical-plan audits: the properties that matter at 100 TB, asserted on
the actual optimized plans (SURVEY.md §4).

- filters/column pruning reach the parquet scan (PushedFilters/ReadSchema)
- tiny dims join as broadcast hash joins (no shuffle of the fact side)
- aggregations are partial+final hash aggregates inside codegen
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from airflow_etl_pyspark_inmet_spark.plans import queries_relational as R


def _explain(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_and_projection_pushdown(spark, sf_small):
    df = R.q22_filter_project(spark, sf_small)
    plan = _explain(df)
    assert "PushedFilters" in plan
    assert "GreaterThan(l_quantity,45.0)" in plan or "l_quantity" in plan.split(
        "PushedFilters"
    )[1].split("\n")[0]
    # only the needed columns are read
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert "l_comment" not in read_schema
    assert "l_partkey" not in read_schema


def test_daily_agg_uses_broadcast_join(spark, sf_small):
    plan = _explain(R.q2_daily_supplier_agg(spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pricing_summary_partial_final_agg(spark, sf_small):
    df = R.q1_pricing_summary(spark, sf_small)
    plan = _explain(df)
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert plan.count("Exchange (") == 1  # exactly one shuffle (tree node)
    # AQE wraps the plan before execution, hiding codegen spans; disable it
    # for the inspection only to confirm the operators are codegen-eligible
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df2 = R.q1_pricing_summary(spark, sf_small)
        simple = df2._jdf.queryExecution().explainString(
            df2._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        assert "*(" in simple  # whole-stage codegen spans
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_three_way_join_broadcasts_both_dims(spark, sf_small):
    plan = _explain(R.q21_three_way_join(spark, sf_small))
    assert plan.count("BroadcastHashJoin") >= 2


def test_topk_pushes_window_group_limit(spark, sf_small):
    plan = _explain(R.q12_topk_per_group(spark, sf_small))
    assert "WindowGroupLimit" in plan  # local top-k before the shuffle


def test_asof_join_single_shuffle(spark, sf_small):
    """The union+window as-of plan shuffles exactly once on the key —
    no range explosion, no per-group materialization."""
    df = R.q24_asof_join(spark, sf_small)
    plan = _explain(df)
    n_exchanges = plan.count("Exchange hashpartitioning")
    # one exchange for the window; the marks aggregate upstream adds its
    # own — but the as-of itself must not multiply exchanges
    assert n_exchanges <= 2, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_is_equi_join(spark, sf_small):
    """Bucketization turns the interval predicate into an equi-join:
    no nested-loop/cartesian physical operator anywhere."""
    df = R.q25_range_join(spark, sf_small)
    plan = _explain(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jsonl_roundtrip_and_corrupt_line(spark, sf_small, tmp_path):
    from airflow_etl_pyspark_inmet_spark.sources.corpus import (
        read_jsonl,
        write_jsonl,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "text"
    )
    out = str(tmp_path / "corpus")
    write_jsonl(docs, out, shards=4)
    back = read_jsonl(spark, out, "doc_id bigint, text string")
    assert back.count() == docs.count()
    assert back.select("doc_id").exceptAll(docs.select("doc_id")).count() == 0

    # corrupt line is captured, not fatal
    with open(f"{out}/extra.json", "w") as f:
        f.write('{"doc_id": 1, "text": "ok"}\n{not json at all\n')
    back2 = read_jsonl(
        spark, out, "doc_id bigint, text string, _corrupt_record string"
    ).cache()  # Spark disallows querying only _corrupt_record off a raw scan
    try:
        assert back2.filter("_corrupt_record IS NOT NULL").count() == 1
    finally:
        back2.unpersist()


def test_approx_distinct_within_rsd(spark, sf_small):
    """q34 emits the exact companion + the in-engine envelope boolean;
    assert the envelope held and the exact side is right."""
    got = {
        r["l_returnflag"]: (r["exact_parts"], r["approx_ok"])
        for r in R.q34_approx_distinct(spark, sf_small).collect()
    }
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert got[k] == (n, True), (k, got[k], n)


def test_global_topk_uses_take_ordered(spark, sf_small):
    """ORDER BY + LIMIT compiles to TakeOrderedAndProject (per-partition
    top-k, merge on driver) — never a full global sort."""
    plan = _explain(R.q36_global_topk(spark, sf_small))
    assert "TakeOrderedAndProject" in plan, plan


def test_runtime_bloom_filter_injected(spark, sf_small):
    """A selective dim filter injects a runtime bloom filter on the fact
    side of a shuffle join (row-level pruning before the exchange). The
    size thresholds are production-scale, so lower them for the audit."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        from pyspark.sql import functions as F2

        li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_small}/orders.parquet").filter(
            F2.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = _explain(j)
        assert "might_contain" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_observation_metrics_piggyback_on_job(spark, sf_small):
    """df.observe(): pipeline health metrics collected as a side effect of
    the job that already runs — no second scan for row counts (the
    production alternative to the reference's print-based checks,
    SURVEY §5)."""
    from pyspark.sql import Observation

    obs = Observation("ingest")
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet").observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.count_if(F.col("l_quantity").isNull()).alias("null_qty"),
    )
    li.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["rows_seen"] == li.count()
    assert got["null_qty"] == 0


def test_foreachbatch_sink_idempotent_epochs(spark, sf_small, tmp_path):
    """foreachBatch parquet sink: all rows land exactly once across
    epoch-keyed directories; a re-run from the same checkpoint commits no
    new epochs (idempotent replay)."""
    from airflow_etl_pyspark_inmet_spark.streaming.windows import (
        stream_to_parquet_idempotent,
    )

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    n1 = stream_to_parquet_idempotent(
        spark, f"{sf_small}/events.parquet", out, ckpt
    )
    assert n1 >= 1
    from airflow_etl_pyspark_inmet_spark.plans.queries_relational import _t

    expected = _t(spark, sf_small, "events").count()
    assert spark.read.parquet(out).count() == expected
    # replay with the same checkpoint: nothing new to process
    n2 = stream_to_parquet_idempotent(
        spark, f"{sf_small}/events.parquet", out, ckpt
    )
    assert n2 == 0
    assert spark.read.parquet(out).count() == expected


def test_tpch_q5_broadcasts_all_dims(spark, sf_small):
    """Q5 plan: the only shuffle join is lineitem x orders; customer,
    supplier, and nation-region all broadcast."""
    plan = _explain(R.q39_tpch_q5(spark, sf_small))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_scd2_intervals_partition_the_events(spark, sf_small):
    """Islands cover every event exactly once, are numbered consecutively
    per user, and never overlap in time within a user."""
    ev = R._t(spark, sf_small, "events")
    got = R.q46_scd2_intervals(spark, sf_small).cache()
    assert got.agg(F.sum("n_events")).first()[0] == ev.count()
    bad_numbering = (
        got.groupBy("user_id")
        .agg(F.min("island").alias("lo"), F.max("island").alias("hi"),
             F.count(F.lit(1)).alias("n"))
        .filter((F.col("lo") != 1) | (F.col("hi") != F.col("n")))
        .count()
    )
    assert bad_numbering == 0
    w = Window.partitionBy("user_id").orderBy("island")
    overlaps = (
        got.withColumn("prev_to", F.lag("valid_to_us").over(w))
        .filter(F.col("prev_to").isNotNull()
                & (F.col("valid_from_us") <= F.col("prev_to")))
        .count()
    )
    assert overlaps == 0


def test_gapfill_spine_is_dense(spark, sf_small):
    """Every (day, type) cell exists: rows == n_days x n_types, and the
    zero-filled cells plus observed cells reconcile with the raw count."""
    got = R.q45_date_spine_gapfill(spark, sf_small).cache()
    days = got.select("day").distinct().count()
    types = got.select("event_type").distinct().count()
    assert got.count() == days * types
    ev = R._t(spark, sf_small, "events")
    assert got.agg(F.sum("n_events")).first()[0] == ev.count()


def test_approx_quantiles_close_to_exact(spark, sf_small):
    """q51 validates the GK sketch's rank guarantee in-engine and emits
    exact percentile companions; assert booleans held and the exact
    side matches an independent computation. The raw GK estimate is also
    re-checked directly within 1% relative error."""
    got = {
        r["o_orderstatus"]: r
        for r in R.q51_approx_quantiles(spark, sf_small).collect()
    }
    o = R._t(spark, sf_small, "orders")
    exact = {
        r["o_orderstatus"]: (r["p50"], r["p95"])
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    approx = {
        r["o_orderstatus"]: (r["a50"], r["a95"])
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias("a50"),
            F.approx_percentile("o_totalprice", F.lit(0.95), F.lit(10000)).alias("a95"),
        )
        .collect()
    }
    for k, (e50, e95) in exact.items():
        r = got[k]
        assert r["p50_rank_ok"] and r["p95_rank_ok"], r
        assert r["p50_exact"] == e50 and r["p95_exact"] == e95
        a50, a95 = approx[k]
        assert abs(a50 - e50) / e50 < 0.01
        assert abs(a95 - e95) / e95 < 0.01


def test_repetition_stats_is_map_only(spark, sf_small):
    """t10's whole plan has no aggregate/join Exchange — per-doc signals
    stay map-side (the only allowed Exchange is the small-file
    parallelism round-robin, which has no shuffle key)."""
    from airflow_etl_pyspark_inmet_spark.plans import queries_llm as L

    plan = _explain(L.t10_repetition_stats(spark, sf_small))
    assert plan.count("Exchange (") <= 1  # tree node, counted once
    assert "hashpartitioning" not in plan
    assert "HashAggregate" not in plan and "SortAggregate" not in plan


def test_decontaminate_probe_is_broadcast(spark, sf_small):
    """t9's eval-gram probe must broadcast (map-side), never shuffle the
    train side against it."""
    from airflow_etl_pyspark_inmet_spark.plans import queries_llm as L

    plan = _explain(L.t9_decontaminate(spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cohort_retention_exact_brute_force(spark, sf_small):
    """q58 equals a driver-side brute-force cohort computation."""
    from collections import Counter

    from airflow_etl_pyspark_inmet_spark.plans.queries_relational import (
        _t,
        q58_cohort_retention,
    )

    got = {
        (r.cohort_day, r.day_offset): r.n_users
        for r in q58_cohort_retention(spark, sf_small).collect()
    }
    rows = _t(spark, sf_small, "events").select(
        "user_id", F.to_date("ts").alias("day")
    ).collect()
    first = {}
    for r in rows:
        if r.user_id not in first or r.day < first[r.user_id]:
            first[r.user_id] = r.day
    seen = {(first[r.user_id], (r.day - first[r.user_id]).days, r.user_id)
            for r in rows}
    expected = Counter((c, o) for c, o, _ in seen)
    assert got == dict(expected)


def test_available_now_incremental_ingest(spark, tmp_path):
    """Trigger.AvailableNow + checkpoint: run 1 ingests the initial
    files and stops; run 2 after new files land ingests ONLY the delta;
    run 3 with nothing new ingests zero. The checkpoint, not directory
    listing diffs, is the exactly-once ledger."""
    import json

    from airflow_etl_pyspark_inmet_spark.streaming.windows import (
        incremental_ingest_available_now,
    )

    land = tmp_path / "landing"
    land.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drop(name, rows):
        with open(land / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    drop("a.json", [{"id": 1, "v": "x"}, {"id": 2, "v": "y"}])
    n1 = incremental_ingest_available_now(spark, str(land), out, ckpt)
    assert n1 == 2
    drop("b.json", [{"id": 3, "v": "z"}])
    n2 = incremental_ingest_available_now(spark, str(land), out, ckpt)
    assert n2 == 1  # only the new file
    n3 = incremental_ingest_available_now(spark, str(land), out, ckpt)
    assert n3 == 0
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]  # no re-ingestion duplicates


def test_aqe_splits_skewed_join_partitions(spark, sf_small):
    """AQE skew-join: a hot key whose partition dwarfs the median gets
    split into multiple tasks at runtime (the executed plan marks the
    sort-merge join as skew=true). Thresholds lowered to trigger on
    test-scale data; on a real cluster the defaults (256MB) apply."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # AQE splits a skewed reduce partition at MAPPER-block granularity:
        # with a single map task (the sf0.001 table is one small parquet
        # file -> one input partition) there is nothing to split and the
        # rule silently never fires — that, not thresholds, was why this
        # test used to flake. Repartition(8) gives the shuffle 8 mappers.
        li = spark.read.parquet(f"{sf_small}/lineitem.parquet").repartition(8)
        # 90% of left rows pile onto key 0; keys 1..9 stay tiny, so the
        # hot partition dwarfs the median and trips the skew handler
        k = F.when(F.col("l_orderkey") % 10 < 9, F.lit(0)).otherwise(
            F.col("l_orderkey") % 10
        )
        left = li.select(k.cast("long").alias("k"), "l_quantity", "l_shipdate")
        right = spark.range(10).select(F.col("id").alias("k"), F.lit("x").alias("v"))
        j = left.join(right, "k")
        j.collect()  # execute THIS plan instance so AQE finalizes it
        executed = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in executed, executed[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ntile_has_no_single_partition_window(spark, sf_small):
    """q38's global quartiles must not contain ANY window operator: the
    global_ntile formulation (range partition + offset ranks) replaces
    the `WindowExec: No Partition Defined` single-task plan entirely."""
    plan = _explain(R.q38_ntile_quartiles(spark, sf_small))
    assert "Window" not in plan
    # downstream of the checkpointed range-sorted frame: a broadcast join
    # of the tiny per-partition offset table, nothing else
    assert "Scan ExistingRDD" in plan
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_sessionize_salted_plan_and_equivalence(spark, sf_small):
    """The skew-hardened sessionize must (a) window the EVENT frame on
    the salted (user, chunk) key — never on user alone — and (b) produce
    exactly the plain sessionize result on a frame with a planted hot
    key spanning many chunks."""
    import datetime as dt

    from airflow_etl_pyspark_inmet_spark.operators.relational import (
        sessionize,
        sessionize_salted,
    )

    # Hot key 1: 500 events over ~14 days (alternating 10-min and 40-min
    # gaps -> many sessions, many 6-hour chunks, chunk-boundary
    # continuations). Cold keys: a few events each.
    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows, t = [], t0
    for i in range(500):
        t += dt.timedelta(minutes=10 if i % 3 else 40)
        rows.append((1, t))
    for u in (2, 3):
        for i in range(5):
            rows.append((u, t0 + dt.timedelta(hours=u, minutes=31 * i)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")

    salted = sessionize_salted(df, "user_id", "ts", gap_seconds=1800,
                               chunk_seconds=21600)
    plan = _explain(salted)
    assert "hashpartitioning(user_id" in plan
    assert "_chunk" in plan  # the event window runs on the salted key

    expect = {
        (r["user_id"], r["ts"]): r["session_seq"]
        for r in sessionize(df, "user_id", "ts", gap_seconds=1800).collect()
    }
    got = {
        (r["user_id"], r["ts"]): r["session_seq"] for r in salted.collect()
    }
    assert got == expect
    assert max(s for (u, _), s in got.items() if u == 1) > 100


def test_sessionize_salted_chunk_smaller_than_gap(spark):
    """chunk_seconds < gap_seconds: a session can span many chunks and a
    boundary continuation can skip over EMPTY chunks — the per-user lag
    over present chunks must bridge both. Equivalence vs plain
    sessionize on a frame built to hit those cases."""
    import datetime as dt

    from airflow_etl_pyspark_inmet_spark.operators.relational import (
        sessionize,
        sessionize_salted,
    )

    t0 = dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc)
    rows = []
    # user 1: events every 9 min for 3 hours (one long session spanning
    # many 10-min chunks), then a 40-min gap, then more events
    t = t0
    for i in range(20):
        t += dt.timedelta(minutes=9)
        rows.append((1, t))
    t += dt.timedelta(minutes=40)
    for i in range(5):
        rows.append((1, t))
        t += dt.timedelta(minutes=9)
    # user 2: pairs of events 25 min apart (continuation across 2 empty
    # 10-min chunks, still within the 30-min gap)
    t = t0
    for i in range(6):
        rows.append((2, t))
        t += dt.timedelta(minutes=25)
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")

    expect = {
        (r["user_id"], r["ts"]): r["session_seq"]
        for r in sessionize(df, "user_id", "ts", gap_seconds=1800).collect()
    }
    got = {
        (r["user_id"], r["ts"]): r["session_seq"]
        for r in sessionize_salted(
            df, "user_id", "ts", gap_seconds=1800, chunk_seconds=600
        ).collect()
    }
    assert got == expect
    # sanity: user 1 really has 2 sessions, user 2 one
    assert max(s for (u, _), s in got.items() if u == 1) == 2
    assert max(s for (u, _), s in got.items() if u == 2) == 1


def test_streaming_embedding_dedup_equals_batch_tier(spark, sf_small):
    """st10's streamed LSH pair set must equal the batch index-mode
    tier BIT FOR BIT: deterministic hyperplanes + a stateless
    stream-static plan mean the micro-batch schedule cannot change the
    result — that equality is what makes the streaming tier
    oracle-checkable via d23's exact-truth harness."""
    from airflow_etl_pyspark_inmet_spark.operators.dedup import (
        embedding_lsh_pairs,
    )
    from airflow_etl_pyspark_inmet_spark.streaming.windows import (
        streaming_embedding_dedup,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    delta = emb.filter(F.col("vec_id") < 30)
    corpus = emb.filter(F.col("vec_id") >= 30)
    batch = {
        (r.id_a, r.id_b): r.cos_sim
        for r in embedding_lsh_pairs(
            delta, threshold=0.35, dim=64, index_df=corpus
        ).collect()
    }
    streamed = {
        (r.id_a, r.id_b): r.cos_sim
        for r in streaming_embedding_dedup(
            spark,
            f"{sf_small}/embeddings.parquet",
            corpus,
            threshold=0.35,
            dim=64,
            delta_max_id=30,
        ).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_docstring_count():
    """The oracle-count claim in registry.py's docstring matches reality.

    The r13 verdict caught the docstring saying 261/261 while the registry
    held 266 entries; this pins the number so it cannot drift again.
    """
    import re

    from airflow_etl_pyspark_inmet_spark.plans import registry

    n = len(registry.QUERIES)
    m = re.search(r"\((\d+)/(\d+);", registry.__doc__)
    assert m, "registry docstring lost its N/N oracle-count claim"
    assert int(m.group(1)) == int(m.group(2)) == n, (
        f"registry docstring claims {m.group(0)} but len(QUERIES)={n}"
    )
    # and the claim itself: every registered query has a real oracle
    missing = [k for k in registry.QUERIES if registry.ORACLES.get(k) is None]
    assert not missing, f"queries with no oracle: {missing}"


def test_filtered_ann_predicate_reaches_scan(spark, sf_small):
    """filtered_ivf_topk's item predicate must push into the parquet
    scan (r13 ADVICE: it used to sit behind a localCheckpoint lineage
    barrier, so the full corpus materialized before the filter)."""
    from pyspark.sql import functions as F

    from airflow_etl_pyspark_inmet_spark.operators.similarity import (
        filtered_ivf_topk,
    )

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    df = filtered_ivf_topk(
        emb, queries, F.col("label") > 5, k=5, n_cells=4, n_probe=4
    )
    plan = _explain(df)
    assert "GreaterThan(label,5)" in plan, plan[:4000]


def test_jaccard_pairs_postings_materialized_once(spark, sf_small):
    """r17 optimization contract: the shingle postings frame is
    materialized ONCE and shared by every consumer (both self-join
    sides + the per-doc size broadcasts). Before the change the final
    plan re-derived it per consumer — 8 parquet scans / 28 exchanges
    for one query; now the final fragment reads the checkpointed RDD
    and contains NO parquet scan (the one scan lives in the
    checkpoint's own lineage segment), and its exchange count is
    bounded by the join/agg structure, not the consumer count."""
    from airflow_etl_pyspark_inmet_spark.operators.dedup import (
        jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    plan = _explain(jaccard_pairs(docs, ngram=3, threshold=0.5,
                                  broadcast_sizes=True))
    assert plan.count("Scan parquet") == 0, plan[:2000]
    # uncapped plan: candidate join + inter agg + 2 size broadcasts
    # (before the materialization this was 14 tree-node exchanges)
    assert plan.count("Exchange (") <= 10, plan.count("Exchange (")


def test_tfidf_tf_materialized_once(spark, sf_small):
    """r17: tfidf_top_terms' tf frame feeds the df branch and the
    scoring join through one checkpoint — the final plan must not
    contain two token-explode chains (Generate nodes)."""
    from airflow_etl_pyspark_inmet_spark.operators.text import (
        tfidf_top_terms,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    plan = _explain(tfidf_top_terms(docs, k=3))
    assert plan.count("Generate") <= 1, plan.count("Generate")


def test_shingle_sets_map_only(spark, sf_small):
    """r18: per-doc shingle-set construction is map-only — the old
    explode + corpus-wide distinct paid a full Exchange for row-local
    dedup. The shingle_sets plan must contain no Exchange at all
    (array_distinct over the per-row gram-hash array, then explode)."""
    from airflow_etl_pyspark_inmet_spark.operators.dedup import (
        shingle_sets,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    plan = _explain(shingle_sets(docs, "doc_id", "text", 3))
    # the only allowed Exchange is ensure_parallelism's round-robin
    # repartition (the small-file scan guard, a no-op at scale); the
    # old corpus-wide distinct showed up as a hashpartitioning Exchange
    assert "hashpartitioning" not in plan, plan[:2000]
    assert "array_distinct" in plan, plan[:2000]


def test_containment_pairs_doc_sets_materialized_once(spark, sf_small):
    """r18 (VERDICT r17 item 8): containment_pairs shares the one
    materialized per-doc set frame across every consumer — the final
    fragment reads the checkpointed RDD, no parquet scan, and sizes are
    projections (no extra groupBy exchange per size side)."""
    from airflow_etl_pyspark_inmet_spark.operators.dedup import (
        containment_pairs,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    plan = _explain(
        containment_pairs(docs, ngram=3, broadcast_sizes=True)
    )
    assert plan.count("Scan parquet") == 0, plan[:2000]
    assert plan.count("Exchange (") <= 10, plan.count("Exchange (")


def test_jaccard_verify_postings_materialized_once(spark, sf_small):
    """r18 (VERDICT r17 item 8): minhash_lsh_pairs' verify stage reads
    the candidate-pruned postings checkpoint — the final plan must not
    re-derive the corpus gram stream per consumer (zero parquet scans:
    every scan lives behind the stacked/s_c checkpoints)."""
    from airflow_etl_pyspark_inmet_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    plan = _explain(
        minhash_lsh_pairs(docs, ngram=3, threshold=0.5,
                          broadcast_sizes=True)
    )
    assert plan.count("Scan parquet") == 0, plan[:2000]


def test_graph_iterative_checkpoints_truncate_lineage(spark, sf_small):
    """r18 (VERDICT r17 items 2/8): the iterative graph operators'
    per-round shared frames are checkpointed — after n rounds the final
    plan reads checkpointed RDDs only (zero parquet scans; lineage does
    not grow with round count), for pagerank (deg + per-round pr),
    k-core (per-round keep/e), BFS and SSSP (edge frame + per-round
    frontier)."""
    from airflow_etl_pyspark_inmet_spark.operators.dedup import (
        bfs_distances,
        kcore_peel,
        pagerank_exact,
        sssp_distances,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    base = docs.select(
        (F.col("doc_id") % 50).alias("src"),
        ((F.col("doc_id") * 7 + 3) % 50).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    edges = base.unionByName(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()

    plan = _explain(pagerank_exact(edges, n_iters=3,
                                   validate_undirected=False))
    assert plan.count("Scan parquet") == 0, ("pagerank", plan[:2000])

    plan = _explain(kcore_peel(edges, k=2, n_rounds=3))
    assert plan.count("Scan parquet") == 0, ("kcore", plan[:2000])

    sources = edges.select(F.col("src").alias("node")).distinct().limit(2)
    plan = _explain(bfs_distances(edges, sources, n_rounds=3))
    assert plan.count("Scan parquet") == 0, ("bfs", plan[:2000])

    w_edges = edges.withColumn(
        "w", (F.col("src") + F.col("dst")) % 5 + 1
    )
    plan = _explain(sssp_distances(w_edges, sources, n_rounds=3))
    assert plan.count("Scan parquet") == 0, ("sssp", plan[:2000])
