"""Structured Streaming operators over the events table.

The reference is batch-only (SURVEY.md §2.7: no streaming anywhere), so
this module is pure extension surface: tumbling-window aggregation with
watermarked late-data handling, plus a session-window variant. Batch
equivalents live in the entry queries so the streaming results are
oracle-checkable (stream over a static parquet dir == batch over it when
run to completion in complete mode).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.timeutil import utc_timestamps


def _read_stream_events(spark: SparkSession, events_dir: str) -> DataFrame:
    """readStream over the events parquet; the file stores ts as
    TIMESTAMP(NANOS) which Spark rejects, so read nanos-as-long and
    truncate to micros (same convention as the batch loader)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_dir).schema
    # the streaming file source requires a directory: stream the parent
    # dir with a glob filter when events_dir is a single parquet file
    if events_dir.endswith(".parquet"):
        parent, _, fname = events_dir.rpartition("/")
        reader = spark.readStream.schema(schema).option("pathGlobFilter", fname)
        stream = reader.parquet(parent)
    else:
        stream = spark.readStream.schema(schema).parquet(events_dir)
    if dict(stream.dtypes).get("ts") in ("bigint", "long"):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return utc_timestamps(stream)


def streaming_tumbling_counts(
    spark: SparkSession,
    events_dir: str,
    window: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Run a watermarked tumbling-window count/sum over the events parquet
    directory AS A STREAM, to completion, and return the final result.

    Uses complete output mode + memory sink so every window is emitted
    (append mode would withhold the last windows past the watermark —
    fine for an unbounded source, wrong for a finite oracle check).
    On a real cluster the source becomes Kafka and the sink a Delta/
    parquet table; the aggregation is unchanged.
    """
    stream = _read_stream_events(spark, events_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def streaming_session_counts(
    spark: SparkSession,
    events_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session-window (dynamic gap-based) aggregation as a stream:
    ``session_window(ts, gap)`` keyed by user. Streaming-native
    counterpart of operators.relational.sessionize."""
    stream = _read_stream_events(spark, events_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
    name = f"stream_sess_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def streaming_stateful_counts(
    spark: SparkSession, events_dir: str
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running (count, first-seen, last-seen) held in GroupState
    across micro-batches — the arbitrary-state API for operators that
    window/session aggregation can't express (per-key counters, online
    models, CDC merge).

    Emits the running totals per key per batch (update mode); because
    count/min/max are monotone, the finite-input final answer is the
    per-user max/min/max over emitted rows — which equals the batch
    group-by, making this oracle-checkable. Timestamps are carried as
    epoch-microsecond int64 (never raw timestamps) per the determinism
    contract.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = _read_stream_events(spark, events_dir).select("user_id", "ts")

    out_schema = (
        "user_id bigint, n_events bigint, first_us bigint, last_us bigint"
    )
    state_schema = "n bigint, lo bigint, hi bigint"

    def track(key, pdfs, state: GroupState):
        if state.exists:
            n, lo, hi = state.get
        else:
            n, lo, hi = 0, None, None
        for pdf in pdfs:
            us = (
                pd.to_datetime(pdf["ts"])
                .values.astype("datetime64[us]")
                .astype("int64")
            )
            if len(us):
                n += len(us)
                b_lo, b_hi = int(us.min()), int(us.max())
                lo = b_lo if lo is None else min(lo, b_lo)
                hi = b_hi if hi is None else max(hi, b_hi)
        state.update((n, lo, hi))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "first_us": [lo], "last_us": [hi]}
        )

    running = stream.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stream_state_{uuid.uuid4().hex[:8]}"
    q = (
        running.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # fold per-batch running rows to the final state per key
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.min("first_us").alias("first_us"),
            F.max("last_us").alias("last_us"),
        )
    )


def streaming_tws_counts(spark: SparkSession, events_dir: str) -> DataFrame:
    """Spark 4 ``transformWithStateInPandas`` twin of
    :func:`streaming_stateful_counts`: the same per-user running
    (count, first-seen, last-seen), but held in the new StatefulProcessor
    API's typed ValueState instead of GroupState. This is the
    forward-looking arbitrary-state surface (composable named states,
    timers, TTL); it REQUIRES the RocksDB state store provider, which is
    also the right provider at scale (state spills to disk instead of
    executor heap). Same finite-input contract as st3: running outputs
    fold to the batch group-by, so the oracle is identical.

    Gated dependency: the transformWithState worker protocol serializes
    state through protobuf, which this sandbox does not ship — the guard
    below fails fast with guidance instead of a mid-query worker crash.
    The applyInPandasWithState twin (st3) covers the same semantics
    everywhere.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as ex:
        raise RuntimeError(
            "streaming_tws_counts requires the protobuf Python package on "
            "workers (transformWithState state serialization); it is not "
            "installed here. Use streaming_stateful_counts "
            "(applyInPandasWithState) for identical semantics."
        ) from ex

    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    stream = _read_stream_events(spark, events_dir).select("user_id", "ts")
    out_schema = (
        "user_id bigint, n_events bigint, first_us bigint, last_us bigint"
    )

    class RunningAgg(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg", "n bigint, lo bigint, hi bigint"
            )

        def handleInputRows(self, key, rows, timer_values):
            if self._agg.exists():
                n, lo, hi = self._agg.get()
            else:
                n, lo, hi = 0, None, None
            for pdf in rows:
                us = (
                    pd.to_datetime(pdf["ts"])
                    .values.astype("datetime64[us]")
                    .astype("int64")
                )
                if len(us):
                    n += len(us)
                    b_lo, b_hi = int(us.min()), int(us.max())
                    lo = b_lo if lo is None else min(lo, b_lo)
                    hi = b_hi if hi is None else max(hi, b_hi)
            self._agg.update((n, lo, hi))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "first_us": [lo],
                    "last_us": [hi],
                }
            )

        def close(self) -> None:
            pass

    running = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningAgg(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
    name = f"stream_tws_{uuid.uuid4().hex[:8]}"
    # The RocksDB provider is required by transformWithState (and the
    # right provider at scale), but it is a SESSION conf — set it only
    # around this query's start and restore the prior value so later
    # streaming queries on the shared session keep their own provider.
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        q = (
            running.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if prior is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prior)
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.min("first_us").alias("first_us"),
            F.max("last_us").alias("last_us"),
        )
    )


def streaming_static_join_counts(
    spark: SparkSession, events_dir: str, profiles: DataFrame
) -> DataFrame:
    """Stream-static join: each micro-batch of the event stream joins the
    static ``profiles`` dimension (broadcast per batch, no state), then a
    grouped aggregate. The enrich-then-aggregate shape of a production
    feature pipeline; at scale the static side is a slowly-refreshed dim
    table and the join stays shuffle-free via broadcast."""
    stream = _read_stream_events(spark, events_dir).select("user_id", "value")
    joined = stream.join(F.broadcast(profiles), "user_id")
    agg = joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias(
            "total_value"
        ),
    )
    name = f"stream_ssj_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def stream_to_parquet_idempotent(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> int:
    """foreachBatch parquet sink with epoch-keyed idempotence: each
    micro-batch writes to a batch-id subdirectory with overwrite, so a
    replayed epoch (failure/retry) rewrites the same files instead of
    duplicating rows — exactly-once output on top of at-least-once
    delivery. Returns the number of epochs committed."""
    stream = _read_stream_events(spark, events_dir).select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    epochs = []

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")
        epochs.append(epoch_id)

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return len(epochs)


def streaming_dedup(
    spark: SparkSession, events_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact deduplication: the event stream is unioned with a
    second read of itself (guaranteed duplicates, the at-least-once
    delivery case), then ``dropDuplicatesWithinWatermark`` on the event
    key restores exact distinctness. State holds one key per event inside
    the watermark horizon and is evicted as the watermark advances — the
    property that makes streaming dedup feasible on an unbounded 100 TB/day
    feed, where a plain ``dropDuplicates`` would accumulate state forever.

    Dedup is a stateful filter (not an aggregation): append mode emits
    each surviving row immediately. Every output column is copy-invariant,
    so the finite-input result equals the batch DISTINCT (the oracle).
    """
    a = _read_stream_events(spark, events_dir)
    b = _read_stream_events(spark, events_dir)
    deduped = (
        a.unionByName(b)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
    )
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def streaming_stream_stream_join(
    spark: SparkSession,
    events_dir: str,
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: clicks joined to the views that follow
    them within ``within``, both sides watermarked. The time-bound predicate
    is what makes an unbounded-stream join feasible — it lets Spark evict
    buffered rows once the watermark passes click_ts + within, so state is
    O(rate x window), not O(stream). Inner-join matches emit as soon as
    both sides arrive (append mode withholds nothing for inner joins);
    finite input therefore equals the batch interval join (the oracle).
    """
    ev = _read_stream_events(spark, events_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    views = (
        _read_stream_events(spark, events_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    joined = clicks.join(
        views,
        F.expr(
            f"c_user = v_user AND view_ts >= click_ts "
            f"AND view_ts <= click_ts + interval {within}"
        ),
    ).select(
        "click_id",
        "view_id",
        F.col("c_user").alias("user_id"),
        F.unix_micros("click_ts").alias("click_us"),
        F.unix_micros("view_ts").alias("view_us"),
    )
    name = f"stream_ssj2_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def incremental_ingest_available_now(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "id bigint, v string",
) -> int:
    """Incremental batch ingestion with Trigger.AvailableNow: process
    everything currently in ``in_dir`` as a bounded streaming job, commit
    the source offsets to the checkpoint, and stop. Re-running after new
    files land processes ONLY the new files — the scheduled-job pattern
    (hourly cron over a landing zone) that replaces hand-rolled
    "which files did I already load" bookkeeping at any scale; the
    checkpoint is the exactly-once ledger. Returns rows written this run.
    """
    counted = {"n": 0}

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        rows = df.count()
        counted["n"] += rows
        if rows:
            df.write.mode("append").parquet(out_dir)

    q = (
        spark.readStream.schema(schema)
        .json(in_dir)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return counted["n"]


def streaming_ohlc_bars(
    spark: SparkSession,
    events_dir: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming OHLC downsampling — the q80 batch shape as a watermarked
    tumbling-window stream: per (user, hour) the opening value (first by
    event time), high, low, and closing value (last by event time), as
    one streaming hash aggregate with ``min_by``/``max_by`` on the same
    fixed-width zero-padded (epoch-micros, event_id) total-order key q80
    uses — so under timestamp ties the same row wins in both the batch
    oracle and every micro-batch schedule (the declarative aggregate is
    merge-associative; arrival order cannot change the result). Exact
    BIGINT cents. A real deployment points the source at Kafka and the
    sink at a Delta table; the aggregation is unchanged — this is live
    candlestick downsampling for a market-data/metrics feed.
    """
    stream = _read_stream_events(spark, events_dir)
    e = stream.select(
        "user_id",
        F.col("ts"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("v"),
        F.concat(
            F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
            F.lpad(F.col("event_id").cast("string"), 20, "0"),
        ).alias("k"),
    )
    agg = (
        e.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "user_id")
        .agg(
            F.expr("min_by(v, k)").alias("open_cents"),
            F.max("v").alias("high_cents"),
            F.min("v").alias("low_cents"),
            F.expr("max_by(v, k)").alias("close_cents"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("hour_us"),
            "open_cents",
            "high_cents",
            "low_cents",
            "close_cents",
            "n_events",
        )
    )
    name = f"stream_ohlc_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def streaming_incremental_refresh(
    spark: SparkSession,
    initial_mv: DataFrame,
    deltas: DataFrame,
    keys: list[str],
    vals: list[str],
    n_files: int = 4,
) -> DataFrame:
    """Streaming materialized-view maintenance — the streaming twin of
    the c6 batch flagship: a CDC delta feed (retraction/addition
    partials: deletes carry negative measures, updates a retract+add
    pair, inserts positive rows) maintains a grouped-aggregate MV via
    ``foreachBatch`` + ``merge_partial_aggs``, never rescanning the
    base table.

    The delta frame is spilled to ``n_files`` parquet files and
    streamed back with ``maxFilesPerTrigger=1`` under
    ``Trigger.AvailableNow``, so the fold genuinely crosses multiple
    micro-batches: each epoch partial-aggregates ITS OWN batch
    distributed-side (one hash agg on the group keys), then folds the
    result into the running MV with one more merge — per-epoch work is
    O(batch + |MV|), and the MV frame is eagerly checkpointed each
    epoch so lineage stays flat across any number of epochs (the d5/g1
    iterative idiom applied to streaming state). Because every measure
    is an exact integer SUM (associative + commutative), the final MV
    is independent of how the changelog splits into micro-batches —
    the finite-input result equals the full recompute over the
    CDC-applied table (the oracle), which is the view-maintenance
    theorem proven IN THE STREAMING PATH.

    On a real cluster the file source becomes Kafka/Delta CDF and the
    MV lives in a Delta table MERGEd per epoch; the per-epoch algebra
    is unchanged.
    """
    import shutil
    import tempfile

    from ..operators.relational import merge_partial_aggs

    tmp = tempfile.mkdtemp(prefix="st9_deltas_")
    try:
        deltas.repartition(n_files).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        state = {"mv": initial_mv.localCheckpoint(eager=True), "epochs": 0}

        def fold(batch_df: DataFrame, epoch_id: int) -> None:
            partials = batch_df.groupBy(*keys).agg(
                *[F.sum(v).cast("bigint").alias(v) for v in vals]
            )
            merged = merge_partial_aggs(
                state["mv"].unionByName(partials), keys, vals
            )
            state["mv"] = merged.localCheckpoint(eager=True)
            state["epochs"] += 1

        q = (
            stream.writeStream.foreachBatch(fold)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if state["epochs"] < 2:
            raise RuntimeError(
                f"streaming_incremental_refresh expected >= 2 micro-batches "
                f"(got {state['epochs']}); the multi-epoch fold is the point "
                "of the streaming tier."
            )
        return state["mv"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def streaming_daily_uniques(
    spark: SparkSession,
    events_dir: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """EXACT distinct users per day AS A STREAM — normally impossible
    (streaming COUNT DISTINCT needs unbounded state per key) but the
    positional-bitmap trick (q63/q100) makes the distinct MERGEABLE:
    the one streaming aggregation keeps a fixed-size bitmap per
    (day, bucket) — new events OR bits in, state never grows with
    event count, RocksDB-friendly — and the bucket rollup (popcount +
    sum) runs on the sink table, the streaming-preagg /
    serving-layer-rollup split a production pipeline uses anyway
    (Spark disallows chained streaming aggregations). Result equals
    the batch per-day COUNT(DISTINCT) exactly — not an HLL estimate.
    """
    stream = _read_stream_events(spark, events_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 day").alias("w"),
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
        )
        .agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))")
             .alias("bm"))
        .select(
            F.to_date(F.col("w.start")).alias("day"),
            "bucket",
            "bm",
        )
    )
    name = f"stream_uniq_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy("day")
        .agg(F.expr("sum(bitmap_count(bm))").alias("n_users"))
    )


def streaming_embedding_dedup(
    spark: SparkSession,
    emb_path: str,
    corpus: DataFrame,
    threshold: float,
    dim: int,
    delta_max_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_tables: int = 8,
    target_occupancy: int = 32,
) -> DataFrame:
    """STREAMING incremental embedding dedup — the d23 ingest shape as
    a stream: arriving vectors (the delta, ``vec_id < delta_max_id``)
    probe the STATIC corpus's sign-LSH bucket table (stream-static
    equi-join on bucket id, stateless) and candidates verify with the
    exact JVM cosine fold inside the micro-batch. Append mode, memory
    sink, run to completion — the result equals the batch
    ``embedding_lsh_pairs(delta, index_df=corpus)`` bit for bit
    (deterministic hyperplanes, stateless plan), which is what makes
    it oracle-checkable.

    Scale notes: the probe explode carries the vector through the
    stream side (|delta| x tables(1+planes) rows per batch) so no
    stream self-join is needed; multi-table duplicate candidates are
    deduped in the returned batch frame (at scale:
    ``dropDuplicatesWithinWatermark`` keyed on the pair); the static
    bucket/vector frames are computed once and re-read per batch (at
    scale: a materialized bucket table, the d10/d23 index pattern).
    """
    import math

    from ..operators.similarity import _dot, _norm, sign_lsh_bucket_udf

    if n_planes is None:
        n = corpus.count()
        n_planes = max(
            3,
            min(24, math.ceil(math.log2(max(n, 2) / target_occupancy)))
            if n > target_occupancy
            else 3,
        )
    base_udf = sign_lsh_bucket_udf(dim, n_planes, n_tables, False)
    probe_udf = sign_lsh_bucket_udf(dim, n_planes, n_tables, True)
    base = corpus.select(
        F.col(id_col).alias("id_b"),
        F.explode(base_udf(F.col(vec_col))).alias("_bkt"),
    )
    vb = corpus.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        _norm(F.col(vec_col)).alias("_nb"),
    )
    schema = spark.read.parquet(emb_path).schema
    parent, _, fname = emb_path.rpartition("/")
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", fname)
        .parquet(parent)
    )
    delta = stream.filter(F.col(id_col) < delta_max_id)
    probe = delta.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        _norm(F.col(vec_col)).alias("_na"),
        F.explode(probe_udf(F.col(vec_col))).alias("_bkt"),
    )
    cos = _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    scored = (
        probe.join(base, "_bkt")
        .join(vb, "id_b")
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
    name = f"stream_embdedup_{uuid.uuid4().hex[:8]}"
    q = (
        scored.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).dropDuplicates(["id_a", "id_b"])


def streaming_growing_lsh_dedup(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    num_hashes: int = 30,
    bands: int = 10,
    threshold: float = 0.5,
    n_files: int = 4,
) -> DataFrame:
    """STREAMING near-dup detection against a SELF-GROWING index — the
    missing tier between st10 (stream probes a STATIC corpus index) and
    d10 (batch delta-vs-corpus): here the stream both probes AND
    maintains the MinHash band table, which is how a live ingest
    pipeline dedups against everything previously ingested without a
    nightly rebuild.

    Per micro-batch (foreachBatch, the st9/st11/st12 machinery):

    1. sign the batch once (:func:`~..operators.dedup.minhash_band_table`),
    2. CROSS pairs: batch bands equi-join the STANDING band table,
       exact-Jaccard-verified against the standing doc store
       (:func:`~..operators.dedup.incremental_lsh_pairs` — corpus text
       is touched only for candidate docs),
    3. INTRA pairs: the batch deduped against itself
       (:func:`~..operators.dedup.minhash_lsh_pairs` on the batch), and
    4. the batch's bands/docs are APPENDED to the standing state
       (eager localCheckpoint per epoch, the d5/g1 idiom — on a real
       cluster these are Delta MERGE/appends and the per-epoch algebra
       is unchanged).

    Every pair {a, b} is found EXACTLY once — at the epoch of its later
    member (cross) or its shared epoch (intra) — so the accumulated
    pair SET is split-invariant and equals the one-shot batch LSH
    result (d3's oracle) bit for bit: band collisions depend only on
    per-doc signatures, never on batch boundaries, and the exact
    verify recomputes the same integer shingle counts either way.
    State is index-sized (bands x 16 B/doc + the doc store), per-epoch
    work is O(batch + collisions) — history is never re-signed.
    """
    import shutil
    import tempfile

    from ..operators.dedup import (
        incremental_lsh_pairs,
        minhash_band_table,
        minhash_lsh_pairs,
    )

    tmp = tempfile.mkdtemp(prefix="st13_docs_")
    try:
        src = docs.select(
            F.col(id_col).cast("bigint").alias(id_col),
            F.col(text_col).alias(text_col),
        )
        src.repartition(n_files).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        empty_docs = src.filter(F.lit(False))
        state = {
            "docs": empty_docs.localCheckpoint(eager=True),
            "bands": minhash_band_table(
                empty_docs, id_col, text_col, ngram, num_hashes, bands
            ).localCheckpoint(eager=True),
            "pairs": spark.createDataFrame(
                [], "id_a bigint, id_b bigint, jaccard double"
            ).localCheckpoint(eager=True),
            "epochs": 0,
        }

        def fold(batch_df: DataFrame, epoch_id: int) -> None:
            batch = batch_df.localCheckpoint(eager=True)
            batch_bands = minhash_band_table(
                batch, id_col, text_col, ngram, num_hashes, bands
            ).localCheckpoint(eager=True)
            cross = incremental_lsh_pairs(
                batch,
                state["docs"],
                id_col,
                text_col,
                ngram,
                num_hashes,
                bands,
                threshold,
                corpus_bands=state["bands"],
            ).select(
                F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"),
                "jaccard",
            )
            intra = minhash_lsh_pairs(
                batch, id_col, text_col, ngram, num_hashes, bands,
                threshold,
            )
            state["pairs"] = (
                state["pairs"]
                .unionByName(cross)
                .unionByName(intra)
                .localCheckpoint(eager=True)
            )
            state["docs"] = (
                state["docs"].unionByName(batch).localCheckpoint(eager=True)
            )
            state["bands"] = (
                state["bands"]
                .unionByName(batch_bands)
                .localCheckpoint(eager=True)
            )
            state["epochs"] += 1

        q = (
            stream.writeStream.foreachBatch(fold)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if state["epochs"] < 2:
            raise RuntimeError(
                "streaming_growing_lsh_dedup expected >= 2 micro-batches "
                f"(got {state['epochs']}); the growing-state fold is the "
                "point of the streaming tier."
            )
        return state["pairs"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def streaming_substring_index(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 12,
    n_files: int = 4,
) -> DataFrame:
    """STREAMING maintenance of the d31/d33 substring-dedup GRAM INDEX
    — live ingest of the asset the incremental mode persists: each
    micro-batch contributes its positional n-gram partials
    (``dedup._positional_gram_stream`` → per-gram count + min-struct
    keeper) and the state folds them with SUM + MIN — two commutative
    monoids over a key computed one row at a time, so the finite-input
    state is split-invariant and the final index equals the one-shot
    batch aggregation bit for bit, regardless of arrival order (the
    st22 fold contract).

    The index is keyed by the gram's 64-bit hash in state, but EMITTED
    keyed by its keeper occurrence (keep_doc, keep_pos) — exactly one
    n-gram starts at a given (doc, pos), so the keeper is a unique,
    engine-neutral identity the DuckDB oracle can reproduce without
    xxhash64. Only duplicated grams (n_occ >= 2) are emitted: the
    d31 excision manifest for any document is then one join of its
    gram stream against this standing index.

    Streaming honesty: state is O(|distinct grams|) rows — the same
    growth contract as st22's vocabulary state (a production deploy
    ages out singleton grams when the budget demands, exactly the
    hapax note there). Per-epoch work is one map-only gram census of
    the batch + a state-sized merge; history is never re-scanned.

    Returns (keep_doc, keep_pos, n_occ), one row per duplicated gram.
    """
    import shutil
    import tempfile

    from ..operators.dedup import _positional_gram_stream

    src = docs.select(
        F.col(id_col).cast("bigint").alias(id_col), F.col(text_col)
    )
    tmp = tempfile.mkdtemp(prefix="st23_gram_")
    try:
        src.repartition(n_files).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        empty = (
            spark.range(0)
            .select(
                F.lit(0).cast("bigint").alias("_gh"),
                F.lit(0).cast("bigint").alias("n_occ"),
                F.struct(
                    F.lit(0).cast("bigint").alias("_id"),
                    F.lit(0).cast("int").alias("pos"),
                ).alias("_keep"),
            )
            .filter(F.lit(False))
        )
        state = {"idx": empty.localCheckpoint(eager=True), "epochs": 0}

        def fold(batch_df: DataFrame, epoch_id: int) -> None:
            partials = (
                _positional_gram_stream(batch_df, id_col, text_col, n)
                .groupBy("_gh")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_occ"),
                    F.min(F.struct("_id", "pos")).alias("_keep"),
                )
            )
            merged = (
                state["idx"]
                .unionByName(partials)
                .groupBy("_gh")
                .agg(
                    F.sum("n_occ").cast("bigint").alias("n_occ"),
                    F.min("_keep").alias("_keep"),
                )
            )
            state["idx"] = merged.localCheckpoint(eager=True)
            state["epochs"] += 1

        q = (
            stream.writeStream.foreachBatch(fold)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if state["epochs"] < 2:
            raise RuntimeError(
                "streaming_substring_index expected >= 2 micro-batches "
                f"(got {state['epochs']}); the multi-epoch fold is the "
                "point of the streaming tier."
            )
        return (
            state["idx"]
            .filter(F.col("n_occ") >= 2)
            .select(
                F.col("_keep._id").cast("bigint").alias("keep_doc"),
                F.col("_keep.pos").cast("bigint").alias("keep_pos"),
                F.col("n_occ"),
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def streaming_topk_maintenance(
    spark: SparkSession,
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_files: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """STREAMING per-query exact top-k maintenance — continuous k-NN
    serving over an ARRIVING corpus: vectors stream in, each
    micro-batch is scored against the standing broadcast query set
    (the s1 algebra restricted to the batch), and the per-query top-k
    state is refolded as union-then-truncate. Top-k under a total
    order (score DESC, item_id ASC) is an associative, split-invariant
    fold — max-k(A ∪ B) = max-k(max-k(A) ∪ B) — and each row's score
    is the same JVM expression on the same values either way, so the
    final state equals the one-shot batch scan (the s1 oracle) bit
    for bit, regardless of how ingest was micro-batched.

    Per-epoch work is O(batch x Q) scoring plus a (Q x 2k)-row
    truncation; standing state is exactly Q x k rows (eager
    localCheckpoint per epoch, the st9-st13 idiom — on a real cluster
    the state row set lives in the sink table and the per-epoch
    algebra is unchanged). History is never re-scored: this is the
    serving-side companion to st10/st13's index-side maintenance."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from ..operators.similarity import cosine_similarity

    tmp = tempfile.mkdtemp(prefix="st14_vecs_")
    try:
        src = items.select(
            F.col(id_col).cast("bigint").alias(id_col), F.col(vec_col)
        )
        src.repartition(n_files).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        q = queries.select(
            F.col(query_id_col), F.col(vec_col).alias("_qvec")
        ).localCheckpoint(eager=True)
        w = Window.partitionBy(query_id_col).orderBy(
            F.col("score").desc(), F.col("item_id").asc()
        )

        def _truncate(frame: DataFrame) -> DataFrame:
            return (
                frame.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") <= k)
                .select(query_id_col, "item_id", "score")
            )

        state = {
            "topk": spark.createDataFrame(
                [], f"{query_id_col} bigint, item_id bigint, score double"
            ).localCheckpoint(eager=True),
            "epochs": 0,
        }

        def fold(batch_df: DataFrame, epoch_id: int) -> None:
            scored = (
                batch_df.select(
                    F.col(id_col).alias("item_id"),
                    F.col(vec_col).alias("_ivec"),
                )
                .crossJoin(F.broadcast(q))
                .filter(F.col("item_id") != F.col(query_id_col))
                .select(
                    query_id_col,
                    "item_id",
                    cosine_similarity(
                        F.col("_ivec"), F.col("_qvec")
                    ).alias("score"),
                )
            )
            state["topk"] = _truncate(
                state["topk"].unionByName(_truncate(scored))
            ).localCheckpoint(eager=True)
            state["epochs"] += 1

        sq = (
            stream.writeStream.foreachBatch(fold)
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination()
        if state["epochs"] < 2:
            raise RuntimeError(
                "streaming_topk_maintenance expected >= 2 micro-batches "
                f"(got {state['epochs']}); the incremental refold is the "
                "point of the streaming tier."
            )
        return (
            state["topk"]
            .withColumn("rank", F.row_number().over(w))
            .select(query_id_col, "item_id", "rank")
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def streaming_manifest_maintenance(
    spark: SparkSession,
    rows: DataFrame,
    partition_col: str,
    repr_col: str,
    n_files: int = 4,
) -> DataFrame:
    """STREAMING maintenance of q113's order-invariant partition
    manifest: each micro-batch computes its own (count, hash_sum,
    hash_xor) partials distributed-side, then folds them into the
    running manifest — sum/count by addition, the xor channel by
    ``bit_xor`` (a commutative monoid the generic SUM-only st9
    machinery can't fold, which is exactly why this fold exists).
    All three channels are associative + commutative, so the finite-
    input result is independent of how the feed splits into micro-
    batches and equals the batch manifest bit for bit — the oracle
    recomputes it from the full table. This is how an ingest pipeline
    keeps per-partition integrity checksums current (and diffs them
    against a replica's) without ever rescanning history.

    Same harness as st9/st11/st12: the feed spills to ``n_files``
    parquet files, streams back under ``Trigger.AvailableNow`` with
    ``maxFilesPerTrigger=1`` (so the fold genuinely crosses epochs),
    and the manifest frame is eagerly checkpointed per epoch to keep
    lineage flat. Per-epoch work is O(batch + |manifest|); manifest
    state is O(partitions).
    """
    import shutil
    import tempfile

    from ..operators.relational import partition_manifest, wrap_sum_to_i64

    src = rows.select(
        F.col(partition_col).alias("part"), F.col(repr_col).alias("repr")
    )
    tmp = tempfile.mkdtemp(prefix="st15_manifest_")
    try:
        src.repartition(n_files).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        empty = (
            spark.range(0)
            .select(
                F.lit("").alias("part"),
                F.lit(0).cast("bigint").alias("n_rows"),
                F.lit(0).cast("bigint").alias("hash_sum"),
                F.lit(0).cast("bigint").alias("hash_xor"),
            )
            .filter(F.lit(False))
        )
        state = {"mv": empty.localCheckpoint(eager=True), "epochs": 0}

        def fold(batch_df: DataFrame, epoch_id: int) -> None:
            partials = partition_manifest(
                batch_df, F.col("part"), F.col("repr")
            )
            merged = (
                state["mv"]
                .unionByName(partials)
                .groupBy("part")
                .agg(
                    F.sum("n_rows").cast("bigint").alias("n_rows"),
                    # partials are already mod-2^64-wrapped bigints; an
                    # exact decimal re-fold + the same wrap is the batch
                    # sum's wrap (mod arithmetic is a homomorphism)
                    wrap_sum_to_i64(
                        F.sum(F.col("hash_sum").cast("decimal(38,0)"))
                    ).alias("hash_sum"),
                    F.bit_xor("hash_xor").alias("hash_xor"),
                )
            )
            state["mv"] = merged.localCheckpoint(eager=True)
            state["epochs"] += 1

        q = (
            stream.writeStream.foreachBatch(fold)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if state["epochs"] < 2:
            raise RuntimeError(
                f"streaming_manifest_maintenance expected >= 2 micro-batches "
                f"(got {state['epochs']}); the multi-epoch fold is the point "
                "of the streaming tier."
            )
        return state["mv"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def streaming_exact_dedup(
    spark: SparkSession,
    rows: DataFrame,
    id_col: str,
    text_col: str,
    n_files: int = 4,
) -> DataFrame:
    """STREAMING exact deduplication — the ingest-side twin of d1: as
    documents arrive, maintain the per-content-hash dedup manifest
    (keeper = minimum id seen so far, n_copies = copies seen so far).
    Both channels are commutative monoids (MIN and SUM over the md5
    content hash), so the finite-input state is independent of how the
    feed splits into micro-batches and equals the batch group-by bit
    for bit — the oracle recomputes it from the full table. This is
    how a crawl/ingest pipeline keeps "which doc wins, how many copies
    exist" current without rescanning history; the keeper-id-min rule
    is d1's deterministic winner.

    Same harness as st9/st15: the feed spills to ``n_files`` parquet
    files, streams back under ``Trigger.AvailableNow`` with
    ``maxFilesPerTrigger=1`` (the fold genuinely crosses epochs), the
    manifest is eagerly checkpointed per epoch. Per-epoch work is
    O(batch + |manifest|); state is O(distinct contents) — at 100 TB
    the state itself shards by content hash (it is a hash-keyed agg,
    map-side combinable).

    Returns (id_col, n_copies): one row per distinct content, id =
    the keeper.
    """
    import shutil
    import tempfile

    src = rows.select(
        F.col(id_col).cast("bigint").alias("_id"),
        F.md5(F.col(text_col).cast("binary")).alias("_h"),
    )
    tmp = tempfile.mkdtemp(prefix="st16_dedup_")
    try:
        src.repartition(n_files).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        empty = (
            spark.range(0)
            .select(
                F.lit("").alias("_h"),
                F.lit(0).cast("bigint").alias("_id"),
                F.lit(0).cast("bigint").alias("n_copies"),
            )
            .filter(F.lit(False))
        )
        state = {"mv": empty.localCheckpoint(eager=True), "epochs": 0}

        def fold(batch_df: DataFrame, epoch_id: int) -> None:
            partials = batch_df.groupBy("_h").agg(
                F.min("_id").alias("_id"),
                F.count(F.lit(1)).alias("n_copies"),
            )
            merged = (
                state["mv"]
                .unionByName(partials)
                .groupBy("_h")
                .agg(
                    F.min("_id").alias("_id"),
                    F.sum("n_copies").cast("bigint").alias("n_copies"),
                )
            )
            state["mv"] = merged.localCheckpoint(eager=True)
            state["epochs"] += 1

        q = (
            stream.writeStream.foreachBatch(fold)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if state["epochs"] < 2:
            raise RuntimeError(
                f"streaming_exact_dedup expected >= 2 micro-batches "
                f"(got {state['epochs']}); the multi-epoch fold is the "
                "point of the streaming tier."
            )
        return state["mv"].select(F.col("_id").alias(id_col), "n_copies")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def streaming_band_manifest(
    spark: SparkSession,
    rows: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    n_files: int = 4,
) -> DataFrame:
    """STREAMING maintenance of the banded-MinHash NEAR-DUP manifest —
    st16's exact-dedup fold generalized to the d3 LSH family: as
    documents arrive, each micro-batch signs ONLY its own docs
    (:func:`~..operators.dedup.portable_minhash_bands`) and folds its
    per-(band, band-key) partials — keeper = MIN(doc_id), n_docs =
    SUM(count) — into the running manifest. Both channels are
    commutative monoids over keys computed from one doc at a time, so
    the finite-input state is independent of how the feed splits into
    micro-batches and equals the one-shot batch manifest bit for bit;
    the oracle recomputes the whole manifest from the full table in
    SQL (the portable md5-prefix hashes are what make that possible —
    the xxhash64 production flavor has the same algebra but can only
    be envelope-checked).

    This is how a 100 TB ingest keeps its near-dup index current
    WITHOUT re-signing history: per-epoch work is O(batch grams +
    |manifest touched|), state is O(docs x bands) fixed-width rows
    sharded by (band, band-key) — a hash-keyed agg, map-side
    combinable. A bucket with n_docs >= 2 is a near-dup candidate
    group whose members collide on that band slice; keeper-id-min is
    d1/d3's deterministic winner rule.

    Same harness as st9/st15/st16: the feed spills to ``n_files``
    parquet files, streams back under ``Trigger.AvailableNow`` with
    ``maxFilesPerTrigger=1`` (the fold genuinely crosses epochs), the
    manifest eagerly checkpointed per epoch.

    Returns (band, bkey, keeper_id, n_docs).
    """
    import shutil
    import tempfile

    from ..operators.dedup import portable_minhash_bands

    src = rows.select(
        F.col(id_col).cast("bigint").alias("_id"),
        F.col(text_col).alias("_text"),
    )
    tmp = tempfile.mkdtemp(prefix="st17_bands_")
    try:
        src.repartition(n_files).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        empty = (
            spark.range(0)
            .select(
                F.lit(0).cast("int").alias("band"),
                F.lit("").alias("bkey"),
                F.lit(0).cast("bigint").alias("keeper_id"),
                F.lit(0).cast("bigint").alias("n_docs"),
            )
            .filter(F.lit(False))
        )
        state = {"mv": empty.localCheckpoint(eager=True), "epochs": 0}

        def fold(batch_df: DataFrame, epoch_id: int) -> None:
            partials = (
                portable_minhash_bands(
                    batch_df, "_id", "_text", ngram, num_hashes, bands
                )
                .groupBy("band", "bkey")
                .agg(
                    F.min("_id").alias("keeper_id"),
                    F.count(F.lit(1)).alias("n_docs"),
                )
            )
            merged = (
                state["mv"]
                .unionByName(partials)
                .groupBy("band", "bkey")
                .agg(
                    F.min("keeper_id").alias("keeper_id"),
                    F.sum("n_docs").cast("bigint").alias("n_docs"),
                )
            )
            state["mv"] = merged.localCheckpoint(eager=True)
            state["epochs"] += 1

        q = (
            stream.writeStream.foreachBatch(fold)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if state["epochs"] < 2:
            raise RuntimeError(
                "streaming_band_manifest expected >= 2 micro-batches "
                f"(got {state['epochs']}); the multi-epoch fold is the "
                "point of the streaming tier."
            )
        return state["mv"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def streaming_cell_manifest(
    spark: SparkSession,
    rows: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    scale: int = 1000,
    n_files: int = 4,
) -> DataFrame:
    """STREAMING maintenance of the ANN index's CELL-OCCUPANCY manifest
    — the statistic the s18 kNN join and the IVF family derive their
    occupancy-sized geometry from (n_cells = |R| // 64, re-train
    triggers), kept current as embeddings arrive instead of recounted
    from history: each micro-batch assigns ONLY its own vectors to
    engine-portable sign-LSH cells
    (:func:`~..operators.similarity.portable_sign_cells`) and folds
    per-cell partials — n_vecs = SUM(count), min_vec_id = MIN,
    mass_q = SUM(int64 quantized squared norm) — into the running
    manifest. All three channels are commutative monoids over a key
    computed from one vector at a time, so the finite-input state is
    split-invariant and equals the one-shot batch group-by bit for
    bit; the oracle recomputes the whole manifest in SQL (the ±1
    md5-parity planes and the integer grid are what make the cell
    boundary itself cross-engine exact).

    100 TB shape: state is O(2^n_planes) fixed-width rows — a
    hash-keyed agg with map-side combine; per-epoch work is one
    map-only projection of the batch. A cell whose n_vecs outruns the
    occupancy contract is the re-train signal (the s18 lesson made
    incremental).

    Same harness as st16/st17: the feed spills to ``n_files`` parquet
    files, streams back under ``Trigger.AvailableNow`` with
    ``maxFilesPerTrigger=1`` (the fold genuinely crosses epochs), the
    manifest eagerly checkpointed per epoch.

    Returns (cell, n_vecs, min_vec_id, mass_q).
    """
    import shutil
    import tempfile

    from ..operators.similarity import portable_sign_cells

    src = rows.select(
        F.col(id_col).cast("bigint").alias("_id"),
        F.col(vec_col).alias("_vec"),
    )
    first = src.select("_vec").first()
    dim = len(first[0]) if first and first[0] is not None else 0
    tmp = tempfile.mkdtemp(prefix="st18_cells_")
    try:
        src.repartition(n_files).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        empty = (
            spark.range(0)
            .select(
                F.lit(0).cast("int").alias("cell"),
                F.lit(0).cast("bigint").alias("n_vecs"),
                F.lit(0).cast("bigint").alias("min_vec_id"),
                F.lit(0).cast("bigint").alias("mass_q"),
            )
            .filter(F.lit(False))
        )
        state = {"mv": empty.localCheckpoint(eager=True), "epochs": 0}

        def fold(batch_df: DataFrame, epoch_id: int) -> None:
            partials = (
                portable_sign_cells(
                    batch_df, "_id", "_vec", n_planes, scale, dim=dim
                )
                .groupBy("cell")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
                    F.min("_id").alias("min_vec_id"),
                    F.sum("norm_q").cast("bigint").alias("mass_q"),
                )
            )
            merged = (
                state["mv"]
                .unionByName(partials)
                .groupBy("cell")
                .agg(
                    F.sum("n_vecs").cast("bigint").alias("n_vecs"),
                    F.min("min_vec_id").alias("min_vec_id"),
                    F.sum("mass_q").cast("bigint").alias("mass_q"),
                )
            )
            state["mv"] = merged.localCheckpoint(eager=True)
            state["epochs"] += 1

        q = (
            stream.writeStream.foreachBatch(fold)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if state["epochs"] < 2:
            raise RuntimeError(
                "streaming_cell_manifest expected >= 2 micro-batches "
                f"(got {state['epochs']}); the multi-epoch fold is the "
                "point of the streaming tier."
            )
        return state["mv"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def streaming_histogram(
    spark: SparkSession,
    rows: DataFrame,
    value_col: str,
    n_bins: int,
    lo: int,
    hi: int,
    n_files: int = 4,
) -> DataFrame:
    """STREAMING maintenance of a fixed-width integer histogram — the
    live tier of ``relational.integer_histogram`` (whose bins feed the
    q115 quantile sketch): each micro-batch bins ONLY its own rows and
    folds per-bin partials into the running state — n_rows = SUM,
    min_value = MIN, max_value = MAX, all commutative monoids over a
    key computed from one row at a time, so the finite-input state is
    split-invariant and equals the one-shot batch group-by bit for bit
    (the st16/st17/st18 fold contract; the oracle recomputes the whole
    histogram in SQL).

    Streaming honesty: bounds are FIXED parameters, not data-derived —
    a stream cannot pre-scan min/max, so out-of-range arrivals clamp
    into the edge bins (the integer_histogram clamp), keeping the
    histogram total without re-binning history; a production monitor
    re-bins offline when the edge bins outgrow the contract (the st18
    re-train-signal pattern). State is O(n_bins) fixed-width rows;
    per-epoch work is one map-only projection of the batch.

    Returns (bin, n_rows, min_value, max_value).
    """
    import shutil
    import tempfile

    from ..operators.relational import integer_histogram

    src = rows.select(F.col(value_col).cast("bigint").alias("_v"))
    tmp = tempfile.mkdtemp(prefix="st20_hist_")
    try:
        src.repartition(n_files).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        empty = (
            spark.range(0)
            .select(
                F.lit(0).cast("bigint").alias("bin"),
                F.lit(0).cast("bigint").alias("n_rows"),
                F.lit(0).cast("bigint").alias("min_value"),
                F.lit(0).cast("bigint").alias("max_value"),
            )
            .filter(F.lit(False))
        )
        state = {"mv": empty.localCheckpoint(eager=True), "epochs": 0}

        def fold(batch_df: DataFrame, epoch_id: int) -> None:
            partials = integer_histogram(
                batch_df, F.col("_v"), n_bins, lo, hi
            )
            merged = (
                state["mv"]
                .unionByName(partials)
                .groupBy("bin")
                .agg(
                    F.sum("n_rows").cast("bigint").alias("n_rows"),
                    F.min("min_value").alias("min_value"),
                    F.max("max_value").alias("max_value"),
                )
            )
            state["mv"] = merged.localCheckpoint(eager=True)
            state["epochs"] += 1

        q = (
            stream.writeStream.foreachBatch(fold)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if state["epochs"] < 2:
            raise RuntimeError(
                "streaming_histogram expected >= 2 micro-batches "
                f"(got {state['epochs']}); the multi-epoch fold is the "
                "point of the streaming tier."
            )
        return state["mv"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def streaming_effective_tokens(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    n_files: int = 4,
) -> DataFrame:
    """STREAMING dedup-savings dashboard — the live tier of c15's
    dedup-aware token accounting: as documents arrive, maintain per
    source the raw docs/tokens AND the docs/tokens that survive global
    exact dedup (keeper = min doc_id per identical text, credited to
    the keeper's own source), without ever re-scanning history.

    Two monoid states, both folded per micro-batch:

    1. per-source raw counters — (n_docs, raw_tokens), SUM monoids;
    2. per-content-hash keeper state — argmin over doc id encoded as
       ``MIN(struct(doc_id, source))`` (doc ids are unique, so the
       struct order is total and the MIN commutative/split-invariant
       — a later micro-batch carrying an EARLIER id correctly steals
       keeper status), plus the group's token count (any one value:
       identical text implies identical tokens).

    The report derives at read time: kept docs/tokens per source =
    count/sum of keeper groups whose keeper landed in that source,
    LEFT-joined onto the raw counters so a source whose every doc lost
    to another source still reports (n_kept = 0). State is
    O(sources) + O(distinct contents) — the st16 bound; equals the
    batch c15 report bit for bit (the oracle recomputes it whole).

    Returns (source, n_docs, n_kept, raw_tokens, kept_tokens).
    """
    import shutil
    import tempfile

    toks = F.size(F.split(F.trim(F.col(text_col)), "\\s+")).cast("bigint")
    src = docs.select(
        F.col(id_col).cast("bigint").alias("_id"),
        F.col(source_col).alias("_src"),
        F.md5(F.col(text_col).cast("binary")).alias("_ch"),
        toks.alias("_t"),
    )
    tmp = tempfile.mkdtemp(prefix="st21_efftok_")
    try:
        src.repartition(n_files).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        raw0 = (
            spark.range(0)
            .select(
                F.lit("").alias("_src"),
                F.lit(0).cast("bigint").alias("n_docs"),
                F.lit(0).cast("bigint").alias("raw_tokens"),
            )
            .filter(F.lit(False))
        )
        keep0 = (
            spark.range(0)
            .select(
                F.lit("").alias("_ch"),
                F.struct(
                    F.lit(0).cast("bigint").alias("_id"),
                    F.lit("").alias("_src"),
                ).alias("_keeper"),
                F.lit(0).cast("bigint").alias("_tok"),
            )
            .filter(F.lit(False))
        )
        state = {
            "raw": raw0.localCheckpoint(eager=True),
            "keep": keep0.localCheckpoint(eager=True),
            "epochs": 0,
        }

        def fold(batch_df: DataFrame, epoch_id: int) -> None:
            raw_p = batch_df.groupBy("_src").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("_t").cast("bigint").alias("raw_tokens"),
            )
            keep_p = batch_df.groupBy("_ch").agg(
                F.min(F.struct("_id", "_src")).alias("_keeper"),
                F.any_value("_t").cast("bigint").alias("_tok"),
            )
            state["raw"] = (
                state["raw"]
                .unionByName(raw_p)
                .groupBy("_src")
                .agg(
                    F.sum("n_docs").cast("bigint").alias("n_docs"),
                    F.sum("raw_tokens").cast("bigint").alias("raw_tokens"),
                )
                .localCheckpoint(eager=True)
            )
            state["keep"] = (
                state["keep"]
                .unionByName(keep_p)
                .groupBy("_ch")
                .agg(
                    F.min("_keeper").alias("_keeper"),
                    F.any_value("_tok").alias("_tok"),
                )
                .localCheckpoint(eager=True)
            )
            state["epochs"] += 1

        q = (
            stream.writeStream.foreachBatch(fold)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if state["epochs"] < 2:
            raise RuntimeError(
                "streaming_effective_tokens expected >= 2 micro-batches "
                f"(got {state['epochs']}); the multi-epoch fold is the "
                "point of the streaming tier."
            )
        kept = (
            state["keep"]
            .groupBy(F.col("_keeper._src").alias("_src"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_kept"),
                F.sum("_tok").cast("bigint").alias("kept_tokens"),
            )
        )
        return (
            state["raw"]
            .join(kept, "_src", "left")
            .select(
                F.col("_src").alias(source_col),
                "n_docs",
                F.coalesce("n_kept", F.lit(0)).cast("bigint").alias(
                    "n_kept"
                ),
                "raw_tokens",
                F.coalesce("kept_tokens", F.lit(0))
                .cast("bigint")
                .alias("kept_tokens"),
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def streaming_decontam_census(
    spark: SparkSession,
    train: DataFrame,
    evalset: DataFrame,
    tau_num: int = 7,
    band_den: int = 20,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_files: int = 4,
) -> DataFrame:
    """STREAMING decontamination CENSUS — the eval-side twin of x19: as
    training vectors arrive, fold the per-eval-item leak counter
    (n_hits = how many train vectors so far cross the x19 integer
    cosine band against this eval item). Each micro-batch scores ONLY
    its own rows against the broadcast eval set
    (:func:`~..operators.similarity.semantic_decontam_pairs` — the
    SAME membership kernel x19 uses, so the census and the flags can
    never disagree) and SUMs into the running manifest; eval items
    with zero hits stay present at 0 (the census answers "which
    benchmark items leak MOST", so zero rows are data, not absence).

    SUM over per-row band membership is a commutative monoid, so the
    streamed state is split-invariant and equals the one-shot batch
    group-by bit for bit; the oracle recomputes it whole in HUGEINT.
    State is O(|eval|) rows — tiny by nature — and per-epoch work is
    one map-side scan of the batch: a 100 TB ingest keeps its
    benchmark-leak dashboard current without ever rescanning history.

    Same harness as st16-st18: the feed spills to ``n_files`` parquet
    files, streams back under ``Trigger.AvailableNow`` with
    ``maxFilesPerTrigger=1``, the manifest eagerly checkpointed per
    epoch.

    Returns (eval_id, n_hits).
    """
    import shutil
    import tempfile

    from ..operators.similarity import semantic_decontam_pairs

    src = train.select(
        F.col(id_col).cast("bigint").alias("_id"),
        F.col(vec_col).alias("_vec"),
    )
    ev = evalset.select(
        F.col(id_col).cast("bigint").alias(id_col), F.col(vec_col)
    ).localCheckpoint(eager=True)  # consumers: every epoch's score pass
    tmp = tempfile.mkdtemp(prefix="st19_census_")
    try:
        src.repartition(n_files).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        zero = ev.select(
            F.col(id_col).alias("eval_id"),
            F.lit(0).cast("bigint").alias("n_hits"),
        )
        state = {"mv": zero.localCheckpoint(eager=True), "epochs": 0}

        def fold(batch_df: DataFrame, epoch_id: int) -> None:
            partials = (
                semantic_decontam_pairs(
                    batch_df.select(
                        F.col("_id").alias(id_col),
                        F.col("_vec").alias(vec_col),
                    ),
                    ev,
                    tau_num=tau_num,
                    band_den=band_den,
                    scale=scale,
                    id_col=id_col,
                    vec_col=vec_col,
                )
                .groupBy("eval_id")
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
            )
            merged = (
                state["mv"]
                .unionByName(partials)
                .groupBy("eval_id")
                .agg(F.sum("n_hits").cast("bigint").alias("n_hits"))
            )
            state["mv"] = merged.localCheckpoint(eager=True)
            state["epochs"] += 1

        q = (
            stream.writeStream.foreachBatch(fold)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if state["epochs"] < 2:
            raise RuntimeError(
                "streaming_decontam_census expected >= 2 micro-batches "
                f"(got {state['epochs']}); the multi-epoch fold is the "
                "point of the streaming tier."
            )
        return state["mv"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def streaming_zipf_profile(
    spark: SparkSession,
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    n_files: int = 4,
) -> DataFrame:
    """STREAMING maintenance of the t41 Zipf vocabulary census — the
    live vocabulary-health monitor: each micro-batch contributes its
    own per-(group, token) frequencies (``text.zipf_census``) and the
    running state folds them with SUM — one commutative monoid over a
    key computed from one row at a time, so the finite-input state is
    split-invariant and the profile derived at read time equals the
    one-shot batch :func:`text.zipf_profile` bit for bit (the st20/
    st21 fold contract; the oracle recomputes the whole profile in
    SQL).

    The rank/bucket step (grouped_rank + integer log2) runs ONCE on
    the final census — ranks are NOT mergeable across batches (a
    token's rank depends on every other token's total), which is
    exactly why the state holds raw counters and the profile is a
    read-time derivation (the st21 report-at-read pattern).

    Streaming honesty: state is O(|vocab| x groups) growing rows (the
    st13 growing-index tier's contract — vocabulary growth is
    sublinear in corpus tokens by Heaps' law; a production monitor
    ages out hapax counters when the state budget demands). Per-epoch
    work is one map-only census of the batch + a state-sized merge.

    Returns (``group_col``, rank_bucket, n_types, sum_freq, max_freq,
    min_freq) — the t41 schema.
    """
    import shutil
    import tempfile

    from ..operators.text import zipf_census, zipf_profile_from_census

    src = docs.select(F.col(group_col), F.col(text_col))
    tmp = tempfile.mkdtemp(prefix="st22_zipf_")
    try:
        src.repartition(n_files).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        empty = (
            spark.range(0)
            .select(
                F.lit("").alias(group_col),
                F.lit("").alias("token"),
                F.lit(0).cast("bigint").alias("freq"),
            )
            .filter(F.lit(False))
        )
        state = {"mv": empty.localCheckpoint(eager=True), "epochs": 0}

        def fold(batch_df: DataFrame, epoch_id: int) -> None:
            partials = zipf_census(batch_df, group_col, text_col)
            merged = (
                state["mv"]
                .unionByName(partials)
                .groupBy(group_col, "token")
                .agg(F.sum("freq").cast("bigint").alias("freq"))
            )
            state["mv"] = merged.localCheckpoint(eager=True)
            state["epochs"] += 1

        q = (
            stream.writeStream.foreachBatch(fold)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if state["epochs"] < 2:
            raise RuntimeError(
                "streaming_zipf_profile expected >= 2 micro-batches "
                f"(got {state['epochs']}); the multi-epoch fold is the "
                "point of the streaming tier."
            )
        return zipf_profile_from_census(state["mv"], group_col)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
