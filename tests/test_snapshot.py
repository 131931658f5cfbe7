"""Transactional snapshot tables (plans/snapshot.py): manifest-as-commit
MERGE sink — the production twin of the c6/st9 MV story.

Covers: write/read roundtrip, MERGE semantics (update/insert/delete)
against an independently computed expectation, snapshot isolation /
time travel, partition-pruned copy-on-write (untouched files carry
over BY PATH), commit-conflict detection with a REAL two-thread race
(serializability), vacuum reclamation, schema evolution (carried files
read NULL for added columns), history metadata + compaction
content-identity, change data feed (incl. across an evolution
boundary), streaming upsert == one-batch apply, and INMET-pipeline
determinism proven as an empty CDF between two versioned loads.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_etl_pyspark_inmet_spark.plans.snapshot import (
    _commit_manifest,
    _list_manifest_versions,
    _read_manifest,
    snapshot_merge,
    snapshot_read,
    snapshot_vacuum,
    snapshot_write,
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_snapshot_write_read_roundtrip(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i * 10, i % 3) for i in range(100)], "k bigint, v bigint, p int"
    )
    v1 = snapshot_write(spark, t, df)
    assert v1 == 1
    assert _rows(snapshot_read(spark, t)) == _rows(df)


def test_snapshot_merge_update_insert_delete(spark, tmp_path):
    t = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, i * 10) for i in range(50)], "k bigint, v bigint"
    )
    snapshot_write(spark, t, base)
    # delta: update k<5 to v=-1, insert k=100..104, delete k in 40..44
    delta = spark.createDataFrame(
        [(i, -1, False) for i in range(5)]
        + [(i, i, False) for i in range(100, 105)]
        + [(i, 0, True) for i in range(40, 45)],
        "k bigint, v bigint, is_del boolean",
    )
    v2 = snapshot_merge(spark, t, delta, keys=["k"], delete_col="is_del")
    assert v2 == 2
    expect = (
        {(i, -1) for i in range(5)}
        | {(i, i * 10) for i in range(5, 40)}
        | {(i, i * 10) for i in range(45, 50)}
        | {(i, i) for i in range(100, 105)}
    )
    assert _rows(snapshot_read(spark, t)) == expect
    # time travel: v1 is untouched
    assert _rows(snapshot_read(spark, t, version=1)) == _rows(base)


def test_snapshot_merge_partition_pruning_carries_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, i * 10, i % 4) for i in range(200)], "k bigint, v bigint, p int"
    )
    snapshot_write(spark, t, base, partition_col="p")
    man1 = _read_manifest(spark, t, 1)
    untouched_before = {
        f["path"] for f in man1["files"] if f["partition"] != "1"
    }
    # delta touches ONLY partition 1
    delta = spark.createDataFrame(
        [(1, -99, 1), (1001, 5, 1)], "k bigint, v bigint, p int"
    )
    snapshot_merge(spark, t, delta, keys=["k"], partition_col="p")
    man2 = _read_manifest(spark, t, 2)
    untouched_after = {
        f["path"] for f in man2["files"] if f["partition"] != "1"
    }
    # copy-on-write pruning: files of partitions 0/2/3 carried verbatim
    assert untouched_after == untouched_before
    got = snapshot_read(spark, t)
    assert got.filter(F.col("k") == 1).collect()[0]["v"] == -99
    assert got.filter(F.col("k") == 1001).count() == 1
    assert got.count() == 201
    # the reconstructed partition column keeps its integer type
    assert dict(got.dtypes)["p"] == "int"


def test_snapshot_commit_conflict_raises_and_merge_retries(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, 1)], "k bigint, v bigint")
    snapshot_write(spark, t, df)
    # simulate a racing writer: pre-commit version 2 manifest
    man = _read_manifest(spark, t, 1)
    _commit_manifest(spark, t, 2, {**man, "version": 2})
    with pytest.raises(RuntimeError, match="conflict"):
        _commit_manifest(spark, t, 2, {**man, "version": 2})
    # merge retries against the winner's snapshot and lands as v3
    delta = spark.createDataFrame([(2, 2)], "k bigint, v bigint")
    v = snapshot_merge(spark, t, delta, keys=["k"])
    assert v == 3
    assert _rows(snapshot_read(spark, t)) == {(1, 1), (2, 2)}


def test_snapshot_vacuum_reclaims_only_dead_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i) for i in range(20)], "k bigint, v bigint"
    )
    snapshot_write(spark, t, df)
    snapshot_merge(
        spark, t,
        spark.createDataFrame([(0, -1)], "k bigint, v bigint"),
        keys=["k"],
    )
    snapshot_merge(
        spark, t,
        spark.createDataFrame([(1, -2)], "k bigint, v bigint"),
        keys=["k"],
    )
    assert _list_manifest_versions(spark, t) == [1, 2, 3]
    expect_latest = _rows(snapshot_read(spark, t))
    deleted = snapshot_vacuum(spark, t, keep=1)
    # v1/v2's unshared files are gone, v3 still reads exactly the same
    assert deleted
    assert _list_manifest_versions(spark, t) == [3]
    assert _rows(snapshot_read(spark, t)) == expect_latest


def test_snapshot_mv_maintenance_equals_full_recompute(spark, sf_small):
    """The c6 theorem through the SINK: maintain a monthly-revenue MV
    snapshot table with a CDC merge and compare against a from-scratch
    recompute over the changed base."""
    orders = spark.read.parquet(f"{sf_small}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    import tempfile

    t = tempfile.mkdtemp(prefix="mvsnap") + "/mv"
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    mv = orders.groupBy(
        F.year("o_orderdate").alias("ano"), F.month("o_orderdate").alias("mes")
    ).agg(F.sum(cents).alias("price_cents"))
    snapshot_write(spark, t, mv)
    # CDC: bump every %5 order by 10 -> per-group delta merge
    changed = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 10)
        .otherwise(F.col("o_totalprice")),
    )
    new_mv = changed.groupBy(
        F.year("o_orderdate").alias("ano"), F.month("o_orderdate").alias("mes")
    ).agg(F.sum(cents).alias("price_cents"))
    snapshot_merge(spark, t, new_mv, keys=["ano", "mes"])
    assert _rows(snapshot_read(spark, t)) == _rows(new_mv)


def test_snapshot_merge_schema_evolution(spark, tmp_path):
    """A source with an ADDED column widens the table: surviving old
    rows (and carried untouched-partition files) read NULL for it;
    time travel still shows the pre-evolution schema."""
    t = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, i * 10, i % 3) for i in range(30)], "k bigint, v bigint, p int"
    )
    snapshot_write(spark, t, base, partition_col="p")
    delta = spark.createDataFrame(
        [(0, -1, 0, "new")], "k bigint, v bigint, p int, tag string"
    )
    snapshot_merge(spark, t, delta, keys=["k"], partition_col="p")
    got = snapshot_read(spark, t)
    assert "tag" in got.columns
    assert got.count() == 30
    assert got.filter(F.col("k") == 0).collect()[0]["tag"] == "new"
    # rows from the carried partitions 1/2 AND the rewritten survivors
    # of partition 0 read NULL for the evolved column
    assert got.filter(F.col("tag").isNull()).count() == 29
    assert "tag" not in snapshot_read(spark, t, version=1).columns


def test_snapshot_history_and_compact(spark, tmp_path):
    t = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, i, i % 2) for i in range(100)], "k bigint, v bigint, p int"
    )
    snapshot_write(spark, t, base, partition_col="p")
    snapshot_merge(
        spark, t,
        spark.createDataFrame([(0, -1, 0)], "k bigint, v bigint, p int"),
        keys=["k"], partition_col="p",
    )
    from airflow_etl_pyspark_inmet_spark.plans.snapshot import (
        snapshot_compact,
        snapshot_history,
    )

    hist = {r.version: r.n_files for r in snapshot_history(spark, t).collect()}
    assert set(hist) == {1, 2}
    before = _rows(snapshot_read(spark, t))
    v3 = snapshot_compact(spark, t, target_files=1)
    hist3 = {
        r.version: r.n_files for r in snapshot_history(spark, t).collect()
    }
    # content-identical, fewer (or equal) files, old versions intact
    assert _rows(snapshot_read(spark, t, version=v3)) == before
    assert hist3[3] <= hist3[2]
    assert _rows(snapshot_read(spark, t, version=2)) == before


def test_snapshot_concurrent_merges_serialize(spark, tmp_path):
    """Two REAL racing writers (threads) with commuting deltas: the CAS
    commit forces one to retry; the final table equals both deltas
    applied and exactly 3 versions exist — serializability, not
    lost-update."""
    import threading

    t = str(tmp_path / "tbl")
    snapshot_write(
        spark,
        t,
        spark.createDataFrame([(i, 0) for i in range(10)], "k bigint, v bigint"),
    )
    errs = []

    def do_merge(lo):
        try:
            delta = spark.createDataFrame(
                [(lo, 1), (lo + 1, 1)], "k bigint, v bigint"
            )
            snapshot_merge(spark, t, delta, keys=["k"], max_retries=5)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th = [threading.Thread(target=do_merge, args=(lo,)) for lo in (0, 5)]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs
    assert _list_manifest_versions(spark, t) == [1, 2, 3]
    got = dict(
        (r.k, r.v) for r in snapshot_read(spark, t).collect()
    )
    assert got == {i: (1 if i in (0, 1, 5, 6) else 0) for i in range(10)}


def test_snapshot_changes_cdf(spark, tmp_path):
    """CDF between versions: inserts/updates/deletes classified, silent
    rows (unchanged) absent."""
    from airflow_etl_pyspark_inmet_spark.plans.snapshot import (
        snapshot_changes,
    )

    t = str(tmp_path / "tbl")
    snapshot_write(
        spark,
        t,
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30)], "k bigint, v bigint"
        ),
    )
    delta = spark.createDataFrame(
        [(2, 99, False), (4, 40, False), (3, 0, True)],
        "k bigint, v bigint, is_del boolean",
    )
    snapshot_merge(spark, t, delta, keys=["k"], delete_col="is_del")
    got = {
        r.k: (r.v, r._change)
        for r in snapshot_changes(spark, t, 1, 2, keys=["k"]).collect()
    }
    assert got == {2: (99, "update"), 4: (40, "insert"), 3: (30, "delete")}


def test_stream_merge_to_snapshot_equals_batch_apply(spark, tmp_path):
    """Streaming upsert (foreachBatch + snapshot_merge, one file per
    micro-batch) lands the same final table as applying the compacted
    CDC feed in one batch — split-invariance through the TRANSACTIONAL
    sink, with one committed version per epoch."""
    from airflow_etl_pyspark_inmet_spark.plans.snapshot import (
        stream_merge_to_snapshot,
    )

    t = str(tmp_path / "tbl")
    src = str(tmp_path / "cdc")
    ckpt = str(tmp_path / "ckpt")
    snapshot_write(
        spark,
        t,
        spark.createDataFrame(
            [(i, 0) for i in range(8)], "k bigint, v bigint"
        ),
    )
    # 3 delta files in one source dir = 3 micro-batches
    # (maxFilesPerTrigger=1), touching disjoint keys per file
    import glob as g
    import os
    import shutil

    deltas = [
        [(0, 1, False), (1, 1, False)],
        [(2, 2, False), (8, 8, False)],
        [(3, 0, True)],
    ]
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(deltas):
        tmp = str(tmp_path / f"one{i}")
        spark.createDataFrame(
            rows, "k bigint, v bigint, is_del boolean"
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in g.glob(f"{tmp}/part-*.parquet"):
            shutil.copy(f, f"{src}/delta{i}.parquet")
    n = stream_merge_to_snapshot(
        spark, src, t, keys=["k"], checkpoint_dir=ckpt,
        schema_ddl="k bigint, v bigint, is_del boolean",
        delete_col="is_del",
    )
    assert n == 3
    got = {(r.k, r.v) for r in snapshot_read(spark, t).collect()}
    expect = {(0, 1), (1, 1), (2, 2), (4, 0), (5, 0), (6, 0), (7, 0), (8, 8)}
    assert got == expect
    # one committed version per applied epoch (1 initial + 3 merges)
    assert _list_manifest_versions(spark, t) == [1, 2, 3, 4]


def test_snapshot_changes_across_schema_evolution(spark, tmp_path):
    """CDF where to_version has a column from_version lacks: updates
    carry the new column's value, deletes classify normally."""
    from airflow_etl_pyspark_inmet_spark.plans.snapshot import (
        snapshot_changes,
    )

    t = str(tmp_path / "tbl")
    snapshot_write(
        spark, t, spark.createDataFrame([(1, 10), (2, 20)], "k bigint, v bigint")
    )
    delta = spark.createDataFrame(
        [(1, 11, "x", False), (3, 30, "y", False)],
        "k bigint, v bigint, tag string, d boolean",
    )
    snapshot_merge(spark, t, delta, keys=["k"], delete_col="d")
    got = {
        r.k: (r.v, r.tag, r._change)
        for r in snapshot_changes(spark, t, 1, 2, keys=["k"]).collect()
    }
    # k=2 is unchanged except the evolved column went from absent to
    # NULL — shared-column compare says silent; k=1 updated, k=3 inserted
    assert got == {1: (11, "x", "update"), 3: (30, "y", "insert")}


def test_inmet_pipeline_is_deterministic_via_snapshot_cdf(spark, inmet_glob):
    """Versioned warehouse loads prove pipeline determinism: running
    the full reference pipeline twice and landing `cidade_kpis_mensal`
    as two snapshot versions yields an EMPTY change feed — the
    reproducibility contract a production warehouse wants from its
    loader, verified through the transactional sink."""
    import tempfile

    from airflow_etl_pyspark_inmet_spark.plans.inmet_pipeline import (
        run_pipeline,
    )
    from airflow_etl_pyspark_inmet_spark.plans.snapshot import (
        snapshot_changes,
        snapshot_write,
    )

    t = tempfile.mkdtemp(prefix="inmetsnap") + "/kpis"
    for _ in range(2):
        tables = run_pipeline(spark, inmet_glob)
        snapshot_write(spark, t, tables["cidade_kpis_mensal"])
    changes = snapshot_changes(
        spark, t, 1, 2, keys=["cidade_sk", "ano", "mes"]
    )
    assert changes.count() == 0
