"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


# AUDIT HOOKS (VERDICT r15 item 3, generalizing the r15 grouped_rank
# fix): the iterative operators (connected components, label
# propagation, pagerank, triangles, k-core, BFS/SSSP, NN-Descent) and
# grouped_rank/grouped_running_sum lineage-truncate with lazy
# ``localCheckpoint``s so plans don't grow by round — but a checkpoint
# renders the audited plan as a bare LogicalRDD, hiding every scan,
# filter, and window upstream of it from scripts/dump_plans.py's
# operator counts and LOWCARD/cartesian detectors.
#
# Two audit modes, production always checkpoints:
#
# - AUDIT_SEGMENTS (the default audit mode): when set to a list, every
#   checkpoint ALSO records its full-lineage input frame there, and
#   the audit inspects each recorded segment alongside the main plan —
#   every scan/exchange/window is visible in exactly one segment, and
#   because the checkpoints still happen, iterative queries build at
#   production speed. (r16 measured the alternative: disabling
#   checkpoints makes CC-embedding composites like d25/c10 recompute
#   ~3^rounds lineage per eager convergence probe — the audit ran for
#   15+ minutes before being killed.)
# - AUDIT_NO_CHECKPOINT: keep full lineage in the MAIN plan (single
#   frame, no segments). Only sound for non-iterative operators;
#   retained for targeted --full inspection of single checkpoints.
AUDIT_NO_CHECKPOINT = False
AUDIT_SEGMENTS: list | None = None


def lineage_checkpoint(df: DataFrame) -> DataFrame:
    if AUDIT_SEGMENTS is not None:
        AUDIT_SEGMENTS.append(df)
    return df if AUDIT_NO_CHECKPOINT else df.localCheckpoint(eager=False)


def ensure_parallelism(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Round-robin repartition ONLY when the scan produced fewer partitions
    than the cluster has cores — the small-file artifact where one 2 MB
    parquet file becomes one task and serializes a CPU-bound operator.

    At real scale (file count x row groups >> cores) this is a no-op, so
    the big-data path never pays an extra shuffle.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
