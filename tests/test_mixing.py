"""Unit tests for the corpus-mixing operators (operators/mixing.py).

Beyond-reference scope: the reference ETL
(/root/reference/pyspark-stack/spark-apps/script/job_parquet.py) has no
corpus curation; mixture resampling / domain caps / sharding are the
training-data-pipeline extension set mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_etl_pyspark_inmet_spark.operators.mixing import (
    domain_cap,
    mixture_sample,
    shard_assign,
)


def _corpus(spark, per_source=10, n_sources=3):
    rows = [
        (s * per_source + i, f"dom{s}")
        for s in range(n_sources)
        for i in range(per_source)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mixture_sample_hits_targets_exactly(spark):
    # dom0 upsampled 10->27 (epochs 2 + 7 extras), dom1 downsampled
    # 10->4, dom2 exactly 10 -> everyone gets 1 copy
    df = _corpus(spark)
    targets = {"dom0": 27, "dom1": 4, "dom2": 10}
    out = mixture_sample(df, targets, strat_col="source")
    sums = {
        r["source"]: r["total"]
        for r in out.groupBy("source")
        .agg(F.sum("n_copies").alias("total"))
        .collect()
    }
    assert sums == targets
    rows = out.collect()
    assert len(rows) == 30  # every input row emitted, even 0-copy ones
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r["n_copies"])
    assert sorted(by_source["dom0"]) == [2] * 3 + [3] * 7
    assert sorted(by_source["dom1"]) == [0] * 6 + [1] * 4
    assert by_source["dom2"] == [1] * 10


def test_mixture_sample_ignores_sources_without_target(spark):
    df = _corpus(spark, n_sources=2)
    out = mixture_sample(df, {"dom0": 5}, strat_col="source")
    assert out.select("source").distinct().collect()[0]["source"] == "dom0"


def test_mixture_sample_strict_raises_on_absent_stratum(spark):
    import pytest

    df = _corpus(spark, n_sources=2)
    with pytest.raises(ValueError, match="domX"):
        mixture_sample(df, {"dom0": 5, "domX": 3}, strat_col="source", strict=True)
    # strict passes when every target stratum exists
    out = mixture_sample(df, {"dom0": 5}, strat_col="source", strict=True)
    assert out.count() > 0


def test_mixture_sample_deterministic(spark):
    df = _corpus(spark)
    targets = {"dom0": 13, "dom1": 7, "dom2": 22}
    a = sorted(map(tuple, mixture_sample(df, targets).collect()))
    b = sorted(map(tuple, mixture_sample(df, targets).collect()))
    assert a == b


def test_domain_cap_keeps_at_most_cap_per_source(spark):
    df = _corpus(spark, per_source=10)
    out = domain_cap(df, cap=4)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"dom0": 4, "dom1": 4, "dom2": 4}
    # cap above stratum size keeps everything
    assert domain_cap(df, cap=99).count() == 30
    # survivors are rank-consistent: sel_rank is 1..cap per source
    ranks = sorted(
        r["sel_rank"] for r in out.filter(F.col("source") == "dom0").collect()
    )
    assert ranks == [1, 2, 3, 4]


def test_shard_assign_is_permutation(spark):
    df = _corpus(spark, per_source=20, n_sources=5)  # 100 docs
    out = shard_assign(df, n_shards=8).collect()
    assert len(out) == 100
    assert {r["doc_id"] for r in out} == set(range(100))
    by_shard = {}
    for r in out:
        assert 0 <= r["shard"] < 8
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    # pos is a dense 1..n_s sequence within every shard
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # reproducible across runs
    again = shard_assign(df, n_shards=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_temperature_weights_sqrt_damping(spark):
    import math

    from airflow_etl_pyspark_inmet_spark.operators.mixing import (
        temperature_weights,
    )

    # 100 / 25 / 1 docs: raw shares 79%/19%/0.8%; sqrt damping pulls the
    # head down (10/5/1 -> 62.5%/31.2%/6.2%)
    rows = (
        [(i, "big") for i in range(100)]
        + [(200 + i, "mid") for i in range(25)]
        + [(300, "tiny")]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {r["source"]: r for r in temperature_weights(df).collect()}

    sqrt_e6 = {s: math.floor(math.sqrt(n) * 1e6) for s, n in
               [("big", 100), ("mid", 25), ("tiny", 1)]}
    s_total = sum(sqrt_e6.values())
    for s, n in [("big", 100), ("mid", 25), ("tiny", 1)]:
        assert got[s]["n_docs"] == n
        assert got[s]["raw_share_e6"] == n * 1_000_000 // 126
        assert got[s]["temp_share_e6"] == sqrt_e6[s] * 1_000_000 // s_total
    # damping direction: head loses share, tail gains
    assert got["big"]["temp_share_e6"] < got["big"]["raw_share_e6"]
    assert got["tiny"]["temp_share_e6"] > got["tiny"]["raw_share_e6"]


def test_domain_cap_approx_threshold_semantics(spark):
    """The approximate cap keeps exactly the rows with
    priority * n < cap * 2^20 — deterministic; strata at-or-under the
    cap keep everything."""
    from airflow_etl_pyspark_inmet_spark.operators.mixing import (
        BUCKETS,
        KNUTH,
        domain_cap_approx,
    )

    df = _corpus(spark, per_source=50, n_sources=2)
    cap = 10
    out = domain_cap_approx(df, cap=cap)
    rows = out.collect()
    for r in rows:
        assert ((r["doc_id"] * KNUTH) % BUCKETS) * 50 < cap * BUCKETS
    # completeness: every qualifying row is present
    expected = sum(
        1
        for r in df.collect()
        if ((r["doc_id"] * KNUTH) % BUCKETS) * 50 < cap * BUCKETS
    )
    assert len(rows) == expected
    # a stratum smaller than the cap keeps everything
    small = _corpus(spark, per_source=5, n_sources=1)
    assert domain_cap_approx(small, cap=10).count() == 5
