"""Driver-contract smoke tests: entry() runs, every query key is callable,
every oracle key exists in queries()."""

from __future__ import annotations

import pytest

import __spark_entry__ as E


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert len(df.schema) > 0


def test_query_and_oracle_keys_consistent():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs)
    # every query is oracle-hashable (approx/sketch ops emit exact
    # companions + envelope booleans instead of engine-specific values)
    assert set(qs) == set(oracles)


@pytest.mark.parametrize(
    "name",
    [
        "q01_pricing_summary",
        "d1_dedup_exact",
        "s1_cosine_topk",
        "t18_intra_doc_dedup",
        "m6_resize_png",
        "q71_time_weighted_avg",
        # round-6 additions
        "m7_wav_stats",
        "m8_wav_frames",
        "m9_avi_stats",
        "m10_avi_frames",
        "m11_mixed_modality",
        "d10_incremental_dedup",
        "t20_bigram_condprob",
        "s4_label_centroids",
        "q73_tpch_q3",
        "q74_tpch_q17",
        "t21_token_lift",
        "m12_image_ahash",
        "q75_tpch_q18",
        "q76_table_diff",
        "d11_image_dup_groups",
        "q77_mad_outliers",
        "d12_image_neardup",
        "q78_cdc_apply",
        "q79_ratio_to_report",
        "q80_ohlc_bars",
        "q81_basket_pairs",
        "q82_running_balance_floor",
        "c3_dedup_funnel_lsh",
        "q72_sessionize_salted",
        # round-7 additions
        "c4_pretraining_pipeline",
        "t22_bpe_train",
        "m13_multimodal_pack",
    ],
)
def test_sample_queries_run_at_sf0001(spark, sf_small, name):
    df = E.queries()[name](spark, sf_small)
    assert df.count() >= 0
