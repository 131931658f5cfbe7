#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}.

Each query is forced through the noop sink (full materialization, no
driver collect) after a warm-up of the session. Timings are wall-clock
MEDIAN OF 5 runs per query: single-run timings on this shared host swing
2-5x with neighbor load (measured: the same unchanged map-only query at
0.6 s and 3.0 s minutes apart), which would swamp round-over-round
deltas. The median rejects those spikes while staying honest about
steady-state cost.

Host-noise guard: a sustained neighbor-load burst can inflate even a
median-of-5 (round 5 recorded a 43% total regression with zero code
changes on the headline path). So any query whose median lands above
1.3x its best previously-recorded value (min across BENCH_r*.json in the
repo root) is automatically re-probed — a second median-of-5 later in
the wall-clock window — and the MEDIAN OF ALL 10 runs is recorded (not
the min of the two medians, which would one-sidedly bias recorded
timings downward and let one lucky probe mask a real regression: a
genuine slowdown keeps the combined median high because both probes
reproduce it, while a one-probe load burst is outvoted by the quiet
probe's runs). Both probes and all raw runs are carried in the output
JSON ("runs", "reprobed"), so the artifact is auditable.

Output: the full result object (with run arrays) prints first; the LAST
stdout line is a compact summary (metric/value/unit/queries/sf only) so
a bounded stdout-tail capture always contains one complete JSON object.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the reference-parity star aggregates + the heavy
# LLM-pipeline operators. Names match plans.registry keys.
HEADLINE = [
    "q01_pricing_summary",
    "q02_daily_supplier_agg",
    "q03_monthly_kpis",
    "q12_topk_per_group",
    "q13_running_window",
    "q16_distinct_agg",
    "q18_sessionize",
    "q21_three_way_join",
    "q24_asof_join",
    "q25_range_join",
    "q27_lag_lead",
    "q33_correlated_subquery",
    "q35_regression_per_group",
    "d1_dedup_exact",
    "d2_dedup_jaccard",
    "d3_dedup_minhash",
    "d4_dedup_simhash",
    "t1_token_stats",
    "t4_fingerprint",
    "t5_chunk_docs",
    "t8_tfidf_top_terms",
    "t9_decontaminate",
    "t10_repetition_stats",
    "s1_cosine_topk",
    "s2_lsh_topk",
    "s3_ivf_topk",
    "d5_dedup_clusters",
    "d6_dedup_embedding",
    "m1_decode_meta",
]

def _best_prior() -> dict[str, float]:
    """Best (min) recorded per-query seconds across all prior BENCH_r*.json
    in the repo root — the reprobe trigger baseline. Min-across-rounds is
    deliberate: round medians themselves get inflated by load bursts, and
    the best-known value is the honest 'this code can run this fast' bar."""
    best: dict[str, float] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        queries = (doc.get("parsed") or {}).get("queries") or doc.get("queries") or {}
        for name, sec in queries.items():
            if isinstance(sec, (int, float)) and sec > 0:
                best[name] = min(best.get(name, float("inf")), float(sec))
    return best


def main() -> None:
    from airflow_etl_pyspark_inmet_spark.plans.registry import QUERIES
    from airflow_etl_pyspark_inmet_spark.session import get_spark

    spark = get_spark(app_name="bench")
    # warm-up: JVM + codegen + parquet footer caches
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    # warm-up 2: the Arrow python-worker pool (VERDICT r15 item 2). A
    # cold session's FIRST Arrow stage pays worker spin-up on every
    # core (~5-8 s recorded as that run's time — the dominant source
    # of max/min spread in --ab cold runs: s1 8.8 s max vs 1.3 s
    # median on identical code). One trivial pandas-UDF pass over one
    # partition per core spawns the pool once; every timed query then
    # reuses it (spark.python.worker.reuse is on by default).
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s * 1.0, "double")
    spark.range(
        256, numPartitions=spark.sparkContext.defaultParallelism
    ).select(_warm(F.col("id").cast("double"))).write.mode(
        "overwrite"
    ).format("noop").save()

    def run_once(name: str) -> float:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()
        return time.time() - t0

    if len(sys.argv) > 1 and sys.argv[1] == "--scale-check":
        # Standing scale-regression gate (VERDICT r9 item 3): run a
        # representative query subset at sf0.1 AND at a K-x replica
        # (scripts/gen_scale.py; default /tmp/sf1, generated on demand)
        # and flag any query whose wall-clock grows more than 3x
        # data-linear. The subset covers each plan family's PRODUCTION
        # path — for the embedding near-dup family that is the
        # corpus-scaled LSH tier (op:embedding_lsh_pairs), not the
        # label-blocked ground-truth harness d6, whose quadratic
        # per-block shape is documented and expected (BENCH_sf1_r9).
        big_dir = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/sf1")
        if not os.path.exists(f"{big_dir}/lineitem.parquet"):
            from scripts.gen_scale import generate

            print(f"# generating {big_dir} (10x sf0.1)", file=sys.stderr)
            generate(big_dir, 10, "/root/testdata/sf0.1")

        def _op_embedding_lsh(spark_, sf_dir_):
            from airflow_etl_pyspark_inmet_spark.operators.dedup import (
                embedding_lsh_pairs,
            )

            emb = spark_.read.parquet(f"{sf_dir_}/embeddings.parquet")
            return embedding_lsh_pairs(emb, threshold=0.35, dim=64)

        def _op_minhash_lsh(spark_, sf_dir_):
            from airflow_etl_pyspark_inmet_spark.operators.dedup import (
                minhash_lsh_pairs,
            )

            docs = spark_.read.parquet(f"{sf_dir_}/documents.parquet")
            return minhash_lsh_pairs(docs, threshold=0.5)

        def _op_semdedup_sqrtn(spark_, sf_dir_):
            # the production SemDeDup configuration: k scales with the
            # corpus (paper contract), so the gate measures the curve a
            # 100 TB deployment actually rides — fixed-k d27 is the
            # oracle-pinned parity query, not the scale config
            import math

            from airflow_etl_pyspark_inmet_spark.operators.dedup import (
                semdedup,
            )

            emb = spark_.read.parquet(f"{sf_dir_}/embeddings.parquet")
            k = max(8, math.isqrt(emb.count()))
            return semdedup(
                emb, k=k, n_rounds=3, tau=0.35, scale=1000,
                assigner="arrow",
            )

        def _op_knn_join(spark_, sf_dir_):
            # the PRODUCTION kNN-join path (occupancy-derived cells,
            # per-cell matmul kernel). The registered s18 query wraps
            # it in ann_with_corpus_recall_check, whose exact tier is
            # the |L| x |R| brute force — a ground-truth harness,
            # quadratic BY DEFINITION (the d6 precedent), so the gate
            # measures the operator, not the harness.
            from pyspark.sql import functions as F_

            from airflow_etl_pyspark_inmet_spark.operators.similarity import (
                knn_join,
            )

            emb = spark_.read.parquet(f"{sf_dir_}/embeddings.parquet")
            left = emb.filter(F_.col("vec_id") % 2 == 0)
            right = emb.filter(F_.col("vec_id") % 2 == 1)
            return knn_join(left, right, k=3, n_probe=8)

        _graph_cache: dict[str, object] = {}

        def _op_graph_ann(spark_, sf_dir_):
            # the SERVING path (the s16 beam walk) isolated from the
            # s12 index build: the graph is built once per sf_dir and
            # eagerly checkpointed on first use, so run 1 pays the
            # build and the median-of-3 reads the clean serving runs
            # (the s12 build itself is a separate standing gate entry).
            # Fixed dials (entries=16, hops=3, beam=16 — the s16
            # config); the recall-vs-scale trade these dials ride is
            # measured in SCALING.md's r14 graph-ANN note.
            from pyspark.sql import functions as F_

            from airflow_etl_pyspark_inmet_spark.operators.similarity import (
                graph_ann_topk,
                nn_descent_knn_graph,
            )

            emb = spark_.read.parquet(f"{sf_dir_}/embeddings.parquet")
            g = _graph_cache.get(sf_dir_)
            if g is None:
                g = nn_descent_knn_graph(
                    emb, k=8, n_rounds=3, scale=1000
                ).localCheckpoint(eager=True)
                _graph_cache[sf_dir_] = g
            queries = emb.filter(F_.col("vec_id") < 5).select(
                F_.col("vec_id").alias("query_id"), "embedding"
            )
            return graph_ann_topk(
                emb, queries, g, k=10, beam=16, n_hops=3
            )

        _bloom_cache: dict[str, tuple] = {}

        def _op_bloom_dedup(spark_, sf_dir_):
            # the SERVE tier of d30 (VERDICT r14 item 6): the Bloom
            # position set and the corpus keeper table are INDEX
            # ARTIFACTS — built once per sf_dir and eagerly
            # checkpointed on first use so the median-of-3 reads the
            # clean serve runs. Gated cost = the ingest batch scan +
            # the broadcast membership probe + the sparse verification
            # join; the corpus is never re-scanned (the prebuilt-
            # artifact path, the r13 build-vs-serve gating lesson).
            from pyspark.sql import functions as F_

            from airflow_etl_pyspark_inmet_spark.operators.dedup import (
                bloom_gated_dedup,
                bloom_position_set,
            )

            docs = spark_.read.parquet(f"{sf_dir_}/documents.parquet")
            art = _bloom_cache.get(sf_dir_)
            if art is None:
                n = docs.count()
                m = max(64, 8 * n)  # occupancy-derived (the d30 contract)
                bloom = bloom_position_set(
                    docs, "text", m=m, k=3
                ).localCheckpoint(eager=True)
                keepers = (
                    docs.select(
                        F_.md5(F_.col("text").cast("binary")).alias("_ch"),
                        F_.col("doc_id").alias("_cid"),
                    )
                    .groupBy("_ch")
                    .agg(F_.min("_cid").alias("_keeper"))
                    .localCheckpoint(eager=True)
                )
                art = (bloom, keepers, m)
                _bloom_cache[sf_dir_] = art
            bloom, keepers, m = art
            batch = docs.filter(F_.col("doc_id") % 10 == 0)
            return bloom_gated_dedup(
                docs, batch, bloom=bloom, keepers=keepers, m=m, k=3
            )

        def _op_silhouette_sqrtn(spark_, sf_dir_):
            # the production silhouette config: k rides sqrt(N) with
            # the arrow two-distance assigner (fixed-k s13 is the
            # oracle-pinned parity query, same as d27 vs semdedup_sqrtn)
            import math

            from airflow_etl_pyspark_inmet_spark.operators.similarity import (
                kmeans_silhouette,
            )

            emb = spark_.read.parquet(f"{sf_dir_}/embeddings.parquet")
            k = max(8, math.isqrt(emb.count()))
            return kmeans_silhouette(
                emb, k=k, n_rounds=3, scale=1000, assigner="arrow"
            )

        subset = [
            "q01_pricing_summary",
            "q02_daily_supplier_agg",
            "q12_topk_per_group",
            "q27_lag_lead",
            "d1_dedup_exact",
            "d3_dedup_minhash",
            "d4_dedup_simhash",
            "d5_dedup_clusters",
            "s3_ivf_topk",
            "t8_tfidf_top_terms",
            # r11 additions: the corpus-wide token shuffles (vocab
            # first-occurrence; census + head coverage)
            "t33_vocab_growth",
            "t34_zipf_coverage",
            # r12 additions: the scale-aware SemDeDup production path
            # and the blocked Gram flag kernel (the c10 embedding tier)
            "op:semdedup_sqrtn",
            "d28_blocked_neardup_flags",
            "s12_nn_descent",
            "op:embedding_lsh_pairs",
            "op:minhash_lsh_pairs",
            # r12 late additions: winnowing pair join, the extra
            # assignment pass silhouette costs (scale-aware k), the
            # manifest agg
            "d29_winnow_pairs",
            "op:silhouette_sqrtn",
            "q113_partition_manifest",
            # the Gram-histogram sweep — flagged once (43.7x as a pair
            # enumeration), fixed to 3.55x; keep it gated
            "c12_lsh_threshold_sweep",
            # r13 addition: the kNN join's symmetric cell-blocked
            # equi-join is the family's only no-broadcast shuffle shape
            # (the op, not the s18 harness — see _op_knn_join)
            "op:knn_join",
            # r14 additions: the graph-ANN SERVING walk (corpus never
            # scanned at query time — the property the gate pins) and
            # the heaviest multimodal decode (the classic
            # executor-memory scale trap; Arrow-batched PNG decode)
            "op:graph_ann",
            "m1_decode_meta",
            # r15 additions: the mixing/ordering family had NEVER been
            # scale-measured (r14 verdict item 2) — x8 and x1 are its
            # two heaviest members, now riding grouped_rank's
            # range-partitioned plan; op:bloom_dedup pins d30's serve
            # tier on prebuilt index artifacts (verdict item 6)
            "x8_epoch_reshuffle",
            "x1_mixture_sample",
            "op:bloom_dedup",
            # r17 addition (VERDICT r16 item 4): corpus-level exact
            # substring dedup — the positional-gram join is the
            # d-family's only corpus-wide (pos, hash) shuffle shape
            "d31_substring_dedup",
            # the incremental (delta-vs-base) mode: the base's distinct
            # gram index must stay data-linear, not candidate-quadratic
            "d33_delta_substring_dedup",
            # r17 addition (VERDICT r16 item 6): mechanical recall
            # gate — not a timing ratio. The routed graph-ANN serving
            # walk must hold held-out recall@10 >= 0.9 on the
            # planted-cluster tier (/tmp/sfc10, generated on demand);
            # r15/r16 measured 1.00 at 20k and 0.92 at 200k, so a
            # drop below the floor is an index/routing regression,
            # not noise (the build is integer-deterministic).
            "op:ann_recall",
        ]
        ops = {
            "op:embedding_lsh_pairs": _op_embedding_lsh,
            "op:minhash_lsh_pairs": _op_minhash_lsh,
            "op:semdedup_sqrtn": _op_semdedup_sqrtn,
            "op:silhouette_sqrtn": _op_silhouette_sqrtn,
            "op:knn_join": _op_knn_join,
            "op:graph_ann": _op_graph_ann,
            "op:bloom_dedup": _op_bloom_dedup,
        }
        env_subset = os.environ.get("SPARK_GRAFT_SCALE_SUBSET")
        if env_subset:
            subset = [s.strip() for s in env_subset.split(",") if s.strip()]
        n_sc = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

        def run_at(name: str, sf_dir: str) -> float:
            fn = ops.get(name) or QUERIES[name]
            runs = []
            for _ in range(n_sc):
                t0 = time.time()
                fn(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                runs.append(time.time() - t0)
            return sorted(runs)[len(runs) // 2]

        import duckdb as _dk

        n_small = _dk.sql(
            "SELECT count(*) FROM "
            f"'/root/testdata/sf0.1/lineitem.parquet'"
        ).fetchone()[0]
        n_big = _dk.sql(
            f"SELECT count(*) FROM '{big_dir}/lineitem.parquet'"
        ).fetchone()[0]
        factor = n_big / n_small
        out = {}
        flags = []
        def _ann_recall_gate() -> dict:
            # held-out routed walk vs exact top-10 on planted clusters
            # (reuses the SCALING.md measurement harness so the gate
            # and the ad-hoc runs can never disagree on method)
            clus_dir = os.environ.get(
                "SPARK_GRAFT_CLUSTER_DIR", "/tmp/sfc10"
            )
            if not os.path.exists(f"{clus_dir}/embeddings.parquet"):
                from scripts.gen_scale import generate

                print(
                    f"# generating {clus_dir} (10x mutated+clustered)",
                    file=sys.stderr,
                )
                generate(
                    clus_dir, 10, "/root/testdata/sf0.1",
                    mutate=True, clusters=True,
                )
            from scripts.measure_graph_ann_recall import measure

            res = measure(spark, clus_dir, routed=True, heldout=True)
            floor = 0.9
            routed = res["routed_recall_at_10"]
            return {
                "routed_recall_at_10": routed,
                "flat_recall_at_10": res["recall_at_10"],
                "floor": floor,
                "n_vectors": res["n_vectors"],
                "flag": routed < floor,
            }

        spark.read.parquet(f"{big_dir}/lineitem.parquet").count()  # warm
        for name in subset:
            if name == "op:ann_recall":
                res = _ann_recall_gate()
                out[name] = res
                if res["flag"]:
                    flags.append(name)
                print(
                    f"# scale-check {name}: routed recall@10 "
                    f"{res['routed_recall_at_10']:.2f} (flat "
                    f"{res['flat_recall_at_10']:.2f}, floor "
                    f"{res['floor']:.2f}, n={res['n_vectors']})"
                    + (" FLAG" if res["flag"] else ""),
                    file=sys.stderr,
                )
                continue
            small = run_at(name, "/root/testdata/sf0.1")
            big = run_at(name, big_dir)
            ratio = big / small if small > 0 else float("inf")
            flag = ratio > 3 * factor
            out[name] = {
                "small_sec": round(small, 3),
                "big_sec": round(big, 3),
                "ratio": round(ratio, 2),
                "flag": flag,
            }
            if flag:
                flags.append(name)
            print(
                f"# scale-check {name}: {small:.2f}s -> {big:.2f}s "
                f"(x{ratio:.1f}, bar x{3 * factor:.0f})"
                + (" FLAG" if flag else ""),
                file=sys.stderr,
            )
        print(
            json.dumps(
                {
                    "metric": "scale_check",
                    "data_factor": round(factor, 2),
                    "flag_bar": round(3 * factor, 2),
                    "queries": out,
                    "flags": flags,
                    "big_dir": big_dir,
                }
            )
        )
        return

    if len(sys.argv) > 1 and sys.argv[1] == "--ab":
        # Isolated measurement for A/B claims: median of 5 per named
        # query, raw runs included so the artifact is auditable (this
        # host's neighbor load swings single runs 2-5x). Paste the JSON
        # line into BASELINE.md next to the claim it backs.
        # Each query's FIRST run in a fresh session pays one-time JVM
        # codegen/analysis of that query's plan (~3 s measured on s2 —
        # per-plan, so the session-level Arrow/parquet warm-up above
        # cannot prepay it). That run is reported separately as "cold"
        # and excluded from the median: an A/B claim compares
        # steady-state plans, and folding a constant session artifact
        # into a 5-run median would let it masquerade as plan cost
        # (VERDICT r15 item 2 — it was the dominant max/min spread).
        names = sys.argv[2:]
        unknown = [n for n in names if n not in QUERIES]
        if unknown or not names:
            sys.exit(f"--ab: unknown or missing query names {unknown}")
        result = {}
        for name in names:
            cold = run_once(name)
            runs = sorted(run_once(name) for _ in range(5))
            result[name] = {
                "cold": round(cold, 3),
                "runs": [round(r, 3) for r in runs],
                "median": round(runs[len(runs) // 2], 3),
            }
        print(json.dumps({"mode": "ab", "sf_dir": SF_DIR, "queries": result}))
        return

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

    def median5(name: str) -> tuple[float, list[float]]:
        runs = sorted(run_once(name) for _ in range(n_runs))
        return runs[len(runs) // 2], [round(r, 3) for r in runs]

    # Reprobe only against priors measured at the SAME sf dir: the
    # BENCH_r*.json records are sf0.1, so a scale-up run (e.g. the
    # SCALING.md sf1 datapoint) must not reprobe every query 10x.
    prior = _best_prior() if SF_DIR == "/root/testdata/sf0.1" else {}
    timings: dict[str, float] = {}
    runs_log: dict[str, list[float]] = {}
    reprobed: dict[str, dict] = {}
    for name in HEADLINE:
        med, runs = median5(name)
        best = prior.get(name)
        if best is not None and med > 1.3 * best:
            # Suspect a neighbor-load burst: re-probe later in the window
            # and record the median of ALL 10 runs — symmetric, so one
            # lucky quiet probe can't discard a genuine regression (it
            # reproduces in both probes and keeps the combined median
            # high). Both probes stay in the record.
            med2, runs2 = median5(name)
            combined = sorted(runs + runs2)
            med_all = (combined[4] + combined[5]) / 2
            reprobed[name] = {
                "prior_best": best,
                "first": {"median": round(med, 3), "runs": runs},
                "second": {"median": round(med2, 3), "runs": runs2},
                "recorded": round(med_all, 3),
            }
            med, runs = med_all, combined
        timings[name] = round(med, 3)
        runs_log[name] = runs
        flag = " [reprobed]" if name in reprobed else ""
        print(f"# {name}: {timings[name]}s (median of {runs}){flag}",
              file=sys.stderr)

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    summary = {
        "metric": "headline_queries_total_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps({**summary, "runs": runs_log, "reprobed": reprobed}))
    # LAST line is compact and complete: a bounded stdout-tail capture
    # (which truncated the front of the long full line in round 6 and
    # left the driver's "parsed" field null) always gets one whole
    # parseable JSON object.
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
