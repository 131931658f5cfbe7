#!/usr/bin/env python
"""Graph-ANN serving recall vs corpus scale (VERDICT r13 item 3).

The s16 walk has FIXED dials — n_entries spread entry points, n_hops
expansions, beam width — so the reachable fraction of the corpus shrinks
as the corpus grows; this measures recall@10 of the production walk
(operators.similarity.graph_ann_topk over the s12 NN-Descent graph)
against the exact brute-force top-10 at 1x (sf0.1) and 10x, on BOTH the
unmutated replica (/tmp/sf1 — clone-dense, recall biased UP because the
query's own exact copies are mutual graph neighbors) and the mutated
content-distinct tier (the honest number, gen_scale --mutate).

Prints one JSON line per (sf_dir, dial setting); paste into SCALING.md.

``--routed`` (VERDICT r14 item 4): additionally measure the SPANN-style
centroid-routed walk (graph_ann_routed_topk) on the same graph and
queries, emitting flat and routed recall side by side — the comparison
is meaningful only on data WITH cluster structure (gen_scale.py
--clusters); on the isotropic testdata the two tie by construction
(SCALING.md r14).

Usage: python scripts/measure_graph_ann_recall.py [--routed] [sf_dir ...]
  default dirs: /root/testdata/sf0.1 /tmp/sf1 /tmp/sf1m
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def measure(
    spark,
    sf_dir: str,
    k: int = 10,
    beam: int = 16,
    n_hops: int = 3,
    n_entries: int = 16,
    routed: bool = False,
    heldout: bool = False,
    hops_list: list | None = None,
) -> dict:
    """Single-dial measurement (returns one dict). ``hops_list`` runs
    several n_hops settings against ONE graph build (the build is the
    dominant cost at >= 1M vectors) and returns a list of dicts."""
    from airflow_etl_pyspark_inmet_spark.operators.similarity import (
        cosine_topk,
        graph_ann_routed_topk,
        graph_ann_topk,
        nn_descent_knn_graph,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    if heldout:
        # give the query ids NO corpus twin: the walk's DiskANN-style
        # warm start (enter at the query's own node when present)
        # otherwise starts INSIDE the right neighborhood and masks the
        # entry-selection difference this script exists to measure
        queries = queries.select(
            (F.col("query_id") + 1_000_000_000).alias("query_id"),
            "embedding",
        )
    graph = nn_descent_knn_graph(
        emb, k=8, n_rounds=3, scale=1000
    ).localCheckpoint(eager=True)
    exact = cosine_topk(emb, queries, k)
    e = {(r["query_id"], r["item_id"]) for r in exact.collect()}

    def _recall(ann_df) -> tuple[float, dict]:
        a = {(r["query_id"], r["item_id"]) for r in ann_df.collect()}
        per_q = {}
        for qid in sorted({q for q, _ in e}):
            eq = {i for q, i in e if q == qid}
            aq = {i for q, i in a if q == qid}
            per_q[str(qid)] = round(len(eq & aq) / len(eq), 3)
        return round(len(a & e) / len(e), 4), per_q

    n_vec = emb.count()

    def one(hops: int) -> dict:
        flat_recall, flat_per_q = _recall(
            graph_ann_topk(
                emb, queries, graph, k=k, beam=beam, n_hops=hops,
                n_entries=n_entries,
            )
        )
        out = {
            "sf_dir": sf_dir,
            "n_vectors": n_vec,
            "dials": {
                "k": k, "beam": beam, "n_hops": hops,
                "n_entries": n_entries,
            },
            "recall_at_10": flat_recall,
            "per_query": flat_per_q,
        }
        if routed:
            routed_recall, routed_per_q = _recall(
                graph_ann_routed_topk(
                    emb, queries, graph, k=k, beam=beam, n_hops=hops
                )
            )
            out["routed_recall_at_10"] = routed_recall
            out["routed_per_query"] = routed_per_q
        return out

    if hops_list is not None:
        return [one(h) for h in hops_list]
    return one(n_hops)


def main() -> None:
    from airflow_etl_pyspark_inmet_spark.session import get_spark

    routed = "--routed" in sys.argv[1:]
    heldout = "--heldout" in sys.argv[1:]
    n_hops, n_entries = 3, 16
    dirs = []
    for a in sys.argv[1:]:
        if a in ("--routed", "--heldout"):
            continue
        elif a.startswith("--hops="):
            n_hops = [int(x) for x in a.split("=")[1].split(",")]
        elif a.startswith("--entries="):
            n_entries = int(a.split("=")[1])
        else:
            dirs.append(a)
    dirs = dirs or ["/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf1m"]
    spark = get_spark(app_name="graph_ann_recall")
    hops_list = n_hops if isinstance(n_hops, list) else [n_hops]
    for d in dirs:
        outs = measure(
            spark, d, n_entries=n_entries,
            routed=routed, heldout=heldout, hops_list=hops_list,
        )
        for out in outs:
            out["heldout"] = heldout
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
