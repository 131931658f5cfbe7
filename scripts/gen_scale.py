#!/usr/bin/env python
"""Deterministic scale-up generator: replicate the sf0.1 testdata K times
(default 10 -> "sf1") with consistent key offsets, for the standing
scale-regression gate (`bench.py --scale-check`, VERDICT r9 item 3).

Replication is the same recipe as the round-9 one-off sf1 datapoint
(BASELINE.md "Round 9"): copy i of each table shifts every key column by
i * stride(table), where stride = max_key - min_key + 1 of the SOURCE
table, so keys stay dense and every FK (lineitem->orders/part/supplier,
orders->customer, events.user_id->customer) lands on the matching copy.
nation/region are fixed dimensions and are NOT replicated. Documented
caveat (unchanged from r9): documents/embeddings texts and vectors are
cloned verbatim, so every doc gains K-1 exact clones — dedup-family
outputs are DENSER than a true sfK corpus; dedup ratios measured on this
data are upper bounds.

Pure DuckDB (no Spark session): one COPY ... TO parquet per table.
Usage: python scripts/gen_scale.py [out_dir] [factor] [src_dir]
  defaults: /tmp/sf1 10 /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

import duckdb

# key columns to offset, per table; stride source is the FIRST column's
# own table for PK columns, but FK columns use the referenced table's
# stride — expressed as (column, stride_table).
KEYS: dict[str, list[tuple[str, str]]] = {
    "region": [],
    "nation": [],
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "events": [("event_id", "events"), ("user_id", "customer")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}
# stride key column per table (the PK used to measure density)
PK = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def generate(out_dir: str, factor: int, src_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    strides = {
        t: con.sql(
            f"SELECT max({pk}) - min({pk}) + 1 "
            f"FROM '{src_dir}/{t}.parquet'"
        ).fetchone()[0]
        for t, pk in PK.items()
    }
    for table, keys in KEYS.items():
        src = f"{src_dir}/{table}.parquet"
        dst = f"{out_dir}/{table}.parquet"
        if not keys:  # fixed dims
            con.sql(f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
            continue
        cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        offsets = {col: strides[st] for col, st in keys}
        select = ", ".join(
            f"({c} + _copy * {offsets[c]})::BIGINT AS {c}" if c in offsets else c
            for c in cols
        )
        con.sql(
            f"COPY (SELECT {select} FROM '{src}' "
            f"CROSS JOIN (SELECT unnest(range({factor})) AS _copy) "
            f"ORDER BY _copy) TO '{dst}' (FORMAT PARQUET)"
        )
    con.close()


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    generate(out, k, src)
    n = duckdb.sql(f"SELECT count(*) FROM '{out}/lineitem.parquet'").fetchone()[0]
    print(f"generated {out} (factor {k}, lineitem rows {n})")
