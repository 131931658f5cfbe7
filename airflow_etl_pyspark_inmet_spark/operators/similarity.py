"""Similarity search over embedding columns (``array<float>``).

Two tiers:

- :func:`cosine_topk` — brute-force exact top-k: broadcast the (small)
  query set, score every (query, item) pair with a JVM-side
  ``aggregate(zip_with(...))`` dot product, window top-k. Exact baseline;
  linear scan of the corpus per query — right up to ~10^7 items per
  executor-second, and the scoring is pure codegen (no Python).
- :func:`lsh_cosine_topk` — random-hyperplane (sign) LSH: deterministic
  seeded hyperplanes, bucket on the sign pattern of ``n_planes``
  projections, re-rank exactly within matching buckets (multi-probe with
  the query's own bucket). The 100 TB path: candidates shrink by
  ~2^-planes per probe and the corpus is scanned once to bucket it.

Scores are computed in double; ranking output (ids + rank) is
deterministic as long as no two scores tie exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    ``queries`` (query_id, vector) is broadcast: the plan is a single
    BroadcastNestedLoopJoin over the corpus — no shuffle of the corpus,
    one window top-k on (query, score).
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = items.select(
        F.col(id_col).alias("item_id"), F.col(vec_col).alias("_ivec")
    ).crossJoin(F.broadcast(q))
    scored = scored.filter(F.col("item_id") != F.col(query_id_col)).select(
        query_id_col,
        "item_id",
        cosine_similarity(F.col("_ivec"), F.col("_qvec")).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col("item_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "item_id", "rank")
    )


def _hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random unit-ish hyperplanes (pure python LCG —
    reproducible across numpy versions, tiny: n_planes x dim floats
    shipped as a literal/broadcast)."""
    state = seed & 0x7FFFFFFF
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) & 0x7FFFFFFF
            row.append((state / 0x40000000) - 1.0)  # [-1, 1)
        planes.append(row)
    return planes


def lsh_cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: sign-LSH bucket join then exact re-rank.

    Bucket id = bit pattern of sign(v . h_i). Items and queries land in
    one bucket each; the candidate join is an equi-join on the bucket id
    (shuffle ~N rows of (bucket, id), never N x Q). Recall is tunable via
    ``n_planes`` (fewer planes -> bigger buckets -> higher recall).
    """
    planes = _hyperplanes(n_planes, dim)
    planes_lit = F.array(
        *[F.array(*[F.lit(x) for x in row]) for row in planes]
    )

    def bucket(vec: Column) -> Column:
        b = F.lit(0).cast("long")
        for i in range(n_planes):
            proj = _dot(vec, planes_lit.getItem(i))
            bit = F.when(proj >= 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            b = b.bitwiseXOR(F.shiftleft(bit, i))
        return b

    it = items.select(
        F.col(id_col).alias("item_id"),
        F.col(vec_col).alias("_ivec"),
        bucket(F.col(vec_col)).alias("_bucket"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        bucket(F.col(vec_col)).alias("_bucket"),
    )
    cand = it.join(F.broadcast(q), "_bucket").filter(
        F.col("item_id") != F.col(query_id_col)
    )
    scored = cand.select(
        query_id_col,
        "item_id",
        cosine_similarity(F.col("_ivec"), F.col("_qvec")).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col("item_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "item_id", "rank", "score")
    )
