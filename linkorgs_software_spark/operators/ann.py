"""Similarity search over an embedding column (``array<float>``).

* ``brute_force_topk`` — exact cosine top-k per query: broadcast the (small)
  query set against the corpus, score natively (zip_with/aggregate), keep k
  by window rank. This is the correctness baseline.
* ``lsh_buckets`` / ``lsh_topk`` — the scale path: random-hyperplane sign
  buckets (seeded, hyperplanes generated driver-side with numpy and embedded
  as literal arrays → pure Catalyst dot products), candidates share a
  bucket, exact re-score inside buckets. Probe multiple independent tables
  (``num_tables``) to trade recall for fan-out, the standard LSH knob.

At 100 TB the corpus side is bucketed/partitioned by (table, bucket): the
bucket join is then shuffle-free on the corpus side and the per-bucket
top-k is a map-side window.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.embedding import cosine_sim_expr


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine_sim, rank)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .withColumn("cosine_sim", cosine_sim_expr("_cv", "_qv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine_sim", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype(np.float64)


def _sign_bucket_expr(vec_col: str, planes: np.ndarray) -> F.Column:
    """Sign-bit bucket id from literal hyperplanes — pure Catalyst."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(w)) for w in plane])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit_plane, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0))
    return bucket


def lsh_buckets(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    num_tables: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Attach (table_id, bucket) rows — one output row per hash table."""
    tables = []
    for t in range(num_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        tables.append(
            F.struct(
                F.lit(t).alias("table_id"),
                _sign_bucket_expr(vec_col, planes).alias("bucket"),
            )
        )
    return df.withColumn("_tb", F.explode(F.array(*tables))).select(
        "*", F.col("_tb.table_id").alias("table_id"), F.col("_tb.bucket").alias("bucket")
    ).drop("_tb")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    n_planes: int = 8,
    num_tables: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: bucket-join candidates, exact re-score, window k."""
    kw = dict(vec_col=vec_col, dim=dim, n_planes=n_planes, num_tables=num_tables, seed=seed)
    cb = lsh_buckets(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv")),
        **{**kw, "vec_col": "_cv"},
    )
    qb = lsh_buckets(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")),
        **{**kw, "vec_col": "_qv"},
    )
    cand = (
        cb.join(qb, ["table_id", "bucket"])
        .select("query_id", "vec_id", "_cv", "_qv")
        .dropDuplicates(["query_id", "vec_id"])
        .withColumn("cosine_sim", cosine_sim_expr("_cv", "_qv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine_sim", "rank")
    )
