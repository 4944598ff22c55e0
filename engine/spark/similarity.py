"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exact baseline: broadcast the (small)
  query set against the corpus, dot products as JVM-side higher-order
  functions (zip_with + aggregate), top-k via window row_number.
* LSH-bucketed ANN — the scale path: random-hyperplane sign buckets
  (hyperplanes derived deterministically from a portable md5-prefix
  hash, no RNG state), candidates restricted to same-bucket, so the
  join is equi not cross.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: queries (vec_id < n_queries) broadcast against
    the full corpus — one scan, no shuffle of the big side before the
    per-query window."""
    base = emb.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    )
    q = base.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv")
    )
    joined = base.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def _hyperplane(h: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane: component d ∈ [-0.5, 0.5)
    derived from a portable md5-prefix hash of "h:d" — reproducible
    across cluster sizes AND across engines (the DuckDB oracle computes
    the identical planes, so bucket assignments are value-verified)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{h}:"), d.cast("string"))), 1, 15
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(100000),
            )
            / 100000.0
            - 0.5
        ),
    )


def lsh_bucket_col(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Random-hyperplane signature: n_planes sign bits packed to a long."""
    bucket = F.lit(0).cast("long")
    for h in range(n_planes):
        bit = F.when(_dot(vec, _hyperplane(h, dim)) >= 0, 1).otherwise(0)
        bucket = bucket * 2 + bit
    return bucket


def lsh_ann_topk(
    emb: DataFrame,
    dim: int,
    n_queries: int = 10,
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the LSH bucket (equi-join on
    bucket), exact cosine re-rank within bucket.  At 100 TB the bucket
    key is also the natural repartition/bucketing key."""
    base = emb.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("bucket", lsh_bucket_col(F.col("v"), dim, n_planes))
    q = base.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    joined = base.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket"))
        & (F.col(id_col) != F.col("query_id")),
    )
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
