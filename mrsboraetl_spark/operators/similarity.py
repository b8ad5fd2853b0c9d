"""Similarity search over embedding columns (array<float>).

Two paths:

* brute-force cosine top-k — the exactness baseline: broadcast the (small)
  query set, JVM-side dot products via zip_with/aggregate (no Python in the
  loop), window top-k.  O(n_queries * n_vectors) but embarrassingly
  parallel: at 100 TB the scan partitions by vector shard and the broadcast
  keeps the join shuffle-free.
* sign-bucket LSH — the scale path: bucket every vector by the sign bits of
  its leading dimensions (a coordinate-hyperplane SRP family), equi-join
  query buckets to vector buckets, rank within bucket.  Recall < 1 by
  design; bucket width trades recall for fan-out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v
        )
    )


def cosine(a: Column, b: Column) -> Column:
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(vec: Column, bits: int = 8) -> Column:
    """Coordinate-hyperplane LSH bucket: '1'/'0' per leading dim sign."""
    return F.array_join(
        F.transform(
            F.slice(vec, 1, bits),
            lambda v: F.when(v >= 0, "1").otherwise("0"),
        ),
        "",
    )


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbours per query (self-matches excluded).

    ``queries`` must have columns (query_id, query_vec); it is broadcast.
    """
    sim = F.round(cosine(F.col("query_vec"), F.col(vec_col)), 4)
    scored = (
        vectors.join(F.broadcast(queries))
        .filter(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor"),
            sim.alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor", "cosine", "rk")
    )


def cosine_pairs_above(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup detection).

    Brute force n^2/2 — correct baseline; LSH below is the scale path.
    """
    a = vectors.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")
    )
    b = vectors.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b")
    )
    sim = F.round(cosine(F.col("vec_a"), F.col("vec_b")), 4)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def lsh_bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's sign bucket.

    The bucket equi-join replaces the cross join — at scale the vector side
    is hash-partitioned by bucket, so each query probes one partition.
    """
    bucketed = vectors.withColumn("bucket", sign_bucket(F.col(vec_col), bits))
    qb = queries.withColumn("bucket", sign_bucket(F.col("query_vec"), bits))
    sim = F.round(cosine(F.col("query_vec"), F.col(vec_col)), 4)
    scored = (
        bucketed.join(F.broadcast(qb), "bucket")
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", F.col(id_col).alias("neighbor"), sim.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor", "cosine", "rk")
    )
