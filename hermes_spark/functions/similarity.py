"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant (random hyperplanes, deterministic seed) is the scale path —
candidates only within matching hyperplane-sign buckets, the standard
trade of recall for a shuffle keyed on bucket id instead of a cross
join.  Dot products run JVM-side via zip_with/aggregate (no Python in
the hot loop); at real scale the query side is broadcast.
"""

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query among all vectors
    (self-matches excluded).  Queries are broadcast — the scan side
    streams once; ranking is a per-query window (k small)."""
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("q"),
    )
    scored = (
        v.join(F.broadcast(q), F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("cosine", _dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v"))))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cosine")
    )


def hyperplane_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    out: str = "bucket",
) -> DataFrame:
    """Sign-of-dot-product LSH bucket id (deterministic planes).

    Computed as one Arrow-vectorized pandas UDF doing a single numpy
    matmul per batch — unrolling n_planes × dim as Column expressions
    is correct but explodes codegen compile time."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    import pandas as pd
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def bucket_of(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())          # (batch, dim)
        bits = (m.astype(np.float64) @ planes) > 0
        return pd.Series(bits @ weights)

    return df.withColumn(out, bucket_of(F.col(vec_col)))


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's bucket.
    Recall < 1 by construction; multi-probe (flipping one bit) keeps it
    high while the join stays keyed on bucket — linear scale path."""
    v = hyperplane_buckets(vectors, dim, n_planes, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        "bucket",
    )
    q0 = hyperplane_buckets(queries, dim, n_planes, vec_col=vec_col)
    # multi-probe: own bucket + all 1-bit flips
    probes = F.array(
        F.col("bucket"),
        *[F.expr(f"bucket ^ {1 << p}").cast("long") for p in range(n_planes)],
    )
    q = q0.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("q"),
        F.explode(probes).alias("bucket"),
    )
    scored = (
        v.join(F.broadcast(q), ["bucket"])
        .where(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn(
            "cosine",
            _dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v"))),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.dropDuplicates([query_id_col, "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cosine")
    )
