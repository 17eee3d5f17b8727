"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exact baseline; LSH (random-hyperplane)
bucketed variant as the scale path — both pure DataFrame ops. Dot
products use ``zip_with`` + ``aggregate`` with float64 accumulation
(JVM-side, codegen'd); no Python per row.

Scale notes
-----------
Brute force broadcasts the (small) query set: the corpus is scanned
once, never shuffled. The LSH variant hashes both sides into sign-bit
buckets from ``n_planes`` fixed random hyperplanes; only same-bucket
pairs are scored, trading recall for a shuffle bounded by bucket sizes.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. Queries broadcast; corpus scanned once.

    Output: query_id, vec_id, cos:double, rank:int (1-based).
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
        )
    )
    scored = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cv")
    ).crossJoin(q).withColumn("cos", cosine(F.col("__cv"), F.col("__qv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from fixed random hyperplanes (deterministic)."""
    bucket = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1)).otherwise(F.lit(0)).cast("bigint")
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's LSH bucket
    are scored. Output schema matches brute_force_topk."""
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__cv"),
        lsh_bucket(F.col(vec_col), planes).alias("__bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            lsh_bucket(F.col(vec_col), planes).alias("__bucket"),
        )
    )
    scored = c.join(q, "__bucket").withColumn(
        "cos", cosine(F.col("__cv"), F.col("__qv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
    min_cos: float = 0.95,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH bucketing + exact verify.

    Output: id_a, id_b (id_a < id_b), cos:double with cos ≥ min_cos.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    l, r = base.alias("l"), base.alias("r")
    return (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")),
        )
        .withColumn("cos", cosine(F.col("l.v"), F.col("r.v")))
        .filter(F.col("cos") >= min_cos)
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"), "cos")
    )
