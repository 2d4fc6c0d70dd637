"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast of the (small) query set
against the corpus, all math in JVM expressions (zip_with + aggregate), no
Python in the loop. Cost is O(|queries| * |corpus|) per batch; correct at
any scale where the query set is small.

Scale path: LSH bucketing (random-hyperplane signs) so each query probes
only its bucket (and neighbors). The hyperplanes are pseudo-random but
deterministic (seeded), stored as a broadcast literal; the probe is a
bucket equi-join instead of a cross join — the 1000-executor shape.

All arithmetic is done in DOUBLE with a strict left-to-right fold so the
DuckDB oracle (positional UNNEST + SUM) computes bit-identical results.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: broadcast queries x corpus, partitioned
    top-k window. Returns (qid, nid, cosine) with qid != nid."""
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("qid") != F.col("nid"))
        .select("qid", "nid", cosine(F.col("qv"), F.col("nv")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), "nid")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "nid", "cos", "rn")
    )


def random_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (seeded Gaussian, rounded to
    3 decimals so SQL literals parse to bit-identical doubles in any
    engine)."""
    import random

    rng = random.Random(seed)
    return [
        [round(rng.gauss(0.0, 1.0), 3) for _ in range(dim)] for _ in range(n_planes)
    ]


def neardup_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (id_a < id_b) with
    cosine >= threshold. This is the exact O(n^2) baseline — correct at
    any SF and the oracle form; the 100 TB path runs hyperplane-LSH
    bucketing first (lsh_bucket_topk's bucket join) so each vector only
    scores against its bucket, then verifies with this exact predicate."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def hyperplane_signs(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: sign bits of dot products against fixed hyperplanes."""
    bucket = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec, plane) > 0, F.lit(1)).otherwise(F.lit(0)).cast("bigint")
        bucket = bucket + bit * F.lit(2**i).cast("bigint")
    return bucket


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed ANN: equi-join on hyperplane-sign bucket, then exact cosine
    top-k inside the bucket. Recall < 1 by construction; multi-probe (flip
    one bit) is the standard extension."""
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        hyperplane_signs(F.col(vec_col), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("nv"),
        hyperplane_signs(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, ["bucket"])
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", cosine(F.col("qv"), F.col("nv")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), "nid")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "nid", "cos", "rn")
    )
