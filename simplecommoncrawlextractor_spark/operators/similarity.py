"""Similarity search over the ``embeddings`` table (vec_id, embedding
array<float>, label).

- brute-force cosine top-k: the correctness baseline. The dot product is a
  JVM-side ``aggregate(zip_with(...))`` — no Python. The pair generation is
  a crossJoin, which is O(N²) BY DESIGN here: it's the oracle-checkable
  baseline, not the scale path.
- LSH-bucketed (sign-random-projection) top-k: the 100 TB path. Vectors
  hash to a bucket from the signs of H fixed pseudo-random projections
  (deterministic, derived from dimension index — no RNG state to ship);
  candidate pairs only form inside a bucket, turning O(N²) into
  O(Σ bucket²). Same plan works partitioned: bucket is the shuffle key.
- IVF-style variant: coarse k-means is overkill without an ML dep; the
  bucketed path plays that role.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_top1(emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine nearest neighbor (top-1, ids only — floats stay
    internal so the result is hash-stable across engines)."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") != F.col("id_b"))
    sim = pairs.withColumn(
        "cos", _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cos"), F.asc("id_b"))
    return (
        sim.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("id_a").alias("vec_id"), F.col("id_b").alias("nn_id"))
        .orderBy("vec_id")
    )


def cosine_topk(emb: DataFrame, k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k neighbors (ids + rank)."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") != F.col("id_b"))
    sim = pairs.withColumn(
        "cos", _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cos"), F.asc("id_b"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("id_a").alias("vec_id"), F.col("rank"), F.col("id_b").alias("nn_id"))
        .orderBy("vec_id", "rank")
    )


def srp_bucket(vec_col: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-random-projection bucket id. Plane p's normal is the
    deterministic ±1 vector sign(sin(1 + p·dim + j)) over dimensions j —
    fixed, seedless, identical on any engine/executor."""
    bucket = F.lit(0)
    for p in range(n_planes):
        weights = F.array(
            *[
                F.when(F.sin(F.lit(float(1 + p * dim + j))) >= 0, F.lit(1.0)).otherwise(F.lit(-1.0))
                for j in range(dim)
            ]
        )
        proj = _dot(vec_col.cast("array<double>"), weights)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def ann_bucketed_top1(
    emb: DataFrame, dim: int = 16, n_planes: int = 6,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate NN: SRP-bucket vectors, brute-force only within buckets.
    Recall < 1 by design; the plan shape is the point — the crossJoin
    becomes an equi-join on bucket, shuffle-partitioned, linear in
    Σ bucket²."""
    d = emb.select(
        F.col(id_col), F.col(vec_col), srp_bucket(F.col(vec_col), dim, n_planes).alias("bucket")
    )
    a = d.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket")
    b = d.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket")
    pairs = a.join(b, "bucket").filter(F.col("id_a") != F.col("id_b"))
    sim = pairs.withColumn(
        "cos", _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cos"), F.asc("id_b"))
    return (
        sim.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("id_a").alias("vec_id"), F.col("id_b").alias("nn_id"), "bucket")
        .orderBy("vec_id")
    )


def embedding_near_dups(
    emb: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (ids only): cos ≥ threshold."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    sim = pairs.withColumn(
        "cos", _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    )
    return sim.filter(F.col("cos") >= threshold).select("id_a", "id_b").orderBy("id_a", "id_b")
