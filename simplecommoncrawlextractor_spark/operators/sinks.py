"""Sinks + the dictionary-encoding star-schema build (SURVEY §2.1 K2-K5).

The reference's PGIndexer batches rows into PostgreSQL with five
string→int dimension tables maintained by an insert-on-miss StringCache
(cc/index/mappers/PGIndexer.java:51-56,230-298). In Spark/Parquet,
dictionary encoding of repeated strings is automatic at the page level; the
explicit dim build below is for consumers that want literal star-schema
outputs. Ids are ``dense_rank`` over the key ordering — deterministic under
any parallelism (``monotonically_increasing_id`` is partition-dependent and
therefore banned in this engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def build_dim(df: DataFrame, col: str, id_col: str | None = None) -> DataFrame:
    """Distinct values of ``col`` → (id, value), ids dense-ranked by value
    order (deterministic; PGIndexer's insert-order ids are thread-timing
    dependent — documented deviation)."""
    id_col = id_col or f"{col}_id"
    w = Window.orderBy(F.asc(col))
    return (
        df.select(col)
        .where(F.col(col).isNotNull())
        .distinct()
        .withColumn(id_col, F.dense_rank().over(w))
        .select(id_col, col)
    )


def encode_star(df: DataFrame, dim_cols: list[str]) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Fact table with string columns replaced by dim ids + the dim tables
    (K4). Dims are broadcast — they are small by construction."""
    dims: dict[str, DataFrame] = {}
    fact = df
    for c in dim_cols:
        dim = build_dim(df, c)
        dims[c] = dim
        fact = fact.join(F.broadcast(dim), on=c, how="left").drop(c)
    return fact, dims


def write_tsv(df: DataFrame, path: str, header: bool = True) -> None:
    """K2: TSV output (the per-thread shard files collapse into Spark's
    file-per-partition; sharding is the engine's job, not the mapper's)."""
    df.write.mode("overwrite").option("sep", "\t").option("header", header).csv(path)


def write_json_gz(df: DataFrame, path: str) -> None:
    """K3: gzipped JSON-lines sub-index (DownSample re-serialization,
    cc/index/mappers/DownSample.java:192-195)."""
    df.write.mode("overwrite").option("compression", "gzip").json(path)


def concat_outputs(spark, paths: list[str]) -> DataFrame:
    """A15: ConcatReducer — shard concatenation is just a multi-path read
    (cc/index/reducers/ConcatReducer.java:28-46)."""
    return spark.read.json(paths)
