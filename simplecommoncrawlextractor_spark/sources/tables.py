"""Testdata parquet loaders (TESTDATA.md tables)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register the testdata tables as temp views so shared ANSI-SQL
    snippets (the DuckDB-oracle CTEs) run verbatim on the Spark side too."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
