"""Parquet table loaders.

At cluster scale these would be Iceberg catalog tables
(``spark.read.format("iceberg").load(...)``) partitioned by ``bucket(N, conv_id)`` /
``days(ts)`` so Catalyst gets partition pruning; in the sandbox the same data lives
in driver-generated parquet files — the DataFrame lineage downstream is identical.
The reference's transport layer (Kafka + byte deserializer, protobuf.rb:30-43) is
Spark-native here: sources are not reimplemented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register parquet tables as temp views so shared SQL (see
    transcripts.TRANSCRIPTS_CTE) runs identically in Spark and DuckDB."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
