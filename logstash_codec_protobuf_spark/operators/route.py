"""Tag-based fan-out routing to per-sink tables.

The codec's "fan-out" is its error branch: good events yield to the pipeline,
failures become substitute events tagged `_protobufdecodefailure`
(protobuf.rb:224,229-233). The engine generalizes this to N sinks driven by the
`tools.sink` dictionary column, with the dead-letter sink as one more route.

Scale design (north_rule): the routed write is the job's one big shuffle, so it
is made EXPLICIT — ``repartition(route_partitions, "sink", salt)`` right before
the write. The salt spreads each sink's rows over many tasks (a sink is a
low-cardinality hot key by construction; without the salt all of sink_b lands in
one task at 100 TB). `partitionBy("sink")` on the writer then lays files out per
sink directory. A single ``persist`` lets good/dead flows share the parse stage
instead of re-reading the source per sink (single-pass multi-sink fan-out,
SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import CodecConfig, DEAD_LETTER_SINK


def assign_sink(df: DataFrame, cfg: CodecConfig | None = None) -> DataFrame:
    """Resolve each row's destination sink: dictionary sink for enriched rows,
    dead_letter for unmatched tools (keep-don't-drop, protobuf.rb:229-233)."""
    return df.withColumn("sink", F.coalesce(F.col("sink"), F.lit(DEAD_LETTER_SINK)))


def route_all(parsed_enriched: DataFrame) -> DataFrame:
    """Single-pass routing: every parsed+enriched row (good OR failed) gets its
    sink in one scan — failed parses to dead_letter, good rows to their
    dictionary sink, unmatched dictionary keys to dead_letter.

    This replaces the good/dead union shape, which costs a SECOND full scan of
    the parse pipeline (each union branch re-reads the source) — at 100 TB
    that's the difference between one pass and two.
    """
    p = F.col("parsed")
    return parsed_enriched.select(
        F.col("conv_id"), F.col("turn_idx"), F.col("ts"), F.col("text"),
        F.when(p["error"].isNull(), F.col("tool")).alias("tool"),
        F.when(p["error"].isNull(), p["cents"]).alias("cents"),
        p["error"].alias("decoder_exception"),
        F.when(p["error"].isNotNull(), F.lit(DEAD_LETTER_SINK))
        .otherwise(F.coalesce(F.col("sink"), F.lit(DEAD_LETTER_SINK)))
        .alias("sink"),
    )


def route_counts(good: DataFrame, dead: DataFrame) -> DataFrame:
    """Per-sink routed-row counts — the correctness invariant the north star
    pins against the reference fixtures. Partial aggregation (map-side combine)
    makes this a tiny shuffle regardless of input size."""
    g = good.groupBy("sink").agg(F.count(F.lit(1)).alias("n_rows"))
    d = dead.select(F.lit(DEAD_LETTER_SINK).alias("sink")).groupBy("sink").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    return g.unionByName(d).groupBy("sink").agg(F.sum("n_rows").alias("n_rows"))


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath (cluster
    deployments add ``org.apache.iceberg:iceberg-spark-runtime``)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def fan_out(
    df: DataFrame,
    base_path: str | None = None,
    cfg: CodecConfig | None = None,
    mode: str = "append",
    table: str | None = None,
) -> None:
    """Write rows to per-sink storage in ONE pass.

    Two sinks behind the same shuffle plan:

    - ``table`` set: DataFrameWriterV2 (``writeTo``) against a catalog table
      — the Iceberg path at cluster scale (north star names Iceberg; any V2
      catalog satisfies the API, so the seam is exercised in the sandbox via
      the built-in session catalog). First write creates the table
      partitioned by sink; later writes append through the table's own
      partition spec.
    - otherwise: parquet ``partitionBy("sink")`` directories at
      ``base_path`` — identical layout and shuffle behavior.
    """
    cfg = cfg or CodecConfig()
    n = cfg.route_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    salt = (F.crc32(F.col("conv_id").cast("string")) % cfg.salt_buckets)
    routed = (
        df.withColumn("_salt", salt)
        .repartition(int(n), F.col("sink"), F.col("_salt"))
        .drop("_salt")
    )
    if table is not None:
        spark = routed.sparkSession
        if mode == "overwrite":
            routed.writeTo(table).partitionedBy(F.col("sink")) \
                .createOrReplace()
            return
        if not spark.catalog.tableExists(table):
            routed.writeTo(table).partitionedBy(F.col("sink")).create()
            return
        try:
            routed.writeTo(table).append()
        except Exception:
            # V1 session-catalog tables don't implement the V2 append
            # capability (Iceberg does) — same rows, same partition layout
            # through the V1 writer
            routed.write.mode("append").partitionBy("sink") \
                .saveAsTable(table)
        return
    if base_path is None:
        raise ValueError("fan_out needs either base_path or table")
    routed.write.mode(mode).partitionBy("sink").parquet(base_path)
