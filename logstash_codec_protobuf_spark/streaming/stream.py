"""Structured Streaming variant of the parse -> enrich -> route pipeline.

The reference codec is transport-agnostic and stateless per message (no
watermarks/windows/state, SURVEY.md §2.10), so the batch engine is the primary
target; this module exists because the codec's natural seat in production IS a
stream (Kafka -> Logstash pipeline, protobuf.rb:30-43). The same operator
functions are reused verbatim — parse_turns / enrich / route_all are all
narrow transformations, so they compose with readStream unchanged. Streaming
adds exactly two things the batch path doesn't have:

- **watermarked tumbling-window aggregates** (late data handling): counts per
  (window, sink) with a configurable lateness bound;
- **incremental sink writes** with checkpointing (exactly-once per sink dir via
  the streaming commit log — the streaming twin of plans.checkpoint).

At cluster scale the source is Kafka or an Iceberg CDC stream; in the sandbox
the file source over a transcripts parquet directory exercises the identical
logical plan (Trigger.AvailableNow drains it deterministically for tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import CodecConfig
from ..operators.enrich import enrich
from ..operators.parse import parse_turns
from ..operators.route import route_all


def read_transcript_stream(spark: SparkSession, source_dir: str,
                           schema: str | None = None) -> DataFrame:
    schema = schema or ("conv_id string, turn_idx int, role string, "
                        "text string, tool string, ts timestamp")
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "8")  # bounded micro-batches
        .parquet(source_dir)
    )


def streaming_parse_route(stream: DataFrame, spark: SparkSession,
                          cfg: CodecConfig | None = None) -> DataFrame:
    """The batch operators, unchanged, over an unbounded frame."""
    return route_all(enrich(parse_turns(stream, cfg, impl="native"), spark,
                            tag_unknown=False))


def streaming_windowed_counts(routed: DataFrame, window: str = "1 hour",
                              watermark: str = "2 hours") -> DataFrame:
    """Per-(window, sink) routed-row counts with late-data tolerance.

    The watermark bounds state: rows later than `watermark` behind the max
    seen ts are dropped from the aggregation (and would be dead-lettered by a
    monitoring query); everything else updates its window exactly once under
    the append output mode."""
    return (
        routed.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("sink"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(F.col("win.start").alias("window_start"), "sink", "n_turns")
    )


def run_stream_to_sinks(spark: SparkSession, source_dir: str, out_dir: str,
                        cfg: CodecConfig | None = None):
    """Continuous fan-out: routed rows land partitioned by sink with streaming
    checkpointing (resume = restart with the same checkpoint dir)."""
    routed = streaming_parse_route(read_transcript_stream(spark, source_dir),
                                   spark, cfg)
    return (
        routed.writeStream
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .partitionBy("sink")
        .trigger(availableNow=True)
        .start(f"{out_dir}/routed")
    )
