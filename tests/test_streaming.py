"""Structured Streaming twin of the batch pipeline: same operators, windowed
aggregates under watermark, checkpointed resume."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_codec_protobuf_spark.sources.transcripts import transcripts_df
from logstash_codec_protobuf_spark.streaming.stream import (
    read_transcript_stream,
    run_stream_to_sinks,
    streaming_parse_route,
    streaming_windowed_counts,
)

from .conftest import SF_DIR
from .parity import duck_connection
from .test_pipeline import EXPECTED_SINK_SQL


def _staged_transcripts(spark, tmp_path) -> str:
    src = str(tmp_path / "tr_src")
    transcripts_df(spark, SF_DIR).write.mode("overwrite").parquet(src)
    return src


def test_stream_fanout_matches_batch_counts(spark, tmp_path):
    """Draining the stream (availableNow) must land exactly the batch
    pipeline's per-sink routed-row counts."""
    src = _staged_transcripts(spark, tmp_path)
    out = str(tmp_path / "stream_out")
    q = run_stream_to_sinks(spark, src, out)
    q.awaitTermination(120)
    landed = {
        r["sink"]: r["count"]
        for r in spark.read.parquet(f"{out}/routed").groupBy("sink").count().collect()
    }
    expected = dict(duck_connection(SF_DIR).execute(EXPECTED_SINK_SQL).fetchall())
    assert landed == expected


def test_stream_restart_is_exactly_once(spark, tmp_path):
    """Restarting with the same checkpoint must not duplicate rows."""
    src = _staged_transcripts(spark, tmp_path)
    out = str(tmp_path / "stream_out2")
    run_stream_to_sinks(spark, src, out).awaitTermination(120)
    n1 = spark.read.parquet(f"{out}/routed").count()
    # restart over the same (fully-consumed) source + checkpoint
    run_stream_to_sinks(spark, src, out).awaitTermination(120)
    n2 = spark.read.parquet(f"{out}/routed").count()
    assert n1 == n2


def test_windowed_counts_under_watermark(spark, tmp_path):
    """Tumbling-hour counts per sink from the stream equal the batch
    hourly aggregation."""
    src = _staged_transcripts(spark, tmp_path)
    routed = streaming_parse_route(read_transcript_stream(spark, src), spark)
    win = streaming_windowed_counts(routed, window="1 hour", watermark="2 hours")
    q = (
        win.writeStream.format("memory").queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_win"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT CAST(window_start AS STRING) h, sink, n_turns FROM win_counts"
    ).collect()
    # batch twin on the same data (good rows only go to tool sinks; dead ones
    # to dead_letter — identical route_all semantics)
    from logstash_codec_protobuf_spark.operators.enrich import enrich
    from logstash_codec_protobuf_spark.operators.parse import parse_turns
    from logstash_codec_protobuf_spark.operators.route import route_all

    batch = route_all(
        enrich(parse_turns(spark.read.parquet(src)), spark, tag_unknown=False)
    )
    expected = {
        (str(r["h"]), r["sink"]): r["n"]
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("h"), "sink"
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got_map = {(r["h"], r["sink"]): r["n_turns"] for r in got}
    # append mode emits only windows the watermark has closed; every emitted
    # window must match the batch truth, and most windows must have emitted
    assert got_map, "no windows emitted"
    for key, n in got_map.items():
        assert expected.get(key) == n, f"window {key}: {n} != {expected.get(key)}"
    assert len(got_map) >= len(expected) - 3  # tail windows may stay open
