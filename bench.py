#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline pipeline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

--scaling: run the identical end-to-end job at local[8] and local[32] on the
same input and report throughput at both + scaling efficiency (the sandbox
evidence for the north_rule's N vs 4N executor criterion) into
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def make_spark(cpus: int, shuffle_partitions: int | None = None):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "24g"))
        .getOrCreate()
    )


def _consume(df) -> int:
    """Force full computation of every row without collecting data."""
    return df.count()


def bench_queries(spark, sf_dir: str) -> tuple[dict[str, float], int]:
    from pyspark.sql import functions as F

    from logstash_codec_protobuf_spark.operators import aggregate as agg
    from logstash_codec_protobuf_spark.operators.encode import serialize_turns
    from logstash_codec_protobuf_spark.operators.enrich import enrich
    from logstash_codec_protobuf_spark.operators.parse import parse_turns, split_dead_letter
    from logstash_codec_protobuf_spark.operators.route import assign_sink, route_counts
    from logstash_codec_protobuf_spark.plans.pipeline import run_pipeline
    from logstash_codec_protobuf_spark.sources.transcripts import transcripts_df

    # materialize the transcripts input once so per-query timings measure the
    # engine, not the synthetic derivation (at scale the table pre-exists)
    tr_path = tempfile.mkdtemp(prefix="bench_tr_")
    transcripts_df(spark, sf_dir).write.mode("overwrite").parquet(tr_path)
    tr = spark.read.parquet(tr_path)
    n_turns = tr.count()

    def routed_counts(impl):
        def run():
            good, dead = split_dead_letter(parse_turns(tr, impl=impl))
            good = assign_sink(enrich(good, spark, tag_unknown=False))
            return route_counts(good, dead).collect()
        return run

    def conv_stats_run():
        good, _ = split_dead_letter(parse_turns(tr, impl="native"))
        flat = good.select("conv_id", "turn_idx",
                           F.col("parsed")["cents"].alias("cents"))
        return _consume(agg.conv_stats_salted(flat))

    def hourly_run():
        good, _ = split_dead_letter(parse_turns(tr, impl="native"))
        good = assign_sink(enrich(good, spark, tag_unknown=False))
        return _consume(agg.hourly_stats(good))

    def encode_run():
        good, _ = split_dead_letter(parse_turns(tr, impl="native"))
        out = serialize_turns(good)
        return _consume(out.filter(F.col("payload") == F.col("text")))

    def e2e_run():
        out = tempfile.mkdtemp(prefix="bench_e2e_")
        try:
            # full checkpointed job incl. fan-out writes + aggregates
            return run_pipeline(spark, sf_dir, out, n_buckets=8, wave_size=8)
        finally:
            shutil.rmtree(out, ignore_errors=True)

    cases = {
        "parse_route_native": routed_counts("native"),
        "parse_route_arrow": routed_counts("arrow"),
        "conv_stats_salted": conv_stats_run,
        "hourly_stats": hourly_run,
        "encode_roundtrip": encode_run,
        "e2e_fanout_write": e2e_run,
    }
    times: dict[str, float] = {}
    for name, fn in cases.items():
        t0 = time.time()
        fn()
        times[name] = round(time.time() - t0, 3)
    shutil.rmtree(tr_path, ignore_errors=True)
    return times, n_turns


def run_once(cpus: int, sf_dir: str) -> dict:
    spark = make_spark(cpus)
    try:
        times, n_turns = bench_queries(spark, sf_dir)
        return {"times": times, "n_turns": n_turns}
    finally:
        spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    if "--scaling" in sys.argv:
        results = {}
        for n in (8, 32):
            r = run_once(n, sf_dir)
            wall = r["times"]["parse_route_native"] + r["times"]["e2e_fanout_write"]
            results[n] = {
                "wall_sec": wall,
                "turns_per_sec": r["n_turns"] / max(wall, 1e-9),
                **r,
            }
        eff = (results[32]["turns_per_sec"] / results[8]["turns_per_sec"]) / 4.0
        report = {
            "sf": sf,
            "local8_turns_per_sec": round(results[8]["turns_per_sec"]),
            "local32_turns_per_sec": round(results[32]["turns_per_sec"]),
            "scaling_efficiency": round(eff, 3),
        }
        print(json.dumps(report))
        return

    r = run_once(cpus, sf_dir)
    total = sum(r["times"].values())
    out = {
        "metric": "pipeline_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": r["times"],
        "sf": sf,
        "n_turns": r["n_turns"],
        "turns_per_sec_e2e": round(r["n_turns"] / max(r["times"]["e2e_fanout_write"], 1e-9)),
        "turns_per_sec_parse_route": round(
            r["n_turns"] / max(r["times"]["parse_route_native"], 1e-9)
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
