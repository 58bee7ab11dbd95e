#!/usr/bin/env python
"""Round-8 optimization side-bench (bench.py is FROZEN for measurement).

Modes:
  --cases [name ...]  : time individual bench cases (same shapes as
                        bench.py:bench_queries) best-of-N with the noop sink
                        where applicable, loadavg-annotated.
  --plans             : dump .explain("formatted") for each case's DataFrame
                        into plans/r08/<case>_<tag>.txt (tag via --tag).
  --e2eab             : A/B the pre-write repartition strategies for the
                        fan-out write at headline scale (verdict item 1).

Everything here reads the same $SPARK_GRAFT_SF_DIR inputs as bench.py and
computes from parquet — no cross-run caching.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import pandas as pd  # noqa: F401  (pandas_udf type hints under __future__)

from bench import make_spark, _consume, _loadavg, _timed


def _stage_transcripts(spark, sf_dir):
    from logstash_codec_protobuf_spark.sources.transcripts import transcripts_df

    tr_path = tempfile.mkdtemp(prefix="bx_tr_")
    transcripts_df(spark, sf_dir).write.mode("overwrite").parquet(tr_path)
    return spark.read.parquet(tr_path), tr_path


def build_cases(spark, sf_dir):
    """(name -> zero-arg runner, name -> DataFrame builder for explain)."""
    from pyspark.sql import functions as F

    from logstash_codec_protobuf_spark.operators import aggregate as agg
    from logstash_codec_protobuf_spark.operators import dedup as DD
    from logstash_codec_protobuf_spark.operators import similarity as SIM
    from logstash_codec_protobuf_spark.operators.encode import serialize_turns
    from logstash_codec_protobuf_spark.operators.enrich import enrich
    from logstash_codec_protobuf_spark.operators.parse import (
        parse_turns, split_dead_letter,
    )
    from logstash_codec_protobuf_spark.operators.route import route_all
    from logstash_codec_protobuf_spark.plans.pipeline import run_pipeline

    tr, tr_path = _stage_transcripts(spark, sf_dir)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    frames = {
        "parse_route_native": lambda: route_all(
            enrich(parse_turns(tr, impl="native"), spark, tag_unknown=False)
        ).groupBy("sink").count(),
        "parse_route_arrow": lambda: route_all(
            enrich(parse_turns(tr, impl="arrow"), spark, tag_unknown=False)
        ).groupBy("sink").count(),
        "conv_stats_salted": lambda: agg.conv_stats_salted(
            split_dead_letter(parse_turns(tr, impl="native"))[0].select(
                "conv_id", "turn_idx",
                F.col("parsed")["cents"].alias("cents"))),
        "hourly_stats": lambda: agg.hourly_stats(
            route_all(enrich(parse_turns(tr, impl="native"), spark,
                             tag_unknown=False))
            .filter(F.col("decoder_exception").isNull())),
        "encode_roundtrip": lambda: serialize_turns(
            split_dead_letter(parse_turns(tr, impl="native"))[0]
        ).filter(F.col("payload") == F.col("text")),
        "session_stats_naive_window": lambda: agg.session_stats(
            tr, segmented=False),
        "session_stats_segmented": lambda: agg.session_stats(
            tr, segmented=True),
        "dedup_jaccard_lsh": lambda: DD.ngram_jaccard_pairs(
            docs, threshold=0.5),
        "dedup_clusters_star": lambda: DD.dedup_clusters_star(docs),
        "simhash_neardup": lambda: DD.simhash_neardup_pairs(docs),
        "ann_lsh_topk": lambda: SIM.lsh_topk(emb),
        "embedding_neardup": lambda: SIM.neardup_pairs(emb, threshold=0.3),
    }

    def pb_wire_roundtrip_run():
        from logstash_codec_protobuf_spark.operators import pb_wire as PW
        good, _ = split_dead_letter(parse_turns(tr, impl="native"))
        p = F.col("parsed")
        flat = good.select(
            *[p[c].alias(c) for c in ("conv_id", "turn_idx", "role", "tool",
                                      "colour", "cents", "body_type", "horn",
                                      "wings", "msg")]).persist()
        dec = PW.decode_turn_wire(PW.encode_turn_wire(flat))
        try:
            return _consume(dec.filter(F.col("decoded")["error"].isNull()))
        finally:
            flat.unpersist()

    def e2e_run():
        out = tempfile.mkdtemp(prefix="bx_e2e_")
        try:
            return run_pipeline(spark, sf_dir, out, n_buckets=8, wave_size=8)
        finally:
            shutil.rmtree(out, ignore_errors=True)

    runners = {name: (lambda b=build: _consume(b()))
               for name, build in frames.items()}
    runners["pb_wire_roundtrip"] = pb_wire_roundtrip_run
    runners["e2e_fanout_write"] = e2e_run
    return runners, frames, tr_path


def run_cases(names, n=3):
    from logstash_codec_protobuf_spark import cache

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    try:
        runners, _, tr_path = build_cases(spark, sf_dir)
        names = names or list(runners)
        # warm JVM/codegen/python pool
        runners["parse_route_native"]()
        cache.release_tracked()
        out = {"loadavg_start": _loadavg()}
        for name in names:
            samples = []
            for _ in range(n):
                cache.release_tracked()
                spark.sparkContext.setJobDescription(f"bx:{name}")
                samples.append(round(_timed(runners[name]), 3))
            out[name] = {"min": min(samples), "samples": samples}
        out["loadavg_end"] = _loadavg()
        shutil.rmtree(tr_path, ignore_errors=True)
        return out
    finally:
        spark.stop()


def dump_plans(names, tag):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    os.makedirs("plans/r08", exist_ok=True)
    try:
        _, frames, tr_path = build_cases(spark, sf_dir)
        names = names or list(frames)
        for name in names:
            if name not in frames:
                continue
            df = frames[name]()
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(f"plans/r08/{name}_{tag}.txt", "w") as f:
                f.write(p)
            print(f"wrote plans/r08/{name}_{tag}.txt")
        shutil.rmtree(tr_path, ignore_errors=True)
    finally:
        spark.stop()


def main():
    args = sys.argv[1:]
    if "--plans" in args:
        i = args.index("--plans")
        tag = "before"
        if "--tag" in args:
            tag = args[args.index("--tag") + 1]
        names = [a for a in args[i + 1:] if not a.startswith("--") and a != tag]
        dump_plans(names, tag)
        return
    if "--cases" in args:
        i = args.index("--cases")
        n = int(os.environ.get("SPARK_GRAFT_BX_N", "3"))
        names = [a for a in args[i + 1:] if not a.startswith("--")]
        print(json.dumps(run_cases(names, n=n)))
        return
    print(json.dumps(run_cases(None, n=int(
        os.environ.get("SPARK_GRAFT_BX_N", "3")))))


if __name__ == "__main__":
    main()
