"""Round-7 verdict item 1: decompose the 8->32 e2e scaling shortfall.

The north_rule's e2e number normalized to 0.68 in round 6 (bar: 0.8) while
parse->route normalized 0.95 — so the gap lives somewhere in the fan-out
WRITE wave or the read-back aggregate stage. This script measures each stage
separately at local[8] and local[32] on the identical 20M-turn staged input
(sf0.1 x SPARK_GRAFT_SCALE_REPL), plus three write-repartition strategies:

- current:  repartition(n, _bucket, sink, salt4)   -> 8*5*4  = 160 combos
- salt16:   repartition(n, _bucket, sink, salt16)  -> 8*5*16 = 640 combos
- rr:       repartition(n) round-robin (perfect task balance; file count
            explodes to n * combos-present-per-task — NOT a real candidate,
            it isolates how much of the gap is hash-imbalance)

160 combos hashed into 32 tasks is a balls-in-bins skew: the slowest task
carries ~2x the mean while 8 tasks only see ~1.3x — a purely
parallelism-dependent imbalance that never shows at low core counts.

Usage:  python BENCH/e2e_decompose_r7.py   (writes BENCH/e2e_decompose_r7.md)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
REPL = int(os.environ.get("SPARK_GRAFT_SCALE_REPL", "200"))
LEVELS = [int(x) for x in os.environ.get(
    "SPARK_GRAFT_SCALE_LEVELS", "8,32").split(",")]
CYCLES = int(os.environ.get("SPARK_GRAFT_SCALE_CYCLES", "2"))
N_BUCKETS = 8


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    from pyspark.sql import functions as F

    stage_dir = tempfile.mkdtemp(prefix="bench_e2edec_tr_")
    spark = make_spark(32)
    try:
        from logstash_codec_protobuf_spark.sources.transcripts import (
            replicated_transcripts,
        )
        replicated_transcripts(spark, SF_DIR, REPL).repartition(256) \
            .write.mode("overwrite").parquet(stage_dir)
    finally:
        spark.stop()

    results: dict[int, dict[str, float]] = {}
    files_seen: dict[tuple[int, str], int] = {}
    lo, hi = sorted(LEVELS)
    for n in [lvl for _ in range(CYCLES) for lvl in (hi, lo)]:
        spark = make_spark(n)
        try:
            from pyspark.sql import Observation

            from logstash_codec_protobuf_spark.config import CodecConfig
            from logstash_codec_protobuf_spark.operators.enrich import enrich
            from logstash_codec_protobuf_spark.operators.parse import (
                parse_turns,
            )
            from logstash_codec_protobuf_spark.operators.route import (
                route_all,
            )
            from logstash_codec_protobuf_spark.operators import (
                aggregate as agg,
            )

            cfg = CodecConfig()
            tr = spark.read.parquet(stage_dir)
            n_turns = tr.count()
            tr.selectExpr("sum(length(text))", "sum(turn_idx)").collect()

            def _cal():
                spark.range(0, 6_000_000_000, 1, 256).selectExpr(
                    "sum(id % 7 + id % 13)").collect()

            _cal()
            t = {"cal": min(_timed(_cal) for _ in range(3))}

            def _routed():
                r = route_all(enrich(parse_turns(tr, impl="native"),
                                     spark, tag_unknown=False))
                return r.withColumn(
                    "_bucket",
                    F.pmod(F.crc32(F.col("conv_id")),
                           F.lit(N_BUCKETS)).cast("int"))

            def _pr():
                routed = _routed()
                routed.selectExpr(
                    "sum(hash(conv_id, turn_idx, ts, text, tool, cents,"
                    " decoder_exception, sink))", "count(1)").collect()

            _pr()
            t["parse_route"] = min(_timed(_pr) for _ in range(2))

            base = "/dev/shm" if os.path.isdir("/dev/shm") else None

            def _wave(strategy: str, out: str):
                routed = _routed()
                obs = Observation(f"dec_{strategy}_{time.time_ns()}")
                metric_exprs = [
                    F.count_if((F.col("_bucket") == b)
                               & (F.col("sink") == s)).alias(f"c_{b}_{s}")
                    for b in range(N_BUCKETS) for s in cfg.sinks
                ]
                routed = routed.observe(obs, *metric_exprs)
                if strategy == "rr":
                    routed = routed.repartition(n)
                elif strategy.startswith("probe2x"):
                    # probe placement with 2x task overcommit (tail
                    # packing: reduce tasks = 2x cores so a straggler
                    # doesn't idle a core) — optionally with concurrent
                    # output writers to skip the per-task dynamic-partition
                    # sort ("w" suffix)
                    from logstash_codec_protobuf_spark.operators.route \
                        import probe_repartition
                    spark.conf.set(
                        "spark.sql.maxConcurrentOutputFileWriters",
                        "16" if strategy.endswith("w") else "0")
                    sink_pos = F.array_position(
                        F.array(*[F.lit(s) for s in cfg.sinks]),
                        F.col("sink")) - F.lit(1)
                    group_idx = (F.col("_bucket") * F.lit(len(cfg.sinks))
                                 + sink_pos)
                    routed = probe_repartition(
                        routed, 2 * n, group_idx,
                        N_BUCKETS * len(cfg.sinks))
                elif strategy.startswith("probe"):
                    # the FINAL round-7 pipeline strategy: deterministic
                    # combo->partition placement via driver-computed probe
                    # integers (route.probe_repartition) — no hash lottery
                    from logstash_codec_protobuf_spark.operators.route \
                        import probe_repartition
                    sink_pos = F.array_position(
                        F.array(*[F.lit(s) for s in cfg.sinks]),
                        F.col("sink")) - F.lit(1)
                    group_idx = (F.col("_bucket") * F.lit(len(cfg.sinks))
                                 + sink_pos)
                    routed = probe_repartition(
                        routed, n, group_idx,
                        N_BUCKETS * len(cfg.sinks))
                elif strategy.startswith("xsalt"):
                    # independent-hash salt at a FIXED width (sweep the
                    # combos-per-task knob separately from hash quality)
                    w = int(strategy[5:])
                    salt = F.pmod(
                        F.xxhash64(F.col("conv_id"), F.lit("wsalt")),
                        F.lit(w))
                    routed = routed.repartition(
                        n, F.col("_bucket"), F.col("sink"), salt)
                elif strategy == "adaptive":
                    # the round-7 pipeline fix: independent salt hash
                    # (pmod(crc32(conv_id), w) is fully determined by
                    # _bucket = pmod(crc32(conv_id), 8) — zero entropy!)
                    # plus width scaled to ~16x the partition count
                    from logstash_codec_protobuf_spark.operators.route \
                        import adaptive_salt_buckets
                    salt_n = adaptive_salt_buckets(
                        n, N_BUCKETS * len(cfg.sinks),
                        cfg.write_salt_buckets)
                    salt = F.pmod(
                        F.xxhash64(F.col("conv_id"), F.lit("wsalt")),
                        F.lit(salt_n))
                    routed = routed.repartition(
                        n, F.col("_bucket"), F.col("sink"), salt)
                else:
                    buckets = 4 if strategy == "current" else 16
                    salt = F.pmod(F.crc32(F.col("conv_id")), F.lit(buckets))
                    routed = routed.repartition(
                        n, F.col("_bucket"), F.col("sink"), salt)
                if strategy.endswith("_nowrite"):
                    # isolate the exchange: full shuffle, no file write
                    routed.selectExpr("sum(length(text))", "sum(cents)",
                                      "count(1)").collect()
                else:
                    routed.write.mode("append") \
                        .partitionBy("_bucket", "sink").parquet(out)
                obs.get  # barrier: metrics available == action done

            def _run_wave(strategy: str, keep: str | None = None) -> float:
                out = keep or tempfile.mkdtemp(
                    prefix=f"e2edec_{strategy}_{n}_", dir=base)
                try:
                    dt = _timed(lambda: _wave(strategy, out))
                    nf = sum(1 for _, _, fs in os.walk(out)
                             for f in fs if f.endswith(".parquet"))
                    files_seen[(n, strategy)] = nf
                    return dt
                finally:
                    if keep is None:
                        shutil.rmtree(out, ignore_errors=True)

            strats = os.environ.get(
                "SPARK_GRAFT_DECOMP_STRATS", "current,salt16,rr").split(",")
            for strat in strats:
                key = f"wave_{strat}"
                t[key] = _run_wave(strat)

            if os.environ.get("SPARK_GRAFT_DECOMP_SKIP_AGG") != "1":
                # aggregate read-back over a freshly written routed store
                routed_dir = tempfile.mkdtemp(prefix=f"e2edec_store_{n}_",
                                              dir=base)
                _run_wave(strats[0], keep=routed_dir)
                aggout = tempfile.mkdtemp(prefix=f"e2edec_agg_{n}_",
                                          dir=base)

                def _aggstage():
                    routed = spark.read.parquet(routed_dir)
                    good = routed.filter(
                        F.col("sink") != "dead_letter")
                    agg.conv_stats_salted(good, cfg).write \
                        .mode("overwrite").parquet(f"{aggout}/conv_stats")
                    agg.hourly_stats(good).write.mode("overwrite") \
                        .parquet(f"{aggout}/hourly_stats")

                t["agg_stage"] = min(_timed(_aggstage) for _ in range(2))
                shutil.rmtree(routed_dir, ignore_errors=True)
                shutil.rmtree(aggout, ignore_errors=True)

            prev = results.get(n)
            if prev is not None:
                t = {k: min(v, prev[k]) for k, v in t.items()}
            results[n] = t
            print(f"local[{n}]:", {k: round(v, 2) for k, v in t.items()},
                  flush=True)
        finally:
            spark.stop()
    shutil.rmtree(stage_dir, ignore_errors=True)

    ratio = hi / lo
    eff = {k: round((results[lo][k] / results[hi][k]) / ratio, 3)
           for k in results[lo]}
    lines = [
        "# e2e 8->32 decomposition (round 7)\n",
        f"Input: sf{SF} transcripts x{REPL} = {n_turns:,} turns, "
        f"staged parquet; writes on /dev/shm; min over {CYCLES} "
        "interleaved cycles.\n",
        "| stage | local[8] sec | local[32] sec | raw eff | normalized |",
        "| --- | --- | --- | --- | --- |",
    ]
    for k in results[lo]:
        nrm = min(1.0, eff[k] / eff["cal"]) if k != "cal" else 1.0
        lines.append(
            f"| {k} | {results[lo][k]:.2f} | {results[hi][k]:.2f} "
            f"| {eff[k]:.3f} | {nrm:.3f} |")
    lines.append("\nOutput parquet file counts per strategy "
                 "(level, strategy -> files): " + repr(
                     {f"{k[0]}/{k[1]}": v for k, v in sorted(
                         files_seen.items())}))
    suffix = os.environ.get("SPARK_GRAFT_DECOMP_SUFFIX", "")
    with open(f"BENCH/e2e_decompose_r7{suffix}.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
