"""Recursive schema alignment (declarative twin of pb3 type-mismatch
machinery, protobuf.rb:443-504, 571-613)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F, types as T

from logstash_codec_protobuf_spark.operators.schema_align import (
    align_to_schema, schema_diff,
)
from logstash_codec_protobuf_spark.cli import main as cli_main

from .conftest import SF_DIR
from .parity import duck_connection
from .test_pipeline import EXPECTED_SINK_SQL


def test_nested_struct_coercion(spark):
    """String->int inside a nested struct, float->int lossless guard, extra
    field dropped, missing field nulled."""
    df = spark.createDataFrame([Row(
        name=7,                       # int where string expected
        inner=Row(count="42",         # string where long expected
                  ratio=47.0,         # double where long expected (lossless)
                  bad=47.5,           # double where long expected (lossy)
                  extra="drop me"),   # not in target
    )])
    target = T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("inner", T.StructType([
            T.StructField("count", T.LongType()),
            T.StructField("ratio", T.LongType()),
            T.StructField("bad", T.LongType()),
            T.StructField("missing", T.StringType()),
        ])),
    ])
    out = align_to_schema(df, target)
    assert out.schema == target
    row = out.collect()[0]
    assert row["name"] == "7"
    assert row["inner"]["count"] == 42
    assert row["inner"]["ratio"] == 47
    assert row["inner"]["bad"] is None      # lossy refused -> null -> dead-letter
    assert row["inner"]["missing"] is None


def test_array_element_coercion(spark):
    df = spark.createDataFrame([Row(xs=["1", "2", "nope"])])
    target = T.StructType([T.StructField("xs", T.ArrayType(T.LongType()))])
    assert align_to_schema(df, target).collect()[0]["xs"] == [1, 2, None]


def test_schema_diff_reports_dotted_keys(spark):
    actual = T.StructType([
        T.StructField("a", T.StringType()),
        T.StructField("nest", T.StructType([
            T.StructField("x", T.StringType()),
            T.StructField("surplus", T.LongType()),
        ])),
    ])
    target = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("nest", T.StructType([
            T.StructField("x", T.DoubleType()),
            T.StructField("absent", T.BooleanType()),
        ])),
    ])
    diff = {d["key"]: d for d in schema_diff(actual, target)}
    assert diff["a"]["expected"] == "bigint"
    assert diff["nest.x"]["actual"] == "string"
    assert diff["nest.absent"]["actual"] is None
    assert diff["nest.surplus"]["expected"] is None  # extra -> discard


def test_cli_end_to_end(spark, tmp_path):
    """spark-submit contract: the CLI runs the checkpointed job and reports.
    (Reuses the test session via getOrCreate — config is already set.)"""
    out = str(tmp_path / "cli_out")
    result = cli_main(["--sf-dir", SF_DIR, "--out", out,
                       "--buckets", "4", "--wave-size", "4"])
    landed = {
        r["sink"]: r["count"]
        for r in spark.read.parquet(f"{out}/routed").groupBy("sink").count().collect()
    }
    expected = dict(duck_connection(SF_DIR).execute(EXPECTED_SINK_SQL).fetchall())
    assert landed == expected
    assert result["buckets"] == 4


def test_cli_streaming_mode_with_checkpoint_resume(spark, tmp_path):
    """`cli.py --streaming`: the Structured Streaming fan-out twin behind the
    same launch contract. A second invocation with the same --out must
    resume from the streaming checkpoint and reprocess NOTHING (row count
    unchanged — exactly-once against the same input)."""
    from logstash_codec_protobuf_spark.sources.transcripts import transcripts_df

    tr = str(tmp_path / "tr")
    transcripts_df(spark, SF_DIR).write.mode("overwrite").parquet(tr)
    out = str(tmp_path / "stream_out")

    first = cli_main(["--streaming", "--transcripts-path", tr, "--out", out])
    assert first["streaming"] is True and first["rows"] > 0

    again = cli_main(["--streaming", "--transcripts-path", tr, "--out", out])
    assert again["rows"] == first["rows"]  # checkpoint: no reprocessing

    sinks = {r["sink"] for r in
             spark.read.parquet(f"{out}/routed").select("sink").distinct().collect()}
    assert sinks  # partitioned-by-sink layout landed


def test_cli_runs_as_parentless_script(tmp_path):
    """The spark-submit launch shape: `spark-submit cli.py` executes the file
    as a parentless __main__ (NO package context), which is invisible to the
    module-import test above — a relative import in main() passed pytest but
    crashed the real launch. Run the script exactly as spark-submit does."""
    import subprocess
    import sys

    out = str(tmp_path / "script_out")
    env = {"PYTHONPATH": "/root/repo",
           "PATH": "/usr/bin:/bin", "HOME": "/root",
           "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", "")}
    r = subprocess.run(
        [sys.executable, "/root/repo/logstash_codec_protobuf_spark/cli.py",
         "--sf-dir", SF_DIR, "--out", out, "--buckets", "2",
         "--wave-size", "2"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import json as _json

    result = _json.loads(r.stdout.strip().splitlines()[-1])
    assert result["buckets"] == 2 and result["rows"] > 0


def test_autoconvert_off_is_type_error_not_conversion(spark):
    """pb3_encoder_autoconvert_types=false (protobuf.rb:143,410-420):
    exact-type leaves still encode (spec encodePB3-e), mismatched leaves
    null out as type errors instead of converting — flat and nested."""
    df = spark.createDataFrame([Row(
        name="ok",                    # exact string -> passes untouched
        n="42",                       # string where long expected -> TYPE ERROR
        inner=Row(count=7, ratio="3.5"),  # exact long + mismatched string
    )])
    target = T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("inner", T.StructType([
            T.StructField("count", T.LongType()),
            T.StructField("ratio", T.DoubleType()),
        ])),
    ])
    strict = align_to_schema(df, target, autoconvert=False).collect()[0]
    assert strict["name"] == "ok"
    assert strict["n"] is None                      # no str->int conversion
    assert strict["inner"]["count"] == 7            # exact type kept
    assert strict["inner"]["ratio"] is None         # no str->float conversion
    lenient = align_to_schema(df, target).collect()[0]
    assert lenient["n"] == 42 and lenient["inner"]["ratio"] == 3.5


def test_discard_unknown_field_drops_frame_not_pipeline(spark):
    """spec encodePB3-f (pb3_encode_spec.rb:211-237): an event carrying a
    field the schema doesn't know is DISCARDED without crashing. Columnar
    twin: extra column -> empty frame in the target schema; schema_diff
    reports the offending key for dead-letter accounting."""
    target = T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("n", T.LongType()),
    ])
    good = spark.createDataFrame([Row(name="a", n=1)])
    assert align_to_schema(good, target, discard_unknown=True).count() == 1

    bad = spark.createDataFrame([Row(name="a", n=1, bot="not in schema")])
    out = align_to_schema(bad, target, discard_unknown=True)
    assert out.count() == 0
    assert out.schema == target  # downstream plan keeps working
    extras = [d for d in schema_diff(bad.schema, target)
              if d["expected"] is None]
    assert [d["key"] for d in extras] == ["bot"]


def test_config_maps_all_eight_reference_knobs():
    from logstash_codec_protobuf_spark.config import CodecConfig

    cfg = CodecConfig()
    assert cfg.encoder_autoconvert_types is True   # protobuf.rb:143 default
    assert cfg.set_oneof_metainfo is False         # protobuf.rb:110-116 default
    assert cfg.stop_on_error is False              # protobuf.rb:140 default
    assert cfg.proto_version == 3


def test_autoconvert_knob_flows_from_codec_config(spark):
    """CodecConfig.encoder_autoconvert_types must actually govern alignment
    when passed — the knob is the pipeline-level entry point for the
    reference's pb3_encoder_autoconvert_types toggle."""
    from logstash_codec_protobuf_spark.config import CodecConfig

    df = spark.createDataFrame([Row(n="42")])
    target = T.StructType([T.StructField("n", T.LongType())])
    strict_cfg = CodecConfig(encoder_autoconvert_types=False)
    assert align_to_schema(df, target, cfg=strict_cfg).collect()[0]["n"] is None
    assert align_to_schema(df, target,
                           cfg=CodecConfig()).collect()[0]["n"] == 42
    # explicit arg wins over cfg
    assert align_to_schema(df, target, autoconvert=True,
                           cfg=strict_cfg).collect()[0]["n"] == 42
