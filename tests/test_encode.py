"""Encode path: autoconvert matrix, suppression, strict modes
(protobuf.rb:237-246, 571-613; spec/codecs/pb3_encode_spec.rb)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from logstash_codec_protobuf_spark.config import CodecConfig
from logstash_codec_protobuf_spark.operators.encode import (
    coerce, serialize_turns, strict_encode_check, suppress_empty,
)
from logstash_codec_protobuf_spark.operators.parse import parse_turns
from logstash_codec_protobuf_spark.sources.transcripts import transcripts_df

from .conftest import SF_DIR


def test_autoconvert_matrix(spark):
    """string->float, float->int (lossless only), int->string, string->bool
    (pb3_encode_spec.rb:124-173; float guard protobuf.rb:593-595)."""
    df = spark.createDataFrame([Row(s="74", f1=47.0, f2=47.5, i=1, b1="TRUE", b2="nope")])
    row = df.select(
        coerce(F.col("s"), "float").alias("sf"),
        coerce(F.col("f1"), "int").alias("fi_ok"),
        coerce(F.col("f2"), "int").alias("fi_lossy"),
        coerce(F.col("i"), "string").alias("is_"),
        coerce(F.col("b1"), "bool").alias("bt"),
        coerce(F.col("b2"), "bool").alias("bf"),
    ).collect()[0]
    assert row["sf"] == 74.0
    assert row["fi_ok"] == 47
    assert row["fi_lossy"] is None  # lossy float->int refused
    assert row["is_"] == "1"
    assert row["bt"] is True
    assert row["bf"] is False


def test_coerce_int_exact_above_2pow53(spark):
    """Integer-literal strings coerce exactly even above double precision
    (2^53) — the reference's to_i is exact (protobuf.rb:589); routing through
    double would silently round 9007199254740993 to ...92."""
    df = spark.createDataFrame(
        [Row(s="9007199254740993", huge="9223372036854775807",
             over="99999999999999999999")]
    )
    row = df.select(
        coerce(F.col("s"), "int").alias("v"),
        coerce(F.col("huge"), "int").alias("maxv"),
        coerce(F.col("over"), "int").alias("overflow"),
    ).collect()[0]
    assert row["v"] == 9007199254740993
    assert row["maxv"] == 9223372036854775807
    assert row["overflow"] is None  # beyond int64: refused, dead-letters


def test_drop_nil_fields_nulls_listed_columns(spark):
    """'Removed' fields become NULL so the serializer skips them
    (protobuf.rb:616-618)."""
    from logstash_codec_protobuf_spark.operators.encode import drop_nil_fields

    df = spark.createDataFrame([Row(a="x", b=5, c=1.5)])
    out = drop_nil_fields(df, ["b", "missing"]).collect()[0]
    assert out["a"] == "x" and out["b"] is None and out["c"] == 1.5


def test_encode_roundtrip_exact(spark):
    """decode(encode(x)) == x for every well-formed payload."""
    tr = transcripts_df(spark, SF_DIR).filter(~F.col("text").startswith("CORRUPT"))
    out = serialize_turns(parse_turns(tr))
    assert out.filter(F.col("payload") != F.col("text")).isEmpty()


def test_suppress_empty_payloads(spark):
    """nil/empty encode output is never emitted (protobuf.rb:243-245)."""
    df = spark.createDataFrame(
        [Row(payload="x"), Row(payload=""), Row(payload=None)]
    )
    assert [r["payload"] for r in suppress_empty(df).collect()] == ["x"]


def test_strict_mode_raises_on_encode_failure(spark):
    """pb2 dialect re-raises encode errors (protobuf.rb:633-643)."""
    df = spark.createDataFrame([Row(payload=None)], "payload string")
    with pytest.raises(ValueError, match="strict"):
        strict_encode_check(df, CodecConfig(proto_version=2))
    # pb3 lenient mode: no raise
    strict_encode_check(df, CodecConfig(proto_version=3))
