"""Normalization operator semantics vs the reference fixtures."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from logstash_codec_protobuf_spark.operators.normalize import (
    add_tag, apply_proto3_defaults, oneof_clean, remove_tag, strip_at_keys,
    symbolize_enum,
)


def test_enum_symbolize_names(spark):
    """Colour codes -> names, verbatim values from unicorn_pb.rb:19-27."""
    df = spark.createDataFrame([(i,) for i in range(8)], "code int")
    got = df.select(symbolize_enum(F.col("code"), "Colour").alias("name")).collect()
    names = [r["name"] for r in got]
    assert names == ["UNDEFINED", "BLUE", "PINK", "SILVER", "GLITTER",
                     "WHITE", "GREEN", None]


def test_proto3_default_emission(spark):
    """Unset enum -> code-0 name (father.fur_colour -> default behavior,
    pb3_decode_spec.rb:122-132)."""
    df = spark.createDataFrame([(None,), (2,)], "code int")
    got = df.select(
        apply_proto3_defaults(
            symbolize_enum(F.col("code"), "Colour"), "Colour"
        ).alias("name")
    ).collect()
    assert [r["name"] for r in got] == ["UNDEFINED", "PINK"]


def test_oneof_default_valued_winner_survives(spark):
    """A chosen option whose value equals the proto3 default (0) must survive —
    discriminator from SET-ness, not value (pb3_decode_spec.rb:519-546)."""
    df = spark.createDataFrame(
        [Row(kind="unicorn", horn=0, wings=7)]
    )
    out = oneof_clean(df, "kind", {"unicorn": "horn", "pegasus": "wings"}).collect()[0]
    assert out["horn"] == 0          # kept despite being the default value
    assert out["wings"] is None      # loser nulled
    assert out["_meta"]["pb_oneof"]["body"] == "unicorn"


def test_tag_add_remove_roundtrip(spark):
    """pb3_add_tag creates-if-absent (protobuf.rb:559-566);
    remove drops the array when emptied (protobuf.rb:506-514)."""
    df = spark.createDataFrame([Row(tags=None), Row(tags=["x"])],
                               "tags array<string>")
    added = df.select(add_tag(F.col("tags"), "t").alias("tags")).collect()
    assert [r["tags"] for r in added] == [["t"], ["x", "t"]]
    removed = df.select(remove_tag(F.col("tags"), "x").alias("tags")).collect()
    assert [r["tags"] for r in removed] == [None, None]


def test_strip_at_keys(spark):
    """`@email` -> `email` round-trip key rename (pb2_spec.rb:144,161)."""
    df = spark.createDataFrame([("a", "b")], ["@timestamp", "email"])
    assert strip_at_keys(df).columns == ["timestamp", "email"]
