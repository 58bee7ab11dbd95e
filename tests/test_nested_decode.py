"""Nested message decode scenarios — the reference's pb3/pb2 decode specs
re-expressed over JSON wire payloads (spec/codecs/pb3_decode_spec.rb,
pb2_spec.rb; scenario mapping noted per test)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from logstash_codec_protobuf_spark.operators.decode_json import (
    decode_json_message, wire_struct_type,
)
from logstash_codec_protobuf_spark.schema import default_registry

REG = default_registry()


def _decode(spark, payload: dict, message="unicorn", **kw):
    df = spark.createDataFrame([(json.dumps(payload),)], "payload string")
    out = df.select(
        decode_json_message(F.col("payload"), REG, message, **kw).alias("m")
    )
    return out.collect()[0]["m"]


def test_simple_scalar_enum_repeated(spark):
    """pb3_decode_spec.rb:87-111: scalars decode, enums decode to NAMES
    (incl. inside arrays), repeated scalars decode to arrays."""
    m = _decode(spark, {
        "name": "Glitter", "age": 4, "fur_colour": 2,
        "favourite_colours": [1, 5], "favourite_numbers": [7, 11],
        "is_pegasus": False,
    })
    assert m["name"] == "Glitter"
    assert m["age"] == 4
    assert m["fur_colour"] == "PINK"
    assert m["favourite_colours"] == ["BLUE", "WHITE"]
    assert m["favourite_numbers"] == [7, 11]
    assert m["is_pegasus"] is False


def test_nested_message_with_proto3_defaults(spark):
    """pb3_decode_spec.rb:115-137: nested mother/father decode; unset proto3
    scalars emit defaults (father.fur_colour code 3 -> 'SILVER'; unset enum ->
    code-0 name 'UNDEFINED'; unset age -> 0)."""
    m = _decode(spark, {
        "name": "Winnie",
        "mother": {"name": "Mum", "fur_colour": 3},
        "father": {"name": "Dad"},
    })
    assert m["mother"]["name"] == "Mum"
    assert m["mother"]["fur_colour"] == "SILVER"
    assert m["father"]["fur_colour"] == "UNDEFINED"  # default emission
    assert m["father"]["age"] == 0
    assert m["name"] == "Winnie"
    assert m["age"] == 0


def test_three_generations_and_depth_bound(spark):
    """pb2_spec.rb:43-77: [mother][mother][first_name]-style access through 3
    generations; level beyond the unroll depth is dropped, not an error."""
    payload = {
        "name": "kid",
        "mother": {"name": "mum",
                   "mother": {"name": "grandma",
                              "mother": {"name": "great-grandma"}}},
    }
    m = _decode(spark, payload, depth=3)
    assert m["mother"]["name"] == "mum"
    assert m["mother"]["mother"]["name"] == "grandma"
    gg = m["mother"]["mother"]["mother"]
    assert gg["name"] == "great-grandma"
    assert "mother" not in gg.asDict()  # recursion bound reached


def test_pb2_enums_stay_ints(spark):
    """pb2_spec.rb:82-104 + config note protobuf.rb:134-136."""
    m = _decode(spark, {"name": "x", "fur_colour": 2,
                        "favourite_colours": [1, 5]}, proto_version=2)
    assert m["fur_colour"] == 2
    assert m["favourite_colours"] == [1, 5]


def test_map_and_repeated_messages(spark):
    """map<string,int32> (PhoneDirectory_pb.rb:17) + repeated nested messages
    (events_pb.rb:11-12 / pb3_decode_spec.rb:311-335,586-639)."""
    m = _decode(spark, {
        "scope": "global",
        "contacts": [
            {"name": "a", "phone_numbers": {"home": 123}},
            {"name": "b", "phone_numbers": {"cell": 456}},
        ],
    }, message="directory")
    assert m["scope"] == "global"
    assert [c["name"] for c in m["contacts"]] == ["a", "b"]
    assert m["contacts"][0]["phone_numbers"] == {"home": 123}
    assert m["contacts"][1]["phone_numbers"] == {"cell": 456}


def test_malformed_json_yields_null_not_error(spark):
    """Decode failure -> null struct (the dead-letter predicate), never a
    thrown exception (protobuf.rb:225-233)."""
    df = spark.createDataFrame([("{not json",), ("42",)], "payload string")
    out = df.select(
        decode_json_message(F.col("payload"), REG, "unicorn").alias("m")
    ).collect()
    assert out[0]["m"] is None


def test_wire_struct_enums_are_ints():
    wt = wire_struct_type(REG, "unicorn", depth=1)
    assert wt["fur_colour"].dataType.typeName() == "integer"
    assert wt["favourite_colours"].dataType.elementType.typeName() == "integer"
