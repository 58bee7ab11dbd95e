"""Schema registry (driver-side twin of register()/metadata analysis,
protobuf.rb:164-199,690-778)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from logstash_codec_protobuf_spark.schema import (
    EnumSpec, FieldSpec, MessageSpec, SchemaRegistry, SchemaRegistryError,
    default_registry,
)


def test_idempotent_register_and_conflict():
    """Re-register identical spec is a no-op (should_register, protobuf.rb:178);
    conflicting spec raises."""
    reg = SchemaRegistry()
    e = EnumSpec("E", {0: "A"})
    reg.register_enum(e)
    reg.register_enum(e)  # idempotent
    with pytest.raises(SchemaRegistryError):
        reg.register_enum(EnumSpec("E", {0: "B"}))


def test_validate_fails_fast_on_unknown_refs():
    reg = SchemaRegistry()
    reg.register_message(MessageSpec("M", (FieldSpec("x", "enum:Nope"),)))
    with pytest.raises(SchemaRegistryError, match="unknown enum"):
        reg.validate("M")
    with pytest.raises(SchemaRegistryError, match="not registered"):
        SchemaRegistry().validate("Absent")


def test_recursive_message_unrolls_to_fixed_depth():
    """Human.mother/father self-reference (human.pb.rb:16-17) — Spark has no
    recursive types; fixtures need 3 generations (pb2_spec.rb:43-77)."""
    reg = default_registry()
    st = reg.to_struct_type("human", depth=3)
    mother = st["mother"].dataType
    grandma = mother["mother"].dataType
    great = grandma["mother"].dataType
    assert isinstance(great, T.StructType)
    assert "mother" not in great.fieldNames()  # recursion bound reached
    assert "first_name" in great.fieldNames()


def test_field_dictionaries():
    """@metainfo_messageclasses / @metainfo_enumclasses equivalents."""
    reg = default_registry()
    assert reg.message_field_dict()["human.mother"] == "human"
    assert reg.enum_field_dict()["turn_payload.colour"] == "Colour"
    rows = reg.enum_rows()
    assert ("Colour", 2, "PINK") in rows


def test_proto3_defaults():
    reg = default_registry()
    assert reg.proto3_default("int32") == 0
    assert reg.proto3_default("string") == ""
    assert reg.proto3_default("bool") is False
    assert reg.proto3_default("enum:Colour") == "UNDEFINED"


def test_repeated_and_map_types():
    reg = default_registry()
    st = reg.to_struct_type("human")
    assert st["middle_names"].dataType == T.ArrayType(T.StringType())
    assert reg.spark_type("map<string,int32>") == T.MapType(
        T.StringType(), T.IntegerType()
    )
