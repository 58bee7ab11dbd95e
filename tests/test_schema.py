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


# ---------------------------------------------------------------------------
# file-based schema ingestion + config validation
# (load_protobuf_definition, protobuf.rb:781-802; spec/codecs/pb3_decode_spec.rb:38-62)
# ---------------------------------------------------------------------------

import json
import os

import pytest

from logstash_codec_protobuf_spark.schema import (
    SchemaRegistryError, load_schema_file, register_codec,
)

SPEC_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "logstash_codec_protobuf_spark", "schemas", "turn_wire.json",
)


def test_load_schema_file_builds_registry():
    reg = load_schema_file(SPEC_PATH)
    assert "turn_wire" in reg.messages and "Colour" in reg.enums
    spec = reg.messages["turn_wire"]
    assert spec.wire_fields()[0] == (1, spec.fields[0])
    assert spec.oneof_groups() == {"body": ["horn", "wings"]}
    # the file-loaded registry must agree with the built-in one
    from logstash_codec_protobuf_spark.schema import default_registry
    assert reg.messages["turn_wire"] == default_registry().messages["turn_wire"]


def test_register_codec_rejects_both_sources():
    """`include_path` and `class_file` are mutually exclusive
    (pb3_decode_spec.rb:39-51)."""
    with pytest.raises(SchemaRegistryError, match="`include_path` and `class_file`"):
        register_codec("turn_wire", class_file=SPEC_PATH,
                       include_path=[SPEC_PATH])


def test_register_codec_requires_a_source():
    """One of `include_path` or `class_file` is required
    (pb3_decode_spec.rb:53-61)."""
    with pytest.raises(SchemaRegistryError, match="`include_path` or `class_file`"):
        register_codec("turn_wire")


def test_register_codec_idempotent_reregistration():
    """Re-registering a valid configuration is a no-op
    (pb3_decode_spec.rb:64-76)."""
    reg = register_codec("turn_wire", class_file=SPEC_PATH)
    again = register_codec("turn_wire", class_file=SPEC_PATH, registry=reg)
    assert again is reg and "turn_wire" in reg.messages


def test_register_codec_unknown_root_message():
    with pytest.raises(SchemaRegistryError, match="not registered"):
        register_codec("no_such_message", class_file=SPEC_PATH)


def test_load_schema_file_invalid_inputs(tmp_path):
    """Error 4 mirror: wrong extension, unreadable JSON, no messages."""
    with pytest.raises(SchemaRegistryError, match="Not a schema spec file"):
        load_schema_file(str(tmp_path / "x.rb"))
    bad = tmp_path / "bad.json"
    bad.write_text("{ not json")
    with pytest.raises(SchemaRegistryError, match="Invalid protobuf file"):
        load_schema_file(str(bad))
    empty = tmp_path / "empty.json"
    empty.write_text(json.dumps({"enums": {"E": {"0": "A"}}}))
    with pytest.raises(SchemaRegistryError, match="Invalid protobuf file"):
        load_schema_file(str(empty))


def test_register_codec_root_directory(tmp_path):
    """protobuf_root_directory prefixes relative spec paths; absolute paths
    pass through (protobuf.rb:180-186)."""
    import shutil

    from logstash_codec_protobuf_spark.schema import register_codec

    spec_src = ("logstash_codec_protobuf_spark/schemas/turn_wire.json")
    shutil.copy(spec_src, tmp_path / "turn_wire.json")
    reg = register_codec("turn_wire", class_file="turn_wire.json",
                         protobuf_root_directory=str(tmp_path))
    assert "turn_wire" in reg.messages
    # absolute path ignores the root
    reg2 = register_codec("turn_wire",
                          class_file=str(tmp_path / "turn_wire.json"),
                          protobuf_root_directory="/nonexistent")
    assert "turn_wire" in reg2.messages


# ---------------------------------------------------------------------------
# multi-file dependency ordering (protobuf.rb:113-115;
# spec/codecs/pb3_decode_spec.rb:270-307)
# ---------------------------------------------------------------------------

import os

_SCHEMAS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "logstash_codec_protobuf_spark", "schemas")


def _schema(name: str) -> str:
    return os.path.abspath(os.path.join(_SCHEMAS, name))


def test_include_path_dependency_order_enforced():
    """include_path files must be arranged in reverse order of dependency —
    each class loaded before another refers to it (protobuf.rb:113-115)."""
    from logstash_codec_protobuf_spark.schema import register_codec

    with pytest.raises(SchemaRegistryError, match="reverse order"):
        register_codec("directory",
                       include_path=[_schema("directory.json"),
                                     _schema("contact.json")])
    reg = register_codec("directory",
                         include_path=[_schema("contact.json"),
                                       _schema("directory.json")])
    assert "directory" in reg.messages and "contact" in reg.messages


def test_class_file_auto_loads_imports():
    """A schema file's `imports` list is the twin of a compiled _pb.rb's
    require line: class_file=message_a.json auto-loads header.json
    (pb3_decode_spec.rb:270-307, MessageA -> Header)."""
    from logstash_codec_protobuf_spark.schema import register_codec

    reg = register_codec("message_a", class_file=_schema("message_a.json"))
    assert "header" in reg.messages
    assert reg.messages["message_a"].fields[1].type == "message:header"


def test_import_cycle_is_depth_bounded(tmp_path):
    import json as _json

    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(_json.dumps({"imports": ["b.json"],
                              "messages": {"a": {"fields": [
                                  {"name": "x", "type": "string"}]}}}))
    b.write_text(_json.dumps({"imports": ["a.json"],
                              "messages": {"b": {"fields": [
                                  {"name": "y", "type": "string"}]}}}))
    from logstash_codec_protobuf_spark.schema import load_schema_file

    with pytest.raises(SchemaRegistryError, match="too deep"):
        load_schema_file(str(a))


def test_within_file_forward_declaration_ok(tmp_path):
    """A single file defining parent-before-child still loads (forward
    declarations inside one compiled file are legal)."""
    import json as _json

    f = tmp_path / "fwd.json"
    f.write_text(_json.dumps({"messages": {
        "parent": {"fields": [
            {"name": "kid", "type": "message:child"}]},
        "child": {"fields": [{"name": "x", "type": "string"}]},
    }}))
    from logstash_codec_protobuf_spark.schema import register_codec

    reg = register_codec("parent", include_path=[str(f)])
    assert "child" in reg.messages
