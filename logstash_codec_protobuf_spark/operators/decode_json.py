"""Nested message decode: JSON wire payload -> fully-typed struct column.

The declarative twin of the reference's recursive projection ``pb3_to_hash``
(protobuf.rb:287-336): message -> struct, repeated -> array, map -> map, enum
code -> NAME (pb3) or passthrough int (pb2), unset scalars -> proto3 defaults.
Where the reference walks each decoded object per record in Ruby, this builds
ONE Column expression tree from the schema registry at plan time — the
recursion happens on the driver over the schema, never on executors over data.

Wire format here is JSON (the sandbox's stand-in for protobuf bytes — the
hierarchy, enum-coding, recursion-depth and default-emission semantics are the
parts the reference's tests actually pin; see spec/codecs/pb3_decode_spec.rb
:87-137 for the unicorn scenarios re-expressed in tests/test_nested_decode.py).
Recursive messages are unrolled to a fixed depth like the registry's
StructType (Human.mother, human.pb.rb:16-17 — fixtures need <= 3 generations).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F, types as T

from ..schema import SchemaRegistry, _SCALAR_TYPES
from .normalize import enum_map_col


def wire_struct_type(registry: SchemaRegistry, message: str,
                     depth: int = 3) -> T.StructType:
    """The schema as it appears ON THE WIRE: enums are int codes."""
    spec = registry.messages[message]
    fields = []
    for f in spec.fields:
        if f.type.startswith("message:"):
            if depth <= 0:
                continue
            dt: T.DataType = wire_struct_type(registry, f.type[8:], depth - 1)
        elif f.type.startswith("enum:"):
            dt = T.IntegerType()
        elif f.type.startswith("map<"):
            dt = registry.spark_type(f.type)
        else:
            dt = _SCALAR_TYPES[f.type]
        if f.repeated:
            dt = T.ArrayType(dt)
        fields.append(T.StructField(f.name, dt, nullable=True))
    return T.StructType(fields)


def _project(col: Column, registry: SchemaRegistry, message: str,
             depth: int, proto_version: int, emit_defaults: bool) -> Column:
    """Recursive enum-symbolizing / default-emitting projection."""
    spec = registry.messages[message]
    out = []
    for f in spec.fields:
        c = col[f.name]
        if f.type.startswith("enum:"):
            enum_name = f.type[5:]

            def sym(code: Column) -> Column:
                if proto_version == 2:
                    return code  # pb2: ints stay ints (pb2_spec.rb:96-99)
                named = F.element_at(enum_map_col(registry, enum_name), code)
                # UNKNOWN code (set but not in the dictionary): pb3 keeps the
                # raw integer rather than inventing a name
                named = F.coalesce(named, code.cast("string"))
                if emit_defaults:
                    # proto3 default emission: UNSET -> code-0 name
                    # (protobuf.rb:297; father.fur_colour -> "SILVER" analog)
                    named = F.when(code.isNull(), F.lit(
                        registry.enums[enum_name].default_name)).otherwise(named)
                return named

            c = F.transform(c, sym) if f.repeated else sym(c)
        elif f.type.startswith("message:"):
            child = f.type[8:]
            if depth <= 0:
                continue
            if f.repeated:
                # single-arg closure: a two-parameter lambda would make
                # F.transform pass (element, index)
                def _elem(child_name):
                    return lambda x: _project(x, registry, child_name,
                                              depth - 1, proto_version,
                                              emit_defaults)

                c = F.transform(c, _elem(child))
            else:
                c = F.when(c.isNotNull(), _project(
                    c, registry, child, depth - 1, proto_version,
                    emit_defaults))
        elif emit_defaults and f.type in _SCALAR_TYPES and not f.repeated:
            default = registry.proto3_default(f.type)
            if default is not None and proto_version == 3:
                c = F.coalesce(c, F.lit(default))
        out.append(c.alias(f.name))
    return F.struct(*out)


def decode_json_message(
    col: Column,
    registry: SchemaRegistry,
    message: str,
    depth: int = 3,
    proto_version: int = 3,
    emit_defaults: bool = True,
) -> Column:
    """Parse a JSON wire payload into the message's fully-decoded struct.

    Returns NULL (the dead-letter predicate) for malformed payloads: plain
    from_json is PERMISSIVE and would emit an all-null struct — which default
    emission would then dress up as a real message — so validity is gated
    explicitly (parseable JSON AND a JSON object, mirroring 'decodable
    protobuf AND the right message class')."""
    wire = F.from_json(col, wire_struct_type(registry, message, depth))
    is_valid = (
        col.isNotNull()
        & F.ltrim(col).startswith("{")
        & F.try_parse_json(col).isNotNull()
    )
    return F.when(
        is_valid,
        _project(wire, registry, message, depth, proto_version, emit_defaults),
    )
