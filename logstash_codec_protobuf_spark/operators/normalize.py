"""Normalization operators: enum symbolization, oneof XOR, proto3 defaults,
@-key renames, Struct-as-JSON decode, tag manipulation.

Everything here is pure Column expressions — JVM-side, whole-stage-codegen'd,
no shuffle (all 1:1 row transforms). At 100 TB these fuse into the scan/parse
stage for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

from ..schema import SchemaRegistry, default_registry


def enum_map_col(registry: SchemaRegistry, enum_name: str) -> Column:
    """Enum dictionary as a literal map — Catalyst constant-folds the lookup.

    The columnar analog of the symbol branch of pb3_to_hash
    (protobuf.rb:330-331): codes become NAMES ("PINK"). For large enums a
    broadcast-join against sources.dims.enums_df is the scale path; for the
    reference's <10-value enums a folded literal map is strictly cheaper.
    """
    enum = registry.enums[enum_name]
    pairs: list[Column] = []
    for code, name in sorted(enum.values.items()):
        pairs.append(F.lit(code))
        pairs.append(F.lit(name))
    return F.create_map(*pairs)


def symbolize_enum(
    code: Column,
    enum_name: str,
    registry: SchemaRegistry | None = None,
    proto_version: int = 3,
) -> Column:
    """pb3: int code -> name string; pb2: passthrough ints
    (spec/codecs/pb2_spec.rb:96-99, config note protobuf.rb:134-136)."""
    if proto_version == 2:
        return code
    registry = registry or default_registry()
    return F.element_at(enum_map_col(registry, enum_name), code)


def apply_proto3_defaults(
    named: Column, enum_name: str, registry: SchemaRegistry | None = None
) -> Column:
    """proto3 default emission (protobuf.rb:297): unset/unknown -> code-0 name.

    Fixtures depend on defaults surviving decode (father.fur_colour -> "SILVER",
    spec/codecs/pb3_decode_spec.rb:122-132)."""
    registry = registry or default_registry()
    return F.coalesce(named, F.lit(registry.enums[enum_name].default_name))


def oneof_clean(
    df: DataFrame,
    discriminator: str,
    options: dict[str, str],
    meta_col: str | None = "_meta",
    group: str = "body",
) -> DataFrame:
    """XOR-enforce a oneof group (protobuf.rb:344-373): null out every option
    whose name the discriminator didn't choose, optionally exposing the choice
    in a metadata struct ([@metadata][pb_oneof], protobuf.rb:221-223).

    ``options`` maps option-name -> column name. The discriminator records
    SET-ness, not value: a chosen option keeps its value even when it equals the
    proto3 default (top_accommodation_id=0 case, pb3_decode_spec.rb:519-546) —
    which is exactly why the discriminator is parsed from the wire, never
    inferred by comparing values.
    """
    out = df
    disc = F.col(discriminator)
    for option_name, col_name in options.items():
        out = out.withColumn(
            col_name, F.when(disc == option_name, F.col(col_name))
        )
    if meta_col:
        out = out.withColumn(
            meta_col, F.struct(F.struct(disc.alias(group)).alias("pb_oneof"))
        )
    return out


def oneof_meta_per_element(arr: Column, discriminator_field: str) -> Column:
    """Per-array-element oneof discriminators: the metadata for an array of
    oneof-bearing messages is the array of chosen-option names
    ([@metadata][pb_oneof][contacts[i].prefered_contact],
    pb3_decode_spec.rb:611-635)."""
    return F.transform(arr, lambda x: x[discriminator_field])


def oneof_clean_elements(
    arr: Column,
    fields: list[str],
    discriminator_field: str,
    options: dict[str, str],
) -> Column:
    """XOR-enforce a oneof group INSIDE each element of an array of structs
    (arrays-of-oneofs, pb3_decode_spec.rb:586-639): rebuild every element with
    non-chosen option fields nulled. `fields` is the element's full field list
    (struct rebuild needs it — Spark cannot patch a struct field in place)."""
    option_cols = set(options.values())

    def clean(x: Column) -> Column:
        parts = []
        for name in fields:
            c = x[name]
            if name in option_cols:
                chosen = [opt for opt, col_name in options.items()
                          if col_name == name]
                c = F.when(x[discriminator_field] == chosen[0], c)
            parts.append(c.alias(name))
        return F.struct(*parts)

    return F.transform(arr, clean)


def strip_at_keys(df: DataFrame) -> DataFrame:
    """`@timestamp` -> `timestamp` key rename (protobuf.rb:623,651;
    round-trip fixture spec/codecs/pb2_spec.rb:144,161)."""
    for name in df.columns:
        if name.startswith("@"):
            df = df.withColumnRenamed(name, name.lstrip("@"))
    return df


def decode_json_struct(col: Column, value_type: str = "string") -> Column:
    """google.protobuf.Struct (free-form JSON) -> map column — the FLAT
    homogeneous case (protobuf.rb:290-294; spec/codecs/pb3_decode_spec.rb:454-466).
    For arbitrary nesting use ``decode_json_variant``."""
    return F.from_json(col, T.MapType(T.StringType(), {
        "string": T.StringType(), "int": T.IntegerType(), "bigint": T.LongType(),
        "double": T.DoubleType()}[value_type]))


def decode_json_variant(col: Column) -> Column:
    """google.protobuf.Struct with ARBITRARY nesting (protobuf.rb:290-294
    parses any JSON shape): free-form JSON -> VARIANT. Spark 4's VARIANT is
    the engine-native answer to schemaless payloads — binary-encoded, no
    schema declaration, path extraction via ``F.try_variant_get`` stays
    JVM-side (no UDF) and predicate pushdown on extracted paths works."""
    return F.parse_json(col)


def add_tag(tags: Column, tag: str) -> Column:
    """Append tag, creating the array if absent (pb3_add_tag,
    protobuf.rb:559-566)."""
    return F.array_union(
        F.coalesce(tags, F.array().cast("array<string>")), F.array(F.lit(tag))
    )


def remove_tag(tags: Column, tag: str) -> Column:
    """Remove a tag; empty array -> null, mirroring tag-key deletion
    (pb3_remove_typeconversion_tag, protobuf.rb:506-514)."""
    cleaned = F.array_remove(F.coalesce(tags, F.array().cast("array<string>")),
                             tag)
    return F.when(F.size(cleaned) > 0, cleaned)
