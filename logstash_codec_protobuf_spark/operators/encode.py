"""Encode path: validate -> coerce -> serialize (the codec's write side).

Re-expresses ``encode(event)`` (protobuf.rb:237-246) declaratively. The
reference's runtime retry loop — encode, catch TypeError, diff types, coerce,
tag, re-encode (pb3_handle_type_errors, protobuf.rb:405-440) — disappears: the
autoconvert matrix becomes up-front cast expressions, applied once, in the same
codegen stage as everything else. Rows whose coercion fails produce a null
payload and are dead-lettered (pb3 lenient mode) or raise (pb2 strict mode,
protobuf.rb:633-643).

Autoconvert matrix (pb3_convert_mismatched_types, protobuf.rb:571-613; fixtures
spec/codecs/pb3_encode_spec.rb:124-173):
  string -> int    : to_i            => cast("bigint")
  float  -> int    : only if floor(v)==v (lossless)   protobuf.rb:593-595
  any    -> string : to_s            => cast("string")
  any    -> float  : to_f            => cast("double")
  string -> bool   : downcase=="true"                 protobuf.rb:598-602
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..config import CodecConfig


def coerce(col: Column, target: str) -> Column:
    """One cell of the autoconvert matrix; null when the coercion is illegal
    (lossy float->int, unparseable string), mirroring the discard branch
    (protobuf.rb:391-401). try_cast, not cast: Spark 4 runs ANSI mode where a
    plain cast THROWS on malformed input — the reference's `to_i`/`to_f` are
    lenient, and a failed row must dead-letter, not kill the job."""
    if target == "int":
        # Exact path first: an integer-literal string parses directly to
        # bigint with no precision loss (the reference's to_i is exact,
        # protobuf.rb:589 — routing "9007199254740993" through double would
        # round it silently yet still pass the floor(x)==x check). Only
        # fractional inputs take the double/floor lossless-guard path.
        as_str = col.cast("string")
        exact = as_str.try_cast("bigint")
        as_double = col.try_cast("double")
        lossless = F.floor(as_double) == as_double
        return F.coalesce(
            F.when(as_str.rlike("^-?[0-9]+$"), exact),
            F.when(lossless, as_double.try_cast("bigint")),
        )
    if target == "string":
        return col.cast("string")
    if target == "float":
        return col.try_cast("double")
    if target == "bool":
        return F.lower(col.cast("string")) == F.lit("true")
    raise ValueError(f"unknown coercion target: {target}")


def drop_nil_fields(df: DataFrame, fields: list[str]) -> DataFrame:
    """Nil-field removal before encode (protobuf.rb:616-618; fixture
    spec/codecs/pb3_encode_spec.rb:188-208). Columnar engines can't delete a
    key per-row, so 'removed' == set-to-null: the serializer treats null as
    absent and skips the field (proto3 wire semantics)."""
    for name in fields:
        if name in df.columns:
            df = df.withColumn(
                name, F.lit(None).cast(df.schema[name].dataType)
            )
    return df


def serialize_turns(df: DataFrame, cfg: CodecConfig | None = None) -> DataFrame:
    """Inverse of parse_turns: parsed fields -> wire-format `payload` string.

    Pure concat expressions (JVM-side). Null required fields -> null payload.
    Oneof serialization writes the CHOSEN option and the proto3 default (0) for
    the other — matching what a real pb3 encoder puts on the wire for unset
    scalars inside the message.
    """
    p = F.col("parsed")
    horn = F.coalesce(p["horn"], F.lit(0)).cast("string")
    wings = F.coalesce(p["wings"], F.lit(0)).cast("string")
    payload = F.concat(
        F.lit("PB3|conv="), p["conv_id"],
        F.lit("|turn="), p["turn_idx"].cast("string"),
        F.lit("|role="), p["role"],
        F.lit("|tool="), p["tool"],
        F.lit("|colour="), p["colour"].cast("string"),
        F.lit("|cents="), p["cents"].cast("string"),
        F.lit("|oneof="), p["body_type"],
        F.lit("|horn="), horn,
        F.lit("|wings="), wings,
        F.lit("|msg="), p["msg"],
    )
    return df.withColumn("payload", payload)


def suppress_empty(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Empty/nil encoded output is never emitted (protobuf.rb:243-245)."""
    c = F.col(payload_col)
    return df.filter(c.isNotNull() & (F.length(c) > 0))


def strict_encode_check(df: DataFrame, cfg: CodecConfig) -> None:
    """pb2 dialect: encode errors re-raise instead of dead-lettering
    (pb2_encode, protobuf.rb:633-643). Driver-side assertion."""
    if cfg.proto_version == 2 or cfg.stop_on_error:
        bad = df.filter(F.col("payload").isNull()).limit(1).count()
        if bad:
            raise ValueError("encode failure in strict (pb2/stop_on_error) mode")
