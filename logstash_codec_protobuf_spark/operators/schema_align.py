"""Recursive schema alignment: coerce a DataFrame (or nested struct column)
to a target StructType using the codec's autoconvert matrix.

The declarative twin of the reference's recursive mismatch machinery:
``pb3_get_type_mismatches`` diffs actual vs expected types through nested
messages and arrays (protobuf.rb:443-504), ``pb3_convert_mismatched_types``
then patches values by dotted key ("a.b.c" navigation, protobuf.rb:571-613).
Here the diff happens ONCE on the driver against the target StructType and
every patch becomes a cast expression — nested structs recurse, arrays map
their element transform via ``F.transform`` — so executors run a single
codegen'd projection, no per-row type inspection, no retry loop.

Unconvertible leaves (e.g. lossy float->int) become NULL, which the strict
mode surfaces as an encode failure and the lenient mode dead-letters
(protobuf.rb:391-401).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

from ..config import CodecConfig
from .encode import coerce

_COERCE_TARGET = {
    T.LongType(): "int",
    T.IntegerType(): "int",
    T.StringType(): "string",
    T.DoubleType(): "float",
    T.FloatType(): "float",
    T.BooleanType(): "bool",
}


def _align_col(col: Column, actual: T.DataType, target: T.DataType,
               autoconvert: bool = True) -> Column:
    if actual == target:
        return col
    if isinstance(target, T.StructType) and isinstance(actual, T.StructType):
        fields = []
        for f in target.fields:
            if f.name in actual.fieldNames():
                inner = _align_col(col[f.name],
                                   actual[f.name].dataType, f.dataType,
                                   autoconvert)
            else:
                inner = F.lit(None).cast(f.dataType)  # missing -> null field
            fields.append(inner.alias(f.name))
        # extra fields in `actual` are dropped: the reference DISCARDS events
        # with unknown fields (spec/codecs/pb3_encode_spec.rb:224-237); we
        # align-and-drop, with the diff available for dead-letter accounting
        return F.when(col.isNotNull(), F.struct(*fields))
    if isinstance(target, T.ArrayType) and isinstance(actual, T.ArrayType):
        return F.transform(
            col, lambda x: _align_col(x, actual.elementType,
                                      target.elementType, autoconvert)
        )
    if not autoconvert:
        # pb3_encoder_autoconvert_types=false (protobuf.rb:143,410-420):
        # a mismatched leaf is a TYPE ERROR, never a conversion — the value
        # nulls out and the encode stage dead-letters (lenient) or raises
        # (strict), mirroring the reference's "Protobuf encoding error 2.3:
        # Type error ... event has been discarded" path.
        return F.lit(None).cast(target)
    if target in _COERCE_TARGET:
        out = coerce(col, _COERCE_TARGET[target])
        return out.try_cast(target)
    return col.try_cast(target)  # maps/binary/timestamp: lenient, null on fail


def schema_diff(actual: T.StructType, target: T.StructType,
                prefix: str = "") -> list[dict]:
    """Driver-side recursive diff — the analog of pb3_get_type_mismatches'
    [{key, actual_type, expected_type}] result (protobuf.rb:443-451)."""
    out: list[dict] = []
    a_names = set(actual.fieldNames())
    for f in target.fields:
        path = f"{prefix}{f.name}"
        if f.name not in a_names:
            out.append({"key": path, "actual": None,
                        "expected": f.dataType.simpleString()})
            continue
        at = actual[f.name].dataType
        if isinstance(f.dataType, T.StructType) and isinstance(at, T.StructType):
            out.extend(schema_diff(at, f.dataType, prefix=f"{path}."))
        elif at != f.dataType:
            out.append({"key": path, "actual": at.simpleString(),
                        "expected": f.dataType.simpleString()})
    for name in sorted(a_names - {f.name for f in target.fields}):
        out.append({"key": f"{prefix}{name}",
                    "actual": actual[name].dataType.simpleString(),
                    "expected": None})  # extra field -> discard/dead-letter
    return out


def align_to_schema(df: DataFrame, target: T.StructType,
                    autoconvert: bool | None = None,
                    discard_unknown: bool = False,
                    cfg: "CodecConfig | None" = None) -> DataFrame:
    """Project df onto `target`, coercing every mismatched leaf.

    ``cfg`` wires the codec knob: when ``autoconvert`` is not given
    explicitly it comes from ``cfg.encoder_autoconvert_types`` (reference
    default TRUE, protobuf.rb:143) — passing a CodecConfig is how the
    pipeline-level toggle reaches this operator.

    ``autoconvert=False`` maps ``pb3_encoder_autoconvert_types=false``
    (protobuf.rb:143): exact-type leaves pass through untouched (the
    reference still encodes correctly-typed fields with conversion off,
    spec/codecs/pb3_encode_spec.rb:180-207), mismatched leaves null out as
    type errors instead of converting.

    ``discard_unknown=True`` maps the reference's additional-field rule
    (spec case encodePB3-f, pb3_encode_spec.rb:211-237: an event carrying a
    field absent from the schema is discarded, the pipeline keeps going).
    Columnar twin: the schema is per-FRAME, not per-event, so an extra
    column discards the whole frame — returned as an EMPTY frame in the
    target schema (never an exception), with ``schema_diff`` supplying the
    dead-letter accounting."""
    if autoconvert is None:
        autoconvert = cfg.encoder_autoconvert_types if cfg is not None else True
    actual = df.schema
    if discard_unknown:
        extras = [d for d in schema_diff(actual, target)
                  if d["expected"] is None]
        if extras:
            return df.sparkSession.createDataFrame([], target)
    cols = []
    for f in target.fields:
        if f.name in actual.fieldNames():
            cols.append(
                _align_col(F.col(f.name), actual[f.name].dataType,
                           f.dataType, autoconvert).alias(f.name)
            )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
