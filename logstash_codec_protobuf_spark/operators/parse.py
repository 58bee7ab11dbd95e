"""Vectorized decode: `text` payload -> typed struct column.

The reimagination of the codec hot path ``decode(data)``
(protobuf.rb:212-234): where the reference parses ONE protobuf message per call in
Ruby, this parses an Arrow batch of payloads per call (pandas UDF) or stays
entirely JVM-side (native regexp expressions) — one logical plan, whole-stage
codegen around it, ~10^4-10^5 rows per Python round-trip instead of 1.

Two interchangeable implementations, asserted identical in tests:

- ``impl="arrow"``  — scalar ``pandas_udf`` returning a StructType; the compiled
  regex runs once per batch over a pandas Series (``str.extract``, C-backed).
  This is the input_hint's "vectorized pandas/Arrow UDF, no per-row Python".
- ``impl="native"`` — pure Column expressions (``rlike`` + ``regexp_extract``),
  zero Python workers, fully codegen'd. Used as the default production path; the
  arrow path exists for formats regex-SQL can't express (and to honor the
  north-star shape).

Failure handling mirrors the decode rescue branch (protobuf.rb:225-233): a row
that doesn't match yields a null parse + error message; `split_dead_letter`
routes it instead of dropping it, preserving the original payload.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from ..config import CodecConfig, DEAD_LETTER_TAG

# Wire format of sources.transcripts — the engine's "compiled schema".
PAYLOAD_REGEX = (
    r"^PB3\|conv=([^|]*)\|turn=([0-9]+)\|role=([^|]*)\|tool=([^|]*)"
    r"\|colour=([0-9]+)\|cents=(-?[0-9]+)\|oneof=([a-z]+)"
    r"\|horn=([0-9]+)\|wings=([0-9]+)\|msg=(.*)$"
)

_GROUPS = [
    ("conv_id", "string"), ("turn_idx", "int"), ("role", "string"),
    ("tool", "string"), ("colour", "int"), ("cents", "bigint"),
    ("body_type", "string"), ("horn", "int"), ("wings", "int"),
    ("msg", "string"),
]

PARSED_TYPE = T.StructType(
    [
        T.StructField(name, {"string": T.StringType(), "int": T.IntegerType(),
                             "bigint": T.LongType()}[typ])
        for name, typ in _GROUPS
    ]
    + [T.StructField("error", T.StringType())]
)

_PARSE_ERROR = "payload does not match PB3 wire format"


# Field prefix widths inside the split pieces ("conv=" is 5 chars, ...).
# On a matched row piece i+1 is exactly "<name>=<group_i>" for the first 9
# groups (none of them can contain '|'), so substring == regexp_extract.
_PREFIX_LEN = [5, 5, 5, 5, 7, 6, 6, 5, 6]


def _native_parse_col(text: Column) -> Column:
    """JVM-side parse: matched rows -> populated struct, else error struct.

    One regex validation pass (rlike) + one split + one regexp_extract for
    the final msg group, instead of the old 1 rlike + 10 regexp_extract —
    the payload regex ran 11 times per row and dominated every consumer of
    the parse stage (round-8; equivalence pinned by test_parse parity).
    msg alone keeps the regex extract because ``(.*)$`` excludes a trailing
    line terminator where a split piece would keep it; the other nine
    groups are '|'-free by construction, so their split pieces are
    byte-identical to the regex groups whenever the row matches at all.
    """
    parts = F.split(text, r"\|", 11)

    def grp(i: int, typ: str) -> Column:
        if i == 10:  # msg: the only group where split and regex can differ
            c = F.regexp_extract(text, PAYLOAD_REGEX, 10)
        else:
            c = F.substring(F.element_at(parts, i + 1),
                            _PREFIX_LEN[i - 1] + 1, 2_000_000_000)
        return c if typ == "string" else c.cast(typ)

    good = F.struct(
        *[grp(i + 1, typ).alias(name) for i, (name, typ) in enumerate(_GROUPS)],
        F.lit(None).cast("string").alias("error"),
    )
    bad = F.struct(
        *[F.lit(None).cast(typ).alias(name) for name, typ in _GROUPS],
        F.lit(_PARSE_ERROR).alias("error"),
    )
    return F.when(text.rlike(PAYLOAD_REGEX), good).otherwise(bad)


@F.pandas_udf(PARSED_TYPE)
def _arrow_parse_udf(text: pd.Series) -> pd.DataFrame:
    """Batch parse: one compiled-regex pass per Arrow batch (no per-row Python)."""
    pat = re.compile(PAYLOAD_REGEX)
    ext = text.str.extract(pat)  # DataFrame, one column per group, NaN on no-match
    out = pd.DataFrame()
    for i, (name, typ) in enumerate(_GROUPS):
        col = ext[i]
        if typ in ("int", "bigint"):
            col = pd.to_numeric(col, errors="coerce").astype("Int64")
        out[name] = col
    out["error"] = pd.Series(
        [_PARSE_ERROR if miss else None for miss in ext[0].isna()],
        index=text.index, dtype="object",
    )
    return out


def parse_turns(df: DataFrame, cfg: CodecConfig | None = None,
                impl: str = "native") -> DataFrame:
    """Add a `parsed` struct column next to the raw transcript columns.

    1:1 projection, no shuffle — Catalyst pipelines it into the scan stage.
    """
    if impl == "native":
        parsed = _native_parse_col(F.col("text"))
    elif impl == "arrow":
        parsed = _arrow_parse_udf(F.col("text"))
    else:
        raise ValueError(f"unknown parse impl: {impl}")
    return df.withColumn("parsed", parsed)


def parse_failed(parsed: Column) -> Column:
    """Decode-failure predicate (protobuf.rb:225-233)."""
    return parsed["error"].isNotNull()


def split_dead_letter(
    df: DataFrame, cfg: CodecConfig | None = None
) -> tuple[DataFrame, DataFrame]:
    """Split parsed rows into (good, dead_letter).

    Dead-letter rows carry the substitute-event shape of protobuf.rb:229-233:
    original payload under `message`, `tags=['_protobufdecodefailure']`,
    `decoder_exception`. With ``stop_on_error`` the caller should assert
    ``dead.isEmpty()`` / raise (protobuf.rb:227-228) — see plans.pipeline.
    """
    cfg = cfg or CodecConfig()
    bad_pred = parse_failed(F.col("parsed"))
    good = df.filter(~bad_pred)
    dead = df.filter(bad_pred).select(
        F.col("conv_id"),
        F.col("turn_idx"),
        F.col("ts"),
        F.col("text").alias("message"),
        F.array(F.lit(DEAD_LETTER_TAG)).alias("tags"),
        F.col("parsed")["error"].alias("decoder_exception"),
    )
    return good, dead
