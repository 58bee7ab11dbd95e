"""Property-based wire-format round trips: pure-Python, no Spark session —
hypothesis drives the varint/zigzag/length-delimited grammar over the whole
value space (the reference's round-trip oracle pattern,
spec/codecs/pb3_encode_spec.rb:25-41, generalized to generated messages)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from logstash_codec_protobuf_spark.functions.wire import (
    py_field_len, py_field_sint, py_field_string, py_field_varint, py_unzigzag,
    py_varint, py_zigzag,
)
from logstash_codec_protobuf_spark.operators import pb_wire as W
from logstash_codec_protobuf_spark.schema import default_registry

REG = default_registry()

u64 = st.integers(min_value=0, max_value=2**64 - 1)
i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
i32 = st.integers(min_value=0, max_value=2**31 - 1)


@given(u64)
@settings(max_examples=300)
def test_varint_roundtrip_u64(n):
    buf = py_varint(n)
    assert 1 <= len(buf) <= 10
    got, pos = W.read_varint(buf, 0)
    assert got == n and pos == len(buf)


@given(i64)
@settings(max_examples=300)
def test_zigzag_roundtrip_i64(n):
    z = py_zigzag(n)
    assert 0 <= z <= 2**64 - 1
    assert py_unzigzag(z) == n


@given(i64)
@settings(max_examples=200)
def test_negative_int64_two_complement_roundtrip(n):
    """int64 fields ride negatives as 10-byte two's-complement varints."""
    buf = py_varint(n)
    raw, _ = W.read_varint(buf, 0)
    assert W._varint_value(raw, "int64") == n


turn_values = st.fixed_dictionaries({
    "conv_id": st.text(min_size=0, max_size=20),
    "turn_idx": i32,
    "role": st.text(max_size=8),
    "tool": st.text(max_size=8),
    "colour": st.integers(min_value=0, max_value=6),
    "cents": i64,
    "body_type": st.sampled_from(["unicorn", "pegasus", None]),
    "horn": st.integers(min_value=0, max_value=2**31 - 1),
    "wings": st.integers(min_value=0, max_value=2**31 - 1),
    "msg": st.text(max_size=30),
})


@given(turn_values)
@settings(max_examples=200, deadline=None)
def test_turn_wire_roundtrip_property(v):
    """decode(encode(turn)) reproduces every field under proto3 presence
    rules: omitted-at-default scalars come back as defaults, the chosen oneof
    member survives even at 0, the loser is None."""
    d = W.py_decode(W.py_encode_turn(v), REG, "turn_wire")
    assert d["conv_id"] == v["conv_id"]
    assert d["turn_idx"] == v["turn_idx"]
    assert d["role"] == v["role"] and d["tool"] == v["tool"]
    assert d["cents"] == v["cents"]
    assert d["msg"] == v["msg"]
    name = REG.enums["Colour"].name_of(v["colour"])
    assert d["colour"] == name
    if v["body_type"] == "unicorn":
        assert d["horn"] == v["horn"] and d["wings"] is None
        assert d["_pb_oneof"] == {"body": "horn"}
    elif v["body_type"] == "pegasus":
        assert d["wings"] == v["wings"] and d["horn"] is None
        assert d["_pb_oneof"] == {"body": "wings"}
    else:
        assert d["horn"] is None and d["wings"] is None
        assert d["_pb_oneof"] == {}


@given(st.lists(st.tuples(st.integers(min_value=1, max_value=200), u64),
                max_size=12))
@settings(max_examples=150)
def test_unknown_varint_fields_always_skipped(fields):
    """A message carrying ONLY unknown varint fields decodes to all-defaults
    (forward compatibility, whatever the field numbers/values)."""
    buf = b"".join(
        py_field_varint(num, val) for num, val in fields
        if num not in {1, 2, 3, 4, 5, 6, 8, 9, 10}
    )
    d = W.py_decode(buf, REG, "turn_wire")
    assert d["conv_id"] == "" and d["turn_idx"] == 0


@given(st.binary(max_size=64), u64, st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=200)
def test_dns_bytes_and_uint64_roundtrip(payload, ident, rc):
    buf = py_field_varint(1, ident)
    if rc:
        buf += py_field_varint(2, rc)
    if payload:
        buf += py_field_len(5, payload)
    d = W.py_decode(buf, REG, "dns_message")
    assert d["id"] == ident
    assert d["response_code"] == rc
    assert d["payload"] == payload


@given(st.binary(min_size=1, max_size=40))
@settings(max_examples=300)
def test_random_bytes_never_crash_decoder(junk):
    """Arbitrary bytes either decode (if they accidentally form valid wire
    format) or raise the dead-letter ValueError — never any other exception."""
    try:
        W.py_decode(junk, REG, "turn_wire")
    except ValueError as e:
        assert "wire format" in str(e)


@given(st.text(max_size=30))
@settings(max_examples=200)
def test_string_field_utf8_roundtrip(s):
    buf = py_field_string(10, s) if s else b""
    d = W.py_decode(buf, REG, "turn_wire")
    assert d["msg"] == s


@given(st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1),
                min_size=1, max_size=10))
@settings(max_examples=150)
def test_sint_field_roundtrip(vals):
    """sint64 zigzag round trip across sign boundaries."""
    for v in vals:
        buf = py_field_sint(6, v)
        d = W.py_decode(buf, REG, "turn_wire")
        assert d["cents"] == v


# ---------------------------------------------------------------------------
# round-3 surfaces: float/double, Struct, depth-3 recursion
# ---------------------------------------------------------------------------

finite_doubles = st.floats(allow_nan=False, allow_infinity=False)


@given(finite_doubles)
@settings(max_examples=300)
def test_double_field_bit_exact_roundtrip(x):
    """fixed64 IEEE doubles round-trip bit-exactly through the wire."""
    from logstash_codec_protobuf_spark.functions.wire import py_field_double

    buf = py_field_double(3, x)  # ping_ipv4_result.latency
    d = W.py_decode(buf, REG, "ping_ipv4_result")
    got = d["latency"]
    assert got == x or (got == 0.0 and x == 0.0)  # -0.0 == 0.0 is fine


@given(st.floats(allow_nan=False, allow_infinity=False, width=32))
@settings(max_examples=300)
def test_float_field_bit_exact_roundtrip(x):
    """fixed32 floats: any float32-representable value survives exactly."""
    from logstash_codec_protobuf_spark.functions.wire import py_field_float

    buf = py_field_float(2, x)  # user_agent.major
    d = W.py_decode(buf, REG, "user_agent")
    assert d["major"] == x


json_values = st.recursive(
    st.none() | st.booleans()
    | st.floats(allow_nan=False, allow_infinity=False)
    | st.text(max_size=12),
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(st.text(max_size=8), children, max_size=4),
    max_leaves=12,
)


@given(st.dictionaries(st.text(max_size=8), json_values, max_size=5))
@settings(max_examples=200, deadline=None)
def test_struct_roundtrip_property(details):
    """Any JSON-shaped dict survives Struct encode -> wire -> decode, with
    ints coerced to doubles (the Struct number_value rule) and duplicate
    keys impossible by construction."""
    import json

    from logstash_codec_protobuf_spark.functions.wire import (
        py_field_len, py_field_string, py_struct,
    )

    raw = py_field_string(1, "u") + py_field_len(2, py_struct(details))
    d = W.py_decode(raw, REG, "send_json_request")
    got = json.loads(d["details"])

    def canon(v):
        if isinstance(v, bool) or v is None or isinstance(v, str):
            return v
        if isinstance(v, (int, float)):
            return float(v)
        if isinstance(v, list):
            return [canon(x) for x in v]
        return {k: canon(x) for k, x in v.items()}

    assert got == canon(details)


@given(st.text(max_size=10), st.text(max_size=10), st.text(max_size=10),
       st.integers(min_value=0, max_value=120))
@settings(max_examples=150)
def test_human_lineage_roundtrip_property(me, mom, grandma, age):
    from logstash_codec_protobuf_spark.functions.wire import (
        py_field_len, py_field_string, py_field_varint,
    )

    gm = py_field_string(1, grandma) + py_field_varint(6, age)
    mother = py_field_string(1, mom) + py_field_len(4, gm)
    raw = py_field_string(1, me) + py_field_len(4, mother)
    d = W.py_decode(raw, REG, "human", proto_version=2)
    assert d["first_name"] == me
    assert d["mother"]["first_name"] == mom
    assert d["mother"]["mother"]["first_name"] == grandma
    assert d["mother"]["mother"]["age"] == age


# ---------------------------------------------------------------------------
# generic registry-driven encoder (py_encode) against the wire parser
# ---------------------------------------------------------------------------

unicorn_values = st.fixed_dictionaries({
    "name": st.text(max_size=12),
    "age": st.integers(min_value=0, max_value=500),
    "fur_colour": st.integers(min_value=0, max_value=6),
    "favourite_colours": st.lists(
        st.integers(min_value=0, max_value=6), max_size=5),
    "favourite_numbers": st.lists(
        st.integers(min_value=0, max_value=2**31 - 1), max_size=5),
    "is_pegasus": st.booleans(),
})


@given(unicorn_values)
@settings(max_examples=200, deadline=None)
def test_generic_encoder_unicorn_roundtrip(v):
    """py_encode (generic, registry-driven) -> py_decode reproduces every
    field incl. PACKED repeated enums/ints and a nested mother message."""
    value = dict(v)
    value["mother"] = {"name": "mom", "age": 3}
    raw = W.py_encode(value, REG, "unicorn")
    d = W.py_decode(raw, REG, "unicorn")
    assert d["name"] == v["name"] and d["age"] == v["age"]
    assert d["fur_colour"] == REG.enums["Colour"].name_of(v["fur_colour"])
    assert d["favourite_colours"] == [
        REG.enums["Colour"].name_of(c) for c in v["favourite_colours"]]
    assert d["favourite_numbers"] == v["favourite_numbers"]
    assert d["is_pegasus"] == v["is_pegasus"]
    assert d["mother"]["name"] == "mom" and d["mother"]["age"] == 3


@given(st.dictionaries(st.text(min_size=1, max_size=8),
                       st.integers(min_value=0, max_value=2**31 - 1),
                       max_size=6))
@settings(max_examples=150)
def test_generic_encoder_map_roundtrip(m):
    raw = W.py_encode({"name": "n", "phone_numbers": m}, REG, "contact")
    d = W.py_decode(raw, REG, "contact")
    assert d["phone_numbers"] == m


def test_generic_encoder_matches_handwritten_turn():
    """The generic encoder must emit byte-identical wire to the
    hand-written turn encoder for non-oneof fields."""
    v = {"conv_id": "c9", "turn_idx": 7, "role": "user", "tool": "sql",
         "colour": 2, "cents": -55, "msg": "hello"}
    generic = W.py_encode(v, REG, "turn_wire")
    hand = W.py_encode_turn(dict(v, body_type=None))
    assert generic == hand


def test_generic_encoder_oneof_default_winner():
    """oneof members are emitted even at 0 when present (chosen-member
    rule); absent members are omitted."""
    raw = W.py_encode({"conv_id": "c", "horn": 0}, REG, "turn_wire")
    d = W.py_decode(raw, REG, "turn_wire")
    assert d["horn"] == 0 and d["wings"] is None
    assert d["_pb_oneof"] == {"body": "horn"}
