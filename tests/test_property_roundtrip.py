"""Property-based round-trip: parse(serialize(x)) == x for arbitrary payloads
(hypothesis over the wire-format value space) — the reference's round-trip
oracle pattern (spec/codecs/pb3_encode_spec.rb:25-41) generalized from literal
fixtures to generated ones. Also: arrays-of-oneofs normalization."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row, functions as F

from logstash_codec_protobuf_spark.operators.encode import serialize_turns
from logstash_codec_protobuf_spark.operators.normalize import (
    oneof_clean_elements, oneof_meta_per_element,
)
from logstash_codec_protobuf_spark.operators.parse import parse_turns

# field alphabets mirror the wire grammar: conv/role/tool exclude '|' and '=',
# msg is the trailing field so it may contain ANYTHING (including '|')
_ident = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="|=\n\r",
                           min_codepoint=33),
    min_size=1, max_size=12,
)
_msg = st.text(
    alphabet=st.characters(codec="ascii", min_codepoint=32),
    max_size=40,
).filter(lambda s: "\n" not in s and "\r" not in s)

payload_fields = st.fixed_dictionaries({
    "conv_id": _ident, "role": _ident, "tool": _ident,
    "turn_idx": st.integers(0, 2**31 - 1),
    "colour": st.integers(0, 6),
    "cents": st.integers(-(2**62), 2**62),
    "body_type": st.sampled_from(["unicorn", "pegasus"]),
    "horn": st.integers(0, 999), "wings": st.integers(0, 999),
    "msg": _msg,
})


@settings(max_examples=30, deadline=None)
@given(st.lists(payload_fields, min_size=1, max_size=8))
def test_parse_inverts_serialize(spark, cases):
    """For any field values, serialize -> parse recovers them exactly —
    including msg containing '|' (it is the trailing capture-all field)."""
    rows = [
        (
            f"PB3|conv={c['conv_id']}|turn={c['turn_idx']}|role={c['role']}"
            f"|tool={c['tool']}|colour={c['colour']}|cents={c['cents']}"
            f"|oneof={c['body_type']}|horn={c['horn']}|wings={c['wings']}"
            f"|msg={c['msg']}",
            c,
        )
        for c in cases
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "text string")
    parsed = parse_turns(df, impl="native").select("text", "parsed.*").collect()
    by_text = {r["text"]: r for r in parsed}
    for text, c in rows:
        got = by_text[text]
        assert got["error"] is None, (text, got["error"])
        for k, v in c.items():
            assert got[k] == v, (k, got[k], v)
    # and the serializer reproduces the exact wire string
    df2 = parse_turns(df, impl="native")
    out = serialize_turns(df2).filter(F.col("payload") != F.col("text"))
    assert out.isEmpty()


def test_oneof_arrays_clean_and_meta(spark):
    """Arrays-of-oneofs: per-element XOR nulling + per-element discriminator
    metadata (pb3_decode_spec.rb:586-639)."""
    df = spark.createDataFrame([Row(contacts=[
        Row(name="a", fax=1, phone=2, prefered_contact="fax"),
        Row(name="b", fax=3, phone=4, prefered_contact="phone"),
    ])])
    cleaned = df.select(
        oneof_clean_elements(
            F.col("contacts"),
            fields=["name", "fax", "phone", "prefered_contact"],
            discriminator_field="prefered_contact",
            options={"fax": "fax", "phone": "phone"},
        ).alias("contacts"),
        oneof_meta_per_element(F.col("contacts"), "prefered_contact")
        .alias("meta"),
    ).collect()[0]
    a, b = cleaned["contacts"]
    assert (a["fax"], a["phone"]) == (1, None)   # fax chosen, phone nulled
    assert (b["fax"], b["phone"]) == (None, 4)   # phone chosen, fax nulled
    assert cleaned["meta"] == ["fax", "phone"]
