"""Pin the driver-facing registration order of the query registry.

The driver's CORRECTNESS report covers exactly the first 50 names returned by
``queries()`` — so window membership is a correctness-evidence decision, made
explicit in ``queries._FRONT`` / ``queries._TAIL`` (round-3 verdict item 1).
"""

from logstash_codec_protobuf_spark import queries as Q

# Queries the round-3 verdict flagged as driver-unreported; every one of them
# must sit inside the 50-entry window this round.
R3_UNREPORTED = [
    "ivf_refine_assign", "multimodal_frames", "multimodal_resize",
    "multimodal_features", "session_stats", "role_sink_matrix",
    "conv_tool_diversity", "nested_json_decode", "tpch_q1_pricing",
    "tpch_join_topn", "tpch_q5_local_supply", "role_cents_quantiles",
    "role_tool_setops", "tpch_q3_shipping", "tpch_q7_volume",
]


def test_front_and_tail_reference_real_queries():
    names = set(Q.all_queries())
    assert set(Q._FRONT) <= names
    assert set(Q._TAIL) <= names
    assert not set(Q._FRONT) & set(Q._TAIL)


def test_unreported_queries_inside_driver_window():
    window = list(Q.all_queries())[:50]
    missing = [n for n in R3_UNREPORTED if n not in window]
    assert not missing, f"outside the driver's 50-entry window: {missing}"


def test_q5_leads():
    # The only query whose last driver observation was a hash FAIL goes first.
    assert next(iter(Q.all_queries())) == "tpch_q5_local_supply"


def test_every_query_has_an_oracle_and_order_matches():
    qs = Q.all_queries()
    os = Q.all_oracles()
    assert set(os) <= set(qs)
    # oracle_sql() iterates in the same order as queries()
    order = [n for n in qs if n in os]
    assert list(os) == order


def test_tail_rotation_is_only_double_green():
    # _TAIL entries must be queries green in BOTH r2 and r3 driver reports
    # (list frozen from CORRECTNESS_r02/r03.json at round-4 start).
    double_green = {
        "ann_cosine_topk", "ann_lsh_topk", "conv_first_last", "conv_stats",
        "dead_letter", "dedup_exact", "doc_fingerprint", "embedding_neardup",
        "encode_autoconvert", "encode_roundtrip", "enrich_turns",
        "enum_symbolize", "hourly_stats", "ivf_assign", "ivf_topk",
        "json_struct_decode", "json_variant_nested", "lang_id",
        "minhash_bands", "minhash_pairs", "ngram_jaccard_pairs",
        "oneof_array_elements", "oneof_three_option", "oneof_xor",
        "parse_good", "pb2_enum_passthrough", "pb2_wire_roundtrip",
        "pb_schema_file_decode", "pb_wire_dead_letter", "pb_wire_decode",
        "pb_wire_encode", "pb_wire_map_entries", "pb_wire_roundtrip",
        "route_counts", "simhash", "simhash_neardup", "text_stats",
        "turn_order",
    }
    assert set(Q._TAIL) <= double_green
