"""Pin the driver-facing registration order of the query registry.

The driver's CORRECTNESS report covers exactly the first 50 names returned by
``queries()`` — so window membership is a correctness-evidence decision, made
explicit in ``queries._FRONT`` / ``queries._TAIL`` (round-3 verdict item 1;
rotated each round so every query lands in some round's window).

Round-5 rotation (round-4 verdict item 1): the window is the COMPLEMENT of
r4's 50 — ``dedup_clusters_star`` (never driver-checked) plus the 20 queries
whose last green row is r3, plus the new r5 queries, plus r4-green queries
whose operators round-5 code changes touch.
"""

from logstash_codec_protobuf_spark import queries as Q

# Never driver-checked before r5, or last green in r3 with code changed
# underneath by the r4 wire-interpreter fast path / kernel rewrites.
R4_UNREPORTED = [
    "dedup_clusters_star",
    "pb_wire_roundtrip", "pb_wire_decode", "pb_wire_encode",
    "pb_wire_map_entries", "parse_good", "dead_letter", "enum_symbolize",
    "pb2_enum_passthrough", "oneof_xor", "enrich_turns", "route_counts",
    "conv_stats", "hourly_stats", "turn_order", "conv_first_last",
    "encode_roundtrip", "encode_autoconvert", "pb_schema_file_decode",
    "pb2_wire_roundtrip", "pb_wire_dead_letter",
]

# Frozen from CORRECTNESS_r04.json at round-5 start: every query with a green
# r4 driver row. _TAIL must draw only from this set — a fresh green row is
# what earns rotation past the window.
R4_GREEN = {
    "tpch_q5_local_supply", "ivf_refine_assign", "multimodal_frames",
    "multimodal_resize", "role_cents_quantiles", "role_tool_setops",
    "tpch_q3_shipping", "tpch_q7_volume", "multimodal_features",
    "session_stats", "role_sink_matrix", "conv_tool_diversity",
    "nested_json_decode", "tpch_q1_pricing", "tpch_join_topn",
    "dedup_clusters", "dedup_survivors", "pb2_wire_lineage",
    "pb_wire_directory", "pb_wire_float_double", "pb_wire_nested_repeated",
    "pb_wire_repeated_message", "pb_wire_rum", "pb_wire_struct",
    "pb_wire_uint64_bytes", "simhash_weighted", "stream_hourly_counts",
    "stream_wire_counts", "oneof_metainfo_off", "pb2_wire_repeated_enum",
    "pb_schema_multifile_decode", "oneof_three_option",
    "oneof_array_elements", "json_struct_decode", "json_variant_nested",
    "text_stats", "lang_id", "doc_fingerprint", "dedup_exact",
    "ngram_jaccard_pairs", "minhash_bands", "minhash_pairs", "simhash",
    "simhash_neardup", "ann_cosine_topk", "embedding_neardup",
    "ann_lsh_topk", "ivf_assign", "ivf_topk", "ivf_seed_farthest",
}


def test_front_and_tail_reference_real_queries():
    names = set(Q.all_queries())
    assert set(Q._FRONT) <= names, sorted(set(Q._FRONT) - names)
    assert set(Q._TAIL) <= names, sorted(set(Q._TAIL) - names)
    assert not set(Q._FRONT) & set(Q._TAIL)


def test_window_is_exactly_front():
    """Window math: _FRONT must hold exactly 50 defined queries, so any query
    added later without a _FRONT entry lands safely PAST the window instead
    of silently evicting entry #50."""
    order = list(Q.all_queries())
    assert order[:50] == Q._FRONT
    assert len(Q._FRONT) == 50


def test_unreported_queries_inside_driver_window():
    window = list(Q.all_queries())[:50]
    missing = [n for n in R4_UNREPORTED if n not in window]
    assert not missing, f"outside the driver's 50-entry window: {missing}"


def test_star_contraction_leads():
    # The only query never checked by any driver round goes first.
    assert next(iter(Q.all_queries())) == "dedup_clusters_star"


def test_every_query_has_an_oracle_and_order_matches():
    qs = Q.all_queries()
    os = Q.all_oracles()
    assert set(os) <= set(qs)
    # oracle_sql() iterates in the same order as queries()
    order = [n for n in qs if n in os]
    assert list(os) == order


def test_tail_rotation_is_only_r4_green():
    assert set(Q._TAIL) <= R4_GREEN, sorted(set(Q._TAIL) - R4_GREEN)
