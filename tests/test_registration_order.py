"""Pin the driver-facing registration order of the query registry.

The driver's CORRECTNESS report covers exactly the first 50 names returned by
``queries()`` — so window membership is a correctness-evidence decision, made
explicit in ``queries._FRONT`` / ``queries._TAIL`` (round-3 verdict item 1;
rotated each round so every query lands in some round's window).

Round-7 rotation (round-6 verdict item 5): the window is the COMPLEMENT of
r6's 50 — the round-7 queries (never driver-checked) plus ivf_seed_scalable
(r6 row was err=no_oracle; its new exact oracle gets its first driver check),
the 31 queries whose last green row is r5 (out for exactly one round), and
16 r6-green queries whose decode paths round-7 code changes touch (enum
int32 truncation + decimal-string passthrough, recursive WireDecodeRow,
map-entry descriptor synthesis).
"""

from logstash_codec_protobuf_spark import queries as Q

# Never driver-checked (new in round 7) or never ORACLE-checked
# (ivf_seed_scalable's only r6 row was err=no_oracle — round 7 is its first
# real rows+schema+hash check).
R7_NEW = ["ivf_seed_scalable", "pb_wire_map_entries_jvmdyn",
          "pb_wire_repeated_message_jvmdyn", "pb_wire_float_double_vec"]

# Last green row is CORRECTNESS_r05.json — these sat out r6's window under
# the rotation policy (they were r6's _TAIL) and must return in r7.
R5_ONLY = [
    "ivf_topk", "ivf_seed_farthest", "dedup_exact", "dedup_clusters_star",
    "parse_good", "dead_letter", "enum_symbolize",
    "pb2_enum_passthrough", "oneof_xor", "enrich_turns", "route_counts",
    "conv_stats", "hourly_stats", "turn_order", "conv_first_last",
    "encode_roundtrip", "encode_autoconvert", "stream_sessionize",
    "encode_strict_discard", "ivf_assign", "ivf_refine_assign",
    "ann_cosine_topk", "ann_lsh_topk", "embedding_neardup", "pb_wire_rum",
    "pb_wire_struct", "pb_wire_uint64_bytes", "pb_wire_float_double",
    "pb_wire_nested_repeated", "pb_wire_repeated_message",
    "pb_wire_directory",
]

# Frozen from CORRECTNESS_r06.json at round-7 start: every query with a green
# r6 driver row. _TAIL must draw only from this set — a fresh green row is
# what earns rotation past the window.
R6_GREEN = {
    "pb_wire_decode_jvmdyn", "audio_decode_real", "image_decode_real",
    "image_resize_real", "minhash_oversize_buckets", "tpch_q5_local_supply",
    "multimodal_frames", "multimodal_resize", "role_cents_quantiles",
    "role_tool_setops", "tpch_q3_shipping", "tpch_q7_volume",
    "multimodal_features", "session_stats", "role_sink_matrix",
    "conv_tool_diversity", "nested_json_decode", "tpch_q1_pricing",
    "tpch_join_topn", "stream_hourly_counts", "oneof_metainfo_off",
    "pb2_wire_repeated_enum", "pb_schema_multifile_decode",
    "oneof_three_option", "oneof_array_elements", "json_struct_decode",
    "json_variant_nested", "text_stats", "lang_id", "doc_fingerprint",
    "stream_dedup", "pb_wire_decode", "pb_wire_roundtrip", "pb_wire_encode",
    "pb_wire_dead_letter", "pb_schema_file_decode", "pb2_wire_roundtrip",
    "pb2_wire_lineage", "stream_wire_counts", "pb_wire_map_entries",
    "minhash_pairs", "simhash_neardup", "ngram_jaccard_pairs",
    "dedup_clusters", "dedup_survivors", "minhash_pairs_star",
    "minhash_bands", "simhash", "simhash_weighted",
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


def test_new_queries_lead_the_window():
    assert Q._FRONT[: len(R7_NEW)] == R7_NEW


def test_r5_only_queries_inside_driver_window():
    """The rotation promise: queries whose last green row is two rounds old
    must come back into the window."""
    window = list(Q.all_queries())[:50]
    missing = [n for n in R5_ONLY if n not in window]
    assert not missing, f"outside the driver's 50-entry window: {missing}"


def test_every_query_has_an_oracle_and_order_matches():
    qs = Q.all_queries()
    os = Q.all_oracles()
    assert set(os) <= set(qs)
    # oracle_sql() iterates in the same order as queries()
    order = [n for n in qs if n in os]
    assert list(os) == order
    # since round 7 EVERY query has an exact oracle (ivf_seed_scalable was
    # the last rows-only holdout)
    no_oracle = set(qs) - set(os)
    assert not no_oracle, no_oracle


def test_tail_rotation_is_only_r6_green():
    assert set(Q._TAIL) <= R6_GREEN, sorted(set(Q._TAIL) - R6_GREEN)


def test_every_query_is_front_or_tail():
    """No query may drift in the unmanaged middle: window membership is an
    explicit decision every round."""
    placed = set(Q._FRONT) | set(Q._TAIL)
    drifting = [n for n in Q.all_queries() if n not in placed]
    assert not drifting, drifting
