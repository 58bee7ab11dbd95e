"""Pin the driver-facing registration order of the query registry.

The driver's CORRECTNESS report covers exactly the first 50 names returned by
``queries()`` — so window membership is a correctness-evidence decision, made
explicit in ``queries._FRONT`` / ``queries._TAIL`` (round-3 verdict item 1;
rotated each round so every query lands in some round's window).

Round-8 rotation (round-7 verdict item 6): the window is the COMPLEMENT of
r7's 50 — the 34 r7-_TAIL names whose last driver-green row is r6 (out for
exactly one round under the rotation policy), plus 16 r7-green queries whose
code paths the round-8 optimization changes touch (split-based native parse;
fused fingerprint kernels, packed shingles and single-probe contraction in
dedup.py; numpy bucket/nrm kernels and the bucket-block pair scorer in
similarity.py).
"""

from logstash_codec_protobuf_spark import queries as Q

# Last green driver row is CORRECTNESS_r06.json — these sat out r7's window
# under the rotation policy (they were r7's _TAIL) and must return in r8.
R6_ONLY = [
    "audio_decode_real", "image_decode_real", "image_resize_real",
    "minhash_oversize_buckets", "tpch_q5_local_supply", "multimodal_frames",
    "multimodal_resize", "role_cents_quantiles", "role_tool_setops",
    "tpch_q3_shipping", "tpch_q7_volume", "multimodal_features",
    "session_stats", "role_sink_matrix", "conv_tool_diversity",
    "nested_json_decode", "tpch_q1_pricing", "tpch_join_topn",
    "stream_hourly_counts", "text_stats", "lang_id", "doc_fingerprint",
    "stream_dedup", "minhash_pairs", "simhash_neardup",
    "ngram_jaccard_pairs", "dedup_clusters", "dedup_survivors",
    "minhash_pairs_star", "minhash_bands", "simhash", "simhash_weighted",
    "json_variant_nested", "json_struct_decode",
]

# r7-green queries whose code round-8 touches — the re-check slots.
R8_TOUCHED = [
    "dedup_clusters_star", "embedding_neardup", "ann_lsh_topk",
    "ann_cosine_topk", "parse_good", "dead_letter", "enrich_turns",
    "route_counts", "conv_stats", "hourly_stats", "encode_roundtrip",
    "encode_autoconvert", "oneof_xor", "enum_symbolize", "conv_first_last",
    "turn_order",
]

# Frozen from CORRECTNESS_r07.json at round-8 start: every query with a green
# r7 driver row. _TAIL must draw only from this set — a fresh green row is
# what earns rotation past the window.
R7_GREEN = {
    "ivf_seed_scalable", "pb_wire_map_entries_jvmdyn",
    "pb_wire_repeated_message_jvmdyn", "pb_wire_float_double_vec",
    "ivf_topk", "ivf_seed_farthest", "dedup_exact", "dedup_clusters_star",
    "parse_good", "dead_letter", "enum_symbolize", "pb2_enum_passthrough",
    "oneof_xor", "enrich_turns", "route_counts", "conv_stats",
    "hourly_stats", "turn_order", "conv_first_last", "encode_roundtrip",
    "encode_autoconvert", "stream_sessionize", "encode_strict_discard",
    "ivf_assign", "ivf_refine_assign", "ann_cosine_topk", "ann_lsh_topk",
    "embedding_neardup", "pb_wire_rum", "pb_wire_struct",
    "pb_wire_uint64_bytes", "pb_wire_float_double",
    "pb_wire_nested_repeated", "pb_wire_repeated_message",
    "pb_wire_directory", "pb_wire_decode", "pb_wire_roundtrip",
    "pb_wire_encode", "pb_wire_decode_jvmdyn", "pb_wire_dead_letter",
    "pb_schema_file_decode", "pb_schema_multifile_decode",
    "pb2_wire_roundtrip", "pb2_wire_lineage", "pb2_wire_repeated_enum",
    "stream_wire_counts", "pb_wire_map_entries", "oneof_metainfo_off",
    "oneof_three_option", "oneof_array_elements",
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


def test_r6_only_queries_lead_the_window():
    """The rotation promise: queries whose last green driver row is two
    rounds old must come back into the window, ahead of the re-checks."""
    assert Q._FRONT[: len(R6_ONLY)] == R6_ONLY


def test_r8_touched_queries_inside_driver_window():
    window = list(Q.all_queries())[:50]
    missing = [n for n in R8_TOUCHED if n not in window]
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


def test_tail_rotation_is_only_r7_green():
    assert set(Q._TAIL) <= R7_GREEN, sorted(set(Q._TAIL) - R7_GREEN)


def test_every_query_is_front_or_tail():
    """No query may drift in the unmanaged middle: window membership is an
    explicit decision every round."""
    placed = set(Q._FRONT) | set(Q._TAIL)
    drifting = [n for n in Q.all_queries() if n not in placed]
    assert not drifting, drifting
