"""Physical-plan guards: the properties that keep this engine viable at 100 TB
must not regress silently. Each assertion pins a plan shape, not a timing."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from logstash_codec_protobuf_spark.operators.enrich import enrich
from logstash_codec_protobuf_spark.operators.parse import parse_turns
from logstash_codec_protobuf_spark.operators.route import route_all
from logstash_codec_protobuf_spark.sources.transcripts import transcripts_df

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def tr(spark, tmp_path_factory):
    """Transcripts as a parquet source (so scan-level assertions apply)."""
    path = str(tmp_path_factory.mktemp("plans") / "tr")
    transcripts_df(spark, SF_DIR).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_enrich_uses_broadcast_joins_only(spark, tr):
    """Dictionary joins must broadcast — a sort-merge join here would shuffle
    the full fact table twice at 100 TB."""
    plan = _executed(route_all(enrich(parse_turns(tr), spark, tag_unknown=False)))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_route_counts_has_single_data_shuffle(spark, tr):
    """parse -> enrich -> sink-count: exactly one non-broadcast exchange (the
    partial->final aggregation); everything upstream is pipeline-fused."""
    counts = route_all(
        enrich(parse_turns(tr), spark, tag_unknown=False)
    ).groupBy("sink").count()
    plan = _executed(counts)
    data_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    broadcast_exchanges = len(re.findall(r"BroadcastExchange", plan))
    assert data_exchanges == 1, plan
    assert broadcast_exchanges == 2  # roles + tools dictionaries


def test_parse_scan_prunes_to_referenced_columns(spark, tr):
    """Selecting one parsed field must read ONLY `text` from parquet — the
    struct projection cannot force a full-row scan."""
    pruned = parse_turns(tr).select(F.col("parsed.turn_idx"))
    m = re.search(r"ReadSchema: ([^\n]*)", _executed(pruned))
    assert m and m.group(1).strip() == "struct<text:string>", m


def test_conv_filter_pushed_to_parquet(spark, tr):
    f = tr.filter(F.col("conv_id") == "conv-hot").select("turn_idx")
    plan = _executed(f)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "EqualTo(conv_id,conv-hot)" in m.group(1), plan


def test_salted_agg_partial_before_shuffle(spark, tr):
    """The salted two-phase aggregate must plan partial_ functions (map-side
    combine) under the exchange — the shuffle carries partials, not rows."""
    from logstash_codec_protobuf_spark.operators import aggregate as agg

    good = parse_turns(tr).filter(F.col("parsed.error").isNull()).select(
        "conv_id", "turn_idx", F.col("parsed.cents").alias("cents")
    )
    plan = _executed(agg.conv_stats_salted(good))
    assert "partial_" in plan  # HashAggregate(partial) present


def test_wire_encode_is_pure_columnar(spark, tr):
    """The wire ENCODER must stay entirely JVM-side: no Python eval node of
    any kind — the payload hex is built by expressions fused into the scan."""
    from logstash_codec_protobuf_spark.operators import pb_wire as PW
    from logstash_codec_protobuf_spark.operators.parse import split_dead_letter

    good, _ = split_dead_letter(parse_turns(tr))
    p = F.col("parsed")
    flat = good.select(*[p[c].alias(c) for c in (
        "conv_id", "turn_idx", "role", "tool", "colour", "cents",
        "body_type", "horn", "wings", "msg")])
    plan = _executed(PW.encode_turn_wire(flat))
    assert "EvalPython" not in plan, plan[:500]  # no Batch/ArrowEvalPython


def test_wire_decode_is_arrow_batched(spark, tr):
    """The wire DECODER is the sanctioned Python seam — exactly one
    ArrowEvalPython (vectorized batch exchange), never row-at-a-time
    BatchEvalPython."""
    from logstash_codec_protobuf_spark.operators import pb_wire as PW
    from logstash_codec_protobuf_spark.operators.parse import split_dead_letter

    good, _ = split_dead_letter(parse_turns(tr))
    p = F.col("parsed")
    flat = good.select(*[p[c].alias(c) for c in (
        "conv_id", "turn_idx", "role", "tool", "colour", "cents",
        "body_type", "horn", "wings", "msg")])
    plan = _executed(PW.decode_turn_wire(PW.encode_turn_wire(flat)))
    assert plan.count("ArrowEvalPython") == 1, plan[:500]
    assert "BatchEvalPython" not in plan


def test_segmented_sessionize_windows_on_segment_key(spark, tr):
    """The per-row windows of the segmented sessionizer must partition on
    (conv_id, segment) — partitioning on conv_id alone would reintroduce the
    hot-conversation single-task sort."""
    from logstash_codec_protobuf_spark.operators import aggregate as agg

    plan = _executed(agg.sessionize_segmented(tr))
    assert re.search(r"Window .*partitionBy.*_seg|hashpartitioning\(conv_id[^)]*_seg",
                     plan), plan[:1000]


def test_tpch_q5_broadcasts_dims_and_pushes_date_filter(spark):
    """The 6-table join must broadcast the small dims (region/nation/supplier)
    and push the order-date range to the parquet scan."""
    from logstash_codec_protobuf_spark.queries import tpch_q5_local_supply

    plan = _executed(tpch_q5_local_supply(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2, plan[:800]
    m = re.search(r"PushedFilters: \[([^\]]*GreaterThanOrEqual\(o_orderdate[^\]]*)\]",
                  plan)
    assert m, "o_orderdate range not pushed to scan"


def test_segmented_rank_broadcasts_offsets(spark, tr):
    """turn_order_segmented must (a) window on (conv_id, segment) — never
    conv_id alone — and (b) BROADCAST the per-segment offsets back onto the
    rows: an SMJ there re-sorts the entire input on the join key (measured
    slower than the naive plan it replaces)."""
    from logstash_codec_protobuf_spark.operators import aggregate as agg

    plan = _executed(agg.turn_order_segmented(tr))
    assert "BroadcastHashJoin" in plan, plan[:800]
    assert "SortMergeJoin" not in plan, plan[:800]
    assert re.search(
        r"Window .*partitionBy.*_seg|hashpartitioning\(conv_id[^)]*_seg", plan
    ), plan[:1000]


def test_tpch_q3_pushes_all_three_scan_filters(spark):
    """Q3's segment + both date predicates must reach their parquet scans."""
    from logstash_codec_protobuf_spark.queries import tpch_q3_shipping

    plan = _executed(tpch_q3_shipping(spark, SF_DIR))
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    assert re.search(r"LessThan\(o_orderdate", plan), "orders date not pushed"
    assert re.search(r"GreaterThan\(l_shipdate", plan), "ship date not pushed"
    assert "SortMergeJoin" not in plan


def test_tpch_q7_broadcasts_nation_pair(spark):
    """Q7's two 2-row nation dims must broadcast; the ship-date range must
    reach the lineitem scan."""
    from logstash_codec_protobuf_spark.queries import tpch_q7_volume

    plan = _executed(tpch_q7_volume(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3, plan[:800]
    assert re.search(r"GreaterThanOrEqual\(l_shipdate", plan)


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    """The 100 TB co-location lever: both join sides written bucketBy the
    join key -> the sort-merge join reads pre-bucketed files and plans NO
    exchange. This is the layout fan-in tables use at warehouse scale
    (SURVEY 4: partition/bucket pruning built-ins)."""
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    import shutil
    shutil.rmtree("spark-warehouse/b_orders", ignore_errors=True)
    shutil.rmtree("spark-warehouse/b_lineitem", ignore_errors=True)
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    ln = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .saveAsTable("b_orders"))
    (ln.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .saveAsTable("b_lineitem"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).groupBy("o_orderstatus").count()
        plan = _executed(joined)
        # the JOIN itself must not shuffle either side; the only exchange
        # allowed is the final aggregation's
        assert "SortMergeJoin" in plan, plan[:1200]
        assert "SelectedBucketsCount" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan, plan[:1200]
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan[:1200]
        # and the result is still right
        n = joined.agg(F.sum("count")).first()[0]
        assert n == ln.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cosine_topk_broadcasts_queries_not_corpus(spark):
    """Exact top-k is O(n*q) work but must never put the CORPUS on the
    build/broadcast side, and must cut the scored stream with a partial
    top-k before the q-key window (else q tasks rank q*n rows)."""
    from logstash_codec_protobuf_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _executed(cosine_topk(emb, n_queries=8, k=5))
    # exactly one broadcast: the filtered 8-row query side (vec_id < 8
    # appears under the BroadcastExchange's subtree in the formatted plan)
    assert plan.count("BroadcastExchange") == 1, plan[:1500]
    assert "BroadcastNestedLoopJoin" in plan, plan[:1500]
    # the partial top-k reduction sits between scoring and the window
    assert "MapInPandas" in plan, plan[:1500]
    # window input must be the reduced stream: the plan orders
    # MapInPandas BEFORE the Window operator in execution (bottom-up text:
    # Window appears above/before MapInPandas in toString)
    assert plan.index("Window") < plan.index("MapInPandas"), plan[:1500]


def test_star_edges_plan_has_no_cartesian_and_no_pairwise_blowup(spark):
    """The star-edge candidate graph (round 5) must stay an equi-join plan:
    no CartesianProduct / BroadcastNestedLoopJoin anywhere, and no
    band-frame SELF-join (the all-pairs shape it exists to replace) — its
    joins are bands x bucket-min aggregate and docs x content-group, both
    key-equi."""
    from logstash_codec_protobuf_spark.operators import dedup as DD
    from logstash_codec_protobuf_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = _executed(DD.minhash_star_edges(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_guarded_pairs_excludes_oversize_without_reshuffling_bands(spark):
    """The oversize-bucket guard must attach as a left_anti join against the
    (tiny) oversize-key frame — with AQE it becomes a broadcast anti join,
    never a second full shuffle of the band frame."""
    from logstash_codec_protobuf_spark import cache
    from logstash_codec_protobuf_spark.operators import dedup as DD
    from logstash_codec_protobuf_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    pairs = DD.minhash_pairs(docs)
    # force AQE finalization so the anti-join strategy is the real one
    pairs.count()
    plan = _executed(pairs)
    assert re.search(r"BroadcastHashJoin .*LeftAnti", plan) or \
        "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan
    cache.release_tracked()


# ---------------------------------------------------------------------------
# round-7: deterministic pre-write partition placement (the 8->32 fix)
# ---------------------------------------------------------------------------

def test_murmur3_int_matches_spark_hash(spark):
    """_murmur3_int must replicate Catalyst's Murmur3 for INT columns —
    the probe search is only valid if the driver-side hash is the one
    HashPartitioning applies."""
    from pyspark.sql import functions as F

    from logstash_codec_protobuf_spark.operators.route import _murmur3_int

    rows = (spark.range(0, 500)
            .select(F.col("id").cast("int").alias("x"),
                    F.hash(F.col("id").cast("int")).alias("h")).collect())
    assert all(r["h"] == _murmur3_int(r["x"]) for r in rows)


def test_partition_probe_values_place_exactly(spark):
    """repartition(n, probe[p]) must land rows in EXACTLY partition p —
    the deterministic-placement property the fan-out write relies on
    (BENCH/e2e_decompose_r7*.md: hash placement of small combo spaces is
    a murmur3 lottery; probes bypass it)."""
    from pyspark.sql import functions as F

    from logstash_codec_protobuf_spark.operators.route import (
        partition_probe_values,
    )

    for n in (5, 16, 33):
        probes = partition_probe_values(n)
        assert len(set(probes)) == n
        df = spark.createDataFrame(
            [(p, i) for i, p in enumerate(probes)], "pkey int, slot int")
        got = (df.repartition(n, "pkey")
               .withColumn("pid", F.spark_partition_id()).collect())
        assert all(r["pid"] == r["slot"] for r in got), n


def test_probe_repartition_balance_and_coverage(spark):
    """On a realistic routed frame: no empty partitions, every partition's
    row count within 2x of the mean, and group (sink) content spread —
    the by-construction properties that replaced hash luck."""
    from pyspark.sql import functions as F

    from logstash_codec_protobuf_spark.operators.route import (
        probe_repartition,
    )

    n = 16
    sinks = ["a", "b", "c", "d", "dead_letter"]
    df = (spark.range(0, 20_000)
          .select(F.concat(F.lit("conv-"), (F.col("id") % 997)
                           .cast("string")).alias("conv_id"),
                  F.element_at(F.array(*[F.lit(s) for s in sinks]),
                               (F.col("id") % 5 + 1).cast("int"))
                  .alias("sink")))
    sink_pos = F.array_position(
        F.array(*[F.lit(s) for s in sinks]), F.col("sink")) - F.lit(1)
    out = probe_repartition(df, n, sink_pos, len(sinks))
    sizes = (out.withColumn("pid", F.spark_partition_id())
             .groupBy("pid").count().collect())
    counts = {r["pid"]: r["count"] for r in sizes}
    assert len(counts) == n, f"empty partitions: {set(range(n)) - set(counts)}"
    mean = sum(counts.values()) / n
    assert max(counts.values()) < 2 * mean, counts
