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
