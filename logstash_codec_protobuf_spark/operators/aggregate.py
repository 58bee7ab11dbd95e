"""Per-conversation and windowed aggregates.

The reference has no aggregation (SURVEY.md §2.7); the north star adds
per-conversation and per-sink aggregates over 10^12 turns. Everything here is
native hash aggregation — Catalyst plans partial (map-side) + final agg
automatically, so the shuffle carries only one row per (group, partition).

Skew: `conv-hot` style conversations concentrate a large fraction of rows on one
key. ``conv_stats_salted`` pre-aggregates on (conv_id, salt) — the hot key's
work spreads over ``salt_buckets`` tasks — then combines the partials. The
combine step moves #convs × #buckets tiny rows, not data. AQE's skew-join
handling covers joins; agg skew needs this explicit two-phase shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..config import CodecConfig

_STATS = lambda: [  # noqa: E731
    F.count(F.lit(1)).alias("n_turns"),
    F.max("turn_idx").alias("max_turn"),
    F.sum("cents").alias("sum_cents"),
]


def conv_stats(df: DataFrame) -> DataFrame:
    """groupBy(conv_id) baseline — fine when no key dominates."""
    return df.groupBy("conv_id").agg(*_STATS())


def conv_stats_salted(df: DataFrame, cfg: CodecConfig | None = None) -> DataFrame:
    """Two-phase salted aggregate, result-identical to ``conv_stats``.

    Phase 1 groups on (conv_id, crc32(turn_idx) % buckets): the hot conversation
    fans over `buckets` reducers. Phase 2 merges partials per conv_id —
    count→sum, max→max, sum→sum (all algebraic, so the rewrite is exact).
    """
    cfg = cfg or CodecConfig()
    salt = (F.crc32(F.col("turn_idx").cast("string")) % cfg.salt_buckets)
    partial = (
        df.withColumn("_salt", salt)
        .groupBy("conv_id", "_salt")
        .agg(*_STATS())
    )
    return partial.groupBy("conv_id").agg(
        F.sum("n_turns").alias("n_turns"),
        F.max("max_turn").alias("max_turn"),
        F.sum("sum_cents").alias("sum_cents"),
    )


def hourly_stats(df: DataFrame) -> DataFrame:
    """Tumbling-hour aggregates (batch twin of the streaming windowed agg).

    Uses date_trunc — semantically F.window(ts, '1 hour').start, but shared
    with the DuckDB oracle dialect."""
    return (
        df.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("sink"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )


def turn_order_check(df: DataFrame) -> DataFrame:
    """Stable-turn-ordering invariant (input_hint: per-turn text equality under
    stable (conv_id, turn_idx) ordering): recompute each row's rank within its
    conversation and surface it with the text, so the oracle can verify the
    ordering is total and the text matches turn-by-turn."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return df.select(
        "conv_id", "turn_idx", "text",
        F.row_number().over(w).cast("int").alias("turn_rank"),
    )


def sessionize(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based session assignment within each conversation: a turn more than
    `gap_minutes` after its predecessor starts a new session. The lag +
    running-sum shape shuffles once on conv_id and sorts within partitions —
    the canonical sessionization plan (no state store needed in batch;
    streaming uses the watermarked window twin)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # integer microseconds: identical arithmetic in the DuckDB oracle
    # (epoch_us), no float timestamps. ts arrives as TIMESTAMP_NTZ from
    # parquet; the cast interprets it in the (UTC-pinned) session zone,
    # matching DuckDB's naive-timestamp epoch.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    new_session = F.when(gap > gap_minutes * 60 * 1_000_000, 1).otherwise(0)
    seq = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn("session_seq", seq.cast("int"))


def session_stats(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-(conversation, session) stats over the sessionized frame."""
    s = sessionize(df, gap_minutes)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return s.groupBy("conv_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
    )


def conv_first_last(df: DataFrame) -> DataFrame:
    """First/last message per conversation via ordered aggregation —
    max_by/min_by avoid a full window sort (single hash agg, no per-partition
    sort at 100 TB)."""
    return df.groupBy("conv_id").agg(
        F.min_by("text", "turn_idx").alias("first_text"),
        F.max_by("text", "turn_idx").alias("last_text"),
        F.count(F.lit(1)).alias("n_turns"),
    )
