"""Tag-based fan-out routing to per-sink tables.

The codec's "fan-out" is its error branch: good events yield to the pipeline,
failures become substitute events tagged `_protobufdecodefailure`
(protobuf.rb:224,229-233). The engine generalizes this to N sinks driven by the
`tools.sink` dictionary column, with the dead-letter sink as one more route.

Scale design (north_rule): the routed write is the job's one big shuffle, so it
is made EXPLICIT — ``repartition(route_partitions, "sink", salt)`` right before
the write. The salt spreads each sink's rows over many tasks (a sink is a
low-cardinality hot key by construction; without the salt all of sink_b lands in
one task at 100 TB). `partitionBy("sink")` on the writer then lays files out per
sink directory. A single ``persist`` lets good/dead flows share the parse stage
instead of re-reading the source per sink (single-pass multi-sink fan-out,
SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import CodecConfig, DEAD_LETTER_SINK


def assign_sink(df: DataFrame, cfg: CodecConfig | None = None) -> DataFrame:
    """Resolve each row's destination sink: dictionary sink for enriched rows,
    dead_letter for unmatched tools (keep-don't-drop, protobuf.rb:229-233)."""
    return df.withColumn("sink", F.coalesce(F.col("sink"), F.lit(DEAD_LETTER_SINK)))


def route_all(parsed_enriched: DataFrame) -> DataFrame:
    """Single-pass routing: every parsed+enriched row (good OR failed) gets its
    sink in one scan — failed parses to dead_letter, good rows to their
    dictionary sink, unmatched dictionary keys to dead_letter.

    This replaces the good/dead union shape, which costs a SECOND full scan of
    the parse pipeline (each union branch re-reads the source) — at 100 TB
    that's the difference between one pass and two.
    """
    p = F.col("parsed")
    return parsed_enriched.select(
        F.col("conv_id"), F.col("turn_idx"), F.col("ts"), F.col("text"),
        F.when(p["error"].isNull(), F.col("tool")).alias("tool"),
        F.when(p["error"].isNull(), p["cents"]).alias("cents"),
        p["error"].alias("decoder_exception"),
        F.when(p["error"].isNotNull(), F.lit(DEAD_LETTER_SINK))
        .otherwise(F.coalesce(F.col("sink"), F.lit(DEAD_LETTER_SINK)))
        .alias("sink"),
    )


def route_counts(good: DataFrame, dead: DataFrame) -> DataFrame:
    """Per-sink routed-row counts — the correctness invariant the north star
    pins against the reference fixtures. Partial aggregation (map-side combine)
    makes this a tiny shuffle regardless of input size."""
    g = good.groupBy("sink").agg(F.count(F.lit(1)).alias("n_rows"))
    d = dead.select(F.lit(DEAD_LETTER_SINK).alias("sink")).groupBy("sink").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    return g.unionByName(d).groupBy("sink").agg(F.sum("n_rows").alias("n_rows"))


def _murmur3_int(x: int, seed: int = 42) -> int:
    """Spark's ``Murmur3_x86_32.hashInt`` (the hash Catalyst
    ``HashPartitioning`` applies to a single INT expression, seed 42),
    reimplemented for driver-side probe search. Returns the SIGNED int32
    Spark produces."""
    m = 0xffffffff
    k = (x & m) * 0xcc9e2d51 & m
    k = ((k << 15) | (k >> 17)) & m
    k = k * 0x1b873593 & m
    h = (seed & m) ^ k
    h = ((h << 13) | (h >> 19)) & m
    h = (h * 5 + 0xe6546b64) & m
    h ^= 4  # fmix with total byte length 4
    h ^= h >> 16
    h = h * 0x85ebca6b & m
    h ^= h >> 13
    h = h * 0xc2b2ae35 & m
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def partition_probe_values(n: int) -> list[int]:
    """probe[p] = the smallest int x with pmod(murmur3(x), n) == p.

    ``repartition(n, probe_col)`` then places a row carrying probe[p] in
    EXACTLY partition p — a deterministic partition assignment the
    DataFrame API otherwise cannot express. Coupon-collector search,
    ~n*ln(n) murmur evaluations, driver-side, microseconds at any
    realistic partition count."""
    probes: list[int | None] = [None] * n
    found, x = 0, 0
    while found < n:
        p = _murmur3_int(x) % n
        if probes[p] is None:
            probes[p] = x
            found += 1
        x += 1
    return probes  # type: ignore[return-value]


def probe_repartition(df: DataFrame, n: int, group_idx,
                      n_groups: int, conv_col: str = "conv_id",
                      combos_per_partition: int = 4) -> DataFrame:
    """Deterministically balanced pre-write repartition (round-6 verdict
    item 1 — the 8->32 e2e scaling gap).

    Hash-partitioning a SMALL categorical key space (group x salt combos)
    into n tasks is a murmur3 LOTTERY: measured on 20M turns at local[32],
    the same mass distribution landed anywhere between 22.6s and 57.9s
    depending only on which literal salt values happened to collide
    (BENCH/e2e_decompose_r7*.md — 80-combo layouts at both extremes, and a
    16x-oversized combo space still paid 1.23x over the lucky layout).

    This bypasses the lottery: rows are salted into
    ``combos = n_groups * s`` combos (``s`` sized so combos ~=
    combos_per_partition * n), each combo is assigned round-robin to a
    partition slot, and the slot is materialized as a PROBE INTEGER whose
    murmur3 lands in exactly that partition (``partition_probe_values``).
    Result, at ANY parallelism: every partition holds
    ~combos_per_partition combos from DIFFERENT interleaved groups (mass
    averaging), no partition is empty, and each task writes at most
    ~combos_per_partition files — balance AND file count both bounded by
    construction, not by hash luck."""
    import math

    s = max(1, math.ceil(combos_per_partition * n / max(n_groups, 1)))
    salt = F.pmod(F.xxhash64(F.col(conv_col), F.lit("wsalt")), F.lit(s))
    combo = group_idx * F.lit(s) + salt
    slot = F.pmod(combo, F.lit(n)).cast("int")
    probes = F.array(*[F.lit(int(p)) for p in partition_probe_values(n)])
    pkey = F.element_at(probes, slot + F.lit(1)).cast("int")
    return (
        df.withColumn("_pkey", pkey)
        .repartition(n, F.col("_pkey"))
        .drop("_pkey")
    )


def adaptive_salt_buckets(n_partitions: int, n_groups: int,
                          floor: int) -> int:
    """Salt width for a keyed pre-write repartition, scaled with target
    parallelism (round-6 verdict item 1 — the 8->32 e2e gap).

    Hash-partitioning k distinct (group, salt) combos into n tasks is
    balls-in-bins: with the old fixed salt, 160 combos into 32 tasks put
    ~2x the mean mass on the slowest task (measured: the fan-out wave ran
    46.3s vs 22.6s with adequate salt at local[32] on 20M turns,
    BENCH/e2e_decompose_r7.md) while 8 tasks saw only ~1.3x — an imbalance
    that GROWS with parallelism and silently caps scaling. Sizing combos to
    >= 16x the partition count keeps the expected max-bin mass within a few
    percent of the mean at any executor count, while files per group
    directory stay bounded at the salt width."""
    import math

    return max(floor, math.ceil(16 * n_partitions / max(n_groups, 1)))


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath (cluster
    deployments add ``org.apache.iceberg:iceberg-spark-runtime``)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def fan_out(
    df: DataFrame,
    base_path: str | None = None,
    cfg: CodecConfig | None = None,
    mode: str = "append",
    table: str | None = None,
) -> None:
    """Write rows to per-sink storage in ONE pass.

    Two sinks behind the same shuffle plan:

    - ``table`` set: DataFrameWriterV2 (``writeTo``) against a catalog table
      — the Iceberg path at cluster scale (north star names Iceberg; any V2
      catalog satisfies the API, so the seam is exercised in the sandbox via
      the built-in session catalog). First write creates the table
      partitioned by sink; later writes append through the table's own
      partition spec.
    - otherwise: parquet ``partitionBy("sink")`` directories at
      ``base_path`` — identical layout and shuffle behavior.
    """
    cfg = cfg or CodecConfig()
    n = int(cfg.route_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    ))
    sink_pos = F.array_position(
        F.array(*[F.lit(s) for s in cfg.sinks]), F.col("sink")) - F.lit(1)
    routed = probe_repartition(df, n, sink_pos, len(cfg.sinks))
    if table is not None:
        spark = routed.sparkSession
        if mode == "overwrite":
            routed.writeTo(table).partitionedBy(F.col("sink")) \
                .createOrReplace()
            return
        if not spark.catalog.tableExists(table):
            routed.writeTo(table).partitionedBy(F.col("sink")).create()
            return
        try:
            routed.writeTo(table).append()
        except Exception:
            # V1 session-catalog tables don't implement the V2 append
            # capability (Iceberg does) — same rows, same partition layout
            # through the V1 writer
            routed.write.mode("append").partitionBy("sink") \
                .saveAsTable(table)
        return
    if base_path is None:
        raise ValueError("fan_out needs either base_path or table")
    routed.write.mode(mode).partitionBy("sink").parquet(base_path)
