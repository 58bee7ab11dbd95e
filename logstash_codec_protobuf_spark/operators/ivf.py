"""IVF (inverted-file) approximate nearest neighbor over embedding columns.

The second scale path for ANN beside hyperplane LSH (similarity.py): a coarse
quantizer assigns every vector to its nearest centroid (the "inverted list");
a query scores only the vectors in its ``n_probe`` closest lists instead of
the whole corpus — cost O(K + n_probe * corpus/K) per query.

Spark-first shapes:
- the centroid set is tiny (K rows) -> broadcast to every executor;
- assignment is a broadcast cross join + per-vector argmin (window rank over
  K candidate rows — K is constant, so this is a narrow O(n*K) projection);
- at warehouse scale the corpus is written partitioned/bucketed BY
  ``centroid_id`` so a probe is a partition-pruned scan; here it is a
  co-partitioned equi-join on centroid_id.

Determinism: centroids are the first K corpus vectors (vec_id < K) — a plain
data-dependent seed both engines can name — so assignment, probing, and
ranking are all exactly reproducible and the DuckDB oracles compare
rows+schema+hash, same as the LSH path. Lloyd refinement (ivf_refine) is the
Spark-only quality knob: each iteration is one groupBy over (centroid, dim)
— validated by a monotone-inertia pytest rather than an oracle because its
output feeds recall, not a fixed contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .. import cache
from ..functions.portable import DUCK, SPARK
from .similarity import pair_dot as SIM_pair_dot

N_CENTROIDS = 8


def _with_norm(emb: DataFrame, d=SPARK) -> DataFrame:
    return emb.withColumn(
        "nrm", F.expr(f"sqrt({d.dot('embedding', 'embedding')})")
    )


def ivf_assign(emb: DataFrame, k: int = N_CENTROIDS) -> DataFrame:
    """(vec_id, centroid_id, score): nearest centroid by cosine, ties broken
    by centroid id. One broadcast cross join (n x K) + window argmin."""
    d = SPARK
    e = cache.track(_with_norm(emb).select("vec_id", "embedding", "nrm"))
    c = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cv"),
        F.col("nrm").alias("c_nrm"),
    )
    scored = e.join(F.broadcast(c)).select(
        "vec_id", "centroid_id",
        F.try_divide(SIM_pair_dot("embedding", "cv"),
                     F.col("nrm") * F.col("c_nrm")).alias("_s"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("_s"), F.asc("centroid_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "centroid_id",
                F.expr(SPARK.trunc6("_s")).alias("score"))
    )


def ivf_assign_oracle(k: int = N_CENTROIDS) -> str:
    d = DUCK
    cos = d.dot("e.embedding", "c.embedding")
    nrm_e = f"sqrt({d.dot('e.embedding', 'e.embedding')})"
    nrm_c = f"sqrt({d.dot('c.embedding', 'c.embedding')})"
    return f"""
WITH scored AS (
  SELECT e.vec_id, c.vec_id AS centroid_id,
         ({cos}) / nullif(({nrm_e}) * ({nrm_c}), CAST(0.0 AS DOUBLE)) AS s
  FROM embeddings e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < {k}) c
), ranked AS (
  SELECT vec_id, centroid_id, s,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY s DESC, centroid_id) AS rn
  FROM scored
)
SELECT vec_id, centroid_id, {d.trunc6('s')} AS score
FROM ranked WHERE rn = 1
"""


def ivf_seed_farthest(emb: DataFrame, k: int = N_CENTROIDS) -> DataFrame:
    """Deterministic farthest-point (k-center greedy) seeding — the quality
    upgrade over first-K seeding for clustered corpora, kept exactly
    oracle-expressible (no RNG, unlike classic kmeans++ sampling):

    seed 0 = vec_id 0; each next seed is the vector MINIMIZING its maximum
    cosine to the already-chosen set (i.e. maximizing its minimum angular
    distance), ties broken by smallest vec_id.

    Distribution shape: K-1 rounds, each ONE broadcast join (corpus x
    |chosen|<=K) + a global top-1 — only K scalar ids ever reach the driver.
    At 10^12 vectors the K passes run over a cached/persisted corpus; for
    far larger K one switches to sampled kmeans|| — documented, not needed
    at K=8. Returns (rank, vec_id, minmax_sim) with minmax_sim NULL for the
    rank-0 seed."""
    spark = emb.sparkSession
    e = cache.track(_with_norm(emb).select("vec_id", "embedding", "nrm"))
    chosen: list[tuple[int, int, float | None]] = [(0, 0, None)]
    for i in range(1, k):
        ids = [v for _, v, _ in chosen]
        s = e.filter(F.col("vec_id").isin(ids)).select(
            F.col("embedding").alias("cv"), F.col("nrm").alias("c_nrm"),
        )
        win = (
            e.filter(~F.col("vec_id").isin(ids))
            .join(F.broadcast(s))
            .select(
                "vec_id",
                F.try_divide(SIM_pair_dot("embedding", "cv"),
                             F.col("nrm") * F.col("c_nrm")).alias("_s"),
            )
            .groupBy("vec_id").agg(F.max("_s").alias("maxs"))
            # NULLS LAST to mirror DuckDB's ORDER BY default: a zero-norm
            # vector (NULL maxs via try_divide) must be the LAST resort seed
            # in both engines, not Spark's asc-nulls-first winner
            .orderBy(F.asc_nulls_last("maxs"), F.asc("vec_id"))
            .first()
        )
        maxs = win["maxs"]
        chosen.append((i, int(win["vec_id"]),
                       None if maxs is None else float(maxs)))
    out = spark.createDataFrame(
        chosen, "rank int, vec_id bigint, minmax_sim double")
    return out.select(
        "rank", "vec_id",
        F.expr(SPARK.trunc6("minmax_sim")).alias("minmax_sim"),
    )


def ivf_seed_farthest_oracle(k: int = N_CENTROIDS) -> str:
    """Chained-CTE twin of the greedy loop, in the standard INCREMENTAL
    farthest-point form: maintain per-vector running max-cosine-to-chosen
    (``m_i``), fold in only the newly selected seed each round (GREATEST),
    and take the global argmin. One n-row pass per round — never an
    n x |chosen| join — and every CTE is MATERIALIZED (DuckDB accepts the
    hint; without it the doubly-referenced chain re-evaluates
    exponentially). Dot products accumulate in identical index order in
    both engines, so the argmin ordering is exact; the Spark twin computes
    the same max over the chosen set non-incrementally (max of the same
    doubles — order-independent, identical result)."""
    d = DUCK
    cos_v0 = d.dot("v.embedding", "s0.embedding")
    nv = f"sqrt({d.dot('v.embedding', 'v.embedding')})"
    ns0 = f"sqrt({d.dot('s0.embedding', 's0.embedding')})"
    cos_vw = d.dot("v.embedding", "w.embedding")
    nw = f"sqrt({d.dot('w.embedding', 'w.embedding')})"
    parts = [f"""WITH e AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings
),
m1 AS MATERIALIZED (
  SELECT v.vec_id, v.embedding,
         ({cos_v0}) / nullif(({nv}) * ({ns0}), CAST(0.0 AS DOUBLE)) AS maxs
  FROM e v CROSS JOIN (SELECT embedding FROM e WHERE vec_id = 0) s0
  WHERE v.vec_id <> 0
)"""]
    for i in range(1, k):
        parts.append(f""",
win{i} AS MATERIALIZED (
  SELECT CAST({i} AS INTEGER) AS rank, vec_id, embedding, maxs
  FROM m{i} ORDER BY maxs ASC, vec_id ASC LIMIT 1
)""")
        if i < k - 1:
            parts.append(f""",
m{i + 1} AS MATERIALIZED (
  SELECT v.vec_id, v.embedding,
         GREATEST(v.maxs, ({cos_vw}) / nullif(({nv}) * ({nw}), CAST(0.0 AS DOUBLE))) AS maxs
  FROM m{i} v CROSS JOIN win{i} w
  WHERE v.vec_id <> w.vec_id
)""")
    wins = "\n  UNION ALL ".join(
        f"SELECT rank, vec_id, maxs FROM win{i}" for i in range(1, k))
    parts.append(f"""
SELECT rank, vec_id, {d.trunc6('maxs')} AS minmax_sim FROM (
  SELECT CAST(0 AS INTEGER) AS rank, CAST(0 AS BIGINT) AS vec_id,
         CAST(NULL AS DOUBLE) AS maxs
  UNION ALL {wins}
)""")
    return "".join(parts)


def ivf_topk(emb: DataFrame, n_queries: int = 8, k: int = 5,
             n_centroids: int = N_CENTROIDS, n_probe: int = 2,
             seed_ids: list[int] | None = None) -> DataFrame:
    """Approximate top-k: each query scores only the vectors whose inverted
    list is among the query's ``n_probe`` nearest centroids. ``seed_ids``
    overrides the default first-K centroid seed (e.g. with
    ``ivf_seed_farthest`` output) — recall rises on clustered corpora
    because the lists then straddle every cluster, not just the first."""
    d = SPARK
    e = cache.track(_with_norm(emb).select("vec_id", "embedding", "nrm"))
    seed_pred = (F.col("vec_id").isin(list(seed_ids))
                 if seed_ids is not None
                 else F.col("vec_id") < n_centroids)
    c = e.filter(seed_pred).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cv"),
        F.col("nrm").alias("c_nrm"),
    )
    cscore = e.join(F.broadcast(c)).select(
        "vec_id", "centroid_id",
        F.try_divide(SIM_pair_dot("embedding", "cv"),
                     F.col("nrm") * F.col("c_nrm")).alias("_s"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("_s"), F.asc("centroid_id"))
    ranked = cscore.withColumn("_rn", F.row_number().over(w))
    lists = (ranked.filter(F.col("_rn") == 1)
             .select("vec_id", "centroid_id"))
    probes = (ranked.filter((F.col("_rn") <= n_probe)
                            & (F.col("vec_id") < n_queries))
              .select(F.col("vec_id").alias("query_id"), "centroid_id"))

    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"),
        F.col("nrm").alias("q_nrm"),
    )
    corpus = e.join(lists, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"),
        F.col("nrm").alias("n_nrm"), "centroid_id",
    )
    cand = (probes.join(corpus, "centroid_id")
            .join(q, "query_id")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id",
                    F.try_divide(SIM_pair_dot("qv", "cv"),
                                 F.col("q_nrm") * F.col("n_nrm"))
                    .alias("_s")))
    wq = Window.partitionBy("query_id").orderBy(F.desc("_s"),
                                                F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(wq).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.expr(SPARK.trunc6("_s")).alias("score"), "rank")
    )


def ivf_topk_oracle(n_queries: int = 8, k: int = 5,
                    n_centroids: int = N_CENTROIDS, n_probe: int = 2) -> str:
    d = DUCK
    cos_ec = d.dot("e.embedding", "c.embedding")
    nrm_e = f"sqrt({d.dot('e.embedding', 'e.embedding')})"
    nrm_c = f"sqrt({d.dot('c.embedding', 'c.embedding')})"
    cos_qn = d.dot("q.embedding", "n.embedding")
    nrm_q = f"sqrt({d.dot('q.embedding', 'q.embedding')})"
    nrm_n = f"sqrt({d.dot('n.embedding', 'n.embedding')})"
    return f"""
WITH cscore AS (
  SELECT e.vec_id, c.vec_id AS centroid_id,
         ({cos_ec}) / nullif(({nrm_e}) * ({nrm_c}), CAST(0.0 AS DOUBLE)) AS s
  FROM embeddings e
  CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < {n_centroids}) c
), ranked AS (
  SELECT vec_id, centroid_id,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY s DESC, centroid_id) AS rn
  FROM cscore
), lists AS (
  SELECT vec_id, centroid_id FROM ranked WHERE rn = 1
), probes AS (
  SELECT vec_id AS query_id, centroid_id FROM ranked
  WHERE rn <= {n_probe} AND vec_id < {n_queries}
), cand AS (
  SELECT p.query_id, l.vec_id AS neighbor_id,
         ({cos_qn}) / nullif(({nrm_q}) * ({nrm_n}), CAST(0.0 AS DOUBLE)) AS s
  FROM probes p
  JOIN lists l ON l.centroid_id = p.centroid_id
  JOIN embeddings n ON n.vec_id = l.vec_id
  JOIN embeddings q ON q.vec_id = p.query_id
  WHERE p.query_id <> l.vec_id
), topk AS (
  SELECT query_id, neighbor_id, s,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY s DESC, neighbor_id) AS INTEGER)
             AS rank
  FROM cand
)
SELECT query_id, neighbor_id, {d.trunc6('s')} AS score, rank
FROM topk WHERE rank <= {k}
"""


def ivf_refine(emb: DataFrame, k: int = N_CENTROIDS,
               iters: int = 2) -> DataFrame:
    """Lloyd refinement of the centroid set (Spark-only quality knob):
    iteratively reassign vectors and recompute centroids as element-wise
    means. Each iteration is one explode + one groupBy over (centroid, dim)
    — fully distributed, no driver-side vectors. Returns (centroid_id,
    centroid array<double>)."""
    d = SPARK
    e = cache.track(_with_norm(emb).select("vec_id", "embedding", "nrm"))
    cents = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    for _ in range(iters):
        c = cents.withColumn(
            "c_nrm", F.expr(f"sqrt({d.dot('cv', 'cv')})")
        )
        scored = e.join(F.broadcast(c)).select(
            "vec_id", "embedding", "centroid_id",
            F.try_divide(SIM_pair_dot("embedding", "cv"),
                         F.col("nrm") * F.col("c_nrm")).alias("_s"),
        )
        w = Window.partitionBy("vec_id").orderBy(F.desc("_s"),
                                                 F.asc("centroid_id"))
        assigned = (scored.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .select("vec_id", "embedding", "centroid_id"))
        dims = assigned.select(
            "centroid_id",
            F.posexplode(F.col("embedding")).alias("dim", "val"),
        )
        means = (dims.groupBy("centroid_id", "dim")
                 .agg(F.avg("val").alias("m")))
        cents = (means.groupBy("centroid_id")
                 .agg(F.array_sort(
                     F.collect_list(F.struct("dim", "m"))).alias("pairs"))
                 .select("centroid_id",
                         F.expr("transform(pairs, p -> p.m)").alias("cv")))
    return cents


def ivf_refine_assign(emb: DataFrame, k: int = N_CENTROIDS,
                      dim: int = 64) -> DataFrame:
    """ONE oracle-checkable Lloyd iteration + re-assignment: seed centroids
    (vec_id < k) -> assign -> exact element-wise means -> assign against the
    refined centroids. Returns (vec_id, centroid_id, score).

    Exactness across engines: a double ``avg()`` is NOT order-stable (partial
    sums combine in partition order), so each element is floor-scaled to
    integer nano-units first — int64 sums are order-independent and exact —
    and the mean is reconstructed with one double division in a fixed
    expression order. Decimal division is avoided too (Spark and DuckDB
    disagree on result scale). Distribution shape per iteration: one
    broadcast argmin + one (centroid, dim) groupBy — no driver-side
    vectors, same as ivf_refine."""
    d = SPARK
    e = cache.track(_with_norm(emb).select("vec_id", "embedding", "nrm"))
    c0 = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )

    def assign(cents: DataFrame) -> DataFrame:
        c = cents.withColumn("c_nrm", F.expr(f"sqrt({d.dot('cv', 'cv')})"))
        scored = e.join(F.broadcast(c)).select(
            "vec_id", "embedding", "centroid_id",
            F.try_divide(SIM_pair_dot("embedding", "cv"),
                         F.col("nrm") * F.col("c_nrm")).alias("_s"),
        )
        w = Window.partitionBy("vec_id").orderBy(F.desc("_s"),
                                                 F.asc("centroid_id"))
        return (scored.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1))

    a0 = assign(c0).select("vec_id", "embedding", "centroid_id")
    dims = a0.select(
        "centroid_id", F.posexplode(F.col("embedding")).alias("dim", "val")
    )
    means = (
        dims.groupBy("centroid_id", "dim")
        .agg(
            F.sum(F.expr(
                "CAST(FLOOR(CAST(val AS DOUBLE) * 1000000000) AS BIGINT)"
            )).alias("sq"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "centroid_id", "dim",
            (F.col("sq").cast("double")
             / (F.col("n").cast("double") * F.lit(1.0e9))).alias("m"),
        )
    )
    cents1 = (
        means.groupBy("centroid_id")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m")))
             .alias("pairs"))
        .select("centroid_id",
                F.expr("transform(pairs, p -> p.m)").alias("cv"))
    )
    return assign(cents1).select(
        "vec_id", "centroid_id", F.expr(d.trunc6("_s")).alias("score")
    )


def ivf_refine_assign_oracle(k: int = N_CENTROIDS, dim: int = 64) -> str:
    d = DUCK
    cos0 = d.dot("e.embedding", "c.embedding")
    nrm_e = f"sqrt({d.dot('e.embedding', 'e.embedding')})"
    nrm_c0 = f"sqrt({d.dot('c.embedding', 'c.embedding')})"
    cos1 = d.dot("e.embedding", "c.cv")
    nrm_c1 = f"sqrt({d.dot('c.cv', 'c.cv')})"
    return f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
s0 AS (
  SELECT e.vec_id, c.vec_id AS centroid_id,
         ({cos0}) / nullif(({nrm_e}) * ({nrm_c0}), CAST(0.0 AS DOUBLE)) AS s
  FROM e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < {k}) c
), a0 AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY s DESC, centroid_id) AS rn
    FROM s0
  ) WHERE rn = 1
), dims AS (
  SELECT a0.centroid_id, g.j AS dim,
         CAST(FLOOR(CAST(e.embedding[g.j] AS DOUBLE) * 1000000000)
              AS BIGINT) AS q
  FROM a0 JOIN e USING (vec_id)
  CROSS JOIN generate_series(1, {dim}) g(j)
), means AS (
  SELECT centroid_id, dim,
         CAST(SUM(q) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1000000000.0)
             AS m
  FROM dims GROUP BY 1, 2
), cents AS (
  SELECT centroid_id, list(m ORDER BY dim) AS cv FROM means GROUP BY 1
), s1 AS (
  SELECT e.vec_id, c.centroid_id,
         ({cos1}) / nullif(({nrm_e}) * ({nrm_c1}), CAST(0.0 AS DOUBLE)) AS s
  FROM e CROSS JOIN cents c
)
SELECT vec_id, centroid_id, {d.trunc6('s')} AS score FROM (
  SELECT vec_id, centroid_id, s,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY s DESC, centroid_id) AS rn
  FROM s1
) WHERE rn = 1
"""


def ivf_inertia(emb: DataFrame, cents: DataFrame) -> float:
    """Mean (1 - best cosine) over the corpus for a centroid set — the
    quantization error Lloyd iterations must not increase."""
    d = SPARK
    e = _with_norm(emb).select("vec_id", "embedding", "nrm")
    c = cents.withColumn("c_nrm", F.expr(f"sqrt({d.dot('cv', 'cv')})"))
    scored = e.join(F.broadcast(c)).select(
        "vec_id",
        F.expr(f"({d.dot('embedding', 'cv')}) / (nrm * c_nrm)").alias("_s"),
    )
    best = scored.groupBy("vec_id").agg(F.max("_s").alias("best"))
    return float(best.agg(F.avg(1 - F.col("best"))).first()[0])


def ivf_seed_scalable(emb: DataFrame, k: int = N_CENTROIDS, rounds: int = 3,
                      oversample: int | None = None,
                      seed: int = 42) -> DataFrame:
    """kmeans|| sampled seeding (Bahmani et al., "Scalable k-means++",
    VLDB'12) — the large-K path that ``ivf_seed_farthest``'s docstring
    promised. Farthest-point seeding runs K-1 driver rounds: fine at K=8,
    unusable at the K~10^4-10^5 a 10^9-vector corpus needs. This runs
    O(rounds) passes TOTAL (independent of K):

    1. seed candidate 0 = min vec_id among vectors with nrm > 0 (a
       zero-norm vector must never seed: cosine to it is undefined for
       every query);
    2. each round: one broadcast join (corpus x |new samples|) to refresh
       per-vector min angular distance d2 = 1 - cos(x, nearest candidate),
       one sum for the normalizer phi, and a Bernoulli sample with
       p = min(1, l * d2 / phi), l = ``oversample`` (default 2k). The
       normalizer and the test both run on nano-unit-quantized distances
       (floor(d2 * 1e9) as int64): INTEGER sums are partition-order-free,
       so phi — and therefore the sampled set — is bit-reproducible across
       cluster layouts AND engines (a double sum would drift with the
       shuffle). Sampling uses an md5-hash uniform per (vec_id, round,
       seed) — deterministic, no rand() reshuffle hazard;
    3. weight every candidate by the number of corpus vectors nearest to it
       (one broadcast join — the candidate set is ~1 + rounds*l rows);
    4. deterministic weighted greedy k-center over the candidates ON THE
       DRIVER (numpy over a tiny set): start at the max-weight
       candidate, then repeatedly take argmax of weight *
       min-distance-to-chosen, ties to the smaller vec_id. Dot products
       accumulate strictly in index order — the same fold
       ``functions.portable.dot`` compiles to in BOTH engines — so every
       double here is bit-identical to what the DuckDB oracle computes.
       (Classic kmeans++ samples this step; the greedy variant keeps the
       whole pipeline RNG-free.)

    Driver traffic: ~l rows per round + the candidate vectors once —
    NOT O(K) actions, NOT the corpus. Returns (rank, vec_id) compatible
    with ``ivf_topk(seed_ids=...)``. The exact-replay DuckDB twin is
    ``ivf_seed_scalable_oracle`` (valid whenever the sampled candidate set
    reaches k — the degenerate tiny-corpus pad path is pytest-covered).
    """
    l = oversample if oversample is not None else 2 * k
    spark = emb.sparkSession
    e = cache.track(_with_norm(emb).select("vec_id", "embedding", "nrm"))

    def dist_to(sample_ids: list[int]):
        """(vec_id, nd2): min angular distance to the given candidates.
        Zero-norm vectors get d2=0 — a degenerate vector must never be
        sampled as a seed. A NULL cosine (zero-norm CANDIDATE — impossible
        now that candidate 0 requires nrm > 0, kept as defense) counts as
        distance 1.0, never 0."""
        s = e.filter(F.col("vec_id").isin(sample_ids)).select(
            F.col("embedding").alias("cv"), F.col("nrm").alias("c_nrm"))
        cos = F.try_divide(SIM_pair_dot("embedding", "cv"),
                           F.col("nrm") * F.col("c_nrm"))
        d2 = F.when(F.col("nrm") == 0, F.lit(0.0)).otherwise(
            F.greatest(F.lit(0.0), F.lit(1.0) - F.coalesce(cos, F.lit(0.0))))
        return (e.join(F.broadcast(s))
                .select("vec_id", d2.alias("_d"))
                .groupBy("vec_id").agg(F.min("_d").alias("nd2")))

    first = e.filter(F.col("nrm") > 0).agg(F.min("vec_id")).first()[0]
    if first is None:  # fully degenerate corpus: any vector will do
        first = e.agg(F.min("vec_id")).first()[0]
    first_id = int(first)
    cand_ids = [first_id]
    m = cache.track(dist_to([first_id])
                    .select("vec_id", F.col("nd2").alias("d2")))
    # nano-unit quantization for phi + the Bernoulli test (see docstring)
    d2q = F.floor(F.col("d2") * F.lit(1e9)).cast("long")
    for r in range(rounds):
        phi = m.agg(F.sum(d2q)).first()[0]
        if not phi:
            break  # every vector coincides with a candidate already
        # md5-hash uniform in [0, 1): deterministic Bernoulli, no rand()
        h = F.conv(F.substring(
            F.md5(F.concat_ws("_", F.col("vec_id").cast("string"),
                              F.lit(str(r)), F.lit(str(seed)))), 1, 8),
            16, 10).cast("double")
        new = [int(row["vec_id"]) for row in
               m.filter((h / F.lit(4294967296.0) * F.lit(float(phi)))
                        < (F.lit(float(l)) * d2q.cast("double")))
               .select("vec_id").collect()]
        new = [i for i in new if i not in set(cand_ids)]
        if not new:
            continue
        cand_ids.extend(new)
        m = cache.track(
            m.join(dist_to(new), "vec_id")
            .select("vec_id", F.least("d2", "nd2").alias("d2")))

    # candidate weights: corpus points nearest to each candidate
    cfr = e.filter(F.col("vec_id").isin(cand_ids)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"),
        F.col("nrm").alias("c_nrm"))
    cos = F.try_divide(SIM_pair_dot("embedding", "cv"),
                       F.col("nrm") * F.col("c_nrm"))
    asn = e.join(F.broadcast(cfr)).select(
        "vec_id", "cid",
        F.greatest(F.lit(0.0), F.lit(1.0) - F.coalesce(cos, F.lit(0.0)))
        .alias("_d"))
    w = Window.partitionBy("vec_id").orderBy(F.asc("_d"), F.asc("cid"))
    weights = {int(row["cid"]): int(row["n"]) for row in
               asn.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") == 1)
               .groupBy("cid").agg(F.count(F.lit(1)).alias("n")).collect()}

    # driver-side deterministic weighted greedy k-center over ~1+rounds*l
    # candidates (tiny by construction). Dots accumulate strictly in INDEX
    # order — but vectorized ACROSS candidates: each acc[j] sums t=0..dim-1
    # left-to-right, the exact fold ``portable.dot`` compiles to in both
    # engines. (A BLAS ``vecs @ v`` would reorder the accumulation and
    # break bit-parity with the SQL; a per-pair Python loop would make the
    # greedy O(K*C*dim) interpreted steps — minutes at K=1024.)
    import numpy as np

    crows = sorted(cfr.collect(), key=lambda row: int(row["cid"]))
    ids = np.array([int(row["cid"]) for row in crows], dtype=np.int64)
    vecs = np.array([[float(x) for x in row["cv"]] for row in crows],
                    dtype=np.float64)
    nrms = np.array([float(row["c_nrm"]) for row in crows], dtype=np.float64)
    ws = np.array([float(weights.get(int(i), 0)) for i in ids],
                  dtype=np.float64)

    def ang(i: int) -> np.ndarray:
        """max(0, 1 - cos(cand_i, cand_j)) for all j, index-order dots."""
        acc = np.zeros(len(ids))
        vi = vecs[i]
        for t in range(vecs.shape[1]):
            acc += vecs[:, t] * vi[t]
        denom = nrms * nrms[i]
        with np.errstate(invalid="ignore", divide="ignore"):
            c = np.where(denom > 0, acc / denom, 0.0)
        return np.maximum(0.0, 1.0 - c)

    # max weight, ties -> smaller vec_id (ids sorted ascending)
    start = int(np.lexsort((ids, -ws))[0])
    chosen = [start]
    mind = ang(start)
    while len(chosen) < min(k, len(ids)):
        gain = ws * mind
        gain[chosen] = -1.0
        nxt = int(np.lexsort((ids, -gain))[0])
        chosen.append(nxt)
        np.minimum(mind, ang(nxt), out=mind)
    out = [(rank, int(ids[i])) for rank, i in enumerate(chosen)]
    if len(out) < k:  # degenerate tiny corpus: pad with smallest unused ids
        used = {v for _, v in out}
        pad = [int(row["vec_id"]) for row in
               e.filter(~F.col("vec_id").isin(list(used)))
               .orderBy("vec_id").limit(k - len(out)).collect()]
        out += [(len(out) + j, v) for j, v in enumerate(pad)]
    return spark.createDataFrame(out, "rank int, vec_id bigint")


def ivf_seed_scalable_oracle(k: int = N_CENTROIDS, rounds: int = 3,
                             oversample: int | None = None,
                             seed: int = 42) -> str:
    """Exact-replay DuckDB twin of ``ivf_seed_scalable`` (round-6 verdict
    item 2: the one registered query without a driver oracle). Every
    arithmetic step is engine-portable by construction:

    - distances come from ``portable.dot`` folds (index-order accumulation
      -> bit-identical doubles in both engines);
    - phi sums nano-unit int64 quantized distances (order-free);
    - the Bernoulli test replays the same md5-uniform — DuckDB parses the
      hex via CAST('0x'||substr AS BIGINT), Spark via conv(_,16,10);
    - the driver-side weighted greedy unrolls into k-1 chained MATERIALIZED
      CTEs, the same incremental LEAST fold as the farthest-seed oracle.

    Valid whenever the sampled candidate pool reaches k (true for the test
    corpora; the degenerate pad path is pytest-covered instead)."""
    d = DUCK
    l = oversample if oversample is not None else 2 * k
    D0 = "CAST(0.0 AS DOUBLE)"
    D1 = "CAST(1.0 AS DOUBLE)"
    nrm_self = f"sqrt({d.dot('embedding', 'embedding')})"

    def dist(dot_expr: str, vn: str, cn: str) -> str:
        """dist_to's d2: zero-norm corpus vector -> 0, NULL cos -> 1.0."""
        cos = f"(({dot_expr}) / nullif(({vn}) * ({cn}), {D0}))"
        return (f"CASE WHEN {vn} = {D0} THEN {D0} ELSE "
                f"GREATEST({D0}, {D1} - COALESCE({cos}, {D0})) END")

    d2q = f"CAST(floor(d2 * CAST(1e9 AS DOUBLE)) AS BIGINT)"
    parts = [f"""WITH e AS MATERIALIZED (
  SELECT vec_id, embedding, {nrm_self} AS nrm FROM embeddings
),
cand0 AS MATERIALIZED (
  SELECT vec_id, embedding, nrm FROM e WHERE nrm > 0
  ORDER BY vec_id LIMIT 1
),
m0 AS MATERIALIZED (
  SELECT v.vec_id, v.embedding, v.nrm,
         {dist(d.dot('v.embedding', 'c.embedding'), 'v.nrm', 'c.nrm')} AS d2
  FROM e v CROSS JOIN cand0 c
)"""]
    for r in range(rounds):
        u = (f"CAST(CAST(('0x' || substring(md5(CAST(m.vec_id AS VARCHAR) "
             f"|| '_{r}_{seed}'), 1, 8)) AS BIGINT) AS DOUBLE) "
             f"/ CAST(4294967296.0 AS DOUBLE)")
        parts.append(f""",
phi{r} AS (
  SELECT SUM(CAST(floor(d2 * CAST(1e9 AS DOUBLE)) AS BIGINT)) AS phi
  FROM m{r}
),
s{r} AS MATERIALIZED (
  SELECT m.vec_id, m.embedding, m.nrm
  FROM m{r} m CROSS JOIN phi{r} p
  WHERE p.phi IS NOT NULL AND p.phi > 0
    AND ({u}) * CAST(p.phi AS DOUBLE)
        < CAST({l} AS DOUBLE)
          * CAST(CAST(floor(m.d2 * CAST(1e9 AS DOUBLE)) AS BIGINT) AS DOUBLE)
    AND m.vec_id NOT IN (SELECT vec_id FROM cand{r})
),
cand{r + 1} AS MATERIALIZED (
  SELECT * FROM cand{r}
  UNION ALL SELECT vec_id, embedding, nrm FROM s{r}
),
m{r + 1} AS MATERIALIZED (
  SELECT m.vec_id, m.embedding, m.nrm,
         CASE WHEN t.nd2 IS NULL THEN m.d2
              ELSE LEAST(m.d2, t.nd2) END AS d2
  FROM m{r} m LEFT JOIN (
    SELECT v.vec_id,
           MIN({dist(d.dot('v.embedding', 's.embedding'),
                     'v.nrm', 's.nrm')}) AS nd2
    FROM e v CROSS JOIN s{r} s GROUP BY v.vec_id
  ) t ON m.vec_id = t.vec_id
)""")
    R = rounds
    # weights: nearest-candidate assignment (ties -> smaller cid), then a
    # LEFT JOIN so a candidate that wins no corpus vector keeps weight 0
    asn_d = (f"GREATEST({D0}, {D1} - COALESCE("
             f"({d.dot('v.embedding', 'c.embedding')}) "
             f"/ nullif(v.nrm * c.nrm, {D0}), {D0}))")
    parts.append(f""",
asn AS MATERIALIZED (
  SELECT v.vec_id, c.vec_id AS cid, {asn_d} AS _d
  FROM e v CROSS JOIN cand{R} c
),
wt AS MATERIALIZED (
  SELECT c.vec_id AS cid, c.embedding, c.nrm,
         CAST(COALESCE(t.n, 0) AS DOUBLE) AS w
  FROM cand{R} c LEFT JOIN (
    SELECT cid, COUNT(*) AS n FROM (
      SELECT vec_id, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY _d ASC, cid ASC) AS rn
      FROM asn
    ) WHERE rn = 1 GROUP BY cid
  ) t ON c.vec_id = t.cid
),
g0 AS MATERIALIZED (
  SELECT cid, embedding, nrm, w FROM wt ORDER BY w DESC, cid ASC LIMIT 1
)""")
    ang = (f"GREATEST({D0}, {D1} - (CASE WHEN c.nrm * g.nrm > {D0} THEN "
           f"({d.dot('c.embedding', 'g.embedding')}) / (c.nrm * g.nrm) "
           f"ELSE {D0} END))")
    for i in range(1, k):
        src = "g0" if i == 1 else f"g{i - 1}"
        prev = "wt" if i == 1 else f"gm{i - 1}"
        mind = ang if i == 1 else f"LEAST(c.mind, {ang})"
        parts.append(f""",
gm{i} AS MATERIALIZED (
  SELECT c.cid, c.embedding, c.nrm, c.w, {mind} AS mind
  FROM {prev} c CROSS JOIN {src} g WHERE c.cid <> g.cid
),
g{i} AS MATERIALIZED (
  SELECT cid, embedding, nrm, w, mind FROM gm{i}
  ORDER BY (w * mind) DESC, cid ASC LIMIT 1
)""")
    wins = "\n  UNION ALL ".join(
        [f"SELECT 0 AS r, cid FROM g0"]
        + [f"SELECT {i}, cid FROM g{i}" for i in range(1, k)])
    parts.append(f"""
SELECT CAST(r AS INTEGER) AS rank, CAST(cid AS BIGINT) AS vec_id FROM (
  {wins}
)""")
    return "".join(parts)
