"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``      : brute-force exact top-k — the correctness baseline.
                         O(corpus x queries) work by definition, but shaped
                         for scale anyway: the CORPUS is the scanned side
                         (only the small query set is broadcast — never the
                         corpus), and a per-Arrow-batch partial top-k
                         reduces the scored stream from q*n rows to
                         q*k per batch BEFORE the per-query window, so the
                         q-key window funnel sees a few thousand rows no
                         matter the corpus size. The oracle is exact because
                         both engines fold the dot product in identical
                         index order in double precision.
- ``lsh_topk``         : random-hyperplane LSH bucketing — the scale path.
                         Corpus hashed once into 2^n_planes buckets; each query
                         probes only its own bucket (plus optional hamming-1
                         neighbors). Cost O(corpus/2^planes) per query instead
                         of O(corpus). Hyperplanes are deterministic pseudo-
                         random literals, so results are reproducible.
- ``neardup_pairs``    : LSH-bucket-blocked embedding near-duplicate pairs
                         (cosine >= threshold) — embedding-space dedup.
                         Candidates are same-or-adjacent-bucket pairs, so
                         block sizes are balanced by construction (no skewed
                         label key, no O(block^2) blowup).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F, types as T

from .. import cache
from ..functions.portable import DUCK, SPARK

DIM = 64  # driver embeddings are 64-d


@F.pandas_udf(T.DoubleType())
def _dot_seq_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Index-order dot product, Arrow-vectorized.

    Bit-identical to the SQL fold template (portable.Dialect.dot) and hence
    to the DuckDB oracle: each pair accumulates acc = acc + a_i*b_i in
    DIMENSION ORDER (the per-dimension loop keeps the sequential IEEE tree —
    np.dot's pairwise/SIMD summation would NOT match). Exists because
    Catalyst's aggregate() higher-order function is interpreted per element
    (no whole-stage codegen), which made per-PAIR dots the hot cost of the
    similarity joins; per-VECTOR work (norms, bucket signatures) stays in SQL
    where its O(n) cost is irrelevant."""
    import numpy as np

    A = np.stack(a.to_numpy()).astype(np.float64)
    B = np.stack(b.to_numpy()).astype(np.float64)
    acc = np.zeros(len(A), dtype=np.float64)
    for i in range(A.shape[1]):
        acc = acc + A[:, i] * B[:, i]
    return pd.Series(acc)


def pair_dot(a: str | Column, b: str | Column) -> Column:
    """Arrow-batched exact dot for per-pair scoring."""
    return _dot_seq_udf(F.col(a) if isinstance(a, str) else a,
                        F.col(b) if isinstance(b, str) else b)


def _local_topk(k: int):
    """Per-Arrow-batch partial top-k under the FINAL total order
    (score desc, neighbor_id asc): every global top-k row is top-k within
    its own batch, so keeping k per (query, batch) is a lossless reduction —
    the map-side combine the q-key window cannot do for itself.

    NULL alignment: a zero-norm vector scores NULL (try_divide), which
    Spark's `ORDER BY score DESC` puts LAST; pandas sees NULL as NaN, whose
    native sort position is type-dependent — so the sort runs on a
    -inf-filled key to pin NULLs last exactly like the window will."""
    import numpy as np

    def fn(batches):
        for pdf in batches:
            if len(pdf):
                pdf = (pdf.assign(_sk=pdf["score"].fillna(-np.inf))
                       .sort_values(["query_id", "_sk", "neighbor_id"],
                                    ascending=[True, False, True]))
                yield (pdf.groupby("query_id", sort=False).head(k)
                       .drop(columns="_sk"))
    return fn


def cosine_topk(emb: DataFrame, n_queries: int = 8, k: int = 5) -> DataFrame:
    """Exact top-k neighbors (excluding self) for query vectors vec_id < n.

    Scale shape (even though exact search is O(n*q) by definition): the
    corpus is SCANNED, the query rows are the broadcast side — broadcasting
    the corpus (the tempting one-liner) dies at the first real corpus. The
    scored stream is then cut to <= q*k rows per Arrow batch by a
    mapInPandas partial top-k before the per-query window, so the window's
    q-key shuffle — which would otherwise funnel q*n rows into q tasks —
    ranks a few thousand survivors regardless of corpus size."""
    d = SPARK
    nrm = F.expr(f"sqrt({d.dot('embedding', 'embedding')})")
    h = emb.withColumn("nrm", nrm)
    q = h.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"),
        F.col("nrm").alias("q_nrm"),
    )
    c = h.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("embedding").alias("cv"),
                 F.col("nrm").alias("c_nrm"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.try_divide(pair_dot("qv", "cv"),
                             F.col("q_nrm") * F.col("c_nrm"))
                .alias("score"))
    )
    reduced = scored.mapInPandas(_local_topk(k), schema=scored.schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        reduced.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.expr(SPARK.trunc6("score")).alias("score"), "rank")
    )


def cosine_topk_oracle(n_queries: int = 8, k: int = 5) -> str:
    d = DUCK
    cos = d.cosine("q.embedding", "c.embedding")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {cos} AS score
  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < {n_queries}
), ranked AS (
  SELECT query_id, neighbor_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, neighbor_id) AS INTEGER)
             AS rank
  FROM scored
)
SELECT query_id, neighbor_id, {d.trunc6("score")} AS score, rank
FROM ranked WHERE rank <= {k}
"""


NEARDUP_PLANES = 4  # 16 buckets; candidates = same-or-adjacent (hamming<=1)


def neardup_pairs(emb: DataFrame, threshold: float = 0.9,
                  n_planes: int = NEARDUP_PLANES) -> DataFrame:
    """Embedding-space near-duplicates: candidates are pairs whose hyperplane-
    LSH buckets differ in at most one sign bit (one side probes its bucket
    plus each 1-bit flip — symmetric, so every hamming<=1 pair is generated
    exactly once); exact cosine verifies. The bucket is a deterministic
    expression, so the contract 'bucket-adjacent pairs with cosine >= t' has
    an exact DuckDB oracle. Replaces label-blocking: labels are few and
    skewed (O(block^2) blowup), buckets are balanced by construction and the
    plane count tunes block size independent of the data."""
    d = SPARK
    bucket = F.expr(lsh_bucket_expr("embedding", n_planes))
    # persist: the bucketed frame feeds both join sides (probe fan-out and
    # corpus); without it each side re-evaluates n_planes 64-d dot products.
    # The norm is precomputed per VECTOR (n values) so the per-PAIR work is
    # one dot product instead of three: cosine = dot/(nrm_a*nrm_b) is the
    # identical IEEE expression tree the oracle folds, just factored.
    h = cache.track(
        emb.withColumn("bucket", bucket)
        .withColumn("nrm", F.expr(f"sqrt({d.dot('embedding', 'embedding')})"))
    )
    probes = "array(bucket" + "".join(
        f", bucket ^ {1 << p}" for p in range(n_planes)
    ) + ")"
    a = h.select(F.col("vec_id").alias("a_id"),
                 F.col("embedding").alias("av"),
                 F.col("nrm").alias("a_nrm"),
                 F.explode(F.expr(probes)).alias("probe"))
    b = h.select(F.col("vec_id").alias("b_id"),
                 F.col("embedding").alias("bv"),
                 F.col("nrm").alias("b_nrm"),
                 F.col("bucket").alias("b_bucket"))
    # materialize the dot product per candidate pair BEFORE the threshold
    # filter: predicate pushdown would otherwise substitute the aliased fold
    # back into the filter and evaluate the 64-term dot twice per pair
    pairs = (
        a.join(b, (F.col("probe") == F.col("b_bucket"))
               & (F.col("a_id") < F.col("b_id")))
        .select("a_id", "b_id",
                pair_dot("av", "bv").alias("dp"),
                "a_nrm", "b_nrm")
    )
    pairs = cache.track(pairs)
    # try_divide: zero-norm vector -> NULL score (never ANSI DIVIDE_BY_ZERO),
    # filtered by the threshold predicate — same as the oracle's nullif guard
    score = F.expr(d.trunc6("try_divide(dp, a_nrm * b_nrm)"))
    return (
        pairs.select("a_id", "b_id", score.alias("score"))
        .filter(F.col("score") >= threshold)
    )


def neardup_pairs_oracle(threshold: float = 0.9,
                         n_planes: int = NEARDUP_PLANES) -> str:
    d = DUCK
    bucket = lsh_bucket_expr("embedding", n_planes, d)
    probes = "\nUNION ALL\n".join(
        ["SELECT vec_id, embedding, bucket AS probe FROM hashed"]
        + [f"SELECT vec_id, embedding, {d.bxor('bucket', str(1 << p))} FROM hashed"
           for p in range(n_planes)]
    )
    cos = d.cosine("a.embedding", "b.embedding")
    return f"""
WITH hashed AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
probes AS ({probes})
SELECT a.vec_id AS a_id, b.vec_id AS b_id, {d.trunc6(cos)} AS score
FROM probes a JOIN hashed b ON a.probe = b.bucket AND a.vec_id < b.vec_id
WHERE {d.trunc6(cos)} >= {threshold}
"""


# ---------------------------------------------------------------------------
# LSH scale path (Spark-only; validated against brute force in tests)
# ---------------------------------------------------------------------------

def _hyperplanes(n_planes: int, dim: int = DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG over plane*dim+i)."""
    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            x = (1103515245 * (p * dim + i + 1) + 12345) % 2**31
            row.append(((x % 2001) - 1000) / 1000.0)
        planes.append(row)
    return planes


def lsh_bucket_expr(vec_col: str, n_planes: int = 6,
                    d: "Dialect" = SPARK) -> str:
    """Bucket id = sign-bit signature against fixed hyperplanes (renders in
    either dialect — the hyperplanes are deterministic literals)."""
    terms = []
    for p, plane in enumerate(_hyperplanes(n_planes)):
        body = ", ".join(f"CAST({v} AS DOUBLE)" for v in plane)
        lit = f"array({body})" if d.name == "spark" else f"[{body}]"
        dot = d.dot(vec_col, lit)
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def lsh_topk(emb: DataFrame, n_queries: int = 8, k: int = 5,
             n_planes: int = 4, multiprobe: bool = True) -> DataFrame:
    """Approximate top-k: probe the query's LSH bucket (+ hamming-1 buckets
    with ``multiprobe`` — the standard recall boost: a true neighbor lying
    just across one hyperplane is found in a flipped-bit bucket).

    At 100 TB the corpus side is written bucketed-by(bucket) so each probe is
    a partition-pruned scan; here it is a co-partitioned equi-join on bucket.
    Per-query cost: (1 + n_planes)/2^n_planes of the corpus instead of 100%.
    """
    d = SPARK
    bucket = F.expr(lsh_bucket_expr("embedding", n_planes))
    nrm = F.expr(f"sqrt({d.dot('embedding', 'embedding')})")
    hashed = cache.track(
        emb.withColumn("bucket", bucket).withColumn("nrm", nrm)
    )
    q = hashed.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"),
        F.col("nrm").alias("q_nrm"), F.col("bucket"),
    )
    if multiprobe:
        probes = "array(bucket" + "".join(
            f", bucket ^ {1 << p}" for p in range(n_planes)
        ) + ")"
        q = q.withColumn("bucket", F.explode(F.expr(probes)))
    c = hashed.select(F.col("vec_id").alias("neighbor_id"),
                      F.col("embedding").alias("cv"),
                      F.col("nrm").alias("c_nrm"), F.col("bucket"))
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.try_divide(pair_dot("qv", "cv"),
                             F.col("q_nrm") * F.col("c_nrm"))
                .alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.expr(SPARK.trunc6("score")).alias("score"), "rank")
    )


def lsh_topk_oracle(n_queries: int = 8, k: int = 5, n_planes: int = 4,
                    multiprobe: bool = True) -> str:
    """Exact DuckDB rendering of lsh_topk: the hyperplanes, bucket signature,
    probe set, and tie-break ordering are all deterministic, so even this
    'approximate' operator gets a full rows+schema+hash oracle."""
    d = DUCK
    bucket = lsh_bucket_expr("embedding", n_planes, d)
    probe_selects = ["SELECT query_id, qv, bucket AS probe FROM q"]
    if multiprobe:
        probe_selects += [
            f"SELECT query_id, qv, {d.bxor('bucket', str(1 << p))} FROM q"
            for p in range(n_planes)
        ]
    probes = "\nUNION ALL\n".join(probe_selects)
    cos = d.cosine("p.qv", "c.embedding")
    return f"""
WITH hashed AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
q AS (
  SELECT vec_id AS query_id, embedding AS qv, bucket
  FROM hashed WHERE vec_id < {n_queries}
),
probes AS ({probes}),
scored AS (
  SELECT p.query_id, c.vec_id AS neighbor_id, {cos} AS score
  FROM probes p JOIN hashed c ON p.probe = c.bucket
  WHERE p.query_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, neighbor_id) AS INTEGER)
             AS rank
  FROM scored
)
SELECT query_id, neighbor_id, {d.trunc6("score")} AS score, rank
FROM ranked WHERE rank <= {k}
"""
