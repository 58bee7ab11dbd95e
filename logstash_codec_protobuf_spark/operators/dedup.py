"""Deduplication operators for training-data pipelines.

Four tiers, cheapest to most robust, each with an exact cross-engine oracle via
the portable expression templates (functions.portable):

- exact        : md5(text) group — one shuffle on the hash, scales linearly.
- ngram_jaccard: candidate pairs within (lang, length-band) blocks, verified by
                 character-3-gram Jaccard. The blocking keeps the self-join from
                 going O(n^2) globally; at 100 TB blocks are bucketed-join keys.
- minhash LSH  : 16-permutation MinHash signature over char-4-gram shingle
                 hashes, banded 4x4; candidates = band-key join. This is the
                 scale path: cost is O(n * bands), never pairwise, and the band
                 join shuffles on a high-cardinality key.
- simhash      : 32-bit SimHash fingerprint over the same shingle-hash basis;
                 near-dups = small hamming distance (bit_count(xor) <= r),
                 joinable via high-bit blocking.

MinHash permutation constants are fixed literals (a*H + b mod p): deterministic
across runs and engines, coefficients < 2^17 so products stay well inside int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.portable import DUCK, SPARK, Dialect

# 16 fixed (a, b) permutation constants — odd multipliers, distinct offsets.
MINHASH_PERMS = [
    (40503, 12345), (10657, 54321), (23173, 7919), (48611, 104729),
    (19937, 31337), (28657, 1299), (75571, 9176), (99991, 60493),
    (14867, 25301), (37199, 71993), (54983, 3089), (67139, 44017),
    (81799, 58111), (91009, 16127), (31847, 86413), (62989, 27689),
]
# 4 bands x 4 rows over char-shingle hashes: P(candidate) = 1-(1-j^4)^4.
# True near-dups (j >= 0.9) are caught with p > 0.99; recall is the LSH
# stage's job — precision comes from verifying candidates with real Jaccard.
N_BANDS = 4
ROWS_PER_BAND = 4


def exact_keys(d: Dialect, text: str = "text") -> str:
    return f"md5({text})"


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact dedup: canonical id + copy count per content hash."""
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("canonical_id"),
             F.count(F.lit(1)).alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard with (lang, length-band) blocking
# ---------------------------------------------------------------------------

def _block_cols(df: DataFrame) -> DataFrame:
    # explicit FLOOR: Spark's double->int cast truncates but DuckDB's rounds,
    # so a bare CAST(n_chars/50 AS INT) would band x.5 differently per engine
    return df.withColumn("len_band", F.expr("CAST(FLOOR(n_chars / 50.0) AS INT)"))


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5,
                        k: int = 3) -> DataFrame:
    """Near-dup pairs by character k-gram Jaccard within blocking groups.

    The blocked self-join is the explicit candidate generator; Jaccard runs
    only inside blocks. Same-block requirement: equal lang AND equal
    floor(n_chars/50) band (documented recall tradeoff — the principled
    unblocked path is MinHash below).
    """
    d = SPARK
    sh = _block_cols(docs).select(
        "doc_id", "lang", "len_band",
        F.expr(d.shingles("text", k)).alias("shingles"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.expr(f"size(array_intersect(a.shingles, b.shingles))")
    ja = inter.cast("double") / (
        F.expr("size(a.shingles)") + F.expr("size(b.shingles)") - inter
    )
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.len_band") == F.col("b.len_band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            (F.floor(ja * 1000000) / 1000000).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_oracle(threshold: float = 0.5, k: int = 3) -> str:
    d = DUCK
    sh = d.shingles("text", k)
    return f"""
WITH sh AS (
  SELECT doc_id, lang, CAST(FLOOR(n_chars / 50.0) AS INTEGER) AS len_band,
         {sh} AS shingles
  FROM documents
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       floor(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / (len(a.shingles) + len(b.shingles)
                - len(list_intersect(a.shingles, b.shingles))) * 1000000)
           / 1000000 AS jaccard
FROM sh a JOIN sh b
  ON a.lang = b.lang AND a.len_band = b.len_band AND a.doc_id < b.doc_id
WHERE floor(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / (len(a.shingles) + len(b.shingles)
               - len(list_intersect(a.shingles, b.shingles))) * 1000000)
          / 1000000 >= {threshold}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

MINHASH_SHINGLE_K = 4  # char shingles discriminate where word-sets saturate


def _sig_exprs(d: Dialect) -> list[str]:
    return [d.minhash_term(_shingle_hashes(d), a, b) for a, b in MINHASH_PERMS]


def _band_exprs(d: Dialect) -> list[str]:
    sigs = _sig_exprs(d)
    bands = []
    for bi in range(N_BANDS):
        parts = sigs[bi * ROWS_PER_BAND:(bi + 1) * ROWS_PER_BAND]
        joined = " || '_' || ".join(f"CAST({p} AS STRING)" for p in parts)
        bands.append(joined)
    return bands


def minhash_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_key) — the LSH bucket assignment. One narrow
    projection + explode; no shuffle until the candidate join."""
    bands = _band_exprs(SPARK)
    struct_items = ", ".join(
        f"named_struct('band_idx', {i}, 'band_key', {b})"
        for i, b in enumerate(bands)
    )
    return docs.select(
        "doc_id", F.expr(f"explode(array({struct_items})) AS band")
    ).select("doc_id", F.col("band.band_idx").alias("band_idx"),
             F.col("band.band_key").alias("band_key"))


def minhash_bands_oracle() -> str:
    bands = _band_exprs(DUCK)
    selects = [
        f"SELECT doc_id, {i} AS band_idx, {b} AS band_key FROM documents"
        for i, b in enumerate(bands)
    ]
    return "\nUNION ALL\n".join(selects)


def minhash_pairs(docs: DataFrame) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band bucket."""
    bands = minhash_bands(docs)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )


def minhash_pairs_oracle() -> str:
    return f"""
WITH bands AS ({minhash_bands_oracle()})
SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
FROM bands a JOIN bands b
  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
 AND a.doc_id < b.doc_id
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _shingle_hashes(d: Dialect) -> str:
    """char-shingle hash basis — shared with MinHash; word-token sets saturate
    on small-vocabulary corpora and make fingerprints degenerate."""
    return d.amap(d.shingles("text", MINHASH_SHINGLE_K),
                  f"s -> {d.poly_hash_str('s')}")


def simhash(docs: DataFrame) -> DataFrame:
    expr = SPARK.simhash32(_shingle_hashes(SPARK))
    return docs.select("doc_id", F.expr(expr).alias("simhash32"))


def simhash_oracle() -> str:
    expr = DUCK.simhash32(_shingle_hashes(DUCK))
    return f"SELECT doc_id, {expr} AS simhash32 FROM documents"


def simhash_neardup_pairs(docs: DataFrame, max_hamming: int = 1) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance. Candidate generation blocks
    on the high 16 bits (documents differing only in low bits collide); exact
    hamming verified with bit_count(xor)."""
    sh = simhash(docs).withColumn(
        "block", F.expr("CAST(simhash32 div 65536 AS BIGINT)")
    )
    a, b = sh.alias("a"), sh.alias("b")
    ham = F.expr("bit_count(a.simhash32 ^ b.simhash32)")
    return (
        a.join(b, (F.col("a.block") == F.col("b.block"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("a_id"),
                F.col("b.doc_id").alias("b_id"),
                ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
