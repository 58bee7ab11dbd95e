"""Persist lifecycle: a sweep over cache-heavy queries must not accumulate
one cached frame per query (VERDICT r02 'What's wrong' #5)."""

from __future__ import annotations

from logstash_codec_protobuf_spark import cache, queries as Q

from .conftest import SF_DIR

# the heaviest persist users: dedup self-joins, similarity buckets, IVF,
# wire round trips, plus two _good_flat consumers
SWEEP = [
    "parse_good", "encode_roundtrip", "pb_wire_roundtrip",
    "ngram_jaccard_pairs", "minhash_pairs", "simhash_neardup",
    "embedding_neardup", "ann_lsh_topk", "ivf_topk", "pb_wire_dead_letter",
]


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_query_sweep_releases_caches(spark):
    qs = Q.all_queries()
    counts = []
    for name in SWEEP:
        qs[name](spark, SF_DIR).count()
        counts.append(_n_cached(spark))
    # steady state: the shared flat frames (native+arrow) plus the current
    # query's own tracked frames — NOT one residue per past query. The last
    # query boundary hasn't fired yet, so allow the current query's frames.
    assert counts[-1] <= 6, f"cache growth across sweep: {counts}"
    # and an explicit boundary releases everything but the shared frames
    cache.release_tracked()
    assert _n_cached(spark) <= 3, f"tracked frames leaked: {_n_cached(spark)}"
    cache.release_all()
    assert _n_cached(spark) == 0


def test_shared_flat_is_memoized(spark):
    from logstash_codec_protobuf_spark.queries import _good_flat

    a = _good_flat(spark, SF_DIR)
    b = _good_flat(spark, SF_DIR)
    assert a is b, "_good_flat must be memoized per (session, sf_dir, impl)"
    cache.release_all()
