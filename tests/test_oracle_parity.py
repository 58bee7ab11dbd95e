"""Every queries() entry must match its DuckDB oracle exactly at sf0.001 —
the same comparison the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from logstash_codec_protobuf_spark import queries as Q
from .conftest import SF_DIR
from .parity import assert_parity

CASES = sorted(set(Q.all_queries()) & set(Q.all_oracles()))


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(spark, name):
    df = Q.all_queries()[name](spark, SF_DIR)
    assert_parity(df, Q.all_oracles()[name], SF_DIR)


# ops that are deliberately non-SQL-expressible (approximate / bit-twiddling);
# the driver records a weaker rows-only check for these
NO_ORACLE_OK = {"ann_lsh_topk", "simhash_neardup"}


def test_every_query_has_oracle_or_is_flagged():
    missing = set(Q.all_queries()) - set(Q.all_oracles())
    assert missing <= NO_ORACLE_OK, f"queries without oracle: {missing}"
