"""Spark-vs-DuckDB comparison harness, mirroring the driver's correctness gate:
row-count + column names + order-insensitive value comparison."""

from __future__ import annotations

import math

import duckdb

SF_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in SF_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def assert_parity(spark_df, oracle_sql: str, sf_dir: str, float_round: int = 9):
    con = duck_connection(sf_dir)
    oracle = con.execute(oracle_sql)
    o_cols = [d[0] for d in oracle.description]
    o_rows = oracle.fetchall()
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(s_cols) == sorted(o_cols), f"columns differ: {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), f"row count {len(s_rows)} vs {len(o_rows)}"

    # align column order by name, then compare as sorted multisets
    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    o_idx = [o_cols.index(c) for c in sorted(o_cols)]
    s_norm = sorted(repr(tuple(_norm(r[i]) for i in s_idx)) for r in s_rows)
    o_norm = sorted(repr(tuple(_norm(r[i]) for i in o_idx)) for r in o_rows)
    mismatches = [(a, b) for a, b in zip(s_norm, o_norm) if a != b]
    assert not mismatches, f"{len(mismatches)} value mismatches; first: {mismatches[0]}"
