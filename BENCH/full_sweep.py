"""Full-registry correctness sweep: every queries() entry vs its DuckDB
oracle at sf0.01 (the driver's own comparison, but over ALL registrations,
not just the 50-entry CORRECTNESS window).

Writes BENCH/sweep_r{ROUND}_sf0.01.txt.  Usage:
    SPARK_GRAFT_ROUND=7 python BENCH/full_sweep.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SWEEP_SF_DIR", "/root/testdata/sf0.01")
ROUND = os.environ.get("SPARK_GRAFT_ROUND", "7")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, os_ = E.queries(), E.oracle_sql()
    lines, n_ok = [], 0
    for i, (name, fn) in enumerate(qs.items(), 1):
        t0 = time.time()
        try:
            got = sorted(map(tuple, fn(spark, SF_DIR).collect()))
            if name in os_:
                want = sorted(map(tuple, con.execute(os_[name]).fetchall()))
                ok = got == want
                status = "OK" if ok else "MISMATCH"
            else:
                status = "NO_ORACLE"
                ok = False
            n_ok += bool(ok)
            lines.append(f"{i:3d} {name:32s} {status} rows={len(got)} "
                         f"{time.time() - t0:.1f}s")
        except Exception as ex:  # noqa: BLE001 - sweep must finish
            lines.append(f"{i:3d} {name:32s} ERROR {type(ex).__name__}: "
                         f"{str(ex).splitlines()[0][:100]}")
        print(lines[-1], flush=True)
    lines.append(f"TOTAL {n_ok}/{len(qs)} exact-oracle green")
    out = f"BENCH/sweep_r{ROUND}_sf0.01.txt"
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(lines[-1], "->", out)
    spark.stop()


if __name__ == "__main__":
    main()
