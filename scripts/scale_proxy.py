#!/usr/bin/env python3
"""DuckDB proxy timings for the scaling experiments.

Runs the repo's own oracle SQL (the exact text the Spark engine executes)
in DuckDB over a generated scale directory, 32 threads, warm, median-of-3 —
the same protocol the round-6 judge used for the sf0.1 proxy.

Usage: scale_proxy.py <scaleDir> [<oracle_sql.json>] [<prefixes>]
  prefixes: comma-separated query-name prefixes to run (default tpch_q;
            e.g. "cbx_q" for ClickBench, "tpcds_q04,tpcds_q11" for a
            TPC-DS subset — the star-schema/hits synthesis CTEs ride
            inside the oracle SQL, so only base fixture tables register).
Emits one JSON line: {"sf": dir, "total": s, "queries": {name: sec}}.
"""
import json
import os
import statistics
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    d = sys.argv[1]
    oracle_path = sys.argv[2] if len(sys.argv) > 2 else \
        "target/verify_new/oracle_sql.json"
    prefixes = tuple((sys.argv[3] if len(sys.argv) > 3 else "tpch_q")
                     .split(","))
    sql = {k: v for k, v in json.load(open(oracle_path)).items()
           if k.startswith(prefixes)}
    if not sql:
        sys.exit(f"no oracle queries match prefixes {prefixes}")
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        # generated scale dirs are directories of part files; the driver
        # fixtures are single parquet files — support both layouts; skip
        # tables the scale dir doesn't carry (subset regens)
        path = f"{d}/{t}.parquet"
        if not os.path.exists(path):
            continue
        glob = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")
    out = {}
    for name in sorted(sql):
        q = sql[name]
        con.execute(q).fetchall()  # warm (buffer pool + plan)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(q).fetchall()
            runs.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(runs), 4)
        print(f"  {name}: {out[name]:.3f}s", file=sys.stderr)
    print(json.dumps({"sf": d, "total": round(sum(out.values()), 4),
                      "queries": out}))


if __name__ == "__main__":
    main()
