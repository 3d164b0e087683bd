#!/usr/bin/env python3
"""At-scale d04 value check (round-13; round-12 verdict task 5).

Validates the corpus-size-adaptive SimHash band layout at sf100 (5 M docs,
the 3x19-bit regime) against an independent DuckDB replay. The full
per-character FNV oracle is computationally infeasible at 5 M docs
(measured 30 s at 5 k docs => ~8 h), so the check splits into the two
halves that together cover the contract:

 1. LAYOUT + BANDING + HAMMING (the part that has never run at scale):
    DuckDB recomputes the adaptive band layout from n = COUNT(sigs) with
    the same exact integer arithmetic as `Dedup.simhashBandLayout`
    (bits = clamp(bitlen(n//16 - 1), 16, 31)), bands the 5 M
    Spark-exported signatures, self-joins the buckets, filters by
    popcount Hamming <= 16, and compares the ordered 200-row result
    against the Spark pairs output. Any divergence in band width, shift
    placement, bucket keying, or tie-breaking shows here.

 2. KERNEL SPOT CHECK at scale: DuckDB re-derives the full FNV-1a-64 /
    bit-vote simhash from raw text for a deterministic 2,000-doc sample
    (doc_id % 2500 == 0) and compares bit-exactly against the Spark
    signatures for the same docs (catches any scale-dependent kernel
    drift, e.g. encoding or tokenization differences in longer sf100
    texts).

Usage: d04_at_scale.py [sf_dir] [probe_dir]
Prerequisite: run `graft.D04Probe` first (writes probe_dir/{pairs,sigs}).
"""
import sys
import time

import duckdb

SQL_NORM = ("regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf100"
    probe = sys.argv[2] if len(sys.argv) > 2 else "target/d04_sf100"
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    con.execute(f"CREATE VIEW sigs AS SELECT * FROM read_parquet('{probe}/sigs/*.parquet')")
    con.execute(f"CREATE VIEW spark_pairs AS SELECT * FROM read_parquet('{probe}/pairs/*.parquet')")
    docs_glob = f"{sf_dir}/documents.parquet"
    import os
    if os.path.isdir(docs_glob):
        docs_glob += "/*.parquet"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs_glob}')")

    n, = con.execute("SELECT COUNT(*) FROM sigs").fetchone()
    bits, nb = con.execute("""
      SELECT bits, GREATEST(2, LEAST(4, 64 // bits)) FROM (
        SELECT LEAST(31, GREATEST(16, LENGTH(BIN(GREATEST(1, ? // 16) - 1)))) AS bits)
      """, [n]).fetchone()
    print(f"corpus n={n}  adaptive layout: {nb} bands x {bits} bits "
          f"(expect 3 x 19 at 5M)")

    # ---- half 1: layout + banding + hamming over ALL signatures ----
    t0 = time.time()
    replay = f"""
      WITH s AS (
        SELECT doc_id, sim AS raw,
               CAST(sim AS HUGEINT) +
                 CASE WHEN sim < 0 THEN CAST(18446744073709551616 AS HUGEINT)
                      ELSE 0 END AS sim
        FROM sigs),
      bandspec AS (
        SELECT UNNEST(GENERATE_SERIES(0, {nb} - 1)) AS b),
      banded AS (
        SELECT doc_id, sim, raw, bs.b AS band,
          (sim // (CAST(1 AS HUGEINT) << (bs.b * (64 - {bits}) // ({nb} - 1))))
            % (CAST(1 AS HUGEINT) << {bits}) AS key
        FROM s CROSS JOIN bandspec bs),
      pairs AS (
        -- Hamming via native bit_count on the raw two's-complement i64:
        -- xor is bitwise, sign-agnostic (validated: bit_count(-1) = 64)
        SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
          bit_count(xor(a.raw, b.raw)) AS hamming
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
      SELECT id1, id2, CAST(hamming AS INT) AS hamming
      FROM pairs WHERE hamming <= 16
      ORDER BY hamming, id1, id2 LIMIT 200"""
    duck = con.execute(replay).fetchall()
    spark = con.execute(
        "SELECT id1, id2, hamming FROM spark_pairs "
        "ORDER BY hamming, id1, id2").fetchall()
    match = duck == spark
    print(f"banding replay: {time.time()-t0:.1f}s  duck={len(duck)} rows "
          f"spark={len(spark)} rows  MATCH={match}")
    if not match:
        for i, (d, s) in enumerate(zip(duck, spark)):
            if d != s:
                print(f"  first divergence at row {i}: duck={d} spark={s}")
                break

    # ---- half 2: kernel spot check on a deterministic sample ----
    t0 = time.time()
    kernel = f"""
      WITH d AS (
        SELECT doc_id, {SQL_NORM} AS t FROM documents
        WHERE doc_id % 2500 = 0),
      w AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(t, ' ')) AS word FROM d),
      h AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
            list_transform(generate_series(1, len(word)),
              i -> CAST(ord(word[i]) AS HUGEINT))), (acc, b) ->
              (xor(acc, b) * 1099511628211)
                % CAST(18446744073709551616 AS HUGEINT)) AS wh
        FROM w),
      bits AS (
        SELECT doc_id, bb.b AS bit,
          SUM(CASE WHEN (wh // (CAST(1 AS HUGEINT) << bb.b)) % 2 = 1
                   THEN 1 ELSE -1 END) AS votes
        FROM h CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 63)) AS b) bb
        GROUP BY doc_id, bb.b),
      sim AS (
        SELECT doc_id,
          SUM(CASE WHEN votes > 0 THEN CAST(1 AS HUGEINT) << bit
                   ELSE CAST(0 AS HUGEINT) END) AS sim
        FROM bits GROUP BY doc_id)
      SELECT COUNT(*) AS total,
             SUM(CASE WHEN sim.sim =
                   CAST(g.sim AS HUGEINT) +
                     CASE WHEN g.sim < 0
                          THEN CAST(18446744073709551616 AS HUGEINT)
                          ELSE 0 END
                 THEN 1 ELSE 0 END) AS matching
      FROM sim JOIN sigs g USING (doc_id)"""
    total, matching = con.execute(kernel).fetchone()
    print(f"kernel sample: {time.time()-t0:.1f}s  {matching}/{total} "
          f"signatures bit-exact  MATCH={total == matching and total > 0}")
    ok = match and total == matching and total > 0
    print(f"AT-SCALE d04 VALUE CHECK: {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
