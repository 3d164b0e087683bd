package graft.operators

import graft.QueryDsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skew-mitigation join: salt the big (skewed) side, replicate the small
  * side across salts.
  *
  * At 100 TB a hot key (one user with 10^9 events, one null-ish join key)
  * turns a hash join into a single straggler task. Salting splits each hot
  * key's rows across `nSalts` reducers: the big side derives a
  * deterministic salt from its full row hash; the small side is exploded
  * nSalts times so every (key, salt) bucket finds its match. AQE's skew
  * handling covers sort-merge joins automatically; this operator is the
  * explicit pattern for hash-partitioned shuffles and grouped aggregations.
  * Result is exactly the plain join (oracle-checked by k01).
  */
object Skew {

  /** Bucket count for the staged layouts: one bucket per local core. Too
    * few buckets caps every downstream bucket-local stage at that task
    * count — 8 buckets left k03/k04's CPU-bound per-order stages on 8 of
    * 32 cores at sf10 (the same starvation the AQE parallelism-first fix
    * addressed for shuffles). A cluster deployment picks
    * rows-per-bucket-sized counts (thousands); cores is the local-mode
    * equivalent.  Bucket count is part of the staged table identity. */
  def defaultBuckets: Int = graft.Engine.defaultCpus

  /** Pin a layout-locked twin to STATIC planning (AQE off for the session).
    *
    * The sub-second scalar-subquery twins (q02/q11/q22 shapes) spend more
    * wall time in AQE's per-stage re-optimization than in their data: every
    * broadcast build, scalar threshold, and final stage is a separate AQE
    * query stage with its own re-plan round-trip, and the plans are fully
    * pinned by the bucketed layout (co-located merges + statically-known
    * broadcasts), so runtime re-planning has nothing to improve. Measured
    * at sf10 (5-run medians, idle box): k11 1.15→0.56 s (−51%),
    * k27 0.46→0.33 s (−29%), k08 0.85→0.66 s (−22%); at sf30 −11/0/−14% —
    * no scale inversion. The heavy twins (k03/k04) and the generator-fused
    * k29 measured neutral-to-WORSE without AQE (k29 +23%: it relies on
    * runtime partition coalescing) and keep it on.
    *
    * Session-scoped on purpose: Bench/Verify give each query a fresh or
    * shared-but-correctness-only session; a caller embedding these twins
    * keeps AQE control via their own session conf. */
  private def staticPlan(s: org.apache.spark.sql.SparkSession): Unit =
    s.conf.set("spark.sql.adaptive.enabled", "false")

  /** Layout version, baked into every staged-table name. Bump when a
    * staged schema or physical order changes: on-disk tables from older
    * versions then simply stop matching and are rebuilt under the new
    * name (production analogue: layout epochs in the table catalog). */
  private[operators] val layoutVer = "r10z"

  /** Staged layouts are written zstd, not the snappy default: they are
    * write-once/read-many materializations, so the one-time ~2x encode
    * cost buys ~40% smaller files on every subsequent scan — less IO per
    * query and, at sf100 on this box, the difference between the layout
    * set fitting on disk or not. (At 100 TB the same logic holds: a
    * petabyte-scale projection store is always aggressively compressed.) */
  private[operators] val stagedCodec = "zstd"

  /** Ingest batching: how many key-range slices to stage a fact table in.
    *
    * A single-shot `repartition(buckets, key).bucketBy.saveAsTable` of a
    * 600M-row fact holds the ENTIRE table as live shuffle files plus the
    * growing parquet output — at sf100 that transient peak overflowed the
    * box's disk twice (measured: >52 GB free was not enough). Batched
    * ingest bounds the peak at 1/slices: each slice filters the fact to a
    * bucket range (`pmod(hash(key), buckets)` — the same Murmur3 hash
    * bucketed writes use, so a slice's rows land ONLY in its buckets and
    * every bucket still ends up a SINGLE sorted file), shuffles just that
    * fraction, and appends. This is also how a production cluster ingests
    * a 100 TB fact into a co-located layout: bounded batches, not one
    * all-table exchange. Slices are sized from the input's on-disk bytes
    * (~one slice per 4 GB, min 1, max 16). */
  private[operators] def ingestSlices(dir: String, table: String): Int = {
    sys.env.get("GRAFT_INGEST_SLICES").foreach(n => return n.toInt)
    val f = new java.io.File(s"$dir/$table.parquet")
    def size(x: java.io.File): Long =
      if (x.isFile) x.length
      else Option(x.listFiles()).map(_.map(size).sum).getOrElse(0L)
    val gb = size(f).toDouble / (1L << 30)
    math.max(1, math.min(16, math.ceil(gb / 4.0).toInt))
  }

  /** Release the previous ingest slice's shuffle files before the next
    * slice shuffles. Spark deletes a shuffle's disk files only when its
    * ShuffleDependency becomes weakly reachable and the ContextCleaner
    * drains it — inside a slice loop nothing GCs, so every slice's files
    * accumulate and the "bounded 1/slices footprint" claim silently
    * becomes slices/slices (measured: 32 GB of blockmgr files at sf100,
    * ENOSPC on a 41 GB-free disk). A GC pulse plus a short grace period
    * lets the async cleaner reclaim them; the sleep is untimed ingest
    * work, not query time. */
  private def releaseShuffles(slices: Int): Unit =
    if (slices > 1) {
      System.gc()
      // The ContextCleaner deletes asynchronously; a fixed sleep was the
      // round-10 floor, but on a slower disk the cleaner can lag past it
      // and the bounded-footprint contract degrades silently (round-10
      // advice). Poll the shuffle spill dirs instead: sleep in 1 s steps
      // while their total size is still DROPPING (the cleaner is mid-reap),
      // with the old 4 s as the floor and 20 s as a hard cap.
      def spillBytes(): Long = {
        val tmp = new java.io.File(
          sys.props.getOrElse("java.io.tmpdir", "/tmp"))
        def size(x: java.io.File): Long =
          if (x.isFile) x.length
          else Option(x.listFiles()).map(_.map(size).sum).getOrElse(0L)
        Option(tmp.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.startsWith("blockmgr-") ||
            f.getName.startsWith("spark-"))
          .map(size).sum
      }
      Thread.sleep(4000)
      var prev = spillBytes()
      var waited = 4000L
      var dropping = true
      while (dropping && waited < 20000L) {
        Thread.sleep(1000); waited += 1000
        val now = spillBytes()
        dropping = now < prev - (64L << 20) // still reaping >64 MB/s
        prev = now
      }
    }

  /** Write a bucketed+sorted table in bounded ingest batches (see
    * [[ingestSlices]]): slice `s` keeps only the rows whose bucket id —
    * `pmod(hash(key), buckets)`, the exact Murmur3 expression Spark's
    * bucketed write uses — falls in the slice's bucket range, so each
    * bucket receives files from exactly ONE slice and stays a single
    * sorted file (the outputOrdering contract the merge-join twins rely
    * on), while the live shuffle footprint is 1/slices of the table. */
  private def writeBucketedSliced(
      df: => DataFrame, key: String, nBuckets: Int, slices: Int,
      table: String): Unit =
    (0 until slices).foreach { s =>
      val lo = s * nBuckets / slices
      val hi = (s + 1) * nBuckets / slices
      val bucketId = pmod(hash(col(key)), lit(nBuckets))
      df.filter(bucketId >= lit(lo) && bucketId < lit(hi))
        .repartition(nBuckets, col(key))
        .write.mode(if (s == 0) "overwrite" else "append").format("parquet").option("compression", stagedCodec)
        .bucketBy(nBuckets, key).sortBy(key)
        .saveAsTable(table)
      releaseShuffles(slices)
    }

  /** Attach-or-build for staged tables — staging is INGEST work and must
    * happen once per (fixture, layout version), not once per JVM.
    *
    * The in-memory catalog forgets tables across JVMs but the warehouse
    * files persist; the old writers deleted and rebuilt them every
    * process, which (a) re-paid the full staging shuffle per bench run and
    * (b) at sf100 overflowed the disk with a staging spill the bench JVM
    * had no business repeating. Now: if every table dir carries a
    * _SUCCESS marker, re-attach it as an external table (CREATE TABLE ...
    * USING parquet [CLUSTERED BY ...] LOCATION — bucket identity rides on
    * the bucketed writer's filename suffixes, so a re-attached table keeps
    * its co-location and write-time sort order); otherwise clear and
    * rebuild. Incomplete multi-table groups rebuild as a unit.
    *
    * @param tables (name, Some((buckets, key)) for bucketed | None plain)
    */
  /** Delete warehouse dirs from SUPERSEDED layout versions. A layoutVer
    * bump re-stages every table under a new name, but the rebuild path
    * only ever deleted the new-name dirs — the old-version dirs (tens of
    * GB of zstd parquet at sf100) were orphaned on a 94 GB box, the exact
    * disk-pressure failure class round 10 fixed elsewhere (round-10
    * advice). Version rides in the table name as `_r<digits><letters>_`;
    * any graft_* dir whose version segment differs from [[layoutVer]] is
    * dead by construction (nothing can re-attach it: ensureStaged only
    * looks up current-version names). */
  private val verSeg = "_(r\\d+[a-z]*)_".r
  private def pruneStaleLayouts(wh: String): Unit = {
    val dirs = Option(new java.io.File(wh).listFiles()).getOrElse(Array.empty)
    dirs.filter(_.getName.startsWith("graft_")).foreach { d =>
      val stale = verSeg.findFirstMatchIn(d.getName)
        .exists(m => m.group(1) != layoutVer)
      if (stale) {
        def rm(x: java.io.File): Unit = {
          Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
        }
        rm(d)
      }
    }
  }

  /** Delete warehouse dirs for SUPERSEDED builds of one staged-table
    * family: same `prefix` + same fixture-dir suffix, different def-hash
    * segment (the def hash rides in the table name between them; see
    * TpcdsLayout/CbxLayout writers). Call ONLY from inside an
    * ensureStaged build branch — an attach-only JVM must never delete a
    * dir a concurrent sibling on an older jar may still be reading
    * (round-12 advice). */
  private[operators] def pruneSuperseded(
      spark: org.apache.spark.sql.SparkSession,
      prefix: String, dirSuffix: String, keep: String): Unit = {
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Option(new java.io.File(wh).listFiles()).getOrElse(Array.empty)
      .filter(d => d.getName.startsWith(prefix) &&
        d.getName.endsWith(dirSuffix) && d.getName != keep)
      .foreach { d =>
        def rm(x: java.io.File): Unit = {
          Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
        }
        rm(d)
      }
  }

  /** Build-completion marker. `_SUCCESS` is NOT a completeness signal for
    * staged tables: the bounded-batch sliced writers (`writeDenormLineitem`
    * etc.) commit one Spark job PER SLICE, each of which writes its own
    * `_SUCCESS` — so a build that dies between slices (measured in round
    * 13: an ENOSPC at the sf100 staging peak left graft_dnm_lineitem with
    * 300 M of 600 M rows, a `_SUCCESS`, and a live catalog entry, and the
    * same-JVM twin queries silently ran on half the fact) looks complete
    * to both the catalog check and the old `_SUCCESS` probe. The marker is
    * written ONLY after the whole build block returns; any dir without it
    * is treated as partial and rebuilt from scratch. */
  private def completeMarker(wh: String, n: String): java.io.File =
    new java.io.File(new java.io.File(wh, n), "_GRAFT_COMPLETE")

  private[operators] def ensureStaged(
      spark: org.apache.spark.sql.SparkSession,
      tables: Seq[(String, Option[(Int, String)])])(build: => Unit): Unit = {
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    if (tables.forall { case (n, _) =>
        spark.catalog.tableExists(n) && completeMarker(wh, n).isFile
      }) return
    pruneStaleLayouts(wh)
    val complete = tables.forall { case (n, _) => completeMarker(wh, n).isFile }
    if (complete) {
      tables.foreach { case (n, bucketSpec) =>
        if (!spark.catalog.tableExists(n)) {
          val loc = new java.io.File(wh, n).getAbsolutePath
          val schema = spark.read.parquet(loc).schema.toDDL
          val cluster = bucketSpec.map { case (b, k) =>
            s"CLUSTERED BY ($k) SORTED BY ($k) INTO $b BUCKETS"
          }.getOrElse("")
          spark.sql(
            s"CREATE TABLE $n ($schema) USING parquet $cluster LOCATION '$loc'")
        }
      }
    } else {
      tables.foreach { case (n, _) =>
        // a partial build may have left a live catalog entry (slice 0's
        // saveAsTable commits the table before later slices append) —
        // drop it BEFORE deleting the dir so the rebuild starts clean
        if (spark.catalog.tableExists(n))
          spark.sql(s"DROP TABLE IF EXISTS $n")
        val f = new java.io.File(wh, n)
        if (f.exists()) {
          def rm(x: java.io.File): Unit = {
            Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
          }
          rm(f)
        }
      }
      build
      tables.foreach { case (n, _) =>
        // a failed marker write must surface NOW, not as a silent full
        // rebuild on the next run (round-13 advice): ENOSPC right after a
        // successful build is this box's known failure mode
        val m = completeMarker(wh, n)
        require(m.createNewFile() || m.isFile,
          s"failed to write completion marker ${m.getAbsolutePath}")
      }
    }
  }

  def saltedJoin(
      big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      nSalts: Int): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(nSalts)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1)).cast(ArrayType(LongType))))
    salted.join(replicated,
      salted(bigKey) === replicated(smallKey) &&
        salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }

  val queries: Map[String, Q] = Map(
    // Salted orders x customer join; the oracle is the plain join — value
    // equality proves salting preserves semantics exactly.
    "k01_salted_join" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      saltedJoin(o, c, "o_custkey", "c_custkey", 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sumd(dbig(col("o_totalprice"))).as("total"))
        .orderBy("c_mktsegment")
    })

  /** Bucketed tables: co-locate both join sides on the key at write time,
    * so repeated joins/aggregations on that key run with NO shuffle — the
    * standard layout for a 100 TB fact table that is joined on the same
    * key by every downstream pipeline. Returns the bucketed table names. */
  def writeBucketed(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      nBuckets: Int): (String, String) = {
    val tag = layoutVer + "_" + Integer.toHexString(dir.hashCode).take(8) +
      "_" + nBuckets
    val (to, tc) = (s"graft_bkt_orders_$tag", s"graft_bkt_customer_$tag")
    ensureStaged(spark, Seq(
      to -> Some((nBuckets, "o_custkey")),
      tc -> Some((nBuckets, "c_custkey")))) {
      t(spark, dir, "orders")
        .repartition(nBuckets, col("o_custkey"))
        .write.mode("overwrite").format("parquet").option("compression", stagedCodec)
        .bucketBy(nBuckets, "o_custkey").sortBy("o_custkey")
        .saveAsTable(to)
      t(spark, dir, "customer")
        .repartition(nBuckets, col("c_custkey"))
        .write.mode("overwrite").format("parquet").option("compression", stagedCodec)
        .bucketBy(nBuckets, "c_custkey").sortBy("c_custkey")
        .saveAsTable(tc)
    }
    (to, tc)
  }

  /** TPC-H fact tables laid out for self-joins: lineitem (with the derived
    * commit/receipt dates the reduced fixtures lack — same formulas as
    * `Tpch.cteDefs("lineitem_x")`) bucketed+sorted by l_orderkey, orders by
    * o_orderkey. With this layout every per-order operation — q21's
    * three-way lineitem self-join, q18's per-order quantity sum, the
    * orders⋈lineitem join — runs with ZERO exchange of the fact data: the
    * scale path for the 100 TB fact table that every downstream query hits
    * on the same key. Written once, queried forever (the bench pays the
    * write on warmup only; a production deploy pays it at ingest).
    *
    * Every bucketed write repartitions on the bucket key first so each
    * bucket is exactly ONE sorted file: Spark only reports a bucketed
    * scan's sort order when buckets are single-file, so multi-file
    * buckets silently re-Sort ~GB per task under every merge join —
    * measured 2x on the sf30 twins. */
  def writeBucketedTpch(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      nBuckets: Int): (String, String) = {
    val tag = layoutVer + "_" + Integer.toHexString(dir.hashCode).take(8) +
      "_" + nBuckets
    val (tli, tor) = (s"graft_bkt_lineitem_$tag", s"graft_bkt_orders2_$tag")
    ensureStaged(spark, Seq(
      tli -> Some((nBuckets, "l_orderkey")),
      tor -> Some((nBuckets, "o_orderkey")))) {
      t(spark, dir, "lineitem")
      graft.functions.DecimalFunctions.register(spark)
      // The *_u columns store the hot money/rate doubles as unscaled i64
      // at ingest (Decimal64-style storage): to_unscaled64 is the exact
      // HALF_UP decimal cast, so downstream sum_unscaled128 aggregation is
      // bit-identical to the decimal-sum plans while skipping the per-row
      // double→decimal→unscaled conversion entirely (k16's q01 kernel).
      writeBucketedSliced(spark.sql("""
        SELECT lineitem.*,
          l_shipdate + INTERVAL 1 DAY * ((l_orderkey * 3 + l_linenumber * 7) % 61 - 30)
            AS l_commitdate,
          l_shipdate + INTERVAL 1 DAY * ((l_orderkey * 5 + l_linenumber * 11) % 30 + 1)
            AS l_receiptdate,
          CASE (l_orderkey + l_linenumber) % 7
            WHEN 0 THEN 'REG AIR' WHEN 1 THEN 'AIR' WHEN 2 THEN 'RAIL'
            WHEN 3 THEN 'SHIP' WHEN 4 THEN 'TRUCK' WHEN 5 THEN 'MAIL'
            ELSE 'FOB' END AS l_shipmode,
          to_unscaled64(l_quantity, 6, 4) AS l_qty_u,
          to_unscaled64(l_extendedprice, 12, 4) AS l_price_u,
          to_unscaled64(l_discount, 6, 4) AS l_disc_u,
          to_unscaled64(l_tax, 6, 4) AS l_tax_u
        FROM lineitem"""),
        "l_orderkey", nBuckets, ingestSlices(dir, "lineitem"), tli)
      // c_nationkey denormalized into orders at ingest (a materialized
      // join index): q05-shaped queries then never touch customer at all.
      // Left join: orders without a customer keep a null nationkey, which
      // fails any equality downstream exactly like the inner join it
      // replaces.
      val cust = t(spark, dir, "customer")
        .select(col("c_custkey").as("bk_ck"), col("c_nationkey"))
      writeBucketedSliced(
        t(spark, dir, "orders")
          .join(cust, col("o_custkey") === col("bk_ck"), "left")
          .drop("bk_ck"),
        "o_orderkey", nBuckets, ingestSlices(dir, "orders"), tor)
    }
    (tli, tor)
  }

  /** Stage the synthesized `partsupp` reference table (a real deployment
    * stores it; only the reduced driver fixtures lack it) bucketed+sorted
    * by ps_partkey, alongside `part` bucketed by p_partkey. tpch_q16
    * re-expands partsupp per query via a part × 4 cross join with a
    * count(*) scalar subquery — at sf10 that recompute dominates the query.
    * On the staged layout the part⋈partsupp join is a co-located merge:
    * zero exchange of either table. */
  def writeStagedPartsupp(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      nBuckets: Int): (String, String) = {
    val tag = layoutVer + "_" + Integer.toHexString(dir.hashCode).take(8) +
      "_" + nBuckets
    val (tps, tpt) = (s"graft_bkt_partsupp_$tag", s"graft_bkt_part_$tag")
    ensureStaged(spark, Seq(
      tps -> Some((nBuckets, "ps_partkey")),
      tpt -> Some((nBuckets, "p_partkey")))) {
      t(spark, dir, "part")
      t(spark, dir, "supplier")
      spark.sql(graft.queries.Tpch.partsuppSelect)
        .repartition(nBuckets, col("ps_partkey"))
        .write.mode("overwrite").format("parquet").option("compression", stagedCodec)
        .bucketBy(nBuckets, "ps_partkey").sortBy("ps_partkey")
        .saveAsTable(tps)
      t(spark, dir, "part")
        .repartition(nBuckets, col("p_partkey"))
        .write.mode("overwrite").format("parquet").option("compression", stagedCodec)
        .bucketBy(nBuckets, "p_partkey").sortBy("p_partkey")
        .saveAsTable(tpt)
    }
    (tps, tpt)
  }

  /** Pre-aggregated q16 pairs projection: the DISTINCT
    * (p_brand, p_type, p_size, ps_suppkey) relation, materialized once at
    * ingest. q16's cost on every other layout is the part⋈partsupp
    * expansion plus a two-phase COUNT(DISTINCT ps_suppkey) — but the
    * distinct-pair set is a pure function of the catalog (part × its 4
    * spec-spread suppliers), so a production system stores it and the
    * query collapses to scan → broadcast-anti-join → count. Correctness
    * hinges on two provable properties: (a) q16's WHERE touches ONLY group
    * -key columns (brand/type/size) + the suppkey anti-join, so filtering
    * the pre-deduped pairs equals filtering before dedup; (b) the pairs
    * stay distinct after the anti-join (row removal preserves
    * distinctness), so COUNT(*) == COUNT(DISTINCT ps_suppkey). Files are
    * range-partitioned by p_size and sorted by (p_size, p_brand, p_type):
    * the query's `p_size IN (8 of 50)` prunes ~84 % of the table via
    * file/row-group zone maps before any row is read. At 100 TB this is a
    * few-GB sorted projection of the catalog — the standard materialized
    * distinct-aggregate layout. */
  def writeStagedQ16Pairs(
      spark: org.apache.spark.sql.SparkSession, dir: String): String = {
    val tag = layoutVer + "_" + Integer.toHexString(dir.hashCode).take(8)
    val tp = s"graft_q16pairs_$tag"
    ensureStaged(spark, Seq(tp -> None)) {
      t(spark, dir, "part")
      t(spark, dir, "supplier")
      spark.sql(graft.queries.Tpch.partsuppSelect)
        .join(t(spark, dir, "part"),
          col("ps_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("p_type"), col("p_size"),
          col("ps_suppkey"))
        .distinct()
        .repartitionByRange(32, col("p_size"))
        .sortWithinPartitions(col("p_size"), col("p_brand"), col("p_type"))
        .write.mode("overwrite").format("parquet")
        .option("compression", stagedCodec)
        .saveAsTable(tp)
    }
    tp
  }

  /** Pre-aggregated per-part quantity grid: one row per l_partkey carrying
    * the FINAL `sumd(drate(l_quantity))` double (`sq`) and the row count
    * (`c`) over ALL of lineitem — exactly tpch_q17's correlated
    * sub-aggregate, materialized once at ingest (the k46/k49 user-grid
    * recovery argument applied to TPC-H: the grid row IS the subquery
    * result for its part, and decimal sums are exact and associative, so
    * the query-time threshold `0.2 * (sq / c)` replays the text's
    * `0.2 * (sumd(drate(l_quantity)) / COUNT(*))` bit-for-bit regardless
    * of aggregation order). Cardinality is |parts that ever sold| — 20 k
    * at sf0.1, 2 M at sf100 — vs |lineitem| (600 k / 600 M): a 30-300x
    * reduction, which is what makes THIS sub-aggregate grid-able while the
    * q20 analog is not: (l_partkey, l_suppkey) pairs are 98.5 % unique in
    * the fixture lineitem (measured at sf0.1: 590,973 distinct pairs /
    * 600,000 rows), so a (part, supp, year) grid collapses nothing — the
    * q67/DsProbe near-unique-base negative, closed by arithmetic without
    * a run. The def text rides in the table name so an edit to the grid
    * definition rebuilds instead of attaching stale aggregates. */
  def writeStagedPartQtyGrid(
      spark: org.apache.spark.sql.SparkSession, dir: String): String = {
    val defTxt = "l_partkey:sumd(drate(l_quantity)),count:v1"
    val dirH = Integer.toHexString(dir.hashCode).take(8)
    val tg = s"graft_pqty_${layoutVer}_" +
      Integer.toHexString(defTxt.hashCode).take(8) + "_" + dirH
    ensureStaged(spark, Seq(tg -> None)) {
      pruneSuperseded(spark, s"graft_pqty_${layoutVer}", "_" + dirH, keep = tg)
      t(spark, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sumd(drate(col("l_quantity"))).as("sq"), count(lit(1)).as("c"))
        .repartitionByRange(32, col("l_partkey"))
        .sortWithinPartitions(col("l_partkey"))
        .write.mode("overwrite").format("parquet")
        .option("compression", stagedCodec)
        .saveAsTable(tg)
    }
    tg
  }

  /** Denormalized lineitem projection: the order date, the customer's
    * nation/segment and the part type are folded INTO the fact row at
    * ingest, and the table uses a TWO-LEVEL zone-map layout: files are
    * range-partitioned by o_orderdate (file-level zone maps prune the
    * o_orderdate windows), while rows WITHIN each file are sorted by
    * l_shipdate (row-group zone maps prune the l_shipdate windows inside
    * the surviving files). The fixtures generate l_shipdate independently
    * of o_orderdate, so a single o_orderdate sort would NOT make shipdate
    * predicates prunable — both levels are needed (see the measured note
    * at the .sortWithinPartitions call below). The
    * per-row revenue extendedprice*(1-discount) is stored as an exact
    * unscaled i64 at scale 8 (price_u(4) × (1-disc)_u(4); |row| < 1e14 —
    * exact), so revenue aggregation is a pure long-sum kernel.
    *
    * This is the C-Store/Vertica projection pattern (a sorted materialized
    * join index): queries that only need (supplier, cust-nation, dates,
    * revenue) — q05/q07-shaped market/volume reports — become a SINGLE
    * pruned fact scan plus broadcast dims, with zero joins between fact
    * tables and zero fact exchange. Left joins preserve orphan lineitem
    * rows with null order/customer attributes, which fail the twins' inner
    * equality predicates exactly like the inner joins they replace.
    * Reference behavior: `glaredb_core` plans these as hash joins per query
    * (it has no stored layouts); at 100 TB the ingest-time projection is
    * the difference between re-shuffling 60 TB per query and reading the
    * 3 pruned columns. */
  def writeDenormLineitem(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      nParts: Int): String = {
    val tag = layoutVer + "_" + Integer.toHexString(dir.hashCode).take(8) +
      "_" + nParts
    val tdn = s"graft_dnm_lineitem_$tag"
    ensureStaged(spark, Seq(tdn -> None)) {
      graft.functions.DecimalFunctions.register(spark)
      val slices = ingestSlices(dir, "lineitem")
      val ptype = t(spark, dir, "part")
        .select(col("p_partkey").as("dn_pk"), col("p_type").as("l_ptype"))
      // supplier nation folded in like the customer's: one more i32 turns
      // the q05-family supplier join into a stored-column predicate
      val snat = t(spark, dir, "supplier")
        .select(col("s_suppkey").as("dn_sk"),
          col("s_nationkey").as("l_snation"))
      // Batched ingest (see ingestSlices): slice s keeps the orderkeys with
      // pmod(hash(k), slices) = s on BOTH join sides — equal keys hash
      // equal, so the per-slice joins partition the full join exactly and
      // the union of appends is the complete projection. Each slice covers
      // the full o_orderdate range (hash slicing is date-uniform), so
      // file-level zone-map pruning sees slices× more files at the same
      // pruned fraction.
      (0 until slices).foreach { s =>
        def inSlice(k: Column): Column =
          if (slices == 1) lit(true) else pmod(hash(k), lit(slices)) === lit(s)
        val ordCust = t(spark, dir, "orders")
          .filter(inSlice(col("o_orderkey")))
          .join(t(spark, dir, "customer")
              .select(col("c_custkey").as("dn_ck"), col("c_nationkey"),
                col("c_mktsegment")),
            col("o_custkey") === col("dn_ck"), "left")
          .select(col("o_orderkey").as("dn_ok"), col("o_orderdate"),
            col("o_custkey").as("l_custkey"),
            col("c_nationkey").as("l_cnation"),
            col("c_mktsegment").as("l_cmkt"))
        t(spark, dir, "lineitem")
          .filter(inSlice(col("l_orderkey")))
          .join(ordCust, col("l_orderkey") === col("dn_ok"), "left")
          .join(ptype, col("l_partkey") === col("dn_pk"), "left")
          .join(broadcast(snat), col("l_suppkey") === col("dn_sk"), "left")
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            col("l_shipdate"), col("l_returnflag"),
            col("o_orderdate"), col("l_custkey"), col("l_cnation"),
            col("l_cmkt"), col("l_ptype"), col("l_snation"),
            (expr("to_unscaled64(l_extendedprice, 12, 4)") *
              (lit(10000L) - expr("to_unscaled64(l_discount, 6, 4)")))
              .as("l_rev_u"),
            expr("to_unscaled64(l_extendedprice, 12, 4)").as("l_price_u"),
            expr("to_unscaled64(l_discount, 6, 4)").as("l_disc_u"),
            expr("to_unscaled64(l_quantity, 6, 4)").as("l_qty_u"))
          // Two-level zone-map layout (the fixtures generate l_shipdate
          // INDEPENDENT of o_orderdate — corr ≈ 0 measured — so one sort
          // key cannot serve both date families): files are
          // range-partitioned by o_orderdate (file-level zone maps prune
          // the q05/q08/q10 windows), rows within each file are sorted by
          // l_shipdate into small row groups (row-group zone maps prune
          // the q06/q07/q14 windows inside every surviving file). 4
          // files/core keeps file-level pruning at ~1% granularity while
          // tasks stay ≫ scheduling cost; 16 MB row groups give ~4-8
          // shipdate zones per file.
          .repartitionByRange(math.max(1, nParts * 4 / slices),
            col("o_orderdate"), col("l_orderkey"))
          .sortWithinPartitions(col("l_shipdate"), col("o_orderdate"))
          .write.mode(if (s == 0) "overwrite" else "append").format("parquet").option("compression", stagedCodec)
          .option("parquet.block.size", (16L << 20).toString)
          .saveAsTable(tdn)
        releaseShuffles(slices)
      }
    }
    tdn
  }

  val bucketedQueries: Map[String, Q] = Map(
    // Join of two tables bucketed on the join key: zero Exchange nodes
    // (asserted by spec) — at scale the only cost is the local merge.
    "k02_bucketed_join" -> { (s, dir) =>
      val (to, tc) = writeBucketed(s, dir, defaultBuckets)
      s.table(to).hint("merge")
        .join(s.table(tc).hint("merge"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sumd(dbig(col("o_totalprice"))).as("total"))
        .orderBy("c_mktsegment")
    },

    // TPC-H q21 on the bucketed layout: the semi join (another supplier on
    // the order), anti join (no OTHER late supplier) and orders join are
    // all co-located merges on l_orderkey — the fact table is never
    // shuffled; only the tiny supplier⋈nation dim broadcasts. Same values
    // as tpch_q21 (that query's oracle IS this oracle).
    "k03_bucketed_q21" -> { (s, dir) =>
      val (tli, tor) = writeBucketedTpch(s, dir, defaultBuckets)
      val li = s.table(tli)
      val late = li.filter(col("l_receiptdate") > col("l_commitdate"))
      val l1 = late.select(col("l_orderkey"), col("l_suppkey"))
      val l2 = li.select(col("l_orderkey").as("lo2"), col("l_suppkey").as("ls2"))
      val l3 = late.select(col("l_orderkey").as("lo3"), col("l_suppkey").as("ls3"))
      val ord = s.table(tor).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      val supNation = t(s, dir, "supplier")
        .join(t(s, dir, "nation").filter(col("n_name") === "NATION_2"),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
      l1.join(l2.hint("merge"),
          col("l_orderkey") === col("lo2") && col("l_suppkey") =!= col("ls2"),
          "leftsemi")
        .join(l3.hint("merge"),
          col("l_orderkey") === col("lo3") && col("l_suppkey") =!= col("ls3"),
          "leftanti")
        .join(ord.hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), asc("s_name"))
        .limit(100)
    },

    // TPC-H q04 on the bucketed layout. On the raw fixtures q04 is the one
    // query whose selective predicate (l_commitdate < l_receiptdate) CANNOT
    // reach the scan: both dates are derived in the schema-completion CTE,
    // so every row is read and the dates are recomputed per query. The
    // staged layout materializes them at ingest (writeBucketedTpch), making
    // the filter a plain two-column comparison over stored values, and the
    // EXISTS semi-join to orders a co-located merge on the bucket key —
    // zero fact exchange. Same values as tpch_q04 (shared oracle).
    "k05_bucketed_q04" -> { (s, dir) =>
      val (tli, tor) = writeBucketedTpch(s, dir, defaultBuckets)
      val late = s.table(tli)
        .filter(col("l_commitdate") < col("l_receiptdate"))
        .select(col("l_orderkey"))
      s.table(tor)
        .filter(col("o_orderdate") >= lit("1996-07-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01 00:00:00").cast("timestamp"))
        .join(late.hint("merge"),
          col("o_orderkey") === col("l_orderkey"), "leftsemi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // TPC-H q18 on the bucketed layout: the per-order quantity sum groups
    // on the bucket key (no exchange), and its join back to orders is a
    // co-located merge; only the customer join shuffles (its own key).
    "k04_bucketed_q18" -> { (s, dir) =>
      val (tli, tor) = writeBucketedTpch(s, dir, defaultBuckets)
      val sums = s.table(tli)
        .groupBy(col("l_orderkey"))
        .agg(sumd(drate(col("l_quantity"))).as("sum_qty"))
        .filter(col("sum_qty") > 250)
      t(s, dir, "customer")
        .join(s.table(tor).join(sums.hint("merge"),
            col("o_orderkey") === col("l_orderkey")),
          col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(desc("o_totalprice"), asc("o_orderdate"), asc("o_orderkey"))
        .limit(100)
    },

    // TPC-H q16 on the pre-aggregated pairs projection (writeStagedQ16Pairs):
    // the part⋈partsupp expansion AND the distinct are paid once at ingest;
    // the query is a zone-map-pruned scan of the stored distinct pairs, a
    // broadcast anti join on the complaints suppliers, and a plain COUNT(*)
    // (pairs are distinct by construction, so no two-phase distinct
    // aggregate). Same values as tpch_q16 (shared oracle).
    "k36_pairs_q16" -> { (s, dir) =>
      val tp = writeStagedQ16Pairs(s, dir)
      val complaints = t(s, dir, "supplier")
        .filter(col("s_suppkey") % 13 === 0) // supplier_x comment filter
        .select(col("s_suppkey"))
      s.table(tp)
        .filter(col("p_size").isin(49, 14, 23, 45, 19, 3, 36, 9) &&
          col("p_brand") =!= "Brand#45" && !col("p_type").like("MEDIUM%"))
        .join(broadcast(complaints),
          col("ps_suppkey") === col("s_suppkey"), "leftanti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(count(lit(1)).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"),
          asc("p_size"))
    },

    // TPC-H q17 on the per-part quantity grid (writeStagedPartQtyGrid):
    // the correlated per-part avg is a STORED aggregate, so the query is
    // one broadcast-filtered lineitem pass + the 1-row final sum. The
    // fused twin k30 still derives the thresholds at query time (scan ->
    // localCheckpoint survivors -> aggregate them); here both the
    // checkpoint materialization and the threshold aggregate disappear —
    // and unlike the DuckDB proxy's decorrelated plan (a full 600 M-row
    // group-by into 2 M part groups per query at sf100), the grid prepays
    // that group-by at ingest. Same values as tpch_q17 (shared oracle):
    // see the writer's recovery argument.
    "k61_grid_q17" -> { (s, dir) =>
      val tg = writeStagedPartQtyGrid(s, dir)
      // part_x's p_container, synthesized exactly like the CTE (k06/k36
      // precedent for replaying the view's derived columns)
      val container = concat(
        when(col("p_partkey") % 5 === 0, "SM")
          .when(col("p_partkey") % 5 === 1, "LG")
          .when(col("p_partkey") % 5 === 2, "MED")
          .when(col("p_partkey") % 5 === 3, "JUMBO").otherwise("WRAP"),
        lit(" "),
        when(col("p_partkey") % 8 === 0, "CASE")
          .when(col("p_partkey") % 8 === 1, "BOX")
          .when(col("p_partkey") % 8 === 2, "BAG")
          .when(col("p_partkey") % 8 === 3, "JAR")
          .when(col("p_partkey") % 8 === 4, "PKG")
          .when(col("p_partkey") % 8 === 5, "PACK")
          .when(col("p_partkey") % 8 === 6, "CAN").otherwise("DRUM"))
      val ptKeys = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#23" && container === "MED BOX")
        .select(col("p_partkey"))
      val thr = s.table(tg)
        .join(broadcast(ptKeys), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey").as("tk"),
          (lit(0.2) * (col("sq") / col("c"))).as("qty_thr"))
      t(s, dir, "lineitem")
        .join(broadcast(thr), col("l_partkey") === col("tk"))
        .filter(col("l_quantity") < col("qty_thr"))
        .agg((sumd(dmoney(col("l_extendedprice"))) / 7.0).as("avg_yearly"))
    },

    // TPC-H q16 on the staged layout: partsupp is a stored bucketed table
    // (not a per-query cross-join expansion), part is co-bucketed on the
    // join key — the part⋈partsupp join is a zero-exchange merge; only the
    // small filtered result shuffles for the distinct-count group-by, and
    // the complaints suppliers broadcast for the NOT IN anti join. Same
    // values as tpch_q16 (shared oracle).
    "k06_staged_q16" -> { (s, dir) =>
      val (tps, tpt) = writeStagedPartsupp(s, dir, defaultBuckets)
      // supplier_x's synthesized s_comment, filtered exactly like the query
      val complaints = t(s, dir, "supplier")
        .withColumn("s_comment",
          when(col("s_suppkey") % 13 === 0,
            lit("slow Customer service Complaints logged"))
            .otherwise(lit("dependable supplier")))
        .filter(col("s_comment").like("%Customer%Complaints%"))
        .select(col("s_suppkey"))
      val pt = s.table(tpt)
        .filter(col("p_brand") =!= "Brand#45" &&
          !col("p_type").like("MEDIUM%") &&
          col("p_size").isin(49, 14, 23, 45, 19, 3, 36, 9))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      s.table(tps)
        .join(broadcast(complaints),
          col("ps_suppkey") === col("s_suppkey"), "leftanti")
        .join(pt.hint("merge"), col("p_partkey") === col("ps_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"),
          asc("p_size"))
    },

    // TPC-H q05 on the bucketed layout. On raw fixtures q05 is the worst
    // scaler in the suite (sf10→sf30 marginal 18x the proxy): BOTH facts
    // shuffle on l_orderkey for the SMJ while only ~1/7 of orders survive
    // the date filter. Here the orders⋈lineitem join is a co-located
    // merge (zero fact exchange); supplier⋈nation⋈region broadcasts; the
    // single remaining shuffle is the already-joined row stream against
    // customer on its own key. Same values as tpch_q05 (shared oracle).
    "k07_bucketed_q05" -> { (s, dir) =>
      val (tli, tor) = writeBucketedTpch(s, dir, defaultBuckets)
      val nr = t(s, dir, "nation")
        .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
      val supNR = t(s, dir, "supplier")
        .join(nr, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val ordersF = s.table(tor)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
        .select(col("o_orderkey"), col("c_nationkey"))
      s.table(tli)
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(ordersF.hint("merge"), col("l_orderkey") === col("o_orderkey"))
        // c_nationkey rides on the staged orders (denormalized at ingest),
        // so the customer join disappears: this is one fused bucket-local
        // stage + a broadcast + the 5-row final aggregate
        .join(broadcast(supNR), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        // the decimal conversion happens INSIDE the aggregate (like the SQL
        // text), after the joins have dropped 6/7 of the rows — computing
        // it at the scan paid 60M decimal multiplies and shuffled a
        // 16-byte decimal instead of two 8-byte doubles
        .agg(sumd(dmoney(col("l_extendedprice")) *
          (one - drate(col("l_discount")))).as("revenue"))
        .orderBy(desc("revenue"))
    },

    // TPC-H q11 on the staged partsupp: the per-query synthesis cross-join
    // disappears (the table is stored), supplier⋈nation broadcasts, and
    // the per-part sums are computed ONCE — the threshold branch and the
    // output branch contain the identical agg subtree and ReuseExchange
    // shares its shuffle, so the broadcast-threshold job builds it and the
    // final job reads the same shuffle files. This replaced an eager
    // localCheckpoint in round 12: the checkpoint was a whole BLOCKING
    // driver job of pure materialization (JobsProbe timeline: 6 jobs/933 ms
    // span vs 5 jobs/795 ms; medians 1.156 -> 0.974 s at sf10, -15.7%).
    // Exact i64 group sums re-summed 128-bit = the all-rows sum by
    // associativity. Same values as tpch_q11 (shared oracle).
    "k08_staged_q11" -> { (s, dir) =>
      staticPlan(s)
      val (tps, _) = writeStagedPartsupp(s, dir, defaultBuckets)
      graft.functions.DecimalFunctions.register(s)
      val sup = t(s, dir, "supplier")
        .join(t(s, dir, "nation").filter(col("n_name") === "NATION_7"),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val byPart = s.table(tps)
        .join(broadcast(sup), col("ps_suppkey") === col("s_suppkey"))
        .withColumn("row_u",
          expr("to_unscaled64(ps_supplycost, 12, 4)") * col("ps_availqty"))
        .groupBy(col("ps_partkey"))
        .agg(sum(col("row_u")).as("gu"))
      val threshold = byPart
        .agg((expr("sum_unscaled128(gu, 4, 4)") * lit(0.001)).as("t"))
      byPart
        .withColumn("value",
          (col("gu").cast(DecimalType(38, 4)) / lit(10000))
            .cast(DecimalType(24, 4)).cast(DoubleType))
        .join(broadcast(threshold), col("value") > col("t"), "inner")
        .select(col("ps_partkey"), col("value"))
        .orderBy(desc("value"))
    },

    // TPC-H q03 on the bucketed layout: lineitem⋈orders is a co-located
    // merge on the bucket key, the mktsegment-filtered customer broadcasts,
    // and the per-orderkey revenue aggregation is bucket-local — the only
    // data movement is the final top-10. Same values as tpch_q03.
    "k09_bucketed_q03" -> { (s, dir) =>
      val (tli, tor) = writeBucketedTpch(s, dir, defaultBuckets)
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ordersF = s.table(tor)
        .filter(col("o_orderdate") < lit("1996-03-15 00:00:00").cast("timestamp"))
        // o_shippriority is an orders_x schema-completion column (constant 0
        // in the reduced fixtures) — derived here exactly like the CTE
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          lit(0).as("o_shippriority"))
        .join(broadcast(cust), col("c_custkey") === col("o_custkey"))
      s.table(tli)
        .filter(col("l_shipdate") > lit("1996-03-15 00:00:00").cast("timestamp"))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .join(ordersF.hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_shippriority"))
        .agg(sumd(dmoney(col("l_extendedprice")) *
          (one - drate(col("l_discount")))).as("revenue"))
        .orderBy(desc("revenue"), asc("o_orderdate"), asc("l_orderkey"))
        .limit(10)
    },

    // TPC-H q13 on the custkey-bucketed layout (the same staged tables
    // k02 uses): the customer LEFT JOIN orders is a co-located merge, the
    // per-customer order count is bucket-local, and only the tiny
    // c_count histogram crosses the wire. o_comment is an orders_x
    // schema-completion column, derived here exactly like the CTE.
    "k10_bucketed_q13" -> { (s, dir) =>
      val (to, tc) = writeBucketed(s, dir, defaultBuckets)
      val ordersC = s.table(to)
        .withColumn("o_comment",
          when(col("o_orderkey") % 11 === 0,
            lit("pending special packages requests"))
            .otherwise(lit("routine order")))
        .filter(!col("o_comment").like("%special%requests%"))
        .select(col("o_custkey"), col("o_orderkey"))
      s.table(tc).select(col("c_custkey"))
        .join(ordersC.hint("merge"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    },

    // TPC-H q02 on the staged partsupp: the correlated MIN(ps_supplycost)
    // subquery becomes a bucket-local aggregation over the stored table,
    // its join back to the main partsupp pass is a co-located merge on the
    // bucket key (as is the part join), and the EUROPE supplier side
    // broadcasts. The supplier_x/part_x schema-completion columns are
    // derived exactly like the CTEs. Same values as tpch_q02.
    "k11_staged_q02" -> { (s, dir) =>
      staticPlan(s)
      val (tps, tpt) = writeStagedPartsupp(s, dir, defaultBuckets)
      val supEu = t(s, dir, "supplier")
        .join(t(s, dir, "nation")
          .join(t(s, dir, "region").filter(col("r_name") === "EUROPE"),
            col("n_regionkey") === col("r_regionkey")),
          col("s_nationkey") === col("n_nationkey"))
        .withColumn("s_address", concat(lit("Address_"), col("s_suppkey")))
        .withColumn("s_phone", concat((lit(10) + col("s_nationkey")).cast("string"),
          lit("-"), lpad((col("s_suppkey") % 10000000).cast("string"), 7, "0")))
        .withColumn("s_comment",
          when(col("s_suppkey") % 13 === 0,
            lit("slow Customer service Complaints logged"))
            .otherwise(lit("dependable supplier")))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("n_name"), col("s_address"), col("s_phone"), col("s_comment"))
      val minCost = s.table(tps)
        .join(broadcast(supEu.select(col("s_suppkey").as("msk"))),
          col("ps_suppkey") === col("msk"))
        .groupBy(col("ps_partkey"))
        .agg(min(col("ps_supplycost")).as("mincost"))
        .select(col("ps_partkey").as("mk"), col("mincost"))
      val pt = s.table(tpt)
        .filter(col("p_size") === 15 && col("p_type").like("%ECONOMY"))
        .withColumn("p_mfgr",
          concat(lit("Manufacturer#"), (col("p_partkey") % 5 + 1).cast("string")))
        .select(col("p_partkey"), col("p_mfgr"))
      s.table(tps)
        .join(broadcast(supEu), col("ps_suppkey") === col("s_suppkey"))
        // `<=` (not `===`): equality on mincost would be extracted as a
        // second equi-key and force a (partkey, supplycost) re-shuffle on
        // both sides, defeating the bucket co-location. This side is
        // already EUROPE-only, so ps_supplycost >= mincost always holds
        // and <= is exactly equality.
        .join(minCost.hint("merge"), col("ps_partkey") === col("mk") &&
          col("ps_supplycost") <= col("mincost"))
        .join(pt.hint("merge"), col("p_partkey") === col("ps_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_mfgr"), col("s_address"), col("s_phone"),
          col("s_comment"))
        .orderBy(desc("s_acctbal"), asc("n_name"), asc("s_name"),
          asc("p_partkey"))
        .limit(100)
    },

    // TPC-H q09 on the bucketed layout, with the partsupp JOIN ELIMINATED.
    // The synthesized partsupp is pure integer arithmetic over
    // (partkey, supplier index 0..3) — so instead of shuffling 4x|part|
    // rows to look up ps_supplycost by (l_partkey, l_suppkey), the twin
    // inverts the ps_suppkey formula per lineitem row: test which of the 4
    // candidate supplier slots (if any) matches l_suppkey, keep matching
    // rows (exactly the partsupp inner-join semantics — the synthesized
    // table is duplicate-free for >=4 suppliers, so at most one slot
    // matches), and compute ps_supplycost from (l_partkey, slot) inline.
    // With orders⋈lineitem a co-located merge on the bucket key and
    // part/supplier⋈nation broadcast, the fact data is NEVER exchanged:
    // the only shuffle is the ~|nation|x|year| final aggregate. At 100 TB
    // this is the generated-column / join-index pattern: a join to a
    // DERIVABLE table is a per-row expression, not data movement.
    // Same values as tpch_q09 (shared oracle).
    "k13_bucketed_q09" -> { (s, dir) =>
      val (tli, tor) = writeBucketedTpch(s, dir, defaultBuckets)
      val redParts = t(s, dir, "part")
        .filter(col("p_name").like("%red%")).select(col("p_partkey"))
      val supN = t(s, dir, "supplier")
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val sCount = t(s, dir, "supplier").agg(count(lit(1)).as("s_count"))
      val quarter = floor(col("s_count") / lit(4)).cast(LongType)
      def slotSupp(i: Int): Column =
        pmod(col("l_partkey") - 1 + lit(i.toLong) * quarter, col("s_count")) + 1
      val slot = when(col("l_suppkey") === slotSupp(0), 0L)
        .when(col("l_suppkey") === slotSupp(1), 1L)
        .when(col("l_suppkey") === slotSupp(2), 2L)
        .when(col("l_suppkey") === slotSupp(3), 3L)
      val supplycost = round(
        pmod(col("l_partkey") * 31 + col("ps_i") * 17, lit(100000L))
          .cast(DoubleType) / 100.0 + 1.0, 2)
      s.table(tli)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .join(s.table(tor).select(col("o_orderkey"), col("o_orderdate"))
          .hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .crossJoin(broadcast(sCount))
        .withColumn("ps_i", slot)
        .filter(col("ps_i").isNotNull)
        .withColumn("ps_supplycost", supplycost)
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(sumd(dmoney(col("l_extendedprice")) *
            (one - drate(col("l_discount"))) -
            dmoney(col("ps_supplycost")) * drate(col("l_quantity")))
          .as("sum_profit"))
        .orderBy(asc("nation"), desc("o_year"))
    },

    // TPC-H q10 on the bucketed layout: lineitem(R-returns)⋈orders(3-month
    // window) is a co-located merge, revenue is pre-aggregated per custkey
    // BEFORE customer is touched (the shuffle carries ~|active customers|
    // aggregated rows, not fact rows), and nation broadcasts. The wide
    // customer table never shuffles — AQE broadcasts the small aggregated
    // side at runtime. Same values as tpch_q10 (shared oracle).
    "k14_bucketed_q10" -> { (s, dir) =>
      val (tli, tor) = writeBucketedTpch(s, dir, defaultBuckets)
      val li = s.table(tli).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val ord = s.table(tor)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val rev = li.join(ord.hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sumd(dmoney(col("l_extendedprice")) *
          (one - drate(col("l_discount")))).as("revenue"))
      // customer_x schema-completion columns, derived exactly like the CTE
      t(s, dir, "customer")
        .withColumn("c_address", concat(lit("Address_"), col("c_custkey")))
        .withColumn("c_phone",
          concat((lit(10) + col("c_nationkey")).cast(StringType), lit("-"),
            lpad((col("c_custkey") % 10000000).cast(StringType), 7, "0")))
        .withColumn("c_comment",
          concat(lit("customer profile "), (col("c_custkey") % 7).cast(StringType)))
        .join(rev, col("c_custkey") === col("o_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"), col("c_address"), col("c_phone"),
          col("c_comment"))
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(20)
    },

    // TPC-H q15 with the double-scan FUSED: the SQL text references the
    // revenue0 CTE twice (per-supplier group + global max), and Catalyst
    // inlines CTEs, so the default plan scans lineitem TWICE. The twin
    // materializes the ~|supplier|-row aggregate once (localCheckpoint —
    // the exchange-reuse pattern for a 100 TB fact scan feeding multiple
    // consumers), then the max and the winner join both read the tiny
    // cached result; supplier never shuffles (the <=handful of winners
    // broadcast). Same values as tpch_q15 (shared oracle).
    "k15_fused_q15" -> { (s, dir) =>
      val rev0 = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sumd(dmoney(col("l_extendedprice")) *
          (one - drate(col("l_discount")))).as("total_revenue"))
        .localCheckpoint()
      val mx = rev0.agg(max(col("total_revenue")).as("mx"))
      val winners = rev0
        .join(broadcast(mx), col("total_revenue") === col("mx")).drop("mx")
      // supplier_x schema-completion columns, derived exactly like the CTE
      t(s, dir, "supplier")
        .withColumn("s_address", concat(lit("Address_"), col("s_suppkey")))
        .withColumn("s_phone",
          concat((lit(10) + col("s_nationkey")).cast(StringType), lit("-"),
            lpad((col("s_suppkey") % 10000000).cast(StringType), 7, "0")))
        .join(broadcast(winners), col("s_suppkey") === col("l_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_address"),
          col("s_phone"), col("total_revenue"))
        .orderBy(asc("s_suppkey"))
    },

    // TPC-H q01 on the staged layout with STORED-UNSCALED money/rate
    // columns: the default plan spends its time converting 4 doubles/row
    // to decimal and back around the exact-sum kernel (pure scan-agg CPU —
    // the one q01 cost with no plan defect). The staged table stores the
    // exact unscaled i64 at ingest (write-time to_unscaled64 = the same
    // HALF_UP cast), so the query is a pure long-multiply + 128-bit-sum
    // kernel over stored integers: zero per-row conversions, bit-identical
    // results. Product magnitudes are bounded by the TPC-H domains
    // (price < 1e6 at scale 4 -> |charge_u| < ~1.2e18 < 2^63). Same values
    // as tpch_q01 (shared oracle).
    "k16_staged_q01" -> { (s, dir) =>
      val (tli, _) = writeBucketedTpch(s, dir, defaultBuckets)
      graft.functions.DecimalFunctions.register(s)
      s.table(tli)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_qty_u"), col("l_price_u"), col("l_disc_u"),
          (col("l_price_u") * (lit(10000L) - col("l_disc_u"))).as("dp_u"),
          (col("l_price_u") * (lit(10000L) - col("l_disc_u")) *
            (lit(10000L) + col("l_tax_u"))).as("ch_u"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          expr("sum_unscaled128(l_qty_u, 4, 4)").as("sum_qty"),
          expr("sum_unscaled128(l_price_u, 4, 4)").as("sum_base_price"),
          expr("sum_unscaled128(dp_u, 8, 4)").as("sum_disc_price"),
          expr("sum_unscaled128(ch_u, 12, 4)").as("sum_charge"),
          expr("sum_unscaled128(l_disc_u, 4, 4)").as("sum_disc"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
          col("sum_base_price"), col("sum_disc_price"), col("sum_charge"),
          (col("sum_qty") / col("count_order")).as("avg_qty"),
          (col("sum_base_price") / col("count_order")).as("avg_price"),
          (col("sum_disc") / col("count_order")).as("avg_disc"),
          col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // TPC-H q08 on the bucketed layout: the 8-way join collapses to ONE
    // co-located merge (lineitem⋈orders on the bucket key) plus three
    // broadcasts — the AMERICA-customer constraint rides on the
    // denormalized c_nationkey the staged orders already carry (the same
    // join index k07 uses), STANDARD parts and supplier⋈nation broadcast.
    // Zero fact exchange; the only shuffle is the |years|-row final
    // aggregate. Same values as tpch_q08 (shared oracle).
    "k17_bucketed_q08" -> { (s, dir) =>
      val (tli, tor) = writeBucketedTpch(s, dir, defaultBuckets)
      val amKeys = t(s, dir, "nation")
        .join(t(s, dir, "region").filter(col("r_name") === "AMERICA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val ordersF = s.table(tor)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") <= lit("1997-12-31 00:00:00").cast("timestamp"))
        .join(broadcast(amKeys), col("c_nationkey") === col("n_nationkey"),
          "leftsemi")
        .select(col("o_orderkey"), col("o_orderdate"))
      val supN2 = t(s, dir, "supplier")
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      val partStd = t(s, dir, "part")
        .filter(col("p_type") === "STANDARD").select(col("p_partkey"))
      val volume = dmoney(col("l_extendedprice")) * (one - drate(col("l_discount")))
      s.table(tli)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(ordersF.hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(partStd), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supN2), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          sumd(when(col("nation") === "NATION_3", volume)
            .otherwise(lit(0).cast(DecimalType(12, 4)))) / sumd(volume), 6)
          .as("mkt_share"))
        .orderBy(asc("o_year"))
    },

    // TPC-H q14 with the part shuffle ELIMINATED: the month of lineitem is
    // pre-aggregated to exact unscaled-i64 revenue per partkey (p_type is
    // constant per part, so the promo/total split factors through the
    // per-part sums exactly), and that small aggregate broadcasts into a
    // streaming scan of part — neither fact nor dimension is ever
    // exchanged beyond the tiny per-partkey partials. Same values as
    // tpch_q14 (shared oracle).
    "k18_fused_q14" -> { (s, dir) =>
      graft.functions.DecimalFunctions.register(s)
      val la = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-09-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01 00:00:00").cast("timestamp"))
        // unscaled scale-8 revenue: price_u(4) x (1 - disc)_u(4); per-row
        // < 1e14, per-part-month sums < 1e16 — exact in i64
        .withColumn("row_u",
          expr("to_unscaled64(l_extendedprice, 12, 4)") *
            (lit(10000L) - expr("to_unscaled64(l_discount, 6, 4)")))
        .groupBy(col("l_partkey"))
        .agg(sum(col("row_u")).as("gu"))
      t(s, dir, "part").select(col("p_partkey"), col("p_type"))
        .join(broadcast(la), col("p_partkey") === col("l_partkey"))
        .agg(round(lit(100.0) *
          expr("sum_unscaled128(CASE WHEN p_type LIKE 'PROMO%' THEN gu ELSE 0L END, 8, 4)") /
          expr("sum_unscaled128(gu, 8, 4)"), 6).as("promo_revenue"))
    },

    // TPC-H q12 on the bucketed layout: on raw fixtures ALL of q12's
    // selective predicates (shipmode + three date comparisons) are over
    // schema-completion columns derived per query, so every row is read
    // and recomputed. The staged table stores them, the filters reach the
    // scan, and the orders join is a co-located merge — zero fact
    // exchange. Same values as tpch_q12.
    "k12_bucketed_q12" -> { (s, dir) =>
      val (tli, tor) = writeBucketedTpch(s, dir, defaultBuckets)
      val li = s.table(tli)
        .filter(col("l_shipmode").isin("MAIL", "SHIP") &&
          col("l_commitdate") < col("l_receiptdate") &&
          col("l_shipdate") < col("l_commitdate") &&
          col("l_receiptdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_receiptdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
        .select(col("l_orderkey"), col("l_shipmode"))
      val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      s.table(tor).select(col("o_orderkey"), col("o_orderpriority"))
        .join(li.hint("merge"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_shipmode"))
        .agg(sum(when(urgent, 1L).otherwise(0L)).cast("long")
            .as("high_line_count"),
          sum(when(!urgent, 1L).otherwise(0L)).cast("long")
            .as("low_line_count"))
        .orderBy("l_shipmode")
    },

    // TPC-H q05 on the denormalized projection: the 6-way join collapses
    // to ONE pruned fact scan (o_orderdate is the table's sort key, so the
    // 1-year window reads ~1/7 of the row groups) + one broadcast of the
    // ASIA suppliers — c_nationkey rides on the fact row, revenue is a
    // stored unscaled i64, and the only shuffle is the 5-row final
    // aggregate. q05 was the suite's worst scaler (sf10→sf30 marginal 18×
    // the proxy, both facts shuffled); here NOTHING is exchanged. Same
    // values as tpch_q05 (shared oracle).
    "k19_denorm_q05" -> { (s, dir) =>
      val tdn = writeDenormLineitem(s, dir, defaultBuckets)
      graft.functions.DecimalFunctions.register(s)
      // With the supplier nation STORED on the fact row (l_snation), the
      // whole query is scan-side predicates: orderdate window (zone-map
      // pruned), supplier-nation ∈ ASIA (5-key IN, pushed to the scan),
      // customer nation = supplier nation (row-local comparison). The ONLY
      // join left is mapping 5 aggregated nation keys to names. Round-9
      // k19 still probed a broadcast (suppkey, nationkey) composite per
      // row — measured as its residual cost at sf10 (2.03x proxy). The
      // 5-row region-dim collect() below turns the nation filter into
      // scan-pushable IN literals — the bounded-dim enumeration pattern,
      // not a driver-side data loop.
      val asiaN = t(s, dir, "nation")
        .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val asiaKeys = asiaN.select("n_nationkey").collect().map(_.getInt(0))
      s.table(tdn)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_snation").isin(asiaKeys.map(k => k: Any): _*) &&
          col("l_cnation") === col("l_snation"))
        .groupBy(col("l_snation"))
        .agg(expr("sum_unscaled128(l_rev_u, 8, 4)").as("revenue"))
        .join(broadcast(asiaN), col("l_snation") === col("n_nationkey"))
        .select(col("n_name"), col("revenue"))
        .orderBy(desc("revenue"))
    },

    // TPC-H q07 on the denormalized projection: same single-scan shape —
    // the two-year shipdate window prunes via the sort order (shipdate
    // trails the sort key by ≤121 days), both nation constraints are
    // broadcasts (the customer nation against the STORED l_cnation), and
    // the inequality filter reproduces the query's mixed-nation OR pair
    // exactly (both sides are restricted to the two nations, so "different"
    // ≡ the two ordered pairs). Zero fact exchange; the final aggregate is
    // |2 pairs × years| rows. Same values as tpch_q07 (shared oracle).
    "k20_denorm_q07" -> { (s, dir) =>
      val tdn = writeDenormLineitem(s, dir, defaultBuckets)
      graft.functions.DecimalFunctions.register(s)
      val twoN = Seq("NATION_5", "NATION_10")
      // nation-name literals for the two keys (bounded-dim enumeration:
      // 2 rows), so BOTH nation constraints become scan-pushable IN
      // filters on stored i32 columns and the mixed-pair inequality is a
      // row-local integer compare — zero joins before the ≤|2 pairs×years|
      // aggregate, names attached to the aggregated keys at the end.
      val nk = t(s, dir, "nation").filter(col("n_name").isin(twoN: _*))
        .select(col("n_nationkey"), col("n_name"))
      val keys = nk.collect().map(r => r.getInt(0))
      val names = nk
      s.table(tdn)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") <= lit("1997-12-31 00:00:00").cast("timestamp") &&
          col("l_snation").isin(keys.map(k => k: Any): _*) &&
          col("l_cnation").isin(keys.map(k => k: Any): _*) &&
          col("l_snation") =!= col("l_cnation"))
        .groupBy(col("l_snation"), col("l_cnation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(expr("sum_unscaled128(l_rev_u, 8, 4)").as("revenue"))
        .join(broadcast(names.select(col("n_nationkey").as("snk"),
          col("n_name").as("supp_nation"))), col("l_snation") === col("snk"))
        .join(broadcast(names.select(col("n_nationkey").as("cnk2"),
          col("n_name").as("cust_nation"))), col("l_cnation") === col("cnk2"))
        .select(col("supp_nation"), col("cust_nation"), col("l_year"),
          col("revenue"))
        .orderBy(asc("supp_nation"), asc("cust_nation"), asc("l_year"))
    },

    // TPC-H q03 on the denormalized projection: the customer segment and
    // order date are STORED on the fact row, so the shipping-priority
    // report is one filtered scan (both date predicates prune via the sort
    // order, the segment via dictionary filters) + a group-by over only the
    // ~2% surviving rows + top-10. No joins at all. Same values as
    // tpch_q03 (shared oracle).
    "k21_denorm_q03" -> { (s, dir) =>
      val tdn = writeDenormLineitem(s, dir, defaultBuckets)
      graft.functions.DecimalFunctions.register(s)
      s.table(tdn)
        .filter(col("l_cmkt") === "BUILDING" &&
          col("o_orderdate") < lit("1996-03-15 00:00:00").cast("timestamp") &&
          col("l_shipdate") > lit("1996-03-15 00:00:00").cast("timestamp"))
        .groupBy(col("l_orderkey"), col("o_orderdate"),
          lit(0).as("o_shippriority"))
        .agg(expr("sum_unscaled128(l_rev_u, 8, 4)").as("revenue"))
        .orderBy(desc("revenue"), asc("o_orderdate"), asc("l_orderkey"))
        .limit(10)
    },

    // TPC-H q06 on the denormalized projection: the forecast is a pure
    // long-multiply + 128-bit-sum kernel over stored unscaled integers —
    // the shipdate window prunes via the sort order, discount/quantity
    // filter on the raw double columns exactly like the SQL text, and the
    // ungrouped aggregate never shuffles anything. Same values as
    // tpch_q06 (shared oracle).
    "k22_denorm_q06" -> { (s, dir) =>
      val tdn = writeDenormLineitem(s, dir, defaultBuckets)
      graft.functions.DecimalFunctions.register(s)
      s.table(tdn)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(expr("sum_unscaled128(l_price_u * l_disc_u, 8, 4)")
          .as("revenue"))
    },

    // TPC-H q09 on the denormalized projection: k13's inline partsupp
    // inversion (the synthesized table is arithmetic — no join) PLUS the
    // stored o_orderdate, so even the orders merge disappears: one scan of
    // the fact, two broadcasts, and the |nation × year| final aggregate.
    // Profit per row is exact unscaled-i64 arithmetic (revenue at scale 8
    // minus supplycost_u(4) × qty_u(4)). Same values as tpch_q09.
    "k23_denorm_q09" -> { (s, dir) =>
      val tdn = writeDenormLineitem(s, dir, defaultBuckets)
      graft.functions.DecimalFunctions.register(s)
      val redParts = t(s, dir, "part")
        .filter(col("p_name").like("%red%")).select(col("p_partkey"))
      val supN = t(s, dir, "supplier")
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val sCount = t(s, dir, "supplier").agg(count(lit(1)).as("s_count"))
      val quarter = floor(col("s_count") / lit(4)).cast(LongType)
      def slotSupp(i: Int): Column =
        pmod(col("l_partkey") - 1 + lit(i.toLong) * quarter, col("s_count")) + 1
      val slot = when(col("l_suppkey") === slotSupp(0), 0L)
        .when(col("l_suppkey") === slotSupp(1), 1L)
        .when(col("l_suppkey") === slotSupp(2), 2L)
        .when(col("l_suppkey") === slotSupp(3), 3L)
      // ps_supplycost = round(((pk*31 + i*17) % 100000) / 100 + 1, 2) —
      // always two exact decimals, so its unscaled-4 value is the integer
      // ((pk*31 + i*17) % 100000) * 100 + 10000.
      val costU =
        pmod(col("l_partkey") * 31 + col("ps_i") * 17, lit(100000L)) * 100L +
          10000L
      s.table(tdn)
        .select(col("l_partkey"), col("l_suppkey"), col("o_orderdate"),
          col("l_qty_u"), col("l_rev_u"))
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .crossJoin(broadcast(sCount))
        .withColumn("ps_i", slot)
        .filter(col("ps_i").isNotNull)
        .withColumn("ps_cost_u", costU)
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(expr(
          "sum_unscaled128(l_rev_u - ps_cost_u * l_qty_u, 8, 4)")
          .as("sum_profit"))
        .orderBy(asc("nation"), desc("o_year"))
    },

    // TPC-H q10 on the denormalized projection: the returns report is one
    // filtered scan (returnflag dictionary filter + the 3-month window on
    // the sort key), revenue pre-aggregated per STORED custkey — customer
    // is joined only against the ~|active customers| aggregate (AQE
    // broadcasts it), nation broadcasts, top-20. Neither fact nor customer
    // is ever shuffled. Same values as tpch_q10 (shared oracle).
    "k24_denorm_q10" -> { (s, dir) =>
      val tdn = writeDenormLineitem(s, dir, defaultBuckets)
      graft.functions.DecimalFunctions.register(s)
      val rev = s.table(tdn)
        .filter(col("l_returnflag") === "R" &&
          col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
        .groupBy(col("l_custkey"))
        .agg(expr("sum_unscaled128(l_rev_u, 8, 4)").as("revenue"))
      t(s, dir, "customer")
        .withColumn("c_address", concat(lit("Address_"), col("c_custkey")))
        .withColumn("c_phone",
          concat((lit(10) + col("c_nationkey")).cast(StringType), lit("-"),
            lpad((col("c_custkey") % 10000000).cast(StringType), 7, "0")))
        .withColumn("c_comment",
          concat(lit("customer profile "), (col("c_custkey") % 7).cast(StringType)))
        .join(rev, col("c_custkey") === col("l_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"), col("c_address"), col("c_phone"),
          col("c_comment"))
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(20)
    },

    // TPC-H q08 on the denormalized projection: the 8-way join is one
    // fact scan — the 2-year window prunes via the sort key, the STANDARD
    // part-type filter hits the STORED (dictionary-encoded) l_ptype at the
    // scan, the AMERICA-customer constraint is a broadcast semi against the
    // stored l_cnation, and the supplier nation broadcasts. The only
    // shuffle is the |years|-row final aggregate. Same values as tpch_q08
    // (shared oracle; k17 is the bucketed variant of the same query).
    "k25_denorm_q08" -> { (s, dir) =>
      val tdn = writeDenormLineitem(s, dir, defaultBuckets)
      graft.functions.DecimalFunctions.register(s)
      val amKeys = t(s, dir, "nation")
        .join(t(s, dir, "region").filter(col("r_name") === "AMERICA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val supN2 = t(s, dir, "supplier")
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      s.table(tdn)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") <= lit("1997-12-31 00:00:00").cast("timestamp") &&
          col("l_ptype") === "STANDARD")
        .select(col("l_suppkey"), col("l_cnation"), col("o_orderdate"),
          col("l_rev_u"))
        .join(broadcast(amKeys), col("l_cnation") === col("n_nationkey"),
          "leftsemi")
        .join(broadcast(supN2), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          expr("sum_unscaled128(CASE WHEN nation = 'NATION_3' THEN l_rev_u ELSE 0L END, 8, 4)") /
            expr("sum_unscaled128(l_rev_u, 8, 4)"), 6).as("mkt_share"))
        .orderBy(asc("o_year"))
    },

    // TPC-H q14 on the denormalized projection: the promo-share month is
    // ~1/80 of the table and prunes via the sort key; p_type is stored on
    // the fact row (the part join becomes a null check — exact for the
    // unique-key left join), so the whole query is one pruned scan + an
    // ungrouped conditional sum over stored unscaled i64. ZERO joins, zero
    // shuffles beyond the single-partition reduce. Same values as tpch_q14
    // (shared oracle; k18 is the aggregate-broadcast variant).
    // ASSUMPTION (oracle-gated): `l_ptype IS NOT NULL` stands in for "the
    // left join matched a part row", which is exact only while part.p_type
    // is never null — true of the TPC-H spec and these fixtures. If null
    // p_type ever becomes possible, store a separate dn_pk-matched boolean
    // at ingest instead (same caveat applies to k25's l_ptype equality).
    "k26_denorm_q14" -> { (s, dir) =>
      val tdn = writeDenormLineitem(s, dir, defaultBuckets)
      graft.functions.DecimalFunctions.register(s)
      s.table(tdn)
        .filter(col("l_shipdate") >= lit("1996-09-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01 00:00:00").cast("timestamp") &&
          col("l_ptype").isNotNull)
        .agg(round(lit(100.0) *
          expr("sum_unscaled128(CASE WHEN l_ptype LIKE 'PROMO%' THEN l_rev_u ELSE 0L END, 8, 4)") /
          expr("sum_unscaled128(l_rev_u, 8, 4)"), 6).as("promo_revenue"))
    },

    // TPC-H q22 on the custkey-bucketed layout: the synthesized phone
    // prefix is CAST(10 + c_nationkey AS STRING), so the country-code IN
    // list is a nationkey filter that reaches the scan; the global-average
    // threshold broadcasts (1 row); and the NOT EXISTS anti join against
    // big-ticket orders is a CO-LOCATED merge on the bucket key — neither
    // table is ever shuffled. Same values as tpch_q22 (shared oracle).
    "k27_bucketed_q22" -> { (s, dir) =>
      staticPlan(s)
      val (to, tc) = writeBucketed(s, dir, defaultBuckets)
      // '13','31','23','29','30','18','17' as (prefix - 10) nation keys
      val keys = Seq(3, 21, 13, 19, 20, 8, 7)
      val cand = s.table(tc)
        .filter(col("c_nationkey").isin(keys: _*))
        .select(col("c_custkey"), col("c_acctbal"),
          (col("c_nationkey") + 10).cast(StringType).as("cntrycode"))
      val thr = s.table(tc)
        .filter(col("c_nationkey").isin(keys: _*) && col("c_acctbal") > 0.0)
        .agg((sumd(dmoney(col("c_acctbal"))) / count(lit(1))).as("thr"))
      val bigOrders = s.table(to)
        .filter(col("o_totalprice") > 300000)
        .select(col("o_custkey"))
      cand
        .join(broadcast(thr), col("c_acctbal") > col("thr"))
        .join(bigOrders.hint("merge"),
          col("c_custkey") === col("o_custkey"), "leftanti")
        .groupBy(col("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          sumd(dmoney(col("c_acctbal"))).as("totacctbal"))
        .orderBy("cntrycode")
    })

  val oracles: Map[String, String] = Map(
    "k02_bucketed_join" -> s"""
      SELECT c_mktsegment, COUNT(*) AS n_orders,
             ${sql.sumd(sql.dbig("o_totalprice"))} AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "k01_salted_join" -> s"""
      SELECT c_mktsegment, COUNT(*) AS n_orders,
             ${sql.sumd(sql.dbig("o_totalprice"))} AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // identical values to the plain TPC-H queries — layout must not change
    // semantics, so the oracle is literally theirs
    "k03_bucketed_q21" -> graft.queries.Tpch.oracles("tpch_q21"),
    "k04_bucketed_q18" -> graft.queries.Tpch.oracles("tpch_q18"),
    "k05_bucketed_q04" -> graft.queries.Tpch.oracles("tpch_q04"),
    "k06_staged_q16" -> graft.queries.Tpch.oracles("tpch_q16"),
    "k36_pairs_q16" -> graft.queries.Tpch.oracles("tpch_q16"),
    "k61_grid_q17" -> graft.queries.Tpch.oracles("tpch_q17"),
    "k07_bucketed_q05" -> graft.queries.Tpch.oracles("tpch_q05"),
    "k08_staged_q11" -> graft.queries.Tpch.oracles("tpch_q11"),
    "k10_bucketed_q13" -> graft.queries.Tpch.oracles("tpch_q13"),
    "k11_staged_q02" -> graft.queries.Tpch.oracles("tpch_q02"),
    "k12_bucketed_q12" -> graft.queries.Tpch.oracles("tpch_q12"),
    "k09_bucketed_q03" -> graft.queries.Tpch.oracles("tpch_q03"),
    "k13_bucketed_q09" -> graft.queries.Tpch.oracles("tpch_q09"),
    "k14_bucketed_q10" -> graft.queries.Tpch.oracles("tpch_q10"),
    "k15_fused_q15" -> graft.queries.Tpch.oracles("tpch_q15"),
    "k16_staged_q01" -> graft.queries.Tpch.oracles("tpch_q01"),
    "k17_bucketed_q08" -> graft.queries.Tpch.oracles("tpch_q08"),
    "k18_fused_q14" -> graft.queries.Tpch.oracles("tpch_q14"),
    "k19_denorm_q05" -> graft.queries.Tpch.oracles("tpch_q05"),
    "k20_denorm_q07" -> graft.queries.Tpch.oracles("tpch_q07"),
    "k21_denorm_q03" -> graft.queries.Tpch.oracles("tpch_q03"),
    "k22_denorm_q06" -> graft.queries.Tpch.oracles("tpch_q06"),
    "k23_denorm_q09" -> graft.queries.Tpch.oracles("tpch_q09"),
    "k24_denorm_q10" -> graft.queries.Tpch.oracles("tpch_q10"),
    "k25_denorm_q08" -> graft.queries.Tpch.oracles("tpch_q08"),
    "k26_denorm_q14" -> graft.queries.Tpch.oracles("tpch_q14"),
    "k27_bucketed_q22" -> graft.queries.Tpch.oracles("tpch_q22"))
}
