package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Engine-wide invariants at sf0.001. The DuckDB oracle (driver-side /
  * scripts/check.py) covers value correctness for SQL-expressible queries;
  * these specs cover the operators the oracle can't express: sketch/LSH
  * behavior, vector kernels, and smoke over every catalog entry.
  */
class GraftSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cpus = 8, appName = "graft-test")
  val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  // Selective TPC-H filters (single nation / part subset) legitimately match
  // nothing in the 200-part/10-supplier sf0.001 fixtures; they are non-empty
  // at the driver's sf0.01 correctness gate.
  private val emptyOkAtTinySf = Set(
    "tpch_q02", "tpch_q07", "tpch_q11", "tpch_q20", "tpch_q21",
    // staged-layout twins: same selective filters as their tpch originals
    "k03_bucketed_q21", "k08_staged_q11", "k11_staged_q02",
    // denorm twin of tpch_q07 (same NATION_5/NATION_10 pair, which has
    // zero suppliers in the 10-supplier sf0.001 fixture; 4 rows +
    // hash-match at the sf0.01 oracle gate)
    "k20_denorm_q07",
    // fused strategy twins of tpch_q11/q20: identical NATION_7 / NATION_4
    // supplier filters, empty at sf0.001 for the same fixture reason
    "k28_fused_q11", "k31_fused_q20",
    // q06 HAVING count>=10, q19 selective manager+zip filter
    "tpcds_q06", "tpcds_q19",
    // HAVING count>100 (q27/q28), OFFSET 10 past the tiny group count
    // (q38/q39), 2-day date window + counter filters (q42) — all
    // non-empty at the sf0.01 gate
    "cbx_q27", "cbx_q28", "cbx_q38", "cbx_q39", "cbx_q42",
    // month-window item-cut + locality join (q54), three-channel
    // evenness probe (q58), matched demographic pairs (q85), double
    // demographic cut on one return month (q91): each needs more rows
    // than the 6k-lineitem fixture carries; 1/8/1/4 rows at sf0.01
    "tpcds_q54", "tpcds_q58", "tpcds_q85", "tpcds_q91")

  /** A layout twin runs the IDENTICAL query text as its default original,
    * so it inherits the original's tiny-sf emptiness exemption
    * automatically (round-11 lesson: the k38/k39/k42 ClickBench twins were
    * hand-listed nowhere and turned the suite red). */
  private def emptyOk(name: String): Boolean =
    emptyOkAtTinySf.contains(name) ||
      Bench.twinOf.get(name).exists(emptyOkAtTinySf.contains)

  test("fixture schemas match the engine's assumptions (drift gate)") {
    // Round-5 lesson: the driver regenerated events.parquet with ts as
    // TIMESTAMP(MICROS) (was NANOS) and every time-math query silently broke.
    // Pin the load-bearing column types so the NEXT drift fails loudly here.
    import org.apache.spark.sql.types._
    val expected = Map(
      "events" -> Map("event_id" -> LongType, "ts" -> TimestampNTZType,
        "user_id" -> LongType, "event_type" -> StringType,
        "value" -> DoubleType, "props" -> StringType),
      "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
      "embeddings" -> Map("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType), "label" -> IntegerType),
      "lineitem" -> Map("l_orderkey" -> LongType, "l_quantity" -> DoubleType,
        "l_extendedprice" -> DoubleType, "l_shipdate" -> TimestampNTZType))
    val drift = expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val schema = Engine.table(spark, dir, table).schema
      cols.flatMap { case (c, dt) =>
        schema.find(_.name == c) match {
          case None => Some(s"$table.$c: MISSING")
          case Some(f) if f.dataType != dt =>
            Some(s"$table.$c: ${f.dataType.simpleString} (expected ${dt.simpleString})")
          case _ => None
        }
      }
    }
    assert(drift.isEmpty, s"fixture schema drift detected: ${drift.mkString("; ")}")
  }

  test("every catalog query executes and returns rows at sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, dir).count()
      if (n == 0 && !emptyOk(name)) Some(name) else None
    }
    assert(empties.isEmpty, s"queries with empty results: $empties")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query with an oracle exists in the catalog") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("ppm decoder: decodes spec-conforming P6 files, not just its own") {
    import graft.operators.Multimodal.Ppm
    // round-trip of the synthetic encoder
    val f = Ppm.decode(42L, Ppm.encode(42L))
    assert(f.width === (8 + 42 % 9) && f.height === (8 + 42 % 7))
    assert(f.mean_r >= 0 && f.mean_r <= 255)
    // a foreign P6: different whitespace style, multiple comments, 2x1
    // raster [(10,20,30), (30,40,50)]
    val foreign = "P6 # c1\n# c2\n 2\t1 255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 30, 40, 50)
    val g = Ppm.decode(7L, foreign)
    assert(g.width === 2 && g.height === 1)
    assert(g.mean_r === 20.0 && g.mean_g === 30.0 && g.mean_b === 40.0)
    // malformed magic is rejected
    intercept[IllegalArgumentException] {
      Ppm.decode(0L, "P5\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](1))
    }
  }

  test("fused TPC-H twins (k28-k31) return exactly the SQL texts' rows") {
    // the fused DataFrame twins override only execution strategy; values
    // must be bit-identical to the dialect-common SQL (which is also the
    // oracle text). The tpch_q* defaults themselves are ALWAYS the
    // Catalyst-planned SQL texts (round-9 verdict boundary fix).
    def rows(q: graft.QueryDsl.Q): Set[Seq[Any]] = {
      val df = q(spark, dir)
      df.select(df.columns.sorted.toSeq.map(col): _*).collect().map(_.toSeq).toSet
    }
    graft.queries.Tpch.fusedTwins.foreach { case (name, fused) =>
      val dflt = "tpch_" + name.takeRight(3)
      assert(rows(fused) === rows(graft.queries.Tpch.sqlTextQuery(dflt)),
        s"$name fused != $dflt SQL text")
    }
  }

  test("staged twins return exactly their default originals' rows") {
    // layout must never change semantics: every k-twin's row set equals its
    // default-layout original's under EXACTLY the driver compare's protocol:
    // columns sorted by name (twins may project in a different order) and
    // floats rounded to 6 dp (scripts/check.py does the same). Decimal sums
    // are associative and stay bit-exact; DOUBLE aggregations (q39's
    // stddev/cov) legitimately drift by an ulp when a layout changes the
    // partial-merge order — the 6 dp round absorbs that, same as the oracle.
    def rows(name: String): Set[Seq[Any]] = {
      val df = SparkEntry.queries(name)(spark, dir)
      val cols = df.columns.sorted.toSeq
      df.select(cols.map(col): _*).collect().map(_.toSeq.map {
        case d: Double if !d.isNaN && !d.isInfinite =>
          BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
        case f: Float if !f.isNaN && !f.isInfinite =>
          BigDecimal(f.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
        case x => x
      }).toSet
    }
    Bench.twinOf.foreach { case (twin, dflt) =>
      assert(rows(twin) === rows(dflt), s"$twin rows differ from $dflt")
    }
  }

  test("cosine_sim: self-similarity is 1, matches scala computation") {
    graft.functions.GraftFunctions.register(spark)
    val rows = Engine.table(spark, dir, "embeddings")
      .filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding"),
        expr("cosine_sim(embedding, embedding)").as("self_sim"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("self_sim") - 1.0) < 1e-9)
      val v = r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble)
      val expected = v.map(x => x * x).sum /
        (math.sqrt(v.map(x => x * x).sum) * math.sqrt(v.map(x => x * x).sum) + 1e-12)
      assert(math.abs(r.getAs[Double]("self_sim") - expected) < 1e-9)
    }
  }

  test("l2_distance: zero for self, symmetric") {
    graft.functions.GraftFunctions.register(spark)
    val e = Engine.table(spark, dir, "embeddings").filter(col("vec_id") < 5)
    val a = e.select(col("vec_id").as("ida"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("idb"), col("embedding").as("vb"))
    val d = a.crossJoin(b)
      .select(col("ida"), col("idb"),
        expr("l2_distance(va, vb)").as("dab"),
        expr("l2_distance(vb, va)").as("dba"))
      .collect()
    d.foreach { r =>
      assert(r.getAs[Double]("dab") === r.getAs[Double]("dba"))
      if (r.getAs[Long]("ida") == r.getAs[Long]("idb"))
        assert(r.getAs[Double]("dab") == 0.0)
    }
  }

  test("brute-force KNN: each probe's rank-1 neighbor is itself") {
    val top1 = SparkEntry.queries("n01_knn_cosine")(spark, dir)
      .filter(col("rnk") === 1).collect()
    assert(top1.length == 10)
    top1.foreach { r =>
      assert(r.getAs[Long]("probe_id") == r.getAs[Long]("neighbor_id"))
      assert(math.abs(r.getAs[Double]("sim") - 1.0) < 1e-9)
    }
  }

  test("LSH KNN: probe finds itself; sims bounded by brute-force") {
    val brute = SparkEntry.queries("n01_knn_cosine")(spark, dir)
      .filter(col("rnk") === 1)
      .collect().map(r => r.getAs[Long]("probe_id") -> r.getAs[Double]("sim")).toMap
    val lsh = SparkEntry.queries("n03_knn_lsh")(spark, dir)
      .filter(col("rnk") === 1).collect()
    lsh.foreach { r =>
      val p = r.getAs[Long]("probe_id")
      assert(r.getAs[Double]("sim") <= brute(p) + 1e-12)
      assert(r.getAs[Long]("neighbor_id") == p) // self shares its own bucket
    }
  }

  test("decimal fast path: to_unscaled matches Spark's decimal cast exactly") {
    import org.apache.spark.sql.types.{DecimalType, Decimal}
    val rnd = new scala.util.Random(42)
    val samples = Seq(0.0, -0.0, 1.0, -1.0, 0.00005, 2.00005, -2.00005,
      0.99995, 123456.7890123, 99999.99995, -99999.99995, 1.15, 2.675,
      8.225, -8.225, 0.1 + 0.2) ++
      (1 to 2000).map(_ => (rnd.nextLong() % 10000000000L) / 10000.0) ++
      (1 to 2000).map(_ => rnd.nextDouble() * 200000 - 100000)
    for (d <- samples; s <- Seq(2, 4)) {
      val viaCast = Decimal(BigDecimal.decimal(d).setScale(s, BigDecimal.RoundingMode.HALF_UP))
        .toUnscaledLong
      val viaKernel = graft.functions.DecimalKernels.toUnscaled(d, s)
      assert(viaCast == viaKernel, s"d=$d scale=$s cast=$viaCast kernel=$viaKernel")
    }
  }

  test("decimal fast path: guard band holds at large magnitudes and overflow maps to null") {
    import org.apache.spark.sql.types.Decimal
    // values parked exactly on .5 boundaries at magnitudes where fl(d*10^s)
    // carries ~2.2e-16*|y| of error — a fixed guard band mis-rounds here
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 2000; s <- Seq(2, 4)) {
      val u = 1000000000000L + (math.abs(rnd.nextLong()) % 8000000000000L) // 1e12..9e12
      val d = (u + 0.5) / math.pow(10, s)
      val viaCast = Decimal(BigDecimal.decimal(d).setScale(s, BigDecimal.RoundingMode.HALF_UP))
        .toUnscaledLong
      val viaKernel = graft.functions.DecimalKernels.toUnscaled(d, s)
      assert(viaCast == viaKernel, s"d=$d scale=$s cast=$viaCast kernel=$viaKernel")
    }
    // non-ANSI CAST(double AS DECIMAL(12,4)) overflows to null; the checked
    // kernel must reproduce that (and NaN/Inf → null) so Sum skips the row
    val k = graft.functions.DecimalKernels
    assert(k.toUnscaledChecked(1e9, 12, 4) == null)      // 1e13 unscaled >= 10^12
    assert(k.toUnscaledChecked(-1e9, 12, 4) == null)
    assert(k.toUnscaledChecked(Double.NaN, 12, 4) == null)
    assert(k.toUnscaledChecked(Double.PositiveInfinity, 12, 4) == null)
    assert(k.toUnscaledChecked(99999999.9999, 12, 4) == 999999999999L) // max in-range
    assert(k.toUnscaledChecked(99999999.99996, 12, 4) == null)         // rounds out of range
    // end-to-end: out-of-range rows diverge without the fix. Non-ANSI: the
    // cast nulls overflow rows and Sum skips them — the rewritten plan must
    // skip exactly the same rows. ANSI (the session default): both throw.
    Engine.table(spark, dir, "lineitem") // installs DecimalSumRewrite
    val caseExpr =
      "CAST(CASE id WHEN 0 THEN 1.5 WHEN 1 THEN 2.5e9 WHEN 2 THEN 3.25 ELSE -4.0e10 END AS DOUBLE) v"
    val sql2 = "SELECT CAST(ROUND(SUM(CAST(v AS DECIMAL(12,4))), 4) AS DOUBLE) s FROM wide_vals"
    val plain2 = spark.newSession()
    spark.range(4).selectExpr(caseExpr).createOrReplaceTempView("wide_vals")
    plain2.range(4).selectExpr(caseExpr).createOrReplaceTempView("wide_vals")
    for (sess <- Seq(spark, plain2)) sess.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val fast2 = spark.sql(sql2)
      assert(fast2.queryExecution.optimizedPlan.toString.contains("sumunscaled128"))
      assert(!plain2.sql(sql2).queryExecution.optimizedPlan.toString.contains("sumunscaled128"))
      assert(fast2.collect().toSeq == plain2.sql(sql2).collect().toSeq)
    } finally {
      for (sess <- Seq(spark, plain2)) sess.conf.unset("spark.sql.ansi.enabled")
    }
    // ANSI default: overflow must still fail loudly under the rewrite
    val fastAnsi = spark.sql(sql2)
    assert(fastAnsi.queryExecution.optimizedPlan.toString.contains("sumunscaled128"))
    intercept[Exception](fastAnsi.collect())
    intercept[Exception](plain2.sql(sql2).collect())
  }

  test("decimal fast path: sentinel kernel agrees with the boxed checked kernel") {
    // the codegen path uses the primitive Long.MIN_VALUE-sentinel variant;
    // it must null/keep exactly the same values as toUnscaledChecked
    val k = graft.functions.DecimalKernels
    val rnd = new scala.util.Random(11)
    val probes = Seq(1e9, -1e9, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 99999999.9999, 99999999.99996, 0.0, -0.00005,
      1.5, 123456.789) ++ (1 to 500).map(_ => (rnd.nextDouble() - 0.5) * 2e9)
    for (d <- probes; (p, s) <- Seq((12, 4), (18, 6), (6, 2))) {
      val boxed = k.toUnscaledChecked(d, p, s)
      val sent = k.toUnscaledSentinel(d, p, s)
      if (boxed == null) assert(sent == Long.MinValue, s"d=$d p=$p s=$s")
      else assert(sent == boxed.longValue(), s"d=$d p=$p s=$s boxed=$boxed sent=$sent")
    }
  }

  test("decimal fast path: bare-column products only rewrite when provably in i64") {
    // bare decimal(18,6) columns can hold 10^18 unscaled; an i64 product of
    // two of them could throw under the rewrite's forced-ANSI Multiply on
    // values vanilla Spark sums fine — so the Multiply rewrite must skip
    // them, while the direct sum (i64-safe) still rewrites
    Engine.table(spark, dir, "lineitem") // installs DecimalSumRewrite
    spark.range(10)
      .selectExpr("CAST(id AS DECIMAL(18,6)) a", "CAST(id AS DECIMAL(18,6)) b",
        "CAST(id AS DECIMAL(6,4)) c", "CAST(id AS DECIMAL(8,2)) d")
      .createOrReplaceTempView("bare_decimals")
    def plan(q: String) = spark.sql(q).queryExecution.optimizedPlan.toString
    val wide = "SELECT CAST(ROUND(SUM(a * b), 4) AS DOUBLE) s FROM bare_decimals"
    assert(!plan(wide).contains("sumunscaled128"),
      "18-digit bare-column product must not be rewritten into i64")
    val direct = "SELECT CAST(ROUND(SUM(a), 4) AS DOUBLE) s FROM bare_decimals"
    assert(plan(direct).contains("sumunscaled128"),
      "direct bare-column sum should still take the i64 fast path")
    // narrow bare columns whose product bound fits 18 digits still rewrite
    val narrow = "SELECT CAST(ROUND(SUM(c * d), 4) AS DOUBLE) s FROM bare_decimals"
    assert(plan(narrow).contains("sumunscaled128"),
      "6+8-digit bare-column product fits i64 and should rewrite")
  }

  test("decimal fast path: decimal*int product shapes still rewrite (q11)") {
    // Spark promotes the int operand to decimal(10,0); the bare-column
    // product guard must treat that cast as a trusted hard-bounded leaf,
    // not an unknown fallback — q11's supplycost*availqty sums lost the
    // rewrite when the guard first landed. Probes the SQL-text plan: the
    // default catalog entry is the fused DataFrame variant, which carries
    // its unscaled sums explicitly instead of via the rewrite.
    val df = graft.queries.Tpch.sqlTextQuery("tpch_q11")(spark, dir)
    val n = "sumunscaled128".r
      .findAllIn(df.queryExecution.optimizedPlan.toString.toLowerCase).length
    assert(n == 2, s"expected 2 rewritten sums in tpch_q11, got $n")
  }

  test("decimal fast path: aggregate-over-Project alias sums rewrite (q09)") {
    // the Sum's child is an attribute aliased one node down (q09's
    // `amount = disc - supplycost*qty`, decimal(21,8) — beyond the bare
    // fallback's cap); the alias-aware pass must resolve the definition,
    // materialize the unscaled long in the Project, and swap the Sum
    val df = SparkEntry.queries("tpch_q09")(spark, dir)
    val plan = df.queryExecution.optimizedPlan.toString.toLowerCase
    assert("sumunscaled128".r.findAllIn(plan).length == 1,
      "q09's aliased decimal sum should take the i64 fast path")
  }

  test("topk sketch: exact side merged with an evicted side keeps its floor at 0") {
    // `this` never evicted (exact over its substream) — keys present only in
    // `other` must NOT be inflated by this side's min count, regardless of
    // other.hasEvicted (the flag fold must not run before the floor reads)
    val a = new graft.functions.SpaceSavingSummary(4)
    Seq(1L -> 9L, 2L -> 7L).foreach { case (k, n) =>
      (1L to n).foreach(_ => a.add(k, 1L)) }
    val b = new graft.functions.SpaceSavingSummary(2)
    Seq(10L -> 5L, 11L -> 4L, 12L -> 3L).foreach { case (k, n) =>
      (1L to n).foreach(_ => b.add(k, 1L)) }
    assert(!a.hasEvicted && b.hasEvicted)
    // b after its evictions: {10:(5,0), 12:(7,4)} → b's floor is 5
    val m = a.merge(b)
    val got = m.topK(4).map { case (k, c, _) => k -> c }.toMap
    // a-side keys gain b's floor (b evicted, min count 5); b-only keys keep
    // their b-side counts exactly — fa must stay 0 (a never evicted)
    assert(got(1L) == 9L + 5L && got(2L) == 7L + 5L, s"got $got")
    assert(got(10L) == 5L && got(12L) == 7L,
      s"b-only keys inflated (fa leaked into floor): $got")
    assert(m.hasEvicted)
  }

  test("topk sketch: merging exact at-capacity partials stays exact") {
    // two partials each holding exactly `capacity` distinct keys, never
    // evicting — the merged summary must keep err 0 and exact counts
    val a = new graft.functions.SpaceSavingSummary(4)
    val b = new graft.functions.SpaceSavingSummary(4)
    Seq(1L -> 5L, 2L -> 3L, 3L -> 2L, 4L -> 1L).foreach { case (k, n) =>
      (1L to n).foreach(_ => a.add(k, 1L)) }
    Seq(3L -> 4L, 4L -> 6L, 5L -> 2L, 6L -> 1L).foreach { case (k, n) =>
      (1L to n).foreach(_ => b.add(k, 1L)) }
    assert(!a.hasEvicted && !b.hasEvicted)
    val m = a.merge(b)
    val got = m.topK(6).map { case (k, c, e) => (k, c, e) }.toSet
    // truth: 1→5, 2→3, 3→6, 4→7, 5→2, 6→1; capacity 4 keeps the largest 4
    assert(got == Set((4L, 7L, 0L), (3L, 6L, 0L), (1L, 5L, 0L), (2L, 3L, 0L)),
      s"got $got")
    // the trim itself discarded keys 5 and 6 → subsequent merges must floor
    assert(m.hasEvicted)
  }

  test("decimal fast path: rewritten sumd equals the decimal-sum plan bit-exactly") {
    val sql = """SELECT l_returnflag,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 4) AS DOUBLE) b,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
        (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(6,4)))), 4) AS DOUBLE) c
      FROM lineitem GROUP BY 1 ORDER BY 1"""
    Engine.table(spark, dir, "lineitem")
    val fast = spark.sql(sql)
    assert(fast.queryExecution.optimizedPlan.toString.contains("sumunscaled128"),
      "rewrite did not fire")
    val plain = spark.newSession() // fresh session: no extraOptimizations
    plain.read.parquet(s"$dir/lineitem.parquet").createOrReplaceTempView("lineitem")
    val expect = plain.sql(sql)
    assert(!expect.queryExecution.optimizedPlan.toString.contains("sumunscaled128"))
    val (a, b) = (fast.collect(), expect.collect())
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
  }

  test("q48 scalable running sum: no unpartitioned window over the full data") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = SparkEntry.queries("q48_running_scalable")(spark, dir)
    // sparkPlan, not executedPlan: AQE wraps the latter and hides children
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      // the only global-ordered window allowed is the one over the tiny
      // partition-totals aggregate — never over a full-table scan
      val scans = w.collect { case f: FileSourceScanExec => f }
      assert(scans.isEmpty,
        s"unpartitioned window sits on a file scan: ${w.simpleStringWithNodeId()}")
    }
  }

  test("topk sketch: undersized capacity keeps the SpaceSaving contract") {
    graft.functions.HeavyHitters.register(spark)
    Engine.table(spark, dir, "events")
    val truth = spark.sql("SELECT user_id, COUNT(*) c FROM events GROUP BY 1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // capacity 8 < 15 distinct users → evictions happen; the estimates must
    // still bracket the truth: count - err <= true <= count
    val sk = spark.sql("""SELECT t.key, t.count, t.err FROM
      (SELECT inline(topk_sketch(user_id, 8, 8)) FROM events) t""").collect()
    assert(sk.length == 8)
    sk.foreach { r =>
      val (k, c, e) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val tr = truth.getOrElse(k, 0L)
      assert(tr <= c, s"key $k: sketch $c undercounts true $tr")
      assert(c - e <= tr, s"key $k: count $c - err $e exceeds true $tr")
    }
    // exact regime: capacity >= cardinality reproduces the exact top-k
    val exact = spark.sql("""SELECT t.key, t.count, t.err FROM
      (SELECT inline(topk_sketch(user_id, 5, 1024)) FROM events) t""").collect()
    val top5 = truth.toSeq.sortBy { case (k, c) => (-c, k) }.take(5)
    assert(exact.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      top5.map { case (k, c) => (k, c, 0L) })
  }

  test("sequence packing: bins respect the 512-token budget") {
    val rows = SparkEntry.queries("t10_sequence_pack")(spark, dir).collect()
    assert(rows.nonEmpty)
    val byBin = rows.groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("seq_id")))
    byBin.foreach { case ((shard, seq), ds) =>
      val total = ds.map(_.getAs[Long]("n_tokens")).sum
      // a bin only exceeds the budget if a single oversized doc forced it
      assert(total <= 512 || ds.length == 1,
        s"bin ($shard,$seq) holds ${ds.length} docs / $total tokens")
    }
    // packing must be total and disjoint: every doc appears exactly once
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    // bins are dense per shard: seq_ids are 0..max with no gaps
    byBin.keys.groupBy(_._1).foreach { case (_, bins) =>
      val seqs = bins.map(_._2).toSeq.sorted
      assert(seqs == (0L until seqs.length).toSeq)
    }
  }

  test("chunk dedup: exact duplicate docs are 100% boilerplate") {
    // d01's exact-duplicate groups share every 10-word chunk, so each doc
    // in a multi-copy group must have boiler_ratio 1.0
    val dupIds = SparkEntry.queries("d01_dedup_exact")(spark, dir)
      .filter(col("n_copies") >= 3).collect().map(_.getAs[Long]("keep_id"))
    val ratios = SparkEntry.queries("d08_chunk_dedup")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("boiler_ratio"))
      .toMap
    dupIds.foreach { id => assert(ratios(id) == 1.0, s"doc $id not flagged") }
  }

  test("centroid distances are non-negative and centroids are means") {
    val d = SparkEntry.queries("n06_centroid_dist")(spark, dir).collect()
    assert(d.length == Engine.table(spark, dir, "embeddings").count())
    d.foreach(r => assert(r.getAs[Double]("dist") >= 0.0))
  }

  test("minhash LSH finds planted near-duplicates") {
    import spark.implicits._
    val docs = Engine.table(spark, dir, "documents")
      .select(col("doc_id"), col("text")).limit(50)
    // plant near-dups: copy each doc with one appended word, offset ids
    val perturbed = docs.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" extra")).as("text"))
    val pairs = graft.operators.Dedup
      .minhashPairs(docs.union(perturbed), 0.5)
      .collect()
    val planted = pairs.count(r =>
      r.getAs[Long]("id2") - r.getAs[Long]("id1") == 100000)
    // banding (8 bands of 3) catches nearly all >0.9-jaccard pairs
    assert(planted >= 40, s"only $planted of 50 planted dups found")
    pairs.foreach(r => assert(r.getAs[Double]("jaccard") >= 0.5))
  }

  test("simhash: planted near-duplicates land within small hamming distance") {
    graft.functions.GraftFunctions.register(spark)
    val docs = Engine.table(spark, dir, "documents")
      .select(col("doc_id"), col("text")).limit(50)
    val perturbed = docs.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" extra")).as("text"))
    val pairs = graft.operators.Dedup
      .simhashPairs(docs.union(perturbed), 10)
      .collect()
    val planted = pairs.count(r =>
      r.getAs[Long]("id2") - r.getAs[Long]("id1") == 100000)
    assert(planted >= 40, s"only $planted of 50 planted dups found")
  }

  test("simhash band layout: fixture-stable below 1M docs, occupancy-bounded above") {
    import graft.operators.Dedup.simhashBandLayout
    // every driver fixture and the sf0.01 oracle resolve to the historical
    // 4 x 16-bit layout — the adaptive rule must NOT change their output
    Seq(50L, 500L, 5000L, 500000L, 1000000L).foreach { n =>
      assert(simhashBandLayout(n) == ((4, 16, Seq(0, 16, 32, 48))),
        s"layout changed at n=$n")
    }
    // above the 16-bit saturation point the key widens so mean occupancy
    // stays bounded (n / 2^bandBits <= targetOcc up to ceil rounding) and
    // the bands still fit the 64-bit signature
    Seq(2000000L, 5000000L, 50000000L, 2000000000L).foreach { n =>
      val (bands, bits, shifts) = simhashBandLayout(n)
      assert(n.toDouble / (1L << bits) <= 16.0, s"occupancy unbounded at n=$n")
      assert(bands >= 2 && shifts.length == bands)
      assert(shifts.last + bits <= 64, s"band overflows signature at n=$n")
      assert(shifts == shifts.sorted && shifts.distinct == shifts)
    }
    // sf100-scale corpus: 3 bands of 19 bits spread across the word
    assert(simhashBandLayout(5000000L) == ((3, 19, Seq(0, 22, 45))))
  }

  test("Graft facade: install + open + sugar SQL + compat functions + layouts") {
    // the README quickstart, exercised end to end on a real session
    val s = Graft.install(spark.newSession())
    // path-as-table sugar straight off the parquet file
    val n = Graft.sql(s, s"SELECT count(*) AS n FROM '$dir/nation.parquet'")
      .collect()(0).getAs[Long]("n")
    assert(n == 25)
    // registered fixture views + a GlareDB-compat function name
    Graft.open(s, dir)
    val r = Graft.sql(s,
      "SELECT repeat('ab', 2) AS rep, count(*) AS cnt FROM region")
      .collect()(0)
    assert(r.getAs[String]("rep") == "abab" && r.getAs[Long]("cnt") == 5)
    // sketch kernel registered by install
    assert(Graft.sql(s, "SELECT simhash64(array('a','b')) AS h")
      .collect()(0).getAs[Long]("h") != 0L)
    // staged-layout surface: build (or attach) the co-bucketed pair and
    // run a zero-exchange join on it
    val (tli, tor) = Graft.layouts.bucketedTpch(s, dir)
    val joined = s.table(tli).join(s.table(tor).hint("merge"),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(joined > 0)
  }

  test("connected components: multi-hop chains collapse to one cluster") {
    import spark.implicits._
    // chain 1-2-3-4-5 (diameter 4 — forces several propagation rounds),
    // pair 10-11, singleton 20
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 20L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id1", "id2")
    val cc = graft.operators.Dedup.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(cc(_) == 1L))
    assert(cc(10L) == 10L && cc(11L) == 10L && cc(20L) == 20L)
  }

  test("asof join: latest right row at-or-before each left row, per key") {
    val r = SparkEntry.queries("e04_asof_join")(spark, dir).collect()
    r.foreach { row =>
      if (!row.isNullAt(3))
        assert(row.getAs[Long]("click_ts") <= row.getAs[Long]("ts"),
          s"click after purchase: $row")
    }
    // at least one purchase precedes any click for its user -> NULL match
    // is representable (left join), and most purchases find a click
    val matched = r.count(!_.isNullAt(3))
    assert(matched > r.length / 2, s"only $matched of ${r.length} matched")
  }

  test("range join: bucketized equi-join plan, no nested loop") {
    val df = SparkEntry.queries("e05_range_join")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
    assert(df.count() > 0)
  }

  test("streaming dedup agrees with batch exact dedup") {
    val stream = SparkEntry.queries("st05_stream_dedup")(spark, dir)
    val batch = SparkEntry.queries("d01_dedup_exact")(spark, dir)
      .select("fp", "n_copies", "keep_id")
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("exact dedup groups duplicate texts") {
    import spark.implicits._
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("documents_test")
    val groups = df.groupBy(md5(col("text").cast("binary")).as("fp"))
      .agg(count(lit(1)).as("n"), min("doc_id").as("keep"))
      .collect().map(r => r.getAs[Long]("n") -> r.getAs[Long]("keep")).toMap
    assert(groups(2L) == 1L && groups(1L) == 3L)
  }

  test("approx_count_distinct within 5% of exact, approx median in p45..p55") {
    val r = SparkEntry.queries("q47_approx_sketch")(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Boolean]("cd_ok"), s"HLL out of tolerance: $row")
      assert(row.getAs[Boolean]("median_ok"), s"approx median out of band: $row")
    }
  }

  test("path-as-table sugar resolves quoted paths and read_parquet TVF") {
    val n1 = graft.sources.GraftSession
      .sql(spark, s"SELECT count(*) AS n FROM '$dir/region.parquet'")
      .collect()(0).getAs[Long]("n")
    val n2 = graft.sources.GraftSession
      .sql(spark, s"SELECT count(*) AS n FROM read_parquet('$dir/region.parquet')")
      .collect()(0).getAs[Long]("n")
    assert(n1 == 5 && n2 == 5)
  }

  test("IVF KNN quality contract: all probes self-retrieve, mean recall >= 0.8") {
    val r = SparkEntry.queries("n05_knn_ivf")(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_probes") == 10L)
    assert(r(0).getAs[Long]("n_self_found") == 10L)
    assert(r(0).getAs[Boolean]("mean_recall_ok"))
  }

  test("plan regression: golden suites never broadcast a fact table") {
    val golden = (1 to 22).map(i => f"tpch_q$i%02d") ++
      Seq("tpcds_q01", "tpcds_q09", "tpcds_q25", "tpcds_q36",
        "tpcds_q59", "tpcds_q65", "tpcds_q89", "tpcds_q98") ++
      Seq("q01_pricing_summary", "q03_topk_revenue", "q05_nation_revenue")
    // at-scale statistics emulation + PREPARED plan, like graft.Plans:
    // pre-EnsureRequirements sparkPlan has no Exchange nodes at all, which
    // silently made this assertion vacuous until round 6
    val sess = spark.newSession()
    sess.conf.set("spark.sql.autoBroadcastJoinThreshold", (24 << 10).toString)
    // sf0.01, not this spec's sf0.001: the threshold emulation is
    // calibrated to sf0.01 file sizes (same setup as graft.Plans)
    val planDir = "/root/testdata/sf0.01"
    val bad = golden.flatMap { q =>
      val plan = SparkEntry.queries(q)(sess, planDir).queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.initialPlan
        case p => p
      }
      val fb = Plans.factBroadcasts(plan)
      if (fb.nonEmpty) Some(s"$q: broadcast over ${fb.mkString(",")}") else None
    }
    assert(bad.isEmpty, s"fact-table broadcasts:\n${bad.mkString("\n")}")
  }

  test("plan regression: q01 pushes the shipdate filter into the scan") {
    val plan = SparkEntry.queries("q01_pricing_summary")(spark, dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushed filter in:\n$plan")
    assert(!plan.contains("l_orderkey"), "column pruning lost: l_orderkey read")
  }

  test("plan regression: q03 plans a top-k (TakeOrderedAndProject)") {
    val plan = SparkEntry.queries("q03_topk_revenue")(spark, dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k operator in:\n$plan")
  }

  test("plan regression: q05 broadcasts the dimension tables") {
    val plan = SparkEntry.queries("q05_nation_revenue")(spark, dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("DSv2 series source prunes unprojected columns") {
    val df = spark.read.format("graft.sources.seriesv2.SeriesSource")
      .option("start", "1").option("end", "101").load()
      .select(col("id"))
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scan.isDefined, "no BatchScanExec in plan")
    assert(scan.get.scan.readSchema().fieldNames.toSeq == Seq("id"),
      s"pruning failed: ${scan.get.scan.readSchema()}")
    assert(df.count() == 100)
  }

  test("partitioned write enables partition pruning on read-back") {
    SparkEntry.queries("q73_partitioned_write")(spark, dir).count() // ensure written
    val out = s"target/tmp_sources/lineitem_by_flag_${Integer.toHexString(dir.hashCode)}"
    val plan = spark.read.parquet(out)
      .filter(col("l_returnflag") === "R")
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      s"no partition pruning in:\n$plan")
  }

  test("bucketed join plans no shuffle exchange for the join") {
    val (to, tc) = graft.operators.Skew.writeBucketed(spark, dir, 8)
    val joined = spark.table(to).hint("merge")
      .join(spark.table(tc).hint("merge"),
        col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
  }

  test("salted join equals plain join exactly") {
    val salted = SparkEntry.queries("k01_salted_join")(spark, dir).collect()
    val plain = Engine.table(spark, dir, "orders")
      .join(Engine.table(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment").collect()
    assert(salted.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      plain.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("st06 watermark dedup: cross-batch duplicates are dropped, result = batch DISTINCT") {
    // Split the events fixture into time-ordered halves (NOT id parity:
    // a full-range first batch would advance the watermark past the second
    // batch's events and drop them as late). Duplicate coarse keys that
    // straddle the split arrive within the 2 h watermark, so the stateful
    // dedup must still collapse them to one row.
    val src = spark.read.parquet(s"$dir/events.parquet")
    val cut = src.selectExpr("percentile_approx(ts, 0.5)").collect()(0).getAs[Any](0)
    val staged = new java.io.File("target/tmp_stream/st06_two_batch")
    staged.mkdirs()
    def half(name: String, f: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = new java.io.File(staged.getParentFile, s"st06_stage_$name")
      f.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(staged, s"$name.parquet").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    half("a_early", src.filter(col("ts") < lit(cut)).orderBy("ts"))
    half("b_late", src.filter(col("ts") >= lit(cut)).orderBy("ts"))
    val multi = graft.streaming.Streaming.dedupWatermarkStream(
      spark, staged.getAbsolutePath, Map("maxFilesPerTrigger" -> "1")).collect()
    val batch = src.selectExpr("user_id", "event_type",
      "date_trunc('hour', cast(ts as timestamp)) AS hour_start")
      .distinct().orderBy("user_id", "event_type", "hour_start").collect()
    assert(multi.length == batch.length,
      s"multi-batch dedup ${multi.length} rows vs batch distinct ${batch.length}")
    assert(multi.map(_.toString).sorted.sameElements(batch.map(_.toString).sorted))
  }

  test("st03 sessionize: multi-micro-batch stream matches single-batch result") {
    // Split the events fixture into two parquet files and force one file
    // per trigger: the stateful sessionizer must emit versioned updates
    // whose keep-max-version reduction equals the single-batch answer —
    // including the case where a batch-2 event bridges (merges) two
    // sessions that batch 1 had emitted separately.
    val src = spark.read.parquet(s"$dir/events.parquet")
    val staged = new java.io.File("target/tmp_stream/two_batch_test")
    staged.mkdirs()
    // deterministic halves with interleaved event times per user (ts order
    // differs from file order, so batch 2 genuinely rewrites batch-1 state)
    def half(rem: Int): Unit = {
      val tmp = new java.io.File(staged.getParentFile, s"two_batch_stage$rem")
      src.filter(col("event_id") % 2 === rem).coalesce(1)
        .write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(staged, s"half$rem.parquet").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    half(0); half(1)
    val multi = graft.streaming.Streaming.sessionizeStream(
      spark, staged.getAbsolutePath, Map("maxFilesPerTrigger" -> "1")).collect()
    val single = graft.streaming.Streaming.sessionizeStream(
      spark, graft.streaming.Streaming.stageDir(dir), Map.empty).collect()
    assert(multi.nonEmpty)
    assert(multi.map(_.toString).toSeq == single.map(_.toString).toSeq)
  }

  test("simhash64 is deterministic and order-sensitive only via token multiset") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val r = Seq(("a b c d e f g h", "a b c d e f g h", "x y z w q r s t"))
      .toDF("t1", "t2", "t3")
      .select(
        expr("simhash64(split(t1, ' '))").as("h1"),
        expr("simhash64(split(t2, ' '))").as("h2"),
        expr("simhash64(split(t3, ' '))").as("h3"))
      .collect()(0)
    assert(r.getAs[Long]("h1") == r.getAs[Long]("h2"))
    assert(r.getAs[Long]("h1") != r.getAs[Long]("h3"))
  }

  test("object-store conf mapping: s3 options land on fs.s3a.*, uris normalize") {
    import graft.sources.ObjectStores
    val conf = spark.sparkContext.hadoopConfiguration
    ObjectStores.configureS3(spark, Map(
      "access_key_id" -> "AKID", "secret_access_key" -> "SK",
      "region" -> "us-west-2", "endpoint" -> "http://minio:9000"))
    assert(conf.get("fs.s3a.access.key") == "AKID")
    assert(conf.get("fs.s3a.secret.key") == "SK")
    assert(conf.get("fs.s3a.endpoint.region") == "us-west-2")
    assert(conf.get("fs.s3a.endpoint") == "http://minio:9000")
    assert(conf.get("fs.s3a.path.style.access") == "true")
    // anonymous: no keys -> anonymous provider
    ObjectStores.configureS3(spark, Map("region" -> "us-east-1"))
    assert(conf.get("fs.s3a.aws.credentials.provider").contains("Anonymous"))
    ObjectStores.configureGcs(spark, Map("service_account" -> "/tmp/sa.json"))
    assert(conf.get("fs.gs.auth.service.account.json.keyfile") == "/tmp/sa.json")
    // inline JSON is materialized to a keyfile
    ObjectStores.configureGcs(spark, Map("service_account" -> """{"type":"sa"}"""))
    val kf = conf.get("fs.gs.auth.service.account.json.keyfile")
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(kf))
      .contains("\"type\""))
    assert(ObjectStores.normalize("s3://bucket/k.parquet") == "s3a://bucket/k.parquet")
    assert(ObjectStores.normalize("s3n://b/k") == "s3a://b/k")
    assert(ObjectStores.normalize("gs://b/k") == "gs://b/k")
    assert(ObjectStores.normalize("/local/path.parquet") == "/local/path.parquet")
  }
}
