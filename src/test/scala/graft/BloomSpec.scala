package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.PruneWeakBloom

/** Specs for the selectivity-gated runtime Bloom-filter prune rule
  * (`plans/PruneWeakBloom.scala`). Two layers:
  *   - unit: the parquet-footer uniform-range selectivity estimator on a
  *     synthetic table with a known value distribution;
  *   - integration: real `InjectRuntimeFilter` blooms on the sf0.001
  *     fixtures, asserting a weak (wide-range) creation filter's bloom is
  *     REMOVED while a strong (narrow-range) one is KEPT, and that results
  *     are unchanged either way.
  */
class BloomSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cpus = 4, appName = "graft-bloom-test")
  val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private lazy val synthPath: String = {
    val p = "target/tmp/bloomspec_synth.parquet"
    import spark.implicits._
    // x uniform 0..999; y constant-ish category; z a derived (non-estimable) col
    (0L until 1000L).toDF("x")
      .withColumn("y", (col("x") % 7).cast("long"))
      .write.mode("overwrite").parquet(p)
    p
  }

  private def planOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan

  test("bloom prune: uniform range estimate from parquet footer min/max") {
    val df = spark.read.parquet(synthPath).filter(col("x") >= 750L)
    val sel = PruneWeakBloom.creationSelectivity(planOf(df))
    assert(sel.isDefined)
    // footer range is [0, 999]; kept mass (999-750)/999 ~= 0.249
    assert(math.abs(sel.get - 0.249) < 0.01, s"estimate was $sel")
  }

  test("bloom prune: conjunctive ranges multiply into one interval") {
    val df = spark.read.parquet(synthPath)
      .filter(col("x") >= 100L && col("x") < 300L)
    val sel = PruneWeakBloom.creationSelectivity(planOf(df))
    assert(sel.isDefined)
    assert(math.abs(sel.get - 0.2) < 0.01, s"estimate was $sel")
  }

  test("bloom prune: equality predicates use the fixed selective factor") {
    val df = spark.read.parquet(synthPath).filter(col("y") === 3L)
    val sel = PruneWeakBloom.creationSelectivity(planOf(df))
    assert(sel.contains(0.05), s"estimate was $sel")
  }

  private lazy val synthStrPath: String = {
    val p = "target/tmp/bloomspec_synth_str.parquet"
    import spark.implicits._
    // s uniform over the 16 single chars 'a'..'p' — linear in the
    // lexicographic prefix embedding, so the uniform-range estimate is
    // exact up to the discrete-vs-continuous boundary effect
    (0L until 1600L).toDF("x")
      .withColumn("s", expr("char(ascii('a') + x % 16)"))
      .write.mode("overwrite").parquet(p)
    p
  }

  test("bloom prune: string range estimated from BINARY footer min/max") {
    // footer range ['a','p'] (15 embedding steps); s >= 'm' spans 3 of
    // them -> continuous-uniform estimate 3/15 = 0.20 (true discrete mass
    // 4/16 = 0.25; the gate only needs the order of magnitude)
    val df = spark.read.parquet(synthStrPath).filter(col("s") >= "m")
    val sel = PruneWeakBloom.creationSelectivity(planOf(df))
    assert(sel.isDefined, "string range should be estimable from footers")
    assert(math.abs(sel.get - 0.2) < 0.01, s"estimate was $sel")
  }

  test("bloom prune: weak string-range bloom removed, strong one kept") {
    def join(s: SparkSession, cut: String) = {
      val dim = s.read.parquet(synthStrPath).filter(col("s") >= lit(cut))
        .select(col("x").as("k"))
      s.read.parquet(synthPath).join(dim, col("x") === col("k"))
        .agg(count(lit(1)).as("n"))
    }
    val off = bloomSession(prune = false)
    assert(bloomCount(join(off, "b")) >= 1,
      "expected InjectRuntimeFilter to fire on the string-filtered side")
    val on = bloomSession(prune = true)
    assert(bloomCount(join(on, "b")) === 0,
      "s >= 'b' keeps ~93% -> bloom should be pruned")
    assert(bloomCount(join(on, "p")) >= 1,
      "s >= 'p' keeps ~7% -> bloom should survive")
    // values unchanged by the prune
    assert(join(on, "b").collect().toSeq === join(off, "b").collect().toSeq)
  }

  test("bloom prune: non-estimable conjunct keeps the bloom (None)") {
    val df = spark.read.parquet(synthPath).filter(col("x") % 2 === 0)
    assert(PruneWeakBloom.creationSelectivity(planOf(df)).isEmpty)
  }

  test("bloom prune: a join on the creation side keeps the bloom (None)") {
    val a = spark.read.parquet(synthPath).filter(col("x") >= 10L)
    val b = spark.read.parquet(synthPath).select(col("x").as("x2"))
    val j = a.join(b, col("x") === col("x2"))
    assert(PruneWeakBloom.creationSelectivity(planOf(j)).isEmpty)
  }

  private def bloomCount(df: org.apache.spark.sql.DataFrame): Int = {
    var n = 0
    df.queryExecution.optimizedPlan.foreach { p =>
      p.expressions.foreach(_.foreach {
        case _: BloomFilterMightContain => n += 1
        case _ => ()
      })
    }
    n
  }

  /** Session tuned so InjectRuntimeFilter fires on the tiny fixtures:
    * any application-side scan size qualifies, and broadcast joins are off
    * (runtime blooms only pair with shuffle joins). */
  private def bloomSession(prune: Boolean): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.graft.bloom.prune", prune.toString)
    Engine.ensureOptimizations(s)
    s
  }

  /** orders filtered by an o_orderdate range, joined to lineitem on
    * orderkey — the q03/q08 shape that drives bloom injection. */
  private def dateJoin(s: SparkSession, cutoff: String) = {
    val orders = s.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp_ntz"))
    val lineitem = s.read.parquet(s"$dir/lineitem.parquet")
    lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum("l_quantity").as("qty"))
  }

  test("bloom prune: weak date-range bloom is removed, strong one is kept") {
    // fixture o_orderdate spans 1995-01-01 .. 2001-08-01 (~2405 days)
    val weakCut = "2001-01-01 00:00:00"   // keeps ~91% -> prune
    val strongCut = "1995-08-01 00:00:00" // keeps ~9%  -> keep
    val off = bloomSession(prune = false)
    val weakOff = bloomCount(dateJoin(off, weakCut))
    val strongOff = bloomCount(dateJoin(off, strongCut))
    assert(weakOff >= 1, "expected InjectRuntimeFilter to fire on the weak filter")
    assert(strongOff >= 1, "expected InjectRuntimeFilter to fire on the strong filter")

    val on = bloomSession(prune = true)
    val weakOn = bloomCount(dateJoin(on, weakCut))
    val strongOn = bloomCount(dateJoin(on, strongCut))
    assert(weakOn === 0, "weak (~91%-selectivity) bloom should be pruned")
    assert(strongOn >= 1, "strong (~9%-selectivity) bloom should survive")

    // results identical with and without the bloom
    val rOff = dateJoin(off, weakCut).orderBy("o_orderpriority").collect().toSeq
    val rOn = dateJoin(on, weakCut).orderBy("o_orderpriority").collect().toSeq
    assert(rOff === rOn)
  }

  test("bloom prune: kept-row ceiling prunes even selective blooms") {
    // strong selectivity (~9%) but the session's maxCreationRows is set
    // below the kept-row estimate -> pruned; the default 4M ceiling keeps it
    val strongCut = "1995-08-01 00:00:00"
    val tiny = bloomSession(prune = true)
    tiny.conf.set("spark.graft.bloom.maxCreationRows", "10")
    assert(bloomCount(dateJoin(tiny, strongCut)) === 0,
      "bloom whose creation side keeps > maxCreationRows should be pruned")
    val dflt = bloomSession(prune = true)
    assert(bloomCount(dateJoin(dflt, strongCut)) >= 1,
      "same bloom survives under the default 4M ceiling")
  }

  test("bloom prune: creation estimate carries the exact footer row count") {
    val df = spark.read.parquet(synthPath).filter(col("x") >= 750L)
    val est = graft.plans.PruneWeakBloom.creationEstimate(planOf(df))
    assert(est.isDefined && est.get._2.contains(1000L), s"estimate was $est")
  }

  test("bloom prune: disabled flag keeps every injected bloom") {
    val off = bloomSession(prune = false)
    val df = dateJoin(off, "2001-01-01 00:00:00")
    assert(bloomCount(df) >= 1)
  }
}
