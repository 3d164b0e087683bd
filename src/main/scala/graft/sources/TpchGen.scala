package graft.sources

import graft.QueryDsl._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-H table-generator functions (reference:
  * `crates/glaredb_ext_tpch_gen/src/functions/` — `lineitem(sf)`,
  * `orders(sf)`, ... as scan TVFs).
  *
  * Spark-native design: `spark.range(n)` partitions the keyspace across the
  * cluster and every column derives deterministically from the row id via
  * hash mixing — generation is embarrassingly parallel, no driver-side
  * data, scales to any sf by adding partitions. Values are deterministic
  * but NOT the official dbgen streams; schema and distributions match the
  * driver fixture shape (FIXTURES.md).
  */
object TpchGen {

  private def u(seed: Int, id: Column): Column =
    pmod(xxhash64(lit(seed), id), lit(1000000L)).cast(DoubleType) / 1000000.0

  private def money(seed: Int, id: Column, lo: Double, hi: Double): Column =
    round(lit(lo) + u(seed, id) * (hi - lo), 2)

  val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")

  def region(spark: SparkSession): DataFrame = {
    import spark.implicits._
    regions.zipWithIndex.map { case (n, i) => (i, n) }
      .toDF("r_regionkey", "r_name")
  }

  def nation(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 25).map(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey")
  }

  def customer(spark: SparkSession, sf: Double): DataFrame = {
    val n = math.max((150000 * sf).toLong, 1L)
    val segs = array(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY").map(lit): _*)
    spark.range(1, n + 1).select(
      col("id").as("c_custkey"),
      concat(lit("Customer#"), lpad(col("id").cast(StringType), 9, "0")).as("c_name"),
      pmod(xxhash64(lit(1), col("id")), lit(25)).cast(IntegerType).as("c_nationkey"),
      money(2, col("id"), -999.99, 9999.99).as("c_acctbal"),
      element_at(segs, (pmod(xxhash64(lit(3), col("id")), lit(5)) + 1).cast(IntegerType))
        .as("c_mktsegment"))
  }

  def orders(spark: SparkSession, sf: Double): DataFrame = {
    val n = math.max((1500000 * sf).toLong, 1L)
    val custN = math.max((150000 * sf).toLong, 1L)
    val prios = array(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW").map(lit): _*)
    spark.range(1, n + 1).select(
      col("id").as("o_orderkey"),
      (pmod(xxhash64(lit(4), col("id")), lit(custN)) + 1).as("o_custkey"),
      element_at(array(lit("F"), lit("O"), lit("P")),
        (pmod(xxhash64(lit(5), col("id")), lit(3)) + 1).cast(IntegerType))
        .as("o_orderstatus"),
      money(6, col("id"), 1000.0, 500000.0).as("o_totalprice"),
      timestamp_seconds(lit(788918400L) +
        pmod(xxhash64(lit(7), col("id")), lit(200000000L))).cast(TimestampNTZType)
        .as("o_orderdate"),
      element_at(prios, (pmod(xxhash64(lit(8), col("id")), lit(5)) + 1).cast(IntegerType))
        .as("o_orderpriority"))
  }

  def lineitem(spark: SparkSession, sf: Double): DataFrame = {
    val orderN = math.max((1500000 * sf).toLong, 1L)
    val partN = math.max((200000 * sf).toLong, 1L)
    val suppN = math.max((10000 * sf).toLong, 1L)
    // 1..7 lines per order, exploded — generation stays partition-parallel
    spark.range(1, orderN + 1)
      .select(col("id").as("l_orderkey"),
        explode(sequence(lit(1),
          (pmod(xxhash64(lit(9), col("id")), lit(7)) + 1).cast(IntegerType)))
          .as("l_linenumber"))
      .select(
        col("l_orderkey"),
        (pmod(xxhash64(lit(10), col("l_orderkey"), col("l_linenumber")), lit(partN)) + 1)
          .as("l_partkey"),
        (pmod(xxhash64(lit(11), col("l_orderkey"), col("l_linenumber")), lit(suppN)) + 1)
          .as("l_suppkey"),
        col("l_linenumber"),
        (pmod(xxhash64(lit(12), col("l_orderkey"), col("l_linenumber")), lit(50)) + 1)
          .cast(DoubleType).as("l_quantity"),
        round(lit(901.0) + pmod(xxhash64(lit(13), col("l_orderkey"), col("l_linenumber")),
          lit(10410000L)).cast(DoubleType) / 100.0, 2).as("l_extendedprice"),
        (pmod(xxhash64(lit(14), col("l_orderkey"), col("l_linenumber")), lit(11))
          .cast(DoubleType) / 100.0).as("l_discount"),
        (pmod(xxhash64(lit(15), col("l_orderkey"), col("l_linenumber")), lit(9))
          .cast(DoubleType) / 100.0).as("l_tax"),
        element_at(array(lit("A"), lit("N"), lit("R")),
          (pmod(xxhash64(lit(16), col("l_orderkey"), col("l_linenumber")), lit(3)) + 1)
            .cast(IntegerType)).as("l_returnflag"),
        element_at(array(lit("F"), lit("O")),
          (pmod(xxhash64(lit(17), col("l_orderkey"), col("l_linenumber")), lit(2)) + 1)
            .cast(IntegerType)).as("l_linestatus"),
        timestamp_seconds(lit(788918400L) +
          pmod(xxhash64(lit(18), col("l_orderkey"), col("l_linenumber")),
            lit(210000000L))).cast(TimestampNTZType).as("l_shipdate"))
  }

  val queries: Map[String, Q] = Map(
    // Generator TVF smoke: generate lineitem at a tiny sf and aggregate.
    // Deterministic (hash-derived), so re-runs produce identical output.
    "g01_tpch_gen_lineitem" -> { (s, dir) =>
      lineitem(s, 0.001)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sumd(drate(col("l_quantity"))).as("sum_qty"))
        .orderBy("l_returnflag")
    },

    "g02_tpch_gen_join" -> { (s, dir) =>
      val c = customer(s, 0.001)
      val o = orders(s, 0.001)
      c.join(o, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sumd(dbig(col("o_totalprice"))).as("total"))
        .orderBy("c_mktsegment")
    })

  /** The generators are pure functions of (seed constants, sf): their
    * outputs are fixed values, so the oracle is the expected literal result
    * (recorded once; any change to the hash-mixing or distributions is a
    * contract break this catches). */
  val oracles: Map[String, String] = Map(
    "g01_tpch_gen_lineitem" -> """
      SELECT * FROM (VALUES
        ('A', CAST(2005 AS BIGINT), CAST(50446.0 AS DOUBLE)),
        ('N', CAST(2091 AS BIGINT), CAST(53035.0 AS DOUBLE)),
        ('R', CAST(1995 AS BIGINT), CAST(50800.0 AS DOUBLE)))
        AS t(l_returnflag, n, sum_qty)
      ORDER BY l_returnflag""",

    "g02_tpch_gen_join" -> """
      SELECT * FROM (VALUES
        ('AUTOMOBILE', CAST(265 AS BIGINT), CAST(69295416.21 AS DOUBLE)),
        ('BUILDING',   CAST(314 AS BIGINT), CAST(82708189.03 AS DOUBLE)),
        ('FURNITURE',  CAST(278 AS BIGINT), CAST(68518304.54 AS DOUBLE)),
        ('HOUSEHOLD',  CAST(276 AS BIGINT), CAST(65487143.43 AS DOUBLE)),
        ('MACHINERY',  CAST(367 AS BIGINT), CAST(94179303.58 AS DOUBLE)))
        AS t(c_mktsegment, n_orders, total)
      ORDER BY c_mktsegment""")
}
