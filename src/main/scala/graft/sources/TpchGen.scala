package graft.sources

import graft.QueryDsl._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-H table-generator functions (reference:
  * `crates/glaredb_ext_tpch_gen/src/functions/` — `lineitem(sf)`,
  * `orders(sf)`, ... as scan TVFs; schemas per `slt/tpch_gen/describe.slt`).
  *
  * Spark-native design: `spark.range(n)` partitions the keyspace across the
  * cluster and every column derives deterministically from the row id via
  * hash mixing — generation is embarrassingly parallel, no driver-side
  * data, scales to any sf by adding partitions.
  *
  * Schema and the date windows are the official TPC-H ones (o_orderdate in
  * 1992-01-01..1998-08-02; l_shipdate = +1..121, l_commitdate = +30..90,
  * l_receiptdate = shipdate +2..30 — so min/max land on the canonical
  * dbgen bounds at sf1). Region/nation carry the official text; the other
  * string/measure values are deterministic hash draws, NOT the official
  * dbgen RNG streams.
  */
object TpchGen {

  private def u(seed: Int, id: Column): Column =
    pmod(xxhash64(lit(seed), id), lit(1000000L)).cast(DoubleType) / 1000000.0

  private def money(seed: Int, id: Column, lo: Double, hi: Double): Column =
    round(lit(lo) + u(seed, id) * (hi - lo), 2).cast(DecimalType(15, 2))

  private def pick(xs: Seq[String], seed: Int, id: Column): Column =
    element_at(array(xs.map(lit): _*),
      (pmod(xxhash64(lit(seed), id), lit(xs.size)) + 1).cast(IntegerType))

  private def words(prefix: String, seed: Int, id: Column): Column =
    concat_ws(" ",
      pick(Seq("carefully", "quickly", "furiously", "blithely", "slyly"), seed, id),
      pick(Seq("final", "ironic", "pending", "regular", "express", "special"),
        seed + 1, id),
      pick(Seq("deposits", "requests", "packages", "accounts", "theodolites",
        "pinto beans", "foxes", "instructions"), seed + 2, id),
      lit(prefix))

  private def phone(seed: Int, id: Column, nation: Column): Column =
    concat(lpad((nation + 10).cast(StringType), 2, "0"), lit("-"),
      lpad(pmod(xxhash64(lit(seed), id), lit(900L)).cast(StringType), 3, "1"),
      lit("-"),
      lpad(pmod(xxhash64(lit(seed + 1), id), lit(900L)).cast(StringType), 3, "1"),
      lit("-"),
      lpad(pmod(xxhash64(lit(seed + 2), id), lit(9000L)).cast(StringType), 4, "1"))

  private val epoch92 = lit(java.sql.Date.valueOf("1992-01-01"))
  /** official order-date window 1992-01-01..1998-08-02 (2406 days) */
  private def orderDate(id: Column): Column =
    date_add(epoch92, pmod(xxhash64(lit(7), id), lit(2406L)).cast(IntegerType))

  /** Official region rows (public TPC-H dbgen output, asserted verbatim by
    * the reference's slt/tpch_gen/region.slt). */
  val regionRows: Seq[(Int, String, String)] = Seq(
    (0, "AFRICA", "lar deposits. blithely final packages cajole. regular waters are final requests. regular accounts are according to "),
    (1, "AMERICA", "hs use ironic, even requests. s"),
    (2, "ASIA", "ges. thinly even pinto beans ca"),
    (3, "EUROPE", "ly final courts cajole furiously final excuse"),
    (4, "MIDDLE EAST", "uickly special accounts cajole carefully blithely close requests. carefully final asymptotes haggle furiousl"))

  /** Official nation list (name, regionkey) — public TPC-H spec table. */
  val nations: Seq[(String, Int)] = Seq(
    "ALGERIA" -> 0, "ARGENTINA" -> 1, "BRAZIL" -> 1, "CANADA" -> 1,
    "EGYPT" -> 4, "ETHIOPIA" -> 0, "FRANCE" -> 3, "GERMANY" -> 3,
    "INDIA" -> 2, "INDONESIA" -> 2, "IRAN" -> 4, "IRAQ" -> 4, "JAPAN" -> 2,
    "JORDAN" -> 4, "KENYA" -> 0, "MOROCCO" -> 0, "MOZAMBIQUE" -> 0,
    "PERU" -> 1, "CHINA" -> 2, "ROMANIA" -> 3, "SAUDI ARABIA" -> 4,
    "VIETNAM" -> 2, "RUSSIA" -> 3, "UNITED KINGDOM" -> 3,
    "UNITED STATES" -> 1)

  def region(spark: SparkSession): DataFrame = {
    import spark.implicits._
    regionRows.toDF("r_regionkey", "r_name", "r_comment")
  }

  def nation(spark: SparkSession): DataFrame = {
    import spark.implicits._
    nations.zipWithIndex.map { case ((n, r), i) =>
      (i, n, r, s"${n.toLowerCase} requests haggle carefully final deposits")
    }.toDF("n_nationkey", "n_name", "n_regionkey", "n_comment")
  }

  def customer(spark: SparkSession, sf: Double): DataFrame = {
    val n = math.max((150000 * sf).toLong, 1L)
    spark.range(1, n + 1).select(
      col("id").as("c_custkey"),
      concat(lit("Customer#"), lpad(col("id").cast(StringType), 9, "0")).as("c_name"),
      concat(lit("Addr "), pmod(xxhash64(lit(21), col("id")), lit(100000L))
        .cast(StringType)).as("c_address"),
      pmod(xxhash64(lit(1), col("id")), lit(25)).cast(IntegerType).as("c_nationkey"),
      phone(22, col("id"),
        pmod(xxhash64(lit(1), col("id")), lit(25)).cast(IntegerType)).as("c_phone"),
      money(2, col("id"), -999.99, 9999.99).as("c_acctbal"),
      pick(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
        "MACHINERY"), 3, col("id")).as("c_mktsegment"),
      words("customer", 25, col("id")).as("c_comment"))
  }

  def supplier(spark: SparkSession, sf: Double): DataFrame = {
    val n = math.max((10000 * sf).toLong, 1L)
    spark.range(1, n + 1).select(
      col("id").as("s_suppkey"),
      concat(lit("Supplier#"), lpad(col("id").cast(StringType), 9, "0")).as("s_name"),
      concat(lit("Addr "), pmod(xxhash64(lit(31), col("id")), lit(100000L))
        .cast(StringType)).as("s_address"),
      pmod(xxhash64(lit(32), col("id")), lit(25)).cast(IntegerType).as("s_nationkey"),
      phone(33, col("id"),
        pmod(xxhash64(lit(32), col("id")), lit(25)).cast(IntegerType)).as("s_phone"),
      money(36, col("id"), -999.99, 9999.99).as("s_acctbal"),
      words("supplier", 37, col("id")).as("s_comment"))
  }

  def part(spark: SparkSession, sf: Double): DataFrame = {
    val n = math.max((200000 * sf).toLong, 1L)
    val id = col("id")
    spark.range(1, n + 1).select(
      id.as("p_partkey"),
      concat_ws(" ",
        pick(Seq("goldenrod", "blush", "thistle", "chartreuse", "linen"), 41, id),
        pick(Seq("lavender", "spring", "moccasin", "snow", "cornsilk"), 42, id),
        pick(Seq("green", "lemon", "powder", "khaki", "metallic"), 43, id)).as("p_name"),
      concat(lit("Manufacturer#"),
        (pmod(xxhash64(lit(44), id), lit(5)) + 1).cast(StringType)).as("p_mfgr"),
      concat(lit("Brand#"),
        (pmod(xxhash64(lit(44), id), lit(5)) + 1).cast(StringType),
        (pmod(xxhash64(lit(45), id), lit(5)) + 1).cast(StringType)).as("p_brand"),
      concat_ws(" ",
        pick(Seq("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"), 46, id),
        pick(Seq("ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"), 47, id),
        pick(Seq("TIN", "NICKEL", "BRASS", "STEEL", "COPPER"), 48, id)).as("p_type"),
      (pmod(xxhash64(lit(49), id), lit(50)) + 1).cast(IntegerType).as("p_size"),
      concat_ws(" ",
        pick(Seq("SM", "LG", "MED", "JUMBO", "WRAP"), 50, id),
        pick(Seq("CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM"),
          51, id)).as("p_container"),
      money(52, id, 901.0, 2098.99).as("p_retailprice"),
      words("part", 53, id).as("p_comment"))
  }

  def partsupp(spark: SparkSession, sf: Double): DataFrame = {
    val partN = math.max((200000 * sf).toLong, 1L)
    val suppN = math.max((10000 * sf).toLong, 1L)
    // official shape: 4 suppliers per part, assigned by the dbgen formula
    // ((partkey + i*(suppN/4 + (partkey-1)/suppN)) % suppN) + 1 — this
    // guarantees the 4 suppliers of a part are DISTINCT, preserving the
    // (ps_partkey, ps_suppkey) primary key that dbgen promises (an
    // independent hash draw collides for ~4·3/suppN of parts, and joins
    // assuming PK uniqueness would double-count)
    spark.range(1, partN + 1)
      .select(col("id").as("ps_partkey"),
        explode(sequence(lit(0), lit(3))).as("i"))
      .select(
        col("ps_partkey"),
        (pmod(col("ps_partkey") + col("i") *
            (lit(suppN / 4) + floor((col("ps_partkey") - 1) / lit(suppN.toDouble))
              .cast(LongType)),
          lit(suppN)) + 1)
          .as("ps_suppkey"),
        (pmod(xxhash64(lit(56), col("ps_partkey"), col("i")), lit(9999)) + 1)
          .cast(IntegerType).as("ps_availqty"),
        money(57, col("ps_partkey") * 4 + col("i"), 1.0, 1000.0)
          .as("ps_supplycost"),
        words("partsupp", 58, col("ps_partkey") * 4 + col("i"))
          .as("ps_comment"))
  }

  def orders(spark: SparkSession, sf: Double): DataFrame = {
    val n = math.max((1500000 * sf).toLong, 1L)
    val custN = math.max((150000 * sf).toLong, 1L)
    spark.range(1, n + 1).select(
      col("id").as("o_orderkey"),
      (pmod(xxhash64(lit(4), col("id")), lit(custN)) + 1).as("o_custkey"),
      pick(Seq("F", "O", "P"), 5, col("id")).as("o_orderstatus"),
      money(6, col("id"), 1000.0, 500000.0).as("o_totalprice"),
      orderDate(col("id")).as("o_orderdate"),
      pick(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
        8, col("id")).as("o_orderpriority"),
      concat(lit("Clerk#"),
        lpad(pmod(xxhash64(lit(61), col("id")), lit(1000L)).cast(StringType),
          9, "0")).as("o_clerk"),
      lit(0).as("o_shippriority"),
      words("orders", 62, col("id")).as("o_comment"))
  }

  def lineitem(spark: SparkSession, sf: Double): DataFrame = {
    val orderN = math.max((1500000 * sf).toLong, 1L)
    val partN = math.max((200000 * sf).toLong, 1L)
    val suppN = math.max((10000 * sf).toLong, 1L)
    def h(seed: Int): Column =
      xxhash64(lit(seed), col("l_orderkey"), col("l_linenumber"))
    // 1..7 lines per order, exploded — generation stays partition-parallel;
    // dates chain off the order's date with the official offset windows
    spark.range(1, orderN + 1)
      .select(col("id").as("l_orderkey"),
        explode(sequence(lit(1),
          (pmod(xxhash64(lit(9), col("id")), lit(7)) + 1).cast(IntegerType)))
          .as("l_linenumber"))
      .withColumn("ship",
        date_add(orderDate(col("l_orderkey")),
          (pmod(h(19), lit(121L)) + 1).cast(IntegerType)))
      .select(
        col("l_orderkey"),
        (pmod(h(10), lit(partN)) + 1).as("l_partkey"),
        (pmod(h(11), lit(suppN)) + 1).as("l_suppkey"),
        col("l_linenumber"),
        (pmod(h(12), lit(50)) + 1).as("l_quantity"),
        money(13, col("l_orderkey") * 8 + col("l_linenumber"), 901.0, 104999.99)
          .as("l_extendedprice"),
        (pmod(h(14), lit(11)).cast(DoubleType) / 100.0)
          .cast(DecimalType(15, 2)).as("l_discount"),
        (pmod(h(15), lit(9)).cast(DoubleType) / 100.0)
          .cast(DecimalType(15, 2)).as("l_tax"),
        element_at(array(lit("A"), lit("N"), lit("R")),
          (pmod(h(16), lit(3)) + 1).cast(IntegerType)).as("l_returnflag"),
        element_at(array(lit("F"), lit("O")),
          (pmod(h(17), lit(2)) + 1).cast(IntegerType)).as("l_linestatus"),
        col("ship").as("l_shipdate"),
        date_add(orderDate(col("l_orderkey")),
          (pmod(h(20), lit(61L)) + 30).cast(IntegerType)).as("l_commitdate"),
        date_add(col("ship"), (pmod(h(101), lit(29L)) + 2).cast(IntegerType))
          .as("l_receiptdate"),
        pick(Seq("DELIVER IN PERSON", "COLLECT COD", "NONE",
          "TAKE BACK RETURN"), 22, col("l_orderkey") * 8 + col("l_linenumber"))
          .as("l_shipinstruct"),
        pick(Seq("AIR", "FOB", "MAIL", "RAIL", "REG AIR", "SHIP", "TRUCK"),
          23, col("l_orderkey") * 8 + col("l_linenumber")).as("l_shipmode"),
        words("lineitem", 24, col("l_orderkey") * 8 + col("l_linenumber"))
          .as("l_comment"))
  }

  def table(spark: SparkSession, name: String, sf: Double): DataFrame =
    name.toLowerCase match {
      case "region"   => region(spark)
      case "nation"   => nation(spark)
      case "customer" => customer(spark, sf)
      case "supplier" => supplier(spark, sf)
      case "part"     => part(spark, sf)
      case "partsupp" => partsupp(spark, sf)
      case "orders"   => orders(spark, sf)
      case "lineitem" => lineitem(spark, sf)
    }

  val queries: Map[String, Q] = Map(
    // Generator TVF smoke: generate lineitem at a tiny sf and aggregate.
    // Deterministic (hash-derived), so re-runs produce identical output.
    "g01_tpch_gen_lineitem" -> { (s, dir) =>
      lineitem(s, 0.001)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).as("sum_qty"))
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
        ('A', CAST(2005 AS BIGINT), CAST(50446 AS BIGINT)),
        ('N', CAST(2091 AS BIGINT), CAST(53035 AS BIGINT)),
        ('R', CAST(1995 AS BIGINT), CAST(50800 AS BIGINT)))
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
