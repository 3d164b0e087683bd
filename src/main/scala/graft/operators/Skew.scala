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
    val tag = Integer.toHexString(dir.hashCode).take(8)
    val (to, tc) = (s"graft_bkt_orders_$tag", s"graft_bkt_customer_$tag")
    if (!spark.catalog.tableExists(to)) {
      // the in-memory catalog is per-JVM but the warehouse dir persists:
      // purge stale locations from earlier runs before re-creating
      val wh = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      Seq(to, tc).foreach { tbl =>
        val f = new java.io.File(wh, tbl)
        if (f.exists()) {
          def rm(x: java.io.File): Unit = {
            Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
          }
          rm(f)
        }
      }
      t(spark, dir, "orders")
        .write.mode("overwrite").format("parquet")
        .bucketBy(nBuckets, "o_custkey").sortBy("o_custkey")
        .saveAsTable(to)
      t(spark, dir, "customer")
        .write.mode("overwrite").format("parquet")
        .bucketBy(nBuckets, "c_custkey").sortBy("c_custkey")
        .saveAsTable(tc)
    }
    (to, tc)
  }

  val bucketedQueries: Map[String, Q] = Map(
    // Join of two tables bucketed on the join key: zero Exchange nodes
    // (asserted by spec) — at scale the only cost is the local merge.
    "k02_bucketed_join" -> { (s, dir) =>
      val (to, tc) = writeBucketed(s, dir, 8)
      s.table(to).hint("merge")
        .join(s.table(tc).hint("merge"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sumd(dbig(col("o_totalprice"))).as("total"))
        .orderBy("c_mktsegment")
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
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")
}
