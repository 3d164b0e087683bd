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

  val oracles: Map[String, String] = Map(
    "k01_salted_join" -> s"""
      SELECT c_mktsegment, COUNT(*) AS n_orders,
             ${sql.sumd(sql.dbig("o_totalprice"))} AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")
}
