package graft.functions

import graft.QueryDsl._
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed UDAF extension surface (SURVEY.md §2.7: GlareDB
  * `UnaryAggregate`/`BinaryAggregate` traits with update/combine/finalize ≙
  * Spark `Aggregator[IN, BUF, OUT]`).
  *
  * RangeAgg is intentionally order-independent (min/max are associative
  * and commutative), so its result is exact and engine-portable — the
  * oracle is MAX(x) - MIN(x).
  */
object RangeAgg extends Aggregator[Double, (Double, Double), Double] {
  override def zero: (Double, Double) =
    (Double.PositiveInfinity, Double.NegativeInfinity)
  override def reduce(b: (Double, Double), a: Double): (Double, Double) =
    (math.min(b._1, a), math.max(b._2, a))
  override def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
    (math.min(x._1, y._1), math.max(x._2, y._2))
  override def finish(b: (Double, Double)): Double =
    if (b._1 > b._2) 0.0 else b._2 - b._1
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object Aggregators {
  def register(spark: SparkSession): Unit =
    spark.udf.register("range_agg", udaf(RangeAgg))

  val queries: Map[String, Q] = Map(
    // UDAF through the SQL registry: custom Aggregator usable by name.
    "a01_custom_aggregator" -> { (s, dir) =>
      register(s)
      t(s, dir, "customer")
      s.sql("""
        SELECT c_nationkey, range_agg(c_acctbal) AS bal_range, COUNT(*) AS n
        FROM customer
        GROUP BY c_nationkey
        ORDER BY c_nationkey
      """)
    },

    // SpaceSaving heavy hitters through the TypedImperativeAggregate
    // extension surface: top-10 users by event count from a
    // capacity-bounded mergeable sketch. capacity (4096) exceeds the key
    // cardinality at every fixture SF, so no partial summary ever evicts
    // and the sketch is exact (err 0) — the oracle is the exact top-10.
    // The undersized-capacity error contract is spec-checked in GraftSpec.
    "a02_topk_sketch" -> { (s, dir) =>
      HeavyHitters.register(s)
      t(s, dir, "events")
      s.sql("""
        SELECT key AS user_id, cnt AS n_events, err,
               CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS INT) AS rnk
        FROM (
          SELECT t.key, t.count AS cnt, t.err
          FROM (SELECT inline(topk_sketch(user_id, 10, 4096)) FROM events) t)
        ORDER BY rnk
      """)
    })

  val oracles: Map[String, String] = Map(
    "a01_custom_aggregator" -> """
      SELECT c_nationkey, MAX(c_acctbal) - MIN(c_acctbal) AS bal_range,
             COUNT(*) AS n
      FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""",

    "a02_topk_sketch" -> """
      SELECT user_id, COUNT(*) AS n_events, CAST(0 AS BIGINT) AS err,
             CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, user_id) AS INT)
               AS rnk
      FROM events GROUP BY user_id
      ORDER BY n_events DESC, user_id LIMIT 10""")
}
