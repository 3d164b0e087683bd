package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Experimental query variants for A/B measurement (test scope only).
  * Usage: ExpMain <sfDir> <variant...> — times each named variant like
  * AdhocMain's `time` mode.
  */
object ExpMain {
  import graft.QueryDsl.Q

  private def t(s: SparkSession, dir: String, n: String) = Engine.table(s, dir, n)

  /** q11 in ONE DataFrame DAG: no localCheckpoint; the per-part aggregate
    * subtree appears twice (output + threshold) and the shuffle exchange
    * is expected to be reused by ReuseExchangeAndSubquery/AQE. */
  val q11OneDag: Q = { (s, dir) =>
    val (tps, _) = graft.operators.Skew.writeStagedPartsupp(s, dir, 32)
    graft.functions.DecimalFunctions.register(s)
    val sup = t(s, dir, "supplier")
      .join(t(s, dir, "nation").filter(col("n_name") === "NATION_7"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    def byPart = s.table(tps)
      .join(broadcast(sup), col("ps_suppkey") === col("s_suppkey"))
      .withColumn("row_u",
        expr("to_unscaled64(ps_supplycost, 12, 4)") * col("ps_availqty"))
      .groupBy(col("ps_partkey"))
      .agg(sum(col("row_u")).as("gu"))
    val threshold = byPart
      .agg((expr("sum_unscaled128(gu, 4, 4)") * lit(0.001)).as("t"))
      .select(col("t"))
    byPart
      .withColumn("value",
        (col("gu").cast(DecimalType(38, 4)) / lit(10000))
          .cast(DecimalType(24, 4)).cast(DoubleType))
      .join(broadcast(threshold), col("value") > col("t"), "inner")
      .select(col("ps_partkey"), col("value"))
      .orderBy(desc("value"))
  }

  val variants: Map[String, Q] = Map(
    "q11_onedag" -> q11OneDag)

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = Engine.session(appName = "graft-exp")
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val fn = variants(name)
      val s2 = spark.newSession()
      fn(s2, dir).write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        fn(s2, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-18s median=${ts.sorted.apply(2)}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
      println(s"rows=${fn(s2, dir).count()}")
    }
    spark.stop()
  }
}
