package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe — not part of the engine surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(cpus = 8, appName = "scratch")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q01_pricing_summary", "q03_topk_revenue", "q05_nation_revenue",
      "q06_revenue_flat", "n01_knn_cosine", "e01_sessionize")) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
