package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe — not part of the engine surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(cpus = 8, appName = "scratch")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val ev = Engine.table(spark, dir, "events")
    ev.printSchema()
    ev.show(3, truncate = false)
    spark.stop()
  }
}
