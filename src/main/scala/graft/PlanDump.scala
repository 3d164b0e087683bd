package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for a list of queries into per-query text
  * files — the optimization-round evidence artifact (`plans/r13/...`): for
  * every query a round touches, the plan of the DEFAULT program
  * (`<name>_before.txt` when invoked with the default query) and of the
  * adopted optimized program (`<name>_after.txt` when invoked with the
  * twin) are committed so plan claims (Exchange counts, join strategies,
  * PushedFilters) are checkable without running Spark.
  *
  * Same planning environment as [[Plans]]: sf0.01 fixtures with
  * autoBroadcastJoinThreshold scaled to the fixture (24 KB) so the plans
  * show the at-scale shape (facts never broadcast), AQE initial plan.
  *
  * Usage: PlanDump <outDir> <queryName=fileName> [more...]
  *   e.g. PlanDump plans/r13 tpcds_q14=tpcds_q14_before k58_fused_ds14=tpcds_q14_after
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    Files.createDirectories(outDir)
    val spark = Engine.session(cpus = 8, appName = "graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (24 << 10).toString)
    val dir = "/root/testdata/sf0.01"
    args.drop(1).foreach { spec =>
      val Array(q, file) = spec.split("=", 2)
      val s = spark.newSession()
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", (24 << 10).toString)
      val df = SparkEntry.queries(q)(s, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(file + ".txt"),
        (s"-- query: $q (sf0.01, autoBroadcastJoinThreshold=24KB, AQE initial plan)\n" +
          txt).getBytes("UTF-8"))
      println(s"wrote ${outDir.resolve(file + ".txt")}")
    }
    spark.stop()
  }
}
