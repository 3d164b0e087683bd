package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch: the round-12 verdict's report-floor adjudication (task 4) —
  * TPC-DS q67 (2.39x) / q98 (2.58x) at sf10, measured not asserted.
  *
  * Hypotheses on the table:
  *   - q67: Spark plans ROLLUP as Expand(x9 grouping sets) BEFORE the
  *     first aggregate — the fact's joined rows ride the partial agg nine
  *     times. Evidence: the partial-agg stage's records-written vs the
  *     fact row count. Answer candidate: k59 (finest-base re-rollup).
  *   - q98: single-pass agg + class window + full ORDER BY; the suspect
  *     is the synthesis scan (store_sales CTE re-derives ~20 columns from
  *     lineitem for a 3-column read). Answer candidate: k60 (staged
  *     pricing projection).
  * Bench feedback loop only; not part of the driver contract.
  */
object DsProbe {

  private class StageAcc extends SparkListener {
    case class S(id: Int, name: String, ms: Long, tasks: Int,
        shufRead: Long, shufWrite: Long, records: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[S]()
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val i = sc.stageInfo
      val ms = (for {a <- i.completionTime; b <- i.submissionTime}
        yield a - b).getOrElse(-1L)
      stages.add(S(i.stageId, i.name.takeWhile(_ != '\n').take(60), ms,
        i.numTasks, i.taskMetrics.shuffleReadMetrics.remoteBytesRead +
          i.taskMetrics.shuffleReadMetrics.localBytesRead,
        i.taskMetrics.shuffleWriteMetrics.bytesWritten,
        i.taskMetrics.shuffleWriteMetrics.recordsWritten))
    }
    def drainPrint(tag: String): Unit = {
      Thread.sleep(500)
      var s = stages.poll()
      while (s != null) {
        println(f"[$tag] stage ${s.id}%4d ${s.ms}%7d ms ${s.tasks}%4d tasks " +
          f"shufR ${s.shufRead / 1e6}%9.1f MB shufW ${s.shufWrite / 1e6}%9.1f MB " +
          f"recW ${s.records}%12d  ${s.name}")
        s = stages.poll()
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf10")
    val spark = Engine.session(cpus = 32, appName = "ds-probe")
    spark.sparkContext.setLogLevel("WARN")
    val acc = new StageAcc
    spark.sparkContext.addSparkListener(acc)

    def timeRuns(tag: String, build: () => org.apache.spark.sql.DataFrame,
        n: Int = 3, decompose: Boolean = false): Double = {
      build().write.format("noop").mode("overwrite").save() // warm
      if (decompose) acc.stages.clear()
      val runs = (1 to n).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        build().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      if (decompose) acc.drainPrint(tag)
      val med = runs.sorted.apply(n / 2)
      println(f"[$tag] median $med%.3f s  runs ${runs.map(r => f"$r%.3f").mkString(" ")}")
      med
    }

    for (name <- Seq("tpcds_q67", "tpcds_q98")) {
      val s = spark.newSession()
      graft.queries.Tpcds.ensureStar(s, dir)
      timeRuns(s"$name/view", () => s.sql(graft.queries.Tpcds.texts(name).trim),
        decompose = true)
      try graft.queries.Tpcds.clearStarCache(spark) catch { case _: Throwable => }
      System.gc()
    }
    for (twin <- Seq("k59_fused_ds67", "k60_staged_ds98")) {
      val s = spark.newSession()
      timeRuns(s"$twin", () => SparkEntry.queries(twin)(s, dir),
        decompose = true)
      try graft.queries.Tpcds.clearStarCache(spark) catch { case _: Throwable => }
      System.gc()
    }
    spark.stop()
  }
}
