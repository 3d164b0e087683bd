package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch: the round-11 verdict's "one honest experiment" on the
  * ClickBench heavy high-cardinality GROUP BY regime (q08–q18 class,
  * ~4x the DuckDB proxy at sf100 on the staged layout).
  *
  * Three probes over a representative (cbx_q13: per-phrase distinct
  * users), all on the STAGED hits table so the view-synthesis cost is out
  * of the picture:
  *   1. stage decomposition — per-stage wall time + shuffle bytes, so the
  *      "mid-agg exchange is the cost" hypothesis is measured, not
  *      asserted;
  *   2. shuffle-partition sweep — is the exchange itself mis-sized at 32
  *      partitions for a wide distinct?
  *   3. the pre-aggregated (phrase, user) projection twin (k46) — the
  *      layout answer, timed same-session against the staged default.
  * Bench feedback loop only; not part of the driver contract.
  */
object CbxProbe {

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
      Thread.sleep(500) // listener bus drain
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
    val spark = Engine.session(cpus = 32, appName = "cbx-probe")
    spark.sparkContext.setLogLevel("WARN")
    val th = graft.operators.CbxLayout.writeStagedHits(spark, dir)
    val acc = new StageAcc
    spark.sparkContext.addSparkListener(acc)

    def timeRuns(tag: String, build: () => org.apache.spark.sql.DataFrame,
        n: Int = 3, decompose: Boolean = false): Double = {
      build().write.format("noop").mode("overwrite").save() // warm
      if (decompose) { acc.stages.clear(); }
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

    def stagedSession(sp: Int): SparkSession = {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", sp.toString)
      s.sql(s"CREATE OR REPLACE TEMPORARY VIEW hits AS SELECT * FROM $th")
      s
    }
    val q13 = graft.queries.ClickBench.text("cbx_q13").trim

    // 1. stage decomposition at the default 32 partitions
    println(s"== stage decomposition: cbx_q13 on staged hits, dir=$dir ==")
    val sDecomp = stagedSession(32)
    timeRuns("q13/32/decomp", () => sDecomp.sql(q13), n = 1, decompose = true)

    // 2. shuffle-partition sweep (fresh session per setting)
    println("== shuffle.partitions sweep: cbx_q13 staged ==")
    val sweep = Seq(16, 32, 64, 128, 256).map { sp =>
      val s = stagedSession(sp)
      sp -> timeRuns(s"q13/sp=$sp", () => s.sql(q13))
    }
    println("sweep: " + sweep.map { case (sp, t) => f"$sp:$t%.3f" }.mkString("  "))

    // 3. the pre-aggregated projection twin, same session protocol
    println("== pre-aggregated (phrase,user) projection: k46 vs staged default ==")
    graft.operators.CbxLayout.writeStagedPhraseUser(spark, dir)
    val sDef = stagedSession(32)
    val dflt = timeRuns("q13/staged", () => sDef.sql(q13))
    val sTwin = spark.newSession()
    val twin = timeRuns("k46/pairs",
      () => SparkEntry.queries("k46_pairs_cbx13")(sTwin, dir))
    println(f"k46 pairs twin: $twin%.3f s vs staged default $dflt%.3f s " +
      f"(${100.0 * (twin - dflt) / dflt}%.1f%%)")
    spark.stop()
  }
}
