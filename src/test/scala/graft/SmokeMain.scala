package graft

/** Scratch harness for local iteration: run a comma-separated list of
  * catalog queries at a given sf dir and print row counts. */
object SmokeMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args(1).split(',').toSeq
      else Seq("e01_sessionize", "e02_tumbling_hour", "e03_funnel",
        "e04_asof_join", "e05_range_join", "cb05_daily_histogram",
        "cb07_type_hour_topk", "st01_stream_hourly", "st02_stream_user_totals",
        "st03_stream_sessionize", "st04_stream_stream_join", "st05_stream_dedup")
    val spark = Engine.session(cpus = 8, appName = "smoke")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val t0 = System.nanoTime
      try {
        val c = SparkEntry.queries(n)(spark, dir).count()
        println(f"$n%-28s rows=$c%-8d ${(System.nanoTime - t0) / 1e9}%.1fs")
      } catch {
        case e: Throwable =>
          println(s"$n FAILED: ${Option(e.getMessage).getOrElse(e).toString.take(300)}")
      }
    }
    spark.stop()
  }
}
