package graft

import org.apache.spark.sql.SparkSession

/** Local profiling aid: breaks a named query's warm runtime into plan time
  * vs execution time, under the standard Engine config and under ad-hoc
  * config overrides passed as `key=value` args. Not part of the driver
  * contract — a measurement tool for the bench feedback loop.
  *
  * Usage: runMain graft.Profile <query> [k=v ...]
  */
object Profile {
  /** Bare-bones A/B harness: plain builder (no Engine.configure), direct
    * parquet view, fresh spark.sql + collect per run — mirrors an external
    * pyspark experiment to isolate engine-config vs environment effects. */
  def mini(sql: String, sfDir: String): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").createOrReplaceTempView("lineitem")
    val variant = sys.env.getOrElse("SPARK_GRAFT_MINI", "")
    def once(s0: SparkSession): Unit = {
      val s = if (variant.contains("newsession")) s0.newSession() else s0
      if (variant.contains("engtable")) Engine.table(s, sfDir, "lineitem")
      else if (variant != "" && s != s0)
        s.read.parquet(s"$sfDir/lineitem.parquet").createOrReplaceTempView("lineitem")
      val df = s.sql(sql)
      if (variant.contains("noop")) df.write.format("noop").mode("overwrite").save()
      else df.collect()
    }
    (1 to 3).foreach(_ => once(spark))
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      once(spark)
      println(f"[mini:$variant] run$i: ${(System.nanoTime() - t0) / 1e6}%7.1fms")
    }
    if (variant.contains("steps")) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val dur = for {
              a <- si.completionTime; b <- si.submissionTime
            } yield a - b
            val m = si.taskMetrics
            println(s"[stage] id=${si.stageId} tasks=${si.numTasks} " +
              s"dur=${dur.getOrElse(-1L)}ms run=${m.executorRunTime} " +
              s"cpu=${m.executorCpuTime / 1000000} deser=${m.executorDeserializeTime} " +
              s"gc=${m.jvmGCTime} sched=${dur.getOrElse(0L) * si.numTasks - m.executorRunTime - m.executorDeserializeTime}")
          }
        })
    }
    if (variant.contains("benchlike")) {
      val s = spark.newSession()
      Engine.table(s, sfDir, "lineitem")
      val m = org.apache.spark.metrics.source.CodegenMetrics
      (1 to 6).foreach { i =>
        val c0 = m.METRIC_COMPILATION_TIME.getCount
        val t0 = System.nanoTime()
        s.sql(sql).write.format("noop").mode("overwrite").save()
        println(f"[benchlike] run$i: ${(System.nanoTime() - t0) / 1e6}%7.1fms " +
          s"compiles=${m.METRIC_COMPILATION_TIME.getCount - c0}")
      }
    }
    if (variant.contains("dumpsrc")) {
      import org.apache.spark.sql.execution.debug._
      (1 to 2).foreach { i =>
        val s = spark.newSession()
        Engine.table(s, sfDir, "lineitem")
        val src = s.sql(sql).queryExecution.debug.codegenToSeq()
          .map(_._2).mkString("\n====\n")
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"/tmp/codegen_$i.java"), src.getBytes)
      }
      println("[dumpsrc] wrote /tmp/codegen_{1,2}.java")
    }
    if (variant.contains("loop")) (1 to 40).foreach { i =>
      val s = if (variant.contains("parent")) spark else spark.newSession()
      Engine.table(s, sfDir, "lineitem")
      val m = org.apache.spark.metrics.source.CodegenMetrics
      val (c0, g0) = (m.METRIC_COMPILATION_TIME.getCount,
        m.METRIC_GENERATED_CLASS_BYTECODE_SIZE.getCount)
      val t0 = System.nanoTime()
      s.sql(sql).collect()
      if (i % 10 == 0)
        println(f"[loop] iter$i: ${(System.nanoTime() - t0) / 1e6}%7.1fms " +
          s"compiles=${m.METRIC_COMPILATION_TIME.getCount - c0} " +
          s"classes=${m.METRIC_GENERATED_CLASS_BYTECODE_SIZE.getCount - g0}")
    }
    if (variant.contains("steps")) (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val s = if (variant.contains("parent")) spark else spark.newSession()
      val t1 = System.nanoTime()
      Engine.table(s, sfDir, "lineitem")
      val t2 = System.nanoTime()
      val df = s.sql(sql)
      val t3 = System.nanoTime()
      df.queryExecution.executedPlan
      if (variant.contains("showplan") && i == 1)
        println(df.queryExecution.executedPlan.treeString)
      val t4 = System.nanoTime()
      df.collect()
      val t5 = System.nanoTime()
      println(f"[steps] new=${(t1 - t0) / 1e6}%5.1f table=${(t2 - t1) / 1e6}%6.1f " +
        f"sql=${(t3 - t2) / 1e6}%6.1f plan=${(t4 - t3) / 1e6}%6.1f " +
        f"exec=${(t5 - t4) / 1e6}%7.1fms")
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("tpch_q06")
    if (name.startsWith("mini:")) {
      mini(name.stripPrefix("mini:"),
        sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
      return
    }
    val overrides = args.drop(1).map { a =>
      val Array(k, v) = a.split("=", 2); (k, v)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    var b = Engine.configure(
      SparkSession.builder().master(s"local[${Engine.defaultCpus}]"))
    overrides.foreach { case (k, v) => b = b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_STAGES=1: per-stage wall/cpu/shuffle metrics (find where
    // a slow query's execution time actually goes)
    if (sys.env.contains("SPARK_GRAFT_STAGES"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val dur = (for { a <- si.completionTime; b <- si.submissionTime }
              yield a - b).getOrElse(-1L)
            val m = si.taskMetrics
            println(f"[stage] id=${si.stageId}%3d tasks=${si.numTasks}%3d " +
              f"wall=${dur}%5dms run=${m.executorRunTime}%6d " +
              f"cpu=${m.executorCpuTime / 1000000}%6d gc=${m.jvmGCTime}%4d " +
              f"sRead=${m.shuffleReadMetrics.totalBytesRead / 1024}%7dK " +
              f"sWrite=${m.shuffleWriteMetrics.bytesWritten / 1024}%7dK " +
              s"name=${si.name.takeWhile(_ != '\n').take(40)}")
          }
        })

    def once(tag: String): Unit = {
      val s = spark.newSession()
      val t0 = System.nanoTime()
      // `sql:<text>` profiles a raw statement over the registered fixture
      // tables instead of a SparkEntry query (isolation experiments)
      val df =
        if (name.startsWith("sql:")) {
          Seq("region", "nation", "customer", "supplier", "part", "orders",
            "lineitem").foreach(Engine.table(s, sfDir, _))
          s.sql(name.stripPrefix("sql:"))
        } else SparkEntry.queries(name)(s, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimization+planning
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"[profile] $tag%-8s build=${(t1 - t0) / 1e6}%7.1fms " +
        f"plan=${(t2 - t1) / 1e6}%7.1fms exec=${(t3 - t2) / 1e6}%7.1fms " +
        f"total=${(t3 - t0) / 1e6}%7.1fms")
    }
    (1 to 6).foreach(i => once(s"run$i"))
    spark.stop()
  }
}
