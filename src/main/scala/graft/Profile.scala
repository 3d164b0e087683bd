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
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("tpch_q06")
    val overrides = args.drop(1).map { a =>
      val Array(k, v) = a.split("=", 2); (k, v)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    var b = Engine.configure(
      SparkSession.builder().master(s"local[${Engine.defaultCpus}]"))
    overrides.foreach { case (k, v) => b = b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(tag: String): Unit = {
      val s = spark.newSession()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(s, sfDir)
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
