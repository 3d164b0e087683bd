package graft

import org.apache.spark.sql.functions._

/** Ad-hoc exploration main (test scope, never shipped in the library):
  * explain/time named catalog queries outside sbt.
  *
  * Usage: AdhocMain <sfDir> explain|time|rows <query...>
  */
object AdhocMain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = args(1)
    val names = args.drop(2)
    val spark = Engine.session(appName = "graft-adhoc")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      mode match {
        case "explain" =>
          println(s"===== $name =====")
          fn(spark, dir).explain("formatted")
        case "time" =>
          val s2 = spark.newSession()
          fn(s2, dir).write.format("noop").mode("overwrite").save() // warm
          val ts = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            fn(s2, dir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"$name%-18s median=${ts.sorted.apply(1)}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
        case "rows" =>
          println(s"$name rows=${fn(spark, dir).count()}")
      }
    }
    spark.stop()
  }
}
