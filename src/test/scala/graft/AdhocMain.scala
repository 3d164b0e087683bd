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
        case "jobs" =>
          // count Spark jobs + their wall spans during one noop-sink run
          val s2 = spark.newSession()
          fn(s2, dir).write.format("noop").mode("overwrite").save() // warm
          val events = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
          val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          val l = new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
              starts.put(js.jobId, js.time)
            override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
              val st = Option(starts.get(je.jobId)).getOrElse(0L)
              events.add((je.jobId, st, je.time))
            }
          }
          s2.sparkContext.addSparkListener(l)
          val t0 = System.nanoTime()
          fn(s2, dir).write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300) // listener drain
          s2.sparkContext.removeSparkListener(l)
          import scala.jdk.CollectionConverters._
          val js = events.asScala.toSeq.sortBy(_._2)
          val base = js.headOption.map(_._2).getOrElse(0L)
          println(f"$name%-18s wall=$wall%.3f jobs=${js.size}")
          js.foreach { case (id, st, en) =>
            println(f"  job$id%-4d start=${(st - base) / 1e3}%8.3f end=${(en - base) / 1e3}%8.3f span=${(en - st) / 1e3}%7.3f")
          }
      }
    }
    spark.stop()
  }
}
