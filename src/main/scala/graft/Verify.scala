package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: only run queries whose name starts with this prefix
    // (local iteration aid; the driver always runs the full set)
    val prefix = args.lift(2).getOrElse("")
    val spark = Engine
      .configure(SparkSession.builder().master(s"local[${Engine.defaultCpus}]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A query that fails to build/write must be an explicit red in the
    // driver gate, not a silent absence (round-5 lesson: 7 queries vanished
    // from CORRECTNESS when a fixture drift broke analysis). Failures are
    // collected into _errors.json next to oracle_sql.json and echoed in a
    // non-zero summary line.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith(prefix)).foreach { case (name, fn) =>
      // Fresh child session per query (same hygiene as Bench): queries that
      // tune session conf for their own plan (e.g. the static-plan twins
      // disabling AQE) must not leak that conf into later queries — p01's
      // plan-shape introspection reds if a twin's AQE-off survives into it.
      try fn(spark.newSession(), sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        errors(name) = msg
        System.err.println(s"[verify] $name failed: $msg")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    if (errors.nonEmpty) {
      System.err.println(
        s"[verify] ${errors.size} QUERY FAILURE(S): ${errors.keys.mkString(", ")}")
      println(s"""{"verify_errors":${errors.size}}""")
    }
    spark.stop()
  }
}
