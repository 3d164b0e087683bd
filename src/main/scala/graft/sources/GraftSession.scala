package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL front-end sugar matching the reference's resolver behavior:
  *
  *  - `FROM '<path>'` — a quoted file path used as a table is resolved to a
  *    read of that file, with the handler inferred from the extension
  *    (GlareDB `logical/resolver/resolve_normal.rs:255-276`).
  *  - `read_parquet('<path>')` / `read_csv('<path>')` / `read_text('<path>')`
  *    table functions (glaredb_ext_parquet `functions/scan.rs:33`,
  *    glaredb_ext_csv `functions/read_csv.rs:34`,
  *    `functions/table/builtin/read_text.rs:28`).
  *
  * Implementation: a pre-parse rewrite that registers each referenced path
  * as a temp view backed by the matching `spark.read` (so Catalyst still
  * sees a plain scan with full pushdown), then delegates to `spark.sql`.
  */
object GraftSession {

  private val TvfPattern =
    raw"""(?i)read_(parquet|csv|text|delta)\s*\(\s*'([^']+)'\s*\)""".r
  private val PathPattern =
    raw"""(?i)(from|join)\s+'([^']+\.(?:parquet|csv|txt|json))'""".r
  // A quoted directory used as a table resolves to Delta when it has a log,
  // or to Iceberg when it has a metadata/ dir with *.metadata.json.
  private val DirPattern =
    raw"""(?i)(from|join)\s+'([^']+)'""".r
  // iceberg.metadata/snapshots/manifest_list/data_files('<path>') TVFs +
  // read_iceberg('<path>') (glaredb_ext_iceberg functions/metadata.rs:36-81).
  private val IcebergTvfPattern =
    raw"""(?i)(?:iceberg\.(metadata|snapshots|manifest_list|data_files)|(read_iceberg))\s*\(\s*'([^']+)'\s*\)""".r

  private def readPath(spark: SparkSession, fmt: String, path: String): DataFrame =
    fmt match {
      case "parquet" => spark.read.parquet(path)
      case "csv" =>
        spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      case "text" | "txt" =>
        spark.read.option("wholetext", "true").text(path)
      case "json"  => spark.read.json(path)
      case "delta" => Delta.read(spark, path)
    }

  private def fmtOf(path: String): String =
    path.replaceAll(""".*\.""", "").toLowerCase

  private def viewName(path: String): String =
    "graft_path_" + java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(path).toLong & 0xffffffffL)

  /** Run SQL with path-as-table / read_* TVF sugar resolved. */
  def sql(spark: SparkSession, query: String): DataFrame = {
    var rewritten = IcebergTvfPattern.replaceAllIn(query, m => {
      val (fn, path) = (Option(m.group(1)).getOrElse("read"), m.group(3))
      val df = fn match {
        case "metadata"      => Iceberg.metadataDf(spark, path)
        case "snapshots"     => Iceberg.snapshotsDf(spark, path)
        case "manifest_list" => Iceberg.manifestListDf(spark, path)
        case "data_files"    => Iceberg.dataFilesDf(spark, path)
        case _               => Iceberg.read(spark, path)
      }
      val v = viewName(fn + ":" + path)
      df.createOrReplaceTempView(v)
      java.util.regex.Matcher.quoteReplacement(v)
    })
    rewritten = TvfPattern.replaceAllIn(rewritten, m => {
      val (fmt, path) = (m.group(1).toLowerCase, m.group(2))
      val v = viewName(path)
      readPath(spark, fmt, path).createOrReplaceTempView(v)
      java.util.regex.Matcher.quoteReplacement(v)
    })
    rewritten = PathPattern.replaceAllIn(rewritten, m => {
      val (kw, path) = (m.group(1), m.group(2))
      val v = viewName(path)
      readPath(spark, fmtOf(path), path).createOrReplaceTempView(v)
      java.util.regex.Matcher.quoteReplacement(s"$kw $v")
    })
    rewritten = DirPattern.replaceAllIn(rewritten, m => {
      val (kw, path) = (m.group(1), m.group(2))
      if (new java.io.File(path, "_delta_log").isDirectory) {
        val v = viewName(path)
        readPath(spark, "delta", path).createOrReplaceTempView(v)
        java.util.regex.Matcher.quoteReplacement(s"$kw $v")
      } else if (new java.io.File(path, "metadata").isDirectory &&
          new java.io.File(path, "metadata").listFiles()
            .exists(f => f.getName.endsWith(".metadata.json"))) {
        val v = viewName(path)
        Iceberg.read(spark, path).createOrReplaceTempView(v)
        java.util.regex.Matcher.quoteReplacement(s"$kw $v")
      } else m.matched
    })
    spark.sql(rewritten)
  }
}
