package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession

/** Runs the subset of the reference's own sqllogictest corpus
  * (/root/reference/slt/standard, 262 files) that is dialect-portable —
  * as of round 6 that is ALL of them (262/262). Every record in every
  * allowlisted file must pass. Failures in the other files are dialect
  * divergences documented in SLT.md (type-name output, `::` casts,
  * GROUPING outside cube/rollup, list literals, NULL-ordering defaults).
  */
class SltSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cpus = 8, appName = "graft-slt")
  override def afterAll(): Unit = spark.stop()

  val root = "/root/reference/slt/standard"
  val allowlist: Seq[String] = {
    // round 6: the ENTIRE standard corpus passes (262/262 files) — lock
    // every file so any regression fails here, no curation needed
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().sortBy(_.getName).flatMap(walk).toSeq
      else if (f.getName.endsWith(".slt")) Seq(f) else Nil
    walk(new java.io.File(root)).map(_.getPath.stripPrefix(root + "/"))
  }

  /** Connector suites (slt/csv, slt/parquet, slt/tpch_gen, slt/iceberg,
    * slt/delta) resolved through the GraftSession path/TVF rewrite.
    * HONEST COUNT (SLT.md "Connector suites"): 44 of these files are
    * substantive; the 29 parquet-testing files below marked
    * [vacuous] contain only `SET verify_optimized_plan` statements because
    * the reference's parquet-testing data submodule is empty and its
    * queries are commented out upstream as TODO — they are kept so a
    * future data drop fails loudly, and count for nothing. */
  val connectorRoot = "/root/reference/slt"
  val connectorAllowlist: Seq[String] = Seq(
    "csv/copy_to.slt",
    "csv/glob_different_num_columns.slt",
    "csv/glob_numbers.slt",
    "csv/infer/all_null.slt",
    "csv/infer/boolean_values.slt",
    "csv/infer/empty_first_line.slt",
    "csv/infer/empty_middle_line.slt",
    "csv/infer/escaped_quotes.slt",
    "csv/infer/infer_string_lit_as_int.slt",
    "csv/infer/mixed_type_pipe_delim.slt",
    "csv/infer/semicolon_delim.slt",
    "csv/infer/single_quotes.slt",
    "csv/infer/special_float_values.slt",
    "csv/infer/tab_delim.slt",
    "csv/infer/whitespace_handling.slt",
    "csv/read_file_list.slt",
    "csv/read_tsv.slt",
    "csv/simple.slt",
    "csv/small_batch_size.slt",
    "csv/tpch_small/nation.slt",
    "csv/userdata1.slt",
    "parquet/capital_column_names.slt",
    "parquet/column_metadata.slt",
    "parquet/copy_to.slt",
    "parquet/describe.slt",
    "parquet/file_infer.slt",
    "parquet/file_metadata.slt",
    "parquet/glob_numbers.slt",
    // ---- [vacuous: ref-TODO, no data] the 29 parquet-testing files ----
    "parquet/parquet-testing/bad/ARROW-GH-41317.slt",
    "parquet/parquet-testing/bad/ARROW-GH-41321.slt",
    "parquet/parquet-testing/bad/ARROW-GH-45185.slt",
    "parquet/parquet-testing/bad/ARROW-RS-GH-6229-LEVELS.slt",
    "parquet/parquet-testing/bad/PARQUET-1481.slt",
    "parquet/parquet-testing/byte_array_decimal.slt",
    "parquet/parquet-testing/byte_stream_split_extended_gzip.slt",
    "parquet/parquet-testing/column_chunk_key_value_metadata.slt",
    "parquet/parquet-testing/data_index_bloom_encoding_stats.slt",
    "parquet/parquet-testing/data_index_bloom_encoding_with_length.slt",
    "parquet/parquet-testing/datapage_v2_snappy.slt",
    "parquet/parquet-testing/dict-page-offset-zero.slt",
    "parquet/parquet-testing/fixed_length_byte_array.slt",
    "parquet/parquet-testing/fixed_length_decimal.slt",
    "parquet/parquet-testing/fixed_length_decimal_legacy.slt",
    "parquet/parquet-testing/incorrect_map_schema.slt",
    "parquet/parquet-testing/large_string_map_brotli.slt",
    "parquet/parquet-testing/list_columns.slt",
    "parquet/parquet-testing/map_no_value.slt",
    "parquet/parquet-testing/nested_lists.snappy.slt",
    "parquet/parquet-testing/nested_maps.snappy.slt",
    "parquet/parquet-testing/nested_structs_rust.slt",
    "parquet/parquet-testing/nonullable_impala.slt",
    "parquet/parquet-testing/null_list.slt",
    "parquet/parquet-testing/nullable_impala.slt",
    "parquet/parquet-testing/old_list_structure.slt",
    "parquet/parquet-testing/repeated_no_annotation.slt",
    "parquet/parquet-testing/repeated_primitive_no_list.slt",
    "parquet/parquet-testing/unknown-logical-type.slt",
    // ---- [end vacuous block] ----
    "parquet/parquet_testing.slt",
    "parquet/read_file_list.slt",
    "parquet/read_parquet_local.slt",
    "parquet/rowgroup_metadata.slt",
    "parquet/small_batch_size.slt",
    "parquet/ts_millis_i64.slt",
    "parquet/userdata0.slt",
    "tpch_gen/describe.slt",
    "tpch_gen/linitem.slt",
    "tpch_gen/orders.slt",
    "tpch_gen/region.slt",
    "iceberg/iceberg_data_files.slt",
    "iceberg/iceberg_manifest_list.slt",
    "iceberg/iceberg_metadata.slt",
    "iceberg/iceberg_snapshots.slt",
    // local half only: the trailing s3:// record is skipped-with-reason
    // (zero-egress env; FileResult.skipped)
    "delta/simple.slt")

  /** slt/tpchbench: the reference's own TPC-H end-to-end suite
    * (describe.slt + q01..q22). Its data goldens were captured against
    * the dbgen sf0.1 parquet in the testdata submodule, which is EMPTY in
    * this tree — so DESCRIBE goldens (schemas + the reference's aggregate
    * type-widening rules) are compared in full, while data goldens run
    * execute-only (counted as skipped; SLT.md documents the split). The
    * tables are the tpch_gen TVF outputs cast to the benchmark parquet
    * schema that describe.slt itself records. */
  val tpchbenchRoot = "/root/reference/slt/tpchbench"
  val tpchbenchFiles: Seq[String] =
    Seq("describe.slt") ++ (1 to 22).map(i => f"q$i%02d.slt")

  private def setupTpchBench(s: org.apache.spark.sql.SparkSession): Unit = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tpchbenchRoot/describe.slt")),
      java.nio.charset.StandardCharsets.UTF_8)
    val block = "(?s)describe (\\w+)\\s*\\n----\\n(.*?)(?=\\n\\n|\\z)".r
    def sparkType(t: String): String = t match {
      case "Int32" => "INT"
      case "Int64" => "BIGINT"
      case "Utf8" => "STRING"
      case "Date32" => "DATE"
      case d if d.startsWith("Decimal") =>
        d.replaceAll("Decimal(64|128)", "DECIMAL")
      case other => other
    }
    block.findAllMatchIn(txt).foreach { m =>
      val table = m.group(1)
      val cols = m.group(2).linesIterator.map(_.trim).filter(_.nonEmpty)
        .map { l =>
          val Array(c, t) = l.split("\\s+", 2).map(_.trim)
          s"CAST($c AS ${sparkType(t)}) AS $c"
        }.toSeq
      graft.sources.TpchGen.table(s, table, 0.01)
        .selectExpr(cols: _*).createOrReplaceTempView(table)
    }
  }

  test(s"tpchbench SLT suite passes (${tpchbenchFiles.size} files; " +
    "data goldens execute-only)") {
    // child session: the 8 benchmark temp views must not leak into the
    // shared catalog (slt/standard system_join counts list_tables())
    val s = spark.newSession()
    graft.functions.GraftFunctions.register(s)
    graft.functions.GlareCompat.register(s)
    setupTpchBench(s)
    val results = tpchbenchFiles.map { rel =>
      rel -> graft.slt.SltRunner.runFile(s, s"$tpchbenchRoot/$rel",
        executeGoldensOnly = true)
    }
    val bad = results.collect { case (rel, r) if !r.passed =>
      s"$rel: ${r.failures.headOption.getOrElse("")}"
    }
    assert(bad.isEmpty, s"tpchbench SLT regressions:\n${bad.mkString("\n")}")
  }

  /** slt/tpcds: the reference's own TPC-DS suite (describe_files.slt + the
    * 99 q-files). Same split as tpchbench: DESCRIBE goldens compared in
    * full; data goldens execute-only (the tpcds_sf0.1 submodule is empty).
    * Tables are decimal-typed TWINS of the synthesized star schema, cast
    * column-by-column to the official schema describe_files.slt records
    * (missing columns null-padded; INT128-stored decimals tagged so the
    * display layer shows Decimal128 at p<=18 like the reference's reader).
    *
    * 68 q-files are NOT in this allowlist because their DESCRIBE goldens
    * are EMPTY — the reference's own engine errors on those queries
    * (in-file comments say so: q03 "Error source: Missing column for
    * reference", q77 "Cannot resolve ... coalesce", ...). Our engine
    * DESCRIBEs and runs them fine (all 99 execute DuckDB-oracle-green as
    * tpcds_q* in CORRECTNESS), but a non-empty result can never match an
    * empty golden, and counting them skipped would be vacuous. */
  val tpcdsSltRoot = "/root/reference/slt/tpcds"
  val tpcdsSltAllowlist: Seq[String] = Seq(
    "q01", "q07", "q08", "q09", "q10", "q14", "q15", "q19", "q21", "q22",
    "q26", "q27", "q28", "q30", "q35", "q37", "q43", "q45", "q48", "q50",
    "q55", "q59", "q62", "q65", "q69", "q72", "q74", "q76", "q78", "q82",
    "q90").map(_ + ".slt")

  private def setupTpcdsTwins(s: org.apache.spark.sql.SparkSession): String = {
    import org.apache.spark.sql.functions.{col => fcol}
    // materialize + cache the synthesized star schema once (sf0.001)
    graft.queries.Tpcds.queries("tpcds_q42")(s, "/root/testdata/sf0.001").collect()
    val dtxt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tpcdsSltRoot/describe_files.slt")),
      java.nio.charset.StandardCharsets.UTF_8)
    val block = "(?s)describe '[^']*/(\\w+)\\.parquet'\\s*\\n----\\n(.*?)(?=\\n\\n|\\z)".r
    def sparkType(t: String): String = t match {
      case "Int32" => "INT"
      case "Int64" => "BIGINT"
      case "Utf8" => "STRING"
      case "Date32" => "DATE"
      case "Float64" => "DOUBLE"
      case d if d.startsWith("Decimal") =>
        d.replaceAll("Decimal(64|128)", "DECIMAL")
      case other => other
    }
    val d128 = "Decimal128\\((\\d+),(\\d+)\\)".r
    block.findAllMatchIn(dtxt).foreach { m =>
      val table = m.group(1)
      val cols = m.group(2).linesIterator.map(_.trim).filter(_.nonEmpty)
        .map { l =>
          val Array(c, t) = l.split("\\s+", 2).map(_.trim); (c, t)
        }.toSeq
      val base = s.table(table)
      val have = base.columns.map(_.toLowerCase).toSet
      val sel = cols.map { case (c, t) =>
        if (have(c.toLowerCase)) s"CAST($c AS ${sparkType(t)}) AS $c"
        else s"CAST(NULL AS ${sparkType(t)}) AS $c"
      }
      val df = base.selectExpr(sel: _*)
      val tagged = cols.map { case (c, t) =>
        t match {
          case d128(p, _) if p.toInt <= 18 =>
            fcol(c).as(c, new org.apache.spark.sql.types.MetadataBuilder()
              .putBoolean("graft_dec128", true).build())
          case _ => fcol(c)
        }
      }
      df.select(tagged: _*).createOrReplaceTempView(table)
    }
    // describe_files itself path-describes the (empty) submodule parquet —
    // re-point at the twin views by bare name
    val fixed = dtxt.replaceAll(
      "describe '[^']*/(\\w+)\\.parquet'", "describe $1")
    val tmp = java.nio.file.Files.createTempFile("graft_tpcds_describe", ".slt")
    java.nio.file.Files.write(tmp, fixed.getBytes("UTF-8"))
    tmp.toString
  }

  test(s"tpcds SLT suite passes (describe_files + " +
    s"${tpcdsSltAllowlist.size} q-files; data goldens execute-only)") {
    val s = spark.newSession()
    graft.functions.GraftFunctions.register(s)
    graft.functions.GlareCompat.register(s)
    val describeFile = setupTpcdsTwins(s)
    val files = Seq("describe_files.slt" -> describeFile) ++
      tpcdsSltAllowlist.map(f => f -> s"$tpcdsSltRoot/$f")
    val bad = files.flatMap { case (rel, path) =>
      val r = graft.slt.SltRunner.runFile(s, path, executeGoldensOnly = true)
      if (r.passed) None
      else Some(s"$rel: ${r.failures.headOption.getOrElse("")}")
    }
    assert(bad.isEmpty, s"tpcds SLT regressions:\n${bad.mkString("\n")}")
  }

  test(s"connector SLT allowlist passes (${connectorAllowlist.size} files)") {
    graft.functions.GraftFunctions.register(spark)
    graft.functions.GlareCompat.register(spark)
    val bad = connectorAllowlist.flatMap { rel =>
      val r = graft.slt.SltRunner.runFile(spark, s"$connectorRoot/$rel")
      if (r.passed) None else Some(s"$rel: ${r.failures.headOption.getOrElse("")}")
    }
    assert(bad.isEmpty, s"connector SLT regressions:\n${bad.mkString("\n")}")
  }

  test(s"reference SLT allowlist passes (${allowlist.size} files)") {
    graft.functions.GraftFunctions.register(spark)
    graft.functions.GlareCompat.register(spark)
    val bad = allowlist.flatMap { rel =>
      val r = graft.slt.SltRunner.runFile(spark, s"$root/$rel")
      if (r.passed) None else Some(s"$rel: ${r.failures.headOption.getOrElse("")}")
    }
    assert(bad.isEmpty, s"SLT regressions:\n${bad.mkString("\n")}")
  }
}
