package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession

/** Runs the subset of the reference's own sqllogictest corpus
  * (/root/reference/slt/standard, 262 files) that is dialect-portable —
  * 221 files curated by `graft.slt.SltSweep`. Every record in every
  * allowlisted file must pass. Failures in the other files are dialect
  * divergences documented in SLT.md (type-name output, `::` casts,
  * GROUPING outside cube/rollup, list literals, NULL-ordering defaults).
  */
class SltSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cpus = 8, appName = "graft-slt")
  override def afterAll(): Unit = spark.stop()

  val root = "/root/reference/slt/standard"
  val allowlist: Seq[String] = Seq(
    "aggregates/aggregate_with_no_column_refs.slt",
    "aggregates/basic.slt",
    "aggregates/distinct_grouped.slt",
    "aggregates/distinct_grouped_many_groups.slt",
    "aggregates/distinct_ungrouped.slt",
    "aggregates/group_by_alias.slt",
    "aggregates/group_by_cube.slt",
    "aggregates/group_by_duplicated.slt",
    "aggregates/group_by_errors.slt",
    "aggregates/group_by_expr.slt",
    "aggregates/group_by_many.slt",
    "aggregates/group_by_multiple_cols.slt",
    "aggregates/group_by_no_aggregates.slt",
    "aggregates/group_by_order_by.slt",
    "aggregates/group_by_ordinal.slt",
    "aggregates/group_by_string.slt",
    "aggregates/grouping.slt",
    "aggregates/having.slt",
    "attach/invalid_datasource.slt",
    "attach/memory.slt",
    "cast/binary.slt",
    "cast/cast_overflow.slt",
    "cast/date.slt",
    "cast/decimal.slt",
    "cast/implicit_cast_int_lit.slt",
    "cast/implicit_cast_scalar_agg.slt",
    "cast/implicit_cast_string_lit.slt",
    "cast/interval.slt",
    "cast/nested_casts.slt",
    "cast/string_cast.slt",
    "cast/typed_string.slt",
    "comments.slt",
    "create_schema/create_temp_schema.slt",
    "create_schema/drop_schema_dependants.slt",
    "create_schema/drop_temp_schema.slt",
    "create_table/create_table.slt",
    "create_table/ctas_temp.slt",
    "create_table/drop_table.slt",
    "create_table/temp_table.slt",
    "cte/cte.slt",
    "cte/insert_cte.slt",
    "cte/materialized_cte.slt",
    "describe/describe_as_subquery.slt",
    "describe/describe_query.slt",
    "describe/describe_table.slt",
    "discard.slt",
    "equality_join.slt",
    "filter/constant.slt",
    "filter/duplicate_conditions.slt",
    "functions/aggregate/approx_count_distinct.slt",
    "functions/aggregate/approx_quantile.slt",
    "functions/aggregate/avg.slt",
    "functions/aggregate/bit_and.slt",
    "functions/aggregate/bit_or.slt",
    "functions/aggregate/bool_and.slt",
    "functions/aggregate/bool_or.slt",
    "functions/aggregate/corr.slt",
    "functions/aggregate/count.slt",
    "functions/aggregate/count_star.slt",
    "functions/aggregate/covar.slt",
    "functions/aggregate/first_last.slt",
    "functions/aggregate/minmax.slt",
    "functions/aggregate/regr_avg.slt",
    "functions/aggregate/regr_count.slt",
    "functions/aggregate/regr_r2.slt",
    "functions/aggregate/regr_slope.slt",
    "functions/aggregate/stddev.slt",
    "functions/aggregate/string_agg.slt",
    "functions/aggregate/sum.slt",
    "functions/aggregate/sum_decimal.slt",
    "functions/chaining.slt",
    "functions/operators/between.slt",
    "functions/operators/bit_and_or_not.slt",
    "functions/operators/case.slt",
    "functions/operators/case_short_circuit.slt",
    "functions/operators/in.slt",
    "functions/qualified.slt",
    "functions/scalar/arith.slt",
    "functions/scalar/binary/shl.slt",
    "functions/scalar/binary/shr.slt",
    "functions/scalar/boolean.slt",
    "functions/scalar/ceil.slt",
    "functions/scalar/coalesce.slt",
    "functions/scalar/comparison.slt",
    "functions/scalar/contains.slt",
    "functions/scalar/date_comparison.slt",
    "functions/scalar/datetime/date_part.slt",
    "functions/scalar/datetime/date_trunc.slt",
    "functions/scalar/datetime/epoch.slt",
    "functions/scalar/datetime/extract.slt",
    "functions/scalar/decimal_arith.slt",
    "functions/scalar/decimal_arith_add.slt",
    "functions/scalar/decimal_arith_sub.slt",
    "functions/scalar/decimal_comparison.slt",
    "functions/scalar/ends_with.slt",
    "functions/scalar/floor.slt",
    "functions/scalar/gcd.slt",
    "functions/scalar/is_bool.slt",
    "functions/scalar/is_distinct_from.slt",
    "functions/scalar/is_not_distinct_from.slt",
    "functions/scalar/is_null.slt",
    "functions/scalar/isfinite.slt",
    "functions/scalar/isinf.slt",
    "functions/scalar/l2_distance.slt",
    "functions/scalar/lcm.slt",
    "functions/scalar/like.slt",
    "functions/scalar/list_extract.slt",
    "functions/scalar/negate.slt",
    "functions/scalar/not.slt",
    "functions/scalar/pi.slt",
    "functions/scalar/power.slt",
    "functions/scalar/random.slt",
    "functions/scalar/right.slt",
    "functions/scalar/round.slt",
    "functions/scalar/sign.slt",
    "functions/scalar/string/ascii.slt",
    "functions/scalar/string/ends_with.slt",
    "functions/scalar/string/initcap.slt",
    "functions/scalar/string/left.slt",
    "functions/scalar/string/length.slt",
    "functions/scalar/string/lower.slt",
    "functions/scalar/string/lpad.slt",
    "functions/scalar/string/position.slt",
    "functions/scalar/string/regexp_count.slt",
    "functions/scalar/string/regexp_instr.slt",
    "functions/scalar/string/regexp_like.slt",
    "functions/scalar/string/regexp_replace.slt",
    "functions/scalar/string/repeat.slt",
    "functions/scalar/string/replace.slt",
    "functions/scalar/string/reverse.slt",
    "functions/scalar/string/rpad.slt",
    "functions/scalar/string/starts_with.slt",
    "functions/scalar/string/string_concat.slt",
    "functions/scalar/string/string_split_part.slt",
    "functions/scalar/string/strpos.slt",
    "functions/scalar/string/substring.slt",
    "functions/scalar/string/translate.slt",
    "functions/scalar/string/trim.slt",
    "functions/scalar/string/upper.slt",
    "functions/scalar/trigonometric.slt",
    "functions/scalar/trunc.slt",
    "functions/scalar/xor.slt",
    "functions/star_is_special.slt",
    "functions/string/md5.slt",
    "functions/table/generate_series.slt",
    "functions/table/glob.slt",
    "functions/table/list_database.slt",
    "functions/table/list_functions.slt",
    "functions/table/list_tables.slt",
    "functions/table/list_views.slt",
    "functions/table/read_text.slt",
    "functions/table/read_text_file_list.slt",
    "functions/table/read_text_into_table.slt",
    "functions/table/read_text_natural_join.slt",
    "functions/table/unnest_list.slt",
    "ident/case_sensitivity.slt",
    "ident/case_sensitivity_alias.slt",
    "ident/case_sensitivity_columns.slt",
    "ident/case_sensitivity_views.slt",
    "ident/leading_underscore.slt",
    "insert/insert_cast.slt",
    "insert/insert_count.slt",
    "insert/insert_invalid.slt",
    "insert/insert_parallel.slt",
    "join/cross_join.slt",
    "join/in_semi_join_with_filter.slt",
    "join/inner_join.slt",
    "join/inner_join_eq_neq.slt",
    "join/inner_join_large_result.slt",
    "join/inner_join_using.slt",
    "join/join_empty.slt",
    "join/lateral_join.slt",
    "join/lateral_left_join.slt",
    "join/left_join_with_right_filter.slt",
    "join/left_outer.slt",
    "join/left_outer_using.slt",
    "join/natural_join.slt",
    "join/right_outer.slt",
    "join/right_outer_using.slt",
    "join/semi_join.slt",
    "join/system_join.slt",
    "join/where_or_condition.slt",
    "limit/basic.slt",
    "limit/global_limit.slt",
    "limit/limit_union.slt",
    "list/create_list_larger_than_batch_size.slt",
    "optimizer/column_pruning_multiple_scans.slt",
    "optimizer/column_pruning_no_table_projections.slt",
    "optimizer/cse.slt",
    "optimizer/filter_pushdown.slt",
    "optimizer/filter_pushdown_nested_cross_join.slt",
    "order/basic.slt",
    "order/order_by_alias.slt",
    "order/order_by_large.slt",
    "order/order_by_many.slt",
    "order/order_by_noninline_data.slt",
    "order/order_by_nulls.slt",
    "order/order_by_ordinal.slt",
    "order/order_by_strings.slt",
    "order/order_group.slt",
    "order/order_limit_offsets.slt",
    "order/order_union.slt",
    "parallelism/arbitrary_values.slt",
    "select/columns.slt",
    "select/distinct.slt",
    "select/exclude_except.slt",
    "select/from_missing.slt",
    "select/from_values_no_parens.slt",
    "select/replace.slt",
    "select/replace_different_types.slt",
    "select/unnest.slt",
    "setops/union.slt",
    "setops/union_distinct.slt",
    "show/show_databases.slt",
    "show/show_schemas.slt",
    "show/show_tables.slt",
    "simple.slt",
    "subqueries/any_all.slt",
    "subqueries/correlated_exists.slt",
    "subqueries/correlated_in.slt",
    "subqueries/correlated_lateral.slt",
    "subqueries/correlated_set_semantics.slt",
    "subqueries/correlated_subquery.slt",
    "subqueries/from_subquery.slt",
    "subqueries/from_table_subquery.slt",
    "subqueries/in.slt",
    "subqueries/neumann.slt",
    "subqueries/scalar/count_subquery.slt",
    "subqueries/scalar/scalar_exists.slt",
    "subqueries/subquery_alias.slt",
    "time/date_arith.slt",
    "time/date_cmp.slt",
    "time/interval_arith.slt",
    "values/implicit_cast.slt",
    "values/lateral_values.slt",
    "values/num_columns.slt",
    "values/values_aliases.slt",
    "vars/reset.slt",
    "vars/set_batch_size.slt",
    "vars/set_partitions.slt",
    "vars/set_var.slt",
    "vars/verify_optimized_plan.slt",
    "views/create_view.slt",
    "views/temp_view.slt",
    "views/view_in_subquery.slt",
    "views/view_qualified_reference.slt",
    "window/basic.slt")

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
