package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession

/** Runs the subset of the reference's own sqllogictest corpus
  * (/root/reference/slt/standard, 262 files) that is dialect-portable —
  * 102 files curated by `graft.slt.SltSweep`. Every record in every
  * allowlisted file must pass. Failures in the other files are dialect
  * divergences documented in SLT.md (type-name output, `::` casts,
  * GROUPING outside cube/rollup, list literals, NULL-ordering defaults).
  */
class SltSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cpus = 8, appName = "graft-slt")
  override def afterAll(): Unit = spark.stop()

  val root = "/root/reference/slt/standard"
  val allowlist: Seq[String] = Seq(
    "aggregates/basic.slt",
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
    "attach/invalid_datasource.slt",
    "attach/memory.slt",
    "cast/cast_overflow.slt",
    "cast/nested_casts.slt",
    "create_table/drop_table.slt",
    "cte/insert_cte.slt",
    "discard.slt",
    "equality_join.slt",
    "filter/duplicate_conditions.slt",
    "functions/aggregate/approx_count_distinct.slt",
    "functions/aggregate/avg.slt",
    "functions/aggregate/bit_and.slt",
    "functions/aggregate/bit_or.slt",
    "functions/aggregate/bool_and.slt",
    "functions/aggregate/bool_or.slt",
    "functions/aggregate/corr.slt",
    "functions/aggregate/count.slt",
    "functions/aggregate/count_star.slt",
    "functions/aggregate/covar.slt",
    "functions/aggregate/regr_avg.slt",
    "functions/aggregate/regr_count.slt",
    "functions/aggregate/regr_r2.slt",
    "functions/aggregate/regr_slope.slt",
    "functions/aggregate/stddev.slt",
    "functions/operators/bit_and_or_not.slt",
    "functions/operators/case_short_circuit.slt",
    "functions/operators/in.slt",
    "functions/scalar/ceil.slt",
    "functions/scalar/coalesce.slt",
    "functions/scalar/comparison.slt",
    "functions/scalar/contains.slt",
    "functions/scalar/date_comparison.slt",
    "functions/scalar/datetime/date_part.slt",
    "functions/scalar/floor.slt",
    "functions/scalar/gcd.slt",
    "functions/scalar/isfinite.slt",
    "functions/scalar/lcm.slt",
    "functions/scalar/like.slt",
    "functions/scalar/negate.slt",
    "functions/scalar/not.slt",
    "functions/scalar/pi.slt",
    "functions/scalar/string/position.slt",
    "functions/scalar/string/repeat.slt",
    "functions/string/md5.slt",
    "insert/insert_invalid.slt",
    "insert/insert_parallel.slt",
    "join/cross_join.slt",
    "join/inner_join.slt",
    "join/inner_join_eq_neq.slt",
    "join/left_join_with_right_filter.slt",
    "join/left_outer.slt",
    "join/natural_join.slt",
    "join/right_outer.slt",
    "join/semi_join.slt",
    "join/where_or_condition.slt",
    "limit/basic.slt",
    "limit/global_limit.slt",
    "limit/limit_union.slt",
    "list/create_list_larger_than_batch_size.slt",
    "optimizer/column_pruning_multiple_scans.slt",
    "optimizer/column_pruning_no_table_projections.slt",
    "optimizer/cse.slt",
    "optimizer/filter_pushdown_nested_cross_join.slt",
    "order/basic.slt",
    "order/order_by_alias.slt",
    "order/order_by_large.slt",
    "order/order_by_many.slt",
    "order/order_by_noninline_data.slt",
    "order/order_by_ordinal.slt",
    "order/order_by_strings.slt",
    "order/order_group.slt",
    "order/order_union.slt",
    "select/from_missing.slt",
    "select/from_values_no_parens.slt",
    "setops/union_distinct.slt",
    "show/show_tables.slt",
    "subqueries/correlated_exists.slt",
    "subqueries/correlated_in.slt",
    "subqueries/correlated_set_semantics.slt",
    "subqueries/from_subquery.slt",
    "subqueries/from_table_subquery.slt",
    "subqueries/in.slt",
    "subqueries/neumann.slt",
    "subqueries/scalar/count_subquery.slt",
    "subqueries/scalar/scalar_exists.slt",
    "time/date_arith.slt",
    "time/date_cmp.slt",
    "values/num_columns.slt",
    "vars/set_partitions.slt",
    "window/basic.slt")

  test("reference SLT allowlist passes (102 files)") {
    graft.functions.GraftFunctions.register(spark)
    graft.functions.GlareCompat.register(spark)
    val bad = allowlist.flatMap { rel =>
      val r = graft.slt.SltRunner.runFile(spark, s"$root/$rel")
      if (r.passed) None else Some(s"$rel: ${r.failures.headOption.getOrElse("")}")
    }
    assert(bad.isEmpty, s"SLT regressions:\n${bad.mkString("\n")}")
  }
}
