package graft.queries

import graft.QueryDsl._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregate-function coverage (SURVEY.md §2.4): stats aggs (stddev/var/
  * corr/covar/regr_*), bit/bool aggs, string_agg, collect+sort, min_by/
  * max_by, exact & approximate percentiles, HLL count-distinct.
  *
  * q39 reproduces the moment-based statistics from exact decimal sums so the
  * final doubles are bit-identical across engines regardless of partitioning;
  * q40 exercises the built-in single-pass implementations (rounded — the
  * merge order of floating-point partials is engine-specific).
  */
object Aggregates {

  val queries: Map[String, Q] = Map(
    "q39_stats_manual" -> { (s, dir) =>
      val q = drate(col("l_quantity"))
      val d = drate(col("l_discount"))
      val g = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sumd(q).as("sx"),
          sumd(q * q).as("sxx"),
          sumd(d).as("sy"),
          sumd(d * d).as("syy"),
          sumd(q * d).as("sxy"))
      g.select(col("l_returnflag"), col("n"),
          ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)).as("var_qty"),
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)).as("std_qty"),
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
             sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("corr_qd"))
        .orderBy("l_returnflag")
    },

    "q40_stats_builtin" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("std_qty"),
          round(var_pop(col("l_quantity")), 4).as("varp_qty"),
          round(corr(col("l_quantity"), col("l_discount")), 4).as("corr_qd"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 4).as("covar_qd"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 4).as("r2"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("rn"))
        .orderBy("l_returnflag")
    },

    "q41_minmax_by" -> { (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(
          max_by(col("c_name"), col("c_custkey")).as("newest_cust"),
          min_by(col("c_name"), col("c_custkey")).as("oldest_cust"),
          max(col("c_acctbal")).as("max_bal"),
          min(col("c_acctbal")).as("min_bal"))
        .orderBy("c_nationkey")
    },

    "q42_bitbool_agg" -> { (s, dir) =>
      t(s, dir, "part")
        .groupBy(col("p_type"))
        .agg(
          bit_and(col("p_size")).as("size_and"),
          bit_or(col("p_size")).as("size_or"),
          bit_xor(col("p_size")).as("size_xor"),
          bool_and(col("p_size") > 5).as("all_gt5"),
          bool_or(col("p_size") > 45).as("any_gt45"))
        .orderBy("p_type")
    },

    "q43_string_agg" -> { (s, dir) =>
      t(s, dir, "supplier")
        .groupBy(col("s_nationkey"))
        .agg(concat_ws(",", array_sort(collect_list(col("s_name")))).as("names"))
        .orderBy("s_nationkey")
    },

    // supp_keys serialized to JSON text so the driver harness can hash it
    // (pandas cannot factorize ndarray cells).
    "q44_collect_array" -> { (s, dir) =>
      t(s, dir, "supplier")
        .groupBy(col("s_nationkey"))
        .agg(to_json(sort_array(collect_list(col("s_suppkey")))).as("supp_keys"),
          count(lit(1)).as("n"))
        .orderBy("s_nationkey")
    },

    // The array-percentile result is surfaced as two scalar columns
    // (driver-harness hashability); values rounded to 6dp for cross-engine
    // float determinism.
    "q45_percentiles" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
          round(expr("percentile(l_quantity, 0.25)"), 6).as("q1_qty"),
          round(element_at(expr("percentile(l_quantity, array(0.25, 0.75))"), 1), 6)
            .as("iqr_lo"),
          round(element_at(expr("percentile(l_quantity, array(0.25, 0.75))"), 2), 6)
            .as("iqr_hi"),
          round(median(col("l_quantity")), 6).as("median_fn"))
        .orderBy("l_returnflag")
    },

    "q46_count_if" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          count_if(col("o_orderstatus") === "F").as("n_f"),
          sum(when(col("o_totalprice") > 250000, 1).otherwise(0)).cast(LongType).as("n_big"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },

    // Sketch aggregates (reference: approx_count_distinct.rs HLL,
    // approx_quantile.rs T-Digest). Sketch internals differ across engines,
    // so raw sketch values are not oracle-able — instead the Spark side
    // computes BOTH the sketch and the exact answer and emits the exact
    // values plus tolerance booleans (HLL within 5% of exact; approx median
    // within the exact p45..p55 band). The oracle asserts the exact values
    // and TRUE for every tolerance bit, so a sketch regression is a hash
    // mismatch in the driver gate, not just a spec failure.
    "q47_approx_sketch" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          (abs(approx_count_distinct(col("l_partkey")) -
              countDistinct(col("l_partkey"))).cast(DoubleType) /
            countDistinct(col("l_partkey")) <= 0.05).as("cd_ok"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
            .between(
              expr("percentile(l_extendedprice, 0.45)"),
              expr("percentile(l_extendedprice, 0.55)")).as("median_ok"))
        .orderBy("l_returnflag")
    },

    // approx_quantile VALUE oracle (round-10 verdict: the last
    // non-hash-checked §2 row). The tolerance window is derived from the
    // sketch's own accuracy parameter, not an arbitrary band:
    // percentile_approx(acc) (Greenwald-Khanna summaries) guarantees rank
    // error <= n/acc, so the approx p50 must lie between the exact value
    // quantiles at 0.5 +/- eps with eps = 2/acc (2x the bound absorbs the
    // nearest-rank-vs-interpolated boundary). DuckDB asserts the exact
    // interpolated median (percentile_cont == Spark's percentile, both
    // the continuous (n-1)*p definition; ROUND(...,4) absorbs last-ulp
    // interpolation arithmetic differences) and TRUE for the window bit —
    // a sketch regression is a driver hash mismatch.
    "q47b_quantile_window" -> { (s, dir) =>
      val acc = 10000
      val eps = 2.0 / acc
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50_exact"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(acc))
            .between(
              expr(s"percentile(l_extendedprice, ${0.5 - eps})"),
              expr(s"percentile(l_extendedprice, ${0.5 + eps})"))
            .as("win_ok"))
        .orderBy("l_returnflag")
    })

  val oracles: Map[String, String] = Map(
    "q39_stats_manual" -> s"""
      WITH g AS (
        SELECT l_returnflag, COUNT(*) AS n,
          ${sql.sumd(sql.drate("l_quantity"))} AS sx,
          ${sql.sumd(s"${sql.drate("l_quantity")} * ${sql.drate("l_quantity")}")} AS sxx,
          ${sql.sumd(sql.drate("l_discount"))} AS sy,
          ${sql.sumd(s"${sql.drate("l_discount")} * ${sql.drate("l_discount")}")} AS syy,
          ${sql.sumd(s"${sql.drate("l_quantity")} * ${sql.drate("l_discount")}")} AS sxy
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        (sxx - sx * sx / n) / (n - 1) AS var_qty,
        SQRT((sxx - sx * sx / n) / (n - 1)) AS std_qty,
        (n * sxy - sx * sy) / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)) AS corr_qd
      FROM g ORDER BY l_returnflag""",

    "q40_stats_builtin" -> """
      SELECT l_returnflag,
        ROUND(STDDEV_SAMP(l_quantity), 4) AS std_qty,
        ROUND(VAR_POP(l_quantity), 4) AS varp_qty,
        ROUND(CORR(l_quantity, l_discount), 4) AS corr_qd,
        ROUND(COVAR_SAMP(l_quantity, l_discount), 4) AS covar_qd,
        ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope,
        ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4) AS intercept,
        ROUND(REGR_R2(l_extendedprice, l_quantity), 4) AS r2,
        CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT) AS rn
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q41_minmax_by" -> """
      SELECT c_nationkey,
        MAX_BY(c_name, c_custkey) AS newest_cust,
        MIN_BY(c_name, c_custkey) AS oldest_cust,
        MAX(c_acctbal) AS max_bal,
        MIN(c_acctbal) AS min_bal
      FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""",

    "q42_bitbool_agg" -> """
      SELECT p_type,
        CAST(BIT_AND(p_size) AS INT) AS size_and,
        CAST(BIT_OR(p_size) AS INT) AS size_or,
        CAST(BIT_XOR(p_size) AS INT) AS size_xor,
        BOOL_AND(p_size > 5) AS all_gt5,
        BOOL_OR(p_size > 45) AS any_gt45
      FROM part GROUP BY p_type ORDER BY p_type""",

    "q43_string_agg" -> """
      SELECT s_nationkey, STRING_AGG(s_name, ',' ORDER BY s_name) AS names
      FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""",

    "q44_collect_array" -> """
      SELECT s_nationkey,
             CAST(TO_JSON(LIST(s_suppkey ORDER BY s_suppkey)) AS VARCHAR)
               AS supp_keys,
             COUNT(*) AS n
      FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""",

    "q45_percentiles" -> """
      SELECT l_returnflag,
        ROUND(QUANTILE_CONT(l_quantity, 0.5), 6) AS median_qty,
        ROUND(QUANTILE_CONT(l_quantity, 0.25), 6) AS q1_qty,
        ROUND(QUANTILE_CONT(l_quantity, 0.25), 6) AS iqr_lo,
        ROUND(QUANTILE_CONT(l_quantity, 0.75), 6) AS iqr_hi,
        ROUND(QUANTILE_CONT(l_quantity, 0.5), 6) AS median_fn
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q46_count_if" -> """
      SELECT o_orderpriority,
        CAST(COUNT_IF(o_orderstatus = 'F') AS BIGINT) AS n_f,
        CAST(SUM(CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        COUNT(*) AS n
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // Exact values + all-TRUE tolerance bits (see the query comment): the
    // oracle is exact because the Spark side folds the sketch-vs-exact
    // comparison into booleans.
    "q47_approx_sketch" -> """
      SELECT l_returnflag,
        CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        TRUE AS cd_ok, TRUE AS median_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // Exact interpolated median + accuracy-derived window bit (see the
    // query comment): DuckDB's percentile_cont(0.5) and Spark's
    // percentile(.., 0.5) share the continuous (n-1)*p definition.
    "q47b_quantile_window" -> """
      SELECT l_returnflag,
        ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4)
          AS p50_exact,
        TRUE AS win_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
}
