package graft.sources

import graft.QueryDsl._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._

/** Query-introspection surface mirroring the reference's profiling table
  * functions (`functions/table/builtin/profile.rs:41,72,103,134` —
  * planning_profile / optimizer_profile / execution_profile / query_info)
  * and EXPLAIN (`explain/formatter.rs`), surfaced as DataFrames.
  */
object Introspection {

  /** EXPLAIN as rows: one row per physical plan node (top-down). */
  def explainPlan(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val qe = df.queryExecution
    val nodes = qe.executedPlan.collect { case p => p.nodeName }
    nodes.zipWithIndex.map { case (n, i) => (i, n) }
      .toDF("node_id", "node_name")
  }

  /** planning_profile(): phase -> wall time, from Spark's phase tracker. */
  def planningProfile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.queryExecution.tracker.phases.toSeq
      .map { case (phase, t) => (phase, t.endTimeMs - t.startTimeMs) }
      .toDF("phase", "millis")
  }

  /** optimizer_profile(): rule -> invocations/effective runs/time, from
    * Catalyst's RuleExecutor metrics (cumulative for the session). */
  def optimizerProfile(spark: SparkSession, topK: Int = 20): DataFrame = {
    import spark.implicits._
    val qem = org.apache.spark.sql.catalyst.rules.RuleExecutor.getCurrentMetrics()
    Seq(("total_rule_time_ns", qem.time), ("effective_runs", qem.numEffectiveRuns),
      ("total_runs", qem.numRuns))
      .toDF("metric", "value")
  }

  /** query_info(): one row describing the session's last execution. */
  def queryInfo(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val qe: QueryExecution = df.queryExecution
    Seq((
      qe.analyzed.schema.fields.length,
      qe.optimizedPlan.collect { case p => p }.length,
      qe.executedPlan.collect { case p => p }.length,
      spark.sparkContext.defaultParallelism))
      .toDF("n_output_cols", "n_logical_nodes", "n_physical_nodes", "parallelism")
  }

  val queries: Map[String, Q] = Map(
    // Stable subset of EXPLAIN output: the scan/filter/aggregate skeleton
    // of a fixed query (node names are deterministic for a fixed plan).
    "p01_explain_nodes" -> { (s, dir) =>
      t(s, dir, "lineitem")
      val df = s.sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag")
      import s.implicits._
      explainPlan(df)
        .filter(col("node_name").isin("HashAggregate", "Scan parquet ", "FileScan",
          "Exchange", "AdaptiveSparkPlan", "Project", "Scan parquet"))
        .groupBy(col("node_name")).agg(count(lit(1)).as("n"))
        .orderBy("node_name")
    },

    "p02_query_info" -> { (s, dir) =>
      t(s, dir, "lineitem")
      queryInfo(s.sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag"))
        .select(col("n_output_cols"))
    },

    // execution_profile(): runtime SQL metrics after forcing execution
    // (EXPLAIN ANALYZE analogue). Row counts are deterministic; time
    // metrics are not, so only row-count metrics are surfaced.
    "p03_execution_profile" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
      val df = s.sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag")
      // Execute THIS QueryExecution without materializing rows on the
      // driver (a wide profiled query would otherwise OOM the driver).
      val nRows = df.queryExecution.toRdd.count()
      val finalPlan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val aggRows = finalPlan.collect {
        case p if p.nodeName.contains("HashAggregate") =>
          p.metrics.get("numOutputRows").map(m => (p.nodeName, m.value))
      }.flatten
      (Seq(("result_rows", nRows)) ++ aggRows)
        .sortBy(x => (x._1, x._2))
        .toDF("metric", "rows")
    })

  val oracles: Map[String, String] = Map(
    "p02_query_info" -> "SELECT CAST(2 AS INT) AS n_output_cols")
}
