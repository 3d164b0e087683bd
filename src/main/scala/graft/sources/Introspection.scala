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
    // Stable projection of EXPLAIN output: structural facts about the plan
    // of a fixed query, folded to booleans/counts so they are deterministic
    // under AQE (which hides the physical tree behind AdaptiveSparkPlan
    // until execution — the explain STRING always shows the initial plan).
    // Oracle-able: for this fixed aggregate-over-scan query the skeleton is
    // an invariant — losing the HashAggregate, the shuffle, or scanning
    // more than one relation would flip a literal and red the gate.
    "p01_explain_nodes" -> { (s, dir) =>
      t(s, dir, "lineitem")
      val df = s.sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag")
      import s.implicits._
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      Seq((
        plan.contains("AdaptiveSparkPlan"),
        plan.contains("HashAggregate"),
        plan.contains("Exchange"),
        "Scan parquet".r.findAllIn(plan).size))
        .toDF("has_adaptive", "has_aggregate", "has_exchange", "n_scans")
    },

    "p02_query_info" -> { (s, dir) =>
      t(s, dir, "lineitem")
      queryInfo(s.sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag"))
        .select(col("n_output_cols"))
    },

    // execution_profile(): runtime SQL metrics after forcing execution
    // (EXPLAIN ANALYZE analogue). Only DETERMINISTIC metrics are surfaced:
    // the result cardinality and the FINAL aggregate's numOutputRows (the
    // partial aggregate's output depends on the partition layout; time
    // metrics are wall-clock). Both equal COUNT(DISTINCT l_returnflag), so
    // the oracle derives them from the data — a metrics-plumbing regression
    // (e.g. final agg metric stuck at 0) reds the gate.
    "p03_execution_profile" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
      val df = s.sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag")
      // Execute THIS QueryExecution without materializing rows on the
      // driver (a wide profiled query would otherwise OOM the driver).
      val nRows = df.queryExecution.toRdd.count()
      // AQE hides executed stages behind leaf wrappers (AdaptiveSparkPlan,
      // ResultQueryStage/ShuffleQueryStage) — recurse through them so the
      // walk reaches the real operators, top-down.
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def walk(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case qs: QueryStageExec => walk(qs.plan)
        case other => other +: other.children.flatMap(walk)
      }
      // top-down: the first HashAggregate is the final one
      val finalAggRows = walk(df.queryExecution.executedPlan)
        .filter(_.nodeName.contains("HashAggregate"))
        .flatMap(_.metrics.get("numOutputRows").map(_.value))
        .headOption.getOrElse(-1L)
      Seq(("final_agg_output_rows", finalAggRows), ("result_rows", nRows))
        .toDF("metric", "n_rows")
    })

  val oracles: Map[String, String] = Map(
    "p01_explain_nodes" -> """
      SELECT TRUE AS has_adaptive, TRUE AS has_aggregate,
             TRUE AS has_exchange, CAST(1 AS INT) AS n_scans""",

    "p02_query_info" -> "SELECT CAST(2 AS INT) AS n_output_cols",

    "p03_execution_profile" -> """
      SELECT 'final_agg_output_rows' AS metric,
             CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_rows
      FROM lineitem
      UNION ALL
      SELECT 'result_rows', CAST(COUNT(DISTINCT l_returnflag) AS BIGINT)
      FROM lineitem
      ORDER BY metric""")
}
