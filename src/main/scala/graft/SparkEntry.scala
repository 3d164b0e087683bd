package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a named entry in
  * [[queries]]; entries with a DuckDB-expressible equivalent also appear in
  * [[oracleSql]] (the driver hash-compares both at sf0.01).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Tpcds.queries ++
      graft.queries.Tpch.queries ++
      graft.queries.Tpch.fusedTwins ++
      graft.queries.Relational.queries ++
      graft.queries.Windows.queries ++
      graft.queries.Aggregates.queries ++
      graft.queries.Funcs.queries ++
      graft.queries.Extended.queries ++
      graft.queries.OptimizerShapes.queries ++
      graft.queries.ClickBenchShapes.queries ++
      graft.queries.ClickBench.queries ++
      graft.operators.Multimodal.queries ++
      graft.operators.TextOps.queries ++
      graft.operators.Dedup.queries ++
      graft.operators.Similarity.queries ++
      graft.operators.Events.queries ++
      graft.sources.Sources.queries ++
      graft.sources.DeltaQueries.queries ++
      graft.sources.IcebergQueries.queries ++
      graft.sources.Introspection.queries ++
      graft.sources.ParquetMeta.queries ++
      graft.sources.TpchGen.queries ++
      graft.operators.Skew.queries ++
      graft.operators.Skew.bucketedQueries ++
      graft.operators.CbxLayout.queries ++
      graft.operators.TpcdsLayout.queries ++
      graft.functions.Aggregators.queries ++
      graft.streaming.Streaming.queries ++
      graft.streaming.Streaming.joinQueries

  def oracleSql: Map[String, String] =
    graft.queries.Tpcds.oracles ++
      graft.queries.Tpch.oracles ++
      graft.queries.Tpch.fusedTwinOracles ++
      graft.queries.Relational.oracles ++
      graft.queries.Windows.oracles ++
      graft.queries.Aggregates.oracles ++
      graft.queries.Funcs.oracles ++
      graft.queries.Extended.oracles ++
      graft.queries.OptimizerShapes.oracles ++
      graft.queries.ClickBenchShapes.oracles ++
      graft.queries.ClickBench.oracles ++
      graft.operators.Multimodal.oracles ++
      graft.operators.TextOps.oracles ++
      graft.operators.Dedup.oracles ++
      graft.operators.Similarity.oracles ++
      graft.operators.Events.oracles ++
      graft.sources.Sources.oracles ++
      graft.sources.DeltaQueries.oracles ++
      graft.sources.IcebergQueries.oracles ++
      graft.sources.Introspection.oracles ++
      graft.sources.ParquetMeta.oracles ++
      graft.sources.TpchGen.oracles ++
      graft.operators.Skew.oracles ++
      graft.operators.CbxLayout.oracles ++
      graft.operators.TpcdsLayout.oracles ++
      graft.functions.Aggregators.oracles ++
      graft.streaming.Streaming.oracles
}
