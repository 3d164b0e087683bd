package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.QueryDsl.Q

/** Staged TPC-DS inventory: the weekly (Sunday) item × warehouse snapshot
  * grid materialized ONCE at ingest as a sorted parquet table.
  *
  * In the fixture model `inventory` is a synthesized CTE (the driver
  * fixtures carry no star schema), so every query over it re-derives the
  * full grid — and q39 references the CTE twice (month-over-month
  * self-join), paying the derivation twice: measured 30.1 s at sf10
  * (7.6× the DuckDB proxy, the worst ratio in the round-11 TPC-DS sweep)
  * where a single derivation pass (q22 shape) costs ~15 s. A production
  * deployment stores inventory as a fact table; this writer is that
  * one-time `CREATE TABLE AS`. Effects:
  *   - the 4-int-column grid (129 M rows ≈ hundreds of MB zstd at sf10)
  *     reads back at parquet scan speed instead of cross-join synthesis;
  *   - files are range-partitioned by inv_date_sk and sorted by
  *     (inv_date_sk, inv_item_sk): the d_year/d_moy filters every
  *     inventory query carries prune snapshots via zone maps once the
  *     date_dim join key range is known (runtime bloom / DPP-class
  *     filters), and item-range probes (q37/q82 shape) prune row groups;
  *   - q39's two CTE references become two cheap scans of the same files.
  *
  * Twins run the IDENTICAL query texts with the `inventory` view
  * re-pointed at the stored table — same values, same DuckDB oracle as
  * their tpcds_q* originals.
  */
object TpcdsLayout {

  /** Materialize the staged inventory table for `dir`; returns the table
    * name. Same attach-or-build contract as the other layout writers.
    * The tag folds in a hash of the FULL defining text (inventory CTE +
    * its transitive dims), so an edit to the synthesis SQL rebuilds the
    * stored table instead of silently attaching stale data that no longer
    * matches the oracle's inlined CTE (round-11 advice). Superseded
    * same-version dirs with an old def hash are pruned here (the global
    * layoutVer pruner can't see them — their version segment is current). */
  def writeStagedInventory(spark: SparkSession, dir: String): String = {
    val tag = Skew.layoutVer + "_" + graft.queries.Tpcds.defHash("inventory") +
      "_" + Integer.toHexString(dir.hashCode).take(8)
    val tn = s"graft_inventory_$tag"
    // prune only THIS fixture dir's superseded builds (same dir-hash
    // suffix, different def-hash) — other scale factors' staged tables
    // stay attached across test/verify/bench JVMs
    val dirSuffix = "_" + Integer.toHexString(dir.hashCode).take(8)
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Option(new java.io.File(wh).listFiles()).getOrElse(Array.empty)
      .filter(d => d.getName.startsWith("graft_inventory_") &&
        d.getName.endsWith(dirSuffix) && d.getName != tn)
      .foreach { d =>
        def rm(x: java.io.File): Unit = {
          Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
        }
        rm(d)
      }
    Skew.ensureStaged(spark, Seq(tn -> None)) {
      graft.queries.Tpcds.ensureStar(spark, dir)
      spark.table("inventory")
        .repartitionByRange(32, col("inv_date_sk"))
        .sortWithinPartitions(col("inv_date_sk"), col("inv_item_sk"))
        .write.mode("overwrite").format("parquet")
        .option("compression", Skew.stagedCodec)
        .saveAsTable(tn)
    }
    tn
  }

  /** Run a tpcds query text with `inventory` pointing at the stored
    * layout (all other star views stay as ensureStar builds them). The
    * re-point is ANALYSIS-scoped: Spark resolves the view eagerly when
    * s.sql() builds the DataFrame, so the synthesized view is restored
    * immediately after — a later view-path query in the same session
    * reads the CTE derivation again, keeping staged-vs-view twin timings
    * honest even for harnesses that share one session (round-11 advice;
    * Bench's fresh-session-per-query never hit this). */
  private def staged(name: String): Q = { (s, dir) =>
    val tn = writeStagedInventory(s, dir)
    graft.queries.Tpcds.ensureStar(s, dir)
    s.sql(s"CREATE OR REPLACE TEMPORARY VIEW inventory AS SELECT * FROM $tn")
    try s.sql(graft.queries.Tpcds.texts(name).trim)
    finally s.sql("CREATE OR REPLACE TEMPORARY VIEW inventory AS " +
      graft.queries.Tpcds.viewBody("inventory"))
  }

  /** q39 as a fused single-derivation program over the staged fact.
    *
    * The text twin (k44) measured NEGATIVE at sf10 (+48%): the view path's
    * synthesis is YEAR-PRUNED before the cross product materializes
    * (d_year=2001 pushes through the date_dim equi-join into the
    * generator), so each of q39's two CTE references derives only 1/5 of
    * the grid, while the stored table is scanned in FULL twice — layout
    * beat by predicate pushdown into a generator. The fused program keeps
    * the stored fact but removes BOTH structural costs: ONE scan
    * (d_moy ∈ {1,2} via the broadcast date join) feeds a per-(warehouse,
    * item, month) aggregate that is localCheckpointed (~|items|·2 rows)
    * and self-joined month-1 × month-2 — the classic shared-CTE
    * materialization Catalyst won't do itself (the moy filters push below
    * the agg and make the two legs' subtrees unequal, defeating
    * ReuseExchange).
    *
    * The item/warehouse inner joins of the text are provably no-ops on
    * the output: inventory is synthesized as date_dim × (item subset) ×
    * warehouse (every inv FK resolves), the output carries only the _sk
    * keys, and w_warehouse_name is functionally determined by
    * w_warehouse_sk — same group-elimination argument as k13's derived
    * partsupp. Values = tpcds_q39 (shared oracle; GraftSpec twin-rows). */
  private def fusedQ39: Q = { (s, dir) =>
    val tn = writeStagedInventory(s, dir)
    graft.queries.Tpcds.ensureStar(s, dir)
    val dd = s.table("date_dim")
      .filter(col("d_year") === 2001 && col("d_moy").isin(1, 2))
      .select(col("d_date_sk"), col("d_moy"))
    val stats = s.table(tn)
      .join(broadcast(dd), col("inv_date_sk") === col("d_date_sk"))
      .groupBy(col("inv_warehouse_sk"), col("inv_item_sk"), col("d_moy"))
      .agg(stddev_samp(col("inv_quantity_on_hand")).as("stdev"),
        avg(col("inv_quantity_on_hand")).as("mean"))
      .filter(col("mean") =!= 0 &&
        round(col("stdev") / col("mean"), 6) > 0.5)
      .withColumn("cov", col("stdev") / col("mean"))
      .localCheckpoint()
    val inv1 = stats.filter(col("d_moy") === 1)
      .select(col("inv_warehouse_sk").as("wsk1"), col("inv_item_sk").as("isk1"),
        col("d_moy").as("dmoy1"), col("mean").as("mean1"), col("cov").as("cov1"))
    val inv2 = stats.filter(col("d_moy") === 2)
      .select(col("inv_warehouse_sk").as("wsk2"), col("inv_item_sk").as("isk2"),
        col("d_moy").as("dmoy2"), col("mean").as("mean2"), col("cov").as("cov2"))
    inv1.join(inv2, col("isk1") === col("isk2") && col("wsk1") === col("wsk2"))
      .select(col("wsk1"), col("isk1"), col("dmoy1"), col("mean1"), col("cov1"),
        col("wsk2"), col("isk2"), col("dmoy2"), col("mean2"), col("cov2"))
      .orderBy(asc_nulls_first("wsk1"), asc_nulls_first("isk1"),
        asc_nulls_first("dmoy1"), asc_nulls_first("mean1"),
        asc_nulls_first("cov1"), asc_nulls_first("dmoy2"),
        asc_nulls_first("mean2"), asc_nulls_first("cov2"))
  }

  val queries: Map[String, Q] = Map(
    "k44_staged_ds39" -> staged("tpcds_q39"),
    "k45_staged_ds72" -> staged("tpcds_q72"),
    "k48_fused_ds39" -> fusedQ39)

  val oracles: Map[String, String] = Map(
    "k44_staged_ds39" -> graft.queries.Tpcds.oracles("tpcds_q39"),
    "k45_staged_ds72" -> graft.queries.Tpcds.oracles("tpcds_q72"),
    "k48_fused_ds39" -> graft.queries.Tpcds.oracles("tpcds_q39"))
}
