package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.QueryDsl.Q

/** Staged ClickBench layout: the synthesized `hits` projection materialized
  * ONCE at ingest as a sorted parquet table, instead of re-deriving ~25
  * columns from `events` inside every query.
  *
  * The stored table is range-partitioned by CounterID and sorted within
  * files by (CounterID, EventDate, UserID) — ClickBench's own physical
  * order (the reference loads the partitioned hits dataset sorted this
  * way; `bench/clickbench/partitioned/`). Effects at scale:
  *   - `CounterID = k` / EventDate-window predicates prune row groups via
  *     zone maps instead of scanning the full fact table;
  *   - the per-row string synthesis (URL/Title/Referer concatenations —
  *     the dominant CPU cost of the view at 100 TB) is paid once at ingest,
  *     not per query;
  *   - column pruning still applies (parquet is columnar), so wide-table
  *     queries read only what they touch.
  *
  * Twins run the IDENTICAL query texts with `hits` re-pointed at the
  * stored table — same values, same oracle as their cbx_q* originals.
  */
object CbxLayout {

  /** Materialize the staged hits table for `dir`; returns the table name.
    * Same per-JVM-session staging contract as the TPC-H layout writers
    * (rebuilt per JVM, reused across sessions within it). */
  def writeStagedHits(spark: SparkSession, dir: String): String = {
    val tag = Integer.toHexString(dir.hashCode).take(8)
    val th = s"graft_hits_$tag"
    if (!spark.catalog.tableExists(th)) {
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      val f = new java.io.File(wh, th)
      if (f.exists()) {
        def rm(x: java.io.File): Unit = {
          Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
        }
        rm(f)
      }
      graft.Engine.table(spark, dir, "events")
      spark.sql(graft.queries.ClickBench.hitsSelect)
        .repartitionByRange(32, col("CounterID"), col("EventDate"))
        .sortWithinPartitions(col("CounterID"), col("EventDate"), col("UserID"))
        .write.mode("overwrite").format("parquet")
        .saveAsTable(th)
    }
    th
  }

  /** Run a cbx query text against the staged table (the text references
    * `hits`, which we point at the stored layout for this session). */
  private def staged(name: String): Q = { (s, dir) =>
    val th = writeStagedHits(s, dir)
    s.sql(s"CREATE OR REPLACE TEMPORARY VIEW hits AS SELECT * FROM $th")
    s.sql(graft.queries.ClickBench.text(name).trim)
  }

  /** Staged twins for the heaviest cbx queries (selection measured at sf10,
    * round 10): the wide 90-aggregate scan, the high-cardinality group-bys,
    * and the counter-filtered scans that benefit from the sort order. */
  val queries: Map[String, Q] = Map(
    "k32_staged_cbx29" -> staged("cbx_q29"),
    "k33_staged_cbx32" -> staged("cbx_q32"),
    "k34_staged_cbx33" -> staged("cbx_q33"))

  val oracles: Map[String, String] = Map(
    "k32_staged_cbx29" -> graft.queries.ClickBench.oracles("cbx_q29"),
    "k33_staged_cbx32" -> graft.queries.ClickBench.oracles("cbx_q32"),
    "k34_staged_cbx33" -> graft.queries.ClickBench.oracles("cbx_q33"))
}
