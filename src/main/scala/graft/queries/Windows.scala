package graft.queries

import graft.QueryDsl._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window-function coverage (SURVEY.md §2.6). The reference binds the full
  * OVER (...) surface but has no physical window operator
  * (`logical/logical_window.rs:10`, `slt/standard/window/basic.slt:6` halts);
  * Spark executes all of it natively, so this module is strict upside.
  */
object Windows {

  val queries: Map[String, Q] = Map(
    "q32_window_rank" -> { (s, dir) =>
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
        .filter(col("rn") <= 5)
        .orderBy("c_mktsegment", "rn")
    },

    "q33_window_running" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .filter(col("o_custkey") <= 50)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(dbig(col("o_totalprice"))).over(w).cast(DoubleType).as("running_total"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },

    "q34_window_lag_lead" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .filter(col("o_custkey") <= 50)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          (col("o_totalprice") - coalesce(lag(col("o_totalprice"), 1).over(w),
            col("o_totalprice"))).as("delta"))
        .orderBy("o_custkey", "o_orderkey")
    },

    "q35_window_moving" -> { (s, dir) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
        .rowsBetween(-2, Window.currentRow)
      t(s, dir, "lineitem")
        .filter(col("l_suppkey") <= 5)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(drate(col("l_quantity"))).over(w).cast(DoubleType).as("qty_3mov"))
        .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
    },

    // Deliberately global (unpartitioned) window: this query demonstrates
    // the distribution functions (NTILE/PERCENT_RANK/CUME_DIST) over a
    // total order, which inherently needs a global sort — the scale-safe
    // rewrite of an unpartitioned running aggregate is demonstrated by
    // q48_running_scalable's two-level prefix sum instead.
    "q36_window_dist" -> { (s, dir) =>
      val w = Window.orderBy(col("p_retailprice").asc, col("p_partkey").asc)
      t(s, dir, "part")
        .select(col("p_partkey"), col("p_retailprice"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("p_partkey")
    },

    "q37_first_last" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .filter(col("o_custkey") <= 50)
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_key"),
          last(col("o_orderkey")).over(w).as("last_key"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
        .orderBy("o_custkey", "o_orderkey")
    },

    "q38_window_range_interval" -> { (s, dir) =>
      t(s, dir, "orders")
      // RANGE frame over a time ordering — SQL-only in both engines.
      s.sql("""
        SELECT o_custkey, o_orderkey, o_orderdate,
               COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS n_30d
        FROM orders
        WHERE o_custkey <= 50
        ORDER BY o_custkey, o_orderdate, o_orderkey
      """)
    },

    // Scalable GLOBAL running sum — the 100 TB shape for an unpartitioned
    // `SUM() OVER (ORDER BY ...)`, which Spark would otherwise execute as a
    // single-partition WindowExec (its own warning: "Moving all data to a
    // single partition"). Three fully-distributed steps instead:
    //   1. range-partition + sort by the order key (localCheckpointed once
    //      so the sampled range boundaries are consistent across branches);
    //   2. per-partition window (parallel: partitioned by partition id);
    //   3. per-partition offsets = running sum over the tiny
    //      partition-totals relation (numPartitions rows), broadcast-joined
    //      back. No driver-side state, no full-data single partition.
    "q48_running_scalable" -> { (s, dir) =>
      val parts = 8
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), dbig(col("o_totalprice")).as("price"))
        .repartitionByRange(parts, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
        .withColumn("pid", spark_partition_id())
        .localCheckpoint()
      val offs = base.groupBy("pid")
        .agg(sum(col("price")).as("part_total"))
        .withColumn("offset",
          // the window input is the `parts`-row totals relation (bounded
          // by construction at any data scale); partition by pid % 1
          // (constant 0, but not foldable — a literal gets optimized back
          // to an empty spec) so WindowExec doesn't warn
          coalesce(sum(col("part_total")).over(
            Window.partitionBy(pmod(col("pid"), lit(1))).orderBy("pid")
              .rowsBetween(Window.unboundedPreceding, -1)),
            lit(0).cast(DecimalType(24, 4))))
        .select(col("pid").as("opid"), col("offset"))
      val local = Window.partitionBy("pid").orderBy("o_orderkey")
      base
        .withColumn("local_run", sum(col("price")).over(local))
        .join(broadcast(offs), col("pid") === col("opid"))
        .select(col("o_orderkey"),
          (col("offset") + col("local_run")).cast(DecimalType(24, 4))
            .cast(DoubleType).as("running_total"))
        .orderBy("o_orderkey")
        .limit(1000)
    })

  val oracles: Map[String, String] = Map(
    // the distributed two-level prefix sum must equal the plain global
    // running sum
    "q48_running_scalable" -> s"""
      SELECT o_orderkey,
        CAST(ROUND(SUM(${sql.dbig("o_totalprice")}) OVER (
          ORDER BY o_orderkey), 4) AS DOUBLE) AS running_total
      FROM orders ORDER BY o_orderkey LIMIT 1000""",

    "q32_window_rank" -> """
      SELECT * FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               CAST(ROW_NUMBER() OVER w AS INT) AS rn,
               CAST(RANK() OVER w AS INT) AS rnk,
               CAST(DENSE_RANK() OVER w AS INT) AS drnk
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)) x
      WHERE rn <= 5
      ORDER BY c_mktsegment, rn""",

    "q33_window_running" -> s"""
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(SUM(${sql.dbig("o_totalprice")}) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      FROM orders
      WHERE o_custkey <= 50
      ORDER BY o_custkey, o_orderdate, o_orderkey""",

    "q34_window_lag_lead" -> """
      SELECT o_custkey, o_orderkey,
             LAG(o_totalprice, 1) OVER w AS prev_price,
             LEAD(o_totalprice, 1) OVER w AS next_price,
             o_totalprice - COALESCE(LAG(o_totalprice, 1) OVER w, o_totalprice) AS delta
      FROM orders
      WHERE o_custkey <= 50
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
      ORDER BY o_custkey, o_orderkey""",

    "q35_window_moving" -> s"""
      SELECT l_suppkey, l_orderkey, l_linenumber,
             CAST(SUM(${sql.drate("l_quantity")}) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_3mov
      FROM lineitem
      WHERE l_suppkey <= 5
      ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""",

    "q36_window_dist" -> """
      SELECT p_partkey, p_retailprice,
             CAST(NTILE(4) OVER w AS INT) AS quartile,
             PERCENT_RANK() OVER w AS pr,
             CUME_DIST() OVER w AS cd
      FROM part
      WINDOW w AS (ORDER BY p_retailprice ASC, p_partkey ASC)
      ORDER BY p_partkey""",

    "q37_first_last" -> """
      SELECT o_custkey, o_orderkey,
             FIRST_VALUE(o_orderkey) OVER w AS first_key,
             LAST_VALUE(o_orderkey) OVER w AS last_key,
             NTH_VALUE(o_orderkey, 2) OVER w AS second_key
      FROM orders
      WHERE o_custkey <= 50
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey""",

    "q38_window_range_interval" -> """
      SELECT o_custkey, o_orderkey, o_orderdate,
             COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS n_30d
      FROM orders
      WHERE o_custkey <= 50
      ORDER BY o_custkey, o_orderdate, o_orderkey""")
}
