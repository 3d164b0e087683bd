package graft.queries

import graft.QueryDsl._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Optimizer-stress query shapes mirroring the reference's rewrite rules
  * (SURVEY.md §4.1): OR-distribution + join-filter extraction
  * (`expr_rewrite/join_filter_or.rs`, `distributive_or.rs`), Neumann-style
  * decorrelation of correlated aggregates (`plan_subquery.rs:127-159`),
  * multi-EXISTS, and HAVING-IN pipelines — TPC-H q14/q17/q18/q19/q21/q22
  * shapes adapted to the driver fixture columns. Catalyst performs the
  * equivalent rewrites (PushDownPredicates, RewriteCorrelatedScalarSubquery,
  * RewritePredicateSubquery); the oracle proves result parity.
  */
object OptimizerShapes {

  private val discPriceSql =
    s"${sql.dmoney("l_extendedprice")} * (${sql.one} - ${sql.drate("l_discount")})"

  val queries: Map[String, Q] = Map(
    // q14 shape: conditional aggregation over a join, ratio of exact sums.
    "o01_promo_revenue" -> { (s, dir) =>
      t(s, dir, "lineitem"); t(s, dir, "part")
      s.sql(s"""
        SELECT
          CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
              THEN ${sql.dmoney("l_extendedprice")} * (${sql.one} - ${sql.drate("l_discount")})
              ELSE CAST(0 AS DECIMAL(12,4)) END), 4) AS DOUBLE) * 100 /
          CAST(ROUND(SUM(${sql.dmoney("l_extendedprice")} * (${sql.one} - ${sql.drate("l_discount")})), 4) AS DOUBLE)
            AS promo_pct,
          COUNT(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'
      """)
    },

    // q19 shape: disjunction of conjunctive range predicates across both
    // join sides — exercises OR distribution / join-filter extraction.
    "o02_or_predicate_join" -> { (s, dir) =>
      t(s, dir, "lineitem"); t(s, dir, "part")
      s.sql(s"""
        SELECT CAST(ROUND(SUM($discPriceSql), 4) AS DOUBLE) AS revenue, COUNT(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 35)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 50)
      """)
    },

    // q21 shape: EXISTS + NOT EXISTS against the same fact table with
    // different correlations.
    "o03_multi_exists" -> { (s, dir) =>
      t(s, dir, "supplier"); t(s, dir, "lineitem"); t(s, dir, "orders")
      s.sql("""
        SELECT s_suppkey, s_name, COUNT(*) AS n_lines
        FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s_suppkey, s_name
        ORDER BY n_lines DESC, s_suppkey
        LIMIT 20
      """)
    },

    // q17 shape: correlated aggregate (per-part average) decorrelated into
    // a join — Neumann-style in the reference, RewriteCorrelatedScalar in
    // Catalyst.
    "o04_correlated_avg" -> { (s, dir) =>
      t(s, dir, "lineitem"); t(s, dir, "part")
      s.sql(s"""
        SELECT CAST(ROUND(SUM(${sql.dmoney("l_extendedprice")}), 4) AS DOUBLE) / 7.0
                 AS avg_yearly,
               COUNT(*) AS n
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#5'
          AND l_quantity < (
            SELECT 0.5 * (CAST(SUM(${sql.drate("l_quantity")}) AS DOUBLE) / COUNT(*))
            FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
      """)
    },

    // q18 shape: HAVING-filtered grouped keys feeding an IN predicate.
    "o05_having_in" -> { (s, dir) =>
      t(s, dir, "lineitem"); t(s, dir, "orders"); t(s, dir, "customer")
      s.sql(s"""
        SELECT c_custkey, o_orderkey, o_orderdate,
               CAST(ROUND(SUM(${sql.drate("l_quantity")}), 4) AS DOUBLE) AS total_qty
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey
          HAVING SUM(${sql.drate("l_quantity")}) > 150)
        GROUP BY c_custkey, o_orderkey, o_orderdate
        ORDER BY total_qty DESC, o_orderkey
        LIMIT 50
      """)
    },

    // q22 shape: uncorrelated scalar (global exact average) + anti join.
    "o06_idle_customers" -> { (s, dir) =>
      t(s, dir, "customer"); t(s, dir, "orders")
      s.sql(s"""
        SELECT c_nationkey, COUNT(*) AS n_cust,
               CAST(ROUND(SUM(${sql.dbig("c_acctbal")}), 4) AS DOUBLE) AS total_bal
        FROM customer
        WHERE c_acctbal > (
            SELECT CAST(SUM(${sql.dbig("c_acctbal")}) AS DOUBLE) / COUNT(*)
            FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY c_nationkey
        ORDER BY c_nationkey
      """)
    })

  // Oracles: the SQL above is dialect-portable by construction.
  val oracles: Map[String, String] =
    queries.keys.map(k => k -> sqlText(k)).toMap

  private def sqlText(name: String): String = name match {
    case "o01_promo_revenue" => s"""
      SELECT
        CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
            THEN ${sql.dmoney("l_extendedprice")} * (${sql.one} - ${sql.drate("l_discount")})
            ELSE CAST(0 AS DECIMAL(12,4)) END), 4) AS DOUBLE) * 100 /
        CAST(ROUND(SUM(${sql.dmoney("l_extendedprice")} * (${sql.one} - ${sql.drate("l_discount")})), 4) AS DOUBLE)
          AS promo_pct,
        COUNT(*) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'"""
    case "o02_or_predicate_join" => s"""
      SELECT CAST(ROUND(SUM($discPriceSql), 4) AS DOUBLE) AS revenue, COUNT(*) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 1 AND 20)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
             AND l_quantity BETWEEN 10 AND 35)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
             AND l_quantity BETWEEN 20 AND 50)"""
    case "o03_multi_exists" => """
      SELECT s_suppkey, s_name, COUNT(*) AS n_lines
      FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      WHERE o_orderstatus = 'F'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > l1.l_shipdate)
      GROUP BY s_suppkey, s_name
      ORDER BY n_lines DESC, s_suppkey
      LIMIT 20"""
    case "o04_correlated_avg" => s"""
      SELECT CAST(ROUND(SUM(${sql.dmoney("l_extendedprice")}), 4) AS DOUBLE) / 7.0
               AS avg_yearly,
             COUNT(*) AS n
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#5'
        AND l_quantity < (
          SELECT 0.5 * (CAST(SUM(${sql.drate("l_quantity")}) AS DOUBLE) / COUNT(*))
          FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""
    case "o05_having_in" => s"""
      SELECT c_custkey, o_orderkey, o_orderdate,
             CAST(ROUND(SUM(${sql.drate("l_quantity")}), 4) AS DOUBLE) AS total_qty
      FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(${sql.drate("l_quantity")}) > 150)
      GROUP BY c_custkey, o_orderkey, o_orderdate
      ORDER BY total_qty DESC, o_orderkey
      LIMIT 50"""
    case "o06_idle_customers" => s"""
      SELECT c_nationkey, COUNT(*) AS n_cust,
             CAST(ROUND(SUM(${sql.dbig("c_acctbal")}), 4) AS DOUBLE) AS total_bal
      FROM customer
      WHERE c_acctbal > (
          SELECT CAST(SUM(${sql.dbig("c_acctbal")}) AS DOUBLE) / COUNT(*)
          FROM customer WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      GROUP BY c_nationkey
      ORDER BY c_nationkey"""
  }
}
