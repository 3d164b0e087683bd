package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Union}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the generator cross-join reorder rule
  * (`plans/PushJoinThroughTinyCross.scala`): a conditioned inner/semi join
  * over a tiny literal cross join is pushed below the expansion, with
  * values unchanged and the selective join provably running before the
  * generator multiplies rows.
  */
class CrossPushSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    Engine.session(cpus = 4, appName = "graft-crosspush-test")
  val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  /** In the optimized plan, does some condition-free (generator) join have
    * a CONDITIONED join strictly below it? That is the rewrite's
    * signature: expansion above, selective join below. */
  private def joinPushedBelowCross(plan: LogicalPlan): Boolean = {
    def hasCondJoin(p: LogicalPlan): Boolean =
      p.collectFirst { case Join(_, _, _, Some(_), _) => true }.isDefined
    plan.collectFirst {
      case Join(l, r, _, None, _) if hasCondJoin(l) || hasCondJoin(r) => true
    }.isDefined
  }

  private def q16ish(s: SparkSession): org.apache.spark.sql.DataFrame = {
    Engine.table(s, dir, "part")
    Engine.table(s, dir, "supplier")
    s.sql("""
      WITH partsupp AS (
        SELECT p_partkey AS ps_partkey,
               (p_partkey - 1 + i) % s_count + 1 AS ps_suppkey
        FROM part
        CROSS JOIN (SELECT 0 AS i UNION ALL SELECT 1 UNION ALL SELECT 2
                    UNION ALL SELECT 3) slots
        CROSS JOIN (SELECT COUNT(*) AS s_count FROM supplier) sc)
      SELECT p_brand, COUNT(DISTINCT ps_suppkey) AS n
      FROM partsupp JOIN part ON p_partkey = ps_partkey
      WHERE p_size IN (1, 2, 3)
      GROUP BY p_brand""")
  }

  test("cross push: q16-shaped inner join lands below the generator") {
    val df = q16ish(spark)
    assert(joinPushedBelowCross(df.queryExecution.optimizedPlan),
      s"no conditioned join below a generator cross join:\n" +
        df.queryExecution.optimizedPlan.treeString)
  }

  test("cross push: values identical with the rule on and off") {
    val on = q16ish(spark).collect().map(_.toSeq).toSet
    spark.conf.set("spark.graft.pushJoinThroughTinyCross", "false")
    try {
      val off = q16ish(spark).collect().map(_.toSeq).toSet
      assert(on === off)
      assert(on.nonEmpty)
    } finally spark.conf.set("spark.graft.pushJoinThroughTinyCross", "true")
  }

  test("cross push: semi join (IN subquery) pushed below the generator") {
    Engine.table(spark, dir, "part")
    Engine.table(spark, dir, "supplier")
    val df = spark.sql("""
      WITH partsupp AS (
        SELECT p_partkey AS ps_partkey,
               (p_partkey - 1 + i) % s_count + 1 AS ps_suppkey
        FROM part
        CROSS JOIN (SELECT 0 AS i UNION ALL SELECT 1 UNION ALL SELECT 2
                    UNION ALL SELECT 3) slots
        CROSS JOIN (SELECT COUNT(*) AS s_count FROM supplier) sc)
      SELECT DISTINCT ps_suppkey FROM partsupp
      WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_size = 1)""")
    assert(joinPushedBelowCross(df.queryExecution.optimizedPlan),
      df.queryExecution.optimizedPlan.treeString)
    // and the values match the rule-off run
    val on = df.collect().map(_.toSeq).toSet
    spark.conf.set("spark.graft.pushJoinThroughTinyCross", "false")
    try {
      val off = spark.sql("""
        WITH partsupp AS (
          SELECT p_partkey AS ps_partkey,
                 (p_partkey - 1 + i) % s_count + 1 AS ps_suppkey
          FROM part
          CROSS JOIN (SELECT 0 AS i UNION ALL SELECT 1 UNION ALL SELECT 2
                      UNION ALL SELECT 3) slots
          CROSS JOIN (SELECT COUNT(*) AS s_count FROM supplier) sc)
        SELECT DISTINCT ps_suppkey FROM partsupp
        WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_size = 1)""")
        .collect().map(_.toSeq).toSet
      assert(on === off && on.nonEmpty)
    } finally spark.conf.set("spark.graft.pushJoinThroughTinyCross", "true")
  }

  test("cross push: a join keyed on the generator slot does NOT move") {
    // ps_suppkey depends on the tiny slot column i — pushing the supplier
    // join below the expansion would be unsound, so the rule must bail
    // (asserted by applying the rule directly to the rule-off plan)
    Engine.table(spark, dir, "part")
    Engine.table(spark, dir, "supplier")
    spark.conf.set("spark.graft.pushJoinThroughTinyCross", "false")
    val plan = try {
      spark.sql("""
        WITH partsupp AS (
          SELECT p_partkey AS ps_partkey,
                 (p_partkey - 1 + i) % s_count + 1 AS ps_suppkey
          FROM part
          CROSS JOIN (SELECT 0 AS i UNION ALL SELECT 1 UNION ALL SELECT 2
                      UNION ALL SELECT 3) slots
          CROSS JOIN (SELECT COUNT(*) AS s_count FROM supplier) sc)
        SELECT COUNT(*) AS n
        FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey""")
        .queryExecution.optimizedPlan
    } finally spark.conf.set("spark.graft.pushJoinThroughTinyCross", "true")
    assert(graft.plans.PushJoinThroughTinyCross(plan) === plan)
  }

  test("cross push: data-table cross joins are never treated as tiny") {
    // nation has no static maxRows bound -> the rule must not fire even
    // though the table is physically small
    Engine.table(spark, dir, "nation")
    Engine.table(spark, dir, "supplier")
    Engine.table(spark, dir, "part")
    spark.conf.set("spark.graft.pushJoinThroughTinyCross", "false")
    val plan = try {
      spark.sql("""
        SELECT COUNT(*) AS n
        FROM (SELECT p_partkey AS g_pk, n_nationkey AS g_nk
              FROM part CROSS JOIN nation) g
        JOIN supplier ON g_nk = s_nationkey""")
        .queryExecution.optimizedPlan
    } finally spark.conf.set("spark.graft.pushJoinThroughTinyCross", "true")
    assert(graft.plans.PushJoinThroughTinyCross(plan) === plan)
  }
}
