package graft

/** Scratch: decimal-sum vs double-sum aggregation cost on tpch q01's shape
  * (bench feedback loop only; not part of the driver contract). */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(cpus = 32, appName = "agg-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/lineitem.parquet").createOrReplaceTempView("lineitem")
    val dec = """SELECT l_returnflag, l_linestatus,
      sum(cast(l_quantity as decimal(6,4))) a, sum(cast(l_extendedprice as decimal(12,4))) b,
      sum(cast(l_extendedprice as decimal(12,4)) * (cast(1 as decimal(5,4)) - cast(l_discount as decimal(6,4)))) c,
      sum(cast(l_extendedprice as decimal(12,4)) * (cast(1 as decimal(5,4)) - cast(l_discount as decimal(6,4))) * (cast(1 as decimal(5,4)) + cast(l_tax as decimal(6,4)))) d,
      count(*) n
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' GROUP BY 1,2"""
    val dbl = """SELECT l_returnflag, l_linestatus,
      sum(l_quantity) a, sum(l_extendedprice) b,
      sum(l_extendedprice * (1 - l_discount)) c,
      sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) d,
      count(*) n
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' GROUP BY 1,2"""
    val scan = "SELECT count(*) n FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'"
    def time(tag: String, sql: String): Unit = {
      (1 to 6).foreach { i =>
        val t0 = System.nanoTime
        spark.sql(sql).write.format("noop").mode("overwrite").save()
        println(f"[$tag run$i] ${(System.nanoTime - t0) / 1e6}%.0f ms")
      }
    }
    val decWide = """SELECT l_returnflag, l_linestatus,
      sum(cast(l_quantity as decimal(6,4))) a, sum(cast(l_extendedprice as decimal(12,4))) b,
      count(*) n
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' GROUP BY 1,2"""
    val decNarrow = """SELECT l_returnflag, l_linestatus,
      sum(cast(l_quantity as decimal(4,2))) a, sum(cast(l_extendedprice as decimal(8,2))) b,
      count(*) n
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' GROUP BY 1,2"""
    val sumd = """SELECT l_returnflag, l_linestatus,
      CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(6,4))), 4) AS DOUBLE) a,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 4) AS DOUBLE) b,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(6,4)))), 4) AS DOUBLE) c,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(6,4))) * (CAST(1 AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(6,4)))), 4) AS DOUBLE) d,
      count(*) n
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' GROUP BY 1,2 ORDER BY 1,2"""
    // without the rewrite rule vs with
    spark.sql(sumd).collect().foreach(r => println(s"[plain] $r"))
    time("sumd_plain", sumd)
    Engine.ensureOptimizations(spark)
    println(spark.sql(sumd).queryExecution.optimizedPlan.toString.take(800))
    spark.sql(sumd).collect().foreach(r => println(s"[fast ] $r"))
    time("sumd_fast", sumd)
    time("scan", scan); time("dbl", dbl); time("dec", dec)
    time("decWide", decWide); time("decNarrow", decNarrow)
    spark.stop()
  }
}
