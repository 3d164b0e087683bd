package graft

import org.apache.spark.sql.functions.col

/** Scratch: diagnose k44_staged_ds39 vs tpcds_q39 row diff at tiny sf. */
object K44Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Engine.session(cpus = 8, appName = "k44-probe")
    spark.sparkContext.setLogLevel("WARN")
    def rows(name: String): Set[Seq[Any]] = {
      val df = SparkEntry.queries(name)(spark, dir)
      df.select(df.columns.sorted.toSeq.map(col): _*).collect().map(_.toSeq.map {
        case d: Double if !d.isNaN && !d.isInfinite =>
          BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
        case x => x
      }).toSet
    }
    val twin = if (args.length > 1) args(1) else "k44_staged_ds39"
    val dflt = if (args.length > 2) args(2)
      else Bench.twinOf.getOrElse(twin, "tpcds_q39")
    val a = rows(twin)
    val b = rows(dflt)
    println(s"twin rows: ${a.size}, default rows: ${b.size}")
    val onlyA = a -- b
    val onlyB = b -- a
    println(s"only in twin: ${onlyA.size}; only in default: ${onlyB.size}")
    onlyA.take(5).foreach(r => println(s"  twin-only: $r"))
    onlyB.take(5).foreach(r => println(s"  dflt-only: $r"))
    // also compare the staged table contents against the view derivation
    if (dflt.startsWith("tpcds")) {
      val tn = graft.operators.TpcdsLayout.writeStagedInventory(spark, dir)
      graft.queries.Tpcds.ensureStar(spark, dir)
      val st = spark.table(tn)
      val vw = spark.sql("SELECT * FROM inventory")
      println(s"staged count=${st.count()} view count=${vw.count()}")
      println(s"staged-except-view=${st.exceptAll(vw).count()} " +
        s"view-except-staged=${vw.exceptAll(st).count()}")
    }
    spark.stop()
  }
}
