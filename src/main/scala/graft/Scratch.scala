package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe — not part of the engine surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(cpus = 32, appName = "scratch")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val docs = Engine.table(spark, dir, "documents")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val sh = array_distinct(transform(
      sequence(lit(1), greatest(length(norm) - 4, lit(1))),
      i => substring(norm, i, lit(5))))
    val withSh = docs.select(col("doc_id"), sh.as("sh"))
    time("shingles only")(withSh.write.format("noop").mode("overwrite").save())
    val withHs = withSh.withColumn("hs", transform(col("sh"), s => xxhash64(s)))
    time("+hash")(withHs.write.format("noop").mode("overwrite").save())
    val withSig = withHs.withColumn("sig", expr("minhash_sig(hs, 24)"))
    time("+sig")(withSig.write.format("noop").mode("overwrite").save())

    val k = 24; val bands = 3; val rows = 8
    val banded = withSig.select(col("doc_id"), col("sig"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          xxhash64(lit(b) +: (0 until rows).map(r =>
            element_at(col("sig"), b * rows + r + 1)): _*).as("bh"))): _*)).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band"), col("bk.bh"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
    println("candidate rows: " + time("cand count")(cand.count()))
    spark.stop()
  }
}
