import org.apache.spark.sql.SparkSession
object TDbg {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(cpus = 8, appName = "tdbg")
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    graft.functions.GlareCompat.register(spark)
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    Seq(
      "SELECT * FROM glob('../testdata/csv/glob_numbers/**') ORDER BY 1",
      "SELECT _filename, *, _rowid FROM read_text('../testdata/text/glob_simple/*.txt') ORDER BY 1",
      "SELECT * FROM read_text('../testdata/text/same_content_different_name/1.txt') r1 NATURAL JOIN read_text('../testdata/text/same_content_different_name/2.txt') r2",
      "SELECT * FROM read_text('../testdata/text/same_content_different_name/1.txt') r1 JOIN read_text('../testdata/text/same_content_different_name/2.txt') r2 USING (_rowid)"
    ).foreach { q =>
      try println(q.take(60) + " ==> " + spark.sql(q).collect().map(_.toString).mkString(" | "))
      catch { case e: Exception => println(q.take(60) + " ERR " + e.getMessage.take(200)) }
    }
    spark.stop()
  }
}
