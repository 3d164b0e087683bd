package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg read-path invariants against the reference's in-tree fixtures
  * (testdata/iceberg). Metadata-TVF values mirror slt/iceberg SLTs; the
  * data-read values are oracle-checked driver-side (ice01–ice08). */
class IcebergSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cpus = 8, appName = "graft-iceberg-test")
  val Base = "/root/reference/testdata/iceberg"

  override def afterAll(): Unit = spark.stop()

  test("v1 simple: schema + row count") {
    val df = sources.Iceberg.read(spark, s"$Base/tables-v1/lineitem_simple")
    assert(df.schema.fieldNames.length == 16)
    assert(df.schema("l_quantity").dataType.typeName.startsWith("decimal"))
    assert(df.count() == 1000)
  }

  test("v2 partitioned: all 7 shipmodes, 1000 rows total") {
    val df = sources.Iceberg.read(spark, s"$Base/tables-v2/lineitem_partitioned")
    assert(df.count() == 1000)
    assert(df.select("l_shipmode").distinct().count() == 7)
  }

  test("manifest-level partition pruning reads only the AIR file") {
    val t = sources.Iceberg.load(s"$Base/tables-v1/lineitem_partitioned")
    val all = sources.Iceberg.liveDataFiles(t)
    val air = sources.Iceberg.liveDataFiles(t, Map("l_shipmode" -> "AIR"))
    assert(all.length == 7)
    assert(air.length == 1 && air.head.filePath.contains("l_shipmode=AIR"))
    val n = sources.Iceberg.read(spark, s"$Base/tables-v1/lineitem_partitioned",
      Map("l_shipmode" -> "AIR")).count()
    assert(n == air.head.recordCount)
  }

  test("versioned: current snapshot resolves via version-hint") {
    val t = sources.Iceberg.load(s"$Base/tables-v1/lineitem_versioned")
    assert(t.snapshots.length == 2)
    val files = sources.Iceberg.liveDataFiles(t)
    info(s"versioned live files: ${files.map(f => f.filePath + " n=" + f.recordCount)}")
    val n = sources.Iceberg.read(spark, s"$Base/tables-v1/lineitem_versioned").count()
    assert(n == files.map(_.recordCount).sum)
  }

  test("cities metadata TVFs match slt/iceberg expected values") {
    val meta = sources.Iceberg.metadataDf(spark, s"$Base/wh/default.db/cities").collect()
    assert(meta.map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((2, "3e7c486c-5e5a-426e-aed7-a022fe2b52b6", "file://wh/default.db/cities")))
    val snaps = sources.Iceberg.snapshotsDf(spark, s"$Base/wh/default.db/cities").collect()
    assert(snaps.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((8687260678833969554L, 1L)))
    val dfs = sources.Iceberg.dataFilesDf(spark, s"$Base/wh/default.db/cities").collect()
    assert(dfs.map(r => (r.getString(0), r.getString(1), r.getString(3), r.getLong(4))).toSeq ==
      Seq(("ADDED", "DATA", "PARQUET", 4L)))
  }

  test("v2 live delete entries are rejected, not silently dropped") {
    import sources.Iceberg.{ManifestFile, DataFileEntry, requireNoDeletes}
    val data = ManifestFile("m1.avro", 100L, content = 0, sequenceNumber = 1L)
    val del = ManifestFile("m2.avro", 100L, content = 1, sequenceNumber = 2L)
    def entry(content: Int, status: Int = 1) = DataFileEntry(
      status = status, content = content, filePath = "f.parquet",
      fileFormat = "PARQUET", recordCount = 10L, partition = Map.empty)
    // clean table: fine
    requireNoDeletes(Seq(data -> entry(0)))
    // delete manifest present → reject
    val e1 = intercept[UnsupportedOperationException] {
      requireNoDeletes(Seq(data -> entry(0), del -> entry(1)))
    }
    assert(e1.getMessage.contains("delete"))
    // delete FILE inside a data manifest → reject too
    intercept[UnsupportedOperationException] {
      requireNoDeletes(Seq(data -> entry(0), data -> entry(2)))
    }
    // a REMOVED (status=2) delete entry is not live — fine
    requireNoDeletes(Seq(data -> entry(0), del -> entry(1, status = 2)))
  }

  test("sql sugar: iceberg TVFs and read_iceberg resolve") {
    val n = sources.GraftSession.sql(spark,
      s"SELECT count(*) AS n FROM read_iceberg('$Base/tables-v1/lineitem_simple')")
      .collect().head.getLong(0)
    assert(n == 1000L)
    val snap = sources.GraftSession.sql(spark,
      s"SELECT snapshot_id FROM iceberg.snapshots('$Base/wh/default.db/cities')")
      .collect().head.getLong(0)
    assert(snap == 8687260678833969554L)
  }
}
