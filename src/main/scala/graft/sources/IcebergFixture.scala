package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Synthesizes a small Iceberg v2 table carrying LIVE position- and
  * equality-delete files, derived deterministically from the `nation`
  * fixture. This exercises the delete-application path
  * ([[Iceberg.read]]) end-to-end against a relational oracle: the table
  * holds all 25 nations split over two data files (sequence 1), a
  * position-delete file kills rows 0-1 of the first file (n_nationkey 0
  * and 1 — the files are written sorted), and an equality-delete file
  * (sequence 2, equality field n_regionkey) kills region 2, so the
  * surviving rows are exactly
  * `nation WHERE n_nationkey NOT IN (0,1) AND n_regionkey <> 2`.
  *
  * The manifests are written with the same avro field layout production
  * writers emit (manifest_list: path/length/content/sequence_number;
  * manifest entry: status/sequence_number/data_file{content, file_path,
  * file_format, record_count, equality_ids}).
  */
object IcebergFixture {

  /** Write `df` as exactly one parquet FILE at `dest` (Spark writes a
    * directory; the single part file is moved out), sorted when asked so
    * row positions are deterministic. */
  private def writeOneFile(df: DataFrame, dest: String,
                           sortCol: Option[String] = None): Unit = {
    val tmp = dest + "_tmp"
    val one = df.coalesce(1)
    sortCol.fold(one)(c => one.sortWithinPartitions(c))
      .write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val destF = new java.io.File(dest)
    if (destF.exists()) destF.delete()
    java.nio.file.Files.move(part.toPath, destF.toPath)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  private def avroWrite(
      path: String, schema: Schema, recs: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(path))
    recs.foreach(w.append)
    w.close()
  }

  private val dfSchema = SchemaBuilder.record("data_file").fields()
    .requiredInt("content").requiredString("file_path")
    .requiredString("file_format").requiredLong("record_count")
    .name("equality_ids").`type`().nullable().array().items().intType()
    .noDefault()
    .endRecord()
  private val entrySchema = SchemaBuilder.record("manifest_entry").fields()
    .requiredInt("status")
    .name("sequence_number").`type`().nullable().longType().noDefault()
    .name("data_file").`type`(dfSchema).noDefault()
    .endRecord()
  private val mfSchema = SchemaBuilder.record("manifest_file").fields()
    .requiredString("manifest_path").requiredLong("manifest_length")
    .requiredInt("content").requiredLong("sequence_number")
    .endRecord()

  private def entry(content: Int, path: String, n: Long, seq: Option[Long],
                    eqIds: Seq[Int] = Nil): GenericRecord = {
    val d = new GenericData.Record(dfSchema)
    d.put("content", content); d.put("file_path", path)
    d.put("file_format", "PARQUET"); d.put("record_count", n)
    d.put("equality_ids", if (eqIds.isEmpty) null
      else java.util.List.of(eqIds.map(Integer.valueOf): _*))
    val e = new GenericData.Record(entrySchema)
    e.put("status", 1)
    e.put("sequence_number", seq.map(java.lang.Long.valueOf).orNull)
    e.put("data_file", d)
    e
  }

  private def mf(path: String, content: Int, seq: Long): GenericRecord = {
    val r = new GenericData.Record(mfSchema)
    r.put("manifest_path", path); r.put("manifest_length", 100L)
    r.put("content", content); r.put("sequence_number", seq)
    r
  }

  /** Build (or rebuild) the delete-demo table; returns its root path. */
  def deleteDemo(spark: SparkSession, sfDir: String): String = {
    import spark.implicits._
    val root = new java.io.File("target/graft_ice_deletes").getAbsolutePath
    new java.io.File(s"$root/metadata").mkdirs()
    new java.io.File(s"$root/data").mkdirs()

    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    writeOneFile(nation.where("n_nationkey < 12"),
      s"$root/data/d1.parquet", sortCol = Some("n_nationkey"))
    writeOneFile(nation.where("n_nationkey >= 12"),
      s"$root/data/d2.parquet", sortCol = Some("n_nationkey"))
    // rows 0 and 1 of the sorted d1 = n_nationkey 0 and 1
    writeOneFile(
      Seq((s"$root/data/d1.parquet", 0L), (s"$root/data/d1.parquet", 1L))
        .toDF("file_path", "pos"),
      s"$root/data/pd.parquet")
    // equality delete on n_regionkey (field id 3) = 2
    writeOneFile(Seq(Tuple1(2)).toDF("n_regionkey"), s"$root/data/ed.parquet")

    avroWrite(s"$root/metadata/mdata.avro", entrySchema, Seq(
      entry(0, s"$root/data/d1.parquet", 12L, None),
      entry(0, s"$root/data/d2.parquet", 13L, None)))
    avroWrite(s"$root/metadata/mdel.avro", entrySchema, Seq(
      entry(1, s"$root/data/pd.parquet", 2L, Some(2L)),
      entry(2, s"$root/data/ed.parquet", 1L, Some(2L), eqIds = Seq(3))))
    avroWrite(s"$root/metadata/mlist.avro", mfSchema, Seq(
      mf(s"$root/metadata/mdata.avro", 0, 1L),
      mf(s"$root/metadata/mdel.avro", 1, 2L)))

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/metadata/v1.metadata.json"),
      s"""{"format-version": 2,
         |"table-uuid": "00000000-0000-0000-0000-000000000009",
         |"location": "$root",
         |"schema": {"type": "struct", "fields": [
         |  {"id": 1, "name": "n_nationkey", "required": true, "type": "int"},
         |  {"id": 2, "name": "n_name", "required": false, "type": "string"},
         |  {"id": 3, "name": "n_regionkey", "required": false, "type": "int"}]},
         |"current-snapshot-id": 9,
         |"snapshots": [{"snapshot-id": 9, "sequence-number": 2,
         |  "manifest-list": "$root/metadata/mlist.avro"}]}""".stripMargin)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/metadata/version-hint.text"), "1")
    root
  }
}
