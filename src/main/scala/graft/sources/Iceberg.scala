package graft.sources

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Native Apache Iceberg read path (v1 + v2 table formats, local FS).
  *
  * Mirrors the reference's extension scope (glaredb_ext_iceberg/src/table/,
  * metadata TVFs functions/metadata.rs:36-81): table metadata JSON →
  * manifest-list avro → manifest avro → data files, plus the four metadata
  * table functions (`iceberg.metadata/snapshots/manifest_list/data_files`).
  *
  * Spark-first design: metadata/manifest traversal is driver-side (KBs of
  * avro per snapshot — same as any production Iceberg reader's planning
  * phase); the DATA scan is a plain `spark.read.parquet(files…)`, so
  * pruning/pushdown/codegen apply unchanged. Manifest entries carry
  * per-file partition tuples; `read` accepts an optional partition
  * predicate so planning can drop whole files before the scan is built —
  * the manifest-level pruning that matters at 100 TB (the SQL-level filter
  * additionally row-group-skips via parquet stats as usual).
  */
object Iceberg {

  private implicit val formats: Formats = DefaultFormats

  final case class ManifestFile(path: String, length: Long, content: Int, sequenceNumber: Long)
  final case class DataFileEntry(
      status: Int, // 0 existing, 1 added, 2 deleted
      content: Int, // 0 data, 1 position deletes, 2 equality deletes
      filePath: String,
      fileFormat: String,
      recordCount: Long,
      partition: Map[String, String],
      // data sequence number (entry-level, inherited from the manifest when
      // the writer left it null — spec "sequence number inheritance")
      sequenceNumber: Long = 0L,
      // for equality-delete files: the schema field ids rows are matched on
      equalityIds: Seq[Int] = Nil)

  final case class Table(
      root: String, // actual directory on disk
      formatVersion: Int,
      tableUuid: String,
      location: String, // logical location string as stored in metadata
      schema: StructType,
      partitionColumns: Seq[String],
      currentSnapshotId: Option[Long],
      snapshots: Seq[(Long, Long, String)], // (snapshot_id, sequence_number, manifest_list)
      fieldNamesById: Map[Int, String] = Map.empty) {

    /** Map a path as stored in metadata (prefixed with the table's logical
      * `location`, which rarely matches where the fixture now sits) onto the
      * actual table root. */
    def resolve(stored: String): String = {
      def norm(s: String): String =
        s.stripPrefix("file://").stripPrefix("./").stripSuffix("/")
      val loc = norm(location)
      val p = norm(stored)
      if (loc.nonEmpty && p.startsWith(loc + "/")) root + "/" + p.drop(loc.length + 1)
      else if (new java.io.File(p).isAbsolute && new java.io.File(p).exists()) p
      else root + "/" + p.split('/').dropWhile(seg => !Set("metadata", "data").contains(seg)).mkString("/")
    }
  }

  // ---- metadata JSON ----

  /** Iceberg schema JSON type → Spark DataType (primitives per spec). */
  private[sources] def icebergType(t: JValue): DataType = t match {
    case JString(s) =>
      val Dec = raw"decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)".r
      val Fixed = raw"fixed\[(\d+)\]".r
      s match {
        case "boolean"        => BooleanType
        case "int"            => IntegerType
        case "long"           => LongType
        case "float"          => FloatType
        case "double"         => DoubleType
        case "date"           => DateType
        case "time"           => LongType // µs since midnight; no Spark TimeType
        case "timestamp"      => TimestampNTZType
        case "timestamptz"    => TimestampType
        case "string" | "uuid" => StringType
        case "binary"         => BinaryType
        case Dec(p, sc)       => DecimalType(p.toInt, sc.toInt)
        case Fixed(_)         => BinaryType
        case other            => sys.error(s"unsupported iceberg type: $other")
      }
    case obj: JObject =>
      (obj \ "type").extract[String] match {
        case "struct" =>
          StructType((obj \ "fields").extract[List[JObject]].map { f =>
            StructField((f \ "name").extract[String], icebergType(f \ "type"),
              nullable = !(f \ "required").extractOpt[Boolean].getOrElse(false))
          })
        case "list" =>
          ArrayType(icebergType(obj \ "element"),
            containsNull = !(obj \ "element-required").extractOpt[Boolean].getOrElse(false))
        case "map" =>
          MapType(icebergType(obj \ "key"), icebergType(obj \ "value"),
            valueContainsNull = !(obj \ "value-required").extractOpt[Boolean].getOrElse(false))
        case other => sys.error(s"unsupported iceberg complex type: $other")
      }
    case other => sys.error(s"unsupported iceberg type node: $other")
  }

  /** Load table state from the newest metadata JSON (version-hint.text when
    * present, else the lexicographically-last `*.metadata.json`). */
  def load(tableRoot: String): Table = {
    val metaDir = new java.io.File(tableRoot, "metadata")
    require(metaDir.isDirectory, s"not an Iceberg table (no metadata/): $tableRoot")
    val hint = new java.io.File(metaDir, "version-hint.text")
    val metaFile =
      if (hint.exists()) {
        val v = java.nio.file.Files.readString(hint.toPath).trim
        new java.io.File(metaDir, s"v$v.metadata.json")
      } else {
        metaDir.listFiles().filter(_.getName.endsWith(".metadata.json"))
          .sortBy(_.getName).last
      }
    val j = JsonMethods.parse(java.nio.file.Files.readString(metaFile.toPath))

    val schemaJson: JValue = j \ "schemas" match {
      case JArray(xs) if xs.nonEmpty =>
        val cur = (j \ "current-schema-id").extractOpt[Int]
        cur.flatMap(id => xs.find(s => (s \ "schema-id").extractOpt[Int].contains(id)))
          .getOrElse(xs.head)
      case _ => j \ "schema"
    }
    val schema = icebergType(schemaJson.asInstanceOf[JObject]).asInstanceOf[StructType]

    // Identity-partition source columns (by field id) from the default spec.
    val fieldNamesById: Map[Int, String] =
      (schemaJson \ "fields").extract[List[JObject]]
        .map(f => (f \ "id").extract[Int] -> (f \ "name").extract[String]).toMap
    val defaultSpecId = (j \ "default-spec-id").extractOpt[Int].getOrElse(0)
    val partitionCols: Seq[String] = j \ "partition-specs" match {
      case JArray(specs) =>
        specs.find(s => (s \ "spec-id").extractOpt[Int].contains(defaultSpecId))
          .map { s =>
            (s \ "fields").extract[List[JObject]]
              .filter(f => (f \ "transform").extractOpt[String].contains("identity"))
              .flatMap(f => fieldNamesById.get((f \ "source-id").extract[Int]))
          }.getOrElse(Nil)
      case _ => Nil
    }

    val snapshots: Seq[(Long, Long, String)] = j \ "snapshots" match {
      case JArray(xs) =>
        xs.map { s =>
          ((s \ "snapshot-id").extract[Long],
            (s \ "sequence-number").extractOpt[Long].getOrElse(0L),
            (s \ "manifest-list").extract[String])
        }
      case _ => Nil
    }

    Table(
      root = new java.io.File(tableRoot).getAbsolutePath,
      formatVersion = (j \ "format-version").extract[Int],
      tableUuid = (j \ "table-uuid").extract[String],
      location = (j \ "location").extract[String],
      schema = schema,
      partitionColumns = partitionCols,
      currentSnapshotId = (j \ "current-snapshot-id").extractOpt[Long].filter(_ > 0),
      snapshots = snapshots,
      fieldNamesById = fieldNamesById)
  }

  // ---- avro plumbing ----

  private def readAvro(path: String): Seq[GenericRecord] = {
    val rd = new DataFileReader(new java.io.File(path), new GenericDatumReader[GenericRecord]())
    try {
      val buf = Seq.newBuilder[GenericRecord]
      while (rd.hasNext) buf += rd.next()
      buf.result()
    } finally rd.close()
  }

  private def str(r: GenericRecord, f: String): String = {
    val v = r.get(f); if (v == null) null else v.toString
  }
  private def lng(r: GenericRecord, f: String, dflt: Long = 0L): Long =
    if (r.getSchema.getField(f) == null) dflt
    else Option(r.get(f)).map(_.asInstanceOf[Number].longValue).getOrElse(dflt)
  private def intF(r: GenericRecord, f: String, dflt: Int = 0): Int =
    if (r.getSchema.getField(f) == null) dflt
    else Option(r.get(f)).map(_.asInstanceOf[Number].intValue).getOrElse(dflt)

  /** Manifest-list entries for the current snapshot. v1 lists lack the
    * `content`/`sequence_number` columns (data manifests, seq 0). */
  def manifestList(table: Table): Seq[ManifestFile] =
    table.currentSnapshotId match {
      case None => Nil
      case Some(sid) =>
        val ml = table.snapshots.find(_._1 == sid)
          .map(_._3).getOrElse(sys.error(s"snapshot $sid not in metadata"))
        readAvro(table.resolve(ml)).map { r =>
          ManifestFile(str(r, "manifest_path"), lng(r, "manifest_length"),
            intF(r, "content"), lng(r, "sequence_number", 0L))
        }
    }

  /** All manifest entries (data + delete manifests) for the current snapshot. */
  def dataFileEntries(table: Table): Seq[(ManifestFile, DataFileEntry)] =
    manifestList(table).flatMap { mf =>
      readAvro(table.resolve(mf.path)).map { r =>
        val df = r.get("data_file").asInstanceOf[GenericRecord]
        val partition: Map[String, String] = (if (
          df.getSchema.getField("partition") == null) null
        else df.get("partition")) match {
          case pr: GenericRecord =>
            pr.getSchema.getFields.toArray.toSeq.map(_.asInstanceOf[org.apache.avro.Schema.Field])
              .map(f => f.name -> Option(pr.get(f.name)).map(_.toString).orNull).toMap
          case _ => Map.empty
        }
        val eqIds: Seq[Int] =
          if (df.getSchema.getField("equality_ids") == null) Nil
          else df.get("equality_ids") match {
            case l: java.util.List[_] =>
              l.toArray.toSeq.map(_.asInstanceOf[Number].intValue)
            case _ => Nil
          }
        mf -> DataFileEntry(
          status = intF(r, "status"),
          content = if (df.getSchema.getField("content") == null) 0 else intF(df, "content"),
          filePath = str(df, "file_path"),
          fileFormat = str(df, "file_format"),
          recordCount = lng(df, "record_count"),
          partition = partition,
          sequenceNumber = lng(r, "sequence_number", mf.sequenceNumber),
          equalityIds = eqIds)
      }
    }

  /** Live data files, optionally pruned by identity-partition values before
    * the scan exists (manifest-level pruning — the 100 TB planning step). */
  def liveDataFiles(table: Table, partitionFilter: Map[String, String] = Map.empty): Seq[DataFileEntry] = {
    dataFileEntries(table)
      .filter { case (mf, e) => mf.content == 0 && e.status != 2 && e.content == 0 }
      .map(_._2)
      .filter(e => partitionFilter.forall { case (k, v) => e.partition.get(k).contains(v) })
  }

  /** Live v2 delete-file entries (position: content=1, equality: content=2). */
  def liveDeleteFiles(table: Table): Seq[DataFileEntry] =
    dataFileEntries(table)
      .filter { case (_, e) => e.status != 2 && e.content != 0 }
      .map(_._2)

  /** Read an Iceberg table into a DataFrame, applying v2 position and
    * equality deletes (spec §"Row-level deletes").
    *
    * Scale design: delete CONTENT never touches the driver — position
    * deletes are parquet-scanned and anti-joined on (file, pos) using
    * Spark's `_metadata.file_path` / `_metadata.row_index` columns, and
    * equality deletes anti-join on their equality columns, both with the
    * spec's sequence-number ordering (a position delete applies to data
    * sequence <= its own; an equality delete strictly to older data files).
    * Only file PATHS are driver-resident, as in any production reader's
    * planning phase. Tables without deletes keep the plain pruned scan —
    * no metadata columns, no joins. */
  def read(spark: SparkSession, tableRoot: String,
           partitionFilter: Map[String, String] = Map.empty,
           snapshotId: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val loaded = load(tableRoot)
    // time travel: pin the requested snapshot (it must be in the metadata's
    // snapshot log)
    val table = snapshotId.fold(loaded) { sid =>
      require(loaded.snapshots.exists(_._1 == sid),
        s"snapshot $sid not in table metadata " +
          s"(has: ${loaded.snapshots.map(_._1).mkString(", ")})")
      loaded.copy(currentSnapshotId = Some(sid))
    }
    val live = liveDataFiles(table, partitionFilter)
    val files = live.map(e => table.resolve(e.filePath))
    if (files.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], table.schema)
    val plain = spark.read.schema(table.schema).parquet(files: _*)
    val deletes = liveDeleteFiles(table)
    if (deletes.isEmpty) return plain

    // `_metadata.file_path` is a file URI; normalize both sides to a plain
    // absolute path so the join keys agree.
    def normExpr(c: org.apache.spark.sql.Column) =
      regexp_replace(c, "^file:/+", "/")
    val dataCols = table.schema.fieldNames.toSeq
    // (normalized resolved path, stored path, data sequence number) for
    // every live data file — planning-scale rows, broadcast to the join.
    val fileLookup = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(
        live.map(e => Row("/" + table.resolve(e.filePath).dropWhile(_ == '/'),
          e.filePath, e.sequenceNumber))).asJava),
      StructType(Seq(
        StructField("__norm_path", StringType),
        StructField("__stored_path", StringType),
        StructField("__file_seq", LongType))))

    var df = plain
      .withColumn("__file", normExpr(col("_metadata.file_path")))
      .withColumn("__pos", col("_metadata.row_index"))
      .join(broadcast(fileLookup), col("__file") === col("__norm_path"), "left")

    // Position deletes: rows named (file_path, pos), applicable to data
    // files with data sequence <= the delete's. Delete rows naming files
    // outside the live set drop out of the inner join with the lookup.
    val posDeletes = deletes.filter(_.content == 1)
    if (posDeletes.nonEmpty) {
      val posDf = posDeletes
        .groupBy(_.sequenceNumber).toSeq
        .map { case (seq, es) =>
          spark.read.parquet(es.map(e => table.resolve(e.filePath)): _*)
            .select(col("file_path"), col("pos"))
            .withColumn("__del_seq", lit(seq))
        }
        .reduce(_ unionByName _)
        .join(broadcast(fileLookup.withColumnRenamed("__norm_path", "__np")
          .withColumnRenamed("__file_seq", "__fs")),
          col("file_path") === col("__stored_path") && col("__del_seq") >= col("__fs"))
        .select(col("__np").as("__del_path"), col("pos").as("__del_pos"))
      df = df.join(posDf,
        col("__file") === col("__del_path") && col("__pos") === col("__del_pos"),
        "left_anti")
    }

    // Equality deletes: rows match on the delete file's equality columns
    // (null-safe, per spec) and apply to STRICTLY older data files.
    val eqDeletes = deletes.filter(_.content == 2)
    eqDeletes.groupBy(e => (e.sequenceNumber, e.equalityIds)).toSeq
      .sortBy(_._1._1)
      .foreach { case ((seq, ids), es) =>
        val eqCols = ids.map(id => table.fieldNamesById.getOrElse(id,
          sys.error(s"equality delete references unknown field id $id")))
        val delDf = spark.read
          .parquet(es.map(e => table.resolve(e.filePath)): _*)
          .select(eqCols.map(c => col(c).as(s"__eq_$c")): _*)
        val cond = eqCols.map(c => col(c) <=> col(s"__eq_$c"))
          .reduce(_ && _) && col("__file_seq") < lit(seq)
        df = df.join(delDf, cond, "left_anti")
      }

    df.select(dataCols.map(col): _*)
  }

  // ---- metadata TVFs (reference: glaredb_ext_iceberg/src/functions/metadata.rs:36-81) ----

  def metadataDf(spark: SparkSession, tableRoot: String): DataFrame = {
    val t = load(tableRoot)
    spark.createDataFrame(
      java.util.List.of(Row(t.formatVersion, t.tableUuid, t.location)),
      StructType(Seq(
        StructField("format_version", IntegerType),
        StructField("table_uuid", StringType),
        StructField("location", StringType))))
  }

  def snapshotsDf(spark: SparkSession, tableRoot: String): DataFrame = {
    val t = load(tableRoot)
    val rows = t.snapshots.map { case (id, seq, ml) => Row(id, seq, ml) }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("snapshot_id", LongType),
        StructField("sequence_number", LongType),
        StructField("manifest_list", StringType))))
  }

  def manifestListDf(spark: SparkSession, tableRoot: String): DataFrame = {
    val t = load(tableRoot)
    val rows = manifestList(t).map { m =>
      Row(m.path, m.length, if (m.content == 0) "data" else "deletes", m.sequenceNumber)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("manifest_path", StringType),
        StructField("manifest_length", LongType),
        StructField("content", StringType),
        StructField("sequence_number", LongType))))
  }

  def dataFilesDf(spark: SparkSession, tableRoot: String): DataFrame = {
    val t = load(tableRoot)
    val statusNames = Array("EXISTING", "ADDED", "DELETED")
    val contentNames = Array("DATA", "POSITION_DELETES", "EQUALITY_DELETES")
    val rows = dataFileEntries(t).map { case (_, e) =>
      Row(statusNames(e.status), contentNames(e.content), e.filePath,
        e.fileFormat, e.recordCount)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("status", StringType),
        StructField("content", StringType),
        StructField("file_path", StringType),
        StructField("file_format", StringType),
        StructField("record_count", LongType))))
  }
}
