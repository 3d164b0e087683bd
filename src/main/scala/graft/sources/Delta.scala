package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Native Delta Lake read path — `_delta_log` replay with no connector jars.
  *
  * Mirrors the reference's read-only Delta skeleton
  * (glaredb_ext_delta/src/protocol/snapshot.rs:13-100 — action reconciliation
  * per the public Delta PROTOCOL.md): the table state is the latest `metaData`
  * action plus the set of `add` files not cancelled by a later `remove`.
  *
  * Spark-first design:
  *  - log replay is driver-side metadata work (a few KB per commit), exactly
  *    like every production Delta reader; the DATA scan is a plain
  *    `spark.read.parquet(files…)`, so column pruning / filter pushdown /
  *    whole-stage codegen all apply unchanged at 100 TB.
  *  - `_last_checkpoint` + checkpoint-parquet are honored, so a long-lived
  *    table with thousands of commits costs one distributed parquet read of
  *    the checkpoint plus the JSON tail — not a replay of every commit.
  *  - partition columns are not stored in the data files (Delta protocol);
  *    they are injected as per-file-group literals from `partitionValues`,
  *    preserving partition pruning (each group is one `lit()`-tagged scan).
  */
object Delta {

  final case class AddFile(path: String, partitionValues: Map[String, Option[String]])

  final case class Snapshot(
      schema: StructType,
      partitionColumns: Seq[String],
      files: Seq[AddFile],
      version: Long)

  private implicit val formats: Formats = DefaultFormats

  /** Parse one log line (a single JSON action record). */
  private def parseActions(line: String): Option[(String, JValue)] = {
    if (line.trim.isEmpty) None
    else {
      val j = JsonMethods.parse(line)
      j match {
        case JObject(fields) =>
          fields.collectFirst {
            case (k @ ("add" | "remove" | "metaData"), v) => (k, v)
          }
        case _ => None
      }
    }
  }

  private def partitionValuesOf(v: JValue): Map[String, Option[String]] =
    v \ "partitionValues" match {
      case JObject(kvs) =>
        kvs.map {
          case (k, JString(s)) => k -> Some(s)
          case (k, _)          => k -> None
        }.toMap
      case _ => Map.empty
    }

  /** Reconstruct a snapshot of a Delta table from its log — the CURRENT
    * one, or (time travel) the state as of commit `versionAsOf`. */
  def snapshot(spark: SparkSession, tablePath: String,
               versionAsOf: Option[Long] = None): Snapshot = {
    val logDir = new Path(tablePath, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(logDir), s"not a Delta table (no _delta_log): $tablePath")

    val entries = fs.listStatus(logDir).map(_.getPath.getName)
    val allJsonVersions = entries.collect {
      case n if n.matches("\\d{20}\\.json") => n.stripSuffix(".json").toLong
    }.sorted
    versionAsOf.foreach { v =>
      val latest = allJsonVersions.lastOption.getOrElse(-1L)
      if (v > latest)
        throw new IllegalArgumentException(
          s"cannot time travel Delta table to version $v: latest is $latest")
    }
    val jsonVersions =
      versionAsOf.fold(allJsonVersions)(v => allJsonVersions.filter(_ <= v))

    // _last_checkpoint names the newest checkpoint; replay resumes after
    // it. Time travel can only use it when it predates the target version
    // (else replay from the JSON commits alone — and fail loudly if the
    // early commits were vacuumed away).
    val checkpointVersion: Option[Long] = {
      val lc = new Path(logDir, "_last_checkpoint")
      val cv = if (fs.exists(lc)) {
        val in = fs.open(lc)
        val txt =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        (JsonMethods.parse(txt) \ "version").extractOpt[Long]
      } else None
      versionAsOf match {
        case Some(v) =>
          val usable = cv.filter(_ <= v)
          if (usable.isEmpty && jsonVersions.headOption.exists(_ > 0))
            throw new IllegalArgumentException(
              s"cannot time travel Delta table to version $v: commits " +
                s"before ${jsonVersions.head} are gone and the checkpoint " +
                s"(${cv.getOrElse(-1L)}) is newer than $v")
          usable
        case None => cv
      }
    }

    var schema: Option[StructType] = None
    var partitionCols: Seq[String] = Nil
    val adds = scala.collection.mutable.LinkedHashMap[String, AddFile]()

    def applyMeta(v: JValue): Unit = {
      (v \ "schemaString").extractOpt[String].foreach { ss =>
        schema = Some(DataType.fromJson(ss).asInstanceOf[StructType])
      }
      v \ "partitionColumns" match {
        case JArray(xs) => partitionCols = xs.collect { case JString(s) => s }
        case _          =>
      }
    }

    def applyAction(kind: String, v: JValue): Unit = kind match {
      case "metaData" => applyMeta(v)
      case "add" =>
        val p = (v \ "path").extract[String]
        adds(p) = AddFile(p, partitionValuesOf(v))
      case "remove" =>
        adds.remove((v \ "path").extract[String])
      case _ =>
    }

    // Seed from the checkpoint parquet (distributed read), if one exists.
    checkpointVersion.foreach { cv =>
      val ckFile = new Path(logDir, f"$cv%020d.checkpoint.parquet")
      val ck = spark.read.parquet(ckFile.toString)
      val cols = ck.columns.toSet
      if (cols.contains("metaData")) {
        ck.select(col("metaData.schemaString"), col("metaData.partitionColumns"))
          .where(col("metaData").isNotNull)
          .collect()
          .foreach { r =>
            schema = Some(DataType.fromJson(r.getString(0)).asInstanceOf[StructType])
            partitionCols = r.getSeq[String](1)
          }
      }
      if (cols.contains("add")) {
        val hasPv = ck.select("add.*").columns.contains("partitionValues")
        val sel =
          if (hasPv) ck.select(col("add.path"), col("add.partitionValues"))
          else ck.select(col("add.path"), lit(null).as("partitionValues"))
        val addDf = sel.where(col("path").isNotNull)
        // The live file list necessarily lands on the driver — it feeds
        // `spark.read.parquet(files…)` (Delta's own reader holds it in a
        // custom FileIndex, same driver residency). A checkpoint already
        // carries the RECONCILED state, so this is the live set, not the
        // full history — but a 10M-file table would still be ~GBs of
        // paths. Count first (distributed, cheap) and fail with a clear
        // message instead of an opaque driver OOM.
        val maxFiles = spark.conf.getOption("graft.delta.maxCheckpointFiles")
          .map(_.toLong).getOrElse(10000000L)
        val n = addDf.count()
        if (n > maxFiles)
          throw new UnsupportedOperationException(
            s"Delta checkpoint lists $n live files (> $maxFiles); reading " +
              "a table this large needs a streaming FileIndex — raise " +
              "graft.delta.maxCheckpointFiles only with driver memory to match")
        addDf.collect().foreach { r =>
          val pv: Map[String, Option[String]] =
            if (r.isNullAt(1)) Map.empty
            else r.getMap[String, String](1).toMap.map { case (k, x) => k -> Option(x) }
          adds(r.getString(0)) = AddFile(r.getString(0), pv)
        }
      }
    }

    val tail = checkpointVersion match {
      case Some(cv) => jsonVersions.filter(_ > cv)
      case None     => jsonVersions
    }
    tail.foreach { v =>
      val f = new Path(logDir, f"$v%020d.json")
      val in = fs.open(f)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      txt.split('\n').foreach { line =>
        parseActions(line).foreach { case (k, j) => applyAction(k, j) }
      }
    }

    val ver = jsonVersions.lastOption.orElse(checkpointVersion).getOrElse(0L)
    Snapshot(
      schema.getOrElse(sys.error(s"Delta log has no metaData action: $tablePath")),
      partitionCols,
      adds.values.toSeq,
      ver)
  }

  /** Read a Delta table into a DataFrame (read_delta TVF / path-as-table);
    * `versionAsOf` time-travels to that commit's state. */
  def read(spark: SparkSession, tablePath: String,
           versionAsOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, tablePath, versionAsOf)
    val root = new Path(tablePath)

    def abs(p: String): String = {
      val path = new Path(p)
      if (path.isAbsolute || p.contains("://")) p else new Path(root, p).toString
    }

    val dataSchema = StructType(
      snap.schema.fields.filterNot(f => snap.partitionColumns.contains(f.name)))
    val partFields = snap.partitionColumns.map(c => snap.schema(c))

    if (snap.files.isEmpty) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    } else if (snap.partitionColumns.isEmpty) {
      spark.read.schema(dataSchema).parquet(snap.files.map(f => abs(f.path)): _*)
    } else {
      // One scan per distinct partition tuple; the partition values become
      // literal columns (pruned for free when a filter hits them).
      val groups = snap.files.groupBy(_.partitionValues)
      groups.toSeq
        .map { case (pv, fs) =>
          val base = spark.read.schema(dataSchema).parquet(fs.map(f => abs(f.path)): _*)
          partFields.foldLeft(base) { (df, field) =>
            val raw = pv.getOrElse(field.name, None).orNull
            df.withColumn(field.name, lit(raw).cast(field.dataType))
          }
        }
        .reduce(_ unionByName _)
        .select(snap.schema.fieldNames.map(col).toIndexedSeq: _*)
    }
  }
}
