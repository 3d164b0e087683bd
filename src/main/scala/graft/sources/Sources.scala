package graft.sources

import graft.QueryDsl._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink coverage (SURVEY.md §2.2): read_csv (with inference),
  * read_text (wholetext), glob listing, path-as-table resolver sugar, and
  * the catalog listing TVFs.
  *
  * CSV/text inputs are produced inside the repo's target dir from the
  * parquet fixtures (the fixtures are read-only), then read back through the
  * real Spark source — the oracle checks the values that round-tripped.
  */
object Sources {

  private def tmpDir(name: String): String = {
    val d = new java.io.File(s"target/tmp_sources/$name")
    d.mkdirs()
    d.getAbsolutePath
  }

  val queries: Map[String, Q] = Map(
    // read_csv with dialect + inference (glaredb_ext_csv read_csv.rs:34,
    // schema.rs:33): parquet -> csv -> inferred read -> aggregate.
    "s01_read_csv" -> { (s, dir) =>
      val out = tmpDir("region_csv")
      t(s, dir, "region").coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(out)
      s.read.option("header", "true").option("inferSchema", "true").csv(out)
        .agg(count(lit(1)).as("n"),
          min(col("r_name")).as("first_region"),
          max(col("r_regionkey")).cast(IntegerType).as("max_key"))
    },

    // NDJSON round trip: events -> line-delimited JSON (the interchange
    // format most training corpora actually arrive in) -> schema'd read
    // back. Timestamp survives as ISO-8601 text; parse it back to
    // TIMESTAMP_NTZ µs to prove the read path is lossless.
    "s09_read_json" -> { (s, dir) =>
      val out = tmpDir("events_json")
      // default JSON timestamp format truncates to millis — keep the µs
      val usFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
      t(s, dir, "events").coalesce(1).write.mode("overwrite")
        .option("timestampNTZFormat", usFmt).json(out)
      s.read
        .schema("event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, " +
          "event_type STRING, value DOUBLE, props STRING")
        .option("timestampNTZFormat", usFmt)
        .json(out)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          min(unix_micros(col("ts").cast(TimestampType))).as("first_us"),
          max(unix_micros(col("ts").cast(TimestampType))).as("last_us"),
          sumd(dmoney(col("value"))).as("total_value"))
        .orderBy("event_type")
    },

    // read_csv dialect options (glaredb_ext_csv dialect.rs): custom
    // delimiter + quote, explicit schema.
    "s07_read_csv_dialect" -> { (s, dir) =>
      val out = tmpDir("nation_csv_semi")
      t(s, dir, "nation").coalesce(1).write.mode("overwrite")
        .option("header", "true").option("delimiter", ";").option("quote", "'")
        .csv(out)
      s.read.option("header", "true").option("delimiter", ";").option("quote", "'")
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .csv(out)
        .orderBy("n_nationkey")
    },

    // read_text: whole file as a single row (read_text.rs:28).
    "s02_read_text" -> { (s, dir) =>
      val out = tmpDir("text_in")
      val f = new java.io.File(out, "doc.txt")
      java.nio.file.Files.writeString(f.toPath, "hello graft\nsecond line\n")
      s.read.option("wholetext", "true").text(out)
        .select(length(col("value")).as("len"),
          size(split(col("value"), "\n")).as("n_lines"))
    },

    // glob(pattern): list matching files (functions/table/builtin/glob.rs:20).
    "s03_glob" -> { (s, dir) =>
      import s.implicits._
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      val files = fs.globStatus(new org.apache.hadoop.fs.Path(s"$dir/*.parquet"))
        .map(st => st.getPath.getName).sorted.toSeq
      files.toDF("file_name").orderBy("file_name")
    },

    // Path-as-table resolver sugar: FROM '<path>'
    // (logical/resolver/resolve_normal.rs:255-276).
    "s04_path_as_table" -> { (s, dir) =>
      GraftSession.sql(s,
        s"SELECT count(*) AS n, min(l_orderkey) AS min_key FROM '$dir/lineitem.parquet'")
    },

    // read_parquet(...) TVF (glaredb_ext_parquet functions/scan.rs:33).
    "s05_read_parquet_tvf" -> { (s, dir) =>
      GraftSession.sql(s,
        s"""SELECT o_orderstatus, count(*) AS n
            FROM read_parquet('$dir/orders.parquet')
            GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    },

    // DataSourceV2 scan extension (TableScanFunction parity): partitioned
    // series source with projection pushdown.
    "s08_dsv2_series" -> { (s, dir) =>
      s.read.format("graft.sources.seriesv2.SeriesSource")
        .option("start", "1").option("end", "1001").option("partitions", "8")
        .load()
        .filter(col("id") % 9 === 0)
        .select(col("id"), col("id_sq"))
        .orderBy("id")
    },

    // Catalog listing (list_tables / memory_scan family,
    // functions/table/builtin/list_entries.rs): temp views in the session.
    "s06_list_tables" -> { (s, dir) =>
      import s.implicits._
      graft.Engine.registerAll(s, dir)
      s.catalog.listTables().collect()
        .filter(_.isTemporary).map(_.name)
        .filter(graft.Engine.tableNames.contains).sorted.toSeq
        .toDF("table_name").orderBy("table_name")
    })

  val oracles: Map[String, String] = Map(
    "s01_read_csv" -> """
      SELECT COUNT(*) AS n, MIN(r_name) AS first_region,
             CAST(MAX(r_regionkey) AS INT) AS max_key
      FROM region""",

    "s09_read_json" -> s"""
      SELECT event_type, COUNT(*) AS n,
             MIN(epoch_us(ts)) AS first_us, MAX(epoch_us(ts)) AS last_us,
             ${graft.QueryDsl.sql.sumd(graft.QueryDsl.sql.dmoney("value"))}
               AS total_value
      FROM events GROUP BY event_type ORDER BY event_type""",

    "s02_read_text" -> """
      SELECT CAST(24 AS INT) AS len, CAST(3 AS INT) AS n_lines""",

    "s07_read_csv_dialect" -> """
      SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey""",

    "s03_glob" -> """
      SELECT file_name FROM (VALUES
        ('customer.parquet'), ('documents.parquet'), ('embeddings.parquet'),
        ('events.parquet'), ('lineitem.parquet'), ('nation.parquet'),
        ('orders.parquet'), ('part.parquet'), ('region.parquet'),
        ('supplier.parquet')) t(file_name)
      ORDER BY file_name""",

    "s08_dsv2_series" -> """
      SELECT CAST(range AS BIGINT) AS id, CAST(range * range AS BIGINT) AS id_sq
      FROM RANGE(1, 1001) WHERE range % 9 = 0 ORDER BY id""",

    "s04_path_as_table" -> """
      SELECT count(*) AS n, CAST(MIN(l_orderkey) AS BIGINT) AS min_key
      FROM lineitem""",

    "s05_read_parquet_tvf" -> """
      SELECT o_orderstatus, count(*) AS n
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "s06_list_tables" -> """
      SELECT table_name FROM (VALUES
        ('customer'), ('documents'), ('embeddings'), ('events'), ('lineitem'),
        ('nation'), ('orders'), ('part'), ('region'), ('supplier')) t(table_name)
      ORDER BY table_name""")
}
