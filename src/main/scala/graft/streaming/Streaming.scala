package graft.streaming

import graft.QueryDsl._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming operators — additive capability (SURVEY.md: the
  * reference has no stream processing; `operators/results/streaming.rs` is
  * just async result delivery).
  *
  * st01 runs a real streaming query: events parquet consumed through
  * `readStream`, watermarked event-time tumbling-window aggregation,
  * complete-mode memory sink, drained synchronously with
  * `processAllAvailable`. The result is deterministic, so it carries a full
  * DuckDB oracle — the streaming plan must agree with the batch semantics.
  */
object Streaming {

  /** Streaming file sources need a directory: stage the events parquet
    * into a per-sf temp dir under target/. */
  private def stageDir(dir: String): String = {
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val d = new java.io.File(s"target/tmp_stream/$tag")
    d.mkdirs()
    val dst = new java.io.File(d, "events.parquet")
    if (!dst.exists()) {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"), dst.toPath)
    }
    d.getAbsolutePath
  }

  val queries: Map[String, Q] = Map(
    "st01_stream_hourly" -> { (s, dir) =>
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      val sinkName = "st01_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val stream = s.readStream.schema(schema)
        .parquet(stageDir(dir))
        .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
        .withWatermark("event_time", "1 hour")
        .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumd(dmoney(col("value"))).as("total_value"))
      val q = stream.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(sinkName)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      s.table(sinkName)
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n"), col("total_value"))
        .orderBy("w_start", "event_type")
    },

    // Stateful streaming: per-user running totals via the same micro-batch
    // pipeline, update-mode — demonstrates stateful agg; rows-only check.
    "st02_stream_user_totals" -> { (s, dir) =>
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      val sinkName = "st02_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = s.readStream.schema(schema)
        .parquet(stageDir(dir))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), sumd(dmoney(col("value"))).as("total_value"))
        .writeStream.outputMode("complete").format("memory").queryName(sinkName)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      s.table(sinkName).orderBy("user_id")
    })

  val oracles: Map[String, String] = Map(
    // Window start = hour-aligned epoch; reconstruct via make_timestamp(µs).
    "st01_stream_hourly" -> s"""
      SELECT make_timestamp((epoch_ns(ts) // 3600000000000) * 3600000000) AS w_start,
        event_type, COUNT(*) AS n,
        ${sql.sumd(sql.dmoney("value"))} AS total_value
      FROM events
      GROUP BY w_start, event_type
      ORDER BY w_start, event_type""",

    "st02_stream_user_totals" -> s"""
      SELECT user_id, COUNT(*) AS n_events,
        ${sql.sumd(sql.dmoney("value"))} AS total_value
      FROM events
      GROUP BY user_id
      ORDER BY user_id""")
}
