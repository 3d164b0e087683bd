package graft.queries

import graft.QueryDsl._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ClickBench-style aggregation shapes over `events` (the reference's
  * second benchmark family, `bench/clickbench/` q00-q42 over `hits`):
  * full-scan counts, distinct users, top-k heavy hitters, time histograms,
  * pattern filters, and multi-column grouped top-k — the scan-and-aggregate
  * patterns that dominate log analytics at 100 TB. All oracle-checked.
  */
object ClickBenchShapes {

  private val HourUs = 3600L * 1000 * 1000
  private val DayUs = 24L * HourUs

  val queries: Map[String, Q] = Map(
    "cb01_count" -> { (s, dir) =>
      t(s, dir, "events").agg(count(lit(1)).as("n"))
    },

    "cb02_distinct_users" -> { (s, dir) =>
      t(s, dir, "events")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
    },

    "cb03_avg_by_type" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sumd(dmoney(col("value"))).as("total_value"),
          (sumd(dmoney(col("value"))) / count(lit(1))).as("avg_value"))
        .orderBy("event_type")
    },

    "cb04_top_users" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(sumd(dmoney(col("value"))).as("total_value"),
          count(lit(1)).as("n"))
        .orderBy(desc("total_value"), asc("user_id"))
        .limit(10)
    },

    "cb05_daily_histogram" -> { (s, dir) =>
      t(s, dir, "events")
        .withColumn("ts_us", tsUs())
        .groupBy(expr(s"ts_us DIV $DayUs").as("day_bucket"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("day_bucket")
    },

    "cb06_pattern_filter" -> { (s, dir) =>
      t(s, dir, "events")
        .filter(col("props").like("%\"k\": 1%") && col("event_type") =!= "error")
        .agg(count(lit(1)).as("n"), sumd(dmoney(col("value"))).as("total_value"))
    },

    "cb07_type_hour_topk" -> { (s, dir) =>
      t(s, dir, "events")
        .withColumn("ts_us", tsUs())
        .groupBy(col("event_type"), expr(s"ts_us DIV $HourUs").as("hour_bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("event_type"), asc("hour_bucket"))
        .limit(25)
    },

    "cb08_distinct_pairs" -> { (s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"), col("user_id")).distinct()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_distinct_users"))
        .orderBy("event_type")
    })

  val oracles: Map[String, String] = Map(
    "cb01_count" -> "SELECT COUNT(*) AS n FROM events",

    "cb02_distinct_users" -> """
      SELECT COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
      FROM events""",

    "cb03_avg_by_type" -> s"""
      SELECT event_type, COUNT(*) AS n,
        ${sql.sumd(sql.dmoney("value"))} AS total_value,
        ${sql.sumd(sql.dmoney("value"))} / COUNT(*) AS avg_value
      FROM events GROUP BY event_type ORDER BY event_type""",

    "cb04_top_users" -> s"""
      SELECT user_id, ${sql.sumd(sql.dmoney("value"))} AS total_value,
             COUNT(*) AS n
      FROM events GROUP BY user_id
      ORDER BY total_value DESC, user_id ASC LIMIT 10""",

    "cb05_daily_histogram" -> s"""
      SELECT epoch_us(ts) // $DayUs AS day_bucket, COUNT(*) AS n,
             COUNT(DISTINCT user_id) AS n_users
      FROM events GROUP BY day_bucket ORDER BY day_bucket""",

    "cb06_pattern_filter" -> s"""
      SELECT COUNT(*) AS n, ${sql.sumd(sql.dmoney("value"))} AS total_value
      FROM events
      WHERE props LIKE '%"k": 1%' AND event_type <> 'error'""",

    "cb07_type_hour_topk" -> s"""
      SELECT event_type, epoch_us(ts) // $HourUs AS hour_bucket, COUNT(*) AS n
      FROM events GROUP BY event_type, hour_bucket
      ORDER BY n DESC, event_type ASC, hour_bucket ASC LIMIT 25""",

    "cb08_distinct_pairs" -> """
      SELECT event_type, COUNT(*) AS n_distinct_users
      FROM (SELECT DISTINCT event_type, user_id FROM events) p
      GROUP BY event_type ORDER BY event_type""")
}
