package graft.operators

import graft.QueryDsl._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream batch operators over `events` (ts = TIMESTAMP_NTZ with
  * microsecond precision in the fixtures; converted once to epoch-µs longs
  * via [[graft.QueryDsl.tsUs]]).
  *
  * All time arithmetic is integer microsecond math: exact, portable (the
  * DuckDB oracle uses epoch_us), and immune to double precision loss.
  * Sessionization is the standard lag-gap-flag + running-sum pattern: one
  * shuffle on user_id, then two ordered window passes within each partition.
  */
object Events {

  private val GapUs = 30L * 60 * 1000 * 1000 // 30 min session gap (microseconds)
  private val HourUs = 3600L * 1000 * 1000

  val queries: Map[String, Q] = Map(
    "e01_sessionize" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val sessions = t(s, dir, "events")
        .withColumn("ts_us", tsUs())
        .withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > GapUs, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sessions.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("t_start"),
          max(col("ts_us")).as("t_end"),
          sumd(dmoney(col("value"))).as("total_value"))
        .withColumn("session_id", col("session_id").cast(IntegerType))
        .orderBy("user_id", "session_id")
    },

    "e02_tumbling_hour" -> { (s, dir) =>
      t(s, dir, "events")
        .withColumn("ts_us", tsUs())
        .groupBy(expr(s"ts_us DIV $HourUs").as("hour_bucket"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sumd(dmoney(col("value"))).as("total_value"))
        .orderBy("hour_bucket", "event_type")
    },

    "e03_funnel" -> { (s, dir) =>
      val perUser = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "signup", tsUs())).as("signup_ts"),
          min(when(col("event_type") === "purchase", tsUs())).as("purchase_ts"),
          count(lit(1)).as("n_events"))
      perUser.agg(
        count(lit(1)).as("n_users"),
        count(col("signup_ts")).as("n_signup"),
        count(when(col("purchase_ts") > col("signup_ts"), 1)).as("n_converted"))
    },

    // AS-OF join — attribute each purchase to the latest click at or
    // before it per user (the canonical last-touch attribution shape; the
    // oracle is DuckDB's native ASOF LEFT JOIN). Spark has no asof
    // operator, and the naive `l JOIN r ON key AND r.ts <= l.ts` + argmax
    // explodes quadratically per key. The scalable form is the union-tag
    // merge: tag both sides, sort by (key, ts, side) in ONE shuffle, and
    // carry the right side forward with last(ignoreNulls) — right rows
    // sort before left at equal ts, giving the >= semantics. Cost is one
    // shuffle + one ordered pass regardless of per-key event counts. The
    // right side is pre-reduced to one row per (user, ts) so ties are
    // deterministic in both engines.
    "e04_asof_join" -> { (s, dir) =>
      // epoch-µs on both sides (same device as e01).
      val ev = t(s, dir, "events").withColumn("ts_us", tsUs())
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts_us").as("ts"))
        .agg(max(col("event_id")).as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("ts"), col("event_id"))
      val tagged = clicks
        .select(col("user_id"), col("ts"), lit(0).as("side"),
          col("click_id"), lit(null).cast(LongType).as("event_id"))
        .unionByName(purchases.select(col("user_id"), col("ts"),
          lit(1).as("side"), lit(null).cast(LongType).as("click_id"),
          col("event_id")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("last_click_id",
          last(col("click_id"), ignoreNulls = true).over(w))
        .withColumn("last_click_ts",
          last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("last_click_ts").as("click_ts"),
          col("last_click_id").as("click_id"))
        .orderBy("event_id")
    },

    // RANGE (interval) join — events falling inside global time windows,
    // with NO equi-key. Spark's native plan for `ts BETWEEN lo AND hi` is
    // a broadcast-nested-loop (O(events × windows) compares — dead at
    // 100 TB). The scale path is bucketization: pick a bucket width, tag
    // each event with its bucket (one value), EXPLODE each window across
    // the buckets it spans (span/width rows), and equi-join on the bucket
    // before the exact BETWEEN filter. The nested loop becomes a hash join
    // whose duplication factor is bounded by span/width; each (event,
    // window) pair meets in exactly ONE bucket (the event's), so no
    // dedup pass is needed. Bucket width = the median window span is the
    // rule of thumb; here windows span 1 h and buckets are 10 min.
    "e05_range_join" -> { (s, dir) =>
      val BucketUs = 10L * 60 * 1000 * 1000 // 10 min
      val ev = t(s, dir, "events").withColumn("ts_us", tsUs())
      // deterministic synthetic windows: one per 17th purchase, ±30 min
      val windows = ev.filter(col("event_type") === "purchase" &&
          col("event_id") % 17 === 0)
        .select(col("event_id").as("window_id"),
          (col("ts_us") - GapUs).as("lo"), (col("ts_us") + GapUs).as("hi"))
      val wb = windows.withColumn("bucket",
        explode(sequence(expr(s"lo DIV $BucketUs"), expr(s"hi DIV $BucketUs"))))
      val eb = ev.withColumn("bucket", expr(s"ts_us DIV $BucketUs"))
      eb.join(wb, eb("bucket") === wb("bucket") &&
          col("ts_us").between(col("lo"), col("hi")))
        .groupBy(col("window_id"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sumd(dmoney(col("value"))).as("total_value"))
        .orderBy("window_id")
    })

  val oracles: Map[String, String] = Map(
    "e01_sessionize" -> s"""
      WITH flagged AS (
        SELECT user_id, event_id, epoch_us(ts) AS tsn, value,
          CASE WHEN LAG(epoch_us(ts), 1) OVER w IS NULL
                 OR epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w > $GapUs
               THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      sessions AS (
        SELECT user_id, value, tsn,
          SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tsn, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged)
      SELECT user_id, CAST(session_id AS INT) AS session_id,
        COUNT(*) AS n_events,
        CAST(MIN(tsn) AS BIGINT) AS t_start,
        CAST(MAX(tsn) AS BIGINT) AS t_end,
        ${sql.sumd(sql.dmoney("value"))} AS total_value
      FROM sessions
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id""",

    "e02_tumbling_hour" -> s"""
      SELECT epoch_us(ts) // $HourUs AS hour_bucket, event_type,
        COUNT(*) AS n,
        ${sql.sumd(sql.dmoney("value"))} AS total_value
      FROM events
      GROUP BY hour_bucket, event_type
      ORDER BY hour_bucket, event_type""",

    "e03_funnel" -> """
      WITH per_user AS (
        SELECT user_id,
          MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS signup_ts,
          MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS purchase_ts
        FROM events GROUP BY user_id)
      SELECT COUNT(*) AS n_users,
        COUNT(signup_ts) AS n_signup,
        COUNT(CASE WHEN purchase_ts > signup_ts THEN 1 END) AS n_converted
      FROM per_user""",

    "e04_asof_join" -> """
      WITH c AS (
        SELECT user_id, epoch_us(ts) AS ts, MAX(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts)),
      p AS (
        SELECT user_id, epoch_us(ts) AS ts, event_id
        FROM events WHERE event_type = 'purchase')
      SELECT p.event_id, p.user_id, p.ts,
        c.ts AS click_ts, c.click_id
      FROM p ASOF LEFT JOIN c
        ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.event_id""",

    // DuckDB plans the BETWEEN predicate natively (IEJoin); values must
    // equal the bucketized Spark plan exactly.
    "e05_range_join" -> s"""
      WITH ev AS (
        SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
        FROM events),
      w AS (
        SELECT event_id AS window_id, ts_us - $GapUs AS lo, ts_us + $GapUs AS hi
        FROM ev WHERE event_type = 'purchase' AND event_id % 17 = 0)
      SELECT w.window_id, COUNT(*) AS n_events,
        COUNT(DISTINCT e.user_id) AS n_users,
        ${sql.sumd(sql.dmoney("e.value"))} AS total_value
      FROM w JOIN ev e ON e.ts_us BETWEEN w.lo AND w.hi
      GROUP BY w.window_id ORDER BY window_id""")
}
