package graft.queries

import org.apache.spark.sql.functions._

/** Batch twins of the streaming semantics (SURVEY.md §2.9): the
  * reference's "daily rollup" is a tumbling window computed offline;
  * here the same shape at hourly grain over the `events` stream table.
  * The true streaming path (readStream + watermark + window) lives in
  * graft.streaming and is exercised by ScalaTest with MemoryStream —
  * batch/streaming share the same aggregation expressions.
  *
  * The hour bucket is emitted as a STRING (engine-specific timestamp
  * formatting differs; a formatted string hash-compares cleanly).
  */
object EventQueries {

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q50_hourly_events",
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy(
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00")
              .as("hour_str"),
            col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            round(sum(col("value")), 2).as("total_value"),
            count_distinct(col("user_id")).as("n_users"))
          .orderBy(col("hour_str"), col("event_type")),
      Some("""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_str,
               event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS total_value,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1, 2
        ORDER BY hour_str, event_type"""),
      headline = true),

    QueryDef(
      "q51_sessionize",
      (s, dir) => {
        // session = gap > 30 min per user; session bounds + stats.
        // Window-function sessionization: lag → gap flag → running sum
        // as session id. Two window passes over the same (user_id, ts)
        // sort order — Catalyst reuses one shuffle+sort for both.
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        Tables.load(s, dir, "events")
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("new_sess",
            when(col("prev_ts").isNull
              || unix_millis(col("ts")) - unix_millis(col("prev_ts")) > 1800000L,
              lit(1L)).otherwise(lit(0L)))
          .withColumn("session_id", sum(col("new_sess")).over(byUser))
          .groupBy(col("user_id"), col("session_id"))
          .agg(
            count(lit(1)).as("n_events"),
            round(sum(col("value")), 2).as("session_value"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""
        WITH g AS (
          SELECT user_id, event_id, value, ts,
                 LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts
          FROM events),
        f AS (
          SELECT user_id, event_id, value,
                 CASE WHEN prev_ts IS NULL
                        OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000
                      THEN 1 ELSE 0 END AS new_sess
          FROM g),
        sess AS (
          SELECT user_id, value,
                 CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_id
          FROM f)
        SELECT user_id, session_id,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS session_value
        FROM sess
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id"""))
  )
}
