package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Event-time operators over the `events` table.
  *
  * Everything is keyed by `user_id`: one shuffle partitions the stream
  * per user, then windows run within partitions. The same keying is
  * what the streaming twin (graft.streaming) uses for its state store,
  * so batch and streaming scale identically — state and compute are
  * both sharded by the user key, and 100 TB of events is just more
  * user partitions.
  *
  * Timestamps are reduced to epoch milliseconds (`unix_millis`) so the
  * arithmetic is integer-exact and hashes identically in the DuckDB
  * oracle (`epoch_ms`).
  */
object Sessionize {

  val SessionGapMs: Long = 30L * 60 * 1000

  /** Q14: gap-based sessionization — a new session starts when a user
    * is idle > 30 min. lag → session-start flags → running sum assigns
    * session ids; then one grouped agg per (user, session). */
  def q14Sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
    Tables.eventsWithMs(s, dir)
      .select($"user_id", $"event_id", $"ms", $"value")
      .withColumn("prev_ms", lag($"ms", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_ms".isNull || $"ms" - $"prev_ms" > SessionGapMs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum($"new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
           min($"ms").as("start_ms"),
           max($"ms").as("end_ms"),
           round(sum($"value"), 2).as("total_value"))
      .orderBy($"user_id", $"session_id")
  }

  /** Q83: TOP USER JOURNEYS — the most common ordered event-type
    * paths (first 5 events of each q14 session, joined with '>'), the
    * "how do users actually move through the product" table every
    * product-analytics stack serves. Same gap sessionization as q14,
    * then the path string builds from a per-session sorted collect
    * (sort key (ms, event_id) is unique per event, so the array_sort
    * is total and engine-reproducible), counts aggregate on the path
    * key, top-25 by (count desc, path asc) — a TakeOrdered, never a
    * global sort.
    *
    * Shape at scale: the rn ≤ 5 cut happens inside the per-user
    * window BEFORE the collect, so a bot session contributes 5 rows
    * to the path build no matter its length; the path aggregate is
    * map-side partial on a low-cardinality key (distinct journey
    * strings), and everything upstream rides q14's one user-keyed
    * shuffle. */
  def q83TopPaths(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    q83AllPaths(s, dir)
      .orderBy($"n_sessions".desc, $"path")
      .limit(25)
  }

  /** The full path-frequency table (q83 before its top-25 cut) — the
    * spec checks Σ n_sessions == q14's session count on it. */
  private[graft] def q83AllPaths(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
    val sess = Tables.eventsWithMs(s, dir)
      .select($"user_id", $"event_id", $"ms", $"event_type")
      .withColumn("prev_ms", lag($"ms", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_ms".isNull || $"ms" - $"prev_ms" > SessionGapMs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum($"new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id", $"session_id").orderBy($"ms", $"event_id")))
      .filter($"rn" <= 5)
    sess.groupBy($"user_id", $"session_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct($"ms", $"event_id", $"event_type"))),
          x => x.getField("event_type")), ">").as("path"))
      .groupBy($"path").agg(count(lit(1)).as("n_sessions"))
  }

  /** ST1 (batch twin of the streaming job): tumbling 1-hour window
    * aggregate per event type. Bucketing on integer-divided epoch ms
    * keeps the group key exact. */
  def st1WindowAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.eventsWithMs(s, dir)
      .select(expr("ms div 3600000L").as("hour_bucket"),
              $"event_type", $"value")
      .groupBy($"hour_bucket", $"event_type")
      .agg(count(lit(1)).as("n"),
           round(sum($"value"), 2).as("total_value"))
      .orderBy($"hour_bucket", $"event_type")
  }

  /** ST2 (batch twin): SLIDING 1-hour windows every 15 minutes — each
    * event lands in 4 overlapping windows, the moving-dashboard shape
    * tumbling windows can't express. Uses Spark's native `window()`
    * (the same operator the streaming twin runs), keyed back to exact
    * epoch-ms starts; the oracle mirrors the assignment as integer
    * arithmetic (4 generated starts per event). The ×4 row expansion
    * is the operator's inherent cost and happens map-side before the
    * one grouped shuffle. */
  def st2SlidingWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.eventsWithMs(s, dir)
      .withColumn("ts", timestamp_millis($"ms"))
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"),
           round(sum($"value"), 2).as("total_value"))
      .select(unix_millis($"window.start").as("win_start_ms"),
        $"event_type", $"n", $"total_value")
      .orderBy($"win_start_ms", $"event_type")
  }
}
