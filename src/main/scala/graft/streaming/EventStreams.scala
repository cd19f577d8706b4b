package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event operators.
  *
  * Both jobs key their state by `user_id` / window bucket — the same
  * partitioning as the batch twins — so the state store shards
  * horizontally and a 100 TB/day stream is just more shuffle
  * partitions. Watermarks bound state: late events beyond 1 hour are
  * dropped instead of growing state forever.
  */
object EventStreams {

  /** One event on the wire. `ms` is epoch milliseconds (the parquet
    * source carries ns — see Tables.eventsWithMs). */
  case class Event(user_id: Long, event_id: Long, ms: Long,
                   event_type: String, value: Double)

  /** A closed (or flushed) session — the streaming twin of a
    * q14_sessionize output row. */
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                        start_ms: Long, end_ms: Long, total_value: Double)

  /** Open-session state per user (public: Catalyst codegen needs
    * accessible accessors for the state encoder). */
  case class SessionState(sessionId: Long, lastMs: Long, n: Long,
                          startMs: Long, sumValue: Double)

  /** Tumbling 1-hour windowed aggregate — streaming twin of
    * st1_window_agg. Works on any streaming or batch DataFrame with
    * (ms, event_type, value). */
  def windowedAgg(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", timestamp_millis($"ms"))
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
      .select(unix_millis($"window.start").as("window_start_ms"),
        $"event_type", $"n", $"total_value")
  }

  val SessionGapMs: Long = graft.operators.Sessionize.SessionGapMs

  /** Gap-based stateful sessionizer — streaming twin of
    * q14_sessionize, via flatMapGroupsWithState keyed by user.
    *
    * Each invocation sorts its micro-batch slice by event time and
    * folds it into the per-user open-session state, emitting every
    * session that a >30 min gap closes. Late events older than the
    * open session's tail are counted into the open session rather
    * than reopening closed ones (watermark discipline — closed
    * sessions are immutable downstream). In batch mode the same code
    * sees each user's full history in one call, so batch output ==
    * q14 minus each user's final (still-open) session, which
    * `flushOpen` accounts for in the specs.
    */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ms, e.event_id))
          var st = state.getOption.orNull
          val closed = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            st match {
              case null =>
                st = SessionState(1L, e.ms, 1L, e.ms, e.value)
              case s if e.ms - s.lastMs > SessionGapMs =>
                closed += SessionOut(user, s.sessionId, s.n, s.startMs, s.lastMs, s.sumValue)
                st = SessionState(s.sessionId + 1, e.ms, 1L, e.ms, e.value)
              case s =>
                st = s.copy(lastMs = math.max(s.lastMs, e.ms), n = s.n + 1,
                  sumValue = s.sumValue + e.value)
            }
          }
          if (st != null) state.update(st)
          closed.result().iterator
      }
  }

  /** Stream-stream join: each purchase joined to the same user's
    * clicks in the preceding 5 minutes. The event-time range condition
    * plus the watermarks is what lets Spark bound both join-state
    * buffers — old click state is evicted once the watermark passes
    * its reach, so state stays O(window), not O(stream). */
  def clickToPurchaseJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    import clicks.sparkSession.implicits._
    val c = clicks
      .select($"user_id".as("c_user"), $"event_id".as("c_event_id"),
        timestamp_millis($"ms").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val p = purchases
      .select($"user_id".as("p_user"), $"event_id".as("p_event_id"),
        timestamp_millis($"ms").as("p_ts"), $"value")
      .withWatermark("p_ts", "10 minutes")
    p.join(c,
      $"p_user" === $"c_user" &&
      $"c_ts" <= $"p_ts" &&
      $"c_ts" >= $"p_ts" - expr("INTERVAL 5 MINUTES"))
      .select($"p_user".as("user_id"), $"p_event_id", $"c_event_id",
        unix_millis($"p_ts").as("p_ms"), unix_millis($"c_ts").as("c_ms"), $"value")
  }

  /** Streaming exact dedup — the streaming twin of d1: drop duplicate
    * payload fingerprints as they arrive, with the watermark bounding
    * dedup state (a fingerprint older than the watermark horizon can
    * be forgotten — the at-scale requirement, or state grows with the
    * whole corpus). */
  def streamingDedup(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .withColumn("event_time", timestamp_millis($"ms"))
      .withWatermark("event_time", "1 hour")
      .dropDuplicatesWithinWatermark("fp")
  }

  /** The still-open sessions (state flush) for batch parity checks. */
  def sessionizeWithFlush(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val closed = sessionize(events)
    val open = events.groupByKey(_.user_id).mapGroups { (user, it) =>
      val sorted = it.toSeq.sortBy(e => (e.ms, e.event_id))
      var sid = 1L; var last = Long.MinValue
      var n = 0L; var start = 0L; var sum = 0.0
      sorted.foreach { e =>
        if (last != Long.MinValue && e.ms - last > SessionGapMs) {
          sid += 1; n = 0; sum = 0.0; start = e.ms
        } else if (n == 0) start = e.ms
        n += 1; sum += e.value; last = e.ms
      }
      SessionOut(user, sid, n, start, last, sum)
    }
    closed.unionAll(open)
  }
}
