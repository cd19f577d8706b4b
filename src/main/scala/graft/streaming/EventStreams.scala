package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming twins of the batch event operators.
  *
  * Both jobs key their state by `user_id` / window bucket — the same
  * partitioning as the batch twins — so the state store shards
  * horizontally and a 100 TB/day stream is just more shuffle
  * partitions. Watermarks bound state: late events beyond 1 hour are
  * dropped instead of growing state forever.
  */
object EventStreams {

  /** Production state-store configuration: RocksDB keeps state off-heap
    * (bounded executor memory however large the keyspace grows), and
    * changelog checkpointing uploads only each micro-batch's delta to
    * the checkpoint location instead of snapshotting the full store —
    * at large state (billions of keys across 1000 executors) the
    * snapshot upload is the commit-latency bottleneck, the changelog
    * is O(batch). Snapshots still happen, asynchronously, for bounded
    * replay on recovery. */
  val stateStoreConfs: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
      "true")

  /** One event on the wire. `ms` is epoch milliseconds (the parquet
    * source carries ns — see Tables.eventsWithMs). */
  case class Event(user_id: Long, event_id: Long, ms: Long,
                   event_type: String, value: Double)

  /** A closed (or flushed) session — the streaming twin of a
    * q14_sessionize output row. */
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                        start_ms: Long, end_ms: Long, total_value: Double)

  /** One open session fragment: the merged interval of events seen so
    * far, with its running aggregates (public: Catalyst codegen needs
    * accessible accessors for the state encoder). */
  case class SessionFrag(firstMs: Long, lastMs: Long, n: Long, sumValue: Double)

  /** Per-user sessionizer state: next ordinal to assign + the open
    * fragments. Size is O(open sessions), never O(buffered events). */
  case class SessionState(nextId: Long, frags: Seq[SessionFrag])

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

  /** Sliding-window streaming twin of `st2SlidingWindow`: 1-hour
    * windows every 15 minutes under a 1-hour watermark. Same operator,
    * same state keying (window × type) — the spec drives it over a
    * MemoryStream and asserts equality with the batch twin. */
  def slidingWindowAgg(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", timestamp_millis($"ms"))
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
      .select(unix_millis($"window.start").as("window_start_ms"),
        $"event_type", $"n", $"total_value")
  }

  val SessionGapMs: Long = graft.operators.Sessionize.SessionGapMs

  /** Gap-based stateful sessionizer — streaming twin of
    * q14_sessionize, via flatMapGroupsWithState keyed by user.
    *
    * Each event folds into the user's open session *fragments* by
    * interval merge: an event joins every fragment within the session
    * gap of it (possibly bridging two), else opens its own. No sort
    * and no buffering of the micro-batch slice — a hot user costs
    * O(open sessions) state, not O(events), which is what survives a
    * skewed key at stream scale. At the end of each invocation every
    * fragment except the user's latest is gap-closed by construction
    * (assuming batch-monotone arrival, the watermark discipline) and
    * is emitted with its ordinal; the latest stays open in state. In
    * batch mode the same code sees the full history in one call, so
    * batch output == q14 minus each user's final (still-open) session,
    * which `sessionizeWithFlush` accounts for in the specs. */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val st = state.getOption.getOrElse(SessionState(1L, Nil))
          val ordered = mergeEvents(st.frags.toList, it).sortBy(_.firstMs)
          val (closed, open) =
            if (ordered.isEmpty) (Nil, Nil) else (ordered.init, List(ordered.last))
          val out = closed.zipWithIndex.map { case (f, i) =>
            SessionOut(user, st.nextId + i, f.n, f.firstMs, f.lastMs, f.sumValue)
          }
          state.update(SessionState(st.nextId + closed.size, open))
          out.iterator
      }
  }

  /** The interval-merge fold shared by both stateful sessionizer
    * implementations: events join any open fragment within the gap
    * (possibly bridging two), else open their own. */
  private[graft] def mergeEvents(
      frags0: List[SessionFrag], it: Iterator[Event]): List[SessionFrag] = {
    var frags = frags0
    it.foreach { e =>
      val (touch, rest) = frags.partition(f =>
        e.ms >= f.firstMs - SessionGapMs && e.ms <= f.lastMs + SessionGapMs)
      val merged = touch.foldLeft(SessionFrag(e.ms, e.ms, 1L, e.value)) {
        (acc, f) => SessionFrag(math.min(acc.firstMs, f.firstMs),
          math.max(acc.lastMs, f.lastMs), acc.n + f.n, acc.sumValue + f.sumValue)
      }
      frags = merged :: rest
    }
    frags
  }

  /** The sessionizer on Spark 4's `transformWithState` arbitrary-state
    * API: per-key `ValueState` in the (RocksDB-backed) state store,
    * same interval-merge fold, same output as `sessionize`. The new
    * API is where stateful operators get state TTL, timers, and
    * store-level eviction — the long-term home for this operator. */
  class SessionProcessor extends StatefulProcessor[Long, Event, SessionOut] {
    @transient private var state: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(user: Long, it: Iterator[Event],
        timers: TimerValues): Iterator[SessionOut] = {
      val st = if (state.exists()) state.get() else SessionState(1L, Nil)
      val ordered = mergeEvents(st.frags.toList, it).sortBy(_.firstMs)
      val (closed, open) =
        if (ordered.isEmpty) (Nil, Nil) else (ordered.init, List(ordered.last))
      val out = closed.zipWithIndex.map { case (f, i) =>
        SessionOut(user, st.nextId + i, f.n, f.firstMs, f.lastMs, f.sumValue)
      }
      state.update(SessionState(st.nextId + closed.size, open))
      out.iterator
    }
  }

  /** Streaming twin of `sessionize` through transformWithState
    * (requires the RocksDB state store provider). */
  def sessionizeTws(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor,
        TimeMode.None(), OutputMode.Append(), Encoders.product[SessionOut])
  }

  /** The same sessionization through Spark's native `session_window`
    * aggregation — the state store merges window fragments itself, so
    * memory per key is bounded by the store, and late data within the
    * watermark is handled by window merge. No ordinal session id (an
    * append-mode stream can't know it); the spec matches boundaries
    * and aggregates against q14. Works on a batch or streaming frame
    * with (user_id, ms, value). */
  def sessionizeNative(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", timestamp_millis($"ms"))
      .withWatermark("ts", "1 hour")
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("total_value"))
      .select($"user_id",
        unix_millis($"session_window.start").as("start_ms"),
        // window end = last event + gap; subtract it to expose the
        // last-event timestamp q14 reports
        (unix_millis($"session_window.end") - SessionGapMs).as("end_ms"),
        $"n_events", $"total_value")
  }

  /** DYNAMIC-gap sessionization: the gap depends on the event —
    * purchases hold a session open 60 min, everything else 30 min
    * (engagement-weighted timeouts, the production refinement of the
    * fixed gap). Uses `session_window`'s dynamic-gap column; state
    * still keys by user, so the streaming scaling story is unchanged.
    * The spec checks it against an interval-merge reference (running
    * max of per-event ends — the d7 span-merge shape). */
  val PurchaseGapMs = 60L * 60 * 1000
  val DefaultGapMs = 30L * 60 * 1000

  def dynamicSessionize(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    // make_interval, not an INTERVAL literal: session_window's dynamic
    // gap requires CalendarIntervalType (INTERVAL ... MINUTES parses
    // as the ANSI DayTimeIntervalType and is rejected)
    val gap = when($"event_type" === "purchase",
      expr("make_interval(0, 0, 0, 0, 0, 60, 0)"))
      .otherwise(expr("make_interval(0, 0, 0, 0, 0, 30, 0)"))
    events
      .withColumn("ts", timestamp_millis($"ms"))
      .withWatermark("ts", "2 hours")
      .groupBy($"user_id", session_window($"ts", gap))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id",
        unix_millis($"session_window.start").as("start_ms"),
        unix_millis($"session_window.end").as("win_end_ms"),
        $"n_events")
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

  /** Stream-static enrichment — the dimension-join surface every
    * production stream has: each arriving event LEFT-joined to a
    * static user→segment dimension, then windowed per (window,
    * segment). The static side is a bounded dim table, so Catalyst
    * plans a BROADCAST hash join per micro-batch (no stream-side
    * shuffle before the window agg, no state kept for the join — only
    * the agg holds state); the dim is re-resolvable per batch, which
    * is exactly how slowly-changing dimensions refresh under
    * Structured Streaming. Unmatched users keep their rows with a
    * null-bucket segment ("unknown"), because dropping events on a dim
    * miss silently under-counts the window. */
  def staticEnrichedAgg(events: DataFrame, dim: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", timestamp_millis($"ms"))
      .withWatermark("ts", "1 hour")
      .join(broadcast(dim), Seq("user_id"), "left")
      .withColumn("segment", coalesce($"segment", lit("unknown")))
      .groupBy(window($"ts", "1 hour"), $"segment")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
      .select(unix_millis($"window.start").as("window_start_ms"),
        $"segment", $"n", $"total_value")
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

  /** The still-open sessions (state flush) for batch parity checks —
    * the same interval merge as `sessionize`, emitting only each
    * user's final fragment with its ordinal. */
  def sessionizeWithFlush(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val closed = sessionize(events)
    val open = events.groupByKey(_.user_id).mapGroups { (user, it) =>
      val ordered = mergeEvents(Nil, it).sortBy(_.firstMs)
      val last = ordered.last
      SessionOut(user, ordered.size.toLong, last.n, last.firstMs, last.lastMs, last.sumValue)
    }
    closed.unionAll(open)
  }
}
