package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.timestamp_millis
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.streaming.EventStreams.Event

/** The q61 windowed funnel as a per-user STATE MACHINE — one linear
  * pass over each user's events in time order, O(frontier) state.
  *
  * q61's exact join ladder materializes the per-user views × clicks
  * product before range-filtering it: correct, but a bot user with
  * 10⁵ views and 10⁵ clicks fans out 10¹⁰ rows inside one join group
  * (the q30/q43 hot-key class). The state machine replaces the product
  * with a fold: it carries the latest view anchor plus the PARETO
  * FRONTIER of open (view, click) chains, and scans events once.
  *
  * Why the frontier is sufficient (and why it stays small):
  *  - Level 2 needs SOME view v with v < c ≤ v+W. The latest view
  *    strictly before c dominates every earlier one (largest deadline),
  *    so one `lastViewMs` replaces the view list.
  *  - Level 3 needs SOME chain (v, c) with c < p ≤ v+W. Chain A
  *    dominates B when vA ≥ vB (later deadline) and cA ≤ cB (earlier
  *    click): keep only undominated chains — sorted by v, their click
  *    times strictly increase, so the frontier is bounded by the
  *    distinct click times inside one W window and in practice stays
  *    tiny. New chains always anchor on the latest view (maximal v), so
  *    appending prunes every chain with an equal-or-later click.
  *  - Chains whose deadline v+W has passed the current event time can
  *    never match a future purchase (time-ordered processing) and are
  *    dropped; reaching level 3 clears all state but the level.
  *
  * Order contract: events fold in (ms, views-last-within-ms) order —
  * strictness (c > v, p > c) is enforced by VALUE comparisons, but the
  * latest-view anchor must not yet include a view sharing the click's
  * millisecond, hence views sort after clicks/purchases at the same ms.
  * The streaming processor sorts each micro-batch slice and assumes
  * batch-monotone arrival across batches (the same watermark discipline
  * as the sessionizer); the batch fold sees the full ordered history.
  */
object FunnelLogic {

  /** 6-hour attribution window (shared with the q61 join ladder). */
  val WindowMs = 21600000L

  case class Chain(vMs: Long, cMs: Long)

  /** Per-user state: deepest level reached, latest view anchor, open
    * chain frontier. Size is O(frontier), never O(events). */
  case class FState(level: Int, lastViewMs: Long, chains: Seq[Chain])

  val empty: FState = FState(0, Long.MinValue, Nil)

  /** Same-ms tie-break: views AFTER clicks/purchases (see order
    * contract above); event_id last for determinism. */
  def typeOrder(eventType: String): Int = if (eventType == "view") 1 else 0

  /** Fold one event into the state. Returns the new state and the
    * newly reached level (0 = no upgrade). Events MUST arrive in
    * (ms, typeOrder, event_id) order. */
  def step(st: FState, eventType: String, ms: Long): (FState, Int) = {
    if (st.level >= 3) return (st, 0)
    eventType match {
      case "view" =>
        val up = if (st.level < 1) 1 else 0
        (FState(math.max(st.level, 1), math.max(st.lastViewMs, ms), st.chains),
          up)
      case "click" =>
        if (st.lastViewMs != Long.MinValue && st.lastViewMs < ms &&
            ms <= st.lastViewMs + WindowMs) {
          val kept = st.chains.filter(_.cMs < ms)
          // a same-anchor chain already in the frontier has an earlier
          // click and dominates the new one
          val chains =
            if (kept.nonEmpty && kept.last.vMs == st.lastViewMs) kept
            else kept :+ Chain(st.lastViewMs, ms)
          val up = if (st.level < 2) 2 else 0
          (FState(math.max(st.level, 2), st.lastViewMs, chains), up)
        } else (st, 0)
      case "purchase" =>
        val alive = st.chains.filter(_.vMs + WindowMs >= ms)
        if (alive.exists(ch => ch.cMs < ms && ms <= ch.vMs + WindowMs))
          (FState(3, Long.MinValue, Nil), 3)
        else (FState(st.level, st.lastViewMs, alive), 0)
      case _ => (st, 0)
    }
  }

  /** Deepest level for a user's full ordered history (batch fold). */
  def foldLevel(events: Iterator[(String, Long)]): Int = {
    var st = empty
    events.foreach { case (t, ms) => st = step(st, t, ms)._1 }
    st.level
  }
}

/** Streaming twin of the q61 funnel: per-user level-UPGRADE events
  * (user_id, funnel_level, ms — the moment the user first reached that
  * level) through Spark 4's `transformWithState`. Emissions are
  * at-most-once per (user, level) by construction — the persisted
  * level only ever grows — so a replayed batch cannot re-emit an
  * upgrade it already produced (the spec drives this across drains).
  */
object FunnelStream {

  case class FunnelUpgrade(user_id: Long, funnel_level: Int, ms: Long)

  class FunnelProcessor
      extends StatefulProcessor[Long, Event, FunnelUpgrade] {
    @transient private var state: ValueState[FunnelLogic.FState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[FunnelLogic.FState](
        "funnel", Encoders.product[FunnelLogic.FState], TTLConfig.NONE)

    override def handleInputRows(user: Long, it: Iterator[Event],
        timers: TimerValues): Iterator[FunnelUpgrade] = {
      var st = if (state.exists()) state.get() else FunnelLogic.empty
      val out = scala.collection.mutable.ListBuffer.empty[FunnelUpgrade]
      // micro-batch-slice-sized sort (not stream-sized); cross-batch
      // order is the batch-monotone watermark discipline
      it.toArray
        .sortBy(e => (e.ms, FunnelLogic.typeOrder(e.event_type), e.event_id))
        .foreach { e =>
          val (st2, up) = FunnelLogic.step(st, e.event_type, e.ms)
          st = st2
          if (up > 0) out += FunnelUpgrade(user, up, e.ms)
        }
      state.update(st)
      out.iterator
    }
  }

  /** Level-upgrade stream keyed by user (requires the RocksDB state
    * store provider, like `sessionizeTws`). */
  def funnelUpgrades(events: Dataset[Event]): Dataset[FunnelUpgrade] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor,
        TimeMode.None(), OutputMode.Append(), Encoders.product[FunnelUpgrade])
  }

  /** The unbounded-safe variant: identical funnel logic plus a SLIDING
    * EVENT-TIME eviction timer per user — a user idle for `idleMs` of
    * event time (once the watermark passes) has their state cleared,
    * so the state store is bounded by the ACTIVE population, not the
    * all-time one (the §8 blocker for the TimeMode.None twin).
    *
    * Why event-time timers and not TTL or wall-clock: on this Spark
    * build BOTH processing-time mechanisms hang the first microbatch's
    * state-store commit — `getValueState(..., TTLConfig(d))` AND plain
    * `registerTimer` under `TimeMode.ProcessingTime()` leave every
    * task spinning inside `RocksDB.createSnapshot` (measured; jstack'd;
    * changelog checkpointing does not help). `TimeMode.EventTime()`
    * timers commit and fire correctly — and are the better semantics
    * anyway: "idle" is defined by the STREAM's clock, so a replayed or
    * lagging stream evicts identically (deterministic, spec-provable
    * without sleeps).
    *
    * Mechanics: each batch deletes the user's previous timer and
    * registers one at maxEventMs + idleMs (one live timer per user);
    * `handleExpiredTimer` clears the state when the watermark passes
    * it. Semantics trade: an evicted user who returns re-enters at
    * level 0, so at-most-once-per-(user, level) weakens to
    * at-most-once-per-retention-window — the documented contract of
    * every TTL'd funnel. */
  class EvictingFunnelProcessor(idleMs: Long)
      extends StatefulProcessor[Long, Event, FunnelUpgrade] {
    @transient private var state: ValueState[FunnelLogic.FState] = _
    @transient private var timerAt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[FunnelLogic.FState](
        "funnel", Encoders.product[FunnelLogic.FState], TTLConfig.NONE)
      timerAt = getHandle.getValueState[Long](
        "timerAt", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, it: Iterator[Event],
        timers: TimerValues): Iterator[FunnelUpgrade] = {
      var st = if (state.exists()) state.get() else FunnelLogic.empty
      val out = scala.collection.mutable.ListBuffer.empty[FunnelUpgrade]
      var maxMs = Long.MinValue
      it.toArray
        .sortBy(e => (e.ms, FunnelLogic.typeOrder(e.event_type), e.event_id))
        .foreach { e =>
          val (st2, up) = FunnelLogic.step(st, e.event_type, e.ms)
          st = st2
          maxMs = math.max(maxMs, e.ms)
          if (up > 0) out += FunnelUpgrade(user, up, e.ms)
        }
      state.update(st)
      // slide the eviction timer: delete-then-register keeps exactly
      // one live timer per user (a stale timer would evict an ACTIVE
      // user when the watermark reached it). The timer must be
      // MONOTONE: a late batch (allowed by the watermark) whose events
      // all predate the user's prior max would otherwise move the
      // timer BACKWARDS, shortening retention and making eviction
      // depend on batch boundaries — so keep max(new, existing).
      val prev = if (timerAt.exists()) timerAt.get() else Long.MinValue
      val at = math.max(maxMs + idleMs, prev)
      if (at != prev) {
        if (prev != Long.MinValue) getHandle.deleteTimer(prev)
        getHandle.registerTimer(at)
        timerAt.update(at)
      }
      out.iterator
    }

    override def handleExpiredTimer(user: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[FunnelUpgrade] = {
      state.clear()
      timerAt.clear()
      Iterator.empty
    }
  }

  /** `funnelUpgrades` with per-user state eviction after `idleMs` of
    * event-time inactivity. `watermarkDelay` is the out-of-orderness
    * allowance on the event-time column (the usual watermark trade:
    * larger tolerates later data, smaller evicts sooner). */
  def funnelUpgradesEvicting(events: Dataset[Event], idleMs: Long,
      watermarkDelay: String = "10 seconds"): Dataset[FunnelUpgrade] = {
    import events.sparkSession.implicits._
    events
      .withColumn("eventTime", timestamp_millis($"ms"))
      .withWatermark("eventTime", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new EvictingFunnelProcessor(idleMs),
        TimeMode.EventTime(), OutputMode.Append(),
        Encoders.product[FunnelUpgrade])
  }

}
