package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, ValueState}
import graft.streaming.EventStreams.Event

/** The q91 conversion-lag distribution as a STREAM (§8b.6): per-user
  * latest-view timestamp in keyed state; each purchase emits its
  * view→purchase lag the moment it arrives — the serving-side
  * "time-to-convert" feed that the batch entry aggregates weekly.
  *
  * Semantics contract (exactly q91's window algebra): the batch
  * entry's `last(view) OVER (... ROWS UNBOUNDED PRECEDING TO 1
  * PRECEDING)` ordered by (ms, event_id) means a view sharing the
  * purchase's millisecond counts iff its event_id is SMALLER — so the
  * processor folds each micro-batch slice in (ms, event_id) order
  * (NOT the funnel's type-order tiebreak) and reads the state
  * strictly before updating it on the purchase row itself is never
  * possible (a purchase never writes the view state). Cross-batch
  * arrival is batch-monotone (the sessionizer/funnel watermark
  * discipline); the spec drives the full corpus slice through
  * multiple batches against `Analytics.q91Lags` row-for-row.
  *
  * Shape at scale: state is ONE Long per user (the minimal funnel —
  * no frontier needed because only the latest view can ever be the
  * attribution anchor), RocksDB-backed, linear in active users;
  * emissions are output-sized (one row per conversion). Weekly
  * quantile rollups happen downstream — batch q91 on the emitted
  * table IS that rollup. */
object LagStream {

  /** Week bucket shared with the batch entry. */
  val WeekMs = 7L * 24 * 3600 * 1000

  case class ConversionLag(user_id: Long, ms: Long, wk: Long, lag_ms: Long)

  class LagProcessor
      extends StatefulProcessor[Long, Event, ConversionLag] {
    @transient private var lastView: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastView = getHandle.getValueState[Long](
        "lastView", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(user: Long, it: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[ConversionLag] = {
      var lv = if (lastView.exists()) lastView.get() else Long.MinValue
      val out = scala.collection.mutable.ListBuffer.empty[ConversionLag]
      // micro-batch-slice sort in the BATCH window's (ms, event_id)
      // order — a same-ms view counts only when its event_id precedes
      it.toArray.sortBy(e => (e.ms, e.event_id)).foreach { e =>
        e.event_type match {
          case "view" => lv = math.max(lv, e.ms)
          case "purchase" if lv != Long.MinValue =>
            out += ConversionLag(user, e.ms, e.ms / WeekMs, e.ms - lv)
          case _ => ()
        }
      }
      if (lv != Long.MinValue) lastView.update(lv)
      out.iterator
    }
  }

  /** Per-conversion lag stream keyed by user (requires the RocksDB
    * state store provider, like the funnel twins). */
  def conversionLags(events: Dataset[Event]): Dataset[ConversionLag] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new LagProcessor,
        TimeMode.None(), OutputMode.Append(),
        Encoders.product[ConversionLag])
  }
}
