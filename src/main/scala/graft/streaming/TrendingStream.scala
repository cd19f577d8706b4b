package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming "trending tokens": t15's Misra–Gries heavy-hitter summary
  * maintained INCREMENTALLY over a token stream — the streaming twin
  * of the batch `misra_gries_agg` path (same Misra & Gries 1982
  * update; same bounded-summary philosophy).
  *
  * Sharding: tokens key by hash range (`ranges` of them), so each
  * state-store key holds ONE bounded summary of its own disjoint
  * substream. A token lives in exactly one range, which keeps the MG
  * guarantee per-range and tight: for every token in range r,
  * est ≤ true ≤ est + N_r/(cap+1), and any token with
  * true > N_r/(cap+1) is guaranteed present in r's summary (the spec
  * pins both directions and presence, under one-drain AND chunked
  * arrival — estimates are arrival-order-dependent, the BOUNDS are
  * not).
  *
  * Scale shape: state per range is ≤ `capacity` entries + two longs —
  * the store is bounded by ranges × capacity no matter the stream's
  * cardinality, and each batch's emission is the summary, never the
  * token stream. Each emission carries a per-range version `ver` so a
  * consumer (and the spec) reads "latest per range" idempotently.
  */
object TrendingStream {

  case class TokenIn(range: Int, token: String)
  case class MgState(ver: Long, n: Long, tokens: Seq[String], counts: Seq[Long])
  case class TrendRow(range: Int, ver: Long, n: Long, token: String, est: Long)

  /** One Misra–Gries update step on a mutable map (shared with
    * DriftStream's two-sketch processor). */
  private[streaming] def mgUpdate(
      m: collection.mutable.LinkedHashMap[String, Long],
      token: String, cap: Int): Unit = {
    if (m.contains(token)) m(token) += 1L
    else if (m.size < cap) m(token) = 1L
    else {
      // decrement-all: retires cap+1 units of total count per event
      val dead = collection.mutable.ListBuffer.empty[String]
      m.keysIterator.foreach { k =>
        val v = m(k) - 1L
        if (v <= 0L) dead += k else m(k) = v
      }
      dead.foreach(m.remove)
    }
  }

  class TrendingProcessor(capacity: Int)
      extends StatefulProcessor[Int, TokenIn, TrendRow] {
    @transient private var state: ValueState[MgState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[MgState](
        "mg", Encoders.product[MgState], TTLConfig.NONE)

    override def handleInputRows(range: Int, it: Iterator[TokenIn],
        timers: TimerValues): Iterator[TrendRow] = {
      val st = if (state.exists()) state.get() else MgState(0L, 0L, Nil, Nil)
      val m = collection.mutable.LinkedHashMap(st.tokens.zip(st.counts): _*)
      var n = st.n
      it.foreach { row => mgUpdate(m, row.token, capacity); n += 1L }
      val ver = st.ver + 1L
      val toks = m.keys.toSeq
      state.update(MgState(ver, n, toks, toks.map(m)))
      m.iterator.map { case (t, c) => TrendRow(range, ver, n, t, c) }
    }
  }

  /** The trending query: `tokens` → per-range MG summaries, re-emitted
    * (with a growing `ver`) every batch the range receives data. */
  def trendingTokens(tokens: Dataset[String], ranges: Int,
      capacity: Int): Dataset[TrendRow] = {
    import tokens.sparkSession.implicits._
    tokens
      .map(t => TokenIn(math.floorMod(t.hashCode, ranges), t))
      .groupByKey(_.range)
      .transformWithState(new TrendingProcessor(capacity),
        TimeMode.None(), OutputMode.Append(), Encoders.product[TrendRow])
  }
}
