package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming HEAVY-CHANGE detection: t17's snapshot-drift question
  * ("which tokens' share of the distribution moved between crawl A
  * and crawl B") maintained INCREMENTALLY over a tagged token stream
  * — TWO Misra–Gries summaries per hash range, one per snapshot, the
  * two-sketch scheme of Cormode & Muthukrishnan's "what's new"
  * formulation on TrendingStream's per-range MG machinery.
  *
  * Sharding: tokens key by hash range, so each state-store key holds
  * one bounded (A, B) summary PAIR of its own disjoint substream —
  * a token lives in exactly one range, so its A- and B-counts meet
  * in the same summary pair and drift needs no cross-range merge.
  * Per-range per-snapshot the MG guarantee is tight: est ≤ true ≤
  * est + N_{r,snap}/(cap+1), and any token with true > N_{r,snap}/
  * (cap+1) is guaranteed present — which bounds the DRIFT estimate's
  * error per token by marginA/totalA + marginB/totalB in share
  * units (the spec pins the band against the batch-exact t17 drift
  * on a replayed corpus).
  *
  * Scale shape: state is ≤ 2·capacity entries + three longs per
  * range — bounded by ranges × capacity regardless of stream
  * cardinality; each batch emits the summary pair, never the token
  * stream. Emissions carry a per-range `ver` so a consumer reads
  * "latest per range" idempotently; `driftTopK` is that consumer
  * (exact integer micro-unit shares, t17's quantization).
  */
object DriftStream {

  case class SnapTok(range: Int, isB: Boolean, token: String)
  case class DriftState(ver: Long, na: Long, nb: Long,
      aTokens: Seq[String], aCounts: Seq[Long],
      bTokens: Seq[String], bCounts: Seq[Long])
  case class DriftRow(range: Int, ver: Long, na: Long, nb: Long,
      token: String, estA: Long, estB: Long)

  class DriftProcessor(capacity: Int)
      extends StatefulProcessor[Int, SnapTok, DriftRow] {
    @transient private var state: ValueState[DriftState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[DriftState](
        "drift", Encoders.product[DriftState], TTLConfig.NONE)

    override def handleInputRows(range: Int, it: Iterator[SnapTok],
        timers: TimerValues): Iterator[DriftRow] = {
      val st = if (state.exists()) state.get()
        else DriftState(0L, 0L, 0L, Nil, Nil, Nil, Nil)
      val ma = collection.mutable.LinkedHashMap(st.aTokens.zip(st.aCounts): _*)
      val mb = collection.mutable.LinkedHashMap(st.bTokens.zip(st.bCounts): _*)
      var na = st.na
      var nb = st.nb
      it.foreach { row =>
        if (row.isB) { TrendingStream.mgUpdate(mb, row.token, capacity); nb += 1L }
        else { TrendingStream.mgUpdate(ma, row.token, capacity); na += 1L }
      }
      val ver = st.ver + 1L
      val aToks = ma.keys.toSeq
      val bToks = mb.keys.toSeq
      state.update(DriftState(ver, na, nb, aToks, aToks.map(ma),
        bToks, bToks.map(mb)))
      // emit the UNION of the two summaries: a token heavy in one
      // snapshot and absent from the other is exactly the drift case
      (aToks ++ bToks).distinct.iterator.map { t =>
        DriftRow(range, ver, na, nb, t,
          ma.getOrElse(t, 0L), mb.getOrElse(t, 0L))
      }
    }
  }

  /** The heavy-change query: snapshot-tagged tokens → per-range
    * two-sketch summaries, re-emitted (growing `ver`) every batch
    * the range receives data. */
  def heavyChange(tokens: Dataset[SnapTok],
      capacity: Int): Dataset[DriftRow] = {
    import tokens.sparkSession.implicits._
    tokens
      .groupByKey(_.range)
      .transformWithState(new DriftProcessor(capacity),
        TimeMode.None(), OutputMode.Append(), Encoders.product[DriftRow])
  }

  /** Consumer contract: drift ranking from the LATEST summary per
    * range — t17's exact integer micro-unit share algebra over the
    * summary estimates (ta/tb are EXACT per-range totals, summed;
    * only the per-token counts are MG estimates). */
  def driftTopK(rows: Seq[DriftRow], k: Int,
      minCombined: Long = 0L): Seq[(String, Long, Long, Long)] = {
    val latest = rows.groupBy(_.range).values.flatMap { rs =>
      val v = rs.map(_.ver).max
      rs.filter(_.ver == v)
    }.toSeq
    val ta = latest.groupBy(_.range).map(_._2.head.na).sum
    val tb = latest.groupBy(_.range).map(_._2.head.nb).sum
    latest
      .filter(r => r.estA + r.estB >= minCombined)
      .map { r =>
        val sa = if (ta == 0L) 0L else r.estA * 1000000L / ta
        val sb = if (tb == 0L) 0L else r.estB * 1000000L / tb
        (r.token, r.estA, r.estB, math.abs(sa - sb))
      }
      .sortBy(r => (-r._4, r._1))
      .take(k)
  }
}
