package graft.streaming

import java.time.Instant
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability: per-batch query progress captured by a
  * `StreamingQueryListener` and surfaced as a DataFrame, so lag/SLA
  * analysis is just another graft query (join it, window it, alert on
  * it) instead of log spelunking.
  *
  * The collector is driver-side and O(batches) — bounded by
  * `maxBatches` — which is the right cost model: one row per
  * micro-batch per query, regardless of data volume. At fleet scale
  * the same rows stream to a metrics sink; the schema is the contract.
  */
object StreamMetrics {

  /** One micro-batch of one query. `watermark_ms`/`max_event_time_ms`
    * are -1 when the query has no event-time column (no watermark).
    * `watermark_lag_ms` = batch wall-clock − watermark: how far state
    * eviction trails real time (the state-growth early warning).
    * `backlog_ratio` = input rate / processed rate for the batch; a
    * sustained value > 1 means the query is falling behind its
    * source. */
  case class BatchMetric(
      query_name: String, query_id: String, run_id: String, batch_id: Long,
      batch_ts_ms: Long, num_input_rows: Long,
      input_rows_per_sec: Double, processed_rows_per_sec: Double,
      backlog_ratio: Double, batch_duration_ms: Long,
      watermark_ms: Long, max_event_time_ms: Long, watermark_lag_ms: Long,
      state_rows: Long, state_bytes: Long)

  /** Attach with `spark.streams.addListener(c)`; detach with
    * `removeListener`. Thread-safe: the listener bus delivers events
    * asynchronously. */
  class Collector(maxBatches: Int = 10000) extends StreamingQueryListener {
    private val buf = new java.util.concurrent.ConcurrentLinkedQueue[BatchMetric]()

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryIdle(e: StreamingQueryListener.QueryIdleEvent): Unit = ()

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      if (buf.size >= maxBatches) return
      val p = e.progress
      def iso(s: String): Long = if (s == null) -1L else Instant.parse(s).toEpochMilli
      def rate(d: Double): Double = if (d.isNaN || d.isInfinite) 0.0 else d
      val ts = iso(p.timestamp)
      val wm = iso(p.eventTime.get("watermark"))
      val maxEt = iso(p.eventTime.get("max"))
      val inRps = rate(p.inputRowsPerSecond)
      val procRps = rate(p.processedRowsPerSecond)
      val state = Option(p.stateOperators).getOrElse(Array.empty)
      buf.add(BatchMetric(
        query_name = Option(p.name).getOrElse(""),
        query_id = p.id.toString, run_id = p.runId.toString,
        batch_id = p.batchId, batch_ts_ms = ts,
        num_input_rows = p.numInputRows,
        input_rows_per_sec = inRps, processed_rows_per_sec = procRps,
        backlog_ratio = if (procRps > 0) inRps / procRps else 0.0,
        batch_duration_ms =
          Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(-1L),
        watermark_ms = wm, max_event_time_ms = maxEt,
        watermark_lag_ms = if (wm >= 0 && ts >= 0) ts - wm else -1L,
        state_rows = state.map(_.numRowsTotal).sum,
        state_bytes = state.map(_.memoryUsedBytes).sum))
    }

    def count: Int = buf.size

    /** The captured batches as a DataFrame (driver-local rows). */
    def toDF(spark: SparkSession): DataFrame =
      spark.createDataFrame(buf.asScala.toSeq)
  }

  /** Per-query SLA rollup over a metrics frame: violation counts
    * against a batch-duration budget and a watermark-lag budget, plus
    * the throughput/state aggregates an operator dashboard shows. Lag
    * violations only count batches that HAVE a watermark. */
  def slaReport(metrics: DataFrame, maxBatchMs: Long, maxWatermarkLagMs: Long): DataFrame = {
    import metrics.sparkSession.implicits._
    metrics.groupBy($"query_name", $"query_id")
      .agg(
        count(lit(1)).as("n_batches"),
        sum($"num_input_rows").as("total_rows"),
        max($"batch_duration_ms").as("max_batch_ms"),
        round(avg($"processed_rows_per_sec"), 1).as("avg_proc_rps"),
        max($"state_rows").as("max_state_rows"),
        max($"state_bytes").as("max_state_bytes"),
        max($"watermark_ms").as("final_watermark_ms"),
        sum(when($"batch_duration_ms" > maxBatchMs, 1L).otherwise(0L))
          .as("duration_violations"),
        sum(when($"watermark_lag_ms" >= 0 && $"watermark_lag_ms" > maxWatermarkLagMs, 1L)
          .otherwise(0L)).as("lag_violations"))
      .withColumn("sla_ok", $"duration_violations" === 0 && $"lag_violations" === 0)
  }
}
