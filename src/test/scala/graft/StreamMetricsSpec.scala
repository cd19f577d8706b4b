package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{EventStreams, StreamMetrics}
import graft.streaming.EventStreams.Event

class StreamMetricsSpec extends GraftSpecBase {

  // listener delivery is async on the bus; poll until the expected
  // batch count lands (or time out loudly)
  private def awaitBatches(c: StreamMetrics.Collector, n: Int): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (c.count < n && System.nanoTime() < deadline) Thread.sleep(50)
    assert(c.count >= n, s"collector saw ${c.count} batches, wanted $n")
  }

  test("progress collector surfaces per-batch lag metrics as a DataFrame") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.eventsWithMs(spark, sf)
      .select($"user_id", $"event_id", $"ms", $"event_type", $"value")
      .as[Event].collect().toSeq.sortBy(e => (e.ms, e.event_id))
    val collector = new StreamMetrics.Collector()
    spark.streams.addListener(collector)
    val stream = MemoryStream[Event]
    val q = EventStreams.windowedAgg(stream.toDF())
      .writeStream.format("memory").queryName("metered_agg")
      .outputMode("complete").start()
    try {
      val (h1, h2) = events.splitAt(events.size / 2)
      stream.addData(h1); q.processAllAvailable()
      stream.addData(h2); q.processAllAvailable()
      awaitBatches(collector, 2)

      val df = collector.toDF(spark).filter($"query_name" === "metered_agg")
      val rows = df.orderBy($"batch_id").collect()
      assert(rows.length >= 2)
      // every fed row is accounted for across batches
      val fed = df.agg(sum($"num_input_rows")).first().getLong(0)
      assert(fed == events.size.toLong)
      // batch wall-clock duration was measured
      assert(rows.forall(_.getAs[Long]("batch_duration_ms") >= 0))
      // the watermark advanced once the first batch's max event time
      // was observed (windowedAgg holds a 1-hour watermark)
      val last = rows.last
      assert(last.getAs[Long]("watermark_ms") > 0)
      assert(last.getAs[Long]("max_event_time_ms") >= last.getAs[Long]("watermark_ms"))
      // replayed historical event-time trails wall-clock: lag is
      // positive and equals ts - watermark
      assert(last.getAs[Long]("watermark_lag_ms") ==
        last.getAs[Long]("batch_ts_ms") - last.getAs[Long]("watermark_ms"))
      // the stateful agg reported state rows
      assert(rows.map(_.getAs[Long]("state_rows")).max > 0)
    } finally {
      q.stop()
      spark.streams.removeListener(collector)
    }
  }

  test("soak: slaReport isolates an injected slow batch across watermark advances") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.eventsWithMs(spark, sf)
      .select($"user_id", $"event_id", $"ms", $"event_type", $"value")
      .as[Event].collect().toSeq.sortBy(e => (e.ms, e.event_id))
    val collector = new StreamMetrics.Collector()
    spark.streams.addListener(collector)
    val stream = MemoryStream[Event]
    val SlowMs = 5000L
    val SlowBatch = 2L
    // the injected stall lives in the sink, so triggerExecution (what
    // batch_duration_ms reports) absorbs it — the same signature a
    // slow downstream write or an overloaded executor produces
    val q = EventStreams.windowedAgg(stream.toDF())
      .writeStream.queryName("soak_agg").outputMode("complete")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.count()
        if (id == SlowBatch) Thread.sleep(SlowMs)
      }
      .start()
    try {
      // four time-ordered chunks → the event-time max rises every
      // batch, so the watermark advances repeatedly during the run
      events.grouped(math.max(1, events.size / 4 + 1)).foreach { c =>
        stream.addData(c); q.processAllAvailable()
      }
      awaitBatches(collector, 4)
      val metrics = collector.toDF(spark).filter($"query_name" === "soak_agg")
      val rows = metrics.orderBy($"batch_id").collect()
      // several watermark advances happened (strictly increasing once set)
      val wms = rows.map(_.getAs[Long]("watermark_ms")).filter(_ > 0)
      assert(wms.distinct.length >= 3, s"watermarks: ${wms.toSeq}")
      assert(wms.toSeq == wms.sorted.toSeq, s"watermarks regressed: ${wms.toSeq}")
      val durs = rows.map(r =>
        r.getAs[Long]("batch_id") -> r.getAs[Long]("batch_duration_ms")).toMap
      val slow = durs(SlowBatch)
      val others = (durs - SlowBatch).values
      assert(slow >= SlowMs, s"injected batch took ${slow}ms")
      assert(others.max < slow,
        s"injected batch (${slow}ms) is not the slowest: $durs")
      // a budget between the normal batches and the stalled one flags
      // exactly the stalled batch
      val budget = (others.max + slow) / 2
      val rep = StreamMetrics.slaReport(metrics, maxBatchMs = budget,
        maxWatermarkLagMs = Long.MaxValue / 2).first()
      assert(!rep.getAs[Boolean]("sla_ok"))
      assert(rep.getAs[Long]("duration_violations") == 1L, rep.toString)
    } finally {
      q.stop()
      spark.streams.removeListener(collector)
    }
  }

  test("sla report flags budget violations per query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.eventsWithMs(spark, sf)
      .select($"user_id", $"event_id", $"ms", $"event_type", $"value")
      .as[Event].collect().toSeq
    val collector = new StreamMetrics.Collector()
    spark.streams.addListener(collector)
    val stream = MemoryStream[Event]
    val q = EventStreams.windowedAgg(stream.toDF())
      .writeStream.format("memory").queryName("sla_agg")
      .outputMode("complete").start()
    try {
      stream.addData(events); q.processAllAvailable()
      awaitBatches(collector, 1)
      val metrics = collector.toDF(spark).filter($"query_name" === "sla_agg")

      // an absurd budget passes; a zero budget flags every batch
      val loose = StreamMetrics.slaReport(metrics, maxBatchMs = 10 * 60 * 1000L,
        maxWatermarkLagMs = Long.MaxValue / 2).first()
      assert(loose.getAs[Boolean]("sla_ok"))
      assert(loose.getAs[Long]("duration_violations") == 0L)

      val tight = StreamMetrics.slaReport(metrics, maxBatchMs = -1L,
        maxWatermarkLagMs = 0L).first()
      assert(!tight.getAs[Boolean]("sla_ok"))
      assert(tight.getAs[Long]("duration_violations") ==
        tight.getAs[Long]("n_batches"))
      // replaying historical event times makes watermark lag huge:
      // every watermarked batch violates a zero lag budget
      assert(tight.getAs[Long]("lag_violations") >= 1L)
    } finally {
      q.stop()
      spark.streams.removeListener(collector)
    }
  }
}
