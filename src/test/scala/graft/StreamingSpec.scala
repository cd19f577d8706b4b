package graft

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, SessionOut}

class StreamingSpec extends GraftSpecBase {

  private def loadEvents: Seq[Event] = {
    import spark.implicits._
    Tables.eventsWithMs(spark, sf)
      .select($"user_id", $"event_id", $"ms", $"event_type", $"value")
      .as[Event].collect().toSeq.sortBy(e => (e.ms, e.event_id))
  }

  test("streaming windowed agg over memory stream matches batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents
    val stream = MemoryStream[Event]
    val q = EventStreams.windowedAgg(stream.toDF())
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try {
      val (h1, h2) = events.splitAt(events.size / 2)
      stream.addData(h1); q.processAllAvailable()
      stream.addData(h2); q.processAllAvailable()
      val got = spark.table("win_agg")
        .select(($"window_start_ms" / 3600000L).cast("long").as("hour_bucket"),
          $"event_type", $"n", $"total_value")
        .collect().map(_.toSeq).toSet
      val want = operators.Sessionize.st1WindowAgg(spark, sf)
        .collect().map(_.toSeq).toSet
      assert(got == want)
    } finally q.stop()
  }

  test("stream-static dim enrichment matches batch twin, dim misses kept as unknown") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents
    // static user→segment dim covering 2/3 of users: the left-join
    // miss path (segment "unknown") must carry real traffic
    val dim = Tables.events(spark, sf).select($"user_id").distinct()
      .filter($"user_id" % 3 =!= 2)
      .withColumn("segment",
        when($"user_id" % 3 === 0, "power").otherwise("casual"))
      .cache()
    val stream = MemoryStream[Event]
    val q = EventStreams.staticEnrichedAgg(stream.toDF(), dim)
      .writeStream.format("memory").queryName("enriched_agg")
      .outputMode("complete").start()
    try {
      val (h1, h2) = events.splitAt(events.size / 2)
      stream.addData(h1); q.processAllAvailable()
      stream.addData(h2); q.processAllAvailable()
      val got = spark.table("enriched_agg").collect().map(_.toSeq).toSet
      val want = Tables.eventsWithMs(spark, sf)
        .join(dim, Seq("user_id"), "left")
        .withColumn("segment", coalesce($"segment", lit("unknown")))
        .select((expr("ms div 3600000L") * 3600000L).as("window_start_ms"),
          $"segment", $"value")
        .groupBy($"window_start_ms", $"segment")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
        .collect().map(_.toSeq).toSet
      assert(got == want)
      assert(got.exists(_(1) == "unknown") && got.exists(_(1) == "power"))
    } finally { q.stop(); dim.unpersist() }
  }

  test("streaming sliding-window agg over memory stream matches batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents
    val stream = MemoryStream[Event]
    val q = EventStreams.slidingWindowAgg(stream.toDF())
      .writeStream.format("memory").queryName("slide_agg")
      .outputMode("complete").start()
    try {
      val (h1, h2) = events.splitAt(events.size / 2)
      stream.addData(h1); q.processAllAvailable()
      stream.addData(h2); q.processAllAvailable()
      val got = spark.table("slide_agg")
        .select($"window_start_ms".as("win_start_ms"),
          $"event_type", $"n", $"total_value")
        .collect().map(_.toSeq).toSet
      val want = operators.Sessionize.st2SlidingWindow(spark, sf)
        .collect().map(_.toSeq).toSet
      assert(got == want)
    } finally q.stop()
  }

  test("stateful streaming sessionizer matches batch q14 (closed + flushed)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents
    val stream = MemoryStream[Event]
    val q = EventStreams.sessionize(stream.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // feed in 4 time-ordered chunks to exercise state across batches
      events.grouped(math.max(1, events.size / 4 + 1)).foreach { chunk =>
        stream.addData(chunk); q.processAllAvailable()
      }
      val closed = spark.table("sessions").as[SessionOut].collect()
        .map(s => (s.user_id, s.session_id, s.n_events, s.start_ms, s.end_ms)).toSet
      val batch = operators.Sessionize.q14Sessionize(spark, sf)
        .select($"user_id", $"session_id", $"n_events", $"start_ms", $"end_ms")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      // streaming emitted exactly the batch sessions that a later event closed:
      // every user's final session is still open in state
      val lastPerUser = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val expectClosed = batch.filterNot { case (u, sid, _, _, _) => lastPerUser(u) == sid }
      assert(closed == expectClosed)
    } finally q.stop()
  }

  test("stream-stream join matches the batch join over two memory streams") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents
    val clicks = events.filter(_.event_type == "click")
    val purchases = events.filter(_.event_type == "purchase")
    val cs = MemoryStream[Event]; val ps = MemoryStream[Event]
    val q = EventStreams.clickToPurchaseJoin(cs.toDF(), ps.toDF())
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      cs.addData(clicks); ps.addData(purchases)
      q.processAllAvailable()
      val got = spark.table("ss_join")
        .select($"p_event_id", $"c_event_id").as[(Long, Long)].collect().toSet
      val want = (for {
        p <- purchases; c <- clicks
        if c.user_id == p.user_id && c.ms <= p.ms && c.ms >= p.ms - 5 * 60 * 1000
      } yield (p.event_id, c.event_id)).toSet
      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup keeps one row per fingerprint across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // duplicate texts arriving in different batches
    case class Doc(id: Long, fp: String, ms: Long)
    val stream = MemoryStream[(Long, String, Long)]
    val df = stream.toDF().toDF("id", "fp", "ms")
    val q = EventStreams.streamingDedup(df)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      stream.addData((1L, "aaa", 1000L), (2L, "bbb", 2000L), (3L, "aaa", 3000L))
      q.processAllAvailable()
      stream.addData((4L, "aaa", 4000L), (5L, "ccc", 5000L))
      q.processAllAvailable()
      val fps = spark.table("dedup_out").select($"fp").as[String].collect().sorted
      assert(fps.toSeq == Seq("aaa", "bbb", "ccc"))
    } finally q.stop()
  }

  test("native session_window in batch equals q14 session boundaries") {
    import spark.implicits._
    val events = Tables.eventsWithMs(spark, sf)
      .select($"user_id", $"ms", $"value")
    val got = EventStreams.sessionizeNative(events)
      .select($"user_id", $"start_ms", $"end_ms", $"n_events", $"total_value")
      .collect().map(_.toSeq).toSet
    val want = operators.Sessionize.q14Sessionize(spark, sf)
      .select($"user_id", $"start_ms", $"end_ms", $"n_events", $"total_value")
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("dynamic-gap session_window equals the interval-merge reference") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.eventsWithMs(spark, sf)
      .select($"user_id", $"event_id", $"ms", $"event_type")
    val got = EventStreams.dynamicSessionize(ev)
      .select($"user_id", $"start_ms", $"win_end_ms", $"n_events")
      .collect().map(_.toSeq).toSet
    // reference: per-event window [ms, ms + gap(type)); a session
    // breaks when an event starts at or after the running max end
    val gapMs = when($"event_type" === "purchase",
      lit(EventStreams.PurchaseGapMs)).otherwise(lit(EventStreams.DefaultGapMs))
    val w = Window.partitionBy($"user_id").orderBy($"ms", $"event_id")
    val want = ev
      .withColumn("end0", $"ms" + gapMs)
      .withColumn("prevMax", max($"end0").over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when($"prevMax".isNull || $"ms" >= $"prevMax", 1L).otherwise(0L))
      .withColumn("sid", sum($"brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sid")
      .agg(min($"ms").as("start_ms"), max($"end0").as("win_end_ms"),
        count(lit(1)).as("n_events"))
      .select($"user_id", $"start_ms", $"win_end_ms", $"n_events")
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty && got == want)
  }

  test("native session_window streams: emitted sessions are final batch sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents
    val stream = MemoryStream[Event]
    val q = EventStreams.sessionizeNative(stream.toDF())
      .writeStream.format("memory").queryName("native_sessions")
      .outputMode("append").start()
    try {
      events.grouped(math.max(1, events.size / 3 + 1)).foreach { chunk =>
        stream.addData(chunk); q.processAllAvailable()
      }
      val got = spark.table("native_sessions")
        .select($"user_id", $"start_ms", $"end_ms", $"n_events", $"total_value")
        .collect().map(_.toSeq).toSet
      val batch = operators.Sessionize.q14Sessionize(spark, sf)
        .select($"user_id", $"start_ms", $"end_ms", $"n_events", $"total_value")
        .collect().map(_.toSeq).toSet
      // append mode only emits sessions the watermark has sealed
      assert(got.nonEmpty && got.subsetOf(batch),
        s"${got.size} emitted, ${batch.size} batch, stray=${(got -- batch).take(3)}")
    } finally q.stop()
  }

  test("transformWithState sessionizer matches the flatMapGroupsWithState twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents
    // transformWithState requires the RocksDB state store provider
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = MemoryStream[Event]
    val q = EventStreams.sessionizeTws(stream.toDS())
      .writeStream.format("memory").queryName("tws_sessions")
      .outputMode("append").start()
    try {
      events.grouped(math.max(1, events.size / 4 + 1)).foreach { chunk =>
        stream.addData(chunk); q.processAllAvailable()
      }
      val closed = spark.table("tws_sessions").as[SessionOut].collect()
        .map(s => (s.user_id, s.session_id, s.n_events, s.start_ms, s.end_ms)).toSet
      val batch = operators.Sessionize.q14Sessionize(spark, sf)
        .select($"user_id", $"session_id", $"n_events", $"start_ms", $"end_ms")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      val lastPerUser = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val expectClosed = batch.filterNot { case (u, sid, _, _, _) => lastPerUser(u) == sid }
      assert(closed == expectClosed)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("file-source stream with RocksDB state store matches batch windowed agg") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // stage the events as parquet files — the kafka-less production
    // shape: a file stream source feeding a stateful agg whose state
    // lives in RocksDB (bounded heap at scale) instead of on-heap maps
    val srcDir = java.nio.file.Files.createTempDirectory("graft_fsrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    Tables.eventsWithMs(spark, sf)
      .select($"user_id", $"event_id", $"ms", $"event_type", $"value")
      .repartition(3).write.mode("overwrite").parquet(srcDir)
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("ms", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = EventStreams.windowedAgg(src)
      .writeStream.format("memory").queryName("file_win_agg")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_win_agg")
        .select(($"window_start_ms" / 3600000L).cast("long").as("hour_bucket"),
          $"event_type", $"n", $"total_value")
        .collect().map(_.toSeq).toSet
      val want = operators.Sessionize.st1WindowAgg(spark, sf)
        .collect().map(_.toSeq).toSet
      assert(got == want)
      // the state operator really ran on RocksDB
      val metrics = q.lastProgress.stateOperators.toSeq
        .flatMap(_.customMetrics.asScala.keys).mkString(",")
      assert(metrics.contains("rocksdb"), s"state metrics: $metrics")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("file-to-file streaming job recovers exactly-once across a restart") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.streaming.Trigger
    // the production shape: file source → transform → file sink, with
    // the checkpoint's offset log + sink manifest giving exactly-once
    // across process restarts
    val srcDir = java.nio.file.Files.createTempDirectory("graft_e2e_src").toString
    val sinkDir = java.nio.file.Files.createTempDirectory("graft_e2e_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_e2e_ckpt").toString
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("ms", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val all = Tables.eventsWithMs(spark, sf)
      .select($"user_id", $"event_id", $"ms", $"event_type", $"value")
    def transform(df: org.apache.spark.sql.DataFrame) =
      df.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id", $"ms", ($"value" * 2).as("v2"))
    def runOnce(): Unit = {
      val q = transform(spark.readStream.schema(schema).parquet(srcDir))
        .writeStream.format("parquet")
        .option("path", sinkDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // first half of the data arrives, the job runs and exits
    val Array(h1, h2) = all.randomSplit(Array(0.5, 0.5), seed = 7L)
    h1.write.mode("append").parquet(srcDir)
    runOnce()
    // more data lands; a NEW process resumes from the same checkpoint
    h2.write.mode("append").parquet(srcDir)
    runOnce()
    val got = spark.read.parquet(sinkDir)
      .select($"event_id", $"v2").as[(Long, Double)].collect().sorted.toSeq
    val want = transform(all)
      .select($"event_id", $"v2").as[(Long, Double)].collect().sorted.toSeq
    assert(got == want, s"${got.size} sink rows vs ${want.size} batch rows")
  }

  test("stateful file-to-file sessionize job with changelog checkpointing recovers across restart") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.streaming.Trigger
    // the full production shape for a STATEFUL job: file source →
    // flatMapGroupsWithState sessionizer → file sink, RocksDB store
    // with changelog checkpointing, killed and resumed mid-stream —
    // open-session state must survive the restart through the
    // checkpoint's changelog + snapshot
    val srcDir = java.nio.file.Files.createTempDirectory("graft_sess_src").toString
    val sinkDir = java.nio.file.Files.createTempDirectory("graft_sess_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sess_ckpt").toString
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("ms", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val events = loadEvents
    val prev = EventStreams.stateStoreConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    EventStreams.stateStoreConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    def runOnce(): Unit = {
      val src = spark.readStream.schema(schema).parquet(srcDir).as[Event]
      val q = EventStreams.sessionize(src)
        .writeStream.format("parquet")
        .option("path", sinkDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    try {
      // time-ordered halves: the first run closes what it can and
      // leaves every user's latest fragment open in RocksDB state; the
      // second run (a NEW query instance on the same checkpoint) must
      // resume from that state to close and number sessions correctly
      val (h1, h2) = events.splitAt(events.size / 2)
      spark.createDataset(h1).write.mode("append").parquet(srcDir)
      runOnce()
      spark.createDataset(h2).write.mode("append").parquet(srcDir)
      runOnce()
      val closed = spark.read.parquet(sinkDir).as[SessionOut].collect()
        .map(s => (s.user_id, s.session_id, s.n_events, s.start_ms, s.end_ms)).toSet
      val batch = operators.Sessionize.q14Sessionize(spark, sf)
        .select($"user_id", $"session_id", $"n_events", $"start_ms", $"end_ms")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      val lastPerUser = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val expectClosed = batch.filterNot { case (u, sid, _, _, _) => lastPerUser(u) == sid }
      assert(closed == expectClosed,
        s"${closed.size} closed vs ${expectClosed.size} expected")
      // changelog checkpointing really engaged: the state checkpoint
      // carries .changelog delta files, not only full snapshots
      val changelogs = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
        .filter(_.toString.endsWith(".changelog")).count()
      assert(changelogs > 0, s"no .changelog files under $ckpt")
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("streaming CDC upsert maintains the base table across batches and restarts") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // base snapshot on disk
    val baseDir = java.nio.file.Files.createTempDirectory("graft_cdc").toString + "/base"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdc_ckpt").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft_cdc_src").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "amount").write.parquet(baseDir)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("amount", DoubleType)))
    def runOnce(): Unit = {
      val changes = spark.readStream.schema(schema).parquet(srcDir)
      val q = graft.streaming.CdcStream.start(changes, baseDir, "id", ckpt)
      q.awaitTermination()
    }
    // batch 1: update id=2, insert id=4
    Seq((2L, "b2", 25.0), (4L, "d", 40.0)).toDF("id", "name", "amount")
      .write.mode("append").parquet(srcDir)
    runOnce()
    // a NEW query instance on the same checkpoint: update id=4 again
    // (cross-batch key repeat → last batch wins), insert id=5
    Seq((4L, "d2", 44.0), (5L, "e", 50.0)).toDF("id", "name", "amount")
      .write.mode("append").parquet(srcDir)
    runOnce()
    val got = spark.read.parquet(baseDir).as[(Long, String, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b2", 25.0), (3L, "c", 30.0),
      (4L, "d2", 44.0), (5L, "e", 50.0)), got.toString)
  }

  test("bucketed CDC merge rewrites only touched buckets, byte-identically elsewhere") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft_cdcb").toString
    val baseDir = root + "/base"
    val ckpt = root + "/ckpt"
    val srcDir = root + "/src"
    val nBuckets = 8
    // 64 keys spread over 8 buckets so plenty of buckets stay untouched
    val base = (1L to 64L).map(i => (i, s"n$i", i * 1.0)).toDF("id", "name", "amount")
    graft.streaming.CdcStream.writeBucketedBase(base, baseDir, "id", nBuckets)

    def inventory(): Map[String, (Long, String)] = {
      val out = scala.collection.mutable.Map.empty[String, (Long, String)]
      java.nio.file.Files.walk(java.nio.file.Paths.get(baseDir)).forEach { p =>
        if (p.toString.endsWith(".parquet")) {
          val bytes = java.nio.file.Files.readAllBytes(p)
          val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
          out(p.toString.stripPrefix(baseDir)) =
            (bytes.length.toLong, md.map("%02x".format(_)).mkString)
        }
      }
      out.toMap
    }
    def bucketsOf(ids: Seq[Long]): Set[Int] =
      ids.toDF("id").select(pmod(hash(col("id")), lit(nBuckets))).collect()
        .map(_.getInt(0)).toSet

    val before = inventory()
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("amount", DoubleType)))
    def runOnce(): Unit = {
      val changes = spark.readStream.schema(schema).parquet(srcDir)
      val q = graft.streaming.CdcStream.startBucketed(
        changes, baseDir, "id", nBuckets, ckpt)
      q.awaitTermination()
    }
    // batch 1: update id=3, insert id=100
    Seq((3L, "u3", 33.0), (100L, "new", 100.0)).toDF("id", "name", "amount")
      .write.mode("append").parquet(srcDir)
    runOnce()
    val after = inventory()
    val touched = bucketsOf(Seq(3L, 100L))
    def bucketOfPath(p: String): Int =
      "__bucket=(\\d+)".r.findFirstMatchIn(p).get.group(1).toInt
    val untouchedFiles = before.keys.filterNot(p => touched(bucketOfPath(p)))
    assert(untouchedFiles.nonEmpty, "test needs at least one untouched bucket")
    // untouched buckets: exact same files, byte for byte
    untouchedFiles.foreach { p =>
      assert(after.contains(p), s"untouched file $p disappeared")
      assert(after(p) == before(p), s"untouched file $p was rewritten")
    }
    // touched buckets: actually rewritten (no stale files survive)
    before.keys.filter(p => touched(bucketOfPath(p))).foreach { p =>
      assert(!after.contains(p), s"touched bucket still holds stale file $p")
    }
    // the merge itself is correct
    val got1 = spark.read.parquet(baseDir).select($"id", $"name", $"amount")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    val want1 = ((1L to 64L).filterNot(_ == 3L).map(i => (i, s"n$i", i * 1.0)) ++
      Seq((3L, "u3", 33.0), (100L, "new", 100.0))).sortBy(_._1)
    assert(got1 == want1, got1.toString)
    // batch 2 through a NEW query on the same checkpoint (restart):
    // cross-batch key repeat (100) takes the latest value
    Seq((100L, "new2", 101.0), (200L, "ins", 200.0)).toDF("id", "name", "amount")
      .write.mode("append").parquet(srcDir)
    runOnce()
    val got2 = spark.read.parquet(baseDir)
      .filter($"id".isin(100L, 200L, 3L))
      .select($"id", $"name", $"amount")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(got2 == Seq((3L, "u3", 33.0), (100L, "new2", 101.0),
      (200L, "ins", 200.0)), got2.toString)
  }

  test("bucketed CDC under key skew: a one-bucket delta rewrites only the hot bucket, within budget") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    import org.apache.spark.sql.types._
    // hot-partition regime: EVERY delta key lands in one bucket — the
    // worst skew a CDC feed can present. The merge must stay
    // bucket-scoped (7/8 of the base byte-identical) and complete
    // under a wall-clock budget: a regression to O(base) rewriting or
    // a skew-hostile join plan blows both.
    val root = java.nio.file.Files.createTempDirectory("graft_cdcskew").toString
    val baseDir = root + "/base"
    val nBuckets = 8
    val base = spark.range(1L, 200001L)
      .select($"id", concat(lit("n"), $"id").as("name"),
        ($"id" * 1.0).as("amount"))
    graft.streaming.CdcStream.writeBucketedBase(base, baseDir, "id", nBuckets)

    def bucketsOf(df: org.apache.spark.sql.DataFrame): Set[Int] =
      df.select(pmod(hash(col("id")), lit(nBuckets))).distinct()
        .collect().map(_.getInt(0)).toSet
    val hot = bucketsOf(Seq(7L).toDF("id")).head
    // updates: existing ids in the hot bucket; inserts: new ids there
    val updates = spark.range(1L, 200001L)
      .filter(pmod(hash(col("id")), lit(nBuckets)) === hot).limit(4000)
      .select($"id", lit("upd").as("name"), ($"id" * 2.0).as("amount"))
    val inserts = spark.range(200001L, 400001L)
      .filter(pmod(hash(col("id")), lit(nBuckets)) === hot).limit(4000)
      .select($"id", lit("ins").as("name"), ($"id" * 3.0).as("amount"))
    val delta = updates.union(inserts).cache()
    val nDelta = delta.count()
    assert(bucketsOf(delta) == Set(hot), "fixture must be one-bucket skewed")

    def inventory(): Map[String, String] = {
      val out = scala.collection.mutable.Map.empty[String, String]
      java.nio.file.Files.walk(java.nio.file.Paths.get(baseDir)).forEach { p =>
        if (p.toString.endsWith(".parquet")) {
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(java.nio.file.Files.readAllBytes(p))
          out(p.toString.stripPrefix(baseDir)) = md.map("%02x".format(_)).mkString
        }
      }
      out.toMap
    }
    val before = inventory()
    delta.write.mode("append").parquet(root + "/src")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("amount", DoubleType)))
    val t0 = System.nanoTime()
    val q = graft.streaming.CdcStream.startBucketed(
      spark.readStream.schema(schema).parquet(root + "/src"),
      baseDir, "id", nBuckets, root + "/ckpt")
    q.awaitTermination()
    val durSec = (System.nanoTime() - t0) / 1e9
    assert(durSec < 120.0, s"hot-bucket merge took $durSec s")
    val after = inventory()
    def bucketOfPath(p: String): Int =
      "__bucket=(\\d+)".r.findFirstMatchIn(p).get.group(1).toInt
    val untouched = before.keys.filterNot(p => bucketOfPath(p) == hot)
    assert(untouched.nonEmpty)
    untouched.foreach { p =>
      assert(after.get(p).contains(before(p)), s"untouched file $p changed")
    }
    before.keys.filter(p => bucketOfPath(p) == hot).foreach { p =>
      assert(!after.contains(p), s"hot bucket still holds stale file $p")
    }
    // merge landed: all updates applied, all inserts present
    val merged = spark.read.parquet(baseDir)
    assert(merged.filter($"name" === "upd").count() == 4000)
    assert(merged.filter($"name" === "ins").count() == 4000)
    assert(merged.count() == 200000L + 4000L, s"nDelta=$nDelta")
    delta.unpersist()
  }

  test("two concurrent queries drain one shared source independently") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents
    val stream = MemoryStream[Event]
    // one upstream, two independent stateful consumers — each query
    // tracks its own offsets and state in its own checkpoint
    val q1 = EventStreams.sessionize(stream.toDS())
      .writeStream.format("memory").queryName("mq_sessions")
      .outputMode("append").start()
    val q2 = EventStreams.windowedAgg(stream.toDF())
      .writeStream.format("memory").queryName("mq_win")
      .outputMode("complete").start()
    try {
      events.grouped(math.max(1, events.size / 3 + 1)).foreach { chunk =>
        stream.addData(chunk)
        q1.processAllAvailable(); q2.processAllAvailable()
      }
      val win = spark.table("mq_win")
        .select(($"window_start_ms" / 3600000L).cast("long"), $"event_type", $"n", $"total_value")
        .collect().map(_.toSeq).toSet
      val wantWin = operators.Sessionize.st1WindowAgg(spark, sf)
        .collect().map(_.toSeq).toSet
      assert(win == wantWin)
      assert(spark.table("mq_sessions").count() > 0)
    } finally { q1.stop(); q2.stop() }
  }

  test("batch-mode sessionizer with flush equals q14 exactly") {
    import spark.implicits._
    val ds = Tables.eventsWithMs(spark, sf)
      .select($"user_id", $"event_id", $"ms", $"event_type", $"value").as[Event]
    val got = EventStreams.sessionizeWithFlush(ds)
      .select($"user_id", $"session_id", $"n_events", $"start_ms", $"end_ms")
      .collect().map(_.toSeq).toSet
    val want = operators.Sessionize.q14Sessionize(spark, sf)
      .select($"user_id", $"session_id", $"n_events", $"start_ms", $"end_ms")
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }
}
