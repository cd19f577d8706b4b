package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.AnomalyStream

/** Streaming rate-anomaly alerting: closed-window scoring, expanding
  * in-batch history, replay idempotence. */
class AnomalyStreamSpec extends GraftSpecBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("ms", LongType), StructField("event_type", StringType)))

  private val H = 3600000L

  /** steady: 5 events/hour for `web` and `api`, hours 0..11;
    * spike: `err` runs 5/hour except 60 at hour 8;
    * a lone hour-20 `web` event pushes the watermark past hour 19. */
  private def makeEvents(hours: Range): Seq[(Long, String)] = {
    val steady = for {
      h <- hours; t <- Seq("web", "api", "err"); i <- 0 until 5
      if !(t == "err" && h == 8)
    } yield (h * H + i * 60000L, t)
    val spike = if (hours.contains(8))
      (0 until 60).map(i => (8 * H + i * 30000L, "err")) else Seq.empty
    steady ++ spike
  }

  test("anomaly stream alerts on the spiked hour only, across a restart, replay-idempotent") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_an_src").toString
    val statsDir = java.nio.file.Files.createTempDirectory("graft_an_stats").toString + "/stats"
    val alertDir = java.nio.file.Files.createTempDirectory("graft_an_alerts").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_an_ckpt").toString
    def runOnce(): Unit = {
      val src = spark.readStream.schema(schema).parquet(srcDir)
      val q = AnomalyStream.start(src, statsDir, alertDir, ckpt)
      q.awaitTermination()
    }
    // first half: hours 0..5 — history builds, nothing can alert yet
    makeEvents(0 until 6).toDF("ms", "event_type")
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    assert(AnomalyStream.alerts(spark, alertDir).count() == 0)
    // second half arrives (spike at hour 8) + a watermark pusher
    (makeEvents(6 until 12) :+ (20 * H, "web")).toDF("ms", "event_type")
      .coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    val alerts = AnomalyStream.alerts(spark, alertDir)
      .select($"event_type", $"hour_ms", $"n_events")
      .as[(String, Long, Long)].collect().toSet
    assert(alerts == Set(("err", 8 * H, 60L)), s"got $alerts")
    // steady types never alert; stats carry every type
    val stats = AnomalyStream.currentStats(spark, statsDir)
    assert(stats.select($"event_type").as[String].collect().toSet ==
      Set("web", "api", "err"))
    // restart with nothing new: no duplicate alerts, stats unchanged
    val statsBefore = stats.orderBy($"event_type").collect().toSeq
    runOnce()
    assert(AnomalyStream.alerts(spark, alertDir).count() == 1)
    assert(AnomalyStream.currentStats(spark, statsDir).orderBy($"event_type")
      .collect().toSeq == statsBefore)
    // versioned promotion: exactly one complete version remains after
    // pruning, and a dangling incomplete version is never read
    val vs = Option(new java.io.File(statsDir).listFiles()).get
      .filter(_.getName.startsWith("v-"))
    assert(vs.length == 1, s"expected one pruned version, got ${vs.toSeq}")
    val fake = new java.io.File(statsDir, "v-999999")
    assert(fake.mkdirs()) // no _SUCCESS: incomplete, must be ignored
    assert(AnomalyStream.currentStats(spark, statsDir).orderBy($"event_type")
      .collect().toSeq == statsBefore)
  }

  test("single-drain arrival still alerts only the spike — the in-batch expanding prefix") {
    // everything in ONE batch: each window must score against only the
    // strictly earlier windows of the same batch
    val closed = makeEvents(0 until 12)
      .toDF("ms", "event_type")
      .groupBy(expr("ms div 3600000").as("hour_ms"), $"event_type")
      .agg(count(lit(1)).as("n_events"))
      .select(($"hour_ms" * H).as("hour_ms"), $"event_type", $"n_events")
    val empty = Seq.empty[(String, Long, Double, Double, Long)]
      .toDF("event_type", "n", "s", "q", "last_batch")
    val (alerts, folded) = AnomalyStream.scoreBatch(closed, empty)
    val got = alerts.select($"event_type", $"hour_ms", $"n_events")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("err", 8 * H, 60L)), s"got $got")
    // folded sufficient statistics match direct recomputation
    val f = folded.filter($"event_type" === "web")
      .select($"n", $"s").as[(Long, Double)].head()
    assert(f == ((12L, 60.0)), s"got $f")
  }
}
