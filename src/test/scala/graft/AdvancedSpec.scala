package graft

import org.apache.spark.sql.functions._

class AdvancedSpec extends GraftSpecBase {
  import operators.Advanced

  test("asof join: matched click is at-or-before the purchase and is the latest one") {
    import spark.implicits._
    val out = Advanced.q16AsofJoin(spark, sf)
    assert(out.filter($"c_ms" > $"ms").count() == 0)
    // cross-check a purchase against a scala recompute
    val clicks = Tables.eventsWithMs(spark, sf).filter($"event_type" === "click")
      .select($"user_id", $"ms").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val rows = out.select($"user_id", $"ms", $"c_ms").as[(Long, Long, Long)].collect()
    rows.take(200).foreach { case (u, pms, cms) =>
      val want = clicks(u).filter(_ <= pms).max
      assert(cms == want, s"user $u purchase@$pms: got $cms want $want")
    }
  }

  test("range join counts agree with a naive per-user recompute") {
    import spark.implicits._
    val got = Advanced.q17RangeJoin(spark, sf)
      .as[(Long, Long)].collect().toMap
    val ev = Tables.eventsWithMs(spark, sf)
      .select($"user_id", $"event_id", $"ms").as[(Long, Long, Long)].collect()
      .groupBy(_._1)
    val want = ev.view.mapValues { es =>
      (for {
        a <- es; b <- es
        if a._2 < b._2 && math.abs(a._3 - b._3) <= Advanced.RangeToleranceMs
      } yield 1).size.toLong
    }.filter(_._2 > 0).toMap
    assert(got == want)
  }

  test("cube has rollup rows for every grouping set") {
    import spark.implicits._
    val out = Advanced.q19Cube(spark, sf).cache()
    val grand = out.filter($"r_name".isNull && $"c_mktsegment".isNull)
    assert(grand.count() == 1)
    val nCust = Tables.customer(spark, sf).count()
    assert(grand.select($"n_cust").as[Long].head() == nCust)
    // segment-only marginals sum to the grand total too
    val segOnly = out.filter($"r_name".isNull && $"c_mktsegment".isNotNull)
    assert(segOnly.agg(sum($"n_cust")).as[Long].head() == nCust)
  }

  test("approx distinct within 5% of exact") {
    import spark.implicits._
    val got = Advanced.q21ApproxDistinct(spark, sf)
      .select($"l_returnflag", $"approx_parts").as[(String, Long)].collect().toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag").agg(countDistinct($"l_partkey").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      val a = got(k)
      assert(math.abs(a - n).toDouble / n <= 0.05, s"$k: approx $a vs exact $n")
    }
  }

  test("approx percentile tracks exact percentile closely") {
    import spark.implicits._
    val approx = Advanced.q24ApproxPercentile(spark, sf)
      .select($"event_type", $"p50").as[(String, Double)].collect().toMap
    val exact = Advanced.q20Percentile(spark, sf)
      .select($"event_type", $"p50").as[(String, Double)].collect().toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e) / math.max(e, 1.0) <= 0.1,
        s"$k: approx ${approx(k)} vs exact $e")
    }
  }

  test("percentiles are ordered p25 <= p50 <= p90") {
    import spark.implicits._
    val bad = Advanced.q20Percentile(spark, sf)
      .filter($"p25" > $"p50" || $"p50" > $"p90")
    assert(bad.count() == 0)
  }

  test("q30: hot user folds only the horizon suffix, n_events stays total") {
    import spark.implicits._
    // one user with far more events than the horizon, one small user —
    // the hot user's fold must cover exactly the last EwmaHorizon
    // events in time order while n_events still reports the full count
    val dir = java.nio.file.Files.createTempDirectory("graft_q30").toString
    val hot = (0 until 1000).map { i =>
      (1000000000000000000L + i * 1000000L, i.toLong, 1L, ((i * 37) % 100) / 3.0)
    }
    val small = (0 until 10).map { i =>
      (1000000000000000000L + i * 1000000L, 10000L + i, 2L, i * 1.5)
    }
    (hot ++ small).toDF("ts", "event_id", "user_id", "value")
      .write.parquet(s"$dir/events.parquet")
    def ref(vals: Seq[Double]): Double = {
      val tail = vals.takeRight(Advanced.EwmaHorizon)
      val folded = tail.tail.foldLeft(tail.head) { (acc, x) =>
        Advanced.EwmaAlpha * x + (1 - Advanced.EwmaAlpha) * acc
      }
      math.floor(folded * 10000) / 10000.0
    }
    val got = Advanced.q30Ewma(spark, dir)
      .select($"user_id", $"n_events", $"ewma")
      .as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 1000, ref(hot.sortBy(e => (e._1, e._2)).map(_._4))),
      (2L, 10, ref(small.map(_._4)))), got.toString)
  }
}
