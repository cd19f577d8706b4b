package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{EventStreams, FunnelStream}
import graft.streaming.EventStreams.Event
import graft.streaming.FunnelStream.FunnelUpgrade

/** Round-7 operators: the q62 approximate candidate path (LSH over
  * adjacency lists) and its recall contract against the exact wedge
  * enumeration. */
class Round7OpsSpec extends GraftSpecBase {
  import spark.implicits._

  // ---------------- q62 LSH candidate path ----------------

  test("q62_lsh: recalls >= 0.7 of the exact top-50 and reports exact jaccard on every pair") {
    val exact = operators.Graph.q62LinkPredict(spark, sf)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    val approx = operators.Graph.q62LinkLsh(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(approx.nonEmpty)
    val approxPairs = approx.map(r => (r._1, r._2)).toSet
    val recall = (approxPairs & exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall vs exact top-50 (got ${approxPairs.size} pairs)")
    // every reported pair: canonical non-edge, exact common count and
    // quantized jaccard vs a local neighbor-set recount (the same
    // contract the exact entry's spec pins)
    val e = operators.Analytics.copurchasePairs(spark, sf)
      .filter($"n_orders" >= 2)
      .select($"pa", $"pb").as[(Long, Long)].collect().toSet
    val nbrs = (e.toSeq ++ e.toSeq.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    approx.foreach { case (a, b, common, j) =>
      assert(a < b && !e.contains((a, b)), s"($a,$b) must be a canonical non-edge")
      val inter = (nbrs(a) & nbrs(b)).size
      val union = (nbrs(a) | nbrs(b)).size
      assert(common == inter, s"($a,$b): common $common vs local $inter")
      assert(math.abs(j - math.floor(common.toDouble * 10000 / union) / 10000.0) < 1e-12)
    }
    // ranking is jaccard desc with (a, b) tie-break
    val sorted = approx.sortBy { case (a, b, _, j) => (-j, a, b) }.toSeq
    assert(approx.toSeq == sorted)
  }

  test("q62_lsh: identical neighbor sets always pair (duplicate-compressed intra path)") {
    // two nodes with the SAME adjacency list have identical signatures
    // and J = 1.0 — they must survive every banding configuration, so
    // every J=1.0 pair of the exact top-50 is in the approximate output
    val exact = operators.Graph.q62LinkPredict(spark, sf)
      .filter($"jaccard" === 1.0)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    val approx = operators.Graph.q62LinkLsh(spark, sf)
      .filter($"jaccard" === 1.0)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(approx),
      s"missing J=1.0 pairs: ${(exact -- approx).take(5)}")
  }

  // ---------------- m11 gamma from a shuffle budget ----------------

  private def m11Achieved(gamma: Double): Long = {
    val joined = ml.Recommender.m11Contribs(spark, sf)
    val p = least(lit(1.0), lit(gamma) / $"nn")
    val coin = pmod(xxhash64(lit(42), $"user", $"ia", $"ib"),
      lit(1000000007L)).cast("double") / 1000000007.0
    joined.filter(coin < p).count()
  }

  test("m11 budget: solved gamma is monotone in budget and lands the shuffle inside the band") {
    val total = ml.Recommender.m11Contribs(spark, sf).count()
    val budgets = Seq(total / 8, total / 4, total / 2)
    val gammas = budgets.map(b =>
      ml.Recommender.m11GammaForBudget(spark, sf, b))
    assert(gammas == gammas.sorted,
      s"gamma must grow with budget: ${budgets.zip(gammas)}")
    // achieved post-sampling contribution count vs the asked budget:
    // at this corpus size the solver runs exact (adaptive mod 1), so
    // the band only absorbs coin noise + grid interpolation
    budgets.zip(gammas).foreach { case (b, g) =>
      val got = m11Achieved(g)
      assert(got >= b * 7 / 10 && got <= b * 14 / 10,
        s"budget $b -> gamma $g -> achieved $got (outside [0.7x, 1.4x])")
    }
  }

  test("m11 budget: recall/volume trade across three gammas — volume buys recall") {
    val exactTop = ml.Recommender.m10ItemCosine(spark, sf)
      .select($"item", $"nbr").as[(Long, Long)].collect().toSet
    def recallAt(gamma: Double): (Long, Double) = {
      val approx = ml.Recommender.m11Dimsum(spark, sf, gamma)
        .select($"item", $"nbr").as[(Long, Long)].collect().toSet
      (m11Achieved(gamma), (exactTop & approx).size.toDouble / exactTop.size)
    }
    // gammas off the nn distribution itself (the default keeps every
    // pair at this tiny SF — mean-n² sits above most norm products):
    // starved (10th pct), moderate (median), exhaustive
    val Seq(gLo, gMid) = ml.Recommender.m11Contribs(spark, sf)
      .agg(expr("approx_percentile(nn, array(0.1, 0.5), 1000)"))
      .as[Seq[Double]].head().toSeq
    val curve = Seq(gLo, gMid, 1e15).map(recallAt)
    // volumes strictly increase with gamma
    assert(curve.map(_._1) == curve.map(_._1).sorted &&
      curve.map(_._1).distinct.size == 3, s"volumes not increasing: $curve")
    // gamma -> infinity samples nothing away: exact recall 1.0, and
    // recall is non-decreasing along the curve — volume buys recall
    assert(curve.last._2 == 1.0, s"exhaustive recall != 1: $curve")
    assert(curve.head._2 <= curve(1)._2 && curve(1)._2 <= curve.last._2,
      s"recall not improving along the curve: $curve")
  }

  // ---------------- q61 fold + streaming funnel twin ----------------

  test("q61_fold: the state-machine fold equals the join ladder exactly") {
    val ladder = operators.Advanced.q61WindowFunnel(spark, sf)
      .as[(Int, Long)].collect().toSeq
    val fold = operators.Advanced.q61FunnelFold(spark, sf)
      .as[(Int, Long)].collect().toSeq
    assert(fold == ladder, s"fold $fold vs ladder $ladder")
  }

  test("streaming funnel twin matches the batch fold, one upgrade per (user, level)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.eventsWithMs(spark, sf)
      .select($"user_id", $"event_id", $"ms", $"event_type", $"value")
      .as[Event].collect().toSeq.sortBy(e => (e.ms, e.event_id))
    // transformWithState requires the RocksDB state store provider
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = MemoryStream[Event]
    val q = FunnelStream.funnelUpgrades(stream.toDS())
      .writeStream.format("memory").queryName("funnel_upgrades")
      .outputMode("append").start()
    try {
      // batch-monotone chunks (events pre-sorted by ms)
      events.grouped(math.max(1, events.size / 4 + 1)).foreach { chunk =>
        stream.addData(chunk); q.processAllAvailable()
      }
      val ups = spark.table("funnel_upgrades").as[FunnelUpgrade].collect()
      // at-most-once per (user, level): state persisting across batches
      // must never re-emit a level already reached
      assert(ups.map(u => (u.user_id, u.funnel_level)).distinct.length == ups.length)
      // deepest level per user + level-0 remainder == batch q61
      val deepest = ups.groupBy(_.user_id).view.mapValues(_.map(_.funnel_level).max)
      val allUsers = events.map(_.user_id).distinct
      val got = allUsers.map(u => deepest.getOrElse(u, 0))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val want = operators.Advanced.q61WindowFunnel(spark, sf)
        .as[(Int, Long)].collect().toMap
      assert(got == want, s"stream $got vs batch $want")
      // upgrades are monotone per user: level k emitted before k+1
      ups.groupBy(_.user_id).values.foreach { us =>
        val byMs = us.sortBy(u => (u.ms, u.funnel_level)).map(_.funnel_level).toSeq
        assert(byMs == byMs.sorted, s"non-monotone upgrades: ${us.toSeq}")
      }
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
