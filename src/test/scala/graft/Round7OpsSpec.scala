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

  test("lsh solver: meets the recall floor, minimizes background collisions, tracks the threshold") {
    def p(b: Int, r: Int, j: Double) = 1.0 - math.pow(1.0 - math.pow(j, r), b)
    // reproduces the hand-tuned q62 config at its regime
    val (b1, r1) = operators.Dedup.lshConfig(64, 0.5, 0.95, 0.1)
    assert((b1, r1) == (32, 2), s"got ($b1, $r1)")
    assert(p(b1, r1, 0.5) >= 0.95)
    // a higher target similarity solves to a more selective row width
    val (_, rHi) = operators.Dedup.lshConfig(64, 0.9, 0.95, 0.1)
    assert(rHi > r1, s"rows $rHi should exceed $r1 at J* = 0.9")
    // infeasible (tiny signature, impossible floor) falls back to the
    // most sensitive config
    assert(operators.Dedup.lshConfig(4, 0.05, 0.99, 0.01) == (4, 1))
    // background estimator: slot agreement is the J estimate
    val half = Seq(Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 9L, 8L)).toDF("sig")
    assert(operators.Dedup.estimateBackgroundJaccard(half) == 0.5)
    val disj = Seq(Seq(1L, 2L, 3L, 4L), Seq(5L, 6L, 7L, 8L)).toDF("sig")
    assert(operators.Dedup.estimateBackgroundJaccard(disj) == 0.0)
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

  test("streaming sentiment scoring matches the batch pipeline bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val model = ml.Sentiment.fit(spark, sf)
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      .as[(Long, String)].collect().toSeq
    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.SentimentStream
      .scoreStream(model, stream.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sent_scores")
      .outputMode("append").start()
    try {
      docs.grouped(docs.size / 3 + 1).foreach { c =>
        stream.addData(c); q.processAllAvailable()
      }
      val got = spark.table("sent_scores")
        .select($"doc_id", $"p_positive").as[(Long, Double)].collect().toMap
      val want = graft.streaming.SentimentStream
        .scoreStream(model, Tables.documents(spark, sf).select($"doc_id", $"text"))
        .select($"doc_id", $"p_positive").as[(Long, Double)].collect().toMap
      assert(got.size == docs.size)
      assert(got == want, "stream scores must equal batch scores")
    } finally q.stop()
  }

  test("m12: ndcg matches a local replay from the served slate and the rating matrix") {
    val row = ml.Recommender.m12Ndcg(spark, sf)
      .as[(Long, Double)].head()
    val recs = ml.Recommender.m1AlsRecommend(spark, sf)
      .select($"c_custkey", $"rnk", $"p_partkey")
      .as[(Long, Int, Long)].collect()
    val rel = ml.Recommender.ratings(spark, sf)
      .select($"user", $"item", $"rating".cast("double"))
      .as[(Long, Long, Double)].collect()
      .map { case (u, i, r) => (u, i) -> r }.toMap
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val byUser = recs.groupBy(_._1)
    val ndcgs = byUser.map { case (u, rs) =>
      val dcg = rs.map { case (_, rnk, item) =>
        rel.getOrElse((u, item), 0.0) / log2(rnk + 1.0) }.sum
      // .toSeq BEFORE collect: collecting (r, ii) pairs out of a Map
      // would re-map BY RATING and collapse equal-rated items
      val ideal = rel.toSeq.collect { case ((uu, ii), r) if uu == u => (r, ii) }
        .sortBy { case (r, ii) => (-r, ii) }.take(5)
        .zipWithIndex.map { case ((r, _), p) => r / log2(p + 2.0) }.sum
      if (ideal > 0) dcg / ideal else 0.0
    }
    assert(row._1 == byUser.size.toLong)
    val want = math.floor(ndcgs.sum / ndcgs.size * 10000) / 10000.0
    assert(math.abs(row._2 - want) <= 1e-4 + 1e-12,
      s"mean ndcg ${row._2} vs local $want")
    assert(row._2 > 0.0 && row._2 <= 1.0)
  }

  test("q74: profile is one joinless pass and matches a local replay") {
    val rows = operators.Analytics.q74Profile(spark, sf)
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.size == 6)
    val o = Tables.orders(spark, sf)
      .select($"o_orderkey", floor($"o_totalprice" * 100).cast("long").as("cents"))
      .as[(Long, Long)].collect()
    val ok = rows("o_orderkey")
    assert(ok._2 == 0L && ok._3 == o.map(_._1).distinct.length.toLong)
    assert(ok._4 == o.map(_._1).min.toString && ok._5 == o.map(_._1).max.toString)
    val tp = rows("o_totalprice")
    assert(tp._4 == o.map(_._2).min.toString && tp._5 == o.map(_._2).max.toString)
    // plan (round-14 shape): the null/min/max stats and the distinct
    // counts are TWO sort-free aggregations — string min/max buffers
    // force SortAggregate, and planting them on the 6-way Expand
    // stream sorted rows×6 expanded rows (the r13 3.1 s self-median).
    // The only join is the broadcast of two ONE-ROW aggregate frames;
    // no data-scale join strategy may appear, and the Expand stream
    // must dedup hash-based (never a Sort directly over the Expand).
    val p = operators.Analytics.q74Profile(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    assert("Sort \\(\\d+\\)\\s*\\n\\s*\\+- Expand".r.findFirstIn(p).isEmpty,
      s"expand stream fell back to sort-based dedup:\n$p")
  }

  test("q75: sketch profile matches q74 on nulls/min/max; estimates inside the lgK band") {
    val exact = operators.Analytics.q74Profile(spark, sf)
      .as[(String, Long, Long, String, String)].collect().map(r => r._1 -> r).toMap
    val sk = operators.Analytics.q75ProfileSketch(spark, sf)
      .as[(String, Long, Long, String, String)].collect().map(r => r._1 -> r).toMap
    assert(sk.keySet == exact.keySet)
    sk.foreach { case (n, (_, nn, nd, mn, mx)) =>
      val e = exact(n)
      assert(nn == e._2 && mn == e._4 && mx == e._5, s"$n non-distinct stats diverged")
      val err = math.abs(nd - e._3).toDouble / math.max(e._3, 1L)
      assert(err < 0.03, s"$n: sketch $nd vs exact ${e._3} (err $err)")
    }
  }

  test("q73: family labels are edge-consistent and equal each component's minimum id") {
    val lab = operators.Graph.q73PartFamilies(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(lab.nonEmpty)
    val fam = lab.map(r => r._1 -> r._2).toMap
    val e = operators.Analytics.copurchasePairs(spark, sf)
      .filter($"n_orders" >= 2).select($"pa", $"pb").as[(Long, Long)].collect()
    e.foreach { case (a, b) =>
      assert(fam(a) == fam(b), s"edge ($a,$b) crosses families ${fam(a)}/${fam(b)}")
    }
    // the label IS the component minimum, and sizes tie out
    lab.groupBy(_._2).foreach { case (fid, members) =>
      assert(members.map(_._1).min == fid)
      assert(members.forall(_._3 == members.length.toLong))
    }
  }

  // ---------------- q66 k-core ----------------

  test("q66: the peel budget converges and survivors carry exact in-core degrees >= k") {
    val r8 = operators.Graph.q66Kcore(spark, sf).as[(Long, Long)].collect().toSeq
    val r9 = operators.Graph.q66Kcore(spark, sf,
      rounds = operators.Graph.KcoreRounds + 1).as[(Long, Long)].collect().toSeq
    assert(r8.nonEmpty)
    assert(r8 == r9, "corpus must converge within the fixed round budget")
    assert(r8.forall(_._2 >= 3L))
    // survivors induce a subgraph whose locally recomputed degrees
    // match the reported in-core degrees exactly
    val e = operators.Analytics.copurchasePairs(spark, sf)
      .filter($"n_orders" >= 2).select($"pa", $"pb").as[(Long, Long)].collect()
    val core = r8.map(_._1).toSet
    val deg = e.filter(p => core(p._1) && core(p._2))
      .flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    r8.foreach { case (n, d) =>
      assert(deg.getOrElse(n, 0L) == d, s"node $n: reported $d vs induced ${deg.get(n)}")
    }
  }

  // ---------------- q67 local clustering coefficient ----------------

  test("q67: corner credits tie out with q54's triangle census; lcc within [0, 1]") {
    val lcc = operators.Graph.q67ClusteringCoef(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(lcc.nonEmpty)
    assert(lcc.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    // each triangle credits exactly its three corners
    val census = operators.Graph.q54Triangles(spark, sf)
      .select($"n_triangles").as[Long].head()
    assert(lcc.map(_._3).sum == 3L * census,
      s"sum n_tri ${lcc.map(_._3).sum} vs 3×$census")
    // a node's triangles never exceed its wedge count
    lcc.foreach { case (n, deg, tri, _) =>
      assert(tri <= deg * (deg - 1) / 2, s"node $n: $tri triangles > C($deg,2)")
    }
  }

  // ---------------- q68 Lorenz deciles + Gini ----------------

  test("q68: Lorenz curve is monotone and ties out; gini matches a local exact recompute") {
    val rows = operators.Analytics.q68SpendConcentration(spark, sf)
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(rows.map(_._1) == (1L to 10L))
    // Lorenz: cum_share nondecreasing, convex-ish tail, ends at 1.0
    val cum = rows.map(_._5)
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b })
    assert(cum.last == 1.0)
    assert(rows.map(_._4).zip(rows.map(_._4).tail).forall { case (a, b) => a <= b },
      "ascending deciles must have nondecreasing share")
    // exact local recompute of Gini from per-customer cents
    val cents = Tables.orders(spark, sf)
      .groupBy($"o_custkey")
      .agg(sum(expr("cast(floor(o_totalprice * 100) as bigint)")).as("c"))
      .select($"o_custkey", $"c").as[(Long, Long)].collect()
      .sortBy(p => (p._2, p._1)).map(_._2)
    assert(rows.map(_._2).sum == cents.length)
    val n = BigInt(cents.length)
    val t = cents.map(BigInt(_)).sum
    val s2 = cents.zipWithIndex.map { case (c, i) => BigInt(i + 1) * c }.sum
    val giniQ = ((2 * s2 - (n + 1) * t) * 10000 / (n * t)).toLong / 10000.0
    assert(rows.forall(_._6 == giniQ), s"gini ${rows.head._6} vs local $giniQ")
  }

  // ---------------- p12 deterministic stratified sample ----------------

  test("p12: selection equals the local modular rule; rerun-identical") {
    val got = operators.Sampling.p12StratifiedSample(spark, sf)
      .as[(Long, String)].collect().toSeq
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toSeq
    def k(lang: String): Long =
      if (lang == "en") 20L else if (lang == "zh") 5L else 10L
    val want = docs.filter { case (id, l) => (id * 7919L) % k(l) == 0L }
      .sortBy(_._1)
    assert(got == want)
    // deterministic across reruns (the property RNG sampling can't give)
    val again = operators.Sampling.p12StratifiedSample(spark, sf)
      .as[(Long, String)].collect().toSeq
    assert(again == got)
    // systematic rate: 7919 coprime to k ⇒ any k consecutive ids hold
    // exactly one selected id, so per-stratum counts track N_h/k up to
    // the strata's id-gap slack
    val byLang = docs.groupBy(_._2).view.mapValues(_.size).toMap
    val gotByLang = got.groupBy(_._2).view.mapValues(_.size).toMap
    byLang.foreach { case (l, nh) =>
      val rate = gotByLang.getOrElse(l, 0).toDouble * k(l) / nh
      assert(rate > 0.5 && rate < 1.5, s"stratum $l rate off: $rate")
    }
  }

  // ---------------- t15 Misra-Gries heavy hitters ----------------

  test("t15: MG bound holds in both directions against exact counts; report line is sound") {
    import graft.functions.TextFunctions.tokens
    val exact = Tables.documents(spark, sf)
      .select(explode(tokens($"text")).as("token")).filter($"token" =!= "")
      .groupBy($"token").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val total = exact.values.sum
    val margin = total / (operators.TextAnalysis.MgCapacity + 1L)
    val sketch = operators.TextAnalysis.t15HeavySketch(spark, sf)
      .as[(String, Long)].collect().toSeq
    assert(sketch.nonEmpty)
    sketch.foreach { case (tok, est) =>
      val t = exact.getOrElse(tok, 0L)
      assert(est <= t, s"$tok: est $est exceeds true $t (MG must underestimate)")
      assert(est >= t - margin, s"$tok: est $est below true $t - margin $margin")
    }
    // no false positives vs t6's exact 3.3% line (est <= true)
    val t6 = operators.TextAnalysis.t6HeavyHitters(spark, sf)
      .select($"token").as[String].collect().toSet
    assert(sketch.map(_._1).toSet.subsetOf(t6))
    // guaranteed presence: anything an MG margin ABOVE the line reports
    exact.foreach { case (tok, n) =>
      if (n * 1000 >= total * 33 + margin * 1000)
        assert(sketch.exists(_._1 == tok), s"$tok at $n/$total must be reported")
    }
  }

  // ---------------- OPTIMIZE ... ZORDER composition ----------------

  test("optimizeZorder: exact file count, content identity, non-overlapping z-ranges, real file pruning") {
    val src = java.nio.file.Files.createTempDirectory("zopt-src").toString
    val dst = java.nio.file.Files.createTempDirectory("zopt-dst").toString
    val base = Tables.lineitem(spark, sf)
      .select($"l_partkey", $"l_suppkey", $"l_orderkey")
    base.repartition(16).write.mode("overwrite").parquet(src)
    val n = base.count()
    val parts = operators.Layout.optimizeZorder(spark, src, dst,
      (n + 3) / 4, "l_partkey", "l_suppkey")
    assert(parts == 4)
    val out = spark.read.parquet(dst)
    val files = new java.io.File(dst).listFiles
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4, files.map(_.getName).toSeq.toString)
    // full-multiset content identity across the rewrite
    assert(out.count() == n)
    assert(out.exceptAll(base).isEmpty && base.exceptAll(out).isEmpty)
    // a sorted sequence cut into contiguous rank buckets -> per-file
    // z-key intervals are non-overlapping (boundary equality allowed)
    val zf = out.select(input_file_name().as("f"),
        operators.Layout.zorderKey($"l_partkey", $"l_suppkey").as("z"))
      .groupBy($"f").agg(min($"z").as("lo"), max($"z").as("hi"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    zf.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._2, s"$a overlaps $b")
      case _ =>
    }
    // footer-stat pruning on the z2 box: the fragmented source admits
    // every file; the z-ordered rewrite admits strictly fewer than all
    def candFiles(dir: String): Long =
      spark.read.parquet(dir)
        .select(input_file_name().as("f"), $"l_partkey", $"l_suppkey")
        .groupBy($"f").agg(
          min($"l_partkey").as("p0"), max($"l_partkey").as("p1"),
          min($"l_suppkey").as("s0"), max($"l_suppkey").as("s1"))
        .filter($"p1" >= 10 && $"p0" <= 40 && $"s1" >= 1 && $"s0" <= 6)
        .count()
    assert(candFiles(src) == 16, "fragmented layout should admit every file")
    assert(candFiles(dst) < 4, s"z-ordered layout must prune: ${candFiles(dst)}")
  }

  // ---------------- q70 sampled triangle census ----------------

  test("q70: p = 1 reproduces q54's exact census; thinning contracts the edge set") {
    val full = operators.Graph.q70TriangleSample(spark, sf, p1000 = 1000L)
      .select($"n_tri_sampled", $"est_triangles".cast("long"))
      .as[(Long, Long)].head()
    val exact = operators.Graph.q54Triangles(spark, sf)
      .select($"n_edges", $"n_triangles").as[(Long, Long)].head()
    assert(full._1 == exact._2, s"p=1 sampled ${full._1} vs exact ${exact._2}")
    assert(full._2 == exact._2, s"p=1 estimate must be exact: ${full._2}")
    val half = operators.Graph.q70TriangleSample(spark, sf, p1000 = 500L)
      .select($"n_edges_sampled", $"n_tri_sampled", $"est_triangles".cast("long"))
      .as[(Long, Long, Long)].head()
    // the coin keeps ~half the edges (deterministic, so a wide band
    // only absorbs hash clumping on a small graph)
    assert(half._1 > exact._1 / 4 && half._1 < exact._1 * 3 / 4,
      s"thinned edges ${half._1} of ${exact._1} outside (1/4, 3/4)")
    // deterministic coin -> rerun-identical
    val again = operators.Graph.q70TriangleSample(spark, sf, p1000 = 500L)
      .select($"n_tri_sampled").as[Long].head()
    assert(again == half._2)
    // estimator arithmetic: est = sampled * 8 exactly at p = 0.5
    assert(half._3 == half._2 * 8L)
  }

  test("q71: p = 1 equals q67 bit-for-bit; per-node estimates tie out with q70's census") {
    val full = operators.Graph.q71LccSample(spark, sf, p1000 = 1000L)
      .select($"l_partkey", $"deg", $"tri_est".cast("long"), $"lcc_est")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val exact = operators.Graph.q67ClusteringCoef(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(full == exact, "p = 1 must reproduce the exact lcc table")
    val half = operators.Graph.q71LccSample(spark, sf, p1000 = 500L)
      .select($"tri_est".cast("long")).as[Long].collect()
    val census = operators.Graph.q70TriangleSample(spark, sf, p1000 = 500L)
      .select($"est_triangles".cast("long")).as[Long].head()
    // every triangle credits exactly three corners, sampled or not —
    // the scale factor (x8 at p = 1/2) is exact integer both places
    assert(half.sum == 3L * census, s"${half.sum} vs 3 x $census")
    val again = operators.Graph.q71LccSample(spark, sf, p1000 = 500L)
      .select($"tri_est".cast("long")).as[Long].collect()
    assert(again.toSeq == half.toSeq)
  }

  test("q72: merged daily sketches equal the direct weekly sketch; error within the lgK=14 band") {
    val rows = operators.Analytics.q72HllRollup(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (wk, nDays, est, exact) =>
      assert(nDays >= 1 && nDays <= 7)
      val err = math.abs(est - exact).toDouble / exact
      assert(err < 0.03, s"week $wk: est $est vs exact $exact (err $err)")
    }
    // register-max merge identity: union of per-day sketches == the
    // sketch built directly over the whole week's raw data
    val ev = Tables.eventsWithMs(spark, sf)
      .select(expr("ms div 86400000L").as("day"), $"user_id")
    val direct = ev.groupBy(expr("day div 7L").as("week"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").as("d"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (wk, _, est, _) =>
      assert(direct(wk) == est, s"week $wk: merged $est vs direct ${direct(wk)}")
    }
  }

  test("q72 storage claim: sketches survive a parquet round-trip and union identically") {
    // the incremental-view pattern q72 documents: per-day sketches are
    // STORED (binary column in the day's partition), and later rollups
    // read sketches, not raw data — prove the persisted path estimates
    // exactly what the in-memory path does
    val dir = java.nio.file.Files.createTempDirectory("hll-store").toString
    val ev = Tables.eventsWithMs(spark, sf)
      .select(expr("ms div 86400000L").as("day"), $"user_id")
    ev.groupBy($"day")
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      .write.mode("overwrite").parquet(dir)
    val fromDisk = spark.read.parquet(dir)
      .groupBy(expr("day div 7L").as("week"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))").as("est"))
      .as[(Long, Long)].collect().toMap
    val live = operators.Analytics.q72HllRollup(spark, sf)
      .select($"week", $"est_uniques").as[(Long, Long)].collect().toMap
    assert(fromDisk == live, s"persisted-sketch rollup diverged: $fromDisk vs $live")
  }

  // ---------------- q69 Holt-Winters seasonal ----------------

  test("q69: the seasonal fixed-point recursion matches a local integer replay exactly") {
    val out = operators.Analytics.q69HoltWinters(spark, sf)
      .as[(Long, Long, Long)].collect()
    val ys = Tables.orders(spark, sf)
      .groupBy(to_date($"o_orderdate").as("d"))
      .agg(sum(floor($"o_totalprice" * 100).cast("long")).as("y"))
      .orderBy($"d")
      .select(datediff($"d", to_date(lit("1970-01-01"))).cast("long"), $"y")
      .as[(Long, Long)].collect()
    assert(ys.length >= 15, "corpus must span two weeks for the init")
    // Scala / truncates toward zero — the div semantics both engines
    // use (see q63)
    val m1 = ys.take(7).map(_._2).sum / 7L
    val m2 = ys.slice(7, 14).map(_._2).sum / 7L
    var l = m1 * 1000L
    var b = (m2 - m1) * 1000L / 7L
    var seas = ys.take(7).map(p => (p._2 - m1) * 1000L).toVector
    val expected = ys.drop(7).map { case (day, y) =>
      val sm = seas.head
      val fc = (l + b + sm) / 1000L
      val l2 = (300L * (y * 1000L - sm) + 700L * (l + b)) / 1000L
      val b2 = (100L * (l2 - l) + 900L * b) / 1000L
      val s2 = (200L * (y * 1000L - l2) + 800L * sm) / 1000L
      seas = seas.tail :+ s2; l = l2; b = b2
      (day, y, fc)
    }
    assert(out.toSeq == expected.toSeq)
  }

  // ---------------- z2 zone-map pruning ----------------

  test("z2: pruning is sound (every matching row sits in a candidate bucket) and real") {
    // box sized to sf0.001's key range (the entry's default box targets
    // the larger catalogs; same code path)
    val (pLo, pHi, sLo, sHi) = (10L, 40L, 1L, 6L)
    val row = operators.Layout.z2ZonemapPrune(spark, sf, pLo, pHi, sLo, sHi)
      .as[(Long, Long, Long, Long, Long)].head()
    val (nBuckets, nRows, nCand, candRows, exactRows) = row
    assert(exactRows > 0L, "spec box must be non-degenerate")
    assert(candRows >= exactRows && nCand <= nBuckets && candRows <= nRows)
    // soundness: the bucket of every matching row passes the overlap test
    val matched = Tables.lineitem(spark, sf)
      .filter($"l_partkey".between(pLo, pHi) && $"l_suppkey".between(sLo, sHi))
      .select(shiftright(operators.Layout.zorderKey($"l_partkey", $"l_suppkey"), 12)
        .as("zb")).distinct().as[Long].collect().toSet
    val candBuckets = operators.Layout.z1ZorderStats(spark, sf)
      .filter($"max_part" >= pLo && $"min_part" <= pHi &&
        $"max_supp" >= sLo && $"min_supp" <= sHi)
      .select($"zbucket").as[Long].collect().toSet
    assert(matched.subsetOf(candBuckets),
      s"zone map lost buckets: ${(matched -- candBuckets).take(5)}")
    // pruning is real on the z-ordered layout: the candidate set reads
    // strictly less than the table
    assert(candRows < nRows, s"no pruning: $candRows of $nRows")
  }
}
