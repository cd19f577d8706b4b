package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-10 hardening: the p16/p18 scale reshape — distributed
  * per-group rank (`withGroupRank`) replacing the single-task
  * partitionBy(source) window, and mergeable power-sum kept-set
  * fingerprints replacing the data-sized collect_list audit. */
class Round10Spec extends GraftSpecBase {
  import spark.implicits._

  // ------------- withGroupRank -------------

  test("withGroupRank: exact per-group rank equals the window replay on skewed constructed groups") {
    // groups sized to SPAN partitions (one giant group, several small
    // ones, a singleton) with shuffled insert order — the shape where
    // a wrong offset reassembly shows
    val rows = (
      (1L to 997L).map(i => ("big", i * 7 % 1009)) ++   // permuted keys
      (1L to 40L).map(i => ("mid", 1000L - i)) ++
      Seq(("solo", 5L)) ++
      (1L to 13L).map(i => ("tiny", i))
    )
    val df = scala.util.Random.shuffle(rows).toDF("g", "k")
    val scaffolding = scala.collection.mutable.ListBuffer
      .empty[org.apache.spark.sql.DataFrame]
    val got = operators.Analytics
      .withGroupRank(df, "g", "rnk", scaffolding, $"k")
      .select($"g", $"k", $"rnk")
      .as[(String, Long, Long)].collect().toSet
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map(_._2).sorted.zipWithIndex.map { case (k, i) =>
        (g, k, i + 1L) }
    }.toSet
    assert(got == want,
      s"diff: ${(got -- want).take(3)} / ${(want -- got).take(3)}")
    scaffolding.foreach(_.unpersist())
  }

  test("withGroupRank: descending sort and multi-column tie-break orders") {
    val rows = Seq(("a", 3L, 1L), ("a", 3L, 2L), ("a", 1L, 9L),
      ("b", 5L, 5L), ("b", 5L, 4L))
    val df = rows.toDF("g", "x", "y")
    val scaffolding = scala.collection.mutable.ListBuffer
      .empty[org.apache.spark.sql.DataFrame]
    val got = operators.Analytics
      .withGroupRank(df, "g", "rnk", scaffolding, $"x".desc, $"y")
      .select($"g", $"x", $"y", $"rnk")
      .as[(String, Long, Long, Long)].collect().toSet
    val want = Set(("a", 3L, 1L, 1L), ("a", 3L, 2L, 2L), ("a", 1L, 9L, 3L),
      ("b", 5L, 4L, 1L), ("b", 5L, 5L, 2L))
    assert(got == want, got)
    scaffolding.foreach(_.unpersist())
  }

  // ------------- p16 reshape -------------

  test("p16 plan audit: rank windows key on __pid (distributed), no collect_list audit buffer") {
    // the memoized frame's ANALYZED plan is the original build plan
    // (cache() substitutes only at execution), so the shape audit
    // survives memoization
    val df = operators.Sampling.p16SourceCap(spark, sf)
    val p = df.queryExecution.analyzed.toString
    assert(!p.contains("collect_list"),
      "data-sized collect_list audit buffer is back: " + p.take(2000))
    // every row_number window in the plan must be keyed on __pid —
    // never a bare partitionBy(source) over the full corpus
    val winLines = p.linesIterator.filter(_.contains("row_number")).toSeq
    assert(winLines.nonEmpty, p.take(2000))
    winLines.foreach { l =>
      assert(l.contains("__pid"), s"single-task-per-source window: $l")
    }
  }

  test("p16: power-sum fingerprints replay locally and the full audit row matches a local replay") {
    val out = operators.Sampling.p16SourceCap(spark, sf)
      .as[(String, Long, Long, Boolean, Long, Long)].collect().toSeq
    val docs = Tables.documents(spark, sf).select($"doc_id", $"source")
      .as[(Long, String)].collect()
    val cap = docs.length.toLong * operators.Sampling.SourceCapPct / 100
    val P = operators.Sampling.FpPrime
    def h(id: Long) = ((id % P) * operators.Sampling.FpMulA +
      operators.Sampling.FpAddB) % P
    val want = docs.groupBy(_._2).map { case (src, rs) =>
      val ids = rs.map(_._1).sorted
      val kept = ids.take(cap.toInt)
      (src, ids.length.toLong, kept.length.toLong, ids.length > cap,
        kept.map(h).sum, kept.map(id => h(id) * h(id) % P).sum)
    }.toSeq.sortBy(_._1)
    assert(out == want)
  }

  test("p18: reshaped per-source rank keeps the exact keep-first semantics (vs plain-window replay)") {
    // the oracle hash gate covers this end-to-end at sf0.01; this is
    // the in-suite twin at the gate SF against a literal window plan
    val got = operators.Sampling.p18Curate(spark, sf)
      .as[(Long, String, String)].collect().toSeq
    val clean = operators.Dedup.p1CleanCorpus(spark, sf).select($"doc_id")
    val contaminated = operators.Dedup.p3Decontaminate(spark, sf)
      .select($"doc_id")
    val train = clean
      .filter($"doc_id" % operators.Dedup.DecontamMod =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"source")
    val kept = train.join(docs, "doc_id")
    val cap = kept.count() * operators.Sampling.SourceCapPct / 100
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"doc_id")
    val want = kept.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= cap)
      .select($"doc_id", $"lang", $"source")
      .orderBy($"doc_id")
      .as[(Long, String, String)].collect().toSeq
    assert(got == want)
  }

  // ------------- s13 probe knob -------------

  test("s13: recall-vs-probes curve is monotone to 1.0 and hybridProbesFor returns the minimal knob") {
    val K = operators.Similarity.IvfClusters
    val curve = (1 to K).map(p =>
      p -> operators.Similarity.s13RecallAtProbes(spark, sf, p))
    info("recall curve: " +
      curve.map { case (p, r) => f"$p:$r%.2f" }.mkString(" "))
    curve.sliding(2).foreach {
      case Seq((pa, a), (pb, b)) =>
        assert(b >= a, s"recall fell $a -> $b from probes $pa -> $pb")
      case _ =>
    }
    assert(curve.last._2 == 1.0, "full probes must be exact (== s11)")
    val k90 = operators.Similarity.hybridProbesFor(spark, sf, 0.9)
    assert(operators.Similarity.s13RecallAtProbes(spark, sf, k90) >= 0.9)
    if (k90 > 1)
      assert(operators.Similarity.s13RecallAtProbes(spark, sf, k90 - 1) < 0.9,
        s"$k90 not minimal for target 0.9")
    // a lower target never needs more probes
    assert(operators.Similarity.hybridProbesFor(spark, sf, 0.5) <= k90)
    info(s"hybridProbesFor(0.9) = $k90 of $K")
  }

  // ------------- t20 BM25 retrieval -------------

  /** Local BM25 replay with the engine's exact double sequence. */
  private def bm25Replay(query: Seq[String], topK: Int): Seq[(Long, Long, Long)] = {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      .as[(Long, String)].collect()
    val tks = docs.map { case (id, t) =>
      id -> t.split(" ", -1).filter(_.nonEmpty) }
    val n = tks.length.toLong
    val totalTok = tks.map(_._2.length.toLong).sum
    val avgdl = totalTok.toDouble / n.toDouble
    def log2(x: Double) = StrictMath.log(x) / StrictMath.log(2.0)
    val k1 = operators.TextAnalysis.Bm25K1
    val b = operators.TextAnalysis.Bm25B
    val dfq = query.map(q =>
      q -> tks.count(_._2.contains(q)).toLong).toMap
    tks.map { case (id, tk) =>
      val dl = tk.length.toLong
      val s = query.map { q =>
        val tf = tk.count(_ == q).toDouble
        val nq = dfq(q).toDouble
        val idf = log2(1.0 + (n.toDouble - nq + 0.5) / (nq + 0.5))
        math.floor(idf * (tf * (k1 + 1.0)) /
          (tf + k1 * (1.0 - b + b * dl.toDouble / avgdl)) * 10000).toLong
      }.sum
      (id, dl, s)
    }.filter(_._3 > 0).sortBy(r => (-r._3, r._1)).take(topK).toSeq
  }

  test("t20: BM25 == exact local replay (integer micro-unit scores); top-k plan is TakeOrdered, no explode") {
    val got = operators.TextAnalysis.t20Bm25(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    val want = bm25Replay(operators.TextAnalysis.Bm25Query,
      operators.TextAnalysis.Bm25TopK)
    assert(got == want,
      s"got ${got.take(3)}...\nwant ${want.take(3)}...")
    // plan shape: scan-local tf (no Generate/explode), top-k as
    // TakeOrderedAndProject, stats as a broadcast one-row join
    val p = operators.TextAnalysis.t20Bm25(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(!p.contains("Generate"), "explode in the scoring path")
  }

  test("bm25For: the parameterized primitive is replay-exact on a different query and k") {
    val query = Seq("vector", "hash", "slow", "spark")
    val got = operators.TextAnalysis.bm25For(spark, sf, query, 40)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == bm25Replay(query, 40))
    assert(got.nonEmpty)
    // degenerate guard: duplicate query tokens are refused loudly
    intercept[IllegalArgumentException] {
      operators.TextAnalysis.bm25For(spark, sf, Seq("a", "a"), 5)
    }
  }

  // ------------- q98 thinned: dense-fixture recall pin -------------

  test("q98 thinned: support-SURPLUS fixture keeps high recall at p=0.5 (the screen's win regime, pinned)") {
    // 40 disjoint K10 cliques: every edge has support 8 = 4x the k=3
    // threshold, so the screen survives w.p. ~1-(0.75)^8 ~ 0.90 per
    // edge and the peel's cascade has surplus to absorb losses — the
    // regime where the thinned screen is actually usable, pinned so
    // kernel drift can't silently change the trade. Deterministic
    // (seeded coin over fixed ids).
    val pairs = (0 until 40).flatMap { c =>
      val base = c * 10L
      for (a <- 0L to 9L; b <- (a + 1) to 9L) yield (base + a, base + b)
    }
    val e = pairs.toDF("pa", "pb")
    val exact = operators.Graph.trussPeel(e, 3, 8, 64)
      .as[(Long, Long)].collect().toSet
    assert(exact.size == pairs.size, "K10s must fully survive a 3-truss")
    val screened = operators.Graph.thinnedSupport(e, 500L)
      .filter($"cnt" * 1000000L >= lit(1L) * 500L * 500L)
      .select($"pa", $"pb")
    val approx = operators.Graph.trussPeel(screened, 3, 8, 64)
      .as[(Long, Long)].collect().toSet
    assert(approx.subsetOf(exact), "precision must stay structural")
    val recall = approx.size.toDouble / exact.size
    info(f"dense-fixture recall at p=0.5: $recall%.3f (${approx.size}/${exact.size})")
    // measured 2026-08 on this fixture; pinned with slack — the
    // sparse-corpus collapse (0.665 at the 20x probe) must not be
    // mistaken for the kernel regressing in its OWN regime
    assert(recall >= 0.60, f"win-regime recall collapsed: $recall%.3f")
  }

  // ------------- p19 contamination report -------------

  test("p19: fractions == exact local replay; zero-hit docs reported; consistent with p3's drop set") {
    val got = operators.Dedup.p19ContaminationReport(spark, sf)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    // local replay: distinct 8-shingles, benchmark = doc_id % 7 == 0
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      .as[(Long, String)].collect()
    val mod = operators.Dedup.DecontamMod
    // RAW split tokens (no empty filter) — shinglesFromTokens and the
    // oracle's string_split both shingle the unfiltered token stream
    def sh8(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 8) Set.empty
      else w.sliding(8).map(_.mkString(" ")).toSet
    }
    val all = docs.map { case (id, t) => id -> sh8(t) }
    val bench = all.filter(_._1 % mod == 0).flatMap(_._2).toSet
    val want = all.filter(r => r._1 % mod != 0 && r._2.nonEmpty)
      .map { case (id, s) =>
        val hits = s.count(bench).toLong
        val frac = hits * 1000000L / s.size
        (id, s.size.toLong, hits, frac,
          frac >= operators.Dedup.ContamFlagPpm)
      }.sortBy(_._1).toSeq
    assert(got == want, s"diff sample: ${got.diff(want).take(2)} / ${want.diff(got).take(2)}")
    // zero-hit docs present (the report proves the clean ones were checked)
    assert(got.exists(_._3 == 0L))
    // consistency with p3: identical positive-hit doc sets and counts
    val p3 = operators.Dedup.p3Decontaminate(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got.filter(_._3 > 0).map(r => r._1 -> r._3).toMap == p3)
  }

  // ------------- i8 malformed-record ingest -------------

  test("i8: DROPMALFORMED drops exactly the corrupted keys; PERMISSIVE quarantines them verbatim; FAILFAST raises") {
    val mod = operators.Ingest.CorruptMod
    val sup = Tables.supplier(spark, sf)
      .select($"s_suppkey").as[Long].collect().toSet
    val corrupted = sup.filter(_ % mod == 0)
    // entry path: survivors only, every value parsed
    val got = operators.Ingest.i8CorruptIngest(spark, sf)
      .select($"s_suppkey").as[Long].collect().toSet
    assert(got == sup -- corrupted,
      s"DROPMALFORMED kept/dropped wrong keys")
    // PERMISSIVE + corrupt column: quarantine count == staged count,
    // and the raw line survives VERBATIM (truncated json text)
    val path = operators.Ingest.corruptStage(spark, sf)
    val schema = operators.Ingest.SupplierJsonSchema
      .add("_corrupt_record", org.apache.spark.sql.types.StringType)
    val raw = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache() // required to query the corrupt column (SPARK-21610)
    raw.count()
    val quarantine = raw.filter($"_corrupt_record".isNotNull)
      .select($"_corrupt_record").as[String].collect()
    assert(quarantine.length == corrupted.size)
    assert(quarantine.forall(l => l.startsWith("{") && !l.endsWith("}")),
      "quarantined lines must be the raw truncated text")
    // good rows parse with null corrupt col
    assert(raw.filter($"_corrupt_record".isNull).count() ==
      (sup.size - corrupted.size).toLong)
    raw.unpersist()
    // FAILFAST raises on the first malformed line
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.schema(operators.Ingest.SupplierJsonSchema)
        .option("mode", "FAILFAST").json(path).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed")
      || Option(ex.getCause).exists(_.getMessage.toLowerCase.contains("malformed")),
      ex.getMessage.take(300))
  }

  // ------------- q65 CUPED -------------

  test("q65_cuped: sufficient-statistic replay; theta zeroes the covariate axis; rho2 in [0,1]") {
    val got = operators.Analytics.q65Cuped(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.size == 1)
    val (na, nb, th, raw, adj, rho2) = got.head
    // local replay from the same per-user pre/post purchase counts
    val e = Tables.eventsWithMs(spark, sf)
      .select($"user_id", $"ms",
        ($"event_type" === "purchase").cast("long").as("p"))
      .as[(Long, Long, Long)].collect()
    val mid = {
      val ms = e.map(_._2); (ms.min + ms.max) / 2
    }
    val pu = e.groupBy(_._1).map { case (u, rows) =>
      (u % 2,
        rows.filter(_._2 < mid).map(_._3).sum,
        rows.filter(_._2 >= mid).map(_._3).sum)
    }.toSeq
    val n = pu.size.toLong
    val (sx, sy) = (pu.map(_._2).sum, pu.map(_._3).sum)
    val sxx = pu.map(r => r._2 * r._2).sum
    val syy = pu.map(r => r._3 * r._3).sum
    val sxy = pu.map(r => r._2 * r._3).sum
    val num = (n * sxy - sx * sy).toDouble
    val denX = (n * sxx - sx * sx).toDouble
    val denY = (n * syy - sy * sy).toDouble
    val theta = if (denX == 0.0) 0.0 else num / denX
    val rho2W = if (denX == 0.0 || denY == 0.0) 0.0
      else num * num / (denX * denY)
    val xbar = sx.toDouble / n.toDouble
    def arm(k: Long) = pu.filter(_._1 == k)
    def mN(rs: Seq[(Long, Long, Long)]) = rs.size.toLong
    def mS(rs: Seq[(Long, Long, Long)], f: ((Long, Long, Long)) => Long) =
      rs.map(f).sum
    val (ra, rb) = (arm(0), arm(1))
    val (nA, nB) = (mN(ra), mN(rb))
    val myA = mS(ra, _._3).toDouble / nA.toDouble
    val myB = mS(rb, _._3).toDouble / nB.toDouble
    val mxA = mS(ra, _._2).toDouble / nA.toDouble
    val mxB = mS(rb, _._2).toDouble / nB.toDouble
    assert((na, nb) == (nA, nB))
    assert(th == math.floor(theta * 1000000).toLong)
    assert(raw == math.floor((myB - myA) * 1000000).toLong)
    assert(adj == math.floor(((myB - theta * (mxB - xbar))
      - (myA - theta * (mxA - xbar))) * 1000000).toLong)
    assert(rho2 == math.floor(rho2W * 1000000).toLong)
    assert(rho2 >= 0L && rho2 <= 1000000L, s"rho2 $rho2 out of [0,1]")
    info(s"CUPED theta=$th raw_lift=$raw adj_lift=$adj var_red=$rho2")
    // the structural CUPED identity: adjusting by theta removes the
    // covariate axis — re-running the adjustment on (x, x) data must
    // yield exactly zero adjusted lift (theta == 1, means cancel)
    val numXX = (n * sxx - sx * sx).toDouble
    val thetaXX = if (numXX == 0.0) 0.0 else numXX / numXX
    val adjXX = ((mxB - thetaXX * (mxB - xbar))
      - (mxA - thetaXX * (mxA - xbar)))
    assert(math.abs(adjXX) < 1e-12, s"x-on-x adjustment not zero: $adjXX")
  }

  // ------------- t21 KS quality drift -------------

  test("t21: KS statistic == exact local replay over the full CDF; sup attained; critical line arithmetic") {
    val got = operators.TextAnalysis.t21KsDrift(spark, sf)
      .as[(Double, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got.size == 1)
    val (atQ, na, nb, d, crit, reject) = got.head
    // local replay from t2's scores (t2 itself is oracle-gated)
    val mid = Tables.documents(spark, sf)
      .agg(expr("(max(doc_id) + 1) div 2")).as[Long].head()
    val qs = operators.TextAnalysis.t2QualityScore(spark, sf)
      .select($"doc_id", $"quality").as[(Long, Double)].collect()
    val a = qs.filter(_._1 < mid).map(_._2).sorted
    val b = qs.filter(_._1 >= mid).map(_._2).sorted
    assert(na == a.length.toLong && nb == b.length.toLong)
    val values = (a ++ b).distinct.sorted
    val ds = values.map { x =>
      val fa = a.count(_ <= x).toLong * 1000000L / na
      val fb = b.count(_ <= x).toLong * 1000000L / nb
      (x, math.abs(fa - fb))
    }
    val dMax = ds.map(_._2).max
    assert(d == dMax, s"D $d vs local sup $dMax")
    assert(atQ == ds.filter(_._2 == dMax).map(_._1).min,
      "sup not attained at the min such quality value")
    val critWant = math.floor(1.358 *
      math.sqrt((na + nb).toDouble / (na * nb).toDouble) * 1000000).toLong
    assert(crit == critWant && reject == (d > crit))
    info(s"KS D=$d crit95=$crit reject=$reject at quality $atQ")
  }

  // ------------- q97 lgK accuracy/wire knob -------------

  test("q97: lgK knob — error vs the exact neighborhood function shrinks with lgK, sketch bytes grow") {
    // exact N(t) by local BFS on the sf0.001 pair graph (Round8's
    // replay), then the ANF loop at three register sizes
    val prs = operators.Analytics.copurchasePairs(spark, sf)
      .filter($"n_orders" >= 2)
      .select($"pa", $"pb").as[(Long, Long)].collect()
    val adj = collection.mutable.Map.empty[Long, List[Long]]
      .withDefaultValue(Nil)
    prs.foreach { case (a, b) => adj(a) = b :: adj(a); adj(b) = a :: adj(b) }
    val exact = collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    adj.keys.foreach { s0 =>
      val dist = collection.mutable.Map(s0 -> 0)
      var front = Set(s0); var h = 0
      while (front.nonEmpty) {
        h += 1
        front = front.flatMap(adj(_)).filterNot(dist.contains)
        front.foreach(dist(_) = h)
      }
      dist.values.foreach { d => (d to 24).foreach(t => exact(t) += 1L) }
    }
    val sym = prs.toSeq.toDF("pa", "pb")
      .select($"pa".as("src"), $"pb".as("dst"))
      .unionAll(prs.toSeq.toDF("pa", "pb")
        .select($"pb".as("src"), $"pa".as("dst")))
    val rows = Seq(6, 8, 10, 12).map { lgK =>
      val (state, totals) = operators.Graph.anfLoop(sym, 12, lgK)
      val maxRel = totals.zipWithIndex.map { case (est, hop) =>
        math.abs(est - exact(hop)).toDouble / exact(hop) }.max
      val avgB = state.agg(avg(length($"sk"))).as[Double].head()
      info(f"lgK=$lgK: maxRel $maxRel%.4f, avg sketch $avgB%.0f B")
      (lgK, maxRel, avgB)
    }
    // accuracy: more registers never measured worse here, and the
    // lgK=12 run sits inside a tight band (RSE ~1.6% per sketch)
    assert(rows(3)._2 <= rows(0)._2,
      s"lgK=12 error ${rows(3)._2} worse than lgK=6 ${rows(0)._2}")
    assert(rows(3)._2 <= 0.05, s"lgK=12 drifted ${rows(3)._2}")
    assert(rows(2)._2 <= 0.10, s"lgK=10 drifted ${rows(2)._2}")
    assert(rows(1)._2 <= 0.15, s"lgK=8 drifted ${rows(1)._2}")
    // wire: serialized sketches strictly grow with the register file
    assert(rows.map(_._3).sliding(2).forall(p => p(0) < p(1)),
      s"sketch sizes not monotone: ${rows.map(_._3)}")
  }

  // ------------- t17 streaming drift twin -------------

  test("drift stream: two-sketch MG bounds per snapshot, and drift within the error band of batch t17 on a replayed corpus") {
    import graft.streaming.DriftStream
    implicit val sqlCtx = spark.sqlContext
    val ranges = 4
    val cap = 64
    // t17's semantics on a 300-doc slice: snapshot split at the
    // doc_id midpoint, tokens tagged by side
    val docs = Tables.documents(spark, sf).limit(300)
    val mid = docs.agg(expr("(max(doc_id) + 1) div 2")).as[Long].head()
    val toks = docs
      .select($"doc_id",
        explode(graft.functions.TextFunctions.tokens($"text")).as("t"))
      .filter($"t" =!= "").as[(Long, String)].collect().toSeq
      .map { case (id, t) =>
        DriftStream.SnapTok(math.floorMod(t.hashCode, ranges), id >= mid, t) }
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = MemoryStream[DriftStream.SnapTok]
    val q = DriftStream.heavyChange(stream.toDS(), cap)
      .writeStream.format("memory").queryName("drift_t17")
      .outputMode("append").start()
    try {
      toks.grouped(toks.size / 4 + 1).foreach { chunk =>
        stream.addData(chunk); q.processAllAvailable()
      }
      val rows = spark.table("drift_t17")
        .as[DriftStream.DriftRow].collect().toSeq
      val latest = rows.groupBy(_.range).view.mapValues { rs =>
        val v = rs.map(_.ver).max; rs.filter(_.ver == v)
      }.toMap
      // exact per-snapshot truths over the same slice
      val exactA = toks.filterNot(_.isB).groupBy(_.token)
        .view.mapValues(_.size.toLong).toMap.withDefaultValue(0L)
      val exactB = toks.filter(_.isB).groupBy(_.token)
        .view.mapValues(_.size.toLong).toMap.withDefaultValue(0L)
      val naR = toks.filterNot(_.isB).groupBy(_.range)
        .view.mapValues(_.size.toLong).toMap.withDefaultValue(0L)
      val nbR = toks.filter(_.isB).groupBy(_.range)
        .view.mapValues(_.size.toLong).toMap.withDefaultValue(0L)
      latest.foreach { case (r, rs) =>
        assert(rs.head.na == naR(r) && rs.head.nb == nbR(r),
          s"range $r exact totals drifted")
        val mA = naR(r) / (cap + 1L)
        val mB = nbR(r) / (cap + 1L)
        rs.foreach { row =>
          // per-snapshot MG bounds (est==0 allowed: absent from that
          // sketch means only that its count is under the margin)
          assert(row.estA <= exactA(row.token) &&
            (row.estA > 0L || exactA(row.token) <= mA) &&
            exactA(row.token) <= row.estA + mA,
            s"A-bound broken for ${row.token} in range $r")
          assert(row.estB <= exactB(row.token) &&
            (row.estB > 0L || exactB(row.token) <= mB) &&
            exactB(row.token) <= row.estB + mB,
            s"B-bound broken for ${row.token} in range $r")
        }
        // guaranteed presence above the per-snapshot error line
        val present = rs.map(_.token).toSet
        (exactA.keys ++ exactB.keys).filter(t =>
            math.floorMod(t.hashCode, ranges) == r &&
            (exactA(t) > mA || exactB(t) > mB))
          .foreach(t => assert(present.contains(t),
            s"heavy token $t missing from range $r summaries"))
      }
      // drift estimates: within the analytic error band of the exact
      // batch drift (t17's micro-unit algebra) for every reported row
      val ta = toks.count(!_.isB).toLong
      val tb = toks.count(_.isB).toLong
      val top = DriftStream.driftTopK(rows, 20, minCombined = 5L)
      assert(top.nonEmpty && top.size <= 20)
      top.foreach { case (t, _, _, drift) =>
        val r = math.floorMod(t.hashCode, ranges)
        val exact = math.abs(exactA(t) * 1000000L / ta -
          exactB(t) * 1000000L / tb)
        // each share underestimates by <= margin/total (+1 floor slack)
        val band = naR(r) / (cap + 1L) * 1000000L / ta +
          nbR(r) / (cap + 1L) * 1000000L / tb + 2L
        assert(math.abs(drift - exact) <= band,
          s"$t: stream drift $drift vs exact $exact outside band $band")
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
