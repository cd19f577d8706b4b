package graft

import org.apache.spark.sql.functions._

/** Round-11 hardening: the thinned-truss MID-SIZE recall-vs-p order
  * pin (§8c.3's remainder — the 20× probe table was the only place
  * the recall/time-vs-p trade was visible, and nothing in the suite
  * would have caught it silently collapsing).
  */
class Round11Spec extends GraftSpecBase {
  import spark.implicits._

  test("q98 thinned: mid-size mixed-support graph — recall strictly ordered in p, precision structural at every p") {
    // A mid-size graph between the K10 fixture (1.8k edges) and the
    // 20× probe (1.2M): disjoint cliques with MIXED support levels,
    // the structure that makes the trade visible — K3 edges sit
    // EXACTLY at the k=3 threshold (support 1), K4 at 2×, K6 at 4×,
    // K10 at 8× — so low p starves the marginal components first and
    // recall must fall monotonically as p does. 1,400 components,
    // 6,900 nodes, 17,400 edges; seeded coins make every run
    // identical.
    val sizes = Seq.fill(500)(3) ++ Seq.fill(400)(4) ++
      Seq.fill(300)(6) ++ Seq.fill(200)(10)
    var base = 0L
    val pairs = sizes.flatMap { n =>
      val ids = (0 until n).map(base + _)
      base += n
      for (i <- 0 until n; j <- (i + 1) until n) yield (ids(i), ids(j))
    }
    val e = pairs.toDF("pa", "pb").cache()
    // every clique K_n (n ≥ 3) survives a 3-truss whole
    val exact = pairs.toSet
    val recalls = Seq(100L, 300L, 500L).map { p1000 =>
      val screened = operators.Graph.thinnedSupport(e, p1000)
        .filter($"cnt" * 1000000L >= lit(1L) * p1000 * p1000)
        .select($"pa", $"pb")
      val approx = operators.Graph.trussPeel(screened, 3, 8, 64)
        .as[(Long, Long)].collect().toSet
      // the backbone-precision contract: output ⊆ exact truss at
      // EVERY p (the screen only ever drops edges; the peel is exact)
      assert(approx.subsetOf(exact),
        s"p=$p1000: ${approx.diff(exact).take(3)} outside the exact truss")
      val recall = approx.size.toDouble / exact.size
      info(f"p=${p1000 / 1000.0}%.1f: recall $recall%.3f (${approx.size}/${exact.size})")
      recall
    }
    // the ORDER is the contract the 20× probe table records
    // (0.665 > 0.278 > 0.108 there): strictly increasing in p
    assert(recalls(2) > recalls(1) && recalls(1) > recalls(0),
      s"recall-vs-p order broke: $recalls")
    // measured 2026-08 bands with slack (seeded coins — deterministic)
    assert(recalls(2) >= 0.35, s"p=0.5 recall collapsed: ${recalls(2)}")
    assert(recalls(0) <= 0.15, s"p=0.1 recall implausibly high " +
      s"(${recalls(0)}) — screen is not screening")
    e.unpersist()
  }

  // ------------- t19 trained NB lang-id -------------

  test("t19: NB == exact local replay (quantized integer scores) and beats the majority baseline by a real margin") {
    import operators.TextAnalysis._
    val got = t19NbLangId(spark, sf)
      .select($"doc_id", $"labeled_lang", $"pred_lang", $"score_q")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got.nonEmpty)
    // ---- local replay: same mix64 enrichment, same add-one NB with
    // 1e6-floor-quantized logs, same (score desc, lang asc) argmax
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect()
    val enriched = docs.map { case (id, lang, text) =>
      val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
      val k = 1 + toks.length / 8
      val markers = (0 until k).map { i =>
        val h = mix(id * 1000003L + i)
        val srcLang =
          if (math.floorMod(h, T19NoiseDen.toLong) == 0L)
            T19Langs(math.floorMod(h >>> 2, T19Langs.size.toLong).toInt)
          else lang
        val ws = T19Markers(srcLang)
        ws(math.floorMod(h >>> 5, ws.size.toLong).toInt)
      }
      (id, lang, toks.toSeq ++ markers)
    }
    val train = enriched.filter(_._1 % 2 == 0)
    val test = enriched.filter(_._1 % 2 == 1)
    val cnt = collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    val tot = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    train.foreach { case (_, l, ts) =>
      ts.foreach { t => cnt((l, t)) += 1; tot(l) += 1 } }
    val v = train.flatMap(_._3).distinct.size
    val nd = train.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val priorQ = nd.map { case (l, n) =>
      l -> math.floor(math.log(n.toDouble / train.size) * 1e6).toLong }
    def llQ(l: String, t: String): Long = math.floor(math.log(
      (cnt((l, t)) + 1).toDouble / (tot(l) + v)) * 1e6).toLong
    // argmax with (score desc, lang asc): max score, min lang on ties
    val want2 = test.map { case (id, lang, ts) =>
      val scoresByLang = T19Langs.map(l => l -> (ts.map(llQ(l, _)).sum + priorQ(l)))
      val mx = scoresByLang.map(_._2).max
      val pick = scoresByLang.filter(_._2 == mx).map(_._1).min
      (id, lang, pick, mx)
    }.sortBy(_._1).toSeq
    assert(got == want2, s"diff: ${got.diff(want2).take(2)} vs ${want2.diff(got).take(2)}")
    // ---- the de-vacuation margin: raw-text NB measured 36.8% vs the
    // 43.6% majority baseline (round 8); the enriched mechanism must
    // clear the baseline by a wide, pinned margin
    val acc = got.count(r => r._2 == r._3).toDouble / got.size
    val majority = got.groupBy(_._2).values.map(_.size).max.toDouble / got.size
    info(f"t19 accuracy $acc%.3f vs majority $majority%.3f")
    assert(acc >= majority + 0.2, f"margin vacuous: $acc%.3f vs $majority%.3f")
    assert(acc >= 0.85 && acc < 1.0,
      f"accuracy $acc%.3f outside the designed band (noise makes 1.0 impossible-by-design)")
  }

  // ------------- d10 SemDeDup -------------

  test("d10 core: constructed clusters — dominance rule exact (keeps the least-centroid-similar of each dup set, drop-vs-any-earlier)") {
    import operators.Similarity
    // cluster 0: a 3-clique of near-identical vectors (v0,v1,v2) plus
    // a far singleton v3; cluster 1: a CHAIN a-b, b-c where cos(a,c)
    // < tau — the reference-impl subtlety: c drops against b even
    // though b itself dropped (drop tests run against every earlier
    // example, kept or not)
    def n(v: Seq[Double]): Seq[Double] = {
      val m = math.sqrt(v.map(x => x * x).sum); v.map(_ / m)
    }
    val c0 = Seq(1.0, 0.0, 0.0, 0.0)
    // chain-cluster centroid sits near c so the centroid-sim order is
    // a < b < c: a (earliest) survives, b drops vs a, and c drops vs
    // the ALREADY-DROPPED b — the kept-or-not subtlety under test
    val c1 = Seq(0.2, 0.0, 0.0, 1.0)
    val vecs = Seq(
      (0L, n(Seq(1.0, 0.04, 0.0, 0.0)), 0),   // clique
      (1L, n(Seq(1.0, 0.05, 0.0, 0.0)), 0),   // clique
      (2L, n(Seq(1.0, 0.06, 0.0, 0.0)), 0),   // clique
      (3L, n(Seq(0.1, 0.0, 1.0, 0.0)), 0),    // far singleton
      (10L, n(Seq(1.0, 0.0, 0.0, 0.0)), 1),   // chain a (x-axis)
      (11L, n(Seq(1.0, 0.0, 0.0, 1.0)), 1),   // chain b (between)
      (12L, n(Seq(0.0, 0.0, 0.0, 1.0)), 1))   // chain c (w-axis)
    def cos(x: Seq[Double], y: Seq[Double]) =
      x.zip(y).map { case (p, q) => p * q }.sum /
        (math.sqrt(x.map(p => p * p).sum) * math.sqrt(y.map(p => p * p).sum))
    // sanity of the construction
    assert(cos(vecs(4)._2, vecs(5)._2) >= 0.5 && cos(vecs(5)._2, vecs(6)._2) >= 0.5)
    assert(cos(vecs(4)._2, vecs(6)._2) < 0.5, "chain must not be a clique")
    val assigned = vecs.toDF("vec_id", "v", "cluster")
    val centers = Array(c0.toArray, c1.toArray)
    val got = Similarity.semDedupCore(assigned, centers, 0.5)
      .as[(Long, Int, Long, Boolean)].collect().toSeq
    // local replay of the published rule
    val simq = vecs.map { case (id, v, c) =>
      id -> math.floor(cos(v, Seq(c0, c1)(c).map(identity)) * 1e6).toLong }.toMap
    import scala.math.Ordering.Implicits._
    val want = vecs.map { case (id, v, c) =>
      val dropped = vecs.exists { case (b, vb, cb) =>
        cb == c && Ordering[(Long, Long)].lt((simq(b), b), (simq(id), id)) &&
          cos(v, vb) >= 0.5 }
      (id, c, simq(id), dropped)
    }.sortBy(_._1)
    assert(got == want, s"got $got\nwant $want")
    // the semantics the construction pins
    val droppedIds = got.filter(_._4).map(_._1).toSet
    assert(!droppedIds.contains(3L), "far singleton must survive")
    assert(droppedIds.intersect(Set(0L, 1L, 2L)).size == 2,
      "clique keeps exactly its least-centroid-similar member")
    assert(vecs.count(v => v._3 == 1 && droppedIds(v._1)) == 2,
      "chain keeps exactly one (drop-vs-any-earlier, kept or not)")
  }

  test("d10 vs d5: every drop is a true τ-pair member, and no intra-cluster exact pair survives whole") {
    import operators.Similarity
    // sf0.01 is the SF where d5's exact pair list is non-empty, so
    // the audit actually bites (sf0.001 has zero τ-pairs)
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val out = Similarity.d10SemDedup(spark, dir)
        .as[(Long, Int, Long, Boolean)].collect().toSeq
      assert(out.nonEmpty)
      val again = Similarity.d10SemDedup(spark, dir)
        .as[(Long, Int, Long, Boolean)].collect().toSeq
      assert(out == again, "rerun-identical")
      val cluster = out.map(r => r._1 -> r._2).toMap
      val dropped = out.filter(_._4).map(_._1).toSet
      // d5 = the EXACT τ=0.5 pair list (oracle-checked elsewhere)
      val exactPairs = Similarity.d5EmbeddingDedup(spark, dir)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
      val inPair = exactPairs.flatMap(p => Seq(p._1, p._2)).toSet
      // soundness: d10 never drops a vector without a true duplicate
      assert(dropped.subsetOf(inPair),
        s"$dir: dropped without any exact τ-pair: ${dropped.diff(inPair)}")
      // within-cluster completeness: an exact pair inside one cluster
      // cannot survive whole (the dominance rule drops its higher side)
      val survivors = exactPairs.filter { case (a, b) =>
        cluster(a) == cluster(b) && !dropped(a) && !dropped(b) }
      assert(survivors.isEmpty, s"$dir: intra-cluster pairs survived: $survivors")
      info(s"d10 at $dir: ${dropped.size} dropped of ${out.size}; " +
        s"${exactPairs.size} exact pairs, " +
        s"${exactPairs.count(p => cluster(p._1) == cluster(p._2))} intra-cluster")
    }
  }

  // ------------- d11 incremental dedup -------------

  test("d11: precision exact, banding recall measured vs brute force, index built once") {
    import operators.Dedup
    // the brute-force truth over the SAME shingle-hash sets the
    // operator verifies with (collected once; sidesteps replicating
    // xxhash64 — the hashing itself is upstream of what's under test)
    val dir = "/root/testdata/sf0.01"
    val sets = Dedup.incSigFrame(Tables.documents(spark, dir))
      .select($"doc_id", $"sh").as[(Long, Seq[Long])].collect()
      .map { case (id, sh) => id -> sh.toSet }.toMap
    val truth = (for {
      (a, sa) <- sets.toSeq if a % 2 == 1
      (b, sb) <- sets.toSeq if b % 2 == 0
      inter = sa.intersect(sb).size
      if 3L * inter >= sa.size + sb.size
    } yield (a, b) ->
        math.floor(inter * 10000L / (sa.size + sb.size - inter).toDouble) / 10000.0
    ).toMap
    val before = Dedup.incIndexBuilds.get()
    val got = Dedup.d11IncrementalDedup(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    val got2 = Dedup.d11IncrementalDedup(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == got2, "rerun-identical")
    // the index artifact is built at most once per dataset — the
    // incremental contract (old-corpus work prices at zero per query)
    assert(Dedup.incIndexBuilds.get() <= before + 1,
      s"index rebuilt: ${Dedup.incIndexBuilds.get() - before} builds")
    // PRECISION EXACT: every reported pair is a true J ≥ 1/2 pair
    // with the exactly-quantized jaccard
    got.foreach { case (n, o, j) =>
      assert(truth.contains((n, o)), s"false pair ($n, $o, $j)")
      assert(truth((n, o)) == j, s"($n, $o): got $j want ${truth((n, o))}")
    }
    // banding recall vs the S-curve: most truth mass here is
    // exact/near-exact copies (J ≈ 1 collides in every band), so
    // measured recall is high; pinned with slack for the J≈0.5 tail
    val recall = got.size.toDouble / truth.size
    info(f"d11 at $dir: ${got.size}/${truth.size} truth pairs (recall $recall%.3f)")
    assert(truth.nonEmpty && recall >= 0.7, f"recall $recall%.3f")
  }

  test("d11 streaming twin: chunked arrival against the static index equals batch d11 exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.01"
    val tmp = java.nio.file.Files.createTempDirectory("graft_d11s").toString
    val newDocs = Tables.documents(spark, dir)
      .filter($"doc_id" % 2 === 1)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      .sortBy(_._1)
    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.DedupStream.start(
      stream.toDF().toDF("doc_id", "text"), dir,
      s"$tmp/out", s"$tmp/ckpt")
    try {
      // three micro-batches — each is "a new snapshot increment"
      newDocs.grouped((newDocs.size + 2) / 3).foreach { chunk =>
        stream.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.read.parquet(s"$tmp/out")
      .select($"new_id", $"old_id", $"jaccard")
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val want = operators.Dedup.d11IncrementalDedup(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(got == want, s"stream ${got.size} rows vs batch ${want.size}")
    // per-batch output dirs are the idempotence unit (replayed batch
    // ids overwrite their own directory)
    val dirs = new java.io.File(s"$tmp/out").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted
    assert(dirs.length == 3, dirs.mkString(","))
  }
}
