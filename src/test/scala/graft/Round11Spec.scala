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
}
