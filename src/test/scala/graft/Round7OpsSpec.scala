package graft

import org.apache.spark.sql.functions._

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
}
