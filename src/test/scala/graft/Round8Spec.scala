package graft

import org.apache.spark.sql.functions._

/** Round-8 hardening of the core-number family: the hub-safe
  * histogram h-index (no degree-sized aggregation buffers) and q76's
  * clamp-detection/escalation (never report budget constants as
  * data). */
class Round8Spec extends GraftSpecBase {
  import spark.implicits._

  /** Exact core numbers by sequential min-degree peeling — the
    * in-memory ground truth (same helper as Round7TailSpec's). */
  private def localCoreNumbers(edges: Seq[(Long, Long)]): Map[Long, Int] = {
    val adj = collection.mutable.Map.empty[Long, collection.mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, collection.mutable.Set.empty) += a
    }
    val deg = collection.mutable.Map(adj.toSeq.map { case (v, ns) => v -> ns.size }: _*)
    val core = collection.mutable.Map.empty[Long, Int]
    val alive = collection.mutable.Set(adj.keys.toSeq: _*)
    var level = 0
    while (alive.nonEmpty) {
      val ready = alive.filter(v => deg(v) <= level)
      if (ready.isEmpty) level += 1
      else {
        val stack = collection.mutable.Stack(ready.toSeq: _*)
        while (stack.nonEmpty) {
          val v = stack.pop()
          if (alive.contains(v) && deg(v) <= level) {
            core(v) = level; alive -= v
            adj(v).foreach { u =>
              if (alive.contains(u)) {
                deg(u) -= 1
                if (deg(u) <= level) stack.push(u)
              }
            }
          }
        }
      }
    }
    core.toMap
  }

  private def symmetric(pairs: Seq[(Long, Long)]) = {
    val df = pairs.toDF("pa", "pb")
    df.select($"pa".as("src"), $"pb".as("dst"))
      .unionAll(df.select($"pb".as("src"), $"pa".as("dst")))
  }

  // ------------- hub-safe h-index (histogram formulation) -------------

  test("q79 engine: exact on a 100k-degree power-law hub (no degree-sized buffers)") {
    // one hub wired to 100_000 degree-1 leaves AND to a 6-clique: the
    // leaves peel at level 1, leaving hub+clique as a K7 => core 6 for
    // all seven, core 1 for every leaf. The old sorted-list H would
    // materialize a 100k-element array in ONE aggregation buffer here;
    // the histogram path carries only (src, estimate, count) rows.
    val hub = 0L
    val leaves = (1L to 100000L).map(l => (hub, l))
    val clique = (100001L to 100006L)
    val cliqueEdges = for {
      a <- clique; b <- clique if a < b
    } yield (a, b)
    val hubToClique = clique.map(c => (hub, c))
    val pairs = leaves ++ cliqueEdges ++ hubToClique
    val want = localCoreNumbers(pairs)
    val got = operators.Graph.hIndexCoreNumbers(
        symmetric(pairs).repartition(8), operators.Graph.HIndexRounds)
      .as[(Long, Int)].collect().toMap
    assert(got.size == want.size)
    assert(got(hub) == 6 && got(100001L) == 6 && got(1L) == 1)
    assert(got == want,
      s"hub graph diverged: ${(got.toSet diff want.toSet).take(3)}")
  }

  // ------------- q76 clamp detection / escalation -------------

  test("peel reports clamped=false when the budget empties the graph") {
    // K6 alone: every node core 5; the level-6 peel removes everyone
    val clique = (1L to 6L)
    val pairs = (for { a <- clique; b <- clique if a < b } yield (a, b)).toSeq
    val (table, clamped) = operators.Graph.peelCoreNumbers(
      pairs.toDF("pa", "pb"), kMax = 6, rounds = 4)
    assert(!clamped, "budget emptied the graph but flag says clamped")
    assert(table.as[(Long, Int)].collect().toMap == localCoreNumbers(pairs))
  }

  test("peel reports clamped=true when survivors remain at the kMax level") {
    // K6 with kMax=3: the 5-core survives level 3 => the level table
    // would report core 3 for nodes whose true core is 5
    val clique = (1L to 6L)
    val pairs = (for { a <- clique; b <- clique if a < b } yield (a, b)).toSeq
    val (_, clamped) = operators.Graph.peelCoreNumbers(
      pairs.toDF("pa", "pb"), kMax = 3, rounds = 4)
    assert(clamped, "budget left survivors but flag says exact")
  }

  test("q76: an insufficient budget escalates to the h-index fixed point, never clamps") {
    // sf corpus degeneracy is >= 5 (pinned by Round7TailSpec), so a
    // kMax=2 peel cannot empty the graph: q76 must escalate and return
    // the TRUE table (== q79), not a table whose deep nodes all read 2
    val got = operators.Graph.q76CoreNumbers(spark, sf, kMax = 2, rounds = 3)
      .as[(Long, Int)].collect().toSet
    val truth = operators.Graph.q79CoreHindex(spark, sf)
      .as[(Long, Int)].collect().toSet
    assert(got == truth,
      s"escalation did not reach the fixed point: ${(got diff truth).take(3)}")
    assert(got.exists(_._2 > 2), "escaped table still clamped at kMax")
  }
}
