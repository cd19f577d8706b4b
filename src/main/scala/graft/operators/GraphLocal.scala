package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LOCAL ENDGAME for the co-purchase fixed-point family (round 14) —
  * the q102/Louvain fits-on-one-node discipline generalized: the
  * THRESHOLDED co-purchase pair list is metadata-scale by construction
  * (bounded by co-purchase breadth, not corpus size — 3.5k pairs at
  * sf0.1, 2.39M at the 20× probe), while the loops over it were paying
  * 40–56 driver-synchronized jobs each for 5–6 rounds of integer
  * algebra. Below `graft.graphLocalMaxEdges` (default 2²² directed
  * pairs ≈ 100 MB collected, the Louvain bar) each loop replays
  * driver-side with BIT-IDENTICAL integer arithmetic — same sums, same
  * truncating `div` on non-negative operands, same tie-breaks — and
  * `Math.*Exact` mirrors Spark 4's loud ANSI overflow behavior. The
  * DATA-scale operator (the lineitem self-join building the pairs)
  * stays distributed at every SF; beyond the gate the distributed
  * loops run unchanged (OptR14Spec pins local == forced-distributed
  * per entry; the sf0.01 oracle hash gates the local path directly).
  */
object GraphLocal {

  def maxEdges: Long =
    sys.props.get("graft.graphLocalMaxEdges").map(_.toLong)
      .getOrElse(1L << 22)

  /** Collected symmetric weighted adjacency of the threshold-2 pair
    * list: (src, dst, w) both directions. */
  private[graft] def collectSym(prs: DataFrame): Array[(Long, Long, Long)] = {
    val s = prs.sparkSession
    import s.implicits._
    val half = prs.select($"pa", $"pb", $"n_orders".cast("long"))
      .as[(Long, Long, Long)].collect()
    half.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
  }

  /** Degree map over symmetric edges (count of out-rows per src —
    * exactly the distributed groupBy(src).count()). */
  private def degrees(es: Array[(Long, Long, Long)]): Map[Long, Long] =
    es.groupBy(_._1).map { case (n, xs) => n -> xs.length.toLong }

  /** The ego seed: max symmetric degree, min key on ties — exactly
    * `Graph.egoSeed`'s orderBy(deg desc, n).head. */
  private def seedOf(deg: Map[Long, Long]): Long =
    deg.toSeq.minBy { case (n, d) => (-d, n) }._1

  /** q53/q77's damped integer PageRank rounds. `seed` = None is the
    * uniform restart (q53), Some(s) pins the restart mass (q77). */
  private def rankRounds(es: Array[(Long, Long, Long)], iters: Int,
      seed: Option[Long]): Map[Long, Long] = {
    val deg = degrees(es)
    val scale = Graph.Scale
    var ranks: Map[Long, Long] = seed match {
      case None => deg.map { case (n, _) => n -> scale }
      case Some(sd) => deg.map { case (n, _) => n -> (if (n == sd) scale else 0L) }
    }
    for (_ <- 1 to iters) {
      val c = collection.mutable.HashMap.empty[Long, Long]
      es.foreach { case (src, dst, _) =>
        val add = ranks(src) / deg(src)
        c.update(dst, Math.addExact(c.getOrElse(dst, 0L), add))
      }
      ranks = ranks.map { case (n, _) =>
        val base = seed match {
          case None => scale * 15 / 100
          case Some(sd) => if (n == sd) scale * 15 / 100 else 0L
        }
        n -> Math.addExact(base,
          Math.multiplyExact(85L, c.getOrElse(n, 0L)) / 100)
      }
    }
    ranks
  }

  /** q53: top-50 (rank desc, node asc) as (l_partkey, pr_rank). */
  def pagerankTop(s: SparkSession, prs: DataFrame, iters: Int,
      outCol: String): DataFrame = {
    import s.implicits._
    val ranks = rankRounds(collectSym(prs), iters, None)
    val top = ranks.toSeq.sortBy { case (n, r) => (-r, n) }.take(50)
    top.toDF("l_partkey", outCol)
      .orderBy(col(outCol).desc, $"l_partkey")
  }

  /** q77: personalized variant — rank>0 filter, top-50. */
  def pprTop(s: SparkSession, prs: DataFrame, iters: Int): DataFrame = {
    import s.implicits._
    val es = collectSym(prs)
    val seed = seedOf(degrees(es))
    val ranks = rankRounds(es, iters, Some(seed))
    val top = ranks.toSeq.filter(_._2 > 0L)
      .sortBy { case (n, r) => (-r, n) }.take(50)
    top.toDF("l_partkey", "ppr_rank")
      .orderBy($"ppr_rank".desc, $"l_partkey")
  }

  /** q80: weighted rounds — contrib = (rank·w) div Σw(src). */
  def weightedPagerankTop(s: SparkSession, prs: DataFrame,
      iters: Int): DataFrame = {
    import s.implicits._
    val es = collectSym(prs)
    val scale = Graph.Scale
    val wdeg = es.groupBy(_._1).map { case (n, xs) =>
      n -> xs.map(_._3).sum }
    var ranks: Map[Long, Long] = wdeg.map { case (n, _) => n -> scale }
    for (_ <- 1 to iters) {
      val c = collection.mutable.HashMap.empty[Long, Long]
      es.foreach { case (src, dst, w) =>
        val add = Math.multiplyExact(ranks(src), w) / wdeg(src)
        c.update(dst, Math.addExact(c.getOrElse(dst, 0L), add))
      }
      ranks = ranks.map { case (n, _) =>
        n -> Math.addExact(scale * 15 / 100,
          Math.multiplyExact(85L, c.getOrElse(n, 0L)) / 100)
      }
    }
    val top = ranks.toSeq.sortBy { case (n, r) => (-r, n) }.take(50)
    top.toDF("l_partkey", "wpr_rank")
      .orderBy($"wpr_rank".desc, $"l_partkey")
  }

  /** q81: synchronous LPA — per round each node adopts its neighbors'
    * most frequent label, ties to the MIN label (the distributed
    * max(struct(cnt, −lbl)) argmax). */
  def labelPropTable(s: SparkSession, prs: DataFrame,
      rounds: Int): DataFrame = {
    import s.implicits._
    val es = collectSym(prs)
    var lbls: Map[Long, Long] = es.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      // votes: (node, neighborLabel) counts; edges (src, dst) vote
      // dst's label onto src — exactly the distributed join on dst
      val votes = collection.mutable.HashMap.empty[(Long, Long), Long]
      es.foreach { case (src, dst, _) =>
        val k = (src, lbls(dst))
        votes.update(k, votes.getOrElse(k, 0L) + 1L)
      }
      lbls = votes.toSeq.groupBy(_._1._1).map { case (n, vs) =>
        n -> vs.map { case ((_, l), cnt) => (cnt, -l) }.max._2 * -1L
      }
    }
    val sizes = lbls.values.groupBy(identity).map { case (l, xs) =>
      l -> xs.size.toLong }
    val out = lbls.toSeq.map { case (n, l) => (n, l, sizes(l)) }
      .sortBy(_._1)
    out.toDF("l_partkey", "community", "community_size")
      .orderBy($"l_partkey")
  }

  /** q79: h-index core-number fixed point, same early exit (Σc
    * unchanged ⇒ converged). H({c(u)}) = max k with |{u: c(u) ≥ k}| ≥ k
    * — computed from the desc-sorted neighbor estimates. */
  def coreHindexTable(s: SparkSession, prs: DataFrame,
      rounds: Int): DataFrame = {
    import s.implicits._
    val es = collectSym(prs)
    val nbrs = es.groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2) }
    var c: Map[Long, Long] = nbrs.map { case (n, xs) => n -> xs.length.toLong }
    var tot = c.values.sum
    var converged = false
    var r = 0
    while (r < rounds && !converged) {
      c = nbrs.map { case (n, xs) =>
        val est = xs.map(c).sortBy(-_)
        var h = 0L
        var i = 0
        while (i < est.length && est(i) >= i + 1) { h = i + 1; i += 1 }
        n -> math.min(c(n), h)
      }
      val t2 = c.values.sum
      converged = t2 == tot
      tot = t2; r += 1
    }
    c.toSeq.sortBy(_._1).map { case (n, v) => (n, v.toInt) }
      .toDF("l_partkey", "core_number").orderBy($"l_partkey")
  }

  /** BFS layers to `radius` from one seed: node → hops (min). */
  private def bfs(adj: Map[Long, Array[Long]], seed: Long,
      radius: Int): Map[Long, Int] = {
    val dist = collection.mutable.HashMap(seed -> 0)
    var frontier = Set(seed)
    for (h <- 1 to radius if frontier.nonEmpty) {
      val nxt = frontier.flatMap(n => adj.getOrElse(n, Array.empty[Long]))
        .filterNot(dist.contains)
      nxt.foreach(n => dist.update(n, h))
      frontier = nxt
    }
    dist.toMap
  }

  /** q78: hop table within `radius` of the ego seed. */
  def seedReachTable(s: SparkSession, prs: DataFrame,
      radius: Int): DataFrame = {
    import s.implicits._
    val es = collectSym(prs)
    val adj = es.groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2) }
    val seed = seedOf(degrees(es))
    bfs(adj, seed, radius).toSeq.sortBy(_._1)
      .toDF("l_partkey", "hops").orderBy($"l_partkey")
  }

  /** q100: the exact modularity score table over the symmetric
    * threshold-2 edge list and a (node → community) labeling —
    * per community: size, Σ member degrees, intra-community directed
    * edge count, 2m, and the exact integer numerator
    * q_num = intra·2m − total_deg², with the distributed operator's
    * loud int64 overflow failure. */
  def modularityTable(s: SparkSession, prs: DataFrame,
      labels: Map[Long, Long]): DataFrame = {
    import s.implicits._
    val es = collectSym(prs)
    val m2 = es.length.toLong
    val deg = degrees(es)
    val bySize = labels.groupBy(_._2).map { case (l, xs) => l -> xs.size.toLong }
    val byDeg = labels.toSeq.groupBy(_._2).map { case (l, xs) =>
      l -> xs.iterator.map { case (n, _) => deg(n) }.sum }
    val intra = es.iterator
      .filter { case (a, b, _) => labels(a) == labels(b) }
      .toSeq.groupBy { case (a, _, _) => labels(a) }
      .map { case (l, xs) => l -> xs.size.toLong }
    val out = bySize.keys.toSeq.sorted.map { c =>
      val qn = BigInt(intra.getOrElse(c, 0L)) * m2 -
        BigInt(byDeg(c)) * BigInt(byDeg(c))
      require(qn.isValidLong, "q100_modularity: exact-integer overflow " +
        "in q_num (int64 range)")
      (c, bySize(c), intra.getOrElse(c, 0L), byDeg(c), m2, qn.toLong)
    }
    out.toDF("community", "community_size", "intra_deg", "total_deg",
      "m2", "q_num").orderBy($"community")
  }

  /** q82: harmonic centrality from the top-`nSeeds`-degree pivots
    * (deg desc, key asc), radius-truncated: per node, count of pivots
    * reaching it and Σ Scale div hops over hops > 0. Every node of the
    * symmetric graph appears (zero-filled). */
  def harmonicTable(s: SparkSession, prs: DataFrame, nSeeds: Int,
      radius: Int): DataFrame = {
    import s.implicits._
    val es = collectSym(prs)
    val deg = degrees(es)
    val adj = es.groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2) }
    val seeds = deg.toSeq.sortBy { case (n, d) => (-d, n) }
      .take(nSeeds).map(_._1)
    val contrib = collection.mutable.HashMap.empty[Long, (Long, Long)]
    seeds.foreach { sd =>
      bfs(adj, sd, radius).foreach { case (n, h) =>
        if (h > 0) {
          val (cnt, sum) = contrib.getOrElse(n, (0L, 0L))
          contrib.update(n, (cnt + 1L, Math.addExact(sum, Graph.Scale / h)))
        }
      }
    }
    val out = deg.keys.toSeq.sorted.map { n =>
      val (cnt, sum) = contrib.getOrElse(n, (0L, 0L))
      (n, cnt, sum)
    }
    out.toDF("l_partkey", "n_seeds", "harmonic_1e6").orderBy($"l_partkey")
  }
}
