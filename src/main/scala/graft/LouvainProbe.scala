package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measurement harness for q101's round-13 scheduling question: do
  * the Louvain move rounds CONVERGE (zero-move round → the early exit
  * fires) or oscillate under the round-frozen volume policy, and if
  * they keep moving, how localized are the movers — i.e. would the
  * §8e.4(ii) pending-skip analog (classes touched by label changes OR
  * by changed community volumes) actually skip anything?
  *
  * `runMain graft.LouvainProbe [dir] [rounds]` — prints, per round:
  * moves, distinct changed communities, and the volume-touched class
  * count (classes with a member in or adjacent to a changed
  * community — the sound skip needs them re-evaluated), plus wall
  * time per round. SURVEY §6.18 records the findings.
  */
object LouvainProbe {
  def main(args: Array[String]): Unit = {
    sys.props("graft.oracleBudgetStrict") = "0" // engine-only probe
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.drop(1).headOption.map(_.toInt)
      .getOrElse(operators.Graph.LouvainRounds)
    val spark = GraftSession.builder(s"local[${GraftSession.defaultCpus}]")
      .config("spark.sql.shuffle.partitions", GraftSession.defaultCpus.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val edges = operators.Graph.copurchaseEdges(spark, dir).cache()
    println(s"== edges: ${edges.count()} (directed), dir=$dir")
    val tc0 = System.nanoTime()
    val colored = operators.Graph.trialColoring(
      edges, operators.Graph.SemiColoringRounds)._1
    val init = colored.select($"node", $"color", $"node".as("lbl")).cache()
    val nColors = init.agg(max($"color")).as[Int].head()
    println(f"== coloring: $nColors colors, ${(System.nanoTime() - tc0) / 1e9}%.1f s")

    // per-(round, class) move counts ride the engine's own observed
    // metrics; round-end labelings are checkpointed frames, so
    // snapshots stay valid for the post-run analysis
    val moved = scala.collection.mutable.Map.empty[(Int, Int), Long]
    val snaps = scala.collection.mutable.Map.empty[Int, DataFrame]
    val roundT = scala.collection.mutable.Map.empty[Int, Long]
    var tRound = System.nanoTime()
    val t0 = System.nanoTime()
    // arg 3 "fresh": run phase 1 under the PER-CLASS-STEP volume
    // policy (q102's freshTot) instead of the shipped round-frozen
    // one — the §8f.1 convergence experiment
    val fresh = args.drop(2).headOption.contains("fresh")
    val stepP = (r: Int, c: Int, lbl: DataFrame) => {
      snaps(r) = lbl
      if (c == nColors) { roundT(r) = System.nanoTime() - tRound; tRound = System.nanoTime() }
    }
    val movedP = (r: Int, c: Int, m: Long) => moved((r, c)) = m
    if (fresh) {
      import org.apache.spark.sql.functions.{count => cnt}
      val deg = edges.groupBy($"src".as("node"))
        .agg(cnt(lit(1)).as("s")).cache()
      val m2 = edges.count()
      operators.Graph.louvainMovesW(edges.withColumn("w", lit(1L)), deg, m2,
        init, rounds, freshTot = true, stepProbe = stepP,
        earlyExit = false, movedProbe = movedP)
      deg.unpersist()
    } else
      operators.Graph.louvainMoves(edges, init, rounds,
        stepProbe = stepP, movedProbe = movedP, earlyExit = false)
    println(f"== full run (earlyExit=false, freshTot=$fresh): ${(System.nanoTime() - t0) / 1e9}%.1f s")

    var prev = init.select($"node", $"lbl")
    for (r <- 0 until rounds if snaps.contains(r)) {
      val cur = snaps(r).select($"node", $"lbl")
      val movers = cur.join(prev.select($"node", $"lbl".as("from")), "node")
        .filter($"lbl" =!= $"from")
        .select($"node", $"from", $"lbl".as("to")).cache()
      val nMoves = movers.count()
      val changed = movers.select(explode(array($"from", $"to")).as("c_lbl"))
        .distinct().cache()
      val nChanged = changed.count()
      // volume-touched classes: a class must re-evaluate a member v
      // if v's own or an adjacent community changed volume — count
      // the classes holding such a node (member OR neighbor-of-member
      // in a changed community), under the round-end labeling
      val inChanged = cur.join(changed, $"lbl" === $"c_lbl")
        .select($"node")
      val adjToChanged = edges
        .join(inChanged.withColumnRenamed("node", "dst"), "dst")
        .select($"src".as("node"))
      val touched = inChanged.unionAll(adjToChanged).distinct()
        .join(init.select($"node", $"color"), "node")
        .select($"color").distinct().count()
      val stepsWithMoves = (1 to nColors).count(c => moved.getOrElse((r, c), 0L) > 0)
      println(f"== round $r: moves=$nMoves%6d  movedClasses=$stepsWithMoves%3d/$nColors  " +
        f"changedComms=$nChanged%5d  volumeTouchedClasses=$touched%3d/$nColors  " +
        f"wall=${roundT.getOrElse(r, 0L) / 1e9}%6.1f s")
      movers.unpersist(); changed.unpersist()
      prev = cur
    }
    // quality readout for the volume-policy A/B: Σ q_num of the final
    // labeling (Q·(2m)² up to the constant — exact integers)
    val qn = operators.Graph.modularityOf(edges, prev)
      .agg(sum($"q_num")).as[Long].head()
    println(s"== final labeling: Sigma q_num = $qn, communities = " +
      prev.select($"lbl").distinct().count())
    spark.stop()
  }
}
