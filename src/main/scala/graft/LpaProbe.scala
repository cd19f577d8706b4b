package graft

import org.apache.spark.sql.functions._

/** q84 schedule accounting on the 20× densified probe graph: times
  * the trial-coloring pre-pass separately from the full entry and
  * reports rounds/colors — the split that says where the q84 20×
  * wall-clock actually goes (coloring rounds vs colors × LPA sweeps).
  * `runMain graft.LpaProbe [dir] [window]` — the optional window arg
  * drives the §8e.1(b) rounds-for-colors experiment (W=8/W=16) now
  * that skip-gated sweep steps make extra colors nearly free.
  */
object LpaProbe {
  def main(args: Array[String]): Unit = {
    sys.props("graft.oracleBudgetStrict") = "0" // engine-only probe
    val dir = args.headOption.getOrElse("/tmp/graft-scale-x20")
    val window = args.drop(1).headOption.map(_.toInt)
      .getOrElse(operators.Graph.SemiPickWindow)
    // arg 3: "full" re-aggregates colored neighborhoods per round
    // (the pre-round-12 form) instead of the incremental used state
    val inc = !args.drop(2).headOption.contains("full")
    val spark = GraftSession.builder(s"local[${GraftSession.defaultCpus}]")
      .config("spark.sql.shuffle.partitions", GraftSession.defaultCpus.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val prs = operators.Analytics.copurchasePairs(spark, dir)
      .filter($"n_orders" >= 2)
    val edges = prs.select($"pa".as("src"), $"pb".as("dst"))
      .unionAll(prs.select($"pb".as("src"), $"pa".as("dst")))
      .cache()
    println(s"== directed edges: ${edges.count()}")
    val t0 = System.nanoTime()
    val (col, rounds) = operators.Graph.trialColoring(edges,
      operators.Graph.SemiColoringRounds, window, inc)
    val nColors = col.agg(max($"color")).as[Int].head()
    val colSec = (System.nanoTime() - t0) / 1e9
    println(f"== trial coloring W=$window inc=$inc  $colSec%7.1f s  ($rounds rounds, $nColors colors)")
    val t1 = System.nanoTime()
    val steps0 = operators.Graph.lpaSweepSteps.get()
    val lbl = operators.Graph.semiSyncLabels(edges, window = window)
    val n = lbl.count()
    val steps = operators.Graph.lpaSweepSteps.get() - steps0
    val allSec = (System.nanoTime() - t1) / 1e9
    println(f"== full semi-sync       $allSec%7.1f s  ($n nodes; sweeps ≈ ${allSec - colSec}%.1f s, $steps executed of ≤ ${operators.Graph.SemiLpaRounds} rounds × $nColors colors = ${operators.Graph.SemiLpaRounds * nColors})")
    spark.stop()
  }
}
