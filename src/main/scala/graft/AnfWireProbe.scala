package graft

import org.apache.spark.sql.functions._

/** q97 WIRE ACCOUNTING at scale: for each lgK, run the HyperANF loop
  * on the probe graph and report what one round's sketch shuffle
  * actually carries — the per-round payload bound is directed edges ×
  * the measured serialized sketch size (every edge ships its source's
  * sketch to the dst-keyed union; map-side partial union can only
  * shrink it). lgK is the accuracy/wire knob: +2 lgK quadruples the
  * register file (~4× wire once sketches densify) for 2× lower
  * relative standard error. `runMain graft.AnfWireProbe [dir]
  * [lgK...]` — defaults to the 20× corpus and lgK ∈ {8, 10, 12}.
  */
object AnfWireProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-scale-x20")
    val lgKs = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(8, 10, 12)
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
    val nEdges = edges.count()
    println(s"== directed edges: $nEdges")
    for (lgK <- lgKs) {
      val t0 = System.nanoTime()
      val (state, totals) = operators.Graph.anfLoop(edges,
        operators.Graph.AnfRounds, lgK)
      val sec = (System.nanoTime() - t0) / 1e9
      val (avgB, maxB) = state
        .agg(avg(length($"sk")), max(length($"sk")))
        .as[(Double, Int)].head()
      val wireMb = nEdges * avgB / 1e6
      println(f"== lgK=$lgK%2d  ${sec}%6.1f s  rounds=${totals.size - 1}  " +
        f"N(inf)=${totals.last}  sketch avg=${avgB}%.0f B max=$maxB B  " +
        f"wire/round<=${wireMb}%.1f MB")
    }
    spark.stop()
  }
}
