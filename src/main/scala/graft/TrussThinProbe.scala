package graft

import org.apache.spark.sql.functions._

/** q98 thinned-screen recall/time-vs-p curve on the 20× densified
  * probe graph (the dense regime the thinned entry's docstring claims
  * as its win case). `runMain graft.TrussThinProbe [dir] [k] [p1000...]`
  * — exact truss computed once (memoized in-session), then each p's
  * screen+peel timed WARM (the shared pair artifact built before the
  * loop, so the per-p numbers compare screens, not artifact builds)
  * with recall = |thinned ∩ exact| / |exact| (precision is structural
  * — survivors peel exactly, so thinned ⊆ exact; asserted here too).
  */
object TrussThinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-scale-x20")
    val k = if (args.length > 1) args(1).toInt else operators.Graph.TrussK
    val ps = if (args.length > 2) args.drop(2).map(_.toLong).toSeq
      else Seq(500L, 300L, 200L, 100L)
    val spark = GraftSession.builder(s"local[${GraftSession.defaultCpus}]")
      .config("spark.sql.shuffle.partitions", GraftSession.defaultCpus.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val t0 = System.nanoTime()
    val exact = operators.Graph.q98Ktruss(spark, dir, k = k)
      .select($"pa", $"pb").as[(Long, Long)].collect().toSet
    println(f"== exact truss k=$k       ${(System.nanoTime() - t0) / 1e9}%7.1f s  (${exact.size} edges)")
    for (p <- ps) {
      val t1 = System.nanoTime()
      val thin = operators.Graph.q98TrussThinned(spark, dir, k = k, p1000 = p)
        .select($"pa", $"pb").as[(Long, Long)].collect().toSet
      val sec = (System.nanoTime() - t1) / 1e9
      val extra = thin -- exact
      require(extra.isEmpty, s"precision violated at p=$p: ${extra.take(3)}")
      val recall = if (exact.isEmpty) 1.0 else thin.size.toDouble / exact.size
      println(f"== thinned p=${p / 1000.0}%.1f        $sec%7.1f s  (${thin.size} edges, recall $recall%.3f)")
    }
    spark.stop()
  }
}
