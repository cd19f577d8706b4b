package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted}
import org.apache.spark.sql.functions._

/** Round-14 measurement harness for q102's scheduling floor (the r13
  * verdict's "What's wrong #2"): per-phase wall time AND the actual
  * driver-synchronized job/stage counts of the phase-2 chain
  * (contraction → supergraph coloring → weighted move steps →
  * projection), so the "~144 jobs" estimate is replaced by a
  * measured number before any restructuring.
  *
  * `runMain graft.Q102Probe [dir]`
  */
object Q102Probe {
  def main(args: Array[String]): Unit = {
    sys.props("graft.oracleBudgetStrict") = "0"
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stages.incrementAndGet()
    })
    def phase[T](name: String)(body: => T): T = {
      val (j0, s0, t0) = (jobs.get, stages.get, System.nanoTime())
      val out = body
      // listener events are async; settle before reading
      Thread.sleep(200)
      println(f"== $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s   " +
        f"jobs ${jobs.get - j0}%4d   stages ${stages.get - s0}%5d")
      out
    }

    val edges = phase("edges (pair build)") {
      val e = operators.Graph.copurchaseEdges(spark, dir).cache()
      e.count(); e
    }
    val l1 = phase("phase-1 labels") {
      val l = operators.Graph.louvainLabels(spark, dir)
      l.count(); l
    }
    val le = phase("contraction agg") {
      val le = edges
        .join(l1.select($"node".as("src"), $"lbl".as("la")), "src")
        .join(l1.select($"node".as("dst"), $"lbl".as("lb")), "dst")
        .groupBy($"la", $"lb").agg(count(lit(1)).as("w"))
        .cache()
      le.count(); le
    }
    val cross = le.filter($"la" =!= $"lb")
      .select($"la".as("src"), $"lb".as("dst"), $"w")
    val strength = le.groupBy($"la".as("node"))
      .agg(sum($"w").as("s")).cache()
    val (nSuper, nCross) = phase("supergraph size") {
      (strength.count(), cross.count())
    }
    println(s"==   supernodes=$nSuper crossEdges=$nCross")
    val col2 = phase("supergraph coloring") {
      val c = operators.Graph.trialColoring(cross.select($"src", $"dst"),
        operators.Graph.SemiColoringRounds)._1.cache()
      c.count(); c
    }
    val nColors = col2.agg(coalesce(max($"color"), lit(0))).as[Int].head()
    println(s"==   p2 colors=$nColors (budget ${operators.Graph.LouvainP2Colors})")
    val m2w = edges.count()
    val init2 = col2.select($"node", $"color", $"node".as("lbl"))
    val moved = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
    val l2 = phase("weighted move steps") {
      val l = operators.Graph.louvainMovesW(cross, strength, m2w, init2,
        operators.Graph.LouvainP2Rounds, freshTot = true,
        movedProbe = (r, c, m) => moved += ((r, c, m)))
      l.count(); l
    }
    val perRound = moved.groupBy(_._1).view
      .mapValues(ms => (ms.map(_._3).sum, ms.size)).toMap
    println(s"==   moves/round: " + perRound.toSeq.sortBy(_._1)
      .map { case (r, (m, steps)) => s"r$r=$m($steps steps)" }.mkString(" "))
    phase("projection + summary") {
      val projected = l1
        .join(l2.select($"node".as("lbl"), $"lbl".as("lbl2")), Seq("lbl"), "left")
        .select($"node", coalesce($"lbl2", $"lbl").as("lbl"))
      val sz = projected.groupBy($"lbl").agg(count(lit(1)).as("community_size"))
      projected.join(sz, "lbl").count()
    }
    // marginal q102 A/B over the warm l1 artifact: the r14 local
    // endgame vs the forced-distributed path, back-to-back
    for (_ <- 1 to 2) {
      phase("q102 entry (local)") {
        operators.Graph.q102LouvainCoarse(spark, dir).count()
      }
      sys.props("graft.louvainLocalMaxEdges") = "0"
      phase("q102 entry (dist)") {
        operators.Graph.q102LouvainCoarse(spark, dir).count()
      }
      sys.props.remove("graft.louvainLocalMaxEdges")
    }
    spark.stop()
  }
}
