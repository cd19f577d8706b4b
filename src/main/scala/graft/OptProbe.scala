package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted}

/** Round-14 optimization measurement harness: time named registry
  * entries under the bench's exact conditions (noop sink, warm JIT,
  * memoized artifacts) and report the driver-synchronized job/stage
  * bill per run — the per-entry A/B loop (guide §1) without paying a
  * full 4-sweep bench per iteration.
  *
  * `runMain graft.OptProbe <sfDir> <name,name,...> [reps]`
  *
  * Per entry: one untimed warmup run (codegen + model/index fits),
  * then `reps` timed runs (default 3) with Caches cleared BEFORE each
  * timed rep exactly like a bench warm sweep — artifacts rebuild
  * inside the rep, and the per-rep artifact-build seconds are reported
  * separately (the self-clock split the bench archives carry).
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stages.incrementAndGet()
    })
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try { exec(fn(spark, dir)) } catch { case e: Throwable =>
        System.err.println(s"[optprobe] $name warmup failed: $e") }
      (1 to reps).foreach { i =>
        Caches.clear()
        Caches.drainBuildLog()
        val (j0, s0, t0) = (jobs.get, stages.get, System.nanoTime())
        exec(fn(spark, dir))
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        val builds = Caches.drainBuildLog()
        val bsec = builds.map(_._2).sum
        println(f"== $name%-22s rep$i $sec%7.2f s (self ${sec - bsec}%6.2f)" +
          f"  jobs ${jobs.get - j0}%4d  stages ${stages.get - s0}%5d" +
          (if (builds.nonEmpty) builds.map { case (k, v) =>
            f"$k=$v%.2f" }.mkString("  [", " ", "]") else ""))
      }
    }
    spark.stop()
  }
}
