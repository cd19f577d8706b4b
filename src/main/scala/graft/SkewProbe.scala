package graft

import org.apache.spark.sql.functions._

/** Skew stress experiment: synthesize an events table where ONE user
  * holds 30% of all rows (the hot-key regime a real clickstream always
  * has) and time the user-keyed operators on it. This is the
  * measurement behind SURVEY §5's skew claims:
  *
  *  - q14 sessionize / q22 moving-avg: the hot user's partition is one
  *    giant window partition — the window operator's external sort
  *    spills instead of buffering, so the job finishes instead of
  *    OOMing.
  *  - q30 EWMA: the 256-event horizon bound (round 4) keeps the hot
  *    user's aggregation buffer constant-size where the unbounded
  *    collect_list formulation would hold 2.4M structs in one buffer.
  *  - q17 range join: per-user tolerance-cell bucketing — the hot
  *    user's cells each hold few events (times are spread), so the
  *    equi-join on (user, cell) stays balanced.
  *  - q61_funnel_fold: the funnel state machine scans the hot user's
  *    ~2.4M events LINEARLY off the shuffle sort (O(frontier) state).
  *    The q61 join ladder is deliberately NOT probed here: its
  *    per-user views×clicks product would be ~6·10¹¹ rows inside one
  *    join group on this corpus — the documented reason the fold
  *    exists.
  *
  * `runMain graft.SkewProbe [nEvents]` (default 8M).
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(8000000L)
    val out = s"/tmp/graft-skew-$n"
    val spark = GraftSession.builder(s"local[${GraftSession.defaultCpus}]")
      .config("spark.sql.shuffle.partitions", GraftSession.defaultCpus.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    if (!new java.io.File(s"$out/events.parquet").exists()) {
      // 30% of rows land on user 1; the rest spread over 10k users.
      // Event times advance 40 s per global row, so the hot user's
      // events sit ~130 s apart: inside one 1800 s session gap (q14
      // sees a single 2.4M-event session — the worst case) and within
      // a couple of 300 s range-join tolerances of each other (bounded
      // pair fan-out, the shape real timelines have).
      spark.range(n)
        .select(
          ($"id" * 40000L * 1000000L + 1000000000000000000L).as("ts"), // ns
          $"id".as("event_id"),
          when(pmod($"id", lit(10)) < 3, 1L)
            .otherwise(pmod(xxhash64($"id"), lit(10000L)) + 2L).as("user_id"),
          element_at(array(lit("view"), lit("click"), lit("purchase")),
            (pmod($"id", lit(3)) + 1).cast("int")).as("event_type"),
          (pmod($"id", lit(1000)) / 10.0).as("value"))
        .repartition(GraftSession.defaultCpus)
        .write.mode("overwrite").parquet(s"$out/events.parquet")
    }
    val total = spark.read.parquet(s"$out/events.parquet").count()
    val hot = spark.read.parquet(s"$out/events.parquet")
      .filter($"user_id" === 1L).count()
    println(s"== skew corpus: $total events, hot user holds $hot (${hot * 100 / total}%)")

    for (q <- Seq("q14_sessionize", "q22_moving_avg", "q30_ewma", "q17_range_join",
                  "q44_gap_fill", "q46_attribution", "q42_cohort_retention",
                  "q61_funnel_fold")) {
      val df = SparkEntry.queries(q)(spark, out)
      val t0 = System.nanoTime()
      // noop sink: full evaluation (count() would prune the windows
      // whose skew behavior is exactly what this probe measures)
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"== $q%-18s $sec%7.1f s  (${df.count()} rows)")
    }
    spark.stop()
  }
}
