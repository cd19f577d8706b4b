package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory for the graft engine.
  *
  * Defaults are sized for local[32] testing but every knob is the one
  * you'd set on a 1000-executor cluster too: AQE (runtime re-plan,
  * skew-join splitting, partition coalescing), explicit shuffle
  * parallelism, UTC session time, and a broadcast threshold large
  * enough that all TPC-H-style dimension tables broadcast.
  */
object GraftSession {

  /** Builder with graft defaults; caller may override any conf. */
  def builder(master: String = s"local[${defaultCpus}]"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", defaultCpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // TypedImperativeAggregates (topk/minhash/simhash) carry small
      // k-bounded buffers, and the 128-group default silently degrades
      // every ObjectHashAggregate to sort-based aggregation. 64k is
      // deliberately NOT unbounded: collect_list-style aggregates also
      // run through this operator with unbounded per-group buffers, and
      // the sort-based fallback is what spills them — 64k groups covers
      // every per-partition group count in this suite (≤ a few
      // thousand) while capping the no-spill exposure.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      // If events.parquet carries TIMESTAMP(NANOS) (Spark has no ns
      // timestamp type), read it as epoch-nanos LongType; a
      // TIMESTAMP(MICROS) file is unaffected and reads as timestamp.
      // Tables.eventsWithMs adapts to whichever type arrives.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bucketed-table writes land here (saveAsTable), not in cwd
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-warehouse")
      .config("spark.ui.enabled", "false")

  def defaultCpus: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
