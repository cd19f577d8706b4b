package graft

import org.apache.spark.sql.DataFrame

/** Per-dataset memoization of materialized intermediate results.
  *
  * The registry pattern the engine already uses for models (ALS,
  * sentiment) and indexes (IVF), applied to expensive derived FRAMES:
  * an operator's pair table or signature table is an artifact of the
  * dataset, so repeated invocations (a pipeline stage reusing d2's
  * pairs, a bench iteration, a dependent operator) serve the cached
  * artifact instead of re-running the join and re-`cache()`-ing the
  * same plan (the "Asked to cache already cached data" churn).
  *
  * `memo` caches the built frame, forces materialization, then runs
  * `andThen` (for unpersisting the build's scaffolding caches) — so
  * executor storage holds exactly the artifacts, not every
  * intermediate that produced them.
  */
object Caches {

  private val frames =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  /** Eagerly materialize a loop-state frame AND sever its inherited
    * plan statistics. `localCheckpoint` truncates lineage but COPIES
    * the child plan's `Statistics` onto the `LogicalRDD` it returns;
    * in an iterative loop whose step joins the previous state k ≥ 2
    * times, the inherited `sizeInBytes` MULTIPLIES per step — a
    * BigInt whose bit length DOUBLES per iteration (measured in q84:
    * 1.2k bits after one subround, 1.6e8 bits eighteen subrounds
    * later, by which point Catalyst stats arithmetic — Toom-Cook
    * multiplication of hundred-megabit integers — owns the driver and
    * each step takes 2× the last). Rebuilding the frame from the
    * checkpointed RDD resets the leaf to default stats: per-step
    * planning cost becomes constant. The extra InternalRow↔Row bounce
    * executes per downstream use of the STATE table (nodes, not
    * edges) — noise next to the join work it feeds. */
  def checkpointFresh(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(eager = true)
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  /** `.checkpointFresh` postfix syntax for loop bodies. */
  implicit class FreshCheckpoint(private val df: DataFrame) extends AnyVal {
    def checkpointFresh: DataFrame = Caches.checkpointFresh(df)
  }

  /** Memoized cached frame for (op key, dataset dir). `build` runs at
    * most once per key; its result is cached and materialized before
    * `cleanup` runs (safe point to unpersist intermediates). */
  def memo(key: String, dir: String)(build: => DataFrame)(
      cleanup: => Unit = ()): DataFrame =
    frames.getOrElseUpdate((key, dir), {
      val df = build.cache()
      df.count() // materialize so cleanup can't force a recompute
      cleanup
      df
    })

  /** Drop every memoized frame (unpersisting its cache). Bench calls
    * this between sweeps so the timed re-sweep measures real
    * recomputation under warm JIT/models — not reads of the first
    * sweep's cached results. */
  def clear(): Unit = {
    frames.values.foreach(_.unpersist())
    frames.clear()
  }
}
