package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Relational

/** Streaming CDC apply — the production shape that turns the q34 batch
  * MERGE into a continuously-maintained table: each micro-batch of
  * change rows is merged into the parquet base by key via
  * `foreachBatch`, with exactly-once effects coming from the
  * checkpoint's batch-id dedup (a replayed batch rewrites the same
  * result).
  *
  * The base here is plain parquet, so the merge is read → full-outer
  * upsert → write-new → swap; never destroy the current base before
  * the new version is durable. At lake scale the same `foreachBatch`
  * body targets a table format's transactional MERGE instead of the
  * directory swap — the streaming wiring is identical.
  */
object CdcStream {

  /** Start applying `changes` (a streaming DataFrame with the base's
    * schema, unique per key within a batch) onto the parquet table at
    * `baseDir`. AvailableNow: drains what has arrived, then stops —
    * rerun to pick up more (the restart path the spec exercises). */
  def start(changes: DataFrame, baseDir: String, key: String,
      checkpoint: String): StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val base = spark.read.parquet(baseDir)
        // batch rows may repeat a key only across batches, not within
        // one (upstream CDC compaction's job); the merge itself is the
        // shared batch operator
        val merged = Relational.upsert(base, batch, key)
        val tmp = new java.io.File(baseDir + s".tmp-$batchId")
        merged.write.mode("overwrite").parquet(tmp.toString)
        val dir = new java.io.File(baseDir)
        val old = new java.io.File(baseDir + s".old-$batchId")
        // swap: current → old, new → current, then drop old. The
        // checkpoint replays the batch on a crash between renames.
        if (!dir.renameTo(old))
          throw new java.io.IOException(s"cannot stage $baseDir aside")
        if (!tmp.renameTo(dir))
          throw new java.io.IOException(s"cannot promote $tmp")
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
        }
        rm(old)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
