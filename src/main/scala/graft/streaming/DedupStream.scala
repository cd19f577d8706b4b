package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Dedup

/** Streaming incremental dedup — d11's twin: arriving documents are
  * flagged against the STATIC prebuilt index (the curated old corpus)
  * per micro-batch. A micro-batch IS "a new snapshot increment", so
  * the batch operator reuses d11's exact query path (`d11Match`):
  * per-batch work is the batch's own signatures, one band equi-join
  * against the posting table, one exact `sorted_intersect_size`
  * verify per candidate.
  *
  * There is NO streaming state at all: the index artifact is the
  * state, and it is external and immutable for the run — the
  * stream-static pattern (like the enrichment twin), not a stateful
  * operator. Exactly-once effects come from per-batchId output
  * directories rewritten idempotently under the checkpoint's batch
  * replay (the CDC/AnomalyStream foreachBatch recipe): a replayed
  * batch overwrites its own directory with identical rows.
  */
object DedupStream {

  /** Start deduplicating `docs` (streaming, columns doc_id + text)
    * against the d11 index of `dir`'s even half. Results land in
    * `outDir/batch=<id>/` as (new_id, old_id, jaccard) parquet. */
  def start(docs: DataFrame, dir: String, outDir: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val (docIdx, bandIdx) = Dedup.d11Index(s, dir)
        Dedup.d11Match(Dedup.incSigFrame(batch), docIdx, bandIdx)
          .write.mode("overwrite")
          .parquet(s"$outDir/batch=$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
