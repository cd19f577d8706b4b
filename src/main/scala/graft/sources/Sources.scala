package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingest / egress for the graft engine.
  *
  * Rules that matter at 100 TB:
  *  - ALWAYS pass an explicit schema. `inferSchema` is a full extra
  *    pass over the data; on a large lake it doubles the read.
  *  - Parquet in, parquet out: the only format here that carries
  *    column statistics, predicate pushdown, and column pruning.
  *    CSV/JSON are ingest-edge formats — convert once, then query
  *    parquet.
  *  - Partition output by the dominant filter key (e.g. a date) so
  *    partition pruning skips whole directories; bucket by the
  *    dominant join key so co-bucketed joins skip the shuffle.
  */
object Sources {

  /** Schema-enforced CSV reader (header + malformed-row tolerance are
    * explicit, never inferred). */
  def readCsv(s: SparkSession, path: String, schema: StructType,
              header: Boolean = true, mode: String = "PERMISSIVE"): DataFrame =
    s.read.schema(schema)
      .option("header", header.toString)
      .option("mode", mode)
      .csv(path)

  /** Schema-enforced JSON-lines reader. */
  def readJsonLines(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  def readParquet(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** Parquet writer partitioned by the dominant filter columns —
    * downstream scans prune partitions before touching a file. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionBy: Seq[String] = Nil,
                       mode: String = "overwrite"): Unit = {
    val w: DataFrameWriter[Row] = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Bucketed managed-table writer: co-bucketing both sides of a
    * recurring join on the join key removes its shuffle entirely
    * (SortMergeJoin reads pre-shuffled buckets). */
  def writeBucketed(df: DataFrame, table: String, bucketBy: String,
                    numBuckets: Int, sortBy: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").bucketBy(numBuckets, bucketBy)
    sortBy.fold(w)(c => w.sortBy(c)).format("parquet").saveAsTable(table)
  }
}
