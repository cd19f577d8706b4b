package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the graft star schema + document/embedding/event tables.
  *
  * Always `spark.read.parquet` — Catalyst prunes columns and pushes
  * predicates into the scan, so loaders stay projection-free; callers
  * `.select(...)` and the scan narrows automatically.
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame    = load(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame    = load(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame  = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = load(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame    = load(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame  = load(s, dir, "lineitem")
  def events(s: SparkSession, dir: String): DataFrame    = load(s, dir, "events")

  /** `events` with `ts` reduced to exact epoch milliseconds `ms`,
    * adaptive to the physical type the parquet carries:
    *   - TIMESTAMP(NANOS) read as epoch-nanos LongType (the
    *     `nanosAsLong` legacy conf in GraftSession): `ts div 1000000`.
    *   - TIMESTAMP(MICROS) read as TIMESTAMP / TIMESTAMP_NTZ:
    *     `unix_micros(cast(ts as timestamp)) div 1000` — the NTZ→TZ
    *     cast is exact under the session's UTC time zone and matches
    *     the DuckDB oracle's `epoch_ms(ts)` (naive-as-UTC) semantics.
    * Integer `div` end-to-end, never float division: epoch nanos
    * (1.7e18) exceed a double's exact-integer range. */
  def eventsWithMs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.LongType
    val e = load(s, dir, "events")
    val ms = e.schema("ts").dataType match {
      case LongType => expr("ts div 1000000L")
      case _        => expr("unix_micros(cast(ts as timestamp)) div 1000L")
    }
    e.withColumn("ms", ms)
  }
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")

  private def load(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
