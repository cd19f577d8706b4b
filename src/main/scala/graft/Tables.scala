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

  /** `events` with the ns-precision `ts` (read as epoch-nanos long —
    * see GraftSession) reduced to exact epoch milliseconds `ms`.
    * Integer `div`, never float division: 1.7e18 ns exceeds a double's
    * exact-integer range. */
  def eventsWithMs(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "events")
      .withColumn("ms", org.apache.spark.sql.functions.expr("ts div 1000000L"))
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")

  private def load(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
