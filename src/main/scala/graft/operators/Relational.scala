package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational query suite — the reference's analytic query surface
  * re-expressed as declarative DataFrame plans.
  *
  * Scale notes (100 TB design):
  *  - every aggregate is a `groupBy().agg()` → Catalyst plans partial
  *    (map-side) aggregation before the shuffle;
  *  - dimension tables (`region`, `nation`, small aggs) are broadcast
  *    explicitly so fact-side data never shuffles for them;
  *  - fact⋈fact joins shuffle on the join key only after filters are
  *    pushed into the parquet scan (verified via explain: PushedFilters);
  *  - top-N uses orderBy+limit → TakeOrderedAndProject (per-partition
  *    top-N, then driver merge of N·parts rows, never a full sort).
  *
  * All money aggregates round to 2 decimals and every query ends in a
  * total-order sort so results hash identically against the DuckDB
  * oracle.
  */
object Relational {

  /** Q1: pricing summary — single-pass grouped aggregate over the fact
    * table; partial agg makes the shuffle O(groups), not O(rows). */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_quantity"), 2).as("avg_qty"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Q2: selective filter + narrow projection — both the predicate and
    * the 3-column read schema reach the parquet scan. */
  def q2FilterPushdown(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1997-01-01").cast("timestamp") &&
              $"l_extendedprice" > 90000.0)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** Q3 (flagship): customer ⋈ orders ⋈ lineitem revenue top-20.
    * orders⋈lineitem is the fact-fact shuffle join (AQE handles skew);
    * customer joins post-aggregation, so it sees one row per customer. */
  def q3TopRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byCust = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey")
      .join(Tables.lineitem(s, dir)
              .select($"l_orderkey",
                      ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev")),
            $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_custkey").agg(sum($"rev").as("raw_rev"))
    Tables.customer(s, dir).select($"c_custkey", $"c_name")
      .join(byCust, $"c_custkey" === $"o_custkey")
      .select($"c_custkey", $"c_name", round($"raw_rev", 2).as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** Q4: star-schema rollup — region/nation broadcast to every task;
    * only orders⋈customer shuffles (on custkey). */
  def q4RegionSales(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir).select($"o_custkey", $"o_totalprice")
      .join(Tables.customer(s, dir).select($"c_custkey", $"c_nationkey"),
            $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(round(sum($"o_totalprice"), 2).as("total_sales"),
           count(lit(1)).as("n_orders"))
      .orderBy($"r_name", $"n_name")
  }

  /** Q5: window rank — top-5 customers by balance per market segment.
    * Single shuffle on the partition key; rank is computed streaming
    * within each sorted partition. */
  def q5WindowRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".desc, $"c_custkey")
    Tables.customer(s, dir)
      .select($"c_mktsegment", $"c_custkey", $"c_acctbal")
      .withColumn("rnk", rank().over(w))
      .filter($"rnk" <= 5)
      .orderBy($"c_mktsegment", $"rnk", $"c_custkey")
  }

  /** Q6: multi-column distinct counts — expand + two-phase distinct
    * aggregation, all map-side partials. */
  def q6DistinctParts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n_parts"),
           countDistinct($"l_suppkey").as("n_supps"))
      .orderBy($"l_returnflag")
  }

  /** Q7: global top-K — plans as TakeOrderedAndProject: each partition
    * keeps K rows, driver merges K·partitions, no full sort. */
  def q7TopkOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(25)
  }

  /** Q8: left-semi join (EXISTS) — probe side streams, no row
    * duplication, build side reduced to join key only. */
  def q8SemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bigOrders = Tables.orders(s, dir)
      .filter($"o_totalprice" > 400000.0).select($"o_custkey")
    Tables.customer(s, dir)
      .join(bigOrders, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .orderBy($"c_custkey")
  }

  /** Q9: left-anti join (NOT EXISTS) — customers with no order above
    * the threshold. */
  def q9AntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val anyOrders = Tables.orders(s, dir)
      .filter($"o_totalprice" > 450000.0).select($"o_custkey")
    Tables.customer(s, dir)
      .join(anyOrders, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** Q10: union of heterogeneous account tables + aggregate — unions
    * are zero-cost plan concatenation in Spark (no shuffle until the
    * groupBy). */
  def q10UnionAccounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir)
      .select(lit("customer").as("kind"), $"c_acctbal".as("bal"))
    val supp = Tables.supplier(s, dir)
      .select(lit("supplier").as("kind"), $"s_acctbal".as("bal"))
    cust.unionAll(supp)
      .groupBy($"kind")
      .agg(count(lit(1)).as("n"),
           round(sum($"bal"), 2).as("total_bal"),
           round(avg($"bal"), 2).as("avg_bal"))
      .orderBy($"kind")
  }

  /** Q11: hierarchical rollup — region → nation → grand total in one
    * pass (Expand + single shuffle). */
  def q11Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir).select($"c_custkey", $"c_nationkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_cust"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  /** Q12: conditional aggregation — CASE WHEN folded into the agg
    * buffer, single scan. */
  def q12CaseAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        round(sum(when($"l_discount" > 0.05, $"l_extendedprice").otherwise(0.0)), 2)
          .as("hi_disc_price"),
        sum(when($"l_quantity" > 25.0, 1L).otherwise(0L)).as("n_bulk"),
        round(max($"l_extendedprice"), 2).as("max_price"),
        round(min($"l_extendedprice"), 2).as("min_price"))
      .orderBy($"l_returnflag")
  }

  /** Q13: scalar subquery — global average is a 1-row aggregate,
    * broadcast to the filter; no correlated per-row execution. */
  def q13ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val avgPrice = o.agg(avg($"o_totalprice").as("ap"))
    o.select($"o_orderkey", $"o_totalprice")
      .join(broadcast(avgPrice))
      .filter($"o_totalprice" > $"ap" * 1.8)
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  /** Q15: pivot — wide conditional aggregation on a known key set, so
    * the plan is a single grouped agg (no per-key scans). */
  def q15PivotEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, dir)
      .groupBy($"user_id")
      .pivot($"event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy($"user_id")
  }

  /** Q34: upsert / CDC merge — apply a change batch onto a base
    * snapshot by key: delta rows override matching base rows (updates)
    * and land as new rows where the base has no key (inserts). The
    * deterministic derivation: base = orders outside every 7th key,
    * delta = every 5th order repriced (+1000, exact double arithmetic —
    * no rounding divergence) and flagged 'U'.
    *
    * One full-outer shuffle join on the key + per-column coalesce —
    * the engine-agnostic MERGE INTO shape. At 100 TB the base side is
    * bucketed/partitioned by the same key, so the delta (typically
    * orders of magnitude smaller) shuffles to it and the join is
    * co-located; nothing is ever broadcast or collected. */
  /** Q35: the SQL surface — the same engine driven through `spark.sql`
    * over registered temp views, proving a SQL-speaking user runs
    * their queries untranslated. The statement compiles to the same
    * Catalyst plan the DataFrame formulation would (pushdown,
    * broadcast dims, partial aggs all apply unchanged); the oracle is
    * the identical statement in DuckDB. */
  def q35Sql(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("customer_v")
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    Tables.nation(s, dir).createOrReplaceTempView("nation_v")
    s.sql("""
      SELECT n_name,
             count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders_v
      JOIN customer_v ON o_custkey = c_custkey
      JOIN nation_v ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
      GROUP BY n_name
      ORDER BY n_name""")
  }

  def q34Upsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderstatus")
    val base = orders.filter($"o_orderkey" % 7 =!= 0)
    val delta = orders.filter($"o_orderkey" % 5 === 0)
      .select($"o_orderkey", $"o_custkey",
        ($"o_totalprice" + 1000.0).as("o_totalprice"),
        lit("U").as("o_orderstatus"))
    upsert(base, delta, "o_orderkey").orderBy($"o_orderkey")
  }

  /** Generic MERGE by key: delta rows override matching base rows,
    * delta-only keys insert, base-only rows pass through. Both sides
    * must share the schema; delta must be unique per key. One
    * full-outer shuffle join + per-column coalesce — at scale the base
    * is partitioned/bucketed on the key so the (smaller) delta
    * shuffles to it. */
  def upsert(base: DataFrame, delta: DataFrame, key: String): DataFrame = {
    val cols = base.columns.filterNot(_ == key)
    val renamed = cols.foldLeft(delta) { (df, c) =>
      df.withColumnRenamed(c, "__d_" + c)
    }
    base.join(renamed, Seq(key), "full_outer")
      .select(col(key) +: cols.map(c =>
        coalesce(col("__d_" + c), col(c)).as(c)): _*)
  }

  /** Q57: the "sole-blame supplier" double-correlation — TPC-H Q21's
    * optimizer shape on this schema (late = shipped > 60 days after
    * the order date, q41's slow threshold): late line items kept only
    * when ANOTHER supplier shares the order (EXISTS) and NO other
    * supplier was ALSO late on it (NOT EXISTS). Declared directly as
    * one LEFT SEMI against the fact table and one LEFT ANTI against
    * the late frame — nothing for the decorrelator to discover, and
    * all three passes hash on the order key the rows already carry.
    * Counts are per late LINE (Q21's grain); top-20 by blame count is
    * a TakeOrdered, never a global sort. */
  def q57BlameSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
    val late = li
      .join(Tables.orders(s, dir).select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .filter(datediff($"l_shipdate", $"o_orderdate") > 60)
      .select($"l_orderkey", $"l_suppkey")
    val shared = late.join(
      li.select($"l_orderkey".as("x_ok"), $"l_suppkey".as("x_sk")),
      $"l_orderkey" === $"x_ok" && $"l_suppkey" =!= $"x_sk", "left_semi")
    val sole = shared.join(
      late.select($"l_orderkey".as("y_ok"), $"l_suppkey".as("y_sk")),
      $"l_orderkey" === $"y_ok" && $"l_suppkey" =!= $"y_sk", "left_anti")
    sole.join(Tables.supplier(s, dir).select($"s_suppkey", $"s_name"),
        $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name").agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(20)
  }
}
