package graft

import org.apache.spark.sql.functions._

/** Structural invariants for the analytic-SQL surface (q36–q42); the
  * DuckDB hash compare is the value-level gate. */
class AnalyticsSpec extends GraftSpecBase {
  import spark.implicits._
  import graft.operators.Analytics

  test("q36: grand total row aggregates every order; grouping flags label levels") {
    val rows = Analytics.q36GroupingSets(spark, sf).cache()
    val total = Tables.orders(spark, sf).count()
    val grand = rows.filter($"g_status" === 1 && $"g_priority" === 1).collect()
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_orders") == total)
    // per-status subtotals sum to the grand total
    val subSum = rows.filter($"g_status" === 0 && $"g_priority" === 1)
      .agg(sum($"n_orders")).as[Long].head()
    assert(subSum == total)
    // detail rows carry real (non-null) keys
    assert(rows.filter($"g_priority" === 0 && $"o_orderpriority".isNull).count() == 0)
    rows.unpersist()
  }

  test("q38: quartiles in 1..4, distributions in [0,1], cume reaches 1 per segment") {
    val rows = Analytics.q38WindowSuite(spark, sf).cache()
    assert(rows.filter($"quartile" < 1 || $"quartile" > 4).count() == 0)
    assert(rows.filter($"pct_rank" < 0.0 || $"pct_rank" > 1.0).count() == 0)
    val maxCume = rows.groupBy($"c_mktsegment").agg(max($"cume").as("m"))
    assert(maxCume.filter($"m" =!= 1.0).count() == 0)
    rows.unpersist()
  }

  test("q39: trailing-30d window always contains the row's own order") {
    val rows = graft.operators.Analytics.q39RangeFrame(spark, sf)
      .join(Tables.orders(spark, sf), Seq("o_orderkey"))
    assert(rows.filter($"trailing_30d" < $"o_totalprice" - 0.01).count() == 0)
  }

  test("q40: extracted priority fields partition all orders") {
    val rows = Analytics.q40RegexpExtract(spark, sf).cache()
    assert(rows.agg(sum($"n_orders")).as[Long].head() == Tables.orders(spark, sf).count())
    assert(rows.filter($"prio_level".isNull || $"prio_word" === "").count() == 0)
    rows.unpersist()
  }

  test("q37: moment statistics agree with their first-principles forms") {
    val rows = Analytics.q37StatsSuite(spark, sf).cache()
    // every flag present, counts partition the table
    assert(rows.agg(sum($"n_rows")).as[Long].head() == Tables.lineitem(spark, sf).count())
    // corr bounded; variance and stddev non-negative
    assert(rows.filter($"corr_qty_price" < -1.0 || $"corr_qty_price" > 1.0).count() == 0)
    assert(rows.filter($"var_qty" < 0.0 || $"sd_price" < 0.0).count() == 0)
    // spot-check one group against the naive two-pass formula
    import org.apache.spark.sql.Row
    val li = Tables.lineitem(spark, sf).filter($"l_returnflag" === "N")
      .select($"l_quantity").as[Double].collect()
    val mean = li.sum / li.length
    val varNaive = li.map(q => (q - mean) * (q - mean)).sum / (li.length - 1)
    val varSpark = rows.filter($"l_returnflag" === "N").select($"var_qty").as[Double].head()
    assert(math.abs(varNaive - varSpark) < 1e-3, s"$varNaive vs $varSpark")
    rows.unpersist()
  }

  test("q41: ship lag is positive-mean and slow ratio is a proper fraction") {
    val rows = Analytics.q41ShipDelay(spark, sf).cache()
    assert(rows.agg(sum($"n_items")).as[Long].head() == Tables.lineitem(spark, sf).count())
    assert(rows.filter($"slow_ratio" < 0.0 || $"slow_ratio" > 1.0).count() == 0)
    assert(rows.filter($"o_month" < 1 || $"o_month" > 12).count() == 0)
    rows.unpersist()
  }

  test("q42: every cohort starts at offset 0 and offsets are non-negative") {
    val rows = Analytics.q42CohortRetention(spark, sf).cache()
    assert(rows.filter($"wk_offset" < 0).count() == 0)
    val cohorts = rows.select($"cohort_wk").distinct().count()
    val starts = rows.filter($"wk_offset" === 0).count()
    assert(starts == cohorts)
    rows.unpersist()
  }
}
