package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Skew
import graft.sources.Sources

class SourcesSkewSpec extends GraftSpecBase {

  test("csv round-trip preserves schema and rows") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val df = Tables.nation(spark, sf)
    df.write.mode("overwrite").option("header", "true").csv(tmp)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val back = Sources.readCsv(spark, tmp, schema)
    assert(back.schema == schema)
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("partitioned parquet write prunes by partition column") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    Sources.writePartitioned(Tables.orders(spark, sf), tmp, Seq("o_orderstatus"))
    val back = Sources.readParquet(spark, tmp).filter($"o_orderstatus" === "F")
    val want = Tables.orders(spark, sf).filter($"o_orderstatus" === "F").count()
    assert(back.count() == want)
    // pruning proof: the filter landed in the scan's PartitionFilters
    val scanned = back.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scanned.contains("PartitionFilters") && scanned.contains("o_orderstatus"),
      s"partition filter not pushed: $scanned")
  }

  test("co-bucketed tables sort-merge join with no shuffle exchange") {
    import spark.implicits._
    val prevBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Sources.writeBucketed(Tables.orders(spark, sf), "orders_bkt",
        "o_custkey", 8, sortBy = Some("o_custkey"))
      Sources.writeBucketed(Tables.customer(spark, sf), "customer_bkt",
        "c_custkey", 8, sortBy = Some("c_custkey"))
      val j = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"), $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"c_name")
      assert(j.count() == Tables.orders(spark, sf).count())
      val p = j.queryExecution.executedPlan.toString
      // both sides read pre-bucketed: the join key shuffle disappears
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning"), p)
      assert(p.contains("Bucketed: true"), p)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }

  test("salted join equals plain join") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf)
    val cust = Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(cust, Seq("o_custkey"))
      .select($"o_orderkey", $"c_name").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(orders, cust, "o_custkey", $"o_orderkey")
      .select($"o_orderkey", $"c_name").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("two-phase salted aggregate equals direct aggregate") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sum_l_quantity"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        math.round(r.getDouble(2) * 100))).toSet
    val twoPhase = Skew.twoPhaseAgg(li, Seq("l_returnflag"), Seq("l_quantity"),
        $"l_orderkey")
      .collect().map(r => (r.getString(0), r.getLong(1),
        math.round(r.getDouble(2) * 100))).toSet
    assert(twoPhase == direct)
  }
}
