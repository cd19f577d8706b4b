package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends GraftSpecBase {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      // near-dup detectors may legitimately find nothing at tiny scale
      val mayBeEmpty = Set("d2_ngram_jaccard", "d3_minhash_lsh", "d4_simhash",
        "d5_embedding_dedup")
      assert(n > 0 || mayBeEmpty(name), s"$name returned 0 rows")
    }
  }

  test("every oracle key has a matching query key") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql keys without queries: $missing")
  }

  test("q1 aggregates match a hand computation") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val got = operators.Relational.q1PricingSummary(spark, sf)
      .agg(sum($"n_rows")).as[Long].head()
    assert(got == li.count())
  }

  test("q3 revenue is positive and sorted desc") {
    import spark.implicits._
    val rev = operators.Relational.q3TopRevenue(spark, sf)
      .select($"revenue").as[Double].collect()
    assert(rev.nonEmpty && rev.forall(_ > 0))
    assert(rev.sameElements(rev.sorted(Ordering[Double].reverse)))
  }

  test("q9 anti join is disjoint from q8 semi join keys at same threshold") {
    import spark.implicits._
    val semi = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf).filter($"o_totalprice" > 450000.0)
        .select($"o_custkey"), $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey").as[Long].collect().toSet
    val anti = operators.Relational.q9AntiJoin(spark, sf)
      .select($"c_custkey").as[Long].collect().toSet
    assert(semi.intersect(anti).isEmpty)
    assert(semi.size + anti.size == Tables.customer(spark, sf).count())
  }

  test("sessionize: session bounds respect the 30-minute gap") {
    import spark.implicits._
    val sess = operators.Sessionize.q14Sessionize(spark, sf)
    // within a user, consecutive sessions must be separated by > gap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"session_id")
    val bad = sess
      .withColumn("prev_end", lag($"end_ms", 1).over(w))
      .filter($"prev_end".isNotNull &&
        $"start_ms" - $"prev_end" <= operators.Sessionize.SessionGapMs)
    assert(bad.count() == 0)
  }

  test("q34 upsert: delta overrides base, inserts new keys, untouched rows pass through") {
    import spark.implicits._
    val merged = operators.Relational.q34Upsert(spark, sf)
    val orders = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderstatus")
    // exactly the union of base and delta keys, once each
    val baseKeys = orders.filter($"o_orderkey" % 7 =!= 0)
      .select($"o_orderkey").as[Long].collect().toSet
    val deltaKeys = orders.filter($"o_orderkey" % 5 === 0)
      .select($"o_orderkey").as[Long].collect().toSet
    val keys = merged.select($"o_orderkey").as[Long].collect().toSeq
    assert(keys.toSet == (baseKeys ++ deltaKeys) && keys.size == keys.toSet.size)
    // delta keys carry the repriced value and the 'U' flag; others are
    // byte-identical to the base snapshot
    val orig = orders.as[(Long, Long, Double, String)].collect()
      .map(r => r._1 -> r).toMap
    merged.as[(Long, Long, Double, String)].collect().foreach {
      case (k, c, p, st) =>
        val (_, oc, op, ost) = orig(k)
        if (deltaKeys(k)) assert(st == "U" && p == op + 1000.0 && c == oc)
        else assert(st == ost && p == op && c == oc, s"base row $k changed")
    }
  }
}
