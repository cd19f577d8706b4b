package graft

import org.apache.spark.sql.functions._

/** Structural invariants for the round-5 additions (q50–q52, t12, p8,
  * i5); the DuckDB hash compare is the value-level gate for all six. */
class Round5OpsSpec extends GraftSpecBase {
  import spark.implicits._
  import graft.operators.{Analytics, Dedup, Ingest, TextAnalysis}

  test("q50: confidence ≤ 1, lift > 0, and every rule's support respects the floor") {
    val rules = Analytics.q50AssocRules(spark, sf).cache()
    assert(rules.filter($"confidence" > 1.0 || $"confidence" <= 0.0).count() == 0)
    assert(rules.filter($"lift" <= 0.0).count() == 0)
    assert(rules.filter($"n_ab" < 3).count() == 0)
    // confidence is direction-specific: recompute one rule by hand
    val r = rules.orderBy($"ante", $"cons").head()
    val pp = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").distinct().cache()
    val nAnte = pp.filter($"l_partkey" === r.getAs[Long]("ante")).count()
    val expected = math.floor(r.getAs[Long]("n_ab").toDouble / nAnte * 10000) / 10000.0
    assert(r.getAs[Double]("confidence") == expected)
    pp.unpersist(); rules.unpersist()
  }

  test("q51: cum_users is the prefix sum of new_users and ends at the distinct-user total") {
    val g = Analytics.q51UserGrowth(spark, sf).collect()
    val prefix = g.map(_.getAs[Long]("new_users")).scanLeft(0L)(_ + _).drop(1)
    assert(g.map(_.getAs[Long]("cum_users")).sameElements(prefix))
    val total = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(g.last.getAs[Long]("cum_users") == total)
  }

  test("q52: every flagged day is ≥ 2 sample-stddevs above that user's own mean") {
    val flagged = Analytics.q52OutlierDays(spark, sf).cache()
    assert(flagged.filter($"z" < 2.0).count() == 0)
    // recompute one user's moments from the raw events
    flagged.limit(1).collect().foreach { r =>
      val uid = r.getAs[Long]("user_id")
      val daily = Tables.eventsWithMs(spark, sf)
        .filter($"user_id" === uid)
        .select(expr("ms div 86400000L").as("day"))
        .groupBy($"day").agg(count(lit(1)).as("n"))
        .select($"n".cast("double")).as[Double].collect()
      val mu = daily.sum / daily.length
      val sd = math.sqrt(daily.map(x => (x - mu) * (x - mu)).sum / (daily.length - 1))
      val z = math.floor((r.getAs[Long]("n") - mu) / sd * 10000) / 10000.0
      assert(z == r.getAs[Double]("z"))
    }
    flagged.unpersist()
  }

  test("t12: bigram counts per doc equal n_tokens - 1 and surprisal is positive") {
    val out = TextAnalysis.t12BigramSurprisal(spark, sf)
      .join(Tables.documents(spark, sf)
        .select($"doc_id", size(split($"text", " ")).as("n_tokens")), "doc_id")
      .cache()
    assert(out.filter($"n_bigrams" =!= $"n_tokens" - 1).count() == 0)
    assert(out.filter($"bi_surprisal" <= 0.0).count() == 0)
    // the bigram LM conditions on context: a doc of globally-common
    // bigrams must score below the corpus mean (sanity on direction)
    val mean = out.agg(avg($"bi_surprisal")).as[Double].head()
    assert(out.agg(min($"bi_surprisal")).as[Double].head() < mean)
    out.unpersist()
  }

  test("p8: one representative per d6 group, and it is the longest member (min id ties)") {
    val reps = Dedup.p8Canonicalize(spark, sf).cache()
    val labels = Dedup.d6DupGroups(spark, sf).cache()
    assert(reps.count() == labels.select($"group_id").distinct().count())
    // no member of any group is strictly longer than its representative,
    // and equal-length members never have a smaller doc_id
    val lens = Tables.documents(spark, sf)
      .select($"doc_id", length($"text").cast("long").as("len"))
    val bad = labels.join(lens, "doc_id")
      .join(reps, "group_id")
      .filter($"len" > $"rep_len" ||
        ($"len" === $"rep_len" && $"doc_id" < $"rep_doc_id"))
    assert(bad.count() == 0)
    // members sum to the labelled population
    val mSum = reps.agg(sum($"n_members")).as[Long].head()
    assert(mSum == labels.count())
    reps.unpersist(); labels.unpersist()
  }

  test("p9: phases are balanced quartiles and quality never increases across phases") {
    import graft.operators.Sampling
    val cur = Sampling.p9Curriculum(spark, sf).cache()
    val n = cur.count()
    val sizes = cur.groupBy($"phase").count().collect()
      .map(r => r.getAs[Long]("phase") -> r.getAs[Long]("count")).toMap
    assert(sizes.keySet == Set(1L, 2L, 3L, 4L))
    assert(sizes.values.max - sizes.values.min <= 1 && sizes.values.sum == n)
    // phase boundaries respect the quality order: min quality of phase
    // k is >= max quality of phase k+1
    val bounds = cur.groupBy($"phase")
      .agg(min($"quality").as("lo"), max($"quality").as("hi"))
      .collect().map(r => r.getAs[Long]("phase") ->
        (r.getAs[Double]("lo"), r.getAs[Double]("hi"))).toMap
    for (k <- 1L to 3L) assert(bounds(k)._1 >= bounds(k + 1)._2)
    cur.unpersist()
  }

  test("q53: pagerank mass is conserved under damping and the floor holds") {
    import graft.operators.Graph
    val pr = Graph.q53Pagerank(spark, sf).cache()
    assert(pr.count() > 0)
    // every node keeps the damping floor 0.15 (integer floor can only
    // lose micro-units below the ideal, never go under 150000)
    assert(pr.filter($"pr_rank" < 150000L).count() == 0)
    // total mass ≤ N·Scale: the symmetric graph redistributes rank,
    // integer floors only ever shave it (top-50 is a subset, so bound
    // the max instead of the sum)
    assert(pr.agg(max($"pr_rank")).as[Long].head() <= 50L * Graph.Scale)
    // centrality signal: the top-ranked part has at least median degree
    val top = pr.orderBy($"pr_rank".desc, $"l_partkey").head().getAs[Long]("l_partkey")
    val baskets = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").distinct()
    val coDeg = baskets.as("a").join(baskets.as("b"),
        $"a.l_orderkey" === $"b.l_orderkey" && $"a.l_partkey" =!= $"b.l_partkey")
      .groupBy($"a.l_partkey").count()
    val topDeg = coDeg.filter($"l_partkey" === top).as[(Long, Long)].head()._2
    val medDeg = coDeg.stat.approxQuantile("count", Array(0.5), 0.0).head
    assert(topDeg >= medDeg, s"top node degree $topDeg below median $medDeg")
    pr.unpersist()
  }

  test("q54: triangle count matches a local brute force; clustering in [0,1]") {
    import graft.operators.{Analytics, Graph}
    val row = Graph.q54Triangles(spark, sf).head()
    val edges = Analytics.copurchasePairs(spark, sf)
      .filter($"n_orders" >= 2).select($"pa", $"pb")
      .as[(Long, Long)].collect().toSet
    val nbrs = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val triLocal = edges.toSeq.map { case (a, b) =>
      (nbrs(a) & nbrs(b)).count(c => c > b) // a<b<c counted once
    }.sum
    assert(row.getAs[Long]("n_triangles") == triLocal)
    assert(row.getAs[Long]("n_edges") == edges.size)
    val cl = row.getAs[Double]("clustering")
    assert(cl >= 0.0 && cl <= 1.0)
  }

  test("i5: XML round-trip preserves every nation row and the declared schema") {
    val back = Ingest.i5XmlIngest(spark, sf)
    assert(back.schema == Ingest.NationCsvSchema)
    val orig = Tables.nation(spark, sf)
      .select($"n_nationkey", $"n_name", $"n_regionkey")
    assert(back.exceptAll(orig).count() == 0 && orig.exceptAll(back).count() == 0)
  }

  test("q55: decomposition reassembles revenue and weekday residuals center on zero") {
    val d = Analytics.q55Seasonal(spark, sf).cache()
    // trend + seasonal + residual recovers revenue up to 3 floor-quantizations
    val offBudget = d.filter(
      abs($"revenue" - ($"trend" + $"seasonal" + $"residual")) > 0.0004)
    assert(offBudget.count() == 0)
    // the seasonal fit absorbs the weekly cycle: per-weekday residual mean ~ 0
    val worst = d.groupBy(pmod($"day", lit(7)).as("dow"))
      .agg(abs(avg($"residual")).as("m"))
      .agg(max($"m")).as[Double].first()
    assert(worst < 0.01, s"weekday residual mean $worst")
    d.unpersist()
  }

  test("q56: rows form a complete observed matrix and each source row sums to ~1") {
    val t = Analytics.q56Transitions(spark, sf).cache()
    val bad = t.filter($"p" < 0.0 || $"p" > 1.0)
    assert(bad.count() == 0)
    // per-source probabilities sum to 1 up to one floor-quantization per cell
    val sums = t.groupBy($"src").agg(sum($"p").as("sp"), count(lit(1)).as("k"))
      .filter(abs($"sp" - 1.0) > $"k" * 0.0001)
    assert(sums.count() == 0)
    // n totals equal transitions = events - distinct users (one lead loss each)
    val nTrans = t.agg(sum($"n")).as[Long].first()
    val e = Tables.events(spark, sf)
    val expect = e.count() - e.select($"user_id").distinct().count()
    assert(nTrans == expect, s"$nTrans vs $expect")
    t.unpersist()
  }
}
