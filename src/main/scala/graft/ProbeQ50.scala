package graft

import org.apache.spark.sql.functions._

/** Pair-generation formulation shoot-out on the 20× fact corpus — the
  * measurement behind the market-basket family's self-join (SURVEY
  * §6.11 inversion note): nested-lambda expansion vs two-step explode
  * vs distinct-frame self-join, identical outputs, 5× spread. Kept as
  * a rerunnable probe, like T5Probe. */
object ProbeQ50 {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/graft-scale-x20"
    val spark = GraftSession.builder(s"local[${GraftSession.defaultCpus}]")
      .config("spark.sql.shuffle.partitions", GraftSession.defaultCpus.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"== $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.1f s  ($n)")
    }
    val li = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_partkey")
    t("scan only") { li.write.format("noop").mode("overwrite").save(); 0L }
    t("distinct pp (hash agg)") { li.distinct().count() }
    val baskets = li.groupBy($"l_orderkey")
      .agg(array_sort(array_distinct(collect_list($"l_partkey"))).as("ps"))
    t("baskets collect_list") { baskets.count() }
    val pp = li.distinct()
    t("self-join pairs") {
      pp.as("a").join(pp.as("b"),
          $"a.l_orderkey" === $"b.l_orderkey" && $"a.l_partkey" < $"b.l_partkey")
        .groupBy($"a.l_partkey", $"b.l_partkey").count().filter($"count" >= 3)
        .count()
    }
    t("basket pairs (expansion)") {
      baskets.select(explode(flatten(transform($"ps", (x, i) =>
          transform(slice($"ps", i + 2, size($"ps")),
            y => struct(x.as("pa"), y.as("pb")))))).as("pr"))
        .groupBy($"pr.pa", $"pr.pb").count().filter($"count" >= 3)
        .count()
    }
    t("basket pairs (two-step explode)") {
      baskets.select($"ps", posexplode($"ps").as(Seq("i", "pa")))
        .select($"pa", explode(slice($"ps", $"i" + 2, size($"ps"))).as("pb"))
        .groupBy($"pa", $"pb").count().filter($"count" >= 3)
        .count()
    }
    spark.stop()
  }
}
