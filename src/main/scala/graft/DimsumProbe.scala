package graft

import org.apache.spark.sql.functions._

/** m11 γ/recall/volume curve probe (SURVEY §6.13 table):
  * `runMain graft.DimsumProbe [sfDir]`. For each budget: solved γ,
  * achieved post-sampling contribution count, recall@5 vs exact m10,
  * serve wall time. */
object DimsumProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(s"local[${GraftSession.defaultCpus}]")
      .config("spark.sql.shuffle.partitions", GraftSession.defaultCpus.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val total = ml.Recommender.m11Contribs(spark, dir).count()
    val exactTop = ml.Recommender.m10ItemCosine(spark, dir)
      .select($"item", $"nbr").as[(Long, Long)].collect().toSet
    println(s"== total contributions: $total; exact top-5 edges: ${exactTop.size}")
    def achieved(gamma: Double): Long = {
      val p = least(lit(1.0), lit(gamma) / $"nn")
      val coin = pmod(xxhash64(lit(42), $"user", $"ia", $"ib"),
        lit(1000000007L)).cast("double") / 1000000007.0
      ml.Recommender.m11Contribs(spark, dir).filter(coin < p).count()
    }
    val gDef = ml.Recommender.m11DefaultGamma(spark, dir)
    val cases = Seq("b=total/64" -> total / 64, "b=total/16" -> total / 16,
      "b=total/4" -> total / 4).map { case (n, b) =>
      (n, ml.Recommender.m11GammaForBudget(spark, dir, b))
    } :+ ("default 2*mean(n2)" -> gDef)
    cases.foreach { case (name, g) =>
      val t0 = System.nanoTime()
      val approx = ml.Recommender.m11Dimsum(spark, dir, g)
        .select($"item", $"nbr").as[(Long, Long)].collect().toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val got = achieved(g)
      val rec = (exactTop & approx).size.toDouble / exactTop.size
      println(f"== $name%-22s gamma=$g%12.1f contribs=$got%9d (${got * 100.0 / total}%5.1f%%) recall@5=$rec%.3f  $sec%6.1f s")
    }
    spark.stop()
  }
}
