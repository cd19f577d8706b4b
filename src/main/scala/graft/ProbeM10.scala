package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** m10 rank-stage formulation shoot-out (sf0.1) — the measurement
  * behind replacing the row_number window with partial `topk_agg`
  * (SURVEY §6.12): same scored-pair prefix, window vs topk_agg timed
  * alternately under host-steal noise, min-of-3 arbitrates. Kept as
  * the probe harness for future rank-stage changes. */
object ProbeM10 {
  def scored(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val r = graft.ml.Recommender.intRatings(s, dir)
    val pairs = r.as("a").join(r.as("b"),
        $"a.user" === $"b.user" && $"a.item" < $"b.item")
      .groupBy($"a.item".as("ia"), $"b.item".as("ib"))
      .agg(sum($"a.q" * $"b.q").as("dot"))
    val n2 = r.groupBy($"item").agg(sum($"q" * $"q").as("n2"))
    val both = pairs.select(explode(array(
        struct($"ia".as("item"), $"ib".as("nbr"), $"dot"),
        struct($"ib".as("item"), $"ia".as("nbr"), $"dot"))).as("e"))
      .select($"e.item", $"e.nbr", $"e.dot")
    both
      .join(broadcast(n2.select($"item", $"n2".as("n2i"))), "item")
      .join(broadcast(n2.select($"item".as("nk"), $"n2".as("n2n"))),
        $"nbr" === $"nk")
      .select($"item", $"nbr",
        (floor($"dot" / (sqrt($"n2i".cast("double")) *
          sqrt($"n2n".cast("double"))) * 10000) / 10000.0).as("cosine"))
  }

  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.builder(s"local[${GraftSession.defaultCpus}]")
      .config("spark.sql.shuffle.partitions", GraftSession.defaultCpus.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](n: String)(f: => T): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[m10probe] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val sc = scored(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"item").orderBy($"cosine".desc, $"nbr")
    def windowed = sc.withColumn("rnk", row_number().over(w).cast("int"))
      .filter($"rnk" <= 5).orderBy($"item", $"rnk")
    def topked = sc.groupBy($"item")
      .agg(expr("topk_agg(cosine, nbr, 5)").as("top"))
      .select($"item", posexplode($"top").as(Seq("pos", "e")))
      .select($"item", $"e.id".as("nbr"), $"e.score".as("cosine"),
        ($"pos" + 1).cast("int").as("rnk"))
      .orderBy($"item", $"rnk")
    time("scored only (shared prefix)")(noop(sc))
    for (i <- 1 to 3) {
      time(s"window   $i")(noop(windowed))
      time(s"topk_agg $i")(noop(topked))
    }
    spark.stop()
  }
}
