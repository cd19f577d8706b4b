package graft

/** Scratch probe for s15's (beam, hops) recall surface vs s1 exact —
  * `runMain graft.S15Probe [dir]`. */
object S15Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builder("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val exact = operators.Similarity.s1KnnBrute(spark, dir, 5)
      .select($"q_id", $"neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    for (beam <- Seq(8, 16, 32); hops <- Seq(4, 6, 8)) {
      val got = operators.Similarity.s15GraphAnn(spark, dir, beam, hops)
        .select($"q_id", $"neighbor_id")
        .as[(Long, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val hit = exact.toSeq.map { case (q, w) => (w & got.getOrElse(q, Set())).size }.sum
      println(f"== beam=$beam%2d hops=$hops%d recall@3 = ${hit / 15.0}%.3f")
    }
    spark.stop()
  }
}
