package graft

import org.apache.spark.sql.functions._

/** Measures the ANN serving trade-off the specs only pin pointwise:
  * recall@3 and wall time as a function of probe count, for the
  * IVF-Flat path (s2) and the IVF-PQ + exact-refine path (s4).
  * The exact baseline is a brute-force cosine top-3 for the same
  * query set (broadcast query block — the s7 shape), so the curve
  * isolates candidate-selection loss. Run:
  *   sbt "runMain graft.AnnProbe [sfDir] [nQueries]"
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQ = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val spark = GraftSession.builder(s"local[${GraftSession.defaultCpus}]")
      .config("spark.sql.shuffle.partitions", GraftSession.defaultCpus.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import operators.Similarity

    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v")).cache()
    emb.count()

    def bruteTop3(n: Int): Set[(Long, Long)] = {
      val q = emb.filter($"vec_id" < n)
        .select($"vec_id".as("q_id"), $"v".as("qv"))
      val scored = emb.join(broadcast(q), $"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id".as("neighbor_id"),
          (floor(call_function("array_dot", $"qv", $"v") /
            (sqrt(call_function("array_dot", $"qv", $"qv")) *
             sqrt(call_function("array_dot", $"v", $"v"))) * 10000) / 10000.0)
            .as("cos"))
      scored.withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy($"q_id")
            .orderBy($"cos".desc, $"neighbor_id")))
        .filter($"rnk" <= 3)
        .select($"q_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    }

    // ---- s2 IVF-Flat (its entry surface is the 5-query block) ----
    val exact5 = bruteTop3(5)
    println(s"== s2 IVF-Flat (5 queries, recall@3 vs brute force, ${Similarity.IvfClusters} clusters)")
    for (p <- Seq(1, 2, 4, 8, Similarity.IvfClusters)) {
      val t0 = System.nanoTime()
      val got = Similarity.s2AnnIvf(spark, dir, p)
        .select($"q_id", $"neighbor_id").as[(Long, Long)].collect().toSet
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"==   probes=$p%2d  recall=${(got & exact5).size.toDouble / exact5.size}%.3f  ${sec}%6.2f s")
    }

    // ---- s4 IVF-PQ + exact refine (nQueries sweep-able) ----
    val exactN = bruteTop3(nQ)
    println(s"== s4 IVF-PQ+refine ($nQ queries, recall@3 vs brute force, kCand=${Similarity.PqCandidates})")
    for (p <- Seq(1, 2, 4, 8, Similarity.IvfClusters)) {
      val t0 = System.nanoTime()
      val got = Similarity.s4PqAnn(spark, dir, p, Similarity.PqCandidates, nQ)
        .select($"q_id", $"neighbor_id").as[(Long, Long)].collect().toSet
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"==   probes=$p%2d  recall=${(got & exactN).size.toDouble / exactN.size}%.3f  ${sec}%6.2f s")
    }
    spark.stop()
  }
}
