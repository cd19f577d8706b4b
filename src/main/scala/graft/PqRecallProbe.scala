package graft

/** Measures (a) s4's full-probe recall@3 vs brute force over 100
  * queries at several ADC candidate depths — candidate selection is
  * the only loss under full probes, so this isolates PQ quality — and
  * (b) the sample quantization MSE of the plain residual-PQ codebook
  * vs the OPQ-rotated one, the objective OPQ actually minimizes.
  * Run per encoding change; numbers land in SURVEY §6. */
object PqRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import operators.Similarity
    val nQ = 100
    val exact = Similarity.s1KnnBrute(spark, dir, nQ)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (depth <- Seq(4, 8, 16, 32)) {
      val pq = Similarity.s4PqAnn(spark, dir, Similarity.IvfClusters, depth, nQ)
        .select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = pq.intersect(exact).size.toDouble / exact.size
      println(f"PQRECALL dir=$dir depth=$depth recall@3=$recall%.4f nQ=$nQ")
    }
    // MSE of the OPQ objective vs the unrotated codebook on the
    // training sample itself (both deterministic)
    val sample = Similarity.pqTrainingSample(spark, dir)
    val plainCb = Similarity.pqTrain(sample, Similarity.PqM, Similarity.PqK, Similarity.PqIters)
    val (rot, opqCb) = Similarity.opqTrain(sample, Similarity.PqM, Similarity.PqK,
      Similarity.PqIters, Similarity.OpqIters)
    val plainMse = Similarity.quantizationMse(sample,
      identityRot(sample.head.length), plainCb, Similarity.PqM, Similarity.PqK)
    val opqMse = Similarity.quantizationMse(sample, rot, opqCb,
      Similarity.PqM, Similarity.PqK)
    println(f"PQMSE dir=$dir plain=$plainMse%.6g opq=$opqMse%.6g improvement=${1 - opqMse / plainMse}%.4f")
    spark.stop()
  }

  private def identityRot(d: Int): Array[Array[Double]] =
    Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
}
