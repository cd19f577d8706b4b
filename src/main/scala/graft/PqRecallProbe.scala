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

    // §8f.2: the published PCA front-end (Jégou 2011 §V; FAISS's
    // OPQ presets initialize from PCA). Train the PCA rotation on
    // the SAME residual sample the codebook trains on, and compare
    // the OPQ objective at equal code budget: identity vs PCA-only
    // vs learned-OPQ vs OPQ-from-PCA-init. If the corpus is
    // isotropic (the s8 ball-bound caveat), PCA must not move MSE —
    // a recorded negative result gates shipping an s4_pq_pca entry.
    val d = sample.head.length
    val n = sample.length
    val mu = Array.tabulate(d)(i => sample.map(_(i)).sum / n)
    val cov = Array.ofDim[Double](d, d)
    for (x <- sample; i <- 0 until d; j <- 0 until d)
      cov(i)(j) += (x(i) - mu(i)) * (x(j) - mu(j)) / n
    val (evals, evecs) = graft.ml.Pca.jacobiEigen(cov)
    val order = evals.zipWithIndex.sortBy { case (v, i) => (-v, i) }
    val rPca = order.map { case (_, i) => evecs.map(_(i)) }
    println(f"PQPCA spectrum: l1=${order.head._1}%.4g l8=${order(7)._1}%.4g " +
      f"l32=${order(31)._1}%.4g l64=${order(63)._1}%.4g " +
      f"l1/l64=${order.head._1 / order(63)._1}%.2f")
    val pcaMse = Similarity.quantizationMse(sample, rPca, Similarity.pqTrain(
      sample.map(Similarity.rotateVec(rPca, _)), Similarity.PqM,
      Similarity.PqK, Similarity.PqIters), Similarity.PqM, Similarity.PqK)
    // OPQ from PCA init: rotate the sample into PCA space first, let
    // OPQ learn on top, compose the rotations for the final MSE
    val (rOpq2, cb2) = Similarity.opqTrain(
      sample.map(Similarity.rotateVec(rPca, _)), Similarity.PqM,
      Similarity.PqK, Similarity.PqIters, Similarity.OpqIters)
    val rComposed = Array.tabulate(d, d) { (i, j) =>
      var acc = 0.0; var t = 0
      while (t < d) { acc += rOpq2(i)(t) * rPca(t)(j); t += 1 }
      acc
    }
    val pcaOpqMse = Similarity.quantizationMse(sample, rComposed, cb2,
      Similarity.PqM, Similarity.PqK)
    println(f"PQPCA dir=$dir identity=$plainMse%.6g pca=$pcaMse%.6g " +
      f"opq=$opqMse%.6g pcaopq=$pcaOpqMse%.6g " +
      f"pcaVsOpq=${1 - pcaOpqMse / opqMse}%.4f")
    spark.stop()
  }

  private def identityRot(d: Int): Array[Array[Double]] =
    Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
}
