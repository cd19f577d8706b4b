package graft
import org.apache.spark.ml.recommendation.ALS
object FitProbe {
import org.apache.spark.sql.functions._
  def main(a: Array[String]): Unit = {
    val s = graft.GraftSession.builder("local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val dir = "/root/testdata/sf0.1"
    val ratings = graft.ml.Recommender.ratings(s, dir).cache(); ratings.count()
    for (it <- Seq(2, 4, 6, 8)) {
      val t0 = System.nanoTime()
      val m = new ALS().setRank(8).setMaxIter(it).setSeed(42L).setRegParam(0.1)
        .setNumBlocks(4).setUserCol("user").setItemCol("item").setRatingCol("rating")
        .setColdStartStrategy("drop").fit(ratings)
      val fitS = (System.nanoTime() - t0) / 1e9
      val pred = m.transform(ratings)
      val rmse = new org.apache.spark.ml.evaluation.RegressionEvaluator()
        .setMetricName("rmse").setLabelCol("rating").setPredictionCol("prediction")
        .evaluate(pred)
      println(f"ALS iters=$it%2d  fit=${fitS}%5.1f s  train-rmse=$rmse%6.3f")
    }
    // sentiment LR iteration curve with held-out accuracy
    val docs = graft.Tables.documents(s, dir)
      .withColumn("pol", graft.ml.Sentiment.polarityCol($"text"))
      .withColumn("label", when($"pol" > 0, 1.0).when($"pol" < 0, 0.0))
      .withColumn("is_train", pmod($"doc_id", lit(5)) =!= 0)
      .cache()
    docs.count()
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.{HashingTF, IDF, RegexTokenizer, StopWordsRemover}
    for (it <- Seq(3, 5, 10)) {
      val tok = new RegexTokenizer().setInputCol("text").setOutputCol("raw_tokens").setPattern("\\W+")
      val sw = new StopWordsRemover().setInputCol("raw_tokens").setOutputCol("tokens")
      val tf = new HashingTF().setInputCol("tokens").setOutputCol("tf").setNumFeatures(1 << 12)
      val idf = new IDF().setInputCol("tf").setOutputCol("features")
      val lr = new LogisticRegression().setMaxIter(it).setRegParam(0.01)
        .setLabelCol("label").setFeaturesCol("features")
      val pipe = new Pipeline().setStages(Array(tok, sw, tf, idf, lr))
      val t0 = System.nanoTime()
      val m = pipe.fit(docs.filter($"label".isNotNull && $"is_train"))
      val fitS = (System.nanoTime() - t0) / 1e9
      val test = docs.filter($"label".isNotNull && !$"is_train")
      val sc = m.transform(test)
      val acc = sc.filter($"prediction" === $"label").count().toDouble / sc.count()
      println(f"LR iters=$it%2d  fit=${fitS}%5.1f s  held-out acc=$acc%5.3f")
    }
    s.stop()
  }
}
