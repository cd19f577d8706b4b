package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Pinpoints which subexpression of t5's scan carries its cost:
  * cumulative variants from bare tokenize to the full query, each
  * noop-written twice (min reported). */
object T5Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def docs = Tables.documents(spark, dir)
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"T5PROBE $name%-12s min=${ts.min}%6.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("scan")(docs.select($"doc_id", length($"text").as("n")))
    time("tokens")(docs.select($"doc_id", size(tokens($"text")).as("n")))
    time("distinct")(docs.withColumn("w", tokens($"text"))
      .select($"doc_id", size(array_distinct($"w")).as("n")))
    time("ngrams")(docs.withColumn("w", tokens($"text"))
      .select($"doc_id", size(ngramsFromTokens($"w", 2)).as("n")))
    time("sort")(docs.withColumn("w", tokens($"text"))
      .select($"doc_id", size(array_sort(ngramsFromTokens($"w", 2))).as("n")))
    time("mrl")(docs.withColumn("w", tokens($"text"))
      .select($"doc_id",
        call_function("max_run_length", array_sort(ngramsFromTokens($"w", 2))).as("n")))
    time("full_t5")(operators.TextAnalysis.t5Repetition(spark, dir))
    spark.stop()
  }
}
