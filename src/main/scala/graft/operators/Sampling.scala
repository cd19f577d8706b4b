package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-mix sampling: rebalance a corpus by stratum before
  * training (the "data mixing" step of an LLM pipeline).
  */
object Sampling {

  val Seed = 42L
  /** Downweight the dominant language, keep the rest. */
  val DownweightLang = "en"
  val DownweightFraction = 0.5

  /** P2: seeded stratified sample by language — `sampleBy` pushes the
    * per-stratum Bernoulli filter into the scan (no shuffle at all);
    * the strata list is a bounded artifact (distinct langs), not data.
    * Sampling RNG is engine-specific → rows-only + determinism/
    * proportion specs instead of a SQL oracle. */
  def p2SampleMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val langs = docs.select($"lang").distinct().as[String].collect()
    val fractions = langs.map(l =>
      l -> (if (l == DownweightLang) DownweightFraction else 1.0)).toMap
    docs.stat.sampleBy("lang", fractions, Seed)
      .select($"doc_id", $"lang")
      .orderBy($"doc_id")
  }
}
