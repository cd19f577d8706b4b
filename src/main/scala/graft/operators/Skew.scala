package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities.
  *
  * AQE's runtime skew-join splitting (on by default in GraftSession)
  * is the first line of defense; these are the explicit tools for
  * when the skew is known ahead of time (a hot user, a null-heavy
  * foreign key, a celebrity item):
  *
  *  - `saltedJoin` spreads one hot build-side key across S shuffle
  *    partitions by replicating the small side S× and salting the big
  *    side deterministically.
  *  - `twoPhaseAgg` splits a grouped aggregate into a salted partial
  *    pass + a final pass, so one hot group key cannot pin a single
  *    reducer.
  *
  * Both produce results identical to their naive forms (spec-checked).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salting the big side with a
    * deterministic hash of `saltSource` (any column that spreads the
    * hot key's rows, e.g. a row id) into `saltFactor` sub-keys, and
    * replicating the small side `saltFactor`×. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltSource: Column, saltFactor: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(xxhash64(saltSource), lit(saltFactor.toLong)))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Grouped sum/count with a salted partial phase: groupBy(keys ++
    * salt) first (splits hot groups across reducers), then re-aggregate
    * by keys. `sumCols` are summed, count is emitted as `n`. */
  def twoPhaseAgg(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
                  saltSource: Column, saltFactor: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(xxhash64(saltSource), lit(saltFactor.toLong)))
    val partial = salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_n"),
        sumCols.map(c => sum(col(c)).as(s"_s_$c")): _*)
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("_n")).cast("long").as("n"),
        sumCols.map(c => sum(col(s"_s_$c")).as(s"sum_$c")): _*)
  }
}
