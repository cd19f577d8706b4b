package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => CDataset}
import graft.plans.AsOfJoin

/** Public entry for the custom as-of join: builds the AsOfJoin logical
  * node from two resolved child plans. Lives under org.apache.spark.sql
  * because constructing a DataFrame from a LogicalPlan
  * (`Dataset.ofRows`) is private[sql] — the standard bridge pattern
  * for out-of-tree plan nodes.
  */
object AsOfJoinOps {

  /** left.asofJoin(right): for each left row, the right row with
    * `rightKeyCol == leftKeyCol` and the greatest `rightTimeCol <=
    * leftTimeCol` (nulls if none). Key/time columns are referenced by
    * name and must be LongType. */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKeyCol: String, rightKeyCol: String,
               leftTimeCol: String, rightTimeCol: String): DataFrame = {
    val l = left.asInstanceOf[CDataset[org.apache.spark.sql.Row]]
    val r = right.asInstanceOf[CDataset[org.apache.spark.sql.Row]]
    val lp = l.queryExecution.analyzed
    val rp = r.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    CDataset.ofRows(l.sparkSession,
      AsOfJoin(lp, rp, attr(lp, leftKeyCol), attr(rp, rightKeyCol),
        attr(lp, leftTimeCol), attr(rp, rightTimeCol)))
  }
}
