package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.Project
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
    val rp0 = r.queryExecution.analyzed
    // Self-join safety: when both sides share lineage (same DataFrame,
    // or one derived from the other), their plans carry the SAME
    // attribute expression ids, and a join node built from them
    // mis-resolves — Dataset.join deduplicates this case, so this
    // bridge must too. Re-alias every right-side column behind fresh
    // expression ids whenever any overlap exists; the Aliases sit over
    // resolved attributes, so the plan stays resolved.
    val rp =
      if (rp0.outputSet.intersect(lp.outputSet).nonEmpty)
        Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
      else rp0
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    CDataset.ofRows(l.sparkSession,
      AsOfJoin(lp, rp, attr(lp, leftKeyCol), attr(rp, rightKeyCol),
        attr(lp, leftTimeCol), attr(rp, rightTimeCol)))
  }
}
