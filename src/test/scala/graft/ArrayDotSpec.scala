package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

class ArrayDotSpec extends GraftSpecBase {

  test("array_dot equals the composed fold bitwise") {
    import spark.implicits._
    val df = Tables.embeddings(spark, sf)
      .select(VectorFunctions.toDoubles($"embedding").as("v"))
      .limit(100)
      .select(VectorFunctions.dot($"v", $"v").as("fast"),
        VectorFunctions.dotComposed($"v", $"v").as("ref"))
    assert(df.filter($"fast" =!= $"ref").count() == 0)
  }

  test("array_dot null semantics match the composition") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0), Seq(3.0, 4.0)),          // equal length → 11.0
      (Seq(1.0, 2.0, 5.0), Seq(3.0, 4.0))).toDF("a", "b") // mismatch → null
    val out = df.select(
      VectorFunctions.dot($"a", $"b").as("fast"),
      VectorFunctions.dotComposed($"a", $"b").as("ref")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    assert(out(0).getDouble(0) == 11.0 && out(1).isNullAt(0))
  }

  test("FuseArrayDot rewrites the composed pattern into ArrayDot") {
    import spark.implicits._
    // non-foldable input, or constant folding wins before the rule runs
    val df = spark.range(1, 3)
      .select(array($"id".cast("double"), ($"id" * 2).cast("double")).as("a"),
        array(lit(3.0), lit(4.0)).as("b"))
      .select(VectorFunctions.dotComposed($"a", $"b").as("d"))
    val optimized = df.queryExecution.optimizedPlan
    val fused = optimized.expressions.exists(_.exists(_.isInstanceOf[graft.functions.ArrayDot]))
    assert(fused, s"no ArrayDot in optimized plan:\n$optimized")
    assert(df.as[Double].collect().toSeq == Seq(11.0, 22.0)) // 1*3+2*4, 2*3+4*4
  }
}
