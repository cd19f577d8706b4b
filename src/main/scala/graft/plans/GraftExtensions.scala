package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{ArrayDot, DotTopK, GramAgg, HilbertIndex, JlProject, MaxRunLength, MinHashAgg, MisraGriesAgg, PqAdcTopK, PqEncode, SimHashAgg, SortedDot, SortedIntersectSize, TopKAgg}

/** Session extensions: registers graft's native Catalyst expressions
  * so they resolve in both the Column DSL (`call_function`) and SQL.
  * Wired by `GraftSession.builder` via `withExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Spark ships BloomFilterAggregate/BloomFilterMightContain for its
    // own runtime row-level filtering but does NOT register them in the
    // FunctionRegistry — expose them so d9's explicit scan-side bloom
    // prefilter can be written declaratively (same binary format as
    // the optimizer's injected filters).
    ext.injectFunction((
      FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1), children(2)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArrayDot(children(0), children(1))))
    // jl_project(arr, inDim, outDim): seeded ±1 projection as ONE
    // loop-codegen expression (the s14 64 KB-fallback fix); dims must
    // be int literals — the md5 sign matrix is built at plan time, so
    // the builder validates arity/foldability/type up front rather
    // than letting eval() throw an opaque ClassCastException.
    ext.injectFunction((
      FunctionIdentifier("jl_project"),
      new ExpressionInfo(classOf[JlProject].getName, "jl_project"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.AnalysisException
        import org.apache.spark.sql.types.IntegerType
        def fail(msg: String): Nothing = throw new AnalysisException(
          "_LEGACY_ERROR_TEMP_2273", Map("message" -> msg))
        if (children.length != 3)
          fail(s"jl_project(arr, inDim, outDim) takes 3 arguments, got ${children.length}")
        def dim(i: Int, name: String): Int = {
          val c = children(i)
          if (!c.foldable || c.dataType != IntegerType)
            fail(s"jl_project: $name must be an INT literal (the sign matrix " +
              s"is built at plan time), got ${c.sql}: ${c.dataType.sql}")
          c.eval().asInstanceOf[Int]
        }
        JlProject(children(0), JlProject.signs(dim(1, "inDim"), dim(2, "outDim")))
      }))
    // hilbert_xy2d(x, y, bits): 2-D Hilbert-curve index as one
    // loop-codegen expression (z4's layout key); bits must be an int
    // literal — it sizes the generated loop at plan time, so the
    // builder validates up front (the jl_project discipline).
    ext.injectFunction((
      FunctionIdentifier("hilbert_xy2d"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "hilbert_xy2d"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.AnalysisException
        import org.apache.spark.sql.types.IntegerType
        def fail(msg: String): Nothing = throw new AnalysisException(
          "_LEGACY_ERROR_TEMP_2273", Map("message" -> msg))
        if (children.length != 3)
          fail(s"hilbert_xy2d(x, y, bits) takes 3 arguments, got ${children.length}")
        val b = children(2)
        if (!b.foldable || b.dataType != IntegerType)
          fail("hilbert_xy2d: bits must be an INT literal (it sizes the " +
            s"generated loop at plan time), got ${b.sql}: ${b.dataType.sql}")
        val bits = b.eval().asInstanceOf[Int]
        if (bits < 1 || bits > 31)
          fail(s"hilbert_xy2d: bits must be in [1, 31], got $bits")
        HilbertIndex(children(0), children(1), bits)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash_agg"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_agg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHashAgg(children.head).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("topk_agg"),
      new ExpressionInfo(classOf[TopKAgg].getName, "topk_agg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TopKAgg(children(0), children(1), children(2)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("misra_gries_agg"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "misra_gries_agg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MisraGriesAgg(children(0), children(1)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("minhash_agg"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_agg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashAgg(children.head).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedIntersectSize(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("sorted_dot"),
      new ExpressionInfo(classOf[SortedDot].getName, "sorted_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedDot(children(0), children(1), children(2), children(3))))
    ext.injectFunction((
      FunctionIdentifier("dot_topk"),
      new ExpressionInfo(classOf[DotTopK].getName, "dot_topk"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotTopK(children(0), children(1), children(2),
          children(3).eval(null).asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PqEncode(children(0), children(1),
          children(2).eval(null).asInstanceOf[Number].intValue(),
          children(3).eval(null).asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("pq_adc_topk"),
      new ExpressionInfo(classOf[PqAdcTopK].getName, "pq_adc_topk"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PqAdcTopK(children(0), children(1), children(2), children(3),
          children(4).eval(null).asInstanceOf[Number].intValue(),
          children(5).eval(null).asInstanceOf[Number].intValue(),
          children(6).eval(null).asInstanceOf[Number].intValue())))
    // gram_agg(qv, d): upper-triangular Σ q·qᵀ in one buffer; d must
    // be an INT literal — it sizes the aggregation buffer at plan
    // time (the jl_project discipline)
    ext.injectFunction((
      FunctionIdentifier("gram_agg"),
      new ExpressionInfo(classOf[GramAgg].getName, "gram_agg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.AnalysisException
        import org.apache.spark.sql.types.IntegerType
        def fail(msg: String): Nothing = throw new AnalysisException(
          "_LEGACY_ERROR_TEMP_2273", Map("message" -> msg))
        if (children.length != 2)
          fail(s"gram_agg(qv, d) takes 2 arguments, got ${children.length}")
        val dExpr = children(1)
        if (!dExpr.foldable || dExpr.dataType != IntegerType)
          fail("gram_agg: d must be an INT literal (it sizes the " +
            s"aggregation buffer at plan time), got ${dExpr.sql}: ${dExpr.dataType.sql}")
        val d = dExpr.eval().asInstanceOf[Int]
        if (d < 1 || d > 4096)
          fail(s"gram_agg: d must be in [1, 4096], got $d")
        GramAgg(children(0), d).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("max_run_length"),
      new ExpressionInfo(classOf[MaxRunLength].getName, "max_run_length"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MaxRunLength(children.head)))
    ext.injectOptimizerRule(_ => FuseArrayDot)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
