package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Rademacher (±1) random projection of a quantized BIGINT
  * vector: out[j] = Σ_i signs(j)(i) · in[i], exact integer algebra.
  *
  * This exists because the UNROLLED form — one Column per output dim,
  * each a static in-dim-term add/subtract chain — inflates the
  * Generate stage's `generate_doConsume` past janino's 64 KB method
  * limit (64×16 terms ≈ 12k generated lines), silently dropping the
  * whole stage to interpreted execution: the round-10 codegen-fallback
  * finding. The same arithmetic as a LOOP over a referenced constant
  * sign matrix is ~30 generated lines, compiles, and stays inside
  * whole-stage codegen. Accumulation order is i-ascending per output
  * dim — identical to the unrolled chain's left fold and to the
  * oracle's explode-and-sum replay (integer adds commute anyway).
  *
  * Null semantics: a null input element poisons the WHOLE output row
  * (top-level null) — vectors are all-or-nothing here, unlike the
  * unrolled form's per-dim null propagation; embeddings carry no null
  * elements, and the s14 spec pins equality against the HOF reference
  * on the real corpus.
  */
object JlProject {
  /** The seeded Rademacher sign matrix: sign(i→j) = +1 iff the first
    * hex char of md5("jl:i:j") < '8' — deterministic, engine-neutral
    * (md5 is identical everywhere; the s14 oracle rebuilds the same
    * matrix in SQL), and balanced by construction (8 of 16 hex chars
    * each side). */
  def signs(inDim: Int, outDim: Int): Seq[Seq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until outDim).map { j =>
      (0 until inDim).map { i =>
        val hex = md.digest(s"jl:$i:$j".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if (hex.head < '8') 1 else -1
      }
    }
  }
}

case class JlProject(child: Expression, signs: Seq[Seq[Int]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"jl_project requires array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "jl_project"

  override def nullable: Boolean = true

  private lazy val signMatrix: Array[Array[Int]] =
    signs.map(_.toArray).toArray

  @transient private lazy val inDim = signs.head.size
  @transient private lazy val outDim = signs.size

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != inDim) return null
    val out = new Array[Long](outDim)
    var j = 0
    while (j < outDim) {
      val row = signMatrix(j)
      var s = 0L
      var i = 0
      while (i < inDim) {
        if (a.isNullAt(i)) return null
        s += row(i) * a.getLong(i)
        i += 1
      }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("jlSigns", signMatrix, "int[][]")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $inDim) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[$outDim];
         |  for (int $j = 0; $j < $outDim && !${ev.isNull}; $j++) {
         |    long $s = 0L;
         |    for (int $i = 0; $i < $inDim; $i++) {
         |      if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |      $s += $m[$j][$i] * $a.getLong($i);
         |    }
         |    $out[$j] = $s;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JlProject =
    copy(child = newChild)
}
