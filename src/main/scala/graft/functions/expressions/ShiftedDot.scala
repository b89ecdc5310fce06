package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd Σ wᵢ·(cᵢ + 128) over (`array<double>`, `array<long>`) — the
  * int8-code dot-product estimate of the quantized filter-refine path
  * ([[graft.operators.Similarity.quantizedRefineTopK]]).
  *
  * Replaces `aggregate(zip_with(w, codes, (wi,c) => wi*(c+128)), 0.0, +)`
  * on the candidate-scoring hot path: the HOF chain is CodegenFallback —
  * one interpreted lambda call PLUS an intermediate 64-element array
  * allocation per candidate row, which at batch-kNN volume
  * (corpus × nProbe/nLists candidates, ~3·10⁸ rows at the x100 fixture)
  * dominated the whole rewrite (measured 1158 s → the [[DotProduct]]-class
  * compiled loop). Same strict left-to-right accumulation order and the
  * same `wᵢ·(cᵢ+128)` term grouping, so the estimate is BIT-IDENTICAL to
  * the HOF form — the filter-refine soundness argument (ε inflation
  * covering float slop) is untouched.
  */
case class ShiftedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // left must be array<double> (query weights), right array<long> (codes)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val w = a.asInstanceOf[ArrayData]
    val c = b.asInstanceOf[ArrayData]
    val n = math.min(w.numElements(), c.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += w.getDouble(i) * (c.getLong(i) + 128L)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * (double) ($b.getLong($i) + 128L);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
