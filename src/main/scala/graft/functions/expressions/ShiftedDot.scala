package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

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

  /** Enforced input shape (round-18 advice): `getDouble`/`getLong` on an
    * ArrayData backed by any other element width would misread bytes and
    * produce plausible-but-wrong scores — fail ANALYSIS, not results.
    * Length mismatch stays legal with MIN-LENGTH semantics (the loop
    * folds the common prefix): every engine caller guards dims upstream
    * (quantizeInt8 raises on a dim mismatch), so the equal-length case is
    * the only one that occurs — but a raw caller gets a documented
    * partial sum here, never a misread.
    */
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ShiftedDot requires (array<double>, array<long>), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

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
