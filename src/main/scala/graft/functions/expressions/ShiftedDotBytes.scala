package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Codegen'd Σ wᵢ·(cᵢ + 128) over (`array<double>`, `binary`) — the
  * [[ShiftedDot]] kernel for BYTE-packed codes ([[PackInt8]], the
  * quantized index's storage form since round 19).
  *
  * For in-range codes a packed byte equals the long it packed, and
  * `(c + 128)` widens to the identical double term — so the candidate
  * score is BIT-IDENTICAL to the `array<long>` kernel and to the HOF
  * `aggregate(zip_with(w, codes, (wi,c) => wi*(c+128)), 0.0, +)` form
  * (same strict left-to-right fold; ScaleShapeSpec pins the three-way
  * equivalence). Out-of-range codes were clamped at pack time, but every
  * row carrying one is `oob`-flagged and never enters a pruning decision.
  * Length mismatch folds the common prefix (min-length), matching
  * [[ShiftedDot]]; engine callers guard dims upstream.
  */
case class ShiftedDotBytes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), BinaryType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ShiftedDotBytes requires (array<double>, binary), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val w = a.asInstanceOf[ArrayData]
    val c = b.asInstanceOf[Array[Byte]]
    val n = math.min(w.numElements(), c.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += w.getDouble(i) * (c(i) + 128L)
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
         |int $n = java.lang.Math.min($a.numElements(), $b.length);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * (double) ($b[$i] + 128L);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
