package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Pack int8-range quantization codes (`array<long>`,
  * [[graft.functions.VectorFunctions.quantizeInt8]]'s output) into a
  * `binary` column of exactly one byte per dimension — the STORAGE form
  * of the quantized index (round-19: the measured scan economics).
  *
  * Codes stored as `array<long>` cost ~3 bytes/dim on disk even though
  * the values fit a byte (parquet's int64 leaf encoding never reached the
  * 1-byte dictionary ideal on any measured fixture — BENCH_SCALE.md r19),
  * which made the quantized candidate pass read MORE bytes than the
  * double vectors it was supposed to undercut (measured 0.85×). A binary
  * column is 64 bytes/row at dim 64 — the raw width the ~8× claim was
  * always about.
  *
  * Values outside [-128, 127] CLAMP: they only arise on rows appended
  * past the fitted ranges ([[graft.operators.Similarity
  * .appendToQuantizedIndex]]), and every such row is flagged `oob` at
  * write time (the widened flag checks exactly this range), which routes
  * it AROUND the code-score prune and straight to the exact re-rank — so
  * a clamped byte is never used in a pruning decision.
  */
case class PackInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"PackInt8 requires array<long>, got ${t.simpleString(10)}")
  }

  override def nullSafeEval(a: Any): Any = {
    val c = a.asInstanceOf[ArrayData]
    val n = c.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val v = c.getLong(i)
      out(i) = (if (v < -128L) -128L else if (v > 127L) 127L else v).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = $a.getLong($i);
         |  $out[$i] = (byte) ($v < -128L ? -128L : ($v > 127L ? 127L : $v));
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
