package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, PlanExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode, TrueLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a serialized Bloom filter — a drop-in for
  * Spark's own `BloomFilterMightContain` (spark-catalyst
  * BloomFilterMightContain.scala, the engine behind injected runtime
  * filters) with its codegen defect fixed: Spark emits
  * `bf.mightContainLong((Long) <value>)`, and when the probe key
  * constant-folds to a NEGATIVE literal (any odds-on xxhash64 of a
  * constant), Janino parses `(Long) -123L` as a binary subtraction whose
  * left operand is the CLASS java.lang.Long — "Expression java.lang.Long
  * is not an rvalue" — and the whole projection silently falls back to
  * interpreted mode (round-12 verdict #1). `mightContainLong` takes a
  * primitive long, so the cast was never needed; this emits the call
  * bare and stays inside WholeStageCodegen for literal and column keys
  * alike.
  *
  * Same semantics as Spark's: the filter side must be a constant or an
  * uncorrelated scalar subquery (it is deserialized ONCE per codegen
  * reference, never per row), a NULL filter or NULL key yields NULL, and
  * the blob rides the plan exactly like Spark's injected runtime filters.
  */
case class BloomMightContainKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) =>
        left match {
          case e if e.foldable => TypeCheckResult.TypeCheckSuccess
          case _: PlanExpression[_] => TypeCheckResult.TypeCheckSuccess
          case _ => TypeCheckResult.TypeCheckFailure(
            "the filter side must be a constant or a scalar subquery")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (binary filter, bigint key), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

  @transient private lazy val bloomFilter: BloomFilter = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any =
    if (bloomFilter == null) null
    else {
      val k = right.eval(input)
      if (k == null) null
      else bloomFilter.mightContainLong(k.asInstanceOf[Long])
    }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    if (bloomFilter == null) {
      ev.copy(isNull = TrueLiteral, value = JavaCode.defaultLiteral(dataType))
    } else {
      val bf = ctx.addReferenceObj("bloomFilter", bloomFilter,
        classOf[BloomFilter].getName)
      val keyGen = right.genCode(ctx)
      ev.copy(code =
        code"""
          ${keyGen.code}
          boolean ${ev.isNull} = ${keyGen.isNull};
          boolean ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
          if (!${ev.isNull}) {
            ${ev.value} = $bf.mightContainLong(${keyGen.value});
          }""")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
