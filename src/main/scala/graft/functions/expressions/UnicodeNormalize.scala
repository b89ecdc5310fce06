package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical normalization as a codegen'd scalar expression.
  *
  * Web-scraped corpora mix canonically-equivalent byte sequences for the
  * same text (composed `á` vs `a`+U+0301; compatibility clones from PDF
  * extraction), which silently defeats every byte-keyed operator downstream
  * — exact dedup, MinHash shingles, content-hash splits, fingerprints all
  * treat equivalent strings as distinct. Normalizing to NFC at ingest is
  * the standard fix (and what the oracle's `nfc_normalize` does in DuckDB;
  * both engines implement the same Unicode canonical-composition algorithm,
  * which the standard guarantees stable across versions for assigned
  * code points).
  *
  * Spark has no built-in normalizer, so this wraps `java.text.Normalizer`
  * as a native expression: `doGenCode` emits a single helper call, so the
  * operator stays inside WholeStageCodegen (no UDF serialization wall),
  * and the helper's `isNormalized` quick-check returns the INPUT UTF8String
  * unchanged on already-NFC text — on mostly-ASCII corpora the common path
  * allocates nothing.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = ctx.addReferenceObj("nfcUtil", NfcNormalize,
      "graft.functions.expressions.NfcNormalize$")
    defineCodeGen(ctx, ev, c => s"$util.nfc($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** NFC-normalize; the quick-check fast path hands back the input object
    * (zero-copy) when the text is already composed — true for all-ASCII.
    */
  def nfc(u: UTF8String): UTF8String = {
    val s = u.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) u
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }
}
