package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** FastSS deletion-neighborhood kernel for the edit-distance join's
  * blocking stage (Linkage.editDistanceJoin, q137).
  *
  * One 64-bit hash per ≤k-character-deletion variant of the input —
  * C(n,0)+C(n,1)+C(n,2) ≈ n²/2 hashes at k=2 — computed from polynomial
  * PREFIX hashes in O(1) per variant (O(n + n²) per row total, zero
  * string materialization). The SQL formulation (nested transform +
  * concat(substring×3) + xxhash64) materializes ~n³/2 characters per row
  * and measured 177 s for the x10 key build; this kernel is the same
  * blocking at in-row loop cost.
  *
  * Recall contract (what the join relies on): hashes are a pure function
  * of the variant's CODE-POINT content, so two strings whose ≤k-deletion
  * variants are equal ALWAYS collide — ed(s,t) ≤ k implies a shared key
  * (delete s's substituted+deleted positions, t's substituted+inserted
  * ones; both sides drop ≤ k chars and meet in the same string).
  * Accidental 64-bit polynomial collisions only ADD candidates; the
  * join's exact Levenshtein verify removes them, so precision is safe
  * too. Each emitted hash passes through fmix64 (the q125 avalanche
  * argument: raw polynomial hashes of structured near-equal strings have
  * biased high bits, which would skew the join's partitioning).
  *
  * Code points, not UTF-16 units or bytes: deleting one unit of a
  * surrogate pair (or one byte of a multibyte char) would make the
  * k-char-deletion variants of non-BMP text unreachable — the
  * mixed-corpus gate's regime.
  */
object DeletionHashUtil {
  private val B: Long = 0x100000001b3L // odd ⇒ invertible mod 2^64

  /** All ≤k-deletion variant hashes of `s`, sorted and deduplicated.
    * k in [0, 2]; code-point length capped at 1024 (the caller routes
    * longer strings through gram-prefix blocking — n² keys on long
    * strings is the wrong trade).
    */
  def deletionHashes(s: UTF8String, k: Int): ArrayData = {
    require(k >= 0 && k <= 2, s"deletionHashes: k in [0,2], got $k")
    val str = s.toString
    // code-point array
    val nChars = str.length
    var cpCount = str.codePointCount(0, nChars)
    require(cpCount <= 1024,
      s"deletionHashes: string has $cpCount code points (> 1024); route " +
        "long strings through gram-prefix blocking")
    val cp = new Array[Int](cpCount)
    var ci = 0; var pos = 0
    while (pos < nChars) {
      val c = str.codePointAt(pos)
      cp(ci) = c; ci += 1; pos += Character.charCount(c)
    }
    val n = cpCount
    // prefix hashes P(i) = hash of cp[0..i-1]; powers of B
    val pre = new Array[Long](n + 1)
    val pow = new Array[Long](n + 1)
    pow(0) = 1L
    var i = 0
    while (i < n) {
      pre(i + 1) = pre(i) * B + (cp(i) + 1L) // +1: no zero-absorbing char
      pow(i + 1) = pow(i) * B
      i += 1
    }
    @inline def slice(l: Int, r: Int): Long = pre(r) - pre(l) * pow(r - l)
    val total = 1 + (if (k >= 1) n else 0) +
      (if (k >= 2) n * (n - 1) / 2 else 0)
    val out = new Array[Long](total)
    var m = 0
    out(m) = HashUtil.fmix64(pre(n)); m += 1
    if (k >= 1) {
      var a = 0
      while (a < n) {
        // delete position a: [0,a) ++ [a+1,n)
        out(m) = HashUtil.fmix64(slice(0, a) * pow(n - 1 - a) + slice(a + 1, n))
        m += 1; a += 1
      }
    }
    if (k >= 2) {
      var a = 0
      while (a < n - 1) {
        val h1 = slice(0, a)
        var b = a + 1
        while (b < n) {
          // delete a < b: [0,a) ++ [a+1,b) ++ [b+1,n)
          out(m) = HashUtil.fmix64(
            (h1 * pow(b - a - 1) + slice(a + 1, b)) * pow(n - 1 - b) +
              slice(b + 1, n))
          m += 1; b += 1
        }
        a += 1
      }
    }
    java.util.Arrays.sort(out)
    // in-place unique
    var w = 0; var r = 0
    while (r < out.length) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == out.length) out
      else java.util.Arrays.copyOf(out, w))
  }
}

/** [[DeletionHashUtil.deletionHashes]] as an expression — the q137
  * blocking key stream. CodegenFallback costs one call per row; the loop
  * body is JVM-compiled.
  */
case class DeletionHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(s: Any): Any =
    DeletionHashUtil.deletionHashes(s.asInstanceOf[UTF8String], k)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
