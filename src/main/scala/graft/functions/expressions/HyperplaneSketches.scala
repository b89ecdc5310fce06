package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `tables` hyperplane sketches of a double-array vector in ONE
  * compiled pass: element t of the output is the packed bucket key
  * `t * 2^planes + bits_t`, where bit p of `bits_t` is the sign of
  * v · hp(t, p).
  *
  * Plane vectors reproduce `VectorFunctions.hyperplaneSketch(v, dim,
  * planes, seed + t)` exactly (same per-table `Random(seed + t)` gaussian
  * stream), so this is a drop-in compiled replacement for evaluating that
  * HOF expression `tables` times — which interprets an expression tree per
  * plane per table (~planes×tables interpreted dot products per row; the
  * kernel is one JVM loop).
  */
case class HyperplaneSketches(child: Expression, dim: Int, planes: Int,
                              tables: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(planes >= 1 && planes <= 62, s"planes in [1,62]: $planes")
  require(tables >= 1, s"tables >= 1: $tables")

  // tables × planes plane vectors, flattened; row (t*planes + p) is plane p
  // of table t — same gaussian stream as hyperplaneSketch(seed + t)
  @transient private lazy val hp: Array[Array[Double]] = {
    val out = new Array[Array[Double]](tables * planes)
    var t = 0
    while (t < tables) {
      val rnd = new scala.util.Random(seed + t)
      var p = 0
      while (p < planes) {
        val plane = new Array[Double](dim)
        var i = 0
        while (i < dim) { plane(i) = rnd.nextGaussian(); i += 1 }
        out(t * planes + p) = plane
        p += 1
      }
      t += 1
    }
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val keys = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bits = 0L
      var p = 0
      while (p < planes) {
        val plane = hp(t * planes + p)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += v.getDouble(i) * plane(i); i += 1 }
        if (dot > 0) bits |= (1L << p)
        p += 1
      }
      keys(t) = t.toLong * (1L << planes) + bits
      t += 1
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
