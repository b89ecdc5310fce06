package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

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
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  // packed key is t * 2^planes + bits: cap planes so tables * 2^planes can
  // never overflow Long and alias bucket keys across tables
  require(planes >= 1 && planes <= 56, s"planes in [1,56]: $planes")
  require(tables >= 1 && tables.toLong <= (Long.MaxValue >> planes),
    s"tables * 2^planes must fit in a Long: tables=$tables planes=$planes")

  // the SQL surface (graft_hyperplane_sketches) would otherwise accept any
  // array type and read 8-byte doubles over e.g. float elements — demand
  // array<double> so the analyzer inserts a cast or rejects the call
  // Seq[DataType] <: Seq[AbstractDataType] (AbstractDataType is
  // private[sql] in Spark 4; the covariant override keeps us on public API)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))

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
