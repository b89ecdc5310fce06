package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, as Catalyst
  * higher-order functions (codegen-free but fully distributed, no UDF
  * serialization). North-star similarity-search layer.
  *
  * All math is done in double after an explicit per-element cast, with a
  * strict left-fold accumulation order — so results are bit-reproducible
  * across partitionings and across engines (the DuckDB oracle mirrors the
  * same fold with list_reduce).
  */
object VectorFunctions {

  /** array<float> → array<double>, the canonical compute type. */
  def toDoubleArray(c: Column): Column = transform(c, _.cast("double"))

  /** Left-fold dot product — a custom codegen'd Expression (see
    * expressions.DotProduct); bit-identical to the HOF
    * aggregate(zip_with(·,·,*),0.0,+) it replaces, ~100× less interpreter
    * overhead on pairwise-similarity hot paths.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(expressions.DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Σ wᵢ·(cᵢ+128) over (array<double> weights, array<long> int8 codes) —
    * the quantized candidate-score kernel, compiled
    * (expressions.ShiftedDot); bit-identical to
    * aggregate(zip_with(w, codes, (wi,c) => wi*(c+128)), 0.0, +).
    */
  def shiftedDot(w: Column, codes: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(expressions.ShiftedDot(
      ColumnBridge.expression(w), ColumnBridge.expression(codes)))
  }

  /** Σ wᵢ·(cᵢ+128) over (array<double> weights, BINARY byte-packed codes)
    * — [[shiftedDot]] for the storage form [[packInt8]] writes;
    * bit-identical for in-range codes (ScaleShapeSpec pins all three
    * forms against each other).
    */
  def shiftedDotBytes(w: Column, codes: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(expressions.ShiftedDotBytes(
      ColumnBridge.expression(w), ColumnBridge.expression(codes)))
  }

  /** array<long> int8-range codes → one-byte-per-dim `binary` (clamping
    * out-of-range values — see expressions.PackInt8: such rows are
    * oob-flagged and never pruned by code scores). The storage form that
    * actually delivers the quantized index's scan-byte economics.
    */
  def packInt8(codes: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(expressions.PackInt8(
      ColumnBridge.expression(codes)))
  }

  /** Cosine similarity; NaN on zero vectors (callers filter). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-bit sketch against `planes` fixed random hyperplanes — the
    * random-hyperplane LSH for cosine similarity: P(bit match) =
    * 1 - angle/pi. Used to bucket candidates so near-dup search never goes
    * quadratic at scale.
    */
  def hyperplaneSketch(v: Column, dim: Int, planes: Int, seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val hp: Seq[Seq[Double]] =
      Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
    val bitValues: Seq[Long] = Seq.tabulate(planes)(i => 1L << i)
    aggregate(
      zip_with(typedlit(hp), typedlit(bitValues),
        (plane, bit) => when(dot(v, plane) > 0, bit).otherwise(lit(0L))),
      lit(0L),
      (acc, b) => acc.bitwiseOR(b))
  }

  /** Per-dimension scalar int8 quantization against a fitted ranges array
    * (`array<struct<pos,lo,hi>>`, pos-sorted, lo/hi float): code =
    * floor((x-lo)/(hi-lo)*255 + 0.5) - 128 ∈ [-128, 127], with degenerate
    * (lo == hi) dimensions pinned to 0. Endpoints land exactly: x == lo →
    * -128, x == hi → 127 (PropertySpec law). The float→double widening is
    * exact and the single floor expression is IEEE-identical in DuckDB, so
    * the q73 oracle reproduces every code. Per-row array math against a
    * broadcast ranges row — no shuffle on the vector side.
    *
    * PRECONDITION: |v| == |ranges| for every row — ranges is a per-
    * dimension fit, so a length mismatch means the caller quantizes
    * against the wrong model. `zip_with` would silently null-pad the
    * shorter side; the guard turns that into a per-row error instead of
    * null codes.
    */
  def quantizeInt8(v: Column, ranges: Column): Column =
    when(size(v) =!= size(ranges),
      raise_error(concat(
        lit("quantizeInt8: embedding dim "), size(v).cast("string"),
        lit(" != ranges dim "), size(ranges).cast("string"))))
      .otherwise(zip_with(v, ranges, (x, r) =>
        when(r.getField("hi") === r.getField("lo"), lit(0L))
          .otherwise(floor(
            (x.cast("double") - r.getField("lo").cast("double")) /
              (r.getField("hi").cast("double") -
                r.getField("lo").cast("double")) * 255.0 + 0.5)
            .cast("long") - 128)))

  /** All `tables` OR-amplification sketches at once, as PACKED bucket keys
    * `t * 2^planes + bits` — one compiled kernel pass per row
    * (expressions.HyperplaneSketches) instead of `tables` interpreted HOF
    * evaluations. Element t equals
    * `lit(t * 2^planes) + hyperplaneSketch(v, dim, planes, seed + t)`
    * exactly (spec-pinned), so callers can mix the two forms.
    */
  def hyperplaneSketches(v: Column, dim: Int, planes: Int, tables: Int,
                         seed: Long = 42L): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(expressions.HyperplaneSketches(
      ColumnBridge.expression(v), dim, planes, tables, seed))
  }
}
