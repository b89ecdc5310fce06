package graft

import org.apache.spark.sql.functions._

import graft.functions.LayoutFunctions

/** The z-order key's three laws, checked against a driver-side bit-by-bit
  * reference over the full 31-bit domain (edge values + seeded random):
  *
  *   1. interleave correctness — the mask-before-shift Column fold equals
  *      the literal "bit i of x lands at 2i, bit i of y at 2i+1";
  *   2. the TILE law q85 exposes (`z >> 2t` IS the Morton code of the
  *      (x >> t, y >> t) tile, for every t) — the property that makes
  *      z-range file stats cover aligned (x, y) rectangles, i.e. the whole
  *      reason the layout prunes 2-D predicates (ZOrderScanNote measures
  *      it on parquet);
  *   3. per-coordinate monotonicity (spread is strictly monotone and the
  *      even/odd lanes are disjoint), so z-sorting never reorders a fixed
  *      slice of either coordinate.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  private val edge = Seq(0L, 1L, 2L, 3L, (1L << 16) - 1, 1L << 16,
    (1L << 30) - 1, 1L << 30, (1L << 31) - 1)
  private val rng = new scala.util.Random(85)
  private val samples: Seq[(Long, Long)] = {
    val vals = edge ++ Seq.fill(500)(rng.nextLong().abs % (1L << 31))
    val ys = edge.reverse ++ Seq.fill(500)(rng.nextLong().abs % (1L << 31))
    vals.zip(ys) ++ edge.flatMap(x => edge.map(x -> _))
  }

  test("morton equals the bit-by-bit reference on edges + 500 random pairs") {
    val got = samples.toDF("x", "y")
      .select(col("x"), col("y"),
        LayoutFunctions.morton(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z == mortonRef(x, y), s"morton($x,$y)=$z != ${mortonRef(x, y)}")
      assert(z >= 0L, s"morton($x,$y) overflowed: $z")
    }
    // the extreme corner fills every interleaved bit: 2^62 - 1, positive
    assert(mortonRef((1L << 31) - 1, (1L << 31) - 1) == (1L << 62) - 1)
  }

  test("tile law: z >> 2t is the Morton code of the (x>>t, y>>t) tile") {
    val ts = Seq(1, 4, 8, 16, 23, 30)
    val df = samples.toDF("x", "y")
      .select(col("x"), col("y"),
        LayoutFunctions.morton(col("x"), col("y")).as("z"))
    ts.foreach { t =>
      val bad = df.select(
          shiftright(col("z"), 2 * t).as("ztile"),
          LayoutFunctions.morton(shiftright(col("x"), t),
            shiftright(col("y"), t)).as("mtile"))
        .filter(col("ztile") =!= col("mtile")).count()
      assert(bad == 0L, s"tile law broken at t=$t for $bad rows")
    }
  }

  test("writeZOrdered: output files cover disjoint z-ranges") {
    val out = "target/tmp/layout_spec_z"
    graft.sources.Sources.writeZOrdered(samples.toDF("x", "y"), "x", "y",
      out, files = 8)
    val back = spark.read.parquet(out)
      .withColumn("f", input_file_name())
      .withColumn("z", LayoutFunctions.morton(col("x"), col("y")))
    assert(back.count() == samples.size, "roundtrip lost rows")
    assert(back.columns.toSet == Set("x", "y", "f", "z"),
      "__z leaked into the written schema")
    // each file holds one contiguous slice of the z curve: sorted by lo,
    // every file's hi must not pass the next file's lo (ties allowed) —
    // this is the property that makes per-file x/y min-max stats cover
    // aligned rectangles, i.e. the pruning contract ZOrderScanNote times
    val ranges = back.groupBy("f")
      .agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1, "expected multiple files")
    ranges.sliding(2).foreach {
      case Array((lo1, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping z-ranges: [$lo1,$hi1] vs lo $lo2")
      case _ =>
    }
  }

  test("z is strictly monotone in each coordinate (disjoint bit lanes)") {
    edge.foreach { fixed =>
      val zs = edge.sorted.map(v => mortonRef(v, fixed))
      assert(zs == zs.sorted && zs.distinct.size == zs.size,
        s"not monotone in x at y=$fixed")
      val zy = edge.sorted.map(v => mortonRef(fixed, v))
      assert(zy == zy.sorted && zy.distinct.size == zy.size,
        s"not monotone in y at x=$fixed")
    }
  }
}
