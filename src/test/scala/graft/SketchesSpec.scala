package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** The mergeable-HLL contract behind q125: register tables are bounded,
  * union is a lossless max-merge over ANY partitioning of the data, the
  * integral estimator state makes estimates bit-reproducible regardless of
  * physical layout, and the estimate tracks exact distinct within the
  * sketch's error bound across both estimator regimes (linear counting at
  * low load, raw HLL at high load).
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def keys(n: Int, salt: String) =
    spark.range(n.toLong).select(
      concat(lit(s"k$salt"), col("id")).as("k"),
      (col("id") % 4).cast("int").as("shard"))

  test("register table is bounded at 2^lgK rows per group, rho in [1, 55]") {
    val reg = Sketches.hllRegisters(keys(200000, "a"), col("k"), Seq("shard"))
    val perGroup = reg.groupBy("shard").agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect()
    assert(perGroup.nonEmpty && perGroup.forall(_ <= 1024L))
    val (lo, hi) = reg.agg(min("rho"), max("rho")).as[(Int, Int)].head()
    assert(lo >= 1 && hi <= 55)
  }

  test("sketch union is lossless: per-shard registers max-merge to the " +
    "whole-frame registers, for any shard assignment") {
    val df = keys(50000, "b")
    val whole = Sketches.hllRegisters(df, col("k"), Seq.empty)
    val merged = Sketches.mergeRegisters(
      Sketches.hllRegisters(df, col("k"), Seq("shard")), Seq.empty)
    assert(whole.except(merged).isEmpty && merged.except(whole).isEmpty)
    // and therefore the estimates agree exactly
    val a = Sketches.hllEstimate(whole, Seq.empty).as[Long].head()
    val b = Sketches.hllEstimate(merged, Seq.empty).as[Long].head()
    assert(a == b)
  }

  test("estimate is layout-independent: repartitioned input gives the " +
    "bit-identical estimate (integral sketch state, no float-sum order)") {
    val df = keys(30000, "c")
    def est(d: org.apache.spark.sql.DataFrame): Long =
      Sketches.hllEstimate(
        Sketches.hllRegisters(d, col("k"), Seq.empty), Seq.empty)
        .as[Long].head()
    assert(est(df) == est(df.repartition(17, col("k"))))
    assert(est(df) == est(df.orderBy(col("k").desc)))
  }

  test("estimate tracks exact distinct within the sketch bound in both " +
    "regimes (duplicates collapse first)") {
    // raw-HLL regime: 80k distinct, each key duplicated 3x
    val big = keys(80000, "d")
    val dup = big.union(big).union(big)
    val estBig = Sketches.hllEstimate(
      Sketches.hllRegisters(dup, col("k"), Seq.empty), Seq.empty)
      .as[Long].head()
    // ±3σ at lgK=10: 3 · 1.04/√1024 ≈ 9.7 %
    assert(math.abs(estBig - 80000.0) / 80000.0 < 0.1,
      s"raw-regime estimate $estBig vs 80000")
    // linear-counting regime: 300 distinct → near-exact
    val estSmall = Sketches.hllEstimate(
      Sketches.hllRegisters(keys(300, "e"), col("k"), Seq.empty), Seq.empty)
      .as[Long].head()
    assert(math.abs(estSmall - 300.0) / 300.0 < 0.05,
      s"linear-counting estimate $estSmall vs 300")
  }

  test("persisted card: build + shard appends == scratch rebuild, and " +
    "re-appending a shard (at-least-once redelivery) changes nothing") {
    val root = "target/tmp/sketches_spec/card"
    operators.MaintenanceIo.deleteDir(root)
    val df = keys(20000, "g")
    operators.Sketches.buildHllCard(df.filter(col("shard") === 0), "k", root)
    (1 to 3).foreach { sh =>
      operators.Sketches.appendToHllCard(
        df.filter(col("shard") === sh), "k", root)
    }
    val incremental = operators.Sketches.hllCardEstimate(spark, root)
      .as[Long].head()
    val scratch = operators.Sketches.hllEstimate(
      operators.Sketches.hllRegisters(df, col("k"), Seq.empty), Seq.empty)
      .as[Long].head()
    assert(incremental == scratch)
    // idempotent merge: replaying an already-folded shard is a no-op
    operators.Sketches.appendToHllCard(
      df.filter(col("shard") === 2), "k", root)
    assert(operators.Sketches.hllCardEstimate(spark, root)
      .as[Long].head() == scratch)
  }

  test("persisted card pins its geometry: appends honor the built lgK") {
    val root = "target/tmp/sketches_spec/card_lgk"
    operators.MaintenanceIo.deleteDir(root)
    val df = keys(5000, "h")
    operators.Sketches.buildHllCard(df.filter(col("shard") === 0), "k",
      root, lgK = 8)
    operators.Sketches.appendToHllCard(
      df.filter(col("shard") =!= 0), "k", root)
    val snap = operators.MaintenanceIo.snapshot(root)
    val regs = spark.read.parquet(snap("registers"))
    assert(regs.count() <= 256L) // 2^8 — the append did NOT write at 2^10
    val incremental = operators.Sketches.hllCardEstimate(spark, root)
      .as[Long].head()
    val scratch = operators.Sketches.hllEstimate(
      operators.Sketches.hllRegisters(df, col("k"), Seq.empty, lgK = 8),
      Seq.empty, lgK = 8).as[Long].head()
    assert(incremental == scratch)
  }

  test("log histogram: bounded buckets, lossless sum-merge, quantiles " +
    "within the 2^-b relative bound of the exact discrete quantile") {
    // skewed long-tailed values exercise many magnitudes
    val vals = (1 to 50000).map(i => (i.toLong * i.toLong % 999983L) + 1L)
    val df = vals.zipWithIndex
      .map { case (v, i) => (v, i % 4) }.toDF("v", "shard")
    val hist = operators.Sketches.logHistogram(df, col("v"), Seq.empty)
    assert(hist.count() <= (64 - 5) * 64L, "bucket space must be bounded")
    // merge over an arbitrary sharding == scratch
    val merged = operators.Sketches.mergeHistograms(
      operators.Sketches.logHistogram(df, col("v"), Seq("shard")),
      Seq.empty)
    assert(hist.except(merged).isEmpty && merged.except(hist).isEmpty)
    // every estimate within 2^-5 of the exact discrete quantile
    val qs = Seq(0.5, 0.9, 0.99, 0.999)
    val est = operators.Sketches.histQuantiles(hist, Seq.empty, qs)
      .select("quantile", "est").as[(Double, Long)].collect().toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val exact = sorted(math.ceil(q * sorted.size).toInt - 1)
      val rel = math.abs(est(q) - exact).toDouble / exact
      assert(rel <= 1.0 / 32 + 1e-9,
        s"q=$q est=${est(q)} exact=$exact rel=$rel")
    }
  }

  test("count-min: est >= exact for every key, lossless sum-merge, " +
    "never-seen keys read their collision floor only") {
    // zipf-ish: key j appears ~ 2000/j times
    val rows = (1 to 200).flatMap(j => Seq.fill(2000 / j)(s"t$j"))
    val df = rows.zipWithIndex.map { case (k, i) => (k, i % 4) }
      .toDF("k", "shard")
    val sk = operators.Sketches.mergeCms(
      operators.Sketches.cmsSketch(df, col("k"), Seq("shard")), Seq.empty)
    val scratch = operators.Sketches.cmsSketch(df, col("k"), Seq.empty)
    assert(sk.except(scratch).isEmpty && scratch.except(sk).isEmpty,
      "per-shard sketches must sum-merge to the scratch sketch")
    val exact = df.groupBy("k").agg(count(lit(1)).as("exact"))
    val est = operators.Sketches.cmsEstimate(sk, exact.select("k"), "k")
      .join(exact, Seq("k"))
      .select("k", "est_cnt", "exact").as[(String, Long, Long)].collect()
    assert(est.nonEmpty && est.forall { case (_, e, x) => e >= x },
      "CM must never underestimate")
    // a key never inserted estimates at most the collision floor eps*N
    val n = rows.size
    val ghost = operators.Sketches.cmsEstimate(sk,
      Seq("never-inserted-key").toDF("k"), "k")
      .select("est_cnt").as[Long].head()
    assert(ghost <= math.ceil(math.E / 4096 * n).toLong * 4 + 1,
      s"ghost estimate $ghost exceeds the collision bound at N=$n")
  }

  test("set algebra: inclusion-exclusion overlap tracks exact within the " +
      "sketch bound across disjoint, identical, and partial overlaps") {
    // q132's derivation: est_overlap = est_a + est_b - est_union, with
    // union = register max-merge. Identical sets must overlap at exactly
    // the per-set estimate (union registers == each set's registers, so
    // the longs cancel algebraically); disjoint and partial overlaps
    // land within the compounded ±3σ bound (3 estimates, each
    // σ ≈ 1.04/√1024 ≈ 3.3 %).
    def est(df: org.apache.spark.sql.DataFrame): Long =
      Sketches.hllEstimate(
        Sketches.hllRegisters(df, col("k"), Seq.empty), Seq.empty)
        .as[Long].head()
    def overlap(a: org.apache.spark.sql.DataFrame,
                b: org.apache.spark.sql.DataFrame): Long =
      est(a) + est(b) - est(a.unionByName(b))
    val xs = keys(4000, "s")      // ids 0..3999
    val lo = xs.filter(col("k") < "ks2")  // lexicographic split, disjoint
    val hi = xs.filter(col("k") >= "ks2")
    assert(overlap(xs, xs) == est(xs),
      "identical sets must overlap at exactly the set estimate")
    val tol = (3 * 3 * 0.033 * 4000).toLong // 3 ests x 3 sigma x n
    assert(math.abs(overlap(lo, hi)) <= tol,
      s"disjoint overlap must be ~0, got ${overlap(lo, hi)}")
    val mid = xs.filter(col("k") >= "ks1" && col("k") < "ks3")
    val exactMid = mid.intersect(lo).count()
    assert(math.abs(overlap(mid, lo) - exactMid) <= tol,
      s"partial overlap ${overlap(mid, lo)} vs exact $exactMid")
  }

  test("NULL keys are skipped, matching COUNT(DISTINCT) semantics") {
    val df = keys(1000, "f").union(
      spark.range(50).select(lit(null: String).as("k"),
        lit(0).cast("int").as("shard")))
    val withNulls = Sketches.hllEstimate(
      Sketches.hllRegisters(df, col("k"), Seq.empty), Seq.empty)
      .as[Long].head()
    val without = Sketches.hllEstimate(
      Sketches.hllRegisters(df.filter(col("k").isNotNull), col("k"),
        Seq.empty), Seq.empty).as[Long].head()
    assert(withNulls == without)
  }
}
