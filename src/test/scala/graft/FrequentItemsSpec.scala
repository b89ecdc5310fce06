package graft

import org.apache.spark.sql.functions._

import graft.functions.AggFunctions
import graft.functions.expressions.MGSummary

/** Misra–Gries frequent-items laws: the deterministic no-miss guarantee
  * (candidates ⊇ every item with count > N/(k+1)) under adversarial
  * vocabularies, partitioning invariance of the full sketch-then-verify
  * pipeline, and the exact regime (distinct ≤ k → exact counting, no
  * decrement ever fires).
  */
class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  private def candidates(items: Seq[String], k: Int, parts: Int): Set[String] =
    items.toDF("tok").repartition(parts)
      .agg(AggFunctions.frequentCandidates(col("tok"), k).as("c"))
      .select(explode(col("c")).as("t")).as[String].collect().toSet

  test("exact regime: distinct <= k returns every distinct item") {
    val items = (1 to 500).map(i => s"w${i % 40}")
    assert(candidates(items, k = 64, parts = 3) == items.toSet)
  }

  test("no-miss law: heavy items survive adversarial noise, any partitioning") {
    // 30% heavy + 3000 singletons: distinct (3002) >> k (32), so the
    // decrement and merge-trim paths both fire. Bound: undercount ≤
    // N/(k+1) = 4287/33 ≈ 130 < heavy counts (645/430).
    val noise = (1 to 3000).map(i => s"n$i")
    val items = Seq.fill(645)("HEAVY_A") ++ Seq.fill(430)("HEAVY_B") ++
      noise ++ (1 to 212).map(i => s"mid${i % 8}")
    for (parts <- Seq(1, 7, 32)) {
      val c = candidates(items, k = 32, parts = parts)
      assert(c.contains("HEAVY_A") && c.contains("HEAVY_B"),
        s"parts=$parts missed a heavy hitter: $c")
      assert(c.size <= 32, s"parts=$parts summary exceeded k: ${c.size}")
    }
  }

  test("MG buffer math: undercount bounded by N/(k+1) after merges") {
    // Hand-drive the buffer the way partial aggregation does: three
    // partition summaries merged pairwise, then check every stored count
    // is within N/(k+1) of truth and nothing above the bound is missing.
    val k = 8
    val rng = new scala.util.Random(7)
    val parts = Seq.fill(3) {
      Seq.fill(400)(if (rng.nextInt(10) < 3) "hot" else s"c${rng.nextInt(200)}")
    }
    val truth = parts.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    val n = parts.map(_.size).sum
    val merged = parts.map { p =>
      val b = new MGSummary(k); p.foreach(b.add); b
    }.reduce { (a, b) => a.mergeIn(b); a }
    merged.counts.foreach { case (t, c) =>
      assert(c <= truth(t), s"$t overcounted: $c > ${truth(t)}")
      assert(truth(t) - c <= n / (k + 1), s"$t undercount beyond bound")
    }
    truth.filter(_._2 > n / (k + 1)).keys.foreach { t =>
      assert(merged.counts.contains(t), s"missed guaranteed-heavy $t")
    }
  }

  test("q82 pipeline: exact output, invariant under partitioning") {
    // Small-k geometry chosen so t = max(1, N div 1000) strictly exceeds
    // the N/(k+1) undercount: N = 5075, k = 2048 → bound 2.47 < t = 5.
    val items = Seq.fill(2000)("the") ++ Seq.fill(60)("of") ++
      Seq.fill(15)("edge5x") ++ (1 to 3000).map(i => s"u$i")
    val expected = items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= math.max(1L, items.size / 1000L)).toMap
    for (parts <- Seq(1, 13)) {
      val toks = items.toDF("tok").repartition(parts)
      val stats = toks.agg(count(lit(1)).as("n"),
        AggFunctions.frequentCandidates(col("tok"), 2048).as("cand"))
      val cand = stats.select(explode(col("cand")).as("tok"))
      val got = toks.join(broadcast(cand), Seq("tok"), "left_semi")
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(stats.select(col("n"))))
        .filter(col("cnt") >= expr("greatest(1L, n div 1000)"))
        .select("tok", "cnt").as[(String, Long)].collect().toMap
      assert(got == expected, s"parts=$parts")
    }
  }
}
