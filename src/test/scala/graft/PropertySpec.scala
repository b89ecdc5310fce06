package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Relational

/** Property-based laws over the operator library (SURVEY §5.3):
  * multiset set-op identities, top-k = sort-prefix, split partitions.
  * Generators are driven directly (seeded) — the scalatest/scalacheck
  * bridge artifact is not in the offline cache.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val smallLists = Gen.listOfN(40, Gen.chooseNum(0L, 9L))

  test("law: exceptAll preserves multiset counts; except dedupes (Q1)") {
    for ((xs, ys) <- samples(Gen.zip(smallLists, smallLists), 6)) {
      val a = xs.toDF("v"); val b = ys.toDF("v")
      val gotAll = a.exceptAll(b).as[Long].collect().sorted.toSeq
      val expAll = {
        val counts = scala.collection.mutable.Map[Long, Int]()
        xs.foreach(x => counts(x) = counts.getOrElse(x, 0) + 1)
        ys.foreach(y => if (counts.getOrElse(y, 0) > 0) counts(y) -= 1)
        counts.toSeq.flatMap { case (v, c) => Seq.fill(c)(v) }.sorted
      }
      assert(gotAll == expAll, s"xs=$xs ys=$ys")
      val gotDistinct = a.except(b).as[Long].collect().sorted.toSeq
      assert(gotDistinct == (xs.toSet -- ys.toSet).toSeq.sorted)
    }
  }

  test("law: topKPerGroup == groupwise sort-prefix") {
    val gen = Gen.listOfN(60, Gen.zip(Gen.oneOf("a", "b", "c"),
      Gen.chooseNum(0L, 20L)))
    for (pairs <- samples(gen, 6) if pairs.nonEmpty) {
      val rows = pairs.zipWithIndex.map { case ((g, m), i) => (g, i.toLong, m) }
      val counts = rows.toDF("g", "id", "m")
      val got = Relational.topKPerGroup(counts, Seq("g"), col("m"), 3,
          Seq(col("id")))
        .select("g", "id").as[(String, Long)].collect().toSet
      val exp = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        rs.sortBy(r => (-r._3, r._2)).take(3).map(r => (r._1, r._2))
      }.toSet
      assert(got == exp, s"pairs=$pairs")
    }
  }

  test("law: stratifiedSplit partitions the multiset exactly") {
    val gen = Gen.listOfN(50, Gen.zip(Gen.oneOf("x", "y"),
      Gen.chooseNum(0L, 5L)))
    for (rows <- samples(gen, 6) if rows.nonEmpty) {
      val df = rows.zipWithIndex
        .map { case ((l, v), i) => (l, v, i.toLong) }.toDF("lab", "v", "id")
      val (tr, te) = Relational.stratifiedSplit(df, "lab", 0.5, 7, Seq("id"))
      assert(tr.count() + te.count() == rows.size)
      assert(tr.intersect(te).count() == 0)
    }
  }

  test("law: temporalPrefixSplit prefix is minimal by (ts, id)") {
    for (ts <- samples(Gen.listOfN(30, Gen.chooseNum(0L, 10L)), 6)
         if ts.nonEmpty) {
      val df = ts.zipWithIndex.map { case (t, i) => (t, i.toLong) }
        .toDF("ts", "id")
      val n = ts.size / 2
      val (tr, te) = Relational.temporalPrefixSplit(df, "ts", "id", n)
      val trRows = tr.as[(Long, Long)].collect().toSeq.sorted
      val expected = ts.zipWithIndex.map { case (t, i) => (t, i.toLong) }
        .sorted.take(n)
      assert(trRows == expected, s"ts=$ts")
      assert(te.count() == ts.size - n)
    }
  }
}
