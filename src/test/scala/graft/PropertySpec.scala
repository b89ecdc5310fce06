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

  test("law: TopKHeap == sort-prefix under (score desc, id asc) for any input") {
    val gen = Gen.listOfN(200, Gen.zip(Gen.chooseNum(-50, 50), Gen.chooseNum(0L, 30L)))
    for (pairs <- samples(gen, 8); k <- Seq(1, 5, 17)) {
      val heap = new graft.functions.expressions.TopKHeap(k)
      pairs.foreach { case (s, id) => heap.insert(s.toDouble, id) }
      val got = heap.sorted.toSeq
      val exp = pairs.map { case (s, id) => (s.toDouble, id) }
        .sortBy { case (s, id) => (-s, id) }.take(k)
      assert(got == exp, s"k=$k pairs=$pairs")
    }
  }

  test("law: TopKHeap merge == insert-all (partial aggregation soundness)") {
    val gen = Gen.zip(
      Gen.listOfN(60, Gen.zip(Gen.chooseNum(-9, 9), Gen.chooseNum(0L, 20L))),
      Gen.listOfN(60, Gen.zip(Gen.chooseNum(-9, 9), Gen.chooseNum(0L, 20L))))
    for ((xs, ys) <- samples(gen, 8)) {
      val k = 7
      val a = new graft.functions.expressions.TopKHeap(k)
      val b = new graft.functions.expressions.TopKHeap(k)
      xs.foreach { case (s, id) => a.insert(s.toDouble, id) }
      ys.foreach { case (s, id) => b.insert(s.toDouble, id) }
      var i = 0
      while (i < b.size) { a.insert(b.scores(i), b.ids(i)); i += 1 }
      val whole = new graft.functions.expressions.TopKHeap(k)
      (xs ++ ys).foreach { case (s, id) => whole.insert(s.toDouble, id) }
      assert(a.sorted.toSeq == whole.sorted.toSeq, s"xs=$xs ys=$ys")
    }
  }

  test("law: simhash chunk-pair blocking never misses a pair within hamming c-2") {
    // mirrors Dedup.simhashPairs's key construction: c = maxHamming + 2
    // chunks guarantee ≥ 2 intact chunks for ≤ maxHamming flipped bits
    for (maxHamming <- Seq(3, 6)) {
      val c = maxHamming + 2
      val sizes = Array.tabulate(c)(i => 64 / c + (if (i < 64 % c) 1 else 0))
      val offsets = sizes.scanLeft(0)(_ + _)
      val slot = sizes.max
      def keys(sh: Long): Set[Long] =
        (for { i <- 0 until c; j <- i + 1 until c } yield (i, j))
          .zipWithIndex.map { case ((i, j), p) =>
            val ci = (sh >>> offsets(i)) & ((1L << sizes(i)) - 1)
            val cj = (sh >>> offsets(j)) & ((1L << sizes(j)) - 1)
            (p.toLong * (1L << slot) + ci) * (1L << slot) + cj
          }.toSet
      val gen = Gen.zip(Gen.long,
        Gen.listOfN(maxHamming, Gen.chooseNum(0, 63)))
      for ((base, flips) <- samples(gen, 40)) {
        val corrupted = flips.foldLeft(base)((v, b) => v ^ (1L << b))
        // ≤ maxHamming distinct flipped bits → some pair key must survive
        assert(keys(base).intersect(keys(corrupted)).nonEmpty,
          s"c=$c base=$base flips=$flips")
      }
    }
  }

  test("law: bpeTokens partitions every string — concat(tokens) == input") {
    // the pre-tokenizer's alternation must cover every character exactly
    // once for ANY printable-ASCII input, not just the fixture corpus
    val strGen = Gen.listOfN(80,
      Gen.frequency(
        6 -> Gen.alphaChar,
        2 -> Gen.numChar,
        1 -> Gen.oneOf(' ', ' ', '\t', '\n'),
        1 -> Gen.oneOf('\'', '.', ',', '!', '?', '-', '"', '(', ')')))
      .map(_.mkString)
    val inputs = samples(strGen, 60).filter(_.nonEmpty)
    val got = inputs.toDF("t")
      .select(col("t"), graft.functions.TextFunctions.bpeTokens(col("t"))
        .as("toks"))
      .as[(String, Seq[String])].collect()
    got.foreach { case (input, toks) =>
      assert(toks.mkString == input,
        s"lossy tokenization of ${input.take(40)}...")
      assert(toks.forall(_.nonEmpty), "empty token emitted")
    }
  }

  test("law: selectByRank == sorted(rank-1) on random multisets") {
    for (vals <- samples(Gen.listOfN(400, Gen.chooseNum(0L, 25L)), 5)) {
      val df = vals.toDF("__v")
      for (rank <- Seq(1L, vals.size / 3L, vals.size.toLong)) {
        if (rank >= 1) {
          val (v, below) = Relational.selectByRank(df, rank)
          val sorted = vals.sorted
          assert(v.asInstanceOf[Long] == sorted(rank.toInt - 1),
            s"rank=$rank vals=$vals")
          assert(below == sorted.count(_ < sorted(rank.toInt - 1)))
        }
      }
    }
  }

  test("law: hashSplit is disjoint, exhaustive, and repartition-invariant") {
    val df = spark.range(2000).toDF("id")
    val (tr, te) = Relational.hashSplit(df, "id", 0.7, 40L)
    val trIds = tr.select("id").as[Long].collect().toSet
    val teIds = te.select("id").as[Long].collect().toSet
    assert(trIds.intersect(teIds).isEmpty)                 // disjoint
    assert((trIds ++ teIds) == (0L until 2000L).toSet)     // exhaustive
    assert(math.abs(trIds.size / 2000.0 - 0.7) < 0.05)     // frac honored
    // membership is a pure function of the id: identical under ANY
    // physical partitioning — the property randomSplit cannot offer
    for (k <- Seq(1, 7, 32)) {
      val (tk, _) = Relational.hashSplit(df.repartition(k), "id", 0.7, 40L)
      assert(tk.select("id").as[Long].collect().toSet == trIds, s"k=$k")
    }
    // the seed actually enters the hash: a different seed moves the cut
    val (tr2, _) = Relational.hashSplit(df, "id", 0.7, 41L)
    assert(tr2.select("id").as[Long].collect().toSet != trIds)
  }

  test("law: mixtureSample honors per-domain rates, repartition-invariant") {
    import org.apache.spark.sql.functions.{col, concat, lit, pmod}
    val df = spark.range(3000).toDF("id")
      .withColumn("dom", concat(lit("d"), pmod(col("id"), lit(3))))
    val rates = Map("d0" -> 1.0, "d1" -> 0.0, "d2" -> 0.5)
    val kept = Relational.mixtureSample(df, "id", "dom", rates, 0.5, 41L)
      .select("id").as[Long].collect().toSet
    assert(kept.count(_ % 3 == 0) == 1000)                 // rate 1.0: all
    assert(kept.count(_ % 3 == 1) == 0)                    // rate 0.0: none
    val half = kept.count(_ % 3 == 2)
    assert(math.abs(half / 1000.0 - 0.5) < 0.08)           // rate honored
    // kept set is a pure function of (id, seed): physical layout inert
    for (k <- Seq(1, 7, 32)) {
      val again = Relational.mixtureSample(df.repartition(k), "id", "dom",
        rates, 0.5, 41L).select("id").as[Long].collect().toSet
      assert(again == kept, s"k=$k")
    }
    // an unknown domain falls back to defaultRate's bucket cut — which
    // rides the SAME stream as hashSplit, so d2 at 0.5 == default 0.5
    val dflt = Relational.mixtureSample(df, "id", "dom", Map.empty, 0.5, 41L)
      .select("id").as[Long].collect().toSet
    assert(dflt.filter(_ % 3 == 2) == kept.filter(_ % 3 == 2))
  }

  test("law: packedSpans offsets are exact within-bucket running sums") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val df = spark.range(500).toDF("id")
      .withColumn("w", pmod(col("id") * 37 + 11, lit(90L)) + 10)
    val out = Relational.packedSpans(df, "id", "w",
        buckets = 4, ctx = 100, seed = 17L)
      .select("id", "w", "bucket", "off", "pack_first", "pack_last")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // per bucket, in id order: off is the exact prefix sum, packs are the
    // ctx-window ids of the first/last token, pack ids never decrease
    out.groupBy(_._3).foreach { case (bkt, rows) =>
      var run = 0L
      var lastPack = -1L
      rows.sortBy(_._1).foreach { case (id, w, _, off, pf, pl) =>
        assert(off == run, s"bucket $bkt id $id")
        assert(pf == bkt * (1L << 32) + off / 100)
        assert(pl == bkt * (1L << 32) + (off + w - 1) / 100)
        assert(pf >= lastPack)
        lastPack = pl
        run += w
      }
    }
    // physical layout inert: same spans under any repartitioning
    val again = Relational.packedSpans(df.repartition(7), "id", "w",
        buckets = 4, ctx = 100, seed = 17L)
      .select("id", "w", "bucket", "off", "pack_first", "pack_last")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(again.sortBy(_._1).sameElements(out.sortBy(_._1)))
  }

  test("law: shuffleIndex is a repartition-invariant bijection onto 0..n-1") {
    import org.apache.spark.sql.functions.col
    val df = spark.range(1000).toDF("id")
    val out = Relational.shuffleIndex(df, "id", buckets = 8, seed = 23L)
      .select("id", "bucket", "pos")
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    // bijection onto 0..n-1
    assert(out.map(_._3).toSeq == (0L until 1000L))
    // bucket-major: positions within a bucket are contiguous
    assert(out.map(_._2).toSeq == out.map(_._2).sorted.toSeq)
    // actually permuted (identity survives with probability ~0)
    assert(out.map(_._1).toSeq != (0L until 1000L))
    // pure function of (id, seed): physical layout inert
    for (k <- Seq(1, 7, 32)) {
      val again = Relational.shuffleIndex(df.repartition(k), "id", 8, 23L)
        .select("id", "pos").as[(Long, Long)].collect().toMap
      assert(again == out.map(t => t._1 -> t._3).toMap, s"k=$k")
    }
    // a different seed yields a different permutation
    val reseeded = Relational.shuffleIndex(df, "id", 8, 24L)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(reseeded != out.map(t => t._1 -> t._3).toMap)
  }

  test("law: prioritySample is exact-k, repartition-invariant, bottom-k consistent") {
    import org.apache.spark.sql.functions.col
    val df = spark.range(1000).toDF("id")
    val s100 = Relational.prioritySample(df, "id", 100, 29L)
      .select("id").as[Long].collect().toSet
    assert(s100.size == 100)
    // prefix property: a smaller sample is contained in a larger one
    val s40 = Relational.prioritySample(df, "id", 40, 29L)
      .select("id").as[Long].collect().toSet
    assert(s40.subsetOf(s100))
    // physical layout inert
    for (k <- Seq(1, 7, 32)) {
      val again = Relational.prioritySample(df.repartition(k), "id", 100, 29L)
        .select("id").as[Long].collect().toSet
      assert(again == s100, s"k=$k")
    }
    // bottom-k consistency: growing the corpus only swaps rows in/out by
    // priority — survivors from the smaller corpus stay selected together
    val grown = Relational.prioritySample(
      spark.range(2000).toDF("id"), "id", 100, 29L)
      .select("id").as[Long].collect().toSet
    assert(grown.intersect(0L.until(1000L).toSet).subsetOf(s100))
    // k >= n returns everything
    assert(Relational.prioritySample(df, "id", 5000, 29L).count() == 1000)
  }

  test("law: quantizeInt8 codes are in-range, endpoint-exact, monotone") {
    import org.apache.spark.sql.functions.{col, typedlit}
    // a hand-built ranges row: dim0 spans [-2,2], dim1 degenerate, dim2 [0,10]
    val ranges = Seq((0, -2.0f, 2.0f), (1, 5.0f, 5.0f), (2, 0.0f, 10.0f))
    val vecs = Seq(
      (1L, Seq(-2.0f, 5.0f, 0.0f)),   // all lows → -128, 0 (degenerate), -128
      (2L, Seq(2.0f, 5.0f, 10.0f)),   // all highs → 127, 0, 127
      (3L, Seq(0.0f, 5.0f, 5.0f)))    // midpoints → floor(127.5+.5)-128 = 0
    val got = vecs.toDF("id", "v")
      .select(col("id"),
        functions.VectorFunctions.quantizeInt8(col("v"),
          typedlit(ranges).cast(
            "array<struct<pos:int,lo:float,hi:float>>")).as("q"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(1L) == Seq(-128L, 0L, -128L), got(1L).toString)
    assert(got(2L) == Seq(127L, 0L, 127L), got(2L).toString)
    assert(got(3L) == Seq(0L, 0L, 0L), got(3L).toString)
    // monotone in x, always within [-128, 127]
    val sweep = (0 to 100).map(i => (i.toLong, Seq(-2.0f + i * 0.04f)))
      .toDF("id", "v")
      .select(col("id"), functions.VectorFunctions.quantizeInt8(col("v"),
        typedlit(Seq((0, -2.0f, 2.0f))).cast(
          "array<struct<pos:int,lo:float,hi:float>>")).as("q"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1).map(_._2.head)
    assert(sweep.zip(sweep.tail).forall { case (a, b) => a <= b })
    assert(sweep.forall(q => q >= -128 && q <= 127))
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

  test("law: temperatureRatePpm — floor at the smallest domain, monotone, effective-size interpolation") {
    for (ns <- samples(Gen.listOfN(8, Gen.chooseNum(1L, 1000000L)), 8)) {
      val nMin = ns.min
      val rates = ns.map(n => n -> Relational.temperatureRatePpm(nMin, n))
      // the smallest domain keeps everything, exactly
      assert(Relational.temperatureRatePpm(nMin, nMin) == 1000000L)
      // rates in (0, 1e6]; monotone non-increasing in domain size
      rates.foreach { case (n, r) =>
        assert(r >= 1L && r <= 1000000L, s"rate $r for n=$n nMin=$nMin") }
      val sorted = rates.sortBy(_._1)
      sorted.sliding(2).foreach {
        case Seq((n1, r1), (n2, r2)) =>
          assert(r2 <= r1, s"rate rose $r1->$r2 as n grew $n1->$n2")
        case _ =>
      }
      // effective size n·r/1e6 ≈ √(nMin·n) within ppm rounding error
      rates.foreach { case (n, r) =>
        val eff = n.toDouble * r / 1000000.0
        val want = math.sqrt(nMin.toDouble * n)
        assert(math.abs(eff - want) <= n / 1000000.0 + 1e-9,
          s"effective size $eff vs sqrt interpolation $want at n=$n")
      }
    }
  }

  test("law: BPE max pair count is non-increasing across merge rounds") {
    // merging (a,b) can only create pairs (x,ab)/(ab,y) whose occurrence
    // sets are subsets of (x,a)/(b,y)'s — so the argmax count never rises
    // (the standard BPE training invariant). Random word-soup corpora.
    val words = Gen.listOfN(30,
      Gen.listOfN(5, Gen.alphaLowerChar).map(_.mkString))
    for (ws <- samples(words, 3)) {
      val docs = Seq(ws.mkString(" ")).toDF("text")
      val merges = graft.operators.Bpe.trainMerges(
        graft.operators.Bpe.wordFreq(docs, "text"), 6)
      val counts = merges.sortBy(_.rank).map(_.pairCount)
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
        s"pair counts must be non-increasing: $counts")
      assert(counts.forall(_ >= 1))
    }
  }

  test("law: scrub output tokens are a subsequence of the input's") {
    // clean_text must be the input token stream with positions removed —
    // never reordered, never rewritten
    val docs = samples(smallLists, 6).zipWithIndex.map { case (ts, i) =>
      (i.toLong, ts.map(v => s"w$v").mkString(" "))
    }.toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .scrubDuplicateGrams(docs, "doc_id", "text", n = 3)
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    val orig = docs.as[(Long, String)].collect().toMap
    for ((id, clean) <- out) {
      val ct = if (clean.isEmpty) Seq.empty else clean.split(" ").toSeq
      val ot = orig(id).split(" ").toSeq
      // subsequence check
      var j = 0
      for (t <- ot if j < ct.length && ct(j) == t) j += 1
      assert(j == ct.length,
        s"doc $id: '$clean' is not a subsequence of '${orig(id)}'")
    }
  }
}
