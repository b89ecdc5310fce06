package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Hybrid retrieval: bm25TopK per-query ranking and rrfFuse semantics
  * (q165's kernels). The full-corpus numeric gate is the q165 DuckDB
  * oracle; these pin the hand-checkable semantics and the scale shapes.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("bm25TopK: hand corpus — term match sets, multi-term accumulation, " +
      "rank order") {
    val docs = docsDf(
      1L -> "apple banana apple",
      2L -> "banana cherry",
      3L -> "durian")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq(0L -> Seq("apple"), 1L -> Seq("apple", "banana")), k = 10)
      .orderBy("q_id", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))

    // q0 ("apple"): only d1 contains it
    val q0 = got.filter(_._1 == 0L)
    assert(q0.map(t => (t._2, t._4)).toSeq == Seq((1L, 1L)))

    // q1 ("apple banana"): d1 (both terms) outranks d2 (banana only); d3
    // matches nothing and never appears
    val q1 = got.filter(_._1 == 1L)
    assert(q1.map(t => (t._2, t._4)).toSeq == Seq((1L, 1L), (2L, 2L)))
    assert(q1(0)._3 > q1(1)._3, "two matched terms must outscore one")

    // q1's d1 score is q0's d1 score plus d1's banana term: per-term
    // scores are independent of the query set (df/stats are corpus-side)
    val d1Apple = q0.head._3
    assert(q1.head._3 > d1Apple)
  }

  test("bm25TopK: k truncates per query; ranks stay 1..k contiguous") {
    val docs = docsDf((1L to 20L).map(i =>
      i -> s"pear ${Seq.fill(i.toInt)("kiwi").mkString(" ")}"): _*)
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq(0L -> Seq("pear"), 1L -> Seq("kiwi")), k = 5)
    val byQ = got.collect().groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L))
    byQ.values.foreach { rows =>
      assert(rows.length == 5)
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to 5L))
    }
  }

  test("bm25TopK: equal scores tie-break by doc_id ascending (heap " +
      "contract, matches the oracle's ROW_NUMBER tiebreak)") {
    // identical docs → identical scores; ranks must follow doc_id
    val docs = docsDf(9L -> "fig grape", 3L -> "fig grape", 6L -> "fig grape")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq(0L -> Seq("fig")), k = 3).orderBy("rank").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(3L, 6L, 9L))
    assert(got.map(_.getDouble(2)).distinct.length == 1)
  }

  private def ranked(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("q_id", "doc_id", "rank")

  test("rrfFuse: both-channel docs accumulate, single-channel docs keep " +
      "-1 on the missing side, fused rank is dense top-k") {
    val a = ranked((0L, 10L, 1L), (0L, 11L, 2L))
    val b = ranked((0L, 11L, 1L), (0L, 12L, 2L))
    val got = Retrieval.rrfFuse(a, b, kRrf = 60, topK = 10)
      .orderBy("rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // doc 11: 1/62 + 1/61; doc 10: 1/61; doc 12: 1/62
    assert(got.map(_._2).toSeq == Seq(11L, 10L, 12L))
    assert(got(0)._3 == BigDecimal(1.0 / 62 + 1.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(1)._4 == 1L && got(1)._5 == -1L, "a-only doc keeps dn=-1")
    assert(got(2)._4 == -1L && got(2)._5 == 2L, "b-only doc keeps sp=-1")
    assert(got.map(_._6).toSeq == Seq(1L, 2L, 3L))
  }

  test("rrfFuse: symmetric single-channel ties resolve by doc_id; topK " +
      "truncates") {
    // same rank on opposite channels → identical rrf → doc_id order
    val a = ranked((1L, 7L, 3L))
    val b = ranked((1L, 5L, 3L))
    val got = Retrieval.rrfFuse(a, b, kRrf = 60, topK = 1).collect()
      .map(r => (r.getLong(1), r.getLong(5)))
    assert(got.toSeq == Seq((5L, 1L)), "doc 5 wins the rrf tie, topK=1 cuts")
  }

  test("rrfFuse: queries present in only one channel survive fusion") {
    val a = ranked((0L, 1L, 1L))
    val b = ranked((9L, 2L, 1L))
    val got = Retrieval.rrfFuse(a, b, kRrf = 60, topK = 5)
      .orderBy("q_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 9L))
  }

  private def cands(rows: (Long, Long, Double)*) =
    rows.toSeq.toDF("q_id", "doc_id", "rel")

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("doc_id", "v")

  test("mmrRerank: near-duplicate high-rel pair is split by a diverse " +
      "lower-rel doc (the whole point of MMR)") {
    // docs 1,2 nearly identical (cos≈1), doc 3 orthogonal-ish
    val c = cands((0L, 1L, 0.9), (0L, 2L, 0.89), (0L, 3L, 0.5))
    val v = vecs(1L -> Seq(1.0, 0.0, 0.01), 2L -> Seq(1.0, 0.0, 0.0),
      3L -> Seq(0.0, 1.0, 0.0))
    val got = Retrieval.mmrRerank(c, v, 0.7, 0.3, k = 3)
      .orderBy("rn").collect().map(r => (r.getLong(1), r.getLong(3)))
    // pick1 = 1 (max rel); pick2: doc2 mmr ≈ .7*.89-.3*1 ≈ .323 <
    // doc3 mmr = .7*.5-.3*0 = .35 → diversity wins; pick3 = 2
    assert(got.toSeq == Seq((1L, 1L), (3L, 2L), (2L, 3L)))
  }

  test("mmrRerank: first pick is max rel with doc_id tiebreak; k caps " +
      "at the candidate count") {
    val c = cands((0L, 9L, 0.8), (0L, 4L, 0.8))
    val v = vecs(9L -> Seq(1.0, 0.0), 4L -> Seq(0.0, 1.0))
    val got = Retrieval.mmrRerank(c, v, 0.7, 0.3, k = 5)
      .orderBy("rn").collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq((4L, 1L), (9L, 2L)), "doc_id breaks the rel tie")
  }

  test("mmrRerank: negative max-cosine is a diversity bonus (signed, " +
      "unclamped — oracle parity)") {
    // doc 2 is ANTI-correlated with pick 1 → bonus lifts it over doc 3
    // which has rel advantage but near-zero sim
    val c = cands((0L, 1L, 0.9), (0L, 2L, 0.50), (0L, 3L, 0.56))
    val v = vecs(1L -> Seq(1.0, 0.0), 2L -> Seq(-1.0, 0.0),
      3L -> Seq(0.0, 1.0))
    val got = Retrieval.mmrRerank(c, v, 0.7, 0.3, k = 2)
      .orderBy("rn").collect().map(r => (r.getLong(1), r.getDouble(2)))
    // doc2: .7*.5 - .3*(-1) = .65; doc3: .7*.56 - .3*0 = .392
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
    assert(math.abs(got(1)._2 - 0.65) < 1e-9)
  }

  test("mmrRerank: queries are independent groups; candidates without a " +
      "vector row are dropped by the lookup join") {
    val c = cands((0L, 1L, 0.9), (0L, 7L, 0.8), (1L, 2L, 0.4))
    val v = vecs(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0)) // no doc 7
    val got = Retrieval.mmrRerank(c, v, 0.7, 0.3, k = 3)
      .orderBy("q_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 1L), (1L, 2L)))
  }

  private def edgesDf(rows: (Long, Long)*) =
    rows.toSeq.toDF("id_a", "id_b")

  private def candDf(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("q_id", "doc_id", "rn")

  test("serpDedup: better-ranked neighbor drops; edge orientation is " +
      "irrelevant; dup_of is the lexicographic-best duplicate") {
    // q0: 10 (rn1) ~ 30 (rn3), 20 (rn2) ~ 30 via reversed edge → 30 has
    // two better-ranked neighbors, dup_of must be the best-RANKED (10)
    val cand = candDf((0L, 10L, 1L), (0L, 20L, 2L), (0L, 30L, 3L))
    val edges = edgesDf(10L -> 30L, 30L -> 20L)
    val got = Retrieval.serpDedup(cand, edges).orderBy("rn").collect()
      .map(r => (r.getLong(1), r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq((10L, "kept", -1L), (20L, "kept", -1L),
      (30L, "dropped", 10L)))
  }

  test("serpDedup: one-pass rule — a chain a~b~c (a best, a!~c) drops " +
      "BOTH b and c (documented over-drop); cross-query edges never " +
      "interact") {
    val cand = candDf((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L),
      (1L, 2L, 1L), (1L, 3L, 2L))
    val edges = edgesDf(1L -> 2L, 2L -> 3L)
    val got = Retrieval.serpDedup(cand, edges)
      .orderBy("q_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getLong(4)))
    // q0: 1 kept; 2 dropped (dup of 1); 3 dropped (dup of 2 — checked
    // against the ORIGINAL ranking, not the surviving set)
    assert(got.filter(_._1 == 0L).toSeq == Seq((0L, 1L, "kept", -1L),
      (0L, 2L, "dropped", 1L), (0L, 3L, "dropped", 2L)))
    // q1: the 2~3 edge applies per query — 3 drops against q1's ranking
    assert(got.filter(_._1 == 1L).toSeq == Seq((1L, 2L, "kept", -1L),
      (1L, 3L, "dropped", 2L)))
  }

  test("serpDedup: no edges between candidates → everything kept") {
    val cand = candDf((0L, 1L, 1L), (0L, 2L, 2L))
    val got = Retrieval.serpDedup(cand, edgesDf(5L -> 6L))
      .collect().map(_.getString(3))
    assert(got.forall(_ == "kept"))
  }

  test("bm25PerQueryFromIndex: the stored-index serving path reproduces " +
      "the from-scratch kernel row-for-row (build + append)") {
    val docs = Tables.documents(spark, sf0001)
    val idx = java.nio.file.Files.createTempDirectory("inv_hybrid").toString
    graft.operators.InvertedIndex.buildIndex(
      docs.filter(col("doc_id") % 3 =!= 2), idx)
    graft.operators.InvertedIndex.appendToIndex(
      docs.filter(col("doc_id") % 3 === 2), idx)
    val queries = Seq(0L -> Seq("spark", "join"), 1L -> Seq("stream"))
    val stored = graft.operators.InvertedIndex
      .bm25PerQueryFromIndex(spark, idx, queries, k = 20)
      .orderBy("q_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val scratch = Retrieval.bm25TopK(docs, "doc_id", "text", queries, k = 20)
      .orderBy("q_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(stored.toSeq == scratch.toSeq,
      "stored-index BM25 must equal the raw-text recompute exactly")
    assert(stored.nonEmpty)
  }

  test("scale shape: the corpus-sized sparse channel ranks via the " +
      "bounded heap (no Window); only the bounded fusion frame uses one") {
    val docs = Tables.documents(spark, sf0001)
    val sparse = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq(0L -> Seq("spark", "join")), k = 50)
    val sp = sparse.queryExecution.executedPlan.toString
    assert(!sp.contains("Window"),
      "per-query channel rank must come from the partial-agg heap, not a " +
        "row_number window:\n" + sp)
    assert(sp.contains("topkbyscore") || sp.contains("TopKByScore"),
      "expected the bounded-heap aggregate in the sparse channel plan:\n" + sp)
  }

  test("q169 production-probe fusion: end-to-end overlap with the exact " +
      "fusion stays above the serving floor at sf0.01") {
    // q169's in-line monitor gates the DENSE CHANNEL's recall; this is the
    // end-to-end number a deployment actually cares about — how much of
    // the exact fused top-10 (q165) the pruned-probe fusion still surfaces.
    // Measured 0.84 mean / 0.7 min per query at sf0.01 (nProbe=8/16);
    // floors at 0.6/0.5 so fixture regeneration noise can't flake the
    // suite while a real routing regression (e.g. probing the wrong
    // cells → near-zero overlap) still fails loudly.
    val sf001 = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("q165_hybrid_rrf")(spark, sf001)
      .select("q_id", "doc_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val pruned = SparkEntry.queries("q169_hybrid_prod_probe")(spark, sf001)
      .select("q_id", "doc_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(pruned.keySet == exact.keySet, "query sets must match")
    val perQ = exact.map { case (q, e) =>
      q -> pruned(q).intersect(e).size.toDouble / e.size
    }
    val mean = perQ.values.sum / perQ.size
    assert(mean >= 0.6, s"mean fused overlap $mean fell below 0.6: $perQ")
    perQ.foreach { case (q, o) =>
      assert(o >= 0.5, s"query $q fused overlap $o fell below 0.5: $perQ")
    }
  }

  test("q175 production RAG pipeline: end-to-end overlap with the exact " +
      "q171 composition stays above the serving floor at sf0.01") {
    // The q169 discipline applied to the WHOLE pipeline (round-17 verdict
    // #2): how much of the exact composition's final MMR page (q171 —
    // brute-force dense channel, corpus-side BM25, full DuckDB replay)
    // the stored-artifact production form still serves. The dense
    // channel's recall floor is certificate-enforced inside the query;
    // this measures what survives fusion → dedup → page cut → MMR.
    // Measured at sf0.01 (nProbe=8/nLists=16): mean 0.64, per-query
    // {0.6, 0.2, 0.8, 1.0, 0.6} — the 5-pick MMR greedy AMPLIFIES a
    // single fused-candidate difference (one early pick shifts every
    // later diversity penalty), so the per-query floor is deliberately
    // loose (0.2) and the mean floor (0.45) carries the regression
    // signal: a routing bug (wrong cells) produces near-disjoint pages
    // (~0.0) on every query, far below both.
    val sf001 = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("q171_rag_pipeline")(spark, sf001)
      .select("q_id", "doc_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val prod = SparkEntry.queries("q175_rag_prod_pipeline")(spark, sf001)
      .select("q_id", "doc_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(prod.keySet == exact.keySet, "query sets must match")
    val perQ = exact.map { case (q, e) =>
      q -> prod(q).intersect(e).size.toDouble / e.size
    }
    val mean = perQ.values.sum / perQ.size
    assert(mean >= 0.45, s"mean page overlap $mean fell below 0.45: $perQ")
    perQ.foreach { case (q, o) =>
      assert(o >= 0.2, s"query $q page overlap $o fell below 0.2: $perQ")
    }
  }
}
