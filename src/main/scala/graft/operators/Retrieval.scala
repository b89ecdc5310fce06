package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{AggFunctions, TextFunctions}

/** Hybrid sparse+dense retrieval: per-query BM25 rankings fused with a
  * dense cosine-ANN ranking by reciprocal-rank fusion (RRF; Cormack,
  * Clarke & Büttcher, SIGIR 2009), plus the diversity rerank (MMR;
  * Carbonell & Goldstein, SIGIR 1998) a RAG-style curation stack runs on
  * the fused list. Neither channel alone is trusted — lexical search
  * misses paraphrase, dense search misses rare exact terms — and RRF
  * needs only the two RANK columns, no score calibration between
  * channels.
  *
  * Scale shape (the whole point of fusing on ranks):
  *  - each channel truncates to its own top-k with the bounded-heap
  *    partial aggregate [[AggFunctions.topKByScore]], so what reaches the
  *    fusion is |queries| × k rows per channel — CONSTANT in corpus size;
  *  - the fusion join, its rank window, and the MMR greedy therefore
  *    work on bounded frames, never the corpus. At 100 TB the only
  *    corpus-sized work is the two channel scans, both embarrassingly
  *    parallel.
  */
object Retrieval {

  /** Per-query BM25 top-k over `docs`: one corpus scan, shared across all
    * queries. Exactly the q69 scoring kernel (Robertson/Spärck Jones BM25;
    * k1=1.2, b=0.75 — the constants are literals so the DuckDB oracle can
    * reproduce the identical IEEE ops; 2.2 = k1+1 and 0.25 = 1-b are NOT
    * recomputed at runtime), widened from one global term set to a
    * per-query term map:
    *  - the explode is pruned by one `isin` over the UNION of all query
    *    terms before any shuffle (term count is tiny and static);
    *  - df/corpus stats are computed once and broadcast — adding queries
    *    adds no corpus passes;
    *  - the per-query fan-out is a broadcast join of the matched (doc,
    *    term) rows against the |queries|×|terms| term map;
    *  - ranks come from the bounded heap, NOT a row_number window: a
    *    window would funnel each query's whole candidate set through one
    *    reducer, the heap ships k rows per (partition, query).
    *
    * Per-term scores round to 6 dp then sum as DECIMAL (order-independent,
    * q69's determinism rule); ties rank by doc_id ASC (heap contract).
    * Returns (q_id, doc_id, score, rank), rank 1-based, ≤ k rows/query —
    * docs matching none of a query's terms never appear.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Long, Seq[String])], k: Int): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "bm25TopK: every query needs at least one term")
    require(k > 0, "bm25TopK: k must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val allTerms = queries.flatMap(_._2).distinct
    val termMap = queries.flatMap { case (q, ts) => ts.distinct.map((q, _)) }
      .toDF("q_id", "tok")

    val withToks = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("t"))
    val dl = withToks.select(col("doc_id"),
      size(col("t")).cast("long").as("dl"))
    val tf = withToks.select(col("doc_id"), explode(col("t")).as("tok"))
      .filter(col("tok").isin(allTerms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("tot_dl"))
    val dfq = tf.groupBy("tok").agg(count(lit(1)).as("df"))

    val scored = tf.join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .join(broadcast(dfq), Seq("tok"))
      .join(broadcast(termMap), Seq("tok"))
      .withColumn("avgdl", col("tot_dl").cast("double") / col("n_docs"))
      .withColumn("ts", round(
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1) *
          (col("tf") * 2.2) /
          (col("tf") +
            lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))),
        6))
      .groupBy("q_id", "doc_id")
      .agg(sum(col("ts").cast(DecimalType(18, 6))).cast("double").as("score"))

    scored.groupBy("q_id")
      .agg(AggFunctions.topKByScore(col("score"), col("doc_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.n_id").as("doc_id"),
        col("col.sim").as("score"), (col("pos") + 1).cast("long").as("rank"))
  }

  /** Reciprocal-rank fusion of two ranked channels, each
    * (q_id, doc_id, rank): rrf = Σ 1/(kRrf + rank) over the channels that
    * retrieved the doc, rounded to 6 dp AFTER the (two-term, textually
    * ordered, commutative) sum so Spark and an oracle add the identical
    * doubles. Emits the fused top-`topK` per query with both channel
    * ranks preserved (-1 = not retrieved by that channel) and the fused
    * 1-based rank `rn`, tie-broken by doc_id.
    *
    * The row_number window here is deliberate and bounded: its input is
    * the full-outer join of two ALREADY-truncated top-k frames —
    * |queries| × (kA + kB) rows max, independent of corpus size — so no
    * corpus-sized sort ever funnels through one reducer (contrast
    * bm25TopK's heap, whose input IS corpus-sized).
    */
  def rrfFuse(a: DataFrame, b: DataFrame, kRrf: Int, topK: Int): DataFrame = {
    require(kRrf > 0 && topK > 0, "rrfFuse: kRrf and topK must be positive")
    def term(rank: Column): Column =
      when(rank.isNotNull, lit(1.0) / (lit(kRrf) + rank)).otherwise(lit(0.0))
    val fa = a.select(col("q_id"), col("doc_id"), col("rank").as("a_rank"))
    val fb = b.select(col("q_id"), col("doc_id"), col("rank").as("b_rank"))
    val fused = fa.join(fb, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        round(term(col("a_rank")) + term(col("b_rank")), 6))
    val w = Window.partitionBy("q_id")
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= topK)
      .select(col("q_id"), col("doc_id"), col("rrf"),
        coalesce(col("a_rank"), lit(-1L)).as("a_rank"),
        coalesce(col("b_rank"), lit(-1L)).as("b_rank"),
        col("rn"))
  }

  /** Search-result dedup against a persisted similarity graph: a
    * candidate is DROPPED iff the graph links it to a better-ranked
    * candidate of the same query — the "you've already seen this
    * document" filter a retrieval page runs before display, using the
    * near-dup structure the corpus pipeline already maintains
    * ([[SimGraphIndex]]) instead of re-scoring text at query time.
    *
    * The rule is deliberately NON-ITERATIVE: it checks edges against the
    * ORIGINAL ranking, not the surviving set, so a chain a~b~c (a best,
    * a~c not linked) drops BOTH b and c. That over-drops relative to the
    * sequential variant, but it is order-deterministic, one-pass, and
    * exactly replayable in SQL — the trade a serving layer makes. Emits
    * every candidate with `action` kept/dropped and `dup_of` = the
    * best-ranked duplicate neighbor ((rank, doc_id) lexicographic min;
    * -1 when kept).
    *
    * Scale shape: `candidates` is a bounded |queries|×k frame
    * (broadcast); the edge table is touched by ONE equi-join probe per
    * direction — edge-volume, never corpus-volume.
    *
    * `candidates`: (q_id, doc_id, rn); `edges`: (id_a, id_b) undirected
    * pairs (each stored once, either orientation).
    */
  def serpDedup(candidates: DataFrame, edges: DataFrame): DataFrame = {
    val cand = candidates.select(col("q_id"), col("doc_id"), col("rn"))
    val und = edges.select(col("id_a").as("doc_id"), col("id_b").as("nb"))
      .union(edges.select(col("id_b").as("doc_id"), col("id_a").as("nb")))
    val nbCand = cand.select(col("q_id"), col("doc_id").as("nb"),
      col("rn").as("nb_rn"))
    val dup = broadcast(cand).join(und, Seq("doc_id"))
      .join(broadcast(nbCand), Seq("q_id", "nb"))
      .filter(col("nb_rn") < col("rn"))
      .groupBy("q_id", "doc_id")
      .agg(min(struct(col("nb_rn"), col("nb"))).as("best"))
      .select(col("q_id"), col("doc_id"), col("best.nb").as("__dup"))
    cand.join(dup, Seq("q_id", "doc_id"), "left_outer")
      .select(col("q_id"), col("doc_id"), col("rn"),
        when(col("__dup").isNull, "kept").otherwise("dropped").as("action"),
        coalesce(col("__dup"), lit(-1L)).as("dup_of"))
  }

  /** Maximal-marginal-relevance rerank of per-query candidate lists:
    * greedily pick k docs maximizing
    * `lambdaRel·rel − lambdaDiv·max_{s∈picked} cos(d, s)` — the
    * diversity pass a retrieval stack runs AFTER fusion, so near-
    * duplicate hits don't crowd the context window.
    *
    * Greedy selection is inherently sequential, but only WITHIN a query
    * over an ALREADY-BOUNDED candidate list (the fused top-k — tens of
    * rows), so the right distribution is one `flatMapGroups` task per
    * query doing O(k·|C|²)-bounded in-memory work — queries parallelize,
    * the corpus is never touched. The only corpus-sized work is the
    * candidate-vector lookup join (an equi-join on the id, broadcast-able
    * from the candidate side upstream).
    *
    * Determinism (oracle-matched): pairwise cosines round to 6 dp before
    * the max (same sequential dot/norm op order as
    * [[Similarity.bruteForceTopK]]); the objective is
    * `lambdaRel*rel - lambdaDiv*maxsim` in that textual order; maxsim is
    * the TRUE max over picked — cosine is signed, so an all-dissimilar
    * picked set yields a diversity BONUS, the classic formula unclamped —
    * and 0.0 only for the empty first step; the argmax tie-breaks by
    * doc_id ASC (== an oracle's ROW_NUMBER(mmr DESC, doc_id)); only the
    * OUTPUT mmr rounds to 6 dp (comparisons use the unrounded double —
    * both engines see identical bits, so the argmax agrees).
    *
    * Zero-norm candidate vectors are the caller's bug (cosine undefined —
    * every MMR comparison goes NaN-false and the greedy fails fast with a
    * diagnostic); candidates without a vector row are dropped by the
    * lookup join.
    *
    * `candidates`: (q_id, doc_id, rel); `vectors`: (doc_id, v
    * array<double>). Returns (q_id, doc_id, mmr, rn), rn = 1-based pick
    * order, min(k, |candidates|) rows per query.
    */
  def mmrRerank(candidates: DataFrame, vectors: DataFrame,
                lambdaRel: Double, lambdaDiv: Double, k: Int): DataFrame = {
    require(k > 0, "mmrRerank: k must be positive")
    val spark = candidates.sparkSession
    import spark.implicits._
    val joined = candidates
      .select(col("q_id").cast("long").as("q_id"),
        col("doc_id").cast("long").as("doc_id"),
        col("rel").cast("double").as("rel"))
      .join(vectors.select(col("doc_id").cast("long").as("doc_id"),
        col("v").cast("array<double>").as("v")), Seq("doc_id"))
      .select(col("q_id"), col("doc_id"), col("rel"), col("v"))
      .as[(Long, Long, Double, Seq[Double])]

    joined.groupByKey(_._1).flatMapGroups { (q, it) =>
      // bounded: |C| = the caller's fused top-k, NOT corpus-sized
      val cs = it.toArray.sortBy(c => (-c._3, c._2))
      val vecs = cs.map(_._4.toArray)
      val nrm = vecs.map(v => math.sqrt(v.map(x => x * x).sum))
      def cos(i: Int, j: Int): Double = {
        var d = 0.0; var x = 0
        while (x < vecs(i).length) { d += vecs(i)(x) * vecs(j)(x); x += 1 }
        BigDecimal(d / (nrm(i) * nrm(j)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val n = cs.length
      val picked = scala.collection.mutable.ArrayBuffer.empty[Int]
      val out = Array.newBuilder[(Long, Long, Double, Long)]
      var step = 0
      while (step < math.min(k, n)) {
        var best = -1
        var bestMmr = Double.NegativeInfinity
        var i = 0
        while (i < n) {
          if (!picked.contains(i)) {
            val maxsim =
              if (picked.isEmpty) 0.0
              else picked.iterator.map(p => cos(i, p)).max
            val mmr = lambdaRel * cs(i)._3 - lambdaDiv * maxsim
            if (mmr > bestMmr ||
                (mmr == bestMmr && best >= 0 && cs(i)._2 < cs(best)._2)) {
              bestMmr = mmr; best = i
            }
          }
          i += 1
        }
        require(best >= 0,
          s"mmrRerank: no finite MMR candidate for query $q at step " +
            s"${step + 1} (zero-norm candidate vector making cosine NaN?)")
        picked += best
        out += ((q, cs(best)._2,
          BigDecimal(bestMmr).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble, (step + 1).toLong))
        step += 1
      }
      out.result().iterator
    }.toDF("q_id", "doc_id", "mmr", "rn")
  }
}
