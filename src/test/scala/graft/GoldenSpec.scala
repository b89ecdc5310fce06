package graft

import scala.io.Source

/** Golden pins for the `no_oracle` queries (engine-defined hashing — the
  * DuckDB oracle can't reproduce them, so CORRECTNESS only checks row
  * counts). These sf0.01 goldens freeze the exact output so a
  * hash-semantics regression (kernel change, seed drift, blocking bug)
  * can't hide behind the weaker rows-only gate. Every pinned query has a
  * total ORDER BY, so outputs are partition-count-independent and the pin
  * is safe at any test parallelism.
  *
  * Regenerate (only after an INTENTIONAL semantics change) by re-dumping
  * `target/verify_out/<q>/` from a `graft.Verify` run at sf0.01.
  */
class GoldenSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  private def golden(name: String): (Array[String], Seq[Array[String]]) = {
    val src = Source.fromURL(getClass.getResource(s"/goldens/$name.csv"))
    try {
      val lines = src.getLines().toList
      (lines.head.split(","), lines.tail.map(_.split(",", -1)))
    } finally src.close()
  }

  private def check(name: String): Unit =
    checkDf(name, SparkEntry.queries(name)(spark, sf001))

  private def checkDf(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
    val (cols, want) = golden(name)
    assert(df.columns.toSeq == cols.toSeq, s"$name column mismatch")
    val got = df.collect()
    assert(got.length == want.length,
      s"$name rows: got ${got.length}, golden ${want.length}")
    got.zip(want).zipWithIndex.foreach { case ((row, exp), i) =>
      cols.indices.foreach { c =>
        row.get(c) match {
          case d: Double =>
            assert(math.abs(d - exp(c).toDouble) < 1e-12,
              s"$name row $i col ${cols(c)}: $d vs ${exp(c)}")
          case v =>
            assert(v.toString == exp(c),
              s"$name row $i col ${cols(c)}: $v vs ${exp(c)}")
        }
      }
    }
  }

  test("golden: q22_dedup_minhash exact rows at sf0.01")(check("q22_dedup_minhash"))
  test("golden: q23_dedup_simhash exact rows at sf0.01")(check("q23_dedup_simhash"))
  test("golden: q28_langid exact rows at sf0.01")(check("q28_langid"))
  test("golden: q47_winnow_overlap exact rows at sf0.01")(check("q47_winnow_overlap"))
  // hash-split and HLL outputs are partition-order-independent (xxhash per
  // row; HLL merge commutative), so they pin safely too
  test("golden: q36_stratified_split_counts exact rows at sf0.01")(check("q36_stratified_split_counts"))
  // q44 itself is oracle-gated now (exact distinct + within-rsd flag); this
  // pin keeps freezing the RAW HLL estimates the oracle can't hash
  test("golden: q44 raw HLL estimates exact at sf0.01") {
    import org.apache.spark.sql.functions._
    checkDf("q44_approx_distinct",
      Tables.events(spark, sf001).groupBy("event_type")
        .agg(approx_count_distinct("user_id").as("approx_users"))
        .orderBy("event_type"))
  }
  // seeded-ML pins: every fit is seeded and the emitted numbers are rounded
  // (q30 coefficients 4 dp, q31 metrics 2 dp), so under this suite's fixed
  // session config (local[4], 4 shuffle partitions — randomSplit sampling
  // depends on the scan partitioning) the outputs are exact; a kernel /
  // seed / Spark-upgrade drift can no longer hide behind the rows-only
  // CORRECTNESS check
  test("golden: q29_ml_rf_confusion exact rows at sf0.01")(check("q29_ml_rf_confusion"))
  test("golden: q30_ml_glr_poisson exact rows at sf0.01")(check("q30_ml_glr_poisson"))
  test("golden: q31_ml_logistic_metrics exact rows at sf0.01")(check("q31_ml_logistic_metrics"))
  test("golden: q32_ml_als_recs exact rows at sf0.01")(check("q32_ml_als_recs"))
  test("golden: q33_ml_kmeans_embed exact rows at sf0.01")(check("q33_ml_kmeans_embed"))
  test("golden: q34_ml_cv_best_params exact rows at sf0.01")(check("q34_ml_cv_best_params"))
  test("golden: q35_ml_cluster_tokens exact rows at sf0.01")(check("q35_ml_cluster_tokens"))
  test("golden: q153_ml_gbt_cv_best_params exact rows at sf0.01")(check("q153_ml_gbt_cv_best_params"))
  // q169 is the production-probe (approximate-regime) hybrid fusion — the
  // KMeans cell routing is seeded and the sf0.01 scan is one partition in
  // every gate config, so the fused page is exact; this pin freezes it
  // (the DuckDB oracle cannot express the routing — rows-only otherwise)
  test("golden: q169_hybrid_prod_probe exact rows at sf0.01")(check("q169_hybrid_prod_probe"))
  // q173: the production-probe dedup decisions (same seeded-routing
  // argument as q169; the decision-recall floor reads the stored cert)
  test("golden: q173_semdedup_prod_probe exact rows at sf0.01")(check("q173_semdedup_prod_probe"))
  // q178: q173's quantized sibling — production geometry over the int8
  // index, decision-cert asserted at serve; the int8 filter-refine is
  // provably exact at equal geometry, so the pin freezes the same seeded
  // routing through the quantized artifact
  test("golden: q178_semdedup_quant_prod exact rows at sf0.01")(check("q178_semdedup_quant_prod"))
  // q175: the production RAG pipeline served from the stored artifacts
  // (q169's channels -> SERP dedup -> page cut -> MMR) — same
  // seeded-routing determinism argument as q169; the composition's
  // exactness is oracle-gated by q171, the channel floors by the
  // persisted recall certificate
  test("golden: q175_rag_prod_pipeline exact rows at sf0.01")(check("q175_rag_prod_pipeline"))
  // STREAMING-side pins for the q18/q48/q56 twins: the stream==batch specs
  // prove equivalence, but both sides could co-drift; these freeze the
  // streaming output itself (same shared session config as StreamGoldenGen)
  test("golden: streaming hourlyStats (q18 twin) exact rows at sf0.01")(
    checkDf("stream_q18_hourly", StreamGoldenGen.hourly(spark, "spec")))
  test("golden: streaming slidingTypeStats (q48 twin) exact rows at sf0.01")(
    checkDf("stream_q48_sliding", StreamGoldenGen.sliding(spark, "spec")))
  test("golden: streaming sessionizeClosed (q56 twin) exact rows at sf0.01")(
    checkDf("stream_q56_closed", StreamGoldenGen.closedSessions(spark, "spec")))
}
