package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.operators.Similarity.RecallCertSpec

/** The persisted recall / decision-recall certificates (round-17 verdict
  * #1): measured at mutation time, published in the same atomic manifest
  * swap as the mutation, and ASSERTED (floor + epoch freshness + geometry)
  * by the serving queries instead of a per-run corpus-linear brute-force
  * audit. These tests pin the whole contract: same-publish atomicity,
  * staleness on any uncertified mutation, geometry matching, the recluster
  * refresh, and the decision-cert sibling for semantic dedup.
  */
class CertificationSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, sf0001).select(col("vec_id"),
    graft.functions.VectorFunctions.toDoubleArray(col("embedding"))
      .as("embedding"))

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("build-with-cert: certificate rides the build's publish; " +
      "exhaustive-probe cert is exactly 1.0") {
    val p = tmp("cert_build")
    Similarity.buildIvfIndex(emb, p, nLists = 4,
      cert = Some(RecallCertSpec(k = 5, nProbe = 4, sampleEvery = 7L)))
    val cert = Similarity.readRecallCert(spark, p).get
    assert(cert.epoch == 0L && cert.k == 5 && cert.nProbe == 4)
    assert(cert.sampleN > 0L, "deterministic sample must be nonempty")
    // nProbe == nLists probes every cell — the certified recall is the
    // exhaustive-probe exactness property, not an approximation
    assert(cert.recall == 1.0,
      s"exhaustive-probe certificate must be exactly 1.0: ${cert.recall}")
    assert(Similarity.requireCertifiedRecall(spark, p, k = 5, nProbe = 4,
      floor = 0.99) == 1.0)
    // floor above the certified recall fails loudly
    intercept[IllegalArgumentException] {
      Similarity.requireCertifiedRecall(spark, p, k = 5, nProbe = 4,
        floor = 1.01)
    }
    // serving at a geometry the cert was not measured at fails loudly
    intercept[IllegalArgumentException] {
      Similarity.requireCertifiedRecall(spark, p, k = 5, nProbe = 2,
        floor = 0.5)
    }
    intercept[IllegalArgumentException] {
      Similarity.requireCertifiedRecall(spark, p, k = 10, nProbe = 4,
        floor = 0.5)
    }
  }

  test("uncertified index refuses certified serving") {
    val p = tmp("cert_none")
    Similarity.buildIvfIndex(emb, p, nLists = 4)
    intercept[IllegalStateException] {
      Similarity.requireCertifiedRecall(spark, p, k = 5, nProbe = 4,
        floor = 0.5)
    }
  }

  test("staleness: an uncertified mutation invalidates the cert; " +
      "certifyIvfIndex and append-with-cert restore it") {
    val p = tmp("cert_stale")
    val base = emb.filter(col("vec_id") < 400)
    val shard = emb.filter(col("vec_id") >= 400)
    Similarity.buildIvfIndex(base, p, nLists = 4,
      cert = Some(RecallCertSpec(k = 5, nProbe = 4)))
    Similarity.requireCertifiedRecall(spark, p, 5, 4, 0.99)
    // append WITHOUT a cert: epoch moves past the stored cert -> stale
    Similarity.appendToIvfIndex(shard.filter(col("vec_id") < 450), p)
    val ex = intercept[IllegalArgumentException] {
      Similarity.requireCertifiedRecall(spark, p, 5, 4, 0.5)
    }
    assert(ex.getMessage.contains("STALE"))
    // standalone refresh re-certifies under the unchanged epoch
    Similarity.certifyIvfIndex(spark, p, RecallCertSpec(k = 5, nProbe = 4))
    assert(Similarity.requireCertifiedRecall(spark, p, 5, 4, 0.9) == 1.0)
    // append WITH a cert keeps the serving path green in one publish
    Similarity.appendToIvfIndex(shard.filter(col("vec_id") >= 450), p,
      cert = Some(RecallCertSpec(k = 5, nProbe = 4)))
    assert(Similarity.requireCertifiedRecall(spark, p, 5, 4, 0.9) == 1.0)
  }

  test("drifted recluster refreshes the cert (round-17 verdict #1 'done' " +
      "criterion)") {
    val p = tmp("cert_recluster")
    Similarity.buildIvfIndex(emb, p, nLists = 4,
      cert = Some(RecallCertSpec(k = 5, nProbe = 4)))
    // recluster (the drift actuator) with a cert at the SERVING geometry
    // of the wider quantizer: one publish swaps centroids + assignments +
    // certificate — the serving path never sees a certless epoch
    Similarity.reclusterIvfIndex(spark, p, nLists = 8,
      cert = Some(RecallCertSpec(k = 5, nProbe = 8)))
    val cert = Similarity.readRecallCert(spark, p).get
    assert(cert.epoch == 1L && cert.nProbe == 8)
    assert(Similarity.requireCertifiedRecall(spark, p, 5, 8, 0.99) == 1.0)
    // the pre-recluster geometry is no longer certified
    intercept[IllegalArgumentException] {
      Similarity.requireCertifiedRecall(spark, p, 5, 4, 0.5)
    }
  }

  test("approximate-regime cert: recall lands in (0, 1] and matches " +
      "ivfRecallAtK on the same deterministic sample") {
    val p = tmp("cert_approx")
    Similarity.buildIvfIndex(emb, p, nLists = 8,
      cert = Some(RecallCertSpec(k = 5, nProbe = 2, sampleEvery = 5L)))
    val cert = Similarity.readRecallCert(spark, p).get
    assert(cert.recall > 0.0 && cert.recall <= 1.0)
    // the cert is ivfRecallAtK's math over the hash-sampled queries —
    // recompute it independently and compare exactly
    val qs = emb.filter(pmod(abs(hash(col("vec_id"))), lit(5L)) === 0)
    val manual = Similarity.ivfRecallAtK(p, qs, k = 5, nProbe = 2)
    assert(math.abs(cert.recall - manual) < 1e-12,
      s"cert ${cert.recall} != recomputed $manual")
  }

  test("decision cert: certify -> assert; stale on mutation; " +
      "config mismatch refuses") {
    val p = tmp("cert_decision")
    // the q173 shape in miniature: the corpus IS the index's vector set
    Similarity.buildIvfIndex(emb, p, nLists = 8)
    val measured = Dedup.certifyDecisionRecall(spark, p, threshold = 0.5,
      k = 5, nProbe = 8)
    // nProbe == nLists: the "pruned" run IS the exhaustive run
    assert(measured == 1.0)
    assert(Dedup.requireCertifiedDecisionRecall(spark, p, 0.5, 5, 8,
      floor = 0.99) == 1.0)
    intercept[IllegalArgumentException] { // θ mismatch
      Dedup.requireCertifiedDecisionRecall(spark, p, 0.9, 5, 8, 0.5)
    }
    intercept[IllegalArgumentException] { // nProbe mismatch
      Dedup.requireCertifiedDecisionRecall(spark, p, 0.5, 5, 4, 0.5)
    }
    // an uncertified mutation staleness-fails the decision cert too
    Similarity.appendToIvfIndex(
      emb.filter(col("vec_id") < 5)
        .select((col("vec_id") + 900000L).as("vec_id"), col("embedding")),
      p)
    val ex = intercept[IllegalArgumentException] {
      Dedup.requireCertifiedDecisionRecall(spark, p, 0.5, 5, 8, 0.5)
    }
    assert(ex.getMessage.contains("STALE"))
    // missing cert is its own loud failure
    val p2 = tmp("cert_decision_none")
    Similarity.buildIvfIndex(emb, p2, nLists = 4)
    intercept[IllegalStateException] {
      Dedup.requireCertifiedDecisionRecall(spark, p2, 0.5, 5, 4, 0.5)
    }
  }

  private def certGens(p: String, table: String): Seq[String] =
    Option(new java.io.File(p).list()).getOrElse(Array.empty)
      .filter(n => n.startsWith(s"$table.g") && !n.endsWith(".inprogress"))
      .toSeq.sorted

  test("lock-free certify REFUSES when the index mutates mid-audit, " +
      "cleans its orphan generation, and a re-run succeeds") {
    val p = tmp("cert_race_mut")
    Similarity.buildIvfIndex(emb.filter(col("vec_id") < 400), p, nLists = 4)
    val shard = emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)
    val ex = intercept[IllegalStateException] {
      Similarity.certifyIvfIndexHooked(spark, p,
        RecallCertSpec(k = 5, nProbe = 4),
        () => Similarity.appendToIvfIndex(shard, p))
    }
    assert(ex.getMessage.contains("mutated during certification"))
    // the refused publish must not strand its pre-written generation (the
    // in-progress marker would otherwise shield the orphan from gc forever)
    assert(certGens(p, "recall_cert").isEmpty,
      s"refused certify left orphan gens: ${certGens(p, "recall_cert")}")
    // re-run against the post-mutation index: publishes and serves
    Similarity.certifyIvfIndex(spark, p, RecallCertSpec(k = 5, nProbe = 4))
    assert(Similarity.requireCertifiedRecall(spark, p, 5, 4, 0.99) == 1.0)
  }

  test("concurrent certify: a second certify publishing mid-flight does " +
      "not gc the first's in-flight generation (round-18 advice)") {
    val p = tmp("cert_race_cc")
    Similarity.buildIvfIndex(emb, p, nLists = 4)
    // A audits at (k=5, nProbe=4); B lands a FULL certify (different
    // geometry) between A's audit and A's publish. B's publish runs gc —
    // pre-fix it reaped A's unreferenced cert dir and A then published a
    // manifest pointing at a deleted directory (readRecallCert threw at
    // serve time). With reservation, A completes: same epoch, so A's
    // measurement is still valid and last-publish-wins.
    val recall = Similarity.certifyIvfIndexHooked(spark, p,
      RecallCertSpec(k = 5, nProbe = 4),
      () => { Similarity.certifyIvfIndex(spark, p,
        RecallCertSpec(k = 3, nProbe = 2)); () })
    assert(recall == 1.0) // exhaustive probe over 4 lists
    val cert = Similarity.readRecallCert(spark, p).get
    assert(cert.k == 5 && cert.nProbe == 4,
      s"final cert must be A's geometry: $cert")
    assert(Similarity.requireCertifiedRecall(spark, p, 5, 4, 0.99) == 1.0)
    // no in-progress markers survive either certify
    assert(Option(new java.io.File(p).list()).getOrElse(Array.empty)
      .count(_.endsWith(".inprogress")) == 0)
  }

  test("serving snapshot: a mid-serve mutation of ANY artifact in the " +
      "composed set fails loudly (q175's cross-artifact discipline)") {
    import graft.operators.{Serving, SimGraphIndex}
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val ivf = tmp("snap_ivf")
    val sg = tmp("snap_sg")
    Similarity.buildIvfIndex(emb, ivf, nLists = 4)
    SimGraphIndex.build(docs, "doc_id", "text", sg, 0.8, 3)
    val snap = Serving.resolveServingSnapshot(Seq(ivf, sg))
    // nothing moved: the assertion is a silent pass
    Serving.requireServingSnapshot(snap)
    // ... channels resolve, and then ONE artifact of the set mutates
    // (the q175 hazard window: simgraph delete between the candidate
    // channels' resolution and the serp-dedup's graph read)
    SimGraphIndex.delete(docs.limit(3).select("doc_id"), "doc_id", sg)
    val ex = intercept[IllegalStateException] {
      Serving.requireServingSnapshot(snap)
    }
    assert(ex.getMessage.contains(sg) &&
      ex.getMessage.contains("mutated mid-serve"),
      s"must name the moved artifact: ${ex.getMessage}")
    // a FRESH snapshot over the post-mutation set serves cleanly
    Serving.requireServingSnapshot(
      Serving.resolveServingSnapshot(Seq(ivf, sg)))
  }

  test("QUANTIZED index decision cert (q178): certify -> assert; an " +
      "uncertified append staleness-fails; one cert covers both run forms") {
    val p = tmp("cert_quant")
    val base = emb.filter(col("vec_id") < 400)
    Similarity.buildQuantizedIndex(base, p, nLists = 4)
    // exhaustive geometry: pruned == exact, cert is exactly 1.0
    assert(Dedup.certifyDecisionRecall(spark, p, 0.9, 5, 4) == 1.0)
    assert(Dedup.requireCertifiedDecisionRecall(spark, p, 0.9, 5, 4,
      floor = 0.99) == 1.0)
    // one certificate covers BOTH run forms: at equal (pruned) geometry
    // the int8 filter-refine decisions EQUAL the plain-probe decisions
    // the audit measured (the Δ/2 exactness bound) — assert it directly
    val plain = Dedup.semanticDedupApply(base, "vec_id", "embedding", p,
      0.9, 5, nProbe = 2).orderBy("vec_id").collect()
    val quant = Dedup.semanticDedupApplyQuantized(base, "vec_id",
      "embedding", p, 0.9, 5, nProbe = 2).orderBy("vec_id").collect()
    assert(plain.sameElements(quant),
      "quantized decisions must equal plain-probe decisions at equal geometry")
    // an uncertified QUANTIZED append moves the epoch -> cert goes stale
    Similarity.appendToQuantizedIndex(
      emb.filter(col("vec_id") >= 400 && col("vec_id") < 420), p)
    val ex = intercept[IllegalArgumentException] {
      Dedup.requireCertifiedDecisionRecall(spark, p, 0.9, 5, 4, 0.5)
    }
    assert(ex.getMessage.contains("STALE"))
    // re-certification over the quantized artifact restores serving
    assert(Dedup.certifyDecisionRecall(spark, p, 0.9, 5, 4) == 1.0)
    Dedup.requireCertifiedDecisionRecall(spark, p, 0.9, 5, 4, 0.99)
    ()
  }

  test("decision certify refuses on a mid-audit mutation and cleans up") {
    val p = tmp("cert_race_dec")
    Similarity.buildIvfIndex(emb.filter(col("vec_id") < 400), p, nLists = 4)
    val shard = emb.filter(col("vec_id") >= 400 && col("vec_id") < 420)
    val ex = intercept[IllegalStateException] {
      Dedup.certifyDecisionRecallHooked(spark, p, 0.5, 5, 4,
        () => Similarity.appendToIvfIndex(shard, p))
    }
    assert(ex.getMessage.contains("mutated during decision certification"))
    assert(certGens(p, "decision_cert").isEmpty)
    assert(Dedup.certifyDecisionRecall(spark, p, 0.5, 5, 4) == 1.0)
    assert(Dedup.requireCertifiedDecisionRecall(spark, p, 0.5, 5, 4,
      floor = 0.99) == 1.0)
  }
}
