package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, MaintenanceIo, Similarity}

/** The manifest-pointer maintenance layer's safety claims (round-12
  * verdict #3 / advice #1), proved against the real index operators:
  * readers racing a compaction, writers racing each other, and a crash
  * at the worst instant all leave a valid, correct artifact.
  */
class MaintenanceIoSpec extends SparkSpec {

  test("queries racing a compaction never fail and never see a mix") {
    val emb = Tables.embeddings(spark, sf0001)
    val idx = java.nio.file.Files.createTempDirectory("race_cq").toString
    Similarity.buildIvfIndex(emb, idx, nLists = 8)
    Similarity.deleteFromIvfIndex(emb.filter(col("vec_id") % 7 === 2), idx)
    val queries = emb.filter(col("vec_id") < 5)
    def res() = Similarity.ivfTopKFromIndex(idx, queries, k = 5, nProbe = 8)
      .orderBy("q_id", "rn").collect().toSeq
    val expected = res() // the LIVE answer — identical pre/post compact
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          if (res() != expected)
            errors.add(new AssertionError("reader saw a mixed snapshot"))
        } catch { case t: Throwable => errors.add(t) }
      }
    })
    reader.start()
    try {
      Similarity.compactIvfIndex(spark, idx)
      assert(res() == expected)
    } finally { stop.set(true); reader.join(60000) }
    assert(errors.isEmpty,
      s"racing reader failed: ${Option(errors.peek()).map(_.toString)}")
  }

  test("concurrent compactors serialize on the maintenance lock") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
      .filter(col("doc_id") < 2000)
    val ldx = java.nio.file.Files.createTempDirectory("race_cc").toString
    Dedup.writeLshBandIndex(docs, "doc_id", "text", ldx)
    Dedup.deleteFromLshBandIndex(
      docs.filter(col("doc_id") % 5 === 0), "doc_id", ldx)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val ts = (1 to 2).map(_ => new Thread(() =>
      try Dedup.compactLshBandIndex(spark, ldx)
      catch { case t: Throwable => errors.add(t) }))
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    assert(errors.isEmpty, s"concurrent compact failed: ${errors.peek()}")
    // one winner compacted; the loser found no tombstones and no-opped
    assert(MaintenanceIo.snapshot(ldx).get("tombstones").isEmpty)
    assert(spark.read.parquet(MaintenanceIo.snapshot(ldx)("bands"))
      .filter(col("id") % 5 === 0).isEmpty)
  }

  test("a crash after writing a generation but before publish is invisible" +
      " and the orphan is GC'd by the next successful mutation") {
    val emb = Tables.embeddings(spark, sf0001).filter(col("vec_id") < 500)
    val idx = java.nio.file.Files.createTempDirectory("crash_gen").toString
    Similarity.buildIvfIndex(emb, idx, nLists = 4)
    val before = MaintenanceIo.snapshot(idx)("assignments")
    // simulate the crash: a compaction that wrote its rewrite and died
    // before the manifest swap — on disk but unreferenced
    val orphan = s"$idx/${MaintenanceIo.nextGen(idx, "assignments")}"
    spark.read.parquet(before).limit(1).write.parquet(orphan)
    assert(MaintenanceIo.snapshot(idx)("assignments") == before,
      "an unpublished generation must be invisible to readers")
    // next successful mutation GCs it (it is in neither manifest)
    Similarity.deleteFromIvfIndex(emb.filter(col("vec_id") === 1L), idx)
    assert(!new java.io.File(orphan).exists(),
      "orphaned generation survived the next publish's GC")
    // (nextGen scans the filesystem, so while the orphan EXISTS its
    // number is never reused for a fresh write; after GC, reuse is fine)
  }

  test("publish keeps a grace generation for in-flight readers, and " +
      "exactly one") {
    val emb = Tables.embeddings(spark, sf0001).filter(col("vec_id") < 500)
    val idx = java.nio.file.Files.createTempDirectory("grace").toString
    Similarity.buildIvfIndex(emb, idx, nLists = 4)
    val g0 = MaintenanceIo.snapshot(idx)("assignments")
    Similarity.deleteFromIvfIndex(emb.filter(col("vec_id") % 3 === 0), idx)
    Similarity.compactIvfIndex(spark, idx)
    val g1 = MaintenanceIo.snapshot(idx)("assignments")
    assert(g1 != g0)
    assert(new java.io.File(g0).exists(),
      "the superseded generation must survive one publish (reader grace)")
    Similarity.deleteFromIvfIndex(emb.filter(col("vec_id") % 5 === 0), idx)
    Similarity.compactIvfIndex(spark, idx)
    val g2 = MaintenanceIo.snapshot(idx)("assignments")
    assert(new java.io.File(g1).exists(), "grace must cover the previous")
    assert(!new java.io.File(g0).exists(),
      "two-generations-old dirs must be GC'd (disk stays bounded at ~2x)")
    assert(g2 != g1)
  }

  test("MANIFEST exists at every instant of a publish (no reader window)") {
    val idx = java.nio.file.Files.createTempDirectory("pub").toString
    MaintenanceIo.withMaintenanceLock(idx) {
      MaintenanceIo.publish(idx,
        MaintenanceIo.Manifest(0L, Map("bloom" -> "bloom.g0")))
    }
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val reader = new Thread(() => {
      while (!stop.get()) {
        try MaintenanceIo.requireManifest(idx)
        catch { case t: Throwable => errors.add(t) }
      }
    })
    reader.start()
    try {
      (1 to 200).foreach { i =>
        MaintenanceIo.withMaintenanceLock(idx) {
          MaintenanceIo.publish(idx,
            MaintenanceIo.Manifest(i.toLong, Map("bloom" -> s"bloom.g$i")))
        }
      }
    } finally { stop.set(true); reader.join(60000) }
    assert(errors.isEmpty, s"reader hit a manifest gap: ${errors.peek()}")
    assert(MaintenanceIo.requireManifest(idx).epoch == 200L)
  }
}
