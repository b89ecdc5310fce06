package graft

import org.apache.spark.sql.functions._

import graft.operators.InvertedIndex

/** Laws of the persisted inverted index (q130's operator): the
  * build+append round trip is lossless, the term probe statically prunes
  * the bucket-partitioned postings scan, and the scoring plan stays in
  * the broadcast regime.
  */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("build+append over a split equals one fresh build, score for score") {
    val docs = Tables.documents(spark, sf0001)
    val terms = Seq("spark", "join", "filter")
    val whole = freshDir("inv_whole")
    InvertedIndex.buildIndex(docs, whole)
    val split = freshDir("inv_split")
    InvertedIndex.buildIndex(docs.filter(col("doc_id") % 4 =!= 1), split)
    InvertedIndex.appendToIndex(docs.filter(col("doc_id") % 4 === 1), split)
    def top(p: String) =
      InvertedIndex.bm25FromIndex(spark, p, terms)
        .orderBy(col("score").desc, col("doc_id"))
        .as[(Long, Double, Long)].collect().toSeq
    val a = top(whole)
    val b = top(split)
    assert(a.nonEmpty, "fixture must score at least one doc")
    assert(a == b, s"append drifted from fresh build: ${a.take(3)} vs ${b.take(3)}")
    // append bumped the epoch; build starts at 0
    assert(graft.operators.MaintenanceIo.requireManifest(whole).epoch == 0L)
    assert(graft.operators.MaintenanceIo.requireManifest(split).epoch == 1L)
  }

  test("term probe statically prunes the postings scan to probed buckets") {
    val docs = Tables.documents(spark, sf0001)
    val idx = freshDir("inv_prune")
    InvertedIndex.buildIndex(docs, idx)
    val df = InvertedIndex.bm25FromIndex(spark, idx, Seq("spark"))
    df.write.format("noop").mode("overwrite").save()
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("postings"))
      .getOrElse(fail("no postings scan in the plan"))
    // one term -> exactly one pb literal in the partition filter; the
    // scan must carry it as a PartitionFilters entry (static pruning —
    // no job reads the other 63 buckets' files)
    assert(scan.contains("PartitionFilters") && scan.contains("pb"),
      s"postings scan lost its partition filter:\n$scan")
    // and the plan joins df/stats via broadcast, never an exchange of
    // the postings side for those lookups
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      "df/stats lookups must broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("delete shadows docs and live-corpus stats; compact is a no-op " +
      "on results; re-append-after-delete resurrects without compacting") {
    val docs = Tables.documents(spark, sf0001)
    val terms = Seq("spark", "join")
    def top(p: String) =
      InvertedIndex.bm25FromIndex(spark, p, terms)
        .orderBy(col("score").desc, col("doc_id"))
        .as[(Long, Double, Long)].collect().toSeq
    // ground truth: an index built on the live subset only
    val truth = freshDir("inv_truth")
    InvertedIndex.buildIndex(docs.filter(col("doc_id") % 5 =!= 2), truth)
    val want = top(truth)
    // lifecycle: full build, then tombstone the %5==2 docs
    val idx = freshDir("inv_del")
    InvertedIndex.buildIndex(docs, idx)
    InvertedIndex.deleteFromIndex(
      docs.filter(col("doc_id") % 5 === 2).select("doc_id"), idx)
    assert(top(idx) == want,
      "tombstoned index must score exactly like a live-only build")
    // compact: same result, tombstones and delta rows retired
    InvertedIndex.compactIndex(spark, idx)
    assert(top(idx) == want, "compaction changed scores")
    val snap = graft.operators.MaintenanceIo.snapshot(idx)
    assert(!snap.contains("tombstones"), "compact must retire tombstones")
    val dfRows = spark.read.parquet(snap("df"))
    assert(dfRows.filter(col("df") <= 0L).count() == 0,
      "compact must fold negative df deltas away")
    assert(spark.read.parquet(snap("stats")).count() == 1,
      "compact must collapse stats to one row")
    // re-append a deleted doc WITHOUT compacting: epoch beats tombstone
    val idx2 = freshDir("inv_reapp")
    InvertedIndex.buildIndex(docs, idx2)
    InvertedIndex.deleteFromIndex(
      docs.filter(col("doc_id") % 5 === 2).select("doc_id"), idx2)
    InvertedIndex.appendToIndex(docs.filter(col("doc_id") % 5 === 2), idx2)
    val full = freshDir("inv_full")
    InvertedIndex.buildIndex(docs, full)
    assert(top(idx2) == top(full),
      "re-appended docs must score exactly like a never-deleted corpus")
  }

  test("batch generations: replay is byte-idempotent, compact folds them, " +
      "and deletes compose with batch-appended docs") {
    val docs = Tables.documents(spark, sf0001)
    val terms = Seq("spark", "join")
    def top(p: String) =
      InvertedIndex.bm25FromIndex(spark, p, terms)
        .orderBy(col("score").desc, col("doc_id"))
        .as[(Long, Double, Long)].collect().toSeq
    val full = freshDir("inv_bfull")
    InvertedIndex.buildIndex(docs, full)
    val want = top(full)
    val idx = freshDir("inv_bgen")
    InvertedIndex.buildIndex(docs.filter(col("doc_id") % 3 === 0), idx)
    InvertedIndex.appendBatchToIndex(
      docs.filter(col("doc_id") % 3 === 1), idx, batchId = 0L)
    InvertedIndex.appendBatchToIndex(
      docs.filter(col("doc_id") % 3 === 2), idx, batchId = 1L)
    assert(top(idx) == want, "batch-gen build must equal a fresh build")
    val manifestBefore = graft.operators.MaintenanceIo.requireManifest(idx)
    // replay batch 1: identical manifest, identical scores (tf/df/stats
    // must NOT double-count — the at-least-once hazard)
    InvertedIndex.appendBatchToIndex(
      docs.filter(col("doc_id") % 3 === 2), idx, batchId = 1L)
    assert(graft.operators.MaintenanceIo.requireManifest(idx)
      == manifestBefore, "replay must republish an identical manifest")
    assert(top(idx) == want, "replay drifted the scores")
    // a delete layered over batch generations sees batch-appended docs
    InvertedIndex.deleteFromIndex(
      docs.filter(col("doc_id") % 5 === 2).select("doc_id"), idx)
    val liveOnly = freshDir("inv_blive")
    InvertedIndex.buildIndex(docs.filter(col("doc_id") % 5 =!= 2), liveOnly)
    assert(top(idx) == top(liveOnly),
      "delete must shadow batch-gen docs and shrink stats")
    // compact: batch + tombstone entries fold away, result identical
    InvertedIndex.compactIndex(spark, idx)
    val m = graft.operators.MaintenanceIo.requireManifest(idx)
    assert(m.tables.keySet == Set("postings", "df", "stats"),
      s"compact must retire batch gens and tombstones: ${m.tables.keySet}")
    assert(top(idx) == top(liveOnly), "compaction changed scores")
  }

  test("NULL-text docs contribute no postings and no stats row") {
    val docs = Seq((1L, "alpha beta alpha"), (2L, "beta"))
      .toDF("doc_id", "text")
      .unionByName(Seq(Tuple1(3L)).toDF("doc_id")
        .withColumn("text", lit(null).cast("string")))
    val idx = freshDir("inv_null")
    InvertedIndex.buildIndex(docs, idx)
    val snap = graft.operators.MaintenanceIo.snapshot(idx)
    val stats = spark.read.parquet(snap("stats"))
      .as[(Long, Long)].collect().head
    assert(stats == ((2L, 4L)), s"stats must skip NULL text: $stats")
    val post = spark.read.parquet(snap("postings"))
      .select("tok", "doc_id", "tf", "dl")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(post == Set(("alpha", 1L, 2L, 3L), ("beta", 1L, 1L, 3L),
      ("beta", 2L, 1L, 1L)))
  }
}
