package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, MaintenanceIo, SimGraphIndex}

/** SimGraphIndex contract: build + disjoint appends must reproduce the
  * full-corpus [[Dedup.exactJaccardJoin]] edge set EXACTLY (the q154
  * oracle proves this on the fixtures; these cases pin the tricky
  * boundaries on constructed docs), the artifact's side tables must stay
  * additive, and the append must take its geometry from the built meta —
  * never from the caller.
  */
class SimGraphIndexSpec extends SparkSpec {

  import spark.implicits._

  // near-dup families engineered across the build/append boundary:
  //  - 1 & 2: exact dups inside the build corpus
  //  - 3: unique standing doc
  //  - 10: exact dup of 1 arriving in shard A (new-old edge, J = 1)
  //  - 11 & 12: exact dups of each other inside shard B (new-new edge)
  //  - 13: near-dup of 3 (one token changed) in shard B
  //  - 20: a 2-token doc (empty shingle set at w=3 — must be inert)
  //  - 21: NULL text (inert)
  private def docs: DataFrame = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta"),
    (3L, "one two three four five six seven eight nine"),
    (10L, "alpha beta gamma delta epsilon zeta eta theta"),
    (11L, "red orange yellow green blue indigo violet"),
    (12L, "red orange yellow green blue indigo violet"),
    (13L, "one two three four five six seven eight ten"),
    (20L, "too short"),
    (21L, null)
  ).toDF("doc_id", "text")

  private def edgeSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("build + two appends == full-corpus exact join (boundary families)") {
    val path = Files.createTempDirectory("simidx").toString
    val standing = docs.filter(col("doc_id") < 10)
    SimGraphIndex.build(standing, "doc_id", "text", path,
      threshold = 0.6, shingleWidth = 3)
    SimGraphIndex.append(docs.filter(col("doc_id") === 10L),
      "doc_id", "text", path)
    SimGraphIndex.append(
      docs.filter(col("doc_id") >= 11L), "doc_id", "text", path)

    val got = edgeSet(SimGraphIndex.edges(spark, path))
    val want = edgeSet(
      Dedup.exactJaccardJoin(docs, "doc_id", "text", 0.6, 3))
    assert(got == want, s"incremental $got != full $want")
    // the engineered families actually exercised the boundaries
    assert(want.exists { case (a, b, j) => a == 1L && b == 10L && j == 1.0 },
      "new-old exact-dup edge missing from the full join itself")
    assert(want.exists { case (a, b, _) => a == 11L && b == 12L },
      "new-new within-shard edge missing")
    assert(want.exists { case (a, b, j) => a == 3L && b == 13L && j < 1.0 },
      "near-dup (non-1.0) edge missing")
    assert(!want.exists { case (a, b, _) => a == 20L || b == 20L || b == 21L },
      "sub-width/NULL docs must be inert")
  }

  test("df side table stays additive across appends") {
    val path = Files.createTempDirectory("simidx2").toString
    SimGraphIndex.build(docs.filter(col("doc_id") < 10), "doc_id", "text",
      path, threshold = 0.6)
    SimGraphIndex.append(docs.filter(col("doc_id") >= 10L),
      "doc_id", "text", path)
    val snap = MaintenanceIo.snapshot(path)
    val stored = spark.read.parquet(snap("dfreq"))
      .groupBy("h").agg(sum("df").as("df"))
    val truth = spark.read.parquet(snap("postings"))
      .groupBy("h").agg(count(lit(1)).as("df"))
    assert(stored.join(truth, Seq("h"), "full_outer")
      .filter(!(stored("df") <=> truth("df"))).isEmpty,
      "summed dfreq rows must equal postings-derived document frequency")
  }

  test("append geometry comes from the built meta, epoch advances") {
    val path = Files.createTempDirectory("simidx3").toString
    SimGraphIndex.build(docs.filter(col("doc_id") < 10), "doc_id", "text",
      path, threshold = 0.9, shingleWidth = 4)
    val m0 = MaintenanceIo.requireManifest(path)
    val meta = spark.read.parquet(s"$path/${m0.tables("meta")}").head()
    assert(meta.getAs[Long]("t6") == 900000L && meta.getAs[Int]("w") == 4)
    SimGraphIndex.append(docs.filter(col("doc_id") === 10L),
      "doc_id", "text", path)
    assert(MaintenanceIo.requireManifest(path).epoch == m0.epoch + 1)
    // at w=4 and t=0.9 the 1~10 exact-dup edge must still appear — i.e.
    // the append really shingled at the BUILT width, not a default
    val got = edgeSet(SimGraphIndex.edges(spark, path))
    assert(got.exists { case (a, b, j) => a == 1L && b == 10L && j == 1.0 })
  }

  test("delete hides incident edges; compact drops rows; re-append works") {
    val path = Files.createTempDirectory("simidx4").toString
    SimGraphIndex.build(docs.filter(col("doc_id") < 10), "doc_id", "text",
      path, threshold = 0.6)
    SimGraphIndex.append(docs.filter(col("doc_id") >= 10L),
      "doc_id", "text", path)
    val before = edgeSet(SimGraphIndex.edges(spark, path))
    assert(before.exists { case (a, b, _) => a == 1L && b == 10L })

    // takedown doc 10: every incident edge disappears, others survive
    SimGraphIndex.delete(Seq(10L).toDF("doc_id"), "doc_id", path)
    val after = edgeSet(SimGraphIndex.edges(spark, path))
    assert(after == before.filterNot { case (a, b, _) =>
      a == 10L || b == 10L })
    assert(after.exists { case (a, b, _) => a == 11L && b == 12L },
      "unrelated edges must survive the takedown")

    // compact: physically dropped, reader unchanged, tombstones empty,
    // dfreq re-agrees with surviving postings
    SimGraphIndex.compact(spark, path)
    assert(edgeSet(SimGraphIndex.edges(spark, path)) == after)
    val snap = MaintenanceIo.snapshot(path)
    assert(spark.read.parquet(snap("tombstones")).isEmpty)
    assert(spark.read.parquet(snap("sets"))
      .filter(col("doc_id") === 10L).isEmpty,
      "compacted sets must not carry the dead doc")
    val stored = spark.read.parquet(snap("dfreq"))
      .groupBy("h").agg(sum("df").as("df"))
    val truth = spark.read.parquet(snap("postings"))
      .groupBy("h").agg(count(lit(1)).as("df"))
    assert(stored.join(truth, Seq("h"), "full_outer")
      .filter(!(stored("df") <=> truth("df"))).isEmpty)

    // the recrawl: after compact the id is physically gone, so
    // re-appending it is a plain new-doc append — edges come back
    SimGraphIndex.append(docs.filter(col("doc_id") === 10L),
      "doc_id", "text", path)
    assert(edgeSet(SimGraphIndex.edges(spark, path)) == before,
      "re-append after compact must restore the original graph")
  }

  test("append is crash-atomic: published dirs never mutate, a simulated " +
      "crash leaves readers on the pre-append graph, retry == rebuild") {
    val path = Files.createTempDirectory("simidx_atomic").toString
    SimGraphIndex.build(docs.filter(col("doc_id") < 10), "doc_id", "text",
      path, threshold = 0.6)
    val m0 = MaintenanceIo.requireManifest(path)
    def dirSig(gen: String): Seq[(String, Long)] =
      Option(new java.io.File(s"$path/$gen").listFiles())
        .getOrElse(Array.empty).map(f => f.getName -> f.length)
        .toSeq.sortBy(_._1)
    val sigs0 = m0.tables.map { case (k, g) => k -> dirSig(g) }
    val before = edgeSet(SimGraphIndex.edges(spark, path))

    // a crashed append = quad dirs on disk, manifest untouched. Emulate
    // one (junk content — a real crash can leave any bytes) and assert
    // readers resolve the pre-append graph regardless.
    for (t <- Seq("sets", "postings", "dfreq", "edges")) {
      val d = new java.io.File(s"$path/$t.a0.e1"); d.mkdirs()
      Files.writeString(d.toPath.resolve("part-torn.parquet"), "torn")
    }
    assert(edgeSet(SimGraphIndex.edges(spark, path)) == before,
      "orphan quad dirs must be invisible to readers")

    // the retry: recomputes, overwrites the orphans, publishes once
    SimGraphIndex.append(docs.filter(col("doc_id") >= 10L),
      "doc_id", "text", path)
    val want = edgeSet(
      Dedup.exactJaccardJoin(docs, "doc_id", "text", 0.6, 3))
    assert(edgeSet(SimGraphIndex.edges(spark, path)) == want,
      "retried append must equal the from-scratch rebuild")
    // every directory the PRE-append manifest referenced is byte-stable —
    // the append never wrote into a published generation
    val m1 = MaintenanceIo.requireManifest(path)
    for ((k, g) <- m0.tables)
      assert(dirSig(g) == sigs0(k), s"append mutated published dir $g")
    assert(m1.tables.keys.count(_.matches("""sets\.a\d+""")) == 1,
      "append must land as its own generation quad")
  }

  test("append verifies at the EXACT built threshold, not the floor-" +
      "quantized t6/1e6 (boundary pair)") {
    // threshold 0.7000004 floor-quantizes to t6=700000 → 0.7; the pair
    // below has jaccard EXACTLY 0.7 (|∩|=7, |∪|=10), which the quantized
    // reconstruction would admit but the built threshold rejects. The
    // integer prefix/size filters still surface the pair as a candidate
    // (sizes 8 vs 9, well inside the t6 band), so the case isolates the
    // verify comparison itself.
    val a = (1 to 10).map(i => s"a$i").mkString(" ")              // 8 shingles
    val b = ((1 to 9).map(i => s"a$i") ++ Seq("x", "y")).mkString(" ") // 9, ∩=7
    val path = Files.createTempDirectory("simidx_t").toString
    SimGraphIndex.build(Seq((1L, a)).toDF("doc_id", "text"),
      "doc_id", "text", path, threshold = 0.7000004)
    SimGraphIndex.append(Seq((2L, b)).toDF("doc_id", "text"),
      "doc_id", "text", path)
    assert(edgeSet(SimGraphIndex.edges(spark, path)).isEmpty,
      "J=0.7 must NOT pass the 0.7000004 gate on the append path")
    // agreement with the from-scratch rebuild at the same threshold
    assert(edgeSet(Dedup.exactJaccardJoin(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"),
      "doc_id", "text", 0.7000004, 3)).isEmpty)
    // positive control: at exactly 0.7 the same append admits the pair
    val path2 = Files.createTempDirectory("simidx_t2").toString
    SimGraphIndex.build(Seq((1L, a)).toDF("doc_id", "text"),
      "doc_id", "text", path2, threshold = 0.7)
    SimGraphIndex.append(Seq((2L, b)).toDF("doc_id", "text"),
      "doc_id", "text", path2)
    assert(edgeSet(SimGraphIndex.edges(spark, path2)) ==
      Set((1L, 2L, 0.7)), "J=0.7 must pass the exact-0.7 gate")
  }

  test("delete is snapshot-isolated: a reader resolved pre-delete never " +
      "observes the deletion; re-append of a tombstoned id throws until " +
      "compact") {
    val path = Files.createTempDirectory("simidx_del").toString
    SimGraphIndex.build(docs.filter(col("doc_id") < 10), "doc_id", "text",
      path, threshold = 0.6)
    SimGraphIndex.append(docs.filter(col("doc_id") >= 10L),
      "doc_id", "text", path)
    val before = edgeSet(SimGraphIndex.edges(spark, path))
    // resolve a reader's frame (manifest snapshot taken NOW, lazily
    // evaluated after the delete lands)
    val inFlight = SimGraphIndex.edges(spark, path)
    SimGraphIndex.delete(Seq(10L).toDF("doc_id"), "doc_id", path)
    assert(edgeSet(inFlight) == before,
      "in-flight reader must see the exact pre-delete graph " +
        "(tombstones land as a fresh generation, old one on grace)")
    assert(edgeSet(SimGraphIndex.edges(spark, path)) ==
      before.filterNot { case (x, y, _) => x == 10L || y == 10L })

    // the re-append contract: tombstoned id rejected until compact
    val ex = intercept[IllegalArgumentException] {
      SimGraphIndex.append(docs.filter(col("doc_id") === 10L),
        "doc_id", "text", path)
    }
    assert(ex.getMessage.contains("tombstoned"))
    SimGraphIndex.compact(spark, path)
    SimGraphIndex.append(docs.filter(col("doc_id") === 10L),
      "doc_id", "text", path)
    assert(edgeSet(SimGraphIndex.edges(spark, path)) == before,
      "re-append after compact must restore the original graph")
  }

  test("appendBatch: replay-idempotent, compact folds batch generations") {
    val path = Files.createTempDirectory("simidx5").toString
    SimGraphIndex.build(docs.filter(col("doc_id") < 10), "doc_id", "text",
      path, threshold = 0.6)
    SimGraphIndex.appendBatch(docs.filter(col("doc_id") === 10L),
      "doc_id", "text", path, batchId = 0L)
    SimGraphIndex.appendBatch(docs.filter(col("doc_id") >= 11L),
      "doc_id", "text", path, batchId = 1L)
    val want = edgeSet(
      Dedup.exactJaccardJoin(docs, "doc_id", "text", 0.6, 3))
    assert(edgeSet(SimGraphIndex.edges(spark, path)) == want,
      "batch appends must reproduce the full join")
    // a committed-batch replay (crash between publish and checkpoint
    // commit) rewrites its own generations and changes NOTHING
    SimGraphIndex.appendBatch(docs.filter(col("doc_id") >= 11L),
      "doc_id", "text", path, batchId = 1L)
    val e1 = SimGraphIndex.edges(spark, path)
    assert(edgeSet(e1) == want, "replayed batch must be a no-op")
    assert(e1.count() == want.size,
      "replay must not leave duplicate edge ROWS either")
    // compact folds the batch quads into fresh singles; dirs GC away
    SimGraphIndex.compact(spark, path)
    assert(edgeSet(SimGraphIndex.edges(spark, path)) == want)
    assert(!MaintenanceIo.requireManifest(path).tables.keys
      .exists(_.contains(".b")), "compact must drop batch generations")
  }
}
