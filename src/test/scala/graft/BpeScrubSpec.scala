package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Pins the round-11 text-pipeline additions: BPE merge application (the
  * fold the engine AND the oracle's bracket-encoded replace() must agree
  * on), BPE training on a hand-computed corpus, and the duplicate-gram
  * scrub on a planted fixture where the expected rewrite is known.
  */
class BpeScrubSpec extends SparkSpec {
  import spark.implicits._

  private def merge(syms: Seq[String], a: String, b: String): Seq[String] =
    Seq(syms).toDF("syms")
      .select(Bpe.applyMerge(col("syms"), a, b).as("m"))
      .as[Seq[String]].head()

  test("applyMerge: leftmost non-overlapping on [a,a,a]") {
    assert(merge(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
  }

  test("applyMerge: adjacent occurrences both merge on [a,b,a,b]") {
    assert(merge(Seq("a", "b", "a", "b"), "a", "b") === Seq("ab", "ab"))
  }

  test("applyMerge: merged symbol does not cascade within the round") {
    // after (a,b)->ab, the following b must NOT merge again
    assert(merge(Seq("a", "b", "b"), "a", "b") === Seq("ab", "b"))
    // and four in a row pair up twice, not chain
    assert(merge(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
  }

  test("applyMerge: no-op when the pair is absent") {
    assert(merge(Seq("x", "y"), "a", "b") === Seq("x", "y"))
  }

  test("trainMerges learns the hand-computed sequence") {
    // corpus: low low low lower lower newest  (classic Sennrich example
    // shape). Word table: low×3, lower×2, newest×1. Round-1 pairs:
    // (l,o)=5, (o,w)=5, (w,</w>)=3, (w,e)=2, (e,r)=2, (r,</w>)=2,
    // (n,e)=1 ... tie (l,o)/(o,w) at 5 -> lexicographic: (l,o) wins.
    // Round 2: (lo,w)=5 wins. Round 3: (low,</w>)=3.
    val docs = Seq("low low low lower lower newest").toDF("text")
    val merges = Bpe.trainMerges(Bpe.wordFreq(docs, "text"), 3)
    assert(merges.map(m => (m.rank, m.lhs, m.rhs, m.pairCount)) === Seq(
      (1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "low", "</w>", 3L)))
  }

  test("dup-gram scrub removes exactly the planted duplicated span") {
    // two docs share one 8-token span; a third is untouched. Tokens
    // u1..u8 / v1..v8 are unique fillers, d1..d8 the duplicated span.
    val d = (1 to 8).map(i => s"d$i").mkString(" ")
    val docs = Seq(
      (0L, s"u1 u2 u3 u4 u5 u6 u7 u8 $d"),
      (1L, s"$d v1 v2 v3 v4 v5 v6 v7 v8"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9")
    ).toDF("doc_id", "text")
    val out = scrub(docs).orderBy("doc_id")
      .select("doc_id", "n_removed", "clean_text")
      .as[(Long, Long, String)].collect()
    assert(out(0) === ((0L, 8L, "u1 u2 u3 u4 u5 u6 u7 u8")))
    assert(out(1) === ((1L, 8L, "v1 v2 v3 v4 v5 v6 v7 v8")))
    assert(out(2) === ((2L, 0L, "w1 w2 w3 w4 w5 w6 w7 w8 w9")))
  }

  test("dup-gram scrub counts within-doc repetition as duplication") {
    // one doc repeats its own 8-gram: both occurrences are scrubbed
    // (corpus-wide occurrence count >= 2, Lee et al. semantics)
    val d = (1 to 8).map(i => s"r$i").mkString(" ")
    val docs = Seq((0L, s"$d x1 $d")).toDF("doc_id", "text")
    val out = scrub(docs).select("n_tok", "n_kept", "clean_text")
      .as[(Long, Long, String)].head()
    assert(out === ((17L, 1L, "x1")))
  }

  test("persisted vocab: syms reconstruct each word, encode matches, " +
      "OOV falls back to characters") {
    val dir = java.nio.file.Files.createTempDirectory("bpevocab").toString
    val docs = Seq("low low low lower lower newest").toDF("text")
    Bpe.trainAndWriteVocab(Bpe.wordFreq(docs, "text"), 3, s"$dir/vocab")
    // round-trip invariant: concat(syms) == word + </w> for every row
    val bad = spark.read.parquet(s"$dir/vocab")
      .select(col("word"), concat_ws("", col("syms")).as("joined"))
      .filter(col("joined") =!= concat(col("word"), lit(Bpe.EndOfWord)))
      .count()
    assert(bad === 0)
    // after merges (l,o),(lo,w),(low,</w>): low -> [low</w>] = 1 symbol;
    // lower -> [low,e,r,</w>] = 4; newest untouched = 7 chars + marker.
    // "qqq" is OOV -> fallback len+1 = 4.
    val enc = Bpe.encodeCounts(
        Seq((0L, "low lower newest qqq")).toDF("doc_id", "text"),
        "doc_id", "text", s"$dir/vocab")
      .select("n_ws", "n_bpe").as[(Long, Long)].head()
    assert(enc === ((4L, 1L + 4L + 7L + 4L)))
  }

  /** The q94 pipeline against an arbitrary (doc_id, text) frame. */
  private def scrub(docs: org.apache.spark.sql.DataFrame) = {
    val q = SparkEntry.queries("q94_dup_gram_scrub")
    val dir = java.nio.file.Files
      .createTempDirectory("scrubspec").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // the other tables aren't touched by q94; documents alone suffices
    q(spark, dir)
  }
}
