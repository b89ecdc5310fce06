package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Bloom-gated exact-dedup ingest admission (q101's operator pair):
  * build-once [[Dedup.buildExactBloom]] + per-shard [[Dedup.bloomAdmit]].
  *
  * The laws that make the pipeline EXACT (not approximate):
  *   - no false negatives: a key the filter has seen always probes true,
  *     so every true duplicate reaches the verify join and is dropped —
  *     at ANY filter size, including a pathologically undersized one;
  *   - false positives are verified away: an undersized filter (1 bit
  *     per key) sends most of the shard through the verify join, and the
  *     admitted set STILL equals the NOT IN truth.
  */
class BloomIngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    new java.io.File(s"target/tmp/bloom_$name").getAbsolutePath

  private val corpusDocs: Seq[(Long, String)] =
    (1L to 200L).map(i => i -> s"corpus document number $i with body ${i * 7}")
  private val dupSlice: Seq[(Long, String)] =
    corpusDocs.filter(_._1 % 3 == 0).map { case (i, t) => (1000L + i, t) }
  private val newSlice: Seq[(Long, String)] =
    (2001L to 2060L).map(i => i -> s"fresh shard document $i never seen")

  private def corpus: DataFrame = corpusDocs.toDF("doc_id", "text")
  private def shard: DataFrame = (dupSlice ++ newSlice).toDF("doc_id", "text")

  private def admittedIds(bitsPerKey: Int, name: String): Seq[Long] = {
    val path = tmp(name)
    Dedup.buildExactBloom(corpus, "text", path, bitsPerKey = bitsPerKey)
    Dedup.bloomAdmit(corpus, shard, "text", path)
      .select("doc_id").as[Long].collect().sorted.toSeq
  }

  private val truth: Seq[Long] = {
    val corpusTexts = corpusDocs.map(_._2).toSet
    (dupSlice ++ newSlice).filterNot { case (_, t) => corpusTexts(t) }
      .map(_._1).sorted
  }

  test("admitted set equals the NOT IN truth at the production geometry") {
    assert(truth.nonEmpty && truth.size < dupSlice.size + newSlice.size)
    assert(admittedIds(bitsPerKey = 10, "prod") == truth)
  }

  test("undersized filter (1 bit/key, FP-heavy) is still exact") {
    // with ~200 keys in ~200 bits most probes collide: the verify join is
    // doing nearly all the work, and must reject every false positive
    assert(admittedIds(bitsPerKey = 1, "tiny") == truth)
  }

  test("no false negatives: every exact duplicate is dropped at any size") {
    for ((bits, name) <- Seq(1 -> "fn1", 10 -> "fn10")) {
      val admitted = admittedIds(bits, name).toSet
      assert(dupSlice.forall { case (id, _) => !admitted(id) },
        s"a true duplicate was admitted at bitsPerKey=$bits")
    }
  }

  test("nfc flag travels IN the artifact: probes key exactly as built") {
    val path = tmp("nfc")
    val composed = "caf\u00e9 menu listing"   // e-acute composed
    val decomposed = "cafe\u0301 menu listing" // e + combining acute
    val c = Seq((1L, composed)).toDF("doc_id", "text")
    val sh = Seq((10L, decomposed), (11L, "unrelated text")).toDF("doc_id", "text")
    Dedup.buildExactBloom(c, "text", path, nfc = true)
    // the probe reads the key scheme FROM the artifact (round-11 advice:
    // a build(nfc=true)+probe(nfc=false) divergence used to be possible
    // and silently produced false negatives) \u2014 no nfc parameter exists on
    // the probe side anymore. Verify matches on the raw key column, so
    // normalization must be applied by the CALLER's keying convention on
    // both sides; assert the bloom probe alone already collapses the
    // twins, and a raw-keyed artifact keeps them distinct.
    val probedTogether = Dedup.bloomAdmit(c,
        sh.withColumn("text", graft.functions.TextFunctions.nfcNormalize(col("text"))),
        "text", path)
      .select("doc_id").as[Long].collect().toSet
    assert(probedTogether == Set(11L))
    val pathRaw = tmp("nfcraw")
    Dedup.buildExactBloom(c, "text", pathRaw, nfc = false)
    val rawAdmitted = Dedup.bloomAdmit(c, sh, "text", pathRaw)
      .select("doc_id").as[Long].collect().toSet
    assert(rawAdmitted == Set(10L, 11L))
  }

  test("NULL keys are admitted explicitly, never silently dropped") {
    // xxhash64(NULL) is NULL, so might-contain is NULL \u2014 before the
    // round-11 advice fix such rows failed BOTH branch filters and
    // vanished from the output. Anti-join semantics (NULL matches no
    // corpus key) say admit.
    val path = tmp("nullkey")
    Dedup.buildExactBloom(corpus, "text", path)
    val sh = Seq((10L, Option("corpus document number 3 with body 21")),
        (11L, None: Option[String]),
        (12L, Option("a genuinely new document")))
      .toDF("doc_id", "text")
    val admitted = Dedup.bloomAdmit(corpus, sh, "text", path)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(11L, 12L),
      s"NULL-key row must be admitted, dup dropped: got $admitted")
  }

  test("appendToExactBloom: shard keys fold in, geometry preserved, " +
      "admission stays exact") {
    val path = tmp("append")
    Dedup.buildExactBloom(corpus, "text", path)
    val extra = (3001L to 3040L).map(i => i -> s"appended corpus doc $i")
    Dedup.appendToExactBloom(extra.toDF("doc_id", "text"), "text", path)
    val row = Dedup.readBloomArtifact(spark, path)
    assert(row.getAs[Long]("n_keys") == 240L, "key count must accrue")
    assert(row.getAs[Long]("cap") == 200L,
      "built capacity must NOT accrue (hash sizing would drift and make " +
        "later appends unmergeable)")
    assert(row.getAs[Long]("num_bits") == 2000L, "geometry must not change")
    // a shard of: a dup of the ORIGINAL corpus, a dup of an APPENDED
    // key, and a genuinely new doc — only the new doc admits
    val standing = corpus.unionAll(extra.toDF("doc_id", "text"))
    val sh = Seq(5001L -> corpusDocs.head._2, 5002L -> extra.head._2,
        5003L -> "a never seen shard document")
      .toDF("doc_id", "text")
    val admitted = Dedup.bloomAdmit(standing, sh, "text", path)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(5003L),
      s"append must catch both old and appended dups: got $admitted")
  }

  test("artifact records the build geometry and key scheme") {
    val path = tmp("geom")
    Dedup.buildExactBloom(corpus, "text", path, bitsPerKey = 12)
    val row = Dedup.readBloomArtifact(spark, path)
    assert(row.getAs[Long]("n_keys") == 200L)
    assert(row.getAs[Long]("cap") == 200L)
    assert(row.getAs[Long]("num_bits") == 2400L)
    assert(!row.getAs[Boolean]("nfc"))
    assert(row.getAs[Array[Byte]]("bloom").length > 0)
  }

  test("bloom probe never falls back to interpreted mode (r12 verdict #1)") {
    // Spark's own BloomFilterMightContain emits `(Long) <key>`; when the
    // key constant-folds to a NEGATIVE literal (odds-on for any xxhash64
    // of a constant), Janino parses the cast as a binary subtraction —
    // "Expression java.lang.Long is not an rvalue" — and the projection
    // silently interprets every row. CODEGEN_ONLY turns that silent
    // fallback into a hard failure, so this test passing proves the
    // probe (BloomMightContainKey) COMPILED, for literal keys and for
    // the full q101 admission plan alike.
    val fm = "spark.sql.codegen.factoryMode"
    val fb = "spark.sql.codegen.fallback"
    val (fm0, fb0) = (spark.conf.get(fm), spark.conf.get(fb))
    spark.conf.set(fm, "CODEGEN_ONLY")
    spark.conf.set(fb, "false")
    try {
      GraftFunctions.register(spark)
      // xxhash64('b') = -6391946315847899181: the exact literal that
      // broke Spark's expression (round-12 sbt log)
      val r = spark.sql(
        """SELECT graft_bloom_contains(
             (SELECT graft_bloom_agg(xxhash64(k), 3L, 4096L)
              FROM VALUES ('a'), ('b'), ('c') AS t(k)),
             xxhash64('b')) AS hit,
           graft_bloom_contains(
             (SELECT graft_bloom_agg(xxhash64(k), 3L, 4096L)
              FROM VALUES ('a'), ('b'), ('c') AS t(k)),
             xxhash64('zzz-never-seen')) AS miss""").head()
      assert(r.getBoolean(0) && !r.getBoolean(1))
      // and the production admission plan end-to-end under CODEGEN_ONLY
      assert(admittedIds(bitsPerKey = 10, "codegen") == truth)
    } finally {
      spark.conf.set(fm, fm0)
      spark.conf.set(fb, fb0)
    }
  }
}
