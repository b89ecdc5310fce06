package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions

/** Persisted inverted index (postings lists) with the same versioned-
  * artifact lifecycle as the IVF / LSH / Bloom indexes: build once,
  * append shards, query many — the search-side artifact a curation stack
  * keeps NEXT to the corpus so every ad-hoc term query stops paying the
  * full tokenize+explode scan (q69 recomputes BM25 from raw text each
  * call; reference: the per-run recompute shape of log_mining_analysis
  * .py:21-133's parse-then-aggregate pipelines).
  *
  * Layout (MANIFEST-versioned, [[MaintenanceIo]]):
  *   - `postings.gN/` — (tok, doc_id, tf, dl) PARTITIONED BY `pb` =
  *     hash(tok) mod `buckets`: a term query's `pb IN (...)` literal
  *     filter statically prunes the scan to the probed buckets, so scan
  *     bytes track |query terms| / `buckets`, not corpus size. `dl` is
  *     DENORMALIZED into the posting row (the classic impact-index
  *     trick): scoring never joins back to a corpus-sized doc-length
  *     table.
  *   - `df.gN/` — (tok, df) per build/append shard. Document frequency
  *     over disjoint doc shards is ADDITIVE, so readers merge with one
  *     tiny sum over the probed terms' rows.
  *   - `stats.gN/` — one (n_docs, tot_dl) row per build/append shard;
  *     additive the same way.
  *
  * Scale contract: build shuffles the (doc, tok) stream once
  * (map-side-combined tf count) plus the partitionBy exchange; appends
  * touch ONLY the shard (no standing-corpus reads — the q89/q93 nightly
  * cadence); a query reads probed-bucket postings plus two
  * broadcast-sized side tables and shuffles nothing wider than
  * (doc_id, score). Writers serialize on the maintenance lock; readers
  * resolve one manifest snapshot and are grace-protected across
  * concurrent appends exactly like the IVF index.
  */
object InvertedIndex {

  /** Postings partition-bucket count. 64 keeps per-bucket files chunky at
    * fixture scale; a 100 TB corpus raises it with vocabulary size (the
    * knob trades pruning granularity against small-file count).
    */
  val DefaultBuckets = 64

  private def termBucket(tok: Column, buckets: Int): Column =
    pmod(xxhash64(tok), lit(buckets.toLong)).cast("int")

  /** (tok, doc_id, tf, dl, pb) postings of a document frame: one narrow
    * tokenize pass, one map-side-combined (doc, tok) count. Docs with
    * NULL text contribute no postings (and no stats row — matching the
    * oracle's treatment of NULL in both engines).
    */
  private def postingsOf(docs: DataFrame, idCol: String, textCol: String,
                         buckets: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("t"))
      .withColumn("dl", size(col("t")).cast("long"))
      .select(col("doc_id"), col("dl"), explode(col("t")).as("tok"))
      .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).as("tf"))
      .withColumn("pb", termBucket(col("tok"), buckets))

  /** One (n_docs, tot_dl) corpus-stats row for a doc frame. */
  private def statsOf(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(size(TextFunctions.tokens(col(textCol))).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("tot_dl"))

  /** Build the index from scratch: postings (bucket-partitioned), per-
    * shard df, per-shard stats, all published in one manifest. The df
    * table derives from the postings frame pinned once (localCheckpoint)
    * so the tokenize+count kernel runs a single time.
    */
  def buildIndex(docs: DataFrame, indexPath: String,
                 buckets: Int = DefaultBuckets,
                 idCol: String = "doc_id", textCol: String = "text"): Unit =
    MaintenanceIo.withMaintenanceLock(indexPath) {
      val post = postingsOf(docs, idCol, textCol, buckets).localCheckpoint()
      val pGen = MaintenanceIo.nextGen(indexPath, "postings")
      post.repartition(col("pb")).write.partitionBy("pb")
        .parquet(s"$indexPath/$pGen")
      val dGen = MaintenanceIo.nextGen(indexPath, "df")
      post.groupBy("tok").agg(count(lit(1)).as("df"))
        .write.parquet(s"$indexPath/$dGen")
      val sGen = MaintenanceIo.nextGen(indexPath, "stats")
      statsOf(docs, idCol, textCol).coalesce(1)
        .write.parquet(s"$indexPath/$sGen")
      MaintenanceIo.publish(indexPath, MaintenanceIo.Manifest(0L,
        Map("postings" -> pGen, "df" -> dGen, "stats" -> sGen)))
    }

  /** Append a NEW-docs shard (disjoint doc_ids — the nightly-crawl
    * contract; same as every other index append here). One shard-sized
    * pass: postings rows land in the live partitioned table, the shard's
    * (tok, df) and (n_docs, tot_dl) rows append to the additive side
    * tables, and the manifest epoch bumps. The standing corpus is never
    * read.
    */
  def appendToIndex(shard: DataFrame, indexPath: String,
                    buckets: Int = DefaultBuckets,
                    idCol: String = "doc_id", textCol: String = "text"): Unit =
    MaintenanceIo.withMaintenanceLock(indexPath) {
      val m = MaintenanceIo.requireManifest(indexPath)
      val post = postingsOf(shard, idCol, textCol, buckets).localCheckpoint()
      post.repartition(col("pb")).write.partitionBy("pb").mode("append")
        .parquet(s"$indexPath/${m.tables("postings")}")
      post.groupBy("tok").agg(count(lit(1)).as("df"))
        .write.mode("append").parquet(s"$indexPath/${m.tables("df")}")
      statsOf(shard, idCol, textCol).coalesce(1)
        .write.mode("append").parquet(s"$indexPath/${m.tables("stats")}")
      MaintenanceIo.publish(indexPath, m.copy(epoch = m.epoch + 1))
    }

  /** BM25 (k1 = 1.2, b = 0.75) over the STORED index for a fixed term
    * set — same arithmetic, literals, op order, and 6-dp per-term
    * rounding as q69's from-scratch scorer, so a full-corpus recompute
    * oracle must hash-match. Reads: probed postings buckets only (the
    * `pb IN` literals statically prune the partitioned scan; the bucket
    * ids come from one |terms|-row local evaluation), df and stats as
    * broadcast-sized merges. Returns (doc_id, score, n_terms) unsorted —
    * callers rank.
    */
  def bm25FromIndex(spark: SparkSession, indexPath: String,
                    terms: Seq[String], buckets: Int = DefaultBuckets): DataFrame = {
    require(terms.nonEmpty, "bm25FromIndex: at least one term")
    val snap = MaintenanceIo.snapshot(indexPath)
    import spark.implicits._
    // |terms|-row local relation -> bucket literals (driver-sized by
    // construction; LocalTableScan, no cluster job)
    val pbs = terms.toDF("tok")
      .select(termBucket(col("tok"), buckets)).as[Int].collect().distinct
    val post = spark.read.parquet(snap("postings"))
      .filter(col("pb").isin(pbs.map(Integer.valueOf).toIndexedSeq: _*) &&
        col("tok").isin(terms: _*))
    val dfq = spark.read.parquet(snap("df"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("tok").agg(sum("df").as("df"))
    val stats = spark.read.parquet(snap("stats"))
      .agg(sum("n_docs").as("n_docs"), sum("tot_dl").as("tot_dl"))
    post.crossJoin(broadcast(stats)).join(broadcast(dfq), Seq("tok"))
      .withColumn("avgdl", col("tot_dl").cast("double") / col("n_docs"))
      .withColumn("ts", round(
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1) *
          (col("tf") * 2.2) /
          (col("tf") +
            lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))),
        6))
      .groupBy("doc_id")
      .agg(sum(col("ts").cast(DecimalType(18, 6))).cast("double")
          .as("score"),
        count(lit(1)).as("n_terms"))
  }
}
