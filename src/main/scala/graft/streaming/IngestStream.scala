package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{AggFunctions, TextFunctions => T}

/** Streaming ingest admission: the q101 Bloom gate applied to a CONTINUOUS
  * document stream — the shape of a crawler feeding a standing corpus,
  * where dedup must happen at arrival time rather than nightly.
  *
  * Entirely STATELESS streaming: the Bloom probe is a deterministic
  * expression over the stored blob (no state store, no watermark), and the
  * residual verify is a stream-static join, so the query runs in Append
  * mode with per-trigger cost independent of stream history — the property
  * a long-lived ingest stream needs. The fuzzy (near-dup) admission stays
  * batch-cadence by design: its candidate verify needs shard-driven corpus
  * pruning (a broadcast built FROM the batch), which has no streaming
  * equivalent — micro-batch it via foreachBatch + [[graft.operators.Dedup
  * .lshIndexProbe]] instead.
  */
object IngestStream {

  /** Admit stream rows whose `keyCol` the standing corpus has never seen —
    * exact `stream WHERE key NOT IN corpus` semantics, continuously.
    *
    * Plan per micro-batch: every row probes the persisted Bloom filter
    * inside the scan's codegen span; never-seen rows are admitted OUTRIGHT
    * (Bloom filters have no false negatives) with no join at all, and only
    * the might-contain residue — true duplicates plus ~1% false positives
    * — passes through ONE stream-static LEFT ANTI join against the corpus
    * key column. Only the CORPUS side refreshes in place: the static join
    * side is re-planned each micro-batch (the [[EventStream.enrichWithDim]]
    * property), but the Bloom blob is read ONCE here, at query
    * construction, and embedded as a literal — a rebuilt filter is NOT
    * picked up until the query restarts. A stale filter is a correctness
    * hazard, not just a perf one: a key newly added to the corpus probes
    * clean against the old filter, skips the verify join entirely, and is
    * admitted as a duplicate. Operational contract: refresh filter and
    * corpus snapshot TOGETHER — either restart this query after a rebuild
    * (checkpoint recovery makes that cheap), or run the admission at
    * micro-batch cadence via `foreachBatch` + [[graft.operators.Dedup
    * .bloomAdmit]], which re-reads the artifact every batch (the
    * [[bloomAdmitEachBatch]] sink does exactly this).
    *
    * 100 TB cost shape: the filter blob rides the closure once per
    * executor; the anti-join's STREAM side is only the candidate sliver
    * of each batch, and its static side is a single column-pruned scan of
    * the corpus key column per trigger — batch triggers accordingly (the
    * gate is for arrival-time admission, not per-row latency). The key
    * scheme (`nfc`) comes FROM the artifact, as in the batch twin, so
    * probe keys can never hash differently than the built keys; NULL keys
    * are admitted outright (anti-join semantics — see
    * [[graft.operators.Dedup.bloomAdmit]]), pinned by BloomIngestSpec.
    */
  def bloomAdmit(stream: DataFrame, corpusKeys: DataFrame, keyCol: String,
                 bloomPath: String): DataFrame = {
    val sp = corpusKeys.sparkSession
    // one-row artifact: driver-sized by construction, read at plan time
    // (manifest-resolved — never races an in-flight append's publish)
    val art = graft.operators.Dedup.readBloomArtifact(sp, bloomPath)
    val bloom = art.getAs[Array[Byte]]("bloom")
    val nfc = art.getAs[Boolean]("nfc")
    def probeKey(c: Column): Column =
      xxhash64(if (nfc) T.nfcNormalize(c) else c)
    val probed = stream.withColumn("__mc",
      AggFunctions.bloomMightContain(bloom, probeKey(col(keyCol))))
    val clean = probed.filter(!coalesce(col("__mc"), lit(false)))
    val cand = probed.filter(coalesce(col("__mc"), lit(false)))
      .join(corpusKeys.select(col(keyCol)), Seq(keyCol), "left_anti")
    clean.unionByName(cand).drop("__mc")
  }

  /** The FULL ingest-admission pipeline as a restartable checkpointed
    * file sink: per micro-batch, the exact gate ([[graft.operators.Dedup
    * .bloomAdmit]] — drops rows whose key the corpus already holds) then
    * the fuzzy gate ([[graft.operators.Dedup.lshIndexProbe]] against the
    * persisted band index — drops near-duplicates at `threshold`), and
    * the surviving rows land as ONE parquet directory per batch.
    *
    * Why foreachBatch, not the plan-time [[bloomAdmit]]: both artifacts
    * are re-read INSIDE the batch function, so a nightly-rebuilt Bloom
    * filter or band index is picked up at the very next trigger — filter
    * and corpus snapshot refresh together, the operational contract
    * [[bloomAdmit]]'s scaladoc requires the caller to manage manually.
    *
    * Exactly-once across restarts: the checkpoint's offset log decides
    * WHICH rows form batch N, and the output directory `batch=N` is
    * OVERWRITTEN, not appended — a batch replayed after a crash rewrites
    * its own directory byte-for-byte instead of duplicating rows.
    * StreamingEtlSpec kills the query mid-shard, restarts from the same
    * checkpoint, and asserts the union of batch directories equals the
    * batch-mode admission of the whole shard.
    */
  def curatedAdmitEachBatch(stream: DataFrame, corpus: DataFrame,
                            idCol: String, textCol: String,
                            bloomPath: String, lshIndexPath: String,
                            threshold: Double, outPath: String,
                            checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val exact = graft.operators.Dedup
          .bloomAdmit(corpus, batch, textCol, bloomPath)
        val flagged = graft.operators.Dedup
          .lshIndexProbe(corpus, exact, lshIndexPath, idCol, textCol,
            threshold)
          .select(col("id_b").as(idCol)).distinct()
        exact.join(flagged, Seq(idCol), "left_anti")
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
      .start()

  /** SELF-deduplicating continuous ingest — the full crawler loop:
    * admission is gated against the standing corpus AND everything the
    * stream has already admitted, because each batch APPENDS its own
    * admissions back into the Bloom filter and the band index
    * ([[graft.operators.Dedup.appendToExactBloom]] /
    * [[graft.operators.Dedup.appendToLshBandIndex]]) before the next
    * trigger. A page crawled in batch 1 and re-crawled (or paraphrased)
    * in batch 900 is rejected in batch 900 — [[curatedAdmitEachBatch]]
    * cannot do that (its artifacts are maintained by a nightly job, so
    * within-stream duplicates pass until the rebuild).
    *
    * The standing side for the verify joins is `corpus` UNION the
    * already-admitted output (read back from `outPath`, EXCLUDING the
    * current batch's own directory) — so a replayed batch can never
    * reject its own rows against its first attempt's output. Replay
    * safety of the index appends: re-OR-ing keys into the Bloom filter
    * is idempotent on the bits (`n_keys` drifts high, an FP-budget note
    * only), and duplicate band rows only re-generate candidate pairs
    * the probe distinct()s away — admission semantics are unchanged, so
    * the per-batch overwrite keeps the OUTPUT exactly-once even though
    * the sketch appends are at-least-once. With `cardPath` set, each
    * batch also folds its admissions into the persisted HLL corpus card
    * ([[graft.operators.Sketches.appendToHllCard]]) — the one side
    * effect that is fully idempotent under replay (register max-merge),
    * so the running distinct-count telemetry stays EXACTLY equal to a
    * from-scratch batch computation across any kill/replay schedule.
    * With `searchIndexPath` set, each batch also appends its admissions
    * to the persisted inverted index — via [[graft.operators
    * .InvertedIndex.appendBatchToIndex]], whose per-batch generation
    * overwrite makes THAT side effect exactly-once too (a replayed
    * batch rewrites its own generation byte-for-byte instead of
    * double-counting tf/df/stats), so the corpus is BM25-searchable as
    * it streams in and the index equals a from-scratch build at every
    * trigger boundary.
    * With `denseIndexPath` set, each batch's admissions also land in a
    * persisted IVF index ([[graft.operators.Similarity
    * .appendBatchToIvfIndex]] over the `denseVecCol` embedding column)
    * — the DENSE retrieval channel maintained at stream cadence
    * (round-18 verdict #5): assignments go against the STORED centroids
    * as their own per-batch generation (overwrite ⇒ exactly-once under
    * replay, like the inverted-index side), so batch N's admissions are
    * ANN-searchable at trigger boundary N+1 and the index equals a
    * from-scratch build over corpus ∪ admissions at exhaustive probe.
    * With `denseCert` set, every batch publish re-measures the recall
    * certificate in the same manifest swap — the mid-stream dense
    * channel stays CERTIFIED serve-ready, never staleness-blocked.
    * Within-batch exact dups are
    * collapsed (keep smallest id); within-batch NEAR-dups are the one
    * admitted-twice window, bounded by a single trigger's contents —
    * documented, and closable by sizing triggers.
    */
  def selfDedupIngest(stream: DataFrame, corpus: DataFrame,
                      idCol: String, textCol: String,
                      bloomPath: String, lshIndexPath: String,
                      threshold: Double, outPath: String,
                      checkpoint: String,
                      cardPath: Option[String] = None,
                      searchIndexPath: Option[String] = None,
                      simGraphPath: Option[String] = None,
                      denseIndexPath: Option[String] = None,
                      denseVecCol: String = "embedding",
                      denseCert: Option[
                        graft.operators.Similarity.RecallCertSpec] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = stream.schema
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sp = batch.sparkSession
        // within-batch exact collapse, deterministic keep-smallest-id —
        // the q19 map-side-combined groupBy shape, never a window over
        // the text key (a batch full of one boilerplate page would
        // buffer a single window group). NULL-text rows route AROUND
        // the collapse: join equality never matches NULL, so they would
        // be silently dropped here — and the admission contract
        // (anti-join semantics, BloomIngestSpec) says NULL keys admit,
        // each as its own row (NULLs are not equal to each other)
        val nn = batch.filter(col(textCol).isNotNull)
        val b = nn.join(
            nn.groupBy(col(textCol)).agg(min(col(idCol)).as(idCol)),
            Seq(idCol, textCol), "left_semi")
          .unionByName(batch.filter(col(textCol).isNull))
        val admittedSoFar = {
          val dir = new java.io.File(outPath)
          val parts = Option(dir.listFiles()).getOrElse(Array.empty)
            .filter(f => f.isDirectory && f.getName.startsWith("batch="))
            .filterNot(_.getName == s"batch=$batchId")
            .map(_.getPath)
          if (parts.isEmpty)
            sp.createDataFrame(sp.sparkContext
              .emptyRDD[org.apache.spark.sql.Row], schema)
          else sp.read.schema(schema).parquet(parts.toIndexedSeq: _*)
        }
        val standing = corpus.select(col(idCol), col(textCol))
          .unionByName(admittedSoFar.select(col(idCol), col(textCol)))
        val exact = graft.operators.Dedup
          .bloomAdmit(standing, b, textCol, bloomPath)
        val flagged = graft.operators.Dedup
          .lshIndexProbe(standing, exact, lshIndexPath, idCol, textCol,
            threshold)
          .select(col("id_b").as(idCol)).distinct()
        val admitted = exact.join(flagged, Seq(idCol), "left_anti")
          .localCheckpoint() // three consumers: sink + two index appends
        admitted.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        if (!admitted.isEmpty) {
          graft.operators.Dedup
            .appendToExactBloom(admitted, textCol, bloomPath)
          graft.operators.Dedup
            .appendToLshBandIndex(admitted, idCol, textCol, lshIndexPath)
          // corpus-card telemetry (q126's artifact): fold this batch's
          // admissions into the distinct-count sketch. Alone among the
          // three side-effect appends, this one is fully IDEMPOTENT
          // (register max-merge), so a replayed batch leaves the card
          // bit-identical — the estimate never drifts under the
          // at-least-once delivery foreachBatch gives side effects,
          // where a count-shaped stat would inflate on every replay.
          cardPath.foreach { cp =>
            graft.operators.Sketches.appendToHllCard(admitted, textCol, cp)
          }
          // search-index maintenance (q130's artifact): each batch's
          // admissions land as their OWN generation triple keyed by
          // batchId — a replayed batch overwrites its directories
          // byte-for-byte (epoch pinned in the dir name), so the index
          // stays exactly-once under at-least-once side-effect delivery
          // where the plain append would double-count tf/df/stats.
          searchIndexPath.foreach { ip =>
            graft.operators.InvertedIndex.appendBatchToIndex(
              admitted, ip, batchId, idCol = idCol, textCol = textCol)
          }
          // similarity-graph maintenance (q154's artifact): the same
          // per-batch generation-overwrite trick — a replayed batch
          // recomputes its edges against the identical standing state
          // and rewrites its own quad, so the maintained graph equals a
          // from-scratch rebuild at every trigger boundary
          simGraphPath.foreach { gp =>
            graft.operators.SimGraphIndex.appendBatch(
              admitted, idCol, textCol, gp, batchId)
          }
          // dense-channel maintenance (the q164-family artifact): the
          // batch's admissions assigned against the STORED centroids as
          // their own generation — a replayed batch recomputes the same
          // assignment and overwrites its dir, exactly-once like the
          // search-index side; an optional cert spec re-certifies recall
          // in the same publish so mid-stream serves stay assertable
          denseIndexPath.foreach { dp =>
            graft.operators.Similarity.appendBatchToIvfIndex(
              admitted.select(col(idCol).as("vec_id"),
                col(denseVecCol).as("embedding")),
              dp, batchId, cert = denseCert)
          }
        }
        ()
      }
      .start()
  }
}
