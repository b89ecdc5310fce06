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
    * key column. The static side is re-planned each micro-batch (the
    * [[EventStream.enrichWithDim]] property), so a nightly-refreshed
    * corpus snapshot and re-built filter are picked up without restart.
    *
    * 100 TB cost shape: the filter blob rides the closure once per
    * executor; the anti-join's STREAM side is only the candidate sliver
    * of each batch, and its static side is a single column-pruned scan of
    * the corpus key column per trigger — batch triggers accordingly (the
    * gate is for arrival-time admission, not per-row latency). As in the
    * batch twin, `nfc` normalizes the PROBE key; callers wanting
    * NFC-equal admission pass normalized keys end-to-end (the
    * [[graft.operators.Dedup.bloomAdmit]] contract, pinned by
    * BloomIngestSpec).
    */
  def bloomAdmit(stream: DataFrame, corpusKeys: DataFrame, keyCol: String,
                 bloomPath: String, nfc: Boolean = false): DataFrame = {
    val sp = corpusKeys.sparkSession
    // one-row artifact: driver-sized by construction, read at plan time
    val bloom = sp.read.parquet(bloomPath).head().getAs[Array[Byte]]("bloom")
    def probeKey(c: Column): Column =
      xxhash64(if (nfc) T.nfcNormalize(c) else c)
    val probed = stream.withColumn("__mc",
      AggFunctions.bloomMightContain(bloom, probeKey(col(keyCol))))
    val clean = probed.filter(!col("__mc"))
    val cand = probed.filter(col("__mc"))
      .join(corpusKeys.select(col(keyCol)), Seq(keyCol), "left_anti")
    clean.unionByName(cand).drop("__mc")
  }
}
