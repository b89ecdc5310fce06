package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T, VectorFunctions => V}

/** Deduplication operators for large-corpus pipelines (north-star layer).
  *
  * Scale design: every variant is (narrow per-row sketch) → (shuffle on a
  * bounded LSH key) → (pairwise verify inside buckets). Nothing is quadratic
  * in corpus size; the only joins are equi-joins on band keys, which AQE can
  * re-plan for skew. No driver-side state.
  */
object Dedup {

  /** Exact dedup: one hash aggregation on the dedup key, keeping the
    * smallest id per group. At 100 TB this is a single shuffle on
    * xxhash64(key) — group by the hash, not the full text, when values are
    * large (here we keep the text for exactness on the small fixtures).
    */
  def exact(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(keyCol)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  /** MinHash-LSH candidate pairs: per-doc shingle-hash set + k-long
    * signature, exploded into `bands` band keys, self-joined on the key.
    * Returns (id_a, id_b, hs_a, hs_b, sig_a, sig_b) with id_a < id_b,
    * deduplicated — ready for estimated or exact verification.
    *
    * Shuffle discipline (the 100 TB concern): only (band_key, id) pairs —
    * 16 bytes/row — go through the ×bands self-join; the wide shingle/
    * signature arrays are joined back afterwards, and only for rows that
    * actually became candidates. The sketch subplan is recomputed per join
    * side, but that is narrow, linear, scan-local work — no extra shuffle
    * (callers deduplicating enormous corpora can .persist() upstream).
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        shingleWidth: Int = 3, bands: Int = 32,
                        rowsPerBand: Int = 4): DataFrame = {
    val k = bands * rowsPerBand
    val sketch = df.select(
        col(idCol).as("id"),
        T.shingleHashSet(col(textCol), shingleWidth).as("hs"))
      .withColumn("sig", T.minhashSignature(col("hs"), k))
    val bandKeys = sketch.select(col("id"),
      explode(T.bandHashes(col("sig"), bands, rowsPerBand)).as("bh"))
    val pairs = bandKeys.select(col("bh"), col("id").as("id_a"))
      .join(bandKeys.select(col("bh"), col("id").as("id_b")), Seq("bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    pairs
      .join(sketch.select(col("id").as("id_a"), col("hs").as("hs_a"),
        col("sig").as("sig_a")), Seq("id_a"))
      .join(sketch.select(col("id").as("id_b"), col("hs").as("hs_b"),
        col("sig").as("sig_b")), Seq("id_b"))
  }

  /** MinHash near-dup pairs with signature-estimated Jaccard ≥ threshold. */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double, shingleWidth: Int = 3,
                   bands: Int = 32, rowsPerBand: Int = 4): DataFrame =
    minhashCandidates(df, idCol, textCol, shingleWidth, bands, rowsPerBand)
      .withColumn("est_jaccard",
        T.estimatedJaccard(col("sig_a"), col("sig_b")))
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")

  /** n-gram-Jaccard near-dup pairs: LSH candidates verified with the exact
    * Jaccard over the distinct shingle sets. With 32 bands × 4 rows the
    * probability of missing a pair at jaccard 0.8 is (1-0.8^4)^32 ≈ 4e-8,
    * so for thresholds ≥ 0.8 this is exhaustively-correct in practice (the
    * DuckDB oracle checks it against the full quadratic computation).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double, shingleWidth: Int = 3,
                   bands: Int = 32, rowsPerBand: Int = 4): DataFrame =
    minhashCandidates(df, idCol, textCol, shingleWidth, bands, rowsPerBand)
      .withColumn("jaccard", T.jaccard(col("hs_a"), col("hs_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

  /** The end-to-end dedup semantics: drop every document that
    * near-duplicates (n-gram Jaccard ≥ threshold) a smaller-id document —
    * the standard keep-first policy of corpus pipelines. One anti-join
    * against the (small) duplicate-id set.
    */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                         threshold: Double, shingleWidth: Int = 3,
                         bands: Int = 32, rowsPerBand: Int = 4): DataFrame = {
    val dupIds = jaccardPairs(df, idCol, textCol, threshold, shingleWidth,
        bands, rowsPerBand)
      .select(col("id_b").as(idCol)).distinct()
    df.join(dupIds, Seq(idCol), "left_anti")
  }

  /** SimHash near-dup pairs: 64-bit sketch, blocked on 4 × 16-bit chunks
    * (any pair within hamming distance 3 shares a chunk — pigeonhole), then
    * verified with bit_count. Output: (id_a, id_b, hamming).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sketched = df.select(col(idCol).as("id"),
        T.tokens(col(textCol)).as("toks"))
      .withColumn("sh", T.simhash64("toks"))
      .select(col("id"), col("sh"),
        posexplode(T.simhashBands(col("sh"))).as(Seq("band", "chunk")))
    val a = sketched.select(col("band"), col("chunk"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sketched.select(col("band"), col("chunk"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "chunk")).filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", T.hamming64(col("sh_a"), col("sh_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Embedding near-dup pairs: cosine > threshold. Small corpora take the
    * exact pairwise path; `useLsh` blocks by a `planes`-bit hyperplane
    * sketch first (sign-agreement LSH) so candidate generation stays
    * near-linear at 100 TB.
    */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, useLsh: Boolean = false,
                     dim: Int = 64, planes: Int = 16): DataFrame = {
    // norms are computed once per row (not once per pair) and carried
    // through the join; dot/(nrm_a*nrm_b) is float-identical to cosine()
    val base = df.select(col(idCol).as("id"),
        V.toDoubleArray(col(vecCol)).as("v"))
      .withColumn("nrm", V.norm(col("v")))
    val withKey =
      if (useLsh)
        base.withColumn("k", V.hyperplaneSketch(col("v"), dim, planes))
      else base.withColumn("k", lit(0L))
    val a = withKey.select(col("k"), col("id").as("id_a"), col("v").as("v_a"),
      col("nrm").as("nrm_a"))
    val b = withKey.select(col("k"), col("id").as("id_b"), col("v").as("v_b"),
      col("nrm").as("nrm_b"))
    a.join(b, Seq("k")).filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(
        V.dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")), 4))
      .filter(col("sim") > threshold)
      .select("id_a", "id_b", "sim")
  }
}
