package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions

/** Mergeable distinct-count sketches (HyperLogLog over the repo's
  * deterministic FNV-1a-64 stream) — the corpus-card primitive that makes
  * "how many distinct documents/urls/ngrams" answerable at 100 TB without
  * ever shuffling the keys themselves.
  *
  * Scale contract: a register table is AT MOST `m = 2^lgK` rows per group
  * (4 KB-ish at the default lgK = 10), computed in one narrow pass with a
  * map-side-combined `max` — so per-shard sketch extraction shuffles
  * O(m × groups) rows regardless of corpus size, and sketches from any
  * partitioning of the data merge LOSSLESSLY with a plain `max` per bucket
  * (associative + commutative + idempotent: union of HLL registers IS the
  * register-wise max). That is exactly the shape a 1000-executor corpus
  * card wants: per-shard registers written next to each shard, a
  * m-rows-per-shard merge at read time, and incremental append — a new
  * crawl generation just max-merges its registers in, no recount of
  * standing data (the same persisted-artifact pattern as the Bloom / LSH /
  * IVF index appends).
  *
  * Determinism contract (what makes q125 hash-green against DuckDB): the
  * hash is the repo's unseeded byte-level FNV-1a-64 fold (the stream the
  * fingerprint / minhash oracles already reproduce octet-for-octet)
  * passed through murmur3's fmix64 finalizer — FNV alone is not
  * avalanche-complete and its biased high bits put HLL's ρ ~2× off on
  * sequential key families ([[graft.functions.expressions.FnvMixed64]]);
  * bucket = low lgK
  * bits, w = the remaining W = 64−lgK bits, and ρ(w) = position of the
  * leftmost 1-bit of the W-bit word = W + 1 − length(bin(w)) (minimal
  * binary strings — Java `Long.toBinaryString` and DuckDB `bin()` agree),
  * all integer/string ops with one engine-neutral rounding at the very
  * end. The estimator is classic Flajolet–Fuss–Gandouet–Meunier HLL:
  * E = α_m·m²/Z with the m·ln(m/V) linear-counting correction below
  * 2.5·m; both engines evaluate α_m from the same literal expression and
  * Z is carried as an exact scaled integer (see [[hllEstimate]]), so the
  * estimate has NO summation-order dependence at all. Standard error
  * ≈ 1.04/√m ≈ 3.3 % at lgK = 10.
  *
  * Like the fingerprint/minhash kernels, the FNV hash is a CodegenFallback
  * expression (one interpreted call per row feeding an otherwise codegen'd
  * narrow plan) — the accepted trade for a byte-exact cross-engine stream.
  */
object Sketches {

  /** Default register-index bits: m = 1024 registers, ±3.3 % @ 1σ. */
  val DefaultLgK = 10

  /** α_m · m² for the HLL raw estimator, written as the same literal
    * arithmetic the DuckDB oracle interpolates so the double is identical
    * bit-for-bit in both engines (m ≥ 128 constant from the HLL paper).
    */
  private def alphaM2(m: Int): Column =
    lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)) *
      lit(m.toDouble) * lit(m.toDouble)

  /** One HLL register table per `dims` group: (dims…, bucket, rho) with
    * rho = max over the group's keys. One narrow projection + one
    * map-side-combined max-aggregate; at most 2^lgK rows per group ever
    * shuffle. Rows whose key is NULL are skipped (fnv64 of NULL is NULL —
    * matching COUNT(DISTINCT)'s NULL semantics).
    */
  def hllRegisters(df: DataFrame, key: Column, dims: Seq[String],
                   lgK: Int = DefaultLgK): DataFrame = {
    require(lgK >= 4 && lgK <= 16, s"hllRegisters: lgK in [4,16], got $lgK")
    val m = 1 << lgK
    val bigW = 64 - lgK
    val h = TextFunctions.fnvMixed64(key)
    val w = shiftrightunsigned(h, lgK)
    val rho = when(w === 0L, lit(bigW + 1))
      .otherwise(lit(bigW + 1) - length(bin(w)))
    df.select(dims.map(col) :+ h.bitwiseAND(lit((m - 1).toLong)).as("bucket")
        :+ rho.as("rho"): _*)
      .filter(col("bucket").isNotNull)
      .groupBy(dims.map(col) :+ col("bucket"): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** Lossless sketch union: drop (or keep) grouping dims and max-merge the
    * registers. `mergeRegisters(perShard, Seq())` is the global sketch;
    * merging an appended shard's registers into a standing table is the
    * same call on the union of the two register frames.
    */
  def mergeRegisters(registers: DataFrame, dims: Seq[String]): DataFrame =
    registers.groupBy(dims.map(col) :+ col("bucket"): _*)
      .agg(max(col("rho")).as("rho"))

  /** Cardinality estimate per `dims` group from a register table:
    * (dims…, est_distinct). V = empty registers (buckets absent from the
    * table — never materialized), Z = V + Σ 2^−ρ over present buckets.
    *
    * Z is carried as the EXACT integer Z·2^(W+1) (each term 2^(W+1−ρ) is a
    * long in [1, 2^W], summed as DECIMAL(38,0) — the repo's double-sum
    * rule): the register max-agg plus this sum make the whole estimator
    * state integral, so the estimate is bit-identical across partition
    * orders, across runs, AND across engines — the one estRaw division
    * and the final round happen on integers both engines agree on. Only
    * the ln() in the linear-counting branch can differ by an ulp, erased
    * by rounding to a whole count.
    */
  def hllEstimate(registers: DataFrame, dims: Seq[String],
                  lgK: Int = DefaultLgK): DataFrame = {
    val m = 1 << lgK
    val bigW = 64 - lgK
    val term = expr(s"shiftleft(CAST(1 AS BIGINT), ${bigW + 1} - rho)")
      .cast(DecimalType(38, 0))
    val aggs = Seq(count(lit(1)).as("present"), sum(term).as("zs"))
    val grouped =
      if (dims.isEmpty) registers.agg(aggs.head, aggs.tail: _*)
      else registers.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val scale = math.pow(2.0, (bigW + 1).toDouble) // exact power of two
    val v = lit(m.toLong) - col("present")
    val denom = (v.cast(DecimalType(38, 0)) *
      lit(scale.toLong).cast(DecimalType(38, 0)) + col("zs")).cast("double")
    val raw = alphaM2(m) * lit(scale) / denom
    val est = when(v > 0L && raw <= lit(2.5 * m),
        lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double")))
      .otherwise(raw)
    grouped.select(dims.map(col) :+
      round(est).cast("long").as("est_distinct"): _*)
  }

  // ---- Persisted corpus-card artifact (the nightly-ingest shape) --------
  // The register table as a versioned on-disk artifact behind the same
  // MANIFEST-pointer machinery as the Bloom / LSH / IVF indexes: build
  // once over the standing corpus, then each arriving shard folds in with
  // ONE scan of the new rows and a ≤ 2^lgK-row max-merge — the standing
  // corpus is never rescanned, and a crash at any instant leaves the
  // previous (complete, still-correct) generation published. Because the
  // merge is idempotent, re-appending a shard after a crash-and-retry
  // cannot inflate the estimate — the card is safe under at-least-once
  // delivery, which neither a raw count nor a sum-shaped stat survives.

  /** Build the card artifact: one `registers` generation plus a `meta`
    * generation pinning lgK (the probe contract — an append at a
    * different geometry would silently corrupt every register, so
    * appends READ the geometry rather than accept it as a parameter;
    * the Bloom artifact's nfc/sizing pin, same reasoning).
    */
  def buildHllCard(corpus: DataFrame, keyCol: String, path: String,
                   lgK: Int = DefaultLgK): Unit =
    MaintenanceIo.withMaintenanceLock(path) {
      val sp = corpus.sparkSession
      import sp.implicits._
      val regGen = MaintenanceIo.nextGen(path, "registers")
      hllRegisters(corpus, col(keyCol), Seq.empty, lgK)
        .coalesce(1).write.parquet(s"$path/$regGen")
      val metaGen = MaintenanceIo.nextGen(path, "meta")
      Seq(lgK).toDF("lg_k").coalesce(1).write.parquet(s"$path/$metaGen")
      MaintenanceIo.publish(path, MaintenanceIo.Manifest(0L,
        Map("registers" -> regGen, "meta" -> metaGen)))
    }

  /** Fold a new shard into the card: one narrow scan of the SHARD only,
    * register-wise max against the standing generation, publish as a new
    * generation. Cost is independent of standing-corpus size.
    */
  def appendToHllCard(shard: DataFrame, keyCol: String, path: String): Unit =
    MaintenanceIo.withMaintenanceLock(path) {
      val sp = shard.sparkSession
      val m = MaintenanceIo.requireManifest(path)
      val snap = MaintenanceIo.snapshot(path)
      val lgK = sp.read.parquet(snap("meta")).head().getAs[Int]("lg_k")
      val merged = mergeRegisters(
        sp.read.parquet(snap("registers")).unionByName(
          hllRegisters(shard, col(keyCol), Seq.empty, lgK)), Seq.empty)
      val gen = MaintenanceIo.nextGen(path, "registers")
      merged.coalesce(1).write.parquet(s"$path/$gen")
      MaintenanceIo.publish(path, MaintenanceIo.Manifest(m.epoch + 1,
        m.tables + ("registers" -> gen)))
    }

  /** Distinct-count estimate from the persisted card (one ≤ 2^lgK-row
    * read through the manifest — a consistent snapshot even while an
    * append publishes the next generation).
    */
  def hllCardEstimate(sp: SparkSession, path: String): DataFrame = {
    val snap = MaintenanceIo.snapshot(path)
    val lgK = sp.read.parquet(snap("meta")).head().getAs[Int]("lg_k")
    hllEstimate(sp.read.parquet(snap("registers")), Seq.empty, lgK)
  }
}
