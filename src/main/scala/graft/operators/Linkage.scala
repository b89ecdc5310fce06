package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record-linkage operators: edit-distance similarity join for matching a
  * dirty/corrupted record stream against a canonical catalog (entity
  * resolution over names, titles, URLs — short keys).
  *
  * Scale design: NEVER the quadratic probe×catalog product. Candidates come
  * from an equi-join on 8-byte segment-hash keys (PassJoin-style pigeonhole
  * blocking, recall-exact — see [[editDistanceJoin]]), and the only
  * per-pair work is a banded Levenshtein verify (`levenshtein(l, r, k)`,
  * O(k·min(len)) per pair) over the surviving candidates. The oracle for
  * q137 computes the full quadratic join in DuckDB, so a hash-green row
  * proves the blocking lost no pair.
  */
object Linkage {

  /** All (probe_id, cat_id, dist) pairs with levenshtein ≤ `k` between a
    * probe table and a catalog table of short strings — exact join
    * semantics (every qualifying pair, not nearest-only).
    *
    * Blocking (the 100 TB concern): partition each CATALOG string into
    * k+1 contiguous segments. Any probe within k edits must contain at
    * least one segment verbatim — each edit op breaks at most one
    * segment (a substitution/deletion touches one segment's char; an
    * insertion either lands between segments, breaking none, or inside
    * one), so ≥ 1 of the k+1 segments survives contiguously, shifted by
    * at most k positions (net insertions−deletions before it). The probe
    * side therefore emits, for every compatible catalog length
    * L ∈ [len(t)−k, len(t)+k] and segment index i, the substrings of t
    * with that segment's length within ±k of its expected start — at
    * most (2k+1)·(k+1)·(2k+1) keys per probe row (75 at k=2), each an
    * 8-byte xxhash64 of (substring, i, L). Candidate generation is ONE
    * equi-join on that key (AQE-splittable on hot segments — e.g. a
    * token shared by many entities), followed by a pair-distinct and the
    * banded verify; nothing quadratic in either input.
    *
    * Tiny strings (length ≤ k) have no guaranteed-untouched segment;
    * they route through a marker key per compatible length — a sliver
    * bounded by the count of ≤k-char strings, degenerate only for a
    * catalog OF tiny strings (not this operator's regime).
    *
    * Contract: k in [1, 4] (keys are short; per-probe fanout grows as
    * ~4k³), both string columns non-null. Output ids carry the caller's
    * column names; `dist` is the exact Levenshtein distance.
    */
  def editDistanceJoin(probe: DataFrame, probeId: String, probeStr: String,
                       catalog: DataFrame, catId: String, catStr: String,
                       k: Int = 2): DataFrame = {
    require(k >= 1 && k <= 4, s"editDistanceJoin: k in [1,4], got $k")
    val kp1 = k + 1
    // segment i of a length-L string: [floor(iL/(k+1)), floor((i+1)L/(k+1)))
    // (0-based start; exact in double for any realistic string length)
    def segStart(i: org.apache.spark.sql.Column, L: org.apache.spark.sql.Column) =
      floor(i.cast("double") * L / kp1).cast("int")

    val cat = catalog.select(col(catId).as("__cid"), col(catStr).as("__cs"))
      .withColumn("__L", length(col("__cs")))
    val catKeys = cat.filter(col("__L") > k)
      .select(col("__cid"), col("__cs"), col("__L"),
        explode(sequence(lit(0), lit(k))).as("__i"))
      .withColumn("__start", segStart(col("__i"), col("__L")))
      .withColumn("__slen", segStart(col("__i") + 1, col("__L")) - col("__start"))
      .filter(col("__slen") > 0)
      .select(xxhash64(col("__cs").substr(col("__start") + 1, col("__slen")),
        col("__i"), col("__L")).as("__k"), col("__cid"))
      .unionByName(cat.filter(col("__L") <= k)
        .select(xxhash64(lit("§tiny"), col("__L"), col("__L")).as("__k"),
          col("__cid")))

    val prb = probe.select(col(probeId).as("__pid"), col(probeStr).as("__ps"))
      .withColumn("__M", length(col("__ps")))
    val prbL = prb.select(col("__pid"), col("__ps"), col("__M"),
      explode(sequence(greatest(col("__M") - k, lit(0)), col("__M") + k))
        .as("__L"))
    val prbKeys = prbL.filter(col("__L") > k)
      .select(col("__pid"), col("__ps"), col("__M"), col("__L"),
        explode(sequence(lit(0), lit(k))).as("__i"))
      .withColumn("__start", segStart(col("__i"), col("__L")))
      .withColumn("__slen", segStart(col("__i") + 1, col("__L")) - col("__start"))
      .filter(col("__slen") > 0)
      .withColumn("__lo", greatest(col("__start") - k, lit(0)))
      .withColumn("__hi", least(col("__start") + k, col("__M") - col("__slen")))
      // sequence(lo, hi) with lo > hi yields a DESCENDING range, not an
      // empty one — guard the empty position window explicitly
      .filter(col("__lo") <= col("__hi"))
      .select(col("__pid"), col("__ps"), col("__i"), col("__L"), col("__slen"),
        explode(sequence(col("__lo"), col("__hi"))).as("__p"))
      .select(xxhash64(col("__ps").substr(col("__p") + 1, col("__slen")),
        col("__i"), col("__L")).as("__k"), col("__pid"))
      .unionByName(prbL.filter(col("__L") <= k)
        .select(xxhash64(lit("§tiny"), col("__L"), col("__L")).as("__k"),
          col("__pid")))

    // one 16-byte-row equi-join → pair-distinct → banded verify on the
    // surviving candidates only
    val cands = prbKeys.join(catKeys, "__k")
      .select(col("__pid"), col("__cid")).dropDuplicates("__pid", "__cid")
    cands
      .join(prb.select(col("__pid"), col("__ps")), Seq("__pid"))
      .join(cat.select(col("__cid"), col("__cs")), Seq("__cid"))
      .withColumn("dist", levenshtein(col("__ps"), col("__cs"), k))
      .filter(col("dist") >= 0)
      .select(col("__pid").as(probeId), col("__cid").as(catId), col("dist"))
  }
}
