package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}

/** Record-linkage operators: edit-distance similarity join for matching a
  * dirty/corrupted record stream against a canonical catalog (entity
  * resolution over names, titles, URLs — short keys).
  *
  * Scale design: NEVER the quadratic probe×catalog product, and NEVER a
  * blocking key the data can make hot. Short strings (the linkage regime)
  * key on their FastSS deletion neighborhood — hashes of every
  * ≤k-deletion variant, near-full-string entropy, so no key is ever
  * shared by more rows than true near-matches. Long strings fall back to
  * Ed-Join-style rarest-q-gram prefixes. Both blockings are recall-exact
  * (proofs below); the only per-pair work is a banded Levenshtein verify
  * (`levenshtein(l, r, k)`, O(k·min(len)) per pair) over surviving
  * candidates. The oracle for q137 computes the full quadratic join in
  * DuckDB, so a hash-green row proves the blocking lost no pair.
  *
  * Why not positional segments (PassJoin) or single rare grams — both
  * measured at x10 on the part catalog: TPC-H labels are low-entropy
  * (25 brands × 92 name words + a short numeric key), so segment keys
  * peaked at 2,988 catalog rows (Σdf² = 4·10⁸, ~10¹⁰ candidates, 525 s)
  * and even df-ordered gram prefixes saturated the 5-gram digit space
  * (~2·10⁹ candidates, 458 s). Deletion keys collapsed the same join to
  * 1.5M candidates at 90% precision — blocking entropy must come from
  * the WHOLE string, not any fixed-size piece of it.
  */
object Linkage {

  /** All (probe_id, cat_id, dist) pairs with levenshtein ≤ `k` between a
    * probe table and a catalog table — exact join semantics (every
    * qualifying pair, not nearest-only).
    *
    * Blocking, by length class (classes overlap by k so no qualifying
    * pair can straddle them unseen):
    *
    * SHORT (≤ `shortLen` code points, k ≤ 2 — the record-linkage
    * regime): FastSS deletion neighborhood. Key every string by the
    * 64-bit hashes of all C(n,≤k) variants obtained by deleting ≤ k
    * code points (compiled kernel, O(1)/variant —
    * [[graft.functions.expressions.DeletionHashUtil]]). Recall: align
    * s and t under ≤ k edit ops; deleting s's substituted+deleted
    * positions and t's substituted+inserted positions (each ≤ k chars)
    * leaves the SAME string, so the pair shares that variant's key.
    * ||s|−|t|| ≤ k is implied. Hash collisions only add candidates —
    * the exact verify removes them.
    *
    * LONG (> `shortLen` − k): count filtering + prefix filtering. An
    * edit touches ≤ q positional q-grams, so ed ≤ k destroys ≤ kq of a
    * side's DISTINCT grams: |G(s) ∩ G(t)| ≥ n_X − kq for each side X.
    * With one GLOBAL rarity order (df over probe ∪ catalog asc, hash
    * tiebreak), the q139 prefix lemma (per-side α_X = n_X − kq) puts a
    * shared gram in both (kq+1)-prefixes; each side keys on its kq+1
    * rarest grams and candidates carry a ||s|−|t|| ≤ k filter.
    * Degenerate LONG strings with n ≤ kq distinct grams (highly
    * repetitive) get no count-filter guarantee and route through a
    * marker-key sliver — the degenerate side keys on its exact length,
    * the other side fans out the 2k+1 compatible lengths — bounded by
    * the count of degenerate strings.
    *
    * k in [3, 4] routes EVERYTHING through the gram path (deletion
    * neighborhoods grow as n^k). Contract: k in [1, 4], q in [2, 8],
    * both string columns non-null. Output ids carry the caller's column
    * names; `dist` is the exact Levenshtein distance.
    */
  def editDistanceJoin(probe: DataFrame, probeId: String, probeStr: String,
                       catalog: DataFrame, catId: String, catStr: String,
                       k: Int = 2, q: Int = 5,
                       shortLen: Int = 256): DataFrame = {
    require(k >= 1 && k <= 4, s"editDistanceJoin: k in [1,4], got $k")
    require(q >= 2 && q <= 8, s"editDistanceJoin: q in [2,8], got $q")
    require(shortLen >= k && shortLen <= 1024,
      s"editDistanceJoin: shortLen in [k,1024], got $shortLen")
    val useFastSS = k <= 2
    val pfx = k * q + 1 // count-filter prefix length

    def norm(df: DataFrame, id: String, s: String): DataFrame =
      df.select(col(id).as("__id"), col(s).as("__s"))
        .withColumn("__len", length(col("__s")))
        .localCheckpoint()
    val p = norm(probe, probeId, probeStr)
    val c = norm(catalog, catId, catStr)

    // ---- SHORT class: deletion-neighborhood equi-join ------------------
    def delKeys(side: DataFrame): DataFrame =
      side.filter(col("__len") <= shortLen)
        .select(col("__id"),
          explode(toCol(graft.functions.expressions.DeletionHashes(
            toExpr(col("__s")), k))).as("__k"))
    // MERGE hint: both key streams are ~C(n,k) × input rows, but the
    // optimizer only sees the (small) pre-explode checkpoint stats and
    // would try to BROADCAST one side — measured OOM at x10. Sort-merge
    // spills and scales on the 8-byte keys.
    //
    // Partition count: C(n,k) fanout makes the key stream ~350× the
    // input at n≈38, k=2, so the session's shuffle.partitions (sized for
    // corpus-shaped frames) under-partitions the join — measured 2×
    // super-linear x10→x100 at 32 partitions (47M-row sort runs per
    // partition, all spill). Both sides repartition on __k to a count
    // derived from the measured inputs (one count+avg(len) agg per
    // PINNED side — driver-sized), targeting ~8M key rows per sort
    // partition; the join then reuses that partitioning, so the total
    // shuffle count is unchanged.
    def keyRowEstimate(side: DataFrame): Double = {
      val r = side.filter(col("__len") <= shortLen)
        .agg(count(lit(1)), avg(col("__len"))).head()
      val rows = r.getLong(0).toDouble
      val len = if (r.isNullAt(1)) 0.0 else r.getDouble(1)
      rows * (1.0 + len + (if (k >= 2) len * (len - 1) / 2.0 else 0.0))
    }
    val shortCands =
      if (!useFastSS) None
      else {
        val est = keyRowEstimate(p) + keyRowEstimate(c)
        val sessionParts = p.sparkSession.conf
          .get("spark.sql.shuffle.partitions").toInt
        val parts = math.min(1024,
          math.max(sessionParts, math.ceil(est / 8e6).toInt))
        Some(delKeys(p).select(col("__k"), col("__id").as("__pid"))
          .repartition(parts, col("__k")).hint("MERGE")
          .join(delKeys(c).select(col("__k"), col("__id").as("__cid"))
            .repartition(parts, col("__k")).hint("MERGE"), Seq("__k"))
          .select("__pid", "__cid"))
      }

    // ---- LONG class: rarest-gram prefix join ---------------------------
    // (everything, when k > 2; otherwise only len > shortLen - k, with
    // the k-wide overlap against the SHORT class)
    def longSide(side: DataFrame): DataFrame =
      if (useFastSS) side.filter(col("__len") > shortLen - k) else side
    def withGrams(side: DataFrame): DataFrame =
      longSide(side)
        .withColumn("__g", when(col("__len") >= q,
          expr(s"array_distinct(transform(sequence(1, __len - ${q - 1})," +
            s" i -> xxhash64(substring(__s, i, $q))))")
        ).otherwise(expr("array()")))
        .withColumn("__n", size(col("__g")))
    val pg = withGrams(p).localCheckpoint()
    val cg = withGrams(c).localCheckpoint()

    val dfreq = pg.select(explode(col("__g")).as("__h"))
      .unionByName(cg.select(explode(col("__g")).as("__h")))
      .groupBy("__h").agg(count(lit(1)).as("__df"))

    import org.apache.spark.sql.expressions.Window
    val wDoc = Window.partitionBy("__id").orderBy(col("__df"), col("__h"))
    def prefixKeys(side: DataFrame): DataFrame =
      side.filter(col("__n") > k * q)
        .select(col("__id"), col("__len"), explode(col("__g")).as("__h"))
        .join(dfreq, "__h")
        .withColumn("__rk", row_number().over(wDoc))
        .filter(col("__rk") <= pfx)
        .select(col("__h"), col("__id"), col("__len"))
    val gramCands = prefixKeys(pg)
      .select(col("__h"), col("__id").as("__pid"), col("__len").as("__pl"))
      .hint("MERGE") // same misestimate hazard as the deletion-key join
      .join(prefixKeys(cg)
        .select(col("__h"), col("__id").as("__cid"), col("__len").as("__cl"))
        .hint("MERGE"),
        Seq("__h"))
      .filter(abs(col("__pl") - col("__cl")) <= k)
      .select("__pid", "__cid")

    // degenerate sliver: n <= kq LONG strings key on their exact length,
    // the opposite LONG side fans out the 2k+1 compatible lengths
    val shortCat = cg.filter(col("__n") <= k * q)
      .select(xxhash64(lit("§c"), col("__len")).as("__k"),
        col("__id").as("__cid"))
    val probeToShortCat = pg
      .select(col("__id").as("__pid"),
        explode(sequence(greatest(col("__len") - k, lit(0)),
          col("__len") + k)).as("__L"))
      .select(xxhash64(lit("§c"), col("__L")).as("__k"), col("__pid"))
    val shortProbe = pg.filter(col("__n") <= k * q)
      .select(xxhash64(lit("§p"), col("__len")).as("__k"),
        col("__id").as("__pid"))
    val catToShortProbe = cg
      .select(col("__id").as("__cid"),
        explode(sequence(greatest(col("__len") - k, lit(0)),
          col("__len") + k)).as("__L"))
      .select(xxhash64(lit("§p"), col("__L")).as("__k"), col("__cid"))
    val markerCands = probeToShortCat.join(shortCat, Seq("__k"))
      .select("__pid", "__cid")
      .unionByName(shortProbe.join(catToShortProbe, Seq("__k"))
        .select("__pid", "__cid"))

    val cands = shortCands.fold(gramCands)(_.unionByName(gramCands))
      .unionByName(markerCands)
      .dropDuplicates("__pid", "__cid")
    cands
      .join(p.select(col("__id").as("__pid"), col("__s").as("__ps")),
        Seq("__pid"))
      .join(c.select(col("__id").as("__cid"), col("__s").as("__cs")),
        Seq("__cid"))
      .withColumn("dist", levenshtein(col("__ps"), col("__cs"), k))
      .filter(col("dist") >= 0)
      .select(col("__pid").as(probeId), col("__cid").as(catId), col("dist"))
  }
}
