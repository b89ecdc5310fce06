package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{TextFunctions, VectorFunctions}
import graft.functions.TextFunctions.WS
import graft.operators.{Dedup, Graph, Linkage, MaintenanceIo, Relational, Retrieval, Similarity}
import graft.sources.Sources
import graft.streaming.EventStream

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator/capability from SURVEY.md §2
  * (reference file:line cited per query); `oracleSql` holds the ANSI-SQL
  * equivalent the driver runs in DuckDB over the same parquet tables.
  *
  * Determinism rules used throughout (so Spark and DuckDB hash-match):
  *   - double sums go through fixed-scale decimals (exact, order-independent);
  *   - every result has a total ORDER BY with tiebreaks;
  *   - integer-ish outputs are cast to BIGINT to match DuckDB's defaults;
  *   - raw timestamps are never emitted (formatted strings / extracted ints).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** Headline bench set: every relational + north-star query, plus the
    * bounded ML fits (CV grid and the ALS+KMeans chain are exercised by
    * Verify/tests but are model-selection workloads, not engine throughput).
    */
  def benchQueries: Seq[String] =
    queries.keys.toSeq.sorted
      .filterNot(Set("q34_ml_cv_best_params", "q35_ml_cluster_tokens",
        "q153_ml_gbt_cv_best_params"))

  /** The q61/q61b near-dup corpus: embeddings as double arrays plus the
    * deterministic θ-boundary twins for vec_id < 50 (blend of each vector
    * toward its circular rotation, alpha = vec_id%8/20 — the oracle
    * reproduces the same IEEE ops in the same order).
    *
    * NOT persisted here: [[Dedup.embeddingPairs]] consumes its input
    * three times (sketch side + both vector join-backs), and this corpus
    * is DERIVED (union + per-element transform + float→double widening),
    * so whether to materialize it is a measured trade-off, not a rule.
    * q61b persists — its planesFor `count()` already pays the
    * materialization pass, so the cache is free and cut its x100 time
    * 310→259 s. q61 does NOT — with no count to piggyback on, the extra
    * cache-build pass plus GC pressure measured SLOWER at x100 (744 s
    * persisted vs 476 s recomputing at the same suite position, and vs
    * 621 s clean-isolated; BENCH_SCALE.md round-7 isolation),
    * and q61 stays the round-over-round comparability row besides.
    */
  private def neardupCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir).select(col("vec_id"),
      VectorFunctions.toDoubleArray(col("embedding")).as("embedding"))
    val twins = base.filter(col("vec_id") < 50)
      .withColumn("a", (col("vec_id") % 8).cast("double") / 20.0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (lit(1.0) - col("a")) * x + col("a") *
            element_at(col("embedding"), pmod(i + 1, lit(64)) + 1))
          .as("embedding"))
    base.unionByName(twins)
  }

  /** Per-output-path monitors so one JVM never has two threads in the
    * same build (Verify's query pool), and never attempts overlapping
    * [[java.nio.channels.FileLock]]s (which would throw rather than
    * block within a process).
    */
  private val buildMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Construction-time WRITE side effects (q90's z-order rewrite, q92's
    * IVF index build), cached across plan constructions: the output path is
    * keyed on a digest of the ABSOLUTE fixture dir (two dirs sharing a
    * basename can't clobber each other — round-10 advice), and `build`
    * is skipped when the signature marker recorded for the written copy
    * still matches the source fixture file's (name, length, mtime) tree —
    * so repeated constructions (Explain audit, specs, bench passes) pay
    * the write once, while a regenerated fixture triggers a fresh build.
    * Returns the output path.
    *
    * CONCURRENT builders are safe (round-11 verdict #8 — the gate runs
    * bench and specs in parallel processes): a same-JVM monitor plus a
    * cross-process advisory file lock serialize the build, the
    * marker-match is re-checked under the lock (the loser of the race
    * finds the winner's marker and skips its own build), and the marker
    * itself lands by atomic rename — a crash mid-build leaves no marker,
    * so the next caller rebuilds rather than reading a torn artifact.
    */
  private[graft] def cachedBuild(dir: String, srcRel: String,
                                 outBase: String, params: String = "")
                                (build: String => Unit): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
    def deepSig(f: java.io.File): String =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).sortBy(_.getName)
          .map(deepSig).mkString(",")
      else s"${f.getName}:${f.length}:${f.lastModified}"
    // the layout salt invalidates artifacts written under a superseded
    // on-disk contract (v3 = epoch-stamped inverted-index postings;
    // v2 = MANIFEST-versioned index generations) even when the source
    // fixture is unchanged. `params` folds the call site's OPERATOR
    // parameters (threshold, geometry, split predicates, seeds) into the
    // signature so a parameter change self-invalidates the artifact —
    // without it, editing e.g. the simgraph Jaccard threshold would
    // silently keep serving edges built at the old threshold until
    // someone remembered to bump the global salt (round-13 advice).
    val sig = s"v3:$params:" + deepSig(new java.io.File(s"$dir/$srcRel"))
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(new java.io.File(dir).getAbsolutePath.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val out = s"$outBase/$digest"
    val marker = Paths.get(out, "_graft_sig")
    def current(): Boolean =
      Files.exists(marker) && Files.readString(marker) == sig
    if (current()) return out
    val monitor =
      buildMonitors.computeIfAbsent(out, _ => new Object)
    monitor.synchronized {
      if (current()) return out
      Files.createDirectories(Paths.get(outBase))
      val lockPath = Paths.get(outBase, s".$digest.lock")
      val ch = java.nio.channels.FileChannel.open(lockPath,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val lk = ch.lock() // blocks until any other PROCESS's build ends
        try {
          if (!current()) {
            // a missing/stale marker means whatever sits at `out` is a
            // different signature's artifact or a crashed build's debris
            // — clear it, or append-mode artifacts written during the
            // rebuild (tombstones, band appends) would inherit rows from
            // the previous build (round-12 advice)
            Files.deleteIfExists(marker)
            MaintenanceIo.deleteDir(out)
            build(out)
            val tmp = Paths.get(out,
              s"_graft_sig.tmp.${ProcessHandle.current().pid()}")
            Files.writeString(tmp, sig)
            Files.move(tmp, marker, StandardCopyOption.REPLACE_EXISTING,
              StandardCopyOption.ATOMIC_MOVE)
          }
        } finally lk.release()
      } finally ch.close()
    }
    out
  }

  /** q82's pass-1 frame: the ONE aggregate job computing N and the
    * k=2048-counter Misra-Gries candidate summary. The query builder
    * EXECUTES this (driver collect of a driver-sized-by-construction
    * result), so the frame q82 returns never carries this subplan —
    * factored out and exposed through [[auditPlans]] so the plan stays
    * visible to Explain --audit's smell scan.
    */
  private def q82Pass1(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
    toks.agg(
      count(lit(1)).as("n"),
      graft.functions.AggFunctions.frequentCandidates(col("tok"), 2048)
        .as("cand"))
  }

  /** Plans a query builder executes DURING construction (driver-collected
    * boundary scalars) that its returned frame does not carry. Explain
    * --audit scans these alongside [[queries]] so a scale regression in a
    * hidden pass cannot slip past the smell scan. Keys are
    * `<queryName>#<passName>`.
    */
  /** q129's sweep inputs (points, probes) — ONE construction shared by
    * the declared query and the #cuts audit pass, so the audited
    * construction-time plan is the plan that actually runs (r19 advice:
    * the old audit entry re-approximated the cut pass inline and could
    * stay green while the real pass drifted).
    */
  private def q129SweepInputs(s: SparkSession,
                              dir: String): (DataFrame, DataFrame) = {
    val pts = Tables.lineitem(s, dir).select(col("l_returnflag"),
        col("l_extendedprice").as("v"), lit(1L).as("n_pairs"),
        round(col("l_quantity") * lit(10000.0)).cast("long").as("sq"))
      .filter(col("v").isNotNull)
    val bands = Tables.orders(s, dir).select(
        (col("o_totalprice") * lit(0.999)).as("lo"),
        (col("o_totalprice") * lit(1.001)).as("hi"),
        col("o_orderpriority"))
      .filter(col("lo").isNotNull && col("hi").isNotNull &&
        col("lo") <= col("hi"))
    val probes = bands.select(col("o_orderpriority"), col("hi").as("x"),
        lit(1L).as("sgn"), lit(true).as("le"))
      .unionByName(bands.select(col("o_orderpriority"),
        col("lo").as("x"), lit(-1L).as("sgn"), lit(false).as("le")))
    (pts, probes)
  }

  /** q133's sweep inputs (two-sided distribution, probes) — shared by
    * the declared query and the #cuts audit pass (see [[q129SweepInputs]]).
    */
  private def q133SweepInputs(s: SparkSession,
                              dir: String): (DataFrame, DataFrame) = {
    val li = Tables.lineitem(s, dir).select(
        (col("l_extendedprice") * lit(0.9995)).as("a"),
        (col("l_extendedprice") * lit(1.0005)).as("b"),
        col("l_returnflag"),
        round(col("l_quantity") * lit(10000.0)).cast("long").as("sq"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") <= col("b"))
    val dist = li.select(lit("lo").as("side"), col("l_returnflag"),
        col("a").as("v"), lit(1L).as("n_pairs"), col("sq"))
      .unionByName(li.select(lit("hi").as("side"), col("l_returnflag"),
        col("b").as("v"), lit(1L).as("n_pairs"), col("sq")))
    val bands = Tables.orders(s, dir).select(
        (col("o_totalprice") * lit(0.999)).as("lo"),
        (col("o_totalprice") * lit(1.001)).as("hi"),
        col("o_orderpriority"))
      .filter(col("lo").isNotNull && col("hi").isNotNull &&
        col("lo") <= col("hi"))
    val probes = bands.select(lit("lo").as("side"),
        col("o_orderpriority"), col("hi").as("x"),
        lit(1L).as("sgn"), lit(true).as("le"))
      .unionByName(bands.select(lit("hi").as("side"),
        col("o_orderpriority"), col("lo").as("x"),
        lit(-1L).as("sgn"), lit(false).as("le")))
    (dist, probes)
  }

  def auditPlans: Map[String, (SparkSession, String) => DataFrame] =
    // every checkpoint-before-sort query's FULL pre-sort plan audits as
    // `<name>#pre` — those returned plans are checkpoint stubs (the
    // q138/q160 class), and a hidden heavy plan must not slip the scan
    auditPlansBase ++ preSortBodies.map { case (k, f) => s"$k#pre" -> f }

  /** Pre-sort bodies of the queries that MATERIALIZE before their
    * determinism ORDER BY (r20, guide §2.4): a global Sort's
    * range-sampling pass re-executes the final query stage, and for
    * these rows that stage held real compute (q139's verify-join tail,
    * q161's two-snapshot edge diff). Each declared query runs
    * `body.localCheckpoint().orderBy(...)` — result-sized, INSIDE the
    * timed region (an intra-query pin, the q138 precedent; never a
    * cross-run cache). Measured isolated median-of-3 (bench/
    * r20_sorttail_{before,after}.json): q139 5.85→5.03 s,
    * q161 6.27→5.68 s. The SAME treatment was probed and REJECTED for
    * eight more sort-tail rows (q25/q28/q53/q64/q71/q88/q119/q137):
    * their sampling re-runs ride reused shuffle outputs, so the
    * checkpoint only added a materialization (q137 5.70→7.00 s,
    * q119 3.73→4.60 s — same artifacts) — kept inline there.
    */
  private def preSortBodies
      : Map[String, (SparkSession, String) => DataFrame] = Map(
    "q139_exact_jaccard_join" -> ((s, dir) =>
      Dedup.exactJaccardJoin(Tables.documents(s, dir), "doc_id", "text",
        threshold = simGraphThreshold,
        shingleWidth = simGraphShingleWidth)),
    "q161_simgraph_snapshot_diff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      // core: text identical in both snapshots; ch1/ch2: per-version
      // content of the churned ids (%10==4 removed by v2, %10==7 absent
      // from v1, %10==5 edited in v2)
      val core = docs.filter(col("doc_id") % 10 =!= 4 &&
        col("doc_id") % 10 =!= 5 && col("doc_id") % 10 =!= 7)
      val ch1 = docs.filter(col("doc_id") % 10 === 4 ||
        col("doc_id") % 10 === 5)
      val ch2 = docs.filter(col("doc_id") % 10 === 7)
        .unionByName(docs.filter(col("doc_id") % 10 === 5)
          .select(col("doc_id"),
            concat(col("text"), lit(" v2edit")).as("text")))
      Dedup.snapshotEdgeDiff(core, ch1, ch2, "doc_id", "text",
        simGraphThreshold, simGraphShingleWidth)
    }))

  /** `preSortBodies(name)` materialized then totally ordered — the
    * declared-query form of the checkpoint-before-sort rows.
    */
  private def checkpointedSort(name: String, sortCols: String*)
      : (SparkSession, String) => DataFrame =
    (s, dir) => preSortBodies(name)(s, dir).localCheckpoint()
      .orderBy(sortCols.map(col): _*)

  private def auditPlansBase
      : Map[String, (SparkSession, String) => DataFrame] = Map(
    "q82_heavy_hitters#pass1" -> ((s, dir) => q82Pass1(s, dir)),
    // the SimGraphIndex append's construction-time plan (probe-prefix vs
    // stored postings) — the artifact's cachedBuild runs first if needed
    "q154_simgraph_incremental#append" -> ((s, dir) =>
      operators.SimGraphIndex.auditAppendPlan(s, simGraphIndexArtifact(s, dir),
        Tables.documents(s, dir).filter(col("doc_id") % 20 === 16),
        "doc_id", "text")),
    // q95's per-round construction-time passes: the vocab-bounded
    // pair-count aggregate every round argmaxes (1-row driver collect),
    // scanned here in its round-1 shape — later rounds differ only in the
    // narrow merge projections layered on the checkpointed vocab.
    "q95_bpe_merges#pairs" -> ((s, dir) =>
      operators.Bpe.pairCounts(operators.Bpe.initialVocab(
        operators.Bpe.wordFreq(Tables.documents(s, dir), "text")))),
    // q101's bloom build (cachedBuild pass): one key-column aggregate
    // folding the corpus into the persisted filter — sizing literals are
    // stand-ins here (the real build derives them from the count pass).
    "q101_bloom_ingest#build" -> ((s, dir) =>
      operators.Dedup.exactBloomAggFrame(
        Tables.documents(s, dir).select("doc_id", "text")
          .filter(col("doc_id") % 10 =!= 7),
        "text", n = 1000L, numBits = 10000L)),
    // q114's cut-point pass (construction-time 1-row collect): the
    // approximate-percentile aggregate over the distinct-value histogram
    // that buckets the exact-KS cumulative — bounded boundary scalars,
    // cut placement only load-balances (any monotone bucketing yields
    // the identical statistic).
    "q114_value_drift#cuts" -> ((s, dir) =>
      operators.Relational.ksCutsFrame(
        Tables.events(s, dir)
          .select((col("user_id") % 2).as("side"), col("value"))
          .groupBy("value").agg(
            sum(when(col("side") === 0, 1L).otherwise(0L)).as("ca"),
            sum(when(col("side") === 1, 1L).otherwise(0L)).as("cb")),
        "value", 32)),
    // q129/q133's sweep cut-point pass (construction-time 1-row collect
    // inside Relational.rankSweepAgg): approximate percentiles over the
    // ACTUAL cut source the operator builds — the collapsed value
    // distribution ∪ distinct probe points (rankSweepCutSource over
    // rankSweepCollapsed, the exact construction rankSweepAgg calls, fed
    // by the same shared input builders as the declared queries — r19
    // advice: no inline re-approximation that could stay green while the
    // real pass drifts). Bounded boundary scalars; cut placement only
    // load-balances (any monotone bucketing yields identical ranks —
    // the q114 adjudication, same ksCutsFrame machinery).
    "q129_range_join_bands#cuts" -> ((s, dir) => {
      val (pts, probes) = q129SweepInputs(s, dir)
      operators.Relational.ksCutsFrame(
        operators.Relational.rankSweepCutSource(
          operators.Relational.rankSweepCollapsed(
            pts, Seq("l_returnflag"), "v", Seq("n_pairs", "sq")),
          "v", probes, "x"),
        "__swv", 1024)
    }),
    "q133_interval_overlap_join#cuts" -> ((s, dir) => {
      val (dist, probes) = q133SweepInputs(s, dir)
      operators.Relational.ksCutsFrame(
        operators.Relational.rankSweepCutSource(
          operators.Relational.rankSweepCollapsed(
            dist, Seq("l_returnflag", "side"), "v", Seq("n_pairs", "sq")),
          "v", probes, "x"),
        "__swv", 1024)
    }),
    // q160's scoring join + bounded-heap top-k (the plan that runs
    // BEFORE the tail localCheckpoint — the returned query's plan shows
    // only the checkpoint scan + sort, the q138 precedent): the full
    // shuffle/broadcast shape of the batch kNN self-join stays under the
    // smell scan here.
    "q160_knn_join#knnjoin" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val idx = cachedBuild(dir, "embeddings.parquet",
          "target/q160_knn_idx", params = "ivf:nlists=8:knn") { p =>
        operators.Similarity.buildIvfIndex(emb, p, nLists = 8)
      }
      operators.Similarity.ivfKnnJoinFromIndex(idx, emb, k = 5, nProbe = 8)
    }),
    // q176's quantized batch kNN kernel (two-pass int8 filter + exact
    // refine): consumed inside semanticDedupApplyQuantized before the
    // component loop's checkpoints, so the RETURNED q176 plan never
    // shows it — registered here so the code-scan passes (incl. the r20
    // cell-pinned repartition) stay under the smell scan.
    "q176_semdedup_quantized#knnjoin" -> ((s, dir) => {
      val corpus = neardupCorpus(s, dir)
      val idx = cachedBuild(dir, "embeddings.parquet",
          "target/q176_semdedup_quant",
          params = "quant.v2:nlists=8:semdedup") { p =>
        operators.Similarity.buildQuantizedIndex(corpus, p, nLists = 8)
      }
      operators.Similarity.quantizedKnnJoinFromIndex(idx, corpus, k = 5,
        nProbe = 8)
    }),
    // q138's per-iteration plan (construction-time: every round runs
    // between localCheckpoints, so the returned query's plan shows only
    // the final checkpoint scan): one node-keyed join + map-side-combined
    // sum; the 1-row dangling aggregate crosses back via broadcast.
    "q138_pagerank_centrality#iter" -> ((s, dir) => {
      val ol = Tables.orders(s, dir).join(Tables.lineitem(s, dir),
        col("o_orderkey") === col("l_orderkey"))
      operators.Graph.iterationFrame(
        ol.select(col("o_custkey").as("src"),
          (col("l_suppkey") + lit(10000000L)).as("dst")),
        "src", "dst")
    }),
    // q140's per-round peel (round-1 shape, construction-time between
    // checkpoints): two node-keyed semi-joins + one map-side-combined
    // degree count — survivor rows only, never edge-sized state.
    "q140_graph_kcore#round" -> ((s, dir) => {
      val ol = Tables.orders(s, dir).join(Tables.lineitem(s, dir),
        col("o_orderkey") === col("l_orderkey"))
      val e0 = ol.select(col("o_custkey").as("src"),
        (col("l_suppkey") + lit(10000000L)).as("dst"))
      val e = e0.unionByName(e0.select(col("dst").as("src"),
          col("src").as("dst")))
        .filter(col("src") =!= col("dst")).dropDuplicates("src", "dst")
      val alive = e.select(col("src").as("node")).dropDuplicates("node")
      operators.Graph.kCoreRound(e, alive, 30)
    }),
    // q110's band-index build (cachedBuild pass): the ONE corpus
    // sketch+explode pass every later ingest amortizes — narrow kernels,
    // no shuffle at all (the write is partition-local).
    "q110_lsh_index_ingest#build" -> ((s, dir) =>
      operators.Dedup.lshBandRows(
        Tables.documents(s, dir).select("doc_id", "text")
          .filter(col("doc_id") % 10 =!= 7),
        "doc_id", "text", shingleWidth = 3, bands = 32, rowsPerBand = 4,
        normalize = false)))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries ++ analyticsExtraQueries

  private def baseQueries
      : Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Aggregations (SURVEY §2.4) ------------------------------------
    // TPC-H-Q1-shaped pricing summary: groupBy + sum/avg/count with derived
    // measures. Ref shape: claims distribution tables Claims_Prediction.py:67-77
    // and higgs metric aggregates.
    "q01_pricing_summary" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.groupBy("l_returnflag", "l_linestatus").agg(
          Relational.decSum(col("l_quantity")).as("sum_qty"),
          Relational.decSum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
              (lit(1) - col("l_discount").cast(DecimalType(4, 2))))
            .cast("double").as("sum_disc_price"),
          Relational.decAvg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Top-N-per-group as a window function (idiomatic upgrade of
    // log_mining_analysis.py:43-51's three filtered+sorted frames).
    "q02_top_users_per_type" -> ((s, dir) => {
      val counts = Tables.events(s, dir)
        .groupBy("event_type", "user_id").agg(count(lit(1)).as("cnt"))
      Relational.topKPerGroup(counts, Seq("event_type"), col("cnt"), 3,
          Seq(col("user_id")))
        .withColumn("rn", col("rn").cast("long"))
        .select("event_type", "user_id", "cnt", "rn")
        .orderBy("event_type", "rn")
    }),

    // Distribution + percentage column (Claims_Prediction.py:46-47,67-77).
    "q03_status_distribution" -> ((s, dir) =>
      Relational.distributionWithPct(Tables.orders(s, dir), "o_orderstatus")),

    // ---- Projection / filter / predicate pushdown (SURVEY §2.2) --------
    // Filter + narrow projection; PushedFilters + 3-column ReadSchema reach
    // the parquet scan. Ref shape: log_mining_analysis.py:32-34,113.
    "q04_filter_pushdown" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1999-01-01").cast("timestamp") &&
                col("l_discount") > 0.05)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")),

    // ---- Joins (SURVEY §2.3) -------------------------------------------
    // 4-way inner equi-join; nation/region auto-broadcast (Catalyst size
    // threshold), orders⋈customer shuffles on the key. Ref:
    // als_clustering_analysis.py:129,134-136.
    "q05_revenue_by_nation" -> ((s, dir) => {
      val o = Tables.orders(s, dir); val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir); val r = Tables.region(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_orders"),
             Relational.decSum(col("o_totalprice")).as("revenue"))
        .orderBy("r_name", "n_name")
    }),

    // ---- split + explode + count (SURVEY §2.8 F2/F5; als:138-144) ------
    "q06_name_token_count" -> ((s, dir) =>
      Relational.tokenExplodeCount(Tables.part(s, dir), "p_name", " ", 10)),

    // ---- Sorts / limits / temporal prefix split (SURVEY §2.6, §2.9 D3) -
    "q07_temporal_prefix" -> ((s, dir) => {
      val (train, _) = Relational.temporalPrefixSplit(
        Tables.events(s, dir), "ts", "event_id", 100)
      train.select("event_id", "user_id", "event_type").orderBy("event_id")
    }),

    // ---- Set ops (SURVEY §2.7): EXCEPT-DISTINCT (als:49 semantics) -----
    "q08_except_users" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      e.select("user_id").distinct()
        .except(e.filter(col("event_type") === "purchase" && col("value") > 195)
          .select("user_id").distinct())
        .orderBy("user_id")
    }),

    // unionAll accumulation (Claims_Prediction.py:52-53).
    "q09_union_status" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      o.filter(col("o_totalprice") > 200000)
        .unionAll(o.filter(col("o_orderstatus") === "F"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus")
    }),

    // distinct after join (als_clustering_analysis.py:127).
    "q10_distinct_nation" -> ((s, dir) => {
      val c = Tables.customer(s, dir); val n = Tables.nation(s, dir)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .select("n_name").distinct().orderBy("n_name")
    }),

    // Anti/semi joins — the scalable NOT IN / EXISTS shapes.
    "q11_customers_no_orders" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_totalprice") > 450000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),
    "q12_customers_big_orders" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    // ---- Scalar functions (SURVEY §2.8) --------------------------------
    // regexp_extract (log_mining_analysis.py:24-26).
    "q13_regex_first_word" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(regexp_extract(col("text"), "^([a-z]+)", 1).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))),

    // when/otherwise + ln (Claims_Prediction.py:35-38).
    "q14_case_when_log" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .withColumn("high_disc",
          when(col("l_discount") > 0.05, 1.0).otherwise(0.0))
        .withColumn("pp_qty",
          when(col("l_quantity") === 0, 0.5).otherwise(col("l_quantity")))
        .withColumn("log_qty", round(log(col("pp_qty")), 6))
        .groupBy("high_disc")
        .agg(count(lit(1)).as("cnt"),
             min(col("log_qty")).as("min_log_qty"),
             max(col("log_qty")).as("max_log_qty"),
             Relational.decSum(col("pp_qty")).as("sum_pp_qty"))
        .orderBy("high_disc")),

    // split + element_at(-1) (log_mining_analysis.py:27-28, modernized F3).
    "q15_last_token" -> ((s, dir) =>
      Tables.part(s, dir)
        .select(element_at(split(col("p_name"), " "), -1).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok"))),

    // day×hour heatmap aggregate (log_mining_analysis.py:113-118), on real
    // timestamps instead of regex-parsed strings.
    "q16_day_hour_heatmap" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(dayofmonth(col("ts")).cast("long").as("d"),
                hour(col("ts")).cast("long").as("h"))
        .groupBy("d", "h").agg(count(lit(1)).as("cnt"))
        .orderBy("d", "h")),

    // Global aggregates incl. countDistinct (log:40,60-62; SURVEY A5-A7).
    "q17_global_stats" -> ((s, dir) =>
      Tables.events(s, dir).agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("user_id")).as("users"),
        min(col("value")).as("v_min"),
        max(col("value")).as("v_max"),
        Relational.decSum(col("value")).as("v_sum"))),

    // Tumbling event-time window — the streaming-ready aggregate (batch
    // form; same plan works under readStream+watermark, see streaming pkg).
    "q18_hourly_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
             Relational.decSum(col("value")).as("v_sum"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
                col("event_type"), col("cnt"), col("v_sum"))
        .orderBy("win_start", "event_type")),

    // Sliding event-time windows (1 h width, 15 min slide) — each event
    // lands in 4 windows; the oracle reproduces Spark's epoch-aligned
    // window-start arithmetic exactly in integer microseconds.
    "q48_sliding_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
            .as("win_start"),
          col("event_type"), col("cnt"))
        .orderBy("win_start", "event_type")),

    // Gap-based sessionization in batch: new session after >30 min of
    // per-user silence; pure window functions, exact integer time math.
    "q49_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, dir)
        .withColumn("tus", unix_micros(col("ts")))
        .withColumn("new_sess",
          when(col("tus") - lag("tus", 1).over(byUser) > 1800000000L, 1L)
            .otherwise(lit(0L)))
        .withColumn("sess",
          sum("new_sess").over(byUser.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sess")
        .agg(count(lit(1)).as("n_events"),
          (max("tus") - min("tus")).as("duration_us"))
        .select(col("user_id"), col("sess"), col("n_events"),
          col("duration_us"))
        .orderBy("user_id", "sess")
    }),

    // ---- SCRIPT-MIX PROFILE (multilingual curation signal) --------------
    // Per-document Unicode-script composition: codepoint counts per
    // script class (Latin / CJK / Cyrillic / Greek / digit / whitespace /
    // other), Shannon entropy of the distribution, dominant script, and
    // a mixed-script flag (second-largest letter script >= 5 chars AND
    // >= 5 % of the doc) — the signal that catches boilerplate-wrapped
    // translations, spam stitching, and mojibake before a language-pure
    // corpus trains on them. Counts come from length-difference over
    // codegen'd regexp_replace (Java script classes are codepoint-aware,
    // so supplementary-plane chars count once — verified equal to
    // DuckDB's RE2 classes on CJK/emoji; the mixed-corpus gate exercises
    // exactly that). Entropy is ONE fixed left-assoc expression both
    // engines evaluate in the same term order, 6 dp. Pure per-row map —
    // no shuffle but the final sort; at 100 TB this is a free rider on
    // any corpus scan.
    "q158_script_mix" -> ((s, dir) => {
      val counted = Tables.documents(s, dir)
        .filter(length(col("text")) > 0)
        .withColumn("n", length(col("text")).cast("long"))
        .withColumn("n_latin", (col("n") - length(regexp_replace(
          col("text"), lit("[\\p{IsLatin}]"), lit("")))).cast("long"))
        .withColumn("n_cjk", (col("n") - length(regexp_replace(col("text"),
          lit("[\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}]"),
          lit("")))).cast("long"))
        .withColumn("n_cyrillic", (col("n") - length(regexp_replace(
          col("text"), lit("[\\p{IsCyrillic}]"), lit("")))).cast("long"))
        .withColumn("n_greek", (col("n") - length(regexp_replace(
          col("text"), lit("[\\p{IsGreek}]"), lit("")))).cast("long"))
        .withColumn("n_digit", (col("n") - length(regexp_replace(
          col("text"), lit("[0-9]"), lit("")))).cast("long"))
        .withColumn("n_space", (col("n") - length(regexp_replace(
          col("text"), lit("[\\s]"), lit("")))).cast("long"))
        .withColumn("n_other", col("n") - col("n_latin") - col("n_cjk") -
          col("n_cyrillic") - col("n_greek") - col("n_digit") -
          col("n_space"))
      counted.select(col("doc_id"), col("n").as("n_chars"),
          col("n_latin"), col("n_cjk"), col("n_cyrillic"), col("n_greek"),
          col("n_digit"), col("n_space"), col("n_other"),
          expr(scriptEntropyExpr).as("script_entropy"),
          expr(dominantScriptExpr).as("dominant_script"),
          expr(mixedScriptExpr).as("is_mixed"))
        .orderBy("doc_id")
    }),

    // ---- SESSION TRANSITION MATRIX (first-order Markov) -----------------
    // Product-analytics companion to q49/q145: within each 30-min
    // session, count (event_type -> next event_type) transitions and the
    // exact ppm transition probability per source type. Scale shape: the
    // same per-user windows as q49 (group size = one user's events, no
    // corpus-wide key), then two map-side-combined aggregates over the
    // tiny (from, to) matrix; the per-from totals broadcast back. No
    // session state ever leaves its user partition.
    "q156_session_transitions" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val ev = Tables.events(s, dir)
        .withColumn("tus", unix_micros(col("ts")))
        .withColumn("new_sess",
          when(col("tus") - lag("tus", 1).over(byUser) > 1800000000L, 1L)
            .otherwise(lit(0L)))
        .withColumn("sess",
          sum("new_sess").over(byUser.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)))
      val bySess = Window.partitionBy("user_id", "sess")
        .orderBy("ts", "event_id")
      val tr = ev
        .withColumn("to_type", lead("event_type", 1).over(bySess))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n_trans"))
      val tot = tr.groupBy("from_type").agg(sum("n_trans").as("n_from"))
      tr.join(broadcast(tot), Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("n_trans"),
          expr("n_trans * 1000000 div n_from").as("p_ppm"))
        .orderBy("from_type", "to_type")
    }),

    // ---- North-star: exact dedup (hash-groupBy) ------------------------
    "q19_dedup_exact" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy("text")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("copies"))
        .select("keep_id", "copies").orderBy("keep_id")),

    // ---- North-star: text quality scoring ------------------------------
    "q20_text_quality" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_m"),
        size(split(trim(col("text")), " ")).cast("long").as("n_words"),
        ((length(col("text")) - length(regexp_replace(col("text"), "the", ""))) / 3)
          .cast("long").as("n_the"))
        .orderBy("doc_id")),

    // ---- North-star: token counting per language -----------------------
    "q21_token_stats" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("n_tok", size(split(trim(col("text")), " ")).cast("long"))
        .groupBy("lang")
        .agg(count(lit(1)).as("docs"),
             sum(col("n_tok")).as("tot_tokens"),
             (sum(col("n_tok")).cast("double") / count(lit(1))).as("avg_tokens"))
        .orderBy("lang")),

    // ---- North-star: MinHash-LSH near-dup (estimated jaccard). Oracle =
    // full-quadratic signature comparison in DuckDB (minhashOracleSql):
    // the banding must not miss a θ=0.5 pair ------------------------------
    "q22_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashPairs(Tables.documents(s, dir), "doc_id", "text",
          threshold = 0.5)
        .orderBy("id_a", "id_b")),

    // ENGINEERED-recall twin of q22 (round 7): geometry from
    // Dedup.bandsFor(0.5, r=2) — 49 bands of 2 rows, so a pair at
    // estimated Jaccard exactly 0.5 is missed with (1-0.5²)^49 ≤ 1e-6,
    // a STRUCTURAL bound where q22's 32×4 no-miss at θ=0.5 is
    // fixture-verified only (a borderline pair dodges its banding with
    // ≈13% probability). Same full-quadratic oracle shape, re-derived at
    // k = 2·bandsFor = 98 signature positions — a hash-green row proves
    // the engineered banding lost no pair, closing the round-6 RECALL
    // CAVEAT with a gated query instead of a scaladoc disclaimer. ------
    "q80_dedup_minhash_geared" -> ((s, dir) => {
      val rows = 2
      val bands = Dedup.bandsFor(0.5, rows) // 49: (1-0.25)^49 <= 1e-6
      Dedup.minhashPairs(Tables.documents(s, dir), "doc_id", "text",
          threshold = 0.5, shingleWidth = 3, bands = bands,
          rowsPerBand = rows)
        .orderBy("id_a", "id_b")
    }),

    // ---- North-star: SimHash near-dup. Oracle = full-quadratic hamming
    // (simhashOracleSql) — exact-recall blocking must lose no pair -------
    "q23_dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text",
          maxHamming = 3)
        .orderBy("id_a", "id_b")),

    // ---- North-star: n-gram-Jaccard dedup, LSH-accelerated; the oracle
    // computes the full quadratic jaccard — the LSH must not miss a pair --
    "q24_dedup_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text",
          threshold = 0.8)
        .orderBy("id_a", "id_b")),

    // ---- North-star: dedup APPLIED — the kept corpus (keep-first) ------
    "q45_dedup_apply" -> ((s, dir) =>
      Dedup.dropNearDuplicates(Tables.documents(s, dir), "doc_id", "text",
          threshold = 0.8)
        .select("doc_id", "lang").orderBy("doc_id")),

    // ---- North-star: dedup CLUSTERS — connected components over the
    // near-dup pair graph (RefinedWeb/SlimPajama-style curation unit).
    // Pair-based keep-first (q45) and cluster-canonical differ exactly on
    // transitive chains (A~B, B~C, no A~C); componentIds resolves them by
    // min-label propagation + pointer jumping (O(log diameter) rounds of
    // bounded shuffle joins). The oracle re-derives the same pairs
    // quadratically in DuckDB and closes them with a RECURSIVE reachability
    // CTE — the engine's iterative labels must equal the true transitive
    // closure's per-component minima, doc for doc -----------------------
    "q64_dedup_components" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val comp = Dedup.componentLabels(docs, "doc_id", "text", threshold = 0.8)
      val sizes = comp.groupBy("component").agg(count(lit(1)).as("csize"))
      comp.join(sizes, Seq("component"))
        .select("doc_id", "component", "csize")
        .orderBy("doc_id")
    }),

    // ---- North-star: dup-cluster SIZE HISTOGRAM (dedup observability) --
    // How much of the corpus sits in near-dup clusters of size k — the
    // number that tells a team whether dedup will shrink the corpus 2%
    // or 40% BEFORE running the rewrite, and whether a giant cluster
    // (boilerplate/spam) dominates. Rides the shared componentLabels
    // stage (one LSH + label-propagation pass); the histogram itself is
    // two count aggregates over (component) then (csize) — label-sized
    // rows, nothing text-sized. Oracle: the q64 recursive closure, then
    // the same double group.
    "q119_cluster_sizes" -> ((s, dir) => {
      val comp = Dedup.componentLabels(Tables.documents(s, dir),
        "doc_id", "text", threshold = 0.8)
      comp.groupBy("component").agg(count(lit(1)).as("csize"))
        .groupBy("csize").agg(count(lit(1)).as("n_clusters"),
          (col("csize") * count(lit(1))).as("n_docs"))
        .orderBy("csize")
    }),

    // ---- North-star: dedup canonical KEEP-BEST — per near-dup component,
    // keep the best copy rather than the first (what a curation pipeline
    // actually ships: among near-identical crawls, keep the longest
    // capture; ranking = UTF-8 octet length desc, doc_id asc tiebreak —
    // byte-based so the mixed-corpus gate exercises it on multi-byte
    // text). One hash-agg over the q64 component labels — max_by on a
    // (blen, -doc_id) struct, NOT a per-component window: partial
    // aggregation runs map-side, so the component shuffle carries one row
    // per component, the shape that survives a corpus where most
    // components are singletons. Oracle = q64's RECURSIVE closure + a
    // ranked window re-deriving the same argmax in DuckDB (strlen = byte
    // length there). ------------------------------------------------------
    "q81_dedup_keep_best" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val comp = Dedup.componentLabels(docs, "doc_id", "text", threshold = 0.8)
      docs.select(col("doc_id"),
          octet_length(col("text")).cast("long").as("blen"))
        .join(comp, Seq("doc_id"))
        .groupBy("component")
        .agg(expr("max_by(doc_id, struct(blen, -doc_id))").as("keep_id"),
             count(lit(1)).as("csize"),
             max("blen").as("keep_octets"))
        .orderBy("component")
    }),

    // ---- North-star: exact φ-heavy hitters via a Misra-Gries sketch ----
    // The two-pass sketch-then-verify shape: pass 1 is ONE aggregate job
    // computing N and a k=2048-counter MG candidate summary (shuffle ≤
    // partitions × k entries, vs one row per distinct token per partition
    // for a plain GROUP BY — the difference between 64k rows and a
    // web-scale vocabulary); pass 2 exact-counts ONLY candidate tokens via
    // a broadcast semi-join. Output is EXACT for every N by arithmetic:
    // decrements require distinct > k, so N ≥ 2049, and for N ≥ 1954
    // max(1, N div 1000) > N/2049 ≥ the MG undercount — no qualifying
    // token can be missed. Oracle = the plain exact GROUP BY in DuckDB.
    "q82_heavy_hitters" -> ((s, dir) => {
      import s.implicits._
      val toks = Tables.documents(s, dir)
        .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      // pass 1 is ONE aggregate job whose result is DRIVER-SIZED by
      // construction (a count and ≤ k strings), so it is collected — not
      // persisted (a lazily-built persist can never be unpersisted from
      // inside a query builder and would leak cache across an 85-query
      // suite run). At 100 TB this is the same shape: the MG summary is
      // the whole point — it fits on the driver no matter the corpus.
      // The collect means the RETURNED frame never carries this subplan,
      // so the pass-1 plan is exposed separately via [[auditPlans]] —
      // without that, Explain --audit would only ever see pass 2 and a
      // pass-1 regression would be invisible to the smell scan.
      val row = q82Pass1(s, dir).head()
      val n = row.getLong(0)
      val cand = row.getSeq[String](1)
      toks.join(broadcast(cand.toDF("tok")), Seq("tok"), "left_semi")
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= lit(math.max(1L, n / 1000L)))
        .select(col("tok"), col("cnt"))
        .orderBy(desc("cnt"), asc("tok"))
    }),

    // ---- North-star: Unicode NFC canonicalization (ingest-time) --------
    // Canonically-equivalent byte sequences (composed `á` vs `a`+U+0301)
    // defeat every byte-keyed operator downstream — exact dedup, MinHash
    // shingles, content-hash splits. This is the ingest normalizer as a
    // native codegen'd expression (Spark has no built-in; a UDF would
    // break WholeStageCodegen). The fixture is ASCII (= already NFC), so
    // the query PLANTS decomposed sequences both engines derive
    // identically — every 'a' becomes 'a'+combining-acute — then proves
    // real composition happened: norm_chars < decomp_chars by exactly the
    // number of planted pairs, and the prefix carries the composed bytes
    // through the driver's value hash. The mixed-corpus gate re-runs this
    // on CJK/emoji text. Pure narrow map over the scan; no shuffle.
    "q83_nfc_normalize" -> ((s, dir) => {
      val decomp = regexp_replace(col("text"), "a", "a\u0301")
      Tables.documents(s, dir)
        .select(col("doc_id"),
          length(decomp).cast("long").as("decomp_chars"),
          TextFunctions.nfcNormalize(decomp).as("norm"))
        .select(col("doc_id"), col("decomp_chars"),
          length(col("norm")).cast("long").as("norm_chars"),
          octet_length(col("norm")).cast("long").as("norm_octets"),
          substring(col("norm"), 1, 40).as("prefix"))
        .orderBy("doc_id")
    }),

    // ---- North-star: NORMALIZED-KEY exact dedup (q83 closing the loop).
    // The ingest normalizer wired into the dedup path it was built for
    // (Dedup.exact(nfc = true); the minhash family takes the same
    // `normalize` flag). The fixture is ASCII, so the query PLANTS the
    // failure: a composed twin (every 'a' \u2192 U+00E1 '\u00e1') and a decomposed
    // twin (every 'a' \u2192 'a'+U+0301) of each document \u2014 canonically equal,
    // byte-different. Un-normalized exact dedup keeps them apart; the
    // NFC key collapses each twin pair to one group (copies = 2 for every
    // 'a'-bearing doc), keep-first lands on the composed id. The oracle
    // re-derives the same corpus and key with DuckDB's nfc_normalize \u2014
    // Unicode freezes canonical composition for assigned code points, so
    // the grouping must agree exactly.
    "q83b_dedup_normalized" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val composed = docs.select((col("doc_id") + 1000000L).as("doc_id"),
        regexp_replace(col("text"), "a", "\u00e1").as("text"))
      val decomposed = docs.select((col("doc_id") + 2000000L).as("doc_id"),
        regexp_replace(col("text"), "a", "a\u0301").as("text"))
      val corpus = docs.unionByName(composed).unionByName(decomposed)
      Dedup.exact(corpus, "text", "doc_id", nfc = true)
        .select(col("keep_id"), col("copies"),
          octet_length(col("text")).cast("long").as("key_octets"))
        .orderBy("keep_id")
    }),

    // ---- North-star: LEAKAGE-SAFE grouped split ------------------------
    // The classic eval-contamination bug: q62-style per-document hash
    // splits put near-duplicate twins on OPPOSITE sides of train/test, so
    // the held-out set is silently memorized. The fix a curation pipeline
    // ships: hash the CANONICAL COMPONENT label (q64's connected-component
    // id over the ≥0.8 Jaccard pair graph), so every near-dup cluster
    // moves as a unit — by construction no edge can straddle the boundary.
    // Cost over q62 is exactly the component labeling (already a suite
    // operator); the split itself stays a narrow map on the fnvBucket
    // stream, partition-independent and re-derivable in DuckDB (closure +
    // octet-FNV on the component id). 90/10 at seed 71.
    "q86_leakage_safe_split" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.componentLabels(docs, "doc_id", "text", threshold = 0.8)
        .select(col("doc_id"), col("component"),
          when(Relational.fnvBucket(col("component"), 71L) < 900000L, "train")
            .otherwise("test").as("side"))
        .orderBy("doc_id")
    }),

    // ---- North-star: FUZZY decontamination (bipartite near-dup) --------
    // q66 catches verbatim benchmark leakage (exact 8-gram overlap); a
    // PARAPHRASED eval document shares no exact 8-gram but sits at
    // shingle-Jaccard ≥ 0.8 — this is the near-dup analogue every
    // curation pipeline runs beside the exact pass. Corpus = the q66
    // corpus slice (doc_id % 10 <> 7); eval set = PARAPHRASES of the
    // corpus's % 10 = 3 docs (one-token tail appended, id+3e6), so every
    // flagged doc has its paraphrase IN the corpus: jaccard (n-2)/(n-1)
    // for an n-token doc exercises the 0.8 threshold from both sides
    // (docs under 6 tokens fall below), on top of whatever natural
    // near-dups straddle the slices. Plan shape (crossJaccardPairs): eval
    // bands+shingles BROADCAST, corpus scanned once, verify-at-band-match
    // map-side — the only shuffle is the 24-byte pair distinct, then the
    // per-doc agg. Oracle = the full quadratic corpus × eval Jaccard.
    "q84_fuzzy_decontam" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val corpus = docs.filter(col("doc_id") % 10 =!= 7)
      val evalSet = docs.filter(col("doc_id") % 10 === 3)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(col("text"), lit(" zzevaltail")).as("text"))
      // evalPlan pinned: the eval side is 10% of documents BY CONSTRUCTION
      // (bounded relative to the corpus at every SF we run — ≤112 MiB of
      // band payload even on the x100 fixture), so the auto-guard's
      // estimate job would be pure overhead here; the guard stays the
      // default for library callers (DedupSimilaritySpec pins its refusal).
      Dedup.crossJaccardPairs(corpus, evalSet, "doc_id", "text",
          threshold = 0.8, evalPlan = "broadcast")
        .groupBy(col("id_a").as("doc_id"))
        .agg(count(lit(1)).as("n_eval_matches"),
             max("jaccard").as("max_jaccard"))
        .orderBy("doc_id")
    }),

    // ---- North-star: SEMANTIC decontamination (embedding cosine) -------
    // Completes the decontamination trio: q66 catches verbatim n-gram
    // leakage, q84 catches light paraphrase at shingle-Jaccard ≥ 0.8, and
    // this catches full REWRITES — token-disjoint text whose embedding
    // still sits at cosine ≥ 0.9. Corpus = embeddings with vec_id%10 ≠ 7;
    // eval = derived twins of the %10 = 3 vectors (q61's blend toward the
    // circular rotation, alpha = vec_id%8/20, id+3e6) so twin similarity
    // spreads ~0.88-1.0 and the θ = 0.9 boundary is exercised from both
    // sides. Plan (crossCosineMatches): eval broadcast with its vectors,
    // corpus scanned once — |eval| codegen'd dot products per corpus row,
    // zero corpus shuffle, exact by construction. The oracle reproduces
    // the twin blend element-for-element (same IEEE ops in the same
    // order) and the full quadratic corpus × eval cosine.
    "q88_semantic_decontam" -> ((s, dir) => {
      val base = Tables.embeddings(s, dir).select(col("vec_id"),
        VectorFunctions.toDoubleArray(col("embedding")).as("embedding"))
      val corpus = base.filter(col("vec_id") % 10 =!= 7)
      val evalSet = base.filter(col("vec_id") % 10 === 3)
        .withColumn("a", (col("vec_id") % 8).cast("double") / 20.0)
        .select((col("vec_id") + 3000000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (lit(1.0) - col("a")) * x + col("a") *
              element_at(col("embedding"), pmod(i + 1, lit(64)) + 1))
            .as("embedding"))
      // checkEvalSize pinned off: eval = 10% of embeddings by construction
      // (~112 MB of vectors even at x100 — under the broadcast budget at
      // every scale we run), and the guard's estimate aggregate measured
      // ~half this query's time at sf0.1 (round-10 verdict). The guard
      // stays the default for unknown callers; DedupSimilaritySpec asserts
      // it still refuses an oversized eval frame.
      Similarity.crossCosineMatches(corpus, evalSet, threshold = 0.9,
          checkEvalSize = false)
        .orderBy("id_a", "id_b")
    }),

    // ---- North-star: Z-ORDER (Morton) layout key -----------------------
    // The write-side layout primitive for 100 TB tables range-filtered on
    // TWO columns: sort by the bit-interleaved key and every parquet row
    // group's z-range covers a small aligned rectangle in (x, y) space, so
    // min/max stats prune files for 2-D predicates where a plain sort only
    // prunes its leading column (Delta/Iceberg OPTIMIZE ZORDER; measured
    // here by ZOrderScanNote). The fixture keys are small (≤ 2^11 at
    // sf0.01), so the query first SCATTERS them across the full 31-bit
    // domain with Knuth multiplicative hashes — exercising every step of
    // the spread schedule under the oracle, not just the low bits — then
    // emits the row-level z and its t=23 tile (z >> 46 = morton of the
    // top-8-bit tile coords: the locality law LayoutSpec proves for all t).
    // Pure narrow bitwise arithmetic — codegen'd built-ins, no shuffle, no
    // UDF; the DuckDB oracle re-derives the identical fold from the SAME
    // spreadSteps constants (interpolated, so the engines cannot drift).
    "q85_zorder_key" -> ((s, dir) => {
      import graft.functions.LayoutFunctions
      // scatter = Knuth multiplicative hash mod 2^31, with the KEY reduced
      // mod 2^31 BEFORE the multiply: congruence keeps the result identical
      // while (2^31-1) * a ≈ 5.7e18 stays inside a signed long — ANSI-safe
      // at any fixture scale (x10's shifted orderkeys overflowed the naive
      // key * a form; caught by the scale bench, fixed by reduction)
      def scatter(c: Column, a: Long): Column =
        pmod(pmod(c, lit(2147483648L)) * lit(a), lit(2147483648L))
      val li = Tables.lineitem(s, dir)
      li.select(col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          scatter(col("l_orderkey"), 2654435761L).as("x"),
          scatter(col("l_partkey"), 2246822519L).as("y"))
        .withColumn("z", LayoutFunctions.morton(col("x"), col("y")))
        .withColumn("tile", shiftright(col("z"), 46))
        .orderBy("z", "l_orderkey", "l_linenumber")
    }),

    // ---- North-star: fused curation pipeline on SHARED component labels.
    // What q64/q81/q86 compute separately, a production corpus run does
    // ONCE: one shingle-LSH + label-propagation pass (componentLabels —
    // already materialized via its closing localCheckpoint) fans out to
    // every component consumer. Here both decisions a curation pipeline
    // ships — the canonical keep-best copy AND the leakage-safe split
    // side — come off one label frame in one result: one hash-agg (one
    // row per component on the shuffle) + a narrow FNV map on the
    // component key. ComponentShareNote measures the shared stage against
    // the 3× per-consumer recompute; the oracle fuses the q81 and q86
    // CTE chains over the same RECURSIVE closure.
    "q87_curation_pipeline" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val comp = Dedup.componentLabels(docs, "doc_id", "text", threshold = 0.8)
      docs.select(col("doc_id"),
          octet_length(col("text")).cast("long").as("blen"))
        .join(comp, Seq("doc_id"))
        .groupBy("component")
        .agg(expr("max_by(doc_id, struct(blen, -doc_id))").as("keep_id"),
             count(lit(1)).as("csize"),
             max("blen").as("keep_octets"))
        .withColumn("side",
          when(Relational.fnvBucket(col("component"), 71L) < 900000L, "train")
            .otherwise("test"))
        .orderBy("component")
    }),

    // ---- North-star: INCREMENTAL-INGEST dedup (corpus ⋈ new shard) -----
    // The nightly-admission pass a standing 100 TB corpus runs: flag the
    // NEW shard's near-duplicates of the existing corpus and admit the
    // rest — without re-running the corpus self-join (the
    // crossJaccardPairs scaladoc's incremental-ingest contract,
    // Dedup.scala). Shard = paraphrases of the corpus's %10=5 docs (one
    // appended token, id+5e6 — Jaccard (n-2)/(n-1) exercises θ=0.8 from
    // both sides by length) unioned with genuinely-new docs (the %10=7
    // slice the corpus excludes, id+7e6). Plan shape: the SHARD side
    // broadcasts (bands + shingle sets), the corpus is scanned once with
    // verify-at-band-match map-side — per-ingest cost tracks |shard|
    // work against a single corpus scan, never the self-join's band
    // blow-up; the final left-anti admits against the 8-byte flagged-id
    // set. Oracle = full quadratic corpus × shard Jaccard + NOT IN.
    "q89_incremental_ingest" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val corpus = docs.filter(col("doc_id") % 10 =!= 7)
      val shard = docs.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 5000000L).as("doc_id"),
          concat(col("text"), lit(" zzingest")).as("text"))
        .unionAll(docs.filter(col("doc_id") % 10 === 7)
          .select((col("doc_id") + 7000000L).as("doc_id"), col("text")))
      // evalPlan stays "auto" HERE deliberately (unlike q84/q88): the shard
      // is 20% of documents and GROWS with the fixture — on the x100 corpus
      // its estimated band payload crosses the measured 256 MiB broadcast/
      // shuffle boundary (bench/cross_decontam_ab_r8.json), so the guard's
      // reroute is load-bearing, not overhead.
      val flagged = Dedup.crossJaccardPairs(corpus, shard, "doc_id", "text",
          threshold = 0.8)
        .select(col("id_b").as("doc_id")).distinct()
      shard.join(flagged, Seq("doc_id"), "left_anti")
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("blen"))
        .orderBy("doc_id")
    }),

    // ---- North-star: incremental ingest via a PERSISTED LSH index ------
    // q89 re-sketches the standing corpus on EVERY ingest; production
    // amortizes that: Dedup.writeLshBandIndex compiles the corpus into a
    // stored band table once (cachedBuild, the q92/q101 artifact shape),
    // and each shard probes it — candidates from a broadcast-hash join
    // against 16-byte stored rows, exact-Jaccard verify with the shingle
    // kernel runtime-pruned to candidate docs only. Identical sketch
    // geometry ⇒ identical candidate set ⇒ the SAME admission as q89,
    // pinned by sharing q89's full quadratic oracle verbatim.
    "q110_lsh_index_ingest" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val corpus = docs.filter(col("doc_id") % 10 =!= 7)
      val shard = docs.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 5000000L).as("doc_id"),
          concat(col("text"), lit(" zzingest")).as("text"))
        .unionAll(docs.filter(col("doc_id") % 10 === 7)
          .select((col("doc_id") + 7000000L).as("doc_id"), col("text")))
      val idx = cachedBuild(dir, "documents.parquet",
          "target/q110_lsh_index", params = "lsh:w=3:b=32:r=4") { p =>
        Dedup.writeLshBandIndex(corpus, "doc_id", "text", p)
      }
      val flagged = Dedup.lshIndexProbe(corpus, shard, idx,
          "doc_id", "text", threshold = 0.8)
        .select(col("id_b").as("doc_id")).distinct()
      shard.join(flagged, Seq("doc_id"), "left_anti")
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("blen"))
        .orderBy("doc_id")
    }),

    // ---- LSH band-index DELETE: the fuzzy-dedup takedown path ----------
    // q110's stored band index with every OTHER %10=5 corpus doc
    // (doc_id %20=5) tombstoned, completing build/append/probe with
    // delete (round-11 verdict #3). The probe epoch-shadows tombstoned
    // ids out of the candidate set (broadcast join), so shard twins
    // of DELETED docs now admit (their near-dup left the corpus) while
    // twins of kept docs still reject — the oracle replays the full
    // quadratic near-dup admission against the reduced corpus.
    // DedupSimilaritySpec proves compaction folds the tombstones into
    // the stored 16-byte rows with identical admission.
    "q123_lsh_index_delete" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val corpus = docs.filter(col("doc_id") % 10 =!= 7)
      val live = corpus.filter(pmod(col("doc_id"), lit(20)) =!= 5)
      val shard = docs.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 5000000L).as("doc_id"),
          concat(col("text"), lit(" zzingest")).as("text"))
        .unionAll(docs.filter(col("doc_id") % 10 === 7)
          .select((col("doc_id") + 7000000L).as("doc_id"), col("text")))
      val idx = cachedBuild(dir, "documents.parquet",
          "target/q123_lsh_delete", params = "lsh:w=3:b=32:r=4:del=m20e5") { p =>
        Dedup.writeLshBandIndex(corpus, "doc_id", "text", p)
        Dedup.deleteFromLshBandIndex(
          corpus.filter(pmod(col("doc_id"), lit(20)) === 5), "doc_id", p)
      }
      val flagged = Dedup.lshIndexProbe(live, shard, idx,
          "doc_id", "text", threshold = 0.8)
        .select(col("id_b").as("doc_id")).distinct()
      shard.join(flagged, Seq("doc_id"), "left_anti")
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("blen"))
        .orderBy("doc_id")
    }),

    // ---- North-star: Z-ORDER read-through gate -------------------------
    // q85 proves the Morton KEY; this gates the full write→read layout
    // loop: rewrite lineitem z-ordered on (l_partkey, l_suppkey) via
    // Sources.writeZOrdered, then answer a 2-D box aggregate FROM THE
    // WRITTEN COPY — the oracle runs the same predicate over the original
    // fixture, so a green row proves the layout rewrite lost/duplicated
    // nothing while ZOrderScanNote separately measures the min/max
    // pruning the layout buys. The file count is derived from the
    // fixture's byte size against a target file size (the ~128-1024 MiB
    // rule at 100 TB, scaled to 4 MiB here so every SF exercises the
    // multi-file range shuffle), never hard-coded.
    "q90_zorder_scan" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
      val out = cachedBuild(dir, "lineitem.parquet", "target/q90_zorder",
          params = "z=l_partkey,l_suppkey:tb=4194304") {
        p => Sources.writeZOrdered(li, "l_partkey", "l_suppkey", p,
          files = Sources.filesForTargetSize(s"$dir/lineitem.parquet",
            targetBytes = 4L << 20))
      }
      s.read.parquet(out)
        .filter(col("l_partkey").between(20, 120) &&
          col("l_suppkey").between(3, 7))
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast(DecimalType(28, 4)))
            .cast("double").as("qty"))
        .orderBy("l_suppkey")
    }),

    // ---- North-star: TEMPERATURE-balanced domain mixing (α = 0.5) ------
    // q67 mixes at FIXED per-domain rates; production multilingual /
    // multi-domain pretraining derives the rates FROM the corpus with
    // temperature sampling (p_s ∝ n_s^α, α < 1 — XLM-R / mT5 style):
    // keep_rate_s = √(n_min / n_s) at α = 0.5, so effective sizes become
    // √(n_min · n_s) — the geometric interpolation between proportional
    // and uniform. The fixture's lang column is naturally skewed (en is
    // 2-3× the others), so every arm gets a distinct rate. Plan: one
    // tiny per-lang count agg (collected — one row per language, driver-
    // sized by construction, same class as q82's MG summary), rates
    // computed in exact ppm, then the same codegen'd FNV when-chain
    // filter as q67 — the corpus side stays one narrow scan, no shuffle
    // beyond the two bounded per-lang aggs. The oracle re-derives the
    // rates from counts with the same IEEE sqrt and the same FNV stream,
    // and the emitted rate_ppm column pins the derivation itself.
    "q91_temperature_mix" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
      val nMin = counts.map(_._2).min
      val ppm = counts.map { case (l, n) =>
        (l, n, Relational.temperatureRatePpm(nMin, n)) }
      val kept = Relational.mixtureSample(docs, "doc_id", "lang",
          ppm.map { case (l, _, c) => l -> c / 1000000.0 }.toMap,
          defaultRate = 0.0, seed = 43L)
        .groupBy("lang").agg(count(lit(1)).as("kept"))
      ppm.toDF("lang", "total", "rate_ppm")
        .join(kept, Seq("lang"), "left_outer")
        .select(col("lang"), col("total"),
          coalesce(col("kept"), lit(0L)).as("kept"), col("rate_ppm"))
        .orderBy("lang")
    }),

    // ---- North-star: embedding-cosine near-dup -------------------------
    // Gated on the LSH plan (the scale path): OR-amplified hyperplane
    // blocking, recall sized by Dedup.lshTablesFor so a pair at θ=0.5 is
    // missed with p ≤ 1e-6 — the oracle computes the full quadratic cosine
    // in DuckDB, so a hash-green row proves the blocking lost no pair.
    // θ=0.5 (60°) forces few planes per table; at production dedup
    // thresholds (θ ≥ 0.9) the same operator runs 16-plane tables.
    "q25_embed_neardup" -> ((s, dir) =>
      Dedup.embeddingPairs(Tables.embeddings(s, dir), "vec_id", "embedding",
          threshold = 0.5, useLsh = true, dim = 64, planes = 4,
          tables = Dedup.lshTablesFor(0.5, planes = 4))
        .orderBy("id_a", "id_b")),

    // ---- North-star: embedding near-dup, PRODUCTION regime (θ=0.9) -----
    // The configuration a real 100 TB dedup runs: 16-plane tables sized by
    // lshTablesFor(0.9) (miss ≤ 1e-6) — selective buckets, sub-linear
    // candidate growth (vs q25's deliberately-quadratic θ=0.5 recall
    // proof). The fixture has no natural pairs above cosine 0.85, so the
    // query derives deterministic near-dup twins for vec_id < 50 — each a
    // blend of the vector toward its circular rotation, alpha stepping
    // 0→0.35 by vec_id%8/20, spreading twin similarity across ~0.88-1.0 so
    // the θ=0.9 threshold boundary is exercised from both sides. The
    // oracle reproduces the twin derivation element-for-element (same IEEE
    // double ops in the same order) and the full quadratic cosine, so a
    // hash-green row proves the production-regime blocking lost no pair.
    "q61_embed_neardup_prod" -> ((s, dir) =>
      Dedup.embeddingPairs(neardupCorpus(s, dir), "vec_id", "embedding",
          threshold = 0.9, useLsh = true, dim = 64, planes = 16,
          tables = Dedup.lshTablesFor(0.9, planes = 16))
        .orderBy("id_a", "id_b")),

    // Corpus-GEARED variant of q61 (round-6 verdict task 2): identical
    // semantics and oracle, but `planes` comes from Dedup.planesFor(n) —
    // the shuffle-volume arg-min the BENCH_SCALE plane sweep measured
    // (494 s → 101 s at x100) — instead of the pinned 16-plane geometry
    // q61 keeps for cross-scale comparability. The corpus count is one
    // cheap boundary-scalar action (and doubles as the materializer of
    // the persisted corpus); recall is re-sized per planes
    // (lshTablesFor), so the pair set is the same and the q61 oracle
    // gates this row unchanged. At sf0.1 (~20 k vectors) planesFor lands
    // on the same 16 planes — the row exists so the SCALE bench shows the
    // geared factor in artifact JSON, not a test-side note.
    "q61b_embed_neardup_geared" -> ((s, dir) => {
      // persist BEFORE the gearing count: the count is the boundary-scalar
      // action planesFor needs anyway, so it doubles as the materializer —
      // the three consumers inside embeddingPairs then read the derived
      // corpus from cache instead of recomputing union+transform per pass
      // (310→259 s at x100; see neardupCorpus scaladoc for why q61 differs).
      // Cache lifecycle: a lazily-built query can't unpersist after its own
      // action, so the suite runners own it — Bench clears the cache between
      // queries (Bench.scala clearCache) and Verify's single session holds
      // at most this one corpus-sized cache (MEMORY_AND_DISK, spills clean).
      val corpus = neardupCorpus(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val planes = Dedup.planesFor(corpus.count(), threshold = 0.9)
      Dedup.embeddingPairs(corpus, "vec_id", "embedding",
          threshold = 0.9, useLsh = true, dim = 64, planes = planes,
          tables = Dedup.lshTablesFor(0.9, planes))
        .orderBy("id_a", "id_b")
    }),

    // ---- North-star: brute-force cosine top-k ANN baseline -------------
    "q26_sim_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 5)
        .orderBy("q_id", "rn")
    }),

    // ---- North-star: rolling-hash document fingerprint -----------------
    "q27_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextFunctions.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    // ---- North-star: winnowing fingerprint overlap — doc pairs sharing
    // enough MOSS fingerprints (containment detection; oracle re-derives
    // the winnow fingerprint sets independently — winnowOracleSql) -------
    // k=20 chars spans ~3-4 tokens: long enough that fingerprints are
    // discriminative even in a small-vocabulary corpus.
    "q47_winnow_overlap" -> ((s, dir) =>
      Dedup.winnowOverlapPairs(Tables.documents(s, dir), "doc_id", "text",
          k = 20, w = 8)
        .select("id_a", "id_b", "shared")
        .orderBy("id_a", "id_b")),

    // ---- North-star: language-ID heuristic. Oracle re-derives the
    // marker-hit argmax with matching struct-max ties (langidOracleSql) --
    "q28_langid" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang").as("labeled"),
          TextFunctions.langId(TextFunctions.tokens(col("text"))).as("predicted"))
        .groupBy("labeled", "predicted").agg(count(lit(1)).as("cnt"))
        .orderBy("labeled", "predicted")),

    // ==== ML layer (SURVEY §2.10; rows-only checks — no SQL oracle) =====

    // E1+E5+E6+E12: RF pipeline + DataFrame-native confusion matrix.
    "q29_ml_rf_confusion" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("label",
          when(col("l_returnflag") === "N", 1.0).otherwise(0.0))
      val Array(train, test) = li.randomSplit(Array(0.7, 0.3), seed = 40)
      // strip the training summary before serving: its SparkSession
      // reference otherwise rides the prediction UDF's task closure
      // (SummaryBridge scaladoc — "Task not serializable" once any
      // Dataset.observe has touched the session)
      val model = org.apache.spark.ml.graft.SummaryBridge
        .stripTrainingSummaries(ml.Classifiers.randomForest(
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_linenumber"), "label", numTrees = 20).fit(train))
      ml.Classifiers.confusionMatrix(model.transform(test), "label")
    }),

    // E2-E5+E9: claims-style encode pipeline + Poisson GLM; coefficients out.
    "q30_ml_glr_poisson" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      // tiny ridge: regParam=0 triggers Spark's Cholesky→Quasi-Newton
      // retry on near-singular covariance (benign but noisy, and the
      // unregularized solve is numerically fragile at scale)
      val model = ml.Regressors.poissonGlm(
        Seq("l_returnflag", "l_linestatus"),
        Seq("l_discount", "l_tax", "l_extendedprice"),
        "l_quantity", regParam = 0.001, maxIter = 25).fit(li)
      val glm = model.stages.last
        .asInstanceOf[org.apache.spark.ml.regression.GeneralizedLinearRegressionModel]
      val rows = glm.coefficients.toArray.zipWithIndex.map {
        case (c, i) => (i.toLong, BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      import s.implicits._
      rows.toSeq.toDF("coef_idx", "coef").orderBy("coef_idx")
    }),

    // E11+E13+E14: logistic regression + metric suite (incl. both AUCs).
    "q31_ml_logistic_metrics" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .withColumn("label",
          when(col("o_orderstatus") === "F", 1.0).otherwise(0.0))
      val Array(train, test) = o.randomSplit(Array(0.7, 0.3), seed = 40)
      // same summary strip as q29 (LogisticRegressionModel.copy would
      // RE-ATTACH the summary — the bridge is the reliable path)
      val model = org.apache.spark.ml.graft.SummaryBridge
        .stripTrainingSummaries(ml.Regressors.logistic(
          Seq("o_orderpriority"), Seq("o_totalprice"), "label",
          elasticNet = 0.0, maxIter = 25).fit(train))
      val metrics = ml.Classifiers.classificationMetrics(
        model.transform(test), "label", binary = true)
      import s.implicits._
      metrics.toSeq.sortBy(_._1)
        .map { case (k, v) => (k, math.rint(v * 100) / 100) }
        .toDF("metric", "value")
    }),

    // E16: ALS on (customer, part, quantity) implicit ratings; top-3 recs.
    "q32_ml_als_recs" -> ((s, dir) => {
      val ratings = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").cast("int").as("user"),
          col("l_partkey").cast("int").as("item"))
        .agg(avg("l_quantity").as("rating"))
      val model = ml.Recommender.als(rank = 8, maxIter = 5).fit(ratings)
      model.recommendForAllUsers(3)
        .select(col("user"), posexplode(col("recommendations")))
        .select(col("user").cast("long").as("user"),
          (col("pos") + 1).cast("long").as("rank"),
          col("col.item").cast("long").as("item"))
        .orderBy("user", "rank")
    }),

    // E18 (+Q6 array_to_vector): K-Means over the embeddings table.
    "q33_ml_kmeans_embed" -> ((s, dir) =>
      ml.Recommender.clusterEmbeddings(Tables.embeddings(s, dir), k = 8)
        .groupBy("cluster").agg(count(lit(1)).as("cnt"))
        .select(col("cluster").cast("long").as("cluster"), col("cnt"))
        .orderBy("cluster")),

    // E8: CrossValidator grid search (small grid on a sample) + E19 params.
    "q34_ml_cv_best_params" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).sample(0.2, seed = 40)
        .withColumn("label",
          when(col("l_returnflag") === "N", 1.0).otherwise(0.0))
      val cv = ml.Classifiers.rfCrossValidated(
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"), "label",
        numTrees = Seq(5, 10), subsamplingRates = Seq(0.8, 1.0),
        featureSubsetStrategies = Seq("log2", "auto", "all"),
        numFolds = 2).fit(li)
      import s.implicits._
      ml.Classifiers.bestParams(cv).toSeq
        .filter { case (k, _) =>
          Set("numTrees", "subsamplingRate", "featureSubsetStrategy")(k) }
        .map { case (k, v) => (k, v.toString) }
        .sortBy(_._1).toDF("param", "value")
    }),

    // E8's GBT half (higgs_ensemble_analysis.py:119-129 runs the SAME
    // 3-dim CV grid for GBT as for RF): maxIter x maxDepth x
    // subsamplingRate over the q34 sample, seeded, best point reported.
    // `no_oracle` at the driver (rows-only) — GoldenSpec pins the exact
    // winning parameters, closing the one §2 component (round-13 verdict
    // missing #1) whose operator existed but had no query-contract gate.
    "q153_ml_gbt_cv_best_params" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).sample(0.2, seed = 40)
        .withColumn("label",
          when(col("l_returnflag") === "N", 1.0).otherwise(0.0))
      val cv = ml.Classifiers.gbtCrossValidated(
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"), "label",
        maxIters = Seq(2, 4), maxDepths = Seq(2, 3),
        subsamplingRates = Seq(0.8, 1.0), numFolds = 2).fit(li)
      import s.implicits._
      ml.Classifiers.bestParams(cv).toSeq
        .filter { case (k, _) =>
          Set("maxIter", "maxDepth", "subsamplingRate")(k) }
        .map { case (k, v) => (k, v.toString) }
        .sortBy(_._1).toDF("param", "value")
    }),

    // ---- Splits (SURVEY §2.9 D1/D2). q36's bucket hash is the single-
    // sourced FNV-1a stream, so its per-stratum counts are fully oracled
    // (stratifiedSplitOracleSql); only q37 (randomSplit parity) remains
    // partition-dependent rows-only. ---------------------------------------
    "q36_stratified_split_counts" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val (tr, te) = Relational.stratifiedSplit(o, "o_orderstatus", 0.7, 40,
        Seq("o_orderkey"))
      tr.groupBy("o_orderstatus").agg(count(lit(1)).as("tc"))
        .join(te.groupBy("o_orderstatus").agg(count(lit(1)).as("ec")),
          Seq("o_orderstatus"), "outer")
        .select(col("o_orderstatus"),
          coalesce(col("tc"), lit(0L)).as("train_cnt"),
          coalesce(col("ec"), lit(0L)).as("test_cnt"))
        .orderBy("o_orderstatus")
    }),
    // Deterministic content-hash split (D-layer completion): membership is
    // a pure function of the id, so — unlike q36/q37's partition-dependent
    // splits — the FULL train/test assignment is oracle-checkable: DuckDB
    // re-derives the FNV-1a fold per id and must reproduce every row.
    "q62_hash_split" -> ((s, dir) => {
      val (tr, te) = Relational.hashSplit(
        Tables.orders(s, dir), "o_orderkey", 0.7, 40L)
      tr.select(col("o_orderkey"), lit("train").as("side"))
        .unionAll(te.select(col("o_orderkey"), lit("test").as("side")))
        .orderBy("o_orderkey")
    }),

    // ---- North-star: deterministic CORPUS SHUFFLE — contiguous global
    // pseudo-random positions (the shuffle-then-shard step before
    // pre-training), as the rank in (bucket, h, id) order on the
    // hashSplit FNV stream. The scale-correct zipWithIndex: one bucket-
    // partitioned sort + a |buckets|-row prefix sum broadcast back — no
    // global-window funnel, no partition-dependent RDD index. Pure
    // function of (doc_id, seed) → the FULL permutation is
    // oracle-checkable --------------------------------------------------
    "q74_corpus_shuffle" -> ((s, dir) => {
      Relational.shuffleIndex(Tables.documents(s, dir).select("doc_id"),
          "doc_id", buckets = 32, seed = 23L)
        .select(col("doc_id"), col("bucket"), col("pos"))
        .orderBy("pos")
    }),

    // ---- North-star: deterministic FIXED-SIZE sample — exactly k rows,
    // partition-independent (hash-priority bottom-k on the FNV stream;
    // sample() is rate-based and partition-dependent, limit() arbitrary).
    // Plan is a bounded partial top-k, never a global sort. The oracle
    // re-derives every selected id ----------------------------------------
    "q75_priority_sample" -> ((s, dir) => {
      Relational.prioritySample(Tables.documents(s, dir)
          .select("doc_id", "source"), "doc_id", k = 100, seed = 29L)
        .orderBy("doc_id")
    }),

    // ---- North-star: exact-k-PER-GROUP deterministic sample — the
    // balanced-subset primitive (k docs per language for evals/ablations):
    // q75's hash-priority bottom-k applied per group through the
    // topKByScore PARTIAL aggregate, so each input partition contributes
    // at most groups×k entries to the shuffle — never the per-group
    // row_number window, which funnels every row of a group through one
    // reducer. Priority is the same FNV stream as q75 (pure function of
    // (doc_id, seed), partition-independent); ranking is on the DOUBLE
    // image of the hash with id tiebreak, and the oracle replays the
    // identical cast so the two engines order identically -----------------
    "q105_grouped_sample" -> ((s, dir) => {
      val k = 20
      val pr = Tables.documents(s, dir).select(col("lang"), col("doc_id"),
        negate(TextFunctions.fnv64(
            concat(col("doc_id").cast("string"), lit(":31")))
          .cast("double")).as("score"))
      pr.groupBy("lang")
        .agg(graft.functions.AggFunctions
          .topKByScore(col("score"), col("doc_id"), k).as("top"))
        .select(col("lang"), posexplode(col("top")).as(Seq("i", "e")))
        .select(col("lang"), (col("i") + 1).cast("long").as("rank"),
          col("e.n_id").as("doc_id"))
        .orderBy("lang", "rank")
    }),

    // ---- North-star: data-derived PERCENTILE quality gate — the CCNet
    // pattern: the keep threshold is not a constant (q65's Gopher rules)
    // but a percentile OF THE CORPUS (drop the shortest 20% by word
    // count), recomputed per snapshot. Computed EXACTLY without a global
    // sort or approx_percentile drift: word count lives on a bounded
    // domain, so one map-side-combined histogram groupBy + a cumulative
    // sum over the |domain|-row frame (the q74-class bounded partition-
    // less window) yields the exact threshold, broadcast back into the
    // corpus filter — two corpus scans total, zero corpus shuffles ------
    "q107_percentile_gate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val wc = docs.select(col("doc_id"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("wc"))
      val hist = wc.groupBy("wc").agg(count(lit(1)).as("c"))
      val thresh = hist
        .withColumn("cum", sum("c").over(Window.orderBy("wc")))
        .crossJoin(broadcast(hist.agg(sum(col("c")).as("n"))))
        .filter(col("cum") >= ceil(col("n") * lit(0.2)))
        .agg(min("wc").as("t"))
      wc.crossJoin(broadcast(thresh))
        .filter(col("wc") >= col("t"))
        .select(col("doc_id"), col("wc"), col("t"))
        .orderBy("doc_id")
    }),

    // ---- North-star: JSON metadata extraction — the semi-structured
    // side-channel every corpus carries (events.props is a JSON string).
    // get_json_object is Spark's codegen'd path-extraction primitive — a
    // narrow scan-side projection, no UDF, no shuffle until the bounded
    // per-type agg; nulls from unparsable rows are counted out by
    // count(col). DuckDB re-derives with json_extract_string ------------
    "q78_json_props" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(col("k")).as("n_parsed"),
          sum("k").as("k_sum"),
          min("k").as("k_min"), max("k").as("k_max"))
        .orderBy("event_type")),

    // ---- North-star: overlapping DOCUMENT CHUNKING — the RAG/pretraining
    // chunker: 200-char windows every 150 chars (50-char overlap), the
    // final chunk truncating at the text end, short docs yielding one
    // chunk. Per-chunk polynomial fingerprints (the q27 fold on the
    // substring) prove the CONTENT of every chunk, not just its offsets.
    // Pure per-row array math — no shuffle until the final sort ----------
    "q77_doc_chunks" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(TextFunctions.chunks(col("text"),
            chunkSize, chunkStride)).as("c"))
        .select(col("doc_id"), col("c.chunk_id").as("chunk_id"),
          col("c.start").as("start"),
          length(col("c.chunk")).cast("long").as("chunk_len"),
          TextFunctions.fingerprint(col("c.chunk")).as("fp"))
        .orderBy("doc_id", "chunk_id")),

    // ---- Stream-stream interval join, batch-oracled (SURVEY §2.11
    // additive): per click, how many errors the same user hit in the
    // preceding 10 minutes — EventStream.recentPairs, the SAME code
    // StreamingEtlSpec runs as a real watermarked stream. Scale shape:
    // one shuffle of each side on user_id; per-user candidate volume is
    // bounded by rate × window (the interval predicate), and in
    // streaming the same predicate bounds the join STATE ----------------
    "q76_recent_error_counts" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      EventStream.recentPairs(
          e.filter(col("event_type") === "click"),
          e.filter(col("event_type") === "error"),
          windowMinutes = 10, joinType = "left_outer")
        .groupBy("event_id")
        .agg(count(col("r_event")).as("n_recent_errors"))
        .orderBy("event_id")
    }),

    // ---- North-star: Gopher-style repetition quality signals. Per-doc
    // duplicated word-2/3-gram fractions (narrow per-row array math) and
    // the top-token fraction (explode → two bounded aggs keyed by
    // (doc_id, tok) then doc_id — shuffle volume is token counts, never
    // pairwise). Oracle re-derives all three in DuckDB ------------------
    "q63_repetition_signals" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = TextFunctions.tokens(col("text"))
      val perRow = docs.select(col("doc_id"),
        TextFunctions.dupGramFrac(col("text"), 2).as("dup_2gram_frac"),
        TextFunctions.dupGramFrac(col("text"), 3).as("dup_3gram_frac"))
      val top = docs.select(col("doc_id"), explode(toks).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg((max("c").cast("double") / sum("c")).as("top_token_frac"))
      perRow.join(top, Seq("doc_id"))
        .orderBy("doc_id")
    }),

    // ---- North-star: unigram LM surprisal scoring — the CCNet-style
    // model-based quality signal: train a unigram LM on the corpus
    // itself (token relative frequencies; +1-smoothed over the observed
    // vocab) and score each doc by mean token surprisal −log p(tok).
    // Scale shape: the LM is ONE bounded groupBy (vocab-sized, tiny vs
    // corpus) broadcast back to the token stream; per-doc mean comes
    // from a 6-dp-rounded per-token surprisal summed as DECIMAL, so the
    // hash cannot depend on aggregation order. High scores = improbable
    // token streams (gibberish); low = repetitive boilerplate ----------
    "q70_unigram_surprisal" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = docs.select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
      val stats = toks.agg(count(lit(1)).as("n_tokens"),
        countDistinct("tok").as("vocab"))
      val lm = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      toks.join(broadcast(lm), Seq("tok"))
        .crossJoin(broadcast(stats))
        .withColumn("surprisal", round(
          -log((col("cnt") + 1.0) / (col("n_tokens") + col("vocab"))), 6))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"),
          round(sum(col("surprisal").cast(DecimalType(18, 6)))
              .cast("double") / count(lit(1)), 4)
            .as("mean_surprisal"))
        .orderBy("doc_id")
    }),

    // ---- North-star: BIGRAM LM surprisal — q70's model-based quality
    // signal upgraded to first-order context: train an interpolated
    // bigram LM on the corpus itself (Jelinek-Mercer: λ·c(v,w)/c(v·) +
    // (1−λ)·unigram, λ=0.7, unigram +1-smoothed over the observed vocab
    // exactly as q70) and score each doc by mean bigram surprisal
    // −ln p(w|v). Catches what a unigram can't: common words in
    // improbable ORDER (shuffled/templated text) score high while the
    // same bag of words in fluent order scores low. Scale shape: the
    // bigram stream is linear in corpus tokens; c(v,w) is one map-side-
    // combined groupBy and its join back is the stream's only wide join
    // (hot bigrams partial-aggregate map-side, AQE splits skewed join
    // partitions); context counts c(v·) and unigram counts are vocab-
    // sized and broadcast; the corpus stats frame is one row. Per-bigram
    // surprisal rounds to 6 dp and sums as DECIMAL so the hash cannot
    // depend on aggregation order ---------------------------------------
    "q102_bigram_surprisal" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val withToks = docs.select(col("doc_id"),
        TextFunctions.tokens(col("text")).as("t"))
      val toks = withToks.select(col("doc_id"), explode(col("t")).as("tok"))
      val stats = toks.agg(count(lit(1)).as("n_tokens"),
        countDistinct("tok").as("vocab"))
      val uni = toks.groupBy("tok").agg(count(lit(1)).as("cw"))
      val bg = withToks.filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(arrays_zip(
            slice(col("t"), lit(1), size(col("t")) - 1).as("v"),
            slice(col("t"), lit(2), size(col("t")) - 1).as("w"))).as("p"))
        .select(col("doc_id"), col("p.v").as("v"), col("p.w").as("w"))
      val cb = bg.groupBy("v", "w").agg(count(lit(1)).as("cvw"))
      val cv = bg.groupBy("v").agg(count(lit(1)).as("cv"))
      bg.join(cb, Seq("v", "w"))
        .join(broadcast(cv), Seq("v"))
        .join(broadcast(uni.withColumnRenamed("tok", "w")), Seq("w"))
        .crossJoin(broadcast(stats))
        .withColumn("surprisal", round(-log(
          lit(0.7) * (col("cvw").cast("double") / col("cv")) +
            lit(0.3) * ((col("cw") + 1.0) /
              (col("n_tokens") + col("vocab")))), 6))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(sum(col("surprisal").cast(DecimalType(18, 6)))
              .cast("double") / count(lit(1)), 4)
            .as("mean_surprisal"))
        .orderBy("doc_id")
    }),

    // ---- North-star: BM25 ranked retrieval (Robertson/Spärck Jones;
    // k1=1.2, b=0.75) for a fixed term set over the corpus — the search
    // primitive of a data-curation stack. Scale shape: tf is one bounded
    // groupBy on (doc, term-in-query) rows only (the isin filter prunes
    // the explode before any shuffle); the 1-row corpus stats and the
    // |terms|-row df frame broadcast, so the scoring join adds no
    // shuffle. Per-term scores round to 6 dp then sum as DECIMAL —
    // order-independent, so the final hash cannot depend on partial-agg
    // order. Terms single-sourced into the oracle from bm25Terms -------
    "q69_bm25_search" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val withToks = docs.select(col("doc_id"),
        TextFunctions.tokens(col("text")).as("t"))
      val dl = withToks.select(col("doc_id"),
        size(col("t")).cast("long").as("dl"))
      val tf = withToks.select(col("doc_id"), explode(col("t")).as("tok"))
        .filter(col("tok").isin(bm25Terms: _*))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("tot_dl"))
      val dfq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      tf.join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats)).join(broadcast(dfq), Seq("tok"))
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
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }),

    // ---- North-star: SEQUENCE PACKING span assignment — the
    // concatenate-and-cut packing LLM pretraining uses. Docs shard to 8
    // deterministic FNV buckets and pack within shard in doc_id order;
    // `off` is the running token offset (window sum PARTITIONED BY
    // bucket — the scale-correct form: a partition-less running sum
    // funnels the corpus through one reducer), pack_first/pack_last are
    // the ctx=512 windows holding the doc's first/last token, n_cuts how
    // many pack boundaries split the doc. Pure function of (doc_id,
    // n_tok, seed) → fully oracle-checkable ----------------------------
    "q68_sequence_packing" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_tok"))
      Relational.packedSpans(docs, "doc_id", "n_tok",
          buckets = 8, ctx = 512, seed = 17L)
        .select(col("doc_id"), col("bucket").cast("long").as("bucket"),
          col("n_tok"), col("off"), col("pack_first"), col("pack_last"),
          (col("pack_last") - col("pack_first")).as("n_cuts"))
        .orderBy("doc_id")
    }),

    // ---- North-star: NO-SPLIT sequence packing (next-fit bins) ---------
    // q68 concat-and-cuts (docs may straddle windows); this is the other
    // production regime — docs stay WHOLE (instruction tuning, long-
    // context curricula), greedily next-fit into 512-token bins per FNV
    // bucket. The library's one deliberate mapPartitions operator: the
    // fold is inherently sequential per bucket, so the plan is one hash
    // exchange + in-partition sort + O(1)-state streaming fold (see
    // Relational.packBinsNoSplit). Oracle: the identical fold replayed as
    // a DuckDB recursive CTE stepping rn -> rn+1 per bucket.
    "q112_pack_bins" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_tok"))
      Relational.packBinsNoSplit(docs, "doc_id", "n_tok",
          buckets = 8, ctx = 512, seed = 17L)
        .select(col("doc_id"), col("bucket"),
          (col("bucket") * lit(1L << 32) + col("bin")).as("pack_id"),
          col("off"))
        .orderBy("doc_id")
    }),

    // ---- North-star: deterministic domain MIXING — Pile/LLaMA-style
    // per-source sampling rates applied via the hashSplit FNV stream
    // (pure function of (doc_id, seed): partition-independent,
    // re-run-stable — the properties corpus mixing needs and sample()
    // lacks). Rates single-sourced into the oracle from mixRates. The
    // codegen'd when-chain keeps the 100 TB scan shuffle-free; only the
    // per-source count agg shuffles (bounded by |domains|) --------------
    "q67_domain_mixing" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val kept = Relational.mixtureSample(docs, "doc_id", "source",
          mixRates, mixDefaultRate, seed = 41L)
        .groupBy("source").agg(count(lit(1)).as("kept"))
      docs.groupBy("source").agg(count(lit(1)).as("total"))
        .join(kept, Seq("source"), "left_outer")
        .select(col("source"), col("total"),
          coalesce(col("kept"), lit(0L)).as("kept"))
        .orderBy("source")
    }),

    // ---- North-star: benchmark DECONTAMINATION — the GPT-3-style n-gram
    // overlap check (Brown et al. 2020 §C): flag training documents
    // sharing any token 8-gram with the held-out eval slice (doc_id ≡ 7
    // mod 10 stands in for the benchmark set). Scale shape: grams are
    // FNV-64 hashed (8-byte join keys, not 50-char strings); the eval
    // side — small by construction, benchmarks are ~1e5 docs while the
    // train corpus is the 100 TB side — broadcasts, so the probe is a
    // map-side hash lookup with ZERO shuffle on the big side; the only
    // shuffles are the two bounded per-doc count aggs. The oracle joins
    // raw gram STRINGS — hash-join parity rests on 64-bit
    // collision-freedom, the same argument the q24 jaccard oracle rests
    // on (hashed shingle sets vs string sets) ---------------------------
    "q66_decontamination" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val grams = docs.select(col("doc_id"),
          explode(array_distinct(TextFunctions.tokenShingles(
            TextFunctions.tokens(col("text")), 8))).as("g"))
        .select(col("doc_id"), TextFunctions.fnv64(col("g")).as("gh"))
      val isEval = pmod(col("doc_id"), lit(10)) === 7
      val evalGrams = grams.filter(isEval).select("gh").distinct()
        .withColumn("__hit", lit(1L))
      // ONE corpus-side kernel pass (round 11; was two — a totals agg AND
      // an overlap join each re-ran the explode): the left-outer probe of
      // the broadcast eval set marks each train gram in place, and totals
      // + overlap fold into a single per-doc agg. The corpus still never
      // shuffles its gram stream — only (doc_id, flag) rows reach the
      // partial-agged doc_id exchange, which is the scale property this
      // query exists to demonstrate.
      grams.filter(!isEval)
        .join(broadcast(evalGrams), Seq("gh"), "left_outer")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce(col("__hit"), lit(0L))).as("n_overlap"))
        .filter(col("n_overlap") >= 1)
        .select(col("doc_id"), col("n_overlap"), col("n_grams"),
          round(col("n_overlap").cast("double") / col("n_grams"), 4)
            .as("overlap_frac"))
        .orderBy("doc_id")
    }),

    // ---- North-star: cross-document DUPLICATE PASSAGE detection (Lee et
    // al. 2022 "Deduplicating Training Data Makes LMs Better", at token-
    // 8-gram span granularity): per doc, the fraction of its distinct
    // 8-grams shared with at least one OTHER document. Complements q66
    // (train-vs-eval) with the within-corpus self-overlap a passage-level
    // dedup pass removes. Scale shape: grams travel as FNV-64 hashes
    // (8-byte keys); the gram-frequency agg and the flag join both
    // partition on the gram hash — nothing pairwise, nothing collected.
    // Round-12 de-skew (the q94/q113 class): the round-11 count WINDOW
    // on gh kept the kernel single-evaluation but buffered every
    // occurrence of one gram in a single window group — unbounded on a
    // boilerplate gram. Now the gram stream is localCheckpoint-pinned
    // (16-byte rows, the q108/q111 materialize-once pattern — measured
    // equal to the window's cost: 3.76 s vs 3.68 sf0.1, 30.6 vs 27.4
    // x100) so the kernel still runs ONCE while the frequency comes
    // from the map-side-combined dup-set (a hot gram crosses the
    // exchange pre-counted) and the flag folds into one per-doc agg.
    // An un-pinned agg+join-back re-evaluates the kernel per branch
    // (measured 6.5 s — column pruning gives the branches different
    // projections and quietly defeats exchange reuse).
    // The oracle joins raw gram STRINGS (64-bit collision-freedom
    // argument, as q66/q24) ---------------------------------------------
    "q71_dup_passages" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val grams = docs.select(col("doc_id"),
          explode(array_distinct(TextFunctions.tokenShingles(
            TextFunctions.tokens(col("text")), 8))).as("g"))
        .select(col("doc_id"), TextFunctions.fnv64(col("g")).as("gh"))
        .localCheckpoint()
      // grams are distinct per doc, so the map-side-combined count per
      // gh == distinct-doc frequency; the dup flag joins back and ONE
      // per-doc aggregate folds both counters (round-12 de-skew, the
      // q94/q113 class — the count window here buffered every
      // occurrence of a boilerplate gram in one group)
      val dup = Dedup.duplicatedGramSet(grams).withColumn("d", lit(1L))
      grams.join(dup, Seq("gh"), "left_outer")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          coalesce(sum("d"), lit(0L)).as("n_dup"))
        .select(col("doc_id"), col("n_dup"), col("n_grams"),
          round(col("n_dup").cast("double") / col("n_grams"), 4)
            .as("dup_frac"))
        .orderBy("doc_id")
    }),

    // ---- North-star: PII REDACTION — scrub emails / IPv4 / phone-shaped
    // tokens before training (the C4/Dolma-style scrub pass). The fixture
    // corpus carries no PII, so both engines append the SAME deterministic
    // contact tail (a pure function of doc_id — the q61 twin-construction
    // trick) and the oracle must reproduce counts AND the exact redacted
    // string. Patterns single-sourced from TextFunctions.piiPatterns;
    // narrow projection, no shuffle until the final sort ----------------
    "q72_pii_redaction" -> ((s, dir) => {
      val aug = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com"),
        when(pmod(col("doc_id"), lit(3)) === 0, lit(" cc admin@test.org"))
          .otherwise(lit("")),
        lit(" from 10."), pmod(col("doc_id"), lit(256)).cast("string"),
        lit(".0."), pmod(col("doc_id") * 7, lit(256)).cast("string"),
        lit(" call 555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
      val counts = TextFunctions.piiPatterns.map { case (kind, pat) =>
        regexp_count(col("aug"), lit(pat)).cast("long").as(s"n_$kind")
      }
      Tables.documents(s, dir)
        .select(col("doc_id"), aug.as("aug"))
        .select(col("doc_id") +: counts :+
          TextFunctions.redactPii(col("aug")).as("redacted"): _*)
        .orderBy("doc_id")
    }),

    // ---- North-star: embedding SCALAR QUANTIZATION — per-dimension
    // min/max int8 quantization, the compression pass a 100 TB vector
    // corpus runs before ANN indexing (4× smaller than float32). Scale
    // shape: the range fit is ONE bounded agg (posexplode → dim-count
    // rows — the q70 LM shape) collapsed to a single broadcast row; the
    // quantize itself is per-row array math against that broadcast, so
    // the corpus-side plan adds NO shuffle. All-integer outputs (sum /
    // min / max of the int8 codes) keep the hash exact; the float→double
    // widening and the one floor(x*255+0.5) expression are IEEE-identical
    // in DuckDB --------------------------------------------------------
    "q73_embed_quantize" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val ranges = emb.select(posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("pos").agg(min("x").as("lo"), max("x").as("hi"))
      val rangeArr = ranges.agg(sort_array(
        collect_list(struct(col("pos"), col("lo"), col("hi")))).as("r"))
      emb.crossJoin(broadcast(rangeArr))
        .withColumn("qs",
          VectorFunctions.quantizeInt8(col("embedding"), col("r")))
        .select(col("vec_id"), size(col("qs")).cast("long").as("dim"),
          aggregate(col("qs"), lit(0L), (a, q) => a + q).as("q_sum"),
          array_min(col("qs")).as("q_min"),
          array_max(col("qs")).as("q_max"))
        .orderBy("vec_id")
    }),

    // ---- North-star: Gopher-style quality FILTER GATE (Rae et al. 2021
    // §A1.1 rules with fixture-calibrated thresholds): word count, mean
    // word length, alphabetic-word fraction, distinct-stopword presence,
    // and the conjunction `keep`. Complements q38 (raw quality measures)
    // and q63 (repetition signals) with the actual verdict a corpus
    // pipeline filters on. Pure narrow projection — no shuffle until the
    // final sort; every signal re-derived independently in DuckDB -------
    "q65_quality_filter" -> ((s, dir) => {
      val t = col("t")
      Tables.documents(s, dir)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
        .select(col("doc_id"),
          size(t).cast("long").as("wc"),
          round(aggregate(t, lit(0L), (acc, x) => acc + length(x))
            .cast("double") / size(t), 4).as("mean_wlen"),
          round(size(filter(t, x => x.rlike("[A-Za-z]")))
            .cast("double") / size(t), 4).as("alpha_frac"),
          size(array_intersect(
            array_distinct(transform(t, x => lower(x))),
            typedlit(TextFunctions.gopherStops))).cast("long").as("stop_cnt"))
        .withColumn("keep",
          col("wc").between(50, 100000) &&
            col("mean_wlen").between(3.0, 10.0) &&
            col("alpha_frac") >= 0.8 && col("stop_cnt") >= 2)
        .orderBy("doc_id")
    }),

    "q37_random_split_counts" -> ((s, dir) => {
      val Array(a, b) = Tables.orders(s, dir)
        .randomSplit(Array(0.7, 0.3), seed = 40)
      import s.implicits._
      Seq(("train", a.count()), ("test", b.count()))
        .toDF("part", "cnt").orderBy("part")
    }),

    // ---- Set ops, multiset + intersect (SURVEY §2.7 completion) --------
    "q42_except_all" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      e.filter(col("event_type") === "click").select("user_id")
        .exceptAll(e.filter(col("event_type") === "error").select("user_id"))
        .groupBy("user_id").agg(count(lit(1)).as("cnt"))
        .orderBy("user_id")
    }),
    "q43_intersect_users" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      e.filter(col("event_type") === "click").select("user_id")
        .intersect(e.filter(col("event_type") === "error").select("user_id"))
        .orderBy("user_id")
    }),

    // ---- Approximate aggregates (HLL — the 100 TB countDistinct path) --
    // TOLERANCE-gated (round-10 verdict #4): the raw HLL estimate is
    // engine-specific (can never hash-match DuckDB), so the query emits
    // the EXACT distinct plus an in-engine flag asserting the HLL estimate
    // sits within 3× its configured rsd of that exact value; the oracle
    // recomputes the exact distinct and expects the flag true — so a
    // broken HLL (or a broken exact path) fails the hash gate instead of
    // hiding behind rows-only. HLL++ is deterministic for fixed input, so
    // the banded flag is stable, and GoldenSpec separately pins the raw
    // estimates at sf0.01.
    "q44_approx_distinct" -> ((s, dir) =>
      Tables.events(s, dir).groupBy("event_type")
        .agg(countDistinct("user_id").as("n_exact"),
          approx_count_distinct("user_id", 0.05).as("approx_users"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("approx_users") - col("n_exact")).cast("double") <=
            lit(0.15) * col("n_exact")).as("within_rsd"))
        .orderBy("event_type")),

    // ---- North-star: quality scoring (full stats; oracle-checked) ------
    "q38_quality_stats" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id") +: TextFunctions.qualityStats(col("text")): _*)
        .orderBy("doc_id")),

    // ---- Window analytics beyond the reference (running agg, lag) ------
    "q39_running_total" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir).select(
          col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(DecimalType(28, 4))).over(w)
            .cast("double").as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    }),
    "q40_lag_delta" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, dir).select(
          col("o_custkey"), col("o_orderkey"),
          (col("o_totalprice") - lag("o_totalprice", 1).over(w))
            .as("delta_prev"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- Pivot (wide aggregation) --------------------------------------
    "q50_pivot_status" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(Relational.decSum(col("l_quantity")))
        .orderBy("l_returnflag")),

    // ---- As-of join (time-series enrichment; composed union+window) ----
    "q46_asof_join" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ets"))
      val o = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
        .agg(max("o_orderkey").as("last_order"))
        .select(col("user_id"),
          unix_micros(col("o_orderdate").cast("timestamp_ltz")).as("ots"),
          col("last_order"))
      Relational.asofJoin(e, o, "user_id", "ets", "ots", "last_order")
        .select("event_id", "user_id", "last_order")
        .orderBy("event_id")
    }),

    // ---- Hierarchical aggregates (ROLLUP) ------------------------------
    // Expressed via spark.sql over temp views: exercises the SQL surface,
    // and sidesteps a DetectAmbiguousSelfJoin false positive on
    // rollup-after-join in the Dataset DSL (Expand re-emits grouping attrs).
    "q41_rollup_counts" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer_v")
      Tables.nation(s, dir).createOrReplaceTempView("nation_v")
      Tables.region(s, dir).createOrReplaceTempView("region_v")
      s.sql("""SELECT r_name, n_name, COUNT(*) AS cnt FROM customer_v
               JOIN nation_v ON c_nationkey = n_nationkey
               JOIN region_v ON n_regionkey = r_regionkey
               GROUP BY ROLLUP (r_name, n_name)
               ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""")
    }),

    // ---- Stateful streaming operator, oracle-gated in batch ------------
    // flatMapGroupsWithState closed-session emission, run in batch mode:
    // one invoke per user sees all events, so the output is exactly every
    // session except each user's final (still-open) one — which the q49
    // sessionization CTE expresses in SQL. Gates the custom-state operator
    // itself, not just its windowed cousins.
    "q56_closed_sessions" -> ((s, dir) => {
      import s.implicits._
      val events = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"))
        .as[streaming.EventStream.Event]
      streaming.EventStream.sessionizeClosed(events, gapMinutes = 30).toDF()
        .select(col("user_id"), col("n_events"), col("first_ts"),
          col("last_ts"))
        .orderBy("user_id", "first_ts")
    }),

    // ---- Multimodal plumbing, oracle-gated --------------------------------
    // Binary-column ingest + batched feature extraction over fixture bytes
    // (documents.text cast to binary): schema, metadata struct, magic
    // sniff, and the per-partition batch path all execute; the stub
    // checksum/brightness are portable folds the DuckDB oracle reproduces.
    // (The seeded fake embedding is JVM-specific → excluded here,
    // spec-pinned instead.)
    "q55_media_features" -> ((s, dir) => {
      val media = operators.Multimodal.ingest(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("bytes")),
        "doc_id", "bytes")
      operators.Multimodal.extractFeatures(media, embeddingDim = 8)
        .select(col("media_id"), col("media_type"), col("n_bytes"),
          col("checksum"), round(col("brightness"), 6).as("brightness"))
        .orderBy("media_id")
    }),

    // ---- Approximate quantiles (the 100 TB percentile path) ------------
    // Greenwald-Khanna sketch; with accuracy > group size the rank error
    // is < 1, so the result is EXACTLY the discrete quantile and the
    // DuckDB quantile_disc oracle hash-matches — gating the sketch
    // machinery itself (the same primitive temporalPrefixSplit's
    // large-n boundary refinement builds on).
    "q54_approx_quantiles" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(
          percentile_approx(col("o_totalprice"), lit(0.25), lit(1000000)).as("p25"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(1000000)).as("p50"),
          percentile_approx(col("o_totalprice"), lit(0.75), lit(1000000)).as("p75"))
        .orderBy("o_orderpriority")),

    // ---- Skew-salted join, oracle-proven equal to the plain join -------
    // The skew-mitigation operator's contract is "bit-identical rows to an
    // inner equi-join"; gating it against the plain-SQL oracle proves it.
    "q51_salted_join" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val c = Tables.customer(s, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_name"))
      Relational.saltedJoin(o, c, "o_custkey", saltFactor = 8)
        .select("o_orderkey", "o_custkey", "c_name")
        .orderBy("o_orderkey")
    }),

    // ---- IVF ANN with exhaustive probing == exact top-k ----------------
    // nProbe = nLists scores every cell, so the IVF machinery (coarse
    // quantizer routing, cell equi-join, top-k reduction) must reproduce
    // the exact brute-force ranking — same oracle as q26.
    "q52_ivf_exhaustive" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), k = 5,
          nLists = 8, nProbe = 8)
        .orderBy("q_id", "rn")
    }),

    // ---- PERSISTED IVF index: build once, query many (round-10 #2) -----
    // q52 proves the IVF machinery fit-per-call; this is the production
    // shape — centroids + cell-partitioned assignments written as parquet
    // ONCE per corpus (cachedBuild: later plan constructions and repeated
    // query batches skip the KMeans fit entirely and read the stored
    // inverted file, with the cell-partitioned layout pruning unprobed
    // cells at the scan). Exhaustive probing against the SAME exact
    // brute-force oracle as q26/q52 proves the round-trip through the
    // stored index loses nothing.
    "q92_ivf_index_query" -> ((s, dir) => {
      val idx = cachedBuild(dir, "embeddings.parquet",
          "target/q92_ivf_index", params = "ivf:nlists=8") { p =>
        Similarity.buildIvfIndex(Tables.embeddings(s, dir), p, nLists = 8)
      }
      Similarity.ivfTopKFromIndex(idx,
          Tables.embeddings(s, dir).filter(col("vec_id") < 5),
          k = 5, nProbe = 8)
        .orderBy("q_id", "rn")
    }),

    // ---- INCREMENTAL IVF index append (nightly-ingest ANN) -------------
    // q92's build-once story plus the ingest path: index built on 90% of
    // the corpus, the %10=3 shard APPENDED against the stored centroids
    // (no refit, one narrow shard pass — the ANN sibling of q89's
    // incremental dedup), then an exhaustive-probe query over the
    // combined inverted file must still reproduce the exact brute-force
    // top-k — proving append placed every shard row where the index
    // routing expects it and lost/duplicated nothing.
    "q93_ivf_index_append" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val idx = cachedBuild(dir, "embeddings.parquet",
          "target/q93_ivf_append", params = "ivf:nlists=8:app=m10e3") { p =>
        Similarity.buildIvfIndex(emb.filter(col("vec_id") % 10 =!= 3), p,
          nLists = 8)
        Similarity.appendToIvfIndex(emb.filter(col("vec_id") % 10 === 3), p)
      }
      Similarity.ivfTopKFromIndex(idx, emb.filter(col("vec_id") < 5),
          k = 5, nProbe = 8)
        .orderBy("q_id", "rn")
    }),

    // ---- IVF index DELETE: the takedown path (round-11 verdict #3) -----
    // Completes the lifecycle q92 (build) and q93 (append) started:
    // index built on 90% of the corpus, the %10=3 shard appended, then
    // every vec_id %7=2 row DELETED as a tombstone table — no rebuild,
    // no touch of the cell-partitioned inverted file, one O(|ids|)
    // write. The exhaustive-probe query epoch-shadows tombstoned rows
    // (broadcast join) and must reproduce the exact brute-force
    // top-k over the LIVE corpus (recompute-from-scratch oracle):
    // deleted rows never surface as neighbors, everything else ranks
    // exactly as a fresh build would. DedupSimilaritySpec proves
    // compaction leaves the result byte-identical while retiring the
    // tombstone join; IndexMaintenanceNote records query cost returning to
    // the fresh-build baseline post-compact.
    "q122_ivf_index_delete" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val idx = cachedBuild(dir, "embeddings.parquet",
          "target/q122_ivf_delete",
          params = "ivf:nlists=8:app=m10e3:del=m7e2") { p =>
        Similarity.buildIvfIndex(emb.filter(col("vec_id") % 10 =!= 3), p,
          nLists = 8)
        Similarity.appendToIvfIndex(emb.filter(col("vec_id") % 10 === 3), p)
        Similarity.deleteFromIvfIndex(emb.filter(col("vec_id") % 7 === 2),
          p)
      }
      Similarity.ivfTopKFromIndex(idx, emb.filter(col("vec_id") < 5),
          k = 5, nProbe = 8)
        .orderBy("q_id", "rn")
    }),

    // ---- RECLUSTER: the recall monitor's actuator -----------------------
    // Same live set as q122 (build 90 % at a DELIBERATELY coarse
    // nLists=4, append 10 %, tombstone m7e2) — then reclusterIvfIndex
    // retrains the quantizer to 8 cells FROM THE INDEX'S OWN stored live
    // vectors (corpus never re-read), retiring the tombstones and
    // swapping (centroids, assignments) in one manifest publish. The
    // oracle is the SAME exact brute-force top-k as q122: hash-green
    // proves the re-routing lost no vector and the exhaustive-probe
    // exactness property survives the quantizer swap.
    "q159_ivf_recluster" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val idx = cachedBuild(dir, "embeddings.parquet",
          "target/q159_ivf_recluster",
          params = "ivf:nlists=4to8:app=m10e3:del=m7e2:recluster") { p =>
        Similarity.buildIvfIndex(emb.filter(col("vec_id") % 10 =!= 3), p,
          nLists = 4)
        Similarity.appendToIvfIndex(emb.filter(col("vec_id") % 10 === 3), p)
        Similarity.deleteFromIvfIndex(emb.filter(col("vec_id") % 7 === 2),
          p)
        Similarity.reclusterIvfIndex(s, p, nLists = 8)
      }
      Similarity.ivfTopKFromIndex(idx, emb.filter(col("vec_id") < 5),
          k = 5, nProbe = 8)
        .orderBy("q_id", "rn")
    }),

    // ---- BATCH kNN SELF-JOIN over the stored index ----------------------
    // The many-to-many primitive a SemDeDup-style pipeline runs nightly:
    // EVERY vector's top-5 neighbors (self excluded) answered from the
    // stored IVF index at exhaustive probe — so the result is exactly
    // the quadratic brute-force kNN graph, but the plan is the batch
    // shape that scales: queries route via one broadcast centroid cross,
    // the corpus-as-queries side SHUFFLE-equi-joins the cell-partitioned
    // stored table on cell (ivfKnnJoinFromIndex — never a forced
    // broadcast of a corpus-sized frame; round-15 verdict #2), and the
    // per-query top-k is the bounded-heap partial aggregate — no corpus
    // x corpus anything, nothing corpus-sized through the driver.
    "q160_knn_join" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val idx = cachedBuild(dir, "embeddings.parquet",
          "target/q160_knn_idx", params = "ivf:nlists=8:knn") { p =>
        Similarity.buildIvfIndex(emb, p, nLists = 8)
      }
      // localCheckpoint before the determinism sort (r20, guide §2.4):
      // the scoring join and the bounded-heap top-k collapse into ONE
      // stage (the stream side is already hash-partitioned by q_id, so
      // no exchange separates them), and a global Sort's range-sampling
      // pass re-executes its whole child stage — measured as 2× the
      // scoring cost (BenchIvfParts: join 3.5-4.2 s, join+sort 7.3-8.4 s,
      // join+checkpoint+sort 3.8-4.6 s). The checkpoint materializes the
      // |corpus|×k result once; the sort then samples result-sized
      // blocks. (A repartition boundary instead is optimized away under
      // a global Sort — measured no-op.) The full scoring plan stays
      // audited via the q160_knn_join#knnjoin auditPlans entry.
      Similarity.ivfKnnJoinFromIndex(idx, emb, k = 5, nProbe = 8)
        .localCheckpoint()
        .orderBy("q_id", "rn")
    }),

    // ---- North-star: APPLIED SEMANTIC DEDUP (SemDeDup-style rewrite) ---
    // The end-to-end rewrite an embedding-dedup pipeline actually ships
    // (the SemDeDup shape — drop semantic near-duplicates discovered
    // through a kNN graph, keep one representative per cluster), composed
    // from stages this engine already gates separately: (1) the batch kNN
    // self-join from the STORED IVF index — q160's scale path,
    // shuffle-equi-joined on cell; (2) θ=0.9 threshold over the 6-dp
    // cosines → symmetric distinct edge set; (3) connected components by
    // pointer jumping (Dedup.componentIds — O(log diameter) bounded
    // shuffle rounds, lineage-truncated); (4) KEEP-BEST per component —
    // highest 6-dp vector norm, vec_id ASC tiebreak — as ONE max_by
    // hash-agg (map-side partials; never a per-component window). Output
    // is the full decision table (every vector's component, size, fate,
    // and kept representative), so the gate checks each individual drop,
    // not just survivor counts. Corpus = the q61 near-dup twin corpus
    // (raw fixture embeddings top out at 0.52 pairwise cosine — no
    // semantic dups to find). Gated at exhaustive probe so the kNN graph
    // is exact and the DuckDB oracle replays the WHOLE chain: twins →
    // quadratic top-5 → θ-filter → RECURSIVE closure → per-component
    // argmax. At scale the same composition runs with nLists ≈ 2√N and
    // bounded nProbe under the q164/q169 recall-floor monitor.
    "q170_semantic_dedup_apply" -> ((s, dir) => {
      val corpus = neardupCorpus(s, dir)
      val idx = cachedBuild(dir, "embeddings.parquet",
          "target/q170_semdedup_idx", params = "ivf:nlists=8:semdedup") { p =>
        Similarity.buildIvfIndex(corpus, p, nLists = 8)
      }
      Dedup.semanticDedupApply(corpus, "vec_id", "embedding", idx,
          threshold = 0.9, k = 5, nProbe = 8)
        .orderBy("vec_id")
    }),

    // ---- North-star: INCREMENTALLY MAINTAINED semantic dedup -----------
    // q170's nightly-ingest economics (the q162-vs-q161 pattern for the
    // kNN graph): the index is built on the BASE corpus only, the kNN
    // graph persisted beside it under the same manifest, and the recrawl
    // shard (the 50 twins) arrives through appendToKnnGraph — ONE locked
    // mutation that appends the inverted file AND delta-merges the graph
    // (stored rows ∪ |old|×|shard| candidates through the same bounded
    // heap; the standing N² is never recomputed), publishing both
    // atomically. Decisions are then read from the STORED graph, no
    // index probe at decision time. Gated against the SAME from-scratch
    // DuckDB replay as q170 VERBATIM — hash-green proves the delta
    // maintenance reproduces the full-corpus graph decision-for-decision.
    "q172_semdedup_incremental" -> ((s, dir) => {
      val corpus = neardupCorpus(s, dir)
      val base = corpus.filter(col("vec_id") < 1000000L)
      val shard = corpus.filter(col("vec_id") >= 1000000L)
      val idx = cachedBuild(dir, "embeddings.parquet",
          "target/q172_semdedup_incr",
          params = "ivf:nlists=8:knngraph:k=5:incr") { p =>
        Similarity.buildIvfIndex(base, p, nLists = 8)
        Similarity.buildKnnGraph(s, p, k = 5, nProbe = 8)
        Similarity.appendToKnnGraph(shard, p, k = 5, nProbe = 8)
      }
      Dedup.semanticDedupDecisions(corpus, "vec_id", "embedding",
          Similarity.knnGraphFromIndex(s, idx), threshold = 0.9)
        .orderBy("vec_id")
    }),

    // ---- North-star: kNN-graph TAKEDOWN (delete + targeted repair) -----
    // The licence-revocation path completing the maintained graph's
    // build/append/delete lifecycle: victims tombstone out of the
    // inverted file AND their graph rows drop in ONE atomic publish,
    // with exactly the affected vertices repaired — a stored top-k only
    // changes if it CONTAINED a deleted neighbor (losing one promotes
    // the (k+1)th candidate, which the stored graph doesn't have), so
    // those vertices (≤ k·|deleted|) re-probe the live index and
    // everyone else's rows are provably untouched. Decisions over the
    // remaining corpus then read the repaired graph; gated against the
    // from-scratch replay ON THE REMAINING CORPUS (same predicate both
    // sides) — hash-green proves the targeted repair equals a rebuild.
    "q174_semdedup_delete" -> ((s, dir) => {
      val corpus = neardupCorpus(s, dir)
      val victims = corpus.filter(pmod(col("vec_id"), lit(10)) === 3)
      val live = corpus.filter(pmod(col("vec_id"), lit(10)) =!= 3)
      val idx = cachedBuild(dir, "embeddings.parquet",
          "target/q174_semdedup_del",
          params = "ivf:nlists=8:knngraph:k=5:del") { p =>
        Similarity.buildIvfIndex(corpus, p, nLists = 8)
        Similarity.buildKnnGraph(s, p, k = 5, nProbe = 8)
        Similarity.deleteFromKnnGraph(victims.select("vec_id"), p,
          k = 5, nProbe = 8)
      }
      Dedup.semanticDedupDecisions(live, "vec_id", "embedding",
          Similarity.knnGraphFromIndex(s, idx), threshold = 0.9)
        .orderBy("vec_id")
    }),

    // ---- SEMANTIC DEDUP at the PRODUCTION probe setting ----------------
    // q170/q172 gate the exhaustive configuration (exact graph → the
    // DuckDB replay); THIS row is the geometry a 100 TB dedup run uses —
    // nLists=16 probed at nProbe=8 — with the monitor that matters for
    // DEDUP read from the PERSISTED DECISION CERTIFICATE (round-17
    // verdict #1): not channel recall (q164/q169's serving proxy) but
    // DECISION recall — the pruned run must still make ≥ 90 % of the
    // drops the exhaustive run makes over the SAME index. The exhaustive
    // audit runs ONCE at certification time (Dedup.certifyDecisionRecall,
    // in the cachedBuild alongside the index; its published cert rides
    // the manifest), and the production run only ASSERTS the stored
    // number — floor + epoch freshness + (θ, k, nProbe) — via one 1-row
    // read; a mutation without re-certification fails loudly on the
    // stale epoch before a degraded dedup ships a duplicate-ridden
    // corpus. At 100 TB the certification audit is SAMPLED; the gate
    // fixture is small enough to audit exactly. Output is the production
    // decisions: rows-only for the driver (seeded KMeans routing),
    // frozen by the GoldenSpec pin.
    "q173_semdedup_prod_probe" -> ((s, dir) => {
      val corpus = neardupCorpus(s, dir)
      val idx = cachedBuild(dir, "embeddings.parquet",
          "target/q173_semdedup_prod",
          params = "ivf:nlists=16:semdedup-prod:dcert=t0.9k5p8") { p =>
        Similarity.buildIvfIndex(corpus, p, nLists = 16)
        Dedup.certifyDecisionRecall(s, p, threshold = 0.9, k = 5,
          nProbe = 8)
      }
      val dropRecall = Dedup.requireCertifiedDecisionRecall(s, idx,
        threshold = 0.9, k = 5, nProbe = 8, floor = 0.90)
      System.err.println(f"[q173] certified decision recall at " +
        f"nProbe=8/nLists=16: $dropRecall%.4f")
      Dedup.semanticDedupApply(corpus, "vec_id", "embedding", idx,
          threshold = 0.9, k = 5, nProbe = 8)
        .orderBy("vec_id")
    }),

    // ---- IVF at the PRODUCTION probe setting (approximate regime) ------
    // Every other IVF row gates at exhaustive probe (exactness proof);
    // this is the configuration a deployment actually runs — nProbe=8 of
    // nLists=16, so the cell-pruned scan reads ~half the stored files —
    // WITH its safety net read from the PERSISTED RECALL CERTIFICATE
    // (round-17 verdict #1): recall@10 is measured ONCE at build time on
    // the deterministic id-hash query sample, published in the same
    // atomic manifest swap as the index, and the serving query only
    // ASSERTS the stored certificate — floor + epoch freshness + geometry
    // — via one 1-row parquet read. A quantizer/fixture drift that
    // degrades recall fails the BUILD loudly; a mutation without a fresh
    // cert fails the SERVE loudly (stale epoch); and the per-query
    // corpus-linear brute-force audit the old in-line recall probe paid
    // is gone from the serving path entirely (DeterminismLintSpec pins
    // that no serving query calls it). Output is the seeded approximate
    // top-k: deterministic, rows-only for the driver (no SQL oracle can
    // express the KMeans routing; the exactness side is already
    // oracle-gated by q52/q92/q122).
    "q164_ivf_prod_probe" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val idx = cachedBuild(dir, "embeddings.parquet",
          "target/q164_ivf_prod",
          params = "ivf:nlists=16:prod:cert=k10p8") { p =>
        Similarity.buildIvfIndex(emb, p, nLists = 16,
          cert = Some(Similarity.RecallCertSpec(k = 10, nProbe = 8)))
      }
      val recall = Similarity.requireCertifiedRecall(s, idx, k = 10,
        nProbe = 8, floor = 0.70)
      System.err.println(
        f"[q164] certified recall@10 at nProbe=8/nLists=16: $recall%.4f")
      Similarity.ivfTopKFromIndex(idx, emb.filter(col("vec_id") < 50),
          k = 10, nProbe = 8)
        .orderBy("q_id", "rn")
    }),

    // ---- North-star: HYBRID retrieval with reciprocal-rank fusion ------
    // The RAG-stack front door: per-query BM25 (q69's kernel, widened to
    // a per-query term map) and dense cosine top-k (q26's kernel) each
    // truncate to their channel top-50 with the bounded-heap aggregate,
    // then fuse on RANKS — rrf = Σ 1/(60+rank) — so no cross-channel
    // score calibration exists to drift. Scale shape: two corpus scans
    // (one per channel), broadcast stats/df/term-map, and a fusion join
    // over |queries|×100 rows — constant in corpus size. Oracle
    // re-derives both channels and the fusion in SQL
    // (hybridRrfOracleSql; terms/constants single-sourced).
    "q165_hybrid_rrf" -> ((s, dir) => {
      val sparse = Retrieval.bm25TopK(Tables.documents(s, dir), "doc_id",
          "text", hybridQueries, k = hybridChannelK)
        .select("q_id", "doc_id", "rank")
      val emb = Tables.embeddings(s, dir)
      val dense = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") < 5), k = hybridChannelK)
        .select(col("q_id").cast("long").as("q_id"),
          col("n_id").cast("long").as("doc_id"), col("rn").as("rank"))
      Retrieval.rrfFuse(sparse, dense, kRrf = hybridRrfK, topK = hybridTopK)
        .withColumnRenamed("a_rank", "sp_rank")
        .withColumnRenamed("b_rank", "dn_rank")
        .orderBy("q_id", "rn")
    }),

    // ---- HYBRID retrieval SERVED FROM THE STORED ARTIFACTS -------------
    // q165's production path: the sparse channel answered from the
    // persisted inverted index (one probe of the union of query terms —
    // scan bytes track |terms|/buckets, not corpus size) and the dense
    // channel from the stored IVF index at exhaustive probe, fused by
    // the same RRF. Gated against the SAME from-scratch oracle as q165:
    // hash-green proves the two index artifacts (build + additive
    // df/stats, cell-partitioned vectors) reproduce the raw-corpus
    // fusion bit-for-bit — the serving stack can answer interactive
    // hybrid queries without ever re-reading the corpus.
    "q167_hybrid_from_indexes" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val emb = Tables.embeddings(s, dir)
      val invIdx = cachedBuild(dir, "documents.parquet",
          "target/q167_inv_idx", params = "inv:hybrid") { p =>
        operators.InvertedIndex.buildIndex(docs, p)
      }
      val ivfIdx = cachedBuild(dir, "embeddings.parquet",
          "target/q167_ivf_idx", params = "ivf:nlists=8:hybrid") { p =>
        Similarity.buildIvfIndex(emb, p, nLists = 8)
      }
      val sparse = operators.InvertedIndex.bm25PerQueryFromIndex(s, invIdx,
          hybridQueries, k = hybridChannelK)
        .select("q_id", "doc_id", "rank")
      val dense = Similarity.ivfTopKFromIndex(ivfIdx,
          emb.filter(col("vec_id") < 5), k = hybridChannelK, nProbe = 8)
        .select(col("q_id").cast("long").as("q_id"),
          col("n_id").cast("long").as("doc_id"), col("rn").as("rank"))
      Retrieval.rrfFuse(sparse, dense, kRrf = hybridRrfK, topK = hybridTopK)
        .withColumnRenamed("a_rank", "sp_rank")
        .withColumnRenamed("b_rank", "dn_rank")
        .orderBy("q_id", "rn")
    }),

    // ---- HYBRID serving at the PRODUCTION probe setting ----------------
    // q167 gates the stored-artifact fusion at exhaustive probe (the
    // exactness proof); THIS row is the configuration a 100 TB deployment
    // actually serves: the dense channel probes nProbe=8 of nLists=16
    // cells — the cell-pruned scan reads ~half the stored inverted file,
    // and at production list counts (nLists ≈ 2√N) the probed fraction
    // keeps shrinking — WITH the q164 safety net enforced per query
    // batch: dense-channel recall@50 vs in-index brute force is measured
    // in-line and the 0.70 application floor required, so quantizer /
    // fixture drift can never serve a fast-but-degraded fusion silently.
    // The sparse channel and the RRF fusion are q167's exactly. Output is
    // the seeded approximate fused page: deterministic, rows-only for the
    // driver (no SQL oracle can express the KMeans routing; fusion
    // exactness is oracle-gated by q165/q167, channel exactness by
    // q52/q92/q130), frozen by the GoldenSpec pin + the RetrievalSpec
    // end-to-end overlap floor against the exact fusion.
    "q169_hybrid_prod_probe" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val emb = Tables.embeddings(s, dir)
      val invIdx = cachedBuild(dir, "documents.parquet",
          "target/q169_inv_idx", params = "inv:hybridprod") { p =>
        operators.InvertedIndex.buildIndex(docs, p)
      }
      val ivfIdx = cachedBuild(dir, "embeddings.parquet",
          "target/q169_ivf_idx",
          params = s"ivf:nlists=16:hybridprod:cert=k${hybridChannelK}p8") { p =>
        Similarity.buildIvfIndex(emb, p, nLists = 16,
          cert = Some(Similarity.RecallCertSpec(k = hybridChannelK,
            nProbe = 8)))
      }
      val denseQ = emb.filter(col("vec_id") < 5)
      // q164's discipline: the dense channel's recall floor is enforced
      // from the build-time certificate (same atomic publish as the
      // index), not an in-line corpus-linear audit per serving query
      val recall = Similarity.requireCertifiedRecall(s, ivfIdx,
        k = hybridChannelK, nProbe = 8, floor = 0.70)
      System.err.println(f"[q169] certified dense recall@$hybridChannelK " +
        f"at nProbe=8/nLists=16: $recall%.4f")
      val sparse = operators.InvertedIndex.bm25PerQueryFromIndex(s, invIdx,
          hybridQueries, k = hybridChannelK)
        .select("q_id", "doc_id", "rank")
      val dense = Similarity.ivfTopKFromIndex(ivfIdx, denseQ,
          k = hybridChannelK, nProbe = 8)
        .select(col("q_id").cast("long").as("q_id"),
          col("n_id").cast("long").as("doc_id"), col("rn").as("rank"))
      Retrieval.rrfFuse(sparse, dense, kRrf = hybridRrfK, topK = hybridTopK)
        .withColumnRenamed("a_rank", "sp_rank")
        .withColumnRenamed("b_rank", "dn_rank")
        .orderBy("q_id", "rn")
    }),

    // ---- SERP DEDUP against the persisted similarity graph -------------
    // The "already seen this document" filter a retrieval page runs
    // before display: fuse the wider top-50 candidate page (q165's
    // kernels), then drop every candidate the STORED near-dup graph
    // (q154's artifact, built once by the corpus pipeline) links to a
    // better-ranked candidate of the same query — no text re-scoring at
    // query time. The drop rule is one-pass against the original
    // ranking (deterministic, SQL-replayable; chains over-drop by
    // design — serpDedup scaladoc). Oracle re-derives the candidate
    // page AND the pairwise Jaccard edges from scratch.
    "q168_serp_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val emb = Tables.embeddings(s, dir)
      val sparse = Retrieval.bm25TopK(docs, "doc_id", "text",
          hybridQueries, k = hybridChannelK)
        .select("q_id", "doc_id", "rank")
      val dense = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") < 5), k = hybridChannelK)
        .select(col("q_id").cast("long").as("q_id"),
          col("n_id").cast("long").as("doc_id"), col("rn").as("rank"))
      val cand = Retrieval.rrfFuse(sparse, dense, kRrf = hybridRrfK,
          topK = hybridChannelK)
        .select("q_id", "doc_id", "rn")
      val g = cachedBuild(dir, "documents.parquet", "target/q168_simgraph",
          params = s"simidx.v3:jaccard=$simGraphThreshold" +
            s":w=$simGraphShingleWidth:full") { p =>
        operators.SimGraphIndex.build(docs.select("doc_id", "text"),
          "doc_id", "text", p, simGraphThreshold, simGraphShingleWidth)
      }
      Retrieval.serpDedup(cand, operators.SimGraphIndex.edges(s, g))
        .orderBy("q_id", "rn")
    }),

    // ---- North-star: DIVERSIFIED rerank (maximal marginal relevance) ---
    // The pass after q165: greedy λ·rel − (1−λ)·max-cos-to-picked over
    // the fused top-10, so near-duplicate hits don't crowd a context
    // window. Selection is sequential only WITHIN a query over the
    // bounded fused list — one flatMapGroups task per query, corpus
    // touched only by the candidate-vector lookup join. The oracle
    // replays the greedy recursion UNROLLED into mmrK chained SQL steps
    // (argmax via ROW_NUMBER per step over the pairwise 6-dp cosine
    // table — mmrOracleSql), constants single-sourced.
    "q166_mmr_rerank" -> ((s, dir) => {
      val sparse = Retrieval.bm25TopK(Tables.documents(s, dir), "doc_id",
          "text", hybridQueries, k = hybridChannelK)
        .select("q_id", "doc_id", "rank")
      val emb = Tables.embeddings(s, dir)
      val dense = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") < 5), k = hybridChannelK)
        .select(col("q_id").cast("long").as("q_id"),
          col("n_id").cast("long").as("doc_id"), col("rn").as("rank"))
      val fused = Retrieval.rrfFuse(sparse, dense, kRrf = hybridRrfK,
          topK = hybridTopK)
        .select(col("q_id"), col("doc_id"), col("rrf").as("rel"))
      val vectors = emb.select(col("vec_id").as("doc_id"),
        VectorFunctions.toDoubleArray(col("embedding")).as("v"))
      Retrieval.mmrRerank(fused, vectors, lambdaRel = mmrLambdaRel,
          lambdaDiv = mmrLambdaDiv, k = mmrK)
        .orderBy("q_id", "rn")
    }),

    // ---- North-star: the FULL RAG SERVING PIPELINE in one plan ---------
    // What q165/q168/q166 gate separately, a serving stack runs as one
    // chain per request: fuse the WIDE candidate page (top-50), drop
    // already-seen near-dups against the persisted similarity graph,
    // re-rank the survivors by their original fused order and cut to the
    // serving page (top-10), then MMR-diversify the final context set.
    // Every stage works on |queries|-bounded frames after the two channel
    // scans — the chain adds NO corpus-sized work over q165 alone (the
    // dedup is one broadcast probe of the stored edge table; the page
    // window and the MMR greedy see ≤ 50 rows/query). The oracle replays
    // the whole composition from the SAME single-sourced CTE blocks the
    // standalone oracles use (ragPipelineOracleSql), so hash-green proves
    // the stages compose exactly — not just that each works alone.
    "q171_rag_pipeline" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val emb = Tables.embeddings(s, dir)
      val sparse = Retrieval.bm25TopK(docs, "doc_id", "text",
          hybridQueries, k = hybridChannelK)
        .select("q_id", "doc_id", "rank")
      val dense = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") < 5), k = hybridChannelK)
        .select(col("q_id").cast("long").as("q_id"),
          col("n_id").cast("long").as("doc_id"), col("rn").as("rank"))
      val cand = Retrieval.rrfFuse(sparse, dense, kRrf = hybridRrfK,
          topK = hybridChannelK)
        .select("q_id", "doc_id", "rrf", "rn")
      val g = cachedBuild(dir, "documents.parquet", "target/q171_simgraph",
          params = s"simidx.v3:jaccard=$simGraphThreshold" +
            s":w=$simGraphShingleWidth:full") { p =>
        operators.SimGraphIndex.build(docs.select("doc_id", "text"),
          "doc_id", "text", p, simGraphThreshold, simGraphShingleWidth)
      }
      val deduped = Retrieval.serpDedup(cand.select("q_id", "doc_id", "rn"),
        operators.SimGraphIndex.edges(s, g))
      // survivors re-ranked by the ORIGINAL fused rank, cut to the
      // serving page; the window input is the kept subset of the bounded
      // candidate page (≤ 50 rows/query) — never corpus-sized
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy("rn")
      val page = deduped.filter(col("action") === "kept")
        .join(cand.select("q_id", "doc_id", "rrf"), Seq("q_id", "doc_id"))
        .withColumn("prn", row_number().over(w))
        .filter(col("prn") <= hybridTopK)
        .select(col("q_id"), col("doc_id"), col("rrf").as("rel"))
      val vectors = emb.select(col("vec_id").as("doc_id"),
        VectorFunctions.toDoubleArray(col("embedding")).as("v"))
      Retrieval.mmrRerank(page, vectors, lambdaRel = mmrLambdaRel,
          lambdaDiv = mmrLambdaDiv, k = mmrK)
        .orderBy("q_id", "rn")
    }),

    // ---- The RAG PIPELINE at the PRODUCTION serving setting ------------
    // q171 gates the composition's EXACTNESS (brute-force dense channel,
    // corpus-side BM25, full DuckDB replay); THIS row is the deployed
    // shape a serving stack actually runs per request (round-17 verdict
    // #2): q169's stored-artifact channels — the persisted inverted index
    // probed on the query terms' buckets, the persisted IVF index at
    // production nProbe=8 of nLists=16 behind its build-time recall
    // certificate — fused wide (top-50), SERP-deduped against the stored
    // similarity graph, cut to the serving page, MMR-diversified. After
    // the two index probes every stage works on |queries|-bounded frames;
    // nothing re-reads the corpus, so the warm serving path is
    // corpus-size-flat (BenchRagProd measures x1/x10/x100). Output is the
    // seeded approximate final page: rows-only for the driver (KMeans
    // routing), frozen by the GoldenSpec pin + RetrievalSpec's
    // end-to-end overlap floor against the exact q171 composition.
    "q175_rag_prod_pipeline" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val emb = Tables.embeddings(s, dir)
      // the q169 artifacts VERBATIM (same outBase + params → cachedBuild
      // shares the build): serving and pipeline rows must answer from one
      // artifact set, like a real deployment
      val invIdx = cachedBuild(dir, "documents.parquet",
          "target/q169_inv_idx", params = "inv:hybridprod") { p =>
        operators.InvertedIndex.buildIndex(docs, p)
      }
      val ivfIdx = cachedBuild(dir, "embeddings.parquet",
          "target/q169_ivf_idx",
          params = s"ivf:nlists=16:hybridprod:cert=k${hybridChannelK}p8") { p =>
        Similarity.buildIvfIndex(emb, p, nLists = 16,
          cert = Some(Similarity.RecallCertSpec(k = hybridChannelK,
            nProbe = 8)))
      }
      val g = cachedBuild(dir, "documents.parquet", "target/q171_simgraph",
          params = s"simidx.v3:jaccard=$simGraphThreshold" +
            s":w=$simGraphShingleWidth:full") { p =>
        operators.SimGraphIndex.build(docs.select("doc_id", "text"),
          "doc_id", "text", p, simGraphThreshold, simGraphShingleWidth)
      }
      // ONE snapshot descriptor over the whole artifact SET (round-18
      // verdict #1): the three epochs are pinned here, before any channel
      // resolves a manifest, and re-asserted after the last channel is
      // built — a mutation landing on any ONE artifact between the
      // sparse channel's resolution and the serp-dedup's graph read
      // fails loudly instead of serving a mixed-snapshot page
      val servingSnap = operators.Serving.resolveServingSnapshot(
        Seq(invIdx, ivfIdx, g))
      Similarity.requireCertifiedRecall(s, ivfIdx, k = hybridChannelK,
        nProbe = 8, floor = 0.70)
      val sparse = operators.InvertedIndex.bm25PerQueryFromIndex(s, invIdx,
          hybridQueries, k = hybridChannelK)
        .select("q_id", "doc_id", "rank")
      val dense = Similarity.ivfTopKFromIndex(ivfIdx,
          emb.filter(col("vec_id") < 5), k = hybridChannelK, nProbe = 8)
        .select(col("q_id").cast("long").as("q_id"),
          col("n_id").cast("long").as("doc_id"), col("rn").as("rank"))
      val cand = Retrieval.rrfFuse(sparse, dense, kRrf = hybridRrfK,
          topK = hybridChannelK)
        .select("q_id", "doc_id", "rrf", "rn")
      val deduped = Retrieval.serpDedup(cand.select("q_id", "doc_id", "rn"),
        operators.SimGraphIndex.edges(s, g))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy("rn")
      val page = deduped.filter(col("action") === "kept")
        .join(cand.select("q_id", "doc_id", "rrf"), Seq("q_id", "doc_id"))
        .withColumn("prn", row_number().over(w))
        .filter(col("prn") <= hybridTopK)
        .select(col("q_id"), col("doc_id"), col("rrf").as("rel"))
      val vectors = emb.select(col("vec_id").as("doc_id"),
        VectorFunctions.toDoubleArray(col("embedding")).as("v"))
      val served = Retrieval.mmrRerank(page, vectors,
          lambdaRel = mmrLambdaRel, lambdaDiv = mmrLambdaDiv, k = mmrK)
        .orderBy("q_id", "rn")
      // every channel's manifest resolution is behind us — assert no
      // artifact epoch moved across the whole construction
      operators.Serving.requireServingSnapshot(servingSnap)
      served
    }),

    // ---- kNN-graph LIFECYCLE CLOSURE (delete → compact → append) -------
    // The SANCTIONED maintained-graph mutation sequence end-to-end as one
    // oracle-gated row (round-17 verdict #4): takedown through
    // deleteFromKnnGraph (tombstones pending + targeted repair, one
    // atomic publish), compactIvfIndex (retires the tombstones — its
    // stale-graph check passes because the repair already ran), then
    // appendToKnnGraph for the recrawl shard (reopened by the
    // compaction). Decisions over the final corpus read the maintained
    // graph; the oracle replays the WHOLE chain from scratch over
    // exactly (base ∖ victims) ∪ shard — hash-green proves three
    // composed delta mutations reproduce the full rebuild
    // decision-for-decision. At exhaustive geometry every step's
    // exactness argument is airtight (delete repair re-probes all
    // cells; append merges through the same bounded heap).
    "q177_semdedup_lifecycle" -> ((s, dir) => {
      val corpus = neardupCorpus(s, dir)
      val base = corpus.filter(col("vec_id") < 1000000L)
      val victims = base.filter(pmod(col("vec_id"), lit(10)) === 3)
      val shard = corpus.filter(col("vec_id") >= 1000000L)
      val idx = cachedBuild(dir, "embeddings.parquet",
          "target/q177_semdedup_lifecycle",
          params = "ivf:nlists=8:knngraph:k=5:del+compact+append") { p =>
        Similarity.buildIvfIndex(base, p, nLists = 8)
        Similarity.buildKnnGraph(s, p, k = 5, nProbe = 8)
        Similarity.deleteFromKnnGraph(victims.select("vec_id"), p,
          k = 5, nProbe = 8)
        Similarity.compactIvfIndex(s, p)
        Similarity.appendToKnnGraph(shard, p, k = 5, nProbe = 8)
      }
      val live = base.filter(pmod(col("vec_id"), lit(10)) =!= 3)
        .unionByName(shard)
      Dedup.semanticDedupDecisions(live, "vec_id", "embedding",
          Similarity.knnGraphFromIndex(s, idx), threshold = 0.9)
        .orderBy("vec_id")
    }),

    // ---- SEMANTIC DEDUP over the QUANTIZED index ------------------------
    // q170's rewrite with its kNN stage answered from the int8
    // filter-refine index (round-17 verdict #5): the candidate pass scans
    // 64-byte code columns instead of 512-byte double vectors (~8× fewer
    // scan bytes for the non-surviving majority at dim 64 — parquet
    // column pruning keeps the doubles unread), survivors re-rank
    // exactly, and the batch join shuffles on cell — never a broadcast
    // of the corpus-sized query side (quantizedKnnJoinFromIndex). The
    // refine pass is PROVABLY exact (the Δ/2 reconstruction bound,
    // q99/q124's gated property), so at exhaustive probe the kNN graph —
    // and every decision — equals q170's, and the oracle is the SAME
    // from-scratch DuckDB replay VERBATIM: hash-green proves the int8
    // path changes the economics, not one decision.
    "q176_semdedup_quantized" -> ((s, dir) => {
      val corpus = neardupCorpus(s, dir)
      val idx = cachedBuild(dir, "embeddings.parquet",
          "target/q176_semdedup_quant",
          params = "quant.v2:nlists=8:semdedup") { p =>
        Similarity.buildQuantizedIndex(corpus, p, nLists = 8)
      }
      Dedup.semanticDedupApplyQuantized(corpus, "vec_id", "embedding",
          idx, threshold = 0.9, k = 5, nProbe = 8)
        .orderBy("vec_id")
    }),

    // ---- QUANTIZED semantic dedup at PRODUCTION geometry ---------------
    // q176 gates the int8 path at exhaustive probe (the exactness proof);
    // THIS row is the geometry a 100 TB quantized dedup run uses —
    // nLists=16 probed at nProbe=8 — behind the PERSISTED DECISION
    // CERTIFICATE (round-18 verdict #3, q173's discipline widened to the
    // quantized artifact): the exhaustive-vs-pruned decision audit runs
    // ONCE at certification time over the index's own vectors and its
    // cert rides the manifest; the serve ASSERTS floor + epoch freshness
    // + (θ, k, nProbe) via one 1-row read. One certificate covers the
    // plain-probe AND int8 filter-refine run forms: at equal geometry the
    // refine pass is provably exact (the Δ/2 bound), so the decisions
    // measured on the plain probe equal the quantized run's — q176==q170
    // hash-green is the standing witness. Output is the production
    // decisions: rows-only for the driver (seeded KMeans routing), frozen
    // by the GoldenSpec pin.
    "q178_semdedup_quant_prod" -> ((s, dir) => {
      val corpus = neardupCorpus(s, dir)
      val idx = cachedBuild(dir, "embeddings.parquet",
          "target/q178_semdedup_quant_prod",
          params = "quant.v2:nlists=16:semdedup-prod:dcert=t0.9k5p8") { p =>
        Similarity.buildQuantizedIndex(corpus, p, nLists = 16)
        Dedup.certifyDecisionRecall(s, p, threshold = 0.9, k = 5,
          nProbe = 8)
      }
      val dropRecall = Dedup.requireCertifiedDecisionRecall(s, idx,
        threshold = 0.9, k = 5, nProbe = 8, floor = 0.90)
      System.err.println(f"[q178] certified decision recall (quantized) " +
        f"at nProbe=8/nLists=16: $dropRecall%.4f")
      Dedup.semanticDedupApplyQuantized(corpus, "vec_id", "embedding",
          idx, threshold = 0.9, k = 5, nProbe = 8)
        .orderBy("vec_id")
    }),

    // ---- PROVABLY-EXACT quantized ANN (filter-and-refine) --------------
    // The int8-code filter pass with a rigorous reconstruction-error
    // bound: per-query ε = Σ|q_i|Δ_i/2 gives per-candidate cosine bounds
    // côs ± ε/(‖q‖‖x‖); prune below the k-th largest lower bound, re-rank
    // ONLY the survivor superset with exact doubles. At exhaustive probe
    // the result EQUALS brute force (same oracle as q26/q52/q92) while
    // the filter scan reads the 64-byte code column instead of 512-byte
    // vectors — the memory-bandwidth shape a 100 TB ANN filter needs.
    // DedupSimilaritySpec measures that the prune actually bites.
    "q99_quantized_refine" -> ((s, dir) => {
      val idx = cachedBuild(dir, "embeddings.parquet",
          "target/q99_pq_index", params = "pq.v2:nlists=8") { p =>
        Similarity.buildQuantizedIndex(Tables.embeddings(s, dir), p,
          nLists = 8)
      }
      Similarity.quantizedRefineTopK(idx,
          Tables.embeddings(s, dir).filter(col("vec_id") < 5),
          k = 5, nProbe = 8)
        .orderBy("q_id", "rn")
    }),

    // ---- Quantized index APPEND: the nightly path of q99's artifact ----
    // Index built on 90% of the corpus (ranges and centroids fit THERE),
    // the %10=3 shard appended against the STORED quantizer — no refit,
    // no range refresh, codes stay valid because they are unclamped
    // longs (an appended value past the fitted [lo,hi] reconstructs
    // within Δ/2 like any other; the one unbounded case — a degenerate
    // dimension that moved — is flagged per row and routed around the
    // prune). At exhaustive probe the result must equal brute force over
    // the FULL corpus (same oracle as q93's plain-IVF append), proving
    // the append landed rows exactly where a rebuild would AND the
    // filter-refine bound survived quantizing rows the ranges never saw.
    "q124_quantized_append" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val idx = cachedBuild(dir, "embeddings.parquet",
          "target/q124_pq_append", params = "pq.v2:nlists=8:app=m10e3") { p =>
        Similarity.buildQuantizedIndex(emb.filter(col("vec_id") % 10 =!= 3),
          p, nLists = 8)
        Similarity.appendToQuantizedIndex(emb.filter(col("vec_id") % 10 === 3),
          p)
      }
      Similarity.quantizedRefineTopK(idx, emb.filter(col("vec_id") < 5),
          k = 5, nProbe = 8)
        .orderBy("q_id", "rn")
    }),

    // ---- North-star: MERGEABLE distinct-count sketch (HLL on the FNV
    // stream). The corpus-card primitive at 100 TB: per-source register
    // tables (≤ 2^10 rows each) come out of ONE narrow pass with a
    // map-side-combined max — the keys themselves never shuffle — and the
    // __all__ row is estimated from a max-MERGE of the per-source
    // sketches, NOT from the raw data, so the result itself witnesses
    // that sketch union is lossless. The exact_distinct column (a real
    // key shuffle — the cost the sketch exists to avoid) is the
    // verification yardstick: SketchesSpec bounds |est−exact| at HLL's
    // ±3σ. Registers, merge, and estimator are all integer state, so the
    // DuckDB oracle re-derives the ENTIRE sketch pipeline bit-for-bit
    // from the same FNV octet fold — hash-gated, not rows-gated, unlike
    // engine-opaque sketches (DataSketches HLL) which admit no oracle.
    "q125_hll_card" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // registers are ≤ 1024 × |sources| rows: pin them (tiny) so the
      // doc scan + hash kernel runs once, not once per consumer.
      val perSource = operators.Sketches
        .hllRegisters(docs, col("text"), Seq("source")).localCheckpoint()
      val bySource = operators.Sketches.hllEstimate(perSource, Seq("source"))
      val global = operators.Sketches.hllEstimate(
          operators.Sketches.mergeRegisters(perSource, Seq.empty), Seq.empty)
        .withColumn("source", lit("__all__"))
      val h = docs.select(col("source"),
        TextFunctions.fnvMixed64(col("text")).as("h"))
      val exact = h.groupBy("source").agg(countDistinct(col("h")).as("exact_distinct"))
        .unionByName(h.agg(countDistinct(col("h")).as("exact_distinct"))
          .withColumn("source", lit("__all__")))
      bySource.unionByName(global)
        .join(exact, Seq("source"))
        .select("source", "est_distinct", "exact_distinct")
        .orderBy("source")
    }),

    // ---- North-star: INCREMENTAL corpus card (persisted HLL artifact).
    // q125's sketch as a maintained index: build the card on a third of
    // the corpus, fold the other two thirds in as arriving shards — each
    // append scans ONLY its shard and max-merges ≤ 2^10 register rows
    // through the manifest machinery (crash-safe generations, grace GC,
    // per-root writer lock — the Bloom/LSH/IVF lifecycle). The oracle
    // recomputes the estimate from the WHOLE corpus from scratch, so a
    // hash-green row proves incremental maintenance is LOSSLESS — the
    // standing corpus is never rescanned yet the card cannot drift. The
    // same merge idempotence makes the card safe under at-least-once
    // re-delivery (re-appending a shard cannot inflate it — spec'd).
    "q126_hll_card_ingest" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val path = cachedBuild(dir, "documents.parquet",
          "target/q126_hll_card", params = "hll:splits=m3") { p =>
        operators.Sketches.buildHllCard(
          docs.filter(col("doc_id") % 3 === 0), "text", p)
        operators.Sketches.appendToHllCard(
          docs.filter(col("doc_id") % 3 === 1), "text", p)
        operators.Sketches.appendToHllCard(
          docs.filter(col("doc_id") % 3 === 2), "text", p)
      }
      val exact = docs
        .select(TextFunctions.fnvMixed64(col("text")).as("h"))
        .agg(countDistinct(col("h")).as("exact_distinct"))
      operators.Sketches.hllCardEstimate(s, path).crossJoin(exact)
        .select("est_distinct", "exact_distinct")
    }),

    // ---- North-star: MERGEABLE quantile sketch (HDR log histogram).
    // Completes the sketch family's quantile member (membership = Bloom,
    // distinct = q125/q126 HLL): per-priority histograms bucketed by the
    // value's top 6 significant bits (≤ 2^-5 relative error at every
    // magnitude, ≤ 3.8k buckets total), the __all__ row derived by
    // bucket-wise SUM of the per-priority sketches — never from the raw
    // rows — and every quantile read off a bounded window over the
    // bucket frame: a global p999 with NO global sort and ≤ 3.8k rows
    // per group on the shuffle. All integer arithmetic (length(bin),
    // shifts, counts), so the oracle reproduces the estimates
    // bit-for-bit. Deterministic cents via round(price·100) — cast
    // truncation of a double product is engine-dependent; round is not.
    "q127_quantile_sketch" -> ((s, dir) => {
      val cents = Tables.orders(s, dir).select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      // the histogram is ≤ 3.8k × 5 rows: pin it (tiny) so the order
      // scan runs once for the per-priority and merged consumers
      val perPrio = operators.Sketches.logHistogram(cents, col("cents"),
        Seq("o_orderpriority")).localCheckpoint()
      val qs = Seq(0.5, 0.9, 0.99, 0.999)
      val byPrio = operators.Sketches.histQuantiles(perPrio,
        Seq("o_orderpriority"), qs)
      val global = operators.Sketches.histQuantiles(
          operators.Sketches.mergeHistograms(perPrio, Seq.empty),
          Seq.empty, qs)
        .withColumn("o_orderpriority", lit("__all__"))
      byPrio.unionByName(global)
        .select(col("o_orderpriority"), col("quantile"),
          col("est").as("est_cents"))
        .orderBy("o_orderpriority", "quantile")
    }),

    // ---- North-star: MERGEABLE frequency sketch (count-min). The
    // family's last member (membership = Bloom, distinct = HLL,
    // quantiles = q127): per-source 4×4096 counter sketches over the
    // token stream, bucket-wise-SUM-merged into the probed sketch —
    // token COUNTS at any corpus size with only d·w rows per source on
    // the shuffle. The d row-hashes derive from ONE fnvMixed64 call
    // (Kirsch–Mitzenmacher double hashing), the probe side (exact
    // top-20 tokens — the verification yardstick, a real key shuffle)
    // broadcasts, and est ≥ exact always (CM overestimates only). All
    // integer state, so the oracle reproduces the ESTIMATES bit-for-bit
    // — the sketch's collision behavior itself is gated, not just its
    // inputs.
    "q128_cms_heavyhitters" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = docs.select(col("source"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
      // per-source sketches merged — the nightly shape; the merged frame
      // is ≤ d·w rows, pinned so both probe joins read one build
      val sk = operators.Sketches.mergeCms(
        operators.Sketches.cmsSketch(toks, col("tok"), Seq("source")),
        Seq.empty).localCheckpoint()
      val top = toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("tok")).limit(20)
        .localCheckpoint() // 20 rows, two consumers
      operators.Sketches.cmsEstimate(sk, top.select("tok"), "tok")
        .join(top, Seq("tok"))
        .select(col("tok"), col("est_cnt"), col("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("tok"))
    }),

    // ---- North-star: HLL SET ALGEBRA — snapshot-overlap estimate.
    // The sketch family's composition payoff: two crawl snapshots (A =
    // doc_id%3!=2, B = doc_id%2==0 — overlapping by construction, like
    // consecutive crawl generations sharing standing docs) each reduce
    // to a ≤ 2^10-row register table; union = register-wise max,
    // intersection = inclusion-exclusion est_a + est_b − est_union.
    // "How much of crawl B is already in crawl A" at 100 TB costs two
    // 4 KB sketches and LONG arithmetic — no key shuffle, and the same
    // register tables the q126 card already maintains answer it for
    // free. All components are the bit-exact q125 estimator, so the
    // DERIVED overlap (including its inclusion-exclusion noise) is
    // oracle-gated bit-for-bit; exact_overlap (a real distinct-key
    // join) is the yardstick carried alongside, q125-style.
    "q132_hll_overlap" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val tagged = docs.filter(col("doc_id") % 3 =!= 2)
        .withColumn("snap", lit("a"))
        .unionByName(docs.filter(col("doc_id") % 2 === 0)
          .withColumn("snap", lit("b")))
      // ≤ 2 × 2^10 register rows: pin so the scan+hash kernel runs once
      val reg = operators.Sketches.hllRegisters(tagged, col("text"),
        Seq("snap")).localCheckpoint()
      val bySnap = operators.Sketches.hllEstimate(reg, Seq("snap"))
      val estA = bySnap.filter(col("snap") === "a")
        .select(col("est_distinct").as("est_a"))
      val estB = bySnap.filter(col("snap") === "b")
        .select(col("est_distinct").as("est_b"))
      val estU = operators.Sketches.hllEstimate(
          operators.Sketches.mergeRegisters(reg, Seq.empty), Seq.empty)
        .select(col("est_distinct").as("est_union"))
      val ha = docs.filter(col("doc_id") % 3 =!= 2)
        .select(TextFunctions.fnvMixed64(col("text")).as("u")).distinct()
      val hb = docs.filter(col("doc_id") % 2 === 0)
        .select(TextFunctions.fnvMixed64(col("text")).as("u")).distinct()
      val exact = ha.join(hb, Seq("u"))
        .agg(count(lit(1)).as("exact_overlap"))
      estA.crossJoin(estB).crossJoin(estU).crossJoin(exact)
        .withColumn("est_overlap",
          col("est_a") + col("est_b") - col("est_union"))
        .select("est_a", "est_b", "est_union", "est_overlap",
          "exact_overlap")
        .orderBy("est_a") // 1 row; pins order for the determinism lint
    }),

    // ---- Pure range join, binned rewrite --------------------------------
    // Point-in-interval with NO equi key: every lineitem price probed
    // against every order's ±0.1 % price band. Spark's native plan for
    // this predicate is BroadcastNestedLoopJoin (O(n·m) comparisons —
    // dead at 100 TB); binnedRangeJoin turns it into ONE shuffled
    // equi-join on floor(price/250) with the exact BETWEEN re-filter
    // (plan-asserted: no BNLJ, no cartesian). binWidth 250 ≈ the P95
    // band width (bands span 2–1000), so the interval side replicates
    // ≤ 5× worst-case and the point side not at all. Oracle is the plain
    // inequality join — DuckDB's IEJoin computes the same pairs its way.
    "q129_range_join_bands" -> ((s, dir) => {
      // Pair-free rewrite (r19, guide §8/§1.2): the 19M-pair binned
      // range join fed a 15-row aggregate — but Σ over pairs needs no
      // pairs: per band, count/sum over points in [lo,hi] is
      // rank_le(hi) − rank_lt(lo) over the per-returnflag price
      // distribution, swept in ONE exchange of O(|li|+|orders|) narrow
      // rows (Relational.rankSweepAgg; exact-equivalence proof in its
      // scaladoc — all-integer arithmetic, identical per-row rounding).
      // The declarative pair-join ORACLE is unchanged and stays
      // hash-green; groups with zero pairs are filtered exactly as the
      // pair join leaves them absent. binnedRangeJoin itself stays
      // spec-gated (RelationalSpec lossless/ownership laws). Inputs are
      // built by q129SweepInputs — ONE construction shared with the
      // #cuts audit pass (r19 advice).
      val (pts, probes) = q129SweepInputs(s, dir)
      Relational.rankSweepAgg(pts, probes,
          crossKeys = Seq("l_returnflag"), matchKeys = Seq.empty,
          vCol = "v", measures = Seq("n_pairs", "sq"),
          probeKeys = Seq("o_orderpriority"), xCol = "x",
          signCol = "sgn", leCol = "le")
        .filter(col("n_pairs") > 0)
        .select(col("l_returnflag"), col("o_orderpriority"),
          col("n_pairs").cast("long").as("n_pairs"),
          (col("sq").cast("long").cast("double") / lit(10000.0))
            .as("sum_qty"))
        .orderBy("l_returnflag", "o_orderpriority")
    }),

    // ---- Weighted PPS sample + Horvitz-Thompson report ------------------
    // Probability-proportional-to-size Poisson sampling over the corpus
    // (long docs proportionally likelier; expected sample ~ k docs) with
    // the keep decision on the shared FNV ppm stream and EXACT integer
    // thresholds — no float compare, so the oracle replays membership
    // bit-for-bit. The report: per-source sampled count and the
    // Horvitz-Thompson token-total estimate Σ w/π from the SAMPLE alone,
    // against the exact total — the unbiased-estimation machinery a
    // data team uses to audit weighted subsamples. Zero corpus shuffle:
    // one 1-row W aggregate broadcast back, then a codegen'd filter.
    "q135_weighted_sample" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        col("source"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("w"))
      val sampled = Relational.weightedPoissonSample(
        docs, "doc_id", "w", k = 40L, seed = 29L)
      val grouped = sampled
        .withColumn("ht", round(
          col("w").cast("double") * lit(1000000.0) / col("__t"), 6))
        .groupBy("source")
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("ht").cast(DecimalType(18, 6))).cast("double")
            .as("ht_tokens"))
      grouped
        .join(docs.groupBy("source").agg(sum("w").as("exact_tokens")),
          Seq("source"))
        .orderBy("source")
    }),

    // ---- Sequential Poisson: EXACTLY-k weighted sample ------------------
    // q135's fixed-budget companion (Ohlsson's design): rank on u/w —
    // one IEEE double division of exactly-representable integers, so
    // membership AND order replay bit-for-bit in the oracle (the reason
    // this is u/w and not a -ln(u)/w exponential key: libm ln differs
    // across engines by ulps; division does not). TakeOrdered plan —
    // bottom-k per partition, no global sort, the q75 class.
    "q136_sequential_poisson" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        col("source"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("w"))
      Relational.sequentialPoissonSample(docs, "doc_id", "w",
          k = 120, seed = 43L)
        .orderBy("doc_id")
    }),

    // ---- Interval-overlap join, binned with ownership dedup -------------
    // Two interval sets (lineitem ±0.05 % price bands × order ±0.1 %
    // bands), joined on OVERLAP — also a nested loop in native Spark.
    // The binned rewrite surfaces a pair in every shared bin; instead of
    // a distinct pass (a second corpus-wide shuffle), each pair is
    // emitted only in its OWNED bin floor(max(lo_l, lo_r)/w) — provably
    // shared and unique, so the join is duplicate-free by construction
    // (the operator scaladoc carries the proof; the spec exercises
    // pairs sharing many bins).
    "q133_interval_overlap_join" -> ((s, dir) => {
      // Pair-free rewrite (r19, guide §8/§1.2 — see q129): for
      // intervals, overlap([a,b],[lo,hi]) = a<=hi ∧ lo<=b, and per band
      //   count = rank_le over the a-distribution at hi
      //         − rank_lt over the b-distribution at lo
      // ({b<lo} ⊆ {a<=hi} because a<=b<lo<=hi — the containment that
      // makes the two-term difference exact). Both distributions ride
      // ONE sweep via the `side` match key; the 29M-pair owned-bin join
      // (and its oracle, which is unchanged and stays hash-green) never
      // materializes. binnedIntervalJoin stays spec-gated. Inputs are
      // built by q133SweepInputs — ONE construction shared with the
      // #cuts audit pass (r19 advice).
      val (dist, probes) = q133SweepInputs(s, dir)
      Relational.rankSweepAgg(dist, probes,
          crossKeys = Seq("l_returnflag"), matchKeys = Seq("side"),
          vCol = "v", measures = Seq("n_pairs", "sq"),
          probeKeys = Seq("o_orderpriority"), xCol = "x",
          signCol = "sgn", leCol = "le")
        .groupBy("l_returnflag", "o_orderpriority")
        .agg(sum("n_pairs").as("n_pairs"), sum("sq").as("sq"))
        .filter(col("n_pairs") > 0)
        .select(col("l_returnflag"), col("o_orderpriority"),
          col("n_pairs").cast("long").as("n_pairs"),
          (col("sq").cast("long").cast("double") / lit(10000.0))
            .as("sum_qty"))
        .orderBy("l_returnflag", "o_orderpriority")
    }),

    // ---- PERSISTED INVERTED INDEX: build + append + BM25 query ---------
    // q69 recomputes BM25 from raw text every call; this is the stored-
    // artifact shape — postings (tok, doc_id, tf, dl) bucket-partitioned
    // by hash(tok) so the term probe statically prunes the scan, df and
    // corpus stats as ADDITIVE side tables. Index built on doc_id%3!=2,
    // the %3==2 shard APPENDED (shard-only pass, standing corpus never
    // re-read — the q89/q93 nightly cadence), then a 4-term BM25 query
    // answered ENTIRELY from the artifact must hash-match the
    // full-corpus from-scratch recompute oracle: every posting, df
    // increment, and stats row survived the build+append round trip.
    "q130_inverted_index_bm25" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val idx = cachedBuild(dir, "documents.parquet",
          "target/q130_inv_index", params = "inv:app=m3e2") { p =>
        operators.InvertedIndex.buildIndex(
          docs.filter(col("doc_id") % 3 =!= 2), p)
        operators.InvertedIndex.appendToIndex(
          docs.filter(col("doc_id") % 3 === 2), p)
      }
      operators.InvertedIndex.bm25FromIndex(s, idx, indexTerms)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }),

    // ---- INVERTED INDEX micro-batch generations (stream maintenance) ---
    // q130's artifact maintained the way the ingest STREAM maintains it:
    // batches land as their own generation triples (exactly-once under
    // replay — the epoch-pinned overwrite), readers union main + batch
    // generations through one snapshot. The build sequence here replays
    // batch 1 deliberately: foreachBatch redelivers side effects
    // at-least-once, and the hash-green oracle (a from-scratch
    // full-corpus recompute) proves the replay changed NOTHING — tf, df,
    // and stats all exactly-once. StreamingEtlSpec drives the same path
    // from a real checkpointed stream with a mid-stream kill.
    "q134_inverted_index_stream_gens" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val idx = cachedBuild(dir, "documents.parquet",
          "target/q134_inv_gens", params = "inv:b=m3:replay=1") { p =>
        operators.InvertedIndex.buildIndex(
          docs.filter(col("doc_id") % 3 === 0), p)
        operators.InvertedIndex.appendBatchToIndex(
          docs.filter(col("doc_id") % 3 === 1), p, batchId = 0L)
        operators.InvertedIndex.appendBatchToIndex(
          docs.filter(col("doc_id") % 3 === 2), p, batchId = 1L)
        // deliberate replay of batch 1 — must be byte-idempotent
        operators.InvertedIndex.appendBatchToIndex(
          docs.filter(col("doc_id") % 3 === 2), p, batchId = 1L)
      }
      operators.InvertedIndex.bm25FromIndex(s, idx, indexTerms)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }),

    // ---- INVERTED INDEX DELETE: the takedown path -----------------------
    // Completes q130's lifecycle: build on 2/3, append the last third,
    // then tombstone every doc_id%7==5 document — no rebuild; the
    // deleted docs' df and (n_docs, tot_dl) contributions land as
    // NEGATIVE delta rows in the additive side tables, so idf and avgdl
    // reflect the shrunken live corpus immediately. The query
    // epoch-shadows tombstoned postings (broadcast sliver) and must
    // hash-match the from-scratch recompute over ONLY the live docs —
    // deleted docs never surface, every surviving score uses live-corpus
    // statistics. InvertedIndexSpec proves compaction leaves the result
    // byte-identical while retiring the tombstone join and the delta
    // rows, and that re-append-after-delete resurrects a doc without
    // compacting (the epoch rule).
    "q131_inverted_index_delete" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val idx = cachedBuild(dir, "documents.parquet",
          "target/q131_inv_delete", params = "inv:app=m3e2:del=m7e5") { p =>
        operators.InvertedIndex.buildIndex(
          docs.filter(col("doc_id") % 3 =!= 2), p)
        operators.InvertedIndex.appendToIndex(
          docs.filter(col("doc_id") % 3 === 2), p)
        operators.InvertedIndex.deleteFromIndex(
          docs.filter(col("doc_id") % 7 === 5).select("doc_id"), p)
      }
      operators.InvertedIndex.bm25FromIndex(s, idx, indexTerms)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }),

    // ---- LSH ANN, recall-sized to reproduce the exact top-k ------------
    // OR-amplified hyperplane LSH with `tables` sized by lshTablesFor so a
    // neighbor at the fixture's 5th-neighbor similarity FLOOR (measured:
    // 0.255 at sf0.01, 0.279 at sf0.001, 0.329 at sf0.1 — sized at 0.25)
    // is missed with p ≤ 1e-6; the oracle is the exact brute-force top-k
    // SQL (same as q26), so a hash-green row proves the bucketing lost no
    // neighbor. At production ANN similarity floors (≥0.7) the same
    // operator needs an order of magnitude fewer tables.
    "q57_lsh_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), k = 5,
          dim = 64, planes = 4, tables = Dedup.lshTablesFor(0.25, planes = 4))
        .orderBy("q_id", "rn")
    }),

    // ---- Top-k window rewrite, gated on the REWRITTEN plan -------------
    // q02's query under GraftExtensions' RewriteTopKWindow: the isolated
    // session (private SQLConf + ExperimentalMethods — the flag and rule
    // never leak into concurrently-running queries) opts in, and the
    // require() proves the oracle-checked result came from the bounded-heap
    // topkrows aggregate, not the row_number window.
    "q58_topk_rewrite" -> ((s, dir) => {
      val s2 = s.newSession()
      s2.experimental.extraOptimizations = Seq(plans.RewriteTopKWindow)
      s2.conf.set("spark.graft.topkRewrite.enabled", "true")
      val counts = Tables.events(s2, dir)
        .groupBy("event_type", "user_id").agg(count(lit(1)).as("cnt"))
      val df = Relational.topKPerGroup(counts, Seq("event_type"), col("cnt"),
          3, Seq(col("user_id")))
        .withColumn("rn", col("rn").cast("long"))
        .select("event_type", "user_id", "cnt", "rn")
        .orderBy("event_type", "rn")
      val plan = df.queryExecution.executedPlan.toString
      require(plan.contains("topkrows"),
        "q58 must execute the rewritten bounded-heap plan")
      require(!plan.contains("Window"),
        "q58 must not contain a row_number window")
      df
    }),

    // ---- Multimodal frame-sample + resize, oracle-gated ----------------
    // Completes the multimodal quartet (decode/extract are q55): sampled
    // 64-byte "frames" every 2 chunks via columnar binary substring, each
    // batch-checksummed; plus a stride-resize thumbnail checksum per
    // media. All integer folds the DuckDB oracle reproduces exactly.
    "q60_media_frames" -> ((s, dir) => {
      val media = operators.Multimodal.ingest(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("bytes")),
        "doc_id", "bytes")
      val frames = operators.Multimodal.frameChecksums(
        operators.Multimodal.sampleFrames(media, chunkBytes = 64, everyK = 2))
      val thumbs = operators.Multimodal.thumbnailChecksums(media,
        targetBytes = 256)
      frames.groupBy("media_id").agg(
          count(lit(1)).as("n_frames"),
          sum("frame_checksum").as("sum_frame_checksum"))
        .join(thumbs, Seq("media_id"))
        .select(col("media_id"), col("n_frames"),
          col("sum_frame_checksum"), col("thumb_checksum"))
        .orderBy("media_id")
    }),

    // ---- Multimodal REAL downsample path (round-7): box-filter area
    // averaging — every byte contributes to exactly one output cell,
    // O(target) memory however large the payload — vs q60's stride-drop
    // stub. The oracle re-derives cell geometry, per-cell integer means,
    // checksum, and downsampled brightness from the UTF-8 octet list, so
    // the kernel math is proven byte-for-byte. target=64 < most doc
    // lengths, so real averaging happens; short docs take the n<=target
    // pass-through branch (both branches fixture-exercised) -------------
    "q79_media_downsample" -> ((s, dir) => {
      val media = operators.Multimodal.ingest(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("bytes")),
        "doc_id", "bytes")
      operators.Multimodal.downsampleChecksums(media, targetBytes = 64)
        .select(col("media_id"), col("n_bytes"), col("ds_len"),
          col("ds_checksum"), round(col("ds_brightness"), 6).as("ds_brightness"))
        .orderBy("media_id")
    }),

    // ---- North-star: BPE-ish pre-token counting + fertility ------------
    // Pre-tokenizer budget metric for training pipelines: BPE-style token
    // counts next to whitespace-word counts, and their ratio (fertility).
    // The regex is RE2-compatible so DuckDB evaluates the identical
    // pattern — the counts hash-match, gating the tokenizer itself.
    "q59_bpe_tokens" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("n_bpe",
          size(TextFunctions.bpeTokens(col("text"))).cast("long"))
        .withColumn("n_ws",
          size(TextFunctions.tokens(col("text"))).cast("long"))
        .groupBy("lang").agg(
          count(lit(1)).as("docs"),
          sum("n_bpe").as("bpe_tokens"),
          sum("n_ws").as("ws_tokens"),
          (sum("n_bpe").cast("double") / sum("n_ws")).as("fertility"))
        .orderBy("lang")),

    // ---- End-to-end corpus pipeline: quality filter → near-dedup -------
    // The C4-style composition (length/alpha gates, then keep-first
    // near-dup removal), oracle-checked against the full quadratic
    // jaccard over the filtered corpus.
    "q53_corpus_filter" -> ((s, dir) => {
      val filtered = Tables.documents(s, dir)
        .filter(size(TextFunctions.tokens(col("text"))) >= 30 &&
          (length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double") /
            length(col("text"))) >= 0.8)
      Dedup.dropNearDuplicates(filtered, "doc_id", "text", threshold = 0.8)
        .select("doc_id", "lang").orderBy("doc_id")
    }),

    // ---- North-star: duplicate-substring SCRUB (Lee et al. 2022 §4's
    // dedup-by-substring, at token-8-gram granularity): REWRITE each doc
    // removing every token covered by an 8-gram that occurs ≥ 2 times
    // corpus-wide — the ACTION complementing q71's signal. Scale shape:
    // the positional gram stream is materialized ONCE (localCheckpoint
    // inside the operator) as (doc_id, i, fnv64) 20-byte rows; the
    // duplicated-gram set comes from a map-side-combined groupBy(gh)
    // count (hot grams fold inside each task — the r12 de-skew) and
    // flags occurrences via a semi-join on the same gh key; only the
    // flagged positions — the duplicated spans, sparse by construction
    // in a deduplicated-enough corpus — expand to covered-position rows
    // and shuffle again, folding to ONE array per affected doc. The rewrite itself is a doc-level
    // join (AQE broadcasts the cover side when sparse) plus a narrow
    // index-aware filter — the corpus is never exploded to token rows and
    // never shuffles. Per-row cost of the filter is O(n_tok · log n_cov)
    // via the sorted cover array... (array_contains is linear but n_cov ≤
    // n_tok ≤ doc length, so worst case is a fully-duplicated doc at
    // O(n_tok²) on docs of ~1e3 tokens — bounded, spill-free). The
    // oracle replays the semantics over exploded token positions ---------
    "q94_dup_gram_scrub" -> ((s, dir) =>
      Dedup.scrubDuplicateGrams(Tables.documents(s, dir), "doc_id", "text",
          n = 8)
        .orderBy("doc_id")),

    // ---- North-star: content-defined chunking dup report ---------------
    // CDC at token granularity (TextFunctions.cdcChunks — Rabin-style
    // local boundaries, so edits re-chunk only their neighborhood): per
    // doc, how much of its token stream lives in chunks shared VERBATIM
    // with other docs — the partial-overlap detector between q19's
    // whole-doc exact dedup and q71's per-gram accounting, at chunk
    // (not gram) shuffle volume: ~1/modulus the rows of the gram stream,
    // 24 bytes each, text never exploded. Shared = chunk content hash in
    // ≥2 distinct docs; one (chash, doc_id) distinct + count, and the
    // shared set semi-folds back as a join on the same chash exchange.
    "q111_cdc_chunks" -> ((s, dir) => {
      // the chunk stream fans out to TWO consumers (the shared-set
      // aggregate and the final classification join) — materialize the
      // 28-byte rows once or the tokenize+window kernel runs per consumer
      val rows = Dedup.cdcChunkRows(Tables.documents(s, dir),
        "doc_id", "text").localCheckpoint()
      val shared = rows.select("chash", "doc_id").distinct()
        .groupBy("chash").agg(count(lit(1)).as("d"))
        .filter(col("d") >= 2).select("chash")
      rows.join(shared.withColumn("sh", lit(1)), Seq("chash"), "left_outer")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum("ctoks").as("n_tok"),
          coalesce(sum(when(col("sh") === 1, col("ctoks"))), lit(0L))
            .as("dup_tok"))
        .withColumn("dup_frac",
          round(col("dup_tok").cast("double") / col("n_tok"), 6))
        .orderBy("doc_id")
    }),

    // ---- North-star: BPE vocabulary TRAINING (Sennrich et al. 2016) ----
    // 10 exact merge rounds learned from the corpus — see operators.Bpe
    // for the scale design (ONE corpus pass builds the word-frequency
    // table; every round runs on the compact vocab table with
    // lineage-truncating checkpoints; the per-round argmax is a 1-row
    // boundary scalar, audited via auditPlans). FULL SQL oracle: the
    // DuckDB twin replays the identical 10 rounds with a bracket-encoded
    // symbol string (chr(1)‖sym‖chr(2) — adjacent symbols share no
    // characters, so plain left-to-right replace() IS BPE's leftmost
    // non-overlapping merge application), materialized stage by stage ----
    "q95_bpe_merges" -> ((s, dir) => {
      val merges = operators.Bpe.trainMerges(
        operators.Bpe.wordFreq(Tables.documents(s, dir), "text"),
        nMerges = 10)
      operators.Bpe.mergesDf(s, merges)
    }),

    // ---- North-star: TF-IDF top terms per document ---------------------
    // The classic sparse-retrieval/curation feature (complement of q69's
    // query-side BM25: this is the corpus-side per-doc signature). Scale
    // shape: tf is one (doc, term) hash-shuffled agg over the token
    // stream; df derives from tf rows (vocab-bounded) and BROADCASTS back
    // with the 1-row corpus count, so scoring adds no shuffle; the top-3
    // window partitions by doc_id — group size = per-doc distinct terms,
    // bounded by doc length. Ranking uses the 6-dp-ROUNDED score with a
    // term tiebreak, so cross-engine order is deterministic even at
    // rounding boundaries (idf = smoothed ln((1+N)/(1+df)) + 1,
    // sklearn's formulation) ---------------------------------------------
    "q96_tfidf_topterms" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val tf = docs.select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dfT = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(broadcast(dfT), Seq("tok"))
        .crossJoin(broadcast(n))
        .withColumn("tfidf", round(col("tf") *
          (log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) + 1.0),
          6))
      Relational.topKPerGroup(scored, Seq("doc_id"), col("tfidf"), 3,
          Seq(col("tok")))
        .select(col("doc_id"), col("rn").cast("long").as("trank"),
          col("tok"), col("tf"), col("df"), col("tfidf"))
        .orderBy("doc_id", "trank")
    }),

    // ---- North-star CAPSTONE: the full corpus-curation chain -----------
    // The Dolma/C4/RefinedWeb shape end-to-end as ONE DataFrame program,
    // every stage an operator this suite gates individually: quality gate
    // (q53's token-count + alpha-ratio rules) → benchmark DECONTAMINATION
    // (q66's 8-gram broadcast probe against the %10=7 eval slice, doc
    // dropped on any overlap) → near-dedup KEEP-BEST (q81's shared
    // component labels, max_by(blen, -id) per component) → duplicate-
    // substring SCRUB over the survivors (q94). Scale shape: the corpus
    // flows through the chain as doc-level rows — eval grams and the
    // keep-id set broadcast, the only corpus-scale exchanges are the LSH
    // band shuffle inside componentLabels and the scrub's gram-hash
    // window. The oracle replays all four stages in one WITH RECURSIVE
    // chain (quality CTEs + the q81 closure seeded from the decontaminated
    // set + the scrub CTEs over the survivor relation), so a hash-green
    // row pins every inter-stage boundary, not just each stage alone -----
    "q98_corpus_curation" -> ((s, dir) => {
      val all = Tables.documents(s, dir)
      val grams8 = (d: DataFrame) => d.select(col("doc_id"),
        explode(array_distinct(TextFunctions.tokenShingles(
          TextFunctions.tokens(col("text")), 8))).as("g"))
        .select(col("doc_id"), TextFunctions.fnv64(col("g")).as("gh"))
      val quality = all.filter(
        size(TextFunctions.tokens(col("text"))) >= 30 &&
          (length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
            .cast("double") / length(col("text"))) >= 0.8)
      val evalGrams = grams8(all.filter(pmod(col("doc_id"), lit(10)) === 7))
        .select("gh").distinct()
      val cand = quality.filter(pmod(col("doc_id"), lit(10)) =!= 7)
      val contaminated = grams8(cand)
        .join(broadcast(evalGrams), Seq("gh"))
        .select("doc_id").distinct()
      // decon fans out to FOUR consumers (componentLabels' internal
      // passes, the keep-best agg, the survivor semi-join, the scrub) —
      // materialize it once or the quality+decontam subtree re-executes
      // per consumer (measured: 19.8 s unchecked vs ~8 s checkpointed at
      // sf0.1). Same for survivors (three scrub-internal consumers).
      val decon = cand.join(contaminated, Seq("doc_id"), "left_anti")
        .localCheckpoint()
      val comp = Dedup.componentLabels(decon, "doc_id", "text",
        threshold = 0.8)
      val keep = decon.select(col("doc_id"),
          octet_length(col("text")).cast("long").as("blen"))
        .join(comp, Seq("doc_id"))
        .groupBy("component")
        .agg(expr("max_by(doc_id, struct(blen, -doc_id))").as("doc_id"))
        .select("doc_id")
      val survivors = decon.join(keep, Seq("doc_id"), "left_semi")
        .localCheckpoint()
      Dedup.scrubDuplicateGrams(survivors, "doc_id", "text", n = 8)
        .orderBy("doc_id")
    }),

    // ---- North-star: token-distribution DRIFT between snapshots --------
    // The monitoring scalar a managed corpus publishes per release:
    // per-source KL divergence KL(p_v1 ‖ p_v2) of the +1-smoothed
    // unigram distributions over the union vocab (q104's v1/v2 pair), so
    // an ingest that shifts a source's language silently shows up as a
    // number before any model trains on it. Scale shape: two token-count
    // aggs (map-side combined) meet in ONE full-outer join co-partitioned
    // on (source, token); the per-source totals frame is |sources| rows
    // and broadcasts; per-term contributions round to 12 dp and sum as
    // DECIMAL so the hash cannot depend on aggregation order ------------
    "q109_token_drift" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      def counts(d: DataFrame, c: String) = d
        .select(col("source"), explode(TextFunctions.tokens(col("text")))
          .as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as(c))
      val v1 = docs.filter(col("doc_id") % 10 =!= 7)
      val v2 = docs.filter(col("doc_id") % 10 =!= 4)
        .select(col("source"),
          when(col("doc_id") % 10 === 5,
            concat(col("text"), lit(" v2edit")))
            .otherwise(col("text")).as("text"))
      val joined = counts(v1, "c1")
        .join(counts(v2, "c2"), Seq("source", "tok"), "full_outer")
        .select(col("source"), col("tok"),
          coalesce(col("c1"), lit(0L)).as("c1"),
          coalesce(col("c2"), lit(0L)).as("c2"))
      val stats = joined.groupBy("source").agg(
        sum("c1").as("n1"), sum("c2").as("n2"), count(lit(1)).as("v"))
      joined.join(broadcast(stats), Seq("source"))
        .withColumn("p1", (col("c1") + 1.0) / (col("n1") + col("v")))
        .withColumn("p2", (col("c2") + 1.0) / (col("n2") + col("v")))
        .withColumn("term",
          round(col("p1") * log(col("p1") / col("p2")), 12))
        .groupBy("source")
        .agg(max("n1").as("n1"), max("n2").as("n2"), max("v").as("v"),
          round(sum(col("term").cast(DecimalType(28, 12))).cast("double"),
            6).as("kl"))
        .orderBy("source")
    }),

    // ---- North-star: deterministic SHARD EXPORT (write → read gate) ----
    // The pipeline's LAST step: emit the corpus as training shards in the
    // q74 deterministic-shuffle order (Sources.writeShards — contiguous
    // pos slices, one dir per shard, rows pos-sorted inside). Gated like
    // q90/q100: the report reads the WRITTEN copy and fingerprints every
    // shard with a position-weighted fold — fp = Σ (pos+1)·h(doc) mod p —
    // which is ORDER-AWARE yet commutative (a sum), so it verifies each
    // doc sits at exactly its permutation position without any ordered
    // collect; contiguity shows as last−first+1 = n_docs. The oracle
    // replays the permutation, slicing, and fold from the raw fixture —
    // a hash-green row proves the export lost, duplicated, displaced,
    // and mutated NOTHING.
    "q120_shard_export" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val out = cachedBuild(dir, "documents.parquet",
          "target/q120_shards", params = "shards=8:buckets=32:seed=23") { p =>
        Sources.writeShards(docs, "doc_id", p, shards = 8,
          buckets = 32, seed = 23L)
      }
      val M = 1000000007L
      val mh = pmod(TextFunctions.fnv64(concat(
        col("doc_id").cast("string"), lit(":"), col("text"))), lit(M))
      s.read.parquet(out)
        .select(col("shard").cast("long").as("shard"), col("pos"),
          pmod((col("pos") + 1) * mh, lit(M)).as("term"))
        .groupBy("shard").agg(
          count(lit(1)).as("n_docs"),
          min("pos").as("first_pos"), max("pos").as("last_pos"),
          pmod(sum("term"), lit(M)).as("fp"))
        .orderBy("shard")
    }),

    // ---- North-star: temporal COMPLETENESS report (event pipeline) -----
    // Did every hour of the collection window actually arrive, per event
    // type? The gap report an ingestion team reads before trusting a
    // window of data: per type — expected hours (global span), present
    // hours, missing hours, number of gap RUNS and the longest run
    // (gaps-and-islands on the hour index). Plan: ONE map-side-combined
    // distinct over (type, hour) is the only event-stream shuffle;
    // everything after runs on the |types|×|hours| calendar frame
    // (bounded by wall-clock time, not data volume — the q74/q107
    // bounded-domain class), with the 1-row span frame broadcast.
    "q118_hour_gaps" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val present = ev.select(col("event_type"),
        date_trunc("hour", col("ts")).as("h")).distinct()
      val bounds = ev.agg(date_trunc("hour", min("ts")).as("h0"),
        date_trunc("hour", max("ts")).as("h1"))
      val hours = bounds.select(explode(sequence(col("h0"), col("h1"),
        expr("interval 1 hour"))).as("h"))
      val types = ev.select("event_type").distinct()
      val expectedCnt = bounds.select(
        ((unix_timestamp(col("h1")) - unix_timestamp(col("h0"))) / 3600
          + 1).cast("long").as("hours_expected"))
      val missing = types.crossJoin(hours)
        .join(present, Seq("event_type", "h"), "left_anti")
        .select(col("event_type"),
          (unix_timestamp(col("h")) / 3600).cast("long").as("hi"))
      val wrn = Window.partitionBy("event_type").orderBy("hi")
      val gapAgg = missing
        .withColumn("g", col("hi") - row_number().over(wrn))
        .groupBy("event_type", "g").agg(count(lit(1)).as("run"))
        .groupBy("event_type").agg(
          sum("run").as("hours_missing"),
          count(lit(1)).as("n_gap_runs"),
          max("run").as("max_gap_hours"))
      types
        .join(present.groupBy("event_type")
          .agg(count(lit(1)).as("hours_present")), Seq("event_type"))
        .join(gapAgg, Seq("event_type"), "left_outer")
        .crossJoin(broadcast(expectedCnt))
        .select(col("event_type"), col("hours_expected"),
          col("hours_present"),
          coalesce(col("hours_missing"), lit(0L)).as("hours_missing"),
          coalesce(col("n_gap_runs"), lit(0L)).as("n_gap_runs"),
          coalesce(col("max_gap_hours"), lit(0L)).as("max_gap_hours"),
          round(col("hours_present").cast("double") /
            col("hours_expected"), 6).as("coverage"))
        .orderBy("event_type")
    }),

    // ---- North-star: referential-integrity report (data quality) -------
    // The profiler's sibling: orphan-FK rates across the star schema's
    // three load-bearing edges, with orphans PLANTED (a %100=3 slice of
    // orders gets shifted custkeys — the q115 never-seen-token trick) so
    // the orphan arm reports a nonzero rate, not a vacuous pass. The
    // orphan set is never materialized: one key-only left join per edge,
    // folded straight into a global count (Relational.orphanReport).
    "q117_fk_orphans" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val dirty = orders.withColumn("o_custkey",
        when(col("o_orderkey") % 100 === 3, col("o_custkey") + 10000000L)
          .otherwise(col("o_custkey")))
      Relational.orphanReport(dirty, "o_custkey",
          Tables.customer(s, dir), "c_custkey",
          "orders.o_custkey->customer.c_custkey")
        .unionByName(Relational.orphanReport(li, "l_orderkey",
          orders, "o_orderkey", "lineitem.l_orderkey->orders.o_orderkey"))
        .unionByName(Relational.orphanReport(li, "l_partkey",
          Tables.part(s, dir), "p_partkey",
          "lineitem.l_partkey->part.p_partkey"))
        .orderBy("relation")
    }),

    // ---- North-star: key-UNIQUENESS report (data quality) --------------
    // The trio's third leg (profile / FK orphans / uniqueness): is the
    // claimed primary key actually unique? Three claims checked: orders'
    // PK (clean), lineitem's TPC-H composite PK — which the report
    // DISCOVERS is not enforced by the synthetic generator (43% dup
    // mass, max multiplicity 6: exactly the drop-a-claimed-PK surprise
    // this check exists to catch pre-ingest) — and a deliberate non-key
    // (o_custkey mod 1000) anchoring the saturated end. One map-side-
    // combined groupBy per claim; only key columns ever shuffle.
    "q121_key_uniqueness" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      Relational.uniquenessReport(orders, Seq("o_orderkey"),
          "orders(o_orderkey)")
        .unionByName(Relational.uniquenessReport(li,
          Seq("l_orderkey", "l_linenumber"),
          "lineitem(l_orderkey,l_linenumber)"))
        .unionByName(Relational.uniquenessReport(
          orders.withColumn("ck1000", col("o_custkey") % 1000),
          Seq("ck1000"), "orders(o_custkey%1000) [non-key]"))
        .orderBy("relation")
    }),

    // ---- North-star: one-pass COLUMN PROFILER (data quality) -----------
    // The Deequ shape: per column — non-null count, exact distinct, and
    // numeric min/max/decimal-mean — in ONE aggregate pass over the
    // table (Relational.profile; the multi-distinct Expand is the
    // documented exact-count trade, HLL-swappable at 100 TB), then a
    // 1-row explode to long format. The pre-ingest sanity report every
    // pipeline runs on a new relational drop.
    "q116_profile" -> ((s, dir) =>
      Relational.profile(Tables.orders(s, dir),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority"))),

    // ---- North-star: numeric-value DRIFT (exact two-sample KS) ---------
    // q109 alarms on token-distribution drift; this is the NUMERIC twin —
    // the exact two-sample Kolmogorov-Smirnov statistic between two event
    // populations (user-parity cohorts), the gate a pipeline puts on a
    // feature column between snapshots. Exact, not sketched, at ANY
    // domain cardinality (round-11 verdict #2): one groupBy(value)
    // histogram shuffle, then the global cumsum as range-BUCKETED
    // prefix sums — approx-percentile cut points (a 1-row audited
    // collect; placement only load-balances), per-bucket subtotals +
    // broadcast exclusive offsets (the shuffleIndex trick), and
    // bucket-PARTITIONED within-bucket windows — so no partition-less
    // window ever touches the |domain|-row frame. D = max over
    // distinct v of |F_A(v) − F_B(v)|, right-continuous ECDFs.
    "q114_value_drift" -> ((s, dir) =>
      Relational.ksStatistic(
        Tables.events(s, dir)
          .select((col("user_id") % 2).as("side"), col("value")),
        "side", "value")),

    // ---- North-star: per-source DATASET CARD (observability) -----------
    // The one-pass summary a data team publishes with a snapshot (the
    // "dataset card" numbers): per source — docs, tokens, mean length,
    // language spread, exact-dup fraction (corpus-WIDE copies, so a
    // source holding the duplicate of another source's doc counts), and
    // the q53/q98/q108 quality-gate pass rate. Plan: ONE kernel pass per
    // doc to a narrow (source, lang, wc, q, th) row, then TWO-LEVEL
    // aggregation instead of a count window over the text hash
    // (round-12 de-skew, the q94 class: a boilerplate doc duplicated
    // millions of times would buffer its whole occurrence list in one
    // window group). Level 1 collapses copies per (source, lang, th)
    // with map-side combine — a hot hash crosses the exchange
    // pre-counted per task; level 2 sums per-hash counts globally
    // (identical text ⇒ identical wc/alpha/q, the collision-freedom
    // argument the oracle witnesses by grouping raw text); the dup flag
    // joins back onto the collapsed one-row-per-(source,lang,th) frame.
    "q113_corpus_card" -> ((s, dir) => {
      val d0 = Tables.documents(s, dir)
        .select(col("source"), col("lang"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("wc"),
          (length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
            .cast("double") / length(col("text"))).as("alpha"),
          xxhash64(col("text")).as("th"))
        .select(col("source"), col("lang"), col("wc"), col("th"),
          when(col("wc") >= 30 && col("alpha") >= 0.8, 1L)
            .otherwise(0L).as("q"))
      val lvl1 = d0.groupBy("source", "lang", "th")
        .agg(count(lit(1)).as("grp_cnt"),
          first("wc").as("wc"), first("q").as("q"))
      val copies = lvl1.groupBy("th").agg(sum("grp_cnt").as("n_copies"))
      lvl1.join(copies, Seq("th"))
        .groupBy("source").agg(
          sum("grp_cnt").as("n_docs"),
          sum(col("wc") * col("grp_cnt")).as("n_tok"),
          round(sum(col("wc") * col("grp_cnt")).cast("double") /
            sum("grp_cnt"), 6).as("mean_wc"),
          countDistinct("lang").as("n_langs"),
          sum(when(col("n_copies") >= 2, col("grp_cnt")).otherwise(0L))
            .as("dup_docs"),
          round(sum(when(col("n_copies") >= 2, col("grp_cnt"))
            .otherwise(0L)).cast("double") / sum("grp_cnt"), 6)
            .as("pct_dup"),
          sum(col("q") * col("grp_cnt")).as("q_docs"),
          round(sum(col("q") * col("grp_cnt")).cast("double") /
            sum("grp_cnt"), 6).as("pct_quality"))
        .orderBy("source")
    }),

    // ---- North-star: curation DROP-REASON report (observability) -------
    // The companion every q98-style pipeline ships with: per doc, WHICH
    // stage decided its fate — dropped_quality / dropped_decontam /
    // dropped_dup / kept_scrubbed / kept_clean — the report a data team
    // reads before shipping a snapshot (and the debugging surface when a
    // gate misfires). Same stage operators and precedence as q98; the
    // classification is left-join flag frames folded by one when-chain,
    // so the corpus is scanned once and each stage's id set joins
    // co-partitioned on doc_id. "Scrubbed" = any position covered by a
    // corpus-wide duplicated 8-gram (the q94 map-side-combined dup-set
    // kernel, stopped at the coverage test — no rewrite work for a
    // report). The candidate docs' 8-gram stream is tokenized ONCE
    // (localCheckpoint) and feeds BOTH gram stages — the contamination
    // probe and the scrub count (round-11 verdict #7: the kernel used
    // to run twice). The oracle replays all stages in one WITH
    // RECURSIVE chain ending in the same CASE precedence ----------------
    "q108_curation_report" -> ((s, dir) => {
      val all = Tables.documents(s, dir)
      val corpus = all.filter(pmod(col("doc_id"), lit(10)) =!= 7)
        .select("doc_id", "text")
      // positional (non-distinct) grams: the scrub count needs repeats
      // within a doc; the contamination probe distincts on doc_id anyway
      val grams8 = (d: DataFrame) => d.select(col("doc_id"),
        explode(TextFunctions.tokenShingles(
          TextFunctions.tokens(col("text")), 8)).as("g"))
        .select(col("doc_id"), TextFunctions.fnv64(col("g")).as("gh"))
      val quality = all.filter(
        size(TextFunctions.tokens(col("text"))) >= 30 &&
          (length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
            .cast("double") / length(col("text"))) >= 0.8)
      val evalGrams = grams8(all.filter(pmod(col("doc_id"), lit(10)) === 7))
        .select("gh").distinct()
      val cand = quality.filter(pmod(col("doc_id"), lit(10)) =!= 7)
      // the ONE tokenize+shingle kernel pass over candidate docs, shared
      // by the contamination probe and (filtered to survivors) the scrub
      val candGrams = grams8(cand).localCheckpoint()
      // contaminated fans out to TWO consumers (decon's anti-join and the
      // final classification join) — materialize the id set once
      val contaminated = candGrams
        .join(broadcast(evalGrams), Seq("gh"))
        .select("doc_id").distinct()
        .localCheckpoint()
      val decon = cand.join(contaminated, Seq("doc_id"), "left_anti")
        .localCheckpoint()
      val comp = Dedup.componentLabels(decon, "doc_id", "text",
        threshold = 0.8)
      // keep likewise feeds the survivor semi-join AND the final join —
      // id-only rows, cheap to pin
      val keep = decon.select(col("doc_id"),
          octet_length(col("text")).cast("long").as("blen"))
        .join(comp, Seq("doc_id"))
        .groupBy("component")
        .agg(expr("max_by(doc_id, struct(blen, -doc_id))").as("doc_id"))
        .select("doc_id")
        .localCheckpoint()
      // survivor grams = the shared candidate gram frame filtered by the
      // survivor id set — no second tokenize pass; the duplicated-gram
      // set is map-side combined (Dedup.duplicatedGramSet), never a
      // window over a hot gram's occurrence list
      val survGrams = candGrams.join(keep, Seq("doc_id"), "left_semi")
      val scrubbed = survGrams
        .join(Dedup.duplicatedGramSet(survGrams), Seq("gh"), "left_semi")
        .select("doc_id").distinct()
      corpus
        .join(quality.select(col("doc_id"), lit(1).as("q")),
          Seq("doc_id"), "left_outer")
        .join(contaminated.withColumn("ct", lit(1)), Seq("doc_id"),
          "left_outer")
        .join(keep.withColumn("kb", lit(1)), Seq("doc_id"), "left_outer")
        .join(scrubbed.withColumn("sc", lit(1)), Seq("doc_id"),
          "left_outer")
        .select(col("doc_id"),
          when(col("q").isNull, "dropped_quality")
            .when(col("ct") === 1, "dropped_decontam")
            .when(col("kb").isNull, "dropped_dup")
            .when(col("sc") === 1, "kept_scrubbed")
            .otherwise("kept_clean").as("status"))
        .orderBy("doc_id")
    }),

    // ---- JSONL round-trip gate (the corpus interchange format) ---------
    // Dolma/RedPajama-style corpora ship as gzip JSONL; this is the
    // write→read loop gated on LOSSLESSNESS: documents written via
    // Sources.writeJsonl (once — cachedBuild), read back with the source
    // table's own schema (zero inference passes), and fingerprinted
    // per doc. The oracle computes the same polynomial fingerprint over
    // the ORIGINAL parquet, so a hash-green row proves every text byte
    // and typed column survived the JSON encode/decode (the mixed-corpus
    // gate runs this same loop over CJK/emoji text). The gzip-parts
    // layout keeps the read parallel — each part is one task, unlike a
    // monolithic .gz text source (quirk Q7) ------------------------------
    "q100_jsonl_roundtrip" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val path = cachedBuild(dir, "documents.parquet",
          "target/q100_jsonl") { p => Sources.writeJsonl(docs, p) }
      Sources.jsonlWithSchema(s, path, docs.schema)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          TextFunctions.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // ---- ORC round-trip gate (the Hive-side columnar interchange) ------
    // q100's losslessness loop for ORC: documents written once via
    // Sources.writeOrc (cachedBuild), read back typed with the schema
    // from the FILE (no schema argument, no inference pass — the ORC
    // advantage over JSONL), fingerprinted per doc against the original-
    // fixture oracle. With parquet as the native store, JSONL (q100) and
    // ORC (q103) close out the interchange-format matrix a corpus
    // pipeline actually meets ------------------------------------------
    "q103_orc_roundtrip" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val path = cachedBuild(dir, "documents.parquet",
          "target/q103_orc") { p => Sources.writeOrc(docs, p) }
      s.read.orc(path)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          TextFunctions.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // ---- North-star: BPE ENCODE against a PERSISTED vocabulary ---------
    // The q92 build-once/query-many shape applied to tokenization: the
    // trained symbolized vocab is written as parquet ONCE per corpus
    // (cachedBuild — repeated constructions and bench passes skip the 10
    // training rounds entirely), and encoding is a broadcast join of the
    // corpus token stream against the stored vocab folding to one per-doc
    // agg — the amortized cost a 100 TB pipeline actually pays per encode
    // pass. OOV words (unseen shards) fall back to character symbols
    // (spec-pinned); here the corpus trains the vocab so every word hits.
    // The oracle re-trains the identical 10 rounds in DuckDB and encodes
    // against the final stage — a hash-green row proves the STORED
    // artifact reproduces the freshly-trained tokenizer exactly ----------
    "q97_bpe_encode" -> ((s, dir) => {
      val vocabPath = cachedBuild(dir, "documents.parquet",
          "target/q97_bpe_vocab", params = "bpe:nmerges=10") { p =>
        operators.Bpe.trainAndWriteVocab(
          operators.Bpe.wordFreq(Tables.documents(s, dir), "text"),
          nMerges = 10, path = p)
      }
      operators.Bpe.encodeCounts(Tables.documents(s, dir), "doc_id",
          "text", vocabPath)
        .select(col("doc_id"), col("n_ws"), col("n_bpe"),
          round(col("n_bpe").cast("double") / col("n_ws"), 6)
            .as("fertility"))
        .orderBy("doc_id")
    }),

    // ---- North-star: TOKENIZER-FIT report (fertility + OOV) ------------
    // The number a team checks before committing to a tokenizer: per
    // source, fertility (BPE symbols per whitespace word) and OOV rate
    // against a vocab trained on the STANDING corpus only (%10≠7) — the
    // %10=7 holdout supplies genuine OOV words for the char-fallback arm,
    // the production regime where incoming data meets a frozen tokenizer.
    // Same stored-artifact amortization as q97 (cachedBuild; vocab is a
    // broadcast ~|vocab|-row table, the token stream never shuffles for
    // scoring — one groupBy(source) partial agg).
    "q115_tokenizer_fit" -> ((s, dir) => {
      val vocabPath = cachedBuild(dir, "documents.parquet",
          "target/q115_bpe_vocab", params = "bpe:nmerges=10:hold=m10e7") { p =>
        operators.Bpe.trainAndWriteVocab(
          operators.Bpe.wordFreq(
            Tables.documents(s, dir).filter(col("doc_id") % 10 =!= 7),
            "text"),
          nMerges = 10, path = p)
      }
      val vocab = s.read.parquet(vocabPath)
        .select(col("word"), size(col("syms")).cast("long").as("n_syms"))
      // the holdout slice arrives with a token the frozen vocab has never
      // seen (q89's suffix trick) so the char-fallback/OOV arm is
      // exercised with a NONZERO rate, not just replayed symbolically
      Tables.documents(s, dir)
        .select(col("source"),
          when(pmod(col("doc_id"), lit(10)) === 7,
            concat(col("text"), lit(" zzoov")))
            .otherwise(col("text")).as("text"))
        .select(col("source"),
          explode(TextFunctions.tokens(col("text"))).as("word"))
        .join(broadcast(vocab), Seq("word"), "left_outer")
        .groupBy("source")
        .agg(count(lit(1)).as("n_ws"),
          sum(coalesce(col("n_syms"), length(col("word")) + 1)
            .cast("long")).as("n_bpe"),
          sum(when(col("n_syms").isNull, 1L).otherwise(0L)).as("n_oov"),
          round(sum(coalesce(col("n_syms"), length(col("word")) + 1)
            .cast("long")).cast("double") / count(lit(1)), 6)
            .as("fertility"),
          round(sum(when(col("n_syms").isNull, 1L).otherwise(0L))
            .cast("double") / count(lit(1)), 6).as("oov_rate"))
        .orderBy("source")
    }),

    // ---- North-star: BLOOM-gated exact-dedup ingest admission ----------
    // q89's incremental-ingest shape for EXACT dedup, with the standing
    // corpus compiled into a persisted Bloom filter (cachedBuild — the
    // q92/q97 build-once artifact pattern): shard keys probe the stored
    // filter inside the scan's codegen span, never-seen rows are admitted
    // outright (no false negatives), and only might-contain candidates
    // (true dups + ~0.9% FPs at 10 bits/key) reach the raw-text verify —
    // candidates broadcast into a corpus semi-join, the surviving key set
    // broadcasts back into the shard anti-join, so the corpus never
    // shuffles and the per-ingest join input is |dups| + fp·|new| instead
    // of |shard|. Shard = exact copies of the %10=5 slice (must ALL be
    // dropped), near-miss variants of %10=3 (one appended token — hash
    // differs, must ALL be admitted), and the genuinely-new %10=7 slice.
    // Oracle = plain NOT IN on raw text: bloom FPs are verified away, so
    // the admission is EXACT, not approximate --------------------------
    "q101_bloom_ingest" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val corpus = docs.filter(col("doc_id") % 10 =!= 7)
      val shard = docs.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
        .unionAll(docs.filter(col("doc_id") % 10 === 3)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            concat(col("text"), lit(" zznew")).as("text")))
        .unionAll(docs.filter(col("doc_id") % 10 === 7)
          .select((col("doc_id") + 7000000L).as("doc_id"), col("text")))
      val bloomPath = cachedBuild(dir, "documents.parquet",
          "target/q101_bloom2", params = "bloom:nfc") { p => // v2: artifact now pins nfc
        operators.Dedup.buildExactBloom(corpus, "text", p)
      }
      operators.Dedup.bloomAdmit(corpus, shard, "text", bloomPath)
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("blen"))
        .orderBy("doc_id")
    }),

    // ---- North-star: corpus SNAPSHOT DIFF (dataset versioning) ---------
    // The reconciliation pass every managed 100 TB corpus runs between
    // snapshots: v2 vs v1 classified per doc as added / removed /
    // modified / unchanged. Scale shape: both sides reduce to
    // (doc_id, xxhash64(text)) AT THE SCAN — 16-byte rows through one
    // co-partitioned full-outer hash join, the corpus text never
    // shuffles; at 10^9 docs that is a ~16 GB shuffle instead of the
    // corpus. Content equality via 64-bit hash (the standard diff trade:
    // same-id collision odds ~n·2⁻⁶⁴); the oracle compares raw text, so
    // a green row also witnesses no collision in the fixture. v2 drops
    // the %10=4 slice (removed), edits the %10=5 texts (modified), and
    // gains the %10=7 slice v1 excludes (added) ------------------------
    "q104_snapshot_diff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val v1 = docs.filter(col("doc_id") % 10 =!= 7)
      val v2 = docs.filter(col("doc_id") % 10 =!= 4)
        .select(col("doc_id"),
          when(col("doc_id") % 10 === 5,
            concat(col("text"), lit(" v2edit")))
            .otherwise(col("text")).as("text"))
      v1.select(col("doc_id"), xxhash64(col("text")).as("h1"))
        .join(v2.select(col("doc_id"), xxhash64(col("text")).as("h2")),
          Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("h1").isNull, "added")
            .when(col("h2").isNull, "removed")
            .when(col("h1") =!= col("h2"), "modified")
            .otherwise("unchanged").as("status"))
        .orderBy("doc_id")
    }),

    // ---- North-star: APPLY CHANGESET (diff → next snapshot) ------------
    // The write side of q104's versioning story: given the standing
    // corpus v1 and a changeset (upserts carrying payload text, deletes
    // carrying only ids — the CDC/Delta-MERGE shape), produce v2. Scale
    // shape: the changeset is the ingest increment and BROADCASTS; v1
    // streams through one broadcast anti-join (drop every changed id)
    // plus a union of the upsert payloads — the corpus never shuffles
    // and is scanned exactly once. The oracle constructs v2 DIRECTLY
    // from the fixture definition, so a hash-green row proves
    // apply(v1, diff) == snapshot(v2) byte-for-byte (fingerprints) -----
    "q106_apply_changeset" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val v1 = docs.filter(col("doc_id") % 10 =!= 7)
      val changes = docs.filter(col("doc_id") % 10 === 7)
        .select(col("doc_id"), col("text"), lit("upsert").as("action"))
        .unionAll(docs.filter(col("doc_id") % 10 === 5)
          .select(col("doc_id"),
            concat(col("text"), lit(" v2edit")).as("text"),
            lit("upsert").as("action")))
        .unionAll(docs.filter(col("doc_id") % 10 === 4)
          .select(col("doc_id"), lit(null).cast("string").as("text"),
            lit("delete").as("action")))
      val next = v1
        .join(broadcast(changes.select("doc_id")), Seq("doc_id"),
          "left_anti")
        .unionByName(changes.filter(col("action") === "upsert")
          .select("doc_id", "text"))
      next.select(col("doc_id"),
          TextFunctions.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // E16-E18 chained: ALS factors → K-Means → largest-cluster attribute
    // tokens (the als:110-146 genre chain, fully relational).
    "q35_ml_cluster_tokens" -> ((s, dir) => {
      val ratings = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").cast("int").as("user"),
          col("l_partkey").cast("int").as("item"))
        .agg(avg("l_quantity").as("rating"))
      val model = ml.Recommender.als(rank = 8, maxIter = 5).fit(ratings)
      val clusters = ml.Recommender.clusterUserFactors(model, k = 5)
      ml.Recommender.topAttributeTokens(clusters, ratings,
        Tables.part(s, dir).withColumnRenamed("p_partkey", "item"),
        "item", "p_name", " ", minRatings = 2, topItems = 10, topTokens = 10)
    }),

    // ---- RECORD LINKAGE: edit-distance similarity join ------------------
    // Entity resolution: a dirty catalog (deterministically corrupted
    // part labels — delete / substitute / two-edit, keyed by partkey)
    // matched against the canonical catalog at levenshtein <= 2. The
    // operator never forms the probe x catalog product: candidates come
    // from an equi-join on PassJoin segment-hash keys (recall-exact by
    // pigeonhole — Linkage.editDistanceJoin scaladoc carries the proof)
    // and only survivors pay the banded O(k·len) verify. The oracle IS
    // the quadratic join (length-filtered brute levenshtein in DuckDB),
    // so a hash-green row proves the blocking lost no pair.
    "q137_editdist_linkage" -> ((s, dir) => {
      val cat = Tables.part(s, dir).select(
        col("p_partkey").as("cat_id"),
        concat(col("p_brand"), lit(" "), col("p_name"), lit(" #"),
          col("p_partkey").cast("string")).as("s"))
      val lab = cat.select(col("cat_id").as("dirty_id"), col("s"),
        (col("cat_id") % (length(col("s")) - 6) + 2).cast("int").as("p"))
      val dirty = lab.select(col("dirty_id"),
        expr("""CASE dirty_id % 4
          WHEN 0 THEN s
          WHEN 1 THEN concat(substring(s, 1, p-1), substring(s, p+1))
          WHEN 2 THEN concat(substring(s, 1, p-1), 'x', substring(s, p+1))
          ELSE concat(substring(s, 1, p-1), 'x', substring(s, p+1, 1),
                      substring(s, p+3))
          END""").as("d"))
      Linkage.editDistanceJoin(dirty, "dirty_id", "d", cat, "cat_id", "s",
          k = 2)
        .select(col("dirty_id"), col("cat_id"),
          col("dist").cast("long").as("dist"))
        .orderBy("dirty_id", "cat_id")
    }),

    // ---- LINK-GRAPH CENTRALITY: fixed-point PageRank --------------------
    // The web-curation centrality signal as iterative graph analytics
    // over the order graph: customer -> supplier edges from fulfilled
    // lines, supplier -> customer back-edges from returns. Ranks are
    // integer fixed-point (parts-per-10^12, Graph.RankScale) so all ten
    // synchronous iterations — damping, per-edge split, uniform dangling
    // redistribution — replay bit-for-bit in the oracle's generated
    // 10-stage CTE chain. Per-iteration cost is one node-keyed join +
    // one map-side-combined sum; lineage is localCheckpoint-pinned per
    // round (the componentIds discipline).
    "q138_pagerank_centrality" -> ((s, dir) => {
      val ol = Tables.orders(s, dir).join(Tables.lineitem(s, dir),
        col("o_orderkey") === col("l_orderkey"))
      val fwd = ol.select(col("o_custkey").as("src"),
        (col("l_suppkey") + lit(10000000L)).as("dst"))
      val ret = ol.filter(col("l_returnflag") === "R")
        .select((col("l_suppkey") + lit(10000000L)).as("src"),
          col("o_custkey").as("dst"))
      Graph.pageRankFixedPoint(fwd.unionByName(ret), "src", "dst",
          iters = 10)
        .select(col("node"),
          when(col("node") >= 10000000L, lit("supplier"))
            .otherwise(lit("customer")).as("kind"),
          col("rank_ppt"))
        .orderBy(col("rank_ppt").desc, col("node"))
        .limit(25)
    }),

    // ---- EXACT-recall Jaccard similarity join ----------------------------
    // q22/q80's LSH blocking misses a boundary pair with probability
    // ~4e-8; when recall must be PROVABLE (legal dedup, decontamination
    // audits) the prefix-filter join loses no pair by theorem
    // (Dedup.exactJaccardJoin scaladoc carries the proof). The oracle IS
    // the quadratic shingle-set join, so hash-green proves exact recall
    // AND precision at this threshold.
    // body in preSortBodies (checkpoint-before-sort, r20; plan audited
    // as q139_exact_jaccard_join#pre)
    "q139_exact_jaccard_join" ->
      checkpointedSort("q139_exact_jaccard_join", "id_a", "id_b"),

    // ---- GRAPH K-CORE: dense-subgraph curation signal --------------------
    // Connected components chain weak links; the k-core keeps only nodes
    // with >= k surviving neighbors — the dense-cluster (template-farm /
    // hub) signal. Bounded synchronous peels over the order graph, pure
    // integer set arithmetic, so the oracle replays the same 4 rounds as
    // a generated CTE chain bit-for-bit (per-round cascade semantics are
    // spec-proven on engineered graphs; convergence at this fixture is
    // asserted in GraphSpec).
    "q140_graph_kcore" -> ((s, dir) => {
      val ol = Tables.orders(s, dir).join(Tables.lineitem(s, dir),
        col("o_orderkey") === col("l_orderkey"))
      val edges = ol.select(col("o_custkey").as("src"),
        (col("l_suppkey") + lit(10000000L)).as("dst"))
      val core = Graph.kCore(edges, "src", "dst", k = 30, rounds = 4)
      // membership REPORT, not just the survivors: every node with its
      // in-core flag and core degree (-1 outside) — the shape a curation
      // pipeline consumes (which hosts sit in the dense cluster), and
      // non-empty at any fixture scale even when the core itself is
      // empty (sf0.001's thin graph at k=30)
      val spine = edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node")))
        .filter(col("node").isNotNull).dropDuplicates("node")
      spine.join(core, Seq("node"), "left_outer")
        .select(col("node"),
          when(col("node") >= 10000000L, lit("supplier"))
            .otherwise(lit("customer")).as("kind"),
          col("degree").isNotNull.as("in_core"),
          coalesce(col("degree"), lit(-1L)).as("core_degree"))
        .orderBy("node")
    }),

    // ---- TRIANGLE COUNTS / CLUSTERING COEFFICIENT ------------------------
    // The ring-vs-star signal over the NEAR-DUP SIMILARITY GRAPH: a
    // template farm's documents interlink pairwise (high clustering), a
    // hub that merely quotes many sources doesn't — components and
    // k-core can't tell them apart. Edges are q139's exact-recall
    // Jaccard >= 0.7 pairs, whose density tracks TRUE near-dup density
    // (linear at any corpus scale), so the exact triangle count is
    // scale-sane. The first cut of this query counted triangles on the
    // order co-occurrence graph instead — at sf0.1 that graph is a
    // near-complete K_1000 (343k of 499k possible supplier pairs pass
    // the >= 2-order threshold: 1000 suppliers x 600k lineitems saturate
    // EVERY co-occurrence relation), ~54M triangles per copy, OOM at
    // x10 — dense-substrate triangle counting is Θ(m^1.5) for ANY exact
    // algorithm; the fix is the substrate, not the operator.
    // Degree-orientation algorithm: per-key wedge fanout bounded by the
    // oriented out-degree (O(sqrt m)); hot hubs generate ZERO wedges.
    "q141_triangle_clustering" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val tri = Graph.triangleCounts(similarityGraphEdges(s, dir),
          "src", "dst")
        .withColumnRenamed("node", "doc_id")
      // per-document report over the WHOLE corpus (isolated docs score
      // 0/0/0.0) — the shape a curation filter consumes, and non-empty
      // at any fixture scale even when the similarity graph is thin
      docs.select(col("doc_id"))
        .join(tri, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("degree"), lit(0L)).as("degree"),
          coalesce(col("triangles"), lit(0L)).as("triangles"),
          when(coalesce(col("degree"), lit(0L)) >= 2,
            (coalesce(col("triangles"), lit(0L)) * 2).cast("double") /
              (col("degree") * (col("degree") - 1)).cast("double"))
            .otherwise(lit(0.0)).as("clustering"))
        .orderBy("doc_id")
    }),

    // ---- PER-DOMAIN CAP: C4/CCNet-style host capping ----------------------
    // Keep at most `domainCap` docs per source (a crawl pipeline caps
    // documents per registered domain so mega-hosts can't dominate the
    // mixture). Selection is an exact deterministic bottom-k on the
    // shared FNV stream (pure function of (doc_id, seed) — partition-
    // independent, re-run-stable). Scale shape: the keep set comes from
    // the bounded-heap TopKByScore partial aggregate — each input
    // partition contributes <= cap entries per source to the shuffle, so
    // a billion-doc host costs the same exchange bytes as a ten-doc one
    // (a row_number window would sort the WHOLE hot domain through one
    // reducer); the |sources|·cap keep set then broadcasts back as a
    // left-semi-shaped flag join. No corpus-sized exchange anywhere.
    "q142_domain_cap" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val scored = docs.select(col("doc_id"), col("source"),
        Relational.fnvBucket(col("doc_id"), 57L).as("b"))
      // bottom-k on (b, doc_id) == top-k on (-b DESC, doc_id ASC): the
      // heap's (score DESC, id ASC) order matches the keep rule exactly
      val kept = scored.groupBy("source")
        .agg(graft.functions.AggFunctions.topKByScore(
          negate(col("b").cast("double")), col("doc_id"), domainCap)
          .as("ks"))
        .select(explode(col("ks")).as("e"))
        .select(col("e.n_id").as("doc_id"), lit(true).as("kept"))
      scored.join(broadcast(kept), Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("source"), col("b").as("priority"),
          coalesce(col("kept"), lit(false)).as("kept"))
        .orderBy("doc_id")
    }),

    // ---- PMI COLLOCATIONS: corpus-level phrase mining ---------------------
    // Pointwise mutual information over adjacent token pairs — the
    // collocation/phrase-detection primitive (word2vec-phrases, boilerplate
    // phrase discovery). Scale shape: one bigram agg and one unigram agg,
    // both map-side-combined (shuffle rows = distinct grams, not corpus
    // tokens); the min-count filter lands ON the combined bigram agg
    // before any join, so only frequent bigrams reach the two vocab-keyed
    // hash joins; corpus totals are a broadcast 1-row frame; final top-50
    // is a TakeOrdered, never a global sort. PMI doubles are computed in
    // one fixed left-assoc expression and rounded to 6 dp so the oracle
    // replays them bit-for-bit.
    "q143_pmi_collocations" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val withToks = docs.select(col("doc_id"),
        TextFunctions.tokens(col("text")).as("t"))
      val toks = withToks.select(explode(col("t")).as("tok"))
      val uni = toks.groupBy("tok").agg(count(lit(1)).as("c1"))
      val bg = withToks.filter(size(col("t")) >= 2)
        .select(explode(arrays_zip(
            slice(col("t"), lit(1), size(col("t")) - 1).as("v"),
            slice(col("t"), lit(2), size(col("t")) - 1).as("w"))).as("p"))
        .select(col("p.v").as("v"), col("p.w").as("w"))
      val cb = bg.groupBy("v", "w").agg(count(lit(1)).as("cvw"))
        .filter(col("cvw") >= pmiMinCount)
      val stats = toks.agg(count(lit(1)).as("n_tok"))
        .crossJoin(bg.agg(count(lit(1)).as("n_bg")))
      cb.join(uni.select(col("tok").as("v"), col("c1").as("cv")), Seq("v"))
        .join(uni.select(col("tok").as("w"), col("c1").as("cw")), Seq("w"))
        .crossJoin(broadcast(stats))
        .select(col("v"), col("w"), col("cvw"),
          round(log(col("cvw").cast("double") * col("n_tok") / col("cv")
            / col("cw") * col("n_tok") / col("n_bg")), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("v"), col("w"))
        .limit(50)
    }),

    // ---- LABEL-PROPAGATION COMMUNITIES ------------------------------------
    // The fourth graph signal: components say "connected", k-core says
    // "dense enough", triangles say "interlinked" — LPA says WHICH dense
    // region claims each node (mirror-site / template-farm clusters).
    // Substrate: the q139/q141 near-dup similarity graph — the one
    // fixture graph with REAL cluster structure (the order co-occurrence
    // graph, tried first, is one dense blob at every threshold: LPA
    // correctly collapses it to a single community, a vacuous report).
    // 4 synchronous rounds, self-vote damping, (count DESC, label ASC)
    // tie-break — fully integer, so the oracle replays the identical
    // recurrence as a generated CTE chain. Report over the full document
    // spine: docs outside the graph are their own singleton community.
    "q144_label_propagation" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val comm = Graph.labelPropagation(similarityGraphEdges(s, dir),
        "src", "dst", rounds = lpaRounds)
      val full = docs.select(col("doc_id"))
        .join(comm.withColumnRenamed("node", "doc_id"),
          Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("community"), col("doc_id")).as("community"))
      val sizes = full.groupBy("community").agg(count(lit(1)).as("csize"))
      full.join(sizes, Seq("community"))
        .select(col("doc_id"), col("community"), col("csize"),
          (col("csize") > 1).as("in_cluster"))
        .orderBy("doc_id")
    }),
  )

  /** q144's synchronous LPA round count — single source for the engine
    * call and the oracle's generated CTE chain.
    */
  private val lpaRounds = 4

  /** The similarity-graph family's ONE Jaccard threshold and shingle
    * width — the single source for the engine join (q139, the persisted
    * simgraph artifact), the artifact's cache signature, and every
    * DuckDB oracle CTE that re-derives the graph (q141/q144/q150/q152,
    * q139's own oracle). `final val` without a type ascription is a
    * compile-time constant, so textual val-initialization order in this
    * object cannot observe it uninitialized. Changing either value
    * self-invalidates the persisted edges via the cachedBuild params
    * signature AND retunes all oracles in the same commit — the
    * round-13 staleness hazard closed by construction.
    */
  private final val simGraphThreshold = 0.7
  private final val simGraphShingleWidth = 3

  /** The q139 exact-Jaccard ≥ 0.7 similarity graph as a PERSISTED
    * artifact: built once per corpus (cachedBuild — cross-process
    * lock-protected, fixture-signature invalidated, the q92/q110 index
    * pattern) and read by every graph-analytics consumer (q141
    * triangles, q144 communities, q150 modularity). The 100 TB contract:
    * the similarity join is the corpus-scale kernel and runs once per
    * snapshot; graph analytics then query an edge list sized by TRUE
    * near-dup density. q139 itself stays the direct operator — it IS
    * the gate on the join's exactness.
    */
  private def similarityGraphEdges(s: SparkSession, dir: String): DataFrame = {
    val path = cachedBuild(dir, "documents.parquet", "target/simgraph",
        params = s"jaccard=$simGraphThreshold:w=$simGraphShingleWidth") {
      p =>
        Dedup.exactJaccardJoin(Tables.documents(s, dir), "doc_id", "text",
            threshold = simGraphThreshold,
            shingleWidth = simGraphShingleWidth)
          .select(col("id_a").as("src"), col("id_b").as("dst"))
          .write.mode("overwrite").parquet(s"$p/edges.parquet")
    }
    s.read.parquet(s"$path/edges.parquet")
  }


  /** The q154/q155 maintained-index artifact: SimGraphIndex built on 90 %
    * of the corpus then extended by two disjoint appends — one
    * construction per fixture (cachedBuild), parameters in the cache
    * signature.
    */
  private def simGraphIndexArtifact(s: SparkSession, dir: String): String = {
    val docs = Tables.documents(s, dir)
    cachedBuild(dir, "documents.parquet", "target/q154_simgraph_idx",
        params = s"simidx.v3:jaccard=$simGraphThreshold" +
          s":w=$simGraphShingleWidth:split=m10e6x2") { p =>
      operators.SimGraphIndex.build(docs.filter(col("doc_id") % 10 =!= 6),
        "doc_id", "text", p, simGraphThreshold, simGraphShingleWidth)
      operators.SimGraphIndex.append(
        docs.filter(col("doc_id") % 20 === 6), "doc_id", "text", p)
      operators.SimGraphIndex.append(
        docs.filter(col("doc_id") % 20 === 16), "doc_id", "text", p)
    }
  }

  /** Event-analytics additions (funnel + cohort retention) — appended
    * outside the literal Map to keep the single Map.apply call under
    * scalac's method-size comfort zone.
    */
  private def analyticsExtraQueries
      : Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- ORDERED FUNNEL: view -> click -> purchase ------------------------
    // The product-analytics conversion primitive: users whose first view
    // precedes a click that precedes a purchase, each step STRICTLY after
    // the previous step's first qualifying instant. Scale shape: each
    // step is one map-side-combined min() per user over a type-pruned
    // scan (the event_type filter pushes into parquet), chained through
    // user-keyed joins of user-sized frames — no windows, no per-user
    // event sorting; the three step counts are 1-row frames crossed into
    // the 3-row report. Conversion is exact integer ppm.
    "q145_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("tus"))
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("tus").as("t1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, Seq("user_id")).filter(col("tus") > col("t1"))
        .groupBy("user_id").agg(min("tus").as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, Seq("user_id")).filter(col("tus") > col("t2"))
        .groupBy("user_id").agg(min("tus").as("t3"))
      val counts = t1.agg(count(lit(1)).as("u1"))
        .crossJoin(t2.agg(count(lit(1)).as("u2")))
        .crossJoin(t3.agg(count(lit(1)).as("u3")))
      counts.select(explode(array(
          struct(lit(1L).as("step"), lit("view").as("stage"),
            col("u1").as("users"), lit(1000000L).as("conv_ppm")),
          struct(lit(2L).as("step"), lit("click_after_view").as("stage"),
            col("u2").as("users"),
            when(col("u1") > 0, expr("u2 * 1000000 div u1"))
              .otherwise(lit(0L)).as("conv_ppm")),
          struct(lit(3L).as("step"), lit("purchase_after_click").as("stage"),
            col("u3").as("users"),
            when(col("u2") > 0, expr("u3 * 1000000 div u2"))
              .otherwise(lit(0L)).as("conv_ppm")))).as("r"))
        .select(col("r.step").as("step"), col("r.stage").as("stage"),
          col("r.users").as("users"), col("r.conv_ppm").as("conv_ppm"))
        .orderBy("step")
    }),

    // ---- COHORT RETENTION MATRIX ------------------------------------------
    // Week-of-first-event cohorts x week offset -> distinct active users,
    // with exact ppm retention against the cohort size. Weeks are pure
    // integer arithmetic on microsecond epochs (no calendar/timezone
    // semantics to drift between engines). Scale shape: the first-seen
    // frame is one map-side-combined min per user; the activity matrix is
    // a (cohort, offset)-keyed countDistinct (Spark's two-level internal
    // expansion); cohort sizes are a cohort-count-sized broadcast.
    // wk = floor(micros / week): the pmod-subtract form floors for ANY
    // sign (Spark `div` truncates toward zero; DuckDB `//` floors — a
    // pre-epoch event would silently diverge the engines otherwise)
    "q146_cohort_retention" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        expr("(unix_micros(ts) - pmod(unix_micros(ts), 604800000000)) " +
          "div 604800000000").as("wk"))
      val first = ev.groupBy("user_id").agg(min("wk").as("cohort_wk"))
      val sizes = first.groupBy("cohort_wk")
        .agg(count(lit(1)).as("cohort_users"))
      ev.join(first, Seq("user_id"))
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk"))
          .as("week_offset"))
        .agg(countDistinct("user_id").as("active_users"))
        .join(broadcast(sizes), Seq("cohort_wk"))
        .select(col("cohort_wk"), col("week_offset"), col("active_users"),
          col("cohort_users"),
          expr("active_users * 1000000 div cohort_users")
            .as("retention_ppm"))
        .orderBy("cohort_wk", "week_offset")
    }),

    // ---- CUBE / GROUPING(id) ----------------------------------------------
    // The last multi-dim aggregate shape (rollup q41 / pivot q50 landed
    // earlier): all four (status, priority) grouping combinations in ONE
    // pass — Spark expands the cube BEFORE the partial aggregate, so the
    // shuffle carries (groups x 4) combined rows, not the fact table four
    // times. Grouping indicators emitted as separate per-column flags
    // (bit-order-free, engine-independent); rolled-up dims surface as
    // 'ALL' (status domain is F/O/P — no collision).
    "q147_cube_grouping" -> ((s, dir) =>
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping(col("o_orderstatus")).cast("long").as("g_status"),
          grouping(col("o_orderpriority")).cast("long").as("g_priority"),
          count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(28, 4))).cast("double")
            .as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("g_status"), col("g_priority"), col("n"), col("total"))
        .orderBy("g_status", "g_priority", "status", "priority")),

    // ---- RECENCY-DECAYED ACTIVITY -------------------------------------------
    // Half-life-weighted per-type activity: each event contributes
    // 0.5^(weeks before the corpus's newest week) — the freshness signal
    // a mixing pipeline feeds into source weights (stale domains decay,
    // active ones dominate). Deterministic across engines because
    // 0.5^k is a power of two (exact in IEEE double for any k here) and
    // the per-event terms DECIMAL-sum order-independently. Scale shape:
    // one integer-week projection, a broadcast 1-row max, one map-side-
    // combined agg — no windows, no corpus-sized exchange.
    // wk: same pre-epoch-safe floor-div as q146
    "q148_decayed_activity" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"),
        expr("(unix_micros(ts) - pmod(unix_micros(ts), 604800000000)) " +
          "div 604800000000").as("wk"))
      val latest = ev.agg(max("wk").as("max_wk"))
      ev.crossJoin(broadcast(latest))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          max("wk").as("latest_wk"),
          sum(round(pow(lit(0.5), col("max_wk") - col("wk")), 6)
              .cast(DecimalType(18, 6))).cast("double")
            .as("decayed_score"))
        .orderBy("event_type")
    }),

    // ---- CONTAINMENT JOIN: quote / subsumption detection -------------------
    // The asymmetric near-dup relation Jaccard misses: a short doc quoted
    // inside a much longer one scores near-zero Jaccard (the union is
    // dominated by the container) but containment ~1. Exact recall via
    // probe-side-only prefix filtering (the index side must stay full —
    // containment puts no ceiling on the container's extra content).
    "q149_containment_join" -> ((s, dir) =>
      Dedup.exactContainmentJoin(Tables.documents(s, dir), "doc_id", "text",
          threshold = 0.8)
        .orderBy("id_a", "id_b")),

    // ---- MODULARITY of the LPA partition ------------------------------------
    // The quality metric for q144's communities (Newman Q): per community,
    // internal-edge fraction minus the degree-squared null expectation —
    // the number that says whether the partition found real structure or
    // noise (the order-graph experiment that moved this family onto the
    // similarity graph was decided BY this metric: one community, Q = 0).
    // All counts integer off the SAME symmetrized frame the LPA rounds
    // walk (Graph.undirected — 2 directed rows per undirected edge), one
    // edge-sized community-tag join pinned for its two consumers; the Q
    // terms are one fixed double chain rounded to 6 dp. Graph communities
    // only (singleton spine docs have no edges — zero Q contribution by
    // convention).
    "q150_modularity" -> ((s, dir) => {
      // the persisted edge artifact IS the pin — both consumers (the LPA
      // and the modularity tally) scan the same tiny parquet
      val raw = similarityGraphEdges(s, dir)
      val comm = Graph.labelPropagation(raw, "src", "dst",
        rounds = lpaRounds)
      val und = Graph.undirected(raw, "src", "dst")
      val j = und
        .join(comm.select(col("node").as("src"),
          col("community").as("c_src")), Seq("src"))
        .join(comm.select(col("node").as("dst"),
          col("community").as("c_dst")), Seq("dst"))
        .select("c_src", "c_dst")
        .localCheckpoint() // two consumers (degree sums, internal counts)
      val m2f = j.agg(count(lit(1)).as("m2"))
      val dsum = j.groupBy(col("c_src").as("community"))
        .agg(count(lit(1)).as("d2"))
      val inner = j.filter(col("c_src") === col("c_dst"))
        .groupBy(col("c_src").as("community")).agg(count(lit(1)).as("x2"))
      val sz = comm.groupBy("community").agg(count(lit(1)).as("csize"))
      sz.join(dsum, Seq("community"))
        .join(inner, Seq("community"), "left_outer")
        .crossJoin(broadcast(m2f))
        .select(col("community"), col("csize"),
          expr("coalesce(x2, 0) div 2").as("internal_edges"),
          col("d2").as("degree_sum"),
          round(coalesce(col("x2"), lit(0L)).cast("double") / col("m2")
            - (col("d2").cast("double") / col("m2"))
              * (col("d2").cast("double") / col("m2")), 6).as("q_term"))
        .orderBy("community")
    }),

    // ---- DUP-CLUSTER REPORT over the persisted similarity graph -------------
    // What a data team actually publishes from the graph artifact: one
    // row per near-dup CLUSTER (connected component of the q139 edges) —
    // size, canonical id (the component label IS the min id by the
    // pointer-jumping convergence), total bytes, and how many sources it
    // spans (a cluster crossing many sources is syndication; one source
    // is a template). Pointer-jumping components over the tiny edge
    // artifact; the per-cluster aggregate map-side combines.
    "q152_dup_cluster_report" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = similarityGraphEdges(s, dir)
        .select(col("src").as("id_a"), col("dst").as("id_b"))
      val comp = Dedup.componentIds(docs.select("doc_id"), "doc_id", pairs)
        .select(col("id").as("doc_id"), col("comp").as("cluster"))
      docs.select(col("doc_id"), col("source"),
          octet_length(col("text")).cast("long").as("blen"))
        .join(comp, Seq("doc_id"))
        .groupBy("cluster")
        .agg(count(lit(1)).as("csize"),
          sum("blen").as("total_octets"),
          countDistinct("source").as("n_sources"))
        .filter(col("csize") >= 2)
        .orderBy("cluster")
    }),

    // ---- INCREMENTAL SIMILARITY-GRAPH MAINTENANCE -------------------------
    // The nightly-crawl path the per-snapshot simgraph cache cannot take:
    // build the SimGraphIndex on 90 % of the corpus, then APPEND the
    // remaining docs as two disjoint shards — each append probes shard
    // prefixes against the persisted full postings (recall by the
    // probe-prefix/index-full theorem, SimGraphIndex scaladoc) instead of
    // re-running the corpus-wide join. The emitted edge set must equal
    // q139's direct full-corpus join EXACTLY — same quadratic DuckDB
    // oracle, so hash-green proves the maintenance path loses and invents
    // nothing across build + 2 appends.
    "q154_simgraph_incremental" -> ((s, dir) => {
      val idx = simGraphIndexArtifact(s, dir)
      operators.SimGraphIndex.edges(s, idx).orderBy("id_a", "id_b")
    }),

    // Downstream analytics over the MAINTAINED artifact: component-size
    // histogram from the incrementally-extended edge set (vs q119's
    // direct-operator derivation at its own threshold). Green means graph
    // consumers can read the maintained index mid-lifecycle and see
    // exactly the full-rebuild graph.
    "q155_simgraph_incr_components" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // same artifact as q154 (cachedBuild dedupes the construction)
      val idx = simGraphIndexArtifact(s, dir)
      val pairs = operators.SimGraphIndex.edges(s, idx)
        .select("id_a", "id_b")
      Dedup.componentIds(docs.select("doc_id"), "doc_id", pairs)
        .groupBy("comp").agg(count(lit(1)).as("csize"))
        .groupBy("csize").agg(count(lit(1)).as("n_clusters"),
          (col("csize") * count(lit(1))).as("n_docs"))
        .orderBy("csize")
    }),

    // Takedown over the maintained graph: tombstone-delete a doc subset,
    // read the LIVE edge set. Oracle re-derives the full graph on the
    // surviving docs from scratch — hash-green proves delete removes
    // exactly the dead docs' incident edges and nothing else. (Physical
    // drop + re-append-after-compact are spec'd in SimGraphIndexSpec —
    // compaction output is layout, not query-observable.)
    "q157_simgraph_delete" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val idx = cachedBuild(dir, "documents.parquet",
          "target/q157_simgraph_del",
          params = s"simidx.v3:jaccard=$simGraphThreshold" +
            s":w=$simGraphShingleWidth:split=m10e6:del=m7e2") { p =>
        operators.SimGraphIndex.build(docs.filter(col("doc_id") % 10 =!= 6),
          "doc_id", "text", p, simGraphThreshold, simGraphShingleWidth)
        operators.SimGraphIndex.append(
          docs.filter(col("doc_id") % 10 === 6), "doc_id", "text", p)
        operators.SimGraphIndex.delete(
          docs.filter(col("doc_id") % 7 === 2).select("doc_id"),
          "doc_id", p)
      }
      operators.SimGraphIndex.edges(s, idx).orderBy("id_a", "id_b")
    }),

    // ---- SIMILARITY-GRAPH SNAPSHOT DIFF (release audit) ------------------
    // q104 diffs the DOCUMENTS between corpus versions; this diffs the
    // NEAR-DUP STRUCTURE — which edges a release added, removed, or kept
    // (a sudden burst of added edges = a syndication/boilerplate leak
    // that per-doc diffs cannot see). Same v1/v2 snapshot pair as
    // q104/q109. Derivation is Dedup.snapshotEdgeDiff (round-18 verdict
    // #6): the shared UNCHANGED core's edges are computed once and are
    // `kept` by construction (identical texts ⇒ identical jaccard), and
    // only edges incident to a CHANGED doc run per snapshot — a
    // single-sided prefix-blocked delta join sized |changed|×candidates,
    // never core². At a realistic release delta (~5 % churn) that
    // removes ~90 % of the naive two-full-joins pair work; the oracle is
    // STILL the two from-scratch derivations replayed in DuckDB —
    // hash-green proves the decomposition loses and invents nothing. The
    // PRODUCTION cadence maintains one SimGraphIndex per snapshot via
    // appendBatch/delete deltas and diffs the edge artifacts (q162).
    // body in preSortBodies (checkpoint-before-sort, r20; plan audited
    // as q161_simgraph_snapshot_diff#pre)
    "q161_simgraph_snapshot_diff" ->
      checkpointedSort("q161_simgraph_snapshot_diff", "id_a", "id_b"),

    // ---- The PRODUCTION cadence of q161: index-vs-index delta diff -------
    // q161 re-derives both snapshots from scratch (2× the quadratic q139
    // kernel — the release-audit gate); this is the nightly path it
    // documents: ONE maintained SimGraphIndex carried v1 → v2 by deltas
    // (tombstone the removed %10==4 docs and the %10==5 originals,
    // compact, land the %10==7 adds and the %10==5 edits as batch
    // generations), with v1's edge artifact exported before the
    // mutation. The gated diff is two edge-table reads + a full-outer
    // join — delta-sized, no corpus join at query time — and must
    // hash-match q161's from-scratch oracle EXACTLY: the maintained
    // artifact reproduces the full rebuild at both endpoints (round-15
    // verdict #3).
    "q162_simgraph_incr_diff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val v1 = docs.filter(col("doc_id") % 10 =!= 7)
      val idx = cachedBuild(dir, "documents.parquet",
          "target/q162_simgraph_incr",
          params = s"simidx.v3:jaccard=$simGraphThreshold" +
            s":w=$simGraphShingleWidth:incrdiff=v1tov2") { p =>
        operators.SimGraphIndex.build(v1, "doc_id", "text", p,
          simGraphThreshold, simGraphShingleWidth)
        // the release-audit export: v1's edges, snapshotted BEFORE the
        // delta lands (edge volume, not corpus volume)
        operators.SimGraphIndex.edges(s, p)
          .write.mode("overwrite").parquet(s"$p/edges_v1.parquet")
        operators.SimGraphIndex.delete(
          v1.filter(col("doc_id") % 10 === 4 || col("doc_id") % 10 === 5)
            .select("doc_id"), "doc_id", p)
        operators.SimGraphIndex.compact(s, p)
        operators.SimGraphIndex.appendBatch(
          docs.filter(col("doc_id") % 10 === 7), "doc_id", "text", p,
          batchId = 0L)
        operators.SimGraphIndex.appendBatch(
          docs.filter(col("doc_id") % 10 === 5)
            .select(col("doc_id"),
              concat(col("text"), lit(" v2edit")).as("text")),
          "doc_id", "text", p, batchId = 1L)
      }
      val e1 = s.read.parquet(s"$idx/edges_v1.parquet")
        .select(col("id_a"), col("id_b"), lit(1L).as("__in1"))
      val e2 = operators.SimGraphIndex.edges(s, idx)
        .select(col("id_a"), col("id_b"), lit(1L).as("__in2"))
      e1.join(e2, Seq("id_a", "id_b"), "full_outer")
        .select(col("id_a"), col("id_b"),
          when(col("__in1").isNull, "added")
            .when(col("__in2").isNull, "removed")
            .otherwise("kept").as("status"))
        .orderBy("id_a", "id_b")
    }),

    // ---- STREAM-maintained similarity graph, driver-oracle gated ---------
    // q154's artifact maintained by the REAL ingest stream (a
    // checkpointed file-source through selfDedupIngest, one writer
    // lifetime per staged shard — the q134 gap closed for the simgraph;
    // StreamingEtlSpec separately proves the kill-mid-batch replay).
    // The admission gate is pinned to its DETERMINISTIC configuration:
    // ingest threshold > 1 disables the LSH near-dup flag path (whose
    // recall is probabilistic — band collisions — and therefore not
    // oracle-expressible), leaving bloomAdmit's exact-verified text
    // anti-join + the within-batch keep-smallest-id collapse, both of
    // which the DuckDB oracle reproduces row-for-row: admitted = one rep
    // per novel text in (batch, doc_id) order, NULL texts admitted
    // outright (inert in the graph). Live edges must hash-match the
    // from-scratch exact join over corpus ∪ admitted — the streamed
    // artifact cannot silently drift (round-15 verdict #6).
    "q163_simgraph_stream_ingest" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val corpus = docs.filter(col("doc_id") % 3 === 0)
      val root = cachedBuild(dir, "documents.parquet",
          "target/q163_simgraph_stream",
          params = s"simidx.v3:jaccard=$simGraphThreshold" +
            s":w=$simGraphShingleWidth:stream=m3b2") { p =>
        import java.nio.file.{Files, Paths}
        operators.Dedup.buildExactBloom(corpus, "text", s"$p/bloom")
        operators.Dedup.writeLshBandIndex(corpus, "doc_id", "text",
          s"$p/lsh")
        operators.SimGraphIndex.build(corpus, "doc_id", "text",
          s"$p/graph", simGraphThreshold, simGraphShingleWidth)
        val stageDir = s"$p/stage"
        Files.createDirectories(Paths.get(stageDir))
        def stage(n: Int, shard: org.apache.spark.sql.DataFrame): Unit = {
          val tmp = Files.createTempDirectory("q163_stage")
          shard.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = Files.list(tmp)
            .filter(f => f.toString.endsWith(".parquet"))
            .findFirst().get()
          Files.move(part, Paths.get(stageDir, f"s$n%02d.parquet"))
        }
        def drain(): Unit = {
          val q = graft.streaming.IngestStream.selfDedupIngest(
            s.readStream.schema("doc_id LONG, text STRING")
              .option("maxFilesPerTrigger", "1").parquet(stageDir),
            corpus, "doc_id", "text", s"$p/bloom", s"$p/lsh",
            threshold = 1.5, s"$p/out", s"$p/ckpt",
            simGraphPath = Some(s"$p/graph"))
          q.processAllAvailable(); q.stop()
        }
        stage(0, docs.filter(col("doc_id") % 3 === 1))
        drain() // writer dies between shards — next drain resumes the ckpt
        stage(1, docs.filter(col("doc_id") % 3 === 2))
        drain()
      }
      operators.SimGraphIndex.edges(s, s"$root/graph")
        .orderBy("id_a", "id_b")
    }),

    // ---- STREAM-maintained DENSE channel, oracle gated -----------------
    // q92's persisted IVF index maintained by the REAL ingest stream
    // (r18 verdict #5): the corpus third of the embeddings seeds the
    // index, the other two thirds arrive as staged shards through
    // selfDedupIngest(denseIndexPath=...) — each micro-batch's
    // admissions land as their own overwrite-idempotent generation
    // (appendBatchToIvfIndex: exactly-once under foreachBatch replay)
    // with the recall certificate re-measured in the SAME per-batch
    // manifest swap. Admission is pinned deterministic exactly like
    // q163 (unique texts, threshold>1 disables the probabilistic LSH
    // flag path), so the maintained index must hold the FULL corpus —
    // and the exhaustive-probe query must hash-match the same exact
    // brute-force oracle as q52/q92: the streamed dense artifact cannot
    // silently drift. The serve asserts the cert the streaming side
    // published (floor + epoch freshness), the q164/q173 discipline at
    // stream cadence.
    "q179_ivf_stream_ingest" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val docs = emb.select(col("vec_id").as("doc_id"),
        concat(lit("doc "), col("vec_id")).as("text"),
        graft.functions.VectorFunctions.toDoubleArray(col("embedding"))
          .as("embedding"))
      val corpus = docs.filter(col("doc_id") % 3 === 0)
      val cert = Similarity.RecallCertSpec(k = 5, nProbe = 8)
      val root = cachedBuild(dir, "embeddings.parquet",
          "target/q179_ivf_stream",
          params = "ivfstream.v1:nlists=8:cert=k5p8:stream=m3b2") { p =>
        import java.nio.file.{Files, Paths}
        operators.Dedup.buildExactBloom(corpus, "text", s"$p/bloom")
        operators.Dedup.writeLshBandIndex(corpus, "doc_id", "text",
          s"$p/lsh")
        Similarity.buildIvfIndex(
          corpus.select(col("doc_id").as("vec_id"), col("embedding")),
          s"$p/ivf", nLists = 8, cert = Some(cert))
        val stageDir = s"$p/stage"
        Files.createDirectories(Paths.get(stageDir))
        def stage(n: Int, shard: org.apache.spark.sql.DataFrame): Unit = {
          val tmp = Files.createTempDirectory("q179_stage")
          shard.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = Files.list(tmp)
            .filter(f => f.toString.endsWith(".parquet"))
            .findFirst().get()
          Files.move(part, Paths.get(stageDir, f"s$n%02d.parquet"))
        }
        def drain(): Unit = {
          val q = graft.streaming.IngestStream.selfDedupIngest(
            s.readStream
              .schema("doc_id LONG, text STRING, embedding ARRAY<DOUBLE>")
              .option("maxFilesPerTrigger", "1").parquet(stageDir),
            corpus, "doc_id", "text", s"$p/bloom", s"$p/lsh",
            threshold = 1.5, s"$p/out", s"$p/ckpt",
            denseIndexPath = Some(s"$p/ivf"), denseCert = Some(cert))
          q.processAllAvailable(); q.stop()
        }
        stage(0, docs.filter(col("doc_id") % 3 === 1))
        drain() // writer dies between shards — next drain resumes the ckpt
        stage(1, docs.filter(col("doc_id") % 3 === 2))
        drain()
      }
      // the streaming side's own per-batch certificate gates the serve
      Similarity.requireCertifiedRecall(s, s"$root/ivf",
        k = 5, nProbe = 8, floor = 0.99)
      Similarity.ivfTopKFromIndex(s"$root/ivf",
          emb.filter(col("vec_id") < 5), k = 5, nProbe = 8)
        .orderBy("q_id", "rn")
    }),

    // ---- SUBSUMPTION DEDUP POLICY -------------------------------------------
    // The end-to-end composition over q149 (the dropNearDuplicates of
    // containment): drop every document >= 80 % contained in a STRICTLY
    // LARGER document (shingle-set size, id tiebreak) — keep the
    // container, drop the quote. The strict order makes the policy
    // coherent (mutual containment — near-identical docs — keeps the
    // larger/smaller-id one; no drop cycles). Report: per-source kept /
    // dropped counts. One anti-join against the small dropped-id set.
    "q151_subsumption_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.exactContainmentJoin(docs, "doc_id", "text",
        threshold = 0.8)
      val sizes = docs.select(col("doc_id"),
        size(graft.functions.TextFunctions.shingleHashSet(col("text"), 3))
          .cast("long").as("__sz"))
      val dropped = pairs
        .join(sizes.select(col("doc_id").as("id_a"), col("__sz").as("sa")),
          Seq("id_a"))
        .join(sizes.select(col("doc_id").as("id_b"), col("__sz").as("sb")),
          Seq("id_b"))
        .filter(col("sb") > col("sa") ||
          (col("sb") === col("sa") && col("id_b") < col("id_a")))
        .select(col("id_a").as("doc_id")).distinct()
      // no forced broadcast: the dropped-id set sizes with true quote
      // density — AQE broadcasts it when it is actually small
      docs.join(dropped.withColumn("__drop", lit(true)),
          Seq("doc_id"), "left_outer")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("__drop"), 1L).otherwise(0L)).as("n_dropped"),
          sum(when(col("__drop"), 0L).otherwise(1L)).as("n_kept"))
        .orderBy("source")
    }),
  )

  /** q142's per-source document cap — single source for the engine's
    * bounded-heap k and the oracle's row_number cut.
    */
  private val domainCap = 8

  /** q143's bigram min-count — applied on the map-side-combined bigram
    * aggregate, single-sourced into the oracle.
    */
  private val pmiMinCount = 5

  /** Exact brute-force cosine top-5 for queries vec_id < 5 — the shared
    * oracle for every ANN variant (q26 brute-force, q52 IVF-exhaustive,
    * q57 recall-sized LSH): approximate paths must reproduce it exactly.
    */
  /** Exact brute-force top-k oracle, with a corpus-side predicate so the
    * index-maintenance queries (q122's delete) can gate against a
    * recompute-from-scratch over the LIVE corpus only.
    */
  private def exactTopKOracle(corpusWhere: String): String =
    exactTopKOracleFull("q.vec_id < 5", corpusWhere)

  /** The brute-force oracle with BOTH sides parameterized — q160's kNN
    * self-join uses the full query spine.
    */
  private def exactTopKOracleFull(queryWhere: String,
                                  corpusWhere: String): String =
    s"""WITH e AS (
           SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         n AS (
           SELECT vec_id, v,
             sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, len(v)+1), i -> v[i] * v[i])),
               (acc, x) -> acc + x)) AS nrm
           FROM e),
         scored AS (
           SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, len(q.v)+1), i -> q.v[i] * c.v[i])),
               (acc, x) -> acc + x) / (q.nrm * c.nrm), 6) AS sim
           FROM n q, n c
           WHERE ($queryWhere) AND c.vec_id != q.vec_id AND ($corpusWhere))
         SELECT q_id, n_id, sim, rn FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                       ORDER BY sim DESC, n_id) AS rn
           FROM scored)
         WHERE rn <= 5 ORDER BY q_id, rn"""

  private val exactTopKSql: String = exactTopKOracle("TRUE")

  /** UTF-8 octet list of a VARCHAR SQL expression — the byte-faithful
    * bridge between the engine kernels (which hash `getBytes` octets) and
    * DuckDB (whose string functions are codepoint-based): each codepoint
    * is expanded to its 1-4 UTF-8 bytes arithmetically, so the oracle
    * folds the IDENTICAL byte stream on ANY corpus, not just ASCII
    * (round-6 VERDICT top ask; validated against a Python byte-level
    * reference on CJK/accented/emoji strings). Empty strings expand to
    * zero octets, matching `"".getBytes` (DuckDB's string_split would
    * otherwise yield [''] → a spurious 0 byte).
    */
  private def utf8OctetsSql(e: String): String =
    raw"""(CASE WHEN $e = '' THEN CAST([] AS UBIGINT[]) ELSE
       flatten(list_transform(string_split($e, ''), u8c ->
         CASE WHEN ascii(u8c) < 128 THEN [CAST(ascii(u8c) AS UBIGINT)]
              WHEN ascii(u8c) < 2048 THEN [
                CAST(192 + ascii(u8c) // 64 AS UBIGINT),
                CAST(128 + ascii(u8c) % 64 AS UBIGINT)]
              WHEN ascii(u8c) < 65536 THEN [
                CAST(224 + ascii(u8c) // 4096 AS UBIGINT),
                CAST(128 + (ascii(u8c) // 64) % 64 AS UBIGINT),
                CAST(128 + ascii(u8c) % 64 AS UBIGINT)]
              ELSE [
                CAST(240 + ascii(u8c) // 262144 AS UBIGINT),
                CAST(128 + (ascii(u8c) // 4096) % 64 AS UBIGINT),
                CAST(128 + (ascii(u8c) // 64) % 64 AS UBIGINT),
                CAST(128 + ascii(u8c) % 64 AS UBIGINT)]
         END)) END)"""

  /** FNV-1a-64 over the UTF-8 octets of a VARCHAR expression (unsigned
    * result; HUGEINT mod-2^64 wrap because DuckDB BIGINT arithmetic is
    * overflow-checked) — the oracle-side twin of the engine's byte-level
    * FNV kernels, byte-faithful on non-ASCII input via [[utf8OctetsSql]].
    */
  /** Shared q125/q126 oracle head: (source, u) rows over `documents` with
    * u = fmix64(fnv1a64(utf8(text))) — murmur3's finalizer spelled as
    * UHUGEINT mod-2^64 arithmetic (`// 2^33` = the unsigned 33-bit
    * shift), the octet-faithful twin of [[graft.functions.expressions.
    * FnvMixed64]].
    */
  /** murmur3 fmix64 over a CTE `base`'s column `u`, carrying `carry`
    * through: CTEs m1..m4 and `mx` (the finalized hash). UHUGEINT
    * mod-2^64 multiplies; `// 2^33` is the unsigned 33-bit shift.
    */
  private def fmix64Ctes(base: String, carry: String): String =
    s"""m1 AS (SELECT $carry, xor(u, u // 8589934592) AS u FROM $base),
         m2 AS (SELECT $carry,
                  CAST((CAST(u AS UHUGEINT) * 18397679294719823053)
                       % 18446744073709551616 AS UBIGINT) AS u FROM m1),
         m3 AS (SELECT $carry, xor(u, u // 8589934592) AS u FROM m2),
         m4 AS (SELECT $carry,
                  CAST((CAST(u AS UHUGEINT) * 14181476777654086739)
                       % 18446744073709551616 AS UBIGINT) AS u FROM m3),
         mx AS (SELECT $carry, xor(u, u // 8589934592) AS u FROM m4)"""

  private def fnvMixedDocCtes: String =
    s"""h0 AS (
           SELECT source, ${fnvOctetsSql("text")} AS u FROM documents),
         ${fmix64Ctes("h0", "source")},
         h AS (SELECT source, u FROM mx)"""

  private def fnvOctetsSql(e: String): String =
    s"""list_reduce(
         list_prepend(CAST(14695981039346656037 AS UBIGINT),
           ${utf8OctetsSql(e)}),
         (acc, c) -> CAST((CAST(xor(acc, c) AS HUGEINT) * 1099511628211)
                          % 18446744073709551616 AS UBIGINT))"""

  /** Full-quadratic MinHash oracle for q22: recomputes the FNV-1a-64
    * shingle hashes (HUGEINT mod-2^64 folds — DuckDB BIGINT arithmetic is
    * checked, so the wrap is spelled out), the k=128 affine signature, and
    * the estimated Jaccard for EVERY doc pair — so a hash-green row proves
    * the 32×4 banding lost no pair at θ=0.5, exactly like q24's quadratic
    * exact-Jaccard gate. The affine coefficients are interpolated from
    * HashUtil.affineCoefficients — the same stream the MinHashSig kernel
    * draws — so engine and oracle cannot drift. The signed-vs-unsigned
    * CASE mirrors the kernel's Java `% P` on the signed 64-bit hash.
    *
    * BYTE-FAITHFUL (round 7, was ASCII-only): the shingle fold runs over
    * [[utf8OctetsSql]] octets — the same byte stream the ShingleHashSet
    * kernel hashes — so the oracle is exact on CJK/accented/emoji text,
    * not just ASCII (verified green on the planted mixed corpus,
    * CORRECTNESS_MIXED artifact).
    *
    * RECALL CAVEAT: this oracle demands exact equality with the full
    * quadratic est_jaccard ≥ 0.5 set, but 32×4 banding has no recall
    * GUARANTEE at est exactly 0.5 — a borderline pair whose 64/128
    * agreeing positions dodge every band survives with probability
    * ≈ (15/16)^32 ≈ 13%. The no-miss result is fixture-verified, not
    * structural (contrast q24's (1-0.8⁴)^32 ≈ 4e-8 bound at j = 0.8); a
    * future red on a new/scaled fixture is triaged as a banding-recall
    * tradeoff, NOT a kernel bug — the engine's output is a subset of the
    * oracle's by construction, so false-greens are impossible.
    */
  private val minhashOracleSql: String = minhashOracleSqlFor(128)

  /** The q22/q80 oracle body at `k` signature positions: the oracle
    * interpolates `HashUtil.affineCoefficients(k, 42)` — the literal
    * call the MinHashSig kernel makes at the same k — so engine and
    * oracle coefficients are identical by construction at EVERY
    * geometry (q80: bandsFor(0.5, 2) → 49×2 = 98 positions). The pair
    * gate is agreements ≥ k/2 ⇔ est_jaccard ≥ 0.5 exactly (k is even).
    */
  private def minhashOracleSqlFor(k: Int): String = {
    require(k % 2 == 0, s"oracle threshold k/2 must be exact, got k=$k")
    val (a, b) = graft.functions.expressions.HashUtil.affineCoefficients(k, 42L)
    val aLit = a.mkString("[", ",", "]")
    val bLit = b.mkString("[", ",", "]")
    raw"""WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
           FROM documents),
         shingle_rows AS (
           SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
               i -> concat_ws(' ', t[i], t[i+1], t[i+2]) || ' '))) AS s
           FROM toks WHERE len(t) >= 3),
         hash_rows AS (
           SELECT doc_id, ${fnvOctetsSql("s")} AS h
           FROM shingle_rows),
         hm_rows AS (
           SELECT DISTINCT doc_id,
             CAST((((CASE WHEN h >= CAST(9223372036854775808 AS UBIGINT)
                          THEN CAST(h AS HUGEINT) - 18446744073709551616
                          ELSE CAST(h AS HUGEINT) END) % 2147483647) + 2147483647)
                   % 2147483647 AS BIGINT) AS m
           FROM hash_rows),
         coef AS (
           SELECT unnest(range(1, ${k + 1})) AS i,
                  unnest($aLit) AS a, unnest($bLit) AS b),
         sig_rows AS (
           SELECT doc_id, i, MIN((a * m + b) % 2147483647) AS v
           FROM hm_rows, coef GROUP BY doc_id, i),
         sig AS (
           SELECT doc_id, list(v ORDER BY i) AS s FROM sig_rows GROUP BY doc_id)
         SELECT x.doc_id AS id_a, y.doc_id AS id_b,
           CAST(len(list_filter(range(1, ${k + 1}), i -> x.s[i] = y.s[i])) AS DOUBLE)
             / $k AS est_jaccard
         FROM sig x, sig y
         WHERE x.doc_id < y.doc_id
           AND len(list_filter(range(1, ${k + 1}), i -> x.s[i] = y.s[i])) >= ${k / 2}
         ORDER BY id_a, id_b"""
  }

  /** q47 winnowing oracle: re-derives the MOSS fingerprint sets in DuckDB —
    * FNV-1a-64 over every 20-char gram (HUGEINT mod-2^64 fold), the
    * `h ^= h >>> 31` finalizer, and the w=8 sliding-window minimum as a
    * SIGNED-comparison window MIN (the kernel compares Java longs, so the
    * unsigned hash is re-signed BEFORE the MIN — an unsigned MIN would pick
    * different fingerprints). Tail windows shrink exactly like the kernel's
    * `end = min(start+w, n)`. Then the same df∈[2,10] rarity bound, shared
    * counts, and containment ≥ 0.5 gate as Dedup.winnowOverlapPairs.
    * BYTE-FAITHFUL (round 7, was ASCII-only): grams are 20-BYTE windows
    * at every BYTE offset of the [[utf8OctetsSql]] expansion — exactly
    * the kernel's byte-offset gram geometry, exact on non-ASCII text
    * (a multi-byte character simply spans several gram offsets, as it
    * does in the kernel).
    */
  private val winnowOracleSql: String =
    raw"""WITH bytes AS (
           SELECT doc_id, ${utf8OctetsSql("text")} AS bs FROM documents),
         grams AS (
           SELECT doc_id, pos, bs[CAST(pos AS INT):CAST(pos + 19 AS INT)] AS g
           FROM bytes, unnest(range(1, len(bs) - 18)) AS u(pos)),
         hashed AS (
           SELECT doc_id, pos,
             list_reduce(
               list_prepend(CAST(14695981039346656037 AS UBIGINT), g),
               (acc, c) -> CAST((CAST(xor(acc, c) AS HUGEINT) * 1099511628211)
                                % 18446744073709551616 AS UBIGINT)) AS h0
           FROM grams),
         finalized AS (
           SELECT doc_id, pos,
             CAST(CASE WHEN xor(h0, h0 >> 31) >= CAST(9223372036854775808 AS UBIGINT)
                       THEN CAST(xor(h0, h0 >> 31) AS HUGEINT) - 18446744073709551616
                       ELSE CAST(xor(h0, h0 >> 31) AS HUGEINT) END AS BIGINT) AS h
           FROM hashed),
         winmins AS (
           SELECT DISTINCT doc_id,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp
           FROM finalized),
         sets AS (
           SELECT doc_id, COUNT(*) AS n_fp FROM winmins GROUP BY doc_id),
         rare AS (
           SELECT fp FROM winmins GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND 10),
         fps AS (
           SELECT w.doc_id, w.fp, s.n_fp
           FROM winmins w JOIN rare USING (fp) JOIN sets s USING (doc_id)),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  COUNT(*) AS shared, MIN(a.n_fp) AS n_a, MIN(b.n_fp) AS n_b
           FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id)
         SELECT id_a, id_b, shared
         FROM pairs
         WHERE CAST(shared AS DOUBLE) / least(n_a, n_b) >= 0.5
         ORDER BY id_a, id_b"""

  /** q23 SimHash oracle: full-quadratic hamming over independently
    * re-derived 64-bit sketches — valid as an oracle because the engine's
    * chunk-pair pigeonhole blocking has an EXACT recall guarantee (any
    * pair at hamming ≤ 3 must share a chunk-pair key), so engine output
    * must equal the quadratic computation (byte-faithful per-token fold
    * via [[fnvOctetsSql]], round 7 — exact on non-ASCII tokens). Per-token FNV-1a-64 +
    * `h ^= h >>> 31` finalizer, ±1 votes per bit row-ified over a 64-row
    * bits table (every token OCCURRENCE votes, matching the kernel), sign
    * of the vote sum packs the bit via precomputed powers (DuckDB's `<<`
    * is overflow-checked at bit 63, so the powers are literals).
    */
  private val simhashOracleSql: String = {
    val pows = (0 until 64).map(b => (BigInt(1) << b).toString)
      .mkString("[", ",", "]")
    raw"""WITH tok_rows AS (
           SELECT doc_id,
             unnest(string_split_regex(trim(text), '[$WS]+')) AS tok
           FROM documents),
         hashed AS (
           SELECT doc_id, ${fnvOctetsSql("tok")} AS h0
           FROM tok_rows),
         finalized AS (
           SELECT doc_id, xor(h0, h0 >> 31) AS h FROM hashed),
         bits AS (
           SELECT unnest(range(0, 64)) AS b, unnest($pows::UBIGINT[]) AS p),
         votes AS (
           SELECT doc_id, b, p,
             SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
           FROM finalized, bits GROUP BY doc_id, b, p),
         sketches AS (
           SELECT doc_id,
             CAST(COALESCE(SUM(CASE WHEN v > 0 THEN CAST(p AS HUGEINT) END), 0)
               AS UBIGINT) AS sh
           FROM votes GROUP BY doc_id)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
         FROM sketches a, sketches b
         WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sh, b.sh)) <= 3
         ORDER BY id_a, id_b"""
  }

  /** q28 language-ID oracle: marker-hit argmax re-derived in DuckDB. The
    * marker lists interpolate from TextFunctions.langMarkers (the single
    * source the engine broadcasts as literals), and the tie semantics
    * match by construction: Spark's array_max and DuckDB's list_max both
    * compare (score, lang) structs field-by-field, so ties break toward
    * the lexicographically larger language in both engines.
    */
  private val langidOracleSql: String = {
    val arms = TextFunctions.langMarkers.toSeq.sortBy(_._1).map {
      case (lang, ms) =>
        // SQL-escape apostrophes (plausible markers for French: l', d')
        // so interpolated literals can never break the generated SQL
        val lst = ms.map(m => s"'${m.replace("'", "''")}'").mkString(",")
        s"{'score': len(list_filter(t, x -> x IN ($lst))), 'lang': '$lang'}"
    }.mkString(", ")
    raw"""WITH toks AS (
           SELECT lang AS labeled,
             string_split_regex(trim(text), '[$WS]+') AS t
           FROM documents),
         scored AS (
           SELECT labeled, list_max([$arms]) AS best FROM toks)
         SELECT labeled,
           CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS predicted,
           COUNT(*) AS cnt
         FROM scored GROUP BY labeled, predicted
         ORDER BY labeled, predicted"""
  }

  /** q61 oracle: re-derives the deterministic near-dup twins (same blend
    * arithmetic, element-for-element — `(1-a)*v[i] + a*v[rot]` is the
    * identical IEEE double expression in both engines, and the float→double
    * widening of the base embedding is exact), then computes the FULL
    * quadratic cosine over base ∪ twins — so a hash-green row proves the
    * production-regime (θ=0.9, 16-plane, lshTablesFor-sized) LSH blocking
    * lost no pair. Indexing note: DuckDB's 1-based `v[1 + (i % 64)]` equals
    * Spark's 0-based `element_at(v, ((i0+1) mod 64) + 1)` under i = i0+1.
    */
  private val embedProdOracleSql: String =
    """WITH b AS (
           SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         tw AS (
           SELECT vec_id + 1000000 AS vec_id,
             list_transform(range(1, 65),
               i -> (1 - a) * v[i] + a * v[1 + (i % 64)]) AS v
           FROM (SELECT vec_id, v, CAST(vec_id % 8 AS DOUBLE) / 20 AS a
                 FROM b WHERE vec_id < 50)),
         allv AS (SELECT * FROM b UNION ALL SELECT * FROM tw),
         n AS (
           SELECT vec_id, v,
             sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, len(v)+1), i -> v[i] * v[i])),
               (acc, x) -> acc + x)) AS nrm
           FROM allv)
         SELECT id_a, id_b, sim FROM (
           SELECT a.vec_id AS id_a, c.vec_id AS id_b,
             round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, len(a.v)+1), i -> a.v[i] * c.v[i])),
               (acc, x) -> acc + x) / (a.nrm * c.nrm), 4) AS sim
           FROM n a, n c WHERE a.vec_id < c.vec_id)
         WHERE sim > 0.9 ORDER BY id_a, id_b"""

  /** q170 oracle: the SemDeDup decision table replayed start-to-finish in
    * SQL — the q61 twin corpus re-derived (identical IEEE blend, see
    * [[embedProdOracleSql]]), the exact kNN graph as a quadratic top-5
    * (ROW_NUMBER on the 6-dp cosine, n_id tiebreak — the engine's heap
    * contract), the θ=0.9 filter ON THE ROUNDED sim (both engines compare
    * identical 6-dp values), symmetric distinct edges, RECURSIVE
    * reachability closure (component = MIN reachable id — the q64
    * pattern), and the keep-best argmax re-derived as a ranked window
    * over (round(nrm,6) DESC, vec_id) — exactly the engine's
    * min_by(vec_id, struct(-nrm, vec_id)) keep-best ordering.
    */
  private val semDedupOracleSql: String = semDedupOracleSqlOn("TRUE")

  /** The q170/q172/q174 replay with the corpus restricted to `where`
    * (q174: the post-takedown remaining corpus — twins and bases filter
    * by the same predicate on BOTH sides).
    */
  private def semDedupOracleSqlOn(where: String): String =
    s"""WITH RECURSIVE b AS (
           SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         tw AS (
           SELECT vec_id + 1000000 AS vec_id,
             list_transform(range(1, 65),
               i -> (1 - a) * v[i] + a * v[1 + (i % 64)]) AS v
           FROM (SELECT vec_id, v, CAST(vec_id % 8 AS DOUBLE) / 20 AS a
                 FROM b WHERE vec_id < 50)),
         allv AS (SELECT * FROM b UNION ALL SELECT * FROM tw),
         liv AS (SELECT * FROM allv WHERE $where),
         n AS (
           SELECT vec_id, v,
             sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, len(v)+1), i -> v[i] * v[i])),
               (acc, x) -> acc + x)) AS nrm
           FROM liv),
         scored AS (
           SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, len(q.v)+1), i -> q.v[i] * c.v[i])),
               (acc, x) -> acc + x) / (q.nrm * c.nrm), 6) AS sim
           FROM n q, n c WHERE c.vec_id != q.vec_id),
         knn AS (
           SELECT q_id, n_id, sim FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                         ORDER BY sim DESC, n_id) AS rn
             FROM scored)
           WHERE rn <= 5),
         eg AS (
           SELECT DISTINCT least(q_id, n_id) AS u, greatest(q_id, n_id) AS v
           FROM knn WHERE sim >= 0.9),
         und AS (SELECT u, v FROM eg UNION SELECT v AS u, u AS v FROM eg),
         reach AS (
           SELECT vec_id AS src, vec_id AS dst FROM liv
           UNION
           SELECT r.src, e.v FROM reach r JOIN und e ON r.dst = e.u),
         comp AS (
           SELECT src AS vec_id, MIN(dst) AS component
           FROM reach GROUP BY src),
         qual AS (SELECT vec_id, round(nrm, 6) AS nrm FROM n),
         keep AS (
           SELECT component, vec_id AS keep_id, csize FROM (
             SELECT c.component, q.vec_id,
               COUNT(*) OVER (PARTITION BY c.component) AS csize,
               ROW_NUMBER() OVER (PARTITION BY c.component
                 ORDER BY q.nrm DESC, q.vec_id) AS r
             FROM comp c JOIN qual q USING (vec_id))
           WHERE r = 1)
         SELECT c.vec_id, c.component, CAST(k.csize AS BIGINT) AS csize,
           CASE WHEN c.vec_id = k.keep_id THEN 'kept' ELSE 'dropped' END
             AS action,
           k.keep_id
         FROM comp c JOIN keep k USING (component)
         ORDER BY c.vec_id"""

  /** q69 query terms — fixture-vocabulary words with distinct document
    * frequencies so the idf term differentiates. Single source for the
    * engine's isin filter AND the oracle's IN list.
    */
  private val bm25Terms: Seq[String] = Seq("spark", "stream", "merge")

  /** q130 query terms — a DIFFERENT fixture-vocabulary set from q69's, so
    * the stored-index path is exercised on terms whose df/tf profile the
    * q69 gate never covered. Single source for the engine's index probe
    * AND the oracle's IN list.
    */
  private val indexTerms: Seq[String] = Seq("join", "scan", "vector", "window")

  /** q165/q166's hybrid queries: five (text-terms, query-embedding)
    * pairs — the dense twin of query i is the embedding of vec_id = i
    * (the fixture has no text↔embedding correspondence, so the pairing is
    * a deterministic harness; RRF semantics don't depend on it). Terms
    * are fixture-vocabulary words (q69/q130's sets) — single source for
    * the engine's term map AND the oracle's VALUES list.
    */
  private val hybridQueries: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("spark", "join"),
    1L -> Seq("stream", "scan"),
    2L -> Seq("merge", "vector"),
    3L -> Seq("spark", "window"),
    4L -> Seq("stream", "merge"))

  /** q165/q166 knobs, single-sourced into the oracles: per-channel top-k,
    * the standard RRF constant, the fused cut, and the MMR relevance /
    * diversity weights (λ and 1−λ as independent literals — recomputing
    * 1−λ could differ in the last ulp) + pick count.
    */
  private val hybridChannelK = 50
  private val hybridRrfK = 60
  private val hybridTopK = 10
  private val mmrLambdaRel = 0.7
  private val mmrLambdaDiv = 0.3
  private val mmrK = 5

  /** The shared q165/q166 oracle CTE chain: both channels re-derived from
    * scratch — BM25 with the q69 CTE chain widened per query (identical
    * literals/op order, per-term 6 dp rounding, DECIMAL sum), dense
    * cosine with the q26 chain — each ranked by
    * ROW_NUMBER(score DESC, doc_id) (== the engine's heap contract),
    * truncated to the channel k, full-outer fused with
    * rrf = 1/(60+rank) summed sparse-then-dense and rounded AFTER the
    * sum, exactly the engine's op order; `hybrid` is the fused top-`cut`
    * (q165/q166 use the default serving cut; q168 dedups the wider
    * candidate page).
    */
  private def hybridFusedCtes(cut: Int = hybridTopK): String = {
    val qtRows = hybridQueries.flatMap { case (q, ts) =>
      ts.map(t => s"(CAST($q AS BIGINT), '${t.replace("'", "''")}')")
    }.mkString(", ")
    val allTerms = hybridQueries.flatMap(_._2).distinct
      .map(t => s"'${t.replace("'", "''")}'").mkString(",")
    raw"""qt(q_id, tok) AS (SELECT * FROM (VALUES $qtRows)),
         toks AS (
           SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
           FROM documents),
         dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
         tf AS (
           SELECT doc_id, tok, COUNT(*) AS tf
           FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
           WHERE tok IN ($allTerms) GROUP BY doc_id, tok),
         stats AS (
           SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS tot_dl
           FROM dl),
         dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
         sc AS (
           SELECT t.q_id, f.doc_id,
             CAST(SUM(CAST(round(
               ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1) *
                 (f.tf * 2.2) /
                 (f.tf + 1.2 * (0.25 + 0.75 * l.dl /
                   (CAST(s.tot_dl AS DOUBLE) / s.n_docs))), 6)
               AS DECIMAL(18,6))) AS DOUBLE) AS score
           FROM tf f
           JOIN dl l USING (doc_id)
           CROSS JOIN stats s
           JOIN dfq d ON f.tok = d.tok
           JOIN qt t ON f.tok = t.tok
           GROUP BY t.q_id, f.doc_id),
         sp AS (
           SELECT q_id, doc_id, rnk FROM (
             SELECT q_id, doc_id, ROW_NUMBER() OVER (PARTITION BY q_id
                      ORDER BY score DESC, doc_id) AS rnk
             FROM sc)
           WHERE rnk <= $hybridChannelK),
         e AS (
           SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         n AS (
           SELECT vec_id, v,
             sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, len(v)+1), i -> v[i] * v[i])),
               (acc, x) -> acc + x)) AS nrm
           FROM e),
         dscored AS (
           SELECT q.vec_id AS q_id, c.vec_id AS doc_id,
             round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, len(q.v)+1), i -> q.v[i] * c.v[i])),
               (acc, x) -> acc + x) / (q.nrm * c.nrm), 6) AS sim
           FROM n q, n c
           WHERE q.vec_id < 5 AND c.vec_id != q.vec_id),
         dn AS (
           SELECT q_id, doc_id, rnk FROM (
             SELECT q_id, doc_id, ROW_NUMBER() OVER (PARTITION BY q_id
                      ORDER BY sim DESC, doc_id) AS rnk
             FROM dscored)
           WHERE rnk <= $hybridChannelK),
         fused AS (
           SELECT COALESCE(sp.q_id, dn.q_id) AS q_id,
             COALESCE(sp.doc_id, dn.doc_id) AS doc_id,
             round(
               COALESCE(CAST(1 AS DOUBLE) / ($hybridRrfK + sp.rnk), 0) +
               COALESCE(CAST(1 AS DOUBLE) / ($hybridRrfK + dn.rnk), 0),
               6) AS rrf,
             CAST(COALESCE(sp.rnk, -1) AS BIGINT) AS sp_rank,
             CAST(COALESCE(dn.rnk, -1) AS BIGINT) AS dn_rank
           FROM sp FULL OUTER JOIN dn
             ON sp.q_id = dn.q_id AND sp.doc_id = dn.doc_id),
         hybrid AS (
           SELECT q_id, doc_id, rrf, sp_rank, dn_rank, rn FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                      ORDER BY rrf DESC, doc_id) AS rn
             FROM fused)
           WHERE rn <= $cut)"""
  }

  private def hybridRrfOracleSql: String =
    s"""WITH ${hybridFusedCtes()}
       SELECT q_id, doc_id, rrf, sp_rank, dn_rank, rn FROM hybrid
       ORDER BY q_id, rn"""

  /** The greedy MMR recursion UNROLLED into mmrK chained CTE steps over a
    * `cand(q_id, doc_id, rel)` CTE already in scope — step i's argmax is
    * a ROW_NUMBER over `λ·rel − (1−λ)·maxsim` with maxsim the true
    * (signed) max of the pairwise 6-dp cosines against the accumulated
    * selection, 0 for the empty first step; exactly the engine's op order
    * and tiebreak. Unrolling (vs a recursive CTE) keeps every step a
    * plain window query — no dialect-specific recursion semantics to
    * trust. SHARED by q166 (cand = the fused top-10) and q171 (cand = the
    * dedup-surviving page), so the two replays cannot drift; callers
    * append [[mmrUnionSql]] as the final select.
    *
    * `cand` must already be restricted to docs WITH embedding rows
    * (JOIN `n`) because the ENGINE's candidate-vector lookup is an INNER
    * join ([[graft.operators.Retrieval.mmrRerank]]): a candidate with no
    * embedding row is not rerankable and is dropped on both sides.
    * Scoring a vectorless candidate with maxsim=0 instead would let it
    * win picks the engine never makes (divergent at any SF where
    * |embeddings| < |documents|, e.g. sf0.1's 2000 vs 5000).
    */
  private def mmrGreedyCtes: String = {
    val steps = (1 to mmrK).map { i =>
      val notPicked =
        if (i == 1) "TRUE"
        else s"NOT EXISTS (SELECT 1 FROM sel${i - 1} s " +
          "WHERE s.q_id = c.q_id AND s.doc_id = c.doc_id)"
      val maxsim =
        if (i == 1) "CAST(0 AS DOUBLE)"
        else s"COALESCE((SELECT MAX(pc.sim) FROM pc, sel${i - 1} s " +
          "WHERE pc.q_id = c.q_id AND s.q_id = c.q_id " +
          "AND pc.id_a = c.doc_id AND pc.id_b = s.doc_id), 0)"
      val sel =
        if (i == 1) "SELECT q_id, doc_id FROM p1"
        else s"SELECT q_id, doc_id FROM sel${i - 1} " +
          s"UNION ALL SELECT q_id, doc_id FROM p$i"
      s"""p$i AS (
           SELECT q_id, doc_id, mmr, CAST($i AS BIGINT) AS rn FROM (
             SELECT x.*, ROW_NUMBER() OVER (PARTITION BY q_id
                      ORDER BY mmr DESC, doc_id) AS r FROM (
               SELECT c.q_id, c.doc_id,
                 $mmrLambdaRel * c.rel - $mmrLambdaDiv * $maxsim AS mmr
               FROM cand c WHERE $notPicked) x)
           WHERE r = 1),
         sel$i AS ($sel)"""
    }.mkString(",\n         ")
    s"""cv AS (SELECT c.q_id, c.doc_id, n.v, n.nrm
                FROM cand c JOIN n ON n.vec_id = c.doc_id),
         pc AS (
           SELECT a.q_id, a.doc_id AS id_a, b.doc_id AS id_b,
             round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, len(a.v)+1), i -> a.v[i] * b.v[i])),
               (acc, x) -> acc + x) / (a.nrm * b.nrm), 6) AS sim
           FROM cv a JOIN cv b ON a.q_id = b.q_id AND a.doc_id != b.doc_id),
         $steps"""
  }

  /** The final select over [[mmrGreedyCtes]]'s step CTEs. */
  private def mmrUnionSql: String = {
    val union = (1 to mmrK).map(i => s"SELECT * FROM p$i")
      .mkString(" UNION ALL ")
    s"""SELECT q_id, doc_id, round(mmr, 6) AS mmr, rn
       FROM ($union) ORDER BY q_id, rn"""
  }

  /** q166 oracle: [[mmrGreedyCtes]] over the fused top-10. */
  private def mmrOracleSql: String =
    s"""WITH ${hybridFusedCtes()},
         cand AS (SELECT h.q_id, h.doc_id, h.rrf AS rel
                  FROM hybrid h JOIN n ON n.vec_id = h.doc_id),
         $mmrGreedyCtes
       $mmrUnionSql"""

  /** The SERP-dedup drop-rule CTE block over a `candName(q_id, doc_id,
    * rn)` CTE already in scope: pairwise trigram-Jaccard edges re-derived
    * among the candidate docs only (edge membership between two docs is
    * independent of the rest of the corpus, so the restriction is exact —
    * and the quadratic stays |candidates|²), then the one-pass rule —
    * dropped iff some better-ranked candidate of the same query is a
    * graph neighbor, dup_of = (rank, doc_id)-lexicographic best such
    * neighbor (`bd`). SHARED by q168 and q171 so the two replays cannot
    * drift. Needs `toks` (from [[hybridFusedCtes]]) in scope.
    */
  private def serpDedupCtes(candName: String): String =
    s"""sh2 AS (
           SELECT doc_id,
             CASE WHEN len(t) < 3 THEN []::VARCHAR[]
                  ELSE list_distinct(list_transform(range(1, len(t) - 1),
                         i -> concat_ws(' ', t[i], t[i+1], t[i+2])))
             END AS s
           FROM toks
           WHERE doc_id IN (SELECT DISTINCT doc_id FROM $candName)),
         nz2 AS (SELECT doc_id, s FROM sh2 WHERE len(s) > 0),
         cpr AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM nz2 a, nz2 b WHERE a.doc_id < b.doc_id
             AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.s, b.s)))
                 >= $simGraphThreshold),
         dup AS (
           SELECT c.q_id, c.doc_id, e.doc_id AS nb, e.rn AS nb_rn
           FROM $candName c
           JOIN $candName e ON e.q_id = c.q_id AND e.rn < c.rn
           JOIN cpr p ON p.id_a = least(c.doc_id, e.doc_id)
                     AND p.id_b = greatest(c.doc_id, e.doc_id)),
         bd AS (
           SELECT q_id, doc_id, nb AS dup_of FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id, doc_id
                      ORDER BY nb_rn, nb) AS r
             FROM dup)
           WHERE r = 1)"""

  /** q168 oracle: the fused candidate page at the wide cut through
    * [[serpDedupCtes]]'s drop rule.
    */
  private def serpDedupOracleSql: String =
    s"""WITH ${hybridFusedCtes(hybridChannelK)},
         cand AS (SELECT q_id, doc_id, rn FROM hybrid),
         ${serpDedupCtes("cand")}
       SELECT c.q_id, c.doc_id, c.rn,
         CASE WHEN b.dup_of IS NULL THEN 'kept' ELSE 'dropped' END
           AS action,
         CAST(COALESCE(b.dup_of, -1) AS BIGINT) AS dup_of
       FROM cand c LEFT JOIN bd b
         ON b.q_id = c.q_id AND b.doc_id = c.doc_id
       ORDER BY c.q_id, c.rn"""

  /** q171 oracle: the WHOLE serving pipeline replayed in one statement —
    * the wide fused page (cut = channel k), [[serpDedupCtes]]'s drop
    * rule, the surviving page re-ranked by the ORIGINAL fused rank and
    * cut to the serving top-10, then [[mmrGreedyCtes]]'s greedy over the
    * survivors (vector inner join — q166's exact semantics). Every stage
    * is the same single-sourced CTE block its standalone oracle uses, so
    * a hash-green row proves the composition, not a re-derivation.
    *
    * The expensive stages are pinned `MATERIALIZED`: DuckDB re-expands
    * multi-referenced CTEs inside correlated subqueries, and the mmrK
    * unrolled steps would otherwise re-derive the whole fusion + dedup
    * chain PER STEP (measured: >10 min at sf0.01 vs 4 s materialized;
    * semantics unchanged — the hint only pins evaluation count).
    */
  private def ragPipelineOracleSql: String = Seq(
    "hybrid AS (", "cand0 AS (", "bd AS (", "page AS (", "cand AS (",
    "pc AS (").foldLeft(ragPipelineOracleRaw) { (s, n) =>
      s.replace(n, n.replace("AS (", "AS MATERIALIZED ("))
    }

  private def ragPipelineOracleRaw: String =
    s"""WITH ${hybridFusedCtes(hybridChannelK)},
         cand0 AS (SELECT q_id, doc_id, rrf, rn FROM hybrid),
         ${serpDedupCtes("cand0")},
         keptp AS (
           SELECT c.q_id, c.doc_id, c.rrf, c.rn
           FROM cand0 c LEFT JOIN bd b
             ON b.q_id = c.q_id AND b.doc_id = c.doc_id
           WHERE b.dup_of IS NULL),
         page AS (
           SELECT q_id, doc_id, rrf FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                      ORDER BY rn) AS prn
             FROM keptp)
           WHERE prn <= $hybridTopK),
         cand AS (SELECT p.q_id, p.doc_id, p.rrf AS rel
                  FROM page p JOIN n ON n.vec_id = p.doc_id),
         $mmrGreedyCtes
       $mmrUnionSql"""

  /** q69/q130 oracle: BM25 re-derived in DuckDB with the SAME double-op
    * order and literals (2.2 = k1+1 and 0.25 = 1-b are literals on BOTH
    * sides — recomputing them could differ in the last ulp), per-term
    * rounding to 6 dp, and the same DECIMAL sum so addition order cannot
    * matter. Always the FULL-corpus from-scratch recompute: when the
    * engine side answers from the stored index (q130), a hash-green row
    * proves build + append lost no posting, df, or stats row.
    */
  private def bm25OracleSql: String = bm25OracleSqlFor(bm25Terms)

  /** `docsWhere` restricts the oracle's corpus to the LIVE documents
    * (q131: everything the engine side tombstoned is simply absent from
    * the recompute — df, avgdl, and n_docs all shrink accordingly).
    */
  private def bm25OracleSqlFor(termSeq: Seq[String],
                               docsWhere: String = "TRUE"): String = {
    val terms = termSeq.map(t => s"'${t.replace("'", "''")}'")
      .mkString(",")
    raw"""WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
           FROM documents WHERE $docsWhere),
         dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
         tf AS (
           SELECT doc_id, tok, COUNT(*) AS tf
           FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
           WHERE tok IN ($terms) GROUP BY doc_id, tok),
         stats AS (
           SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS tot_dl
           FROM dl),
         dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
         scored AS (
           SELECT f.doc_id,
             round(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1) *
               (f.tf * 2.2) /
               (f.tf + 1.2 * (0.25 + 0.75 * l.dl /
                 (CAST(s.tot_dl AS DOUBLE) / s.n_docs))), 6) AS ts
           FROM tf f
           JOIN dl l USING (doc_id)
           CROSS JOIN stats s
           JOIN dfq d ON f.tok = d.tok)
         SELECT doc_id,
           CAST(SUM(CAST(ts AS DECIMAL(18,6))) AS DOUBLE) AS score,
           COUNT(*) AS n_terms
         FROM scored GROUP BY doc_id
         ORDER BY score DESC, doc_id LIMIT 20"""
  }

  /** q72 oracle: the SAME deterministic contact tail appended (pure
    * function of doc_id, `%` == pmod on the non-negative ids), then counts
    * and the sequential redaction replayed with the patterns interpolated
    * from TextFunctions.piiPatterns — single-sourced, so engine and oracle
    * regexes cannot drift. The patterns are RE2-safe by construction (see
    * the piiPatterns scaladoc); 'g' makes DuckDB replace-all like Java.
    */
  private def piiOracleSql: String = {
    val counts = TextFunctions.piiPatterns.map { case (kind, pat) =>
      s"CAST(len(regexp_extract_all(a, '$pat')) AS BIGINT) AS n_$kind"
    }.mkString(",\n           ")
    val redacted = TextFunctions.piiPatterns.foldLeft("a") {
      case (acc, (kind, pat)) =>
        s"regexp_replace($acc, '$pat', '<${kind.toUpperCase}>', 'g')"
    }
    raw"""WITH aug AS (
           SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
               || '@example.com'
               || CASE WHEN doc_id % 3 = 0 THEN ' cc admin@test.org'
                       ELSE '' END
               || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
               || CAST(doc_id * 7 % 256 AS VARCHAR)
               || ' call 555-'
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS a
           FROM documents)
         SELECT doc_id,
           $counts,
           $redacted AS redacted
         FROM aug ORDER BY doc_id"""
  }

  /** q70 oracle: unigram LM re-derived in DuckDB — same +1 smoothing over
    * the observed vocab, same double-op order, 6-dp per-token rounding and
    * DECIMAL sum so aggregation order cannot enter the hash.
    */
  private val surprisalOracleSql: String =
    raw"""WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
           FROM documents),
         tr AS (SELECT doc_id, unnest(t) AS tok FROM toks),
         stats AS (
           SELECT COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS vocab
           FROM tr),
         lm AS (SELECT tok, COUNT(*) AS cnt FROM tr GROUP BY tok),
         sc AS (
           SELECT r.doc_id,
             round(-ln((l.cnt + 1.0) / (s.n_tokens + s.vocab)), 6)
               AS surprisal
           FROM tr r JOIN lm l USING (tok) CROSS JOIN stats s)
         SELECT doc_id, COUNT(*) AS n_tok,
           round(CAST(SUM(CAST(surprisal AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 4) AS mean_surprisal
         FROM sc GROUP BY doc_id ORDER BY doc_id"""

  /** Shared q100/q103 round-trip oracle: per-doc polynomial fingerprint
    * (q27's formula) plus the typed columns, over the ORIGINAL parquet —
    * a hash-green row proves the interchange write→read loop preserved
    * every text byte and typed value.
    */
  /** q89/q110 shared oracle: full quadratic corpus × shard Jaccard, then
    * NOT IN — proves the band blocking (fresh sketch in q89, persisted
    * index in q110) + left-anti admitted exactly the non-dup shard
    * (miss bound 4e-8 structural, same as q84).
    */
  private val incrementalIngestOracleSql: String =
    ingestOracleSql("doc_id % 10 <> 7")

  /** The quadratic near-dup admission oracle (q89/q110/q123), with the
    * corpus CTE's predicate parameterized so the band-index DELETE query
    * gates against the reduced (post-takedown) corpus.
    */
  private def ingestOracleSql(corpusWhere: String): String =
    raw"""WITH corpus AS (
           SELECT doc_id, text FROM documents WHERE $corpusWhere),
         shard AS (
           SELECT doc_id + 5000000 AS doc_id, text || ' zzingest' AS text
           FROM documents WHERE doc_id % 10 = 5
           UNION ALL
           SELECT doc_id + 7000000 AS doc_id, text
           FROM documents WHERE doc_id % 10 = 7),
         shc AS (
           SELECT doc_id,
             CASE WHEN len(t) < 3 THEN []::VARCHAR[]
                  ELSE list_distinct(list_transform(range(1, len(t) - 1),
                         i -> concat_ws(' ', t[i], t[i+1], t[i+2])))
             END AS s
           FROM (SELECT doc_id,
                   string_split_regex(trim(text), '[$WS]+') AS t
                 FROM corpus)),
         shs AS (
           SELECT doc_id,
             CASE WHEN len(t) < 3 THEN []::VARCHAR[]
                  ELSE list_distinct(list_transform(range(1, len(t) - 1),
                         i -> concat_ws(' ', t[i], t[i+1], t[i+2])))
             END AS s
           FROM (SELECT doc_id,
                   string_split_regex(trim(text), '[$WS]+') AS t
                 FROM shard)),
         flagged AS (
           SELECT DISTINCT e.doc_id
           FROM shc c, shs e
           WHERE len(c.s) > 0 AND len(e.s) > 0
             AND CAST(len(list_intersect(c.s, e.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(c.s, e.s))) >= 0.8)
         SELECT doc_id, CAST(strlen(text) AS BIGINT) AS blen
         FROM shard
         WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
         ORDER BY doc_id"""

  private val roundTripOracleSql: String =
    """SELECT doc_id, lang, n_chars,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ''),
                 ch -> CAST(ascii(ch) AS BIGINT))),
             (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
         FROM documents ORDER BY doc_id"""

  /** q102 oracle: the interpolated bigram LM re-derived in DuckDB — same
    * λ=0.7 Jelinek-Mercer mix, same +1-smoothed unigram backoff, same
    * double-op order (cast-to-double numerators, long denominators), 6-dp
    * per-bigram rounding and DECIMAL sum exactly as q70.
    */
  private val bigramSurprisalOracleSql: String =
    raw"""WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
           FROM documents),
         tr AS (SELECT doc_id, unnest(t) AS tok FROM toks),
         stats AS (
           SELECT COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS vocab
           FROM tr),
         uni AS (SELECT tok, COUNT(*) AS cw FROM tr GROUP BY tok),
         bgl AS (
           SELECT doc_id, list_transform(range(1, len(t)),
               i -> struct_pack(v := t[i], w := t[i+1])) AS ps
           FROM toks WHERE len(t) >= 2),
         bg AS (
           SELECT doc_id, p.v AS v, p.w AS w
           FROM (SELECT doc_id, unnest(ps) AS p FROM bgl)),
         cb AS (SELECT v, w, COUNT(*) AS cvw FROM bg GROUP BY v, w),
         cv AS (SELECT v, COUNT(*) AS cv FROM bg GROUP BY v),
         sc AS (
           SELECT g.doc_id,
             round(-ln(0.7 * (CAST(b.cvw AS DOUBLE) / c.cv)
                     + 0.3 * ((u.cw + 1.0) / (s.n_tokens + s.vocab))), 6)
               AS surprisal
           FROM bg g JOIN cb b USING (v, w) JOIN cv c USING (v)
           JOIN uni u ON g.w = u.tok CROSS JOIN stats s)
         SELECT doc_id, COUNT(*) AS n_bigrams,
           round(CAST(SUM(CAST(surprisal AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 4) AS mean_surprisal
         FROM sc GROUP BY doc_id ORDER BY doc_id"""

  /** q67 mixture weights: deliberately spread (full-keep, half, heavy
    * downsample, near-drop) so the rate when-chain and the oracle's CASE
    * both exercise every arm plus the default. Single source for the
    * engine query AND the q67 oracle SQL.
    */
  private val mixRates: Map[String, Double] =
    Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.2, "src3" -> 0.05)
  private val mixDefaultRate: Double = 0.75

  /** q67 oracle: re-derives the per-source kept counts from the same FNV
    * bucket stream as q62; the CASE arms interpolate from [[mixRates]]
    * (sorted, quotes escaped) so the two sides cannot drift.
    */
  private def mixingOracleSql: String = {
    val arms = mixRates.toSeq.sortBy(_._1).map { case (dom, r) =>
      s"WHEN '${dom.replace("'", "''")}' THEN ${math.round(r * 1000000L)}"
    }.mkString(" ")
    fnvBucketCtes("documents", "doc_id", 41) + s"""
         SELECT source, CAST(COUNT(*) AS BIGINT) AS total,
           CAST(SUM(CASE WHEN b < (CASE source $arms
                    ELSE ${math.round(mixDefaultRate * 1000000L)} END)
                    THEN 1 ELSE 0 END) AS BIGINT) AS kept
         FROM s GROUP BY source ORDER BY source"""
  }

  /** q135 oracle: replays the PPS sampler exactly — the shared FNV ppm
    * bucket (seed 29), the exact integer threshold
    * t = least(10⁶, (w·k·10⁶) // W) (DuckDB `//` == Spark `div` on
    * non-negative operands), strict b < t membership, then the same
    * 6-dp-rounded DECIMAL-summed Horvitz-Thompson fold and exact
    * per-source totals.
    */
  private def weightedSampleOracleSql: String =
    fnvBucketCtes("documents", "doc_id", 29) + raw""",
         w0 AS (
           SELECT source, doc_id, b,
             CAST(len(string_split_regex(trim(text), '[$WS]+')) AS BIGINT)
               AS w
           FROM s),
         tot AS (SELECT SUM(w) AS wtot FROM w0),
         t0 AS (
           SELECT source, doc_id, b, w,
             LEAST(1000000, (w * 40000000) // wtot) AS t
           FROM w0 CROSS JOIN tot),
         sel AS (SELECT * FROM t0 WHERE w > 0 AND b < t),
         g AS (
           SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled,
             CAST(SUM(CAST(round(CAST(w AS DOUBLE) * 1000000.0 / t, 6)
                           AS DECIMAL(18, 6))) AS DOUBLE) AS ht_tokens
           FROM sel GROUP BY source),
         ex AS (
           SELECT source, CAST(SUM(w) AS BIGINT) AS exact_tokens
           FROM w0 GROUP BY source)
         SELECT g.source, g.n_sampled, g.ht_tokens, ex.exact_tokens
         FROM g JOIN ex USING (source) ORDER BY g.source"""

  /** q136 oracle: replays the sequential Poisson rank — the shared ppm
    * bucket (seed 43), priority = CAST(b+1 AS DOUBLE)/w (one IEEE
    * division, bit-identical), doc_id tiebreak, bottom 120.
    */
  private def sequentialPoissonOracleSql: String =
    fnvBucketCtes("documents", "doc_id", 43) + raw""",
         w0 AS (
           SELECT doc_id, source, b,
             CAST(len(string_split_regex(trim(text), '[$WS]+')) AS BIGINT)
               AS w
           FROM s),
         sel AS (
           SELECT doc_id, source, w FROM w0
           WHERE w > 0
           ORDER BY CAST(b + 1 AS DOUBLE) / w, doc_id LIMIT 120)
         SELECT doc_id, source, w FROM sel ORDER BY doc_id"""

  /** q142 oracle: the same FNV priority stream (seed 57), replayed as a
    * plain row_number cut per source — the window the engine's bounded
    * heap exists to avoid at scale, exact at fixture scale.
    */
  private def domainCapOracleSql: String =
    fnvBucketCtes("documents", "doc_id", 57) + s""",
         r AS (
           SELECT doc_id, source, b,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY b, doc_id)
               AS rn
           FROM s)
         SELECT doc_id, source, CAST(b AS BIGINT) AS priority,
           rn <= $domainCap AS kept
         FROM r ORDER BY doc_id"""

  /** q143 oracle: identical tokenization (q102's split), identical
    * left-assoc double chain inside ln, identical (pmi, v, w) cut.
    */
  private def pmiOracleSql: String =
    raw"""WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
           FROM documents),
         tr AS (SELECT unnest(t) AS tok FROM toks),
         uni AS (SELECT tok, COUNT(*) AS c1 FROM tr GROUP BY tok),
         bgl AS (
           SELECT list_transform(range(1, len(t)),
               i -> struct_pack(v := t[i], w := t[i+1])) AS ps
           FROM toks WHERE len(t) >= 2),
         bg AS (SELECT p.v AS v, p.w AS w
                FROM (SELECT unnest(ps) AS p FROM bgl)),
         cb AS (SELECT v, w, COUNT(*) AS cvw FROM bg GROUP BY v, w
                HAVING COUNT(*) >= $pmiMinCount),
         stats AS (SELECT (SELECT COUNT(*) FROM tr) AS n_tok,
                          (SELECT COUNT(*) FROM bg) AS n_bg)
         SELECT b.v, b.w, b.cvw,
           round(ln(CAST(b.cvw AS DOUBLE) * s.n_tok / uv.c1 / uw.c1
             * s.n_tok / s.n_bg), 6) AS pmi
         FROM cb b JOIN uni uv ON b.v = uv.tok
         JOIN uni uw ON b.w = uw.tok
         CROSS JOIN stats s
         ORDER BY pmi DESC, v, w LIMIT 50"""

  /** q137 oracle: THE QUADRATIC JOIN the operator exists to avoid — same
    * label + corruption derivation (pure substring/concat ops, exact in
    * both engines), then brute levenshtein over the length-filtered
    * probe x catalog product. Hash-green proves the segment blocking
    * recall-exact.
    */
  private val editDistOracleSql: String =
    """WITH cat AS (
         SELECT p_partkey AS cat_id,
           concat(p_brand, ' ', p_name, ' #', CAST(p_partkey AS VARCHAR))
             AS s
         FROM part),
       lab AS (
         SELECT cat_id AS dirty_id, s,
           CAST(cat_id % (length(s) - 6) + 2 AS INT) AS p
         FROM cat),
       dirty AS (
         SELECT dirty_id,
           CASE dirty_id % 4
             WHEN 0 THEN s
             WHEN 1 THEN concat(substring(s, 1, p-1), substring(s, p+1))
             WHEN 2 THEN concat(substring(s, 1, p-1), 'x',
                                substring(s, p+1))
             ELSE concat(substring(s, 1, p-1), 'x', substring(s, p+1, 1),
                         substring(s, p+3))
           END AS d
         FROM lab)
       SELECT d.dirty_id, c.cat_id,
         CAST(levenshtein(d.d, c.s) AS BIGINT) AS dist
       FROM dirty d, cat c
       WHERE abs(length(d.d) - length(c.s)) <= 2
         AND levenshtein(d.d, c.s) <= 2
       ORDER BY dirty_id, cat_id"""

  /** q138 oracle: the integer fixed-point recurrence unrolled into a
    * generated 10-stage MATERIALIZED CTE chain (materialization keeps
    * DuckDB's inliner from exponentially duplicating the per-iteration
    * subplans). Every op is `//` on nonneg integers — identical to
    * Spark's `div` — so the final ranks match bit-for-bit.
    */
  private val pageRankOracleSql: String = {
    val iters = 10
    val sb = new StringBuilder
    sb.append(
      s"""WITH eraw AS (
           SELECT o_custkey AS src, l_suppkey + 10000000 AS dst
           FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
           UNION ALL
           SELECT l_suppkey + 10000000 AS src, o_custkey AS dst
           FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
           WHERE l.l_returnflag = 'R'),
         edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM eraw),
         nodes AS MATERIALIZED (
           SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges),
         nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
         spine AS MATERIALIZED (
           SELECT nd.node, COALESCE(o.d, 0) AS d
           FROM nodes nd LEFT JOIN
             (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY 1) o
             ON nd.node = o.node),
         r0 AS MATERIALIZED (
           SELECT node, ${Graph.RankScale} // (SELECT n FROM nn) AS rank
           FROM nodes)""")
    for (i <- 0 until iters) {
      sb.append(s""",
         m$i AS MATERIALIZED (
           SELECT s.node, s.d, (r.rank * 85) // 100 AS m
           FROM r$i r JOIN spine s ON r.node = s.node),
         g$i AS MATERIALIZED (
           SELECT COALESCE(SUM(CASE WHEN d = 0 THEN m END), 0)
                    // (SELECT n FROM nn) AS share
           FROM m$i),
         i$i AS MATERIALIZED (
           SELECT e.dst AS node, SUM(m.m // m.d) AS s
           FROM edges e JOIN m$i m ON e.src = m.node
           WHERE m.d > 0 GROUP BY 1),
         r${i + 1} AS MATERIALIZED (
           SELECT nd.node,
             CAST((SELECT ${15L * Graph.RankScale} // (100 * n) FROM nn)
                  + (SELECT share FROM g$i) + COALESCE(i.s, 0) AS BIGINT)
               AS rank
           FROM nodes nd LEFT JOIN i$i i ON nd.node = i.node)""")
    }
    sb.append(s"""
       SELECT node,
         CASE WHEN node >= 10000000 THEN 'supplier' ELSE 'customer' END
           AS kind,
         rank AS rank_ppt
       FROM r$iters ORDER BY rank_ppt DESC, node LIMIT 25""")
    sb.toString
  }

  /** q140 oracle: the same `rounds` synchronous peels as a generated CTE
    * chain — degree counts over the surviving induced subgraph, drop
    * < k, repeat; final degrees over the last survivor set. All integer
    * set arithmetic, bit-replayable.
    */
  private val kCoreOracleSql: String = {
    val (k, rounds) = (30, 4)
    val sb = new StringBuilder
    sb.append(
      """WITH eraw AS (
           SELECT o_custkey AS src, l_suppkey + 10000000 AS dst
           FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         e AS MATERIALIZED (
           SELECT DISTINCT src, dst FROM (
             SELECT src, dst FROM eraw
             UNION ALL SELECT dst AS src, src AS dst FROM eraw)
           WHERE src <> dst),
         a0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM e)""")
    for (i <- 0 until rounds)
      sb.append(s""",
         d$i AS MATERIALIZED (
           SELECT e.src AS node, COUNT(*) AS c FROM e
           JOIN a$i x ON e.src = x.node JOIN a$i y ON e.dst = y.node
           GROUP BY 1),
         a${i + 1} AS MATERIALIZED (SELECT node FROM d$i WHERE c >= $k)""")
    sb.append(s""",
         core AS MATERIALIZED (
           SELECT a.node AS node, COALESCE(d.c, 0) AS degree
           FROM a$rounds a LEFT JOIN (
             SELECT e.src AS node, COUNT(*) AS c FROM e
             JOIN a$rounds x ON e.src = x.node
             JOIN a$rounds y ON e.dst = y.node
             GROUP BY 1) d ON a.node = d.node),
         spine AS MATERIALIZED (
           SELECT DISTINCT node FROM (
             SELECT src AS node FROM eraw
             UNION ALL SELECT dst AS node FROM eraw)
           WHERE node IS NOT NULL)
       SELECT s.node AS node,
         CASE WHEN s.node >= 10000000 THEN 'supplier' ELSE 'customer' END
           AS kind,
         c.node IS NOT NULL AS in_core,
         COALESCE(c.degree, -1) AS core_degree
       FROM spine s LEFT JOIN core c ON s.node = c.node
       ORDER BY s.node""")
    sb.toString
  }

  /** q149 oracle: the quadratic containment join — all ORDERED pairs
    * (containment is asymmetric), raw-string shingle sets vs the
    * engine's 64-bit hashes (parity = collision-freedom, the q24/q66
    * argument), identical int÷int IEEE division.
    */
  private val containmentOracleSql: String =
    raw"""WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
           FROM documents),
         sh AS (
           SELECT doc_id,
             CASE WHEN len(t) < 3 THEN []::VARCHAR[]
                  ELSE list_distinct(list_transform(range(1, len(t) - 1),
                         i -> concat_ws(' ', t[i], t[i+1], t[i+2])))
             END AS s
           FROM toks),
         nz AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
         prs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s)
               AS containment
           FROM nz a, nz b WHERE a.doc_id != b.doc_id)
       SELECT id_a, id_b, containment FROM prs
       WHERE containment >= 0.8 ORDER BY id_a, id_b"""

  /** q151 oracle: the quadratic containment pairs with the same strict
    * (size, id) drop order, folded to per-source kept/dropped counts.
    * Set sizes are raw-string shingle-set cardinalities == the engine's
    * hash-set sizes (collision-freedom parity).
    */
  private val subsumptionOracleSql: String =
    raw"""WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
           FROM documents),
         sh AS (
           SELECT doc_id,
             CASE WHEN len(t) < 3 THEN []::VARCHAR[]
                  ELSE list_distinct(list_transform(range(1, len(t) - 1),
                         i -> concat_ws(' ', t[i], t[i+1], t[i+2])))
             END AS s
           FROM toks),
         nz AS (SELECT doc_id, s, len(s) AS sz FROM sh WHERE len(s) > 0),
         dropped AS (
           SELECT DISTINCT a.doc_id
           FROM nz a, nz b
           WHERE a.doc_id != b.doc_id
             AND (b.sz > a.sz OR (b.sz = a.sz AND b.doc_id < a.doc_id))
             AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / a.sz
                 >= 0.8)
         SELECT d.source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN 0 ELSE 1 END)
             AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_kept
         FROM documents d LEFT JOIN dropped dr ON d.doc_id = dr.doc_id
         GROUP BY d.source ORDER BY d.source"""

  /** q141 oracle: q139's quadratic exact-Jaccard pair derivation (the
    * join the prefix filter exists to avoid) feeding the same
    * degree-orientation triangle derivation — orient small→large in
    * (degree, id) order, wedge-join on the low endpoint, close with the
    * oriented edge in either direction, count corners, report over the
    * full document spine. Pure integer arithmetic except the final
    * clustering division (identical int÷int IEEE op both engines).
    */
  /** The q141/q144/q150 shared oracle prefix: the quadratic exact-Jaccard
    * pair derivation (raw-string shingle sets — collision-freedom parity
    * with the engine's 64-bit hashes) ending in the directed pair list
    * `eraw` and the symmetrized edge list `und`.
    */
  private val jaccardGraphCtes: String =
    raw"""WITH toks AS (
         SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
         FROM documents),
       sh AS (
         SELECT doc_id,
           CASE WHEN len(t) < 3 THEN []::VARCHAR[]
                ELSE list_distinct(list_transform(range(1, len(t) - 1),
                       i -> concat_ws(' ', t[i], t[i+1], t[i+2])))
           END AS s
         FROM toks),
       nz AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
       prs AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
         FROM nz a, nz b WHERE a.doc_id < b.doc_id),
       eraw AS MATERIALIZED (
         SELECT id_a AS src, id_b AS dst FROM prs WHERE jaccard >= $simGraphThreshold),
       und AS MATERIALIZED (
         SELECT DISTINCT src, dst FROM (
           SELECT src, dst FROM eraw
           UNION ALL SELECT dst AS src, src AS dst FROM eraw)
         WHERE src <> dst)"""

  private val triangleOracleSql: String =
    jaccardGraphCtes + raw""",
       deg AS MATERIALIZED (
         SELECT src AS node, COUNT(*) AS degree FROM und GROUP BY 1),
       orient AS MATERIALIZED (
         SELECT u.src AS lo, u.dst AS hi FROM und u
         JOIN deg ds ON u.src = ds.node JOIN deg dd ON u.dst = dd.node
         WHERE ds.degree < dd.degree
            OR (ds.degree = dd.degree AND u.src < u.dst)),
       closing AS MATERIALIZED (
         SELECT lo AS v, hi AS w FROM orient
         UNION ALL SELECT hi AS v, lo AS w FROM orient),
       tris AS MATERIALIZED (
         SELECT a.lo AS x, a.hi AS v, b.hi AS w
         FROM orient a JOIN orient b ON a.lo = b.lo AND a.hi < b.hi
         JOIN closing c ON c.v = a.hi AND c.w = b.hi),
       pn AS (
         SELECT node, COUNT(*) AS triangles FROM (
           SELECT x AS node FROM tris
           UNION ALL SELECT v AS node FROM tris
           UNION ALL SELECT w AS node FROM tris) GROUP BY 1)
     SELECT dd.doc_id AS doc_id,
       COALESCE(d.degree, 0) AS degree,
       COALESCE(p.triangles, 0) AS triangles,
       CASE WHEN COALESCE(d.degree, 0) >= 2 THEN
         CAST(COALESCE(p.triangles, 0) * 2 AS DOUBLE)
           / CAST(d.degree * (d.degree - 1) AS DOUBLE)
         ELSE 0.0 END AS clustering
     FROM documents dd LEFT JOIN deg d ON dd.doc_id = d.node
     LEFT JOIN pn p ON dd.doc_id = p.node
     ORDER BY dd.doc_id"""

  /** The shared q144/q150 LPA CTE chain: the q141 similarity-graph
    * derivation + `lpaRounds` synchronous rounds (neighbor votes +
    * self-vote, exact integer counts, (count DESC, label ASC) argmax as
    * a row_number cut), ending with labels in `r<lpaRounds>` and the
    * symmetrized edge list in `und`.
    */
  private val lpaChainCtes: String = {
    val sb = new StringBuilder
    sb.append(jaccardGraphCtes)
    sb.append(""",
         r0 AS MATERIALIZED (
           SELECT DISTINCT src AS node, src AS lab FROM und)""")
    for (i <- 0 until lpaRounds) {
      sb.append(s""",
         v$i AS MATERIALIZED (
           SELECT e.dst AS node, l.lab FROM und e JOIN r$i l ON e.src = l.node
           UNION ALL SELECT node, lab FROM r$i),
         c$i AS MATERIALIZED (
           SELECT node, lab, COUNT(*) AS c FROM v$i GROUP BY 1, 2),
         r${i + 1} AS MATERIALIZED (
           SELECT node, lab FROM (
             SELECT node, lab, ROW_NUMBER() OVER (
               PARTITION BY node ORDER BY c DESC, lab) AS rn
             FROM c$i) WHERE rn = 1)""")
    }
    sb.toString
  }

  private val lpaOracleSql: String =
    lpaChainCtes + s"""
       , lab AS (SELECT node, lab FROM r$lpaRounds),
       full_ AS (
         SELECT d.doc_id, COALESCE(l.lab, d.doc_id) AS community
         FROM documents d LEFT JOIN lab l ON d.doc_id = l.node),
       sz AS (SELECT community, COUNT(*) AS csize FROM full_ GROUP BY 1)
       SELECT f.doc_id, f.community, s.csize, s.csize > 1 AS in_cluster
       FROM full_ f JOIN sz s ON f.community = s.community
       ORDER BY f.doc_id"""

  /** q150 oracle: the same LPA chain, then each community's modularity
    * contribution from DIRECTED-row counts over `und` (x_c = within-
    * community directed rows = 2·e_c, m2 = all directed rows = 2m,
    * d_c = directed rows with src in c): term = x/m2 − (d/m2)², with
    * the identical double op order and 6-dp rounding.
    */
  private val modularityOracleSql: String =
    lpaChainCtes + s"""
       , lab AS (SELECT node, lab FROM r$lpaRounds),
       m2 AS (SELECT COUNT(*) AS m2 FROM und),
       j AS (
         SELECT ls.lab AS c_src, ld.lab AS c_dst
         FROM und e JOIN lab ls ON e.src = ls.node
         JOIN lab ld ON e.dst = ld.node),
       dsum AS (SELECT c_src AS community, COUNT(*) AS d2 FROM j GROUP BY 1),
       inner_ AS (
         SELECT c_src AS community, COUNT(*) AS x2
         FROM j WHERE c_src = c_dst GROUP BY 1),
       sz AS (SELECT lab AS community, COUNT(*) AS csize FROM lab GROUP BY 1)
       SELECT s.community, s.csize,
         COALESCE(i.x2, 0) // 2 AS internal_edges,
         d.d2 AS degree_sum,
         round(CAST(COALESCE(i.x2, 0) AS DOUBLE) / m.m2
           - (CAST(d.d2 AS DOUBLE) / m.m2) * (CAST(d.d2 AS DOUBLE) / m.m2),
           6) AS q_term
       FROM sz s JOIN dsum d ON s.community = d.community
       LEFT JOIN inner_ i ON s.community = i.community
       CROSS JOIN m2 m
       ORDER BY s.community"""

  /** q145 oracle: the same strictly-ordered step chain — first view,
    * first click after it, first purchase after that — with the same
    * exact integer ppm conversions.
    */
  private val funnelOracleSql: String =
    """WITH t1 AS (
         SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
         WHERE event_type = 'view' GROUP BY 1),
       t2 AS (
         SELECT e.user_id, MIN(epoch_us(ts)) AS t2
         FROM events e JOIN t1 ON e.user_id = t1.user_id
         WHERE e.event_type = 'click' AND epoch_us(ts) > t1 GROUP BY 1),
       t3 AS (
         SELECT e.user_id, MIN(epoch_us(ts)) AS t3
         FROM events e JOIN t2 ON e.user_id = t2.user_id
         WHERE e.event_type = 'purchase' AND epoch_us(ts) > t2 GROUP BY 1),
       c AS (
         SELECT (SELECT COUNT(*) FROM t1) AS u1,
                (SELECT COUNT(*) FROM t2) AS u2,
                (SELECT COUNT(*) FROM t3) AS u3)
       SELECT * FROM (
         SELECT CAST(1 AS BIGINT) AS step, 'view' AS stage,
           CAST(u1 AS BIGINT) AS users, CAST(1000000 AS BIGINT) AS conv_ppm
         FROM c
         UNION ALL
         SELECT 2, 'click_after_view', u2,
           CASE WHEN u1 > 0 THEN u2 * 1000000 // u1 ELSE 0 END FROM c
         UNION ALL
         SELECT 3, 'purchase_after_click', u3,
           CASE WHEN u2 > 0 THEN u3 * 1000000 // u2 ELSE 0 END FROM c)
       ORDER BY step"""

  /** q146 oracle: identical integer week arithmetic on microsecond
    * epochs — floor division on non-negative values, so DuckDB's `//`
    * equals Spark's `div`.
    */
  private val cohortOracleSql: String =
    """WITH ev AS (
         SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
       first AS (
         SELECT user_id, MIN(wk) AS cohort_wk FROM ev GROUP BY 1),
       sizes AS (
         SELECT cohort_wk, COUNT(*) AS cohort_users FROM first GROUP BY 1),
       act AS (
         SELECT f.cohort_wk, e.wk - f.cohort_wk AS week_offset,
           COUNT(DISTINCT e.user_id) AS active_users
         FROM ev e JOIN first f ON e.user_id = f.user_id
         GROUP BY 1, 2)
       SELECT a.cohort_wk, a.week_offset, a.active_users, s.cohort_users,
         a.active_users * 1000000 // s.cohort_users AS retention_ppm
       FROM act a JOIN sizes s ON a.cohort_wk = s.cohort_wk
       ORDER BY a.cohort_wk, a.week_offset"""

  /** q139 oracle: THE QUADRATIC JOIN the prefix filter exists to avoid —
    * the q64 string-shingle derivation, full cross product (id_a < id_b),
    * exact ratio. Raw-string sets vs the engine's 64-bit shingle hashes:
    * parity = collision-freedom, the established q24/q66 argument. The
    * jaccard value is the same int÷int IEEE division in both engines.
    */
  private val exactJaccardOracleSql: String = exactJaccardOracleSqlOn("")

  /** The q139 oracle over an optionally-restricted document spine —
    * `where` is an empty string or a full "WHERE ..." clause (q157 uses
    * the live-docs restriction to re-derive a post-takedown graph).
    */
  private def exactJaccardOracleSqlOn(where: String): String =
    raw"""WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
           FROM documents $where),
         sh AS (
           SELECT doc_id,
             CASE WHEN len(t) < 3 THEN []::VARCHAR[]
                  ELSE list_distinct(list_transform(range(1, len(t) - 1),
                         i -> concat_ws(' ', t[i], t[i+1], t[i+2])))
             END AS s
           FROM toks),
         nz AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
         prs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
           FROM nz a, nz b WHERE a.doc_id < b.doc_id)
       SELECT id_a, id_b, jaccard FROM prs
       WHERE jaccard >= $simGraphThreshold ORDER BY id_a, id_b"""

  /** q161/q162 oracle: two from-scratch pair derivations (v2 with the
    * q104/q109 text edits) full-outer'd into the per-edge status. Shared
    * by the release-audit gate (q161, from-scratch both sides) and the
    * maintained-index delta path (q162) — both must produce the
    * identical diff.
    */
  private lazy val simGraphDiffOracleSql: String = {
    def pairs(alias: String, docsCte: String) =
      raw"""toks$alias AS (
         SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
         FROM $docsCte),
       sh$alias AS (
         SELECT doc_id,
           CASE WHEN len(t) < 3 THEN []::VARCHAR[]
                ELSE list_distinct(list_transform(range(1, len(t) - 1),
                       i -> concat_ws(' ', t[i], t[i+1], t[i+2])))
           END AS s
         FROM toks$alias),
       nz$alias AS (SELECT doc_id, s FROM sh$alias WHERE len(s) > 0),
       prs$alias AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b
         FROM nz$alias a, nz$alias b
         WHERE a.doc_id < b.doc_id
           AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / len(list_distinct(list_concat(a.s, b.s)))
               >= $simGraphThreshold)"""
    raw"""WITH v1 AS (
         SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 7),
       v2 AS (
         SELECT doc_id,
           CASE WHEN doc_id % 10 = 5 THEN text || ' v2edit'
                ELSE text END AS text
         FROM documents WHERE doc_id % 10 <> 4),
       """ + pairs("1", "v1") + ",\n       " + pairs("2", "v2") +
      raw"""
       SELECT COALESCE(p1.id_a, p2.id_a) AS id_a,
         COALESCE(p1.id_b, p2.id_b) AS id_b,
         CASE WHEN p1.id_a IS NULL THEN 'added'
              WHEN p2.id_a IS NULL THEN 'removed'
              ELSE 'kept' END AS status
       FROM prs1 p1 FULL OUTER JOIN prs2 p2
         ON p1.id_a = p2.id_a AND p1.id_b = p2.id_b
       ORDER BY id_a, id_b"""
  }

  /** q163 oracle: replays the stream's deterministic admission in SQL —
    * corpus = doc_id%3==0; the stream delivers %3==1 (batch 0) then
    * %3==2 (batch 1); admitted = per distinct non-NULL text the first
    * stream doc in (batch, doc_id) order whose text is not in the
    * corpus (bloomAdmit exact-verifies its candidates, so Bloom FPs
    * cannot change the outcome), plus NULL-text rows (admitted
    * outright, shingle-inert). The gated edge set is then the q139
    * quadratic join over corpus ∪ admitted.
    */
  private lazy val streamSimGraphOracleSql: String =
    raw"""WITH corp AS (
         SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
       strm AS (
         SELECT doc_id, text,
           CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 0 END AS b
         FROM documents WHERE doc_id % 3 <> 0),
       reps AS (
         SELECT doc_id, text FROM (
           SELECT doc_id, text,
             ROW_NUMBER() OVER (PARTITION BY text ORDER BY b, doc_id) AS rk
           FROM strm WHERE text IS NOT NULL)
         WHERE rk = 1),
       adm AS (
         SELECT r.doc_id, r.text FROM reps r
         WHERE NOT EXISTS (SELECT 1 FROM corp c WHERE c.text = r.text)
         UNION ALL
         SELECT doc_id, text FROM strm WHERE text IS NULL),
       live AS (
         SELECT doc_id, text FROM corp
         UNION ALL SELECT doc_id, text FROM adm),
       toks AS (
         SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
         FROM live),
       sh AS (
         SELECT doc_id,
           CASE WHEN len(t) < 3 THEN []::VARCHAR[]
                ELSE list_distinct(list_transform(range(1, len(t) - 1),
                       i -> concat_ws(' ', t[i], t[i+1], t[i+2])))
           END AS s
         FROM toks),
       nz AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
       prs AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
         FROM nz a, nz b WHERE a.doc_id < b.doc_id)
       SELECT id_a, id_b, jaccard FROM prs
       WHERE jaccard >= $simGraphThreshold ORDER BY id_a, id_b"""

  /** q68 oracle: re-derives the packing spans — FNV bucket (the q62
    * stream, mod 8), within-bucket running token offset as the same
    * 1-PRECEDING window sum, and the ctx-window ids via integer division.
    */
  private def packingOracleSql: String =
    fnvBucketCtes("documents", "doc_id", 17) + raw""",
         p AS (
           SELECT doc_id, CAST(b % 8 AS BIGINT) AS bucket,
             CAST(len(string_split_regex(trim(text), '[$WS]+')) AS BIGINT)
               AS n_tok
           FROM s),
         o AS (
           SELECT doc_id, bucket, n_tok,
             CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY bucket
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS off
           FROM p)
         SELECT doc_id, bucket, n_tok, off,
           bucket * 4294967296 + (off // 512) AS pack_first,
           bucket * 4294967296 + ((off + greatest(n_tok - 1, 0)) // 512)
             AS pack_last,
           ((off + greatest(n_tok - 1, 0)) // 512) - (off // 512) AS n_cuts
         FROM o ORDER BY doc_id"""

  /** q112 oracle: the next-fit fold replayed exactly — same FNV bucket
    * stream (q68's seed), same ascending-id visit order, same state
    * transition (fits → same bin, else next bin; overlong doc overflows
    * its own bin) — as a recursive CTE stepping rn → rn+1 per bucket.
    * Recursion depth = max docs per bucket (fixture-scale; the oracle
    * needn't be scale-shaped).
    */
  private def packBinsOracleSql: String =
    "WITH RECURSIVE " + fnvSignedFrom("documents", "doc_id", 17) + raw""",
         s AS (
           SELECT *, ((hs % 1000000) + 1000000) % 1000000 AS b
           FROM sg),
         p AS (
           SELECT doc_id, CAST(b % 8 AS BIGINT) AS bucket,
             CAST(len(string_split_regex(trim(text), '[$WS]+')) AS BIGINT)
               AS w
           FROM s),
         o AS (
           SELECT doc_id, bucket, w,
             row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
           FROM p),
         pack AS (
           SELECT bucket, rn, doc_id, w,
             CAST(0 AS BIGINT) AS bin,
             CAST(0 AS BIGINT) AS off,
             CAST(greatest(512 - w, 0) AS BIGINT) AS rem
           FROM o WHERE rn = 1
           UNION ALL
           SELECT o.bucket, o.rn, o.doc_id, o.w,
             CASE WHEN o.w <= pk.rem THEN pk.bin ELSE pk.bin + 1 END,
             CASE WHEN o.w <= pk.rem THEN 512 - pk.rem
                  ELSE CAST(0 AS BIGINT) END,
             CAST(CASE WHEN o.w <= pk.rem THEN greatest(pk.rem - o.w, 0)
                       ELSE greatest(512 - o.w, 0) END AS BIGINT)
           FROM pack pk JOIN o
             ON o.bucket = pk.bucket AND o.rn = pk.rn + 1)
         SELECT doc_id, bucket,
           bucket * 4294967296 + bin AS pack_id, off
         FROM pack ORDER BY doc_id"""

  /** DuckDB CTEs computing the hashSplit FNV stream: the FNV-1a-64 fold of
    * "<key>:<seed>" (HUGEINT mod-2⁶⁴ wrap exactly as the q22 oracle spells
    * it), re-signed like Java's long. Byte-faithful via [[fnvOctetsSql]]
    * (round 7): exact for ANY key string, though every fixture key is
    * all-ASCII anyway. Yields CTE `sg` = the source table plus signed
    * hash `hs` — the q74 shuffle oracle orders by it directly;
    * [[fnvBucketCtes]] adds the pmod-1e6 bucket the split/mixing oracles
    * cut on.
    */
  /** The h/sg CTE pair (unsigned octet-FNV, then the signed-BIGINT fold)
    * over an arbitrary upstream CTE/table — composable mid-chain (q86
    * hashes the q64 `comp` CTE); [[fnvSignedCtes]] is the WITH-prefixed
    * whole-table form.
    */
  private def fnvSignedFrom(source: String, keyCol: String, seed: Long): String =
    s"""h AS (
           SELECT *,
             ${fnvOctetsSql(s"CAST($keyCol AS VARCHAR) || ':$seed'")} AS hu
           FROM $source),
         sg AS (
           SELECT *,
             CAST(CASE WHEN hu >= CAST(9223372036854775808 AS UBIGINT)
                       THEN CAST(hu AS HUGEINT) - 18446744073709551616
                       ELSE CAST(hu AS HUGEINT) END AS BIGINT) AS hs
           FROM h)"""

  private def fnvSignedCtes(table: String, keyCol: String, seed: Long): String =
    "WITH " + fnvSignedFrom(table, keyCol, seed)

  private def fnvBucketCtes(table: String, keyCol: String, seed: Long): String =
    fnvSignedCtes(table, keyCol, seed) + """,
         s AS (
           SELECT *, ((hs % 1000000) + 1000000) % 1000000 AS b
           FROM sg)"""

  /** q74 oracle: re-derive the signed FNV hash per id and replay the
    * total (bucket, hs, id) order with ROW_NUMBER — the full permutation,
    * not just counts, must match. The engine's pmod on a signed long
    * equals the ((hs % n) + n) % n fold here.
    */
  private val corpusShuffleOracleSql: String =
    fnvSignedCtes("documents", "doc_id", 23) + """
         SELECT doc_id,
           ((hs % 32) + 32) % 32 AS bucket,
           CAST(ROW_NUMBER() OVER (
             ORDER BY ((hs % 32) + 32) % 32, hs, doc_id) - 1 AS BIGINT)
             AS pos
         FROM sg ORDER BY pos"""

  /** q77 chunk geometry — single source for TextFunctions.chunks' call
    * AND the oracle's arithmetic, so the two cannot drift. */
  private val chunkSize = 200
  private val chunkStride = 150

  /** q77 oracle: the identical chunk-count ceiling, offsets, substr
    * truncation, and per-chunk polynomial fold (the q27 fingerprint)
    * replayed in DuckDB with the geometry interpolated from the same
    * constants the engine uses. */
  private def docChunksOracleSql: String = {
    val overlap = chunkSize - chunkStride
    raw"""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
         nc AS (
           SELECT doc_id, text,
             greatest(1, CAST(floor((n - $overlap + ${chunkStride - 1})
               / $chunkStride.0) AS BIGINT)) AS k
           FROM d),
         c AS (
           SELECT doc_id, unnest(range(0, k)) AS chunk_id, text
           FROM nc),
         ch AS (
           SELECT doc_id, chunk_id, chunk_id * $chunkStride + 1 AS start,
             substr(text, CAST(chunk_id * $chunkStride + 1 AS INTEGER),
               $chunkSize) AS chunk
           FROM c)
         SELECT doc_id, chunk_id, start,
           CAST(length(chunk) AS BIGINT) AS chunk_len,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(chunk, ''),
                 ch2 -> CAST(ascii(ch2) AS BIGINT))),
             (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
         FROM ch ORDER BY doc_id, chunk_id"""
  }

  /** The q98/q108 shared four-stage curation chain: quality CTEs → eval
    * 8-gram decontamination → the q81 keep-best closure — ends at `surv`
    * (the kept, pre-scrub relation), with `q`/`contam`/`ranked` live for
    * stage-attribution consumers. Single-sourced so the capstone rewrite
    * (q98) and the drop-reason report (q108) can never drift apart.
    */
  private def curationChainCtes: String =
    raw"""WITH RECURSIVE q AS (
           SELECT * FROM documents
           WHERE len(string_split_regex(trim(text), '[$WS]+')) >= 30
             AND CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                   AS DOUBLE) / length(text) >= 0.8),
         evg AS (
           SELECT DISTINCT unnest(list_distinct(list_transform(
               range(1, len(t) - 6),
               i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3],
                              t[i+4], t[i+5], t[i+6], t[i+7])))) AS g
           FROM (SELECT string_split_regex(trim(text), '[$WS]+') AS t
                 FROM documents WHERE doc_id % 10 = 7)
           WHERE len(t) >= 8),
         cand AS (SELECT doc_id, text FROM q WHERE doc_id % 10 <> 7),
         candg AS (
           SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, len(t) - 6),
               i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3],
                              t[i+4], t[i+5], t[i+6], t[i+7])))) AS g
           FROM (SELECT doc_id,
                   string_split_regex(trim(text), '[$WS]+') AS t
                 FROM cand)
           WHERE len(t) >= 8),
         contam AS (SELECT DISTINCT doc_id FROM candg JOIN evg USING (g)),
         decon AS (
           SELECT doc_id, text FROM cand
           WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
         """ + componentClosureBody("decon") + raw""",
         scored AS (
           SELECT c.component, c.doc_id,
                  CAST(strlen(d.text) AS BIGINT) AS blen
           FROM comp c JOIN decon d USING (doc_id)),
         ranked AS (
           SELECT component, doc_id,
                  row_number() OVER (PARTITION BY component
                    ORDER BY blen DESC, doc_id ASC) AS rn
           FROM scored),
         surv AS (
           SELECT d.doc_id, d.text FROM decon d
           JOIN (SELECT doc_id FROM ranked WHERE rn = 1) k USING (doc_id))"""

  /** q109 oracle: the per-source KL drift re-derived in DuckDB — same v1
    * / v2 definitions as q104, same +1 smoothing over the union vocab,
    * same double-op order, 12-dp per-term rounding and DECIMAL sum.
    */
  private val tokenDriftOracleSql: String =
    raw"""WITH v1 AS (
           SELECT source, text FROM documents WHERE doc_id % 10 <> 7),
         v2 AS (
           SELECT source,
             CASE WHEN doc_id % 10 = 5 THEN text || ' v2edit'
                  ELSE text END AS text
           FROM documents WHERE doc_id % 10 <> 4),
         t1 AS (
           SELECT source, tok, COUNT(*) AS c1
           FROM (SELECT source, unnest(string_split_regex(trim(text),
                   '[$WS]+')) AS tok FROM v1)
           GROUP BY source, tok),
         t2 AS (
           SELECT source, tok, COUNT(*) AS c2
           FROM (SELECT source, unnest(string_split_regex(trim(text),
                   '[$WS]+')) AS tok FROM v2)
           GROUP BY source, tok),
         j AS (
           SELECT COALESCE(t1.source, t2.source) AS source,
                  COALESCE(t1.tok, t2.tok) AS tok,
                  COALESCE(c1, 0) AS c1, COALESCE(c2, 0) AS c2
           FROM t1 FULL OUTER JOIN t2
             ON t1.source = t2.source AND t1.tok = t2.tok),
         stats AS (
           SELECT source, SUM(c1) AS n1, SUM(c2) AS n2, COUNT(*) AS v
           FROM j GROUP BY source),
         terms AS (
           SELECT j.source,
             round(((c1 + 1.0) / (n1 + v)) *
               ln(((c1 + 1.0) / (n1 + v)) / ((c2 + 1.0) / (n2 + v))), 12)
               AS term
           FROM j JOIN stats USING (source))
         SELECT s.source, CAST(s.n1 AS BIGINT) AS n1,
           CAST(s.n2 AS BIGINT) AS n2, CAST(s.v AS BIGINT) AS v,
           round(CAST(SUM(CAST(t.term AS DECIMAL(28,12))) AS DOUBLE), 6)
             AS kl
         FROM terms t JOIN stats s USING (source)
         GROUP BY s.source, s.n1, s.n2, s.v
         ORDER BY s.source"""

  /** q75 oracle: bottom-k by the re-derived signed FNV priority (ties by
    * id), then the outer ORDER BY restores the engine's doc_id order. */
  private val prioritySampleOracleSql: String =
    fnvSignedCtes("documents", "doc_id", 29) + """
         SELECT doc_id, source FROM (
           SELECT doc_id, source FROM sg
           ORDER BY hs, doc_id LIMIT 100)
         ORDER BY doc_id"""

  /** q105 oracle: per-lang bottom-k on the same FNV stream, ranked on the
    * DOUBLE image of the signed hash exactly as the engine's topKByScore
    * compares (score = −CAST(hs AS DOUBLE), ties by doc_id ASC).
    */
  private val groupedSampleOracleSql: String =
    fnvSignedCtes("documents", "doc_id", 31) + """,
         r AS (
           SELECT lang, doc_id, ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY CAST(hs AS DOUBLE) ASC, doc_id) AS rank
           FROM sg)
         SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id
         FROM r WHERE rank <= 20
         ORDER BY lang, rank"""

  /** q62 oracle: re-derive the bucket per id and reproduce the FULL
    * train/test assignment. */
  /** Shared oracle prefix: the q64 3-gram-Jaccard near-dup closure —
    * RECURSIVE reachability over the >=0.8 pair edges, components labeled
    * by min doc_id. q64/q81/q86 all build on this one definition so the
    * three oracles cannot drift apart.
    */
  /** The q81/q86/q98 connected-component closure over an arbitrary base
    * relation (doc_id, text): quadratic 3-token-shingle Jaccard pairs,
    * symmetric edges, recursive reachability, component = MIN reachable
    * id. Callers embed after `WITH RECURSIVE`.
    */
  private def componentClosureBody(base: String,
                                   threshold: Double = 0.8): String =
    raw"""toks AS (
           SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
           FROM $base),
         sh AS (
           SELECT doc_id,
             CASE WHEN len(t) < 3 THEN []::VARCHAR[]
                  ELSE list_distinct(list_transform(range(1, len(t) - 1),
                         i -> concat_ws(' ', t[i], t[i+1], t[i+2])))
             END AS s
           FROM toks),
         nz AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
         prs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM nz a, nz b
           WHERE a.doc_id < b.doc_id
             AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.s, b.s))) >= $threshold),
         edges AS (
           SELECT id_a AS u, id_b AS v FROM prs
           UNION
           SELECT id_b AS u, id_a AS v FROM prs),
         reach AS (
           SELECT doc_id AS src, doc_id AS dst FROM $base
           UNION
           SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
         comp AS (
           SELECT src AS doc_id, MIN(dst) AS component
           FROM reach GROUP BY src)"""

  private val componentClosureCtes: String =
    "WITH RECURSIVE " + componentClosureBody("documents")

  /** q85 oracle: the Morton fold as a CTE chain — one CTE per
    * [[graft.functions.LayoutFunctions.spreadSteps]] entry, constants
    * INTERPOLATED from that single source so the two engines' z-values
    * cannot drift. Each step is the same overflow-free rewrite the Column
    * fold uses: `((v & (m>>>s)) << s) | (v & m)`, masked before shifted so
    * nothing crosses bit 62 (DuckDB BIGINT stays in-lane, like Spark's).
    */
  private def zorderOracleSql: String = {
    val steps = graft.functions.LayoutFunctions.spreadSteps
    val chain = steps.zipWithIndex.map { case ((sh, m), i) =>
      s"""z${i + 1} AS (
           SELECT l_orderkey, l_linenumber, x, y,
             (((zx & ${m >>> sh}) << $sh) | (zx & $m)) AS zx,
             (((zy & ${m >>> sh}) << $sh) | (zy & $m)) AS zy
           FROM z$i)"""
    }.mkString(",\n         ")
    s"""WITH sc AS (
           SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             ((l_orderkey % 2147483648) * 2654435761) % 2147483648 AS x,
             ((l_partkey % 2147483648) * 2246822519) % 2147483648 AS y
           FROM lineitem),
         z0 AS (SELECT l_orderkey, l_linenumber, x, y, x AS zx, y AS zy
                FROM sc),
         $chain
         SELECT l_orderkey, l_linenumber, x, y,
           (zx | (zy << 1)) AS z,
           (zx | (zy << 1)) >> 46 AS tile
         FROM z${steps.size}
         ORDER BY z, l_orderkey, l_linenumber"""
  }

  private val hashSplitOracleSql: String =
    fnvBucketCtes("orders", "o_orderkey", 40) + """
         SELECT o_orderkey,
           CASE WHEN b < 700000 THEN 'train' ELSE 'test' END AS side
         FROM s ORDER BY o_orderkey"""

  /** q36 oracle: stratifiedSplit rides the same single-sourced FNV stream
    * (Relational.stratifiedSplit), so per-stratum train/test counts are a
    * pure function of (o_orderkey, seed) DuckDB re-derives independently —
    * upgraded round 6 from rows-only/golden to a full oracle. */
  private val stratifiedSplitOracleSql: String =
    fnvBucketCtes("orders", "o_orderkey", 40) + """
         SELECT o_orderstatus,
           CAST(SUM(CASE WHEN b < 700000 THEN 1 ELSE 0 END) AS BIGINT)
             AS train_cnt,
           CAST(SUM(CASE WHEN b >= 700000 THEN 1 ELSE 0 END) AS BIGINT)
             AS test_cnt
         FROM s GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** Top-3 users per event type — shared by q02 (window plan) and q58 (the
    * same query under the opt-in bounded-heap rewrite).
    */
  private val topUsersSql: String =
    """SELECT event_type, user_id, cnt, rn FROM (
           SELECT event_type, user_id, COUNT(*) AS cnt,
                  ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY COUNT(*) DESC, user_id) AS rn
           FROM events GROUP BY event_type, user_id)
         WHERE rn <= 3 ORDER BY event_type, rn"""

  /** q158's entropy / dominant / mixed arithmetic — ONE textual form
    * `expr()`-ed on the engine side and interpolated into the DuckDB
    * oracle, so the two engines cannot drift an operator or a term
    * order. Operates on the named count columns.
    */
  private val scriptEntropyExpr: String = {
    def t(c: String) =
      s"(CASE WHEN $c = 0 THEN 0.0 ELSE " +
        s"(CAST($c AS DOUBLE)/n) * ln(CAST($c AS DOUBLE)/n) END)"
    "round(-(" + Seq("n_latin", "n_cjk", "n_cyrillic", "n_greek",
      "n_digit", "n_space", "n_other").map(t).mkString(" + ") + "), 6)"
  }

  private val dominantScriptExpr: String =
    """CASE greatest(n_latin, n_cjk, n_cyrillic, n_greek, n_digit,
                     n_space, n_other)
         WHEN n_latin THEN 'latin' WHEN n_cjk THEN 'cjk'
         WHEN n_cyrillic THEN 'cyrillic' WHEN n_greek THEN 'greek'
         WHEN n_digit THEN 'digit' WHEN n_space THEN 'space'
         ELSE 'other' END"""

  private val mixedScriptExpr: String =
    """element_at(array_sort(array(n_latin, n_cjk, n_cyrillic, n_greek)), 3)
         >= greatest(5, (n + 19) div 20)"""

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
         COUNT(*) AS cnt
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_top_users_per_type" -> topUsersSql,
    "q58_topk_rewrite" -> topUsersSql,
    "q03_status_distribution" ->
      """SELECT o_orderstatus, COUNT(*) AS cnt,
         CAST(COUNT(*) AS DOUBLE) * 100 / SUM(COUNT(*)) OVER () AS pct
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q04_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_discount > 0.05
         ORDER BY l_orderkey, l_linenumber""",
    "q05_revenue_by_nation" ->
      """SELECT r_name, n_name, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q06_name_token_count" ->
      """SELECT token, COUNT(*) AS cnt FROM (
           SELECT unnest(string_split(p_name, ' ')) AS token FROM part
         ) t GROUP BY token
         ORDER BY cnt DESC, token LIMIT 10""",
    "q07_temporal_prefix" ->
      """SELECT event_id, user_id, event_type FROM (
           SELECT * FROM events ORDER BY ts, event_id LIMIT 100)
         ORDER BY event_id""",
    "q08_except_users" ->
      """SELECT DISTINCT user_id FROM events
         EXCEPT
         SELECT DISTINCT user_id FROM events
         WHERE event_type = 'purchase' AND value > 195
         ORDER BY user_id""",
    "q09_union_status" ->
      """SELECT o_orderstatus, COUNT(*) AS cnt FROM (
           SELECT * FROM orders WHERE o_totalprice > 200000
           UNION ALL
           SELECT * FROM orders WHERE o_orderstatus = 'F')
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q10_distinct_nation" ->
      """SELECT DISTINCT n_name FROM customer
         JOIN nation ON c_nationkey = n_nationkey ORDER BY n_name""",
    "q11_customers_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_totalprice > 450000)
         ORDER BY c_custkey""",
    "q12_customers_big_orders" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 300000)
         ORDER BY c_custkey""",
    "q13_regex_first_word" ->
      """SELECT regexp_extract(text, '^([a-z]+)', 1) AS word, COUNT(*) AS cnt
         FROM documents GROUP BY 1 ORDER BY cnt DESC, word""",
    "q14_case_when_log" ->
      """SELECT high_disc, COUNT(*) AS cnt,
             MIN(log_qty) AS min_log_qty, MAX(log_qty) AS max_log_qty,
             CAST(SUM(CAST(pp_qty AS DECIMAL(28,4))) AS DOUBLE) AS sum_pp_qty
         FROM (
           SELECT CASE WHEN l_discount > 0.05 THEN CAST(1 AS DOUBLE)
                       ELSE CAST(0 AS DOUBLE) END AS high_disc,
                  CASE WHEN l_quantity = 0 THEN 0.5 ELSE l_quantity END AS pp_qty,
                  ROUND(LN(CASE WHEN l_quantity = 0 THEN 0.5 ELSE l_quantity END), 6) AS log_qty
           FROM lineitem)
         GROUP BY high_disc ORDER BY high_disc""",
    "q15_last_token" ->
      """SELECT list_extract(string_split(p_name, ' '),
                             len(string_split(p_name, ' '))) AS tok,
             COUNT(*) AS cnt
         FROM part GROUP BY tok ORDER BY cnt DESC, tok""",
    "q16_day_hour_heatmap" ->
      """SELECT date_part('day', ts) AS d, date_part('hour', ts) AS h,
             COUNT(*) AS cnt
         FROM events GROUP BY d, h ORDER BY d, h""",
    "q17_global_stats" ->
      """SELECT COUNT(*) AS cnt, COUNT(DISTINCT user_id) AS users,
             MIN(value) AS v_min, MAX(value) AS v_max,
             CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS v_sum
         FROM events""",
    "q18_hourly_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
             event_type, COUNT(*) AS cnt,
             CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS v_sum
         FROM events GROUP BY win_start, event_type
         ORDER BY win_start, event_type""",
    "q48_sliding_window" ->
      """SELECT strftime(make_timestamp(
               (epoch_us(ts) // 900000000 - i) * 900000000),
               '%Y-%m-%d %H:%M:%S') AS win_start,
             event_type, COUNT(*) AS cnt
         FROM events, range(0, 4) r(i)
         GROUP BY win_start, event_type
         ORDER BY win_start, event_type""",
    "q49_sessionize" ->
      """WITH t AS (
           SELECT user_id, event_id, epoch_us(ts) AS tus,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000000 THEN 1 ELSE 0 END AS new_sess
           FROM events),
         s AS (
           SELECT user_id, tus,
             SUM(new_sess) OVER (PARTITION BY user_id
               ORDER BY tus, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
           FROM t)
         SELECT user_id, CAST(sess AS BIGINT) AS sess,
             COUNT(*) AS n_events,
             MAX(tus) - MIN(tus) AS duration_us
         FROM s GROUP BY user_id, sess ORDER BY user_id, sess""",
    "q158_script_mix" -> {
      val duckMixed = mixedScriptExpr
        .replace("element_at(array_sort(array(", "list_sort([")
        .replace(")), 3)", "])[3]")
        .replace("(n + 19) div 20", "(n + 19) // 20")
      raw"""WITH counted AS (
           SELECT doc_id, length(text) AS n,
             length(text) - length(regexp_replace(text,
               '[\p{Latin}]', '', 'g')) AS n_latin,
             length(text) - length(regexp_replace(text,
               '[\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}]', '', 'g'))
               AS n_cjk,
             length(text) - length(regexp_replace(text,
               '[\p{Cyrillic}]', '', 'g')) AS n_cyrillic,
             length(text) - length(regexp_replace(text,
               '[\p{Greek}]', '', 'g')) AS n_greek,
             length(text) - length(regexp_replace(text,
               '[0-9]', '', 'g')) AS n_digit,
             length(text) - length(regexp_replace(text,
               '[\s]', '', 'g')) AS n_space
           FROM documents WHERE length(text) > 0),
         fullc AS (
           SELECT *, n - n_latin - n_cjk - n_cyrillic - n_greek
             - n_digit - n_space AS n_other
           FROM counted)
         SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n AS BIGINT) AS n_chars,
           CAST(n_latin AS BIGINT) AS n_latin,
           CAST(n_cjk AS BIGINT) AS n_cjk,
           CAST(n_cyrillic AS BIGINT) AS n_cyrillic,
           CAST(n_greek AS BIGINT) AS n_greek,
           CAST(n_digit AS BIGINT) AS n_digit,
           CAST(n_space AS BIGINT) AS n_space,
           CAST(n_other AS BIGINT) AS n_other,
           $scriptEntropyExpr AS script_entropy,
           $dominantScriptExpr AS dominant_script,
           $duckMixed AS is_mixed
         FROM fullc ORDER BY doc_id"""
    },
    "q156_session_transitions" ->
      """WITH t AS (
           SELECT user_id, event_id, ts, event_type, epoch_us(ts) AS tus,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000000 THEN 1 ELSE 0 END AS new_sess
           FROM events),
         s AS (
           SELECT user_id, event_id, ts, event_type,
             SUM(new_sess) OVER (PARTITION BY user_id
               ORDER BY tus, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
           FROM t),
         tr AS (
           SELECT event_type AS from_type,
             lead(event_type, 1) OVER (PARTITION BY user_id, sess
               ORDER BY ts, event_id) AS to_type
           FROM s),
         cnt AS (
           SELECT from_type, to_type, COUNT(*) AS n_trans
           FROM tr WHERE to_type IS NOT NULL
           GROUP BY from_type, to_type),
         tot AS (
           SELECT from_type, SUM(n_trans) AS n_from
           FROM cnt GROUP BY from_type)
         SELECT c.from_type, c.to_type, c.n_trans,
           CAST(c.n_trans * 1000000 // t.n_from AS BIGINT) AS p_ppm
         FROM cnt c JOIN tot t USING (from_type)
         ORDER BY c.from_type, c.to_type""",
    "q19_dedup_exact" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS copies
         FROM documents GROUP BY text ORDER BY keep_id""",
    "q20_text_quality" ->
      """SELECT doc_id, length(text) AS n_chars_m,
             len(string_split(trim(text), ' ')) AS n_words,
             (length(text) - length(replace(text, 'the', ''))) // 3 AS n_the
         FROM documents ORDER BY doc_id""",
    "q21_token_stats" ->
      """SELECT lang, COUNT(*) AS docs, CAST(SUM(n_tok) AS BIGINT) AS tot_tokens,
             CAST(SUM(n_tok) AS DOUBLE) / COUNT(*) AS avg_tokens
         FROM (SELECT lang, len(string_split(trim(text), ' ')) AS n_tok
               FROM documents)
         GROUP BY lang ORDER BY lang""",
    // Repetition signals re-derived: grams via 1-indexed range+concat
    // (DuckDB) vs sequence+slice (engine) — same ' '-joined strings, so
    // dup fractions agree exactly; top-token via the same two-level agg.
    "q63_repetition_signals" ->
      raw"""WITH base AS (
             SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
             FROM documents),
           grams AS (
             SELECT doc_id,
               list_transform(range(1, len(t)),
                 i -> t[i] || ' ' || t[i+1]) AS g2,
               list_transform(range(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS g3
             FROM base),
           rep AS (
             SELECT doc_id,
               CASE WHEN len(g2) = 0 THEN 0.0 ELSE
                 CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2)
               END AS dup_2gram_frac,
               CASE WHEN len(g3) = 0 THEN 0.0 ELSE
                 CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
               END AS dup_3gram_frac
             FROM grams),
           cnt AS (
             SELECT doc_id, tok, COUNT(*) AS c
             FROM (SELECT doc_id, unnest(t) AS tok FROM base)
             GROUP BY doc_id, tok),
           top AS (
             SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_token_frac
             FROM cnt GROUP BY doc_id)
         SELECT r.doc_id, r.dup_2gram_frac, r.dup_3gram_frac,
                t.top_token_frac
         FROM rep r JOIN top t USING (doc_id) ORDER BY doc_id""",
    // Full quadratic signature est-jaccard — banding must lose no pair.
    "q22_dedup_minhash" -> minhashOracleSql,
    // engineered-recall geometry, same quadratic oracle at the kernel's
    // own k = 2·bandsFor(0.5, 2) — never hardcoded, so a bandsFor change
    // cannot silently desynchronize engine and oracle
    "q80_dedup_minhash_geared" ->
      minhashOracleSqlFor(2 * graft.operators.Dedup.bandsFor(0.5, 2)),
    // Independent winnow re-derivation incl. signed window-min semantics.
    "q47_winnow_overlap" -> winnowOracleSql,
    // Full quadratic hamming — pigeonhole blocking must lose no pair.
    "q23_dedup_simhash" -> simhashOracleSql,
    // Marker-argmax re-derivation; markers single-sourced from the engine.
    "q28_langid" -> langidOracleSql,
    // Raw-string gram join (the engine joins FNV-64 hashes; parity =
    // 64-bit collision-freedom, the q24 argument).
    "q66_decontamination" ->
      raw"""WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
           FROM documents),
         grams AS (
           SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, len(t) - 6),
               i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3],
                              t[i+4], t[i+5], t[i+6], t[i+7])))) AS g
           FROM toks WHERE len(t) >= 8),
         ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 7),
         tr AS (SELECT * FROM grams WHERE doc_id % 10 != 7),
         tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM tr GROUP BY doc_id),
         hit AS (SELECT doc_id, COUNT(*) AS n_overlap
                 FROM tr JOIN ev USING (g) GROUP BY doc_id)
         SELECT h.doc_id, h.n_overlap, t2.n_grams,
           round(CAST(h.n_overlap AS DOUBLE) / t2.n_grams, 4) AS overlap_frac
         FROM hit h JOIN tot t2 USING (doc_id)
         ORDER BY h.doc_id""",
    // Raw-string self-join re-derivation of the hashed-gram pipeline; docs
    // with zero shared grams must still appear (LEFT JOIN + coalesce,
    // matching the engine's left_outer).
    "q71_dup_passages" ->
      raw"""WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
           FROM documents),
         grams AS (
           SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, len(t) - 6),
               i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3],
                              t[i+4], t[i+5], t[i+6], t[i+7])))) AS g
           FROM toks WHERE len(t) >= 8),
         dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) >= 2),
         tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
         hit AS (SELECT doc_id, COUNT(*) AS n_dup
                 FROM grams JOIN dup USING (g) GROUP BY doc_id)
         SELECT t2.doc_id, CAST(coalesce(h.n_dup, 0) AS BIGINT) AS n_dup,
           t2.n_grams,
           round(CAST(coalesce(h.n_dup, 0) AS DOUBLE) / t2.n_grams, 4)
             AS dup_frac
         FROM tot t2 LEFT JOIN hit h USING (doc_id)
         ORDER BY t2.doc_id""",
    "q72_pii_redaction" -> piiOracleSql,
    // Same float→double widening, same single floor expression, all-integer
    // outputs; SUM casts back from DuckDB's HUGEINT to BIGINT.
    "q73_embed_quantize" ->
      """WITH comps AS (
           SELECT vec_id, unnest(embedding) AS x,
             generate_subscripts(embedding, 1) AS pos
           FROM embeddings),
         r AS (SELECT pos, min(x) AS lo, max(x) AS hi
               FROM comps GROUP BY pos),
         q AS (
           SELECT vec_id,
             CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
                  ELSE CAST(floor((CAST(x AS DOUBLE) - CAST(lo AS DOUBLE)) /
                         (CAST(hi AS DOUBLE) - CAST(lo AS DOUBLE)) * 255.0
                         + 0.5) AS BIGINT) - 128
             END AS qv
           FROM comps JOIN r USING (pos))
         SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS dim,
           CAST(SUM(qv) AS BIGINT) AS q_sum,
           CAST(MIN(qv) AS BIGINT) AS q_min,
           CAST(MAX(qv) AS BIGINT) AS q_max
         FROM q GROUP BY vec_id ORDER BY vec_id""",
    // Every filter signal re-derived in DuckDB; stop list single-sourced
    // from TextFunctions.gopherStops (apostrophes escaped like q28's).
    "q65_quality_filter" -> {
      val stops = TextFunctions.gopherStops
        .map(s0 => s"'${s0.replace("'", "''")}'").mkString(",")
      raw"""WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
           FROM documents),
         m AS (
           SELECT doc_id,
             CAST(len(t) AS BIGINT) AS wc,
             round(CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE)
               / len(t), 4) AS mean_wlen,
             round(CAST(len(list_filter(t,
                 x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
               / len(t), 4) AS alpha_frac,
             CAST(len(list_filter([$stops],
                 s -> list_contains(list_transform(t, x -> lower(x)), s)))
               AS BIGINT) AS stop_cnt
           FROM toks)
         SELECT doc_id, wc, mean_wlen, alpha_frac, stop_cnt,
           (wc BETWEEN 50 AND 100000) AND (mean_wlen BETWEEN 3.0 AND 10.0)
             AND alpha_frac >= 0.8 AND stop_cnt >= 2 AS keep
         FROM m ORDER BY doc_id"""
    },
    // Full quadratic n-gram jaccard — checks that the LSH path loses no pair.
    "q24_dedup_jaccard" ->
      raw"""WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
           FROM documents),
         sh AS (
           SELECT doc_id,
             CASE WHEN len(t) < 3 THEN []::VARCHAR[]
                  ELSE list_distinct(list_transform(range(1, len(t) - 1),
                         i -> concat_ws(' ', t[i], t[i+1], t[i+2])))
             END AS s
           FROM toks)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
         FROM sh a, sh b
         WHERE a.doc_id < b.doc_id
           AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
         ORDER BY id_a, id_b""",
    // Transitive closure of the q24 pair graph via a RECURSIVE reachability
    // CTE: component = MIN reachable doc_id (singletons = own id). The
    // engine's O(log d)-round iterative labels must reproduce the true
    // closure exactly — this checks transitivity cases (A~B~C, no A~C)
    // that the pairwise oracles structurally cannot.
    "q64_dedup_components" ->
      (componentClosureCtes + raw""",
         sizes AS (
           SELECT component, COUNT(*) AS csize FROM comp GROUP BY component)
         SELECT c.doc_id, c.component, z.csize
         FROM comp c JOIN sizes z USING (component)
         ORDER BY c.doc_id"""),
    // q119: the q64 closure, then the same double group — cluster sizes,
    // clusters per size, docs per size.
    "q119_cluster_sizes" ->
      (componentClosureCtes + raw""",
         cs AS (
           SELECT component, COUNT(*) AS csize FROM comp GROUP BY component)
         SELECT CAST(csize AS BIGINT) AS csize,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(csize * COUNT(*) AS BIGINT) AS n_docs
         FROM cs GROUP BY csize ORDER BY csize"""),
    // Same RECURSIVE closure as q64, then the keep-best argmax re-derived
    // as a ranked window (strlen = DuckDB byte length, matching the
    // engine's octet_length ranking; doc_id tiebreak).
    "q81_dedup_keep_best" ->
      (componentClosureCtes + raw""",
         scored AS (
           SELECT c.component, c.doc_id,
                  CAST(strlen(d.text) AS BIGINT) AS blen
           FROM comp c JOIN documents d USING (doc_id)),
         ranked AS (
           SELECT component, doc_id, blen,
                  row_number() OVER (PARTITION BY component
                    ORDER BY blen DESC, doc_id ASC) AS rn,
                  COUNT(*) OVER (PARTITION BY component) AS csize
           FROM scored)
         SELECT component, doc_id AS keep_id, CAST(csize AS BIGINT) AS csize,
                blen AS keep_octets
         FROM ranked WHERE rn = 1 ORDER BY component"""),
    // Same closure, then the q62 bucket fold applied to the COMPONENT id:
    // octet-FNV of "<component>:71" -> signed fold -> bucket < 900000.
    // Proves group-atomicity independently: every doc in a component gets
    // the identical side because the hash input is the component, not the
    // doc.
    "q86_leakage_safe_split" ->
      (componentClosureCtes + ",\n         " +
        fnvSignedFrom("comp", "component", 71) + raw"""
         SELECT doc_id, component,
           CASE WHEN ((hs % 1000000) + 1000000) % 1000000 < 900000
                THEN 'train' ELSE 'test' END AS side
         FROM sg ORDER BY doc_id"""),
    "q85_zorder_key" -> zorderOracleSql,
    // Full quadratic corpus × shard Jaccard, then NOT IN — proves the
    // broadcast band blocking + left-anti admitted exactly the non-dup
    // shard (miss bound 4e-8 structural, same as q84).
    "q89_incremental_ingest" -> incrementalIngestOracleSql,
    // q110 probes the PERSISTED band index instead of re-sketching the
    // corpus — identical geometry, identical admission, so the oracle is
    // q89's quadratic ground truth verbatim.
    "q110_lsh_index_ingest" -> incrementalIngestOracleSql,
    // q123: the same quadratic ground truth over the REDUCED corpus —
    // the deleted %20=5 docs must behave as if never indexed, so their
    // shard twins admit while kept docs' twins still reject.
    "q123_lsh_index_delete" ->
      ingestOracleSql("doc_id % 10 <> 7 AND doc_id % 20 <> 5"),
    // The read-through gate's oracle runs the box aggregate over the
    // ORIGINAL fixture — agreement proves the z-order rewrite is a pure
    // relayout (no row lost, duplicated, or mutated).
    "q90_zorder_scan" ->
      """SELECT l_suppkey, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS qty
         FROM lineitem
         WHERE l_partkey BETWEEN 20 AND 120
           AND l_suppkey BETWEEN 3 AND 7
         GROUP BY l_suppkey ORDER BY l_suppkey""",
    // Full quadratic corpus × eval cosine with the twin blend reproduced
    // element-for-element (the q61 derivation on the %10=3 slice).
    "q88_semantic_decontam" ->
      """WITH b AS (
           SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         corpus AS (SELECT vec_id, v FROM b WHERE vec_id % 10 <> 7),
         ev AS (
           SELECT vec_id + 3000000 AS vec_id,
             list_transform(range(1, 65),
               i -> (1 - a) * v[i] + a * v[1 + (i % 64)]) AS v
           FROM (SELECT vec_id, v, CAST(vec_id % 8 AS DOUBLE) / 20 AS a
                 FROM b WHERE vec_id % 10 = 3)),
         nc AS (
           SELECT vec_id, v,
             sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, len(v)+1), i -> v[i] * v[i])),
               (acc, x) -> acc + x)) AS nrm
           FROM corpus),
         ne AS (
           SELECT vec_id, v,
             sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, len(v)+1), i -> v[i] * v[i])),
               (acc, x) -> acc + x)) AS nrm
           FROM ev)
         SELECT id_a, id_b, sim FROM (
           SELECT a.vec_id AS id_a, e.vec_id AS id_b,
             round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, len(a.v)+1), i -> a.v[i] * e.v[i])),
               (acc, x) -> acc + x) / (a.nrm * e.nrm), 6) AS sim
           FROM nc a, ne e)
         WHERE sim >= 0.9 ORDER BY id_a, id_b""",
    // Full quadratic corpus × eval shingle-Jaccard — proves the broadcast
    // band blocking lost no pair at θ=0.8 (miss bound 4e-8 structural).
    "q84_fuzzy_decontam" ->
      raw"""WITH corpus AS (
           SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 7),
         ev AS (
           SELECT doc_id + 3000000 AS doc_id, text || ' zzevaltail' AS text
           FROM documents WHERE doc_id % 10 = 3),
         shc AS (
           SELECT doc_id, t,
             CASE WHEN len(t) < 3 THEN []::VARCHAR[]
                  ELSE list_distinct(list_transform(range(1, len(t) - 1),
                         i -> concat_ws(' ', t[i], t[i+1], t[i+2])))
             END AS s
           FROM (SELECT doc_id,
                   string_split_regex(trim(text), '[$WS]+') AS t
                 FROM corpus)),
         she AS (
           SELECT doc_id, t,
             CASE WHEN len(t) < 3 THEN []::VARCHAR[]
                  ELSE list_distinct(list_transform(range(1, len(t) - 1),
                         i -> concat_ws(' ', t[i], t[i+1], t[i+2])))
             END AS s
           FROM (SELECT doc_id,
                   string_split_regex(trim(text), '[$WS]+') AS t
                 FROM ev)),
         pairs AS (
           -- empty-set guard: two sub-3-token docs give 0/0 = NaN, which
           -- DuckDB orders ABOVE all values (j >= 0.8 would keep it) while
           -- Spark's division yields NULL and drops it — match Spark's
           -- NULL-drop semantics by excluding empty shingle sets up front
           SELECT c.doc_id AS id_a, e.doc_id AS id_b,
             CAST(len(list_intersect(c.s, e.s)) AS DOUBLE)
               / len(list_distinct(list_concat(c.s, e.s))) AS j
           FROM shc c, she e
           WHERE len(c.s) > 0 AND len(e.s) > 0)
         SELECT id_a AS doc_id, COUNT(*) AS n_eval_matches,
                MAX(j) AS max_jaccard
         FROM pairs WHERE j >= 0.8
         GROUP BY id_a ORDER BY doc_id""",
    // q81's keep-best chain and q86's component-keyed FNV fold fused over
    // ONE closure — the oracle of the shared-label pipeline.
    "q87_curation_pipeline" ->
      (componentClosureCtes + raw""",
         scored AS (
           SELECT c.component, c.doc_id,
                  CAST(strlen(d.text) AS BIGINT) AS blen
           FROM comp c JOIN documents d USING (doc_id)),
         ranked AS (
           SELECT component, doc_id, blen,
                  row_number() OVER (PARTITION BY component
                    ORDER BY blen DESC, doc_id ASC) AS rn,
                  COUNT(*) OVER (PARTITION BY component) AS csize
           FROM scored),
         best AS (
           SELECT component, doc_id AS keep_id, CAST(csize AS BIGINT) AS csize,
                  blen AS keep_octets
           FROM ranked WHERE rn = 1),
         """ + fnvSignedFrom("best", "component", 71) + raw"""
         SELECT component, keep_id, csize, keep_octets,
           CASE WHEN ((hs % 1000000) + 1000000) % 1000000 < 900000
                THEN 'train' ELSE 'test' END AS side
         FROM sg ORDER BY component"""),
    // The sketch is an implementation detail with a proven no-miss bound at
    // this (k, φ) geometry, so the oracle is simply the exact heavy-hitter
    // query: tokens with count ≥ max(1, N div 1000).
    "q82_heavy_hitters" ->
      raw"""WITH toks AS (
           SELECT unnest(string_split_regex(trim(text), '[$WS]+')) AS tok
           FROM documents),
         tot AS (SELECT COUNT(*) AS n FROM toks),
         cnt AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok)
         SELECT c.tok, CAST(c.cnt AS BIGINT) AS cnt
         FROM cnt c, tot t
         WHERE c.cnt >= greatest(1, t.n // 1000)
         ORDER BY cnt DESC, tok ASC""",
    // Same planted decomposition (chr(769) = U+0301 combining acute),
    // then DuckDB's own nfc_normalize — both engines implement Unicode
    // canonical composition, which the standard freezes for assigned code
    // points, so lengths AND the composed prefix bytes must agree.
    "q83_nfc_normalize" ->
      raw"""WITH d AS (
           SELECT doc_id,
                  regexp_replace(text, 'a', 'a' || chr(769), 'g') AS dec
           FROM documents),
         n AS (
           SELECT doc_id, length(dec) AS decomp_chars,
                  nfc_normalize(dec) AS norm
           FROM d)
         SELECT doc_id, CAST(decomp_chars AS BIGINT) AS decomp_chars,
                CAST(length(norm) AS BIGINT) AS norm_chars,
                CAST(strlen(norm) AS BIGINT) AS norm_octets,
                substr(norm, 1, 40) AS prefix
         FROM n ORDER BY doc_id""",
    // Same planted composed/decomposed twins (chr(225) = U+00E1,
    // chr(769) = U+0301), same NFC key: the grouping — WHICH spellings
    // collapse, which keep_id wins, the byte length of the canonical key —
    // must agree exactly with the engine's normalized-key dedup.
    "q83b_dedup_normalized" ->
      raw"""WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000,
                  regexp_replace(text, 'a', chr(225), 'g') FROM documents
           UNION ALL
           SELECT doc_id + 2000000,
                  regexp_replace(text, 'a', 'a' || chr(769), 'g')
           FROM documents),
         n AS (SELECT doc_id, nfc_normalize(text) AS k FROM corpus)
         SELECT MIN(doc_id) AS keep_id, COUNT(*) AS copies,
                CAST(strlen(k) AS BIGINT) AS key_octets
         FROM n GROUP BY k ORDER BY keep_id""",
    "q45_dedup_apply" ->
      raw"""WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
           FROM documents),
         sh AS (
           SELECT doc_id,
             CASE WHEN len(t) < 3 THEN []::VARCHAR[]
                  ELSE list_distinct(list_transform(range(1, len(t) - 1),
                         i -> concat_ws(' ', t[i], t[i+1], t[i+2])))
             END AS s
           FROM toks),
         dups AS (
           SELECT DISTINCT b.doc_id
           FROM sh a, sh b
           WHERE a.doc_id < b.doc_id
             AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.s, b.s))) >= 0.8)
         SELECT doc_id, lang FROM documents
         WHERE doc_id NOT IN (SELECT doc_id FROM dups)
         ORDER BY doc_id""",
    "q25_embed_neardup" ->
      """WITH e AS (
           SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         n AS (
           SELECT vec_id, v,
             sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, len(v)+1), i -> v[i] * v[i])),
               (acc, x) -> acc + x)) AS nrm
           FROM e)
         SELECT id_a, id_b, sim FROM (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, len(a.v)+1), i -> a.v[i] * b.v[i])),
               (acc, x) -> acc + x) / (a.nrm * b.nrm), 4) AS sim
           FROM n a, n b WHERE a.vec_id < b.vec_id)
         WHERE sim > 0.5 ORDER BY id_a, id_b""",
    "q26_sim_topk" -> exactTopKSql,
    "q57_lsh_topk" -> exactTopKSql,
    // Production-regime embedding near-dup vs full quadratic cosine.
    "q61_embed_neardup_prod" -> embedProdOracleSql,
    // geared variant: same pair-set semantics, same oracle — planes only
    // steers cost, recall is re-sized by lshTablesFor per geometry
    "q61b_embed_neardup_geared" -> embedProdOracleSql,
    // Content-hash split: full membership re-derived from the FNV fold.
    "q62_hash_split" -> hashSplitOracleSql,
    "q74_corpus_shuffle" -> corpusShuffleOracleSql,
    "q75_priority_sample" -> prioritySampleOracleSql,
    "q105_grouped_sample" -> groupedSampleOracleSql,
    "q109_token_drift" -> tokenDriftOracleSql,
    // Exact percentile replay: same histogram + running sum + ceil(n*0.2)
    // threshold, same IEEE ceil on the double product.
    "q107_percentile_gate" ->
      raw"""WITH wc AS (
           SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '[$WS]+')) AS BIGINT)
               AS wc
           FROM documents),
         hist AS (SELECT wc, COUNT(*) AS c FROM wc GROUP BY wc),
         n AS (SELECT SUM(c) AS n FROM hist),
         cum AS (SELECT wc, SUM(c) OVER (ORDER BY wc) AS cum FROM hist),
         t AS (SELECT MIN(wc) AS t FROM cum CROSS JOIN n
               WHERE cum >= CEIL(n * 0.2))
         SELECT w.doc_id, w.wc, t.t
         FROM wc w CROSS JOIN t WHERE w.wc >= t.t
         ORDER BY doc_id""",
    "q77_doc_chunks" -> docChunksOracleSql,
    "q78_json_props" ->
      """WITH p AS (
           SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           FROM events)
         SELECT event_type, COUNT(k) AS n_parsed,
           CAST(SUM(k) AS BIGINT) AS k_sum,
           MIN(k) AS k_min, MAX(k) AS k_max
         FROM p GROUP BY event_type ORDER BY event_type""",
    // Interval self-join replayed directly; timestamp parity holds because
    // the fixture has no sub-microsecond timestamps (the engine's ns→µs
    // truncation is lossless) and both engines compare event time exactly.
    "q76_recent_error_counts" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click'),
         er AS (SELECT user_id, ts FROM events WHERE event_type = 'error')
         SELECT c.event_id, COUNT(er.user_id) AS n_recent_errors
         FROM c LEFT JOIN er ON c.user_id = er.user_id
           AND er.ts <= c.ts AND er.ts > c.ts - INTERVAL 10 MINUTE
         GROUP BY c.event_id ORDER BY c.event_id""",
    "q67_domain_mixing" -> mixingOracleSql,
    // Temperature rates re-derived from per-lang counts (same IEEE sqrt,
    // same ppm rounding), kept counts replayed on the same FNV stream.
    "q91_temperature_mix" ->
      (fnvBucketCtes("documents", "doc_id", 43) + """,
         counts AS (
           SELECT lang, CAST(COUNT(*) AS BIGINT) AS total
           FROM documents GROUP BY lang),
         mn AS (SELECT MIN(total) AS n_min FROM counts),
         r AS (
           SELECT lang, total,
             CAST(round(1000000 * sqrt(CAST(n_min AS DOUBLE) / total))
               AS BIGINT) AS rate_ppm
           FROM counts, mn)
         SELECT r.lang, r.total,
           CAST(SUM(CASE WHEN s.b < r.rate_ppm THEN 1 ELSE 0 END)
             AS BIGINT) AS kept,
           r.rate_ppm
         FROM r JOIN s ON s.lang = r.lang
         GROUP BY r.lang, r.total, r.rate_ppm ORDER BY r.lang"""),
    "q68_sequence_packing" -> packingOracleSql,
    "q112_pack_bins" -> packBinsOracleSql,
    // q120: the permutation (q74's replay), the ceil(n/8) slicing, and
    // the position-weighted fold re-derived from the RAW fixture — both
    // FNV streams re-signed before the mod so the arithmetic matches the
    // engine's pmod on signed longs.
    "q120_shard_export" ->
      ("WITH " + fnvSignedFrom("documents", "doc_id", 23) + raw""",
         posed AS (
           SELECT doc_id, text,
             CAST(ROW_NUMBER() OVER (
               ORDER BY ((hs % 32) + 32) % 32, hs, doc_id) - 1 AS BIGINT)
               AS pos
           FROM sg),
         ss AS (SELECT (COUNT(*) + 7) // 8 AS ssize FROM posed),
         fh AS (
           SELECT pos, pos // (SELECT ssize FROM ss) AS shard,
             ${fnvOctetsSql("CAST(doc_id AS VARCHAR) || ':' || text")}
               AS hu2
           FROM posed),
         tm AS (
           SELECT shard, pos,
             ((CAST(CASE WHEN hu2 >= CAST(9223372036854775808 AS UBIGINT)
                    THEN CAST(hu2 AS HUGEINT) - 18446744073709551616
                    ELSE CAST(hu2 AS HUGEINT) END AS HUGEINT)
               % 1000000007 + 1000000007) % 1000000007) AS mh
           FROM fh)
         SELECT CAST(shard AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           MIN(pos) AS first_pos, MAX(pos) AS last_pos,
           CAST(SUM(((pos + 1) * mh) % 1000000007) % 1000000007 AS BIGINT)
             AS fp
         FROM tm GROUP BY shard ORDER BY shard"""),
    // q118: the calendar replay — same global hour span, same
    // gaps-and-islands run decomposition on the hour index, exact
    // integer hour arithmetic on both sides.
    "q118_hour_gaps" ->
      """WITH b AS (
           SELECT date_trunc('hour', min(ts)) AS h0,
                  date_trunc('hour', max(ts)) AS h1 FROM events),
         hrs AS (
           SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
           FROM b),
         ty AS (SELECT DISTINCT event_type FROM events),
         pres AS (
           SELECT DISTINCT event_type, date_trunc('hour', ts) AS h
           FROM events),
         miss AS (
           SELECT e.event_type,
             CAST(epoch(e.h) / 3600 AS BIGINT) AS hi
           FROM (SELECT event_type, h FROM ty, hrs) e
           LEFT JOIN pres p
             ON e.event_type = p.event_type AND e.h = p.h
           WHERE p.h IS NULL),
         runs AS (
           SELECT event_type,
             hi - row_number() OVER (PARTITION BY event_type
                                     ORDER BY hi) AS g
           FROM miss),
         ga AS (SELECT event_type, g, COUNT(*) AS run
                FROM runs GROUP BY event_type, g),
         m AS (SELECT event_type, SUM(run) AS hours_missing,
                 COUNT(*) AS n_gap_runs, MAX(run) AS max_gap_hours
               FROM ga GROUP BY event_type),
         pc AS (SELECT event_type, COUNT(*) AS hours_present
                FROM pres GROUP BY event_type),
         ex AS (SELECT CAST((epoch(h1) - epoch(h0)) / 3600 AS BIGINT) + 1
                  AS hours_expected FROM b)
         SELECT t.event_type,
           CAST(ex.hours_expected AS BIGINT) AS hours_expected,
           CAST(pc.hours_present AS BIGINT) AS hours_present,
           CAST(COALESCE(m.hours_missing, 0) AS BIGINT) AS hours_missing,
           CAST(COALESCE(m.n_gap_runs, 0) AS BIGINT) AS n_gap_runs,
           CAST(COALESCE(m.max_gap_hours, 0) AS BIGINT) AS max_gap_hours,
           round(CAST(pc.hours_present AS DOUBLE) / ex.hours_expected, 6)
             AS coverage
         FROM ty t
         CROSS JOIN ex
         JOIN pc ON pc.event_type = t.event_type
         LEFT JOIN m ON m.event_type = t.event_type
         ORDER BY t.event_type""",
    // q121: each uniqueness row re-derived from a per-key count frame —
    // same >=2 duplication rule, same multiplicity max, IEEE rate.
    "q121_key_uniqueness" ->
      """WITH u AS (
           SELECT 'orders(o_orderkey)' AS relation, COUNT(*) AS c
           FROM orders GROUP BY o_orderkey
           UNION ALL
           SELECT 'lineitem(l_orderkey,l_linenumber)', COUNT(*)
           FROM lineitem GROUP BY l_orderkey, l_linenumber
           UNION ALL
           SELECT 'orders(o_custkey%1000) [non-key]', COUNT(*)
           FROM orders GROUP BY o_custkey % 1000)
         SELECT relation,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_keys,
           CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
             AS n_dup_rows,
           CAST(MAX(c) AS BIGINT) AS max_multiplicity,
           round(CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS DOUBLE)
             / SUM(c), 6) AS dup_rate
         FROM u GROUP BY relation ORDER BY relation""",
    // q117: each edge re-derived with a LEFT JOIN on distinct parent
    // keys — same NULL-is-not-an-orphan FK semantics, same planted
    // orphan slice, IEEE rate divide, 6-dp round.
    "q117_fk_orphans" ->
      """WITH dirty AS (
           SELECT CASE WHEN o_orderkey % 100 = 3
                       THEN o_custkey + 10000000
                       ELSE o_custkey END AS ck
           FROM orders),
         e1 AS (
           SELECT 'orders.o_custkey->customer.c_custkey' AS relation,
             COUNT(*) AS n_rows,
             SUM(CASE WHEN d.ck IS NULL THEN 1 ELSE 0 END) AS n_null_keys,
             SUM(CASE WHEN d.ck IS NOT NULL AND p.k IS NULL
                 THEN 1 ELSE 0 END) AS n_orphans
           FROM dirty d LEFT JOIN
             (SELECT DISTINCT c_custkey AS k FROM customer) p
             ON d.ck = p.k),
         e2 AS (
           SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS relation,
             COUNT(*) AS n_rows,
             SUM(CASE WHEN c.l_orderkey IS NULL THEN 1 ELSE 0 END)
               AS n_null_keys,
             SUM(CASE WHEN c.l_orderkey IS NOT NULL AND p.k IS NULL
                 THEN 1 ELSE 0 END) AS n_orphans
           FROM lineitem c LEFT JOIN
             (SELECT DISTINCT o_orderkey AS k FROM orders) p
             ON c.l_orderkey = p.k),
         e3 AS (
           SELECT 'lineitem.l_partkey->part.p_partkey' AS relation,
             COUNT(*) AS n_rows,
             SUM(CASE WHEN c.l_partkey IS NULL THEN 1 ELSE 0 END)
               AS n_null_keys,
             SUM(CASE WHEN c.l_partkey IS NOT NULL AND p.k IS NULL
                 THEN 1 ELSE 0 END) AS n_orphans
           FROM lineitem c LEFT JOIN
             (SELECT DISTINCT p_partkey AS k FROM part) p
             ON c.l_partkey = p.k)
         SELECT relation, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_null_keys AS BIGINT) AS n_null_keys,
           CAST(n_orphans AS BIGINT) AS n_orphans,
           round(CAST(n_orphans AS DOUBLE) / n_rows, 6) AS orphan_rate
         FROM (SELECT * FROM e1 UNION ALL SELECT * FROM e2
               UNION ALL SELECT * FROM e3)
         ORDER BY relation""",
    // q116: every profile cell re-derived per column; means via the same
    // DECIMAL(28,4) sum / non-null count, 6-dp rounded; non-numeric
    // columns carry typed NULL numeric slots.
    "q116_profile" ->
      """WITH p AS (SELECT
           COUNT(o_orderkey) AS k_n, COUNT(DISTINCT o_orderkey) AS k_d,
           CAST(MIN(o_orderkey) AS DOUBLE) AS k_min,
           CAST(MAX(o_orderkey) AS DOUBLE) AS k_max,
           round(CAST(SUM(CAST(o_orderkey AS DECIMAL(28,4))) AS DOUBLE)
             / COUNT(o_orderkey), 6) AS k_avg,
           COUNT(o_custkey) AS c_n, COUNT(DISTINCT o_custkey) AS c_d,
           CAST(MIN(o_custkey) AS DOUBLE) AS c_min,
           CAST(MAX(o_custkey) AS DOUBLE) AS c_max,
           round(CAST(SUM(CAST(o_custkey AS DECIMAL(28,4))) AS DOUBLE)
             / COUNT(o_custkey), 6) AS c_avg,
           COUNT(o_totalprice) AS t_n, COUNT(DISTINCT o_totalprice) AS t_d,
           CAST(MIN(o_totalprice) AS DOUBLE) AS t_min,
           CAST(MAX(o_totalprice) AS DOUBLE) AS t_max,
           round(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
             / COUNT(o_totalprice), 6) AS t_avg,
           COUNT(o_orderstatus) AS s_n,
           COUNT(DISTINCT o_orderstatus) AS s_d,
           COUNT(o_orderdate) AS dt_n, COUNT(DISTINCT o_orderdate) AS dt_d,
           COUNT(o_orderpriority) AS pr_n,
           COUNT(DISTINCT o_orderpriority) AS pr_d
         FROM orders)
         SELECT * FROM (
           SELECT 'o_orderkey' AS col_name, k_n AS n_nonnull,
             k_d AS n_distinct, k_min AS min_num, k_max AS max_num,
             k_avg AS avg_num FROM p
           UNION ALL SELECT 'o_custkey', c_n, c_d, c_min, c_max, c_avg
             FROM p
           UNION ALL SELECT 'o_totalprice', t_n, t_d, t_min, t_max, t_avg
             FROM p
           UNION ALL SELECT 'o_orderstatus', s_n, s_d,
             CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             CAST(NULL AS DOUBLE) FROM p
           UNION ALL SELECT 'o_orderdate', dt_n, dt_d,
             CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             CAST(NULL AS DOUBLE) FROM p
           UNION ALL SELECT 'o_orderpriority', pr_n, pr_d,
             CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             CAST(NULL AS DOUBLE) FROM p)
         ORDER BY col_name""",
    // q114: the exact KS replayed — same per-value histogram, same
    // right-continuous cumulative order, same IEEE exact-integer-ratio
    // divides (deterministic across engines), 6-dp round on the max.
    "q114_value_drift" ->
      """WITH h AS (
           SELECT value,
             SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS cb
           FROM events GROUP BY value),
         c AS (
           SELECT value,
             SUM(ca) OVER (ORDER BY value) AS cuma,
             SUM(cb) OVER (ORDER BY value) AS cumb,
             SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
           FROM h)
         SELECT CAST(MAX(na) AS BIGINT) AS n_a,
           CAST(MAX(nb) AS BIGINT) AS n_b,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           round(MAX(ABS(CAST(cuma AS DOUBLE) / na -
             CAST(cumb AS DOUBLE) / nb)), 6) AS ks
         FROM c""",
    // q113: every card number re-derived — raw-text copy counts (the
    // engine's xxhash64 grouping must agree, witnessing zero collisions),
    // the same quality rule as the q98/q108 chain, IEEE divides of exact
    // integer sums, 6-dp rounding.
    "q113_corpus_card" ->
      raw"""WITH d AS (
           SELECT source, lang,
             CAST(len(string_split_regex(trim(text), '[$WS]+')) AS BIGINT)
               AS wc,
             COUNT(*) OVER (PARTITION BY text) AS n_copies,
             CASE WHEN len(string_split_regex(trim(text), '[$WS]+')) >= 30
                   AND CAST(length(regexp_replace(text, '[^a-zA-Z]', '',
                         'g')) AS DOUBLE) / length(text) >= 0.8
                  THEN 1 ELSE 0 END AS q
           FROM documents)
         SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(wc) AS BIGINT) AS n_tok,
           round(CAST(SUM(wc) AS DOUBLE) / COUNT(*), 6) AS mean_wc,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(CASE WHEN n_copies >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_docs,
           round(CAST(SUM(CASE WHEN n_copies >= 2 THEN 1 ELSE 0 END)
               AS DOUBLE) / COUNT(*), 6) AS pct_dup,
           CAST(SUM(q) AS BIGINT) AS q_docs,
           round(CAST(SUM(q) AS DOUBLE) / COUNT(*), 6) AS pct_quality
         FROM d GROUP BY source ORDER BY source""",
    "q69_bm25_search" -> bm25OracleSql,
    "q70_unigram_surprisal" -> surprisalOracleSql,
    "q102_bigram_surprisal" -> bigramSurprisalOracleSql,
    "q36_stratified_split_counts" -> stratifiedSplitOracleSql,
    "q42_except_all" ->
      """SELECT user_id, COUNT(*) AS cnt FROM (
           SELECT user_id FROM events WHERE event_type = 'click'
           EXCEPT ALL
           SELECT user_id FROM events WHERE event_type = 'error')
         GROUP BY user_id ORDER BY user_id""",
    "q43_intersect_users" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
         INTERSECT
         SELECT user_id FROM events WHERE event_type = 'error'
         ORDER BY user_id""",
    // Tolerance gate for the HLL path: the oracle recomputes the exact
    // distinct and expects the engine's within-3·rsd flag to hold — the
    // engine-specific estimate itself never enters the hash (GoldenSpec
    // pins it at sf0.01 instead).
    "q44_approx_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
           true AS within_rsd
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q38_quality_stats" ->
      raw"""SELECT doc_id,
           length(text) AS n_chars_m,
           len(string_split_regex(trim(text), '[$WS]+')) AS n_words,
           CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
             / length(text) AS alpha_ratio,
           CAST(len(list_filter(string_split_regex(trim(text), '[$WS]+'),
                t -> t IN ('the','and','of','to','in','is','a'))) AS DOUBLE)
             / len(string_split_regex(trim(text), '[$WS]+')) AS stopword_ratio
         FROM documents ORDER BY doc_id""",
    "q39_running_total" ->
      """SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS running_total
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q40_lag_delta" ->
      """SELECT o_custkey, o_orderkey,
           o_totalprice - lag(o_totalprice, 1)
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS delta_prev
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q50_pivot_status" ->
      """SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                THEN CAST(l_quantity AS DECIMAL(28,4)) END) AS DOUBLE) AS F,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                THEN CAST(l_quantity AS DECIMAL(28,4)) END) AS DOUBLE) AS O
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q46_asof_join" ->
      """WITH o AS (
           SELECT o_custkey AS user_id, o_orderdate,
                  MAX(o_orderkey) AS last_order
           FROM orders GROUP BY 1, 2)
         SELECT e.event_id, e.user_id, o.last_order
         FROM events e
         ASOF LEFT JOIN o
           ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
         ORDER BY e.event_id""",
    "q41_rollup_counts" ->
      """SELECT r_name, n_name, COUNT(*) AS cnt
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""",
    "q56_closed_sessions" ->
      """WITH t AS (
           SELECT user_id, event_id, epoch_us(ts) AS tus,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000000 THEN 1 ELSE 0 END AS new_sess
           FROM events),
         s AS (
           SELECT user_id, tus,
             SUM(new_sess) OVER (PARTITION BY user_id
               ORDER BY tus, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
           FROM t),
         g AS (
           SELECT user_id, sess, COUNT(*) AS n_events,
             MIN(tus) // 1000 AS first_ts, MAX(tus) // 1000 AS last_ts
           FROM s GROUP BY user_id, sess),
         m AS (SELECT user_id, MAX(sess) AS last_sess FROM g GROUP BY user_id)
         SELECT g.user_id AS user_id, g.n_events, g.first_ts, g.last_ts
         FROM g JOIN m ON g.user_id = m.user_id AND g.sess != m.last_sess
         ORDER BY g.user_id, g.first_ts""",
    // byte-faithful (round 7): the engine folds the UNSIGNED UTF-8 bytes
    // of text.cast(binary), so the oracle folds the same octet stream —
    // n_bytes/checksum/brightness all octet-based, exact on non-ASCII
    "q55_media_features" -> s"""
         WITH b AS (SELECT doc_id, ${utf8OctetsSql("text")} AS bs
                    FROM documents)
         SELECT doc_id AS media_id, 'unknown' AS media_type,
           CAST(len(bs) AS BIGINT) AS n_bytes,
           list_reduce(
             list_prepend(CAST(7 AS BIGINT),
               list_transform(bs, x -> CAST(x AS BIGINT))),
             (acc, x) -> (acc * 31 + x) % 1000000007) AS checksum,
           CASE WHEN len(bs) = 0 THEN 0.0 ELSE
             round(CAST(list_sum(list_transform(bs, x -> CAST(x AS BIGINT)))
                 AS DOUBLE) / len(bs) / 256, 6) END AS brightness
         FROM b ORDER BY media_id""",
    "q54_approx_quantiles" ->
      """SELECT o_orderpriority,
           quantile_disc(o_totalprice, 0.25) AS p25,
           quantile_disc(o_totalprice, 0.5) AS p50,
           quantile_disc(o_totalprice, 0.75) AS p75
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q51_salted_join" ->
      """SELECT o_orderkey, o_custkey, c_name FROM orders
         JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    // identical to q26: exhaustive probing must reproduce exact top-k
    "q52_ivf_exhaustive" -> exactTopKSql,
    // The persisted-index round trip must reproduce the same exact top-k.
    "q92_ivf_index_query" -> exactTopKSql,
    // Build-on-90% + append-10% must also reproduce it (append placed
    // every shard row correctly; exhaustive probe erases routing bias).
    "q93_ivf_index_append" -> exactTopKSql,
    // q122 = q93's lifecycle plus tombstoned deletes: the recompute
    // oracle scores only the LIVE corpus (c.vec_id % 7 <> 2) — a
    // deleted row surfacing as a neighbor, or a live row mis-ranked,
    // breaks the hash.
    "q122_ivf_index_delete" -> exactTopKOracle("c.vec_id % 7 <> 2"),
    // recluster preserves the live set; only the routing changed
    "q159_ivf_recluster" -> exactTopKOracle("c.vec_id % 7 <> 2"),
    // full-spine kNN graph: every vector, brute-force quadratic truth
    "q160_knn_join" -> exactTopKOracleFull("TRUE", "TRUE"),
    // q170: the full SemDeDup chain re-derived from scratch — a
    // hash-green row proves the stored-index kNN graph + pointer-jumping
    // components + keep-best argmax equal the quadratic top-5 +
    // RECURSIVE closure + ranked window, decision for decision.
    "q170_semantic_dedup_apply" -> semDedupOracleSql,
    // the int8 filter-refine path is provably exact, so the quantized
    // rewrite replays against the IDENTICAL from-scratch oracle
    "q176_semdedup_quantized" -> semDedupOracleSql,
    // q172: the SAME from-scratch replay — hash-green proves the
    // build-on-base + delta-append maintained graph reproduces the
    // full-corpus decisions bit-for-bit (the q162-vs-q161 pattern).
    "q172_semdedup_incremental" -> semDedupOracleSql,
    // q174: the same replay restricted to the post-takedown corpus —
    // hash-green proves the targeted graph repair equals a full rebuild
    // over the remaining vectors.
    "q174_semdedup_delete" -> semDedupOracleSqlOn("NOT (vec_id % 10 = 3)"),
    // the delete→compact→append lifecycle: base minus victims, shard
    // (the twins) re-appended — the from-scratch replay over exactly
    // that corpus gates the three composed delta mutations
    "q177_semdedup_lifecycle" ->
      semDedupOracleSqlOn("NOT (vec_id < 1000000 AND vec_id % 10 = 3)"),
    // The quantized filter-and-refine round trip must reproduce the exact
    // top-k too: the bound argument makes the survivor set a superset of
    // the true top-k, and the refine pass is the brute-force scoring.
    "q99_quantized_refine" -> exactTopKSql,
    "q124_quantized_append" -> exactTopKSql,
    // q125: the oracle re-derives the whole HLL pipeline — registers from
    // the same FNV-1a octet fold finished with murmur3's fmix64 (three
    // xorshift-multiply rounds as UHUGEINT mod-2^64 arithmetic; `// 2^33`
    // is the unsigned 33-bit shift), bucket = low 10 bits, ρ = 55 −
    // length(bin(w)) on minimal binary strings (Java toBinaryString and
    // DuckDB bin() agree), the per-source→global max-merge, and the
    // estimator on the exact scaled-integer Z (Σ 2^(55−ρ) — no float-sum
    // order anywhere). α_m is the same literal arithmetic in both
    // engines; the only non-integral steps are one division and the ln()
    // of the linear-counting branch, erased by the whole-count round.
    // exact_distinct = COUNT(DISTINCT h) over the same hashes, so est
    // and exact measure the same population (hash collisions cancel).
    "q125_hll_card" ->
      (s"""WITH $fnvMixedDocCtes,
         b AS (
           SELECT source, u % 1024 AS bucket, u // 1024 AS w FROM h),
         reg AS (
           SELECT source, bucket,
                  MAX(CASE WHEN w = 0 THEN 55
                           ELSE 55 - length(bin(w)) END) AS rho
           FROM b GROUP BY source, bucket),
         regall AS (SELECT bucket, MAX(rho) AS rho FROM reg GROUP BY bucket),
         est AS (
           SELECT source, 1024 - COUNT(*) AS v,
                  SUM(CAST(CAST(1 AS UBIGINT) << (55 - rho) AS HUGEINT)) AS zs
           FROM reg GROUP BY source
           UNION ALL
           SELECT '__all__', 1024 - COUNT(*),
                  SUM(CAST(CAST(1 AS UBIGINT) << (55 - rho) AS HUGEINT))
           FROM regall),
         fin AS (
           SELECT source,
             CASE WHEN v > 0 AND
                    (0.7213 / (1.0 + 1.079 / 1024.0)) * 1024.0 * 1024.0
                      * 36028797018963968.0
                      / CAST(CAST(v AS HUGEINT) * 36028797018963968 + zs
                             AS DOUBLE) <= 2560.0
                  THEN 1024.0 * ln(1024.0 / v)
                  ELSE (0.7213 / (1.0 + 1.079 / 1024.0)) * 1024.0 * 1024.0
                      * 36028797018963968.0
                      / CAST(CAST(v AS HUGEINT) * 36028797018963968 + zs
                             AS DOUBLE) END AS e
           FROM est),
         ex AS (
           SELECT source, COUNT(DISTINCT u) AS exact_distinct FROM h
           GROUP BY source
           UNION ALL
           SELECT '__all__', COUNT(DISTINCT u) FROM h)
         SELECT f.source, CAST(round(f.e) AS BIGINT) AS est_distinct,
                ex.exact_distinct
         FROM fin f JOIN ex USING (source) ORDER BY f.source"""),
    // q126: the oracle recomputes the card estimate from the WHOLE corpus
    // from scratch (same register/estimator pipeline as q125, global
    // only); equality with the engine's build-then-append-twice artifact
    // proves the incremental max-merge path is lossless.
    "q126_hll_card_ingest" ->
      (s"""WITH $fnvMixedDocCtes,
         b AS (SELECT u % 1024 AS bucket, u // 1024 AS w FROM h),
         reg AS (
           SELECT bucket,
                  MAX(CASE WHEN w = 0 THEN 55
                           ELSE 55 - length(bin(w)) END) AS rho
           FROM b GROUP BY bucket),
         est AS (
           SELECT 1024 - COUNT(*) AS v,
                  SUM(CAST(CAST(1 AS UBIGINT) << (55 - rho) AS HUGEINT)) AS zs
           FROM reg),
         fin AS (
           SELECT CASE WHEN v > 0 AND
                    (0.7213 / (1.0 + 1.079 / 1024.0)) * 1024.0 * 1024.0
                      * 36028797018963968.0
                      / CAST(CAST(v AS HUGEINT) * 36028797018963968 + zs
                             AS DOUBLE) <= 2560.0
                  THEN 1024.0 * ln(1024.0 / v)
                  ELSE (0.7213 / (1.0 + 1.079 / 1024.0)) * 1024.0 * 1024.0
                      * 36028797018963968.0
                      / CAST(CAST(v AS HUGEINT) * 36028797018963968 + zs
                             AS DOUBLE) END AS e
           FROM est)
         SELECT CAST(round(e) AS BIGINT) AS est_distinct,
                (SELECT COUNT(DISTINCT u) FROM h) AS exact_distinct
         FROM fin"""),
    // q127: the oracle re-derives the log-histogram sketch pipeline —
    // bucket = me·64 + (v >> me) with me = max(length(bin v)−1−5, 0),
    // the per-priority→__all__ bucket-wise SUM merge, the cumulative
    // walk, ceil(q·N) targets, and the range-midpoint representative —
    // all integer arithmetic, bit-for-bit. Quantile literals are cast
    // to DOUBLE (DuckDB parses bare 0.5 as DECIMAL, which would change
    // the q·N product Spark computes in double).
    "q127_quantile_sketch" ->
      raw"""WITH src AS (
           SELECT o_orderpriority AS g,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS v
           FROM orders),
         hist AS (
           SELECT g,
                  GREATEST(length(bin(v)) - 1 - 5, 0) * 64
                    + (v >> CAST(GREATEST(length(bin(v)) - 1 - 5, 0)
                                 AS INTEGER)) AS bucket,
                  COUNT(*) AS cnt
           FROM src GROUP BY 1, 2),
         hist2 AS (
           SELECT g, bucket, cnt FROM hist
           UNION ALL
           SELECT '__all__', bucket, SUM(cnt) FROM hist GROUP BY bucket),
         cum AS (
           SELECT g, bucket,
                  SUM(cnt) OVER (PARTITION BY g ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS c,
                  SUM(cnt) OVER (PARTITION BY g) AS n
           FROM hist2),
         qv AS (SELECT unnest([0.5, 0.9, 0.99, 0.999]::DOUBLE[])
                  AS quantile),
         pick AS (
           SELECT g, quantile, MIN(bucket) AS bk
           FROM cum CROSS JOIN qv
           WHERE c >= CAST(CEIL(quantile * n) AS BIGINT)
           GROUP BY g, quantile)
         SELECT g AS o_orderpriority, quantile,
                CAST(CASE WHEN bk // 64 = 0 THEN bk % 64
                     ELSE (2 * (bk % 64) + 1) << (CAST(bk // 64 AS INTEGER) - 1)
                     END AS BIGINT) AS est_cents
         FROM pick ORDER BY o_orderpriority, quantile""",
    // q128: the oracle re-derives the CM sketch bit-for-bit — the token
    // stream (q96's split parity), ONE fmix64(fnv64) per distinct token
    // (weights folded by count — the same cells the per-occurrence
    // engine pass sums), Kirsch–Mitzenmacher cells (h1 + r·h2) mod w,
    // bucket-wise-summed counters, and min-over-cells estimates for the
    // exact top-20 (count DESC, token tiebreak — both engines).
    "q128_cms_heavyhitters" ->
      (raw"""WITH toks AS (
           SELECT unnest(string_split_regex(trim(text), '[$WS]+')) AS tok
           FROM documents),
         tfreq AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
         t0 AS (SELECT tok, cnt, """ + fnvOctetsSql("tok") + raw""" AS u
                FROM tfreq),
         """ + fmix64Ctes("t0", "tok, cnt") + raw""",
         rr AS (SELECT unnest([0, 1, 2, 3]) AS r),
         cells AS (
           SELECT r, CAST((u % 4294967296 + r * (u // 4294967296)) % 4096
                          AS BIGINT) AS idx,
                  SUM(cnt) AS c
           FROM mx CROSS JOIN rr GROUP BY 1, 2),
         top AS (SELECT tok, cnt AS exact_cnt, u FROM mx
                 ORDER BY cnt DESC, tok LIMIT 20),
         probe AS (
           SELECT tok, exact_cnt, r,
                  CAST((u % 4294967296 + r * (u // 4294967296)) % 4096
                       AS BIGINT) AS idx
           FROM top CROSS JOIN rr),
         est AS (
           SELECT tok, exact_cnt, MIN(COALESCE(c, 0)) AS est_cnt
           FROM probe LEFT JOIN cells USING (r, idx)
           GROUP BY tok, exact_cnt)
         SELECT tok, CAST(est_cnt AS BIGINT) AS est_cnt,
                CAST(exact_cnt AS BIGINT) AS exact_cnt
         FROM est ORDER BY exact_cnt DESC, tok"""),
    // q132: the oracle re-derives BOTH snapshot sketches and their
    // max-merged union through the q125 register/estimator pipeline
    // (bit-exact integer state), then the same long-arithmetic
    // inclusion-exclusion — so even the overlap estimate's sketch noise
    // must match bit-for-bit. exact_overlap is a plain distinct-hash
    // join, the yardstick column.
    "q132_hll_overlap" ->
      (s"""WITH d0 AS (
           SELECT 'a' AS snap, text FROM documents WHERE doc_id % 3 <> 2
           UNION ALL
           SELECT 'b' AS snap, text FROM documents WHERE doc_id % 2 = 0),
         h0 AS (SELECT snap, ${fnvOctetsSql("text")} AS u FROM d0),
         ${fmix64Ctes("h0", "snap")},
         h AS (SELECT snap, u FROM mx),
         b AS (SELECT snap, u % 1024 AS bucket, u // 1024 AS w FROM h),
         reg AS (
           SELECT snap, bucket,
                  MAX(CASE WHEN w = 0 THEN 55
                           ELSE 55 - length(bin(w)) END) AS rho
           FROM b GROUP BY snap, bucket),
         regu AS (SELECT bucket, MAX(rho) AS rho FROM reg GROUP BY bucket),
         est AS (
           SELECT snap, 1024 - COUNT(*) AS v,
                  SUM(CAST(CAST(1 AS UBIGINT) << (55 - rho) AS HUGEINT)) AS zs
           FROM reg GROUP BY snap
           UNION ALL
           SELECT '__u__', 1024 - COUNT(*),
                  SUM(CAST(CAST(1 AS UBIGINT) << (55 - rho) AS HUGEINT))
           FROM regu),
         fin AS (
           SELECT snap, CAST(round(
             CASE WHEN v > 0 AND
                    (0.7213 / (1.0 + 1.079 / 1024.0)) * 1024.0 * 1024.0
                      * 36028797018963968.0
                      / CAST(CAST(v AS HUGEINT) * 36028797018963968 + zs
                             AS DOUBLE) <= 2560.0
                  THEN 1024.0 * ln(1024.0 / v)
                  ELSE (0.7213 / (1.0 + 1.079 / 1024.0)) * 1024.0 * 1024.0
                      * 36028797018963968.0
                      / CAST(CAST(v AS HUGEINT) * 36028797018963968 + zs
                             AS DOUBLE) END) AS BIGINT) AS e
           FROM est),
         ex AS (
           SELECT COUNT(*) AS exact_overlap FROM
             (SELECT DISTINCT u FROM h WHERE snap = 'a') x
             JOIN (SELECT DISTINCT u FROM h WHERE snap = 'b') y USING (u))
         SELECT a.e AS est_a, b2.e AS est_b, u2.e AS est_union,
                a.e + b2.e - u2.e AS est_overlap, ex.exact_overlap
         FROM (SELECT e FROM fin WHERE snap = 'a') a,
              (SELECT e FROM fin WHERE snap = 'b') b2,
              (SELECT e FROM fin WHERE snap = '__u__') u2, ex"""),
    // q129: the oracle states the range join declaratively (DuckDB plans
    // it as IEJoin); the engine's binned equi-join rewrite must produce
    // the identical pair set. Bounds are the same double products in
    // both engines (IEEE multiply is deterministic).
    "q129_range_join_bands" ->
      """SELECT l_returnflag, o_orderpriority,
                COUNT(*) AS n_pairs,
                CAST(SUM(CAST(l_quantity AS DECIMAL(28, 4))) AS DOUBLE)
                  AS sum_qty
         FROM lineitem l
         JOIN orders o
           ON l.l_extendedprice >= o.o_totalprice * 0.999
          AND l.l_extendedprice <= o.o_totalprice * 1.001
         GROUP BY 1, 2
         ORDER BY 1, 2""",
    // q133: the overlap predicate stated declaratively; the engine's
    // owned-bin rewrite must produce the identical pair multiset —
    // a double-counted pair (one emitted in two shared bins) breaks
    // n_pairs and the hash.
    "q133_interval_overlap_join" ->
      """SELECT l_returnflag, o_orderpriority,
                COUNT(*) AS n_pairs,
                CAST(SUM(CAST(l_quantity AS DECIMAL(28, 4))) AS DOUBLE)
                  AS sum_qty
         FROM lineitem l
         JOIN orders o
           ON l.l_extendedprice * 0.9995 <= o.o_totalprice * 1.001
          AND o.o_totalprice * 0.999 <= l.l_extendedprice * 1.0005
         GROUP BY 1, 2
         ORDER BY 1, 2""",
    // q130: identical from-scratch BM25 recompute as q69's oracle, on the
    // q130 term set — the engine side must reproduce it from the stored
    // postings/df/stats artifact after a build + append.
    "q130_inverted_index_bm25" -> bm25OracleSqlFor(indexTerms),
    // q131: the recompute simply never sees the tombstoned docs — df,
    // n_docs, and avgdl all derive from the live corpus, which is
    // exactly what the engine's negative-delta side tables must yield.
    "q131_inverted_index_delete" ->
      bm25OracleSqlFor(indexTerms, docsWhere = "doc_id % 7 <> 5"),
    // q134: identical full-corpus recompute as q130's oracle — the
    // engine side must reproduce it from main + batch generations,
    // WITH one batch deliberately replayed (exactly-once proof).
    "q134_inverted_index_stream_gens" -> bm25OracleSqlFor(indexTerms),
    "q135_weighted_sample" -> weightedSampleOracleSql,
    "q136_sequential_poisson" -> sequentialPoissonOracleSql,
    "q137_editdist_linkage" -> editDistOracleSql,
    "q138_pagerank_centrality" -> pageRankOracleSql,
    "q139_exact_jaccard_join" -> exactJaccardOracleSql,
    // the incremental index must reproduce the SAME full-corpus edge set
    "q154_simgraph_incremental" -> exactJaccardOracleSql,
    "q157_simgraph_delete" ->
      exactJaccardOracleSqlOn("WHERE doc_id % 7 <> 2"),
    // two from-scratch pair derivations (v2 with the q104/q109 text
    // edits) full-outer'd into the per-edge status
    "q161_simgraph_snapshot_diff" -> simGraphDiffOracleSql,
    // the maintained-index delta path must reproduce the identical diff
    "q162_simgraph_incr_diff" -> simGraphDiffOracleSql,
    "q163_simgraph_stream_ingest" -> streamSimGraphOracleSql,
    // stream-maintained dense index at exhaustive probe == brute force
    // over the full corpus (every staged row deterministically admitted)
    "q179_ivf_stream_ingest" -> exactTopKSql,
    "q165_hybrid_rrf" -> hybridRrfOracleSql,
    "q166_mmr_rerank" -> mmrOracleSql,
    // q167 answers from the stored inverted + IVF indexes; the oracle is
    // q165's from-scratch recompute VERBATIM — hash-green proves the
    // artifacts reproduce the raw-corpus fusion exactly
    "q167_hybrid_from_indexes" -> hybridRrfOracleSql,
    "q168_serp_dedup" -> serpDedupOracleSql,
    // q171: the composed serving chain replayed from the SAME CTE blocks
    // as q165/q168/q166's standalone oracles.
    "q171_rag_pipeline" -> ragPipelineOracleSql,
    "q155_simgraph_incr_components" ->
      ("WITH RECURSIVE " + componentClosureBody("documents",
        simGraphThreshold) + raw"""
         , cs AS (
           SELECT component, COUNT(*) AS csize FROM comp GROUP BY component)
         SELECT CAST(csize AS BIGINT) AS csize,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(csize * COUNT(*) AS BIGINT) AS n_docs
         FROM cs GROUP BY csize ORDER BY csize"""),
    "q140_graph_kcore" -> kCoreOracleSql,
    "q141_triangle_clustering" -> triangleOracleSql,
    "q142_domain_cap" -> domainCapOracleSql,
    "q143_pmi_collocations" -> pmiOracleSql,
    "q144_label_propagation" -> lpaOracleSql,
    "q145_funnel" -> funnelOracleSql,
    "q146_cohort_retention" -> cohortOracleSql,
    "q147_cube_grouping" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
             AS total
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY g_status, g_priority, status, priority""",
    "q148_decayed_activity" ->
      """WITH ev AS (
           SELECT event_type, epoch_us(ts) // 604800000000 AS wk
           FROM events),
         mx AS (SELECT MAX(wk) AS max_wk FROM ev)
         SELECT event_type, COUNT(*) AS n_events, MAX(wk) AS latest_wk,
           CAST(SUM(CAST(round(power(0.5, max_wk - wk), 6)
             AS DECIMAL(18,6))) AS DOUBLE) AS decayed_score
         FROM ev CROSS JOIN mx
         GROUP BY event_type ORDER BY event_type""",
    "q149_containment_join" -> containmentOracleSql,
    "q150_modularity" -> modularityOracleSql,
    "q151_subsumption_dedup" -> subsumptionOracleSql,
    // q152: the q64/q81 RECURSIVE closure at the artifact's 0.7 threshold,
    // folded to per-cluster size/bytes/source-spread (strlen = DuckDB
    // byte length, matching octet_length — the q81 parity).
    "q152_dup_cluster_report" ->
      ("WITH RECURSIVE " + componentClosureBody("documents", simGraphThreshold) + raw"""
         SELECT c.component AS cluster, COUNT(*) AS csize,
           CAST(SUM(CAST(strlen(d.text) AS BIGINT)) AS BIGINT) AS total_octets,
           CAST(COUNT(DISTINCT d.source) AS BIGINT) AS n_sources
         FROM comp c JOIN documents d USING (doc_id)
         GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY cluster"""),
    "q53_corpus_filter" ->
      raw"""WITH q AS (
           SELECT * FROM documents
           WHERE len(string_split_regex(trim(text), '[$WS]+')) >= 30
             AND CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                 / length(text) >= 0.8),
         toks AS (
           SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
           FROM q),
         sh AS (
           SELECT doc_id,
             CASE WHEN len(t) < 3 THEN []::VARCHAR[]
                  ELSE list_distinct(list_transform(range(1, len(t) - 1),
                         i -> concat_ws(' ', t[i], t[i+1], t[i+2])))
             END AS s
           FROM toks),
         dups AS (
           SELECT DISTINCT b.doc_id
           FROM sh a, sh b
           WHERE a.doc_id < b.doc_id
             AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.s, b.s))) >= 0.8)
         SELECT doc_id, lang FROM q
         WHERE doc_id NOT IN (SELECT doc_id FROM dups)
         ORDER BY doc_id""",
    // byte-faithful (round 7): frames = every-2nd 64-BYTE chunk of the
    // UTF-8 octet list (1-based inclusive list slice mirrors the binary
    // substr); thumbnail = every stride-th byte, stride = max(1,
    // n_bytes/256); checksums are the q55 polynomial fold. An off-end
    // slice is empty and folds to the bare seed 7, exactly like
    // StubDecoder on an empty payload.
    "q60_media_frames" -> s"""
         WITH b AS (SELECT doc_id AS media_id, ${utf8OctetsSql("text")} AS bs
                    FROM documents),
         f AS (
           SELECT media_id, bs,
             unnest(range(0, greatest(len(bs) // 64 - 1, 0) + 1, 2)) AS off
           FROM b),
         ck AS (
           SELECT media_id,
             list_reduce(list_prepend(CAST(7 AS BIGINT),
               list_transform(
                 bs[CAST(off * 64 + 1 AS INT):CAST(off * 64 + 64 AS INT)],
                 x -> CAST(x AS BIGINT))),
               (acc, x) -> (acc * 31 + x) % 1000000007) AS c
           FROM f),
         th AS (
           SELECT media_id,
             list_reduce(list_prepend(CAST(7 AS BIGINT),
               list_transform(
                 range(1, len(bs) + 1, greatest(len(bs) // 256, 1)),
                 i -> CAST(bs[CAST(i AS INT)] AS BIGINT))),
               (acc, x) -> (acc * 31 + x) % 1000000007) AS thumb_checksum
           FROM b)
         SELECT ck.media_id AS media_id, COUNT(*) AS n_frames,
             CAST(SUM(ck.c) AS BIGINT) AS sum_frame_checksum,
             th.thumb_checksum
         FROM ck JOIN th ON ck.media_id = th.media_id
         GROUP BY ck.media_id, th.thumb_checksum
         ORDER BY media_id""",
    // box-filter downsample re-derived over the octet list: cell i covers
    // bytes [i*n/T, (i+1)*n/T), holds floor(mean) of its unsigned bytes;
    // n <= T passes through; checksum is the shared polynomial fold
    "q79_media_downsample" -> s"""
         WITH b AS (SELECT doc_id, ${utf8OctetsSql("text")} AS bs
                    FROM documents),
         p AS (SELECT doc_id, bs, len(bs) AS n FROM b),
         d AS (
           SELECT doc_id, n,
             CASE WHEN n <= 64 THEN bs
                  ELSE list_transform(range(0, 64), i ->
                    CAST(list_sum(bs[CAST(i * n // 64 + 1 AS INT)
                                     :CAST((i + 1) * n // 64 AS INT)])
                      // ((i + 1) * n // 64 - i * n // 64) AS UBIGINT))
             END AS ds
           FROM p)
         SELECT doc_id AS media_id, CAST(n AS BIGINT) AS n_bytes,
           CAST(len(ds) AS BIGINT) AS ds_len,
           list_reduce(list_prepend(CAST(7 AS BIGINT),
             list_transform(ds, x -> CAST(x AS BIGINT))),
             (acc, x) -> (acc * 31 + x) % 1000000007) AS ds_checksum,
           CASE WHEN len(ds) = 0 THEN 0.0 ELSE
             round(CAST(list_sum(list_transform(ds, x -> CAST(x AS BIGINT)))
                 AS DOUBLE) / len(ds) / 256, 6) END AS ds_brightness
         FROM d ORDER BY media_id""",

    // same RE2-safe pattern on both engines; '' is the SQL-escaped quote
    "q59_bpe_tokens" ->
      raw"""SELECT lang, COUNT(*) AS docs,
           CAST(SUM(len(regexp_extract_all(text,
             '''[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9$WS]+|[$WS]+')))
             AS BIGINT) AS bpe_tokens,
           CAST(SUM(len(string_split_regex(trim(text), '[$WS]+')))
             AS BIGINT) AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text,
             '''[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9$WS]+|[$WS]+')))
             AS DOUBLE)
             / SUM(len(string_split_regex(trim(text), '[$WS]+'))) AS fertility
         FROM documents GROUP BY lang ORDER BY lang""",
    "q27_fingerprint" ->
      """SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ''), ch -> CAST(ascii(ch) AS BIGINT))),
             (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
         FROM documents ORDER BY doc_id""",
    // Same duplicated-span semantics replayed over exploded token
    // positions (the oracle needn't be scale-shaped): positional 8-grams,
    // corpus-wide occurrence count >= 2, covered positions anti-joined
    // out, text rebuilt with an ORDER BY string_agg. Joins raw gram
    // STRINGS vs the engine's FNV-64 hashes — the standard 64-bit
    // collision-freedom argument (q24/q66/q71).
    "q94_dup_gram_scrub" -> ("WITH " + scrubCtesBody("documents") +
      scrubFinalSelect),
    // q111: the CDC chunker replayed end-to-end — same 4-token windows,
    // same FNV-1a-64 (byte-faithful via utf8OctetsSql), same mod-16
    // boundary rule (unsigned % 16 == Spark's pmod on the signed image
    // since 2^64 ≡ 0 mod 16), same filter-then-append end construction,
    // chunk hashes compared WITHIN the engine only (signedness never
    // crosses), sharing = count(distinct doc) >= 2 on chunk content.
    "q111_cdc_chunks" ->
      raw"""WITH toks AS (
           SELECT doc_id,
             string_split_regex(trim(text), '[$WS]+') AS t
           FROM documents),
         win AS (
           SELECT doc_id, t,
             unnest(range(1, CASE WHEN len(t) >= 4
                                  THEN len(t) - 2 ELSE 1 END)) AS i
           FROM toks),
         winh AS (
           SELECT doc_id, i,
             ${fnvOctetsSql("array_to_string(t[i:i+3], ' ')")} AS wh
           FROM win),
         bnd AS (
           SELECT doc_id, list(i + 3 ORDER BY i) AS bends
           FROM winh WHERE wh % 16 = 0 GROUP BY doc_id),
         ends AS (
           SELECT tk.doc_id, tk.t,
             list_concat(
               list_filter(COALESCE(b.bends, []::BIGINT[]),
                 e -> e < len(tk.t)),
               [CAST(len(tk.t) AS BIGINT)]) AS ee
           FROM toks tk LEFT JOIN bnd b ON tk.doc_id = b.doc_id),
         chunk AS (
           SELECT doc_id, t, ee,
             unnest(range(1, len(ee) + 1)) AS k
           FROM ends),
         cstrs AS (
           SELECT doc_id,
             array_to_string(
               t[(CASE WHEN k = 1 THEN 1 ELSE ee[k-1] + 1 END):(ee[k])],
               ' ') AS cstr,
             ee[k] - (CASE WHEN k = 1 THEN 1 ELSE ee[k-1] + 1 END) + 1
               AS ctoks
           FROM chunk),
         ch AS (
           SELECT doc_id, ${fnvOctetsSql("cstr")} AS chash, ctoks
           FROM cstrs),
         shared AS (
           SELECT chash FROM ch
           GROUP BY chash HAVING COUNT(DISTINCT doc_id) >= 2)
         SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(ctoks) AS BIGINT) AS n_tok,
           CAST(COALESCE(SUM(CASE WHEN chash IN (SELECT chash FROM shared)
                                  THEN ctoks END), 0) AS BIGINT) AS dup_tok,
           round(CAST(COALESCE(SUM(CASE WHEN chash IN
                     (SELECT chash FROM shared) THEN ctoks END), 0)
                   AS DOUBLE) / SUM(ctoks), 6) AS dup_frac
         FROM ch GROUP BY doc_id ORDER BY doc_id""",
    // The four-stage chain in one WITH RECURSIVE: q53's quality CTEs,
    // q66's decontam semantics (eval slice's distinct grams, NOT IN on
    // any-overlap docs), the q81 closure seeded from the DECONTAMINATED
    // relation, keep-best per component, then the q94 scrub CTEs over the
    // survivor relation. Every stage boundary is inside the hash.
    "q98_corpus_curation" ->
      (curationChainCtes + ",\n         " + scrubCtesBody("surv") +
        scrubFinalSelect),
    // Same four-stage chain, ending in the CASE classification instead of
    // the rewrite — the precedence (quality → decontam → dup → scrub) is
    // pinned per doc, so a green row proves the report attributes every
    // drop to the same stage the pipeline's own chain would.
    "q108_curation_report" ->
      (curationChainCtes + raw""",
         sctoks AS (
           SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
           FROM surv),
         scgrams AS (
           SELECT doc_id,
             unnest(list_transform(range(1, len(t) - 6),
               i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3],
                              t[i+4], t[i+5], t[i+6], t[i+7]))) AS g
           FROM sctoks WHERE len(t) >= 8),
         scdup AS (SELECT g FROM scgrams GROUP BY g HAVING COUNT(*) >= 2),
         scrubbed AS (SELECT DISTINCT doc_id
                      FROM scgrams JOIN scdup USING (g))
         SELECT d.doc_id,
           CASE WHEN d.doc_id NOT IN (SELECT doc_id FROM q)
                  THEN 'dropped_quality'
                WHEN d.doc_id IN (SELECT doc_id FROM contam)
                  THEN 'dropped_decontam'
                WHEN d.doc_id NOT IN (SELECT doc_id FROM ranked
                                      WHERE rn = 1)
                  THEN 'dropped_dup'
                WHEN d.doc_id IN (SELECT doc_id FROM scrubbed)
                  THEN 'kept_scrubbed'
                ELSE 'kept_clean' END AS status
         FROM documents d WHERE d.doc_id % 10 <> 7
         ORDER BY d.doc_id"""),
    "q95_bpe_merges" -> bpeOracleSql(10),
    "q97_bpe_encode" -> bpeEncodeOracleSql(10),
    "q115_tokenizer_fit" -> tokenizerFitOracleSql(10),
    // Over the ORIGINAL parquet — equality proves the engine's JSONL/ORC
    // write→read loops lossless (same original-fixture-oracle trick as
    // q90's z-order loop). Fingerprint formula identical to q27's.
    "q100_jsonl_roundtrip" -> roundTripOracleSql,
    "q103_orc_roundtrip" -> roundTripOracleSql,
    // Same smoothed-idf formulation; ranking on the ROUNDED score with
    // the term tiebreak in both engines.
    "q96_tfidf_topterms" ->
      raw"""WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
           FROM documents),
         tf AS (SELECT doc_id, tok, COUNT(*) AS tf
                FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
                GROUP BY doc_id, tok),
         dft AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
         n AS (SELECT COUNT(*) AS n_docs FROM documents),
         scored AS (
           SELECT doc_id, tok, tf.tf, dft.df,
             round(tf * (ln((1.0 + n_docs) / (1.0 + df)) + 1.0), 6) AS tfidf
           FROM tf JOIN dft USING (tok) CROSS JOIN n),
         ranked AS (
           SELECT *, row_number() OVER (
             PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS trank
           FROM scored)
         SELECT doc_id, CAST(trank AS BIGINT) AS trank, tok,
           CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, tfidf
         FROM ranked WHERE trank <= 3 ORDER BY doc_id, trank""",
    // Plain NOT IN on raw text — the bloom-probe + verify pipeline must
    // reproduce exact set-membership admission (FPs verified away, no
    // FNs by the Bloom guarantee).
    "q101_bloom_ingest" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 7),
         shard AS (
           SELECT doc_id + 5000000 AS doc_id, text
           FROM documents WHERE doc_id % 10 = 5
           UNION ALL
           SELECT doc_id + 3000000 AS doc_id, text || ' zznew' AS text
           FROM documents WHERE doc_id % 10 = 3
           UNION ALL
           SELECT doc_id + 7000000 AS doc_id, text
           FROM documents WHERE doc_id % 10 = 7)
         SELECT doc_id, CAST(strlen(text) AS BIGINT) AS blen
         FROM shard
         WHERE text NOT IN (SELECT text FROM corpus)
         ORDER BY doc_id""",
    // Raw-text comparison (no hashing) — a green row proves the engine's
    // 64-bit content-hash diff classified every doc exactly as the text
    // diff does on this fixture.
    "q104_snapshot_diff" ->
      """WITH v1 AS (
           SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 7),
         v2 AS (
           SELECT doc_id,
             CASE WHEN doc_id % 10 = 5 THEN text || ' v2edit'
                  ELSE text END AS text
           FROM documents WHERE doc_id % 10 <> 4)
         SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
           CASE WHEN a.doc_id IS NULL THEN 'added'
                WHEN b.doc_id IS NULL THEN 'removed'
                WHEN a.text <> b.text THEN 'modified'
                ELSE 'unchanged' END AS status
         FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
         ORDER BY doc_id""",
    // v2 constructed DIRECTLY from the fixture definition (q104's v2) —
    // equality proves the engine's apply(v1, changeset) reconstruction.
    "q106_apply_changeset" ->
      """WITH v2 AS (
           SELECT doc_id,
             CASE WHEN doc_id % 10 = 5 THEN text || ' v2edit'
                  ELSE text END AS text
           FROM documents WHERE doc_id % 10 <> 4)
         SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ''),
                 ch -> CAST(ascii(ch) AS BIGINT))),
             (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
         FROM v2 ORDER BY doc_id""",
  )

  /** The q95 oracle: BPE training replayed in DuckDB, stage by stage.
    * Symbol sequences live as a bracket-encoded string — each symbol
    * wrapped chr(1)‖sym‖chr(2), so adjacent occurrences of a pair share
    * NO characters and plain `replace()` (leftmost, non-overlapping,
    * scan-past-replacement) is exactly BPE's merge application (the
    * engine-side fold's semantics; BpeSpec pins the overlap shapes both
    * must agree on). Every stage is MATERIALIZED: each round references
    * its predecessor twice (pair counts + merge application), so inlined
    * CTEs would re-expand the base scan 2^n times. Tie-break in both
    * engines: count desc, then (left, right) bytewise asc.
    */
  /** The q94/q98 scrub oracle CTEs over an arbitrary (doc_id, text) base
    * relation: positional 8-grams (parallel unnest zips index + gram),
    * corpus-wide occurrence count >= 2, covered positions anti-joined out
    * of the exploded token stream, text rebuilt with an ORDER BY
    * string_agg. The oracle needn't be scale-shaped; it joins raw gram
    * STRINGS vs the engine's FNV-64 hashes (the q24/q66/q71 64-bit
    * collision-freedom argument).
    */
  private def scrubCtesBody(base: String): String = raw"""sctoks AS (
           SELECT doc_id, string_split_regex(trim(text), '[$WS]+') AS t
           FROM $base),
         scgrams AS (
           SELECT doc_id,
             unnest(range(1, len(t) - 6)) AS i,
             unnest(list_transform(range(1, len(t) - 6),
               i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3],
                              t[i+4], t[i+5], t[i+6], t[i+7]))) AS g
           FROM sctoks WHERE len(t) >= 8),
         scdup AS (SELECT g FROM scgrams GROUP BY g HAVING COUNT(*) >= 2),
         sccov AS (SELECT DISTINCT doc_id,
                   unnest(list_transform(range(0, 8), d -> i + d)) AS p
                 FROM scgrams JOIN scdup USING (g)),
         scpos AS (SELECT doc_id, unnest(t) AS tok,
                   generate_subscripts(t, 1) AS p
                 FROM sctoks),
         sckept AS (SELECT p0.doc_id, p0.tok, p0.p
                  FROM scpos p0 LEFT JOIN sccov c
                    ON p0.doc_id = c.doc_id AND p0.p = c.p
                  WHERE c.p IS NULL),
         scagg AS (SELECT doc_id, COUNT(*) AS n_kept,
                   string_agg(tok, ' ' ORDER BY p) AS clean_text
                 FROM sckept GROUP BY doc_id),
         scbase AS (SELECT doc_id, len(t) AS n_tok FROM sctoks)"""

  private val scrubFinalSelect: String = """
         SELECT b.doc_id, CAST(b.n_tok AS BIGINT) AS n_tok,
           CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(b.n_tok - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
           coalesce(a.clean_text, '') AS clean_text
         FROM scbase b LEFT JOIN scagg a USING (doc_id)
         ORDER BY b.doc_id"""

  private def bpeOracleSql(nMerges: Int): String =
    s"WITH ${bpeStagesSql(nMerges)} " +
      s"SELECT * FROM (${bpeMergesUnionSql(nMerges)}) ORDER BY merge_rank"

  /** q97's oracle: encode the corpus against the FINAL stage of the same
    * replayed training chain — per-doc whitespace vs BPE token counts,
    * n_syms = symbols in the bracket-encoded word (in-vocab by
    * construction here; the engine's OOV fallback is exercised by spec).
    */
  private def bpeEncodeOracleSql(nMerges: Int): String =
    raw"""WITH ${bpeStagesSql(nMerges)},
      vocab AS (SELECT word,
          len(string_split(substr(enc, 2, len(enc)-2),
            chr(2) || chr(1))) AS n_syms
        FROM s$nMerges),
      dt AS (SELECT doc_id,
          unnest(string_split_regex(trim(text), '[$WS]+')) AS word
        FROM documents)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_ws,
        CAST(SUM(coalesce(n_syms, len(word) + 1)) AS BIGINT) AS n_bpe,
        round(CAST(SUM(coalesce(n_syms, len(word) + 1)) AS DOUBLE)
          / COUNT(*), 6) AS fertility
      FROM dt LEFT JOIN vocab USING (word)
      GROUP BY doc_id ORDER BY doc_id"""

  /** q115 oracle: DuckDB re-trains the 10 rounds ON THE STANDING-CORPUS
    * SLICE only (the trainWhere arm — stored artifact == fresh tokenizer,
    * as in q97), then scores the WHOLE corpus per source; the %10=7
    * holdout supplies genuine OOV words for the char-fallback arm.
    */
  private def tokenizerFitOracleSql(nMerges: Int): String =
    raw"""WITH ${bpeStagesSql(nMerges, "WHERE doc_id % 10 <> 7")},
      vocab AS (SELECT word,
          len(string_split(substr(enc, 2, len(enc)-2),
            chr(2) || chr(1))) AS n_syms
        FROM s$nMerges),
      dt AS (SELECT source,
          unnest(string_split_regex(trim(
            CASE WHEN doc_id % 10 = 7 THEN text || ' zzoov'
                 ELSE text END), '[$WS]+')) AS word
        FROM documents)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_ws,
        CAST(SUM(coalesce(n_syms, len(word) + 1)) AS BIGINT) AS n_bpe,
        CAST(SUM(CASE WHEN n_syms IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_oov,
        round(CAST(SUM(coalesce(n_syms, len(word) + 1)) AS DOUBLE)
          / COUNT(*), 6) AS fertility,
        round(CAST(SUM(CASE WHEN n_syms IS NULL THEN 1 ELSE 0 END)
          AS DOUBLE) / COUNT(*), 6) AS oov_rate
      FROM dt LEFT JOIN vocab USING (word)
      GROUP BY source ORDER BY source"""

  private def bpeMergesUnionSql(nMerges: Int): String =
    (1 to nMerges).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS merge_rank, a AS lhs, b AS rhs,
            a||b AS merged, CAST(w AS BIGINT) AS pair_count FROM b$k"""
    }.mkString(" UNION ALL ")

  private def bpeStagesSql(nMerges: Int,
                           trainWhere: String = ""): String = {
    val head = raw"""
      w0 AS MATERIALIZED (
        SELECT tok AS word, COUNT(*) AS cnt FROM (
          SELECT unnest(string_split_regex(trim(text), '[$WS]+')) AS tok
          FROM documents $trainWhere) GROUP BY tok),
      s0 AS MATERIALIZED (
        SELECT word, cnt,
          list_aggregate(list_transform(range(1, len(word)+1),
            i -> chr(1) || word[i] || chr(2)), 'string_agg', '')
          || chr(1) || '</w>' || chr(2) AS enc
        FROM w0)"""
    val stages = (1 to nMerges).map { k =>
      raw"""
      p$k AS MATERIALIZED (
        SELECT split_part(pr, ' ', 1) AS a, split_part(pr, ' ', 2) AS b,
               SUM(cnt) AS w
        FROM (
          SELECT cnt, unnest(list_transform(range(1, len(sy)),
            i -> sy[i] || ' ' || sy[i+1])) AS pr
          FROM (SELECT cnt, string_split(substr(enc, 2, len(enc)-2),
                  chr(2) || chr(1)) AS sy FROM s${k - 1})
        ) GROUP BY a, b),
      b$k AS MATERIALIZED (
        SELECT a, b, w FROM p$k ORDER BY w DESC, a, b LIMIT 1),
      s$k AS MATERIALIZED (
        SELECT word, cnt,
          replace(enc,
            (SELECT chr(1)||a||chr(2)||chr(1)||b||chr(2) FROM b$k),
            (SELECT chr(1)||a||b||chr(2) FROM b$k)) AS enc FROM s${k - 1})"""
    }
    (head +: stages).mkString(",")
  }
}
