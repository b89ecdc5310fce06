package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Methodology: each query is executed through the `noop` sink so the FULL
  * physical plan runs (a count() would let Spark skip projections); one
  * warm-up query absorbs session/codegen/JIT startup so per-query numbers
  * measure the engine, not the JVM. Between queries the cache is cleared
  * and a GC is requested so heap debt from earlier queries (the ML fits
  * allocate heavily) is not billed to whichever query runs next — without
  * this, late queries measure collector catch-up, not their plans.
  *
  * SPARK_GRAFT_BENCH_QUERIES (comma-separated names) restricts the run for
  * isolation experiments. The JSON carries `excluded`: benchQueries leaves
  * out the model-selection workloads (CV grid, ALS+KMeans chain) by
  * design — the total is NOT all-50 coverage.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up: small full-pipeline pass (scan+shuffle+codegen), untimed
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    val selected = sys.env.get("SPARK_GRAFT_BENCH_QUERIES") match {
      case Some(list) => SparkEntry.benchQueries.filter(
        list.split(",").map(_.trim).toSet)
      case None => SparkEntry.benchQueries
    }
    val excluded = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(SparkEntry.benchQueries.toSet)
    // one compact line per query AS IT COMPLETES: tail-truncation of the
    // final summary line can never eat per-query numbers again
    val results = selected.map { n =>
      val t = run(n)
      println(s"""{"q":"$n","s":$t}""")
      n -> t
    }
    // Model-selection workloads (CV grid, ALS+KMeans chain) stay OUT of the
    // total — their fit cost swings ±15-35% run-to-run — but their times are
    // still emitted so a CV-path regression is visible between rounds.
    // Skipped when SPARK_GRAFT_BENCH_QUERIES restricts the run (isolation
    // experiments shouldn't pay the grid-fit cost).
    val msResults =
      if (sys.env.contains("SPARK_GRAFT_BENCH_QUERIES")) Seq.empty
      else excluded.filter(SparkEntry.queries.contains).map(n => n -> run(n))
    def jsonMap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jsonMap(results)
    val ms = jsonMap(msResults)
    val ex = excluded.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"model_selection":$ms,"excluded":$ex,"sf":"$sfDir"}"""
    // full JSON also goes to a FILE (driver stdout capture truncates the
    // one giant line to a tail — BENCH_r0N.json came back `parsed: null`
    // five rounds running); jq-diffable across rounds
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench/bench_latest.json")
    val outFile = new java.io.File(outPath)
    Option(outFile.getParentFile).foreach(_.mkdirs())
    java.nio.file.Files.writeString(outFile.toPath, line + "\n")
    println(line)
    spark.stop()
  }
}
