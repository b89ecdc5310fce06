package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Similarity

/** The q88 scale story, separated into its two regimes
  * (`sbt "Test/runMain graft.SemanticScaleNote"` →
  * bench/semantic_scale_r8.json).
  *
  * crossCosineMatches' cost is EXACTLY |corpus| × |eval| dot products —
  * brute-force is the right call on the decontamination path (exact, no
  * recall question, zero corpus shuffle) precisely BECAUSE the eval side
  * is a fixed benchmark set. The q88 fixture's %10 slice scales eval WITH
  * the corpus (the same stress-regime artifact as q66's eval slice and
  * q84's 10% arm), which turns the product quadratic: 623 s at x100
  * (bench/scale_x100_q88_r8.json). This note measures the PRODUCTION
  * regime — eval pinned to the base copy's %10=3 slice (200 vectors at
  * every scale) — where the product is linear in corpus size. The two
  * curves together are the honest cost model: linear in corpus for fixed
  * eval; choose LSH/IVF blocking instead if the "eval" side genuinely
  * grows with the corpus.
  */
object SemanticScaleNote {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-semantic-scale-note")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = Seq("x1", "x10", "x100").map { scale =>
      val base = spark.read
        .parquet(s"target/scale/$scale/embeddings.parquet")
        .select(col("vec_id"),
          VectorFunctions.toDoubleArray(col("embedding")).as("embedding"))
      val corpus = base.filter(col("vec_id") % 10 =!= 7)
      // PINNED eval: the base copy's slice — 200 vectors at every scale
      val evalSet = base
        .filter(col("vec_id") % 10 === 3 && col("vec_id") < 2000)
        .withColumn("a", (col("vec_id") % 8).cast("double") / 20.0)
        .select((col("vec_id") + 3000000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (lit(1.0) - col("a")) * x + col("a") *
              element_at(col("embedding"), pmod(i + 1, lit(64)) + 1))
            .as("embedding"))
      val nCorpus = corpus.count(); val nEval = evalSet.count()
      // warm-up then min-of-2
      def run(): Long = Similarity
        .crossCosineMatches(corpus, evalSet, threshold = 0.9).count()
      run()
      val times = Seq.fill(2) {
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); val n = run()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (sec, pairs) = times.minBy(_._1)
      println(f"[semantic-scale] $scale%-5s corpus=$nCorpus%8d eval=$nEval " +
        f"matches=$pairs%5d  ${sec}%7.2fs")
      f"""{"scale":"$scale","corpus":$nCorpus,"eval":$nEval,""" +
        f""""matches":$pairs,"sec":$sec%.2f}"""
    }
    Files.createDirectories(Paths.get("bench"))
    Files.writeString(Paths.get("bench/semantic_scale_r8.json"),
      results.mkString("[", ",\n ", "]\n"))
    spark.stop()
  }
}
