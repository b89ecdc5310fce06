package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** Companion evidence to the scale-up bench's one super-linear query:
  * `sbt "Test/runMain graft.EmbedScaleNote <x1Dir> <x10Dir>"`.
  *
  * q25 deliberately runs embedding near-dup at θ=0.5 — the recall-proof
  * configuration where 4-plane sign-LSH cannot prune random pairs, so its
  * candidate volume (and measured time) grows ~quadratically with corpus
  * size. This harness times the SAME operator at the production dedup
  * threshold (θ=0.9, 16-plane tables sized by lshTablesFor): the sketch
  * join prunes sharply and the 10× corpus should cost ~10× or less, which
  * is the actual 100 TB deployment claim. min-of-3 after one warm-up.
  */
object EmbedScaleNote {
  def main(args: Array[String]): Unit = {
    val Array(x1Dir, x10Dir) = args
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-embed-scale-note")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(dir: String): Double = {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      Dedup.embeddingPairs(Tables.embeddings(spark, dir), "vec_id",
          "embedding", threshold = 0.9, useLsh = true, dim = 64,
          planes = 16, tables = Dedup.lshTablesFor(0.9, planes = 16))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    run(x1Dir) // warm-up
    val t1 = (1 to 3).map(_ => run(x1Dir)).min
    val t10 = (1 to 3).map(_ => run(x10Dir)).min
    println(f"[embed-scale] theta=0.9 16-plane LSH: x1=$t1%.3fs x10=$t10%.3fs factor=${t10 / t1}%.2fx")
    spark.stop()
  }
}
