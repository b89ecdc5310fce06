package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet fixtures (see TESTDATA.md /
  * FIXTURES.md §B). All engine queries read these; the DuckDB oracle reads
  * the same files, so loaders do nothing but scan — no casts, no renames —
  * letting Catalyst push filters/projections into the parquet scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has varied across fixture generations: TIMESTAMP(NANOS)
    * (which Spark 4 reads as a nanos LONG under the legacy conf) and
    * TIMESTAMP(MICROS) without timezone (which Spark reads as
    * TIMESTAMP_NTZ). Branch on the scanned type so both generations load
    * to the same microsecond TimestampType the queries and the DuckDB
    * oracle expect:
    *   - LongType (nanos): truncate ns→µs — the truncation DuckDB applies.
    *   - TIMESTAMP_NTZ (micros): cast to TimestampType; the session TZ is
    *     pinned to UTC everywhere, so the wall-clock values are unchanged
    *     and match DuckDB's naive-timestamp read exactly.
    *
    * The nanos-long read path needs `spark.sql.legacy.parquet.nanosAsLong`
    * = true, which every session FACTORY in this project sets at build time
    * (Bench/Verify/Explain/Apps/BenchStream/the test session) — the loader
    * itself is side-effect-free (round-10 verdict: a loader silently
    * flipping session-wide legacy conf is a mixed-workload surprise). A
    * session without the conf fails the nanos-generation scan LOUDLY at
    * analysis, never silently wrong.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw // already a microsecond instant timestamp
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
