package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream

/** Regenerates the STREAMING-side goldens — run only after an INTENTIONAL
  * semantics change: `sbt "Test/runMain graft.StreamGoldenGen"`.
  *
  * Uses the suites' shared session (local[4], 4 shuffle partitions) so any
  * partitioning-sensitive state behavior is pinned under the exact config
  * GoldenSpec replays. The batch==stream equivalence specs prove the twins
  * agree; these pins additionally freeze the streaming output itself, so a
  * watermark/state regression cannot hide behind co-drift of both sides.
  */
object StreamGoldenGen {
  private val sf001 = "/root/testdata/sf0.01"

  def hourly(spark: org.apache.spark.sql.SparkSession, tag: String): DataFrame =
    EventStream.runToMemory(
      EventStream.hourlyStats(EventStream.readEvents(spark, sf001)),
      s"golden_hourly_$tag", OutputMode.Complete())
      .orderBy("win_start", "event_type")

  def sliding(spark: org.apache.spark.sql.SparkSession, tag: String): DataFrame =
    EventStream.runToMemory(
      EventStream.slidingTypeStats(EventStream.readEvents(spark, sf001)),
      s"golden_sliding_$tag", OutputMode.Complete())
      .orderBy("win_start", "event_type")

  def closedSessions(spark: org.apache.spark.sql.SparkSession,
                     tag: String): DataFrame = {
    import spark.implicits._
    val events = EventStream.readEvents(spark, sf001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[EventStream.Event]
    EventStream.runToMemory(
      EventStream.sessionizeClosed(events, gapMinutes = 30).toDF(),
      s"golden_closed_$tag", OutputMode.Append())
      .select("user_id", "n_events", "total_value", "first_ts", "last_ts")
      .orderBy("user_id", "first_ts", "last_ts", "n_events")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val outDir = new java.io.File("src/test/resources/goldens")
    def dump(name: String, df: DataFrame): Unit = {
      val f = new java.io.PrintWriter(new java.io.File(outDir, s"$name.csv"))
      try {
        f.println(df.columns.mkString(","))
        df.collect().foreach(r =>
          f.println(r.toSeq.map(String.valueOf).mkString(",")))
      } finally f.close()
      println(s"[golden] wrote $name.csv")
    }
    dump("stream_q18_hourly", hourly(spark, "gen"))
    dump("stream_q48_sliding", sliding(spark, "gen"))
    dump("stream_q56_closed", closedSessions(spark, "gen"))
    spark.stop()
  }
}
