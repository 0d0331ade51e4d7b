package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables

/** One event row as fed through the log source (the normalized shape
  * every topology consumes — same columns the file source emits after
  * [[graft.core.EventsLayout.normalize]]). */
final case class LogEvent(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** The "same topology runs off a log" claim (EventsStream scaladoc),
  * pinned: every st gate runs the file source, and production's first
  * move is to swap in a log source (Kafka). The Kafka connector jar
  * (`spark-sql-kafka`) is not in this environment, so the pin uses
  * Spark's own offset-based in-memory streaming source
  * ([[MemoryStream]]) — the same DataSource-v2 micro-batch path a Kafka
  * topic feeds (offsets tracked per partition, records arriving
  * row-by-row across multiple triggers, no files involved). The
  * topology code is IDENTICAL: `EventsStream.hourlyAgg` /
  * `EventsStream.deduped` take a DataFrame and never know the source.
  *
  * Contract: the log-fed hourly aggregation over the real sf0.001
  * events equals the batch twin over the same rows — delivered across
  * several micro-batches to exercise incremental state merge, not one
  * big batch — and a full replay through the dedup topology collapses
  * back to the original cardinality.
  */
class LogSourceSpec extends SparkSuite {

  private lazy val events: Seq[LogEvent] = {
    import scala.jdk.CollectionConverters._
    Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value").cast("double"), col("props"))
      .collectAsList().asScala.toSeq
      .map(r => LogEvent(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4), r.getString(5)))
  }

  test("hourlyAgg off a log source equals the batch twin (multi-trigger)") {
    import spark.implicits._
    val input = MemoryStream[LogEvent](spark)
    val q = EventsStream.hourlyAgg(input.toDF())
      .writeStream.format("memory").queryName("log_hourly")
      .outputMode("complete").start()
    try {
      // Three chunks → at least three micro-batches: the agg state must
      // MERGE across triggers, exactly what a partitioned topic feeds.
      events.grouped(math.max(1, events.size / 3 + 1)).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("log_hourly")
      .orderBy(col("hour"), col("event_type")).collect().toSeq.map(_.toSeq)
    val batch = EventsStream
      .hourlyAggBatch(Tables(spark, "/root/testdata/sf0.001", "events"))
      .orderBy(col("hour"), col("event_type")).collect().toSeq.map(_.toSeq)
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("full replay through the dedup topology collapses to original cardinality") {
    import spark.implicits._
    val input = MemoryStream[LogEvent](spark)
    val q = EventsStream.deduped(input.toDF())
      .writeStream.format("memory").queryName("log_dedup")
      .outputMode("append").start()
    try {
      val sample = events.take(500)
      input.addData(sample)
      q.processAllAvailable()
      // The replay a log consumer sees after an offset reset.
      input.addData(sample)
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("log_dedup").count() == 500)
    assert(spark.table("log_dedup").select(col("event_id")).distinct()
      .count() == 500)
  }
}
