package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.core.Tables

/** Gate-level specs for the driver-facing streaming queries: the streamed
  * result must equal the batch twin over the same feed, and replayed input
  * must collapse to exactly the original rows. */
class StreamingQueriesSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    StreamingQueries.queries.find(_.name == name).get.fn(spark, dir)

  test("st01 streamed hourly agg equals the batch twin over the same feed") {
    val streamed = run("st01_stream_hourly").collect()
    val batch = EventsStream
      .hourlyAggBatch(Tables(spark, dir, "events"))
      .select(col("hour"), col("event_type"), col("n_events"),
        col("sum_value").cast("decimal(38,4)").cast("string").as("sum_value"))
      .orderBy(col("hour"), col("event_type"))
      .collect()
    assert(streamed.length == batch.length)
    assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
  }

  test("st03 sessionizes via stream state equal to batch gaps-and-islands") {
    val streamed = run("st03_stream_sessionize").collect()
    val batch = EventsStream
      .sessionizeBatch(Tables(spark, dir, "events"))
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events"),
        (col("sum_s4").cast("decimal(38,4)") / lit(10000))
          .cast("decimal(38,4)").cast("string").as("sum_value"))
      .orderBy(col("user_id"), col("start_us"))
      .collect()
    assert(streamed.length == batch.length)
    assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
  }

  test("st02 dedups a full replay back to exactly the original feed") {
    val streamed = run("st02_stream_dedup_replay").collect()
    val original = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
      .orderBy(col("event_id"))
      .collect()
    assert(streamed.length == original.length)
    assert(streamed.map(_.toSeq).toSeq == original.map(_.toSeq).toSeq)
  }

  test("st05 stream-stream join equals the batch interval self-join") {
    val streamed = run("st05_stream_stream_join").collect()
    val e = Tables(spark, dir, "events")
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val batch = v.join(c, col("user_id") === col("cu") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("interval 60 minutes"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("view_ts")))
          .as("lag_us"))
      .orderBy(col("user_id"), col("view_id"), col("click_id"))
      .collect()
    assert(streamed.length == batch.length && streamed.nonEmpty)
    assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
  }
}
