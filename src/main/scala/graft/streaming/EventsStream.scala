package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming path for the `events` table — the reference is
  * batch-only (hourly cron re-runs, SURVEY §2.6), so this is the
  * engine-level extension that replaces "re-run the batch hourly" with an
  * incremental pipeline: file source → watermark → windowed aggregation /
  * exactly-once dedup → sink. At scale the same topology runs off a log
  * (Kafka source) with identical transform code.
  */
object EventsStream {

  /** Parquet-footer schema of events.parquet with ts as raw nanos (the
    * file stores TIMESTAMP(NANOS); pair with
    * `spark.sql.legacy.parquet.nanosAsLong=true`). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos since epoch
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of event parquet files. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Tumbling 1-hour windows per event type; the 2-hour watermark bounds
    * state while absorbing late files. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Exactly-once ingestion in the presence of replays: drop duplicate
    * event_ids, with state expired past the watermark horizon. */
  def deduped(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Batch-equivalent of [[hourlyAgg]] (same expressions over a static
    * frame) — used to pin streaming/batch consistency. */
  def hourlyAggBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))
}
