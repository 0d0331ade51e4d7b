package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.core.{Q, QueryPack}

/** Driver-gated Structured Streaming queries: each runs a real streaming
  * query (file source → stateful transform → memory sink) to completion
  * with `Trigger.AvailableNow`, then returns the sink table — so the
  * DuckDB oracle checks the STREAMING path end to end, not a batch twin.
  * On a cluster the same topologies run unbounded off a log source with
  * identical transform code; AvailableNow is Spark's own batch-replay
  * execution of exactly that pipeline.
  *
  * Determinism: st01 uses complete output mode (the final state of the
  * aggregation is independent of file/micro-batch order); st02's dedup
  * keeps one row per event_id regardless of which replica a batch sees
  * first (replicas are byte-identical). Decimal outputs serialize to
  * VARCHAR on both sides (driver hash rule — RelationalQueries.dsumStr).
  */
object StreamingQueries extends QueryPack {

  private def runToCompletion(out: DataFrame, name: String,
      mode: String): DataFrame = {
    val spark = out.sparkSession
    val q = out.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft_${name}_ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  def queries: Seq[Q] = Seq(
    // Watermarked tumbling-window aggregation, streamed file-by-file and
    // emitted as the complete final state.
    Q("st01_stream_hourly",
      (s, dir) => {
        // The file source wants a directory to list; stage the feed file.
        val feedDir = Files.createTempDirectory("graft_st01_feed")
        Files.copy(Paths.get(s"$dir/events.parquet"),
          feedDir.resolve("part-0.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        val agg = EventsStream.hourlyAgg(
          EventsStream.read(s, feedDir.toString))
        runToCompletion(agg, "st01_stream_hourly_sink", "complete")
          .select(col("hour"), col("event_type"), col("n_events"),
            col("sum_value").cast("decimal(38,4)").cast("string")
              .as("sum_value"))
          .orderBy(col("hour"), col("event_type"))
      },
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
             | COUNT(*) AS n_events,
             | CAST(CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(18,4)))
             |   AS DECIMAL(38,4)) AS VARCHAR) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin)),

    // Exactly-once ingestion under replay: the source directory holds TWO
    // byte-identical copies of the feed (a full replay, the at-least-once
    // delivery failure mode); watermark-scoped dedup state must emit each
    // event exactly once — the oracle is simply the original feed.
    Q("st02_stream_dedup_replay",
      (s, dir) => {
        val replayDir = Files.createTempDirectory("graft_st02_feed")
        Seq("part-0.parquet", "part-1-replay.parquet").foreach { f =>
          Files.copy(Paths.get(s"$dir/events.parquet"),
            replayDir.resolve(f), StandardCopyOption.REPLACE_EXISTING)
        }
        val deduped = EventsStream.deduped(
          EventsStream.read(s, replayDir.toString))
        runToCompletion(deduped, "st02_stream_dedup_sink", "append")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, event_type, value
             |FROM events ORDER BY event_id""".stripMargin))
  )
}
