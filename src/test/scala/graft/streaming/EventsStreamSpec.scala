package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.core.Tables

class EventsStreamSpec extends SparkSuite {

  private val srcFile = "/root/testdata/sf0.001/events.parquet"

  private def stageDir(copies: Int): String = {
    val dir = Files.createTempDirectory("graft-stream").toString
    (1 to copies).foreach { i =>
      Files.copy(Paths.get(srcFile), Paths.get(s"$dir/events_$i.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    dir
  }

  test("streaming hourly aggregation equals the batch computation") {
    val dir = stageDir(1)
    val q = EventsStream.hourlyAgg(EventsStream.read(spark, dir))
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly")
        .orderBy(col("hour"), col("event_type")).collect()
      val batch = EventsStream
        .hourlyAggBatch(Tables(spark, "/root/testdata/sf0.001", "events"))
        .orderBy(col("hour"), col("event_type")).collect()
      assert(streamed.length == batch.length)
      assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark deduplicates replayed files") {
    val dir = stageDir(2) // the same events delivered twice
    val q = EventsStream.deduped(EventsStream.read(spark, dir))
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val n = spark.table("deduped").count()
      val distinct = Tables(spark, "/root/testdata/sf0.001", "events")
        .select("event_id").distinct().count()
      assert(n == distinct)
    } finally q.stop()
  }
}
