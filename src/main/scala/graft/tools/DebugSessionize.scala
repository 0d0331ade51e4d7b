package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

/** Scratch debugger for event-time-timeout flushing in sessionize. */
object DebugSessionize {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.001/events.parquet"
    val dir = Files.createTempDirectory("dbg-sess").toString
    Files.copy(Paths.get(src), Paths.get(s"$dir/events_1.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val q = EventsStream.sessionize(EventsStream.read(spark, dir))
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    q.processAllAvailable()
    println("AFTER BATCH1 watermark: " + q.lastProgress.eventTime)
    println("rows: " + spark.table("sessions").count())
    val layout = graft.core.EventsLayout.sniff(spark, src)
    val sentinel = spark.read.schema(layout.schema)
      .parquet(src).limit(1)
      .withColumn("user_id", lit(-1L))
      .withColumn("ts", layout.shiftTsDays(col("ts"), 365L))
    sentinel.write.mode("append").parquet(dir)
    q.processAllAvailable()
    println("AFTER SENTINEL watermark: " + q.lastProgress.eventTime)
    println("rows: " + spark.table("sessions").count())
    q.processAllAvailable()
    println("AFTER 3rd watermark: " + q.lastProgress.eventTime)
    println("rows: " + spark.table("sessions").count())
    println("recent progress:")
    q.recentProgress.takeRight(5).foreach(p =>
      println(s"  batch=${p.batchId} numInputRows=${p.numInputRows} " +
        s"eventTime=${p.eventTime}"))
    q.stop()
    spark.stop()
  }
}
