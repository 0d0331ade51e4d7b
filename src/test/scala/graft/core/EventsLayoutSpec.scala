package graft.core

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.streaming.EventsStream

/** The source-layout contract: the engine must produce IDENTICAL results
  * for the same event rows regardless of the physical `ts` encoding the
  * driver ships — int64 epoch-nanos (legacy TESTDATA generations) or
  * timestamp[us] (current). Round 8 proved what happens without this
  * pin: a regeneration flipped the encoding and 13 batch queries errored
  * while 6 streaming gates returned silently wrong answers. This spec
  * stages the SAME rows in BOTH encodings and demands batch and
  * streaming aggregations agree bit-for-bit across them, so the next
  * regeneration is a no-op.
  */
class EventsLayoutSpec extends SparkSuite {

  /** The canonical rows, as (event_id, epoch_micros, user_id, type,
    * value, props) — derived from the real sf0.001 table so the fixture
    * covers real time distribution, not a toy. */
  private lazy val canonical: DataFrame =
    Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("event_type"), col("value"), col("props"))

  /** Write the canonical rows with ts as int64 epoch nanos. */
  private def stageNanos(): String = {
    val dir = Files.createTempDirectory("graft-enc-nanos").toString
    canonical
      .select(col("event_id"), (col("us") * 1000L).as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Write the canonical rows with ts as timestamp[us] NTZ (the current
    * driver layout: TIMESTAMP(MICROS, isAdjustedToUTC=false)). */
  private def stageMicros(): String = {
    val dir = Files.createTempDirectory("graft-enc-us").toString
    canonical
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("sniff classifies both encodings and normalize yields TimestampType") {
    val nanosDir = stageNanos()
    val microsDir = stageMicros()
    val ln = EventsLayout.sniff(spark, s"$nanosDir/events.parquet")
    val lu = EventsLayout.sniff(spark, s"$microsDir/events.parquet")
    assert(ln.tsType == LongType)
    assert(lu.tsType == TimestampNTZType)
    assert(Tables(spark, nanosDir, "events").schema("ts").dataType
      == TimestampType)
    assert(Tables(spark, microsDir, "events").schema("ts").dataType
      == TimestampType)
  }

  test("batch hourly aggregation is identical across both ts encodings") {
    def agg(dir: String) = EventsStream
      .hourlyAggBatch(Tables(spark, dir, "events"))
      .orderBy(col("hour"), col("event_type"))
      .collect().toSeq.map(_.toSeq)
    val a = agg(stageNanos())
    val b = agg(stageMicros())
    assert(a.nonEmpty)
    assert(a == b)
  }

  test("streaming hourly aggregation is identical across both ts encodings") {
    def streamAgg(dir: String, name: String) = {
      val q = EventsStream
        .hourlyAgg(EventsStream.read(spark, s"$dir/events.parquet"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(name).orderBy(col("hour"), col("event_type"))
        .collect().toSeq.map(_.toSeq)
    }
    val a = streamAgg(stageNanos(), "enc_nanos_sink")
    val b = streamAgg(stageMicros(), "enc_us_sink")
    assert(a.nonEmpty)
    assert(a == b)
    // And both equal the batch twin — the full contract.
    val batch = EventsStream
      .hourlyAggBatch(Tables(spark, "/root/testdata/sf0.001", "events"))
      .orderBy(col("hour"), col("event_type")).collect().toSeq.map(_.toSeq)
    assert(a == batch)
  }

  test("time-slice range filter pushes to the parquet scan in BOTH encodings") {
    // The 100 TB access path (Tables.eventsBetween): the range predicate
    // must reach PushedFilters — phrased on the RAW encoding — so the
    // scan prunes row groups instead of reading the full log and
    // filtering post-normalization. And both encodings must slice to the
    // same rows.
    val minUs = canonical.agg(min(col("us"))).head().getLong(0)
    val (lo, hi) = (minUs + 86400000000L, minUs + 172800000000L)
    def sliced(dir: String) = Tables.eventsBetween(spark, dir, lo, hi)
    def scanLine(dir: String): String = sliced(dir)
      .queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("PushedFilters")).getOrElse("")
    for (dir <- Seq(stageNanos(), stageMicros())) {
      val line = scanLine(dir)
      assert(line.contains("GreaterThanOrEqual(ts") &&
        line.contains("LessThan(ts"),
        s"ts range must reach PushedFilters for $dir, scan was: $line")
    }
    val a = sliced(stageNanos()).orderBy(col("event_id"))
      .collect().toSeq.map(_.toSeq)
    val b = sliced(stageMicros()).orderBy(col("event_id"))
      .collect().toSeq.map(_.toSeq)
    assert(a.nonEmpty && a == b)
    // And the slice is a strict, correct subset: exactly the canonical
    // rows whose micros fall in [lo, hi).
    val expected = canonical.filter(col("us") >= lo && col("us") < hi)
      .count()
    assert(a.size.toLong == expected)
  }

  test("sniff leaves the session conf untouched for non-nanos encodings") {
    // The legacy nanos flag is needed to footer-read TIMESTAMP(NANOS);
    // the sniff must not leak it session-wide when the table isn't nanos
    // (a leaked legacy flag is a latent behavior change for every OTHER
    // parquet read in the session on a future Spark upgrade).
    val key = EventsLayout.NanosFlag
    val microsDir = stageMicros()
    // (conf.getOption reports the registered DEFAULT "false" even when the
    // flag was never set, so "restored" is observable as effective value.)
    // Case 1: flag at its default (false) → back at false after the sniff.
    spark.conf.unset(key)
    EventsLayout.sniff(spark, s"$microsDir/events.parquet")
    assert(spark.conf.getOption(key).contains("false"),
      "micros sniff must restore the default-false flag")
    // Case 2: flag explicitly false → restored to false.
    spark.conf.set(key, "false")
    EventsLayout.sniff(spark, s"$microsDir/events.parquet")
    assert(spark.conf.getOption(key).contains("false"),
      "micros sniff must restore the prior explicit value")
    spark.conf.unset(key)
    // Case 3: nanos layout → the flag MUST stay set (each later data scan
    // of that table re-reads the footer and fails without it) — and the
    // table must actually be readable afterwards.
    val nanosDir = stageNanos()
    EventsLayout.sniff(spark, s"$nanosDir/events.parquet")
    assert(spark.conf.getOption(key).contains("true"),
      "nanos sniff must keep the flag for subsequent data reads")
    assert(Tables(spark, nanosDir, "events").count() > 0)
  }

  test("schema canary leaves the session conf untouched") {
    val key = EventsLayout.NanosFlag
    spark.conf.unset(key)
    SchemaCanary.problems(spark, "/root/testdata/sf0.001")
    assert(spark.conf.getOption(key).contains("false"),
      "canary (footer-only reads) must never leak the legacy flag")
  }

  test("schema canary catches a BIGINT ts holding epoch MILLIS") {
    // The type-family check alone accepts any LongType; a regeneration
    // shipping millis in a BIGINT would pass it and then normalize would
    // misdecode every timestamp by 1e6. The canary's 1-row plausibility
    // probe must catch that.
    val dir = Files.createTempDirectory("graft-canary-millis").toString
    Tables.names.foreach {
      case "events" =>
        canonical
          .select(col("event_id"), (col("us") / 1000L).cast(LongType).as("ts"),
            col("user_id"), col("event_type"), col("value"), col("props"))
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
      case t =>
        spark.read.parquet(sf(s"$t.parquet"))
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val ps = SchemaCanary.problems(spark, dir)
    assert(ps.exists(p => p.startsWith("events.ts:") && p.contains("millis")),
      s"expected a millis-misencoding line, got: $ps")
    // And the true nanos encoding still passes the probe.
    val okDir = stageNanos()
    Tables.names.filterNot(_ == "events").foreach { t =>
      spark.read.parquet(sf(s"$t.parquet"))
        .write.mode("overwrite").parquet(s"$okDir/$t.parquet")
    }
    assert(SchemaCanary.problems(spark, okDir) == Seq.empty)
  }

  test("schema canary is clean on the driver testdata") {
    assert(SchemaCanary.problems(spark, "/root/testdata/sf0.001") == Seq.empty)
    assert(SchemaCanary.problems(spark, "/root/testdata/sf0.01") == Seq.empty)
  }

  test("schema canary fails loudly, naming the drifted column") {
    // Synthetic drift: events.ts as STRING — outside every accepted
    // family — plus a missing column on documents.
    val dir = Files.createTempDirectory("graft-canary-drift").toString
    Tables.names.foreach {
      case "events" =>
        canonical
          .select(col("event_id"),
            timestamp_micros(col("us")).cast("string").as("ts"),
            col("user_id"), col("event_type"), col("value"), col("props"))
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
      case "documents" =>
        spark.read.parquet(sf("documents.parquet")).drop("lang")
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      case t =>
        spark.read.parquet(sf(s"$t.parquet"))
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val ps = SchemaCanary.problems(spark, dir)
    assert(ps.exists(p => p.startsWith("events.ts:") && p.contains("string")),
      s"expected an events.ts drift line, got: $ps")
    assert(ps.exists(_.startsWith("documents.lang:")),
      s"expected a documents.lang missing line, got: $ps")
    assert(ps.size == 2, s"expected exactly the two injected drifts: $ps")
  }
}
