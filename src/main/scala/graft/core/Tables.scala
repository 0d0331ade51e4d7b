package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit}
import org.apache.spark.sql.types._

/** Loader for the driver testdata layout (`TESTDATA.md`): one parquet file
  * per table under `\$dir/`. At 100 TB these would be partitioned parquet
  * directories; `spark.read.parquet` handles both shapes unchanged, and all
  * downstream code goes through this single entry point so partition-aware
  * reading (bucketing, partition pruning) can be added here once.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The events `ts` column has shipped in more than one physical parquet
    * encoding across testdata generations; sniff the footer and adapt
    * instead of assuming one (see [[EventsLayout]]).
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    val layout = EventsLayout.sniff(spark, s"$dir/events.parquet")
    layout.normalize(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Time-sliced events scan with the range predicate applied in the RAW
    * `ts` encoding BEFORE normalization, so it pushes down to the parquet
    * scan and prunes row groups (see [[EventsLayout.rawTsRange]] — the
    * normalized column's filter cannot push). The 100 TB access path for
    * "give me this hour/day of the log". Bounds are `[startUs, endUs)`
    * epoch micros.
    */
  def eventsBetween(spark: SparkSession, dir: String,
      startUs: Long, endUs: Long): DataFrame = {
    val layout = EventsLayout.sniff(spark, s"$dir/events.parquet")
    layout.normalize(
      spark.read.parquet(s"$dir/events.parquet")
        .filter(layout.rawTsRange(startUs, endUs)))
  }
}

/** Physical encoding of the events `ts` column, sniffed from the parquet
  * FOOTER (a schema-only read — no data scan). Observed encodings across
  * testdata generations:
  *
  *  - int64 TIMESTAMP(NANOS): Spark's reader rejects it unless
  *    `spark.sql.legacy.parquet.nanosAsLong=true`, which surfaces it as a
  *    raw nanos `LongType` → convert with `timestamp_micros(ts div 1000)`.
  *    A plain BIGINT column holding epoch nanos (spec fixtures, scale
  *    probes) sniffs identically and needs the identical conversion.
  *  - timestamp[us] with isAdjustedToUTC=false → Spark reads
  *    `TimestampNTZType` → cast to the session `TimestampType` (sessions
  *    here pin UTC, so wall-clock == instant and the micros are unchanged).
  *  - timestamp[us/ms] adjusted to UTC (or INT96) → already
  *    `TimestampType` → pass through.
  *
  * Every events reader — batch [[Tables]], streaming `EventsStream.read`,
  * and the gates that stage feed files — goes through this one sniff, so a
  * testdata regeneration that flips the encoding is a no-op, not 13 broken
  * queries and 6 silently-wrong streaming answers (the round-8 failure
  * mode: schema-on-read drift produces wrong answers, not errors — the
  * variant that would poison a 100 TB backfill).
  */
final case class EventsLayout(schema: StructType, tsType: DataType) {

  /** Rewrite `ts` to the one downstream shape every operator assumes: a
    * session-zone `TimestampType` at micros precision. */
  def normalize(df: DataFrame): DataFrame = tsType match {
    case LongType =>
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case TimestampNTZType =>
      df.withColumn("ts", col("ts").cast(TimestampType))
    case TimestampType => df
    case other => throw new IllegalStateException(
      s"events.ts has unsupported physical type $other — supported: " +
        "int64 epoch nanos (legacy), timestamp[us] (NTZ or UTC-adjusted)")
  }

  /** Shift a raw `ts` column forward by whole days, PRESERVING the raw
    * encoding — for staging sentinel/late rows back into a feed directory
    * that the stream re-reads under this same layout. */
  def shiftTsDays(tsCol: Column, days: Long): Column = tsType match {
    case LongType => (tsCol + lit(days * 86400L * 1000000000L)).cast(LongType)
    case _ => tsCol + expr(s"interval $days days")
  }

  /** Shift by raw seconds (same contract as [[shiftTsDays]]). */
  def shiftTsSeconds(tsCol: Column, seconds: Long): Column = tsType match {
    case LongType => (tsCol + lit(seconds * 1000000000L)).cast(LongType)
    case _ => tsCol + expr(s"interval $seconds seconds")
  }

  /** `[startUs, endUs)` range predicate phrased against the RAW `ts`
    * encoding, so it PUSHES DOWN to the parquet scan. Filtering the
    * NORMALIZED column cannot push: `timestamp_micros(ts div 1000) >= X`
    * is an expression over the source column, and the scan would read
    * every row group of a 100 TB log to evaluate it. Phrased raw, each
    * encoding's predicate is a plain column comparison (long or
    * timestamp) that reaches `PushedFilters` and prunes row groups via
    * min/max stats — at scale, the difference between reading an hour
    * and reading years. Pinned by PlanAuditSpec for both encodings.
    */
  def rawTsRange(startUs: Long, endUs: Long): Column = {
    def ntz(us: Long) = lit(java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L).toInt * 1000,
      java.time.ZoneOffset.UTC))
    tsType match {
      case LongType =>
        col("ts") >= lit(startUs * 1000L) && col("ts") < lit(endUs * 1000L)
      case TimestampNTZType =>
        // NTZ literals compare wall-clock; sessions pin UTC so wall == us.
        col("ts") >= ntz(startUs) && col("ts") < ntz(endUs)
      case _ =>
        col("ts") >= expr(s"timestamp_micros(${startUs}L)") &&
          col("ts") < expr(s"timestamp_micros(${endUs}L)")
    }
  }
}

object EventsLayout {
  private[core] val NanosFlag = "spark.sql.legacy.parquet.nanosAsLong"

  /** Sniff the layout of an events parquet file or directory. The legacy
    * nanos flag must be on to even schema-read a TIMESTAMP(NANOS) footer;
    * the prior session value is restored UNLESS the layout turns out to be
    * the nanos/long encoding — every later data scan of that table re-reads
    * the footer and needs the flag, so only then does it stay set. A
    * non-nanos sniff leaves the session conf exactly as it found it. */
  def sniff(spark: SparkSession, path: String): EventsLayout = {
    withNanosFlag(spark) { restore =>
      val schema = spark.read.parquet(path).schema
      require(schema.fieldNames.contains("ts"),
        s"events at $path has no `ts` column; found ${schema.fieldNames.mkString(", ")}")
      val layout = EventsLayout(schema, schema("ts").dataType)
      if (layout.tsType != LongType) restore()
      layout
    }
  }

  /** Run `body` with the nanos flag set; `body` receives a restore thunk
    * putting the flag back to its pre-call state (set-or-unset). On throw,
    * the flag is always restored. */
  private[core] def withNanosFlag[A](spark: SparkSession)(
      body: (() => Unit) => A): A = {
    val prior = spark.conf.getOption(NanosFlag)
    val restore: () => Unit = () => prior match {
      case Some(v) => spark.conf.set(NanosFlag, v)
      case None => spark.conf.unset(NanosFlag)
    }
    spark.conf.set(NanosFlag, "true")
    try body(restore)
    catch { case scala.util.control.NonFatal(e) => restore(); throw e }
  }
}

/** One driver-checkable query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle.
  * Column names/aliases MUST match between `fn`'s output and `oracle`.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack { def queries: Seq[Q] }

/** Registry for DataFrames persisted inside operator pipelines (dedup /
  * similarity caches). A persist without a matching unpersist pins executor
  * memory for the life of the session — harmless in a one-query job, but a
  * session that runs the whole query inventory (Bench, Verify) would
  * accumulate every pipeline's cache. Pipelines register their persists
  * here; the harness calls [[releaseAll]] between queries.
  */
object Caches {
  private val registered =
    scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  def persist(df: DataFrame): DataFrame = synchronized {
    val p = df.persist()
    registered += p
    p
  }

  /** Release ONE registered frame as soon as its last consumer ran —
    * what a long streamed ingest needs (one cached frame per
    * micro-batch would otherwise accumulate until releaseAll). */
  def release(df: DataFrame): Unit = synchronized {
    df.unpersist(blocking = false)
    val i = registered.indexWhere(_ eq df)
    if (i >= 0) registered.remove(i)
  }

  def releaseAll(): Unit = synchronized {
    registered.foreach(_.unpersist(blocking = false))
    registered.clear()
  }
}

/** Lineage truncation for iterative DataFrame algorithms (connected
  * components, label propagation): a plain persist skips re-EXECUTION but
  * not re-PLANNING — each round's plan would embed the whole upstream tree
  * again, doubling per round until Catalyst analysis dominates. Truncation
  * materializes the frame and restarts lineage.
  *
  * `localCheckpoint()` (default) keeps blocks on executors — fast, but an
  * executor loss makes the frame unrecomputable. On a real cluster set
  * `spark.graft.checkpoint.reliable=true` (plus
  * `sparkContext.setCheckpointDir` to a DFS path) to switch every
  * truncation point to reliable `checkpoint()`: blocks land on the DFS and
  * survive executor churn — the right trade at 100 TB, where a multi-round
  * job outliving any single executor is the expectation, not the edge case.
  */
object Checkpoints {
  val ReliableConf = "spark.graft.checkpoint.reliable"

  def truncate(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable =
      spark.conf.getOption(ReliableConf).exists(_.trim.equalsIgnoreCase("true"))
    if (reliable) {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableConf=true requires sparkContext.setCheckpointDir(<dfs path>)")
      df.checkpoint()
    } else df.localCheckpoint()
  }
}
