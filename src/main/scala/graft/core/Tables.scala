package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read nanos as long and convert to a regular
    * micros timestamp (UTC session) — sub-microsecond precision is dropped,
    * matching what every downstream aggregate needs.
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.expr
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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
