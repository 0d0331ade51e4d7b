package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.CatalogMaterializer

/** Persisted, incrementally-maintained dedup state — the shape a
  * production corpus pipeline actually runs. The one-shot operators in
  * [[Dedup]] re-shingle the WHOLE corpus every invocation; a daily-crawl
  * pipeline instead dedupes *today's batch against yesterday's store*
  * and appends: per-increment work (shingle, signature, candidate join,
  * verify, write) is proportional to the BATCH, never the accumulated
  * corpus. At 100 TB of history and a 100 GB daily crawl that is the
  * difference between a 15-minute nightly job and re-running the whole
  * pass.
  *
  * The store is three engine-managed tables (the same incremental sink
  * the model runner's `materialized='incremental'` models use —
  * partition-per-batch parquet with dynamic partition overwrite, so
  * REPLAYING a batch is idempotent, the crash-recovery property a
  * nightly pipeline needs):
  *
  *  - `doc_shingles(doc_id, shingles, batch_id)` — each document's
  *    hashed-shingle set, the verification side of every future
  *    candidate pair (new batches never re-shingle stored text);
  *  - `minhash_buckets(doc_id, band, bucket, batch_id)` — the LSH
  *    index rows, per document (one definition of the bucket key —
  *    [[Dedup.bandedBuckets]] — so today's probe collides with an
  *    index row written months ago);
  *  - `dup_pairs(doc_a, doc_b, jaccard, batch_id)` — every verified
  *    near-dup pair known so far; `doc_a < doc_b` throughout.
  *
  * Invariant after N appends: `dup_pairs` equals the one-shot
  * [[Dedup.minhashLshPairs]] over the UNION of all batches (gate d10
  * pins this against the full-recompute DuckDB oracle; StoreSpec pins
  * replay idempotency and multi-batch accumulation).
  *
  * Scale notes: the batch side collapses exact-duplicate clusters
  * before probing (a batch with m copies of one page probes once, and
  * members inherit the representative's pairs), while the store keeps
  * per-document index rows — so a heavily-duplicated STORE bucket costs
  * candidates linear in its membership, the price of not maintaining a
  * global cluster table across increments. The candidate join is a
  * plain equi-join on (band, bucket): shuffle-partitioned by bucket
  * key, AQE splits skewed buckets, and the store side arrives straight
  * off parquet with no recomputation (pinned by StoreSpec's plan
  * audit: the delta plan scans `doc_shingles`/`minhash_buckets`, and
  * hashing work appears only above the batch input).
  */
final case class DedupStore(schemaName: String) {
  val shinglesRel: String = s"$schemaName.doc_shingles"
  val bucketsRel: String = s"$schemaName.minhash_buckets"
  val pairsRel: String = s"$schemaName.dup_pairs"
}

object DedupStore {
  private val NumHashes = 64
  private val Bands = 16

  private def mat = new CatalogMaterializer

  /** Drop all store tables — a fresh start for gates/specs; production
    * pipelines never call this. */
  def reset(spark: SparkSession, store: DedupStore): Unit =
    Seq(store.shinglesRel, store.bucketsRel, store.pairsRel)
      .foreach(mat.dropRelation(spark, _))

  /** Full (re)build: treat the whole corpus as batch zero. REPLACES any
    * existing store first — without the reset, a rebuild over a store
    * that had accumulated batches would dynamic-overwrite only the
    * `base` partition and silently retain every stale batch partition
    * next to the fresh build (the CREATE OR REPLACE footgun). */
  def build(spark: SparkSession, corpus: DataFrame, idCol: String,
      textCol: String, threshold: Double, store: DedupStore,
      batchId: String = "base"): Unit = {
    reset(spark, store)
    val sh = Dedup.shingled(corpus, idCol, textCol)
    val pairs = Dedup.minhashLshPairs(corpus, idCol, textCol, threshold,
      NumHashes, Bands)
    writeBatch(spark, store, batchId, sh, Dedup.bandedBuckets(sh), pairs)
  }

  /** Incremental append: dedupe `batch` against the persisted store plus
    * itself, write the batch's partition into all three tables, and
    * return the NEW pairs (batch×store ∪ batch×batch). Work is
    * batch-proportional: stored documents are never re-shingled or
    * re-signed — their shingles and index rows stream off parquet.
    * Re-running the same `batchId` (crash replay) overwrites exactly its
    * own partitions, leaving every other batch untouched.
    */
  def appendBatch(spark: SparkSession, batch: DataFrame, idCol: String,
      textCol: String, threshold: Double, store: DedupStore,
      batchId: String): DataFrame = {
    val shB = Dedup.shingled(batch, idCol, textCol)
    val newPairs = deltaPairs(spark, batch, idCol, textCol, threshold,
      store, batchId)
    writeBatch(spark, store, batchId, shB, Dedup.bandedBuckets(shB),
      newPairs)
    newPairs
  }

  /** The compute half of [[appendBatch]]: every pair the batch adds
    * (batch×store ∪ batch×batch), nothing written. Split out so probes
    * can time the increment's COMPUTE term apart from the three
    * partition commits, and so a pipeline can inspect what a batch
    * would add before committing it. */
  def deltaPairs(spark: SparkSession, batch: DataFrame, idCol: String,
      textCol: String, threshold: Double, store: DedupStore,
      batchId: String): DataFrame = {
    val shB = Dedup.shingled(batch, idCol, textCol)
    // Batch-internal pairs: the one-shot operator on the batch alone
    // (duplicate-cluster collapse inside, same banding constants).
    val selfPairs = Dedup
      .minhashLshPairs(batch, idCol, textCol, threshold, NumHashes, Bands)
    // Batch-vs-store: collapse the batch to exact-set representatives,
    // band them, and probe the persisted index with one equi-join.
    val groupsB = Dedup.clusters(shB)
    val repsB = groupsB.select(col("doc_id"), col("shingles"))
    // The store side excludes this batch's own partition: a crash replay
    // (this batchId already half-written) must not pair the batch with
    // itself through the store — and the exclusion is a partition-pruned
    // filter, not a scan. Also keeps the lazy pairs plan correct when it
    // executes after writeBatch has landed this batch's shingle rows.
    val storeSh = spark.table(store.shinglesRel)
      .filter(col("batch_id") =!= batchId)
      .select(col("doc_id"), col("shingles"))
    val storeBuckets = spark.table(store.bucketsRel)
      .filter(col("batch_id") =!= batchId)
    val candidates = Dedup.bandedBuckets(repsB, NumHashes, Bands).as("a")
      .join(storeBuckets.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val crossReps = Dedup.verifiedCross(candidates, shB, storeSh, threshold)
    // Expand through the batch's exact clusters (the store side is
    // per-document already); normalize to doc_a < doc_b.
    val cross = crossReps
      .join(groupsB.select(col("doc_id").as("doc_a"), col("members")),
        "doc_a")
      .select(explode(col("members")).as("a"), col("doc_b"),
        col("jaccard"))
      .select(least(col("a"), col("doc_b")).as("doc_a"),
        greatest(col("a"), col("doc_b")).as("doc_b"), col("jaccard"))
    selfPairs
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .union(cross)
  }

  /** Every near-dup pair known to the store (union of all batches). */
  def allPairs(spark: SparkSession, store: DedupStore): DataFrame =
    spark.table(store.pairsRel)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

  private def writeBatch(spark: SparkSession, store: DedupStore,
      batchId: String, sh: DataFrame, buckets: DataFrame,
      pairs: DataFrame): Unit = {
    def tag(df: DataFrame) = df.withColumn("batch_id", lit(batchId))
    // The three writes are independent (three relations) and each is
    // correct against any interleaving of the others: the pairs plan
    // reads the store tables THROUGH the `batch_id =!= batchId`
    // exclusion filter (appendBatch), so a sibling write landing this
    // batch's shingle/index rows mid-read is pruned out, and the
    // one-shot build starts from reset (empty) tables. So they run
    // CONCURRENTLY (guide §2.6) — three sequential partition commits
    // collapse to ~the slowest one. Each write clears its own partition
    // up front — dynamic overwrite with an EMPTY increment touches
    // nothing, so a replay whose recompute came up empty would
    // otherwise keep the stale rows (the microbatch empty-period
    // contract, Materializer.dropPartition).
    graft.core.Par.run(
      Seq(store.pairsRel -> pairs, store.shinglesRel -> sh,
        store.bucketsRel -> buckets).map { case (rel, df) => () => {
          mat.dropPartition(spark, rel, "batch_id", batchId)
          mat.materializeIncremental(spark, rel, tag(df), Seq("batch_id"))
        }
      }: _*)
  }
}
