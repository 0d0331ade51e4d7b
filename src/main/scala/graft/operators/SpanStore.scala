package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.CatalogMaterializer

/** Persisted, incrementally-maintained SPAN-dedup state — the
  * [[DedupStore]]/[[SemanticStore]] lifecycle applied to the substring
  * tier ([[Dedup.spanDedup]]): a daily crawl rewrites *today's batch
  * against yesterday's grams* instead of re-indexing the accumulated
  * corpus. The store is one engine-managed table:
  *
  *  - `span_grams(gh, batch_id)` — every DISTINCT k-gram hash the
  *    corpus has ever contained, partition-per-batch. Existence is all
  *    the increment needs: the first-occurrence rule is PREFIX-STABLE
  *    under id-ordered batches (a new document's (doc_id, start) can
  *    never undercut history's), so any gram already in the store makes
  *    every batch occurrence a duplicate, and history documents NEVER
  *    rewrite — the same append-stability contract as the pipeline's
  *    predecessor rule (CorpusPipeline, p02). Callers must append
  *    batches with ids above history's (enforced nowhere cheaper than
  *    the contract: an out-of-order id would claim first-occurrence the
  *    one-shot pass gives to the smaller id).
  *
  * Work per increment is batch-proportional: the batch's gram starts
  * probe the store with one semi-join shape (a left join on the 16-byte
  * hash), batch-internal firsts come from the batch's own grams, and
  * only the batch's NEW distinct grams append (anti-join), so replaying
  * a batch (crash recovery) overwrites exactly its own partition.
  *
  * Invariant after N appends (gate d21): each batch's rewrite equals
  * the one-shot [[Dedup.spanDedup]] over the UNION of all batches,
  * restricted to that batch's documents.
  */
final case class SpanStore(schemaName: String) {
  val gramsRel: String = s"$schemaName.span_grams"
}

object SpanStore {

  private def mat = new CatalogMaterializer

  /** Drop the store — a fresh start for gates/specs. */
  def reset(spark: SparkSession, store: SpanStore): Unit =
    mat.dropRelation(spark, store.gramsRel)

  /** Full (re)build: the corpus as batch zero. Returns the corpus's
    * rewrite (the one-shot [[Dedup.spanDedup]]) and stores its distinct
    * gram hashes. */
  def build(spark: SparkSession, corpus: DataFrame, idCol: String,
      textCol: String, k: Int, store: SpanStore,
      batchId: String = "base"): DataFrame = {
    reset(spark, store)
    val grams = Dedup.spanGramStarts(
      Dedup.spanTokens(corpus, idCol, textCol), k)
    writeBatch(spark, store, batchId, grams.select(col("gh")).distinct())
    Dedup.spanDedup(corpus, idCol, textCol, k)
  }

  /** Incremental append: rewrite `batch` against history + itself and
    * persist the batch's new grams. A gram start is duplicate iff its
    * hash exists in the store (history always precedes the batch) OR an
    * earlier (doc_id, start) within the batch owns it. */
  def appendBatch(spark: SparkSession, batch: DataFrame, idCol: String,
      textCol: String, k: Int, store: SpanStore,
      batchId: String): DataFrame = {
    val toks = Dedup.spanTokens(batch, idCol, textCol)
    val grams = graft.core.Caches.persist(Dedup.spanGramStarts(toks, k))
    // The history snapshot is pinned BY NAME at call time (one driver
    // row per batch — bounded): the returned rewrite is lazy, and a
    // plain =!= batchId exclusion would let a plan executed after a
    // LATER append see future batches' grams — marking this batch's
    // first occurrences duplicate against documents that come after it.
    // Pinning also excludes this batchId's own half-written partition
    // on crash replay; both filters partition-prune.
    val existing = spark.table(store.gramsRel)
      .select(col("batch_id")).distinct().collect()
      .map(_.getString(0)).toSeq.filterNot(_ == batchId)
    val known = spark.table(store.gramsRel)
      .filter(col("batch_id").isin(existing: _*))
      .select(col("gh"), lit(true).as("in_store"))
    val withStore = grams.join(known, Seq("gh"), "left")
    val dupStarts = withStore
      .join(Dedup.spanFirstOccurrences(grams), col("gh") === col("gh2"))
      .filter(coalesce(col("in_store"), lit(false)) ||
        !(col("doc_id") === col("fd") && col("i") === col("fs")))
    val rewritten = Dedup.spanRewrite(toks, dupStarts, k)
    val newGrams = grams.select(col("gh")).distinct()
      .join(known, Seq("gh"), "left_anti")
    writeBatch(spark, store, batchId, newGrams)
    rewritten
  }

  private def writeBatch(spark: SparkSession, store: SpanStore,
      batchId: String, grams: DataFrame): Unit = {
    // Clear-then-write: dynamic overwrite with an empty increment
    // touches nothing, so a replay whose recompute came up empty would
    // otherwise keep stale rows (the DedupStore contract).
    mat.dropPartition(spark, store.gramsRel, "batch_id", batchId)
    mat.materializeIncremental(spark, store.gramsRel,
      grams.withColumn("batch_id", lit(batchId)), Seq("batch_id"))
  }
}
