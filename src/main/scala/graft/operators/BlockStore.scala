package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.CatalogMaterializer

/** Persisted, incrementally-maintained duplicate-BLOCK state — the
  * lifecycle twin of [[Dedup.blockDedup]] (d29), the same discipline
  * every other dedup tier has ([[DedupStore]] d10, [[SpanStore]] d21):
  * a crawl lands daily snapshots, and each snapshot must excise blocks
  * already seen in HISTORY without ever re-reading history's text.
  *
  * Two engine-managed tables, partition-per-batch with dynamic
  * partition overwrite (replay-idempotent — a crashed ingest re-runs
  * its own batch and overwrites exactly its own partitions):
  *
  *  - `blocks(fp, batch_id)` — the distinct block fingerprints each
  *    batch INTRODUCED (16 bytes per novel block; text never persists);
  *  - `docs(id, n_blocks, kept_blocks, text_deduped, batch_id)` — each
  *    batch's reassembled output rows.
  *
  * Incremental contract: batches arrive in id order (later batches
  * carry larger doc ids — the crawl-snapshot convention), so
  * "canonical first occurrence" is the same ordering whether computed
  * one-shot over the union or batch-by-batch: a block seen in any
  * PRIOR batch excises every occurrence in this one (one semi-join
  * against the ≤ distinct-block-count fingerprint table); a block new
  * to this batch resolves its canonical occurrence batch-locally with
  * d29's min(struct) aggregate. The d29 oracle over the accumulated
  * corpus therefore verifies the whole history — append ≡ one-shot.
  */
final case class BlockStore(schemaName: String) {
  val blocksRel: String = s"$schemaName.blocks"
  val docsRel: String = s"$schemaName.docs"
}

object BlockStore {

  private def mat = new CatalogMaterializer

  /** Drop both store tables — a fresh start for gates/specs. */
  def reset(spark: SparkSession, store: BlockStore): Unit =
    Seq(store.blocksRel, store.docsRel)
      .foreach(mat.dropRelation(spark, _))

  /** Build: dedup the base corpus one-shot (exactly [[Dedup
    * .blockDedup]]) and seed the fingerprint table with every distinct
    * block the base corpus contains (kept OR excised — an excised
    * block was still SEEN, and a later batch repeating it must not
    * resurrect it as novel). REPLACES any existing store. */
  def build(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, blockWords: Int, store: BlockStore,
      batchId: String = "base"): Unit = {
    reset(spark, store)
    writeBatch(spark, docs, idCol, textCol, blockWords, store, batchId,
      priorFps = None)
  }

  /** Append one snapshot: occurrences of blocks already in the store
    * are excised outright; blocks new to this batch dedup batch-locally
    * (d29's min(struct) keeper), then land in the fingerprint table so
    * the NEXT batch sees them. Re-running a batchId overwrites exactly
    * its own partitions. */
  def append(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, blockWords: Int, store: BlockStore,
      batchId: String): Unit =
    // "Prior" EXCLUDES this batch's own partition: on an at-least-once
    // replay (crash after the store writes, before the offset commit)
    // the crashed attempt's fingerprints are already in the table, and
    // an unfiltered read would excise the entire replayed batch against
    // ITSELF — every doc would come back empty. Partition-pruned by
    // batch_id; StreamCrashReplaySpec kills exactly this seam.
    writeBatch(spark, docs, idCol, textCol, blockWords, store, batchId,
      priorFps = Some(spark.table(store.blocksRel)
        .filter(col("batch_id") =!= batchId).select(col("fp"))))

  /** The accumulated deduped corpus (every batch's output rows). */
  def deduped(spark: SparkSession, store: BlockStore): DataFrame =
    spark.table(store.docsRel)
      .select(col("id"), col("n_blocks"), col("kept_blocks"),
        col("text_deduped"))

  private def writeBatch(spark: SparkSession, docs: DataFrame,
      idCol: String, textCol: String, blockWords: Int,
      store: BlockStore, batchId: String,
      priorFps: Option[DataFrame]): Unit = {
    // The cut/keeper/reassembly pipeline is SHARED with the one-shot
    // operator (Dedup.blockCount/blockCut/markCanonical/blockRebuild)
    // — one owner of the block convention, so the incremental store
    // cannot silently drift from d29.
    val counted = Dedup.blockCount(docs, idCol, textCol, blockWords)
    val blocks = Dedup.blockCut(counted, blockWords)
    // History excision: one left-anti semi-join against the 16-byte
    // fingerprint table — history text is never read, never shuffled.
    // n_blocks is counted on `counted` BEFORE this join: a doc whose
    // blocks are ALL already in history loses every row here, but its
    // true block count must still report (the st16-at-sf0.01 case —
    // a fully-dup doc landing in a later micro-batch than its source).
    // Persisted: both partition writes below consume this frame, and
    // without the persist each re-runs the tokenize + anti-join scan
    // (the d25 lesson: find the redundant work before 10× does).
    val novel = graft.core.Caches.persist(priorFps match {
      case Some(fps) => blocks.join(fps, Seq("fp"), "left_anti")
      case None => blocks
    })
    writePartition(spark, store.docsRel, batchId,
      Dedup.blockRebuild(counted, Dedup.markCanonical(novel)))
    // Every fp this batch INTRODUCED (kept or batch-locally excised) —
    // novel is already prior-free, so distinct fps are the delta.
    writePartition(spark, store.blocksRel, batchId,
      novel.select(col("fp")).distinct())
  }

  private def writePartition(spark: SparkSession, rel: String,
      batchId: String, df: DataFrame): Unit = {
    mat.dropPartition(spark, rel, "batch_id", batchId)
    mat.materializeIncremental(spark, rel,
      df.withColumn("batch_id", lit(batchId)), Seq("batch_id"))
  }
}
