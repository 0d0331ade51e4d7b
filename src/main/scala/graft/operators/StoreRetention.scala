package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.CatalogMaterializer

/** Targeted deletion from the partition-per-batch incremental stores —
  * the takedown / right-to-be-forgotten path. A 100 TB corpus pipeline
  * WILL receive removal requests (DMCA, GDPR, opt-outs), and the naive
  * answers are both wrong at scale: rebuilding the store without the
  * victims re-pays the full pass, and filtering victims at read time
  * leaves the data on disk (not deletion at all, and a per-probe tax
  * forever). Here a delete rewrites ONLY the batch partitions that
  * contain victim rows:
  *
  *  1. locate affected partitions (semi-join the store with the victim
  *     ids — the scan prunes row groups via parquet min/max stats when
  *     ids cluster, and nothing else is read twice);
  *  2. rewrite those partitions minus the victims in one dynamic
  *     partition overwrite (job-atomic per commit);
  *  3. DROP any partition the delete emptied — the empty-increment
  *     contract: dynamic overwrite with an empty frame touches nothing,
  *     which would silently RETAIN the victim rows.
  *
  * Victims arrive as a DataFrame of ids (takedown lists run to millions
  * — a join, never an `isin` literal), joined by a caller-supplied
  * condition so multi-column stores can match on any side. Deleting is
  * idempotent: re-running the same victim set finds no affected
  * partitions and touches nothing.
  */
object StoreRetention {

  final case class DeleteStats(relation: String, affected: Seq[String],
      dropped: Seq[String], rowsDeleted: Long) {
    override def toString: String =
      s"$relation: $rowsDeleted rows from ${affected.size} partitions " +
        s"(${dropped.size} emptied)"
  }

  private def mat = new CatalogMaterializer

  /** Delete every row of `relation` matching `ids` under `cond`
    * (`cond(store, ids)` builds the join predicate from the two sides'
    * columns). Rewrites only the partitions containing matches. */
  def deleteRows(spark: SparkSession, relation: String, ids: DataFrame,
      cond: (DataFrame, DataFrame) => Column,
      partCol: String = "batch_id"): DeleteStats = {
    val t = spark.table(relation)
    val affected = t.join(ids, cond(t, ids), "left_semi")
      .select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toIndexedSeq
    if (affected.isEmpty)
      return DeleteStats(relation, Nil, Nil, 0L)
    val scoped = t.filter(col(partCol).isin(affected: _*))
    val before = scoped.count()
    // The overwrite replaces partitions the remaining-rows plan reads;
    // truncate lineage first (affected partitions only — bounded by the
    // victim set's spread, not the store).
    val remaining = scoped.join(ids, cond(scoped, ids), "left_anti")
      .localCheckpoint()
    val kept = remaining.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    if (kept.nonEmpty)
      mat.materializeIncremental(spark, relation, remaining, Seq(partCol))
    val dropped = affected.filterNot(kept)
    dropped.foreach(p => mat.dropPartition(spark, relation, partCol, p))
    DeleteStats(relation, affected, dropped, before - remaining.count())
  }

  /** Remove documents from a [[DedupStore]]: their shingles, their LSH
    * index rows, and every verified pair touching them (both sides —
    * two equi-anti passes, not one OR-join that would fall off the
    * hash-join path). `ids` carries one `doc_id` column. */
  def deleteDocs(spark: SparkSession, store: DedupStore,
      ids: DataFrame): Seq[DeleteStats] = {
    def byDoc(rel: String) = deleteRows(spark, rel, ids,
      (t, v) => t("doc_id") === v("doc_id"))
    // Three independent chains run concurrently (guide §2.6): the
    // shingle and index deletes touch their own relations, and the two
    // pair-side passes stay SEQUENTIAL within their chain — the doc_b
    // pass reads the table the doc_a pass rewrote; interleaving them
    // would recompute both `remaining` sets from the pre-delete table
    // and the second commit would resurrect the first pass's deletes.
    val out = new Array[Seq[DeleteStats]](3)
    graft.core.Par.run(
      () => out(0) = Seq(byDoc(store.shinglesRel)),
      () => out(1) = Seq(byDoc(store.bucketsRel)),
      () => out(2) = Seq(
        deleteRows(spark, store.pairsRel, ids,
          (t, v) => t("doc_a") === v("doc_id")),
        deleteRows(spark, store.pairsRel, ids,
          (t, v) => t("doc_b") === v("doc_id"))))
    out.toIndexedSeq.flatten
  }

  /** Remove documents from a [[PostingsStore]]: their postings and
    * doc_lengths rows leave partition-scoped. Every df-dependent score
    * SELF-HEALS: BM25's df, n_docs and avgdl are recomputed from the
    * surviving postings/lengths at query time (nothing in the store
    * caches a corpus statistic), so post-delete rankings equal a
    * from-scratch build over corpus-minus-victims — the t28 gate pins
    * that equality against the one-shot oracle. */
  def deletePostings(spark: SparkSession, store: PostingsStore,
      ids: DataFrame): Seq[DeleteStats] = {
    // Independent relations — concurrent partition rewrites (guide §2.6).
    val out = new Array[DeleteStats](2)
    graft.core.Par.run(
      Seq(store.postingsRel, store.lengthsRel).zipWithIndex.map {
        case (rel, i) => () => out(i) = deleteRows(spark, rel, ids,
          (t, v) => t("doc_id") === v("doc_id"))
      }: _*)
    out.toIndexedSeq
  }

  /** Remove vectors from a [[VectorIndex]]'s codes table. The frozen
    * codebook keeps its seed rows: PQ sub-codebooks and coarse
    * centroids are LEARNED STATISTICS over the corpus, not retrievable
    * copies of any vector — deleting a vector removes it from every
    * probe result; whether derived statistics must also be retrained
    * is a policy decision that maps to an explicit index rebuild. */
  def deleteVectors(spark: SparkSession, index: VectorIndex,
      ids: DataFrame): DeleteStats =
    deleteRows(spark, index.codesRel, ids,
      (t, v) => t("vid") === v("vec_id"))
}
