package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Caches
import graft.functions.TextFunctions
import graft.model.CatalogMaterializer

/** The composed corpus pipeline — the end-to-end shape a pretraining
  * data build actually runs, stitched from the tiers this engine gates
  * individually: quality filter → exact dedup → near-dup removal →
  * tokenize → sequence packing → shard manifest. Two entry points:
  *
  *  - [[manifest]] — the ONE-SHOT pass over a whole corpus (gate p01);
  *  - [[buildHistory]] / [[appendBatch]] — the INCREMENTAL pass (gate
  *    p02): state persisted in engine tables, each increment touching
  *    work proportional to the batch, with the invariant that the
  *    accumulated result is bit-equal to the one-shot pass over the
  *    union (the same contract [[DedupStore]] pins for its tier).
  *
  * Stage semantics (deliberately portable so one DuckDB oracle covers
  * both gates):
  *
  *  1. QUALITY — keep documents with 50 ≤ n_words ≤ 100 000 and
  *     alphabetic-word fraction > 0.8 (the Gopher subset of t12 that
  *     needs no line augmentation). Row-local; runs at scan speed.
  *  2. EXACT DEDUP — keep the minimum doc_id per whitespace-normalized
  *     [[TextFunctions.fingerprint]] (d01's rule).
  *  3. NEAR-DUP — the PREDECESSOR rule: drop X iff some exact-surviving
  *     Y < X has jaccard(X, Y) ≥ 0.6. Unlike d07's cluster-canonical
  *     keep, this rule is *prefix-stable*: appending documents with
  *     larger ids can never change an earlier document's fate, which is
  *     exactly what makes the incremental pass equal the one-shot pass.
  *     (d07's connected components are NOT prefix-stable — a new doc can
  *     bridge two old clusters and flip an old representative.) Pairs
  *     come from [[Dedup.minhashLshPairs]] (one-shot) or
  *     [[DedupStore.appendBatch]] (incremental — stored docs are never
  *     re-shingled); a doc is dropped iff it appears as `doc_b`, since
  *     pairs are normalized `doc_a < doc_b`.
  *  4. PACK — survivors laid end to end in doc_id order, cut into
  *     2048-token sequences via [[Packing.packAssignments]] (the
  *     two-phase distributed prefix sum — no single-task window).
  *  5. MANIFEST — per-pack (n_docs, pack_tokens, first_doc, last_doc),
  *     the shard metadata a training loader consumes.
  *
  * Incremental state is one engine schema holding five tables: the
  * three [[DedupStore]] tables plus
  *  - `doc_meta(doc_id, fingerprint, toks, batch_id)` — every QUALITY
  *    survivor (kept or not by later stages): the exact-dedup probe side
  *    for future batches;
  *  - `shards(pack_id, n_docs, pack_tokens, first_doc, last_doc,
  *    batch_id)` — per-batch manifest PARTIALS. A boundary pack started
  *    by one batch and continued by the next lives in two partitions;
  *    [[readManifest]] merges by pack_id (sum/sum/min/max), so no
  *    increment ever rewrites an earlier batch's rows.
  *
  * CONTRACT (the predecessor rule's order requirement): every appended
  * batch's ids are strictly greater than all ids already in the state —
  * the crawl-date ordering a production corpus has for free.
  *
  * 100 TB shape per increment: quality/fingerprint/tokenize are
  * map-only over the batch; the exact-dedup anti-join reads ONE pruned
  * column (`fingerprint`) off the persisted meta table — a shuffled
  * anti-join, no history recompute; near-dup work is [[DedupStore]]'s
  * batch-proportional probe; packing is a prefix sum over batch
  * survivors offset by one scalar aggregate over the manifest. Nothing
  * re-reads history text, ever.
  */
object CorpusPipeline {

  val SeqLen = 2048
  val Threshold = 0.6

  private def mat = new CatalogMaterializer

  final case class State(schemaName: String) {
    val metaRel = s"$schemaName.doc_meta"
    val shardsRel = s"$schemaName.shards"
    val dedup: DedupStore = DedupStore(schemaName)
  }

  /** Stage 1: quality survivors as (idCol, textCol, toks). The
    * alphabetic fraction rounds to 6dp BEFORE thresholding (t12's
    * cross-engine equality trick). */
  def qualitySurvivors(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val words = TextFunctions.tokens(col(textCol))
    val nWords = TextFunctions.tokenCount(col(textCol)).cast("long")
    val alpha = round(
      when(nWords === 0, 0.0).otherwise(
        size(filter(words, w => w.rlike("[A-Za-z]"))).cast("double") /
          nWords), 6)
    docs.select(col(idCol), col(textCol), nWords.as("toks"))
      .filter(col("toks").between(50L, 100000L) && alpha > 0.8)
  }

  /** Stage 2 (one-shot): exact-dedup survivors of a quality frame. */
  private def exactSurvivors(quality: DataFrame, idCol: String,
      textCol: String): DataFrame =
    quality.join(
      Dedup.exactMarked(quality, idCol, textCol)
        .filter(col("kept")).select(col(idCol)),
      Seq(idCol), "left_semi")

  /** Stage 3 (shared): drop every `doc_b` of a qualifying pair. */
  private def dropNearDups(docs: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame =
    docs.join(pairs.select(col("doc_b")),
      docs(idCol) === col("doc_b"), "left_anti")

  /** Stages 4–5 (shared): pack manifest over survivor (idCol, toks)
    * rows; `offset` is the token count already packed by earlier
    * batches (0 for the one-shot pass). */
  private def packPartial(survivors: DataFrame, idCol: String,
      offset: Long): DataFrame =
    Packing.packAssignments(
        survivors.select(col(idCol), col("toks")), idCol, "toks", SeqLen)
      .withColumn("pack_id",
        floor((lit(offset) + col("cum_tokens") - col("toks")) / SeqLen))
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).cast("long").as("pack_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))

  /** ONE-SHOT pipeline: the full corpus in, the shard manifest out. */
  def manifest(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val q = qualitySurvivors(docs, idCol, textCol)
    val kept = Caches.persist(exactSurvivors(q, idCol, textCol))
    val pairs = Dedup.minhashLshPairs(kept, idCol, textCol, Threshold)
    packPartial(dropNearDups(kept, idCol, pairs), idCol, 0L)
  }

  /** ONE-SHOT funnel stats — the corpus "data card": how many documents
    * each stage passed, the surviving token total, the shard count. */
  def funnel(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    val q = Caches.persist(qualitySurvivors(docs, idCol, textCol))
    val kept = Caches.persist(exactSurvivors(q, idCol, textCol))
    val pairs = Dedup.minhashLshPairs(kept, idCol, textCol, Threshold)
    val surv = dropNearDups(kept, idCol, pairs)
    // Single-row aggregates joined via broadcast crossJoins (each side
    // is exactly one row — the repo-wide idiom for scalar assembly).
    docs.agg(count(lit(1)).as("n_raw"))
      .crossJoin(q.agg(count(lit(1)).as("n_quality")))
      .crossJoin(kept.agg(count(lit(1)).as("n_exact")))
      .crossJoin(surv.agg(count(lit(1)).as("n_survivors"),
        sum(col("toks")).cast("long").as("total_tokens")))
      // n_packs is the TRAINING-SEQUENCE count ceil(tokens / SeqLen),
      // not the manifest's distinct pack-id count: packAssignments puts
      // a whole document in floor(cum_before / SeqLen), so a document
      // longer than the window skips intermediate pack ids and the
      // manifest can hold fewer rows than n_packs. The card reports
      // sequences because that is what a training run consumes.
      .withColumn("n_packs",
        ceil(col("total_tokens").cast("double") / SeqLen).cast("long"))
  }

  /** Drop all pipeline state — gates/specs start fresh. */
  def reset(spark: SparkSession, st: State): Unit = {
    DedupStore.reset(spark, st.dedup)
    Seq(st.metaRel, st.shardsRel).foreach(mat.dropRelation(spark, _))
  }

  /** INCREMENTAL bootstrap: run the one-shot stages over the historical
    * corpus and persist all five state tables as batch `base`. */
  def buildHistory(spark: SparkSession, history: DataFrame, idCol: String,
      textCol: String, st: State): Unit = {
    reset(spark, st)
    // The quality and exact-survivor frames feed several independent
    // actions (store build, near-dup drop, meta write, pack write) —
    // persisted via the harness-released cache registry so each scans
    // the corpus once, not once per downstream action.
    val q = Caches.persist(qualitySurvivors(history, idCol, textCol))
    val kept = Caches.persist(exactSurvivors(q, idCol, textCol))
    DedupStore.build(spark, kept, idCol, textCol, Threshold, st.dedup)
    val surv = dropNearDups(kept, idCol,
      DedupStore.allPairs(spark, st.dedup))
    writeBatch(spark, st, "base",
      q.select(col(idCol).as("doc_id"),
        TextFunctions.fingerprint(col(textCol)).as("fingerprint"),
        col("toks")),
      packPartial(surv, idCol, 0L))
  }

  /** INCREMENTAL append: one new batch (ids strictly greater than all
    * stored ids) through all five stages against the persisted state.
    * Work is batch-proportional — see the object scaladoc. Replaying a
    * `batchId` (crash recovery) overwrites exactly its own partitions. */
  def appendBatch(spark: SparkSession, batch: DataFrame, idCol: String,
      textCol: String, st: State, batchId: String): Unit = {
    val q = Caches.persist(qualitySurvivors(batch, idCol, textCol)
      .withColumn("fingerprint", TextFunctions.fingerprint(col(textCol))))
    val kept = Caches.persist(exactFresh(spark, q, idCol, st, batchId))
    // Near-dup: batch×store ∪ batch×batch pairs; every pair's doc_b is
    // in this batch (the id-ordering contract), so drops are batch-local.
    val newPairs = DedupStore.appendBatch(spark, kept, idCol, textCol,
      Threshold, st.dedup, batchId)
    val surv = dropNearDups(kept, idCol, newPairs)
    // Packing continues from the token total already sharded — one
    // scalar aggregate over the (pack-count-sized) manifest, excluding
    // a half-written replay of this same batch.
    val offset = spark.table(st.shardsRel)
      .filter(col("batch_id") =!= batchId)
      .agg(coalesce(sum(col("pack_tokens")), lit(0L))).head.getLong(0)
    writeBatch(spark, st, batchId,
      q.select(col(idCol).as("doc_id"), col("fingerprint"), col("toks")),
      packPartial(surv, idCol, offset))
  }

  /** Incremental exact dedup: a batch doc whose fingerprint any EARLIER
    * quality survivor holds is dropped (the earlier doc is the min);
    * within the batch, the min id per new fingerprint survives. The
    * history probe reads ONE pruned column (`fingerprint`) off the
    * persisted meta table — never text — and excludes this batch's own
    * meta partition so crash replays stay correct. Package-private so
    * the spec can audit the plan. */
  private[operators] def exactFresh(spark: SparkSession, q: DataFrame,
      idCol: String, st: State, batchId: String): DataFrame = {
    val histFp = spark.table(st.metaRel)
      .filter(col("batch_id") =!= batchId)
      .select(col("fingerprint"))
    val fresh = q.join(histFp, Seq("fingerprint"), "left_anti")
    val w = Window.partitionBy(col("fingerprint")).orderBy(col(idCol))
    fresh.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** The accumulated shard manifest: batch partials merged by pack_id
    * (a boundary pack spans two partitions; sums/min/max reassemble the
    * one-shot row exactly). */
  def readManifest(spark: SparkSession, st: State): DataFrame =
    spark.table(st.shardsRel)
      .groupBy(col("pack_id"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("pack_tokens")).as("pack_tokens"),
        min(col("first_doc")).as("first_doc"),
        max(col("last_doc")).as("last_doc"))

  private def writeBatch(spark: SparkSession, st: State, batchId: String,
      meta: DataFrame, shardPartial: DataFrame): Unit = {
    def tag(df: DataFrame) = df.withColumn("batch_id", lit(batchId))
    Seq(st.metaRel -> meta, st.shardsRel -> shardPartial).foreach {
      case (rel, df) =>
        mat.dropPartition(spark, rel, "batch_id", batchId)
        mat.materializeIncremental(spark, rel, tag(df), Seq("batch_id"))
    }
  }
}
