package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.model.CatalogMaterializer

/** Persisted, incrementally-maintained BM25 postings — the retrieval
  * index given the same lifecycle discipline as the dedup store
  * ([[DedupStore]]) and the ANN index ([[VectorIndex]]): t24 rebuilds
  * the postings from raw text on every query, which at 100 TB means
  * re-tokenizing the corpus per search; a production retrieval index
  * tokenizes each document ONCE, on arrival, and queries score off the
  * persisted (token, doc_id, tf) rows.
  *
  * Two engine-managed tables, partition-per-batch with dynamic
  * partition overwrite (replaying a batch is idempotent — the
  * crash-recovery property the nightly append needs):
  *
  *  - `postings(token, doc_id, tf, batch_id)` — the inverted index;
  *  - `doc_lengths(doc_id, dl, batch_id)` — per-document token counts,
  *    the BM25 length-normalization side.
  *
  * A document lives in exactly one batch (the corpus-append contract
  * every store in this engine shares), so the UNION of batch partitions
  * equals the one-shot tokenization of the union corpus — which is the
  * t26 invariant: build + append + compact, then score, must hash-match
  * t24's one-shot oracle over the full corpus exactly.
  *
  * Scale shape at query time: term stats (df) aggregate only the
  * CANDIDATE terms' postings (the query join is broadcast, so the
  * filter reaches the postings scan); n_docs/avgdl is one thin
  * aggregate over `doc_lengths` (corpus-row-count rows, two columns —
  * never the text). Append work is batch-proportional: stored
  * documents are never re-tokenized.
  */
final case class PostingsStore(schemaName: String) {
  val postingsRel: String = s"$schemaName.postings"
  val lengthsRel: String = s"$schemaName.doc_lengths"
}

object PostingsStore {

  private def mat = new CatalogMaterializer

  /** Drop both store tables — a fresh start for gates/specs. */
  def reset(spark: SparkSession, store: PostingsStore): Unit =
    Seq(store.postingsRel, store.lengthsRel)
      .foreach(mat.dropRelation(spark, _))

  /** Tokenize `docs` once into (tf, dl) — whitespace tokens, empty
    * documents dropped (t24's corpus contract, applied here so the
    * store is safe by construction regardless of caller filtering). */
  private def tfDl(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val tf = docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    (tf, dl)
  }

  /** Full (re)build: the whole corpus as batch zero. REPLACES any
    * existing store (the [[DedupStore.build]] footgun note: dynamic
    * overwrite alone would retain stale batch partitions). */
  def build(spark: SparkSession, corpus: DataFrame, idCol: String,
      textCol: String, store: PostingsStore,
      batchId: String = "base"): Unit = {
    reset(spark, store)
    writeBatch(spark, store, batchId, corpus, idCol, textCol)
  }

  /** Incremental append: tokenize ONLY the batch and land its
    * partitions — batch-proportional work, stored text never re-read.
    * Re-running the same `batchId` (crash replay) overwrites exactly
    * its own partitions. */
  def append(spark: SparkSession, batch: DataFrame, idCol: String,
      textCol: String, store: PostingsStore, batchId: String): Unit =
    writeBatch(spark, store, batchId, batch, idCol, textCol)

  /** Fold closed batch partitions of both tables into `compacted`
    * ([[StoreCompaction]]'s two-phase protocol; postings rows are
    * unique on (token, doc_id) and lengths on doc_id, so the replay
    * `distinct()` is sound). */
  def compact(spark: SparkSession, store: PostingsStore,
      keep: Set[String]): Seq[StoreCompaction.Stats] =
    Seq(store.postingsRel, store.lengthsRel)
      .map(StoreCompaction.compact(spark, _, keep))

  /** Tokenize one batch and land its partition in both tables. Each
    * write clears its own partition up front, so a replay whose
    * recompute came up empty would not keep stale rows (the microbatch
    * empty-period contract, [[DedupStore.writeBatch]]'s note). */
  private def writeBatch(spark: SparkSession, store: PostingsStore,
      batchId: String, docs: DataFrame, idCol: String,
      textCol: String): Unit = {
    val (tf, dl) = tfDl(docs, idCol, textCol)
    def tag(df: DataFrame) = df.withColumn("batch_id", lit(batchId))
    Seq(store.postingsRel -> tf, store.lengthsRel -> dl).foreach {
      case (rel, df) =>
        mat.dropPartition(spark, rel, "batch_id", batchId)
        mat.materializeIncremental(spark, rel, tag(df), Seq("batch_id"))
    }
  }

  /** BM25 top-k (k1 = 1.2, b = 0.75) for a provided `(token)` query
    * frame, scored off the persisted postings. The query side is
    * broadcast; df aggregates only the candidate terms' postings rows;
    * n_docs/avgdl is one thin aggregate over `doc_lengths`. The float
    * discipline is t24's, verbatim: idf and the saturation term as one
    * identically-parenthesized double expression, 6dp-rounded, ties on
    * doc_id. */
  def topK(spark: SparkSession, store: PostingsStore,
      queryTerms: DataFrame, k: Int): DataFrame = {
    val tf = spark.table(store.postingsRel)
      .select(col("token"), col("doc_id"), col("tf"))
    val dl = spark.table(store.lengthsRel)
      .select(col("doc_id"), col("dl"))
    val stats = dl.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val cand = tf.join(broadcast(queryTerms.select(col("token"))), "token")
    val df = cand.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scored = cand
      .join(broadcast(df), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("score",
        round(col("idf") * ((col("tf") * 2.2) /
          (col("tf") + lit(1.2) *
            (lit(1.0) - 0.75 + lit(0.75) * col("dl") / col("avgdl")))),
          6))
    // SALTED two-stage top-k: a single per-term window puts df(term)
    // rows in ONE sort task, and a stop-word-grade query term makes
    // that the whole corpus. Stage 1 ranks within (token, salt) — each
    // window task bounded by df(term)/Salts — and keeps k; stage 2
    // ranks the ≤ Salts·k survivors per term. Exact, not approximate:
    // every global top-k row is its salt's top-k row, and (score desc,
    // doc_id) is a total order so both stages are deterministic. The
    // salt assignment (xxhash64 of doc_id) only partitions the work —
    // the output is salt-independent.
    val salts = 32
    val w1 = Window.partitionBy(col("token"), col("__salt"))
      .orderBy(col("score").desc, col("doc_id"))
    val local = scored
      .withColumn("__salt", pmod(xxhash64(col("doc_id")), lit(salts)))
      .withColumn("__rk", row_number().over(w1))
      .filter(col("__rk") <= k)
      .drop("__rk", "__salt")
    val w = Window.partitionBy(col("token"))
      .orderBy(col("score").desc, col("doc_id"))
    local
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("token"), col("rk"), col("doc_id"), col("tf"),
        col("score"))
  }

  /** [[topK]] with t24's self-derived query set — terms ranked 11..20
    * by global occurrence, computed from the PERSISTED postings (one
    * thin aggregate over (token, tf) — the raw text is never touched).
    * Keeps the gate external-table-free and deterministic. */
  def selfTopK(spark: SparkSession, store: PostingsStore, k: Int)
      : DataFrame = {
    val tf = spark.table(store.postingsRel)
    val term = tf.groupBy(col("token")).agg(sum(col("tf")).as("cnt"))
    val w0 = Window.orderBy(col("cnt").desc, col("token"))
    val qterms = term.orderBy(col("cnt").desc, col("token")).limit(20)
      .withColumn("r", row_number().over(w0))
      .filter(col("r") > 10)
      .select(col("token"))
    topK(spark, store, qterms, k)
  }
}
