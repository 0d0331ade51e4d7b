package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned byte-pair encoding — the real merge-table tokenizer (not the
  * regex approximation t05 keeps as its cheap twin): train `numMerges`
  * merges on the corpus vocabulary by iterated most-frequent-adjacent-
  * pair selection, then segment documents by replaying the merges in
  * rank order.
  *
  * The algorithm is defined in terms every engine implements
  * IDENTICALLY, which is what makes an exact DuckDB oracle possible for
  * a trained tokenizer:
  *
  *  - a word's working form is its symbols joined by `` with
  *    leading/trailing separators (`␟h␟e␟y␟`);
  *  - one merge step = ONE left-to-right non-overlapping string
  *    `replace` of `␟x␟y␟` → `␟xy␟` (Spark's `replace`, Java's
  *    `String.replace` and DuckDB's `replace` all share these
  *    semantics — the separators make token boundaries unambiguous, and
  *    a replacement can never create a fresh occurrence of the same
  *    pair since `xy` is a new longer symbol);
  *  - pair selection = max summed word-count weight, ties broken by
  *    (x, y) ascending — a total order, so training is deterministic.
  *
  * Scale shape (100 TB): training iterates over the VOCABULARY (one
  * corpus-wide word count, then |V|-sized frames — corpus-size-
  * independent), each iteration one partial+final aggregate and a
  * 1-row collect; application is MERGE-TABLE-AS-LITERALS — a map-only
  * chain of `numMerges` codegen'd replaces over the document scan, no
  * join, no shuffle, nothing broadcast but the expression tree itself.
  * Whole-document segmentation works because words are separated by a
  * space SYMBOL (`␟ ␟`) and trained merges never contain the space
  * symbol, so no merge crosses a word boundary.
  */
object Bpe {

  /** Unit separator: absent from the (ASCII, whitespace-tokenized)
    * corpus by construction — word symbols can never contain it. */
  val Sep = "\u001f"

  /** Corpus word vocabulary with counts and initial char-separated
    * working forms. */
  def vocabulary(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(length(trim(col(textCol))) > 0)
      .select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("rep",
        concat(lit(Sep), array_join(split(col("word"), ""), Sep), lit(Sep)))

  /** Train `numMerges` merges; returns them in rank order. Driver holds
    * only the merge table (numMerges pairs) and a 1-row result per
    * iteration — the vocabulary itself never leaves the cluster. */
  def trainMerges(docs: DataFrame, textCol: String,
      numMerges: Int): Seq[(String, String)] = {
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // localCheckpoint per iteration: the vocabulary is tiny (|V| rows)
    // but an iterated withColumn chain over cached frames grows the
    // LOGICAL plan every step — lineage must be cut, not just cached
    // (the d05 label-propagation lesson).
    var v = vocabulary(docs, textCol).localCheckpoint()
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val syms = split(trim(col("rep"), Sep), Sep)
      val best = v
        .filter(size(syms) >= 2)
        .select(col("cnt"), syms.as("s"))
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(s)-1), " +
            "i -> struct(s[i-1] AS a, s[i] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(desc("n"), col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        v = v.withColumn("rep", mergeOnce(col("rep"), a, b))
          .localCheckpoint()
        i += 1
      }
    }
    merges.toSeq
  }

  private def mergeOnce(rep: Column, a: String, b: String): Column =
    replace(rep, lit(Sep + a + Sep + b + Sep), lit(Sep + a + b + Sep))

  /** Segment whole documents with a trained merge table: normalized
    * whitespace becomes the space symbol, every char a symbol, then the
    * merges replay in rank order as a literal codegen'd replace chain.
    * Emits the separator-delimited segmented form (null for blank
    * docs). */
  def segmented(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): Column = {
    val base = concat(lit(Sep),
      array_join(split(
        regexp_replace(trim(col(textCol)), "\\s+", " "), ""), Sep),
      lit(Sep))
    val rep = merges.foldLeft(base) { case (r, (a, b)) => mergeOnce(r, a, b) }
    when(length(trim(col(textCol))) === 0, lit(null)).otherwise(rep)
  }

  /** Token count of a segmented form (space symbols are word
    * boundaries, not tokens). */
  def tokenCountOf(seg: Column): Column =
    size(filter(split(trim(seg, Sep), Sep), s => s =!= " "))

  // ---- Persisted tokenizer lifecycle (gate t19). Training is the only
  // corpus-sized cost in the BPE tier; a production pipeline trains ONCE
  // on a frozen history slice, persists the merge table, and applies it
  // map-only to every future batch — retraining would silently change
  // token boundaries across shards. The merge table is tiny (numMerges
  // rows) but it is STATE, so it lives in the engine's atomic
  // full-refresh sink: a retrain is one pointer swap, readers never see
  // a half-written table, and time travel keeps the predecessor.

  /** Persist a trained merge table as an engine relation
    * `(rank, a, b)` — an atomic full replace (a retrain IS a replace). */
  def persistMerges(spark: org.apache.spark.sql.SparkSession,
      relation: String, merges: Seq[(String, String)]): Unit = {
    import spark.implicits._
    val df = merges.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }
      .toDF("rank", "a", "b")
    new graft.model.CatalogMaterializer()
      .materializeTable(spark, relation, df)
  }

  /** Load a persisted merge table in rank order — numMerges rows, the
    * one collect a tokenizer apply needs (the merges become literals in
    * the codegen'd replace chain; nothing corpus-sized moves). */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
      relation: String): Seq[(String, String)] =
    spark.table(relation).orderBy(col("rank"))
      .select(col("a"), col("b"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
}
