package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** [[SpanStore]] lifecycle semantics: increments ≡ the one-shot pass,
  * the call-time history snapshot, and crash-replay idempotency. */
class SpanStoreSpec extends SparkSuite {

  import spark.implicits._

  private def rows(df: DataFrame) =
    df.orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq

  test("incremental span dedup ≡ one-shot over the union; lazy plans " +
      "pin their history snapshot; replay is idempotent") {
    val history = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "unique history words only here now")).toDF("doc_id", "text")
    val batch1 = Seq(
      // shares history's 5-gram prefix → those five words cut
      (10L, "pre alpha beta gamma delta epsilon post"),
      (11L, "novel one two three four five six")).toDF("doc_id", "text")
    val batch2 = Seq(
      // exact copy of batch1's doc 11 → fully removed
      (20L, "novel one two three four five six"),
      // exact copy of history's doc 1 → fully removed
      (21L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val union = history.unionByName(batch1).unionByName(batch2)

    val store = SpanStore("span_store_spec")
    SpanStore.build(spark, history, "doc_id", "text", k = 5, store)
    val b1 = SpanStore.appendBatch(spark, batch1, "doc_id", "text",
      k = 5, store, "b1")
    val b2 = SpanStore.appendBatch(spark, batch2, "doc_id", "text",
      k = 5, store, "b2")

    val oneShot = Dedup.spanDedup(union, "doc_id", "text", k = 5)
    // b1 is COLLECTED AFTER b2 was appended: the rewrite must have
    // pinned its history snapshot at call time, or doc 11 (first owner
    // of the "novel…" grams) would be marked duplicate against the
    // LATER doc 20.
    assert(rows(b1) == rows(oneShot.filter(col("doc_id").isin(10L, 11L))))
    assert(rows(b2) == rows(oneShot.filter(col("doc_id").isin(20L, 21L))))
    // The planted semantics, spelled out: cross-batch span cut,
    // batch-novel doc kept whole, both copies fully removed.
    val byId = rows(b1.unionByName(b2)).map(t => t._1 -> t).toMap
    assert(byId(10L)._3 == 5L, "history span not cut from doc 10")
    assert(byId(11L)._3 == 0L, "novel doc 11 must keep every token")
    assert(byId(20L)._2 == byId(20L)._3, "copy of doc 11 must vanish")
    assert(byId(21L)._2 == byId(21L)._3, "copy of history must vanish")

    // Crash replay: re-appending b2 rewrites only its own partition —
    // identical output, identical store contents.
    val gramsBefore = spark.table(store.gramsRel).count()
    val b2again = SpanStore.appendBatch(spark, batch2, "doc_id", "text",
      k = 5, store, "b2")
    assert(rows(b2again) == rows(b2))
    assert(spark.table(store.gramsRel).count() == gramsBefore)
    SpanStore.reset(spark, store)
  }
}
