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

  test("increment plan reads history off the store's parquet, never " +
      "re-hashing history text") {
    val history = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, "pre alpha beta gamma delta epsilon post"))
      .toDF("doc_id", "text")
    val store = SpanStore("span_plan_spec")
    SpanStore.build(spark, history, "doc_id", "text", k = 5, store)
    val plan = SpanStore.appendBatch(spark, batch, "doc_id", "text",
        k = 5, store, "b1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("span_grams"),
      s"increment must probe the persisted gram table:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("Window"))
    SpanStore.reset(spark, store)
    graft.core.Caches.releaseAll()
  }

  test("span takedown: victims leave partition-scoped, spans resurrect " +
      "in their next owner, delete is idempotent") {
    val history = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "unique history words only here now")).toDF("doc_id", "text")
    val batch = Seq(
      // duplicate of history's span — cut while doc 1 lives
      (10L, "pre alpha beta gamma delta epsilon post"),
      (11L, "novel one two three four five six")).toDF("doc_id", "text")
    val store = SpanStore("span_takedown_spec")
    SpanStore.build(spark, history, "doc_id", "text", k = 5, store)
    SpanStore.appendBatch(spark, batch, "doc_id", "text", k = 5, store,
      "b1").count()

    val survivors = history.filter(col("doc_id") =!= 1L)
      .unionByName(batch)
    val victims = Seq(1L).toDF("doc_id")
    val stats = SpanStore.delete(spark, store, victims)
    assert(stats.rowsDeleted == 2L, s"doc 1 owns two gram starts: $stats")
    val after = rows(SpanStore.rewriteFrom(spark, survivors, "doc_id",
      "text", k = 5, store))
    // Doc 10's span had ONE earlier owner — the victim. It must come
    // back whole: stale existence flags would keep it cut forever.
    assert(after == rows(Dedup.spanDedup(survivors, "doc_id", "text", 5)))
    assert(after.find(_._1 == 10L).get._3 == 0L,
      s"victim-owned span failed to resurrect in doc 10: $after")
    // Idempotent: the same victim set finds nothing to touch.
    assert(SpanStore.delete(spark, store, victims).rowsDeleted == 0L)
    assert(rows(SpanStore.rewriteFrom(spark, survivors, "doc_id",
      "text", k = 5, store)) == after)
    SpanStore.reset(spark, store)
  }
}
