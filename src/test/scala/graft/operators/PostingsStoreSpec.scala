package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables

/** The production contract of the persisted BM25 postings store (the
  * t26 gate pins the whole lifecycle against t24's one-shot oracle at
  * sf0.01; these specs pin the maintenance invariants the hash can't
  * localize): replaying a batch is a no-op, compaction loses nothing,
  * and the store-side ranking equals the one-shot over the union.
  */
class PostingsStoreSpec extends SparkSuite {

  private def docs: DataFrame =
    Tables(spark, "/root/testdata/sf0.001", "documents")

  private def ranking(df: DataFrame): Seq[(String, Int, Long)] =
    df.select(col("token"), col("rk"), col("doc_id"))
      .orderBy(col("token"), col("rk"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .toIndexedSeq

  test("build + append + replay + compact: replay is a no-op and " +
      "compaction preserves the ranking") {
    val store = PostingsStore("bm25_store_spec")
    PostingsStore.reset(spark, store)
    val isBatch = col("doc_id") % 5 === 0
    PostingsStore.build(spark, docs.filter(!isBatch), "doc_id", "text",
      store)
    PostingsStore.append(spark, docs.filter(isBatch), "doc_id", "text",
      store, "b1")
    val afterAppend = ranking(PostingsStore.selfTopK(spark, store, k = 5))
    assert(afterAppend.nonEmpty)
    // Crash replay: the same batch lands again — dynamic partition
    // overwrite must replace b1's partitions, not duplicate them.
    PostingsStore.append(spark, docs.filter(isBatch), "doc_id", "text",
      store, "b1")
    assert(ranking(PostingsStore.selfTopK(spark, store, k = 5))
      == afterAppend, "batch replay changed the ranking")
    val postingsBefore = spark.table(store.postingsRel).count()
    PostingsStore.compact(spark, store, keep = Set("b1"))
    assert(spark.table(store.postingsRel).count() == postingsBefore,
      "compaction changed the postings row count")
    assert(ranking(PostingsStore.selfTopK(spark, store, k = 5))
      == afterAppend, "compaction changed the ranking")
    PostingsStore.reset(spark, store)
  }

  test("store-side ranking equals the one-shot build over the union") {
    val store = PostingsStore("bm25_store_spec2")
    PostingsStore.reset(spark, store)
    PostingsStore.build(spark, docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", store)
    PostingsStore.append(spark, docs.filter(col("doc_id") % 3 === 1),
      "doc_id", "text", store, "b1")
    PostingsStore.append(spark, docs.filter(col("doc_id") % 3 === 2),
      "doc_id", "text", store, "b2")
    val incremental = ranking(PostingsStore.selfTopK(spark, store, k = 5))
    val oneShot = PostingsStore("bm25_store_spec2_os")
    PostingsStore.reset(spark, oneShot)
    PostingsStore.build(spark, docs, "doc_id", "text", oneShot)
    assert(incremental
      == ranking(PostingsStore.selfTopK(spark, oneShot, k = 5)))
    PostingsStore.reset(spark, store)
    PostingsStore.reset(spark, oneShot)
  }
}
