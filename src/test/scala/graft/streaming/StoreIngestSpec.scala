package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables
import graft.operators.{Dedup, DedupStore, SemanticStore, Similarity, StoreCompaction,
  VectorIndex}

/** One vector as fed through a log source. */
final case class VecRow(vec_id: Long, embedding: Array[Float])

/** One document as fed through a log source. */
final case class DocRow(doc_id: Long, text: String)

/** The persisted stores' STREAMING ingest path: `DedupStore.appendBatch`
  * and `VectorIndex.append` are batch functions, and a production
  * pipeline's natural driver for them is `foreachBatch` over a log
  * source — each micro-batch becomes one store batch, keyed by the
  * micro-batch id, which makes the store's partition-per-batch replay
  * idempotency line up EXACTLY with foreachBatch's at-least-once
  * window (a replayed micro-batch re-commits its own partition).
  * Pinned here off [[MemoryStream]] (the offset-based DSv2 path a
  * Kafka topic feeds — see LogSourceSpec for why not the Kafka jar):
  * multi-trigger streamed ingest must equal the one-shot pass, and
  * compacting mid-stream must stay invisible.
  */
class StoreIngestSpec extends SparkSuite {

  test("streamed vector ingest: persisted-index probe equals one-shot") {
    import spark.implicits._
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val index = VectorIndex("stream_vec")
    VectorIndex.reset(spark, index)
    // Base keeps the global seed prefix (codebooks freeze at build);
    // the rest arrives on the stream.
    val isStream = col("vec_id") % 5 === 0 && col("vec_id") >= 80
    VectorIndex.build(spark, emb.filter(!isStream), "vec_id", "embedding",
      index)
    val arriving = emb.filter(isStream)
      .select(col("vec_id"), col("embedding")).as[VecRow].collect().toSeq

    val input = MemoryStream[VecRow](spark)
    val q = input.toDF().writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        VectorIndex.append(spark, b, "vec_id", "embedding", index, s"s$id")
      }
      .outputMode("append").start()
    try {
      arriving.grouped(math.max(1, arriving.size / 3 + 1)).foreach { c =>
        input.addData(c)
        q.processAllAvailable()
      }
    } finally q.stop()

    val queries = emb.filter(col("vec_id") < 5)
    def ranking(df: org.apache.spark.sql.DataFrame) = df
      .select(col("qid"), col("rn"), col("nid"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val oneShot = ranking(Similarity.ivfPqTopK(emb, queries, "vec_id",
      "embedding", k = 5))
    assert(ranking(VectorIndex.topK(spark, queries, "vec_id", "embedding",
      index, k = 5)) == oneShot)
    // Ingested batch partitions fold away without touching the ranking.
    StoreCompaction.compactVectorIndex(spark, index, keep = Set.empty)
    assert(ranking(VectorIndex.topK(spark, queries, "vec_id", "embedding",
      index, k = 5)) == oneShot)
    VectorIndex.reset(spark, index)
  }

  test("streamed document ingest: accumulated pairs equal one-shot") {
    import spark.implicits._
    val T = 0.6
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val store = DedupStore("stream_dedup")
    DedupStore.reset(spark, store)
    DedupStore.build(spark, docs.filter(col("doc_id") % 5 =!= 0),
      "doc_id", "text", T, store)
    val arriving = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text")).as[DocRow].collect().toSeq

    val input = MemoryStream[DocRow](spark)
    val q = input.toDF().writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        DedupStore.appendBatch(spark, b, "doc_id", "text", T, store,
          s"s$id")
        (): Unit
      }
      .outputMode("append").start()
    try {
      arriving.grouped(math.max(1, arriving.size / 3 + 1)).foreach { c =>
        input.addData(c)
        q.processAllAvailable()
      }
    } finally q.stop()

    def pairsOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val oneShot = pairsOf(Dedup.minhashLshPairs(docs, "doc_id", "text", T))
    val streamed = pairsOf(DedupStore.allPairs(spark, store))
    assert(streamed.nonEmpty && streamed == oneShot)
    DedupStore.reset(spark, store)
  }

  test("streamed corpus pipeline: accumulated shards equal one-shot") {
    import spark.implicits._
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val st = graft.operators.CorpusPipeline.State("stream_pipe")
    // Bootstrap on the first 80% of the id range; the rest arrives on
    // the stream in id order (the predecessor rule's ordering contract —
    // a crawl log delivers this for free).
    graft.operators.CorpusPipeline.buildHistory(spark,
      docs.filter(col("doc_id") <= 399), "doc_id", "text", st)
    val arriving = docs.filter(col("doc_id") > 399)
      .select(col("doc_id"), col("text")).as[DocRow].collect()
      .sortBy(_.doc_id).toSeq

    val input = MemoryStream[DocRow](spark)
    val q = input.toDF().writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.operators.CorpusPipeline.appendBatch(spark, b, "doc_id",
          "text", st, s"s$id")
      }
      .outputMode("append").start()
    try {
      arriving.grouped(math.max(1, arriving.size / 3 + 1)).foreach { c =>
        input.addData(c)
        q.processAllAvailable()
      }
    } finally q.stop()

    def rowsOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("pack_id"), col("n_docs"), col("pack_tokens"),
        col("first_doc"), col("last_doc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val oneShot = rowsOf(
      graft.operators.CorpusPipeline.manifest(docs, "doc_id", "text"))
    val streamed = rowsOf(
      graft.operators.CorpusPipeline.readManifest(spark, st))
    assert(streamed.nonEmpty && streamed == oneShot)
    graft.operators.CorpusPipeline.reset(spark, st)
  }

  test("streamed FULL-recipe ingest: seven-table state equals one-shot " +
      "append") {
    import spark.implicits._
    import graft.operators.CorpusPipeline
    // The capstone's streamed twin: appendBatchFull driven from
    // foreachBatch over a log source, micro-batch id = store batch id
    // (the at-least-once replay window and the partition-per-batch
    // idempotency line up exactly, as for the five-table pipeline
    // above). Embeddings are looked up per micro-batch from the
    // embedding-service table — appendBatchFull's internal survivor
    // semi-join restricts them to the batch, so passing the full frame
    // is the production shape, not a shortcut.
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val bench = docs.filter(col("doc_id") % 5 === 0)
    val cEmb = emb.filter(col("vec_id") % 5 =!= 0)
    val cut = 399L
    def build(name: String): CorpusPipeline.FullState = {
      val st = CorpusPipeline.FullState(name)
      CorpusPipeline.buildHistoryFull(spark,
        corpus.filter(col("doc_id") <= cut),
        cEmb.filter(col("vec_id") <= cut), bench,
        "doc_id", "text", "vec_id", "embedding", st)
      st
    }
    val st = build("stream_full")
    val arriving = corpus.filter(col("doc_id") > cut)
      .select(col("doc_id"), col("text")).as[DocRow].collect()
      .sortBy(_.doc_id).toSeq

    val input = MemoryStream[DocRow](spark)
    val q = input.toDF().writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        CorpusPipeline.appendBatchFull(spark, b, cEmb, "doc_id", "text",
          "vec_id", "embedding", st, s"s$id")
      }
      .outputMode("append").start()
    try {
      arriving.grouped(math.max(1, arriving.size / 3 + 1)).foreach { c =>
        input.addData(c)
        q.processAllAvailable()
      }
    } finally q.stop()

    // Reference: the same build plus ONE combined append (batch slicing
    // is already pinned invisible by CorpusPipelineSpec; p08's oracle
    // pins this state against the full recompute).
    val ref = build("stream_full_ref")
    CorpusPipeline.appendBatchFull(spark,
      corpus.filter(col("doc_id") > cut),
      cEmb.filter(col("vec_id") > cut),
      "doc_id", "text", "vec_id", "embedding", ref, "b1")
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("pack_id"), col("n_docs"), col("pack_tokens"),
        col("first_doc"), col("last_doc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    def keepsOf(st: CorpusPipeline.FullState) =
      SemanticStore.keeps(spark, st.sem, "vec_id").collect()
        .map(r => (r.getLong(0), r.getBoolean(2))).sortBy(_._1).toSeq
    val streamed = rowsOf(CorpusPipeline.readManifest(spark, st.base))
    assert(streamed.nonEmpty)
    assert(streamed == rowsOf(CorpusPipeline.readManifest(spark,
      ref.base)))
    assert(keepsOf(st) == keepsOf(ref))
    // doc_meta accumulates identically (modulo batch labels).
    def metaOf(s: CorpusPipeline.FullState) =
      spark.table(s.base.metaRel)
        .select(col("doc_id"), col("fingerprint"), col("toks"),
          col("contaminated"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getBoolean(3))).sortBy(_._1).toSeq
    assert(metaOf(st) == metaOf(ref))
    CorpusPipeline.resetFull(spark, st)
    CorpusPipeline.resetFull(spark, ref)
    graft.core.Caches.releaseAll()
  }

  test("a fence declared MID-STREAM equals the batch build with the " +
      "same fence position") {
    import spark.implicits._
    import graft.operators.CorpusPipeline
    // The production shape: a retention cron declares an epoch fence
    // between two micro-batches of a live ingest. The fence must land
    // exactly as if the batch pipeline had fenced at the same point —
    // micro-batch slicing within an epoch stays invisible.
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val cut = 299L
    val st = CorpusPipeline.State("stream_fence")
    CorpusPipeline.buildHistory(spark,
      docs.filter(col("doc_id") <= cut), "doc_id", "text", st)
    val arriving = docs.filter(col("doc_id") > cut)
      .select(col("doc_id"), col("text")).as[DocRow].collect()
      .sortBy(_.doc_id).toSeq
    val (firstChunk, rest) = arriving.splitAt(arriving.size / 3)
    val input = MemoryStream[DocRow](spark)
    val q = input.toDF().writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        CorpusPipeline.appendBatch(spark, b, "doc_id", "text", st,
          s"s$id")
      }
      .outputMode("append").start()
    try {
      input.addData(firstChunk); q.processAllAvailable()
      CorpusPipeline.fence(spark, st) // the retention cron fires
      rest.grouped(math.max(1, rest.size / 2 + 1)).foreach { c =>
        input.addData(c); q.processAllAvailable()
      }
    } finally q.stop()

    val ref = CorpusPipeline.State("stream_fence_ref")
    CorpusPipeline.buildHistory(spark,
      docs.filter(col("doc_id") <= cut), "doc_id", "text", ref)
    val fenceAt = firstChunk.last.doc_id
    CorpusPipeline.appendBatch(spark,
      docs.filter(col("doc_id") > cut && col("doc_id") <= fenceAt),
      "doc_id", "text", ref, "b0")
    CorpusPipeline.fence(spark, ref)
    CorpusPipeline.appendBatch(spark,
      docs.filter(col("doc_id") > fenceAt), "doc_id", "text", ref, "b1")
    def rowsOf(st: CorpusPipeline.State) =
      CorpusPipeline.readManifest(spark, st)
        .select(col("pack_id"), col("n_docs"), col("pack_tokens"),
          col("first_doc"), col("last_doc"))
        .collect().map(_.toString).sorted.toSeq
    assert(rowsOf(st).nonEmpty)
    assert(rowsOf(st) == rowsOf(ref))
    CorpusPipeline.reset(spark, st)
    CorpusPipeline.reset(spark, ref)
    graft.core.Caches.releaseAll()
  }

  test("streamed semantic ingest: persisted verdicts equal one-shot") {
    import spark.implicits._
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val cut = emb.agg(max(col("vec_id"))).head().getLong(0) * 3 / 5
    val hist = emb.filter(col("vec_id") <= cut)
    val store = SemanticStore("stream_sem")
    SemanticStore.build(spark, hist, "vec_id", "embedding", 8, 2, 0.45,
      store)
    // Arrivals in id order — the predecessor rule's ordering contract,
    // which a crawl log delivers for free.
    val arriving = emb.filter(col("vec_id") > cut)
      .select(col("vec_id"), col("embedding")).as[VecRow].collect()
      .sortBy(_.vec_id).toSeq

    val input = MemoryStream[VecRow](spark)
    val q = input.toDF().writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        SemanticStore.append(spark, b, "vec_id", "embedding",
          store, s"s$id")
      }
      .outputMode("append").start()
    try {
      arriving.grouped(math.max(1, arriving.size / 3 + 1)).foreach { c =>
        input.addData(c)
        q.processAllAvailable()
      }
    } finally q.stop()

    val ref = SemanticStore("stream_sem_ref")
    SemanticStore.build(spark, hist, "vec_id", "embedding", 8, 2, 0.45,
      ref)
    SemanticStore.append(spark, emb.filter(col("vec_id") > cut),
      "vec_id", "embedding", ref, "b1")
    def keepsOf(st: SemanticStore) =
      SemanticStore.keeps(spark, st, "vec_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
        .sortBy(_._1).toSeq
    val streamed = keepsOf(store)
    assert(streamed.size == emb.count() && streamed == keepsOf(ref))
    SemanticStore.reset(spark, store)
    SemanticStore.reset(spark, ref)
    graft.core.Caches.releaseAll()
  }

  test("streamed span-dedup ingest: per-batch rewrites equal one-shot") {
    import spark.implicits._
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val store = graft.operators.SpanStore("stream_span")
    // History on the first 60% of the id range; the rest streams in id
    // order (the first-occurrence rule's prefix-stability contract —
    // same ordering a crawl log delivers).
    val cut = docs.agg(max(col("doc_id"))).head.getLong(0) * 3 / 5
    graft.operators.SpanStore.build(spark,
      docs.filter(col("doc_id") <= cut), "doc_id", "text", k = 5, store)
    val arriving = docs.filter(col("doc_id") > cut)
      .select(col("doc_id"), col("text")).as[DocRow].collect()
      .sortBy(_.doc_id).toSeq

    val collected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, String)]
    val input = MemoryStream[DocRow](spark)
    val q = input.toDF().writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        val rw = graft.operators.SpanStore.appendBatch(spark, b,
          "doc_id", "text", k = 5, store, s"s$id")
        collected ++= rw.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        (): Unit
      }
      .outputMode("append").start()
    try {
      arriving.grouped(math.max(1, arriving.size / 3 + 1)).foreach { c =>
        input.addData(c)
        q.processAllAvailable()
      }
    } finally q.stop()

    val oneShot = graft.operators.Dedup
      .spanDedup(docs, "doc_id", "text", k = 5)
      .filter(col("doc_id") > cut).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(collected.nonEmpty && collected.exists(_._3 > 0),
      "stream should contain spans duplicated against history")
    assert(collected.sortBy(_._1).toSeq == oneShot)
    graft.operators.SpanStore.reset(spark, store)
    graft.core.Caches.releaseAll()
  }
}
