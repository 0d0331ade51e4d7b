package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables
import graft.operators.{CorpusPipeline, DedupStore, SemanticStore,
  StoreRetention}

/** One takedown request as fed through a removal queue. */
final case class VictimRow(doc_id: Long)

/** The at-least-once SEAM the streamed gates (st10–st14) assert only on
  * clean runs: a foreachBatch sink can crash AFTER its store writes
  * land but BEFORE the streaming engine commits the micro-batch's
  * offset — on restart from the checkpoint the engine replays the SAME
  * micro-batch (same epoch id, same offset range), and the stores'
  * partition-per-batch dynamic overwrite must absorb the duplicate
  * delivery. These specs kill the query in exactly that window
  * (store write completed, then throw, so the offset commit never
  * happens), restart against the same checkpoint, and prove the
  * replayed run converges to the clean run's state — for the
  * full-recipe ingest (st10's path) and the takedown feed (st13's).
  */
class StreamCrashReplaySpec extends SparkSuite {

  /** Run `body` as a checkpointed foreachBatch stream over `data` fed
    * in `chunks` chunks, killing and restarting the query whenever the
    * injected crash fires. Returns the number of restarts taken. */
  private def streamWithCrashes[T <: Product : org.apache.spark.sql
      .Encoder](data: Seq[T], chunks: Int,
      body: (DataFrame, Long) => Unit): Int = {
    import spark.implicits._
    val checkpoint = Files.createTempDirectory("graft_crash_ckpt")
      .toString
    val input = MemoryStream[T](spark)
    var restarts = 0
    def start() = input.toDF().writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(body)
      .outputMode("append").start()
    var q = start()
    def drain(): Unit =
      try q.processAllAvailable()
      catch {
        case _: Exception =>
          // The injected crash killed the query AFTER the store write,
          // BEFORE the offset commit. Restart from the checkpoint: the
          // engine replays the uncommitted micro-batch — same epoch id,
          // same offset range — against state that already holds its
          // writes (the at-least-once delivery the stores must absorb).
          restarts += 1
          q = start()
          drain()
      }
    data.grouped(math.max(1, data.size / chunks + 1)).foreach { c =>
      input.addData(c)
      drain()
    }
    q.stop()
    restarts
  }

  test("full-recipe ingest: crash between store write and offset " +
      "commit, replay converges to the clean run (st10's path)") {
    import spark.implicits._
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
    val st = build("crash_full")
    val arriving = corpus.filter(col("doc_id") > cut)
      .select(col("doc_id"), col("text")).as[DocRow].collect()
      .sortBy(_.doc_id).toSeq

    @volatile var crashed = false
    val restarts = streamWithCrashes(arriving, chunks = 3, (b, id) => {
      CorpusPipeline.appendBatchFull(spark, b, cEmb, "doc_id", "text",
        "vec_id", "embedding", st, s"s$id")
      // The seam: state is fully written, the offset is not yet
      // committed — kill the first middle batch here.
      if (id == 1L && !crashed) {
        crashed = true
        throw new RuntimeException(
          "injected: crash after store write, before offset commit")
      }
    })
    assert(crashed && restarts == 1, s"crash must fire once: $restarts")

    val ref = build("crash_full_ref")
    CorpusPipeline.appendBatchFull(spark,
      corpus.filter(col("doc_id") > cut),
      cEmb.filter(col("vec_id") > cut),
      "doc_id", "text", "vec_id", "embedding", ref, "b1")
    def rowsOf(s: CorpusPipeline.FullState) =
      CorpusPipeline.readManifest(spark, s.base)
        .select(col("pack_id"), col("n_docs"), col("pack_tokens"),
          col("first_doc"), col("last_doc"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    def keepsOf(s: CorpusPipeline.FullState) =
      SemanticStore.keeps(spark, s.sem, "vec_id").collect()
        .map(r => (r.getLong(0), r.getBoolean(2))).sortBy(_._1).toSeq
    val replayed = rowsOf(st)
    assert(replayed.nonEmpty)
    assert(replayed == rowsOf(ref),
      "replayed manifest diverged from the clean run")
    assert(keepsOf(st) == keepsOf(ref),
      "replayed semantic verdicts diverged from the clean run")
    CorpusPipeline.resetFull(spark, st)
    CorpusPipeline.resetFull(spark, ref)
    graft.core.Caches.releaseAll()
  }

  test("takedown feed: crash between delete and offset commit, replay " +
      "converges to the one-shot delete (st13's path)") {
    import spark.implicits._
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val T = graft.operators.DedupQueries.Threshold
    def buildStore(name: String): DedupStore = {
      val store = DedupStore(name)
      DedupStore.reset(spark, store)
      DedupStore.build(spark, docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", T, store)
      DedupStore.appendBatch(spark, docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", T, store, "b1")
      store
    }
    val store = buildStore("crash_takedown")
    val victims = docs.filter(col("doc_id") % 10 === 7)
      .select(col("doc_id")).as[VictimRow].collect()
      .sortBy(_.doc_id).toSeq

    @volatile var crashed = false
    val restarts = streamWithCrashes(victims, chunks = 3, (b, id) => {
      StoreRetention.deleteDocs(spark, store, b.select(col("doc_id")))
      if (id == 1L && !crashed) {
        crashed = true
        throw new RuntimeException(
          "injected: crash after delete, before offset commit")
      }
    })
    assert(crashed && restarts == 1, s"crash must fire once: $restarts")

    val ref = buildStore("crash_takedown_ref")
    StoreRetention.deleteDocs(spark, ref,
      docs.filter(col("doc_id") % 10 === 7).select(col("doc_id")))
    def pairsOf(s: DedupStore) =
      DedupStore.allPairs(spark, s).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val replayed = pairsOf(store)
    assert(replayed.nonEmpty)
    assert(replayed == pairsOf(ref),
      "replayed takedown state diverged from the one-shot delete")
    DedupStore.reset(spark, store)
    DedupStore.reset(spark, ref)
    graft.core.Caches.releaseAll()
  }

  test("block-dedup ingest: crash between store write and offset " +
      "commit, replay converges to the batch append (st16's path)") {
    import spark.implicits._
    import graft.operators.BlockStore
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val cut = 299L
    def freshStore(name: String): BlockStore = {
      val store = BlockStore(name)
      BlockStore.build(spark, docs.filter(col("doc_id") <= cut),
        "doc_id", "text", 16, store)
      store
    }
    val store = freshStore("crash_blocks")
    val arriving = docs.filter(col("doc_id") > cut)
      .select(col("doc_id"), col("text")).as[DocRow].collect()
      .sortBy(_.doc_id).toSeq

    @volatile var crashed = false
    val restarts = streamWithCrashes(arriving, chunks = 2, (b, id) => {
      BlockStore.append(spark, b, "doc_id", "text", 16, store, s"s$id")
      if (id == 1L && !crashed) {
        crashed = true
        throw new RuntimeException(
          "injected: crash after store write, before offset commit")
      }
    })
    assert(crashed && restarts == 1, s"crash must fire once: $restarts")

    val ref = freshStore("crash_blocks_ref")
    val mid = 399L
    BlockStore.append(spark, docs.filter(col("doc_id") > cut &&
      col("doc_id") <= mid), "doc_id", "text", 16, ref, "s0")
    BlockStore.append(spark, docs.filter(col("doc_id") > mid),
      "doc_id", "text", 16, ref, "s1")
    def dedupedOf(s: BlockStore) =
      BlockStore.deduped(spark, s).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).sortBy(_._1).toSeq
    val replayed = dedupedOf(store)
    assert(replayed.nonEmpty)
    // The replayed stream's state must match SOME clean two-batch
    // append over the same id-ordered feed — and any id-ordered split
    // yields the d29 one-shot answer, which the gate's oracle pins;
    // here we compare against the one-shot operator directly so the
    // spec doesn't depend on the stream's chunk boundary.
    val oneShot = graft.operators.Dedup
      .blockDedup(docs, "doc_id", "text", 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(_._1).toSeq
    assert(replayed == oneShot,
      "replayed block-dedup state diverged from the one-shot dedup")
    assert(dedupedOf(ref) == oneShot,
      "clean two-batch append diverged from the one-shot dedup")
    BlockStore.reset(spark, store)
    BlockStore.reset(spark, ref)
    graft.core.Caches.releaseAll()
  }

  test("postings ingest: crash between partition write and offset " +
      "commit, replay converges to the batch append (st17's path)") {
    import spark.implicits._
    import graft.operators.PostingsStore
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val cut = docs.agg(max(col("doc_id"))).head.getLong(0) * 3 / 5
    def freshStore(name: String): PostingsStore = {
      val store = PostingsStore(name)
      PostingsStore.build(spark, docs.filter(col("doc_id") <= cut),
        "doc_id", "text", store)
      store
    }
    val store = freshStore("crash_postings")
    val arriving = docs.filter(col("doc_id") > cut)
      .select(col("doc_id"), col("text")).as[DocRow].collect()
      .sortBy(_.doc_id).toSeq

    @volatile var crashed = false
    val restarts = streamWithCrashes(arriving, chunks = 2, (b, id) => {
      PostingsStore.append(spark, b, "doc_id", "text", store, s"s$id")
      if (id == 1L && !crashed) {
        crashed = true
        throw new RuntimeException(
          "injected: crash after partition write, before offset commit")
      }
    })
    assert(crashed && restarts == 1, s"crash must fire once: $restarts")

    val ref = freshStore("crash_postings_ref")
    PostingsStore.append(spark, docs.filter(col("doc_id") > cut),
      "doc_id", "text", ref, "b1")
    def topOf(s: PostingsStore) =
      PostingsStore.selfTopK(spark, s, k = 5).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).sortBy(t => (t._1, t._2)).toSeq
    val replayed = topOf(store)
    assert(replayed.nonEmpty)
    assert(replayed == topOf(ref),
      "replayed postings ranking diverged from the clean append")
    PostingsStore.reset(spark, store)
    PostingsStore.reset(spark, ref)
    graft.core.Caches.releaseAll()
  }

  test("span-store ingest: crash between gram write and offset " +
      "commit, replay converges to the one-shot span dedup (st11's " +
      "path)") {
    import spark.implicits._
    import graft.operators.{Dedup, SpanStore}
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val cut = docs.agg(max(col("doc_id"))).head.getLong(0) * 3 / 5
    def freshStore(name: String): SpanStore = {
      val store = SpanStore(name)
      SpanStore.build(spark, docs.filter(col("doc_id") <= cut),
        "doc_id", "text", k = 5, store)
      store
    }
    val store = freshStore("crash_span")
    val arriving = docs.filter(col("doc_id") > cut)
      .select(col("doc_id"), col("text")).as[DocRow].collect()
      .sortBy(_.doc_id).toSeq

    @volatile var crashed = false
    val restarts = streamWithCrashes(arriving, chunks = 2, (b, id) => {
      SpanStore.appendBatch(spark, b, "doc_id", "text", k = 5, store,
        s"s$id")
      // appendBatch lands the gram partition eagerly; the returned
      // rewrite frame is this micro-batch's OUTPUT, not store state —
      // the seam under test is the persisted occurrence rows.
      if (id == 1L && !crashed) {
        crashed = true
        throw new RuntimeException(
          "injected: crash after gram write, before offset commit")
      }
    })
    assert(crashed && restarts == 1, s"crash must fire once: $restarts")

    // The store must hold exactly the full corpus's occurrences: the
    // store-derived rewrite of the whole corpus equals the one-shot
    // span dedup. A replay that paired the batch against its own
    // half-written partition would double-mark its first occurrences.
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(_._1).toSeq
    val replayed = rows(SpanStore.rewriteFrom(spark, docs, "doc_id",
      "text", k = 5, store))
    assert(replayed.nonEmpty)
    val oneShot = rows(Dedup.spanDedup(docs, "doc_id", "text", k = 5))
    assert(replayed == oneShot,
      "replayed span-store state diverged from the one-shot dedup")
    SpanStore.reset(spark, store)
    graft.core.Caches.releaseAll()
  }

  test("semantic-store ingest: crash between verdict write and offset " +
      "commit, replay converges to the batch append (st14's path)") {
    import spark.implicits._
    import graft.operators.SemanticStore
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val cut = emb.agg(max(col("vec_id"))).head.getLong(0) * 4 / 5
    def freshStore(name: String): SemanticStore = {
      val store = SemanticStore(name)
      SemanticStore.build(spark, emb.filter(col("vec_id") <= cut),
        "vec_id", "embedding", k = 10, iters = 3, threshold = 0.45,
        store)
      store
    }
    val store = freshStore("crash_sem")
    val arriving = emb.filter(col("vec_id") > cut)
      .select(col("vec_id"), col("embedding")).as[EmbRow].collect()
      .sortBy(_.vec_id).toSeq

    @volatile var crashed = false
    val restarts = streamWithCrashes(arriving, chunks = 2, (b, id) => {
      SemanticStore.append(spark, b, "vec_id", "embedding", store,
        s"s$id")
      // The seam: the verdict partition is written, the offset is not —
      // the replay must not pair the batch with its own half-written
      // rows (the verdicts() batch-partition exclusion).
      if (id == 1L && !crashed) {
        crashed = true
        throw new RuntimeException(
          "injected: crash after verdict write, before offset commit")
      }
    })
    assert(crashed && restarts == 1, s"crash must fire once: $restarts")

    val ref = freshStore("crash_sem_ref")
    SemanticStore.append(spark, emb.filter(col("vec_id") > cut),
      "vec_id", "embedding", ref, "b1")
    def keepsOf(s: SemanticStore) =
      SemanticStore.keeps(spark, s, "vec_id").collect()
        .map(r => (r.getLong(0), r.getBoolean(2))).sortBy(_._1).toSeq
    val replayed = keepsOf(store)
    assert(replayed.nonEmpty)
    assert(replayed == keepsOf(ref),
      "replayed semantic verdicts diverged from the clean append")
    SemanticStore.reset(spark, store)
    SemanticStore.reset(spark, ref)
    graft.core.Caches.releaseAll()
  }

  test("link-graph ingest: crash between rank checkpoint and offset " +
      "commit, replay converges to the batch append (st15's path)") {
    import spark.implicits._
    import graft.operators.LinkGraphStore
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").as("id"))
    val n = docs.count()
    def linkEdges(pred: org.apache.spark.sql.Column) =
      graft.operators.GraphQueries.syntheticEdges(docs.filter(pred), n)
    def freshStore(name: String): LinkGraphStore = {
      val store = LinkGraphStore(name)
      LinkGraphStore.build(spark, docs,
        linkEdges(col("id") % 5 =!= 0), iters = 3, store)
      store
    }
    val store = freshStore("crash_linkgraph")
    val slices = Seq(col("id") % 10 === 0, col("id") % 10 === 5)
      .map(p => linkEdges(p).as[EdgeRow].collect()
        .sortBy(e => (e.src, e.dst)).toSeq)

    // The chained-warm-start hazard this spec exists for: fromBatch
    // MUST derive from the replay-stable micro-batch id. A `var last`
    // updated after appendAndRank would survive the in-JVM restart
    // and make the replayed batch warm-start from its OWN checkpoint
    // — 6 rounds instead of 3, a silently wrong vector.
    @volatile var crashed = false
    val checkpoint = Files.createTempDirectory("graft_lg_ckpt").toString
    val input = MemoryStream[EdgeRow](spark)
    def start() = input.toDF().writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        LinkGraphStore.appendAndRank(spark, docs, b, iters = 3, store,
          s"s$id", fromBatch = if (id == 0L) "base" else s"s${id - 1}")
        if (id == 1L && !crashed) {
          crashed = true
          throw new RuntimeException(
            "injected: crash after rank checkpoint, before offset commit")
        }
      }
      .outputMode("append").start()
    var q = start()
    var restarts = 0
    def drain(): Unit =
      try q.processAllAvailable()
      catch { case _: Exception => restarts += 1; q = start(); drain() }
    slices.foreach { c => input.addData(c); drain() }
    q.stop()
    assert(crashed && restarts == 1, s"crash must fire once: $restarts")

    val ref = freshStore("crash_linkgraph_ref")
    LinkGraphStore.appendAndRank(spark, docs,
      linkEdges(col("id") % 10 === 0), iters = 3, ref, "s0")
    LinkGraphStore.appendAndRank(spark, docs,
      linkEdges(col("id") % 10 === 5), iters = 3, ref, "s1",
      fromBatch = "s0")
    def ranksOf(s: LinkGraphStore) =
      LinkGraphStore.ranks(spark, s, "s1").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val replayed = ranksOf(store)
    assert(replayed.nonEmpty)
    assert(replayed == ranksOf(ref),
      "replayed link-graph ranks diverged from the batch append")
    LinkGraphStore.reset(spark, store)
    LinkGraphStore.reset(spark, ref)
    graft.core.Caches.releaseAll()
  }

  test("components ingest: crash between label checkpoint and offset " +
      "commit, replay converges to the batch append (st18's path)") {
    import spark.implicits._
    import graft.operators.{GraphQueries, LinkGraphStore}
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").as("id"))
    def freshStore(name: String): LinkGraphStore = {
      val store = LinkGraphStore(name)
      LinkGraphStore.buildEdges(spark,
        GraphQueries.blockStars(docs), store)
      LinkGraphStore.labelComponents(spark, docs, store, "base")
      store
    }
    val store = freshStore("crash_components")
    val slices = Seq(col("src") % 64 === 16, col("src") % 64 =!= 16)
      .map(p => GraphQueries.hubChains(docs).filter(p)
        .as[EdgeRow].collect().sortBy(e => (e.src, e.dst)).toSeq)
    // The seam: the label checkpoint landed, the offset commit did not
    // — the replayed batch must re-converge from s{id-1} (the
    // id-derived chain), overwriting exactly its own two partitions.
    @volatile var crashed = false
    val checkpoint = Files.createTempDirectory("graft_cc_ckpt").toString
    val input = MemoryStream[EdgeRow](spark)
    def start() = input.toDF().writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        LinkGraphStore.appendAndLabel(spark, b, store, s"s$id",
          fromBatch = if (id == 0L) "base" else s"s${id - 1}")
        if (id == 1L && !crashed) {
          crashed = true
          throw new RuntimeException(
            "injected: crash after label checkpoint, before offset commit")
        }
      }
      .outputMode("append").start()
    var q = start()
    var restarts = 0
    def drain(): Unit =
      try q.processAllAvailable()
      catch { case _: Exception => restarts += 1; q = start(); drain() }
    slices.foreach { c => input.addData(c); drain() }
    q.stop()
    assert(crashed && restarts == 1, s"crash must fire once: $restarts")

    val ref = freshStore("crash_components_ref")
    LinkGraphStore.appendAndLabel(spark,
      GraphQueries.hubChains(docs).filter(col("src") % 64 === 16),
      ref, "s0", fromBatch = "base")
    LinkGraphStore.appendAndLabel(spark,
      GraphQueries.hubChains(docs).filter(col("src") % 64 =!= 16),
      ref, "s1", fromBatch = "s0")
    def labelsOf(s: LinkGraphStore) =
      LinkGraphStore.components(spark, s, "s1").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val replayedCc = labelsOf(store)
    assert(replayedCc.nonEmpty)
    assert(replayedCc == labelsOf(ref),
      "replayed component labels diverged from the batch append")
    LinkGraphStore.reset(spark, store)
    LinkGraphStore.reset(spark, ref)
    graft.core.Caches.releaseAll()
  }

  test("communities ingest: crash between community checkpoint and " +
      "offset commit, replay converges to the batch append (st19's " +
      "path)") {
    import spark.implicits._
    import graft.operators.{GraphQueries, LinkGraphStore}
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").as("id"))
    val n = docs.count()
    def freshStore(name: String): LinkGraphStore = {
      val store = LinkGraphStore(name)
      LinkGraphStore.buildEdges(spark,
        GraphQueries.syntheticEdges(docs, n), store)
      LinkGraphStore.propagateCommunities(spark, docs, store, "base")
      store
    }
    val store = freshStore("crash_lpa")
    val slices = Seq(col("src") % 2 === 1, col("src") % 2 === 0)
      .map(p => GraphQueries.blockStars(docs).filter(p)
        .as[EdgeRow].collect().sortBy(e => (e.src, e.dst)).toSeq)
    // The seam: the community checkpoint landed, the offset commit
    // did not — the replayed batch must re-run its warm rounds from
    // s{id-1} (the id-derived chain), overwriting exactly its own two
    // partitions. The warm start reads fromBatch's slice only, never
    // the crashed batch's own partition, so the replay is exact even
    // though LPA's fixed point is start-dependent.
    @volatile var crashed = false
    val checkpoint = Files.createTempDirectory("graft_lpa_ckpt").toString
    val input = MemoryStream[EdgeRow](spark)
    def start() = input.toDF().writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        LinkGraphStore.appendAndPropagate(spark, b, store, s"s$id",
          fromBatch = if (id == 0L) "base" else s"s${id - 1}")
        if (id == 1L && !crashed) {
          crashed = true
          throw new RuntimeException(
            "injected: crash after community checkpoint, before " +
              "offset commit")
        }
      }
      .outputMode("append").start()
    var q = start()
    var restarts = 0
    def drain(): Unit =
      try q.processAllAvailable()
      catch { case _: Exception => restarts += 1; q = start(); drain() }
    slices.foreach { c => input.addData(c); drain() }
    q.stop()
    assert(crashed && restarts == 1, s"crash must fire once: $restarts")

    val ref = freshStore("crash_lpa_ref")
    LinkGraphStore.appendAndPropagate(spark,
      GraphQueries.blockStars(docs).filter(col("src") % 2 === 1),
      ref, "s0", fromBatch = "base")
    LinkGraphStore.appendAndPropagate(spark,
      GraphQueries.blockStars(docs).filter(col("src") % 2 === 0),
      ref, "s1", fromBatch = "s0")
    def communitiesOf(s: LinkGraphStore) =
      LinkGraphStore.communities(spark, s, "s1").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val replayedLpa = communitiesOf(store)
    assert(replayedLpa.nonEmpty)
    assert(replayedLpa == communitiesOf(ref),
      "replayed community labels diverged from the batch append")
    LinkGraphStore.reset(spark, store)
    LinkGraphStore.reset(spark, ref)
    graft.core.Caches.releaseAll()
  }
}
