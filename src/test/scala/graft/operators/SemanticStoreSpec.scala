package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The production contract of the persisted semantic-dedup store: the
  * codebook is trained once and frozen, appends are batch-local against
  * the frozen state, verdicts written once never change, and batch
  * slicing is invisible (N appends ≡ one append of the union).
  */
class SemanticStoreSpec extends SparkSuite {

  private def emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def keepsOf(store: SemanticStore): Seq[(Long, Int, Boolean)] =
    SemanticStore.keeps(spark, store, "vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq

  private def cut: Long =
    emb.agg(max(col("vec_id"))).head().getLong(0) * 3 / 5

  test("batch slicing is invisible: two appends equal one") {
    val a = SemanticStore("sem_spec_a")
    val b = SemanticStore("sem_spec_b")
    val hist = emb.filter(col("vec_id") <= cut)
    val rest = emb.filter(col("vec_id") > cut)
    val mid = emb.agg(max(col("vec_id"))).head().getLong(0) * 4 / 5
    SemanticStore.build(spark, hist, "vec_id", "embedding", 8, 2, 0.45, a)
    SemanticStore.append(spark, rest.filter(col("vec_id") <= mid),
      "vec_id", "embedding", a, "b1")
    SemanticStore.append(spark, rest.filter(col("vec_id") > mid),
      "vec_id", "embedding", a, "b2")
    SemanticStore.build(spark, hist, "vec_id", "embedding", 8, 2, 0.45, b)
    SemanticStore.append(spark, rest, "vec_id", "embedding", b, "b1")
    val got = keepsOf(a)
    assert(got == keepsOf(b))
    assert(got.size == emb.count() && got.exists(!_._3))
    SemanticStore.reset(spark, a)
    SemanticStore.reset(spark, b)
    graft.core.Caches.releaseAll()
  }

  test("appends never retrain the codebook or flip stored verdicts") {
    val store = SemanticStore("sem_spec_c")
    val hist = emb.filter(col("vec_id") <= cut)
    SemanticStore.build(spark, hist, "vec_id", "embedding", 8, 2, 0.45,
      store)
    val cbBefore = spark.table(store.codebookRel).collect().toSet
    val baseBefore = keepsOf(store)
    SemanticStore.append(spark, emb.filter(col("vec_id") > cut),
      "vec_id", "embedding", store, "b1")
    assert(spark.table(store.codebookRel).collect().toSet == cbBefore)
    val after = keepsOf(store).filter(k => baseBefore.exists(_._1 == k._1))
    assert(after == baseBefore) // history verdicts are final
    SemanticStore.reset(spark, store)
    graft.core.Caches.releaseAll()
  }

  test("delete repairs verdicts: the victim's drop-ee resurrects") {
    import spark.implicits._
    // Two tight pairs in orthogonal subspaces: with k=2 seeds (v1, v2)
    // one Lloyd iteration lands {1,2} and {3,4} in separate clusters,
    // so 2 is dropped by predecessor 1 and 4 by predecessor 3.
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.99f, 0.1f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Seq(0.0f, 0.99f, 0.1f, 0.0f))).toDF("vec_id", "embedding")
    val store = SemanticStore("sem_spec_e")
    SemanticStore.build(spark, vecs.filter(col("vec_id") <= 3),
      "vec_id", "embedding", 2, 1, 0.45, store)
    SemanticStore.append(spark, vecs.filter(col("vec_id") === 4),
      "vec_id", "embedding", store, "b1")
    assert(keepsOf(store).map(k => k._1 -> k._3).toMap ==
      Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
    // Take down vector 1: its evidence against 2 vanishes — 2 must
    // flip back to keep; the other cluster's verdicts are untouched.
    val (rewritten, _) = SemanticStore.delete(spark, store,
      Seq(1L).toDF("vec_id"))
    assert(rewritten.nonEmpty)
    assert(keepsOf(store).map(k => k._1 -> k._3).toMap ==
      Map(2L -> true, 3L -> true, 4L -> false))
    // Idempotent: the replayed victim set finds no affected clusters.
    assert(SemanticStore.delete(spark, store, Seq(1L).toDF("vec_id"))
      == ((Nil, Nil)))
    // Emptying a batch partition drops it: 4 was b1's only row.
    val (_, emptied) = SemanticStore.delete(spark, store,
      Seq(3L, 4L).toDF("vec_id"))
    assert(emptied == Seq("b1"))
    assert(keepsOf(store).map(k => k._1 -> k._3).toMap ==
      Map(2L -> true))
    SemanticStore.reset(spark, store)
    graft.core.Caches.releaseAll()
  }

  test("the increment reads the persisted store, not recomputed state") {
    val store = SemanticStore("sem_spec_plan")
    SemanticStore.build(spark, emb.filter(col("vec_id") % 5 =!= 0),
      "vec_id", "embedding", 8, 2, 0.45, store)
    val plan = SemanticStore.verdicts(spark,
        emb.filter(col("vec_id") % 5 === 0), "vec_id", "embedding",
        store, "b1", firstBatch = false)
      .queryExecution.optimizedPlan.toString
    // Store-side predecessors stream off the persisted table...
    assert(plan.contains("sem_vectors"),
      s"increment must scan the persisted store:\n$plan")
    // ...and every raw-embeddings scan carries the batch filter — the
    // assignment pass is batch-sized, never corpus-sized.
    assert(plan.linesIterator.exists(_.contains("% 5) = 0")),
      s"embeddings scans must be batch-filtered:\n$plan")
    assert(!plan.contains("NOT ((vec_id"),
      s"no corpus-side (negated-filter) embeddings scan may appear:\n$plan")
    SemanticStore.reset(spark, store)
    graft.core.Caches.releaseAll()
  }

  test("replaying a batch is idempotent") {
    val store = SemanticStore("sem_spec_d")
    SemanticStore.build(spark, emb.filter(col("vec_id") <= cut),
      "vec_id", "embedding", 8, 2, 0.45, store)
    SemanticStore.append(spark, emb.filter(col("vec_id") > cut),
      "vec_id", "embedding", store, "b1")
    val once = keepsOf(store)
    SemanticStore.append(spark, emb.filter(col("vec_id") > cut),
      "vec_id", "embedding", store, "b1")
    assert(keepsOf(store) == once)
    SemanticStore.reset(spark, store)
    graft.core.Caches.releaseAll()
  }

  test("autoK policy: k = n / target cluster size, clamped to 1") {
    assert(SemanticStore.autoK(500) == 10) // the d13-d16 hand-tuned k
    assert(SemanticStore.autoK(2000) == 40) // 10x corpus -> 10x clusters
    assert(SemanticStore.autoK(49) == 1)
    assert(SemanticStore.autoK(1) == 1)
    // Mean cluster size stays at the target as the corpus grows — the
    // bound on the O(|c|^2) within-cluster search that fixed k loses.
    Seq(500L, 5000L, 500000L).foreach { n =>
      val meanSize = n.toDouble / SemanticStore.autoK(n)
      assert(meanSize <= SemanticStore.TargetClusterSize * 2,
        s"n=$n mean cluster size $meanSize")
    }
  }

  test("autoK recovers full within-cluster recall on clustered data") {
    import spark.implicits._
    // 8 well-separated direction clusters, 400 vectors -> autoK = 8 =
    // the true cluster count; vids round-robin so the k-means seed
    // prefix holds one vector per cluster and Lloyd converges onto the
    // true structure. Every >= tau pair is intra-cluster by
    // construction (orthogonal centers), so the policy's k must catch
    // ALL of them — the recall guarantee auto-k buys when the target
    // cluster size matches real structure (on isotropic data it is a
    // cost policy instead; d16 vs d19 reports that tradeoff honestly).
    val dims = 64
    def vec(i: Int): Seq[Float] = {
      val c = i % 8
      Array.tabulate(dims) { d =>
        val center = if (d % 8 == c) 1.0 else 0.0
        (center + 0.1 * math.sin(1.3 * i + 0.7 * d)).toFloat
      }.toSeq
    }
    val crafted = (0 until 400).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val k = SemanticStore.autoK(400)
    assert(k == 8)
    val r = Similarity.semanticRecallReport(crafted, "vec_id",
      "embedding", k, iters = 3, threshold = 0.45).head()
    assert(r.getAs[Long]("n_pairs") > 0, "fixture must have >= tau pairs")
    assert(r.getAs[Long]("n_cross") == 0,
      s"auto-k on matching structure must catch every pair: $r")
    graft.core.Caches.releaseAll()
  }
}
