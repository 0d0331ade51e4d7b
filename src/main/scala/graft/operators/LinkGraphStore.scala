package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.CatalogMaterializer

/** Persisted, incrementally-maintained link graph — the crawl-side
  * store behind [[Graph]]'s one-shot analytics: a crawl APPENDS edges
  * (today's fetched pages link somewhere new); recomputing PageRank
  * from the uniform vector over the whole accumulated graph every
  * night re-pays every converged round. This store keeps two
  * engine-managed tables (partition-per-batch with dynamic partition
  * overwrite — replay-idempotent, the d10/t26 discipline):
  *
  *  - `edges(src, dst, w, batch_id)` — the accumulated WEIGHTED edge
  *    list (parallel links fold into w at write time — bit-identical
  *    ranking, row-unique layout); a batch append lands one partition,
  *    prior batches are never recomputed;
  *  - `ranks(id, r, batch_id)` — the INTERNAL 12dp rank vector
  *    checkpointed after each ranking run, keyed by the batch that
  *    produced it. Persisting the 12dp vector (not the 6dp output)
  *    is what makes the warm start exact: the next run's round 1 sees
  *    bit-identical inputs to an in-memory continuation, so a DuckDB
  *    oracle can replay the whole build+append history as one unrolled
  *    chain (g06).
  *
  * Incremental contract: [[appendAndRank]] warm-starts from the prior
  * checkpoint — the teleport term makes each round a contraction (the
  * damping factor bounds the Lipschitz constant at 0.85), so ANY start
  * vector converges to the new graph's fixed point, and a start at the
  * OLD fixed point is already close when the append is a small
  * fraction of the graph: re-convergence needs fewer rounds than a
  * cold full recompute (LinkGraphStoreSpec measures exactly this).
  * The vertex set is fixed at build time (the host-graph convention:
  * hosts are enumerable up front; edges between them accumulate).
  */
final case class LinkGraphStore(schemaName: String) {
  val edgesRel: String = s"$schemaName.edges"
  val ranksRel: String = s"$schemaName.ranks"
  val labelsRel: String = s"$schemaName.components"
  val communitiesRel: String = s"$schemaName.communities"
  val takedownsRel: String = s"$schemaName.takedowns"
}

object LinkGraphStore {

  private def mat = new CatalogMaterializer

  /** Drop the store tables — a fresh start for gates/specs. */
  def reset(spark: SparkSession, store: LinkGraphStore): Unit =
    Seq(store.edgesRel, store.ranksRel, store.labelsRel,
      store.communitiesRel, store.takedownsRel)
      .foreach(mat.dropRelation(spark, _))

  /** Full build: land the base edge partition, rank from the uniform
    * vector for `iters` rounds, checkpoint the 12dp vector. REPLACES
    * any existing store (the [[DedupStore.build]] footgun note). */
  def build(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      iters: Int, store: LinkGraphStore,
      batchId: String = "base"): Unit = {
    reset(spark, store)
    writeEdges(spark, store, batchId, edges)
    val n = nodes.count().toDouble
    val start = nodes.select(col("id"),
      round(lit(1.0) / lit(n), 12).as("r"))
    checkpoint(spark, store, batchId,
      Graph.pageRankWeighted(nodes, storedEdges(spark, store), start,
        iters))
  }

  /** Incremental append: land the batch's edge partition, warm-start
    * from the `fromBatch` checkpoint, run `iters` rounds over the
    * UNION of all edge partitions (streamed off parquet — prior
    * batches are never recomputed), and checkpoint the new vector
    * under `batchId`. Re-running the same batchId (crash replay)
    * overwrites exactly its own partitions. */
  def appendAndRank(spark: SparkSession, nodes: DataFrame,
      newEdges: DataFrame, iters: Int, store: LinkGraphStore,
      batchId: String, fromBatch: String = "base"): Unit = {
    writeEdges(spark, store, batchId, newEdges)
    val start = spark.table(store.ranksRel)
      .filter(col("batch_id") === fromBatch)
      .select(col("id"), col("r"))
    checkpoint(spark, store, batchId,
      Graph.pageRankWeighted(nodes, storedEdges(spark, store), start,
        iters))
  }

  /** Fold closed EDGE partitions into `compacted` ([[StoreCompaction]]
    * — ranking reads the union of edge partitions, so partition
    * identity is irrelevant once a batch is closed; what matters at
    * scale is the file population). Rows are (src, dst)-unique within
    * a batch by construction ([[writeEdges]] folds multiplicity into
    * w) and across batches by the crawl convention (a src's outlinks
    * land with its own snapshot), so the fold's replay `distinct()` is
    * sound like every other store's. The
    * RANKS table is deliberately NOT folded: batch identity IS its
    * key (warm starts read a checkpoint BY batch id) — its growth verb
    * is [[pruneCheckpoints]]. */
  def compact(spark: SparkSession, store: LinkGraphStore,
      keep: Set[String]): StoreCompaction.Stats =
    StoreCompaction.compact(spark, store.edgesRel, keep)

  /** Drop rank checkpoints not in `keep` — the ranks-table growth
    * bound: a checkpoint is only ever read by name as a warm-start
    * base, so once a newer checkpoint exists the old vector is dead
    * state (an edge-partition fold never needs it back). Returns the
    * dropped batch ids. */
  def pruneCheckpoints(spark: SparkSession, store: LinkGraphStore,
      keep: Set[String]): Seq[String] =
    prunePartitions(spark, store.ranksRel, keep)

  /** [[pruneCheckpoints]] for the components table — the same growth
    * bound (one label assignment per batch, only ever read by name as
    * a warm-start base). Takedown manifests are deliberately NOT
    * prunable here: a manifest is the replay anchor of its own delete
    * and retires with the retention policy, not with checkpoint
    * cleanup. */
  def pruneComponentCheckpoints(spark: SparkSession,
      store: LinkGraphStore, keep: Set[String]): Seq[String] =
    prunePartitions(spark, store.labelsRel, keep)

  /** [[pruneComponentCheckpoints]] for the communities table — same
    * growth bound, same read-by-name-only lifecycle. */
  def pruneCommunityCheckpoints(spark: SparkSession,
      store: LinkGraphStore, keep: Set[String]): Seq[String] =
    prunePartitions(spark, store.communitiesRel, keep)

  private def prunePartitions(spark: SparkSession, rel: String,
      keep: Set[String]): Seq[String] = {
    val ids = spark.table(rel)
      .select(col("batch_id").cast("string")).distinct()
      .collect().map(_.getString(0)).toIndexedSeq.sorted
    val drop = ids.filterNot(keep)
    drop.foreach(id => mat.dropPartition(spark, rel, "batch_id", id))
    drop
  }

  /** Host TAKEDOWN with rank repair: remove `victims` (one `id`
    * column) — their edges in BOTH directions and their rows in every
    * rank checkpoint leave partition-scoped ([[StoreRetention]]) —
    * then re-converge `iters` rounds over the surviving graph,
    * warm-started from the `fromBatch` checkpoint's SURVIVING slice
    * (the victims' rank rows are gone by the time the lazy start frame
    * executes, so the start vector is exactly the old fixed point
    * restricted to survivors). The teleport contraction argument that
    * justifies g06's warm append applies unchanged to removal: any
    * start vector converges, and the old fixed point minus a small
    * victim set is already close — re-convergence is cheaper than a
    * cold recompute. `nodes` is the SURVIVING vertex set (a takedown
    * shrinks the fixed host enumeration); the g10 oracle replays the
    * whole build → append → delete chain unrolled, so the repaired
    * ranks hash-match to the bit. Idempotent: a replay deletes nothing
    * and re-runs the same contraction from the same checkpoint. */
  def deleteAndRank(spark: SparkSession, nodes: DataFrame,
      victims: DataFrame, iters: Int, store: LinkGraphStore,
      batchId: String, fromBatch: String)
      : Seq[StoreRetention.DeleteStats] = {
    val stats = Seq(
      StoreRetention.deleteRows(spark, store.edgesRel, victims,
        (t, v) => t("src") === v("id")),
      StoreRetention.deleteRows(spark, store.edgesRel, victims,
        (t, v) => t("dst") === v("id")),
      StoreRetention.deleteRows(spark, store.ranksRel, victims,
        (t, v) => t("id") === v("id")))
    val start = spark.table(store.ranksRel)
      .filter(col("batch_id") === fromBatch)
      .select(col("id"), col("r"))
    checkpoint(spark, store, batchId,
      Graph.pageRankWeighted(nodes, storedEdges(spark, store), start,
        iters))
    stats
  }

  /** Full build of the EDGE table only — the entry point for stores
    * whose analytics are label-shaped rather than rank-shaped (the
    * components lifecycle below needs no rank vector). REPLACES any
    * existing store. */
  def buildEdges(spark: SparkSession, edges: DataFrame,
      store: LinkGraphStore, batchId: String = "base"): Unit = {
    reset(spark, store)
    writeEdges(spark, store, batchId, edges)
  }

  // ---- Connected-components lifecycle (g12/g13): the accumulating
  // dedup-cluster / web-graph state PageRank already has (g06/g10),
  // for component labels. The persisted assignment is exact state —
  // label = min id of the component — so maintenance verbs get the
  // same contracts: append ≡ cold recompute over the union graph,
  // takedown ≡ cold recompute over the survivors.

  /** Cold component labeling over the accumulated edge union,
    * checkpointed under `batchId` as `components(id, label)`. `nodes`
    * is the fixed vertex enumeration (the build-time convention ranks
    * use); isolated nodes label themselves. */
  def labelComponents(spark: SparkSession, nodes: DataFrame,
      store: LinkGraphStore, batchId: String,
      maxIter: Int = 15): Unit =
    writeLabels(spark, store, batchId,
      Graph.connectedComponents(nodes, storedEdges(spark, store),
        maxIter))

  /** Incremental re-label after an edge append: land the batch's edge
    * partition, then re-converge from the `fromBatch` checkpoint over
    * the union of all edge partitions. The warm start is exact — the
    * fixed point is min-id per union component regardless of the start
    * ([[Graph.minLabelFixpoint]]'s argument) — and cheap: rounds are
    * bounded by how many OLD components the new edges chain together,
    * not by the graph diameter, because every old component already
    * agrees on one label. Replay-idempotent like [[appendAndRank]]:
    * the same batchId overwrites exactly its own two partitions. */
  def appendAndLabel(spark: SparkSession, newEdges: DataFrame,
      store: LinkGraphStore, batchId: String, fromBatch: String,
      maxIter: Int = 15): Unit = {
    writeEdges(spark, store, batchId, newEdges)
    val start = spark.table(store.labelsRel)
      .filter(col("batch_id") === fromBatch)
      .select(col("id"), col("label"))
    writeLabels(spark, store, batchId,
      Graph.connectedComponentsFrom(start,
        storedEdges(spark, store), maxIter))
  }

  /** Host TAKEDOWN with component repair — the verb that RESURRECTS
    * split components: victims' edges (both directions) and their rows
    * in every label checkpoint leave partition-scoped, then only the
    * AFFECTED components — those that contained a victim — are
    * relabeled cold over their surviving subgraph; every other
    * component keeps its `fromBatch` label verbatim (none of its
    * edges or members changed, so its min id did not either). A hub
    * removal splits its star into singletons and each fragment
    * re-labels to its own min id — the per-fragment resurrection the
    * one-shot g03 could only get by full recompute. Unaffected work is
    * ZERO beyond one broadcast semi-join: the affected set is bounded
    * by the victim components' size, never the graph.
    *
    * REPLAY SAFETY (the at-least-once seam StreamCrashReplaySpec pins
    * for ingest, here for a takedown): the victim components must be
    * identified from the PRE-delete assignment, but a replay arrives
    * after the retention rewrite already dropped the victims' label
    * rows — deriving them from live state would find nothing and
    * silently copy the stale labels forward (a crashed takedown that
    * "completes" wrong). So the FIRST write is a takedown MANIFEST —
    * `takedowns(id, label, batch_id)`, the victims with their old
    * labels — and every later step reads the manifest, never the live
    * table. A replay whose fresh derivation comes up empty while its
    * manifest partition exists is the post-retention crash case and
    * reuses the persisted manifest; any other replay re-derives the
    * identical manifest and overwrites its own partition. */
  def deleteAndLabel(spark: SparkSession, victims: DataFrame,
      store: LinkGraphStore, batchId: String, fromBatch: String,
      maxIter: Int = 15): Seq[StoreRetention.DeleteStats] = {
    val fresh = spark.table(store.labelsRel)
      .filter(col("batch_id") === fromBatch)
      .join(victims.select(col("id")), Seq("id"), "left_semi")
      .select(col("id"), col("label")).localCheckpoint()
    val manifestExists = mat.relationExists(spark, store.takedownsRel) &&
      !spark.table(store.takedownsRel)
        .filter(col("batch_id") === batchId).limit(1).isEmpty
    if (!(fresh.limit(1).isEmpty && manifestExists))
      writePartition(spark, store.takedownsRel, batchId, fresh)
    val victimLabels = spark.table(store.takedownsRel)
      .filter(col("batch_id") === batchId)
      .select(col("label")).distinct()
    val stats = Seq(
      StoreRetention.deleteRows(spark, store.edgesRel, victims,
        (t, v) => t("src") === v("id")),
      StoreRetention.deleteRows(spark, store.edgesRel, victims,
        (t, v) => t("dst") === v("id")),
      StoreRetention.deleteRows(spark, store.labelsRel, victims,
        (t, v) => t("id") === v("id")))
    // Survivors of the victim components (their label rows survived
    // the rewrite; the victims' own did not).
    val prior = spark.table(store.labelsRel)
      .filter(col("batch_id") === fromBatch)
      .select(col("id"), col("label"))
    val affected = prior.join(broadcast(victimLabels),
      Seq("label"), "left_semi").select(col("id"), col("label"))
    // Edges never cross components, so filtering src to the affected
    // set keeps exactly the affected subgraph (post-delete: victim
    // edges are already gone).
    val subEdges = storedEdges(spark, store)
      .join(affected.select(col("id").as("src")), Seq("src"),
        "left_semi")
    val relabeled = Graph.connectedComponents(
      affected.select(col("id")), subEdges, maxIter)
      .select(col("id"), col("component").as("label"))
    val unaffected = prior.join(broadcast(victimLabels),
      Seq("label"), "left_anti").select(col("id"), col("label"))
    // localCheckpoint: both halves lazily read labelsRel (prior /
    // affected derive from the fromBatch slice), and the write below
    // rewrites that same table — an unpinned source plan would race
    // its own rewrite (the deleteFull lesson).
    writeLabels(spark, store, batchId, unaffected
      .unionByName(relabeled)
      .select(col("id"), col("label").as("component"))
      .localCheckpoint())
    stats
  }

  /** Cold LPA communities ([[Graph.labelPropagation]]) over the
    * accumulated edge union, checkpointed under `batchId` as
    * `communities(id, label)` — the community analogue of
    * [[labelComponents]], in its own table because the two
    * assignments version independently (a rank/component checkpoint
    * proves nothing about the community state). */
  def propagateCommunities(spark: SparkSession, nodes: DataFrame,
      store: LinkGraphStore, batchId: String, iters: Int = 2): Unit =
    writeCommunities(spark, store, batchId,
      Graph.labelPropagation(nodes, storedEdges(spark, store), iters))

  /** Incremental re-propagation after an edge append: land the
    * batch's edge partition, then run `iters` MORE synchronous LPA
    * rounds from the `fromBatch` assignment over the union of all
    * edge partitions. Unlike components, LPA's fixed point depends on
    * the start — warm is NOT cold, and that is the contract: the
    * stored assignment plus k rounds over the new union IS the
    * incremental semantics (what a nightly community refresh runs),
    * replayable bit-for-bit because each round is a pure function of
    * the previous labeling. Replay-idempotent like [[appendAndRank]]:
    * the same batchId overwrites exactly its own two partitions. */
  def appendAndPropagate(spark: SparkSession, newEdges: DataFrame,
      store: LinkGraphStore, batchId: String, fromBatch: String,
      iters: Int = 2): Unit = {
    writeEdges(spark, store, batchId, newEdges)
    val start = spark.table(store.communitiesRel)
      .filter(col("batch_id") === fromBatch)
      .select(col("id"), col("label"))
    writeCommunities(spark, store, batchId,
      Graph.labelPropagationFrom(start,
        storedEdges(spark, store), iters))
  }

  /** Host takedown with community REPAIR — the victims' edges (both
    * directions) and their community rows leave partition-scoped,
    * then `iters` warm LPA rounds re-mix the SURVIVING labels over
    * the surviving graph. The [[deleteAndLabel]] affected-set scoping
    * does NOT apply here: min-label components are edge-closed
    * (edges never cross components) but majority-vote communities are
    * not — any surviving node may flip when a hub's votes disappear —
    * so the correct bounded repair is the [[deleteAndRank]] shape: a
    * warm re-convergence over the whole surviving graph, paying per
    * round one equi-join + two hash aggregates, never a cold restart
    * from the identity labeling. No takedown manifest is needed
    * (contrast [[deleteAndLabel]]): the repair reads only POST-delete
    * state — the surviving `fromBatch` slice — which a replay that
    * crashed past the retention rewrite re-reads identically. */
  def deleteAndPropagate(spark: SparkSession, victims: DataFrame,
      store: LinkGraphStore, batchId: String, fromBatch: String,
      iters: Int = 2): Seq[StoreRetention.DeleteStats] = {
    val stats = Seq(
      StoreRetention.deleteRows(spark, store.edgesRel, victims,
        (t, v) => t("src") === v("id")),
      StoreRetention.deleteRows(spark, store.edgesRel, victims,
        (t, v) => t("dst") === v("id")),
      StoreRetention.deleteRows(spark, store.communitiesRel, victims,
        (t, v) => t("id") === v("id")))
    // localCheckpoint: the start slice lazily reads communitiesRel,
    // which writeCommunities below rewrites — an unpinned source plan
    // would race its own rewrite (the deleteFull lesson).
    val start = spark.table(store.communitiesRel)
      .filter(col("batch_id") === fromBatch)
      .select(col("id"), col("label")).localCheckpoint()
    writeCommunities(spark, store, batchId,
      Graph.labelPropagationFrom(start,
        storedEdges(spark, store), iters))
    stats
  }

  /** The checkpointed community assignment at `batchId`. */
  def communities(spark: SparkSession, store: LinkGraphStore,
      batchId: String): DataFrame =
    spark.table(store.communitiesRel)
      .filter(col("batch_id") === batchId)
      .select(col("id"), col("label").as("community"))

  private def writeCommunities(spark: SparkSession,
      store: LinkGraphStore, batchId: String,
      labeled: DataFrame): Unit =
    writePartition(spark, store.communitiesRel, batchId,
      labeled.select(col("id"), col("community").as("label")))

  /** The checkpointed component assignment at `batchId`. */
  def components(spark: SparkSession, store: LinkGraphStore,
      batchId: String): DataFrame =
    spark.table(store.labelsRel)
      .filter(col("batch_id") === batchId)
      .select(col("id"), col("label").as("component"))

  private def writeLabels(spark: SparkSession, store: LinkGraphStore,
      batchId: String, labeled: DataFrame): Unit =
    writePartition(spark, store.labelsRel, batchId,
      labeled.select(col("id"), col("component").as("label")))

  /** The accumulated weighted edge union (src, dst, w). Stores
    * persisted before the weighted-edge format carry no `w` column;
    * those rows were written pre-fold (one row per parallel link), so
    * reading them as w = 1 is exact, not an approximation — the store
    * keeps ranking across the format upgrade with no migration. */
  private def storedEdges(spark: SparkSession,
      store: LinkGraphStore): DataFrame = {
    val t = spark.table(store.edgesRel)
    val w = if (t.columns.contains("w")) col("w") else lit(1L).as("w")
    t.select(col("src"), col("dst"), w)
  }

  /** Land one WEIGHTED edge partition: parallel (src, dst) links in
    * the batch fold into w — bit-identical ranking (decimal x integer
    * is exact) and the row-unique layout replay-safe compaction
    * requires. A src's outlinks land with its OWN crawl snapshot (the
    * id-ordered batch convention), so (src, dst) never repeats across
    * batches and the fold's distinct() is sound. */
  private def writeEdges(spark: SparkSession, store: LinkGraphStore,
      batchId: String, edges: DataFrame): Unit =
    writePartition(spark, store.edgesRel, batchId,
      edges.groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("w")))

  /** The checkpointed ranking at `batchId`, at the 6dp output
    * contract. */
  def ranks(spark: SparkSession, store: LinkGraphStore,
      batchId: String): DataFrame =
    spark.table(store.ranksRel)
      .filter(col("batch_id") === batchId)
      .select(col("id"), round(col("r"), 6).as("pagerank"))

  private def checkpoint(spark: SparkSession, store: LinkGraphStore,
      batchId: String, vector: DataFrame): Unit =
    writePartition(spark, store.ranksRel, batchId,
      vector.select(col("id"), col("r")))

  private def writePartition(spark: SparkSession, rel: String,
      batchId: String, df: DataFrame): Unit = {
    mat.dropPartition(spark, rel, "batch_id", batchId)
    mat.materializeIncremental(spark, rel,
      df.withColumn("batch_id", lit(batchId)), Seq("batch_id"))
  }
}
