package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The production contract of the persisted link graph (g06 pins the
  * build+append replay against the unrolled oracle; these pin what the
  * hash can't): batch replay is a no-op, and warm-starting from the
  * persisted vector re-converges FASTER than a cold uniform restart
  * over the appended graph — the reason the store checkpoints the
  * vector at all.
  */
class LinkGraphStoreSpec extends SparkSuite {

  private val n = 60L
  private def nodes = spark.range(n).select(col("id"))
  private def edges(pred: org.apache.spark.sql.Column) =
    nodes.filter(pred).select(col("id").as("src"),
        explode(array((0 to 2).map(j =>
          (col("id") * (7 + j) + lit(13 * j)) % n): _*)).as("dst"))
      .filter(col("dst") =!= col("src"))
  private def base = edges(col("id") % 5 =!= 0)
  private def delta = edges(col("id") % 5 === 0)
  private def full = edges(lit(true))

  private def vec(df: DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("append replay is a no-op: same batchId lands the same ranks") {
    val store = LinkGraphStore("linkgraph_spec")
    LinkGraphStore.build(spark, nodes, base, iters = 3, store)
    LinkGraphStore.appendAndRank(spark, nodes, delta, iters = 3, store,
      "b1")
    val first = vec(LinkGraphStore.ranks(spark, store, "b1"))
    LinkGraphStore.appendAndRank(spark, nodes, delta, iters = 3, store,
      "b1")
    assert(vec(LinkGraphStore.ranks(spark, store, "b1")) == first)
    // Exactly two edge partitions despite three writes.
    assert(spark.table(store.edgesRel).select(col("batch_id"))
      .distinct().count() == 2)
    LinkGraphStore.reset(spark, store)
  }

  test("warm re-convergence beats a cold restart round-for-round") {
    val store = LinkGraphStore("linkgraph_spec_w")
    LinkGraphStore.build(spark, nodes, base, iters = 3, store)
    LinkGraphStore.appendAndRank(spark, nodes, delta, iters = 3, store,
      "b1")
    val warm3 = vec(LinkGraphStore.ranks(spark, store, "b1"))
    // The converged reference: 30 cold rounds on the full graph
    // (damping 0.85 contracts error by ≥ 0.85/round; 30 rounds is
    // ~0.0077× the start error — converged at 6dp for this graph).
    val ref = vec(Graph.pageRank(nodes, full, iters = 30))
    val cold3 = vec(Graph.pageRank(nodes, full, iters = 3))
    def l1(a: Map[Long, Double]) =
      ref.map { case (k, v) => math.abs(a(k) - v) }.sum
    assert(l1(warm3) < l1(cold3),
      s"warm start (${l1(warm3)}) must sit closer to the fixed point " +
        s"than a cold start given the same rounds (${l1(cold3)})")
    LinkGraphStore.reset(spark, store)
  }

  // ---- Components lifecycle (g12/g13's contracts beyond the hash) ----

  private def labels(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("appendAndLabel equals a cold recompute over the union graph, " +
      "and replaying the batch is a no-op") {
    val store = LinkGraphStore("linkgraph_spec_cc")
    LinkGraphStore.buildEdges(spark, base, store)
    LinkGraphStore.labelComponents(spark, nodes, store, "base")
    LinkGraphStore.appendAndLabel(spark, delta, store, "b1",
      fromBatch = "base")
    val warm = labels(LinkGraphStore.components(spark, store, "b1"))
    val cold = labels(Graph.connectedComponents(nodes, full))
    assert(warm == cold,
      "warm re-label must equal the cold recompute over the union")
    LinkGraphStore.appendAndLabel(spark, delta, store, "b1",
      fromBatch = "base")
    assert(labels(LinkGraphStore.components(spark, store, "b1")) == cold)
    assert(spark.table(store.labelsRel).select(col("batch_id"))
      .distinct().count() == 2)
    LinkGraphStore.reset(spark, store)
  }

  test("deleteAndLabel resurrects split components and equals the cold " +
      "recompute over survivors; replay deletes nothing") {
    // A hub-star graph where removing the hub SPLITS the component:
    // 0 is the hub of {0..9}, {20, 21} is a separate pair.
    import spark.implicits._
    val vs = spark.range(22).filter(col("id") <= 9 || col("id") >= 20)
      .select(col("id"))
    val es = ((1L to 9L).map(i => (i, 0L)) :+ (21L, 20L))
      .toDF("src", "dst")
    val store = LinkGraphStore("linkgraph_spec_ccdel")
    LinkGraphStore.buildEdges(spark, es, store)
    LinkGraphStore.labelComponents(spark, vs, store, "base")
    val before = labels(LinkGraphStore.components(spark, store, "base"))
    assert((1L to 9L).forall(before(_) == 0L) && before(21L) == 20L)
    val victims = spark.range(1).select(lit(0L).as("id"))
    LinkGraphStore.deleteAndLabel(spark, victims, store, "t1",
      fromBatch = "base")
    val after = labels(LinkGraphStore.components(spark, store, "t1"))
    // Hub removal: every orphaned leaf resurrects as its own
    // component; the untouched pair keeps its label verbatim.
    assert((1L to 9L).forall(i => after(i) == i),
      s"orphaned leaves must self-label, got $after")
    assert(after(20L) == 20L && after(21L) == 20L)
    assert(!after.contains(0L), "the victim must leave the assignment")
    // Replay after full completion: the takedown manifest re-anchors
    // the affected set (the victims' label rows are long gone from the
    // live table) and the rewrite reproduces itself.
    LinkGraphStore.deleteAndLabel(spark, victims, store, "t1",
      fromBatch = "base")
    assert(labels(LinkGraphStore.components(spark, store, "t1")) == after)
    // Crash seam: retention rewrite committed, final label checkpoint
    // lost (kill between the two writes). The replay must rebuild t1
    // from the persisted manifest — live state alone can no longer
    // name the affected components.
    (new graft.model.CatalogMaterializer)
      .dropPartition(spark, store.labelsRel, "batch_id", "t1")
    LinkGraphStore.deleteAndLabel(spark, victims, store, "t1",
      fromBatch = "base")
    assert(labels(LinkGraphStore.components(spark, store, "t1")) == after,
      "post-retention crash replay must rebuild the repaired labels")
    LinkGraphStore.reset(spark, store)
  }

  // ---- Communities lifecycle (g14/g15's contracts beyond the hash) --

  test("appendAndPropagate runs the warm LPA history exactly and is " +
      "batch-idempotent") {
    val store = LinkGraphStore("linkgraph_spec_lpa")
    LinkGraphStore.buildEdges(spark, base, store)
    LinkGraphStore.propagateCommunities(spark, nodes, store, "base")
    LinkGraphStore.appendAndPropagate(spark, delta, store, "b1",
      fromBatch = "base")
    val warm = labels(LinkGraphStore.communities(spark, store, "b1"))
    // The contract: the warm HISTORY is the semantics — 2 cold rounds
    // over the base edges, then 2 more over the union from that
    // start (LPA's fixed point is start-dependent, so this is the
    // strongest equality that exists).
    val expect = labels(Graph.labelPropagationFrom(
      Graph.labelPropagation(nodes, base, iters = 2)
        .select(col("id"), col("community").as("label")),
      full, iters = 2))
    assert(warm == expect,
      "store append must replay as base rounds + warm union rounds")
    LinkGraphStore.appendAndPropagate(spark, delta, store, "b1",
      fromBatch = "base")
    assert(labels(LinkGraphStore.communities(spark, store, "b1"))
      == expect, "replaying the batch must be a no-op")
    assert(spark.table(store.edgesRel).select(col("batch_id"))
      .distinct().count() == 2)
    LinkGraphStore.reset(spark, store)
  }

  test("deleteAndPropagate re-mixes the surviving labels over the " +
      "surviving graph; post-retention replay is exact") {
    val store = LinkGraphStore("linkgraph_spec_lpad")
    LinkGraphStore.buildEdges(spark, base, store)
    LinkGraphStore.propagateCommunities(spark, nodes, store, "base")
    LinkGraphStore.appendAndPropagate(spark, delta, store, "b1",
      fromBatch = "base")
    // Capture the PRE-delete surviving slice — the repair's warm
    // start — before retention rewrites the table.
    val start = LinkGraphStore.communities(spark, store, "b1")
      .filter(col("id") % 6 =!= 0)
      .select(col("id"), col("community").as("label"))
      .localCheckpoint()
    val victims = nodes.filter(col("id") % 6 === 0)
    LinkGraphStore.deleteAndPropagate(spark, victims, store, "t1",
      fromBatch = "b1")
    val got = labels(LinkGraphStore.communities(spark, store, "t1"))
    val survEdges = full
      .filter(col("src") % 6 =!= 0 && col("dst") % 6 =!= 0)
    val expect = labels(
      Graph.labelPropagationFrom(start, survEdges, iters = 2))
    assert(got == expect,
      "takedown repair must equal warm rounds over the survivors")
    assert(!got.keySet.exists(_ % 6 == 0), "victims must be gone")
    // A replay that crashed past the retention rewrite re-reads the
    // same surviving slice — no manifest needed for this verb.
    LinkGraphStore.deleteAndPropagate(spark, victims, store, "t1",
      fromBatch = "b1")
    assert(labels(LinkGraphStore.communities(spark, store, "t1"))
      == expect, "post-retention replay must rebuild the same labels")
    LinkGraphStore.reset(spark, store)
  }

  test("pre-weighted-format edge stores (no w column) still read, " +
      "treating each row as weight 1") {
    val store = LinkGraphStore("linkgraph_spec_compat")
    LinkGraphStore.reset(spark, store)
    // Simulate a legacy store: land the edges table WITHOUT w.
    val mat = new graft.model.CatalogMaterializer
    mat.materializeIncremental(spark, store.edgesRel,
      base.withColumn("batch_id", lit("base")), Seq("batch_id"))
    LinkGraphStore.labelComponents(spark, nodes, store, "base")
    assert(labels(LinkGraphStore.components(spark, store, "base")) ==
      labels(Graph.connectedComponents(nodes, base)),
      "a legacy store must keep answering after the w-column upgrade")
    LinkGraphStore.reset(spark, store)
  }
}
