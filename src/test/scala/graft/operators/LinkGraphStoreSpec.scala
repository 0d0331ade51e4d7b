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
}
