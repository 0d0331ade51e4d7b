package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Checkpoints

/** Link-graph analytics over a crawled corpus — the crawl-side ranking
  * signals (CommonCrawl publishes exactly these: PageRank/harmonic
  * centrality over the host graph drive crawl prioritization and
  * per-domain quality priors).
  *
  * Scale design: one iteration is one equi-join of the edge list with
  * the current rank vector plus one hash aggregate on the destination —
  * the textbook message-passing round, embarrassingly parallel, state
  * strictly (nodes + edges)-sized. Iterations chain through
  * [[Checkpoints.truncate]] (the d05 lineage-truncation pattern) so the
  * plan never re-embeds the whole upstream tree per round.
  *
  * Float discipline (the t23 contract): per-edge contributions are
  * `round(r / outdeg, 12)` cast to DECIMAL(28,12) and SUMMED EXACTLY —
  * order-independent, so 32 partitions and one DuckDB scan agree — and
  * each round's new rank re-rounds at 12dp; only IEEE-identical scalar
  * expressions (`0.15/N + 0.85·s`) run as double on both engines.
  */
object Graph {

  /** PageRank with damping 0.85, `iters` synchronous rounds from the
    * uniform vector. `edges(src, dst)` must have outdeg ≥ 1 for every
    * src (dangling-mass redistribution is a policy knob this operator
    * does not need — the gate's synthetic graph has no dangling
    * nodes); `nodes(id)` fixes the vertex set. Returns (id, pagerank)
    * at the 6dp output contract. */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int)
      : DataFrame = {
    // Bounded driver scalar: the vertex count (one long) — the same
    // move the oracle's COUNT(*) scalar subquery makes.
    val n = nodes.count().toDouble
    val outdeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg"))
    var r = nodes.select(col("id"),
      round(lit(1.0) / lit(n), 12).as("r"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(r.withColumnRenamed("id", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst"),
          round(col("r") / col("outdeg").cast("double"), 12)
            .cast("decimal(28,12)").as("c"))
      val sums = contrib.groupBy(col("dst")).agg(sum(col("c")).as("s"))
      r = Checkpoints.truncate(
        nodes.join(sums.withColumnRenamed("dst", "id"), Seq("id"), "left")
          .select(col("id"),
            round(lit(0.15) / lit(n) + lit(0.85) *
              coalesce(col("s").cast("double"), lit(0.0)), 12).as("r")))
    }
    r.select(col("id"), round(col("r"), 6).as("pagerank"))
  }

  /** Personalized PageRank — the TrustRank shape (Gyöngyi et al.,
    * VLDB 2004): the teleport distribution concentrates on a trusted
    * SEED set instead of the uniform vector, so rank flows outward from
    * the seeds and pages far from every seed decay geometrically — the
    * crawl-side trust / spam-demotion prior (seed = manually vetted
    * hosts; a low trust score on a high-PageRank host is the spam
    * signature). Same message-passing round, lineage truncation, and
    * float discipline as [[pageRank]]; the only changes are the start
    * vector (uniform over seeds) and the teleport term
    * `(1−d)·[id ∈ S]/|S|`, and seed membership rides the rank frame as
    * a boolean column — no extra join inside the loop, identical
    * per-round cost. `seeds(id)` must be a subset of `nodes(id)`. */
  def personalizedPageRank(nodes: DataFrame, edges: DataFrame,
      seeds: DataFrame, iters: Int): DataFrame = {
    // Bounded driver scalar: the seed count (one long), the same move
    // as pageRank's vertex count / the oracle's COUNT(*) subquery.
    val sCount = seeds.count().toDouble
    val tagged = nodes.join(seeds.withColumn("is_seed", lit(true)),
        Seq("id"), "left")
      .select(col("id"),
        coalesce(col("is_seed"), lit(false)).as("is_seed"))
    val outdeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg"))
    var r = tagged.select(col("id"), col("is_seed"),
      round(when(col("is_seed"), lit(1.0) / lit(sCount))
        .otherwise(lit(0.0)), 12).as("r"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(r.select(col("id").as("src"), col("r")), "src")
        .join(outdeg, "src")
        .select(col("dst"),
          round(col("r") / col("outdeg").cast("double"), 12)
            .cast("decimal(28,12)").as("c"))
      val sums = contrib.groupBy(col("dst")).agg(sum(col("c")).as("s"))
      r = Checkpoints.truncate(
        tagged.join(sums.withColumnRenamed("dst", "id"), Seq("id"), "left")
          .select(col("id"), col("is_seed"),
            round(when(col("is_seed"), lit(0.15) / lit(sCount))
                .otherwise(lit(0.0)) +
              lit(0.85) * coalesce(col("s").cast("double"), lit(0.0)),
              12).as("r")))
    }
    r.select(col("id"), round(col("r"), 6).as("trustrank"))
  }

  /** Connected components over an undirected view of `edges` — the
    * d05 min-label propagation generalized to an arbitrary edge list
    * (d05 runs it on the near-dup pair graph; this runs it on any link
    * graph). Each round is one edge⋈label join + a min aggregate,
    * lineage truncated per round ([[Checkpoints.truncate]] — a plain
    * cache re-plans the whole upstream tree every round); rounds are
    * bounded by component DIAMETER, so callers hand this operator
    * low-diameter graphs (stars, banded-dup graphs) — a long-chain
    * graph wants the pointer-jumping variant, a different operator.
    * Isolated nodes label themselves via the final left join and never
    * enter a propagation round. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 15): DataFrame = {
    val und = Checkpoints.truncate(
      edges.select(col("src").as("a"), col("dst").as("b"))
        .union(edges.select(col("dst").as("a"), col("src").as("b")))
        .distinct())
    var labels = Checkpoints.truncate(
      und.select(col("a").as("id")).distinct()
        .withColumn("label", col("id")))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val viaEdges = und.join(labels, und("a") === labels("id"))
        .select(col("b").as("id"), col("label"))
      val next = Checkpoints.truncate(
        labels.select(col("id"), col("label")).union(viaEdges)
          .groupBy(col("id")).agg(min(col("label")).as("label")))
      converged = next
        .join(labels.withColumnRenamed("label", "prev"), "id")
        .filter(col("label") =!= col("prev"))
        .limit(1).isEmpty
      labels = next
      iter += 1
    }
    nodes.join(labels, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("label"), col("id")).as("component"))
  }

  /** Two-hop reach: |{v : dist(u,v) ≤ 2, v ≠ u}| per node — the
    * influence/coverage measure behind seed selection and crawl
    * frontier scoring. One edge self-join on the middle vertex, a
    * union with the 1-hop edges, and a distinct before the count (the
    * same pair can arrive down many paths — dedup on the (src, node)
    * PAIR keeps the state pair-set-sized, never path-sized; at 100 TB
    * path multiplicity, not reach, is what explodes). */
  def twoHopReach(edges: DataFrame, nodes: DataFrame): DataFrame = {
    val oneHop = edges.select(col("src"), col("dst"))
    val twoHop = oneHop.as("a")
      .join(oneHop.as("b"), col("a.dst") === col("b.src"))
      .select(col("a.src").as("src"), col("b.dst").as("dst"))
    val reach = oneHop.union(twoHop)
      .filter(col("src") =!= col("dst"))
      .distinct()
      .groupBy(col("src")).agg(count(lit(1)).as("reach2"))
    nodes.join(reach.withColumnRenamed("src", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("reach2"), lit(0L)).as("reach2"))
  }
}
