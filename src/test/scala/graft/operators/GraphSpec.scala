package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Invariants of the link-graph tier that the g01/g02 hash oracles
  * check only pointwise: probability-mass conservation, the rank
  * floor, and reach bounds — the properties a PageRank implementation
  * silently loses first (dangling leakage, a dropped damping term, a
  * path-multiplicity blowup).
  */
class GraphSpec extends SparkSuite {

  import spark.implicits._

  private val n = 60L
  private def nodes = spark.range(n).select(col("id"))
  // The gate's synthetic 3-out-link graph, small enough to reason about.
  private def edges = nodes.select(col("id").as("src"),
      explode(array((0 to 2).map(j =>
        (col("id") * (7 + j) + lit(13 * j)) % n): _*)).as("dst"))
    .filter(col("dst") =!= col("src"))

  test("pageRank: mass conserves (no dangling nodes, sum ≈ 1) and " +
      "every rank clears the damping floor") {
    val r = Graph.pageRank(nodes, edges, iters = 3).collect()
    assert(r.length == n)
    val total = r.map(_.getDouble(1)).sum
    // Conservation up to the 6dp OUTPUT rounding (±5e-7 per node) plus
    // the 12dp per-step rounding — n·5e-7 is the dominant term.
    assert(math.abs(total - 1.0) < n * 5e-7 + 1e-9,
      s"rank mass drifted: $total")
    val floor = 0.15 / n
    r.foreach(row => assert(row.getDouble(1) >= floor - 1e-9,
      s"node ${row.getLong(0)} fell below the damping floor"))
  }

  test("hits: on a star graph the center is the unique top authority, " +
      "the leaves are the hubs, and both vectors L1-sum to ≈ 1") {
    // 0 ← {1..9}: every leaf points at the center.
    val starNodes = spark.range(10).select(col("id"))
    val starEdges = spark.range(1, 10)
      .select(col("id").as("src"), lit(0L).as("dst"))
    val r = Graph.hits(starNodes, starEdges, iters = 2).collect()
      .map(row => (row.getLong(0), row.getDouble(1), row.getDouble(2)))
      .sortBy(_._1)
    val center = r.find(_._1 == 0L).get
    assert(center._3 > 0.99, s"center authority ${center._3} not ~1")
    assert(center._2 == 0.0, "center has no out-edges; hub must be 0")
    r.filter(_._1 != 0L).foreach { case (id, hub, auth) =>
      assert(auth == 0.0, s"leaf $id has no in-edges; authority != 0")
      assert(math.abs(hub - 1.0 / 9) < 1e-6, s"leaf $id hub $hub")
    }
    val hubSum = r.map(_._2).sum
    val authSum = r.map(_._3).sum
    assert(math.abs(hubSum - 1.0) < 1e-4, s"hub mass $hubSum")
    assert(math.abs(authSum - 1.0) < 1e-4, s"authority mass $authSum")
  }

  test("hits: ranking is degree-monotone on the synthetic graph — " +
      "vectors are nonnegative and normalized") {
    val r = Graph.hits(nodes, edges, iters = 2).collect()
    assert(r.length == n)
    r.foreach { row =>
      assert(row.getDouble(1) >= 0.0 && row.getDouble(2) >= 0.0)
    }
    assert(math.abs(r.map(_.getDouble(1)).sum - 1.0) < n * 5e-7 + 1e-9)
    assert(math.abs(r.map(_.getDouble(2)).sum - 1.0) < n * 5e-7 + 1e-9)
  }

  test("labelPropagation: the 2-round synchronous trace on two bridged " +
      "cliques is exactly the hand computation; an isolate keeps its own") {
    // Cliques {0,1,2} and {10,11,12}, bridge 2–10, isolate 20.
    // Hand trace (most-frequent neighbor label, ties → min):
    //   round 1: 0→1, 1→0, 2→0 (bridge heard), 10→2, 11→10, 12→10
    //   round 2: left clique locks to 0; on the right the bridge's
    //   label-2 leak wins the ties at 11/12 while 10 takes its clique
    //   majority — the textbook synchronous-LPA churn this operator's
    //   fixed-rounds contract makes REPRODUCIBLE rather than hiding.
    val cl = for {
      grp <- Seq(Seq(0L, 1L, 2L), Seq(10L, 11L, 12L))
      a <- grp; b <- grp if a < b
    } yield (a, b)
    val e = (cl :+ (2L, 10L)).toDF("src", "dst")
    val v = Seq(0L, 1L, 2L, 10L, 11L, 12L, 20L).toDF("id")
    val got = Graph.labelPropagation(v, e, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 10L, 11L -> 2L, 12L -> 2L, 20L -> 20L)
    assert(got == expected, s"trace diverged: $got")
  }

  test("labelPropagation: fixed synchronous rounds are reproducible — " +
      "two runs over different partitionings agree exactly") {
    val a = Graph.labelPropagation(nodes, edges, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = Graph.labelPropagation(nodes.repartition(7),
        edges.repartition(11), iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.sameElements(b), "LPA result depends on partitioning")
  }

  test("pageRank: a node with more in-links outranks the floor-only " +
      "case — the signal actually moves") {
    val r = Graph.pageRank(nodes, edges, iters = 3)
      .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
    val indeg = edges.groupBy(col("dst")).agg(count(lit(1)).as("d"))
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    val zeroIn = nodes.collect().map(_.getLong(0))
      .filter(id => !indeg.contains(id))
    // Nodes nobody links to sit exactly at the floor after round 1 and
    // stay there; any linked node must strictly beat them.
    if (zeroIn.nonEmpty) {
      val floorRank = r(zeroIn.head)
      val maxIn = indeg.maxBy(_._2)._1
      assert(r(maxIn) > floorRank,
        "the most-linked node must outrank an unlinked one")
    }
  }

  test("personalizedPageRank: mass conserves, seeds clear the seed " +
      "floor, and a node no seed can reach in `iters` hops scores 0") {
    val seeds = nodes.filter(col("id") % 16 === 0)
    val sCount = seeds.count()
    val r = Graph.personalizedPageRank(nodes, edges, seeds, iters = 3)
      .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(r.size == n)
    val total = r.values.sum
    assert(math.abs(total - 1.0) < n * 5e-7 + 1e-9,
      s"trust mass drifted: $total")
    val floor = 0.15 / sCount
    nodes.filter(col("id") % 16 === 0).collect().map(_.getLong(0))
      .foreach(id => assert(r(id) >= floor - 1e-9,
        s"seed $id fell below the teleport floor"))
    // Unlike uniform PageRank there is NO global floor: a non-seed
    // node with zero in-links gets neither teleport nor contributions
    // and must score exactly 0 — the demotion semantics that make
    // TrustRank a spam signal rather than a popularity one.
    val linked = edges.select(col("dst")).distinct()
      .collect().map(_.getLong(0)).toSet
    val orphans = (0L until n)
      .filter(id => id % 16 != 0 && !linked.contains(id))
    orphans.foreach(id => assert(r(id) == 0.0,
      s"unlinked non-seed $id must hold zero trust, got ${r(id)}"))
  }

  test("pageRank: dangling-node mass redistributes instead of leaking " +
      "— total rank still sums to 1 with 20% of nodes dangling") {
    val dangEdges = edges.filter(col("src") % 5 =!= 0)
    val r = Graph.pageRank(nodes, dangEdges, iters = 3).collect()
    assert(r.length == n)
    val total = r.map(_.getDouble(1)).sum
    // Without redistribution the dangling 20% leaks ~0.85·0.2 of the
    // mass PER ROUND — conservation within rounding noise is the
    // signature that D re-entered the distribution.
    assert(math.abs(total - 1.0) < n * 5e-7 + 1e-9,
      s"rank mass drifted with dangling nodes present: $total")
    // A dangling node still holds rank (teleport + in-links + its share
    // of D) — it must clear the damping floor like everyone else.
    val floor = 0.15 / n
    r.foreach(row => assert(row.getDouble(1) >= floor - 1e-9,
      s"node ${row.getLong(0)} fell below the damping floor"))
  }

  test("pageRank: the redistribution term is exactly zero on a " +
      "dangling-free graph — g01's ranks are bit-identical") {
    // The no-dangling formula, replayed inline: the pre-redistribution
    // pageRank. Any drift here would silently re-hash g01.
    val nD = n.toDouble
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    var expected = nodes.select(col("id"),
      round(lit(1.0) / lit(nD), 12).as("r"))
    for (_ <- 1 to 3) {
      val contrib = edges
        .join(expected.withColumnRenamed("id", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst"),
          round(col("r") / col("outdeg").cast("double"), 12)
            .cast("decimal(28,12)").as("c"))
      val sums = contrib.groupBy(col("dst")).agg(sum(col("c")).as("s"))
      expected = nodes
        .join(sums.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          round(lit(0.15) / lit(nD) + lit(0.85) *
            coalesce(col("s").cast("double"), lit(0.0)), 12).as("r"))
    }
    val want = expected.select(col("id"), round(col("r"), 6).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = Graph.pageRank(nodes, edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (0L until n).foreach(id => assert(got(id) == want(id),
      s"node $id: redistribution path drifted ${got(id)} vs ${want(id)}"))
  }

  test("connectedComponents: exhausting the round budget fails loudly " +
      "instead of returning partially-propagated labels") {
    // A 40-node path has diameter 39 — min-label propagation moves the
    // head's label one hop per round, so maxIter = 3 cannot converge.
    val chain = spark.range(40).select(col("id"))
    val chainEdges = spark.range(39)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val ex = intercept[IllegalArgumentException] {
      Graph.connectedComponents(chain, chainEdges, maxIter = 3).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("connectedComponents: star members label to the block head, " +
      "isolated nodes to themselves") {
    val edges = nodes.filter(col("id") % 4 =!= 0)
      .select(col("id").as("src"), (col("id") - (col("id") % 16)).as("dst"))
      .filter(col("dst") =!= col("src"))
    val out = Graph.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until n).foreach { id =>
      val expected =
        if (id % 4 != 0 || id % 16 == 0) id - id % 16 else id
      assert(out(id) == expected,
        s"node $id: got ${out(id)}, expected $expected")
    }
  }

  test("harmonicCentrality2 equals the brute-force 2-ball BFS over " +
      "in-edges — half-integer scores, prestige direction") {
    val got = Graph.harmonicCentrality2(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // Brute force: reversed adjacency, two BFS levels per node.
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val inAdj = es.groupBy(_._2).map { case (v, ps) =>
      v -> ps.map(_._1).toSet }
    (0L until n).foreach { v =>
      val d1 = inAdj.getOrElse(v, Set.empty) - v
      val d2 = d1.flatMap(u => inAdj.getOrElse(u, Set.empty)) -- d1 - v
      val want = d1.size + 0.5 * d2.size
      assert(got(v) == want, s"node $v: got ${got(v)}, want $want")
    }
  }

  test("twoHopReach: bounded by out-degree fan (≤ 3 + 9) and by n−1, " +
      "and zero only for isolated sources") {
    val reach = Graph.twoHopReach(edges, nodes).collect()
    assert(reach.length == n)
    reach.foreach { row =>
      val v = row.getLong(1)
      assert(v <= math.min(n - 1, 12),
        s"node ${row.getLong(0)} reach $v exceeds the fan bound")
      assert(v >= 1, "every node has out-links in this graph")
    }
  }
}
