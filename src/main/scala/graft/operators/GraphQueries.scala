package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{Q, QueryPack, Tables}

/** Gates for the link-graph tier ([[Graph]]): centrality over a
  * deterministic synthetic link graph on the documents table (the
  * corpus carries no link column; both engines derive the same 3
  * out-links per document from doc_id, self-loops dropped — ids are
  * contiguous 0..N−1, so the modulo lands on real nodes at every SF).
  */
object GraphQueries extends QueryPack {

  /** The synthetic 3-outlink crawl graph over an `id` frame: ids are
    * contiguous 0..N−1 so the modulo lands on real nodes at every SF;
    * self-loops dropped. The ONE Spark-side owner of the edge formula
    * (its SQL twin is [[edgeCte]]) — shared by every g-gate, st15's
    * streamed ingest, and the crash spec, so a formula change cannot
    * silently desynchronize a subset of gates from their oracles. */
  private[graft] def syntheticEdges(docs: org.apache.spark.sql.DataFrame,
      n: Long): org.apache.spark.sql.DataFrame =
    docs.select(col("id").as("src"),
        explode(array((0 to 2).map(j =>
          (col("id") * (7 + j) + 13 * j) % n): _*)).as("dst"))
      .filter(col("dst") =!= col("src"))

  /** g03/g12/g13's base graph: within-block stars — docs link to
    * their 16-block head unless doc_id % 4 = 0. */
  private[graft] def blockStars(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.filter(col("id") % 4 =!= 0)
      .select(col("id").as("src"),
        (col("id") - (col("id") % 16)).as("dst"))
      .filter(col("dst") =!= col("src"))

  /** g12/g13's append batch: block hubs chain to their 64-superblock
    * head — every edge merges old components. */
  private[graft] def hubChains(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.filter(col("id") % 16 === 0 && col("id") % 64 =!= 0)
      .select(col("id").as("src"),
        (col("id") - (col("id") % 64)).as("dst"))
      .filter(col("dst") =!= col("src"))

  /** The g12/g13 oracle: generic recursive-CTE closure over the UNION
    * of [[blockStars]] + [[hubChains]]; `dropMod` removes victims
    * (ids ≡ 0 mod m) from the vertex set AND from every edge endpoint
    * — a node filter alone would leave closure paths through removed
    * hubs. */
  private[graft] def componentsOracle(dropMod: Option[Int]): String = {
    val dF = dropMod.map(m => s" WHERE doc_id % $m <> 0").getOrElse("")
    val eF = dropMod.map(m => s" AND dst % $m <> 0").getOrElse("")
    s"""WITH RECURSIVE d AS (SELECT doc_id FROM documents$dF),
       |e0 AS (
       |  SELECT doc_id src, doc_id - (doc_id % 16) AS dst
       |  FROM d WHERE doc_id % 4 <> 0
       |  UNION ALL
       |  SELECT doc_id, doc_id - (doc_id % 64)
       |  FROM d WHERE doc_id % 16 = 0 AND doc_id % 64 <> 0),
       |e AS (
       |  SELECT src a, dst b FROM e0 WHERE src <> dst$eF
       |  UNION SELECT dst, src FROM e0 WHERE src <> dst$eF),
       |reach(id, r) AS (
       |  SELECT doc_id, doc_id FROM d
       |  UNION
       |  SELECT reach.id, e.b FROM reach JOIN e ON reach.r = e.a)
       |SELECT id AS doc_id, MIN(r) AS component
       |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin
  }

  def queries: Seq[Q] =
    mainGates ++ harmonicGate ++ hitsGate ++ lpaGate ++
      communityStoreGates

  private def mainGates: Seq[Q] = Seq(

    // PageRank ([[Graph.pageRank]]) — 3 synchronous rounds at damping
    // 0.85 from the uniform vector, the crawl-prioritization signal.
    // Exact oracle: the iteration UNROLLS in chained CTEs (the v06
    // k-means pattern) under the t23 float discipline — 12dp-rounded
    // per-edge contributions summed as exact decimals, IEEE-identical
    // scalar updates — so a trained/iterated operator still
    // hash-matches to the bit.
    Q("g01_pagerank",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id").as("id"))
        val n = docs.count()
        val edges = syntheticEdges(docs, n)
        Graph.pageRank(docs, edges, iters = 3)
          .select(col("id").as("doc_id"), col("pagerank"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id FROM documents),
             |nn AS (SELECT COUNT(*) n FROM d),
             |e AS (
             |  SELECT src, dst FROM (
             |    SELECT doc_id src,
             |      (doc_id * (7 + j.k) + 13 * j.k) % nn.n AS dst
             |    FROM d, nn, (SELECT unnest(range(0, 3)) k) j)
             |  WHERE dst <> src),
             |od AS (SELECT src, COUNT(*) outdeg FROM e GROUP BY 1),
             |r0 AS (SELECT doc_id id, ROUND(1.0 / nn.n, 12) r
             |  FROM d, nn),
             |c1 AS (
             |  SELECT e.dst, CAST(ROUND(r0.r / od.outdeg, 12)
             |    AS DECIMAL(28,12)) c
             |  FROM e JOIN r0 ON e.src = r0.id JOIN od USING (src)),
             |s1 AS (SELECT dst, SUM(c) s FROM c1 GROUP BY 1),
             |r1 AS (
             |  SELECT dn.doc_id id, ROUND(0.15 / dn.n + 0.85 *
             |    COALESCE(CAST(s1.s AS DOUBLE), 0.0), 12) r
             |  FROM (SELECT doc_id, n FROM d, nn) dn
             |  LEFT JOIN s1 ON dn.doc_id = s1.dst),
             |c2 AS (
             |  SELECT e.dst, CAST(ROUND(r1.r / od.outdeg, 12)
             |    AS DECIMAL(28,12)) c
             |  FROM e JOIN r1 ON e.src = r1.id JOIN od USING (src)),
             |s2 AS (SELECT dst, SUM(c) s FROM c2 GROUP BY 1),
             |r2 AS (
             |  SELECT dn.doc_id id, ROUND(0.15 / dn.n + 0.85 *
             |    COALESCE(CAST(s2.s AS DOUBLE), 0.0), 12) r
             |  FROM (SELECT doc_id, n FROM d, nn) dn
             |  LEFT JOIN s2 ON dn.doc_id = s2.dst),
             |c3 AS (
             |  SELECT e.dst, CAST(ROUND(r2.r / od.outdeg, 12)
             |    AS DECIMAL(28,12)) c
             |  FROM e JOIN r2 ON e.src = r2.id JOIN od USING (src)),
             |s3 AS (SELECT dst, SUM(c) s FROM c3 GROUP BY 1),
             |r3 AS (
             |  SELECT dn.doc_id id, ROUND(0.15 / dn.n + 0.85 *
             |    COALESCE(CAST(s3.s AS DOUBLE), 0.0), 12) r
             |  FROM (SELECT doc_id, n FROM d, nn) dn
             |  LEFT JOIN s3 ON dn.doc_id = s3.dst)
             |SELECT id AS doc_id, ROUND(r, 6) AS pagerank
             |FROM r3 ORDER BY doc_id""".stripMargin)),

    // Two-hop reach ([[Graph.twoHopReach]]) — |{v : dist ≤ 2}| per
    // node over the same synthetic link graph: one middle-vertex
    // equi-join + distinct on the (src, node) PAIR before counting
    // (path multiplicity dedups away — the state stays pair-set-sized).
    Q("g02_two_hop_reach",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id").as("id"))
        val n = docs.count()
        val edges = syntheticEdges(docs, n)
        Graph.twoHopReach(edges, docs)
          .select(col("id").as("doc_id"), col("reach2"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id FROM documents),
             |nn AS (SELECT COUNT(*) n FROM d),
             |e AS (
             |  SELECT src, dst FROM (
             |    SELECT doc_id src,
             |      (doc_id * (7 + j.k) + 13 * j.k) % nn.n AS dst
             |    FROM d, nn, (SELECT unnest(range(0, 3)) k) j)
             |  WHERE dst <> src),
             |two AS (
             |  SELECT a.src, b.dst FROM e a JOIN e b ON a.dst = b.src),
             |reach AS (
             |  SELECT src, COUNT(*) reach2 FROM (
             |    SELECT DISTINCT src, dst FROM (
             |      SELECT src, dst FROM e
             |      UNION ALL SELECT src, dst FROM two)
             |    WHERE src <> dst)
             |  GROUP BY src)
             |SELECT d.doc_id, CAST(COALESCE(r.reach2, 0) AS BIGINT)
             |  AS reach2
             |FROM d LEFT JOIN reach r ON d.doc_id = r.src
             |ORDER BY d.doc_id""".stripMargin)),

    // Personalized PageRank / TrustRank ([[Graph
    // .personalizedPageRank]]) — teleport concentrated on a trusted
    // seed set (the 16-block heads), 3 rounds at damping 0.85 from the
    // uniform-over-seeds vector: the crawl-side trust / spam-demotion
    // prior. Exact oracle: g01's unrolled-CTE chain with the teleport
    // term swapped for `CASE WHEN seed THEN 0.15/|S| ELSE 0 END` —
    // same 12dp-rounded decimal-summed contributions, so the
    // seed-personalized variant hash-matches to the bit too.
    Q("g04_trustrank",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id").as("id"))
        val n = docs.count()
        val edges = syntheticEdges(docs, n)
        val seeds = docs.filter(col("id") % 16 === 0)
        Graph.personalizedPageRank(docs, edges, seeds, iters = 3)
          .select(col("id").as("doc_id"), col("trustrank"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id FROM documents),
             |nn AS (SELECT COUNT(*) n FROM d),
             |ss AS (SELECT COUNT(*) s FROM d WHERE doc_id % 16 = 0),
             |e AS (
             |  SELECT src, dst FROM (
             |    SELECT doc_id src,
             |      (doc_id * (7 + j.k) + 13 * j.k) % nn.n AS dst
             |    FROM d, nn, (SELECT unnest(range(0, 3)) k) j)
             |  WHERE dst <> src),
             |od AS (SELECT src, COUNT(*) outdeg FROM e GROUP BY 1),
             |r0 AS (SELECT doc_id id,
             |    ROUND(CASE WHEN doc_id % 16 = 0 THEN 1.0 / ss.s
             |      ELSE 0.0 END, 12) r
             |  FROM d, ss),
             |c1 AS (
             |  SELECT e.dst, CAST(ROUND(r0.r / od.outdeg, 12)
             |    AS DECIMAL(28,12)) c
             |  FROM e JOIN r0 ON e.src = r0.id JOIN od USING (src)),
             |s1 AS (SELECT dst, SUM(c) s FROM c1 GROUP BY 1),
             |r1 AS (
             |  SELECT dn.doc_id id,
             |    ROUND(CASE WHEN dn.doc_id % 16 = 0 THEN 0.15 / dn.s
             |      ELSE 0.0 END + 0.85 *
             |      COALESCE(CAST(s1.s AS DOUBLE), 0.0), 12) r
             |  FROM (SELECT doc_id, s FROM d, ss) dn
             |  LEFT JOIN s1 ON dn.doc_id = s1.dst),
             |c2 AS (
             |  SELECT e.dst, CAST(ROUND(r1.r / od.outdeg, 12)
             |    AS DECIMAL(28,12)) c
             |  FROM e JOIN r1 ON e.src = r1.id JOIN od USING (src)),
             |s2 AS (SELECT dst, SUM(c) s FROM c2 GROUP BY 1),
             |r2 AS (
             |  SELECT dn.doc_id id,
             |    ROUND(CASE WHEN dn.doc_id % 16 = 0 THEN 0.15 / dn.s
             |      ELSE 0.0 END + 0.85 *
             |      COALESCE(CAST(s2.s AS DOUBLE), 0.0), 12) r
             |  FROM (SELECT doc_id, s FROM d, ss) dn
             |  LEFT JOIN s2 ON dn.doc_id = s2.dst),
             |c3 AS (
             |  SELECT e.dst, CAST(ROUND(r2.r / od.outdeg, 12)
             |    AS DECIMAL(28,12)) c
             |  FROM e JOIN r2 ON e.src = r2.id JOIN od USING (src)),
             |s3 AS (SELECT dst, SUM(c) s FROM c3 GROUP BY 1),
             |r3 AS (
             |  SELECT dn.doc_id id,
             |    ROUND(CASE WHEN dn.doc_id % 16 = 0 THEN 0.15 / dn.s
             |      ELSE 0.0 END + 0.85 *
             |      COALESCE(CAST(s3.s AS DOUBLE), 0.0), 12) r
             |  FROM (SELECT doc_id, s FROM d, ss) dn
             |  LEFT JOIN s3 ON dn.doc_id = s3.dst)
             |SELECT id AS doc_id, ROUND(r, 6) AS trustrank
             |FROM r3 ORDER BY doc_id""".stripMargin)),

    // PageRank over a graph WITH dangling nodes ([[Graph.pageRank]]'s
    // mass-redistribution path) — every node with doc_id % 5 = 0 emits
    // no edges, so ~20% of the rank mass goes dangling each round and
    // must re-enter uniformly (d·D/N) instead of leaking. The oracle
    // unrolls g01's CTE chain with one extra 1-row CTE per round: the
    // dangling mass as an EXACT decimal sum, then the same
    // IEEE-identical double update — so the redistribution arithmetic
    // hash-matches to the bit. g01's no-dangling graph stays
    // bit-identical (D = 0 exactly).
    Q("g05_pagerank_dangling",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id").as("id"))
        val n = docs.count()
        val edges =
          syntheticEdges(docs.filter(col("id") % 5 =!= 0), n)
        Graph.pageRank(docs, edges, iters = 3)
          .select(col("id").as("doc_id"), col("pagerank"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id FROM documents),
             |nn AS (SELECT COUNT(*) n FROM d),
             |e AS (
             |  SELECT src, dst FROM (
             |    SELECT doc_id src,
             |      (doc_id * (7 + j.k) + 13 * j.k) % nn.n AS dst
             |    FROM d, nn, (SELECT unnest(range(0, 3)) k) j
             |    WHERE doc_id % 5 <> 0)
             |  WHERE dst <> src),
             |od AS (SELECT src, COUNT(*) outdeg FROM e GROUP BY 1),
             |r0 AS (SELECT doc_id id, ROUND(1.0 / nn.n, 12) r
             |  FROM d, nn),
             |m1 AS (SELECT COALESCE(SUM(CAST(r AS DECIMAL(28,12))), 0) m
             |  FROM r0 WHERE id NOT IN (SELECT src FROM e)),
             |c1 AS (
             |  SELECT e.dst, CAST(ROUND(r0.r / od.outdeg, 12)
             |    AS DECIMAL(28,12)) c
             |  FROM e JOIN r0 ON e.src = r0.id JOIN od USING (src)),
             |s1 AS (SELECT dst, SUM(c) s FROM c1 GROUP BY 1),
             |r1 AS (
             |  SELECT dn.doc_id id, ROUND(0.15 / dn.n + 0.85 *
             |    (COALESCE(CAST(s1.s AS DOUBLE), 0.0) +
             |     ROUND(CAST(m1.m AS DOUBLE) / dn.n, 12)), 12) r
             |  FROM (SELECT doc_id, n FROM d, nn) dn
             |  LEFT JOIN s1 ON dn.doc_id = s1.dst, m1),
             |m2 AS (SELECT COALESCE(SUM(CAST(r AS DECIMAL(28,12))), 0) m
             |  FROM r1 WHERE id NOT IN (SELECT src FROM e)),
             |c2 AS (
             |  SELECT e.dst, CAST(ROUND(r1.r / od.outdeg, 12)
             |    AS DECIMAL(28,12)) c
             |  FROM e JOIN r1 ON e.src = r1.id JOIN od USING (src)),
             |s2 AS (SELECT dst, SUM(c) s FROM c2 GROUP BY 1),
             |r2 AS (
             |  SELECT dn.doc_id id, ROUND(0.15 / dn.n + 0.85 *
             |    (COALESCE(CAST(s2.s AS DOUBLE), 0.0) +
             |     ROUND(CAST(m2.m AS DOUBLE) / dn.n, 12)), 12) r
             |  FROM (SELECT doc_id, n FROM d, nn) dn
             |  LEFT JOIN s2 ON dn.doc_id = s2.dst, m2),
             |m3 AS (SELECT COALESCE(SUM(CAST(r AS DECIMAL(28,12))), 0) m
             |  FROM r2 WHERE id NOT IN (SELECT src FROM e)),
             |c3 AS (
             |  SELECT e.dst, CAST(ROUND(r2.r / od.outdeg, 12)
             |    AS DECIMAL(28,12)) c
             |  FROM e JOIN r2 ON e.src = r2.id JOIN od USING (src)),
             |s3 AS (SELECT dst, SUM(c) s FROM c3 GROUP BY 1),
             |r3 AS (
             |  SELECT dn.doc_id id, ROUND(0.15 / dn.n + 0.85 *
             |    (COALESCE(CAST(s3.s AS DOUBLE), 0.0) +
             |     ROUND(CAST(m3.m AS DOUBLE) / dn.n, 12)), 12) r
             |  FROM (SELECT doc_id, n FROM d, nn) dn
             |  LEFT JOIN s3 ON dn.doc_id = s3.dst, m3)
             |SELECT id AS doc_id, ROUND(r, 6) AS pagerank
             |FROM r3 ORDER BY doc_id""".stripMargin)),

    // INCREMENTAL link graph ([[LinkGraphStore]]) — the crawl-append
    // story: build persists the base edge partition (g05's dangling
    // graph, src % 5 ≠ 0) and 3 uniform-start rounds' 12dp vector;
    // append lands the remaining edges as partition b1 and WARM-STARTS
    // 3 more rounds from the persisted vector over the union (prior
    // partitions stream off parquet, never recomputed). Persisting the
    // INTERNAL 12dp vector makes the warm start exact, so the oracle
    // replays the whole history as ONE unrolled 6-round chain whose
    // edge set (and dangling term) switches after round 3 — an
    // incrementally-maintained iterative operator with a bit-exact
    // full-replay oracle. LinkGraphStoreSpec pins the production
    // claim the hash can't see: warm re-convergence beats a cold
    // restart round-for-round.
    Q("g06_pagerank_incremental",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id").as("id"))
        val n = docs.count()
        def linkEdges(pred: org.apache.spark.sql.Column) =
          syntheticEdges(docs.filter(pred), n)
        val store = LinkGraphStore("linkgraph_store")
        LinkGraphStore.build(s, docs,
          linkEdges(col("id") % 5 =!= 0), iters = 3, store)
        LinkGraphStore.appendAndRank(s, docs,
          linkEdges(col("id") % 5 === 0), iters = 3, store, "b1")
        LinkGraphStore.ranks(s, store, "b1")
          .select(col("id").as("doc_id"), col("pagerank"))
          .orderBy(col("doc_id"))
      },
      Some(G06Oracle)),

    // Link-graph TAKEDOWN with rank repair ([[LinkGraphStore
    // .deleteAndRank]]): g06's lifecycle, then hosts ≡ 3 (mod 7) are
    // removed — their edges in both directions and their checkpoint
    // rows leave partition-scoped — and the ranking re-converges over
    // the surviving graph, warm-started from the b1 checkpoint's
    // surviving slice (the contraction argument that justifies the
    // warm append justifies the warm removal). Oracle = the FULL
    // build → append → delete chain unrolled: rounds 1–3 base, 4–6
    // union, then 7–9 over the victim-filtered graph from the
    // filtered r6 — the repaired ranks must hash-match to the bit.
    Q("g10_pagerank_takedown",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id").as("id"))
        val n = docs.count()
        def linkEdges(pred: org.apache.spark.sql.Column) =
          syntheticEdges(docs.filter(pred), n)
        val store = LinkGraphStore("linkgraph_takedown")
        LinkGraphStore.build(s, docs,
          linkEdges(col("id") % 5 =!= 0), iters = 3, store)
        LinkGraphStore.appendAndRank(s, docs,
          linkEdges(col("id") % 5 === 0), iters = 3, store, "b1")
        LinkGraphStore.deleteAndRank(s,
          docs.filter(col("id") % 7 =!= 3),
          docs.filter(col("id") % 7 === 3),
          iters = 3, store, "t1", fromBatch = "b1")
        LinkGraphStore.ranks(s, store, "t1")
          .select(col("id").as("doc_id"), col("pagerank"))
          .orderBy(col("doc_id"))
      },
      Some(G10Oracle)),

    // Link-graph store MAINTENANCE ([[LinkGraphStore.compact]] +
    // [[LinkGraphStore.pruneCheckpoints]]): closed edge partitions
    // fold into `compacted` (ranking reads the union — identity is
    // irrelevant once closed) and dead rank checkpoints drop (a
    // checkpoint is only read by name as a warm-start base). Both run
    // MID-HISTORY, before a further append that warm-starts off the
    // surviving checkpoint and ranks over the folded edges — pure
    // storage reorganization, so the st15 three-epoch replay oracle
    // must not see it.
    Q("g11_linkgraph_compacted",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id").as("id"))
        val n = docs.count()
        def linkEdges(pred: org.apache.spark.sql.Column) =
          syntheticEdges(docs.filter(pred), n)
        val store = LinkGraphStore("linkgraph_cpt")
        LinkGraphStore.build(s, docs,
          linkEdges(col("id") % 5 =!= 0), iters = 3, store)
        LinkGraphStore.appendAndRank(s, docs,
          linkEdges(col("id") % 10 === 0), iters = 3, store, "b1")
        LinkGraphStore.compact(s, store, keep = Set.empty)
        LinkGraphStore.pruneCheckpoints(s, store, keep = Set("b1"))
        LinkGraphStore.appendAndRank(s, docs,
          linkEdges(col("id") % 10 === 5), iters = 3, store, "b2",
          fromBatch = "b1")
        LinkGraphStore.ranks(s, store, "b2")
          .select(col("id").as("doc_id"), col("pagerank"))
          .orderBy(col("doc_id"))
      },
      Some(St15Oracle)),

    // INCREMENTAL connected components on the persisted link graph
    // ([[LinkGraphStore.appendAndLabel]]): g03's one-shot labeling
    // gains the g06 treatment — labels are persisted state, and an
    // arriving edge batch re-converges FROM the stored assignment
    // (rounds bounded by the merge chain, not the graph diameter; the
    // fixed point is min-id per union component regardless of start,
    // so warm ≡ cold exactly). Base = within-block stars (g03's
    // graph); the append chains block hubs into 64-superblocks —
    // every new edge MERGES old components, the case the warm start
    // exists for. Oracle = the generic recursive-CTE closure over the
    // UNION edge set: append must equal cold recompute to the bit.
    Q("g12_components_incremental",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id").as("id"))
        val store = LinkGraphStore("cc_store")
        LinkGraphStore.buildEdges(s, blockStars(docs), store)
        LinkGraphStore.labelComponents(s, docs, store, "base")
        LinkGraphStore.appendAndLabel(s, hubChains(docs), store, "b1",
          fromBatch = "base")
        LinkGraphStore.components(s, store, "b1")
          .select(col("id").as("doc_id"), col("component"))
          .orderBy(col("doc_id"))
      },
      Some(componentsOracle(None))),

    // Component TAKEDOWN with split RESURRECTION ([[LinkGraphStore
    // .deleteAndLabel]]): g12's lifecycle, then the superblock hubs
    // (id ≡ 0 mod 64) are removed — their edges and label rows leave
    // partition-scoped, and ONLY the affected components relabel over
    // their surviving subgraph (unaffected components keep their b1
    // labels verbatim: none of their members or edges changed).
    // Removing a hub SPLITS its component: surviving 16-block stars
    // become components again and the victim's own orphaned leaves
    // become singletons — the oracle recomputes cold over the
    // survivor-filtered union graph, so the bounded repair must equal
    // full recompute to the bit.
    Q("g13_components_takedown",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id").as("id"))
        val store = LinkGraphStore("cc_takedown")
        LinkGraphStore.buildEdges(s, blockStars(docs), store)
        LinkGraphStore.labelComponents(s, docs, store, "base")
        LinkGraphStore.appendAndLabel(s, hubChains(docs), store, "b1",
          fromBatch = "base")
        LinkGraphStore.deleteAndLabel(s,
          docs.filter(col("id") % 64 === 0), store, "t1",
          fromBatch = "b1")
        LinkGraphStore.components(s, store, "t1")
          .select(col("id").as("doc_id"), col("component"))
          .orderBy(col("doc_id"))
      },
      Some(componentsOracle(Some(64)))),

    // Connected components ([[Graph.connectedComponents]]) — d05's
    // min-label propagation generalized to an arbitrary link graph.
    // The gate graph is block-STARS (docs link to their 16-block head
    // unless doc_id % 4 = 0): many components, diameter 2, plus
    // isolated singletons that must label themselves — while the
    // oracle stays the fully generic recursive-CTE closure, so the
    // OPERATOR is proven, not the graph's shape.
    Q("g03_connected_components",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id").as("id"))
        val edges = docs
          .filter(col("id") % 4 =!= 0)
          .select(col("id").as("src"),
            (col("id") - (col("id") % 16)).as("dst"))
          .filter(col("dst") =!= col("src"))
        Graph.connectedComponents(docs, edges)
          .select(col("id").as("doc_id"), col("component"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE d AS (SELECT doc_id FROM documents),
             |e0 AS (
             |  SELECT doc_id src, doc_id - (doc_id % 16) AS dst
             |  FROM d WHERE doc_id % 4 <> 0),
             |e AS (
             |  SELECT src a, dst b FROM e0 WHERE src <> dst
             |  UNION SELECT dst, src FROM e0 WHERE src <> dst),
             |reach(id, r) AS (
             |  SELECT doc_id, doc_id FROM d
             |  UNION
             |  SELECT reach.id, e.b FROM reach JOIN e ON reach.r = e.a)
             |SELECT id AS doc_id, MIN(r) AS component
             |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin))
  )

  private def harmonicGate: Seq[Q] = Seq(

    // Bounded-radius harmonic centrality ([[Graph
    // .harmonicCentrality2]]) — the published crawl ranking signal
    // (CommonCrawl ranks hosts by harmonic centrality) at the
    // radius-2 truncation that makes it computable without APSP:
    // H₂(v) = |in-dist-1| + ½·|in-dist-exactly-2| over the same
    // synthetic link graph, computed as (2n₁+n₂)/2 so every score is
    // an exactly-representable half-integer on both engines. One
    // middle-vertex equi-join + pair distinct + anti-join — the
    // twoHopReach shape in the prestige direction.
    Q("g07_harmonic_centrality",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id").as("id"))
        val n = docs.count()
        val edges = syntheticEdges(docs, n)
        Graph.harmonicCentrality2(docs, edges)
          .select(col("id").as("doc_id"), col("harmonic"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id FROM documents),
             |nn AS (SELECT COUNT(*) n FROM d),
             |e AS (
             |  SELECT src, dst FROM (
             |    SELECT doc_id src,
             |      (doc_id * (7 + j.k) + 13 * j.k) % nn.n AS dst
             |    FROM d, nn, (SELECT unnest(range(0, 3)) k) j)
             |  WHERE dst <> src),
             |in1 AS (
             |  SELECT DISTINCT dst AS id, src AS u FROM e
             |  WHERE src <> dst),
             |in2 AS (
             |  SELECT DISTINCT b.dst AS id, a.src AS u
             |  FROM e a JOIN e b ON a.dst = b.src
             |  WHERE a.src <> b.dst
             |  EXCEPT SELECT id, u FROM in1),
             |h1 AS (SELECT id, COUNT(*) n1 FROM in1 GROUP BY 1),
             |h2 AS (SELECT id, COUNT(*) n2 FROM in2 GROUP BY 1)
             |SELECT d.doc_id,
             |  CAST(COALESCE(h1.n1, 0) * 2 + COALESCE(h2.n2, 0)
             |    AS DOUBLE) / 2.0 AS harmonic
             |FROM d
             |LEFT JOIN h1 ON d.doc_id = h1.id
             |LEFT JOIN h2 ON d.doc_id = h2.id
             |ORDER BY d.doc_id""".stripMargin))
  )

  private def hitsGate: Seq[Q] = Seq(

    // HITS hubs & authorities ([[Graph.hits]]) — 2 synchronous rounds
    // of the in-edge/out-edge half-steps under L1 normalization (the
    // exact-decimal normalizer; see the operator doc for why not L2).
    // The oracle unrolls both rounds in template-generated CTEs: each
    // half-step is one join + one exact-decimal aggregate + a 1-row
    // total + the IEEE-identical 12dp-rounded double division.
    Q("g08_hits",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id").as("id"))
        val n = docs.count()
        val edges = syntheticEdges(docs, n)
        Graph.hits(docs, edges, iters = 2)
          .select(col("id").as("doc_id"), col("hub"), col("authority"))
          .orderBy(col("doc_id"))
      },
      Some(G08Oracle))
  )

  private def lpaGate: Seq[Q] = Seq(

    // Label-propagation communities ([[Graph.labelPropagation]]) — 2
    // synchronous rounds of most-frequent-neighbor-label with the
    // smallest-label tie-break (the reproducible variant; see the
    // operator doc for why not asynchronous/convergence-detected).
    // All-integer — no float discipline needed. Oracle unrolls both
    // rounds; its per-node argmax is a ROW_NUMBER window (DuckDB-only
    // — the Spark side is a hash aggregate over min(struct)).
    Q("g09_label_propagation",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id").as("id"))
        val n = docs.count()
        val edges = syntheticEdges(docs, n)
        Graph.labelPropagation(docs, edges, iters = 2)
          .select(col("id").as("doc_id"), col("community"))
          .orderBy(col("doc_id"))
      },
      Some(G09Oracle))
  )

  private def communityStoreGates: Seq[Q] = Seq(

    // INCREMENTAL label-propagation communities on the persisted
    // link graph ([[LinkGraphStore.appendAndPropagate]]) — the g12
    // treatment for g09: the community assignment is checkpointed
    // state, and an arriving edge batch runs 2 MORE warm rounds from
    // it over the union graph. LPA's fixed point is start-dependent,
    // so the contract is the warm HISTORY itself (2 cold base rounds,
    // then 2 warm union rounds), which the oracle unrolls exactly —
    // [[lpaRoundOver]] parameterized by edge view and start, the g06
    // warm-PageRank oracle shape. Base = the g09 synthetic graph;
    // append = g03's block stars, which wire hub-centered stars into
    // the mix and flip block members toward their hub's label.
    Q("g14_communities_incremental",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id").as("id"))
        val n = docs.count()
        val store = LinkGraphStore("lpa_store")
        LinkGraphStore.buildEdges(s, syntheticEdges(docs, n), store)
        LinkGraphStore.propagateCommunities(s, docs, store, "base",
          iters = 2)
        LinkGraphStore.appendAndPropagate(s, blockStars(docs), store,
          "b1", fromBatch = "base", iters = 2)
        LinkGraphStore.communities(s, store, "b1")
          .select(col("id").as("doc_id"), col("community"))
          .orderBy(col("doc_id"))
      },
      Some(G14Oracle)),

    // Community TAKEDOWN with warm repair ([[LinkGraphStore
    // .deleteAndPropagate]]): g14's lifecycle, a checkpoint prune
    // (only b1 survives — the verb the growth bound rides on), then
    // the block heads (id ≡ 0 mod 16) are removed. Majority-vote
    // communities are NOT edge-closed, so there is no affected-set
    // shortcut (contrast g13): the repair is the g10 shape — 2 warm
    // rounds re-mixing the SURVIVING labels over the surviving
    // graph, never a cold identity restart. The oracle extends the
    // g14 chain: survivor-filtered l4 start, survivor-filtered edge
    // view, 2 more unrolled rounds.
    Q("g15_communities_takedown",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id").as("id"))
        val n = docs.count()
        val store = LinkGraphStore("lpa_takedown")
        LinkGraphStore.buildEdges(s, syntheticEdges(docs, n), store)
        LinkGraphStore.propagateCommunities(s, docs, store, "base",
          iters = 2)
        LinkGraphStore.appendAndPropagate(s, blockStars(docs), store,
          "b1", fromBatch = "base", iters = 2)
        LinkGraphStore.pruneCommunityCheckpoints(s, store,
          keep = Set("b1"))
        LinkGraphStore.deleteAndPropagate(s,
          docs.filter(col("id") % 16 === 0), store, "t1",
          fromBatch = "b1", iters = 2)
        LinkGraphStore.communities(s, store, "t1")
          .select(col("id").as("doc_id"), col("community"))
          .orderBy(col("doc_id"))
      },
      Some(G15Oracle))
  )

  /** Shared CTE prefix for the community-store oracles: the g09
    * synthetic graph as the base batch, g03's block stars as the
    * append, undirected-distinct views of the base (eu1) and union
    * (eu2) edge sets, identity start, then the warm history — 2
    * rounds over eu1, 2 over eu2. */
  private val G14Prefix: String =
    s"""WITH d AS (SELECT doc_id FROM documents),
       |nn AS (SELECT COUNT(*) n FROM d),
       |e_base AS (
       |  SELECT src, dst FROM (
       |    SELECT doc_id src,
       |      (doc_id * (7 + j.k) + 13 * j.k) % nn.n AS dst
       |    FROM d, nn, (SELECT unnest(range(0, 3)) k) j)
       |  WHERE dst <> src),
       |e_app AS (
       |  SELECT doc_id src, doc_id - (doc_id % 16) AS dst
       |  FROM d WHERE doc_id % 4 <> 0),
       |eu1 AS (
       |  SELECT a, b FROM (
       |    SELECT src a, dst b FROM e_base
       |    UNION SELECT dst a, src b FROM e_base)
       |  WHERE a <> b),
       |ea AS (SELECT src, dst FROM e_base
       |  UNION SELECT src, dst FROM e_app),
       |eu2 AS (
       |  SELECT a, b FROM (
       |    SELECT src a, dst b FROM ea
       |    UNION SELECT dst a, src b FROM ea)
       |  WHERE a <> b),
       |l0 AS (SELECT doc_id id, doc_id lbl FROM d),
       |${lpaRoundOver(1, "eu1", "l0")},
       |${lpaRoundOver(2, "eu1", "l1")},
       |${lpaRoundOver(3, "eu2", "l2")},
       |${lpaRoundOver(4, "eu2", "l3")}""".stripMargin

  private val G14Oracle: String =
    s"""$G14Prefix
       |SELECT id AS doc_id, lbl AS community
       |FROM l4 ORDER BY doc_id""".stripMargin

  /** st19's oracle: the g14 warm chain with the append split into
    * two streamed micro-batches — 2 cold rounds over the base graph,
    * then 2 warm rounds after EACH chunk lands (the edge view grows
    * at rounds 3 and 5), so streamed ingest ≡ the same chain run as
    * batch appends, to the bit. */
  private[graft] val StreamCommunitiesOracle: String =
    s"""WITH d AS (SELECT doc_id FROM documents),
       |nn AS (SELECT COUNT(*) n FROM d),
       |e_base AS (
       |  SELECT src, dst FROM (
       |    SELECT doc_id src,
       |      (doc_id * (7 + j.k) + 13 * j.k) % nn.n AS dst
       |    FROM d, nn, (SELECT unnest(range(0, 3)) k) j)
       |  WHERE dst <> src),
       |e_app AS (
       |  SELECT doc_id src, doc_id - (doc_id % 16) AS dst
       |  FROM d WHERE doc_id % 4 <> 0),
       |e_a0 AS (SELECT src, dst FROM e_app WHERE src % 2 = 1),
       |eu1 AS (
       |  SELECT a, b FROM (
       |    SELECT src a, dst b FROM e_base
       |    UNION SELECT dst a, src b FROM e_base)
       |  WHERE a <> b),
       |ea1 AS (SELECT src, dst FROM e_base
       |  UNION SELECT src, dst FROM e_a0),
       |eu_s0 AS (
       |  SELECT a, b FROM (
       |    SELECT src a, dst b FROM ea1
       |    UNION SELECT dst a, src b FROM ea1)
       |  WHERE a <> b),
       |ea2 AS (SELECT src, dst FROM e_base
       |  UNION SELECT src, dst FROM e_app),
       |eu_s1 AS (
       |  SELECT a, b FROM (
       |    SELECT src a, dst b FROM ea2
       |    UNION SELECT dst a, src b FROM ea2)
       |  WHERE a <> b),
       |l0 AS (SELECT doc_id id, doc_id lbl FROM d),
       |${lpaRoundOver(1, "eu1", "l0")},
       |${lpaRoundOver(2, "eu1", "l1")},
       |${lpaRoundOver(3, "eu_s0", "l2")},
       |${lpaRoundOver(4, "eu_s0", "l3")},
       |${lpaRoundOver(5, "eu_s1", "l4")},
       |${lpaRoundOver(6, "eu_s1", "l5")}
       |SELECT id AS doc_id, lbl AS community
       |FROM l6 ORDER BY doc_id""".stripMargin

  private val G15Oracle: String =
    s"""$G14Prefix,
       |l4s AS (SELECT id, lbl FROM l4 WHERE id % 16 <> 0),
       |eu3 AS (SELECT a, b FROM eu2
       |  WHERE a % 16 <> 0 AND b % 16 <> 0),
       |${lpaRoundOver(5, "eu3", "l4s")},
       |${lpaRoundOver(6, "eu3", "l5")}
       |SELECT id AS doc_id, lbl AS community
       |FROM l6 ORDER BY doc_id""".stripMargin

  /** One unrolled synchronous-LPA round for the g09 oracle: neighbor
    * label messages over the undirected edge view, per-(node, label)
    * counts, argmax by (cnt DESC, label), keep-own on no-neighbor. */
  private def lpaRound(i: Int): String =
    lpaRoundOver(i, "eu", s"l${i - 1}")

  /** [[lpaRound]] with the undirected edge view AND the previous
    * labeling as parameters — the g14/g15 warm-store rounds run over
    * a GROWING (then shrinking) edge union from a checkpointed start,
    * exactly like the g06/g10 PageRank oracle's [[prRoundOver]]. */
  private def lpaRoundOver(i: Int, eu: String, prev: String): String =
    s"""m$i AS (
       |  SELECT e.b id, l.lbl FROM $eu e
       |  JOIN $prev l ON e.a = l.id),
       |f$i AS (SELECT id, lbl, COUNT(*) cnt FROM m$i GROUP BY 1, 2),
       |p$i AS (
       |  SELECT id, lbl FROM (
       |    SELECT id, lbl, ROW_NUMBER() OVER (
       |      PARTITION BY id ORDER BY cnt DESC, lbl) rn
       |    FROM f$i) WHERE rn = 1),
       |l$i AS (
       |  SELECT l.id, COALESCE(p.lbl, l.lbl) lbl
       |  FROM $prev l LEFT JOIN p$i p USING (id))""".stripMargin

  private val G09Oracle: String =
    s"""WITH d AS (SELECT doc_id FROM documents),
       |nn AS (SELECT COUNT(*) n FROM d),
       |${edgeCte("e", "TRUE")},
       |eu AS (
       |  SELECT a, b FROM (
       |    SELECT src a, dst b FROM e
       |    UNION SELECT dst a, src b FROM e)
       |  WHERE a <> b),
       |l0 AS (SELECT doc_id id, doc_id lbl FROM d),
       |${(1 to 2).map(lpaRound).mkString(",\n")}
       |SELECT id AS doc_id, lbl AS community
       |FROM l2 ORDER BY doc_id""".stripMargin

  /** One unrolled HITS round for the g08 oracle: authority half-step
    * (in-edge join + exact-decimal sum + L1-normalizing 12dp double
    * division), then the hub half-step over out-edges — exactly the
    * operator's arithmetic. */
  private def hitsRound(i: Int): String =
    s"""ar$i AS (
       |  SELECT e.dst, SUM(CAST(h.h AS DECIMAL(28,12))) s
       |  FROM e JOIN h${i - 1} h ON e.src = h.id GROUP BY 1),
       |at$i AS (SELECT SUM(s) tot FROM ar$i),
       |a$i AS (
       |  SELECT d.doc_id id,
       |    ROUND(COALESCE(CAST(ar$i.s AS DOUBLE), 0.0) /
       |      CAST(at$i.tot AS DOUBLE), 12) a
       |  FROM d LEFT JOIN ar$i ON d.doc_id = ar$i.dst, at$i),
       |hr$i AS (
       |  SELECT e.src, SUM(CAST(a.a AS DECIMAL(28,12))) s
       |  FROM e JOIN a$i a ON e.dst = a.id GROUP BY 1),
       |ht$i AS (SELECT SUM(s) tot FROM hr$i),
       |h$i AS (
       |  SELECT d.doc_id id,
       |    ROUND(COALESCE(CAST(hr$i.s AS DOUBLE), 0.0) /
       |      CAST(ht$i.tot AS DOUBLE), 12) h
       |  FROM d LEFT JOIN hr$i ON d.doc_id = hr$i.src, ht$i)""".stripMargin

  private val G08Oracle: String =
    s"""WITH d AS (SELECT doc_id FROM documents),
       |nn AS (SELECT COUNT(*) n FROM d),
       |e AS (
       |  SELECT src, dst FROM (
       |    SELECT doc_id src,
       |      (doc_id * (7 + j.k) + 13 * j.k) % nn.n AS dst
       |    FROM d, nn, (SELECT unnest(range(0, 3)) k) j)
       |  WHERE dst <> src),
       |h0 AS (SELECT doc_id id, ROUND(1.0 / nn.n, 12) h FROM d, nn),
       |${(1 to 2).map(hitsRound).mkString(",\n")}
       |SELECT h2.id AS doc_id, ROUND(h2.h, 6) AS hub,
       |  ROUND(a2.a, 6) AS authority
       |FROM h2 JOIN a2 USING (id) ORDER BY doc_id""".stripMargin

  /** One unrolled PageRank round for the g06 oracle: the g05 round
    * template (exact-decimal dangling mass + contributions, IEEE-
    * identical double update) parameterized by the edge set — rounds
    * 1–3 run over the base partition, 4–6 over the full union, exactly
    * as the warm-started store run does. */
  private def prRound(i: Int, e: String, od: String): String =
    prRoundOver(i, e, od, "d", "nn", s"r${i - 1}")

  /** [[prRound]] with the node universe AND the previous vector as
    * parameters — the g10 takedown rounds run over the SURVIVING node
    * set from a filtered checkpoint, not the build-time universe. */
  private def prRoundOver(i: Int, e: String, od: String, d: String,
      nn: String, prev: String): String =
    s"""m$i AS (SELECT COALESCE(SUM(CAST(r AS DECIMAL(28,12))), 0) m
       |  FROM $prev WHERE id NOT IN (SELECT src FROM $e)),
       |c$i AS (
       |  SELECT e.dst, CAST(ROUND(rp.r / od.outdeg, 12)
       |    AS DECIMAL(28,12)) c
       |  FROM $e e JOIN $prev rp ON e.src = rp.id
       |  JOIN $od od USING (src)),
       |s$i AS (SELECT dst, SUM(c) s FROM c$i GROUP BY 1),
       |r$i AS (
       |  SELECT dn.doc_id id, ROUND(0.15 / dn.n + 0.85 *
       |    (COALESCE(CAST(s$i.s AS DOUBLE), 0.0) +
       |     ROUND(CAST(m$i.m AS DOUBLE) / dn.n, 12)), 12) r
       |  FROM (SELECT doc_id, n FROM $d, $nn) dn
       |  LEFT JOIN s$i ON dn.doc_id = s$i.dst, m$i)""".stripMargin

  private val G06Oracle: String = {
    val baseRounds = (1 to 3).map(prRound(_, "e_base", "od_base"))
    val fullRounds = (4 to 6).map(prRound(_, "e_all", "od_all"))
    s"""WITH d AS (SELECT doc_id FROM documents),
       |nn AS (SELECT COUNT(*) n FROM d),
       |e_base AS (
       |  SELECT src, dst FROM (
       |    SELECT doc_id src,
       |      (doc_id * (7 + j.k) + 13 * j.k) % nn.n AS dst
       |    FROM d, nn, (SELECT unnest(range(0, 3)) k) j
       |    WHERE doc_id % 5 <> 0)
       |  WHERE dst <> src),
       |e_all AS (
       |  SELECT src, dst FROM (
       |    SELECT doc_id src,
       |      (doc_id * (7 + j.k) + 13 * j.k) % nn.n AS dst
       |    FROM d, nn, (SELECT unnest(range(0, 3)) k) j)
       |  WHERE dst <> src),
       |od_base AS (SELECT src, COUNT(*) outdeg FROM e_base GROUP BY 1),
       |od_all AS (SELECT src, COUNT(*) outdeg FROM e_all GROUP BY 1),
       |r0 AS (SELECT doc_id id, ROUND(1.0 / nn.n, 12) r FROM d, nn),
       |${(baseRounds ++ fullRounds).mkString(",\n")}
       |SELECT id AS doc_id, ROUND(r, 6) AS pagerank
       |FROM r6 ORDER BY doc_id""".stripMargin
  }

  /** The g10 oracle: the g06 replay (rounds 1–6) extended with the
    * takedown — survivors' node universe `d_s`/`nn_s`, the
    * victim-filtered edge set, and rounds 7–9 warm-started from r6
    * restricted to the survivors, exactly the chain the store runs. */
  private lazy val G10Oracle: String = {
    val baseRounds = (1 to 3).map(prRound(_, "e_base", "od_base"))
    val fullRounds = (4 to 6).map(prRound(_, "e_all", "od_all"))
    val delRounds = (7 to 9).map(i => prRoundOver(i, "e_del", "od_del",
      "d_s", "nn_s", if (i == 7) "r6s" else s"r${i - 1}"))
    s"""WITH d AS (SELECT doc_id FROM documents),
       |nn AS (SELECT COUNT(*) n FROM d),
       |e_base AS (
       |  SELECT src, dst FROM (
       |    SELECT doc_id src,
       |      (doc_id * (7 + j.k) + 13 * j.k) % nn.n AS dst
       |    FROM d, nn, (SELECT unnest(range(0, 3)) k) j
       |    WHERE doc_id % 5 <> 0)
       |  WHERE dst <> src),
       |e_all AS (
       |  SELECT src, dst FROM (
       |    SELECT doc_id src,
       |      (doc_id * (7 + j.k) + 13 * j.k) % nn.n AS dst
       |    FROM d, nn, (SELECT unnest(range(0, 3)) k) j)
       |  WHERE dst <> src),
       |d_s AS (SELECT doc_id FROM d WHERE doc_id % 7 <> 3),
       |nn_s AS (SELECT COUNT(*) n FROM d_s),
       |e_del AS (SELECT src, dst FROM e_all
       |  WHERE src % 7 <> 3 AND dst % 7 <> 3),
       |od_base AS (SELECT src, COUNT(*) outdeg FROM e_base GROUP BY 1),
       |od_all AS (SELECT src, COUNT(*) outdeg FROM e_all GROUP BY 1),
       |od_del AS (SELECT src, COUNT(*) outdeg FROM e_del GROUP BY 1),
       |r0 AS (SELECT doc_id id, ROUND(1.0 / nn.n, 12) r FROM d, nn),
       |${(baseRounds ++ fullRounds).mkString(",\n")},
       |r6s AS (SELECT id, r FROM r6 WHERE id % 7 <> 3),
       |${delRounds.mkString(",\n")}
       |SELECT id AS doc_id, ROUND(r, 6) AS pagerank
       |FROM r9 ORDER BY doc_id""".stripMargin
  }

  /** The synthetic 3-outlink edge CTE restricted to `pred` — shared by
    * the multi-epoch replay oracles. */
  private def edgeCte(name: String, pred: String): String =
    s"""$name AS (
       |  SELECT src, dst FROM (
       |    SELECT doc_id src,
       |      (doc_id * (7 + j.k) + 13 * j.k) % nn.n AS dst
       |    FROM d, nn, (SELECT unnest(range(0, 3)) k) j
       |    WHERE $pred)
       |  WHERE dst <> src)""".stripMargin

  /** st15's oracle: the g06 full-history replay generalized to TWO
    * streamed appends — rounds 1–3 over the base partition
    * (src % 5 ≠ 0), 4–6 after micro-batch 0 lands the src % 10 = 0
    * edges, 7–9 after micro-batch 1 completes the graph. Exactly the
    * arithmetic the warm-started store runs, so the streamed ingest
    * hash-matches a batch replay to the bit. */
  private[graft] lazy val St15Oracle: String = {
    val rounds = (1 to 3).map(prRound(_, "e_base", "od_base")) ++
      (4 to 6).map(prRound(_, "e_b1", "od_b1")) ++
      (7 to 9).map(prRound(_, "e_all", "od_all"))
    s"""WITH d AS (SELECT doc_id FROM documents),
       |nn AS (SELECT COUNT(*) n FROM d),
       |${edgeCte("e_base", "doc_id % 5 <> 0")},
       |${edgeCte("e_b1", "doc_id % 5 <> 0 OR doc_id % 10 = 0")},
       |${edgeCte("e_all", "TRUE")},
       |od_base AS (SELECT src, COUNT(*) outdeg FROM e_base GROUP BY 1),
       |od_b1 AS (SELECT src, COUNT(*) outdeg FROM e_b1 GROUP BY 1),
       |od_all AS (SELECT src, COUNT(*) outdeg FROM e_all GROUP BY 1),
       |r0 AS (SELECT doc_id id, ROUND(1.0 / nn.n, 12) r FROM d, nn),
       |${rounds.mkString(",\n")}
       |SELECT id AS doc_id, ROUND(r, 6) AS pagerank
       |FROM r9 ORDER BY doc_id""".stripMargin
  }
}
