package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Hashing

/** Similarity search over an embedding column (array<float>).
  *
  * Scale design: brute force is the exact baseline — a broadcast
  * nested-loop of queries × corpus, linear in corpus size per query and
  * embarrassingly parallel (each partition scores its rows; no shuffle
  * until the per-query top-k). The IVF variant is the 100 TB path: corpus
  * is bucketed by nearest centroid once (one shuffle, reusable as a
  * partitioned table), and each query probes only `nprobe` buckets —
  * turning full scans into partition-pruned reads.
  *
  * Per-pair arithmetic: norms are computed once per vector (not per pair)
  * and the dot product is a native single-pass expression
  * ([[graft.functions.DotProduct]]); the value `dot(a,b)/(‖a‖·‖b‖)` is
  * bit-identical to the naive per-pair formulation because every float op
  * and its order is unchanged — only redundant recomputation is removed.
  */
object Similarity {

  /** Cosine similarity of two array<double> columns. */
  def cosine(a: Column, b: Column): Column =
    Hashing.dotProduct(a, b) /
      (sqrt(Hashing.dotProduct(a, a)) * sqrt(Hashing.dotProduct(b, b)))

  /** (vid, v, nrm) with the L2 norm materialized once per vector. */
  private def normalized(emb: DataFrame, idCol: String, vecCol: String) = {
    val v = col(vecCol).cast("array<double>")
    emb.select(col(idCol).as("vid"), v.as("v"))
      .withColumn("nrm", sqrt(Hashing.dotProduct(col("v"), col("v"))))
  }

  private def sim(av: Column, an: Column, bv: Column, bn: Column): Column =
    round(Hashing.dotProduct(av, bv) / (an * bn), 6)

  /** Exact top-k neighbors for each query vector (queries broadcast). Ties
    * on rounded similarity break by neighbor id — fully deterministic. */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val corpus = normalized(emb, idCol, vecCol)
    val q = normalized(queries, idCol, vecCol)
      .select(col("vid").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = corpus.join(broadcast(q), col("vid") =!= col("qid"))
      .select(col("qid"), col("vid").as("nid"),
        sim(col("qv"), col("qn"), col("v"), col("nrm")).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** All corpus pairs with cosine ≥ threshold (embedding near-dup). The
    * threshold is applied to the rounded similarity so boundary behavior
    * is reproducible.
    *
    * Identical vectors are collapsed to one representative before the
    * O(n²) stage (same rationale as `Dedup.jaccardPairs`: duplicate
    * clusters of size m otherwise cost m² pair evaluations for pairs
    * that are cosine-1 by construction); representative pairs are then
    * expanded back through cluster membership — output identical, since
    * cosine is a function of the vector values alone. */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val groups = normalized(emb, idCol, vecCol)
      .groupBy(col("v"), col("nrm"))
      .agg(min(col("vid")).as("vid"),
        sort_array(collect_list(col("vid"))).as("members"))
      .persist()
    val a = groups.select(col("vid").as("id_a"), col("v").as("va"),
      col("nrm").as("na"))
    val b = groups.select(col("vid").as("id_b"), col("v").as("vb"),
      col("nrm").as("nb"))
    // One combined join condition with the cheap id comparison FIRST:
    // Catalyst pushes a post-join similarity filter into the nested-loop
    // join condition ANDed ahead of the id predicate, which evaluates the
    // dot product for all n² ordered pairs instead of n²/2 (verified in
    // the physical plan). Conjunct order in an explicit condition is
    // preserved and BNLJ short-circuits left-to-right.
    val repPairs = a.join(b,
        col("id_a") < col("id_b") &&
          sim(col("va"), col("na"), col("vb"), col("nb")) >= threshold)
      .select(col("id_a"), col("id_b"),
        sim(col("va"), col("na"), col("vb"), col("nb")).as("sim"))
    val memA = groups.select(col("vid").as("id_a"), col("members").as("ma"))
    val memB = groups.select(col("vid").as("id_b"), col("members").as("mb"))
    val cross = repPairs
      .join(memA, "id_a").join(memB, "id_b")
      .select(explode(col("ma")).as("a"), col("mb"), col("sim"))
      .select(col("a"), explode(col("mb")).as("b"), col("sim"))
      .select(least(col("a"), col("b")).as("id_a"),
        greatest(col("a"), col("b")).as("id_b"), col("sim"))
    val within = groups.filter(size(col("members")) > 1)
      .select(col("members"))
      .select(explode(col("members")).as("a"), col("members"))
      .select(col("a"), explode(col("members")).as("b"))
      .filter(col("a") < col("b"))
      .select(col("a").as("id_a"), col("b").as("id_b"),
        lit(1.0).as("sim"))
    cross.union(within)
  }

  /** LSH-bucketed ANN: random-hyperplane signatures
    * ([[graft.functions.HyperplaneSig]]) banded into (band, bucket) keys —
    * candidate generation is an equi-join on those keys (one shuffle, AQE
    * handles hot buckets), then exact cosine ranks the candidates. Unlike
    * IVF there is no training/centroid pass, so this is the variant that
    * drops into a streaming or append-only corpus at scale: signatures are
    * row-local and the bucket index is just a partitioned table.
    */
  def lshTopK(emb: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, bits: Int = 16, bands: Int = 4): DataFrame = {
    require(bits % bands == 0, "bands must divide bits")
    val r = bits / bands
    val mask = (1L << r) - 1
    def banded(df: DataFrame): DataFrame = {
      val bandCols = (0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * r).bitwiseAND(lit(mask)).as("bucket"))
      }
      df.withColumn("sig", Hashing.hyperplaneSig(col("v"), bits))
        .select(col("vid"), explode(array(bandCols: _*)).as("bb"))
        .select(col("vid"), col("bb.band").as("band"),
          col("bb.bucket").as("bucket"))
    }
    val corpus = normalized(emb, idCol, vecCol)
    val q = normalized(queries, idCol, vecCol)
    val candidates = banded(q).withColumnRenamed("vid", "qid")
      .join(banded(corpus), Seq("band", "bucket"))
      .filter(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid").as("nid"))
      .distinct()
    val scored = candidates
      .join(broadcast(q.select(col("vid").as("qid"), col("v").as("qv"),
        col("nrm").as("qn"))), "qid")
      .join(corpus.select(col("vid").as("nid"), col("v"), col("nrm")), "nid")
      .select(col("qid"), col("nid"),
        sim(col("qv"), col("qn"), col("v"), col("nrm")).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rn"))
  }

  /** IVF-style approximate top-k: corpus assigned to its nearest centroid
    * (centroids = the first `nlist` vectors by id — deterministic seeding;
    * k-means refinement would slot in here), queries probe the `nprobe`
    * nearest centroid buckets only.
    */
  def ivfTopK(emb: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val corpus = normalized(emb, idCol, vecCol)
    val centroids = corpus.orderBy(col("vid")).limit(nlist)
      .select(col("vid").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    def nearestBuckets(points: DataFrame, n: Int): DataFrame = {
      val w = Window.partitionBy(col("vid"))
        .orderBy(col("csim").desc, col("cid"))
      points.crossJoin(broadcast(centroids))
        .select(col("vid"), col("v"), col("nrm"), col("cid"),
          sim(col("v"), col("nrm"), col("cv"), col("cn")).as("csim"))
        .withColumn("crn", row_number().over(w))
        .filter(col("crn") <= n)
        .drop("csim", "crn")
    }
    val bucketed = nearestBuckets(corpus, 1) // corpus: single assignment
    val probes = nearestBuckets(normalized(queries, idCol, vecCol), nprobe)
      .select(col("vid").as("qid"), col("v").as("qv"),
        col("nrm").as("qn"), col("cid"))
    val scored = probes.join(bucketed, Seq("cid"))
      .filter(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid").as("nid"),
        sim(col("qv"), col("qn"), col("v"), col("nrm")).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }
}
