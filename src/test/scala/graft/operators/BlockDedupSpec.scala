package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Edge cases of the C4-style block dedup and the soft-dedup weighting
  * that the d28/d29 oracles exercise only as far as the synthetic
  * corpus does: empty documents, a document that dedups away entirely,
  * partial tail blocks, and within-document repeats.
  */
class BlockDedupSpec extends SparkSuite {

  import spark.implicits._

  private def run(docs: Seq[(Long, String)], blockWords: Int = 2) =
    Dedup.blockDedup(docs.toDF("doc_id", "text"), "doc_id", "text",
        blockWords)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("blockDedup: canonical first occurrence survives, every later " +
      "occurrence is excised, docs reassemble in block order") {
    val got = run(Seq(
      (1L, "a b c d"),   // blocks: "a b", "c d"
      (2L, "c d e f"),   // "c d" dies (1 owns it), "e f" survives
      (3L, "a b c d"))) // both blocks die
    assert(got(1L) == ((2L, 2L, "a b c d")))
    assert(got(2L) == ((2L, 1L, "e f")))
    assert(got(3L) == ((2L, 0L, "")), "full duplicate must empty out")
  }

  test("blockDedup: within-document repeat keeps only the first " +
      "position — canonical order is (doc_id, block_id)") {
    val got = run(Seq((1L, "x y x y z")))
    // blocks: "x y", "x y", "z" — the second "x y" is excised.
    assert(got(1L) == ((3L, 2L, "x y z")))
  }

  test("blockDedup: empty and whitespace-only docs pass through with " +
      "zero blocks; partial tail blocks are real blocks") {
    val got = run(Seq((1L, ""), (2L, "   "), (3L, "p q r")))
    assert(got(1L) == ((0L, 0L, "")))
    assert(got(2L) == ((0L, 0L, "")))
    assert(got(3L) == ((2L, 2L, "p q r")), "tail block 'r' must survive")
  }

  test("blockDedup: a tail block does not collide with a full block " +
      "of the same prefix") {
    // "p q" (full) vs doc 2's tail "p" — different texts, both live.
    val got = run(Seq((1L, "p q"), (2L, "z w p")))
    assert(got(1L) == ((1L, 1L, "p q")))
    assert(got(2L) == ((2L, 2L, "z w p")))
  }

  test("softWeights: weight is 1/cluster-size and total weight equals " +
      "the distinct-text count") {
    val docs = Seq((1L, "same text"), (2L, "same text"),
      (3L, "same  text"), // whitespace-normalizes into the cluster
      (4L, "other"))
    val got = Dedup.softWeights(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(3L, 3L, 3L, 1L))
    assert(got.take(3).forall(t => math.abs(t._3 - 0.333333) < 1e-9))
    assert(got.last._3 == 1.0)
    val total = got.map(_._3).sum
    assert(math.abs(total - 2.0) < 1e-5,
      s"total weight $total must equal the distinct-text count 2")
  }

  test("BlockStore.delete: a block canonically owned by the victim " +
      "resurrects at its next owner; orphaned fps leave so re-arriving " +
      "content is novel again; the delete is idempotent") {
    val store = BlockStore("block_del_spec")
    // blockWords = 2. Doc 1 owns "a b" and "c d"; docs 2 and 3 repeat
    // "a b"; doc 1 alone holds "c d" (orphan-on-delete); doc 2 also
    // has novel "e f".
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b e f"),
      (3L, "a b")).toDF("doc_id", "text")
    BlockStore.build(spark, docs.filter(col("doc_id") <= 2),
      "doc_id", "text", 2, store)
    BlockStore.append(spark, docs.filter(col("doc_id") > 2),
      "doc_id", "text", 2, store, "b1")
    BlockStore.delete(spark, store,
      Seq(1L).toDF("doc_id"))
    def state() = BlockStore.deduped(spark, store).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val got = state()
    assert(got.keySet == Set(2L, 3L), "victim row must leave")
    assert(got(2L) == ((2L, 2L, "a b e f")),
      s"'a b' must resurrect at doc 2, its next owner: ${got(2L)}")
    assert(got(3L) == ((1L, 0L, "")),
      "doc 3 stays excised — doc 2 now owns 'a b'")
    // Orphaned fp ("c d") left the introduced set: a re-submission is
    // novel again and keeps its block.
    BlockStore.append(spark, Seq((4L, "c d")).toDF("doc_id", "text"),
      "doc_id", "text", 2, store, "b2")
    assert(state()(4L) == ((1L, 1L, "c d")),
      "re-arriving orphaned block must be novel again")
    // Idempotent: replaying the takedown changes nothing.
    val before = state()
    BlockStore.delete(spark, store, Seq(1L).toDF("doc_id"))
    assert(state() == before, "delete replay must be a no-op")
    BlockStore.reset(spark, store)
  }

  test("BlockStore.delete: equals a from-scratch build over a corpus " +
      "that never held the victims (planted multi-batch resurrection)") {
    val store = BlockStore("block_del_spec2")
    val docs = Seq(
      (1L, "k l m n"),      // owns "k l", "m n"
      (2L, "k l p q"),      // repeats "k l"
      (3L, "m n p q"),      // repeats both survivors' blocks
      (4L, "k l m n p q")). // repeats everything
      toDF("doc_id", "text")
    BlockStore.build(spark, docs.filter(col("doc_id") <= 2),
      "doc_id", "text", 2, store)
    BlockStore.append(spark, docs.filter(col("doc_id") > 2),
      "doc_id", "text", 2, store, "b1")
    BlockStore.delete(spark, store, Seq(1L, 2L).toDF("doc_id"))
    val got = BlockStore.deduped(spark, store)
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val oneShot = Dedup.blockDedup(docs.filter(col("doc_id") > 2),
        "doc_id", "text", 2)
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(got.toSeq == oneShot.toSeq,
      s"post-delete store ${got.toSeq} != one-shot ${oneShot.toSeq}")
    BlockStore.reset(spark, store)
  }

  test("softWeights: NULL text weights into the empty-text cluster " +
      "instead of vanishing through the NULL join key") {
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, ""),
      (3L, "real"))
    val got = Dedup.softWeights(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.length == 3, s"NULL-text doc was dropped: ${got.toSeq}")
    assert(got(0) == ((1L, 2L, 0.5)) && got(1) == ((2L, 2L, 0.5)),
      s"NULL and empty text must share a cluster: ${got.toSeq}")
    assert(got(2) == ((3L, 1L, 1.0)))
  }
}
