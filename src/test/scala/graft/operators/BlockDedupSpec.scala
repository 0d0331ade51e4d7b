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
