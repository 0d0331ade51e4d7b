package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins [[Bpe]]'s training and application semantics against hand-
  * computed references: deterministic most-frequent-pair selection with
  * lexicographic tie-breaks, leftmost-greedy non-overlapping merge
  * application, word-boundary isolation (merges never cross the space
  * symbol), and end-to-end determinism.
  */
class BpeSpec extends SparkSuite {

  import spark.implicits._

  private val S = Bpe.Sep

  private def seg(text: String, merges: Seq[(String, String)]): String =
    Seq(Tuple1(text)).toDF("text")
      .select(Bpe.segmented(Seq(Tuple1(text)).toDF("text"), "text", merges)
        .as("r"))
      .head().getString(0)

  test("training picks the most frequent pair, ties broken " +
      "lexicographically") {
    // "ab" x3, "ba" x3: (a,b) appears 3x, (b,a) 3x -> tie, (a,b) wins.
    val docs = Seq("ab ab ab ba ba ba").toDF("text")
    val merges = Bpe.trainMerges(docs, "text", 1)
    assert(merges == Seq(("a", "b")))
  }

  test("merge ranks replay in order; later merges build on earlier ones") {
    // Corpus dominated by "abc": merge1 = most frequent char pair,
    // merge2 composes it into the full word.
    val docs = Seq("abc abc abc abc xy").toDF("text")
    val merges = Bpe.trainMerges(docs, "text", 2)
    assert(merges.head._1 + merges.head._2 == "ab" ||
      merges.head._1 + merges.head._2 == "bc")
    val s = seg("abc", merges)
    assert(s == s"${S}abc$S", s"expected fully merged 'abc', got $s")
  }

  test("leftmost-greedy on overlapping occurrences (aaa -> [aa, a])") {
    val s = seg("aaa", Seq(("a", "a")))
    assert(s == s"${S}aa${S}a$S")
  }

  test("merges never cross a word boundary") {
    // Train on a corpus where 'b a' would be the top CROSS-WORD pair if
    // boundaries leaked; per-word pairs only see (a,b).
    val docs = Seq("ab ab ab ab").toDF("text")
    val merges = Bpe.trainMerges(docs, "text", 1)
    assert(merges == Seq(("a", "b")))
    // Application: the space symbol blocks the merge across words — the
    // cross-word b..a adjacency in "b ab a" must NOT merge, while the
    // in-word "ab" does.
    val s = seg("b ab a", merges)
    assert(s == S + "b" + S + " " + S + "ab" + S + " " + S + "a" + S,
      s"got $s")
  }

  test("token count excludes the space symbol; blank docs are null") {
    val merges = Seq(("a", "b"))
    val df = Seq("ab a b", "   ").toDF("text")
    val out = df.select(
      Bpe.segmented(df, "text", merges).as("rep"))
      .select(col("rep"), Bpe.tokenCountOf(col("rep")).as("n"))
      .collect()
    assert(out(0).getInt(1) == 3) // [ab], [a], [b]
    assert(out(1).isNullAt(0))
  }

  test("local trainer equals the distributed per-merge loop") {
    // trainMerges routes driver-sized vocabularies to the in-memory
    // incremental trainer; the two implementations must share one total
    // order and one merge semantics bit-for-bit — 20 merges on the real
    // fixture corpus, including composed (multi-char) merges, pins it.
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001",
      "documents")
    val local = Bpe.trainMerges(docs, "text", 20)
    val dist = Bpe.trainMergesDistributed(docs, "text", 20)
    assert(local == dist, s"local $local\nvs distributed $dist")
  }

  test("local trainer handles overlap, exhaustion, and stale index rows") {
    // "aaaa" under the shared separator-consuming replace scan:
    // merge 1 = (a,a) -> [aa, a, a] (the match consumes the trailing
    // separator, so the third `a` cannot start a match); merge 2 = (a,a)
    // AGAIN (ties (a,a) < (aa,a)) -> [aa, aa]; merge 3 = (aa,aa) ->
    // [aaaa]; then exhaustion (single-symbol words have no pairs). The
    // repeats exercise the stale-hosts path AND re-selection of a pair
    // that survived its own merge.
    val docs = Seq("aaaa aaaa b").toDF("text")
    assert(Bpe.trainMerges(docs, "text", 10) ==
      Seq(("a", "a"), ("a", "a"), ("aa", "aa")))
  }

  test("run-heavy words: local == distributed == segmented replay") {
    // The regression the separator semantics exist to prevent: a run of
    // >= 4 identical symbols is where symbol-level merging ([aa, aa])
    // and String.replace's separator-consuming scan ([aa, a, a])
    // diverge. All three consumers — the local trainer, the distributed
    // per-merge loop, and merge application — must agree.
    val docs = Seq("aaaa aaaa b", "aaa ab").toDF("text")
    val local = Bpe.trainMerges(docs, "text", 6)
    val dist = Bpe.trainMergesDistributed(docs, "text", 6)
    assert(local == dist, s"local $local\nvs distributed $dist")
    // Segmenting the training word with the trained table reproduces
    // the trainer's final working form: fully merged to one symbol.
    assert(seg("aaaa", local) == s"${S}aaaa$S")
  }

  test("training is deterministic across repeated runs") {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001",
      "documents")
    val m1 = Bpe.trainMerges(docs, "text", 8)
    val m2 = Bpe.trainMerges(docs, "text", 8)
    assert(m1 == m2)
    assert(m1.length == 8)
    // Multi-char merges appear — the signature of real BPE composition.
    assert(m1.exists { case (a, b) => (a + b).length > 2 },
      s"no composed merge in $m1")
  }

  test("persisted merge table round-trips in rank order") {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001",
      "documents")
    val trained = Bpe.trainMerges(docs, "text", 8)
    Bpe.persistMerges(spark, "bpe_spec.merges", trained)
    assert(Bpe.loadMerges(spark, "bpe_spec.merges") == trained)
    // A retrain is an atomic full replace, not an append.
    Bpe.persistMerges(spark, "bpe_spec.merges", trained.take(3))
    assert(Bpe.loadMerges(spark, "bpe_spec.merges") == trained.take(3))
    new graft.model.CatalogMaterializer()
      .dropRelation(spark, "bpe_spec.merges")
  }

  test("applying a loaded tokenizer is map-only: no shuffle, no retrain") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001",
      "documents")
    Bpe.persistMerges(spark, "bpe_spec.apply",
      Bpe.trainMerges(docs.filter(col("doc_id") < 100), "text", 8))
    val loaded = Bpe.loadMerges(spark, "bpe_spec.apply")
    val plan = docs
      .select(col("doc_id"), Bpe.segmented(docs, "text", loaded).as("rep"))
      .queryExecution.executedPlan.toString
    // The merge table rides as literals in one projection over the
    // scan — any Exchange or Aggregate here would mean application
    // re-pays a training-sized cost per batch.
    assert(!plan.contains("Exchange"), s"apply plan shuffles:\n$plan")
    assert(!plan.contains("Aggregate"), s"apply plan aggregates:\n$plan")
    new graft.model.CatalogMaterializer()
      .dropRelation(spark, "bpe_spec.apply")
  }
}
