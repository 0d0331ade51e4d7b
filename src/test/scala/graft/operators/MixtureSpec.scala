package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Unit coverage for [[Mixture]] beyond the p04–p06 gates — in
  * particular the zero/negative-target edge: Spark's
  * `sequence(0, -1)` yields the DESCENDING array `[0, -1]`, not an
  * empty one, so an unguarded explode would emit the WHOLE source at
  * epoch −1 exactly when the recipe says to emit nothing. */
class MixtureSpec extends SparkSuite {

  private def corpus = {
    import spark.implicits._
    (1 to 60).map(i => (i.toLong, s"src${i % 3}", (i % 7) + 1))
      .toDF("doc_id", "source", "toks")
  }

  test("epochedSample: a source whose target rounds to zero emits nothing") {
    // src0 targets 0 tokens; src1/src2 get a real target. Before the
    // explode guard, src0's sequence(0, -1) emitted every src0 doc at
    // epoch -1.
    val out = Mixture.epochedSample(corpus, "source", "doc_id",
      col("toks"), total =>
        when(col("source") === "src0", lit(0L))
          .otherwise((total / 4).cast("long")))
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySrc.contains("src0"), s"src0 must emit nothing: $bySrc")
    assert(bySrc.contains("src1") && bySrc.contains("src2"))
    assert(out.filter(col("epoch") < 0).isEmpty,
      "no negative epochs may ever be emitted")
  }

  test("alphaSample: α = ½ flattens — a 100× source gets ~10× the " +
      "quota, and the isqrt weights are exact at perfect-square edges") {
    import spark.implicits._
    // big: 10000 one-token docs; small: 100 one-token docs. Proportional
    // sampling would give big 100× small's quota; α = ½ gives
    // w = isqrt(10000) = 100 vs isqrt(100) = 10 — exactly 10×. Budget
    // 1010 tokens → quotas 918 (big) and 91 (small): small keeps ~91%
    // of itself, big ~9% — the upsampling the recipe exists for.
    val docs = ((1 to 10000).map(i => (i.toLong, "big")) ++
      (20001 to 20100).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val out = Mixture.alphaSample(docs, "source", "doc_id", lit(1),
        _ => lit(1010L))
      .groupBy(col("source"))
      .agg(max(col("w_alpha")).as("w"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(out("big")._1 == 100L && out("small")._1 == 10L)
    // keep ⟺ (cum+1)·110 ≤ 1010·w: big ⌊1010·100/110⌋ = 918,
    // small ⌊1010·10/110⌋ = 91 — exact, crossing doc included by the
    // strict-< exclusive-total rule (here quotas land on doc bounds).
    assert(out("big")._2 == 918L, out.toString)
    assert(out("small")._2 == 91L, out.toString)
  }

  test("epochedSample: negative target emits nothing and breaks nothing") {
    val out = Mixture.epochedSample(corpus, "source", "doc_id",
      col("toks"), _ => lit(-5L))
    assert(out.isEmpty)
  }

  test("epochedSample: every epoch but the last is the complete source") {
    // Target = 2.5x each source's own tokens -> epochs 0 and 1 complete,
    // epoch 2 a prefix landing the target exactly.
    val perSrc = corpus.groupBy("source")
      .agg(sum(col("toks")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val out = Mixture.epochedSample(corpus, "source", "doc_id",
      col("toks"), _ => (lit(5L) *
        // per-source token total via a correlated shape is overkill in a
        // unit test: recompute from the source name deterministically.
        when(col("source") === "src0", perSrc("src0")._1)
          .when(col("source") === "src1", perSrc("src1")._1)
          .otherwise(perSrc("src2")._1).cast("long")) / 2)
    val counts = out.groupBy("source", "epoch").agg(
        count(lit(1)).as("n"), sum(col("n_tokens")).as("t"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    for (s <- Seq("src0", "src1", "src2"); e <- 0 to 1)
      assert(counts((s, e))._1 == perSrc(s)._2,
        s"epoch $e of $s must be the complete source")
    for (s <- Seq("src0", "src1", "src2")) {
      val target = perSrc(s)._1 * 5 / 2
      val emitted = counts.collect { case ((`s`, _), (_, t)) => t }.sum
      assert(emitted >= target && emitted - target < 8,
        s"$s: emitted $emitted vs target $target — last epoch must be " +
          "the prefix that lands the target")
    }
  }
}
