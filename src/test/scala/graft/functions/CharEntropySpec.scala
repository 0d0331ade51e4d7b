package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.SparkSuite

/** Pins the native [[CharEntropy]] kernel to the higher-order-function
  * formulation it replaced ([[TextFunctions.charEntropyHof]]): the t14
  * oracle hash-matched the HOF version, so BIT-exact equivalence (not
  * tolerance equality) is the contract — same first-occurrence summation
  * order, same `(-p) * log2(p)` term shape, same left fold from 0.0.
  */
class CharEntropySpec extends SparkSuite {

  private def bits(d: java.lang.Double): java.lang.Long =
    if (d == null) null else java.lang.Double.doubleToRawLongBits(d)

  private def bothOn(texts: Seq[String]): Seq[(java.lang.Long, java.lang.Long)] = {
    import spark.implicits._
    texts.toDF("t")
      .select(
        TextFunctions.charEntropy(col("t")).as("native"),
        TextFunctions.charEntropyHof(col("t")).as("hof"))
      .collect()
      .map(r => (
        bits(r.getAs[java.lang.Double]("native")),
        bits(r.getAs[java.lang.Double]("hof"))))
      .toSeq
  }

  test("native kernel is bit-identical to the HOF formulation on the corpus") {
    val docs = spark.read.parquet(sf("documents.parquet"))
    val mismatches = docs
      .select(
        col("doc_id"),
        TextFunctions.charEntropy(col("text")).as("native"),
        TextFunctions.charEntropyHof(col("text")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("edge cases: empty, constant, two-symbol, null, non-BMP") {
    import spark.implicits._
    val rows = Seq("", "aaaa", "abab", "𝄞𝄞aa", "é é a").toDF("t")
      .select(TextFunctions.charEntropy(col("t")).as("e"))
      .collect().map(_.getAs[java.lang.Double]("e"))
    assert(rows(0) == 0.0) // empty text scores 0, not NULL
    assert(rows(1) == 0.0) // single symbol: no uncertainty
    assert(rows(2) == 1.0) // fair two-symbol alphabet = exactly 1 bit
    assert(rows(3) == 1.0) // surrogate pair counts as ONE character
    val nullRow = Seq[String](null).toDF("t")
      .select(TextFunctions.charEntropy(col("t")).as("e"))
      .collect()(0)
    assert(nullRow.isNullAt(0))
  }

  test("property: bit-identical on arbitrary strings incl. unicode") {
    val genText = Gen.oneOf(
      Gen.listOf(Gen.choose(' ', '~')).map(_.mkString),
      Gen.listOf(Gen.oneOf('a', 'b', ' ', 'é', '中', '\n')).map(_.mkString))
    // One batched Spark comparison over 200 generated samples (a Spark
    // job per scalacheck case would dominate the suite's runtime).
    val samples = Iterator.continually(genText.sample)
      .flatten.take(200).toList
    assert(samples.size == 200)
    bothOn(samples).zip(samples).foreach { case ((n, h), s) =>
      assert(n == h, s"native!=hof for ${s.take(40)}")
    }
  }

  test("char_entropy is SQL-registered") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT char_entropy('abab') e").head()
    assert(r.getDouble(0) == 1.0)
  }
}
