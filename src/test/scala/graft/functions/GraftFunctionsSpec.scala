package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class GraftFunctionsSpec extends SparkSuite {

  test("native expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        |  word_shingles('a b c d', 3) AS sh,
        |  size(hashed_word_shingles('a b c d', 3)) AS nh,
        |  sorted_intersect_size(
        |    hashed_word_shingles('a b c d', 3),
        |    hashed_word_shingles('b c d e', 3)) AS common,
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |  simhash64('hello world') = simhash64('hello world') AS stable,
        |  size(minhash_sig(word_shingles('a b c d e', 2), 8)) AS k
        |""".stripMargin).collect()(0)
    assert(row.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(row.getInt(1) == 2)
    assert(row.getInt(2) == 1) // "b c d" shared
    assert(row.getDouble(3) == 11.0)
    assert(row.getBoolean(4))
    assert(row.getInt(5) == 8)
  }

  test("quality score is a value in [0,1] even for empty text") {
    import spark.implicits._
    val rows = Seq("", "   ", "the quick brown fox is here now")
      .toDF("t")
      .select(TextFunctions.qualityScore(col("t")).as("q"))
      .collect().map(_.getDouble(0))
    // An unguarded x/0 would make these NULL, silently dropping empty
    // docs from BOTH sides of a quality-threshold filter.
    assert(rows.forall(q => q >= 0.0 && q <= 1.0), rows.toSeq.toString)
    assert(rows(0) == 0.0)
  }

  test("dup-ngram building blocks: set size vs arithmetic total (t17)") {
    import spark.implicits._
    val rows = Seq(
      "aaa bbb aaa bbb aaa", // grams: [aaa bbb aaa, bbb aaa bbb, aaa bbb aaa]
      "a b",                 // < 3 words: no grams
      "  x   y  z  ",        // ragged whitespace: one gram
      "a b c\n",             // trailing NON-SPACE whitespace: Column trim
      "\tp q r",             // would miss these; empty-token filter works
      "")
      .toDF("t")
      .select(
        greatest(
          size(filter(split(col("t"), "\\s+"), w => length(w) > 0)) - 2,
          lit(0)).as("total"),
        size(TextFunctions.wordShingles(col("t"), 3)).as("distinct"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows(0) == ((3, 2))) // one repeated 3-gram -> dup_frac 1/3
    assert(rows(1) == ((0, 0)))
    assert(rows(2) == ((1, 1)))
    assert(rows(3) == ((1, 1))) // total == distinct: dup_frac 0, keep
    assert(rows(4) == ((1, 1)))
    assert(rows(5) == ((0, 0)))
  }

  test("simhash_of_hashes is SQL-registered (the d04 pipeline shape)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT simhash_of_hashes(hashed_word_shingles('a b c d', 2)) s1,
        |       simhash_of_hashes(hashed_word_shingles('a b c d', 2)) s2
        |""".stripMargin).head()
    assert(r.getLong(0) == r.getLong(1))
  }

  test("SQL and Column APIs produce identical results on real data") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet(sf("documents.parquet"))
    docs.createOrReplaceTempView("gf_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, simhash64(text) AS sig FROM gf_docs ORDER BY doc_id")
      .collect().toSeq.map(_.toSeq)
    val viaCol = docs
      .select(col("doc_id"), Hashing.simhash64(col("text")).as("sig"))
      .orderBy(col("doc_id")).collect().toSeq.map(_.toSeq)
    assert(viaSql == viaCol)
  }
}
