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
