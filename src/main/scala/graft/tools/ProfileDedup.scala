package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.operators.Dedup

/** Scratch profiler for the dedup pipeline stages (not part of the driver
  * contract; run manually: `runMain graft.tools.ProfileDedup <sfDir>`). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = Tables(spark, dir, "documents")
    val sh = Dedup.shingled(docs, "doc_id", "text")
    t("shingled.count")(sh.count())
    t("shingled stats") {
      sh.select(min(size(col("shingles"))), max(size(col("shingles"))),
        avg(size(col("shingles")))).show()
    }
    val ex = sh.select(col("doc_id"), size(col("shingles")).as("n_sh"),
      explode(col("shingles")).as("shingle"))
    t("exploded.count")(println(ex.count()))
    val docFreq = ex.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    t("docFreq")(docFreq.agg(max(col("df")), avg(col("df")),
      count(lit(1))).show())
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("shingle"))
    val prefix = ex.join(docFreq, "shingle")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("n_sh") - floor(lit(0.6) * col("n_sh")) + 1)
      .select(col("doc_id"), col("shingle"))
    t("prefix.count")(println(prefix.count()))
    val candidates = prefix.as("a")
      .join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    t("candidates raw")(println(candidates.count()))
    val cd = candidates.distinct()
    t("candidates distinct")(println(cd.count()))
    t("full jaccardPairs")(
      println(Dedup.jaccardPairs(docs, "doc_id", "text", 0.6).count()))
    spark.stop()
  }
}
