package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Hashing
import graft.operators.Dedup

/** Measures the simhash hamming distribution over the TRUE jaccard-pair
  * set (d02's answer): what band/probe coverage does guaranteed recall
  * need on this corpus? */
object HammingProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val docs = Tables(spark, s"/root/testdata/$sf", "documents")
      val sig = docs.select(col("doc_id"), Hashing.simhash64(col("text")).as("sig"))
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 0.6)
      val ham = pairs
        .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("siga")), "doc_a")
        .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sigb")), "doc_b")
        .select(bit_count(col("siga").bitwiseXOR(col("sigb"))).as("hamming"))
        .groupBy("hamming").count().orderBy(col("hamming"))
      println(s"== $sf true-pair hamming distribution:")
      ham.collect().foreach(r => println(s"   hamming ${r.get(0)}: ${r.get(1)}"))
      graft.core.Caches.releaseAll()
    }
    spark.stop()
  }
}
