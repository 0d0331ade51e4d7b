package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Hashing
import graft.operators.Dedup

/** Counts simhash candidate-pair volume by hamming cutoff — how much
  * exact-jaccard verification the multiprobe admits. Uses the PRODUCTION
  * banding join (`Dedup.bandedSimhashCandidates`), so the numbers describe
  * the operator, not a hand copy of it. Signatures here are TOKEN-level
  * `simhash64(text)` over raw docs (no duplicate-cluster collapse) — this
  * probe exists to show why the shingle-set signature replaced it
  * (see `Hashing.SimHashOfHashes`), so it measures the rejected design.
  */
object ProbeCandidates {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents")
    val sig = docs.select(col("doc_id"),
      Hashing.simhash64(col("text")).as("sig"))
    val joined = Dedup.bandedSimhashCandidates(sig)
      .withColumnRenamed("hamming", "h")
    joined.persist()
    println("matched key pairs (pre-distinct): " + joined.count())
    val d = joined.distinct().persist()
    println("distinct candidate pairs: " + d.count())
    Seq(7, 11, 15).foreach { h =>
      println(s"  hamming<=$h: " + d.filter(col("h") <= h).count())
    }
    spark.stop()
  }
}
