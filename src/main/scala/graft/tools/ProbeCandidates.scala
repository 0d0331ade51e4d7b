package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Hashing

/** Counts simhash candidate-pair volume by hamming cutoff — how much
  * exact-jaccard verification the multiprobe admits. */
object ProbeCandidates {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents")
    val sig = docs.select(col("doc_id"), Hashing.simhash64(col("text")).as("sig"))
    val bandCols = (0 until 8).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sig"), b * 8).bitwiseAND(lit(0xffL)).as("bucket"))
    }
    val banded = sig
      .select(col("doc_id"), col("sig"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
    val probeKeys = col("bucket") +:
      (0 until 8).map(i => col("bucket").bitwiseXOR(lit(1L << i)))
    val probes = banded.select(col("doc_id"), col("sig"), col("band"),
      explode(array(probeKeys: _*)).as("bucket"))
    val joined = probes.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("h"))
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
