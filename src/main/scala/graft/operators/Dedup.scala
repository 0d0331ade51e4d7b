package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{Hashing, TextFunctions}

/** Deduplication operators for document corpora, designed around shuffle
  * economics at 100 TB:
  *
  *  - exact: one hash-shuffle on a 16-byte fingerprint (not the document).
  *  - exact jaccard: inverted shingle index — candidates share ≥1 shingle,
  *    so cost is Σ df(shingle)², not n². Production corpora additionally cap
  *    document frequency (`maxShingleDf`) to drop stop-shingles, which is
  *    what bounds the quadratic term under skew.
  *  - MinHash LSH: signature + banding turns near-dup search into an
  *    equi-join on (band, bucket) — the Spark-native shape (shuffle on
  *    bucket key, AQE handles skewed buckets); candidates are then verified
  *    with exact jaccard so precision is 1.0 and recall is the banding
  *    probability (b=16, r=4 ⇒ P(miss | j=0.9) ≈ 4e-8).
  *  - SimHash: one 64-bit signature per doc, banded into 8×8-bit keys —
  *    guaranteed candidate generation for hamming ≤ 7 by pigeonhole.
  */
object Dedup {

  /** Exact dedup on the whitespace-normalized fingerprint: every row keyed,
    * first id per fingerprint kept. */
  def exactMarked(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("fingerprint")).orderBy(col(idCol))
    docs.select(col(idCol),
        TextFunctions.fingerprint(col(textCol)).as("fingerprint"))
      .withColumn("kept", row_number().over(w) === 1)
  }

  /** (id, shingles) pairs with the empty/short docs dropped. */
  def shingled(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        TextFunctions.wordShingles(col(textCol), n).as("shingles"))
      .filter(size(col("shingles")) > 0)

  private def verified(candidates: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame = {
    val sa = sh.select(col("doc_id").as("doc_a"), col("shingles").as("sa"))
    val sb = sh.select(col("doc_id").as("doc_b"), col("shingles").as("sb"))
    val inter = size(array_intersect(col("sa"), col("sb")))
    val jac = inter / (size(col("sa")) + size(col("sb")) - inter)
    candidates
      .join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("jaccard_raw", jac)
      .filter(col("jaccard_raw") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("jaccard_raw"), 6).as("jaccard"))
  }

  /** Exact n-gram jaccard pairs ≥ threshold via inverted shingle index. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3): DataFrame = {
    val sh = shingled(docs, idCol, textCol, n)
    val ex = sh.select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val sizes = sh.select(col("doc_id"), size(col("shingles")).as("n_sh"))
    val inter = ex.as("a")
      .join(ex.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    val jac = col("n_common") /
      (col("sa.n_sh") + col("sb.n_sh") - col("n_common"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .filter(jac >= threshold)
      .select(col("doc_a"), col("doc_b"), round(jac, 6).as("jaccard"))
  }

  /** MinHash + LSH banding; candidates verified with exact jaccard, so the
    * output equals [[jaccardPairs]] up to banding recall. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sh = shingled(docs, idCol, textCol)
    val sig = sh.select(col("doc_id"),
      Hashing.minhashSig(col("shingles"), numHashes).as("sig"))
    // (doc, band, bucket-key): bucket key is the band's signature slice.
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", transform(
          slice(col("sig"), b * rows + 1, rows), _.cast("string")))
          .as("bucket"))
    }
    val banded = sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verified(candidates, sh, threshold)
  }

  /** SimHash banding (8 bands × 8 bits ⇒ no candidate missed below hamming
    * 8); pairs reported with hamming distance and verified jaccard. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxHamming: Int = 7): DataFrame = {
    val sig = docs.select(col(idCol).as("doc_id"),
      Hashing.simhash64(col(textCol)).as("sig"))
    val bandCols = (0 until 8).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sig"), b * 8).bitwiseAND(lit(0xffL)).as("bucket"))
    }
    val banded = sig
      .select(col("doc_id"), col("sig"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .filter(bit_count(col("a.sig").bitwiseXOR(col("b.sig"))) <= maxHamming)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
    val sh = shingled(docs, idCol, textCol)
    verified(candidates.select("doc_a", "doc_b"), sh, threshold)
      .join(candidates, Seq("doc_a", "doc_b"))
      .select(col("doc_a"), col("doc_b"), col("hamming"), col("jaccard"))
  }
}
