package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** The real-codec path ([[Multimodal.decodeImages]], javax.imageio):
  * fixture-pinned decoded dimensions and luma, PNG losslessness, and the
  * synthetic-payload round-trip the mm05 oracle relies on. */
class MultimodalSpec extends SparkSuite {

  import spark.implicits._

  private def png(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    (0 until h).foreach(y => (0 until w).foreach(x =>
      img.getRaster.setSample(x, y, 0, pixel(x, y))))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImages reads a PNG fixture's exact dimensions and luma") {
    // 3×2 gray fixture with hand-picked pixels: luma sum is their sum.
    val pixels = Map((0, 0) -> 10, (1, 0) -> 20, (2, 0) -> 30,
      (0, 1) -> 255, (1, 1) -> 0, (2, 1) -> 128)
    val docs = Seq((7L, png(3, 2)(pixels(_, _)))).toDF("doc_id", "payload")
    val d = Multimodal.decodeImages(docs, "doc_id", "payload").head()
    assert((d.doc_id, d.width, d.height, d.n_pixels, d.luma_sum) ==
      ((7L, 3, 2, 6L, pixels.values.sum.toLong)))
  }

  test("PNG header sniff agrees with the decoder without decoding") {
    import org.apache.spark.sql.functions._
    // Odd, unequal dims so a byte-order or offset slip cannot cancel out.
    val docs = Seq((3L, png(257, 11)((x, y) => (x + y) % 256)))
      .toDF("doc_id", "payload")
    def be(pos: Int, len: Int) =
      conv(hex(substring(col("payload"), pos, len)), 16, 10).cast("long")
    val r = docs.select(be(17, 4).as("w"), be(21, 4).as("h"),
      be(25, 1).as("depth"), be(26, 1).as("color")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((257L, 11L, 8L, 0L)))
  }

  test("decodeImages handles a JPEG payload (dimensions are exact)") {
    val img = new BufferedImage(17, 9, BufferedImage.TYPE_BYTE_GRAY)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    val docs = Seq((1L, bos.toByteArray)).toDF("doc_id", "payload")
    val d = Multimodal.decodeImages(docs, "doc_id", "payload").head()
    // JPEG is lossy: dimensions and pixel count are exact, luma is not.
    assert((d.width, d.height, d.n_pixels) == ((17, 9, 153L)))
  }

  test("a non-image payload fails loudly, not with garbage features") {
    val docs = Seq((2L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val e = intercept[Exception] {
      Multimodal.decodeImages(docs, "doc_id", "payload").collect()
    }
    assert(e.getMessage != null)
  }

  test("syntheticPng round-trips exactly (the mm05 oracle contract)") {
    val (id, w, h) = (42L, 12, 9)
    val docs = Seq((id, Multimodal.syntheticPng(id, w, h)))
      .toDF("doc_id", "payload")
    val d = Multimodal.decodeImages(docs, "doc_id", "payload").head()
    val expected = (for (y <- 0 until h; x <- 0 until w)
      yield (31L * id + 7L * x + 13L * y) % 256).sum
    assert((d.width, d.height, d.n_pixels, d.luma_sum) ==
      ((w, h, w.toLong * h, expected)))
  }

  test("mm10's WHT is a true Hadamard transform: W0 = Σ samples and " +
      "Parseval holds exactly (Σ W² = 8·Σ s²) on the gate output") {
    // 16 ASCII chars = 8 samples = exactly one frame; run the GATE's
    // own expression so the sign matrix under test is the shipped one.
    val out = graft.SparkEntry.queries("mm10_pcm_wht")(spark,
      "/root/testdata/sf0.001")
    val rows = out.filter(col("n_frames") > 0).limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val text = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(col("doc_id") === r.getLong(0))
        .head().getAs[String]("text")
      r.getString(2).split(';').zipWithIndex.foreach { case (fr, f) =>
        val w = fr.split(',').map(_.toLong)
        val s = (0 until 8).map { i =>
          val p = f * 16 + i * 2
          text.charAt(p).toLong + 256L * text.charAt(p + 1)
        }
        assert(w(0) == s.sum, "W0 must be the frame sum (DC)")
        assert(w.map(x => x * x).sum == 8L * s.map(x => x * x).sum,
          "Parseval: the sign matrix is not orthogonal")
      }
    }
  }
}
