package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Batched decode plumbing for multimodal (binary) columns.
  *
  * The per-row path is [[graft.functions.ByteHistogram]] (a native
  * expression — fastest when the codec is cheap and row-local). Real
  * image/audio codecs, however, amortize setup per BATCH (decoder init,
  * pinned buffers, GPU dispatch), which is why Python pipelines use
  * `mapInPandas`. This is the Scala equivalent: `mapPartitions` with
  * explicit micro-batching — the iterator is consumed lazily in groups of
  * `batchSize`, so peak memory is one batch of payloads per task, not the
  * partition. The decode body here is the same deterministic stand-in the
  * expression uses (byte histogram); a real codec drops into
  * `decodeBatch` unchanged.
  */
object Multimodal {

  final case class DecodedDoc(doc_id: Long, n_bytes: Long,
      features: Array[Long])

  /** The batch hook: decode `batch.length` payloads in one call. */
  private def decodeBatch(batch: Seq[(Long, Array[Byte])],
      buckets: Int): Seq[DecodedDoc] =
    batch.map { case (id, bytes) =>
      val width = 256 / buckets
      val counts = new Array[Long](buckets)
      var i = 0
      while (i < bytes.length) {
        counts((bytes(i) & 0xff) / width) += 1
        i += 1
      }
      DecodedDoc(id, bytes.length.toLong, counts)
    }

  /** docs(idCol, payloadCol: binary) → (doc_id, n_bytes, features). */
  def decodeFeatures(docs: DataFrame, idCol: String, payloadCol: String,
      buckets: Int = 8, batchSize: Int = 64): Dataset[DecodedDoc] = {
    // Same contract as the ByteHistogram expression: a non-divisor would
    // index past the array (byte 255 / width) inside executor tasks.
    require(buckets > 0 && 256 % buckets == 0,
      s"buckets must divide 256, got $buckets")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(decodeBatch(_, buckets))
      }
  }

  final case class DecodedImage(doc_id: Long, width: Int, height: Int,
      n_pixels: Long, luma_sum: Long)

  /** The REAL-codec batch hook: `javax.imageio` — the JDK's builtin
    * PNG/JPEG/BMP/GIF readers, zero added dependencies. Batched like
    * [[decodeBatch]], so a heavier codec (native decoder holding pinned
    * buffers, GPU dispatch) slots in without touching the plan shape. */
  private def decodeImageBatch(
      batch: Seq[(Long, Array[Byte])]): Seq[DecodedImage] =
    batch.map { case (id, bytes) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"payload of doc $id is not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      DecodedImage(id, w, h, w.toLong * h, sum)
    }

  /** docs(idCol, payloadCol: binary image) → decoded dimensions + first-
    * band luma sum, via the same micro-batched `mapPartitions` shape as
    * [[decodeFeatures]] — binary in, typed features out, everything
    * inside the distributed plan. */
  def decodeImages(docs: DataFrame, idCol: String, payloadCol: String,
      batchSize: Int = 64): Dataset[DecodedImage] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows =>
        rows.grouped(batchSize).flatMap(decodeImageBatch))
  }

  /** Deterministic PNG payload for doc `id`: TYPE_BYTE_GRAY `w`×`h` with
    * pixel(x,y) = (31·id + 7x + 13y) mod 256. PNG is lossless, so the
    * decoded dimensions and luma sum are exact integer arithmetic that a
    * SQL oracle recomputes without any image library. */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0,
          ((31L * id + 7L * x + 13L * y) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
