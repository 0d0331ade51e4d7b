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

  final case class ImageHash(doc_id: Long, dhash_bits: String)

  /** Perceptual difference-hash over DECODED pixels — the image tier's
    * analog of d01's content fingerprint: the first band is pooled onto
    * an 8×8 block-SUM grid (integer-exact — sums, not means, so no
    * division can round differently anywhere) and bit (y,x) says
    * whether block (y,x) outweighs its right neighbor (wrapping), the
    * classic dHash gradient signature that survives re-encoding and
    * resolution changes. Emitted y-major as a 64-char '0'/'1' STRING
    * rather than a packed long: bit 63 would need 2^63, which an
    * overflow-checked SQL engine cannot form, and only the signature's
    * VALUE must match cross-engine, not its representation. Dims must
    * divide 8×8 (a lossy resample would need an interpolation contract;
    * a shape mismatch fails loudly instead). */
  private def dhashBatch(batch: Seq[(Long, Array[Byte])]): Seq[ImageHash] =
    batch.map { case (id, bytes) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"payload of doc $id is not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      require(w % 8 == 0 && h % 8 == 0,
        s"dhash needs dims divisible by 8, got ${w}x$h for doc $id")
      val (bw, bh) = (w / 8, h / 8)
      val raster = img.getRaster
      val sums = Array.ofDim[Long](8, 8)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          sums(y / bh)(x / bw) += raster.getSample(x, y, 0)
          x += 1
        }
        y += 1
      }
      val bits = new StringBuilder(64)
      var by = 0
      while (by < 8) {
        var bx = 0
        while (bx < 8) {
          bits.append(if (sums(by)(bx) > sums(by)((bx + 1) % 8)) '1'
            else '0')
          bx += 1
        }
        by += 1
      }
      ImageHash(id, bits.toString)
    }

  /** docs(idCol, payloadCol: binary image) → (doc_id, dhash_bits), the
    * micro-batched real-codec shape of [[decodeImages]]. Downstream
    * this is a 64-bit key: exact perceptual dedup is one hash shuffle
    * (the d01 shape, see the mm08 gate); near-dup at hamming ≤ t bands
    * the string 8×8-chars like SimHash — no pairwise scan either way. */
  def imageDhash(docs: DataFrame, idCol: String, payloadCol: String,
      batchSize: Int = 64): Dataset[ImageHash] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.grouped(batchSize).flatMap(dhashBatch))
  }

  final case class Thumbnail(doc_id: Long, thumb_w: Int, thumb_h: Int,
      luma_sum: Long, thumb_px: String)

  /** Real-codec THUMBNAIL roundtrip — decode, integer block-mean
    * downsample, RE-ENCODE through the same codec, decode the encoded
    * bytes back: the resize-and-store stage of an image pipeline, with
    * the emitted pixels read from the re-encoded artifact so the
    * ENCODER sits on the verified path (a writer bug that perturbs one
    * sample flips the row). Block mean is floor(sum / (b·b)) — integer
    * division, no float resampling contract to pin. PNG is lossless,
    * so a SQL oracle replays the whole thing from the synthetic pixel
    * formula. Map-only: batched [[mapPartitions]] like every codec
    * step (Catalyst has no expression that runs an image codec), no
    * shuffle anywhere. */
  def thumbnailRoundtrip(docs: DataFrame, idCol: String,
      payloadCol: String, block: Int, batchSize: Int = 64)
      : Dataset[Thumbnail] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { case (id, bytes) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        require(img != null, s"payload of doc $id is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        require(w % block == 0 && h % block == 0,
          s"thumbnail needs dims divisible by $block, got ${w}x$h")
        val (tw, th) = (w / block, h / block)
        val raster = img.getRaster
        val thumb = new java.awt.image.BufferedImage(tw, th,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val traster = thumb.getRaster
        var ty = 0
        while (ty < th) {
          var tx = 0
          while (tx < tw) {
            var s = 0L
            var dy = 0
            while (dy < block) {
              var dx = 0
              while (dx < block) {
                s += raster.getSample(tx * block + dx, ty * block + dy, 0)
                dx += 1
              }
              dy += 1
            }
            traster.setSample(tx, ty, 0, (s / (block * block)).toInt)
            tx += 1
          }
          ty += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(thumb, "png", bos)
        val back = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bos.toByteArray))
        val braster = back.getRaster
        val px = new StringBuilder
        var sum = 0L
        var y = 0
        while (y < back.getHeight) {
          var x = 0
          while (x < back.getWidth) {
            val v = braster.getSample(x, y, 0)
            sum += v
            if (px.nonEmpty) px.append(',')
            px.append(v)
            x += 1
          }
          y += 1
        }
        Thumbnail(id, back.getWidth, back.getHeight, sum, px.toString)
      }))
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
