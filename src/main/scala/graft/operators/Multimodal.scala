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
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(decodeBatch(_, buckets))
      }
  }
}
