package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Caches

/** Sequence packing for LLM training corpora: the concat-and-chunk
  * regime — documents are laid end to end in a deterministic order and
  * the token stream is cut into fixed-length training sequences
  * ("packs"); a document starts in pack `floor(tokens_before / seqLen)`.
  * The per-pack manifest (doc count, token sum, id range) is what a
  * training pipeline ships to its data loader as shard metadata.
  *
  * 100 TB design — the global running token count is a PREFIX SUM, and
  * the naive formulation (one `Window.orderBy` with no partitioning) is
  * a single-task sort of the whole corpus: the classic scale cliff. This
  * implementation is the standard two-phase distributed prefix sum:
  *
  *  1. range-partition by the order column, sort within partitions —
  *     each partition holds a contiguous slice of the global order;
  *  2. one tiny job aggregates a per-partition token subtotal; the
  *     driver prefix-sums THOSE (one row per partition — thousands of
  *     entries at 100 TB, not rows) into per-partition start offsets;
  *  3. a per-partition window (parallel across partitions) adds the
  *     within-partition running sum to the broadcast offset.
  *
  * Offsets are exact longs; every step is deterministic for a fixed
  * corpus, so re-runs produce identical pack assignments — the property
  * that makes packed shards reproducible across cluster sizes (the
  * partition COUNT affects only the split points of the computation,
  * never the arithmetic).
  */
object Packing {

  /** Per-document pack assignment: input rows plus `pack_id` (0-based)
    * and the inclusive global running token count `cum_tokens`.
    *
    * @param docs     one row per document
    * @param orderCol total-order column (unique; the concat order)
    * @param tokCol   integral token count per document
    * @param seqLen   tokens per training sequence
    */
  def packAssignments(docs: DataFrame, orderCol: String, tokCol: String,
      seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val spark = docs.sparkSession
    // Phase 1: contiguous global-order slices. Persisted so the subtotal
    // job and the final assembly see the same partitioning (and the
    // range-partitioning's sampling pass runs once).
    val parted = Caches.persist(
      docs.repartitionByRange(col(orderCol))
        .sortWithinPartitions(orderCol)
        .withColumn("__pid", spark_partition_id()))
    // Phase 2: per-partition subtotals — one row per partition, the only
    // thing the driver ever holds.
    val subtotals = parted.groupBy(col("__pid"))
      .agg(sum(col(tokCol)).cast("long").as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = subtotals.map { case (pid, t) =>
      val start = acc; acc += t; (pid, start)
    }.toSeq
    import spark.implicits._
    val offsetsDf = offsets.toDF("__pid", "__off")
    // Phase 3: within-partition running sum + broadcast offset.
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
    parted.join(broadcast(offsetsDf), "__pid")
      .withColumn("cum_tokens",
        sum(col(tokCol).cast("long")).over(w) + col("__off"))
      .withColumn("pack_id", packOf(col("cum_tokens") - col(tokCol), seqLen))
      .drop("__pid", "__off")
  }

  /** Pack index of a token offset: integral division carried in DECIMAL
    * (long `/` in Spark is double division, and token offsets at 100 TB
    * exceed double's 2^53 exact-integer range); the final cast truncates,
    * which equals floor for the non-negative offsets here. */
  private def packOf(tokensBefore: Column, seqLen: Int): Column =
    (tokensBefore.cast("decimal(38,0)") / lit(seqLen.toLong)).cast("long")
}
