package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.core.Checkpoints

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
  *  2. one tiny job aggregates a per-partition token subtotal (a one-
  *     row-per-partition exchange); the driver prefix-sums THOSE into
  *     per-partition start offsets — thousands of entries at 100 TB,
  *     not rows;
  *  3. a `mapPartitions` pass adds the within-partition running sum to
  *     the broadcast offset — genuinely per-partition-sequential
  *     arithmetic, which is exactly the case the RDD-flavored escape
  *     hatch exists for: the declarative twin (a window partitioned by
  *     `spark_partition_id()`) forces a full hash Exchange of the
  *     corpus that this pass does not need (verified in the plan; the
  *     map runs on the partitions it already has).
  *
  * Offsets and pack indices are exact JVM longs; every step is
  * deterministic for a fixed corpus, so re-runs produce identical pack
  * assignments — the property that makes packed shards reproducible
  * across cluster sizes (the partition COUNT affects only the split
  * points of the computation, never the arithmetic).
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
    // Phase 1: contiguous global-order slices. CHECKPOINTED, not merely
    // persisted: the subtotal job and the final pass must see the same
    // partitioning (and the range-partitioning's sampling pass must run
    // once) — a persist gives both — but packing sits at the BOTTOM of
    // the pipeline gates' longest plans (six filter stages feed it in
    // the full recipe), and every downstream action over a persisted
    // frame still re-ANALYZES the whole upstream tree. Truncating
    // lineage here (guide §3.3/§5: materialise an intermediate to cut
    // the plan) makes every consumer of the pack assignment — the
    // manifest aggregate, the shard-partial writes, the gate's final
    // action — plan over a LogicalRDD instead of the full recipe tree
    // (measured on p07: the final action spent 5.4 s in pure driver
    // planning/codegen re-walking the six-stage tree that was already
    // cached). The frame is (orderCol, tokCol, ...) survivors-only —
    // executor-memory-cheap at any scale, and Checkpoints.truncate
    // upgrades to a reliable checkpoint on clusters.
    val parted = Checkpoints.truncate(
      docs.repartitionByRange(col(orderCol))
        .sortWithinPartitions(orderCol)
        .withColumn("__pid", spark_partition_id()))
    // Phase 2: per-partition subtotals — one row per partition is all
    // that ever reaches the driver.
    val subtotals = parted.groupBy(col("__pid"))
      .agg(sum(col(tokCol).cast("long")).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = subtotals.map { case (pid, t) =>
      val start = acc; acc += t; (pid, start)
    }.toMap
    val offsetsBc = spark.sparkContext.broadcast(offsets)
    // Phase 3: zero-shuffle running sum over the partitions phase 1
    // already laid out (rows arrive sorted by orderCol within each).
    val inSchema = parted.schema
    val pidIdx = inSchema.fieldIndex("__pid")
    val tokIdx = inSchema.fieldIndex(tokCol)
    val keptIdx = inSchema.fields.indices.filterNot(_ == pidIdx)
    val outSchema = StructType(
      keptIdx.map(inSchema.fields) ++ Seq(
        StructField("cum_tokens", LongType, nullable = false),
        StructField("pack_id", LongType, nullable = false)))
    val seqLenL = seqLen.toLong
    parted.mapPartitions { rows =>
      var cum = Long.MinValue // initialized from the first row's pid
      rows.map { r =>
        if (cum == Long.MinValue) cum = offsetsBc.value(r.getInt(pidIdx))
        // NULL token counts contribute 0 — consistent with phase 2's
        // sum(), which skips them (an unguarded cast NPE'd the task).
        val toks = Option(r.get(tokIdx))
          .map(_.asInstanceOf[Number].longValue()).getOrElse(0L)
        val before = cum
        cum += toks
        Row.fromSeq(keptIdx.map(r.get) ++ Seq(cum, before / seqLenL))
      }
    }(Encoders.row(outSchema))
  }

  /** Per-KEY deterministic prefix sum — the stratified twin of
    * [[packAssignments]]: adds `cum_before` (the exclusive running
    * `tokCol` total within `keyCol`, in `(orderCol, tie)` order) to the
    * input rows. The building block for quota-bounded mixture sampling:
    * "take documents from this source, in deterministic order, until
    * the source's token quota is met" is exactly `cum_before < quota`.
    *
    * 100 TB design — the naive `Window.partitionBy(key).orderBy(order)`
    * sorts EACH key in a single task: a 30 TB source is a 30 TB task.
    * Here keys do not bound parallelism: range-partition by
    * `(key, order)` so every partition holds a contiguous slice of one
    * or a few keys' global order, aggregate one `(partition, key)`
    * subtotal row each (partitions + keys rows total — thousands at
    * 100 TB, never data-sized), prefix-sum those on the driver per key
    * in partition order, and replay the running sum per-partition with
    * the broadcast offsets. Zero data-sized shuffles beyond the one
    * range Exchange, and the biggest key splits across as many
    * partitions as its bytes demand.
    */
  def keyedCumSum(docs: DataFrame, keyCol: String, orderCol: String,
      tokCol: String): DataFrame = {
    // Keys must be non-null strings (a null key fails loudly in the
    // driver-side subtotal sort, never silently miscounts).
    val spark = docs.sparkSession
    // Checkpointed for the same plan-truncation reason as
    // [[packAssignments]] (the mixture gates chain this under the
    // quota filter and then pack on top — two prefix sums of re-analyzed
    // tree otherwise).
    val parted = Checkpoints.truncate(
      docs.repartitionByRange(col(keyCol), col(orderCol))
        .sortWithinPartitions(keyCol, orderCol)
        .withColumn("__pid", spark_partition_id()))
    // One subtotal row per (partition, key) — range partitioning keeps
    // each key on a contiguous pid run, so this is O(parts + keys).
    val subtotals = parted.groupBy(col("__pid"), col(keyCol))
      .agg(sum(col(tokCol).cast("long")).as("__t"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(r => (r._2, r._1))
    val acc = scala.collection.mutable.Map.empty[String, Long]
    val offsets = subtotals.map { case (pid, key, t) =>
      val start = acc.getOrElse(key, 0L)
      acc(key) = start + t
      (pid, key) -> start
    }.toMap
    val offsetsBc = spark.sparkContext.broadcast(offsets)
    val inSchema = parted.schema
    val pidIdx = inSchema.fieldIndex("__pid")
    val keyIdx = inSchema.fieldIndex(keyCol)
    val tokIdx = inSchema.fieldIndex(tokCol)
    val keptIdx = inSchema.fields.indices.filterNot(_ == pidIdx)
    val outSchema = StructType(
      keptIdx.map(inSchema.fields) :+
        StructField("cum_before", LongType, nullable = false))
    parted.mapPartitions { rows =>
      // Within a partition rows arrive key-grouped and order-sorted, so
      // one running counter per key change suffices. `started` (not a
      // null-sentinel comparison) guards the first row; keys are
      // non-null by this method's contract.
      var started = false
      var curKey: String = null
      var cum = 0L
      var pid = -1
      rows.map { r =>
        if (pid < 0) pid = r.getInt(pidIdx)
        val key = r.getString(keyIdx)
        if (!started || key != curKey) {
          started = true
          curKey = key
          cum = offsetsBc.value((pid, key))
        }
        val toks = Option(r.get(tokIdx))
          .map(_.asInstanceOf[Number].longValue()).getOrElse(0L)
        val before = cum
        cum += toks
        Row.fromSeq(keptIdx.map(r.get) :+ before)
      }
    }(Encoders.row(outSchema))
  }
}
