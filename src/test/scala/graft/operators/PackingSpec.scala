package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSuite

class PackingSpec extends SparkSuite {

  test("distributed prefix sum equals the naive global window") {
    import spark.implicits._
    // Token counts chosen so packs straddle partition boundaries.
    val docs = (1 to 500).map(i => (i.toLong, (i * 37 % 190) + 1))
      .toDF("doc_id", "toks")
      .repartition(7) // scrambled input partitioning
    val got = Packing.packAssignments(docs, "doc_id", "toks", 256)
      .select("doc_id", "cum_tokens", "pack_id")
    val naive = docs
      .withColumn("cum_tokens",
        sum(col("toks").cast("long")).over(Window.orderBy("doc_id")))
      .withColumn("pack_id",
        ((col("cum_tokens") - col("toks")).cast("decimal(38,0)") / 256L)
          .cast("long"))
      .select("doc_id", "cum_tokens", "pack_id")
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
    graft.core.Caches.releaseAll()
  }

  test("packing is deterministic across re-runs and repartitioning") {
    import spark.implicits._
    val docs = (1 to 300).map(i => (i.toLong, (i * 13 % 97) + 1))
      .toDF("doc_id", "toks")
    def run(parts: Int) =
      Packing.packAssignments(docs.repartition(parts), "doc_id", "toks", 128)
        .select("doc_id", "pack_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val a = run(3)
    assert(a == run(11)) // partition count never changes assignments
    assert(a == run(3))
    // Every pack holds a contiguous doc_id range.
    val byPack = a.groupBy(_._2).values
    assert(byPack.forall { g =>
      val ids = g.map(_._1).sorted
      ids.last - ids.head + 1 == ids.size
    })
    graft.core.Caches.releaseAll()
  }

  test("keyed prefix sum equals the per-key window; partition-invariant") {
    import spark.implicits._
    // Keys of very different sizes (the skew case the two-phase form
    // exists for) plus a key whose rows straddle many partitions.
    val docs = (1 to 400).map { i =>
      val key = if (i % 7 == 0) "small" else if (i % 2 == 0) "big" else "mid"
      (i.toLong, key, (i * 31 % 113) + 1)
    }.toDF("doc_id", "src", "toks")
    def run(parts: Int) =
      Packing.keyedCumSum(docs.repartition(parts), "src", "doc_id", "toks")
        .select("doc_id", "src", "cum_before").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val got = run(5)
    assert(got == run(13)) // partition count never changes the sums
    val naive = docs
      .withColumn("cum_before",
        coalesce(sum(col("toks").cast("long")).over(
          Window.partitionBy("src").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("doc_id", "src", "cum_before").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == naive)
    graft.core.Caches.releaseAll()
  }

  test("keyed prefix sum plans without a Window (no single-task keys)") {
    import spark.implicits._
    val docs = (1 to 50).map(i => (i.toLong, s"k${i % 3}", i))
      .toDF("doc_id", "src", "toks")
    val plan = Packing.keyedCumSum(docs, "src", "doc_id", "toks")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"keyedCumSum must not fall back to a per-key window:\n$plan")
    graft.core.Caches.releaseAll()
  }
}
