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
}
