package graft.operators

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.Tables

/** The takedown contract of [[StoreRetention]]: deletes rewrite ONLY
  * the partitions containing victims, drop partitions they empty, are
  * idempotent, and leave the store indistinguishable from one that
  * never ingested the victims (so future increments stay correct).
  */
class StoreRetentionSpec extends SparkSuite {

  private val T = 0.6
  private def docs: DataFrame =
    Tables(spark, "/root/testdata/sf0.001", "documents")

  /** partition dir → part-file name set, from the relation's location. */
  private def partFiles(rel: String): Map[String, Set[String]] = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    val Array(schema, name) = rel.split('.')
    val loc = new File(new java.net.URI(spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(name, Some(schema))).location
      .toString))
    loc.listFiles().filter(f => f.isDirectory && f.getName.contains("="))
      .map(d => d.getName ->
        d.listFiles().map(_.getName).filter(_.startsWith("part-")).toSet)
      .toMap
  }

  test("delete rewrites only the partitions containing victims") {
    val store = DedupStore("retention_spec")
    DedupStore.reset(spark, store)
    DedupStore.build(spark, docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", T, store)
    DedupStore.appendBatch(spark, docs.filter(col("doc_id") % 3 === 1),
      "doc_id", "text", T, store, "b1")
    DedupStore.appendBatch(spark, docs.filter(col("doc_id") % 3 === 2),
      "doc_id", "text", T, store, "b2")
    val before = partFiles(store.shinglesRel)
    // Victims live ONLY in b1 (doc_id % 3 == 1).
    val victims = docs.filter(col("doc_id") % 3 === 1 &&
      col("doc_id") % 5 === 0).select(col("doc_id"))
    val nVictims = victims.count()
    assert(nVictims > 0)
    val stats = StoreRetention.deleteDocs(spark, store, victims)
    val sh = stats.head
    assert(sh.relation == store.shinglesRel)
    // <= not ==: a victim under 3 words never had a shingle row.
    assert(sh.affected == Seq("b1") && sh.rowsDeleted > 0 &&
      sh.rowsDeleted <= nVictims, sh.toString)
    val after = partFiles(store.shinglesRel)
    assert(after("batch_id=base") == before("batch_id=base"),
      "untouched partition was rewritten")
    assert(after("batch_id=b2") == before("batch_id=b2"),
      "untouched partition was rewritten")
    assert(after("batch_id=b1") != before("batch_id=b1"))
    // No victim remains anywhere in the store.
    Seq(store.shinglesRel, store.bucketsRel).foreach { rel =>
      assert(spark.table(rel).join(victims, Seq("doc_id"), "left_semi")
        .count() == 0, s"victims survive in $rel")
    }
    assert(DedupStore.allPairs(spark, store)
      .join(victims, col("doc_a") === col("doc_id") ||
        col("doc_b") === col("doc_id"), "left_semi").count() == 0)
    // Idempotent: same victims again → nothing affected, files stable.
    val again = StoreRetention.deleteDocs(spark, store, victims)
    assert(again.forall(s => s.affected.isEmpty && s.rowsDeleted == 0))
    assert(partFiles(store.shinglesRel) == after)
    DedupStore.reset(spark, store)
  }

  test("a partition emptied by the delete is dropped, not retained") {
    val store = DedupStore("retention_spec2")
    DedupStore.reset(spark, store)
    DedupStore.build(spark, docs.filter(col("doc_id") % 3 =!= 1),
      "doc_id", "text", T, store)
    DedupStore.appendBatch(spark, docs.filter(col("doc_id") % 3 === 1),
      "doc_id", "text", T, store, "doomed")
    // Delete the ENTIRE doomed batch: dynamic overwrite with an empty
    // frame would touch nothing — the drop path must fire.
    val stats = StoreRetention.deleteDocs(spark, store,
      docs.filter(col("doc_id") % 3 === 1).select(col("doc_id")))
    assert(stats.head.dropped == Seq("doomed"), stats.head.toString)
    assert(StoreCompaction.batchIds(spark, store.shinglesRel) ==
      Seq("base"))
    // The survivors equal a store that never saw the doomed batch.
    val oneShot = Dedup.minhashLshPairs(
      docs.filter(col("doc_id") % 3 =!= 1), "doc_id", "text", T)
      .select(col("doc_a"), col("doc_b")).collect().map(_.toSeq).toSet
    assert(DedupStore.allPairs(spark, store)
      .select(col("doc_a"), col("doc_b")).collect().map(_.toSeq).toSet
      == oneShot)
    DedupStore.reset(spark, store)
  }

  test("post-delete increments dedupe against the surviving store only") {
    val store = DedupStore("retention_spec3")
    DedupStore.reset(spark, store)
    DedupStore.build(spark, docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", T, store)
    DedupStore.appendBatch(spark, docs.filter(col("doc_id") % 3 === 1),
      "doc_id", "text", T, store, "b1")
    val victims = docs.filter(col("doc_id") % 10 === 7)
      .select(col("doc_id"))
    StoreRetention.deleteDocs(spark, store, victims)
    DedupStore.appendBatch(spark, docs.filter(col("doc_id") % 3 === 2),
      "doc_id", "text", T, store, "b2")
    val expected = Dedup.minhashLshPairs(
      docs.filter(col("doc_id") % 10 =!= 7 ||
        col("doc_id") % 3 === 2), "doc_id", "text", T)
      .select(col("doc_a"), col("doc_b")).collect().map(_.toSeq).toSet
    assert(DedupStore.allPairs(spark, store)
      .select(col("doc_a"), col("doc_b")).collect().map(_.toSeq).toSet
      == expected)
    DedupStore.reset(spark, store)
  }
}
