package graft.core

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuite

class JsonlIngestSpec extends SparkSuite {

  private def stageDocs(): (String, org.apache.spark.sql.DataFrame) = {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val base = Files.createTempDirectory("graft-jsonl-spec").toString
    JsonlIngest.stage(docs, s"$base/docs")
    (s"$base/docs", docs)
  }

  test("clean corpus round-trips exactly; quarantine is empty") {
    val (path, docs) = stageDocs()
    try {
      val (good, quarantine) = JsonlIngest.ingest(spark, path, docs.schema)
      assert(quarantine.count() == 0L)
      val a = good.orderBy(col("doc_id")).collect().toSeq.map(_.toSeq)
      val b = docs.orderBy(col("doc_id")).collect().toSeq.map(_.toSeq)
      assert(a.nonEmpty && a == b)
    } finally Caches.releaseAll()
  }

  test("malformed lines land whole in the quarantine; good rows survive") {
    val (path, docs) = stageDocs()
    try {
      // Three poison pills: truncated object, non-JSON garbage, and a
      // structurally-valid object whose doc_id has the wrong type (the
      // subtle one — it parses as JSON but violates the schema).
      Files.write(Paths.get(s"$path/zz-bad.json"),
        ("{\"doc_id\": 1, \"text\": \n" +
          "utter garbage\n" +
          "{\"doc_id\": \"not-a-number\", \"text\": \"x\"}\n")
          .getBytes("UTF-8"))
      val (good, quarantine) = JsonlIngest.ingest(spark, path, docs.schema)
      val qLines = quarantine.collect().map(_.getString(0)).toSeq
      assert(qLines.size == 3, s"expected 3 quarantined lines: $qLines")
      assert(qLines.exists(_.contains("utter garbage")))
      assert(qLines.exists(_.contains("not-a-number")),
        "a type-mismatched line must quarantine, not load as nulls")
      assert(good.count() == docs.count(),
        "poison pills must not drop or duplicate good rows")
    } finally Caches.releaseAll()
  }

  test("text containing newlines and quotes survives the JSONL round-trip") {
    import spark.implicits._
    val tricky = Seq(
      (1L, "line one\nline two\r\nline \"three\"", "en", "s", 30L),
      (2L, "tab\there \\ backslash", "en", "s", 20L),
      (3L, null.asInstanceOf[String], "xx", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val base = Files.createTempDirectory("graft-jsonl-tricky").toString
    JsonlIngest.stage(tricky, s"$base/t")
    try {
      val (good, quarantine) = JsonlIngest.ingest(spark, s"$base/t",
        tricky.schema)
      assert(quarantine.count() == 0L)
      val got = good.orderBy(col("doc_id")).collect().toSeq.map(_.toSeq)
      assert(got == tricky.orderBy(col("doc_id")).collect().toSeq.map(_.toSeq))
    } finally Caches.releaseAll()
  }
}
