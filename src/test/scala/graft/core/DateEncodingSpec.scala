package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Second front of the source-layout contract (the first is events.ts —
  * EventsLayoutSpec): `o_orderdate` / `l_shipdate` currently ship as
  * timestamp[us], but they are calendar dates and a future testdata
  * regeneration could plausibly flip them to parquet DATE. The relational
  * tier must produce IDENTICAL results either way — Spark coerces
  * date-vs-timestamp comparisons (a DATE column against the queries'
  * TIMESTAMP literals), and the midnight-aligned values make the
  * coercion exact. This spec stages both encodings and demands equality
  * on the two date-heaviest gates (q01 pricing summary's shipdate
  * filter; q32's correlated-subquery orderdate range), so the drift
  * costs nothing — and SchemaCanary's `dateish` family already admits
  * both, so the canary stays quiet instead of crying wolf.
  */
class DateEncodingSpec extends SparkSuite {

  /** Stage lineitem + orders (all the two gates read) with the date
    * columns either passed through (timestamp[us]) or cast to DATE. */
  private def stage(asDate: Boolean): String = {
    val dir = Files.createTempDirectory(
      if (asDate) "graft-dates-date" else "graft-dates-ts").toString
    val li = spark.read.parquet(sf("lineitem.parquet"))
    val ord = spark.read.parquet(sf("orders.parquet"))
    (if (asDate) li.withColumn("l_shipdate", col("l_shipdate").cast("date"))
     else li)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    (if (asDate) ord.withColumn("o_orderdate", col("o_orderdate").cast("date"))
     else ord)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  private def run(name: String, dir: String): Seq[Seq[Any]] = {
    val q = graft.operators.RelationalQueries.queries
      .find(_.name == name).get
    try q.fn(spark, dir).collect().toSeq.map(_.toSeq)
    finally Caches.releaseAll()
  }

  test("midnight-aligned DATE vs timestamp[us] date columns yield " +
      "identical relational results") {
    val tsDir = stage(asDate = false)
    val dateDir = stage(asDate = true)
    for (gate <- Seq("q01_pricing_summary", "q32_exists_correlated")) {
      val a = run(gate, tsDir)
      val b = run(gate, dateDir)
      assert(a.nonEmpty, s"$gate returned no rows")
      assert(a == b, s"$gate diverged between date encodings")
    }
  }

  test("schema canary admits both date encodings") {
    val dateDir = stage(asDate = true)
    // Canary over a partial dir reports the other tables unreadable but
    // must NOT flag the re-encoded date columns.
    val ps = SchemaCanary.problems(spark, dateDir)
    assert(!ps.exists(p => p.contains("o_orderdate") ||
      p.contains("l_shipdate")), s"canary cried wolf on DATE: $ps")
  }
}
