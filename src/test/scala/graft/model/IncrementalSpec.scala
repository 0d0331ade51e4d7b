package graft.model

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Incremental materialization: each run must replace exactly the
  * partitions present in the increment and leave every other partition's
  * files untouched on disk (the 100 TB property — an hourly run writes one
  * partition, not the mart).
  */
class IncrementalSpec extends SparkSuite {

  import spark.implicits._

  private def partitionFiles(base: String, part: String): Map[String, Long] = {
    val dir = Paths.get(base, "dev_daily_inc", s"event_date=$part")
    Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .map((p: Path) => p.toString -> Files.getLastModifiedTime(p).toMillis)
      .toMap
  }

  test("incremental run overwrites only the new partitions") {
    val base = Files.createTempDirectory("graft-inc").toString
    var sourceData = Seq(
      ("2024-01-01", 1L, 10.0), ("2024-01-01", 2L, 20.0),
      ("2024-01-02", 3L, 30.0), ("2024-01-02", 4L, 40.0), ("2024-01-02", 5L, 50.0))
      .toDF("event_date", "id", "v")

    val model = SqlModel(
      "daily_inc",
      """SELECT event_date, COUNT(*) AS n,
        |  CAST(SUM(CAST(v AS DECIMAL(10,2))) AS DECIMAL(38,2)) AS sv
        |FROM {{ source('t', 'ev') }}
        |WHERE {{ incremental_filter('event_date') }}
        |GROUP BY event_date""".stripMargin,
      Materialization.IncrementalByPartition(Seq("event_date")))
    val project = Project(
      Seq(SourceDef("t", "ev", _ => sourceData)), Seq(model))
    val runner = new Runner(project, Target.dev, new PathMaterializer(base))

    runner.run(spark)
    val afterRun1 = spark.table("dev_daily_inc")
      .select("event_date", "n").as[(String, Long)].collect().toMap
    assert(afterRun1 == Map("2024-01-01" -> 2L, "2024-01-02" -> 3L))
    val day1Files = partitionFiles(base, "2024-01-01")

    // Day 3 arrives; day 1 is also RESTATED at the source, but the
    // incremental filter (event_date > max existing) excludes it — run 2
    // must only write the day-3 partition.
    sourceData = sourceData
      .filter(col("event_date") =!= "2024-01-01")
      .union(Seq(
        ("2024-01-01", 99L, 999.0),
        ("2024-01-03", 6L, 60.0), ("2024-01-03", 7L, 70.0),
        ("2024-01-03", 8L, 80.0), ("2024-01-03", 9L, 90.0))
        .toDF("event_date", "id", "v"))
    runner.run(spark)

    val afterRun2 = spark.table("dev_daily_inc")
      .select("event_date", "n").as[(String, Long)].collect().toMap
    assert(afterRun2 == Map(
      "2024-01-01" -> 2L, "2024-01-02" -> 3L, "2024-01-03" -> 4L))
    assert(partitionFiles(base, "2024-01-01") == day1Files,
      "day-1 partition files must be untouched by the incremental run")
  }

  test("incremental model works through the catalog materializer too") {
    var sourceData = Seq(("2024-02-01", 1L), ("2024-02-02", 2L))
      .toDF("event_date", "id")
    val model = SqlModel(
      "cat_inc",
      """SELECT event_date, COUNT(*) AS n FROM {{ source('t', 'ev') }}
        |WHERE {{ incremental_filter('event_date') }}
        |GROUP BY event_date""".stripMargin,
      Materialization.IncrementalByPartition(Seq("event_date")),
      customSchema = Some("inctest"))
    val project = Project(
      Seq(SourceDef("t", "ev", _ => sourceData)), Seq(model))
    val runner = new Runner(project, Target.dev, new CatalogMaterializer)
    spark.sql("DROP TABLE IF EXISTS inctest.cat_inc")

    runner.run(spark)
    sourceData = Seq(("2024-02-03", 3L), ("2024-02-03", 4L))
      .toDF("event_date", "id")
    runner.run(spark)

    val rows = spark.table("inctest.cat_inc")
      .select("event_date", "n").as[(String, Long)].collect().toMap
    assert(rows == Map(
      "2024-02-01" -> 1L, "2024-02-02" -> 1L, "2024-02-03" -> 2L))
  }
}
