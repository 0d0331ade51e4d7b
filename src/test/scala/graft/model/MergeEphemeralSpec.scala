package graft.model

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** IncrementalByKey (delete+insert merge) and Ephemeral (CTE inlining)
  * materializations. */
class MergeEphemeralSpec extends SparkSuite {

  import spark.implicits._

  test("incremental merge replaces shared keys and keeps the rest") {
    val base = Files.createTempDirectory("graft-merge").toString
    var sourceData = Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 1))
      .toDF("id", "payload", "batch")
    val model = SqlModel(
      "merged",
      "SELECT id, payload, batch FROM {{ source('t', 'ev') }}",
      Materialization.IncrementalByKey(Seq("id")))
    val runner = new Runner(
      Project(Seq(SourceDef("t", "ev", _ => sourceData)), Seq(model)),
      Target.dev, new PathMaterializer(base))

    runner.run(spark)
    // Second batch: key 2 updated, key 4 new, keys 1/3 absent (must survive).
    sourceData = Seq((2L, "B2", 2), (4L, "d", 2))
      .toDF("id", "payload", "batch")
    runner.run(spark)

    val rows = spark.table("dev_merged")
      .select("id", "payload", "batch")
      .as[(Long, String, Int)].collect().toSet
    assert(rows == Set(
      (1L, "a", 1), (2L, "B2", 2), (3L, "c", 1), (4L, "d", 2)))
  }

  test("ephemeral chain inlines as CTEs; nothing is materialized") {
    val base = Files.createTempDirectory("graft-eph").toString
    val src = Seq((1L, 10), (2L, 20), (3L, 30), (4L, 40)).toDF("id", "v")
    val eph1 = SqlModel("eph_base",
      "SELECT id, v * 2 AS v2 FROM {{ source('t', 'ev') }}",
      Materialization.Ephemeral)
    val eph2 = SqlModel("eph_even",
      "SELECT * FROM {{ ref('eph_base') }} WHERE id % 2 = 0",
      Materialization.Ephemeral)
    // Mart body has its own WITH — the inliner must merge CTE lists.
    val mart = SqlModel("eph_mart",
      """WITH agg AS (
        |  SELECT SUM(v2) AS total FROM {{ ref('eph_even') }})
        |SELECT total FROM agg""".stripMargin,
      Materialization.Table)
    val runner = new Runner(
      Project(Seq(SourceDef("t", "ev", _ => src)), Seq(eph1, eph2, mart)),
      Target.dev, new PathMaterializer(base))
    val results = runner.run(spark)

    assert(results.map(_.name) == Seq("eph_mart"),
      "ephemeral nodes must not appear as executed nodes")
    assert(spark.table("dev_eph_mart").as[Long].collect().toSeq == Seq(120L))
    assert(!new java.io.File(s"$base/dev_eph_base").exists())
    assert(!new java.io.File(s"$base/dev_eph_even").exists())
    // compileSql shows the composed plan for the consumer.
    val compiled = runner.compileSql(mart)
    assert(compiled.contains("__cte__eph_base AS")
      && compiled.contains("__cte__eph_even AS"))
  }

  test("code models receive ephemeral refs as built DataFrames") {
    val base = Files.createTempDirectory("graft-ephdf").toString
    val src = Seq((1L, 5), (2L, 6)).toDF("id", "v")
    val eph = SqlModel("eph_src",
      "SELECT id, v + 1 AS v FROM {{ source('t', 'ev') }}",
      Materialization.Ephemeral)
    val code = DfModel("code_mart", Seq("eph_src"),
      (_, ref) => ref("eph_src").agg(sum("v").as("sv")))
    val runner = new Runner(
      Project(Seq(SourceDef("t", "ev", _ => src)), Seq(eph, code)),
      Target.dev, new PathMaterializer(base))
    runner.run(spark)
    assert(spark.table("dev_code_mart").as[Long].collect().toSeq == Seq(13L))
  }

  test("failure skip sees through ephemeral hops") {
    val base = Files.createTempDirectory("graft-ephskip").toString
    val src = Seq((1L, 1)).toDF("id", "v")
    val broken = SqlModel("broken",
      "SELECT no_such_column FROM {{ source('t', 'ev') }}",
      Materialization.Table)
    val eph = SqlModel("eph_mid",
      "SELECT * FROM {{ ref('broken') }}", Materialization.Ephemeral)
    val down = SqlModel("downstream",
      "SELECT COUNT(*) AS n FROM {{ ref('eph_mid') }}",
      Materialization.Table)
    val runner = new Runner(
      Project(Seq(SourceDef("t", "ev", _ => src)), Seq(broken, eph, down)),
      Target.dev, new PathMaterializer(base))
    val rr = s"$base/run_results.json"
    val e = intercept[RuntimeException] {
      runner.run(spark, runResultsPath = Some(rr))
    }
    assert(e.getMessage.contains("broken"))
    val artifact = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(rr)))
    // downstream is skipped (not errored): the edge through the ephemeral
    // hop must count as a real dependency on the broken model.
    assert(artifact.contains(""""name":"downstream","relation":"dev_downstream","status":"skipped""""))
    assert(!new java.io.File(s"$base/dev_downstream").exists())
  }
}
