package graft.model

import java.io.File

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** dbt `clone` with Snowflake zero-copy semantics
  * ([[CatalogMaterializer.cloneRelation]]): the clone is a pointer
  * commit — no data files are read or written — and isolation is
  * copy-on-write in both directions (target rebuilds diverge, source
  * refreshes don't follow into the clone).
  */
class CloneSpec extends SparkSuite {

  import spark.implicits._

  private val mat = new CatalogMaterializer
  private def db(schema: String) =
    new File(s"/tmp/graft-test-warehouse/$schema.db")
  private def versionDirs(schema: String, name: String): Seq[File] =
    Option(db(schema).listFiles).getOrElse(Array.empty)
      .filter(_.getName.startsWith(s"${name}__v")).toSeq

  private var data: DataFrame = _
  private def project = Project(
    Seq(SourceDef("t", "ev", _ => data)),
    Seq(SqlModel("cl_m", "SELECT * FROM {{ source('t', 'ev') }}",
      Materialization.Table)))

  test("clone is a pointer commit: zero data files in the target schema") {
    data = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    new Runner(project, Target.prod, mat).run(spark)
    val results = new Runner(project, Target.dev, mat)
      .cloneModels(spark, None, Target.prod)
    assert(results.map(r => (r.name, r.status)) == Seq(("cl_m", "success")))
    assert(spark.table("dev.cl_m").count() == 2)
    assert(versionDirs("dev", "cl_m").isEmpty,
      "a zero-copy clone must not write any version directory")
    val pointer = new File(db("dev"), "cl_m__CURRENT")
    assert(pointer.exists)
    assert(java.nio.file.Files.readString(pointer.toPath)
      .linesIterator.next().contains("prod.db"),
      "the clone's pointer must name the source's version directory")
  }

  test("a source refresh does not follow into the clone (snapshot)") {
    data = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    new Runner(project, Target.prod, mat).run(spark)
    assert(spark.table("prod.cl_m").count() == 3)
    // The clone still reads the version it was committed against (the
    // source's retention keeps the predecessor alive).
    assert(spark.table("dev.cl_m").count() == 2)
  }

  test("a clone rebuild diverges without touching the source") {
    data = Seq((9L, "z")).toDF("id", "v")
    new Runner(project, Target.dev, mat).run(spark)
    assert(spark.table("dev.cl_m").count() == 1)
    assert(versionDirs("dev", "cl_m").nonEmpty,
      "the rebuild writes the target's OWN version directory")
    assert(spark.table("prod.cl_m").count() == 3,
      "the source must not observe the clone's rebuild")
    mat.dropRelation(spark, "dev.cl_m")
    mat.dropRelation(spark, "prod.cl_m")
  }

  test("clone of a partitioned incremental preserves layout and writes") {
    var src = Seq(("2024-01-01", 1L), ("2024-01-02", 2L))
      .toDF("event_date", "id")
    val model = SqlModel("cl_inc",
      """SELECT event_date, id FROM {{ source('t', 'ev') }}
        |WHERE {{ incremental_filter('event_date') }}""".stripMargin,
      Materialization.IncrementalByPartition(Seq("event_date")))
    val p = Project(Seq(SourceDef("t", "ev", _ => src)), Seq(model))
    new Runner(p, Target.prod, mat).run(spark)
    val dev = new Runner(p, Target.dev, mat)
    dev.cloneModels(spark, None, Target.prod)
    assert(spark.table("dev.cl_inc").count() == 2)
    // An increment on the CLONE must ADD day 3 and keep days 1-2 — an
    // unpartitioned deep copy would be truncated to just the increment
    // by dynamic partition overwrite.
    src = Seq(("2024-01-03", 3L)).toDF("event_date", "id")
    dev.run(spark)
    assert(spark.table("dev.cl_inc").select("event_date")
      .distinct().count() == 3)
    assert(spark.table("prod.cl_inc").count() == 2,
      "the source must not observe the clone's increment")
    mat.dropRelation(spark, "dev.cl_inc")
    mat.dropRelation(spark, "prod.cl_inc")
  }

  test("clone refuses a source target equal to the destination") {
    data = Seq((1L, "a")).toDF("id", "v")
    intercept[IllegalArgumentException] {
      new Runner(project, Target.dev, mat)
        .cloneModels(spark, None, Target.dev)
    }
  }
}
