package graft.model

import java.io.File

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** OPTIMIZE / small-file compaction ([[Runner.optimizeModels]]): file
  * count collapses to the byte-sized target, content is untouched, and
  * the rewrite rides the atomic replace (old version retained). */
class OptimizeSpec extends SparkSuite {

  import spark.implicits._

  private val mat = new CatalogMaterializer
  private def parquetFiles(schema: String, prefix: String): Seq[File] = {
    val db = new File(s"/tmp/graft-test-warehouse/$schema.db")
    Option(db.listFiles).getOrElse(Array.empty)
      .filter(_.getName.startsWith(prefix)).toSeq
      .flatMap(d => Option(d.listFiles).getOrElse(Array.empty))
      .filter(_.getName.endsWith(".parquet"))
  }

  test("optimize compacts a many-file table without changing content") {
    val src = spark.range(10000).select(col("id"), (col("id") * 3).as("v"))
    val project = Project(
      Seq(SourceDef("t", "ev", _ => src)),
      Seq(SqlModel("opt_m", "SELECT * FROM {{ source('t', 'ev') }}",
        Materialization.Table)))
    val runner = new Runner(project, Target.dev, mat)
    mat.dropRelation(spark, "dev.opt_m") // stale state from prior runs
    // The table sink now REBALANCES on write (round-17 sizing), so a
    // plain build cannot produce the accreted small-files shape any
    // more; fragment via the writer's per-file record cap instead —
    // the layout a long-lived mart still degrades into through means
    // the write-side sizing cannot see (many small appends, schema
    // migrations, external writers).
    spark.conf.set("spark.sql.files.maxRecordsPerFile", 300)
    try runner.run(spark)
    finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    val before = parquetFiles("dev", "opt_m__v")
    assert(before.size >= 32)
    val checksum = spark.table("dev.opt_m")
      .agg(sum(col("id") + col("v"))).head.getLong(0)

    val results = runner.optimizeModels(spark, Some("opt_m"))
    assert(results.map(r => (r.name, r.status)) ==
      Seq(("opt_m", "success")))
    val byDir = parquetFiles("dev", "opt_m__v")
      .groupBy(_.getParentFile.getName)
    assert(byDir.size == 2, // current + retained predecessor (atomic swap)
      s"expected current+predecessor versions, saw ${byDir.keys}")
    // 10k-row table is far below 128 MB: one file, exactly; the
    // predecessor keeps the old many-file layout for in-flight readers.
    val currentFiles = byDir.maxBy(_._1)._2
    assert(currentFiles.size == 1,
      s"10k rows must compact to one file, saw ${currentFiles.size}")
    assert(byDir.minBy(_._1)._2.size == before.size)
    assert(spark.table("dev.opt_m").count() == 10000)
    assert(spark.table("dev.opt_m")
      .agg(sum(col("id") + col("v"))).head.getLong(0) == checksum)
    mat.dropRelation(spark, "dev.opt_m")
  }

  test("a tiny byte target splits into multiple files") {
    val src = spark.range(50000).select(col("id"))
    val project = Project(
      Seq(SourceDef("t", "ev", _ => src)),
      Seq(SqlModel("opt_s", "SELECT * FROM {{ source('t', 'ev') }}",
        Materialization.Table)))
    val runner = new Runner(project, Target.dev, mat)
    mat.dropRelation(spark, "dev.opt_s") // stale state from prior runs
    runner.run(spark)
    runner.optimizeModels(spark, Some("opt_s"), targetBytes = 64 << 10)
    val byDir = parquetFiles("dev", "opt_s__v")
      .groupBy(_.getParentFile.getName)
    assert(byDir(byDir.keys.max).size > 1,
      "a sub-table byte target must produce multiple output files")
    assert(spark.table("dev.opt_s").count() == 50000)
    mat.dropRelation(spark, "dev.opt_s")
  }
}
