package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** SURVEY S1: positional headerless CSV load round-trips the typed tables
  * byte-for-byte (schema AND values), including timestamps and doubles.
  */
class CsvIngestSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def roundTrip(table: String): Unit = {
    val src = Tables(spark, dir, table)
    val base = Files.createTempDirectory(s"graft-csv-$table").toString
    CsvIngest.stage(src, s"$base/csv")
    val loaded = CsvIngest.ingestToParquet(
      spark, s"$base/csv", src.schema, s"$base/parquet")
    assert(loaded.schema == src.schema, s"$table schema drifted")
    val cols = src.columns.map(col).toIndexedSeq
    assert(loaded.orderBy(cols: _*).collect().toSeq ==
      src.orderBy(cols: _*).collect().toSeq, s"$table values drifted")
  }

  test("nation round-trips (strings + keys)") { roundTrip("nation") }
  test("orders round-trips (timestamps + doubles)") { roundTrip("orders") }
  test("lineitem round-trips at full width") { roundTrip("lineitem") }
}
