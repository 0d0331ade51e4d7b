package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The reference's ingestion path (SURVEY S1): headerless CSV staged on
  * object storage, loaded positionally against an explicit DDL schema
  * (`COPY INTO` maps CSV columns to table columns by position —
  * setup/setup_data.sql:144-173; file format setup/setup.sql:59-65).
  *
  * Spark mapping: `spark.read.csv` with `header=false` and an explicit
  * `StructType` — column BINDING IS POSITIONAL, never inferred, exactly
  * like `COPY INTO`. `FAILFAST` surfaces malformed rows at load time the
  * way Snowflake's default `ON_ERROR=ABORT_STATEMENT` does. At 100 TB the
  * same call reads a directory of thousands of CSV parts in parallel (one
  * task per split); the immediate `write.parquet` materialization mirrors
  * the reference's CSV→typed-table hop and moves all downstream reads onto
  * columnar storage with pushdown.
  */
object CsvIngest {

  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** Stage a frame as headerless CSV (the reference's source format). */
  def stage(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "false")
      .option("timestampNTZFormat", TsFmt)
      .option("timestampFormat", TsFmt)
      .csv(path)

  /** Positional typed load of headerless CSV — SURVEY S1's `COPY INTO`. */
  def load(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "false")
      .option("mode", "FAILFAST")
      .option("timestampNTZFormat", TsFmt)
      .option("timestampFormat", TsFmt)
      .schema(schema)
      .csv(path)

  /** The full reference hop: CSV stage → typed load → parquet table. */
  def ingestToParquet(spark: SparkSession, csvPath: String,
      schema: StructType, tablePath: String): DataFrame = {
    load(spark, csvPath, schema).write.mode("overwrite").parquet(tablePath)
    spark.read.parquet(tablePath)
  }
}
