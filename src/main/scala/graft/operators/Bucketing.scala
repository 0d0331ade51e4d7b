package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the zero-shuffle path for repeated
  * fact-fact joins at scale. Writing both sides `bucketBy(n, key)` +
  * `sortBy(key)` pins an identical hash-partitioning AND sort order into
  * the table layout, so every later equi-join on that key needs no
  * Exchange and no Sort (verified by BucketingSpec on the physical plan).
  * At 100 TB this converts the recurring orders⋈lineitem shuffle —
  * typically the single largest network cost of a daily pipeline — into a
  * map-side merge per bucket pair. Bucket count is a layout decision:
  * rows-per-bucket should fit an executor's memory comfortably; both
  * sides must use the same count (Spark joins only equal bucket counts
  * without re-shuffling one side).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    // A previous PROCESS may have left the managed location on disk while
    // the in-memory catalog forgot the table; saveAsTable then fails with
    // LOCATION_ALREADY_EXISTS (same failure mode handled by
    // CatalogMaterializer.clearStaleLocation).
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // Resolve the REAL managed location through the catalog — a naive
    // `<warehouse>/<table>` is wrong outside the default database (the
    // managed path is `<warehouse>/<db>.db/<name>`) and for qualified
    // names would delete an unrelated path.
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
