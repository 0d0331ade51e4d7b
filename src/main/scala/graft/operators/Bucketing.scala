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
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
