package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.core.Tables

class BucketingSpec extends SparkSuite {

  test("bucketed join is shuffle-free and matches the unbucketed result") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("CREATE DATABASE IF NOT EXISTS buck")
    Seq("buck.li_b", "buck.ord_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") +
          s"/buck.db/${t.split('.')(1)}")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    Bucketing.writeBucketed(
      Tables(spark, dir, "lineitem").select("l_orderkey", "l_quantity"),
      "buck.li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(
      Tables(spark, dir, "orders").select("o_orderkey", "o_totalprice"),
      "buck.ord_b", "o_orderkey", 8)

    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1") // force the sort-merge path bucketing serves
    try {
      val joined = spark.table("buck.li_b").join(spark.table("buck.ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")

      val expected = Tables(spark, dir, "lineitem")
        .join(Tables(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set(key, prev)
  }
}
