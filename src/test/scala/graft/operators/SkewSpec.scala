package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

class SkewSpec extends SparkSuite {

  import spark.implicits._

  test("salted join equals plain join on skewed data, broadcast disabled") {
    // 10k rows on one hot key + a uniform tail — the shape that melts a
    // single shuffle partition at scale.
    val big = ((1 to 10000).map(i => (1L, i.toLong)) ++
      (1 to 1000).map(i => ((i % 50 + 2).toLong, (10000 + i).toLong)))
      .toDF("k", "row_id")
    val dim = (1 to 60).map(i => (i.toLong, s"v$i")).toDF("dk", "payload")

    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1") // force the shuffle path salting targets
    try {
      val salted = Skew.saltedJoin(big, dim, "k", "dk", col("row_id"), 16)
        .select("k", "row_id", "payload")
      val plain = big.join(dim, big("k") === dim("dk"))
        .select("k", "row_id", "payload")
      assert(salted.count() == plain.count())
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
      // The salted plan splits the hot key across 16 distinct salt values.
      val saltSpread = big.filter(col("k") === 1L)
        .withColumn("s", pmod(xxhash64(col("row_id")), lit(16)))
        .select("s").distinct().count()
      assert(saltSpread == 16)
    } finally spark.conf.set(key, prev)
  }
}
