package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver t1-shaped smoke: every registered query executes at sf0.001 and
  * yields a well-formed frame (distinct, non-empty column names; a row
  * count — zero is legal, e.g. the anti-join has no violations). Catches
  * a query broken by refactoring before the (slower) oracle gate runs.
  */
class SmokeSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle map refers only to registered queries") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes with a well-formed schema") {
      val df = fn(spark, dir)
      val cols = df.columns
      assert(cols.nonEmpty && cols.forall(_.nonEmpty))
      assert(cols.distinct.length == cols.length,
        s"duplicate column names: ${cols.mkString(",")}")
      // Driver-hash boundary rule (see RelationalQueries header): Spark
      // DECIMAL reaches the driver's pandas compare with full scale
      // ("184968.00") while DuckDB DECIMAL goes through float64
      // shortest-repr ("184968.0") — any trailing zero hash-mismatches.
      // No DECIMAL may leave an oracle-bearing gate; serialize to string
      // on BOTH sides. (no_oracle gates never hash-compare.)
      if (SparkEntry.oracleSql.contains(name)) {
        val decimals = df.schema.fields.filter(_.dataType
          .isInstanceOf[org.apache.spark.sql.types.DecimalType])
        assert(decimals.isEmpty,
          s"raw DECIMAL at the gate boundary: ${decimals.map(_.name).mkString(",")}")
      }
      assert(df.count() >= 0)
    }
  }
}
