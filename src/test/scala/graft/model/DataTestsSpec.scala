package graft.model


import graft.SparkSuite

class DataTestsSpec extends SparkSuite {

  import spark.implicits._

  private def resolver(m: Map[String, org.apache.spark.sql.DataFrame]) =
    (r: String) => m(r)

  test("NotNull flags null rows only") {
    val df = Seq(Some(1L), None, Some(3L)).toDF("k")
    val v = NotNull("t", "k").violations(resolver(Map("t" -> df)))
    assert(v.count() == 1)
  }

  test("Unique flags duplicated keys, ignores nulls") {
    val df = Seq(Some(1L), Some(1L), Some(2L), None, None).toDF("k")
    val v = Unique("t", "k").violations(resolver(Map("t" -> df)))
    assert(v.count() == 1) // only k=1 is a duplicated non-null key
  }

  test("Relationships flags orphaned non-null children") {
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val v = Relationships("c", "fk", "p", "pk")
      .violations(resolver(Map("c" -> child, "p" -> parent)))
    assert(v.count() == 1)
    assert(v.select("fk").as[Long].collect().toSeq == Seq(99L))
  }

  test("AcceptedRange honors inclusive bounds") {
    val df = Seq(0.5, 1.0, 25.0, 50.0, 50.5).toDF("x")
    val incl = AcceptedRange("t", "x", 1, 50, inclusive = true)
      .violations(resolver(Map("t" -> df)))
    assert(incl.count() == 2) // 0.5 and 50.5
    val excl = AcceptedRange("t", "x", 1, 50, inclusive = false)
      .violations(resolver(Map("t" -> df)))
    assert(excl.count() == 4) // boundary values now violate too
  }

  test("ExpressionIsTrue: false rows violate, null rows pass") {
    val df = Seq(Some(5.0), Some(-1.0), None).toDF("x")
    val v = ExpressionIsTrue("t", "x >= 0", "nonneg")
      .violations(resolver(Map("t" -> df)))
    assert(v.count() == 1)
  }

  test("WithConfig: severity routes failures; store_failures materializes " +
      "the violating rows") {
    val dupes = Seq(1L, 1L, 2L).toDF("k")
    val warn = WithConfig(Unique("t", "k"), severity = "warn",
      storeFailures = true)
    // Delegation: same id, same violations as the wrapped test.
    assert(warn.id == "unique__t__k")
    assert(warn.violations(resolver(Map("t" -> dupes))).count() == 1)
    intercept[IllegalArgumentException](
      WithConfig(Unique("t", "k"), severity = "fatal"))

    // Runner surfaces: severity map + failure materialization.
    val base = java.nio.file.Files.createTempDirectory("graft-tfail").toString
    val r = new Runner(
      Project(Seq(SourceDef("fx", "t", _ => dupes)),
        Seq(SqlModel("m", "SELECT * FROM {{ source('fx', 't') }}")),
        tests = Seq(WithConfig(Unique("fx.t", "k"), severity = "warn",
          storeFailures = true),
          NotNull("fx.t", "k"))),
      Target.dev, new PathMaterializer(base))
    assert(r.testSeverity == Map(
      "unique__fx.t__k" -> "warn", "not_null__fx.t__k" -> "error"))
    val stored = r.storeFailures(spark)
    assert(stored == Seq("dev_unique__fx_t__k__failures"))
    // The audit relation holds the duplicated key with its count.
    val rows = spark.table(stored.head).collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 1L)
  }

  test("IsPositiveAmount coerces dirty string columns like the reference") {
    // city_population is VARCHAR in the reference DDL yet carries this
    // numeric test (__sources.yml:32-35) — try_cast makes that lenient.
    val df = Seq("100", "-3", "0", "not-a-number", null)
      .toDF("city_population")
    val v = IsPositiveAmount("t", "city_population")
      .violations(resolver(Map("t" -> df)))
    assert(v.count() == 2) // "-3" and "0"; garbage + null pass
  }
}
