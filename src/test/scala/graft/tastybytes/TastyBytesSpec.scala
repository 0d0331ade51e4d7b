package graft.tastybytes

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.model._

/** End-to-end port validation: the 11 reference models run through the
  * engine on the deterministic fixtures, semantics pinned per model, and
  * the full declared test suite passes (plus fails when it should).
  */
class TastyBytesSpec extends SparkSuite {

  private lazy val runner = {
    val r = TastyBytesProject.runner()
    r.run(spark)
    r
  }

  test("reference ingestion path: all 8 raw tables round-trip through CSV") {
    // setup/setup_data.sql:144-173 loads positional headerless CSV into
    // the typed raw tables; same hop here, including the dirty VARCHAR
    // numeric columns, DATE, TIME-as-string, and the VARIANT JSON column.
    val base = java.nio.file.Files.createTempDirectory("tb-csv").toString
    graft.tastybytes.FixtureGen.all.foreach { case (t, gen) =>
      val src = gen(spark)
      graft.core.CsvIngest.stage(src, s"$base/$t/csv")
      val loaded = graft.core.CsvIngest.ingestToParquet(
        spark, s"$base/$t/csv", src.schema, s"$base/$t/parquet")
      // CSV loads are always nullable; compare modulo nullability.
      def norm(s: org.apache.spark.sql.types.StructType) =
        s.fields.map(f => (f.name, f.dataType)).toSeq
      assert(norm(loaded.schema) == norm(src.schema), s"$t schema drifted")
      val cols = src.columns.map(org.apache.spark.sql.functions.col)
        .toIndexedSeq
      assert(loaded.orderBy(cols: _*).collect().toSeq ==
        src.orderBy(cols: _*).collect().toSeq, s"$t values drifted")
    }
  }

  test("full DAG: 8 staging views + 3 marts materialize") {
    val results = runner.run(spark)
    assert(results.size == 11)
    assert(results.forall(_.status == "success"))
  }

  test("orders mart: inner joins preserve all detail rows; left join keeps anonymous orders") {
    val orders = runner.table(spark, "orders")
    assert(orders.count() == 250) // every order_detail row survives
    assert(orders.columns.length == 33)
    // anonymous orders (NULL customer_id in header) keep NULL loyalty cols
    val anon = orders.filter(col("customer_id").isNull)
    assert(anon.count() > 0)
    assert(anon.filter(col("e_mail").isNotNull).count() == 0)
    // franchisee aliasing from orders.sql:14-15
    assert(orders.columns.contains("franchisee_first_name"))
  }

  test("customer_loyalty_metrics: decimal SUM and distinct location arrays") {
    val m = runner.table(spark, "customer_loyalty_metrics")
    // expected from raw fixtures, computed independently
    val oh = FixtureGen.orderHeader(spark)
    val expected = oh.filter(col("customer_id") === 2)
      .agg(sum(col("order_total")).as("s"),
        countDistinct(col("location_id")).as("d"))
      .collect()(0)
    val got = m.filter(col("customer_id") === 2).collect()(0)
    assert(got.getAs[java.math.BigDecimal]("total_sales") ==
      expected.getAs[java.math.BigDecimal]("s"))
    // The fixture MUST give this customer several distinct locations —
    // with a single-location fixture (the old location modulus divided
    // the customer modulus) every array is a singleton and the DISTINCT
    // aggregation path is never actually exercised.
    assert(expected.getAs[Long]("d") > 1,
      "fixture regression: customer 2 visits only one location")
    assert(got.getAs[Seq[Long]]("visited_location_ids_array").toSet.size ==
      expected.getAs[Long]("d").toInt)
    // only customers with orders appear (inner join)
    assert(m.count() ==
      oh.filter(col("customer_id").isNotNull)
        .select("customer_id").distinct().count())
  }

  test("sales_metrics_by_location: truck counts, sums, coalesce-to-0, description") {
    val m = runner.table(spark, "sales_metrics_by_location")
    assert(m.count() > 0)
    // coalesce path: at least one location whose city has trucks but no
    // orders reports 0 sales (fixtures keep locations 14-20 order-free —
    // orders hit locations 1-13 only, see FixtureGen.orderHeader)
    assert(m.filter(col("total_sales") === 0).count() > 0)
    val r = m.filter(col("total_sales") === 0).collect()(0)
    assert(r.getAs[String]("location_description") ==
      s"${r.getAs[String]("city")} (Trucks: ${r.getAs[Long]("truck_count")})")
    // many-to-many city join: truck_count can exceed physical trucks/city
    assert(m.agg(max(col("truck_count"))).collect()(0).getLong(0) >= 1)
  }

  test("declared source test suite passes on clean fixtures") {
    val report = runner.testReport(spark).collect()
    assert(report.length == TastyBytesProject.tests.size)
    val failing = report.filter(_.getLong(1) != 0L)
    assert(failing.isEmpty,
      s"failing: ${failing.map(_.getString(0)).mkString(", ")}")
  }

  test("tests catch violations when fixtures are corrupted") {
    import scala.jdk.CollectionConverters._
    // orphan order_detail row (bad order_id) + negative quantity
    val bad = spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(9999L, 9999L, 1L, null, 1L, -2L,
        new java.math.BigDecimal("2.0000"),
        new java.math.BigDecimal("4.0000"), "0.0000")).asJava,
      Schemas.orderDetail)
    val corrupted = Project(
      TastyBytesProject.sources.map { sd =>
        if (sd.table == "order_detail")
          sd.copy(load = s => sd.load(s).union(bad))
        else sd
      },
      TastyBytesProject.staging,
      TastyBytesProject.tests)
    val r = new Runner(corrupted, Target.dev,
      new PathMaterializer("/tmp/graft-test/corrupt"))
    val failing = r.testReport(spark).collect()
      .filter(_.getLong(1) != 0L).map(_.getString(0)).toSet
    assert(failing.contains(
      "relationships__tb_101.order_detail__order_id__tb_101.order_header"))
    assert(failing.contains(
      "is_positive_amount__tb_101.order_detail__quantity"))
  }

  test("prod target materializes into an isolated namespace") {
    val prod = TastyBytesProject.runner(Target.prod)
    val results = prod.run(spark, select = Some("+customer_loyalty_metrics"))
    assert(results.forall(_.relation.startsWith("prod_")))
  }
}
