package graft.model

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.operators.TpchProject

/** Semantic-layer governance the m20 hash oracle checks only via one
  * canned denial string: definition-time validation (anchor must
  * exist, aggs well-formed), query-time dimension governance, and the
  * grain/time-dimension contract.
  */
class MetricsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def runnerWith(metrics: Metric*): Runner = new Runner(
    TpchProject.project(dir).copy(metrics = metrics),
    Target.dev, new PathMaterializer(java.nio.file.Files
      .createTempDirectory("graft_metrics_spec").toString))

  private val revenue = Metric("revenue", "order_lines_enriched", "sum",
    measure = Some("net_price"), dimensions = Seq("region"),
    timeDimension = Some("order_date"))

  test("definition: unknown anchor model and malformed aggs fail at " +
      "project construction") {
    intercept[IllegalArgumentException] {
      runnerWith(revenue.copy(model = "no_such_mart"))
    }
    intercept[IllegalArgumentException] {
      Metric("m", "x", "sum") // sum without a measure
    }
    intercept[IllegalArgumentException] {
      Metric("m", "x", "median") // unknown agg
    }
    intercept[IllegalArgumentException] {
      runnerWith(revenue, revenue) // duplicate metric names
    }
  }

  test("query: off-governance dimension, unknown metric, and grain " +
      "without a time dimension are compile errors") {
    val r = runnerWith(revenue,
      revenue.copy(name = "timeless", timeDimension = None))
    r.run(spark, select = Some("+order_lines_enriched"))
    intercept[IllegalArgumentException] {
      Metrics.query(spark, r, "revenue", Seq("customer_name"))
    }
    intercept[IllegalArgumentException] {
      Metrics.query(spark, r, "no_such_metric", Seq("region"))
    }
    intercept[IllegalArgumentException] {
      Metrics.query(spark, r, "timeless", Seq("region"),
        grain = Some("month"))
    }
  }

  test("derived metric: composes two metrics without changing the " +
      "math, and unknown references fail at project construction") {
    val lines = Metric("line_count", "order_lines_enriched", "count",
      dimensions = Seq("region"))
    val rpl = Metric("rpl", "order_lines_enriched", "derived",
      numerator = Some("revenue"), denominator = Some("line_count"),
      dimensions = Seq("region"))
    val r = runnerWith(revenue.copy(dimensions = Seq("region")), lines,
      rpl)
    r.run(spark, select = Some("+order_lines_enriched"))
    val derived = Metrics.query(spark, r, "rpl", Seq("region"))
      .collect().map(row => row.getString(0) -> row.getDouble(1)).toMap
    val direct = r.table(spark, "order_lines_enriched")
      .groupBy(col("region"))
      .agg(round(sum(col("net_price")).cast("double") /
        count(lit(1)).cast("double"), 6).as("v"))
      .collect().map(row => row.getString(0) -> row.getDouble(1)).toMap
    assert(derived == direct,
      "derived composition must equal the direct ratio")
    intercept[IllegalArgumentException] {
      runnerWith(revenue, rpl.copy(numerator = Some("ghost")))
    }
  }

  test("query: sum metric equals the direct aggregate over the mart, " +
      "ungrouped and grained") {
    val r = runnerWith(revenue)
    r.run(spark, select = Some("+order_lines_enriched"))
    val viaMetric = Metrics.query(spark, r, "revenue", Seq("region"))
      .collect().map(row => row.getString(0) -> row.getDecimal(1)).toMap
    val direct = r.table(spark, "order_lines_enriched")
      .groupBy(col("region")).agg(sum(col("net_price")).as("s"))
      .collect().map(row => row.getString(0) -> row.getDecimal(1)).toMap
    assert(viaMetric == direct,
      "the metric layer must add governance, never change the number")
    val grained = Metrics.query(spark, r, "revenue", Nil,
      grain = Some("month"))
    assert(grained.columns.toSeq == Seq("order_date_month", "revenue"))
    assert(grained.count() > 0)
  }
}
