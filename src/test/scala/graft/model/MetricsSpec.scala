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

  test("derived metric: reference cycles fail at project construction " +
      "instead of StackOverflowing the query walk") {
    val aToB = Metric("cyc_a", "order_lines_enriched", "derived",
      numerator = Some("cyc_b"), denominator = Some("revenue"),
      dimensions = Seq("region"))
    val bToA = Metric("cyc_b", "order_lines_enriched", "derived",
      numerator = Some("cyc_a"), denominator = Some("revenue"),
      dimensions = Seq("region"))
    val ex = intercept[IllegalArgumentException] {
      runnerWith(revenue, aToB, bToA)
    }
    assert(ex.getMessage.contains("cycle"))
    // Self-reference is the 1-cycle.
    intercept[IllegalArgumentException] {
      runnerWith(revenue, aToB.copy(numerator = Some("cyc_a")))
    }
  }

  test("derived metric: a GRAINED query over leaves with different " +
      "time dimensions is the standard governance error, not a " +
      "missing-column join failure") {
    val lines = Metric("line_count", "order_lines_enriched", "count",
      dimensions = Seq("region"), timeDimension = Some("ship_date"))
    val rpl = Metric("rpl", "order_lines_enriched", "derived",
      numerator = Some("revenue"), denominator = Some("line_count"),
      dimensions = Seq("region"))
    val r = runnerWith(revenue, lines, rpl)
    r.run(spark, select = Some("+order_lines_enriched"))
    val ex = intercept[IllegalArgumentException] {
      Metrics.query(spark, r, "rpl", Seq("region"),
        grain = Some("month"))
    }
    assert(ex.getMessage.contains("mixes time dimensions"))
    // Ungrained, the same derived metric queries fine.
    assert(Metrics.query(spark, r, "rpl", Seq("region")).count() > 0)
  }

  test("saved query: an off-governance slice reachable only through a " +
      "derived member fails at project construction") {
    // line_count governs ONLY ship_mode; the derived rpl declares the
    // broader (region) governance — a region-sliced bundle through rpl
    // must fail on the LEAF's governance, at construction.
    val lines = Metric("line_count", "order_lines_enriched", "count",
      dimensions = Seq("ship_mode"))
    val rpl = Metric("rpl", "order_lines_enriched", "derived",
      numerator = Some("revenue"), denominator = Some("line_count"),
      dimensions = Seq("region"))
    val ex = intercept[IllegalArgumentException] {
      TpchProject.project(dir).copy(
        metrics = Seq(revenue, lines, rpl),
        savedQueries = Seq(SavedQuery("bad", Seq("rpl"),
          groupBy = Seq("region"))))
    }
    assert(ex.getMessage.contains("leaf metric 'line_count'"))
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

  test("saved query: the bundle equals the member metrics queried one " +
      "by one, and the export round-trips through the materializer") {
    val lines = Metric("line_count", "order_lines_enriched", "count",
      dimensions = Seq("region"), timeDimension = Some("order_date"))
    val sq = SavedQuery("regional", Seq("revenue", "line_count"),
      groupBy = Seq("region"))
    val r = new Runner(
      TpchProject.project(dir).copy(metrics = Seq(revenue, lines),
        savedQueries = Seq(sq)),
      Target.dev, new PathMaterializer(java.nio.file.Files
        .createTempDirectory("graft_sq_spec").toString))
    r.run(spark, select = Some("+order_lines_enriched"))
    val bundle = Metrics.runSaved(spark, r, "regional")
    assert(bundle.columns.toSeq ==
      Seq("region", "revenue", "line_count"))
    val direct = Metrics.query(spark, r, "revenue", Seq("region"))
      .join(Metrics.query(spark, r, "line_count", Seq("region")),
        Seq("region"))
    assert(bundle.orderBy("region").collect().toSeq ==
      direct.orderBy("region").collect().toSeq,
      "the bundle must be exactly the per-metric numbers")
    val exported = Metrics.export(spark, r, "regional", "exports")
    assert(exported.orderBy("region").collect().toSeq ==
      bundle.orderBy("region").collect().toSeq,
      "the export must persist the bundle faithfully")
    assert(r.materializer.relationExists(spark,
      r.materializer.tableRelation("exports", "saved_regional")),
      "the export must land through the runner's materializer")
  }

  test("saved query: off-governance slice, unknown metric, duplicate " +
      "names, and mixed grain time dimensions fail at project " +
      "construction; unknown saved name fails at run") {
    val lines = Metric("line_count", "order_lines_enriched", "count",
      dimensions = Seq("region"), timeDimension = Some("ship_date"))
    def projectWith(sqs: SavedQuery*) =
      TpchProject.project(dir).copy(metrics = Seq(revenue, lines),
        savedQueries = sqs)
    intercept[IllegalArgumentException] {
      projectWith(SavedQuery("bad", Seq("revenue"),
        groupBy = Seq("customer_name")))
    }
    intercept[IllegalArgumentException] {
      projectWith(SavedQuery("bad", Seq("ghost")))
    }
    intercept[IllegalArgumentException] {
      projectWith(SavedQuery("a", Seq("revenue")),
        SavedQuery("a", Seq("revenue")))
    }
    // revenue anchors order_date, line_count ship_date: a GRAINED
    // bundle cannot join their per-metric grain columns.
    intercept[IllegalArgumentException] {
      projectWith(SavedQuery("bad", Seq("revenue", "line_count"),
        groupBy = Seq("region"), grain = Some("month")))
    }
    // The same bundle UNGRAINED is fine — time dims only gate grains.
    projectWith(SavedQuery("ok", Seq("revenue", "line_count"),
      groupBy = Seq("region")))
    val r = new Runner(projectWith(), Target.dev,
      new PathMaterializer(java.nio.file.Files
        .createTempDirectory("graft_sq_spec2").toString))
    intercept[IllegalArgumentException] {
      Metrics.runSaved(spark, r, "no_such_saved_query")
    }
  }
}
