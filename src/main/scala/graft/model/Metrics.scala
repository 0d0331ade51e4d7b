package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** dbt semantic layer (MetricFlow's core surface): METRICS defined once
  * against a model, queried by name with governed dimensions — the
  * "one revenue number everywhere" discipline. A metric pins its anchor
  * model, its aggregation, and the ONLY dimensions it may be sliced by;
  * a query outside that set is a compile error, not a wrong number.
  *
  * Reference analogue: the reference project exposes its marts raw and
  * leaves metric consistency to each dashboard; this layer is the dbt
  * surface (`metrics:` YAML → MetricFlow) that replaces that.
  *
  * Scale: a metric query compiles to one groupBy over the materialized
  * anchor mart — Catalyst sees a plain aggregate (partial map-side
  * combine, one shuffle on the dimension key); the layer adds
  * governance, never plan overhead. Decimal discipline for ratio
  * metrics: numerator/denominator SUM as exact decimals, one double
  * division at the 6dp output contract (RelationalQueries.dsumStr).
  */
final case class Metric(
    name: String,
    /** Anchor model (a materialized mart in the project DAG). */
    model: String,
    /** "sum" | "count" | "ratio". */
    agg: String,
    /** Measure column for sum. */
    measure: Option[String] = None,
    /** Ratio: Σ numerator / Σ denominator (denominator None → row
      * count, i.e. a per-row average). */
    numerator: Option[String] = None,
    denominator: Option[String] = None,
    /** The governed dimension set — queries may group ONLY by these. */
    dimensions: Seq[String] = Nil,
    /** Time dimension eligible for grain truncation. */
    timeDimension: Option[String] = None,
    description: String = "") {
  require(Set("sum", "count", "ratio", "derived")(agg),
    s"unknown agg '$agg'")
  require(agg != "sum" || measure.nonEmpty, "sum metric needs a measure")
  require(agg != "ratio" || numerator.nonEmpty,
    "ratio metric needs a numerator")
  require(agg != "derived" || (numerator.nonEmpty && denominator.nonEmpty),
    "derived metric needs numerator and denominator METRIC names")
}

/** MetricFlow saved query (dbt `saved_queries:`): a NAMED bundle of
  * metrics × one governed slice, validated against the project at
  * construction — the unit dbt EXPORTS schedule (a saved query
  * materialized as a table on a cadence is how semantic-layer numbers
  * reach BI extracts without each consumer re-deriving the slice).
  * Every referenced metric must exist and must be sliceable by the
  * bundle's dimensions under its OWN governance, so a saved query can
  * never ship a number its metrics wouldn't allow interactively. */
final case class SavedQuery(
    name: String,
    /** Metric names resolved against the project's `metrics:`. */
    metrics: Seq[String],
    /** The shared slice — must pass every member metric's governance. */
    groupBy: Seq[String] = Nil,
    /** Optional grain truncation of each metric's time dimension. */
    grain: Option[String] = None,
    description: String = "") {
  require(metrics.nonEmpty, s"saved query '$name' lists no metrics")
  require(metrics.distinct.size == metrics.size,
    s"saved query '$name' lists a metric twice")
}

object Metrics {

  /** Run the project's saved query `name`: each member metric resolves
    * independently (through [[query]] — same governance, same decimal
    * discipline), and the frames join on the slice columns, so the
    * bundle is exactly the numbers the metrics would give one by one.
    * Construction-time validation (see [[Project]]) has already pinned
    * that every join key exists on every side. */
  def runSaved(spark: SparkSession, runner: Runner, name: String)
      : DataFrame = {
    val sq = runner.project.savedQueries.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"unknown saved query '$name' — project defines " +
          runner.project.savedQueries.map(_.name)
            .mkString("[", ", ", "]")))
    val frames = sq.metrics.map(m =>
      query(spark, runner, m, sq.groupBy, sq.grain))
    frames.reduceLeft { (acc, next) =>
      val keys = acc.columns.toSeq.intersect(
        next.columns.filterNot(sq.metrics.contains).toSeq)
      if (keys.isEmpty) acc.crossJoin(next) else acc.join(next, keys)
    }
  }

  /** dbt saved-query EXPORT: materialize the bundle as a relation
    * through the runner's own materializer (the same atomic sink the
    * models use — on the catalog materializer that is the versioned
    * pointer-swap path), then read it back through the engine. Returns
    * the re-read frame so callers consume the PERSISTED artifact, not
    * the in-session plan. */
  def export(spark: SparkSession, runner: Runner, name: String,
      schema: String): DataFrame = {
    val rel = runner.materializer.tableRelation(schema, s"saved_$name")
    runner.materializer.materializeTable(spark, rel,
      runSaved(spark, runner, name))
    spark.table(rel)
  }

  /** Query `metricName` from the runner's project grouped by `groupBy`
    * (⊆ the metric's governed dimensions), optionally truncating the
    * metric's time dimension to `grain` ("month", "day", …) as an
    * extra output column `<timeCol>_<grain>`. The anchor model must be
    * materialized (run the DAG first). Sum metrics keep their exact
    * decimal type; ratio metrics emit a 6dp double. */
  def query(spark: SparkSession, runner: Runner, metricName: String,
      groupBy: Seq[String], grain: Option[String] = None): DataFrame = {
    val metric = runner.project.metrics.find(_.name == metricName)
      .getOrElse(throw new IllegalArgumentException(
        s"unknown metric '$metricName' — project defines " +
          runner.project.metrics.map(_.name).mkString("[", ", ", "]")))
    val bad = groupBy.filterNot(metric.dimensions.contains)
    require(bad.isEmpty,
      s"metric '$metricName' is not sliceable by ${bad.mkString(", ")} " +
        s"— governed dimensions: ${metric.dimensions.mkString(", ")}")
    require(grain.isEmpty || metric.agg == "derived" ||
      metric.timeDimension.nonEmpty,
      s"metric '$metricName' declares no time dimension")
    // DERIVED metric (MetricFlow `type: derived`): a ratio of two other
    // METRICS — each resolves through its own governance and anchor,
    // the results join on the requested slice, one 6dp division. The
    // numerator/denominator fields carry metric names, not columns.
    if (metric.agg == "derived") {
      // A grained derived query joins its sides on the grain column,
      // whose NAME comes from each side's time dimension — leaves that
      // disagree would produce differently-named columns and an opaque
      // missing-column AnalysisException at the join. Validate up
      // front (the same check SavedQuery construction runs) so the
      // failure is the standard governance error.
      grain.foreach { _ =>
        def leaves(n: String): Seq[Metric] = {
          val m = runner.project.metrics.find(_.name == n).get
          if (m.agg == "derived")
            Seq(m.numerator, m.denominator).flatten.flatMap(leaves)
          else Seq(m)
        }
        val timeDims = leaves(metricName).map(m =>
          m.timeDimension.getOrElse(throw new IllegalArgumentException(
            s"metric '${m.name}' declares no time dimension"))).distinct
        require(timeDims.size == 1,
          s"metric '$metricName' mixes time dimensions " +
            s"${timeDims.mkString(", ")} — a grained query needs one")
      }
      val num = query(spark, runner, metric.numerator.get, groupBy, grain)
      val den = query(spark, runner, metric.denominator.get, groupBy,
        grain)
      val keys = num.columns.filterNot(_ == metric.numerator.get).toSeq
      val joined =
        if (keys.isEmpty) num.crossJoin(den)
        else num.join(den, keys)
      return joined.select(keys.map(col) :+
        round(col(metric.numerator.get).cast("double") /
          col(metric.denominator.get).cast("double"), 6)
          .as(metric.name): _*)
    }
    val base = runner.table(spark, metric.model)
    val dims = groupBy.map(col) ++ grain.map { g =>
      val t = metric.timeDimension.get
      date_trunc(g, col(t)).cast("date").as(s"${t}_$g")
    }
    val agged = metric.agg match {
      case "sum" =>
        base.groupBy(dims: _*)
          .agg(sum(col(metric.measure.get)).as(metric.name))
      case "count" =>
        base.groupBy(dims: _*).agg(count(lit(1)).as(metric.name))
      case "ratio" =>
        val den = metric.denominator
          .map(d => sum(col(d)).cast("double"))
          .getOrElse(count(lit(1)).cast("double"))
        base.groupBy(dims: _*)
          .agg(round(sum(col(metric.numerator.get)).cast("double") / den,
            6).as(metric.name))
    }
    agged
  }
}
