package graft.tastybytes

import org.apache.spark.sql.functions._
import graft.model._

/** The full reference project ported Spark-natively: 8 staging views +
  * 2 SQL marts + 1 code mart + the complete source test suite
  * (/root/reference/dbt/ — SURVEY §2, §5). Sources load from the
  * deterministic fixtures; in production they would be catalog tables fed
  * by the CSV/parquet ingestion path.
  */
object TastyBytesProject {

  private val sourceTables = Seq(
    "country", "franchise", "location", "menu", "truck",
    "order_header", "order_detail", "customer_loyalty")

  val sources: Seq[SourceDef] = sourceTables.map { t =>
    SourceDef("tb_101", t, spark => FixtureGen.all(t)(spark))
  }

  /** The SQL tier lives in the `models/tastybytes` dir — the reference's
    * own file layout (dbt/models/staging, dbt/models/marts), loaded via
    * [[graft.model.ProjectLoader]]. */
  val modelsDir = "models/tastybytes"
  private lazy val fileModels: Map[String, SqlModel] =
    ProjectLoader.loadModels(modelsDir).map(m => m.name -> m).toMap

  /** 8 staging passthrough views (raw_pos_*.sql / raw_customer_*.sql:
    * each is `SELECT * FROM {{ source('tb_101', t) }}`). */
  lazy val staging: Seq[Model] = sourceTables.map { t =>
    val prefix = if (t == "customer_loyalty") "raw_customer" else "raw_pos"
    fileModels(s"${prefix}_$t")
  }

  /** Port of dbt/models/marts/orders.sql:1-47 — 31-column projection over
    * a 5-way inner join star plus a left join to customer_loyalty
    * (anonymous orders keep NULL customer columns). Lives at
    * models/tastybytes/marts/orders.sql. */
  lazy val orders: SqlModel = fileModels("orders")

  /** Port of dbt/models/marts/customer_loyalty_metrics.sql:1-16.
    * `ARRAY_AGG(DISTINCT ...)` maps exactly to `collect_set` (both are
    * unordered distinct aggregation — SURVEY A2). Lives at
    * models/tastybytes/marts/customer_loyalty_metrics.sql. */
  lazy val customerLoyaltyMetrics: SqlModel =
    fileModels("customer_loyalty_metrics")

  /** Op-for-op port of the Snowpark Python model
    * (dbt/models/marts/sales_metrics_by_location.py:3-78) as a Scala code
    * model: expression join on differently-named columns, USING-style
    * joins, count/multi-sum aggregates, coalesce-to-0, concat description.
    * The only deliberate divergence: `order_tax_amount` is a dirty VARCHAR
    * the reference sums via Snowflake's implicit coercion — under ANSI
    * Spark the coercion is explicit (SURVEY §7.4 decision 1). */
  val salesMetricsByLocation: DfModel = DfModel(
    "sales_metrics_by_location",
    refNames = Seq("raw_pos_location", "raw_pos_truck",
      "raw_pos_order_header"),
    build = (_, ref) => {
      val locations = ref("raw_pos_location")
      val trucks = ref("raw_pos_truck")
      val orders = ref("raw_pos_order_header")

      val locationTrucks = trucks
        .join(locations,
          trucks("primary_city") === locations("city"), "inner")
        .select(locations("location_id"), locations("location"),
          locations("city"), trucks("truck_id"))
        .groupBy("location_id", "location", "city")
        .agg(count("truck_id").as("truck_count"))

      val locationMetrics = orders
        .join(locations, Seq("location_id"), "inner")
        .groupBy("location_id")
        .agg(
          sum("order_total").as("total_sales"),
          sum("order_amount").as("total_amount"),
          sum(col("order_tax_amount").cast("decimal(38,4)")).as("total_tax"))

      locationTrucks.join(locationMetrics, Seq("location_id"), "left")
        .select(
          col("location_id"), col("location"), col("city"),
          col("truck_count"),
          coalesce(col("total_sales"), lit(0)).as("total_sales"),
          coalesce(col("total_amount"), lit(0)).as("total_amount"),
          coalesce(col("total_tax"), lit(0)).as("total_tax"))
        .withColumn("location_description",
          concat(col("city"), lit(" (Trucks: "),
            col("truck_count").cast("string"), lit(")")))
    })

  /** The declared test suite, mirroring __sources.yml:8-310 +
    * tests/generic/test_is_positive_amount.sql (SURVEY §5). */
  val tests: Seq[DataTest] = {
    def src(t: String) = s"tb_101.$t"
    Seq(
      // country (__sources.yml:8-35)
      NotNull(src("country"), "country_id"),
      NotNull(src("country"), "country"),
      NotNull(src("country"), "iso_country"),
      AcceptedRange(src("country"), "country_id", 1, 1000),
      IsPositiveAmount(src("country"), "city_population"), // dirty VARCHAR
      // franchise (:36-60)
      NotNull(src("franchise"), "franchise_id"),
      NotNull(src("franchise"), "first_name"),
      NotNull(src("franchise"), "last_name"),
      NotNull(src("franchise"), "e_mail"),
      // location (:61-90)
      Unique(src("location"), "location_id"),
      NotNull(src("location"), "location_id"),
      Unique(src("location"), "placekey"),
      NotNull(src("location"), "location"),
      NotNull(src("location"), "city"),
      NotNull(src("location"), "iso_country_code"),
      NotNull(src("location"), "country"),
      // menu (:91-126)
      Unique(src("menu"), "menu_id"),
      NotNull(src("menu"), "menu_id"),
      NotNull(src("menu"), "menu_type_id"),
      NotNull(src("menu"), "menu_item_id"),
      NotNull(src("menu"), "menu_item_name"),
      IsPositiveAmount(src("menu"), "cost_of_goods_usd"),
      IsPositiveAmount(src("menu"), "sale_price_usd"),
      // truck (:230-277)
      Unique(src("truck"), "truck_id"),
      NotNull(src("truck"), "truck_id"),
      NotNull(src("truck"), "menu_type_id"),
      NotNull(src("truck"), "primary_city"),
      NotNull(src("truck"), "country"),
      NotNull(src("truck"), "year"),
      NotNull(src("truck"), "truck_opening_date"),
      Relationships(src("truck"), "franchise_id",
        src("franchise"), "franchise_id"),
      // order_header (:166-229)
      NotNull(src("order_header"), "order_id"),
      NotNull(src("order_header"), "truck_id"),
      NotNull(src("order_header"), "location_id"),
      NotNull(src("order_header"), "order_ts"),
      NotNull(src("order_header"), "order_currency"),
      NotNull(src("order_header"), "order_amount"),
      NotNull(src("order_header"), "order_total"),
      Relationships(src("order_header"), "truck_id", src("truck"), "truck_id"),
      Relationships(src("order_header"), "location_id",
        src("location"), "location_id"),
      AcceptedRange(src("order_header"), "order_amount", 0, 10,
        inclusive = true),
      ExpressionIsTrue(src("order_header"), "order_ts <= current_timestamp()",
        "order_ts_not_future"),
      IsPositiveAmount(src("order_header"), "order_amount"),
      IsPositiveAmount(src("order_header"), "order_total"),
      // order_detail (:127-165)
      NotNull(src("order_detail"), "order_detail_id"),
      NotNull(src("order_detail"), "order_id"),
      NotNull(src("order_detail"), "menu_item_id"),
      NotNull(src("order_detail"), "line_number"),
      NotNull(src("order_detail"), "quantity"),
      Relationships(src("order_detail"), "order_id",
        src("order_header"), "order_id"),
      IsPositiveAmount(src("order_detail"), "quantity"),
      IsPositiveAmount(src("order_detail"), "unit_price"),
      IsPositiveAmount(src("order_detail"), "price"))
  }

  // Built from the ALREADY-PARSED fileModels (ProjectLoader.load would
  // re-read and re-parse every model file a second time).
  lazy val project: Project = Project(sources,
    fileModels.values.toSeq.sortBy(_.name) ++ Seq(salesMetricsByLocation),
    tests)

  /** Pid-suffixed for the same reason as TpchProject.martRoot:
    * concurrent JVMs sharing one fixed root corrupt each other's
    * marts; within a JVM the root stays stable across Runner
    * instances. */
  private val martRoot: String =
    sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      s"/graft_tb_marts_${ProcessHandle.current().pid()}"

  def runner(target: Target = Target.dev): Runner =
    new Runner(project, target, new PathMaterializer(martRoot))
}
