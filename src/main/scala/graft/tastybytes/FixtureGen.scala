package graft.tastybytes

import java.math.{BigDecimal => JBigDecimal}
import java.sql.Date
import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import scala.jdk.CollectionConverters._

/** Deterministic Tasty-Bytes-shaped fixture data (no RNG — every value is a
  * pure function of the row index). Coverage requirements from FIXTURES.md:
  * NULL customer_id rows (left-join path), overlapping primary_city↔city
  * (many-to-many J4 join), locations with no orders (coalesce-to-0 path),
  * multiple orders and locations per customer (SUM + ARRAY_AGG DISTINCT),
  * dirty string-typed numeric columns carrying positive values.
  */
object FixtureGen {

  private val cities = Seq(
    "San Mateo", "Denver", "Seattle", "New York", "Boston",
    "Berlin", "Hamburg", "Paris", "London", "Warsaw")

  private def money(v: Double): JBigDecimal =
    JBigDecimal.valueOf(v).setScale(4, java.math.RoundingMode.HALF_UP)

  private def df(spark: SparkSession, rows: Seq[Row],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(rows.asJava, schema)

  def country(spark: SparkSession): DataFrame = df(spark,
    (1 to 10).map { i =>
      Row(i.toLong, s"Country$i", "USD", f"C$i%02d", i.toLong,
        cities(i % cities.size), (100000 + i * 1000).toString)
    }, Schemas.country)

  def franchise(spark: SparkSession): DataFrame = df(spark,
    (1 to 8).map { i =>
      Row(i.toLong, s"First$i", s"Last$i", cities(i % cities.size),
        "United States", s"owner$i@example.com", s"555-000$i")
    }, Schemas.franchise)

  def location(spark: SparkSession): DataFrame = df(spark,
    (1 to 20).map { i =>
      Row(i.toLong, s"pk-$i", s"Location $i", cities(i % cities.size),
        "Region" + (i % 3), "US", "United States")
    }, Schemas.location)

  def menu(spark: SparkSession): DataFrame = df(spark,
    (1 to 12).map { i =>
      Row(i.toLong, (i % 3 + 1).toLong, s"MenuType${i % 3 + 1}",
        s"Brand${i % 4 + 1}", i.toLong, s"Item $i", s"Cat${i % 2}",
        s"Sub${i % 2}", money(1.0 + i * 0.25), money(3.0 + i * 0.5),
        s"""{"ingredients":["i$i"],"is_healthy":${i % 2 == 0}}""")
    }, Schemas.menu)

  def truck(spark: SparkSession): DataFrame = df(spark,
    (1 to 15).map { i =>
      Row(i.toLong, (i % 3 + 1).toLong, cities(i % cities.size),
        "Region" + (i % 3), s"R${i % 3}", "United States", "US",
        (i % 2).toLong, (2018 + i % 6).toLong, s"Make${i % 4}",
        s"Model${i % 5}", (i % 2).toLong, (i % 8 + 1).toLong,
        Date.valueOf(s"20${10 + i % 10}-0${i % 9 + 1}-15"))
    }, Schemas.truck)

  /** 100 orders: trucks 1-15, locations 1-13 only (14-20 stay order-free),
    * customer_id NULL on every 5th order, 2024 timestamps. The location
    * modulus (13) must stay COPRIME-ish to the customer modulus (30): a
    * divisor of 30 (the old 15) locks every customer to exactly one
    * location — customer i%30 fixes i mod 30, hence i mod 15 — and the
    * "multiple locations per customer (ARRAY_AGG DISTINCT)" coverage
    * requirement silently becomes untestable (all arrays singleton). With
    * 13, a customer's order indices i, i+30, i+60, i+90 hit up to 4
    * distinct locations. */
  def orderHeader(spark: SparkSession): DataFrame = df(spark,
    (1 to 100).map { i =>
      val amount = money(1.0 + (i % 9)) // within accepted_range [0, 10]
      val tax = money((1.0 + (i % 9)) * 0.1)
      val total = money((1.0 + (i % 9)) * 1.1)
      Row(i.toLong, (i % 15 + 1).toLong, (i % 13 + 1).toLong,
        if (i % 5 == 0) null else (i % 30 + 1).toLong,
        null, (i % 4 + 1).toLong, "08:00:00", "16:00:00",
        if (i % 2 == 0) "Walk-up" else "App",
        LocalDateTime.of(2024, i % 12 + 1, i % 28 + 1, i % 24, i % 60),
        s"2024-0${i % 9 + 1}-15 12:00:00", // dirty string timestamp
        "USD", amount, tax.toPlainString, "0.0000", total,
        if (i % 11 == 0) null else java.lang.Boolean.valueOf(i % 7 == 0))
    }, Schemas.orderHeader)

  /** 250 details: every order_id valid, menu items 1-12, positive amounts. */
  def orderDetail(spark: SparkSession): DataFrame = df(spark,
    (1 to 250).map { i =>
      val unit = money(2.0 + (i % 5))
      Row(i.toLong, (i % 100 + 1).toLong, (i % 12 + 1).toLong, null,
        (i % 3 + 1).toLong, (i % 4 + 1).toLong, unit,
        money((2.0 + (i % 5)) * (i % 4 + 1)), "0.0000")
    }, Schemas.orderDetail)

  def customerLoyalty(spark: SparkSession): DataFrame = df(spark,
    (1 to 30).map { i =>
      Row(i.toLong, s"CFirst$i", s"CLast$i", cities(i % cities.size),
        "United States", f"9$i%04d", "en", if (i % 2 == 0) "F" else "M",
        s"Brand${i % 4 + 1}", if (i % 3 == 0) "Married" else "Single",
        (i % 4).toString, Date.valueOf(s"2021-0${i % 9 + 1}-01"),
        Date.valueOf(s"19${70 + i % 30}-0${i % 9 + 1}-11"),
        s"c$i@example.com", f"555-1$i%03d")
    }, Schemas.customerLoyalty)

  val all: Map[String, SparkSession => DataFrame] = Map(
    "country" -> country,
    "franchise" -> franchise,
    "location" -> location,
    "menu" -> menu,
    "truck" -> truck,
    "order_header" -> orderHeader,
    "order_detail" -> orderDetail,
    "customer_loyalty" -> customerLoyalty)
}
