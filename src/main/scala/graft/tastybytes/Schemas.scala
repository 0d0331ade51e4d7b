package graft.tastybytes

import org.apache.spark.sql.types._

/** Tasty Bytes fixture schemas — normalized from the reference DDL
  * (/root/reference/setup/setup_data.sql:6-137) per FIXTURES.md §1:
  * keys → Long (incl. order_header.location_id, FLOAT in DDL),
  * money → Decimal(38,4), TIME(9) → String "HH:mm:ss",
  * TIMESTAMP_NTZ(9) → TimestampNTZ, VARIANT → String(JSON), and the
  * deliberately dirty VARCHAR columns preserved (city_population,
  * children_count, served_ts, order_tax_amount, order_discount_amount).
  * order_failed is added (orders.sql:34 schema drift, SURVEY §1.3).
  */
object Schemas {

  private val money = DecimalType(38, 4)

  val country: StructType = StructType(Seq(
    StructField("country_id", LongType, nullable = false),
    StructField("country", StringType),
    StructField("iso_currency", StringType),
    StructField("iso_country", StringType),
    StructField("city_id", LongType),
    StructField("city", StringType),
    StructField("city_population", StringType))) // dirty: numeric-in-string

  val franchise: StructType = StructType(Seq(
    StructField("franchise_id", LongType, nullable = false),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("city", StringType),
    StructField("country", StringType),
    StructField("e_mail", StringType),
    StructField("phone_number", StringType)))

  val location: StructType = StructType(Seq(
    StructField("location_id", LongType, nullable = false),
    StructField("placekey", StringType),
    StructField("location", StringType),
    StructField("city", StringType),
    StructField("region", StringType),
    StructField("iso_country_code", StringType),
    StructField("country", StringType)))

  val menu: StructType = StructType(Seq(
    StructField("menu_id", LongType, nullable = false),
    StructField("menu_type_id", LongType),
    StructField("menu_type", StringType),
    StructField("truck_brand_name", StringType),
    StructField("menu_item_id", LongType),
    StructField("menu_item_name", StringType),
    StructField("item_category", StringType),
    StructField("item_subcategory", StringType),
    StructField("cost_of_goods_usd", money),
    StructField("sale_price_usd", money),
    StructField("menu_item_health_metrics_obj", StringType))) // JSON

  val truck: StructType = StructType(Seq(
    StructField("truck_id", LongType, nullable = false),
    StructField("menu_type_id", LongType),
    StructField("primary_city", StringType),
    StructField("region", StringType),
    StructField("iso_region", StringType),
    StructField("country", StringType),
    StructField("iso_country_code", StringType),
    StructField("franchise_flag", LongType),
    StructField("year", LongType),
    StructField("make", StringType),
    StructField("model", StringType),
    StructField("ev_flag", LongType),
    StructField("franchise_id", LongType),
    StructField("truck_opening_date", DateType)))

  val orderHeader: StructType = StructType(Seq(
    StructField("order_id", LongType, nullable = false),
    StructField("truck_id", LongType),
    StructField("location_id", LongType),
    StructField("customer_id", LongType, nullable = true), // anonymous orders
    StructField("discount_id", StringType),
    StructField("shift_id", LongType),
    StructField("shift_start_time", StringType), // TIME(9) → "HH:mm:ss"
    StructField("shift_end_time", StringType),
    StructField("order_channel", StringType),
    StructField("order_ts", TimestampNTZType),
    StructField("served_ts", StringType), // dirty: timestamp-in-string
    StructField("order_currency", StringType),
    StructField("order_amount", money),
    StructField("order_tax_amount", StringType), // dirty
    StructField("order_discount_amount", StringType), // dirty
    StructField("order_total", money),
    StructField("order_failed", BooleanType, nullable = true))) // drift col

  val orderDetail: StructType = StructType(Seq(
    StructField("order_detail_id", LongType, nullable = false),
    StructField("order_id", LongType),
    StructField("menu_item_id", LongType),
    StructField("discount_id", StringType),
    StructField("line_number", LongType),
    StructField("quantity", LongType),
    StructField("unit_price", money),
    StructField("price", money),
    StructField("order_item_discount_amount", StringType))) // dirty

  val customerLoyalty: StructType = StructType(Seq(
    StructField("customer_id", LongType, nullable = false),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("city", StringType),
    StructField("country", StringType),
    StructField("postal_code", StringType),
    StructField("preferred_language", StringType),
    StructField("gender", StringType),
    StructField("favourite_brand", StringType),
    StructField("marital_status", StringType),
    StructField("children_count", StringType), // dirty: numeric-in-string
    StructField("sign_up_date", DateType),
    StructField("birthday_date", DateType),
    StructField("e_mail", StringType),
    StructField("phone_number", StringType)))
}
