package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data tests — the reference's entire correctness surface
  * (SURVEY §5). Contract: each test compiles to a SELECT of violating rows;
  * pass ⇔ 0 rows (test_is_positive_amount.sql:3-5 shows the pattern).
  *
  * `relation` addresses either a model by name or a source as
  * "sourceName.table"; the Runner resolves it. `violations` receives a
  * resolver so multi-relation tests (relationships) can load both sides.
  */
sealed trait DataTest {
  def id: String
  def relation: String
  def violations(resolve: String => DataFrame): DataFrame

  /** For tests whose violations are a per-row predicate on one relation:
    * the predicate. The runner fuses all such tests on a relation into a
    * single scan (`sum(when(cond, 1))` per test) — at warehouse scale this
    * turns N full-table passes into one. */
  def rowCondition: Option[Column] = None
}

/** dbt test config wrapper — `severity` ("error", the default, fails the
  * invocation; "warn" reports without failing) and `store_failures`
  * (materialize the violating rows to an audit relation,
  * `<schema>_<test_id>__failures`, for debugging without re-running the
  * test query). Wraps any [[DataTest]]; delegates the test itself.
  */
final case class WithConfig(
    test: DataTest,
    severity: String = "error",
    storeFailures: Boolean = false) extends DataTest {
  require(severity == "error" || severity == "warn",
    s"unknown severity '$severity'")
  def id: String = test.id
  def relation: String = test.relation
  override def rowCondition: Option[Column] = test.rowCondition
  def violations(resolve: String => DataFrame): DataFrame =
    test.violations(resolve)
}

/** dbt built-in `not_null` (__sources.yml:13-14 et al.). */
final case class NotNull(relation: String, column: String) extends DataTest {
  val id = s"not_null__${relation}__$column"
  override def rowCondition: Option[Column] = Some(col(column).isNull)
  def violations(resolve: String => DataFrame): DataFrame =
    resolve(relation).filter(col(column).isNull)
}

/** dbt built-in `unique`, compiled to group-count-HAVING
  * (__sources.yml:66-68 et al.). */
final case class Unique(relation: String, column: String) extends DataTest {
  val id = s"unique__${relation}__$column"
  def violations(resolve: String => DataFrame): DataFrame =
    resolve(relation)
      .filter(col(column).isNotNull)
      .groupBy(col(column))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
}

/** dbt built-in `relationships` (FK integrity), compiled to a left-anti
  * join on non-null child keys (__sources.yml:138-140 et al., SURVEY J7). */
final case class Relationships(
    relation: String, column: String,
    parentRelation: String, parentColumn: String) extends DataTest {
  val id = s"relationships__${relation}__${column}__$parentRelation"
  def violations(resolve: String => DataFrame): DataFrame = {
    val child = resolve(relation).filter(col(column).isNotNull)
    val parent = resolve(parentRelation).select(col(parentColumn))
    child.join(parent, child(column) === parent(parentColumn), "left_anti")
  }
}

/** dbt_utils `accepted_range` (__sources.yml:15-17, :217-220). */
final case class AcceptedRange(
    relation: String, column: String,
    min: Double, max: Double, inclusive: Boolean = true) extends DataTest {
  val id = s"accepted_range__${relation}__$column"
  private def cond: Column = {
    val c = col(column)
    val inRange =
      if (inclusive) c >= min && c <= max
      else c > min && c < max
    c.isNotNull && !inRange
  }
  override def rowCondition: Option[Column] = Some(cond)
  def violations(resolve: String => DataFrame): DataFrame =
    resolve(relation).filter(cond)
}

/** dbt_utils `expression_is_true` (__sources.yml:204-205). Rows where the
  * expression is false are violations; NULL evaluations pass (dbt compiled
  * form: `where not(expression)`). */
final case class ExpressionIsTrue(
    relation: String, expression: String, label: String) extends DataTest {
  val id = s"expression_is_true__${relation}__$label"
  override def rowCondition: Option[Column] = Some(!expr(expression))
  def violations(resolve: String => DataFrame): DataFrame =
    resolve(relation).filter(!expr(expression))
}

/** The reference's custom generic test
  * (dbt/tests/generic/test_is_positive_amount.sql:1-7): violating rows are
  * `c IS NOT NULL AND c <= 0`. Snowflake implicitly casts VARCHAR amount
  * columns; under ANSI Spark we make the coercion explicit and lenient via
  * `try_cast` (SURVEY §7.4 decision 1). */
final case class IsPositiveAmount(relation: String, column: String)
    extends DataTest {
  val id = s"is_positive_amount__${relation}__$column"
  override def rowCondition: Option[Column] = Some(col(column).isNotNull &&
    expr(s"try_cast($column AS DECIMAL(38,4)) <= 0"))
  def violations(resolve: String => DataFrame): DataFrame =
    resolve(relation).filter(col(column).isNotNull &&
      expr(s"try_cast($column AS DECIMAL(38,4)) <= 0"))
}
