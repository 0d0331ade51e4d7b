package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Core model ADT for the Spark-native transformation-DAG engine.
  *
  * Mirrors the reference's capability surface (SURVEY.md §0): a dbt project
  * is a DAG of models (SQL text or DataFrame code) over declared sources,
  * each materialized as a view or table, with declarative data tests.
  * Reference evidence: models at /root/reference/dbt/models/, config at
  * dbt/dbt_project.yml:20-25, python model sales_metrics_by_location.py.
  */
sealed trait Materialization
object Materialization {
  /** Staging tier — virtual, zero storage cost; work is pushed into
    * downstream queries and Catalyst optimizes through the view
    * (dbt_project.yml:22-23). */
  case object View extends Materialization

  /** Mart tier — full-refresh CTAS semantics (dbt_project.yml:24-25). */
  case object Table extends Materialization

  /** Engine extension beyond the reference (which only re-runs full
    * refreshes hourly, setup/task.sql:1-6): incremental materialization by
    * dynamic partition overwrite — each run replaces only the partitions
    * present in the increment frame. This is the 100 TB path: an hourly
    * run touches one hour-partition instead of rebuilding the mart. The
    * model's SQL can bound its scan with `{{ incremental_filter('col') }}`
    * (renders to a max-watermark predicate against the existing relation,
    * dbt's `is_incremental()` + `{{ this }}` pattern).
    */
  /** dbt `on_schema_change` policies for incremental models: `ignore`
    * (default — the target schema wins: the increment's new columns are
    * dropped, its missing ones null-filled), `append_new_columns` (the
    * target gains the increment's new columns; history rows read NULL
    * for them), `fail` (any difference aborts the node). dbt's
    * `sync_all_columns` (also DROP removed columns) is intentionally
    * absent: destructive on shared history, and expressible as a
    * full-refresh when really wanted. */
  val schemaChangePolicies: Set[String] =
    Set("ignore", "append_new_columns", "fail")

  final case class IncrementalByPartition(partitionCols: Seq[String],
      onSchemaChange: String = "ignore")
      extends Materialization {
    require(partitionCols.nonEmpty, "partition columns required")
    require(schemaChangePolicies(onSchemaChange),
      s"unknown on_schema_change '$onSchemaChange'")
  }

  /** Engine extension: dbt's `incremental` with `unique_key` (the
    * merge / delete+insert strategy). Each run's increment frame REPLACES
    * the target rows sharing its keys and appends new ones; untouched
    * keys survive. On plain parquet this is read-modify-replace
    * (anti-join on the key + union + staged swap); on a lakehouse table
    * format the identical contract is a single `MERGE INTO`. Use
    * [[IncrementalByPartition]] when increments align with partitions —
    * it rewrites only touched partitions; key-merge rewrites the table.
    */
  final case class IncrementalByKey(uniqueKey: Seq[String],
      onSchemaChange: String = "ignore")
      extends Materialization {
    require(uniqueKey.nonEmpty, "unique_key required")
    require(schemaChangePolicies(onSchemaChange),
      s"unknown on_schema_change '$onSchemaChange'")
  }

  /** dbt's DEFAULT incremental strategy (`materialized='incremental'`
    * with neither unique_key nor partition_by): each run's increment is
    * APPENDED — no existing byte is rewritten, the cheapest possible
    * materialization. Correct when the model's own filter guarantees
    * disjoint increments (the `incremental_filter` watermark); rows it
    * re-selects would duplicate, which is exactly dbt's contract too. */
  final case class IncrementalAppend(onSchemaChange: String = "ignore")
      extends Materialization {
    require(schemaChangePolicies(onSchemaChange),
      s"unknown on_schema_change '$onSchemaChange'")
  }

  /** dbt 1.9's `microbatch` incremental strategy: the model processes its
    * data one event-time batch at a time, each batch REPLACING its own
    * time partition in the target (insert_overwrite per period) —
    * batches are independent, retryable units, dbt's answer to backfills
    * and late data for large time-series models.
    *
    *  - `eventTime` is the model's OUTPUT time column; its `batchSize`
    *    truncation becomes the target's physical partition.
    *  - Every INPUT that declares its own event time ([[Model.eventTime]]
    *    on refs, [[SourceDef.eventTimeField]] on sources) is wrapped in a
    *    time-filtered subquery per batch — dbt's auto-injected filter;
    *    inputs without one are read in full (dbt's contract).
    *  - A re-run reprocesses from (last processed batch − `lookback`)
    *    forward — the late-data window — leaving older partitions
    *    untouched; `begin` pins the first batch of the initial build.
    */
  final case class Microbatch(
      eventTime: String,
      batchSize: String = "day",
      lookback: Int = 1,
      begin: Option[String] = None) extends Materialization {
    require(Set("hour", "day", "month", "year")(batchSize),
      s"unknown batch_size '$batchSize'")
    require(lookback >= 0, "lookback must be non-negative")
    require(eventTime.nonEmpty, "microbatch requires event_time")
  }

  /** dbt's ephemeral materialization: never materialized. Downstream SQL
    * models inline this model's rendered SELECT as a CTE
    * (`WITH __cte__name AS (...)`), code models receive its DataFrame
    * built on the fly — either way Catalyst sees one composed plan and
    * optimizes through it, so staging logic can be factored out with
    * zero storage or scheduling cost.
    */
  case object Ephemeral extends Materialization

  /** Engine extension: dbt snapshots (SCD type-2 history, timestamp
    * strategy). The model SELECT must yield at most one row per
    * `uniqueKey` with a monotone `updatedAt` column; each run compares
    * against the open rows in the existing snapshot and (a) inserts new
    * keys, (b) closes the open row (`valid_to` = new `updatedAt`) and
    * opens a fresh one whenever the source row is newer, (c) leaves
    * untouched keys (and all closed history) as-is. `valid_to IS NULL`
    * marks the current row — dbt's dbt_valid_from/dbt_valid_to contract.
    */
  final case class Snapshot(uniqueKey: String, updatedAt: String)
      extends Materialization {
    require(uniqueKey.nonEmpty && updatedAt.nonEmpty,
      "snapshot requires unique_key and updated_at")
  }

  /** dbt snapshots, `strategy='check'`: for sources with NO reliable
    * `updated_at` column, a row counts as changed when any of
    * `checkCols` differs (null-safely) from the open snapshot row —
    * dbt's `check_cols` config, with an empty list meaning
    * `check_cols='all'` (every non-key column). `valid_from`/`valid_to`
    * carry the SNAPSHOT time (there is no source timestamp to carry) as
    * ISO-8601 strings — lexicographic order is chronological.
    * `snapshotAt` injects that clock for reproducible runs (backfills,
    * tests); None uses the wall clock, dbt's behavior.
    */
  final case class SnapshotCheck(
      uniqueKey: String,
      checkCols: Seq[String] = Nil,
      snapshotAt: Option[String] = None,
      /** dbt `invalidate_hard_deletes`: a key absent from the source
        * closes its open row at the snapshot clock instead of surviving
        * — for sources where disappearance IS the change. */
      invalidateHardDeletes: Boolean = false) extends Materialization {
    require(uniqueKey.nonEmpty, "snapshot requires unique_key")
  }
}

sealed trait Model {
  def name: String
  def materialization: Materialization

  /** Overrides the target schema, replacing (not prefixing) it — the
    * semantics of the reference's generate_schema_name macro
    * (dbt/macros/generate_schema_name.sql:1-14). */
  def customSchema: Option[String]
  def refs: Seq[String]
  def sources: Seq[(String, String)]

  /** dbt-snowflake `cluster_by`: physically order the materialized
    * relation by these columns. On parquet this is what makes row-group
    * min/max statistics selective — a filter on a clustered column skips
    * whole files/row-groups instead of scanning the mart. Tables get a
    * global range layout (disjoint per-file ranges); incremental
    * materializations sort within each written partition (no extra
    * shuffle on the hot path). */
  def clusterBy: Seq[String] = Nil

  /** dbt `pre_hook` / `post_hook`: SQL statements run immediately
    * before / after this model materializes (GRANTs, audit inserts,
    * ANALYZE). Rendered through the same `{{ ref }}`/`{{ source }}`/
    * `{{ this }}` substitution as model SQL. */
  def preHooks: Seq[String] = Nil
  def postHooks: Seq[String] = Nil

  /** dbt `tags`: free-form labels selectable via the `tag:NAME` atom in
    * the selection algebra (`run --select tag:nightly`), composing with
    * graph operators and exclusion like any other selector. */
  def tags: Seq[String] = Nil

  /** dbt `event_time`: declares which column carries this model's event
    * time. On a microbatch model's INPUT, the engine auto-filters the
    * input to the batch window on this column; None = read in full. */
  def eventTime: Option[String] = None

  /** dbt `description`: documentation carried into the docs manifest
    * (the persist_docs surface — consumers browse it, it never affects
    * execution). */
  def description: String = ""

  /** dbt model contracts (`contract: enforced` + a `columns:` block with
    * `data_type`s): when non-empty, the built frame must produce EXACTLY
    * these columns with exactly these Spark SQL types — extra, missing,
    * or type-drifted columns fail the node BEFORE materialization, so a
    * breaking schema change can never reach the relation downstream
    * consumers contract on. Empty = unenforced (dbt's default). */
  def contract: Seq[ColumnContract] = Nil

  /** dbt MODEL VERSIONS (m18): a versioned model is one member of a
    * family — its name MUST be `<base>_v<version>` (the file-level
    * stand-in for schema.yml `versions:`, matching dbt's default
    * `defined_in` file naming and database identifiers). An unpinned
    * `ref('<base>')` resolves to the family's latest version;
    * `ref('<base>', v=N)` pins member N. */
  def version: Option[Int] = None

  /** dbt `latest_version`: pins which family member unpinned refs get.
    * Declarable on any member (all declarations must agree); default =
    * the family's highest version — dbt's default. Letting it sit BELOW
    * the highest version is the prerelease pattern (v2 exists, v1 still
    * canonical). */
  def latestVersion: Option[Int] = None

  /** dbt `deprecation_date` (ISO date): once passed, every model whose
    * ref resolves to this version gets a deprecation warning through
    * the DAG ([[Runner.versionWarnings]]). */
  def deprecationDate: Option[String] = None

  /** The family base name, when versioned: `name` minus the mandatory
    * `_v<version>` suffix. */
  final def versionBase: Option[String] = version.map { v =>
    val suffix = s"_v$v"
    require(name.endsWith(suffix) && name.length > suffix.length,
      s"versioned model '$name' (version=$v) must be named <base>$suffix")
    name.dropRight(suffix.length)
  }

  /** dbt `group` (m19): the ownership group this model belongs to.
    * Groups scope `access: private` — selection exposes them via the
    * `group:NAME` atom. */
  def group: Option[String] = None

  /** dbt `access` (m19): `private` (ref-able only from the same group),
    * `protected` (the default — ref-able within this project), or
    * `public` (ref-able anywhere, the cross-project contract surface;
    * within one project it behaves like protected). Enforced at Runner
    * construction — a violating ref fails the parse, dbt's semantics,
    * so an access break can never reach execution. */
  def access: Option[String] = None
}

/** One column of a model contract: `dataType` is Spark SQL DDL
  * (`bigint`, `string`, `decimal(38,2)`, `array<string>`, …). */
final case class ColumnContract(name: String, dataType: String) {
  require(name.nonEmpty && dataType.nonEmpty,
    "contract column needs name and data_type")
}

/** A SQL model: one SELECT with `{{ ref('x') }}` / `{{ source('s','t') }}`
  * tokens, executed through `spark.sql` so Catalyst does all optimization
  * (view inlining, pushdown, join planning — SURVEY §4).
  */
final case class SqlModel(
    name: String,
    sql: String,
    materialization: Materialization = Materialization.View,
    customSchema: Option[String] = None,
    override val clusterBy: Seq[String] = Nil,
    override val preHooks: Seq[String] = Nil,
    override val postHooks: Seq[String] = Nil,
    override val tags: Seq[String] = Nil,
    override val contract: Seq[ColumnContract] = Nil,
    override val eventTime: Option[String] = None,
    override val description: String = "",
    override val version: Option[Int] = None,
    override val latestVersion: Option[Int] = None,
    override val deprecationDate: Option[String] = None,
    override val group: Option[String] = None,
    override val access: Option[String] = None) extends Model {
  lazy val refs: Seq[String] = Renderer.refsIn(sql)
  lazy val sources: Seq[(String, String)] = Renderer.sourcesIn(sql)
}

/** A code model: a Scala function building a DataFrame from resolved refs —
  * the Spark-native equivalent of the reference's Snowpark Python model
  * (sales_metrics_by_location.py:3-78, `def model(dbt, session)` where
  * `dbt.ref(...)` returns lazy DataFrames).
  */
final case class DfModel(
    name: String,
    refNames: Seq[String],
    build: (SparkSession, String => DataFrame) => DataFrame,
    materialization: Materialization = Materialization.Table,
    customSchema: Option[String] = None,
    sourceNames: Seq[(String, String)] = Nil,
    override val clusterBy: Seq[String] = Nil,
    override val tags: Seq[String] = Nil,
    override val contract: Seq[ColumnContract] = Nil) extends Model {
  def refs: Seq[String] = refNames
  def sources: Seq[(String, String)] = sourceNames
}

/** A seed: a version-controlled CSV shipped with the project and
  * materialized as a table — dbt's `seeds/` tier (the reference declares
  * `seed-paths: [seeds]`, dbt_project.yml:11). Loaded with header +
  * schema inference (dbt's agate-typed load); a seed has no refs or
  * sources — it is a DAG root other models `{{ ref(...) }}`. Content
  * participates in state fingerprinting (editing the CSV makes the seed
  * `state:modified`, dbt's seed checksum semantics).
  */
final case class SeedModel(
    name: String,
    csvPath: String,
    customSchema: Option[String] = None) extends Model {
  def materialization: Materialization = Materialization.Table
  def refs: Seq[String] = Nil
  def sources: Seq[(String, String)] = Nil
}

/** Source-freshness thresholds — dbt's `freshness: warn_after /
  * error_after` blocks (the reference declares only `loaded_at_field`,
  * __sources.yml:168; thresholds are the dbt semantics layered on top):
  * age ≤ warn ⇒ pass, ≤ error ⇒ warn, beyond ⇒ error. */
final case class FreshnessPolicy(
    warnAfterSeconds: Long,
    errorAfterSeconds: Long) {
  require(warnAfterSeconds > 0 && errorAfterSeconds >= warnAfterSeconds,
    "error_after must be at least warn_after, both positive")
}

/** A declared source: a named external relation with a loader — the engine
  * analogue of a dbt source registry entry (__sources.yml:2-7). At cluster
  * scale the loader is a catalog/parquet-path read; tests attach here.
  *
  * `loadedAtField` is dbt's source-freshness hook (`loaded_at_field:
  * ORDER_TS`, __sources.yml:168, SURVEY A7): when set, the engine can
  * report `max(loadedAtField)` vs the wall clock per source; `freshness`
  * adds the warn/error verdict thresholds.
  */
final case class SourceDef(
    sourceName: String,
    table: String,
    load: SparkSession => DataFrame,
    loadedAtField: Option[String] = None,
    freshness: Option[FreshnessPolicy] = None,
    /** dbt `event_time` on a source: lets microbatch consumers filter
      * this source to the batch window (see [[Model.eventTime]]). */
    eventTimeField: Option[String] = None)

/** Target environment (profiles.yml:2-19 — dev/prod outputs differing only
  * in schema). */
final case class Target(name: String, schema: String)
object Target {
  val dev: Target = Target("dev", "dev")
  val prod: Target = Target("prod", "prod")
}

/** A `run-operation` macro: named SQL statements with optional
  * default args (dbt macro kwarg defaults); see [[Project.operations]]. */
final case class Operation(
    name: String,
    statements: Seq[String],
    defaultArgs: Map[String, String] = Map.empty)

/** One `selectors.yml` entry; see [[Project.selectors]]. */
final case class NamedSelector(
    name: String,
    definition: String,
    default: Boolean = false,
    description: String = "")

/** dbt exposures: named downstream consumers of the DAG — dashboards,
  * ML pipelines, applications — declared in the project so lineage
  * extends past the warehouse edge. An exposure is not runnable; it
  * anchors selection (`+exposure:name` = everything the consumer needs)
  * and documentation (docs manifest carries owner/url for impact
  * analysis: "who breaks if this mart changes?"). */
final case class Exposure(
    name: String,
    exposureType: String,
    dependsOn: Seq[String],
    owner: String = "",
    url: Option[String] = None) {
  require(Set("dashboard", "notebook", "analysis", "ml", "application")(
    exposureType), s"unknown exposure type '$exposureType'")
  require(dependsOn.nonEmpty, s"exposure $name depends on nothing")
}

final case class Project(
    sources: Seq[SourceDef],
    models: Seq[Model],
    tests: Seq[DataTest] = Nil,
    /** dbt `vars:` project block — defaults for `{{ var(...) }}`;
      * invocation-level vars (CLI `--vars`, the Runner parameter)
      * override these, dbt's precedence. */
    vars: Map[String, String] = Map.empty,
    /** dbt 1.8 unit tests — model-logic fixtures (see [[UnitTest]]). */
    unitTests: Seq[UnitTest] = Nil,
    /** dbt exposures — downstream consumers (see [[Exposure]]). */
    exposures: Seq[Exposure] = Nil,
    /** dbt semantic-layer metrics (see [[Metric]]/[[Metrics]]). */
    metrics: Seq[Metric] = Nil,
    /** MetricFlow saved queries (see [[SavedQuery]]) — validated here
      * so an off-governance bundle is a PROJECT error, before any
      * export could schedule it. */
    savedQueries: Seq[SavedQuery] = Nil,
    /** dbt `on-run-start` — invocation-level SQL run ONCE before any
      * node of a `run` (audit bookkeeping, setup DDL). Statements run
      * in order through the same `ref`/`source`/`var` rendering as
      * model hooks (no `{{ this }}` — there is no node); a failure
      * aborts the invocation before any node builds. */
    onRunStart: Seq[String] = Nil,
    /** dbt `on-run-end` — the closing pair: runs ONCE after every
      * selected node has finished, INCLUDING when nodes failed (the
      * audit row must record the failed invocation too); a hook
      * failure fails the invocation. */
    onRunEnd: Seq[String] = Nil,
    /** dbt `run-operation` macros — named maintenance procedures
      * invoked OUTSIDE any DAG run (`run-operation NAME --args ...`):
      * grants, manual audit rows, cleanup DDL. Statements render
      * through the same `ref`/`source`/`var` pipeline as hooks; the
      * invocation's `--args` overlay the var scope for the operation's
      * statements only (dbt's macro kwargs, in this engine's
      * `{{ var(...) }}` spelling). */
    operations: Seq[Operation] = Nil,
    /** dbt `selectors.yml` — NAMED, reusable selection bundles: a
      * selector's `definition` is an expression in the same selection
      * algebra `--select` takes; `--selector NAME` resolves it, and at
      * most one selector may be `default: true` (used by `run` when no
      * selection is given — dbt's precedence: `--select` beats
      * `--selector` beats the default selector beats everything). */
    selectors: Seq[NamedSelector] = Nil) {
  require(operations.map(_.name).distinct.size == operations.size,
    "duplicate operation names")
  require(selectors.map(_.name).distinct.size == selectors.size,
    "duplicate selector names")
  require(selectors.count(_.default) <= 1,
    "at most one selector may be default: true")
  require(models.map(_.name).distinct.size == models.size,
    "duplicate model names")
  require(metrics.map(_.name).distinct.size == metrics.size,
    "duplicate metric names")
  metrics.foreach(m => require(models.exists(_.name == m.model),
    s"metric '${m.name}' anchors unknown model '${m.model}'"))
  metrics.filter(_.agg == "derived").foreach { m =>
    Seq(m.numerator, m.denominator).flatten.foreach(ref =>
      require(metrics.exists(_.name == ref),
        s"derived metric '${m.name}' references unknown metric '$ref'"))
  }
  // Acyclicity of the derived-reference graph, checked HERE so a cycle
  // is a governance error at project construction — Metrics.query and
  // SavedQuery's leaf walk both recurse through these references and
  // would otherwise StackOverflow at run time.
  locally {
    def walk(name: String, path: List[String]): Unit = {
      require(!path.contains(name),
        "derived metric reference cycle: " +
          (name :: path).reverse.mkString(" -> "))
      metrics.find(_.name == name).filter(_.agg == "derived").foreach {
        m => Seq(m.numerator, m.denominator).flatten
          .foreach(walk(_, name :: path))
      }
    }
    metrics.filter(_.agg == "derived").foreach(m => walk(m.name, Nil))
  }
  require(savedQueries.map(_.name).distinct.size == savedQueries.size,
    "duplicate saved query names")
  savedQueries.foreach { sq =>
    // Every leaf metric a member resolves to (derived refs included)
    // must govern the bundle's slice, and a grain needs ONE shared time
    // dimension across the leaves — otherwise the per-metric grain
    // columns could not join into one frame.
    def leaves(name: String): Seq[Metric] = {
      val m = metrics.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"saved query '${sq.name}' references unknown metric '$name'"))
      if (m.agg == "derived")
        Seq(m.numerator, m.denominator).flatten.flatMap(leaves)
      else Seq(m)
    }
    val leafMetrics = sq.metrics.flatMap(leaves)
    sq.metrics.foreach { name =>
      val m = metrics.find(_.name == name).get
      val bad = sq.groupBy.filterNot(m.dimensions.contains)
      require(bad.isEmpty,
        s"saved query '${sq.name}': metric '$name' is not sliceable " +
          s"by ${bad.mkString(", ")} — governed dimensions: " +
          m.dimensions.mkString(", "))
    }
    // The LEAVES too: a derived member resolves through its leaf
    // metrics at query time, so an off-governance slice reachable only
    // through a derived reference must fail HERE, not when the bundle
    // is first run or exported.
    leafMetrics.foreach { m =>
      val bad = sq.groupBy.filterNot(m.dimensions.contains)
      require(bad.isEmpty,
        s"saved query '${sq.name}': leaf metric '${m.name}' is not " +
          s"sliceable by ${bad.mkString(", ")} — governed dimensions: " +
          m.dimensions.mkString(", "))
    }
    if (sq.grain.nonEmpty) {
      val timeDims = leafMetrics.map(m => m.timeDimension.getOrElse(
        throw new IllegalArgumentException(
          s"saved query '${sq.name}': metric '${m.name}' declares no " +
            "time dimension"))).distinct
      require(timeDims.size == 1,
        s"saved query '${sq.name}' mixes time dimensions " +
          s"${timeDims.mkString(", ")} — a grained bundle needs one")
    }
  }
  def model(name: String): Model =
    models.find(_.name == name)
      .getOrElse(throw new NoSuchElementException(s"model not found: $name"))
}
