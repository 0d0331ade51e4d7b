package graft.model

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

/** Loads SQL models from a `models/` directory — the reference's
  * file-per-model layout (dbt_project.yml:8 `model-paths: ["models"]`,
  * dbt/models/staging and dbt/models/marts): a user adds or edits a
  * `.sql` file and the next run picks it up, no recompilation.
  *
  * Each file is one SELECT; the model name is the file name. Per-model
  * config rides in the file as the dbt `{{ config(...) }}` header:
  *
  * {{ config(materialized='table') }}
  * {{ config(materialized='incremental', partition_by=['day']) }}
  * {{ config(materialized='table', schema='analytics') }}
  *
  * Supported keys mirror the reference surface: `materialized`
  * (view | table | incremental | snapshot — dbt_project.yml:20-25 plus
  * dbt's snapshot blocks), `partition_by` (incremental partition
  * columns), `unique_key`/`updated_at` (snapshot SCD2 contract), and
  * `schema` (the generate_schema_name.sql custom-schema override).
  * Unknown keys fail fast — a typo'd config silently defaulting to a
  * view is how marts quietly become temp views in production.
  *
  * Code models (the reference's Python models) and sources (loaders are
  * code by nature) stay programmatic and are merged in via `load`.
  */
object ProjectLoader {

  private val ConfigR: Regex = """(?s)\{\{\s*config\s*\((.*?)\)\s*\}\}""".r
  // Values: 'quoted string' | [list] | bare word/number literal (dbt
  // renders Python literals bare — materialized=table, lookback=2,
  // invalidate_hard_deletes=true are all legal dbt spellings).
  private val PairR: Regex =
    """(\w+)\s*=\s*(?:'([^']*)'|(\[[^\]]*\])|([A-Za-z0-9_.\-]+))""".r
  private val ItemR: Regex = """'([^']*)'""".r

  /** All `*.sql` files under `modelsDir` (recursive, deterministic path
    * order) as SqlModels. */
  def loadModels(modelsDir: String): Seq[SqlModel] = {
    val root = Paths.get(modelsDir)
    require(Files.isDirectory(root), s"models dir not found: $modelsDir")
    val stream = Files.walk(root)
    val files =
      try stream.iterator().asScala
        .filter(p => p.toString.endsWith(".sql") && Files.isRegularFile(p))
        .toList.sortBy(_.toString)
      finally stream.close()
    files.map(parseModelFile)
  }

  /** All `*.csv` files under `seedsDir` (recursive, deterministic path
    * order) as SeedModels — dbt's `seed-paths` tier
    * (dbt_project.yml:11): file name = seed name, loaded with header +
    * inference at materialization time. */
  def loadSeeds(seedsDir: String): Seq[SeedModel] = {
    val root = Paths.get(seedsDir)
    require(Files.isDirectory(root), s"seeds dir not found: $seedsDir")
    val stream = Files.walk(root)
    val files =
      try stream.iterator().asScala
        .filter(p => p.toString.endsWith(".csv") && Files.isRegularFile(p))
        .toList.sortBy(_.toString)
      finally stream.close()
    files.map(p => SeedModel(
      p.getFileName.toString.stripSuffix(".csv"), p.toString))
  }

  /** dbt `analysis-paths`: analyses are version-controlled SELECTs that
    * COMPILE with the project (ref/source/var rendering) but never run
    * or materialize — scratch queries that stay lint-checked against
    * the DAG. One file per analysis; no config header. */
  def loadAnalyses(analysesDir: String): Seq[(String, String)] = {
    val root = Paths.get(analysesDir)
    require(Files.isDirectory(root), s"analyses dir not found: $analysesDir")
    val stream = Files.walk(root)
    val files =
      try stream.iterator().asScala
        .filter(p => p.toString.endsWith(".sql") && Files.isRegularFile(p))
        .toList.sortBy(_.toString)
      finally stream.close()
    files.map(p => p.getFileName.toString.stripSuffix(".sql") ->
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim)
  }

  /** dbt `selectors.yml` (the string-definition form): named,
    * version-controlled selection bundles. The parser covers the
    * published shape —
    * {{{
    * selectors:
    *   - name: nightly
    *     description: the nightly build slice
    *     default: true
    *     definition: "+customer_order_metrics tag:mart"
    * }}}
    * — a flat list of entries whose `definition` is a STRING in the
    * engine's selection algebra (dbt accepts exactly this form; its
    * nested union/intersection YAML trees are the same algebra spelled
    * structurally, which the string form already expresses with
    * space = union and comma = intersection). Line-based: `- name:`
    * starts an entry; quoted values unquote. */
  def loadSelectors(path: String): Seq[NamedSelector] = {
    val p = Paths.get(path)
    require(Files.isRegularFile(p), s"selectors file not found: $path")
    val lines = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#")).toList
    def unquote(v: String): String = {
      val t = v.trim
      if ((t.startsWith("\"") && t.endsWith("\"") && t.length >= 2) ||
          (t.startsWith("'") && t.endsWith("'") && t.length >= 2))
        t.substring(1, t.length - 1)
      else t
    }
    val entries = scala.collection.mutable.ArrayBuffer
      .empty[scala.collection.mutable.Map[String, String]]
    lines.foreach {
      case l if l.startsWith("- name:") =>
        entries += scala.collection.mutable.Map(
          "name" -> unquote(l.stripPrefix("- name:")))
      case l if l.startsWith("selectors:") => ()
      case l if entries.nonEmpty && l.contains(":") =>
        val Array(k, v) = l.split(":", 2)
        entries.last += (k.trim -> unquote(v))
      case l => require(!l.startsWith("- "),
        s"selectors.yml entries must start with '- name:', got: $l")
    }
    entries.map { e =>
      NamedSelector(
        name = e.getOrElse("name",
          throw new IllegalArgumentException("selector without a name")),
        definition = e.getOrElse("definition",
          throw new IllegalArgumentException(
            s"selector '${e("name")}' has no definition")),
        default = e.get("default").exists(_.equalsIgnoreCase("true")),
        description = e.getOrElse("description", ""))
    }.toIndexedSeq
  }

  /** A complete project from a models directory plus the programmatic
    * tier: sources, code models, declared tests, and an optional dbt
    * `seeds/` directory (seeds join the DAG as ref-able roots). */
  def load(modelsDir: String, sources: Seq[SourceDef],
      codeModels: Seq[Model] = Nil, tests: Seq[DataTest] = Nil,
      seedsDir: Option[String] = None): Project =
    Project(sources,
      seedsDir.map(loadSeeds).getOrElse(Nil) ++ loadModels(modelsDir) ++
        codeModels,
      tests)

  def parseModelFile(p: Path): SqlModel = {
    val name = p.getFileName.toString.stripSuffix(".sql")
    parseModel(name,
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8), p.toString)
  }

  /** Splits the optional config header from the SQL body and builds the
    * model. Exposed for spec-level parsing tests. */
  def parseModel(name: String, raw: String, where: String = "<inline>")
      : SqlModel = {
    val blocks = ConfigR.findAllMatchIn(raw).toList
    // Every block is STRIPPED from the SQL below, so a second one would
    // otherwise vanish without its keys ever being seen — fail instead.
    require(blocks.size <= 1,
      s"$where: ${blocks.size} {{ config(...) }} blocks; merge into one")
    val cfg: Map[String, Either[String, Seq[String]]] =
      blocks.headOption.map { m =>
        // Full-consumption check: any fragment the pair grammar did not
        // match would silently drop its key (the exact failure mode the
        // unknown-key require exists to prevent).
        val leftover = PairR.replaceAllIn(m.group(1), "")
          .replaceAll("[\\s,]+", "")
        require(leftover.isEmpty,
          s"$where: unparseable config fragment '$leftover' — values " +
            "must be 'quoted', [lists], or bare word/number literals")
        PairR.findAllMatchIn(m.group(1)).map { kv =>
          val value = Option(kv.group(2)).orElse(Option(kv.group(4)))
            .map(Left(_)).getOrElse(
              Right(ItemR.findAllMatchIn(kv.group(3)).map(_.group(1)).toSeq))
          kv.group(1) -> value
        }.toMap
      }.getOrElse(Map.empty)
    val unknown = cfg.keySet --
      Set("materialized", "partition_by", "schema", "unique_key",
        "updated_at", "strategy", "check_cols", "snapshot_at",
        "invalidate_hard_deletes", "on_schema_change", "cluster_by",
        "pre_hook", "post_hook", "tags", "contract",
        "incremental_strategy", "event_time", "batch_size", "lookback",
        "begin", "description", "version", "latest_version",
        "deprecation_date", "group", "access")
    require(unknown.isEmpty, s"$where: unsupported config keys: " +
      unknown.mkString(", "))

    def str(k: String): Option[String] = cfg.get(k).map {
      case Left(s) => s
      case Right(_) => throw new IllegalArgumentException(
        s"$where: config $k must be a string")
    }
    def list(k: String): Option[Seq[String]] = cfg.get(k).map {
      case Right(xs) => xs
      case Left(s) => Seq(s)
    }

    def required(k: String, forWhat: String): String =
      str(k).getOrElse(throw new IllegalArgumentException(
        s"$where: $forWhat model requires $k"))
    val materialization = str("materialized").getOrElse("view") match {
      case "view" => Materialization.View
      case "table" => Materialization.Table
      case "ephemeral" => Materialization.Ephemeral
      case "incremental" if str("incremental_strategy")
          .contains("microbatch") =>
        // dbt 1.9 microbatch: event-time batches, each replacing its own
        // period partition; partition_by/unique_key do not apply.
        require(list("partition_by").isEmpty && list("unique_key").isEmpty,
          s"$where: microbatch derives its partition from event_time")
        Materialization.Microbatch(
          required("event_time", "microbatch"),
          str("batch_size").getOrElse("day"),
          str("lookback").map(_.toInt).getOrElse(1),
          str("begin"))
      case "incremental" =>
        // dbt keys the strategy off the config: partition_by → dynamic
        // partition overwrite, unique_key → delete+insert merge.
        val policy = str("on_schema_change").getOrElse("ignore")
        (list("partition_by"), list("unique_key")) match {
          case (Some(p), None) =>
            Materialization.IncrementalByPartition(p, policy)
          case (None, Some(k)) => Materialization.IncrementalByKey(k, policy)
          // dbt's default incremental strategy: plain append.
          case (None, None) => Materialization.IncrementalAppend(policy)
          case _ => throw new IllegalArgumentException(
            s"$where: incremental model takes at most one of " +
              "partition_by or unique_key")
        }
      case "snapshot" =>
        // dbt snapshot strategies: timestamp (default) keys change
        // detection off updated_at; check compares check_cols (empty ⇒
        // every non-key column).
        str("strategy").getOrElse("timestamp") match {
          case "timestamp" =>
            Materialization.Snapshot(required("unique_key", "snapshot"),
              required("updated_at", "snapshot"))
          case "check" =>
            Materialization.SnapshotCheck(required("unique_key", "snapshot"),
              list("check_cols").getOrElse(Nil), str("snapshot_at"),
              str("invalidate_hard_deletes").contains("true"))
          case other => throw new IllegalArgumentException(
            s"$where: unknown snapshot strategy '$other'")
        }
      case other => throw new IllegalArgumentException(
        s"$where: unknown materialization '$other'")
    }
    require(materialization.isInstanceOf[Materialization.IncrementalByPartition]
        || cfg.get("partition_by").isEmpty,
      s"$where: partition_by requires materialized='incremental'")
    require(cfg.get("on_schema_change").isEmpty
        || materialization.isInstanceOf[Materialization.IncrementalByPartition]
        || materialization.isInstanceOf[Materialization.IncrementalByKey]
        || materialization.isInstanceOf[Materialization.IncrementalAppend],
      s"$where: on_schema_change requires materialized='incremental'")
    require(cfg.get("unique_key").isEmpty
        || materialization.isInstanceOf[Materialization.Snapshot]
        || materialization.isInstanceOf[Materialization.SnapshotCheck]
        || materialization.isInstanceOf[Materialization.IncrementalByKey],
      s"$where: unique_key requires materialized='snapshot' or 'incremental'")
    require(materialization.isInstanceOf[Materialization.Snapshot]
        || cfg.get("updated_at").isEmpty,
      s"$where: updated_at requires materialized='snapshot'")
    require(cfg.get("incremental_strategy").isEmpty
        || materialization.isInstanceOf[Materialization.Microbatch],
      s"$where: incremental_strategy supports only 'microbatch'")
    require((cfg.get("batch_size").isEmpty && cfg.get("lookback").isEmpty &&
        cfg.get("begin").isEmpty)
        || materialization.isInstanceOf[Materialization.Microbatch],
      s"$where: batch_size/lookback/begin require " +
        "incremental_strategy='microbatch'")
    require((cfg.get("strategy").isEmpty && cfg.get("check_cols").isEmpty &&
        cfg.get("snapshot_at").isEmpty &&
        cfg.get("invalidate_hard_deletes").isEmpty)
        || materialization.isInstanceOf[Materialization.Snapshot]
        || materialization.isInstanceOf[Materialization.SnapshotCheck],
      s"$where: snapshot config keys require materialized='snapshot'")

    val sql = ConfigR.replaceAllIn(raw, "").trim
    require(sql.nonEmpty, s"$where: model file has no SQL body")
    SqlModel(name, sql, materialization, customSchema = str("schema"),
      clusterBy = list("cluster_by").getOrElse(Nil),
      preHooks = list("pre_hook").getOrElse(Nil),
      postHooks = list("post_hook").getOrElse(Nil),
      tags = list("tags").getOrElse(Nil),
      // The file-level stand-in for dbt's schema.yml contract block:
      // contract=['col:type', ...] — first ':' splits name from the Spark
      // SQL DDL type (types themselves may contain ':', e.g. struct<a:int>).
      contract = list("contract").getOrElse(Nil).map { item =>
        item.split(":", 2) match {
          case Array(n, t) => ColumnContract(n.trim, t.trim)
          case _ => throw new IllegalArgumentException(
            s"$where: contract entries are 'column:data_type', got: $item")
        }
      },
      // event_time doubles as the microbatch config and the input-side
      // declaration (dbt semantics: any model may declare one).
      eventTime = str("event_time"),
      description = str("description").getOrElse(""),
      // dbt model versions (m18): version marks a family member (the
      // file name must be <base>_v<version>.sql — validated by
      // Model.versionBase); latest_version/deprecation_date only make
      // sense on a member.
      version = str("version").map(_.toInt),
      latestVersion = {
        require(str("latest_version").isEmpty || str("version").nonEmpty,
          s"$where: latest_version requires version")
        str("latest_version").map(_.toInt)
      },
      deprecationDate = {
        require(str("deprecation_date").isEmpty || str("version").nonEmpty,
          s"$where: deprecation_date requires version")
        str("deprecation_date")
      },
      // dbt groups + access (m19): access values are the dbt triple;
      // a typo must not silently default to protected.
      group = str("group"),
      access = str("access").map { a =>
        require(Set("private", "protected", "public")(a),
          s"$where: access must be private|protected|public, got '$a'")
        a
      })
  }
}
