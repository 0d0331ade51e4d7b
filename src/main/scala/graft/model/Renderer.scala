package graft.model

import scala.util.matching.Regex

/** Resolves `{{ ref('x') }}` / `{{ source('s','t') }}` tokens in model SQL
  * to concrete relation names. Plain token substitution is sufficient: the
  * reference's models use no other Jinja (SURVEY §7.1 item 2).
  *
  * Two engine-extension tokens support incremental models (dbt's
  * `{{ this }}` / `is_incremental()` pattern):
  *  - `{{ this }}` → the model's own target relation
  *  - `{{ incremental_filter('c') }}` → `c > (SELECT MAX(c) FROM <this>)`
  *    when the relation already exists, else `1=1` (first run = full build)
  *
  * `{{ var('name') }}` / `{{ var('name', default) }}` is dbt's project
  * variable hook: the value (project `vars:` block, overridable per
  * invocation via `--vars`) substitutes verbatim — dbt's Jinja renders the
  * Python value bare, so string-typed vars are quoted by the model author
  * (`'{{ var("region") }}'`), numeric thresholds ride unquoted. A var
  * that is neither supplied nor defaulted fails the render, dbt's
  * compile-time "Required var not found" error.
  */
object Renderer {
  // `ref('m')` or the version-pinned `ref('m', v=N)` / `ref('m',
  // version=N)` (dbt model versions, m18): a pinned ref canonicalizes
  // to the versioned model's own name `m_vN` — the name versioned model
  // files carry — so everything downstream (deps, relations, ephemeral
  // closure) sees ordinary model names; the UNPINNED ref to a versioned
  // family keeps the base name and the Runner resolves it to
  // latest_version.
  private val RefR: Regex =
    ("""\{\{\s*ref\(\s*'([^']+)'""" +
      """(?:\s*,\s*(?:v|version)\s*=\s*(\d+))?\s*\)\s*\}\}""").r

  private def refName(name: String, ver: Option[String]): String =
    ver.map(v => s"${name}_v$v").getOrElse(name)
  private val SrcR: Regex =
    """\{\{\s*source\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)\s*\}\}""".r
  private val ThisR: Regex = """\{\{\s*this\s*\}\}""".r
  private val IncR: Regex =
    """\{\{\s*incremental_filter\(\s*'([^']+)'\s*\)\s*\}\}""".r
  // group 1 = name; default is group 2 (quoted) or group 3 (bare literal).
  private val VarR: Regex =
    """\{\{\s*var\(\s*'([^']+)'(?:\s*,\s*(?:'([^']*)'|([^)\s']+)))?\s*\)\s*\}\}""".r
  // dbt_utils.date_spine(datepart, start, end): the one dbt_utils MACRO
  // (vs. test) the calendar-mart pattern needs — renders to a Spark SQL
  // inline relation producing one `date_<datepart>` row per period.
  private val SpineR: Regex =
    ("""\{\{\s*(?:dbt_utils\.)?date_spine\(\s*'(day|week|month|year)'""" +
      """\s*,\s*"([^"]+)"\s*,\s*"([^"]+)"\s*\)\s*\}\}""").r

  def refsIn(sql: String): Seq[String] =
    RefR.findAllMatchIn(sql)
      .map(m => refName(m.group(1), Option(m.group(2)))).toSeq.distinct

  def sourcesIn(sql: String): Seq[(String, String)] =
    SrcR.findAllMatchIn(sql).map(m => (m.group(1), m.group(2))).toSeq.distinct

  def render(
      sql: String,
      ref: String => String,
      source: (String, String) => String,
      thisRelation: Option[String] = None,
      thisExists: Boolean = false,
      vars: Map[String, String] = Map.empty): String = {
    val withVars = VarR.replaceAllIn(sql, m => {
      val name = m.group(1)
      val default = Option(m.group(2)).orElse(Option(m.group(3)))
      Regex.quoteReplacement(vars.get(name).orElse(default).getOrElse(
        throw new IllegalArgumentException(
          s"required var '$name' is not supplied and has no default")))
    })
    val withSpine = SpineR.replaceAllIn(withVars, m => {
      val part = m.group(1)
      // dbt_utils contract: start inclusive, END EXCLUSIVE (generate
      // inclusive, trim the end row — sidesteps date−interval typing).
      Regex.quoteReplacement(
        s"(SELECT date_$part FROM (SELECT explode(sequence(" +
          s"CAST(${m.group(2)} AS DATE), CAST(${m.group(3)} AS DATE), " +
          s"INTERVAL 1 $part)) AS date_$part) " +
          s"WHERE date_$part < CAST(${m.group(3)} AS DATE))")
    })
    val withRefs = RefR.replaceAllIn(withSpine,
      m => Regex.quoteReplacement(ref(refName(m.group(1),
        Option(m.group(2))))))
    val withSrcs = SrcR.replaceAllIn(withRefs,
      m => Regex.quoteReplacement(source(m.group(1), m.group(2))))
    val rel = thisRelation.getOrElse("")
    val withThis =
      if (thisRelation.isEmpty) withSrcs
      else ThisR.replaceAllIn(withSrcs, Regex.quoteReplacement(rel))
    IncR.replaceAllIn(withThis, m => Regex.quoteReplacement(
      if (thisExists) s"${m.group(1)} > (SELECT MAX(${m.group(1)}) FROM $rel)"
      else "1=1"))
  }
}
