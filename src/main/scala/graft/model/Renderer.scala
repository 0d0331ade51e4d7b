package graft.model

import scala.util.matching.Regex

/** Resolves `{{ ref('x') }}` / `{{ source('s','t') }}` tokens in model SQL
  * to concrete relation names. Plain token substitution is sufficient: the
  * reference's models use no other Jinja (SURVEY §7.1 item 2).
  */
object Renderer {
  private val RefR: Regex = """\{\{\s*ref\(\s*'([^']+)'\s*\)\s*\}\}""".r
  private val SrcR: Regex =
    """\{\{\s*source\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)\s*\}\}""".r

  def refsIn(sql: String): Seq[String] =
    RefR.findAllMatchIn(sql).map(_.group(1)).toSeq.distinct

  def sourcesIn(sql: String): Seq[(String, String)] =
    SrcR.findAllMatchIn(sql).map(m => (m.group(1), m.group(2))).toSeq.distinct

  def render(
      sql: String,
      ref: String => String,
      source: (String, String) => String): String = {
    val withRefs = RefR.replaceAllIn(sql,
      m => Regex.quoteReplacement(ref(m.group(1))))
    SrcR.replaceAllIn(withRefs,
      m => Regex.quoteReplacement(source(m.group(1), m.group(2))))
  }
}
