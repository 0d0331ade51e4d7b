package graft.model

import scala.collection.mutable

/** Dependency graph utilities: deterministic toposort (Kahn, alphabetical
  * tie-break), cycle detection, and dbt-style node selection
  * (`name`, `+name`, `name+`, `+name+` — setup/task.sql:5, README:131),
  * composed with dbt's full expression algebra: space-separated selectors
  * union, comma-separated selectors intersect, and `--exclude` subtracts
  * its own selection from the result.
  */
object Dag {

  /** @param deps node -> upstream dependencies (must all be keys). */
  def toposort(deps: Map[String, Seq[String]]): Seq[String] = {
    val indeg = mutable.Map.from(deps.view.mapValues(_.size))
    val downstream = deps.toSeq
      .flatMap { case (n, ups) => ups.map(_ -> n) }
      .groupMap(_._1)(_._2)
    val ready = mutable.SortedSet.from(indeg.collect {
      case (n, 0) => n
    })
    val out = mutable.ArrayBuffer.empty[String]
    while (ready.nonEmpty) {
      val n = ready.head
      ready.remove(n)
      out += n
      downstream.getOrElse(n, Nil).foreach { d =>
        indeg(d) -= 1
        if (indeg(d) == 0) ready += d
      }
    }
    if (out.size != deps.size) {
      val stuck = deps.keySet -- out
      throw new IllegalStateException(
        s"cycle detected among models: ${stuck.toSeq.sorted.mkString(", ")}")
    }
    out.toSeq
  }

  def ancestors(node: String, deps: Map[String, Seq[String]]): Set[String] = {
    val seen = mutable.Set.empty[String]
    def walk(n: String): Unit =
      deps.getOrElse(n, Nil).foreach { u =>
        if (seen.add(u)) walk(u)
      }
    walk(node)
    seen.toSet
  }

  def descendants(node: String, deps: Map[String, Seq[String]]): Set[String] = {
    val downstream = deps.toSeq
      .flatMap { case (n, ups) => ups.map(_ -> n) }
      .groupMap(_._1)(_._2)
    val seen = mutable.Set.empty[String]
    def walk(n: String): Unit =
      downstream.getOrElse(n, Nil).foreach { d =>
        if (seen.add(d)) walk(d)
      }
    walk(node)
    seen.toSet
  }

  /** Resolve one atomic selector: `name` (with optional `+` graph
    * prefix/suffix applying ancestors/descendants), or a non-name atom
    * (`state:modified`, `state:new`, …) resolved by `atom` to a node SET —
    * the graph operators then expand over every member (dbt's
    * `state:modified+`). */
  def select(expr: String, deps: Map[String, Seq[String]],
      atom: String => Option[Set[String]] = _ => None): Set[String] = {
    val plusBefore = expr.startsWith("+")
    val plusAfter = expr.endsWith("+")
    val name = expr.stripPrefix("+").stripSuffix("+")
    val base = atom(name).getOrElse {
      require(deps.contains(name), s"unknown model in selection: $name")
      Set(name)
    }
    base ++
      (if (plusBefore) base.flatMap(ancestors(_, deps)) else Set.empty) ++
      (if (plusAfter) base.flatMap(descendants(_, deps)) else Set.empty)
  }

  /** dbt expression algebra: space-separated terms union; within a term,
    * comma-separated selectors intersect (`"a+ +b"` = either subgraph,
    * `"a+,+b"` = nodes on a path from a to b). */
  def selectMany(expr: String, deps: Map[String, Seq[String]],
      atom: String => Option[Set[String]] = _ => None): Set[String] = {
    val terms = expr.trim.split("""\s+""").filter(_.nonEmpty)
    require(terms.nonEmpty, s"empty selection expression: '$expr'")
    terms.map { term =>
      term.split(",").filter(_.nonEmpty)
        .map(select(_, deps, atom)).reduce(_ intersect _)
    }.foldLeft(Set.empty[String])(_ union _)
  }

  /** Full selection resolution: `--select` (default: everything) minus
    * `--exclude` (dbt's subtraction semantics — the exclude expression
    * expands through the same graph operators and atoms). */
  def resolve(select: Option[String], exclude: Option[String],
      deps: Map[String, Seq[String]],
      atom: String => Option[Set[String]] = _ => None): Set[String] = {
    val base = select.map(selectMany(_, deps, atom)).getOrElse(deps.keySet)
    base -- exclude.map(selectMany(_, deps, atom)).getOrElse(Set.empty)
  }
}
