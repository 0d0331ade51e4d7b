package graft.model

import org.scalatest.funsuite.AnyFunSuite

class DagSpec extends AnyFunSuite {

  val deps: Map[String, Seq[String]] = Map(
    "a" -> Nil,
    "b" -> Seq("a"),
    "c" -> Seq("a"),
    "d" -> Seq("b", "c"),
    "e" -> Nil)

  test("toposort is deterministic and respects dependencies") {
    val order = Dag.toposort(deps)
    assert(order.size == 5)
    for ((n, ups) <- deps; u <- ups)
      assert(order.indexOf(u) < order.indexOf(n), s"$u must precede $n")
    assert(order == Dag.toposort(deps), "deterministic")
    assert(order.head == "a", "alphabetical tie-break among roots")
  }

  test("cycle detection") {
    val cyclic = Map("x" -> Seq("y"), "y" -> Seq("x"), "z" -> Nil)
    val e = intercept[IllegalStateException](Dag.toposort(cyclic))
    assert(e.getMessage.contains("x") && e.getMessage.contains("y"))
  }

  test("ancestors / descendants") {
    assert(Dag.ancestors("d", deps) == Set("a", "b", "c"))
    assert(Dag.descendants("a", deps) == Set("b", "c", "d"))
    assert(Dag.ancestors("a", deps).isEmpty)
  }

  test("selection expressions") {
    assert(Dag.select("d", deps) == Set("d"))
    assert(Dag.select("+d", deps) == Set("a", "b", "c", "d"))
    assert(Dag.select("a+", deps) == Set("a", "b", "c", "d"))
    assert(Dag.select("+b+", deps) == Set("a", "b", "d"))
    intercept[IllegalArgumentException](Dag.select("nope", deps))
  }

  test("selection algebra: union, intersection, exclude") {
    // space = union
    assert(Dag.selectMany("b e", deps) == Set("b", "e"))
    assert(Dag.selectMany("+b e", deps) == Set("a", "b", "e"))
    // comma = intersection: nodes both downstream of b and upstream of d
    assert(Dag.selectMany("b+,+d", deps) == Set("b", "d"))
    // exclude subtracts its own graph-expanded selection
    assert(Dag.resolve(None, None, deps) == deps.keySet)
    assert(Dag.resolve(None, Some("d"), deps) == Set("a", "b", "c", "e"))
    assert(Dag.resolve(Some("+d"), Some("c+"), deps) == Set("a", "b"))
    assert(Dag.resolve(Some("a+ e"), Some("+d"), deps) == Set("e"))
    intercept[IllegalArgumentException](Dag.selectMany("  ", deps))
  }
}
