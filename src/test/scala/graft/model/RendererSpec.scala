package graft.model

import org.scalatest.funsuite.AnyFunSuite

class RendererSpec extends AnyFunSuite {

  val sql: String =
    """SELECT * FROM {{ ref('stg_orders') }} o
      |JOIN {{ source('tpch', 'customer') }} c ON o.k = c.k
      |LEFT JOIN {{ ref('stg_nation') }} n ON c.n = n.n
      |JOIN {{ ref('stg_orders') }} o2 ON o.k = o2.k""".stripMargin

  test("extracts distinct refs and sources") {
    assert(Renderer.refsIn(sql) == Seq("stg_orders", "stg_nation"))
    assert(Renderer.sourcesIn(sql) == Seq(("tpch", "customer")))
  }

  test("renders tokens to relation names") {
    val out = Renderer.render(sql,
      ref = r => s"dev_$r",
      source = (s, t) => s"src_${s}_$t")
    assert(!out.contains("{{"))
    assert(out.contains("dev_stg_orders o"))
    assert(out.contains("src_tpch_customer c"))
    assert(out.contains("dev_stg_nation n"))
  }

  test("tolerates flexible whitespace in tokens") {
    assert(Renderer.refsIn("{{ref('x')}} {{  ref( 'y' )  }}") ==
      Seq("x", "y"))
    assert(Renderer.sourcesIn("{{source('a','b')}}") == Seq(("a", "b")))
  }

  test("var substitutes supplied values, falls back to defaults") {
    val sql = "SELECT * FROM t WHERE a > {{ var('cutoff', 10) }} " +
      "AND b = '{{ var('label', 'none') }}' AND c > {{ var('req') }}"
    val out = Renderer.render(sql, identity, (_, t) => t,
      vars = Map("cutoff" -> "42", "req" -> "7"))
    assert(out.contains("a > 42"))
    assert(out.contains("b = 'none'")) // quoted default, no binding
    assert(out.contains("c > 7"))
    // Bare (unquoted) default used when unbound.
    val bare = Renderer.render("x > {{ var('cutoff', 10) }}",
      identity, (_, t) => t)
    assert(bare == "x > 10")
  }

  test("var without binding or default fails the render") {
    val e = intercept[IllegalArgumentException] {
      Renderer.render("SELECT {{ var('missing') }}", identity, (_, t) => t)
    }
    assert(e.getMessage.contains("missing"))
  }

  test("date_spine renders an end-exclusive generated relation") {
    val out = Renderer.render(
      """SELECT date_day FROM {{ dbt_utils.date_spine('day',
        |  "DATE '2024-01-01'", "DATE '2024-01-04'") }}""".stripMargin,
      identity, (_, t) => t)
    assert(out.contains("explode(sequence("))
    assert(out.contains("date_day < CAST(DATE '2024-01-04' AS DATE)"))
    // The bare (non-namespaced) spelling works too, dbt-style.
    assert(Renderer.render(
      """{{ date_spine('month', "DATE '2024-01-01'", "DATE '2024-04-01'") }}""",
      identity, (_, t) => t).contains("INTERVAL 1 month"))
  }

  test("this and incremental_filter render per target-relation state") {
    val sql = "SELECT * FROM {{ ref('up') }} " +
      "WHERE {{ incremental_filter('ts') }} -- target {{ this }}"
    val firstRun = Renderer.render(sql, r => s"dev_$r", (_, t) => t,
      thisRelation = Some("dev_m"), thisExists = false)
    assert(firstRun.contains("WHERE 1=1"))
    assert(firstRun.contains("target dev_m"))
    val laterRun = Renderer.render(sql, r => s"dev_$r", (_, t) => t,
      thisRelation = Some("dev_m"), thisExists = true)
    assert(laterRun.contains("WHERE ts > (SELECT MAX(ts) FROM dev_m)"))
  }
}
