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
