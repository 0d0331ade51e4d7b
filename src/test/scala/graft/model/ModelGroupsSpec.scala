package graft.model

import graft.SparkSuite
import graft.operators.TpchProject

/** dbt groups + access (m19) beyond the gate: the full access triple,
  * parse-time enforcement, and the `group:NAME` selection atom's
  * composition with graph operators.
  */
class ModelGroupsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def m(name: String, ref: Option[String] = None,
      group: Option[String] = None, access: Option[String] = None)
      : SqlModel =
    SqlModel(name,
      ref.map(r => s"SELECT * FROM {{ ref('$r') }}").getOrElse(
        "SELECT n_nationkey AS id FROM {{ source('tpch', 'nation') }}"),
      group = group, access = access)

  private def runner(models: Seq[Model]): Runner =
    new Runner(Project(TpchProject.sources(dir), models), Target.dev,
      new PathMaterializer(java.nio.file.Files
        .createTempDirectory("graft_groups_spec").toString))

  test("private is ref-able only within its group; protected and " +
      "public are open within the project") {
    val priv = m("core_a", group = Some("core"), access = Some("private"))
    // Same group: fine.
    runner(Seq(priv, m("core_b", ref = Some("core_a"),
      group = Some("core"))))
    // No group / other group: parse-time failure.
    intercept[IllegalArgumentException] {
      runner(Seq(priv, m("loose", ref = Some("core_a"))))
    }
    intercept[IllegalArgumentException] {
      runner(Seq(priv, m("mkt", ref = Some("core_a"),
        group = Some("marketing"))))
    }
    // protected (explicit and default) and public cross group freely.
    runner(Seq(
      m("core_c", group = Some("core"), access = Some("protected")),
      m("core_d", group = Some("core"), access = Some("public")),
      m("core_e", group = Some("core")),
      m("x1", ref = Some("core_c"), group = Some("marketing")),
      m("x2", ref = Some("core_d")),
      m("x3", ref = Some("core_e"), group = Some("marketing"))))
  }

  test("access enforcement sees through version aliases: an unpinned " +
      "ref to a private latest member is still checked") {
    val priv = SqlModel("dim_g_v1",
      "SELECT n_nationkey AS id FROM {{ source('tpch', 'nation') }}",
      version = Some(1), group = Some("core"), access = Some("private"))
    intercept[IllegalArgumentException] {
      runner(Seq(priv, m("outside", ref = Some("dim_g"))))
    }
    runner(Seq(priv, m("inside", ref = Some("dim_g"),
      group = Some("core"))))
  }

  test("group:NAME selection composes with graph operators; unknown " +
      "group selects nothing") {
    val models = Seq(
      m("core_a", group = Some("core")),
      m("downstream", ref = Some("core_a")),
      m("other"))
    val r = runner(models)
    val sel = r.run(spark, select = Some("group:core+"))
      .map(_.name).toSet
    assert(sel == Set("core_a", "downstream"))
    assert(r.run(spark, select = Some("group:nope")).isEmpty)
  }

  test("loader parses group/access; a typo'd access fails fast") {
    val p = ProjectLoader.parseModel("g",
      "{{ config(group='core', access='private') }}\nSELECT 1")
    assert(p.group.contains("core") && p.access.contains("private"))
    intercept[IllegalArgumentException] {
      ProjectLoader.parseModel("g",
        "{{ config(access='secret') }}\nSELECT 1")
    }
  }
}
