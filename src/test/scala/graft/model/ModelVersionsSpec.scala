package graft.model

import graft.SparkSuite
import graft.operators.TpchProject

/** dbt model versions (m18) beyond the gate's happy path: the
  * prerelease pattern (latest_version pinned BELOW the highest member),
  * config validation (naming contract, duplicate versions, conflicting
  * latest declarations, base-name collisions), and renderer parsing of
  * the pinned-ref forms.
  */
class ModelVersionsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def member(v: Int, latest: Option[Int] = None): SqlModel =
    SqlModel(s"dim_x_v$v",
      s"SELECT n_nationkey AS id, $v AS ver " +
        "FROM {{ source('tpch', 'nation') }}",
      Materialization.View, version = Some(v), latestVersion = latest)

  private def runner(models: Seq[Model]): Runner =
    new Runner(Project(TpchProject.sources(dir), models), Target.dev,
      new PathMaterializer(java.nio.file.Files
        .createTempDirectory("graft_mver_spec").toString))

  test("renderer: ref('m', v=N) and ref('m', version=N) canonicalize " +
      "to the member name; unpinned keeps the base") {
    val sql = "SELECT * FROM {{ ref('a', v=1) }} " +
      "JOIN {{ ref('a', version=2) }} JOIN {{ ref('a') }}"
    assert(Renderer.refsIn(sql) == Seq("a_v1", "a_v2", "a"))
    assert(Renderer.render(sql, ref = r => s"<$r>", source = (_, _) => "?")
      == "SELECT * FROM <a_v1> JOIN <a_v2> JOIN <a>")
  }

  test("prerelease: latest_version pinned below the highest member " +
      "routes unpinned refs to the pinned version") {
    val consumer = SqlModel("use_x",
      "SELECT id, ver FROM {{ ref('dim_x') }}", Materialization.Table)
    // v2 exists but v1 is declared latest — the dbt prerelease pattern.
    val r = runner(Seq(member(1, latest = Some(1)), member(2), consumer))
    assert(r.deps("use_x") == Seq("dim_x_v1"))
    r.run(spark, select = Some("+use_x"))
    val vers = r.table(spark, "use_x").select("ver")
      .distinct().collect().map(_.getInt(0)).toSeq
    assert(vers == Seq(1), s"unpinned ref must build against v1: $vers")
    // No deprecation dates anywhere -> no warnings.
    assert(r.versionWarnings.isEmpty)
  }

  test("defaults and validation") {
    // Default latest = highest version.
    assert(runner(Seq(member(1), member(3))).deps.isEmpty ||
      true) // construction alone must succeed
    val r = runner(Seq(member(1), member(3),
      SqlModel("u", "SELECT * FROM {{ ref('dim_x') }}")))
    assert(r.deps("u") == Seq("dim_x_v3"))
    // A versioned model must be named <base>_v<version>.
    intercept[IllegalArgumentException] {
      runner(Seq(SqlModel("badname", "SELECT 1",
        version = Some(2)))).deps
    }
    // Duplicate versions in one family fail.
    intercept[IllegalArgumentException] {
      runner(Seq(member(1),
        SqlModel("dim_x_v1", "SELECT 2", version = Some(1),
          customSchema = Some("other"))))
    }
    // Conflicting latest_version declarations fail.
    intercept[IllegalArgumentException] {
      runner(Seq(member(1, latest = Some(1)), member(2, latest = Some(2))))
    }
    // latest_version must name an existing member.
    intercept[IllegalArgumentException] {
      runner(Seq(member(1, latest = Some(9))))
    }
    // The family base name may not collide with a real model.
    intercept[IllegalArgumentException] {
      runner(Seq(member(1), SqlModel("dim_x", "SELECT 1"))).deps
    }
  }

  test("deprecation warnings fire only for refs that resolve onto a " +
      "deprecated version") {
    val v1 = SqlModel("dim_x_v1",
      "SELECT n_nationkey AS id FROM {{ source('tpch', 'nation') }}",
      version = Some(1), deprecationDate = Some("2020-01-01"))
    val v2 = member(2)
    val pinned = SqlModel("p",
      "SELECT * FROM {{ ref('dim_x', v=1) }}")
    val unpinned = SqlModel("u", "SELECT * FROM {{ ref('dim_x') }}")
    val r = runner(Seq(v1, v2, pinned, unpinned))
    assert(r.versionWarnings == Seq(
      "model p refs deprecated version dim_x_v1 " +
        "(deprecation_date 2020-01-01)"))
    // A FUTURE deprecation date stays silent.
    val rFuture = runner(Seq(
      v1.copy(deprecationDate = Some("2999-01-01")), v2, pinned, unpinned))
    assert(rFuture.versionWarnings.isEmpty)
  }

  test("project loader parses the version config keys") {
    val m = ProjectLoader.parseModel("dim_y_v2",
      """{{ config(materialized='table', version=2, latest_version=2,
        |   deprecation_date='2025-01-01') }}
        |SELECT 1""".stripMargin)
    assert(m.version.contains(2) && m.latestVersion.contains(2) &&
      m.deprecationDate.contains("2025-01-01"))
    // latest_version / deprecation_date without version fail fast.
    intercept[IllegalArgumentException] {
      ProjectLoader.parseModel("m", "{{ config(latest_version=2) }}\nSELECT 1")
    }
    intercept[IllegalArgumentException] {
      ProjectLoader.parseModel("m",
        "{{ config(deprecation_date='2025-01-01') }}\nSELECT 1")
    }
  }
}
