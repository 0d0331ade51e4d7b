package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** File-per-model loading (the reference's `model-paths` layout):
  * config-header parsing, DAG parity with the registry projects, and
  * fail-fast on malformed config. */
class ProjectLoaderSpec extends AnyFunSuite {

  test("config header: defaults, table, incremental, schema") {
    val view = ProjectLoader.parseModel("v", "SELECT 1")
    assert(view.materialization == Materialization.View)
    assert(view.customSchema.isEmpty)

    val table = ProjectLoader.parseModel("t",
      "{{ config(materialized='table') }}\nSELECT 1")
    assert(table.materialization == Materialization.Table)
    assert(table.sql == "SELECT 1")

    val inc = ProjectLoader.parseModel("i",
      "{{ config(materialized='incremental', partition_by=['day','hour']) }}\n" +
        "SELECT * FROM {{ ref('up') }}")
    assert(inc.materialization ==
      Materialization.IncrementalByPartition(Seq("day", "hour")))
    assert(inc.refs == Seq("up"))

    val sch = ProjectLoader.parseModel("s",
      "{{ config(materialized='table', schema='analytics') }}\nSELECT 1")
    assert(sch.customSchema.contains("analytics"))
  }

  test("config header: bare literals parse (dbt's Python spellings)") {
    // materialized=table / lookback=2 / invalidate_hard_deletes=true are
    // legal dbt; dropping them silently turned marts into views.
    val t = ProjectLoader.parseModel("t",
      "{{ config(materialized=table) }}\nSELECT 1")
    assert(t.materialization == Materialization.Table)
    val mb = ProjectLoader.parseModel("m",
      "{{ config(materialized=incremental, " +
        "incremental_strategy='microbatch', event_time='ts', " +
        "lookback=2) }}\nSELECT 1")
    assert(mb.materialization ==
      Materialization.Microbatch("ts", "day", lookback = 2))
  }

  test("an unparseable config fragment fails instead of vanishing") {
    val e = intercept[IllegalArgumentException] {
      ProjectLoader.parseModel("b",
        "{{ config(materialized='table', cluster_by=func(x)) }}\nSELECT 1")
    }
    assert(e.getMessage.contains("unparseable"))
  }

  test("a second config block fails instead of being silently stripped") {
    val e = intercept[IllegalArgumentException] {
      ProjectLoader.parseModel("d",
        "{{ config(materialized='table') }}\nSELECT 1\n" +
          "{{ config(schema='analytics') }}")
    }
    assert(e.getMessage.contains("merge into one"))
  }

  test("malformed config fails fast") {
    intercept[IllegalArgumentException](
      ProjectLoader.parseModel("m", "{{ config(materialised='table') }}\nSELECT 1"))
    intercept[IllegalArgumentException](
      ProjectLoader.parseModel("m", "{{ config(materialized='tabel') }}\nSELECT 1"))
    intercept[IllegalArgumentException](
      ProjectLoader.parseModel("m",
        "{{ config(materialized='table', partition_by=['d']) }}\nSELECT 1"))
    intercept[IllegalArgumentException](
      ProjectLoader.parseModel("m", "{{ config(materialized='table') }}\n  "))
  }

  test("models/tpch loads the gate project: names, configs, refs") {
    val models = ProjectLoader.loadModels("models/tpch")
    assert(models.map(_.name).sorted == Seq(
      "customer_order_metrics", "nation_brief", "order_lines_enriched",
      "stg_customer", "stg_lineitem", "stg_nation", "stg_orders",
      "stg_region"))
    val byName = models.map(m => m.name -> m).toMap
    assert(byName("stg_orders").materialization == Materialization.View)
    assert(byName("stg_orders").sources == Seq(("tpch", "orders")))
    assert(byName("customer_order_metrics").materialization ==
      Materialization.Table)
    assert(byName("customer_order_metrics").refs.sorted ==
      Seq("stg_customer", "stg_orders"))
    assert(byName("nation_brief").customSchema.contains("analytics"))
    assert(byName("order_lines_enriched").refs.sorted == Seq(
      "stg_customer", "stg_lineitem", "stg_nation", "stg_orders",
      "stg_region"))
  }

  test("models/tastybytes mirrors the reference project layout") {
    val models = ProjectLoader.loadModels("models/tastybytes")
    assert(models.size == 10)
    val byName = models.map(m => m.name -> m).toMap
    assert(byName("orders").materialization == Materialization.Table)
    assert(byName("orders").refs.size == 7)
    assert(byName("customer_loyalty_metrics").refs.sorted ==
      Seq("raw_customer_customer_loyalty", "raw_pos_order_header"))
    assert(byName("raw_customer_customer_loyalty").sources ==
      Seq(("tb_101", "customer_loyalty")))
  }

  test("missing models dir fails fast") {
    intercept[IllegalArgumentException](
      ProjectLoader.loadModels("models/no_such_project"))
  }

  test("config header: incremental strategies and ephemeral") {
    val byKey = ProjectLoader.parseModel("m",
      "{{ config(materialized='incremental', unique_key=['id']) }} SELECT 1")
    assert(byKey.materialization ==
      Materialization.IncrementalByKey(Seq("id")))
    val eph = ProjectLoader.parseModel("m",
      "{{ config(materialized='ephemeral') }} SELECT 1")
    assert(eph.materialization == Materialization.Ephemeral)
    // Strategy must be unambiguous.
    intercept[IllegalArgumentException](ProjectLoader.parseModel("m",
      "{{ config(materialized='incremental', unique_key=['id'], partition_by=['d']) }} SELECT 1"))
    // Neither key = dbt's default strategy: plain append.
    assert(ProjectLoader.parseModel("m",
      "{{ config(materialized='incremental') }} SELECT 1")
      .materialization == Materialization.IncrementalAppend())
    // unique_key outside snapshot/incremental is still rejected.
    intercept[IllegalArgumentException](ProjectLoader.parseModel("m",
      "{{ config(materialized='table', unique_key=['id']) }} SELECT 1"))
  }

  test("config header: hooks") {
    val m = ProjectLoader.parseModel("m",
      "{{ config(materialized='table', " +
        "post_hook='ANALYZE TABLE {{ this }} COMPUTE STATISTICS') }} SELECT 1")
    assert(m.postHooks ==
      Seq("ANALYZE TABLE {{ this }} COMPUTE STATISTICS"))
    assert(m.preHooks.isEmpty)
  }

  test("config header: microbatch") {
    val m = ProjectLoader.parseModel("m",
      "{{ config(materialized='incremental', " +
        "incremental_strategy='microbatch', event_time='ts', " +
        "batch_size='hour', lookback='2') }} SELECT 1")
    assert(m.materialization ==
      Materialization.Microbatch("ts", "hour", 2))
    assert(m.eventTime.contains("ts"))
    // batch_size without microbatch fails fast.
    intercept[IllegalArgumentException] {
      ProjectLoader.parseModel("m",
        "{{ config(materialized='table', batch_size='day') }} SELECT 1")
    }
    // event_time alone is the input-side declaration — valid on any model.
    assert(ProjectLoader.parseModel("m",
      "{{ config(materialized='view', event_time='ts') }} SELECT 1")
      .eventTime.contains("ts"))
  }

  test("config header: description rides into the docs manifest") {
    val m = ProjectLoader.parseModel("m",
      "{{ config(materialized='table', " +
        "description='Orders enriched with customer attributes') }} SELECT 1")
    assert(m.description == "Orders enriched with customer attributes")
    assert(ProjectLoader.parseModel("m", "SELECT 1").description.isEmpty)
  }

  test("config header: tags") {
    val m = ProjectLoader.parseModel("m",
      "{{ config(materialized='table', tags=['nightly','finance']) }} SELECT 1")
    assert(m.tags == Seq("nightly", "finance"))
    assert(ProjectLoader.parseModel("m", "SELECT 1").tags.isEmpty)
  }

  test("config header: contract") {
    val m = ProjectLoader.parseModel("m",
      "{{ config(materialized='table', " +
        "contract=['id:bigint','price:decimal(38,2)']) }} SELECT 1")
    assert(m.contract == Seq(ColumnContract("id", "bigint"),
      ColumnContract("price", "decimal(38,2)")))
    intercept[IllegalArgumentException] {
      ProjectLoader.parseModel("m",
        "{{ config(contract=['no_type_here']) }} SELECT 1")
    }
  }

  test("config header: cluster_by") {
    val m = ProjectLoader.parseModel("m",
      "{{ config(materialized='table', cluster_by=['k1','k2']) }} SELECT 1")
    assert(m.clusterBy == Seq("k1", "k2"))
    assert(ProjectLoader.parseModel("m", "SELECT 1").clusterBy.isEmpty)
  }

  test("config header: snapshot strategies") {
    val ts = ProjectLoader.parseModel("m",
      "{{ config(materialized='snapshot', unique_key='id', updated_at='u') }} SELECT 1")
    assert(ts.materialization == Materialization.Snapshot("id", "u"))
    val chk = ProjectLoader.parseModel("m",
      "{{ config(materialized='snapshot', strategy='check', unique_key='id', check_cols=['a','b']) }} SELECT 1")
    assert(chk.materialization ==
      Materialization.SnapshotCheck("id", Seq("a", "b")))
    // check_cols omitted = dbt's check_cols='all' (every non-key column).
    val all = ProjectLoader.parseModel("m",
      "{{ config(materialized='snapshot', strategy='check', unique_key='id') }} SELECT 1")
    assert(all.materialization == Materialization.SnapshotCheck("id", Nil))
    // timestamp strategy still demands updated_at; unknown strategy and
    // check-keys outside snapshots are rejected.
    intercept[IllegalArgumentException](ProjectLoader.parseModel("m",
      "{{ config(materialized='snapshot', unique_key='id') }} SELECT 1"))
    intercept[IllegalArgumentException](ProjectLoader.parseModel("m",
      "{{ config(materialized='snapshot', strategy='bogus', unique_key='id') }} SELECT 1"))
    intercept[IllegalArgumentException](ProjectLoader.parseModel("m",
      "{{ config(materialized='table', check_cols=['a']) }} SELECT 1"))
  }

  test("selectors.yml round-trips: names, quoted definitions, default " +
      "flag; malformed entries fail loudly") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_selyml").toString
    def write(body: String): String = {
      val p = s"$dir/selectors_${body.hashCode.abs}.yml"
      Files.write(Paths.get(p), body.getBytes("UTF-8"))
      p
    }
    val sels = ProjectLoader.loadSelectors(write(
      """# comment
        |selectors:
        |  - name: nightly
        |    description: "the nightly slice"
        |    default: true
        |    definition: "+mart tag:core"
        |  - name: quick
        |    definition: 'stg_only'
        |""".stripMargin))
    assert(sels == Seq(
      NamedSelector("nightly", "+mart tag:core", default = true,
        description = "the nightly slice"),
      NamedSelector("quick", "stg_only")))
    // Project-level governance: duplicate names and two defaults are
    // construction errors, and a selector without a definition fails
    // at load.
    intercept[IllegalArgumentException](ProjectLoader.loadSelectors(
      write("selectors:\n  - name: broken\n    default: true\n")))
    intercept[IllegalArgumentException](Project(Nil, Nil,
      selectors = Seq(NamedSelector("a", "x", default = true),
        NamedSelector("b", "y", default = true))))
    intercept[IllegalArgumentException](Project(Nil, Nil,
      selectors = Seq(NamedSelector("a", "x"), NamedSelector("a", "y"))))
  }
}
