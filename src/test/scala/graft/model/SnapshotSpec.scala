package graft.model

import org.apache.spark.sql.DataFrame
import graft.SparkSuite

/** SCD2 snapshot semantics ([[Materialization.Snapshot]]): first-run
  * open rows, change detection via updated_at, closed-history
  * immutability, idempotent re-runs, late new keys.
  */
class SnapshotSpec extends SparkSuite {

  import spark.implicits._

  private var source: DataFrame = _

  private def project: Project = Project(
    Seq(SourceDef("fx", "items", _ => source)),
    Seq(SqlModel("item_history",
      "SELECT * FROM {{ source('fx', 'items') }}",
      Materialization.Snapshot("id", "ts"))))

  private def rows(r: Runner): Set[(Long, String, String, String)] =
    r.table(spark, "item_history")
      .collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(3),
        Option(x.getString(4)).getOrElse("-")))
      .toSet

  test("snapshot: open, close-and-reopen, keep, late insert, idempotency") {
    val base = java.nio.file.Files.createTempDirectory("snap_spec").toString
    def runner = new Runner(project, Target.dev, new PathMaterializer(base))

    // Run 1: two items. Both open.
    source = Seq((1L, "a", "t1"), (2L, "b", "t1")).toDF("id", "v", "ts")
    val r1 = runner
    r1.run(spark)
    assert(rows(r1) == Set((1L, "a", "t1", "-"), (2L, "b", "t1", "-")))

    // Run 2: item 1 updated, item 2 unchanged, item 3 new.
    source = Seq((1L, "a2", "t2"), (2L, "b", "t1"), (3L, "c", "t2"))
      .toDF("id", "v", "ts")
    val r2 = runner
    r2.run(spark)
    val expected = Set(
      (1L, "a", "t1", "t2"), (1L, "a2", "t2", "-"),
      (2L, "b", "t1", "-"),
      (3L, "c", "t2", "-"))
    assert(rows(r2) == expected)

    // Run 3: identical source — the snapshot must not change (updated_at
    // not strictly newer than the open rows' valid_from).
    val r3 = runner
    r3.run(spark)
    assert(rows(r3) == expected)

    // Run 4: item 1 updated again — history now has TWO closed rows for
    // it; closed rows from run 2 are untouched.
    source = Seq((1L, "a3", "t3"), (2L, "b", "t1"), (3L, "c", "t2"))
      .toDF("id", "v", "ts")
    val r4 = runner
    r4.run(spark)
    assert(rows(r4) == Set(
      (1L, "a", "t1", "t2"), (1L, "a2", "t2", "t3"), (1L, "a3", "t3", "-"),
      (2L, "b", "t1", "-"),
      (3L, "c", "t2", "-")))
  }

  test("check-strategy snapshot: null-safe column compare; absent keys " +
      "stay open; idempotent re-run") {
    var src2: DataFrame = null
    def proj(at: String) = Project(
      Seq(SourceDef("fx", "items2", _ => src2)),
      Seq(SqlModel("item_chk",
        "SELECT * FROM {{ source('fx', 'items2') }}",
        Materialization.SnapshotCheck("id", Nil, Some(at)))))
    val base = java.nio.file.Files.createTempDirectory("snapchk").toString
    def run(at: String): Runner = {
      val r = new Runner(proj(at), Target.dev, new PathMaterializer(base))
      r.run(spark)
      r
    }
    def state(r: Runner): Set[(Long, String, String, String)] =
      r.table(spark, "item_chk").collect()
        .map(x => (x.getLong(0), Option(x.getString(1)).getOrElse("-"),
          x.getString(2), Option(x.getString(3)).getOrElse("-")))
        .toSet

    // Run 1 (clock T1): both rows open; v is nullable.
    src2 = Seq((1L, Some("a")), (2L, None)).toDF("id", "v")
    assert(state(run("T1")) ==
      Set((1L, "a", "T1", "-"), (2L, "-", "T1", "-")))

    // Run 2 (T2): id 1 ABSENT from the source — its open row survives
    // (dbt's default, no hard-delete invalidation); id 2 flips NULL→"b",
    // which the null-safe compare must count as a change.
    src2 = Seq((2L, Some("b"))).toDF("id", "v")
    assert(state(run("T2")) == Set(
      (1L, "a", "T1", "-"),
      (2L, "-", "T1", "T2"), (2L, "b", "T2", "-")))

    // Run 3 (T3): identical source — nothing changes, nothing closes.
    val after = state(run("T3"))
    assert(after == Set(
      (1L, "a", "T1", "-"),
      (2L, "-", "T1", "T2"), (2L, "b", "T2", "-")))
  }

  test("check-strategy snapshot: invalidate_hard_deletes closes absent keys") {
    var src3: DataFrame = null
    def proj(at: String) = Project(
      Seq(SourceDef("fx", "items3", _ => src3)),
      Seq(SqlModel("item_hd",
        "SELECT * FROM {{ source('fx', 'items3') }}",
        Materialization.SnapshotCheck("id", Nil, Some(at),
          invalidateHardDeletes = true))))
    val base = java.nio.file.Files.createTempDirectory("snaphd").toString
    def run(at: String): Runner = {
      val r = new Runner(proj(at), Target.dev, new PathMaterializer(base))
      r.run(spark)
      r
    }
    src3 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    run("T1")
    // id 2 disappears: its open row must CLOSE at the snapshot clock
    // (the opposite of the default, pinned by the test above).
    src3 = Seq((1L, "a")).toDF("id", "v")
    val st = run("T2").table(spark, "item_hd").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2),
        Option(x.getString(3)).getOrElse("-"))).toSet
    assert(st == Set((1L, "a", "T1", "-"), (2L, "b", "T1", "T2")))
  }

  test("snapshot source missing key or updated_at column fails the node") {
    val base = java.nio.file.Files.createTempDirectory("snap_bad").toString
    source = Seq((1L, "a")).toDF("id", "v") // no ts column
    val e = intercept[RuntimeException] {
      new Runner(project, Target.dev, new PathMaterializer(base)).run(spark)
    }
    assert(e.getMessage.contains("item_history"))
  }

  test("loader parses snapshot config") {
    val m = ProjectLoader.parseModel("snap",
      "{{ config(materialized='snapshot', unique_key='id', updated_at='ts') }}\n" +
        "SELECT * FROM {{ source('fx','items') }}")
    assert(m.materialization == Materialization.Snapshot("id", "ts"))
    intercept[IllegalArgumentException](ProjectLoader.parseModel("snap",
      "{{ config(materialized='snapshot', unique_key='id') }}\nSELECT 1"))
    intercept[IllegalArgumentException](ProjectLoader.parseModel("snap",
      "{{ config(materialized='table', unique_key='id') }}\nSELECT 1"))
  }
}
