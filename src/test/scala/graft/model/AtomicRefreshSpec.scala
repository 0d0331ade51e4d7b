package graft.model

import java.io.File

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the atomic full-refresh contract of [[CatalogMaterializer]]
  * (Snowflake `CREATE OR REPLACE TABLE` semantics — write to a fresh
  * versioned location, swap the catalog entry, retain the predecessor):
  *
  *  - a reader polling the relation THROUGHOUT a slow refresh never sees
  *    a missing table or a partial count — only the old or the new
  *    contents (the DROP-then-write implementation this replaced exposed
  *    a no-table window for the whole write duration);
  *  - a refresh that dies mid-write (injected task failure) leaves the
  *    live table untouched, and the next refresh collects the orphan;
  *  - retention is exactly {current, predecessor}; older versions and
  *    crash orphans are deleted on the next successful swap;
  *  - the swap carries a schema change;
  *  - dropRelation reclaims every versioned location.
  */
class AtomicRefreshSpec extends SparkSuite {

  private val mat = new CatalogMaterializer
  private def schemaDir = new File("/tmp/graft-test-warehouse/atomicspec.db")
  private def versionDirs(name: String): Seq[File] =
    Option(schemaDir.listFiles).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(s"${name}__v") &&
        !f.getName.endsWith(".INFLIGHT")).toSeq

  test("a concurrent reader never sees the table missing during a refresh") {
    val rel = "atomicspec.t1"
    mat.materializeTable(spark, rel, spark.range(10).toDF("id"))
    @volatile var stop = false
    @volatile var failure: Option[Throwable] = None
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val reader = new Thread(() =>
      try while (!stop) seen.add(spark.table(rel).count())
      catch { case t: Throwable => failure = Some(t) })
    reader.start()
    // ~1s single-task write: the old implementation's no-table window was
    // exactly this long, so the poller would trip table-not-found.
    val slow = udf((x: Long) => { Thread.sleep(3); x })
    mat.materializeTable(spark, rel,
      spark.range(300).repartition(1).select(slow(col("id")).as("id")))
    stop = true
    reader.join()
    assert(failure.isEmpty, s"reader failed mid-refresh: $failure")
    assert(seen.size() > 0)
    seen.forEach(c => assert(c == 10L || c == 300L,
      s"reader saw a partial count $c"))
  }

  test("a refresh dying mid-write leaves the live version intact") {
    val rel = "atomicspec.t2"
    mat.materializeTable(spark, rel, spark.range(7).toDF("id"))
    val boom = udf((x: Long) =>
      if (x == 3L) throw new RuntimeException("injected crash") else x)
    intercept[Exception] {
      mat.materializeTable(spark, rel,
        spark.range(10).select(boom(col("id")).as("id")))
    }
    assert(spark.catalog.tableExists(rel))
    assert(spark.table(rel).count() == 7)
    // The next successful refresh swaps in AND collects the crash orphan.
    mat.materializeTable(spark, rel, spark.range(5).toDF("id"))
    assert(spark.table(rel).count() == 5)
    assert(versionDirs("t2").length <= 2)
  }

  test("retention keeps exactly the current version and its predecessor") {
    val rel = "atomicspec.t3"
    (1 to 4).foreach(n =>
      mat.materializeTable(spark, rel, spark.range(n).toDF("id")))
    assert(spark.table(rel).count() == 4)
    assert(versionDirs("t3").length == 2)
  }

  test("time travel: stepsBack=1 reads the predecessor, bounds enforced") {
    val rel = "atomicspec.t8"
    mat.materializeTable(spark, rel, spark.range(3).toDF("id"))
    // First build: live readable at offset 0, no history yet.
    assert(mat.tableAtVersion(spark, rel, 0).count() == 3)
    intercept[IllegalStateException](mat.tableAtVersion(spark, rel, 1))
    mat.materializeTable(spark, rel, spark.range(7).toDF("id"))
    assert(mat.tableAtVersion(spark, rel, 0).count() == 7)
    assert(mat.tableAtVersion(spark, rel, 1).count() == 3)
    // Beyond the one-version retention window.
    intercept[IllegalArgumentException](mat.tableAtVersion(spark, rel, 2))
    // A third refresh slides the window: history is now the SECOND build.
    mat.materializeTable(spark, rel, spark.range(11).toDF("id"))
    assert(mat.tableAtVersion(spark, rel, 1).count() == 7)
  }

  test("the swap carries a schema change") {
    val rel = "atomicspec.t4"
    mat.materializeTable(spark, rel, spark.range(3).toDF("id"))
    mat.materializeTable(spark, rel,
      spark.range(3).select(col("id"), (col("id") * 2).as("twice")))
    assert(spark.table(rel).columns.toSeq == Seq("id", "twice"))
    assert(spark.table(rel).agg(sum("twice")).head.getLong(0) == 6)
  }

  test("a frame reading the relation can materialize over it (single write)") {
    val rel = "atomicspec.t5"
    mat.materializeTable(spark, rel, spark.range(4).toDF("id"))
    // Read-modify-replace with no staging hop: the plan reads rel itself.
    mat.materializeReplace(spark, rel,
      spark.table(rel).withColumn("id", col("id") + 100))
    assert(spark.table(rel).orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(100L, 101L, 102L, 103L))
  }

  test("the _CURRENT pointer heals a catalog that lost the entry") {
    val rel = "atomicspec.t7"
    mat.materializeTable(spark, rel, spark.range(6).toDF("id"))
    mat.materializeTable(spark, rel, spark.range(9).toDF("id"))
    // Simulate a death between pointer commit and catalog sync (or a
    // fresh process over a persisted warehouse): the in-memory catalog
    // forgets the table; the pointer file is the surviving commit record.
    import org.apache.spark.sql.catalyst.TableIdentifier
    spark.sessionState.catalog.dropTable(
      TableIdentifier("t7", Some("atomicspec")),
      ignoreIfNotExists = false, purge = false)
    assert(!spark.catalog.tableExists(rel))
    assert(mat.relationExists(spark, rel),
      "resolution must re-register the entry from the pointer")
    assert(spark.table(rel).count() == 9)
  }

  test("two threads racing the pointer heal both succeed — the repair " +
      "takes the commit lock, so the loser no-ops instead of throwing " +
      "TABLE_OR_VIEW_ALREADY_EXISTS") {
    val rel = "atomicspec.t7b"
    mat.materializeTable(spark, rel, spark.range(7).toDF("id"))
    import org.apache.spark.sql.catalyst.TableIdentifier
    val ident = TableIdentifier("t7b", Some("atomicspec"))
    // Several rounds: the unlocked heal's createTable race was a
    // narrow window — one round rarely caught it.
    (1 to 5).foreach { round =>
      spark.sessionState.catalog.dropTable(ident,
        ignoreIfNotExists = false, purge = false)
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val failures =
        java.util.concurrent.ConcurrentHashMap.newKeySet[Throwable]()
      val ts = (0 until 2).map(_ => new Thread(() => {
        try { barrier.await(); mat.relationExists(spark, rel); () }
        catch { case t: Throwable => failures.add(t) }
      }))
      ts.foreach(_.start()); ts.foreach(_.join())
      assert(failures.isEmpty, s"round $round heal race: $failures")
      assert(spark.table(rel).count() == 7,
        s"round $round healed to the wrong version")
    }
  }

  test("a torn catalog mutation is repaired to the pointer's version") {
    val rel = "atomicspec.t8"
    mat.materializeTable(spark, rel, spark.range(5).toDF("id"))
    mat.materializeTable(spark, rel, spark.range(11).toDF("id"))
    // Simulate a metastore whose swap tears across calls: the location
    // reverts to the retained predecessor while the pointer still names
    // the committed version.
    import org.apache.spark.sql.catalyst.TableIdentifier
    val catalog = spark.sessionState.catalog
    val ident = TableIdentifier("t8", Some("atomicspec"))
    val meta = catalog.getTableMetadata(ident)
    val current = new org.apache.hadoop.fs.Path(meta.location).getName
    val stale = versionDirs("t8").map(_.getName)
      .filterNot(_ == current).head
    catalog.alterTable(meta.copy(storage = meta.storage.copy(
      locationUri = Some(new File(schemaDir, stale).toURI))))
    spark.catalog.refreshTable(rel)
    assert(spark.table(rel).count() == 5)
    assert(mat.relationExists(spark, rel))
    assert(spark.table(rel).count() == 11,
      "resolution must repair the catalog to the pointer's version")
  }

  test("two concurrent writers racing the commit: last-commit-wins, " +
      "no torn pointer, no lost live version") {
    val rel = "atomicspec.t9"
    mat.materializeTable(spark, rel, spark.range(1).toDF("id"))
    // The reference's overlapping-cron scenario: a scheduled refresh and
    // a manual one race the same relation. Several rounds to give the
    // scheduler chances to interleave commit sections differently.
    (1 to 4).foreach { round =>
      val expected = Set(100L * round, 200L * round)
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val failures =
        java.util.concurrent.ConcurrentHashMap.newKeySet[Throwable]()
      @volatile var stopReader = false
      @volatile var readerFailure: Option[Throwable] = None
      val priorCount = spark.table(rel).count()
      val reader = new Thread(() =>
        try while (!stopReader) {
          val c = spark.table(rel).count()
          assert(c == priorCount || expected.contains(c),
            s"round $round reader saw torn count $c")
        } catch { case t: Throwable => readerFailure = Some(t) })
      def writer(n: Long) = new Thread(() => {
        try {
          barrier.await()
          mat.materializeTable(spark, rel, spark.range(n).toDF("id"))
        } catch { case t: Throwable => failures.add(t) }
      })
      reader.start()
      val ws = Seq(writer(100L * round), writer(200L * round))
      ws.foreach(_.start()); ws.foreach(_.join())
      stopReader = true; reader.join()
      assert(failures.isEmpty, s"round $round writer failed: $failures")
      assert(readerFailure.isEmpty,
        s"round $round reader failed mid-race: $readerFailure")
      // Last-commit-wins, asserted on the COMMIT state itself: the
      // catalog's registered location and the pointer must name the
      // same version directory (both are set by the last holder of the
      // per-relation commit lock — a disagreement would be a torn
      // commit). The session's cached PLAN is deliberately not trusted
      // here: the racing reader above can re-populate the plan cache
      // with the fully-committed, still-retained predecessor after the
      // last writer's refreshTable — Spark's documented metadata-cache
      // semantics (stale-but-consistent, bounded by the next refresh),
      // not a commit tear. This very interleaving fired under a loaded
      // 32-core box, so the distinction is load-bearing.
      val ident = org.apache.spark.sql.catalyst.TableIdentifier(
        "t9", Some("atomicspec"))
      val catalogLoc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.getTableMetadata(ident).location)
        .getName
      val pointed = mat.tableAtVersion(spark, rel, 0)
      assert(versionDirs("t9").exists(_.getName == catalogLoc),
        s"round $round catalog names a collected version $catalogLoc")
      // A fresh resolution (the cross-session view) reads the winner.
      spark.catalog.refreshTable(rel)
      val n = spark.table(rel).count()
      assert(expected.contains(n), s"round $round torn count $n")
      assert(pointed.count() == n,
        s"round $round pointer and catalog disagree on the winner")
      // Retention holds under the race: both racers' versions survive
      // (live + retained predecessor), older rounds are collected.
      assert(versionDirs("t9").length == 2,
        s"round $round left ${versionDirs("t9").map(_.getName)}")
    }
  }

  test("cleanup never deletes a concurrent writer's in-flight version") {
    val rel = "atomicspec.t10"
    mat.materializeTable(spark, rel, spark.range(2).toDF("id"))
    // Simulate writer B mid-data-write: its version directory is on disk
    // (indistinguishable from a crash orphan) and registered in-flight.
    val inflight = new File(schemaDir, "t10__v1_999999999")
    inflight.mkdirs()
    // Path constructed exactly as materializeTable does: from the
    // warehouse-config string, qualified through the filesystem.
    val hp = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") +
        "/atomicspec.db/t10__v1_999999999")
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    CatalogMaterializer.registerInFlight(fs, hp)
    try {
      // Writer A refreshes concurrently — its cleanup must skip B's dir.
      mat.materializeTable(spark, rel, spark.range(3).toDF("id"))
      assert(inflight.exists,
        "a racing refresh collected an in-flight version as an orphan")
    } finally CatalogMaterializer.unregisterInFlight(fs, hp)
    // Once no writer holds it (B died), the next refresh collects it.
    mat.materializeTable(spark, rel, spark.range(4).toDF("id"))
    assert(!inflight.exists, "unregistered orphan was not collected")
    assert(!new File(schemaDir, "t10__v1_999999999.INFLIGHT").exists,
      "sidecar survived its version's collection")
  }

  test("a SEPARATE PROCESS's in-flight version survives a racing cleanup") {
    val rel = "atomicspec.t11"
    mat.materializeTable(spark, rel, spark.range(2).toDF("id"))
    // Simulate a writer in ANOTHER JVM mid-data-write: its version dir
    // and `.INFLIGHT` sidecar are on disk, but THIS JVM's registry has
    // never heard of it (the overlapping-cron scenario — a scheduled run
    // racing a manual one, separate processes).
    val inflight = new File(schemaDir, "t11__v1_999999999")
    inflight.mkdirs()
    val sidecar = new File(schemaDir, "t11__v1_999999999.INFLIGHT")
    assert(sidecar.createNewFile())
    // Writer A (this process) refreshes — cleanup must honor the sidecar.
    mat.materializeTable(spark, rel, spark.range(3).toDF("id"))
    assert(inflight.exists,
      "cleanup collected another process's in-flight version as an orphan")
    assert(sidecar.exists)
    // The other JVM died without unregistering: once the sidecar's lease
    // expires, the orphan and its sidecar are both collectable.
    val expired = System.currentTimeMillis() -
      CatalogMaterializer.inFlightLeaseMs(spark) - 1000
    assert(sidecar.setLastModified(expired))
    mat.materializeTable(spark, rel, spark.range(4).toDF("id"))
    assert(!inflight.exists, "lease-expired orphan was not collected")
    assert(!sidecar.exists, "lease-expired sidecar was not collected")
  }

  test("dropRelation reclaims every versioned location") {
    val rel = "atomicspec.t6"
    (1 to 3).foreach(n =>
      mat.materializeTable(spark, rel, spark.range(n).toDF("id")))
    mat.dropRelation(spark, rel)
    assert(!spark.catalog.tableExists(rel))
    assert(versionDirs("t6").isEmpty)
  }
}
