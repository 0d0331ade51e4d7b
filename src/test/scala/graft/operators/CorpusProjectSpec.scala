package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[CorpusProject]] — the capstone recipe exposed through the engine's
  * model/DAG tier. Pins the DAG edges (staging views feed both code
  * marts), the run path (`--select`-driven materialization through the
  * path sink), and that the funnel mart equals the direct
  * [[CorpusPipeline.fullFunnel]] call — the model tier may add
  * orchestration, never semantics.
  */
class CorpusProjectSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("the DAG wires staging views into both corpus marts") {
    val r = CorpusProject.runner(dir)
    assert(r.deps("corpus_manifest").toSet ==
      Set("stg_documents", "stg_embeddings"))
    assert(r.deps("corpus_funnel").toSet ==
      Set("stg_documents", "stg_embeddings"))
    assert(r.deps("stg_documents").isEmpty)
  }

  test("run --select +corpus_funnel materializes the data card; the " +
      "mart equals the direct pipeline call") {
    val r = CorpusProject.runner(dir)
    val results = r.run(spark, select = Some("+corpus_funnel"))
    assert(results.forall(_.status == "success"),
      s"node failures: ${results.filter(_.status != "success")}")
    // Only the selected subgraph runs: 2 staging views + the funnel.
    assert(results.map(_.name).toSet ==
      Set("stg_documents", "stg_embeddings", "corpus_funnel"))
    val mart = r.table(spark, "corpus_funnel").head()
    val docs = graft.core.Tables(spark, dir, "documents")
    val emb = graft.core.Tables(spark, dir, "embeddings")
    val direct = CorpusPipeline.fullFunnel(
      docs.filter(col("doc_id") % 5 =!= 0),
      emb.filter(col("vec_id") % 5 =!= 0),
      docs.filter(col("doc_id") % 5 === 0),
      "doc_id", "text", "vec_id", "embedding").head()
    val cols = Seq("n_raw", "n_quality", "n_exact", "n_neardup",
      "n_semantic", "n_clean", "total_tokens", "n_packs")
    assert(cols.map(mart.getAs[Long]) == cols.map(direct.getAs[Long]))
    graft.core.Caches.releaseAll()
  }
}
