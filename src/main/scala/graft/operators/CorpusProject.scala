package graft.operators

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.model._

/** The composed pretraining recipe exposed as an ENGINE PROJECT — the
  * bridge between the repo's two surfaces: the dbt-style model/DAG tier
  * (`graft.model`, the reference's shape) and the corpus-pipeline tier
  * ([[CorpusPipeline]], the LLM-data extension). A user of the engine
  * runs the capstone exactly like any mart:
  *
  * {{{
  *   EngineCli run --project corpus --dir <sfDir> --select +corpus_manifest
  * }}}
  *
  * Two code models over two staging views:
  *
  *  - `corpus_manifest` — [[CorpusPipeline.fullManifest]]: the shard
  *    manifest of the fully-cleaned corpus (quality → exact → MinHash
  *    near-dup → semantic (autoK codebook) → benchmark decontam → pack),
  *    materialized as a table through the engine's atomic sink.
  *  - `corpus_funnel` — [[CorpusPipeline.fullFunnel]]: the per-stage
  *    "data card". Deliberately a REF-ABLE MART rather than opaque
  *    run_results metadata: as a relation it is queryable, versioned by
  *    the atomic sink, and time-travels with the manifest it describes —
  *    run_results.json still records both nodes' status/timing (O7).
  *
  * Split convention (the p07 gate's): documents with `doc_id % 5 = 0`
  * are the held-out benchmark the decontamination stage screens
  * against; the rest are the training corpus.
  *
  * Kept as its own project (not folded into TpchProject) so the
  * operational gates that pin TpchProject's artifacts byte-exactly
  * (catalog listings, run_results, DAG docs) stay stable — exactly how
  * a real deployment separates an ELT project from a data-pipeline
  * project sharing one engine.
  */
object CorpusProject {

  def sources(dir: String): Seq[SourceDef] = Seq(
    SourceDef("corpus", "documents", s => Tables(s, dir, "documents")),
    SourceDef("corpus", "embeddings", s => Tables(s, dir, "embeddings")))

  /** Staging views live in `models/corpus` (file-per-model layout). */
  val modelsDir = "models/corpus"

  private def corpusOf(ref: String => org.apache.spark.sql.DataFrame) = (
    ref("stg_documents").filter(col("doc_id") % 5 =!= 0),
    ref("stg_embeddings").filter(col("vec_id") % 5 =!= 0),
    ref("stg_documents").filter(col("doc_id") % 5 === 0))

  val corpusManifest: DfModel = DfModel(
    "corpus_manifest",
    refNames = Seq("stg_documents", "stg_embeddings"),
    build = (_, ref) => {
      val (docs, emb, bench) = corpusOf(ref)
      CorpusPipeline.fullManifest(docs, emb, bench,
        "doc_id", "text", "vec_id", "embedding")
    },
    tags = Seq("corpus"))

  val corpusFunnel: DfModel = DfModel(
    "corpus_funnel",
    refNames = Seq("stg_documents", "stg_embeddings"),
    build = (_, ref) => {
      val (docs, emb, bench) = corpusOf(ref)
      CorpusPipeline.fullFunnel(docs, emb, bench,
        "doc_id", "text", "vec_id", "embedding")
    },
    tags = Seq("corpus"))

  def project(dir: String): Project = ProjectLoader.load(
    modelsDir, sources(dir),
    codeModels = Seq(corpusManifest, corpusFunnel))

  private val runnerSeq = new java.util.concurrent.atomic.AtomicInteger

  /** Every runner gets its OWN materializer root — pid + a per-JVM
    * sequence — because concurrent JVMs (a spec run and a gate run on
    * the same box) sharing one fixed path would corrupt each other's
    * marts mid-build. All call sites build and read through a single
    * Runner instance, so nothing ever needs to rediscover a prior
    * run's root. */
  def runner(dir: String): Runner =
    new Runner(project(dir), Target.dev,
      new PathMaterializer(
        sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          s"/graft_corpus_marts_${ProcessHandle.current().pid()}" +
          s"_${runnerSeq.incrementAndGet()}"))
}
