package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{Q, QueryPack}
import graft.operators.{DedupQueries, EngineQueries, GraphQueries, MultimodalQueries, PipelineQueries, RelationalQueries, TextQueries, VectorQueries}
import graft.streaming.StreamingQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by domain packs; each [[graft.core.Q]] carries
  * the Spark implementation and, when ANSI-SQL-expressible, a DuckDB
  * oracle with identical column names/ordering semantics.
  */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    RelationalQueries, EngineQueries, TextQueries, DedupQueries,
    VectorQueries, MultimodalQueries, StreamingQueries, PipelineQueries,
    GraphQueries)

  private lazy val all: Seq[Q] = {
    val qs = packs.flatMap(_.queries)
    require(qs.map(_.name).distinct.size == qs.size,
      "duplicate query names across packs")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
