package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructType}

/** Line-delimited JSON ingestion — the landing format of a scraped /
  * vendor-delivered text corpus (one JSON object per line, splittable, so
  * a 100 TB dump reads as one task per split exactly like CSV).
  *
  * Two contracts differ from [[CsvIngest]] (SURVEY S1's curated-CSV hop),
  * both deliberate:
  *
  *  - **Explicit schema, never inference.** `spark.read.json` without a
  *    schema runs a full inference pass first — at 100 TB that reads the
  *    corpus twice and pins the job on the slowest splits before real
  *    work starts. The schema is part of the source contract, like the
  *    reference's positional `COPY INTO` DDL.
  *  - **PERMISSIVE + quarantine, not FAILFAST.** A curated warehouse
  *    export should abort on a malformed row (CsvIngest does); a scraped
  *    corpus WILL contain malformed lines, and one of them must not kill
  *    a week-long backfill. Unparseable lines land whole in a corrupt-
  *    record column and are split into a quarantine frame the pipeline
  *    can count, sample, and re-drive — the poison-pill pattern every
  *    at-scale ingestion needs.
  */
object JsonlIngest {

  val CorruptCol = "_corrupt_record"

  /** Stage a frame as JSONL (newlines etc. escaped per JSON, so the file
    * stays strictly line-delimited whatever the text contains). */
  def stage(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Schema'd permissive load: well-formed lines parse into `schema`'s
    * columns, malformed lines arrive whole in [[CorruptCol]] with the
    * data columns null. */
  def load(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** The full hop: load, split good rows from quarantined lines, and
    * return both. Good rows drop the corrupt column (clean schema for the
    * downstream parquet materialization); the quarantine keeps the raw
    * line for re-driving after a parser/contract fix.
    *
    * The parsed frame is persisted (registered with [[Caches]]) before
    * the split: Spark refuses a query whose pruned schema is ONLY the
    * corrupt-record column (the parser cannot know a line is corrupt
    * without parsing the data columns), and — the real reason — the two
    * outputs would otherwise each re-read and re-parse the corpus. One
    * parse, two consumers is also the at-scale shape: on a cluster the
    * same structure is "parse once, write the good parquet and the
    * quarantine sink from the cached frame" rather than two passes over
    * 100 TB of JSON. */
  def ingest(spark: SparkSession, path: String, schema: StructType)
      : (DataFrame, DataFrame) = {
    val all = Caches.persist(load(spark, path, schema))
    val good = all.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val quarantine = all.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (good, quarantine)
  }
}
