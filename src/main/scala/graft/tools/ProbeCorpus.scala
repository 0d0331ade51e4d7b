package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probe-only corpus synthesis. [[ReplicateSf]]'s id-offset replicas
  * are EXACT duplicates of each other, which is the right 10× input for
  * scan/shuffle-shaped gates but degenerate for pipeline-stage probes:
  * every appended replica dies at the exact-dedup stage (stage 3+ sees
  * empty batches) and a takedown victim's exact-content family spans
  * every replica (so "victim depth" stops being a variable).
  *
  * [[salted]] fixes both: replica i offsets ids AND prefixes every word
  * with a replica tag, so replicas are exact-DISTINCT and pairwise
  * non-near-dup (no shared shingles at any n), while each replica's
  * INTERNAL duplicate structure — exact groups, jaccard pairs, shingle
  * sets — is preserved bit-for-bit (a uniform per-word prefix is a
  * bijection on the vocabulary). Word counts are unchanged, so quality
  * verdicts and pack token sums replicate exactly; the result is a 10×
  * corpus whose every batch carries real survivors through every
  * pipeline stage.
  */
object ProbeCorpus {

  val IdOff = 1000000L // matches ReplicateSf's doc stride

  /** K× word-salted replication of `(doc_id, text)`. */
  def salted(docs: DataFrame, k: Int): DataFrame =
    (0 until k).map { i =>
      if (i == 0) docs.select(col("doc_id"), col("text"))
      else docs.select(
        (col("doc_id") + lit(i * IdOff)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), "\\s+"),
          x => concat(lit(s"q${i}z"), x))).as("text"))
    }.reduce(_ unionAll _)
}
