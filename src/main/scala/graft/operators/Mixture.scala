package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-mixture construction — the reweighting step between a cleaned
  * corpus and a training run: each source (crawl, code, books, …) gets
  * a TOKEN QUOTA from a target weight vector, and the pipeline takes
  * documents from each source, in a deterministic pseudo-random order,
  * until the quota is met. (The reference pipeline has no analogue —
  * its corpus is single-source — but every published pretraining recipe
  * specifies such a mixture, and re-running the build must reproduce
  * the same sample bit-for-bit.)
  *
  * Semantics: within a source, documents are ordered by
  * `(md5(id), id)` — a deterministic shuffle, so the quota prefix is
  * an unbiased sample of the source and every re-run over the same
  * corpus reproduces it bit-for-bit. (Unlike the pipeline's near-dup
  * stage this is NOT append-stable — a grown corpus legitimately
  * yields a different sample, because a mixture is drawn fresh per
  * training run from whatever the corpus then holds.) A document is
  * kept iff its EXCLUSIVE running token total is still under the
  * quota — so the crossing document is included and every quota is
  * met (never undershot) when the source has enough tokens.
  *
  * 100 TB design: the per-source running total is
  * [[Packing.keyedCumSum]] — a range partition on (source, order) plus
  * a (partition, key)-subtotal prefix sum, NOT a
  * `Window.partitionBy(source)` whose biggest source would become one
  * task. Quotas derive from one scalar total that rides a broadcast
  * join; everything else is row-local arithmetic.
  */
object Mixture {

  /** Quota-bounded mixture sample: returns
    * `(id, source, n_tokens, cum_before, keep)`.
    *
    * @param docs      one row per document
    * @param sourceCol mixture key (non-null strings)
    * @param idCol     unique document id (integral)
    * @param tokens    per-document token count expression
    * @param quotaOf   per-row token quota for `sourceCol`'s value, given
    *                  the corpus-wide token total (a `bigint` column) as
    *                  its argument — integer arithmetic only (`div`, not
    *                  `/`), so re-runs and external replays agree exactly
    */
  def sample(docs: DataFrame, sourceCol: String, idCol: String,
      tokens: Column, quotaOf: Column => Column): DataFrame = {
    val base = docs.select(col(idCol), col(sourceCol),
      tokens.cast("long").as("n_tokens"),
      struct(md5(col(idCol).cast("string")), col(idCol)).as("__ord"))
    val cum = Packing.keyedCumSum(base, sourceCol, "__ord", "n_tokens")
    // One-row corpus total; the broadcast crossJoin attaches it without
    // shuffling the corpus (the funnel/p03 pattern). Aggregated from
    // `cum` — the prefix sum's CACHED range-partitioned frame — so the
    // raw corpus is scanned (and tokenized) once, not twice.
    val total = cum.agg(sum(col("n_tokens")).as("__total"))
    cum.crossJoin(broadcast(total))
      .select(col(idCol), col(sourceCol), col("n_tokens"),
        col("cum_before"),
        (col("cum_before") < quotaOf(col("__total"))).as("keep"))
  }

  /** TEMPERATURE (α-weighted) mixture — the published multi-source
    * recipe shape ([[sample]] with the quota vector DERIVED instead of
    * hand-fixed): per-source quotas wᵢ ∝ nᵢ^α with α = ½, normalized to
    * a caller-set token budget. α < 1 flattens the source distribution
    * (the XLM-R/mT5 temperature-sampling recipe): small sources are
    * upsampled relative to their share, dominant crawls capped — the
    * standard fix for a long-tailed source histogram.
    *
    * α = ½ is computed EXACTLY: wᵢ = isqrt(nᵢ) via floor(sqrt) plus a
    * one-step Newton correction (`(s+1)² ≤ n → s+1; s² > n → s−1`), so
    * engines can never disagree on a boundary ulp. The keep decision is
    * the integer cross-multiply `(cum_before + 1) · Σw ≤ T · wᵢ` — the
    * per-source quota `⌊T·wᵢ / Σw⌋` never materializes, so there is no
    * decimal division to mis-round (both products ride decimal(38,0):
    * exact past any 100 TB corpus). Same keep semantics as [[sample]]:
    * exclusive running total strictly under the quota, crossing
    * document included.
    *
    * Scale shape: [[sample]]'s exactly — the keyed two-phase prefix
    * sum, one corpus-total scalar, one |sources|-row broadcast (now
    * carrying the isqrt weights), one Σw scalar; all else row-local.
    * Returns `(id, source, n_tokens, cum_before, w_alpha, keep)`.
    *
    * @param targetOf total token budget, from the corpus-wide token
    *                 total — integer arithmetic only
    */
  def alphaSample(docs: DataFrame, sourceCol: String, idCol: String,
      tokens: Column, targetOf: Column => Column): DataFrame = {
    val base = docs.select(col(idCol), col(sourceCol),
      tokens.cast("long").as("n_tokens"),
      struct(md5(col(idCol).cast("string")), col(idCol)).as("__ord"))
    val cum = Packing.keyedCumSum(base, sourceCol, "__ord", "n_tokens")
    val total = cum.agg(sum(col("n_tokens")).as("__total"))
    val s0 = floor(sqrt(col("__s").cast("double"))).cast("long")
    val isqrt = when((s0 + 1) * (s0 + 1) <= col("__s"), s0 + 1)
      .when(s0 * s0 > col("__s"), s0 - 1).otherwise(s0)
    val perSource = cum.groupBy(col(sourceCol))
      .agg(sum(col("n_tokens")).as("__s"))
      .withColumn("w_alpha", isqrt).drop("__s")
    val sumW = perSource.agg(sum(col("w_alpha")).as("__sumw"))
    cum.crossJoin(broadcast(total))
      .join(broadcast(perSource), sourceCol)
      .crossJoin(broadcast(sumW))
      .select(col(idCol), col(sourceCol), col("n_tokens"),
        col("cum_before"), col("w_alpha"),
        ((col("cum_before") + 1).cast("decimal(38,0)") * col("__sumw")
          <= targetOf(col("__total")).cast("decimal(38,0)")
            * col("w_alpha")).as("keep"))
  }

  /** EPOCHED mixture — the upsampling half [[sample]] can't express: a
    * target weight may exceed a source's own token count, in which case
    * the source REPEATS (Wikipedia-for-3-epochs in every published
    * recipe). Each source runs `ceil(target / S)` epochs over the same
    * deterministic order; every epoch but the last is complete, the
    * last keeps the prefix that lands the target exactly — keep iff
    * `epoch·S + cum_before < target` (all integer arithmetic).
    * Returns one row per KEPT (document, epoch):
    * `(id, source, epoch, n_tokens)`.
    *
    * Scale shape: everything [[sample]] does, plus one per-source
    * total (a broadcast-joined aggregate, |sources| rows) and a
    * row-local `explode(sequence(0, nEpochs−1))` whose expansion is
    * exactly the emitted sample — no additional shuffle. (A real
    * loader reshuffles each epoch; the fixed per-epoch order here is
    * the price of an exact external replay, and a per-epoch reshuffle
    * is one extra hash in `__ord` away.)
    *
    * @param targetOf per-source token target, from the corpus-wide
    *                 total — integer arithmetic only
    */
  def epochedSample(docs: DataFrame, sourceCol: String, idCol: String,
      tokens: Column, targetOf: Column => Column): DataFrame = {
    val base = docs.select(col(idCol), col(sourceCol),
      tokens.cast("long").as("n_tokens"),
      struct(md5(col(idCol).cast("string")), col(idCol)).as("__ord"))
    val cum = Packing.keyedCumSum(base, sourceCol, "__ord", "n_tokens")
    val total = cum.agg(sum(col("n_tokens")).as("__total"))
    val perSource = cum.groupBy(col(sourceCol))
      .agg(sum(col("n_tokens")).as("__s"))
    val target = targetOf(col("__total"))
    cum.crossJoin(broadcast(total))
      .join(broadcast(perSource), sourceCol)
      .filter(col("__s") > 0)
      .withColumn("__target", target)
      // ceil(target / S) epochs via (x − x mod S) / S with
      // x = target + S − 1: the numerator is exactly divisible, so the
      // double division is IEEE-exact for any corpus under 2^53 tokens
      // (a plain long/long `/` is double division, and a decimal-floor
      // would mis-round fractions (S−1)/S once S passes ~2e6). Sources
      // whose target rounds to ≤0 must emit NOTHING — sequence(0, −1)
      // is NOT empty (Spark steps −1, yielding [0, −1]), so the explode
      // is guarded: a null sequence drops the row.
      .withColumn("__x", col("__target") + col("__s") - 1)
      .withColumn("__epochs",
        (((col("__x") - pmod(col("__x"), col("__s"))) / col("__s"))
          .cast("long")).cast("int"))
      .withColumn("epoch", explode(when(col("__epochs") > 0,
        sequence(lit(0), col("__epochs") - 1))))
      .filter(col("epoch") * col("__s") + col("cum_before")
        < col("__target"))
      .select(col(idCol), col(sourceCol), col("epoch"), col("n_tokens"))
  }
}
