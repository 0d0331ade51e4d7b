package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{Q, QueryPack, Tables}

/** Gates for the composed corpus pipeline ([[CorpusPipeline]]): the
  * end-to-end pretraining data build — quality → exact dedup → near-dup
  * removal → tokenize → pack → shard manifest — one-shot (p01) and
  * incrementally against persisted engine state (p02), plus the funnel
  * "data card" (p03). p01 and p02 share one full-recompute DuckDB
  * oracle: the incremental pass must be indistinguishable from the
  * one-shot pass over the union — the amortization contract at 100 TB.
  *
  * Recall argument for the LSH stage is d03's (banding misses a ≥0.6
  * pair on this corpus astronomically rarely; verification makes
  * precision exact), so the oracle's brute-force pair set and the
  * engine's LSH pair set agree.
  */
object PipelineQueries extends QueryPack {

  /** One-shot pipeline stages through the pack manifest, in DuckDB.
    * Stage CTEs mirror [[CorpusPipeline]] exactly: q = quality (50 ≤
    * words ≤ 100k, 6dp-rounded alpha fraction > 0.8), kept = min-id per
    * d01 fingerprint, drops = doc_b of every brute-force jaccard ≥ 0.6
    * pair among kept (the predecessor rule), c = the packing prefix sum
    * (t11's window form). */
  private val pipelinePrefix: String =
    """WITH qw AS (
      |  SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS w
      |  FROM documents),
      |q AS (
      |  SELECT doc_id, text, CAST(len(w) AS BIGINT) AS toks
      |  FROM qw
      |  WHERE len(w) BETWEEN 50 AND 100000
      |    AND ROUND(len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]')))
      |          / len(w), 6) > 0.8),
      |ex AS (
      |  SELECT doc_id, text, toks, ROW_NUMBER() OVER (
      |    PARTITION BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
      |    ORDER BY doc_id) AS rn
      |  FROM q),
      |kept AS (SELECT doc_id, toks FROM ex WHERE rn = 1),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(w)-1),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) shingles
      |  FROM kept JOIN qw USING (doc_id)
      |  WHERE len(w) >= 3),
      |sizes AS (SELECT doc_id, len(shingles) n_sh FROM sh),
      |exn AS (SELECT doc_id, unnest(shingles) shingle FROM sh),
      |inter AS (
      |  SELECT a.doc_id doc_a, b.doc_id doc_b, COUNT(*) n_common
      |  FROM exn a JOIN exn b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |drops AS (
      |  SELECT DISTINCT doc_b FROM inter
      |  JOIN sizes sa ON doc_a = sa.doc_id
      |  JOIN sizes sb ON doc_b = sb.doc_id
      |  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.6),
      |surv AS (
      |  SELECT doc_id, toks FROM kept
      |  WHERE doc_id NOT IN (SELECT doc_b FROM drops)),
      |c AS (SELECT doc_id, toks,
      |  CAST(SUM(toks) OVER (ORDER BY doc_id) AS BIGINT) AS cum
      |  FROM surv)""".stripMargin

  private val manifestOracle: String =
    s"""$pipelinePrefix
       |SELECT (cum - toks) // ${CorpusPipeline.SeqLen} AS pack_id,
       |  COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS pack_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM c GROUP BY 1 ORDER BY pack_id""".stripMargin

  def queries: Seq[Q] = Seq(

    Q("p01_corpus_pipeline",
      (s, dir) => CorpusPipeline
        .manifest(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("pack_id")),
      Some(manifestOracle)),

    // Incremental: bootstrap on the first ~80% of the id range, then
    // append the remaining 20% as an arriving batch through the
    // persisted state — exact probes off `doc_meta`, near-dup probes
    // off the dedup store, packing offset off the shard manifest. The
    // read-back merges boundary packs across batch partitions. Oracle:
    // the SAME full recompute as p01 — the increment must lose (and
    // invent) nothing. (Multi-batch accumulation and streamed ingest
    // are spec-pinned — CorpusPipelineSpec / StoreIngestSpec — the
    // gate keeps ONE append so its wall measures the lifecycle, not
    // repeated fixed commit costs.)
    Q("p02_incremental_pipeline",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val cut = docs.agg(max(col("doc_id"))).head.getLong(0) * 4 / 5
        val st = CorpusPipeline.State("corpus_pipeline")
        CorpusPipeline.buildHistory(s,
          docs.filter(col("doc_id") <= cut), "doc_id", "text", st)
        CorpusPipeline.appendBatch(s,
          docs.filter(col("doc_id") > cut), "doc_id", "text", st, "b1")
        CorpusPipeline.readManifest(s, st).orderBy(col("pack_id"))
      },
      Some(manifestOracle)),

    // The funnel "data card": documents surviving each stage, final
    // token total, shard count (= ceil(tokens / seq_len) — the
    // training-sequence count, identical formula both engines).
    Q("p03_pipeline_funnel",
      (s, dir) => CorpusPipeline
        .funnel(Tables(s, dir, "documents"), "doc_id", "text"),
      Some(s"""$pipelinePrefix
              |SELECT (SELECT COUNT(*) FROM documents) AS n_raw,
              |  (SELECT COUNT(*) FROM q) AS n_quality,
              |  (SELECT COUNT(*) FROM kept) AS n_exact,
              |  (SELECT COUNT(*) FROM surv) AS n_survivors,
              |  (SELECT CAST(SUM(toks) AS BIGINT) FROM surv) AS total_tokens,
              |  CAST(CEIL((SELECT SUM(toks) FROM surv)
              |    / ${CorpusPipeline.SeqLen}.0) AS BIGINT) AS n_packs"""
        .stripMargin)),

    // Data-mixture construction ([[Mixture.sample]]): every pretraining
    // recipe reweights its sources — here source `srcI` gets weight
    // (I+1)/210 of half the corpus's tokens (upsampling high-index
    // sources, starving low ones), quota arithmetic kept INTEGER
    // (`total * (I+1) div 420`) so Spark and the oracle can't diverge
    // on a double rounding. Order within a source is the deterministic
    // shuffle (md5(id), id); keep = exclusive running total < quota, so
    // the crossing document is included and quotas are met exactly once
    // per re-run. The per-source running total is the keyed two-phase
    // prefix sum — no single-task source windows (see Packing).
    Q("p04_mixture_sample",
      (s, dir) => Mixture.sample(
          Tables(s, dir, "documents"), "source", "doc_id",
          graft.functions.TextFunctions.tokenCount(col("text")),
          // floor(decimal(x)/420) ≡ x div 420 exactly: the quotient is
          // rounded at scale 6 and the fractional parts are k/420
          // (≤ 419/420 ≈ 0.99762), so rounding can never cross an
          // integer boundary.
          total => floor((total * (regexp_extract(col("source"),
              "src(\\d+)", 1).cast("long") + 1)).cast("decimal(38,0)")
            / lit(420)).cast("long"))
        .orderBy(col("doc_id")),
      Some("""WITH t AS (
             |  SELECT doc_id, source, CAST(CASE
             |      WHEN length(trim(text)) = 0 THEN 0
             |      ELSE len(regexp_split_to_array(trim(text), '\s+'))
             |    END AS BIGINT) AS n_tokens
             |  FROM documents),
             |tot AS (SELECT SUM(n_tokens) AS total FROM t),
             |c AS (
             |  SELECT doc_id, source, n_tokens,
             |    CAST(SUM(n_tokens) OVER (PARTITION BY source
             |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT)
             |      AS cum_before
             |  FROM t)
             |SELECT doc_id, source, n_tokens, cum_before,
             |  cum_before < (total * (CAST(regexp_extract(source,
             |    'src(\d+)', 1) AS BIGINT) + 1)) // 420 AS keep
             |FROM c, tot ORDER BY doc_id""".stripMargin)),

    // Mixture → pack composition: the downstream use of p04 — the
    // sampled (quota-kept) documents packed into fixed-length training
    // sequences in doc_id order, emitting the same per-pack manifest
    // shape as p01. Two distributed prefix sums chain (per-source for
    // the quota, global for the packing) without a single window or
    // cartesian between them.
    Q("p05_mixture_pack",
      (s, dir) => {
        val kept = Mixture.sample(
            Tables(s, dir, "documents"), "source", "doc_id",
            graft.functions.TextFunctions.tokenCount(col("text")),
            total => floor((total * (regexp_extract(col("source"),
                "src(\\d+)", 1).cast("long") + 1)).cast("decimal(38,0)")
              / lit(420)).cast("long"))
          .filter(col("keep"))
          .select(col("doc_id"), col("n_tokens"))
        Packing.packAssignments(kept, "doc_id", "n_tokens",
            CorpusPipeline.SeqLen)
          .groupBy(col("pack_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("long").as("pack_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy(col("pack_id"))
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, source, CAST(CASE
              |      WHEN length(trim(text)) = 0 THEN 0
              |      ELSE len(regexp_split_to_array(trim(text), '\\s+'))
              |    END AS BIGINT) AS n_tokens
              |  FROM documents),
              |tot AS (SELECT SUM(n_tokens) AS total FROM t),
              |c AS (
              |  SELECT doc_id, source, n_tokens,
              |    CAST(SUM(n_tokens) OVER (PARTITION BY source
              |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
              |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT)
              |      AS cum_before
              |  FROM t),
              |kept AS (
              |  SELECT doc_id, n_tokens FROM c, tot
              |  WHERE cum_before < (total * (CAST(regexp_extract(source,
              |    'src(\\d+)', 1) AS BIGINT) + 1)) // 420),
              |g AS (
              |  SELECT doc_id, n_tokens,
              |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
              |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
              |  FROM kept)
              |SELECT (cum - n_tokens) // ${CorpusPipeline.SeqLen}
              |    AS pack_id,
              |  COUNT(*) AS n_docs,
              |  CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
              |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
              |FROM g GROUP BY 1 ORDER BY pack_id""".stripMargin)),

    // TEMPERATURE mixture ([[Mixture.alphaSample]]): per-source quotas
    // DERIVED from the α = ½ policy (w_i = isqrt(source tokens),
    // normalized to half the corpus's tokens) instead of hand-fixed
    // weights — the XLM-R/mT5 temperature-sampling recipe. The whole
    // policy is integer-exact (Newton-corrected isqrt; the quota never
    // materializes — keep is the cross-multiplied
    // (cum_before+1)·Σw ≤ T·w_i), so the oracle replays it to the bit.
    Q("p16_alpha_mixture",
      (s, dir) => Mixture.alphaSample(
          Tables(s, dir, "documents"), "source", "doc_id",
          graft.functions.TextFunctions.tokenCount(col("text")),
          total => floor(total / 2).cast("long"))
        .orderBy(col("doc_id")),
      Some(alphaMixtureOracle(
        """SELECT c.doc_id, c.source, c.n_tokens, c.cum_before,
          |  w.w_alpha,
          |  CAST(c.cum_before + 1 AS HUGEINT) * sumw
          |    <= CAST(total // 2 AS HUGEINT) * w.w_alpha AS keep
          |FROM c JOIN w USING (source), tot, sw
          |ORDER BY doc_id""".stripMargin))),

    // α-mixture → pack composition (the p05 shape over the DERIVED
    // quotas): the temperature-kept documents packed into fixed-length
    // training sequences in doc_id order. Three integer-exact stages
    // chain — isqrt policy, keyed quota prefix sum, global packing
    // prefix sum — with no window and no cartesian between them.
    Q("p18_alpha_pack",
      (s, dir) => {
        val kept = Mixture.alphaSample(
            Tables(s, dir, "documents"), "source", "doc_id",
            graft.functions.TextFunctions.tokenCount(col("text")),
            total => floor(total / 2).cast("long"))
          .filter(col("keep"))
          .select(col("doc_id"), col("n_tokens"))
        Packing.packAssignments(kept, "doc_id", "n_tokens",
            CorpusPipeline.SeqLen)
          .groupBy(col("pack_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("long").as("pack_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy(col("pack_id"))
      },
      Some(alphaMixtureOracle(
        s""", kept AS (
           |  SELECT c.doc_id, c.n_tokens
           |  FROM c JOIN w USING (source), tot, sw
           |  WHERE CAST(c.cum_before + 1 AS HUGEINT) * sumw
           |    <= CAST(total // 2 AS HUGEINT) * w.w_alpha),
           |g AS (
           |  SELECT doc_id, n_tokens,
           |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           |  FROM kept)
           |SELECT (cum - n_tokens) // ${CorpusPipeline.SeqLen}
           |    AS pack_id,
           |  COUNT(*) AS n_docs,
           |  CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
           |FROM g GROUP BY 1 ORDER BY pack_id""".stripMargin))),

    // CLUSTER-BALANCED mixture: the DoReMi/cluster-curriculum shape —
    // when documents carry no source metadata, the mixture's domains
    // come from the corpus ITSELF: spherical k-means over the embedding
    // table (d13's deterministic codebook, trained in-plan) labels each
    // embedded document with its cluster, and the α = ½ temperature
    // policy ([[Mixture.alphaSample]]) flattens the cluster histogram —
    // big topic clusters capped, tail topics upsampled. Composition is
    // entirely declarative: the k-means CTEs splice ahead of the
    // mixture CTEs in the oracle exactly as the codebook literal
    // splices into the Spark plan (row-local assignment, zero extra
    // shuffle beyond the mixture's own keyed prefix sum — the 100 TB
    // cost is one doc↔cluster equi-join on doc_id).
    Q("p19_cluster_mixture",
      (s, dir) => {
        val emb = Tables(s, dir, "embeddings")
        val (codebook, _) = Similarity.kmeansFit(
          emb, "vec_id", "embedding", k = 10, iters = 3,
          trackObjective = false)
        val asg = Similarity
          .assignClusters(
            Similarity.normalized(emb, "vec_id", "embedding"), codebook)
          .select(col("vid").as("doc_id"),
            concat(lit("c"), col("cid")).as("cluster"))
        Mixture.alphaSample(
            Tables(s, dir, "documents").join(asg, "doc_id"),
            "cluster", "doc_id",
            graft.functions.TextFunctions.tokenCount(col("text")),
            total => floor(total / 2).cast("long"))
          .orderBy(col("doc_id"))
      },
      Some(alphaMixtureOracleOver(
        s"""${VectorQueries.kmeansCtes(k = 10, iters = 3)},
           |t AS (
           |  SELECT d.doc_id, 'c' || a.cid AS source, CAST(CASE
           |      WHEN length(trim(d.text)) = 0 THEN 0
           |      ELSE len(regexp_split_to_array(trim(d.text), '\\s+'))
           |    END AS BIGINT) AS n_tokens
           |  FROM documents d JOIN asg4 a ON d.doc_id = a.vid)""".stripMargin,
        """SELECT c.doc_id, c.source AS cluster, c.n_tokens,
          |  c.cum_before, w.w_alpha,
          |  CAST(c.cum_before + 1 AS HUGEINT) * sumw
          |    <= CAST(total // 2 AS HUGEINT) * w.w_alpha AS keep
          |FROM c JOIN w USING (source), tot, sw
          |ORDER BY doc_id""".stripMargin))),

    // Span-dedup → pack composition: d20's rewritten corpus fed to the
    // training loader — duplicated spans are cut from each document
    // (only corpus-first occurrences survive), the REMAINING token
    // counts pack into fixed-length sequences, fully-duplicated
    // documents vanish. The substring-dedup paper's pipeline position,
    // as two chained gated tiers: the gram-hash inverted index feeding
    // the global packing prefix sum, no window, no cartesian.
    Q("p20_span_pack",
      (s, dir) => {
        val cleaned = Dedup
          .spanDedup(Tables(s, dir, "documents"), "doc_id", "text", k = 5)
          .select(col("doc_id"),
            (col("n_tokens") - col("n_removed")).as("n_tokens"))
          .filter(col("n_tokens") > 0)
        Packing.packAssignments(cleaned, "doc_id", "n_tokens",
            CorpusPipeline.SeqLen)
          .groupBy(col("pack_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("long").as("pack_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy(col("pack_id"))
      },
      Some(raw"""WITH toks AS (
             |  SELECT doc_id,
             |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
             |         ELSE regexp_split_to_array(trim(text), '\s+') END w
             |  FROM documents),
             |g AS (
             |  SELECT doc_id, i, md5(array_to_string(w[i:i+4], ' ')) gh
             |  FROM toks, UNNEST(range(1, len(w) - 3)) AS t(i)
             |  WHERE len(w) >= 5),
             |fdoc AS (SELECT gh, MIN(doc_id) fd FROM g GROUP BY gh),
             |f AS (SELECT g.gh, fdoc.fd, MIN(g.i) fs
             |      FROM g JOIN fdoc ON g.gh = fdoc.gh AND g.doc_id = fdoc.fd
             |      GROUP BY g.gh, fdoc.fd),
             |dup AS (SELECT g.doc_id, g.i FROM g JOIN f USING (gh)
             |        WHERE NOT (g.doc_id = f.fd AND g.i = f.fs)),
             |cov AS (SELECT DISTINCT doc_id, i + o AS p
             |        FROM dup, UNNEST(range(0, 5)) AS u(o)),
             |cova AS (SELECT doc_id, COUNT(*) nr FROM cov GROUP BY doc_id),
             |kept AS (
             |  SELECT t.doc_id,
             |    CAST(len(t.w) - COALESCE(c.nr, 0) AS BIGINT) AS n_tokens
             |  FROM toks t LEFT JOIN cova c USING (doc_id)
             |  WHERE len(t.w) - COALESCE(c.nr, 0) > 0),
             |gp AS (
             |  SELECT doc_id, n_tokens,
             |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             |  FROM kept)
             |SELECT (cum - n_tokens) // ${CorpusPipeline.SeqLen}
             |    AS pack_id,
             |  COUNT(*) AS n_docs,
             |  CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
             |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
             |FROM gp GROUP BY 1 ORDER BY pack_id""".stripMargin)),

    // EPOCHED mixture ([[Mixture.epochedSample]]): the upsampling half
    // of mixture construction — targets of 2x the corpus's tokens
    // weighted (I+1)/210 push high-index sources past their own token
    // count, so they run multiple epochs (the Wikipedia-for-3-epochs
    // recipe); low-index sources keep a sub-epoch prefix. All integer
    // arithmetic (fixed-denominator decimal floor for the target, the
    // pmod ceil-div for epochs), so the oracle replays epoch counts
    // and prefix cuts exactly.
    Q("p06_epoched_mixture",
      (s, dir) => Mixture.epochedSample(
          Tables(s, dir, "documents"), "source", "doc_id",
          graft.functions.TextFunctions.tokenCount(col("text")),
          total => floor(((total * 2) * (regexp_extract(col("source"),
              "src(\\d+)", 1).cast("long") + 1)).cast("decimal(38,0)")
            / lit(210)).cast("long"))
        .orderBy(col("doc_id"), col("epoch")),
      Some("""WITH t AS (
             |  SELECT doc_id, source, CAST(CASE
             |      WHEN length(trim(text)) = 0 THEN 0
             |      ELSE len(regexp_split_to_array(trim(text), '\s+'))
             |    END AS BIGINT) AS n_tokens
             |  FROM documents),
             |tot AS (SELECT SUM(n_tokens) AS total FROM t),
             |c AS (
             |  SELECT doc_id, source, n_tokens,
             |    CAST(SUM(n_tokens) OVER (PARTITION BY source
             |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT)
             |      AS cum_before
             |  FROM t),
             |st AS (SELECT source, SUM(n_tokens) AS s FROM t
             |  GROUP BY source),
             |e AS (
             |  SELECT c.doc_id, c.source, c.n_tokens, c.cum_before,
             |    st.s,
             |    (2 * total * (CAST(regexp_extract(c.source,
             |      'src(\d+)', 1) AS BIGINT) + 1)) // 210 AS target
             |  FROM c JOIN st USING (source), tot
             |  WHERE st.s > 0)
             |SELECT doc_id, source, CAST(epoch AS INT) AS epoch,
             |  n_tokens
             |FROM (
             |  SELECT doc_id, source, n_tokens, cum_before, s, target,
             |    unnest(range(CAST((target + s - 1) // s AS BIGINT)))
             |      AS epoch
             |  FROM e)
             |WHERE epoch * s + cum_before < target
             |ORDER BY doc_id, epoch""".stripMargin)),

    // THE FULL PRETRAINING RECIPE ([[CorpusPipeline.fullManifest]]): the
    // p01 pipeline extended with its two missing production stages —
    // semantic dedup (SemDeDup predecessor rule under a deterministically
    // trained frozen codebook, the d13 recipe) and benchmark gram
    // decontamination (the d09 shape, benchmark = the held-out doc_id%5=0
    // fifth; corpus = the rest). quality → exact → MinHash near-dup →
    // semantic → decontam → pack, one oracle replaying every stage —
    // k-means training loop included — in SQL.
    Q("p07_full_recipe",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        CorpusPipeline.fullManifest(
            docs.filter(col("doc_id") % 5 =!= 0),
            Tables(s, dir, "embeddings")
              .filter(col("vec_id") % 5 =!= 0),
            docs.filter(col("doc_id") % 5 === 0),
            "doc_id", "text", "vec_id", "embedding")
          .orderBy(col("pack_id"))
      },
      Some(fullRecipeOracle("vec_id % 5 <> 0"))),

    // The full recipe INCREMENTALLY ([[CorpusPipeline.buildHistoryFull]]
    // / [[appendBatchFull]]): bootstrap on the first 80% of the corpus id
    // range — k-means codebook trained on the HISTORY embedding slice and
    // frozen (the d14 contract), benchmark grams persisted once — then
    // append the remaining 20% against the persisted seven-table state.
    // Oracle: the full recompute with training restricted to the history
    // slice — the increment must be indistinguishable from the one-shot
    // pass it amortizes.
    Q("p08_full_incremental",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") % 5 =!= 0)
        val bench = docs.filter(col("doc_id") % 5 === 0)
        val cEmb = Tables(s, dir, "embeddings")
          .filter(col("vec_id") % 5 =!= 0)
        val cut = corpus.agg(max(col("doc_id"))).head.getLong(0) * 4 / 5
        val st = CorpusPipeline.FullState("full_pipeline")
        CorpusPipeline.buildHistoryFull(s,
          corpus.filter(col("doc_id") <= cut),
          cEmb.filter(col("vec_id") <= cut), bench,
          "doc_id", "text", "vec_id", "embedding", st)
        CorpusPipeline.appendBatchFull(s,
          corpus.filter(col("doc_id") > cut),
          cEmb.filter(col("vec_id") > cut),
          "doc_id", "text", "vec_id", "embedding", st, "b1")
        CorpusPipeline.readManifest(s, st.base).orderBy(col("pack_id"))
      },
      Some(fullRecipeOracle(
        """vec_id % 5 <> 0 AND vec_id <= (SELECT MAX(doc_id) * 4 // 5
          |    FROM documents WHERE doc_id % 5 <> 0)""".stripMargin))),

    // The full recipe's funnel — the extended data card: survivors of
    // each of the six stages, final token total, training-sequence
    // count. The per-stage deltas are the corpus build's headline
    // numbers (how much each cleaning stage cost).
    Q("p09_full_funnel",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        CorpusPipeline.fullFunnel(
          docs.filter(col("doc_id") % 5 =!= 0),
          Tables(s, dir, "embeddings").filter(col("vec_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", "vec_id", "embedding")
      },
      Some(s"""${fullRecipeCtes("vec_id % 5 <> 0")}
              |SELECT
              |  (SELECT COUNT(*) FROM documents WHERE doc_id % 5 <> 0)
              |    AS n_raw,
              |  (SELECT COUNT(*) FROM q) AS n_quality,
              |  (SELECT COUNT(*) FROM kept) AS n_exact,
              |  (SELECT COUNT(*) FROM surv) AS n_neardup,
              |  (SELECT COUNT(*) FROM s4) AS n_semantic,
              |  (SELECT COUNT(*) FROM clean) AS n_clean,
              |  (SELECT CAST(SUM(toks) AS BIGINT) FROM clean)
              |    AS total_tokens,
              |  CAST(CEIL((SELECT SUM(toks) FROM clean)
              |    / ${CorpusPipeline.SeqLen}.0) AS BIGINT) AS n_packs"""
        .stripMargin)),

    // Cascading TAKEDOWN through the composed pipeline
    // ([[CorpusPipeline.delete]]): one verb forgets a document from all
    // five state tables — victims expand to their exact-content family
    // (identical copies of removed content are the same content), the
    // dedup store and doc_meta drop the family, near-dup verdicts REPAIR
    // off the persisted pair graph (a doc whose only predecessors were
    // victims resurrects — the d15 story for the shingle tier, no text
    // re-read), and shards re-pack from the earliest change onward.
    // Oracle: the one-shot pipeline over the corpus minus the family —
    // the store must be indistinguishable from one that never ingested
    // the family.
    // Cascading takedown through the FULL recipe's seven-table state
    // ([[CorpusPipeline.deleteFull]]): everything p10 does, plus the
    // two stages it lacks — SEMANTIC verdict repair with RESURRECTION
    // RE-INGEST (a doc whose only near-dup predecessor was a victim
    // resurrects at stage 3 and must then join the semantic stage
    // mid-history: assigned against the frozen codebook, its original
    // batch partition rewritten, every cluster it or a victim touches
    // re-evaluated) and decontam verdicts read from the persisted
    // per-doc flags in doc_meta. No text is ever re-read. Oracle: the
    // full recipe over the corpus minus the victims' exact-content
    // family, codebook still trained on the ORIGINAL history slice
    // (frozen learned statistics — the d15 policy).
    Q("p11_full_delete",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") % 5 =!= 0)
        val bench = docs.filter(col("doc_id") % 5 === 0)
        val cEmb = Tables(s, dir, "embeddings")
          .filter(col("vec_id") % 5 =!= 0)
        val cut = corpus.agg(max(col("doc_id"))).head.getLong(0) * 4 / 5
        val st = CorpusPipeline.FullState("full_pipeline_del")
        CorpusPipeline.buildHistoryFull(s,
          corpus.filter(col("doc_id") <= cut),
          cEmb.filter(col("vec_id") <= cut), bench,
          "doc_id", "text", "vec_id", "embedding", st)
        CorpusPipeline.appendBatchFull(s,
          corpus.filter(col("doc_id") > cut),
          cEmb.filter(col("vec_id") > cut),
          "doc_id", "text", "vec_id", "embedding", st, "b1")
        CorpusPipeline.deleteFull(s, st,
          corpus.filter(col("doc_id") % 10 === 7).select(col("doc_id")),
          cEmb, "vec_id", "embedding")
        CorpusPipeline.readManifest(s, st.base).orderBy(col("pack_id"))
      },
      Some(fullRecipeOracle(
        """vec_id % 5 <> 0 AND vec_id <= (SELECT MAX(doc_id) * 4 // 5
          |    FROM documents WHERE doc_id % 5 <> 0)""".stripMargin,
        famPred = "doc_id % 10 = 7"))),

    // The capstone AS AN ENGINE MODEL ([[CorpusProject]]): the same
    // full-recipe manifest as p07, but produced by `run --project
    // corpus --select +corpus_manifest` — source registry → staging
    // views → DfModel build → atomic table sink → catalog read-back.
    // One oracle (p07's full recompute) covers both surfaces, pinning
    // that the model tier adds orchestration, never semantics.
    Q("p12_recipe_model",
      (s, dir) => {
        val r = CorpusProject.runner(dir)
        r.run(s, select = Some("+corpus_manifest"))
        r.table(s, "corpus_manifest").orderBy(col("pack_id"))
      },
      Some(fullRecipeOracle("vec_id % 5 <> 0"))),

    // EPOCH-FENCED packing ([[CorpusPipeline.fence]]): commit the pack
    // offset to the next SeqLen multiple at two declared fences, so
    // later batches pack from PINNED offsets. The oracle replays the
    // fence arithmetic — per-segment prefix sums with each segment's
    // committed ceil-offset — in closed form (each fence offset is a
    // scalar of the PREVIOUS segments' totals, so the recurrence
    // unrolls into chained scalar subqueries).
    Q("p13_fenced_pipeline",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
        val (c1, c2) = (maxId * 3 / 5, maxId * 4 / 5)
        val st = CorpusPipeline.State("fenced_pipe")
        CorpusPipeline.buildHistory(s, docs.filter(col("doc_id") <= c1),
          "doc_id", "text", st)
        CorpusPipeline.fence(s, st)
        CorpusPipeline.appendBatch(s,
          docs.filter(col("doc_id") > c1 && col("doc_id") <= c2),
          "doc_id", "text", st, "b1")
        CorpusPipeline.fence(s, st)
        CorpusPipeline.appendBatch(s, docs.filter(col("doc_id") > c2),
          "doc_id", "text", st, "b2")
        CorpusPipeline.readManifest(s, st).orderBy(col("pack_id"))
      },
      Some(fencedOracle("FALSE"))),

    // The fence's whole POINT — a takedown bounded by epoch: fences are
    // COMMITTED STATE, so the post-delete manifest packs the surviving
    // corpus against the ORIGINAL fence offsets (computed from the
    // pre-delete corpus totals), and epochs without changed documents
    // keep their shard partials byte-for-byte (spec-pinned; here the
    // oracle proves the offset semantics — the `o` chain computes
    // fences over the FULL corpus, the main chain packs the survivors).
    Q("p14_fenced_delete",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
        val (c1, c2) = (maxId * 3 / 5, maxId * 4 / 5)
        val st = CorpusPipeline.State("fenced_del")
        CorpusPipeline.buildHistory(s, docs.filter(col("doc_id") <= c1),
          "doc_id", "text", st)
        CorpusPipeline.fence(s, st)
        CorpusPipeline.appendBatch(s,
          docs.filter(col("doc_id") > c1 && col("doc_id") <= c2),
          "doc_id", "text", st, "b1")
        CorpusPipeline.fence(s, st)
        CorpusPipeline.appendBatch(s, docs.filter(col("doc_id") > c2),
          "doc_id", "text", st, "b2")
        CorpusPipeline.delete(s, st,
          docs.filter(col("doc_id") % 10 === 7).select(col("doc_id")))
        CorpusPipeline.readManifest(s, st).orderBy(col("pack_id"))
      },
      Some(fencedOracle("doc_id % 10 = 7"))),

    // TOKENIZED shard materialization ([[CorpusPipeline
    // .tokenizedShards]]): the manifest-to-training-loader step — pack
    // quality survivors by their LEARNED-BPE token counts (8 trained
    // merges; whitespace counts decide nothing here) and fingerprint
    // each pack's concatenated segmented content. The oracle replays
    // tokenizer training (t18's unrolled Lloyd-style CTE chain),
    // segmentation, quality, the packing prefix sum, and the ordered
    // per-pack md5 — a trainer-side shard check, verified end to end.
    Q("p15_tokenized_shards",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val merges = graft.operators.Bpe.trainMerges(docs, "text", 8)
        CorpusPipeline.tokenizedShards(docs, "doc_id", "text", merges)
          .orderBy(col("pack_id"))
      },
      Some(tokenizedShardsOracle(8))),

    // The full recipe WITH the model-based quality stage (t21's
    // fastText-style classifier conjoined onto the heuristic quality
    // gate — [[CorpusPipeline.qualitySurvivors]]'s `modelQuality` arm):
    // the industry-standard two-tier quality stage composed through all
    // six downstream stages. The oracle is p07's full recompute with
    // the classifier's integer cross-multiplied threshold added to the
    // quality CTE — every dropped document cascades identically through
    // exact dedup, near-dup, semantic, decontam, and packing in both
    // engines.
    Q("p17_classified_recipe",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        CorpusPipeline.fullManifest(
            docs.filter(col("doc_id") % 5 =!= 0),
            Tables(s, dir, "embeddings")
              .filter(col("vec_id") % 5 =!= 0),
            docs.filter(col("doc_id") % 5 === 0),
            "doc_id", "text", "vec_id", "embedding",
            modelQuality = true)
          .orderBy(col("pack_id"))
      },
      Some(fullRecipeOracle("vec_id % 5 <> 0",
        qualityExtra = classifierPredSql))),

    Q("p10_pipeline_delete",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val cut = docs.agg(max(col("doc_id"))).head.getLong(0) * 4 / 5
        val st = CorpusPipeline.State("pipeline_del")
        CorpusPipeline.buildHistory(s,
          docs.filter(col("doc_id") <= cut), "doc_id", "text", st)
        CorpusPipeline.appendBatch(s,
          docs.filter(col("doc_id") > cut), "doc_id", "text", st, "b1")
        CorpusPipeline.delete(s, st,
          docs.filter(col("doc_id") % 10 === 7).select(col("doc_id")))
        CorpusPipeline.readManifest(s, st).orderBy(col("pack_id"))
      },
      Some(s"""WITH qw AS (
              |  SELECT doc_id, text,
              |    regexp_split_to_array(trim(text), '\\s+') AS w
              |  FROM documents),
              |q0 AS (
              |  SELECT doc_id, text, CAST(len(w) AS BIGINT) AS toks,
              |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
              |      AS fp
              |  FROM qw
              |  WHERE len(w) BETWEEN 50 AND 100000
              |    AND ROUND(len(list_filter(w,
              |          t -> regexp_matches(t, '[A-Za-z]')))
              |          / len(w), 6) > 0.8),
              |fam AS (
              |  SELECT doc_id FROM q0
              |  WHERE fp IN (SELECT fp FROM q0 WHERE doc_id % 10 = 7)),
              |q AS (
              |  SELECT doc_id, text, toks, fp FROM q0
              |  WHERE doc_id NOT IN (SELECT doc_id FROM fam)),
              |ex AS (
              |  SELECT doc_id, toks, ROW_NUMBER() OVER (
              |    PARTITION BY fp ORDER BY doc_id) AS rn
              |  FROM q),
              |kept AS (SELECT doc_id, toks FROM ex WHERE rn = 1),
              |sh AS (
              |  SELECT doc_id,
              |    list_distinct(list_transform(range(1, len(w)-1),
              |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) shingles
              |  FROM kept JOIN qw USING (doc_id)
              |  WHERE len(w) >= 3),
              |sizes AS (SELECT doc_id, len(shingles) n_sh FROM sh),
              |exn AS (SELECT doc_id, unnest(shingles) shingle FROM sh),
              |inter AS (
              |  SELECT a.doc_id doc_a, b.doc_id doc_b, COUNT(*) n_common
              |  FROM exn a JOIN exn b
              |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2),
              |drops AS (
              |  SELECT DISTINCT doc_b FROM inter
              |  JOIN sizes sa ON doc_a = sa.doc_id
              |  JOIN sizes sb ON doc_b = sb.doc_id
              |  WHERE n_common / (sa.n_sh + sb.n_sh - n_common)
              |    >= ${CorpusPipeline.Threshold}),
              |surv AS (
              |  SELECT doc_id, toks FROM kept
              |  WHERE doc_id NOT IN (SELECT doc_b FROM drops)),
              |c AS (SELECT doc_id, toks,
              |  CAST(SUM(toks) OVER (ORDER BY doc_id) AS BIGINT) AS cum
              |  FROM surv)
              |SELECT (cum - toks) // ${CorpusPipeline.SeqLen} AS pack_id,
              |  COUNT(*) AS n_docs,
              |  CAST(SUM(toks) AS BIGINT) AS pack_tokens,
              |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
              |FROM c GROUP BY 1 ORDER BY pack_id""".stripMargin)),

    // Deterministic TRAINING-ORDER shuffle — the last manifest step
    // before the loader: packed sequences must reach training in
    // pseudo-random order (id order bakes corpus layout into the
    // curriculum), every shard an unbiased sample, and the whole
    // permutation REPRODUCIBLE (the "data order is part of the run
    // config" discipline). Each pack hashes to a shard
    // (md5 prefix mod 8 — no global count needed, map-only) and takes
    // its within-shard position from the hash order via
    // [[Packing.keyedCumSum]] — the two-phase keyed prefix sum, so
    // there is NO per-shard ranking window: at 100 TB a shard's
    // billions of packs would otherwise sort in one task. Oracle
    // replays the packing prefix sum, the hash sharding, and the
    // hash-order positions exactly.
    Q("p21_shard_shuffle",
      (s, dir) => {
        val kept = Tables(s, dir, "documents")
          .select(col("doc_id"), graft.functions.TextFunctions
            .tokenCount(col("text")).as("n_tokens"))
        val packs = Packing.packAssignments(kept, "doc_id", "n_tokens",
            CorpusPipeline.SeqLen)
          .groupBy(col("pack_id"))
          .agg(sum(col("n_tokens")).cast("long").as("pack_tokens"))
        val hashed = packs
          .withColumn("h", md5(col("pack_id").cast("string")))
          .withColumn("shard",
            pmod(conv(substring(col("h"), 1, 8), 16, 10).cast("long"),
              lit(8L)))
          .withColumn("shard_str", col("shard").cast("string"))
          .withColumn("ord",
            concat(col("h"), lit("-"), col("pack_id").cast("string")))
          .withColumn("one", lit(1L))
        Packing.keyedCumSum(hashed, "shard_str", "ord", "one")
          .select(col("pack_id"), col("shard"),
            col("cum_before").as("shard_pos"), col("pack_tokens"))
          .orderBy(col("shard"), col("shard_pos"))
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, CAST(CASE
              |      WHEN length(trim(text)) = 0 THEN 0
              |      ELSE len(regexp_split_to_array(trim(text), '\\s+'))
              |    END AS BIGINT) AS n_tokens
              |  FROM documents),
              |g AS (
              |  SELECT doc_id, n_tokens,
              |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
              |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
              |  FROM t),
              |pk AS (
              |  SELECT (cum - n_tokens) // ${CorpusPipeline.SeqLen}
              |      AS pack_id,
              |    CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
              |  FROM g GROUP BY 1),
              |h AS (
              |  SELECT pack_id, pack_tokens,
              |    md5(CAST(pack_id AS VARCHAR)) AS h
              |  FROM pk),
              |sh AS (
              |  SELECT pack_id, pack_tokens, h,
              |    CAST(('0x' || substr(h, 1, 8)) AS BIGINT) % 8 AS shard
              |  FROM h)
              |SELECT pack_id, shard,
              |  ROW_NUMBER() OVER (PARTITION BY shard
              |    ORDER BY h || '-' || CAST(pack_id AS VARCHAR)) - 1
              |    AS shard_pos,
              |  pack_tokens
              |FROM sh ORDER BY shard, shard_pos""".stripMargin)),

    // CURRICULUM packing — the quality-annealed training order
    // (MiniCPM's decay-phase upweighting, Llama-3's annealing mix:
    // finish training on the highest-quality slice): t21's classifier
    // splits the KEPT corpus into three quality phases by integer
    // thresholds on the mean feature weight (≤0, ≤0.15, >0.15 — the
    // cross-multiplied `logit_num ≤ 150·n_features` discipline, no
    // division anywhere in the banding), and each phase packs
    // SEPARATELY via [[Packing.keyedCumSum]] with the phase as the
    // key — so the training order is (phase, pack_id) and the anneal
    // slice is exactly the phase-2 tail. No ranking window anywhere
    // (the p21 argument: a phase's billions of packs would otherwise
    // sort in one task); the classifier fuses into the scan
    // projection, the prefix sum adds one range Exchange. Oracle
    // replays classifier → banding → per-phase windowed prefix sum.
    Q("p22_curriculum_pack",
      (s, dir) => {
        import graft.functions.TextFunctions
        val docs = Tables(s, dir, "documents")
        val scored = docs.select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"),
          size(TextFunctions.classifierFeatures(col("text")))
            .cast("long").as("n_features"),
          TextFunctions.classifierLogitNum(col("text")).as("logit_num"))
        val kept = scored
          .filter(TextFunctions.classifierKeep(
            col("logit_num"), col("n_features")))
          .withColumn("phase",
            when(col("logit_num") <= 0, lit(0L))
              .when(col("logit_num") <= lit(150L) * col("n_features"),
                lit(1L))
              .otherwise(lit(2L)))
          .withColumn("phase_str", col("phase").cast("string"))
          .select(col("doc_id"), col("n_tokens"), col("phase"),
            col("phase_str"))
        Packing.keyedCumSum(kept, "phase_str", "doc_id", "n_tokens")
          .withColumn("pack_id",
            expr(s"cum_before div ${CorpusPipeline.SeqLen}"))
          .groupBy(col("phase"), col("pack_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("long").as("pack_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy(col("phase"), col("pack_id"))
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id,
              |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              |      ELSE len(regexp_split_to_array(trim(text), '\\s+'))
              |    END AS BIGINT) AS n_tokens,
              |    regexp_split_to_array(trim(text), '\\s+') w
              |  FROM documents),
              |f AS (
              |  SELECT doc_id, n_tokens,
              |    list_transform(w, x -> 'u:' || lower(x)) ||
              |    list_transform(range(1, len(w)),
              |      i -> 'b:' || lower(w[i]) || '_' || lower(w[i+1]))
              |      AS fs
              |  FROM t),
              |sc AS (
              |  SELECT doc_id, n_tokens,
              |    CAST(len(fs) AS BIGINT) AS n_features,
              |    CAST(list_sum(list_transform(fs, f ->
              |      (CAST(('0x' || substr(md5(f),1,8)) AS BIGINT) % 2001)
              |        - 1000)) AS BIGINT) AS logit_num
              |  FROM f),
              |k AS (
              |  SELECT doc_id, n_tokens,
              |    CAST(CASE WHEN logit_num <= 0 THEN 0
              |      WHEN logit_num <= 150 * n_features THEN 1
              |      ELSE 2 END AS BIGINT) AS phase
              |  FROM sc WHERE logit_num > -150 * n_features),
              |g AS (
              |  SELECT phase, doc_id, n_tokens,
              |    CAST(SUM(n_tokens) OVER (PARTITION BY phase
              |      ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
              |      AS BIGINT) AS cum
              |  FROM k)
              |SELECT phase,
              |  (cum - n_tokens) // ${CorpusPipeline.SeqLen} AS pack_id,
              |  COUNT(*) AS n_docs,
              |  CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
              |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
              |FROM g GROUP BY 1, 2
              |ORDER BY phase, pack_id""".stripMargin))
  )

  /** The full recipe's CTE chain: k-means training (`trainPred` slice)
    * and corpus-wide assignment ([[VectorQueries.kmeansCtesK]] — the
    * cluster count replays the [[SemanticStore.autoK]] policy from the
    * training pool's COUNT(*), the d19 pattern, so the oracle verifies
    * the POLICY as well as the clustering), then the p01 document
    * stages restricted to the doc_id%5<>0 corpus — with an optional
    * TAKEDOWN (`famPred` selects the victims; their whole
    * exact-content family among quality survivors leaves the pipeline,
    * the p10/p11 semantics) — then the semantic predecessor drops among
    * pipeline survivors, then the benchmark-gram decontamination,
    * ending at `clean(doc_id, toks)` and the packing prefix sum `c`. */
  /** Shared CTE chain for the α = ½ temperature-mixture gates: token
    * counts `t`, corpus total `tot`, per-source totals `ps`, the
    * Newton-corrected isqrt weights `w`, their sum `sw`, and the
    * per-source deterministic-shuffle prefix sum `c` — the caller
    * appends the final SELECT (per-doc keeps for p16, the packed
    * manifest for p18). */
  private def alphaMixtureOracle(tail: String): String =
    alphaMixtureOracleOver(
      """WITH t AS (
        |  SELECT doc_id, source, CAST(CASE
        |      WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+'))
        |    END AS BIGINT) AS n_tokens
        |  FROM documents)""".stripMargin, tail)

  /** [[alphaMixtureOracle]] with the labeled-document CTE supplied by
    * the caller — `prelude` must end with a CTE named `t` exposing
    * (doc_id, source, n_tokens); p19 routes the k-means cluster CTEs
    * through here. */
  private def alphaMixtureOracleOver(prelude: String, tail: String): String =
    s"""$prelude,
       |tot AS (SELECT SUM(n_tokens) AS total FROM t),
       |ps AS (SELECT source, SUM(n_tokens) AS s FROM t GROUP BY source),
       |w AS (
       |  SELECT source,
       |    CASE WHEN (s0+1)*(s0+1) <= s THEN s0+1
       |         WHEN s0*s0 > s THEN s0-1 ELSE s0 END AS w_alpha
       |  FROM (SELECT source, s, CAST(floor(sqrt(s)) AS BIGINT) AS s0
       |        FROM ps)),
       |sw AS (SELECT SUM(w_alpha) AS sumw FROM w),
       |c AS (
       |  SELECT doc_id, source, n_tokens,
       |    CAST(SUM(n_tokens) OVER (PARTITION BY source
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT)
       |      AS cum_before
       |  FROM t)
       |$tail""".stripMargin

  /** DuckDB replay of the t21 classifier keep over q0's token array
    * `w`: quality survivors have len(w) ≥ 50, so the feature count is
    * exactly 2·len(w) − 1 (unigrams + bigrams) and the cross-multiplied
    * integer threshold needs no separate length CTE. */
  private def classifierPredSql: String =
    s"""AND CAST(list_sum(list_transform(
       |      list_transform(w, x -> 'u:' || lower(x)) ||
       |      list_transform(range(1, len(w)),
       |        i -> 'b:' || lower(w[i]) || '_' || lower(w[i+1])),
       |      f -> (CAST(('0x' || substr(md5(f),1,8)) AS BIGINT) % 2001)
       |        - 1000)) AS BIGINT)
       |    > ${graft.functions.TextFunctions.ClassifierThresholdMilli}
       |      * (2 * len(w) - 1)""".stripMargin

  private def fullRecipeCtes(trainPred: String,
      famPred: String = "FALSE", qualityExtra: String = ""): String = {
    val gram8 = (1 to 8).map(j => s"w[i+${j - 1}]").mkString(" || ' ' || ")
    s"""${VectorQueries.kmeansCtesK(
         s"(SELECT GREATEST(1, COUNT(*) // ${
           SemanticStore.TargetClusterSize}) FROM nh)",
         CorpusPipeline.SemIters, trainPred)},
       |qw AS (
       |  SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS w
       |  FROM documents WHERE doc_id % 5 <> 0),
       |q0 AS (
       |  SELECT doc_id, text, CAST(len(w) AS BIGINT) AS toks,
       |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
       |  FROM qw
       |  WHERE len(w) BETWEEN 50 AND 100000
       |    AND ROUND(len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]')))
       |          / len(w), 6) > 0.8
       |    $qualityExtra),
       |fam AS (
       |  SELECT doc_id FROM q0
       |  WHERE fp IN (SELECT fp FROM q0 WHERE ($famPred))),
       |q AS (
       |  SELECT doc_id, text, toks, fp FROM q0
       |  WHERE doc_id NOT IN (SELECT doc_id FROM fam)),
       |ex AS (
       |  SELECT doc_id, toks, ROW_NUMBER() OVER (
       |    PARTITION BY fp ORDER BY doc_id) AS rn
       |  FROM q),
       |kept AS (SELECT doc_id, toks FROM ex WHERE rn = 1),
       |sh AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(1, len(w)-1),
       |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) shingles
       |  FROM kept JOIN qw USING (doc_id)
       |  WHERE len(w) >= 3),
       |sizes AS (SELECT doc_id, len(shingles) n_sh FROM sh),
       |exn AS (SELECT doc_id, unnest(shingles) shingle FROM sh),
       |inter AS (
       |  SELECT a.doc_id doc_a, b.doc_id doc_b, COUNT(*) n_common
       |  FROM exn a JOIN exn b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |drops AS (
       |  SELECT DISTINCT doc_b FROM inter
       |  JOIN sizes sa ON doc_a = sa.doc_id
       |  JOIN sizes sb ON doc_b = sb.doc_id
       |  WHERE n_common / (sa.n_sh + sb.n_sh - n_common)
       |    >= ${CorpusPipeline.Threshold}),
       |surv AS (
       |  SELECT doc_id, toks FROM kept
       |  WHERE doc_id NOT IN (SELECT doc_b FROM drops)),
       |sasg AS (
       |  SELECT a.vid, a.cid, a.v, a.nrm
       |  FROM asg${CorpusPipeline.SemIters + 1} a
       |  JOIN surv s ON a.vid = s.doc_id),
       |sdrops AS (
       |  SELECT DISTINCT b.vid FROM sasg a JOIN sasg b
       |    ON a.cid = b.cid AND a.vid < b.vid
       |  WHERE ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6)
       |    >= ${CorpusPipeline.SemTau}),
       |s4 AS (
       |  SELECT doc_id, toks FROM surv
       |  WHERE doc_id NOT IN (SELECT vid FROM sdrops)),
       |bw AS (
       |  SELECT regexp_split_to_array(trim(text), '\\s+') AS w
       |  FROM documents
       |  WHERE doc_id % 5 = 0 AND length(trim(text)) > 0),
       |bg AS (
       |  SELECT DISTINCT unnest(list_distinct(list_transform(
       |    range(1, len(w) - 6), i -> $gram8))) AS gram
       |  FROM bw WHERE len(w) >= 8),
       |tg AS (
       |  SELECT s.doc_id, unnest(list_distinct(list_transform(
       |    range(1, len(qw.w) - 6), i -> ${gram8.replace("w[", "qw.w[")})))
       |    AS gram
       |  FROM s4 s JOIN qw USING (doc_id) WHERE len(qw.w) >= 8),
       |contam AS (SELECT DISTINCT tg.doc_id FROM tg JOIN bg USING (gram)),
       |clean AS (
       |  SELECT doc_id, toks FROM s4
       |  WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
       |c AS (SELECT doc_id, toks,
       |  CAST(SUM(toks) OVER (ORDER BY doc_id) AS BIGINT) AS cum
       |  FROM clean)""".stripMargin
  }

  private[graft] def fullRecipeOracle(trainPred: String,
      famPred: String = "FALSE", qualityExtra: String = ""): String =
    s"""${fullRecipeCtes(trainPred, famPred, qualityExtra)}
       |SELECT (cum - toks) // ${CorpusPipeline.SeqLen} AS pack_id,
       |  COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS pack_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM c GROUP BY 1 ORDER BY pack_id""".stripMargin

  /** The p10 document chain (quality → family takedown → exact →
    * brute-force near-dup → survivors) with suffixed CTE names, so two
    * differently-parameterized chains can share one query (p14 needs
    * the full corpus's chain for the committed fence offsets AND the
    * post-delete chain for the packed rows). Ends at
    * `surv$sfx(doc_id, toks)`; expects `qw`/`q0` in scope. */
  private def survChainCtes(sfx: String, famPred: String): String =
    s"""fam$sfx AS (
       |  SELECT doc_id FROM q0
       |  WHERE fp IN (SELECT fp FROM q0 WHERE ($famPred))),
       |q$sfx AS (
       |  SELECT doc_id, text, toks, fp FROM q0
       |  WHERE doc_id NOT IN (SELECT doc_id FROM fam$sfx)),
       |ex$sfx AS (
       |  SELECT doc_id, toks, ROW_NUMBER() OVER (
       |    PARTITION BY fp ORDER BY doc_id) AS rn
       |  FROM q$sfx),
       |kept$sfx AS (SELECT doc_id, toks FROM ex$sfx WHERE rn = 1),
       |sh$sfx AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(1, len(w)-1),
       |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) shingles
       |  FROM kept$sfx JOIN qw USING (doc_id)
       |  WHERE len(w) >= 3),
       |sizes$sfx AS (SELECT doc_id, len(shingles) n_sh FROM sh$sfx),
       |exn$sfx AS (SELECT doc_id, unnest(shingles) shingle FROM sh$sfx),
       |inter$sfx AS (
       |  SELECT a.doc_id doc_a, b.doc_id doc_b, COUNT(*) n_common
       |  FROM exn$sfx a JOIN exn$sfx b
       |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |drops$sfx AS (
       |  SELECT DISTINCT doc_b FROM inter$sfx
       |  JOIN sizes$sfx sa ON doc_a = sa.doc_id
       |  JOIN sizes$sfx sb ON doc_b = sb.doc_id
       |  WHERE n_common / (sa.n_sh + sb.n_sh - n_common)
       |    >= ${CorpusPipeline.Threshold}),
       |surv$sfx AS (
       |  SELECT doc_id, toks FROM kept$sfx
       |  WHERE doc_id NOT IN (SELECT doc_b FROM drops$sfx))"""
      .stripMargin

  /** The p15 oracle: BPE training (t18's unrolled CTEs over the FULL
    * corpus vocabulary), the merge-literal replace chain applied to
    * quality survivors, the packing prefix sum over LEARNED token
    * counts, and the ordered per-pack content md5. */
  private def tokenizedShardsOracle(n: Int): String = {
    val S = graft.operators.Bpe.Sep
    val L = CorpusPipeline.SeqLen
    s"""WITH ${TextQueries.bpeTrainCtes(n)},
       |qd AS (
       |  SELECT doc_id, text,
       |    regexp_split_to_array(trim(text), '\\s+') AS w
       |  FROM documents),
       |q AS (
       |  SELECT doc_id, text FROM qd
       |  WHERE len(w) BETWEEN 50 AND 100000
       |    AND ROUND(len(list_filter(w,
       |          t -> regexp_matches(t, '[A-Za-z]')))
       |          / len(w), 6) > 0.8),
       |seg AS (
       |  SELECT doc_id, ${TextQueries.bpeAppliedExpr(n)} AS rep
       |  FROM q),
       |tk AS (
       |  SELECT doc_id, rep,
       |    CAST(len(list_filter(string_split(trim(rep, '$S'), '$S'),
       |      s -> s <> ' ')) AS BIGINT) AS btoks
       |  FROM seg),
       |c AS (
       |  SELECT doc_id, rep, btoks,
       |    CAST(SUM(btoks) OVER (ORDER BY doc_id) AS BIGINT) AS cum
       |  FROM tk)
       |SELECT (cum - btoks) // $L AS pack_id,
       |  COUNT(*) AS n_docs, CAST(SUM(btoks) AS BIGINT) AS pack_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
       |  md5(string_agg(rep, '' ORDER BY doc_id)) AS content_md5
       |FROM c GROUP BY 1 ORDER BY pack_id""".stripMargin
  }

  /** Oracle for the epoch-fenced gates: two fences at doc-id cuts 3/5
    * and 4/5 of the max id. Fence offsets are the COMMITTED values —
    * ceil-rounded running totals of the ORIGINAL corpus's survivors
    * (`survo` when a takedown removed documents afterwards) — and the
    * packed rows are the current survivors, each segment prefix-summed
    * from its pinned offset. The per-fence recurrence o_{j+1} =
    * ceil((o_j + t_j) / L) * L unrolls into chained scalar CTEs. */
  private def fencedOracle(famPred: String): String = {
    val L = CorpusPipeline.SeqLen
    val cut1 = "(SELECT MAX(doc_id) * 3 // 5 FROM documents)"
    val cut2 = "(SELECT MAX(doc_id) * 4 // 5 FROM documents)"
    val chains =
      if (famPred == "FALSE") survChainCtes("", "FALSE")
      else survChainCtes("o", "FALSE") + ",\n" +
        survChainCtes("", famPred)
    val orig = if (famPred == "FALSE") "surv" else "survo"
    val head =
      """WITH qw AS (
        |  SELECT doc_id, text,
        |    regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |q0 AS (
        |  SELECT doc_id, text, CAST(len(w) AS BIGINT) AS toks,
        |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
        |      AS fp
        |  FROM qw
        |  WHERE len(w) BETWEEN 50 AND 100000
        |    AND ROUND(len(list_filter(w,
        |          t -> regexp_matches(t, '[A-Za-z]')))
        |          / len(w), 6) > 0.8)""".stripMargin
    val tail =
      s"""sego AS (SELECT doc_id, toks,
         |  CASE WHEN doc_id <= $cut1 THEN 0
         |       WHEN doc_id <= $cut2 THEN 1 ELSE 2 END AS sg
         |  FROM $orig),
         |t0 AS (SELECT CAST(COALESCE(SUM(toks), 0) AS BIGINT) v
         |  FROM sego WHERE sg = 0),
         |o1 AS (SELECT CAST((((SELECT v FROM t0) + ${L - 1}) // $L)
         |    * $L AS BIGINT) v),
         |t1 AS (SELECT CAST(COALESCE(SUM(toks), 0) AS BIGINT) v
         |  FROM sego WHERE sg = 1),
         |o2 AS (SELECT CAST(((((SELECT v FROM o1) + (SELECT v FROM t1))
         |    + ${L - 1}) // $L) * $L AS BIGINT) v),
         |seg AS (SELECT doc_id, toks,
         |  CASE WHEN doc_id <= $cut1 THEN 0
         |       WHEN doc_id <= $cut2 THEN 1 ELSE 2 END AS sg
         |  FROM surv),
         |c AS (SELECT doc_id, toks, sg,
         |  CAST(SUM(toks) OVER (PARTITION BY sg ORDER BY doc_id)
         |    AS BIGINT) AS cum
         |  FROM seg)
         |SELECT (CASE sg WHEN 0 THEN 0 WHEN 1 THEN (SELECT v FROM o1)
         |    ELSE (SELECT v FROM o2) END + cum - toks) // $L AS pack_id,
         |  COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS pack_tokens,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM c GROUP BY 1 ORDER BY pack_id""".stripMargin
    s"$head,\n$chains,\n$tail"
  }
}
