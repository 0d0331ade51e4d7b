package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the LLM-data-pipeline tier. All pure
  * built-in expressions (codegen'd, no UDFs) so they inline into
  * whole-stage codegen and survive pushdown/pruning — the per-row cost at
  * 100 TB is the scan plus these fused expressions.
  *
  * Every builder has deliberately portable semantics (documented inline) so
  * the DuckDB oracles can replicate them exactly.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text. `split` drops no empty tokens for
    * all-whitespace input, so callers guard with [[tokenCount]] semantics. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0)).otherwise(size(tokens(c)))

  /** Distinct word n-gram shingles ("a b c" strings); < n tokens → empty.
    * Delegates to the native [[graft.functions.WordShingles]] expression
    * (one pass; the equivalent built-in higher-order chain dominated the
    * dedup profile). */
  def wordShingles(c: Column, n: Int): Column = Hashing.wordShingles(c, n)

  // ---- Model-based quality scoring (t21) -----------------------------
  //
  // The fastText-supervised shape every published pretraining recipe's
  // quality-classifier stage uses (CCNet/LLaMA-style "looks like a
  // reference corpus" filtering): hashed lexical features → linear
  // dot → sigmoid. The FEATURE PLUMBING is the real thing — lowercased
  // word unigrams + bigrams, the hashing trick (a feature's weight is a
  // pure function of its hash, no vocabulary table to ship), a per-doc
  // mean-weight logit — while the frozen WEIGHTS are a deterministic
  // md5-derived surrogate (integer in [-1000, 1000] per feature), which
  // keeps the whole stage exactly replayable in the DuckDB oracle;
  // swapping in a published model's weights is swapping
  // [[featureWeight]] for a lookup, nothing else moves. All arithmetic
  // up to the threshold decision is INTEGER (weights sum in a long;
  // keep compares logit_num against Threshold·n cross-multiplied), so
  // engines cannot drift. Map-only at any scale: the logit fuses into
  // the scan projection; no shuffle, no vocabulary broadcast.

  /** Per-feature integer weight in [-1000, 1000]: the first 8 md5 hex
    * chars as an integer, mod 2001, recentred. Both operands of `%` are
    * non-negative, so Spark and DuckDB agree on the remainder. */
  def featureWeight(f: Column): Column =
    conv(substring(md5(f), 1, 8), 16, 10).cast("long") % 2001 - 1000

  /** The classifier's feature set: "u:"-prefixed lowercased unigrams
    * plus "b:"-prefixed lowercased bigrams (underscore-joined). Never
    * empty — all-whitespace text tokenizes to one empty-string token,
    * which maps to the single feature "u:". */
  def classifierFeatures(c: Column): Column = {
    val w = tokens(c)
    val uni = transform(w, x => concat(lit("u:"), lower(x)))
    val bi = zip_with(
      slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
      (a, b) => concat(lit("b:"), lower(a), lit("_"), lower(b)))
    concat(uni, bi)
  }

  /** The UNNORMALIZED logit: Σ featureWeight over the doc's features —
    * a long, exact by construction. The mean-weight score is
    * `logit_num / (n_features · 1000)`; thresholds compare
    * cross-multiplied integers instead ([[classifierKeep]]). */
  def classifierLogitNum(c: Column): Column =
    aggregate(classifierFeatures(c), lit(0L),
      (acc, f) => acc + featureWeight(f))

  /** Keep threshold on the mean feature weight, in milli-units:
    * keep ⟺ score > -0.15 ⟺ logit_num > -150 · n_features. Drops the
    * bottom ~8% of the fixture corpus — the published recipes' "remove
    * the clearly-junk tail" operating point. */
  val ClassifierThresholdMilli = -150

  /** Integer-exact keep decision for precomputed (logit_num, n). */
  def classifierKeep(logitNum: Column, n: Column): Column =
    logitNum > lit(ClassifierThresholdMilli) * n

  // ---- URL canonicalization + host grouping (t22) --------------------
  //
  // The crawl-side normalization every corpus pipeline runs before
  // URL-level dedup: two fetches of one resource routinely differ in
  // scheme/host case, an explicit default port, tracking parameters,
  // query-key order, and fragments — none of which change the resource.
  // Rules (deterministic, regex-only, exactly replayable in the DuckDB
  // oracle): lowercase scheme and host; strip :80 under http and :443
  // under https (other ports kept); drop utm_*/fbclid/gclid/ref query
  // params; sort surviving params lexicographically; drop the fragment;
  // leave the path byte-identical (no dot-segment resolution — crawl
  // URLs are already absolute). [[urlDomain]] groups hosts by their
  // last two labels — the registrable-domain heuristic (a production
  // build substitutes the public-suffix list; the grouping shape is
  // identical) — which is what composes with the d06 containment tier
  // at domain level. All row-local codegen'd built-ins: the 100 TB
  // cost is the scan.

  private def urlAuthority(c: Column): Column =
    regexp_extract(c, "^[^:/?#]+://([^/?#]*)", 1)

  def urlScheme(c: Column): Column =
    lower(regexp_extract(c, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  def urlHost(c: Column): Column =
    lower(regexp_extract(urlAuthority(c), "^([^:]*)", 1))

  /** Registrable-domain heuristic: the host's last two labels. */
  def urlDomain(c: Column): Column =
    regexp_extract(urlHost(c), "([^.]+\\.[^.]+)$", 1)

  /** The surviving query string: tracking params dropped, the rest
    * sorted lexicographically as whole `k=v` atoms; "" when nothing
    * survives. */
  private def urlQueryCanon(c: Column): Column = {
    val qs = regexp_extract(c, "\\?([^#]*)", 1)
    array_join(array_sort(filter(split(qs, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid|ref)="))), "&")
  }

  def urlCanonicalize(c: Column): Column = {
    val scheme = urlScheme(c)
    val port = regexp_extract(urlAuthority(c), ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val path = regexp_extract(c, "^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    val qc = urlQueryCanon(c)
    concat(scheme, lit("://"), urlHost(c),
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(qc =!= "", concat(lit("?"), qc)).otherwise(lit("")))
  }

  /** Occurrences of `needle` in `padded` via the replace-count identity —
    * exact integer math, portable to any SQL dialect. */
  private def occurrences(padded: Column, needle: String): Column =
    (length(padded) - length(call_function("replace", padded, lit(needle)))) /
      needle.length

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " a ", " and ", " of "),
    "de" -> Seq(" und ", " der ", " die ", " das "),
    "fr" -> Seq(" le ", " la ", " les ", " et "),
    "es" -> Seq(" el ", " los ", " las ", " que "))

  def stopwordScore(c: Column, lang: String): Column = {
    val padded = concat(lit(" "), c, lit(" "))
    stopwords(lang).map(occurrences(padded, _)).reduce(_ + _)
  }

  /** N-gram-heuristic language ID: stopword-count argmax with a fixed
    * priority order (en > de > fr > es) for ties; no hits → "und". */
  def langId(c: Column): Column = {
    val en = stopwordScore(c, "en")
    val de = stopwordScore(c, "de")
    val fr = stopwordScore(c, "fr")
    val es = stopwordScore(c, "es")
    when(en > 0 && en >= de && en >= fr && en >= es, "en")
      .when(de > 0 && de >= fr && de >= es, "de")
      .when(fr > 0 && fr >= es, "fr")
      .when(es > 0, "es")
      .otherwise("und")
  }

  /** Shannon entropy (bits/char) of the text's character distribution —
    * the cheap perplexity proxy corpus pipelines use to flag gibberish
    * (low entropy: repeated chars/padding; high: random noise) without a
    * model in the loop. Delegates to the native single-pass
    * [[graft.functions.CharEntropy]] kernel; [[charEntropyHof]] keeps the
    * original higher-order-function formulation as the equivalence
    * oracle for its spec. */
  def charEntropy(c: Column): Column = Hashing.charEntropy(c)

  /** The pre-round-7 built-in-functions formulation of [[charEntropy]]:
    * O(distinct·len) per row (a boxed lambda per (distinct, char) pair),
    * measured ~60× slower than the native kernel at sf0.1. Retained ONLY
    * as the independent oracle that pins the native expression's
    * bit-exact numeric contract in CharEntropySpec. */
  private[graft] def charEntropyHof(c: Column): Column = {
    val chars = filter(split(c, ""), ch => ch =!= "")
    val n = size(chars).cast("double")
    val terms = transform(array_distinct(chars), ch => {
      val p = size(filter(chars, x => x === ch)).cast("double") / n
      -p * log2(p)
    })
    when(size(chars) === 0, 0.0)
      .otherwise(aggregate(terms, lit(0.0), (acc, t) => acc + t))
  }

  def alphaRatio(c: Column): Column =
    // 0/0 would be NULL, not a ratio — empty text scores 0.
    when(length(c) === 0, 0.0)
      .otherwise(length(regexp_replace(c, "[^a-zA-Z]", "")) / length(c))

  /** Composite quality score in [0,1]: alpha ratio + length saturation +
    * stopword density, fixed weights. Formula is left-associative so the
    * oracle's double arithmetic matches bit-for-bit. Empty/whitespace
    * text scores 0 on every term — an unguarded x/0 would make the whole
    * score NULL, silently dropping empty docs from BOTH sides of any
    * quality-threshold filter. */
  def qualityScore(c: Column): Column = {
    val toks = tokenCount(c)
    lit(0.5) * alphaRatio(c) +
      lit(0.3) * least(lit(1.0), toks / lit(100.0)) +
      lit(0.2) * when(toks === 0, 0.0).otherwise(
        least(lit(1.0), stopwordScore(c, "en") * lit(10.0) / toks))
  }

  /** Whitespace-normalized content fingerprint (exact-dedup key). */
  def fingerprint(c: Column): Column =
    md5(lower(trim(regexp_replace(c, "\\s+", " "))))

  /** PII patterns for corpus scrubbing, restricted to syntax Java regex
    * and RE2 share so a DuckDB oracle can mirror them verbatim. */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe: String = "https?://[^ ]+"
  val PhoneRe: String = "\\b\\d{3}[- ]\\d{3,4}[- ]\\d{4}\\b"

  /** Redact URLs, then emails, then phone numbers (URL first — emails
    * and digit runs inside a URL belong to the URL). Composed from
    * Spark's codegen'd regexp_replace: one projection pass over the
    * corpus, no UDF. */
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      UrlRe, "<URL>"), EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  /** BPE-style pre-tokenizer pattern (the GPT-2 family shape:
    * contractions | space-prefixed letter runs | digit runs | punctuation
    * runs), restricted to constructs shared by Java regex and RE2 (no
    * lookahead) so the DuckDB oracle matches on the ASCII corpus. Trailing
    * pure-whitespace runs are not counted — the space belongs to the
    * following token, as in byte-level BPE. */
  val BpePattern: String =
    "'(s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+"

  /** BPE-ish token count: matches of [[BpePattern]]. Approximates the
    * LLM-tokenizer budget far better than whitespace counting (which
    * undercounts punctuation-heavy and number-heavy text). */
  def bpeTokenCount(c: Column): Column = regexp_count(c, lit(BpePattern))
}
