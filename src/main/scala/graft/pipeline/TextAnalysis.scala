package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for training-data pipelines: token statistics,
  * quality scoring, language identification, fingerprinting. All pure Column
  * expressions (codegen'd, pushdown-friendly); every ratio is a quotient of
  * two integers so results are bit-deterministic across engines.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(text, "\\s+")
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: maximal runs of letters / digits / other
    * non-space (a cheap proxy for byte-pair tokenizers: "x12ab" → x, 12, ab).
    * Formulated as run extraction rather than lookaround splitting — same
    * count, but the pattern is RE2-compatible, so a SQL oracle can mirror it
    * exactly. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]+"), lit(0)))

  /** Quality features: token count, distinct-token ratio (repetition signal),
    * mean token length, stopword ratio, punctuation ratio. */
  val EnStopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def qualityFeatures(text: Column): Column = {
    val t = tokens(text)
    val nTok = size(t)
    val nDistinct = size(array_distinct(t))
    val nStop = size(filter(t, w => w.isin(EnStopwords.map(lit): _*)))
    val nPunct = length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))
    struct(
      nTok.cast(LongType).as("n_tokens"),
      nDistinct.cast(LongType).as("n_distinct"),
      (nDistinct.cast(DoubleType) / nTok.cast(DoubleType)).as("distinct_ratio"),
      ((length(text) - nTok + 1).cast(DoubleType) / nTok.cast(DoubleType)).as("mean_token_len"),
      (nStop.cast(DoubleType) / nTok.cast(DoubleType)).as("stopword_ratio"),
      (nPunct.cast(DoubleType) / length(text).cast(DoubleType)).as("punct_ratio"))
  }

  /** Composite quality score in [0,1]: penalize extreme repetition, reward
    * stopword presence (fluency proxy), penalize punctuation soup. Weights are
    * documented constants, not learned. */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text)
    val rep = least(f.getField("distinct_ratio") * 2.0, lit(1.0))
    val stop = least(f.getField("stopword_ratio") * 5.0, lit(1.0))
    val punct = greatest(lit(1.0) - f.getField("punct_ratio") * 4.0, lit(0.0))
    (rep * 0.4 + stop * 0.3 + punct * 0.3)
  }

  /** Stopword-profile language ID (n-gram-free heuristic): count hits against
    * per-language function-word profiles, pick the max with a fixed
    * tie-break order; 'und' (undetermined) when no profile hits. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est"),
    "es" -> Seq("el", "los", "las", "una", "es", "en", "que", "y"))

  def langId(text: Column): Column = {
    val t = transform(tokens(text), w => lower(w))
    val counts = LangProfiles.map { case (lang, words) =>
      lang -> size(filter(t, w => w.isin(words.map(lit): _*)))
    }
    // fixed priority: first profile in list wins ties (>= against later ones)
    val scored = counts.zipWithIndex.map { case ((lang, c), i) =>
      val beatsAll = counts.zipWithIndex.collect {
        case ((_, c2), j) if j < i => c > c2   // strictly beat earlier profiles
        case ((_, c2), j) if j > i => c >= c2  // ties go to earlier profiles
      }.foldLeft(c > 0)(_ && _)
      (lang, beatsAll)
    }
    scored.foldRight(lit("und")) { case ((lang, cond), acc) => when(cond, lang).otherwise(acc) }
  }

  /** Stable whole-document fingerprint: MD5 of whitespace-normalized,
    * lowercased text — engine-portable exact-dup key. */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Rolling polynomial fingerprint (Rabin-Karp style) over tokens, modular
    * arithmetic (31, 2^31-1 prime) so overflow semantics never differ across
    * engines: fp = Σ fold((acc*31 + tokHash) mod p). Content-defined and
    * locality-sensitive to prefixes — used for shift-tolerant chunk identity. */
  def rollingFingerprint(text: Column, p: Long = 2147483647L): Column =
    aggregate(tokens(text), lit(7L),
      (acc, w) => pmod(acc * 31 + pmod(xxhash64(w), lit(p)), lit(p)))

  /** PII scrubbing for training corpora: URLs, emails, then phone-like digit
    * runs replaced with typed placeholder tokens. Deliberately RE2-compatible
    * patterns (no lookarounds/backrefs) so any engine — and the SQL oracle —
    * applies the identical pipeline. Order matters: URLs first (may contain
    * '@'), then emails, then phones. */
  val UrlPattern = "https?://[^\\s]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlPattern, "<URL>"),
        EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")
}
