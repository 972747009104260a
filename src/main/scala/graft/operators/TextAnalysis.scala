package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (north-star
  * extension beyond the reference — BASELINE.json `north_star`): token
  * counting, quality scoring, language ID, fingerprinting.
  *
  * All pure Column expressions over built-in functions — whole-stage
  * codegen keeps these in one fused pipeline stage, no UDFs, no shuffles;
  * at 100 TB each is a single map over the scan.
  */
object TextAnalysis {

  /** Token count: word-or-punctuation tokens (BPE-ish pre-tokenizer split,
    * the `\w+|[^\w\s]` rule). */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0))).cast("bigint")

  /** Whitespace token count (the cheap estimator). */
  def wsTokenCount(text: Column): Column =
    size(split(trim(text), "\\s+")).cast("bigint")

  /** Punctuation character ratio — quality-scoring feature. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.!?,;:]", "")).cast("double") /
      nullif(length(text).cast("double"), lit(0.0))

  /** Stopword ratio over whitespace tokens (English closed-class list). */
  val stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "that", "for", "on", "as", "with")

  def stopwordRatio(text: Column): Column = {
    val words = split(lower(text), "\\s+")
    size(filter(words, w => w.isin(stopwords: _*))).cast("double") /
      nullif(size(words).cast("double"), lit(0.0))
  }

  /** Composite quality score in [0,1]: length sweet-spot + moderate
    * punctuation + nonzero-but-bounded stopword density. */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val lenScore = when(len < 50, len / 50.0)
      .when(len > 10000, lit(10000.0) / len)
      .otherwise(lit(1.0))
    val punct = coalesce(punctRatio(text), lit(0.0))
    val punctScore = when(punct > 0.2, lit(0.0)).otherwise(lit(1.0) - punct * 2.5)
    val stop = coalesce(stopwordRatio(text), lit(0.0))
    val stopScore = when(stop > 0.6, lit(0.5)).otherwise(lit(1.0))
    (lenScore * 0.4 + punctScore * 0.3 + stopScore * 0.3)
  }

  /** Language-ID by closed-class marker-word voting (n-gram heuristic):
    * count hits of per-language marker words, argmax wins, 'und' when no
    * marker hits. Deterministic integer math — oracle-friendly. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "und", "das", "ist"),
    "es" -> Seq("el", "los", "que", "es"),
    "fr" -> Seq("le", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在"))

  def langScore(text: Column, lang: String): Column = {
    val words = split(lower(text), "\\s+")
    size(filter(words, w => w.isin(langMarkers(lang): _*))).cast("bigint")
  }

  def langId(text: Column): Column = {
    val langs = langMarkers.keys.toSeq.sorted
    val scores = langs.map(l => langScore(text, l))
    val best = greatest(scores: _*)
    // first lang (alphabetical) reaching the max — deterministic tie-break
    val folded = langs.zip(scores).foldRight(lit("und")) {
      case ((l, s), acc) => when(s === best && best > 0, lit(l)).otherwise(acc)
    }
    folded
  }

  /** Content fingerprint: stable 128-bit hex digest of normalized text
    * (whitespace-collapsed, lowercased) — the exact-dedup key. md5 keeps it
    * engine-portable (DuckDB emits identical hex). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 64-bit rolling-ish fingerprint for Spark-only hot paths (xxhash64 is
    * codegen'd and ~10× md5). */
  def fastFingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** PII patterns for training-corpus redaction (the Dolma/CCNet-style
    * pre-training scrub): emails, North-American phone shapes, IPv4.
    * Pure Java-regex expressions — codegen'd regexp_replace, no UDF, so
    * the scrub runs at scan throughput and pushes through whole-stage
    * codegen at 100 TB. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** Replace each PII class with its placeholder token. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Per-class PII hit counts (the audit metric a scrub job reports). */
  def piiCounts(text: Column): Column = struct(
    size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long").as("n_email"),
    size(regexp_extract_all(text, lit(PhoneRe), lit(0))).cast("long").as("n_phone"),
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0))).cast("long").as("n_ip"))

  /** Annotate a documents DataFrame with the full feature set. */
  def annotate(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("tokens", tokenCount(t))
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("stopword_ratio", stopwordRatio(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
