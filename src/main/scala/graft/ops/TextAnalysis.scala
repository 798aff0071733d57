package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data pipelines: language ID, quality
 * scoring, token counting, document fingerprinting. All composed from
 * codegen'd built-ins (no UDFs) so they run inside whole-stage codegen and
 * push down column pruning to the scan.
 */
object TextAnalysis {

  // tiny per-language stopword lists (public knowledge)
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "it", "that", "for", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "en", "que", "por", "con"))

  private def tokens(text: Column): Column = split(lower(text), " +")

  /** distinct-stopword hit count for one language. */
  def stopwordHits(text: Column, lang: String): Column =
    size(array_intersect(tokens(text), array(Stopwords(lang).map(lit): _*)))

  /**
   * Heuristic language ID: CJK characters → zh; otherwise the language with
   * the most distinct stopword hits (ties broken by fixed language order,
   * zero hits → 'und').
   */
  def langId(text: Column): Column = {
    val ordered = Seq("en", "de", "fr", "es")
    val best = ordered.map(l => struct(stopwordHits(text, l).as("hits"), lit(l).as("lang")))
    // greatest(struct) picks max hits, then max lang name — invert lang order
    // for deterministic first-wins ties via reduce
    val winner = ordered.foldLeft((lit(0).as("h"), lit("und"))) { case ((bh, bl), l) =>
      val h = stopwordHits(text, l)
      (when(h > bh, h).otherwise(bh), when(h > bh, lit(l)).otherwise(bl))
    }
    when(text.rlike("[\\x{4e00}-\\x{9fff}]"), lit("zh")).otherwise(winner._2)
  }

  /**
   * Quality score ∈ [0,1]: blend of length band, punctuation ratio, alpha
   * ratio and mean word length — the usual cheap pretraining-filter features.
   */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val nTok = size(tokens(text)).cast("double")
    val punct = (length(text) - length(regexp_replace(text, "[.,;:!?]", ""))).cast("double")
    val alpha = length(regexp_replace(text, "[^a-zA-Z ]", "")).cast("double")
    val meanWord = (len - nTok + lit(1.0)) / greatest(nTok, lit(1.0))
    val lenScore = least(len / lit(500.0), lit(1.0))
    val punctScore = lit(1.0) - least(punct / greatest(nTok, lit(1.0)), lit(1.0))
    val alphaScore = alpha / greatest(len, lit(1.0))
    val wordScore = when(meanWord.between(3.0, 10.0), lit(1.0)).otherwise(lit(0.5))
    round(lit(0.3) * lenScore + lit(0.2) * punctScore +
      lit(0.3) * alphaScore + lit(0.2) * wordScore, 6)
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /**
   * BPE-ish subword count: splits on whitespace AND letter/digit/punct
   * boundaries, the cheap proxy for tokenizer token counts.
   */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "[^a-zA-Z0-9]+|(?<=[a-z])(?=[A-Z])"), t => t =!= ""))

  /**
   * Document fingerprint: md5 of the casefolded, punctuation-stripped,
   * whitespace-collapsed text — the canonical content identity used by
   * exact dedup across differently-formatted copies.
   */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "),
      " +", " ")).cast("binary"))
}
