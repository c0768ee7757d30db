package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Text-analysis operators for corpus curation: token stats, quality
  * scoring, language id, content fingerprinting. All pure Column
  * algebra — they run inside WholeStageCodegen over the document scan,
  * which is what makes them viable as a single pass over 100 TB.
  *
  * Ratio outputs are double divisions of exact integer counts: a single
  * IEEE op, bit-reproducible across engines (unlike summed doubles).
  */
object TextAnalysis {

  def tokens(text: Column): Column = Dedup.tokens(text)

  def tokenCount(text: Column): Column = size(tokens(text))

  def charCount(text: Column): Column = length(text)

  /** Mean token length. */
  def meanTokenLen(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  /** Non-alphanumeric (punctuation/symbol) density per character. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Stopword ratio against a small built-in English list — the
    * length/punct/stopword trio is the classic C4-style quality gate. */
  val stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "on")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    size(filter(toks, t => t.isin(stopwords.map(lit(_)): _*))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Composite quality heuristic in [0,1]: reward length up to 64
    * tokens, penalize punctuation-heavy text. */
  def qualityScore(text: Column): Column =
    (least(tokenCount(text), lit(64)).cast("double") / lit(64.0)) *
      (lit(1.0) - punctRatio(text))

  /** Deterministic marker-token language id: score each language by
    * marker hits, pick the argmax (ties by language code). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die"),
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "y", "los"),
    "fr" -> Seq("le", "et", "les"))

  def langScore(text: Column, markers: Seq[String]): Column = {
    val toks = tokens(lower(text))
    size(filter(toks, t => t.isin(markers.map(lit(_)): _*)))
  }

  def langId(text: Column): Column = {
    // argmax over (score, -lang) via a sorted struct array
    val scored = langMarkers.map { case (lang, m) =>
      struct(langScore(text, m).as("score"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored.reverse: _*)) // max by (score, then lang desc→ reverse keeps first asc)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("unknown"))
  }

  /** Document fingerprint: min token hash (winnowing-lite, k=1) — an
    * 8-byte content sketch; see Dedup.minhashSignature for the k-wide
    * generalization. */
  def fingerprintMin(text: Column): Column =
    array_min(transform(tokens(text), t => Portable.hash64(t)))
}
