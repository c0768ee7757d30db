package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Composed corpus-curation pipeline — the operators a 100 TB
  * training-data run chains in one pass over the scan:
  *
  *   quality gate (length + punctuation) → language filter →
  *   exact dedup (keep the lowest id per content hash)
  *
  * Everything before the dedup is a single codegen'd projection/filter
  * over the document scan; the dedup is ONE shuffle on the 8-byte
  * content hash. Stage order matters at scale: the cheap gates run
  * first so the shuffle only moves survivors.
  */
object Curation {

  final case class Config(minTokens: Int = 8,
                          maxPunctRatio: Double = 0.3,
                          keepLangs: Set[String] = Set("en"))

  /** The per-document keep/drop predicate (pre-dedup stages). */
  def qualityGate(text: Column, cfg: Config): Column = {
    val langOk =
      if (cfg.keepLangs.isEmpty) lit(true)
      else TextAnalysis.langId(text).isin(cfg.keepLangs.toSeq.sorted.map(lit(_)): _*)
    (TextAnalysis.tokenCount(text) >= cfg.minTokens) &&
      (TextAnalysis.punctRatio(text) <= cfg.maxPunctRatio) && langOk
  }

  /** STREAMING curation: the same quality gates (pure Column filters —
    * stateless, streaming-safe) composed with watermarked streaming
    * dedup — continuous ingestion of a document stream into a curated
    * corpus. The gates run before the stateful dedup so state only
    * holds survivors; dedup state is bounded by the watermark horizon
    * (graft.streaming.StreamingOps.dedupExactStream semantics: first
    * occurrence passes, duplicates within the horizon drop). */
  def curateStream(docs: DataFrame, textCol: Column, cfg: Config,
                   tsCol: String, watermarkDelay: String): DataFrame =
    graft.streaming.StreamingOps.dedupExactStream(
      docs.filter(qualityGate(textCol, cfg)), textCol, tsCol, watermarkDelay)

  /** Curate: gates, then keep the lowest-id doc per distinct content.
    * The dedup is ONE window over the content hash (rank-1 per hash) —
    * a single shuffle and a single evaluation of the gated scan, where
    * a groupBy+semi-join would evaluate it twice. Returns the
    * surviving (id, text) rows plus the content hash for audit. */
  def curate(docs: DataFrame, idCol: Column, textCol: Column, cfg: Config = Config()): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("content_hash")).orderBy(col("doc_id"))
    docs.filter(qualityGate(textCol, cfg))
      .select(idCol.as("doc_id"), textCol.as("text"),
              Portable.hash64(textCol).as("content_hash"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("text"), col("content_hash"))
  }
}
