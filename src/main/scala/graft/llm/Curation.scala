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

  /** Curate: gates, then keep the lowest-id doc per distinct content.
    * Returns the surviving (id, text) rows plus the curation columns
    * used, for auditability. */
  def curate(docs: DataFrame, idCol: Column, textCol: Column, cfg: Config = Config()): DataFrame = {
    val gated = docs.filter(qualityGate(textCol, cfg))
      .select(idCol.as("doc_id"), textCol.as("text"),
              Portable.hash64(textCol).as("content_hash"))
    val keep = gated.groupBy(col("content_hash")).agg(min(col("doc_id")).as("doc_id"))
    gated.join(keep, Seq("content_hash", "doc_id"), "left_semi")
      .select(col("doc_id"), col("text"), col("content_hash"))
  }
}
