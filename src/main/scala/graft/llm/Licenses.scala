package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** License detection for code/corpus curation — the stage The Stack /
  * permissively-licensed-corpus builds run before anything else: tag
  * every document with the license whose boilerplate it carries, so
  * downstream filters can keep permissive sources and drop or
  * attribute the rest.
  *
  * Detection is fingerprint CONTAINMENT against a reference set of
  * license texts: each license is reduced to its winnowing
  * fingerprints ([[Winnowing]], MOSS-style) and a document is tagged
  * with license L when its text reproduces >= minPct percent of L's
  * fingerprint set. Containment (not resemblance) is the right
  * directional measure — a license is a short passage inside a long
  * document, so Jaccard over the whole doc would drown it — and
  * fingerprint granularity makes the match robust to the local edits
  * license headers accumulate (year, holder name): unmatched grams
  * only lower containment proportionally.
  *
  * Only the REFERENCE side is winnowed (selection defines which grams
  * represent the license); the PROBE side matches raw gram hashes —
  * winnowing the corpus too would pay the w-fold window expansion per
  * document for nothing, since a ref fingerprint contained in the doc
  * is found by gram-hash equality directly (measured: 8.4 s → raw
  * gram probe at sf0.1; the window stage was half the cost).
  *
  * Reference scope: the reference engine ships no corpus analytics;
  * this composes the llm128 fingerprint machinery into the curation
  * stage next to robots filtering (llm103) and the blocklist gate.
  *
  * Scale shape (100 TB): document text dies in the gram projection
  * (the winnowing pass — same one-scan shape as llm128); the
  * reference side is a FEW HUNDRED short texts (the full SPDX corpus)
  * whose fingerprint frame is kilobytes, so the candidate join is a
  * BROADCAST hash join on the 8-byte fingerprint hash — the corpus
  * never shuffles for it. What reaches the one aggregation exchange
  * is (doc, license, 1) for TRUE fingerprint hits only — O(docs
  * carrying license text × fingerprints per license). The argmax
  * window partitions by doc over at most |licenses| rows each.
  */
object Licenses {

  /** Tag each document with its best-matching reference license.
    *
    * @param refs   (license_id, license_text) — small, broadcast
    * @param minPct minimum integer containment percent to report
    * @return one row per detected doc:
    *   (doc_id, license, n_shared, ref_fp, containment_pct) */
  def detect(docs: DataFrame, idCol: Column, textCol: Column,
             refs: Seq[(String, String)], k: Int = 16, w: Int = 8,
             minPct: Int = 25, probeGrams: Option[DataFrame] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val refDf = refs.toDF("license", "ltext")
    val refFp = Winnowing.fingerprints(refDf, col("license"), col("ltext"), k, w)
      .select(col("doc_id").as("license"), col("h")).distinct()
    val refSz = refFp.groupBy(col("license")).agg(count(lit(1)).as("ref_fp"))
    // raw gram hashes on the probe side — the broadcast join filters
    // at the scan, so only TRUE ref-fingerprint hits survive to the
    // distinct (a hash occurring at several positions counts once).
    // A caller holding a gram index ([[GramIndex]]) passes the
    // (doc_id, h) frame instead and skips the corpus re-hash.
    val docGrams = probeGrams.getOrElse(docs
      .select(idCol.as("doc_id"), textCol.as("__t"))
      .where(col("__t").isNotNull && length(col("__t")) >= k)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("__t")) - (k - 1))).as("__p"),
        col("__t"))
      .select(col("doc_id"),
        graft.functions.Portable.hash64(col("__t").substr(col("__p"), lit(k))).as("h")))
    val scored = docGrams.join(broadcast(refFp), "h")
      .select(col("doc_id"), col("license"), col("h")).distinct()
      .groupBy(col("doc_id"), col("license")).agg(count(lit(1)).as("n_shared"))
      .join(broadcast(refSz), "license")
      .withColumn("containment_pct", expr("n_shared * 100 DIV ref_fp"))
      .filter(col("containment_pct") >= minPct)
    val best = Window.partitionBy(col("doc_id"))
      .orderBy(col("containment_pct").desc, col("license").asc)
    scored.withColumn("__rk", row_number().over(best))
      .filter(col("__rk") === 1)
      .select(col("doc_id"), col("license"), col("n_shared"),
        col("ref_fp"), col("containment_pct"))
  }
}
