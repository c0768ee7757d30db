package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** One-pass per-source corpus health report — the first query a data
  * engineer runs on a new crawl dump before any curation: volume,
  * length, language mix, exact-duplicate rate, and mean quality, per
  * source, from a SINGLE scan + one grouped aggregation.
  *
  * Scale shape: every per-document signal (token count, language flag,
  * quantized quality, 8-byte content hash) computes in one codegen'd
  * projection over the scan; the groupBy carries fixed-width values
  * only (the text never shuffles). `count_distinct` over the content
  * hash is the standard two-phase distinct expansion — the only extra
  * shuffle, still keyed on (source, 8-byte hash). Quality quantizes to
  * 1e-6 BEFORE the sum so the mean is an exact long sum
  * (shuffle-order independent, engine-portable — the repo's standard
  * float discipline).
  */
object CorpusReport {

  /** Per-source summary: (source, n_docs, n_tokens, avg_doc_tokens,
    * n_lang, dup_rate, avg_quality), where `n_lang` counts documents
    * whose `langCol` equals `lang` and `dup_rate` is the fraction of
    * documents whose exact content already occurred (1 − distinct/n). */
  def bySource(df: DataFrame, textCol: Column, sourceCol: Column,
               langCol: Column, lang: String = "en"): DataFrame = {
    val base = df.select(sourceCol.as("source"),
      TextAnalysis.tokenCount(textCol).cast("long").as("__nt"),
      (langCol === lang).as("__lang"),
      floor(TextAnalysis.qualityScore(textCol) * lit(1e6)).cast("long").as("__q6"),
      Portable.hash64(textCol).as("__h"))
    base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("__nt")).as("n_tokens"),
           sum(when(col("__lang"), 1L).otherwise(0L)).as("n_lang"),
           count_distinct(col("__h")).as("__nd"),
           sum(col("__q6")).as("__sq6"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("n_docs")).as("avg_doc_tokens"),
        col("n_lang"),
        ((col("n_docs") - col("__nd")).cast("double") / col("n_docs")).as("dup_rate"),
        (col("__sq6").cast("double") / col("n_docs") / lit(1e6)).as("avg_quality"))
  }

  /** Whole-corpus DATASET CARD — the one-row datasheet corpus papers
    * publish: volume, token count, source/language breadth, exact-dup
    * rate, mean quality, and the p50/p90 quality BINS (32-bin
    * histogram, the llm32 deterministic-quantile discipline) — all
    * from ONE scan + ONE global aggregation.
    *
    * Scale shape: every per-document signal computes in one codegen'd
    * projection; the single-group aggregate carries fixed-width
    * values plus 32 conditional bin counters, map-side combined. The
    * quantile read-off is a driver-free `aggregate` FOLD over the
    * 32-element bin array in the result projection — no second
    * histogram shuffle, no window, no collect. The three
    * count_distincts (source, lang, content hash) are Spark's
    * standard multi-distinct Expand — the only corpus-grain shuffle,
    * fixed-width keyed.
    *
    * All counts are exact integers; quality quantizes to 1e-6 before
    * summation, so any engine replays the card bit-for-bit.
    */
  def datasetCard(df: DataFrame, textCol: Column, sourceCol: Column,
                  langCol: Column): DataFrame = {
    val q6 = floor(TextAnalysis.qualityScore(textCol) * lit(1e6)).cast("long")
    val base = df.select(
      TextAnalysis.tokenCount(textCol).cast("long").as("__nt"),
      q6.as("__q6"),
      sourceCol.as("__src"), langCol.as("__lang"),
      Portable.hash64(textCol).as("__h"))
      // integer binning: q6 ∈ [0, 1e6] → 32 bins, top edge clamped
      .withColumn("__bin", least(expr("__q6 * 32 DIV 1000000"), lit(31)))
    val binAggs = (0 until 32).map(i =>
      sum(when(col("__bin") === i, 1L).otherwise(0L)).as(s"__b$i"))
    val agg = base.agg(
      count(lit(1)).as("n_docs"),
      (Seq(sum(col("__nt")).as("n_tokens"),
        count_distinct(col("__src")).as("n_sources"),
        count_distinct(col("__lang")).as("n_langs"),
        count_distinct(col("__h")).as("n_unique"),
        sum(col("__q6")).as("__sq6")) ++ binAggs): _*)
    val bins = array((0 until 32).map(i => col(s"__b$i")): _*)
    // fold: first bin index where the cumulative count reaches the
    // rank target — struct acc (cum, found bin, index)
    def quantileBin(q: Double): Column = {
      val target = ceil(col("n_docs").cast("double") * lit(q)).cast("long")
      aggregate(bins,
        struct(lit(0L).as("cum"), lit(-1).as("bin"), lit(0).as("i")),
        (acc, x) => struct(
          (acc.getField("cum") + x).as("cum"),
          when(acc.getField("bin") === -1 && acc.getField("cum") + x >= target,
            acc.getField("i")).otherwise(acc.getField("bin")).as("bin"),
          (acc.getField("i") + 1).as("i")),
        acc => acc.getField("bin"))
    }
    agg.select(col("n_docs"), col("n_tokens"), col("n_sources"), col("n_langs"),
      ((col("n_docs") - col("n_unique")).cast("double") / col("n_docs")).as("dup_rate"),
      (col("n_tokens").cast("double") / col("n_docs")).as("avg_doc_tokens"),
      (col("__sq6").cast("double") / col("n_docs") / lit(1e6)).as("avg_quality"),
      quantileBin(0.5).as("p50_bin"), quantileBin(0.9).as("p90_bin"))
  }

  /** Corpus FREEZE manifest — the reproducibility artifact a training
    * run records before it starts: documents assign to `nShards`
    * deterministic hash shards and each shard summarizes to (n_docs,
    * n_tokens, fingerprint, min_h, max_h), where `fingerprint` is the
    * bit_xor of the shard's content hashes — order-insensitive and
    * overflow-free, so the manifest is bit-identical no matter the
    * partitioning, engine, or cluster size. Re-run it later (or
    * elsewhere) and a single differing row pinpoints which shard's
    * data drifted — without moving the corpus.
    *
    * Scale shape: one codegen'd projection (two hashes + the token
    * count) and ONE grouped aggregate collapsing map-side to
    * nShards·partitions fixed-width rows; text never shuffles. */
  def freezeManifest(docs: DataFrame, idCol: Column, textCol: Column,
                     nTokensCol: Column, nShards: Int = 64,
                     salt: String = "shard"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    docs.select(
        pmod(Portable.hash64(concat(lit(salt + ":"), idCol.cast("string"))),
          lit(nShards.toLong)).as("shard"),
        Portable.hash64(textCol).as("__h"),
        nTokensCol.cast("long").as("__nt"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("__nt")).as("n_tokens"),
           expr("bit_xor(__h)").as("fingerprint"),
           min(col("__h")).as("min_h"),
           max(col("__h")).as("max_h"))
  }

  /** Dataset VERSION diff — what changed between two corpus
    * snapshots, by document identity and content hash: `added`
    * (id only in `cur`), `removed` (only in `prev`), `changed` (both,
    * hashes differ), `unchanged`. [[freezeManifest]] detects THAT a
    * shard drifted; this names every document that did — the release
    * audit between dataset versions. One full-outer join on the id
    * (8-byte hashes ride beside it; text never moves); aggregate the
    * result per status/source for the release note. */
  def manifestDiff(prev: DataFrame, cur: DataFrame,
                   idCol: String, hashCol: String): DataFrame =
    prev.select(col(idCol).as("id"), col(hashCol).as("__ph"))
      .join(cur.select(col(idCol).as("id"), col(hashCol).as("__ch")),
            Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__ph").isNull, "added")
          .when(col("__ch").isNull, "removed")
          .when(col("__ph") === col("__ch"), "unchanged")
          .otherwise("changed").as("status"))
}
