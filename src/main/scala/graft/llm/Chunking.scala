package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Content-defined chunking (CDC) — the storage-dedup treatment for
  * corpora: split every document at positions where the hash of a
  * fixed-width content window satisfies a modulus condition, so chunk
  * boundaries depend only on LOCAL content. A passage shared by two
  * documents at DIFFERENT offsets chunks identically in both (after
  * the first in-passage boundary), which is what fixed-size blocking
  * fundamentally cannot do — the insertion of one byte shifts every
  * fixed block but only the one containing it here. This is the
  * Manber/LBFS/rsync family (Muthitacharoen et al., SOSP 2001); the
  * production dials FastCDC adds (min/max chunk clamps, gear table,
  * normalized chunking) tune the SAME boundary seam and are noted per
  * parameter below.
  *
  * Reference scope: the reference engine ships no corpus analytics —
  * this is the training-data/storage curation surface layered on top,
  * composing with the dedup family (exact dedup finds identical DOCS;
  * chunk dedup measures identical BYTES across non-identical docs —
  * the dedup-able storage and repeated-passage training signal).
  *
  * Scale shape (100 TB): boundaries AND chunk hashes compute in ONE
  * scalar pass per document over the text column where it already
  * sits (round 20: a JVM byte scan — the earlier higher-order-function
  * array ops evaluated interpreted per position), so no join, no
  * explode of text, and the only rows that ever cross an exchange are
  * (source, 8-byte chunk hash, int length). Work is O(chars) hashes
  * per document, the same md5-pass floor as the gram-dedup family
  * (llm16/119/124/128).
  */
object Chunking {

  /** Per-source chunk dedup stats.
    *
    * @param win     content-window width in chars (the boundary seam —
    *                wider windows resist boundary collisions on short
    *                repeated tokens)
    * @param modulus boundary condition `hash % modulus == 0`: expected
    *                chunk length. (FastCDC's min/max clamps would bound
    *                the tails; omitted here — the fixture corpus has no
    *                adversarial runs, and the clamp breaks the pure
    *                content-locality the oracle replays.)
    *
    * Output, one row per source:
    *   n_chunks, total_chars      — corpus volume in chunks/chars
    *   n_distinct_chunks,
    *   distinct_chars             — within-source distinct chunk volume
    *   dup_chunks, dup_chars      — chunk occurrences whose content
    *                                appears in MORE THAN ONE document
    *                                corpus-wide (cross-doc shared bytes:
    *                                the dedup-able volume)
    *   dup_pct                    — 100·dup_chars DIV total_chars
    */
  def chunkDedupStats(docs: DataFrame, idCol: Column, textCol: Column,
                      sourceCol: Column, win: Int = 8, modulus: Int = 47): DataFrame = {
    val chunks = chunkHashes(docs, idCol, textCol, sourceCol, win, modulus)
    // h-grain: does this content appear in more than one document?
    val byHash = chunks.groupBy(col("h"))
      .agg((min(col("doc_id")) =!= max(col("doc_id"))).as("crossdoc"))
    // (source, h)-grain: occurrence count + length, then source-grain.
    chunks.groupBy(sourceCol.as("source"), col("h"))
      .agg(count(lit(1)).as("cnt"), max(col("len")).as("len"))
      .join(byHash, "h")
      .groupBy(col("source"))
      .agg(
        sum(col("cnt")).as("n_chunks"),
        sum(col("cnt") * col("len")).as("total_chars"),
        count(lit(1)).as("n_distinct_chunks"),
        sum(col("len")).as("distinct_chars"),
        sum(when(col("crossdoc"), col("cnt")).otherwise(lit(0L))).as("dup_chunks"),
        sum(when(col("crossdoc"), col("cnt") * col("len")).otherwise(lit(0L))).as("dup_chars"))
      .withColumn("dup_pct", expr("dup_chars * 100 DIV total_chars"))
  }

  /** One row per chunk occurrence: (doc_id, source, h, len). The whole
    * computation is a single projection over the scan — cut positions
    * via a filtered position sequence (boundary where the win-char
    * window hash ≡ 0 mod modulus, cutting AFTER the window), chunk
    * hashes via a transform over adjacent bound pairs — followed by
    * one explode of the per-doc chunk array (8-byte hash + int, text
    * already dropped). */
  def chunkHashes(docs: DataFrame, idCol: Column, textCol: Column,
                  sourceCol: Column, win: Int, modulus: Int): DataFrame = {
    // Round-20: one scalar call per document (same treatment as
    // GramIndex.gramArray) — the boundary filter and per-chunk hash
    // lambdas evaluated INTERPRETED, paying per-position boxed
    // Substring/expression-tree overhead on top of the md5 floor.
    // Column-form equality is pinned in ChunkingSpec
    // (chunkHashesComposed).
    val f = udf((s: String) =>
      if (s == null) Array.empty[(Long, Long)] else chunkHashesJvm(s, win, modulus))
    docs.select(idCol.as("doc_id"), sourceCol.as("source"), textCol.as("__t"))
      .where(col("__t").isNotNull && length(col("__t")) >= 1)
      .select(col("doc_id"), col("source"), explode(f(col("__t"))).as("c"))
      .select(col("doc_id"), col("source"),
        col("c._1").as("h"), col("c._2").as("len"))
  }

  /** JVM scan behind [[chunkHashes]]: code-point start offsets in one
    * pass, then one md5 per boundary window and one per chunk — no
    * per-element interpreter machinery. Semantics identical to the
    * composed form below: cut AFTER a window whose hash ≡ 0 mod
    * `modulus`; the doc end is always a cut; chunk len counts CODE
    * POINTS (Spark substr/length semantics). */
  private[llm] def chunkHashesJvm(s: String, win: Int,
                                  modulus: Int): Array[(Long, Long)] = {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.Md5Prefix64
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val starts = new Array[Int](bytes.length + 1)
    var n = 0
    var b = 0
    while (b < bytes.length) {
      starts(n) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      n += 1
    }
    starts(n) = bytes.length
    if (n == 0) return Array.empty
    val bounds = scala.collection.mutable.ArrayBuffer(0)
    var p = 1
    while (p <= n - win + 1) { // no iterations when n < win
      val h = Md5Prefix64.hash(bytes, starts(p - 1), starts(p - 1 + win) - starts(p - 1))
      if (h % modulus == 0) bounds += p + (win - 1) // cut after the window
      p += 1
    }
    if (bounds.last != n) bounds += n // doc end always cuts (dedup'd)
    val out = new Array[(Long, Long)](bounds.length - 1)
    var j = 0
    while (j < out.length) {
      val b0 = bounds(j)
      val b1 = bounds(j + 1)
      out(j) = (Md5Prefix64.hash(bytes, starts(b0), starts(b1) - starts(b0)),
        (b1 - b0).toLong)
      j += 1
    }
    out
  }

  /** The pre-round-20 column-algebra form of [[chunkHashes]] — kept as
    * the CONTRACT for the equality pin (the rendering the DuckDB
    * oracle mirrors). */
  private[llm] def chunkHashesComposed(docs: DataFrame, idCol: Column, textCol: Column,
                                       sourceCol: Column, win: Int, modulus: Int): DataFrame = {
    val base = docs.select(idCol.as("doc_id"), sourceCol.as("source"),
        textCol.as("__t"))
      .where(col("__t").isNotNull && length(col("__t")) >= 1)
      .withColumn("__len", length(col("__t")))
    // cut positions: p in [1, len-win+1] with hash(window at p) % modulus == 0
    // cut AFTER the window end (c = p + win - 1); the doc end is always a cut.
    val cuts = when(col("__len") >= win,
        transform(
          filter(sequence(lit(1), col("__len") - (win - 1)),
            p => Portable.hash64(col("__t").substr(p, lit(win))) % modulus === 0),
          p => p + (win - 1)))
      .otherwise(array().cast("array<int>"))
    // ascending bounds [0, c1, …, len] (filter preserves sequence order;
    // array_distinct drops the duplicate when the last window cut == len)
    val withBounds = base
      .withColumn("__b", array_distinct(concat(array(lit(0)), cuts,
        array(col("__len")))))
    withBounds
      .select(col("doc_id"), col("source"),
        explode(transform(sequence(lit(1), size(col("__b")) - 1),
          j => struct(
            Portable.hash64(col("__t").substr(
              element_at(col("__b"), j) + 1,
              element_at(col("__b"), j + 1) - element_at(col("__b"), j))).as("h"),
            (element_at(col("__b"), j + 1) - element_at(col("__b"), j))
              .cast("long").as("len")))).as("c"))
      .select(col("doc_id"), col("source"), col("c.h"), col("c.len"))
  }

  /** PER-DOCUMENT internal redundancy — the template-spam flag at
    * CHUNK grain: characters attributable to a chunk's repeat
    * occurrences WITHIN one document ((cnt−1)·len summed over its
    * chunk classes). Token-level repetition (llm19) and periodic
    * loops (llm137) cannot see a long paragraph pasted twice — the
    * content-defined chunking does, and offset-invariantly (the
    * second copy chunks identically wherever it lands). Per-source
    * rollup flags docs at `minDupPct`.
    *
    * Scale shape: [[chunkHashes]]' one-projection pass, then two hash
    * aggregates at (doc, hash) and (source) grain — (8-byte hash +
    * ints) rows only.
    *
    * @return (source, n_docs, flagged, max_intdup_pct) */
  def docRedundancy(docs: DataFrame, idCol: Column, textCol: Column,
                    sourceCol: Column, win: Int = 8, modulus: Int = 47,
                    minDupPct: Int = 15): DataFrame = {
    val perDoc = chunkHashes(docs, idCol, textCol, sourceCol, win, modulus)
      .groupBy(col("doc_id"), col("source"), col("h"))
      .agg(count(lit(1)).as("__cnt"), max(col("len")).as("__len"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("__cnt") * col("__len")).as("__total"),
        sum((col("__cnt") - 1) * col("__len")).as("__intdup"))
      .withColumn("__pct", expr("__intdup * 100 DIV __total"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__pct") >= minDupPct, 1L).otherwise(0L)).as("flagged"),
        max(col("__pct")).as("max_intdup_pct"))
  }
}
