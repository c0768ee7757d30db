package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Winnowing document fingerprints — the MOSS local fingerprinting
  * algorithm (Schleimer, Wilkerson & Aiken, SIGMOD 2003: "Winnowing:
  * Local Algorithms for Document Fingerprinting").
  *
  * Unlike MinHash (a GLOBAL random sample of a document's shingle set,
  * good for whole-document resemblance), winnowing selects, in every
  * window of `w` consecutive k-gram hashes, the RIGHTMOST minimal hash.
  * The selected (position, hash) set is the fingerprint, and it carries
  * the guarantee MinHash lacks: any substring shared between two
  * documents of length >= w + k - 1 contributes AT LEAST ONE shared
  * fingerprint — which makes it the partial-copy / plagiarism /
  * license-text detector (detection is local, not proportional to
  * whole-document similarity). Expected fingerprint density is
  * 2/(w+1), so downstream joins see a ~(w+1)/2-fold smaller index than
  * a full k-gram pass at the same detection floor.
  *
  * Reference scope: the reference engine ships no corpus analytics; this
  * is part of the training-data curation surface layered on top (same
  * family as [[Dedup.longestSharedRun]] / [[Dedup.duplicateSpanScrub]],
  * which COMPOSE with it: winnowing finds the candidate pairs cheaply,
  * the exact-substring machinery verifies and cuts).
  *
  * Scale shape (100 TB): the selection is a monotonic-deque sliding-
  * window-minimum scan, ONE scalar call per document over its gram
  * array — O(grams) amortized, no window expansion in any form, and
  * nothing reaches the exchange but the ~2/(w+1) selected (position,
  * 8-byte hash) fingerprints. (History: round 18 replaced the
  * explode+partial-agg form with in-row slice+array_min algebra;
  * round 20 replaced that with the deque after measuring that
  * higher-order-function lambdas evaluate INTERPRETED — the "stay in
  * the codegen stage" rationale never actually applied to the lambda
  * bodies, and the O(m·w) boxed struct comparisons dominated. llm128
  * read 7.25→2.75 s isolated at sf0.1.)
  */
object Winnowing {

  /** Per-document winnowing fingerprints: one row per selected
    * (doc, position, k-gram hash), distinct. Documents shorter than
    * one full window contribute their rightmost-min gram (the w > m
    * degenerate window), so every doc with >= 1 gram fingerprints. */
  def fingerprints(docs: DataFrame, idCol: Column, textCol: Column,
                   k: Int, w: Int): DataFrame = {
    require(k >= 2 && w >= 2, s"need k >= 2 and w >= 2, got k=$k w=$w")
    // IN-ROW form (round-18 A/B, measured): gram hashes, per-window
    // rightmost minima, and the distinct selected set all compute as
    // array algebra inside the scan row — the w-fold window expansion
    // never becomes ROWS at all, so nothing reaches the exchange but
    // the ~2/(w+1) selected fingerprints. The earlier explode +
    // partial-agg form (windows as rows collapsing map-side) measured
    // 8.4 s isolated at sf0.1; this form replaces the 8× row blowup +
    // hash-agg machinery with O(m·w) in-row struct comparisons.
    // Semantics are pinned identical in WinnowingSpec: per window of
    // w consecutive gram hashes, min of (h asc, position desc) — the
    // struct (h, -p) minimum — and selected (p, h) pairs dedup.
    fingerprintsFromGrams(docs
      .select(idCol.as("doc_id"), textCol.as("__t"))
      .where(col("__t").isNotNull && length(col("__t")) >= k)
      // identical to the inline transform for len >= k rows (the
      // filter above), via the round-20 JVM gram scan
      .select(col("doc_id"), GramIndex.gramArray(col("__t"), k).as("gh")), w)
  }

  /** The monotonic-deque sliding-window-minimum scan, one doc's gram
    * array in, its distinct selected (1-based position, hash) pairs
    * out — O(m) amortized vs the O(m·w) per-window slice+min the
    * in-row array-algebra form pays (and HOF lambdas evaluate
    * INTERPRETED, so those were boxed struct comparisons, not
    * codegen). Tie rule identical to `array_min(struct(h, -p))`:
    * smaller hash wins, equal hashes resolve to the RIGHTMOST
    * position — in deque terms a newer element pops an equal-hash
    * older one. Degenerate m < w: one window over the whole array. */
  private[llm] def winnowScan(gh: IndexedSeq[Long], w: Int): Seq[(Long, Long)] = {
    val m = gh.length
    if (m == 0) return Nil
    val win = math.min(w, m)
    val dq = new java.util.ArrayDeque[Int]()
    val out = scala.collection.mutable.LinkedHashSet.empty[(Long, Long)]
    var i = 0
    while (i < m) {
      while (!dq.isEmpty && gh(i) <= gh(dq.peekLast())) dq.pollLast()
      dq.addLast(i)
      if (dq.peekFirst() <= i - win) dq.pollFirst()
      if (i >= win - 1) {
        val j = dq.peekFirst()
        out += (((j + 1).toLong, gh(j)))
      }
      i += 1
    }
    out.toSeq
  }

  /** The winnowing SELECTION over pre-computed gram-hash arrays — the
    * entry point for consumers holding a materialized gram index
    * ([[GramIndex]]): `grams` = (doc_id, gh) where gh(i) is the hash
    * of the k-gram at 1-based position i+1. Callers must have already
    * dropped sub-k documents (a GramIndex row with len < k holds the
    * whole-short-text hash, which is not a k-gram).
    *
    * Round-20 A/B: the selection runs as ONE scalar call per document
    * ([[winnowScan]], O(m) deque) instead of the in-row
    * slice+array_min algebra (O(m·w) INTERPRETED struct comparisons —
    * higher-order-function lambdas never reach codegen, so the "stay
    * in the codegen stage" rationale for the array form did not
    * actually hold for the selection itself). Semantics pinned
    * unchanged in WinnowingSpec (reference-scan equality incl. ties,
    * substring guarantee, density). */
  def fingerprintsFromGrams(grams: DataFrame, w: Int): DataFrame = {
    require(w >= 2, s"need w >= 2, got w=$w")
    val sel = udf((gh: scala.collection.Seq[Long]) =>
      if (gh == null) Nil else winnowScan(gh.toIndexedSeq, w))
    grams
      .select(col("doc_id"), explode(sel(col("gh"))).as("__s"))
      .select(col("doc_id"), col("__s._1").as("p"), col("__s._2").as("h"))
  }

  /** Candidate partial-copy pairs from shared winnowing fingerprints:
    * for every unordered doc pair sharing >= minShared distinct
    * fingerprint hashes, emit the shared count and each side's
    * distinct-hash fingerprint size (integer-exact; the consumer's
    * overlap coefficient is n_shared / min(n_a, n_b)). Candidates come
    * from ONE equi-join on the 8-byte fingerprint hash — work is
    * O(docs sharing content), never all-pairs. */
  def overlapPairs(fps: DataFrame, minShared: Int): DataFrame = {
    val fp = fps.select(col("doc_id"), col("h")).distinct()
    val sizes = fp.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
    val pairs = fp.as("a").join(fp.as("b"), col("a.h") === col("b.h") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    pairs
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
                 .withColumnRenamed("n_fp", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
                 .withColumnRenamed("n_fp", "n_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        // integer percent of the smaller side's fingerprints shared —
        // exact in both engines (one integer division)
        expr("n_shared * 100 DIV least(n_a, n_b)").as("overlap_pct"))
  }
}
