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
  * Scale shape (100 TB): the gram pass emits (id, pos, 8-byte hash)
  * straight off the scan — text never leaves the scan projection. The
  * window expansion multiplies those rows by w, but each window
  * collapses to ONE row in the map-side partial aggregate (min of a
  * 16-byte struct keyed by (doc, window)), so what crosses the one
  * exchange is the per-window minima — O(grams) rows of three longs,
  * and the distinct fingerprint set after it is the 2/(w+1) sample.
  * A mapPartitions monotonic-deque scan could cut the in-map blowup to
  * O(1) amortized per gram, but it would trade whole-stage codegen and
  * require a per-doc sort; the explode form keeps everything inside
  * one codegen stage and the blowup never crosses an exchange.
  */
object Winnowing {

  /** Per-document winnowing fingerprints: one row per selected
    * (doc, position, k-gram hash), distinct. Documents shorter than
    * one full window contribute their rightmost-min gram (the w > m
    * degenerate window), so every doc with >= 1 gram fingerprints. */
  def fingerprints(docs: DataFrame, idCol: Column, textCol: Column,
                   k: Int, w: Int): DataFrame = {
    require(k >= 2 && w >= 2, s"need k >= 2 and w >= 2, got k=$k w=$w")
    // (doc, p, h, m): positional k-gram hashes + gram count m per doc.
    val ph = docs
      .select(idCol.as("doc_id"), textCol.as("__t"))
      .where(col("__t").isNotNull && length(col("__t")) >= k)
      .select(col("doc_id"), (length(col("__t")) - (k - 1)).as("m"),
        explode(sequence(lit(1), length(col("__t")) - (k - 1))).as("p"),
        col("__t"))
      .select(col("doc_id"), col("m"), col("p"),
        Portable.hash64(col("__t").substr(col("p"), lit(k))).as("h"))
    // Window membership: gram p belongs to window starts
    // i in [max(1, p-w+1), min(p, max(m-w+1, 1))] — the clamp makes a
    // doc with fewer than w grams one whole-doc window (i = 1).
    val win = ph.select(col("doc_id"), col("p"), col("h"),
      explode(sequence(
        greatest(lit(1), col("p") - (w - 1)),
        least(col("p"), greatest(col("m") - (w - 1), lit(1))))).as("i"))
    // Rightmost minimal hash per window: min over (h asc, p desc),
    // then the distinct selected set is the fingerprint.
    win.groupBy(col("doc_id"), col("i"))
      .agg(min(struct(col("h"), (-col("p")).as("np"))).as("b"))
      .select(col("doc_id"), (-col("b.np")).cast("long").as("p"),
        col("b.h").as("h"))
      .distinct()
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
