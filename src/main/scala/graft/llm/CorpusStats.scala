package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Portable

/** Corpus-scale language statistics — the vocabulary-growth (Heaps'
  * law) curve corpus papers publish next to their size tables: how
  * many DISTINCT terms the corpus has accumulated after its first
  * N documents, against how many running tokens. A flattening curve
  * says the corpus is saturating its domain vocabulary; a linear one
  * says it is still absorbing new material — the diagnostic that
  * decides whether to keep crawling a source.
  *
  * Spark shape (the reason this scales to 100 TB):
  *  - terms travel as 8-byte portable hashes from the moment they
  *    leave the tokenizer — the term-grain shuffle moves fixed-width
  *    keys, never strings (the llm22/llm33 discipline);
  *  - "first appearance" is one `min(doc_id)` hash aggregation over
  *    those keys (map-side partial combine, one shuffle);
  *  - both curves then collapse to per-BIN counts — the frame that
  *    crosses the final window is `max(doc_id)/binWidth` rows, corpus-
  *    size independent for a binWidth chosen at the data scale;
  *  - the cumulative sums run in ONE unpartitioned window over that
  *    tiny bin frame (bins, not documents, cross the single
  *    partition — the llm32 cumulative-histogram trade).
  *
  * Everything is integer arithmetic (counts and bin ids), so any
  * engine replays it bit-for-bit.
  */
object CorpusStats {

  /** Vocabulary-growth curve: one row per `binWidth`-wide doc_id bin,
    * with per-bin new-term/token counts and the running (cumulative)
    * vocabulary size and token count at each checkpoint (the bin's
    * exclusive upper bound). Documents with no tokens contribute
    * nothing — their bin still appears if any sibling doc has tokens.
    *
    * Output: (checkpoint, n_new_terms, n_tokens, vocab_size,
    * cum_tokens), all BIGINT, ordered by checkpoint upstream of the
    * caller's own sort.
    */
  def vocabGrowth(df: DataFrame, idCol: Column, textCol: Column,
                  binWidth: Long): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    val base = df.select(idCol.cast("long").as("doc_id"),
      TextAnalysis.tokens(textCol).as("__toks"))
    // `%` (remainder, dividend sign — truncation semantics) here AND in
    // the llm57 oracle (`fd - fd % 50 + 50`, the same form): Spark's `%`
    // and DuckDB's `%` both truncate toward zero, so the bin agrees for
    // every id, negative included. (DuckDB `//` ALSO truncates toward
    // zero — verified: -7 // 4 = -1 — matching Spark `DIV`; only `pmod`
    // or a hand-rolled floor-division formula diverge on negative ids.)
    val bin = (c: Column) => (c - c % lit(binWidth) + lit(binWidth)).as("checkpoint")

    val firstSeen = base
      .select(col("doc_id"), explode(col("__toks")).as("__term"))
      // hash BEFORE any shuffle: the term string dies inside the scan
      // stage's projection and only the 8-byte key moves
      .select(col("doc_id"), Portable.hash64(col("__term")).as("h"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("fd"))
    val newPerBin = firstSeen.groupBy(bin(col("fd")))
      .agg(count(lit(1)).as("n_new_terms"))
    // token counts need only the DOC grain — no second explode over
    // the corpus; sum of per-doc sizes equals the per-token count
    val tokPerBin = base
      .select(bin(col("doc_id")), size(col("__toks")).cast("long").as("__nt"))
      .groupBy(col("checkpoint"))
      .agg(sum(col("__nt")).as("n_tokens"))
      .filter(col("n_tokens") > 0)

    // every bin with a new term has tokens (a first appearance IS a
    // token), so tokPerBin's bin set is the superset — left join
    val w = Window.orderBy(col("checkpoint"))
    tokPerBin.join(newPerBin, Seq("checkpoint"), "left")
      .select(col("checkpoint"),
        coalesce(col("n_new_terms"), lit(0L)).as("n_new_terms"),
        col("n_tokens"))
      .withColumn("vocab_size", sum(col("n_new_terms")).over(w))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
  }

  /** Term-distribution DRIFT between two corpus snapshots — the
    * refresh-gate check dataset versioning runs beside the identity
    * diff ([[CorpusReport.manifestDiff]] says WHICH docs changed;
    * this says whether the LANGUAGE changed): per term in the union
    * vocabulary, the symmetrized chi-square contribution
    * (o−e)²/(o+e) over exact counts, quantized to 1e-6 integers
    * before the sum so the total is engine-exact, plus appeared /
    * vanished term counts. One hash-keyed count aggregate per
    * snapshot + one full-outer join on the 8-byte term hash —
    * strings never shuffle; output is a single summary row. */
  def termDrift(prev: DataFrame, prevText: Column,
                cur: DataFrame, curText: Column): DataFrame = {
    def counts(df: DataFrame, t: Column, as: String) =
      df.select(explode(TextAnalysis.tokens(t)).as("__w"))
        .select(Portable.hash64(col("__w")).as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as(as))
    counts(prev, prevText, "e").join(counts(cur, curText, "o"), Seq("h"), "full_outer")
      .select(coalesce(col("o"), lit(0L)).as("o"),
              coalesce(col("e"), lit(0L)).as("e"))
      .agg(count(lit(1)).as("n_terms"),
        sum(when(col("e") === 0, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("o") === 0, 1L).otherwise(0L)).as("n_gone"),
        // square in DOUBLE: long (o−e)² overflows once per-term counts
        // pass 2^31.5 (a realistic 100 TB vocabulary head); the double
        // square is exact while |o−e| < 2^26.5 and deterministic
        // beyond — the oracle spells the identical cast order
        sum(floor((col("o") - col("e")).cast("double") *
                  (col("o") - col("e")).cast("double") /
                  (col("o") + col("e")).cast("double") * lit(1e6)).cast("long"))
          .as("drift_q"))
  }

  /** Per-source MARGINAL novelty under a greedy source chain: order
    * sources lexicographically and charge each distinct shingle to
    * the FIRST source containing it — `n_new / n_shingles` is how
    * much genuinely new content each additional source contributes
    * beyond everything before it, the acquisition-priority signal
    * corpus assembly ranks sources by (pairwise overlap — llm39 —
    * can't see it: a source 90% covered by the UNION of three others
    * pairwise-overlaps each only a little).
    *
    * Shape: one position-explode to (source, shingle-hash), one
    * distinct, one min-aggregate keyed on the 8-byte hash, one
    * source-grain rollup — strings never shuffle. */
  def sourceNovelty(df: DataFrame, sourceCol: Column, textCol: Column,
                    n: Int,
                    tracker: Option[graft.operators.Materialize.Tracker] = None): DataFrame = {
    // round-21 (guide §8): the distinct (source, h) frame feeds two
    // aggregations whose column pruning diverges (per-source counts vs
    // first-owner-per-hash), so the planner sees two non-canonical
    // subtrees and the corpus was scanned twice (verified on the
    // executed plan — the optimizer collapses distinct+aggregate on one
    // branch). With a tracker the 8-byte-pair frame materializes once.
    // widened before the md5 set pass (round-22, Dedup.atWidth) — keyed
    // on the text (source is ~tens of values and would skew the width)
    val sh0 = Dedup.atWidth(df.select(sourceCol.as("source"), textCol.as("__t"))
        .where(col("__t").isNotNull), col("__t"))
      .select(col("source"),
        explode(graft.functions.MinhashSigs(col("__t"), n, 1, withSet = true)
          .getField("shh")).as("__h"))
      .distinct()
    val sh = tracker match {
      case Some(t) => t.track(graft.operators.Materialize.eager(sh0))
      case None => sh0
    }
    val perSource = sh.groupBy(col("source")).agg(count(lit(1)).as("n_shingles"))
    val firstOf = sh.groupBy(col("__h")).agg(min(col("source")).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_new"))
    perSource.join(firstOf, Seq("source"), "left")
      .select(col("source"), col("n_shingles"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("novelty",
        col("n_new").cast("double") / col("n_shingles").cast("double"))
  }

  /** Zipf rank-frequency slope per group — the power-law-exponent
    * diagnostic that separates natural language (slope ≈ −1 on
    * log-log) from boilerplate floods (flat head) and token soup
    * (steep tail). The least-squares slope is fit over INTEGER log2
    * of rank and frequency (`length(bin(x)) − 1` — exact in any
    * engine, where libm `ln` can differ in the last ulp and poison a
    * quantized compare); all regression sums are exact integer sums
    * and the slope is one double division at the end.
    *
    * Tie order among equal frequencies doesn't matter: the multiset
    * of ranks a tie group receives is fixed, so every aggregate is
    * tie-order invariant — rank needs no portable tiebreak. Shape:
    * one token explode → (group, term-hash) count shuffle, one
    * per-group rank window over the VOCABULARY (not the corpus),
    * one group-row aggregate. */
  def zipfSlope(df: DataFrame, groupCol: Column, textCol: Column): DataFrame = {
    val counts = df.select(groupCol.as("grp"),
        explode(TextAnalysis.tokens(textCol)).as("__t"))
      .select(col("grp"), Portable.hash64(col("__t")).as("__h"))
      .groupBy(col("grp"), col("__h")).agg(count(lit(1)).as("__c"))
    val ranked = counts.withColumn("__rk",
      row_number().over(Window.partitionBy(col("grp"))
        .orderBy(col("__c").desc, col("__h"))))
    val logs = ranked.select(col("grp"),
      (length(bin(col("__rk"))) - 1).cast("long").as("__x"),
      (length(bin(col("__c"))) - 1).cast("long").as("__y"))
    logs.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_terms"),
           sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
           sum(col("__x") * col("__y")).as("__sxy"),
           sum(col("__x") * col("__x")).as("__sxx"))
      .select(col("grp"), col("n_terms"),
        when(col("n_terms") * col("__sxx") - col("__sx") * col("__sx") === 0, lit(0.0))
          .otherwise(
            (col("n_terms") * col("__sxy") - col("__sx") * col("__sy")).cast("double") /
            (col("n_terms") * col("__sxx") - col("__sx") * col("__sx")).cast("double"))
          .as("slope"))
  }

  /** LENGTH-DISTRIBUTION DRIFT between two corpus versions — the
    * third drift axis next to [[termDrift]] (vocabulary) and the
    * embedding-drift family: a DETERMINISTIC two-sample
    * Kolmogorov–Smirnov statistic over bucketed document lengths.
    * Cross-multiplied integers keep it exact: the statistic is
    * max_b |K1(b)·n2 − K2(b)·n1| (K = cumulative bucket counts), so
    * both engines agree bit-for-bit where the usual float CDF
    * difference would not, and ks_pct = that max ×100 DIV (n1·n2) is
    * the familiar D×100. A length shift (truncation bug, boilerplate
    * injection, concatenation change) moves this before any content
    * metric notices.
    *
    * Scale shape: each version reduces to per-BUCKET counts in one
    * hash aggregate (the corpus never sorts); the cumulative window
    * runs over the tiny bucket frame — the audit's documented
    * single-partition moment, dozens of rows.
    *
    * @return one row: (ks_scaled, at_bucket, n1, n2, ks_pct) */
  def lengthDrift(v1: DataFrame, t1: Column, v2: DataFrame, t2: Column,
                  bucketWidth: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def counts(df: DataFrame, t: Column, as: String) =
      df.select(length(t).cast("long").as("__l"))
        .select(expr(s"__l DIV $bucketWidth").as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as(as))
    val al = counts(v1, t1, "c1").join(counts(v2, t2, "c2"), Seq("b"), "full")
      .select(col("b"), coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2"))
    val w = Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, 0)
    val cum = al
      .withColumn("k1", sum(col("c1")).over(w))
      .withColumn("k2", sum(col("c2")).over(w))
    val tot = cum.agg(max(col("k1")).as("n1"), max(col("k2")).as("n2"))
    cum.crossJoin(broadcast(tot))
      .select(col("b"), abs(col("k1") * col("n2") - col("k2") * col("n1")).as("d"),
        col("n1"), col("n2"))
      .orderBy(col("d").desc, col("b").asc)
      .limit(1)
      .select(col("d").as("ks_scaled"), col("b").cast("int").as("at_bucket"),
        col("n1"), col("n2"),
        expr("d * 100 DIV (n1 * n2)").as("ks_pct"))
  }
}
