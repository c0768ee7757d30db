package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.operators.Materialize

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

  /** Near-dup stage knobs — the PRODUCTION configuration of the
    * MinHash/LSH pipeline, including the two 100 TB switches the
    * oracle queries keep off: `maxBucketSize` (the hot-bucket cap —
    * real corpora hash boilerplate into a few mega-buckets whose
    * s·(s−1)/2 pairs would dominate the candidate join; capped buckets
    * drop whole and true near-dups still pair through their other
    * bands) and `checkpointDir` (reliable checkpoints for the
    * clustering supersteps — survives executor loss). */
  final case class NearDupConfig(shingleN: Int = 5,
                                 k: Int = 16,
                                 rowsPerBand: Int = 4,
                                 jaccardThreshold: Double = 0.8,
                                 maxBucketSize: Option[Int] = None,
                                 checkpointDir: Option[String] = None)

  /** NEAR-dup curation: quality gates → MinHash signatures → LSH
    * candidate pairs (hot-bucket cap per `cfgNd`) → exact Jaccard
    * verify → connected components → keep the min-id representative
    * per duplicate cluster. Returns surviving (doc_id, text) rows.
    *
    * Scale shape: one shingle explosion feeds both the signature
    * aggregation and the verify join (materialized once, eagerly —
    * same rationale as `Dedup.contamination`); pair generation is
    * bucketed, never all-pairs; clustering runs on the verified 8-byte
    * edge list only. The gated corpus and the final cluster labels are
    * what the RESULT plan reads — pass a `tracker` and release after
    * consumption to free their executor blocks. */
  def curateNearDup(docs: DataFrame, idCol: Column, textCol: Column,
                    cfg: Config = Config(),
                    cfgNd: NearDupConfig = NearDupConfig(),
                    tracker: Option[Materialize.Tracker] = None): DataFrame = {
    // `sh` (strings) feeds the signature aggregation; `shh` (xxhash64
    // longs) feeds the verify join — jaccard counts are hash-invariant
    // and the join moves fixed-width long arrays (same trade as the
    // decontamination pipeline)
    val gated = Materialize.eager(docs.filter(qualityGate(textCol, cfg))
      .select(idCol.as("doc_id"), textCol.as("text"),
              Dedup.shingles(textCol, cfgNd.shingleN).as("sh"))
      .withColumn("shh", transform(col("sh"), s => xxhash64(s))))
    tracker.foreach(_.track(gated))
    val sig = Dedup.minhashSignature(gated, col("doc_id"), col("sh"), cfgNd.k)
    val pairs = Dedup.candidatePairs(
      Dedup.lshBuckets(sig, cfgNd.k, cfgNd.rowsPerBand), cfgNd.maxBucketSize)
    val verified = pairs
      .join(gated.select(col("doc_id").as("id_a"), col("shh").as("sh_a")), "id_a")
      .join(gated.select(col("doc_id").as("id_b"), col("shh").as("sh_b")), "id_b")
      .filter(Dedup.jaccard(col("sh_a"), col("sh_b")) >= cfgNd.jaccardThreshold)
      .select(col("id_a"), col("id_b"))
    val dropIds = Dedup.connectedComponents(verified,
        checkpointDir = cfgNd.checkpointDir, tracker = tracker)
      .filter(col("doc_id") =!= col("cluster_id")) // non-representatives
      .select(col("doc_id"))
    gated.join(dropIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("text"))
  }

  /** Rank-based quality gating WITHIN each group (source/dump/domain):
    * keep the top `keepFraction` of documents per group by score —
    * FineWeb-style per-dump stratified filtering, which an absolute
    * threshold can't express when score distributions differ by
    * source. Deterministic: ties break on the id column (ids assumed
    * unique); a group of n keeps floor(n·keepFraction) documents (so
    * keepFraction=0.5 keeps exactly the top half, rounding down).
    *
    * Scale shape — a corpus has a handful of sources, so
    * `Window.partitionBy(group)` would sort each group's billions of
    * rows in ONE task. Instead the rank is computed DISTRIBUTED and
    * exact:
    *   1. range-repartition on the full sort key
    *      (group, score desc, id) — each group spans many ordered
    *      partitions, each partition holds ~n/P rows regardless of
    *      group skew;
    *   2. per-(partition, group) row counts → prefix-sum offsets, on
    *      a tiny frame (≤ P rows per group) that broadcast-joins back;
    *   3. row_number windows partitioned by (partition id, group) —
    *      every window partition is bounded by a single range
    *      partition's rows, never by a group's.
    * offset + within-partition row_number = exact global rank within
    * the group, independent of where the (sampled) range boundaries
    * fall, because the partition order follows the total sort order.
    * Group sizes (the quota) come from a plain aggregate, one row per
    * group, broadcast.
    *
    * `checkpointDir`: when set, the materialized ranged frame (the
    * ENTIRE corpus, all columns) uses a RELIABLE checkpoint — same
    * trade as [[Dedup.connectedComponents]]: executor-local blocks die
    * with their executor, and a 100 TB ranging pass should pay the
    * durable write for restartability. Default (None) keeps fast
    * in-memory materialization; the RESULT plan reads the ranged
    * frame, so pass a `tracker` and release after consumption.
    *
    * `numPartitions`: explicit range-partition count. Default (None)
    * lets AQE pick — which on a SMALL input may coalesce the range
    * shuffle to one partition (correct either way: both branches read
    * the same materialized partition ids). Pass an explicit count to
    * pin the multi-partition path (tests do, to actually exercise the
    * cross-partition offsets). */
  def keepTopQualityPerGroup(docs: DataFrame, idCol: Column, groupCol: Column,
                             scoreCol: Column, keepFraction: Double,
                             checkpointDir: Option[String] = None,
                             tracker: Option[Materialize.Tracker] = None,
                             numPartitions: Option[Int] = None): DataFrame = {
    require(keepFraction > 0 && keepFraction <= 1, "keepFraction in (0, 1]")
    keepRankedPerGroup(docs, idCol, groupCol, scoreCol,
      tot => floor(tot * keepFraction), checkpointDir, tracker, numPartitions)
  }

  /** GLOBAL token-budget selection — the "best N tokens" gate every
    * pretraining-mix pipeline ends with: walk the corpus best-first
    * and keep documents until the TOKEN budget (not a document count)
    * is spent. Where [[keepTopQualityPerGroup]] rations per GROUP by
    * document fraction, this rations the WHOLE corpus by token mass.
    *
    * `scoreQCol` must be an integer-quantized score (the repo's
    * cross-engine float discipline — e.g.
    * `floor(qualityScore(text) * 1e9)`): the running token total
    * accumulates in score-descending order via
    * [[graft.operators.PrefixSum.runningTotal]] — the distributed
    * two-level scan, never a single-partition global window — and a
    * document survives while its running total fits `budgetTokens`.
    * Ties share one running total (RANGE semantics), so a tie-group
    * that straddles the budget is excluded WHOLE — deterministic on
    * every engine, no tie-breaker needed.
    *
    * Returns (doc_id, score_q, n_tokens, cum_tokens) for survivors.
    * `bucketWidth` partitions the score axis for the parallel scan
    * (quantized scores span ~[0, 1e9] → the 2^25 default yields ~32
    * buckets). */
  def tokenBudgetSelect(docs: DataFrame, idCol: Column, scoreQCol: Column,
                        tokensCol: Column, budgetTokens: Long,
                        bucketWidth: Long = 1L << 25): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val base = docs.select(idCol.as("doc_id"),
      scoreQCol.cast("long").as("score_q"),
      tokensCol.cast("long").as("n_tokens"))
    graft.operators.PrefixSum.runningTotal(base,
        orderCol = -col("score_q"), valueCol = col("n_tokens"),
        bucketWidth = bucketWidth, out = "cum_tokens")
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col("doc_id"), col("score_q"), col("n_tokens"), col("cum_tokens"))
  }

  /** Classifier CALIBRATION bins — the reliability diagram behind
    * every learned quality gate: partition the observed score range
    * into `nBins` equal-width bins (integer arithmetic over the
    * broadcast min/max — `(score−min)·nBins DIV (max−min+1)`, no
    * doubles) and report each bin's volume, positive count, and
    * quantized positive rate. A well-calibrated gate's positive rate
    * climbs monotonically with the bin; a flat or folded curve means
    * the score doesn't order quality and the gate's threshold is
    * noise. Scores must be integer-quantized (the repo discipline —
    * e.g. llm43's hashed-linear logit).
    *
    * 100 TB shape: one 2-long min/max aggregate broadcasts; the bin
    * aggregate is the only pass, keyed on ≤nBins values with map-side
    * combine. Returns (bin, n, n_pos, pos_rate_q) for non-empty bins. */
  def calibrationBins(docs: DataFrame, scoreCol: Column, labelCol: Column,
                      nBins: Int): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val stats = docs.agg(min(scoreCol.cast("long")).as("__lo"),
                         max(scoreCol.cast("long")).as("__hi"))
    docs.select(scoreCol.cast("long").as("__s"),
        labelCol.cast("boolean").as("__l"))
      .crossJoin(broadcast(stats))
      .select(expr(s"(__s - __lo) * $nBins DIV (__hi - __lo + 1)").as("bin"),
        col("__l"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__l"), 1L).otherwise(0L)).as("n_pos"))
      .withColumn("pos_rate_q", expr("n_pos * 1000000 DIV n"))
  }

  /** Absolute-CAP variant of [[keepTopQualityPerGroup]]: keep at most
    * `cap` documents per group, top-ranked by score (ties on id). With
    * a hash-derived score ([[Sampling.unitInterval]]) this is
    * CLUSTER-BALANCED sampling — equal representation per cell
    * regardless of cell skew, the diversity-sampling step of curation
    * pipelines. Same distributed exact-rank machinery: no per-group
    * single-task window at any group size. */
  def keepCapPerGroup(docs: DataFrame, idCol: Column, groupCol: Column,
                      scoreCol: Column, cap: Long,
                      checkpointDir: Option[String] = None,
                      tracker: Option[Materialize.Tracker] = None,
                      numPartitions: Option[Int] = None): DataFrame = {
    require(cap > 0, "cap must be positive")
    keepRankedPerGroup(docs, idCol, groupCol, scoreCol,
      tot => least(tot, lit(cap)), checkpointDir, tracker, numPartitions)
  }

  private def keepRankedPerGroup(docs: DataFrame, idCol: Column, groupCol: Column,
                                 scoreCol: Column, quotaOf: Column => Column,
                                 checkpointDir: Option[String],
                                 tracker: Option[Materialize.Tracker],
                                 numPartitions: Option[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tagged = docs.withColumn("__g", groupCol).withColumn("__score", scoreCol)
      .withColumn("__id", idCol)
    // materialize the range shuffle once: both the counts branch and
    // the rank branch read it, and the partition ids MUST be identical
    // in both (a recomputed range shuffle may sample different
    // boundaries, misaligning offsets with ranks)
    val sortKeys = Seq(col("__g"), col("__score").desc, col("__id").asc)
    val rangedInput = numPartitions match {
      case Some(n) => tagged.repartitionByRange(n, sortKeys: _*)
      case None => tagged.repartitionByRange(sortKeys: _*)
    }
    val ranged = Materialize.eagerOrCheckpoint(
      rangedInput.withColumn("__pid", spark_partition_id()), checkpointDir)
    tracker.foreach(_.track(ranged))
    val counts = ranged.groupBy(col("__pid"), col("__g"))
      .agg(count(lit(1)).as("__c"))
    val quotas = counts.groupBy(col("__g"))
      .agg(quotaOf(sum(col("__c"))).as("__quota"))
    val wOff = Window.partitionBy(col("__g")).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__g"), col("__off"))
    val wRank = Window.partitionBy(col("__pid"), col("__g"))
      .orderBy(col("__score").desc, col("__id").asc)
    ranged
      .withColumn("__rank", row_number().over(wRank))
      .join(broadcast(offsets), Seq("__pid", "__g"))
      .join(broadcast(quotas), Seq("__g"))
      .filter(col("__off") + col("__rank") <= col("__quota"))
      .drop("__g", "__score", "__id", "__pid", "__rank", "__off", "__quota")
  }

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

  /** Filter-funnel diagnostic — the curation REPORT every corpus
    * paper publishes ("rule X alone kills N docs; after rules 1..i,
    * M survive"): for each named rule, the count failing it in
    * isolation and the count surviving the cumulative prefix. ONE
    * scan, ONE global aggregate of 2·rules+1 conditional sums —
    * every rule evaluates once per document inside the same codegen'd
    * projection, the funnel is plain boolean algebra over those
    * flags, and the output is a single wide row regardless of corpus
    * size. Rule order is funnel order. */
  def filterFunnel(docs: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    // a NULL rule verdict (e.g. a regex over null text) counts as a
    // FAILURE — without the coalesce such a doc would appear in
    // n_docs but in neither the fail nor any survive column, and the
    // funnel arithmetic would stop reconciling
    val flagged = docs.select(rules.map { case (n, c) =>
      coalesce(c.cast("boolean"), lit(false)).as(s"__r_$n") }: _*)
    val aggs = rules.zipWithIndex.flatMap { case ((n, _), i) =>
      val pass = col(s"__r_$n")
      val cum = rules.take(i + 1).map(r => col(s"__r_${r._1}")).reduce(_ && _)
      Seq(sum(when(!pass, 1L).otherwise(0L)).as(s"fail_$n"),
          sum(when(cum, 1L).otherwise(0L)).as(s"survive_$n"))
    }
    flagged.agg(count(lit(1)).as("n_docs"), aggs: _*)
  }

  /** Curriculum schedule: turn per-source mixture weights (e.g.
    * [[Sampling.domainReweight]]'s output) into an actual TRAINING
    * ORDER — high-quality docs first within each source, sources
    * interleaved proportionally to their weights by stride
    * scheduling (the lottery/stride-scheduler arithmetic): the
    * in-source rank-r doc of source s takes virtual position
    * ⌊r·S/wₛ⌋, so a double-weight source appears twice as often in
    * any prefix of the schedule. Reading the output in (position,
    * source, rank) order IS the curriculum.
    *
    * Exactness without overflow: r·S can pass 2⁶³ at corpus scale
    * (10¹⁰ docs × 10⁹ scale), so the position is computed as the
    * algebraically identical (r DIV w)·S + ((r MOD w)·S) DIV w —
    * every factor stays under 2⁶³ for w ≤ S. All integer, so any
    * engine replays the schedule bit-for-bit.
    *
    * Spark shape: ONE source-hash window for the quality rank, a
    * literal CASE chain for the k weights (no join — the weight
    * table is domain-count sized), and the caller's ORDER BY is a
    * range-partitioned sort. Unknown sources raise; weights must be
    * positive (a zero weight divides by zero — and DuckDB and Spark
    * disagree on what that means).
    */
  def curriculumSchedule(docs: DataFrame, idCol: Column, sourceCol: Column,
                         qualityQCol: Column,
                         weights: Map[String, Long],
                         scale: Long = 1000000000L): DataFrame = {
    require(weights.nonEmpty, "need at least one source weight")
    require(weights.values.forall(w => w > 0 && w <= scale),
      s"weights must be in (0, $scale]: $weights")
    import org.apache.spark.sql.expressions.Window
    val wcol = weights.foldLeft(lit(null).cast("long")) { case (acc, (s, w)) =>
      when(sourceCol === lit(s), lit(w)).otherwise(acc)
    }
    val win = Window.partitionBy(col("source"))
      .orderBy(col("q").desc, col("doc_id"))
    docs
      .select(idCol.as("doc_id"), sourceCol.as("source"),
        qualityQCol.cast("long").as("q"),
        when(wcol.isNull,
          raise_error(concat(lit("no weight for source "), sourceCol)).cast("long"))
          .otherwise(wcol).as("__w"))
      .withColumn("rank_in_source", row_number().over(win).cast("long"))
      .select(col("doc_id"), col("source"), col("rank_in_source"),
        (expr(s"rank_in_source DIV __w") * lit(scale) +
          expr(s"(rank_in_source % __w) * CAST($scale AS BIGINT) DIV __w")).as("position"))
  }
}
