package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Deterministic hash-based sampling and dataset splitting for
  * training-data pipelines.
  *
  * Seeded RNG sampling (`df.sample`, `sampleBy`) is partition-order
  * dependent: a repartition, a retry, or a different engine yields a
  * DIFFERENT sample. Hash-based sampling decides per RECORD — keep
  * iff hash(salt:id)/2^60 < rate — so the same document lands in the
  * same split on every run, every engine, every cluster size: the
  * property training pipelines need for reproducible corpus versions
  * and leak-free train/test separation. Changing the salt draws an
  * independent sample. All Column algebra over the portable hash —
  * codegen'd, no shuffle, oracle-checkable.
  */
object Sampling {

  /** Deterministic unit-interval value for a record id: U(id) ∈ [0,1),
    * uniform under the 60-bit portable hash. */
  def unitInterval(idCol: Column, salt: String): Column =
    Portable.hash64(concat(lit(salt + ":"), idCol.cast("string")))
      .cast("double") / lit(Sketches.HashSpace)

  /** DuckDB rendering of [[unitInterval]]. */
  def duckUnitInterval(idExpr: String, salt: String): String =
    s"(CAST(${Portable.duckHash64(s"concat('$salt:', CAST($idExpr AS VARCHAR))")} AS DOUBLE)" +
      s" / ${Sketches.HashSpace})"

  /** Keep a deterministic `rate` fraction of records. */
  def hashSample(df: DataFrame, idCol: Column, rate: Double, salt: String = "sample"): DataFrame =
    df.filter(unitInterval(idCol, salt) < lit(rate))

  /** Deterministic token-DROPOUT augmentation: drop each token of a
    * document where the portable hash of (salt, doc id, token
    * position) lands under `dropPct`/100 — EDA-style noising whose
    * output is a pure function of (salt, id, position), so augmented
    * corpora are REPRODUCIBLE across engines, reruns, and cluster
    * sizes (an rng-based augmenter can never re-derive what it fed a
    * training run). Returns (doc_id, n_tokens, n_kept, aug_text).
    *
    * Shape: position-explode → codegen'd hash filter → one per-doc
    * aggregate rebuilding the kept tokens in position order (the
    * hash must NOT sit inside an array-lambda — interpreted lambdas
    * re-evaluate per element with no CSE, the round-6 trap). */
  def tokenDropout(df: DataFrame, idCol: Column, textCol: Column,
                   dropPct: Int, salt: String = "aug"): DataFrame = {
    require(dropPct >= 0 && dropPct < 100, s"dropPct in [0,100), got $dropPct")
    val toks = df.select(idCol.as("doc_id"), TextAnalysis.tokens(textCol).as("__toks"))
    val pos = toks
      .select(col("doc_id"), size(col("__toks")).cast("long").as("n_tokens"),
        posexplode(col("__toks")).as(Seq("__p", "__t")))
      .withColumn("__keep",
        pmod(Portable.hash64(concat(lit(salt + ":"), col("doc_id").cast("string"),
          lit(":"), col("__p").cast("string"))), lit(100L)) >= dropPct)
    pos.filter(col("__keep"))
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("__p"), col("__t")))),
          x => x.getField("__t")), " ").as("aug_text"))
  }

  /** Assign every record a split label by cumulative fraction —
    * e.g. Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1). Splits are
    * disjoint and exhaustive (fractions must sum to 1 within 1e-9),
    * and membership depends only on (salt, id). */
  def hashSplit(df: DataFrame, idCol: Column,
                splits: Seq[(String, Double)], salt: String = "split"): DataFrame = {
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "split fractions must sum to 1")
    val u = unitInterval(idCol, salt)
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail
    val expr = splits.zip(bounds).init.foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), rest) => when(u < lit(hi), lit(name)).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Budgeted corpus MIXING: per group (source/domain), keep documents
    * in deterministic hash order until the group's token budget is met
    * — the mixture-weights step of corpus assembly ("this much web,
    * this much books"). The document that straddles the budget is
    * kept (budgets are reached, not undershot); a zero budget excludes
    * the group. The cut is a pure function of (salt, ids), reproducible
    * on any engine or cluster size.
    *
    * Scale shape: the admission order is (unit-interval, id), and the
    * unit interval is RANGE-sharded into `nShards` contiguous slices —
    * shard = floor(u·n) — so the global running sum decomposes exactly
    * into (sum of whole lower shards) + (running sum within the shard).
    * The heavy sort-window partitions by (group, shard) — n spillable
    * tasks per group spread over the cluster — while the cross-shard
    * prefix is a broadcast-joined aggregate of (groups × shards) rows.
    * A single window per group would drag each source's ENTIRE corpus
    * through one task's sort: a few ~10 TB single-task sorts at 100 TB. */
  def budgetedMix(df: DataFrame, idCol: Column, groupCol: Column, nTokensCol: Column,
                  budgets: Map[String, Long], defaultBudget: Long,
                  salt: String = "mix", nShards: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards > 0, "nShards must be positive")
    val budget = budgets.foldLeft(lit(defaultBudget): Column) { case (acc, (k, b)) =>
      when(groupCol === lit(k), lit(b)).otherwise(acc)
    }
    // u ∈ [0,1) ⇒ floor(u·n) ∈ [0,n); least() guards IEEE edge cases
    val withShard = df
      .withColumn("__u", unitInterval(idCol, salt))
      .withColumn("__shard", least(floor(col("__u") * nShards), lit(nShards - 1L)))
    // tokens admitted BEFORE each shard = prefix sum over the tiny
    // per-(group, shard) totals — broadcast back, never a global sort
    val wPrefix = Window.partitionBy(col("__g")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefixes = withShard
      .select(groupCol.as("__g"), col("__shard").as("__s"), nTokensCol.as("__n"))
      .groupBy(col("__g"), col("__s")).agg(sum(col("__n")).as("__t"))
      .withColumn("__before_shard", sum(col("__t")).over(wPrefix) - col("__t"))
      .select(col("__g"), col("__s"), col("__before_shard"))
    val wShard = Window.partitionBy(groupCol, col("__shard")).orderBy(col("__u"), idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withShard
      .withColumn("__cum_in_shard", sum(nTokensCol).over(wShard) - nTokensCol)
      .join(broadcast(prefixes),
        groupCol === col("__g") && col("__shard") === col("__s"))
      .filter(col("__before_shard") + col("__cum_in_shard") < budget)
      .drop("__u", "__shard", "__cum_in_shard", "__g", "__s", "__before_shard")
  }

  /** TEMPERATURE-scaled source mixing (α = 1/2): derive each source's
    * token budget from its own size — budget_s = total·⌊√n_s⌋ / Σ⌊√n_t⌋
    * — then admit documents in deterministic hash order through
    * [[budgetedMix]]. The α<1 exponent up-weights small sources
    * relative to proportional sampling (the standard corpus-mixing
    * move for domain balance); llm18's budgetedMix takes the budgets
    * as GIVEN — this is where they come from.
    *
    * Engine-exactness: weights are INTEGER ⌊√n⌋ (IEEE sqrt is
    * correctly rounded and n < 2⁵² keeps floor exact), their sum is
    * exact integer arithmetic, and the budget is one integer
    * multiply + floor-divide — no float summation order anywhere, so
    * any engine derives the identical budgets. (General α would put
    * pow() on the engine boundary; α=1/2 is sqrt, the portable case.)
    * `totalTokens·⌊√max n_s⌋` must fit in a long.
    *
    * Scale shape: the per-source totals are ONE aggregate collapsing
    * to the sources-dimension (a bounded driver hop, the
    * coarse-quantizer convention); admission is budgetedMix's
    * shard-windowed pass — no global sort. */
  def temperatureMix(df: DataFrame, idCol: Column, groupCol: Column,
                     nTokensCol: Column, totalTokens: Long,
                     salt: String = "tmix", nShards: Int = 64): DataFrame = {
    require(totalTokens > 0, "totalTokens must be positive")
    val sizes = df.groupBy(groupCol.cast("string").as("__g"))
      .agg(sum(nTokensCol.cast("long")).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val weights = sizes.map { case (g, n) => g -> math.sqrt(n.toDouble).toLong }
    val totalW = weights.map(_._2).sum
    require(totalW > 0, "every source is empty — nothing to mix")
    val budgets = weights.map { case (g, w) => g -> totalTokens * w / totalW }.toMap
    budgetedMix(df, idCol, groupCol, nTokensCol, budgets,
      defaultBudget = 0L, salt = salt, nShards = nShards)
  }

  /** DoReMi-style domain reweighting (Xie et al. 2023, simplified to
    * its multiplicative-weights core): starting from uniform domain
    * weights, repeatedly up-weight domains whose loss EXCEEDS the
    * current weighted mean and down-weight the rest — after `iters`
    * rounds the weights concentrate on the domains the proxy model
    * finds hardest, which is the mixture the paper trains on.
    *
    * Update per round, all in scaled int64 so any engine replays it
    * bit-for-bit (S = 10⁹ weight scale; losses are the caller's
    * quantized integers, e.g. floor(deficit·10⁶) ∈ [0, 10⁶]):
    *   m   = (Σᵢ wᵢ·ℓᵢ) / S                (weighted mean loss)
    *   uᵢ  = wᵢ·(S + (ℓᵢ − m)·100) / S     (multiplicative step, η=10⁻⁷/unit)
    *   wᵢ  = uᵢ·S / Σⱼ uⱼ                  (renormalize to Σw = S)
    * Every numerator is non-negative, so Long truncation == floor ==
    * DuckDB's `//` — no rounding-mode drift.
    *
    * 100 TB shape: the corpus is touched ONCE — a per-domain hash
    * aggregation of (count, Σloss) with map-side combine. The
    * iteration then runs on k domain scalars driver-side (a few dozen
    * longs, the k-means-centroid justified-collect pattern —
    * iterating k rows through k DataFrame windows would grow the plan
    * linearly in `iters` for zero distribution win). */
  def domainReweight(df: DataFrame, sourceCol: Column, lossQCol: Column,
                     iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val S = 1000000000L
    val perDomain = df
      .select(sourceCol.as("source"), lossQCol.cast("long").as("lq"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("lq")).as("sl"))
      // integer DIV, not double `/`: Σloss can exceed 2^53 at scale,
      // where a double quotient silently loses low bits
      .select(col("source"), col("n_docs"), expr("sl DIV n_docs").as("ell"))
      .orderBy(col("source"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    require(perDomain.nonEmpty, "no domains — empty corpus")
    perDomain.foreach { case (s, _, ell) =>
      require(ell >= 0 && ell <= 1000000L,
        s"loss for domain '$s' out of the quantized range [0, 1e6]: $ell") }
    val k = perDomain.length
    val ell = perDomain.map(_._3)
    var w = Array.fill(k)(S / k)
    for (_ <- 1 to iters) {
      val m = w.iterator.zip(ell.iterator).map { case (wi, li) => wi * li }.sum / S
      val u = w.iterator.zip(ell.iterator)
        .map { case (wi, li) => wi * (S + (li - m) * 100L) / S }.toArray
      val tot = u.sum
      w = u.map(ui => ui * S / tot)
    }
    val spark = df.sparkSession
    import spark.implicits._
    perDomain.zipWithIndex.map { case ((s, n, l), i) => (s, n, l, w(i), w(i).toDouble / S) }
      .toSeq.toDF("source", "n_docs", "loss_q", "weight_q", "weight")
  }

  /** Per-stratum keep rates (e.g. down-sample dominant languages):
    * strata not in `rates` keep `defaultRate`. */
  def stratifiedSample(df: DataFrame, idCol: Column, strataCol: Column,
                       rates: Map[String, Double], defaultRate: Double,
                       salt: String = "strata"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate): Column) { case (acc, (k, r)) =>
      when(strataCol === lit(k), lit(r)).otherwise(acc)
    }
    df.filter(unitInterval(idCol, salt) < rate)
  }

  /** WEIGHTED SAMPLE WITHOUT REPLACEMENT per group — sequential
    * Poisson / probability-proportional-to-size sampling (Ohlsson
    * 1998; the order-sampling family Efraimidis-Spirakis's u^(1/w)
    * belongs to): each row draws a DETERMINISTIC hash-derived uniform
    * u and the k smallest priorities u/w per group win — heavier rows
    * draw proportionally smaller priorities, so inclusion probability
    * approaches w_i/Σw (the standard PPS approximation), yet the
    * sample is a pure function of (salt, id): reproducible on any
    * engine, run, or cluster size, where RNG reservoir sampling is
    * partition-order dependent. The one float op is a single IEEE
    * division of exact integers — bit-identical across engines (no
    * pow/log; u^(1/w) would need libm, u/w is the same order
    * statistic family with linear weighting).
    *
    * Scale shape: priorities compute in the scan projection; the only
    * shuffle is the per-group window rank (k small — the bounded
    * groupRanks scan is the documented dial for mega-groups), and
    * nothing but (id, group, weight, one double) ever exchanges.
    *
    * Weights must be INTEGRAL (byte/short/int/long): the priority
    * divides by the weight truncated to long, so a fractional weight
    * in (0,1) would silently drop as zero and 1.9 vs 1.0 would be
    * indistinguishable — callers with fractional weights pre-scale to
    * integers (e.g. ×1000), which also keeps the one float op a
    * division of exact integers.
    *
    * @return rows of the winning sample with `priority` and `rk`. */
  def weightedSample(df: DataFrame, idCol: Column, groupCol: Column,
                     weightCol: Column, k: Int,
                     salt: String = "pps"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val wType = df.select(weightCol).schema.head.dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(wType),
      s"weightedSample requires an integral weight column, got $wType — " +
        "fractional weights would truncate silently; pre-scale to integers")
    import org.apache.spark.sql.expressions.Window
    val u = graft.functions.Portable.hash64(
      concat(lit(s"$salt:"), idCol.cast("string")))
    // filter BEFORE the division — ANSI mode raises on u/0, and the
    // projection computes priority in the same select as the rename
    val scored = df.where(weightCol.cast("long") > 0)
      .select(idCol.as("doc_id"), groupCol.as("grp"),
        weightCol.cast("long").as("w"),
        (u.cast("double") / weightCol.cast("long").cast("double")).as("priority"))
    val win = Window.partitionBy(col("grp"))
      .orderBy(col("priority").asc, col("doc_id").asc)
    scored.withColumn("rk", row_number().over(win))
      .filter(col("rk") <= k)
  }

  /** DETERMINISTIC SOURCE INTERLEAVE — the anti-clumping reorder a
    * data loader wants: documents of one source spread evenly through
    * the epoch instead of arriving in blocks (clumped batches bias
    * gradients toward one domain at a time). Position =
    * within-source rank × n_sources + source index — a pure integer
    * permutation, reproducible across rebuilds, no RNG. Sources of
    * unequal size stay evenly spread at stride n_sources until they
    * run out.
    *
    * Scale shape: one window per source (rank) + one projection —
    * the shuffle keys are (source), never text.
    *
    * @param srcIdxCol integer source index in [0, nSources) */
  def interleaveBySource(df: DataFrame, idCol: Column,
                         srcIdxCol: Column, nSources: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(idCol.as("doc_id"), srcIdxCol.as("__si"))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("__si")).orderBy(col("doc_id"))))
      .select(col("doc_id"),
        ((col("__r") - 1) * nSources + col("__si")).cast("long").as("position"))
  }

  /** SOURCE-RUN AUDIT of any ordering: per source, the LONGEST run of
    * consecutive positions occupied by that source (islands over the
    * global sequence) — the clumping measure [[interleaveBySource]]
    * exists to minimize. A well-interleaved epoch reads max_run = 1
    * everywhere; a source-sorted epoch reads max_run = |source|.
    *
    * Positions must be DISTINCT (any ordering worth auditing is a
    * permutation; with ties the island construction has no defined
    * answer regardless of engine).
    *
    * Scale shape (round-19 verdict #2): the global sequence number is
    * NOT a global `Window.orderBy` — that plans a single-partition
    * WindowExec draining the whole epoch-grain frame through one
    * reducer at 100 TB. Ranks of distinct positions are a running
    * count of 1s, so [[graft.operators.PrefixSum.runningTotal]]'s
    * bucketed two-level scan applies verbatim: intra-bucket windows
    * run in parallel, the only unpartitioned frame is over the
    * ~≤65k bucket TOTALS, and the bucket offsets broadcast back. The
    * one driver hop is a single aggregated (min, max) row to size the
    * buckets — the same justified k-scalars pattern as
    * [[domainReweight]]. */
  def sourceRunStats(df: DataFrame, posCol: Column,
                     sourceCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(sourceCol.as("source"), posCol.cast("long").as("__p"))
    // the distinct-positions contract is ENFORCED, not just documented
    // (round-20 advice — ties share __seq under PrefixSum's RANGE frame
    // and would return silently wrong run stats): the count/distinct
    // pair rides the SAME single-row aggregation job the bucket sizing
    // already pays, so the loud guard costs no extra pass.
    val range = base.agg(min(col("__p")).as("lo"), max(col("__p")).as("hi"),
      count(lit(1)).as("n"), count_distinct(col("__p")).as("nd")).head()
    require(range.isNullAt(0) || range.getLong(2) == range.getLong(3),
      s"sourceRunStats: positions must be distinct non-null (a permutation) — " +
        s"got ${if (range.isNullAt(0)) 0L else range.getLong(2)} rows over " +
        s"${if (range.isNullAt(0)) 0L else range.getLong(3)} distinct positions")
    val width =
      if (range.isNullAt(0)) 1L // empty input: any width, result is empty
      else ((range.getLong(1) - range.getLong(0)) / 65536L).max(1L)
    graft.operators.PrefixSum.runningTotal(base, col("__p"), lit(1L), width,
        out = "__seq")
      .withColumn("__grp", col("__seq") - row_number().over(
        Window.partitionBy(col("source")).orderBy(col("__seq"))))
      .groupBy(col("source"), col("__grp"))
      .agg(count(lit(1)).as("__run"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_runs"), max(col("__run")).as("max_run"),
        sum(col("__run")).as("n"))
  }
}
