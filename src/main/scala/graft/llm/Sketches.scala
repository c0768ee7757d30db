package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.operators.Materialize

/** Deterministic, engine-portable sketches.
  *
  * Spark's built-in sketches (HLL++ `approx_count_distinct`,
  * `approx_percentile`) are fast but implementation-defined — two
  * engines (or two Spark versions) produce different estimates, so
  * they cannot be value-checked across engines. The KMV
  * (k-minimum-values) sketch is the portable alternative: built
  * ONLY from the portable 60-bit hash and order statistics, any
  * engine computes the bit-identical estimate. Reference precedent
  * for content-hash toolkits:
  * debezium-server-eventhubs/.../HashFunction.java:18-63.
  *
  * Estimator (Bar-Yossef et al., "Counting distinct elements in a
  * data stream", RANDOM 2002): with hashes uniform on [0, M), the
  * k-th smallest distinct hash h_(k) estimates the distinct count as
  *   D ≈ (k−1) · M / h_(k)
  * Error ~ 1/√k (k=256 → ~6%). Both factors are exactly-representable
  * doubles (M = 2^60 is a power of two), so the estimate is one IEEE
  * multiply + divide — deterministic everywhere.
  *
  * Scale shape: distinct() shuffles FIXED-WIDTH 8-byte hashes (never
  * the values), then TakeOrdered keeps k rows — the sketch state is
  * k longs no matter how large the corpus; no value ever leaves the
  * scan stage.
  */
object Sketches {

  /** Hash space size of [[Portable.hash64]]: 60 bits. */
  val HashSpace: Double = math.pow(2, 60)

  /** The estimate expression shared by both entry points: exact when
    * fewer than k distinct hashes exist, else the order-statistic
    * formula. */
  private def estimate(k: Int): Column =
    when(col("n_k") < k, col("n_k").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(HashSpace) / col("kth").cast("double"))
      .as("kmv_estimate")

  /** PRODUCTION path — one-row DataFrame with `kmv_estimate` only.
    * One distinct shuffle of 8-byte hashes, then TakeOrdered keeps k
    * rows; the exact count is never computed. This is the entry point
    * a 100 TB pipeline calls. */
  def kmvEstimate(df: DataFrame, valueCol: Column, k: Int = 256): DataFrame = {
    require(k >= 2, "kmv needs k >= 2")
    df.select(Portable.hash64(valueCol).as("h")).distinct()
      .orderBy(col("h")).limit(k)
      .agg(max(col("h")).as("kth"), count(lit(1)).as("n_k"))
      .select(estimate(k))
  }

  /** PRODUCTION path at scale — the same estimate via the native
    * [[graft.functions.KmvSketch]] `TypedImperativeAggregate`: the k
    * smallest distinct hashes accumulate in a bounded tree per
    * partition and only ≤k-entry buffers shuffle (O(partitions·k·8)
    * bytes), where [[kmvEstimate]]'s `distinct()` exchanges EVERY
    * distinct hash. Bit-identical output (same hash, same
    * estimator, same exact-below-k rule — KmvSketchSpec pins the
    * two paths to each other). */
  def kmvEstimateSketch(df: DataFrame, valueCol: Column, k: Int = 256): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    df.select(ColumnBridge.column(
      graft.functions.KmvSketch(
        ColumnBridge.expression(Portable.hash64(valueCol)), k)
        .toAggregateExpression()).as("kmv_estimate"))
  }

  /** VERIFICATION path — one-row DataFrame: (n_exact, kmv_estimate)
    * distinct counts of `valueCol` in `df`. `n_exact` exists to check
    * the sketch against the truth (and to oracle-check the estimator
    * across engines); production pipelines call [[kmvEstimate]] and
    * never pay it. The distinct hash set feeds BOTH the order
    * statistic and the exact count, so it is materialized once
    * (eagerly — the crossJoin schedules both branches concurrently,
    * and a lazy cache lets them race an unfilled cache into double
    * computation, the same rationale as Dedup.connectedComponents);
    * without it this method scanned and shuffled the input twice.
    * The RESULT plan reads the materialized hash set — pass a
    * `tracker` and release after consumption to free its blocks. */
  /** Distributed histogram quantiles per group — the deterministic
    * at-scale alternative to `approx_percentile`/t-digest for
    * bounded scores (quality gates, ratios, normalized losses):
    * values land in `bins` fixed-width buckets over [lo, hi], counts
    * aggregate with map-side combine, and each requested quantile is
    * the first bin whose cumulative count reaches ceil(q·n).
    *
    * Determinism: the only floating-point steps are the bin formula
    * `floor((v − lo)·bins/(hi − lo))` — three IEEE ops in a fixed
    * order — and the threshold `ceil(n·q)`; everything else is exact
    * integer arithmetic, so any engine reproduces the same bins
    * bit-for-bit (t-digest/GK sketches are implementation-defined
    * and cannot be value-checked across engines). The answer is a
    * BIN INDEX (resolution (hi−lo)/bins) — the honest contract: a
    * threshold picked from it is exactly as accurate as the
    * histogram, with none of a sketch's data-dependent error.
    *
    * Scale shape: one scan; ONE shuffle of fixed-width (group, bin)
    * counts (≤ groups·bins rows survive the map-side combine
    * regardless of corpus size); the cumulative window runs on that
    * tiny frame — ≤ `bins` rows per group per task. Returns one row
    * per group: (g, n_docs, <one column per requested quantile>). */
  def histogramQuantiles(df: DataFrame, groupCol: Column, valueCol: Column,
                         lo: Double, hi: Double, bins: Int,
                         qs: Seq[(String, Double)]): DataFrame = {
    require(bins >= 2 && hi > lo && qs.nonEmpty, "need bins >= 2, hi > lo, some quantiles")
    import org.apache.spark.sql.expressions.Window
    val bin = least(greatest(
      floor((valueCol - lit(lo)) * lit(bins.toDouble) / lit(hi - lo)).cast("long"),
      lit(0L)), lit((bins - 1).toLong))
    val counts = df.select(groupCol.as("g"), bin.as("bin"))
      .groupBy(col("g"), col("bin")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("g")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("g"))
    val cum = counts
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
    val qAggs = qs.map { case (name, q) =>
      min(when(col("cum") >=
        ceil(col("n").cast("double") * lit(q)).cast("long"), col("bin"))).as(name)
    }
    cum.groupBy(col("g"))
      .agg(max(col("n")).as("n_docs"), qAggs: _*)
  }

  /** Distributed EXACT per-group quantiles — the order-statistic
    * truth [[histogramQuantiles]] approximates: for each requested q,
    * the element at ascending (value, id) rank ⌈q·n⌉ within its group
    * (percentile_disc semantics with a deterministic tiebreak).
    * `approx_percentile`/t-digest trade exactness for one pass and
    * are implementation-defined; this is exact AND engine-portable,
    * at the cost of a range shuffle.
    *
    * Scale shape: the distributed exact-rank pattern
    * (Curation.keepRankedPerGroup's): ONE range repartition on
    * (group, value, id) materialized once; global rank = broadcast
    * per-(partition, group) offsets + a within-partition row_number —
    * no group ever sorts in a single task. Targets are a
    * groups×quantiles broadcast; survivors are exactly
    * groups×quantiles rows. */
  def exactQuantilesPerGroup(df: DataFrame, groupCol: Column, valueCol: Column,
                             idCol: Column, qs: Seq[(String, Double)],
                             checkpointDir: Option[String] = None,
                             tracker: Option[Materialize.Tracker] = None,
                             numPartitions: Option[Int] = None): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0 && q <= 1 },
      "quantiles must lie in (0, 1]")
    val (globalRanked, totals) = globalRankedByGroup(
      df.select(groupCol.as("__g"), valueCol.as("__v"), idCol.as("__id")),
      checkpointDir, tracker, numPartitions)
    val targets = totals
      .select(col("__g"), col("__n"), explode(array(qs.map { case (name, q) =>
        struct(lit(name).as("q_name"),
          ceil(col("__n").cast("double") * lit(q)).cast("long").as("__target"))
      }: _*)).as("__q"))
      .select(col("__g"), col("__n"), col("__q.q_name").as("q_name"),
              col("__q.__target").as("__target"))
    globalRanked
      .join(broadcast(targets.withColumnRenamed("__g", "__tg")),
        col("__g") === col("__tg") && col("__grank") === col("__target"))
      .select(col("__g").as("g"), col("__n").as("n_rows"),
              col("q_name"), col("__v").as("value"))
  }

  /** PUBLIC distributed per-group ranks — the exact-rank machinery as
    * a first-class operator: every row's 1-based rank within its
    * group under ascending (value, id) order, computed by the range
    * repartition + broadcast-offset scan (no group ever sorts in one
    * task — the shape a plain `row_number` window cannot give when a
    * group outgrows a partition). Returns (g, v, id, rank). */
  def groupRanks(df: DataFrame, groupCol: Column, valueCol: Column,
                 idCol: Column,
                 checkpointDir: Option[String] = None,
                 tracker: Option[Materialize.Tracker] = None,
                 numPartitions: Option[Int] = None): DataFrame = {
    val (globalRanked, _) = globalRankedByGroup(
      df.select(groupCol.as("__g"), valueCol.as("__v"), idCol.as("__id")),
      checkpointDir, tracker, numPartitions)
    globalRanked.select(col("__g").as("g"), col("__v").as("v"),
      col("__id").as("id"), col("__grank").as("rank"))
  }

  /** The shared distributed global-rank scan both quantile forms ride:
    * ONE range repartition on (group, value, id) materialized once (the
    * counts and rank branches must see the SAME partition boundaries —
    * the keepRankedPerGroup rationale), global rank = broadcast
    * per-(partition, group) offsets + a within-partition row_number.
    * Returns (rows with `__g`/`__v`/`__grank`, per-group totals
    * (`__g`, `__n`)). No group ever sorts in a single task. */
  private def globalRankedByGroup(tagged: DataFrame,
                                  checkpointDir: Option[String],
                                  tracker: Option[Materialize.Tracker],
                                  numPartitions: Option[Int]): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val sortKeys = Seq(col("__g"), col("__v").asc, col("__id").asc)
    val rangedInput = numPartitions match {
      case Some(n) => tagged.repartitionByRange(n, sortKeys: _*)
      case None => tagged.repartitionByRange(sortKeys: _*)
    }
    val ranged = Materialize.eagerOrCheckpoint(
      rangedInput.withColumn("__pid", spark_partition_id()), checkpointDir)
    tracker.foreach(_.track(ranged))
    val counts = ranged.groupBy(col("__pid"), col("__g"))
      .agg(count(lit(1)).as("__c"))
    val totals = counts.groupBy(col("__g")).agg(sum(col("__c")).as("__n"))
    val wOff = Window.partitionBy(col("__g")).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__g"), col("__off"))
    val wRank = Window.partitionBy(col("__pid"), col("__g"))
      .orderBy(col("__v").asc, col("__id").asc)
    val globalRanked = ranged
      .withColumn("__rank", row_number().over(wRank))
      .join(broadcast(offsets), Seq("__pid", "__g"))
      .withColumn("__grank", col("__off") + col("__rank"))
    (globalRanked, totals)
  }

  /** Distributed exact INTERPOLATED per-group quantiles —
    * percentile_cont to [[exactQuantilesPerGroup]]'s percentile_disc:
    * for each q the value at fractional 0-indexed position
    * p = q·(n−1), linearly interpolated between the neighboring order
    * statistics as `v_lo + (v_hi − v_lo)·frac` (the SQL-standard
    * definition, stated EXPLICITLY so the oracle can replay the
    * identical IEEE expression rather than trusting an engine
    * builtin's internal rounding). Values are continuous → the result
    * is DOUBLE by contract.
    *
    * Scale shape: identical to the disc form — one range repartition
    * materialized once, broadcast per-(partition, group) offsets +
    * within-partition row_number for the global rank, and a
    * groups×quantiles×2 broadcast of target ranks (each quantile
    * fetches its floor and ceil neighbors; frac = 0 degenerates both
    * to the same row). No group ever sorts in a single task. */
  def exactQuantilesContPerGroup(df: DataFrame, groupCol: Column, valueCol: Column,
                                 idCol: Column, qs: Seq[(String, Double)],
                                 checkpointDir: Option[String] = None,
                                 tracker: Option[Materialize.Tracker] = None,
                                 numPartitions: Option[Int] = None): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 0 && q <= 1 },
      "quantiles must lie in [0, 1]")
    val (globalRanked, totals) = globalRankedByGroup(
      df.select(groupCol.as("__g"), valueCol.cast("double").as("__v"),
        idCol.as("__id")),
      checkpointDir, tracker, numPartitions)
    // two target ranks per quantile: the 1-indexed floor neighbor and
    // (when frac > 0) its successor, with the interpolation fraction
    val targets = totals
      .select(col("__g"), col("__n"), explode(array(qs.map { case (name, q) =>
        val p = lit(q) * (col("__n") - 1).cast("double")
        val loRank = floor(p).cast("long") + 1
        val frac = p - floor(p)
        struct(lit(name).as("q_name"), frac.as("__frac"),
          loRank.as("__lo"),
          (loRank + when(frac > 0, 1L).otherwise(0L)).as("__hi"))
      }: _*)).as("__q"))
      .select(col("__g"), col("__n"), col("__q.q_name").as("q_name"),
              col("__q.__frac").as("__frac"), col("__q.__lo").as("__lo"),
              col("__q.__hi").as("__hi"))
    globalRanked
      .join(broadcast(targets.withColumnRenamed("__g", "__tg")),
        col("__g") === col("__tg") &&
          (col("__grank") === col("__lo") || col("__grank") === col("__hi")))
      .groupBy(col("__g"), col("__n"), col("q_name"), col("__frac"))
      .agg(max(when(col("__grank") === col("__lo"), col("__v"))).as("__vlo"),
           max(when(col("__grank") === col("__hi"), col("__v"))).as("__vhi"))
      .select(col("__g").as("g"), col("__n").as("n_rows"), col("q_name"),
        (col("__vlo") + (col("__vhi") - col("__vlo")) * col("__frac")).as("value"))
  }

  /** Count-Min frequency sketch of a value stream as ONE aggregation
    * ([[graft.functions.CmsSketch]]): the depth×width counter matrix
    * as a flat array<long> column — 8·d·w bytes per partition into
    * the merge regardless of corpus size, where exact counting
    * shuffles the vocabulary. Values hash through
    * [[Portable.hash64]]→baseHash31 (the portable family), so the
    * counters are deterministic integers. */
  def cmsSketch(df: DataFrame, valueCol: Column,
                depth: Int = 4, width: Int = 256): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    df.select(Portable.baseHash31(valueCol).as("__h"))
      .select(ColumnBridge.column(graft.functions.CmsSketch(
        ColumnBridge.expression(col("__h")), depth, width, 0, 0)
        .toAggregateExpression()).as("cms"))
  }

  /** HyperLogLog registers of a column, optionally grouped — the
    * cardinality sketch beside [[cmsSketch]] (frequencies) and
    * [[kmvDistinct]] (order statistics): a FIXED m-long register
    * array per group whatever the corpus size, merged element-wise
    * max. Registers are deterministic integers over the portable
    * hash ([[graft.functions.HllSketch]]'s contract), so an oracle
    * replays them exactly with `max(55 - len(bin(h // m)))` per
    * (group, h % m) bucket. */
  def hllSketch(df: DataFrame, groupCols: Seq[Column], valueCol: Column,
                m: Int = 64): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val hashed = df.select(groupCols :+ Portable.hash64(valueCol).as("__h"): _*)
    val agg = ColumnBridge.column(graft.functions.HllSketch(
      ColumnBridge.expression(col("__h")), m, 0, 0)
      .toAggregateExpression()).as("hll")
    if (groupCols.isEmpty) hashed.agg(agg)
    else hashed.groupBy(hashed.columns.init.map(col): _*).agg(agg)
  }

  /** [[hllSketch]] over an ALREADY-[[Portable.hash64]]-hashed column —
    * for callers that also need the hash for other consumers (an exact
    * distinct count, a join) and must not pay the md5 pass twice.
    * Registers are identical to [[hllSketch]] of the raw values by
    * construction (the aggregate's input contract IS the hashed
    * value). */
  def hllSketchHashed(df: DataFrame, groupCols: Seq[Column], hashCol: Column,
                      m: Int = 64): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val hashed = df.select(groupCols :+ hashCol.as("__h"): _*)
    val agg = ColumnBridge.column(graft.functions.HllSketch(
      ColumnBridge.expression(col("__h")), m, 0, 0)
      .toAggregateExpression()).as("hll")
    if (groupCols.isEmpty) hashed.agg(agg)
    else hashed.groupBy(hashed.columns.init.map(col): _*).agg(agg)
  }

  /** RAW HyperLogLog estimate off a register array — pure Column
    * algebra with CROSS-ENGINE EXACT arithmetic: every term
    * 1 / 2^register is an exact power of two, and the 64 terms sum
    * as one explicit left-associated chain (identical IEEE sequence
    * in any engine that writes the same chain — no list-reduction
    * order ambiguity). The small-range linear-counting correction
    * needs `ln` (libm, not portable) and lives JVM-side in
    * [[graft.functions.HllSketch.estimate]]; oracles compare the raw
    * estimate plus the zero-register count instead. */
  def hllRawEstimate(regs: Column, m: Int = 64): Column = {
    val terms: Seq[Column] = (1 to m).map(i =>
      lit(1.0) / call_function("shiftleft", lit(1L),
        element_at(regs, i).cast("int")).cast("double"))
    val invSum = terms.reduce(_ + _)
    lit(graft.functions.HllSketch.alpha(m)) * lit(m.toDouble) * lit(m.toDouble) / invSum
  }

  /** Zero-register count of a [[hllSketch]] array — the other input
    * the linear-counting correction branch reads. */
  def hllZeroRegisters(regs: Column): Column =
    size(filter(regs, r => r === 0L)).cast("long")

  /** Point frequency estimate off a [[cmsSketch]] array — pure Column
    * algebra (no UDF): the MINIMUM over the depth rows of the
    * counter each row's universal hash selects for `keyHash`
    * (`Portable.baseHash31` of the key — the SAME hash the sketch
    * updated with). Always ≥ the true count; deterministic, so an
    * oracle can replay every estimate as the collision-bucket sum
    * over exact counts. */
  def cmsEstimate(sketch: Column, keyHash: Column,
                  depth: Int = 4, width: Int = 256): Column =
    least((0 until depth).map { i =>
      val (a, b) = Portable.universalCoeffs(i)
      element_at(sketch,
        (lit(i * width) +
          ((keyHash * lit(a) + lit(b)) % lit(Portable.UniversalP)) % lit(width)
          + 1).cast("int"))
    }: _*)

  def kmvDistinct(df: DataFrame, valueCol: Column, k: Int = 256,
                  tracker: Option[Materialize.Tracker] = None): DataFrame = {
    require(k >= 2, "kmv needs k >= 2")
    // one distinct shuffle, then ONE global aggregation computes both
    // answers: the exact count and the native KmvSketch order
    // statistic (bit-identical to the order-by-limit form —
    // KmvSketchSpec). The earlier two-branch shape (TakeOrdered +
    // count over an eagerly-materialized hash set, crossJoined) paid
    // a localCheckpoint write/read of every distinct hash plus a sort
    // — measured ~25% slower at sf0.1, and its materialization cost
    // grows with the distinct set where this stays one streaming agg.
    // `tracker` is retained for API stability; nothing is
    // materialized anymore, so there is nothing to track.
    import org.apache.spark.sql.graft.ColumnBridge
    df.select(Portable.hash64(valueCol).as("h")).distinct()
      .agg(count(lit(1)).as("n_exact"),
        ColumnBridge.column(graft.functions.KmvSketch(
          ColumnBridge.expression(col("h")), k)
          .toAggregateExpression()).as("kmv_estimate"))
  }

  /** DuckDB rendering of [[kmvDistinct]] over a SQL fragment yielding
    * one value per row — same hash, same order statistic, same two
    * IEEE ops. */
  def duckKmvDistinct(fromClause: String, valueExpr: String, k: Int = 256): String =
    s"""WITH hs AS (SELECT DISTINCT ${Portable.duckHash64(valueExpr)} AS h FROM $fromClause),
       |km AS (SELECT max(h) AS kth, count(*) AS n_k FROM (SELECT h FROM hs ORDER BY h LIMIT $k) t),
       |ex AS (SELECT count(*) AS n_exact FROM hs)
       |SELECT n_exact,
       |       CASE WHEN n_k < $k THEN CAST(n_k AS DOUBLE)
       |            ELSE CAST(${(k - 1).toDouble} AS DOUBLE) * ${HashSpace} / CAST(kth AS DOUBLE)
       |       END AS kmv_estimate
       |FROM km CROSS JOIN ex""".stripMargin

  /** Cross-group distinct-overlap estimation from per-group KMV
    * sketches (Beyer et al., "On synopses for distinct-value
    * estimation under multiset operations", SIGMOD 2007): for every
    * group pair (a, b) with a < b, estimate the Jaccard similarity and
    * the intersection cardinality of their distinct `valueCol` sets —
    * WITHOUT ever joining the two corpora. The companion to
    * [[graft.llm.Dedup.sourceOverlap]]'s exact containment: that pays
    * a shuffle of every distinct shingle hash; this reduces each group
    * to k longs first, so comparing two 100 TB corpora costs two scans
    * plus an O(groups²·k) driver-sized combine.
    *
    * Estimator: with K_g = the k smallest distinct hashes of group g,
    * the union sketch U = the k smallest of K_a ∪ K_b is a valid KMV
    * sketch of A ∪ B, so D_∪ ≈ (k−1)·M / max(U) (exact when |U| < k —
    * then every group kept ALL its hashes). ρ = |{h ∈ U : h ∈ K_a ∧
    * h ∈ K_b}| / |U| estimates Jaccard, and ρ·D_∪ the intersection.
    * All order statistics of the portable hash → any engine reproduces
    * the estimates bit-for-bit.
    *
    * Scale shape: ONE hash aggregate — the native
    * [[graft.functions.KmvValues]] buffer keeps each group's k
    * smallest distinct hashes in a bounded tree per partition, so the
    * shuffle is O(groups · partitions · k · 8 bytes) and nothing is
    * ever globally distinct'd, ranked, or sorted (an earlier
    * formulation paid a corpus-wide distinct + the range-rank
    * machinery for the same ≤k values — measured 3.8 s in-suite vs
    * 2.6 s isolated-cold after, at sf0.1; the md5 over every shingle
    * is now the floor, same as llm39). Everything after operates on a
    * ≤groups-row frame — the pair combine is trivially broadcast.
    * The OUTPUT is all ordered pairs: groups²/2 rows × O(k²)
    * membership checks each — built for the source/domain dimension
    * (tens to hundreds); for thousands of groups, pre-filter the
    * pair set before combining. */
  def kmvOverlap(df: DataFrame, groupCol: Column, valueCol: Column,
                 k: Int = 256): DataFrame = {
    require(k >= 2, "kmv needs k >= 2")
    import org.apache.spark.sql.graft.ColumnBridge
    val sk = df.select(groupCol.as("src"), Portable.hash64(valueCol).as("h"))
      .groupBy(col("src"))
      .agg(ColumnBridge.column(
        graft.functions.KmvValues(ColumnBridge.expression(col("h")), k)
          .toAggregateExpression()).as("kmv"))
    val pairs = sk.as("a").join(sk.as("b"), col("a.src") < col("b.src"))
      .select(col("a.src").as("source_a"), col("b.src").as("source_b"),
              col("a.kmv").as("ka"), col("b.kmv").as("kb"))
      .withColumn("u", slice(array_sort(array_union(col("ka"), col("kb"))), 1, k))
    val withEst = pairs
      .withColumn("k_used", size(col("u")).cast("long"))
      .withColumn("d_union_est",
        when(col("k_used") < k, col("k_used").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
            element_at(col("u"), size(col("u"))).cast("double")))
      .withColumn("jaccard_est",
        size(filter(col("u"), x =>
          array_contains(col("ka"), x) && array_contains(col("kb"), x)))
          .cast("double") / col("k_used").cast("double"))
      .withColumn("intersect_est", col("jaccard_est") * col("d_union_est"))
    withEst.select(col("source_a"), col("source_b"), col("k_used"),
      col("d_union_est"), col("jaccard_est"), col("intersect_est"))
  }

  /** DIRECTIONAL KMV containment — the train×eval CONTAMINATION MATRIX
    * at sketch grain: for every (train group, eval set) pair, the
    * estimated fraction of the eval set's distinct values present in
    * the train group (|T ∩ E| / |E| — [[kmvOverlap]]'s symmetric
    * Jaccard is the wrong quantity here: a 100-question benchmark
    * fully memorized inside a billion-document source has Jaccard
    * ≈ 0 but containment 1.0, and containment is what decides whether
    * an eval number is trustworthy). Same estimator algebra as
    * [[kmvOverlap]] — union sketch → D_∪ and intersection ρ·D_∪ —
    * with the denominator taken from the EVAL side's own sketch
    * (exact |E| when the benchmark is smaller than k, the usual case;
    * the k-th order statistic otherwise). llm16/llm50 are the
    * row-grain decontamination scrubs; this is the constant-state
    * monitoring matrix a pipeline recomputes per snapshot: two scans
    * (each side reduced to k longs per group by the native
    * [[graft.functions.KmvValues]] aggregate), then an O(trains ×
    * evals × k²) combine over a broadcast-sized frame — no corpus
    * join, no corpus shuffle, at any corpus size. */
  def kmvContainment(train: DataFrame, trainGroup: Column, trainValue: Column,
                     eval: DataFrame, evalGroup: Column, evalValue: Column,
                     k: Int = 256): DataFrame = {
    require(k >= 2, "kmv needs k >= 2")
    import org.apache.spark.sql.graft.ColumnBridge
    def sketch(df: DataFrame, g: Column, v: Column, out: String) =
      df.select(g.as(out), Portable.hash64(v).as("h"))
        .groupBy(col(out))
        .agg(ColumnBridge.column(
          graft.functions.KmvValues(ColumnBridge.expression(col("h")), k)
            .toAggregateExpression()).as(s"kmv_$out"))
    val skT = sketch(train, trainGroup, trainValue, "train_source")
    val skE = sketch(eval, evalGroup, evalValue, "eval_name")
    val pairs = skT.crossJoin(broadcast(skE))
      .select(col("train_source"), col("eval_name"),
        col("kmv_train_source").as("ka"), col("kmv_eval_name").as("kb"))
      .withColumn("u", slice(array_sort(array_union(col("ka"), col("kb"))), 1, k))
    pairs
      .withColumn("k_used", size(col("u")).cast("long"))
      .withColumn("d_union_est",
        when(col("k_used") < k, col("k_used").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
            element_at(col("u"), size(col("u"))).cast("double")))
      .withColumn("intersect_est",
        size(filter(col("u"), x =>
          array_contains(col("ka"), x) && array_contains(col("kb"), x)))
          .cast("double") / col("k_used").cast("double") * col("d_union_est"))
      .withColumn("d_eval_est",
        when(size(col("kb")) < k, size(col("kb")).cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
            element_at(col("kb"), size(col("kb"))).cast("double")))
      // clamp: in the estimated (>k) regime intersect_est can exceed
      // d_eval_est (independent order-statistic estimates), and a
      // "fraction" above 1.0 misleads downstream gates — containment
      // is by definition ≤ 1 (round-17 advice; oracle mirrors the
      // clamp so the replay stays bit-identical)
      .withColumn("containment_est",
        least(lit(1.0), col("intersect_est") / col("d_eval_est")))
      .select(col("train_source"), col("eval_name"), col("k_used"),
        col("intersect_est"), col("d_eval_est"), col("containment_est"))
  }

  /** Collect per-group KMV value sketches to the driver — the bounded
    * hop that feeds [[kmvContainment]]'s continuous twin
    * ([[graft.streaming.StreamingOps.kmvContainmentStream]]): the
    * frame is ≤ groups rows of ≤ k longs (kilobytes for the eval
    * dimension — benchmarks number in the tens), the same k-sized
    * driver hop as k-means' centroids. Arrays come back ascending
    * (TreeSet order) — the order [[containmentEst]] requires. */
  def kmvSketches(df: DataFrame, groupCol: Column, valueCol: Column,
                  k: Int = 256): Seq[(String, Array[Long])] = {
    require(k >= 2, "kmv needs k >= 2")
    import org.apache.spark.sql.graft.ColumnBridge
    df.select(groupCol.as("g"), Portable.hash64(valueCol).as("h"))
      .groupBy(col("g"))
      .agg(ColumnBridge.column(
        graft.functions.KmvValues(ColumnBridge.expression(col("h")), k)
          .toAggregateExpression()).as("kmv"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toArray)
      .toSeq
  }

  /** JVM mirror of [[kmvContainment]]'s estimator algebra, for state
    * code that holds the sketches as plain arrays (the streaming
    * monitor's flatMapGroupsWithState). BOTH inputs must be ascending
    * ≤k-entry KMV sketches over [[Portable.hash64]] values (TreeSet
    * order — what [[graft.functions.KmvValues]] emits). Returns
    * (k_used, intersect_est, d_eval_est, containment_est), bit-equal
    * to the Column path: u = first k of the sorted distinct union,
    * D_∪ exact below k else (k−1)·2^60/u.last, ρ = |u ∩ ka ∩ kb|/|u|,
    * directional denominator from the eval sketch, clamped to 1. */
  def containmentEst(ka: Array[Long], kb: Array[Long], k: Int):
      (Long, Double, Double, Double) = {
    // merge two ascending arrays into the ascending distinct union,
    // keeping at most k entries — the slice(array_sort(array_union))
    val u = new Array[Long](math.min(ka.length + kb.length, k))
    var (i, j, n) = (0, 0, 0)
    var last = 0L
    var haveLast = false
    while (n < k && (i < ka.length || j < kb.length)) {
      val v =
        if (i >= ka.length) { val x = kb(j); j += 1; x }
        else if (j >= kb.length) { val x = ka(i); i += 1; x }
        else if (ka(i) <= kb(j)) { val x = ka(i); i += 1; x }
        else { val x = kb(j); j += 1; x }
      if (!haveLast || v != last) { u(n) = v; n += 1; last = v; haveLast = true }
    }
    val kUsed = n.toLong
    def contains(arr: Array[Long], v: Long): Boolean =
      java.util.Arrays.binarySearch(arr, v) >= 0
    val dUnion =
      if (n < k) n.toDouble
      else (k - 1).toDouble * HashSpace / u(n - 1).toDouble
    var both = 0
    var x = 0
    while (x < n) { if (contains(ka, u(x)) && contains(kb, u(x))) both += 1; x += 1 }
    val intersectEst = both.toDouble / kUsed.toDouble * dUnion
    val dEval =
      if (kb.length < k) kb.length.toDouble
      else (k - 1).toDouble * HashSpace / kb(kb.length - 1).toDouble
    (kUsed, intersectEst, dEval, math.min(1.0, intersectEst / dEval))
  }
}
