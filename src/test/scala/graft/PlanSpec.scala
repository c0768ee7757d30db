package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Physical-plan audits: the catalog queries must produce the plans
  * they claim (pushdown, pruning, broadcast, TakeOrdered, WSCG) — a
  * regression here is a scale bug even while results stay correct.
  * Runs on sf0.001 (plans, not data, are under test).
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: DataFrame): SparkPlan = {
    df.collect() // materialize so AQE finalizes the adaptive plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }
  private def planString(name: String): String = {
    val df = Queries.byName(name)(spark, sfSmoke)
    val p = planOf(df)
    p.toString
  }

  test("q02: filter pushes into the parquet scan and only 5 columns are read") {
    val s = planString("q02_filter_project")
    assert(s.contains("PushedFilters: [IsNotNull(l_shipdate)") || s.contains("PushedFilters: [*IsNotNull"),
      s"expected pushed filters in:\n$s")
    // projection pruning: ReadSchema carries the 4 selected + filter columns, not all 16
    val readSchema = s.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_comment"),
      s"expected pruned ReadSchema, got: $readSchema")
  }

  test("q03: small dimension joins broadcast; no shuffle of nation") {
    val s = planString("q03_join_revenue_by_nation")
    assert(s.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$s")
  }

  test("q04: top-k plans TakeOrderedAndProject, not a global sort") {
    val s = planString("q04_topk_orders")
    assert(s.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject in:\n$s")
  }

  test("q01: aggregation is two-phase (partial then final) — map-side combine") {
    val s = planString("q01_agg_pricing_summary")
    assert(s.contains("partial_sum") || "HashAggregate".r.findAllIn(s).size >= 2,
      s"expected partial+final aggregates in:\n$s")
  }

  test("llm02: text stats is a single scan with zero shuffles") {
    val df = Queries.byName("llm02_text_stats")(spark, sfSmoke)
    val p = planOf(df)
    // recurse into AQE stages (a plain collect sees zero and proves
    // nothing); only the final orderBy may shuffle — the stats must not
    val shuffles = shufflePartitionings(p)
    assert(shuffles.size <= 1, s"expected at most the sort shuffle, got $shuffles:\n$p")
  }

  test("llm37/llm38: quality gates are single scans with zero shuffles beyond the sort") {
    Seq("llm37_gopher_rules", "llm38_c4_line_clean").foreach { name =>
      val df = Queries.byName(name)(spark, sfSmoke)
      val p = planOf(df)
      val shuffles = shufflePartitionings(p)
      assert(shuffles.size <= 1, s"$name: expected at most the sort shuffle, got $shuffles:\n$p")
    }
  }

  test("llm04: LSH signature contains no md5 on the scan path") {
    val df = Queries.byName("llm04_lsh_ann")(spark, sfSmoke)
    // the signature must be literal-array arithmetic; md5 would show as
    // an expression in the plan tree
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.toLowerCase.contains("md5"),
      "hyperplane hashing leaked into the per-row plan")
  }

  test("llm05/llm17: minhash runs the position-explode path — no shingle arrays in the plan") {
    // the text fast path must not regress back to building per-doc
    // shingle arrays: array construction + array-explode was ~35% of
    // the signature stage (interpreted higher-order lambdas)
    Seq("llm05_minhash_pairs", "llm17_dedup_clusters").foreach { name =>
      val analyzed = Queries.byName(name)(spark, sfSmoke).queryExecution.analyzed.toString
      assert(!analyzed.contains("array_distinct") && !analyzed.contains("transform("),
        s"$name builds shingle arrays — use minhashSignatureText")
    }
  }

  test("llm09: signatures and the verify set come from one position-explode — no string arrays") {
    // the one-pass shape (minhashSignatureAndSets): no array_distinct /
    // transform building shingle-string arrays anywhere, and the verify
    // sets are 8-byte hashes (collect_set over xxhash64), so nothing
    // heavier than longs shuffles or persists
    val analyzed = Queries.byName("llm09_jaccard_verify")(spark, sfSmoke)
      .queryExecution.analyzed.toString
    assert(!analyzed.contains("array_distinct") && !analyzed.contains("transform("),
      "llm09 builds shingle-string arrays — use minhashSignatureAndSets")
    // signatures + verify set now come from the NATIVE one-pass
    // expression (no explode, no collect_set aggregate): the whole
    // frame is a map-only projection
    assert(analyzed.contains("minhash_sigs"),
      "llm09's signatures+set must come from the native minhash_sigs pass")
    assert(!analyzed.contains("collect_set"),
      "llm09 must not shuffle a collect_set buffer — the native pass builds the set in-row")
  }

  test("llm29: semantic dedup broadcasts the centroids — no cartesian, no centroid shuffle") {
    val df = Queries.byName("llm29_semantic_dedup")(spark, sfSmoke)
    df.collect() // force planning through AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"centroid assignment must broadcast the tiny centroid side:\n$plan")
    // the within-cell pair join is an EQUI join on the cell key — the
    // only non-broadcast join in the plan
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
           plan.contains("BroadcastHashJoin"),
      s"within-cell pairs must join on the cell key:\n$plan")
  }

  test("llm16: decontamination runs the position-explode path and keys joins on 8-byte hashes") {
    val analyzed = Queries.byName("llm16_decontamination")(spark, sfSmoke)
      .queryExecution.analyzed.toString
    assert(!analyzed.contains("array_distinct"),
      "llm16 builds shingle arrays — use contaminationText")
    assert(analyzed.contains("xxhash64"), "shingles must travel as 8-byte hashes")
  }

  test("llm24/llm26: bigram stream is position-exploded and joins key on hashes, not strings") {
    Seq("llm24_bigram_typicality", "llm26_importance_score").foreach { name =>
      val analyzed = Queries.byName(name)(spark, sfSmoke).queryExecution.analyzed.toString
      assert(!analyzed.contains("transform("),
        s"$name builds a bigram struct array — use the position-explode stream")
      assert(analyzed.contains("xxhash64"),
        s"$name must key its count joins on 8-byte hashes")
    }
  }

  test("llm25: query-term filter runs before the tf shuffle; stats broadcast") {
    val df = Queries.byName("llm25_bm25_retrieval")(spark, sfSmoke)
    df.collect()
    val plan = (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    // the one-row corpus stats must arrive via broadcast, never shuffle
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"corpus stats must broadcast:\n$plan")
    // the isin(queryTerms) filter must sit under the first aggregate
    // (pre-shuffle): no Exchange may appear below the filter node
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("IN (spark,join,window)") || analyzed.toLowerCase.contains("__t IN"),
      s"query-term filter missing from the plan:\n$analyzed")
  }

  test("bucketed co-located join is shuffle-free") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft-buckets")
    val orders = Tables.orders(spark, sfSmoke).select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, sfSmoke).select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    graft.operators.Bucketing.writeBucketed(orders, "b_orders", "o_custkey", 4,
      Some(base.resolve("o").toString))
    graft.operators.Bucketing.writeBucketed(customer, "b_customer", "o_custkey", 4,
      Some(base.resolve("c").toString))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    try {
      // at smoke scale the planner would broadcast; force the
      // sort-merge path so the bucketed co-location is observable
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = graft.operators.Bucketing.cooperativeJoin(spark, "b_orders", "b_customer", "o_custkey")
      joined.collect()
      val s = planOf(joined).toString
      assert(!s.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$s")
      assert(s.contains("SortMergeJoin"), s"expected sort-merge over buckets, got:\n$s")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  /** All shuffle partitionings in an (adaptive) plan — AQE wraps every
    * materialized stage (including the final ResultQueryStageExec) in
    * LEAF QueryStageExec nodes, so a plain collect over the final plan
    * sees zero shuffles and proves nothing; recurse into each stage's
    * inner plan. */
  private def shufflePartitionings(p: SparkPlan): Seq[String] =
    p.collect {
      case s: ShuffleExchangeExec => Seq(s.outputPartitioning.toString)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        shufflePartitionings(q.plan)
    }.flatten

  /** Column NAMES entering each exchange — the "what crosses the
    * wire" audit (vs [[shufflePartitionings]]'s "what keys it"). */
  private def shuffleInputs(p: SparkPlan): Seq[String] =
    p.collect {
      case s: ShuffleExchangeExec => s.child.output.map(_.name)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        shuffleInputs(q.plan)
    }.flatten

  /** Like [[shuffleInputs]] but only plan-REQUIRED exchanges
    * (ENSURE_REQUIREMENTS: join/aggregate distribution). Deliberate
    * widening repartitions (REPARTITION_BY_NUM — Dedup.atWidth and the
    * caller-seam widens, round 22) are excluded: they exist precisely
    * to carry a narrow pre-digest projection one hop wider, and are
    * gated off once the scan itself plans enough splits. */
  private def requiredShuffleInputs(p: SparkPlan): Seq[String] =
    p.collect {
      case s: ShuffleExchangeExec
          if s.shuffleOrigin == org.apache.spark.sql.execution.exchange.ENSURE_REQUIREMENTS =>
        s.child.output.map(_.name)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        requiredShuffleInputs(q.plan)
    }.flatten

  test("llm01: exact dedup shuffles on the fixed-width content hash, never the text") {
    val df = Queries.byName("llm01_dedup_exact")(spark, sfSmoke)
    val partitionings = shufflePartitionings(planOf(df))
    // Catalyst aliases the groupBy expression to _groupingexpression —
    // that IS the 8-byte content hash; the raw text column must never
    // be a shuffle key
    assert(partitionings.exists(s =>
      s.contains("content_hash") || s.contains("_groupingexpression")),
      s"expected hash partitioning on the content hash, got: $partitionings")
    assert(!partitionings.exists(_.contains("text#")),
      s"shuffle keys must be the 8-byte hash, not document text: $partitionings")
  }

  test("llm08: banded near-dup is an equi-join on (band, bucket) — no cartesian, no md5") {
    val df = Queries.byName("llm08_embedding_neardup")(spark, sfSmoke)
    val p = planOf(df)
    val s = p.toString
    // the candidate join must be a hash/merge equi-join keyed on the
    // band bucket, never a cross/nested-loop product of the corpus
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s"banded candidate join degenerated to a product:\n$s")
    // hyperplanes are pre-folded literals: no digest on the scan path
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.toLowerCase.contains("md5"),
      "banded hyperplane hashing leaked into the per-row plan")
  }

  test("llm14: hash sampling is a pure scan filter — no shuffle before the sort") {
    val df = Queries.byName("llm14_hash_sampling")(spark, sfSmoke)
    val shuffles = shufflePartitionings(planOf(df))
    // split + stratified filter are row-local Column algebra; only the
    // final orderBy may exchange
    assert(shuffles.size <= 1, s"sampling must not shuffle, got $shuffles")
  }

  test("llm15/llm18: windowed ops shuffle only on their group keys plus the final sort") {
    val packing = Queries.byName("llm15_sequence_packing")(spark, sfSmoke)
    val sPack = shufflePartitionings(planOf(packing))
    // shard window + manifest groupBy + output sort — nothing else
    assert(sPack.size <= 3, s"packing shuffles: $sPack")
    assert(sPack.exists(_.contains("shard")), s"expected a shard-keyed exchange: $sPack")
    val mix = Queries.byName("llm18_budgeted_mix")(spark, sfSmoke)
    val sMix = shufflePartitionings(planOf(mix))
    // round-4 sharded shape: the only FULL-data exchanges are the
    // (group, shard) window — n spillable tasks per source, never one
    // task per source — and the output sort; the (group, shard) totals
    // and their prefix-sum window exchange only #groups × #shards
    // aggregate rows
    assert(sMix.size <= 4, s"mixing shuffles: $sMix")
    val heavy = sMix.filter(s => !s.startsWith("rangepartitioning") && !s.contains("__g"))
    assert(heavy.size == 1 && heavy.head.contains("__shard"),
      s"the full-data exchange must key on (group, shard): $sMix")
  }

  test("q09: as-of is union + window — no join node, one key shuffle plus the output sort") {
    val df = Queries.byName("q09_asof_join")(spark, sfSmoke)
    val p = planOf(df)
    val s = p.toString
    // TemporalJoin.asOf's whole scale claim: the enrichment never
    // plans a join of any kind (no candidate-pair explosion possible)
    assert(!s.contains("Join"), s"asOf must not plan a join:\n$s")
    val shuffles = shufflePartitionings(p)
    val hash = shuffles.filterNot(_.startsWith("rangepartitioning"))
    assert(hash.size == 1 && hash.head.contains("user_id"),
      s"expected exactly ONE hash shuffle on the as-of key (plus the output sort), got: $shuffles")
  }

  test("q10: point-in-range plans an EQUI join on (key, time bin) — never a nested-loop product") {
    val df = Queries.byName("q10_range_join")(spark, sfSmoke)
    // the bin must be an equi-join key in the optimized plan — that is
    // what keeps the inequality join off the BroadcastNestedLoopJoin path
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("__bin"), s"expected the time bin as an equi-join key in:\n$opt")
    val s = planOf(df).toString
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"range join degenerated to a product:\n$s")
    assert(s.contains("BroadcastHashJoin") || s.contains("SortMergeJoin")
        || s.contains("ShuffledHashJoin"),
      s"expected a hash/merge equi-join in:\n$s")
  }

  test("llm23: per-source rank never sorts a whole group in one task") {
    val df = Queries.byName("llm23_quality_gate_per_source")(spark, sfSmoke)
    val p = planOf(df)
    // the full-data window must partition by (__pid, __g) — a window
    // partitioned by the group alone is the single-task-per-source sort
    // the distributed rank exists to avoid
    val s = p.toString
    val windowSpecs = s.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    // the rank window is the only one ordering by __score; it must be
    // partitioned by __pid too (the offsets window runs on the tiny
    // per-(partition, group) counts frame and is exempt)
    assert(windowSpecs.exists(w => w.contains("__score") && w.contains("__pid")),
      s"expected a (__pid, __g)-partitioned rank window, got:\n${windowSpecs.mkString("\n")}")
    assert(!windowSpecs.exists(w => w.contains("__score") && !w.contains("__pid")),
      s"a full-data window partitioned by the bare group key survived:\n${windowSpecs.mkString("\n")}")
  }

  test("llm30: k-means assignment is a map-side pass — no join anywhere, one agg shuffle per update") {
    val df = Queries.byName("llm30_kmeans_topics")(spark, sfSmoke)
    val p = planOf(df)
    val s = p.toString
    // the returned frame is the FINAL assignment: centroids ride the
    // NearestCentroid literal matrix, so no join node may exist and the
    // only exchange is the output sort
    assert(!s.contains("Join"), s"k-means assignment must not plan a join:\n$s")
    assert(s.toLowerCase.contains("nearestcentroid"),
      s"assignment must run through the native expression:\n$s")
    val shuffles = shufflePartitionings(p)
    assert(shuffles.size <= 1, s"expected only the output sort exchange, got $shuffles")
  }

  test("llm31: sliding spans travel as 8-byte hashes — no string shuffle keys") {
    val df = Queries.byName("llm31_span_dup_stats")(spark, sfSmoke)
    val shuffles = shufflePartitionings(planOf(df))
    assert(shuffles.nonEmpty, "span dup stats must aggregate somewhere")
    assert(!shuffles.exists(s => s.contains("text#") || s.contains("span")),
      s"shuffle keys must be the span hash / doc id, never strings: $shuffles")
  }

  test("llm32: quantile shuffles carry only (group,bin) counts; llm34 chunking shuffles only the sort") {
    val q32 = Queries.byName("llm32_quality_quantiles")(spark, sfSmoke)
    val s32 = shufflePartitionings(planOf(q32))
    // (g,bin) count agg + the per-group window + the output sort — the
    // full corpus never moves (the count agg is map-side combined)
    assert(s32.size <= 3, s"quantile shuffles: $s32")
    assert(!s32.exists(_.contains("text#")), s"document text must never shuffle: $s32")

    val q34 = Queries.byName("llm34_chunk_windows")(spark, sfSmoke)
    val s34 = shufflePartitionings(planOf(q34))
    // chunking is a pure scan transform: only the output sort exchanges
    assert(s34.forall(_.startsWith("rangepartitioning")),
      s"chunking must not shuffle before the sort: $s34")
  }

  test("llm33: incremental dedup anti-join and group share the content-hash key; text never shuffles") {
    val df = Queries.byName("llm33_incremental_dedup")(spark, sfSmoke)
    val shuffles = shufflePartitionings(planOf(df))
    assert(!shuffles.exists(_.contains("text#")),
      s"shuffle keys must be the 8-byte hash, never text: $shuffles")
    assert(shuffles.exists(s => s.contains("content_hash") || s.contains("_groupingexpression")),
      s"expected a content-hash-keyed exchange: $shuffles")
  }

  test("cdc07: the CDC path scans through the DSv2 source") {
    val s = planString("cdc07_cdc_source_replay")
    assert(s.contains("BatchScan") && s.contains("graft-cdc"),
      s"expected a DSv2 BatchScan of graft-cdc in:\n$s")
  }

  test("llm47: overlap sketches aggregate objects — no corpus-wide distinct, no rank windows") {
    val s = planString("llm47_kmv_overlap")
    assert(s.contains("ObjectHashAggregate"),
      s"KmvValues must aggregate via ObjectHashAggregate:\n$s")
    assert(!s.contains("Window"),
      s"the k-smallest selection must not use rank windows:\n$s")
  }

  test("llm48: re-rank touches raw vectors only through a BROADCAST semi-join of the shortlist") {
    val s = planString("llm48_pq_rerank")
    assert(s.contains("BroadcastHashJoin") && s.contains("LeftSemi"),
      s"shortlist must broadcast-semi-join, got:\n$s")
    assert(s.contains("TakeOrderedAndProject"),
      s"final top-k must be TakeOrderedAndProject:\n$s")
    assert(!s.contains("SortMergeJoin"),
      s"raw vectors must never shuffle for the re-rank:\n$s")
  }

  test("llm51: weights join broadcast on both steps; gradient is a hash aggregate") {
    val s = planString("llm51_perceptron_train")
    assert(s.contains("BroadcastHashJoin"), s"weight join must broadcast:\n$s")
    assert(s.contains("HashAggregate"), s"gradient must hash-aggregate:\n$s")
  }

  test("llm40: PQ ADC scan is shuffle-free map + TakeOrderedAndProject — no join, no sort") {
    val df = Queries.byName("llm40_pq_ann")(spark, sfSmoke)
    val p = planOf(df)
    val s = p.toString
    assert(s.contains("TakeOrderedAndProject"),
      s"top-k must plan as TakeOrderedAndProject:\n$s")
    assert(!s.contains("Join"), s"ADC must be a lookup-table map, not a join:\n$s")
    assert(shufflePartitionings(p).isEmpty,
      s"encode+ADC is map-only; got shuffles: ${shufflePartitionings(p)}")
  }

  test("cdc13: transaction enrich stacks both windows on ONE tx-id exchange") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfSmoke)
      .withColumn("destination", concat(lit("t."), col("event_type")))
    val df = graft.operators.TransactionMetadata.enrich(
      ev, col("user_id"), col("destination"), Seq(col("ts"), col("event_id")))
    val shuffles = shufflePartitionings(planOf(df))
    // tx-id clustering already co-locates (tx id, destination): the
    // second window must reuse the first window's exchange
    assert(shuffles.size == 1, s"expected one exchange, got $shuffles")
    assert(shuffles.head.contains("user_id"),
      s"expected hash partitioning on the tx id, got: $shuffles")
  }

  test("q11: rollup evaluates every grouping set in ONE Expand+aggregate pass") {
    val s = planString("q11_grouping_sets")
    assert(s.contains("Expand"), s"expected Expand for grouping sets in:\n$s")
    // one scan of lineitem — levels never rescan
    assert("Scan parquet".r.findAllIn(s).size == 1,
      s"rollup must scan once, plan:\n$s")
  }

  test("q15: unpivot rotates in ONE Expand pass — the table is scanned once, not once per measure") {
    val s = planString("q15_unpivot")
    assert(s.contains("Expand"), s"expected Expand for unpivot in:\n$s")
    assert("Scan parquet".r.findAllIn(s).size == 1,
      s"unpivot must scan once, plan:\n$s")
    assert(!s.contains("Union"), s"unpivot must not plan self-unions:\n$s")
  }

  test("q13: the correlated subquery decorrelates into an aggregate + join, not a rescan per row") {
    val s = planString("q13_correlated_subquery")
    assert(s.contains("HashAggregate"), s"expected decorrelated aggregate in:\n$s")
    assert(s.contains("Join"), s"expected a join after decorrelation in:\n$s")
    // two scans total (outer + the grouped subquery) — NOT one per row
    assert("Scan parquet".r.findAllIn(s).size <= 2,
      s"decorrelation must cap scans at 2, plan:\n$s")
  }

  test("q14: all window frames stack on one custkey exchange + one sort") {
    val p = planOf(Queries.byName("q14_window_frames")(spark, sfSmoke))
    val shuffles = shufflePartitionings(p)
    val hashShuffles = shuffles.filterNot(_.contains("rangepartitioning"))
    assert(hashShuffles.size == 1,
      s"expected the frames to share one hash exchange, got: $shuffles")
    assert("Window".r.findAllIn(p.toString).nonEmpty)
  }

  test("llm39: source overlap is codegen'd hash aggregation — no object agg, no self-join of shingles") {
    val s = planString("llm39_source_overlap")
    assert(!s.contains("ObjectHashAggregate") && !s.contains("SortAggregate"),
      s"bitmask bit_or must stay in HashAggregate:\n$s")
    assert(s.contains("bit_or"), s"expected bit_or aggregate in:\n$s")
    // the corpus-sized exchange on the shingle hash exists once and is
    // reused by the second consumer
    assert(s.contains("ReusedExchange"), s"expected exchange reuse in:\n$s")
  }

  test("llm42: bloom probe is native and only the maybe-branch joins") {
    val s = planString("llm42_bloom_dedup")
    assert(s.contains("might_contain"), s"expected native bloom probe in:\n$s")
    assert(s.contains("Subquery") || s.contains("scalar-subquery"),
      s"bloom filter must arrive as a scalar subquery:\n$s")
  }

  test("llm57: vocab growth shuffles 8-byte term hashes and bin ids — term strings never move") {
    val df = Queries.byName("llm57_vocab_growth")(spark, sfSmoke)
    val shuffles = shufflePartitionings(planOf(df))
    assert(!shuffles.exists(s => s.contains("__term") || s.contains("term#")),
      s"term strings must die before the exchange: $shuffles")
    // term-hash exchange + two tiny bin exchanges + window/sort singles
    assert(shuffles.exists(s => s.contains("h#") || s.contains("_groupingexpression")),
      s"expected the term-hash-keyed exchange: $shuffles")
  }

  test("llm58: fertility is map-only into one two-phase (source,bucket) aggregate") {
    val s = planString("llm58_bpe_fertility")
    assert(!s.contains("SortAggregate") && !s.contains("ObjectHashAggregate"),
      s"the histogram must stay in codegen'd HashAggregate:\n$s")
    assert(s.contains("partial_count") || "HashAggregate".r.findAllIn(s).size >= 2,
      s"expected partial+final aggregates in:\n$s")
    val df = Queries.byName("llm58_bpe_fertility")(spark, sfSmoke)
    val shuffles = shufflePartitionings(planOf(df))
    assert(shuffles.size <= 2, s"expected only the (source,bucket) agg + sort exchanges: $shuffles")
  }

  test("q17: boundary lag and running session index share ONE Window over one user exchange") {
    val df = Queries.byName("q17_sessionize")(spark, sfSmoke)
    val p = planOf(df)
    val s = p.toString
    // both window functions must evaluate in a single Window node —
    // a second one would mean a second sort (or worse, exchange)
    assert("Window".r.findAllIn(s).size <= 1 ||
           s.linesIterator.count(_.trim.startsWith("Window")) <= 1,
      s"expected one Window operator in:\n$s")
    // exchanges: user window + (user, session) rollup + final sort
    assert(shufflePartitionings(p).size <= 3,
      s"expected at most 3 exchanges: ${shufflePartitionings(p)}")
  }

  test("q19: the funnel fold runs in ONE key aggregate — no per-step joins or windows") {
    val df = Queries.byName("q19_funnel_stages")(spark, sfSmoke)
    val p = planOf(df)
    val s = p.toString
    assert(!s.contains("Window"), s"the fold replaces rank windows:\n$s")
    // the only join is the steps-sized zero-fill against range(0, n+1)
    assert("Join".r.findAllIn(s).size <= 1, s"expected only the zero-fill join:\n$s")
  }

  test("q18: retention aggregates the (user, day) distinct grain — no event-grain joins") {
    val s = planString("q18_cohort_retention")
    assert(!s.contains("Join"), s"retention must be windows+aggregates, not a self-join:\n$s")
    assert("HashAggregate".r.findAllIn(s).size >= 2,
      s"expected distinct + final aggregates in:\n$s")
  }

  test("llm64: the dataset card is one global aggregate — quantiles fold in-row, no second histogram shuffle") {
    val df = Queries.byName("llm64_dataset_card")(spark, sfSmoke)
    val p = planOf(df)
    val s = p.toString
    assert(!s.contains("Window") && !s.contains("Join"),
      s"quantile bins must fold inside the result projection:\n$s")
    assert(s.contains("Expand"), s"expected the multi-distinct Expand:\n$s")
  }

  test("llm61: scrub stats join is keyed on the 8-byte passage hash, never the passage text") {
    val df = Queries.byName("llm61_passage_scrub")(spark, sfSmoke)
    val shuffles = shufflePartitionings(planOf(df))
    assert(shuffles.exists(s => s.contains("__h#") || s.contains("_groupingexpression")),
      s"expected the passage-hash exchange: $shuffles")
    // no exchange may KEY on the passage string — frequency stats and
    // the join back ride the fixed-width hash
    assert(!shuffles.exists(_.contains("passage#")),
      s"exchange keyed on passage text: $shuffles")
  }

  test("llm63: span-scrub frequency stats ride the 8-byte span hash; one coverage Window") {
    val df = Queries.byName("llm63_span_scrub")(spark, sfSmoke)
    val p = planOf(df)
    val shuffles = shufflePartitionings(p)
    assert(!shuffles.exists(s => s.contains("__tok#") || s.contains("text#")),
      s"no exchange may key on token/text strings: $shuffles")
    assert(p.toString.linesIterator.count(_.trim.startsWith("Window")) <= 1,
      s"expected one coverage Window in:\n$p")
  }

  test("llm153: no row-grain single-partition Window anywhere in the audit plan") {
    // round-19 verdict #2: the global sequence number must ride
    // PrefixSum's bucketed two-level scan, never an unpartitioned
    // Window over scan-grain rows (a one-reducer sort of the whole
    // epoch at 100 TB). Unpartitioned windows over AGGREGATED grains
    // (bucket/source totals — bounded by design) are the template's
    // own offset frames and stay legal.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val df = Queries.byName("llm153_interleave_audit")(spark, sfSmoke)
    val offenders = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty &&
        w.child.collectFirst { case a: Aggregate => a }.isEmpty => w
    }
    assert(offenders.isEmpty,
      s"unpartitioned Window over non-aggregated row-grain input:\n${offenders.mkString("\n")}")
  }

  test("llm62: schedule is one source window + literal weights — no weight-table join") {
    val df = Queries.byName("llm62_curriculum_schedule")(spark, sfSmoke)
    val p = planOf(df)
    val s = p.toString
    assert(!s.contains("Join"), s"weights must ride a literal CASE chain, not a join:\n$s")
    assert(s.linesIterator.count(_.trim.startsWith("Window")) <= 1,
      s"expected one source-rank Window in:\n$s")
  }

  test("llm75: URL canonicalization is Column algebra — no UDF, shuffles only for agg + sort") {
    val df = Queries.byName("llm75_url_canonicalize")(spark, sfSmoke)
    val p = planOf(df)
    val s = p.toString
    assert(!s.contains("BatchEvalPython") && !s.toLowerCase.contains("scalaudf"),
      s"canonicalization must stay codegen'd Column algebra:\n$s")
    assert(shufflePartitionings(p).size <= 2,
      s"expected only the curl aggregate + sort exchanges in:\n$p")
  }

  test("llm80: dim stats is one explode + one two-phase aggregate") {
    val df = Queries.byName("llm80_embedding_dim_stats")(spark, sfSmoke)
    val p = planOf(df)
    val s = p.toString
    assert(s.contains("partial_sum") || "HashAggregate".r.findAllIn(s).size >= 2,
      s"expected map-side combine in:\n$s")
    assert(shufflePartitionings(p).size <= 2,
      s"expected only the dim aggregate + sort exchanges in:\n$p")
  }

  test("llm77: banded ANN broadcasts the query side — no cartesian product") {
    val df = Queries.byName("llm77_ann_recall")(spark, sfSmoke)
    val p = planOf(df)
    val s = p.toString
    assert(!s.contains("CartesianProduct"),
      s"recall eval must never plan a cartesian product:\n$s")
    assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastNestedLoopJoin"),
      s"the small query side must broadcast in:\n$s")
  }

  test("partitioned layout: a partition-key filter prunes at planning time, not scan time") {
    // the 100 TB layout contract: date/day-partitioned parquet +
    // a partition-key predicate must show as PartitionFilters (pruned
    // before any file opens), never as a post-scan Filter over data
    val dir = java.nio.file.Files.createTempDirectory("graft-partprune").toString
    try {
      val ev = Tables.events(spark, sfSmoke)
        .withColumn("day", org.apache.spark.sql.functions.expr(
          "unix_micros(ts) DIV 86400000000"))
      ev.write.partitionBy("day").mode("overwrite").parquet(dir)
      // partition values read back type-inferred from directory names
      // (int here) — normalize via Number
      val days = spark.read.parquet(dir).select("day").distinct()
        .collect().map(_.getAs[Number](0).longValue).sorted
      assert(days.length > 1, "fixture must span multiple day partitions")
      val one = spark.read.parquet(dir)
        .filter(org.apache.spark.sql.functions.col("day") === days.head)
      val s = planOf(one).toString
      assert(s.contains("PartitionFilters") && s.contains("day#"),
        s"expected the day predicate in PartitionFilters:\n$s")
      // the data filter lists must NOT carry the partition predicate
      val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
        .findFirstMatchIn(s).map(_.group(1)).getOrElse("")
      val dataFilters = "DataFilters: \\[([^\\]]*)\\]".r
        .findFirstMatchIn(s).map(_.group(1)).getOrElse("")
      assert(!pushed.contains("day") && !dataFilters.contains("day"),
        s"partition key leaked into data filters: [$pushed] [$dataFilters]")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("llm88: HLL is a typed-imperative aggregate over a fixed buffer — no vocabulary shuffle") {
    val df = Queries.byName("llm88_hll_distinct")(spark, sfSmoke)
    val p = planOf(df)
    val s = p.toString
    assert(s.contains("hll_sketch"), s"expected the native aggregate in:\n$s")
    assert(s.contains("ObjectHashAggregate"),
      s"TypedImperativeAggregate must plan ObjectHashAggregate:\n$s")
  }

  test("llm90: batch retrieval explodes the corpus once — query count never rescans it") {
    val df = Queries.byName("llm90_batch_retrieval_mrr")(spark, sfSmoke)
    val s = planOf(df).toString
    // one corpus-token Generate feeds tf/df; the query-construction
    // Generate over 20 rows is the only other explode
    val generates = s.linesIterator.count(_.trim.startsWith("Generate explode"))
    assert(generates <= 3, s"expected no per-query corpus rescans, got $generates explodes:\n$s")
    assert(!s.contains("CartesianProduct"), s"no cartesian in batch retrieval:\n$s")
  }

  test("llm59/llm60: iterative ops return driver-assembled tiny frames — no residual exchange") {
    Seq("llm59_domain_reweight", "llm60_kcenter_coreset").foreach { name =>
      val df = Queries.byName(name)(spark, sfSmoke)
      val p = planOf(df)
      // the distributed work ran inside the operator's own jobs; the
      // RESULT is k rows built driver-side — re-materializing it must
      // not rescan or reshuffle anything
      assert(shufflePartitionings(p).size <= 1, s"$name: unexpected exchanges in:\n$p")
      assert(p.toString.contains("LocalTableScan"), s"$name: expected a local k-row result:\n$p")
    }
  }

  test("llm109/llm113: single-scan projections — only the output sort exchanges") {
    Seq("llm109_code_detect", "llm113_mixed_language").foreach { name =>
      val df = Queries.byName(name)(spark, sfSmoke)
      val shuffles = shufflePartitionings(planOf(df))
      assert(shuffles.size <= 1,
        s"$name: expected at most the sort shuffle, got $shuffles")
    }
  }

  test("llm106: novelty decay shuffles carry shingle hashes and visit keys, never shingles") {
    val df = Queries.byName("llm106_novelty_decay")(spark, sfSmoke)
    val shuffles = shufflePartitionings(planOf(df))
    assert(shuffles.nonEmpty, "novelty decay must aggregate somewhere")
    assert(!shuffles.exists(s => s.contains("text#") || s.contains("shingle")),
      s"shuffle keys must be 8-byte shingle hashes / (source, visit), never strings: $shuffles")
  }

  test("llm107: embedding drift never shuffles a vector — (source, dim) partials only") {
    val df = Queries.byName("llm107_embedding_drift")(spark, sfSmoke)
    val shuffles = shufflePartitionings(planOf(df))
    assert(shuffles.nonEmpty, "drift must aggregate somewhere")
    assert(!shuffles.exists(_.contains("embedding#")),
      s"vectors must die in the map stage — (source, dim) partials only: $shuffles")
  }

  test("llm110: url content audit shuffles hashes and canonical urls, never document text") {
    val df = Queries.byName("llm110_url_content_audit")(spark, sfSmoke)
    val p = planOf(df)
    val shuffles = shufflePartitionings(p)
    assert(!shuffles.exists(_.contains("text#")),
      s"content must collapse to its 8-byte hash before any exchange: $shuffles")
    assert(!p.toString.contains("CartesianProduct"),
      s"base-content join degenerated to a product:\n$p")
  }

  test("llm114: the capstone funnel's exchanges carry hashes and manifest rows, never text") {
    val df = Queries.byName("llm114_curation_pipeline")(spark, sfSmoke)
    val p = planOf(df)
    val shuffles = shufflePartitionings(p)
    // gates run at scan speed; the dedup exchange is keyed on the
    // 8-byte content hash (text dies map-side), the pack's range
    // repartition moves (hash, tokens) pairs, and the manifest
    // aggregate is (split, shard)-grain
    assert(!shuffles.exists(_.contains("text#")),
      s"the funnel must never shuffle document text: $shuffles")
    assert(!p.toString.contains("CartesianProduct"),
      s"funnel join degenerated to a product:\n$p")
  }

  test("llm112: sampled quantiles — the corpus never sorts per group; windows see the bounded sample") {
    val df = Queries.byName("llm112_sampled_quantiles")(spark, sfSmoke)
    val p = planOf(df)
    // the rank scan is a range repartition of (hash, id) pairs — text
    // must never reach an exchange, and the semi-join must stay an
    // equi-join (hash or broadcast), never a product
    val shuffles = shufflePartitionings(p)
    assert(!shuffles.exists(_.contains("text#")),
      s"sample selection must move 8-byte pairs only: $shuffles")
    assert(!p.toString.contains("CartesianProduct") &&
           !p.toString.contains("BroadcastNestedLoopJoin"),
      s"sample semi-join degenerated to a product:\n$p")
  }

  test("llm116: video keyframes — media bytes die at the codec seam; exchanges carry frame rows") {
    val df = Queries.byName("llm116_video_keyframes")(spark, sfSmoke)
    val p = planOf(df)
    val ins = shuffleInputs(p)
    // the only exchange is the per-video lag window: (doc_id,
    // frame_idx, dhash) — 20 bytes per sampled frame; the demux+dHash
    // UDF consumed the video bytes map-side
    assert(ins.nonEmpty, "the keyframe window must partition by video")
    assert(!ins.exists(n => n == "media" || n == "__fr"),
      s"video bytes / frame arrays must never cross an exchange: $ins")
  }

  test("llm117: contamination matrix — corpora reduce to k-long sketches before any join") {
    val df = Queries.byName("llm117_contamination_matrix")(spark, sfSmoke)
    val p = planOf(df)
    val shuffles = shufflePartitionings(p)
    // both sides aggregate to per-group KMV sketches (map-side partial
    // TreeSets), so the exchanges are group-keyed; text and shingles
    // die in the partial aggregate, and the train×eval combine is a
    // broadcast of the sources×evals sketch frame, never a shuffle of
    // either corpus
    assert(!shuffles.exists(s => s.contains("text#") || s.contains("shingle#")),
      s"corpus strings must never be shuffle keys: $shuffles")
    assert(!p.toString.contains("CartesianProduct"),
      s"the sketch combine must broadcast, not product:\n$p")
  }

  test("llm118: video near-dup — candidates come from fingerprint equality, never media bytes or all-pairs") {
    val df = Queries.byName("llm118_video_neardup")(spark, sfSmoke)
    val p = planOf(df)
    val ins = shuffleInputs(p)
    assert(!ins.exists(n => n == "media" || n == "__fr"),
      s"video bytes must die at the codec seam: $ins")
    // the candidate join is an equi-join on the 8-byte fingerprint —
    // a product here would be the all-pairs degeneracy the operator
    // exists to avoid
    assert(!p.toString.contains("CartesianProduct") &&
           !p.toString.contains("BroadcastNestedLoopJoin"),
      s"fingerprint candidate join degenerated to a product:\n$p")
  }

  test("llm119: longest-run audit — positional matches travel as (id, pos, hash); no product, no text keys") {
    val df = Queries.byName("llm119_longest_run_audit")(spark, sfSmoke)
    val p = planOf(df)
    val shuffles = shufflePartitionings(p)
    // the match join is keyed on the 16-gram hash and the islands
    // rank on (sample, match, diag) — strings are never shuffle keys,
    // and no stage compares texts pairwise
    assert(!shuffles.exists(s => s.contains("text#") || s.contains("stext#")),
      s"span audit must move 8-byte positional rows only: $shuffles")
    assert(!p.toString.contains("CartesianProduct") &&
           !p.toString.contains("BroadcastNestedLoopJoin"),
      s"positional match join degenerated to a product:\n$p")
  }

  test("llm122: script profile runs at scan speed — zero shuffles before the verify sort") {
    val df = Queries.byName("llm122_script_profile")(spark, sfSmoke)
    val shuffles = shufflePartitionings(planOf(df))
    // one codegen projection per doc; the only allowed exchange is
    // the final ORDER BY's range partitioning
    assert(shuffles.forall(_.contains("rangepartitioning")),
      s"the profiler must not aggregate or join — scan-speed only: $shuffles")
  }

  test("llm121: image clusters — png bytes die at the codec seam; band join + CC stay products-free") {
    val df = Queries.byName("llm121_image_clusters")(spark, sfSmoke)
    val p = planOf(df)
    assert(!shuffleInputs(p).contains("media"),
      "image bytes must never cross an exchange")
    assert(!p.toString.contains("CartesianProduct"),
      s"band join or closure degenerated to a product:\n$p")
  }

  test("llm120: audio near-dup — wav bytes die at the codec seam; candidates via fingerprint equality") {
    val df = Queries.byName("llm120_audio_neardup")(spark, sfSmoke)
    val p = planOf(df)
    assert(!shuffleInputs(p).contains("media"),
      "audio bytes must never cross an exchange")
    assert(!p.toString.contains("CartesianProduct") &&
           !p.toString.contains("BroadcastNestedLoopJoin"),
      s"fingerprint candidate join degenerated to a product:\n$p")
  }

  test("llm124: span scrub — positions + hashes key every shuffle; the cut ranges broadcast back") {
    val df = Queries.byName("llm124_exact_substring_scrub")(spark, sfSmoke)
    val p = planOf(df)
    val keys = shufflePartitionings(p)
    // the positional pass, the shared-gram aggregate, and the island
    // windows all key on (doc_id, pos, 8-byte hash) — document text
    // must never be a shuffle key; the only stage that touches text is
    // the scrub projection, fed by a BROADCAST of the merged ranges
    assert(!keys.exists(s => s.contains("text#") || s.contains("__t#")),
      s"span scrub must key shuffles on positions/hashes only: $keys")
    assert(p.toString.contains("BroadcastHashJoin"),
      s"the cut-range frame must broadcast back against the scan:\n$p")
    assert(!p.toString.contains("CartesianProduct") &&
           !p.toString.contains("BroadcastNestedLoopJoin"),
      s"shared-gram join degenerated to a product:\n$p")
  }

  test("llm126: burst dedup — image bytes die at the codec seam; the block join is an equi-join, never a product") {
    val df = Queries.byName("llm126_burst_shot_dedup")(spark, sfSmoke)
    val p = planOf(df)
    assert(!shuffleInputs(p).contains("media"),
      "image bytes must never cross an exchange — both UDFs run at the scan")
    assert(!p.toString.contains("CartesianProduct") &&
           !p.toString.contains("BroadcastNestedLoopJoin"),
      s"the (device, window) block join degenerated to a product:\n$p")
  }

  test("llm127: rotation dedup — image bytes die at the codec seam; candidates via hash equality, never a product") {
    val df = Queries.byName("llm127_rotation_dedup")(spark, sfSmoke)
    val p = planOf(df)
    assert(!shuffleInputs(p).contains("media"),
      "image bytes must never cross an exchange — normalize+hash runs at the scan")
    assert(!p.toString.contains("CartesianProduct") &&
           !p.toString.contains("BroadcastNestedLoopJoin"),
      s"the normalized-hash candidate join degenerated to a product:\n$p")
  }

  test("llm125: exif parse — jpeg bytes die at the codec seam; only the output sort exchanges") {
    val df = Queries.byName("llm125_exif_metadata")(spark, sfSmoke)
    val p = planOf(df)
    assert(!shuffleInputs(p).contains("media"),
      "image bytes must never cross an exchange — the parse is map-side")
    val shuffles = shufflePartitionings(p)
    assert(shuffles.forall(_.contains("rangepartitioning")),
      s"exif extraction is one scan-side projection — only the ORDER BY may exchange: $shuffles")
  }

  test("llm128: winnowing — text dies in the gram projection; the w-fold window blowup collapses map-side") {
    val df = Queries.byName("llm128_winnowing_overlap")(spark, sfSmoke)
    val p = planOf(df)
    val keys = shufflePartitionings(p)
    assert(!shuffleInputs(p).exists(n => n.startsWith("text") || n.startsWith("__t")),
      "document text must never cross an exchange — grams hash at the scan")
    assert(!keys.exists(s => s.contains("text#") || s.contains("__t#")),
      s"winnowing shuffles key on (doc, window) / hash only: $keys")
    assert(!p.toString.contains("CartesianProduct") &&
           !p.toString.contains("BroadcastNestedLoopJoin"),
      s"the fingerprint overlap join degenerated to a product:\n$p")
  }

  test("llm129: cdc chunking — boundaries and chunk hashes compute at the scan; text never exchanges") {
    val df = Queries.byName("llm129_cdc_chunk_dedup")(spark, sfSmoke)
    val p = planOf(df)
    assert(!shuffleInputs(p).exists(n => n.startsWith("text") || n.startsWith("__t")),
      "document text must never cross an exchange — the whole chunk pass is one scan projection")
    assert(!p.toString.contains("CartesianProduct") &&
           !p.toString.contains("BroadcastNestedLoopJoin"),
      s"chunk-grain joins degenerated to a product:\n$p")
  }

  test("llm133: domain authority — page HTML dies in the scan; the graph is domain-grain") {
    val df = Queries.byName("llm133_domain_authority")(spark, sfSmoke)
    val p = planOf(df)
    assert(!shuffleInputs(p).exists(n => n.startsWith("html") || n.startsWith("text") ||
        n.startsWith("__l")),
      "page HTML and raw link structs must never cross an exchange")
    assert(!p.toString.contains("CartesianProduct") &&
           !p.toString.contains("BroadcastNestedLoopJoin"),
      s"the label join-back degenerated to a product:\n$p")
  }

  test("llm132: license detect — text dies in the gram projection; the ref side broadcasts") {
    val df = Queries.byName("llm132_license_detect")(spark, sfSmoke)
    val p = planOf(df)
    val s = p.toString
    assert(!shuffleInputs(p).exists(n => n.startsWith("text") || n.startsWith("__t") ||
        n.startsWith("ltext")),
      "document and reference text must never cross an exchange")
    assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastExchange"),
      s"the reference fingerprint frame must broadcast:\n$s")
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s"the containment join degenerated to a product:\n$s")
  }

  test("llm142/llm143: quality gates — media bytes die at the codec seam") {
    for (name <- Seq("llm142_audio_quality", "llm143_image_quality")) {
      val df = Queries.byName(name)(spark, sfSmoke)
      val p = planOf(df)
      assert(!shuffleInputs(p).exists(n => n == "media" || n.startsWith("media#")),
        s"$name: media bytes must never cross an exchange")
      assert(!p.toString.contains("CartesianProduct") &&
             !p.toString.contains("BroadcastNestedLoopJoin"),
        s"$name: the metadata join degenerated to a product:\n$p")
    }
  }

  test("llm148: curation funnel — document text never crosses an exchange; the license list broadcasts") {
    val df = Queries.byName("llm148_curation_pipeline_v2")(spark, sfSmoke)
    val p = planOf(df)
    assert(!shuffleInputs(p).exists(n => n == "t" || n == "text" || n == "fim"),
      "gates, license probe, and FIM all reduce text scan-side")
    assert(p.toString.contains("BroadcastHashJoin") || p.toString.contains("BroadcastExchange"),
      s"the license frames must broadcast:\n$p")
    assert(!p.toString.contains("CartesianProduct"),
      s"unexpected product in the funnel:\n$p")
  }

  test("llm157: token decontamination — grams hash scan-side; no gram strings or text on exchanges") {
    val df = Queries.byName("llm157_token_decontamination")(spark, sfSmoke)
    val analyzed = df.queryExecution.analyzed.toString
    // round-21: the tokenizer UDF emits the xxhash64 values DIRECTLY
    // (Tokenizer.tokenGramHashes, equality-pinned in TokenizerSpec), so
    // no Column-side xxhash64 re-hash of gram strings may remain — the
    // grams are born as 8-byte hashes and never exist as strings.
    assert(!analyzed.contains("xxhash64"),
      "gram strings must not be re-hashed Column-side — the UDF emits hashes")
    val p = planOf(df)
    // round-22 (6f636e7): the doc rows deliberately widen BEFORE the
    // gram UDF (REPARTITION_BY_NUM at the caller seam — one hop, gated
    // off once the scan plans enough splits), so text crosses exactly
    // that exchange. The pin is on plan-REQUIRED exchanges: no join or
    // aggregate may ever demand text or gram strings on the wire.
    assert(!requiredShuffleInputs(p).exists(n => n.startsWith("text") || n.startsWith("g#") ||
        n.startsWith("__t")),
      "document text and gram strings must never cross a join/aggregate exchange")
    assert(!p.toString.contains("CartesianProduct") &&
           !p.toString.contains("BroadcastNestedLoopJoin"),
      s"the containment join degenerated to a product:\n$p")
  }

  test("llm158: index refresh — untouched rows pass an anti-join; no products; text only for changed docs") {
    val df = Queries.byName("llm158_gram_index_refresh")(spark, sfSmoke)
    val p = planOf(df)
    val s = p.toString
    assert(s.contains("LeftAnti"),
      s"untouched index rows must pass through an anti-join, not a rebuild:\n$s")
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s"the changed-keys join degenerated to a product:\n$s")
    assert(!shuffleInputs(p).exists(n => n.startsWith("text")),
      "raw text must never cross an exchange — changed docs hash map-side")
  }

  test("llm131: blocklist gate — one scan projection, one aggregate; no explode, no text keys") {
    val df = Queries.byName("llm131_blocklist_gate")(spark, sfSmoke)
    val p = planOf(df)
    val s = p.toString
    assert(!shuffleInputs(p).exists(n => n.startsWith("text") || n.startsWith("__")),
      "the gate folds to (source, hits, flag, mask) before any exchange")
    assert(!s.linesIterator.exists(_.trim.startsWith("Generate")),
      s"distinct-term counting must ride the bitmask, not an explode:\n$s")
    // exactly the partial/final agg exchange + the output sort
    assert(shufflePartitionings(p).size <= 2,
      s"expected agg + sort exchanges only: ${shufflePartitionings(p)}")
  }
}
