package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Sequence packing: assign documents to fixed-token-budget training
  * packs — the batch-construction step of an LLM data pipeline
  * (documents are concatenated in order and cut into `seqLen`-token
  * sequences; each document belongs to the pack its starting offset
  * falls in).
  *
  * Scale shape: packing is SHARD-LOCAL — documents are routed to
  * `nShards` shards by portable hash, and the running token offset is
  * a window per shard, so the sort is distributed (one spillable
  * sort-based window per shard, keys spread over the cluster) instead
  * of a single global running sum. Real pipelines pack per shard/file
  * for exactly this reason; cross-shard determinism comes from the
  * hash routing, in-shard determinism from the doc-id order. */
object Packing {

  /** Length-bucketed INFERENCE batching with padding-waste
    * accounting — the serving-side sibling of the training packers:
    * documents bin by `tokens DIV binWidth`, rank within their bin by
    * (tokens, id) through the DISTRIBUTED exact-rank machinery
    * ([[Sketches.groupRanks]] — a bin can outgrow any single
    * partition at corpus scale, where a plain row_number window
    * cannot), and consecutive ranks group into `batchSize`-document
    * batches. Each batch pads every member to its longest document;
    * `padding_waste = max·n − Σtokens` is the tokens burned — the
    * metric bucketed batching exists to minimize (unbatched random
    * order pads everything to the global max). Returns one row per
    * (bin, batch_idx): (bin, batch_idx, n_docs, max_tokens,
    * sum_tokens, padding_waste). */
  def lengthBucketedBatches(df: DataFrame, idCol: Column, nTokensCol: Column,
                            binWidth: Long, batchSize: Int,
                            tracker: Option[graft.operators.Materialize.Tracker] = None,
                            numPartitions: Option[Int] = None): DataFrame = {
    require(binWidth >= 1 && batchSize >= 1, "binWidth and batchSize must be >= 1")
    val base = df.select(idCol.as("__id"), nTokensCol.cast("long").as("__nt"))
      .withColumn("__bin", expr(s"__nt DIV $binWidth"))
    Sketches.groupRanks(base, col("__bin"), col("__nt"), col("__id"),
        tracker = tracker, numPartitions = numPartitions)
      .select(col("g").as("bin"), col("v").as("__nt"),
        expr(s"(rank - 1) DIV $batchSize").as("batch_idx"))
      .groupBy(col("bin"), col("batch_idx"))
      .agg(count(lit(1)).as("n_docs"), max(col("__nt")).as("max_tokens"),
        sum(col("__nt")).as("sum_tokens"))
      .withColumn("padding_waste",
        col("max_tokens") * col("n_docs") - col("sum_tokens"))
  }

  /** Add (shard, offset, pack_id): shard = hash(doc) % nShards,
    * offset = running token count within the shard in `orderCol`
    * order BEFORE this document, pack_id = offset / seqLen. */
  def packBudgeted(df: DataFrame, idCol: Column, nTokensCol: Column,
                   seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen > 0 && nShards > 0, "seqLen and nShards must be positive")
    val shard = pmod(Portable.hash64(idCol), lit(nShards.toLong))
    val w = Window.partitionBy(col("shard")).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shard)
      .withColumn("offset", sum(nTokensCol).over(w) - nTokensCol)
      .withColumn("pack_id", floor(col("offset") / lit(seqLen.toLong)))
  }

  /** Pack manifest: documents and token totals per (shard, pack) —
    * what a downstream tokenizer-writer materializes per sequence. */
  def packManifest(packed: DataFrame, nTokensCol: Column): DataFrame =
    packed.groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(nTokensCol).as("n_tokens"))

  /** Sliding-window document CHUNKING — the context-window preparation
    * step (long documents split into ≤`chunkTokens`-token windows
    * starting every `stride` tokens, overlapping when
    * stride < chunkTokens; the last window starts at the final stride
    * boundary that still adds uncovered tokens, so the tail is covered
    * exactly once). Emits one row per chunk: (doc_id, chunk_id,
    * n_tokens, chunk_hash) — the hash stands in for the chunk text so
    * nothing longer than 8 bytes leaves the projection (a writer
    * re-slices the text by (chunk_id·stride, chunkTokens) at
    * materialization time). Documents with zero tokens emit nothing.
    *
    * Scale shape: one codegen'd position explode per document — no
    * chunk array is ever built, no shuffle at all (the operator is a
    * pure scan transform; callers group/sort downstream as needed).
    * Chunk count per doc is 1 + ceil((len − chunk)/stride), computed
    * with the same fixed-order ops any engine reproduces. */
  def chunkWithOverlap(df: DataFrame, idCol: Column, textCol: Column,
                       chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens >= 1 && stride >= 1 && stride <= chunkTokens,
      "need chunkTokens >= stride >= 1")
    val toks = Dedup.tokens(textCol)
    val nc = when(size(col("__toks")) <= 0, lit(0L))
      .when(size(col("__toks")) <= chunkTokens, lit(1L))
      .otherwise(lit(1L) + floor(
        (size(col("__toks")) - chunkTokens + (stride - 1)).cast("double") /
          lit(stride.toDouble)).cast("long"))
    df.select(idCol.as("doc_id"), toks.as("__toks"))
      .withColumn("__nc", nc)
      // sequence(0, -1) would yield DESCENDING [0, -1]: guard zero-chunk docs
      .filter(col("__nc") >= 1)
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(0L), col("__nc") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"),
          lit(chunkTokens)).as("__c"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("__c")).cast("long").as("n_tokens"),
        Portable.hash64(concat_ws(" ", col("__c"))).as("chunk_hash"))
  }

  /** Materialize the corpus as `nShards` deterministic training
    * shards: shard membership by one hash salt, WITHIN-shard order by
    * a second (the reproducible global shuffle every training run
    * needs — seeded-RNG shuffles change with partitioning and engine;
    * hash order never does). Writes
    * `outDir/shard=<s>/part-*.parquet` with rows in (order-hash, id)
    * order inside each shard, so two runs — any cluster size, any
    * engine honoring the layout — produce the identical read order.
    * [[graft.llm.CorpusReport.freezeManifest]] over the same salt is
    * the audit artifact for the result.
    *
    * Scale shape: one hash repartition on the shard id + a
    * within-partition sort (spillable, no global ordering), then a
    * straight parquet write — the shuffle moves each row once. */
  def writeTrainingShards(docs: DataFrame, idCol: Column, outDir: String,
                          nShards: Int, salt: String = "shard",
                          orderSalt: String = "order"): Unit = {
    require(nShards > 0, "nShards must be positive")
    docs
      .withColumn("shard",
        pmod(Portable.hash64(concat(lit(salt + ":"), idCol.cast("string"))),
          lit(nShards.toLong)))
      .withColumn("__ord",
        Portable.hash64(concat(lit(orderSalt + ":"), idCol.cast("string"))))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__ord"), idCol)
      .drop("__ord")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }
}
