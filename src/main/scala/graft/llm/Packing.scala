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
}
