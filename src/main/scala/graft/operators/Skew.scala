package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — the salting pattern for the
  * case AQE's skew-join split cannot reach: AQE only splits a skewed
  * SORT-MERGE partition when the OTHER side can be replicated at
  * runtime, and it never helps aggregations feeding the join or
  * builds where one logical key genuinely overwhelms one task (the
  * web-corpus reality: one domain, one boilerplate hash, one null-ish
  * key carrying 10% of 100 TB).
  *
  * [[saltedJoin]] splits every big-side row's key into `factor`
  * sub-keys by a deterministic row hash, and replicates the SMALL
  * side across all `factor` salt values — the join stays a pure
  * equi-join on (key, salt), so Catalyst plans the same
  * hash/sort-merge shuffle, but the hottest logical key now spreads
  * over `factor` tasks. Cost: small side shuffles `factor`× (it is
  * the SMALL side by contract — if it fit a broadcast you would not
  * be here; broadcast joins don't skew).
  *
  * The salt is `pmod(hash(entire big row), factor)` — deterministic
  * (reruns produce identical partitioning, unlike rand()-salting,
  * which breaks retry idempotency and cross-engine checks) and
  * independent of the join key, so it splits even a single-valued
  * key column.
  */
object Skew {

  /** Equi-join `big` with `small` on `key`, spreading each big-side
    * key over `factor` salt buckets. Semantics = `big.join(small,
    * key, joinType)` for row-preserving join types ("inner",
    * "left_outer"); the salt columns never escape. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    require(joinType == "inner" || joinType == "left_outer",
      s"salting preserves per-row join semantics for inner/left_outer, got $joinType")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(factor.toLong)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(factor.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Per-key frequency above `threshold` — the scouting query that
    * decides whether a join needs salting and with what factor (run
    * it on a sample; at scale the groupBy is one fixed-width-count
    * shuffle with map-side combine). */
  def hotKeys(df: DataFrame, key: Column, threshold: Long): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
}
