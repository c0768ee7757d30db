package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Eval-run significance analytics — the decision layer over per-item
  * metric deltas ("is variant B actually better than A?"): a paired
  * bootstrap whose resamples are DETERMINISTIC hash weights, so the
  * test is reproducible across engines and runs — no RNG state, no
  * seed bookkeeping, the same (resample, item) always gets the same
  * weight.
  *
  * The resampling scheme is double-or-nothing (Owen & Eckles 2012
  * family): weight w(b, item) = 2·(hash(b, item) mod 2) ∈ {0, 2},
  * E[w] = 1 — each resample keeps ~half the items at double weight.
  * A one-sided p estimate is the fraction of resamples whose weighted
  * delta sum is ≤ 0. Deltas are integers (quantize upstream), so
  * every resample sum is exact.
  *
  * Scale shape: eval sets are thousands of items, not corpus-sized —
  * the B-fold expansion (items × B rows of three ints) is the cheap
  * part and shuffles to B rows per experiment; nothing touches the
  * training corpus. (For million-item evals, B accumulators in a
  * fixed-buffer native aggregate is the dial — same seam as
  * functions.VecOuterSum.)
  */
object EvalStats {

  /** @param deltaCol integer per-item metric delta (B − A)
    * @return one row per experiment:
    *   (experiment, n_items, sum_delta, n_resamples, n_nonpos, p_pct) */
  def pairedBootstrap(df: DataFrame, expCol: Column, itemCol: Column,
                      deltaCol: Column, resamples: Int = 200): DataFrame = {
    require(resamples >= 10, s"need >= 10 resamples, got $resamples")
    val base = df.select(expCol.as("experiment"), itemCol.as("__item"),
      deltaCol.cast("long").as("__delta"))
    val stats = base.groupBy("experiment")
      .agg(count(lit(1)).as("n_items"), sum(col("__delta")).as("sum_delta"))
    val wsums = base
      .select(col("experiment"), col("__item"), col("__delta"),
        explode(sequence(lit(0), lit(resamples - 1))).as("__b"))
      .select(col("experiment"), col("__b"),
        ((Portable.hash64(concat(lit("bs:"), col("__b"), lit(":"), col("__item"))) % 2) *
          2 * col("__delta")).as("__wd"))
      .groupBy(col("experiment"), col("__b"))
      .agg(sum(col("__wd")).as("__wsum"))
    val boot = wsums.groupBy("experiment")
      .agg(count(lit(1)).as("n_resamples"),
        sum(when(col("__wsum") <= 0, 1L).otherwise(0L)).as("n_nonpos"))
    stats.join(boot, "experiment")
      .withColumn("p_pct", expr("n_nonpos * 100 DIV n_resamples"))
  }
}
