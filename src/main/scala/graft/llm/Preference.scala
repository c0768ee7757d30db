package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise-preference aggregation — the RLHF/preference-data prep
  * operator: given raw pairwise comparisons (a, b, winner) from human
  * or model raters, rank the compared items by tournament methods that
  * are INTEGER-EXACT and order-independent (unlike Elo, whose result
  * depends on comparison arrival order, or Bradley-Terry MLE, whose
  * iterative floats diverge across engines):
  *
  *  - per unordered matchup: majority outcome (beat / beaten / tie);
  *  - Copeland score (doubled to stay integral: 2·majorities-won +
  *    ties) — the classic tournament rank;
  *  - Borda-style total comparison wins and integer win percentage;
  *  - Condorcet-winner detection (beats EVERY opponent faced on
  *    majority) — the "undisputed best response" flag reward-model
  *    data curation keys on.
  *
  * Reference scope: the reference engine ships no preference
  * analytics; this is the training-data curation surface (DPO/RLHF
  * neighborhood of llm100's DPO pair construction: llm100 BUILDS the
  * pairs, this one AUDITS/ranks the items the comparisons cover).
  *
  * Scale shape (100 TB of comparisons): two hash aggregates — raw
  * comparisons collapse to matchup rows (one per unordered item pair,
  * map-side combined), matchup rows collapse to item rows via one
  * union of two integer projections. Nothing is iterative, nothing
  * broadcasts, no floats until the (integer) win percentage.
  */
object Preference {

  /** @param comps one row per comparison
    * @return one row per item:
    *   (item, n_matchups, n_comps, n_wins, n_beaten, n_tied,
    *    copeland2, condorcet, win_pct) */
  def aggregate(comps: DataFrame, aCol: Column, bCol: Column,
                winnerCol: Column): DataFrame = {
    // malformed rows (tie sentinels, typo'd winner ids) are REJECTED,
    // not silently credited to the greater item — a winner must be one
    // of the two compared items
    val norm = comps
      .where(winnerCol === aCol || winnerCol === bCol)
      .select(
        least(aCol, bCol).as("lo"), greatest(aCol, bCol).as("hi"),
        when(winnerCol === least(aCol, bCol), lit(1L)).otherwise(lit(0L)).as("lo_win"))
      .where(col("lo") =!= col("hi"))
    val mu = norm.groupBy(col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"), sum(col("lo_win")).as("lo_wins"))
    val loSide = mu.select(col("lo").as("item"), col("n"),
      col("lo_wins").as("wins"),
      when(col("lo_wins") * 2 > col("n"), lit(1L)).otherwise(lit(0L)).as("beat"),
      when(col("lo_wins") * 2 === col("n"), lit(1L)).otherwise(lit(0L)).as("tie"))
    val hiSide = mu.select(col("hi").as("item"), col("n"),
      (col("n") - col("lo_wins")).as("wins"),
      when(col("lo_wins") * 2 < col("n"), lit(1L)).otherwise(lit(0L)).as("beat"),
      when(col("lo_wins") * 2 === col("n"), lit(1L)).otherwise(lit(0L)).as("tie"))
    loSide.unionByName(hiSide)
      .groupBy(col("item"))
      .agg(count(lit(1)).as("n_matchups"),
        sum(col("n")).as("n_comps"),
        sum(col("wins")).as("n_wins"),
        sum(col("beat")).as("n_beaten"),
        sum(col("tie")).as("n_tied"))
      .select(col("item"), col("n_matchups"), col("n_comps"), col("n_wins"),
        col("n_beaten"), col("n_tied"),
        (col("n_beaten") * 2 + col("n_tied")).as("copeland2"),
        (col("n_beaten") === col("n_matchups")).as("condorcet"),
        expr("n_wins * 100 DIV n_comps").as("win_pct"))
  }

  /** LENGTH-BIAS AUDIT — the verbosity-bias diagnostic for preference
    * data (raters and reward models systematically prefer longer
    * responses; training on biased comparisons teaches padding, not
    * quality): bucket comparisons by |len_a − len_b| and report the
    * longer-side win rate per bucket. Unbiased data sits near 50%
    * flat; verbosity bias shows as a DOSE-RESPONSE curve — win rate
    * rising with the length gap — which a single overall rate can
    * hide behind mostly-equal-length pairs.
    *
    * Scale shape: the item-length map is broadcast twice into the
    * comparison scan (items are responses — thousands); one hash
    * aggregate over (bucket, two ints).
    *
    * @param lens (item, len) frame — small, broadcast
    * @return (delta_bucket, n_comps, longer_wins, longer_win_pct),
    *   equal-length pairs excluded */
  def lengthBias(comps: DataFrame, aCol: Column, bCol: Column,
                 winnerCol: Column, lens: DataFrame, itemCol: Column,
                 lenCol: Column, bucketWidth: Int = 50): DataFrame = {
    val lm = lens.select(itemCol.as("__it"), lenCol.as("__len"))
    val joined = comps.select(aCol.as("__a"), bCol.as("__b"), winnerCol.as("__w"))
      .where(col("__a") =!= col("__b"))
      .join(broadcast(lm.select(col("__it").as("__ita"), col("__len").as("len_a"))),
        col("__a") === col("__ita"))
      .join(broadcast(lm.select(col("__it").as("__itb"), col("__len").as("len_b"))),
        col("__b") === col("__itb"))
      .where(col("len_a") =!= col("len_b"))
      .select(
        expr(s"abs(len_a - len_b) DIV $bucketWidth").as("delta_bucket"),
        when((col("__w") === col("__a") && col("len_a") > col("len_b")) ||
             (col("__w") === col("__b") && col("len_b") > col("len_a")), 1L)
          .otherwise(0L).as("__lw"))
    joined.groupBy(col("delta_bucket"))
      .agg(count(lit(1)).as("n_comps"), sum(col("__lw")).as("longer_wins"))
      .withColumn("longer_win_pct", expr("longer_wins * 100 DIV n_comps"))
  }
}
