package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the preference-aggregation contract: majority per matchup,
  * Copeland/Borda folds, Condorcet detection, tie handling, and
  * arrival-order independence. */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  // Tournament over items 1..3:
  //  (1,2): 1 wins 2 of 3         -> 1 beats 2
  //  (1,3): 1 wins 2 of 2         -> 1 beats 3   (1 = Condorcet winner)
  //  (2,3): 1 win each            -> tie
  private val comps = Seq(
    (1, 2, 1), (1, 2, 1), (2, 1, 2),
    (1, 3, 1), (3, 1, 1),
    (2, 3, 2), (3, 2, 3))

  test("majority, Copeland, Borda, Condorcet, and ties") {
    val out = Preference.aggregate(comps.toDF("a", "b", "w"),
        col("a"), col("b"), col("w"))
      .orderBy("item").collect()
    val byItem = out.map(r => r.getInt(0) -> r).toMap

    val i1 = byItem(1)
    assert(i1.getAs[Long]("n_matchups") == 2 && i1.getAs[Long]("n_beaten") == 2)
    assert(i1.getAs[Long]("copeland2") == 4 && i1.getAs[Boolean]("condorcet"))
    assert(i1.getAs[Long]("n_wins") == 4 && i1.getAs[Long]("n_comps") == 5)

    val i2 = byItem(2)
    assert(i2.getAs[Long]("n_beaten") == 0 && i2.getAs[Long]("n_tied") == 1)
    assert(i2.getAs[Long]("copeland2") == 1 && !i2.getAs[Boolean]("condorcet"))

    val i3 = byItem(3)
    assert(i3.getAs[Long]("copeland2") == 1 && !i3.getAs[Boolean]("condorcet"))
    assert(i3.getAs[Long]("win_pct") == 25) // 1 of 4 comparisons
  }

  test("result is invariant under comparison order and side swaps") {
    val swapped = comps.reverse.map { case (a, b, w) => (b, a, w) }
    val x = Preference.aggregate(comps.toDF("a", "b", "w"), col("a"), col("b"), col("w"))
      .orderBy("item").collect().toSeq
    val y = Preference.aggregate(swapped.toDF("a", "b", "w"), col("a"), col("b"), col("w"))
      .orderBy("item").collect().toSeq
    assert(x == y)
  }

  test("malformed winners (tie sentinel / typo id) are rejected, not credited") {
    // winner 99 names neither side, winner 0 is a tie sentinel: both
    // rows must drop entirely — identical output to the clean input
    val dirty = comps ++ Seq((1, 2, 99), (2, 3, 0))
    val x = Preference.aggregate(comps.toDF("a", "b", "w"), col("a"), col("b"), col("w"))
      .orderBy("item").collect().toSeq
    val y = Preference.aggregate(dirty.toDF("a", "b", "w"), col("a"), col("b"), col("w"))
      .orderBy("item").collect().toSeq
    assert(x == y)
  }

  test("self-comparisons are dropped") {
    val withSelf = comps :+ ((1, 1, 1))
    val x = Preference.aggregate(withSelf.toDF("a", "b", "w"), col("a"), col("b"), col("w"))
      .agg(sum("n_comps")).first().getLong(0)
    assert(x == comps.size * 2) // each comparison counts once per side
  }

  test("length bias: buckets, longer-win attribution, equal-length exclusion") {
    val lens = Seq((1L, 100L), (2L, 100L), (3L, 220L)).toDF("item", "len")
    val c = Seq(
      (1L, 3L, 3L),  // delta 120 -> bucket 2, longer (3) wins
      (3L, 1L, 1L),  // delta 120 -> bucket 2, shorter (1) wins
      (1L, 2L, 1L),  // equal lengths: excluded
      (2L, 3L, 3L))  // delta 120 -> bucket 2, longer wins
      .toDF("a", "b", "w")
    val out = Preference.lengthBias(c, col("a"), col("b"), col("w"),
        lens, col("item"), col("len"), bucketWidth = 50)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(2L -> (3L, 2L, 66L)))
  }
}
