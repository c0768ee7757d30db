package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the paired bootstrap: determinism, the all-positive and
  * all-negative limits, and experiment independence. */
class EvalStatsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], b: Int = 50) =
    EvalStats.pairedBootstrap(rows.toDF("e", "i", "d"),
        col("e"), col("i"), col("d"), resamples = b)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))).toMap

  test("uniformly positive deltas are significant; negative are not") {
    val pos = (1L to 40L).map(i => ("up", i, 3L))
    val neg = (1L to 40L).map(i => ("down", i, -3L))
    val out = run(pos ++ neg)
    // any non-empty resample of all-positive deltas sums positive;
    // only the (rare, possibly absent) all-zero-weight draw is <= 0
    val (_, _, nonposUp, pUp) = out("up")
    assert(pUp <= 2, s"all-positive experiment must be significant, p=$pUp%")
    val (_, _, nonposDown, _) = out("down")
    assert(nonposDown == 50L, "all-negative deltas can never sum positive")
    assert(nonposUp + nonposDown >= 50L)
  }

  test("the test is deterministic across runs") {
    val rows = (1L to 30L).map(i => ("e", i, (i % 7) - 3))
    assert(run(rows) == run(rows))
  }
}
