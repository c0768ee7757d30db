package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  // key, time, payload fixtures: user 1 has history; user 2 none
  private def rightDf = Seq(
    (1L, 10L, 100L, "a"),
    (1L, 20L, 101L, "b"),
    (1L, 20L, 102L, "b2"), // tie on (key, time) — higher id must win
    (3L, 5L, 103L, null.asInstanceOf[String])) // NULL payload field
    .toDF("user_id", "ts", "rid", "tag")

  private def leftDf = Seq(
    (1L, 9L, 900L),  // before any right row → null match
    (1L, 10L, 901L), // exactly at right ts=10 → inclusive match
    (1L, 25L, 902L), // after both → latest (ts=20, rid=102 by tiebreak)
    (2L, 50L, 903L), // keyless user → null match
    (3L, 6L, 904L))  // matches the null-tag row — tag must stay NULL
    .toDF("user_id", "ts", "lid")

  test("asOf: inclusive at-or-before, tie goes to highest tiebreak, no-match rows keep nulls") {
    val out = TemporalJoin.asOf(leftDf, rightDf,
        keyCols = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        payloadCols = Seq("rid", "tag"), tiebreakCols = Seq("rid"),
        matchedTimeAs = Some("mts"))
      .orderBy("lid")
      .select("lid", "rid", "tag", "mts")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(out == Seq(
      (900L, -1L, null, -1L),
      (901L, 100L, "a", 10L),
      (902L, 102L, "b2", 20L),
      (903L, -1L, null, -1L),
      (904L, 103L, null, 5L))) // matched row exists, its NULL field survives
  }

  test("asOf keep-predicate (tolerance): stale matches are nulled out") {
    val out = TemporalJoin.asOf(leftDf, rightDf,
        keyCols = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        payloadCols = Seq("rid"), tiebreakCols = Seq("rid"),
        keep = Some((lt, rt) => lt - rt <= lit(3L)))
      .orderBy("lid")
      .select("lid", "rid")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    // lid 902 is 5 ticks after ts=20 → outside tolerance 3 → nulled
    assert(out == Seq((900L, -1L), (901L, 100L), (902L, -1L), (903L, -1L), (904L, 103L)))
  }

  test("pointInRange: inclusive bounds, bin-crossing ranges, each pair exactly once") {
    val ranges = Seq((1L, 95L, 105L, 10L), (1L, 200L, 210L, 11L), (2L, 0L, 9L, 12L))
      .toDF("user_id", "s", "e", "range_id")
    val points = Seq((1L, 95L, 1000L), (1L, 105L, 1001L), (1L, 106L, 1002L),
        (1L, 199L, 1003L), (2L, 9L, 1004L), (2L, 10L, 1005L))
      .toDF("user_id", "t", "pid")
    val out = TemporalJoin.pointInRange(points, ranges,
        keyCols = Seq("user_id"), pointTime = "t",
        rangeStart = "s", rangeEnd = "e", binWidth = 10L)
      .select("range_id", "pid").as[(Long, Long)].collect().toSet
    // range 10 spans bins 9..10 and takes both endpoints; 106/199 out;
    // range 12 takes t=9 (inclusive end) but not t=10
    assert(out == Set((10L, 1000L), (10L, 1001L), (12L, 1004L)))
  }

  test("pointInRange guards against ranges spanning too many bins") {
    val ranges = Seq((1L, 0L, 10000L, 1L)).toDF("user_id", "s", "e", "range_id")
    val points = Seq((1L, 5L, 2L)).toDF("user_id", "t", "pid")
    val e = intercept[Exception] {
      TemporalJoin.pointInRange(points, ranges, Seq("user_id"), "t", "s", "e",
        binWidth = 10L, maxBinsPerRange = 64).collect()
    }
    assert(e.getMessage != null)
  }

  test("q10 plans an equi shuffle join, not a nested-loop/cartesian") {
    val df = graft.Queries.byName("q10_range_join")(spark, sfSmoke)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s"range join must stay an equi join:\n$s")
  }

  test("q09 asOf plans one shuffle for the window, no join operator at all") {
    val df = graft.Queries.byName("q09_asof_join")(spark, sfSmoke)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("Join"), s"asOf must be join-free:\n$s")
    assert(s.contains("Window"), s"asOf is window-based:\n$s")
  }
}
