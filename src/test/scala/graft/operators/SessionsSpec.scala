package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize splits at gaps above the threshold and rolls up per session") {
    // user 1: events at 0, 10, 1000 (gap 990 > 100 → new session)
    // user 2: one event → one singleton session
    val ev = Seq(
      (1L, 0L, 101L), (1L, 10L, 102L), (1L, 1000L, 103L),
      (2L, 5L, 201L)).toDF("user_id", "ts_us", "event_id")
    val out = Sessions.sessionize(ev, col("user_id"), col("ts_us"),
        col("event_id"), gapUs = 100L)
      .orderBy("k", "session_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, 1L, 2L, 0L, 10L, 10L),
      (1L, 2L, 1L, 1000L, 1000L, 0L),
      (2L, 1L, 1L, 5L, 5L, 0L)))
  }

  test("sessionize: a gap exactly AT the threshold stays in-session; ties never split") {
    val ev = Seq(
      (1L, 0L, 1L), (1L, 100L, 2L),   // gap == threshold → same session
      (1L, 100L, 3L),                 // tied timestamp → same session, any order
      (1L, 201L, 4L)).toDF("user_id", "ts_us", "event_id")
    val out = Sessions.sessionize(ev, col("user_id"), col("ts_us"),
        col("event_id"), gapUs = 100L)
      .orderBy("session_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 3L), (2L, 1L)))
  }

  test("funnelStages advances only on strictly-later matches; all stages zero-filled") {
    val ev = Seq(
      (1L, 1L, 1L, "view"), (1L, 2L, 2L, "click"), (1L, 3L, 3L, "purchase"), // full funnel
      (2L, 1L, 4L, "click"), (2L, 2L, 5L, "view"),   // click BEFORE view doesn't count
      (3L, 1L, 6L, "view"), (3L, 2L, 7L, "purchase"), // skipped step blocks stage 3
      (4L, 1L, 8L, "error")).toDF("user_id", "ts_us", "event_id", "event_type")
    val out = Sessions.funnelStages(ev, col("user_id"), col("ts_us"),
        col("event_id"), col("event_type"), Seq("view", "click", "purchase"))
      .orderBy("stage").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out.toSeq == Seq((0, 1L), (1, 2L), (2, 0L), (3, 1L)))
  }

  test("cohortRetention counts each key once per (cohort, offset) cell") {
    // key 1 joins day 10, active 10/11/11(dup)/13; key 2 joins day 11, active 11
    val a = Seq((1L, 10L), (1L, 11L), (1L, 11L), (1L, 13L), (2L, 11L))
      .toDF("user_id", "day")
    val out = Sessions.cohortRetention(a, col("user_id"), col("day"))
      .orderBy("cohort_day", "day_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (10L, 0L, 1L), (10L, 1L, 1L), (10L, 3L, 1L), (11L, 0L, 1L)))
  }
}
