package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch behavioral analytics over keyed event streams — gap-based
  * sessionization and cohort retention, the two queries every
  * clickstream/product-analytics engine ships and a CDC-fed events
  * table feeds directly. (The STREAMING twins live in
  * [[graft.streaming.StreamingOps]]: `sessionCounts` windows the live
  * stream with watermark state; these are the replay/backfill forms
  * over the delivered history. The gap rule is `diff <= gap` — the
  * same closed-boundary semantics as Spark's `session_window`, so a
  * batch backfill reproduces the live stream's sessions verbatim;
  * StreamingSpec's parity test pins this.)
  *
  * Both are pure integer/window algebra — no UDFs, no driver state —
  * so any engine replays them bit-for-bit.
  */
object Sessions {

  /** Gap-based sessionization: events of one key belong to the same
    * session while consecutive gaps stay ≤ `gapUs`. Returns one row
    * per session: (k, session_idx, n_events, start_us, end_us,
    * duration_us), `session_idx` counting from 1 in time order.
    *
    * Spark shape: the session boundary (lag) and the running
    * session-index sum stack on ONE (key) exchange + ONE sort — both
    * windows share the same partitioning and ordering, so Catalyst
    * plans a single Window operator. The per-session rollup is then
    * a (key, session_idx) hash aggregate whose map-side combine
    * collapses event-grain rows to session grain BEFORE its shuffle
    * moves anything.
    *
    * `tieCol` must make (ts, tie) unique per key (an event id) — it
    * pins the order of simultaneous events so the boundary flags,
    * and with them every downstream number, are deterministic in any
    * engine.
    */
  def sessionize(df: DataFrame, keyCol: Column, tsUsCol: Column,
                 tieCol: Column, gapUs: Long): DataFrame = {
    require(gapUs >= 0, s"gapUs must be >= 0, got $gapUs")
    val base = df.select(keyCol.as("k"), tsUsCol.cast("long").as("ts_us"),
      tieCol.as("tie"))
    val w = Window.partitionBy(col("k")).orderBy(col("ts_us"), col("tie"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val newSession = when(
      lag(col("ts_us"), 1).over(w).isNull ||
        col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs, 1L).otherwise(0L)
    base
      .withColumn("session_idx", sum(newSession).over(run))
      .groupBy(col("k"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts_us")).as("start_us"),
           max(col("ts_us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** Cohort retention: each key's cohort is its FIRST active day; the
    * retention matrix counts, per (cohort_day, day_offset), how many
    * keys were active again `day_offset` days after joining. Days are
    * plain integers (the caller's epoch-day column) — no date types
    * cross the engine boundary.
    *
    * Spark shape: one (key, day) distinct (activity collapses to at
    * most days-per-key rows per key), a min-over-key window ON THE
    * SAME key-hashed data, then a (cohort, offset) aggregate whose
    * group count is bounded by days² — corpus-size independent.
    * n_keys needs no count_distinct: the upstream distinct already
    * guarantees one row per (key, day).
    */
  def cohortRetention(df: DataFrame, keyCol: Column, dayCol: Column): DataFrame = {
    val ud = df.select(keyCol.as("k"), dayCol.cast("long").as("d")).distinct()
    val w = Window.partitionBy(col("k"))
    ud.withColumn("cohort_day", min(col("d")).over(w))
      .groupBy(col("cohort_day"), (col("d") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_keys"))
  }

  /** Ordered funnel analysis: per key, how far through the `steps`
    * sequence its event stream progresses — a step counts only AFTER
    * the previous step matched (strictly later in (ts, tie) order),
    * the classic product-analytics funnel. Returns (stage, n_keys)
    * for stages 0..steps.length, every stage present (zero-filled).
    *
    * Spark shape: ONE key-hash aggregate collects each key's
    * event-type sequence in time order (sorted in-group — no window),
    * then a codegen'd `aggregate` fold advances the stage counter
    * through the sequence; the stage histogram is a steps-sized
    * aggregate. Per-key state is the key's OWN event count — the same
    * bound any funnel engine carries. An equivalent no-collect form
    * chains |steps| conditional-min aggregates+joins; one fold over
    * one shuffle wins until per-key sequences themselves don't fit,
    * which at 100 TB is a data-model problem, not a plan problem.
    *
    * The fold is order-deterministic: (ts, tie) must be unique per
    * key (tie = an event id), and ONLY the event-type string rides
    * the shuffle next to the two ordering longs.
    */
  def funnelStages(df: DataFrame, keyCol: Column, tsUsCol: Column,
                   tieCol: Column, typeCol: Column,
                   steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val nSteps = steps.length
    val stepsArr = array(steps.map(lit): _*)
    val perKey = df
      // tie rides UNCAST (any orderable type — string event ids
      // included), exactly like sessionize: a silent cast-to-long would
      // null out non-numeric ties and collapse the (ts, tie) uniqueness
      // contract the fold's determinism rests on
      .select(keyCol.as("k"), tsUsCol.cast("long").as("ts"),
        tieCol.as("tie"), typeCol.as("t"))
      .groupBy(col("k"))
      .agg(array_sort(collect_list(struct(col("ts"), col("tie"), col("t")))).as("evs"))
      .select(col("k"),
        aggregate(col("evs"), lit(0),
          (acc, e) => when(acc < nSteps &&
              e.getField("t") === element_at(stepsArr, acc + 1), acc + 1)
            .otherwise(acc)).as("stage"))
    val allStages = df.sparkSession.range(0, nSteps + 1)
      .select(col("id").cast("int").as("stage"))
    allStages.join(
        perKey.groupBy(col("stage")).agg(count(lit(1)).as("n_keys")),
        Seq("stage"), "left")
      .select(col("stage"), coalesce(col("n_keys"), lit(0L)).as("n_keys"))
  }
}
