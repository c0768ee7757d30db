package graft.streaming

import graft.SparkSpec
import graft.model.Envelope
import graft.operators.ApplyChanges
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming stateful layer: the flatMapGroupsWithState apply-changes
  * must reach the same final state as the batch ApplyChanges over the
  * same change log (cdc02 semantics), and watermarked dedup must drop
  * in-batch and cross-batch duplicates. */
class StreamingSpec extends SparkSpec {

  private val keySchema = StructType(Seq(StructField("id", IntegerType)))
  private val rowSchema = StructType(Seq(
    StructField("id", IntegerType), StructField("v", StringType)))

  private def line(id: Int, op: String, v: String, lsn: Long): String = {
    val row = s"""{"id":$id,"v":"$v"}"""
    val after = if (op == "d") "null" else row
    s"""{"destination":"t.s.x","key":{"id":$id},"value":{"op":"$op","before":null,"after":$after,"source":{"connector":"pg","db":"d","schema":"s","table":"x","lsn":$lsn,"snapshot":"false","ts_ms":0},"ts_ms":0},"headers":{}}"""
  }

  test("latestStateStream matches batch ApplyChanges over the same log") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val records = input.toDF()
      .select(from_json(col("value"), Envelope.recordSchema(keySchema, rowSchema)).as("r"))
      .select("r.*")
    val changelog = StreamingOps.latestStateStream(records)

    val q = changelog.writeStream.format("memory").queryName("state_out")
      .outputMode("update").start()
    try {
      val batch1 = Seq(line(1, "c", "a1", 1), line(2, "c", "a2", 2), line(3, "c", "a3", 3))
      input.addData(batch1)
      q.processAllAvailable()
      assert(spark.table("state_out").count() == 3)

      // update k2, delete k3, and a STALE update for k1 (lsn 0 < current 1)
      val batch2 = Seq(line(2, "u", "a2-new", 5), line(3, "d", "a3", 6), line(1, "u", "stale", 0))
      input.addData(batch2)
      q.processAllAvailable()

      val emissions = spark.table("state_out")
      // stale k1 update produced no emission
      assert(emissions.filter(col("payload").contains("stale")).count() == 0)

      val streamed = StreamingOps.compactChangelog(emissions)
        .select(get_json_object(col("key"), "$.id").cast("int").as("id"),
                get_json_object(col("payload"), "$.v").as("v"))
        .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq

      // batch reference over the full log
      val allLines = (Seq(line(1, "c", "a1", 1), line(2, "c", "a2", 2), line(3, "c", "a3", 3)) ++
        Seq(line(2, "u", "a2-new", 5), line(3, "d", "a3", 6), line(1, "u", "stale", 0)))
      val batchDf = spark.createDataset(allLines)
        .select(from_json(col("value"), Envelope.recordSchema(keySchema, rowSchema)).as("r"))
        .select("r.*")
      val batched = ApplyChanges.latestState(batchDf,
          keyCols = Seq(col("key.id")),
          orderCols = Seq(coalesce(col("value.source.lsn"), lit(0L))),
          opCol = col("value.op"))
        .select(col("key.id").as("id"), col("value.after.v").as("v"))
        .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq

      assert(streamed == batched)
      assert(streamed == Seq((1, "a1"), (2, "a2-new")))
    } finally q.stop()
  }

  test("changelogDeltaStream: signed emissions telescope to the final state under update/delete/stale") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val records = input.toDF()
      .select(from_json(col("value"), Envelope.recordSchema(keySchema, rowSchema)).as("r"))
      .select("r.*")
    val deltas = StreamingOps.changelogDeltaStream(records)
    val q = deltas.writeStream.format("memory").queryName("delta_out")
      .outputMode("update").start()
    try {
      input.addData(Seq(line(1, "c", "a1", 1), line(2, "c", "a2", 2), line(3, "c", "a3", 3)))
      q.processAllAvailable()
      // creates retract nothing: 3 assertions only
      assert(spark.table("delta_out").count() == 3)
      assert(spark.table("delta_out").filter(col("sign") === -1).count() == 0)

      // update k2 (retract old + assert new), delete k3 (retract only),
      // stale k1 (nothing), delete of a key that never existed (nothing)
      input.addData(Seq(line(2, "u", "a2-new", 5), line(3, "d", "a3", 6),
        line(1, "u", "stale", 0), line(9, "d", "ghost", 7)))
      q.processAllAvailable()
      val em = spark.table("delta_out")
      assert(em.filter(col("payload").contains("stale")).count() == 0)
      assert(em.filter(col("key").contains("9")).count() == 0)
      assert(em.filter(col("sign") === -1).count() == 2) // k2 old, k3

      // signed fold over ALL emissions == per-key final state: k1=a1,
      // k2=a2-new survive; k3 deleted nets to zero
      val net = em
        .select(get_json_object(col("key"), "$.id").cast("int").as("id"),
                col("sign"), get_json_object(col("payload"), "$.v").as("v"))
        .groupBy("id", "v").agg(sum(col("sign")).as("n"))
        .filter(col("n") =!= 0)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
      assert(net == Set((1, "a1", 1L), (2, "a2-new", 1L)))
    } finally q.stop()
  }

  test("GraftSession.builder state backends: memory/rocksdb accepted, anything else fails loudly") {
    graft.GraftSession.builder(stateBackend = "memory")
    graft.GraftSession.builder(stateBackend = "rocksdb")
    intercept[IllegalArgumentException] {
      graft.GraftSession.builder(stateBackend = "leveldb")
    }
  }

  test("latestStateStream on the RocksDB state backend: same results, provider verifiably active") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the provider is a session conf read at query START — GraftSession
    // .builder(stateBackend = "rocksdb") sets the same keys on a fresh
    // session; here they flip on the shared test session and restore
    val keys = graft.GraftSession.streamingStateConfigs
    val saved = keys.keys.map(k => k -> spark.conf.getOption(k)).toMap
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val input = MemoryStream[String]
      val records = input.toDF()
        .select(from_json(col("value"), Envelope.recordSchema(keySchema, rowSchema)).as("r"))
        .select("r.*")
      val q = StreamingOps.latestStateStream(records)
        .writeStream.format("memory").queryName("state_out_rocks")
        .outputMode("update").start()
      try {
        input.addData(Seq(line(1, "c", "a1", 1), line(2, "c", "a2", 2)))
        q.processAllAvailable()
        input.addData(Seq(line(2, "u", "a2-new", 5), line(1, "d", "a1", 6)))
        q.processAllAvailable()
        val rows = StreamingOps.compactChangelog(spark.table("state_out_rocks"))
          .select(get_json_object(col("key"), "$.id").cast("int").as("id"),
                  get_json_object(col("payload"), "$.v").as("v"))
          .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
        assert(rows == Seq((2, "a2-new")))
        // proof the store is actually RocksDB: its provider reports
        // rocksdb* custom state metrics the HDFS-backed one never emits
        val metrics = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq)
          .flatMap(_.customMetrics.keySet().toArray(Array.empty[String]))
        assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
          s"expected rocksdb state metrics, got: ${metrics.mkString(",")}")
      } finally q.stop()
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("deliberate LSN ties: streaming and batch crown the same winner") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two same-key changes at the SAME lsn in one batch — only the
    // shared content tiebreak decides; plus a same-lsn update arriving
    // in a LATER batch, which must beat the stored state (__incoming)
    val tied = Seq(line(7, "u", "first", 9), line(7, "u", "second", 9))
    val lateSameLsn = Seq(line(7, "u", "third", 9))

    val input = MemoryStream[String]
    val records = input.toDF()
      .select(from_json(col("value"), Envelope.recordSchema(keySchema, rowSchema)).as("r"))
      .select("r.*")
    val q = StreamingOps.latestStateStream(records)
      .writeStream.format("memory").queryName("tie_out").outputMode("update").start()
    try {
      input.addData(tied)
      q.processAllAvailable()
      // within one batch the winner must match the batch tiebreak:
      // the SAME (__lsn, __tb) order the upsert sink uses
      val batchDf = spark.createDataset(tied)
        .select(from_json(col("value"), Envelope.recordSchema(keySchema, rowSchema)).as("r"))
        .select("r.*")
      val batchedV = ApplyChanges.latestState(batchDf,
          keyCols = Seq(col("key.id")),
          orderCols = Seq(coalesce(col("value.source.lsn"), lit(0L)),
            xxhash64(concat_ws("|", col("value.op"),
              coalesce(to_json(col("value.after")), lit(""))))),
          opCol = col("value.op"))
        .select(col("value.after.v")).head().getString(0)
      val firstBatchWinner = spark.table("tie_out")
        .select(get_json_object(col("payload"), "$.v").as("v"))
        .head().getString(0)
      assert(firstBatchWinner == batchedV)

      // a same-lsn update in a LATER batch beats stored state
      // (incoming wins the lsn tie, like the sink's __incoming)
      input.addData(lateSameLsn)
      q.processAllAvailable()
      assert(spark.table("tie_out").filter(col("payload").contains("third")).count() == 1)

      // replaying the identical change must be a no-op (winner equals
      // stored state → no emission) — proving state holds "third"
      val before = spark.table("tie_out").count()
      input.addData(lateSameLsn)
      q.processAllAvailable()
      assert(spark.table("tie_out").count() == before)
    } finally q.stop()
  }

  test("windowedCounts finalizes windows behind the watermark and drops late rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "dest")
    val counts = StreamingOps.windowedCounts(df, "ts", "dest", "1 minute", "2 minutes")
    val q = counts.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData(Seq((t("2024-01-01 10:00:10"), "a"), (t("2024-01-01 10:00:20"), "a"),
                        (t("2024-01-01 10:01:10"), "b")))
      q.processAllAvailable()
      // advance the watermark far past the first windows so they emit
      input.addData(Seq((t("2024-01-01 10:10:00"), "a")))
      q.processAllAvailable()
      // a LATE row for the long-closed first window must be dropped
      input.addData(Seq((t("2024-01-01 10:00:30"), "a")))
      q.processAllAvailable()
      input.addData(Seq((t("2024-01-01 10:20:00"), "a"))) // close everything
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", "a", 2L))) // late row NOT counted
      assert(rows.contains(("2024-01-01 10:01:00.0", "b", 1L)))
    } finally q.stop()
  }

  test("curateStream gates low-quality docs and dedups the survivors continuously") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text")
    val good = "the quick brown fox jumps over the lazy dog again and again today"
    val curated = graft.llm.Curation.curateStream(df, col("text"),
      graft.llm.Curation.Config(minTokens = 8, maxPunctRatio = 0.3, keepLangs = Set("en")),
      "ts", "10 minutes")
    val q = curated.writeStream.format("memory").queryName("curate_out")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      input.addData(Seq(
        (t0, 1L, good),
        (t0, 2L, "too short"),                    // gated: under minTokens
        (t0, 3L, "!!! ??? *** !!! ??? *** !!! ??? *** !!!"), // gated: punctuation
        (t0, 4L, good)))                          // in-batch duplicate of 1
      q.processAllAvailable()
      input.addData(Seq((t0, 5L, good)))          // cross-batch duplicate
      q.processAllAvailable()
      val ids = spark.table("curate_out").select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(1L), s"expected only doc 1 to survive, got $ids")
    } finally q.stop()
  }

  test("sessionCounts merges events within the gap and closes sessions across it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "dest")
    val sessions = StreamingOps.sessionCounts(df, "ts", "dest", "1 minute", "2 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      // burst of 3 events ≤1 min apart → ONE session; then a 10-min gap
      input.addData(Seq((t("2024-01-01 10:00:00"), "a"), (t("2024-01-01 10:00:30"), "a"),
                        (t("2024-01-01 10:01:10"), "a")))
      q.processAllAvailable()
      input.addData(Seq((t("2024-01-01 10:12:00"), "a"))) // new session, advances watermark
      q.processAllAvailable()
      input.addData(Seq((t("2024-01-01 10:30:00"), "a"))) // close everything open
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(2), r.getLong(3))).toSet
      // the burst merged into one 3-event session ending 10:02:10
      assert(rows.contains(("2024-01-01 10:00:00.0", "a", 3L)), s"got $rows")
      assert(rows.contains(("2024-01-01 10:12:00.0", "a", 1L)), s"got $rows")
    } finally q.stop()
  }

  test("sessionCounts backfill parity: streaming sessions equal batch Sessions.sessionize") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // session_window's windows are CLOSED at the gap boundary: events
    // exactly `gap` apart still merge — the same `diff <= gap` rule
    // the batch operator uses, so the gaps line up verbatim
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (t("2024-01-01 10:00:00"), "a"), (t("2024-01-01 10:00:59"), "a"),
      (t("2024-01-01 10:01:59"), "a"),   // 60 s exactly → MERGES in both
      (t("2024-01-01 10:03:00"), "a"),
      (t("2024-01-01 10:00:10"), "b"), (t("2024-01-01 10:01:09"), "b"),
      // per-key flush far ahead: closes every earlier session
      (t("2024-01-01 11:00:00"), "a"), (t("2024-01-01 11:00:00"), "b"))

    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "dest")
    val q = StreamingOps.sessionCounts(df, "ts", "dest", "1 minute", "2 minutes")
      .writeStream.format("memory").queryName("sess_parity").outputMode("append").start()
    val streamed = try {
      input.addData(events.take(6)); q.processAllAvailable()
      input.addData(events.drop(6)); q.processAllAvailable()
      spark.table("sess_parity")
        .collect().map(r => (r.getString(2), r.getTimestamp(0).getTime * 1000, r.getLong(3))).toSet
    } finally q.stop()

    val batch = graft.operators.Sessions.sessionize(
        events.toDF("ts", "dest").select(col("dest"),
          unix_micros(col("ts")).as("ts_us"), monotonically_increasing_id().as("id")),
        col("dest"), col("ts_us"), col("id"), gapUs = 60000000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // streaming emits only watermark-closed sessions — drop each key's
    // open last (flush) session from the batch side before comparing
    val lastIdx = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val batchClosed = batch.filter { case (k, i, _, _) => i != lastIdx(k) }
      .map { case (k, _, n, start) => (k, start, n) }.toSet
    assert(streamed == batchClosed, s"stream $streamed vs batch $batchClosed")
  }

  test("newKeyCounts: per-window first occurrences match batch first-day attribution; repeats never recount") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (t("2024-01-01 10:00:00"), 1L), (t("2024-01-01 11:00:00"), 2L),
      (t("2024-01-01 12:00:00"), 1L),                       // repeat: not new
      (t("2024-01-02 09:00:00"), 3L), (t("2024-01-02 10:00:00"), 1L), // 1 repeats cross-day
      (t("2024-01-03 09:00:00"), 4L), (t("2024-01-03 10:00:00"), 5L),
      // flush event far ahead: finalizes every earlier window
      (t("2024-01-10 00:00:00"), 99L))

    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val df = input.toDF().toDF("ts", "user_id")
    val q = StreamingOps.newKeyCounts(df, "ts", col("user_id"),
        windowDuration = "1 day", watermarkDelay = "1 day")
      .writeStream.format("memory").queryName("newkeys").outputMode("append").start()
    val streamed = try {
      input.addData(events.take(5)); q.processAllAvailable()
      input.addData(events.drop(5)); q.processAllAvailable()
      spark.table("newkeys").collect()
        .map(r => r.getTimestamp(0).toString.take(10) -> r.getLong(1)).toMap
    } finally q.stop()
    // batch truth: first-occurrence attribution per day (q22's core)
    val batch = events.toDF("ts", "user_id")
      .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("first_day"))
      .groupBy(col("first_day")).agg(count(lit(1)).as("new_users"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(streamed.view.filterKeys(_ < "2024-01-10").toMap ==
      batch.view.filterKeys(_ < "2024-01-10").toMap,
      s"stream $streamed vs batch $batch")
  }

  test("funnelStagesStream: stage advances match the batch fold; late pre-match events are monotone-guarded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1 completes view→click→purchase with distractors between;
    // user 2 clicks BEFORE viewing (click must not count, then a later
    // click after the view does); user 3 only views
    val events = Seq(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "other"), (1L, 30L, 3L, "click"),
      (2L, 5L, 4L, "click"), (2L, 15L, 5L, "view"),
      (3L, 8L, 6L, "view"),
      // second batch: the purchase lands, user 2's post-view click lands
      (1L, 40L, 7L, "purchase"), (2L, 25L, 8L, "click"))
    val steps = Seq("view", "click", "purchase")

    val input = MemoryStream[(Long, Long, Long, String)]
    val df = input.toDF().toDF("user_id", "ts_us", "event_id", "event_type")
    val q = StreamingOps.funnelStagesStream(df, col("user_id"), col("ts_us"),
        col("event_id"), col("event_type"), steps)
      .writeStream.format("memory").queryName("funnel_parity").outputMode("update").start()
    val streamedFinal = try {
      input.addData(events.take(6)); q.processAllAvailable()
      input.addData(events.drop(6)); q.processAllAvailable()
      // replay of batch 2 (at-least-once): already-applied positions
      // must be absorbed, not advance stages twice
      input.addData(events.drop(6)); q.processAllAvailable()
      val emissions = spark.table("funnel_parity")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      // each advance emits exactly once
      assert(emissions.distinct.size == emissions.size, s"duplicate emissions: $emissions")
      emissions.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    } finally q.stop()
    assert(streamedFinal == Map(1L -> 3, 2L -> 2, 3L -> 1))

    // batch parity: fold over the same full log, zero-filled histogram
    val batch = graft.operators.Sessions.funnelStages(
        events.toDF("user_id", "ts_us", "event_id", "event_type"),
        col("user_id"), col("ts_us"), col("event_id"), col("event_type"), steps)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val streamedHist = (0 to steps.length).map(stg =>
      stg -> streamedFinal.values.count(_ == stg).toLong).toMap
    assert((0 to 3).forall(stg => batch(stg) == streamedHist(stg)),
      s"batch $batch vs streamed $streamedHist")
  }

  test("dedupExactStream drops in-batch and cross-batch duplicates within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "text")
    val deduped = StreamingOps.dedupExactStream(df, col("text"), "ts", "10 minutes")

    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:01:00")
      input.addData(Seq((t0, "doc A"), (t0, "doc A"), (t0, "doc B")))
      q.processAllAvailable()
      input.addData(Seq((t1, "doc A"), (t1, "doc C"))) // cross-batch dup + new
      q.processAllAvailable()
      val texts = spark.table("dedup_out").select("text")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(texts == Seq("doc A", "doc B", "doc C"))
    } finally q.stop()
  }

  test("dedupAgainstIndexStream: seen replays dropped by the bloom+anti-join, fresh docs pass, in-stream dups collapse") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val seen = (1 to 100).map(i => s"seen doc $i").toDF("text")
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "text")
    val out = StreamingOps.dedupAgainstIndexStream(df, col("text"),
      seen, col("text"), "ts", "10 minutes", expectedItems = 100L)

    val q = out.writeStream.format("memory").queryName("idx_dedup_out")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:01:00")
      input.addData(Seq((t0, "seen doc 1"), (t0, "fresh X"), (t0, "fresh X")))
      q.processAllAvailable()
      input.addData(Seq((t1, "seen doc 42"), (t1, "fresh X"), (t1, "fresh Y")))
      q.processAllAvailable()
      val texts = spark.table("idx_dedup_out").select("text")
        .collect().map(_.getString(0)).sorted.toSeq
      // replays of the index never surface; fresh X once; fresh Y once
      assert(texts == Seq("fresh X", "fresh Y"))
    } finally q.stop()
  }

  test("intervalJoinStream joins within the time bound only; batch-identical") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val imp = MemoryStream[(java.sql.Timestamp, String, String)]
    val clk = MemoryStream[(java.sql.Timestamp, String, String)]
    val out = StreamingOps.intervalJoinStream(
      imp.toDF().toDF("imp_ts", "ad", "imp_id"), "ad", "imp_ts",
      clk.toDF().toDF("clk_ts", "clk_ad", "clk_id"), "clk_ad", "clk_ts",
      watermarkDelay = "5 seconds", within = "10 seconds")
    val q = out.writeStream.format("memory").queryName("ivj_out")
      .outputMode("append").start()
    try {
      imp.addData((ts(10), "a1", "I10"), (ts(30), "a2", "I30"))
      clk.addData((ts(15), "a1", "C15")) // inside I10's [10, 20] window
      q.processAllAvailable()
      // C25 is 15s after I10 → OUTSIDE within=10; C35 inside I30's window
      clk.addData((ts(25), "a1", "C25"), (ts(35), "a2", "C35"))
      q.processAllAvailable()
      val got = spark.table("ivj_out").select("imp_id", "clk_id").collect()
        .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      assert(got == Seq(("I10", "C15"), ("I30", "C35")), s"got $got")
      // batch parity: the same relation over the same events
      val lb = Seq((ts(10), "a1", "I10"), (ts(30), "a2", "I30"))
        .toDF("imp_ts", "ad", "imp_id")
      val rb = Seq((ts(15), "a1", "C15"), (ts(25), "a1", "C25"), (ts(35), "a2", "C35"))
        .toDF("clk_ts", "clk_ad", "clk_id")
      val batch = lb.join(rb, col("ad") === col("clk_ad") &&
          col("clk_ts") >= col("imp_ts") &&
          col("clk_ts") <= col("imp_ts") + expr("INTERVAL 10 seconds"))
        .select("imp_id", "clk_id").collect()
        .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      assert(got == batch)
    } finally q.stop()
  }

  test("asOfEnrichStream matches batch asOf under out-of-order arrival; quiet keys drain by timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val lIn = MemoryStream[(java.sql.Timestamp, String, String)]
    val rIn = MemoryStream[(java.sql.Timestamp, String, String)]
    def shape(ms: MemoryStream[(java.sql.Timestamp, String, String)]) =
      ms.toDF().toDF("ts", "key", "payload")
    val out = StreamingOps.asOfEnrichStream(shape(lIn), shape(rIn), "5 seconds")
    val q = out.writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      // batch1: left@9 BEFORE its right@10 exists yet; left@15 pending
      lIn.addData((ts(9), "k1", "L9"), (ts(15), "k1", "L15"))
      // k2 gets one left then goes quiet — must drain via timeout
      lIn.addData((ts(12), "k2", "Q12"))
      rIn.addData((ts(10), "k1", "R10"), (ts(11), "k2", "R11"))
      q.processAllAvailable()
      // batch2: right@20 arrives AFTER left@15 was buffered (out of order)
      rIn.addData((ts(20), "k1", "R20"))
      lIn.addData((ts(25), "k1", "L25"))
      q.processAllAvailable()
      // batch3: watermark pushed to 35 by left@40 (stays pending) — k1
      // drains in-function, quiet k2 drains via the event-time timeout
      lIn.addData((ts(40), "k1", "L40"))
      q.processAllAvailable()
      // the GLOBAL watermark is the min across BOTH input streams
      // (multipleWatermarkPolicy=min) and applies one batch after the
      // event arrives — advance the right stream too, then nudge one
      // more batch (unrelated key) so the timeouts actually fire
      rIn.addData((ts(41), "k3", "rnudge"))
      q.processAllAvailable()
      lIn.addData((ts(41), "k3", "nudge"))
      q.processAllAvailable()

      val got = spark.table("asof_out")
        .select(col("key"), col("t"), col("payload"),
          col("matchedT"), col("matchedPayload"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) null else r.getString(4)))
        .sortBy(x => (x._1, x._2)).toSeq
      // L9 precedes every right → null; L15 → R10; L25 → R20; Q12 → R11
      assert(got == Seq(
        ("k1", 9000L, "L9", -1L, null),
        ("k1", 15000L, "L15", 10000L, "R10"),
        ("k1", 25000L, "L25", 20000L, "R20"),
        ("k2", 12000L, "Q12", 11000L, "R11")),
        s"got $got")

      // batch reference: TemporalJoin.asOf over the SAME emitted events
      val lb = Seq(("k1", 9000L, "L9"), ("k1", 15000L, "L15"), ("k1", 25000L, "L25"),
          ("k2", 12000L, "Q12")).toDF("key", "t", "payload")
      val rb = Seq(("k1", 10000L, "R10"), ("k1", 20000L, "R20"),
          ("k2", 11000L, "R11"))
        .toDF("key", "rt", "matchedPayload")
        .withColumn("tb", lit(0L))
      val batch = graft.operators.TemporalJoin.asOf(lb, rb,
          keyCols = Seq("key"), leftTime = "t", rightTime = "rt",
          payloadCols = Seq("matchedPayload"), tiebreakCols = Seq("tb"),
          matchedTimeAs = Some("matchedT"))
        .select(col("key"), col("t"), col("payload"), col("matchedT"), col("matchedPayload"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) null else r.getString(4)))
        .sortBy(x => (x._1, x._2)).toSeq
      assert(got == batch)
    } finally q.stop()
  }

  test("asOf history TTL: left traffic keeps an old dimension row alive; quiet keys expire; MaxValue disables") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val lIn = MemoryStream[(java.sql.Timestamp, String, String)]
    val rIn = MemoryStream[(java.sql.Timestamp, String, String)]
    def shape(ms: MemoryStream[(java.sql.Timestamp, String, String)]) =
      ms.toDF().toDF("ts", "key", "payload")
    // tight TTL (10 s of event time) so expiry is reachable in-test;
    // watermark delay 5 s; nudge BOTH streams (global wm = min across streams)
    val out = StreamingOps.asOfEnrichStream(shape(lIn), shape(rIn), "5 seconds",
      historyTtlMs = 10000L)
    val q = out.writeStream.format("memory").queryName("asof_ttl_out")
      .outputMode("append").start()
    try {
      def nudge(sec: Long): Unit = {
        lIn.addData((ts(sec), "kx", s"ln$sec")); rIn.addData((ts(sec), "kx", s"rn$sec"))
        q.processAllAvailable()
      }
      def matchOf(payload: String): Option[String] = {
        val rows = spark.table("asof_ttl_out").filter(col("payload") === payload)
          .select("matchedPayload").collect()
        assert(rows.length == 1, s"expected exactly one emission for $payload")
        Option(rows(0).getString(0))
      }
      // k2's dimension row is at t=10; its left traffic continues far
      // past 10+TTL. Right-history age alone would expire the key
      // (10+TTL=20 is behind the watermark from t=25 on) — the
      // both-sides activity clock must not.
      rIn.addData((ts(10), "k2", "R10")); lIn.addData((ts(11), "k2", "L11"))
      q.processAllAvailable()
      lIn.addData((ts(22), "k2", "L22")); nudge(22)
      lIn.addData((ts(29), "k2", "L29")); nudge(29)
      lIn.addData((ts(36), "k2", "L36")); nudge(36)
      nudge(48) // wm 43 ≥ 20: drains L36 by timeout with NO pending lefts —
                // a right-age-only TTL would remove the state right here
                // (keep.max 10 + TTL 10 ≤ 43); activity at 36 is within TTL
      // the probe left arrives ABOVE the watermark (44 > 43 — not late)
      // and drains later: it must still find R10
      lIn.addData((ts(44), "k2", "L44"))
      q.processAllAvailable()
      nudge(60) // wm 55: drains L44; afterwards lastActivity(44)+TTL(10) ≤ 55
                // → the same invocation expires the now-quiet key
      Seq("L11", "L22", "L29", "L36", "L44").foreach { p =>
        assert(matchOf(p) == Some("R10"), s"$p must enrich from the kept dimension row")
      }
      // post-expiry: a fresh above-watermark left finds nothing
      lIn.addData((ts(56), "k2", "L56"))
      q.processAllAvailable()
      nudge(70) // wm 65: drains L56 against removed state
      assert(matchOf("L56") == None, "post-TTL left must enrich to null")
    } finally q.stop()
  }

  test("satAdd saturates only when t > 0; pre-epoch t must not disable the TTL") {
    // positive t near the ceiling: saturate instead of wrapping negative
    assert(StreamingOps.satAdd(Long.MaxValue - 5, 10L) == Long.MaxValue)
    assert(StreamingOps.satAdd(1L, Long.MaxValue) == Long.MaxValue)
    // t <= 0 can never overflow for positive ttl — the old guard
    // (`ttl > Long.MaxValue - t` alone) wrapped for negative t and
    // wrongly saturated, permanently disabling the history TTL for
    // pre-epoch lastActivity values
    assert(StreamingOps.satAdd(0L, 10L) == 10L)
    assert(StreamingOps.satAdd(-1000L, 10L) == -990L)
    assert(StreamingOps.satAdd(-1000L, Long.MaxValue) == Long.MaxValue - 1000L)
    assert(StreamingOps.satAdd(Long.MinValue, Long.MaxValue) == -1L)
  }

  test("asOf history TTL = Long.MaxValue disables expiry (no overflow wrap)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val lIn = MemoryStream[(java.sql.Timestamp, String, String)]
    val rIn = MemoryStream[(java.sql.Timestamp, String, String)]
    def shape(ms: MemoryStream[(java.sql.Timestamp, String, String)]) =
      ms.toDF().toDF("ts", "key", "payload")
    val out = StreamingOps.asOfEnrichStream(shape(lIn), shape(rIn), "5 seconds",
      historyTtlMs = Long.MaxValue)
    val q = out.writeStream.format("memory").queryName("asof_nottl_out")
      .outputMode("append").start()
    try {
      // right-only key, then a long quiet stretch: a wrapped
      // lastActivity+ttl would drop the state at the first timeout
      rIn.addData((ts(10), "k1", "R10")); lIn.addData((ts(10), "kx", "ln10"))
      q.processAllAvailable()
      Seq(100L, 101L, 102L).foreach { s =>
        lIn.addData((ts(s), "kx", s"ln$s")); rIn.addData((ts(s), "kx", s"rn$s"))
        q.processAllAvailable()
      }
      // an above-watermark left far past any finite horizon still
      // matches once it drains (wm 97 → left at 103, drains at wm 110)
      lIn.addData((ts(103), "k1", "L103"))
      q.processAllAvailable()
      Seq(115L, 116L).foreach { s =>
        lIn.addData((ts(s), "kx", s"ln$s")); rIn.addData((ts(s), "kx", s"rn$s"))
        q.processAllAvailable()
      }
      val m = spark.table("asof_nottl_out").filter(col("payload") === "L103")
        .select("matchedPayload").collect()
      assert(m.length == 1 && m(0).getString(0) == "R10",
        "disabled TTL must retain dimension state indefinitely")
    } finally q.stop()
  }

  test("bigramScoreStream: streaming scores against a static model equal the batch scorer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.llm.LanguageModel
    val corpus = Seq((1L, "a b a b a"), (2L, "a b c"), (3L, "c c c c")).toDF("id", "text")
    val model = LanguageModel.fitBigramModel(corpus, col("text"))
    val batch = LanguageModel.bigramScore(corpus, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val scored = LanguageModel.bigramScoreStream(
      input.toDF().toDF("id", "ts", "text"), col("id"), col("text"),
      model, "ts", watermarkDelay = "2 minutes")
    val q = scored.writeStream.format("memory").queryName("lm_stream")
      .outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData(Seq((1L, t("2024-01-01 10:00:10"), "a b a b a"),
                        (2L, t("2024-01-01 10:00:20"), "a b c"),
                        (3L, t("2024-01-01 10:00:30"), "c c c c")))
      q.processAllAvailable()
      input.addData(Seq((9L, t("2024-01-01 10:30:00"), "a b"))) // advance the watermark
      q.processAllAvailable()
      val streamed = spark.table("lm_stream")
        .select("doc_id", "n_bigrams", "avg_bigram_p")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      // scoring the model's own corpus reproduces the batch scorer bit-for-bit
      batch.foreach { case (id, v) =>
        assert(streamed.get(id).contains(v), s"doc $id: streamed ${streamed.get(id)} vs batch $v")
      }
      // a stream doc with transitions unseen by the model hits the
      // smoothing floor: present, positive, below every in-model score
      val unseen = streamed.find(_._1 == 9L)
      assert(unseen.isEmpty || unseen.get._2._2 > 0.0) // window may not close; floor if it did
    } finally q.stop()
  }

  test("nearDupFlagsStream: flag set equals the batch band join under any batch split; redeliveries absorb") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "in the morning light across the quiet river meadow"
    val docs = Seq(
      (1L, base + " d1"),
      (2L, base + " d1 qx"), // near-dup of 1 (and of 4)
      (3L, "completely different content about streaming state machines " +
        "and watermark eviction semantics in micro batch engines d3"),
      (4L, base + " d1 qy")) // near-dup of 1 and 2
    // the expected flag ledger, from the SAME primitives composed the
    // batch way (signature → 3×4 bands → per-band pairs → component
    // agreement) — the streaming run must reproduce it exactly
    val sigs = docs.map { case (id, t) =>
      id -> graft.functions.MinhashSigs
        .sigs(org.apache.spark.unsafe.types.UTF8String.fromString(t), 9, 12)
        .toLongArray()
    }.toMap
    val expected = (for {
      b <- 0 until 3
      Seq((ia, _), (ib, _)) <- {
        val byBucket = sigs.toSeq.map { case (id, sg) =>
          id -> graft.functions.Portable.hash64Jvm(
            (4 * b until 4 * (b + 1)).map(sg).mkString("_"))
        }.groupBy(_._2).values
        byBucket.flatMap(_.sortBy(_._1).combinations(2))
      }
      eq = (0 until 12).count(i => sigs(ia)(i) == sigs(ib)(i))
      if eq >= 6
    } yield (b, ia, ib, eq)).toSet
    assert(expected.exists(f => f._2 == 1L && f._3 == 2L), "fixture must plant near-dups")
    assert(!expected.exists(f => f._2 == 3L || f._3 == 3L), "doc 3 must not collide")

    def run(batches: Seq[Seq[Long]], name: String): Set[(Int, Long, Long, Int)] = {
      val byId = docs.toMap
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      val input = MemoryStream[(Long, java.sql.Timestamp, String)]
      val df = input.toDF().toDF("doc_id", "ts", "text")
      val flags = StreamingOps.nearDupFlagsStream(df, col("doc_id"), col("text"),
        "ts", n = 9, k = 12, rowsPerBand = 4, minMatches = 6, watermarkDelay = "1 hour")
      val q = flags.toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { ids =>
          input.addData(ids.map(id => (id, t0, byId(id))))
          q.processAllAvailable()
        }
        spark.table(name).collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      } finally q.stop()
    }
    // one batch; split batches arriving out of id order; a replayed doc
    val oneShot = run(Seq(Seq(1L, 2L, 3L, 4L)), "ndf_one")
    val split = run(Seq(Seq(4L, 3L), Seq(2L), Seq(1L, 4L)), "ndf_split")
    assert(oneShot == expected, s"one-batch run diverged: $oneShot vs $expected")
    assert(split == expected, s"split run (with redelivery) diverged: $split vs $expected")

    // PROPERTY leg: the flag set must be invariant under RANDOM batch
    // splits, arrival orders, and injected redeliveries (seeded RNG —
    // reproducible; randomness only permutes delivery, never content)
    val rnd = new scala.util.Random(42)
    (1 to 4).foreach { case_i =>
      val order = rnd.shuffle(docs.map(_._1))
      val cuts = (0 until rnd.nextInt(3)).map(_ => 1 + rnd.nextInt(3)).sorted.distinct
      val batches0 = (Seq(0) ++ cuts ++ Seq(4)).distinct.sliding(2)
        .map { case Seq(a, b) => order.slice(a, b) }.filter(_.nonEmpty).toSeq
      // inject a redelivery of one already-sent doc into the last batch
      val redo = batches0.head.head
      val batches = batches0.init :+ (batches0.last :+ redo)
      val got = run(batches, s"ndf_prop_$case_i")
      assert(got == expected,
        s"random split $batches diverged: $got vs $expected")
    }
  }

  test("nearDupFlagsStream maxBucketOccupancy: caps per-bucket state, evicting the oldest member") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "in the morning light across the quiet river meadow"
    // IDENTICAL text under distinct ids: the signatures agree in every
    // component, so all three docs share every band bucket and any
    // uncapped run would emit all three pairs per band — the sharpest
    // lens on what the cap drops
    val docs = Map(1L -> (base + " d1"), 2L -> (base + " d1"), 4L -> (base + " d1"))
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = input.toDF().toDF("doc_id", "ts", "text")
    // cap = 1: each bucket holds ONE member — doc 2 pairs with 1 then
    // replaces it (same ts, id tie-break evicts the smaller), doc 4
    // pairs with 2 only; the (1,4) flag is the arrival-order
    // independence the cap documentedly trades for bounded state
    val flags = StreamingOps.nearDupFlagsStream(df, col("doc_id"), col("text"),
      "ts", n = 9, k = 12, rowsPerBand = 4, minMatches = 6,
      watermarkDelay = "1 hour", maxBucketOccupancy = 1)
    val q = flags.toDF().writeStream.format("memory").queryName("ndf_cap")
      .outputMode("append").start()
    try {
      Seq(1L, 2L, 4L).foreach { id =>
        input.addData((id, t0, docs(id))); q.processAllAvailable()
      }
      val got = spark.table("ndf_cap").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val want = (0 until 3).flatMap(b => Seq((b, 1L, 2L), (b, 2L, 4L))).toSet
      assert(got == want, s"capped run emitted $got, expected $want")
    } finally q.stop()
  }

  test("kmvContainmentStream: final rows equal batch kmvContainment under any split; redeliveries absorb") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val k = 8 // small k → srcBig runs in the ESTIMATED regime
    // two sources: one bigger than k (order-statistic estimates), one
    // smaller (exact); eval benchmarks overlap srcBig heavily
    val rows: Seq[(String, String)] =
      (1 to 40).map(i => ("srcBig", s"tok_$i")) ++
      (1 to 3).map(i => ("srcSmall", s"small_$i"))
    val evalDf = ((1 to 30).map(i => ("benchHot", s"tok_$i")) ++
      (1 to 4).map(i => ("benchCold", s"held_$i"))).toDF("g", "v")
    val evalSk = graft.llm.Sketches.kmvSketches(evalDf, col("g"), col("v"), k)
    val trainDf = rows.toDF("g", "v")
    val expected = graft.llm.Sketches.kmvContainment(
        trainDf, col("g"), col("v"), evalDf, col("g"), col("v"), k)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(expected(("srcBig", "benchHot"))._4 > 0.5, "fixture must plant containment")

    def run(batches: Seq[Seq[(String, String)]], name: String)
        : Map[(String, String), (Long, Double, Double, Double)] = {
      val input = MemoryStream[(String, String)]
      val updates = StreamingOps.kmvContainmentStream(
        input.toDF().toDF("g", "v"), col("g"), col("v"), evalSk, k)
      val q = updates.toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("train_source"), col("eval_name"))
          .orderBy(col("n_seen").desc)
        spark.table(name)
          .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
          .filter(col("__rn") === 1)
          .collect()
          .map(r => (r.getString(0), r.getString(1)) ->
            (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
      } finally q.stop()
    }
    val oneShot = run(Seq(rows), "kmv_one")
    assert(oneShot == expected, s"one-batch run diverged:\n$oneShot\nvs\n$expected")
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { case_i =>
      val order = rnd.shuffle(rows)
      val cuts = (0 until rnd.nextInt(3)).map(_ => 1 + rnd.nextInt(rows.size - 1))
        .sorted.distinct
      val batches0 = (Seq(0) ++ cuts ++ Seq(rows.size)).distinct.sliding(2)
        .map { case Seq(a, b) => order.slice(a, b) }.filter(_.nonEmpty).toSeq
      // redeliver the first batch's rows again at the end — the
      // sketch must absorb without moving
      val batches = batches0 :+ batches0.head
      val got = run(batches, s"kmv_prop_$case_i")
      assert(got == expected, s"split $case_i diverged:\n$got\nvs\n$expected")
    }
  }

  test("runningCountsStream: max-count rows equal the batch count under any split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows: Seq[String] =
      Seq.fill(9)("alpha") ++ Seq.fill(5)("beta") ++ Seq.fill(2)("gamma") ++ Seq("delta")
    val expected = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap

    def run(batches: Seq[Seq[String]], name: String): Map[String, Long] = {
      val input = MemoryStream[String]
      val updates = StreamingOps.runningCountsStream(
        input.toDF().toDF("term"), col("term"))
      val q = updates.toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
        spark.table(name)
          .groupBy(col("term"))
          .agg(org.apache.spark.sql.functions.max(col("cnt")).as("cnt"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      } finally q.stop()
    }
    assert(run(Seq(rows), "hh_one") == expected)
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { i =>
      val order = rnd.shuffle(rows)
      val cuts = (0 until 1 + rnd.nextInt(3)).map(_ => 1 + rnd.nextInt(rows.size - 1))
        .sorted.distinct
      val batches = (Seq(0) ++ cuts ++ Seq(rows.size)).distinct.sliding(2)
        .map { case Seq(a, b) => order.slice(a, b) }.filter(_.nonEmpty).toSeq
      assert(run(batches, s"hh_prop_$i") == expected, s"split $i diverged")
    }
  }
}
