package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.Envelope

/** Streaming stateful operators (SURVEY.md §7.2 step 8, §7.5 item 5) —
  * the continuous counterparts of the batch operators:
  *
  *  - [[dedupExactStream]] ↔ graft.llm.Dedup.exact: watermarked
  *    streaming dedup on the 64-bit content hash;
  *  - [[latestStateStream]] ↔ graft.operators.ApplyChanges.latestState:
  *    per-key newest-change state via flatMapGroupsWithState, emitting
  *    a changelog in Update mode.
  *
  * State sizing at 100 TB: state is keyed by the record key and holds
  * ONE compact row per key (lsn + op + serialized payload) — the
  * RocksDB state store backend
  * (spark.sql.streaming.stateStore.providerClass) keeps it off-heap;
  * dedup state is bounded by the watermark horizon. Both operators
  * shuffle once on their key and scale horizontally with
  * spark.sql.shuffle.partitions.
  */
object StreamingOps {

  /** Streaming exact dedup: first occurrence of each content hash
    * passes, duplicates arriving within the watermark horizon are
    * dropped, and state for hashes older than the watermark is evicted
    * (bounded state — the Spark analog of a TTL'd dedup cache).
    * `tsCol` must be an event-time timestamp column. */
  def dedupExactStream(df: DataFrame, contentCol: Column,
                       tsCol: String, watermarkDelay: String): DataFrame =
    df.withColumn("__content_hash", graft.functions.Portable.hash64(contentCol))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__content_hash")

  /** Streaming incremental dedup against a STATIC seen-corpus index —
    * the continuous form of [[graft.llm.Dedup.incrementalExactBloom]]:
    * stream docs whose content hash is definitely not in the index
    * (bloom says no) pass straight through; the mightContain minority
    * is re-checked by a stream-static left-anti join. The bloom builds
    * once from the static frame (scalar subquery — re-evaluated only
    * at query start), so the per-batch cost is a map over the batch
    * plus an anti-join of the maybe-sliver. Within-stream duplicates
    * are then dropped by the watermarked state of
    * [[dedupExactStream]]'s mechanism. Returns the surviving rows. */
  def dedupAgainstIndexStream(df: DataFrame, contentCol: Column,
                              seen: DataFrame, seenContentCol: Column,
                              tsCol: String, watermarkDelay: String,
                              expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val idx = seen.select(graft.functions.Portable.hash64(seenContentCol)
      .as("__content_hash")).distinct()
    val maybeSeen = graft.llm.Dedup.bloomMightContain(idx, col("__content_hash"),
      col("__content_hash"), expectedItems, fpp)
    val hashed = df.withColumn("__content_hash",
      graft.functions.Portable.hash64(contentCol))
    val fresh = hashed.filter(!maybeSeen)
      .unionByName(hashed.filter(maybeSeen)
        .join(idx, Seq("__content_hash"), "left_anti"))
    fresh.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__content_hash")
  }

  /** Watermarked tumbling-window aggregation over a change stream —
    * e.g. changes-per-table-per-minute for rate dashboards. Late rows
    * beyond the watermark are dropped and window state is evicted, so
    * state is bounded by (horizon / window) × #groups regardless of
    * stream length. Append mode emits each window once, when it
    * finalizes. */
  def windowedCounts(df: DataFrame, tsCol: String, groupCol: String,
                     windowDuration: String, watermarkDelay: String): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(groupCol))
      .agg(count(lit(1)).as("n_changes"))
      .select(col("window.start").as("window_start"), col(groupCol), col("n_changes"))

  /** STREAMING new-key counts — q22's continuous counterpart
    * (cumulative distinct counting as first-occurrence attribution):
    * each key's FIRST observed occurrence (watermarked dedup state)
    * lands in its event-time window, and the per-window count is the
    * new-keys series whose running sum is the cumulative distinct
    * count (the running sum itself crosses only the tiny window
    * frame — batch: PrefixSum / one ORDER BY window). Attribution
    * goes to the first occurrence in ARRIVAL order; a key
    * re-appearing after the watermark horizon counts as new again —
    * the standard bounded-state trade, with the exact batch q22 as
    * the backfill. State: dedup keys within the horizon + open
    * windows, both watermark-evicted. */
  def newKeyCounts(df: DataFrame, tsCol: String, keyCol: Column,
                   windowDuration: String, watermarkDelay: String): DataFrame =
    dedupExactStream(df.select(col(tsCol), keyCol.as("__key")),
        col("__key"), tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(count(lit(1)).as("new_keys"))
      .select(col("window.start").as("window_start"), col("new_keys"))

  /** Windowed DISTINCT-actor counts over a change stream — "how many
    * distinct users/tables/tenants changed per hour": a per-(key,
    * window) streaming dedup feeds a windowed count, so each key
    * counts once per window no matter how many changes it made or
    * which of its rows the dedup state kept (every row of the dedup
    * key shares the window BY CONSTRUCTION — the attribution is
    * arrival-order independent, which is what makes the result
    * exactly replayable as a batch count-distinct). The dedup keys
    * state on the RAW (key, window_start) pair — not a 64-bit hash
    * of it like [[dedupExactStream]] does for arbitrary content — so
    * the count is collision-free exact, not exact-modulo-hash; the
    * key here is an actor id, already compact, so the state row
    * costs the same either way. Two chained stateful operators, both
    * watermark-evicted: dedup state is one entry per live (key,
    * window), window state one row per open window. Append mode
    * emits each window once, finalized.
    *
    * EXACTNESS PRECONDITION (enforced): `watermarkDelay` must be at
    * least `windowDuration`. dropDuplicatesWithinWatermark evicts a
    * dedup entry once the watermark passes first_ts + delay; a
    * double-count needs two same-key rows in ONE window separated by
    * more than the delay, which delay ≥ window makes impossible — a
    * shorter delay would re-admit a late duplicate in the eviction
    * gap and silently overcount vs the batch COUNT(DISTINCT). */
  def windowedDistinct(df: DataFrame, tsCol: String, keyCol: Column,
                       windowDuration: String, watermarkDelay: String): DataFrame = {
    def micros(d: String): Long =
      org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(d)) match {
        case i =>
          require(i.months == 0, s"calendar-month durations are ambiguous here: $d")
          i.days * 86400000000L + i.microseconds
      }
    require(micros(watermarkDelay) >= micros(windowDuration),
      s"windowedDistinct: watermarkDelay ($watermarkDelay) must be >= " +
        s"windowDuration ($windowDuration) or late duplicates in the " +
        "eviction gap double-count (see scaladoc)")
    df.withColumn("__w", window(col(tsCol), windowDuration))
      .withColumn("__dk", keyCol)
      .withColumn("__ws", col("__w.start"))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__dk", "__ws")
      .groupBy(window(col(tsCol), windowDuration))
      .agg(count(lit(1)).as("distinct_keys"))
      .select(col("window.start").as("window_start"), col("distinct_keys"))
  }

  /** One banded-LSH stream row: a document's (band, bucket) cell with
    * its full MinHash signature and event time. The signature rides to
    * the state function (k longs — fixed width), the text never does. */
  final case class NearDupIn(band: Int, bucket: Long, docId: Long,
                             ts: java.sql.Timestamp, sig: Array[Long])
  /** One bucket member kept in state: id + event-time ms + signature —
    * O(k) longs per document per band, never the document itself. */
  final case class BucketMember(docId: Long, t: Long, sig: Array[Long])
  final case class BucketState(members: List[BucketMember])
  /** One near-dup flag: in `band`, `flagged_id` (the larger id)
    * collided with `kept_id` and their signatures agree on `matches`
    * of k components (estimated Jaccard = matches/k). */
  final case class NearDupFlag(band: Int, kept_id: Long, flagged_id: Long,
                               matches: Int)

  /** STREAMING near-dedup — the continuous twin of the batch
    * MinHash/LSH pipeline (graft.llm.Dedup.lshBuckets →
    * candidatePairs, llm05) and of the delta-batch
    * Dedup.incrementalNearDup (llm46), for the corpus that arrives as
    * a stream and must flag near-duplicates AGAINST EVERYTHING
    * ALREADY INGESTED without ever rescanning it: each document's
    * k-component MinHash signature computes in one native codegen
    * pass (graft.functions.MinhashSigs — strings never shuffle), the
    * signature explodes into k/rowsPerBand banded LSH buckets, and a
    * per-(band, bucket) flatMapGroupsWithState keeps the bucket's
    * members (id + k signature longs — never text) as state. An
    * arriving document compares against exactly its bucket's members
    * — the LSH contract that makes streaming near-dedup
    * O(bucket occupancy), never O(corpus) — and every pair whose
    * signatures agree on ≥ `minMatches` of k components emits one
    * flag for the LARGER id, attributed to the smaller (kept) id.
    *
    * The flag SET is arrival-order and micro-batch-boundary
    * independent: each (band, pair) is evaluated exactly once — by
    * whichever member arrives second — and the kept/flagged roles
    * depend only on the ids, so AvailableNow replays and shifted
    * batch boundaries produce the same rows (emission TIMING varies,
    * the set does not). At-least-once delivery is absorbed in state:
    * a redelivered document finds its id already among the bucket's
    * members and neither re-emits nor re-compares.
    *
    * Bounded state: members older than the event-time watermark are
    * dropped at every invocation and an event-time timeout reaps
    * buckets idle past the horizon — state is O(documents within the
    * watermark horizon × bands), the same bounded-dedup trade as
    * [[dedupExactStream]] (a near-dup of a document older than the
    * horizon is no longer flagged; the batch pipeline is the
    * backfill). HOT BUCKETS: per-arrival work is O(bucket occupancy)
    * signature compares (membership probes are O(1) via a per-
    * invocation id set) — a production corpus that hashes boilerplate
    * into mega-buckets needs a bucket-size cap, surfaced here as
    * `maxBucketOccupancy` (Dedup.candidatePairs maxBucketSize is the
    * batch analog). The cap is NOT default-on: it necessarily trades
    * arrival-order independence for the bound (emitted flags cannot
    * retract, and which member is "oldest" depends on delivery
    * order) — set it for production streams, leave unbounded for the
    * oracle-replayable configuration.
    * EXACTNESS PRECONDITION (the cdc37 discipline): with
    * `watermarkDelay` at least the stream's event-time span, nothing
    * evicts mid-run and the result equals the batch LSH pair list
    * with the same banding and threshold, which is what the oracle
    * replays. One shuffle on (band, bucket); per-pair work is k
    * integer compares; RocksDB-ready fixed-width state. */
  def nearDupFlagsStream(df: DataFrame, idCol: Column, textCol: Column,
                         tsCol: String, n: Int, k: Int, rowsPerBand: Int,
                         minMatches: Int, watermarkDelay: String,
                         maxBucketOccupancy: Int = Int.MaxValue): Dataset[NearDupFlag] = {
    require(k % rowsPerBand == 0, "k must be divisible by rowsPerBand")
    require(minMatches >= 1 && minMatches <= k, s"minMatches must be in [1, $k]")
    require(maxBucketOccupancy >= 1, "maxBucketOccupancy must be >= 1")
    val sigs = df
      .select(idCol.cast("long").as("docId"), col(tsCol).as("ts"), textCol.as("__t"))
      .where(col("__t").isNotNull) // null text = no shingles (Dedup's drop contract)
      .select(col("docId"), col("ts"),
        graft.functions.MinhashSigs(col("__t"), n, k, withSet = false).as("__mh"))
    // same band/bucket formula as Dedup.lshBuckets so the batch oracle
    // replays bit-identically (bucket = hash64 of the '_'-joined mins)
    val bands = (0 until k / rowsPerBand).map { b =>
      val comps = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => element_at(col("__mh"), i + 1))
      struct(lit(b).as("band"),
        graft.functions.Portable.hash64(concat_ws("_", comps: _*)).as("bucket"))
    }
    val cells = sigs
      .select(col("docId"), col("ts"), col("__mh"), explode(array(bands: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"),
        col("docId"), col("ts"), col("__mh").as("sig"))
      .withWatermark("ts", watermarkDelay)
    val horizonMs = {
      val i = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(watermarkDelay))
      require(i.months == 0, s"calendar-month horizons are ambiguous here: $watermarkDelay")
      i.days * 86400000L + i.microseconds / 1000L
    }
    cells.as(Encoders.product[NearDupIn])
      .groupByKey(r => (r.band, r.bucket))(
        Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        nearDupGroup(horizonMs, minMatches, maxBucketOccupancy))(
        Encoders.product[BucketState], Encoders.product[NearDupFlag])
  }

  private def nearDupGroup(horizonMs: Long, minMatches: Int, maxOccupancy: Int)(
      key: (Int, Long), events: Iterator[NearDupIn],
      state: GroupState[BucketState]): Iterator[NearDupFlag] = {
    val wm = state.getCurrentWatermarkMs()
    // horizon eviction: a member whose event time has fallen below the
    // watermark is outside the dedup window — same bound as
    // dropDuplicatesWithinWatermark's state
    var members = state.getOption.fold(List.empty[BucketMember])(
      _.members.filter(_.t >= wm))
    // membership probes are O(1) against this set; the signature
    // compares below stay O(occupancy × k) — that part IS the LSH
    // work. Without the set, a hot bucket paid an O(occupancy) id
    // scan per arrival ON TOP of the compares (round-17 advice).
    val memberIds = scala.collection.mutable.HashSet.empty[Long]
    members.foreach(m => memberIds += m.docId)
    val out = Vector.newBuilder[NearDupFlag]
    // ascending id order makes within-batch pair evaluation identical
    // to the arrival-split case: each pair is seen once, by its
    // second-arriving member, whatever the micro-batch boundaries
    events.toVector.sortBy(_.docId).foreach { e =>
      if (!memberIds.contains(e.docId)) { // at-least-once absorb
        members.foreach { m =>
          var eq = 0
          var i = 0
          while (i < e.sig.length) { if (m.sig(i) == e.sig(i)) eq += 1; i += 1 }
          if (eq >= minMatches) {
            if (m.docId < e.docId) out += NearDupFlag(key._1, m.docId, e.docId, eq)
            else out += NearDupFlag(key._1, e.docId, m.docId, eq)
          }
        }
        members ::= BucketMember(e.docId, e.ts.getTime, e.sig)
        memberIds += e.docId
        // optional hot-bucket cap (production dial, NOT default-on:
        // a cap trades arrival-order independence — an evicted member
        // can no longer flag a later near-dup, and which member is
        // oldest depends on delivery order; the batch pipeline's
        // candidatePairs maxBucketSize is the exact analog). Keeps
        // the newest maxOccupancy members by (event time, id).
        if (members.size > maxOccupancy) {
          val evict = members.minBy(m => (m.t, m.docId))
          members = members.filterNot(m => m.docId == evict.docId)
          memberIds -= evict.docId
        }
      }
    }
    if (members.isEmpty) state.remove()
    else {
      state.update(BucketState(members))
      // reap the bucket once the watermark passes its newest member +
      // horizon (timeouts must sit strictly above the watermark)
      state.setTimeoutTimestamp(
        math.max(satAdd(members.map(_.t).max, horizonMs), wm + 1))
    }
    out.result().iterator
  }

  /** Windowed DOMINANT ACTOR via CHAINED AGGREGATIONS (agg → agg) —
    * "who dominated the changes each hour, and what share": a
    * watermarked per-(window, actor) count feeds a SECOND stateful
    * aggregation at window grain (regrouped through window_time, the
    * chained-window-aggregation contract) that takes the max-count
    * actor (ties to the larger actor id via the struct max — replay
    * deterministic), the window's total change volume, and its
    * distinct-actor count. cdc37 proved the dedup→agg chain; this is
    * the agg→agg shape — the second operator's input is the first's
    * APPEND output, admitted under the chained-operator late-record
    * contract (late filtering by the previous watermark, eviction by
    * the current). State: first agg O(actors × open windows), second
    * O(open windows), both watermark-evicted. Append mode emits each
    * window's verdict once, finalized — exactly replayable as the
    * batch argmax the oracle runs. */
  def windowedTopActor(df: DataFrame, tsCol: String, actorCol: String,
                       windowDuration: String, watermarkDelay: String): DataFrame = {
    val counts = df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(actorCol))
      .agg(count(lit(1)).as("n"))
    counts
      .groupBy(window(window_time(col("window")), windowDuration))
      .agg(max(struct(col("n"), col(actorCol).as("a"))).as("top"),
        sum(col("n")).as("total_changes"),
        count(lit(1)).as("n_actors"))
      .select(col("window.start").as("window_start"),
        col("top.a").as("top_actor"), col("top.n").as("top_n"),
        col("total_changes"), col("n_actors"))
  }

  /** Session-windowed activity per group over a change stream: events
    * closer than `gapDuration` merge into one session; a gap closes
    * it (Spark's native session_window keeps state per OPEN session
    * only, bounded by the watermark — the sessionization shape for
    * "bursts of changes per table/tenant" analytics). Append mode
    * emits each session once, when the watermark passes its end. */
  def sessionCounts(df: DataFrame, tsCol: String, groupCol: String,
                    gapDuration: String, watermarkDelay: String): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gapDuration), col(groupCol))
      .agg(count(lit(1)).as("n_changes"))
      .select(col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col(groupCol), col("n_changes"))

  /** One keyed change as carried through the stateful operator: the
    * key and payload travel as JSON strings so ONE state schema serves
    * any table schema (per-stream schemas stay dynamic, SURVEY.md §1.4). */
  final case class ChangeIn(key: String, op: String, payload: String, lsn: Long)

  /** Kept state per key: the newest applied change. */
  final case class KeyState(lsn: Long, op: String, payload: String)

  /** Changelog emission: current state of a key after a trigger; op
    * "d" means the key was deleted (downstream removes it). */
  final case class StateOut(key: String, op: String, payload: String, lsn: Long)

  /** Streaming apply-changes: keeps the newest change per key (by lsn,
    * then a deterministic content tiebreak) and emits each key's
    * current state whenever it changes — the same semantics as the
    * batch ApplyChanges.latestState, as a continuously-maintained
    * changelog. Deletes clear state and emit an op="d" marker.
    *
    * Input: canonical change records (Envelope.recordSchema shape with
    * `key`, `value.op`, `value.after`, `value.source.lsn`, `value.ts_ms`). */
  def latestStateStream(records: DataFrame): Dataset[StateOut] = {
    val ds = records.select(
        to_json(col("key")).as("key"),
        col("value.op").as("op"),
        to_json(col("value.after")).as("payload"),
        coalesce(col("value.source.lsn"), col("value.ts_ms"), lit(0L)).as("lsn"))
      .na.fill("", Seq("payload"))
      .as(Encoders.product[ChangeIn])

    ds.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        applyGroup)(Encoders.product[KeyState], Encoders.product[StateOut])
  }

  /** One signed row of the incremental-view-maintenance changelog:
    * sign −1 retracts the key's previous state, +1 asserts its new
    * one. Summing f(payload)·sign over the whole stream telescopes to
    * f over exactly the keys' final states — the algebra that lets a
    * downstream aggregate stay correct under updates and deletes
    * without ever rescanning the table. */
  final case class DeltaOut(key: String, sign: Int, payload: String, lsn: Long)

  /** Signed changelog emission — [[latestStateStream]]'s semantics
    * with RETRACTIONS: whenever a key's current state changes, emit
    * −old (if the key had state) and +new (unless the change is a
    * delete). Feeding these through a signed aggregate maintains any
    * sum/count-shaped view incrementally (classic IVM): per
    * micro-batch the aggregate touches only changed groups, never the
    * accumulated table — the property that keeps a continuously-
    * maintained 100 TB aggregate at change-rate cost. Same LSN
    * ordering and content tiebreaks as the batch merge; a delete of a
    * key without state emits nothing (nothing to retract). */
  def changelogDeltaStream(records: DataFrame): Dataset[DeltaOut] = {
    val ds = records.select(
        to_json(col("key")).as("key"),
        col("value.op").as("op"),
        to_json(col("value.after")).as("payload"),
        coalesce(col("value.source.lsn"), col("value.ts_ms"), lit(0L)).as("lsn"))
      .na.fill("", Seq("payload"))
      .as(Encoders.product[ChangeIn])
    ds.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        deltaGroup)(Encoders.product[KeyState], Encoders.product[DeltaOut])
  }

  private def deltaGroup(key: String, changes: Iterator[ChangeIn],
                         state: GroupState[KeyState]): Iterator[DeltaOut] = {
    val incoming = changes.map(c => KeyState(c.lsn, c.op, c.payload))
      .reduceOption(newer)
    incoming match {
      case None => Iterator.empty
      case Some(cand) =>
        val winner = state.getOption.fold(cand)(cur => if (cand.lsn >= cur.lsn) cand else cur)
        if (state.getOption.contains(winner)) Iterator.empty // no change
        else {
          val retract = state.getOption
            .map(cur => DeltaOut(key, -1, cur.payload, winner.lsn)).iterator
          if (winner.op == Envelope.OpDelete) {
            state.remove()
            retract
          } else {
            state.update(winner)
            retract ++ Iterator.single(DeltaOut(key, 1, winner.payload, winner.lsn))
          }
        }
    }
  }

  /** The batch sink's `__tb` content tiebreak computed JVM-side: the
    * xxhash64 of the SAME "<op>|<payload-json>" string
    * ParquetUpsertSink hashes as a Column — one tiebreak function for
    * both paths (round-2 verdict: `payload.##` here could crown a
    * different winner than the batch merge on an LSN tie). */
  private def tb(k: KeyState): Long =
    graft.functions.Portable.xxhash64Jvm(k.op + "|" + k.payload)

  /** Deterministic "newer" ordering WITHIN a batch: (lsn, content-hash
    * tiebreak) — mirrors the batch merge order (__lsn, __incoming,
    * __tb); both within-batch records have __incoming=1, so the
    * content hash breaks the tie. */
  private def newer(a: KeyState, b: KeyState): KeyState =
    if (a.lsn != b.lsn) { if (a.lsn > b.lsn) a else b }
    else { if (tb(a) >= tb(b)) a else b }

  private def applyGroup(key: String, changes: Iterator[ChangeIn],
                         state: GroupState[KeyState]): Iterator[StateOut] = {
    val incoming = changes.map(c => KeyState(c.lsn, c.op, c.payload))
      .reduceOption(newer)
    incoming match {
      case None => Iterator.empty
      case Some(cand) =>
        // vs stored state the batch order is (__lsn, __incoming): an
        // incoming change at the SAME lsn beats stored state (an
        // lsn-less update still applies) — not the content hash
        val winner = state.getOption.fold(cand)(cur => if (cand.lsn >= cur.lsn) cand else cur)
        if (state.getOption.contains(winner)) Iterator.empty // no change
        else if (winner.op == Envelope.OpDelete) {
          state.remove()
          Iterator.single(StateOut(key, Envelope.OpDelete, "", winner.lsn))
        } else {
          state.update(winner)
          Iterator.single(StateOut(key, winner.op, winner.payload, winner.lsn))
        }
    }
  }

  /** One event in the streaming as-of: side 1 = left (fact, to be
    * enriched), side 0 = right (dimension/state history). Payloads are
    * JSON strings so one state schema serves any table (same rationale
    * as [[ChangeIn]]). */
  final case class AsOfIn(side: Int, key: String, ts: java.sql.Timestamp, payload: String)
  final case class AsOfEvt(t: Long, payload: String)

  /** `lastActivity` = max event time seen on EITHER side of this key —
    * the history TTL clock. (Right-history age alone is wrong: a key
    * with continuous left traffic but an old dimension row would lose
    * its state and silently enrich to null.) Adding this field changed
    * the state encoder schema vs rounds ≤7 — restart streaming queries
    * from a fresh checkpoint. */
  final case class AsOfState(lefts: List[AsOfEvt], rights: List[AsOfEvt],
                             lastActivity: Long)
  final case class AsOfOut(key: String, t: Long, payload: String,
                           matchedT: Option[Long], matchedPayload: Option[String])

  /** STREAMING as-of enrichment — the continuous counterpart of
    * graft.operators.TemporalJoin.asOf: each left event is enriched
    * with the latest right event at or before its event time, per key.
    *
    * Both inputs must be shaped (key STRING, ts TIMESTAMP, payload
    * STRING). Correctness under out-of-order arrival comes from the
    * WATERMARK, not arrival order: a left event is held in state until
    * the event-time watermark passes its timestamp — by the watermark
    * contract every right event at or before it has then arrived — and
    * only then emitted (Append semantics, each left exactly once).
    * Right-side ties on t resolve to the max content hash
    * (deterministic under replay; align the batch tiebreak when
    * comparing engines, or keep right times unique per key).
    *
    * Bounded state: buffered lefts drain as the watermark advances
    * (an event-time timeout fires even if the key goes quiet), and
    * right history keeps ONLY the newest row at or below the
    * watermark plus rows above it — a right row strictly older than a
    * newer ≤-watermark row can never win an as-of match again. Events
    * on EITHER side arriving later than the watermark are dropped by
    * the stateful operator's standard late-event filter (the same
    * watermark contract as every watermarked op; verified in
    * StreamingSpec — they never reach the state function). A key
    * holding ONLY right history (no pending lefts) is dropped once
    * NEITHER side has seen an event for `historyTtlMs` of event time
    * (the clock is the max event time across BOTH sides — left
    * traffic keeps a key's dimension state alive) — without that TTL,
    * unbounded key cardinality would grow state forever; a left
    * arriving after the TTL finds no match (best-effort null
    * enrichment). `historyTtlMs <= 0` or
    * `Long.MaxValue` disables the TTL (state for right-only keys then
    * lives forever — only safe with bounded key cardinality). One
    * shuffle on the key; per-key state is O(in-flight horizon), not
    * O(stream). */
  def asOfEnrichStream(left: DataFrame, right: DataFrame,
                       watermarkDelay: String,
                       historyTtlMs: Long = 24L * 3600 * 1000): Dataset[AsOfOut] = {
    // the WATERMARKED ts column itself must reach the stateful operator
    // (projecting it away drops the event-time tag and the analyzer
    // rejects the event-time timeout) — ms conversion happens in state
    val l = left.withWatermark("ts", watermarkDelay)
      .select(lit(1).as("side"), col("key"), col("ts"), col("payload"))
    val r = right.withWatermark("ts", watermarkDelay)
      .select(lit(0).as("side"), col("key"), col("ts"), col("payload"))
    l.unionByName(r).as(Encoders.product[AsOfIn])
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        asOfGroup(historyTtlMs))(Encoders.product[AsOfState], Encoders.product[AsOfOut])
  }

  /** Watermarked STREAM-STREAM interval equi-join — the canonical
    * two-stream correlation shape (impressions ⋈ clicks within a time
    * bound): rows join when the keys match and the right event lands
    * in `[leftTs, leftTs + within]`. Built directly on Spark's
    * stream-stream join machinery — both sides watermarked, the range
    * condition bounds how long each side's state is retained, so state
    * is O(watermark + within horizon) per side, never O(stream).
    * `joinType` supports inner and the outer forms Spark allows for
    * stream-stream joins (left_outer / right_outer / full_outer emit
    * their null-padded rows once the watermark closes the window).
    * Column names must be disjoint across the two sides (the usual
    * stream-stream join contract); one shuffle per side on the key. */
  def intervalJoinStream(left: DataFrame, leftKey: String, leftTs: String,
                         right: DataFrame, rightKey: String, rightTs: String,
                         watermarkDelay: String, within: String,
                         joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"),
      joinType)
  }

  private def evtTb(e: AsOfEvt): Long = graft.functions.Portable.xxhash64Jvm(e.payload)

  /** Overflow-safe `t + ttl`: a huge TTL (e.g. Long.MaxValue used to
    * mean "never") must saturate, not wrap negative — a wrapped sum
    * would make `deadline <= wm` trivially true and drop state
    * immediately instead of never. Saturation is only possible when
    * t > 0 (ttl is known positive on this path — noTtl filters
    * ttlMs <= 0); for t <= 0 the naive guard `Long.MaxValue - t`
    * itself wraps negative and would wrongly saturate every pre-epoch
    * timestamp, permanently disabling the TTL for those keys. */
  private[streaming] def satAdd(t: Long, ttl: Long): Long =
    if (t > 0 && ttl > Long.MaxValue - t) Long.MaxValue else t + ttl

  private def asOfGroup(ttlMs: Long)(key: String, events: Iterator[AsOfIn],
                        state: GroupState[AsOfState]): Iterator[AsOfOut] = {
    val noTtl = ttlMs <= 0 || ttlMs == Long.MaxValue
    val wm = state.getCurrentWatermarkMs()
    val cur = state.getOption.getOrElse(AsOfState(Nil, Nil, Long.MinValue))
    val (ls, rs) = events.toList.partition(_.side == 1)
    // the TTL clock: newest event time seen on EITHER side — a key
    // whose lefts keep arriving is active even if its dimension row
    // is ancient
    val lastActivity = (cur.lastActivity +: (ls ++ rs).map(_.ts.getTime)).max
    val rights = (cur.rights ++ rs.map(e => AsOfEvt(e.ts.getTime, e.payload)))
      .sortBy(e => (e.t, evtTb(e)))
    val (ready, pending) = (cur.lefts ++ ls.map(e => AsOfEvt(e.ts.getTime, e.payload)))
      .partition(_.t <= wm)
    val out = ready.sortBy(e => (e.t, evtTb(e))).map { le =>
      val m = rights.takeWhile(_.t <= le.t).lastOption
      AsOfOut(key, le.t, le.payload, m.map(_.t), m.map(_.payload))
    }
    // prune: newest right at/below the watermark + everything above it
    val (past, future) = rights.partition(_.t <= wm)
    val keep = past.lastOption.toList ++ future
    // history TTL: a key with ONLY right rows whose last activity on
    // EITHER side is at least ttlMs below the watermark has been quiet
    // for the retention horizon — drop it so unbounded key cardinality
    // cannot grow state forever
    val expired = state.hasTimedOut && pending.isEmpty && keep.nonEmpty &&
      !noTtl && satAdd(lastActivity, ttlMs) <= wm
    if (pending.isEmpty && (keep.isEmpty || expired)) state.remove()
    else {
      state.update(AsOfState(pending, keep, lastActivity))
      // drain buffered lefts even if this key receives no more input
      // (fire when the watermark passes the oldest pending left); with
      // no pending lefts, arm the history-retention TTL instead (none
      // when the TTL is disabled — state then simply persists).
      // Timeouts must sit strictly above the current watermark.
      if (pending.nonEmpty)
        state.setTimeoutTimestamp(math.max(pending.map(_.t).min + 1, wm + 1))
      else if (!noTtl)
        state.setTimeoutTimestamp(math.max(satAdd(lastActivity, ttlMs), wm + 1))
    }
    out.iterator
  }

  /** Compact a changelog (e.g. collected StateOut emissions) to final
    * state: newest emission per key wins, deleted keys drop out — the
    * helper that makes streaming and batch results directly comparable. */
  def compactChangelog(changelog: DataFrame): DataFrame = {
    graft.operators.ApplyChanges.latestState(changelog,
      keyCols = Seq(col("key")),
      orderCols = Seq(col("lsn")),
      opCol = col("op"))
  }

  /** One funnel event: (key, event-time µs, tie, type). */
  final case class FunnelIn(key: Long, ts: Long, tie: Long, typ: String)
  /** Per-key funnel state: the stage reached and the (ts, tie)
    * position of the LAST event that advanced it. */
  final case class FunnelState(stage: Int, lastTs: Long, lastTie: Long)
  /** Stage-advance emission: the key's new stage and the event
    * position that reached it. */
  final case class FunnelOut(key: Long, stage: Int, ts: Long, tie: Long)

  /** STREAMING ordered funnel — the continuous counterpart of
    * graft.operators.Sessions.funnelStages: per key, advance through
    * `steps` as matching events arrive, a step counting only STRICTLY
    * LATER in (ts, tie) order than the previous match, and emit one
    * record per stage ADVANCE (keys still at stage 0 emit nothing —
    * the funnel report zero-fills them from the key universe, exactly
    * like the batch operator's left join).
    *
    * Ordering contract: events are sorted within each micro-batch, so
    * intra-batch disorder is free; ACROSS batches the stream must be
    * per-key non-decreasing in (ts, tie) — the CDC layout's delivery
    * order (OrderedDelivery). An event at or before the last APPLIED
    * position is ignored: the funnel is monotone, and a late
    * pre-match event cannot retroactively rewrite a fold that already
    * advanced past it (same arrival-order semantics every streaming
    * funnel engine documents). Replayed batches (at-least-once
    * delivery) re-observe events at already-applied positions and are
    * absorbed by the same guard.
    *
    * State per key is CONSTANT — (stage, last position) — vs the
    * batch fold's per-key event list: the streaming form is what
    * runs unbounded. One shuffle on the key; RocksDB-ready. */
  def funnelStagesStream(df: DataFrame, keyCol: Column, tsUsCol: Column,
                         tieCol: Column, typeCol: Column,
                         steps: Seq[String]): Dataset[FunnelOut] = {
    require(steps.nonEmpty, "need at least one funnel step")
    // the constant-state design needs a NUMERIC tie (two longs per
    // key); where the batch fold accepts any orderable tie, a
    // non-numeric (or null) one here FAILS LOUDLY instead of silently
    // nulling out and collapsing the (ts, tie) ordering contract —
    // the same trap Sessions.funnelStages had and fixed
    val tieLong = coalesce(tieCol.cast("long"),
      raise_error(concat(lit("funnelStagesStream: tie must be non-null numeric, got "),
        coalesce(tieCol.cast("string"), lit("null")))).cast("long"))
    val ds = df.select(keyCol.cast("long").as("key"), tsUsCol.cast("long").as("ts"),
        tieLong.as("tie"), typeCol.as("typ"))
      .as(Encoders.product[FunnelIn])
    ds.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        funnelGroup(steps.toVector))(
        Encoders.product[FunnelState], Encoders.product[FunnelOut])
  }

  private def funnelGroup(steps: Vector[String])(key: Long, events: Iterator[FunnelIn],
                                                 state: GroupState[FunnelState]): Iterator[FunnelOut] = {
    var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue, Long.MinValue))
    val out = Vector.newBuilder[FunnelOut]
    // intra-batch disorder is sorted away; the cross-batch guard below
    // enforces the monotone contract
    events.toVector.sortBy(e => (e.ts, e.tie)).foreach { e =>
      val later = e.ts > st.lastTs || (e.ts == st.lastTs && e.tie > st.lastTie)
      if (later && st.stage < steps.length && e.typ == steps(st.stage)) {
        st = FunnelState(st.stage + 1, e.ts, e.tie)
        out += FunnelOut(key, st.stage, e.ts, e.tie)
      }
    }
    // never persist the initial state: an absent entry reconstructs it
    // identically, and with NoTimeout a stage-0 write would pin one
    // state-store row for every key EVER SEEN — including the dominant
    // never-matching population — forever
    if (st.stage > 0 && state.getOption.forall(_ != st)) state.update(st)
    out.result().iterator
  }

  final case class KmvIn(g: String, h: Long)
  final case class KmvSrcState(hashes: Array[Long], nSeen: Long)
  final case class KmvUpdate(train_source: String, eval_name: String,
                             k_used: Long, intersect_est: Double,
                             d_eval_est: Double, containment_est: Double,
                             n_seen: Long)

  /** STREAMING CONTAMINATION MONITOR — the continuous twin of the
    * batch train×eval matrix (graft.llm.Sketches.kmvContainment,
    * llm117): a stream of training values maintains one KMV sketch
    * per source in flatMapGroupsWithState (KMV merges by
    * order-statistics union, so the sketch is a natural streaming
    * accumulator); the eval benchmarks' sketches are computed ONCE
    * batch-side ([[graft.llm.Sketches.kmvSketches]] — a kilobyte-
    * sized driver hop) and ride the closure like a broadcast. Each
    * trigger emits, for every source whose sketch CHANGED, the
    * refreshed containment row against every benchmark — the
    * monitoring feed a pipeline alerts on (reference precedent for
    * continuous per-sink index maintenance:
    * debezium-server-milvus/.../MilvusChangeConsumer.java:133-151).
    *
    * Replay discipline: the sketch after absorbing the full history
    * is the k smallest distinct hashes over everything seen — a SET
    * property, independent of batch boundaries, arrival order, and
    * at-least-once redelivery (duplicates collapse inside the
    * TreeSet; a redelivered batch changes nothing and emits nothing).
    * `n_seen` (values absorbed, monotone per source) versions the
    * emissions: the max-n_seen row per (source, eval) IS the batch
    * kmvContainment row, which is what the oracle replays —
    * intermediate rows are the monitor's live feed and depend on
    * batch boundaries by design (they are snapshots in time).
    *
    * State at 100 TB: ≤ k longs + one counter per SOURCE (tens of
    * rows, fixed-width — this never grows with the corpus), no
    * watermark, no eviction: the whole point of a sketch-grain
    * monitor is constant state. One shuffle on the source tag; the
    * heavy work (hashing) happens scan-side in codegen before the
    * shuffle, and what shuffles is (tag, 8-byte hash). */
  final case class CountIn(term: String)
  final case class TermCountState(n: Long)
  final case class CountUpdate(term: String, cnt: Long)

  /** STREAMING RUNNING COUNTS — the heavy-hitter monitor's state
    * layer: per-key exact counts accumulate in flatMapGroupsWithState
    * and one refreshed (key, running count) row emits per trigger in
    * which the key moved. Counts are additive over any batch split,
    * so the max-count row per key equals the batch count whatever the
    * trigger boundaries — the batch-replayable contract every
    * streaming row here carries. Downstream, a version-ranked read of
    * the emission log yields current top-k at any moment.
    *
    * State is ONE long per distinct key — O(vocabulary), not
    * O(stream); for corpora where the key space itself is unbounded
    * (URLs, raw shingles) the bounded-state dial is the CMS sketch
    * ([[graft.functions.CmsSketch]]) at the cost of ±εN counts. */
  def runningCountsStream(df: DataFrame, keyCol: Column): Dataset[CountUpdate] =
    df.select(keyCol.cast("string").as("term")).as(Encoders.product[CountIn])
      .groupByKey(_.term)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        countGroup)(
        Encoders.product[TermCountState], Encoders.product[CountUpdate])

  private def countGroup(term: String, events: Iterator[CountIn],
                         state: GroupState[TermCountState]): Iterator[CountUpdate] = {
    var add = 0L
    while (events.hasNext) { events.next(); add += 1 }
    if (add == 0) Iterator.empty
    else {
      val n = state.getOption.map(_.n).getOrElse(0L) + add
      state.update(TermCountState(n))
      Iterator.single(CountUpdate(term, n))
    }
  }

  def kmvContainmentStream(df: DataFrame, groupCol: Column, valueCol: Column,
                           evalSketches: Seq[(String, Array[Long])],
                           k: Int = 256): Dataset[KmvUpdate] = {
    require(k >= 2, "kmv needs k >= 2")
    require(evalSketches.nonEmpty, "need at least one eval sketch")
    val evals = evalSketches.sortBy(_._1) // deterministic emission order
    df.select(groupCol.cast("string").as("g"),
        graft.functions.Portable.hash64(valueCol).as("h"))
      .as(Encoders.product[KmvIn])
      .groupByKey(_.g)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        kmvGroup(evals, k))(
        Encoders.product[KmvSrcState], Encoders.product[KmvUpdate])
  }

  private def kmvGroup(evals: Seq[(String, Array[Long])], k: Int)(
      g: String, events: Iterator[KmvIn],
      state: GroupState[KmvSrcState]): Iterator[KmvUpdate] = {
    val prev = state.getOption.getOrElse(KmvSrcState(Array.empty[Long], 0L))
    // same buffer discipline as the KmvValues aggregate: bounded
    // TreeSet, duplicates collapse, k smallest survive
    val set = new java.util.TreeSet[java.lang.Long]()
    prev.hashes.foreach(h => set.add(h))
    var changed = false
    var n = prev.nSeen
    events.foreach { e =>
      n += 1
      if (set.size < k) { if (set.add(e.h)) changed = true }
      else if (e.h < set.last() && set.add(e.h)) { set.pollLast(); changed = true }
    }
    if (n == prev.nSeen) Iterator.empty // redelivery-only invocation
    else {
      val hashes = new Array[Long](set.size)
      var i = 0
      val it = set.iterator()
      while (it.hasNext) { hashes(i) = it.next(); i += 1 }
      state.update(KmvSrcState(hashes, n))
      // emit only when the sketch moved: a batch of already-absorbed
      // values refreshes nothing a reader could act on (the final
      // max-n_seen row is unaffected — later unchanged invocations
      // would emit the identical estimates)
      if (!changed) Iterator.empty
      else evals.iterator.map { case (name, kb) =>
        val (kUsed, inter, dEval, cont) =
          graft.llm.Sketches.containmentEst(hashes, kb, k)
        KmvUpdate(g, name, kUsed, inter, dEval, cont, n)
      }
    }
  }
}
