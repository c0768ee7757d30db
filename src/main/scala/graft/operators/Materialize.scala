package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.EagerFrames

/** Eager materialization with deterministic block release — the
  * engine-wide discipline for operators that must pin an intermediate
  * frame (an iterative superstep, a branch read by two consumers).
  *
  * Why not `localCheckpoint(true)`: its blocks live until JVM GC
  * happens to collect the RDD handle, which in practice is "forever" —
  * a bench session accumulated ~34 s of eviction/GC churn from them
  * (round-9 A/B), and a 100 TB connected-components run would pin
  * O(supersteps) full label frames on the executors. [[eager]] persists
  * instead of checkpoint-truncating, so [[release]] both frees the
  * blocks immediately AND keeps lineage — a released frame that is
  * accidentally read again recomputes instead of failing.
  *
  * Release protocol:
  *  - intermediates that the operator's RESULT no longer references
  *    (a superseded superstep frame) are released by the operator
  *    itself, as soon as their successor is materialized;
  *  - frames the result still references (the corpus a left-anti join
  *    reads, an inverted index feeding the final join) go into the
  *    caller's [[Tracker]], released after the result is consumed —
  *    the pattern the bench wires into each query's cleanup hook.
  */
object Materialize {

  /** Collects materialized frames whose blocks must outlive the
    * operator call (the result still reads them); the consumer calls
    * [[releaseAll]] once the result is fully materialized. Thread-safe
    * (queries can build frames in parallel branches). */
  final class Tracker {
    private val frames = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    def track(df: DataFrame): DataFrame = { frames.add(df); df }
    def releaseAll(): Unit = {
      var f = frames.poll()
      while (f != null) { release(f); f = frames.poll() }
    }
  }

  /** Materialize `df` eagerly (one job) into persisted executor blocks;
    * the returned frame's plan is a constant-size leaf carrying the
    * child's partitioning. Pair every call with a [[release]]. */
  def eager(df: DataFrame): DataFrame = EagerFrames.materialize(df)

  /** [[eager]] plus, in the SAME materialization job, the count of rows
    * whose non-null boolean `flagCol` is true — an iterative caller's
    * convergence check at zero extra passes. */
  def eagerCountingFlag(df: DataFrame, flagCol: String): (DataFrame, Long) =
    EagerFrames.materializeCountingFlag(df, flagCol)

  /** Durable variant switch: with a `checkpointDir`, use a RELIABLE
    * `df.checkpoint(true)` — executor-local blocks die with their
    * executor (no lineage left to recompute on a localCheckpoint, and
    * even [[eager]]'s recompute restarts the whole chain), so a long
    * 100 TB run pays the durable write for restartability. The
    * checkpoint directory is a JVM-GLOBAL SparkContext setting: it is
    * only set here when no directory is configured yet, so two
    * pipelines passing different dirs share the first one rather than
    * clobbering each other mid-run (the files still land in A durable
    * dir, which is what the knob is for). Reliable checkpoints write
    * files, not block-manager blocks — nothing for [[release]] to free;
    * file cleanup is the application's (or
    * `spark.cleaner.referenceTracking.cleanCheckpoints`'s) concern. */
  def eagerOrCheckpoint(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(true)
      case None => eager(df)
    }

  /** Free the executor storage behind an [[eager]]-materialized (or
    * localCheckpoint'd) frame. Async; safe on frames that hold no
    * materialized leaf. Only call once nothing will read the frame
    * again (an [[eager]] frame would recompute from scratch). */
  def release(df: DataFrame): Unit = EagerFrames.release(df)
}
