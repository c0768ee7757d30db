package graft.operators

import graft.SparkSpec
import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** Block-hygiene contract of the eager materializer (round-9 verdict:
  * `localCheckpoint(true)` blocks leaked for the JVM's lifetime and
  * polluted the whole bench session; at 100 TB an iterative operator
  * would pin O(supersteps) full frames). */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  private def persistedIds: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("eager materializes into persisted blocks; release frees them; frame recomputes after") {
    val before = persistedIds
    val m = Materialize.eager((1 to 100).toDF("n").withColumn("x", col("n") * 2))
    val created = persistedIds -- before
    assert(created.nonEmpty, "eager must register a persisted RDD")
    assert(m.count() == 100)
    Materialize.release(m)
    assert(persistedIds.intersect(created).isEmpty, "release must unregister the blocks")
    // persist (not checkpoint-truncation) keeps lineage: a released
    // frame recomputes instead of throwing "checkpoint block not found"
    assert(m.count() == 100)
  }

  test("eagerCountingFlag rides the convergence count on the materialization job") {
    val df = (1 to 10).toDF("n").select(col("n"), (col("n") % 2 === 0).as("f"))
    val (m, c) = Materialize.eagerCountingFlag(df, "f")
    assert(c == 5L)
    assert(m.count() == 10)
    Materialize.release(m)
  }

  test("eager publishes the child's hash partitioning — downstream re-agg on the same key is shuffle-free") {
    val agg = (1 to 100).map(i => (i % 10, i)).toDF("k", "v")
      .groupBy("k").agg(sum("v").as("s"))
    val m = Materialize.eager(agg)
    val reAgg = m.groupBy("k").agg(max("s").as("mx"))
    reAgg.collect()
    val plan = reAgg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"re-aggregation on the published partitioning must not re-shuffle:\n$plan")
    Materialize.release(m)
  }

  test("connectedComponents frees every intermediate frame; tracker releases the result") {
    val before = persistedIds
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (7L, 9L)).toDF("id_a", "id_b")
    val tracker = new Materialize.Tracker
    val cc = Dedup.connectedComponents(pairs, tracker = Some(tracker))
    val afterCall = persistedIds -- before
    // p0, edges, and every superseded superstep frame are released
    // inside the call — only the final label frame may remain pinned
    assert(afterCall.size <= 1,
      s"connectedComponents leaked ${afterCall.size} intermediate frames")
    assert(cc.count() == 8)
    tracker.releaseAll()
    assert((persistedIds -- before).isEmpty,
      "tracker release must leave zero persistent RDDs from the call")
  }

  test("eagerOrCheckpoint respects an already-set JVM-global checkpoint dir") {
    val sc = spark.sparkContext
    val first = java.nio.file.Files.createTempDirectory("graft-ckpt-a").toString
    val second = java.nio.file.Files.createTempDirectory("graft-ckpt-b").toString
    val df = (1 to 10).toDF("n")
    // first caller with no dir configured: sets it
    if (sc.getCheckpointDir.isEmpty) {
      Materialize.eagerOrCheckpoint(df, Some(first))
      assert(sc.getCheckpointDir.exists(_.contains(new java.io.File(first).getName)))
    }
    val before = sc.getCheckpointDir
    // a second pipeline passing a DIFFERENT dir must not clobber the
    // global setting mid-run (files still land somewhere durable)
    val out = Materialize.eagerOrCheckpoint(df, Some(second))
    assert(out.count() == 10)
    assert(sc.getCheckpointDir == before, "JVM-global checkpoint dir was clobbered")
  }

  test("kmvDistinct with a tracker leaves zero persistent RDDs after release") {
    val before = persistedIds
    val tracker = new Materialize.Tracker
    val r = graft.llm.Sketches.kmvDistinct(
      (1 to 5000).map(i => s"item-$i").toDF("v"), col("v"), k = 256,
      tracker = Some(tracker)).head()
    assert(r.getLong(0) == 5000L)
    tracker.releaseAll()
    assert((persistedIds -- before).isEmpty)
  }
}
