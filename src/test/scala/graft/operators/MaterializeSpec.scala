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

  test("connectedComponents at depth: O(1) frames on a deep chain; convergence-throw past maxIter leaks nothing") {
    val before = persistedIds
    // one path component of diameter 18 — the worst propagation shape
    // (min-label travels ONE hop per superstep), near the default cap
    val chain = (1L until 19L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    @volatile var peak = 0
    @volatile var stop = false
    val sampler = new Thread(() => {
      while (!stop) {
        peak = math.max(peak, (persistedIds -- before).size)
        Thread.sleep(1)
      }
    })
    sampler.setDaemon(true); sampler.start()
    val tracker = new Materialize.Tracker
    val cc = try Dedup.connectedComponents(chain, maxIter = 25, tracker = Some(tracker))
    finally { stop = true; sampler.join(1000) }
    // the materialization-release discipline holds at depth: never more
    // than edges + two label frames alive, no matter how many supersteps
    assert(peak <= 3, s"peak persistent frames during deep-chain CC was $peak")
    val rows = cc.collect()
    assert(rows.length == 19 && rows.map(_.getLong(1)).distinct.toSeq == Seq(1L))
    tracker.releaseAll()
    assert((persistedIds -- before).isEmpty)

    // past maxIter the fixpoint guard throws (silent partial labels
    // would split clusters downstream) — and strands no frame
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 5)
    }
    assert(e.getMessage.contains("did not converge"), e.getMessage)
    assert((persistedIds -- before).isEmpty,
      "the convergence-throw path must release every frame it pinned")
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
