package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], sources: Seq[Long],
                  maxHops: Int): Map[Long, Int] = {
    val t = new Materialize.Tracker
    try {
      Graph.bfsHops(edges.toDF("src", "dst"), col("src"), col("dst"),
          sources.toDF("id"), col("id"), maxHops, tracker = Some(t))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    } finally t.releaseAll()
  }

  test("bfsHops: min-hop distances; revisits never demote; unreachable nodes absent") {
    // 1→2→3→4 chain plus a shortcut 1→3 and a disconnected 9→10
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (9L, 10L))
    val out = run(edges, Seq(1L), maxHops = 5)
    // 3 is reachable in 2 hops via the chain but 1 hop via the
    // shortcut — the frontier form must keep the FIRST (minimum)
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
  }

  test("bfsHops: maxHops bounds the rounds; a cycle terminates; hop 0 = sources only") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(run(cycle, Seq(1L), maxHops = 1) == Map(1L -> 0, 2L -> 1))
    // the cycle closes back onto visited nodes — the anti join stops it
    assert(run(cycle, Seq(1L), maxHops = 10) == Map(1L -> 0, 2L -> 1, 3L -> 2))
    assert(run(cycle, Seq(1L), maxHops = 0) == Map(1L -> 0))
    // multi-source: each node takes the nearest source's distance
    assert(run(Seq((1L, 2L), (3L, 2L)), Seq(1L, 3L), maxHops = 2) ==
      Map(1L -> 0, 3L -> 0, 2L -> 1))
  }

  test("massPropagate: integer shares, evaporating remainders, sinks retire mass") {
    // 1 → {2, 3}, 2 → 3; 3 is a sink
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val t = new Materialize.Tracker
    val out = try {
      Graph.massPropagate(edges, col("src"), col("dst"),
          rounds = 1, initMass = 7L, tracker = Some(t))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    } finally t.releaseAll()
    // node 1 splits 7 over 2 edges → 3 each (remainder 1 evaporates);
    // node 2 sends its full 7 to node 3; node 3's own 7 retires (sink)
    assert(out == Map(2L -> 3L, 3L -> 10L))

    // two rounds: only node 3 holds mass (3 from node 2's first-round
    // 3 units... which splits nowhere — 2→3 sends 3; 3 is a sink)
    val t2 = new Materialize.Tracker
    val out2 = try {
      Graph.massPropagate(edges, col("src"), col("dst"),
          rounds = 2, initMass = 7L, tracker = Some(t2))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    } finally t2.releaseAll()
    assert(out2 == Map(3L -> 3L))
  }

  private def sp(edges: Seq[(Long, Long, Long)], sources: Seq[Long],
                 rounds: Int): Map[Long, Long] = {
    val t = new Materialize.Tracker
    try {
      Graph.shortestPaths(edges.toDF("src", "dst", "w"),
          col("src"), col("dst"), col("w"),
          sources.toDF("id"), col("id"), rounds, tracker = Some(t))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    } finally t.releaseAll()
  }

  test("shortestPaths: cheaper long path beats expensive direct edge") {
    // 1→3 costs 10 direct, but 1→2→3 costs 1+2=3
    val edges = Seq((1L, 3L, 10L), (1L, 2L, 1L), (2L, 3L, 2L))
    assert(sp(edges, Seq(1L), rounds = 1) == Map(1L -> 0L, 2L -> 1L, 3L -> 10L))
    assert(sp(edges, Seq(1L), rounds = 2) == Map(1L -> 0L, 2L -> 1L, 3L -> 3L))
  }

  test("shortestPaths: rounds bound path length; cycles terminate; multi-source min") {
    val cycle = Seq((1L, 2L, 5L), (2L, 3L, 5L), (3L, 1L, 5L))
    assert(sp(cycle, Seq(1L), rounds = 0) == Map(1L -> 0L))
    assert(sp(cycle, Seq(1L), rounds = 10) ==
      Map(1L -> 0L, 2L -> 5L, 3L -> 10L))
    // two sources: node 2 takes the cheaper origin
    assert(sp(Seq((1L, 2L, 9L), (3L, 2L, 4L)), Seq(1L, 3L), rounds = 2) ==
      Map(1L -> 0L, 3L -> 0L, 2L -> 4L))
    // zero-weight edges are fine
    assert(sp(Seq((1L, 2L, 0L)), Seq(1L), rounds = 1) == Map(1L -> 0L, 2L -> 0L))
  }

  test("shortestPaths rejects negative weights loudly") {
    val ex = intercept[Exception] { sp(Seq((1L, 2L, -1L)), Seq(1L), rounds = 1) }
    assert(ex.getMessage != null)
  }

  test("bfsHops leaves no persistent frames behind once the tracker drains") {
    // unpersist is async — compare ids, not counts, and allow earlier
    // tests' releases to complete concurrently
    val before = spark.sparkContext.getPersistentRDDs.keySet
    run(Seq((1L, 2L), (2L, 3L)), Seq(1L), maxHops = 3)
    val deadline = System.nanoTime() + 30e9.toLong
    def leaked = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
    while (leaked.nonEmpty && System.nanoTime() < deadline) Thread.sleep(100)
    assert(leaked.isEmpty,
      s"intermediates and the tracked result must all release, leaked: $leaked")
  }
}
