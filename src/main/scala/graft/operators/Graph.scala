package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph traversal — the recursive-query capability Spark
  * has no built-in for (no recursive CTEs): BFS hop distances from a
  * source set over a directed edge list, as a bounded superstep loop.
  *
  * Each round joins the FRONTIER (only the nodes first reached last
  * round) against the edges and anti-joins the visited set, so a node
  * expands exactly once — the naive recursive-UNION form re-expands
  * every path and grows combinatorially; frontier BFS is linear in
  * edges visited. Rounds materialize via the superstep protocol
  * ([[graft.llm.Dedup.connectedComponents]]'s rationale: one job per
  * round over persisted blocks; stacked lazy plans would re-run every
  * prior round under each action), with superseded frames released.
  *
  * 100 TB shape: per round ONE edge join keyed on the node id + one
  * anti join against visited — both plain hash joins; the frontier
  * only shrinks relative to reachable-set growth, and `maxHops`
  * bounds the rounds. Returns (id, hops) for every node within
  * `maxHops` of a source (sources at hops 0, min-hop semantics by
  * construction — a node joins `visited` the FIRST round it appears).
  */
object Graph {

  def bfsHops(edges: DataFrame, srcCol: Column, dstCol: Column,
              sources: DataFrame, sourceIdCol: Column,
              maxHops: Int,
              /** Receives the FINAL materialized frame — release after
                * consumption (intermediates release internally). */
              tracker: Option[Materialize.Tracker] = None): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    // every round joins the edge frame — materialize once, not a
    // re-run of the upstream scan per superstep; PRE-PARTITIONED on
    // the join key (src), so the materialized leaf's published
    // hash-partitioning satisfies every round's join distribution and
    // only the (small) frontier side exchanges per superstep — the
    // static edge frame never re-shuffles (round-21, guide §2.4)
    val e = Materialize.eager(
      edges.select(srcCol.cast("long").as("src"), dstCol.cast("long").as("dst"))
        .repartition(col("src")))
    var visited = Materialize.eager(
      sources.select(sourceIdCol.cast("long").as("id")).distinct()
        .withColumn("hops", lit(0)))
    var frontier = visited
    var h = 1
    var done = maxHops == 0
    while (!done) {
      val next = Materialize.eager(
        frontier.join(e, frontier("id") === e("src"))
          .select(col("dst").as("id")).distinct()
          .join(visited, Seq("id"), "left_anti")
          .withColumn("hops", lit(h)))
      if (next.isEmpty) {
        Materialize.release(next)
        // the last non-empty frontier's rows live on inside `visited`
        // — release its own materialization too
        if (frontier ne visited) Materialize.release(frontier)
        done = true
      } else {
        val grown = Materialize.eager(visited.unionByName(next))
        Materialize.release(visited)
        if (frontier ne visited) Materialize.release(frontier)
        visited = grown
        frontier = next
        h += 1
        if (h > maxHops) {
          Materialize.release(frontier)
          done = true
        }
      }
    }
    Materialize.release(e)
    tracker.foreach(_.track(visited))
    visited
  }

  /** INTEGER random-walk mass propagation — the PageRank core, in the
    * repo's cross-engine discipline: every node starts with
    * `initMass` units; each round a node splits its mass equally over
    * its out-edges with TRUNCATING integer division (`mass DIV
    * outdeg` per edge — the sub-outdeg remainder evaporates, the
    * deterministic substitute for a floating damping term: both
    * engines compute the identical integers), and nodes with no
    * out-edges retire their mass. After `rounds` supersteps a node's
    * accumulated in-mass is its walk centrality.
    *
    * 100 TB shape: per round ONE join keyed on the node id + one
    * (node) aggregate — out-degrees compute once and the join reuses
    * the edge frame's partitioning; rounds materialize via the same
    * superstep protocol as [[bfsHops]]. Returns (id, mass) after the
    * final round (nodes whose mass reached 0 drop out). */
  def massPropagate(edges: DataFrame, srcCol: Column, dstCol: Column,
                    rounds: Int, initMass: Long = 1000000L,
                    tracker: Option[Materialize.Tracker] = None): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(initMass >= 1, s"initMass must be >= 1, got $initMass")
    // the edge frame feeds EVERY round — materialize it once (lazy
    // lineage would re-run the upstream scan/union per superstep)
    val e = Materialize.eager(
      edges.select(srcCol.cast("long").as("src"), dstCol.cast("long").as("dst")))
    val nodes = Materialize.eager(
      e.select(col("src").as("id"))
        .unionByName(e.select(col("dst").as("id"))).distinct())
    var mass = Materialize.eager(nodes.withColumn("mass", lit(initMass)))
    Materialize.release(nodes)
    // Round-21 (guide §2.4, §3): the out-degree joins onto the edge
    // frame ONCE, up front — the old shape joined mass⋈deg⋈edges EVERY
    // round, paying a second join and a second exchange of the static
    // edge side per superstep. The degree-annotated edge frame is
    // materialized PRE-PARTITIONED on the join key (src), so its
    // published hash-partitioning satisfies every round's join
    // distribution: per round only the mass side exchanges, and
    // `sum(mass DIV __deg)` per destination is the identical integer
    // arithmetic (share = mass DIV deg attached per edge, summed by
    // dst) the two-join form computed.
    val e2 = Materialize.eager(
      e.join(e.groupBy(col("src")).agg(count(lit(1)).as("__deg")), Seq("src"))
        .select(col("src").as("__esrc"), col("dst").as("__edst"), col("__deg"))
        .repartition(col("__esrc")))
    Materialize.release(e)
    for (_ <- 1 to rounds) {
      val next = Materialize.eager(
        mass.join(e2, col("id") === col("__esrc"))
          .groupBy(col("__edst").as("nid"))
          .agg(sum(expr("mass DIV __deg")).as("mass"))
          .filter(col("mass") > 0)
          .withColumnRenamed("nid", "id"))
      Materialize.release(mass)
      mass = next
    }
    Materialize.release(e2)
    tracker.foreach(_.track(mass))
    mass
  }

  /** Bounded single/multi-source shortest paths over INTEGER edge
    * weights — Bellman-Ford as a superstep loop: after round k the
    * frame holds, for every reached node, the minimum path cost using
    * at most k edges. Integer weights keep the result exact across
    * engines (float addition order would not survive a shuffle).
    *
    * Unlike [[bfsHops]] a frontier-only expansion is NOT sound here —
    * a node reached cheaply late must still relax its neighbors — so
    * each round relaxes from the FULL distance frame: one edge join
    * keyed on the node id + one min-aggregate per round, both plain
    * hash shuffles on the id. (A delta optimization — relax only from
    * nodes whose dist improved last round — preserves semantics and
    * is what a 1000-round production run would add; at bounded small
    * `rounds` the extra anti join per round costs more than it
    * saves.) Negative weights are rejected: with them a bounded-round
    * answer is not a distance. */
  def shortestPaths(edges: DataFrame, srcCol: Column, dstCol: Column,
                    weightCol: Column,
                    sources: DataFrame, sourceIdCol: Column,
                    rounds: Int,
                    tracker: Option[Materialize.Tracker] = None): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    // every round joins the edge frame — materialize once; loud
    // failure on a negative weight (the require above can't see data).
    // Pre-partitioned on the join key (__esrc) like massPropagate's
    // edge frame: the static side never re-shuffles across rounds.
    val e = Materialize.eager(
      edges.select(srcCol.cast("long").as("__esrc"),
                   dstCol.cast("long").as("__edst"),
                   weightCol.cast("long").as("__w"))
        .withColumn("__w",
          when(col("__w") < 0, raise_error(lit("shortestPaths: negative edge weight")))
            .otherwise(col("__w")))
        .repartition(col("__esrc")))
    var dist = Materialize.eager(
      sources.select(sourceIdCol.cast("long").as("id")).distinct()
        .withColumn("dist", lit(0L)))
    for (_ <- 1 to rounds) {
      val relaxed = dist.join(e, col("id") === col("__esrc"))
        .select(col("__edst").as("id"), (col("dist") + col("__w")).as("dist"))
      val next = Materialize.eager(
        dist.unionByName(relaxed)
          .groupBy(col("id")).agg(min(col("dist")).as("dist")))
      Materialize.release(dist)
      dist = next
    }
    Materialize.release(e)
    tracker.foreach(_.track(dist))
    dist
  }
}
