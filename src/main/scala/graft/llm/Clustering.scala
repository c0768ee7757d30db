package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Materialize

/** Topic clustering over embedding columns — distributed Lloyd's
  * k-means, the standard corpus-organization step of a training-data
  * pipeline (cluster-balanced sampling, per-topic mixing weights,
  * SemDeDup's own first stage runs exactly this).
  *
  * Spark shape per iteration (the MLlib KMeans pattern, re-expressed
  * on the DataFrame API):
  *  - ASSIGNMENT is a map-side projection: the k×dims centroid matrix
  *    is baked into the plan as literals inside one codegen'd
  *    [[graft.functions.NearestCentroid]] pass — no join, no shuffle,
  *    no broadcast table; at 100 TB the corpus is scanned once per
  *    iteration and nothing else moves.
  *  - UPDATE is one posexplode + one partial-aggregated groupBy on
  *    (cell, dim) — the shuffle carries k·dims running (sum, count)
  *    pairs per map task, independent of corpus size.
  *  - The k·dims new centroids are collect()ed to the driver between
  *    iterations — a few KB regardless of data scale (the same
  *    driver-side hop MLlib's KMeans makes every iteration); this is
  *    one of the repo's justified collect sites.
  *
  * Determinism / engine portability: all distances are exact int64
  * sums over the `floor(x·10⁶)` quantization lattice (see
  * [[graft.functions.QuantizedDot]]); the centroid update divides two
  * exact integers in ONE double division then floors back to the
  * lattice — bit-identical in any engine, so a DuckDB oracle replays
  * every iteration. Init = the k lowest-id vectors (deterministic,
  * the same coarse-quantizer convention as [[Similarity.ivfTopK]]);
  * ties in assignment break to the lowest centroid index; an empty
  * cell keeps its previous centroid.
  */
object Clustering {

  /** Driver-side quantization of one collected vector onto the
    * `floor(x·10⁶)` lattice — the same lattice every distributed
    * distance in this module uses. */
  private def quantize(v: Any): Seq[Long] = v match {
    // Row.getSeq hands back a mutable.ArraySeq, which is NOT the
    // (immutable) default Seq in 2.13 — match the collection root
    case s: scala.collection.Seq[_] => s.iterator.map {
      case f: java.lang.Float => math.floor(f.toDouble * 1e6).toLong
      case d: java.lang.Double => math.floor(d.doubleValue * 1e6).toLong
      case x => throw new IllegalArgumentException(s"non-numeric element $x")
    }.toSeq
    case x => throw new IllegalArgumentException(s"non-array vector column: $x")
  }

  /** Run `iters` Lloyd iterations of k-means and return the final
    * assignment: (vec_id, topic int, qdist long). `tracker` (if set)
    * eagerly materializes the projected base ONCE so the 2·iters+1
    * passes re-read persisted blocks instead of re-scanning the
    * source — at scale, pass one. */
  def kmeansTopics(df: DataFrame, idCol: Column, vecCol: Column,
                   dims: Int, k: Int, iters: Int,
                   tracker: Option[Materialize.Tracker] = None): DataFrame = {
    require(k >= 1 && iters >= 0, "k >= 1, iters >= 0")
    val base0 = df.select(idCol.as("vec_id"), vecCol.as("vec"))
    val base = tracker.map(t => t.track(Materialize.eager(base0))).getOrElse(base0)

    // init: the k lowest-id vectors, quantized driver-side (k rows)
    var cents: Seq[Seq[Long]] = base.orderBy(col("vec_id")).limit(k)
      .select(col("vec")).collect().map(r => quantize(r.get(0))).toSeq
    require(cents.length == k, s"corpus has fewer than k=$k vectors")

    for (_ <- 1 to iters) {
      val assigned = base.select(
        graft.functions.NearestCentroid(col("vec"), cents, dims).getField("cell").as("cell"),
        col("vec"))
        // a vector with numElements != dims (or a null element) assigns
        // a null cell — drop it here, or the null group survives the
        // groupBy and the driver-side getInt(0) NPEs mid-iteration
        .filter(col("cell").isNotNull)
      // per-(cell,dim) sums: map-side partial agg → the shuffle is
      // k·dims (sum, count) pairs per task, corpus-size independent
      val sums = assigned
        .select(col("cell"), posexplode(col("vec")).as(Seq("dim", "xf")))
        .select(col("cell"), col("dim"),
          floor(col("xf").cast("double") * lit(1000000.0)).cast("long").as("x"))
        .groupBy(col("cell"), col("dim"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .withColumn("c",
          floor(col("s").cast("double") / col("n").cast("double")).cast("long"))
      val updated: Map[Int, Seq[Long]] = sums
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
          s => s.getField("c")).as("cv"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toSeq).toMap
      cents = cents.indices.map(i => updated.getOrElse(i, cents(i)))
    }

    val a = graft.functions.NearestCentroid(col("vec"), cents, dims)
    base.select(col("vec_id"), a.getField("cell").as("topic"),
                a.getField("qdist").as("qdist"))
      .filter(col("topic").isNotNull) // same invalid-vector guard as the iterations
  }

  /** Greedy k-center diversity coreset (Gonzalez 1985 farthest-first
    * traversal, the selection rule behind coreset/diversity sampling
    * of training corpora): seed with the lowest-id vector, then k−1
    * times pick the point FARTHEST from its nearest already-selected
    * center (max-min distance; ties to the lowest vec_id). The
    * selected sequence's distances are the classic coverage-radius
    * curve — a 2-approximation of the optimal k-center radius at each
    * prefix.
    *
    * Spark shape per round — the same scan-only discipline as
    * [[kmeansTopics]]:
    *  - the running min-distance column updates via ONE codegen'd
    *    [[graft.functions.NearestCentroid]] pass against the single
    *    newest center (baked into the plan as literals — no join, no
    *    broadcast table);
    *  - the argmax is a TakeOrdered over (md desc, vec_id asc) —
    *    per-partition top-1 then a k-way driver merge, never a global
    *    sort;
    *  - one vector hops the driver per round (dims longs — the
    *    justified-collect pattern), and the running min-distance
    *    frame is materialized per round with the superseded round
    *    released, so each round is ONE distance pass over persisted
    *    blocks (stacked lazy selects would re-run every prior pass
    *    under each argmax — O(k²·n)).
    *
    * Distances are exact int64 squared-L2 on the `floor(x·10⁶)`
    * lattice, so an oracle replays the greedy selection bit-for-bit.
    * Returns the selected centers: (sel_round int, vec_id long,
    * dist_q long) where dist_q is the point's min-distance at
    * selection time (0 for the seed). Selection STOPS EARLY when the
    * coverage radius hits 0 — fewer than k distinct vectors — rather
    * than silently re-selecting centers; wrong-width vectors are
    * filtered up front, null-element vectors drop at the distance.
    */
  def kCenter(df: DataFrame, idCol: Column, vecCol: Column,
              dims: Int, k: Int,
              tracker: Option[Materialize.Tracker] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // width guard BEFORE the seed pick: a malformed lowest-id vector
    // would otherwise crash the plan build instead of dropping like
    // every other invalid vector (null elements still null out in the
    // distance expression below)
    val base0 = df.select(idCol.cast("long").as("vec_id"), vecCol.as("vec"))
      .filter(size(col("vec")) === dims)
    val base = tracker.map(t => t.track(Materialize.eager(base0))).getOrElse(base0)

    val seedRow = base.orderBy(col("vec_id")).limit(1).select(col("vec_id"), col("vec"))
      .collect().headOption.getOrElse(throw new IllegalArgumentException("empty corpus"))
    val selected = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)](
      (0, seedRow.getLong(0), 0L))

    def distTo(center: Seq[Long]): Column =
      graft.functions.NearestCentroid(col("vec"), Seq(center), dims).getField("qdist")

    // running min-distance frame, MATERIALIZED each round and the
    // superseded round released (the superstep protocol) — stacking
    // unmaterialized selects would re-evaluate every prior round's
    // distance pass under each argmax, O(k²·n) instead of O(k·n)
    var cur = Materialize.eager(base.select(col("vec_id"), col("vec"),
        distTo(quantize(seedRow.get(1))).as("md"))
      .filter(col("md").isNotNull))
    try {
      var r = 1
      var exhausted = false
      while (r < k && !exhausted) {
        val top = cur.orderBy(col("md").desc, col("vec_id").asc)
          .limit(1).collect().headOption
          .getOrElse(throw new IllegalArgumentException("corpus has no valid vectors"))
        if (top.getLong(2) == 0L) {
          // coverage radius 0: every remaining point coincides with a
          // selected center (fewer than k distinct vectors) — more
          // "centers" would silently duplicate rows, so stop short
          exhausted = true
        } else {
          selected += ((r, top.getLong(0), top.getLong(2)))
          if (r < k - 1) { // the last selection needs no distance refresh
            val next = Materialize.eager(cur.select(col("vec_id"), col("vec"),
              least(col("md"), distTo(quantize(top.get(1)))).as("md")))
            Materialize.release(cur)
            cur = next
          }
          r += 1
        }
      }
    } finally Materialize.release(cur)
    val spark = df.sparkSession
    import spark.implicits._
    selected.toSeq.toDF("sel_round", "vec_id", "dist_q")
  }
}
