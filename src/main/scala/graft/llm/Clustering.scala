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

    def quantize(v: Any): Seq[Long] = v match {
      // Row.getSeq hands back a mutable.ArraySeq, which is NOT the
      // (immutable) default Seq in 2.13 — match the collection root
      case s: scala.collection.Seq[_] => s.iterator.map {
        case f: java.lang.Float => math.floor(f.toDouble * 1e6).toLong
        case d: java.lang.Double => math.floor(d.doubleValue * 1e6).toLong
        case x => throw new IllegalArgumentException(s"non-numeric element $x")
      }.toSeq
      case x => throw new IllegalArgumentException(s"non-array vector column: $x")
    }

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
}
