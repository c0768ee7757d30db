package graft.functions

import graft.SparkSpec
import graft.llm.Clustering
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The native assignment expression must reproduce the
  * quantized-lattice argmin that the DuckDB oracle for llm30 renders
  * in SQL: exact int64 squared distances over floor(x·10⁶), ties to
  * the lowest centroid index. */
class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  /** The reference formulation in Column algebra: per-centroid
    * interpreted aggregate(zip_with) distances, argmin via
    * least-struct. */
  private def oldAssign(vec: Column, cents: Seq[Seq[Long]]): Column = {
    def qint(c: Column): Column = floor(c.cast("double") * lit(1000000.0)).cast("long")
    val ds = cents.zipWithIndex.map { case (cv, i) =>
      val d = aggregate(zip_with(vec, typedLit(cv), (x, c) => {
        val diff = qint(x) - c
        diff * diff
      }), lit(0L), (acc, x) => acc + x)
      struct(d.as("qdist"), lit(i).as("cell"))
    }
    least(ds: _*)
  }

  test("nearest centroid: native expression matches the algebra argmin, ties to lowest index") {
    val rnd = new scala.util.Random(11)
    val dims = 16
    val cents = (0 until 5).map(c =>
      (0 until dims).map(d => Portable.hash64Jvm(s"c$c:$d") % 400000L).toSeq)
    val rows = (1 to 300).map { i =>
      (i.toLong, Array.fill(dims)((rnd.nextFloat() - 0.5f) * 0.8f))
    } :+ (1000L, cents(2).map(q => (q / 1e6).toFloat).toArray) // lands exactly on centroid 2
    val df = rows.toDF("id", "v")
    val nat = NearestCentroid(col("v"), cents, dims)
    val out = df.select(col("id"),
        nat.getField("cell").as("nc"), nat.getField("qdist").as("nd"),
        oldAssign(col("v"), cents).getField("cell").as("oc"),
        oldAssign(col("v"), cents).getField("qdist").as("od"))
      .collect()
    out.foreach { r =>
      assert(r.getInt(1) == r.getInt(3), s"id=${r.getLong(0)} cell")
      assert(r.getLong(2) == r.getLong(4), s"id=${r.getLong(0)} dist")
    }
    // duplicate centroids tie → lowest index wins
    val dup = Seq((1L, cents(1).map(q => (q / 1e6).toFloat))).toDF("id", "v")
    val tied = NearestCentroid(col("v"), Seq(cents(1), cents(1), cents(0)), dims)
    assert(dup.select(tied.getField("cell")).head().getInt(0) == 0)
  }

  test("nearest centroid: stays inside whole-stage codegen; bad shapes are null") {
    val dims = 8
    val cents = Seq(Seq.fill(dims)(0L), Seq.fill(dims)(100000L))
    val rdf = spark.range(50).select(col("id"),
      array((0 until dims).map(j => ((col("id") + j) % 7 - 3).cast("float") / lit(9.0f)): _*).as("v"))
    val plan = rdf.select(NearestCentroid(col("v"), cents, dims).as("a"))
      .queryExecution.executedPlan.toString
    val projLine = plan.linesIterator.find(_.toLowerCase.contains("nearestcentroid"))
    assert(projLine.exists(_.trim.startsWith("*")),
      s"nearestcentroid projection must be whole-stage-codegen'd (starred):\n$plan")

    val bad = Seq(
      (1L, Seq(Some(1.0f), Some(2.0f))),                 // wrong dims
      (2L, Seq(Some(1.0f), None) ++ Seq.fill(6)(Some(0f))), // null element
      (3L, Seq.fill(dims)(Some(0.05f))))
      .toDF("id", "v")
    val out = bad.select(col("id"), NearestCentroid(col("v"), cents, dims).as("a"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(1).isNullAt(1) && !out(2).isNullAt(1))
  }

  test("kmeansTopics: hand-checkable two-cluster split, empty cell keeps its centroid") {
    // two tight groups far apart on one axis; k=2 init = vecs 1,2 (both in group A)
    val a = Seq(0.10f, 0.11f, 0.12f, 0.13f)
    val b = Seq(0.90f, 0.91f, 0.92f, 0.93f)
    def vec(base: Seq[Float], eps: Float) = base.map(x => x + eps)
    val df = Seq(
      (1L, vec(a, 0f)), (2L, vec(a, 0.001f)), (3L, vec(a, -0.001f)),
      (4L, vec(b, 0f)), (5L, vec(b, 0.002f)))
      .toDF("vec_id", "embedding")
    val out = Clustering.kmeansTopics(df, col("vec_id"), col("embedding"),
        dims = 4, k = 2, iters = 2)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    // iter 1: everything nearer init-1 or init-2 splits on the 0.001 offset;
    // by iter 2 the B group pulls centroid 1 away: A → cell 0, B → cell 1
    assert(out.map(_._2).distinct.size == 2, s"expected 2 clusters, got $out")
    assert(out(0)._2 == out(1)._2 && out(1)._2 == out(2)._2, s"group A split: $out")
    assert(out(3)._2 == out(4)._2 && out(3)._2 != out(0)._2, s"group B not separated: $out")
  }

  test("kmeansTopics: invalid vectors (wrong dims / null element) are skipped, not an NPE mid-iteration") {
    // a wrong-dims vector and a null-element vector assign a null cell;
    // without the isNotNull guard the null group survives the update
    // groupBy and the driver-side getInt(0) throws NPE
    val good = Seq(
      (1L, Seq(Some(0.1f), Some(0.1f))), (2L, Seq(Some(0.2f), Some(0.2f))),
      (3L, Seq(Some(0.9f), Some(0.9f))))
    val bad = Seq(
      (90L, Seq(Some(0.5f))),             // wrong dims
      (91L, Seq(Some(0.5f), None)))       // null element
    val df = (good ++ bad).toDF("vec_id", "embedding")
    val out = Clustering.kmeansTopics(df, col("vec_id"), col("embedding"),
        dims = 2, k = 2, iters = 2)
      .orderBy("vec_id").collect()
    // only the valid vectors come back, each with a non-null topic
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L), out.mkString(","))
    assert(out.forall(!_.isNullAt(1)))
  }
}
