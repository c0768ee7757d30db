package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native one-pass Jaccard must be value-identical to the composed
  * `size(array_intersect)/size(array_union)` form it replaced —
  * including duplicate elements (count once), null ELEMENTS (one
  * distinct slot per side, intersecting only when both sides carry
  * one), null ARRAYS (null out), and the empty/empty 0/0 = NaN case. */
class LongJaccardSpec extends SparkSpec {
  import spark.implicits._

  private def composed(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  test("long jaccard matches the composed intersect/union form") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { i =>
      // small value domain forces real overlaps AND duplicates;
      // non-empty (empty/empty raises in the ANSI composed form —
      // that divergence has its own test below)
      def arr() = Array.fill(1 + rnd.nextInt(40))(rnd.nextInt(25).toLong)
      (i.toLong, arr(), arr())
    } ++ Seq(
      (1002L, Array(1L, 2L, 2L, 3L), Array.empty[Long]),  // 0/3
      (1003L, Array(5L), Array(5L, 5L)))                  // dups count once
    val df = rows.toDF("id", "a", "b")
    val out = df.select(col("id"),
        Dedup2.native(col("a"), col("b")).as("native"),
        composed(col("a"), col("b")).as("algebra"))
      .collect()
    out.foreach { r =>
      val n = r.getDouble(1); val c = r.getDouble(2)
      assert(n == c || (n.isNaN && c.isNaN), s"id=${r.getLong(0)}: $n != $c")
    }
  }

  test("long containment matches the composed intersect/size form") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { i =>
      def arr() = Array.fill(1 + rnd.nextInt(40))(rnd.nextInt(25).toLong)
      (i.toLong, arr(), arr())
    } ++ Seq((1002L, Array(1L, 1L, 2L), Array(1L)), // raw |A|=3, inter=1
             (1003L, Array(5L), Array.empty[Long]))
    val df = rows.toDF("id", "a", "b")
    val composedC = size(array_intersect(col("a"), col("b"))).cast("double") /
      size(col("a")).cast("double")
    val out = df.select(col("id"),
        LongContainment(col("a"), col("b")).as("native"),
        composedC.as("algebra"))
      .collect()
    out.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"id=${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
  }

  test("empty/empty yields NaN (the composed form RAISES under ANSI — the one deliberate divergence)") {
    // production inputs (hashed shingle sets) are never empty, but a
    // degenerate row must not kill the job the way ANSI division does
    val df = Seq((1L, Array.empty[Long], Array.empty[Long])).toDF("id", "a", "b")
    val v = df.select(Dedup2.native(col("a"), col("b"))).head().getDouble(0)
    assert(v.isNaN)
  }

  test("null elements and null arrays follow the composed semantics") {
    val df = Seq(
      (1L, Seq[java.lang.Long](1L, null, 2L), Seq[java.lang.Long](2L, null)),
      (2L, Seq[java.lang.Long](1L, null), Seq[java.lang.Long](2L)),
      (3L, null, Seq[java.lang.Long](1L)))
      .toDF("id", "a", "b")
    val out = df.select(col("id"),
        Dedup2.native(col("a"), col("b")).as("n"),
        composed(col("a"), col("b")).as("c"))
      .collect()
    out.foreach { r =>
      if (r.isNullAt(2)) assert(r.isNullAt(1), s"id=${r.getLong(0)}: expected null")
      else assert(r.getDouble(1) == r.getDouble(2),
        s"id=${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
  }
}

/** Indirection so the spec reads at the call-site grain. */
private object Dedup2 {
  def native(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    LongJaccard(a, b)
}
