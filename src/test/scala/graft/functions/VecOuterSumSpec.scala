package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Pins the native second-moment aggregate: buffer layout, triangle
  * indexing, partial-merge additivity, and null/length guards. */
class VecOuterSumSpec extends SparkSpec {
  import spark.implicits._

  private val d = 3

  private def sketch(rows: Seq[Seq[Long]]): Array[Long] = {
    val df = rows.toDF("q").repartition(3) // force partial merges
    df.agg(ColumnBridge.column(VecOuterSum(
        ColumnBridge.expression(col("q")), d, 0, 0)
      .toAggregateExpression()).as("sk"))
      .first().getSeq[Long](0).toArray
  }

  test("buffer holds n, dim sums, and upper-triangle pair sums") {
    val sk = sketch(Seq(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)))
    assert(sk(0) == 2L)                       // n
    assert(sk.slice(1, 4).toSeq == Seq(5L, 7L, 9L))
    // pairs (0,0)(0,1)(0,2)(1,1)(1,2)(2,2):
    // 1+16, 2+20, 3+24, 4+25, 6+30, 9+36
    assert(sk.slice(4, 10).toSeq == Seq(17L, 22L, 27L, 29L, 36L, 45L))
  }

  test("triIndex matches the buffer layout") {
    assert(VecOuterSum.triIndex(0, 0, 3) == 0)
    assert(VecOuterSum.triIndex(0, 2, 3) == 2)
    assert(VecOuterSum.triIndex(1, 1, 3) == 3)
    assert(VecOuterSum.triIndex(2, 2, 3) == 5)
  }

  test("nulls are skipped (aggregate null semantics)") {
    val rows = Seq(Some(Seq(1L, 1L, 1L)), None, Some(Seq(2L, 2L, 2L))).toDF("q")
    val sk = rows.agg(ColumnBridge.column(VecOuterSum(
        ColumnBridge.expression(col("q")), d, 0, 0)
      .toAggregateExpression()).as("sk"))
      .first().getSeq[Long](0).toArray
    assert(sk(0) == 2L && sk(1) == 3L)
  }

  test("a ragged (wrong-length) vector throws instead of silently narrowing the sample") {
    val rows = Seq(Some(Seq(1L, 1L, 1L)), Some(Seq(9L, 9L))).toDF("q")
    val e = intercept[org.apache.spark.SparkException] {
      rows.agg(ColumnBridge.column(VecOuterSum(
          ColumnBridge.expression(col("q")), d, 0, 0)
        .toAggregateExpression()).as("sk")).first()
    }
    assert(e.getMessage.contains("ragged") ||
      Option(e.getCause).exists(_.getMessage.contains("ragged")))
  }
}
