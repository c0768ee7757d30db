package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native codegen'd quantized dot product must be value-identical
  * to the Column-algebra form it replaced (aggregate over zip_with) —
  * including the null semantics that form inherits from zip_with's
  * null padding and aggregate's null poisoning. */
class QuantizedDotSpec extends SparkSpec {
  import spark.implicits._

  private def oldForm(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) =>
        floor(x.cast("double") * lit(1000000.0)).cast("long") *
        floor(y.cast("double") * lit(1000000.0)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  test("quantized dot: codegen expression matches the interpreted column-algebra form") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { i =>
      val n = 1 + rnd.nextInt(96)
      (i.toLong, Array.fill(n)((rnd.nextFloat() - 0.5f) * 40f),
                 Array.fill(n)((rnd.nextFloat() - 0.5f) * 40f))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(col("id"),
        QuantizedDot(col("a"), col("b")).as("native"),
        oldForm(col("a"), col("b")).as("algebra"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}: native ${r.getLong(1)} != ${r.getLong(2)}")
    }

    // whole-stage codegen actually runs the expression: a range-backed
    // frame (local Seqs constant-fold to LocalTableScan) keeps a
    // WholeStageCodegen stage, and the doGenCode path must agree with
    // both the interpreted eval and the algebra form
    val rdf = spark.range(50).select(col("id"),
      array((0 until 8).map(j => (col("id") * (j + 1)).cast("float") / lit(7.0f)): _*).as("a"),
      array((0 until 8).map(j => (col("id") + j).cast("float") / lit(3.0f)): _*).as("b"))
    val rq = rdf.select(col("id"), QuantizedDot(col("a"), col("b")).as("native"),
                        oldForm(col("a"), col("b")).as("algebra"))
    rq.collect().foreach(r => assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}"))
    // alone, the expression stays INSIDE the codegen stage (starred
    // Project); the algebra form above is a CodegenFallback that would
    // drag any projection containing it out of codegen
    val plan = rdf.select(QuantizedDot(col("a"), col("b")).as("native"))
      .queryExecution.executedPlan.toString
    val projLine = plan.linesIterator.find(_.contains("quantizeddot"))
    assert(projLine.exists(_.trim.startsWith("*")),
      s"quantizeddot projection must be whole-stage-codegen'd (starred):\n$plan")
  }

  test("quantized dot: length mismatch and null elements yield null, like the old form") {
    val df = Seq(
      (1L, Seq(Some(1.0f), Some(2.0f)), Seq(Some(1.0f), Some(2.0f), Some(3.0f))),
      (2L, Seq(Some(1.0f), None), Seq(Some(1.0f), Some(2.0f))),
      (3L, Seq(Some(1.5f), Some(-2.5f)), Seq(Some(2.0f), Some(4.0f))))
      .toDF("id", "a", "b")
    val out = df.select(col("id"),
        QuantizedDot(col("a"), col("b")).as("native"),
        oldForm(col("a"), col("b")).as("algebra"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2))  // length mismatch
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))  // null element
    assert(!out(2).isNullAt(1) && out(2).getLong(1) == out(2).getLong(2))
    // 1.5→1500000, -2.5→-2500000, 2→2000000, 4→4000000
    assert(out(2).getLong(1) == 1500000L * 2000000L + (-2500000L) * 4000000L)
  }
}
