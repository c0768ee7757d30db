package graft.functions

import graft.SparkSpec
import graft.llm.Similarity
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The one-pass native RHP signature expression must reproduce the
  * per-plane column-algebra form it replaced bit-for-bit — same
  * quantization (floor(x·10⁶)), same int64 exact contribution sums,
  * same sign-bit packing — because the DuckDB oracle for llm04/llm08
  * renders exactly that arithmetic in SQL. */
class RhpSignaturesSpec extends SparkSpec {
  import spark.implicits._

  /** The retired formulation: one interpreted aggregate(zip_with) per
    * plane, when(sum >= 0) bit packing. */
  private def oldBandSigs(vec: Column, dims: Int, planesPerBand: Int, bands: Int): Seq[Column] = {
    def qint(c: Column): Column = floor(c.cast("double") * lit(1000000.0)).cast("long")
    val all = Similarity.rhpCoefficients(dims, planesPerBand * bands)
    (0 until bands).map { b =>
      all.slice(b * planesPerBand, (b + 1) * planesPerBand).zipWithIndex.map { case (cs, i) =>
        val contrib = aggregate(
          zip_with(vec, typedLit(cs), (x, c) => qint(x) * c),
          lit(0L), (acc, x) => acc + x)
        when(contrib >= 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce((a, b) => a + b)
    }
  }

  test("rhp signatures: native one-pass expression matches the per-plane algebra form") {
    val rnd = new scala.util.Random(7)
    val dims = 64
    val rows = (1 to 300).map { i =>
      (i.toLong, Array.fill(dims)((rnd.nextFloat() - 0.5f) * 4f))
    }
    val df = rows.toDF("id", "v")
    val native = RhpSignatures(col("v"), Similarity.rhpCoefficients(dims, 16 * 4),
      dims, bandSize = 16, bands = 4)
    val olds = oldBandSigs(col("v"), dims, 16, 4)
    val out = df.select(col("id") +: (0 until 4).flatMap(b =>
        Seq(native.getItem(b).as(s"n$b"), olds(b).as(s"o$b"))): _*)
      .collect()
    out.foreach { r =>
      (0 until 4).foreach { b =>
        assert(r.getLong(1 + 2 * b) == r.getLong(2 + 2 * b),
          s"id=${r.getLong(0)} band=$b: native ${r.getLong(1 + 2 * b)} != old ${r.getLong(2 + 2 * b)}")
      }
    }
  }

  test("rhp signatures: single-band path matches and stays inside whole-stage codegen") {
    val dims = 16
    val rdf = spark.range(200).select(col("id"),
      array((0 until dims).map(j => ((col("id") + j) % 17 - 8).cast("float") / lit(3.0f)): _*).as("v"))
    val nat = rdf.select(col("id"), Similarity.rhpSignature(col("v"), dims, 8).as("n"),
                         oldBandSigs(col("v"), dims, 8, 1).head.as("o"))
    nat.collect().foreach(r => assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}"))

    val plan = rdf.select(Similarity.rhpSignature(col("v"), dims, 8).as("bucket"))
      .queryExecution.executedPlan.toString
    val projLine = plan.linesIterator.find(_.toLowerCase.contains("rhpsignatures"))
    assert(projLine.exists(_.trim.startsWith("*")),
      s"rhpsignatures projection must be whole-stage-codegen'd (starred):\n$plan")
  }

  test("rhp signatures: length mismatch or null element zeroes every band, like the old form") {
    val df = Seq(
      (1L, Seq(Some(1.0f), Some(-2.0f))),               // wrong dims (expr built for 4)
      (2L, Seq(Some(1.0f), None, Some(3.0f), Some(1.0f))), // null element
      (3L, Seq(Some(0.5f), Some(-0.5f), Some(2.0f), Some(-1.0f))))
      .toDF("id", "v")
    val native = RhpSignatures(col("v"), Similarity.rhpCoefficients(4, 6),
      dims = 4, bandSize = 3, bands = 2)
    val olds = oldBandSigs(col("v"), 4, 3, 2)
    val out = df.select(col("id"), native.getItem(0).as("n0"), native.getItem(1).as("n1"),
                        olds(0).as("o0"), olds(1).as("o1")).orderBy("id").collect()
    assert(out(0).getLong(1) == 0L && out(0).getLong(2) == 0L)
    assert(out(0).getLong(1) == out(0).getLong(3) && out(0).getLong(2) == out(0).getLong(4))
    assert(out(1).getLong(1) == 0L && out(1).getLong(2) == 0L)
    assert(out(1).getLong(1) == out(1).getLong(3) && out(1).getLong(2) == out(1).getLong(4))
    assert(out(2).getLong(1) == out(2).getLong(3) && out(2).getLong(2) == out(2).getLong(4))
  }
}
