package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the KS length drift: identical distributions score zero, a
  * shift is detected and localized, and the statistic is symmetric
  * in magnitude. */
class LengthDriftSpec extends SparkSpec {
  import spark.implicits._

  private def drift(a: Seq[String], b: Seq[String]) =
    CorpusStats.lengthDrift(a.toDF("t"), col("t"), b.toDF("t"), col("t"),
        bucketWidth = 10).first()

  test("identical corpora drift zero; a shifted corpus localizes") {
    val base = Seq("x" * 5, "y" * 15, "z" * 25, "w" * 15)
    assert(drift(base, base).getAs[Long]("ks_scaled") == 0L)
    val shifted = base.map(_ * 3) // every length tripled
    val r = drift(base, shifted)
    assert(r.getAs[Long]("ks_scaled") > 0L)
    // all of v1's mass at bucket <= 2; none of v2's below bucket 1:
    // max gap sits inside v1's range
    assert(r.getAs[Int]("at_bucket") <= 2)
  }

  test("the statistic magnitude is direction-symmetric") {
    val a = Seq("x" * 5, "y" * 5, "z" * 35)
    val b = Seq("x" * 35, "y" * 35, "z" * 5)
    assert(drift(a, b).getAs[Long]("ks_scaled") ==
           drift(b, a).getAs[Long]("ks_scaled"))
  }
}
