package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Round-21 equality pins for the JVM text-gate scans: the composed
  * column-algebra forms (interpreted HOF lambdas — the round-20
  * finding) stay in-tree as the CONTRACT; these sweeps assert the JVM
  * rewrites compute identical values over generated inputs including
  * leet obfuscations, zero-width insertions, multi-byte code points,
  * empty and 1-token docs, and periods longer than the doc. */
class TextGatePropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default.withSize(80), Seed(seed)).getOrElse(sys.error("gen failed"))

  // vocabulary exercising the leet fold (7oxic → toxic), zero-width
  // evasions, multi-byte code points and plain repeats
  private val tokGen = Gen.oneOf("toxic", "7oxic", "t0xic", "TOXIC",
    "gp​u", "café", "日本", "buy", "buy", "spam", "ham",
    "a", "bb", "x9", "@$", "m0d3l")
  private val docGen = for {
    len <- Gen.choose(0, 40)
    toks <- Gen.listOfN(len, tokGen)
  } yield toks.mkString(" ")

  test("blocklistHits JVM scan equals the composed HOF form") {
    (1L to 6L).foreach { seed =>
      val docs = sample(Gen.listOfN(30, docGen), seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val bl = Seq("toxic", "spam")
      val df = docs.toDF("id", "text")
      val got = df.select(col("id"),
          TextAnalysis.blocklistHits(col("text"), bl).as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = df.select(col("id"),
          TextAnalysis.blocklistHitsComposed(col("text"), bl).as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"seed $seed")
    }
  }

  test("loopFlag JVM scan equals the composed HOF form") {
    (1L to 6L).foreach { seed =>
      val docs = sample(Gen.listOfN(30, docGen), seed + 100).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("id", "text")
      for (maxPeriod <- Seq(1, 4); thr <- Seq(10, 30, 100)) {
        val got = df.select(col("id"),
            TextAnalysis.loopFlag(TextAnalysis.tokens(col("text")), maxPeriod, thr).as("f"))
          .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getBoolean(1))).toMap
        val want = df.select(col("id"),
            TextAnalysis.loopFlagComposed(TextAnalysis.tokens(col("text")), maxPeriod, thr).as("f"))
          .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getBoolean(1))).toMap
        assert(got == want, s"seed $seed maxPeriod $maxPeriod thr $thr")
      }
    }
  }

  test("loopMatchCountsJvm equals the composed per-period aggregate counts") {
    (1L to 6L).foreach { seed =>
      val docs = sample(Gen.listOfN(30, docGen), seed + 200)
      val maxPeriod = 4
      docs.foreach { d =>
        val toks = d.split("\\s+").filter(_.nonEmpty).toIndexedSeq
        val got = TextAnalysis.loopMatchCountsJvm(toks, maxPeriod).toSeq
        val want = (1 to maxPeriod).map { p =>
          if (toks.length > p)
            toks.drop(p).zip(toks.dropRight(p)).count { case (a, b) => a == b }.toLong
          else 0L
        }
        assert(got == want, s"seed $seed doc '$d'")
      }
    }
  }

  test("null text keeps the composed forms' null behavior") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "toxic spam toxic spam"))
      .toDF("id", "text")
    val jvm = df.select(col("id"),
        TextAnalysis.blocklistHits(col("text"), Seq("toxic")).as("b"),
        TextAnalysis.loopFlag(TextAnalysis.tokens(col("text")), 4, 30).as("f"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2))).toSet
    val composed = df.select(col("id"),
        TextAnalysis.blocklistHitsComposed(col("text"), Seq("toxic")).as("b"),
        TextAnalysis.loopFlagComposed(TextAnalysis.tokens(col("text")), 4, 30).as("f"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2))).toSet
    assert(jvm == composed)
  }
}
