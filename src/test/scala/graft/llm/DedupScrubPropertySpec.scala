package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized sweeps pinning the scrub TRANSFORMATIONS to brute-force
  * references in plain Scala — cross-doc sharing, within-doc repeats,
  * keeper ties, and short docs all emerge from a tiny vocabulary
  * instead of hand-picked fixtures (LlmSpec keeps the readable
  * examples). */
class DedupScrubPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default.withSize(60), Seed(seed)).getOrElse(sys.error("gen failed"))

  // 4-word vocabulary over 3..10-token docs forces heavy span/passage
  // collisions across documents
  private val docGen = for {
    len <- Gen.choose(0, 10)
    toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
  } yield toks.mkString(" ")

  test("scrubDuplicatePassages equals the brute-force keep-first chunk scrub") {
    (1L to 5L).foreach { seed =>
      val docs = sample(Gen.listOfN(12, docGen), seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val n = 2
      val got = Dedup.scrubDuplicatePassages(docs.toDF("id", "text"),
          col("id"), col("text"), size = n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      // reference: aligned chunks, keeper = min doc containing the chunk
      val chunks = docs.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).grouped(n)
          .filter(_.length == n).map(_.mkString(" ")).toVector
      }
      val stats = chunks.flatMap { case (id, cs) => cs.distinct.map(_ -> id) }
        .groupBy(_._1).map { case (c, xs) =>
          c -> (xs.map(_._2).distinct.size, xs.map(_._2).min) }
      val want = chunks.map { case (id, cs) =>
        val kept = cs.filter(c => stats(c)._1 < 2 || stats(c)._2 == id)
        (id, kept.size.toLong, (cs.size - kept.size).toLong, kept.mkString(" "))
      }.toSet
      assert(got == want, s"seed $seed")
    }
  }

  test("scrubDuplicateSpans equals the brute-force coverage scrub") {
    (1L to 5L).foreach { seed =>
      val docs = sample(Gen.listOfN(12, docGen), seed + 50).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val n = 3
      val got = Dedup.scrubDuplicateSpans(docs.toDF("id", "text"),
          col("id"), col("text"), n = n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      val toks = docs.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty).toVector }
      val spans = toks.flatMap { case (id, ts) =>
        (0 to ts.length - n).map(i => (ts.slice(i, i + n).mkString(" "), id)) }
      val stats = spans.distinct.groupBy(_._1)
        .map { case (sp, xs) =>
          val ids = spans.filter(_._1 == sp).map(_._2).distinct
          sp -> (ids.size, ids.min) }
      val want = toks.map { case (id, ts) =>
        // position p (0-based) covered iff a duplicated non-keeper span
        // starts in [p-n+1, p]
        val dupStart = (0 to ts.length - n).map { i =>
          val sp = ts.slice(i, i + n).mkString(" ")
          stats(sp)._1 >= 2 && stats(sp)._2 != id
        }
        val covered = ts.indices.map { p =>
          (math.max(0, p - n + 1) to math.min(p, ts.length - n))
            .exists(s => s >= 0 && dupStart(s))
        }
        val kept = ts.indices.filterNot(covered).map(ts)
        (id, ts.length.toLong, covered.count(identity).toLong, kept.mkString(" "))
      }.toSet
      assert(got == want, s"seed $seed")
    }
  }
}
