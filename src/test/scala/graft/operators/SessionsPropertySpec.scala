package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized sweep pinning Sessions to brute-force references in
  * plain Scala — timestamp ties, singleton users, threshold-boundary
  * gaps, and sparse retention matrices emerge from the generators
  * (deterministic seeds; SessionsSpec keeps the readable examples). */
class SessionsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default.withSize(60), Seed(seed)).getOrElse(sys.error("gen failed"))

  // small domains force per-user chains with ties and gaps around the
  // threshold on both sides
  private val evGen = for {
    u <- Gen.choose(0L, 4L)
    t <- Gen.choose(0L, 60L)
  } yield (u, t)

  test("sessionize equals the brute-force per-user scan for any gap pattern") {
    (1L to 6L).foreach { seed =>
      val rows = sample(Gen.listOfN(50, evGen), seed).zipWithIndex
        .map { case ((u, t), i) => (u, t, i.toLong) } // unique event ids
      val got = Sessions.sessionize(rows.toDF("u", "t", "id"),
          col("u"), col("t"), col("id"), gapUs = 10L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
      // reference: sort each user's events by (t, id), split when the
      // gap to the previous event exceeds the threshold, roll up
      val want = rows.groupBy(_._1).flatMap { case (u, evs) =>
        val sorted = evs.map(e => (e._2, e._3)).sortBy(identity)
        val sessions = sorted.tail.foldLeft(Vector(Vector(sorted.head))) {
          case (acc, ev) =>
            if (ev._1 - acc.last.last._1 > 10L) acc :+ Vector(ev)
            else acc.init :+ (acc.last :+ ev)
        }
        sessions.zipWithIndex.map { case (s, i) =>
          (u, i + 1L, s.size.toLong, s.head._1, s.last._1, s.last._1 - s.head._1)
        }
      }.toSet
      assert(got == want, s"seed $seed")
    }
  }

  test("cohortRetention equals the brute-force (cohort, offset) distinct-user count") {
    (1L to 6L).foreach { seed =>
      val rows = sample(Gen.listOfN(50, evGen), seed)
      val got = Sessions.cohortRetention(rows.toDF("u", "d"), col("u"), col("d"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = rows.distinct.groupBy(_._1).toSeq.flatMap { case (_, days) =>
        val cohort = days.map(_._2).min
        days.map(_._2).distinct.map(d => (cohort, d - cohort))
      }.groupBy(identity).map { case ((c, o), xs) => (c, o, xs.size.toLong) }.toSet
      assert(got == want, s"seed $seed")
    }
  }
}
