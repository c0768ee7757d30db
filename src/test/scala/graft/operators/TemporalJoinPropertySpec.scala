package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized sweeps pinning the temporal joins to brute-force
  * reference implementations computed in plain Scala — ties, equal
  * timestamps, empty sides, and boundary inclusivity all emerge from
  * the generators instead of hand-picked fixtures (deterministic
  * scalacheck seeds; TemporalJoinSpec keeps the readable examples). */
class TemporalJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default.withSize(60), Seed(seed)).getOrElse(sys.error("gen failed"))

  // small domains force key collisions and timestamp ties
  private val rowGen = for {
    k <- Gen.choose(0, 4)
    t <- Gen.choose(0L, 20L)
    id <- Gen.choose(0L, 1000000L)
  } yield (k, t, id)

  test("asOf equals the brute-force latest-at-or-before with max-tiebreak semantics") {
    (1L to 6L).foreach { seed =>
      val lRows = sample(Gen.listOfN(40, rowGen), seed).distinct
      val rRows = sample(Gen.listOfN(40, rowGen), seed + 100).distinct
      val l = lRows.toDF("k", "lt", "lid")
      val r = rRows.map { case (k, t, id) => (k, t, id, s"p$id") }
        .toDF("k", "rt", "m_id", "m_p")
      val got = TemporalJoin.asOf(l, r, keyCols = Seq("k"),
          leftTime = "lt", rightTime = "rt",
          payloadCols = Seq("m_id", "m_p"), tiebreakCols = Seq("m_id"))
        .select("k", "lt", "lid", "m_id", "m_p")
        .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2),
          if (x.isNullAt(3)) null else x.getLong(3).toString,
          x.getString(4))).toSet
      // reference: per left row, the right rows with same key, rt <= lt;
      // winner = max (rt, tiebreak id)
      val want = lRows.map { case (k, lt, lid) =>
        val elig = rRows.filter { case (rk, rt, _) => rk == k && rt <= lt }
        if (elig.isEmpty) (k, lt, lid, null, null)
        else {
          val (_, _, mid) = elig.maxBy { case (_, rt, id) => (rt, id) }
          (k, lt, lid, mid.toString, s"p$mid")
        }
      }.toSet
      assert(got == want, s"seed $seed")
    }
  }

  test("pointInRange equals the brute-force inclusive-bounds filter join across bin widths") {
    (1L to 4L).foreach { seed =>
      val pRows = sample(Gen.listOfN(50, rowGen), seed).distinct
      val rRows = sample(Gen.listOfN(15, rowGen), seed + 200).distinct
      val width = 1L + (seed % 3) * 3 // 1, 4, 7 — bins misaligned with ranges
      val p = pRows.toDF("k", "pt", "pid")
      val r = rRows.map { case (k, t, id) => (k, t, t + width, id) }
        .toDF("k", "ws", "we", "rid")
      val got = TemporalJoin.pointInRange(p, r, keyCols = Seq("k"),
          pointTime = "pt", rangeStart = "ws", rangeEnd = "we", binWidth = width)
        .select("k", "pid", "rid")
        .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2))).toSet
      val want = (for {
        (pk, pt, pid) <- pRows
        (rk, rs, rid) <- rRows
        if pk == rk && pt >= rs && pt <= rs + width
      } yield (pk, pid, rid)).toSet
      assert(got == want, s"seed $seed width $width")
    }
  }

  test("the range-bin Catalyst rule (session-wide) preserves random join results exactly") {
    {
      (1L to 4L).foreach { seed =>
        val pRows = sample(Gen.listOfN(60, rowGen), seed).distinct
          .map { case (k, t, id) => (k.toLong, t * 3, id) }
        val rRows = sample(Gen.listOfN(20, rowGen), seed + 300).distinct
          .map { case (k, t, id) => (k.toLong, t * 3, id) }
        val p = pRows.toDF("k", "pt", "pid")
        val r = rRows.toDF("rk", "rs", "rid")
        val cond = col("k") === col("rk") &&
          col("pt") >= col("rs") && col("pt") <= col("rs") + 5L
        val got = p.join(r, cond).select("pid", "rid")
          .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
        val want = (for {
          (pk, pt, pid) <- pRows; (rk, rs, rid) <- rRows
          if pk == rk && pt >= rs && pt <= rs + 5L
        } yield (pid, rid)).toSet
        assert(got == want, s"seed $seed")
      }
    }
  }
}
