package graft.functions

import graft.SparkSpec
import graft.llm.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The native one-pass MinHash expression must be BIT-IDENTICAL to
  * the explode reference path — any divergence silently breaks every
  * dedup oracle, so the contract is pinned over generated texts
  * (multi-byte chars, short-below-shingle-width strings, empties,
  * repeats) rather than assumed. */
class MinhashSigsSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default.withSize(80), Seed(seed)).getOrElse(sys.error("gen failed"))

  // mixes ASCII, multi-byte (é, 漢), repeats, and lengths straddling n
  private val textGen: Gen[String] = for {
    len <- Gen.choose(0, 40)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', ' ', 'é', '漢', 'x'))
  } yield cs.mkString

  test("native signatures equal the explode reference bit-for-bit") {
    (1L to 4L).foreach { seed =>
      val texts = sample(Gen.listOfN(40, textGen), seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val df = texts.toDF("doc_id", "text")
      val native = Dedup.minhashSignatureText(df, col("doc_id"), col("text"), n = 5, k = 12)
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      val ref = Dedup.minhashSignatureTextExploded(df, col("doc_id"), col("text"), n = 5, k = 12)
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      assert(native == ref, s"seed $seed: signature divergence")
    }
  }

  test("native signatures + sets equal the explode reference (sets as sets)") {
    (1L to 4L).foreach { seed =>
      val texts = sample(Gen.listOfN(30, textGen), seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val df = texts.toDF("doc_id", "text")
      def norm(rows: Array[org.apache.spark.sql.Row]) =
        rows.map { r =>
          val vals = r.toSeq
          r.getLong(0) -> ((vals.slice(1, 13),
            vals.last.asInstanceOf[scala.collection.Seq[Long]].toSet))
        }.toMap
      val native = norm(Dedup.minhashSignatureAndSets(
        df, col("doc_id"), col("text"), n = 5, k = 12).collect())
      val ref = norm(Dedup.minhashSignatureAndSetsExploded(
        df, col("doc_id"), col("text"), n = 5, k = 12).collect())
      assert(native == ref, s"seed $seed: signature/set divergence")
    }
  }

  test("in-row paired shingle sets equal the two-frame join shape (round-22 llm82)") {
    // the llm82 restructure: (sh(text), sh(text+pad)) built in ONE
    // row-level projection must match the old shape — two
    // hashedShingleSets passes over the id-shifted union, re-paired by
    // an inner join on doc_id
    val pad = " tail pad xyz"
    (1L to 3L).foreach { seed =>
      val texts = sample(Gen.listOfN(30, textGen), seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val d = texts.toDF("doc_id", "text")
      val inRow = d.where(col("text").isNotNull)
        .select(col("doc_id"),
          Dedup.hashedShingleSet(col("text"), 5).as("sh_a"),
          Dedup.hashedShingleSet(concat(col("text"), lit(pad)), 5).as("sh_b"))
        .collect().map(r => r.getLong(0) -> ((
          r.getSeq[Long](1).toSet, r.getSeq[Long](2).toSet))).toMap
      val corpus = d.unionByName(d.select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(pad)).as("text")))
      val sets = Dedup.hashedShingleSets(corpus, col("doc_id"), col("text"), n = 5)
      val joined = sets.filter(col("doc_id") < 100000L)
        .select(col("doc_id"), col("shh").as("sh_a"))
        .join(sets.filter(col("doc_id") >= 100000L)
          .select((col("doc_id") - 100000L).as("doc_id"), col("shh").as("sh_b")), "doc_id")
        .collect().map(r => r.getLong(0) -> ((
          r.getSeq[Long](1).toSet, r.getSeq[Long](2).toSet))).toMap
      assert(inRow == joined, s"seed $seed: paired-set divergence")
    }
  }

  test("null text drops the row in BOTH paths (intentional contract)") {
    // NB: the un-filtered explode formulation would NOT drop it —
    // greatest() skips nulls, so it emitted a null-signature row; the
    // drop is the declared contract and both impls now pin it.
    val df = Seq((1L, "hello world"), (2L, null)).toDF("doc_id", "text")
    val ids = Dedup.minhashSignatureText(df, col("doc_id"), col("text"), n = 5, k = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L))
    val refIds = Dedup.minhashSignatureTextExploded(df, col("doc_id"), col("text"), n = 5, k = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(refIds == Set(1L))
  }

  test("codegen and interpreted paths agree") {
    val df = Seq((1L, "abcdefgh"), (2L, ""), (3L, "ab")).toDF("doc_id", "text")
    val viaExpr = df.select(col("doc_id"),
        MinhashSigs(col("text"), 4, 3, withSet = true).as("b"))
      .collect().map { r =>
        val st = r.getStruct(1)
        (r.getLong(0), (st.getSeq[Long](0).toList, st.getSeq[Long](1).toList))
      }.toMap
    // interpreted: evaluate the static helper directly
    val direct = Seq((1L, "abcdefgh"), (2L, ""), (3L, "ab")).map { case (id, t) =>
      val row = MinhashSigs.sigsAndSet(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), 4, 3)
      id -> ((row.getArray(0).toLongArray().toList,
              row.getArray(1).toLongArray().toList))
    }.toMap
    assert(viaExpr == direct)
  }
}
