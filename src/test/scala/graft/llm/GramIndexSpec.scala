package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins the gram-index derivation contract: the suffix/prefix-derived
  * gram arrays are EXACTLY the full recompute of the modified string,
  * for any base string (including sub-k, where the fallback branch
  * fires) and any plant. The four index consumers (llm119/124/128/132)
  * are only correct if this equivalence is exact. */
class GramIndexSpec extends SparkSpec {

  private val k = 16
  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default.withSize(60), Seed(seed)).getOrElse(sys.error("gen failed"))
  private def gramsOf(rows: Seq[(Long, String, String)], derived: Boolean,
                      mode: String): Map[Long, Seq[Long]] = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "text", "plant")
    val mod = mode match {
      case "suffix" => concat(col("text"), col("plant"))
      case "prefix" => concat(col("plant"), col("text"))
    }
    val arr =
      if (!derived) GramIndex.gramArray(mod, k)
      else {
        val base = GramIndex.gramArray(col("text"), k)
        mode match {
          case "suffix" => GramIndex.withSuffixGrams(
            base, col("text"), length(col("text")), col("plant"), k)
          case "prefix" => GramIndex.withPrefixGrams(
            base, col("text"), length(col("text")), col("plant"), k)
        }
      }
    df.select(col("doc_id"), arr.as("gh")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
  }

  private val textGen = Gen.choose(1, 60).flatMap(n =>
    Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
  private val plantGen = Gen.oneOf(
    Gen.const(""),
    Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString)))

  test("suffix-derived gram arrays equal the full recompute (property)") {
    (1 to 6).foreach { seed =>
      val cases = sample(Gen.listOfN(12, Gen.zip(textGen, plantGen)), seed.toLong)
      val rows = cases.zipWithIndex.map { case ((t, p), i) => (i.toLong, t, p) }
      assert(gramsOf(rows, derived = true, "suffix") ===
             gramsOf(rows, derived = false, "suffix"), s"seed=$seed")
    }
  }

  test("prefix-derived gram arrays equal the full recompute (property)") {
    (1 to 6).foreach { seed =>
      val cases = sample(Gen.listOfN(12, Gen.zip(textGen, plantGen)), 100L + seed)
      val rows = cases.zipWithIndex.map { case ((t, p), i) => (i.toLong, t, p) }
      assert(gramsOf(rows, derived = true, "prefix") ===
             gramsOf(rows, derived = false, "prefix"), s"seed=$seed")
    }
  }

  test("materialized index round-trips and is shared across calls") {
    val dir = sfSmoke
    val a = GramIndex.documentsGramArrays(spark, dir, k)
    val direct = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), GramIndex.gramArray(col("text"), k).as("gh"))
    val idx = a.select(col("doc_id"), col("gh"))
    assert(idx.exceptAll(direct).count() === 0L)
    assert(direct.exceptAll(idx).count() === 0L)
    // second call reads the same materialization (no rebuild): the
    // parquet path must already exist and resolve to identical rows
    val b = GramIndex.documentsGramArrays(spark, dir, k)
    assert(b.count() === a.count())
  }

  test("positional form is 1-based and matches the per-doc array") {
    val dir = sfSmoke
    val pos = GramIndex.documentsPosHashes(spark, dir, k)
    assert(pos.agg(min(col("p"))).head().getInt(0) === 1)
    val viaArray = GramIndex.documentsGramArrays(spark, dir, k)
      .select(sum(size(col("gh")))).head().getLong(0)
    assert(pos.count() === viaArray)
  }
}
