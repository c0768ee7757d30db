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

  test("gramArray (JVM scan) equals the composed substr+md5 column form") {
    import spark.implicits._
    // code-point-heavy cases: Spark substr counts CODE POINTS, so the
    // byte-sliced JVM scan must agree on multi-byte and astral chars
    val texts = Seq(
      "",                                        // empty -> single hash of ""
      "short",                                   // sub-k -> whole-text hash
      "exactly sixteen!",                        // len == k -> one gram
      "the quick brown fox jumps over the lazy dog",
      "héllo wörld with àccénts répéated héllo wörld", // 2-byte chars
      "emoji 😀 inside 🌀 the text padded out",  // astral (4-byte)
      "日本語のテキストとasciiの混在したやや長い行です")  // 3-byte chars
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = df.select(col("doc_id"), GramIndex.gramArray(col("text"), k).as("gh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val want = df.select(col("doc_id"), GramIndex.gramArrayComposed(col("text"), k).as("gh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(got === want)
    // property sweep over random alphanumerics too
    (1 to 4).foreach { seed =>
      val cases = sample(Gen.listOfN(20, textGen), 500L + seed)
      val rdf = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val g = rdf.select(col("doc_id"), GramIndex.gramArray(col("text"), k).as("gh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
      val e = rdf.select(col("doc_id"), GramIndex.gramArrayComposed(col("text"), k).as("gh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
      assert(g === e, s"seed=$seed")
    }
  }

  test("refresh: a NULL op upserts (documented contract), 'd' deletes") {
    import spark.implicits._
    val index = Seq((1L, 5, Seq(11L)), (2L, 5, Seq(22L)), (3L, 5, Seq(33L)))
      .toDF("doc_id", "len", "gh") // len is INT — documentsGramArrays' length() type
    val changes = Seq(
      (1L, null.asInstanceOf[String], "abc"), // null op => upsert, NOT delete
      (2L, "d", null.asInstanceOf[String])).toDF("doc_id", "op", "text")
    val out = GramIndex.refresh(index, changes, k)
      .select(col("doc_id")).as[Long].collect().sorted
    assert(out === Array(1L, 3L)) // 1 re-hashed, 2 deleted, 3 untouched
    val doc1 = GramIndex.refresh(index, changes, k)
      .filter(col("doc_id") === 1L).select(col("len")).head().getInt(0)
    assert(doc1 === 3) // proves doc 1 took the NEW text, not the old row
  }

  test("build reaps stale siblings: same-corpus old fingerprints and legacy names") {
    import java.nio.file.{Files, Paths}
    GramIndex.documentsGramArrays(spark, sfSmoke, k) // ensure current entry exists
    val root = Paths.get("target/gramidx")
    // THIS corpus's entry, by name — the dir accumulates entries for
    // every corpus the session touched, so "any 2-dash entry" is wrong
    val current = Paths.get(GramIndex.indexPath(sfSmoke, k)).getFileName.toString
    val tok = current.split("-")(0)
    val staleSame = root.resolve(s"$tok-abc123-k$k") // same corpus, old fingerprint
    val legacy = root.resolve(s"deadbeefdeadbeef-k$k") // pre-dir-token format
    val otherCorpus = root.resolve(s"ffff000011112222-abc123-k$k") // different dir token
    Seq(staleSame, legacy, otherCorpus).foreach(Files.createDirectories(_))
    // force a rebuild so the reaper runs
    graft.Fs.deleteRecursively(root.resolve(current))
    GramIndex.documentsGramArrays(spark, sfSmoke, k)
    assert(Files.exists(root.resolve(current)), "current index must land again")
    assert(!Files.exists(staleSame), "stale same-corpus fingerprint must be reaped")
    assert(!Files.exists(legacy), "legacy-format entry must be reaped")
    assert(Files.exists(otherCorpus), "another corpus's entry must survive")
    graft.Fs.deleteRecursively(otherCorpus)
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
