package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class LlmSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup collapses identical content") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("id", "text")
    val out = Dedup.exact(df, col("text"), col("id"))
      .select("keep_id", "n_copies").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(out.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("normalizedExact merges case / punctuation / whitespace variants; distinct content survives") {
    val df = Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),
      (3L, "HELLO\tworld..."),
      (4L, "hello worlds")).toDF("id", "text")
    val out = Dedup.normalizedExact(df, col("text"), col("id"))
      .select("keep_id", "n_copies").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(out.toSeq == Seq((1L, 3L), (4L, 1L)))
    // the key itself: stripped, collapsed, trimmed
    val key = Seq("  A  b!,C  ").toDF("t")
      .select(Dedup.normalizeText(col("t"))).head().getString(0)
    assert(key == "a bc")
  }

  test("shingles produce distinct n-grams") {
    val out = Seq("abcab").toDF("t")
      .select(Dedup.shingles(col("t"), 3).as("s")).head().getSeq[String](0)
    assert(out.toSet == Set("abc", "bca", "cab"))
  }

  test("minhash signatures: identical docs agree, different docs differ") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
                   (2L, "the quick brown fox jumps over the lazy dog"),
                   (3L, "completely unrelated content about spark engines")).toDF("id", "text")
    val sig = Dedup.minhashSignature(
      docs.withColumn("sh", Dedup.shingles(col("text"), 4)), col("id"), col("sh"), k = 8)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("minhashSignatureText (position-explode fast path) equals the array path exactly") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
                   (2L, "the quick brown fox leaps over the lazy dog"),
                   (3L, "ab"), // shorter than n → single clamped shingle
                   (4L, "aaaaaaaaaaaa")).toDF("id", "text") // repeated shingles
    val viaArrays = Dedup.minhashSignature(
      docs.withColumn("sh", Dedup.shingles(col("text"), 4)), col("id"), col("sh"), k = 8)
      .orderBy("doc_id").collect().toSeq
    val viaText = Dedup.minhashSignatureText(docs, col("id"), col("text"), n = 4, k = 8)
      .orderBy("doc_id").collect().toSeq
    assert(viaText == viaArrays)
  }

  test("lsh candidate pairs find the near-duplicate") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog today"),
                   (2L, "the quick brown fox jumps over the lazy dog tonight"),
                   (3L, "completely unrelated content about spark engines and shuffles")).toDF("id", "text")
    val sig = Dedup.minhashSignature(
      docs.withColumn("sh", Dedup.shingles(col("text"), 4)), col("id"), col("sh"), k = 12)
    val pairs = Dedup.candidatePairs(Dedup.lshBuckets(sig, k = 12, rowsPerBand = 2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("cosine of a vector with itself is 1") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val c = df.select(Similarity.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
    val ce = df.select(Similarity.cosineExact(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(ce - 1.0) < 1e-9)
  }

  test("bruteForceTopK ranks the nearest vector first") {
    val corpus = Seq((10L, Seq(1.0f, 0.0f)), (11L, Seq(0.9f, 0.1f)), (12L, Seq(0.0f, 1.0f)))
      .toDF("cid", "cv")
    val queries = Seq((1L, Seq(1.0f, 0.0f))).toDF("qid", "qv")
    val top = Similarity.bruteForceTopK(corpus, "cid", "cv", queries, "qid", "qv", 2)
      .orderBy("rank").collect()
    assert(top(0).getAs[Long]("cid") == 10L)
    assert(top(1).getAs[Long]("cid") == 11L)
  }

  test("text analysis basics") {
    val df = Seq("The quick brown fox, and the lazy dog!").toDF("t")
    val r = df.select(
      TextAnalysis.tokenCount(col("t")).as("n"),
      TextAnalysis.punctRatio(col("t")).as("p"),
      TextAnalysis.stopwordRatio(col("t")).as("s")).head()
    assert(r.getAs[Int]("n") == 8)
    assert(r.getAs[Double]("p") > 0.0 && r.getAs[Double]("p") < 0.2)
    assert(r.getAs[Double]("s") > 0.2) // "The", "and", "the"
  }

  test("tfidfKeywords: scalar score prefers the rarer lower-tf term where (tf,df) rank cannot") {
    // "common" appears twice in doc 1 but in EVERY doc (idf odds ≈ 1/7);
    // "rare" appears once and only here (idf odds = 5/3). Score-ranked
    // tf·idf puts "rare" first; topTerms' lexicographic (tf desc, ...)
    // would put "common" first — the exact behavioral split the scalar
    // operator exists for.
    val docs = Seq(
      (1L, "common common rare"),
      (2L, "common filler2 x2"),
      (3L, "common filler3 x3")).toDF("doc_id", "text")
    val kw = TextAnalysis.tfidfKeywords(docs, col("doc_id"), col("text"), k = 2)
      .filter(col("doc_id") === 1L).orderBy("rank").collect()
    assert(kw.map(_.getAs[String]("term")).toSeq == Seq("rare", "common"))
    val top = TextAnalysis.topTerms(docs, col("doc_id"), col("text"), k = 1)
      .filter(col("doc_id") === 1L).head().getAs[String]("term")
    assert(top == "common") // the lexicographic rank really does differ
    // quantization contract: the integer score is floor(tf·odds·1e6)
    val rare = kw.head
    assert(rare.getAs[Long]("score_q") ==
      math.floor(1.0 * ((3 - 1 + 0.5) / (1 + 0.5)) * 1e6).toLong)
    assert(rare.getAs[Long]("tf") == 1L && rare.getAs[Long]("doc_freq") == 1L)
  }

  test("image dHash: identical PNGs collide, the localized edit moves few bits, corrupt bytes yield null") {
    val a = Multimodal.fixturePng(42L)
    val aTwin = Multimodal.fixturePng(100042L) // inverted from x >= 20
    assert(Multimodal.dhash64(a) == Multimodal.dhash64(Multimodal.fixturePng(42L)))
    val (ha, ht) = (Multimodal.dhash64(a).get, Multimodal.dhash64(aTwin).get)
    val hamming = java.lang.Long.bitCount(ha ^ ht)
    // the edit only touches the lattice's last column → ≤ 8 of 64 bits
    assert(hamming > 0 && hamming <= 8, s"hamming $hamming")
    // a DIFFERENT image is far away in dHash space
    val hb = Multimodal.dhash64(Multimodal.fixturePng(43L)).get
    assert(java.lang.Long.bitCount(ha ^ hb) > 8)
    assert(Multimodal.dhash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.dhash64(null).isEmpty)
    // the frame surfaces null for corrupt rows instead of failing the scan
    val df = Seq((1L, a), (2L, Array[Byte](9, 9))).toDF("doc_id", "media")
    val out = Multimodal.imageDHash(df, col("doc_id"), col("media"))
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == ha && out(1).isNullAt(1))
  }

  test("lengthBucketedBatches: batches fill in rank order; padding waste is max·n − Σ") {
    // bin width 10: docs at 5,7,9 (bin 0) and 12,18 (bin 1); batch size 2
    val d = Seq((1L, 5L), (2L, 7L), (3L, 9L), (4L, 12L), (5L, 18L))
      .toDF("doc_id", "n_tokens")
    val t = new graft.operators.Materialize.Tracker
    val out = try {
      Packing.lengthBucketedBatches(d.repartition(3), col("doc_id"), col("n_tokens"),
          binWidth = 10L, batchSize = 2, tracker = Some(t), numPartitions = Some(2))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).sorted.toSeq
    } finally t.releaseAll()
    assert(out == Seq(
      (0L, 0L, 2L, 7L, 12L, 2L),   // docs 5,7 → pad to 7: waste 2
      (0L, 1L, 1L, 9L, 9L, 0L),    // doc 9 alone: no waste
      (1L, 0L, 2L, 18L, 30L, 6L))) // docs 12,18 → pad to 18: waste 6
  }

  test("audioEnvelopeQ: real WAV parse with integer-exact envelope; corrupt bytes yield None") {
    val wav = Multimodal.fixtureWav(7L)
    val (sr, ch, durUs, env) = Multimodal.audioEnvelopeQ(wav, 8).get
    assert(sr == 8000f && ch == 1 && durUs == 250000L && env.length == 8)
    // replay the generation formula: window 0 = samples 0..249
    val want0 = (0 until 250).map(i =>
      math.abs((7L * 7919 + i * 104729L) % 65536L - 32768L)).sum * 1000000L / (250L * 32768L)
    assert(env(0) == want0)
    // decode determinism: same bytes, same envelope
    assert(Multimodal.audioEnvelopeQ(Multimodal.fixtureWav(7L), 8).get._4.toSeq == env.toSeq)
    assert(Multimodal.audioEnvelopeQ(Array[Byte](1, 2, 3), 8).isEmpty)
    assert(Multimodal.audioEnvelopeQ(null, 8).isEmpty)
  }

  test("dhashNearDupPairs: pigeonhole exactness below the band count; verify gates beyond") {
    // base hash, a 3-bit-away neighbor spread across 3 DIFFERENT bands
    // (pigeonhole: 3 flips cannot touch all 4 bands → MUST be found),
    // and a far hash
    val base = 0x0123456789ABCDEFL
    val near3 = base ^ (1L << 2) ^ (1L << 20) ^ (1L << 40)
    val far = ~base
    val df = Seq((1L, base), (2L, near3), (3L, far)).toDF("doc_id", "dhash")
    val out = Dedup.dhashNearDupPairs(df, col("dhash"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out == Seq((1L, 2L, 3)))
    // null hashes (undecodable media) drop out instead of joining
    val withNull = Seq((1L, Some(base)), (2L, Some(base)), (9L, None))
      .toDF("doc_id", "dhash")
    val dup = Dedup.dhashNearDupPairs(withNull, col("dhash"), maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(dup == Seq((1L, 2L, 0)))
  }

  test("rougeRecall clips by count: a repeated reference bigram needs repeated candidate occurrences") {
    // ref 10 = "a b a b" → bigrams {a b:2, b a:1}, total 3
    val ref = Seq((10L, "a b a b")).toDF("rid", "rtext")
    val cand = Seq(
      (1L, "a b a b"),          // identical: overlap 3 → recall 1.0
      (2L, "a b x y"),          // "a b" ONCE: min(1,2)=1 → recall 1/3
      (3L, "x a b a b y a b"),  // a b:3(clipped 2) + b a:2(clipped 1) → 3/3
      (4L, "zz qq")).toDF("cid", "ctext")
    val out = Dedup.rougeRecall(cand, col("cid"), col("ctext"),
        ref, col("rid"), col("rtext"), n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    assert(out == Seq((1L, 3L, 1000000L), (2L, 1L, 333333L), (3L, 3L, 1000000L)))
    // doc 4 shares no bigram — the implicit pair never materializes
    assert(!out.exists(_._1 == 4L))
    // the distinct-set containment would score doc 2 at 1/2 (1 of 2
    // distinct grams) — the count-clipping is the metric difference
    assert(out.find(_._1 == 2L).get._3 == 333333L)
  }

  test("tokenBudgetSelect: best-first until the token budget; straddling tie-groups drop whole") {
    val docs = Seq(
      (1L, 900L, 10L),  // best: cum 10
      (2L, 800L, 10L),  // cum 20
      (3L, 700L, 10L),  // tie group {3,4}: cum 40 — straddles a 35 budget
      (4L, 700L, 10L),
      (5L, 600L, 10L)   // cum 50: past budget even alone
    ).toDF("doc_id", "score_q", "n_tokens")
    val kept = Curation.tokenBudgetSelect(docs, col("doc_id"), col("score_q"),
        col("n_tokens"), budgetTokens = 35L, bucketWidth = 64L)
      .orderBy("doc_id").collect()
    // {3,4} share one running total (40 > 35) → excluded WHOLE; 5 follows
    assert(kept.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    assert(kept.map(_.getAs[Long]("cum_tokens")).toSeq == Seq(10L, 20L))
    // raising the budget to the tie-group's total admits both members
    val kept2 = Curation.tokenBudgetSelect(docs, col("doc_id"), col("score_q"),
        col("n_tokens"), budgetTokens = 40L, bucketWidth = 64L)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(kept2 == Seq(1L, 2L, 3L, 4L))
  }

  test("levenshteinVerify: exact distances within threshold, early-abandon beyond, cap bounds the window") {
    val docs = Seq(
      (1L, "abcdefgh"), (2L, "abXdefgh"),       // distance 1
      (3L, "totally different words here"),     // far from 1/2
      (4L, "abcdefgh")).toDF("doc_id", "text")  // exact dup of 1
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.levenshteinVerify(pairs, docs, col("doc_id"), col("text"),
        capChars = 100, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    // (1,3) is past maxDist → early-abandoned (-1) and filtered out
    assert(out == Seq((1L, 2L, 1), (1L, 4L, 0)))
    // the cap truncates BOTH sides: differences past it are invisible
    val capped = Dedup.levenshteinVerify(
        Seq((1L, 2L)).toDF("id_a", "id_b"),
        Seq((1L, "same prefix THEN DIFFERENT"), (2L, "same prefix BUT OTHER TAIL"))
          .toDF("doc_id", "text"),
        col("doc_id"), col("text"), capChars = 11, maxDist = 5)
      .head().getAs[Int]("edit_dist")
    assert(capped == 0)
  }

  test("gopher rules: bullets, ellipses, symbols, alpha words, stopword floor all gate") {
    val t = TextAnalysis
    val prose = "The results have improved with the new method and that is good news to share.\n" +
      "We report them here in detail."
    val bullety = "- one\n- two\n- three\n* four"                 // 100% bullet lines
    val trailing = "teaser one...\nteaser two...\nteaser three..." // 100% ellipsis ends
    val symbolic = "## ### #tag " + Seq.fill(4)("#").mkString(" ") // symbols, few words
    val numeric = "12 34 56 78 90 11 22 33 44 55"                  // no alpha words
    val df = Seq((1L, prose), (2L, bullety), (3L, trailing), (4L, symbolic), (5L, numeric))
      .toDF("id", "t")
    val r = df.select(col("id"),
        t.tokenCount(col("t")).cast("long").as("n"),
        t.meanTokenLen(col("t")).as("len"),
        t.symbolWordRatio(col("t")).as("sym"),
        t.bulletLineFrac(col("t")).as("bul"),
        t.ellipsisLineFrac(col("t")).as("ell"),
        t.alphaWordFrac(col("t")).as("alpha"),
        t.gopherStopwordHits(col("t")).cast("long").as("stop"))
      .withColumn("pass", t.gopherPass(col("n"), col("len"), col("sym"), col("bul"),
        col("ell"), col("alpha"), col("stop"), minWords = 5, minStopHits = 2))
      .orderBy("id").collect()
    assert(r(0).getAs[Boolean]("pass"), r(0).toString) // prose passes
    assert(r(0).getAs[Long]("stop") >= 4)              // the/have/with/and/that/to
    assert(r(1).getAs[Double]("bul") == 1.0 && !r(1).getAs[Boolean]("pass"))
    assert(r(2).getAs[Double]("ell") == 1.0 && !r(2).getAs[Boolean]("pass"))
    assert(r(3).getAs[Double]("sym") > 0.5 && !r(3).getAs[Boolean]("pass"))
    assert(r(4).getAs[Double]("alpha") == 0.0 && !r(4).getAs[Boolean]("pass"))
  }

  test("c4 line cleaning: terminal punctuation, word floor, boilerplate markers") {
    val doc = Seq(
      "This sentence survives the filter just fine.",
      "short one.",                                   // < 3 words
      "no terminal punctuation here",                 // no . ! ? "
      "Please enable JavaScript to continue reading.", // marker
      "if (x) { return y; }",                         // brace
      "A second keeper line stays in!").mkString("\n")
    val df = Seq((1L, doc)).toDF("id", "t")
    val (nl, nk) = TextAnalysis.c4LineCounts(col("t"))
    val r = df.select(nl.as("n_lines"), nk.as("n_kept"),
      TextAnalysis.c4CleanText(col("t")).as("clean")).head()
    assert(r.getAs[Int]("n_lines") == 6)
    assert(r.getAs[Int]("n_kept") == 2)
    assert(r.getAs[String]("clean") ==
      "This sentence survives the filter just fine.\nA second keeper line stays in!")
  }

  test("budgeted mix: budgets are reached not undershot, zero budget excludes") {
    val docs = (1L to 100L).map(i => (i, if (i <= 50) "a" else "b", 10L))
      .toDF("id", "src", "n")
    val mixed = Sampling.budgetedMix(docs, col("id"), col("src"), col("n"),
      budgets = Map("b" -> 0L), defaultBudget = 95L)
    val bySrc = mixed.groupBy("src").agg(
        org.apache.spark.sql.functions.sum("n").as("tok"),
        org.apache.spark.sql.functions.count(lit(1)).as("docs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!bySrc.contains("b"))           // zero budget: excluded
    assert(bySrc("a") == (100L, 10L))      // 95-token budget → 10 docs (straddler kept)
    // deterministic: identical selection on re-run
    val again = Sampling.budgetedMix(docs, col("id"), col("src"), col("n"),
      budgets = Map("b" -> 0L), defaultBudget = 95L)
    assert(mixed.exceptAll(again).isEmpty && again.exceptAll(mixed).isEmpty)
  }

  test("budgeted mix: one dominant source spreads its sort over many shards, result unchanged") {
    import org.apache.spark.sql.expressions.Window
    // 2000 docs, ALL one source — the single-window shape would sort them in ONE task
    val docs = (1L to 2000L).map(i => (i, "web", 7L)).toDF("id", "src", "n")
    val mixed = Sampling.budgetedMix(docs, col("id"), col("src"), col("n"),
      budgets = Map.empty, defaultBudget = 4900L, nShards = 8)

    // reference = the global single-window formulation (what we replaced)
    val wRef = Window.partitionBy(col("src"))
      .orderBy(Sampling.unitInterval(col("id"), "mix"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = docs.withColumn("cb", sum(col("n")).over(wRef) - col("n"))
      .filter(col("cb") < 4900L).drop("cb")
    assert(mixed.exceptAll(ref).isEmpty && ref.exceptAll(mixed).isEmpty)

    // the heavy window partitions by (src, __shard): >1 distinct key for one source
    val plan = mixed.queryExecution.executedPlan.toString
    assert(plan.contains("__shard"), "heavy window must partition by the unit-interval shard")
    val shardCount = docs
      .withColumn("u", Sampling.unitInterval(col("id"), "mix"))
      .select(least(floor(col("u") * 8), lit(7L)).as("s"))
      .distinct().count()
    assert(shardCount > 1, s"dominant source must span >1 shard, got $shardCount")
  }

  test("connected components: chains collapse to one cluster, islands stay apart") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (7L, 9L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L) // chain 1-2-3
    assert(comp(5L) == 5L && comp(6L) == 5L)                   // island
    assert(comp(7L) == 7L && comp(8L) == 7L && comp(9L) == 7L) // joined via 9
  }

  test("connected components: reliable checkpointDir variant matches; non-convergence throws") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (7L, 9L)).toDF("id_a", "id_b")
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val reliable = Dedup.connectedComponents(pairs, checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
                           7L -> 7L, 8L -> 7L, 9L -> 7L))
    // a 6-deep chain cannot finish in 3 supersteps: partial labels must
    // THROW, not silently split the component into several cluster ids
    val chain = (1L to 6L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 3).collect()
    }
  }

  test("corpus report: per-source volume, language mix, dup rate, mean quality in one pass") {
    val docs = Seq(
      (1L, "alpha beta gamma", "en", "s1"),
      (2L, "alpha beta gamma", "en", "s1"), // exact dup of 1
      (3L, "uno dos", "es", "s1"),
      (4L, "eins zwei drei vier", "de", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val rows = CorpusReport.bySource(docs, col("text"), col("source"), col("lang"))
      .orderBy("source").collect()
    val s1 = rows(0)
    assert(s1.getAs[Long]("n_docs") == 3 && s1.getAs[Long]("n_tokens") == 8)
    assert(s1.getAs[Long]("n_lang") == 2) // two English docs
    assert(s1.getAs[Double]("dup_rate") == 1.0 / 3.0) // one of three is a dup
    assert(s1.getAs[Double]("avg_doc_tokens") == 8.0 / 3.0)
    val s2 = rows(1)
    assert(s2.getAs[Long]("n_docs") == 1 && s2.getAs[Double]("dup_rate") == 0.0)
  }

  test("bestPerCluster keeps the highest-scoring member; ties break on lower id") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster_id")
    val scores = Seq((1L, 0.2), (2L, 0.9), (3L, 0.9), (5L, 0.4), (6L, 0.1))
      .toDF("id", "s")
    val reps = Dedup.bestPerCluster(clusters, scores, col("id"), col("s"))
      .orderBy("cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // cluster 1: 2 and 3 tie at 0.9 → lower id 2 wins (NOT min-id 1)
    assert(reps == Seq((1L, 2L, 0.9), (5L, 5L, 0.4)))
  }

  test("contamination: copied eval doc flags against its source; clean doc scores low") {
    val train = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
      (2L, "kilo lima mike november oscar papa quebec romeo sierra tango")).toDF("id", "text")
    val evalSet = Seq(
      (10L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"), // copy of 1
      (11L, "uniform victor whiskey xray yankee zulu one two three four"))     // clean
      .toDF("id", "text")
    val out = Dedup.contamination(
        train.withColumn("sh", Dedup.shingles(col("text"), 5)), col("id"), col("sh"),
        evalSet.withColumn("sh", Dedup.shingles(col("text"), 5)), col("id"), col("sh"),
        maxDf = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(10L)._1 == 1L && out(10L)._2 == 1.0) // exact copy → source, overlap 1
    // the clean doc either shares nothing (absent) or scores well below threshold
    assert(out.get(11L).forall(_._2 < 0.5), s"clean doc scored ${out.get(11L)}")
  }

  test("sequence packing: per-shard offsets are contiguous, packs respect the budget") {
    val docs = (1L to 200L).map(i => (i, 100L + (i % 7) * 10)).toDF("id", "n")
    val packed = Packing.packBudgeted(docs, col("id"), col("n"), seqLen = 512, nShards = 4)
      .orderBy("shard", "id").collect()
    packed.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      var expectedOffset = 0L
      rows.foreach { r =>
        assert(r.getAs[Long]("offset") == expectedOffset) // contiguous, no gaps
        assert(r.getAs[Long]("pack_id") == expectedOffset / 512)
        expectedOffset += r.getAs[Long]("n")
      }
    }
    // the manifest covers every document exactly once
    val m = Packing.packManifest(
      Packing.packBudgeted(docs, col("id"), col("n"), 512, 4), col("n"))
      .agg(org.apache.spark.sql.functions.sum("n_docs")).head().getLong(0)
    assert(m == 200L)
  }

  test("hash split is disjoint, exhaustive, deterministic; stratified rates hold") {
    val ids = (1L to 10000L).map(i => (i, if (i % 3 == 0) "en" else "de")).toDF("id", "lang")
    val split = Sampling.hashSplit(ids, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 10000L) // exhaustive
    assert(math.abs(counts("train") - 8000L) < 400, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 1000L) < 200 && math.abs(counts("test") - 1000L) < 200)
    // deterministic: a re-run assigns identical splits
    val again = Sampling.hashSplit(ids, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.exceptAll(again).isEmpty && again.exceptAll(split).isEmpty)

    val sampled = Sampling.stratifiedSample(ids, col("id"), col("lang"),
      rates = Map("en" -> 0.25), defaultRate = 1.0)
    val byLang = sampled.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("de") == 6667L) // default rate 1.0 keeps everything
    assert(math.abs(byLang("en") - 833L) < 150, s"en=${byLang("en")}")
  }

  test("KMV sketch: exact under k, ~1/sqrt(k) accurate above it") {
    val small = (1 to 100).map(i => s"v$i").toDF("v")
    val r1 = Sketches.kmvDistinct(small, col("v"), k = 256).head()
    assert(r1.getLong(0) == 100 && r1.getDouble(1) == 100.0) // n < k → exact
    val big = (1 to 20000).map(i => s"item-$i").toDF("v")
    val r2 = Sketches.kmvDistinct(big, col("v"), k = 256).head()
    assert(r2.getLong(0) == 20000)
    val est = r2.getDouble(1)
    assert(math.abs(est - 20000) / 20000.0 < 0.2, s"estimate $est too far from 20000")
  }

  test("kmvOverlap: exact below k; estimator path matches the JVM-replayed order statistics") {
    import graft.functions.Portable
    def ref(a: Seq[String], b: Seq[String], k: Int) = {
      val ha = a.map(Portable.hash64Jvm).distinct.sorted.take(k)
      val hb = b.map(Portable.hash64Jvm).distinct.sorted.take(k)
      val u = (ha ++ hb).distinct.sorted.take(k)
      val dU = if (u.size < k) u.size.toDouble
               else (k - 1).toDouble * Sketches.HashSpace / u.last.toDouble
      val nBoth = u.count(h => ha.contains(h) && hb.contains(h))
      val j = nBoth.toDouble / u.size.toDouble
      (u.size.toLong, dU, j, j * dU)
    }
    val va = (1 to 40).map(i => s"val$i")
    val vb = (21 to 60).map(i => s"val$i") // 20 shared, union 60
    val df = (va.map(("a", _)) ++ vb.map(("b", _))).toDF("g", "v")
    // exact path: union distinct (60) < k → every estimate is the truth
    val exact = Sketches.kmvOverlap(df, col("g"), col("v"), k = 256).head()
    assert((exact.getString(0), exact.getString(1)) == ("a", "b"))
    assert(exact.getLong(2) == 60L && exact.getDouble(3) == 60.0)
    assert(exact.getDouble(4) == 20.0 / 60.0)
    assert(exact.getDouble(5) == (20.0 / 60.0) * 60.0)
    // estimator path: k=8 < per-group distincts — bit-identical to the
    // reference replay of the same order statistics
    val est = Sketches.kmvOverlap(df, col("g"), col("v"), k = 8).head()
    val (ku, du, j, ix) = ref(va, vb, 8)
    assert(est.getLong(2) == ku && est.getDouble(3) == du)
    assert(est.getDouble(4) == j && est.getDouble(5) == ix)
    // three groups → all ordered pairs, a < b
    val tri = df.unionByName(Seq(("c", "val1"), ("c", "zzz")).toDF("g", "v"))
    val pairs = Sketches.kmvOverlap(tri, col("g"), col("v"), k = 16)
      .select("source_a", "source_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("exactQuantilesPerGroup: percentile_disc semantics, exact across partitions") {
    val df = ((1 to 10).map(v => ("a", v.toDouble, v.toLong)) ++
              (1 to 3).map(v => ("b", v.toDouble * 10, v.toLong))).toDF("g", "v", "id")
    val out = Sketches.exactQuantilesPerGroup(df.repartition(5),
        col("g"), col("v"), col("id"),
        Seq("p50" -> 0.5, "pmax" -> 1.0), numPartitions = Some(3))
      .collect().map(r => (r.getString(0), r.getString(2)) -> r.getDouble(3)).toMap
    // a: n=10 → p50 at rank 5 = 5.0, pmax at rank 10; b: n=3 → p50 at rank ceil(1.5)=2
    assert(out == Map(("a", "p50") -> 5.0, ("a", "pmax") -> 10.0,
                      ("b", "p50") -> 20.0, ("b", "pmax") -> 30.0), s"got $out")
  }

  test("exactQuantilesContPerGroup: interpolated percentile_cont, exact across partitions") {
    val df = ((1 to 10).map(v => ("a", v.toDouble, v.toLong)) ++
              (1 to 3).map(v => ("b", v.toDouble * 10, v.toLong))).toDF("g", "v", "id")
    val out = Sketches.exactQuantilesContPerGroup(df.repartition(5),
        col("g"), col("v"), col("id"),
        Seq("p25" -> 0.25, "p50" -> 0.5, "p100" -> 1.0), numPartitions = Some(3))
      .collect().map(r => (r.getString(0), r.getString(2)) -> r.getDouble(3)).toMap
    // a: n=10 → p = q·9: p25 at 2.25 → 3 + 0.25·(4−3) = 3.25; p50 at 4.5 → 5.5
    // b: n=3 → p25 at 0.5 → 15.0; p50 at exactly 1 (frac 0) → 20.0
    assert(out == Map(("a", "p25") -> 3.25, ("a", "p50") -> 5.5, ("a", "p100") -> 10.0,
                      ("b", "p25") -> 15.0, ("b", "p50") -> 20.0, ("b", "p100") -> 30.0),
      s"got $out")
    // a Scala reference over a randomized multi-partition frame
    val rnd = new scala.util.Random(7)
    val vals = Vector.fill(101)(rnd.nextInt(1000).toDouble)
    val rdf = vals.zipWithIndex.map { case (v, i) => ("g", v, i.toLong) }.toDF("g", "v", "id")
    val got = Sketches.exactQuantilesContPerGroup(rdf.repartition(7),
        col("g"), col("v"), col("id"), Seq("q" -> 0.37), numPartitions = Some(4))
      .head().getDouble(3)
    val sorted = vals.sorted
    val p = 0.37 * (vals.size - 1)
    val (lo, frac) = (math.floor(p).toInt, p - math.floor(p))
    val want = sorted(lo) + (sorted(math.min(lo + 1, vals.size - 1)) - sorted(lo)) * frac
    assert(got == want, s"got $got want $want")
  }

  test("kmvOverlap randomized sweep: every pair matches the JVM-replayed reference") {
    import graft.functions.Portable
    val rnd = new scala.util.Random(20260814L)
    (1 to 4).foreach { trial =>
      val k = Seq(4, 8, 16, 64)(trial - 1)
      val universe = (1 to 300).map(i => s"u$i")
      val groups = ('a' to 'd').map { g =>
        g.toString -> rnd.shuffle(universe).take(30 + rnd.nextInt(150)).toVector
      }
      val df = groups.flatMap { case (g, vs) =>
        // duplicates in the input must not skew the sketch
        (vs ++ vs.take(10)).map((g, _))
      }.toDF("g", "v")
      val got = Sketches.kmvOverlap(df, col("g"), col("v"), k = k)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
      val byG = groups.toMap
      for (a <- byG.keys; b <- byG.keys if a < b) {
        val ha = byG(a).map(Portable.hash64Jvm).distinct.sorted.take(k)
        val hb = byG(b).map(Portable.hash64Jvm).distinct.sorted.take(k)
        val u = (ha ++ hb).distinct.sorted.take(k)
        val dU = if (u.size < k) u.size.toDouble
                 else (k - 1).toDouble * Sketches.HashSpace / u.last.toDouble
        val j = u.count(h => ha.contains(h) && hb.contains(h)).toDouble / u.size.toDouble
        assert(got((a, b)) == ((u.size.toLong, dU, j, j * dU)),
          s"trial $trial k=$k pair ($a,$b)")
      }
    }
  }

  test("writeTrainingShards: deterministic shard layout and in-shard order across runs and partitionings") {
    import graft.functions.Portable
    val docs = (1L to 200L).map(i => (i, s"text $i")).toDF("id", "text")
    val d1 = java.nio.file.Files.createTempDirectory("graft-shards1").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft-shards2").toString
    Packing.writeTrainingShards(docs.repartition(3), col("id"), d1, nShards = 4)
    Packing.writeTrainingShards(docs.repartition(11), col("id"), d2, nShards = 4)
    def readOrder(dir: String, s: Long) =
      spark.read.parquet(dir).filter(col("shard") === s)
        .collect().map(_.getAs[Long]("id")).toSeq
    (0L until 4L).foreach { sh =>
      val o1 = readOrder(d1, sh)
      assert(o1 == readOrder(d2, sh), s"shard $sh differs across partitionings")
      // in-shard order is the (order-hash, id) sort
      val expect = o1.sortBy(i => (Portable.hash64Jvm(s"order:$i"), i))
      assert(o1 == expect, s"shard $sh not in order-hash order")
      // membership is the shard-hash assignment
      assert(o1.forall(i => Portable.hash64Jvm(s"shard:$i") % 4 == sh))
    }
    assert((0L until 4L).map(readOrder(d1, _).size).sum == 200)
  }

  test("chat template renders role blocks; boundary masks everything before the final assistant turn") {
    val msgs = array(
      struct(lit("user").as("role"), lit("hi").as("content")),
      struct(lit("assistant").as("role"), lit("hello!").as("content")))
    val row = spark.range(1).select(
      Sft.renderChatTemplate(msgs).as("r"), Sft.promptBoundaryChars(msgs).as("b")).head()
    assert(row.getString(0) == "<|user|>\nhi<|end|>\n<|assistant|>\nhello!<|end|>\n")
    assert(row.getInt(1) == "<|user|>\nhi<|end|>\n".length)
    // a conversation not ending in an assistant turn is all prompt
    val solo = array(struct(lit("user").as("role"), lit("hi").as("content")))
    val row2 = spark.range(1).select(Sft.renderChatTemplate(solo).as("r"),
      Sft.promptBoundaryChars(solo).as("b")).head()
    assert(row2.getInt(1) == row2.getString(0).length)
    // empty conversation: renders "", boundary 0 — element_at(_, 0)
    // would be a runtime error without the n === 0 arm
    val none = slice(solo, lit(1), lit(0))
    val row3 = spark.range(1).select(Sft.renderChatTemplate(none).as("r"),
      Sft.promptBoundaryChars(none).as("b")).head()
    assert(row3.getString(0) == "" && row3.getInt(1) == 0)
  }

  test("freezeManifest is partitioning-invariant and drift-sensitive") {
    val docs = (1L to 50L).map(i => (i, s"doc number $i content")).toDF("id", "text")
    def manifest(df: org.apache.spark.sql.DataFrame) =
      CorpusReport.freezeManifest(df, col("id"), col("text"), lit(3L), nShards = 4)
        .orderBy(col("shard")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val m1 = manifest(docs.repartition(1))
    val m7 = manifest(docs.repartition(7))
    assert(m1 == m7 && m1.map(_._2).sum == 50L)
    // one changed document flips exactly its shard's fingerprint
    val drifted = docs.withColumn("text",
      when(col("id") === 17L, lit("tampered")).otherwise(col("text")))
    val md = manifest(drifted)
    assert(m1.zip(md).count { case (a, b) => a != b } == 1)
  }

  test("filterFunnel reports isolated fails and cumulative survival from one aggregate") {
    val docs = Seq(
      (1L, "good doc here"),  // passes both
      (2L, "x"),              // fails min2, passes lower
      (3L, "NO LOWER AT ALL") // passes min2, fails lower
    ).toDF("id", "text")
    val row = Curation.filterFunnel(docs, Seq(
      "min2" -> (TextAnalysis.tokenCount(col("text")) >= 2),
      "lower" -> col("text").rlike("[a-z]"))).head()
    val m = row.schema.fieldNames.zip(row.toSeq).toMap
    assert(m("n_docs") == 3L)
    assert(m("fail_min2") == 1L && m("survive_min2") == 2L)
    assert(m("fail_lower") == 1L && m("survive_lower") == 1L)
    // a NULL rule verdict (regex over null text) counts as a FAILURE —
    // the funnel must keep reconciling (fail + pass == n_docs per rule)
    val withNull = docs.unionByName(
      Seq((4L, null.asInstanceOf[String])).toDF("id", "text"))
    val r2 = Curation.filterFunnel(withNull,
      Seq("lower" -> col("text").rlike("[a-z]"))).head()
    val m2 = r2.schema.fieldNames.zip(r2.toSeq).toMap
    assert(m2("n_docs") == 4L)
    assert(m2("fail_lower") == 2L && m2("survive_lower") == 2L)
  }

  test("temperatureMix derives sqrt-scaled budgets: small sources keep more than proportional") {
    val docs = ((1 to 100).map(i => (i.toLong, "big", 10L)) ++
                (101 to 110).map(i => (i.toLong, "small", 10L)))
      .toDF("id", "src", "n_tokens")
    // weights: floor(sqrt(1000))=31, floor(sqrt(100))=10, W=41
    // budgets at total=410: big 410*31/41=310, small 410*10/41=100
    val got = Sampling.temperatureMix(docs, col("id"), col("src"), col("n_tokens"),
        totalTokens = 410L)
      .groupBy(col("src")).agg(count(lit(1)).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // big admits 31 docs (cb of the 32nd = 310, not < 310); small keeps
    // ALL 10 (cb of the last = 90 < 100) — proportional would cap it at 3
    assert(got == Map("big" -> 31L, "small" -> 10L), s"got $got")
    // deterministic: a second run admits the identical ids
    val ids1 = Sampling.temperatureMix(docs, col("id"), col("src"), col("n_tokens"), 410L)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = Sampling.temperatureMix(docs, col("id"), col("src"), col("n_tokens"), 410L)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2 && ids1.length == 41)
  }

  test("perceptronStep learns exact integer weights and converges on separable data") {
    import graft.functions.Portable
    val docs = Seq((1L, "aa bb", 1L), (2L, "cc dd", -1L)).toDF("id", "text", "y")
    val w1 = TextAnalysis.perceptronStep(docs, col("id"), col("text"), col("y"), None)
    val got1 = w1.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    def b(t: String) = Portable.hash64Jvm(t) % 1024L
    // step 1 from zero: score 0 predicts −1 → only the +1 doc updates
    assert(got1 == Map(b("aa") -> 1L, b("bb") -> 1L))
    val w2 = TextAnalysis.perceptronStep(docs, col("id"), col("text"), col("y"), Some(w1))
    val got2 = w2.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // +1 doc scores 2 > 0, −1 doc scores 0 → predicts −1: both correct, fixpoint
    assert(got2 == got1)
    // multi-epoch trainer: the between-epoch driver hop keeps plans
    // O(1) per epoch (lazy chaining doubled the plan every step) and
    // the fixpoint holds through many epochs
    val w8 = TextAnalysis.perceptronTrain(docs, col("id"), col("text"), col("y"),
        epochs = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(w8 == got1)
  }

  test("semanticContamination flags planted copies with their best train match; ties to lower id") {
    val train = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (4L, Seq(1.0f, 0.0f, 0.0f, 0.0f))) // duplicate of 1 → sim tie
      .toDF("vec_id", "embedding")
    val evalSet = Seq(
      (100L, Seq(1.0f, 0.0f, 0.0f, 0.0f)), // copy of train 1/4 → contaminated
      (200L, Seq(0.0f, 0.0f, 1.0f, 0.0f))) // orthogonal → clean
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticContamination(evalSet, "vec_id", "embedding",
        train, "vec_id", "embedding", nCentroids = 3, simThreshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 1)
    val (eid, tid, sim) = out.head
    assert(eid == 100L && tid == 1L) // tie between train 1 and 4 → lower id
    assert(sim > 0.999)
  }

  test("zero-norm embeddings never clear a cosine threshold (NaN guard)") {
    val zero = Seq(0.0f, 0.0f, 0.0f, 0.0f)
    val train = Seq((1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)), (2L, zero))
      .toDF("vec_id", "embedding")
    val evalSet = Seq((100L, zero), (200L, Seq(0.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    // NaN >= threshold is TRUE under Spark's NaN ordering — without the
    // guard, the zero train vector "contaminates" every cellmate and
    // the zero eval vector flags against everything
    val out = Similarity.semanticContamination(evalSet, "vec_id", "embedding",
        train, "vec_id", "embedding", nCentroids = 2, simThreshold = 0.9)
      .collect()
    assert(out.isEmpty, s"zero vectors produced verdicts: ${out.mkString(",")}")
    // semDedup: the zero vector must not drop (or be dropped by) anyone
    val surv = Similarity.semDedup(train, "vec_id", "embedding",
        nCentroids = 2, simThreshold = 0.9)
      .collect().map(_.getLong(0)).sorted
    assert(surv.toSeq == Seq(1L, 2L))
  }

  test("hot-bucket cap drops mega-buckets; pairs from other bands survive") {
    // band 0: a mega-bucket of 10 docs (boilerplate collision) that
    // would contribute 45 pairs; band 1: docs 1,2 share a small bucket
    val mega = (1L to 10L).map(id => (0, 777L, id))
    val small = Seq((1, 42L, 1L), (1, 42L, 2L)) ++ (3L to 10L).map(id => (1, 1000L + id, id))
    val buckets = (mega ++ small).toDF("band", "bucket", "doc_id")

    val uncapped = Dedup.candidatePairs(buckets).count()
    assert(uncapped == 45) // dominated by the mega-bucket
    val capped = Dedup.candidatePairs(buckets, maxBucketSize = Some(5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the mega-bucket is dropped whole; the (1,2) pair survives via band 1
    assert(capped == Set((1L, 2L)))
  }

  test("banded RHP buckets: near-dups pair, bucket occupancy stays bounded") {
    // deterministic pseudo-random 16-dim corpus + a perturbed copy of
    // the first 50 vectors (planted near-dups)
    val rnd = new scala.util.Random(42)
    val base = (0L until 400L).map(i => (i, Seq.fill(16)(rnd.nextFloat() * 2f - 1f)))
    val planted = base.take(50).map { case (i, v) =>
      (i + 100000L, (v.head + 0.005f) +: v.tail) }
    val corpus = (base ++ planted).toDF("vec_id", "embedding")

    val buckets = Similarity.rhpBandedBuckets(corpus, "vec_id", "embedding",
      dims = 16, planesPerBand = 16, bands = 4)
    val pairs = Dedup.candidatePairs(buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // recall: every planted pair shares at least one band bucket
    (0L until 50L).foreach(i => assert(pairs.contains((i, i + 100000L)),
      s"planted pair $i missing"))

    // occupancy: per-band bucket space is 2^16, so random vectors
    // spread out — max bucket size stays O(1) where the old single
    // 8-plane signature (256 buckets for 450 vectors) cannot
    val occ = buckets.groupBy("band", "bucket").count()
      .agg(max("count")).head().getLong(0)
    assert(occ <= 8L, s"banded bucket occupancy $occ — expected bounded")
    val occOld = corpus
      .withColumn("bucket", Similarity.rhpSignature(col("embedding"), dims = 16, planes = 8))
      .groupBy("bucket").count().agg(max("count")).head().getLong(0)
    assert(occOld > occ, s"single-signature occupancy $occOld should exceed banded $occ")
  }

  test("ivfTopK finds the nearest vector through its centroid cell") {
    val vecs = (0L until 40L).map { i =>
      (i, Seq.tabulate(4)(d => (math.sin(i * 0.7 + d) * 0.5).toFloat))
    }
    val corpus = vecs.toDF("cid", "cv")
    val queries = corpus.filter(col("cid") < 2).toDF("qid", "qv")
    val top = Similarity.ivfTopK(corpus, "cid", "cv", queries, "qid", "qv",
      k = 3, nCentroids = 8, nProbe = 8) // nProbe = all cells → exhaustive
    val brute = Similarity.bruteForceTopK(corpus, "cid", "cv", queries, "qid", "qv", k = 3)
    // probing every cell must agree with brute force exactly
    val a = top.orderBy("qid", "rank").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = brute.orderBy("qid", "rank").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
  }

  test("repetition gate drops degenerate docs; PII scrub counts and masks") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"), // 7/8 dup tokens
      (2L, "a perfectly normal sentence with distinct words throughout entirely"),
      (3L, "alpha beta alpha beta alpha beta alpha beta alpha beta")) // 2-gram loop
      .toDF("doc_id", "text")
    val kept = docs.filter(TextAnalysis.repetitionGate(col("text")))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(2L))
    // n-gram construction itself
    val g2 = docs.filter(col("doc_id") === 3)
      .select(TextAnalysis.wordNgrams(col("text"), 2).as("g")).head().getSeq[String](0)
    assert(g2.take(2) == Seq("alpha beta", "beta alpha") && g2.length == 9)

    val pii = Seq(
      (1L, "write to bob.smith+x@example.com or call 212-555-1234 today"),
      (2L, "no contact details here at all"),
      (3L, "card 4111-1111-1111-1111 and id 123-456-7890-X end 555-1234"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Pii.emailCount(col("text")).as("e"),
        Pii.phoneCount(col("text")).as("p"), Pii.mask(col("text")).as("m"),
        Pii.clean(col("text")).as("clean"))
      .orderBy("doc_id").collect()
    assert(pii(0).getInt(1) == 1 && pii(0).getInt(2) == 1 && !pii(0).getBoolean(4))
    assert(pii(0).getString(3) == "write to <EMAIL> or call <PHONE> today")
    assert(pii(1).getInt(1) == 0 && pii(1).getInt(2) == 0 && pii(1).getBoolean(4))
    assert(pii(1).getString(3) == "no contact details here at all")
    // boundary guards: longer digit/hyphen runs are NOT partially
    // masked mid-token; a genuine trailing phone still is
    assert(pii(2).getInt(2) == 1)
    assert(pii(2).getString(3) ==
      "card 4111-1111-1111-1111 and id 123-456-7890-X end <PHONE>")
  }

  test("curateNearDup clusters near-dups; hot-bucket cap bounds mega-bucket pairs") {
    // a 12-doc boilerplate family (identical text → one mega-bucket in
    // EVERY band), one genuine near-dup pair (1,2), five distinct docs
    val boiler = "all rights reserved copyright notice and terms of service apply to every " +
      "page of this site including archived and cached copies thereof"
    val mega = (100L to 111L).map(i => (i, boiler))
    val near1 = (1L, "the quick brown fox jumps over the lazy dog near the quiet river bank " +
      "while the morning sun rises slowly over the distant misty hills today")
    val near2 = (2L, "the quick brown fox jumps over the lazy dog near the quiet river bank " +
      "while the morning sun rises slowly over the distant misty hills now")
    val others = (10L to 14L).map(i => (i,
      s"completely unrelated document number $i with its own distinctive vocabulary " +
      s"and rare tokens zebra$i quasar$i obelisk$i"))
    val docs = (mega ++ Seq(near1, near2) ++ others).toDF("doc_id", "text")
    val cfg = Curation.Config(minTokens = 8, maxPunctRatio = 0.5, keepLangs = Set.empty)

    // uncapped: the mega family collapses to its min-id representative,
    // the near-dup pair keeps doc 1, distinct docs survive
    val kept = Curation.curateNearDup(docs, col("doc_id"), col("text"), cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && !kept.contains(2L))
    assert(kept.intersect((100L to 111L).toSet) == Set(100L))
    assert((10L to 14L).forall(kept.contains))

    // capped at 5: the 12-doc mega-buckets drop WHOLE (bounded pair
    // generation — no s·(s−1)/2 blowup), so the family is left alone;
    // the small (1,2) bucket still pairs and dedups
    val keptCapped = Curation.curateNearDup(docs, col("doc_id"), col("text"), cfg,
        Curation.NearDupConfig(maxBucketSize = Some(5)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptCapped.contains(1L) && !keptCapped.contains(2L))
    assert(keptCapped.intersect((100L to 111L).toSet) == (100L to 111L).toSet)
  }

  test("curation composes gates + dedup and keeps the lowest id per content") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"), // dup of 1
      (3L, "short text"), // fails minTokens
      (4L, "!!! ??? *** ### $$$ %%% ^^^ &&& @@@ ;;; ::: ~~~"), // punct-heavy
      (5L, "der hund und die katze und der vogel und die maus sind hier")) // german
      .toDF("doc_id", "text")
    val out = Curation.curate(docs, col("doc_id"), col("text"),
      Curation.Config(minTokens = 8, maxPunctRatio = 0.3, keepLangs = Set("en")))
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("keyOrdered routes each key to one partition in LSN order") {
    val schema = graft.model.Envelope.recordSchema(
      StructType(Seq(StructField("id", IntegerType))),
      StructType(Seq(StructField("id", IntegerType), StructField("v", StringType))))
    val rows = for (id <- 1 to 10; lsn <- Seq(3L, 1L, 2L)) yield
      Row(s"t.s.x", Row(id), Row("u", null, Row(id, s"v$lsn"),
          Row("pg", "d", "s", "x", lsn * 10 + id, "false", 0L), 0L), Map.empty[String, String])
    val df = spark.createDataFrame(spark.sparkContext.parallelize(scala.util.Random.shuffle(rows), 6), schema)
    val ordered = graft.operators.OrderedDelivery.keyOrdered(df, numPartitions = 4)
    val check = ordered.select(col("key.id"), graft.operators.OrderedDelivery.lsnCol.as("lsn"),
        spark_partition_id().as("pid"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2)))
    // each key lives in exactly one partition
    assert(check.groupBy(_._1).forall { case (_, rs) => rs.map(_._3).distinct.length == 1 })
    // within the collected order (partition-major), each key's lsns ascend
    check.groupBy(_._1).foreach { case (_, rs) =>
      val lsns = rs.map(_._2).toSeq
      assert(lsns == lsns.sorted, s"key out of order: $lsns")
    }
  }

  test("multimodal: frame sampling and decimation slice byte streams deterministically") {
    val df = Seq((1L, "abcdefghij")).toDF("doc_id", "content")
    val media = Multimodal.asMedia(df, "content", "audio/pcm")
    val frames = Multimodal.frameSample(media, "media", frameSize = 4, stride = 3)
      .select(org.apache.spark.sql.functions.explode(col("frames")).as("f"))
      .collect().map(r => new String(r.getAs[Array[Byte]]("f")))
    assert(frames.toSeq == Seq("abcd", "defg", "ghij"))
    val resized = Multimodal.decimate(media, "media", factor = 3)
      .select("media_resized").head().getAs[Array[Byte]](0)
    assert(new String(resized) == "adgj")
  }

  test("multimodal: asMedia wraps bytes + metadata; extractFeatures stays in the plan") {
    val df = Seq((1L, "hello media"), (2L, "other bytes")).toDF("doc_id", "content")
    val media = Multimodal.asMedia(df, "content", "text/plain")
    val meta = media.filter(col("doc_id") === 1L).select("media_meta.*").head()
    assert(meta.getAs[String]("media_type") == "text/plain")
    assert(meta.getAs[Long]("n_bytes") == 11L)

    val feats = Multimodal.extractFeatures(media, "doc_id", dim = 8)
    val rows = feats.orderBy("doc_id").collect()
    assert(rows.length == 2)
    val v1 = rows(0).getAs[scala.collection.Seq[Float]]("features").toList
    assert(v1.length == 8 && v1.forall(f => f >= 0f && f <= 1f))
    // deterministic: same content → same features
    val again = Multimodal.extractFeatures(media, "doc_id", dim = 8)
      .orderBy("doc_id").collect()(0).getAs[scala.collection.Seq[Float]]("features").toList
    assert(v1 == again)
    // no RDD plan break: the physical plan is scan→project, no custom RDD scan node
    assert(!feats.queryExecution.executedPlan.toString.contains("ExistingRDD"))
  }

  test("multimodal: real PNG decodes via javax.imageio into width/height/luminance features") {
    // a REAL 8×4 PNG: left half black, right half white — luminance
    // features are exactly 0.0 / 1.0 at known lattice positions
    val img = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 8; y <- 0 until 4)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val png = bos.toByteArray

    val df = Seq((1L, png), (2L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "media")
    val out = Multimodal.extractImageInfo(df, "doc_id", dim = 16)
      .orderBy("doc_id").collect()

    val p = out(0)
    assert(p.getAs[Int]("width") == 8 && p.getAs[Int]("height") == 4)
    val feats = p.getAs[scala.collection.Seq[Float]]("features")
    assert(feats.length == 16)
    // 4×4 lattice over an 8-wide image: columns 0,1 sample black
    // pixels (x=0,2), columns 2,3 sample white (x=4,6)
    assert(feats.toList == List.tabulate(16)(i => if (i % 4 < 2) 0.0f else 1.0f))

    // non-image bytes: dims null, stub features (pipeline never fails)
    val np = out(1)
    assert(np.isNullAt(np.fieldIndex("width")) && np.isNullAt(np.fieldIndex("height")))
    assert(np.getAs[scala.collection.Seq[Float]]("features").length == 16)

    // the typed dispatch seam: image/* routes through the codec,
    // anything else through the deterministic stub — same bytes
    def typedFeats(mediaType: String): List[Float] = Multimodal.extractFeaturesTyped(
      Multimodal.asMedia(Seq((1L, "x")).toDF("doc_id", "c"), "c", mediaType)
        .withColumn("media", org.apache.spark.sql.functions.lit(png)),
      "doc_id", dim = 16).head().getAs[scala.collection.Seq[Float]]("features").toList
    assert(typedFeats("image/png") == feats.toList)
    assert(typedFeats("text/plain") != feats.toList)
  }

  test("multimodal: real WAV decodes via javax.sound.sampled into rate/channels/duration/envelope features") {
    import javax.sound.sampled._
    // 1 s of 16-bit mono PCM at 8 kHz: first half silence, second half
    // a full-scale square wave — envelope features are exactly 0 / ~1
    val n = 8000
    val pcm = new Array[Byte](n * 2)
    for (i <- n / 2 until n) {
      val v = if (i % 2 == 0) 32767 else -32767
      pcm(2 * i) = (v & 0xff).toByte; pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n),
      AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    val df = Seq((1L, wav), (2L, "not audio".getBytes("UTF-8"))).toDF("doc_id", "media")
    val out = Multimodal.extractAudioInfo(df, "doc_id", dim = 4).orderBy("doc_id").collect()
    val a = out(0)
    assert(a.getAs[Float]("sample_rate") == 8000f)
    assert(a.getAs[Int]("channels") == 1)
    assert(a.getAs[Long]("duration_us") == 1000000L)
    val feats = a.getAs[scala.collection.Seq[Float]]("features")
    assert(feats.length == 4)
    assert(feats(0) == 0f && feats(1) == 0f, feats)
    assert(feats(2) > 0.99f && feats(3) > 0.99f, feats)

    // non-audio bytes: metadata null, stub features (pipeline never fails)
    val nb = out(1)
    assert(nb.isNullAt(nb.fieldIndex("sample_rate")) && nb.isNullAt(nb.fieldIndex("duration_us")))
    assert(nb.getAs[scala.collection.Seq[Float]]("features").length == 4)

    // the typed dispatch seam: audio/* routes through the codec — same
    // features as the direct decode; other types hit the stub
    def typedFeats(mediaType: String): List[Float] = Multimodal.extractFeaturesTyped(
      Multimodal.asMedia(Seq((1L, "x")).toDF("doc_id", "c"), "c", mediaType)
        .withColumn("media", org.apache.spark.sql.functions.lit(wav)),
      "doc_id", dim = 4).head().getAs[scala.collection.Seq[Float]]("features").toList
    assert(typedFeats("audio/wav") == feats.toList)
    assert(typedFeats("application/octet-stream") != feats.toList)
  }

  test("multimodal: ISO-BMFF container metadata parses (duration, track dims); non-BMFF yields nulls") {
    // minimal MP4 built box-by-box per the ISO 14496-12 layout
    def box(name: String)(payload: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val p = java.nio.ByteBuffer.allocate(256); payload(p)
      val out = java.nio.ByteBuffer.allocate(8 + p.position())
      out.putInt(8 + p.position()); out.put(name.getBytes("US-ASCII"))
      p.flip(); out.put(p)
      out.array()
    }
    val ftyp = box("ftyp")(p => p.put("isom".getBytes("US-ASCII")))
    val mvhd = box("mvhd") { p =>
      p.putInt(0)              // version 0 + flags
      p.putInt(0); p.putInt(0) // creation, modification
      p.putInt(1000)           // timescale: 1000 units/s
      p.putInt(5000)           // duration: 5000 units → 5000 ms
    }
    val tkhd = box("tkhd") { p =>
      p.putInt(0)                                         // version + flags
      p.putInt(0); p.putInt(0); p.putInt(1); p.putInt(0)  // times, track_ID, reserved
      p.putInt(0)                                         // duration
      p.put(new Array[Byte](8 + 2 + 2 + 2 + 2 + 36))      // reserved…matrix
      p.putInt(640 << 16); p.putInt(360 << 16)            // 16.16 fixed dims
    }
    val moov = box("moov") { p => p.put(mvhd); p.put(box("trak")(q => q.put(tkhd))) }
    val mp4 = ftyp ++ moov

    assert(Multimodal.parseMp4Meta(mp4).contains((5000L, 640, 360)))
    assert(Multimodal.parseMp4Meta("not a video".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseMp4Meta(java.util.Arrays.copyOf(mp4, 20)).isEmpty) // truncated

    val out = Multimodal.extractVideoInfo(
      Seq((1L, mp4), (2L, "junk bytes".getBytes("UTF-8"))).toDF("doc_id", "media"),
      "doc_id", dim = 8).orderBy("doc_id").collect()
    val v = out(0)
    assert(v.getAs[Long]("duration_ms") == 5000L)
    assert(v.getAs[Int]("width") == 640 && v.getAs[Int]("height") == 360)
    assert(v.getAs[scala.collection.Seq[Float]]("features").length == 8) // stub feats
    val nv = out(1)
    assert(nv.isNullAt(nv.fieldIndex("duration_ms")))
    assert(nv.getAs[scala.collection.Seq[Float]]("features").length == 8)
  }

  test("multimodal: MJPEG-AVI frames decode through the real JPEG codec (RIFF walk + temporal mean)") {
    // a real MJPEG-AVI built chunk-by-chunk per the RIFF layout, with
    // three solid-gray 32×24 JPEG frames (levels 0 / 128 / 255)
    def jpeg(level: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 24,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(level, level, level))
      g.fillRect(0, 0, 32, 24); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def le(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(cc: String, payload: Array[Byte]): Array[Byte] = {
      val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      cc.getBytes("US-ASCII") ++ le(payload.length) ++ payload ++ pad
    }
    def list(listType: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ children)
    val avih = chunk("avih",
      le(40000) ++ le(0) ++ le(0) ++ le(0) ++ // µs/frame, maxBps, padding, flags
      le(3) ++ le(0) ++ le(1) ++ le(0) ++     // totalFrames, initial, streams, bufSize
      le(32) ++ le(24) ++ new Array[Byte](16))
    val frames = Seq(0, 128, 255).map(jpeg)
    val movi = list("movi", frames.map(chunk("00dc", _)).reduce(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ list("hdrl", avih) ++ movi
    val avi = "RIFF".getBytes("US-ASCII") ++ le(body.length) ++ body

    val Some((durMs, w, h, feats)) = Multimodal.decodeAviVideo(avi, dim = 8)
    assert(durMs == 120L && w == 32 && h == 24) // 3 frames × 40 ms
    // temporal mean of three flat gray frames ≈ (0+128+255)/3/255
    val expected = (0.0 + 128.0 + 255.0) / 3.0 / 255.0
    feats.foreach(f => assert(math.abs(f - expected) < 0.05, s"feature $f vs $expected"))
    assert(Multimodal.decodeAviVideo("not an avi".getBytes("UTF-8"), 8).isEmpty)
    // an AVI with a corrupt frame still decodes from the good frames
    val movi2 = list("movi", chunk("00dc", Array[Byte](1, 2, 3)) ++ chunk("00dc", frames(1)))
    val body2 = "AVI ".getBytes("US-ASCII") ++ list("hdrl", avih) ++ movi2
    val avi2 = "RIFF".getBytes("US-ASCII") ++ le(body2.length) ++ body2
    val Some((_, _, _, f2)) = Multimodal.decodeAviVideo(avi2, dim = 8)
    f2.foreach(f => assert(math.abs(f - 128.0 / 255.0) < 0.05))

    // extractVideoInfo: the AVI row carries REAL frame features,
    // junk stays metadata-null with stub features
    val out = Multimodal.extractVideoInfo(
      Seq((1L, avi), (2L, "junk".getBytes("UTF-8"))).toDF("doc_id", "media"),
      "doc_id", dim = 8).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("duration_ms") == 120L)
    assert(out(0).getAs[Int]("width") == 32 && out(0).getAs[Int]("height") == 24)
    out(0).getAs[scala.collection.Seq[Float]]("features")
      .foreach(f => assert(math.abs(f - expected) < 0.05))
    assert(out(1).isNullAt(out(1).fieldIndex("duration_ms")))
    // dispatch: video/ media type routes to the AVI decoder
    val byType = Multimodal.decodeByType(avi, "video/x-msvideo", 8)
    assert(byType.toSeq == feats.toSeq)
  }

  test("kmvContainment: a benchmark excerpted from one source reads 1.0 there, ~0 elsewhere; small eval side is exact") {
    import spark.implicits._
    // both sides below k=256 → every sketch is the exact set and the
    // estimator collapses to exact arithmetic (the property worth
    // pinning; the >k regime is the llm117 oracle's IEEE replay)
    val train = (1 to 200).flatMap(i => Seq(("srcA", s"tokenA$i"), ("srcB", s"tokenB$i")))
      .toDF("g", "v")
    // eval = a 40-value subset of srcA (|E| < k → exact denominator)
    val eval = ((1 to 40).map(i => ("benchA", s"tokenA$i")) ++
      (1 to 40).map(i => ("benchZ", s"held$i"))).toDF("g", "v")
    val out = Sketches.kmvContainment(train, col("g"), col("v"),
        eval, col("g"), col("v"), k = 256)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(4), r.getDouble(5))).toMap
    // d_eval_est is EXACT (40 < k); containment of the planted subset is exactly 1
    assert(out(("srcA", "benchA"))._1 == 40.0)
    assert(out(("srcA", "benchA"))._2 == 1.0)
    assert(out(("srcB", "benchA"))._2 == 0.0) // disjoint vocabulary
    assert(out(("srcA", "benchZ"))._2 == 0.0 && out(("srcB", "benchZ"))._2 == 0.0)
  }

  test("fingerprintContainmentPairs: a trim scores full containment; disjoint items never pair") {
    import spark.implicits._
    // item 1 = {a,b,c}, item 2 = trim {b,c}, item 3 = disjoint {x,y}
    val fps = Seq((1L, "a"), (1L, "b"), (1L, "c"), (1L, "c"), // dup fp collapses
      (2L, "b"), (2L, "c"), (3L, "x"), (3L, "y")).toDF("id", "fp")
    val out = Dedup.fingerprintContainmentPairs(fps, col("id"), col("fp"),
        minContainment = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(out.toSeq == Seq((1L, 2L, 2L, 1.0)), out.mkString(", "))
  }

  test("fingerprintContainmentPairs: null fingerprints count toward neither sizes nor candidates") {
    import spark.implicits._
    // item 1 = {a,b} + an undecodable (null) fingerprint; item 2 = {a,b}.
    // Pre-fix, distinct kept one null row for item 1 → n_a = 3 and the
    // pair scored 2/min(3,2) with a size the join could never match.
    val fps = Seq((1L, Some("a")), (1L, Some("b")), (1L, None),
      (2L, Some("a")), (2L, Some("b"))).toDF("id", "fp")
    val out = Dedup.fingerprintContainmentPairs(fps, col("id"), col("fp"),
        minContainment = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.toSeq == Seq((1L, 2L, 2L, 2L, 2L, 1.0)), out.mkString(", "))
  }

  test("kmvContainment: containment_est is clamped to 1.0 in the estimated regime") {
    import spark.implicits._
    // both sides see the SAME 5000 distinct values (true containment
    // 1.0), well past k=256 so both denominators are order-statistic
    // ESTIMATES — independent errors can push the raw ratio above 1;
    // the output is a fraction and must never exceed it
    val vals = (1 to 5000).map(i => s"value_$i")
    val train = vals.map(("src", _)).toDF("g", "v")
    val eval = vals.map(("bench", _)).toDF("g", "v")
    val row = Sketches.kmvContainment(train, col("g"), col("v"),
        eval, col("g"), col("v"), k = 256).collect().head
    val c = row.getDouble(5)
    assert(c <= 1.0, s"containment_est $c exceeds 1.0")
    assert(c > 0.9, s"containment_est $c far from the true 1.0")
  }

  test("scriptProfile: docs with zero Latin/Cyrillic/CJK chars are 'other', not 'latin'") {
    import spark.implicits._
    val docs = Seq(
      (1L, "plain latin words"),
      (2L, "1234 5678 90"),     // pure digits/punct
      (3L, "مرحبا بالعالم"),     // Arabic — none of the three families
      (4L, "한글 텍스트")        // Hangul — none of the three families
    ).toDF("id", "t")
    val out = TextAnalysis.scriptProfile(docs, col("id"), col("t"))
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(out(1L) == "latin")
    assert(out(2L) == "other", s"digits-only doc labeled ${out(2L)}")
    assert(out(3L) == "other" && out(4L) == "other", out.toString)
  }

  test("duplicateSpanScrub: shared spans cut from every carrier; overlapping islands merge; unique docs untouched") {
    import spark.implicits._
    // doc 1 = X ++ Y overlapping at 'IJ' (X at 1..10, Y at 9..18):
    // doc 2 carries X, doc 3 carries Y — doc 1's two islands (gram
    // positions 1-7 and 9-15) overlap char-wise at 9..10 and must
    // merge into ONE 1..18 cut; docs 2/3 lose their copy; doc 4 is
    // unique and passes through verbatim
    val docs = Seq(
      (1L, "ABCDEFGHIJKLMNOPQRzz"),
      (2L, "xxABCDEFGHIJxx"),
      (3L, "yyIJKLMNOPQRyy"),
      (4L, "unique content entirely")).toDF("id", "t")
    val out = Dedup.duplicateSpanScrub(docs, col("id"), col("t"),
        n = 4, minSpan = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    assert(out(1L) == ((1L, 18L, "1:18", "zz")), out(1L).toString)
    assert(out(2L) == ((1L, 10L, "3:10", "xxxx")), out(2L).toString)
    assert(out(3L) == ((1L, 10L, "3:10", "yyyy")), out(3L).toString)
    assert(out(4L) == ((0L, 0L, "", "unique content entirely")), out(4L).toString)
  }

  test("parseExif: round-trips the handcrafted APP1 in both byte orders; the spliced JPEG still decodes") {
    val ii = Multimodal.fixtureJpegExif(0L) // id 0 → little-endian
    val mm = Multimodal.fixtureJpegExif(1L) // id 1 → big-endian
    assert(Multimodal.parseExif(ii) ==
      Some(("II", "Cam0", "M-0", 1, "2024:01:01 10:00:00", 4)))
    assert(Multimodal.parseExif(mm) ==
      Some(("MM", "Cam1", "M-1", 2, "2024:02:02 10:00:00", 4)))
    // the splice must not break the image itself
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(ii))
    assert(img != null && img.getWidth == 24 && img.getHeight == 16)
    // bare TIFF (no JPEG wrapper) parses too
    val app1 = Multimodal.buildExifApp1(le = false, "Maker", "Mod",
      orientation = 6, dateTime = "2020:12:31 23:59:59")
    val tiff = java.util.Arrays.copyOfRange(app1, 10, app1.length)
    assert(Multimodal.parseExif(tiff) ==
      Some(("MM", "Maker", "Mod", 6, "2020:12:31 23:59:59", 4)))
  }

  test("parseExif: PNG eXIf chunk parses and the chunk splice keeps the PNG decodable bit-exactly") {
    val tiff = Multimodal.buildTiffExif(le = true, "CamX", "M-X",
      orientation = 3, dateTime = "2024:06:15 08:30:00")
    val plain = Multimodal.fixturePng(9L)
    val withExif = Multimodal.pngWithExif(plain, tiff)
    assert(Multimodal.parseExif(withExif) ==
      Some(("II", "CamX", "M-X", 3, "2024:06:15 08:30:00", 4)))
    // ancillary chunk: pixels must survive exactly (lossless container)
    val a = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(plain))
    val b = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(withExif))
    assert(b != null && b.getWidth == a.getWidth && b.getHeight == a.getHeight)
    val same = (0 until a.getHeight).forall(y => (0 until a.getWidth).forall(x =>
      a.getRGB(x, y) == b.getRGB(x, y)))
    assert(same, "eXIf splice changed pixel data")
  }

  test("burstShotClusters: device+window blocking + Hamming verify groups bursts; the planted stranger stays out") {
    import spark.implicits._
    // burst 0 (docs 0-3): member 3 is the STRANGER (same Cam0, same
    // 10 s window, independent bits); burst 1 (docs 4-7): clean
    val media = udf((id: Long) => Multimodal.fixturePngBurst(id))
    val df = (0L to 7L).toDF("doc_id").withColumn("media", media(col("doc_id")))
    val out = Multimodal.burstShotClusters(df, col("doc_id"), col("media"),
        maxHamming = 6)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(out(0L) == ((0L, 3L, true)) && out(1L) == ((0L, 3L, false)) &&
           out(2L) == ((0L, 3L, false)), out.toString)
    assert(out(3L) == ((3L, 1L, true)), s"stranger must be its own singleton: ${out(3L)}")
    assert(out(4L) == ((4L, 4L, true)) && out(7L) == ((4L, 4L, false)), out.toString)
  }

  test("orientedDHash: normalization recovers the planted hash for every orientation branch; the naive hash scatters") {
    // pairs 0/1/2 exercise orientations 3, 6, 8 respectively
    (0L to 2L).foreach { pair =>
      val upright = Multimodal.fixturePngOriented(pair * 2)
      val rotated = Multimodal.fixturePngOriented(pair * 2 + 1)
      val Some((h0, o0)) = Multimodal.orientedDHash(upright)
      val Some((h1, o1)) = Multimodal.orientedDHash(rotated)
      assert(o0 == 1 && o1 == Seq(3, 6, 8)(pair.toInt % 3), s"pair $pair: $o0/$o1")
      assert(h0 == h1, s"pair $pair: normalized hashes diverged")
      // the naive (orientation-blind) hash must NOT collide — the
      // normalization is load-bearing, not decorative
      val naive = Multimodal.dhash64(rotated).get
      assert(naive != h1, s"pair $pair: rotation did not scatter the naive hash")
    }
  }

  test("parseExif fuzz: random, truncated, and foreign bytes yield None, never a throw") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(b)
      Multimodal.parseExif(b) // must not throw
    }
    val valid = Multimodal.fixtureJpegExif(5L)
    (0 until valid.length by 7).foreach { cut =>
      Multimodal.parseExif(java.util.Arrays.copyOf(valid, cut)) // must not throw
    }
    // a plain PNG has no EXIF: clean None
    assert(Multimodal.parseExif(Multimodal.fixturePng(3L)).isEmpty)
    assert(Multimodal.parseExif(null).isEmpty)
  }

  test("quality probes fuzz: random and truncated media yield None, never a throw") {
    val rnd = new scala.util.Random(17)
    (1 to 150).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(b)
      Multimodal.audioQualityQ(b, 256L, 32700L)
      Multimodal.imageQualityQ(b)
    }
    val wav = Multimodal.fixtureWavQuality(9L, silence = true, clip = true)
    val png = Multimodal.fixturePngQuality(9L, dark = true, gray = false)
    (0 until wav.length by 97).foreach { cut =>
      Multimodal.audioQualityQ(java.util.Arrays.copyOf(wav, cut), 256L, 32700L)
    }
    (0 until png.length by 23).foreach { cut =>
      Multimodal.imageQualityQ(java.util.Arrays.copyOf(png, cut))
    }
    // cross-codec confusion: a PNG fed to the audio probe and vice versa
    assert(Multimodal.audioQualityQ(png, 256L, 32700L).isEmpty)
    assert(Multimodal.imageQualityQ(wav).isEmpty)
  }

  test("longestSharedRun: the islands trick finds the verbatim span; an edit splits the run; min-run gates noise") {
    import spark.implicits._
    val train = Seq((10L, "abcdefghijklmnopqrstuvwxyz0123456789")).toDF("id", "t")
    val samples = Seq(
      (101L, "cdefghijklmnopq"),          // verbatim 15-char excerpt → 13 3-gram runs
      (102L, "cdefghiQklmnopq"),          // one edit → runs 5 and 5 (cde..ghi, klm..opq)
      (103L, "zzqqzzqqzzqq")).toDF("id", "t") // held out → no run ≥ 3
    val out = Dedup.longestSharedRun(samples, col("id"), col("t"),
        train, col("id"), col("t"), n = 3, minRun = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((101L, 10L, 13L, 15L), (102L, 10L, 5L, 7L)),
      out.mkString(", "))
  }

  test("multimodal: videoKeyframes finds scene cuts through the REAL JPEG codec (MJPEG-AVI)") {
    // gradient frames survive JPEG quantization ordinally: a smooth
    // left-right ramp keeps its luminance ordering at the 9×8 lattice
    // (≈28 units between samples vs ±2 codec error), so the dHash of
    // a ramp is stable and a reversed ramp flips every gradient bit
    def jpegRamp(reversed: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 24,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 24; x <- 0 until 32) {
        val v = if (reversed) 255 - x * 8 else x * 8
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    // scene A (2 frames), scene B (2 frames): one cut, at frame 2 —
    // through the PRODUCTION container assembly (Multimodal.aviContainer)
    val avi = Multimodal.aviContainer(
      Seq(false, false, true, true).map(jpegRamp), w = 32, h = 24)

    val out = Multimodal.videoKeyframes(
      Seq((7L, avi), (8L, "junk".getBytes("UTF-8"))).toDF("doc_id", "media"),
      col("doc_id"), col("media"), maxFrames = 8, hammingThreshold = 10)
      .orderBy("doc_id", "frame_idx").collect()
    // junk yields no rows; the AVI yields exactly frame 0 (always) and
    // the scene cut at frame 2 — the intra-scene repeats never flag
    assert(out.map(_.getLong(0)).forall(_ == 7L))
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 2), out.mkString(", "))
    assert(out(0).getInt(3) == -1 && out(1).getInt(3) > 10)

    // the oracle fixture dialect (PNG frames in the same RIFF layout)
    // demuxes through the same walk: 6 frames, 24×16, 240 ms
    val Some((durMs, w, h, fx)) =
      Multimodal.parseAviMjpeg(Multimodal.fixtureAviPng(42L))
    assert(durMs == 240L && w == 24 && h == 16 && fx.size == 6)
  }

  test("multimodal: MJPEG-in-MP4 frames decode via the sample tables (stsd/stsz/stsc/stco demux)") {
    def jpeg(level: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 24,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(level, level, level))
      g.fillRect(0, 0, 32, 24); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def box(name: String)(payload: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val p = java.nio.ByteBuffer.allocate(65536); payload(p)
      val out = java.nio.ByteBuffer.allocate(8 + p.position())
      out.putInt(8 + p.position()); out.put(name.getBytes("US-ASCII"))
      p.flip(); out.put(p)
      out.array()
    }
    val frames = Seq(64, 192).map(jpeg)
    val ftyp = box("ftyp")(p => p.put("isom".getBytes("US-ASCII")))
    val mdat = box("mdat")(p => frames.foreach(f => p.put(f)))
    val firstSampleOffset = ftyp.length + 8 // both samples in one chunk, inside mdat
    def mp4For(codec: String): Array[Byte] = {
      val mvhd = box("mvhd") { p =>
        p.putInt(0); p.putInt(0); p.putInt(0)
        p.putInt(1000); p.putInt(2000) // timescale 1000 → 2000 ms
      }
      val tkhd = box("tkhd") { p =>
        p.putInt(0)
        p.putInt(0); p.putInt(0); p.putInt(1); p.putInt(0)
        p.putInt(0)
        p.put(new Array[Byte](8 + 2 + 2 + 2 + 2 + 36))
        p.putInt(32 << 16); p.putInt(24 << 16)
      }
      val stsd = box("stsd") { p =>
        p.putInt(0); p.putInt(1)       // version/flags, entry_count
        p.putInt(8 + 78)               // VisualSampleEntry size
        p.put(codec.getBytes("US-ASCII"))
        p.put(new Array[Byte](78))     // entry body (unread by the demux)
      }
      val stsz = box("stsz") { p =>
        p.putInt(0); p.putInt(0)       // version/flags, uniform size 0
        p.putInt(frames.size)
        frames.foreach(f => p.putInt(f.length))
      }
      val stsc = box("stsc") { p =>
        p.putInt(0); p.putInt(1)       // one run: chunk 1, 2 samples
        p.putInt(1); p.putInt(frames.size); p.putInt(1)
      }
      val stco = box("stco") { p =>
        p.putInt(0); p.putInt(1); p.putInt(firstSampleOffset)
      }
      val stbl = box("stbl") { p => p.put(stsd); p.put(stsz); p.put(stsc); p.put(stco) }
      val minf = box("minf")(p => p.put(stbl))
      val mdia = box("mdia")(p => p.put(minf))
      val trak = box("trak") { p => p.put(tkhd); p.put(mdia) }
      val moov = box("moov") { p => p.put(mvhd); p.put(trak) }
      ftyp ++ mdat ++ moov
    }

    val mp4 = mp4For("jpeg")
    val samples = Multimodal.parseMp4JpegSamples(mp4)
    assert(samples.exists(_.size == 2))
    assert(samples.get.head.toSeq == frames.head.toSeq) // byte-exact demux
    val Some((durMs, w, h, feats)) = Multimodal.decodeMp4Video(mp4, dim = 8)
    assert(durMs == 2000L && w == 32 && h == 24)
    val expected = (64.0 + 192.0) / 2.0 / 255.0 // temporal mean of flat grays
    feats.foreach(f => assert(math.abs(f - expected) < 0.05, s"feature $f vs $expected"))

    // an H.264 track is NOT demuxed — container metadata only, stub features
    val avc = mp4For("avc1")
    assert(Multimodal.parseMp4JpegSamples(avc).isEmpty)
    assert(Multimodal.decodeMp4Video(avc, 8).isEmpty)
    val out = Multimodal.extractVideoInfo(
      Seq((1L, mp4), (2L, avc)).toDF("doc_id", "media"),
      "doc_id", dim = 8).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("duration_ms") == 2000L)
    out(0).getAs[scala.collection.Seq[Float]]("features")
      .foreach(f => assert(math.abs(f - expected) < 0.05))
    assert(out(1).getAs[Long]("duration_ms") == 2000L) // metadata still real
    assert(out(1).getAs[scala.collection.Seq[Float]]("features").length == 8)

    // corrupt sample table (chunk offset past EOF) → None, never an
    // exception: patch stco's offset field (its value is unique in the
    // moov region, after mdat) to a huge address
    val bad = mp4.clone()
    val pat = java.nio.ByteBuffer.allocate(4).putInt(firstSampleOffset).array()
    val stcoOff = (ftyp.length + mdat.length until bad.length - 4)
      .find(i => bad.slice(i, i + 4).sameElements(pat)).get
    java.nio.ByteBuffer.wrap(bad, stcoOff, 4).putInt(0x7ffffff0)
    assert(Multimodal.parseMp4JpegSamples(bad).isEmpty)
    // dispatch: video/ media type routes MP4-MJPEG to the real decoder
    assert(Multimodal.decodeByType(mp4, "video/mp4", 8).toSeq == feats.toSeq)
  }

  test("semDedup: within-cell duplicates drop keep-min; distinct vectors and cross-cell lookalikes survive") {
    // two well-separated directions in 4-d; the 2 lowest ids become
    // the centroids (one per direction), ids 3/4 near-duplicate them
    val vecs = Seq(
      (1L, Array(1.0f, 0.01f, 0f, 0f)),
      (2L, Array(0f, 0f, 1.0f, 0.01f)),
      (3L, Array(1.0f, 0.011f, 0f, 0f)),  // dup of 1 → cell(1), drops
      (4L, Array(0f, 0f, 0.999f, 0.01f))) // dup of 2 → cell(2), drops
      .toDF("vec_id", "embedding")
    val out = Similarity.semDedup(vecs, "vec_id", "embedding",
        nCentroids = 2, simThreshold = 0.99)
      .orderBy("vec_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L), out.mkString(","))
    // each survivor sits in its own cell (keep-min per duplicate family)
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L))

    // threshold no pair can clear (only bit-identical quantized vectors
    // reach cosine 1.0) → nothing drops
    val none = Similarity.semDedup(vecs, "vec_id", "embedding",
        nCentroids = 2, simThreshold = 1.0)
      .orderBy("vec_id").collect()
    assert(none.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("passages: JVM scan equals the composed transform form") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m n o p q tail"),
      (2L, "one two"),
      (3L, "  spaced   out   tokens   here   now   and   then   more   pad  "),
      (4L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
    def run(c: org.apache.spark.sql.Column) =
      docs.select(col("doc_id"), c.as("p")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(run(Dedup.passages(col("toks"), 4)) ===
           run(Dedup.passagesComposed(col("toks"), 4)))
  }

  test("passages: full chunks only, short docs yield none, within-doc repeats are not corpus dups") {
    val docs = Seq(
      (1L, "a b c d e f g h tail dropped"),        // 10 toks → one 8-chunk, tail dropped
      (2L, "a b c d e f g h tail dropped"),        // exact copy of doc 1 → its passage is a dup
      (3L, "short doc"),                           // < 8 tokens → 0 passages
      (4L, "x x x x y y y y x x x x y y y y"))     // same passage TWICE in one doc → not a dup
      .toDF("doc_id", "text")
    val out = Dedup.passageDupStats(docs, col("doc_id"), col("text"), size = 8)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 1L, 1L), (2L, 1L, 1L), (3L, 0L, 0L), (4L, 2L, 0L)))
  }

  test("spanDupStats: sliding windows catch offset-shifted containment; within-doc repeats don't count") {
    val docs = Seq(
      (1L, "a b c d e f g h i"),                      // 9 toks → 2 spans, both inside doc 2
      (2L, "z a b c d e f g h i"),                    // doc 1 shifted by one token: spans 2,3 match
      (3L, "short doc"),                              // < 8 tokens → 0 spans
      (4L, "x1 x2 x3 x4 x5 x6 x7 x8 x1 x2 x3 x4 x5 x6 x7 x8")) // span repeats WITHIN one doc only
      .toDF("doc_id", "text")
    val out = Dedup.spanDupStats(docs, col("doc_id"), col("text"), n = 8)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 2L, 2L), (2L, 3L, 2L), (3L, 0L, 0L), (4L, 9L, 0L)))
  }

  test("histogramQuantiles: cumulative-bin quantiles, clamped edges, per-group independence") {
    // group a: 10 values 0.05..0.95 step 0.1 → bins 1,4,8,11,14,17,20,24,27,30 (32 bins)
    val a = (0 until 10).map(i => ("a", 0.05 + i * 0.1))
    // group b: out-of-range values clamp to the edge bins
    val b = Seq(("b", -5.0), ("b", 0.5), ("b", 99.0))
    val df = (a ++ b).toDF("g", "v")
    val out = Sketches.histogramQuantiles(df, col("g"), col("v"), 0.0, 1.0, 32,
        Seq("p50_bin" -> 0.5, "p90_bin" -> 0.9))
      .orderBy("g").collect()
    val ra = out(0)
    // n=10: p50 → cum >= 5 → 5th value (0.45 → bin 14); p90 → cum >= 9 → 0.85 → bin 27
    assert(ra.getLong(1) == 10L && ra.getLong(2) == 14L && ra.getLong(3) == 27L, ra.toString)
    val rb = out(1)
    // clamped: bins 0, 16, 31; p50 → 2nd value → bin 16; p90 → 3rd → bin 31
    assert(rb.getLong(1) == 3L && rb.getLong(2) == 16L && rb.getLong(3) == 31L, rb.toString)
  }

  test("incrementalExact: index drops replays, within-batch dups collapse keep-min") {
    val seen = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha"),           // replay of an ingested doc → dropped by the index
      (11L, "gamma"), (12L, "gamma"), // within-batch dup → keep 11, n=2
      (13L, "delta"))           // fresh singleton
      .toDF("doc_id", "text")
    val out = Dedup.incrementalExact(batch, col("text"), col("doc_id"),
        seen, col("text"))
      .orderBy("keep_id").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((11L, 2L), (13L, 1L)), out.toString)
  }

  test("chunkWithOverlap: stride windows, covered tail, short docs = one chunk, empty = none") {
    val df = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 toks, chunk 8 stride 4 → 2 chunks (tail covered by start 4)
      (2L, "a b c"),                           // short → one 3-token chunk
      (3L, "  "),                              // no tokens → nothing
      (4L, (1 to 16).map(i => s"w$i").mkString(" "))) // 16 toks → starts 0,4,8 → 3 chunks
      .toDF("doc_id", "text")
    val out = Packing.chunkWithOverlap(df, col("doc_id"), col("text"), 8, 4)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (1L, 0L, 8L), (1L, 1L, 6L),            // second window = toks 5..10
      (2L, 0L, 3L),
      (4L, 0L, 8L), (4L, 1L, 8L), (4L, 2L, 8L)), out.toString)
    // overlapping windows share their overlap: doc 4's chunk 1 = w5..w12
    val hashes = Packing.chunkWithOverlap(df, col("doc_id"), col("text"), 8, 4)
      .filter(col("doc_id") === 4).orderBy("chunk_id")
      .select("chunk_hash").as[Long].collect()
    val expect = Seq((1 to 8), (5 to 12), (9 to 16)).map(r =>
      r.map(i => s"w$i").mkString(" "))
    val direct = Seq(expect: _*).toDF("t")
      .select(graft.functions.Portable.hash64(col("t"))).as[Long].collect()
    assert(hashes.toSeq == direct.toSeq)
  }

  test("topTerms: tf wins, then rarity, then lexicographic; exactly k rows per doc") {
    val docs = Seq(
      (1L, "apple apple banana cherry"), // tf: apple=2 → rank1; banana/cherry tf=1
      (2L, "banana date date"))          // banana appears in both docs (df=2), date only here
      .toDF("doc_id", "text")
    val out = TextAnalysis.topTerms(docs, col("doc_id"), col("text"), k = 2)
      .orderBy("doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    // doc1: apple (tf=2); then cherry beats banana (df 1 < 2)
    // doc2: date (tf=2); then banana
    assert(out == Seq((1L, 1, "apple"), (1L, 2, "cherry"),
                      (2L, 1, "date"), (2L, 2, "banana")))
  }

  test("keepTopQualityPerGroup keeps floor(n*frac) per group, ties break on id") {
    val docs = Seq(
      (1L, "s1", 0.9), (2L, "s1", 0.5), (3L, "s1", 0.5), // n=3 → keep 1 (floor 1.5)
      (4L, "s2", 0.1), (5L, "s2", 0.2))                  // n=2 → keep 1
      .toDF("doc_id", "source", "q")
    val kept = Curation.keepTopQualityPerGroup(docs, col("doc_id"), col("source"),
        col("q"), keepFraction = 0.5)
      .select("doc_id").orderBy("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L, 5L))
  }

  test("keepTopQualityPerGroup: rank stays exact when one group spans many range partitions") {
    // one skewed group (the 100 TB shape the distributed rank exists
    // for) plus a small one; heavy score ties so correctness depends
    // on the cross-partition offset + id tiebreak, not luck
    val docs = ((1 to 1000).map(i => (i.toLong, "big", (i % 7).toDouble)) ++
        (2001 to 2010).map(i => (i.toLong, "small", i.toDouble)))
      .toDF("doc_id", "source", "q")
    // guard the fixture itself: the cross-partition offset path is only
    // exercised if the big group actually SPANS multiple range
    // partitions under this session's shuffle-partition setting —
    // with 1 partition the test silently degrades to the trivial case
    // explicit partition count pins the multi-partition path (AQE
    // would coalesce this tiny shuffle to ONE partition and silently
    // degrade the test to the trivial case)
    val bigSpan = docs
      .repartitionByRange(4, col("source"), col("q").desc, col("doc_id").asc)
      .withColumn("p", org.apache.spark.sql.functions.spark_partition_id())
      .where(col("source") === "big")
      .select("p").distinct().count()
    assert(bigSpan > 1,
      s"fixture must span >1 range partition (got $bigSpan) — raise rows or lower shuffle partitions")
    val kept = Curation.keepTopQualityPerGroup(docs, col("doc_id"), col("source"),
        col("q"), keepFraction = 0.3, numPartitions = Some(4))
      .select("doc_id").as[Long].collect().toSet
    val refBig = (1 to 1000).map(i => (i.toLong, (i % 7).toDouble))
      .sortBy { case (id, q) => (-q, id) }.take(300).map(_._1)
    val refSmall = (2001 to 2010).map(_.toLong).sortBy(-_).take(3)
    assert(kept == (refBig ++ refSmall).toSet)
  }

  test("bigramScore: hand-computed add-one-smoothed probabilities; short docs drop out") {
    // corpus: doc1 "a b a", doc2 "a b", doc3 "x" (no bigrams)
    // c(a,b)=2 c(b,a)=1; c(a,·)=2 c(b,·)=1; V=3 {a,b,x}
    val docs = Seq((1L, "a b a"), (2L, "a b"), (3L, "x")).toDF("id", "text")
    val out = LanguageModel.bigramScore(docs, col("id"), col("text"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // doc3 has no transitions
    val pAB = math.floor((2 + 1).toDouble / (2 + 3) * 1e9) // p(b|a)=3/5
    val pBA = math.floor((1 + 1).toDouble / (1 + 3) * 1e9) // p(a|b)=1/2
    assert(out(0).getLong(1) == 2L)
    assert(out(0).getDouble(2) == (pAB + pBA) / 2 / 1e9)
    assert(out(1).getLong(1) == 1L)
    assert(out(1).getDouble(2) == pAB / 1e9)

    val band = LanguageModel.keepTypicalityBand(docs, col("id"), col("text"),
      lo = 0.55, hi = 0.59).collect()
    assert(band.map(_.getLong(0)).toSeq == Seq(1L)) // doc1 avg 0.55 in band; doc2 0.6 above
  }

  test("importanceScore: target-like docs score above out-of-domain docs; unseen bigrams back off") {
    val raw = Seq(
      (1L, "alpha beta alpha beta alpha beta"), // matches the target exactly
      (2L, "gamma delta gamma delta gamma delta")) // no overlap with target
      .toDF("id", "text")
    val target = Seq("alpha beta alpha beta").toDF("text")
    val out = LanguageModel.importanceScore(raw, col("id"), col("text"),
        target, col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > out(2L),
      s"target-matching doc must carry higher importance: $out")
    // the out-of-domain doc's transitions are unseen in the target:
    // every ratio hits the smoothing floor but stays positive
    assert(out(2L) > 0.0)
  }

  test("bm25: more query-term occurrences rank higher; idf rewards rare terms; topK plans TakeOrdered") {
    val docs = Seq(
      (1L, "spark spark spark filler filler filler filler filler"), // tf(spark)=3
      (2L, "spark filler filler filler filler filler filler full"),  // tf(spark)=1
      (3L, "rare filler filler filler filler filler filler filler"), // rare term, df=1
      (4L, "filler filler filler filler filler filler filler text")) // no match
      .toDF("id", "text")
    val scores = Retrieval.bm25(docs, col("id"), col("text"), Seq("spark", "rare"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!scores.contains(4L)) // no matching term → drops out
    assert(scores(1L) > scores(2L), "higher tf must score higher at equal dl")
    // df(spark)=2, df(rare)=1 → rare's idf exceeds spark's: doc3 (tf=1
    // of the rarer term) must beat doc2 (tf=1 of the commoner term)
    assert(scores(3L) > scores(2L), "rarer term must carry higher idf")

    val topPlan = Retrieval.bm25TopK(docs, col("id"), col("text"), Seq("spark"), k = 2)
    assert(topPlan.queryExecution.executedPlan.toString.contains("TakeOrdered"),
      "top-k must plan TakeOrderedAndProject, not a global sort")
    assert(topPlan.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))

    // odds mode matches log mode's per-doc ordering on a single term
    val odds = Retrieval.bm25(docs, col("id"), col("text"), Seq("spark"),
        idfMode = Retrieval.OddsIdf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(odds(1L) > odds(2L))
  }

  test("kmvEstimate (production path) equals kmvDistinct's estimate, sans exact column") {
    val big = (1 to 20000).map(i => s"item-$i").toDF("v")
    val est = Sketches.kmvEstimate(big, col("v"), k = 256).head()
    assert(est.schema.fieldNames.toSeq == Seq("kmv_estimate"))
    val both = Sketches.kmvDistinct(big, col("v"), k = 256).head()
    assert(est.getDouble(0) == both.getDouble(1))
  }

  test("sourceOverlap: hand-checked containment, single-source and >64-source edges") {
    // src A: "abcdef" → 3 distinct 4-shingles; src B: same text → same 3;
    // src C: disjoint text. A∩B = 3, containment = 3/min(3,3) = 1.0
    val docs = Seq(("A", "abcdef"), ("B", "abcdef"), ("C", "zzzzyyyyxxxx"))
      .toDF("source", "text")
    val out = Dedup.sourceOverlap(docs, col("source"), col("text"), n = 4)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(("A", "B"))) // disjoint pairs don't surface
    assert(out(("A", "B")) == ((3L, 1.0)))
    // one source → no pairs, empty result with the right schema
    val one = Dedup.sourceOverlap(Seq(("A", "abc")).toDF("source", "text"),
      col("source"), col("text"), n = 2)
    assert(one.count() == 0)
    assert(one.columns.toSeq == Seq("source_a", "source_b", "n_shared", "containment"))
    // 65 sources overflow the bitmask loudly
    val many = (0 until 65).map(i => (s"s$i", "xy")).toDF("source", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.sourceOverlap(many, col("source"), col("text"), n = 2).collect()
    }
    assert(e.getMessage.contains("<= 64"))
  }

  test("datasetCard: one-row datasheet with exact dup rate and histogram-fold quantile bins") {
    val long64 = (1 to 64).map(i => s"w$i").mkString(" ") // quality 1.0 → bin 31
    val docs = Seq(
      (1L, "a b", "s1", "en"), (2L, "a b", "s1", "en"),   // dup pair, quality 2/64 → bin 1
      (3L, long64, "s2", "de")).toDF("id", "text", "source", "lang")
    val r = CorpusReport.datasetCard(docs, col("text"), col("source"), col("lang")).head()
    assert(r.getAs[Long]("n_docs") == 3 && r.getAs[Long]("n_tokens") == 68)
    assert(r.getAs[Long]("n_sources") == 2 && r.getAs[Long]("n_langs") == 2)
    assert(math.abs(r.getAs[Double]("dup_rate") - 1.0 / 3) < 1e-12)
    // p50 target = ceil(1.5) = 2 → cum hits 2 at bin 1; p90 = ceil(2.7) = 3 → bin 31
    assert(r.getAs[Int]("p50_bin") == 1 && r.getAs[Int]("p90_bin") == 31)
  }

  test("scrubDuplicatePassages rebuilds docs keep-first; within-doc repeats survive") {
    val df = Seq(
      (1L, "a b c d"),     // passages "a b" / "c d"; keeper of "a b"
      (2L, "a b x y"),     // loses "a b" to doc 1, keeps "x y"
      (3L, "q"),           // too short for one passage → empty rebuild
      (4L, "p q p q")).toDF("id", "text")
    val out = Dedup.scrubDuplicatePassages(df, col("id"), col("text"), size = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 0L, "a b c d"),
      (2L, 1L, 1L, "x y"),
      (3L, 0L, 0L, ""),
      (4L, 2L, 0L, "p q p q"))) // same-doc repetition is not corpus duplication
  }

  test("scrubDuplicateSpans removes covered tokens in non-keeper docs; short docs pass through") {
    val df = Seq(
      (1L, "a b c d e"),    // keeper of every shared span
      (2L, "x a b c d y"),  // dup spans start at 2 (a b c) and 3 (b c d)
      (3L, "t u")).toDF("id", "text") // shorter than n → normalized pass-through
    val out = Dedup.scrubDuplicateSpans(df, col("id"), col("text"), n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 2: starts {2,3} cover positions 2..5 → "a b c d" removed
    assert(out.toSeq == Seq(
      (1L, 5L, 0L, "a b c d e"),
      (2L, 6L, 4L, "x y"),
      (3L, 2L, 0L, "t u")))
  }

  test("vocabGrowth: per-bin new terms and cumulative vocab/token curves") {
    val df = Seq((0L, "a b a"), (1L, "b c"), (2L, ""), (3L, "c d d")).toDF("id", "text")
    val out = CorpusStats.vocabGrowth(df, col("id"), col("text"), binWidth = 2L)
      .orderBy("checkpoint").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // bin ≤2 (docs 0,1): 5 tokens, new {a,b,c}=3; bin ≤4 (docs 2,3): 3 tokens, new {d}=1
    assert(out.toSeq == Seq((2L, 3L, 5L, 3L, 5L), (4L, 1L, 3L, 4L, 8L)))
  }

  test("wordTokenCounts: per-word fertility under the merge table, in word order") {
    val bpe = Tokenizer.fromMergesText("#version: 0.2\nt h\nth e")
    val out = Seq("The cat", (null: String)).toDF("t")
      .select(Tokenizer.wordTokenCounts(spark, bpe)(col("t")).as("c"))
      .collect().map(r => r.getSeq[Int](0))
    assert(out(0) == Seq(1, 3)) // "the" merges t+h, th+e → 1 token; "cat" stays 3 chars
    assert(out(1).isEmpty)      // null text → empty counts, not a crash
  }

  test("domainReweight concentrates weight on the high-loss domain; iters=0 stays uniform") {
    val df = (Seq.fill(4)(("easy", 100000L)) ++ Seq.fill(4)(("hard", 900000L)))
      .toDF("src", "lq")
    val w = Sampling.domainReweight(df, col("src"), col("lq"), iters = 8)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (easy, hard) = (w(0), w(1))
    assert(easy._1 == "easy" && hard._1 == "hard")
    assert(easy._2 == 4L && easy._3 == 100000L && hard._3 == 900000L)
    assert(hard._4 > easy._4, s"hard domain must gain weight: $hard vs $easy")
    // normalization holds to within integer-floor slack each round
    assert(easy._4 + hard._4 <= 1000000000L && easy._4 + hard._4 >= 999999990L)
    val u = Sampling.domainReweight(df, col("src"), col("lq"), iters = 0)
      .orderBy("source").collect().map(_.getLong(3))
    assert(u.toSeq == Seq(500000000L, 500000000L))
    // out-of-range loss fails loudly, not silently overflowing the lattice
    val bad = Seq(("x", 2000000L)).toDF("src", "lq")
    val e2 = intercept[IllegalArgumentException] {
      Sampling.domainReweight(bad, col("src"), col("lq"), iters = 1)
    }
    assert(e2.getMessage.contains("quantized range"))
  }

  test("curriculumSchedule stride-interleaves sources by weight; quality ranks within source") {
    val docs = Seq(
      (1L, "a", 90L), (2L, "a", 50L), (3L, "a", 70L),
      (4L, "b", 99L), (5L, "b", 10L)).toDF("id", "src", "q")
    val out = Curation.curriculumSchedule(docs, col("id"), col("src"), col("q"),
        weights = Map("a" -> 1000000000L, "b" -> 500000000L))
      .orderBy("position", "source", "rank_in_source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // a ranks by q desc: 1(90),3(70),2(50) at stride 1; b: 4(99),5(10) at stride 2
    assert(out.toSeq == Seq(
      (1L, "a", 1L, 1L), (3L, "a", 2L, 2L), (4L, "b", 1L, 2L),
      (2L, "a", 3L, 3L), (5L, "b", 2L, 4L)))
    // a doc from a source without a weight fails loudly
    val e = intercept[Exception] {
      Curation.curriculumSchedule(Seq((9L, "zz", 1L)).toDF("id", "src", "q"),
        col("id"), col("src"), col("q"), Map("a" -> 1L)).collect()
    }
    assert(e.getMessage.contains("no weight") || e.getCause.getMessage.contains("no weight"))
    // zero / oversized weights are rejected before any job runs
    intercept[IllegalArgumentException] {
      Curation.curriculumSchedule(docs, col("id"), col("src"), col("q"), Map("a" -> 0L))
    }
  }

  test("kCenter: farthest-first selection with exact lattice distances and id tie-breaks") {
    val df = Seq(
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(0.1f, 0.0f)),
      (3L, Array(1.0f, 1.0f)),
      (4L, Array(0.5f, 0.5f))).toDF("id", "vec")
    val out = Clustering.kCenter(df, col("id"), col("vec"), dims = 2, k = 3)
      .orderBy("sel_round").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // seed = min id (1); round 1 = farthest from it (3, 2·10¹²);
    // round 2 = max-min over {1,3} → 4 at (5·10⁵)²·2
    assert(out.toSeq == Seq((0, 1L, 0L), (1, 3L, 2000000000000L), (2, 4L, 500000000000L)))
  }

  test("kCenter stops early at coverage radius 0 and filters malformed vectors up front") {
    // only 2 distinct vectors but k=4 — duplicates must NOT re-select
    val dup = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f))).toDF("id", "vec")
    val out = Clustering.kCenter(dup, col("id"), col("vec"), dims = 2, k = 4)
      .orderBy("sel_round").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out.toSeq == Seq((0, 1L), (1, 3L))) // radius hits 0 after 2 centers
    // a wrong-width LOWEST-ID vector drops instead of crashing the seed
    val malformed = Seq(
      (1L, Array(9.9f)),               // wrong dims — filtered
      (2L, Array(0.0f, 0.0f)),
      (3L, Array(1.0f, 1.0f))).toDF("id", "vec")
    val out2 = Clustering.kCenter(malformed, col("id"), col("vec"), dims = 2, k = 2)
      .orderBy("sel_round").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out2.toSeq == Seq((0, 2L), (1, 3L)))
  }

  test("trigramScore: counts per doc, short docs drop, repeated trigram scores higher") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),          // 2 trigrams
      (2L, "a b c a b c a b c"), // repeated trigram → typical
      (3L, "x q"),               // too short — no trigram
      (4L, "z y x w v")          // all-unique trigrams → atypical
    ).toDF("doc_id", "text")
    val out = LanguageModel.trigramScore(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(!out.contains(3L))
    assert(out(1L)._1 == 2L && out(2L)._1 == 7L && out(4L)._1 == 3L)
    assert(out(2L)._2 > out(4L)._2,
      s"repeated trigrams must outscore unique ones: $out")
  }

  test("bm25Batch with one query equals the literal-terms bm25 exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join window scan"),
      (2L, "join join filter"),
      (3L, "window spark spark join value"),
      (4L, "nothing relevant here")).toDF("doc_id", "text")
    val single = Retrieval.bm25(docs, col("doc_id"), col("text"),
        Seq("spark", "join"), idfMode = Retrieval.OddsIdf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val q = Seq((7L, "spark"), (7L, "join")).toDF("qid", "term")
    val batch = Retrieval.bm25Batch(docs, col("doc_id"), col("text"),
        q, col("qid"), col("term"), idfMode = Retrieval.OddsIdf)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(batch == single)
    // round-22: the TRACKED one-corpus-pass shape (collected local query
    // relation + JVM matched-token scan + materialized per-doc proxy)
    // must be value-identical to the lazy two-pass shape
    val tracker = new graft.operators.Materialize.Tracker
    val tracked = Retrieval.bm25Batch(docs, col("doc_id"), col("text"),
        q, col("qid"), col("term"), idfMode = Retrieval.OddsIdf,
        tracker = Some(tracker))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    tracker.releaseAll()
    assert(tracked == single)
  }

  test("bm25Batch tracked path: multi-query fan-out, null/empty docs, unmatched docs drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join window scan"),
      (2L, "join join filter"),
      (3L, ""),                       // zero tokens — still in corpus stats
      (4L, null.asInstanceOf[String]) // null text — tokens null
    ).toDF("doc_id", "text")
    val q = Seq((7L, "spark"), (7L, "join"), (8L, "filter"), (8L, "spark"))
      .toDF("qid", "term")
    def run(tr: Option[graft.operators.Materialize.Tracker]) =
      Retrieval.bm25Batch(docs, col("doc_id"), col("text"),
          q, col("qid"), col("term"), idfMode = Retrieval.OddsIdf, tracker = tr)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val lazyOut = run(None)
    val tracker = new graft.operators.Materialize.Tracker
    val trackedOut = run(Some(tracker))
    tracker.releaseAll()
    assert(trackedOut == lazyOut)
    // both qids score doc 1 (has spark+join / spark); doc 3/4 never appear
    assert(lazyOut.map(_._2).intersect(Set(3L, 4L)).isEmpty)
    assert(lazyOut.map(_._1) == Set(7L, 8L))
  }

  test("recallAtK: intersection per query, zero-hit queries still appear") {
    import spark.implicits._
    val truth  = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("qid", "cid")
    val approx = Seq((1L, 11L), (1L, 12L)).toDF("qid", "cid")
    val got = Similarity.recallAtK(truth, approx, "qid", "cid", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 1L, 0.5), (2L, 0L, 0.0)))
  }

  test("lshBandedTopK finds an exact duplicate vector (same signature in every band)") {
    import spark.implicits._
    val v = (0 until 64).map(i => (i % 7).toFloat / 7f)
    val w = (0 until 64).map(i => ((i * 3) % 11).toFloat / 11f - 0.5f)
    val corpus = Seq((1L, v), (2L, w), (3L, v)).toDF("cid", "cv")
    val queries = Seq((1L, v)).toDF("qid", "qv")
    val out = Similarity.lshBandedTopK(corpus, "cid", "cv", queries, "qid", "qv",
        k = 5, dims = 64, planesPerBand = 8, bands = 8, exact = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // vec 3 is identical to the query, so it shares every band bucket
    assert(out.contains((1L, 3L)))
    assert(!out.exists(_._2 == 1L)) // self excluded
  }
}
