package graft.llm

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** Byte-pair-encoding tokenizer — the real merge loop over a
  * GPT-2-style `merges.txt` table, replacing the whitespace
  * approximation (`TextAnalysis.bpeishTokenCount`) wherever exact
  * token ids/counts matter: token budgets (llm18), sequence packing
  * (llm15), context-window chunking (llm34).
  *
  * Algorithm (Sennrich et al. 2016, the GPT-2 `bpe()` loop): per
  * pre-tokenized word, start from single code points and repeatedly
  * merge the LOWEST-RANK adjacent pair until none is in the merge
  * table. This implementation merges the leftmost occurrence of the
  * best pair one step at a time and re-selects — equivalent to the
  * reference "merge all occurrences of the best pair per step" loop
  * for any merge table produced by actual BPE training: a pair
  * involving a merged token can only be learned AFTER that token
  * exists, so its rank is always higher than the merge that produced
  * it, and the in-progress pair stays best until exhausted. The
  * single-step form is what a SQL oracle can replay verbatim
  * (llm35's DuckDB recursive CTE).
  *
  * Ids: a single-code-point token is its code point; the token
  * produced by merge rank r is `256 + r` (a deterministic stand-in
  * for the vocab.json id table, which is just another map).
  *
  * 100 TB shape: tokenization is a pure MAP — zero shuffles. The
  * merge table broadcasts once (GPT-2's 50k merges is a few MB, far
  * under broadcast limits) instead of serializing per task closure,
  * and a per-executor memo cache exploits the Zipf word distribution
  * (the hot few thousand words tokenize once per executor, not once
  * per occurrence — the same LRU trick the GPT-2 reference encoder
  * uses). The per-word loop is the irreducible algorithm; it lives
  * behind a UDF because a data-dependent fixpoint is a genuine
  * black-box boundary for Column algebra (same policy as the codec
  * seam in [[Multimodal]]).
  */
object Tokenizer {

  /** Word pre-tokenization: lowercase runs of letters, runs of
    * digits, or one non-alphanumeric code point — chosen to be
    * renderable identically in DuckDB's RE2 (`regexp_extract_all`)
    * and java.util.regex for the oracle replay. */
  val WordPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  private val wordRe = java.util.regex.Pattern.compile(WordPattern)

  /** A loaded merge table. `merges` in rank order (rank = index). */
  final case class Bpe(merges: IndexedSeq[(String, String)]) extends Serializable {
    @transient private lazy val rank: Map[(String, String), Int] =
      merges.iterator.zipWithIndex.toMap
    @transient private lazy val productId: Map[String, Int] =
      merges.iterator.zipWithIndex.map { case ((x, y), i) => (x + y) -> (256 + i) }.toMap
    /** Per-JVM memo: word → ids, two rotating generations of ≤32k
      * entries each (≤64k total). A lookup checks the current
      * generation, then the previous one — a hit there re-promotes
      * the word — so the Zipf HEAD survives rotation while the
      * unbounded cold tail ages out. (The earlier clear-on-overflow
      * design wiped the head along with the tail: at 100-TB scale the
      * distinct-word stream overflows any fixed cap continuously, and
      * every wipe re-tokenized the hot words too — measured in
      * BpeMemoScaleSpec and SCALE.md.) Rotation races are benign: the
      * worst case is one lost cache entry, never a wrong id. */
    @transient private lazy val memoGen = new java.util.concurrent.atomic.AtomicReference(
      (new java.util.concurrent.ConcurrentHashMap[String, Array[Int]](),
       new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()))
    @transient private lazy val memoHits = new java.util.concurrent.atomic.LongAdder
    @transient private lazy val memoMisses = new java.util.concurrent.atomic.LongAdder
    private def memoGenCap: Int = 1 << 15

    /** (hits, misses) since load — the scale spec's measurement. */
    def memoStats: (Long, Long) = (memoHits.sum(), memoMisses.sum())
    /** Resident memo entries across both generations (bound check). */
    def memoSize: Int = { val (c, o) = memoGen.get(); c.size() + o.size() }

    /** One word through the merge loop → token ids. */
    def encodeWord(word: String): Array[Int] = {
      val g @ (curGen, oldGen) = memoGen.get()
      var cached = curGen.get(word)
      if (cached == null) {
        cached = oldGen.get(word)
        if (cached != null) curGen.put(word, cached) // re-promote the hot word
      }
      if (cached != null) { memoHits.increment(); return cached }
      memoMisses.increment()
      val syms = mergeSymbols(word)
      val ids = syms.iterator.map { s =>
        if (s.codePointCount(0, s.length) == 1) s.codePointAt(0)
        else productId.getOrElse(s, -1)
      }.toArray
      val cur = memoGen.get()._1
      if (cur.size() >= memoGenCap)
        // rotate: current becomes old, old is dropped; re-promotion
        // keeps the head resident through the flip
        memoGen.compareAndSet(g, (new java.util.concurrent.ConcurrentHashMap(), cur))
      memoGen.get()._1.put(word, ids)
      ids
    }

    /** The merge loop at the SYMBOL level — the state a BPE TRAINING
      * iteration needs (pair statistics are counted over these, not
      * over ids). Same loop as [[encodeWord]], un-memoized: training
      * runs over the distinct-word table, where every word is seen
      * once. */
    def encodeWordSymbols(word: String): Vector[String] = mergeSymbols(word)

    private def mergeSymbols(word: String): Vector[String] = {
      var syms = codePoints(word)
      var done = false
      while (!done && syms.length > 1) {
        var bestRank = Int.MaxValue
        var bestI = -1
        var i = 0
        while (i < syms.length - 1) {
          val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < bestRank) { bestRank = r; bestI = i }
          i += 1
        }
        if (bestI < 0 || bestRank == Int.MaxValue) done = true
        else syms = syms.patch(bestI, Seq(syms(bestI) + syms(bestI + 1)), 2)
      }
      syms
    }

    /** Whole text: pre-tokenize, encode each word, concatenate. */
    def encode(text: String): Seq[Int] = {
      val m = wordRe.matcher(text.toLowerCase(java.util.Locale.ROOT))
      val out = Seq.newBuilder[Int]
      while (m.find()) out ++= encodeWord(m.group())
      out.result()
    }
  }

  /** Split a word into single-code-point strings (NOT UTF-16 units —
    * DuckDB's `str_split(w, '')` splits code points, and a surrogate
    * half would break id parity on astral characters). */
  private def codePoints(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Parse GPT-2-style `merges.txt` content: optional `#version:`
    * header, then one `x y` pair per line in rank order. Malformed
    * lines fail loudly (a silently skipped merge shifts every
    * later id). */
  def fromMergesText(content: String): Bpe = Bpe(
    content.linesIterator
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map { l =>
        l.split(" ") match {
          case Array(x, y) => (x, y)
          case _ => throw new IllegalArgumentException(s"bad merges.txt line: '$l'")
        }
      }.toIndexedSeq)

  /** Tokenize `textCol` → array of token ids, distributed: the merge
    * table rides one broadcast, the work is map-side only. */
  def tokenIds(spark: SparkSession, bpe: Bpe)(textCol: Column): Column = {
    val b = spark.sparkContext.broadcast(bpe)
    udf((text: String) => if (text == null) Seq.empty[Int] else b.value.encode(text))
      .apply(textCol)
  }

  /** n-token gram strings per document — the token-grain shingle
    * stream (ids '-'-joined per consecutive n-window; a doc shorter
    * than n tokens yields its whole sequence as ONE gram, the
    * positional-gram convention). Built INSIDE the UDF: a Column-side
    * HOF over a UDF result re-evaluates the tokenizer per lambda
    * element once projection collapse inlines it (the llm19 trap —
    * measured 111 s vs 3.6 s for llm157 at sf0.1), while here encode
    * runs once per doc and the gram build is a linear string loop.
    * Same broadcast + memo + map-only shape as [[tokenIds]]. */
  def tokenGramStrings(spark: SparkSession, bpe: Bpe, n: Int)(textCol: Column): Column = {
    val b = spark.sparkContext.broadcast(bpe)
    udf { (text: String) =>
      if (text == null) Seq.empty[String]
      else {
        val ids = b.value.encode(text)
        if (ids.isEmpty) Seq.empty[String]
        else if (ids.length < n) Seq(ids.mkString("-"))
        else ids.sliding(n).map(_.mkString("-")).toSeq
      }
    }.apply(textCol)
  }

  /** xxhash64 (seed 42 — Spark's `xxhash64`) of each n-token gram
    * string, emitted DIRECTLY from the tokenizer UDF — value-identical
    * to `xxhash64` over [[tokenGramStrings]]'s elements, without ever
    * materializing/exploding/re-hashing the gram strings (round-21:
    * llm157's grams only feed hashed decontamination joins, so the
    * strings were pure allocation; the hash computes over the same
    * '-'-joined decimal-id bytes the string path would have produced).
    * Same broadcast + memo + map-only shape as [[tokenIds]]. */
  def tokenGramHashes(spark: SparkSession, bpe: Bpe, n: Int)(textCol: Column): Column = {
    val b = spark.sparkContext.broadcast(bpe)
    udf { (text: String) =>
      if (text == null) Array.empty[Long]
      else {
        val ids = b.value.encode(text)
        if (ids.isEmpty) Array.empty[Long]
        else Tokenizer.gramHashesOf(ids, n)
      }
    }.apply(textCol)
  }

  /** Hash the '-'-joined decimal windows of `ids` without building the
    * strings: assemble each window's ASCII bytes into a reused buffer
    * and XXH64 them with Spark's string seed (42) — bit-identical to
    * `xxhash64(lit(window.mkString("-")))`. */
  private[llm] def gramHashesOf(ids: Seq[Int], n: Int): Array[Long] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    val idArr = ids.toArray
    val idBytes = new Array[Array[Byte]](idArr.length)
    var t = 0
    while (t < idArr.length) {
      idBytes(t) = java.lang.Integer.toString(idArr(t))
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      t += 1
    }
    val windows = if (idArr.length < n) 1 else idArr.length - n + 1
    val w = math.min(n, idArr.length)
    val buf = new Array[Byte](12 * n)
    val out = new Array[Long](windows)
    var i = 0
    while (i < windows) {
      var len = 0
      var j = 0
      while (j < w) {
        if (j > 0) { buf(len) = '-'; len += 1 }
        val bs = idBytes(i + j)
        System.arraycopy(bs, 0, buf, len, bs.length)
        len += bs.length
        j += 1
      }
      out(i) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      i += 1
    }
    out
  }

  /** Per-word token counts → array<int> in word order: the FERTILITY
    * measure (tokens the model spends per pre-tokenized word — the
    * standard tokenizer-fit diagnostic; ~1 means the vocabulary covers
    * the corpus, ≫1 means words shatter into characters). Same
    * broadcast + memo + map-only shape as [[tokenIds]] — the word's
    * id array is already memoized, its length is free. */
  def wordTokenCounts(spark: SparkSession, bpe: Bpe)(textCol: Column): Column = {
    val b = spark.sparkContext.broadcast(bpe)
    udf { (text: String) =>
      if (text == null) Seq.empty[Int]
      else {
        val m = wordRe.matcher(text.toLowerCase(java.util.Locale.ROOT))
        val out = Seq.newBuilder[Int]
        while (m.find()) out += b.value.encodeWord(m.group()).length
        out.result()
      }
    }.apply(textCol)
  }

  /** One BPE TRAINING iteration's statistics: corpus-wide adjacent
    * symbol-pair counts (Sennrich et al. 2016 §3.2 — the argmax of
    * this table is the next merge to learn). Symbols here are the
    * initial state, single characters inside lowercased
    * whitespace-split words; re-running after applying the chosen
    * merge is the full training loop.
    *
    * 100 TB shape — the reason this is NOT a per-document explode:
    * the corpus first collapses to its DISTINCT-WORD frequency table
    * (Zipf: billions of tokens → millions of words), with map-side
    * partial aggregation so the first shuffle moves one (word, count)
    * pair per distinct word per partition. Pair extraction then runs
    * over distinct words only — character positions explode from a
    * codegen'd `sequence`, never per occurrence — and the second
    * shuffle keys on 2-char pairs (alphabet², tiny). Pure Column
    * algebra end-to-end; no UDF, no driver state. Returns
    * (pair, cnt) unordered — callers pick top-k with a TakeOrdered
    * sort-limit, not a full sort. */
  def pairStats(df: org.apache.spark.sql.DataFrame,
                textCol: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val wf = df.select(explode(Dedup.tokens(lower(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    wf.filter(length(col("w")) >= 2)
      .select(col("w"), col("f"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(col("w").substr(col("i"), lit(2)).as("pair"), col("f"))
      .groupBy(col("pair")).agg(sum(col("f")).as("cnt"))
  }

  /** The GENERAL BPE training iteration: adjacent SYMBOL-pair counts
    * under an existing merge table (empty table = iteration 1 over
    * raw code points; after each argmax, append the winner and rerun
    * — that loop IS Sennrich et al.'s algorithm). Words pre-tokenize
    * with [[WordPattern]] — the same split [[Bpe.encode]] applies, so
    * what is learned here is exactly what llm35 consumes. Pairs are
    * space-joined symbol pairs ("t h", then "th e", …), the
    * merges.txt line format.
    *
    * 100 TB shape: the corpus collapses to the distinct-word
    * frequency table first (Zipf), the merge loop runs once per
    * DISTINCT word (UDF at the data-dependent-fixpoint boundary,
    * merge table broadcast — same policy as [[tokenIds]]), and the
    * final shuffle keys are short symbol pairs. Each training
    * iteration is one scan of the word table, never of the corpus. */
  def symbolPairStats(spark: SparkSession, df: org.apache.spark.sql.DataFrame,
                      textCol: Column, bpe: Bpe): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val b = spark.sparkContext.broadcast(bpe)
    val symsUdf = udf((w: String) =>
      if (w == null) Vector.empty[String] else b.value.encodeWordSymbols(w))
    val wf = df.select(explode(
        regexp_extract_all(lower(textCol), lit(WordPattern), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    // bind the UDF to a real column BEFORE the pair lambda references
    // it (round-6 rule: expressions inside HOF lambdas re-evaluate per
    // element with no CSE)
    wf.withColumn("syms", symsUdf(col("w")))
      .filter(size(col("syms")) >= 2)
      .select(col("f"), explode(transform(
        sequence(lit(0), size(col("syms")) - 2),
        i => concat(element_at(col("syms"), i + 1), lit(" "),
                    element_at(col("syms"), i + 2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("f")).as("cnt"))
  }
}
