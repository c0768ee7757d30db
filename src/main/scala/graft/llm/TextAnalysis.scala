package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Text-analysis operators for corpus curation: token stats, quality
  * scoring, language id, content fingerprinting. All pure Column
  * algebra — they run inside WholeStageCodegen over the document scan,
  * which is what makes them viable as a single pass over 100 TB.
  *
  * Ratio outputs are double divisions of exact integer counts: a single
  * IEEE op, bit-reproducible across engines (unlike summed doubles).
  */
object TextAnalysis {

  def tokens(text: Column): Column = Dedup.tokens(text)

  def tokenCount(text: Column): Column = size(tokens(text))

  def charCount(text: Column): Column = length(text)

  /** Mean token length. */
  def meanTokenLen(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  /** Non-alphanumeric (punctuation/symbol) density per character. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Stopword ratio against a small built-in English list — the
    * length/punct/stopword trio is the classic C4-style quality gate. */
  val stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "on")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    size(filter(toks, t => t.isin(stopwords.map(lit(_)): _*))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Composite quality heuristic in [0,1]: reward length up to 64
    * tokens, penalize punctuation-heavy text. */
  def qualityScore(text: Column): Column =
    (least(tokenCount(text), lit(64)).cast("double") / lit(64.0)) *
      (lit(1.0) - punctRatio(text))

  /** Deterministic marker-token language id: score each language by
    * marker hits, pick the argmax (ties by language code). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die"),
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "y", "los"),
    "fr" -> Seq("le", "et", "les"))

  def langScore(text: Column, markers: Seq[String]): Column = {
    val toks = tokens(lower(text))
    size(filter(toks, t => t.isin(markers.map(lit(_)): _*)))
  }

  /** Greedy argmax with first-wins ties, built as a when-chain so the
    * exact same CASE expression is writable in any SQL dialect: lang i
    * wins iff its score >= every later language's score (equivalent to
    * first-index argmax). All-zero scores → "unknown". */
  def langId(text: Column): Column =
    langIdFromScores(langMarkers.map { case (lang, m) => lang -> langScore(text, m) })

  /** The argmax chain over PRECOMPUTED per-language scores — the seam
    * callers use when scores for several text slices derive from one
    * tokenization (marker counts are additive over a token-array
    * split, so a half/half consistency check computes head+tail
    * counts once and feeds three chains from them). */
  def langIdFromScores(scores: Seq[(String, Column)]): Column = {
    val allZero = scores.map(_._2).reduce(_ + _) === 0
    val chain = scores.zipWithIndex.init.foldRight(lit(scores.last._1)) {
      case (((lang, s), i), rest) =>
        val laterMax = scores.drop(i + 1).map(_._2)
        when(laterMax.map(s >= _).reduce(_ && _), lang).otherwise(rest)
    }
    when(allZero, "unknown").otherwise(chain)
  }

  /** Document fingerprint: min token hash (winnowing-lite, k=1) — an
    * 8-byte content sketch; see Dedup.minhashSignature for the k-wide
    * generalization. */
  def fingerprintMin(text: Column): Column =
    array_min(transform(tokens(text), t => Portable.hash64(t)))

  /** Word n-grams (space-joined) from a token-array column — the unit
    * of repetition measurement. Built by zipping n aligned slices of
    * the array, so `toks` is evaluated a constant number of times per
    * row, never per element. (The naive transform(sequence(1, T-n+1),
    * i => element_at(toks, i+j)) form re-runs the whole expression
    * behind `toks` for EVERY n-gram position — higher-order-function
    * lambdas are interpreted with no subexpression reuse — making the
    * pass O(tokens²) per document when `toks` is the tokenizer itself:
    * measured 108 s vs ~1 s at sf0.1 for the repetition query.)
    * A document shorter than n tokens yields an empty array. */
  def ngramsOfTokens(toks: Column, n: Int): Column = {
    require(n >= 2, "use tokens() for 1-grams")
    val len = greatest(size(toks) - (n - 1), lit(0))
    (2 to n).foldLeft(slice(toks, lit(1), len)) { (acc, j) =>
      zip_with(acc, slice(toks, lit(j), len), (a, b) => concat(a, lit(" "), b))
    }
  }

  /** Word n-grams straight from text; prefer binding `tokens(text)` to
    * a real column first (one tokenizer run per row) when computing
    * several gram orders over the same document. */
  def wordNgrams(text: Column, n: Int): Column = ngramsOfTokens(tokens(text), n)

  /** Fraction of array elements that are repeats of an earlier
    * element: (len − distinct)/len, 0 for empty. Exact integer counts
    * and ONE IEEE division — bit-reproducible across engines. */
  def dupFraction(arr: Column): Column =
    when(size(arr) <= 0, lit(0.0))
      .otherwise((size(arr) - size(array_distinct(arr))).cast("double") /
        size(arr).cast("double"))

  /** Gopher-style repetition gate (Rae et al. 2021, table A1 shape):
    * drop documents dominated by repeated tokens / 2-grams / 3-grams —
    * boilerplate, keyword stuffing, and degenerate generations all
    * light these up. Thresholds are corpus-tunable; the stats are a
    * single codegen'd projection over the scan. */
  def repetitionGate(text: Column,
                     maxDupTokenFrac: Double = 0.7,
                     maxDup2gramFrac: Double = 0.2,
                     maxDup3gramFrac: Double = 0.15): Column =
    (dupFraction(tokens(text)) <= maxDupTokenFrac) &&
      (dupFraction(wordNgrams(text, 2)) <= maxDup2gramFrac) &&
      (dupFraction(wordNgrams(text, 3)) <= maxDup3gramFrac)

  /** Top-k characteristic terms per document, TF-IDF-flavored but with
    * INTEGER-EXACT ordering: rank by (term frequency desc, document
    * frequency asc, term asc). For a fixed tf, idf-ranking is monotone
    * in 1/df, so the (tf, df) lexicographic order is the
    * transcendental-free version of tf·log(N/df) — engine-portable
    * where a floating log is not (cross-engine libm drift would flip
    * near-tie ranks). One explode + two hash aggregations + one
    * window; the shuffle keys are the term strings (bounded by the
    * vocabulary, not the corpus). Returns (doc_id, rank, term, tf, df).
    */
  def topTerms(df: org.apache.spark.sql.DataFrame, idCol: Column,
               textCol: Column, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(idCol.as("doc_id"), explode(tokens(textCol)).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"))
  }

  /** Per-document TF-IDF keyword extraction — the SCALAR-score sibling
    * of [[topTerms]]: where topTerms ranks lexicographically by
    * (tf desc, df asc) — which can never prefer a rarer lower-tf term —
    * this ranks by an actual tf·idf product, so a tf=2 term seen in 3
    * documents outranks a tf=3 term seen in most of the corpus. The
    * idf is the BM25-style RATIONAL odds (N − df + 0.5)/(df + 0.5)
    * (monotone in the classic log-idf; same engine-portability
    * argument as Retrieval.RatioIdf: sums/divisions of small integers
    * are correctly-rounded IEEE on every engine, a floating `ln` is
    * not), and the score is quantized to integer 1e-6 steps BEFORE the
    * rank so near-tie ordering can't flip across engines.
    *
    * 100 TB shape: one token explode; (doc, term) and (term)
    * aggregations — the only string shuffles, bounded by corpus tokens
    * and vocabulary respectively; the one-row corpus count broadcasts;
    * the top-k window partitions by doc_id (no global sort). Returns
    * (doc_id, rank, term, tf, doc_freq, score_q). */
  def tfidfKeywords(df: org.apache.spark.sql.DataFrame, idCol: Column,
                    textCol: Column, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(idCol.as("doc_id"), explode(tokens(textCol)).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
    val n = df.agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("score_q",
        floor(col("tf").cast("double") *
          ((col("__n").cast("double") - col("doc_freq").cast("double") + lit(0.5)) /
           (col("doc_freq").cast("double") + lit(0.5))) * lit(1000000.0)).cast("long"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_q").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"),
        col("doc_freq"), col("score_q"))
  }

  /** GPT-2-style pre-tokenizer pattern (simplified to the portable
    * RE2 ∩ Java-regex subset): contractions, letter runs, digit runs,
    * and symbol runs, each with an optional leading space. Whitespace
    * itself is not a token. */
  val BpeishPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+"

  /** Token count under the BPE-ish pre-tokenizer — the cheap proxy for
    * "how many LLM tokens is this document" used in data-pipeline
    * budget accounting (whitespace `tokenCount` undercounts code and
    * punctuation-dense text). */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeishPattern))

  // ------------------------------------------------------------------
  // Gopher document-quality rules (Rae et al. 2021, appendix A —
  // the public web-corpus filter set) as pure Column algebra: every
  // metric is exact integer counts + ONE IEEE division, so the gate
  // is bit-reproducible across engines and runs inside
  // WholeStageCodegen over the scan.

  /** The paper's required-stopword list: a document must contain at
    * least 2 of these to pass (filters keyword lists / non-English). */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Fraction of words containing at least one alphabetic char. */
  def alphaWordFrac(text: Column): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** (# '#' chars + # '...' runs) per word — the paper's
    * symbol-to-word ratio. */
  def symbolWordRatio(text: Column): Column = {
    val hashes = length(text) - length(translate(text, "#", ""))
    val ellipses = (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / lit(3)
    (hashes + ellipses).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")
  }

  /** Fraction of lines starting with a bullet marker. */
  def bulletLineFrac(text: Column): Column = {
    val lines = split(text, "\n")
    size(filter(lines, l => substring(ltrim(l), 1, 1).isin("-", "*", "•")))
      .cast("double") / greatest(size(lines), lit(1)).cast("double")
  }

  /** Fraction of lines ending with an ellipsis. */
  def ellipsisLineFrac(text: Column): Column = {
    val lines = split(text, "\n")
    size(filter(lines, l => rtrim(l).endsWith("...") || rtrim(l).endsWith("…")))
      .cast("double") / greatest(size(lines), lit(1)).cast("double")
  }

  /** How many of [[gopherStopwords]] appear in the document. */
  def gopherStopwordHits(text: Column): Column = {
    val toks = tokens(lower(text))
    gopherStopwords.map(w => when(array_contains(toks, w), 1).otherwise(0))
      .reduce(_ + _)
  }

  /** The full rule set as one boolean gate. Defaults are the paper's
    * thresholds; corpus-tunable like [[repetitionGate]]. */
  def gopherPass(nWords: Column, meanLen: Column, symRatio: Column,
                 bulletFrac: Column, ellipsisFrac: Column, alphaFrac: Column,
                 stopHits: Column,
                 minWords: Int = 50, maxWords: Int = 100000,
                 minStopHits: Int = 2): Column =
    nWords.between(minWords, maxWords) && meanLen.between(3.0, 10.0) &&
      (symRatio < 0.1) && (bulletFrac < 0.9) && (ellipsisFrac < 0.3) &&
      (alphaFrac > 0.8) && (stopHits >= minStopHits)

  // ------------------------------------------------------------------
  // C4-style line-level cleaning (Raffel et al. 2020, the public C4
  // pipeline): keep lines that look like prose sentences, drop
  // boilerplate lines, report the per-document survival stats.

  /** Keep predicate for one line: ends in terminal punctuation, has
    * at least `minWords` words, and carries none of the boilerplate
    * markers (code braces, "javascript" warnings, lorem ipsum). */
  private def c4Keep(l: Column, minWords: Int): Column =
    substring(rtrim(l), -1, 1).isin(".", "!", "?", "\"") &&
      (size(filter(split(l, "\\s+"), w => length(w) > 0)) >= minWords) &&
      !lower(l).contains("javascript") && !lower(l).contains("lorem ipsum") &&
      !l.contains("{")

  /** The surviving lines, joined back with newlines. */
  def c4CleanText(text: Column, minWords: Int = 3): Column =
    array_join(filter(split(text, "\n"), l => c4Keep(l, minWords)), "\n")

  /** Per-document line counts before/after the C4 line filter. */
  def c4LineCounts(text: Column, minWords: Int = 3): (Column, Column) = {
    val lines = split(text, "\n")
    (size(lines), size(filter(lines, l => c4Keep(l, minWords))))
  }

  // ------------------------------------------------------------------
  // Hashed-feature linear quality classifier — the model-based filter
  // of the GPT-3/CCNet pipelines (score web docs against a trained
  // linear model over hashed bag-of-words features) in its
  // inference-time shape. Training happens offline; what the corpus
  // pass needs is the SCORING operator, and its 100 TB form is a pure
  // map: every token hashes into one of `dims` buckets and the
  // document's logit is the sum of its buckets' weights.
  //
  // Weights are DERIVED, not stored: w(b) = hash64("w<salt>:" + b)
  // mod 1001 − 500 — any real weight vector quantized to integers
  // plugs in the same way (ship it as a broadcast array; the formula
  // here doubles as a deterministic stand-in any engine can
  // recompute, which is what makes the logit oracle-checkable).
  // Integer weights ⇒ the logit is an EXACT integer sum — no
  // transcendental sigmoid crosses the engine boundary; thresholding
  // the logit is order-equivalent to thresholding the probability.

  /** Per-document integer logit over `dims` hashed buckets. */
  def hashedLinearLogit(text: Column, dims: Int = 1024, salt: String = "q"): Column = {
    val toks = tokens(lower(text))
    // one interpreted lambda over the token array; the hash chain
    // inside is the portable digest, same policy as fingerprintMin
    aggregate(
      transform(toks, t =>
        pmod(Portable.hash64(concat(lit(s"w$salt:"),
          pmod(Portable.hash64(t), lit(dims.toLong)))), lit(1001L)) - 500L),
      lit(0L), (acc, w) => acc + w)
  }

  /** Keep gate: documents whose logit clears `minLogit`. */
  def hashedLinearGate(text: Column, minLogit: Long,
                       dims: Int = 1024, salt: String = "q"): Column =
    hashedLinearLogit(text, dims, salt) >= minLogit

  /** Hashed bag-of-words features: one row per (id, bucket) with the
    * token count, bucket = portable-hash(token) mod dims. The hash
    * runs in a codegen'd projection AFTER the explode (never inside a
    * higher-order lambda — the no-CSE rule), and the aggregate
    * combines map-side, so the shuffle carries ≤ docs·dims fixed-width
    * rows regardless of document length. */
  def hashedFeatures(docs: DataFrame, idCol: Column, textCol: Column,
                     dims: Int = 1024): DataFrame =
    docs.select(idCol.as("__id"), explode(tokens(lower(textCol))).as("__tok"))
      .select(col("__id"),
        pmod(Portable.hash64(col("__tok")), lit(dims.toLong)).as("bucket"))
      .groupBy(col("__id"), col("bucket")).agg(count(lit(1)).as("cnt"))

  /** One distributed BATCH-PERCEPTRON training step for the hashed
    * linear quality classifier — the TRAINING companion to
    * [[hashedLinearLogit]]'s inference. Labels are ±1; a document is
    * misclassified when sign(Σ cnt·w) ≠ y (score 0 predicts −1); the
    * update is w′[b] = w[b] + Σ_misclassified y·cnt[b]. Every number
    * is an exact integer — no learning-rate float, no transcendental
    * loss — so any engine replays the learned weights bit-for-bit
    * (the perceptron's classic integer form; logistic GD would put a
    * sigmoid on the engine boundary). Iterate by feeding the result
    * back in; weights converge for separable data by the perceptron
    * convergence theorem.
    *
    * Scale shape: one corpus scan builds the hashed features; scoring
    * joins the ≤dims-row weight table BROADCAST (never a corpus
    * shuffle on weights); the misclassified filter is a semi-join on
    * the doc id; the gradient is ONE (bucket) hash aggregate surviving
    * map-side combine to ≤dims rows. The feature frame feeds BOTH the
    * scoring and gradient branches, so it is materialized once per
    * step ([[graft.operators.Materialize.eagerOrCheckpoint]] — pass a
    * `tracker` and release after the run, or a `checkpointDir` for a
    * reliable multi-hour job) instead of re-deriving the corpus scan. */
  def perceptronStep(docs: DataFrame, idCol: Column, textCol: Column,
                     labelCol: Column, weights: Option[DataFrame],
                     dims: Int = 1024,
                     checkpointDir: Option[String] = None,
                     tracker: Option[graft.operators.Materialize.Tracker] = None): DataFrame = {
    val labels = materialized(
      docs.select(idCol.as("__id"), labelCol.cast("long").as("__y")),
      checkpointDir, tracker)
    val feats = materialized(
      hashedFeatures(docs, idCol, textCol, dims), checkpointDir, tracker)
    stepOnFeatures(feats, labels, weights)
  }

  /** Multi-epoch [[perceptronStep]]: the feature and label frames are
    * built and materialized ONCE and every epoch reuses them — the
    * corpus is scanned a single time regardless of the epoch count;
    * each epoch then costs one broadcast-scored pass + one gradient
    * aggregate over the fixed-width feature rows. Between epochs the
    * ≤dims-row weight table hops the driver as a literal frame (the
    * bounded model hop — [[Clustering.kmeansTopics]]' centroid
    * convention): the step wires the weights into TWO plan branches
    * (scoring and the final merge), so chaining lazy frames would
    * DOUBLE the logical plan per epoch. */
  def perceptronTrain(docs: DataFrame, idCol: Column, textCol: Column,
                      labelCol: Column, epochs: Int,
                      dims: Int = 1024,
                      checkpointDir: Option[String] = None,
                      tracker: Option[graft.operators.Materialize.Tracker] = None): DataFrame = {
    require(epochs >= 1, "need at least one epoch")
    val labels = materialized(
      docs.select(idCol.as("__id"), labelCol.cast("long").as("__y")),
      checkpointDir, tracker)
    val feats = materialized(
      hashedFeatures(docs, idCol, textCol, dims), checkpointDir, tracker)
    val sp = docs.sparkSession
    import sp.implicits._
    (1 to epochs).foldLeft(Option.empty[DataFrame]) { (w, i) =>
      val next = stepOnFeatures(feats, labels, w)
      if (i == epochs) Some(next)
      else Some(next.collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1))).toDF("bucket", "w"))
    }.get
  }

  private def materialized(df: DataFrame, checkpointDir: Option[String],
                           tracker: Option[graft.operators.Materialize.Tracker]): DataFrame = {
    val m = graft.operators.Materialize.eagerOrCheckpoint(df, checkpointDir)
    tracker.foreach(_.track(m))
    m
  }

  private def stepOnFeatures(feats: DataFrame, labels: DataFrame,
                             weights: Option[DataFrame]): DataFrame = {
    val w = weights.getOrElse(
      feats.sparkSession.range(0).select(col("id").as("bucket"), col("id").as("w")))
    val scored = feats.join(broadcast(w), Seq("bucket"), "left")
      .groupBy(col("__id"))
      .agg(sum(col("cnt") * coalesce(col("w"), lit(0L))).as("__score"))
      .join(labels, Seq("__id"))
    val mis = scored.filter(
      (col("__score") > 0 && col("__y") < 0) || (col("__score") <= 0 && col("__y") > 0))
    val grad = feats.join(labels, Seq("__id"))
      .join(mis.select(col("__id")), Seq("__id"), "left_semi")
      .groupBy(col("bucket")).agg(sum(col("__y") * col("cnt")).as("__dw"))
    w.join(grad, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        (coalesce(col("w"), lit(0L)) + coalesce(col("__dw"), lit(0L))).as("w"))
      .filter(col("w") =!= 0L)
  }

  /** Unicode SCRIPT PROFILE + homoglyph flag — the spam/poisoning
    * gate the marker-based [[langId]] structurally cannot see: a doc
    * whose Latin words carry a few Cyrillic look-alike letters
    * (а е о с homoglyphs — SEO cloaking, dedup evasion, phishing
    * corpora) profiles as mixed-script even though every marker word
    * still matches. Counts per script family come from
    * length-difference over regexp_replace character classes — ONE
    * codegen projection, no per-char explode, no UDF; any engine
    * with the same character classes replays the integers exactly.
    * `homoglyph` flags Latin-dominant docs carrying a nonzero
    * Cyrillic minority — the sprinkle signature (an actually-Russian
    * doc is Cyrillic-DOMINANT and stays clean). */
  def scriptProfile(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    def strip(cls: String): Column =
      length(regexp_replace(col("__t"), cls, ""))
    df.select(idCol.as("doc_id"), textCol.as("__t"))
      .where(col("__t").isNotNull)
      .select(col("doc_id"),
        length(col("__t")).cast("long").as("n_chars"),
        (length(col("__t")) - strip("[A-Za-z]")).cast("long").as("n_latin"),
        (length(col("__t")) - strip("[Ѐ-ӿ]")).cast("long").as("n_cyrillic"),
        (length(col("__t")) - strip("[一-鿿]")).cast("long").as("n_cjk"),
        (length(col("__t")) - strip("[0-9]")).cast("long").as("n_digit"))
      .withColumn("dominant",
        // a doc with ZERO chars in all three families (pure digits,
        // Arabic, Hangul, …) is 'other', not 'latin' — the tri-state
        // tie-break alone would mislabel it and mislead a downstream
        // gate keyed on dominant='latin' (round-17 advice)
        when(col("n_latin") === 0 && col("n_cyrillic") === 0 &&
             col("n_cjk") === 0, "other")
          .when(col("n_latin") >= col("n_cyrillic") && col("n_latin") >= col("n_cjk"), "latin")
          .when(col("n_cyrillic") >= col("n_cjk"), "cyrillic")
          .otherwise("cjk"))
      .withColumn("homoglyph",
        col("n_latin") > col("n_cyrillic") * 4 && col("n_cyrillic") > 0)
  }

  /** Characters the obfuscation fold deletes (zero-width space /
    * non-joiner / joiner, BOM) before tokenizing — the classic
    * blocklist-evasion insertions. */
  val ZeroWidth = "\u200b\u200c\u200d\ufeff"

  /** Leet-speak fold map applied per token: digits and symbols that
    * visually substitute letters map back (0→o 1→i 3→e 4→a 5→s 7→t
    * 8→b @→a $→s). */
  val LeetFrom = "0134578@$"
  val LeetTo   = "oieastbas"

  /** BLOCKLIST GATE with obfuscation folding — the C4 "badwords"
    * curation stage (Raffel et al. 2020 §2.2 drops any page with a
    * blocklisted word), hardened against the two evasions a naive
    * token match misses: zero-width insertions (`gp​u`) and
    * leet substitutions (`m0d3l`, `7oxic`). The fold is
    * normalization-then-match: strip zero-width chars, lowercase,
    * split on non-token chars (digits/@/$ stay INSIDE tokens so the
    * leet fold can see them), map each token through the leet table,
    * and match against the blocklist.
    *
    * Reference scope: the reference ships no content gating; this is
    * the training-data curation surface next to [[gopherGates]] /
    * the C4 line cleaner.
    *
    * Scale shape (100 TB): the whole gate is ONE codegen projection
    * over the scan feeding ONE hash aggregate — tokenize/fold/match
    * are higher-order array ops on the text column where it already
    * sits, the blocklist is a constant-folded literal array, which-
    * terms-matched is a per-doc BITMASK (bit i = blocklist(i)
    * present) folded per source with bit_or, so distinct-term
    * counting needs no explode, no second corpus pass, and no
    * string shuffle keys: the only rows reaching the exchange are
    * (source, hits, flag, mask) — four fixed-width fields per doc,
    * map-side combined. The ≤64-term mask covers a per-language
    * blocklist tier; a larger list swaps the mask for an
    * explode(array_intersect)+countDistinct leg or a broadcast join
    * after explode — same scan, one extra narrow shuffle.
    *
    * @return one row per source:
    *   (source, n_docs, flagged, hits, n_terms, flag_pct) */
  def blocklistGate(df: DataFrame, sourceCol: Column, textCol: Column,
                    blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty && blocklist.size <= 64,
      "bitmask gate covers <=64 terms; see scaladoc for the large-list variant")
    val bl = array(blocklist.map(lit): _*)
    val toks = split(lower(translate(textCol, ZeroWidth, "")), "[^a-z0-9@$]+")
    // bits are disjoint, so + is bitwise-or
    val mask = blocklist.zipWithIndex.map { case (term, i) =>
      when(array_contains(col("__ft"), term), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.select(
        sourceCol.as("source"),
        transform(toks, t => translate(t, LeetFrom, LeetTo)).as("__ft"))
      .select(col("source"),
        size(filter(col("__ft"), t => array_contains(bl, t))).cast("long").as("hits"),
        mask.as("mask"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("hits") > 0, 1L).otherwise(0L)).as("flagged"),
        sum(col("hits")).as("hits"),
        expr("bit_count(bit_or(mask))").cast("long").as("n_terms"))
      .withColumn("flag_pct", expr("flagged * 100 DIV n_docs"))
  }

  /** ENCODING-DAMAGE (mojibake) AUDIT — the transcoding-debris gate
    * crawl pipelines run before any text analysis, catching the three
    * signatures of a mangled decode:
    *
    *  - U+FFFD replacement characters (a decoder already gave up);
    *  - C1 control codepoints U+0080–U+009F (cp1252/latin-1 bytes
    *    mis-promoted to codepoints — never legitimate in text);
    *  - `Ã` + U+00A0–U+00BF pairs (UTF-8 two-byte sequences for the
    *    Latin-1 block read AS latin-1: `é` → `Ã©` — the classic
    *    double-encode).
    *
    * A damaged doc poisons tokenizers and dedup hashes alike, so the
    * audit reports per-source damage rates for gating or re-decode
    * routing.
    *
    * Scale shape (100 TB): one codegen projection over the scan —
    * three counters from length-difference / regexp_extract_all on
    * the text where it sits — feeding one hash aggregate; the
    * exchange carries (source, four ints) per doc, map-side combined.
    *
    * @return one row per source: (source, n_docs, damaged,
    *   repl_chars, c1_chars, dbl_seqs, damaged_pct) */
  def encodingAudit(df: DataFrame, sourceCol: Column, textCol: Column): DataFrame =
    df.select(sourceCol.as("source"),
        (length(textCol) -
          length(replace(textCol, lit("\uFFFD"), lit("")))).cast("long").as("repl"),
        (length(textCol) -
          length(regexp_replace(textCol, "[\\u0080-\\u009F]", ""))).cast("long").as("c1"),
        size(regexp_extract_all(textCol,
          lit("\\u00C3[\\u00A0-\\u00BF]"), lit(0))).cast("long").as("dbl"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("repl") + col("c1") + col("dbl") > 0, 1L).otherwise(0L)).as("damaged"),
        sum(col("repl")).as("repl_chars"),
        sum(col("c1")).as("c1_chars"),
        sum(col("dbl")).as("dbl_seqs"))
      .withColumn("damaged_pct", expr("damaged * 100 DIV n_docs"))

  /** LANGUAGE-RUN SEGMENTATION — the routing stage after
    * [[mixedLanguage]]-style detection: split a mixed-language
    * document into contiguous single-language RUNS so each can route
    * to its language-specific pipeline (lang-id per marker token,
    * islands over consecutive marker positions, runs shorter than
    * `minRun` dropped as noise — scattered lone markers never form a
    * run). Marker-based like [[langId]]: deterministic, oracle-
    * replayable, and honest about coverage (non-marker tokens carry
    * no evidence and do not break a run's consecutiveness test
    * because islands group CONSECUTIVE POSITIONS of one language).
    *
    * Scale shape (100 TB): the token explode filters to MARKER rows
    * immediately — a few percent of tokens — so the exchange carries
    * (doc, pos, 2-char lang) for markers only; islands are one
    * window + one aggregate over those rows (llm119's trick).
    *
    * @return (doc_id, lang, start_pos, run_len, run_idx) */
  def languageRuns(df: DataFrame, idCol: Column, textCol: Column,
                   minRun: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val langOf = (t: Column) =>
      langMarkers.foldRight(lit("xx")) { case ((lang, ms), rest) =>
        when(t.isin(ms.map(lit(_)): _*), lang).otherwise(rest)
      }
    val markers = df
      .select(idCol.as("doc_id"), posexplode(tokens(textCol)).as(Seq("__p0", "__tok")))
      .select(col("doc_id"), (col("__p0") + 1).as("pos"),
        langOf(col("__tok")).as("lang"))
      .where(col("lang") =!= "xx")
    markers
      .withColumn("__grp", col("pos") - row_number().over(
        Window.partitionBy(col("doc_id"), col("lang")).orderBy(col("pos"))))
      .groupBy(col("doc_id"), col("lang"), col("__grp"))
      .agg(min(col("pos")).as("start_pos"), count(lit(1)).as("run_len"))
      .filter(col("run_len") >= minRun)
      .withColumn("run_idx", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("start_pos"))))
      .select(col("doc_id"), col("lang"), col("start_pos"),
        col("run_len"), col("run_idx"))
  }

  /** Per-document encoding-damage count — [[encodingAudit]]'s three
    * signatures as one Column (for funnels that gate per doc). */
  def encodingDamage(text: Column): Column =
    (length(text) - length(replace(text, lit("\uFFFD"), lit("")))).cast("long") +
    (length(text) - length(regexp_replace(text, "[-]", ""))).cast("long") +
    size(regexp_extract_all(text, lit("Ã[ -¿]"), lit(0))).cast("long")

  /** Per-document blocklist hit count with the [[blocklistGate]]
    * obfuscation folds — zero-width strip, lowercase, leet map.
    * Round-21: the leet fold + membership test run as ONE JVM scan
    * over the codegen'd token split — the transform/filter HOF
    * lambdas evaluate INTERPRETED (the round-20 structural finding),
    * paying a boxed expression-tree eval per token. The tokenize
    * itself (translate/lower/split) stays in codegen'd builtins, so
    * the only thing the UDF sees is the token array. Composed-form
    * equality is pinned in TextGatePropertySpec. */
  def blocklistHits(text: Column, blocklist: Seq[String]): Column = {
    val toks = split(lower(translate(text, ZeroWidth, "")), "[^a-z0-9@$]+")
    val blSet = blocklist.toSet
    val f = udf((ts: scala.collection.Seq[String]) =>
      if (ts == null) null.asInstanceOf[java.lang.Long]
      else {
        var n = 0L
        val it = ts.iterator
        while (it.hasNext) if (blSet.contains(leetFold(it.next()))) n += 1
        java.lang.Long.valueOf(n)
      })
    f(toks)
  }

  /** The pre-round-21 column-algebra form of [[blocklistHits]] — the
    * contract the equality pin replays. */
  private[llm] def blocklistHitsComposed(text: Column, blocklist: Seq[String]): Column = {
    val bl = array(blocklist.map(lit): _*)
    val toks = split(lower(translate(text, ZeroWidth, "")), "[^a-z0-9@$]+")
    size(filter(transform(toks, t => translate(t, LeetFrom, LeetTo)),
      t => array_contains(bl, t))).cast("long")
  }

  /** JVM mirror of `translate(t, LeetFrom, LeetTo)` (both tables are
    * ASCII single chars, so char-level mapping is exact). */
  private[llm] def leetFold(t: String): String = {
    val sb = new java.lang.StringBuilder(t.length)
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      val j = LeetFrom.indexOf(c)
      sb.append(if (j >= 0) LeetTo.charAt(j) else c)
      i += 1
    }
    sb.toString
  }

  /** Per-document generation-loop flag: true when the fraction of
    * tokens equal to the token p positions earlier reaches
    * `thresholdPct` for any period p ≤ maxPeriod. Division-free —
    * the comparison is m_p·100 ≥ threshold·(n−p), pure integers, so
    * any engine replays the flag exactly.
    * Round-21: one JVM scan over the token array — the composed form
    * paid interpreted slice+zip_with+aggregate lambdas PER PERIOD
    * (4× the token stream through boxed HOF eval). Composed-form
    * equality is pinned in TextGatePropertySpec. */
  def loopFlag(toks: Column, maxPeriod: Int, thresholdPct: Int): Column = {
    val f = udf((ts: scala.collection.Seq[String]) =>
      if (ts == null) null.asInstanceOf[java.lang.Boolean]
      else java.lang.Boolean.valueOf(loopFlagJvm(ts, maxPeriod, thresholdPct)))
    f(toks)
  }

  /** The pre-round-21 column-algebra form of [[loopFlag]] — the
    * contract the equality pin replays. */
  private[llm] def loopFlagComposed(toks: Column, maxPeriod: Int, thresholdPct: Int): Column = {
    val n = size(toks).cast("long")
    (1 to maxPeriod).map { p =>
      val len = greatest(size(toks) - p, lit(0))
      val m = aggregate(
        zip_with(slice(toks, lit(p + 1), len), slice(toks, lit(1), len),
          (a, b) => when(a === b, lit(1L)).otherwise(lit(0L))),
        lit(0L), (s, x) => s + x)
      (n > p) && (m * 100 >= lit(thresholdPct.toLong) * (n - p))
    }.reduce(_ || _)
  }

  /** Per-period repeated-token match counts m_p for p = 1..maxPeriod
    * in one pass — the shared JVM floor of [[loopFlag]] and
    * [[degeneracyAudit]] (m_p = |{i : toks(i) == toks(i−p)}|; 0 when
    * n ≤ p, matching the composed form's `when(n > p, …).otherwise(0)`). */
  private[llm] def loopMatchCountsJvm(ts: scala.collection.Seq[String],
                                      maxPeriod: Int): Array[Long] = {
    val arr = ts match {
      case is: scala.collection.IndexedSeq[String] => is
      case other => other.toIndexedSeq
    }
    val n = arr.length
    val out = new Array[Long](maxPeriod)
    var p = 1
    while (p <= maxPeriod) {
      var m = 0L
      var i = p
      while (i < n) {
        if (arr(i) == arr(i - p)) m += 1
        i += 1
      }
      out(p - 1) = m
      p += 1
    }
    out
  }

  private[llm] def loopFlagJvm(ts: scala.collection.Seq[String],
                               maxPeriod: Int, thresholdPct: Int): Boolean = {
    val n = ts.length
    val arr = ts match {
      case is: scala.collection.IndexedSeq[String] => is
      case other => other.toIndexedSeq
    }
    var p = 1
    while (p <= maxPeriod) {
      if (n > p) {
        var m = 0L
        var i = p
        while (i < n) {
          if (arr(i) == arr(i - p)) m += 1
          i += 1
        }
        if (m * 100 >= thresholdPct.toLong * (n - p)) return true
      }
      p += 1
    }
    false
  }

  /** GENERATION-LOOP (tandem-repeat) DEGENERACY AUDIT — the
    * synthetic-data gate: model generations that collapse into a loop
    * ("buy buy buy…", "spam ham spam ham…") carry a near-1 fraction
    * of tokens equal to the token p positions earlier, for the loop's
    * period p. Per doc the audit computes that match fraction for
    * p = 1..maxPeriod (aligned-slice zip, the [[ngramsOfTokens]]
    * discipline — `toks` evaluated a constant number of times, never
    * per element), takes the max as `loop_pct`, its first-max argmax
    * as the period, and flags docs at `threshold`. Natural prose
    * scores low at every small period; [[repetitionGate]]'s GLOBAL
    * duplicate fractions can't see short loops in a long doc, and a
    * loop isn't a duplicated SPAN across docs — this is the in-doc
    * periodicity detector.
    *
    * Per-source the audit adds distinct-bigram diversity
    * (distinct 2-grams ×100 DIV total) — the corpus-grain mode-
    * collapse signal for synthetic sets (each doc can be internally
    * clean while the SET repeats itself).
    *
    * Scale shape (100 TB): the loop stats are one codegen projection
    * into one hash aggregate of (source, three ints)/doc; the
    * diversity leg explodes 8-byte GRAM HASHES (never gram strings)
    * into two hash aggregates — the corpus-pass floor the gram
    * family pays. Two scans of the text by design: materializing the
    * tokenized corpus to save a scan would write ~corpus-size state.
    *
    * @return (source, n_docs, degenerate, deg_p1, max_loop_pct,
    *          distinct2_pct) */
  def degeneracyAudit(df: DataFrame, sourceCol: Column, textCol: Column,
                      maxPeriod: Int = 4, threshold: Int = 30): DataFrame = {
    require(maxPeriod >= 2, s"need maxPeriod >= 2, got $maxPeriod")
    val base = df.select(sourceCol.as("source"), tokens(textCol).as("__tk"))
      .withColumn("__n", size(col("__tk")).cast("long"))
    // Round-21: ONE JVM scan computes the per-period match counts —
    // the composed form paid interpreted slice+zip_with+aggregate
    // lambdas per period (maxPeriod× the token stream through boxed
    // HOF eval; the round-20 finding). Equality with the composed
    // counts is pinned in TextGatePropertySpec.
    val mCounts = udf((ts: scala.collection.Seq[String]) =>
      if (ts == null) null.asInstanceOf[Array[Long]]
      else loopMatchCountsJvm(ts, maxPeriod))
    val withLp = (1 to maxPeriod).foldLeft(
      base.withColumn("__ms", mCounts(col("__tk")))) { (acc, p) =>
      acc.withColumn(s"__lp$p",
        expr(s"CASE WHEN __n > $p THEN element_at(__ms, $p) * 100 DIV (__n - $p) ELSE 0 END"))
    }
    val lps = (1 to maxPeriod).map(p => col(s"__lp$p"))
    val best = lps.reduce(greatest(_, _))
    // first-max argmax: period p wins iff lp_p >= every later lp_q
    val period = (1 until maxPeriod).foldRight(lit(maxPeriod)) { (p, rest) =>
      when(lps.drop(p).map(lps(p - 1) >= _).reduce(_ && _), lit(p)).otherwise(rest)
    }
    val perDoc = withLp.select(col("source"), best.as("__loop"), period.as("__period"))
    val loopAgg = perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__loop") >= threshold, 1L).otherwise(0L)).as("degenerate"),
        sum(when(col("__loop") >= threshold && col("__period") === 1, 1L)
          .otherwise(0L)).as("deg_p1"),
        max(col("__loop")).as("max_loop_pct"))
    val grams = df.select(sourceCol.as("source"),
        explode(ngramsOfTokens(tokens(textCol), 2)).as("__g"))
      .select(col("source"), Portable.hash64(col("__g")).as("__h"))
      .groupBy("source")
      .agg(count(lit(1)).as("__ng"), countDistinct(col("__h")).as("__nd"))
      .select(col("source"), expr("__nd * 100 DIV __ng").as("distinct2_pct"))
    loopAgg.join(grams, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("degenerate"), col("deg_p1"),
        col("max_loop_pct"), coalesce(col("distinct2_pct"), lit(0L)).as("distinct2_pct"))
  }
}
