package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level n-gram language modeling for quality filtering — the
  * CCNet/RefinedWeb curation step the simpler per-document gates
  * (length/punctuation, [[TextAnalysis.qualityScore]]) cannot express:
  * score each document by how TYPICAL its word transitions are under a
  * bigram model of the corpus itself, then keep a band (drop gibberish
  * at the bottom, boilerplate at the top). Reference precedent for the
  * content-statistics style: the reference's hash toolkit and
  * InstructLab training-data sink (debezium-server-instructlab).
  *
  * Model: add-one-smoothed conditional bigram likelihood
  *   p(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V)
  * with V = corpus vocabulary size; a document's score is the mean of
  * its bigram probabilities. Everything is exact integer counting plus
  * ONE double division per bigram, quantized to 1e-9 before the
  * per-document mean (long-sum, order-independent) — bit-identical in
  * any engine, the repo's standard cross-engine float discipline.
  *
  * 100 TB shape: one token explosion feeds bigram generation; counts
  * are two groupBys keyed on 8-byte xxhash64 values (the strings never
  * shuffle — same accepted collision trade as the dedup operators);
  * scoring joins the bigram stream to both count tables on those same
  * fixed-width keys. No driver-side state: the vocabulary size rides a
  * one-row frame through a broadcast cross-join. Documents with fewer
  * than 2 tokens have no transitions to score and drop out.
  */
object LanguageModel {

  /** Tokenized frame: (doc_id, __toks). */
  private def tokenized(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    // NB deliberately NOT widened (round-22): unlike the MD5/BPE digest
    // passes (Dedup.atWidth), the whitespace split is cheap enough that
    // the extra exchange + per-call planning LOST on every consumer
    // (llm24 1.18→1.37, llm26 1.43→1.79, llm79 1.36→2.10, llm104
    // 1.82→2.39, llm108 4.95→5.87 — A/B at 32c, clean canaries).
    df.select(idCol.as("doc_id"), Dedup.tokens(textCol).as("__toks"))

  /** Bigram stream (doc_id, __h12, __h1) by POSITION explode: no
    * intermediate struct array is built — positions explode off the
    * (already needed) token array and both hashes compute in one
    * codegen'd projection via element_at. The `size >= 2` filter runs
    * BEFORE the sequence so the `sequence(1, 0)` descending-array trap
    * never fires. Space-joined bigram hashing: tokens are
    * whitespace-split, so " " can never occur inside one — ("ab","c")
    * and ("a","bc") cannot collide. */
  private def bigramStream(toks: DataFrame): DataFrame =
    toks.filter(size(col("__toks")) >= 2)
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(1), size(col("__toks")) - 1)).as("__i"))
      .select(col("doc_id"),
        xxhash64(concat_ws(" ",
          element_at(col("__toks"), col("__i")),
          element_at(col("__toks"), col("__i") + 1))).as("__h12"),
        xxhash64(element_at(col("__toks"), col("__i"))).as("__h1"))

  /** Per-token-position hash stream (doc_id, __h1, __h12): ONE row per
    * token; __h12 is the bigram starting at this position (null at each
    * doc's last token, so single-token docs still carry their
    * vocabulary row). Round-21 (guide §8): the count tables, the
    * vocabulary, and the per-bigram scoring join all derive from this
    * one fixed-width proxy — materialized once by the caller instead of
    * re-scanning and re-tokenizing the corpus per consumer. Rows with
    * __h12 non-null are EXACTLY [[bigramStream]]'s rows; distinct __h1
    * over all rows is EXACTLY [[vocabSize]]'s input. */
  private def tokenHashStream(toks: DataFrame): DataFrame =
    toks.filter(size(col("__toks")) >= 1)
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(1), size(col("__toks")))).as("__i"))
      .select(col("doc_id"),
        xxhash64(element_at(col("__toks"), col("__i"))).as("__h1"),
        when(col("__i") < size(col("__toks")),
          xxhash64(concat_ws(" ",
            element_at(col("__toks"), col("__i")),
            element_at(col("__toks"), col("__i") + 1)))).as("__h12"))

  private def maybeEager(df: DataFrame,
                         tracker: Option[graft.operators.Materialize.Tracker]): DataFrame =
    tracker match {
      case Some(t) => t.track(graft.operators.Materialize.eager(df))
      case None => df
    }

  /** One-row vocabulary size of a tokenized frame (hashed distinct). */
  private def vocabSize(toks: DataFrame, as: String): DataFrame =
    toks.select(explode(col("__toks")).as("__t"))
      .agg(count_distinct(xxhash64(col("__t"))).as(as))

  /** Interpolated TRIGRAM typicality: per-position score
    * 0.5·p(w3|w1w2) + 0.3·p(w3|w2) + 0.2·p(w3), every component
    * add-one smoothed over corpus counts — the stronger-context
    * sibling of [[bigramScore]] (a document full of locally-plausible
    * bigrams can still be word-salad at trigram range; interpolation
    * keeps rare-but-real trigrams from being crushed to the floor).
    * Returns (doc_id, n_trigrams, avg_interp_p); documents under 3
    * tokens have no trigram to score and drop out.
    *
    * Cross-engine discipline: each per-position value is a fixed
    * left-associated double expression over exact long counts,
    * quantized to 1e-9 before the long-sum mean. 100 TB shape: one
    * position-explode feeds all n-gram keys (8-byte xxhash64 — the
    * strings never shuffle); three count tables (trigram, bigram,
    * unigram) each one hash-keyed groupBy, the bigram and unigram
    * tables joined TWICE (context and event roles); vocab+token
    * totals ride a broadcast one-row frame. */
  def trigramScore(df: DataFrame, idCol: Column, textCol: Column,
                   tracker: Option[graft.operators.Materialize.Tracker] = None): DataFrame = {
    val toks = tokenized(df, idCol, textCol)
    // round-21 (guide §1.2 step 1, §8): the old shape tokenized the
    // corpus five times (c123, cB, cU, vn, scoring join). The per-token
    // hash stream (cB/cU/vn — three consumers) and the per-trigram
    // frame (c123 + the scoring join) each materialize once when a
    // tracker is supplied: two corpus scans total.
    val st = maybeEager(tokenHashStream(toks), tracker)
    // (doc_id, h123, h12, h23, h2, h3) per trigram position, one
    // codegen'd projection off the position explode
    val tri0 = toks.filter(size(col("__toks")) >= 3)
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(3), size(col("__toks")))).as("__i"))
      .select(col("doc_id"),
        xxhash64(concat_ws(" ",
          element_at(col("__toks"), col("__i") - 2),
          element_at(col("__toks"), col("__i") - 1),
          element_at(col("__toks"), col("__i")))).as("__h123"),
        xxhash64(concat_ws(" ",
          element_at(col("__toks"), col("__i") - 2),
          element_at(col("__toks"), col("__i") - 1))).as("__h12"),
        xxhash64(concat_ws(" ",
          element_at(col("__toks"), col("__i") - 1),
          element_at(col("__toks"), col("__i")))).as("__h23"),
        xxhash64(element_at(col("__toks"), col("__i") - 1)).as("__h2"),
        xxhash64(element_at(col("__toks"), col("__i"))).as("__h3"))
    val tri = maybeEager(tri0, tracker)
    val c123 = tri.groupBy(col("__h123")).agg(count(lit(1)).as("__c123"))
    // ONE bigram count table serves both the (w1,w2) context role and
    // the (w2,w3) event role; likewise one unigram table for w2/w3
    val cB = st.filter(col("__h12").isNotNull)
      .groupBy(col("__h12")).agg(count(lit(1)).as("__cb"))
    val cU = st.groupBy(col("__h1")).agg(count(lit(1)).as("__cu"))
      .select(col("__h1").as("__hu"), col("__cu"))
    val vn = st.agg(count_distinct(col("__h1")).as("__v"),
                    count(lit(1)).as("__n"))
    val q = tri
      .join(c123, "__h123")
      .join(cB.select(col("__h12"), col("__cb").as("__c12")), "__h12")
      .join(cB.select(col("__h12").as("__h23"), col("__cb").as("__c23")), "__h23")
      .join(cU.select(col("__hu").as("__h2"), col("__cu").as("__c2")), "__h2")
      .join(cU.select(col("__hu").as("__h3"), col("__cu").as("__c3")), "__h3")
      .crossJoin(broadcast(vn))
      .select(col("doc_id"),
        floor((lit(0.5) * ((col("__c123") + 1).cast("double") /
                           (col("__c12") + col("__v")).cast("double")) +
               lit(0.3) * ((col("__c23") + 1).cast("double") /
                           (col("__c2") + col("__v")).cast("double")) +
               lit(0.2) * ((col("__c3") + 1).cast("double") /
                           (col("__n") + col("__v")).cast("double"))) * lit(1e9))
          .cast("long").as("__q"))
    q.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("__q")).as("__sq"))
      .select(col("doc_id"), col("n_trigrams"),
        (col("__sq").cast("double") / col("n_trigrams") / lit(1e9)).as("avg_interp_p"))
  }

  /** Per-document corpus-typicality score: (doc_id, n_bigrams,
    * avg_bigram_p) where avg_bigram_p is the mean smoothed bigram
    * probability (higher = more typical of the corpus; extremely high
    * = boilerplate, extremely low = gibberish/noise). */
  def bigramScore(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    bigramDocSums(df, idCol, textCol)
      .select(col("doc_id"), col("n_bigrams"),
        (col("__sq").cast("double") / col("n_bigrams") / lit(1e9)).as("avg_bigram_p"))

  /** Integer-exact variant of [[bigramScore]] for rank/bucket
    * consumers (e.g. CCNet-style head/middle/tail partitioning):
    * `score_q = sum(q) DIV n_bigrams` — the mean smoothed bigram
    * probability in 1e-9 steps as an exact long, so ordering and
    * tertile thresholds are engine-identical with no float compare. */
  def bigramScoreQ(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    bigramDocSums(df, idCol, textCol)
      .select(col("doc_id"), col("n_bigrams"),
        expr("__sq DIV n_bigrams").as("score_q"))

  private def bigramDocSums(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    // round-21 note (measured, kept AS IS): two restructures of this
    // shape were tried and REVERTED — (a) materializing the per-token
    // hash stream for all consumers (+0.4-0.5 s at sf0.1: the eager job
    // + leaf persist outweigh the saved re-scans at bench scale), and
    // (b) counting at (h12, h1) grain with both tables rolled up from
    // one shared exchange (tie standalone, but +1.3-3.9 s inside the
    // eagerly-materialized groupRanks consumers llm104/llm108, where
    // the shared exchange is not reused). The lazy 4-pass shape is the
    // measured local optimum; at 100 TB the count tables are the
    // vocabulary-sized artifacts a production run persists once
    // (fitBigramModel) rather than recomputing per scoring pass.
    val toks = tokenized(df, idCol, textCol)
    val bi = bigramStream(toks)
    val c12 = bi.groupBy(col("__h12")).agg(count(lit(1)).as("__c12"))
    val c1 = bi.groupBy(col("__h1")).agg(count(lit(1)).as("__c1"))
    val vocab = vocabSize(toks, "__v")
    // one double division per bigram, quantized to integer 1e-9 steps so
    // the per-doc mean is an exact long sum (shuffle-order independent)
    val q = bi.join(c12, "__h12").join(c1, "__h1").crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        floor(((col("__c12") + 1).cast("double") /
               (col("__c1") + col("__v")).cast("double")) * lit(1e9)).cast("long").as("__q"))
    q.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__q")).as("__sq"))
  }

  /** DSIR-style importance score: how much more likely each raw
    * document's word transitions are under the TARGET domain's bigram
    * model than under the raw corpus's own — the importance-resampling
    * signal for selecting pretraining data that matches a target
    * distribution (Xie et al., "Data Selection for Language Models via
    * Importance Resampling", hashed-n-gram variant). Per bigram the
    * ratio p_target(w2|w1) / p_raw(w2|w1), both add-one smoothed (a
    * bigram unseen in the target backs off to 1/(c_t(w1)+V_t), never
    * zero); a document's score is the mean ratio, quantized to 1e-6
    * before the long-sum mean — bit-identical across engines. Higher =
    * more target-like; resample raw data proportionally (or keep the
    * top fraction via [[Curation.keepTopQualityPerGroup]]).
    *
    * Shape: raw counts exactly as [[bigramScore]]; target counts are
    * the same two hash-keyed groupBys over the (usually much smaller)
    * target corpus, LEFT-joined so absent transitions hit the smoothing
    * floor. Returns (doc_id, n_bigrams, avg_ratio). */
  def importanceScore(raw: DataFrame, rawId: Column, rawText: Column,
                      target: DataFrame, targetText: Column): DataFrame = {
    // round-21: same measured verdict as bigramDocSums — the lazy
    // per-table shape is the local optimum; see the note there.
    val rToks = tokenized(raw, rawId, rawText)
    val rBi = bigramStream(rToks)
    val rc12 = rBi.groupBy(col("__h12")).agg(count(lit(1)).as("__rc12"))
    val rc1 = rBi.groupBy(col("__h1")).agg(count(lit(1)).as("__rc1"))
    val rv = vocabSize(rToks, "__rv")
    val tToks = tokenized(target, lit(0L), targetText)
    val tBi = bigramStream(tToks)
    val tc12 = tBi.groupBy(col("__h12")).agg(count(lit(1)).as("__tc12"))
    val tc1 = tBi.groupBy(col("__h1")).agg(count(lit(1)).as("__tc1"))
    val tv = vocabSize(tToks, "__tv")
    val pT = (coalesce(col("__tc12"), lit(0L)) + 1).cast("double") /
      (coalesce(col("__tc1"), lit(0L)) + col("__tv")).cast("double")
    val pR = (col("__rc12") + 1).cast("double") /
      (col("__rc1") + col("__rv")).cast("double")
    rBi.join(rc12, "__h12").join(rc1, "__h1")
      .join(tc12, Seq("__h12"), "left").join(tc1, Seq("__h1"), "left")
      .crossJoin(broadcast(rv)).crossJoin(broadcast(tv))
      .select(col("doc_id"), floor((pT / pR) * lit(1e6)).cast("long").as("__q"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__q")).as("__sq"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("__sq").cast("double") / col("n_bigrams") / lit(1e6)).as("avg_ratio"))
  }

  /** A fitted bigram model: transition counts keyed on 8-byte hashes
    * plus the vocabulary size — the offline artifact a streaming
    * scorer joins against. `c12` has (__h12, __c12), `c1` has
    * (__h1, __c1); at 100 TB persist both to parquet and reload. */
  final case class BigramModel(c12: DataFrame, c1: DataFrame, vocabSize: Long)

  /** Fit the corpus bigram model — the offline half of streaming
    * scoring. One token explosion, two hash-keyed groupBys; the only
    * driver-side value is the single vocabulary-size long. */
  def fitBigramModel(df: DataFrame, textCol: Column): BigramModel = {
    val toks = tokenized(df, lit(0L), textCol)
    val bi = bigramStream(toks)
    BigramModel(
      bi.groupBy(col("__h12")).agg(count(lit(1)).as("__c12")),
      bi.groupBy(col("__h1")).agg(count(lit(1)).as("__c1")),
      vocabSize(toks, "__v").head().getLong(0))
  }

  /** STREAMING typicality scoring — the online deployment shape of
    * [[bigramScore]]: documents arrive as a stream and score against a
    * STATIC model fitted offline ([[fitBigramModel]]); transitions the
    * model never saw hit the add-one smoothing floor through the
    * stream-static LEFT joins (never zero, never a state lookup). The
    * per-document mean is a watermarked windowed aggregation, so the
    * query is append-mode and its state is bounded by the watermark
    * horizon. Output: (window, doc_id, n_bigrams, avg_bigram_p) per
    * finalized window. Scoring a static frame with the SAME corpus as
    * the model reproduces [[bigramScore]] exactly (StreamingSpec). */
  def bigramScoreStream(stream: DataFrame, idCol: Column, textCol: Column,
                        model: BigramModel, tsCol: String,
                        watermarkDelay: String,
                        windowDuration: String = "1 minute"): DataFrame = {
    val toks = stream.select(idCol.as("doc_id"), col(tsCol).as("__ts"),
      Dedup.tokens(textCol).as("__toks"))
    val bi = toks.filter(size(col("__toks")) >= 2)
      .select(col("doc_id"), col("__ts"), col("__toks"),
        explode(sequence(lit(1), size(col("__toks")) - 1)).as("__i"))
      .select(col("doc_id"), col("__ts"),
        xxhash64(concat_ws(" ",
          element_at(col("__toks"), col("__i")),
          element_at(col("__toks"), col("__i") + 1))).as("__h12"),
        xxhash64(element_at(col("__toks"), col("__i"))).as("__h1"))
    bi.join(model.c12, Seq("__h12"), "left")
      .join(model.c1, Seq("__h1"), "left")
      .select(col("doc_id"), col("__ts"),
        floor(((coalesce(col("__c12"), lit(0L)) + 1).cast("double") /
               (coalesce(col("__c1"), lit(0L)) + lit(model.vocabSize)).cast("double")) *
          lit(1e9)).cast("long").as("__q"))
      .withWatermark("__ts", watermarkDelay)
      .groupBy(window(col("__ts"), windowDuration), col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__q")).as("__sq"))
      .select(col("window"), col("doc_id"), col("n_bigrams"),
        (col("__sq").cast("double") / col("n_bigrams") / lit(1e9)).as("avg_bigram_p"))
  }

  /** Band filter over [[bigramScore]] — CCNet-style: keep documents
    * whose typicality sits inside [lo, hi] (drop gibberish below,
    * boilerplate above). Returns the surviving (doc_id, n_bigrams,
    * avg_bigram_p) rows. */
  def keepTypicalityBand(df: DataFrame, idCol: Column, textCol: Column,
                         lo: Double, hi: Double): DataFrame = {
    require(lo <= hi, "band must satisfy lo <= hi")
    bigramScore(df, idCol, textCol)
      .filter(col("avg_bigram_p") >= lo && col("avg_bigram_p") <= hi)
  }
}
