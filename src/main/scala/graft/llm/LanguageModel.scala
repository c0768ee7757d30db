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

  /** Per-document corpus-typicality score: (doc_id, n_bigrams,
    * avg_bigram_p) where avg_bigram_p is the mean smoothed bigram
    * probability (higher = more typical of the corpus; extremely high
    * = boilerplate, extremely low = gibberish/noise). */
  def bigramScore(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val toks = df.select(idCol.as("doc_id"), Dedup.tokens(textCol).as("__toks"))
    // bigram stream: HOF lambdas are interpreted, so only ATTRIBUTE
    // references appear inside the lambda (the tokenizer is bound to
    // __toks first — the round-6 O(n²) lesson)
    val bi = toks.select(col("doc_id"), explode(
        when(size(col("__toks")) >= 2,
          transform(sequence(lit(1), size(col("__toks")) - 1),
            i => struct(element_at(col("__toks"), i).as("w1"),
                        element_at(col("__toks"), i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("b"))
      .select(col("doc_id"),
        // space-joined: tokens are whitespace-split, so " " can never
        // occur inside one — ("ab","c") and ("a","bc") cannot collide
        xxhash64(concat_ws(" ", col("b.w1"), col("b.w2"))).as("__h12"),
        xxhash64(col("b.w1")).as("__h1"))
    val c12 = bi.groupBy(col("__h12")).agg(count(lit(1)).as("__c12"))
    val c1 = bi.groupBy(col("__h1")).agg(count(lit(1)).as("__c1"))
    val vocab = toks.select(explode(col("__toks")).as("__t"))
      .agg(count_distinct(xxhash64(col("__t"))).as("__v"))
    // one double division per bigram, quantized to integer 1e-9 steps so
    // the per-doc mean is an exact long sum (shuffle-order independent)
    val q = bi.join(c12, "__h12").join(c1, "__h1").crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        floor(((col("__c12") + 1).cast("double") /
               (col("__c1") + col("__v")).cast("double")) * lit(1e9)).cast("long").as("__q"))
    q.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__q")).as("__sq"))
      .select(col("doc_id"), col("n_bigrams"),
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
