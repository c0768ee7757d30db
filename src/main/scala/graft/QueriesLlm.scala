package graft

import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.llm.{Dedup, Similarity, TextAnalysis}

/** LLM training-data pipeline operators (SURVEY.md §7.2 step 8) over
  * the `documents` and `embeddings` tables.
  */
object QueriesLlm {

  def all: Seq[Q] = Seq(llm01, llm02, llm03)

  /** Exact dedup: union the corpus with an id-shifted copy of itself so
    * every document has exactly one duplicate, then keep the lowest id
    * per content hash. The group key is the 60-bit portable content
    * hash — fixed-width shuffle keys no matter how large documents get. */
  private def llm01 = Q("llm01_dedup_exact",
    (s, dir) => {
      val d  = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val d2 = d.select((col("doc_id") + 100000L).as("doc_id"), col("text"))
      Dedup.exact(d.unionByName(d2), col("text"), col("doc_id"))
        .orderBy(col("keep_id"))
    },
    Some(s"""WITH a AS (SELECT doc_id, text FROM documents
            |          UNION ALL SELECT doc_id + 100000, text FROM documents)
            |SELECT ${Portable.duckHash64("text")} AS content_hash,
            |       min(doc_id) AS keep_id, count(*) AS n_copies
            |FROM a
            |GROUP BY 1
            |ORDER BY keep_id""".stripMargin))

  /** Per-document text statistics: token count, char count, mean token
    * length, punctuation density, stopword ratio, quality score, and the
    * min-hash fingerprint. One codegen'd pass over the corpus. */
  private def llm02 = Q("llm02_text_stats",
    (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.charCount(col("text")).as("n_chars_text"),
        TextAnalysis.meanTokenLen(col("text")).as("mean_token_len"),
        TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
        TextAnalysis.stopwordRatio(col("text")).as("stopword_ratio"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.fingerprintMin(col("text")).as("fingerprint"))
        .orderBy(col("doc_id")),
    Some(s"""WITH t AS (
            |  SELECT doc_id, text,
            |    list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS toks,
            |    list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS ltoks
            |  FROM documents)
            |SELECT doc_id,
            |  CAST(len(toks) AS INT) AS n_tokens,
            |  CAST(length(text) AS INT) AS n_chars_text,
            |  CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
            |    / CAST(greatest(len(toks), 1) AS DOUBLE) AS mean_token_len,
            |  CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
            |    / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio,
            |  CAST(len(list_filter(ltoks, x -> list_contains(['the','a','an','and','or','of','to','in','is','on'], x))) AS DOUBLE)
            |    / CAST(greatest(len(ltoks), 1) AS DOUBLE) AS stopword_ratio,
            |  (CAST(least(len(toks), 64) AS DOUBLE) / 64.0)
            |    * (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
            |             / CAST(greatest(length(text), 1) AS DOUBLE)) AS quality,
            |  list_aggregate(list_transform(toks,
            |    x -> CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)), 'min') AS fingerprint
            |FROM t
            |ORDER BY doc_id""".stripMargin))

  /** Brute-force cosine top-5 for 5 query vectors: broadcast queries
    * against the corpus scan, exact-decimal accumulation so DuckDB and
    * Spark agree bit-for-bit, per-query top-k window. */
  private def llm03 = Q("llm03_ann_cosine_topk",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val corpus  = emb.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Similarity.bruteForceTopK(corpus, "cid", "cv", queries, "qid", "qv", k = 5, exact = true)
        .orderBy(col("qid"), col("rank"))
    },
    Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
           |c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
           |p AS (SELECT qid, cid, qv, cv FROM q CROSS JOIN c WHERE cid <> qid),
           |d AS (SELECT qid, cid,
           |        sum(CAST(floor(CAST(qv[i] AS DOUBLE) * 1e6) AS BIGINT)
           |          * CAST(floor(CAST(cv[i] AS DOUBLE) * 1e6) AS BIGINT)) AS dot,
           |        sum(CAST(floor(CAST(qv[i] AS DOUBLE) * 1e6) AS BIGINT)
           |          * CAST(floor(CAST(qv[i] AS DOUBLE) * 1e6) AS BIGINT)) AS nq,
           |        sum(CAST(floor(CAST(cv[i] AS DOUBLE) * 1e6) AS BIGINT)
           |          * CAST(floor(CAST(cv[i] AS DOUBLE) * 1e6) AS BIGINT)) AS nc
           |      FROM p CROSS JOIN generate_series(1, 64) AS g(i)
           |      GROUP BY qid, cid),
           |sc AS (SELECT qid, cid,
           |         CAST(dot AS DOUBLE) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(nc AS DOUBLE))) AS sim
           |       FROM d),
           |r AS (SELECT qid, cid, sim,
           |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INT) AS rank
           |      FROM sc)
           |SELECT qid, cid, sim, rank FROM r
           |WHERE rank <= 5
           |ORDER BY qid, rank""".stripMargin))
}
