package graft

import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.llm.{Clustering, CorpusReport, Curation, Dedup, LanguageModel, Multimodal, Packing, Pii, Pq, Retrieval, Sampling, Similarity, Sketches, TextAnalysis}

/** LLM training-data pipeline operators (SURVEY.md §7.2 step 8) over
  * the `documents` and `embeddings` tables.
  */
object QueriesLlm {

  def all: Seq[Q] = Seq(llm01, llm02, llm03, llm04, llm05, llm06, llm07, llm08,
                        llm09, llm10, llm11, llm12, llm13, llm14, llm15, llm16, llm17,
                        llm18, llm19, llm20, llm21, llm22, llm23, llm24, llm25, llm26,
                        llm27, llm28, llm29, llm30, llm31, llm32, llm33, llm34, llm35,
                        llm36, llm37, llm38, llm39, llm40, llm41, llm42, llm43, llm44, llm45, llm46,
                        llm47, llm48, llm49, llm50, llm51, llm52, llm53, llm54, llm55, llm56,
                        llm57, llm58, llm59, llm60, llm61, llm62, llm63, llm64,
                        llm65, llm66, llm67, llm68, llm69, llm70, llm71, llm72, llm73,
                        llm74, llm75, llm76, llm77, llm78, llm79, llm80, llm81,
                        llm82, llm83, llm84, llm85, llm86, llm87, llm88, llm89, llm90, llm91, llm92, llm93, llm94, llm95, llm96, llm97,
                        llm98, llm99, llm100, llm101, llm102, llm103, llm104, llm105,
                        llm106, llm107, llm108, llm109, llm110, llm111, llm112, llm113, llm114,
                        llm115, llm116, llm117, llm118, llm119, llm120, llm121, llm122,
                        llm123, llm124, llm125, llm126, llm127, llm128, llm129,
                        llm130, llm131, llm132, llm133, llm134, llm135,
                        llm136, llm137, llm138, llm139, llm140, llm141,
                        llm142, llm143, llm144, llm145, llm146, llm147,
                        llm148, llm149, llm150, llm151, llm152, llm153,
                        llm154, llm155, llm156, llm157, llm158, llm159, llm160)

  /** Per-query tracker slot for operators that materialize frames the
    * result still references ([[graft.operators.Materialize.Tracker]]):
    * each run swaps in a fresh tracker and releases the previous run's
    * executor blocks; the query's cleanup hook drains the last one.
    * Round-9 verdict: without this, 43 queries × 3 runs of accumulated
    * checkpoint blocks turned a 63 s bench session into 96 s. */
  private[graft] final class TrackerSlot {
    private val ref =
      new java.util.concurrent.atomic.AtomicReference[graft.operators.Materialize.Tracker]()
    def fresh(): graft.operators.Materialize.Tracker = {
      val t = new graft.operators.Materialize.Tracker
      Option(ref.getAndSet(t)).foreach(_.releaseAll())
      t
    }
    def drain(): Unit = Option(ref.getAndSet(null)).foreach(_.releaseAll())
  }

  /** Untimed prepare hook for the GramIndex consumer family (round-19
    * verdict #5): forces the materialized (corpus, k=16) index to
    * exist BEFORE the clock starts, so no family row's reading
    * depends on which bench block reached the index first. The build
    * cost has one deterministic owner instead: llm158 runs the full
    * corpus gram pass inside its timed body on every run. */
  private val ensureGramIndex: Option[(org.apache.spark.sql.SparkSession, String) => Unit] =
    Some((s, dir) => { graft.llm.GramIndex.documentsGramArrays(s, dir, 16); () })

  /** Sub-document (passage-level) dedup stats (Dedup.passages /
    * passageDupStats): Dolma-style paragraph dedup generalized to
    * fixed 8-token chunks. Half the corpus is planted as a duplicated
    * copy so the stats are non-trivial; passages travel as 8-byte
    * hashes after the explode. */
  private def llm21 = Q("llm21_passage_dedup",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val half = d.filter(col("doc_id") < 250)
        .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
      Dedup.passageDupStats(d.unionByName(half), col("doc_id"), col("text"), size = 8)
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH a AS (SELECT doc_id, text FROM documents
            |           UNION ALL SELECT doc_id + 200000, text FROM documents WHERE doc_id < 250),
            |t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS toks FROM a),
            |p AS (SELECT doc_id, unnest([array_to_string(toks[(i-1)*8+1:i*8], ' ')
            |                             for i in range(1, len(toks)//8 + 1)]) AS passage FROM t),
            |hh AS (SELECT doc_id, ${Portable.duckHash64("passage")} AS h FROM p),
            |dfq AS (SELECT h, count(DISTINCT doc_id) AS nd FROM hh GROUP BY h),
            |agg AS (SELECT doc_id, count(*) AS n_passages,
            |          CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_passages
            |        FROM hh JOIN dfq USING (h) GROUP BY doc_id)
            |SELECT a.doc_id, coalesce(n_passages, 0) AS n_passages,
            |  coalesce(n_dup_passages, 0) AS n_dup_passages,
            |  CASE WHEN coalesce(n_passages, 0) = 0 THEN 0.0
            |       ELSE coalesce(n_dup_passages, 0) / CAST(n_passages AS DOUBLE)
            |  END AS dup_passage_frac
            |FROM a LEFT JOIN agg USING (doc_id)
            |ORDER BY doc_id""".stripMargin))

  /** Characteristic-term extraction (TextAnalysis.topTerms): top-3
    * terms per document by integer-exact (tf desc, df asc, term)
    * ranking — the transcendental-free tf-idf (see topTerms scaladoc
    * for why no floating log crosses the engine boundary). */
  private def llm22 = Q("llm22_top_terms",
    (s, dir) => {
      val d = Tables.documents(s, dir).filter(col("doc_id") < 100)
      TextAnalysis.topTerms(d, col("doc_id"), col("text"), k = 3)
        .orderBy(col("doc_id"), col("rank"))
    },
    Some("""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
           |tk AS (SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'),
           |                             x -> len(x) > 0)) AS term FROM d),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY doc_id, term),
           |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
           |SELECT doc_id, rank, term, tf, df FROM (
           |  SELECT tf.doc_id, CAST(row_number() OVER (PARTITION BY tf.doc_id
           |           ORDER BY tf.tf DESC, dfq.df ASC, tf.term ASC) AS INT) AS rank,
           |         tf.term, tf.tf, dfq.df
           |  FROM tf JOIN dfq USING (term)) r
           |WHERE rank <= 3
           |ORDER BY doc_id, rank""".stripMargin))

  /** Per-source rank-based quality gating
    * (Curation.keepTopQualityPerGroup): keep the top half of each
    * source by quality score — FineWeb-style per-dump stratified
    * filtering that an absolute threshold can't express. */
  private val llm23Slot = new TrackerSlot
  private def llm23 = Q("llm23_quality_gate_per_source",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
      Curation.keepTopQualityPerGroup(d, col("doc_id"), col("source"),
          col("quality"), keepFraction = 0.5, tracker = Some(llm23Slot.fresh()))
        .orderBy(col("doc_id"))
    },
    Some("""WITH d AS (
           |  SELECT doc_id, source,
           |    (CAST(least(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)), 64) AS DOUBLE) / 64.0)
           |      * (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE)
           |               / CAST(greatest(length(text), 1) AS DOUBLE)) AS quality
           |  FROM documents),
           |r AS (SELECT doc_id, source, quality,
           |        row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id ASC) AS rk,
           |        count(*) OVER (PARTITION BY source) AS n
           |      FROM d)
           |SELECT doc_id, source, quality FROM r
           |WHERE rk <= floor(n * 0.5)
           |ORDER BY doc_id""".stripMargin),
    cleanup = Some(_ => llm23Slot.drain()))

  /** Corpus bigram typicality (LanguageModel.bigramScore) — the
    * CCNet-style perplexity-filtering signal: add-one-smoothed bigram
    * likelihood of each document under the corpus's own transition
    * counts. Per-bigram probabilities quantize to 1e-9 before the
    * per-doc mean so the double arithmetic is one division + one
    * multiply in a fixed order — bit-identical across engines. */
  private def llm24 = Q("llm24_bigram_typicality",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      LanguageModel.bigramScore(d, col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH t AS (SELECT doc_id,
           |              list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
           |            FROM documents),
           |bi AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
           |              unnest(toks[2:len(toks)]) AS w2 FROM t),
           |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
           |c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
           |v AS (SELECT count(DISTINCT tok) AS v
           |      FROM (SELECT unnest(toks) AS tok FROM t)),
           |q AS (SELECT bi.doc_id,
           |        CAST(floor((CAST(c12.c12 + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE)) * 1e9) AS BIGINT) AS q
           |      FROM bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
           |SELECT doc_id, count(*) AS n_bigrams,
           |       CAST(sum(q) AS DOUBLE) / count(*) / 1e9 AS avg_bigram_p
           |FROM q GROUP BY doc_id
           |ORDER BY doc_id""".stripMargin))

  /** BM25 retrieval scoring (Retrieval.bm25, odds-idf mode — the
    * engine-portable variant; the log-idf production mode is
    * unit-tested) for a 3-term domain query: the retrieval-based
    * curation signal. The oracle mirrors every double operation in
    * the SAME order — including spelling k1+1 as `(1.2 + 1.0)`, which
    * differs from the literal `2.2` by one ulp. */
  private def llm25 = Q("llm25_bm25_retrieval",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      Retrieval.bm25(d, col("doc_id"), col("text"),
          queryTerms = Seq("spark", "join", "window"), idfMode = Retrieval.OddsIdf)
        .orderBy(col("doc_id"))
    },
    Some("""WITH t AS (SELECT doc_id,
           |              list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
           |            FROM documents),
           |wl AS (SELECT doc_id, toks, len(toks) AS dl FROM t),
           |stats AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM wl),
           |tf AS (SELECT doc_id, dl, tok, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM wl)
           |       WHERE tok IN ('spark', 'join', 'window')
           |       GROUP BY 1, 2, 3),
           |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
           |q AS (SELECT tf.doc_id,
           |        CAST(floor(
           |          (((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
           |           * ((CAST(tf AS DOUBLE) * (1.2 + 1.0))
           |              / (CAST(tf AS DOUBLE)
           |                 + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
           |                                         / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))))
           |          * 1e6) AS BIGINT) AS q
           |      FROM tf JOIN dfq USING (tok) CROSS JOIN stats)
           |SELECT doc_id, count(*) AS n_matched, CAST(sum(q) AS DOUBLE) / 1e6 AS score
           |FROM q GROUP BY doc_id
           |ORDER BY doc_id""".stripMargin))

  /** DSIR-style importance scoring (LanguageModel.importanceScore):
    * per-document mean ratio of target-domain vs corpus bigram
    * likelihood — the importance-resampling signal for matching
    * pretraining data to a target distribution. Target = the `src0`
    * slice of the corpus; absent transitions hit the add-one smoothing
    * floor through LEFT joins. */
  private def llm26 = Q("llm26_importance_score",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      LanguageModel.importanceScore(d, col("doc_id"), col("text"),
          d.filter(col("source") === "src0"), col("text"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH t AS (SELECT doc_id,
           |              list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
           |            FROM documents),
           |tt AS (SELECT list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
           |       FROM documents WHERE source = 'src0'),
           |bi AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
           |              unnest(toks[2:len(toks)]) AS w2 FROM t),
           |tbi AS (SELECT unnest(toks[1:len(toks)-1]) AS w1,
           |               unnest(toks[2:len(toks)]) AS w2 FROM tt),
           |rc12 AS (SELECT w1, w2, count(*) AS rc12 FROM bi GROUP BY 1, 2),
           |rc1 AS (SELECT w1, count(*) AS rc1 FROM bi GROUP BY 1),
           |tc12 AS (SELECT w1, w2, count(*) AS tc12 FROM tbi GROUP BY 1, 2),
           |tc1 AS (SELECT w1, count(*) AS tc1 FROM tbi GROUP BY 1),
           |rv AS (SELECT count(DISTINCT tok) AS rv
           |       FROM (SELECT unnest(toks) AS tok FROM t)),
           |tv AS (SELECT count(DISTINCT tok) AS tv
           |       FROM (SELECT unnest(toks) AS tok FROM tt)),
           |q AS (SELECT bi.doc_id,
           |        CAST(floor(
           |          ((CAST(COALESCE(tc12.tc12, 0) + 1 AS DOUBLE)
           |            / CAST(COALESCE(tc1.tc1, 0) + tv.tv AS DOUBLE))
           |           / (CAST(rc12.rc12 + 1 AS DOUBLE) / CAST(rc1.rc1 + rv.rv AS DOUBLE)))
           |          * 1e6) AS BIGINT) AS q
           |      FROM bi JOIN rc12 USING (w1, w2) JOIN rc1 USING (w1)
           |              LEFT JOIN tc12 USING (w1, w2) LEFT JOIN tc1 USING (w1)
           |              CROSS JOIN rv CROSS JOIN tv)
           |SELECT doc_id, count(*) AS n_bigrams,
           |       CAST(sum(q) AS DOUBLE) / count(*) / 1e6 AS avg_ratio
           |FROM q GROUP BY doc_id
           |ORDER BY doc_id""".stripMargin))

  /** Quality-aware cluster representatives (Dedup.bestPerCluster):
    * after near-dup clustering, keep the CLEANEST member of each
    * duplicate family — the production dedup policy when
    * near-identical copies differ in quality (min-id, llm17's
    * convention, keeps an arbitrary copy). Per-cluster windows are
    * safe at any scale: duplicate families are small by
    * construction. */
  private val llm27Slot = new TrackerSlot
  private def llm27 = Q("llm27_cluster_representatives",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val corpus = d.unionByName(
        d.select((col("doc_id") + 100000L).as("doc_id"),
                 concat(col("text"), lit(" qx")).as("text")))
      val sigs = Dedup.minhashSignatureText(corpus, col("doc_id"), col("text"), n = 9, k = 12)
      val pairs = Dedup.candidatePairs(Dedup.lshBuckets(sigs, k = 12, rowsPerBand = 4))
      val clusters = Dedup.connectedComponents(pairs, tracker = Some(llm27Slot.fresh()))
      Dedup.bestPerCluster(clusters,
          corpus.select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("q")),
          col("doc_id"), col("q"))
        .orderBy(col("cluster_id"))
    },
    Some(s"""WITH RECURSIVE $duckMinhashPairCtes,
            |verts AS (SELECT id_a AS v FROM pairs UNION SELECT id_b FROM pairs),
            |edges AS (SELECT id_a AS ea, id_b AS eb FROM pairs
            |          UNION SELECT id_b, id_a FROM pairs),
            |reach(v, r) AS (
            |  SELECT v, v FROM verts
            |  UNION
            |  SELECT e.eb, reach.r FROM edges e JOIN reach ON reach.v = e.ea),
            |comp AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
            |qual AS (SELECT doc_id,
            |    (CAST(least(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)), 64) AS DOUBLE) / 64.0)
            |      * (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
            |               / CAST(greatest(length(text), 1) AS DOUBLE)) AS score
            |  FROM corpus),
            |r AS (SELECT comp.cluster_id, comp.doc_id, qual.score,
            |        row_number() OVER (PARTITION BY comp.cluster_id
            |          ORDER BY qual.score DESC, comp.doc_id ASC) AS rn
            |      FROM comp JOIN qual USING (doc_id))
            |SELECT cluster_id, doc_id, score FROM r WHERE rn = 1
            |ORDER BY cluster_id""".stripMargin),
    cleanup = Some(_ => llm27Slot.drain()))

  /** Per-source corpus health report (CorpusReport.bySource): volume,
    * length, language mix, exact-dup rate, mean quality per source in
    * ONE scan + one grouped aggregation. Duplicates are planted (an
    * id-shifted copy of the low-id slice) so dup_rate is non-trivial;
    * quality quantizes to 1e-6 before the mean. */
  private def llm28 = Q("llm28_corpus_report",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      val corpus = d.unionByName(d.filter(col("doc_id") < 250)
        .select((col("doc_id") + 300000L).as("doc_id"), col("text"),
                col("lang"), col("source")))
      CorpusReport.bySource(corpus, col("text"), col("source"), col("lang"))
        .orderBy(col("source"))
    },
    Some(s"""WITH corpus AS (
            |  SELECT text, lang, source FROM documents
            |  UNION ALL SELECT text, lang, source FROM documents WHERE doc_id < 250),
            |d AS (SELECT source,
            |    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS BIGINT) AS nt,
            |    lang = 'en' AS is_en,
            |    CAST(floor(((CAST(least(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)), 64) AS DOUBLE) / 64.0)
            |      * (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
            |               / CAST(greatest(length(text), 1) AS DOUBLE))) * 1e6) AS BIGINT) AS q6,
            |    ${Portable.duckHash64("text")} AS h
            |  FROM corpus),
            |agg AS (SELECT source, count(*) AS n_docs,
            |          CAST(sum(nt) AS BIGINT) AS n_tokens,
            |          CAST(sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
            |          count(DISTINCT h) AS nd,
            |          CAST(sum(q6) AS BIGINT) AS sq6
            |        FROM d GROUP BY source)
            |SELECT source, n_docs, n_tokens,
            |       CAST(n_tokens AS DOUBLE) / n_docs AS avg_doc_tokens,
            |       n_lang,
            |       CAST(n_docs - nd AS DOUBLE) / n_docs AS dup_rate,
            |       CAST(sq6 AS DOUBLE) / n_docs / 1e6 AS avg_quality
            |FROM agg
            |ORDER BY source""".stripMargin))

  /** Gopher-style repetition stats (TextAnalysis.wordNgrams /
    * dupFraction / repetitionGate): duplicate token / 2-gram / 3-gram
    * fractions plus the keep flag — one codegen'd projection over the
    * document scan. */
  private def llm19 = Q("llm19_repetition",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      // Tokenize once, then derive both gram orders from the bound
      // array column — the n-gram build is slice/zip_with over an
      // attribute, so nothing re-tokenizes per element.
      d.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
        .select(col("doc_id"), col("__toks"),
          TextAnalysis.ngramsOfTokens(col("__toks"), 2).as("__g2"),
          TextAnalysis.ngramsOfTokens(col("__toks"), 3).as("__g3"))
        .select(col("doc_id"),
          size(col("__toks")).cast("long").as("n_tokens"),
          TextAnalysis.dupFraction(col("__toks")).as("dup_token_frac"),
          TextAnalysis.dupFraction(col("__g2")).as("dup_2gram_frac"),
          TextAnalysis.dupFraction(col("__g3")).as("dup_3gram_frac"))
        .withColumn("keep",
          col("dup_token_frac") <= 0.7 && col("dup_2gram_frac") <= 0.2 &&
            col("dup_3gram_frac") <= 0.15)
        .orderBy(col("doc_id"))
    },
    Some(
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, toks,
        |         [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))] AS g2,
        |         [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |            for i in range(1, len(toks)-1)] AS g3
        |  FROM t),
        |f AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CASE WHEN len(toks) = 0 THEN 0.0
        |         ELSE (len(toks) - len(list_distinct(toks))) / CAST(len(toks) AS DOUBLE)
        |    END AS dup_token_frac,
        |    CASE WHEN len(g2) = 0 THEN 0.0
        |         ELSE (len(g2) - len(list_distinct(g2))) / CAST(len(g2) AS DOUBLE)
        |    END AS dup_2gram_frac,
        |    CASE WHEN len(g3) = 0 THEN 0.0
        |         ELSE (len(g3) - len(list_distinct(g3))) / CAST(len(g3) AS DOUBLE)
        |    END AS dup_3gram_frac
        |  FROM g)
        |SELECT doc_id, n_tokens, dup_token_frac, dup_2gram_frac, dup_3gram_frac,
        |       (dup_token_frac <= 0.7 AND dup_2gram_frac <= 0.2 AND dup_3gram_frac <= 0.15)
        |         AS keep
        |FROM f ORDER BY doc_id""".stripMargin))

  /** PII scrub (Pii.emailCount/phoneCount/mask): the corpus text has
    * no PII, so the query plants a deterministic email + phone per
    * document (derived from doc_id, identically in both engines) and
    * checks counts and the redacted text. */
  private def llm20 = Q("llm20_pii_scrub",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val synth = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or call 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" today"))
      d.select(col("doc_id"), synth.as("t"))
        .select(col("doc_id"),
          Pii.emailCount(col("t")).cast("long").as("n_emails"),
          Pii.phoneCount(col("t")).cast("long").as("n_phones"),
          Pii.mask(col("t")).as("masked"))
        .orderBy(col("doc_id"))
    },
    Some(
      """WITH t AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or call 555-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today' AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |    AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '(^|[^0-9-])(([0-9]{3}-)?[0-9]{3}-[0-9]{4})($|[^0-9-])'))
        |    AS BIGINT) AS n_phones,
        |  regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '(^|[^0-9-])(([0-9]{3}-)?[0-9]{3}-[0-9]{4})($|[^0-9-])', '\1<PHONE>\4', 'g') AS masked
        |FROM t ORDER BY doc_id""".stripMargin))

  /** Budgeted corpus mixing (Sampling.budgetedMix): per-source token
    * budgets — src0 capped low, src1 excluded, everything else at the
    * default — with documents admitted in deterministic hash order
    * until each budget is reached. */
  private def llm18 = Q("llm18_budgeted_mix",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      Sampling.budgetedMix(d, col("doc_id"), col("source"), col("n_tokens"),
          budgets = Map("src0" -> 300L, "src1" -> 0L), defaultBudget = 600L)
        .orderBy(col("doc_id"))
    },
    Some {
      val u = Sampling.duckUnitInterval("doc_id", "mix")
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens,
         |    $u AS u
         |  FROM documents),
         |w AS (SELECT doc_id, source, n_tokens,
         |        sum(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cb
         |      FROM d)
         |SELECT doc_id, source, n_tokens FROM w
         |WHERE cb < (CASE source WHEN 'src0' THEN 300 WHEN 'src1' THEN 0 ELSE 600 END)
         |ORDER BY doc_id""".stripMargin
    })

  /** The minhash band-bucket CTE chain shared by llm05/llm17 oracles —
    * one generator so the two cannot drift. Ends at a `pairs` CTE of
    * DISTINCT (id_a, id_b) candidates. */
  private def duckMinhashPairCtes: String = {
    val hashes = (0 until 12).map(i =>
      s"${Portable.duckSeededHash("shingle", i)} AS h$i").mkString(",\n            ")
    val mins = (0 until 12).map(i => s"min(h$i) AS mh$i").mkString(", ")
    val bandRows = (0 until 3).map { b =>
      val cols = (4 * b until 4 * (b + 1)).map(i => s"mh$i").mkString(", ")
      s"SELECT doc_id, $b AS band, ${Portable.duckHash64(s"concat_ws('_', $cols)")} AS bucket FROM mh"
    }.mkString("\n            UNION ALL ")
    s"""corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + 100000, text || ' qx' FROM documents),
       |sh AS (SELECT DISTINCT doc_id, substr(text, i, 9) AS shingle
       |       FROM (SELECT doc_id, text,
       |               unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i
       |             FROM corpus)),
       |h AS (SELECT doc_id,
       |            $hashes
       |      FROM sh),
       |mh AS (SELECT doc_id, $mins FROM h GROUP BY doc_id),
       |bk AS (
       |            $bandRows),
       |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |          FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
       |          WHERE a.doc_id < b.doc_id)""".stripMargin
  }

  /** Near-dup CLUSTERS from the llm05 candidate pairs
    * (Dedup.connectedComponents): pairwise dedup can't decide what to
    * keep when (a,b) and (b,c) both pair — components give each
    * duplicate family one representative (the min doc id). The oracle
    * computes the same fixpoint as a recursive transitive closure. */
  private val llm17Slot = new TrackerSlot
  private def llm17 = Q("llm17_dedup_clusters",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val corpus = d.unionByName(
        d.select((col("doc_id") + 100000L).as("doc_id"),
                 concat(col("text"), lit(" qx")).as("text")))
      // same text-path signatures as llm05 — clustering consumes only
      // the 8-byte pair list, never the shingle arrays
      val sigs = Dedup.minhashSignatureText(corpus, col("doc_id"), col("text"), n = 9, k = 12)
      val pairs = Dedup.candidatePairs(Dedup.lshBuckets(sigs, k = 12, rowsPerBand = 4))
      Dedup.connectedComponents(pairs, tracker = Some(llm17Slot.fresh()))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE $duckMinhashPairCtes,
            |verts AS (SELECT id_a AS v FROM pairs UNION SELECT id_b FROM pairs),
            |edges AS (SELECT id_a AS ea, id_b AS eb FROM pairs
            |          UNION SELECT id_b, id_a FROM pairs),
            |reach(v, r) AS (
            |  SELECT v, v FROM verts
            |  UNION
            |  SELECT e.eb, reach.r FROM edges e JOIN reach ON reach.v = e.ea)
            |SELECT v AS doc_id, min(r) AS cluster_id
            |FROM reach GROUP BY v
            |ORDER BY doc_id""".stripMargin),
    cleanup = Some(_ => llm17Slot.drain()))

  /** Eval-set decontamination (Dedup.contamination): every 50th
    * document, lightly mutated, plays the eval set; each must map
    * back to its training source with rare-shingle overlap 1.0 and a
    * contaminated flag. Common shingles (train DF > 20) are dropped
    * before the inverted-index join — the rare-n-gram practice that
    * keeps the check linear at corpus scale. */
  private val llm16Slot = new TrackerSlot
  private def llm16 = Q("llm16_decontamination",
    (s, dir) => {
      val train = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val evalSet = train.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"),
                concat(col("text"), lit(" zz")).as("text"))
      // text-path: decontamination only consumes shingle HASHES, so
      // skip building the per-doc shingle arrays entirely
      Dedup.contaminationText(
          train, col("doc_id"), col("text"),
          evalSet, col("doc_id"), col("text"),
          n = 9, maxDf = 20, tracker = Some(llm16Slot.fresh()))
        .withColumn("contaminated", col("overlap") >= 0.8)
        .orderBy(col("eval_id"))
    },
    Some("""WITH train AS (SELECT doc_id AS train_id, text FROM documents),
           |ev AS (SELECT doc_id + 200000 AS eval_id, text || ' zz' AS text
           |       FROM documents WHERE doc_id % 50 = 0),
           |tsh AS (SELECT DISTINCT train_id, substr(text, i, 9) AS sh
           |        FROM (SELECT train_id, text,
           |                unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i
           |              FROM train)),
           |rare AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM tsh GROUP BY sh) t
           |         WHERE df <= 20),
           |trare AS (SELECT train_id, sh FROM tsh JOIN rare USING (sh)),
           |esh AS (SELECT DISTINCT eval_id, substr(text, i, 9) AS sh
           |        FROM (SELECT eval_id, text,
           |                unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i
           |              FROM ev)),
           |erare AS (SELECT eval_id, sh FROM esh JOIN rare USING (sh)),
           |ec AS (SELECT eval_id, count(*) AS n_eval FROM erare GROUP BY 1),
           |shared AS (SELECT eval_id, train_id, count(*) AS n_shared
           |           FROM erare JOIN trare USING (sh) GROUP BY 1, 2),
           |scored AS (SELECT s.eval_id, s.train_id,
           |             CAST(s.n_shared AS DOUBLE) / CAST(ec.n_eval AS DOUBLE) AS overlap,
           |             row_number() OVER (PARTITION BY s.eval_id
           |               ORDER BY CAST(s.n_shared AS DOUBLE) / CAST(ec.n_eval AS DOUBLE) DESC,
           |                        s.train_id DESC) AS rn
           |           FROM shared s JOIN ec USING (eval_id))
           |SELECT eval_id, train_id, overlap, overlap >= 0.8 AS contaminated
           |FROM scored WHERE rn = 1
           |ORDER BY eval_id""".stripMargin),
    cleanup = Some(_ => llm16Slot.drain()))

  /** Shard-local sequence packing (Packing.packBudgeted): documents
    * route to shards by portable hash, a per-shard running token
    * offset assigns each document to the 2048-token pack its start
    * falls in, and the manifest aggregates docs/tokens per pack —
    * the batch-construction step of a training pipeline, with the
    * running sum distributed one window per shard (never one global
    * sort). */
  private def llm15 = Q("llm15_sequence_packing",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      val packed = Packing.packBudgeted(d, col("doc_id"), col("n_tokens"),
        seqLen = 2048, nShards = 8)
      Packing.packManifest(packed, col("n_tokens"))
        .orderBy(col("shard"), col("pack_id"))
    },
    Some(s"""WITH d AS (
            |  SELECT doc_id,
            |    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens,
            |    (${Portable.duckHash64("doc_id")} % 8) AS shard
            |  FROM documents),
            |o AS (SELECT doc_id, n_tokens, shard,
            |        sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
            |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS off
            |      FROM d)
            |SELECT shard, CAST(off // 2048 AS BIGINT) AS pack_id,
            |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
            |FROM o
            |GROUP BY 1, 2
            |ORDER BY shard, pack_id""".stripMargin))

  /** Deterministic hash-based train/val/test split + per-language
    * stratified down-sampling (Sampling) — membership is a pure
    * function of (salt, doc_id), so the same document lands in the
    * same split on any engine, run, or cluster size (seeded RNG
    * sampling is partition-order dependent and NOT reproducible).
    * The split boundaries interpolate the same Scala doubles into
    * both sides, so cumulative-sum float artifacts can't diverge. */
  private def llm14 = Q("llm14_hash_sampling",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
      val split = Sampling.hashSplit(d, col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      Sampling.stratifiedSample(split, col("doc_id"), col("lang"),
          rates = Map("en" -> 0.5), defaultRate = 1.0)
        .orderBy(col("doc_id"))
    },
    Some {
      val us = Sampling.duckUnitInterval("doc_id", "split")
      val ut = Sampling.duckUnitInterval("doc_id", "strata")
      val b1 = 0.8
      val b2 = 0.8 + 0.1 // NOT 0.9: the exact cumulative double both sides use
      s"""SELECT doc_id, lang,
         |  CASE WHEN $us < $b1 THEN 'train'
         |       WHEN $us < $b2 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents
         |WHERE $ut < (CASE WHEN lang = 'en' THEN 0.5 ELSE 1.0 END)
         |ORDER BY doc_id""".stripMargin
    })

  /** KMV distinct-count sketch over the corpus's 9-char shingle space
    * (~20k distinct at sf0.01 — large enough to exercise the k-th
    * order statistic) — the PORTABLE approximate-distinct
    * (Sketches.kmvDistinct): unlike HLL++, the estimate is a pure
    * function of the portable hash's order statistics, so DuckDB
    * reproduces it bit-for-bit and the sketch itself is
    * oracle-checkable (n_exact is the verification column; a
    * production pipeline drops it). */
  private val llm13Slot = new TrackerSlot
  private def llm13 = Q("llm13_kmv_distinct",
    (s, dir) => {
      // position-explode (no shingle arrays): kmv global-distincts the
      // hashes, so per-doc repeats are irrelevant — same estimate
      val sh = Tables.documents(s, dir)
        .select(col("text"),
          explode(sequence(lit(1), greatest(length(col("text")) - 8, lit(1)))).as("__i"))
        .select(col("text").substr(col("__i"), lit(9)).as("shingle"))
      Sketches.kmvDistinct(sh, col("shingle"), k = 256, tracker = Some(llm13Slot.fresh()))
    },
    Some(Sketches.duckKmvDistinct(
      "(SELECT DISTINCT substr(text, i, 9) AS shingle FROM " +
        "(SELECT text, unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i " +
        "FROM documents)) sh",
      "shingle", 256)),
    cleanup = Some(_ => llm13Slot.drain()))

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

  /** Multimodal column pipeline (graft.llm.Multimodal): even-id docs
    * carry a REAL PNG (the proven llm69 `fixturePng` machinery) and
    * run the REAL ImageIO decode → 4×4 luminance lattice; odd-id docs
    * carry the text blob and run the declared hash stub — ONE frame
    * through `extractFeaturesTyped` exercises both sides of the codec
    * seam. The oracle recomputes the image features from the pixel
    * generation formula (PNG is lossless, so ImageIO must hand back
    * exactly those channel values) and the stub features from md5 —
    * real pixel-derived features are value-checked, not stubbed. PNG
    * container bytes are not SQL-replayable, so n_bytes/content_md5
    * are value-checked on the text rows and null on image rows. */
  private def llm06 = Q("llm06_multimodal_features",
    (s, dir) => {
      import graft.llm.Multimodal
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val png = udf((id: Long) => Multimodal.fixturePng(id))
      val isImg = col("doc_id") % 2 === 0
      val media = d
        .withColumn("media",
          when(isImg, png(col("doc_id"))).otherwise(col("text").cast("binary")))
        .withColumn("media_meta", struct(
          when(isImg, lit("image/png")).otherwise(lit("text/plain")).as("media_type"),
          length(col("media")).cast("long").as("n_bytes"),
          md5(col("media")).as("content_md5")))
      val feats = Multimodal.extractFeaturesTyped(media, "doc_id", dim = 16)
      media.select(col("doc_id"),
                   col("media_meta.media_type").as("media_type"),
                   when(!isImg, col("media_meta.n_bytes")).as("n_bytes"),
                   when(!isImg, col("media_meta.content_md5")).as("content_md5"))
        .join(feats, "doc_id")
        // string-rendered at the output boundary: the driver's row
        // sorter cannot hash array columns (round-2 `err`)
        .withColumn("features", Portable.renderVecQ6(col("features")))
        .orderBy(col("doc_id"))
    },
    Some {
      val stubFeat = Portable.duckRenderVecQ6((0 until 16).map { i =>
        s"CAST(CAST(concat('0x', substr(md5(text), ${2 * i + 1}, 2)) AS INT) / 255.0 AS REAL)"
      }.mkString("[", ",\n            ", "]"))
      // fixturePng pixels: ch(a,b,c) = (base*a + x*b + y*c) mod 256 on a
      // 24×16 image where base = doc_id % 100000 (round-15 advice: the
      // fixture's id>=100000 inversion only touches x>=20, and the
      // dim=16 lattice samples x = gx*6 ∈ {0,6,12,18} — so folding the
      // modulo into the oracle makes it exact at ANY corpus size);
      // y = gy*4 and the Rec.601 double weights replay bit-identically
      // (0.299e0 etc. are DOUBLE literals; 1e6 quantization keeps the
      // compare exact)
      s"""WITH px AS (SELECT gx, gx * 6 AS x FROM generate_series(0, 3) g(gx)),
         |py AS (SELECT gy, gy * 4 AS y FROM generate_series(0, 3) g(gy)),
         |imgf AS (
         |  SELECT d.doc_id, py.gy * 4 + px.gx AS i,
         |    CAST((0.299e0 * (((d.doc_id % 100000) * 31 + px.x * 7 + py.y * 13) % 256)
         |        + 0.587e0 * (((d.doc_id % 100000) * 17 + px.x * 11 + py.y * 3) % 256)
         |        + 0.114e0 * (((d.doc_id % 100000) * 23 + px.x * 5 + py.y * 19) % 256))
         |      / 255.0e0 AS REAL) AS v
         |  FROM documents d CROSS JOIN px CROSS JOIN py
         |  WHERE d.doc_id % 2 = 0),
         |imgvec AS (SELECT doc_id, list(v ORDER BY i) AS fv FROM imgf GROUP BY doc_id)
         |SELECT doc_id, 'image/png' AS media_type,
         |  CAST(NULL AS BIGINT) AS n_bytes, CAST(NULL AS VARCHAR) AS content_md5,
         |  ${Portable.duckRenderVecQ6("fv")} AS features
         |FROM imgvec
         |UNION ALL
         |SELECT doc_id, 'text/plain' AS media_type,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  md5(text) AS content_md5,
         |  $stubFeat AS features
         |FROM documents WHERE doc_id % 2 = 1
         |ORDER BY doc_id""".stripMargin
    })

  /** Language id + BPE-ish token counting + fingerprint — the text
    * curation trio round 1 left oracle-less (langId had no oracle).
    * The argmax CASE chain and the pre-tokenizer regex are written in
    * the RE2 ∩ Java-regex subset so both engines match literally. */
  private def llm07 = Q("llm07_lang_tokens",
    (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang"),
        TextAnalysis.bpeishTokenCount(col("text")).as("n_bpeish"),
        TextAnalysis.tokenCount(col("text")).as("n_ws"),
        TextAnalysis.fingerprintMin(col("text")).as("fingerprint"))
        .orderBy(col("doc_id")),
    Some {
      val langs = TextAnalysis.langMarkers
      val scores = langs.map { case (lang, ms) =>
        s"len(list_filter(ltoks, x -> list_contains([${ms.map("'" + _ + "'").mkString(",")}], x))) AS s_$lang"
      }.mkString(",\n            ")
      // first-wins argmax: lang i wins iff its score >= every later score
      val chain = langs.zipWithIndex.init.foldRight(s"'${langs.last._1}'") {
        case (((lang, _), i), rest) =>
          val later = langs.drop(i + 1).map { case (l, _) => s"s_$lang >= s_$l" }.mkString(" AND ")
          s"CASE WHEN $later THEN '$lang' ELSE $rest END"
      }
      val allZero = langs.map { case (l, _) => s"s_$l" }.mkString(" + ") + " = 0"
      s"""WITH t AS (
         |  SELECT doc_id, text,
         |    list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS ltoks,
         |    list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS toks
         |  FROM documents),
         |sc AS (SELECT doc_id, text, toks,
         |            $scores
         |       FROM t)
         |SELECT doc_id,
         |  CASE WHEN $allZero THEN 'unknown' ELSE $chain END AS lang,
         |  CAST(len(regexp_extract_all(text, '${TextAnalysis.BpeishPattern.replace("'", "''")}')) AS INT) AS n_bpeish,
         |  CAST(len(toks) AS INT) AS n_ws,
         |  list_aggregate(list_transform(toks, x -> ${Portable.duckHash64("x")}), 'min') AS fingerprint
         |FROM sc
         |ORDER BY doc_id""".stripMargin
    })

  /** Embedding-cosine near-dup: the corpus plus a perturbed copy
    * (element 0 shifted by +0.01 → cosine ≈ 0.9999), candidate pairs
    * from BANDED random-hyperplane signatures (4 bands × 16 planes,
    * Similarity.rhpBandedBuckets — per-band bucket space 2^16, so the
    * within-bucket self-join never goes quadratic the way round 2's
    * single fixed-2^8 signature did), exact quantized cosine on
    * candidates, pairs above 0.99 — the vector-space analog of llm05's
    * MinHash banding (no natural near-dups exist in the corpus: every
    * true pair is planted, recovery is whatever survives the
    * bucketing, deterministically). */
  private def llm08 = Q("llm08_embedding_neardup",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val perturbed = emb.select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, (x + lit(0.01f)).cast("float")).otherwise(x)).as("embedding"))
      val corpus = emb.unionByName(perturbed)
      val pairs = Dedup.candidatePairs(Similarity.rhpBandedBuckets(
        corpus, "vec_id", "embedding", dims = 64, planesPerBand = 16, bands = 4))
      val a = corpus.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = corpus.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
      pairs.join(a, "id_a").join(b, "id_b")
        .withColumn("sim", Similarity.cosineExact(col("va"), col("vb")))
        .filter(col("sim") >= 0.99)
        .select(col("id_a"), col("id_b"), col("sim"))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some {
      val bandRows = (0 until 4).map { b =>
        s"SELECT vec_id, $b AS band, ${duckRhpBandBucket("embedding", 64, 16, 4, b)} AS bucket FROM corpus"
      }.mkString("\n            UNION ALL ")
      s"""WITH base AS (SELECT vec_id, embedding FROM embeddings),
         |pert AS (SELECT vec_id + 100000 AS vec_id,
         |           list_transform(list_zip(embedding, range(1, len(embedding) + 1)),
         |             z -> CASE WHEN z[2] = 1 THEN CAST(CAST(z[1] AS REAL) + CAST(0.01 AS REAL) AS REAL)
         |                       ELSE z[1] END) AS embedding
         |         FROM base),
         |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
         |bk AS (
         |            $bandRows),
         |pairs AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |          FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
         |          WHERE a.vec_id < b.vec_id),
         |p AS (SELECT id_a, id_b, ca.embedding va, cb.embedding vb
         |      FROM pairs JOIN corpus ca ON ca.vec_id = id_a
         |                 JOIN corpus cb ON cb.vec_id = id_b),
         |d AS (SELECT id_a, id_b,
         |        list_sum(list_transform(list_zip(va, vb),
         |          z -> CAST(floor(CAST(z[1] AS DOUBLE) * 1e6) AS BIGINT)
         |             * CAST(floor(CAST(z[2] AS DOUBLE) * 1e6) AS BIGINT))) AS dot,
         |        list_sum(list_transform(va, x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)
         |             * CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT))) AS na,
         |        list_sum(list_transform(vb, x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)
         |             * CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT))) AS nb
         |      FROM p)
         |SELECT id_a, id_b,
         |       CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS sim
         |FROM d
         |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) >= 0.99
         |ORDER BY id_a, id_b""".stripMargin
    })

  /** n-gram Jaccard VERIFY over the MinHash candidates — the exact
    * similarity pass that turns llm05's candidate pairs into confirmed
    * near-duplicates (candidates whose true shingle Jaccard < 0.5 are
    * LSH false positives and drop out). Jaccard is one double division
    * of exact set sizes — bit-identical in any engine. */
  /** llm09 pins its signature+hashed-set frame; the cleanup hook
    * releases it after materialization (round-2 verdict: the cache
    * leaked across the bench session). */
  private val llm09Cache =
    new java.util.concurrent.atomic.AtomicReference[org.apache.spark.sql.DataFrame]()

  private def llm09 = Q("llm09_jaccard_verify",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val corpus = d.unionByName(
        d.select((col("doc_id") + 100000L).as("doc_id"),
                 concat(col("text"), lit(" qx")).as("text")))
      // signatures + hashed shingle sets in ONE position-explode pass
      // (round-11): no string arrays are ever built — the old shape
      // persisted array_distinct'd shingle strings + a transformed hash
      // array and ran a SECOND explode for the signature shuffle; this
      // persists 12 longs + one long per distinct shingle per doc, and
      // the verify joins read the same frame (jaccard over hashed sets
      // is hash-invariant)
      // release the PREVIOUS run's frame BEFORE persisting this one:
      // the two plans are semantically identical, so persisting first
      // hits the old CacheManager entry ("already cached" WARN, no-op)
      // and the subsequent unpersist would drop that shared entry —
      // leaving this run's frame silently uncached
      Option(llm09Cache.getAndSet(null)).foreach(_.unpersist())
      val docs = Dedup.minhashSignatureAndSets(corpus, col("doc_id"), col("text"),
          n = 9, k = 12)
        .persist()
      llm09Cache.set(docs)
      val pairs = Dedup.candidatePairs(Dedup.lshBuckets(docs, k = 12, rowsPerBand = 4))
      val a = docs.select(col("doc_id").as("id_a"), col("shh").as("sh_a"))
      val b = docs.select(col("doc_id").as("id_b"), col("shh").as("sh_b"))
      pairs.join(a, "id_a").join(b, "id_b")
        .withColumn("jaccard", Dedup.jaccard(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some {
      val hashes = (0 until 12).map(i =>
        s"${Portable.duckSeededHash("shingle", i)} AS h$i").mkString(",\n            ")
      val mins = (0 until 12).map(i => s"min(h$i) AS mh$i").mkString(", ")
      val bandRows = (0 until 3).map { b =>
        val cols = (4 * b until 4 * (b + 1)).map(i => s"mh$i").mkString(", ")
        s"SELECT doc_id, $b AS band, ${Portable.duckHash64(s"concat_ws('_', $cols)")} AS bucket FROM mh"
      }.mkString("\n            UNION ALL ")
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 100000, text || ' qx' FROM documents),
         |sh AS (SELECT DISTINCT doc_id, substr(text, i, 9) AS shingle
         |       FROM (SELECT doc_id, text,
         |               unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i
         |             FROM corpus)),
         |h AS (SELECT doc_id,
         |            $hashes
         |      FROM sh),
         |mh AS (SELECT doc_id, $mins FROM h GROUP BY doc_id),
         |bk AS (
         |            $bandRows),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |          FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
         |          WHERE a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT p.id_a, p.id_b, count(*) AS ni
         |          FROM pairs p
         |          JOIN sh a ON a.doc_id = p.id_a
         |          JOIN sh b ON b.doc_id = p.id_b AND b.shingle = a.shingle
         |          GROUP BY p.id_a, p.id_b)
         |SELECT i.id_a, i.id_b,
         |       CAST(i.ni AS DOUBLE) / CAST(sa.n + sb.n - i.ni AS DOUBLE) AS jaccard
         |FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a JOIN sizes sb ON sb.doc_id = i.id_b
         |WHERE CAST(i.ni AS DOUBLE) / CAST(sa.n + sb.n - i.ni AS DOUBLE) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin
    },
    cleanup = Some(_ => Option(llm09Cache.getAndSet(null)).foreach(_.unpersist())))

  /** SimHash + Hamming distance: 32-bit majority-vote sketches; the
    * planted mutation differs from its base in few bits, so the
    * Hamming distance between each (doc, doc+100000) pair is small —
    * the sketch-based verify path (vs llm09's exact Jaccard). */
  private def llm10 = Q("llm10_simhash_hamming",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val corpus = d.unionByName(
        d.select((col("doc_id") + 100000L).as("doc_id"),
                 concat(col("text"), lit(" qx")).as("text")))
      val sigs = Dedup.simhash(corpus, col("doc_id"), col("text"), bits = 32)
      val base = sigs.filter(col("doc_id") < 100000L)
        .select(col("doc_id"), col("simhash").as("sig_base"))
      val copy = sigs.filter(col("doc_id") >= 100000L)
        .select((col("doc_id") - 100000L).as("doc_id"), col("simhash").as("sig_copy"))
      base.join(copy, "doc_id")
        .withColumn("hamming", Dedup.hammingDistance(col("sig_base"), col("sig_copy")).cast("int"))
        .orderBy(col("doc_id"))
    },
    Some {
      val votes = (0 until 32).map(j =>
        s"sum(CASE WHEN (h // ${1L << j}) % 2 = 1 THEN 1 ELSE -1 END) AS v$j").mkString(",\n            ")
      val sig = (0 until 32).map(j => s"(CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 100000, text || ' qx' FROM documents),
         |toks AS (SELECT DISTINCT doc_id, tok FROM (
         |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS tok
         |  FROM corpus) t),
         |h0 AS (SELECT doc_id, ${Portable.duckHash64("tok")} AS h FROM toks),
         |v AS (SELECT doc_id,
         |            $votes
         |      FROM h0 GROUP BY doc_id),
         |sig AS (SELECT doc_id, CAST($sig AS BIGINT) AS simhash FROM v)
         |SELECT b.doc_id, b.simhash AS sig_base, c.simhash AS sig_copy,
         |       CAST(bit_count(xor(b.simhash, c.simhash)) AS INT) AS hamming
         |FROM sig b JOIN sig c ON c.doc_id = b.doc_id + 100000
         |WHERE b.doc_id < 100000
         |ORDER BY b.doc_id""".stripMargin
    })

  /** Quantized-integer dot product fragment (DuckDB): exact, order-
    * independent int64 sums — see Similarity.dotExact. */
  private def duckQDot(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b),
       | z -> CAST(floor(CAST(z[1] AS DOUBLE) * 1e6) AS BIGINT)
       |    * CAST(floor(CAST(z[2] AS DOUBLE) * 1e6) AS BIGINT)))""".stripMargin
  private def duckQCos(a: String, b: String): String =
    s"(CAST(${duckQDot(a, b)} AS DOUBLE) / (sqrt(CAST(${duckQDot(a, a)} AS DOUBLE)) * sqrt(CAST(${duckQDot(b, b)} AS DOUBLE))))"

  /** IVF ANN (Similarity.ivfTopK): deterministic coarse quantizer (16
    * lowest-id vectors), corpus partitioned by nearest centroid,
    * queries probe their 4 nearest cells — the data-adaptive
    * complement of llm04's data-oblivious RHP buckets. */
  private def llm11 = Q("llm11_ivf_ann",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val corpus  = emb.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Similarity.ivfTopK(corpus, "cid", "cv", queries, "qid", "qv",
          k = 5, nCentroids = 16, nProbe = 4, exact = true)
        .orderBy(col("qid"), col("rank"))
    },
    Some(s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
            |cent AS (SELECT vec_id AS cent_id, embedding AS cent_vec FROM embeddings
            |         ORDER BY vec_id LIMIT 16),
            |ad AS (SELECT cid, cv, cent_id,
            |         -${duckQCos("cv", "cent_vec")} AS d
            |       FROM c CROSS JOIN cent),
            |assigned AS (SELECT cid, cv, cent_id AS cell FROM (
            |  SELECT cid, cv, cent_id, row_number() OVER (PARTITION BY cid ORDER BY d, cent_id) AS rn
            |  FROM ad) t WHERE rn = 1),
            |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
            |qd AS (SELECT qid, qv, cent_id,
            |         -${duckQCos("qv", "cent_vec")} AS d
            |       FROM q CROSS JOIN cent),
            |probes AS (SELECT qid, qv, cent_id AS cell FROM (
            |  SELECT qid, qv, cent_id, row_number() OVER (PARTITION BY qid ORDER BY d, cent_id) AS rn
            |  FROM qd) t WHERE rn <= 4),
            |cand AS (SELECT p.qid, p.qv, a.cid, a.cv
            |         FROM probes p JOIN assigned a USING (cell)
            |         WHERE a.cid <> p.qid),
            |sc AS (SELECT qid, cid, ${duckQCos("qv", "cv")} AS sim FROM cand),
            |r AS (SELECT qid, cid, sim,
            |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INT) AS rank
            |      FROM sc)
            |SELECT qid, cid, sim, rank FROM r
            |WHERE rank <= 5
            |ORDER BY qid, rank""".stripMargin))

  /** Composed curation pipeline (Curation.curate): quality gate →
    * language filter → exact dedup, the one-pass-then-one-shuffle
    * shape of a production corpus clean. */
  private def llm12 = Q("llm12_curation",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      // duplicate the corpus so the dedup stage has work to do
      val corpus = d.unionByName(
        d.select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      Curation.curate(corpus, col("doc_id"), col("text"),
          Curation.Config(minTokens = 8, maxPunctRatio = 0.3, keepLangs = Set("en")))
        .orderBy(col("doc_id"))
    },
    Some {
      val langs = TextAnalysis.langMarkers
      val scores = langs.map { case (lang, ms) =>
        s"len(list_filter(ltoks, x -> list_contains([${ms.map("'" + _ + "'").mkString(",")}], x))) AS s_$lang"
      }.mkString(",\n            ")
      val chain = langs.zipWithIndex.init.foldRight(s"'${langs.last._1}'") {
        case (((lang, _), i), rest) =>
          val later = langs.drop(i + 1).map { case (l, _) => s"s_$lang >= s_$l" }.mkString(" AND ")
          s"CASE WHEN $later THEN '$lang' ELSE $rest END"
      }
      val allZero = langs.map { case (l, _) => s"s_$l" }.mkString(" + ") + " = 0"
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 100000, text FROM documents),
         |t AS (SELECT doc_id, text,
         |        list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS toks,
         |        list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS ltoks
         |      FROM corpus),
         |sc AS (SELECT doc_id, text, toks,
         |            $scores
         |       FROM t),
         |g AS (SELECT doc_id, text, ${Portable.duckHash64("text")} AS content_hash
         |      FROM sc
         |      WHERE len(toks) >= 8
         |        AND CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
         |            / CAST(greatest(length(text), 1) AS DOUBLE) <= 0.3
         |        AND (CASE WHEN $allZero THEN 'unknown' ELSE $chain END) = 'en'),
         |keep AS (SELECT content_hash, min(doc_id) AS doc_id FROM g GROUP BY 1)
         |SELECT g.doc_id, g.text, g.content_hash
         |FROM g JOIN keep USING (content_hash, doc_id)
         |ORDER BY doc_id""".stripMargin
    })

  /** DuckDB rendering of the RHP-LSH bucket over an embedding column:
    * per plane, sign of the exact quantized dot product with the
    * driver-side hyperplane literals — the SAME coefficients
    * Similarity.rhpSignature embeds, so Spark and oracle cannot drift. */
  private def duckRhpBucket(embExpr: String, dims: Int, planes: Int): String =
    duckRhpSig(embExpr, Similarity.rhpCoefficients(dims, planes))

  /** DuckDB rendering of band `band` of Similarity.rhpBandSignatures —
    * the same disjoint slice of the shared coefficient matrix. */
  private def duckRhpBandBucket(embExpr: String, dims: Int, planesPerBand: Int,
                                bands: Int, band: Int): String =
    duckRhpSig(embExpr, Similarity.rhpCoefficients(dims, planesPerBand * bands)
      .slice(band * planesPerBand, (band + 1) * planesPerBand))

  private def duckRhpSig(embExpr: String, coefs: Seq[Seq[Long]]): String =
    coefs.zipWithIndex.map { case (cs, p) =>
      val lits = cs.mkString("[", ",", "]")
      s"""(CASE WHEN list_sum(list_transform(list_zip($embExpr, $lits),
         |   z -> CAST(floor(CAST(z[1] AS DOUBLE) * 1000000.0) AS BIGINT) * z[2])) >= 0
         | THEN ${1L << p} ELSE 0 END)""".stripMargin
    }.mkString("(", " + ", ")")

  /** LSH-bucketed ANN — the 100 TB similarity path (llm03 is the
    * brute-force baseline): random-hyperplane signatures bucket the
    * corpus, the bucket join prunes candidates ~2^-planes, exact
    * quantized cosine within buckets, distributed top-k. */
  private def llm04 = Q("llm04_lsh_ann",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val corpus  = emb.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Similarity.lshTopK(corpus, "cid", "cv", queries, "qid", "qv",
          k = 5, dims = 64, planes = 8, exact = true)
        .orderBy(col("qid"), col("rank"))
    },
    Some(s"""WITH cb AS (SELECT vec_id AS cid, embedding AS cv,
            |             ${duckRhpBucket("embedding", 64, 8)} AS bucket FROM embeddings),
            |qb AS (SELECT vec_id AS qid, embedding AS qv,
            |         ${duckRhpBucket("embedding", 64, 8)} AS bucket
            |       FROM embeddings WHERE vec_id < 5),
            |p AS (SELECT qid, cid, qv, cv FROM qb JOIN cb USING (bucket) WHERE cid <> qid),
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

  /** MinHash + LSH-banding near-dedup candidate pairs: the corpus is
    * documents plus a lightly-mutated copy of itself (' qx' appended →
    * only the trailing shingles change), so copies land in a shared
    * band bucket. 9-char shingles, 12 universal-hash min-hashes (one
    * digest per shingle, k independent permutations), 3 bands of 4 —
    * explode→bucket→within-bucket pairs, never n². Parameters tuned
    * so random vocabulary overlap does NOT pair (b·J^r ≪ 1 for
    * unrelated docs at J≈0.4) while the planted near-identical copies
    * all do: at sf0.01, 604 candidate pairs with all 500 planted
    * mutations recovered (sf0.1: 6.3k pairs, 4993/5000) — loose bands
    * (r=2) flagged 100k. */
  private def llm05 = Q("llm05_minhash_pairs",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val corpus = d.unionByName(
        d.select((col("doc_id") + 100000L).as("doc_id"),
                 concat(col("text"), lit(" qx")).as("text")))
      // text-path signatures: pair generation never needs the shingle
      // arrays, so skip building them (≈35% of the signature stage)
      val sigs = Dedup.minhashSignatureText(corpus, col("doc_id"), col("text"), n = 9, k = 12)
      Dedup.candidatePairs(Dedup.lshBuckets(sigs, k = 12, rowsPerBand = 4))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""WITH $duckMinhashPairCtes
            |SELECT id_a, id_b FROM pairs
            |ORDER BY id_a, id_b""".stripMargin))

  /** SemDeDup-style semantic dedup (Similarity.semDedup): the corpus
    * is embeddings plus a first-component-perturbed copy (the llm08
    * construction — every vector has exactly one semantic duplicate),
    * clustered by the deterministic IVF coarse quantizer; within each
    * cluster, vectors with a ≥0.99-cosine smaller-id cellmate drop
    * (keep-min, like llm01/llm17). Nearly every planted duplicate
    * shares its base's cell and drops; the few whose perturbation
    * crosses a cell boundary survive — the cluster-scoped recall
    * trade the paper accepts by design (sf0.01: 507 survivors of
    * 1000, 7 of them perturbed). Integer-quantized cosine keeps both
    * the cell argmax and the threshold verdicts bit-identical to
    * DuckDB. */
  private def llm29 = Q("llm29_semantic_dedup",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val perturbed = emb.select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, (x + lit(0.01f)).cast("float")).otherwise(x)).as("embedding"))
      val corpus = emb.unionByName(perturbed)
      Similarity.semDedup(corpus, "vec_id", "embedding",
          nCentroids = 16, simThreshold = 0.99)
        .orderBy(col("vec_id"))
    },
    Some(s"""WITH base AS (SELECT vec_id, embedding FROM embeddings),
            |pert AS (SELECT vec_id + 100000 AS vec_id,
            |           list_transform(list_zip(embedding, range(1, len(embedding) + 1)),
            |             z -> CASE WHEN z[2] = 1 THEN CAST(CAST(z[1] AS REAL) + CAST(0.01 AS REAL) AS REAL)
            |                       ELSE z[1] END) AS embedding
            |         FROM base),
            |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
            |cent AS (SELECT vec_id AS cent_id, embedding AS cent_vec FROM corpus
            |         ORDER BY vec_id LIMIT 16),
            |ad AS (SELECT c.vec_id, c.embedding, cent_id,
            |         -${duckQCos("c.embedding", "cent_vec")} AS d
            |       FROM corpus c CROSS JOIN cent),
            |assigned AS (SELECT vec_id, embedding, cent_id AS cell FROM (
            |  SELECT vec_id, embedding, cent_id,
            |         row_number() OVER (PARTITION BY vec_id ORDER BY d, cent_id) AS rn
            |  FROM ad) t WHERE rn = 1),
            |dropped AS (SELECT DISTINCT b.vec_id
            |            FROM assigned a JOIN assigned b
            |              ON a.cell = b.cell AND a.vec_id < b.vec_id
            |            WHERE ${duckQCos("a.embedding", "b.embedding")} >= 0.99)
            |SELECT vec_id, cell FROM assigned
            |WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
            |ORDER BY vec_id""".stripMargin))

  /** Distributed k-means topic clustering (Clustering.kmeansTopics):
    * 2 Lloyd iterations at k=8 over the embeddings, every distance an
    * exact int64 sum on the quantization lattice so the oracle replays
    * both iterations bit-for-bit (assignment = codegen'd
    * NearestCentroid map-side pass; update = one (cell,dim) shuffle;
    * centroids hop the driver between iterations — the MLlib
    * pattern). */
  private val llm30Slot = new TrackerSlot
  private def llm30 = Q("llm30_kmeans_topics",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      Clustering.kmeansTopics(emb, col("vec_id"), col("embedding"),
          dims = 64, k = 8, iters = 2, tracker = Some(llm30Slot.fresh()))
        .orderBy(col("vec_id"))
    },
    Some("""WITH emb AS (SELECT vec_id,
           |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS qv
           |       FROM embeddings),
           |c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS cid, qv AS cv
           |       FROM (SELECT vec_id, qv FROM emb ORDER BY vec_id LIMIT 8)),
           |a1 AS (SELECT vec_id, qv, cid FROM (
           |  SELECT vec_id, qv, cid, dist,
           |         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
           |  FROM (SELECT e.vec_id, e.qv, c.cid,
           |               CAST(list_sum(list_transform(list_zip(e.qv, c.cv),
           |                    z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS dist
           |        FROM emb e CROSS JOIN c0 c) d) t WHERE rn = 1),
           |u1 AS (SELECT cid, unnest(range(1, len(qv)+1)) AS dim, unnest(qv) AS x FROM a1),
           |s1 AS (SELECT cid, dim, sum(x) AS s, count(*) AS n FROM u1 GROUP BY 1, 2),
           |n1 AS (SELECT cid, list(CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) ORDER BY dim) AS cv
           |       FROM s1 GROUP BY cid),
           |c1 AS (SELECT c0.cid, coalesce(n1.cv, c0.cv) AS cv FROM c0 LEFT JOIN n1 USING (cid)),
           |a2 AS (SELECT vec_id, qv, cid FROM (
           |  SELECT vec_id, qv, cid, dist,
           |         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
           |  FROM (SELECT e.vec_id, e.qv, c.cid,
           |               CAST(list_sum(list_transform(list_zip(e.qv, c.cv),
           |                    z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS dist
           |        FROM emb e CROSS JOIN c1 c) d) t WHERE rn = 1),
           |u2 AS (SELECT cid, unnest(range(1, len(qv)+1)) AS dim, unnest(qv) AS x FROM a2),
           |s2 AS (SELECT cid, dim, sum(x) AS s, count(*) AS n FROM u2 GROUP BY 1, 2),
           |n2 AS (SELECT cid, list(CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) ORDER BY dim) AS cv
           |       FROM s2 GROUP BY cid),
           |c2 AS (SELECT c1.cid, coalesce(n2.cv, c1.cv) AS cv FROM c1 LEFT JOIN n2 USING (cid)),
           |fin AS (SELECT vec_id, cid, dist FROM (
           |  SELECT vec_id, cid, dist,
           |         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
           |  FROM (SELECT e.vec_id, c.cid,
           |               CAST(list_sum(list_transform(list_zip(e.qv, c.cv),
           |                    z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS dist
           |        FROM emb e CROSS JOIN c2 c) d) t WHERE rn = 1)
           |SELECT vec_id, CAST(cid AS INT) AS topic, dist AS qdist
           |FROM fin ORDER BY vec_id""".stripMargin),
    cleanup = Some(_ => llm30Slot.drain()))

  /** Sliding-span exact-substring duplication (Dedup.spanDupStats):
    * offset-invariant cross-document containment — the signal
    * chunk-level passage dedup (llm21) structurally misses. The
    * planted duplicates are character-offset SUFFIX copies
    * (substr(text, 101)), so their token stream is shifted by an
    * arbitrary amount relative to the original: aligned 8-token
    * chunks almost never match, while almost every sliding 8-token
    * window does. */
  private def llm31 = Q("llm31_span_dup_stats",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val tails = d.filter(col("doc_id") < 250)
        .select((col("doc_id") + 300000L).as("doc_id"),
          substring(col("text"), 101, 1000000).as("text"))
      Dedup.spanDupStats(d.unionByName(tails), col("doc_id"), col("text"), n = 8)
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH a AS (SELECT doc_id, text FROM documents
            |           UNION ALL SELECT doc_id + 300000, substr(text, 101, 1000000)
            |           FROM documents WHERE doc_id < 250),
            |t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS toks FROM a),
            |p AS (SELECT doc_id, unnest([array_to_string(toks[i:i+7], ' ')
            |                             for i in range(1, len(toks) - 8 + 2)]) AS span
            |      FROM t WHERE len(toks) >= 8),
            |hh AS (SELECT doc_id, ${Portable.duckHash64("span")} AS h FROM p),
            |dfq AS (SELECT h, count(DISTINCT doc_id) AS nd FROM hh GROUP BY h),
            |agg AS (SELECT doc_id, count(*) AS n_spans,
            |          CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
            |        FROM hh JOIN dfq USING (h) GROUP BY doc_id)
            |SELECT a.doc_id, coalesce(n_spans, 0) AS n_spans,
            |  coalesce(n_dup_spans, 0) AS n_dup_spans,
            |  CASE WHEN coalesce(n_spans, 0) = 0 THEN 0.0
            |       ELSE coalesce(n_dup_spans, 0) / CAST(n_spans AS DOUBLE)
            |  END AS dup_span_frac
            |FROM a LEFT JOIN agg USING (doc_id)
            |ORDER BY doc_id""".stripMargin))

  /** Per-source quality-score quantiles via the deterministic
    * histogram sketch (Sketches.histogramQuantiles) — the threshold-
    * setting step of corpus curation done the way it scales: one
    * (group, bin) count shuffle, quantiles read off the cumulative
    * histogram, bit-identical in any engine (unlike
    * approx_percentile/t-digest, which are implementation-defined). */
  private def llm32 = Q("llm32_quality_quantiles",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("source"), TextAnalysis.qualityScore(col("text")).as("q"))
      Sketches.histogramQuantiles(d, col("source"), col("q"),
          lo = 0.0, hi = 1.0, bins = 32,
          qs = Seq("p50_bin" -> 0.5, "p90_bin" -> 0.9, "p99_bin" -> 0.99))
        .withColumnRenamed("g", "source")
        .orderBy(col("source"))
    },
    Some("""WITH d AS (
           |  SELECT source,
           |    (CAST(least(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)), 64) AS DOUBLE) / 64.0)
           |      * (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE)
           |               / CAST(greatest(length(text), 1) AS DOUBLE)) AS q
           |  FROM documents),
           |b AS (SELECT source,
           |        least(greatest(CAST(floor((q - 0.0) * 32.0 / 1.0) AS BIGINT), 0), 31) AS bin
           |      FROM d),
           |c AS (SELECT source, bin, count(*) AS c FROM b GROUP BY 1, 2),
           |w AS (SELECT source, bin,
           |        sum(c) OVER (PARTITION BY source ORDER BY bin) AS cum,
           |        sum(c) OVER (PARTITION BY source) AS n
           |      FROM c)
           |SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
           |  min(CASE WHEN cum >= CAST(ceil(CAST(n AS DOUBLE) * 0.5) AS BIGINT) THEN bin END) AS p50_bin,
           |  min(CASE WHEN cum >= CAST(ceil(CAST(n AS DOUBLE) * 0.9) AS BIGINT) THEN bin END) AS p90_bin,
           |  min(CASE WHEN cum >= CAST(ceil(CAST(n AS DOUBLE) * 0.99) AS BIGINT) THEN bin END) AS p99_bin
           |FROM w GROUP BY source
           |ORDER BY source""".stripMargin))

  /** Incremental exact dedup (Dedup.incrementalExact): a delta batch
    * dedups against the ingested corpus's hash index, then within
    * itself. Planted: replays of already-seen docs (dropped by the
    * index) and within-batch duplicate pairs (collapsed keep-min). */
  private def llm33 = Q("llm33_incremental_dedup",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val seen = d.filter(col("doc_id") < 250)
      val batch = d.filter(col("doc_id") >= 250)
        .unionByName(d.filter(col("doc_id") < 100)
          .select((col("doc_id") + 500000L).as("doc_id"), col("text")))
        .unionByName(d.filter(col("doc_id") >= 300 && col("doc_id") < 350)
          .select((col("doc_id") + 600000L).as("doc_id"), col("text")))
      Dedup.incrementalExact(batch, col("text"), col("doc_id"), seen, col("text"))
        .orderBy(col("keep_id"))
    },
    Some(s"""WITH seen AS (SELECT DISTINCT ${Portable.duckHash64("text")} AS content_hash
            |              FROM documents WHERE doc_id < 250),
            |batch AS (SELECT doc_id, text FROM documents WHERE doc_id >= 250
            |          UNION ALL SELECT doc_id + 500000, text FROM documents WHERE doc_id < 100
            |          UNION ALL SELECT doc_id + 600000, text FROM documents WHERE doc_id >= 300 AND doc_id < 350),
            |h AS (SELECT doc_id, ${Portable.duckHash64("text")} AS content_hash FROM batch)
            |SELECT content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
            |FROM h WHERE content_hash NOT IN (SELECT content_hash FROM seen)
            |GROUP BY content_hash
            |ORDER BY keep_id""".stripMargin))

  /** Sliding-window chunking (Packing.chunkWithOverlap): 8-token
    * windows every 4 tokens — the context-window preparation step;
    * chunks travel as 8-byte hashes, the whole operator is one
    * position explode with zero shuffles. */
  private def llm34 = Q("llm34_chunk_windows",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      Packing.chunkWithOverlap(d, col("doc_id"), col("text"),
          chunkTokens = 8, stride = 4)
        .orderBy(col("doc_id"), col("chunk_id"))
    },
    Some(s"""WITH t AS (SELECT doc_id,
            |             list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS toks
            |           FROM documents),
            |n AS (SELECT doc_id, toks, len(toks) AS ln,
            |        CASE WHEN len(toks) <= 0 THEN 0
            |             WHEN len(toks) <= 8 THEN 1
            |             ELSE 1 + CAST(floor(CAST(len(toks) - 8 + 3 AS DOUBLE) / 4.0) AS BIGINT)
            |        END AS nc
            |      FROM t),
            |c AS (SELECT doc_id, unnest(range(0, nc)) AS chunk_id, toks, ln
            |      FROM n WHERE nc >= 1),
            |sl AS (SELECT doc_id, chunk_id,
            |         toks[CAST(chunk_id * 4 + 1 AS BIGINT):least(CAST(chunk_id * 4 + 8 AS BIGINT), ln)] AS ch
            |       FROM c)
            |SELECT doc_id, chunk_id, CAST(len(ch) AS BIGINT) AS n_tokens,
            |  ${Portable.duckHash64("array_to_string(ch, ' ')")} AS chunk_hash
            |FROM sl ORDER BY doc_id, chunk_id""".stripMargin))

  /** Fixture merge table for llm35 — 50 ranked merges in GPT-2
    * `merges.txt` layout. Hand-built to satisfy the property every
    * trained table has (a pair referencing a merged token ranks after
    * the merge that produced it — asserted by TokenizerSpec), which
    * is what makes the single-step loop equal the reference batch
    * loop. */
  private[graft] val bpeMergesFixture: IndexedSeq[(String, String)] = IndexedSeq(
    ("t","h"), ("i","n"), ("a","n"), ("r","e"), ("o","n"), ("e","r"), ("th","e"),
    ("an","d"), ("o","u"), ("in","g"), ("t","o"), ("e","n"), ("o","f"), ("i","s"),
    ("o","r"), ("a","t"), ("e","s"), ("a","l"), ("ou","r"), ("s","t"), ("th","ing"),
    ("o","the"), ("1","2"), ("12","3"), ("e","d"), ("c","o"), ("l","l"), ("w","h"),
    ("wh","i"), ("c","h"), ("whi","ch"), ("s","e"), ("m","e"), ("w","e"), ("b","e"),
    ("h","a"), ("ha","v"), ("hav","e"), ("w","i"), ("wi","th"), ("f","or"),
    ("n","o"), ("no","t"), ("b","u"), ("bu","t"), ("a","r"), ("ar","e"), ("on","e"),
    ("a","s"), ("to","o"))

  private[graft] def bpeMergesText: String =
    "#version: 0.2\n" + bpeMergesFixture.map { case (x, y) => s"$x $y" }.mkString("\n")

  /** The DuckDB replay of the tokenizer's single-step merge loop: the
    * shared recursive-CTE prefix (word split → per-word BPE fixpoint →
    * final symbol lists in `fin(doc_id, ord, syms)`) used by llm35
    * (ids) and llm36 (counts feeding packing). */
  private def bpeMergeLoopCtes: String = bpeMergeLoopCtesFrom("documents")

  /** [[bpeMergeLoopCtes]] over an arbitrary (doc_id, text) relation —
    * llm157 tokenizes train ∪ eval in one pass. */
  private def bpeMergeLoopCtesFrom(rel: String): String = {
    val mlist = bpeMergesFixture
      .map { case (x, y) => s"'$x $y'" }.mkString("[", ",", "]")
    s"""words AS (
       |  SELECT doc_id, unnest(ws) AS word, unnest(range(1, len(ws)+1)) AS ord
       |  FROM (SELECT doc_id,
       |          regexp_extract_all(lower(text), '${graft.llm.Tokenizer.WordPattern}') AS ws
       |        FROM $rel)),
       |bpe(doc_id, ord, syms, step) AS (
       |  SELECT doc_id, ord, str_split(word, '') AS syms, 0 FROM words
       |  UNION ALL
       |  SELECT doc_id, ord,
       |    syms[1:bi-1] || [syms[bi] || syms[bi+1]] || syms[bi+2:], step + 1
       |  FROM (SELECT doc_id, ord, syms, step,
       |          list_position(pr, list_min(pr)) AS bi, list_min(pr) AS br
       |        FROM (SELECT doc_id, ord, syms, step,
       |                [coalesce(nullif(list_position($mlist,
       |                   syms[i] || ' ' || syms[i+1]), 0), 9999999)
       |                 for i in range(1, len(syms))] AS pr
       |              FROM bpe))
       |  WHERE br < 9999999),
       |fin AS (SELECT doc_id, ord, max_by(syms, step) AS syms
       |        FROM bpe GROUP BY doc_id, ord)""".stripMargin
  }

  /** Real BPE tokenization (Tokenizer): the GPT-2-style merge loop
    * applied distributedly — token ids and counts, not the whitespace
    * approximation. The DuckDB oracle replays the IDENTICAL
    * single-step merge loop as a recursive CTE over the same merge
    * table, so ids hash-match end to end. */
  private def llm35 = Q("llm35_bpe_tokenize",
    (s, dir) => {
      val bpe = graft.llm.Tokenizer.fromMergesText(bpeMergesText)
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      d.select(col("doc_id"),
          graft.llm.Tokenizer.tokenIds(s, bpe)(col("text")).as("ids"))
        .select(col("doc_id"),
          size(col("ids")).cast("long").as("n_tokens"),
          concat_ws(",", col("ids").cast("array<string>")).as("ids_csv"))
        .orderBy(col("doc_id"))
    },
    Some {
      val mlist = bpeMergesFixture
        .map { case (x, y) => s"'$x $y'" }.mkString("[", ",", "]")
      s"""WITH RECURSIVE
         |$bpeMergeLoopCtes,
         |toks AS (SELECT doc_id, ord, unnest(syms) AS tok,
         |           unnest(range(1, len(syms)+1)) AS p FROM fin),
         |ids AS (
         |  SELECT doc_id, ord, p,
         |    CASE WHEN length(tok) = 1 THEN unicode(tok)
         |         ELSE 255 + coalesce(nullif(list_position(
         |                [replace(m, ' ', '') for m in $mlist], tok), 0), -256)
         |    END AS id
         |  FROM toks),
         |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |          string_agg(id, ',' ORDER BY ord, p) AS ids_csv
         |        FROM ids GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
         |       coalesce(a.ids_csv, '') AS ids_csv
         |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    })

  /** Sequence packing driven by REAL BPE token counts — the
    * integration the tokenizer exists for: pack budgets measured in
    * actual model tokens, not whitespace words (a whitespace count
    * under-fills packs by the subword expansion factor). Same
    * shard-local packing shape as llm15; only the token measure
    * changes. The oracle replays the BPE loop for the counts, then
    * the identical packing window. */
  private def llm36 = Q("llm36_bpe_packing",
    (s, dir) => {
      val bpe = graft.llm.Tokenizer.fromMergesText(bpeMergesText)
      val d = Tables.documents(s, dir).select(col("doc_id"),
        size(graft.llm.Tokenizer.tokenIds(s, bpe)(col("text"))).cast("long").as("n_tokens"))
      val packed = Packing.packBudgeted(d, col("doc_id"), col("n_tokens"),
        seqLen = 512, nShards = 8)
      Packing.packManifest(packed, col("n_tokens"))
        .orderBy(col("shard"), col("pack_id"))
    },
    Some(s"""WITH RECURSIVE
            |$bpeMergeLoopCtes,
            |cnt AS (SELECT doc_id, CAST(sum(len(syms)) AS BIGINT) AS n_tokens
            |        FROM fin GROUP BY doc_id),
            |d AS (SELECT d.doc_id, coalesce(c.n_tokens, 0) AS n_tokens,
            |        (${Portable.duckHash64("d.doc_id")} % 8) AS shard
            |      FROM documents d LEFT JOIN cnt c ON c.doc_id = d.doc_id),
            |o AS (SELECT doc_id, n_tokens, shard,
            |        sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
            |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS off
            |      FROM d)
            |SELECT shard, CAST(off // 512 AS BIGINT) AS pack_id,
            |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
            |FROM o
            |GROUP BY 1, 2
            |ORDER BY shard, pack_id""".stripMargin))

  /** Gopher document-quality rules (TextAnalysis.gopher*): the public
    * web-corpus filter set — word-count bounds, mean word length,
    * symbol-to-word ratio, bullet/ellipsis line fractions, alpha-word
    * fraction, required-stopword hits — as ONE codegen'd projection
    * over the scan. Every metric is exact integer counts + a single
    * IEEE division, so the oracle reproduces them bit-for-bit. */
  private def llm37 = Q("llm37_gopher_rules",
    (s, dir) => {
      val t = TextAnalysis
      val d = Tables.documents(s, dir).select(col("doc_id"),
        t.tokenCount(col("text")).cast("long").as("n_words"),
        t.meanTokenLen(col("text")).as("mean_word_len"),
        t.symbolWordRatio(col("text")).as("symbol_ratio"),
        t.bulletLineFrac(col("text")).as("bullet_frac"),
        t.ellipsisLineFrac(col("text")).as("ellipsis_frac"),
        t.alphaWordFrac(col("text")).as("alpha_frac"),
        t.gopherStopwordHits(col("text")).cast("long").as("stop_hits"))
      // the synthetic corpus is ~10-100-word ASCII prose with a thin
      // stopword presence: keep the paper's structural thresholds,
      // tune the stopword floor to 1 so the gate discriminates here
      d.withColumn("pass", t.gopherPass(col("n_words"), col("mean_word_len"),
          col("symbol_ratio"), col("bullet_frac"), col("ellipsis_frac"),
          col("alpha_frac"), col("stop_hits"), minStopHits = 1))
        .orderBy(col("doc_id"))
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text,
           |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks,
           |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS ltoks,
           |    string_split(text, chr(10)) AS lines
           |  FROM documents),
           |m AS (
           |  SELECT doc_id,
           |    CAST(len(toks) AS BIGINT) AS n_words,
           |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
           |      / CAST(greatest(len(toks), 1) AS DOUBLE) AS mean_word_len,
           |    CAST((length(text) - length(replace(text, '#', '')))
           |         + ((length(text) - length(replace(text, '...', ''))) / 3) AS DOUBLE)
           |      / CAST(greatest(len(toks), 1) AS DOUBLE) AS symbol_ratio,
           |    CAST(len(list_filter(lines, l -> left(ltrim(l), 1) = '-'
           |           OR left(ltrim(l), 1) = '*' OR left(ltrim(l), 1) = '•')) AS DOUBLE)
           |      / CAST(greatest(len(lines), 1) AS DOUBLE) AS bullet_frac,
           |    CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...')
           |           OR ends_with(rtrim(l), '…'))) AS DOUBLE)
           |      / CAST(greatest(len(lines), 1) AS DOUBLE) AS ellipsis_frac,
           |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
           |      / CAST(greatest(len(toks), 1) AS DOUBLE) AS alpha_frac,
           |    CAST(CAST(list_contains(ltoks, 'the') AS INTEGER)
           |       + CAST(list_contains(ltoks, 'be') AS INTEGER)
           |       + CAST(list_contains(ltoks, 'to') AS INTEGER)
           |       + CAST(list_contains(ltoks, 'of') AS INTEGER)
           |       + CAST(list_contains(ltoks, 'and') AS INTEGER)
           |       + CAST(list_contains(ltoks, 'that') AS INTEGER)
           |       + CAST(list_contains(ltoks, 'have') AS INTEGER)
           |       + CAST(list_contains(ltoks, 'with') AS INTEGER) AS BIGINT) AS stop_hits
           |  FROM t)
           |SELECT *,
           |  (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
           |  AND (symbol_ratio < 0.1) AND (bullet_frac < 0.9)
           |  AND (ellipsis_frac < 0.3) AND (alpha_frac > 0.8)
           |  AND (stop_hits >= 1) AS pass
           |FROM m
           |ORDER BY doc_id""".stripMargin))

  /** C4-style line-level cleaning (TextAnalysis.c4CleanText): keep
    * prose-looking lines (terminal punctuation, ≥3 words, no
    * boilerplate markers), report per-document survival counts and
    * the md5 of the cleaned text — the content travels as a hash, so
    * the result stays narrow however large the documents are. The
    * corpus is single-line punctuation-free word soup, so the query
    * first synthesizes deterministic structure (llm21-style
    * planting): every 5-word run becomes a sentence line, and every
    * 5th document gets a planted boilerplate line that PASSES the
    * punctuation/word-count rules and is dropped by the
    * marker rule specifically. */
  private def llm38 = Q("llm38_c4_line_clean",
    (s, dir) => {
      val synth = concat(
        regexp_replace(col("text"), "((\\S+\\s+){4}\\S+)\\s*", "$1.\n"),
        when(col("doc_id") % 5 === 0,
          lit("\nenable javascript to view this page.")).otherwise(lit("")))
      val withLines = Tables.documents(s, dir)
        .select(col("doc_id"), synth.as("text"))
      val (nLines, nKept) = TextAnalysis.c4LineCounts(col("text"))
      withLines.select(col("doc_id"),
          nLines.cast("long").as("n_lines"),
          nKept.cast("long").as("n_kept"),
          md5(TextAnalysis.c4CleanText(col("text"))).as("clean_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH s AS (
           |  SELECT doc_id,
           |    regexp_replace(text, '((\S+\s+){4}\S+)\s*', '\1.' || chr(10), 'g')
           |      || CASE WHEN doc_id % 5 = 0
           |              THEN chr(10) || 'enable javascript to view this page.'
           |              ELSE '' END AS text
           |  FROM documents),
           |t AS (
           |  SELECT doc_id, string_split(text, chr(10)) AS lines FROM s),
           |k AS (
           |  SELECT doc_id, lines,
           |    list_filter(lines, l ->
           |      right(rtrim(l), 1) IN ('.', '!', '?', '"')
           |      AND len(list_filter(string_split_regex(l, '\s+'), w -> len(w) > 0)) >= 3
           |      AND NOT contains(lower(l), 'javascript')
           |      AND NOT contains(lower(l), 'lorem ipsum')
           |      AND NOT contains(l, '{')) AS kept
           |  FROM t)
           |SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
           |       CAST(len(kept) AS BIGINT) AS n_kept,
           |       md5(coalesce(array_to_string(kept, chr(10)), '')) AS clean_md5
           |FROM k
           |ORDER BY doc_id""".stripMargin))

  /** Cross-source overlap matrix (Dedup.sourceOverlap): distinct
    * 9-char shingles per source, pairwise shared counts +
    * containment — the provenance-leak diagnostic that flags
    * mirror-heavy source pairs before any per-document dedup.
    * Shingles travel as 8-byte hashes; the only doubles are one
    * division of exact counts. */
  private def llm39 = Q("llm39_source_overlap",
    (s, dir) => {
      Dedup.sourceOverlap(Tables.documents(s, dir), col("source"), col("text"), n = 9)
        .orderBy(col("source_a"), col("source_b"))
    },
    Some(s"""WITH sh AS (
            |  SELECT DISTINCT source, ${Portable.duckHash64("shingle")} AS h
            |  FROM (SELECT source, substr(text, i, 9) AS shingle
            |        FROM (SELECT source, text,
            |                unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i
            |              FROM documents))),
            |c AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
            |p AS (SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
            |      FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
            |      GROUP BY 1, 2)
            |SELECT source_a, source_b, n_shared,
            |       CAST(n_shared AS DOUBLE) / CAST(least(ca.n, cb.n) AS DOUBLE) AS containment
            |FROM p
            |JOIN c ca ON ca.source = p.source_a
            |JOIN c cb ON cb.source = p.source_b
            |ORDER BY source_a, source_b""".stripMargin))

  /** Product-quantization ANN: 64-dim embeddings compress to 8
    * one-byte codes (8 subspaces × 16 codewords from the 16 lowest-id
    * vectors); the query (lowest vec_id) scans via an ADC lookup
    * table folded into plan literals — per row: 8 int lookups, no
    * float math, no vector access. The oracle replays subspace
    * encode + LUT sum in plain SQL. */
  private def llm40 = Q("llm40_pq_ann",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val cb = Pq.seedCodebooks(emb, col("vec_id"), col("embedding"),
        dims = 64, m = 8, k = 16)
      val q = emb.orderBy(col("vec_id")).limit(1)
        .select(col("vec_id"), col("embedding")).collect().head
      val qid = q.getLong(0)
      val qq = Pq.quantize(q.get(1), 64)
      Pq.adcTopK(
        Pq.encode(emb, col("embedding"), cb).filter(col("vec_id") =!= qid),
        col("vec_id"), qq, cb, topK = 20)
    },
    Some("""WITH emb AS (SELECT vec_id,
           |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS qv
           |       FROM embeddings),
           |ms AS (SELECT unnest(range(0, 8)) AS m),
           |sub AS (SELECT vec_id, m, qv[m*8+1 : m*8+8] AS sv FROM emb, ms),
           |cb AS (SELECT m, CAST(row_number() OVER (PARTITION BY m ORDER BY vec_id) AS INT) - 1 AS cid, sv AS cv
           |       FROM sub WHERE vec_id IN (SELECT vec_id FROM emb ORDER BY vec_id LIMIT 16)),
           |qid AS (SELECT min(vec_id) AS qid FROM emb),
           |codes AS (SELECT vec_id, m, cid FROM (
           |  SELECT s.vec_id, s.m, c.cid,
           |         row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
           |           CAST(list_sum(list_transform(list_zip(s.sv, c.cv),
           |                z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT), c.cid) AS rn
           |  FROM sub s JOIN cb c ON s.m = c.m) t
           |  WHERE rn = 1),
           |lut AS (SELECT c.m, c.cid,
           |         CAST(list_sum(list_transform(list_zip(qs.sv, c.cv),
           |              z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS ld
           |       FROM cb c JOIN (SELECT m, sv FROM sub WHERE vec_id = (SELECT qid FROM qid)) qs
           |         ON qs.m = c.m)
           |SELECT k.vec_id, CAST(sum(l.ld) AS BIGINT) AS adist
           |FROM codes k JOIN lut l ON k.m = l.m AND k.cid = l.cid
           |WHERE k.vec_id <> (SELECT qid FROM qid)
           |GROUP BY k.vec_id
           |ORDER BY adist, vec_id
           |LIMIT 20""".stripMargin))

  /** One BPE TRAINING iteration (Tokenizer.pairStats): corpus-wide
    * adjacent character-pair counts over the distinct-word frequency
    * table, top-20 merge candidates. The corpus collapses to distinct
    * words FIRST (Zipf), so pair extraction never runs per occurrence;
    * llm35 applies a learned table, this is how the table is learned. */
  private def llm41 = Q("llm41_bpe_pair_stats",
    (s, dir) =>
      graft.llm.Tokenizer.pairStats(Tables.documents(s, dir), col("text"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(20),
    Some("""WITH words AS (
           |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS w FROM documents
           |), wf AS (
           |  SELECT w, count(*) AS f FROM words WHERE w <> '' GROUP BY w
           |), pairs AS (
           |  SELECT substr(w, unnest(generate_series(1, length(w)-1)), 2) AS pair, f
           |  FROM wf WHERE length(w) >= 2
           |)
           |SELECT pair, CAST(sum(f) AS BIGINT) AS cnt
           |FROM pairs GROUP BY pair
           |ORDER BY cnt DESC, pair LIMIT 20""".stripMargin))

  /** Bloom-prefiltered incremental dedup (Dedup.incrementalExactBloom):
    * llm33's daily-delta shape in its steady state, where the seen
    * index dwarfs the delta — a distributed-built bloom filter proves
    * most batch docs unseen without a join, and only the mightContain
    * minority pays the exact anti-join. Planted replays + fresh docs;
    * the oracle is the PLAIN anti-join (blooms have no false
    * negatives and positives are re-verified, so results are equal). */
  private def llm42 = Q("llm42_bloom_dedup",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val seen = d.filter(col("doc_id") < 400)
      val batch = d.filter(col("doc_id") >= 400)
        .unionByName(d.filter(col("doc_id") < 150)
          .select((col("doc_id") + 700000L).as("doc_id"), col("text")))
      Dedup.incrementalExactBloom(batch, col("text"), col("doc_id"),
          seen, col("text"), expectedItems = 500L, fpp = 0.01)
        .orderBy(col("keep_id"))
    },
    Some(s"""WITH seen AS (SELECT DISTINCT ${Portable.duckHash64("text")} AS content_hash
            |              FROM documents WHERE doc_id < 400),
            |batch AS (SELECT doc_id, text FROM documents WHERE doc_id >= 400
            |          UNION ALL SELECT doc_id + 700000, text FROM documents WHERE doc_id < 150),
            |h AS (SELECT doc_id, ${Portable.duckHash64("text")} AS content_hash FROM batch)
            |SELECT content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
            |FROM h WHERE content_hash NOT IN (SELECT content_hash FROM seen)
            |GROUP BY content_hash
            |ORDER BY keep_id""".stripMargin))

  /** Hashed-feature linear quality classifier
    * (TextAnalysis.hashedLinearLogit): the GPT-3/CCNet model-based
    * filter at inference time — tokens hash into 1024 buckets, the
    * doc's logit is the integer sum of bucket weights, the gate
    * thresholds it. Pure map, no shuffle; weights derived by formula
    * so the oracle recomputes them exactly. */
  private def llm43 = Q("llm43_classifier_gate",
    (s, dir) =>
      Tables.documents(s, dir).select(
          col("doc_id"),
          TextAnalysis.hashedLinearLogit(col("text")).as("logit"))
        .withColumn("kept", col("logit") >= 0L)
        .orderBy(col("doc_id")),
    Some(s"""SELECT doc_id,
            |  CAST(coalesce(list_aggregate(list_transform(
            |    list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0),
            |    t -> ${Portable.duckHash64(s"concat('wq:', CAST(${Portable.duckHash64("t")} % 1024 AS VARCHAR))")} % 1001 - 500), 'sum'), 0) AS BIGINT) AS logit,
            |  coalesce(list_aggregate(list_transform(
            |    list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0),
            |    t -> ${Portable.duckHash64(s"concat('wq:', CAST(${Portable.duckHash64("t")} % 1024 AS VARCHAR))")} % 1001 - 500), 'sum'), 0) >= 0 AS kept
            |FROM documents
            |ORDER BY doc_id""".stripMargin))

  /** Cluster-balanced sampling (Similarity.coarseCells +
    * Curation.keepCapPerGroup): assign embeddings to IVF coarse cells,
    * keep at most 20 per cell picked by deterministic hash rank — the
    * diversity-sampling step that stops a dominant mode from eating
    * the whole sample budget. Per-cell selection rides the
    * DISTRIBUTED exact-rank machinery (range partition + offsets),
    * never a per-cell single-task window. */
  private def llm44 = Q("llm44_balanced_sample",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val cells = graft.llm.Similarity.coarseCells(emb, "vec_id", "embedding",
        nCentroids = 16)
      Curation.keepCapPerGroup(cells, col("vec_id"), col("cell"),
          Sampling.unitInterval(col("vec_id"), "bal"), cap = 20)
        .orderBy(col("vec_id"))
    },
    Some(s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
            |cent AS (SELECT vec_id AS cent_id, embedding AS cent_vec FROM emb
            |         ORDER BY vec_id LIMIT 16),
            |ad AS (SELECT e.vec_id, cent_id,
            |         -${duckQCos("e.embedding", "cent_vec")} AS d
            |       FROM emb e CROSS JOIN cent),
            |assigned AS (SELECT vec_id, cent_id AS cell FROM (
            |  SELECT vec_id, cent_id,
            |         row_number() OVER (PARTITION BY vec_id ORDER BY d, cent_id) AS rn
            |  FROM ad) t WHERE rn = 1),
            |ranked AS (SELECT vec_id, cell,
            |  row_number() OVER (PARTITION BY cell
            |    ORDER BY ${Sampling.duckUnitInterval("vec_id", "bal")} DESC, vec_id) AS rn
            |  FROM assigned)
            |SELECT vec_id, cell FROM ranked WHERE rn <= 20
            |ORDER BY vec_id""".stripMargin))

  /** BPE TRAINING loop end-to-end (Tokenizer.symbolPairStats):
    * iteration 1 counts code-point pairs over the distinct-word
    * table and learns merge #1 (the corpus argmax); iteration 2
    * re-runs the pair statistics with that merge APPLIED (the same
    * merge loop llm35 tokenizes with) and reports the top-10 next
    * candidates. The one-row argmax is the model hop — the learned
    * merge rides back broadcast, the corpus is never rescanned
    * (each iteration scans the Zipf-collapsed word table). The
    * oracle replays both iterations, learning the SAME merge from
    * the data with a recursive-CTE apply step. */
  private def llm45 = Q("llm45_bpe_train",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val p1 = graft.llm.Tokenizer.symbolPairStats(s, docs, col("text"),
        graft.llm.Tokenizer.Bpe(IndexedSeq.empty))
      // the learned model (one merge) hops the driver — k-sized, like
      // k-means centroids
      val top = p1.orderBy(col("cnt").desc, col("pair")).limit(1).head()
      val m1 = top.getString(0).split(" ", 2) match {
        case Array(x, y) => (x, y)
        case _ => sys.error(s"unsplittable learned pair '${top.getString(0)}'")
      }
      val p2 = graft.llm.Tokenizer.symbolPairStats(s, docs, col("text"),
        graft.llm.Tokenizer.Bpe(IndexedSeq(m1)))
      p1.orderBy(col("cnt").desc, col("pair")).limit(1)
        .select(lit(1).as("iter"), col("pair"), col("cnt"))
        .unionByName(p2.orderBy(col("cnt").desc, col("pair")).limit(10)
          .select(lit(2).as("iter"), col("pair"), col("cnt")))
        .orderBy(col("iter"), col("cnt").desc, col("pair"))
    },
    Some(s"""WITH RECURSIVE wf AS (
            |  SELECT w, count(*) AS f FROM (
            |    SELECT unnest(regexp_extract_all(lower(text),
            |      '${graft.llm.Tokenizer.WordPattern}')) AS w
            |    FROM documents) GROUP BY w),
            |s1 AS (SELECT w, f, str_split(w, '') AS syms FROM wf WHERE length(w) >= 2),
            |p1 AS (SELECT unnest([syms[i] || ' ' || syms[i+1] for i in range(1, len(syms))]) AS pair, f
            |       FROM s1),
            |c1 AS (SELECT pair, CAST(sum(f) AS BIGINT) AS cnt FROM p1 GROUP BY pair),
            |top1 AS (SELECT pair, cnt FROM c1 ORDER BY cnt DESC, pair LIMIT 1),
            |bpe(w, syms, step) AS (
            |  SELECT w, str_split(w, ''), 0 FROM wf WHERE length(w) >= 2
            |  UNION ALL
            |  SELECT w, syms[1:bi-1] || [syms[bi] || syms[bi+1]] || syms[bi+2:], step + 1
            |  FROM (SELECT w, syms, step,
            |          list_position(pr, list_min(pr)) AS bi, list_min(pr) AS br
            |        FROM (SELECT w, syms, step,
            |                [CASE WHEN syms[i] || ' ' || syms[i+1] = mpair
            |                      THEN 1 ELSE 9999999 END
            |                 for i in range(1, len(syms))] AS pr
            |              FROM (SELECT b.w, b.syms, b.step, t.pair AS mpair
            |                    FROM bpe b CROSS JOIN top1 t)))
            |  WHERE br < 9999999),
            |fin AS (SELECT w, max_by(syms, step) AS syms FROM bpe GROUP BY w),
            |p2 AS (SELECT unnest([syms[i] || ' ' || syms[i+1] for i in range(1, len(syms))]) AS pair, f
            |       FROM fin JOIN wf USING (w) WHERE len(syms) >= 2),
            |c2 AS (SELECT pair, CAST(sum(f) AS BIGINT) AS cnt FROM p2 GROUP BY pair
            |       ORDER BY cnt DESC, pair LIMIT 10)
            |SELECT 1 AS iter, pair, cnt FROM top1
            |UNION ALL SELECT 2 AS iter, pair, cnt FROM c2
            |ORDER BY iter, cnt DESC, pair""".stripMargin))

  /** Incremental NEAR-dedup (Dedup.incrementalNearDup): a delta batch
    * screens against the seen corpus's banded LSH index, candidates
    * Jaccard-verify, each flagged doc reports its best seen match —
    * the delta-ingestion form of llm09's pipeline (exact: llm33,
    * bloom: llm42). Planted: ' qx'-perturbed copies of seen docs in
    * the batch must all map back to their originals. */
  private def llm46 = Q("llm46_incremental_neardup",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val seen = d.filter(col("doc_id") < 300)
      val batch = d.filter(col("doc_id") >= 300)
        .unionByName(d.filter(col("doc_id") < 100)
          .select((col("doc_id") + 200000L).as("doc_id"),
                  concat(col("text"), lit(" qx")).as("text")))
      Dedup.incrementalNearDup(batch, col("doc_id"), col("text"),
          seen, col("doc_id"), col("text"),
          n = 9, k = 12, rowsPerBand = 4, threshold = 0.5)
        .orderBy(col("doc_id"))
    },
    Some {
      val hashes = (0 until 12).map(i =>
        s"${Portable.duckSeededHash("shingle", i)} AS h$i").mkString(",\n            ")
      val mins = (0 until 12).map(i => s"min(h$i) AS mh$i").mkString(", ")
      def bandRows(src: String) = (0 until 3).map { b =>
        val cols = (4 * b until 4 * (b + 1)).map(i => s"mh$i").mkString(", ")
        s"SELECT doc_id, $b AS band, ${Portable.duckHash64(s"concat_ws('_', $cols)")} AS bucket FROM $src"
      }.mkString("\n            UNION ALL ")
      s"""WITH seenc AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
         |batchc AS (SELECT doc_id, text FROM documents WHERE doc_id >= 300
         |           UNION ALL SELECT doc_id + 200000, text || ' qx'
         |           FROM documents WHERE doc_id < 100),
         |shS AS (SELECT DISTINCT doc_id, substr(text, i, 9) AS shingle
         |        FROM (SELECT doc_id, text,
         |                unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i
         |              FROM seenc)),
         |shB AS (SELECT DISTINCT doc_id, substr(text, i, 9) AS shingle
         |        FROM (SELECT doc_id, text,
         |                unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i
         |              FROM batchc)),
         |hS AS (SELECT doc_id, $hashes FROM shS),
         |hB AS (SELECT doc_id, $hashes FROM shB),
         |mhS AS (SELECT doc_id, $mins FROM hS GROUP BY doc_id),
         |mhB AS (SELECT doc_id, $mins FROM hB GROUP BY doc_id),
         |bkS AS (
         |            ${bandRows("mhS")}),
         |bkB AS (
         |            ${bandRows("mhB")}),
         |cand AS (SELECT DISTINCT b.doc_id, s.doc_id AS matched_id
         |         FROM bkB b JOIN bkS s ON b.band = s.band AND b.bucket = s.bucket),
         |szS AS (SELECT doc_id, count(*) AS n FROM shS GROUP BY doc_id),
         |szB AS (SELECT doc_id, count(*) AS n FROM shB GROUP BY doc_id),
         |inter AS (SELECT c.doc_id, c.matched_id, count(*) AS ni
         |          FROM cand c
         |          JOIN shB b ON b.doc_id = c.doc_id
         |          JOIN shS s ON s.doc_id = c.matched_id AND s.shingle = b.shingle
         |          GROUP BY c.doc_id, c.matched_id),
         |ver AS (SELECT i.doc_id, i.matched_id,
         |               CAST(i.ni AS DOUBLE) / CAST(sb.n + ss.n - i.ni AS DOUBLE) AS jaccard
         |        FROM inter i JOIN szB sb ON sb.doc_id = i.doc_id
         |                     JOIN szS ss ON ss.doc_id = i.matched_id
         |        WHERE CAST(i.ni AS DOUBLE) / CAST(sb.n + ss.n - i.ni AS DOUBLE) >= 0.5)
         |SELECT doc_id, matched_id, jaccard FROM (
         |  SELECT doc_id, matched_id, jaccard,
         |         row_number() OVER (PARTITION BY doc_id
         |           ORDER BY jaccard DESC, matched_id DESC) AS rn
         |  FROM ver) t
         |WHERE rn = 1
         |ORDER BY doc_id""".stripMargin
    })

  /** KMV cross-source overlap estimation (Sketches.kmvOverlap): every
    * source pair's distinct-shingle Jaccard + intersection cardinality
    * estimated from per-source k-minimum-value sketches — the
    * CONSTANT-STATE companion to llm39's exact containment (which
    * shuffles every distinct shingle hash; this reduces each source to
    * k=256 longs first, so two 100 TB corpora compare in two scans +
    * an O(sources²·k) combine). Same 9-char shingles as llm39; the
    * oracle replays the order statistics and the estimator's exact
    * IEEE steps. */
  private def llm47 = Q("llm47_kmv_overlap",
    (s, dir) => {
      val sh = Dedup.atWidth(Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), col("text")), col("doc_id"))
        .select(col("source"),
          explode(sequence(lit(1), greatest(length(col("text")) - 8, lit(1)))).as("i"),
          col("text"))
        .select(col("source"), col("text").substr(col("i"), lit(9)).as("shingle"))
      graft.llm.Sketches.kmvOverlap(sh, col("source"), col("shingle"), k = 256)
        .orderBy(col("source_a"), col("source_b"))
    },
    Some(s"""WITH sh AS (
            |  SELECT DISTINCT source, ${Portable.duckHash64("shingle")} AS h
            |  FROM (SELECT source, substr(text, i, 9) AS shingle
            |        FROM (SELECT source, text,
            |                unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i
            |              FROM documents))),
            |r AS (SELECT source, h,
            |        row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM sh),
            |sk AS (SELECT source, list_sort(list(h)) AS kmv
            |       FROM r WHERE rn <= 256 GROUP BY source),
            |p AS (SELECT a.source AS source_a, b.source AS source_b,
            |        a.kmv AS ka, b.kmv AS kb
            |      FROM sk a JOIN sk b ON a.source < b.source),
            |c AS (SELECT source_a, source_b, ka, kb,
            |        list_sort(list_distinct(list_concat(ka, kb)))[1:256] AS u FROM p),
            |e AS (SELECT source_a, source_b,
            |        CAST(len(u) AS BIGINT) AS k_used,
            |        CASE WHEN len(u) < 256 THEN CAST(len(u) AS DOUBLE)
            |             ELSE 255.0 * 1152921504606846976.0 / CAST(u[len(u)] AS DOUBLE)
            |        END AS d_union_est,
            |        CAST(len(list_filter(u, x -> list_contains(ka, x)
            |                                 AND list_contains(kb, x))) AS DOUBLE)
            |          / CAST(len(u) AS DOUBLE) AS jaccard_est
            |      FROM c)
            |SELECT source_a, source_b, k_used, d_union_est, jaccard_est,
            |       jaccard_est * d_union_est AS intersect_est
            |FROM e ORDER BY source_a, source_b""".stripMargin))

  /** Two-stage PQ ANN (Pq.adcRerankTopK): ADC code-scan shortlist of
    * 50 candidates (llm40's map-only stage), then EXACT quantized
    * cosine re-rank of just those 50 against the raw query — the
    * production PQ shape where shortlist recall is the only
    * approximation and raw vectors are touched (and shuffled) only
    * for the shortlist. Same 8×16 codebooks and lowest-vec_id query
    * as llm40; the oracle replays encode + LUT shortlist + the llm03
    * exact-cosine formula. */
  private def llm48 = Q("llm48_pq_rerank",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val cb = Pq.seedCodebooks(emb, col("vec_id"), col("embedding"),
        dims = 64, m = 8, k = 16)
      val q = emb.orderBy(col("vec_id")).limit(1)
        .select(col("vec_id"), col("embedding")).collect().head
      val qid = q.getLong(0)
      Pq.adcRerankTopK(
        Pq.encode(emb, col("embedding"), cb).filter(col("vec_id") =!= qid),
        col("vec_id"), col("embedding"), q.getSeq[Float](1), cb,
        shortlist = 50, topK = 10)
    },
    Some("""WITH emb AS (SELECT vec_id,
           |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS qv
           |       FROM embeddings),
           |ms AS (SELECT unnest(range(0, 8)) AS m),
           |sub AS (SELECT vec_id, m, qv[m*8+1 : m*8+8] AS sv FROM emb, ms),
           |cb AS (SELECT m, CAST(row_number() OVER (PARTITION BY m ORDER BY vec_id) AS INT) - 1 AS cid, sv AS cv
           |       FROM sub WHERE vec_id IN (SELECT vec_id FROM emb ORDER BY vec_id LIMIT 16)),
           |qid AS (SELECT min(vec_id) AS qid FROM emb),
           |codes AS (SELECT vec_id, m, cid FROM (
           |  SELECT s.vec_id, s.m, c.cid,
           |         row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
           |           CAST(list_sum(list_transform(list_zip(s.sv, c.cv),
           |                z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT), c.cid) AS rn
           |  FROM sub s JOIN cb c ON s.m = c.m) t
           |  WHERE rn = 1),
           |lut AS (SELECT c.m, c.cid,
           |         CAST(list_sum(list_transform(list_zip(qs.sv, c.cv),
           |              z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS ld
           |       FROM cb c JOIN (SELECT m, sv FROM sub WHERE vec_id = (SELECT qid FROM qid)) qs
           |         ON qs.m = c.m),
           |short AS (SELECT k.vec_id
           |          FROM codes k JOIN lut l ON k.m = l.m AND k.cid = l.cid
           |          WHERE k.vec_id <> (SELECT qid FROM qid)
           |          GROUP BY k.vec_id
           |          ORDER BY CAST(sum(l.ld) AS BIGINT), k.vec_id
           |          LIMIT 50),
           |qvec AS (SELECT qv AS q FROM emb WHERE vec_id = (SELECT qid FROM qid)),
           |rer AS (SELECT e.vec_id,
           |          CAST(list_sum(list_transform(list_zip(e.qv, qvec.q), z -> z[1]*z[2])) AS DOUBLE)
           |          / (sqrt(CAST(list_sum(list_transform(e.qv, x -> x*x)) AS DOUBLE))
           |             * sqrt(CAST(list_sum(list_transform(qvec.q, x -> x*x)) AS DOUBLE))) AS sim
           |        FROM emb e CROSS JOIN qvec
           |        WHERE e.vec_id IN (SELECT vec_id FROM short))
           |SELECT vec_id, sim FROM rer
           |ORDER BY sim DESC, vec_id
           |LIMIT 10""".stripMargin))

  /** Normalization-robust exact dedup (Dedup.normalizedExact): the
    * "fuzzy-exact" tier — lowercase + ASCII-punctuation strip +
    * whitespace collapse before the content hash, catching the
    * case-flipped / punctuation-noised / reflowed copies raw llm01
    * misses while staying a pure map + one 8-byte-hash shuffle.
    * Planted perturbed copies (uppercased, '!!'-suffixed) collapse
    * onto their originals. */
  private def llm49 = Q("llm49_normalized_dedup",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val pert = d.filter(col("doc_id") < 200)
        .select((col("doc_id") + 300000L).as("doc_id"),
                concat(upper(col("text")), lit("!!")).as("text"))
      graft.llm.Dedup.normalizedExact(d.unionByName(pert), col("text"), col("doc_id"))
        .orderBy(col("keep_id"))
    },
    Some(s"""WITH a AS (SELECT doc_id, text FROM documents
            |           UNION ALL SELECT doc_id + 300000, upper(text) || '!!'
            |           FROM documents WHERE doc_id < 200),
            |n AS (SELECT doc_id,
            |        trim(regexp_replace(regexp_replace(lower(text),
            |          '[^a-z0-9 \\t\\n\\r]', '', 'g'), '[ \\t\\n\\r]+', ' ', 'g')) AS ntext
            |      FROM a)
            |SELECT ${Portable.duckHash64("ntext")} AS content_hash,
            |       min(doc_id) AS keep_id, count(*) AS n_copies
            |FROM n
            |GROUP BY 1
            |ORDER BY keep_id""".stripMargin))

  /** SEMANTIC eval-set decontamination
    * (Similarity.semanticContamination): embedding-cosine leakage
    * detection — the paraphrase-robust companion to llm16's rare
    * n-gram overlap. Eval set = 40 planted copies of training vectors
    * (contaminated) + 20 negated vectors (clean); both corpora assign
    * to the train-side deterministic coarse quantizer and similarity
    * runs within cells only. Every planted copy must surface with its
    * original as best match. */
  private def llm50 = Q("llm50_semantic_decontam",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val evalSet = emb.filter(col("vec_id") < 40)
        .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
        .unionByName(emb.filter(col("vec_id") >= 40 && col("vec_id") < 60)
          .select((col("vec_id") + 600000L).as("vec_id"),
                  transform(col("embedding"), x => -x).as("embedding")))
      graft.llm.Similarity.semanticContamination(evalSet, "vec_id", "embedding",
          emb, "vec_id", "embedding", nCentroids = 16, simThreshold = 0.9)
        .orderBy(col("eval_id"))
    },
    Some(s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
            |ev AS (SELECT vec_id + 500000 AS eval_id, embedding FROM emb WHERE vec_id < 40
            |       UNION ALL
            |       SELECT vec_id + 600000, list_transform(embedding, x -> -x)
            |       FROM emb WHERE vec_id >= 40 AND vec_id < 60),
            |cent AS (SELECT vec_id AS cent_id, embedding AS cent_vec
            |         FROM emb ORDER BY vec_id LIMIT 16),
            |at AS (SELECT vec_id, cent_id AS cell FROM (
            |  SELECT t.vec_id, c.cent_id,
            |         row_number() OVER (PARTITION BY t.vec_id
            |           ORDER BY -${duckQCos("t.embedding", "c.cent_vec")}, c.cent_id) AS rn
            |  FROM emb t CROSS JOIN cent c) x WHERE rn = 1),
            |ae AS (SELECT eval_id, cent_id AS cell FROM (
            |  SELECT e.eval_id, c.cent_id,
            |         row_number() OVER (PARTITION BY e.eval_id
            |           ORDER BY -${duckQCos("e.embedding", "c.cent_vec")}, c.cent_id) AS rn
            |  FROM ev e CROSS JOIN cent c) x WHERE rn = 1),
            |pr AS (SELECT ae.eval_id, at.vec_id AS train_id,
            |         ${duckQCos("e.embedding", "t.embedding")} AS sim
            |       FROM ev e JOIN ae ON ae.eval_id = e.eval_id
            |       JOIN at ON at.cell = ae.cell
            |       JOIN emb t ON t.vec_id = at.vec_id)
            |SELECT eval_id, train_id, sim FROM (
            |  SELECT eval_id, train_id, sim,
            |         row_number() OVER (PARTITION BY eval_id
            |           ORDER BY sim DESC, train_id) AS rn
            |  FROM pr WHERE sim >= 0.9) z
            |WHERE rn = 1
            |ORDER BY eval_id""".stripMargin))

  /** Model-based quality filter TRAINING
    * (TextAnalysis.perceptronStep): TWO distributed batch-perceptron
    * steps learning to separate English documents from the rest over
    * 1024 hashed bag-of-words buckets — the training companion to
    * llm43's fixed-weight inference. Every quantity is an exact
    * integer (the perceptron's classic form — no learning-rate float,
    * no sigmoid on the engine boundary), so the oracle re-learns the
    * identical weight table: step 1 from zero weights (score 0
    * predicts −1 → exactly the y=+1 docs misclassify), step 2 scores
    * with the learned table via the broadcast join and updates from
    * its misclassified set. */
  private val llm51Slot = new TrackerSlot
  private def llm51 = Q("llm51_perceptron_train",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"),
          when(col("lang") === "en", 1L).otherwise(-1L).as("y"))
      graft.llm.TextAnalysis.perceptronTrain(d, col("doc_id"), col("text"), col("y"),
          epochs = 2, tracker = Some(llm51Slot.fresh()))
        .orderBy(col("bucket"))
    },
    Some(s"""WITH d AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y, text
            |           FROM documents),
            |tk AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
            |                             x -> len(x) > 0)) AS tok FROM d),
            |f AS (SELECT doc_id, ${Portable.duckHash64("tok")} % 1024 AS bucket,
            |        count(*) AS cnt FROM tk GROUP BY 1, 2),
            |lb AS (SELECT doc_id, y FROM d),
            |g1 AS (SELECT bucket, sum(y * cnt) AS w FROM f JOIN lb USING (doc_id)
            |       WHERE y > 0 GROUP BY bucket),
            |s2 AS (SELECT f.doc_id, sum(f.cnt * coalesce(g1.w, 0)) AS score
            |       FROM f LEFT JOIN g1 USING (bucket) GROUP BY 1),
            |m2 AS (SELECT s2.doc_id FROM s2 JOIN lb USING (doc_id)
            |       WHERE (score > 0 AND y < 0) OR (score <= 0 AND y > 0)),
            |g2 AS (SELECT bucket, sum(y * cnt) AS dw FROM f JOIN lb USING (doc_id)
            |       WHERE doc_id IN (SELECT doc_id FROM m2) GROUP BY bucket)
            |SELECT bucket, CAST(w AS BIGINT) AS w FROM (
            |  SELECT coalesce(g1.bucket, g2.bucket) AS bucket,
            |         coalesce(g1.w, 0) + coalesce(g2.dw, 0) AS w
            |  FROM g1 FULL JOIN g2 ON g1.bucket = g2.bucket) t
            |WHERE w <> 0
            |ORDER BY bucket""".stripMargin),
    cleanup = Some(_ => llm51Slot.drain()))

  /** Temperature-scaled source mixing (Sampling.temperatureMix, α=1/2):
    * each source's token budget DERIVES from its size —
    * total·⌊√n_s⌋/Σ⌊√n_t⌋, the up-weight-small-sources exponent of
    * corpus assembly — then admission runs in llm18's deterministic
    * hash order. Integer weights keep the derivation engine-exact;
    * the oracle recomputes budgets and replays the admission window. */
  private def llm52 = Q("llm52_temperature_mix",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      Sampling.temperatureMix(d, col("doc_id"), col("source"), col("n_tokens"),
          totalTokens = 20000L)
        .orderBy(col("doc_id"))
    },
    Some {
      val u = Sampling.duckUnitInterval("doc_id", "tmix")
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens,
         |    $u AS u
         |  FROM documents),
         |b AS (SELECT source,
         |        CAST(floor(sqrt(CAST(sum(n_tokens) AS DOUBLE))) AS BIGINT) AS wt
         |      FROM d GROUP BY source),
         |tw AS (SELECT CAST(sum(wt) AS BIGINT) AS tot FROM b),
         |q AS (SELECT source, (20000 * wt) // tot AS budget FROM b CROSS JOIN tw),
         |w AS (SELECT doc_id, source, n_tokens,
         |        sum(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cb
         |      FROM d)
         |SELECT w.doc_id, w.source, w.n_tokens FROM w JOIN q USING (source)
         |WHERE cb < budget
         |ORDER BY doc_id""".stripMargin
    })

  /** Topic labeling: characteristic terms PER EMBEDDING CLUSTER — the
    * human-readable face of llm30's topic clustering. Documents join
    * their vectors' deterministic coarse cells (llm44's quantizer, 8
    * cells), then llm22's integer-exact (tf desc, df asc, term)
    * ranking runs with the CELL as the group — topTerms aggregates by
    * (group, term) so many-docs-per-group needs no new code, and the
    * ranked frame is cells×vocab sized (never corpus-sized). */
  private def llm53 = Q("llm53_topic_terms",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val cells = graft.llm.Similarity.coarseCells(emb, "vec_id", "embedding",
        nCentroids = 8)
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        .join(cells, col("doc_id") === col("vec_id"))
      TextAnalysis.topTerms(d, col("cell"), col("text"), k = 5)
        .withColumnRenamed("doc_id", "cell")
        .orderBy(col("cell"), col("rank"))
    },
    Some(s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings),
            |cent AS (SELECT vec_id AS cent_id, embedding AS cent_vec
            |         FROM emb ORDER BY vec_id LIMIT 8),
            |ad AS (SELECT e.vec_id, cent_id,
            |         -${duckQCos("e.embedding", "cent_vec")} AS d
            |       FROM emb e CROSS JOIN cent),
            |assigned AS (SELECT vec_id, cent_id AS cell FROM (
            |  SELECT vec_id, cent_id,
            |         row_number() OVER (PARTITION BY vec_id ORDER BY d, cent_id) AS rn
            |  FROM ad) t WHERE rn = 1),
            |d AS (SELECT cell, text FROM documents JOIN assigned ON doc_id = vec_id),
            |tk AS (SELECT cell, unnest(list_filter(string_split_regex(text, '\\s+'),
            |                           x -> len(x) > 0)) AS term FROM d),
            |tf AS (SELECT cell, term, count(*) AS tf FROM tk GROUP BY 1, 2),
            |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
            |SELECT cell, rank, term, tf, df FROM (
            |  SELECT tf.cell, CAST(row_number() OVER (PARTITION BY tf.cell
            |           ORDER BY tf.tf DESC, dfq.df ASC, tf.term ASC) AS INT) AS rank,
            |         tf.term, tf.tf, dfq.df
            |  FROM tf JOIN dfq USING (term)) r
            |WHERE rank <= 5
            |ORDER BY cell, rank""".stripMargin))

  /** Filter-funnel report (Curation.filterFunnel): per-rule isolated
    * drop counts + cumulative survival through the rule chain — the
    * curation diagnostic corpus papers publish. One scan, one global
    * aggregate of conditional sums; all-integer, so the oracle
    * replays each rule verbatim. Rules: ≥40 words, mean word length
    * <10 chars (as the integer inequality chars < 10·words), contains
    * a lowercase letter, ≤5000 chars. */
  private def llm54 = Q("llm54_filter_funnel",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val nTok = TextAnalysis.tokenCount(col("text")).cast("long")
      Curation.filterFunnel(d, Seq(
        "min_words" -> (nTok >= 40L),
        "mean_word_len" -> (length(col("text")).cast("long") < nTok * 10L),
        "has_lowercase" -> col("text").rlike("[a-z]"),
        "max_chars" -> (length(col("text")).cast("long") <= 5000L)))
    },
    Some("""WITH d AS (SELECT text,
           |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS nt,
           |    CAST(length(text) AS BIGINT) AS nc,
           |    regexp_matches(text, '[a-z]') AS has_lc
           |  FROM documents),
           |f AS (SELECT nt >= 40 AS r1, nc < nt * 10 AS r2, has_lc AS r3, nc <= 5000 AS r4 FROM d)
           |SELECT count(*) AS n_docs,
           |  CAST(sum(CASE WHEN NOT r1 THEN 1 ELSE 0 END) AS BIGINT) AS fail_min_words,
           |  CAST(sum(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT) AS survive_min_words,
           |  CAST(sum(CASE WHEN NOT r2 THEN 1 ELSE 0 END) AS BIGINT) AS fail_mean_word_len,
           |  CAST(sum(CASE WHEN r1 AND r2 THEN 1 ELSE 0 END) AS BIGINT) AS survive_mean_word_len,
           |  CAST(sum(CASE WHEN NOT r3 THEN 1 ELSE 0 END) AS BIGINT) AS fail_has_lowercase,
           |  CAST(sum(CASE WHEN r1 AND r2 AND r3 THEN 1 ELSE 0 END) AS BIGINT) AS survive_has_lowercase,
           |  CAST(sum(CASE WHEN NOT r4 THEN 1 ELSE 0 END) AS BIGINT) AS fail_max_chars,
           |  CAST(sum(CASE WHEN r1 AND r2 AND r3 AND r4 THEN 1 ELSE 0 END) AS BIGINT) AS survive_max_chars
           |FROM f""".stripMargin))

  /** Corpus freeze manifest (CorpusReport.freezeManifest): per
    * deterministic hash shard — doc count, token sum, bit_xor content
    * fingerprint, min/max hash. The reproducibility artifact recorded
    * before a training run: re-run anywhere and a differing row
    * pinpoints the drifted shard without moving the corpus.
    * Order-insensitive and overflow-free, so partitioning never
    * changes a byte. */
  private def llm55 = Q("llm55_freeze_manifest",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      graft.llm.CorpusReport.freezeManifest(d, col("doc_id"), col("text"),
          TextAnalysis.tokenCount(col("text")), nShards = 16)
        .orderBy(col("shard"))
    },
    Some(s"""WITH d AS (SELECT
            |    ${Portable.duckHash64("concat('shard:', CAST(doc_id AS VARCHAR))")} % 16 AS shard,
            |    ${Portable.duckHash64("text")} AS h,
            |    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS BIGINT) AS nt
            |  FROM documents)
            |SELECT shard, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
            |       bit_xor(h) AS fingerprint, min(h) AS min_h, max(h) AS max_h
            |FROM d GROUP BY shard
            |ORDER BY shard""".stripMargin))

  /** SFT data prep (Sft.renderChatTemplate / promptBoundaryChars):
    * documents become 3-turn conversations (system / user=first 120
    * chars / assistant=next 240), rendered to the flat
    * `<|role|>\ncontent<|end|>\n` training text with the loss-mask
    * boundary at the final assistant turn, plus BPE-ish token counts
    * for the whole text and the masked prompt prefix. Pure string
    * Column algebra; the oracle replays the template concatenation
    * and the boundary arithmetic. */
  private def llm56 = Q("llm56_chat_template",
    (s, dir) => {
      val msgs = array(
        struct(lit("system").as("role"),
               lit("You are a helpful assistant.").as("content")),
        struct(lit("user").as("role"),
               substring(col("text"), 1, 120).as("content")),
        struct(lit("assistant").as("role"),
               substring(col("text"), 121, 240).as("content")))
      val sft = graft.llm.Sft
      Tables.documents(s, dir)
        .select(col("doc_id"),
          sft.renderChatTemplate(msgs).as("rendered"),
          sft.promptBoundaryChars(msgs).as("boundary"))
        .select(col("doc_id"), col("rendered"), col("boundary"),
          TextAnalysis.bpeishTokenCount(col("rendered")).as("n_tokens"),
          TextAnalysis.bpeishTokenCount(
            substring(col("rendered"), lit(1), col("boundary"))).as("n_prompt_tokens"))
        .orderBy(col("doc_id"))
    },
    Some {
      val pat = TextAnalysis.BpeishPattern.replace("'", "''")
      s"""WITH r AS (
         |  SELECT doc_id,
         |    concat('<|system|>', chr(10), 'You are a helpful assistant.', '<|end|>', chr(10),
         |           '<|user|>', chr(10), substr(text, 1, 120), '<|end|>', chr(10)) AS prefix,
         |    concat('<|assistant|>', chr(10), substr(text, 121, 240), '<|end|>', chr(10)) AS comp
         |  FROM documents),
         |x AS (SELECT doc_id, prefix || comp AS rendered,
         |             CAST(length(prefix) AS INT) AS boundary FROM r)
         |SELECT doc_id, rendered, boundary,
         |  CAST(len(regexp_extract_all(rendered, '$pat')) AS INT) AS n_tokens,
         |  CAST(len(regexp_extract_all(substr(rendered, 1, boundary), '$pat')) AS INT) AS n_prompt_tokens
         |FROM x
         |ORDER BY doc_id""".stripMargin
    })

  /** Vocabulary-growth (Heaps'-law) curve (CorpusStats.vocabGrowth):
    * running distinct-term count vs running token count at 50-doc
    * checkpoints — the is-this-source-saturating diagnostic. Terms
    * shuffle once as 8-byte hashes (min(doc_id) per term); the
    * cumulative window crosses only the tiny bin frame. */
  private def llm57 = Q("llm57_vocab_growth",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      graft.llm.CorpusStats.vocabGrowth(d, col("doc_id"), col("text"), binWidth = 50L)
        .orderBy(col("checkpoint"))
    },
    Some(s"""WITH t AS (SELECT doc_id,
            |            unnest(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS term
            |           FROM documents),
            |h AS (SELECT doc_id, ${Portable.duckHash64("term")} AS h FROM t),
            |f AS (SELECT h, min(doc_id) AS fd FROM h GROUP BY h),
            |nb AS (SELECT fd - fd % 50 + 50 AS checkpoint,
            |              CAST(count(*) AS BIGINT) AS n_new_terms FROM f GROUP BY 1),
            |tb AS (SELECT doc_id - doc_id % 50 + 50 AS checkpoint,
            |              CAST(count(*) AS BIGINT) AS n_tokens FROM h GROUP BY 1),
            |b AS (SELECT tb.checkpoint, coalesce(nb.n_new_terms, 0) AS n_new_terms, tb.n_tokens
            |      FROM tb LEFT JOIN nb USING (checkpoint))
            |SELECT checkpoint, n_new_terms, n_tokens,
            |  CAST(sum(n_new_terms) OVER (ORDER BY checkpoint) AS BIGINT) AS vocab_size,
            |  CAST(sum(n_tokens) OVER (ORDER BY checkpoint) AS BIGINT) AS cum_tokens
            |FROM b ORDER BY checkpoint""".stripMargin))

  /** BPE fertility histogram (Tokenizer.wordTokenCounts): per source,
    * how many words resolve to 1 / 2 / 3 / 4+ model tokens under the
    * llm35 merge table — the tokenizer-fit diagnostic (fertility ≈ 1
    * means the vocabulary covers the source; mass at 4+ means words
    * shatter). Map-only over the broadcast table + one tiny
    * (source, bucket) aggregate; the oracle reads each word's symbol
    * count off the SAME recursive-CTE merge replay llm35 pins. */
  private def llm58 = Q("llm58_bpe_fertility",
    (s, dir) => {
      val bpe = graft.llm.Tokenizer.fromMergesText(bpeMergesText)
      Tables.documents(s, dir)
        .select(col("source"),
          graft.llm.Tokenizer.wordTokenCounts(s, bpe)(col("text")).as("__wtc"))
        .select(col("source"), explode(col("__wtc")).as("__c"))
        .groupBy(col("source"), least(col("__c"), lit(4)).as("tokens_per_word"))
        .agg(count(lit(1)).as("n_words"))
        .orderBy(col("source"), col("tokens_per_word"))
    },
    Some(s"""WITH RECURSIVE
            |$bpeMergeLoopCtes,
            |w AS (SELECT d.source, CAST(least(len(f.syms), 4) AS INT) AS tokens_per_word
            |      FROM fin f JOIN documents d USING (doc_id))
            |SELECT source, tokens_per_word, CAST(count(*) AS BIGINT) AS n_words
            |FROM w GROUP BY source, tokens_per_word
            |ORDER BY source, tokens_per_word""".stripMargin))

  /** DoReMi-style domain reweighting (Sampling.domainReweight): 8
    * multiplicative-weights rounds over per-source mean quality
    * DEFICIT (the hardest domains gain weight) — the mixture-
    * optimization step between corpus diagnosis and corpus assembly.
    * One corpus scan (per-domain count/Σloss hash aggregate); the
    * iteration runs on k domain scalars in exact scaled int64, so the
    * oracle unrolls all 8 rounds as CTE stages and matches
    * bit-for-bit. */
  private def llm59 = Q("llm59_domain_reweight",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val lq = lit(1000000L) -
        floor(TextAnalysis.qualityScore(col("text")) * lit(1e6)).cast("long")
      Sampling.domainReweight(d, col("source"), lq, iters = 8)
        .orderBy(col("source"))
    },
    Some(s"""WITH $duckDomainWeightCtes
            |SELECT source, n_docs, ell AS loss_q, CAST(w AS BIGINT) AS weight_q,
            |       CAST(w AS DOUBLE) / 1e9 AS weight
            |FROM w8 ORDER BY source""".stripMargin))

  /** The DuckDB replay of Sampling.domainReweight's 8
    * multiplicative-weights rounds over per-source quality deficit —
    * CTEs ending in `qd(doc_id, source, q6, lq)` and
    * `w8(source, n_docs, ell, w)`; shared by llm59 (the weights) and
    * llm62 (the schedule built FROM the weights). Each stage
    * references ONLY its predecessor, and exactly once, with window
    * aggregates instead of scalar subqueries: DuckDB inlines (does
    * not materialize) CTEs, so a stage referencing its predecessor
    * twice expands the tree 2^iters-fold — at 8 rounds that is 65k
    * scans of `documents` and an fd blowout. */
  private def duckDomainWeightCtes: String = {
    val S = "1000000000"
    val iterCtes = (1 to 8).map { i =>
      val p = if (i == 1) "w0" else s"w${i - 1}"
      s"""u$i AS (SELECT source, n_docs, ell,
         |          w * ($S + (ell - sum(w * ell) OVER () // $S) * 100) // $S AS u FROM $p),
         |w$i AS (SELECT source, n_docs, ell,
         |          u * $S // sum(u) OVER () AS w FROM u$i)""".stripMargin
    }.mkString(",\n")
    s"""qd AS (SELECT doc_id, source, q6, 1000000 - q6 AS lq FROM (
       |    SELECT doc_id, source,
       |      CAST(floor(((CAST(least(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)), 64) AS DOUBLE) / 64.0)
       |        * (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
       |                 / CAST(greatest(length(text), 1) AS DOUBLE))) * 1e6) AS BIGINT) AS q6
       |    FROM documents)),
       |d AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |        CAST(sum(lq) // count(*) AS BIGINT) AS ell FROM qd GROUP BY source),
       |w0 AS (SELECT source, n_docs, ell, $S // count(*) OVER () AS w FROM d),
       |$iterCtes""".stripMargin
  }

  /** Curriculum schedule (Curation.curriculumSchedule): llm59's
    * DoReMi weights turned into an actual TRAINING ORDER — quality
    * rank within source (one source-hash window), stride-scheduled
    * interleave across sources (rank·S/w in the overflow-free
    * (rank DIV w)·S + ((rank MOD w)·S) DIV w form), global order by
    * range-partitioned sort. The oracle rebuilds the identical weight
    * pyramid, then replays rank + stride arithmetic. */
  private def llm62 = Q("llm62_curriculum_schedule",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val q6 = floor(TextAnalysis.qualityScore(col("text")) * lit(1e6)).cast("long")
      val weights = Sampling.domainReweight(d, col("source"), lit(1000000L) - q6, iters = 8)
        .select(col("source"), col("weight_q"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      Curation.curriculumSchedule(d.select(col("doc_id"), col("source"), q6.as("q6")),
          col("doc_id"), col("source"), col("q6"), weights)
        .orderBy(col("position"), col("source"), col("rank_in_source"))
    },
    Some(s"""WITH $duckDomainWeightCtes,
            |r AS (SELECT doc_id, source, q6,
            |        CAST(row_number() OVER (PARTITION BY source ORDER BY q6 DESC, doc_id) AS BIGINT) AS rank_in_source
            |      FROM qd),
            |j AS (SELECT r.doc_id, r.source, r.rank_in_source, w8.w
            |      FROM r JOIN w8 USING (source))
            |SELECT doc_id, source, rank_in_source,
            |  CAST((rank_in_source // w) * 1000000000
            |       + (rank_in_source % w) * 1000000000 // w AS BIGINT) AS position
            |FROM j ORDER BY position, source, rank_in_source""".stripMargin))

  /** One-row dataset card (CorpusReport.datasetCard): the datasheet
    * corpus papers publish — volume, tokens, source/language breadth,
    * dup rate, mean quality, p50/p90 quality bins — ONE scan + ONE
    * global aggregate; the quantiles read off the in-row 32-bin
    * histogram with an `aggregate` fold, no second shuffle. */
  private def llm64 = Q("llm64_dataset_card",
    (s, dir) => CorpusReport.datasetCard(Tables.documents(s, dir),
      col("text"), col("source"), col("lang")),
    Some(s"""WITH d AS (SELECT
            |    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS BIGINT) AS nt,
            |    CAST(floor(((CAST(least(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)), 64) AS DOUBLE) / 64.0)
            |      * (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
            |               / CAST(greatest(length(text), 1) AS DOUBLE))) * 1e6) AS BIGINT) AS q6,
            |    source, lang, ${Portable.duckHash64("text")} AS h
            |  FROM documents),
            |b AS (SELECT *, least(q6 * 32 // 1000000, 31) AS bin FROM d),
            |g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
            |        CAST(sum(nt) AS BIGINT) AS n_tokens,
            |        CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
            |        CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
            |        CAST(count(DISTINCT h) AS BIGINT) AS nu,
            |        CAST(sum(q6) AS BIGINT) AS sq6
            |      FROM b),
            |hb AS (SELECT bin, count(*) AS c FROM b GROUP BY bin),
            |w AS (SELECT bin, CAST(sum(c) OVER (ORDER BY bin) AS BIGINT) AS cum FROM hb)
            |SELECT n_docs, n_tokens, n_sources, n_langs,
            |  CAST(n_docs - nu AS DOUBLE) / n_docs AS dup_rate,
            |  CAST(n_tokens AS DOUBLE) / n_docs AS avg_doc_tokens,
            |  CAST(sq6 AS DOUBLE) / n_docs / 1e6 AS avg_quality,
            |  CAST((SELECT min(bin) FROM w
            |        WHERE cum >= CAST(ceil(CAST(g.n_docs AS DOUBLE) * 0.5) AS BIGINT)) AS INT) AS p50_bin,
            |  CAST((SELECT min(bin) FROM w
            |        WHERE cum >= CAST(ceil(CAST(g.n_docs AS DOUBLE) * 0.9) AS BIGINT)) AS INT) AS p90_bin
            |FROM g""".stripMargin))

  /** Passage-dedup as a transformation (Dedup.scrubDuplicatePassages):
    * rebuilds every document with corpus-duplicated 8-token passages
    * removed, keep-first — llm21 measures this duplication, llm61
    * actually scrubs it. Half the corpus is planted as +200000-id
    * copies, so copies rebuild near-empty while originals survive
    * intact; the oracle replays chunking, keeper choice, and the
    * ORDER BY pos reassembly. */
  private def llm61 = Q("llm61_passage_scrub",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val half = d.filter(col("doc_id") < 250)
        .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
      Dedup.scrubDuplicatePassages(d.unionByName(half), col("doc_id"), col("text"), size = 8)
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH a AS (SELECT doc_id, text FROM documents
            |           UNION ALL SELECT doc_id + 200000, text FROM documents WHERE doc_id < 250),
            |t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS toks FROM a),
            |p AS (SELECT doc_id, unnest(range(1, len(toks)//8 + 1)) AS pos, toks FROM t),
            |p2 AS (SELECT doc_id, pos, array_to_string(toks[(pos-1)*8+1:pos*8], ' ') AS passage FROM p),
            |h AS (SELECT doc_id, pos, passage, ${Portable.duckHash64("passage")} AS hh FROM p2),
            |st AS (SELECT hh, count(DISTINCT doc_id) AS nd, min(doc_id) AS keeper FROM h GROUP BY hh),
            |k AS (SELECT doc_id, pos, passage, (nd < 2 OR doc_id = keeper) AS keep
            |      FROM h JOIN st USING (hh)),
            |r AS (SELECT doc_id,
            |        CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
            |        CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
            |        coalesce(string_agg(CASE WHEN keep THEN passage END, ' ' ORDER BY pos), '') AS text_scrubbed
            |      FROM k GROUP BY doc_id)
            |SELECT a.doc_id, coalesce(n_kept, 0) AS n_kept,
            |       coalesce(n_dropped, 0) AS n_dropped,
            |       coalesce(text_scrubbed, '') AS text_scrubbed
            |FROM a LEFT JOIN r USING (doc_id)
            |ORDER BY a.doc_id""".stripMargin))

  /** Sliding-span dedup as a transformation
    * (Dedup.scrubDuplicateSpans): Lee et al.'s exact-substring
    * REMOVAL — llm31 measures offset-shifted duplication, llm63
    * scrubs it. The planted duplicates are character-offset SUFFIX
    * copies (llm31's construction), invisible to aligned-chunk
    * scrubbing but covered token-for-token here; keep-first leaves
    * the originals intact. The oracle replays the position explode,
    * keeper choice, rows-frame coverage window, and ordered
    * reassembly. */
  private def llm63 = Q("llm63_span_scrub",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val tails = d.filter(col("doc_id") < 100)
        .select((col("doc_id") + 300000L).as("doc_id"),
          substring(col("text"), 101, 1000000).as("text"))
      Dedup.scrubDuplicateSpans(d.unionByName(tails), col("doc_id"), col("text"), n = 8)
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH a AS (SELECT doc_id, text FROM documents
            |           UNION ALL SELECT doc_id + 300000, substr(text, 101, 1000000)
            |           FROM documents WHERE doc_id < 100),
            |t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS toks FROM a),
            |pos AS (SELECT doc_id, unnest(range(1, len(toks)+1)) AS p, toks FROM t),
            |rws AS (SELECT doc_id, p, toks[p] AS tok,
            |          CASE WHEN p + 7 <= len(toks)
            |               THEN ${Portable.duckHash64("array_to_string(toks[p:p+7], ' ')")} END AS hh
            |        FROM pos),
            |st AS (SELECT hh, count(DISTINCT doc_id) AS nd, min(doc_id) AS keeper
            |       FROM rws WHERE hh IS NOT NULL GROUP BY hh),
            |f AS (SELECT r.doc_id, r.p, r.tok,
            |        CASE WHEN st.nd >= 2 AND r.doc_id <> st.keeper THEN 1 ELSE 0 END AS ds
            |      FROM rws r LEFT JOIN st USING (hh)),
            |cov AS (SELECT doc_id, p, tok,
            |          max(ds) OVER (PARTITION BY doc_id ORDER BY p
            |                        ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS c
            |        FROM f),
            |r2 AS (SELECT doc_id, count(*) AS n_tokens,
            |         CAST(sum(c) AS BIGINT) AS n_removed,
            |         coalesce(string_agg(CASE WHEN c = 0 THEN tok END, ' ' ORDER BY p), '') AS text_scrubbed
            |       FROM cov GROUP BY doc_id)
            |SELECT a.doc_id, coalesce(n_tokens, 0) AS n_tokens,
            |       coalesce(n_removed, 0) AS n_removed,
            |       coalesce(text_scrubbed, '') AS text_scrubbed
            |FROM a LEFT JOIN r2 USING (doc_id)
            |ORDER BY a.doc_id""".stripMargin))

  /** Greedy k-center diversity coreset (Clustering.kCenter): 6
    * farthest-first centers over the embeddings — the coverage-
    * maximizing selection rule of diversity/coreset sampling, dual to
    * llm29's SemDeDup (which REMOVES the close pairs this KEEPS the
    * spread of). Per round one codegen'd distance pass + a
    * TakeOrdered argmax; distances are exact int64 squared-L2 on the
    * quantization lattice, so the oracle unrolls the greedy selection
    * stage by stage. */
  private val llm60Slot = new TrackerSlot
  private def llm60 = Q("llm60_kcenter_coreset",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      Clustering.kCenter(emb, col("vec_id"), col("embedding"),
          dims = 64, k = 6, tracker = Some(llm60Slot.fresh()))
        .orderBy(col("sel_round"))
    },
    Some {
      def dist(a: String, b: String): String =
        s"CAST(list_sum(list_transform(list_zip($a, $b), z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT)"
      val stages = (1 until 6).map { r =>
        val prev = s"d${r - 1}"
        val sel = s"""s$r AS (SELECT vec_id, qv, md FROM $prev
                     |       ORDER BY md DESC, vec_id LIMIT 1)""".stripMargin
        val next = if (r < 5)
          s""",
             |d$r AS (SELECT p.vec_id, p.qv, least(p.md, ${dist("p.qv", "s.qv")}) AS md
             |        FROM $prev p CROSS JOIN s$r s)""".stripMargin
        else ""
        sel + next
      }.mkString(",\n")
      val unions = (1 until 6)
        .map(r => s"UNION ALL SELECT $r, vec_id, md FROM s$r").mkString("\n")
      s"""WITH emb AS (SELECT vec_id,
         |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS qv
         |       FROM embeddings),
         |c0 AS (SELECT vec_id, qv FROM emb ORDER BY vec_id LIMIT 1),
         |d0 AS (SELECT e.vec_id, e.qv, ${dist("e.qv", "c.qv")} AS md
         |       FROM emb e CROSS JOIN c0 c),
         |$stages,
         |sel AS (SELECT 0 AS sel_round, vec_id, CAST(0 AS BIGINT) AS dist_q FROM c0
         |$unions)
         |SELECT CAST(sel_round AS INT) AS sel_round, vec_id, CAST(dist_q AS BIGINT) AS dist_q
         |FROM sel ORDER BY sel_round""".stripMargin
    },
    cleanup = Some(_ => llm60Slot.drain()))

  /** TF-IDF keyword extraction (TextAnalysis.tfidfKeywords): top-3
    * characteristic terms per document by the QUANTIZED rational-idf
    * score — the scalar-scored sibling of llm22's lexicographic
    * (tf, df) rank, able to prefer a rarer lower-tf term. Ranking and
    * output both use the 1e-6-quantized integer score, so near-tie
    * order can't flip across engines. */
  private def llm65 = Q("llm65_tfidf_keywords",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      graft.llm.TextAnalysis.tfidfKeywords(d, col("doc_id"), col("text"), k = 3)
        .orderBy(col("doc_id"), col("rank"))
    },
    Some(
      """WITH t AS (SELECT doc_id,
        |            unnest(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS term
        |           FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (SELECT doc_id, term, tf, doc_freq,
        |         CAST(floor(CAST(tf AS DOUBLE) *
        |           ((CAST(n_docs AS DOUBLE) - CAST(doc_freq AS DOUBLE) + 0.5) /
        |            (CAST(doc_freq AS DOUBLE) + 0.5)) * 1000000.0) AS BIGINT) AS score_q
        |       FROM tf JOIN dfq USING (term) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score_q DESC, term) AS rank FROM sc)
        |SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, doc_freq, score_q
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin))

  /** Levenshtein verification of LSH candidates
    * (Dedup.levenshteinVerify): the character-exact final gate after
    * banded MinHash candidate generation — each original pairs with a
    * one-substitution twin (char 11 → '#'), which keeps most 9-gram
    * shingles (LSH still buckets the pair) while the edit distance
    * pins the actual mutation size. Texts cap at 120 chars so the DP
    * is constant per pair; Spark's threshold form early-abandons
    * anything provably past maxDist. */
  private def llm66 = Q("llm66_levenshtein_verify",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val corpus = d.unionByName(
        d.select((col("doc_id") + 100000L).as("doc_id"),
          concat(substring(col("text"), 1, 10), lit("#"),
                 expr("substring(text, 12)")).as("text")))
      val sigs = Dedup.minhashSignatureText(corpus, col("doc_id"), col("text"),
        n = 9, k = 12)
      val pairs = Dedup.candidatePairs(Dedup.lshBuckets(sigs, k = 12, rowsPerBand = 4))
      Dedup.levenshteinVerify(pairs, corpus, col("doc_id"), col("text"),
          capChars = 120, maxDist = 8)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some {
      val hashes = (0 until 12).map(i =>
        s"${Portable.duckSeededHash("shingle", i)} AS h$i").mkString(",\n            ")
      val mins = (0 until 12).map(i => s"min(h$i) AS mh$i").mkString(", ")
      val bandRows = (0 until 3).map { b =>
        val cols = (4 * b until 4 * (b + 1)).map(i => s"mh$i").mkString(", ")
        s"SELECT doc_id, $b AS band, ${Portable.duckHash64(s"concat_ws('_', $cols)")} AS bucket FROM mh"
      }.mkString("\n            UNION ALL ")
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 100000,
         |    substr(text, 1, 10) || '#' || substr(text, 12) FROM documents),
         |sh AS (SELECT DISTINCT doc_id, substr(text, i, 9) AS shingle
         |       FROM (SELECT doc_id, text,
         |               unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i
         |             FROM corpus)),
         |h AS (SELECT doc_id,
         |            $hashes
         |      FROM sh),
         |mh AS (SELECT doc_id, $mins FROM h GROUP BY doc_id),
         |bk AS (
         |            $bandRows),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |          FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
         |          WHERE a.doc_id < b.doc_id)
         |SELECT p.id_a, p.id_b,
         |       CAST(levenshtein(substr(ca.text, 1, 120), substr(cb.text, 1, 120)) AS INT) AS edit_dist
         |FROM pairs p
         |JOIN corpus ca ON ca.doc_id = p.id_a
         |JOIN corpus cb ON cb.doc_id = p.id_b
         |WHERE levenshtein(substr(ca.text, 1, 120), substr(cb.text, 1, 120)) <= 8
         |ORDER BY id_a, id_b""".stripMargin
    })

  /** Global token-budget selection (Curation.tokenBudgetSelect): keep
    * the best-scored documents until a 20k-token budget is spent (the corpus holds ~27k) —
    * the "best N tokens" corpus gate, rationing by token mass where
    * llm23 rations per-source by document fraction. The running token
    * total is the q20 distributed prefix sum over the quantized-score
    * axis (bucketed parallel windows, no global single-partition
    * window); the oracle states the same semantics as one
    * `SUM OVER (ORDER BY -score_q)` RANGE window. */
  private def llm67 = Q("llm67_token_budget_select",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"),
        floor(graft.llm.TextAnalysis.qualityScore(col("text")) * lit(1e9))
          .cast("long").as("score_q"),
        graft.llm.TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.llm.Curation.tokenBudgetSelect(d, col("doc_id"), col("score_q"),
          col("n_tokens"), budgetTokens = 20000L)
        .orderBy(col("doc_id"))
    },
    Some(
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(floor(
        |      (CAST(least(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)), 64) AS DOUBLE) / 64.0)
        |        * (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE)
        |                 / CAST(greatest(length(text), 1) AS DOUBLE)) * 1000000000.0) AS BIGINT) AS score_q,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents),
        |r AS (SELECT doc_id, score_q, n_tokens,
        |        CAST(sum(n_tokens) OVER (ORDER BY -score_q) AS BIGINT) AS cum_tokens
        |      FROM d)
        |SELECT doc_id, score_q, n_tokens, cum_tokens FROM r
        |WHERE cum_tokens <= 20000 ORDER BY doc_id""".stripMargin))

  /** ROUGE-2 recall eval-leak scoring (Dedup.rougeRecall): every 50th
    * document's 120-char prefix plays the "leaked eval passage"; each
    * corpus document scores its bag-with-counts bigram recall against
    * every passage it shares a bigram with (implicit inverted-index
    * pairs, integer-exact `overlap·1e6 DIV ref_total`), gated at 50%.
    * The source documents of the planted passages must surface at
    * high recall; llm16's distinct-shingle containment can't weight
    * repeated n-grams, which is the metric difference under test. */
  private def llm68 = Q("llm68_rouge_overlap",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val passages = d.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("pid"), substring(col("text"), 1, 120).as("ptext"))
      Dedup.rougeRecall(d, col("doc_id"), col("text"),
          passages, col("pid"), col("ptext"), n = 2, minRecallQ = 500000L)
        .orderBy(col("cand_id"), col("ref_id"))
    },
    Some(
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |cg AS (SELECT doc_id AS cand_id, w1 || ' ' || w2 AS g, count(*) AS cc
        |       FROM (SELECT doc_id, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
        |             FROM toks WHERE len(t) >= 2)
        |       GROUP BY 1, 2),
        |ptoks AS (
        |  SELECT doc_id, list_filter(string_split_regex(substr(text, 1, 120), '\s+'), x -> len(x) > 0) AS t
        |  FROM documents WHERE doc_id % 50 = 0),
        |rg AS (SELECT doc_id AS ref_id, w1 || ' ' || w2 AS g, count(*) AS rc
        |       FROM (SELECT doc_id, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
        |             FROM ptoks WHERE len(t) >= 2)
        |       GROUP BY 1, 2),
        |rt AS (SELECT ref_id, sum(rc) AS total FROM rg GROUP BY 1),
        |ov AS (SELECT cand_id, ref_id, CAST(sum(least(cc, rc)) AS BIGINT) AS overlap
        |       FROM cg JOIN rg USING (g) GROUP BY 1, 2)
        |SELECT cand_id, ref_id, overlap,
        |       CAST(overlap * 1000000 // rt.total AS BIGINT) AS rouge_q
        |FROM ov JOIN rt USING (ref_id)
        |WHERE overlap * 1000000 // rt.total >= 500000
        |ORDER BY cand_id, ref_id""".stripMargin))

  private val llm69Slot = new TrackerSlot
  private val llm70Slot = new TrackerSlot

  /** The llm69/llm70 shared Spark input: the doubled corpus (each doc
    * + its +100000 twin) through the REAL PNG encode → ImageIO decode
    * → dHash codec chain, as (doc_id, dhash). */
  private def dhashFixtureFrame(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val d = Tables.documents(s, dir).select(col("doc_id"))
    val corpus = d.unionByName(d.select((col("doc_id") + 100000L).as("doc_id")))
    val png = udf((id: Long) => graft.llm.Multimodal.fixturePng(id))
    // repartition the 8-byte id frame BEFORE rendering: the codec pass
    // fans out to all cores instead of inheriting the scan's one task
    // (llm116's fix, measured there; bytes never shuffle). Explicit
    // width — AQE would coalesce the tiny exchange back to one task
    graft.llm.Multimodal.imageDHash(
      corpus.repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
          col("doc_id"))
        .withColumn("media", png(col("doc_id"))),
      col("doc_id"), col("media"))
  }

  /** The llm69/llm70 shared oracle prefix: pixels recomputed from
    * `Multimodal.fixturePng`'s generation formula (PNG is lossless,
    * so ImageIO must hand back exactly these values), the 9×8
    * integer-luminance lattice, the 64 gradient bits, and the signed
    * bit-pack (bit 63 uses the signed min-long weight — 1<<63
    * overflows DuckDB's checked shift; the HUGEINT sum equals the
    * signed 64-bit pattern exactly). Yields CTE `sig(doc_id, dh)`. */
  private val duckDhashSigCte: String =
    """WITH ids AS (
      |  SELECT doc_id, doc_id AS base FROM documents
      |  UNION ALL SELECT doc_id + 100000, doc_id FROM documents),
      |px AS (SELECT gx, least(gx * 24 // 9, 23) AS xpx FROM generate_series(0, 8) g(gx)),
      |py AS (SELECT gy, least(gy * 16 // 8, 15) AS ypx FROM generate_series(0, 7) g(gy)),
      |lum AS (
      |  SELECT i.doc_id, px.gx, py.gy,
      |    CASE WHEN i.doc_id >= 100000 AND px.xpx >= 20
      |      THEN 299*(255 - (i.base*31 + px.xpx*7 + py.ypx*13) % 256)
      |         + 587*(255 - (i.base*17 + px.xpx*11 + py.ypx*3) % 256)
      |         + 114*(255 - (i.base*23 + px.xpx*5 + py.ypx*19) % 256)
      |      ELSE 299*((i.base*31 + px.xpx*7 + py.ypx*13) % 256)
      |         + 587*((i.base*17 + px.xpx*11 + py.ypx*3) % 256)
      |         + 114*((i.base*23 + px.xpx*5 + py.ypx*19) % 256) END AS l
      |  FROM ids i CROSS JOIN px CROSS JOIN py),
      |bits AS (
      |  SELECT a.doc_id, a.gy * 8 + a.gx AS bit,
      |         CASE WHEN b.l > a.l THEN 1 ELSE 0 END AS v
      |  FROM lum a JOIN lum b ON b.doc_id = a.doc_id AND b.gy = a.gy AND b.gx = a.gx + 1
      |  WHERE a.gx < 8),
      |sig AS (SELECT doc_id,
      |          CAST(sum(v * (CASE WHEN bit = 63
      |                 THEN -9223372036854775807 - 1
      |                 ELSE CAST(1 AS BIGINT) << bit END)) AS BIGINT) AS dh
      |        FROM bits GROUP BY doc_id)""".stripMargin

  /** Image dHash near-dup (Multimodal.imageDHash): every doc renders a
    * deterministic 24×16 PNG; its twin (+100000) renders the SAME
    * image with channels inverted from x ≥ 20 — a localized edit. The
    * Spark side runs the REAL codec path (PNG encode → ImageIO decode
    * → 9×8 integer-luminance lattice → 64-bit dHash → Hamming); the
    * oracle recomputes the pixels from the generation formula and
    * replays the identical integer lattice/bit-pack in SQL — PNG is
    * lossless, so any decode or hash drift fails the value compare.
    * Twins land a few Hamming bits away (the perceptual-near-dup
    * contract byte hashes can't give). */
  private def llm69 = Q("llm69_image_dhash",
    (s, dir) => {
      // the hash frame materializes ONCE (16 bytes/doc): both join
      // branches read the persisted hashes instead of re-running the
      // PNG encode+decode UDF chain per branch — at 100 TB the codec
      // pass is the cost and the hash frame is the artifact you keep
      val hashed = llm69Slot.fresh().track(
        graft.operators.Materialize.eagerOrCheckpoint(dhashFixtureFrame(s, dir), None))
      val base = hashed.filter(col("doc_id") < 100000L)
        .select(col("doc_id"), col("dhash").as("dhash_base"))
      val twin = hashed.filter(col("doc_id") >= 100000L)
        .select((col("doc_id") - 100000L).as("doc_id"), col("dhash").as("dhash_copy"))
      base.join(twin, "doc_id")
        .withColumn("hamming",
          bit_count(col("dhash_base").bitwiseXOR(col("dhash_copy"))))
        .orderBy(col("doc_id"))
    },
    Some(
      s"""$duckDhashSigCte
         |SELECT b.doc_id, b.dh AS dhash_base, t.dh AS dhash_copy,
         |       CAST(bit_count(xor(b.dh, t.dh)) AS INT) AS hamming
         |FROM sig b JOIN sig t ON t.doc_id = b.doc_id + 100000
         |WHERE b.doc_id < 100000
         |ORDER BY b.doc_id""".stripMargin),
    cleanup = Some(_ => llm69Slot.drain()))

  /** Banded image near-dup at corpus scale (Dedup.dhashNearDupPairs):
    * llm69's planted pairs discovered WITHOUT knowing who pairs with
    * whom — 4×16-bit band buckets join candidates, popcount verifies
    * ≤ 8 bits. Pigeonhole makes the banding exact below 4 bits and
    * graceful above; the oracle replays the identical banding +
    * verify, so the recall behavior itself is value-checked, not
    * assumed. */
  private def llm70 = Q("llm70_image_dhash_pairs",
    (s, dir) => {
      // same materialize-once rationale as llm69: the band self-join
      // reads the persisted hash frame, never the codec chain twice
      val hashed = llm70Slot.fresh().track(
        graft.operators.Materialize.eagerOrCheckpoint(dhashFixtureFrame(s, dir), None))
      Dedup.dhashNearDupPairs(hashed, col("dhash"), maxHamming = 8)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(
      s"""$duckDhashSigCte,
         |bands AS (
         |  SELECT doc_id, dh, b, (dh >> (16 * b)) & 65535 AS bucket
         |  FROM sig CROSS JOIN generate_series(0, 3) g(b)),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
         |  FROM bands a JOIN bands c ON a.b = c.b AND a.bucket = c.bucket
         |  WHERE a.doc_id < c.doc_id)
         |SELECT p.id_a, p.id_b, CAST(bit_count(xor(sa.dh, sc.dh)) AS INT) AS hamming
         |FROM pairs p JOIN sig sa ON sa.doc_id = p.id_a JOIN sig sc ON sc.doc_id = p.id_b
         |WHERE bit_count(xor(sa.dh, sc.dh)) <= 8
         |ORDER BY id_a, id_b""".stripMargin),
    cleanup = Some(_ => llm70Slot.drain()))

  /** Audio loudness-envelope fingerprint over the REAL codec path
    * (Multimodal.audioEnvelopeQ): every doc renders a deterministic
    * PCM16 WAV (llm69's image trick, audio edition); javax.sound
    * parses the container and hands back the samples, and the
    * INTEGER-exact 8-window envelope (`sum·1e6 DIV (count·32768)`)
    * plus the parsed header facts flow to the output. The oracle
    * recomputes the samples from the generation formula and replays
    * the envelope in SQL — WAV PCM is lossless, so container-parse or
    * decode drift fails the value compare. */
  private def llm71 = Q("llm71_audio_envelope",
    (s, dir) => {
      val probe = udf { (id: Long) =>
        graft.llm.Multimodal.audioEnvelopeQ(graft.llm.Multimodal.fixtureWav(id), 8)
          .map { case (sr, ch, du, env) => (sr.toInt, ch, du, env.mkString(",")) }
      }
      Tables.documents(s, dir).select(col("doc_id"), probe(col("doc_id")).as("r"))
        .select(col("doc_id"), col("r._1").as("sample_rate"),
          col("r._2").as("channels"), col("r._3").as("duration_us"),
          col("r._4").as("envelope"))
        .orderBy(col("doc_id"))
    },
    Some(
      """WITH s AS (
        |  SELECT doc_id, i // 250 AS wi,
        |         abs((doc_id * 7919 + i * 104729) % 65536 - 32768) AS a
        |  FROM documents CROSS JOIN generate_series(0, 1999) g(i)),
        |e AS (SELECT doc_id, wi,
        |        CAST(sum(a) * 1000000 // (count(*) * 32768) AS BIGINT) AS q
        |      FROM s GROUP BY 1, 2),
        |env AS (SELECT doc_id,
        |          string_agg(CAST(q AS VARCHAR), ',' ORDER BY wi) AS envelope
        |        FROM e GROUP BY doc_id)
        |SELECT doc_id, 8000 AS sample_rate, 1 AS channels,
        |       CAST(250000 AS BIGINT) AS duration_us, envelope
        |FROM env ORDER BY doc_id""".stripMargin))

  /** Count-Min heavy hitters (functions.CmsSketch + Sketches
    * .cmsEstimate): the corpus's top-20 terms with BOTH their exact
    * counts and the 4×256 sketch's estimates — est ≥ exact always,
    * over by exactly the collision mass the oracle recomputes (each
    * counter restated as the bucket's sum over exact counts). The
    * sketch aggregates in one pass with an 8 KB fixed buffer per
    * partition where exact counting shuffles the vocabulary — the
    * frequency sibling of llm13's KMV distinct sketch, and the second
    * native TypedImperativeAggregate in the engine. */
  private def llm72 = Q("llm72_cms_heavy_hitters",
    (s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(explode(graft.llm.TextAnalysis.tokens(col("text"))).as("term"))
      val sketch = graft.llm.Sketches.cmsSketch(toks, col("term"),
        depth = 4, width = 256)
      val top = toks.groupBy(col("term")).agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("term")).limit(20)
      top.crossJoin(broadcast(sketch))
        .withColumn("est_cnt", graft.llm.Sketches.cmsEstimate(col("cms"),
          Portable.baseHash31(col("term")), depth = 4, width = 256))
        .select(col("term"), col("exact_cnt"), col("est_cnt"))
        .orderBy(col("exact_cnt").desc, col("term"))
    },
    Some {
      val buckets = (0 until 4).map { i =>
        s"b$i AS (SELECT ${Portable.duckSeededHash("term", i)} % 256 AS bucket, " +
          s"CAST(SUM(exact_cnt) AS BIGINT) AS cnt FROM c GROUP BY 1)"
      }.mkString(",\n        ")
      val joins = (0 until 4).map { i =>
        s"JOIN b$i ON b$i.bucket = ${Portable.duckSeededHash("top.term", i)} % 256"
      }.mkString("\n        ")
      s"""WITH t AS (SELECT unnest(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS term
         |           FROM documents),
         |c AS (SELECT term, count(*) AS exact_cnt FROM t GROUP BY 1),
         |top AS (SELECT term, exact_cnt FROM c ORDER BY exact_cnt DESC, term LIMIT 20),
         |$buckets
         |SELECT top.term, top.exact_cnt,
         |       least(b0.cnt, b1.cnt, b2.cnt, b3.cnt) AS est_cnt
         |FROM top
         |$joins
         |ORDER BY exact_cnt DESC, term""".stripMargin
    })

  /** Classifier calibration bins (Curation.calibrationBins): llm43's
    * hashed-linear logit scored against the quality-threshold label,
    * 10 equal-width bins over the observed logit range — the
    * reliability diagram that tells whether a learned gate's score
    * actually orders quality. All-integer binning and rates; the
    * oracle replays the same arithmetic over the same broadcast
    * min/max. */
  private def llm73 = Q("llm73_calibration_bins",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(
        TextAnalysis.hashedLinearLogit(col("text")).as("logit"),
        (floor(TextAnalysis.qualityScore(col("text")) * lit(1e9)).cast("long")
          >= 500000000L).as("label"))
      Curation.calibrationBins(d, col("logit"), col("label"), nBins = 10)
        .orderBy(col("bin"))
    },
    Some {
      val logit = s"""CAST(coalesce(list_aggregate(list_transform(
        |    list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0),
        |    t -> ${Portable.duckHash64(s"concat('wq:', CAST(${Portable.duckHash64("t")} % 1024 AS VARCHAR))")} % 1001 - 500), 'sum'), 0) AS BIGINT)""".stripMargin
      s"""WITH d AS (
         |  SELECT $logit AS logit,
         |    CAST(floor(
         |      (CAST(least(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)), 64) AS DOUBLE) / 64.0)
         |        * (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
         |                 / CAST(greatest(length(text), 1) AS DOUBLE)) * 1000000000.0) AS BIGINT)
         |      >= 500000000 AS label
         |  FROM documents),
         |st AS (SELECT min(logit) AS lo, max(logit) AS hi FROM d)
         |SELECT (logit - lo) * 10 // (hi - lo + 1) AS bin,
         |       count(*) AS n,
         |       CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |       CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS pos_rate_q
         |FROM d CROSS JOIN st
         |GROUP BY bin ORDER BY bin""".stripMargin
    })

  private val llm74Slot = new TrackerSlot
  /** Length-bucketed inference batching (Packing
    * .lengthBucketedBatches): 32-token-wide length bins, 8-doc
    * batches ranked within bins by the distributed exact-rank scan,
    * per-batch padding-waste accounting — the serving-side metric
    * bucketed batching exists to minimize. The oracle states the same
    * batching with a plain row_number window (fine at oracle scale;
    * the Spark side's range-partition ranks are the form that
    * survives bins larger than a partition). */
  private def llm74 = Q("llm74_length_batching",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.llm.Packing.lengthBucketedBatches(d, col("doc_id"), col("n_tokens"),
          binWidth = 32L, batchSize = 8, tracker = Some(llm74Slot.fresh()))
        .orderBy(col("bin"), col("batch_idx"))
    },
    Some(
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS nt
        |  FROM documents),
        |r AS (SELECT doc_id, nt, nt // 32 AS bin,
        |        row_number() OVER (PARTITION BY nt // 32 ORDER BY nt, doc_id) AS rk
        |      FROM d)
        |SELECT bin, (rk - 1) // 8 AS batch_idx, count(*) AS n_docs,
        |       max(nt) AS max_tokens, CAST(sum(nt) AS BIGINT) AS sum_tokens,
        |       CAST(max(nt) * count(*) - sum(nt) AS BIGINT) AS padding_waste
        |FROM r GROUP BY bin, batch_idx
        |ORDER BY bin, batch_idx""".stripMargin),
    cleanup = Some(_ => llm74Slot.drain()))

  /** URL canonicalization (Urls.canonicalUrl): each logical page is
    * rendered as THREE messy spellings (case-shifted host+www+default
    * port+tracking param+fragment / clean / upper TLD+doubled
    * slashes+shuffled params), and the engine must collapse all three
    * onto one canonical key. The oracle does NOT replay the regex
    * pipeline — it constructs the CLEAN form directly from the same
    * arithmetic, so any normalization step the engine gets wrong
    * (port, fragment, param order, slash collapse, www, case) breaks
    * the hash match. Registered-domain derivation (`.co.uk` 3-label
    * vs `.com` 2-label) is checked on the same rows. */
  private def llm75 = Q("llm75_url_canonicalize",
    (s, dir) => {
      import graft.llm.Urls
      val d = Tables.documents(s, dir).select(col("doc_id"))
      val base = expr("doc_id DIV 3")
      val variant = expr("doc_id % 3")
      val site = concat(lit("site"), base % 7)
      val tld = when(base % 4 === 0, ".com").when(base % 4 === 1, ".co.uk")
        .when(base % 4 === 2, ".org").otherwise(".io")
      val path = concat(lit("/a/b"), base % 5)
      val qv = base % 3
      val messy = when(variant === 0,
          concat(lit("HTTPS://WWW."), upper(site), tld, lit(":443"), path,
                 lit("/?utm_source=x&b="), qv, lit("&a=1#frag")))
        .when(variant === 1,
          concat(lit("https://"), site, tld, path, lit("?a=1&b="), qv))
        .otherwise(
          concat(lit("https://"), site, upper(tld),
                 regexp_replace(path, "/", "//"), lit("/?b="), qv,
                 lit("&utm_campaign=y&a=1")))
      d.select(col("doc_id"), Urls.canonicalUrl(messy).as("curl"))
        .groupBy(col("curl"))
        .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("first_doc"))
        .withColumn("domain", Urls.registeredDomain(Urls.hostOf(col("curl"))))
        .select(col("curl"), col("domain"), col("n_variants"), col("first_doc"))
        .orderBy(col("curl"))
    },
    Some(
      """WITH b AS (SELECT doc_id, doc_id // 3 AS base FROM documents),
        |c AS (SELECT base,
        |        'https://site' || (base % 7) ||
        |          CASE base % 4 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk'
        |               WHEN 2 THEN '.org' ELSE '.io' END ||
        |          '/a/b' || (base % 5) || '?a=1&b=' || (base % 3) AS curl,
        |        'site' || (base % 7) ||
        |          CASE base % 4 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk'
        |               WHEN 2 THEN '.org' ELSE '.io' END AS domain,
        |        count(*) AS n_variants, min(doc_id) AS first_doc
        |      FROM b GROUP BY base)
        |SELECT curl, domain, CAST(n_variants AS BIGINT) AS n_variants, first_doc
        |FROM c ORDER BY curl""".stripMargin))

  /** Per-domain quota sampling (Urls.domainQuota): cap every
    * registered domain at 10 documents chosen by deterministic
    * portable-hash rank, not arrival order. The Spark plan splits
    * under-quota domains away from the per-domain sort window (only
    * over-quota domains pay the rank); the oracle ranks everything —
    * the two agree because an under-quota domain's keep flag is true
    * under either path. */
  private def llm76 = Q("llm76_domain_quota",
    (s, dir) => {
      import graft.llm.Urls
      val d = Tables.documents(s, dir).select(col("doc_id"))
      val tld = when(col("doc_id") % 4 === 0, ".com")
        .when(col("doc_id") % 4 === 1, ".co.uk")
        .when(col("doc_id") % 4 === 2, ".org").otherwise(".io")
      val url = concat(lit("https://site"), col("doc_id") % 7, tld,
                       lit("/p"), col("doc_id"))
      Urls.domainQuota(d.select(col("doc_id"), url.as("url")),
          col("doc_id"), col("url"), quota = 10)
        .orderBy(col("id"))
    },
    Some(
      s"""WITH d AS (SELECT doc_id AS id,
         |        'site' || (doc_id % 7) ||
         |          CASE doc_id % 4 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk'
         |               WHEN 2 THEN '.org' ELSE '.io' END AS domain
         |      FROM documents),
         |r AS (SELECT id, domain,
         |        row_number() OVER (PARTITION BY domain
         |          ORDER BY ${Portable.duckHash64("CAST(id AS VARCHAR)")}, id) AS rk
         |      FROM d)
         |SELECT id, domain, rk <= 10 AS keep FROM r ORDER BY id""".stripMargin))

  /** ANN recall@k measurement (Similarity.recallAtK): the evaluation
    * loop that decides whether an LSH parameterization is trustworthy
    * before it runs at scale — exact brute-force top-10 as ground
    * truth, banded-LSH top-10 (8 bands × 8 planes) as the candidate
    * path under test, per-query |approx ∩ truth| / 10. The oracle
    * replays BOTH paths (the llm03 cross-join ranking and the llm08
    * banded-bucket join) and the same intersection count, so the
    * recall numbers are value-checked end to end, not just shaped. */
  private def llm77 = Q("llm77_ann_recall",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val corpus  = emb.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val queries = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val truth = Similarity.bruteForceTopK(corpus, "cid", "cv",
        queries, "qid", "qv", k = 10, exact = true)
      val approx = Similarity.lshBandedTopK(corpus, "cid", "cv",
        queries, "qid", "qv", k = 10, dims = 64, planesPerBand = 8, bands = 8,
        exact = true)
      Similarity.recallAtK(truth, approx, "qid", "cid", k = 10)
        .orderBy(col("qid"))
    },
    Some {
      val dotQC =
        """list_sum(list_transform(list_zip(qv, cv),
          |  z -> CAST(floor(CAST(z[1] AS DOUBLE) * 1e6) AS BIGINT)
          |     * CAST(floor(CAST(z[2] AS DOUBLE) * 1e6) AS BIGINT)))""".stripMargin
      def norm(v: String) =
        s"""list_sum(list_transform($v, x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)
           |  * CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)))""".stripMargin
      val cBands = (0 until 8).map { b =>
        s"SELECT vec_id AS cid, $b AS band, ${duckRhpBandBucket("embedding", 64, 8, 8, b)} AS bucket FROM embeddings"
      }.mkString("\n            UNION ALL ")
      val qBands = (0 until 8).map { b =>
        s"SELECT vec_id AS qid, $b AS band, ${duckRhpBandBucket("embedding", 64, 8, 8, b)} AS bucket FROM embeddings WHERE vec_id < 20"
      }.mkString("\n            UNION ALL ")
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20),
         |td AS (SELECT qid, cid,
         |         $dotQC AS dot, ${norm("qv")} AS nq, ${norm("cv")} AS nc
         |       FROM q CROSS JOIN c WHERE cid <> qid),
         |tr AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |         ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(nc AS DOUBLE))) DESC, cid) AS rank
         |       FROM td),
         |truth AS (SELECT qid, cid FROM tr WHERE rank <= 10),
         |cbk AS (
         |            $cBands),
         |qbk AS (
         |            $qBands),
         |cand AS (SELECT DISTINCT qbk.qid, cbk.cid
         |         FROM cbk JOIN qbk ON cbk.band = qbk.band AND cbk.bucket = qbk.bucket
         |         WHERE cbk.cid <> qbk.qid),
         |ad AS (SELECT cand.qid, cand.cid,
         |         $dotQC AS dot, ${norm("qv")} AS nq, ${norm("cv")} AS nc
         |       FROM (SELECT cand.qid, cand.cid, qe.embedding AS qv, ce.embedding AS cv
         |             FROM cand JOIN embeddings qe ON qe.vec_id = cand.qid
         |                       JOIN embeddings ce ON ce.vec_id = cand.cid) cand),
         |ar AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |         ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(nc AS DOUBLE))) DESC, cid) AS rank
         |       FROM ad),
         |approx AS (SELECT qid, cid FROM ar WHERE rank <= 10),
         |h AS (SELECT t.qid, count(*) AS n_hits
         |      FROM truth t JOIN approx a ON a.qid = t.qid AND a.cid = t.cid
         |      GROUP BY t.qid)
         |SELECT q.qid, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
         |       CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 10 AS recall
         |FROM q LEFT JOIN h USING (qid)
         |ORDER BY q.qid""".stripMargin
    })

  /** Leakage-safe GROUPED train/eval split: the split key is the
    * registered DOMAIN, not the document (Sampling.hashSplit applied
    * to the group key) — eval documents from a domain whose siblings
    * were trained on are contamination, so the whole domain must land
    * on one side. The output audits that from the data: n_leaky
    * counts domains observed in MORE than one split (must be 0, and
    * the oracle computes it the same way — a split keyed on doc_id
    * instead of domain would light it up). */
  private def llm78 = Q("llm78_grouped_split",
    (s, dir) => {
      import graft.llm.{Sampling, Urls}
      val d = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
      val tld = when(col("doc_id") % 4 === 0, ".com")
        .when(col("doc_id") % 4 === 1, ".co.uk")
        .when(col("doc_id") % 4 === 2, ".org").otherwise(".io")
      val url = concat(lit("https://site"), col("doc_id") % 7, tld,
                       lit("/p"), col("doc_id"))
      val withDomain = d.select(col("doc_id"), col("n_chars"),
        Urls.registeredDomain(Urls.hostOf(url)).as("domain"))
      val split = Sampling.hashSplit(withDomain, col("domain"),
        Seq("train" -> 0.8, "eval" -> 0.2), salt = "grpsplit")
      val spans = split.groupBy(col("domain"))
        .agg(countDistinct(col("split")).as("__nsp"))
      split.join(spans, "domain")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
             countDistinct(col("domain")).as("n_domains"),
             sum(col("n_chars")).as("n_chars"),
             countDistinct(when(col("__nsp") > 1, col("domain"))).as("n_leaky"))
        .orderBy(col("split"))
    },
    Some {
      val u = graft.llm.Sampling.duckUnitInterval("domain", "grpsplit")
      s"""WITH d AS (SELECT doc_id, n_chars,
         |        'site' || (doc_id % 7) ||
         |          CASE doc_id % 4 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk'
         |               WHEN 2 THEN '.org' ELSE '.io' END AS domain
         |      FROM documents),
         |sp AS (SELECT doc_id, n_chars, domain,
         |         CASE WHEN $u < 0.8 THEN 'train' ELSE 'eval' END AS split
         |       FROM d),
         |spans AS (SELECT domain, count(DISTINCT split) AS nsp FROM sp GROUP BY 1)
         |SELECT split, count(*) AS n_docs,
         |       CAST(count(DISTINCT sp.domain) AS BIGINT) AS n_domains,
         |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |       CAST(count(DISTINCT CASE WHEN nsp > 1 THEN sp.domain END) AS BIGINT) AS n_leaky
         |FROM sp JOIN spans ON spans.domain = sp.domain
         |GROUP BY split ORDER BY split""".stripMargin
    })

  /** Interpolated trigram typicality (LanguageModel.trigramScore):
    * the stronger-context quality score beside llm24's bigram form —
    * 0.5·p(w3|w1w2) + 0.3·p(w3|w2) + 0.2·p(w3), all add-one
    * smoothed. The oracle joins on the words where Spark joins on
    * their xxhash64 keys (the llm24 collision trade), and every
    * double operation is the same left-associated sequence, so the
    * per-position quantized scores match bit for bit. */
  private val llm79Slot = new TrackerSlot
  private def llm79 = Q("llm79_trigram_typicality",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      LanguageModel.trigramScore(d, col("doc_id"), col("text"),
          tracker = Some(llm79Slot.fresh()))
        .orderBy(col("doc_id"))
    },
    Some("""WITH t AS (SELECT doc_id,
           |              list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
           |            FROM documents),
           |tri AS (SELECT doc_id, unnest(toks[1:len(toks)-2]) AS w1,
           |               unnest(toks[2:len(toks)-1]) AS w2,
           |               unnest(toks[3:len(toks)]) AS w3
           |        FROM t WHERE len(toks) >= 3),
           |bi AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
           |              unnest(toks[2:len(toks)]) AS w2 FROM t),
           |uni AS (SELECT unnest(toks) AS w FROM t),
           |c123 AS (SELECT w1, w2, w3, count(*) AS c FROM tri GROUP BY 1, 2, 3),
           |cb AS (SELECT w1, w2, count(*) AS c FROM bi GROUP BY 1, 2),
           |cu AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
           |vn AS (SELECT count(DISTINCT w) AS v, count(*) AS n FROM uni),
           |q AS (SELECT tri.doc_id,
           |        CAST(floor((0.5 * (CAST(c123.c + 1 AS DOUBLE) / CAST(cb12.c + vn.v AS DOUBLE))
           |                  + 0.3 * (CAST(cb23.c + 1 AS DOUBLE) / CAST(cu2.c + vn.v AS DOUBLE))
           |                  + 0.2 * (CAST(cu3.c + 1 AS DOUBLE) / CAST(vn.n + vn.v AS DOUBLE))) * 1e9) AS BIGINT) AS q
           |      FROM tri
           |      JOIN c123 USING (w1, w2, w3)
           |      JOIN cb cb12 ON cb12.w1 = tri.w1 AND cb12.w2 = tri.w2
           |      JOIN cb cb23 ON cb23.w1 = tri.w2 AND cb23.w2 = tri.w3
           |      JOIN cu cu2 ON cu2.w = tri.w2
           |      JOIN cu cu3 ON cu3.w = tri.w3
           |      CROSS JOIN vn)
           |SELECT doc_id, count(*) AS n_trigrams,
           |       CAST(sum(q) AS DOUBLE) / count(*) / 1e9 AS avg_interp_p
           |FROM q GROUP BY doc_id
           |ORDER BY doc_id""".stripMargin),
    cleanup = Some(_ => llm79Slot.drain()))

  /** Per-dimension embedding statistics (Similarity.dimStats): the
    * preprocessing pass standardization/whitening/quantizer training
    * start from — count, quantized sum/sumsq/min/max and the mean per
    * position, from ONE position-explode into a dims-row aggregate
    * (vectors die in the map stage; kilobytes shuffle at any corpus
    * size). Elements quantize to 1e-6 integers before any sum, so
    * both engines aggregate exact longs in any order. */
  private def llm80 = Q("llm80_embedding_dim_stats",
    (s, dir) => Similarity.dimStats(Tables.embeddings(s, dir), col("embedding"))
      .orderBy(col("dim")),
    Some("""WITH x AS (SELECT embedding[i] AS x, CAST(i AS BIGINT) AS dim
           |           FROM embeddings CROSS JOIN generate_series(1, 64) AS g(i)),
           |q AS (SELECT dim, CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT) AS xq FROM x)
           |SELECT dim, count(*) AS n, CAST(sum(xq) AS BIGINT) AS sum_q6,
           |       CAST(sum(xq * xq) AS BIGINT) AS sumsq_q12,
           |       min(xq) AS min_q6, max(xq) AS max_q6,
           |       CAST(sum(xq) AS DOUBLE) / count(*) / 1e6 AS mean
           |FROM q GROUP BY dim ORDER BY dim""".stripMargin))

  /** Dataset version diff (CorpusReport.manifestDiff): the release
    * audit between two corpus snapshots — `prev` drops every
    * doc_id%17==3 (those read as `added`), rewrites the text of
    * %13==5 (read as `changed`) and carries extra ids %19==2 shifted
    * by 100000 (read as `removed`); everything else is `unchanged`.
    * One full-outer join on the id with 8-byte content hashes beside
    * it — text never moves. The oracle rebuilds both snapshots from
    * the same arithmetic and must land on identical status counts. */
  private def llm81 = Q("llm81_manifest_diff",
    (s, dir) => {
      import graft.llm.CorpusReport
      val d = Tables.documents(s, dir)
      val cur = d.select(col("doc_id"), Portable.hash64(col("text")).as("h"))
      val prev = d.filter(col("doc_id") % 17 =!= 3)
        .select(col("doc_id"),
          Portable.hash64(when(col("doc_id") % 13 === 5,
              concat(col("text"), lit(" v2"))).otherwise(col("text"))).as("h"))
        .unionByName(d.filter(col("doc_id") % 19 === 2)
          .select((col("doc_id") + 100000L).as("doc_id"),
                  Portable.hash64(col("text")).as("h")))
      CorpusReport.manifestDiff(prev, cur, "doc_id", "h")
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_docs"), min(col("id")).as("first_id"))
        .orderBy(col("status"))
    },
    Some {
      val h = Portable.duckHash64("text")
      val h2 = Portable.duckHash64("text || ' v2'")
      s"""WITH cur AS (SELECT doc_id AS id, $h AS h FROM documents),
         |prev AS (
         |  SELECT doc_id AS id,
         |    CASE WHEN doc_id % 13 = 5 THEN $h2 ELSE $h END AS h
         |  FROM documents WHERE doc_id % 17 <> 3
         |  UNION ALL
         |  SELECT doc_id + 100000, $h FROM documents WHERE doc_id % 19 = 2),
         |j AS (SELECT coalesce(cur.id, prev.id) AS id,
         |        CASE WHEN prev.id IS NULL THEN 'added'
         |             WHEN cur.id IS NULL THEN 'removed'
         |             WHEN prev.h = cur.h THEN 'unchanged'
         |             ELSE 'changed' END AS status
         |      FROM prev FULL OUTER JOIN cur ON cur.id = prev.id)
         |SELECT status, count(*) AS n_docs, min(id) AS first_id
         |FROM j GROUP BY status ORDER BY status""".stripMargin
    })

  /** Asymmetric shingle containment (Dedup.containment): each
    * document pairs with a container that embeds it whole plus
    * trailing boilerplate — containment(small in big) is EXACTLY 1.0
    * (the small side's shingles are a subset) while Jaccard sits well
    * under any dedup threshold because the union is dominated by the
    * container. The doc-in-doc detection Jaccard structurally misses;
    * Spark intersects hashed shingle sets, the oracle counts distinct
    * shingle strings — the llm09 collision trade. */
  private val llm82Slot = new TrackerSlot
  private def llm82 = Q("llm82_containment_verify",
    (s, dir) => {
      val pad = " tail padding block one two three four five six seven eight nine ten"
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      // Round-22 (guide §2.4/§8): the small and big sides of this
      // verify are BORN PAIRED — big is the same row's text plus a
      // constant pad (the +100000 id-shifted union branch). The old
      // shape computed the shingle pass twice (one per filtered union
      // side — 4 parquet scans in the executed plan, the +100000
      // branch's filter never folds to false) and then JOINED the two
      // 8×-text-width shingle-array frames on doc_id through two
      // repartition exchanges, purely to re-pair rows that started on
      // the same line. Both sets now build in ONE scan via the same
      // native shingle primitive ([[Dedup.hashedShingleSet]]) and the
      // pair compares in-row: zero joins, zero set-array shuffles.
      // Output rows are identical: the inner join kept exactly the
      // docs present on both sides = all non-null-text docs, which is
      // the isNotNull filter (hashedShingleSets drops null text; a
      // null text also nulls concat(text, pad)). Oracle unchanged.
      // Execution shape (probed at sf0.1/32c, each step measured):
      //  - repartition with an EXPLICIT count (REPARTITION_BY_NUM):
      //    AQE coalesces by-column shuffle reads of this tiny frame to
      //    ONE partition, serializing the double-shingle stage (5.7 s
      //    coalesced vs 0.8 s at real width); the count is the
      //    session's shuffle-partition conf, not a constant;
      //  - the heavy stage emits the 36 B result rows only;
      //  - the eager leaf (house Materialize pattern) keeps the
      //    orderBy's range-boundary SAMPLE pass from re-executing the
      //    shingle stage (rangepartitioning replays its child lineage
      //    up to the previous shuffle; at 100 TB that re-run IS the
      //    query). Measured 3.3-3.8 s (old join shape) → 0.5-1.2 s.
      val width = s.sessionState.conf.numShufflePartitions
      val scored = d.where(col("text").isNotNull)
        .repartition(width, col("doc_id"))
        .select(col("doc_id"),
          Dedup.hashedShingleSet(col("text"), n = 9).as("sh_a"),
          Dedup.hashedShingleSet(concat(col("text"), lit(pad)), n = 9).as("sh_b"))
        .select(col("doc_id"),
          size(col("sh_a")).cast("long").as("n_small"),
          size(col("sh_b")).cast("long").as("n_big"),
          Dedup.jaccard(col("sh_a"), col("sh_b")).as("jaccard"),
          Dedup.containment(col("sh_a"), col("sh_b")).as("containment"))
      llm82Slot.fresh().track(graft.operators.Materialize.eager(scored))
        .orderBy(col("doc_id"))
    },
    Some {
      val pad = " tail padding block one two three four five six seven eight nine ten"
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 100000, text || '$pad' FROM documents),
         |sh AS (SELECT DISTINCT doc_id, substr(text, i, 9) AS shingle
         |       FROM (SELECT doc_id, text,
         |               unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i
         |             FROM corpus)),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id, count(*) AS ni
         |          FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 100000
         |                             AND b.shingle = a.shingle
         |          WHERE a.doc_id < 100000
         |          GROUP BY a.doc_id)
         |SELECT i.doc_id, sa.n AS n_small, sb.n AS n_big,
         |       CAST(i.ni AS DOUBLE) / CAST(sa.n + sb.n - i.ni AS DOUBLE) AS jaccard,
         |       CAST(i.ni AS DOUBLE) / CAST(sa.n AS DOUBLE) AS containment
         |FROM inter i
         |JOIN sizes sa ON sa.doc_id = i.doc_id
         |JOIN sizes sb ON sb.doc_id = i.doc_id + 100000
         |ORDER BY i.doc_id""".stripMargin
    },
    cleanup = Some(_ => llm82Slot.drain()))

  /** Zipf rank-frequency slope per source (CorpusStats.zipfSlope):
    * the power-law diagnostic fit over INTEGER log2 of rank and
    * frequency — `length(bin(x))−1` is exact in both engines where
    * libm `ln` can differ in the last ulp. Tie order among equal
    * frequencies never matters (a tie group's rank multiset is
    * fixed), so the regression sums are reproducible without any
    * portable tiebreak. */
  private def llm83 = Q("llm83_zipf_slope",
    (s, dir) => {
      import graft.llm.CorpusStats
      CorpusStats.zipfSlope(Tables.documents(s, dir), col("source"), col("text"))
        .withColumnRenamed("grp", "source")
        .orderBy(col("source"))
    },
    Some("""WITH t AS (SELECT source AS grp,
           |             unnest(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS term
           |           FROM documents),
           |c AS (SELECT grp, term, count(*) AS c FROM t GROUP BY 1, 2),
           |r AS (SELECT grp, c, row_number() OVER (PARTITION BY grp ORDER BY c DESC) AS rk FROM c),
           |l AS (SELECT grp, CAST(len(bin(rk)) - 1 AS BIGINT) AS x,
           |             CAST(len(bin(c)) - 1 AS BIGINT) AS y FROM r),
           |a AS (SELECT grp, count(*) AS n_terms,
           |        sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
           |      FROM l GROUP BY 1)
           |SELECT grp AS source, CAST(n_terms AS BIGINT) AS n_terms,
           |       CASE WHEN n_terms * sxx - sx * sx = 0 THEN 0.0
           |            ELSE CAST(n_terms * sxy - sx * sy AS DOUBLE) /
           |                 CAST(n_terms * sxx - sx * sx AS DOUBLE) END AS slope
           |FROM a ORDER BY source""".stripMargin))

  /** Per-source marginal novelty (CorpusStats.sourceNovelty): each
    * distinct 9-gram shingle charges to the lexicographically FIRST
    * source containing it — the acquisition-priority signal pairwise
    * overlap (llm39) can't see: a source fully covered by the UNION
    * of earlier sources shows novelty ≈ 0 here while pairwise
    * overlapping each of them only slightly. Spark attributes hashed
    * shingles, the oracle distinct shingle strings — the llm09
    * collision trade. */
  private val llm84Slot = new TrackerSlot
  private def llm84 = Q("llm84_source_novelty",
    (s, dir) => {
      import graft.llm.CorpusStats
      CorpusStats.sourceNovelty(Tables.documents(s, dir),
          col("source"), col("text"), n = 9,
          tracker = Some(llm84Slot.fresh()))
        .orderBy(col("source"))
    },
    Some("""WITH sh AS (SELECT DISTINCT source, substr(text, i, 9) AS shingle
           |       FROM (SELECT source, text,
           |               unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i
           |             FROM documents)),
           |per AS (SELECT source, count(*) AS n_shingles FROM sh GROUP BY 1),
           |first AS (SELECT min(source) AS source, shingle FROM sh GROUP BY shingle),
           |nn AS (SELECT source, count(*) AS n_new FROM first GROUP BY 1)
           |SELECT per.source, per.n_shingles,
           |       CAST(coalesce(nn.n_new, 0) AS BIGINT) AS n_new,
           |       CAST(coalesce(nn.n_new, 0) AS DOUBLE) / CAST(per.n_shingles AS DOUBLE) AS novelty
           |FROM per LEFT JOIN nn ON nn.source = per.source
           |ORDER BY per.source""".stripMargin),
    cleanup = Some(_ => llm84Slot.drain()))

  private val llm85Slot = new TrackerSlot
  /** SOFT dedup: instead of dropping near-duplicates, weight every
    * document by 1/|its duplicate cluster| — total loss contribution
    * per logical content stays constant whether it was crawled once
    * or fifty times, without discarding any variant (the
    * dedup-aware loss-weighting alternative to hard removal).
    * Clusters come from the same llm17 machinery; docs outside any
    * candidate pair are singletons at weight 1.0, so the output is a
    * corpus-complete weight table — the artifact a training run
    * joins on doc_id. */
  private def llm85 = Q("llm85_soft_dedup_weights",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val corpus = d.unionByName(
        d.select((col("doc_id") + 100000L).as("doc_id"),
                 concat(col("text"), lit(" qx")).as("text")))
      val sigs = Dedup.minhashSignatureText(corpus, col("doc_id"), col("text"), n = 9, k = 12)
      val pairs = Dedup.candidatePairs(Dedup.lshBuckets(sigs, k = 12, rowsPerBand = 4))
      val clusters = Dedup.connectedComponents(pairs, tracker = Some(llm85Slot.fresh()))
      val sizes = clusters.groupBy(col("cluster_id")).agg(count(lit(1)).as("csize"))
      corpus.select(col("doc_id"))
        .join(clusters.join(sizes, "cluster_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("csize"), lit(1L)).as("csize"),
          (lit(1.0) / coalesce(col("csize"), lit(1L)).cast("double")).as("weight"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE $duckMinhashPairCtes,
            |verts AS (SELECT id_a AS v FROM pairs UNION SELECT id_b FROM pairs),
            |edges AS (SELECT id_a AS ea, id_b AS eb FROM pairs
            |          UNION SELECT id_b, id_a FROM pairs),
            |reach(v, r) AS (
            |  SELECT v, v FROM verts
            |  UNION
            |  SELECT e.eb, reach.r FROM edges e JOIN reach ON reach.v = e.ea),
            |comp AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
            |sz AS (SELECT cluster_id, count(*) AS csize FROM comp GROUP BY 1)
            |SELECT c.doc_id,
            |       CAST(coalesce(sz.csize, 1) AS BIGINT) AS csize,
            |       CAST(1 AS DOUBLE) / CAST(coalesce(sz.csize, 1) AS DOUBLE) AS weight
            |FROM corpus c
            |LEFT JOIN comp ON comp.doc_id = c.doc_id
            |LEFT JOIN sz ON sz.cluster_id = comp.cluster_id
            |ORDER BY c.doc_id""".stripMargin),
    cleanup = Some(_ => llm85Slot.drain()))

  /** Term-distribution drift between snapshots
    * (CorpusStats.termDrift): llm81's identity diff says WHICH docs
    * changed between versions; this says whether the LANGUAGE moved —
    * the symmetrized chi-square contribution (o−e)²/(o+e) per
    * union-vocabulary term over exact counts, quantized before the
    * sum, plus appeared/vanished term counts. The prev snapshot is
    * llm81's construction (dropped %17==3 docs, ' v2'-rewritten
    * %13==5 texts, extra %19==2 copies). */
  private def llm86 = Q("llm86_term_drift",
    (s, dir) => {
      import graft.llm.CorpusStats
      val d = Tables.documents(s, dir)
      val cur = d.select(col("text"))
      val prev = d.filter(col("doc_id") % 17 =!= 3)
        .select(when(col("doc_id") % 13 === 5,
            concat(col("text"), lit(" v2"))).otherwise(col("text")).as("text"))
        .unionByName(d.filter(col("doc_id") % 19 === 2).select(col("text")))
      CorpusStats.termDrift(prev, col("text"), cur, col("text"))
    },
    Some("""WITH cur AS (SELECT text FROM documents),
           |prev AS (
           |  SELECT CASE WHEN doc_id % 13 = 5 THEN text || ' v2' ELSE text END AS text
           |  FROM documents WHERE doc_id % 17 <> 3
           |  UNION ALL SELECT text FROM documents WHERE doc_id % 19 = 2),
           |ct AS (SELECT w, count(*) AS o FROM (
           |         SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS w
           |         FROM cur) GROUP BY 1),
           |pt AS (SELECT w, count(*) AS e FROM (
           |         SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS w
           |         FROM prev) GROUP BY 1),
           |j AS (SELECT coalesce(ct.o, 0) AS o, coalesce(pt.e, 0) AS e
           |      FROM pt FULL OUTER JOIN ct ON ct.w = pt.w)
           |SELECT count(*) AS n_terms,
           |       CAST(sum(CASE WHEN e = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           |       CAST(sum(CASE WHEN o = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gone,
           |       CAST(sum(CAST(floor(CAST(o - e AS DOUBLE) * CAST(o - e AS DOUBLE) /
           |                           CAST(o + e AS DOUBLE) * 1e6) AS BIGINT)) AS BIGINT) AS drift_q
           |FROM j""".stripMargin))

  /** Measured LSH S-curve (the llm77 theme at the MinHash tier): on a
    * BOUNDED doc slice (doc_id < 100 at any SF — the calibration
    * sample, all-pairs is affordable by construction) plus perturbed
    * twins, compute exact Jaccard for every pair ≥ 0.1, bucket by
    * floor(10·j), and measure what fraction of each bucket the banded
    * LSH candidate pass recovers — the empirical catch-rate curve
    * that validates a (k, rowsPerBand) choice against the theoretical
    * 1−(1−j^r)^b before it runs over the full corpus. */
  private def llm87 = Q("llm87_lsh_calibration",
    (s, dir) => {
      val d = Tables.documents(s, dir).filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text"))
      val corpus = d.unionByName(
        d.select((col("doc_id") + 100000L).as("doc_id"),
                 concat(col("text"), lit(" qx")).as("text")))
      val sets = Dedup.hashedShingleSets(corpus, col("doc_id"), col("text"), n = 9)
      val a = sets.select(col("doc_id").as("id_a"), col("shh").as("sh_a"))
      val b = sets.select(col("doc_id").as("id_b"), col("shh").as("sh_b"))
      // the exchange is a reuse barrier: BOTH consumers (the bucket
      // histogram and the caught semi join) read it, so the all-pairs
      // nested-loop Jaccard pass runs ONCE, not per consumer
      val allPairs = a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          Dedup.jaccard(col("sh_a"), col("sh_b")).as("j"))
        .filter(col("j") >= 0.1)
        .withColumn("bucket", floor(col("j") * 10).cast("int"))
        .repartition(col("id_a"), col("id_b"))
      val sigs = Dedup.minhashSignatureText(corpus, col("doc_id"), col("text"), n = 9, k = 12)
      val cand = Dedup.candidatePairs(Dedup.lshBuckets(sigs, k = 12, rowsPerBand = 4))
      val caught = allPairs.join(cand, Seq("id_a", "id_b"), "left_semi")
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_caught"))
      allPairs.groupBy(col("bucket")).agg(count(lit(1)).as("n_pairs"))
        .join(caught, Seq("bucket"), "left")
        .select(col("bucket"), col("n_pairs"),
          coalesce(col("n_caught"), lit(0L)).as("n_caught"))
        .withColumn("catch_rate",
          col("n_caught").cast("double") / col("n_pairs").cast("double"))
        .orderBy(col("bucket"))
    },
    Some {
      val hashes = (0 until 12).map(i =>
        s"${Portable.duckSeededHash("shingle", i)} AS h$i").mkString(",\n            ")
      val mins = (0 until 12).map(i => s"min(h$i) AS mh$i").mkString(", ")
      val bandRows = (0 until 3).map { b =>
        val cols = (4 * b until 4 * (b + 1)).map(i => s"mh$i").mkString(", ")
        s"SELECT doc_id, $b AS band, ${Portable.duckHash64(s"concat_ws('_', $cols)")} AS bucket FROM mh"
      }.mkString("\n            UNION ALL ")
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 100
         |  UNION ALL SELECT doc_id + 100000, text || ' qx' FROM documents WHERE doc_id < 100),
         |sh AS (SELECT DISTINCT doc_id, substr(text, i, 9) AS shingle
         |       FROM (SELECT doc_id, text,
         |               unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i
         |             FROM corpus)),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
         |          FROM sh a JOIN sh b ON b.shingle = a.shingle AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |ap AS (SELECT id_a, id_b,
         |         CAST(ni AS DOUBLE) / CAST(sa.n + sb.n - ni AS DOUBLE) AS j
         |       FROM inter JOIN sizes sa ON sa.doc_id = id_a
         |                  JOIN sizes sb ON sb.doc_id = id_b),
         |bp AS (SELECT id_a, id_b, CAST(floor(j * 10) AS INT) AS bucket
         |       FROM ap WHERE j >= 0.1),
         |h AS (SELECT doc_id,
         |            $hashes
         |      FROM sh),
         |mh AS (SELECT doc_id, $mins FROM h GROUP BY doc_id),
         |bk AS (
         |            $bandRows),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
         |         WHERE a.doc_id < b.doc_id),
         |caught AS (SELECT bucket, count(*) AS n_caught
         |           FROM bp JOIN cand ON cand.id_a = bp.id_a AND cand.id_b = bp.id_b
         |           GROUP BY 1),
         |np AS (SELECT bucket, count(*) AS n_pairs FROM bp GROUP BY 1)
         |SELECT np.bucket, np.n_pairs,
         |       CAST(coalesce(caught.n_caught, 0) AS BIGINT) AS n_caught,
         |       CAST(coalesce(caught.n_caught, 0) AS DOUBLE) / CAST(np.n_pairs AS DOUBLE) AS catch_rate
         |FROM np LEFT JOIN caught ON caught.bucket = np.bucket
         |ORDER BY np.bucket""".stripMargin
    })

  /** Portable HyperLogLog (functions.HllSketch + Sketches.hllSketch):
    * per-source distinct-term cardinality from a FIXED 64-register
    * array per source — where the exact count shuffles the
    * vocabulary, the sketch moves 512 bytes per partition. The oracle
    * replays the REGISTERS exactly (`max(55 − len(bin(h // 64)))` per
    * hash bucket) and the raw estimate as the same explicit 64-term
    * chain of exact powers of two, so estimates — not just shapes —
    * hash-match. The zero-register count rides along as the
    * linear-counting correction's input (the correction itself needs
    * libm `ln` and stays JVM-side). */
  private def llm88 = Q("llm88_hll_distinct",
    (s, dir) => {
      import graft.llm.Sketches
      // 9-gram shingles, not word tokens: the synthetic vocabulary has
      // ~30 distinct words per source — linear-counting territory where
      // the raw estimate is biased by design; shingles give thousands
      // of distinct values per source, the regime the raw formula owns
      val terms = Dedup.atWidth(Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), col("text"))
          .where(col("text").isNotNull), col("doc_id"))
        .select(col("source"), col("text"),
          explode(sequence(lit(1), greatest(length(col("text")) - 8, lit(1)))).as("__i"))
        .select(col("source"), col("text").substr(col("__i"), lit(9)).as("term"))
      // Round-21 (guide §2.3/§2.4): hash each shingle ONCE and collapse
      // to the distinct (source, h) frame first — the old shape ran the
      // position-explode + md5 pass TWICE (once under the HLL sketch,
      // once under count_distinct) and shuffled the string-hash stream
      // through count_distinct's two-phase expand. HLL registers over
      // distinct hashes are identical (max over duplicates = max over
      // distincts); count over the distinct frame IS count_distinct.
      // The two consumers share the one (source, h) exchange via
      // ReuseExchange, so the corpus-scan floor is paid once.
      val dist = terms
        .select(col("source"), Portable.hash64(col("term")).as("__h"))
        .distinct()
      val hll = Sketches.hllSketchHashed(dist, Seq(col("source")), col("__h"), m = 64)
      val exact = dist.groupBy(col("source"))
        .agg(count(lit(1)).as("n_exact"))
      exact.join(hll, "source")
        .select(col("source"), col("n_exact"),
          Sketches.hllZeroRegisters(col("hll")).as("n_zero"),
          Sketches.hllRawEstimate(col("hll"), m = 64).as("raw_est"))
        .orderBy(col("source"))
    },
    Some {
      val h = Portable.duckHash64("term")
      val chain = (1 to 64).map(i =>
        s"(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << regs[$i]) AS DOUBLE))")
        .mkString("\n            + ")
      s"""WITH t AS (SELECT source, substr(text, i, 9) AS term
         |      FROM (SELECT source, text,
         |              unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i
         |            FROM documents)),
         |hh AS (SELECT source, $h AS h FROM t),
         |b AS (SELECT source, h % 64 AS bucket,
         |        CASE WHEN h // 64 = 0 THEN 55 ELSE 55 - len(bin(h // 64)) END AS rho
         |      FROM hh),
         |regs0 AS (SELECT source, bucket, max(rho) AS reg FROM b GROUP BY 1, 2),
         |grid AS (SELECT s.source, g.i AS bucket
         |         FROM (SELECT DISTINCT source FROM t) s
         |         CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) g),
         |regs AS (SELECT grid.source, grid.bucket, coalesce(regs0.reg, 0) AS reg
         |         FROM grid LEFT JOIN regs0
         |           ON regs0.source = grid.source AND regs0.bucket = grid.bucket),
         |rl AS (SELECT source, list(reg ORDER BY bucket) AS regs FROM regs GROUP BY source),
         |ex AS (SELECT source, count(DISTINCT $h) AS n_exact FROM t GROUP BY 1)
         |SELECT rl.source, CAST(ex.n_exact AS BIGINT) AS n_exact,
         |       CAST(len(list_filter(regs, r -> r = 0)) AS BIGINT) AS n_zero,
         |       CAST(0.709 AS DOUBLE) * CAST(64 AS DOUBLE) * CAST(64 AS DOUBLE) /
         |         ($chain) AS raw_est
         |FROM rl JOIN ex ON ex.source = rl.source
         |ORDER BY rl.source""".stripMargin
    })

  /** HLL MERGEABILITY — the property that makes the sketch a
    * scale primitive: the Spark side builds one sketch PER SOURCE
    * (llm88's artifacts), merges the 20 register arrays by
    * element-wise max, and estimates the union cardinality; the
    * oracle computes the union registers DIRECTLY from all values.
    * merged-of-parts must equal whole, register for register and
    * estimate for estimate — the metamorphic check that per-shard
    * sketches can be combined without touching data (cross-datacenter
    * distinct counts, incremental corpus unions). */
  private val llm89Slot = new TrackerSlot
  private def llm89 = Q("llm89_hll_union",
    (s, dir) => {
      import graft.llm.Sketches
      val shingles = Dedup.atWidth(Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), col("text"))
          .where(col("text").isNotNull), col("doc_id"))
        .select(col("source"), col("text"),
          explode(sequence(lit(1), greatest(length(col("text")) - 8, lit(1)))).as("__i"))
        .select(col("source"), col("text").substr(col("__i"), lit(9)).as("term"))
      // Round-21: one md5 pass — the distinct (source, h) frame feeds
      // all three consumers (per-source sketches → merge, row count =
      // n_sources, global exact count). The consumers' column pruning
      // DIVERGES (the exact branch prunes to __h alone, the
      // source-count branch to source alone), so the planner sees three
      // non-canonical subtrees and AQE exchange reuse never fires — an
      // un-materialized dist re-scanned the corpus three times
      // (verified on the executed plan). Materialize the 8-byte-pair
      // frame ONCE (guide §8: decide on the lightweight proxy, scan the
      // heavy bytes once); every consumer reads the leaf. perSource is
      // a 20-row frame — materializing it lets the merge and the
      // n_sources count share one aggregation instead of re-running it.
      val tr = llm89Slot.fresh()
      val dist = tr.track(graft.operators.Materialize.eager(
        shingles.select(col("source"), Portable.hash64(col("term")).as("__h"))
          .distinct()))
      val perSource = tr.track(graft.operators.Materialize.eager(
        Sketches.hllSketchHashed(dist, Seq(col("source")), col("__h"), m = 64)))
      // merge by element-wise max across the 20 per-source arrays
      val merged = perSource
        .select(posexplode(col("hll")).as(Seq("bucket", "reg")))
        .groupBy(col("bucket")).agg(max(col("reg")).as("reg"))
        .agg(sort_array(collect_list(struct(col("bucket"), col("reg")))).as("br"))
        .select(transform(col("br"), x => x.getField("reg")).as("hll"))
      // n_sources is the per-source sketch frame's row count (one row
      // per distinct source by construction) — a 20-row count; the lone
      // count_distinct(__h) plans without the two-distinct Expand that
      // doubled the stream in the pre-round-21 shape.
      val nSources = perSource.agg(count(lit(1)).as("n_sources"))
      val stats = dist.agg(count_distinct(col("__h")).as("n_exact"))
        .crossJoin(broadcast(nSources))
      stats.crossJoin(merged)
        .select(col("n_sources"), col("n_exact"),
          Sketches.hllZeroRegisters(col("hll")).as("n_zero"),
          Sketches.hllRawEstimate(col("hll"), m = 64).as("raw_est"))
    },
    Some {
      val h = Portable.duckHash64("term")
      val chain = (1 to 64).map(i =>
        s"(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << regs[$i]) AS DOUBLE))")
        .mkString("\n            + ")
      s"""WITH t AS (SELECT source, substr(text, i, 9) AS term
         |      FROM (SELECT source, text,
         |              unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i
         |            FROM documents)),
         |hh AS (SELECT $h AS h FROM t),
         |b AS (SELECT h % 64 AS bucket,
         |        CASE WHEN h // 64 = 0 THEN 55 ELSE 55 - len(bin(h // 64)) END AS rho
         |      FROM hh),
         |regs0 AS (SELECT bucket, max(rho) AS reg FROM b GROUP BY 1),
         |grid AS (SELECT unnest(generate_series(0, 63)) AS bucket),
         |regs AS (SELECT grid.bucket, coalesce(regs0.reg, 0) AS reg
         |         FROM grid LEFT JOIN regs0 ON regs0.bucket = grid.bucket),
         |rl AS (SELECT list(reg ORDER BY bucket) AS regs FROM regs),
         |st AS (SELECT count(DISTINCT source) AS n_sources,
         |              count(DISTINCT $h) AS n_exact FROM t)
         |SELECT CAST(st.n_sources AS BIGINT) AS n_sources,
         |       CAST(st.n_exact AS BIGINT) AS n_exact,
         |       CAST(len(list_filter(regs, r -> r = 0)) AS BIGINT) AS n_zero,
         |       CAST(0.709 AS DOUBLE) * CAST(64 AS DOUBLE) * CAST(64 AS DOUBLE) /
         |         ($chain) AS raw_est
         |FROM st CROSS JOIN rl""".stripMargin
    },
    cleanup = Some(_ => llm89Slot.drain()))

  /** BATCH BM25 retrieval + reciprocal-rank eval
    * (Retrieval.bm25Batch): 20 queries — each the 1st/3rd/5th token
    * of a document, that document being the planted relevant answer —
    * run against the corpus in ONE pass (llm25 bakes a single query's
    * terms into the plan; a driver loop over N queries scans the
    * corpus N times, which is the shape this operator exists to
    * kill). Per query: the planted document's rank under
    * (score desc, doc_id) and its reciprocal rank — the MRR
    * ingredients, oracle-replayed with the exact llm25 double-op
    * spellings. */
  private val llm90Slot = new TrackerSlot
  private def llm90 = Q("llm90_batch_retrieval_mrr",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val qsrc = d.filter(col("doc_id") < 20)
        .select(col("doc_id").as("qid"), Dedup.tokens(col("text")).as("tk"))
      val queries = qsrc.select(col("qid"),
          explode(array(element_at(col("tk"), 1), element_at(col("tk"), 3),
                        element_at(col("tk"), 5))).as("term"))
        .where(col("term").isNotNull)
      val scored = Retrieval.bm25Batch(d, col("doc_id"), col("text"),
        queries, col("qid"), col("term"), idfMode = Retrieval.OddsIdf,
        tracker = Some(llm90Slot.fresh()))
      val ranked = scored.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))))
      ranked.filter(col("doc_id") === col("qid"))
        .select(col("qid"), col("rank"),
          (lit(1.0) / col("rank").cast("double")).as("rr"))
        .orderBy(col("qid"))
    },
    Some("""WITH t AS (SELECT doc_id,
           |              list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS tk
           |            FROM documents),
           |wl AS (SELECT doc_id, tk, len(tk) AS dl FROM t),
           |stats AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM wl),
           |q AS (SELECT DISTINCT qid, term FROM (
           |        SELECT doc_id AS qid, unnest([tk[1], tk[3], tk[5]]) AS term
           |        FROM t WHERE doc_id < 20)
           |      WHERE term IS NOT NULL),
           |tf AS (SELECT doc_id, dl, tok, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS tok FROM wl)
           |       WHERE tok IN (SELECT term FROM q)
           |       GROUP BY 1, 2, 3),
           |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
           |sq AS (SELECT q.qid, tf.doc_id,
           |        CAST(floor(
           |          (((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
           |           * ((CAST(tf AS DOUBLE) * (1.2 + 1.0))
           |              / (CAST(tf AS DOUBLE)
           |                 + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
           |                                         / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))))
           |          * 1e6) AS BIGINT) AS sq
           |      FROM tf JOIN dfq USING (tok) JOIN q ON q.term = tf.tok CROSS JOIN stats),
           |agg AS (SELECT qid, doc_id, CAST(sum(sq) AS DOUBLE) / 1e6 AS score
           |        FROM sq GROUP BY 1, 2),
           |r AS (SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
           |        ORDER BY score DESC, doc_id) AS rank FROM agg)
           |SELECT qid, CAST(rank AS INT) AS rank,
           |       CAST(1 AS DOUBLE) / CAST(rank AS DOUBLE) AS rr
           |FROM r WHERE doc_id = qid
           |ORDER BY qid""".stripMargin),
    cleanup = Some(_ => llm90Slot.drain()))

  private val llm91Cache =
    new java.util.concurrent.atomic.AtomicReference[org.apache.spark.sql.DataFrame]()
  private val llm91Slot = new TrackerSlot
  /** Contrastive-pair MINING for embedding training: every anchor
    * takes its most-similar LSH-candidate at Jaccard >= 0.5 as the
    * POSITIVE and its least-similar candidate in [0.05, 0.5) as the
    * HARD NEGATIVE -- a confusable that shared a band bucket without
    * being a near-dup, exactly the negative a contrastive loss learns
    * most from (random negatives are too easy; the bucket join IS the
    * hard-negative miner). The corpus plants both tiers: ' qx' twins
    * (j ~ 0.97) and COUSINS -- a 150-char excerpt plus a boilerplate
    * tail every cousin shares (j ~ 0.2 against the anchor). Mining
    * runs WIDE banding (6 bands x 2 rows, vs dedup's 3 x 4): the
    * S-curve llm87 measures says narrow bands structurally cannot
    * surface mid-similarity candidates, so the miner shifts the curve
    * left and lets exact Jaccard sort the tiers. Picks break ties by
    * id; the oracle replays corpus, banding, and both picks. */
  private def llm91 = Q("llm91_contrastive_pairs",
    (s, dir) => {
      // a bounded mining slice (doc_id < 500 at any SF): triple mining
      // SAMPLES by design -- a training run wants N good triples, not
      // all of them, and a production sweep shards exactly like this.
      // Wide banding over an unbounded corpus would also explode the
      // candidate set (2-row bands bucket ~0.25% of ALL pairs).
      val d = Tables.documents(s, dir).filter(col("doc_id") < 500)
        .select(col("doc_id"), col("text"))
      val tail = " end of excerpt boilerplate tail common to every preview snippet"
      val corpus = d
        .unionByName(d.select((col("doc_id") + 100000L).as("doc_id"),
          concat(col("text"), lit(" qx")).as("text")))
        .unionByName(d.select((col("doc_id") + 200000L).as("doc_id"),
          concat(substring(col("text"), 1, 150), lit(tail)).as("text")))
      Option(llm91Cache.getAndSet(null)).foreach(_.unpersist())
      val docs = Dedup.minhashSignatureAndSets(corpus, col("doc_id"), col("text"),
          n = 9, k = 12).persist()
      llm91Cache.set(docs)
      val pairs = Dedup.candidatePairs(Dedup.lshBuckets(docs, k = 12, rowsPerBand = 2))
      val a = docs.select(col("doc_id").as("id_a"), col("shh").as("sh_a"))
      val b = docs.select(col("doc_id").as("id_b"), col("shh").as("sh_b"))
      // symmetrize so every member of a pair can anchor.
      // round-21 (guide §1.2 step 1): the verify join (pairs ⋈ sets ⋈
      // sets + native Jaccard) is the query's floor, and the old shape
      // executed it FOUR times — the symmetrize union duplicated its
      // subtree and the pos/neg branches each consumed both copies.
      // Materialize the scored pair frame once (LSH-candidate-bounded);
      // the flip is a projection of the leaf, and pos/neg collapse into
      // ONE conditional aggregate per anchor (min ignores the rows the
      // other tier's when() nulls out; anchors lacking either tier drop
      // exactly like the old inner join).
      val tr91 = llm91Slot.fresh()
      val scored0 = tr91.track(graft.operators.Materialize.eager(
        pairs.join(a, "id_a").join(b, "id_b")
          .select(col("id_a"), col("id_b"),
            Dedup.jaccard(col("sh_a"), col("sh_b")).as("j"))))
      val scored = scored0.unionByName(
        scored0.select(col("id_b").as("id_a"), col("id_a").as("id_b"), col("j")))
      scored.groupBy(col("id_a").as("anchor"))
        .agg(
          min(when(col("j") >= 0.5,
            struct((-col("j")).as("nj"), col("id_b")))).as("p"),
          min(when(col("j") >= 0.05 && col("j") < 0.5,
            struct(col("j"), col("id_b")))).as("n"))
        .filter(col("p").isNotNull && col("n").isNotNull)
        .select(col("anchor"), col("p.id_b").as("positive"),
          col("n.id_b").as("negative"))
        .orderBy(col("anchor"))
    },
    Some {
      val tail = " end of excerpt boilerplate tail common to every preview snippet"
      val hashes = (0 until 12).map(i =>
        s"${Portable.duckSeededHash("shingle", i)} AS h$i").mkString(",\n            ")
      val mins = (0 until 12).map(i => s"min(h$i) AS mh$i").mkString(", ")
      val bandRows = (0 until 6).map { bnd =>
        val cols = (2 * bnd until 2 * (bnd + 1)).map(i => s"mh$i").mkString(", ")
        s"SELECT doc_id, $bnd AS band, ${Portable.duckHash64(s"concat_ws('_', $cols)")} AS bucket FROM mh"
      }.mkString("\n            UNION ALL ")
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 500
         |  UNION ALL SELECT doc_id + 100000, text || ' qx' FROM documents WHERE doc_id < 500
         |  UNION ALL SELECT doc_id + 200000, substr(text, 1, 150) || '$tail'
         |    FROM documents WHERE doc_id < 500),
         |sh AS (SELECT DISTINCT doc_id, substr(text, i, 9) AS shingle
         |       FROM (SELECT doc_id, text,
         |               unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i
         |             FROM corpus)),
         |h AS (SELECT doc_id,
         |            $hashes
         |      FROM sh),
         |mh AS (SELECT doc_id, $mins FROM h GROUP BY doc_id),
         |bk AS (
         |            $bandRows),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |          FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
         |          WHERE a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT p.id_a, p.id_b, count(*) AS ni
         |          FROM pairs p
         |          JOIN sh a ON a.doc_id = p.id_a
         |          JOIN sh b ON b.doc_id = p.id_b AND b.shingle = a.shingle
         |          GROUP BY 1, 2),
         |jac0 AS (SELECT i.id_a, i.id_b,
         |           CAST(i.ni AS DOUBLE) / CAST(sa.n + sb.n - i.ni AS DOUBLE) AS j
         |         FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
         |                      JOIN sizes sb ON sb.doc_id = i.id_b),
         |jac AS (SELECT id_a, id_b, j FROM jac0
         |        UNION ALL SELECT id_b, id_a, j FROM jac0),
         |pos AS (SELECT anchor, id_b AS positive FROM (
         |          SELECT id_a AS anchor, id_b,
         |            row_number() OVER (PARTITION BY id_a ORDER BY j DESC, id_b) AS rn
         |          FROM jac WHERE j >= 0.5) WHERE rn = 1),
         |neg AS (SELECT anchor, id_b AS negative FROM (
         |          SELECT id_a AS anchor, id_b,
         |            row_number() OVER (PARTITION BY id_a ORDER BY j ASC, id_b) AS rn
         |          FROM jac WHERE j >= 0.05 AND j < 0.5) WHERE rn = 1)
         |SELECT pos.anchor, pos.positive, neg.negative
         |FROM pos JOIN neg ON neg.anchor = pos.anchor
         |ORDER BY pos.anchor""".stripMargin
    },
    cleanup = Some(_ => {
      Option(llm91Cache.getAndSet(null)).foreach(_.unpersist())
      llm91Slot.drain()
    }))

  /** MEMORIZATION audit of generated text against the training
    * corpus: per generated sample, the fraction of its 9-gram
    * shingles present ANYWHERE in training — llm16's decontamination
    * asks which train doc an eval doc matches; this asks how much of
    * a model OUTPUT is regurgitated training text, the post-training
    * leak check. The fixture plants both verdicts: samples 0-19 are
    * training docs with a 3-char suffix (known_frac ≈ 1 → flagged),
    * samples 20-39 are the same docs REVERSED (novel 9-grams,
    * known_frac ≈ 0 → clean). The index is the distinct corpus
    * shingle-hash set — one semi join per generated shingle, linear
    * in generated volume, never corpus×generated. */
  private def llm92 = Q("llm92_memorization_audit",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val gen = d.filter(col("doc_id") < 20)
        .select(col("doc_id").as("gen_id"), concat(col("text"), lit(" qx")).as("text"))
        .unionByName(d.filter(col("doc_id") < 20)
          .select((col("doc_id") + 20).as("gen_id"), reverse(col("text")).as("text")))
      // direct position-explode hashing: the audit needs flat distinct
      // hash ROWS, so building per-doc set arrays (collect_set) only to
      // re-explode them would pay an extra aggregate for nothing
      def shingleHashes(df: org.apache.spark.sql.DataFrame, id: org.apache.spark.sql.Column) =
        df.where(col("text").isNotNull)
          .select(id, col("text"),
            explode(sequence(lit(1), greatest(length(col("text")) - 8, lit(1)))).as("__i"))
          .select(id, xxhash64(col("text").substr(col("__i"), lit(9))).as("__h"))
      val trainSh = shingleHashes(d, col("doc_id")).select(col("__h")).distinct()
      val genSh = shingleHashes(gen, col("gen_id")).distinct()
      val known = genSh.join(trainSh, Seq("__h"), "left_semi")
        .groupBy(col("gen_id")).agg(count(lit(1)).as("n_known"))
      genSh.groupBy(col("gen_id")).agg(count(lit(1)).as("n_shingles"))
        .join(known, Seq("gen_id"), "left")
        .select(col("gen_id"), col("n_shingles"),
          coalesce(col("n_known"), lit(0L)).as("n_known"))
        .withColumn("known_frac",
          col("n_known").cast("double") / col("n_shingles").cast("double"))
        .withColumn("flagged", col("known_frac") >= 0.8)
        .orderBy(col("gen_id"))
    },
    Some("""WITH gen AS (
           |  SELECT doc_id AS gen_id, text || ' qx' AS text FROM documents WHERE doc_id < 20
           |  UNION ALL
           |  SELECT doc_id + 20, reverse(text) FROM documents WHERE doc_id < 20),
           |tsh AS (SELECT DISTINCT substr(text, i, 9) AS sh
           |        FROM (SELECT text, unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i
           |              FROM documents)),
           |gsh AS (SELECT DISTINCT gen_id, substr(text, i, 9) AS sh
           |        FROM (SELECT gen_id, text,
           |                unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i
           |              FROM gen)),
           |kn AS (SELECT gen_id, count(*) AS n_known
           |       FROM gsh WHERE sh IN (SELECT sh FROM tsh) GROUP BY 1),
           |tot AS (SELECT gen_id, count(*) AS n_shingles FROM gsh GROUP BY 1)
           |SELECT tot.gen_id, tot.n_shingles,
           |       CAST(coalesce(kn.n_known, 0) AS BIGINT) AS n_known,
           |       CAST(coalesce(kn.n_known, 0) AS DOUBLE) / CAST(tot.n_shingles AS DOUBLE) AS known_frac,
           |       CAST(coalesce(kn.n_known, 0) AS DOUBLE) / CAST(tot.n_shingles AS DOUBLE) >= 0.8 AS flagged
           |FROM tot LEFT JOIN kn ON kn.gen_id = tot.gen_id
           |ORDER BY tot.gen_id""".stripMargin))

  /** Inter-rater agreement (Cohen's kappa) between two quality
    * raters — the calibration check before trusting any single gate
    * as ground truth for classifier training (llm43/llm51 label from
    * ONE gate; kappa says how much two independent gates actually
    * agree beyond chance). Rater A is the full Gopher rule set, rater
    * B a stricter length/symbol/alpha gate; the 2×2 contingency
    * counts are exact longs, and po/pe/kappa are the same
    * fixed-order double expressions in both engines (guarded for the
    * degenerate pe=1 corpus). */
  private def llm93 = Q("llm93_rater_agreement",
    (s, dir) => {
      val t = TextAnalysis
      val m = Tables.documents(s, dir).select(col("doc_id"),
        t.tokenCount(col("text")).cast("long").as("n_words"),
        t.meanTokenLen(col("text")).as("mean_word_len"),
        t.symbolWordRatio(col("text")).as("symbol_ratio"),
        t.bulletLineFrac(col("text")).as("bullet_frac"),
        t.ellipsisLineFrac(col("text")).as("ellipsis_frac"),
        t.alphaWordFrac(col("text")).as("alpha_frac"),
        t.gopherStopwordHits(col("text")).cast("long").as("stop_hits"))
      val v = m.select(
        t.gopherPass(col("n_words"), col("mean_word_len"), col("symbol_ratio"),
          col("bullet_frac"), col("ellipsis_frac"), col("alpha_frac"),
          col("stop_hits"), minStopHits = 1).as("a"),
        (col("n_words") >= 60 && col("symbol_ratio") < 0.05 &&
          col("alpha_frac") > 0.9).as("b"))
      val cells = v.agg(
        sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n11"),
        sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("n10"),
        sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("n01"),
        sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("n00"))
      val n = col("n11") + col("n10") + col("n01") + col("n00")
      val po = (col("n11") + col("n00")).cast("double") / n.cast("double")
      val pe = (((col("n11") + col("n10")) * (col("n11") + col("n01"))).cast("double") +
                ((col("n00") + col("n10")) * (col("n00") + col("n01"))).cast("double")) /
               (n * n).cast("double")
      cells.select(col("n11"), col("n10"), col("n01"), col("n00"),
        po.as("po"), pe.as("pe"),
        when(lit(1.0) - pe === 0.0, 0.0)
          .otherwise((po - pe) / (lit(1.0) - pe)).as("kappa"))
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text,
           |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks,
           |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS ltoks,
           |    string_split(text, chr(10)) AS lines
           |  FROM documents),
           |m AS (
           |  SELECT doc_id,
           |    CAST(len(toks) AS BIGINT) AS n_words,
           |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
           |      / CAST(greatest(len(toks), 1) AS DOUBLE) AS mean_word_len,
           |    CAST((length(text) - length(replace(text, '#', '')))
           |         + ((length(text) - length(replace(text, '...', ''))) / 3) AS DOUBLE)
           |      / CAST(greatest(len(toks), 1) AS DOUBLE) AS symbol_ratio,
           |    CAST(len(list_filter(lines, l -> left(ltrim(l), 1) = '-'
           |           OR left(ltrim(l), 1) = '*' OR left(ltrim(l), 1) = '•')) AS DOUBLE)
           |      / CAST(greatest(len(lines), 1) AS DOUBLE) AS bullet_frac,
           |    CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...')
           |           OR ends_with(rtrim(l), '…'))) AS DOUBLE)
           |      / CAST(greatest(len(lines), 1) AS DOUBLE) AS ellipsis_frac,
           |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
           |      / CAST(greatest(len(toks), 1) AS DOUBLE) AS alpha_frac,
           |    CAST(CAST(list_contains(ltoks, 'the') AS INTEGER)
           |       + CAST(list_contains(ltoks, 'be') AS INTEGER)
           |       + CAST(list_contains(ltoks, 'to') AS INTEGER)
           |       + CAST(list_contains(ltoks, 'of') AS INTEGER)
           |       + CAST(list_contains(ltoks, 'and') AS INTEGER)
           |       + CAST(list_contains(ltoks, 'that') AS INTEGER)
           |       + CAST(list_contains(ltoks, 'have') AS INTEGER)
           |       + CAST(list_contains(ltoks, 'with') AS INTEGER) AS BIGINT) AS stop_hits
           |  FROM t),
           |v AS (SELECT
           |    (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
           |    AND (symbol_ratio < 0.1) AND (bullet_frac < 0.9)
           |    AND (ellipsis_frac < 0.3) AND (alpha_frac > 0.8)
           |    AND (stop_hits >= 1) AS a,
           |    (n_words >= 60 AND symbol_ratio < 0.05 AND alpha_frac > 0.9) AS b
           |  FROM m),
           |c AS (SELECT
           |    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
           |    CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
           |    CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
           |    CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00
           |  FROM v)
           |SELECT n11, n10, n01, n00,
           |  CAST(n11 + n00 AS DOUBLE) / CAST(n11 + n10 + n01 + n00 AS DOUBLE) AS po,
           |  (CAST((n11 + n10) * (n11 + n01) AS DOUBLE) + CAST((n00 + n10) * (n00 + n01) AS DOUBLE))
           |    / CAST((n11 + n10 + n01 + n00) * (n11 + n10 + n01 + n00) AS DOUBLE) AS pe,
           |  CASE WHEN 1.0 - ((CAST((n11 + n10) * (n11 + n01) AS DOUBLE) + CAST((n00 + n10) * (n00 + n01) AS DOUBLE))
           |    / CAST((n11 + n10 + n01 + n00) * (n11 + n10 + n01 + n00) AS DOUBLE)) = 0.0 THEN 0.0
           |  ELSE (CAST(n11 + n00 AS DOUBLE) / CAST(n11 + n10 + n01 + n00 AS DOUBLE)
           |        - (CAST((n11 + n10) * (n11 + n01) AS DOUBLE) + CAST((n00 + n10) * (n00 + n01) AS DOUBLE))
           |          / CAST((n11 + n10 + n01 + n00) * (n11 + n10 + n01 + n00) AS DOUBLE))
           |       / (1.0 - (CAST((n11 + n10) * (n11 + n01) AS DOUBLE) + CAST((n00 + n10) * (n00 + n01) AS DOUBLE))
           |          / CAST((n11 + n10 + n01 + n00) * (n11 + n10 + n01 + n00) AS DOUBLE)) END AS kappa
           |FROM c""".stripMargin))

  /** Boilerplate shingle MINING (Dedup.boilerplateShingles): the
    * n-gram strings shared by ≥ minDf documents — cookie banners,
    * license footers, navigation chrome — recovered AS STRINGS for a
    * strip list. The fixture plants a footer on every third document
    * (df ≈ n/3, far above the organic shingle ceiling at minDf=150);
    * document frequencies count on hashes with strings recovered only
    * for the heavy hitters, so corpus text never shuffles in either
    * pass. */
  private def llm94 = Q("llm94_boilerplate_mining",
    (s, dir) => {
      val footer = " copyright footer all rights reserved contact admin example"
      val d = Tables.documents(s, dir).select(col("doc_id"),
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(footer)))
          .otherwise(col("text")).as("text"))
      Dedup.boilerplateShingles(d, col("doc_id"), col("text"), n = 9, minDf = 150)
        .orderBy(col("shingle"))
    },
    Some("""WITH d AS (SELECT doc_id,
           |        CASE WHEN doc_id % 3 = 0
           |             THEN text || ' copyright footer all rights reserved contact admin example'
           |             ELSE text END AS text
           |      FROM documents),
           |sh AS (SELECT DISTINCT doc_id, substr(text, i, 9) AS s
           |       FROM (SELECT doc_id, text,
           |               unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i
           |             FROM d)),
           |dfc AS (SELECT s, count(*) AS df FROM sh GROUP BY 1)
           |SELECT s AS shingle, df FROM dfc WHERE df >= 150
           |ORDER BY shingle""".stripMargin))

  /** Deterministic token-dropout augmentation
    * (Sampling.tokenDropout): 10% of each document's tokens drop by
    * the portable hash of (salt, doc id, position) — reproducible
    * noising whose augmented text an engine, rerun, or different
    * cluster size re-derives EXACTLY (the oracle rebuilds every
    * augmented string verbatim, so the hash compare covers the full
    * output text, not just counts). A document losing every token
    * drops from the output in both engines by the same rule. */
  private def llm95 = Q("llm95_token_dropout",
    (s, dir) => {
      import graft.llm.Sampling
      Sampling.tokenDropout(Tables.documents(s, dir),
          col("doc_id"), col("text"), dropPct = 10, salt = "aug")
        .orderBy(col("doc_id"))
    },
    Some {
      val h = Portable.duckHash64(
        "concat('aug:', CAST(doc_id AS VARCHAR), ':', CAST(p AS VARCHAR))")
      s"""WITH t AS (SELECT doc_id,
         |        list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS toks
         |      FROM documents),
         |p AS (SELECT doc_id, len(toks) AS n_tokens, i - 1 AS p, toks[i] AS tok
         |      FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t)),
         |k AS (SELECT * FROM p WHERE $h % 100 >= 10)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |       count(*) AS n_kept,
         |       string_agg(tok, ' ' ORDER BY p) AS aug_text
         |FROM k GROUP BY doc_id, n_tokens
         |ORDER BY doc_id""".stripMargin
    })

  /** K-ANONYMITY audit over quasi-identifiers — the privacy-risk
    * report a dataset release runs beside the PII scrub (llm20
    * removes direct identifiers; this measures RE-identification
    * risk from attribute combinations that survive scrubbing): group
    * documents by the (lang, source, length-bucket) quasi-identifier
    * tuple and report, per k threshold, how many equivalence classes
    * and how many documents sit in groups smaller than k. One
    * aggregate on the tuple, then a threshold sweep over the tiny
    * class histogram — nothing re-scans the corpus per k. */
  private def llm96 = Q("llm96_k_anonymity",
    (s, dir) => {
      val classes = Tables.documents(s, dir)
        .groupBy(col("lang"), col("source"),
          expr("n_chars DIV 200").as("len_bucket"))
        .agg(count(lit(1)).as("csize"))
      val ks = Seq(2, 5, 11)
      val rows = ks.map { k =>
        classes.agg(
          lit(k).as("k"),
          count(lit(1)).as("n_classes"),
          sum(when(col("csize") < k, 1L).otherwise(0L)).as("n_risky_classes"),
          sum(when(col("csize") < k, col("csize")).otherwise(0L)).as("n_docs_at_risk"))
      }
      rows.reduce(_ unionByName _).orderBy(col("k"))
    },
    Some("""WITH c AS (SELECT lang, source, n_chars // 200 AS len_bucket,
           |             count(*) AS csize
           |           FROM documents GROUP BY 1, 2, 3),
           |ks AS (SELECT unnest([2, 5, 11]) AS k)
           |SELECT CAST(ks.k AS INT) AS k,
           |       count(*) AS n_classes,
           |       CAST(sum(CASE WHEN csize < ks.k THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_classes,
           |       CAST(sum(CASE WHEN csize < ks.k THEN csize ELSE 0 END) AS BIGINT) AS n_docs_at_risk
           |FROM c CROSS JOIN ks
           |GROUP BY ks.k ORDER BY k""".stripMargin))

  /** Quality-gate ABLATION: which Gopher rule does the rejecting —
    * per rule, how many documents fail it at all and how many fail
    * ONLY it (the rule's unique contribution; a rule with zero unique
    * rejections is redundant at current thresholds, one dominating
    * the unique column deserves a threshold review). One scan
    * computes all rule verdicts in a single projection; the per-rule
    * rows are a literal explode over that row's booleans, so the
    * corpus is read once for the whole ablation. */
  private def llm97 = Q("llm97_gate_ablation",
    (s, dir) => {
      val t = TextAnalysis
      val m = Tables.documents(s, dir).select(
        t.tokenCount(col("text")).cast("long").as("n_words"),
        t.meanTokenLen(col("text")).as("mwl"),
        t.symbolWordRatio(col("text")).as("sym"),
        t.bulletLineFrac(col("text")).as("bul"),
        t.ellipsisLineFrac(col("text")).as("ell"),
        t.alphaWordFrac(col("text")).as("alpha"),
        t.gopherStopwordHits(col("text")).cast("long").as("stop"))
      val rules: Seq[(String, org.apache.spark.sql.Column)] = Seq(
        "word_count"   -> (col("n_words") >= 50 && col("n_words") <= 100000),
        "mean_wordlen" -> (col("mwl") >= 3.0 && col("mwl") <= 10.0),
        "symbol_ratio" -> (col("sym") < 0.1),
        "bullet_frac"  -> (col("bul") < 0.9),
        "ellipsis"     -> (col("ell") < 0.3),
        "alpha_frac"   -> (col("alpha") > 0.8),
        "stopwords"    -> (col("stop") >= 1))
      val flagged = m.select(rules.map { case (nm, c) => c.as(nm) }: _*)
        .withColumn("__nfail",
          rules.map { case (nm, _) => when(!col(nm), 1).otherwise(0) }.reduce(_ + _))
      // round-21 (guide §1.2 step 1 — don't compute things twice): the
      // old shape unioned one .agg() PER RULE, re-scanning the corpus
      // and re-computing every text metric 7×. All 14 sums now ride ONE
      // aggregate over one scan; the per-rule rows come off the single
      // result row by an explode of a 7-element literal array.
      val aggs = rules.flatMap { case (nm, _) => Seq(
        sum(when(!col(nm), 1L).otherwise(0L)).as(s"__f_$nm"),
        sum(when(!col(nm) && col("__nfail") === 1, 1L).otherwise(0L)).as(s"__u_$nm")) }
      flagged.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(rules.map { case (nm, _) =>
          struct(lit(nm).as("rule"), col(s"__f_$nm").as("n_fail"),
            col(s"__u_$nm").as("n_unique_fail")) }: _*)).as("__r"))
        .select(col("__r.rule").as("rule"), col("__r.n_fail").as("n_fail"),
          col("__r.n_unique_fail").as("n_unique_fail"))
        .orderBy(col("rule"))
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text,
           |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks,
           |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS ltoks,
           |    string_split(text, chr(10)) AS lines
           |  FROM documents),
           |m AS (
           |  SELECT doc_id,
           |    CAST(len(toks) AS BIGINT) AS n_words,
           |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
           |      / CAST(greatest(len(toks), 1) AS DOUBLE) AS mwl,
           |    CAST((length(text) - length(replace(text, '#', '')))
           |         + ((length(text) - length(replace(text, '...', ''))) / 3) AS DOUBLE)
           |      / CAST(greatest(len(toks), 1) AS DOUBLE) AS sym,
           |    CAST(len(list_filter(lines, l -> left(ltrim(l), 1) = '-'
           |           OR left(ltrim(l), 1) = '*' OR left(ltrim(l), 1) = '•')) AS DOUBLE)
           |      / CAST(greatest(len(lines), 1) AS DOUBLE) AS bul,
           |    CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...')
           |           OR ends_with(rtrim(l), '…'))) AS DOUBLE)
           |      / CAST(greatest(len(lines), 1) AS DOUBLE) AS ell,
           |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
           |      / CAST(greatest(len(toks), 1) AS DOUBLE) AS alpha,
           |    CAST(CAST(list_contains(ltoks, 'the') AS INTEGER)
           |       + CAST(list_contains(ltoks, 'be') AS INTEGER)
           |       + CAST(list_contains(ltoks, 'to') AS INTEGER)
           |       + CAST(list_contains(ltoks, 'of') AS INTEGER)
           |       + CAST(list_contains(ltoks, 'and') AS INTEGER)
           |       + CAST(list_contains(ltoks, 'that') AS INTEGER)
           |       + CAST(list_contains(ltoks, 'have') AS INTEGER)
           |       + CAST(list_contains(ltoks, 'with') AS INTEGER) AS BIGINT) AS stop
           |  FROM t),
           |v AS (SELECT
           |    (n_words >= 50 AND n_words <= 100000) AS word_count,
           |    (mwl >= 3.0 AND mwl <= 10.0) AS mean_wordlen,
           |    (sym < 0.1) AS symbol_ratio,
           |    (bul < 0.9) AS bullet_frac,
           |    (ell < 0.3) AS ellipsis,
           |    (alpha > 0.8) AS alpha_frac,
           |    (stop >= 1) AS stopwords
           |  FROM m),
           |f AS (SELECT *,
           |    (CASE WHEN NOT word_count THEN 1 ELSE 0 END
           |     + CASE WHEN NOT mean_wordlen THEN 1 ELSE 0 END
           |     + CASE WHEN NOT symbol_ratio THEN 1 ELSE 0 END
           |     + CASE WHEN NOT bullet_frac THEN 1 ELSE 0 END
           |     + CASE WHEN NOT ellipsis THEN 1 ELSE 0 END
           |     + CASE WHEN NOT alpha_frac THEN 1 ELSE 0 END
           |     + CASE WHEN NOT stopwords THEN 1 ELSE 0 END) AS nfail
           |  FROM v)
           |SELECT rule, n_fail, n_unique_fail FROM (
           |  SELECT 'word_count' AS rule,
           |    CAST(sum(CASE WHEN NOT word_count THEN 1 ELSE 0 END) AS BIGINT) AS n_fail,
           |    CAST(sum(CASE WHEN NOT word_count AND nfail = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique_fail FROM f
           |  UNION ALL SELECT 'mean_wordlen',
           |    CAST(sum(CASE WHEN NOT mean_wordlen THEN 1 ELSE 0 END) AS BIGINT),
           |    CAST(sum(CASE WHEN NOT mean_wordlen AND nfail = 1 THEN 1 ELSE 0 END) AS BIGINT) FROM f
           |  UNION ALL SELECT 'symbol_ratio',
           |    CAST(sum(CASE WHEN NOT symbol_ratio THEN 1 ELSE 0 END) AS BIGINT),
           |    CAST(sum(CASE WHEN NOT symbol_ratio AND nfail = 1 THEN 1 ELSE 0 END) AS BIGINT) FROM f
           |  UNION ALL SELECT 'bullet_frac',
           |    CAST(sum(CASE WHEN NOT bullet_frac THEN 1 ELSE 0 END) AS BIGINT),
           |    CAST(sum(CASE WHEN NOT bullet_frac AND nfail = 1 THEN 1 ELSE 0 END) AS BIGINT) FROM f
           |  UNION ALL SELECT 'ellipsis',
           |    CAST(sum(CASE WHEN NOT ellipsis THEN 1 ELSE 0 END) AS BIGINT),
           |    CAST(sum(CASE WHEN NOT ellipsis AND nfail = 1 THEN 1 ELSE 0 END) AS BIGINT) FROM f
           |  UNION ALL SELECT 'alpha_frac',
           |    CAST(sum(CASE WHEN NOT alpha_frac THEN 1 ELSE 0 END) AS BIGINT),
           |    CAST(sum(CASE WHEN NOT alpha_frac AND nfail = 1 THEN 1 ELSE 0 END) AS BIGINT) FROM f
           |  UNION ALL SELECT 'stopwords',
           |    CAST(sum(CASE WHEN NOT stopwords THEN 1 ELSE 0 END) AS BIGINT),
           |    CAST(sum(CASE WHEN NOT stopwords AND nfail = 1 THEN 1 ELSE 0 END) AS BIGINT) FROM f)
           |ORDER BY rule""".stripMargin))

  /** llm98's fixture: the documents corpus with event timestamps,
    * delivered TWICE into a file-source directory — the full corpus,
    * then an at-least-once REDELIVERY of every 5th doc (byte-identical
    * rows, the delivery semantics every CDC/queue source actually
    * has). Written once per (sf dir) outside the bench timer. */
  /** Shared stream-fixture builder for llm98/llm102: the documents
    * corpus with event timestamps and a planted byte-identical
    * redelivery of every `redeliverMod`-th doc. Texts get a ` d<id>`
    * suffix so two DISTINCT docs can never share bytes: the streaming
    * dedup key is the content hash, and a cross-doc text collision
    * would make the surviving doc_id depend on micro-batch arrival
    * order (the review caught sf0.1 carrying 8 such collisions) —
    * with unique texts the only dup groups are the planted
    * redeliveries, deterministic at any SF. */
  private val llmStreamFixture = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def llmStreamDocs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.documents(s, dir).select(col("doc_id"),
      concat(col("text"), lit(" d"), col("doc_id")).as("text"),
      timestamp_seconds(lit(1700000000L) + col("doc_id") % 600).as("ts"))
  private def llmStreamIn(s: org.apache.spark.sql.SparkSession, dir: String,
                          redeliverMod: Int): String =
    llmStreamFixture.computeIfAbsent(s"$dir|$redeliverMod", _ => {
      val in = java.nio.file.Files.createTempDirectory("graft-llmstream-in").toString
      val docs = llmStreamDocs(s, dir)
      docs.write.mode("overwrite").parquet(in)
      docs.filter(col("doc_id") % redeliverMod === 0).write.mode("append").parquet(in)
      in
    })

  /** STREAMING curation, oracle-checked end-to-end (round-14 verdict
    * #6 — the streaming operators were batch-≡ pinned in sbt only): a
    * REAL micro-batch pipeline runs inside the query — parquet
    * file-source stream over the double-delivery fixture, the quality
    * gates, watermarked streaming dedup
    * (dropDuplicatesWithinWatermark state), AvailableNow drain into a
    * parquet sink — and the FINAL on-disk state is what the driver
    * hash-compares. The redelivered rows are byte-identical, so the
    * surviving set is deterministic whatever the micro-batch
    * boundaries: exactly the gated corpus, once. A stream that loses
    * dedup state between batches double-emits the redelivery and
    * fails rows_match; one that over-evicts drops gated docs. */
  private def llm98 = Q("llm98_curate_stream",
    (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val in = llmStreamIn(s, dir, redeliverMod = 5)
      val root = java.nio.file.Files.createTempDirectory("graft-llm98-run")
      val out = root.resolve("out").toString
      val ckpt = root.resolve("ckpt").toString
      val stream = s.readStream.schema(llmStreamDocs(s, dir).schema).parquet(in)
      val curated = Curation.curateStream(stream, col("text"),
        Curation.Config(minTokens = 8, maxPunctRatio = 0.3, keepLangs = Set("en")),
        "ts", "2 hours")
      // state fan-out sized to the corpus while the stream runs (the
      // dominant cost is per-partition state commits, not rows);
      // restored after so batch queries keep the session default
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val q = curated.select(col("doc_id"), col("text"),
            col("__content_hash").as("content_hash"))
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      s.read.parquet(out).orderBy(col("doc_id"))
    },
    Some {
      val langs = TextAnalysis.langMarkers
      val scores = langs.map { case (lang, ms) =>
        s"len(list_filter(ltoks, x -> list_contains([${ms.map("'" + _ + "'").mkString(",")}], x))) AS s_$lang"
      }.mkString(",\n            ")
      val chain = langs.zipWithIndex.init.foldRight(s"'${langs.last._1}'") {
        case (((lang, _), i), rest) =>
          val later = langs.drop(i + 1).map { case (l, _) => s"s_$lang >= s_$l" }.mkString(" AND ")
          s"CASE WHEN $later THEN '$lang' ELSE $rest END"
      }
      val allZero = langs.map { case (l, _) => s"s_$l" }.mkString(" + ") + " = 0"
      s"""WITH d0 AS (SELECT doc_id, text || ' d' || doc_id AS text FROM documents),
         |t AS (SELECT doc_id, text,
         |        list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS toks,
         |        list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS ltoks
         |      FROM d0),
         |sc AS (SELECT doc_id, text, toks,
         |            $scores
         |       FROM t)
         |SELECT doc_id, text, ${Portable.duckHash64("text")} AS content_hash
         |FROM sc
         |WHERE len(toks) >= 8
         |  AND CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
         |      / CAST(greatest(length(text), 1) AS DOUBLE) <= 0.3
         |  AND (CASE WHEN $allZero THEN 'unknown' ELSE $chain END) = 'en'
         |ORDER BY doc_id""".stripMargin
    },
    prepare = Some((s, dir) => { llmStreamIn(s, dir, redeliverMod = 5); () }))

  /** HTML main-content extraction (llm/Html.scala) — the jusText/
    * trafilatura stage every web-corpus pipeline starts with. Each
    * document is wrapped in a deterministic page skeleton (nav,
    * related-links block, footer, script/style in the head, the body
    * text entity-ENCODED so decode is exercised for real), then
    * extracted back: script/style blocks dropped, per-line word-count
    * + link-density gate, tags stripped, entities decoded. The whole
    * pipeline is one codegen'd projection — regexp_replace + array
    * higher-order functions, no UDF, no shuffle — and the oracle
    * replays the identical transformation through DuckDB's list
    * comprehension surface. Boilerplate lines (all-anchor nav, the
    * related block at 6 words / 2 links, the 4-word footer) must
    * drop; the prose line survives whenever it has ≥5 words. */
  private def llm99 = Q("llm99_html_extract",
    (s, dir) => {
      import graft.llm.Html
      val page = Tables.documents(s, dir).select(col("doc_id"), concat_ws("\n",
        lit("<html><head><title>Doc</title><script type=\"text/javascript\">var a = 1 < 2 && b > 0;</script><style>.x{color:red}</style></head><body>"),
        lit("<nav><a href=\"/\">Home</a> <a href=\"/docs\">Docs</a> <a href=\"/about\">About</a></nav>"),
        concat(lit("<p>"), Html.encodeEntities(col("text")), lit("</p>")),
        lit("<div class=\"related\"><a href=\"/r1\">Related article one</a> <a href=\"/r2\">Related article two</a></div>"),
        lit("<footer>Copyright &amp; contact: <a href=\"/tos\">terms</a></footer>"),
        lit("</body></html>")).as("html"))
      page.select(col("doc_id"), Html.extract(col("html")).as("e"))
        .select(col("doc_id"),
          col("e.n_lines").as("n_lines"), col("e.n_kept").as("n_kept"),
          length(col("e.extracted")).as("extracted_chars"),
          Portable.hash64(col("e.extracted")).as("content_h"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH h AS (SELECT doc_id, concat_ws(chr(10),
            |    '<html><head><title>Doc</title><script type="text/javascript">var a = 1 < 2 && b > 0;</script><style>.x{color:red}</style></head><body>',
            |    '<nav><a href="/">Home</a> <a href="/docs">Docs</a> <a href="/about">About</a></nav>',
            |    concat('<p>', replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '</p>'),
            |    '<div class="related"><a href="/r1">Related article one</a> <a href="/r2">Related article two</a></div>',
            |    '<footer>Copyright &amp; contact: <a href="/tos">terms</a></footer>',
            |    '</body></html>') AS html FROM documents),
            |s AS (SELECT doc_id, regexp_replace(regexp_replace(html,
            |        '(?s)<script.*?</script>', ' ', 'g'), '(?s)<style.*?</style>', ' ', 'g') AS body FROM h),
            |r0 AS (SELECT doc_id, list_transform(string_split(body, chr(10)), l -> {
            |        'txt': replace(replace(replace(replace(
            |                 trim(regexp_replace(regexp_replace(l, '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')),
            |                 '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&amp;', '&'),
            |        'links': CAST((length(l) - length(replace(l, '<a ', ''))) / 3 AS INT)}) AS recs FROM s),
            |r1 AS (SELECT doc_id, list_transform(recs, r -> {'txt': r.txt, 'links': r.links,
            |        'words': len(list_filter(string_split(r.txt, ' '), w -> len(w) > 0))}) AS recs FROM r0),
            |k AS (SELECT doc_id, recs,
            |        list_filter(recs, r -> r.words >= 5 AND r.links * 3 < r.words) AS kept FROM r1),
            |x AS (SELECT doc_id, recs, kept,
            |        array_to_string(list_transform(kept, r -> r.txt), chr(10)) AS extracted FROM k)
            |SELECT doc_id, CAST(len(recs) AS INT) AS n_lines, CAST(len(kept) AS INT) AS n_kept,
            |       CAST(length(extracted) AS INT) AS extracted_chars,
            |       ${Portable.duckHash64("extracted")} AS content_h
            |FROM x ORDER BY doc_id""".stripMargin))

  /** DPO preference-pair construction: documents bucketed into prompt
    * groups, scored by the shared quality heuristic quantized to an
    * exact int64, then per group chosen = best / rejected = worst with
    * deterministic doc-id tiebreaks, kept only when strictly separated
    * (margin >= 1). ONE hash aggregate — `max(struct(score, -id))` /
    * `min(struct(score, id))` carry the argmax/argmin through map-side
    * combine, so the shuffle is one row per group regardless of group
    * width (the oracle proves the same pairs via two row_number
    * windows). At 100 TB of rated candidates this stays a single
    * exchange on prompt_id. */
  private def llm100 = Q("llm100_dpo_pairs",
    (s, dir) => {
      val scored = Tables.documents(s, dir).select(
        (col("doc_id") % 97).as("prompt_id"), col("doc_id"),
        floor(TextAnalysis.qualityScore(col("text")) * lit(1e9)).cast("long").as("score"))
      scored.groupBy(col("prompt_id"))
        .agg(count(lit(1)).as("n_candidates"),
          max(struct(col("score"), (-col("doc_id")).as("nd"))).as("c"),
          min(struct(col("score"), col("doc_id").as("d"))).as("r"))
        .select(col("prompt_id"), col("n_candidates"),
          (-col("c.nd")).as("chosen_id"), col("c.score").as("chosen_score"),
          col("r.d").as("rejected_id"), col("r.score").as("rejected_score"),
          (col("c.score") - col("r.score")).as("margin"))
        .filter(col("margin") >= 1)
        .orderBy(col("prompt_id"))
    },
    Some("""WITH s AS (SELECT doc_id % 97 AS prompt_id, doc_id,
           |        CAST(floor(((CAST(least(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)), 64) AS DOUBLE) / 64.0)
           |          * (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE)
           |                   / CAST(greatest(length(text), 1) AS DOUBLE))) * 1e9) AS BIGINT) AS score
           |      FROM documents),
           |rk AS (SELECT *,
           |        row_number() OVER (PARTITION BY prompt_id ORDER BY score DESC, doc_id ASC) AS rc,
           |        row_number() OVER (PARTITION BY prompt_id ORDER BY score ASC, doc_id ASC) AS rr,
           |        count(*) OVER (PARTITION BY prompt_id) AS n_candidates
           |       FROM s)
           |SELECT c.prompt_id, c.n_candidates, c.doc_id AS chosen_id, c.score AS chosen_score,
           |       r.doc_id AS rejected_id, r.score AS rejected_score, c.score - r.score AS margin
           |FROM (SELECT * FROM rk WHERE rc = 1) c
           |JOIN (SELECT * FROM rk WHERE rr = 1) r USING (prompt_id)
           |WHERE c.score - r.score >= 1
           |ORDER BY c.prompt_id""".stripMargin))

  /** Training-shard packing: deterministic global shuffle (order by
    * the portable content-free hash of doc_id — reproducible across
    * runs and engines, uncorrelated with ingest order) + token-
    * balanced contiguous shard assignment, shard = exclusive-prefix-
    * tokens DIV target. The running total rides the DISTRIBUTED
    * prefix-sum machinery (PrefixSum.runningTotal: ~1024 hash-range
    * buckets × intra-bucket windows + a broadcast bucket-offset
    * frame) — NOT a single-partition global window, which is the
    * difference between this working at 100 TB and not. Output is the
    * shard manifest: doc count, token mass, covered hash range. */
  private def llm101 = Q("llm101_shard_pack",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("tokens"))
        .withColumn("h", Portable.hash64(col("doc_id")))
      val run = graft.operators.PrefixSum.runningTotal(d, col("h"), col("tokens"),
        bucketWidth = 1L << 50, out = "running")
      // Tie parity with the oracle (round-15 advice): runningTotal's
      // intra-bucket window uses the default RANGE frame (its scaladoc
      // pins this), and DuckDB's `sum() OVER (ORDER BY h)` is also
      // RANGE — so a hash64 tie merges peers IDENTICALLY on both
      // engines and `running - tokens` stays engine-portable. No
      // row-granular divergence exists to tiebreak.
      run.select(expr("(running - tokens) DIV 2048").as("shard"), col("tokens"), col("h"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("shard_tokens"),
          min(col("h")).as("min_h"), max(col("h")).as("max_h"))
        .orderBy(col("shard"))
    },
    Some(s"""WITH d AS (SELECT doc_id,
            |        CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS BIGINT) AS tokens,
            |        ${Portable.duckHash64("doc_id")} AS h
            |      FROM documents),
            |r AS (SELECT *, sum(tokens) OVER (ORDER BY h) AS running FROM d),
            |sh AS (SELECT CAST((running - tokens) // 2048 AS BIGINT) AS shard, tokens, h FROM r)
            |SELECT shard, count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS shard_tokens,
            |       min(h) AS min_h, max(h) AS max_h
            |FROM sh GROUP BY shard ORDER BY shard""".stripMargin))


  /** STREAMING dedup against a static seen-corpus index, oracle-checked
    * end-to-end (the continuous-ingest companion to llm98's curation
    * row): a real micro-batch pipeline runs inside the query — parquet
    * file-source stream over a double-delivery fixture (every 7th doc
    * redelivered byte-identical), StreamingOps.dedupAgainstIndexStream
    * gating each batch against the already-ingested corpus (docs with
    * id < 200) through the bloom-prefilter + anti-join sliver, then
    * watermarked within-stream dedup state, AvailableNow drain to a
    * parquet sink. The FINAL on-disk state the driver compares must be
    * exactly the never-seen documents, once each: an index miss
    * double-admits the seen prefix, lost stream state double-emits the
    * redeliveries. Deterministic because redelivered rows are
    * byte-identical (the dedup key is the content hash, so the
    * survivor's projected columns don't depend on batch order). */
  private def llm102 = Q("llm102_dedup_index_stream",
    (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val in = llmStreamIn(s, dir, redeliverMod = 7)
      val root = java.nio.file.Files.createTempDirectory("graft-llm102-run")
      val out = root.resolve("out").toString
      val ckpt = root.resolve("ckpt").toString
      val stream = s.readStream.schema(llmStreamDocs(s, dir).schema).parquet(in)
      val seen = llmStreamDocs(s, dir).filter(col("doc_id") < 200)
      val fresh = graft.streaming.StreamingOps.dedupAgainstIndexStream(
        stream, col("text"), seen, col("text"), "ts", "2 hours", expectedItems = 1000L)
      // state fan-out sized to the corpus while the stream runs (see llm98)
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val q = fresh.select(col("doc_id"), col("__content_hash").as("content_hash"))
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      s.read.parquet(out).orderBy(col("doc_id"))
    },
    Some(s"""WITH d0 AS (SELECT doc_id, text || ' d' || doc_id AS text FROM documents),
            |seen AS (SELECT DISTINCT ${Portable.duckHash64("text")} AS h
            |             FROM d0 WHERE doc_id < 200),
            |str AS (SELECT doc_id, text FROM d0
            |        UNION ALL SELECT doc_id, text FROM d0 WHERE doc_id % 7 = 0),
            |hh AS (SELECT DISTINCT doc_id, ${Portable.duckHash64("text")} AS content_hash FROM str)
            |SELECT doc_id, content_hash FROM hh
            |WHERE content_hash NOT IN (SELECT h FROM seen)
            |ORDER BY doc_id""".stripMargin),
    prepare = Some((s, dir) => { llmStreamIn(s, dir, redeliverMod = 7); () }))

  /** Robots-rules URL filtering (Urls.robotsDecision) — the crawl
    * admission stage: every URL is judged against its site's rule list
    * under RFC 9309 semantics (LONGEST matching prefix wins, Allow
    * beats Disallow on equal length, no match = allowed). The per-site
    * rule lists are tiny, so they broadcast-join onto the corpus and
    * the decision is a codegen'd fold over the rules array — ZERO
    * shuffle of the URL corpus. The fixture plants the interesting
    * geometry: a site-wide Disallow /a on every third site, an Allow
    * /a/b2 that re-admits a subtree under it, a global Disallow
    * /a/b4, and /deep suffixes that must inherit their parent rule.
    * The oracle decides through an INDEPENDENT formulation (rules
    * join + longest-match row_number), so a fold bug can't replicate
    * itself. */
  private def llm103 = Q("llm103_robots_filter",
    (s, dir) => {
      import graft.llm.Urls
      val urls = Tables.documents(s, dir).select(
        col("doc_id"),
        concat(lit("site"), expr("(doc_id DIV 3) % 7")).as("site"),
        concat(lit("/a/b"), expr("doc_id % 5"),
          when(expr("doc_id % 11") === 0, "/deep").otherwise("")).as("path"))
      val sites = (0 until 7).map(i => s"site$i")
      val ruleRows = sites.flatMap { st =>
        val base = Seq((st, "/a/b2", true), (st, "/a/b4", false), (st, "/private", false))
        if (st.stripPrefix("site").toInt % 3 == 0) base :+ ((st, "/a", false)) else base
      }
      import s.implicits._
      val rules = ruleRows.toDF("site", "prefix", "allow")
        .groupBy(col("site"))
        .agg(collect_list(struct(col("prefix"), col("allow"))).as("rules"))
      urls.join(broadcast(rules), Seq("site"), "left")
        .select(col("doc_id"), col("site"), col("path"),
          Urls.robotsDecision(col("path"), col("rules")).as("d"))
        .select(col("doc_id"), col("site"), col("path"),
          col("d.allowed").as("allowed"), col("d.match_len").as("match_len"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH urls AS (SELECT doc_id,
           |        'site' || ((doc_id // 3) % 7) AS site,
           |        '/a/b' || (doc_id % 5) ||
           |          CASE WHEN doc_id % 11 = 0 THEN '/deep' ELSE '' END AS path
           |      FROM documents),
           |sites AS (SELECT unnest([0, 1, 2, 3, 4, 5, 6]) AS s),
           |rules AS (
           |  SELECT 'site' || s AS site, '/a/b2' AS prefix, true AS allow FROM sites
           |  UNION ALL SELECT 'site' || s, '/a/b4', false FROM sites
           |  UNION ALL SELECT 'site' || s, '/private', false FROM sites
           |  UNION ALL SELECT 'site' || s, '/a', false FROM sites WHERE s % 3 = 0),
           |m AS (SELECT u.doc_id, r.allow, len(r.prefix) AS plen,
           |        row_number() OVER (PARTITION BY u.doc_id
           |                           ORDER BY len(r.prefix) DESC, r.allow DESC) AS rn
           |      FROM urls u JOIN rules r
           |        ON r.site = u.site AND starts_with(u.path, r.prefix)),
           |best AS (SELECT doc_id, allow, plen FROM m WHERE rn = 1)
           |SELECT u.doc_id, u.site, u.path,
           |       coalesce(b.allow, true) AS allowed,
           |       CAST(coalesce(b.plen, -1) AS INT) AS match_len
           |FROM urls u LEFT JOIN best b USING (doc_id)
           |ORDER BY u.doc_id""".stripMargin))

  private val llm104Slot = new TrackerSlot

  /** CCNet-style perplexity buckets: each source's documents are
    * ranked by corpus-typicality (the integer-exact mean smoothed
    * bigram probability, LanguageModel.bigramScoreQ — higher = more
    * typical, CCNet's lower-perplexity end) and split into
    * head/middle/tail TERTILES — the partition CCNet keeps head+middle
    * of and drops or down-weights tail of. The per-source ranking
    * rides the DISTRIBUTED exact-rank scan (Sketches.groupRanks), so a
    * source larger than a partition never sorts in one task; tertile
    * thresholds are integer arithmetic (rank·3 vs n), so bucket
    * boundaries are engine-identical. Output is the per-(source,
    * bucket) report: volume and the score range each bucket spans. */
  private def llm104 = Q("llm104_ccnet_buckets",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val tracker = llm104Slot.fresh()
      val scored = LanguageModel.bigramScoreQ(docs, col("doc_id"), col("text"))
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
      val ranked = graft.llm.Sketches.groupRanks(scored, col("source"),
        -col("score_q"), col("doc_id"), tracker = Some(tracker))
      val totals = ranked.groupBy(col("g")).agg(count(lit(1)).as("n"))
      ranked.join(broadcast(totals), "g")
        .select(col("g").as("source"), (-col("v")).as("score_q"),
          when(col("rank") * 3 <= col("n"), "head")
            .when(col("rank") * 3 <= col("n") * 2, "middle")
            .otherwise("tail").as("bucket"))
        .groupBy(col("source"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("score_q")).as("min_q"), max(col("score_q")).as("max_q"))
        .orderBy(col("source"), col("bucket"))
    },
    Some("""WITH t AS (SELECT doc_id,
           |              list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
           |            FROM documents),
           |bi AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
           |              unnest(toks[2:len(toks)]) AS w2 FROM t),
           |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
           |c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
           |v AS (SELECT count(DISTINCT tok) AS v
           |      FROM (SELECT unnest(toks) AS tok FROM t)),
           |q AS (SELECT bi.doc_id,
           |        CAST(floor((CAST(c12.c12 + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE)) * 1e9) AS BIGINT) AS q
           |      FROM bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
           |sc AS (SELECT doc_id, CAST(sum(q) // count(*) AS BIGINT) AS score_q
           |       FROM q GROUP BY doc_id),
           |r AS (SELECT d.source AS source, sc.score_q,
           |        row_number() OVER (PARTITION BY d.source
           |                           ORDER BY -sc.score_q ASC, sc.doc_id ASC) AS rank,
           |        count(*) OVER (PARTITION BY d.source) AS n
           |      FROM sc JOIN documents d USING (doc_id))
           |SELECT source,
           |       CASE WHEN rank * 3 <= n THEN 'head'
           |            WHEN rank * 3 <= n * 2 THEN 'middle'
           |            ELSE 'tail' END AS bucket,
           |       count(*) AS n_docs, min(score_q) AS min_q, max(score_q) AS max_q
           |FROM r GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin),
    cleanup = Some(_ => llm104Slot.drain()))

  private val llm105Slot = new TrackerSlot

  /** NEAR-DUP-AWARE train/eval split — the leakage class llm78's
    * domain-keyed split can't see: two near-duplicate documents on
    * DIFFERENT domains still leak eval content into training if the
    * split keys on docs (or domains). Split on the near-dup CLUSTER
    * instead: llm17's MinHash/LSH components become the split unit
    * (singletons key on their own id), so a whole duplicate family
    * lands on one side by construction. Both leak audits are computed
    * FROM DATA, not asserted: the cluster-keyed split must show ZERO
    * candidate pairs straddling the boundary, while the naive
    * doc-keyed split over the same corpus shows the non-zero leak
    * count that motivates the operator. Costs over the llm17 pipeline:
    * one broadcast-scale join of the tiny pair list against the split
    * assignment — corpus text never moves. */
  private def llm105 = Q("llm105_neardup_safe_split",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val corpus = d.unionByName(
        d.select((col("doc_id") + 100000L).as("doc_id"),
                 concat(col("text"), lit(" qx")).as("text")))
      val sigs = Dedup.minhashSignatureText(corpus, col("doc_id"), col("text"), n = 9, k = 12)
      val tracker = llm105Slot.fresh()
      // pairs feed three consumers (clustering + both leak audits):
      // materialize the tiny 8-byte pair list once or each consumer
      // re-runs the whole signature pipeline (measured 6.6 → ~3 s)
      val pairs = tracker.track(graft.operators.Materialize.eager(
        Dedup.candidatePairs(Dedup.lshBuckets(sigs, k = 12, rowsPerBand = 4))))
      val clusters = Dedup.connectedComponents(pairs, tracker = Some(tracker))
      // round-21 (guide §8): units feeds THREE consumers (the safe
      // split, the naive split, and both leak audits' assignment
      // joins) — materialize the 16-byte (doc_id, unit) proxy once
      // instead of re-scanning the corpus and re-joining clusters per
      // consumer.
      val units = tracker.track(graft.operators.Materialize.eager(
        corpus.select(col("doc_id"))
          .join(clusters, Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("unit"))))
      val safe = graft.llm.Sampling.hashSplit(units, col("unit"),
        Seq("train" -> 0.8, "eval" -> 0.2), salt = "ndsplit")
      val naive = graft.llm.Sampling.hashSplit(units.select(col("doc_id")), col("doc_id"),
        Seq("train" -> 0.8, "eval" -> 0.2), salt = "ndsplit")
      def leaks(assign: org.apache.spark.sql.DataFrame, out: String) = pairs
        .join(assign.select(col("doc_id").as("id_a"), col("split").as("__sa")), "id_a")
        .join(assign.select(col("doc_id").as("id_b"), col("split").as("__sb")), "id_b")
        .agg(sum(when(col("__sa") =!= col("__sb"), 1L).otherwise(0L)).as(out))
      safe.groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), countDistinct(col("unit")).as("n_units"))
        .crossJoin(broadcast(leaks(safe, "leaked_pairs_clustered")))
        .crossJoin(broadcast(leaks(naive, "leaked_pairs_naive")))
        .orderBy(col("split"))
    },
    Some {
      val uSafe = graft.llm.Sampling.duckUnitInterval("unit", "ndsplit")
      val uNaive = graft.llm.Sampling.duckUnitInterval("doc_id", "ndsplit")
      s"""WITH RECURSIVE $duckMinhashPairCtes,
         |verts AS (SELECT id_a AS v FROM pairs UNION SELECT id_b FROM pairs),
         |edges AS (SELECT id_a AS ea, id_b AS eb FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(v, r) AS (
         |  SELECT v, v FROM verts
         |  UNION
         |  SELECT e.eb, reach.r FROM edges e JOIN reach ON reach.v = e.ea),
         |clus AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
         |units AS (SELECT c.doc_id, coalesce(cl.cluster_id, c.doc_id) AS unit
         |          FROM corpus c LEFT JOIN clus cl USING (doc_id)),
         |sp AS (SELECT doc_id, unit,
         |         CASE WHEN $uSafe < 0.8 THEN 'train' ELSE 'eval' END AS split
         |       FROM units),
         |spn AS (SELECT doc_id,
         |          CASE WHEN $uNaive < 0.8 THEN 'train' ELSE 'eval' END AS split
         |        FROM units),
         |lc AS (SELECT CAST(sum(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END) AS BIGINT)
         |         AS leaked_pairs_clustered
         |       FROM pairs p JOIN sp a ON a.doc_id = p.id_a JOIN sp b ON b.doc_id = p.id_b),
         |ln AS (SELECT CAST(sum(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END) AS BIGINT)
         |         AS leaked_pairs_naive
         |       FROM pairs p JOIN spn a ON a.doc_id = p.id_a JOIN spn b ON b.doc_id = p.id_b)
         |SELECT split, count(*) AS n_docs, CAST(count(DISTINCT unit) AS BIGINT) AS n_units,
         |       leaked_pairs_clustered, leaked_pairs_naive
         |FROM sp CROSS JOIN lc CROSS JOIN ln
         |GROUP BY split, leaked_pairs_clustered, leaked_pairs_naive
         |ORDER BY split""".stripMargin
    },
    cleanup = Some(_ => llm105Slot.drain()))

  /** N-gram novelty DECAY for crawl re-visit scheduling: llm84
    * measures how novel each source is overall; a crawler needs the
    * TREND — how fast the novel-content rate falls across successive
    * visits, because that slope (not the level) decides when to come
    * back. Visits are the deterministic epochs doc_id % 5; per
    * (source, visit) the novelty rate is the fraction of the visit's
    * distinct shingles first seen AT that visit (visit 0 is
    * definitionally all-new, so the decay is fitted over the
    * REVISITS 1..4). decay = novelty(last)/novelty(first-revisit)
    * computed as ONE division of exact-count products (doubles hold
    * these counts exactly, no libm pow — both engines land on the
    * identical bits), and the schedule output is integer-exact:
    * revisit_days = ceil(7 / novelty_last) capped at 365 for a
    * fully-stale source.
    *
    * 100 TB shape: one shingle-hash explode (the 8-byte `shh` hashes
    * shuffle, never shingle strings), two hash aggregates at
    * (source, shingle) and (source, visit) grain, then a 5-row-per-
    * source struct-min/max rollup — linear in corpus bytes, no joins
    * wider than sources × visits. */
  private def llm106 = Q("llm106_novelty_decay",
    (s, dir) => {
      import graft.functions.MinhashSigs
      val d = Tables.documents(s, dir)
      val sh = d.where(col("text").isNotNull)
        .select(col("source"), (col("doc_id") % 5).cast("int").as("visit"),
          explode(MinhashSigs(col("text"), 9, 1, withSet = true)
            .getField("shh")).as("h"))
        .distinct()
      val totals = sh.groupBy(col("source"), col("visit"))
        .agg(count(lit(1)).as("n_shingles"))
      val news = sh.groupBy(col("source"), col("h"))
        .agg(min(col("visit")).as("visit"))
        .groupBy(col("source"), col("visit")).agg(count(lit(1)).as("n_new"))
      val pv = totals.join(news, Seq("source", "visit"), "left")
        .select(col("source"), col("visit"), col("n_shingles"),
          coalesce(col("n_new"), lit(0L)).as("n_new"))
        .filter(col("visit") >= 1) // decay is a property of the revisits
      pv.groupBy(col("source")).agg(
          min(struct(col("visit"), col("n_shingles"), col("n_new"))).as("f"),
          max(struct(col("visit"), col("n_shingles"), col("n_new"))).as("l"))
        .select(col("source"),
          col("f.n_shingles").as("n_sh_first"), col("f.n_new").as("n_new_first"),
          col("l.n_shingles").as("n_sh_last"), col("l.n_new").as("n_new_last"),
          when(col("f.n_new") === 0, lit(0.0)).otherwise(
            col("l.n_new").cast("double") * col("f.n_shingles").cast("double") /
              (col("l.n_shingles").cast("double") * col("f.n_new").cast("double")))
            .as("decay"),
          // the 365 cap applies to EVERY branch (review finding: a
          // nearly-stale source ceil'd to ~191 years, not just n_new=0)
          when(col("l.n_new") === 0, lit(365L)).otherwise(
            least(lit(365L), ceil(lit(7) * col("l.n_shingles").cast("double") /
              col("l.n_new").cast("double")).cast("long"))).as("revisit_days"))
        .orderBy(col("source"))
    },
    Some("""WITH sh AS (SELECT DISTINCT source, doc_id % 5 AS visit, substr(text, i, 9) AS shingle
           |       FROM (SELECT source, doc_id, text,
           |               unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i
           |             FROM documents)),
           |tot AS (SELECT source, visit, count(*) AS n_shingles FROM sh GROUP BY 1, 2),
           |fv AS (SELECT source, shingle, min(visit) AS visit FROM sh GROUP BY 1, 2),
           |nn AS (SELECT source, visit, count(*) AS n_new FROM fv GROUP BY 1, 2),
           |pv AS (SELECT t.source, t.visit, t.n_shingles,
           |         CAST(coalesce(nn.n_new, 0) AS BIGINT) AS n_new
           |       FROM tot t LEFT JOIN nn USING (source, visit) WHERE t.visit >= 1),
           |fl AS (SELECT source, min(visit) AS v0, max(visit) AS v1 FROM pv GROUP BY 1)
           |SELECT fl.source,
           |  a.n_shingles AS n_sh_first, a.n_new AS n_new_first,
           |  b.n_shingles AS n_sh_last, b.n_new AS n_new_last,
           |  CASE WHEN a.n_new = 0 THEN 0.0
           |       ELSE CAST(b.n_new AS DOUBLE) * CAST(a.n_shingles AS DOUBLE)
           |            / (CAST(b.n_shingles AS DOUBLE) * CAST(a.n_new AS DOUBLE)) END AS decay,
           |  CAST(CASE WHEN b.n_new = 0 THEN 365
           |       ELSE least(365, ceil(7 * CAST(b.n_shingles AS DOUBLE) / CAST(b.n_new AS DOUBLE))) END
           |    AS BIGINT) AS revisit_days
           |FROM fl
           |JOIN pv a ON a.source = fl.source AND a.visit = fl.v0
           |JOIN pv b ON b.source = fl.source AND b.visit = fl.v1
           |ORDER BY fl.source""".stripMargin))

  /** Per-source embedding DRIFT against a frozen reference snapshot:
    * llm80's dimStats says what the corpus-wide embedding
    * distribution looks like; a production pipeline needs the
    * per-source DELTA between the current crawl and the snapshot the
    * retrieval index / quantizer was trained on — the signal that a
    * source's content (or the upstream embedding model) moved and
    * the IVF cells / PQ codebooks no longer fit. Reference = the
    * vec_id % 3 == 0 snapshot, current = the rest; per (source, dim)
    * the mean is an exact q6-integer sum ÷ count, the per-dim drift
    * quantizes |Δmean| to integer micro-units BEFORE the per-source
    * sum (exact longs, shuffle-order independent), and the top
    * drifted dim rides ONE max(struct) aggregate (llm100
    * discipline), never a window.
    *
    * 100 TB shape: vectors die in the posexplode map stage — only
    * (source, dim) partial aggregates shuffle (sources × 64 rows),
    * the ref/cur join is sources × dims, and the rollup is one hash
    * aggregate. Kilobytes of shuffle at any corpus size. */
  private def llm107 = Q("llm107_embedding_drift",
    (s, dir) => {
      val src = Tables.documents(s, dir).select(col("doc_id").as("vec_id"), col("source"))
      val e = Tables.embeddings(s, dir).join(src, "vec_id")
      def stats(side: org.apache.spark.sql.DataFrame) = side
        .select(col("source"), posexplode(col("embedding")).as(Seq("p", "x")))
        .select(col("source"), (col("p") + 1).cast("long").as("dim"),
          floor(col("x").cast("double") * lit(1e6)).cast("long").as("xq"))
        .groupBy(col("source"), col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("xq")).as("sq"))
      val ref = stats(e.filter(col("vec_id") % 3 === 0))
        .select(col("source"), col("dim"), col("n").as("n_r"), col("sq").as("sq_r"))
      val cur = stats(e.filter(col("vec_id") % 3 =!= 0))
        .select(col("source"), col("dim"), col("n").as("n_c"), col("sq").as("sq_c"))
      val per = ref.join(cur, Seq("source", "dim"))
        .select(col("source"), col("dim"),
          floor(abs(col("sq_c").cast("double") / col("n_c")
            - col("sq_r").cast("double") / col("n_r"))).cast("long").as("drift_q6"))
      per.groupBy(col("source"))
        .agg(sum(col("drift_q6")).as("l1_drift_q6"),
          max(struct(col("drift_q6").as("d"), (-col("dim")).as("nd"))).as("m"))
        .select(col("source"), col("l1_drift_q6"),
          (-col("m.nd")).as("top_dim"), col("m.d").as("top_drift_q6"))
        .orderBy(col("source"))
    },
    Some("""WITH j AS (SELECT e.vec_id, d.source, e.embedding
           |           FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
           |x AS (SELECT source, vec_id, CAST(i AS BIGINT) AS dim,
           |        CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT) AS xq
           |      FROM j CROSS JOIN generate_series(1, 64) AS g(i)),
           |r AS (SELECT source, dim, count(*) AS n_r, CAST(sum(xq) AS BIGINT) AS sq_r
           |      FROM x WHERE vec_id % 3 = 0 GROUP BY 1, 2),
           |c AS (SELECT source, dim, count(*) AS n_c, CAST(sum(xq) AS BIGINT) AS sq_c
           |      FROM x WHERE vec_id % 3 <> 0 GROUP BY 1, 2),
           |p AS (SELECT source, dim,
           |        CAST(floor(abs(CAST(sq_c AS DOUBLE) / n_c - CAST(sq_r AS DOUBLE) / n_r))
           |          AS BIGINT) AS drift_q6
           |      FROM r JOIN c USING (source, dim)),
           |sel AS (SELECT source, dim, drift_q6,
           |          row_number() OVER (PARTITION BY source
           |                             ORDER BY drift_q6 DESC, dim ASC) AS rn
           |        FROM p)
           |SELECT p.source, CAST(sum(p.drift_q6) AS BIGINT) AS l1_drift_q6,
           |       min(sel.dim) AS top_dim, min(sel.drift_q6) AS top_drift_q6
           |FROM p JOIN sel ON sel.source = p.source AND sel.rn = 1
           |GROUP BY p.source
           |ORDER BY p.source""".stripMargin))

  private val llm108Slot = new TrackerSlot

  /** Influence-style duplicate-cluster DOWN-weighting — the
    * composition of llm85 (1/cluster-size soft dedup) and llm104
    * (per-source quality tertiles): training-mix practice keeps
    * near-duplicate families at constant total influence AND scales
    * that influence by the document's quality bucket, so a
    * fifty-times-crawled tail-quality boilerplate family contributes
    * 4/(10·50) per copy while a unique head-quality doc keeps
    * weight 1. weight = mult(bucket) / (10 · csize) with mult ∈
    * {10, 7, 4} — one division of exact integers, engine-portable.
    * Duplicated corpus ids (+100000, the llm17/85 construction)
    * inherit the base doc's bucket through the % 100000 mapping.
    *
    * 100 TB shape: the cluster side reuses the banded-LSH pair list
    * (8-byte ids, never n²) + one superstep fixpoint; the quality
    * side reuses the distributed exact-rank scan; the final join is
    * corpus-grain on an integer key with a group-count-sized bucket
    * frame — no new all-pairs path, no window over the corpus. */
  private def llm108 = Q("llm108_influence_weights",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"), col("source"))
      val corpus = d.select(col("doc_id"), col("text")).unionByName(
        d.select((col("doc_id") + 100000L).as("doc_id"),
                 concat(col("text"), lit(" qx")).as("text")))
      val tracker = llm108Slot.fresh()
      val sigs = Dedup.minhashSignatureText(corpus, col("doc_id"), col("text"), n = 9, k = 12)
      val pairs = Dedup.candidatePairs(Dedup.lshBuckets(sigs, k = 12, rowsPerBand = 4))
      val clusters = Dedup.connectedComponents(pairs, tracker = Some(tracker))
      val sizes = clusters.groupBy(col("cluster_id")).agg(count(lit(1)).as("csize"))
      val csized = corpus.select(col("doc_id"))
        .join(clusters.join(sizes, "cluster_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("csize"), lit(1L)).as("csize"))
      val scored = LanguageModel.bigramScoreQ(d, col("doc_id"), col("text"))
        .join(d.select(col("doc_id"), col("source")), "doc_id")
      val ranked = graft.llm.Sketches.groupRanks(scored, col("source"),
        -col("score_q"), col("doc_id"), tracker = Some(tracker))
      val totals = ranked.groupBy(col("g")).agg(count(lit(1)).as("n"))
      val buckets = ranked.join(broadcast(totals), "g")
        .select(col("id").as("base_id"),
          when(col("rank") * 3 <= col("n"), "head")
            .when(col("rank") * 3 <= col("n") * 2, "middle")
            .otherwise("tail").as("bucket"))
      val mult = when(col("bucket") === "head", 10L)
        .when(col("bucket") === "middle", 7L).otherwise(4L)
      csized.join(buckets, csized("doc_id") % 100000L === buckets("base_id"))
        .select(col("doc_id"), col("csize"), col("bucket"),
          (mult.cast("double") / (lit(10.0) * col("csize").cast("double"))).as("weight"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE $duckMinhashPairCtes,
            |verts AS (SELECT id_a AS v FROM pairs UNION SELECT id_b FROM pairs),
            |edges AS (SELECT id_a AS ea, id_b AS eb FROM pairs
            |          UNION SELECT id_b, id_a FROM pairs),
            |reach(v, r) AS (
            |  SELECT v, v FROM verts
            |  UNION
            |  SELECT e.eb, reach.r FROM edges e JOIN reach ON reach.v = e.ea),
            |comp AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
            |sz AS (SELECT cluster_id, count(*) AS csize FROM comp GROUP BY 1),
            |cw AS (SELECT c.doc_id, CAST(coalesce(sz.csize, 1) AS BIGINT) AS csize
            |       FROM corpus c
            |       LEFT JOIN comp ON comp.doc_id = c.doc_id
            |       LEFT JOIN sz ON sz.cluster_id = comp.cluster_id),
            |t AS (SELECT doc_id,
            |        list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS toks
            |      FROM documents),
            |bi AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
            |              unnest(toks[2:len(toks)]) AS w2 FROM t),
            |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
            |c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
            |vv AS (SELECT count(DISTINCT tok) AS v
            |       FROM (SELECT unnest(toks) AS tok FROM t)),
            |q AS (SELECT bi.doc_id,
            |        CAST(floor((CAST(c12.c12 + 1 AS DOUBLE) / CAST(c1.c1 + vv.v AS DOUBLE)) * 1e9) AS BIGINT) AS q
            |      FROM bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vv),
            |sc AS (SELECT doc_id, CAST(sum(q) // count(*) AS BIGINT) AS score_q
            |       FROM q GROUP BY doc_id),
            |r AS (SELECT d.doc_id AS base_id,
            |        row_number() OVER (PARTITION BY d.source
            |                           ORDER BY -sc.score_q ASC, sc.doc_id ASC) AS rank,
            |        count(*) OVER (PARTITION BY d.source) AS n
            |      FROM sc JOIN documents d USING (doc_id)),
            |bk2 AS (SELECT base_id,
            |          CASE WHEN rank * 3 <= n THEN 'head'
            |               WHEN rank * 3 <= n * 2 THEN 'middle'
            |               ELSE 'tail' END AS bucket
            |        FROM r)
            |SELECT cw.doc_id, cw.csize, bk2.bucket,
            |       CAST(CASE bk2.bucket WHEN 'head' THEN 10 WHEN 'middle' THEN 7 ELSE 4 END
            |         AS DOUBLE) / (10.0 * CAST(cw.csize AS DOUBLE)) AS weight
            |FROM cw JOIN bk2 ON cw.doc_id % 100000 = bk2.base_id
            |ORDER BY cw.doc_id""".stripMargin),
    cleanup = Some(_ => llm108Slot.drain()))

  /** Code-vs-prose detection — the training-mix router that decides
    * whether a document feeds the code or the text data budget.
    * Three engine-portable signals over one pass: symbol-token ratio
    * (tokens containing code punctuation, via a HOF filter — the
    * same character class compiles identically in Java regex and
    * RE2), keyword-token hits (a broadcast IN-list of language
    * keywords, token-exact so no word-boundary regex divergence),
    * and indented-line ratio. The rubric is INTEGER arithmetic
    * (per-mille ratios via truncating DIV) so the code/mixed/prose
    * label is bit-portable. Docs with doc_id % 5 == 0 get a
    * deterministic code-block prefix planted so both labels (and the
    * boundary) are actually exercised at any SF.
    *
    * 100 TB shape: ONE codegen'd projection — split, two lambda
    * filters, a line split — and no shuffle until the verify
    * ORDER BY; the mix router runs at scan speed. */
  private def llm109 = Q("llm109_code_detect",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      // planted fixtures cover the whole label space at any SF: %5==0
      // gets a real code block (→ code), %5==1 a single inline
      // statement (→ mixed on typical doc lengths; a short doc may
      // legitimately cross into code — the oracle replays the same
      // arithmetic either way), the rest stay prose
      val fixed = d.withColumn("t",
        when(col("doc_id") % 5 === 0,
          concat(lit("def f(x):\n    y = (x + 1);\n    return {y};\n"), col("text")))
          .when(col("doc_id") % 5 === 1,
            concat(lit("if (x) { return y; }\n"), col("text")))
          .otherwise(col("text")))
      val kwArr = "array('def','class','import','return','if','else'," +
        "'for','while','function','var','const','public','void','int')"
      // one materialized tokenization feeds every token signal (the
      // llm113 discipline — no reliance on CSE to avoid re-splitting)
      val out = fixed
        .withColumn("toks", expr("filter(split(t, '\\\\s+'), x -> length(x) > 0)"))
        .withColumn("n_toks", greatest(size(col("toks")), lit(1)).cast("long"))
        .withColumn("sym_toks",
          size(expr("filter(toks, x -> x rlike '[=;{}()\\\\[\\\\]<>]')")).cast("long"))
        .withColumn("kw_toks",
          size(expr(s"filter(toks, x -> array_contains($kwArr, x))")).cast("long"))
        .withColumn("n_lines",
          greatest(size(expr("split(t, '\\n')")), lit(1)).cast("long"))
        .withColumn("indent_lines",
          size(expr("filter(split(t, '\\n'), x -> x rlike '^(  |\\t)')")).cast("long"))
        .withColumn("score_pm",
          expr("(1000 * sym_toks) DIV n_toks + (3000 * kw_toks) DIV n_toks + " +
            "(2000 * indent_lines) DIV n_lines"))
        .withColumn("label",
          when(col("score_pm") >= 400, "code")
            .when(col("score_pm") >= 120, "mixed").otherwise("prose"))
      out.select(col("doc_id"), col("n_toks"), col("sym_toks"), col("kw_toks"),
          col("indent_lines"), col("score_pm"), col("label"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH f AS (SELECT doc_id,
           |    CASE WHEN doc_id % 5 = 0
           |      THEN 'def f(x):' || chr(10) || '    y = (x + 1);' || chr(10)
           |           || '    return {y};' || chr(10) || text
           |      WHEN doc_id % 5 = 1
           |      THEN 'if (x) { return y; }' || chr(10) || text
           |      ELSE text END AS t
           |  FROM documents),
           |tk AS (SELECT doc_id, t,
           |    list_filter(string_split_regex(t, '\s+'), x -> len(x) > 0) AS toks,
           |    string_split(t, chr(10)) AS lines
           |  FROM f),
           |m AS (SELECT doc_id,
           |    greatest(len(toks), 1) AS n_toks,
           |    len(list_filter(toks, x -> regexp_matches(x, '[=;{}()\[\]<>]'))) AS sym_toks,
           |    len(list_filter(toks, x -> x IN ('def','class','import','return','if','else',
           |      'for','while','function','var','const','public','void','int'))) AS kw_toks,
           |    greatest(len(lines), 1) AS n_lines,
           |    len(list_filter(lines, x -> regexp_matches(x, '^(  |\t)'))) AS indent_lines
           |  FROM tk),
           |sc AS (SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
           |    CAST(sym_toks AS BIGINT) AS sym_toks, CAST(kw_toks AS BIGINT) AS kw_toks,
           |    CAST(indent_lines AS BIGINT) AS indent_lines,
           |    CAST((1000 * sym_toks) // n_toks + (3000 * kw_toks) // n_toks
           |       + (2000 * indent_lines) // n_lines AS BIGINT) AS score_pm
           |  FROM m)
           |SELECT doc_id, n_toks, sym_toks, kw_toks, indent_lines, score_pm,
           |       CASE WHEN score_pm >= 400 THEN 'code'
           |            WHEN score_pm >= 120 THEN 'mixed' ELSE 'prose' END AS label
           |FROM sc ORDER BY doc_id""".stripMargin))

  /** Canonical-URL content-consistency audit — the crawl-health
    * operator llm75's canonicalization enables: group fetches by
    * CANONICAL url and compare their content hashes. Same canonical
    * url + one distinct hash = stable duplicates (crawl waste, safe
    * to dedup hard); several hashes = a CHURNING url (rotating
    * boilerplate / soft-404 — the revisit scheduler should distrust
    * it); one fetch = unique. Fetch variants reuse the llm75 messy-url
    * construction; variants 0 and 1 deterministically carry the base
    * doc's content (stable pair) while variant 2 carries its own
    * (the churn row), so all three verdicts appear at any SF.
    *
    * 100 TB shape: content collapses to an 8-byte hash in the map
    * stage; the audit is ONE hash aggregate at canonical-url grain
    * (distinct hashes via a tiny two-level aggregate) — url strings
    * shuffle once, text never does. */
  private def llm110 = Q("llm110_url_content_audit",
    (s, dir) => {
      import graft.llm.Urls
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val base = expr("doc_id DIV 3")
      val variant = expr("doc_id % 3")
      val site = concat(lit("site"), base % 7)
      val tld = when(base % 4 === 0, ".com").when(base % 4 === 1, ".co.uk")
        .when(base % 4 === 2, ".org").otherwise(".io")
      val path = concat(lit("/a/b"), base % 5)
      val qv = base % 3
      val messy = when(variant === 0,
          concat(lit("HTTPS://WWW."), upper(site), tld, lit(":443"), path,
                 lit("/?utm_source=x&b="), qv, lit("&a=1#frag")))
        .when(variant === 1,
          concat(lit("https://"), site, tld, path, lit("?a=1&b="), qv))
        .otherwise(
          concat(lit("https://"), site, upper(tld),
                 regexp_replace(path, "/", "//"), lit("/?b="), qv,
                 lit("&utm_campaign=y&a=1"),
                 // base%5==4 groups: the third fetch lands on its OWN
                 // canonical url (extra real param) → a single-fetch
                 // 'unique' row, and its group audits on two fetches
                 when(base % 5 === 4, lit("&c=1")).otherwise(lit(""))))
      // variants 0/1 fetch the BASE doc's bytes; variant 2 fetches the
      // base bytes when base%3==0 (→ stable-dup groups) and its own
      // bytes otherwise (→ churning groups)
      val contentOwner = d.select(col("doc_id").as("base"),
        Portable.hash64(col("text")).as("base_h"))
      val fetches = d.select(col("doc_id"), Urls.canonicalUrl(messy).as("curl"),
          Portable.hash64(col("text")).as("own_h"),
          expr("doc_id DIV 3").as("base"), variant.as("v"))
        .join(contentOwner, Seq("base"), "left")
        .select(col("curl"),
          when((col("v") < 2 || col("base") % 3 === 0) && col("base_h").isNotNull,
            col("base_h")).otherwise(col("own_h")).as("content_h"))
      val perHash = fetches.groupBy(col("curl"), col("content_h"))
        .agg(count(lit(1)).as("n"))
      perHash.groupBy(col("curl"))
        .agg(sum(col("n")).as("n_fetches"),
          count(lit(1)).as("n_distinct_content"))
        .select(col("curl"), col("n_fetches"), col("n_distinct_content"),
          when(col("n_fetches") === 1, "unique")
            .when(col("n_distinct_content") === 1, "stable-dup")
            .otherwise("churning").as("status"))
        .orderBy(col("curl"))
    },
    Some {
      val h = Portable.duckHash64("text")
      s"""WITH d AS (SELECT doc_id, text, doc_id // 3 AS base, doc_id % 3 AS v
         |           FROM documents),
         |u AS (SELECT doc_id, base, v,
         |        'https://site' || (base % 7)
         |          || CASE base % 4 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk'
         |                           WHEN 2 THEN '.org' ELSE '.io' END
         |          || '/a/b' || (base % 5)
         |          || '?a=1&b=' || (base % 3)
         |          || CASE WHEN v = 2 AND base % 5 = 4 THEN '&c=1' ELSE '' END AS curl
         |      FROM d),
         |own AS (SELECT doc_id, $h AS own_h FROM documents),
         |baseh AS (SELECT doc_id AS bid, $h AS base_h FROM documents),
         |f AS (SELECT u.curl,
         |        CASE WHEN (u.v < 2 OR u.base % 3 = 0) AND b.base_h IS NOT NULL
         |             THEN b.base_h ELSE o.own_h END AS content_h
         |      FROM u JOIN own o ON o.doc_id = u.doc_id
         |      LEFT JOIN baseh b ON b.bid = u.base),
         |ph AS (SELECT curl, content_h, count(*) AS n FROM f GROUP BY 1, 2)
         |SELECT curl, CAST(sum(n) AS BIGINT) AS n_fetches,
         |       count(*) AS n_distinct_content,
         |       CASE WHEN sum(n) = 1 THEN 'unique'
         |            WHEN count(*) = 1 THEN 'stable-dup'
         |            ELSE 'churning' END AS status
         |FROM ph GROUP BY curl ORDER BY curl""".stripMargin
    })

  /** Epoch/repeat scheduling under a token budget — the mixture
    * planner for when the curated corpus is SMALLER than the training
    * budget: give every source an equal share of the budget, repeat
    * its tokens up to that share but never beyond the repeat cap
    * (diminishing returns of re-read data bound useful epochs), and
    * report the leftover budget the mixture cannot fill. All
    * arithmetic is integer-exact in micro-epoch units (repeat_u =
    * min(cap·1e6, share·1e6 DIV tokens)), so the schedule is
    * bit-portable and sums exactly.
    *
    * 100 TB shape: one token-count aggregate at source grain (the
    * only corpus pass), then arithmetic on a sources-sized frame.
    * The schedule is the artifact a reader feeds the sampler — no
    * per-doc work at all beyond the count. */
  private def llm111 = Q("llm111_epoch_schedule",
    (s, dir) => {
      val perSource = Tables.documents(s, dir)
        .select(col("source"), TextAnalysis.tokenCount(col("text")).cast("long").as("tk"))
        .groupBy(col("source")).agg(sum(col("tk")).as("tokens"))
      // budget 109k tokens (sized so share/tokens straddles the 4.0
      // cap at sf0.01 — both the capped and uncapped branches carry
      // rows), repeat cap 4.0 epochs in micro-units; the source count
      // rides a broadcast single-row frame — no driver action, and
      // every division is truncating DIV (integer-exact)
      val nsrc = perSource.agg(count(lit(1)).as("ns"))
      perSource.crossJoin(broadcast(nsrc))
        .withColumn("share", expr("109000 DIV greatest(ns, 1)"))
        .withColumn("repeat_u",
          least(lit(4000000L), expr("(share * 1000000) DIV tokens")))
        .withColumn("scheduled_tokens", expr("(tokens * repeat_u) DIV 1000000"))
        .withColumn("unfilled", col("share") - col("scheduled_tokens"))
        .select(col("source"), col("tokens"), col("repeat_u"),
          col("scheduled_tokens"), col("unfilled"))
        .orderBy(col("source"))
    },
    Some("""WITH t AS (SELECT source,
           |    CAST(sum(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)))
           |      AS BIGINT) AS tokens
           |  FROM documents GROUP BY source),
           |n AS (SELECT count(*) AS ns FROM t),
           |s AS (SELECT t.source, t.tokens,
           |        CAST(109000 // greatest(n.ns, 1) AS BIGINT) AS share
           |      FROM t CROSS JOIN n),
           |r AS (SELECT source, tokens, share,
           |        least(4000000, (share * 1000000) // tokens) AS repeat_u
           |      FROM s)
           |SELECT source, tokens, CAST(repeat_u AS BIGINT) AS repeat_u,
           |       CAST((tokens * repeat_u) // 1000000 AS BIGINT) AS scheduled_tokens,
           |       CAST(share - (tokens * repeat_u) // 1000000 AS BIGINT) AS unfilled
           |FROM r ORDER BY source""".stripMargin))

  private val llm112Slot = new TrackerSlot

  /** Hash-sampled per-group quantiles — the estimation path for when
    * q16's exact distributed ranks are overkill: a deterministic
    * uniform sample (the bottom-100 docs per source by portable
    * doc-id hash — order-independent, engine-replayable, the same
    * idea as KMV sampling) and EXACT quantiles over that bounded
    * sample. The sample selection rides the distributed exact-rank
    * scan (never a per-group sort of the full corpus); the quantile
    * window then runs over ≤100 rows per source — bounded frames at
    * any corpus size, which is the entire point. p50/p90 are
    * value-at-ceil-rank with a (value, doc_id) tiebreak so both
    * engines pick the identical element.
    *
    * 100 TB shape: one range-repartition for the rank scan over
    * 8-byte (hash, id) pairs, one integer-keyed semi-join to pull the
    * sampled rows, then windows over k-bounded partitions. */
  private def llm112 = Q("llm112_sampled_quantiles",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("h", Portable.hash64(col("doc_id")))
      val ranked = graft.llm.Sketches.groupRanks(
        d.select(col("source"), col("h"), col("doc_id")),
        col("source"), col("h"), col("doc_id"), tracker = Some(llm112Slot.fresh()))
      val sampleIds = ranked.filter(col("rank") <= 100)
        .select(col("id").as("doc_id"))
      val sample = d.join(sampleIds, Seq("doc_id"), "left_semi")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
      sample
        .withColumn("rn", row_number().over(w))
        .withColumn("k", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("source"))))
        .groupBy(col("source"))
        .agg(max(col("k")).as("n_sampled"),
          max(when(expr("rn * 2 = k OR rn * 2 = k + 1"), col("n_chars")))
            .as("est_p50"),
          max(when(expr("rn * 10 = k * 9 OR (rn - 1) * 10 < k * 9 AND rn * 10 > k * 9"),
            col("n_chars"))).as("est_p90"))
        .orderBy(col("source"))
    },
    Some(s"""WITH d AS (SELECT doc_id, source, n_chars,
            |        ${Portable.duckHash64("doc_id")} AS h
            |      FROM documents),
            |r AS (SELECT *, row_number() OVER (PARTITION BY source
            |                                   ORDER BY h, doc_id) AS hr FROM d),
            |smp AS (SELECT doc_id, source, n_chars FROM r WHERE hr <= 100),
            |q AS (SELECT source, n_chars,
            |        row_number() OVER (PARTITION BY source
            |                           ORDER BY n_chars, doc_id) AS rn,
            |        count(*) OVER (PARTITION BY source) AS k
            |      FROM smp)
            |SELECT source, CAST(max(k) AS BIGINT) AS n_sampled,
            |  max(CASE WHEN rn * 2 = k OR rn * 2 = k + 1 THEN n_chars END) AS est_p50,
            |  max(CASE WHEN rn * 10 = k * 9
            |            OR (rn - 1) * 10 < k * 9 AND rn * 10 > k * 9
            |           THEN n_chars END) AS est_p90
            |FROM q GROUP BY source ORDER BY source""".stripMargin),
    cleanup = Some(_ => llm112Slot.drain()))

  /** Mixed-language document detection — the per-half consistency
    * check monolingual filters need: langId agrees on the whole doc
    * yet the tail can be another language entirely (template headers,
    * quoted spam, concatenated crawl fragments), and such docs poison
    * a monolingual corpus llm07's single verdict would admit. The
    * doc's token array splits at the midpoint, each half re-joins to
    * text and runs the SAME langId marker chain, and the flag is a
    * plain label comparison. Docs with doc_id % 11 == 0 get a German
    * filler tail planted so both verdicts appear at any SF.
    *
    * 100 TB shape: one projection — tokenize once, slice twice, three
    * marker-count chains — no shuffle before the verify ORDER BY. */
  private def llm113 = Q("llm113_mixed_language",
    (s, dir) => {
      import graft.llm.TextAnalysis
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        .withColumn("t",
          when(col("doc_id") % 11 === 0,
            concat(col("text"), lit(" der und die der und die der und die")))
            .otherwise(col("text")))
      // ONE lowered tokenization; marker counts are ADDITIVE over the
      // halves (full = head + tail), so eight filter counts feed all
      // three argmax chains — measured vs the three-langId form this
      // is ~3× less per-token work
      val langs = TextAnalysis.langMarkers
      val counted = d
        .withColumn("toks", expr("filter(split(lower(t), '\\\\s+'), x -> length(x) > 0)"))
        .withColumn("nt", greatest(size(col("toks")), lit(1)))
        .withColumn("ht", expr("slice(toks, 1, greatest(nt DIV 2, 1))"))
        .withColumn("tt", expr("slice(toks, greatest(nt DIV 2, 1) + 1, nt)"))
      val withScores = langs.foldLeft(counted) { case (df, (lang, ms)) =>
        val inList = ms.map(m => s"'$m'").mkString(",")
        df.withColumn(s"sh_$lang",
            size(expr(s"filter(ht, x -> array_contains(array($inList), x))")))
          .withColumn(s"st_$lang",
            size(expr(s"filter(tt, x -> array_contains(array($inList), x))")))
      }
      def chainOf(side: String) = TextAnalysis.langIdFromScores(
        langs.map { case (lang, _) =>
          lang -> (side match {
            case "h" => col(s"sh_$lang")
            case "t" => col(s"st_$lang")
            case _ => col(s"sh_$lang") + col(s"st_$lang")
          })
        })
      withScores.select(col("doc_id"),
          chainOf("f").as("lang_full"),
          chainOf("h").as("lang_head"),
          chainOf("t").as("lang_tail"))
        .withColumn("is_mixed", col("lang_head") =!= col("lang_tail"))
        .orderBy(col("doc_id"))
    },
    Some {
      val langs = TextAnalysis.langMarkers
      // the llm07 oracle's first-wins argmax chain, parameterized over
      // WHICH token array feeds the marker counts
      def scoreCols(tokExpr: String, tag: String) = langs.map { case (lang, ms) =>
        s"len(list_filter($tokExpr, x -> list_contains([${ms.map("'" + _ + "'").mkString(",")}], x))) AS s_${tag}_$lang"
      }.mkString(",\n            ")
      def chain(tag: String) = {
        val c = langs.zipWithIndex.init.foldRight(s"'${langs.last._1}'") {
          case (((lang, _), i), rest) =>
            val later = langs.drop(i + 1).map { case (l, _) =>
              s"s_${tag}_$lang >= s_${tag}_$l" }.mkString(" AND ")
            s"CASE WHEN $later THEN '$lang' ELSE $rest END"
        }
        val allZero = langs.map { case (l, _) => s"s_${tag}_$l" }.mkString(" + ") + " = 0"
        s"CASE WHEN $allZero THEN 'unknown' ELSE $c END"
      }
      // full-doc scores derive ADDITIVELY from the halves, mirroring
      // the Spark body's one-tokenization structure
      val sumDefs = langs.map { case (l, _) =>
        s"s_h_$l + s_t_$l AS s_f_$l" }.mkString(",\n            ")
      s"""WITH f AS (SELECT doc_id,
         |    CASE WHEN doc_id % 11 = 0
         |      THEN text || ' der und die der und die der und die'
         |      ELSE text END AS t
         |  FROM documents),
         |tk AS (SELECT doc_id,
         |    list_filter(string_split_regex(lower(t), '\\s+'), x -> len(x) > 0) AS toks
         |  FROM f),
         |hv AS (SELECT doc_id, toks, greatest(len(toks), 1) AS nt FROM tk),
         |parts AS (SELECT doc_id,
         |    toks[1:greatest(nt // 2, 1)] AS lt_head,
         |    toks[greatest(nt // 2, 1) + 1:nt] AS lt_tail
         |  FROM hv),
         |sc AS (SELECT doc_id,
         |            ${scoreCols("lt_head", "h")},
         |            ${scoreCols("lt_tail", "t")}
         |       FROM parts),
         |sc2 AS (SELECT *,
         |            $sumDefs
         |        FROM sc)
         |SELECT doc_id,
         |  ${chain("f")} AS lang_full,
         |  ${chain("h")} AS lang_head,
         |  ${chain("t")} AS lang_tail,
         |  (${chain("h")}) <> (${chain("t")}) AS is_mixed
         |FROM sc2 ORDER BY doc_id""".stripMargin
    })

  /** CAPSTONE — the curation FUNNEL as one composed pipeline, every
    * stage an operator this catalog already proves in isolation:
    * language filter (llm07's argmax chain) → minimum-length quality
    * gate → exact dedup on the 8-byte content hash keeping the lowest
    * id (llm01, over the id-shifted duplicate construction) → a
    * deterministic hash split (llm14) → token-balanced shard packing
    * of the train side on the distributed prefix sum (llm101). The
    * deliverable is the shard manifest a training run consumes, and
    * the oracle replays the ENTIRE funnel in one SQL statement — a
    * value error in ANY stage (a mis-gated doc, a dedup survivor with
    * the wrong id, a split flip, a shard off-by-one) shifts manifest
    * counts and fails the compare. This is the library story: the
    * operators COMPOSE, and the composition stays oracle-checkable.
    *
    * 100 TB shape: gates are scan-speed projections; dedup is one
    * fixed-width hash shuffle; the split is a pure hash expression;
    * packing rides the bounded-bucket prefix sum. No stage does
    * corpus-width work twice — the funnel narrows monotonically. */
  private def llm114 = Q("llm114_curation_pipeline",
    (s, dir) => {
      import graft.llm.TextAnalysis
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val corpus = d.unionByName(
        d.select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      // stages 1+2: language + length gates in one projection
      val gated = corpus
        .withColumn("lang", TextAnalysis.langId(col("text")))
        .withColumn("tokens", TextAnalysis.tokenCount(col("text")).cast("long"))
        .filter(col("lang") === "en" && col("tokens") >= 10)
      // stage 3: exact dedup — identical text ⇒ identical tokens, so
      // max(tokens) is THE value; lowest id survives (llm01 contract)
      val deduped = gated
        .withColumn("ch", Portable.hash64(col("text")))
        .groupBy(col("ch"))
        .agg(min(col("doc_id")).as("doc_id"), max(col("tokens")).as("tokens"))
      // stage 4: deterministic 90/10 split
      val split = graft.llm.Sampling.hashSplit(
        deduped.select(col("doc_id"), col("tokens")),
        col("doc_id"), Seq("train" -> 0.9, "eval" -> 0.1), salt = "cur")
      // stage 5: token-balanced shards over the train side
      val train = split.filter(col("split") === "train")
        .withColumn("h", Portable.hash64(col("doc_id")))
      val packed = graft.operators.PrefixSum.runningTotal(
          train, col("h"), col("tokens"), bucketWidth = 1L << 50, out = "running")
        .select(lit("train").as("split"),
          expr("(running - tokens) DIV 4096").as("shard"), col("tokens"))
      val evalSide = split.filter(col("split") === "eval")
        .select(lit("eval").as("split"), lit(-1L).as("shard"), col("tokens"))
      packed.unionByName(evalSide)
        .groupBy(col("split"), col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("shard_tokens"))
        .orderBy(col("split"), col("shard"))
    },
    Some {
      val langs = TextAnalysis.langMarkers
      val scores = langs.map { case (lang, ms) =>
        s"len(list_filter(ltoks, x -> list_contains([${ms.map("'" + _ + "'").mkString(",")}], x))) AS s_$lang"
      }.mkString(",\n            ")
      val chain = langs.zipWithIndex.init.foldRight(s"'${langs.last._1}'") {
        case (((lang, _), i), rest) =>
          val later = langs.drop(i + 1).map { case (l, _) => s"s_$lang >= s_$l" }.mkString(" AND ")
          s"CASE WHEN $later THEN '$lang' ELSE $rest END"
      }
      val allZero = langs.map { case (l, _) => s"s_$l" }.mkString(" + ") + " = 0"
      val h = Portable.duckHash64("text")
      val u = graft.llm.Sampling.duckUnitInterval("doc_id", "cur")
      val hid = Portable.duckHash64("doc_id")
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 100000, text FROM documents),
         |tk AS (SELECT doc_id, text,
         |    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS BIGINT) AS tokens,
         |    list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS ltoks
         |  FROM corpus),
         |sc AS (SELECT doc_id, text, tokens,
         |            $scores
         |       FROM tk),
         |gated AS (SELECT doc_id, text, tokens FROM sc
         |          WHERE (CASE WHEN $allZero THEN 'unknown' ELSE $chain END) = 'en'
         |            AND tokens >= 10),
         |dd AS (SELECT min(doc_id) AS doc_id, max(tokens) AS tokens
         |       FROM (SELECT doc_id, tokens, $h AS ch FROM gated)
         |       GROUP BY ch),
         |sp AS (SELECT doc_id, tokens,
         |         CASE WHEN $u < 0.9 THEN 'train' ELSE 'eval' END AS split
         |       FROM dd),
         |tr AS (SELECT doc_id, tokens, $hid AS hh FROM sp WHERE split = 'train'),
         |r AS (SELECT *, sum(tokens) OVER (ORDER BY hh) AS running FROM tr),
         |shards AS (SELECT 'train' AS split,
         |             CAST((running - tokens) // 4096 AS BIGINT) AS shard, tokens FROM r),
         |ev AS (SELECT 'eval' AS split, CAST(-1 AS BIGINT) AS shard, tokens
         |       FROM sp WHERE split = 'eval'),
         |u2 AS (SELECT * FROM shards UNION ALL SELECT * FROM ev)
         |SELECT split, shard, count(*) AS n_docs,
         |       CAST(sum(tokens) AS BIGINT) AS shard_tokens
         |FROM u2 GROUP BY 1, 2 ORDER BY split, shard""".stripMargin
    })

  /** llm115's fixture: the unique-text corpus (llm98's ` d<id>`
    * suffix trick) plus a planted NEAR-DUP twin (+100000, text +
    * ' qx' — Jaccard ≈ 0.97 at 9-shingles) for every 4th doc, plus an
    * at-least-once redelivery of every 6th row — written once per sf
    * dir outside the bench timer. */
  private val llm115Fixture = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def llm115In(s: org.apache.spark.sql.SparkSession, dir: String): String =
    llm115Fixture.computeIfAbsent(dir, _ => {
      val in = java.nio.file.Files.createTempDirectory("graft-llm115-in").toString
      val base = llmStreamDocs(s, dir)
      val corpus = base.unionByName(base.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          concat(col("text"), lit(" qx")).as("text"), col("ts")))
      corpus.write.mode("overwrite").parquet(in)
      corpus.filter(col("doc_id") % 6 === 0).write.mode("append").parquet(in)
      in
    })

  /** STREAMING near-dedup, oracle-checked end-to-end
    * (StreamingOps.nearDupFlagsStream) — the continuous twin of the
    * batch MinHash/LSH pipeline (llm05) and the delta-batch llm46,
    * for the corpus that arrives as a stream: a REAL micro-batch
    * pipeline runs inside the query — parquet file-source stream over
    * a redelivery fixture with planted ' qx' near-dup twins, one
    * native MinhashSigs pass per doc, the 3×4 banded LSH explode, a
    * per-(band, bucket) flatMapGroupsWithState holding bucket members
    * (id + 12 signature longs, never text), AvailableNow drain to a
    * parquet sink — and the FINAL on-disk flag ledger is what the
    * driver hash-compares. Each (band, pair) whose signatures agree
    * on ≥ 6 of 12 components emits exactly ONE flag for the larger
    * id, whichever micro-batch boundary splits the pair — the set is
    * arrival-order independent, which is what makes it replayable as
    * the batch band join the oracle runs. Lost state double-emits the
    * redeliveries' pairs and fails rows_match; a dedup that compares
    * beyond its bucket flags non-colliding pairs and fails values. */
  private def llm115 = Q("llm115_neardup_stream",
    (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val in = llm115In(s, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-llm115-run")
      val out = root.resolve("out").toString
      val ckpt = root.resolve("ckpt").toString
      val stream = s.readStream.schema(llmStreamDocs(s, dir).schema).parquet(in)
      // round-22 (llm123's pattern): each micro-batch plans one scan
      // task per fixture file, so the MinhashSigs digest — the batch's
      // real compute — ran on 1-2 tasks regardless of core count.
      // Widen the narrow doc rows to session width BEFORE the digest;
      // the (band, bucket) state op keeps its own pinned fan-out.
      // Values unchanged: the flag set is arrival-order independent by
      // contract (within-batch pairs evaluate in ascending-id order in
      // the group function), and repartition preserves each row's
      // micro-batch membership.
      val width = s.conf.get("spark.sql.shuffle.partitions").toInt
      val flags = graft.streaming.StreamingOps.nearDupFlagsStream(
        stream.repartition(width, col("doc_id")), col("doc_id"), col("text"), "ts",
        n = 9, k = 12, rowsPerBand = 4, minMatches = 6, watermarkDelay = "2 hours")
      // state fan-out sized to the corpus while the stream runs (see llm98)
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        // measurement hook (plan evidence for the stream side; see
        // llm123 — here the LAST AvailableNow batch is an empty
        // watermark flush, so the pre-start plan is the evidence)
        if (sys.env.contains("SPARK_GRAFT_STREAM_EXPLAIN")) flags.toDF().explain()
        val q = flags.toDF()
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      s.read.parquet(out).orderBy(col("band"), col("kept_id"), col("flagged_id"))
    },
    Some {
      val hashes = (0 until 12).map(i =>
        s"${Portable.duckSeededHash("shingle", i)} AS h$i").mkString(",\n            ")
      val mins = (0 until 12).map(i => s"min(h$i) AS mh$i").mkString(", ")
      val bandRows = (0 until 3).map { bnd =>
        val cols = (4 * bnd until 4 * (bnd + 1)).map(i => s"mh$i").mkString(", ")
        s"SELECT doc_id, $bnd AS band, ${Portable.duckHash64(s"concat_ws('_', $cols)")} AS bucket FROM mh"
      }.mkString("\n            UNION ALL ")
      val eqSum = (0 until 12).map(i =>
        s"CASE WHEN x.mh$i = y.mh$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH base AS (SELECT doc_id, text || ' d' || doc_id AS text FROM documents),
         |corpus AS (SELECT doc_id, text FROM base
         |           UNION ALL SELECT doc_id + 100000, text || ' qx'
         |           FROM base WHERE doc_id % 4 = 0),
         |sh AS (SELECT DISTINCT doc_id, substr(text, i, 9) AS shingle
         |       FROM (SELECT doc_id, text,
         |               unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i
         |             FROM corpus)),
         |h AS (SELECT doc_id,
         |            $hashes
         |      FROM sh),
         |mh AS (SELECT doc_id, $mins FROM h GROUP BY doc_id),
         |bk AS (
         |            $bandRows),
         |p AS (SELECT a.band, a.doc_id AS kept_id, b.doc_id AS flagged_id
         |      FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
         |                         AND a.doc_id < b.doc_id),
         |m AS (SELECT p.band, p.kept_id, p.flagged_id,
         |        ($eqSum) AS matches
         |      FROM p JOIN mh x ON x.doc_id = p.kept_id
         |             JOIN mh y ON y.doc_id = p.flagged_id)
         |SELECT CAST(band AS INT) AS band, kept_id, flagged_id,
         |       CAST(matches AS INT) AS matches
         |FROM m WHERE matches >= 6
         |ORDER BY band, kept_id, flagged_id""".stripMargin
    },
    prepare = Some((s, dir) => { llm115In(s, dir); () }))

  /** Shared media-fixture writer (llm116/118/120): render the media
    * column into parquet once per sf dir outside the bench timer —
    * the timed bodies then read the production shape (media from
    * storage). The id frame repartitions at EXPLICIT width before the
    * render UDF (AQE would coalesce a kilobyte exchange to one
    * partition and serialize the whole encode pass; one row-group at
    * small SF = one task otherwise — the llm116 lesson). */
  private def writeMediaFixture(s: org.apache.spark.sql.SparkSession,
                                cache: java.util.concurrent.ConcurrentHashMap[String, String],
                                dir: String, tag: String,
                                idFrame: => org.apache.spark.sql.DataFrame,
                                keyCol: String,
                                mediaCol: org.apache.spark.sql.Column): String =
    cache.computeIfAbsent(dir, _ => {
      val out = java.nio.file.Files.createTempDirectory(s"graft-$tag-in").toString
      idFrame
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, col(keyCol))
        .select(col(keyCol), mediaCol.as("media"))
        .write.mode("overwrite").parquet(out)
      out
    })

  /** llm116's fixture: one 6-frame PNG-in-AVI video per doc. */
  private val llm116Fixture = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def llm116In(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val avi = udf((id: Long) => graft.llm.Multimodal.fixtureAviPng(id))
    writeMediaFixture(s, llm116Fixture, dir, "llm116",
      Tables.documents(s, dir).select(col("doc_id")), "doc_id", avi(col("doc_id")))
  }

  /** VIDEO KEYFRAME detection (Multimodal.videoKeyframes) — the
    * frame-sampling stage multimodal pipelines run before
    * caption/dedup, extending the image-dHash family (llm69/70) to
    * the video column: every doc renders a 6-frame video in a REAL
    * RIFF/AVI container with deterministic scene cuts (at frames
    * `2 + id % 2` and 4 the gradient base changes; odd frames carry
    * the llm69 last-columns inversion — a few bits, below threshold),
    * and the full pipeline runs for real — container walk, per-frame
    * image decode, dHash, lag-window Hamming, threshold gate. Frames
    * are PNG inside the AVI so the oracle can replay pixels from the
    * generation formula (JPEG's DCT is not SQL-replayable; the MJPEG
    * codec path is pinned in sbt on gradient frames instead). The
    * keyframe contract: frame 0 always (hamming −1), then every frame
    * whose dHash moved > 10 bits from its predecessor — exactly the
    * scene cuts, discovered by the codec, not the formula. */
  private def llm116 = Q("llm116_video_keyframes",
    (s, dir) => {
      // the video COLUMN comes from storage (prepare writes it once —
      // the render/encode half is fixture scaffolding, not the
      // operator); the timed body is the production shape: scan →
      // demux+decode+dHash at the codec seam → lag window → gate
      val vids = s.read.parquet(llm116In(s, dir))
      graft.llm.Multimodal.videoKeyframes(vids, col("doc_id"), col("media"),
          maxFrames = 8, hammingThreshold = 10)
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    Some(
      """WITH fr AS (
        |  SELECT doc_id, f,
        |         (CASE WHEN f >= 2 + doc_id % 2 THEN 1 ELSE 0 END
        |        + CASE WHEN f >= 4 THEN 1 ELSE 0 END) AS scene
        |  FROM documents CROSS JOIN generate_series(0, 5) g(f)),
        |px AS (SELECT gx, least(gx * 24 // 9, 23) AS xpx FROM generate_series(0, 8) g(gx)),
        |py AS (SELECT gy, least(gy * 16 // 8, 15) AS ypx FROM generate_series(0, 7) g(gy)),
        |lum AS (
        |  SELECT fr.doc_id, fr.f, px.gx, py.gy,
        |    CASE WHEN fr.f % 2 = 1 AND px.xpx >= 20
        |      THEN 299*(255 - ((fr.doc_id*7 + fr.scene*31 + 5)*31 + px.xpx*7 + py.ypx*13) % 256)
        |         + 587*(255 - ((fr.doc_id*7 + fr.scene*31 + 5)*17 + px.xpx*11 + py.ypx*3) % 256)
        |         + 114*(255 - ((fr.doc_id*7 + fr.scene*31 + 5)*23 + px.xpx*5 + py.ypx*19) % 256)
        |      ELSE 299*(((fr.doc_id*7 + fr.scene*31 + 5)*31 + px.xpx*7 + py.ypx*13) % 256)
        |         + 587*(((fr.doc_id*7 + fr.scene*31 + 5)*17 + px.xpx*11 + py.ypx*3) % 256)
        |         + 114*(((fr.doc_id*7 + fr.scene*31 + 5)*23 + px.xpx*5 + py.ypx*19) % 256) END AS l
        |  FROM fr CROSS JOIN px CROSS JOIN py),
        |bits AS (
        |  SELECT a.doc_id, a.f, a.gy * 8 + a.gx AS bit,
        |         CASE WHEN b.l > a.l THEN 1 ELSE 0 END AS v
        |  FROM lum a JOIN lum b ON b.doc_id = a.doc_id AND b.f = a.f
        |                       AND b.gy = a.gy AND b.gx = a.gx + 1
        |  WHERE a.gx < 8),
        |sig AS (SELECT doc_id, f,
        |          CAST(sum(v * (CASE WHEN bit = 63
        |                 THEN -9223372036854775807 - 1
        |                 ELSE CAST(1 AS BIGINT) << bit END)) AS BIGINT) AS dh
        |        FROM bits GROUP BY doc_id, f),
        |lagd AS (SELECT doc_id, f, dh,
        |           lag(dh) OVER (PARTITION BY doc_id ORDER BY f) AS pdh
        |         FROM sig),
        |ham AS (SELECT doc_id, f, dh,
        |          CASE WHEN pdh IS NULL THEN -1
        |               ELSE bit_count(xor(dh, pdh)) END AS hamming
        |        FROM lagd)
        |SELECT doc_id, CAST(f AS INT) AS frame_idx, dh AS dhash,
        |       CAST(hamming AS INT) AS hamming
        |FROM ham WHERE hamming = -1 OR hamming > 10
        |ORDER BY doc_id, frame_idx""".stripMargin),
    prepare = Some((s, dir) => { llm116In(s, dir); () }))

  /** CROSS-SOURCE CONTAMINATION MATRIX (Sketches.kmvContainment) —
    * llm39's exact containment generalized to the train×eval grid at
    * CONSTANT state: every training source × every eval benchmark,
    * the estimated fraction of the benchmark's distinct 9-shingles
    * present in the source, from k=256 KMV sketches — the monitoring
    * matrix a pipeline recomputes per corpus snapshot where the
    * row-grain scrubs (llm16/llm50) are the remediation. Jaccard
    * (llm47) is the WRONG quantity for this: a fully-memorized
    * 100-question benchmark inside a billion-doc source has Jaccard
    * ≈ 0 but containment 1.0. The fixture plants the geometry: three
    * benchmarks excerpted FROM corpus documents (high containment in
    * the sources those docs came from) and one held-out synthetic
    * benchmark (near zero against every source). The oracle replays
    * the order statistics and the estimator's exact IEEE steps, llm47
    * style. */
  private def llm117 = Q("llm117_contamination_matrix",
    (s, dir) => {
      def shingle9(df: org.apache.spark.sql.DataFrame) = df
        .select(col("g"),
          explode(sequence(lit(1), greatest(length(col("t")) - 8, lit(1)))).as("i"),
          col("t"))
        .select(col("g"), col("t").substr(col("i"), lit(9)).as("shingle"))
      val docs = Tables.documents(s, dir)
      val trainSh = shingle9(docs.select(col("source").as("g"), col("text").as("t")))
      val evalItems = docs.filter(col("doc_id") % 10 < 3)
        .select(concat(lit("bench"), col("doc_id") % 10).as("g"),
          substring(col("text"), 1, 120).as("t"))
        .unionByName(docs.filter(col("doc_id") % 10 === 3)
          .select(lit("bench_clean").as("g"),
            concat(lit("held out prompt "), col("doc_id"), lit(" zz")).as("t")))
      graft.llm.Sketches.kmvContainment(
          trainSh, col("g"), col("shingle"),
          shingle9(evalItems), col("g"), col("shingle"), k = 256)
        .orderBy(col("train_source"), col("eval_name"))
    },
    Some(s"""WITH evi AS (
            |  SELECT 'bench' || (doc_id % 10) AS g, substr(text, 1, 120) AS t
            |  FROM documents WHERE doc_id % 10 < 3
            |  UNION ALL
            |  SELECT 'bench_clean', 'held out prompt ' || doc_id || ' zz'
            |  FROM documents WHERE doc_id % 10 = 3),
            |shT AS (SELECT DISTINCT source AS g, ${Portable.duckHash64("shingle")} AS h
            |        FROM (SELECT source, substr(text, i, 9) AS shingle
            |              FROM (SELECT source, text,
            |                      unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i
            |                    FROM documents))),
            |shE AS (SELECT DISTINCT g, ${Portable.duckHash64("shingle")} AS h
            |        FROM (SELECT g, substr(t, i, 9) AS shingle
            |              FROM (SELECT g, t,
            |                      unnest(generate_series(1, greatest(length(t) - 8, 1))) AS i
            |                    FROM evi))),
            |rT AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM shT),
            |rE AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM shE),
            |skT AS (SELECT g AS train_source, list_sort(list(h)) AS ka FROM rT WHERE rn <= 256 GROUP BY g),
            |skE AS (SELECT g AS eval_name, list_sort(list(h)) AS kb FROM rE WHERE rn <= 256 GROUP BY g),
            |p AS (SELECT train_source, eval_name, ka, kb,
            |        list_sort(list_distinct(list_concat(ka, kb)))[1:256] AS u
            |      FROM skT CROSS JOIN skE),
            |e AS (SELECT train_source, eval_name,
            |        CAST(len(u) AS BIGINT) AS k_used,
            |        CAST(len(list_filter(u, x -> list_contains(ka, x)
            |                                 AND list_contains(kb, x))) AS DOUBLE)
            |          / CAST(len(u) AS DOUBLE)
            |          * (CASE WHEN len(u) < 256 THEN CAST(len(u) AS DOUBLE)
            |                  ELSE 255.0 * 1152921504606846976.0 / CAST(u[len(u)] AS DOUBLE)
            |             END) AS intersect_est,
            |        CASE WHEN len(kb) < 256 THEN CAST(len(kb) AS DOUBLE)
            |             ELSE 255.0 * 1152921504606846976.0 / CAST(kb[len(kb)] AS DOUBLE)
            |        END AS d_eval_est
            |      FROM p)
            |SELECT train_source, eval_name, k_used, intersect_est, d_eval_est,
            |       least(1.0, intersect_est / d_eval_est) AS containment_est
            |FROM e ORDER BY train_source, eval_name""".stripMargin))

  /** llm118's fixture: every doc's 6-frame video plus, for every 3rd
    * doc, a TRIMMED re-upload (+100000: the same content cut from
    * frame 1). */
  private val llm118Fixture = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def llm118In(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val avi = udf((cid: Long, f0: Int) =>
      graft.llm.Multimodal.fixtureAviHashed(cid, nFrames = 6, startFrame = f0))
    val d = Tables.documents(s, dir).select(col("doc_id"))
    writeMediaFixture(s, llm118Fixture, dir, "llm118",
      d.select(col("doc_id").as("vid"), col("doc_id").as("cid"), lit(0).as("f0"))
        .unionByName(d.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 100000L).as("vid"), col("doc_id").as("cid"),
            lit(1).as("f0"))),
      "vid", avi(col("cid"), col("f0")))
  }

  /** VIDEO NEAR-DEDUP by keyframe fingerprints
    * (Dedup.fingerprintContainmentPairs over Multimodal.videoKeyframes)
    * — the sequence-level capstone of the multimodal dedup family
    * (llm69/70 = single images, llm116 = within-video scenes): every
    * 3rd video has a planted TRIMMED re-upload (same scenes, first
    * frame cut — byte hashes scatter, frame-wise compare breaks on
    * the index shift), and the pipeline discovers the pairs from
    * content alone: demux → keyframe dHash set per video → candidate
    * join on EXACT fingerprint equality (content defines the buckets,
    * never all-pairs) → set-containment ≥ 0.5 verify, where the
    * min-denominator scores a trim 2/3 while Jaccard would dilute.
    * The oracle replays frame pixels, the keyframe gate, and the
    * containment algebra from the generation formula. */
  private def llm118 = Q("llm118_video_neardup",
    (s, dir) => {
      val kf = graft.llm.Multimodal.videoKeyframes(
        s.read.parquet(llm118In(s, dir)), col("vid"), col("media"),
        maxFrames = 8, hammingThreshold = 10)
      Dedup.fingerprintContainmentPairs(kf, col("doc_id"), col("dhash"),
          minContainment = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some {
      val h = Portable.duckHash64("c.cid || ':' || s.scene || ':' || px.xpx || ':' || py.ypx")
      s"""WITH vids AS (
        |  SELECT doc_id AS vid, doc_id AS cid, 0 AS f0 FROM documents
        |  UNION ALL SELECT doc_id + 100000, doc_id, 1 FROM documents WHERE doc_id % 3 = 0),
        |fr AS (SELECT vid, cid, f,
        |         (CASE WHEN f >= 2 + cid % 2 THEN 1 ELSE 0 END
        |        + CASE WHEN f >= 4 THEN 1 ELSE 0 END) AS scene
        |       FROM vids CROSS JOIN generate_series(0, 5) g(f) WHERE f >= f0),
        |px AS (SELECT gx, least(gx * 24 // 9, 23) AS xpx FROM generate_series(0, 8) g(gx)),
        |py AS (SELECT gy, least(gy * 16 // 8, 15) AS ypx FROM generate_series(0, 7) g(gy)),
        |lat AS (
        |  SELECT c.cid, s.scene, px.gx, py.gy, px.xpx,
        |         $h AS hv
        |  FROM (SELECT DISTINCT cid FROM vids) c
        |  CROSS JOIN generate_series(0, 2) s(scene)
        |  CROSS JOIN px CROSS JOIN py),
        |lum0 AS (SELECT cid, scene, gx, gy, xpx,
        |           299*(hv % 256) + 587*((hv // 256) % 256)
        |             + 114*((hv // 65536) % 256) AS l
        |         FROM lat),
        |lum AS (
        |  SELECT fr.vid, fr.f, l.gx, l.gy,
        |    CASE WHEN fr.f % 2 = 1 AND l.xpx >= 20 THEN 255000 - l.l ELSE l.l END AS l
        |  FROM fr JOIN lum0 l ON l.cid = fr.cid AND l.scene = fr.scene),
        |bits AS (
        |  SELECT a.vid, a.f, a.gy * 8 + a.gx AS bit,
        |         CASE WHEN b.l > a.l THEN 1 ELSE 0 END AS v
        |  FROM lum a JOIN lum b ON b.vid = a.vid AND b.f = a.f
        |                       AND b.gy = a.gy AND b.gx = a.gx + 1
        |  WHERE a.gx < 8),
        |sig AS (SELECT vid, f,
        |          CAST(sum(v * (CASE WHEN bit = 63
        |                 THEN -9223372036854775807 - 1
        |                 ELSE CAST(1 AS BIGINT) << bit END)) AS BIGINT) AS dh
        |        FROM bits GROUP BY vid, f),
        |lagd AS (SELECT vid, f, dh,
        |           lag(dh) OVER (PARTITION BY vid ORDER BY f) AS pdh
        |         FROM sig),
        |kfd AS (SELECT DISTINCT vid, dh FROM lagd
        |        WHERE pdh IS NULL OR bit_count(xor(dh, pdh)) > 10),
        |sz AS (SELECT vid, count(*) AS n FROM kfd GROUP BY vid),
        |p AS (SELECT a.vid AS id_a, b.vid AS id_b, count(*) AS shared
        |      FROM kfd a JOIN kfd b ON a.dh = b.dh AND a.vid < b.vid
        |      GROUP BY 1, 2),
        |e AS (SELECT id_a, id_b, shared, sa.n AS n_a, sb.n AS n_b,
        |        CAST(shared AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE) AS containment
        |      FROM p JOIN sz sa ON sa.vid = p.id_a JOIN sz sb ON sb.vid = p.id_b)
        |SELECT id_a, id_b, shared, n_a, n_b, containment FROM e
        |WHERE containment >= 0.5
        |ORDER BY id_a, id_b""".stripMargin
    },
    prepare = Some((s, dir) => { llm118In(s, dir); () }))

  /** LONGEST-RUN contamination audit (Dedup.longestSharedRun) — the
    * severity dimension the fraction metrics (llm92, llm31) cannot
    * see: per generated/eval sample, the longest VERBATIM substring
    * shared with any training document, as the longest consecutive
    * run of positional 16-gram matches along one alignment diagonal
    * (islands trick — one hash join + one rank + one aggregate,
    * linear in true matches, no pairwise alignment). 16-grams, not
    * the dedup family's 9: a MEASURED necessity, not taste — the
    * corpus's average 9-gram document frequency is ~320 (5.4M
    * positional matches for 100 samples at sf0.1, common phrases,
    * pure noise for a SPAN metric), vs ~7 at 16 chars (125k matches,
    * 43× less — and published span audits use even longer grams for
    * the same reason). The fixture
    * plants the three severities: verbatim 180-char excerpts (one
    * long run), the same excerpts with a 3-char edit in the middle
    * (two half-runs — the edit caps the maximum), and held-out
    * synthetic samples (no run ≥ 5 — present in the input, absent
    * from the output, so a false positive fails rows_match). */
  private def llm119 = Q("llm119_longest_run_audit",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val src = d.filter(col("doc_id") < 100)
      val samples = src.select((col("doc_id") + 500000L).as("sid"),
          substring(col("text"), 51, 180).as("stext"))
        .unionByName(src.select((col("doc_id") + 600000L).as("sid"),
          concat(substring(col("text"), 51, 90), lit("ZQZ"),
            substring(col("text"), 144, 87)).as("stext")))
        .unionByName(src.select((col("doc_id") + 700000L).as("sid"),
          concat(lit("fresh sample "), col("doc_id"),
            lit(" with novel held out content zz")).as("stext")))
      // train side = the PLAIN corpus — served by the shared gram
      // index (GramIndex, round-19: one corpus md5-gram pass shared
      // with llm124/llm128/llm132 instead of four rescans); the small
      // derived sample side hashes fresh
      val e = samples.select(col("sid").as("sample_id"),
          posexplode(graft.llm.GramIndex.gramArray(col("stext"), 16)).as(Seq("__i", "h")))
        .select(col("sample_id"), (col("__i") + 1).as("pe"), col("h"))
      val t = graft.llm.GramIndex.documentsPosHashes(s, dir, 16)
        .select(col("doc_id").as("matched_id"), col("p").as("pt"), col("h"))
      Dedup.longestSharedRunFromHashes(e, t, n = 16, minRun = 5)
        .orderBy(col("sample_id"))
    },
    Some(s"""WITH src AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
            |samples AS (
            |  SELECT doc_id + 500000 AS sid, substr(text, 51, 180) AS stext FROM src
            |  UNION ALL SELECT doc_id + 600000,
            |    substr(text, 51, 90) || 'ZQZ' || substr(text, 144, 87) FROM src
            |  UNION ALL SELECT doc_id + 700000,
            |    'fresh sample ' || doc_id || ' with novel held out content zz' FROM src),
            |e AS (SELECT sid, i AS pe, ${Portable.duckHash64("substr(stext, i, 16)")} AS h
            |      FROM (SELECT sid, stext,
            |              unnest(generate_series(1, greatest(length(stext) - 15, 1))) AS i
            |            FROM samples)),
            |t AS (SELECT doc_id AS mid, i AS pt, ${Portable.duckHash64("substr(text, i, 16)")} AS h
            |      FROM (SELECT doc_id, text,
            |              unnest(generate_series(1, greatest(length(text) - 15, 1))) AS i
            |            FROM documents)),
            |m AS (SELECT e.sid, t.mid, e.pe - t.pt AS diag, e.pe
            |      FROM e JOIN t ON t.h = e.h),
            |r AS (SELECT sid, mid, diag, pe,
            |        row_number() OVER (PARTITION BY sid, mid, diag ORDER BY pe) AS rk
            |      FROM m),
            |runs AS (SELECT sid, mid, count(*) AS run
            |         FROM r GROUP BY sid, mid, diag, pe - rk),
            |best AS (SELECT sid, mid, run,
            |           row_number() OVER (PARTITION BY sid ORDER BY run DESC, mid) AS rn
            |         FROM runs WHERE run >= 5)
            |SELECT sid AS sample_id, mid AS matched_id, run AS longest_run,
            |       run + 15 AS longest_chars
            |FROM best WHERE rn = 1 ORDER BY sample_id""".stripMargin),
    prepare = ensureGramIndex)

  /** AUDIO NEAR-DEDUP by envelope fingerprints — the audio member of
    * the multimodal dedup family (images llm69/70, video llm116/118),
    * through the REAL codec path: every doc renders a PCM16 WAV,
    * every 3rd doc gets an EDITED take (+100000: last-window sample
    * magnitudes halved — byte hashes scatter, the other 7 windows are
    * bit-identical), javax.sound decodes both, and the integer-exact
    * 8-window envelope (llm71's machinery) becomes the fingerprint
    * set (window, quantized level) that feeds the SAME
    * Dedup.fingerprintContainmentPairs as video: candidates from
    * exact fingerprint equality, verified at containment ≥ 0.75 —
    * the edited take shares exactly 7 of 8. The oracle recomputes
    * samples from the generation formula (WAV PCM is lossless) and
    * replays envelope, fingerprints, and containment in SQL. */
  private val llm120Fixture = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def llm120In(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val wav = udf((cid: Long, pert: Boolean) =>
      graft.llm.Multimodal.fixtureWav(cid, if (pert) 1750 else 2000))
    val d = Tables.documents(s, dir).select(col("doc_id"))
    writeMediaFixture(s, llm120Fixture, dir, "llm120",
      d.select(col("doc_id").as("vid"), col("doc_id").as("cid"), lit(false).as("pert"))
        .unionByName(d.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 100000L).as("vid"), col("doc_id").as("cid"),
            lit(true).as("pert"))),
      "vid", wav(col("cid"), col("pert")))
  }

  private def llm120 = Q("llm120_audio_neardup",
    (s, dir) => {
      // audio comes from storage (prepare writes it once — the render
      // half is scaffolding); timed body: scan → REAL javax.sound
      // decode → integer envelope → fingerprint join
      val probe = udf { (bytes: Array[Byte]) =>
        graft.llm.Multimodal.audioEnvelopeQ(bytes, 8)
          .map(_._4).getOrElse(Array.empty[Long])
      }
      val env = s.read.parquet(llm120In(s, dir))
        .select(col("vid"), posexplode(probe(col("media"))))
        .select(col("vid"),
          concat_ws(":", col("pos"), col("col")).as("fp"))
      Dedup.fingerprintContainmentPairs(env, col("vid"), col("fp"),
          minContainment = 0.75)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH takes AS (
           |  SELECT doc_id AS vid, doc_id AS cid, 0 AS pert FROM documents
           |  UNION ALL SELECT doc_id + 100000, doc_id, 1 FROM documents WHERE doc_id % 3 = 0),
           |s AS (SELECT v.vid, i // 250 AS wi,
           |        CASE WHEN v.pert = 1 AND i >= 1750
           |          THEN abs((v.cid * 7919 + i * 104729) % 65536 - 32768) // 2
           |          ELSE abs((v.cid * 7919 + i * 104729) % 65536 - 32768) END AS a
           |      FROM takes v CROSS JOIN generate_series(0, 1999) g(i)),
           |e AS (SELECT vid, wi,
           |        CAST(sum(a) * 1000000 // (count(*) * 32768) AS BIGINT) AS q
           |      FROM s GROUP BY 1, 2),
           |fp AS (SELECT DISTINCT vid, wi || ':' || q AS f FROM e),
           |sz AS (SELECT vid, count(*) AS n FROM fp GROUP BY vid),
           |p AS (SELECT a.vid AS id_a, b.vid AS id_b, count(*) AS shared
           |      FROM fp a JOIN fp b ON a.f = b.f AND a.vid < b.vid
           |      GROUP BY 1, 2),
           |e2 AS (SELECT id_a, id_b, shared, sa.n AS n_a, sb.n AS n_b,
           |         CAST(shared AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE) AS containment
           |       FROM p JOIN sz sa ON sa.vid = p.id_a JOIN sz sb ON sb.vid = p.id_b)
           |SELECT id_a, id_b, shared, n_a, n_b, containment FROM e2
           |WHERE containment >= 0.75
           |ORDER BY id_a, id_b""".stripMargin),
    prepare = Some((s, dir) => { llm120In(s, dir); () }))

  private val llm121Fixture = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def llm121In(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val png = udf((id: Long) => graft.llm.Multimodal.fixturePngBits(id))
    val d = Tables.documents(s, dir).select(col("doc_id"))
    writeMediaFixture(s, llm121Fixture, dir, "llm121",
      d.unionByName(d.filter(col("doc_id") % 2 === 0)
          .select((col("doc_id") + 100000L).as("doc_id")))
        .unionByName(d.filter(col("doc_id") % 4 === 0)
          .select((col("doc_id") + 200000L).as("doc_id"))),
      "doc_id", png(col("doc_id")))
  }

  private val llm121SlotA = new TrackerSlot
  private val llm121SlotB = new TrackerSlot

  /** IMAGE NEAR-DUP CLUSTERS with TRANSITIVE chains — the cluster-
    * grain completion of the image dedup family (llm69 detect, llm70
    * pairs): the fixture plants three-tier edit chains whose dHash
    * patterns sit 6 Hamming bits apart per step but 12 end-to-end
    * (Multimodal.fixturePngBits — the planted bits are REALIZED as
    * per-row luminance walks, so the real PNG→ImageIO→dHash path must
    * reproduce them exactly), making {base, edit1, edit2} a cluster
    * that pairwise thresholding alone cannot group: the banded
    * candidate join SURFACES the base↔edit2 endpoint pair and the
    * Hamming verify REJECTS it at 12 > 8, and only the connected-
    * components closure (one integer-pair fixpoint, llm17's
    * machinery) recovers the chain. Output is the dedup DECISION
    * table — every image with its cluster representative (min id)
    * and keep flag, singletons kept — and the oracle replays planted
    * bits → banding → verify → recursive closure in SQL. */
  private def llm121 = Q("llm121_image_clusters",
    (s, dir) => {
      val hashed = llm121SlotA.fresh().track(
        graft.operators.Materialize.eagerOrCheckpoint(
          graft.llm.Multimodal.imageDHash(
            s.read.parquet(llm121In(s, dir)), col("doc_id"), col("media")),
          None))
      val pairs = Dedup.dhashNearDupPairs(hashed, col("dhash"), maxHamming = 8)
        .select(col("id_a"), col("id_b"))
      val cc = Dedup.connectedComponents(pairs, tracker = Some(llm121SlotB.fresh()))
        .withColumnRenamed("doc_id", "__d")
      hashed.select(col("doc_id"))
        .join(cc, col("doc_id") === col("__d"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
        .withColumn("keep", col("cluster_id") === col("doc_id"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE ids AS (
            |  SELECT doc_id AS vid, doc_id AS cid, 0 AS tier FROM documents
            |  UNION ALL SELECT doc_id + 100000, doc_id, 1 FROM documents WHERE doc_id % 2 = 0
            |  UNION ALL SELECT doc_id + 200000, doc_id, 2 FROM documents WHERE doc_id % 4 = 0),
            |bits AS (SELECT i.vid, g.b,
            |    ((${Portable.duckHash64("i.cid || ':' || g.b")} % 2)
            |     + (CASE WHEN i.tier >= 1 AND g.b < 6 THEN 1 ELSE 0 END)
            |     + (CASE WHEN i.tier = 2 AND g.b >= 6 AND g.b < 12 THEN 1 ELSE 0 END)) % 2 AS v
            |  FROM ids i CROSS JOIN generate_series(0, 63) g(b)),
            |sig AS (SELECT vid,
            |          CAST(sum(v * (CASE WHEN b = 63
            |                 THEN -9223372036854775807 - 1
            |                 ELSE CAST(1 AS BIGINT) << b END)) AS BIGINT) AS dh
            |        FROM bits GROUP BY vid),
            |bands AS (SELECT vid, dh, bd, (dh >> (16 * bd)) & 65535 AS bucket
            |          FROM sig CROSS JOIN generate_series(0, 3) g(bd)),
            |pairs AS (SELECT DISTINCT a.vid AS id_a, c.vid AS id_b
            |          FROM bands a JOIN bands c ON a.bd = c.bd AND a.bucket = c.bucket
            |          WHERE a.vid < c.vid),
            |ok AS (SELECT p.id_a, p.id_b FROM pairs p
            |       JOIN sig sa ON sa.vid = p.id_a JOIN sig sc ON sc.vid = p.id_b
            |       WHERE bit_count(xor(sa.dh, sc.dh)) <= 8),
            |verts AS (SELECT id_a AS v FROM ok UNION SELECT id_b FROM ok),
            |edges AS (SELECT id_a AS ea, id_b AS eb FROM ok
            |          UNION SELECT id_b, id_a FROM ok),
            |reach(v, r) AS (
            |  SELECT v, v FROM verts
            |  UNION
            |  SELECT e.eb, reach.r FROM edges e JOIN reach ON reach.v = e.ea),
            |cc AS (SELECT v, min(r) AS cluster_id FROM reach GROUP BY v)
            |SELECT i.vid AS doc_id, coalesce(cc.cluster_id, i.vid) AS cluster_id,
            |       (coalesce(cc.cluster_id, i.vid) = i.vid) AS keep
            |FROM ids i LEFT JOIN cc ON cc.v = i.vid
            |ORDER BY doc_id""".stripMargin),
    prepare = Some((s, dir) => { llm121In(s, dir); () }),
    cleanup = Some(_ => { llm121SlotA.drain(); llm121SlotB.drain() }))

  /** Unicode SCRIPT PROFILE + HOMOGLYPH gate
    * (TextAnalysis.scriptProfile) — the poisoning signal the
    * marker-based langId (llm07/llm113) structurally cannot see: the
    * fixture plants Cyrillic look-alike sprinkles (a→а, e→е — the
    * SEO-cloaking/dedup-evasion trick) in every 7th doc and a
    * genuinely Cyrillic-dominant translation in every 11th; the
    * profiler must flag the sprinkled docs as homoglyph-suspect while
    * the actually-Cyrillic docs stay clean (dominance, not presence,
    * decides). One codegen projection — length differences over
    * regexp character classes, no per-char explode, no UDF — so the
    * corpus scan IS the whole cost at any scale, and the oracle
    * replays the identical integer arithmetic. */
  private def llm122 = Q("llm122_script_profile",
    (s, dir) => {
      import graft.llm.TextAnalysis
      val d = Tables.documents(s, dir).select(col("doc_id"),
        when(col("doc_id") % 7 === 0, translate(col("text"), "ae", "ае"))
          .when(col("doc_id") % 11 === 0, translate(col("text"),
            "abcdefghijklmnopqrstuvwxyz", "абвгдежзийклмнопрстуфхцчшщ"))
          .otherwise(col("text")).as("text"))
      TextAnalysis.scriptProfile(d, col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH d AS (SELECT doc_id,
           |    CASE WHEN doc_id % 7 = 0 THEN translate(text, 'ae', 'ае')
           |         WHEN doc_id % 11 = 0 THEN translate(text,
           |           'abcdefghijklmnopqrstuvwxyz', 'абвгдежзийклмнопрстуфхцчшщ')
           |         ELSE text END AS text
           |  FROM documents),
           |p AS (SELECT doc_id, length(text) AS n_chars,
           |    length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_latin,
           |    length(text) - length(regexp_replace(text, '[Ѐ-ӿ]', '', 'g')) AS n_cyrillic,
           |    length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g')) AS n_cjk,
           |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit
           |  FROM d)
           |SELECT doc_id, n_chars, n_latin, n_cyrillic, n_cjk, n_digit,
           |  CASE WHEN n_latin = 0 AND n_cyrillic = 0 AND n_cjk = 0 THEN 'other'
           |       WHEN n_latin >= n_cyrillic AND n_latin >= n_cjk THEN 'latin'
           |       WHEN n_cyrillic >= n_cjk THEN 'cyrillic' ELSE 'cjk' END AS dominant,
           |  (n_latin > n_cyrillic * 4 AND n_cyrillic > 0) AS homoglyph
           |FROM p ORDER BY doc_id""".stripMargin))

  /** CORPUS-WIDE EXACT-SUBSTRING SPAN REMOVAL
    * (Dedup.duplicateSpanScrub) — the production counterpart of
    * llm119's longest-run AUDIT (Lee et al. 2022's ExactSubstr
    * treatment: remove every duplicated span over the threshold
    * corpus-wide, not just measure it): every 7th doc carries a
    * planted legal-boilerplate PREFIX and every doc ≡3 (mod 7) a
    * planted newsletter SUFFIX — plus whatever verbatim duplication
    * the corpus has naturally (the generator's exact-dup twins lose
    * their whole shared body from both copies, the documented
    * remove-every-occurrence semantics — exact dedup runs first in a
    * real pipeline). The operator finds maximal shared 16-gram runs,
    * merges overlapping spans, cuts spans ≥ 40 chars, and emits per
    * doc the cut ranges and the scrubbed text; the oracle replays
    * grams, islands, interval merge, and the string surgery itself.
    * Positions + 8-byte hashes are all that shuffles — the text is
    * read (and cut) where it sits, and the merged range frame
    * broadcasts back against the scan. */
  private val llm124Slot = new TrackerSlot
  private def llm124 = Q("llm124_exact_substring_scrub",
    (s, dir) => {
      val prefix = "all rights reserved reproduction without permission is strictly prohibited by law "
      val suffix = " subscribe to our newsletter for updates terms of service and privacy policy apply"
      val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val d = base.select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(lit(prefix), col("text")))
          .when(col("doc_id") % 7 === 3, concat(col("text"), lit(suffix)))
          .otherwise(col("text")).as("text"))
      // positional hashes derived from the shared gram index + the
      // planted docs' junction recompute — the corpus is md5-gram
      // hashed once per session (GramIndex), not once per query
      import graft.llm.GramIndex
      val ph = base.join(GramIndex.documentsGramArrays(s, dir, 16), "doc_id")
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0,
            GramIndex.withPrefixGrams(col("gh"), col("text"), col("len"), lit(prefix), 16))
          .when(col("doc_id") % 7 === 3,
            GramIndex.withSuffixGrams(col("gh"), col("text"), col("len"), lit(suffix), 16))
          .otherwise(col("gh")).as("gh"))
        .select(col("doc_id"), posexplode(col("gh")).as(Seq("__i", "h")))
        .select(col("doc_id"), (col("__i") + 1).as("p"), col("h"))
      Dedup.duplicateSpanScrub(d, col("doc_id"), col("text"),
          n = 16, minSpan = 40, tracker = Some(llm124Slot.fresh()),
          posHashes = Some(ph))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH d AS (
            |  SELECT doc_id,
            |    CASE WHEN doc_id % 7 = 0 THEN 'all rights reserved reproduction without permission is strictly prohibited by law ' || text
            |         WHEN doc_id % 7 = 3 THEN text || ' subscribe to our newsletter for updates terms of service and privacy policy apply'
            |         ELSE text END AS text
            |  FROM documents),
            |ph AS (
            |  SELECT doc_id, i AS p, ${Portable.duckHash64("substr(text, i, 16)")} AS h
            |  FROM (SELECT doc_id, text,
            |          unnest(generate_series(1, greatest(length(text) - 15, 1))) AS i
            |        FROM d)),
            |shared AS (
            |  SELECT h FROM ph GROUP BY h HAVING min(doc_id) <> max(doc_id)),
            |sp AS (
            |  SELECT doc_id, p,
            |    row_number() OVER (PARTITION BY doc_id ORDER BY p) AS rn
            |  FROM ph JOIN shared USING (h)),
            |runs AS (
            |  SELECT doc_id, min(p) AS s, count(*) + 15 AS span_chars
            |  FROM sp GROUP BY doc_id, p - rn
            |  HAVING count(*) + 15 >= 40),
            |rr AS (
            |  SELECT doc_id, s, s + span_chars - 1 AS e,
            |    max(s + span_chars - 1) OVER (PARTITION BY doc_id ORDER BY s
            |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_e
            |  FROM runs),
            |grp AS (
            |  SELECT doc_id, s, e,
            |    sum(CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END)
            |      OVER (PARTITION BY doc_id ORDER BY s) AS gid
            |  FROM rr),
            |merged AS (
            |  SELECT doc_id, min(s) AS s, max(e) AS e FROM grp GROUP BY doc_id, gid),
            |segs AS (
            |  SELECT doc_id,
            |    coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1 AS gs,
            |    s - 1 AS ge
            |  FROM merged
            |  UNION ALL
            |  SELECT m.doc_id, max(m.e) + 1 AS gs, max(length(d.text)) AS ge
            |  FROM merged m JOIN d USING (doc_id) GROUP BY m.doc_id),
            |scrub AS (
            |  SELECT segs.doc_id,
            |    string_agg(CASE WHEN ge >= gs THEN substr(d.text, CAST(gs AS BIGINT), CAST(ge - gs + 1 AS BIGINT)) ELSE '' END,
            |               '' ORDER BY gs) AS scrubbed_text
            |  FROM segs JOIN d USING (doc_id) GROUP BY segs.doc_id),
            |cuts AS (
            |  SELECT doc_id, count(*) AS n_cuts, sum(e - s + 1) AS cut_chars,
            |    string_agg(s || ':' || (e - s + 1), ',' ORDER BY s) AS cut_ranges
            |  FROM merged GROUP BY doc_id)
            |SELECT d.doc_id,
            |  coalesce(c.n_cuts, 0) AS n_cuts,
            |  CAST(coalesce(c.cut_chars, 0) AS BIGINT) AS cut_chars,
            |  coalesce(c.cut_ranges, '') AS cut_ranges,
            |  coalesce(s.scrubbed_text, d.text) AS scrubbed_text
            |FROM d LEFT JOIN cuts c USING (doc_id) LEFT JOIN scrub s USING (doc_id)
            |ORDER BY d.doc_id""".stripMargin),
    prepare = ensureGramIndex,
    cleanup = Some(_ => llm124Slot.drain()))

  /** llm123's fixture: the documents as a multi-file stream (3
    * repartitioned files + an at-least-once redelivery file of every
    * 5th doc — the sketch must absorb the duplicates without moving),
    * written once per sf dir outside the bench timer. */
  private val llm123Fixture = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def llm123In(s: org.apache.spark.sql.SparkSession, dir: String): String =
    llm123Fixture.computeIfAbsent(dir, _ => {
      val in = java.nio.file.Files.createTempDirectory("graft-llm123-in").toString
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source").as("g"), col("text"))
      docs.repartition(3).write.mode("overwrite").parquet(in)
      docs.filter(col("doc_id") % 5 === 0).write.mode("append").parquet(in)
      in
    })

  /** STREAMING CONTAMINATION MONITOR, oracle-checked end-to-end
    * (StreamingOps.kmvContainmentStream) — the continuous twin of the
    * llm117 batch matrix: a REAL micro-batch pipeline runs inside the
    * query — parquet file-source stream over the multi-file
    * redelivery fixture (maxFilesPerTrigger=1 forces one micro-batch
    * per file), the 9-shingle explode and portable hash scan-side,
    * per-source KMV sketches accumulating in flatMapGroupsWithState
    * (order-statistics union — constant ≤k-long state per source, no
    * watermark, no eviction), the eval benchmarks' sketches riding
    * the closure as a kilobyte broadcast, one refreshed containment
    * row per (changed source × benchmark) per trigger, AvailableNow
    * drain to parquet. The FINAL (max-n_seen) row per pair is what
    * the driver hash-compares — by the KMV set property it equals the
    * batch kmvContainment at full history whatever the batch
    * boundaries, which is why the llm117-shaped oracle replays it.
    * Redelivered docs change nothing (duplicates collapse in the
    * sketch) — lost state would misestimate containment and fail
    * values; a monitor that re-emitted unchanged sketches would still
    * pass (the final row is version-ranked), which is exactly the
    * freedom a live feed needs. */
  private def llm123 = Q("llm123_contamination_stream",
    (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      def shingle9(df: org.apache.spark.sql.DataFrame) = df
        .select(col("g"),
          explode(sequence(lit(1), greatest(length(col("t")) - 8, lit(1)))).as("i"),
          col("t"))
        .select(col("g"), col("t").substr(col("i"), lit(9)).as("shingle"))
      val in = llm123In(s, dir)
      val docs = Tables.documents(s, dir)
      // eval side: the llm117 benchmark groups, sketched batch-side
      val evalItems = docs.filter(col("doc_id") % 10 < 3)
        .select(concat(lit("bench"), col("doc_id") % 10).as("g"),
          substring(col("text"), 1, 120).as("t"))
        .unionByName(docs.filter(col("doc_id") % 10 === 3)
          .select(lit("bench_clean").as("g"),
            concat(lit("held out prompt "), col("doc_id"), lit(" zz")).as("t")))
      val evalSk = Sketches.kmvSketches(
        shingle9(evalItems), col("g"), col("shingle"), k = 256)
      val root = java.nio.file.Files.createTempDirectory("graft-llm123-run")
      val out = root.resolve("out").toString
      val ckpt = root.resolve("ckpt").toString
      val schema = s.read.parquet(in).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
      // round-22 (StreamProfile follow-up): each micro-batch is ONE
      // file = ONE scan task, so the 9-shingle explode + portable hash
      // (the batch's real compute) ran serialized. Widen the cheap
      // doc-level rows (pre-explode) to session width — the KMV state
      // op below keeps its own pinned fan-out; values are unchanged
      // (the sketch's TreeSet is order-insensitive, n_seen counts
      // events, which a repartition preserves).
      val width = s.conf.get("spark.sql.shuffle.partitions").toInt
      val trainSh = shingle9(stream.repartition(width, col("doc_id"))
        .select(col("g"), col("text").as("t")))
      val updates = graft.streaming.StreamingOps.kmvContainmentStream(
        trainSh, col("g"), col("shingle"), evalSk, k = 256)
      // state fan-out sized to the corpus while the stream runs (llm98)
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val q = updates.toDF()
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        // measurement hook only (plan evidence for the stream side — a
        // streaming query's micro-batch plan is not reachable from the
        // returned batch DF): prints the last micro-batch's executed
        // plan when explicitly asked. Inert in the bench.
        if (sys.env.contains("SPARK_GRAFT_STREAM_EXPLAIN")) q.explain()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("train_source"), col("eval_name"))
        .orderBy(col("n_seen").desc)
      s.read.parquet(out)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("train_source"), col("eval_name"), col("k_used"),
          col("intersect_est"), col("d_eval_est"), col("containment_est"))
        .orderBy(col("train_source"), col("eval_name"))
    },
    Some(s"""WITH evi AS (
            |  SELECT 'bench' || (doc_id % 10) AS g, substr(text, 1, 120) AS t
            |  FROM documents WHERE doc_id % 10 < 3
            |  UNION ALL
            |  SELECT 'bench_clean', 'held out prompt ' || doc_id || ' zz'
            |  FROM documents WHERE doc_id % 10 = 3),
            |shT AS (SELECT DISTINCT source AS g, ${Portable.duckHash64("shingle")} AS h
            |        FROM (SELECT source, substr(text, i, 9) AS shingle
            |              FROM (SELECT source, text,
            |                      unnest(generate_series(1, greatest(length(text) - 8, 1))) AS i
            |                    FROM documents))),
            |shE AS (SELECT DISTINCT g, ${Portable.duckHash64("shingle")} AS h
            |        FROM (SELECT g, substr(t, i, 9) AS shingle
            |              FROM (SELECT g, t,
            |                      unnest(generate_series(1, greatest(length(t) - 8, 1))) AS i
            |                    FROM evi))),
            |rT AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM shT),
            |rE AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM shE),
            |skT AS (SELECT g AS train_source, list_sort(list(h)) AS ka FROM rT WHERE rn <= 256 GROUP BY g),
            |skE AS (SELECT g AS eval_name, list_sort(list(h)) AS kb FROM rE WHERE rn <= 256 GROUP BY g),
            |p AS (SELECT train_source, eval_name, ka, kb,
            |        list_sort(list_distinct(list_concat(ka, kb)))[1:256] AS u
            |      FROM skT CROSS JOIN skE),
            |e AS (SELECT train_source, eval_name,
            |        CAST(len(u) AS BIGINT) AS k_used,
            |        CAST(len(list_filter(u, x -> list_contains(ka, x)
            |                                 AND list_contains(kb, x))) AS DOUBLE)
            |          / CAST(len(u) AS DOUBLE)
            |          * (CASE WHEN len(u) < 256 THEN CAST(len(u) AS DOUBLE)
            |                  ELSE 255.0 * 1152921504606846976.0 / CAST(u[len(u)] AS DOUBLE)
            |             END) AS intersect_est,
            |        CASE WHEN len(kb) < 256 THEN CAST(len(kb) AS DOUBLE)
            |             ELSE 255.0 * 1152921504606846976.0 / CAST(kb[len(kb)] AS DOUBLE)
            |        END AS d_eval_est
            |      FROM p)
            |SELECT train_source, eval_name, k_used, intersect_est, d_eval_est,
            |       least(1.0, intersect_est / d_eval_est) AS containment_est
            |FROM e ORDER BY train_source, eval_name""".stripMargin),
    prepare = Some((s, dir) => { llm123In(s, dir); () }))

  /** llm125's fixture: one real ImageIO JPEG per doc with a
    * handcrafted Exif APP1 spliced after SOI (byte order alternates
    * II/MM by id) — written once per sf dir outside the bench timer. */
  private val llm125Fixture = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def llm125In(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val jpg = udf((id: Long) => graft.llm.Multimodal.fixtureJpegExif(id))
    writeMediaFixture(s, llm125Fixture, dir, "llm125",
      Tables.documents(s, dir).select(col("doc_id")), "doc_id", jpg(col("doc_id")))
  }

  /** EXIF/TIFF IMAGE METADATA extraction (Multimodal.parseExif) — the
    * metadata half of the media columns the reference carries as
    * typed structs next to opaque payloads (SURVEY §1.3): a pure-JVM
    * bounds-checked walk of the JPEG marker stream → APP1 `Exif\0\0`
    * → TIFF IFD0, reading the capture staples dedup/curation key on
    * (Make, Model, Orientation, DateTime) in BOTH byte orders. The
    * fixture JPEGs are real (ImageIO-encoded, still decodable) with a
    * handcrafted APP1 spliced in, every field a pure function of the
    * id — so the oracle replays each parsed value from the generation
    * formula while the bytes walk the real marker/IFD path, proving
    * the round-trip. UDF only at the codec seam; what leaves the scan
    * is a handful of short strings + two ints per image. */
  private def llm125 = Q("llm125_exif_metadata",
    (s, dir) => {
      val parse = udf((bytes: Array[Byte]) => graft.llm.Multimodal.parseExif(bytes))
      s.read.parquet(llm125In(s, dir))
        .select(col("doc_id"), parse(col("media")).as("__m"))
        .select(col("doc_id"),
          col("__m._1").as("endian"),
          col("__m._2").as("make"),
          col("__m._3").as("model"),
          col("__m._4").cast("long").as("orientation"),
          col("__m._5").as("taken_at"),
          col("__m._6").cast("long").as("n_ifd_entries"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
           |  CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS endian,
           |  'Cam' || (doc_id % 5) AS make,
           |  'M-' || (doc_id % 3) AS model,
           |  1 + doc_id % 8 AS orientation,
           |  '2024:' || lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0') || ':' ||
           |  lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') || ' 10:00:00' AS taken_at,
           |  CAST(4 AS BIGINT) AS n_ifd_entries
           |FROM documents ORDER BY doc_id""".stripMargin),
    prepare = Some((s, dir) => { llm125In(s, dir); () }))

  /** llm126's fixture: one PNG per doc with planted dHash bits AND an
    * eXIf chunk (burst device + capture second) — bursts of 4 shots,
    * every 3rd burst carrying a same-device same-window STRANGER. */
  private val llm126Fixture = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def llm126In(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val png = udf((id: Long) => graft.llm.Multimodal.fixturePngBurst(id))
    writeMediaFixture(s, llm126Fixture, dir, "llm126",
      Tables.documents(s, dir).select(col("doc_id")), "doc_id", png(col("doc_id")))
  }

  /** BURST-SHOT DEDUP (Multimodal.burstShotClusters) — the capstone
    * composing llm125's EXIF metadata with the image dHash family:
    * photo bursts (4 shots per burst, planted pairwise Hamming ≤ 4)
    * are discovered by CONTENT-BLIND blocking on (Make, Model,
    * 10-second EXIF capture window) followed by a Hamming ≤ 6 verify
    * and the connected-components closure; every 3rd burst plants a
    * same-device same-window STRANGER with independent bits — the
    * blocking admits it as a candidate and the content verify must
    * reject it (it emerges as its own singleton burst). The oracle
    * replays the planted bits, the EXIF formulas, the block join, the
    * Hamming gate, and the recursive closure in SQL. At 100 TB the
    * blocking is the story: device+time cuts candidates to
    * within-block pairs at zero pixel cost — no LSH stage where llm70
    * pays banding — and image bytes never cross an exchange. */
  private val llm126SlotA = new TrackerSlot
  private def llm126 = Q("llm126_burst_shot_dedup",
    (s, dir) => {
      graft.llm.Multimodal.burstShotClusters(
          s.read.parquet(llm126In(s, dir)), col("doc_id"), col("media"),
          maxHamming = 6, tracker = Some(llm126SlotA.fresh()))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE ids AS (
            |  SELECT doc_id, doc_id // 4 AS burst, doc_id % 4 AS member,
            |         (doc_id % 4 = 3 AND (doc_id // 4) % 3 = 0) AS stranger
            |  FROM documents),
            |bits AS (SELECT i.doc_id, g.b,
            |    ((${Portable.duckHash64("CASE WHEN i.stranger THEN 'S' || i.burst || ':' || g.b ELSE i.burst || ':' || g.b END")} % 2)
            |     + (CASE WHEN NOT i.stranger AND i.member >= 1
            |             AND g.b >= 2 * (i.member - 1) AND g.b < 2 * i.member
            |        THEN 1 ELSE 0 END)) % 2 AS v
            |  FROM ids i CROSS JOIN generate_series(0, 63) g(b)),
            |sig AS (SELECT doc_id,
            |          CAST(sum(v * (CASE WHEN b = 63
            |                 THEN -9223372036854775807 - 1
            |                 ELSE CAST(1 AS BIGINT) << b END)) AS BIGINT) AS dh
            |        FROM bits GROUP BY doc_id),
            |meta AS (SELECT doc_id,
            |    'Cam' || (burst % 5) AS make, 'M-' || (burst % 3) AS model,
            |    '2024:01:' || lpad(CAST(1 + (burst // 1440) % 28 AS VARCHAR), 2, '0')
            |      || ' ' || lpad(CAST((burst // 60) % 24 AS VARCHAR), 2, '0')
            |      || ':' || lpad(CAST(burst % 60 AS VARCHAR), 2, '0') || ':0' AS tbucket
            |  FROM ids),
            |pairs AS (SELECT a.doc_id AS id_a, c.doc_id AS id_b
            |          FROM meta a JOIN meta c
            |            ON a.make = c.make AND a.model = c.model
            |           AND a.tbucket = c.tbucket AND a.doc_id < c.doc_id),
            |ok AS (SELECT p.id_a, p.id_b FROM pairs p
            |       JOIN sig sa ON sa.doc_id = p.id_a
            |       JOIN sig sc ON sc.doc_id = p.id_b
            |       WHERE bit_count(xor(sa.dh, sc.dh)) <= 6),
            |verts AS (SELECT id_a AS v FROM ok UNION SELECT id_b FROM ok),
            |edges AS (SELECT id_a AS ea, id_b AS eb FROM ok
            |          UNION SELECT id_b, id_a FROM ok),
            |reach(v, r) AS (
            |  SELECT v, v FROM verts
            |  UNION
            |  SELECT e.eb, reach.r FROM edges e JOIN reach ON reach.v = e.ea),
            |cc AS (SELECT v, min(r) AS cluster_id FROM reach GROUP BY v),
            |labeled AS (SELECT i.doc_id,
            |    coalesce(cc.cluster_id, i.doc_id) AS burst_id
            |  FROM ids i LEFT JOIN cc ON cc.v = i.doc_id)
            |SELECT doc_id, burst_id,
            |       count(*) OVER (PARTITION BY burst_id) AS n_shots,
            |       (burst_id = doc_id) AS keep
            |FROM labeled ORDER BY doc_id""".stripMargin),
    prepare = Some((s, dir) => { llm126In(s, dir); () }),
    cleanup = Some(_ => llm126SlotA.drain()))

  /** llm127's fixture: PNG pairs sharing planted normalized-space
    * bits — member 0 upright (Orientation 1), member 1 stored
    * physically rotated (180°/90°CW/90°CCW cycling by pair) with the
    * matching eXIf Orientation tag. */
  private val llm127Fixture = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def llm127In(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val png = udf((id: Long) => graft.llm.Multimodal.fixturePngOriented(id))
    writeMediaFixture(s, llm127Fixture, dir, "llm127",
      Tables.documents(s, dir).select(col("doc_id")), "doc_id", png(col("doc_id")))
  }

  /** ROTATION-NORMALIZED IMAGE DEDUP
    * (Multimodal.rotationNormalizedPairs) — the dedup the EXIF
    * Orientation tag unlocks: every pair's second member stores its
    * pixels PHYSICALLY ROTATED (180°, 90° CW, 90° CCW cycling by
    * pair) with the matching Orientation tag, the way cameras write
    * sideways sensor buffers — byte hashes scatter AND the naive
    * dHash scatters (the lattice walks a rotated luminance field),
    * so only the normalize-then-hash path recovers the collision.
    * Candidates come from equality of the normalized 8-byte hash —
    * content defines the buckets, never all-pairs — and the oracle
    * replays the planted normalized-space bits, so the real
    * PNG→ImageIO→rotate-back→dHash path must reproduce them exactly
    * for every orientation branch. */
  private val llm127SlotA = new TrackerSlot
  private def llm127 = Q("llm127_rotation_dedup",
    (s, dir) => {
      graft.llm.Multimodal.rotationNormalizedPairs(
          s.read.parquet(llm127In(s, dir)), col("doc_id"), col("media"),
          tracker = Some(llm127SlotA.fresh()))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""WITH ids AS (
            |  SELECT doc_id, doc_id // 2 AS pair, doc_id % 2 AS member FROM documents),
            |bits AS (SELECT i.doc_id, g.b,
            |    ${Portable.duckHash64("'R' || i.pair || ':' || g.b")} % 2 AS v
            |  FROM ids i CROSS JOIN generate_series(0, 63) g(b)),
            |sig AS (SELECT doc_id,
            |          CAST(sum(v * (CASE WHEN b = 63
            |                 THEN -9223372036854775807 - 1
            |                 ELSE CAST(1 AS BIGINT) << b END)) AS BIGINT) AS dh
            |        FROM bits GROUP BY doc_id),
            |o AS (SELECT i.doc_id, s.dh,
            |        CAST(CASE WHEN i.member = 0 THEN 1
            |             WHEN i.pair % 3 = 0 THEN 3
            |             WHEN i.pair % 3 = 1 THEN 6
            |             ELSE 8 END AS INT) AS orient
            |      FROM ids i JOIN sig s USING (doc_id))
            |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            |       a.orient AS orient_a, b.orient AS orient_b
            |FROM o a JOIN o b ON a.dh = b.dh AND a.doc_id < b.doc_id
            |ORDER BY id_a, id_b""".stripMargin),
    prepare = Some((s, dir) => { llm127In(s, dir); () }),
    cleanup = Some(_ => llm127SlotA.drain()))

  /** WINNOWING FINGERPRINT OVERLAP (Winnowing.fingerprints +
    * overlapPairs) — the MOSS local fingerprinting algorithm
    * (Schleimer/Wilkerson/Aiken 2003): rightmost-min-hash per window
    * of w consecutive 16-gram hashes; any shared substring >= w+k-1
    * chars is GUARANTEED to contribute a shared fingerprint (the
    * partial-copy detector MinHash's global sample can't promise).
    * Fixture: every 11th doc carries one of four ~125-char planted
    * passages (license text, pangram filler, list-unsubscribe
    * boilerplate, ASR disclaimer) — docs sharing a variant must pair;
    * the corpus's natural exact-dup twins surface with the highest
    * shared counts. The oracle replays gram hashes, the window
    * expansion, per-window minima, and the distinct-hash overlap
    * join. Tie position (rightmost vs leftmost argmin) provably
    * cannot affect this output — the pair join consumes HASH VALUES
    * and the per-window minimum VALUE is tie-free; the rightmost-pos
    * selection itself is pinned in WinnowingSpec. */
  private def llm128 = Q("llm128_winnowing_overlap",
    (s, dir) => {
      import graft.llm.{GramIndex, Winnowing}
      // gram arrays derived from the shared index (GramIndex): the
      // planted ~125-char passage appends as one junction recompute;
      // sub-k rows drop (fingerprintsFromGrams contract) via the
      // modified-length filter
      val sfx = concat(lit(" "), Llm128Passages((expr("doc_id DIV 11") % 4).cast("int")))
      val grams = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        .join(GramIndex.documentsGramArrays(s, dir, 16), "doc_id")
        .select(col("doc_id"), col("len"),
          when(col("doc_id") % 11 === 0,
            GramIndex.withSuffixGrams(col("gh"), col("text"), col("len"), sfx, 16))
          .otherwise(col("gh")).as("gh"),
          (col("len") + when(col("doc_id") % 11 === 0, length(sfx)).otherwise(0)).as("__mlen"))
        .where(col("__mlen") >= 16)
        .select(col("doc_id"), col("gh"))
      val fps = Winnowing.fingerprintsFromGrams(grams, w = 8)
      Winnowing.overlapPairs(fps, minShared = 5)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""WITH d AS (
            |  SELECT doc_id,
            |    CASE WHEN doc_id % 11 = 0 THEN text || ' ' ||
            |      CASE (doc_id // 11) % 4
            |        WHEN 0 THEN '${Llm128P(0)}'
            |        WHEN 1 THEN '${Llm128P(1)}'
            |        WHEN 2 THEN '${Llm128P(2)}'
            |        ELSE '${Llm128P(3)}' END
            |    ELSE text END AS text
            |  FROM documents),
            |ph AS (
            |  SELECT doc_id, length(text) - 15 AS m, i AS p,
            |         ${Portable.duckHash64("substr(text, i, 16)")} AS h
            |  FROM (SELECT doc_id, text,
            |          unnest(generate_series(1, length(text) - 15)) AS i
            |        FROM d WHERE length(text) >= 16)),
            |win AS (
            |  SELECT doc_id, h,
            |    unnest(generate_series(greatest(1, p - 7),
            |                           least(p, greatest(m - 7, 1)))) AS i
            |  FROM ph),
            |sel AS (SELECT doc_id, i, min(h) AS h FROM win GROUP BY doc_id, i),
            |fp AS (SELECT DISTINCT doc_id, h FROM sel),
            |sz AS (SELECT doc_id, count(*) AS n_fp FROM fp GROUP BY doc_id),
            |pr AS (
            |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
            |  FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2 HAVING count(*) >= 5)
            |SELECT doc_a, doc_b, n_shared, sa.n_fp AS n_a, sb.n_fp AS n_b,
            |  (n_shared * 100) // least(sa.n_fp, sb.n_fp) AS overlap_pct
            |FROM pr JOIN sz sa ON pr.doc_a = sa.doc_id
            |        JOIN sz sb ON pr.doc_b = sb.doc_id
            |ORDER BY doc_a, doc_b""".stripMargin),
    prepare = ensureGramIndex)

  /** CONTENT-DEFINED CHUNK DEDUP (Chunking.chunkDedupStats) — the
    * Manber/LBFS/rsync storage-dedup treatment at corpus grain: split
    * every doc where the 8-char window hash ≡ 0 (mod 47), so chunk
    * boundaries depend only on LOCAL content and a passage shared at
    * DIFFERENT offsets chunks identically in both docs — what
    * fixed-size blocking cannot do. Fixture: every 7th doc carries a
    * planted license PREAMBLE and every 5th a privacy-policy SUFFIX
    * (offset-shifting the body), plus the corpus's natural exact-dup
    * twins; per source the operator reports total vs distinct vs
    * cross-doc-shared chunk volume — the dedup-able bytes. The oracle
    * replays window hashes, cut positions, per-chunk content hashes,
    * and all three grains. Boundaries AND chunk hashes compute in ONE
    * projection over the scan (higher-order functions on the text
    * where it sits); only (source, 8-byte hash, int len) rows cross
    * any exchange. */
  private def llm129 = Q("llm129_cdc_chunk_dedup",
    (s, dir) => {
      import graft.llm.Chunking
      val d = Tables.documents(s, dir).select(col("doc_id"), col("source"),
        concat(
          when(col("doc_id") % 7 === 0, concat(lit(Llm129A + " "), col("text")))
            .otherwise(col("text")),
          when(col("doc_id") % 5 === 0, lit(" " + Llm129B)).otherwise(lit("")))
          .as("text"))
      Chunking.chunkDedupStats(d, col("doc_id"), col("text"), col("source"),
          win = 8, modulus = 47)
        .orderBy(col("source"))
    },
    Some(s"""WITH d AS (
            |  SELECT doc_id, source,
            |    CASE WHEN doc_id % 7 = 0 THEN '$Llm129A ' || text ELSE text END ||
            |    CASE WHEN doc_id % 5 = 0 THEN ' $Llm129B' ELSE '' END AS text
            |  FROM documents),
            |ph AS (
            |  SELECT doc_id, i AS p, ${Portable.duckHash64("substr(text, i, 8)")} AS h
            |  FROM (SELECT doc_id, text,
            |          unnest(generate_series(1, length(text) - 7)) AS i
            |        FROM d WHERE length(text) >= 8)),
            |allb AS (
            |  SELECT DISTINCT doc_id, c FROM (
            |    SELECT doc_id, p + 7 AS c FROM ph WHERE h % 47 = 0
            |    UNION ALL
            |    SELECT doc_id, length(text) AS c FROM d WHERE length(text) >= 1)),
            |ch AS (
            |  SELECT b.doc_id, d.source,
            |    ${Portable.duckHash64("substr(d.text, CAST(coalesce(lag(b.c) OVER (PARTITION BY b.doc_id ORDER BY b.c), 0) + 1 AS BIGINT), CAST(b.c - coalesce(lag(b.c) OVER (PARTITION BY b.doc_id ORDER BY b.c), 0) AS BIGINT))")} AS h,
            |    CAST(b.c - coalesce(lag(b.c) OVER (PARTITION BY b.doc_id ORDER BY b.c), 0) AS BIGINT) AS len
            |  FROM allb b JOIN d USING (doc_id)),
            |bh AS (SELECT h, min(doc_id) <> max(doc_id) AS crossdoc FROM ch GROUP BY h),
            |sh AS (SELECT source, h, count(*) AS cnt, max(len) AS len FROM ch GROUP BY 1, 2)
            |SELECT source, CAST(sum(cnt) AS BIGINT) AS n_chunks,
            |  CAST(sum(cnt*len) AS BIGINT) AS total_chars,
            |  count(*) AS n_distinct_chunks,
            |  CAST(sum(len) AS BIGINT) AS distinct_chars,
            |  CAST(sum(CASE WHEN crossdoc THEN cnt ELSE 0 END) AS BIGINT) AS dup_chunks,
            |  CAST(sum(CASE WHEN crossdoc THEN cnt*len ELSE 0 END) AS BIGINT) AS dup_chars,
            |  CAST(sum(CASE WHEN crossdoc THEN cnt*len ELSE 0 END) * 100 //
            |       sum(cnt*len) AS BIGINT) AS dup_pct
            |FROM sh JOIN bh USING (h) GROUP BY source ORDER BY source""".stripMargin))

  /** PAIRWISE PREFERENCE AGGREGATION (Preference.aggregate) — the
    * RLHF preference-data ranking operator: raw (a, b, winner)
    * comparisons fold to per-matchup majorities, Copeland scores
    * (doubled to stay integral), Borda-style total wins, and
    * Condorcet-winner detection — all integer-exact and
    * arrival-order-independent, unlike Elo (order-dependent) or
    * Bradley-Terry MLE (iterative floats that diverge across
    * engines). Fixture: 12 synthetic "responses" with planted
    * strength = item index; each documents row contributes one
    * comparison (items and noise hash-derived, both engines replay
    * the same md5 draws), winner decided by noise < 50 + 4·(a−b) —
    * the Copeland order must recover the planted strengths within
    * sampling noise. */
  private def llm130 = Q("llm130_preference_rank",
    (s, dir) => {
      import graft.llm.Preference
      val c = Tables.documents(s, dir).select(
        (Portable.hash64(concat(lit("pa:"), col("doc_id"))) % 12).as("a"),
        (Portable.hash64(concat(lit("pb:"), col("doc_id"))) % 12).as("b"),
        (Portable.hash64(concat(lit("pw:"), col("doc_id"))) % 100).as("noise"))
        .where(col("a") =!= col("b"))
        .select(col("a"), col("b"),
          when(col("noise") < lit(50) + (col("a") - col("b")) * 4, col("a"))
            .otherwise(col("b")).as("winner"))
      Preference.aggregate(c, col("a"), col("b"), col("winner"))
        .orderBy(col("item"))
    },
    Some(s"""WITH c AS (
            |  SELECT ${Portable.duckHash64("'pa:' || doc_id")} % 12 AS a,
            |         ${Portable.duckHash64("'pb:' || doc_id")} % 12 AS b,
            |         ${Portable.duckHash64("'pw:' || doc_id")} % 100 AS noise
            |  FROM documents),
            |cw AS (
            |  SELECT a, b, CASE WHEN noise < 50 + 4*(a - b) THEN a ELSE b END AS winner
            |  FROM c WHERE a <> b),
            |norm AS (
            |  SELECT least(a,b) AS lo, greatest(a,b) AS hi,
            |         CASE WHEN winner = least(a,b) THEN 1 ELSE 0 END AS lo_win
            |  FROM cw WHERE winner = a OR winner = b),
            |mu AS (
            |  SELECT lo, hi, count(*) AS n, CAST(sum(lo_win) AS BIGINT) AS lo_wins
            |  FROM norm GROUP BY 1,2),
            |sides AS (
            |  SELECT lo AS item, n, lo_wins AS wins,
            |    CASE WHEN lo_wins*2 > n THEN 1 ELSE 0 END AS beat,
            |    CASE WHEN lo_wins*2 = n THEN 1 ELSE 0 END AS tie
            |  FROM mu
            |  UNION ALL
            |  SELECT hi AS item, n, n - lo_wins AS wins,
            |    CASE WHEN lo_wins*2 < n THEN 1 ELSE 0 END AS beat,
            |    CASE WHEN lo_wins*2 = n THEN 1 ELSE 0 END AS tie
            |  FROM mu)
            |SELECT item, count(*) AS n_matchups, CAST(sum(n) AS BIGINT) AS n_comps,
            |  CAST(sum(wins) AS BIGINT) AS n_wins,
            |  CAST(sum(beat) AS BIGINT) AS n_beaten,
            |  CAST(sum(tie) AS BIGINT) AS n_tied,
            |  CAST(2*sum(beat) + sum(tie) AS BIGINT) AS copeland2,
            |  (sum(beat) = count(*)) AS condorcet,
            |  CAST(sum(wins) * 100 // sum(n) AS BIGINT) AS win_pct
            |FROM sides GROUP BY item ORDER BY item""".stripMargin))

  /** BLOCKLIST GATE with obfuscation folding
    * (TextAnalysis.blocklistGate) — the C4 badwords curation stage
    * hardened against zero-width insertion and leet substitution.
    * Fixture plants all three evasion channels deterministically
    * (both engines replay the same concat): doc_id%7 appends a leet
    * `m0d3l`, %11 a leet `7oxic m0d3l`, %13 a zero-width-split
    * `gp<zwsp>u`; the gate must fold every one back onto the
    * blocklist {model, toxic, gpu} and report per-source flag rates.
    * 100 TB shape: one codegen projection over the scan feeding one
    * hash aggregate — which-terms-matched rides a per-doc bitmask
    * folded with bit_or, so the exchange carries four fixed-width
    * fields per doc and nothing else. */
  private def llm131 = Q("llm131_blocklist_gate",
    (s, dir) => {
      import graft.llm.TextAnalysis
      val d = Tables.documents(s, dir).select(col("source"),
        concat(lower(col("text")),
          when(col("doc_id") % 7 === 0, " m0d3l").otherwise(""),
          when(col("doc_id") % 11 === 0, " 7oxic m0d3l").otherwise(""),
          when(col("doc_id") % 13 === 0, " gp\u200bu").otherwise("")).as("t"))
      TextAnalysis.blocklistGate(d, col("source"), col("t"),
          Seq("model", "toxic", "gpu"))
        .orderBy(col("source"))
    },
    Some("""WITH inj AS (
           |  SELECT source,
           |    lower(text) ||
           |      CASE WHEN doc_id % 7 = 0 THEN ' m0d3l' ELSE '' END ||
           |      CASE WHEN doc_id % 11 = 0 THEN ' 7oxic m0d3l' ELSE '' END ||
           |      CASE WHEN doc_id % 13 = 0 THEN ' gp' || chr(8203) || 'u' ELSE '' END AS t
           |  FROM documents),
           |perdoc AS (
           |  SELECT source,
           |    len(list_filter(ftoks, x -> list_contains(['model','toxic','gpu'], x))) AS hits,
           |    (CASE WHEN list_contains(ftoks, 'model') THEN 1 ELSE 0 END
           |     + CASE WHEN list_contains(ftoks, 'toxic') THEN 2 ELSE 0 END
           |     + CASE WHEN list_contains(ftoks, 'gpu') THEN 4 ELSE 0 END)::BIGINT AS mask
           |  FROM (
           |    SELECT source,
           |      list_transform(
           |        regexp_split_to_array(
           |          translate(t, chr(8203)||chr(8204)||chr(8205)||chr(65279), ''),
           |          '[^a-z0-9@$]+'),
           |        x -> translate(x, '0134578@$', 'oieastbas')) AS ftoks
           |    FROM inj))
           |SELECT source, count(*) AS n_docs,
           |  CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS flagged,
           |  CAST(sum(hits) AS BIGINT) AS hits,
           |  CAST(bit_count(bit_or(mask)) AS BIGINT) AS n_terms,
           |  CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) * 100 // count(*) AS BIGINT) AS flag_pct
           |FROM perdoc GROUP BY source ORDER BY source""".stripMargin))

  /** LINK-GRAPH DOMAIN AUTHORITY (Html.extractLinks +
    * LinkGraph.domainAuthority) — the CCNet/RefinedWeb crawl-quality
    * prior: extract outlinks from page HTML, reduce to a domain-grain
    * graph, rank domains by integer random-walk mass (q24's engine).
    * Fixture: each doc becomes a page on domain d(doc_id%20) whose
    * HTML embeds three deterministic links (targets hash-derived,
    * anchors carrying an inner <b> tag so tag-stripping is exercised
    * for real); the oracle regenerates the link formula and replays
    * the 3-round mass propagation with q24's unrolled integer
    * stages — so the Spark side's REAL regex extraction must
    * reproduce exactly the links the formula plants. 100 TB shape:
    * page HTML dies in the scan projection; everything downstream is
    * domain-grain longs. */
  private val llm133Slot = new TrackerSlot
  private def llm133 = Q("llm133_domain_authority",
    (s, dir) => {
      import graft.llm.{Html, LinkGraph}
      def idx(j: Int) = Portable.hash64(concat(lit(s"lnk$j:"), col("doc_id"))) % 20
      def li(j: Int) = concat(lit("<li><a href=\"https://d"), idx(j),
        lit(".example/p"), col("doc_id"), lit("\"><b>ref</b> "),
        (col("doc_id") + j) % 3, lit("</a></li>"))
      val pages = Tables.documents(s, dir).select(
        concat(lit("d"), col("doc_id") % 20, lit(".example")).as("domain"),
        concat(lit("<html><body><p>"), col("text"), lit("</p><ul>"),
          li(1), li(2), li(3), lit("</ul></body></html>")).as("html"))
      LinkGraph.domainAuthority(pages, col("domain"),
          Html.extractLinks(col("html")), rounds = 3,
          tracker = Some(llm133Slot.fresh()))
        .orderBy(col("domain"))
    },
    Some {
      val stages = (1 to 3).map { r =>
        s"""m$r AS (SELECT e.dst AS id, CAST(sum(m.mass // d.deg) AS BIGINT) AS mass
           |       FROM m${r - 1} m JOIN deg d ON d.src = m.id JOIN e ON e.src = m.id
           |       GROUP BY e.dst HAVING sum(m.mass // d.deg) > 0)""".stripMargin
      }.mkString(",\n        ")
      s"""WITH lnk AS (
         |  SELECT doc_id % 20 AS src,
         |         ${Portable.duckHash64("'lnk' || j || ':' || doc_id")} % 20 AS dst,
         |         'ref ' || (doc_id + j) % 3 AS anchor
         |  FROM documents, generate_series(1, 3) g(j)),
         |e AS (SELECT src, dst FROM lnk),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
         |m0 AS (SELECT id, CAST(1000000 AS BIGINT) AS mass FROM
         |       (SELECT src AS id FROM e UNION SELECT dst FROM e)),
         |$stages
         |SELECT 'd' || dst || '.example' AS domain, count(*) AS n_inlinks,
         |       count(DISTINCT anchor) AS n_anchors,
         |       coalesce(any_value(m.mass), 0) AS mass
         |FROM lnk LEFT JOIN m3 m ON m.id = lnk.dst
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },
    cleanup = Some(_ => llm133Slot.drain()))

  /** MULTI-PROBE LSH RECALL TRADE (Similarity.lshMultiProbeCandidates)
    * — Lv et al. 2007's memory-side dial, MEASURED in-query: for the
    * same 8-plane signature, single-probe (the llm04 baseline) vs
    * probing the query's 8 Hamming-1 neighbor buckets, each scored
    * against the exact brute-force top-10 truth (llm03's machinery).
    * Multi-probe must dominate: more candidates per query, never
    * fewer truth hits — the recall a production deployment buys
    * without re-indexing the corpus (an extra band re-indexes;
    * an extra probe only adds a row to the broadcast query side). */
  private def llm156 = Q("llm156_multiprobe_lsh",
    (s, dir) => {
      import graft.llm.Similarity
      val emb = Tables.embeddings(s, dir)
      val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val truth = Similarity.bruteForceTopK(corpus, "cid", "cv",
          queries, "qid", "qv", k = 10, exact = true)
        .select(col("qid"), col("cid"))
      def audit(probes: Int, label: String) = {
        val cand = Similarity.lshMultiProbeCandidates(corpus, "cid", "cv",
          queries, "qid", "qv", dims = 64, planes = 8, probes = probes)
        val hits = cand.join(truth, Seq("qid", "cid"), "left_semi")
          .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
        cand.groupBy(col("qid")).agg(count(lit(1)).as("n_cand"))
          .join(hits, Seq("qid"), "left")
          .select(lit(label).as("method"), col("qid"), col("n_cand"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      }
      audit(0, "single").unionByName(audit(8, "multiprobe"))
        .withColumn("recall_pct", expr("n_hits * 100 DIV 10"))
        .orderBy(col("method"), col("qid"))
    },
    Some(s"""WITH cb AS (SELECT vec_id AS cid, embedding AS cv,
            |             ${duckRhpBucket("embedding", 64, 8)} AS bucket FROM embeddings),
            |qs AS (SELECT vec_id AS qid, embedding AS qv,
            |         ${duckRhpBucket("embedding", 64, 8)} AS sig
            |       FROM embeddings WHERE vec_id < 5),
            |qp AS (
            |  SELECT qid, qv, 'single' AS method, sig AS bucket FROM qs
            |  UNION ALL
            |  SELECT qid, qv, 'multiprobe', p FROM (
            |    SELECT qid, qv, unnest([sig, xor(sig, 1), xor(sig, 2), xor(sig, 4),
            |      xor(sig, 8), xor(sig, 16), xor(sig, 32), xor(sig, 64),
            |      xor(sig, 128)]) AS p
            |    FROM qs)),
            |cand AS (
            |  SELECT DISTINCT method, qid, cid
            |  FROM qp JOIN cb USING (bucket) WHERE cid <> qid),
            |d AS (SELECT q.qid, c.cid,
            |        sum(CAST(floor(CAST(q.qv[i] AS DOUBLE) * 1e6) AS BIGINT)
            |          * CAST(floor(CAST(c.cv[i] AS DOUBLE) * 1e6) AS BIGINT)) AS dot,
            |        sum(CAST(floor(CAST(q.qv[i] AS DOUBLE) * 1e6) AS BIGINT)
            |          * CAST(floor(CAST(q.qv[i] AS DOUBLE) * 1e6) AS BIGINT)) AS nq,
            |        sum(CAST(floor(CAST(c.cv[i] AS DOUBLE) * 1e6) AS BIGINT)
            |          * CAST(floor(CAST(c.cv[i] AS DOUBLE) * 1e6) AS BIGINT)) AS nc
            |      FROM qs q CROSS JOIN cb c CROSS JOIN generate_series(1, 64) AS g(i)
            |      WHERE c.cid <> q.qid GROUP BY q.qid, c.cid),
            |truth AS (
            |  SELECT qid, cid FROM (
            |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY
            |      CAST(dot AS DOUBLE) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(nc AS DOUBLE))) DESC,
            |      cid) AS rank FROM d)
            |  WHERE rank <= 10),
            |res AS (
            |  SELECT cand.method, cand.qid,
            |    count(*) AS n_cand,
            |    CAST(sum(CASE WHEN truth.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
            |  FROM cand LEFT JOIN truth
            |    ON cand.qid = truth.qid AND cand.cid = truth.cid
            |  GROUP BY 1, 2)
            |SELECT method, qid, n_cand, n_hits,
            |  CAST(n_hits * 100 // 10 AS BIGINT) AS recall_pct
            |FROM res ORDER BY method, qid""".stripMargin))

  /** WEIGHTED SAMPLE WITHOUT REPLACEMENT (Sampling.weightedSample) —
    * sequential Poisson / PPS order sampling: per source, the k
    * smallest deterministic priorities u/w win, giving longer
    * (heavier) documents proportionally higher inclusion odds while
    * the sample stays a pure function of (salt, doc_id) —
    * reproducible across engines, runs, and cluster sizes, where an
    * RNG reservoir is partition-order dependent. Weight = whitespace
    * token count. The oracle replays hash, priority, and the
    * per-source order statistic. 100 TB shape: priorities compute in
    * the scan; only (id, source, weight, one double) reach the one
    * per-source rank exchange. */
  private def llm159 = Q("llm159_weighted_sample",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      Sampling.weightedSample(d, col("doc_id"), col("source"),
          col("n_tokens"), k = 5)
        .select(col("grp").as("source"), col("doc_id"), col("w"),
          col("priority"), col("rk"))
        .orderBy(col("source"), col("rk"))
    },
    Some(s"""WITH d AS (
            |  SELECT doc_id, source,
            |    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS BIGINT) AS w
            |  FROM documents),
            |p AS (
            |  SELECT source, doc_id, w,
            |    CAST(${Portable.duckHash64("'pps:' || doc_id")} AS DOUBLE) / CAST(w AS DOUBLE) AS priority
            |  FROM d WHERE w > 0),
            |r AS (
            |  SELECT source, doc_id, w, priority,
            |    CAST(row_number() OVER (PARTITION BY source
            |      ORDER BY priority ASC, doc_id ASC) AS INT) AS rk
            |  FROM p)
            |SELECT source, doc_id, w, priority, rk FROM r
            |WHERE rk <= 5 ORDER BY source, rk""".stripMargin))

  /** INDEX-BACKED SUBSTRING SEARCH (corpus grep) — the retrieval use
    * of the shared gram index: a query string of length ≥ k must
    * reproduce its leading k-gram verbatim in any containing
    * document, so candidates come from ONE equi-join of the query's
    * k-gram hash against the materialized index (GramIndex) and only
    * candidates pay the substring verify — the corpus text is read
    * solely for docs that share the 8-byte probe hash, never scanned
    * with contains() wholesale. Queries are corpus-derived substrings
    * (deterministic in both engines); the corpus's natural exact-dup
    * twins make several docs match each probe. The oracle is the
    * ground truth the index path must reproduce exactly: a plain
    * instr() scan. 100 TB shape: the query frame is kilobytes
    * (broadcast); the index join keys on the 8-byte hash; the verify
    * join touches candidate docs only. */
  private def llm160 = Q("llm160_index_substring_search",
    (s, dir) => {
      import graft.llm.GramIndex
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      // three probe strings: 20-char substrings of docs 0 / 7 / 13
      val probes = d.filter(col("doc_id").isin(0L, 7L, 13L))
        .select(col("doc_id").as("qid"), substring(col("text"), 5, 20).as("q"))
      // the probe hashes its first k=16 chars, so a sub-16-char probe
      // could only ever match sub-k whole-text index entries and would
      // silently under-return vs the instr() oracle — fail loudly on a
      // fixture change instead (round-19 advice)
      val probeGram = probes.select(col("qid"), col("q"),
        when(length(col("q")) >= 16, Portable.hash64(substring(col("q"), 1, 16)))
          .otherwise(raise_error(concat(
            lit("llm160: probe shorter than k=16 chars breaks the index probe: "),
            col("q"))).cast("long")).as("h"))
      val idx = GramIndex.documentsPosHashes(s, dir, 16)
      val cand = idx.join(broadcast(probeGram), Seq("h"))
        .select(col("qid"), col("q"), col("doc_id")).distinct()
      cand.join(d, "doc_id")
        .filter(instr(col("text"), col("q")) > 0)
        .select(col("qid"), col("doc_id")).distinct()
        .orderBy(col("qid"), col("doc_id"))
    },
    Some("""WITH probes AS (
           |  SELECT doc_id AS qid, substr(text, 5, 20) AS q
           |  FROM documents WHERE doc_id IN (0, 7, 13))
           |SELECT p.qid, d.doc_id
           |FROM probes p JOIN documents d ON instr(d.text, p.q) > 0
           |GROUP BY 1, 2
           |ORDER BY qid, doc_id""".stripMargin),
    prepare = ensureGramIndex)

  /** TOKEN-GRAIN DECONTAMINATION — llm16's eval-overlap audit moved
    * from character shingles to BPE TOKEN 8-grams (the
    * industry-standard variant: n-gram overlap in token space, which
    * survives the whitespace/punctuation perturbations that shift or
    * break every char shingle). Composes two green pieces: the real
    * BPE tokenizer (broadcast merge table, map-only) feeding the
    * rare-shingle-prefiltered containment machinery
    * (Dedup.contamination). The fixture PROVES the token-grain
    * advantage: eval tier A is a train doc with every space DOUBLED —
    * token-identical (whitespace never becomes a token), so token
    * overlap reads ~1.0 where char 9-grams scatter; tier B is novel
    * held-out text (must not flag — and correctly emits no row, since
    * none of its grams exist in train); tier C is a doubled-space
    * HALF of a train doc plus a novel continuation — it STILL flags
    * at ~1.0 because the measure is DIRECTIONAL containment over the
    * eval item's train-present rare grams (novel grams can't dilute
    * the signal): a fragment-level leak is a leak, llm16's exact
    * semantics at token grain. The oracle replays tokenization itself through
    * the recursive-CTE merge loop over train ∪ eval, then the same
    * rare-gram containment. 100 TB shape: tokenization is map-only
    * behind the broadcast merge table; grams travel as 8-byte hashes
    * from the explode on; the rare-df prefilter bounds the posting
    * join exactly as llm16 (shape shared — llm16's slope 0.45
    * transfers: same join algebra, narrower gram stream since
    * |tokens| < |chars|). */
  private def llm157 = Q("llm157_token_decontamination",
    (s, dir) => {
      val bpe = graft.llm.Tokenizer.fromMergesText(bpeMergesText)
      val train = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val src = train.filter(col("doc_id") % 50 === 0)
      val evalSet = src.select((col("doc_id") + 200000L).as("doc_id"),
          regexp_replace(col("text"), " ", "  ").as("text"))
        .unionByName(src.select((col("doc_id") + 300000L).as("doc_id"),
          concat(lit("fresh eval item "), col("doc_id"),
            lit(" with held out token content")).as("text")))
        .unionByName(src.select((col("doc_id") + 400000L).as("doc_id"),
          concat(regexp_replace(expr("substr(text, 1, length(text) DIV 2)"), " ", "  "),
            lit(" followed by totally novel continuation material never in training"))
            .as("text")))
      // token 8-gram HASHES, built INSIDE the tokenizer UDF (one
      // encode per doc; a Column HOF over the UDF result would
      // re-tokenize per lambda element after projection collapse —
      // the llm19 trap, measured 111 s vs 3.6 s at sf0.1). Round-21:
      // the UDF emits the xxhash64 values directly (bit-identical to
      // hashing the gram strings — Tokenizer.gramHashesOf), so the
      // ~8M gram strings are never allocated, exploded, or re-hashed.
      // Round-22: widen BEFORE the UDF — the BPE encode is the
      // heaviest per-row pass in the catalog and was running on the
      // scan's single input partition (Dedup.atWidth: gated, no-op at
      // real scale where the scan plans enough splits).
      def grams(df: org.apache.spark.sql.DataFrame) =
        Dedup.atWidth(df, col("doc_id"))
          .select(col("doc_id"),
            graft.llm.Tokenizer.tokenGramHashes(s, bpe, 8)(col("text")).as("g"))
      Dedup.contaminationHashed(
          grams(train), col("doc_id"), col("g"),
          grams(evalSet), col("doc_id"), col("g"),
          maxDf = 20, tracker = Some(llm157Slot.fresh()))
        .withColumn("contaminated", col("overlap") >= 0.8)
        .orderBy(col("eval_id"))
    },
    Some(s"""WITH RECURSIVE
            |corpus AS (
            |  SELECT doc_id, text FROM documents
            |  UNION ALL SELECT doc_id + 200000, regexp_replace(text, ' ', '  ', 'g')
            |    FROM documents WHERE doc_id % 50 = 0
            |  UNION ALL SELECT doc_id + 300000,
            |    'fresh eval item ' || doc_id || ' with held out token content'
            |    FROM documents WHERE doc_id % 50 = 0
            |  UNION ALL SELECT doc_id + 400000,
            |    regexp_replace(substr(text, 1, length(text) // 2), ' ', '  ', 'g') ||
            |    ' followed by totally novel continuation material never in training'
            |    FROM documents WHERE doc_id % 50 = 0),
            |${bpeMergeLoopCtesFrom("corpus")},
            |toks AS (SELECT doc_id, ord, unnest(syms) AS tok,
            |           unnest(range(1, len(syms)+1)) AS p FROM fin),
            |ids AS (
            |  SELECT doc_id, ord, p,
            |    CASE WHEN length(tok) = 1 THEN unicode(tok)
            |         ELSE 255 + coalesce(nullif(list_position(
            |                [replace(m, ' ', '') for m in ${bpeMergesFixture
      .map { case (x, y) => s"'$x $y'" }.mkString("[", ",", "]")}], tok), 0), -256)
            |    END AS id
            |  FROM toks),
            |seqs AS (SELECT doc_id, list(CAST(id AS VARCHAR) ORDER BY ord, p) AS idl
            |         FROM ids GROUP BY doc_id),
            |grams AS (
            |  SELECT doc_id, unnest(
            |    CASE WHEN len(idl) >= 8
            |         THEN [array_to_string(idl[i:i+7], '-') for i in range(1, len(idl) - 6)]
            |         ELSE [array_to_string(idl, '-')] END) AS g
            |  FROM seqs),
            |tsh AS (SELECT DISTINCT doc_id AS train_id, g FROM grams WHERE doc_id < 200000),
            |rare AS (SELECT g FROM (SELECT g, count(*) AS df FROM tsh GROUP BY g) t
            |         WHERE df <= 20),
            |trare AS (SELECT train_id, g FROM tsh JOIN rare USING (g)),
            |esh AS (SELECT DISTINCT doc_id AS eval_id, g FROM grams WHERE doc_id >= 200000),
            |erare AS (SELECT eval_id, g FROM esh JOIN rare USING (g)),
            |ec AS (SELECT eval_id, count(*) AS n_eval FROM erare GROUP BY 1),
            |shared AS (SELECT eval_id, train_id, count(*) AS n_shared
            |           FROM erare JOIN trare USING (g) GROUP BY 1, 2),
            |scored AS (SELECT s.eval_id, s.train_id,
            |             CAST(s.n_shared AS DOUBLE) / CAST(ec.n_eval AS DOUBLE) AS overlap,
            |             row_number() OVER (PARTITION BY s.eval_id
            |               ORDER BY CAST(s.n_shared AS DOUBLE) / CAST(ec.n_eval AS DOUBLE) DESC,
            |                        s.train_id DESC) AS rn
            |           FROM shared s JOIN ec USING (eval_id))
            |SELECT eval_id, train_id, overlap, overlap >= 0.8 AS contaminated
            |FROM scored WHERE rn = 1
            |ORDER BY eval_id""".stripMargin),
    cleanup = Some(_ => llm157Slot.drain()))

  private val llm157Slot = new TrackerSlot

  /** INCREMENTAL GRAM-INDEX REFRESH (GramIndex.refresh) — the
    * change-rate-cost maintenance path for the materialized gram
    * index the exact-substring family shares: a CDC epoch's document
    * changelog (updates, deletes, inserts — the cdc39 mutation rules
    * plus an insert wave) folds into the index by one anti-join
    * (untouched docs pass through WITHOUT re-reading their text) plus
    * a map-only re-hash of the changed docs. The oracle is the
    * REBUILD: a full gram pass over the mutated corpus — refresh must
    * equal rebuild per doc (gram count + bounded hash sum), which
    * pins both the delta algebra and the no-stale-rows property. At
    * 100 TB the full rebuild is paid once (GramIndex build); every
    * epoch after costs O(changed docs).
    *
    * Bench accounting (round-19 verdict #5): THIS row is the
    * deterministic owner of the one-time index-build cost — its timed
    * body runs the full corpus gram pass (freshGramArrays) on every
    * run, while every other family consumer forces the materialized
    * index in its untimed prepare hook. The row therefore measures
    * "full build + one epoch refresh", the pair a production DAG
    * actually pays. */
  private def llm158 = Q("llm158_gram_index_refresh",
    (s, dir) => {
      import graft.llm.GramIndex
      val idx = GramIndex.freshGramArrays(s, dir, 16)
      val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val changes = base.filter(col("doc_id") % 6 === 0 || col("doc_id") % 9 === 0)
        .select(col("doc_id"),
          when(col("doc_id") % 9 === 0, "d").otherwise("u").as("op"),
          when(col("doc_id") % 9 === 0, lit(null).cast("string"))
            .otherwise(concat(col("text"), lit(" revised edition"))).as("text"))
        .unionByName(base.filter(col("doc_id") % 10 === 7)
          .select((col("doc_id") + 500000L).as("doc_id"), lit("c").as("op"),
            concat(lit("new appended document "), col("doc_id") + 500000L,
              lit(" arriving in this epoch with fresh content")).as("text")))
      GramIndex.refresh(idx, changes, 16)
        .select(col("doc_id"), col("len").cast("long").as("len"),
          size(col("gh")).cast("long").as("n_grams"),
          aggregate(col("gh"), lit(0L),
            (acc, h) => acc + h % 1000000000L).as("hash_sum"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH mut AS (
            |  SELECT doc_id,
            |    CASE WHEN doc_id % 6 = 0 THEN text || ' revised edition'
            |         ELSE text END AS text
            |  FROM documents WHERE doc_id % 9 <> 0
            |  UNION ALL
            |  SELECT doc_id + 500000,
            |    'new appended document ' || (doc_id + 500000) ||
            |    ' arriving in this epoch with fresh content'
            |  FROM documents WHERE doc_id % 10 = 7),
            |g AS (SELECT doc_id, length(text) AS len,
            |        ${Portable.duckHash64("substr(text, i, 16)")} % 1000000000 AS hm
            |      FROM (SELECT doc_id, text,
            |              unnest(generate_series(1, greatest(length(text) - 15, 1))) AS i
            |            FROM mut))
            |SELECT doc_id, CAST(min(len) AS BIGINT) AS len,
            |       count(*) AS n_grams, CAST(sum(hm) AS BIGINT) AS hash_sum
            |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** LENGTH-DISTRIBUTION DRIFT (CorpusStats.lengthDrift) — the third
    * drift axis (llm86 vocabulary, llm107 embeddings): a
    * deterministic integer two-sample KS over bucketed lengths,
    * cross-multiplied so both engines agree bit-for-bit. Fixture: v2
    * doubles every 7th doc's text (a concatenation-bug shape); the
    * statistic must localize the shifted mass. Each version reduces
    * to bucket counts in one hash aggregate; the cumulative window
    * runs over the dozens-of-rows bucket frame. */
  private def llm155 = Q("llm155_length_drift",
    (s, dir) => {
      import graft.llm.CorpusStats
      val v1 = Tables.documents(s, dir).select(col("text"))
      val v2 = Tables.documents(s, dir).select(
        when(col("doc_id") % 7 === 0, concat(col("text"), col("text")))
          .otherwise(col("text")).as("text"))
      CorpusStats.lengthDrift(v1, col("text"), v2, col("text"), bucketWidth = 50)
    },
    Some("""WITH v1 AS (SELECT length(text) // 50 AS b FROM documents),
           |v2 AS (SELECT length(CASE WHEN doc_id % 7 = 0 THEN text || text
           |                          ELSE text END) // 50 AS b FROM documents),
           |c1 AS (SELECT b, count(*) AS c FROM v1 GROUP BY b),
           |c2 AS (SELECT b, count(*) AS c FROM v2 GROUP BY b),
           |al AS (
           |  SELECT coalesce(c1.b, c2.b) AS b, coalesce(c1.c, 0) AS c1,
           |         coalesce(c2.c, 0) AS c2
           |  FROM c1 FULL JOIN c2 ON c1.b = c2.b),
           |cum AS (
           |  SELECT b, sum(c1) OVER (ORDER BY b) AS k1,
           |         sum(c2) OVER (ORDER BY b) AS k2,
           |    (SELECT sum(c1) FROM al) AS n1, (SELECT sum(c2) FROM al) AS n2
           |  FROM al),
           |st AS (SELECT b, abs(k1 * n2 - k2 * n1) AS d, n1, n2 FROM cum)
           |SELECT CAST(max(d) AS BIGINT) AS ks_scaled,
           |  CAST(min(CASE WHEN d = (SELECT max(d) FROM st) THEN b END) AS INT) AS at_bucket,
           |  CAST(any_value(n1) AS BIGINT) AS n1, CAST(any_value(n2) AS BIGINT) AS n2,
           |  CAST(max(d) * 100 // (any_value(n1) * any_value(n2)) AS BIGINT) AS ks_pct
           |FROM st""".stripMargin))

  /** PER-DOC INTERNAL REDUNDANCY (Chunking.docRedundancy) — the
    * template-spam flag at CHUNK grain: a long paragraph pasted
    * twice inside one doc is invisible to token-duplicate fractions
    * (llm19) and periodic-loop detection (llm137), but the
    * content-defined chunks of the second copy hash identically
    * wherever it lands (llm129's offset invariance). Fixture pastes
    * each %9 doc's own first 240 chars twice; at threshold 15% the
    * plants flag with zero false positives (48/56 — the misses are
    * short docs whose paste clips). One chunk projection + two hash
    * aggregates over (8-byte hash + int) rows. */
  private def llm154 = Q("llm154_doc_redundancy",
    (s, dir) => {
      import graft.llm.Chunking
      val d = Tables.documents(s, dir).select(col("doc_id"), col("source"),
        when(col("doc_id") % 9 === 0,
          concat(col("text"), lit(" "), substring(col("text"), 1, 240),
            lit(" "), substring(col("text"), 1, 240)))
          .otherwise(col("text")).as("t"))
      Chunking.docRedundancy(d, col("doc_id"), col("t"), col("source"),
          win = 8, modulus = 47, minDupPct = 15)
        .orderBy(col("source"))
    },
    Some(s"""WITH d AS (
            |  SELECT doc_id, source,
            |    CASE WHEN doc_id % 9 = 0
            |         THEN text || ' ' || substr(text, 1, 240) || ' ' || substr(text, 1, 240)
            |         ELSE text END AS t
            |  FROM documents),
            |ph AS (
            |  SELECT doc_id, i AS p, ${Portable.duckHash64("substr(t, i, 8)")} AS wh
            |  FROM (SELECT doc_id, t, unnest(generate_series(1, length(t) - 7)) AS i
            |        FROM d WHERE length(t) >= 8)),
            |allb AS (
            |  SELECT DISTINCT doc_id, c FROM (
            |    SELECT doc_id, p + 7 AS c FROM ph WHERE wh % 47 = 0
            |    UNION ALL
            |    SELECT doc_id, length(t) AS c FROM d WHERE length(t) >= 1)),
            |ch AS (
            |  SELECT b.doc_id, d.source,
            |    ${Portable.duckHash64("substr(d.t, CAST(coalesce(lag(b.c) OVER (PARTITION BY b.doc_id ORDER BY b.c), 0) + 1 AS BIGINT), CAST(b.c - coalesce(lag(b.c) OVER (PARTITION BY b.doc_id ORDER BY b.c), 0) AS BIGINT))")} AS hh,
            |    CAST(b.c - coalesce(lag(b.c) OVER (PARTITION BY b.doc_id ORDER BY b.c), 0) AS BIGINT) AS len
            |  FROM allb b JOIN d USING (doc_id)),
            |pd AS (
            |  SELECT doc_id, source,
            |    CAST(sum(cnt * len) AS BIGINT) AS total,
            |    CAST(sum((cnt - 1) * len) AS BIGINT) AS intdup
            |  FROM (SELECT doc_id, source, hh, count(*) AS cnt, max(len) AS len
            |        FROM ch GROUP BY 1, 2, 3)
            |  GROUP BY 1, 2),
            |pp AS (SELECT doc_id, source, intdup * 100 // total AS pct FROM pd)
            |SELECT source, count(*) AS n_docs,
            |  CAST(sum(CASE WHEN pct >= 15 THEN 1 ELSE 0 END) AS BIGINT) AS flagged,
            |  CAST(max(pct) AS BIGINT) AS max_intdup_pct
            |FROM pp GROUP BY source ORDER BY source""".stripMargin))

  /** SOURCE-INTERLEAVE AUDIT (Sampling.interleaveBySource +
    * sourceRunStats) — the anti-clumping epoch reorder a data loader
    * wants, with its quality measure: per source, the longest run of
    * consecutive positions (islands over the global sequence). The
    * query audits BOTH orderings — the source-sorted baseline must
    * read max_run = |source| = 25 everywhere and the deterministic
    * interleave must read max_run = 1 — so the permutation formula
    * and the audit verify each other. One window per source + one
    * projection for the reorder; the audit's global sequence number
    * rides PrefixSum's bucketed two-level scan (no unpartitioned
    * row-grain window anywhere in the plan — round-19 verdict #2);
    * the only unpartitioned frames are over bucket/source TOTALS. */
  private def llm153 = Q("llm153_interleave_audit",
    (s, dir) => {
      import graft.llm.Sampling
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"),
        substring(col("source"), 4, 10).cast("int").as("si"))
      val inter = Sampling.interleaveBySource(docs, col("doc_id"), col("si"), 20)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
      // clumped baseline WITHOUT a global (si, doc_id) window (round-19
      // verdict #2): rank within source is a PARTITIONED window; the
      // cross-source offset is an exclusive prefix over the 20
      // per-source counts — an unpartitioned frame bounded by the
      // SOURCE count, not the row count, broadcast back in
      val bySrc = docs.withColumn("__r",
        row_number().over(Window.partitionBy(col("si")).orderBy(col("doc_id"))))
      val offs = docs.groupBy(col("si")).agg(count(lit(1)).as("__c"))
        .withColumn("__off", coalesce(sum(col("__c")).over(
          Window.orderBy(col("si")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .select(col("si"), col("__off"))
      val clump = bySrc.join(broadcast(offs), "si")
        .withColumn("position", (col("__off") + col("__r")).cast("long"))
      val a = Sampling.sourceRunStats(inter, col("position"), col("source"))
        .withColumn("ordering", lit("interleaved"))
      val b = Sampling.sourceRunStats(clump, col("position"), col("source"))
        .withColumn("ordering", lit("clumped"))
      a.unionByName(b)
        .select(col("ordering"), col("source"), col("n_runs"),
          col("max_run"), col("n"))
        .orderBy(col("ordering"), col("source"))
    },
    Some("""WITH d AS (
           |  SELECT doc_id, source, CAST(substr(source, 4) AS INT) AS si
           |  FROM documents),
           |inter AS (
           |  SELECT doc_id, source,
           |    (row_number() OVER (PARTITION BY si ORDER BY doc_id) - 1) * 20 + si AS position
           |  FROM d),
           |clump AS (
           |  SELECT doc_id, source,
           |    row_number() OVER (ORDER BY si, doc_id) AS position
           |  FROM d),
           |runs AS (
           |  SELECT 'interleaved' AS ordering, source, grp, count(*) AS run FROM (
           |    SELECT source,
           |      row_number() OVER (ORDER BY position)
           |        - row_number() OVER (PARTITION BY source ORDER BY position) AS grp
           |    FROM inter) GROUP BY 1, 2, 3
           |  UNION ALL
           |  SELECT 'clumped', source, grp, count(*) FROM (
           |    SELECT source,
           |      row_number() OVER (ORDER BY position)
           |        - row_number() OVER (PARTITION BY source ORDER BY position) AS grp
           |    FROM clump) GROUP BY 1, 2, 3)
           |SELECT ordering, source, count(*) AS n_runs,
           |  CAST(max(run) AS BIGINT) AS max_run, CAST(sum(run) AS BIGINT) AS n
           |FROM runs GROUP BY ordering, source
           |ORDER BY ordering, source""".stripMargin))

  /** PREFERENCE LENGTH-BIAS AUDIT (Preference.lengthBias) — the
    * verbosity-bias diagnostic for RLHF comparisons: longer-side win
    * rate bucketed by |len_a − len_b|. The fixture PLANTS the bias
    * (winner odds shift by the length delta), so the audit must
    * recover the dose-response curve — 54% at near-equal lengths
    * rising to 85% at the widest bucket — which a single overall
    * rate hides behind mostly-equal pairs. Item lengths broadcast
    * into the comparison scan; one hash aggregate over
    * (bucket, two ints). */
  private def llm152 = Q("llm152_length_bias",
    (s, dir) => {
      import graft.llm.Preference
      val lens = s.range(0, 12).select(col("id").as("item"),
        (lit(50) + Portable.hash64(concat(lit("ln:"), col("id"))) % 200).as("len"))
      val c = Tables.documents(s, dir).select(
          (Portable.hash64(concat(lit("pa:"), col("doc_id"))) % 12).as("a"),
          (Portable.hash64(concat(lit("pb:"), col("doc_id"))) % 12).as("b"),
          (Portable.hash64(concat(lit("pw:"), col("doc_id"))) % 100).as("noise"))
        .where(col("a") =!= col("b"))
        .join(broadcast(lens.select(col("item").as("ia"), col("len").as("la"))),
          col("a") === col("ia"))
        .join(broadcast(lens.select(col("item").as("ib"), col("len").as("lb"))),
          col("b") === col("ib"))
        .select(col("a"), col("b"),
          when(col("noise") < lit(50) + expr("(la - lb) DIV 4"), col("a"))
            .otherwise(col("b")).as("winner"))
      Preference.lengthBias(c, col("a"), col("b"), col("winner"),
          lens, col("item"), col("len"), bucketWidth = 50)
        .orderBy(col("delta_bucket"))
    },
    Some(s"""WITH lens AS (
            |  SELECT i AS item, 50 + ${Portable.duckHash64("'ln:' || i")} % 200 AS len
            |  FROM generate_series(0, 11) g(i)),
            |c AS (
            |  SELECT ${Portable.duckHash64("'pa:' || doc_id")} % 12 AS a,
            |         ${Portable.duckHash64("'pb:' || doc_id")} % 12 AS b,
            |         ${Portable.duckHash64("'pw:' || doc_id")} % 100 AS noise
            |  FROM documents),
            |cw AS (
            |  SELECT c.a, c.b, la.len AS len_a, lb.len AS len_b,
            |    CASE WHEN noise < 50 + (la.len - lb.len) // 4 THEN c.a ELSE c.b END AS winner
            |  FROM c JOIN lens la ON la.item = c.a JOIN lens lb ON lb.item = c.b
            |  WHERE c.a <> c.b),
            |m AS (
            |  SELECT abs(len_a - len_b) // 50 AS delta_bucket,
            |    CASE WHEN (winner = a AND len_a > len_b) OR (winner = b AND len_b > len_a)
            |         THEN 1 ELSE 0 END AS lw
            |  FROM cw WHERE len_a <> len_b)
            |SELECT delta_bucket, count(*) AS n_comps,
            |  CAST(sum(lw) AS BIGINT) AS longer_wins,
            |  CAST(sum(lw) * 100 // count(*) AS BIGINT) AS longer_win_pct
            |FROM m GROUP BY delta_bucket ORDER BY delta_bucket""".stripMargin))

  /** LANGUAGE-RUN SEGMENTATION (TextAnalysis.languageRuns) — the
    * routing stage after mixed-language detection (llm113): split a
    * mixed doc into contiguous single-language runs via per-marker
    * lang-id + the islands trick over consecutive marker positions.
    * Fixture plants 6-marker German (%6) and French (%8) tails;
    * scattered natural English markers never reach minRun=3
    * consecutive positions, so exactly the planted runs emit. 100 TB
    * shape: the explode filters to marker rows immediately, so the
    * exchange carries (doc, pos, 2-char lang) for a few percent of
    * tokens; islands are one window + one aggregate. */
  private def llm151 = Q("llm151_language_runs",
    (s, dir) => {
      import graft.llm.TextAnalysis
      val d = Tables.documents(s, dir).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 6 === 0, " der und die der und die").otherwise(""),
          when(col("doc_id") % 8 === 0, " le et les le et les").otherwise(""))
          .as("t"))
      TextAnalysis.languageRuns(d, col("doc_id"), col("t"), minRun = 3)
        .orderBy(col("doc_id"), col("start_pos"))
    },
    Some("""WITH d AS (
           |  SELECT doc_id,
           |    text ||
           |    CASE WHEN doc_id % 6 = 0 THEN ' der und die der und die' ELSE '' END ||
           |    CASE WHEN doc_id % 8 = 0 THEN ' le et les le et les' ELSE '' END AS t
           |  FROM documents),
           |tok AS (
           |  SELECT doc_id, i AS pos, tk[i] AS tok
           |  FROM (SELECT doc_id, list_filter(string_split_regex(t, '\s+'),
           |                 x -> len(x) > 0) AS tk
           |        FROM d), unnest(generate_series(1, len(tk))) g(i)),
           |lng AS (
           |  SELECT doc_id, pos,
           |    CASE WHEN tok IN ('der','und','die') THEN 'de'
           |         WHEN tok IN ('the','and','of') THEN 'en'
           |         WHEN tok IN ('el','y','los') THEN 'es'
           |         WHEN tok IN ('le','et','les') THEN 'fr'
           |         ELSE 'xx' END AS lang
           |  FROM tok),
           |isl AS (
           |  SELECT doc_id, lang, pos,
           |    pos - row_number() OVER (PARTITION BY doc_id, lang ORDER BY pos) AS grp
           |  FROM lng WHERE lang <> 'xx'),
           |runs AS (
           |  SELECT doc_id, lang, min(pos) AS start_pos, count(*) AS run_len
           |  FROM isl GROUP BY doc_id, lang, grp
           |  HAVING count(*) >= 3)
           |SELECT doc_id, lang, CAST(start_pos AS INT) AS start_pos,
           |  CAST(run_len AS BIGINT) AS run_len,
           |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_pos) AS INT) AS run_idx
           |FROM runs ORDER BY doc_id, start_pos""".stripMargin))

  /** SCRUB-RECALL AUDIT (Pii.scrubAudit) — QA of the scrubber
    * itself: detector counts before masking vs residuals after the
    * full mask chain (emails, phones, Luhn-valid cards). The fixture
    * plants all three PII types PLUS the adversarial adjacent-phone
    * pair ('555-1234/555-6789', doc_id%8) whose second number the
    * guard-consuming pattern only reveals once the first is masked —
    * the audit must report exactly that leak as nonzero
    * resid_phones while emails and cards scrub clean. One codegen
    * projection for both passes + the mask chain; (source, six
    * ints)/doc on the exchange. */
  private def llm150 = Q("llm150_scrub_recall",
    (s, dir) => {
      import graft.llm.Pii
      val d = Tables.documents(s, dir).select(col("source"),
        concat(col("text"),
          when(col("doc_id") % 4 === 0,
            concat(lit(" reach user"), col("doc_id"), lit("@example.com"))).otherwise(""),
          when(col("doc_id") % 5 === 0,
            concat(lit(" call 555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(""),
          when(col("doc_id") % 6 === 0, " pay 4111 1111 1111 1111 ok").otherwise(""),
          when(col("doc_id") % 8 === 0, " dial 555-1234/555-6789 now").otherwise(""))
          .as("t"))
      Pii.scrubAudit(d, col("source"), col("t"))
        .orderBy(col("source"))
    },
    Some {
      val em = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ph = "(^|[^0-9-])(([0-9]{3}-)?[0-9]{3}-[0-9]{4})($|[^0-9-])"
      val card = "[0-9](?:[0-9 -]{11,23})[0-9]"
      def luhn(v: String) =
        s"""list_sum(list_transform(range(1, length($v) + 1), i ->
           |   CASE WHEN (length($v) - i) % 2 = 1
           |     THEN CASE WHEN 2*(ascii(substr($v, i, 1)) - 48) > 9
           |            THEN 2*(ascii(substr($v, i, 1)) - 48) - 9
           |            ELSE 2*(ascii(substr($v, i, 1)) - 48) END
           |     ELSE ascii(substr($v, i, 1)) - 48 END)) % 10 = 0""".stripMargin
      def validCards(src: String) =
        s"""len(list_filter(
           |  list_transform(regexp_extract_all($src, '$card'),
           |    x -> regexp_replace(x, '[ -]', '', 'g')),
           |  c -> length(c) BETWEEN 13 AND 19 AND ${luhn("c")}))""".stripMargin
      def maskCards(src: String) =
        s"""list_reduce(
           |  list_prepend($src,
           |    list_transform(
           |      list_filter(
           |        list_transform(regexp_extract_all($src, '$card'),
           |          x -> {'o': x, 'cc': regexp_replace(x, '[ -]', '', 'g')}),
           |        s -> length(s.cc) BETWEEN 13 AND 19 AND ${luhn("s.cc")}),
           |      s -> s.o)),
           |  (acc, x) -> replace(acc, x, '<CARD>'))""".stripMargin
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    text ||
         |    CASE WHEN doc_id % 4 = 0 THEN ' reach user' || doc_id || '@example.com' ELSE '' END ||
         |    CASE WHEN doc_id % 5 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
         |    CASE WHEN doc_id % 6 = 0 THEN ' pay 4111 1111 1111 1111 ok' ELSE '' END ||
         |    CASE WHEN doc_id % 8 = 0 THEN ' dial 555-1234/555-6789 now' ELSE '' END AS t
         |  FROM documents),
         |pre AS (
         |  SELECT doc_id, source, t,
         |    len(regexp_extract_all(t, '$em')) AS pe,
         |    len(regexp_extract_all(t, '$ph')) AS pp,
         |    ${validCards("t")} AS pc
         |  FROM d),
         |m0 AS (
         |  SELECT doc_id, source, pe, pp, pc,
         |    regexp_replace(regexp_replace(t, '$em', '<EMAIL>', 'g'),
         |      '$ph', '\\1<PHONE>\\4', 'g') AS masked0
         |  FROM pre),
         |mk AS (SELECT doc_id, source, pe, pp, pc, ${maskCards("masked0")} AS masked FROM m0),
         |post AS (
         |  SELECT source, pe, pp, pc,
         |    len(regexp_extract_all(masked, '$em')) AS re,
         |    len(regexp_extract_all(masked, '$ph')) AS rp,
         |    ${validCards("masked")} AS rc
         |  FROM mk)
         |SELECT source,
         |  CAST(sum(pe) AS BIGINT) AS planted_emails, CAST(sum(re) AS BIGINT) AS resid_emails,
         |  CAST(sum(pp) AS BIGINT) AS planted_phones, CAST(sum(rp) AS BIGINT) AS resid_phones,
         |  CAST(sum(pc) AS BIGINT) AS planted_cards,  CAST(sum(rc) AS BIGINT) AS resid_cards
         |FROM post GROUP BY source ORDER BY source""".stripMargin
    })

  /** MULTIMODAL REFERENTIAL-INTEGRITY AUDIT
    * (Multimodal.referentialAudit) — orphan documents (media
    * reference resolves to nothing: the run crashes or silently
    * trains text-only) and dangling media (paid storage, no training
    * signal — the GC candidate list). Fixture: the media table drops
    * every doc_id%3==0 (orphans) and adds +100000 rows for %4==0
    * (dangling). Two hash joins on the 8-byte id; the dangling count
    * broadcasts back as one row. */
  private def llm149 = Q("llm149_referential_audit",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val media = docs.filter(col("doc_id") % 3 =!= 0)
        .select(col("doc_id").as("media_id"))
        .unionByName(docs.filter(col("doc_id") % 4 === 0)
          .select((col("doc_id") + 100000L).as("media_id")))
      graft.llm.Multimodal.referentialAudit(
          docs, col("doc_id"), col("source"), media, col("media_id"))
        .orderBy(col("source"))
    },
    Some("""WITH media AS (
           |  SELECT doc_id AS media_id FROM documents WHERE doc_id % 3 <> 0
           |  UNION ALL
           |  SELECT doc_id + 100000 FROM documents WHERE doc_id % 4 = 0),
           |o AS (
           |  SELECT d.source, count(*) AS n_docs,
           |    CAST(sum(CASE WHEN m.media_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orphan_docs
           |  FROM documents d LEFT JOIN media m ON d.doc_id = m.media_id
           |  GROUP BY d.source),
           |g AS (
           |  SELECT count(*) AS dangling_media
           |  FROM media m LEFT JOIN documents d ON m.media_id = d.doc_id
           |  WHERE d.doc_id IS NULL)
           |SELECT source, n_docs, orphan_docs,
           |  (SELECT dangling_media FROM g) AS dangling_media
           |FROM o ORDER BY source""".stripMargin))

  /** CURATION PIPELINE V2 (capstone) — the round-18 gates composed
    * into one monotone funnel with a single SQL oracle, llm114's
    * discipline over the NEW surface: mojibake gate (llm134's
    * signatures) → blocklist gate with obfuscation folds (llm131) →
    * generation-loop gate (llm137, division-free flag) → copyleft
    * license filter (llm132's containment, ref-side winnowing,
    * broadcast fingerprints) → fill-in-middle transform of the kept
    * set (llm146, full-string hash-sum check). Four distinct planted
    * defect classes (%7 leet blockword, %9 replacement char, %11
    * period-1 loop, %13 copyleft boilerplate) drop at their own
    * stages; at sf0.01 the funnel narrows 500 → 319 kept. 100 TB
    * shape: the three text gates are ONE scan projection; the
    * license stage pays the gram-hash pass on SURVIVORS only with a
    * broadcast ref join; FIM is a projection of the kept set. */
  private val llm148Slot = new TrackerSlot
  private def llm148 = Q("llm148_curation_pipeline_v2",
    (s, dir) => {
      import graft.llm.{TextAnalysis, Licenses, Sft}
      val d = Tables.documents(s, dir).select(col("doc_id"), col("source"),
        concat(col("text"),
          when(col("doc_id") % 7 === 0, " 7oxic").otherwise(""),
          when(col("doc_id") % 9 === 0, " caf\uFFFD").otherwise(""),
          when(col("doc_id") % 11 === 0,
            concat_ws("", (1 to 80).map(_ => lit(" buy")): _*)).otherwise(""),
          when(col("doc_id") % 13 === 0, " " + Llm132C).otherwise(""))
          .as("t"))
      // Round-22: widen BEFORE the gate projection — the regex/JVM
      // gates are the heaviest per-row pass here and ran at the scan's
      // single input partition inside the eager job; the materialized
      // leaf inherits the width, so every consumer (license probe,
      // kept stats, FIM, funnel) parallelizes too. Gated no-op at real
      // scale (Dedup.atWidth).
      val s1 = Dedup.atWidth(d, col("doc_id"))
        .withColumn("enc_bad", TextAnalysis.encodingDamage(col("t")) > 0)
        .withColumn("bl_bad",
          TextAnalysis.blocklistHits(col("t"), Seq("toxic")) > 0)
        .withColumn("loop_bad",
          TextAnalysis.loopFlag(TextAnalysis.tokens(col("t")), 4, 30))
        .withColumn("p_enc", !col("enc_bad"))
        .withColumn("p_bl", col("p_enc") && !col("bl_bad"))
        .withColumn("p_loop", col("p_bl") && !col("loop_bad"))
      // the flagged stage feeds FOUR consumers (license probe, kept
      // stats, FIM, and the funnel aggregate) — materialize the gate
      // flags once so the text gates run ONE pass, not one per
      // consumer (9.5 → ~4 s at sf0.1 when the survivor stage was
      // first materialized; round-21 folds the funnel's second full
      // gate pass into the same materialization — the funnel now
      // aggregates the persisted flags instead of re-running
      // encodingDamage/blocklist/loop over the corpus. At scale a
      // production funnel persists stage outputs the same way.)
      val flagged = llm148Slot.fresh().track(
        graft.operators.Materialize.eager(
          s1.select(col("doc_id"), col("source"), col("t"),
            col("enc_bad"), col("bl_bad"), col("loop_bad"),
            col("p_enc"), col("p_bl"), col("p_loop"))))
      val survivors = flagged.filter(col("p_loop"))
        .select(col("doc_id"), col("source"), col("t"))
      val lic = Licenses.detect(survivors, col("doc_id"), col("t"),
          Seq("copyleft" -> Llm132C), k = 16, w = 8, minPct = 50)
        .select(col("doc_id").as("__lid"))
      // lic is a handful of ids — broadcast the anti-join; and project
      // the text away before the fim join so no exchange carries it
      val kept = survivors.join(broadcast(lic),
        survivors("doc_id") === col("__lid"), "left_anti")
      val fim = Sft.fimTransform(kept, col("doc_id"), col("t"))
        .select(col("doc_id"),
          (Portable.hash64(col("fim")) % 1000000000L).as("__fh"))
      val keptStats = kept.select(col("doc_id"), col("source"))
        .join(fim, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("kept"),
          sum(coalesce(col("__fh"), lit(0L))).as("fim_hash_sum"))
      val funnel = flagged.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("enc_bad"), 1L).otherwise(0L)).as("drop_encoding"),
        sum(when(col("p_enc") && col("bl_bad"), 1L).otherwise(0L)).as("drop_blocklist"),
        sum(when(col("p_bl") && col("loop_bad"), 1L).otherwise(0L)).as("drop_loop"),
        sum(when(col("p_loop"), 1L).otherwise(0L)).as("n_surv"))
      funnel.join(keptStats, Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("drop_encoding"),
          col("drop_blocklist"), col("drop_loop"),
          (col("n_surv") - coalesce(col("kept"), lit(0L))).as("drop_license"),
          coalesce(col("kept"), lit(0L)).as("kept"),
          coalesce(col("fim_hash_sum"), lit(0L)).as("fim_hash_sum"))
        .orderBy(col("source"))
    },
    Some(s"""WITH d AS (
            |  SELECT doc_id, source,
            |    text ||
            |    CASE WHEN doc_id % 7 = 0 THEN ' 7oxic' ELSE '' END ||
            |    CASE WHEN doc_id % 9 = 0 THEN ' caf' || chr(65533) ELSE '' END ||
            |    CASE WHEN doc_id % 11 = 0 THEN repeat(' buy', 80) ELSE '' END ||
            |    CASE WHEN doc_id % 13 = 0 THEN ' $Llm132C' ELSE '' END AS t
            |  FROM documents),
            |fl AS (
            |  SELECT doc_id, source, t,
            |    (length(t) - length(replace(t, chr(65533), ''))
            |     + length(t) - length(regexp_replace(t, '[\\x80-\\x9F]', '', 'g'))
            |     + len(regexp_extract_all(t, chr(195) || '[\\xA0-\\xBF]'))) > 0 AS enc_bad,
            |    len(list_filter(
            |      list_transform(
            |        regexp_split_to_array(
            |          translate(lower(t), chr(8203)||chr(8204)||chr(8205)||chr(65279), ''),
            |          '[^a-z0-9@$$]+'),
            |        x -> translate(x, '0134578@$$', 'oieastbas')),
            |      x -> x = 'toxic')) > 0 AS bl_bad,
            |    list_bool_or(
            |      [CASE WHEN len(tk) > p THEN
            |         list_sum(list_transform(range(1, len(tk) - p + 1),
            |           i -> CASE WHEN tk[i + p] = tk[i] THEN 1 ELSE 0 END)) * 100
            |           >= 30 * (len(tk) - p)
            |       ELSE false END for p in [1, 2, 3, 4]]) AS loop_bad
            |  FROM (SELECT doc_id, source, t,
            |          list_filter(string_split_regex(t, '\\s+'), x -> len(x) > 0) AS tk
            |        FROM d)),
            |s1 AS (
            |  SELECT *, NOT enc_bad AS p_enc,
            |    NOT enc_bad AND NOT bl_bad AS p_bl,
            |    NOT enc_bad AND NOT bl_bad AND NOT loop_bad AS p_loop
            |  FROM fl),
            |surv AS (SELECT doc_id, source, t FROM s1 WHERE p_loop),
            |refs AS (SELECT 'copyleft' AS license, '$Llm132C' AS ltext),
            |rph AS (
            |  SELECT license, length(ltext) - 15 AS m, i AS p,
            |         ${Portable.duckHash64("substr(ltext, i, 16)")} AS hh
            |  FROM (SELECT license, ltext, unnest(generate_series(1, length(ltext) - 15)) AS i
            |        FROM refs)),
            |rwin AS (
            |  SELECT license, hh, unnest(generate_series(greatest(1, p - 7),
            |    least(p, greatest(m - 7, 1)))) AS i FROM rph),
            |rfp AS (SELECT DISTINCT license, hh FROM
            |  (SELECT license, i, min(hh) AS hh FROM rwin GROUP BY 1,2)),
            |rsz AS (SELECT license, count(*) AS ref_fp FROM rfp GROUP BY 1),
            |dph AS (
            |  SELECT doc_id, ${Portable.duckHash64("substr(t, i, 16)")} AS hh
            |  FROM (SELECT doc_id, t, unnest(generate_series(1, length(t) - 15)) AS i
            |        FROM surv WHERE length(t) >= 16)),
            |lic AS (
            |  SELECT doc_id FROM (
            |    SELECT doc_id, license, count(*) AS n_shared
            |    FROM (SELECT DISTINCT doc_id, license, hh FROM dph JOIN rfp USING (hh))
            |    GROUP BY 1,2)
            |  JOIN rsz USING (license) WHERE n_shared * 100 // ref_fp >= 50),
            |kept AS (SELECT * FROM surv WHERE doc_id NOT IN (SELECT doc_id FROM lic)),
            |fim AS (
            |  SELECT doc_id,
            |    ${Portable.duckHash64("'<PRE>' || substr(t, 1, a) || '<SUF>' || substr(t, b + 1) || '<MID>' || substr(t, a + 1, b - a)")} % 1000000000 AS fh
            |  FROM (SELECT doc_id, t,
            |          1 + ${Portable.duckHash64("'fa:' || doc_id")} % (length(t) // 3) AS a,
            |          (1 + ${Portable.duckHash64("'fa:' || doc_id")} % (length(t) // 3)) + 1 +
            |            ${Portable.duckHash64("'fb:' || doc_id")} % (length(t) // 3) AS b
            |        FROM kept WHERE length(t) >= 30)),
            |ks AS (
            |  SELECT source, count(*) AS kept,
            |    CAST(sum(coalesce(fh, 0)) AS BIGINT) AS fim_hash_sum
            |  FROM kept LEFT JOIN fim USING (doc_id) GROUP BY source),
            |fu AS (
            |  SELECT source, count(*) AS n_docs,
            |    CAST(sum(CASE WHEN enc_bad THEN 1 ELSE 0 END) AS BIGINT) AS drop_encoding,
            |    CAST(sum(CASE WHEN p_enc AND bl_bad THEN 1 ELSE 0 END) AS BIGINT) AS drop_blocklist,
            |    CAST(sum(CASE WHEN p_bl AND loop_bad THEN 1 ELSE 0 END) AS BIGINT) AS drop_loop,
            |    CAST(sum(CASE WHEN p_loop THEN 1 ELSE 0 END) AS BIGINT) AS n_surv
            |  FROM s1 GROUP BY source)
            |SELECT source, n_docs, drop_encoding, drop_blocklist, drop_loop,
            |  CAST(n_surv - coalesce(kept, 0) AS BIGINT) AS drop_license,
            |  CAST(coalesce(kept, 0) AS BIGINT) AS kept,
            |  CAST(coalesce(fim_hash_sum, 0) AS BIGINT) AS fim_hash_sum
            |FROM fu LEFT JOIN ks USING (source) ORDER BY source""".stripMargin),
    cleanup = Some(_ => llm148Slot.drain()))

  /** llm147's fixture: the documents as a 3-file stream (one
    * micro-batch per file), written once per sf dir outside the
    * bench timer. */
  private val llm147Fixture = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def llm147In(s: org.apache.spark.sql.SparkSession, dir: String): String =
    llm147Fixture.computeIfAbsent(dir, _ => {
      val in = java.nio.file.Files.createTempDirectory("graft-llm147-in").toString
      Tables.documents(s, dir).select(col("doc_id"), col("text"))
        .repartition(3).write.mode("overwrite").parquet(in)
      in
    })

  /** STREAMING HEAVY-HITTERS MONITOR, oracle-checked end-to-end
    * (StreamingOps.runningCountsStream) — the continuous top-terms
    * view: a REAL micro-batch pipeline (parquet file stream,
    * maxFilesPerTrigger=1), token explode scan-side, per-term exact
    * running counts in flatMapGroupsWithState (one long of state per
    * term — O(vocabulary); the CMS sketch is the documented dial for
    * unbounded key spaces), one refreshed count row per moved term
    * per trigger, AvailableNow drain. The final (max-count) row per
    * term is batch-equal to a plain word count BY ADDITIVITY whatever
    * the batch boundaries — the oracle replays the top-20 by (count
    * desc, term). */
  private def llm147 = Q("llm147_heavy_hitters_stream",
    (s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val in = llm147In(s, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-llm147-run")
      llm147Runs.add(root.toString) // reaped in cleanup — repeated
      // bench samples must not accumulate stream out/ckpt dirs in /tmp
      val out = root.resolve("out").toString
      val ckpt = root.resolve("ckpt").toString
      val schema = s.read.parquet(in).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
      val terms = stream.select(explode(Dedup.tokens(col("text"))).as("term"))
      val updates = graft.streaming.StreamingOps.runningCountsStream(
        terms, col("term"))
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val q = updates.toDF()
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      s.read.parquet(out)
        .groupBy(col("term")).agg(max(col("cnt")).as("cnt"))
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("cnt").desc, col("term"))))
        .filter(col("rnk") <= 20)
        .orderBy(col("rnk"))
    },
    Some("""WITH t AS (
           |  SELECT unnest(list_filter(string_split_regex(text, '\s+'),
           |           x -> len(x) > 0)) AS term
           |  FROM documents),
           |c AS (SELECT term, count(*) AS cnt FROM t GROUP BY term)
           |SELECT term, cnt, CAST(rnk AS INT) AS rnk FROM (
           |  SELECT term, cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rnk
           |  FROM c)
           |WHERE rnk <= 20 ORDER BY rnk""".stripMargin),
    prepare = Some((s, dir) => { llm147In(s, dir); () }),
    cleanup = Some(_ => {
      var p = llm147Runs.poll()
      while (p != null) {
        try graft.Fs.deleteRecursively(java.nio.file.Paths.get(p)) catch { case _: Throwable => () }
        p = llm147Runs.poll()
      }
    }))

  private val llm147Runs = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** FILL-IN-MIDDLE TRANSFORM (Sft.fimTransform) — the code-model
    * infilling prep: deterministic hash-derived cut points, PSM
    * ordering `<PRE>p<SUF>s<MID>m`. Per-source stats plus a
    * bounded-sum content check (Σ hash(fim) mod 10⁹ — the full
    * transformed STRING is value-checked, not just the lengths;
    * bounded so the int64 sum can't overflow where DuckDB raises).
    * One scan projection: two hashes + three substrings per doc. */
  private def llm146 = Q("llm146_fim_transform",
    (s, dir) => {
      import graft.llm.Sft
      val f = Sft.fimTransform(Tables.documents(s, dir), col("doc_id"), col("text"))
      f.join(Tables.documents(s, dir).select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("fim_docs"),
          sum(col("pre_len")).as("pre_chars"),
          sum(col("mid_len")).as("mid_chars"),
          sum(col("suf_len")).as("suf_chars"),
          sum(Portable.hash64(col("fim")) % 1000000000L).as("fim_hash_sum"))
        .orderBy(col("source"))
    },
    Some(s"""WITH d AS (SELECT doc_id, source, text, length(text) AS n FROM documents),
            |c AS (
            |  SELECT doc_id, source, text, n,
            |    1 + ${Portable.duckHash64("'fa:' || doc_id")} % (n // 3) AS a,
            |    (1 + ${Portable.duckHash64("'fa:' || doc_id")} % (n // 3)) + 1 +
            |      ${Portable.duckHash64("'fb:' || doc_id")} % (n // 3) AS b
            |  FROM d WHERE n >= 30),
            |f AS (
            |  SELECT doc_id, source, n, a, b,
            |    '<PRE>' || substr(text, 1, a) || '<SUF>' || substr(text, b + 1) ||
            |    '<MID>' || substr(text, a + 1, b - a) AS fim
            |  FROM c)
            |SELECT source, count(*) AS fim_docs,
            |  CAST(sum(a) AS BIGINT) AS pre_chars,
            |  CAST(sum(b - a) AS BIGINT) AS mid_chars,
            |  CAST(sum(n - b) AS BIGINT) AS suf_chars,
            |  CAST(sum(${Portable.duckHash64("fim")} % 1000000000) AS BIGINT) AS fim_hash_sum
            |FROM f GROUP BY source ORDER BY source""".stripMargin))

  /** EMBEDDING INGESTION AUDIT (Similarity.ingestionAudit) — the
    * upstream-bug gate before indexing: zero vectors (failed encoder
    * calls), exact-duplicate vectors (retry storms), integer L1
    * level per label. Fixture plants zeros on vec_id%11 and copies
    * of vector 1 on %13 (broadcast 1-row lookup); zeros duplicate
    * each other too — counted, matching the oracle. Duplicate
    * detection keys on the quantized vector's 8-byte content hash —
    * one narrow self-aggregate, vectors never shuffle twice. */
  private def llm145 = Q("llm145_embedding_ingest_audit",
    (s, dir) => {
      import graft.llm.Similarity
      val emb = Tables.embeddings(s, dir)
      val q = emb.select(col("vec_id"), col("label"),
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(1e6)).cast("long")).as("qv"))
      val ref1 = q.filter(col("vec_id") === 1)
        .select(col("qv").as("__ref"))
      val planted = q.crossJoin(broadcast(ref1))
        .select(col("label"),
          when(col("vec_id") % 11 === 0,
            transform(col("qv"), _ => lit(0L)))
          .when(col("vec_id") % 13 === 0, col("__ref"))
          .otherwise(col("qv")).as("qv"))
      Similarity.ingestionAudit(planted, col("label"), col("qv"), d = 64)
        .orderBy(col("label"))
    },
    Some(s"""WITH q AS (
            |  SELECT vec_id, label,
            |    CASE WHEN vec_id % 11 = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
            |         WHEN vec_id % 13 = 0 THEN
            |           (SELECT list_transform(e2.embedding,
            |              x -> CAST(floor(CAST(x AS DOUBLE)*1e6) AS BIGINT))
            |            FROM embeddings e2 WHERE e2.vec_id = 1)
            |         ELSE list_transform(embedding,
            |           x -> CAST(floor(CAST(x AS DOUBLE)*1e6) AS BIGINT)) END AS qv
            |  FROM embeddings),
            |m AS (
            |  SELECT vec_id, label,
            |    ${Portable.duckHash64("array_to_string(qv, ',')")} AS vh,
            |    list_sum(list_transform(qv, x -> abs(x))) AS l1
            |  FROM q),
            |dups AS (SELECT vh, count(*) AS c FROM m GROUP BY vh)
            |SELECT label, count(*) AS n_vecs,
            |  CAST(sum(CASE WHEN l1 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_vecs,
            |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_vecs,
            |  CAST(sum(l1) // (count(*) * 64) AS BIGINT) AS mean_l1_q
            |FROM m JOIN dups USING (vh)
            |GROUP BY label ORDER BY label""".stripMargin))

  /** PAIRED-BOOTSTRAP SIGNIFICANCE (EvalStats.pairedBootstrap) — the
    * eval decision layer: per-item metric deltas resampled with
    * DETERMINISTIC double-or-nothing hash weights (w ∈ {0,2},
    * E[w]=1), one-sided p = fraction of resamples with weighted sum
    * ≤ 0. No RNG state — the same (resample, item) always draws the
    * same weight, so the test replays bit-exactly in any engine.
    * Fixture: a 'weak' experiment (mean delta ≈ +0.2/item) that must
    * NOT clear p ≤ 5% and a 'strong' one (≈ +5.5/item) that must —
    * both hash-derived over 100 eval items, 200 resamples. */
  private def llm144 = Q("llm144_paired_bootstrap",
    (s, dir) => {
      import graft.llm.EvalStats
      val items = Tables.documents(s, dir).filter(col("doc_id") < 100)
        .select(col("doc_id").as("item"))
      val d = items.select(lit("weak").as("exp"), col("item"),
          (Portable.hash64(concat(lit("d:"), col("item"))) % 21 - 9).as("delta"))
        .unionByName(items.select(lit("strong").as("exp"), col("item"),
          (Portable.hash64(concat(lit("d:"), col("item"))) % 21 - 4).as("delta")))
      EvalStats.pairedBootstrap(d, col("exp"), col("item"), col("delta"),
          resamples = 200)
        .orderBy(col("experiment"))
    },
    Some(s"""WITH it0 AS (
            |  SELECT doc_id AS item, ${Portable.duckHash64("'d:' || doc_id")} % 21 AS h
            |  FROM documents WHERE doc_id < 100),
            |it AS (
            |  SELECT 'weak' AS experiment, item, h - 9 AS delta FROM it0
            |  UNION ALL
            |  SELECT 'strong', item, h - 4 FROM it0),
            |st AS (SELECT experiment, count(*) AS n_items,
            |         CAST(sum(delta) AS BIGINT) AS sum_delta
            |       FROM it GROUP BY 1),
            |bs AS (
            |  SELECT experiment, b,
            |    sum((${Portable.duckHash64("'bs:' || b || ':' || item")} % 2) * 2 * delta) AS wsum
            |  FROM it CROSS JOIN generate_series(0, 199) g(b) GROUP BY 1, 2),
            |bt AS (SELECT experiment, count(*) AS n_resamples,
            |         CAST(sum(CASE WHEN wsum <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonpos
            |       FROM bs GROUP BY 1)
            |SELECT experiment, n_items, sum_delta, n_resamples, n_nonpos,
            |  CAST(n_nonpos * 100 // n_resamples AS BIGINT) AS p_pct
            |FROM st JOIN bt USING (experiment) ORDER BY experiment""".stripMargin))

  private val llm143Fixture = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def llm143In(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val png = udf((id: Long, dark: Boolean, gray: Boolean) =>
      graft.llm.Multimodal.fixturePngQuality(id, dark, gray))
    writeMediaFixture(s, llm143Fixture, dir, "llm143",
      Tables.documents(s, dir).select(col("doc_id"),
        (col("doc_id") % 6 === 0).as("dk"),
        (col("doc_id") % 9 === 0).as("gy")),
      "doc_id", png(col("doc_id"), col("dk"), col("gy")))
  }

  /** IMAGE QUALITY GATE (Multimodal.imageQualityQ) — the vision-
    * corpus curation stage: under-exposure (integer BT.601 luma),
    * contrast collapse (scaled integer variance n·ΣL² − (ΣL)²), and
    * grayscale detection, per source. Fixture plants dark frames
    * (every channel ÷8, doc_id%6) and grayscale frames (all channels
    * = red formula, %9) as pure integer overrides of the lossless
    * PNG pixel formula — the REAL ImageIO decode must reproduce every
    * channel value, and the oracle replays the per-pixel census.
    * 100 TB shape: the decode+census UDF sits at the codec seam,
    * image bytes die at the scan, and (source, four ints)/image is
    * all that reaches the exchange. */
  private def llm143 = Q("llm143_image_quality",
    (s, dir) => {
      val probe = udf { (bytes: Array[Byte]) =>
        graft.llm.Multimodal.imageQualityQ(bytes)
          .map { case (n, sl, sl2, g) => Array(n, sl, sl2, g) }
          .getOrElse(Array.empty[Long])
      }
      s.read.parquet(llm143In(s, dir))
        .join(Tables.documents(s, dir).select(col("doc_id"), col("source")), "doc_id")
        .select(col("source"), probe(col("media")).as("q"))
        .where(size(col("q")) === 4)
        .select(col("source"),
          element_at(col("q"), 1).as("n"),
          expr("element_at(q, 2) DIV element_at(q, 1)").as("mean_luma"),
          (element_at(col("q"), 1) * element_at(col("q"), 3) -
            element_at(col("q"), 2) * element_at(col("q"), 2)).as("var_scaled"),
          (element_at(col("q"), 4) === element_at(col("q"), 1)).as("is_gray"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_images"),
          sum(when(col("mean_luma") < 48, 1L).otherwise(0L)).as("dark"),
          sum(when(col("is_gray"), 1L).otherwise(0L)).as("grayscale"),
          sum(when(col("var_scaled") < 100000000L, 1L).otherwise(0L)).as("low_contrast"),
          expr("sum(mean_luma * n) DIV sum(n)").as("mean_luma"))
        .orderBy(col("source"))
    },
    Some("""WITH px AS (
           |  SELECT d.doc_id, d.source,
           |    CASE WHEN d.doc_id % 6 = 0
           |      THEN (CASE WHEN d.doc_id % 9 = 0
           |              THEN (d.doc_id * 31 + x * 7 + y * 13) % 256
           |              ELSE (d.doc_id * 31 + x * 7 + y * 13) % 256 END) // 8
           |      ELSE (d.doc_id * 31 + x * 7 + y * 13) % 256 END AS r,
           |    CASE WHEN d.doc_id % 9 = 0
           |      THEN CASE WHEN d.doc_id % 6 = 0
           |             THEN ((d.doc_id * 31 + x * 7 + y * 13) % 256) // 8
           |             ELSE (d.doc_id * 31 + x * 7 + y * 13) % 256 END
           |      ELSE CASE WHEN d.doc_id % 6 = 0
           |             THEN ((d.doc_id * 17 + x * 11 + y * 3) % 256) // 8
           |             ELSE (d.doc_id * 17 + x * 11 + y * 3) % 256 END END AS g,
           |    CASE WHEN d.doc_id % 9 = 0
           |      THEN CASE WHEN d.doc_id % 6 = 0
           |             THEN ((d.doc_id * 31 + x * 7 + y * 13) % 256) // 8
           |             ELSE (d.doc_id * 31 + x * 7 + y * 13) % 256 END
           |      ELSE CASE WHEN d.doc_id % 6 = 0
           |             THEN ((d.doc_id * 23 + x * 5 + y * 19) % 256) // 8
           |             ELSE (d.doc_id * 23 + x * 5 + y * 19) % 256 END END AS b
           |  FROM documents d
           |  CROSS JOIN generate_series(0, 23) gx(x)
           |  CROSS JOIN generate_series(0, 15) gy(y)),
           |lm AS (
           |  SELECT doc_id, source, (299 * r + 587 * g + 114 * b) // 1000 AS l,
           |         CASE WHEN r = g AND g = b THEN 1 ELSE 0 END AS isg
           |  FROM px),
           |per AS (
           |  SELECT doc_id, source, count(*) AS n,
           |    CAST(sum(l) // count(*) AS BIGINT) AS mean_luma,
           |    CAST(count(*) * sum(l * l) - sum(l) * sum(l) AS BIGINT) AS var_scaled,
           |    sum(isg) = count(*) AS is_gray
           |  FROM lm GROUP BY 1, 2)
           |SELECT source, count(*) AS n_images,
           |  CAST(sum(CASE WHEN mean_luma < 48 THEN 1 ELSE 0 END) AS BIGINT) AS dark,
           |  CAST(sum(CASE WHEN is_gray THEN 1 ELSE 0 END) AS BIGINT) AS grayscale,
           |  CAST(sum(CASE WHEN var_scaled < 100000000 THEN 1 ELSE 0 END) AS BIGINT) AS low_contrast,
           |  CAST(sum(mean_luma * n) // sum(n) AS BIGINT) AS mean_luma
           |FROM per GROUP BY source ORDER BY source""".stripMargin),
    prepare = Some((s, dir) => { llm143In(s, dir); () }))

  private val llm142Fixture = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def llm142In(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val wav = udf((id: Long, silence: Boolean, clip: Boolean) =>
      graft.llm.Multimodal.fixtureWavQuality(id, silence, clip))
    val d = Tables.documents(s, dir).select(col("doc_id"))
    writeMediaFixture(s, llm142Fixture, dir, "llm142",
      d.select(col("doc_id"),
        (col("doc_id") % 5 === 0).as("sil"), (col("doc_id") % 7 === 0).as("clp")),
      "doc_id", wav(col("doc_id"), col("sil"), col("clp")))
  }

  /** AUDIO QUALITY GATE (Multimodal.audioQualityQ) — the speech-
    * corpus curation stage: silence fraction (dead air, truncated
    * takes), clipping fraction (gain damage), integer loudness.
    * Fixture plants 25% dead air on doc_id%5 and 5% full-scale
    * clipping on %7 via pure integer overrides of the WAV formula
    * (PCM is lossless — the REAL javax.sound decode must hand back
    * exactly those samples, and the oracle replays every one).
    * Thresholds: silent = |v| < 256 (natural uniform samples sit at
    * ~0.7% baseline), clip = |v| >= 32700 (~0.2% baseline); gates at
    * 20% / 2% flag exactly the plants. 100 TB shape: the decode+count
    * UDF sits at the codec seam, media bytes die at the scan, and
    * (source, four ints) per clip is all that reaches the exchange. */
  private def llm142 = Q("llm142_audio_quality",
    (s, dir) => {
      val probe = udf { (bytes: Array[Byte]) =>
        graft.llm.Multimodal.audioQualityQ(bytes, 256L, 32700L)
          .map { case (n, sil, clp, sum) => Array(n, sil, clp, sum) }
          .getOrElse(Array.empty[Long])
      }
      // media store carries (doc_id, media); source comes from the
      // metadata table — the usual media-lake split
      s.read.parquet(llm142In(s, dir))
        .join(Tables.documents(s, dir).select(col("doc_id"), col("source")), "doc_id")
        .select(col("source"), probe(col("media")).as("q"))
        .where(size(col("q")) === 4)
        .select(col("source"),
          element_at(col("q"), 1).as("n"),
          expr("element_at(q, 2) * 100 DIV element_at(q, 1)").as("sil_pct"),
          expr("element_at(q, 3) * 100 DIV element_at(q, 1)").as("clip_pct"),
          element_at(col("q"), 4).as("sum_abs"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_clips"),
          sum(when(col("sil_pct") >= 20, 1L).otherwise(0L)).as("silent_heavy"),
          sum(when(col("clip_pct") >= 2, 1L).otherwise(0L)).as("clipped"),
          expr("sum(sum_abs) DIV sum(n)").as("mean_level"))
        .orderBy(col("source"))
    },
    Some("""WITH takes AS (
           |  SELECT doc_id, source, doc_id % 5 = 0 AS sil, doc_id % 7 = 0 AS clp
           |  FROM documents),
           |sm AS (
           |  SELECT t.doc_id, t.source,
           |    CASE WHEN t.sil AND i >= 500 AND i < 1000 THEN 0
           |         WHEN t.clp AND i >= 1500 AND i < 1600 THEN
           |           CASE WHEN (t.doc_id * 7919 + i * 104729) % 65536 - 32768 >= 0
           |                THEN 32767 ELSE -32768 END
           |         ELSE (t.doc_id * 7919 + i * 104729) % 65536 - 32768 END AS v
           |  FROM takes t CROSS JOIN generate_series(0, 1999) g(i)),
           |per AS (
           |  SELECT doc_id, source, count(*) AS n,
           |    CAST(sum(CASE WHEN abs(v) < 256 THEN 1 ELSE 0 END) * 100 // count(*) AS BIGINT) AS sil_pct,
           |    CAST(sum(CASE WHEN abs(v) >= 32700 THEN 1 ELSE 0 END) * 100 // count(*) AS BIGINT) AS clip_pct,
           |    CAST(sum(abs(v)) AS BIGINT) AS sum_abs
           |  FROM sm GROUP BY 1, 2)
           |SELECT source, count(*) AS n_clips,
           |  CAST(sum(CASE WHEN sil_pct >= 20 THEN 1 ELSE 0 END) AS BIGINT) AS silent_heavy,
           |  CAST(sum(CASE WHEN clip_pct >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS clipped,
           |  CAST(sum(sum_abs) // sum(n) AS BIGINT) AS mean_level
           |FROM per GROUP BY source ORDER BY source""".stripMargin),
    prepare = Some((s, dir) => { llm142In(s, dir); () }))

  /** DEDUP RETENTION MATRIX (Dedup.retentionMatrix) — when duplicate
    * clusters resolve by source priority, WHICH sources lose docs TO
    * which: the attribution diagnostic behind "keep the most trusted
    * copy" (losing to a peer = mirror/scrape signature; losing to
    * itself = intra-source duplication). Fixture: doc_id%6 docs
    * collapse onto 5 shared templates (cross-source clusters);
    * priority = (3·srcnum+1) mod 20 — a deterministic scramble, so
    * the winner is decided by priority, not name order. The argmin
    * rides min(struct(prio, id, src)) — one row per cluster on the
    * exchange, never the membership. */
  private def llm141 = Q("llm141_retention_matrix",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("source"),
        when(col("doc_id") % 6 === 0,
          concat(lit("shared template "), col("doc_id") % 5))
          .otherwise(col("text")).as("t"))
        .withColumn("prio",
          (substring(col("source"), 4, 10).cast("int") * 3 + 1) % 20)
      graft.llm.Dedup.retentionMatrix(d, col("doc_id"),
          Portable.hash64(col("t")), col("source"), col("prio"))
        .orderBy(col("loser_source"), col("winner_source"))
    },
    Some(s"""WITH d AS (
            |  SELECT doc_id, source,
            |    CASE WHEN doc_id % 6 = 0 THEN 'shared template ' || doc_id % 5
            |         ELSE text END AS t
            |  FROM documents),
            |k AS (
            |  SELECT doc_id, source, ${Portable.duckHash64("t")} AS key,
            |    (3 * CAST(substr(source, 4) AS INT) + 1) % 20 AS prio
            |  FROM d),
            |w AS (
            |  SELECT key, min(struct_pack(p := prio, i := doc_id, s := source)) AS win
            |  FROM k GROUP BY key)
            |SELECT k.source AS loser_source, w.win.s AS winner_source,
            |       count(*) AS n_dropped
            |FROM k JOIN w USING (key)
            |WHERE k.doc_id <> w.win.i
            |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** SFT CONVERSATION VALIDATION (Sft.validateConversations) — the
    * structural gate before chat-template rendering: role-alternation
    * breaks, whitespace-only turns, template special tokens leaked
    * into content, and dangling user turns all corrupt the loss mask
    * (llm56's renderChatTemplate contract). Fixture builds 2–4-turn
    * conversations from doc token slices and plants each violation
    * deterministically: doc_id%7 repeats a role, %11 blanks a turn,
    * %13 leaks `<|end|>` into content; odd turn counts end on a user
    * turn structurally. 100 TB shape: all checks are array algebra on
    * the conversation column in the scan; one hash aggregate of
    * (source, five bools)/conversation. */
  private def llm140 = Q("llm140_sft_validation",
    (s, dir) => {
      import graft.llm.Sft
      val base = Tables.documents(s, dir).select(col("doc_id"), col("source"),
        Dedup.tokens(col("text")).as("tk"), ((col("doc_id") % 3) + 2).as("nt"))
      def role(t: Int): org.apache.spark.sql.Column = {
        val r = lit(if (t % 2 == 1) "user" else "assistant")
        if (t == 2) when(col("doc_id") % 7 === 0, "user").otherwise(r) else r
      }
      def content(t: Int): org.apache.spark.sql.Column = {
        val b = array_join(slice(col("tk"), lit(1 + 5 * (t - 1)), lit(5)), " ")
        val withLeak =
          if (t == 1) concat(b, when(col("doc_id") % 13 === 0, " <|end|>").otherwise(""))
          else b
        if (t == 2) when(col("doc_id") % 11 === 0, " ").otherwise(withLeak)
        else withLeak
      }
      def turn(t: Int): org.apache.spark.sql.Column =
        when(col("nt") >= t,
          struct(role(t).as("role"), content(t).as("content")))
      val conv = base.select(col("source"),
        filter(array(turn(1), turn(2), turn(3), turn(4)),
          m => m.isNotNull).as("conv"))
      Sft.validateConversations(conv, col("source"), col("conv"))
        .orderBy(col("source"))
    },
    Some("""WITH tk AS (
           |  SELECT doc_id, source,
           |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS tk,
           |    2 + doc_id % 3 AS nt
           |  FROM documents),
           |conv AS (
           |  SELECT doc_id, source,
           |    list_transform(range(1, nt + 1), t -> {
           |      'role': CASE WHEN doc_id % 7 = 0 AND t = 2 THEN 'user'
           |                   WHEN t % 2 = 1 THEN 'user' ELSE 'assistant' END,
           |      'content': CASE WHEN doc_id % 11 = 0 AND t = 2 THEN ' '
           |                      -- array_to_string([]) is NULL in DuckDB; Spark's
           |                      -- array_join([]) is '' — coalesce to match
           |                      ELSE coalesce(array_to_string(tk[(1 + 5*(t-1)):(5*t)], ' '), '') ||
           |                           CASE WHEN doc_id % 13 = 0 AND t = 1 THEN ' <|end|>' ELSE '' END
           |                 END}) AS conv
           |  FROM tk),
           |v AS (
           |  SELECT source,
           |    len(conv) > 0 AND conv[1].role = 'user' AND
           |      list_bool_and(list_transform(range(1, len(conv)),
           |        i -> conv[i].role <> conv[i + 1].role)) AS ok_alt,
           |    NOT list_bool_or(list_transform(conv, m -> len(trim(m.content)) = 0)) AS ok_ne,
           |    NOT list_bool_or(list_transform(conv, m -> contains(m.content, '<|'))) AS ok_sp,
           |    len(conv) > 0 AND conv[len(conv)].role = 'assistant' AS ends_a
           |  FROM conv)
           |SELECT source, count(*) AS n_convs,
           |  CAST(sum(CASE WHEN NOT ok_alt THEN 1 ELSE 0 END) AS BIGINT) AS bad_alt,
           |  CAST(sum(CASE WHEN NOT ok_ne THEN 1 ELSE 0 END) AS BIGINT) AS bad_empty,
           |  CAST(sum(CASE WHEN NOT ok_sp THEN 1 ELSE 0 END) AS BIGINT) AS bad_special,
           |  CAST(sum(CASE WHEN NOT ends_a THEN 1 ELSE 0 END) AS BIGINT) AS ends_user,
           |  CAST(sum(CASE WHEN ok_alt AND ok_ne AND ok_sp AND ends_a THEN 1 ELSE 0 END) AS BIGINT) AS valid
           |FROM v GROUP BY source ORDER BY source""".stripMargin))

  /** EMBEDDING COVARIANCE TOP PAIRS (functions.VecOuterSum +
    * Similarity.covarianceTopPairs) — the PCA/whitening/OPQ
    * preprocessing read via a native one-pass second-moment
    * aggregate: the corpus reduces to ONE fixed ~17 KB buffer
    * (n, Σq_i, upper-triangle Σq_iq_j), so scaled covariance
    * c_ij = n·Σq_iq_j − Σq_i·Σq_j derives integer-exactly with no
    * per-vector pair explosion (the explode path would ship 2080
    * rows per vector). The oracle computes the same integers the
    * brute way — unnest (i,j) over every vector — so the native
    * buffer's layout, merge, and triangle indexing are all
    * value-checked. */
  private def llm139 = Q("llm139_embedding_covariance",
    (s, dir) => {
      graft.llm.Similarity.covarianceTopPairs(
          Tables.embeddings(s, dir), col("embedding"), d = 64, topK = 15)
        .orderBy(abs(col("cov_scaled")).desc, col("i"), col("j"))
    },
    Some("""WITH q AS (
           |  SELECT vec_id, list_transform(embedding,
           |    x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS q
           |  FROM embeddings),
           |nn AS (SELECT count(*) AS n FROM q),
           |s AS (SELECT i, CAST(sum(q[i]) AS BIGINT) AS s
           |      FROM q CROSS JOIN generate_series(1, 64) g(i) GROUP BY i),
           |p AS (SELECT i, j, CAST(sum(q[i] * q[j]) AS BIGINT) AS p
           |      FROM q CROSS JOIN generate_series(1, 64) gi(i)
           |                   CROSS JOIN generate_series(1, 64) gj(j)
           |      WHERE j >= i GROUP BY i, j),
           |c AS (
           |  SELECT p.i - 1 AS i, p.j - 1 AS j,
           |    n * p.p - si.s * sj.s AS cov_scaled,
           |    n * pii.p - si.s * si.s AS var_i,
           |    n * pjj.p - sj.s * sj.s AS var_j
           |  FROM p
           |  JOIN s si ON si.i = p.i
           |  JOIN s sj ON sj.i = p.j
           |  JOIN p pii ON pii.i = p.i AND pii.j = p.i
           |  JOIN p pjj ON pjj.i = p.j AND pjj.j = p.j
           |  CROSS JOIN nn
           |  WHERE p.j > p.i)
           |SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           |       cov_scaled, var_i, var_j
           |FROM c ORDER BY abs(cov_scaled) DESC, i, j LIMIT 15""".stripMargin))

  /** HTML TABLE EXTRACTION (Html.extractTables) — the structured-data
    * seam table-QA / table-grounding corpora mine from crawl HTML:
    * every <table> parsed to rows of tag-stripped cell texts. Fixture
    * embeds a deterministic table per doc (2+doc_id%3 rows ×
    * 2+doc_id%2 cols, header row in <th>, cell (r,c) = v(doc_id+
    * 7r+3c mod 100), attribute noise on the table tag) inside the
    * usual page skeleton; the oracle regenerates the cell matrix from
    * the formula, so the REAL nested regex parse must reproduce every
    * cell, the row/col counts, and the row-major content hash.
    * 100 TB shape: one scan projection (nested extract_all on
    * table/row slices), output rows are (doc, ints, 8-byte hash). */
  private def llm138 = Q("llm138_table_extract",
    (s, dir) => {
      import graft.llm.Html
      def cell(r: Int, c: Int) =
        concat(lit("v"), (col("doc_id") + lit(7 * r + 3 * c)) % 100)
      def cellHtml(r: Int, c: Int) = {
        val tag = if (r == 0) "th" else "td"
        when((col("doc_id") % 2) + 2 > c,
          concat(lit(s"<$tag>"), cell(r, c), lit(s"</$tag>"))).otherwise("")
      }
      def rowHtml(r: Int) =
        when((col("doc_id") % 3) + 2 > r,
          concat(lit("<tr>"), cellHtml(r, 0), cellHtml(r, 1), cellHtml(r, 2),
            lit("</tr>"))).otherwise("")
      val page = Tables.documents(s, dir).select(col("doc_id"),
        concat(lit("<html><body><p>"), col("text"),
          lit("</p><table class=\"data\" border=\"1\">"),
          rowHtml(0), rowHtml(1), rowHtml(2), rowHtml(3),
          lit("</table></body></html>")).as("html"))
      page.select(col("doc_id"),
          posexplode(Html.extractTables(col("html"))).as(Seq("table_idx", "tbl")))
        .select(col("doc_id"), col("table_idx"),
          size(col("tbl")).cast("long").as("n_rows"),
          array_max(transform(col("tbl"), r => size(r))).cast("long").as("n_cols"),
          aggregate(transform(col("tbl"), r => size(r)), lit(0L),
            (a, x) => a + x).as("n_cells"),
          Portable.hash64(array_join(flatten(col("tbl")), "\u001f")).as("cells_h"))
        .orderBy(col("doc_id"), col("table_idx"))
    },
    Some(s"""WITH g AS (
            |  SELECT doc_id, 2 + doc_id % 3 AS nr, 2 + doc_id % 2 AS nc
            |  FROM documents),
            |cells AS (
            |  SELECT doc_id, nr, nc,
            |    flatten(list_transform(range(0, nr), r ->
            |      list_transform(range(0, nc), c ->
            |        'v' || (doc_id + 7*r + 3*c) % 100))) AS cl
            |  FROM g)
            |SELECT doc_id, 0 AS table_idx, CAST(nr AS BIGINT) AS n_rows,
            |  CAST(nc AS BIGINT) AS n_cols, CAST(nr * nc AS BIGINT) AS n_cells,
            |  ${Portable.duckHash64("array_to_string(cl, chr(31))")} AS cells_h
            |FROM cells ORDER BY doc_id, table_idx""".stripMargin))

  /** GENERATION-LOOP DEGENERACY AUDIT (TextAnalysis.degeneracyAudit)
    * — the synthetic-data gate: per doc, the max fraction of tokens
    * equal to the token p positions earlier (p=1..4) catches looped
    * generations; per source, distinct-bigram diversity catches
    * set-level mode collapse. Fixture plants a period-2 loop
    * (" spam ham"×60) on doc_id%10 and a period-1 loop (" buy"×80)
    * on %13 — sources src0/src10 (whose doc ids are all ≡0 mod 10)
    * must flag every doc, others only their %13 members, and the
    * argmax must report period 1 for the buy-loop docs. 100 TB
    * shape: loop stats are one codegen projection + one hash agg;
    * the diversity leg explodes 8-byte gram hashes only. */
  private def llm137 = Q("llm137_degeneracy_audit",
    (s, dir) => {
      import graft.llm.TextAnalysis
      val d = Tables.documents(s, dir).select(col("doc_id"), col("source"),
        concat(col("text"),
          when(col("doc_id") % 10 === 0, concat_ws("", (1 to 60).map(_ => lit(" spam ham")): _*)).otherwise(""),
          when(col("doc_id") % 13 === 0, concat_ws("", (1 to 80).map(_ => lit(" buy")): _*)).otherwise(""))
          .as("t"))
      TextAnalysis.degeneracyAudit(d, col("source"), col("t"),
          maxPeriod = 4, threshold = 30)
        .orderBy(col("source"))
    },
    Some(s"""WITH d AS (
            |  SELECT doc_id, source,
            |    text ||
            |    CASE WHEN doc_id % 10 = 0 THEN repeat(' spam ham', 60) ELSE '' END ||
            |    CASE WHEN doc_id % 13 = 0 THEN repeat(' buy', 80) ELSE '' END AS t
            |  FROM documents),
            |tk AS (
            |  SELECT doc_id, source,
            |    list_filter(string_split_regex(t, '\\s+'), x -> len(x) > 0) AS tk
            |  FROM d),
            |lp AS (
            |  SELECT doc_id, source, len(tk) AS n,
            |    [CASE WHEN len(tk) > p THEN
            |       CAST(list_sum(list_transform(range(1, len(tk) - p + 1),
            |         i -> CASE WHEN tk[i + p] = tk[i] THEN 1 ELSE 0 END)) AS BIGINT)
            |         * 100 // (len(tk) - p)
            |     ELSE 0 END
            |     for p in [1, 2, 3, 4]] AS lps
            |  FROM tk),
            |best AS (
            |  SELECT doc_id, source,
            |    greatest(lps[1], lps[2], lps[3], lps[4]) AS loop_pct,
            |    CASE WHEN lps[1] >= lps[2] AND lps[1] >= lps[3] AND lps[1] >= lps[4] THEN 1
            |         WHEN lps[2] >= lps[3] AND lps[2] >= lps[4] THEN 2
            |         WHEN lps[3] >= lps[4] THEN 3 ELSE 4 END AS best_period
            |  FROM lp),
            |la AS (
            |  SELECT source, count(*) AS n_docs,
            |    CAST(sum(CASE WHEN loop_pct >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS degenerate,
            |    CAST(sum(CASE WHEN loop_pct >= 30 AND best_period = 1 THEN 1 ELSE 0 END) AS BIGINT) AS deg_p1,
            |    CAST(max(loop_pct) AS BIGINT) AS max_loop_pct
            |  FROM best GROUP BY source),
            |grams AS (
            |  SELECT source, ${Portable.duckHash64("g")} AS h
            |  FROM (SELECT source, unnest(list_transform(range(1, len(tk)),
            |          i -> tk[i] || ' ' || tk[i + 1])) AS g FROM tk)),
            |gs AS (
            |  SELECT source, count(DISTINCT h) * 100 // count(*) AS distinct2_pct
            |  FROM grams GROUP BY source)
            |SELECT source, n_docs, degenerate, deg_p1, max_loop_pct,
            |  coalesce(distinct2_pct, 0) AS distinct2_pct
            |FROM la LEFT JOIN gs USING (source) ORDER BY source""".stripMargin))

  /** LUHN-VALIDATED CARD AUDIT (Pii.cardAudit) — payment-card
    * exposure rates per source, with the checksum that separates a
    * real card shape from digit noise (a bare digit-run regex over
    * 100 TB would flag timestamps and ids constantly). Fixture
    * plants the public test numbers: doc_id%8 a spaced Visa test
    * number (Luhn-valid), %12 the same with a broken check digit
    * (must count as candidate, fail validation), %18 a 14-digit
    * Diners test number (valid — exercises variable length). 100 TB
    * shape: one codegen projection (extract/strip/checksum as array
    * algebra where the text sits, candidates rare by construction)
    * into one hash aggregate of (source, three ints) per doc. */
  private def llm136 = Q("llm136_card_audit",
    (s, dir) => {
      import graft.llm.Pii
      val d = Tables.documents(s, dir).select(col("source"),
        concat(col("text"),
          when(col("doc_id") % 8 === 0, " pay 4111 1111 1111 1111 now").otherwise(""),
          when(col("doc_id") % 12 === 0, " card 4111-1111-1111-1112 exp").otherwise(""),
          when(col("doc_id") % 18 === 0, " acct 30569309025904 ok").otherwise(""))
          .as("t"))
      Pii.cardAudit(d, col("source"), col("t"))
        .orderBy(col("source"))
    },
    Some("""WITH d AS (
           |  SELECT source,
           |    text ||
           |    CASE WHEN doc_id % 8 = 0 THEN ' pay 4111 1111 1111 1111 now' ELSE '' END ||
           |    CASE WHEN doc_id % 12 = 0 THEN ' card 4111-1111-1111-1112 exp' ELSE '' END ||
           |    CASE WHEN doc_id % 18 = 0 THEN ' acct 30569309025904 ok' ELSE '' END AS t
           |  FROM documents),
           |cand AS (
           |  SELECT source,
           |    list_filter(
           |      list_transform(
           |        regexp_extract_all(t, '[0-9](?:[0-9 -]{11,23})[0-9]'),
           |        c -> regexp_replace(c, '[ -]', '', 'g')),
           |      c -> length(c) BETWEEN 13 AND 19) AS cands
           |  FROM d),
           |v AS (
           |  SELECT source, len(cands) AS n_cand,
           |    len(list_filter(cands, c ->
           |      list_sum(list_transform(range(1, length(c) + 1), i ->
           |        CASE WHEN (length(c) - i) % 2 = 1
           |          THEN CASE WHEN 2*(ascii(substr(c, i, 1)) - 48) > 9
           |                 THEN 2*(ascii(substr(c, i, 1)) - 48) - 9
           |                 ELSE 2*(ascii(substr(c, i, 1)) - 48) END
           |          ELSE ascii(substr(c, i, 1)) - 48 END)) % 10 = 0)) AS n_valid
           |  FROM cand)
           |SELECT source, count(*) AS n_docs,
           |  CAST(sum(n_cand) AS BIGINT) AS candidates,
           |  CAST(sum(n_valid) AS BIGINT) AS valid_cards,
           |  CAST(sum(n_cand - n_valid) AS BIGINT) AS invalid_cards,
           |  CAST(sum(CASE WHEN n_valid > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_valid
           |FROM v GROUP BY source ORDER BY source""".stripMargin))

  /** HYBRID-RETRIEVAL RRF FUSION (Retrieval.rrfFuse) — reciprocal-
    * rank fusion of a lexical BM25 ranking (llm90's batch machinery)
    * and a semantic cosine ranking (llm03's exact brute-force) over
    * the same 8 queries: each system's top-20 contributes
    * 10⁹ DIV (60+rank) per (query, doc); docs surfacing in BOTH
    * systems float up with no score calibration (ranks are
    * scale-free where BM25 scores and cosines are incomparable).
    * Queries are docs 0–7 (terms 1/3/5 for the lexical side, the
    * doc's aligned embedding for the semantic side). 100 TB shape:
    * corpus cost lives in the upstream rankers (one batch BM25 pass,
    * one broadcast-query ANN pass); the fusion itself is one union +
    * one hash aggregate + a per-query window over ≤ 2k rows/query. */
  private val llm135Slot = new TrackerSlot
  private def llm135 = Q("llm135_rrf_fusion",
    (s, dir) => {
      import graft.llm.{Retrieval, Similarity}
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir)
      val qsrc = d.filter(col("doc_id") < 8)
        .select(col("doc_id").as("qid"), Dedup.tokens(col("text")).as("tk"))
      val queries = qsrc.select(col("qid"),
          explode(array(element_at(col("tk"), 1), element_at(col("tk"), 3),
                        element_at(col("tk"), 5))).as("term"))
        .where(col("term").isNotNull)
      val lex = Retrieval.bm25Batch(d, col("doc_id"), col("text"),
          queries, col("qid"), col("term"), idfMode = Retrieval.OddsIdf,
          tracker = Some(llm135Slot.fresh()))
        .withColumn("rank", row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("score").desc, col("doc_id"))))
        .filter(col("rank") <= 20)
        .select(col("qid"), col("doc_id"), col("rank"))
      val emb = Tables.embeddings(s, dir)
      val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val qv = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val sem = Similarity.bruteForceTopK(corpus, "cid", "cv", qv, "qid", "qv",
          k = 20, exact = true)
        .select(col("qid"), col("cid").as("doc_id"), col("rank"))
      Retrieval.rrfFuse(Seq(lex, sem), kConst = 60, topK = 10)
        .orderBy(col("qid"), col("fused_rank"))
    },
    Some("""WITH t AS (SELECT doc_id,
           |              list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS tk
           |            FROM documents),
           |wl AS (SELECT doc_id, tk, len(tk) AS dl FROM t),
           |stats AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM wl),
           |q AS (SELECT DISTINCT qid, term FROM (
           |        SELECT doc_id AS qid, unnest([tk[1], tk[3], tk[5]]) AS term
           |        FROM t WHERE doc_id < 8)
           |      WHERE term IS NOT NULL),
           |tf AS (SELECT doc_id, dl, tok, count(*) AS tf
           |       FROM (SELECT doc_id, dl, unnest(tk) AS tok FROM wl)
           |       WHERE tok IN (SELECT term FROM q)
           |       GROUP BY 1, 2, 3),
           |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
           |sq AS (SELECT q.qid, tf.doc_id,
           |        CAST(floor(
           |          (((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
           |           * ((CAST(tf AS DOUBLE) * (1.2 + 1.0))
           |              / (CAST(tf AS DOUBLE)
           |                 + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
           |                                         / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))))
           |          * 1e6) AS BIGINT) AS sq
           |      FROM tf JOIN dfq USING (tok) JOIN q ON q.term = tf.tok CROSS JOIN stats),
           |lagg AS (SELECT qid, doc_id, CAST(sum(sq) AS DOUBLE) / 1e6 AS score
           |        FROM sq GROUP BY 1, 2),
           |lex AS (SELECT qid, doc_id, rank FROM (
           |         SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
           |           ORDER BY score DESC, doc_id) AS rank FROM lagg)
           |        WHERE rank <= 20),
           |qv AS (SELECT vec_id AS qid, embedding AS v FROM embeddings WHERE vec_id < 8),
           |cv AS (SELECT vec_id AS cid, embedding AS v FROM embeddings),
           |d AS (SELECT qid, cid,
           |        sum(CAST(floor(CAST(q.v[i] AS DOUBLE) * 1e6) AS BIGINT)
           |          * CAST(floor(CAST(c.v[i] AS DOUBLE) * 1e6) AS BIGINT)) AS dot,
           |        sum(CAST(floor(CAST(q.v[i] AS DOUBLE) * 1e6) AS BIGINT)
           |          * CAST(floor(CAST(q.v[i] AS DOUBLE) * 1e6) AS BIGINT)) AS nq,
           |        sum(CAST(floor(CAST(c.v[i] AS DOUBLE) * 1e6) AS BIGINT)
           |          * CAST(floor(CAST(c.v[i] AS DOUBLE) * 1e6) AS BIGINT)) AS nc
           |      FROM qv q CROSS JOIN cv c CROSS JOIN generate_series(1, 64) AS g(i)
           |      WHERE cid <> qid GROUP BY qid, cid),
           |sem AS (SELECT qid, cid AS doc_id, rank FROM (
           |         SELECT qid, cid,
           |           CAST(row_number() OVER (PARTITION BY qid ORDER BY
           |             CAST(dot AS DOUBLE) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(nc AS DOUBLE))) DESC,
           |             cid) AS INT) AS rank FROM d)
           |        WHERE rank <= 20),
           |uni AS (SELECT * FROM lex UNION ALL SELECT * FROM sem),
           |fused AS (SELECT qid, doc_id, count(*) AS n_systems,
           |            CAST(sum(1000000000 // (60 + rank)) AS BIGINT) AS rrf_scaled
           |          FROM uni GROUP BY 1, 2)
           |SELECT qid, doc_id, n_systems, rrf_scaled,
           |       CAST(fused_rank AS INT) AS fused_rank FROM (
           |  SELECT *, row_number() OVER (PARTITION BY qid
           |    ORDER BY rrf_scaled DESC, doc_id) AS fused_rank FROM fused)
           |WHERE fused_rank <= 10 ORDER BY qid, fused_rank""".stripMargin),
    cleanup = Some(_ => llm135Slot.drain()))

  /** ENCODING-DAMAGE (mojibake) AUDIT (TextAnalysis.encodingAudit) —
    * the transcoding-debris gate: U+FFFD replacement chars, C1
    * control codepoints (cp1252 bytes mis-promoted), and `Ã`+
    * continuation pairs (UTF-8 read as latin-1, the classic
    * double-encode). Fixture plants each signature deterministically:
    * doc_id%9 a replacement char, %14 a double-encoded `Ã©`, %17 a
    * C1 U+0085. 100 TB shape: one codegen projection (three
    * length-difference / extract-all counters on the text where it
    * sits) into one hash aggregate; (source, four ints) per doc on
    * the exchange. */
  private def llm134 = Q("llm134_mojibake_audit",
    (s, dir) => {
      import graft.llm.TextAnalysis
      val d = Tables.documents(s, dir).select(col("source"),
        concat(col("text"),
          when(col("doc_id") % 9 === 0, " caf\uFFFD menu").otherwise(""),
          when(col("doc_id") % 14 === 0, " caf\u00C3\u00A9 again").otherwise(""),
          when(col("doc_id") % 17 === 0, " broken\u0085line").otherwise(""))
          .as("t"))
      TextAnalysis.encodingAudit(d, col("source"), col("t"))
        .orderBy(col("source"))
    },
    Some("""WITH d AS (
           |  SELECT source,
           |    text ||
           |    CASE WHEN doc_id % 9 = 0 THEN ' caf' || chr(65533) || ' menu' ELSE '' END ||
           |    CASE WHEN doc_id % 14 = 0 THEN ' caf' || chr(195) || chr(169) || ' again' ELSE '' END ||
           |    CASE WHEN doc_id % 17 = 0 THEN ' broken' || chr(133) || 'line' ELSE '' END AS t
           |  FROM documents),
           |m AS (
           |  SELECT source,
           |    length(t) - length(replace(t, chr(65533), '')) AS repl,
           |    length(t) - length(regexp_replace(t, '[\x80-\x9F]', '', 'g')) AS c1,
           |    len(regexp_extract_all(t, chr(195) || '[\xA0-\xBF]')) AS dbl
           |  FROM d)
           |SELECT source, count(*) AS n_docs,
           |  CAST(sum(CASE WHEN repl + c1 + dbl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS damaged,
           |  CAST(sum(repl) AS BIGINT) AS repl_chars,
           |  CAST(sum(c1) AS BIGINT) AS c1_chars,
           |  CAST(sum(dbl) AS BIGINT) AS dbl_seqs,
           |  CAST(sum(CASE WHEN repl + c1 + dbl > 0 THEN 1 ELSE 0 END) * 100 // count(*) AS BIGINT) AS damaged_pct
           |FROM m GROUP BY source ORDER BY source""".stripMargin))

  /** llm132's reference license texts — genericized boilerplate in
    * the three families corpus curation keys on (MIT-flavored
    * permissive, GPL-flavored copyleft, CC-flavored attribution). */
  private val Llm132P = "permission is hereby granted free of charge to any person obtaining a copy of this software to deal in the software without restriction including the rights to use copy modify and distribute"
  private val Llm132C = "this program is free software you can redistribute it and or modify it under the terms of the general public license as published by the free software foundation either version three or any later version"
  private val Llm132A = "this work is licensed under a creative commons attribution license you are free to share and adapt the material provided appropriate credit is given and any changes are indicated"

  /** LICENSE DETECTION (Licenses.detect) — tag each document with the
    * reference license whose boilerplate it carries, by winnowing-
    * fingerprint CONTAINMENT against a broadcast reference set (the
    * stage The Stack-style permissive-corpus builds run first).
    * Fixture plants full license texts (doc_id%6 permissive, %10
    * copyleft, %15 attribution) and a HALF-license (%13, first 95
    * chars of the permissive text) — full plants must detect at 100%
    * containment, the half at its deterministic partial value, and
    * multi-planted docs resolve by the (containment desc, license
    * asc) argmax. 100 TB shape: text dies in the gram projection,
    * the candidate join broadcasts the kilobyte reference
    * fingerprint frame, and only true fingerprint hits reach the
    * aggregation exchange. */
  private def llm132 = Q("llm132_license_detect",
    (s, dir) => {
      import graft.llm.{GramIndex, Licenses}
      val sfx = concat(
        when(col("doc_id") % 6 === 0, " " + Llm132P).otherwise(""),
        when(col("doc_id") % 10 === 0, " " + Llm132C).otherwise(""),
        when(col("doc_id") % 15 === 0, " " + Llm132A).otherwise(""),
        when(col("doc_id") % 13 === 0, " " + Llm132P.take(95)).otherwise(""))
      val d = Tables.documents(s, dir).select(col("doc_id"),
        concat(col("text"), sfx).as("text"))
      // probe grams derived from the shared index (GramIndex): the
      // planted license suffixes append as one junction recompute per
      // doc; the corpus is never re-hashed per query
      val probe = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        .join(GramIndex.documentsGramArrays(s, dir, 16), "doc_id")
        .select(col("doc_id"),
          GramIndex.withSuffixGrams(col("gh"), col("text"), col("len"), sfx, 16).as("gh"),
          (col("len") + length(sfx)).as("__mlen"))
        .where(col("__mlen") >= 16)
        .select(col("doc_id"), explode(col("gh")).as("h"))
      Licenses.detect(d, col("doc_id"), col("text"),
          Seq("attribution" -> Llm132A, "copyleft" -> Llm132C,
              "permissive" -> Llm132P),
          k = 16, w = 8, minPct = 25, probeGrams = Some(probe))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH refs AS (
            |  SELECT * FROM (VALUES ('attribution', '$Llm132A'),
            |    ('copyleft', '$Llm132C'), ('permissive', '$Llm132P')) r(license, ltext)),
            |d AS (
            |  SELECT doc_id,
            |    text ||
            |    CASE WHEN doc_id % 6 = 0 THEN ' $Llm132P' ELSE '' END ||
            |    CASE WHEN doc_id % 10 = 0 THEN ' $Llm132C' ELSE '' END ||
            |    CASE WHEN doc_id % 15 = 0 THEN ' $Llm132A' ELSE '' END ||
            |    CASE WHEN doc_id % 13 = 0 THEN ' ${Llm132P.take(95)}' ELSE '' END AS text
            |  FROM documents),
            |dph AS (
            |  SELECT doc_id, ${Portable.duckHash64("substr(text, i, 16)")} AS hh
            |  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text) - 15)) AS i
            |        FROM d WHERE length(text) >= 16)),
            |rph AS (
            |  SELECT license, length(ltext) - 15 AS m, i AS p,
            |         ${Portable.duckHash64("substr(ltext, i, 16)")} AS hh
            |  FROM (SELECT license, ltext, unnest(generate_series(1, length(ltext) - 15)) AS i
            |        FROM refs WHERE length(ltext) >= 16)),
            |rwin AS (
            |  SELECT license, hh, unnest(generate_series(greatest(1, p - 7),
            |    least(p, greatest(m - 7, 1)))) AS i
            |  FROM rph),
            |rfp AS (SELECT DISTINCT license, hh FROM
            |  (SELECT license, i, min(hh) AS hh FROM rwin GROUP BY 1,2)),
            |rsz AS (SELECT license, count(*) AS ref_fp FROM rfp GROUP BY 1),
            |sc AS (
            |  SELECT doc_id, license, n_shared, ref_fp,
            |         n_shared * 100 // ref_fp AS containment_pct
            |  FROM (SELECT doc_id, license, count(*) AS n_shared
            |        FROM (SELECT DISTINCT doc_id, license, hh
            |              FROM dph JOIN rfp USING (hh)) GROUP BY 1,2)
            |       JOIN rsz USING (license)
            |  WHERE n_shared * 100 // ref_fp >= 25)
            |SELECT doc_id, license, n_shared, ref_fp, containment_pct FROM (
            |  SELECT *, row_number() OVER (PARTITION BY doc_id
            |    ORDER BY containment_pct DESC, license) AS rk FROM sc)
            |WHERE rk = 1 ORDER BY doc_id""".stripMargin),
    prepare = ensureGramIndex)

  private val Llm129A = "this material is distributed under the creative commons attribution license and may be shared or adapted provided that appropriate credit is given and changes are indicated"
  private val Llm129B = "for more information about our privacy practices and how we handle personal data please review the policy documents published on our official website"

  /** llm128's planted passages — four ~125-char blocks of the
    * boilerplate kinds winnowing exists to catch. */
  private val Llm128P = Seq(
    "permission is hereby granted free of charge to any person obtaining a copy of this software and associated documentation files",
    "the quick brown fox jumps over the lazy dog while the diligent archivist catalogs every scroll in the ancient library basement",
    "unsubscribe from this mailing list at any time by clicking the link below and confirming your address in the following form",
    "this transcript was produced by automatic speech recognition and may contain errors that the editorial team has not reviewed")
  private def Llm128Passages(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(v === 0, lit(Llm128P(0))).when(v === 1, lit(Llm128P(1)))
      .when(v === 2, lit(Llm128P(2))).otherwise(lit(Llm128P(3)))
}
