package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the memory answer for ANN at corpus
  * scale: a d-dim float vector (d·4 bytes) compresses to M one-byte
  * codes, and query scans touch ONLY the codes.
  *
  * Spark shapes:
  *  - [[seedCodebooks]]: per-subspace codebooks from the k lowest-id
  *    corpus vectors (the repo's deterministic coarse-quantizer
  *    convention — [[Similarity.ivfTopK]], [[Clustering]] init). The
  *    driver hop is k full vectors, a few KB at any corpus size.
  *    (Lloyd refinement per subspace = [[Clustering.kmeansTopics]] on
  *    the sliced column; the seed codebook keeps every engine replay
  *    finite.)
  *  - [[encode]]: M [[graft.functions.NearestCentroid]] passes over
  *    array slices in ONE codegen'd projection — the codebooks ride
  *    the plan as literals; no join, no shuffle, no broadcast table.
  *  - [[adcTopK]]: asymmetric distance computation. The query's
  *    per-(subspace, code) distance table folds into k·M int64 plan
  *    literals, so the scan costs M array lookups + M-1 adds PER ROW
  *    — no float math, no vector access — and top-k plans as
  *    TakeOrderedAndProject (no global sort).
  *
  * All distances are exact int64 sums on the shared `floor(x·10⁶)`
  * lattice, ties break to the lowest code / lowest id — bit-identical
  * in DuckDB, so the oracle replays encode + ADC verbatim.
  */
object Pq {

  /** Per-subspace quantized codebooks: `m` subspaces × `k` codewords
    * × (dims/m) components, codeword c of subspace s = that slice of
    * the c-th lowest-id vector. */
  final case class Codebooks(dims: Int, m: Int, k: Int,
                             books: Seq[Seq[Seq[Long]]]) {
    require(dims % m == 0, s"dims=$dims must divide into m=$m subspaces")
    def sub: Int = dims / m
  }

  def seedCodebooks(corpus: DataFrame, idCol: Column, vecCol: Column,
                    dims: Int, m: Int, k: Int): Codebooks = {
    require(dims % m == 0, s"dims=$dims must divide into m=$m subspaces")
    val sub = dims / m
    val seeds = corpus.select(idCol.as("id"), vecCol.as("vec"))
      .orderBy(col("id")).limit(k)
      .select(col("vec")).collect().map(r => quantize(r.get(0), dims))
    require(seeds.length == k, s"corpus has fewer than k=$k vectors")
    val books = (0 until m).map(s => (0 until k).map(c =>
      seeds(c).slice(s * sub, s * sub + sub)))
    Codebooks(dims, m, k, books)
  }

  /** Add `code_0 … code_{m-1}` int columns. A malformed vector (wrong
    * length / null element) yields null codes — filter downstream. */
  def encode(df: DataFrame, vecCol: Column, cb: Codebooks): DataFrame =
    (0 until cb.m).foldLeft(df) { (d, s) =>
      d.withColumn(s"code_$s",
        graft.functions.NearestCentroid(
          slice(vecCol, s * cb.sub + 1, cb.sub), cb.books(s), cb.sub)
          .getField("cell"))
    }

  /** ADC approximate distance of every encoded row to ONE quantized
    * query vector, as a plan-literal lookup table; returns the `topK`
    * rows as (id, adist), (adist, id)-ordered. */
  def adcTopK(encoded: DataFrame, idCol: Column, queryQ: Seq[Long],
              cb: Codebooks, topK: Int): DataFrame = {
    require(queryQ.length == cb.dims,
      s"query has ${queryQ.length} components, codebooks expect ${cb.dims}")
    // LUT[s][c] = ‖q_s − codeword(s,c)‖² — computed once on the driver
    val lut = (0 until cb.m).map { s =>
      val qs = queryQ.slice(s * cb.sub, s * cb.sub + cb.sub)
      (0 until cb.k).map { c =>
        val cw = cb.books(s)(c)
        qs.indices.foldLeft(0L) { (acc, j) =>
          val diff = qs(j) - cw(j); acc + diff * diff
        }
      }
    }
    val adist = (0 until cb.m).map(s =>
      // element_at over a literal array: codegen'd constant-time lookup
      element_at(array(lut(s).map(lit): _*), col(s"code_$s") + 1))
      .reduce(_ + _)
    encoded
      .filter((0 until cb.m).map(s => col(s"code_$s").isNotNull).reduce(_ && _))
      .select(idCol.as("vec_id"), adist.as("adist"))
      .orderBy(col("adist"), col("vec_id"))
      .limit(topK)
  }

  /** Two-stage ANN: ADC shortlist, then EXACT re-rank — the standard
    * production PQ shape (shortlist recall is the only approximation;
    * the returned order is exact over it). Stage 1 is [[adcTopK]]'s
    * shuffle-free map + TakeOrdered over the 8-byte codes; stage 2
    * touches RAW vectors only for the `shortlist` survivors — a
    * broadcast semi-join (the shortlist is ≤ a few hundred ids no
    * matter the corpus size), then the codegen'd exact quantized
    * cosine ([[graft.functions.QuantizedDot]]) against the
    * plan-literal query and a final ≤shortlist-row sort. At 100 TB the
    * full corpus is read once (codes + id + vector in one scan);
    * vector floats never shuffle — only the shortlist's do. */
  def adcRerankTopK(encoded: DataFrame, idCol: Column, vecCol: Column,
                    query: Seq[Float], cb: Codebooks,
                    shortlist: Int, topK: Int): DataFrame = {
    require(shortlist >= topK, s"shortlist=$shortlist must be >= topK=$topK")
    val queryQ = quantize(query, cb.dims)
    val ids = adcTopK(encoded, idCol, queryQ, cb, shortlist)
      .select(col("vec_id").as("__sid"))
    val qLit = array(query.map(lit(_)): _*)
    encoded.join(broadcast(ids), idCol === col("__sid"), "left_semi")
      .select(idCol.as("vec_id"),
        Similarity.cosineExact(vecCol, qLit).as("sim"))
      // a zero-norm vector's cosine is NaN, which Spark ORDERS ABOVE
      // every real similarity — a degenerate vector surviving the ADC
      // shortlist must not displace real neighbors (a zero-norm QUERY
      // makes every sim NaN and the result empty, the honest answer)
      .filter(!isnan(col("sim")))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(topK)
  }

  private[graft] def quantize(v: Any, dims: Int): Seq[Long] = v match {
    case s: scala.collection.Seq[_] =>
      require(s.length == dims, s"vector has ${s.length} components, want $dims")
      s.iterator.map {
        case f: java.lang.Float => math.floor(f.toDouble * 1e6).toLong
        case d: java.lang.Double => math.floor(d.doubleValue * 1e6).toLong
        case x => throw new IllegalArgumentException(s"non-numeric element $x")
      }.toSeq
    case x => throw new IllegalArgumentException(s"non-array vector column: $x")
  }
}
