package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over embedding columns (ArrayType(FloatType)) —
  * the query-side counterpart of the reference's vector-DB sinks
  * (debezium-server-milvus, debezium-server-qdrant; FloatVector logical
  * type at FlussTypeConverter.java:78-81).
  *
  * Two paths:
  *  - brute-force top-k: broadcast the (small) query set against the
  *    full corpus — one scan, no shuffle of the corpus, WSCG-friendly
  *    zip_with/aggregate arithmetic;
  *  - LSH-bucketed: random-hyperplane signatures bucket the corpus, the
  *    join touches only matching buckets — the 100 TB path.
  */
object Similarity {

  /** Dot product in double — fast path for production use. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
              lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact reproducible cosine: elements are quantized to integers
    * (floor(x * 1e6) — float→double is exact, one deterministic double
    * multiply, floor) so dot products are int64 sums: exact, overflow-
    * safe for |x| ≲ 100 at 64-4096 dims, and independent of
    * accumulation order — any engine reproduces them bit-for-bit. Used
    * by the oracle-checked queries; production uses the double path. */
  private def qint(c: Column): Column =
    floor(c.cast("double") * lit(1000000.0)).cast("long")

  def dotExact(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => qint(x) * qint(y)),
              lit(0L), (acc, x) => acc + x)

  def cosineExact(a: Column, b: Column): Column =
    dotExact(a, b).cast("double") /
      (sqrt(dotExact(a, a).cast("double")) * sqrt(dotExact(b, b).cast("double")))

  /** Brute-force top-k cosine neighbors of each query vector.
    * `queries` is expected to be small — it is broadcast, so the corpus
    * is scanned once with no shuffle before the final per-query top-k
    * (a k-row window over qid). */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     k: Int, exact: Boolean = false): DataFrame = {
    // No rounding: with exact-decimal accumulation the final
    // divide/sqrt are single IEEE ops, identical in any engine —
    // round() implementations are NOT portable (HALF_UP vs x*1e6).
    val sim0 =
      if (exact) cosineExact(col(qvecCol), col(vecCol))
      else cosine(col(qvecCol), col(vecCol))
    val scored = corpus.join(broadcast(queries), col(qidCol) =!= col(idCol))
      .withColumn("sim", sim0)
    val w = Window.partitionBy(col(qidCol)).orderBy(col("sim").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("sim"), col("rank"))
  }

  /** Random-hyperplane LSH signature: `planes` bits, bit i = sign of the
    * dot product with a deterministic pseudo-random hyperplane derived
    * from the portable hash of (plane, dim) — reproducible everywhere,
    * no stored model. Buckets = the packed bit signature. */
  def rhpSignature(vec: Column, dims: Int, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      // hyperplane component h(p,d) in [-1,1): derived from hash64
      val contrib = aggregate(
        zip_with(vec, sequence(lit(0), lit(dims - 1)), (x, d) => {
          val h = graft.functions.Portable.hash64(concat(lit(s"rhp$p:"), d.cast("string")))
          x.cast("double") * (h % 2000001L - 1000000L).cast("double") / 1000000.0
        }),
        lit(0.0), (acc, x) => acc + x)
      when(contrib >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }

  /** Bucketed ANN: join corpus and queries on the LSH bucket, then exact
    * cosine within buckets, top-k per query. Probes only matching
    * buckets — the candidate set shrinks ~2^-planes. */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qidCol: String, qvecCol: String,
              k: Int, dims: Int, planes: Int): DataFrame = {
    val cb = corpus.withColumn("bucket", rhpSignature(col(vecCol), dims, planes))
    val qb = queries.withColumn("bucket", rhpSignature(col(qvecCol), dims, planes))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col(qidCol) =!= col(idCol))
      .withColumn("sim", round(cosine(col(qvecCol), col(vecCol)), 6))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("sim").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("sim"), col("rank"))
  }
}
