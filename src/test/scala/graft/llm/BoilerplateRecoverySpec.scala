package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-21 equality pin for [[Dedup.boilerplateShingles]]' recovery
  * pass (llm94): the JVM hot-match scan (XXH64 over utf8 byte slices
  * at code-point boundaries) must reproduce exactly what the old
  * composed form computed — explode every position, `substr`, hash
  * with `xxhash64`, broadcast-join the hot set. The composed reference
  * is replayed inline here over inputs with multi-byte code points,
  * docs shorter than n, and boundary-straddling repeats. */
class BoilerplateRecoverySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    1L -> "SUBSCRIBE NOW and save! café news follows here",
    2L -> "SUBSCRIBE NOW and save! 日本語のテキスト continues",
    3L -> "SUBSCRIBE NOW and save! something else entirely",
    4L -> "tiny",                       // shorter than n → one whole-text gram
    5L -> "tiny",                       // duplicate short doc (df=2 on the whole text)
    6L -> null.asInstanceOf[String],    // null text must be skipped
    7L -> "unique document with no repeated boilerplate at all")

  test("boilerplateShingles equals the composed explode+substr+xxhash64 reference") {
    val n = 12
    val minDf = 2
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.boilerplateShingles(df, col("doc_id"), col("text"), n, minDf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // composed reference: per-doc DISTINCT grams (Spark substr code-point
    // semantics), df count, minDf filter — the pre-round-21 pass shape
    val want = df.where(col("text").isNotNull)
      .select(col("doc_id"), col("text").as("__t"),
        explode(sequence(lit(1), greatest(length(col("text")) - (n - 1), lit(1)))).as("__i"))
      .select(col("doc_id"), col("__t").substr(col("__i"), lit(n)).as("__s"))
      .distinct()
      .groupBy(col("__s")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(got == want)
    assert(got.nonEmpty, "fixture must actually exercise the hot set")
    assert(got.contains("tiny"), "short-doc whole-text gram must survive recovery")
  }

  test("boilerplateMatchesJvm hashes exactly like Spark substr+xxhash64 per position") {
    val s = "café 日本 abc café 日本 abc"
    val n = 6
    val hashes = spark.sql(s"select 1").select(lit(s).as("__t"))
      .select(explode(sequence(lit(1), greatest(length(col("__t")) - (n - 1), lit(1)))).as("__i"),
        col("__t"))
      .select(col("__t").substr(col("__i"), lit(n)).as("__s"))
      .select(col("__s"), xxhash64(col("__s")).as("__h"))
      .collect().map(r => r.getLong(1) -> r.getString(0))
    val hot = scala.collection.immutable.LongMap(hashes.map { case (h, _) => h -> 7L }: _*)
    val got = Dedup.boilerplateMatchesJvm(s, n, hot).toSeq
    // every position must match (the hot map contains all of them), in
    // position order, with the exact substring the composed form produced
    assert(got.map(_._1) == hashes.map(_._2).toSeq)
    assert(got.forall(_._2 == 7L))
  }
}
