package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the sequential-Poisson weighted sample: determinism, per-group
  * k, zero-weight exclusion, and the PPS property (heavier rows win
  * materially more often than light ones under many salts). */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1L to 40L).map(i =>
    // ids 1-20 weight 1, ids 21-40 weight 10
    (i, "g", if (i <= 20) 1L else 10L)).toDF("id", "g", "w")

  test("deterministic: same salt twice is identical; different salt differs") {
    def ids(salt: String) =
      Sampling.weightedSample(rows, col("id"), col("g"), col("w"), k = 5, salt = salt)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids("a") === ids("a"))
    assert(ids("a") !== ids("b")) // 40-choose-5 — collision would be a hash defect
  }

  test("fractional weight column is rejected loudly (round-19 advice)") {
    // the priority truncates the weight to long, so a double weight in
    // (0,1) would silently drop and 1.9 vs 1.0 would tie — require
    // integral instead of diverging quietly
    val frac = rows.withColumn("w", col("w").cast("double"))
    val e = intercept[IllegalArgumentException] {
      Sampling.weightedSample(frac, col("id"), col("g"), col("w"), k = 5)
    }
    assert(e.getMessage.contains("integral weight column"))
  }

  test("per-group k and zero-weight exclusion") {
    val two = rows.withColumn("g", when(col("id") % 2 === 0, "even").otherwise("odd"))
      .withColumn("w", when(col("id") === 7, 0L).otherwise(col("w")))
    val out = Sampling.weightedSample(two, col("id"), col("g"), col("w"), k = 3)
    val byG = out.groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG === Map("even" -> 3L, "odd" -> 3L))
    assert(out.filter(col("doc_id") === 7).count() === 0L)
  }

  test("PPS property: weight-10 rows dominate the sample across salts") {
    val wins = (1 to 20).map { s =>
      Sampling.weightedSample(rows, col("id"), col("g"), col("w"), k = 5, salt = s"s$s")
        .filter(col("w") === 10L).count()
    }.sum
    // 100 slots total; weight-10 ids hold 10/11 of the mass — expect
    // the heavy side to take the large majority (loose bound, not
    // a distribution test)
    assert(wins >= 70, s"heavy rows won only $wins of 100 slots")
  }
}
