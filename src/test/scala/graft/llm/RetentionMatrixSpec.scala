package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the retention matrix: priority wins over id, id breaks prio
  * ties, intra-source drops, and singleton clusters emit nothing. */
class RetentionMatrixSpec extends SparkSpec {
  import spark.implicits._

  test("priority decides winners; losers attribute to the winner's source") {
    // cluster k1: ids 1(a,p2) 2(b,p1) 3(a,p2) -> b wins, a loses 2
    // cluster k2: ids 4(c,p1) 5(c,p1)        -> id 4 wins, c loses to c
    // singleton k3: id 6                      -> no rows
    val d = Seq(
      (1L, 10L, "a", 2), (2L, 10L, "b", 1), (3L, 10L, "a", 2),
      (4L, 20L, "c", 1), (5L, 20L, "c", 1),
      (6L, 30L, "d", 0)).toDF("id", "key", "src", "prio")
    val out = Dedup.retentionMatrix(d, col("id"), col("key"), col("src"), col("prio"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("a", "b") -> 2L, ("c", "c") -> 1L))
  }
}
