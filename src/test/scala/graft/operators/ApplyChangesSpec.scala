package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApplyChangesSpec extends SparkSpec {
  import spark.implicits._

  // (key, lsn, op, payload)
  private lazy val log = Seq(
    (1, 1L, "c", "a1"), (1, 2L, "u", "a2"),            // survives as a2
    (2, 3L, "c", "b1"), (2, 4L, "d", ""),              // deleted
    (3, 5L, "c", "c1"),                                 // survives as c1
    (2, 6L, "c", "b2")                                  // re-created after delete
  ).toDF("k", "lsn", "op", "payload")

  test("latestState keeps newest per key and honors deletes") {
    val out = ApplyChanges.latestState(log, Seq(col("k")), Seq(col("lsn")), col("op"))
      .select("k", "payload").collect().map(r => (r.getInt(0), r.getString(1))).sorted
    assert(out.toSeq == Seq((1, "a2"), (2, "b2"), (3, "c1")))
  }

  test("latestState drops keys whose final op is delete") {
    val out = ApplyChanges.latestState(log.filter(col("lsn") <= 5),
      Seq(col("k")), Seq(col("lsn")), col("op"))
    assert(out.filter(col("k") === 2).count() == 0)
  }
}
