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

  test("scdType2 builds validity intervals; deletes close but don't version; re-creates continue numbering") {
    // ts = 10·lsn so intervals are visible
    val ev = log.withColumn("ts", col("lsn") * 10)
    val out = ApplyChanges.scdType2(ev, Seq(col("k")), Seq(col("lsn")),
        col("ts"), col("op"))
      .select("k", "ver", "payload", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3),
                 Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq(
      // key 1: a1 valid [10,20), a2 open
      (1, 1, "a1", 10L, Some(20L), false),
      (1, 2, "a2", 20L, None, true),
      // key 2: b1 closed by the DELETE at ts 40 (no version for it),
      // b2 re-created later — version numbering continues at 3
      (2, 1, "b1", 30L, Some(40L), false),
      (2, 3, "b2", 60L, None, true),
      // key 3: single open version
      (3, 1, "c1", 50L, None, true)))
  }
}
