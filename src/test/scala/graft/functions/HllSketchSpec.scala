package graft.functions

import graft.SparkSpec
import graft.llm.Sketches
import org.apache.spark.sql.functions._

class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  private def regsOf(n: Int, parts: Int): Seq[Long] = {
    val df = spark.range(0, n, 1, parts).select(col("id").cast("string").as("v"))
    Sketches.hllSketch(df, Nil, col("v"), m = 64)
      .collect().head.getSeq[Long](0).toSeq
  }

  test("registers are partition-independent (element-wise max merge)") {
    assert(regsOf(5000, 1) == regsOf(5000, 7))
    assert(regsOf(5000, 1) == regsOf(5000, 32))
  }

  test("raw estimate lands within the m=64 error regime on 5k distincts") {
    val df = spark.range(0, 5000).select(col("id").cast("string").as("v"))
    val est = Sketches.hllSketch(df, Nil, col("v"), m = 64)
      .select(Sketches.hllRawEstimate(col("hll"), 64)).collect().head.getDouble(0)
    // sigma = 1.04/sqrt(64) = 13%; 3 sigma = 39%
    assert(est > 5000 * 0.6 && est < 5000 * 1.4, s"estimate $est way off 5000")
  }

  test("duplicates never change registers; empty input is all zeros") {
    val once = Sketches.hllSketch(
      Seq("a", "b", "c").toDF("v"), Nil, col("v"), m = 64)
      .collect().head.getSeq[Long](0)
    val dup = Sketches.hllSketch(
      Seq("a", "b", "c", "a", "a", "b").toDF("v"), Nil, col("v"), m = 64)
      .collect().head.getSeq[Long](0)
    assert(once == dup)
    val empty = Sketches.hllSketch(
      Seq.empty[String].toDF("v"), Nil, col("v"), m = 64)
      .collect().head.getSeq[Long](0)
    assert(empty.forall(_ == 0L))
  }

  test("JVM estimate applies linear counting in the small range") {
    val df = Seq("x", "y", "z", "w").toDF("v")
    val regs = Sketches.hllSketch(df, Nil, col("v"), m = 64)
      .collect().head.getSeq[Long](0).toArray
    val est = HllSketch.estimate(regs)
    // 4 distincts, m=64: raw would overshoot badly; the correction
    // must land near the truth
    assert(est > 2.0 && est < 8.0, s"corrected estimate $est far from 4")
  }

  test("hllSketchHashed over pre-hashed values equals hllSketch over raw values (round-21 llm88/89)") {
    val df = Seq(("s1", "a"), ("s1", "b"), ("s1", "a"), ("s2", "c"),
      ("s2", "c"), ("s2", "d"), ("s2", "e")).toDF("source", "v")
    val raw = Sketches.hllSketch(df, Seq(col("source")), col("v"), m = 64)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val hashed = Sketches.hllSketchHashed(
        df.select(col("source"), graft.functions.Portable.hash64(col("v")).as("h")),
        Seq(col("source")), col("h"), m = 64)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(raw == hashed)
    // and over the DISTINCT hashed frame (the llm88/89 shape): max over
    // duplicates == max over distincts
    val distinctHashed = Sketches.hllSketchHashed(
        df.select(col("source"), graft.functions.Portable.hash64(col("v")).as("h")).distinct(),
        Seq(col("source")), col("h"), m = 64)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(raw == distinctHashed)
  }

  test("rho matches the bin-length contract at the edges") {
    assert(HllSketch.rho(0L) == 55L)
    assert(HllSketch.rho(1L) == 54L)
    assert(HllSketch.rho(2L) == 53L)
    assert(HllSketch.rho((1L << 53)) == 1L)
  }
}
