package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The range-join binning rule: a naive bounded-width range join must
  * come out as a hash/sort-merge join on the synthesized bin key — not
  * the O(n·m) BroadcastNestedLoopJoin — with row-identical results.
  * The shared test session can't re-run extension injection, so the
  * Rule object is installed via experimental.extraOptimizations (the
  * production path is GraftExtensions / GraftSession.builder).
  */
class RangeBinJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def points = (0L until 2000L).map(i => (i % 7, i * 13 % 1000))
    .toDF("k", "p")
  private def ranges = (0L until 50L).map(i => (i % 7, i * 17 % 900))
    .toDF("rk", "s")

  private def executed(df: DataFrame): String = {
    df.collect()
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations = Seq(RangeBinJoinRewrite)
    try f finally spark.experimental.extraOptimizations = Nil
  }

  test("keyless range join: BNLJ without the rule, binned hash join with it, same rows") {
    val cond = col("p") >= col("s") && col("p") <= col("s") + 100L
    val naive = points.join(ranges, cond)
    val baseline = naive.collect().map(_.toSeq).toSet
    val planOff = executed(points.join(ranges, cond))
    assert(planOff.contains("BroadcastNestedLoopJoin"),
      s"precondition: naive plan should be BNLJ:\n$planOff")
    withRule {
      val rewritten = points.join(ranges, cond)
      val planOn = executed(rewritten)
      assert(!planOn.contains("BroadcastNestedLoopJoin"),
        s"rule must eliminate BNLJ:\n$planOn")
      assert(planOn.contains("__graft_bin"), s"expected bin key in:\n$planOn")
      assert(rewritten.collect().map(_.toSeq).toSet == baseline)
    }
  }

  test("keyed range join keeps its keys and gains the bin key") {
    val cond = col("k") === col("rk") &&
      col("p") >= col("s") && col("p") <= col("s") + 100L
    val baseline = points.join(ranges, cond).collect().map(_.toSeq).toSet
    withRule {
      val rewritten = points.join(ranges, cond)
      val planOn = executed(rewritten)
      assert(planOn.contains("__graft_bin"), s"expected bin key in:\n$planOn")
      assert(!planOn.contains("BroadcastNestedLoopJoin"))
      assert(rewritten.collect().map(_.toSeq).toSet == baseline)
    }
  }

  test("SQL-written range join is rewritten too, and empty/boundary rows survive") {
    points.createOrReplaceTempView("pts")
    ranges.createOrReplaceTempView("rngs")
    val sql = "SELECT * FROM pts JOIN rngs ON p >= s AND p <= s + 100"
    val baseline = spark.sql(sql).collect().map(_.toSeq).toSet
    withRule {
      val df = spark.sql(sql)
      assert(!executed(df).contains("BroadcastNestedLoopJoin"))
      assert(df.collect().map(_.toSeq).toSet == baseline)
    }
  }

  test("graft_hash64 registers as a SQL function and matches the Column form") {
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    val viaSql = spark.sql("SELECT graft_hash64('the quick brown fox') AS h")
      .head().getLong(0)
    val viaColumn = Seq("the quick brown fox").toDF("s")
      .select(graft.functions.Portable.hash64(col("s"))).head().getLong(0)
    assert(viaSql == viaColumn)
    // non-string inputs cast like the Column form does
    val num = spark.sql("SELECT graft_hash64(42) AS h").head().getLong(0)
    val numCol = Seq(42).toDF("i")
      .select(graft.functions.Portable.hash64(col("i"))).head().getLong(0)
    assert(num == numCol)
  }

  test("non-matching shapes are left alone") {
    withRule {
      // unbounded range (no literal width): stays whatever Spark picks
      val cond = col("p") >= col("s")
      val df = points.join(ranges, cond)
      assert(!executed(df).contains("__graft_bin"))
      // equi join untouched
      val eq = points.join(ranges, col("k") === col("rk"))
      assert(!executed(eq).contains("__graft_bin"))
    }
  }
}
