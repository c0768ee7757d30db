package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The range-join binning rule — ON for the whole suite via the test
  * session's GraftExtensions (the production registration path), so
  * these tests assert against brute-force Scala references rather than
  * a rule-off run: a naive bounded-width range join must come out as a
  * hash/sort-merge join on the synthesized bin key — not the O(n·m)
  * BroadcastNestedLoopJoin — with row-identical results. */
class RangeBinJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val pointRows = (0L until 2000L).map(i => (i % 7, i * 13 % 1000))
  private val rangeRows = (0L until 50L).map(i => (i % 7, i * 17 % 900))
  private def points = pointRows.toDF("k", "p")
  private def ranges = rangeRows.toDF("rk", "s")

  private def bruteForce(keyed: Boolean): Set[Seq[Any]] =
    (for {
      (k, p) <- pointRows
      (rk, s) <- rangeRows
      if (!keyed || k == rk) && p >= s && p <= s + 100L
    } yield Seq[Any](k, p, rk, s)).toSet

  private def executed(df: DataFrame): String = {
    df.collect()
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  test("keyless range join: binned hash join, no BNLJ, brute-force-identical rows") {
    val cond = col("p") >= col("s") && col("p") <= col("s") + 100L
    val df = points.join(ranges, cond)
    val plan = executed(df)
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"rule must eliminate BNLJ:\n$plan")
    assert(plan.contains("__graft_bin"), s"expected bin key in:\n$plan")
    assert(df.collect().map(_.toSeq).toSet == bruteForce(keyed = false))
  }

  test("keyed range join keeps its keys and gains the bin key") {
    val cond = col("k") === col("rk") &&
      col("p") >= col("s") && col("p") <= col("s") + 100L
    val df = points.join(ranges, cond)
    val plan = executed(df)
    assert(plan.contains("__graft_bin"), s"expected bin key in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(df.collect().map(_.toSeq).toSet == bruteForce(keyed = true))
  }

  test("SQL-written range join is rewritten too") {
    points.createOrReplaceTempView("pts")
    ranges.createOrReplaceTempView("rngs")
    val df = spark.sql("SELECT * FROM pts JOIN rngs ON p >= s AND p <= s + 100")
    assert(!executed(df).contains("BroadcastNestedLoopJoin"))
    assert(df.collect().map(_.toSeq).toSet == bruteForce(keyed = false))
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
    // unbounded range (no literal width): stays whatever Spark picks
    val cond = col("p") >= col("s")
    val df = points.join(ranges, cond)
    assert(!executed(df).contains("__graft_bin"))
    // equi join untouched
    val eq = points.join(ranges, col("k") === col("rk"))
    assert(!executed(eq).contains("__graft_bin"))
  }
}
