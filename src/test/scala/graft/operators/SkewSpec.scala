package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted-join semantics and plan shape: result parity with the plain
  * join, actual key spreading, and a pure equi-join plan (no product,
  * no broadcast requirement). */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin: inner and left_outer results match the unsalted join exactly") {
    // one pathological key (k=1) carrying most rows + normal keys +
    // a big-side key absent from the dim
    val big = ((1 to 500).map(i => (1L, s"row$i")) ++
      (1 to 50).map(i => (2L, s"b$i")) :+ ((99L, "orphan")))
      .toDF("k", "payload")
    val small = Seq((1L, "dim-one"), (2L, "dim-two"), (3L, "dim-unused"))
      .toDF("k", "attr")

    for (jt <- Seq("inner", "left_outer")) {
      val plain = big.join(small, Seq("k"), jt)
        .select("k", "payload", "attr").orderBy("k", "payload").collect().toSeq
      val salted = Skew.saltedJoin(big, small, "k", factor = 8, joinType = jt)
        .select("k", "payload", "attr").orderBy("k", "payload").collect().toSeq
      assert(salted == plain, s"$jt parity broken")
    }
  }

  test("saltedJoin: the hot key spreads over multiple salt buckets; salt is deterministic") {
    val big = (1 to 400).map(i => (1L, s"row$i")).toDF("k", "payload")
    val salts = big.withColumn("__salt",
        pmod(xxhash64(struct(col("k"), col("payload"))), lit(8L)))
      .select(countDistinct("__salt")).as[Long].head()
    assert(salts >= 6, s"expected the single key spread over ~8 buckets, got $salts")
    val a = Skew.saltedJoin(big, Seq((1L, "d")).toDF("k", "attr"), "k", 8)
      .orderBy("payload").collect().toSeq
    val b = Skew.saltedJoin(big, Seq((1L, "d")).toDF("k", "attr"), "k", 8)
      .orderBy("payload").collect().toSeq
    assert(a == b, "salting must be deterministic across runs")
  }

  test("saltedJoin: plans a hash/merge EQUI join on (key, salt), never a product") {
    val big = (1 to 200).map(i => (1L, i)).toDF("k", "v")
    val small = Seq((1L, "d")).toDF("k", "attr")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle path salting exists for
      val joined = Skew.saltedJoin(big, small, "k", 8)
      joined.collect()
      val s = (joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
      assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
        s"salted join degenerated to a product:\n$s")
      assert(s.contains("SortMergeJoin") || s.contains("ShuffledHashJoin"),
        s"expected a shuffled equi-join on (k, __salt):\n$s")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("hotKeys surfaces only keys at or above the threshold") {
    val df = ((1 to 100).map(_ => Tuple1("hot")) ++ Seq(Tuple1("warm"), Tuple1("warm"),
      Tuple1("cold"))).toDF("k")
    val hot = Skew.hotKeys(df, col("k"), threshold = 2)
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(hot == Seq(("hot", 100L), ("warm", 2L)))
  }
}
