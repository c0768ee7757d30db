package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** Executed-plan audit (round-21 change #9, persisted as repo tooling in
  * round 22): runs each named query through the noop sink at a small SF
  * and grades the FINAL ADAPTIVE plan — scan count, exchange count,
  * reused stages, join strategies. `explain()` before execution shows
  * the initial plan only; the defect class this tool exists to catch
  * (consumers' column pruning diverges → AQE exchange reuse never fires
  * → the corpus silently re-scans per consumer) is ONLY visible on the
  * executed plan. NOT part of the bench contract; measurement tooling.
  *
  * Usage: ScanAudit <query-name-prefix> [...] — env as Bench
  * (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS). Emits one JSON line per
  * query on stdout. */
object ScanAudit {
  private def nodeCounts(root: SparkPlan): Map[String, Int] = {
    val counts = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    def key(p: SparkPlan): String = p.getClass.getSimpleName.stripSuffix("Exec")
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          counts(key(q)) += 1
          walk(q.plan)
        case other =>
          counts(key(other)) += 1
          other.children.foreach(walk)
      }
      // subqueries (scalar/broadcast) hang off expressions, not children
      p.subqueries.foreach(walk)
    }
    walk(root)
    counts.toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    require(args.nonEmpty, "usage: ScanAudit <query-name-prefix> [...]")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val picked = Queries.all.filter(q => args.exists(q.name.startsWith))
    require(picked.nonEmpty, s"no queries match ${args.mkString(",")}")
    // the listener sees the WRITE's QueryExecution — the executed
    // adaptive plan of exactly what the bench times
    @volatile var lastCounts: Map[String, Int] = Map.empty
    // round-22 (verdict #6 adjudication): ALSO accumulate every
    // execution between queries — construction-time eager tracker
    // jobs (CC supersteps, groupRanks, Materialize.eager) carry their
    // own file scans, so "corpus scans end-to-end" = the cumulative
    // FileSourceScan count, not the write's alone. Emitted as
    // `cum_FileSourceScan` / `cum_executions` next to the write's map.
    val cum = new java.util.concurrent.atomic.AtomicInteger(0)
    val cumExecs = new java.util.concurrent.atomic.AtomicInteger(0)
    // KNOWN GAP, kept honest: eager tracker jobs (Materialize.eager)
    // run through RDD actions that never hit the QueryExecutionListener,
    // so cum_* counts only listener-visible executions (Dataset actions
    // + the write) — a LOWER bound on end-to-end scans. Task-level
    // inputMetrics can't close it (they also count persisted-block
    // reads) and Hadoop FS statistics miss Spark 4's local-file parquet
    // read path; construction-scan claims are therefore adjudicated
    // from code + the committed plan dumps, not this counter alone.
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = {
        // queries with eager-materialization trackers run several
        // executions during CONSTRUCTION (collects, eager jobs) before
        // the noop write — grade only the write itself (its plan root
        // is the noop OverwriteByExpression command)
        val c = nodeCounts(qe.executedPlan)
        cum.addAndGet(c.getOrElse("FileSourceScan", 0))
        cumExecs.incrementAndGet()
        if (c.contains("OverwriteByExpression")) lastCounts = c
      }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val interesting = Seq("FileSourceScan", "ShuffleExchange", "BroadcastExchange",
      "ReusedExchange", "ReusedSubquery", "ShuffleQueryStage", "BroadcastQueryStage",
      "TableCacheQueryStage", "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct", "Expand", "Generate", "Sort",
      "HashAggregate", "ObjectHashAggregate", "SortAggregate", "Window", "Scan", "RDDScan")
    picked.foreach { q =>
      try {
        q.prepare.foreach(p => p(spark, sfDir))
        lastCounts = Map.empty
        cum.set(0); cumExecs.set(0)
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        // listener callbacks are async — poll briefly for the write's callback
        var waited = 0
        while (lastCounts.isEmpty && waited < 100) { Thread.sleep(50); waited += 1 }
        val kv = interesting.flatMap(k => lastCounts.get(k).filter(_ > 0).map(k -> _)) ++
          lastCounts.filterNot { case (k, _) => interesting.contains(k) }.toSeq.sortBy(_._1) ++
          Seq("cum_FileSourceScan" -> cum.get, "cum_executions" -> cumExecs.get)
        println(s"""{"query":"${q.name}",${kv.map { case (k, v) => s""""$k":$v""" }.mkString(",")}}""")
        q.cleanup.foreach(c => try c(spark) catch { case _: Throwable => () })
      } catch { case e: Throwable =>
        println(s"""{"query":"${q.name}","error":"${e.getMessage.take(120).replace("\"", "'")}"}""")
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(r => try r.unpersist(blocking = false) catch { case _: Throwable => () })
      try spark.catalog.clearCache() catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
