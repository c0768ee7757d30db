package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming floor decomposition (round-21 verdict #8): runs the named
  * queries once and aggregates every micro-batch's
  * StreamingQueryProgress duration breakdown, splitting checkpoint /
  * state-store machinery (walCommit + commitOffsets + state commit)
  * from batch compute (addBatch minus state commit) — so "structural
  * floor" is a measured number per row, not an adjudication.
  * Measurement tooling only; not part of the bench contract. */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    require(args.nonEmpty, "usage: StreamProfile <query-name-prefix> [...]")
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
    val acc = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    def add(k: String, v: Long): Unit = acc.merge(k, v, (a, b) => a + b)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        add("batches", 1L)
        val d = p.durationMs
        Seq("addBatch", "walCommit", "commitOffsets", "getBatch", "latestOffset",
            "queryPlanning", "triggerExecution").foreach { k =>
          Option(d.get(k)).foreach(v => add(k, v.longValue()))
        }
        p.stateOperators.foreach { so =>
          add("stateCommit", so.commitTimeMs)
          add("stateUpdates", so.allUpdatesTimeMs)
          add("stateRemovals", so.allRemovalsTimeMs)
        }
      }
    }
    spark.streams.addListener(listener)
    val picked = Queries.all.filter(q => args.exists(q.name.startsWith))
    require(picked.nonEmpty, s"no queries match ${args.mkString(",")}")
    picked.foreach { q =>
      acc.clear()
      val t0 = System.nanoTime()
      try {
        q.prepare.foreach(p => p(spark, sfDir))
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        q.cleanup.foreach(c => try c(spark) catch { case _: Throwable => () })
      } catch { case e: Throwable =>
        System.err.println(s"[streamprofile] ${q.name} failed: ${e.getMessage}")
      }
      val wallMs = (System.nanoTime() - t0) / 1000000
      // listener events are async — drain before reading
      Thread.sleep(1500)
      import scala.jdk.CollectionConverters._
      val m = acc.asScala.toMap
      val kv = m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString(",")
      println(s"""{"query":"${q.name}","wall_ms":$wallMs,$kv}""")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(r => try r.unpersist(blocking = false) catch { case _: Throwable => () })
      try spark.catalog.clearCache() catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
