package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every catalog query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line for the driver's BENCH_r{N}.json.
  *
  * Each query is materialized through the built-in `noop` DataSource V2
  * sink, not `.count()`: a count lets Catalyst prune unreferenced
  * projections and drop sorts (round-1 verdict: q08's hash columns and
  * q04's TakeOrdered were partially unmeasured), whereas a noop write
  * evaluates every output column of every row and discards them
  * executor-side — full query work, zero sink cost, no driver collect.
  *
  * Each query runs SPARK_GRAFT_BENCH_RUNS times (default 3) and
  * reports the per-query MEDIAN; total = sum of medians. Single runs
  * on this class of host swing ±3× across sessions (round-3/4
  * measured llm05 at 2.2 ↔ 6.9 s on identical code), which made
  * round-over-round comparison noise-dominated; the median absorbs
  * one-off GC/page-cache/JIT outliers while staying cheap.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: scan every input table through the noop sink once, so the
    // first measured query isn't charged JVM/classload time, parquet
    // footer reads, or cold page-cache faults (round-3: q01, the first
    // query, absorbed ~2.5 s of first-scan cost for lineitem)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    // SPARK_GRAFT_BENCH_ONLY=llm19,llm05 — comma-separated name prefixes
    // for single-query iteration; unset = full catalog (driver mode).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSeq)
    val catalog = only.fold(Queries.all)(ps => Queries.all.filter(q => ps.exists(q.name.startsWith)))
    val results = catalog.map { q =>
      // fixture construction and cache cleanup run OUTSIDE the timer —
      // BENCH measures query work only
      q.prepare.foreach(p => try p(spark, sfDir)
        catch { case e: Throwable => System.err.println(s"[bench] ${q.name} prepare failed: ${e.getMessage}") })
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }
      q.cleanup.foreach(c => try c(spark) catch { case _: Throwable => () })
      // Session hygiene BETWEEN queries, outside the timer: drop any
      // storage a query materialized and didn't release itself (round-9
      // verdict: leaked checkpoint blocks accumulated monotonically
      // across 43 queries × 3 runs and added ~34 s of eviction/GC churn
      // to untouched downstream queries). Cached tables too.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(r => try r.unpersist(blocking = false) catch { case _: Throwable => () })
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      q.name -> times.sorted.apply(times.size / 2) // median
    }
    // end-of-session invariant: every query + cleanup pass leaves zero
    // persistent RDDs behind (round-9 verdict task: prove the session
    // ends clean, not just that each query runs)
    val leftover = spark.sparkContext.getPersistentRDDs.size
    System.err.println(s"[bench] persistent RDDs after last query: $leftover" +
      (if (leftover == 0) " (clean session)" else " — LEAK, inspect query cleanup hooks"))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
