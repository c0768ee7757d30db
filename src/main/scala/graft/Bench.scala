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
  /** Blackhole for the canary loop result — a volatile store the JIT
    * cannot eliminate, so the fixed work is never dead-code'd away. */
  @volatile private var canarySink: Long = 0L

  /** Calibration canary: a FIXED amount of single-threaded integer work
    * (xorshift64), timed. Its wall-clock depends only on how fast the
    * host actually runs this JVM *right now* — host-level CPU steal or
    * thermal throttling (invisible to guest load metrics) inflates it
    * in direct proportion. Round-10 verdict: the archived bench showed
    * llm17 at 209 s where an idle host measures 4.4 s, and nothing in
    * the artifact could tell a throttled run from a real regression.
    * The canary is that missing signal: measured before every query
    * run and emitted per query, it lets any reader normalize timings
    * across sessions and localize a mid-session throttling window. */
  private val CanaryIters = 20_000_000
  private def spin(): Long = {
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < CanaryIters) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    x
  }
  private def canaryMs(): Double = {
    val t0 = System.nanoTime()
    canarySink = spin()
    (System.nanoTime() - t0) / 1e6
  }

  /** Parallel canary: the SAME fixed work on `threads` concurrent
    * threads, wall-clock for all to finish. The single-threaded canary
    * has a blind spot this closes: a guest that still runs ONE thread
    * at full speed but has most of its vCPUs stolen shows a flat
    * canary while every shuffle/scan stage crawls (observed in-suite:
    * llm19 59 s with a 32 ms canary vs 1.4 s isolated minutes later).
    * On a healthy host par ≈ single (threads are independent); under
    * multi-core steal par inflates in proportion to the starvation. */
  private def canaryParMs(threads: Int): Double = {
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { _ =>
      val t = new Thread(() => { canarySink = spin() })
      t.start(); t
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e6
  }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      // engine rules ON everywhere: every oracle query must hold under them
      .withExtensions(new graft.plans.GraftExtensions)
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

    // JIT-warm the canary loops so the first measured values reflect
    // host speed, not compilation tiers
    val nThreads = cpus.toInt.max(1)
    (1 to 5).foreach { _ => canaryMs(); canaryParMs(nThreads) }

    final case class Sample(sec: Double, canary: Double, canaryPar: Double)

    /** One timed pass over a query: single- and all-core canaries
      * before every run (host-speed samples), then the query through
      * the noop sink. Returns medians. */
    def timeQuery(q: Q): Sample = {
      // fixture construction and cache cleanup run OUTSIDE the timer —
      // BENCH measures query work only
      q.prepare.foreach(p => try p(spark, sfDir)
        catch { case e: Throwable => System.err.println(s"[bench] ${q.name} prepare failed: ${e.getMessage}") })
      val samples = (1 to runs).map { _ =>
        val c = canaryMs()
        val cp = canaryParMs(nThreads)
        val t0 = System.nanoTime()
        try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}") }
        Sample((System.nanoTime() - t0) / 1e9, c, cp)
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
      // aging control, OUTSIDE the timer: after ~150 queries × 3 runs
      // the in-suite tail ran up to 3.7× its fresh-session cost at
      // healthy canaries (llm92 7.8 s in-suite vs 2.1 s in a fresh
      // block run) — accumulated heap/reference backlog, not engine
      // work. A forced collection between queries lets the reference
      // processing (broadcast/accumulator cleanup queues) drain so a
      // query is measured against the same JVM state early and late.
      System.gc()
      Sample(median(samples.map(_.sec)), median(samples.map(_.canary)),
             median(samples.map(_.canaryPar)))
    }

    val firstPass = catalog.map(q => q.name -> timeQuery(q)).toMap
    // Throttle detection: both canaries are fixed work, so their
    // FASTEST observations this session approximate the unthrottled
    // host; a query whose single-thread canary ran >2.5× slower was
    // measured under CPU throttling, and one whose ALL-CORE canary ran
    // >2.5× slower was measured under multi-core steal (invisible to
    // the single-thread probe). Either way its timing is a statement
    // about the host, not the engine — re-run ONCE after a cooldown
    // (absorbs short windows; a 20-minute window stays flagged).
    val base1 = firstPass.values.map(_.canary).min
    val baseP = firstPass.values.map(_.canaryPar).min
    val suspectRatio = 2.5
    def suspect(s: Sample) =
      s.canary > suspectRatio * base1 || s.canaryPar > suspectRatio * baseP
    val suspects = catalog.filter(q => suspect(firstPass(q.name)))
    if (suspects.nonEmpty) {
      System.err.println(s"[bench] throttle-suspect queries (canary > ${suspectRatio}× baseline " +
        f"$base1%.1f/$baseP%.1f ms): ${suspects.map(_.name).mkString(",")} — re-running after cooldown")
      Thread.sleep(3000)
    }
    val reruns = suspects.map(q => q.name -> timeQuery(q)).toMap
    // final per-query value: the measurement taken on the cleaner host
    // state (lower all-core canary wins — same engine, same work)
    val results = catalog.map { q =>
      val first = firstPass(q.name)
      q.name -> reruns.get(q.name).filter(_.canaryPar < first.canaryPar).getOrElse(first)
    }
    val throttled = results.exists { case (_, s) => suspect(s) }

    // end-of-session invariant: every query + cleanup pass leaves zero
    // persistent RDDs behind (round-9 verdict task: prove the session
    // ends clean, not just that each query runs)
    val leftover = spark.sparkContext.getPersistentRDDs.size
    System.err.println(s"[bench] persistent RDDs after last query: $leftover" +
      (if (leftover == 0) " (clean session)" else " — LEAK, inspect query cleanup hooks"))
    def jmap(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jmap(results.map { case (k, s) => k -> s.sec })
    val canaries = jmap(results.map { case (k, s) => k -> s.canary })
    val canariesPar = jmap(results.map { case (k, s) => k -> s.canaryPar })
    val rerunned = jmap(suspects.map(q => q.name -> firstPass(q.name).sec))
    val total = results.map(_._2.sec).sum
    val base1Min = results.map(_._2.canary).min
    val basePMin = results.map(_._2.canaryPar).min
    val jsonLine = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""canary_ms":$canaries,"canary_par_ms":$canariesPar,""" +
      s""""canary_baseline_ms":$base1Min,""" +
      s""""canary_par_baseline_ms":$basePMin,""" +
      s""""canary_threads":$nThreads,""" +
      s""""throttled":$throttled,"rerun_initial":$rerunned,"sf":"$sfDir"}"""
    // The full line (per-query canaries, rerun detail) goes to a FILE:
    // the round-11 archived artifact was a stdout tail-capture that
    // truncated the line mid-map, and rounds 10–13 all archived
    // `parsed: null` because the driver keeps only the LAST 2000 chars
    // of output — a 10 KB line can never survive that window. The file
    // is the canonical, re-readable copy (override the path with
    // SPARK_GRAFT_BENCH_OUT).
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
    try {
      Option(outPath.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(outPath, jsonLine + "\n")
      System.err.println(s"[bench] full json written to $outPath")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    // STDOUT gets a COMPACT line sized to fit the driver's tail window:
    // query keys shortened to their unique prefix ("llm12_curation" →
    // "llm12" — the driver's own contract example uses "q1":sec) and
    // seconds rounded to the millisecond, which cuts ~10 KB to ~1.6 KB.
    // Printed LAST so only sbt's single [success] line follows it in
    // the capture.
    def shortKey(k: String): String = k.takeWhile(_ != '_')
    // fall back to full names if shortening ever collides (it can't
    // today — q/cdc/llm numbering is the prefix — but a silent merge
    // would corrupt the record)
    val keyOf: String => String =
      if (results.map(r => shortKey(r._1)).distinct.size == results.size) shortKey
      else identity
    val qsShort = jmap(results.map { case (k, s) =>
      keyOf(k) -> math.rint(s.sec * 1000) / 1000 })
    val compact = s"""{"metric":"total","value":${math.rint(total * 1000) / 1000},""" +
      s""""unit":"sec","queries":$qsShort,""" +
      s""""canary_baseline_ms":${math.rint(base1Min * 10) / 10},""" +
      s""""canary_par_baseline_ms":${math.rint(basePMin * 10) / 10},""" +
      s""""canary_threads":$nThreads,"throttled":$throttled,"sf":"$sfDir"}"""
    spark.stop()
    println(compact)
  }
}
