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

  /** Fresh-JVM block orchestration (round-14 verdict #5): a single
    * 157-query × 3-run sweep ages the JVM until the tail reads up to
    * 2.4× its fresh-session cost at healthy canaries (llm09 8.1 s
    * in-suite vs 3.4 s fresh — heap/JIT/reference backlog, not engine
    * work, and System.gc() between queries only bounds it). The fix
    * is structural: split the catalog into SPARK_GRAFT_BENCH_BLOCKS
    * contiguous blocks (default 3) and run each in its OWN child JVM,
    * then merge the per-block artifacts into the one JSON line the
    * driver archives. Each block pays its own warmup outside the
    * timers; every query runs in a JVM at most a third as aged as
    * before. SPARK_GRAFT_BENCH_ONLY iteration keeps the single-JVM
    * path (blocks=1). */
  /** Round-19 (verdict #2, third recurrence): rows whose OFFICIAL
    * in-suite reading has repeatedly inflated 3-6x above their
    * isolated cost on identical code (llm91: r16 12.4 vs 1.96, r18
    * 10.63 vs 1.99; llm108/llm119 at smaller amplitude) while every
    * builder closing run at the same block geometry reads them flat.
    * The 5-sample heavy median demonstrably does not shield them in
    * the driver's run geometry, so the fix is structural: each of
    * these rows runs in its OWN single-query child JVM (a fresh heap,
    * zero predecessor queries), making the measurement immune to any
    * block-internal aging by construction. Cost: one JVM+session
    * startup per row (~15 s each, OUTSIDE the timers). If a row still
    * reads inflated in the official artifact after this, the cause is
    * definitively host-side, not JVM aging. */
  private val IsolateTagged = Seq("llm91_contrastive_pairs",
    "llm108_influence_weights", "llm119_longest_run_audit",
    // round-21 (round-20 verdict #1): the canary-gated isolation fixed
    // llm91 (11.90 → 2.18 official); these three carried +3-4.7 s of
    // pure host steal in BENCH_r20 (official vs same-day closing runs
    // of identical code: llm157 10.84 vs 6.15, llm120 6.12 vs 2.11,
    // q24 6.09 vs 3.02) while NOT being isolation-gated. Measurement
    // robustness only — the queries themselves are unchanged.
    "llm157_token_decontamination", "llm120_audio_neardup",
    "q24_walk_centrality")

  /** Round-22 (round-21 verdict #1 — the round's single highest-leverage
    * item): the official 32-core BENCH_r21 run timed out (rc 124) and
    * lost EVERYTHING, because (a) nothing bounded aggregate throttle-
    * rerun cost (r21's steal windows drove 67-74 reruns = a full extra
    * 3-5-sample pass each, vs r20's 16) and (b) the parent emitted the
    * artifact only at the very end. Measurement fix, not methodology:
    * the per-query noop-sink / median / canary-gate rules are
    * untouched — a WALL-CLOCK BUDGET (`SPARK_GRAFT_BENCH_BUDGET_S`,
    * default 2400 s: well under the driver's window, which the
    * completed 3210 s 8-core r21 run proves is >= ~3300 s) sheds the
    * OPTIONAL extras in fixed order once crossed, each shed recorded
    * in the artifact:
    *   1. past 70% of budget: children skip remaining throttle-suspect
    *      reruns (absolute-deadline env; also hard-capped at
    *      `SPARK_GRAFT_BENCH_MAX_RERUNS`/block, worst canaries first);
    *   2. past 85%: the parent skips isolated-block gate retries;
    *   3. past 95%: the parent skips the slope block.
    * Independently, the parent FLUSHES a running merged artifact to
    * SPARK_GRAFT_BENCH_OUT after every completed block (tagged
    * `"partial":true`) and a TERM shutdown hook prints the latest
    * partial lines to stdout — a kill at any point now leaves a
    * parseable line carrying whatever completed. */
  private val budgetS: Double =
    sys.env.get("SPARK_GRAFT_BENCH_BUDGET_S").map(_.toDouble).getOrElse(2400.0)
  private val benchStartMs: Long = System.currentTimeMillis()
  private def elapsedS: Double = (System.currentTimeMillis() - benchStartMs) / 1e3

  /** Latest rendered (full, compact) artifact lines for the shutdown
    * hook; armed by every partial flush, disarmed by the final emit. */
  @volatile private var lastPartial: Option[(String, String)] = None
  /** The in-flight block child, so a TERM'd parent takes its child
    * down too instead of leaving an orphan Spark JVM on the host. */
  @volatile private var inFlightChild: Option[Process] = None
  private def armShutdownHook(): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      inFlightChild.foreach(p => try p.destroy() catch { case _: Throwable => () })
      lastPartial.foreach { case (full, compact) =>
        // stdout, same order as the normal emit: full line first, the
        // tail-window-sized compact line LAST
        println(full); println(compact); System.out.flush()
        System.err.println("[bench] killed before completion — partial artifact " +
          "flushed to stdout and SPARK_GRAFT_BENCH_OUT")
      }
    }))

  private def runBlocks(blocks: Int, catalog: Seq[Q]): Unit = {
    import scala.jdk.CollectionConverters._
    armShutdownHook()
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
    val cp = System.getProperty("java.class.path")
    val (isolatedQs, normalQs) = catalog.partition(q => IsolateTagged.contains(q.name))
    val per = ((normalQs.size + blocks - 1) / blocks).max(1)
    val normalGroups = normalQs.grouped(per).toSeq
    val groups = normalGroups ++ isolatedQs.map(Seq(_))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def asMap(n: com.fasterxml.jackson.databind.JsonNode): Seq[(String, Double)] =
      n.properties().asScala.toSeq.map(e => e.getKey -> e.getValue.asDouble())
    // absolute epoch deadline after which children shed remaining
    // throttle-suspect reruns (budget shed step 1)
    val rerunDeadlineMs = benchStartMs + (budgetS * 0.70 * 1000).toLong
    val shed = scala.collection.mutable.ArrayBuffer.empty[String]
    def runBlock(g: Seq[Q], label: String, ordinal: String): com.fasterxml.jackson.databind.JsonNode = {
      val outFile = s"target/bench_block_$label.json"
      val cmd = Seq(javaBin) ++ jvmArgs ++ Seq("-cp", cp, "graft.Bench")
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_BENCH_CHILD", "1")
      // full names: each is a unique prefix of exactly itself
      pb.environment().put("SPARK_GRAFT_BENCH_ONLY", g.map(_.name).mkString(","))
      pb.environment().put("SPARK_GRAFT_BENCH_OUT", outFile)
      pb.environment().put("SPARK_GRAFT_BENCH_RERUN_DEADLINE_MS", rerunDeadlineMs.toString)
      // child stderr (Spark logs, [bench] progress) passes through;
      // child stdout (its own JSON lines) is block detail, not the
      // artifact — discard it, the block FILE is canonical
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
      System.err.println(s"[bench] block $ordinal: " +
        s"${g.size} queries (${g.head.name}..${g.last.name}) in a fresh JVM" +
        f" [elapsed ${elapsedS}%.0f s / budget ${budgetS}%.0f]")
      val p = pb.start()
      inFlightChild = Some(p)
      val rc = p.waitFor()
      inFlightChild = None
      require(rc == 0, s"bench block $label exited $rc")
      om.readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(outFile)))
    }
    // running-artifact flush: after every completed block, merge what
    // exists and write it to SPARK_GRAFT_BENCH_OUT (partial:true) so a
    // kill at any later point still leaves a parseable artifact
    def flushPartial(done: Seq[com.fasterxml.jackson.databind.JsonNode], n: Int): Unit =
      try {
        val qs = done.flatMap(p => asMap(p.get("queries")))
        if (qs.nonEmpty) {
          val lines = render(qs,
            done.flatMap(p => asMap(p.get("canary_ms"))),
            done.flatMap(p => asMap(p.get("canary_par_ms"))),
            done.flatMap(p => asMap(p.get("rerun_initial"))),
            done.exists(_.get("throttled").asBoolean()),
            done.head.get("canary_threads").asInt(),
            done.head.get("sf").asText(), blocks = groups.size,
            rerunsShed = done.map(n0 => Option(n0.get("reruns_shed")).map(_.asInt).getOrElse(0)).sum,
            shed = shed.toSeq, partialBlocksDone = Some((n, groups.size)))
          lastPartial = Some(lines)
          writeArtifact(lines._1)
          System.err.println(s"[bench] partial artifact flushed ($n/${groups.size} blocks)")
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] partial flush failed (${e.getMessage}) — continuing")
      }
    val firstPass = {
      val acc = scala.collection.mutable.ArrayBuffer.empty[com.fasterxml.jackson.databind.JsonNode]
      groups.zipWithIndex.foreach { case (g, i) =>
        acc += runBlock(g, i.toString, s"${i + 1}/${groups.size}")
        flushPartial(acc.toSeq, i + 1)
      }
      acc.toSeq
    }
    // Canary-gated rerun for the ISOLATED single-query blocks
    // (round-19 verdict #1): the fresh-JVM isolation closed the
    // JVM-aging theory, but llm91 still anchored the r19 artifact at
    // 11.9 s because its own JVM ran inside a 1.47× all-core steal
    // window — below the 2.5× throttle trigger, far above the host's
    // real variance (clean sessions sit within ~1.1× of baseline).
    // For these blocks only, the single row IS the whole reading, so
    // one extra ~15 s rerun is cheap insurance: when the block's
    // median all-core canary exceeds ISOGATE (default 1.25×) the
    // session baseline (min over every block), rerun the block once
    // in another fresh JVM and keep the lower-canary attempt — the
    // same lower-canary-wins rule the in-child throttle rerun uses.
    // Both attempts' (sec, canary_par) land in `isolated_rerun` so a
    // reader can verify which attempt was kept and why.
    // round-20 advice: never assume a block artifact carries the key —
    // a missing map degrades to "no gate" instead of an NPE, and the
    // canary statistic is the MEDIAN over the block's entries (for the
    // single-query isolated blocks that IS the one entry, matching the
    // comment; a multi-query group no longer gates on an arbitrary head)
    def parCanaries(p: com.fasterxml.jackson.databind.JsonNode): Seq[Double] =
      Option(p.get("canary_par_ms")).map(asMap(_).map(_._2)).getOrElse(Nil)
    val basePSession = firstPass.flatMap(parCanaries)
      .minOption.getOrElse(Double.MaxValue) // no canaries anywhere → gate never fires
    val isoGate = sys.env.get("SPARK_GRAFT_BENCH_ISOGATE").map(_.toDouble).getOrElse(1.25)
    val isoRerun = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val parsed = firstPass.zipWithIndex.map { case (p, i) =>
      if (i < normalGroups.size) p
      else {
        val qname = groups(i).head.name
        val c0s = parCanaries(p)
        val c0 = if (c0s.isEmpty) 0.0 else median(c0s)
        if (c0s.isEmpty || c0 <= isoGate * basePSession) p
        else if (elapsedS > budgetS * 0.85) {
          // budget shed step 2: keep the (elevated-canary) first
          // attempt rather than blow the driver's window on a retry JVM
          System.err.println(f"[bench] isolated block $qname gate retry SHED " +
            f"(elapsed ${elapsedS}%.0f s > 85%% of ${budgetS}%.0f s budget)")
          shed += s"iso_gate_retry:$qname"
          isoRerun ++= Seq(s"$qname:initial_canary_par" -> c0,
            s"$qname:retry_shed_budget" -> 1.0)
          p
        }
        else {
          System.err.println(f"[bench] isolated block $qname ran under an elevated " +
            f"all-core canary ($c0%.1f ms vs session baseline $basePSession%.1f, " +
            f">${isoGate}%.2f×) — re-running once in a fresh JVM")
          val p2 = runBlock(groups(i), s"${i}_retry", s"${i + 1}r/${groups.size}")
          val c1s = parCanaries(p2)
          val c1 = if (c1s.isEmpty) Double.MaxValue else median(c1s)
          def sec(n: com.fasterxml.jackson.databind.JsonNode): Double =
            Option(n.get("queries")).map(asMap(_)).getOrElse(Nil)
              .find(_._1 == qname).map(_._2).getOrElse(0.0)
          isoRerun ++= Seq(s"$qname:initial_sec" -> sec(p), s"$qname:initial_canary_par" -> c0,
            s"$qname:retry_sec" -> sec(p2), s"$qname:retry_canary_par" -> c1)
          if (c1 < c0) p2 else p
        }
      }
    }
    val queries = parsed.flatMap(p => asMap(p.get("queries")))
    val canaries = parsed.flatMap(p => asMap(p.get("canary_ms")))
    val canariesPar = parsed.flatMap(p => asMap(p.get("canary_par_ms")))
    val reruns = parsed.flatMap(p => asMap(p.get("rerun_initial")))
    val rerunsShed = parsed.map(p => Option(p.get("reruns_shed")).map(_.asInt).getOrElse(0)).sum
    val throttled = parsed.exists(_.get("throttled").asBoolean())
    val nThreads = parsed.head.get("canary_threads").asInt()
    val sfDir = parsed.head.get("sf").asText()
    // budget shed step 3: the slope block is the most expendable extra
    // (it re-measures a tagged subset at a smaller SF — diagnostics,
    // not this run's readings)
    val (slope, slopeSmallDir) =
      if (elapsedS > budgetS * 0.95) {
        System.err.println(f"[bench] slope block SHED " +
          f"(elapsed ${elapsedS}%.0f s > 95%% of ${budgetS}%.0f s budget)")
        shed += "slope"
        (Nil, "")
      } else runSlope(javaBin, jvmArgs, cp, sfDir, queries.toMap)
    emit(queries, canaries, canariesPar, reruns, throttled, nThreads, sfDir,
      blocks = groups.size, slope = slope, slopeSmallDir = slopeSmallDir,
      isolatedRerun = isoRerun.toSeq, rerunsShed = rerunsShed, shed = shed.toSeq)
  }

  /** Round-15 verdict #5 — empirical scale-slope guard: re-run a
    * tagged heavy subset at a 10×-smaller SF in its own fresh JVM and
    * emit the per-query growth exponent log₁₀(t_big/t_small) — the
    * measured check on SCALE.md's "linear by design" claims. An
    * exponent near 1.0 is linear, below 1.0 is sub-linear (fixed
    * overheads amortizing), and anything approaching 2.0 is an
    * accidental n² that a single-SF bench can never see. Skipped when
    * the small SF dir is missing or SPARK_GRAFT_BENCH_SLOPE=0.
    *
    * The 10× data-ratio assumption is RECORDED in the artifact
    * (`slope_small_sf` + `slope_assumed_ratio`, round-16 advice) —
    * a reader pointing SPARK_GRAFT_SF_DIR_SMALL at a non-10× dir can
    * see exactly which dirs produced the exponents rather than
    * trusting a silent log₁₀. Returns (exponents, smallDirUsed). */
  private val SlopeTagged = Seq("llm05_minhash_pairs", "llm09_jaccard_verify",
    "llm16_decontamination", "llm17_dedup_clusters", "q16_exact_quantiles",
    "cdc02_apply_changes",
    // round-16 verdict #5: the slope subset previously omitted the two
    // costliest families — streaming state machinery and the
    // materialize-and-join calibration slice. Both now measured.
    "cdc37_windowed_distinct", "llm91_contrastive_pairs",
    // round-17: the positional-match span audit is the newest
    // corpus-pass family (and its join volume is the quantity the
    // gram-size dial controls — a growth regression shows here first)
    "llm119_longest_run_audit",
    // round-18 (verdict #3): one codec-family row — the three big
    // codec-seam failure modes (disk-backed ImageIO cache, AQE
    // single-partition collapse, fixture render inside the timed
    // body) are exactly what a slope exponent catches automatically,
    // and none of the multimodal rows was slope-measured. llm121
    // exercises the full path: prepare-written PNG fixture → ImageIO
    // decode → dHash → banded candidate join → CC closure.
    "llm121_image_clusters",
    // round-18: the span scrub is the newest corpus-pass family (its
    // shared-gram join volume is what the min≠max gate controls — a
    // growth regression shows here first)
    "llm124_exact_substring_scrub",
    // round-18 session 2: the winnowing gram pass carries a w-fold
    // in-map window blowup that MUST collapse map-side — a growth
    // regression in that collapse (or in the fingerprint-join volume)
    // shows in this exponent first; it also proxies for the
    // license-detect row built on the same machinery
    "llm128_winnowing_overlap",
    // and the degeneracy audit is the newest two-scan gram family row
    "llm137_degeneracy_audit",
    // round-19 (verdict #4): the two heaviest round-18 rows without
    // exponents — llm123 gives the first slope point for the
    // flatMapGroupsWithState KMV family (its cost should be checkpoint
    // machinery, near-flat in data), llm132 for license detection
    // (gram-floor dominated, now GramIndex-served)
    "llm123_contamination_stream", "llm132_license_detect",
    // round-20 (verdict #4): the 4th-heaviest r19 row — token-grain
    // decontamination. The llm16-shape-transfer argument (map-only BPE
    // behind a broadcast merge table, rare-df-bounded posting join)
    // was plausible but unmeasured; this makes it measured.
    "llm157_token_decontamination")
  private def runSlope(javaBin: String, jvmArgs: Seq[String], cp: String,
                       bigSfDir: String, bigTimes: Map[String, Double]): (Seq[(String, Double)], String) = {
    if (sys.env.get("SPARK_GRAFT_BENCH_SLOPE").contains("0")) return (Nil, "")
    val smallDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR_SMALL",
      bigSfDir.replace("sf0.1", "sf0.01"))
    if (smallDir == bigSfDir ||
        !java.nio.file.Files.isDirectory(java.nio.file.Paths.get(smallDir))) {
      System.err.println(s"[bench] slope: no small SF dir ($smallDir) — skipping")
      return (Nil, smallDir)
    }
    val tagged = SlopeTagged.filter(bigTimes.contains)
    if (tagged.isEmpty) return (Nil, smallDir)
    val outFile = "target/bench_slope.json"
    // a stale artifact from an earlier session must never masquerade
    // as this run's small-SF times — delete before forking, and any
    // read failure below degrades to "no slope" rather than crashing
    // the parent AFTER the whole multi-block bench completed
    try java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(outFile))
    catch { case _: Throwable => () }
    val pb = new ProcessBuilder((Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", cp, "graft.Bench")): _*)
    pb.environment().put("SPARK_GRAFT_BENCH_CHILD", "1")
    pb.environment().put("SPARK_GRAFT_SF_DIR", smallDir)
    pb.environment().put("SPARK_GRAFT_BENCH_ONLY", tagged.mkString(","))
    pb.environment().put("SPARK_GRAFT_BENCH_OUT", outFile)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
    System.err.println(s"[bench] slope block: ${tagged.size} tagged queries at $smallDir")
    val p = pb.start()
    inFlightChild = Some(p)
    val rc = p.waitFor()
    inFlightChild = None
    if (rc != 0) { System.err.println(s"[bench] slope block exited $rc — skipping"); return (Nil, smallDir) }
    try {
      import scala.jdk.CollectionConverters._
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = om.readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(outFile)))
      val small = node.get("queries").properties().asScala
        .map(e => e.getKey -> e.getValue.asDouble()).toMap
      (tagged.flatMap { q =>
        small.get(q).filter(_ > 0).map { tSmall =>
          q -> math.log10(bigTimes(q) / tSmall) // assumed data ratio: 10× (recorded in artifact)
        }
      }, smallDir)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] slope artifact unreadable (${e.getMessage}) — skipping")
      (Nil, smallDir)
    }
  }

  /** Render the artifact's (full, compact) JSON lines — shared by the
    * final emit, the per-block partial flush, and the shutdown hook. */
  private def render(results: Seq[(String, Double)], canaries: Seq[(String, Double)],
                     canariesPar: Seq[(String, Double)], reruns: Seq[(String, Double)],
                     throttled: Boolean, nThreads: Int, sfDir: String,
                     blocks: Int, slope: Seq[(String, Double)] = Nil,
                     slopeSmallDir: String = "",
                     isolatedRerun: Seq[(String, Double)] = Nil,
                     rerunsShed: Int = 0, shed: Seq[String] = Nil,
                     partialBlocksDone: Option[(Int, Int)] = None): (String, String) = {
    // fail loudly BEFORE the mins (round-15 advice): an empty catalog
    // slice — bad SPARK_GRAFT_BENCH_ONLY prefix, or a block file with
    // an empty queries map — would otherwise surface as an opaque
    // UnsupportedOperationException from .min
    require(results.nonEmpty && canaries.nonEmpty,
      "bench: no queries matched — check SPARK_GRAFT_BENCH_ONLY " +
        s"(=${sys.env.getOrElse("SPARK_GRAFT_BENCH_ONLY", "<unset>")}) " +
        "against graft.Queries.all names, and the block artifact files")
    def jmap(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // user-controlled strings (env-var paths) must not be able to
    // break the artifact's JSON — a quote or backslash in a dir name
    // would invalidate the whole line and lose the run (the round-15
    // parsed:null failure mode)
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    } + "\""
    val total = results.map(_._2).sum
    val base1Min = canaries.map(_._2).min
    val basePMin = canariesPar.map(_._2).min
    val slopeJson = if (slope.isEmpty) "" else
      s""""slope_exponent":${jmap(slope.map { case (k, v) => k -> math.rint(v * 1000) / 1000 })},""" +
        s""""slope_small_sf":${jstr(slopeSmallDir)},"slope_assumed_ratio":10,"""
    // canary-gated isolated-block retries (round-19 verdict #1): both
    // attempts' sec + all-core canary, so the artifact proves which
    // reading was kept and whether both attempts ran under steal
    val isoJson = if (isolatedRerun.isEmpty) "" else
      s""""isolated_rerun":${jmap(isolatedRerun)},"""
    // budget bookkeeping (round-21 verdict #1): what was shed and when,
    // so a reader can see exactly which optional extras a constrained
    // run dropped. `partial` marks a mid-run flush (a killed run's
    // artifact carries the completed prefix, tagged as such).
    val budgetJson =
      s""""budget_s":$budgetS,"elapsed_s":${math.rint(elapsedS * 10) / 10},""" +
        s""""reruns_shed":$rerunsShed,""" +
        s""""shed":${shed.map(jstr).mkString("[", ",", "]")},""" +
        partialBlocksDone.fold("") { case (k, n) =>
          s""""partial":true,"blocks_done":$k,"blocks_total":$n,""" }
    val jsonLine = s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(results)},""" +
      s""""canary_ms":${jmap(canaries)},"canary_par_ms":${jmap(canariesPar)},""" +
      s""""canary_baseline_ms":$base1Min,""" +
      s""""canary_par_baseline_ms":$basePMin,""" +
      slopeJson + isoJson + budgetJson +
      s""""canary_threads":$nThreads,"blocks":$blocks,""" +
      s""""throttled":$throttled,"rerun_initial":${jmap(reruns)},"sf":${jstr(sfDir)}}"""
    val compact = s"""{"metric":"total","value":${math.rint(total * 1000) / 1000},""" +
      s""""unit":"sec","n_queries":${results.size},""" +
      s""""canary_baseline_ms":${math.rint(base1Min * 10) / 10},""" +
      s""""canary_par_baseline_ms":${math.rint(basePMin * 10) / 10},""" +
      s""""canary_threads":$nThreads,"blocks":$blocks,""" +
      partialBlocksDone.fold("") { case (k, n) =>
        s""""partial":true,"blocks_done":$k,"blocks_total":$n,""" } +
      s""""throttled":$throttled,"sf":${jstr(sfDir)},""" +
      s""""detail":${jstr(outPath.toString)}}"""
    (jsonLine, compact)
  }

  private def outPath: java.nio.file.Path = java.nio.file.Paths.get(
    sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))

  private def writeArtifact(jsonLine: String): Unit =
    try {
      Option(outPath.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(outPath, jsonLine + "\n")
      System.err.println(s"[bench] full json written to $outPath")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }

  /** Serialize + publish the artifact: the FULL line to
    * SPARK_GRAFT_BENCH_OUT and stdout (first), the compact line to
    * stdout LAST (survives a tail-window capture). */
  private def emit(results: Seq[(String, Double)], canaries: Seq[(String, Double)],
                   canariesPar: Seq[(String, Double)], reruns: Seq[(String, Double)],
                   throttled: Boolean, nThreads: Int, sfDir: String,
                   blocks: Int, slope: Seq[(String, Double)] = Nil,
                   slopeSmallDir: String = "",
                   isolatedRerun: Seq[(String, Double)] = Nil,
                   rerunsShed: Int = 0, shed: Seq[String] = Nil): Unit = {
    val (jsonLine, compact) = render(results, canaries, canariesPar, reruns,
      throttled, nThreads, sfDir, blocks, slope, slopeSmallDir, isolatedRerun,
      rerunsShed, shed, partialBlocksDone = None)
    // this run completed — the shutdown hook must not re-print a stale
    // partial after (or alongside) the real artifact
    lastPartial = None
    writeArtifact(jsonLine)
    // stdout contract (round-14 verdict #4, re-tightened by round-15
    // verdict #2): the FULL payload as one stdout line FIRST — a
    // driver that scans stdout for parseable JSON gets the complete
    // artifact (build.sbt's StdoutOutput strategy keeps it
    // unprefixed). The COMPACT line prints LAST so a tail-window
    // capture (last ~2000 chars — what archived BENCH_r10–r15) still
    // ends with one whole parseable line. The compact line carries NO
    // per-query map — at 157 queries the shortened map already
    // brushed the window and at 173 it overflowed it (r15 parsed:
    // null) — so its size is now CATALOG-INDEPENDENT (~260 bytes at
    // any query count): total, query count, canary baselines,
    // throttle flag, block count, and the artifact path that holds
    // the full per-query detail.
    println(jsonLine)
    println(compact)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // fresh-JVM block orchestration: the parent never builds a
    // SparkSession — it forks one child per block and merges
    val onlyEnv = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSeq)
    val isChild = sys.env.contains("SPARK_GRAFT_BENCH_CHILD")
    val fullCatalog = onlyEnv.fold(Queries.all)(ps =>
      Queries.all.filter(q => ps.exists(q.name.startsWith)))
    // fail loudly on the SINGLE-JVM path too (a bad BENCH_ONLY prefix
    // lands here, not in emit — blocks default to 1 when a filter is
    // set, and an empty catalog would otherwise die as `empty.min`)
    require(fullCatalog.nonEmpty,
      "bench: no queries matched SPARK_GRAFT_BENCH_ONLY " +
        s"(=${sys.env.getOrElse("SPARK_GRAFT_BENCH_ONLY", "<unset>")}) — " +
        s"known prefixes: ${Queries.all.map(_.name).take(5).mkString(", ")}, …")
    val wantBlocks = sys.env.get("SPARK_GRAFT_BENCH_BLOCKS").map(_.toInt)
      .getOrElse(if (onlyEnv.isDefined) 1 else 3)
    if (!isChild && wantBlocks > 1 && fullCatalog.size >= wantBlocks) {
      runBlocks(wantBlocks, fullCatalog)
      return
    }
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
    // Round-16 verdict #7: the heavy tail is where the ~1.3× host
    // swing translates into whole seconds of round-over-round churn —
    // a 12 s row swinging 1.3× moves the total by ~4 s; a 0.5 s row
    // by 0.15. The top-10 rows of the round-16 record take 5 samples
    // instead of 3 (median of 5 tolerates two bad draws, not one).
    // Swing math: at 5 samples the median's expected deviation under
    // the observed swing distribution roughly halves; the extra cost
    // is ~2×10×5 s ≈ 100 s of un-reported wall-clock, not total time.
    val heavyTagged = Set("llm91_contrastive_pairs", "llm16_decontamination",
      "llm87_lsh_calibration", "llm09_jaccard_verify", "llm108_influence_weights",
      "llm105_neardup_safe_split", "llm94_boilerplate_mining",
      "cdc30_incremental_agg", "llm106_novelty_decay", "llm66_levenshtein_verify",
      // round-17 additions at or above the prior set's floor
      "llm119_longest_run_audit")
    // SPARK_GRAFT_BENCH_ONLY=llm19,llm05 — comma-separated name prefixes
    // for single-query iteration (and the per-block slice when run as
    // a block child); unset = full catalog.
    val catalog = fullCatalog

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
      // heavy rows take 5 samples instead of the DEFAULT 3 — an
      // explicit SPARK_GRAFT_BENCH_RUNS wins (a user iterating with
      // RUNS=1 must not get quintupled wall-clock, and the slope
      // child inherits the env too)
      val nRuns =
        if (heavyTagged(q.name) && !sys.env.contains("SPARK_GRAFT_BENCH_RUNS")) runs.max(5)
        else runs
      val samples = (1 to nRuns).map { _ =>
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
    val allSuspects = catalog.filter(q => suspect(firstPass(q.name)))
    // Round-22 (round-21 verdict #1): throttle reruns are UNBOUNDED in
    // a bad steal session (r21 ran 67-74 of them — each a full extra
    // 3-5-sample pass — and the official 32-core bench timed out,
    // losing the whole artifact). Two bounds, both recorded in the
    // artifact as `reruns_shed`: a per-block cap (worst all-core
    // canaries first — those carry the most steal distortion), and an
    // absolute deadline from the parent's wall-clock budget after
    // which remaining reruns are shed entirely. A shed rerun keeps its
    // first-pass reading (the same reading an unthrottled session
    // would have kept); the lower-canary-wins rule is unchanged for
    // reruns that do execute.
    val maxReruns = sys.env.get("SPARK_GRAFT_BENCH_MAX_RERUNS").map(_.toInt).getOrElse(8)
    val rerunDeadlineMs = sys.env.get("SPARK_GRAFT_BENCH_RERUN_DEADLINE_MS").map(_.toLong)
    val keptSet = allSuspects.sortBy(q => -firstPass(q.name).canaryPar)
      .take(maxReruns).map(_.name).toSet
    val suspects = allSuspects.filter(q => keptSet(q.name))
    var rerunsShed = allSuspects.size - suspects.size
    if (rerunsShed > 0)
      System.err.println(s"[bench] $rerunsShed throttle rerun(s) over the " +
        s"per-block cap ($maxReruns) shed — keeping first-pass readings")
    if (suspects.nonEmpty) {
      System.err.println(s"[bench] throttle-suspect queries (canary > ${suspectRatio}× baseline " +
        f"$base1%.1f/$baseP%.1f ms): ${suspects.map(_.name).mkString(",")} — re-running after cooldown")
      Thread.sleep(3000)
    }
    val reruns = suspects.flatMap { q =>
      if (rerunDeadlineMs.exists(System.currentTimeMillis() > _)) {
        rerunsShed += 1
        System.err.println(s"[bench] throttle rerun of ${q.name} shed (past " +
          "the parent's wall-clock budget deadline) — keeping first-pass reading")
        None
      } else Some(q.name -> timeQuery(q))
    }.toMap
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
    spark.stop()
    emit(results.map { case (k, s) => k -> s.sec },
      results.map { case (k, s) => k -> s.canary },
      results.map { case (k, s) => k -> s.canaryPar },
      suspects.filter(q => reruns.contains(q.name))
        .map(q => q.name -> firstPass(q.name).sec),
      throttled, nThreads, sfDir, blocks = 1, rerunsShed = rerunsShed)
  }
}
