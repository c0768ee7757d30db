package graft
import org.apache.spark.sql.SparkSession

/** Plan-evidence dumper for the optimization rounds: writes
  * `.explain("formatted")` output for the named queries to
  * `$SPARK_GRAFT_PLAN_DIR/<query>_$SPARK_GRAFT_PLAN_SUFFIX.txt` using
  * the SAME session configuration as [[Bench]], so the captured plans
  * are the plans the bench times. Args = query-name prefixes (same
  * matching rule as SPARK_GRAFT_BENCH_ONLY). Iterative queries execute
  * their superstep jobs during plan construction — the dump captures
  * the final frame's plan; superstep shapes are documented in code.
  * NOT part of the bench contract; measurement tooling only. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r21")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    require(args.nonEmpty, "usage: PlanDump <query-name-prefix> [...]")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val picked = Queries.all.filter(q => args.exists(q.name.startsWith))
    require(picked.nonEmpty, s"no queries match ${args.mkString(",")}")
    picked.foreach { q =>
      q.prepare.foreach(p => p(spark, sfDir))
      val df = q.run(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${q.name}_$suffix.txt"), txt)
      q.cleanup.foreach(c => try c(spark) catch { case _: Throwable => () })
      spark.sparkContext.getPersistentRDDs.values
        .foreach(r => try r.unpersist(blocking = false) catch { case _: Throwable => () })
      System.err.println(s"[plandump] wrote $outDir/${q.name}_$suffix.txt")
    }
    spark.stop()
  }
}
