package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Mirrors the reference's single-process runtime boot
  * (debezium-server-core/src/main/java/io/debezium/server/Main.java:11-18)
  * but on Spark: one SparkSession, UTC, AQE on, shuffle partitions sized
  * for the local-mode core count (on a real cluster this is set to
  * 2-3x total executor cores; never the 200 default).
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // the synthetic events table carries parquet TIMESTAMP(NANOS);
      // Spark has no nanos timestamp type — surface as LongType nanos
      // and convert explicitly (see Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
