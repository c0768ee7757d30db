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
  /** `stateBackend`: "memory" (Spark's default HDFS-backed in-memory
    * provider) or "rocksdb" (off-heap state via
    * [[streamingStateConfigs]] — the 100 TB posture for the stateful
    * streaming operators, where per-key state not shuffle is what
    * breaks first on the in-memory provider). Also settable through
    * SPARK_GRAFT_STATE_BACKEND so a deployment flips it without code. */
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = 32,
              stateBackend: String =
                sys.env.getOrElse("SPARK_GRAFT_STATE_BACKEND", "memory")): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .appName("graft")
      // engine Catalyst rules (bounded-width range-join binning — the
      // BroadcastNestedLoopJoin guard); same class via
      // spark.sql.extensions on a pre-built cluster session
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // runtime re-plan of skewed joins: at 100 TB a hot key (one huge
      // customer, one hot destination) otherwise pins a single task
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // the synthetic events table carries parquet TIMESTAMP(NANOS);
      // Spark has no nanos timestamp type — surface as LongType nanos
      // and convert explicitly (see Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    stateBackend.toLowerCase match {
      case "memory" | "" => b
      case "rocksdb" => streamingStateConfigs.foldLeft(b) {
        case (bb, (k, v)) => bb.config(k, v)
      }
      case other => throw new IllegalArgumentException(
        s"unsupported state backend '$other' (memory/rocksdb)")
    }
  }

  /** Extra configs for stateful streaming at scale: the RocksDB state
    * store keeps per-key state (apply-changes, dedup horizons) off the
    * executor heap — on 100 TB the state store, not the shuffle, is
    * what breaks first with the in-memory provider. Apply on the
    * builder when running the streaming layer in production. */
  val streamingStateConfigs: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
