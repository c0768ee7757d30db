package graft.pipeline

/** Config namespace engine — the rebuild of
  * DebeziumServerConfigSourceFactory.java:74-178:
  *
  *  - ENV-VAR NORMALIZATION: `DEBEZIUM_SINK_TYPE` → `debezium.sink.type`
  *    (MicroProfile env mapping rule: lowercase, '_' → '.');
  *  - EMPTY-STRING SENTINEL: the value `__DBZ_EMPTY__` decodes to ""
  *    (DebeziumProperties.java:56 + EmptyStringConverter — env vars
  *    cannot carry empty values, so the sentinel travels instead);
  *  - SINK-CONFIG REUSE: when offset storage / schema history is
  *    backed by the sink system (the Redis pattern,
  *    RedisOffsetBackingStore), the sink's `debezium.sink.<type>.*`
  *    client config is mirrored into the storage namespaces so users
  *    configure the connection once (:101-104,157-178).
  */
object PipelineConfig {
  val EmptySentinel = "__DBZ_EMPTY__"

  /** Environment map → property map (lowercase, underscores to dots),
    * keeping only debezium.* keys, sentinel-decoded. Explicit
    * properties win over environment-derived ones. */
  def fromEnvironment(env: Map[String, String],
                      explicit: Map[String, String] = Map.empty): Map[String, String] = {
    val fromEnv = env.map { case (k, v) => k.toLowerCase.replace('_', '.') -> decode(v) }
      .filter { case (k, _) => k.startsWith("debezium.") }
    fromEnv ++ explicit.map { case (k, v) => k -> decode(v) }
  }

  def decode(v: String): String = if (v == EmptySentinel) "" else v

  /** Mirror `debezium.sink.<type>.*` into the offset-storage /
    * schema-history namespaces when those declare the same backing
    * system — one connection config, three consumers. */
  def reuseSinkConfig(props: Map[String, String]): Map[String, String] = {
    val sinkType = props.get("debezium.sink.type")
    sinkType.fold(props) { t =>
      val sinkPrefix = s"debezium.sink.$t."
      val sinkProps = props.collect {
        case (k, v) if k.startsWith(sinkPrefix) => k.stripPrefix(sinkPrefix) -> v
      }
      val mirrors = Seq(
        "debezium.source.offset.storage" -> s"debezium.source.offset.storage.$t.",
        "debezium.source.schema.history.internal" -> s"debezium.source.schema.history.internal.$t.")
      mirrors.foldLeft(props) { case (acc, (storageKey, storagePrefix)) =>
        if (acc.get(storageKey).exists(_.contains(t)))
          acc ++ sinkProps.map { case (k, v) => s"$storagePrefix$k" -> v }
        else acc
      }
    }
  }
}
