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
/** Property map + its log-safe rendering: [[props]] carries the real
  * (secret-resolved) values for the engine; [[masked]] replaces every
  * provider-resolved value with `***` and is the ONLY view lineage /
  * logs / error messages may print — a secret pulled out of a file
  * must never round-trip back into observable text. */
final case class ResolvedConfig(props: Map[String, String],
                                masked: Map[String, String])

object PipelineConfig {
  val EmptySentinel = "__DBZ_EMPTY__"
  val SecretMask = "***"

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
    * schema-history namespaces — one connection config, three
    * consumers. The reference's CURRENT semantics
    * (DebeziumServerConfigSourceFactory.java:85-104, pinned by
    * DebeziumServerConfigSourceFactoryTest.java:28-82): the mirror
    * triggers on `debezium.sink.type` ALONE, and it is suppressed
    * PER NAMESPACE whenever that namespace already carries ANY
    * explicit `…<namespace>.<type>.*` key — copied sink properties
    * must never silently override a user's explicit storage
    * configuration (the sink and storage may use different property
    * names for the same concept) or leak sink-only properties beside
    * it. Suppression is namespace-specific: explicit schema-history
    * config leaves the offset-storage mirror intact, and vice
    * versa. */
  def reuseSinkConfig(props: Map[String, String]): Map[String, String] = {
    props.get("debezium.sink.type").fold(props) { t =>
      val sinkPrefix = s"debezium.sink.$t."
      val sinkProps = props.collect {
        case (k, v) if k.startsWith(sinkPrefix) => k.stripPrefix(sinkPrefix) -> v
      }
      val namespaces = Seq(
        s"debezium.source.schema.history.internal.$t.",
        s"debezium.source.offset.storage.$t.")
      namespaces.foldLeft(props) { (acc, nsPrefix) =>
        if (acc.keys.exists(_.startsWith(nsPrefix))) acc // explicit config wins
        else acc ++ sinkProps.map { case (k, v) => s"$nsPrefix$k" -> v }
      }
    }
  }

  // ---- config.providers secret indirection (round-15 verdict #1) ----
  //
  // The reference externalizes credentials through Kafka-style config
  // providers: `debezium.source.config.providers=file` names the
  // providers, `…config.providers.file.class` binds each to an
  // implementation, and any property VALUE may then carry a
  // `${file:<path>:<key>}` placeholder that the engine swaps for the
  // secret at boot (DebeziumServerFileConfigProviderProfile.java:23-26,
  // exercised end-to-end by DebeziumServerConfigProvidersIT.java:39
  // against secrets_test.txt `user=postgres`). Three upstream provider
  // shapes, all pure-JVM here:
  //  - file:      path = a java.util.Properties file, key = entry name;
  //  - env:       key = environment variable (path unused);
  //  - directory: path = a directory, key = file name, value = file text.
  // Kafka leaves placeholders of UNDECLARED providers untouched (they
  // may be someone else's syntax); a DECLARED provider with a wrong
  // path or missing key fails loudly — a pipeline must never boot with
  // a literal `${file:…}` as its database password.

  /** `${provider:path:key}` / `${provider:key}` — the Kafka
    * ConfigTransformer DEFAULT_PATTERN (the path segment is optional,
    * and reluctant groups give paths their slashes), extended with an
    * OPTIONAL leading Quarkus-profile guard `$\$`: property files
    * wrap a placeholder as `$\$${file:…}` so MicroProfile expression
    * expansion cannot eat the `$` before the engine sees it (the
    * reference profile writes exactly this shape). The guard is
    * consumed ONLY when its placeholder resolves — a placeholder of
    * an UNDECLARED provider passes through byte-for-byte, guard and
    * all, exactly like the no-providers fast path (review finding:
    * stripping it unconditionally mutated someone else's syntax). */
  private val Placeholder = """(\$\\\$)?\$\{([^}]*?):(?:([^}]*?):)?([^}]*?)\}""".r

  /** Resolve every declared-provider placeholder in `props` values.
    * Providers are declared by any `*.config.providers` list key
    * (the reference uses `debezium.source.config.providers`) with a
    * per-provider `….config.providers.<name>.class`; a missing class
    * key falls back on the provider NAME (`file`/`env`/`directory`).
    * Returns the resolved map plus a masked view for logs/lineage. */
  def resolveProviders(props: Map[String, String],
                       env: Map[String, String] = sys.env): ResolvedConfig = {
    val declared: Map[String, String] = props.collect {
      case (k, v) if k.endsWith(".config.providers") =>
        val prefix = k.stripSuffix("config.providers") // keeps trailing '.'
        v.split(",").map(_.trim).filter(_.nonEmpty).map { name =>
          name -> props.getOrElse(s"${prefix}config.providers.$name.class", name)
        }
    }.flatten.toMap
    if (declared.isEmpty) return ResolvedConfig(props, props)

    // one read per file/dir entry per resolution pass
    val fileCache = scala.collection.mutable.Map.empty[String, java.util.Properties]
    def fromFile(path: String, key: String): String = {
      val p = fileCache.getOrElseUpdate(path, {
        val f = java.nio.file.Paths.get(path)
        require(java.nio.file.Files.isRegularFile(f),
          s"config provider 'file': no such secrets file: $path")
        val props = new java.util.Properties()
        val in = java.nio.file.Files.newInputStream(f)
        try props.load(in) finally in.close()
        props
      })
      Option(p.getProperty(key)).getOrElse(throw new IllegalArgumentException(
        s"config provider 'file': key '$key' not found in $path"))
    }
    def fromEnv(key: String): String =
      env.getOrElse(key, throw new IllegalArgumentException(
        s"config provider 'env': environment variable '$key' is not set"))
    def fromDirectory(path: String, key: String): String = {
      val f = java.nio.file.Paths.get(path, key)
      require(java.nio.file.Files.isRegularFile(f),
        s"config provider 'directory': no file '$key' under $path")
      java.nio.file.Files.readString(f)
    }

    def resolveOne(provider: String, path: String, key: String): Option[String] =
      declared.get(provider).map { clazz =>
        // class-suffix dispatch covers the upstream Kafka class names
        // AND bare short names in one match
        val c = clazz.toLowerCase
        if (c.contains("fileconfigprovider") || c == "file") fromFile(path, key)
        else if (c.contains("envvarconfigprovider") || c.contains("envconfigprovider") || c == "env") fromEnv(key)
        else if (c.contains("directoryconfigprovider") || c == "directory") fromDirectory(path, key)
        else throw new IllegalArgumentException(
          s"config provider '$provider': unsupported class '$clazz' " +
            "(supported: FileConfigProvider, EnvVarConfigProvider, DirectoryConfigProvider)")
      }

    var secretKeys = Set.empty[String]
    val resolved = props.map { case (k, v) =>
      var touched = false
      val out = Placeholder.replaceAllIn(v, m => {
        resolveOne(m.group(2), Option(m.group(3)).getOrElse(""), m.group(4)) match {
          case Some(secret) =>
            touched = true
            scala.util.matching.Regex.quoteReplacement(secret)
          case None => scala.util.matching.Regex.quoteReplacement(m.matched)
        }
      })
      if (touched) secretKeys += k
      k -> out
    }
    ResolvedConfig(resolved,
      resolved.map { case (k, v) => k -> (if (secretKeys(k)) SecretMask else v) })
  }

  /** Full boot-path assembly in the reference's order: environment
    * normalization → provider resolution (BEFORE namespace remapping,
    * so mirrored copies inherit already-resolved secrets) → sink-config
    * reuse applied to the real AND masked views in lockstep — a secret
    * mirrored into the offset-storage namespace stays masked there. */
  def load(env: Map[String, String] = sys.env,
           explicit: Map[String, String] = Map.empty): ResolvedConfig = {
    val r = resolveProviders(fromEnvironment(env, explicit), env)
    ResolvedConfig(reuseSinkConfig(r.props), reuseSinkConfig(r.masked))
  }
}
