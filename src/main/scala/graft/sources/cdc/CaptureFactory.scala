package graft.sources.cdc

import java.nio.file.Paths

/** Config-driven capture selection — the reference's
  * `debezium.source.connector.class` dispatch (the server contains no
  * connector code; it selects an engine connector per database,
  * debezium-server-core DebeziumServerConfigSourceFactory.java:127-135
  * and the dist connector matrix debezium-server-dist/pom.xml:359-389).
  * Here the same property picks the capture mechanism writing the
  * shared [[CdcLayout]]:
  *
  *  - `…PostgresConnector` → [[PgOutputDecoder]] over a replication
  *    feed (`debezium.source.protocol.dir` — a [[FileReplicationFeed]]
  *    of captured pgoutput messages; a live deployment substitutes the
  *    `START_REPLICATION` socket feed);
  *  - `…MySqlConnector` → [[BinlogDecoder]] over the same feed shape,
  *    with column names registered from
  *    `debezium.source.binlog.columns.<schema>.<table> = c1,c2,…` and
  *    `debezium.source.binlog.keys.<schema>.<table> = k1[,k2…]`
  *    (the information_schema lookup a live connector performs);
  *  - anything else (or `debezium.source.jdbc.url` present) →
  *    [[JdbcPollingTailer]], the log-less fallback.
  *
  * `CdcPipeline.startCapture` dispatches the result to the matching
  * live-pipeline runner.
  */
object CaptureFactory {

  sealed trait Capture
  /** Watermark-polling capture (no log access). */
  final case class PollingCapture(tailer: JdbcPollingTailer) extends Capture
  /** Log-protocol capture (hard deletes + before images flow). */
  final case class ProtocolCapture(tailer: ReplicationTailer) extends Capture

  def fromProperties(props: Map[String, String]): Capture = {
    val connectorClass = props.getOrElse("debezium.source.connector.class", "")
    val dbDir = Paths.get(props.getOrElse("debezium.source.path",
      throw new IllegalArgumentException("debezium.source.path is required")))
    val prefix = props.getOrElse("debezium.source.topic.prefix", "testc")
    def feed = {
      val dir = props.getOrElse("debezium.source.protocol.dir",
        throw new IllegalArgumentException(
          s"$connectorClass needs debezium.source.protocol.dir (captured protocol messages)"))
      new FileReplicationFeed(Paths.get(dir),
        offsetFile = Some(dbDir.resolve("_feed_offset")))
    }
    if (connectorClass.endsWith("PostgresConnector")) {
      val dec = new PgOutputDecoder(startLsn = CdcLayout.maxLsn(dbDir).max(0L),
        topicPrefix = prefix)
      ProtocolCapture(new ReplicationTailer(feed, dec.decode, dbDir))
    } else if (connectorClass.endsWith("MySqlConnector")) {
      val dec = new BinlogDecoder(startLsn = CdcLayout.maxLsn(dbDir).max(0L),
        topicPrefix = prefix)
      val colPrefix = "debezium.source.binlog.columns."
      val tables = props.keys.filter(_.startsWith(colPrefix)).map(_.stripPrefix(colPrefix))
      if (tables.isEmpty) throw new IllegalArgumentException(
        "MySqlConnector needs debezium.source.binlog.columns.<schema>.<table> entries " +
        "(the binlog wire format carries no column names)")
      tables.foreach { qual =>
        val cols = props(colPrefix + qual).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val keys = props.getOrElse(s"debezium.source.binlog.keys.$qual", cols.head)
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        dec.registerTable(qual, cols, keys)
      }
      ProtocolCapture(new ReplicationTailer(feed, dec.decode, dbDir))
    } else {
      PollingCapture(JdbcPollingTailer.fromProperties(props))
    }
  }
}
