package graft.sources

import graft.sources.cdc.CaptureFactory
import graft.sources.cdc.CaptureFactory.{PollingCapture, ProtocolCapture}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** `debezium.source.connector.class` capture dispatch — the
  * reference's connector-selection mechanism mapped onto the capture
  * implementations (no Spark session needed: selection is pure
  * config). */
class CaptureFactorySpec extends AnyFunSuite {

  private def base(extra: (String, String)*): Map[String, String] = Map(
    "debezium.source.path" -> Files.createTempDirectory("graft-capture").toString,
    "debezium.source.topic.prefix" -> "testc") ++ extra

  test("PostgresConnector class selects the pgoutput protocol capture") {
    val c = CaptureFactory.fromProperties(base(
      "debezium.source.connector.class" -> "io.debezium.connector.postgresql.PostgresConnector",
      "debezium.source.protocol.dir" -> Files.createTempDirectory("graft-pgfeed").toString))
    assert(c.isInstanceOf[ProtocolCapture])
  }

  test("PostgresConnector without a protocol dir fails fast") {
    intercept[IllegalArgumentException] {
      CaptureFactory.fromProperties(base(
        "debezium.source.connector.class" -> "io.debezium.connector.postgresql.PostgresConnector"))
    }
  }

  test("MySqlConnector selects the binlog capture and requires column registration") {
    val feedDir = Files.createTempDirectory("graft-myfeed").toString
    val c = CaptureFactory.fromProperties(base(
      "debezium.source.connector.class" -> "io.debezium.connector.mysql.MySqlConnector",
      "debezium.source.protocol.dir" -> feedDir,
      "debezium.source.binlog.columns.inventory.customers" -> "id, email, score",
      "debezium.source.binlog.keys.inventory.customers" -> "id"))
    assert(c.isInstanceOf[ProtocolCapture])
    // the wire format carries no column names — missing registration fails fast
    intercept[IllegalArgumentException] {
      CaptureFactory.fromProperties(base(
        "debezium.source.connector.class" -> "io.debezium.connector.mysql.MySqlConnector",
        "debezium.source.protocol.dir" -> feedDir))
    }
  }

  test("anything else falls back to the JDBC polling tailer") {
    val c = CaptureFactory.fromProperties(base(
      "debezium.source.connector.class" -> "graft.jdbc.PollingConnector",
      "debezium.source.jdbc.url" -> "jdbc:derby:memory:capsel;create=true",
      "debezium.source.jdbc.tables" -> "inventory.customers:id:id"))
    assert(c.isInstanceOf[PollingCapture])
  }
}
