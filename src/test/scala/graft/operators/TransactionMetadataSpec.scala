package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Transaction metadata blocks + BEGIN/END boundary stream
  * (`provide.transaction.metadata`). */
class TransactionMetadataSpec extends SparkSpec {
  import spark.implicits._

  // (tx, destination, seq, payload) — tx 100 spans two collections
  private def events =
    Seq((100L, "s.a", 1L, "x1"), (100L, "s.b", 2L, "x2"), (100L, "s.a", 3L, "x3"),
        (200L, "s.b", 1L, "y1"))
      .toDF("tx", "dest", "seq", "payload")

  test("enrich: total_order counts per tx, data_collection_order per (tx, collection)") {
    val got = TransactionMetadata.enrich(events, col("tx"), col("dest"), Seq(col("seq")))
      .select(col("tx"), col("dest"), col("seq"),
        col("transaction.id"), col("transaction.total_order"),
        col("transaction.data_collection_order"))
      .orderBy("tx", "seq")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (100L, "s.a", "100", 1L, 1L),
      (100L, "s.b", "100", 2L, 1L),
      (100L, "s.a", "100", 3L, 2L),
      (200L, "s.b", "200", 1L, 1L)))
  }

  test("boundaries: BEGIN/END per tx; END carries total + per-collection counts") {
    val got = TransactionMetadata.boundaries(events, col("tx"), col("dest"), "p")
      .orderBy(col("tx_id"), col("status"))
      .collect().map(r => (r.getAs[Long]("tx_id"), r.getAs[String]("status"),
        Option(r.getAs[java.lang.Long]("event_count")).map(_.toLong),
        r.getAs[String]("data_collections"), r.getAs[String]("destination")))
    assert(got.toSeq == Seq(
      (100L, "BEGIN", None, null, "p.transaction"),
      (100L, "END", Some(3L), "s.a:2,s.b:1", "p.transaction"),
      (200L, "BEGIN", None, null, "p.transaction"),
      (200L, "END", Some(1L), "s.b:1", "p.transaction")))
  }
}
