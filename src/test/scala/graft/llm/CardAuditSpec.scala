package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the Luhn card audit: checksum validation, separator handling,
  * length gating, and digit-noise rejection. */
class CardAuditSpec extends SparkSpec {
  import spark.implicits._

  private def audit(rows: Seq[(String, String)]) =
    Pii.cardAudit(rows.toDF("source", "t"), col("source"), col("t"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      // (candidates, valid, invalid, docs_with_valid)

  test("valid test numbers pass; a broken check digit fails") {
    val out = audit(Seq(
      "a" -> "pay 4111 1111 1111 1111 or 4111-1111-1111-1112 today",
      "b" -> "amex 371449635398431 and diners 30569309025904"))
    assert(out("a") == (2L, 1L, 1L, 1L))
    assert(out("b") == (2L, 2L, 0L, 1L))
  }

  test("short digit runs and overlong ids are not candidates") {
    val out = audit(Seq(
      "s" -> "order 123456789012 ref 12345678901234567890123 t 2026-08-16"))
    assert(out("s") == (0L, 0L, 0L, 0L))
  }

  test("luhnValid is position-exact: swapping two adjacent digits breaks it") {
    val ok = Seq(("x", "4111111111111111"), ("y", "4111111111111121"))
      .toDF("source", "c")
      .select(col("source"), Pii.luhnValid(col("c")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(ok("x") && !ok("y"))
  }
}
